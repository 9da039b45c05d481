"""`prefilter`: the k-mer inverted-index double-diagonal-match prefilter.

Reference: src/prefiltering/Prefiltering.cpp — seed matrix VTML80 at 8-bit
scaling with -0.2 bias, ungapped rescoring matrix at 2-bit (getSubstitutionMatrix
:1009-1025), k-mer threshold from sensitivity (getKmerThreshold :1036-1075),
k auto-sized 6/7 from DB residues (IndexTable.h:441-443), tantan-masked index
build with self-score k-mer pruning (IndexBuilder.cpp), per-query matching in
prefilter/query_matcher.py, output `targetKey \t diagScore \t diagonal`.
"""

import os

import numpy as np

from ..align import util as autil
from ..data.submat import get_submat
from ..db import dbtype as dbt
from ..db.writer import DBWriter
from ..ops.tantan import likelihood_ratio_matrix, mask_batch
from ..prefilter.kmer_generator import KmerGenerator, SubKmerScores
from ..prefilter.kmer_index import KmerIndexTable
from ..prefilter.query_matcher import QueryMatcher, USHRT_MAX
from ..utils import log
from .common import EncodedDB, open_seq_db

INT_MAX = 2147483647


def get_kmer_threshold(sensitivity: float, kmer_size: int,
                       k_score: int = INT_MAX,
                       is_profile: bool = False) -> int:
    """Prefiltering::getKmerThreshold (Prefiltering.cpp:1036-1090)."""
    if k_score != INT_MAX:
        return k_score
    if is_profile:
        # no-context-pseudo-counts profile branch
        base_sens = {5: (108.8, 4.7), 6: (134.35, 6.15), 7: (149.15, 6.85)}
    else:
        base_sens = {5: (160.75, 12.75), 6: (163.2, 8.917), 7: (186.15, 11.22)}
    if kmer_size not in base_sens:
        raise ValueError(f"invalid k-mer size {kmer_size}")
    base, per = base_sens[kmer_size]
    # float base - (float sens * double per) -> float, then int truncation
    best = np.float32(np.float64(np.float32(base))
                      - np.float64(np.float32(sensitivity)) * per)
    return int(best)


def compute_kmer_size(residues: int) -> int:
    return 6 if residues < 3350000000 else 7


def build_index(tdb: EncodedDB, seed, kmer_size: int, kmer_thr: int,
                mask: bool, mask_prob: float, mask_lower: bool,
                spaced: bool, pattern: str, seq_range=None):
    """seq_range=(lo, hi): build over a contiguous target slice with local
    ids 0..hi-lo (the per-split index of the reference's target-split mode,
    Prefiltering.cpp:755-786)."""
    alpha = seed.alphabet_size - 1      # X removed for seeding
    x_idx = seed.alphabet_size - 1
    lo, hi = seq_range if seq_range is not None else (0, tdb.size)
    seqs = [tdb.seq_num(i).astype(np.uint8) for i in range(lo, hi)]
    if mask:
        lr = likelihood_ratio_matrix(seed)
        masked, n_masked = mask_batch(seqs, lr, x_idx, mask_prob)
        log.info(f"Index table: Masked residues: {n_masked}")
    else:
        masked = seqs
    if mask_lower:
        for i, s in enumerate(masked):
            raw = tdb.reader.get_seq(lo + i)
            lower = np.frombuffer(raw, dtype=np.uint8) >= ord('a')
            s = s.copy()
            s[lower[: len(s)]] = x_idx
            masked[i] = s
    self_score = np.diag(seed.sub_matrix).astype(np.int64)
    table = KmerIndexTable(alpha, kmer_size, spaced, pattern)
    table.build(masked, x_idx, kmer_thr, self_score)
    return table


def build_profile_target_index(treader, seed, kmer_size: int,
                               kmer_thr: int, spaced: bool, pattern: str):
    """Index over DBTYPE_HMM_PROFILE targets: each profile's windows expand
    into all k-mers scoring >= kmerThr against the per-position profile rows
    (IndexBuilder.cpp isProfile branch + IndexTable::addSimilarSequence,
    IndexTable.h:304-348 — unique k-mer per profile, first position wins).
    The sequence store holds the profiles' query letters (Sequence.cpp:314)
    for the ungapped diagonal rescore."""
    from ..prefilter.kmer_generator import ProfileKmerGenerator
    from ..prefilter.kmer_index import KmerIndexTable, pattern_offsets
    from ..profile.io import kmer_rows, parse_profile

    alpha = seed.alphabet_size - 1
    x_idx = seed.alphabet_size - 1
    offsets_pat, span = pattern_offsets(kmer_size, spaced, pattern)
    table = KmerIndexTable(alpha, kmer_size, spaced, pattern)
    all_kmer, all_seq, all_pos = [], [], []
    seqs = []
    for sid in range(treader.size):
        p = parse_profile(treader.get_data(sid))
        q_num = p.query_num.astype(np.int64)
        seqs.append(q_num.astype(np.uint8))
        ss, si = kmer_rows(p)
        gen = ProfileKmerGenerator(kmer_size, alpha, ss, si, offsets_pat)
        n = p.length - span + 1
        if n <= 0:
            continue
        pos = np.arange(n, dtype=np.int64)
        wins = q_num[pos[:, None] + offsets_pat[None, :]]
        ok = ~(wins == x_idx).any(axis=1)
        pos, wins = pos[ok], wins[ok]
        if len(pos) == 0:
            continue
        codes, win_of = gen.generate_all(
            wins, np.full(len(pos), kmer_thr, np.int64), pos)
        if len(codes) == 0:
            continue
        kpos = pos[win_of]
        # unique k-mer per profile, first (smallest) position wins
        order = np.lexsort((kpos, codes))
        codes, kpos = codes[order], kpos[order]
        first = np.ones(len(codes), dtype=bool)
        first[1:] = codes[1:] != codes[:-1]
        all_kmer.append(codes[first])
        all_seq.append(np.full(int(first.sum()), sid, np.int64))
        all_pos.append(kpos[first])
    kmers = (np.concatenate(all_kmer) if all_kmer
             else np.zeros(0, np.int64))
    seqs_a = (np.concatenate(all_seq) if all_seq
              else np.zeros(0, np.int64))
    poss = (np.concatenate(all_pos) if all_pos
            else np.zeros(0, np.int64))
    order = np.argsort(kmers, kind="stable")
    kmers, seqs_a, poss = kmers[order], seqs_a[order], poss[order]
    table.sparse = table.table_size > (1 << 26)
    if table.sparse:
        table.uniq_kmers, counts = (np.unique(kmers, return_counts=True)
                                    if len(kmers)
                                    else (np.zeros(0, np.int64),
                                          np.zeros(0, np.int64)))
        table.offsets = np.concatenate([[0], np.cumsum(counts)]).astype(
            np.int64)
    else:
        counts = np.bincount(kmers, minlength=table.table_size) \
            if len(kmers) else np.zeros(table.table_size, dtype=np.int64)
        table.offsets = np.concatenate([[0], np.cumsum(counts)]).astype(
            np.int64)
    table.entries_seq = seqs_a
    table.entries_pos = poss.astype(np.uint16)
    table.masked_seqs = seqs
    return table


def prefilter_kmer(par, command):
    qdb_path, tdb_path, out_path = par.filenames[:3]
    same_db = qdb_path == tdb_path

    qreader = open_seq_db(qdb_path)
    query_is_profile = qreader.base_type == dbt.DBTYPE_HMM_PROFILE
    query_is_nucl = qreader.base_type == dbt.DBTYPE_NUCLEOTIDES
    if query_is_nucl:
        # nucleotide search: 5-letter matrix at 1 bit, no bias
        # (Prefiltering.cpp:62-66); ungapped rescoring uses the same matrix
        seed = get_submat(par.sub_mat.nucl, 1.0, 0.0)
        ungapped = seed
    elif query_is_profile:
        # profile queries use the scoring matrix for target background only
        # (Prefiltering.cpp:72-77); index k-mer threshold is 0 (:555-557)
        seed = get_submat(par.sub_mat.aa, 8.0, -0.2)
        ungapped = get_submat(par.sub_mat.aa, 2.0, -0.2)
    else:
        seed = get_submat(par.seed_sub_mat.aa, 8.0, -0.2)
        ungapped = get_submat(par.sub_mat.aa, 2.0, -0.2)
    treader = qreader if same_db else open_seq_db(tdb_path)
    qdb = None if query_is_profile else EncodedDB(qreader, seed)
    tdb = qdb if same_db and not query_is_profile else EncodedDB(treader, seed)
    target_is_nucl = treader.base_type == dbt.DBTYPE_NUCLEOTIDES

    target_is_profile = treader.base_type == dbt.DBTYPE_HMM_PROFILE

    # prebuilt-index parameter adoption (Prefiltering.cpp:111-160): flags
    # the user did NOT set take the index's values, so a `<db>.idx` built
    # at another sensitivity/k is used instead of triggering a rebuild
    from ..prefilter.index_io import index_path_for, load_index_meta
    _idx_path = index_path_for(tdb_path)
    if _idx_path is not None and not target_is_profile:
        try:
            _m = load_index_meta(_idx_path)
            if bool(_m.get("nucl", 0)) == bool(query_is_nucl):
                if not par.was_set("kmer_size") and _m.get("k"):
                    par.set("kmer_size", int(_m["k"]))
                if (not par.was_set("sensitivity")
                        and _m.get("sensitivity") is not None):
                    par.set("sensitivity", float(_m["sensitivity"]))
                if not par.was_set("spaced_kmer_mode"):
                    par.set("spaced_kmer_mode", int(_m.get("spaced", 1)))
                if not par.was_set("mask"):
                    par.set("mask", int(_m.get("mask", 1)))
        except Exception as e:
            log.warning(f"ignoring unreadable index {_idx_path}: {e}")

    if query_is_nucl:
        kmer_size = par.kmer_size or 15
        kmer_thr = 0                       # Prefiltering.cpp:207-216
    else:
        kmer_size = par.kmer_size or compute_kmer_size(
            treader.total_residues())
        kmer_thr = get_kmer_threshold(
            par.sensitivity, kmer_size, par.k_score.aa,
            is_profile=query_is_profile or target_is_profile)
    log.info(f"k-mer similarity threshold: {kmer_thr} (k = {kmer_size})")

    # exact k-mer matching (takeOnlyBestKmer, Prefiltering.cpp:188-192)
    take_only_best = (par.exact_kmer_matching == 1
                      or (target_is_profile and not query_is_profile)
                      or (query_is_nucl and target_is_nucl))

    spaced = par.spaced_kmer_mode == 1
    alpha = seed.alphabet_size - 1
    if target_is_profile:
        table = build_profile_target_index(
            treader, seed, kmer_size, kmer_thr, spaced,
            par.spaced_kmer_pattern)
        log.info(f"Index table: {len(table.entries_seq)} k-mer positions")
        matcher = QueryMatcher(
            table, seed, ungapped, kmer_thr, kmer_size, par.max_seqs,
            par.comp_bias_corr, par.comp_bias_corr_scale,
            par.min_ungapped_score, None,
            take_only_best_kmer=take_only_best,
            is_nucleotide=False)
        return _run_host(par, qreader, treader, qdb, matcher,
                         query_is_profile, same_db, out_path, alpha)
    index_thr = 0 if (query_is_profile or query_is_nucl) else kmer_thr
    table = None
    from ..prefilter.index_io import index_path_for, load_index
    idx_path = index_path_for(tdb_path)
    if idx_path is not None:
        try:
            cand, meta = load_index(idx_path)
            if (cand.k == kmer_size and cand.alpha == seed.alphabet_size - 1
                    and meta.get("kmer_thr") == index_thr
                    and meta.get("spaced") == int(spaced)
                    and meta.get("mask") == int(par.mask)):
                table = cand
                log.info(f"Using prebuilt index {idx_path}")
            else:
                log.info(f"Prebuilt index {idx_path} incompatible with "
                         "requested parameters; rebuilding")
        except Exception as e:            # corrupt/old index: rebuild
            log.warning(f"Failed to load prebuilt index {idx_path}: {e}")
    if table is None:
        table = build_index(tdb, seed, kmer_size, index_thr,
                            par.mask == 1, par.mask_prob,
                            par.mask_lower_case == 1, spaced,
                            par.spaced_kmer_pattern)
    log.info(f"Index table: {len(table.entries_seq)} k-mer positions")

    alpha = seed.alphabet_size - 1
    if query_is_profile or take_only_best:
        generator = None      # per-query rows / exact match only
    else:
        three = SubKmerScores(seed.sub_matrix, alpha, 3).attach_disk_cache()
        two = SubKmerScores(seed.sub_matrix, alpha, 2).attach_disk_cache()
        generator = KmerGenerator(kmer_size, alpha, three, two)

    matcher = QueryMatcher(
        table, seed, ungapped, kmer_thr, kmer_size, par.max_seqs,
        par.comp_bias_corr, par.comp_bias_corr_scale,
        par.min_ungapped_score, generator,
        take_only_best_kmer=take_only_best,
        is_nucleotide=target_is_nucl)

    # device (XLA) batched matcher: default on accelerators; the host
    # numpy matcher stays the oracle (and handles nucleotide + KMER_SCORE)
    import os

    use_device = os.environ.get("MMSEQS2_TPU_PREFILTER", "auto")
    if use_device == "auto":
        import jax
        use_device = ("device" if jax.default_backend() != "cpu"
                      else "host")
    # --taxon-list: QueryMatcherTaxonomyHook — filter double-diagonal
    # candidates by a taxonomy expression over the target mapping
    # (QueryMatcherTaxonomyHook.h:40-58); runs on the host oracle path
    taxon_mask = None
    if par.taxon_list:
        from ..taxonomy.ncbi import (MappingReader, NcbiTaxonomy,
                                     TaxonomyExpression)
        taxdb = NcbiTaxonomy.open_taxonomy(tdb_path)
        mapping = MappingReader(tdb_path)
        texpr = TaxonomyExpression(par.taxon_list, taxdb)
        taxon_mask = np.zeros(treader.size, dtype=bool)
        for tid_ in range(treader.size):
            tax = mapping.lookup(int(treader.get_db_key(tid_)))
            taxon_mask[tid_] = texpr.is_ancestor(tax)
        use_device = "host"
    device_ok = (use_device == "device" and not target_is_nucl
                 and bool(par.diag_score))
    n_splits = par.split if par.split_mode in (0, 2) else 0
    if (n_splits == 0 and device_ok and par.split_mode in (0, 2)):
        # setupSplit analogue (Prefiltering.cpp:287-310): pick the target
        # split count from the device-memory budget and the index footprint
        n_splits = _auto_split_count(treader, par)
        if n_splits > 1:
            log.info(f"Automatic target split: {n_splits} splits "
                     f"(device memory budget)")
    if n_splits > 1 and not target_is_nucl and bool(par.diag_score):
        return _run_device_splits(
            par, qreader, treader, qdb, tdb, seed, ungapped, kmer_size,
            kmer_thr, spaced, generator, take_only_best, matcher,
            query_is_profile, same_db, out_path, alpha, n_splits)
    if device_ok:
        from ..prefilter.device import DevicePrefilter
        import jax
        n_dev = jax.device_count()
        shard_env = os.environ.get("MMSEQS2_TPU_SHARD", "auto")
        use_shard = (n_dev > 1 if shard_env == "auto"
                     else shard_env not in ("0", "off", "host"))
        if use_shard and n_dev > 1:
            # target-sharded multi-chip engine: each device owns a target
            # shard + its CSR index; collectives merge (byte-identical to
            # the 1-device run — parallel/sharded_prefilter.py)
            from jax.sharding import Mesh
            from ..parallel.sharded_prefilter import ShardedPrefilter
            log.info(f"Sharding target DB over {n_dev} devices")
            dev = ShardedPrefilter(
                table.masked_seqs, seed, ungapped, kmer_thr, kmer_size,
                par.max_seqs, Mesh(np.array(jax.devices()), ("t",)),
                par.comp_bias_corr, par.comp_bias_corr_scale,
                par.min_ungapped_score, generator,
                take_only_best_kmer=take_only_best, host_fallback=matcher,
                spaced=spaced, index_kmer_thr=index_thr,
                pattern=par.spaced_kmer_pattern, full_table=table)
        else:
            dev = DevicePrefilter(
                table, seed, ungapped, kmer_thr, kmer_size, par.max_seqs,
                par.comp_bias_corr, par.comp_bias_corr_scale,
                par.min_ungapped_score, generator,
                take_only_best_kmer=take_only_best, host_fallback=matcher)
        return _run_device(par, qreader, treader, qdb, dev, matcher,
                           query_is_profile, same_db, out_path, alpha)

    return _run_host(par, qreader, treader, qdb, matcher,
                     query_is_profile, same_db, out_path, alpha,
                     taxon_mask)



def _write_hits(writer, par, treader, q_key, q_len, hits):
    check_cov = par.cov_thr > 0.0 and par.cov_mode in (0, 2, 5)
    lines = []
    for tid, score, diag in hits:
        if check_cov and not autil.can_be_covered(
                par.cov_thr, par.cov_mode, q_len,
                float(treader.get_seq_len(tid))):
            continue
        t_key = treader.get_db_key(tid)
        lines.append(f"{t_key}\t{score}\t{diag}\n")
    writer.write(q_key, "".join(lines).encode())
    return len(lines)


def _run_device(par, qreader, treader, qdb, dev, matcher, query_is_profile,
                same_db, out_path, alpha):
    """Batched device prefilter: accumulate prepared queries until the hit
    budget fills, then run one jitted device match per batch.

    Multi-host: every process computes (the sharded collectives need all
    ranks), rank 0 writes the result DB (all ranks hold identical merged
    output — the analogue of the reference's MPI master merge)."""
    import jax
    import time as _time
    _prof = os.environ.get("MMSEQS2_TPU_PROF", "") == "1"
    _t = {"wait": 0.0, "dispatch": 0.0, "write": 0.0, "prep": 0.0,
          "flushes": 0}
    is_writer = jax.process_count() == 1 or jax.process_index() == 0
    writer = (DBWriter(out_path, dbt.DBTYPE_PREFILTER_RES) if is_writer
              else None)
    use_dev0 = (not query_is_profile and hasattr(dev, "_ensure_stage0")
                and dev._ensure_stage0())
    can_prepare = hasattr(dev, "prepare_query")
    batch, budget = [], 0        # host-prepared / sharded stream
    batch0 = []                  # device-stage-0 stream (short queries)
    reslens = []

    pending = []                 # [(items, pending-handle)], 1-deep

    def flush(drain=False):
        nonlocal batch, budget
        if batch:
            queries = [b["q"] for b in batch]
            idents = [b["ident"] for b in batch]
            rps = [b.get("rp") for b in batch]
            gens = [b.get("gen") for b in batch]
            kw = {}
            if can_prepare:
                kw = {"prepared": [b["prep"] for b in batch],
                      "fixed_shape": True}
            if hasattr(dev, "match_batch_async"):
                _t0 = _time.perf_counter()
                pend = dev.match_batch_async(
                    queries, idents,
                    rescore_profiles=(rps if any(r is not None
                                                 for r in rps) else None),
                    generators=(gens if any(g is not None for g in gens)
                                else None), **kw)
                _t["dispatch"] += _time.perf_counter() - _t0
                _t["flushes"] += 1
                pending.append((batch, pend))
            else:
                hit_lists = dev.match_batch(
                    queries, idents,
                    rescore_profiles=(rps if any(r is not None
                                                 for r in rps) else None),
                    generators=(gens if any(g is not None for g in gens)
                                else None), **kw)
                _write_batch(batch, hit_lists)
            batch, budget = [], 0
        # keep two dispatches in flight (device crunches flush N and has
        # N+1 queued behind it while the host preps N+2 and writes N-1 —
        # depth 2 hides the host build+transfer time of the next flush
        # under the current flush's device execution)
        while pending and (drain or len(pending) > 2):
            items, pend = pending.pop(0)
            _t0 = _time.perf_counter()
            hit_lists = dev.match_batch_wait(pend)
            _t["wait"] += _time.perf_counter() - _t0
            _t0 = _time.perf_counter()
            _write_batch(items, hit_lists)
            _t["write"] += _time.perf_counter() - _t0

    pending0 = []                # [(items, pending-handle)], 1-deep

    def flush0(drain=False):
        nonlocal batch0
        if batch0:
            pend = dev.match_batch_seq_async(
                [b["q"] for b in batch0], [b["ident"] for b in batch0])
            pending0.append((batch0, pend))
            batch0 = []
        # keep one dispatch in flight: the device crunches flush N while
        # the host preps N+1 and writes N-1
        while pending0 and (drain or len(pending0) > 1):
            items, pend = pending0.pop(0)
            _write_batch(items, dev.match_batch_seq_wait(pend))

    def _write_batch(items, hit_lists):
        if writer is None:
            return
        for b, hits in zip(items, hit_lists):
            n = _write_hits(writer, par, treader, b["key"], b["qlen"],
                            hits)
            reslens.append(n)

    def make_item(qid):
        q_key = qreader.get_db_key(qid)
        identity_id = -1
        if same_db or par.include_identity:
            tid = treader.get_id(q_key)
            if tid >= 0:
                identity_id = tid
        item = {"key": q_key, "ident": identity_id}
        if query_is_profile:
            from ..prefilter.kmer_generator import ProfileKmerGenerator
            from ..profile.io import kmer_rows, parse_profile
            p = parse_profile(qreader.get_data(qid))
            ss, si = kmer_rows(p)
            item["gen"] = ProfileKmerGenerator(
                dev.k, alpha, ss, si, dev.index.offsets_pat)
            s = p.scores.astype(np.int64)
            rescore = np.zeros((p.length, alpha + 1), dtype=np.int64)
            rescore[:, :20] = np.sign(s) * (np.abs(s) // 4)
            item["rp"] = rescore
            item["q"] = p.query_num.astype(np.int64)
            item["qlen"] = float(p.length)
        else:
            item["q"] = qdb.seq_num(qid)
            item["qlen"] = float(qreader.get_seq_len(qid))
        return item

    def consume(item):
        nonlocal batch, budget
        if use_dev0 and len(item["q"]) <= dev.LQ0:
            # stage-0 runs on device: flush by query count; volume
            # overflow is detected on device and retried split. Queries
            # longer than the fixed LQ0 shape take the host-prepared
            # stream below so they don't force the whole batch off the
            # single-program path.
            batch0.append(item)
            if len(batch0) >= dev.B_PAD:
                flush0()
        elif can_prepare:
            # prepared up front (threaded) so the flush decision sees the
            # ACTUAL expansion volume, and every flush fits the one fixed
            # (B_PAD, H_CAP_FIXED) compiled program
            vol = int(item["prep"][1].sum())
            if batch and (budget + vol > dev.H_CAP_FIXED
                          or len(batch) >= dev.B_PAD):
                flush()
            batch.append(item)
            budget += vol
        else:
            # sharded engine: stage-0 is per-shard, batch by residues
            batch.append(item)
            budget += len(item["q"])
            if len(batch) >= 64 or budget >= 1 << 16:
                flush()

    if can_prepare:
        # host stage-0 across a thread pool, CHUNK items ahead (numpy
        # releases the GIL in the bulk ops; the reference's analogue is
        # the per-thread QueryMatcher loop, Prefiltering.cpp:605-689)
        import os as _os
        from concurrent.futures import ThreadPoolExecutor
        CHUNK = 256
        workers = min(8, _os.cpu_count() or 4)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            def prep(item):
                if not (use_dev0 and len(item["q"]) <= dev.LQ0):
                    _t0 = _time.perf_counter()
                    item["prep"] = dev.prepare_query(
                        item["q"], item.get("rp"), item.get("gen"))
                    _t["prep"] += _time.perf_counter() - _t0
                return item
            for lo in range(0, qreader.size, CHUNK):
                hi = min(lo + CHUNK, qreader.size)
                for item in pool.map(prep, map(make_item, range(lo, hi))):
                    consume(item)
    else:
        for qid in range(qreader.size):
            consume(make_item(qid))
    flush(drain=True)
    flush0(drain=True)
    if _prof:
        print(f"[prof] flushes={_t['flushes']} "
              f"dispatch={_t['dispatch']:.1f}s wait={_t['wait']:.1f}s "
              f"write={_t['write']:.1f}s prep(worker-sum)={_t['prep']:.1f}s")
    if writer is not None:
        writer.close()
        _print_statistics(None, reslens, qreader.size, par.max_seqs)
    return 0


def _parse_mem_limit(s: str) -> int:
    """'750M'/'7G'/'0' -> bytes (Util::parseByteSize semantics)."""
    s = (s or "0").strip()
    mult = 1
    if s and s[-1] in "kKmMgGtT":
        mult = {"k": 1 << 10, "m": 1 << 20,
                "g": 1 << 30, "t": 1 << 40}[s[-1].lower()]
        s = s[:-1]
    try:
        return int(float(s) * mult)
    except ValueError:
        return 0


def _device_mem_budget(par) -> int:
    """HBM budget for the resident index: --split-memory-limit if set,
    else the device's reported free memory, else a 12 GiB default."""
    lim = _parse_mem_limit(par.split_memory_limit)
    if lim > 0:
        return lim
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        cap = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if cap:
            return int(cap * 0.75)
    except Exception:
        pass
    return 12 << 30


def _auto_split_count(treader, par) -> int:
    """Target split count so the device-resident index fits the budget.

    Footprint per residue: 6 B packed index entry (u32 seq id + u16 pos,
    IndexTable.h:25-30 parity) + 1 B sequence store; + per-sequence
    bookkeeping; + ~2x headroom for the per-batch working buffers."""
    residues = treader.total_residues()
    need = int((6 + 1) * residues + 16 * treader.size) * 2
    budget = _device_mem_budget(par)
    return max(1, -(-need // max(budget, 1)))


def _run_device_splits(par, qreader, treader, qdb, tdb, seed, ungapped,
                       kmer_size, kmer_thr, spaced, generator,
                       take_only_best, matcher, query_is_profile, same_db,
                       out_path, alpha, n_splits):
    """Out-of-core target-split prefilter: per-split index build + device
    candidate stage, exact cross-split merge (prefilter/split_merge.py).
    Output is byte-identical to the unsplit run.

    Streaming shape: queries are processed in chunks whose stage-0 triples
    and per-split candidate fragments spill to disk (<out>.split_tmp), so
    RSS is bounded by one chunk regardless of query-set size — the
    reference's query-stream behavior for RAM-bound target splits
    (Prefiltering.cpp:755-786)."""
    import shutil

    from ..ops.encode import calc_local_aa_bias
    from ..prefilter.device import DevicePrefilter
    from ..prefilter.split_merge import finalize_query, self_ungapped_score

    nt = treader.size
    bounds = np.linspace(0, nt, n_splits + 1).astype(np.int64)
    log.info(f"Target split mode: {n_splits} splits of ~"
             f"{nt // max(n_splits, 1)} sequences")
    tmpdir = out_path + ".split_tmp"
    os.makedirs(tmpdir, exist_ok=True)
    QCHUNK = int(os.environ.get("MMSEQS2_TPU_SPLIT_QCHUNK", "1024"))
    nq = qreader.size
    n_chunks = max(1, -(-nq // QCHUNK))

    def chunk_range(c):
        return range(c * QCHUNK, min((c + 1) * QCHUNK, nq))

    # pass 0: per-chunk host stage-0 (triples + rescore profiles), spilled
    qmeta = []          # per query: key, ident, qlen (small)
    for c in range(n_chunks):
        codes_l, qpos_l, prof_l, qnum_l = [], [], [], []
        for qid_i in chunk_range(c):
            q_key = qreader.get_db_key(qid_i)
            identity_id = -1
            if same_db or par.include_identity:
                tid = treader.get_id(q_key)
                if tid >= 0:
                    identity_id = tid
            if query_is_profile:
                from ..prefilter.kmer_generator import ProfileKmerGenerator
                from ..profile.io import kmer_rows, parse_profile
                p = parse_profile(qreader.get_data(qid_i))
                ss, si = kmer_rows(p)
                from ..prefilter.kmer_index import pattern_offsets
                offs, _span = pattern_offsets(kmer_size, spaced,
                                              par.spaced_kmer_pattern)
                gen = ProfileKmerGenerator(kmer_size, alpha, ss, si, offs)
                q_num = p.query_num.astype(np.int64)
                s = p.scores.astype(np.int64)
                prof = np.zeros((p.length, alpha + 1), dtype=np.int32)
                prof[:, :20] = np.sign(s) * (np.abs(s) // 4)
                q_len = float(p.length)
                comp_bias = np.zeros(len(q_num), np.float32)
            else:
                gen = generator
                q_num = qdb.seq_num(qid_i)
                q_len = float(qreader.get_seq_len(qid_i))
                comp_bias = (calc_local_aa_bias(
                    q_num, seed.sub_matrix, seed.pback,
                    par.comp_bias_corr_scale) if par.comp_bias_corr
                    else np.zeros(len(q_num), np.float32))
                corr = np.trunc(np.where(comp_bias < 0.0,
                                         comp_bias / 4 - 0.5,
                                         comp_bias / 4 + 0.5)).astype(
                                             np.int32)
                prof = (ungapped.sub_matrix[q_num, :].astype(np.int32)
                        + corr[:, None])
            tmp_dev = DevicePrefilter.__new__(DevicePrefilter)
            # minimal stage-0 state (query_triples only touches these)
            tmp_dev.index = _Stage0Index(alpha, kmer_size, spaced,
                                         par.spaced_kmer_pattern)
            tmp_dev.kmer_thr = kmer_thr
            tmp_dev.take_only_best = take_only_best
            tmp_dev.generator = gen
            tmp_dev.x_index = seed.alphabet_size - 1
            codes, qpos = DevicePrefilter.query_triples(
                tmp_dev, q_num, comp_bias, gen)
            codes_l.append(codes)
            qpos_l.append(qpos)
            prof_l.append(prof)
            qnum_l.append(q_num.astype(np.int32))
            qmeta.append(dict(key=q_key, ident=identity_id, qlen=q_len))
        np.savez(os.path.join(tmpdir, f"q{c}.npz"),
                 codes=np.concatenate(codes_l) if codes_l else
                 np.zeros(0, np.int64),
                 qpos=np.concatenate(qpos_l) if qpos_l else
                 np.zeros(0, np.int32),
                 k_of=np.array([len(x) for x in codes_l], np.int64),
                 prof=np.concatenate(prof_l) if prof_l else
                 np.zeros((0, alpha + 1), np.int32),
                 p_of=np.array([len(p) for p in prof_l], np.int64),
                 qnum=np.concatenate(qnum_l) if qnum_l else
                 np.zeros(0, np.int32),
                 n_of=np.array([len(x) for x in qnum_l], np.int64))

    def load_chunk(c):
        z = np.load(os.path.join(tmpdir, f"q{c}.npz"))
        ko = np.concatenate([[0], np.cumsum(z["k_of"])]).astype(np.int64)
        po = np.concatenate([[0], np.cumsum(z["p_of"])]).astype(np.int64)
        no = np.concatenate([[0], np.cumsum(z["n_of"])]).astype(np.int64)
        return z, ko, po, no

    # per-split candidate fragments, spilled per (split, chunk)
    for s_i in range(n_splits):
        lo, hi = int(bounds[s_i]), int(bounds[s_i + 1])
        table = build_index(tdb, seed, kmer_size,
                            0 if query_is_profile else kmer_thr,
                            par.mask == 1, par.mask_prob,
                            par.mask_lower_case == 1, spaced,
                            par.spaced_kmer_pattern, seq_range=(lo, hi))
        dev = DevicePrefilter(
            table, seed, ungapped, kmer_thr, kmer_size, par.max_seqs,
            par.comp_bias_corr, par.comp_bias_corr_scale,
            par.min_ungapped_score, generator,
            take_only_best_kmer=take_only_best)
        BATCH = 64
        for c in range(n_chunks):
            z, ko, po, no = load_chunk(c)
            rows = list(chunk_range(c))
            out_ids, out_diag, out_sc = [], [], []
            out_eids, out_ev = [], []
            for b0 in range(0, len(rows), BATCH):
                sub = range(b0, min(b0 + BATCH, len(rows)))
                prepared, qlens = [], []
                for r in sub:
                    codes = z["codes"][ko[r]:ko[r + 1]]
                    qpos = z["qpos"][ko[r]:ko[r + 1]]
                    st, ct = table.lists(codes)
                    nz = ct > 0
                    prepared.append((st[nz].astype(np.int32),
                                     ct[nz].astype(np.int32), qpos[nz],
                                     z["prof"][po[r]:po[r + 1]]))
                    qlens.append(int(no[r + 1] - no[r]))
                got = dev.candidates_batch(prepared, qlens)
                for j, r in enumerate(sub):
                    ids_l, diags, scores, exacts = got[j]
                    out_ids.append(ids_l + lo)
                    out_diag.append(diags)
                    out_sc.append(scores)
                    ek = np.array([[i + lo, d] for (i, d) in exacts],
                                  np.int64).reshape(-1, 2)
                    out_eids.append(ek)
                    out_ev.append(np.array(list(exacts.values()),
                                           np.int64))
            np.savez(os.path.join(tmpdir, f"f{s_i}_{c}.npz"),
                     ids=np.concatenate(out_ids) if out_ids else
                     np.zeros(0, np.int64),
                     diag=np.concatenate(out_diag) if out_diag else
                     np.zeros(0, np.uint16),
                     sc=np.concatenate(out_sc) if out_sc else
                     np.zeros(0, np.int64),
                     n_of=np.array([len(x) for x in out_ids], np.int64),
                     ek=np.concatenate(out_eids) if out_eids else
                     np.zeros((0, 2), np.int64),
                     ev=np.concatenate(out_ev) if out_ev else
                     np.zeros(0, np.int64),
                     e_of=np.array([len(x) for x in out_ev], np.int64))
        del dev, table

    # exact cross-split merge, chunk-streamed
    writer = DBWriter(out_path, dbt.DBTYPE_PREFILTER_RES)
    for c in range(n_chunks):
        z, ko, po, no = load_chunk(c)
        rows = list(chunk_range(c))
        fz = [np.load(os.path.join(tmpdir, f"f{s}_{c}.npz"))
              for s in range(n_splits)]
        f_of = [np.concatenate([[0], np.cumsum(f["n_of"])]).astype(np.int64)
                for f in fz]
        e_of = [np.concatenate([[0], np.cumsum(f["e_of"])]).astype(np.int64)
                for f in fz]
        for r, qid_i in enumerate(rows):
            m = qmeta[qid_i]
            ids = np.concatenate([fz[s]["ids"][f_of[s][r]:f_of[s][r + 1]]
                                  for s in range(n_splits)])
            diags = np.concatenate(
                [fz[s]["diag"][f_of[s][r]:f_of[s][r + 1]]
                 for s in range(n_splits)])
            scores = np.concatenate(
                [fz[s]["sc"][f_of[s][r]:f_of[s][r + 1]]
                 for s in range(n_splits)])
            exacts = {}
            for s in range(n_splits):
                ek = fz[s]["ek"][e_of[s][r]:e_of[s][r + 1]]
                ev = fz[s]["ev"][e_of[s][r]:e_of[s][r + 1]]
                for (i, d), v in zip(ek, ev):
                    exacts[(int(i), int(d))] = int(v)

            def exact_fn(eids, ediags, _ex=exacts):
                return np.array([_ex[(int(i), int(d))]
                                 for i, d in zip(eids, ediags)], np.int64)

            prof = z["prof"][po[r]:po[r + 1]].astype(np.int64)
            q_num = z["qnum"][no[r]:no[r + 1]].astype(np.int64)
            self_sc = self_ungapped_score(prof, q_num)
            hits = finalize_query(ids, diags, scores, par.max_seqs,
                                  par.min_ungapped_score, m["ident"],
                                  exact_fn, self_sc)
            _write_hits(writer, par, treader, m["key"], m["qlen"], hits)
    writer.close()
    shutil.rmtree(tmpdir, ignore_errors=True)
    return 0


class _Stage0Index:
    """The slice of KmerIndexTable that query_triples needs (spaced
    pattern + alphabet) without building any posting lists."""

    def __init__(self, alpha, kmer_size, spaced, pattern):
        from ..prefilter.kmer_index import pattern_offsets
        self.alpha = alpha
        self.k = kmer_size
        self.offsets_pat, self.span = pattern_offsets(kmer_size, spaced,
                                                      pattern)


def _print_statistics(stats_acc, reslens, n_queries, max_results):
    """Prefiltering::printStatistics (Prefiltering.cpp:984-1006)."""
    if n_queries == 0:
        return
    if stats_acc is not None:
        kpp, dbm, dbl = stats_acc
        log.info(f"\n{kpp / n_queries:g} k-mers per position")
        log.info(f"{dbm // n_queries} DB matches per sequence")
        log.info("0 overflows")
    passed = sum(reslens) // n_queries
    msg = f"{passed} sequences passed prefiltering per query sequence"
    if passed > max_results:
        log.warning(msg + f" (ATTENTION: max. {max_results} best scoring "
                    "sequences were written to the output prefiltering "
                    "database)")
    else:
        log.info(msg)
    sl = sorted(reslens)
    log.info(f"{sl[len(sl) // 2]} median result list length")
    log.info(f"{sum(1 for r in reslens if r == 0)} sequences with 0 size "
             "result lists")

def _run_host(par, qreader, treader, qdb, matcher, query_is_profile,
              same_db, out_path, alpha, taxon_mask=None):
    """Per-query host (numpy oracle) matching loop."""
    table = matcher.index
    kmer_size = matcher.k
    writer = DBWriter(out_path, dbt.DBTYPE_PREFILTER_RES)
    stats_acc = [0.0, 0, 0]
    reslens = []
    for qid in range(qreader.size):
        q_key = qreader.get_db_key(qid)
        identity_id = -1
        if same_db or par.include_identity:
            tid = treader.get_id(q_key)
            if tid >= 0:
                identity_id = tid
        if query_is_profile:
            from ..prefilter.kmer_generator import ProfileKmerGenerator
            from ..profile.io import kmer_rows, parse_profile
            p = parse_profile(qreader.get_data(qid))
            ss, si = kmer_rows(p)
            matcher.generator = ProfileKmerGenerator(
                kmer_size, alpha, ss, si, table.offsets_pat)
            # (L, 21) diagonal-rescore profile: pssm/4 trunc, X column 0
            s = p.scores.astype(np.int64)
            rescore = np.zeros((p.length, alpha + 1), dtype=np.int64)
            rescore[:, :20] = np.sign(s) * (np.abs(s) // 4)
            hits = matcher.match(p.query_num.astype(np.int64), identity_id,
                                 diagonal_scoring=bool(par.diag_score),
                                 rescore_profile=rescore,
                                 allowed_mask=taxon_mask)
            q_len = float(p.length)
        else:
            hits = matcher.match(qdb.seq_num(qid), identity_id,
                                 diagonal_scoring=bool(par.diag_score),
                                 allowed_mask=taxon_mask)
            q_len = float(qreader.get_seq_len(qid))
        check_cov = par.cov_thr > 0.0 and par.cov_mode in (0, 2, 5)
        lines = []
        for tid, score, diag in hits:
            # output coverage gate (Prefiltering.cpp:885-893)
            if check_cov and not autil.can_be_covered(
                    par.cov_thr, par.cov_mode, q_len,
                    float(treader.get_seq_len(tid))):
                continue
            t_key = treader.get_db_key(tid)
            lines.append(f"{t_key}\t{score}\t{diag}\n")
        writer.write(q_key, "".join(lines).encode())
        stats_acc[0] += matcher.stats.kmers_per_pos
        stats_acc[1] += matcher.stats.db_matches
        stats_acc[2] += matcher.stats.double_matches
        reslens.append(len(lines))
    writer.close()
    _print_statistics(stats_acc, reslens, qreader.size, par.max_seqs)
    return 0
