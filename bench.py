"""Benchmark: Smith-Waterman cell updates per second on the current device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Methodology: dispatch many kernel invocations asynchronously and sync once —
per-call dispatch overhead through the runtime tunnel is ~25ms, which halved
round-1's reported numbers. The headline metric is the gapped affine SW scan
WITH end-position tracking (the align-stage kernel, same as round 1);
the gapless prefilter scan (the reference GPU path's actual filter,
libmarv/CUDASW++ 4.0 class ~1000 GCUPS on A100/H100, SURVEY.md §6) is
reported to stderr. vs_baseline = gapped GCUPS / 1000.
"""

import json
import sys
import time

import numpy as np


def bench_async(fn, args, cells, iters=30, warmup=2, trials=3):
    """Best-of-`trials` GCUPS (each trial = `iters` async dispatches, one
    sync). NOTE: best-of-N methodology since round 2 — numbers before
    BENCH_r02.json were single-run and read slightly lower under load."""
    for _ in range(warmup):
        np.asarray(fn(*args)[0] if isinstance(fn(*args), (tuple, list))
                   else fn(*args))
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn(*args)
        r = r[0] if isinstance(r, (tuple, list)) else r
        np.asarray(r)
        dt = time.perf_counter() - t0
        best = max(best, cells * iters / dt / 1e9)
    return best




def _bench_kmer_prefilter(rng, n_targets=10000, t_len=350, n_queries=64):
    """Device k-mer prefilter throughput: k-mer match expansions/s against
    the cached BASELINE-shaped 50k-target index when present (realistic
    posting-list density), else a synthetic random index (much sparser —
    matches/s reads low there because real matches are rare)."""
    import pathlib
    import time

    import numpy as np

    from mmseqs2_tpu.commands.prefilter_kmer import build_index
    from mmseqs2_tpu.data.submat import get_submat
    from mmseqs2_tpu.prefilter.device import DevicePrefilter
    from mmseqs2_tpu.prefilter.kmer_generator import (KmerGenerator,
                                                      SubKmerScores)

    seed = get_submat("VTML80.out", 8.0, -0.2)
    ungapped = get_submat("blosum62.out", 2.0, -0.2)
    alpha = seed.alphabet_size - 1

    k, thr = 6, 112
    table = None
    idx = (pathlib.Path(__file__).parent / ".bench_cache" / "scale_50k"
           / "tdb.idx")
    if idx.exists():
        try:
            from mmseqs2_tpu.prefilter.index_io import load_index
            cand, meta = load_index(str(idx))
            if cand.k == k and meta.get("kmer_thr") == thr:
                table = cand
        except Exception:
            table = None
    if table is None:
        _seqs = rng.integers(0, 20, size=(n_targets, t_len)).astype(
            np.int64)

        class FakeDB:
            size = n_targets

            def seq_num(self, i):
                return _seqs[i]

        table = build_index(FakeDB(), seed, k, thr, False, 0.9, False,
                            True, "")
    three = SubKmerScores(seed.sub_matrix, alpha, 3)
    two = SubKmerScores(seed.sub_matrix, alpha, 2)
    gen = KmerGenerator(k, alpha, three, two)
    dev = DevicePrefilter(table, seed, ungapped, thr, k, 300,
                          generator=gen)
    # queries = mutated copies of random targets (realistic hit density)
    queries = []
    for _ in range(n_queries):
        s = np.asarray(table.masked_seqs[
            int(rng.integers(len(table.masked_seqs)))]).astype(np.int64)
        s = s[:t_len] if len(s) > t_len else s
        mut = rng.random(len(s)) < 0.25
        s = s.copy()
        s[mut] = rng.integers(0, 20, size=int(mut.sum()))
        queries.append(s)
    idents = [-1] * n_queries
    # count match expansions = sum of posting-list lengths hit per query
    total_matches = 0
    for q in queries:
        from mmseqs2_tpu.ops.encode import calc_local_aa_bias
        cb = calc_local_aa_bias(q, ungapped.sub_matrix.astype(np.int32),
                                ungapped.pback, 1.0)
        codes, qpos = dev.query_triples(q, cb, gen)
        starts = table.offsets[codes]
        total_matches += int((table.offsets[codes + 1] - starts).sum())
    prepared = [dev.prepare_query(q) for q in queries]
    dev.match_batch(queries, idents, prepared=prepared,
                    fixed_shape=True)         # warmup/compile
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        # production flush path: host stage-0 precomputed (threaded in
        # _run_device), one fixed-shape device program, async pipeline
        pend = dev.match_batch_async(queries, idents, prepared=prepared,
                                     fixed_shape=True)
        r = dev.match_batch_wait(pend)
    dt = time.perf_counter() - t0
    return total_matches * iters / dt

def _bench_easy_search(n_targets=50_000, n_queries=128):
    """End-to-end `easy-search` queries/s vs a BASELINE-config-2-shaped
    target DB (prebuilt, cached in .bench_cache with a prebuilt .idx).
    Exercises the whole pipeline: stage-0, device prefilter, batched
    align, convertalis. Disable with MMSEQS2_TPU_BENCH_E2E=0."""
    import os
    import pathlib
    import subprocess
    import tempfile

    root = pathlib.Path(__file__).parent
    cache = root / ".bench_cache" / f"scale_{n_targets // 1000}k"
    env = dict(os.environ)
    if not (cache / "targets.fasta").exists():
        subprocess.run(
            [sys.executable, str(root / "experiments" / "make_scale_db.py"),
             str(cache), str(n_targets), str(n_queries)],
            check=True, env=env)

    def cli(*args, timeout=1800):
        subprocess.run([sys.executable, "-m", "mmseqs2_tpu", *args],
                       check=True, env=env, timeout=timeout,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    tdb = str(cache / "tdb")
    if not os.path.exists(tdb + ".dbtype"):
        cli("createdb", str(cache / "targets.fasta"), tdb)
    from mmseqs2_tpu.prefilter.index_io import index_path_for
    if index_path_for(tdb) is None:
        with tempfile.TemporaryDirectory() as td:
            # search runs at -s 5.7 (Search.cpp:24); the index must match
            cli("createindex", tdb, td, "-s", "5.7")

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        cli("easy-search", str(cache / "queries.fasta"), tdb,
            os.path.join(td, "out.m8"), os.path.join(td, "tmp"))
        dt = time.perf_counter() - t0
        n_lines = sum(1 for _ in open(os.path.join(td, "out.m8")))
    return n_queries / dt, n_lines, dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    alpha, lq, lt, batch = 32, 512, 512, 4096
    if jax.default_backend() != "cpu":
        batch = 16384        # amortize the ~25ms tunnel dispatch overhead
    profile = rng.integers(-4, 11, size=(alpha, lq)).astype(np.int32)
    targets_t = rng.integers(0, 20, size=(lt, batch)).astype(np.int32)
    cells = batch * lq * lt

    if jax.default_backend() == "cpu":
        from mmseqs2_tpu.ops import dp
        qidx = jnp.zeros(batch, jnp.int32)
        fn = jax.jit(lambda p, t: dp.sw_scan(p[None], qidx, t.T, 11, 1))
        gcups = bench_async(fn, (jnp.asarray(profile),
                                 jnp.asarray(targets_t)), cells, iters=2,
                            trials=1)
        gapless = 0.0
    else:
        from mmseqs2_tpu.ops.pallas_sw import (gapless_pallas_score,
                                               sw_pallas)
        dp_prof = jnp.asarray(profile)
        dp_tgt = jnp.asarray(targets_t)
        gcups = bench_async(
            lambda p, t: sw_pallas(p, t, go=11, ge=1),
            (dp_prof, dp_tgt), cells)
        gapless = bench_async(
            lambda p, t: gapless_pallas_score(p, t),
            (dp_prof, dp_tgt), cells)
    print(f"gapless prefilter scan: {gapless:.1f} GCUPS/chip",
          file=sys.stderr)

    # secondary metric (stderr): device k-mer prefilter throughput —
    # query-position x posting-list match expansions per second on a
    # synthetic 50k-sequence target index (the engine behind `prefilter`)
    try:
        kmps = _bench_kmer_prefilter(rng)
        print(f"kmer prefilter: {kmps / 1e6:.1f} M matches/s",
              file=sys.stderr)
    except Exception as e:        # never let the side metric kill bench
        kmps = 0.0
        print(f"kmer prefilter bench skipped: {e}", file=sys.stderr)

    # end-to-end easy-search throughput (BASELINE driver metric:
    # "easy-search queries/s"); prebuilt 50k-target DB + .idx
    import os
    import pathlib
    qps = hits = e2e_dt = 0
    qps500 = hits500 = 0
    if os.environ.get("MMSEQS2_TPU_BENCH_E2E", "1") != "0":
        try:
            qps, hits, e2e_dt = _bench_easy_search()
            print(f"easy-search e2e: {qps:.2f} queries/s "
                  f"(128 q vs 50k targets, {hits} hits, {e2e_dt:.0f}s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"easy-search e2e bench skipped: {e}", file=sys.stderr)
        # BASELINE config-2-scale run (1k queries vs 500k targets), only
        # when its prebuilt cache exists (building it costs ~12 min)
        c500 = (pathlib.Path(__file__).parent / ".bench_cache"
                / "scale_500k" / "tdb.idx")
        if c500.exists():
            try:
                qps500, hits500, dt500 = _bench_easy_search(
                    n_targets=500_000, n_queries=1000)
                print(f"easy-search 500k: {qps500:.2f} queries/s "
                      f"(1000 q vs 500k targets, {hits500} hits, "
                      f"{dt500:.0f}s)", file=sys.stderr)
            except Exception as e:
                print(f"easy-search 500k bench skipped: {e}",
                      file=sys.stderr)
    print(json.dumps({
        "metric": "sw_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS/chip",
        "vs_baseline": round(gcups / 1000.0, 4),
        "extra": {
            "gapless_gcups": round(gapless, 1),
            "kmer_matches_per_s": round(kmps, 0),
            "easy_search_qps": round(qps, 3),
            "easy_search_hits": hits,
            "easy_search_500k_qps": round(qps500, 3),
            "easy_search_500k_hits": hits500,
        },
    }))


if __name__ == "__main__":
    main()
