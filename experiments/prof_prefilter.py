"""Profile the device k-mer prefilter stages on the bench-shaped 50k index.

Times: host stage-0, transfer, full _device_match, and each device stage
jitted separately (same shapes) to locate the bottleneck.
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from mmseqs2_tpu.data.submat import get_submat
from mmseqs2_tpu.prefilter.device import DevicePrefilter, _device_match
from mmseqs2_tpu.prefilter.index_io import load_index
from mmseqs2_tpu.prefilter.kmer_generator import KmerGenerator, SubKmerScores
from mmseqs2_tpu.prefilter import device_stages as ds

root = pathlib.Path(__file__).parent.parent
idx = root / ".bench_cache" / "scale_50k" / "tdb.idx"
seed = get_submat("VTML80.out", 8.0, -0.2)
ungapped = get_submat("blosum62.out", 2.0, -0.2)
alpha = seed.alphabet_size - 1
k, thr = 6, 112
t0 = time.perf_counter()
table, meta = load_index(str(idx))
print(f"load_index: {time.perf_counter()-t0:.2f}s")
three = SubKmerScores(seed.sub_matrix, alpha, 3)
two = SubKmerScores(seed.sub_matrix, alpha, 2)
gen = KmerGenerator(k, alpha, three, two)
t0 = time.perf_counter()
dev = DevicePrefilter(table, seed, ungapped, thr, k, 300, generator=gen)
print(f"DevicePrefilter init (incl device upload): {time.perf_counter()-t0:.2f}s")

rng = np.random.default_rng(0)
n_queries = 16
queries = []
for _ in range(n_queries):
    s = np.asarray(table.masked_seqs[int(rng.integers(len(table.masked_seqs)))]).astype(np.int64)
    s = s[:350]
    mut = rng.random(len(s)) < 0.25
    s = s.copy()
    s[mut] = rng.integers(0, 20, size=int(mut.sum()))
    queries.append(s)
idents = [-1] * n_queries

# host stage-0
t0 = time.perf_counter()
prepared = [dev.prepare_query(q) for q in queries]
dt0 = time.perf_counter() - t0
total = sum(int(p[1].sum()) for p in prepared)
K = sum(len(p[0]) for p in prepared)
print(f"stage-0 host: {dt0:.3f}s for {n_queries} queries, K={K} lists, "
      f"total={total} expansions")

# full match_batch timing (includes stage-0)
r = dev.match_batch(queries, idents)
t0 = time.perf_counter()
iters = 3
for _ in range(iters):
    r = dev.match_batch(queries, idents)
dt = (time.perf_counter() - t0) / iters
print(f"match_batch: {dt:.3f}s/batch -> {total/ (dt):.2e} expansions/s")

# now device-only: prebuild inputs once
starts = np.concatenate([p[0] for p in prepared])
counts = np.concatenate([p[1] for p in prepared])
qpos = np.concatenate([p[2] for p in prepared])
qid = np.concatenate([np.full(len(p[2]), b, np.int32)
                      for b, p in enumerate(prepared)])
profs = [p[3] for p in prepared]
qlens = [len(q) for q in queries]
lq_max = ds.bucket(max(qlens), 64)
a2 = ungapped.alphabet_size
prof_pad = np.full((n_queries, lq_max, a2), -128, np.int32)
for b in range(n_queries):
    prof_pad[b, :qlens[b], :profs[b].shape[1]] = profs[b]
ln_max = ds.bucket(min(lq_max, dev.max_t_len), 64)
K = len(starts)
k_cap = ds.bucket(max(K, 1))
h_cap = ds.bucket(max(total, 1), 4096)
pad = k_cap - K
starts_p = np.pad(starts, (0, pad))
counts_p = np.pad(counts, (0, pad))
qpos_p = np.pad(qpos, (0, pad))
qid_p = np.pad(qid, (0, pad), constant_values=n_queries - 1)
out_sz = ds.bucket(n_queries * 300, 256)
c_cap = h_cap
print(f"shapes: k_cap={k_cap} h_cap={h_cap} lq_max={lq_max} ln_max={ln_max}")

d_in = [jnp.asarray(x) for x in (starts_p, counts_p, qpos_p, qid_p)]
d_prof = jnp.asarray(prof_pad)
d_qlens = jnp.asarray(np.array(qlens, np.int32))
d_ident = jnp.asarray(np.array(idents, np.int32))

args = (*d_in, dev.d_entries_seq, dev.d_entries_pos,
        dev.d_t_cat, dev.d_t_offsets, dev.d_t_lens,
        d_prof, d_qlens, d_ident)
kw = dict(h_cap=h_cap, c_cap=c_cap, n_q=n_queries, lq_max=lq_max,
          ln_max=ln_max, max_hits=300, min_diag_thr=15,
          chunk=min(4096, c_cap), out_sz=out_sz)
o = _device_match(*args, **kw)
jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(iters):
    o = _device_match(*args, **kw)
jax.block_until_ready(o)
dt = (time.perf_counter() - t0) / iters
print(f"_device_match device-only: {dt:.3f}s -> {total/dt:.2e} expansions/s")

# stage-by-stage
import functools

@functools.partial(jax.jit, static_argnames=("h_cap", "c_cap"))
def s_cand(starts, counts, qpos, qid, es, ep, *, h_cap, c_cap):
    return ds.stage_candidates(starts, counts, qpos, qid, es, ep,
                               h_cap=h_cap, c_cap=c_cap)

o1 = s_cand(*d_in, dev.d_entries_seq, dev.d_entries_pos, h_cap=h_cap,
            c_cap=c_cap)
jax.block_until_ready(o1)
t0 = time.perf_counter()
for _ in range(iters):
    o1 = s_cand(*d_in, dev.d_entries_seq, dev.d_entries_pos, h_cap=h_cap,
                c_cap=c_cap)
jax.block_until_ready(o1)
print(f"stage_candidates: {(time.perf_counter()-t0)/iters:.3f}s")
cqid, cid, cdiag, cvalid, n_cand, tot = o1
print(f"  n_cand={int(n_cand)} total={int(tot)}")

@functools.partial(jax.jit, static_argnames=("lq_max", "ln_max", "chunk"))
def s_rescore(t_cat, t_off, t_lens, prof, q_lens, cqid, cid, cdiag, cvalid,
              n_cand, *, lq_max, ln_max, chunk):
    rescore = ds.make_rescore(t_cat, t_off, t_lens, prof, q_lens,
                              lq_max=lq_max, ln_max=ln_max, chunk=chunk)
    return rescore(cqid, cid, cdiag, cvalid, cap=True, n_valid=n_cand)

o2 = s_rescore(dev.d_t_cat, dev.d_t_offsets, dev.d_t_lens, d_prof, d_qlens,
               cqid, cid, cdiag, cvalid, n_cand,
               lq_max=lq_max, ln_max=ln_max, chunk=min(4096, c_cap))
jax.block_until_ready(o2)
t0 = time.perf_counter()
for _ in range(iters):
    o2 = s_rescore(dev.d_t_cat, dev.d_t_offsets, dev.d_t_lens, d_prof,
                   d_qlens, cqid, cid, cdiag, cvalid, n_cand,
                   lq_max=lq_max, ln_max=ln_max, chunk=min(4096, c_cap))
jax.block_until_ready(o2)
print(f"rescore: {(time.perf_counter()-t0)/iters:.3f}s")

@functools.partial(jax.jit, static_argnames=("c_cap", "n_q"))
def s_rest(cqid, cid, cdiag, cscore, cvalid, ident, *, c_cap, n_q):
    is_best = ds.stage_keepmax(cqid, cid, cscore, cvalid, c_cap=c_cap)
    hist = ds.stage_hist(cqid, cscore, is_best, n_q=n_q, c_cap=c_cap)
    thr, trunc = ds.threshold_from_hist(hist, 300, 15)
    return ds.stage_select(cqid, cid, cdiag, cscore, cvalid, is_best, thr,
                           ident, c_cap=c_cap, max_hits=300, out_sz=out_sz)

o3 = s_rest(cqid, cid, cdiag, o2, cvalid, d_ident, c_cap=c_cap,
            n_q=n_queries)
jax.block_until_ready(o3)
t0 = time.perf_counter()
for _ in range(iters):
    o3 = s_rest(cqid, cid, cdiag, o2, cvalid, d_ident, c_cap=c_cap,
                n_q=n_queries)
jax.block_until_ready(o3)
print(f"keepmax+hist+select: {(time.perf_counter()-t0)/iters:.3f}s")
