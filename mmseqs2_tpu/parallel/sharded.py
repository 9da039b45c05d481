"""Multi-chip sharded search step.

TPU-native replacement for the reference's split machinery (SURVEY §2.9):
  - target-DB split (Prefiltering.cpp:755-786 file merge) -> the target
    sequence store is sharded over the mesh 't' axis; per-shard top-k hit
    lists merge via all_gather + top_k instead of k-way file merges
  - query parallelism (OpenMP loop) -> queries sharded over the 'q' axis
    (pure data parallelism)

The step below computes gapless best-diagonal scores of every (query, target)
pair, takes the per-shard top-k, and merges across target shards with an
all-gather collective — the exact dataflow of `prefilter` at pod scale.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import dp


def _pair_scores(profiles, targets, caps):
    """(NQ, NT) gapless scores: all queries x all targets (local shard)."""
    nq = profiles.shape[0]
    nt = targets.shape[0]
    qidx = jnp.repeat(jnp.arange(nq, dtype=jnp.int32), nt)
    tgt = jnp.tile(targets, (nq, 1))
    cap = jnp.tile(caps, nq)
    scores = dp.gapless_scan(profiles, qidx, tgt, cap)
    return scores.reshape(nq, nt)


def make_sharded_search_step(mesh: Mesh, top_k: int):
    """Build a pjit-able sharded search step over mesh axes ('q', 't').

    Inputs:
      profiles (NQ, A, Lq) int32  — sharded over 'q'
      targets  (NT, Lt) int32     — sharded over 't' (the "model" state)
      caps     (NT,) int32        — sharded over 't'
    Returns (scores (NQ, top_k), global target indices (NQ, top_k)),
    sharded over 'q'.
    """
    n_t = mesh.shape["t"]

    @partial(shard_map, mesh=mesh,
             in_specs=(P("q", None, None), P("t", None), P("t")),
             out_specs=(P("q", None), P("q", None)),
             check_rep=False)
    def step(profiles, targets, caps):
        nt_local = targets.shape[0]
        t_idx = jax.lax.axis_index("t")
        scores = _pair_scores(profiles, targets, caps)        # (NQl, NTl)
        k_local = min(top_k, nt_local)
        s_loc, i_loc = jax.lax.top_k(scores, k_local)
        i_glob = i_loc + t_idx * nt_local
        # merge across target shards: all_gather + re-top-k
        s_all = jax.lax.all_gather(s_loc, "t", axis=1)        # (NQl, n_t, k)
        i_all = jax.lax.all_gather(i_glob, "t", axis=1)
        s_flat = s_all.reshape(s_all.shape[0], n_t * k_local)
        i_flat = i_all.reshape(i_all.shape[0], n_t * k_local)
        k_out = min(top_k, n_t * k_local)
        s_top, sel = jax.lax.top_k(s_flat, k_out)
        i_top = jnp.take_along_axis(i_flat, sel, axis=1)
        return s_top, i_top

    return step
