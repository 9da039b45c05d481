"""Multi-host runtime initialization.

The reference scales across nodes with MPI (`RUNNER="mpirun ..."` around
each workflow step, Prefiltering.cpp:605-689 splits by rank and merges
files). TPU-native replacement: one process per host joins a JAX
distributed cluster (`jax.distributed.initialize`); every command then
sees the global device set, and the existing `parallel/sharded_prefilter`
mesh code shards the target DB over ALL hosts' chips with its collectives
riding ICI/DCN — no rank-aware file splitting or merge step needed, the
psum/all_gather merge IS the reduction.

Environment contract (set by the launcher on every host):
  MMSEQS_COORDINATOR  host:port of process 0 (required to enable)
  MMSEQS_NUM_PROCS    number of processes in the cluster
  MMSEQS_PROC_ID      this process's rank (0-based)

With MMSEQS_COORDINATOR unset, init is a no-op and the session stays
single-host (the common case; nothing changes for local runs).
"""

import os

from ..utils import log

_initialized = False


def init_multihost() -> bool:
    """Join the JAX distributed cluster if the env contract is present.

    Returns True if a multi-process cluster was initialized (or already
    was), False for single-host operation. Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("MMSEQS_COORDINATOR", "")
    if not coord:
        return False
    num = int(os.environ.get("MMSEQS_NUM_PROCS", "1"))
    pid = int(os.environ.get("MMSEQS_PROC_ID", "0"))
    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=num, process_id=pid)
    _initialized = True
    log.info(f"multi-host runtime: process {pid}/{num} joined "
             f"coordinator {coord}; {len(jax.devices())} global devices "
             f"({len(jax.local_devices())} local)")
    return True


def global_device_mesh(t_axis: int = 0, q_axis: int = 1):
    """Build the ('t', 'q') Mesh over the GLOBAL device set.

    t_axis/q_axis: requested sizes; 0 = put all remaining devices there.
    Defaults to sharding targets over every device ('t' = all, 'q' = 1),
    which matches the sharded-prefilter dataflow (queries replicated,
    target shards reduced by collectives).
    """
    import numpy as np
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = len(devices)
    if t_axis == 0 and q_axis in (0, 1):
        t_axis, q_axis = n, 1
    elif t_axis == 0:
        t_axis = n // q_axis
    elif q_axis == 0:
        q_axis = n // t_axis
    if t_axis * q_axis != n:
        raise ValueError(f"mesh {t_axis}x{q_axis} != {n} devices")
    return Mesh(devices.reshape(t_axis, q_axis), ("t", "q"))


def process_shard(total: int):
    """Contiguous [lo, hi) slice of `total` items owned by this process —
    the host-side data split that pairs with the device mesh (each host
    loads only its target shard from disk)."""
    import jax

    pid = jax.process_index()
    n = jax.process_count()
    per = -(-total // n)
    lo = min(pid * per, total)
    return lo, min(lo + per, total)
