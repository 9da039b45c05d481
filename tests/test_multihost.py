"""Multi-host runtime helpers (parallel/multihost.py)."""

import numpy as np

from mmseqs2_tpu.parallel import multihost


def test_noop_without_env(monkeypatch):
    monkeypatch.delenv("MMSEQS_COORDINATOR", raising=False)
    assert multihost.init_multihost() is False


def test_global_device_mesh():
    import jax
    mesh = multihost.global_device_mesh()
    assert mesh.shape["t"] == len(jax.devices())
    assert mesh.shape["q"] == 1
    mesh2 = multihost.global_device_mesh(t_axis=0, q_axis=2)
    assert mesh2.shape["t"] * mesh2.shape["q"] == len(jax.devices())


def test_process_shard_covers_all():
    lo, hi = multihost.process_shard(100)
    assert lo == 0 and hi == 100   # single-process
