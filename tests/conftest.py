"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env before any jax import so sharding tests can build an 8-device
mesh without TPU hardware. Set MMSEQS2_TPU_TEST_BACKEND=tpu to run on a real
chip instead.
"""

import os

if os.environ.get("MMSEQS2_TPU_TEST_BACKEND", "cpu") == "cpu":
    # the axon TPU plugin self-registers from sitecustomize when this is set
    # and overrides JAX_PLATFORMS; clear it so tests really run on CPU
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def query_fasta():
    p = REFERENCE / "examples" / "QUERY.fasta"
    if not p.exists():
        pytest.skip("reference examples not available")
    return str(p)
