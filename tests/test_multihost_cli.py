"""Multi-host integration: 2 local processes under the MMSEQS_COORDINATOR
contract run the sharded `prefilter` command path and must produce output
byte-identical to the single-process run (VERDICT r2 next-9; the analogue
of the reference's MPI regression flavor, azure-pipelines.yml:70-105).

jax.distributed with the CPU backend runs multiple processes on one
machine; each process owns 4 virtual devices of an 8-device global mesh.
"""

import os
import pathlib
import socket
import subprocess
import sys

import jax
import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

GOLDEN = pathlib.Path(__file__).parent / "golden" / "toy"

DRIVER = r"""
import sys
from mmseqs2_tpu.cli import main
sys.exit(main(["prefilter", sys.argv[1], sys.argv[2], sys.argv[3]]))
"""


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse(args, cmd, cmd.min_db, cmd.max_db)
    assert cmd.load()(par, cmd) == 0


def read_all(path):
    r = DBReader(path)
    out = {int(r.get_db_key(i)): bytes(r.get_data(i))
           for i in range(r.size)}
    r.close()
    return out


@pytest.mark.slow
def test_two_process_prefilter_matches_single(tmp_path):
    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend multi-process test")
    qdb = str(GOLDEN / "qdb")

    # single-process sharded reference run (in-process, 8 devices)
    os.environ["MMSEQS2_TPU_PREFILTER"] = "device"
    os.environ["MMSEQS2_TPU_SHARD"] = "1"
    try:
        out1 = str(tmp_path / "pref_sp")
        run_cmd("prefilter", [qdb, qdb, out1])
    finally:
        os.environ.pop("MMSEQS2_TPU_PREFILTER", None)
        os.environ.pop("MMSEQS2_TPU_SHARD", None)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out_mp = str(tmp_path / "pref_mp")
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in (str(pathlib.Path(__file__).parents[1]),
                        *os.environ.get("PYTHONPATH", "").split(os.pathsep))
            if p and "axon_site" not in p)
        env["MMSEQS_COORDINATOR"] = f"127.0.0.1:{port}"
        env["MMSEQS_NUM_PROCS"] = "2"
        env["MMSEQS_PROC_ID"] = str(pid)
        env["MMSEQS2_TPU_PREFILTER"] = "device"
        env["MMSEQS2_TPU_SHARD"] = "1"
        procs.append(subprocess.Popen(
            [sys.executable, str(driver), qdb, qdb, out_mp],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{o[-3000:]}"

    a, b = read_all(out1), read_all(out_mp)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], f"query {k}: multi-process differs"
