"""gpuserver (resident device index server) tests.

Spawns the server as a subprocess on the toy padded DB, runs
ungappedprefilter with --gpu 1 against it, and checks the output is
byte-identical to the serverless run.
"""

import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command
from mmseqs2_tpu.server.device_server import socket_path_for

TOY = pathlib.Path(__file__).parent / "golden" / "toy"
REPO = pathlib.Path(__file__).parent.parent


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse([str(a) for a in args], cmd, cmd.min_db,
                         cmd.max_db)
    assert cmd.load()(par, cmd) == 0


@pytest.mark.slow
def test_gpuserver_scan_parity(tmp_path):
    # 8-sequence padded target DB
    keys = tmp_path / "keys"
    keys.write_text("".join(f"{i}\n" for i in range(8)))
    sub = str(tmp_path / "sub")
    run_cmd("createsubdb", [str(keys), str(TOY / "qdb"), sub])
    run_cmd("createsubdb", [str(keys), str(TOY / "qdb_h"), sub + "_h"])
    pad = str(tmp_path / "pad")
    run_cmd("makepaddedseqdb", [sub, pad])

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "mmseqs2_tpu", "gpuserver", pad],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    try:
        sock = socket_path_for(pad)
        for _ in range(600):
            if os.path.exists(sock):
                break
            time.sleep(0.5)
        assert os.path.exists(sock), "server did not come up"

        out_srv = str(tmp_path / "pref_srv")
        run_cmd("ungappedprefilter",
                [str(TOY / "qdb"), pad, out_srv, "--gpu", "1",
                 "--threads", "1"])
        out_loc = str(tmp_path / "pref_loc")
        run_cmd("ungappedprefilter",
                [str(TOY / "qdb"), pad, out_loc, "--threads", "1"])
        with DBReader(out_srv) as a, DBReader(out_loc) as b:
            assert a.size == b.size
            for i in range(b.size):
                k = b.get_db_key(i)
                assert a.get_data(a.get_id(k)) == b.get_data(i), k
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)
