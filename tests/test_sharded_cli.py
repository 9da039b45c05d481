"""Command-level multi-chip prefilter: `prefilter` on the 8-device CPU mesh
must produce a byte-identical result DB to the 1-device (unsharded) run.

VERDICT r2 item 3: the sharded engine must be reachable from the CLI, not
only from a bespoke harness. The dispatch lives in
commands/prefilter_kmer.py (MMSEQS2_TPU_SHARD / device_count > 1); the
engine is parallel/sharded_prefilter.ShardedPrefilter.
"""

import os
import pathlib

import jax
import pytest

from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.params import Params
from mmseqs2_tpu.registry import get_command

GOLDEN = pathlib.Path(__file__).parent / "golden" / "toy"


def run_cmd(name, args):
    cmd = get_command(name)
    par = Params().parse(args, cmd, cmd.min_db, cmd.max_db)
    fn = cmd.load()
    assert fn(par, cmd) == 0


def read_all(path):
    r = DBReader(path)
    out = {int(r.get_db_key(i)): bytes(r.get_data(i))
           for i in range(r.size)}
    r.close()
    return out


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_prefilter_cli_sharded_matches_unsharded(tmp_path, monkeypatch):
    monkeypatch.setenv("MMSEQS2_TPU_PREFILTER", "device")
    qdb = str(GOLDEN / "qdb")

    monkeypatch.setenv("MMSEQS2_TPU_SHARD", "0")
    out1 = str(tmp_path / "pref_1dev")
    run_cmd("prefilter", [qdb, qdb, out1])

    monkeypatch.setenv("MMSEQS2_TPU_SHARD", "1")
    outn = str(tmp_path / "pref_ndev")
    run_cmd("prefilter", [qdb, qdb, outn])

    a, b = read_all(out1), read_all(outn)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], f"query {k} differs between 1-dev and sharded"
