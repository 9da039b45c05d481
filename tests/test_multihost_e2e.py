"""Two-process multi-host integration: the MMSEQS_COORDINATOR contract.

Launches TWO actual processes that join a jax.distributed cluster (CPU
backend, 2 virtual devices each -> 4 global devices), run the sharded
`prefilter` command path, and writes must be byte-identical to a plain
single-process single-device run — the analogue of the reference's MPI
regression flavor (azure-pipelines.yml:70-105; MMseqsMPI.cpp:10-26).
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
AA = "ARNDCQEGHILKMFPSTWYV"


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{''.join(AA[c] for c in s)}\n")


def _env(extra):
    env = dict(os.environ)
    # drop the axon TPU plugin; force the CPU backend
    env["PYTHONPATH"] = str(REPO)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["MMSEQS2_TPU_JAX_CACHE"] = env.get(
        "MMSEQS2_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/mmseqs2_tpu/jax"))
    env.update(extra)
    return env


def _read_db(path):
    sys.path.insert(0, str(REPO))
    from mmseqs2_tpu.db.reader import DBReader
    r = DBReader(str(path))
    return {r.get_db_key(i): r.get_data(i) for i in range(r.size)}


@pytest.mark.slow
def test_two_process_sharded_prefilter(tmp_path):
    rng = np.random.default_rng(3)
    motifs = [rng.integers(0, 20, size=18) for _ in range(3)]
    seqs = []
    for i in range(12):
        s = rng.integers(0, 20, size=int(rng.integers(40, 80)))
        m = motifs[i % 3].copy()
        mut = rng.random(len(m)) < 0.15
        m[mut] = rng.integers(0, 20, size=int(mut.sum()))
        s[2:2 + len(m)] = m
        seqs.append(s)
    fasta = tmp_path / "toy.fasta"
    _write_fasta(fasta, seqs)

    def cli(args, env, timeout=600):
        return subprocess.run(
            [sys.executable, "-m", "mmseqs2_tpu", *args],
            env=env, cwd=str(tmp_path), timeout=timeout,
            capture_output=True, text=True)

    base = _env({"XLA_FLAGS": "--xla_force_host_platform_device_count=1"})
    r = cli(["createdb", str(fasta), "db"], base)
    assert r.returncode == 0, r.stderr[-2000:]

    # single-process single-device reference
    r = cli(["prefilter", "db", "db", "ref_out", "-s", "5.7"], base)
    assert r.returncode == 0, r.stderr[-2000:]

    # two processes x two devices, one cluster
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = _env({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "MMSEQS_COORDINATOR": f"127.0.0.1:{port}",
            "MMSEQS_NUM_PROCS": "2",
            "MMSEQS_PROC_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mmseqs2_tpu", "prefilter", "db", "db",
             "mp_out", "-s", "5.7"],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e[-2000:]

    ref = _read_db(tmp_path / "ref_out")
    got = _read_db(tmp_path / "mp_out")
    assert got == ref
