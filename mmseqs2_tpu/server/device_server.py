"""Resident device index server (`gpuserver`).

Reference: src/util/gpuserver.cpp + src/commons/GpuUtil.h — a persistent
process that keeps the (padded) target DB resident on the accelerator and
serves gapless / gapless+SW scans to concurrently running prefilter
processes, so each `ungappedprefilter`/`gappedprefilter` invocation skips
the device transfer and kernel warmup.

TPU-native redesign: instead of CUDA + POSIX shared memory, the server
device-puts the encoded target buckets once, pre-jits the scan kernels,
and serves requests over a unix-domain socket (length-prefixed pickle).
The socket path is derived from a hash of the DB path exactly like
GPUSharedMemory::getShmHash, so clients find the server by DB name alone.
"""

import hashlib
import os
import pickle
import signal
import socket
import struct

import numpy as np

from ..db import dbtype as dbt
from ..utils import log

MODE_GAPLESS = 0
MODE_GAPPED = 1


def socket_path_for(db_path: str) -> str:
    h = hashlib.sha256(os.path.abspath(db_path).encode()).hexdigest()[:16]
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    return os.path.join(base, f"mmseqs2tpu_srv_{h}.sock")


def _send(conn, obj):
    blob = pickle.dumps(obj, protocol=4)
    conn.sendall(struct.pack("<Q", len(blob)) + blob)


def _recv(conn):
    hdr = b""
    while len(hdr) < 8:
        part = conn.recv(8 - len(hdr))
        if not part:
            return None
        hdr += part
    (n,) = struct.unpack("<Q", hdr)
    buf = bytearray()
    while len(buf) < n:
        part = conn.recv(min(1 << 20, n - len(buf)))
        if not part:
            return None
        buf += part
    return pickle.loads(bytes(buf))


class DeviceIndexServer:
    def __init__(self, db_path: str, submat, max_seq_len: int = 65535):
        import jax.numpy as jnp

        from ..ops.encode import bucket_length
        from .. import commands  # noqa: F401  (registry side effects)
        from ..commands.common import EncodedDB, open_seq_db
        from ..align.aligner import PAD_LETTER

        self.db_path = db_path
        reader = open_seq_db(db_path)
        if not (reader.extended_type & dbt.DBTYPE_EXTENDED_GPU):
            log.die(f"Database {os.path.basename(db_path)} is not a valid "
                    f"padded database\nPlease call: makepaddedseqdb "
                    f"{os.path.basename(db_path)} "
                    f"{os.path.basename(db_path)}_pad")
        self.reader = reader
        tdb = EncodedDB(reader, submat)
        self.n_targets = reader.size
        self.keys = np.asarray(reader.keys, np.int64)
        buckets = {}
        for tid in range(reader.size):
            buckets.setdefault(bucket_length(tdb.seq_len(tid)),
                               []).append(tid)
        self.blocks = []     # (tids array, device block (N, L), lens)
        for L, tids in sorted(buckets.items()):
            tb = np.full((len(tids), L), PAD_LETTER, np.int32)
            lens = np.zeros(len(tids), np.int32)
            for r, tid in enumerate(tids):
                s = tdb.seq_num(tid)
                tb[r, :len(s)] = s
                lens[r] = len(s)
            self.blocks.append((np.asarray(tids), jnp.asarray(tb), lens))
        log.info(f"Device index resident: {reader.size} targets in "
                 f"{len(self.blocks)} length buckets")

    def scan(self, profile, cap, mode, go=11, ge=1):
        """profile: (A, Lq) int; returns scores (n_targets,) in DB order."""
        import jax
        import jax.numpy as jnp

        from ..ops import dp

        use_pallas = jax.default_backend() != "cpu"
        out = np.zeros(self.n_targets, np.int32)
        prof = jnp.asarray(np.asarray(profile, np.int32))
        for tids, block, lens in self.blocks:
            if use_pallas:
                from ..ops.pallas_sw import gapless_pallas_score, sw_pallas
                if mode == MODE_GAPLESS:
                    scores = np.asarray(gapless_pallas_score(
                        prof, block.T, cap=cap))
                else:
                    scores = np.asarray(sw_pallas(prof, block.T, go=go,
                                                  ge=ge)[0])
            else:
                qidx = jnp.zeros(block.shape[0], jnp.int32)
                if mode == MODE_GAPLESS:
                    caps = jnp.full(block.shape[0], cap, jnp.int32)
                    scores = np.asarray(dp.gapless_scan(prof[None], qidx,
                                                        block, caps))
                else:
                    s, _, _ = dp.sw_scan(prof[None], qidx, block, go, ge)
                    scores = np.asarray(s)
            out[tids] = scores[:len(tids)]
        return out

    def serve(self):
        path = socket_path_for(self.db_path)
        if os.path.exists(path):
            os.unlink(path)
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(path)
        srv.listen(16)
        running = {"on": True}

        def stop(signum, frame):
            running["on"] = False
            srv.close()

        signal.signal(signal.SIGINT, stop)
        signal.signal(signal.SIGTERM, stop)
        log.info(f"gpuserver listening on {path}")
        print(path, flush=True)
        try:
            while running["on"]:
                try:
                    conn, _ = srv.accept()
                except OSError:
                    break
                try:
                    while True:
                        req = _recv(conn)
                        if req is None:
                            break
                        if req.get("op") == "ping":
                            _send(conn, {"ok": True,
                                         "n_targets": self.n_targets})
                            continue
                        if req.get("op") == "shutdown":
                            _send(conn, {"ok": True})
                            running["on"] = False
                            break
                        scores = self.scan(req["profile"], req.get(
                            "cap", 255), req.get("mode", MODE_GAPLESS),
                            req.get("go", 11), req.get("ge", 1))
                        _send(conn, {"scores": scores})
                except (ConnectionError, EOFError):
                    pass
                finally:
                    conn.close()
        finally:
            if os.path.exists(path):
                os.unlink(path)
        return 0


def query_server(db_path, profile, cap, mode, go=11, ge=1, timeout=600):
    """Client: returns scores (n_targets in DB order) or None if no
    server is running for this DB."""
    path = socket_path_for(db_path)
    if not os.path.exists(path):
        return None
    try:
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.settimeout(timeout)
        conn.connect(path)
        _send(conn, {"op": "scan", "profile": np.asarray(profile),
                     "cap": int(cap), "mode": int(mode), "go": int(go),
                     "ge": int(ge)})
        resp = _recv(conn)
        conn.close()
        return resp["scores"] if resp else None
    except (ConnectionError, OSError):
        return None


def shutdown_server(db_path):
    path = socket_path_for(db_path)
    if not os.path.exists(path):
        return False
    try:
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(path)
        _send(conn, {"op": "shutdown"})
        _recv(conn)
        conn.close()
        return True
    except (ConnectionError, OSError):
        return False


def gpuserver(par, command):
    from ..commands.common import get_sub_mat
    from ..db.reader import DBReader

    db_path = par.filenames[0]
    nucl = DBReader(db_path).base_type == dbt.DBTYPE_NUCLEOTIDES
    submat = get_sub_mat(par, nucl=nucl,
                         bit_factor=1.0 if nucl else 2.0)
    server = DeviceIndexServer(db_path, submat, par.max_seq_len)
    return server.serve()
