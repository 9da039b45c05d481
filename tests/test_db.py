import os

from mmseqs2_tpu.commands.createdb import createdb
from mmseqs2_tpu.db.reader import DBReader
from mmseqs2_tpu.db.writer import DBWriter
from mmseqs2_tpu.db import dbtype as dbt
from mmseqs2_tpu.db.fasta import iter_fasta, parse_fasta_header
from mmseqs2_tpu.params import Params


def _params(files):
    p = Params()
    p.filenames = files
    return p


def test_writer_reader_roundtrip(tmp_path):
    db = str(tmp_path / "db")
    w = DBWriter(db, dbt.DBTYPE_GENERIC_DB)
    w.write(3, b"hello\n")
    w.write(1, b"world\n")
    w.close()
    r = DBReader(db)
    assert len(r) == 2
    assert r.get_db_key(0) == 1
    assert r.get_data_by_key(3) == b"hello\n"
    assert r.get_data_by_key(1) == b"world\n"
    assert r.get_id(2) == -1
    r.close()


def test_createdb_shuffle_order(tmp_path, query_fasta):
    db = str(tmp_path / "qdb")
    createdb(_params([query_fasta, db]), None)
    r = DBReader(db)
    n = len(r)
    assert n == 500
    # key k corresponds to read-order id: bucket-interleaved by id % 32
    order = []
    for s in range(32):
        order.extend(range(s, n, 32))
    headers = [h for h, _ in iter_fasta(query_fasta)]
    hdr_db = DBReader(db + "_h")
    for key in (0, 1, 2, 150, 499):
        got = hdr_db.get_data_by_key(key)[:-1]
        assert got == headers[order[key]]
    # sequence entries end with newline; seq len == entry len - 2
    seqs = {h: s for h, s in iter_fasta(query_fasta)}
    assert r.get_seq(0) == seqs[headers[0]]
    assert r.get_seq_len(0) == len(seqs[headers[0]])
    r.close()
    hdr_db.close()


def test_parse_fasta_header():
    assert parse_fasta_header(b"tr|A7TBS3|A7TBS3_NEMVE Predicted") == b"A7TBS3"
    assert parse_fasta_header(b"sp|P12345|NAME desc") == b"P12345"
    assert parse_fasta_header(b"plainid rest of header") == b"plainid"
    assert parse_fasta_header(b"gi|123|ref|NP_1|") == b"NP_1"


def test_dbtype_roundtrip(tmp_path):
    db = str(tmp_path / "x")
    open(db, "wb").close()
    dbt.write_dbtype(db, dbt.DBTYPE_PREFILTER_RES, dbt.DBTYPE_EXTENDED_COMPRESSED)
    base, ext = dbt.read_dbtype(db)
    assert base == dbt.DBTYPE_PREFILTER_RES
    assert ext == dbt.DBTYPE_EXTENDED_COMPRESSED


GOLDEN_TOY = os.path.join(os.path.dirname(__file__), "golden", "toy")


def test_read_reference_compressed_db():
    """qdb_c was produced by `mmseqs compress qdb qdb_c` with the reference
    binary: entry layout [u32 cSize][zstd frame|raw][0x00|0xFF]
    (reference src/commons/DBReader.cpp:584-611)."""
    c = DBReader(os.path.join(GOLDEN_TOY, "qdb_c"))
    u = DBReader(os.path.join(GOLDEN_TOY, "qdb"))
    assert c.compressed and not u.compressed
    assert c.size == u.size
    for i in range(c.size):
        assert c.get_data(i) == u.get_data(i)
    c.close()
    u.close()


def test_compress_decompress_roundtrip(tmp_path):
    from mmseqs2_tpu.commands.db_tools import compress, decompress

    qdb = os.path.join(GOLDEN_TOY, "qdb")
    cdb = str(tmp_path / "c")
    ddb = str(tmp_path / "d")
    compress(_params([qdb, cdb]), None)
    u = DBReader(qdb)
    c = DBReader(cdb)
    assert c.compressed
    # index length column records uncompressed length, same as reference's
    ref_idx = [l.split("\t")[0] + "\t" + l.split("\t")[2]
               for l in open(os.path.join(GOLDEN_TOY, "qdb_c.index"))]
    our_idx = [l.split("\t")[0] + "\t" + l.split("\t")[2]
               for l in open(cdb + ".index")]
    assert ref_idx == our_idx
    for i in range(c.size):
        assert c.get_data(i) == u.get_data(i)
    # decompress of the REFERENCE-compressed DB must be byte-identical to qdb
    decompress(_params([os.path.join(GOLDEN_TOY, "qdb_c"), ddb]), None)
    assert open(ddb, "rb").read() == open(qdb, "rb").read()
    assert (open(ddb + ".index").read() == open(qdb + ".index").read())
    u.close()
    c.close()
