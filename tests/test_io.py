import numpy as np
import pytest

from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu.io import dbg, fasta


def test_fasta_parse_basic(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text(">chr1 description here\nACGT\nacgt\n>chr2\nNNAC GT\n")
    recs = fasta.read_fasta(str(p))
    assert [r.name for r in recs] == ["chr1", "chr2"]
    assert alphabet.seq_to_str(recs[0].seq) == "ACGTACGT"
    assert alphabet.seq_to_str(recs[1].seq) == "NNACGT"


def test_fasta_invalid_char(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text(">x\nACGZ\n")
    with pytest.raises(fasta.FastaError):
        fasta.read_fasta(str(p))


def test_fasta_header_must_start_with_gt(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text("ACGT\n")
    with pytest.raises(fasta.FastaError):
        fasta.read_fasta(str(p))


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "a.fa"
    recs = [
        fasta.FastaRecord("s1", alphabet.str_to_seq("ACGT" * 50)),
        fasta.FastaRecord("s2", alphabet.str_to_seq("GGCC")),
    ]
    fasta.write_fasta(str(p), recs)
    back = fasta.read_fasta(str(p))
    assert [r.name for r in back] == ["s1", "s2"]
    for a, b in zip(recs, back):
        assert np.array_equal(a.seq, b.seq)


def test_dbg_roundtrip(tmp_path):
    p = tmp_path / "g.dbg"
    chrs = [
        dbg.JunctionChr(
            pos=np.array([0, 5, 9], dtype=np.uint32),
            ids=np.array([1, -2, 3], dtype=np.int64),
        ),
        dbg.JunctionChr(
            pos=np.array([2, 7], dtype=np.uint32),
            ids=np.array([-1, 2], dtype=np.int64),
        ),
    ]
    dbg.write_dbg(str(p), chrs)
    back = dbg.read_dbg(str(p))
    assert len(back) == 2
    for a, b in zip(chrs, back):
        assert np.array_equal(a.pos, b.pos)
        assert np.array_equal(a.ids, b.ids)


def test_dbg_binary_layout(tmp_path):
    # Byte-level contract: little-endian (u32 pos, i64 id) pairs, separator
    # (0xFFFFFFFF, INT64_MAX) per skipped chromosome (junctionapi.h:117-131).
    p = tmp_path / "g.dbg"
    chrs = [
        dbg.JunctionChr(pos=np.array([7], dtype=np.uint32), ids=np.array([-3], dtype=np.int64)),
        dbg.JunctionChr(pos=np.array([1], dtype=np.uint32), ids=np.array([4], dtype=np.int64)),
    ]
    dbg.write_dbg(str(p), chrs)
    raw = p.read_bytes()
    assert len(raw) == 3 * 12
    import struct

    assert struct.unpack("<Iq", raw[0:12]) == (7, -3)
    assert struct.unpack("<Iq", raw[12:24]) == (0xFFFFFFFF, 2**63 - 1)
    assert struct.unpack("<Iq", raw[24:36]) == (1, 4)


def test_fasta_gzip(tmp_path):
    import gzip

    p = tmp_path / "a.fa.gz"
    with gzip.open(p, "wt") as f:
        f.write(">chr1\nACGTACGT\n")
    recs = fasta.read_fasta(str(p))
    assert [r.name for r in recs] == ["chr1"]
    assert alphabet.seq_to_str(recs[0].seq) == "ACGTACGT"
