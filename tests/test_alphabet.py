import numpy as np
import pytest

from sibeliaz_tpu.core import alphabet


def s(x):
    return alphabet.str_to_seq(x)


def test_upper_and_validity():
    seq = s("acgtN")
    up = alphabet.to_upper(seq)
    assert alphabet.seq_to_str(up) == "ACGTN"
    assert alphabet.is_valid(up).all()
    assert not alphabet.is_valid(s("Z")).any()
    assert alphabet.is_definite(s("ACGT")).all()
    assert not alphabet.is_definite(s("N")).any()


def test_complement_and_rc():
    assert alphabet.seq_to_str(alphabet.complement_char(s("ACGTN"))) == "TGCAN"
    assert alphabet.seq_to_str(alphabet.reverse_complement(s("AACGT"))) == "ACGTT"
    # non-ACGT complements to N, matching reference dnachar.cpp:54
    assert alphabet.seq_to_str(alphabet.complement_char(s("RYK"))) == "NNN"


def test_encode_decode_roundtrip():
    seq = s("ACGTACGT")
    codes = alphabet.encode(seq)
    assert list(codes) == [0, 1, 2, 3, 0, 1, 2, 3]
    assert alphabet.seq_to_str(alphabet.decode(codes)) == "ACGTACGT"
    assert alphabet.encode(s("N"))[0] == alphabet.BAD_CODE


@pytest.mark.parametrize("k", [3, 5, 7])
def test_kmer_codes_match_bruteforce(k):
    rng = np.random.default_rng(0)
    seq = alphabet.decode(rng.integers(0, 4, size=50).astype(np.uint8))
    # Splice in an N to exercise masking.
    seq[20] = ord("N")
    fwd = alphabet.kmer_codes_scalar(seq, k)
    rcv = alphabet.rc_kmer_codes_scalar(seq, k)
    for p in range(len(seq) - k + 1):
        window = seq[p : p + k]
        if alphabet.is_definite(window).all():
            expect = 0
            for c in alphabet.encode(window):
                expect = expect * 4 + int(c)
            assert fwd[p] == expect
            rc = alphabet.reverse_complement(window)
            expect_rc = 0
            for c in alphabet.encode(rc):
                expect_rc = expect_rc * 4 + int(c)
            assert rcv[p] == expect_rc
        else:
            assert fwd[p] == -1
            assert rcv[p] == -1


def test_kmer_code_order_is_lexicographic():
    # Integer comparison of codes must equal lexicographic comparison of
    # strings — this is what LessSelfReverseComplement reduces to.
    kmers = ["AAC", "ACA", "GTT", "TGT", "CGC"]
    codes = [int(alphabet.kmer_codes_scalar(s(x), 3)[0]) for x in kmers]
    order_by_code = [k for _, k in sorted(zip(codes, kmers))]
    assert order_by_code == sorted(kmers)
