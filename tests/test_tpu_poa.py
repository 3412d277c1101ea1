"""TPU-batched POA must produce exactly the spec's MSA."""

import numpy as np
import pytest

from sibeliaz_tpu.align import poa_ref, tpu_poa
from sibeliaz_tpu.core import alphabet


def s(x):
    return alphabet.str_to_seq(x)


def rand_block(rng, base_len, n_copies, mut=0.08, indel=True):
    base = alphabet.decode(rng.integers(0, 4, size=base_len).astype(np.uint8))
    seqs = [base]
    for _ in range(n_copies - 1):
        seq = base.copy()
        for p in np.flatnonzero(rng.random(len(seq)) < mut):
            seq[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
        if indel and rng.random() < 0.6:
            cut = int(rng.integers(0, len(seq) - 4))
            seq = np.delete(seq, slice(cut, cut + int(rng.integers(1, 4))))
        seqs.append(seq)
    return seqs


def test_simple_identical():
    got = tpu_poa.poa_msa_batch_tpu([[s("ACGTACGT")] * 3])
    assert got[0] == [b"ACGTACGT"] * 3


@pytest.mark.parametrize("seed", range(6))
def test_matches_spec(seed):
    rng = np.random.default_rng(seed)
    blocks = [
        rand_block(rng, int(rng.integers(20, 80)), int(rng.integers(2, 5)))
        for _ in range(3)
    ]
    expect = [poa_ref.poa_msa(b) for b in blocks]
    got = tpu_poa.poa_msa_batch_tpu(blocks)
    for e, g in zip(expect, got):
        assert g == e


def test_mixed_copy_counts():
    rng = np.random.default_rng(100)
    blocks = [
        rand_block(rng, 40, 2),
        rand_block(rng, 50, 5),
        rand_block(rng, 30, 3),
    ]
    expect = [poa_ref.poa_msa(b) for b in blocks]
    got = tpu_poa.poa_msa_batch_tpu(blocks)
    assert got == expect


def test_oversized_single_block_falls_back():
    """A block whose single-dispatch DP plan exceeds the HBM budget must
    return None (native fallback) instead of dispatching — a modeled-9.4G
    single-block dispatch compiled to a 15.84G plan and OOMed the chip."""
    import numpy as np

    from sibeliaz_tpu.align import tpu_poa

    rng = np.random.default_rng(5)
    rows = [
        (rng.integers(0, 4, size=30_000).astype(np.uint8) + ord("A"))
        for _ in range(2)
    ]
    out = tpu_poa.poa_msa_batch_tpu([rows])
    assert out == [None]
