"""Sharded (multi-device) graph construction must equal the single-device
kernel exactly, on an 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.parallel import sharded


def assert_same(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x.pos, y.pos)
        assert np.array_equal(x.ids, y.ids)


def random_genomes(seed, n_chr, lo, hi, n_prob=0.0):
    rng = np.random.default_rng(seed)
    seqs = []
    for _ in range(n_chr):
        L = int(rng.integers(lo, hi))
        seq = alphabet.decode(rng.integers(0, 4, size=L).astype(np.uint8))
        if n_prob:
            seq[rng.random(L) < n_prob] = ord("N")
        seqs.append(seq)
    return seqs


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    assert len(ds) >= 8, "conftest should provide 8 virtual CPU devices"
    return ds[:8]


@pytest.mark.parametrize("seed,k,n_prob", [(0, 7, 0.0), (1, 15, 0.01), (2, 11, 0.0)])
def test_sharded_matches_single(devices, seed, k, n_prob):
    seqs = random_genomes(seed, 3, 200, 2000, n_prob)
    single = construct.build_junctions(seqs, k)
    multi = sharded.build_junctions_sharded(seqs, k, devices=devices)
    assert_same(single, multi)


def test_sharded_related_genomes(devices):
    rng = np.random.default_rng(5)
    base = alphabet.decode(rng.integers(0, 4, size=3000).astype(np.uint8))
    g2 = base.copy()
    for p in np.flatnonzero(rng.random(len(g2)) < 0.01):
        g2[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
    g3 = alphabet.reverse_complement(base)
    seqs = [base, g2, g3]
    assert_same(
        construct.build_junctions(seqs, 15),
        sharded.build_junctions_sharded(seqs, 15, devices=devices),
    )


def test_sharded_two_devices(devices):
    seqs = random_genomes(9, 2, 300, 700)
    assert_same(
        construct.build_junctions(seqs, 9),
        sharded.build_junctions_sharded(seqs, 9, devices=devices[:2]),
    )


def test_sharded_wide_k_two_limb(devices):
    """31 < k <= 61: two-limb canonical codes through the halo exchange and
    hash-bucket all_to_all must match the single-device kernel exactly."""
    rng = np.random.default_rng(31)
    base = alphabet.decode(rng.integers(0, 4, size=2500).astype(np.uint8))
    g2 = base.copy()
    for p in np.flatnonzero(rng.random(len(g2)) < 0.01):
        g2[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
    seqs = [base, g2, alphabet.reverse_complement(base)]
    for k in (33, 61):
        single = construct.build_junctions(seqs, k)
        assert sum(len(s.pos) for s in single) > 0
        multi = sharded.build_junctions_sharded(seqs, k, devices=devices)
        assert_same(single, multi)
