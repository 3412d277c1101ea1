"""Streamed (memory-bounded) graph construction must equal the monolithic
kernel bit-for-bit."""

import numpy as np
import pytest

from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu.graph import construct, streamed


def assert_same(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x.pos, y.pos)
        assert np.array_equal(x.ids, y.ids)


def genomes(seed, n_chr=3, lo=500, hi=3000, n_prob=0.0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_chr):
        L = int(rng.integers(lo, hi))
        s = alphabet.decode(rng.integers(0, 4, size=L).astype(np.uint8))
        if n_prob:
            s[rng.random(L) < n_prob] = ord("N")
        out.append(s)
    return out


@pytest.mark.parametrize("seed,k,chunk,rounds", [
    (0, 15, 1 << 10, 4),
    (1, 11, 777, 3),     # non-power-of-two chunk crossing chromosomes
    (2, 7, 1 << 12, 1),
    (3, 15, 1 << 9, 8),
])
def test_streamed_matches_monolithic(seed, k, chunk, rounds):
    seqs = genomes(seed, n_prob=0.01 if seed % 2 else 0.0)
    assert_same(
        construct.build_junctions(seqs, k),
        streamed.build_junctions_streamed(seqs, k, chunk_size=chunk, n_rounds=rounds),
    )


def test_streamed_related():
    rng = np.random.default_rng(9)
    base = alphabet.decode(rng.integers(0, 4, size=4000).astype(np.uint8))
    g2 = base.copy()
    for p in np.flatnonzero(rng.random(len(g2)) < 0.01):
        g2[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
    g3 = alphabet.reverse_complement(base)
    seqs = [base, g2, g3]
    assert_same(
        construct.build_junctions(seqs, 15),
        streamed.build_junctions_streamed(seqs, 15, chunk_size=1000, n_rounds=5),
    )


def test_resident_rounds_bit_equal():
    """Device-resident rounds (one codes upload, per-round rescan +
    on-device bucket filter + 8 B/junction output) match the monolithic
    kernel exactly, across k, N runs, rc chromosomes, and round counts."""
    from sibeliaz_tpu.graph.streamed import build_junctions_streamed_resident

    rng = np.random.default_rng(41)
    base = alphabet.decode(rng.integers(0, 4, size=20000).astype(np.uint8))
    mut = base.copy()
    idx = np.flatnonzero(rng.random(len(mut)) < 0.01)
    mut[idx] = alphabet.decode(
        rng.integers(0, 4, size=len(idx)).astype(np.uint8)
    )
    for p in rng.integers(0, len(mut), size=4):
        mut[p] = ord("N")
    seqs = [base, mut, alphabet.reverse_complement(base)]
    want = construct.build_junctions(seqs, 15)
    for n_rounds in (1, 3):
        got = build_junctions_streamed_resident(
            seqs, 15, chunk_size=4096, n_rounds=n_rounds
        )
        for a, b in zip(want, got):
            assert np.array_equal(a.pos, b.pos)
            assert np.array_equal(a.ids, b.ids)


def test_resident_rounds_wide_payload_bit_equal():
    """The wide (uint64 gpos<<32|first + orientation stream) payload used
    for >=2^31-position inputs must match the monolithic kernel exactly;
    force_wide exercises it at small scale."""
    from sibeliaz_tpu.graph.streamed import build_junctions_streamed_resident

    rng = np.random.default_rng(47)
    base = alphabet.decode(rng.integers(0, 4, size=15000).astype(np.uint8))
    mut = base.copy()
    idx = np.flatnonzero(rng.random(len(mut)) < 0.01)
    mut[idx] = alphabet.decode(
        rng.integers(0, 4, size=len(idx)).astype(np.uint8)
    )
    seqs = [base, mut, alphabet.reverse_complement(base)[:7000]]
    want = construct.build_junctions(seqs, 15)
    for n_rounds in (1, 2):
        got = build_junctions_streamed_resident(
            seqs, 15, chunk_size=4096, n_rounds=n_rounds, force_wide=True
        )
        for a, b in zip(want, got):
            assert np.array_equal(a.pos, b.pos)
            assert np.array_equal(a.ids, b.ids)


def test_resident_rounds_overflow_retry():
    """An undersized round budget (slack < 1) must overflow, double the
    round count, and still produce exact output."""
    from sibeliaz_tpu.graph.streamed import build_junctions_streamed_resident

    rng = np.random.default_rng(43)
    base = alphabet.decode(rng.integers(0, 4, size=6000).astype(np.uint8))
    seqs = [base, base.copy()]
    want = construct.build_junctions(seqs, 15)
    got = build_junctions_streamed_resident(
        seqs, 15, chunk_size=1024, n_rounds=2, round_slack=0.2
    )
    for a, b in zip(want, got):
        assert np.array_equal(a.pos, b.pos)
        assert np.array_equal(a.ids, b.ids)


def test_streamed_wide_k_two_limb_bit_equal():
    """31 < k <= 61 (two-limb canonical codes) through BOTH streamed paths
    must match the monolithic two-limb kernel exactly (round-3 work: the
    reference couples k and input size nowhere, sibeliaz:145)."""
    from sibeliaz_tpu.graph.streamed import (
        build_junctions_streamed,
        build_junctions_streamed_resident,
    )

    rng = np.random.default_rng(51)
    base = alphabet.decode(rng.integers(0, 4, size=12000).astype(np.uint8))
    mut = base.copy()
    idx = np.flatnonzero(rng.random(len(mut)) < 0.01)
    mut[idx] = alphabet.decode(
        rng.integers(0, 4, size=len(idx)).astype(np.uint8)
    )
    for p in rng.integers(0, len(mut), size=4):
        mut[p] = ord("N")
    seqs = [base, mut, alphabet.reverse_complement(base)[:5000]]
    for k in (33, 61):
        want = construct.build_junctions(seqs, k)
        assert sum(len(w.pos) for w in want) > 0
        got_res = build_junctions_streamed_resident(
            seqs, k, chunk_size=4096, n_rounds=3
        )
        assert_same(want, got_res)
        got_host = build_junctions_streamed(
            seqs, k, chunk_size=4096, n_rounds=3
        )
        assert_same(want, got_host)


def test_streamed_wide_k_wide_payload():
    """Two-limb rounds with the wide (>=2^31-position) payload format."""
    from sibeliaz_tpu.graph.streamed import build_junctions_streamed_resident

    rng = np.random.default_rng(53)
    base = alphabet.decode(rng.integers(0, 4, size=9000).astype(np.uint8))
    mut = base.copy()
    idx = np.flatnonzero(rng.random(len(mut)) < 0.02)
    mut[idx] = alphabet.decode(
        rng.integers(0, 4, size=len(idx)).astype(np.uint8)
    )
    seqs = [base, mut]
    want = construct.build_junctions(seqs, 33)
    got = build_junctions_streamed_resident(
        seqs, 33, chunk_size=2048, n_rounds=2, force_wide=True
    )
    assert_same(want, got)


def test_round_bucket_balance_power_of_two():
    """Class->round buckets must stay balanced for power-of-two round
    counts.  The pre-round-4 hash fed the LOW bits of canon * MIX to the
    modulo; those reduce to a permutation of canon mod 2^b, which the
    canonical-strand selection biases — measured 1.8-1.9x max/mean skew,
    enough to overflow a slack-sized round buffer and trap chromosome
    runs in the double-rounds retry loop."""
    import jax.numpy as jnp

    from sibeliaz_tpu.graph import streamed

    rng = np.random.default_rng(7)
    seq = alphabet.decode(rng.integers(0, 4, size=200_000).astype(np.uint8))
    codes = np.concatenate(
        [[ord("N")], seq, [ord("N")]]
    ).astype(np.uint8)
    block = jnp.asarray(alphabet.encode(codes)[: (1 << 17) + 27])
    canon, _, _ = streamed._chunk_scan(block, 25)
    canon = np.asarray(canon)
    canon = canon[canon != int(streamed._INVALID_CANON)]
    ch, cl, _, _ = streamed._chunk_scan2(jnp.asarray(
        alphabet.encode(codes)[: (1 << 17) + 43]), 33)
    ch_np, cl_np = np.asarray(ch), np.asarray(cl)
    keep2 = ch_np != int(streamed._INVALID_CANON)
    for R in (8, 16):
        b = np.asarray(streamed._round_bucket(jnp.asarray(canon), R))
        cnt = np.bincount(b, minlength=R)
        assert cnt.max() / cnt.mean() < 1.2, (R, cnt.tolist())
        b2 = np.asarray(streamed._round_bucket2(
            jnp.asarray(ch_np[keep2]), jnp.asarray(cl_np[keep2]), R))
        cnt2 = np.bincount(b2, minlength=R)
        assert cnt2.max() / cnt2.mean() < 1.2, (R, cnt2.tolist())
