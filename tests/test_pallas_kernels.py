"""Pallas front-half kernel vs its numpy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu.graph import pallas_kernels as pk


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def wrapper(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", wrapper)
    # the jitted entry caches the non-interpret version; rebuild it
    import functools
    import jax

    monkeypatch.setattr(
        pk,
        "canon_packed",
        functools.partial(pk.canon_packed.__wrapped__, ),
    )
    yield


@pytest.mark.parametrize("k,seed,n_prob", [(15, 0, 0.0), (15, 1, 0.02),
                                           (25, 2, 0.01), (11, 3, 0.0)])
def test_matches_oracle(k, seed, n_prob):
    rng = np.random.default_rng(seed)
    n = pk.TILE  # one tile (interpret mode is slow)
    seq = alphabet.decode(rng.integers(0, 4, size=n).astype(np.uint8))
    if n_prob:
        seq[rng.random(n) < n_prob] = ord("N")
    codes = alphabet.encode(seq)
    import jax.numpy as jnp

    hi, lo, packed = pk.canon_packed(jnp.asarray(codes), k)
    hi, lo, packed = np.asarray(hi), np.asarray(lo), np.asarray(packed)
    # oracle on a subsample of positions (full oracle is O(n*k) python)
    sample = rng.choice(n, size=400, replace=False)
    ehi, elo, epk = pk.canon_packed_reference(codes, k)
    for p in sample:
        assert packed[p] == epk[p], (p, bin(packed[p]), bin(epk[p]))
        if (epk[p] >> 12) & 1:
            assert hi[p] == ehi[p] and lo[p] == elo[p], p


def test_combined_canon_matches_construct():
    """hi/lo combine must equal the construct.py canonical codes."""
    import jax.numpy as jnp

    from sibeliaz_tpu.graph.construct import _INVALID_CANON, _doubling_codes

    rng = np.random.default_rng(7)
    n = pk.TILE
    k = 15
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    hi, lo, packed = pk.canon_packed(jnp.asarray(codes), k)
    canon = (np.asarray(hi).astype(np.int64) << 32) | (
        np.asarray(lo).astype(np.int64) & 0xFFFFFFFF
    )
    f, r = _doubling_codes(jnp.asarray(codes).astype(jnp.int64), k)
    expect = np.minimum(np.asarray(f), np.asarray(r))
    valid = ((np.asarray(packed) >> 12) & 1) > 0
    b = min(k, 16)
    # construct packs canon as one base-4 integer; recombine hi/lo the same way
    canon2 = (np.asarray(hi).astype(np.int64) << (2 * b)) | (
        np.asarray(lo).astype(np.int64) & ((1 << (2 * b)) - 1)
    )
    assert np.array_equal(canon2[valid], expect[valid])
