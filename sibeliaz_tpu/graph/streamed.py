"""Memory-bounded junction enumeration: chunked scan + multi-round analysis.

This is the TwoPaCo `--filtermemory` capability re-imagined for the device
memory model (reference README.md:226-233: multiple rounds partition the
hash space to bound memory).  The single-kernel path (construct.py) needs
~20 bytes of HBM per genome position; chromosome-scale inputs exceed one
chip, so here:

  pass 1 (chunked scan): the genome stream is processed in fixed-size
    chunks with a (k+1)-byte halo; each chunk kernel emits per-position
    occurrence evidence — canonical code, packed extension-presence bits,
    boundary flag, orientation — which the host buckets by
    canon mod n_rounds (a vertex class lands wholly in one round),

  pass 2 (per-round analysis): each round's records (≈ N / n_rounds) are
    sorted by canonical code on device and reduced with the same segmented
    predicates as the monolithic kernel; junction verdicts and class
    first-occurrence indices return to the host,

  assembly: ids are dense ranks of class first-occurrence positions across
    all rounds; records are merged back into per-chromosome position order.

Output is bit-identical to construct.build_junctions (tested); peak device
memory is O(chunk + N / n_rounds) instead of O(N).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu.graph.construct import (
    _INVALID_CANON,
    _NO_EXT,
    _doubling_codes,
)
from sibeliaz_tpu.io.dbg import JunctionChr


@functools.partial(jax.jit, static_argnums=(1,))
def _chunk_scan(codes_u8: jnp.ndarray, k: int):
    """Occurrence evidence for one chunk.  codes_u8 = [left_halo(1) |
    chunk | right_halo(k+1)]; outputs cover the chunk's M local positions:
    canon int64, packed int32 (bits 0-4 right-ext presence, 5-9 left-ext,
    10 boundary), positive bool."""
    n = codes_u8.shape[0]
    M = n - k - 2  # local positions
    definite = codes_u8 != alphabet.BAD_CODE
    codes = jnp.where(definite, codes_u8, 0).astype(jnp.int64)

    defc = jnp.cumsum(definite.astype(jnp.int64))
    defc = jnp.concatenate([jnp.zeros(1, jnp.int64), defc])
    valid_full = (defc[k:] - defc[:-k]) == k  # windows at offsets 0..n-k
    # local position p corresponds to window offset p+1
    valid = valid_full[1 : M + 1]

    fwd_full, rc_full = _doubling_codes(codes, k)
    fwd = fwd_full[1 : M + 1]
    rc = rc_full[1 : M + 1]
    positive = fwd < rc
    canon = jnp.where(valid, jnp.minimum(fwd, rc), _INVALID_CANON)

    nxt_def = definite[k + 1 : M + k + 1]
    prv_def = definite[0:M]
    nxt_c = codes[k + 1 : M + k + 1]
    prv_c = codes[0:M]
    nxt = jnp.where(nxt_def, nxt_c, _NO_EXT)
    prv = jnp.where(prv_def, prv_c, _NO_EXT)
    comp_nxt = jnp.where(nxt_def, 3 - nxt_c, _NO_EXT)
    comp_prv = jnp.where(prv_def, 3 - prv_c, _NO_EXT)
    right_ext = jnp.where(positive, nxt, comp_prv)
    left_ext = jnp.where(positive, prv, comp_nxt)

    prev_valid = valid_full[0:M]
    next_valid = valid_full[2 : M + 2]
    at_boundary = valid & (~prev_valid | ~next_valid)

    packed = (
        (jnp.int32(1) << right_ext.astype(jnp.int32))
        | (jnp.int32(1) << (left_ext.astype(jnp.int32) + 5))
        | (at_boundary.astype(jnp.int32) << 10)
    )
    return canon, packed, positive


@jax.jit
def _round_analysis(canon: jnp.ndarray, packed: jnp.ndarray, gpos: jnp.ndarray):
    """Per-class junction predicates over one round's records (padded with
    _INVALID_CANON rows).  Returns (is_junction, first_gpos) per record."""
    n = canon.shape[0]
    perm = jnp.argsort(canon, stable=True)
    canon_s = canon[perm]
    seg_start = jnp.concatenate(
        [jnp.ones(1, dtype=bool), canon_s[1:] != canon_s[:-1]]
    )
    seg_id = jnp.cumsum(seg_start.astype(jnp.int64)) - 1

    def seg_max(x):
        return jax.ops.segment_max(
            x, seg_id, num_segments=n, indices_are_sorted=True
        )

    packed_s = packed[perm]
    distinct_r = jnp.zeros(n, jnp.int32)
    distinct_l = jnp.zeros(n, jnp.int32)
    for c in range(4):
        distinct_r += seg_max((packed_s >> c) & 1)
        distinct_l += seg_max((packed_s >> (c + 5)) & 1)
    boundary_any = seg_max((packed_s >> 10) & 1) > 0
    junction_class = (distinct_r > 1) | (distinct_l > 1) | boundary_any

    first_of_class = jax.ops.segment_min(
        gpos[perm], seg_id, num_segments=n, indices_are_sorted=True
    )
    class_of = jnp.zeros(n, jnp.int64).at[perm].set(seg_id)
    isj = junction_class[class_of] & (canon != _INVALID_CANON)
    return isj, first_of_class[class_of]


def build_junctions_streamed(
    seqs: Sequence[np.ndarray],
    k: int,
    chunk_size: int = 1 << 22,
    n_rounds: int = 4,
) -> List[JunctionChr]:
    """Bit-identical to construct.build_junctions with bounded device memory."""
    if not seqs:
        return []
    empty = [
        JunctionChr(pos=np.zeros(0, np.uint32), ids=np.zeros(0, np.int64))
        for _ in seqs
    ]
    lengths = [len(s) for s in seqs]
    sep = np.full(1, ord("N"), dtype=np.uint8)
    pieces = [sep]
    for s in seqs:
        pieces.append(s)
        pieces.append(sep)
    joined = np.concatenate(pieces)  # leading + trailing N
    if len(joined) < k + 2:
        return empty
    codes_all = alphabet.encode(joined)
    N = len(joined)

    # ---- pass 1: chunked scan, bucket by canon % n_rounds ----
    # Software-pipelined: the device scans chunk i+1 (async dispatch) while
    # the host buckets chunk i's materialized results, so host bucketing
    # overlaps device compute instead of serializing with it.
    buckets = [[] for _ in range(n_rounds)]  # (canon, packed, gpos) triples
    M = chunk_size

    def launch(start):
        end = min(start + M, N - 1)
        m = end - start
        lo = start - 1
        hi = min(end + k + 1, N)
        block = codes_all[lo:hi]
        pad = (1 + M + k + 1) - len(block)
        if pad > 0:
            block = np.concatenate(
                [block, np.full(pad, alphabet.BAD_CODE, np.uint8)]
            )
        canon, packed, positive = _chunk_scan(jnp.asarray(block), k)
        return (canon, packed, positive, start, end, m)

    def absorb(pending):
        canon_d, packed_d, positive_d, start, end, m = pending
        canon = np.asarray(canon_d)[:m]
        packed = np.asarray(packed_d)[:m]
        positive = np.asarray(positive_d)[:m]
        valid = canon != int(_INVALID_CANON)
        gpos = np.arange(start, end, dtype=np.int64)
        pk = packed.astype(np.int32) | (positive.astype(np.int32) << 11)
        rnd = (canon[valid] % n_rounds).astype(np.int64)
        cv, pv, gv = canon[valid], pk[valid], gpos[valid]
        for r in range(n_rounds):
            mr = rnd == r
            if mr.any():
                buckets[r].append((cv[mr], pv[mr], gv[mr]))

    start = 1
    pending = None
    while start < N - 1:
        nxt = launch(start)
        start = nxt[4]
        if pending is not None:
            absorb(pending)
        pending = nxt
    if pending is not None:
        absorb(pending)

    # ---- pass 2: per-round analysis ----
    all_gpos: List[np.ndarray] = []
    all_first: List[np.ndarray] = []
    all_positive: List[np.ndarray] = []
    for r in range(n_rounds):
        if not buckets[r]:
            continue
        canon = np.concatenate([b[0] for b in buckets[r]])
        packed = np.concatenate([b[1] for b in buckets[r]])
        gpos = np.concatenate([b[2] for b in buckets[r]])
        n = len(canon)
        n_pad = max(4096, 1 << (n - 1).bit_length())
        canon_p = np.full(n_pad, int(_INVALID_CANON), np.int64)
        canon_p[:n] = canon
        packed_p = np.zeros(n_pad, np.int32)
        packed_p[:n] = packed & 0x7FF
        gpos_p = np.zeros(n_pad, np.int64)
        gpos_p[:n] = gpos
        isj, first = _round_analysis(
            jnp.asarray(canon_p), jnp.asarray(packed_p), jnp.asarray(gpos_p)
        )
        isj = np.asarray(isj)[:n]
        first = np.asarray(first)[:n]
        keep = isj
        all_gpos.append(gpos[keep])
        all_first.append(first[keep])
        all_positive.append(((packed[keep] >> 11) & 1) > 0)

    if not all_gpos:
        return empty
    gpos = np.concatenate(all_gpos)
    first = np.concatenate(all_first)
    positive = np.concatenate(all_positive)
    order = np.argsort(gpos, kind="stable")
    gpos, first, positive = gpos[order], first[order], positive[order]

    uniq = np.unique(first)
    ids = np.searchsorted(uniq, first) + 1
    signed = np.where(positive, ids, -ids).astype(np.int64)

    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    offsets[0] = 1
    for i, L in enumerate(lengths):
        offsets[i + 1] = offsets[i] + L + 1
    out: List[JunctionChr] = []
    for c in range(len(seqs)):
        lo_, hi_ = offsets[c], offsets[c] + lengths[c]
        mm = (gpos >= lo_) & (gpos < hi_)
        out.append(
            JunctionChr(pos=(gpos[mm] - lo_).astype(np.uint32), ids=signed[mm])
        )
    return out
