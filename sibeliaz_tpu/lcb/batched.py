"""Batched device LCB exploration — scaffolding (SURVEY §2.3 P2).

The phase scheduler already gives us 256 independent bundle explorations
against a frozen `used` snapshot; this module builds the device-resident
lane state those explorations will run on, slice by slice, each slice
exactness-tested against the oracle engine:

  landed here:
    * `seed_batch`: Path.Init for a whole phase at once — every lane's
      initial instance set (occurrence gathers + strand-aware used test +
      out-char match) as padded [lanes, cap] arrays (path.h:33-46),
    * `used_prefix`: per-chromosome inclusive prefix sums of the `used`
      flags, turning the engine's O(distance) used-range scans
      (path.h:387-393, blocksfinder.h:385-391) into O(1) range queries —
      valid for a whole phase because `used` only mutates at commit time,
  next (design in docs/design.md §3): lockstep masked extension — batched
  MostPopularVertex voting with segmented arg-max, compatibility via the
  prefix range queries, capacity-overflow fallback to the native engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sibeliaz_tpu.junctions.table import JunctionTable
from sibeliaz_tpu.lcb.oracle import Bundle


@dataclasses.dataclass
class SeedBatch:
    """Initial instances per lane; row b = bundle b of the phase."""

    chr: np.ndarray  # [lanes, cap] int32, -1 padding
    idx: np.ndarray  # [lanes, cap] int64
    strand: np.ndarray  # [lanes, cap] int8
    n: np.ndarray  # [lanes] int32 — live instances per lane


def used_prefix(table: JunctionTable) -> List[np.ndarray]:
    """Inclusive prefix sums of used flags per chromosome (phase-constant).

    count of used slots in [lo, hi) = P[hi] - P[lo] with P = exclusive form.
    """
    out = []
    for c in range(table.n_chr):
        p = np.zeros(len(table.used[c]) + 1, dtype=np.int64)
        np.cumsum(table.used[c], out=p[1:])
        out.append(p)
    return out


def used_range_any(
    prefix: Sequence[np.ndarray], c: int, lo_slot: int, hi_slot: int
) -> bool:
    """Any used flag among slots [lo_slot, hi_slot)."""
    if hi_slot <= lo_slot:
        return False
    p = prefix[c]
    return bool(p[hi_slot] - p[lo_slot])


def first_votes(
    table: JunctionTable,
    bundles: Sequence[Bundle],
    seeds: SeedBatch,
    looking_depth: int,
    max_branch: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched MostPopularVertex for freshly seeded lanes (lockstep walk).

    On a fresh path the in-path test degenerates to `vid == origin`
    (blocksfinder.h:708-768 with distanceKeeper holding only the origin),
    and front == back for every instance so the forward walk starts at each
    seed.  Every lane walks its instances in lockstep for W steps with
    masks; votes accumulate per (lane, candidate) and the winner follows
    the reference's exact rule: strictly-greater count, or equal count with
    iterator-order-smaller origin (negative strand < positive, then chr,
    then idx).

    Returns (best_vid [lanes] int64, best_origin_slot [lanes] int32 — index
    into the seed arrays, or -1, best_count [lanes] int64).  Exactness is
    tested against the oracle on fresh paths; the used-retry variant and
    extended-path generalization are the next slices.
    """
    lanes = len(bundles)
    if lanes == 0:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int32),
            np.zeros(0, np.int64),
        )
    origins = np.array([b.vid for b in bundles], dtype=np.int64)
    best_vid = np.zeros(lanes, np.int64)
    best_cnt = np.zeros(lanes, np.int64)
    best_origin = np.full(lanes, -1, np.int32)

    # NOTE on visit order: the reference's running-best tie rule depends on
    # the order vote increments happen — instance-major, walk-step-minor
    # (blocksfinder.h:714-756).  The device version therefore materializes
    # the (instance, step) candidate grid and applies updates in (t, d)
    # lexicographic order per lane (a per-lane scan, vectorized across
    # lanes); this prototype spells that order out directly.
    for b in range(lanes):
        votes = {}
        for t in range(int(seeds.n[b])):
            c = int(seeds.chr[b, t])
            i0 = int(seeds.idx[b, t])
            s = int(seeds.strand[b, t])
            okey = (s > 0, c, i0)  # iterator operator< key of the origin
            opos = int(table.jpos[c][i0]) + (table.k if s < 0 else 0)
            i = i0 + s
            d = 1
            jpos = table.jpos[c]
            jid = table.jid[c]
            used = table.used[c]
            while 0 <= i < len(jpos):
                pos = int(jpos[i]) + (table.k if s < 0 else 0)
                if not (d < looking_depth or abs(pos - opos) <= max_branch):
                    break
                vid = s * int(jid[i])
                u = bool(used[i]) if s > 0 else (bool(used[i - 1]) if i > 0 else False)
                if vid == origins[b] or u:
                    break
                nc = votes.get(vid, 0) + 1  # single-point seeds weigh 1
                votes[vid] = nc
                if nc > best_cnt[b] or (
                    nc == best_cnt[b]
                    and best_origin[b] >= 0
                    and okey
                    < (
                        int(seeds.strand[b, int(best_origin[b])]) > 0,
                        int(seeds.chr[b, int(best_origin[b])]),
                        int(seeds.idx[b, int(best_origin[b])]),
                    )
                ):
                    best_cnt[b] = nc
                    best_vid[b] = vid
                    best_origin[b] = t
                i += s
                d += 1
    return best_vid, best_origin, best_cnt


def first_votes_device(
    table: JunctionTable,
    bundles: Sequence[Bundle],
    seeds: SeedBatch,
    looking_depth: int,
    max_branch: int,
    max_window: int = 64,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Device formulation of first_votes (one jit program per shape bucket).

    Key reduction insight (this is what makes the voting batchable): the
    reference's running-best update — replace on strictly-greater count, or
    equal count with iterator-smaller origin (blocksfinder.h:735) — looks
    order-sensitive, but its fixed point is order-free: only events whose
    running per-vid count equals the lane's final maximum can own the
    result, each candidate vid contributes exactly one such event (its last
    increment), and among those the winner is the minimum (origin-order,
    arrival-order).  So the whole vote is two segmented reductions over a
    sorted event table — no sequential scan.

    The lookahead walk is evaluated as a [lanes, seeds, W] lockstep grid
    with prefix-AND live masks; lanes whose walk would exceed W steps are
    flagged for host fallback (4th return value) to preserve exactness.

    Returns (best_vid, best_origin_slot, best_count, overflow) per lane.
    """
    lanes = len(bundles)
    if lanes == 0:
        z = np.zeros(0, np.int64)
        return z, z.astype(np.int32), z, np.zeros(0, bool)
    cap = max(1, seeds.chr.shape[1])
    W = max_window

    # flat per-chromosome tables for device gathers
    chr_off = np.zeros(table.n_chr + 1, dtype=np.int64)
    for c in range(table.n_chr):
        chr_off[c + 1] = chr_off[c] + len(table.jpos[c])
    jpos_all = (
        np.concatenate(table.jpos) if table.n_chr else np.zeros(0, np.int64)
    )
    jid_all = (
        np.concatenate(table.jid) if table.n_chr else np.zeros(0, np.int64)
    )
    used_all = (
        np.concatenate(table.used) if table.n_chr else np.zeros(0, np.uint8)
    )
    origins = np.array([b.vid for b in bundles], dtype=np.int64)
    chr_len = np.diff(chr_off)

    out = _first_votes_kernel(
        jnp.asarray(seeds.chr.astype(np.int32)),
        jnp.asarray(seeds.idx.astype(np.int64)),
        jnp.asarray(seeds.strand.astype(np.int32)),
        jnp.asarray(seeds.n.astype(np.int32)),
        jnp.asarray(chr_off),
        jnp.asarray(chr_len),
        jnp.asarray(jpos_all),
        jnp.asarray(jid_all),
        jnp.asarray(used_all),
        jnp.asarray(origins),
        int(table.k),
        int(looking_depth),
        int(max_branch),
        W,
        cap,
    )
    best_vid, best_slot, best_cnt, overflow = [np.asarray(x) for x in out]
    return best_vid, best_slot, best_cnt, overflow > 0


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13, 14))
def _first_votes_kernel(
    s_chr, s_idx, s_str, s_n, chr_off, chr_len, jpos, jid, used, origins,
    k, depth, b, W, cap,
):
    lanes = s_chr.shape[0]
    t_live = (
        jnp.arange(cap, dtype=jnp.int32)[None, :] < s_n[:, None]
    )  # [lanes, cap]
    base = chr_off[jnp.maximum(s_chr, 0).astype(jnp.int64)]
    L = chr_len[jnp.maximum(s_chr, 0).astype(jnp.int64)]
    s64 = s_str.astype(jnp.int64)
    opos = jnp.where(
        t_live,
        jpos[jnp.clip(base + s_idx, 0, jpos.shape[0] - 1)]
        + jnp.where(s64 < 0, k, 0),
        0,
    )

    d = jnp.arange(1, W + 1, dtype=jnp.int64)  # [W]
    it_i = s_idx[:, :, None] + s64[:, :, None] * d[None, None, :]
    in_range = (it_i >= 0) & (it_i < L[:, :, None])
    flat = jnp.clip(base[:, :, None] + it_i, 0, jpos.shape[0] - 1)
    pos = jpos[flat] + jnp.where(s64[:, :, None] < 0, k, 0)
    within = (d[None, None, :] < depth) | (
        jnp.abs(pos - opos[:, :, None]) <= b
    )
    vid = s64[:, :, None] * jid[flat]
    uslot = jnp.where(s64[:, :, None] > 0, flat, flat - 1)
    u = jnp.where(
        (s64[:, :, None] > 0) | (it_i > 0),
        used[jnp.clip(uslot, 0, used.shape[0] - 1)] > 0,
        False,
    )
    blocked = (vid == origins[:, None, None]) | u
    cont = t_live[:, :, None] & in_range & within & ~blocked
    # prefix-AND along the walk: a step counts only if all prior steps did
    alive = jnp.cumprod(cont.astype(jnp.int32), axis=2) > 0  # [lanes,cap,W]
    # overflow: some walk was still alive at the last window step
    overflow = jnp.any(alive[:, :, W - 1], axis=1).astype(jnp.int32)

    # event table: one row per alive (lane, seed t, step d); weights are 1
    # for single-point seeds so the per-vid final count is the run length.
    okey = (
        ((s_str > 0).astype(jnp.int64) << 62)
        | (s_chr.astype(jnp.int64) << 40)
        | s_idx
    )  # origin iterator order: (positive-strand, chr, idx)
    arrival = (
        jnp.arange(cap, dtype=jnp.int64)[None, :, None] * W
        + (d - 1)[None, None, :]
    )  # (t, d) lexicographic
    V = jnp.max(jnp.abs(jid)) + 1
    lane_of = jnp.broadcast_to(
        jnp.arange(lanes, dtype=jnp.int64)[:, None, None], vid.shape
    )
    key = jnp.where(
        alive, lane_of * (2 * V + 1) + (vid + V), jnp.int64(-1)
    ).reshape(-1)
    arr_f = jnp.broadcast_to(arrival, vid.shape).reshape(-1)
    okey_f = jnp.broadcast_to(okey[:, :, None], vid.shape).reshape(-1)
    vid_f = vid.reshape(-1)
    slot_f = jnp.broadcast_to(
        jnp.arange(cap, dtype=jnp.int64)[None, :, None], vid.shape
    ).reshape(-1)

    # sort 1: by (lane,vid) then arrival; a segment's length is the final
    # count and its last row is the vid's final (count-achieving) event
    k2, a2, o2, v2, sl2 = jax.lax.sort(
        (key, arr_f, okey_f, vid_f, slot_f), num_keys=2
    )
    n = k2.shape[0]
    ridx = jnp.arange(n, dtype=jnp.int64)
    seg_start = jnp.concatenate([jnp.ones(1, dtype=bool), k2[1:] != k2[:-1]])
    seg_end = jnp.concatenate([seg_start[1:], jnp.ones(1, dtype=bool)])
    start_rank = jax.lax.cummax(jnp.where(seg_start, ridx, -1))
    final_cnt = ridx - start_rank + 1
    is_final = seg_end & (k2 >= 0)

    # sort 2: winner per lane = min (count desc, origin order, arrival)
    # among final events — the reduction the running-best fold converges to
    SENT = jnp.int64(1) << 60
    lane2 = jnp.where(is_final, k2 // (2 * V + 1), jnp.int64(lanes))
    neg = jnp.where(is_final, -final_cnt, SENT)
    k3, n3, o3, a3, v3, s3 = jax.lax.sort(
        (
            lane2,
            neg,
            jnp.where(is_final, o2, SENT),
            jnp.where(is_final, a2, SENT),
            v2,
            sl2,
        ),
        num_keys=4,
    )
    lane_start = jnp.concatenate([jnp.ones(1, dtype=bool), k3[1:] != k3[:-1]])
    win_rows = jnp.where(lane_start & (k3 < lanes), k3, jnp.int64(lanes))
    best_vid = (
        jnp.zeros(lanes + 1, jnp.int64).at[win_rows].set(v3, mode="drop")
    )[:lanes]
    best_cnt = (
        jnp.zeros(lanes + 1, jnp.int64).at[win_rows].set(-n3, mode="drop")
    )[:lanes]
    best_slot = (
        jnp.zeros(lanes + 1, jnp.int64).at[win_rows].set(s3, mode="drop")
    )[:lanes].astype(jnp.int32)
    has = (
        jnp.zeros(lanes + 1, jnp.int32)
        .at[win_rows]
        .set(jnp.ones_like(win_rows, jnp.int32), mode="drop")
    )[:lanes]
    best_vid = jnp.where(has > 0, best_vid, 0)
    best_cnt = jnp.where(has > 0, best_cnt, 0)
    best_slot = jnp.where(has > 0, best_slot, -1)
    return best_vid, best_slot, best_cnt, overflow


def seed_batch(table: JunctionTable, bundles: Sequence[Bundle]) -> SeedBatch:
    """Vectorized Path.Init for every bundle of a phase.

    An occurrence seeds an instance iff its strand-aware used slot is clear
    and its sequential out-char equals the bundle char (the annotation
    chars already encode the sequential-iterator semantics incl. the
    chromosome-end '\\0' and pos-0 'N' conventions)."""
    lanes = len(bundles)
    if lanes == 0:
        return SeedBatch(
            chr=np.zeros((0, 0), np.int32),
            idx=np.zeros((0, 0), np.int64),
            strand=np.zeros((0, 0), np.int8),
            n=np.zeros(0, np.int32),
        )
    occ_off = table.occ_off
    cap = int(
        max(
            int(occ_off[abs(b.vid) + 1] - occ_off[abs(b.vid)])
            for b in bundles
        )
    )
    out_chr = np.full((lanes, cap), -1, np.int32)
    out_idx = np.zeros((lanes, cap), np.int64)
    out_str = np.zeros((lanes, cap), np.int8)
    out_n = np.zeros(lanes, np.int32)

    # flat used array for strand-aware slot tests
    chr_off = np.zeros(table.n_chr + 1, dtype=np.int64)
    for c in range(table.n_chr):
        chr_off[c + 1] = chr_off[c] + len(table.used[c])
    used_all = (
        np.concatenate(table.used)
        if table.n_chr
        else np.zeros(0, np.uint8)
    )
    jid_all = (
        np.concatenate(table.jid) if table.n_chr else np.zeros(0, np.int64)
    )

    for b, bundle in enumerate(bundles):
        v = abs(bundle.vid)
        lo, hi = int(occ_off[v]), int(occ_off[v + 1])
        cs = table.occ_chr[lo:hi].astype(np.int64)
        is_ = table.occ_idx[lo:hi]
        flat = chr_off[cs] + is_
        stored = jid_all[flat]
        s = np.where(stored == bundle.vid, 1, -1).astype(np.int8)
        # strand-aware used slot: + uses its own slot, - uses idx-1 (idx 0
        # on the minus strand is never used)
        slot = np.where(s > 0, flat, flat - 1)
        usable = np.where(
            (s > 0) | (is_ > 0), used_all[np.maximum(slot, 0)] == 0, True
        )
        charv = np.where(s > 0, table.occ_ch[lo:hi], table.occ_revch[lo:hi])
        keep = usable & (charv == bundle.ch)
        m = int(keep.sum())
        out_chr[b, :m] = cs[keep]
        out_idx[b, :m] = is_[keep]
        out_str[b, :m] = s[keep]
        out_n[b] = m
    return SeedBatch(chr=out_chr, idx=out_idx, strand=out_str, n=out_n)
