"""Device MostPopularVertex for arbitrary (extended) lane states.

Generalizes batched.first_votes_device from fresh seeds to full paths:
instance ends come from the lane arrays (back for forward walks, front for
backward), weights are RealLength+1, the instance list is the good list
when it has >= 2 members else all instances (with the correct append-order
arrival indices from good_seq/insert_seq), and the in-path test is a
searchsorted into the lane's sorted path-vertex table.  The winner uses the
order-free reduction (docs/design.md §3): two variadic sorts over the
event table.

Forward walks support the used-retry variant (try_used); backward walks
never retry (the reference's commented-out branch, blocksfinder.h:846-848).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sibeliaz_tpu.junctions.table import JunctionTable
from sibeliaz_tpu.lcb.batched_push import I_CAP, LaneState
from sibeliaz_tpu.lcb.batched_push_device import P_CAP, DeviceTables

BIG = np.int64(1) << 60  # numpy, NOT jnp (device-constant lowering fetch)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _vote_kernel(tb: DeviceTables, arrs, forward: bool, try_used: bool,
                 W: int):
    (chr_, s, fi, bi, good_seq, insert_seq, n, pvid, pn, start_vid,
     depth, b) = arrs
    L = chr_.shape[0]
    col = jnp.arange(I_CAP, dtype=jnp.int64)[None, :]
    live = col < n[:, None]

    good = good_seq >= 0
    n_good = jnp.sum((good & live).astype(jnp.int64), axis=1)
    use_good = n_good >= 2
    in_list = jnp.where(use_good[:, None], good & live, live)
    # arrival base per instance: its append order in the active list
    order_seq = jnp.where(use_good[:, None], good_seq, insert_seq)

    end_i = bi if forward else fi
    base = tb.chr_off[jnp.clip(chr_, 0, tb.chr_off.shape[0] - 2)]
    end_vid = s * tb.jid[jnp.clip(base + end_i, 0, tb.jid.shape[0] - 1)]
    at_end = in_list & (end_vid == start_vid[:, None])

    jf = tb.jpos[jnp.clip(base + fi, 0, tb.jpos.shape[0] - 1)]
    jb = tb.jpos[jnp.clip(base + bi, 0, tb.jpos.shape[0] - 1)]
    weight = jnp.abs(jf - jb) + 1
    opos = tb.jpos[jnp.clip(base + end_i, 0, tb.jpos.shape[0] - 1)] + (
        jnp.where(s < 0, tb.k, 0)
    )
    okey = ((s > 0).astype(jnp.int64) << 62) | (chr_ << 40) | end_i

    d = jnp.arange(1, W + 1, dtype=jnp.int64)  # [W]
    step = s[:, :, None] * (d[None, None, :] if forward else -d[None, None, :])
    it_i = end_i[:, :, None] + step
    in_range = (it_i >= 0) & (
        it_i < tb.chr_len[jnp.clip(chr_, 0, tb.chr_len.shape[0] - 1)][:, :, None]
    )
    flat = jnp.clip(base[:, :, None] + it_i, 0, tb.jpos.shape[0] - 1)
    pos = tb.jpos[flat] + jnp.where(s[:, :, None] < 0, tb.k, 0)
    within = (d[None, None, :] < depth[:, None, None]) | (
        jnp.abs(pos - opos[:, :, None]) <= b[:, None, None]
    )
    vid = s[:, :, None] * tb.jid[flat]
    # in-path: searchsorted into the lane's sorted path table
    q = vid.reshape(L, -1)
    pp = jax.vmap(jnp.searchsorted)(pvid, q)
    hit = jnp.take_along_axis(
        jnp.concatenate([pvid, jnp.full((L, 1), BIG)], axis=1), pp, axis=1
    ) == q
    in_path = (hit & (pp < pn[:, None])).reshape(vid.shape)
    uslot = jnp.where(s[:, :, None] > 0, flat, flat - 1)
    used = jnp.where(
        (s[:, :, None] > 0) | (it_i > 0),
        tb.used[jnp.clip(uslot, 0, tb.used.shape[0] - 1)] > 0,
        False,
    )
    ok_used = (~used) | bool(try_used)
    cont = at_end[:, :, None] & in_range & within & ~in_path & ok_used
    alive = jnp.cumprod(cont.astype(jnp.int32), axis=2) > 0
    overflow = jnp.any(alive[:, :, W - 1], axis=1).astype(jnp.int32)

    # ---- order-free winner reduction over the event table ----
    V = jnp.max(jnp.abs(tb.jid)) + 1
    lane_of = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int64)[:, None, None], vid.shape
    )
    key = jnp.where(
        alive, lane_of * (2 * V + 1) + (vid + V), jnp.int64(-1)
    ).reshape(-1)
    arrival = order_seq[:, :, None] * W + (d - 1)[None, None, :]
    arr_f = jnp.broadcast_to(arrival, vid.shape).reshape(-1)
    okey_f = jnp.broadcast_to(okey[:, :, None], vid.shape).reshape(-1)
    vid_f = vid.reshape(-1)
    w_f = jnp.broadcast_to(weight[:, :, None], vid.shape).reshape(-1)
    slot_f = jnp.broadcast_to(col[:, :, None], vid.shape).reshape(-1)

    k2, a2, o2, v2, w2, sl2 = jax.lax.sort(
        (key, arr_f, okey_f, vid_f, w_f, slot_f), num_keys=2
    )
    ridx = jnp.arange(k2.shape[0], dtype=jnp.int64)
    seg_start = jnp.concatenate([jnp.ones(1, dtype=bool), k2[1:] != k2[:-1]])
    seg_end = jnp.concatenate([seg_start[1:], jnp.ones(1, dtype=bool)])
    # weighted running count: prefix sum of weights minus segment-start base
    # (base located via the start-rank cummax, fetched with a monotone take)
    wcum = jnp.cumsum(w2)
    start_rank = jax.lax.cummax(jnp.where(seg_start, ridx, -1))
    base_at = jnp.take(wcum - w2, jnp.clip(start_rank, 0, None))
    final_cnt = wcum - base_at
    is_final = seg_end & (k2 >= 0)

    SENT = jnp.int64(1) << 58
    lane2 = jnp.where(is_final, k2 // (2 * V + 1), jnp.int64(L))
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
    win = jnp.where(lane_start & (k3 < L), k3, jnp.int64(L))
    best_vid = jnp.zeros(L + 1, jnp.int64).at[win].set(v3, mode="drop")[:L]
    best_cnt = jnp.zeros(L + 1, jnp.int64).at[win].set(-n3, mode="drop")[:L]
    best_slot = jnp.zeros(L + 1, jnp.int64).at[win].set(s3, mode="drop")[:L]
    has = (
        jnp.zeros(L + 1, jnp.int32)
        .at[win]
        .set(jnp.ones_like(win, jnp.int32), mode="drop")
    )[:L]
    best_vid = jnp.where(has > 0, best_vid, 0)
    best_cnt = jnp.where(has > 0, best_cnt, 0)
    best_slot = jnp.where(has > 0, best_slot, -1)
    return best_vid, best_slot, best_cnt, overflow


def vote_batch_device(
    table: JunctionTable,
    lanes: Sequence[LaneState],
    start_vids: Sequence[int],
    forward: bool,
    try_used: bool,
    depth: int,
    max_branch: int,
    max_window: int = 128,
):
    """Returns (best_vid, best_origin_row, best_count, overflow) per lane;
    best_origin_row indexes the lane's instance arrays (-1 when no winner)."""
    from sibeliaz_tpu.lcb.batched_push_device import _pad_lanes

    tb = DeviceTables.build(table)
    n_real = len(lanes)
    lanes = _pad_lanes(lanes)
    start_vids = list(start_vids) + [0] * (len(lanes) - n_real)
    L = len(lanes)

    def stack(attr, dtype=np.int64):
        return jnp.asarray(
            np.stack([getattr(st, attr).astype(dtype) for st in lanes])
        )

    pvid = np.full((L, P_CAP), int(2**60), np.int64)
    pn = np.zeros(L, np.int64)
    for l, st in enumerate(lanes):
        items = sorted(st.dist)
        pn[l] = len(items)
        pvid[l, : len(items)] = items
    arrs = (
        stack("chr"), stack("s"), stack("fi"), stack("bi"),
        stack("good_seq"), stack("insert_seq"),
        jnp.asarray(np.array([st.n for st in lanes], np.int64)),
        jnp.asarray(pvid), jnp.asarray(pn),
        jnp.asarray(np.array(start_vids, np.int64)),
        jnp.full(L, depth, jnp.int64),
        jnp.full(L, max_branch, jnp.int64),
    )
    out = _vote_kernel(tb, arrs, bool(forward), bool(try_used), max_window)
    best_vid, best_slot, best_cnt, overflow = [
        np.asarray(x)[:n_real] for x in out
    ]
    return best_vid, best_slot, best_cnt, overflow > 0
