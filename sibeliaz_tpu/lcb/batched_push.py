"""Batched PointPushBack — the instance-update primitive of the batched
LCB plan (prototype with the device-ready dataflow).

The reference's push worker (path.h:499-566) iterates the new vertex's
occurrences IN ORDER, and each step's multiset lookup can observe mutations
made by earlier steps of the same push, so the batched formulation is a
lockstep over the occurrence index: step j processes occurrence j of every
lane simultaneously; within a step, lanes are independent.

Lane state holds the path's instances as parallel padded arrays kept
sorted by the mutable compare key (the in-place mutations provably
preserve order — see lcb/oracle.py docstring), so the multiset upper_bound
is a searchsorted and inserts are masked shifts.

Exactness contract: `push_back_batch` must leave every lane in exactly the
state the oracle Path reaches after the same push_back call (tested per
lane against the oracle, including instance sets, distances, finished
flags, and the good-list order).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from sibeliaz_tpu.lcb.oracle import LcbEngine

I_CAP = 512  # instances per lane


@dataclasses.dataclass
class LaneState:
    """Path state of one lane (single-bundle exploration).

    Instance arrays are sorted by (chr, cmp) — the per-chromosome multisets
    concatenated; `order` gives insertion order ids so the good-list can be
    reconstructed in append order (score iteration order).
    """

    origin: int
    n: int
    chr: np.ndarray  # [I_CAP] int32
    s: np.ndarray  # [I_CAP] int8
    fi: np.ndarray  # [I_CAP] int64
    bi: np.ndarray  # [I_CAP] int64
    fdist: np.ndarray  # [I_CAP] int64
    bdist: np.ndarray  # [I_CAP] int64
    cmp: np.ndarray  # [I_CAP] int64
    ffin: np.ndarray  # [I_CAP] bool
    bfin: np.ndarray  # [I_CAP] bool
    good_seq: np.ndarray  # [I_CAP] int64 — good-list append order (-1 if not)
    insert_seq: np.ndarray  # [I_CAP] int64 — allInstance append order
    next_good: int = 0
    next_insert: int = 0
    right_flank: int = 0
    left_flank: int = 0
    overflow: bool = False
    # path membership: vid -> distance (dict is fine at lane granularity in
    # the prototype; the device version uses per-lane sorted vid arrays)
    dist: Optional[dict] = None

    @classmethod
    def seed(cls, eng: LcbEngine, vid: int, ch: int) -> "LaneState":
        st = cls(
            origin=vid,
            n=0,
            chr=np.full(I_CAP, -1, np.int32),
            s=np.zeros(I_CAP, np.int8),
            fi=np.zeros(I_CAP, np.int64),
            bi=np.zeros(I_CAP, np.int64),
            fdist=np.zeros(I_CAP, np.int64),
            bdist=np.zeros(I_CAP, np.int64),
            cmp=np.zeros(I_CAP, np.int64),
            ffin=np.zeros(I_CAP, bool),
            bfin=np.zeros(I_CAP, bool),
            good_seq=np.full(I_CAP, -1, np.int64),
            insert_seq=np.zeros(I_CAP, np.int64),
            dist={vid: 0},
        )
        t = eng.t
        for c, i, s_, j in eng.occurrences(vid):
            it = (c, i, s_)
            if not eng.is_used(it) and ch == eng.it_char(it):
                st._insert(c, s_, i, 0)
        return st

    # ---- sorted-array multiset ops ----

    def _key(self, c: int, cmpv: int) -> int:
        return (int(c) << 40) | int(cmpv)

    def keys(self) -> np.ndarray:
        return (self.chr[: self.n].astype(np.int64) << 40) | self.cmp[: self.n]

    def _insert(self, c: int, s_: int, idx: int, dist_val: int) -> None:
        if self.n >= I_CAP:
            self.overflow = True
            return
        p = int(np.searchsorted(self.keys(), self._key(c, idx), side="right"))
        for arr, val in (
            (self.chr, c), (self.s, s_), (self.fi, idx), (self.bi, idx),
            (self.fdist, dist_val), (self.bdist, dist_val), (self.cmp, idx),
            (self.ffin, False), (self.bfin, False),
            (self.good_seq, -1), (self.insert_seq, self.next_insert),
        ):
            arr[p + 1 : self.n + 1] = arr[p : self.n]
            arr[p] = val
        self.next_insert += 1
        self.n += 1

    def good_list_order(self) -> List[int]:
        """Indices of good-marked instances in append order."""
        live = np.flatnonzero(self.good_seq[: self.n] >= 0)
        return list(live[np.argsort(self.good_seq[: self.n][live])])


def push_back_batch(
    eng: LcbEngine,
    lanes: Sequence[LaneState],
    edges: Sequence[Optional[Tuple[int, int, int, int, int]]],
) -> List[bool]:
    """Apply push_back(edge) to every lane (edge=None skips a lane).

    Prototype: lockstep over the occurrence index with per-lane step logic
    spelled out scalar-wise (the device port vectorizes the inner step
    across lanes; every operation used here is a gather / searchsorted /
    masked shift).  Returns the per-lane success flags."""
    t = eng.t
    results: List[bool] = []
    for st, edge in zip(lanes, edges):
        if edge is None or st.overflow:
            results.append(False)
            continue
        vertex = edge[1]
        if vertex in st.dist:
            results.append(False)
            continue
        start_d = st.right_flank
        end_d = start_d + edge[4]
        st.dist[vertex] = end_d
        av = abs(vertex)
        lo, hi = int(t.occ_off[av]), int(t.occ_off[av + 1])
        for j in range(lo, hi):
            c = int(t.occ_chr[j])
            i = int(t.occ_idx[j])
            s_ = 1 if int(t.jid[c][i]) == vertex else -1
            seq_it = (c, i, s_)
            keys = st.keys()
            kq = st._key(c, i)
            p = int(np.searchsorted(keys, kq, side="right"))
            in_chr = (
                p < st.n and st.chr[p] == c
            )  # upper_bound within this chromosome's run?
            cand = -1
            if in_chr:
                loi = min(st.fi[p], st.bi[p])
                hii = max(st.fi[p], st.bi[p])
                if loi <= i <= hii:
                    continue  # Within check on the upper-bound instance
            if s_ > 0:
                q = p - 1
                if q >= 0 and st.chr[q] == c and _compatible(
                    eng, st, q, seq_it, edge, use_back=True
                ):
                    cand = q
            else:
                if in_chr and _compatible(
                    eng, st, p, seq_it, edge, use_back=True
                ):
                    cand = p
            if cand >= 0 and eng.vid((int(st.chr[cand]), int(st.bi[cand]), int(st.s[cand]))) != vertex:
                if not st.bfin[cand]:
                    was_good = _real_len(eng, st, cand) >= eng.m
                    st.bi[cand] = i
                    st.bdist[cand] = end_d
                    if st.s[cand] > 0:
                        st.cmp[cand] = i
                    if not was_good and _real_len(eng, st, cand) >= eng.m:
                        st.good_seq[cand] = st.next_good
                        st.next_good += 1
                    if eng.is_used(seq_it):
                        st.bfin[cand] = True
            elif not eng.is_used(seq_it):
                st._insert(c, s_, i, end_d)
        st.right_flank = end_d
        results.append(True)
    return results


def _real_len(eng: LcbEngine, st: LaneState, q: int) -> int:
    jp = eng.t.jpos[int(st.chr[q])]
    return abs(int(jp[st.fi[q]]) - int(jp[st.bi[q]]))


def _compatible(
    eng: LcbEngine,
    st: LaneState,
    q: int,
    seq_it: Tuple[int, int, int],
    edge,
    use_back: bool,
) -> bool:
    """Path.compatible(back_of(inst q), seq_it, edge) against lane state."""
    c = int(st.chr[q])
    s_inst = int(st.s[q])
    start = (c, int(st.bi[q]), s_inst)
    end = seq_it
    return _compat(eng, st, start, end, edge)


def _compatible_front(
    eng: LcbEngine,
    st: LaneState,
    q: int,
    seq_it: Tuple[int, int, int],
    edge,
) -> bool:
    """Path.compatible(seq_it, front_of(inst q), edge) against lane state."""
    c = int(st.chr[q])
    s_inst = int(st.s[q])
    start = seq_it
    end = (c, int(st.fi[q]), s_inst)
    return _compat(eng, st, start, end, edge)


def _compat(eng, st, start, end, edge) -> bool:
    if (start[2] > 0) != (end[2] > 0):
        return False
    # used-between via literal walk (prototype; device uses prefix sums)
    it = start
    guard = 0
    while it != end:
        if eng.is_used(it):
            return False
        it = eng.nxt(it)
        guard += 1
        if guard > len(eng.t.jpos[start[0]]) + 2:
            return False
    real_diff = eng.pos(end) - eng.pos(start)
    anc_diff = st.dist[eng.vid(end)] - st.dist[eng.vid(start)]
    if start[2] > 0:
        if real_diff < 0:
            return False
    else:
        if -real_diff < 0:
            return False
    if abs(real_diff) > eng.b or anc_diff > eng.b:
        s1 = eng.nxt(start)
        if (
            not eng.valid(s1)
            or eng.it_char(start) != edge[2]
            or end != s1
            or eng.vid(s1) != edge[1]
        ):
            return False
    return True
