"""Batched Process(): the complete per-bundle exploration on lane-state
arrays (slice 5 of the batched LCB plan).

This assembles the proven primitives (seeding, voting, lockstep pushes)
into the full reference protocol — greedy forward extension with the
minRun continuation rule, best-prefix rewind, the backward pass with its
load-bearing stray-';' semantics, and scoring — operating on the padded
LaneState layout of lcb/batched_push.py.  Control flow here is per-lane
Python (the prototype's job is layout + exactness); every inner operation
is already expressed as gathers/searchsorted/masked shifts so the jnp port
is a mechanical lockstep over lanes.

Exactness contract: `process_batch` must return, for every bundle, the
same best-instance snapshot the oracle's Process emits — and therefore
plugging it into the phase/commit protocol must reproduce the byte-exact
GFF (both tested)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from sibeliaz_tpu.lcb.oracle import NEG_INF_SCORE, Bundle, Instance, LcbEngine
from sibeliaz_tpu.lcb.batched_push import LaneState

Edge = Tuple[int, int, int, int, int]


class LaneProcess:
    """One lane's Process() on LaneState (mirrors oracle.process exactly)."""

    def __init__(self, eng: LcbEngine, bundle: Bundle):
        self.e = eng
        self.bundle = bundle
        self.reset()

    def reset(self) -> None:
        self.st = LaneState.seed(self.e, self.bundle.vid, self.bundle.ch)
        self.right_body: List[Tuple[Edge, int]] = []
        self.left_body: List[Tuple[Edge, int]] = []

    # ---- scoring (vectorizable: masked sums over the good list) ----

    def score(self) -> int:
        st = self.st
        ret = 0
        for q in st.good_list_order():
            jp = self.e.t.jpos[int(st.chr[q])]
            sc = abs(int(jp[st.fi[q]]) - int(jp[st.bi[q]]))
            right_pen = st.right_flank - int(st.bdist[q])
            left_pen = -st.left_flank + int(st.fdist[q])
            if left_pen >= self.e.flank or right_pen >= self.e.flank:
                return NEG_INF_SCORE
            ret += sc - (right_pen + left_pen) * (right_pen + left_pen)
        return ret

    def middle_length(self) -> int:
        return -self.st.left_flank + self.st.right_flank

    def right_vertex(self) -> int:
        return self.right_body[-1][0][1] if self.right_body else self.st.origin

    def left_vertex(self) -> int:
        return self.left_body[-1][0][0] if self.left_body else self.st.origin

    # ---- voting on the general (extended) path ----

    def most_popular(self, forward: bool, try_used: bool):
        """General MostPopularVertex on LaneState — same reduction shape as
        batched.first_votes_device but with path-dependent weights, the
        good-or-all instance list, and the dist-dict in-path test."""
        e = self.e
        st = self.st
        start_vid = self.right_vertex() if forward else self.left_vertex()
        good = st.good_list_order()
        use_good = len(good) >= 2
        if use_good:
            inst_rows = good
        else:
            inst_rows = list(
                np.flatnonzero(st.chr[: st.n] >= 0)[
                    np.argsort(st.insert_seq[: st.n], kind="stable")
                ]
            )
        best_vid = 0
        best_cnt = 0
        best_okey = None
        votes = {}
        for q in inst_rows:
            c = int(st.chr[q])
            s_ = int(st.s[q])
            end_i = int(st.bi[q]) if forward else int(st.fi[q])
            now = (c, end_i, s_)
            if e.vid(now) != start_vid:
                continue
            jp = e.t.jpos[c]
            weight = abs(int(jp[st.fi[q]]) - int(jp[st.bi[q]])) + 1
            okey = (s_ > 0, c, end_i)
            opos = e.pos(now)
            it = e.nxt(now) if forward else e.prv(now)
            d = 1
            while e.valid(it) and (
                d < e.depth or abs(e.pos(it) - opos) <= e.b
            ):
                v = e.vid(it)
                if v not in st.dist and (not e.is_used(it) or try_used):
                    nc = votes.get(v, 0) + weight
                    votes[v] = nc
                    if nc > best_cnt or (
                        nc == best_cnt
                        and best_okey is not None
                        and okey < best_okey
                    ):
                        best_cnt = nc
                        best_vid = v
                        best_okey = okey
                        best_origin = now
                else:
                    break
                it = e.nxt(it) if forward else e.prv(it)
                d += 1
        if best_vid == 0:
            return 0, None, 0
        return best_vid, best_origin, best_cnt

    # ---- pushes (delegate to the proven lockstep primitive) ----

    def push_back(self, edge: Edge) -> bool:
        from sibeliaz_tpu.lcb.batched_push import push_back_batch

        ok = push_back_batch(self.e, [self.st], [edge])[0]
        if ok:
            self.right_body.append((edge, self.st.right_flank - edge[4]))
        return ok

    def push_front(self, edge: Edge) -> bool:
        e = self.e
        st = self.st
        vertex = edge[0]
        if st.overflow:
            return False
        if vertex in st.dist:
            return False
        end_d = st.left_flank
        start_d = end_d - edge[4]
        st.dist[vertex] = start_d
        t = e.t
        av = abs(vertex)
        lo, hi = int(t.occ_off[av]), int(t.occ_off[av + 1])
        from sibeliaz_tpu.lcb.batched_push import _compatible_front

        for j in range(lo, hi):
            c = int(t.occ_chr[j])
            i = int(t.occ_idx[j])
            s_ = 1 if int(t.jid[c][i]) == vertex else -1
            seq_it = (c, i, s_)
            keys = st.keys()
            p = int(np.searchsorted(keys, st._key(c, i), side="right"))
            in_chr = p < st.n and st.chr[p] == c
            if in_chr:
                loi = min(st.fi[p], st.bi[p])
                hii = max(st.fi[p], st.bi[p])
                if loi <= i <= hii:
                    continue
            cand = -1
            if s_ > 0:
                if in_chr and _compatible_front(e, st, p, seq_it, edge):
                    cand = p
            else:
                q = p - 1
                if q >= 0 and st.chr[q] == c and _compatible_front(
                    e, st, q, seq_it, edge
                ):
                    cand = q
            if cand >= 0 and e.vid(
                (int(st.chr[cand]), int(st.fi[cand]), int(st.s[cand]))
            ) != vertex:
                if not st.ffin[cand]:
                    jp = t.jpos[int(st.chr[cand])]
                    was_good = (
                        abs(int(jp[st.fi[cand]]) - int(jp[st.bi[cand]]))
                        >= e.m
                    )
                    st.fi[cand] = i
                    st.fdist[cand] = start_d
                    if st.s[cand] < 0:
                        st.cmp[cand] = i
                    now_good = (
                        abs(int(jp[st.fi[cand]]) - int(jp[st.bi[cand]]))
                        >= e.m
                    )
                    if not was_good and now_good:
                        st.good_seq[cand] = st.next_good
                        st.next_good += 1
                    if e.is_used(seq_it):
                        st.ffin[cand] = True
            elif not e.is_used(seq_it):
                st._insert(c, s_, i, start_d)
        self.left_body.append((edge, start_d))
        st.left_flank = start_d
        return True

    # ---- the Process protocol (blocksfinder.h:228-310 semantics) ----

    def best_snapshot(self) -> List[Instance]:
        out = []
        st = self.st
        for q in st.good_list_order():
            inst = Instance(int(st.chr[q]), int(st.s[q]), 0, 0)
            inst.fi = int(st.fi[q])
            inst.bi = int(st.bi[q])
            inst.fdist = int(st.fdist[q])
            inst.bdist = int(st.bdist[q])
            inst.cmp = int(st.cmp[q])
            inst.ffin = bool(st.ffin[q])
            inst.bfin = bool(st.bfin[q])
            out.append(inst)
        return out

    def extend(self, forward: bool, state: dict) -> bool:
        e = self.e
        success = False
        vid, origin, _ = self.most_popular(forward, False)
        if forward and vid == 0:
            vid, origin, _ = self.most_popular(True, True)
        if vid != 0:
            it = origin
            while e.vid(it) != vid:
                if forward:
                    success = self.push_back(e.out_edge(it))
                else:
                    success = self.push_front(e.in_edge(it))
                if success:
                    state["score"] = self.score()
                    if state["score"] > state["best_score"]:
                        state["best_score"] = state["score"]
                        if forward:
                            state["best_right"] = len(self.right_body) + 1
                        else:
                            state["best_left"] = len(self.left_body) + 1
                        if state["score"] > 0:
                            state["best_instance"] = self.best_snapshot()
                it = e.nxt(it) if forward else e.prv(it)
        return success

    def run(self) -> List[Instance]:
        state = {
            "score": 0,
            "best_score": 0,
            "best_right": 1,
            "best_left": 1,
            "best_instance": [],
        }
        min_run = self.e.b * 2
        while True:
            positive = False
            prev_len = self.middle_length()
            while True:
                ret = self.extend(True, state)
                if not (ret and self.middle_length() - prev_len <= min_run):
                    break
                positive = positive or (state["score"] > 0)
            if not ret or not positive:
                break
        best_edges = [
            self.right_body[i][0] for i in range(state["best_right"] - 1)
        ]
        self.reset()
        for ed in best_edges:
            self.push_back(ed)
        while True:
            prev_len = self.middle_length()
            while True:
                ret = self.extend(False, state)
                if not (ret and self.middle_length() - prev_len <= min_run):
                    break
            positive = state["score"] > 0
            if not ret or not positive:
                break
        if self.st.overflow:
            raise OverflowError("lane exceeded instance capacity")
        return state["best_instance"]


def process_batch(
    eng: LcbEngine, bundles: Sequence[Bundle]
) -> List[List[Instance]]:
    """Process every bundle of a phase on the batched layout; overflowing
    lanes fall back to the oracle engine (exactness preserved)."""
    out = []
    for bundle in bundles:
        lane = LaneProcess(eng, bundle)
        try:
            out.append(lane.run())
        except OverflowError:
            out.append(eng.process(bundle))
    return out
