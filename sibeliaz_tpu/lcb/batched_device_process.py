"""Device-orchestrated Process() for a whole phase (batched-LCB slice 9).

Each lane's exact control flow (the reference Process protocol — forward
minRun loop, rewind, backward pass with the stray-';' semantics) runs as a
host *generator* that yields primitive requests; the driver groups the
outstanding requests of all lanes by kind each round and executes ONE
batched device call per kind:

    vote_fwd / vote_fwd_used / vote_bwd  -> lcb/batched_vote kernel
    push_fwd / push_bwd (+score)         -> lcb/batched_push_device kernels
                                            + lcb/batched_score kernel

so lanes at different protocol positions still share device programs.
Device-window overflows fall back to the host primitive for that lane and
round only (exactness is never traded).

Exactness contract: identical best-instance snapshots to the oracle's
Process for every bundle, and byte-identical GFF through the phase/commit
protocol (tested)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


from sibeliaz_tpu.junctions.table import JunctionTable
from sibeliaz_tpu.lcb.batched_process import LaneProcess
from sibeliaz_tpu.lcb.oracle import Bundle, Instance, LcbEngine

VOTE_WINDOW = 128


def _lane_protocol(lp: LaneProcess):
    """Generator reproducing LaneProcess.run, yielding primitive requests.

    Yields ("vote", forward, try_used) -> receives (vid, origin_it, cnt)
           ("push", forward, edge)     -> receives (success, score)
    Returns the best-instance snapshot via StopIteration.value."""
    e = lp.e
    state = {
        "score": 0,
        "best_score": 0,
        "best_right": 1,
        "best_left": 1,
        "best_instance": [],
    }
    min_run = e.b * 2

    def extend(forward):
        vid, origin, _ = yield ("vote", forward, False)
        if forward and vid == 0:
            vid, origin, _ = yield ("vote", True, True)
        success = False
        if vid != 0:
            it = origin
            while e.vid(it) != vid:
                edge = e.out_edge(it) if forward else e.in_edge(it)
                success, score = yield ("push", forward, edge)
                if success:
                    state["score"] = score
                    if state["score"] > state["best_score"]:
                        state["best_score"] = state["score"]
                        if forward:
                            state["best_right"] = len(lp.right_body) + 1
                        else:
                            state["best_left"] = len(lp.left_body) + 1
                        if state["score"] > 0:
                            state["best_instance"] = lp.best_snapshot()
                it = e.nxt(it) if forward else e.prv(it)
        return success

    # forward sweep
    while True:
        positive = False
        prev_len = lp.middle_length()
        while True:
            ret = yield from extend(True)
            if not (ret and lp.middle_length() - prev_len <= min_run):
                break
            positive = positive or (state["score"] > 0)
        if not ret or not positive:
            break
    # rewind to best prefix (replayed through the same push primitive)
    best_edges = [lp.right_body[i][0] for i in range(state["best_right"] - 1)]
    lp.reset()
    for ed in best_edges:
        yield ("push", True, ed)
    # backward sweep (stray-';' semantics)
    while True:
        prev_len = lp.middle_length()
        while True:
            ret = yield from extend(False)
            if not (ret and lp.middle_length() - prev_len <= min_run):
                break
        positive = state["score"] > 0
        if not ret or not positive:
            break
    if lp.st.overflow:
        raise OverflowError("lane exceeded instance capacity")
    return state["best_instance"]


def process_batch_device(
    eng: LcbEngine, table: JunctionTable, bundles: Sequence[Bundle]
) -> List[List[Instance]]:
    """Run every bundle's Process with batched device primitives."""
    from sibeliaz_tpu.lcb.batched_push_device import (
        push_back_batch_device,
        push_front_batch_device,
    )
    from sibeliaz_tpu.lcb.batched_score import score_batch_device
    from sibeliaz_tpu.lcb.batched_vote import vote_batch_device

    lps = [LaneProcess(eng, b) for b in bundles]
    gens = [_lane_protocol(lp) for lp in lps]
    pending: List[Optional[tuple]] = []
    results: List[Optional[List[Instance]]] = [None] * len(bundles)

    def start(i):
        try:
            pending.append(gens[i].send(None))
        except StopIteration as st:
            results[i] = st.value
            pending.append(None)

    for i in range(len(gens)):
        start(i)

    def resume(i, value):
        try:
            pending[i] = gens[i].send(value)
        except StopIteration as st:
            results[i] = st.value
            pending[i] = None
        except OverflowError:
            results[i] = eng.process(bundles[i])
            pending[i] = None

    while any(p is not None for p in pending):
        # group by request kind
        votes: Dict[Tuple[bool, bool], List[int]] = {}
        pushes: Dict[bool, List[int]] = {}
        for i, p in enumerate(pending):
            if p is None:
                continue
            if p[0] == "vote":
                votes.setdefault((p[1], p[2]), []).append(i)
            else:
                pushes.setdefault(p[1], []).append(i)

        for (forward, try_used), idxs in votes.items():
            lanes = [lps[i].st for i in idxs]
            svids = [
                lps[i].right_vertex() if forward else lps[i].left_vertex()
                for i in idxs
            ]
            vid, slot, cnt, ovf = vote_batch_device(
                table, lanes, svids, forward, try_used,
                eng.depth, eng.b, max_window=VOTE_WINDOW,
            )
            for j, i in enumerate(idxs):
                if ovf[j]:
                    # window overflow: host vote for this lane (exact)
                    v, o, c = lps[i].most_popular(forward, try_used)
                    resume(i, (v, o, c))
                else:
                    st = lps[i].st
                    if int(vid[j]) == 0:
                        resume(i, (0, None, 0))
                    else:
                        q = int(slot[j])
                        end_i = int(st.bi[q]) if forward else int(st.fi[q])
                        origin = (int(st.chr[q]), end_i, int(st.s[q]))
                        resume(i, (int(vid[j]), origin, int(cnt[j])))

        for forward, idxs in pushes.items():
            lanes = [lps[i].st for i in idxs]
            edges = [pending[i][2] for i in idxs]
            if forward:
                ok = push_back_batch_device(table, lanes, edges, eng)
                for j, i in enumerate(idxs):
                    if ok[j]:
                        lps[i].right_body.append(
                            (edges[j], lps[i].st.right_flank - edges[j][4])
                        )
            else:
                ok = push_front_batch_device(table, lanes, edges, eng)
                for j, i in enumerate(idxs):
                    if ok[j]:
                        lps[i].left_body.append(
                            (edges[j], lps[i].st.left_flank)
                        )
            scores = score_batch_device(table, lanes, eng.flank)
            for j, i in enumerate(idxs):
                resume(i, (ok[j], scores[j]))

    return [r if r is not None else [] for r in results]
