"""Partial-order alignment (POA) — executable specification.

Replaces the reference pipeline's external `spoa` stage (invoked as
`spoa <block.fa> -l 1 -r 1 -e -8`, SibeliaZ-LCB/sibeliaz:67: global
Needleman-Wunsch mode, MSA output, gap-extend -8).  With spoa's defaults
(match +5, mismatch -4, gap-open -8) and extend forced to -8, the affine
model degenerates to linear gaps of -8/char, which is what we implement.

Algorithm (Lee-Grasso-Sharlow POA):
  * the growing MSA is a DAG; aligned alternatives of one column form a
    "group" (spoa's aligned-nodes ring),
  * each new sequence is aligned to the DAG with global DP over a
    group-coherent topological order, then threaded into the graph: matches
    reuse nodes, mismatches add a node to the matched column's group,
    insertions add fresh columns,
  * MSA columns = groups in topological order; each sequence's row places
    its node characters in their columns.

Deterministic tie-breaking (fixed here, mirrored by the native engine):
DP traceback prefers match/mismatch, then deletion (graph advance), then
insertion; end node = highest score, then smallest topo rank; group
readiness resolved smallest-group-id-first.

This pure-Python version is the differential-test oracle for the native
C++ engine (align/native/poa.cpp) and the batched TPU path.
"""

from __future__ import annotations

import heapq
from typing import List, Optional, Tuple

MATCH = 5
MISMATCH = -4
GAP = -8
NEG = -(10**15)


class PoaGraph:
    def __init__(self) -> None:
        self.char: List[int] = []
        self.preds: List[List[int]] = []
        self.succs: List[List[int]] = []
        self.group_of: List[int] = []
        self.groups: List[List[int]] = []
        self.paths: List[List[int]] = []

    def _new_node(self, ch: int, group: Optional[int]) -> int:
        nid = len(self.char)
        self.char.append(ch)
        self.preds.append([])
        self.succs.append([])
        if group is None:
            group = len(self.groups)
            self.groups.append([])
        self.group_of.append(group)
        self.groups[group].append(nid)
        return nid

    def _add_edge(self, u: int, v: int) -> None:
        if u not in self.preds[v]:
            self.preds[v].append(u)
            self.succs[u].append(v)

    def add_first(self, seq) -> None:
        prev = None
        path = []
        for ch in seq:
            nid = self._new_node(int(ch), None)
            if prev is not None:
                self._add_edge(prev, nid)
            path.append(nid)
            prev = nid
        self.paths.append(path)

    def topo_groups(self) -> List[int]:
        """Group ids in topological order (group ready when every member's
        predecessors are all in already-emitted groups); ties by group id."""
        n_groups = len(self.groups)
        indeg = [0] * n_groups
        emitted = [False] * len(self.char)
        for g in range(n_groups):
            for nid in self.groups[g]:
                indeg[g] += len(self.preds[nid])
        remaining = [0] * n_groups
        for g in range(n_groups):
            remaining[g] = indeg[g]
        ready = [g for g in range(n_groups) if remaining[g] == 0]
        heapq.heapify(ready)
        order: List[int] = []
        while ready:
            g = heapq.heappop(ready)
            order.append(g)
            for nid in self.groups[g]:
                emitted[nid] = True
            # decrement consumers
            seen = set()
            for nid in self.groups[g]:
                for v in self.succs[nid]:
                    gv = self.group_of[v]
                    remaining[gv] -= 1
                    if remaining[gv] == 0 and gv not in seen:
                        heapq.heappush(ready, gv)
                        seen.add(gv)
        if len(order) != n_groups:
            raise RuntimeError("POA graph has a cycle")
        return order

    def topo_nodes(self) -> List[int]:
        return [nid for g in self.topo_groups() for nid in self.groups[g]]

    def align(self, seq) -> List[Tuple[Optional[int], Optional[int]]]:
        """Global DP of seq against the graph; returns [(node|None, pos|None)]."""
        topo = self.topo_nodes()
        rank = {nid: r for r, nid in enumerate(topo)}
        N = len(topo)
        L = len(seq)
        # H[i][r] over topo rank r; virtual source column handled separately.
        H = [[NEG] * N for _ in range(L + 1)]
        src = [GAP * i for i in range(L + 1)]  # H[i][source] = -8*i

        def pred_ranks(nid):
            ps = self.preds[nid]
            return [rank[p] for p in ps] if ps else None

        for r, nid in enumerate(topo):
            prs = pred_ranks(nid)
            best = src[0] if prs is None else max(H[0][pr] for pr in prs)
            H[0][r] = best + GAP
        for i in range(1, L + 1):
            ch = int(seq[i - 1])
            for r, nid in enumerate(topo):
                s = MATCH if self.char[nid] == ch else MISMATCH
                prs = pred_ranks(nid)
                if prs is None:
                    diag = src[i - 1] + s
                    dele = src[i] + GAP
                else:
                    diag = max(H[i - 1][pr] for pr in prs) + s
                    dele = max(H[i][pr] for pr in prs) + GAP
                ins = H[i - 1][r] + GAP
                H[i][r] = max(diag, dele, ins)

        # end at a sink node (no successors) with max score, smallest rank
        sinks = [r for r, nid in enumerate(topo) if not self.succs[nid]]
        best_r = max(sinks, key=lambda r: (H[L][r], -r))
        # traceback
        aln: List[Tuple[Optional[int], Optional[int]]] = []
        i, r = L, best_r
        while i > 0 or r is not None:
            nid = topo[r] if r is not None else None
            if r is not None:
                ch = int(seq[i - 1]) if i > 0 else -1
                s = MATCH if (i > 0 and self.char[nid] == ch) else MISMATCH
                prs = pred_ranks(nid)
                # match / mismatch
                if i > 0:
                    if prs is None:
                        if H[i][r] == src[i - 1] + s:
                            aln.append((nid, i - 1))
                            i, r = i - 1, None
                            continue
                    else:
                        hit = None
                        for pr in prs:
                            if H[i][r] == H[i - 1][pr] + s:
                                hit = pr
                                break
                        if hit is not None:
                            aln.append((nid, i - 1))
                            i, r = i - 1, hit
                            continue
                # deletion (graph char, no seq char)
                if prs is None:
                    if H[i][r] == src[i] + GAP:
                        aln.append((nid, None))
                        r = None
                        continue
                else:
                    hit = None
                    for pr in prs:
                        if H[i][r] == H[i][pr] + GAP:
                            hit = pr
                            break
                    if hit is not None:
                        aln.append((nid, None))
                        r = hit
                        continue
                # insertion (seq char, no graph node)
                aln.append((None, i - 1))
                i = i - 1
                continue
            else:
                aln.append((None, i - 1))
                i -= 1
        aln.reverse()
        return aln

    def add_alignment(self, aln, seq) -> None:
        prev = None
        path: List[int] = []
        for nid, i in aln:
            if i is None:
                continue  # deletion: nothing for this sequence
            ch = int(seq[i])
            if nid is not None:
                if self.char[nid] == ch:
                    node = nid
                else:
                    node = None
                    for cand in self.groups[self.group_of[nid]]:
                        if self.char[cand] == ch:
                            node = cand
                            break
                    if node is None:
                        node = self._new_node(ch, self.group_of[nid])
            else:
                node = self._new_node(ch, None)
            if prev is not None:
                self._add_edge(prev, node)
            path.append(node)
            prev = node
        self.paths.append(path)

    def add_sequence(self, seq) -> None:
        if not self.char:
            self.add_first(seq)
        else:
            self.add_alignment(self.align(seq), seq)

    def msa(self) -> List[bytes]:
        order = self.topo_groups()
        col = {g: c for c, g in enumerate(order)}
        ncols = len(order)
        rows = []
        for path in self.paths:
            row = bytearray(b"-" * ncols)
            for nid in path:
                row[col[self.group_of[nid]]] = self.char[nid]
            rows.append(bytes(row))
        return rows


def poa_msa(seqs: List) -> List[bytes]:
    """MSA of sequences (uint8 arrays / bytes), rows in input order."""
    g = PoaGraph()
    for s in seqs:
        g.add_sequence(s)
    return g.msa()
