"""TPU-batched partial-order alignment (the device POA path, SURVEY §2.3 P3).

The POA DP recurrence for sequence-vs-DAG global alignment with linear gaps

    H[i][r] = max( max_p H[i-1][pred_p] + s(seq_i, char_r),   # match
                   max_p H[i][pred_p]   - 8,                  # deletion
                   H[i-1][r]            - 8 )                 # insertion

has two dependence directions (along the DAG and along the sequence).  The
TPU formulation resolves them as:

  * a `lax.scan` over graph nodes in topological order (the DAG direction is
    inherently sequential, but each step is a full VPU vector over the
    sequence axis),
  * the within-column insertion chain — col[i] = max(base[i], col[i-1]-8) —
    collapsed into one damped running maximum:
        col = cummax(base + 8*i) - 8*i
    which XLA lowers to a parallel prefix scan, no sequential loop,
  * `vmap` over a bucket of blocks, so one device program aligns the next
    copy of every block in the bucket simultaneously.

Scores/tie-breaks mirror align/poa_ref.py exactly (match > deletion >
insertion, first arg-max over predecessors, smallest-rank sink), so the
device engine is differential-tested against the executable spec.  Graph
maintenance (threading the alignment, topological order, MSA emission)
reuses the spec's PoaGraph on the host — only the O(L·N) DP runs on device.

Blocks whose graphs outgrow the padded node budget or predecessor fan-in
fall back to the native host engine.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sibeliaz_tpu.align.poa_ref import GAP, MATCH, MISMATCH, PoaGraph

MAX_PREDS = 8
_TILE = 8  # topo ranks per scan step (amortizes per-step scan overhead)
NEG = -(2**29)

# direction encoding: bits 0-3 pred slot, bit 4 match, bit 5 insertion
_DIR_MATCH = 1 << 4
_DIR_INS = 1 << 5


def _dp_single(seq, seq_len, node_char, pred_idx, pred_ok, sink_mask, n_max):
    """DP for one block; returns (dirs [N, L+1] uint8, best_r int32).

    `dirs` is consumed by the on-device traceback (_tb_single) and never
    leaves HBM — shipping it d2h was the device engine's bottleneck (at
    N=7k, L=4k it is ~29 MB per block per round).  A rolling-window H
    variant (O(D*L) scratch) was tried and measured 4-5x SLOWER here: the
    modular gather/update indices defeat XLA's in-place scan aliasing, so
    the full [n_max+1, L+1] carry stays."""
    L = seq.shape[0]
    ivec = jnp.arange(L + 1, dtype=jnp.int32)
    src_col = (GAP * ivec).astype(jnp.int32)  # virtual source column
    seq0 = jnp.concatenate([jnp.zeros(1, jnp.uint8), seq])

    # carry: H rows for all nodes plus the source column in row n_max; the
    # scan processes _TILE consecutive topo ranks per step (straight-line
    # inner unroll; rank t sees ranks t' < t through the updated H).
    def one_rank(H, r, char_r, pidx, pok):
        predH = jnp.where(pok[:, None], H[pidx], NEG)
        shifted = jnp.concatenate(
            [jnp.full((MAX_PREDS, 1), NEG, jnp.int32), predH[:, :-1]], axis=1
        )
        diag_best = jnp.max(shifted, axis=0)
        diag_slot = jnp.argmax(shifted, axis=0).astype(jnp.uint8)
        subs = jnp.where(seq0 == char_r, MATCH, MISMATCH).astype(jnp.int32)
        diag = diag_best + subs
        horiz_best = jnp.max(predH, axis=0)
        horiz_slot = jnp.argmax(predH, axis=0).astype(jnp.uint8)
        horiz = horiz_best + GAP
        is_match = diag >= horiz
        base = jnp.maximum(diag, horiz)
        col = jax.lax.cummax(base + 8 * ivec) - 8 * ivec
        is_ins = col > base
        d = jnp.where(is_match, diag_slot | _DIR_MATCH, horiz_slot).astype(
            jnp.uint8
        )
        d = jnp.where(is_ins, jnp.uint8(_DIR_INS), d)
        H = jax.lax.dynamic_update_slice(H, col[None, :], (r, jnp.int32(0)))
        return H, d

    def step2(carry, xs):
        H, r = carry
        chars, pidxs, poks = xs
        ds = []
        for t in range(_TILE):
            H, d = one_rank(H, r + t, chars[t], pidxs[t], poks[t])
            ds.append(d)
        return (H, r + _TILE), jnp.stack(ds)

    n_tiles = n_max // _TILE
    H0 = jnp.full((n_max + 1, L + 1), NEG, jnp.int32)
    H0 = H0.at[n_max].set(src_col)
    (H, _), dirs = jax.lax.scan(
        step2,
        (H0, jnp.int32(0)),
        (
            node_char.reshape(n_tiles, _TILE),
            pred_idx.reshape(n_tiles, _TILE, MAX_PREDS),
            pred_ok.reshape(n_tiles, _TILE, MAX_PREDS),
        ),
    )
    dirs = dirs.reshape(n_max, L + 1)
    # sink selection at row seq_len: max score, then smallest rank
    scores = H[:n_max, seq_len]
    scores = jnp.where(sink_mask, scores, NEG)
    best_r = jnp.argmax(scores).astype(jnp.int32)
    return dirs, best_r


def _tb_single(dirs, best_r, seq_len, pred_idx, n_max, P):
    """Traceback on device: walk dirs from (best_r, seq_len) to the virtual
    source, emitting (rank, seqpos) per step (-1 encodes None) into fixed
    [P] registers.  Mirrors the host/spec traceback's order and tie-breaks
    exactly; the caller reverses the emitted prefix."""
    out_r = jnp.full(P, -1, jnp.int32)
    out_i = jnp.full(P, -1, jnp.int32)

    def cond(c):
        i, r, at_src, t, _, _ = c
        return ((i > 0) | ~at_src) & (t < P)

    def body(c):
        i, r, at_src, t, our, oui = c
        d = dirs[r, jnp.maximum(i, 0)]
        is_ins = ~at_src & ((d & _DIR_INS) != 0)
        is_match = ~at_src & ((d & _DIR_INS) == 0) & ((d & _DIR_MATCH) != 0)
        is_del = ~at_src & ((d & _DIR_INS) == 0) & ((d & _DIR_MATCH) == 0)
        gap_seq = at_src | is_ins  # emit (None, i-1)
        emit_r = jnp.where(gap_seq, -1, r)
        emit_i = jnp.where(gap_seq | is_match, i - 1, -1)
        our = our.at[t].set(emit_r.astype(jnp.int32))
        oui = oui.at[t].set(emit_i.astype(jnp.int32))
        step_i = gap_seq | is_match
        i2 = jnp.where(step_i, i - 1, i)
        slot = (d & 0xF).astype(jnp.int32)
        p = pred_idx[r, slot]
        follow = is_match | is_del
        at_src2 = at_src | (follow & (p == n_max))
        r2 = jnp.where(follow & (p != n_max), p, r)
        return (i2, r2, at_src2, t + 1, our, oui)

    _, _, _, t, out_r, out_i = jax.lax.while_loop(
        cond, body,
        (seq_len.astype(jnp.int32), best_r, jnp.bool_(False),
         jnp.int32(0), out_r, out_i),
    )
    return out_r, out_i, t


@functools.partial(jax.jit, static_argnums=(6, 7))
def _dp_tb_batch(seq, seq_len, node_char, pred_idx, pred_ok, sink_mask,
                 n_max, P):
    """Fused DP + traceback per block; only the O(L+N) paths leave HBM."""

    def one(a, b, c, d, e, f):
        dirs, best_r = _dp_single(a, b, c, d, e, f, n_max)
        return _tb_single(dirs, best_r, b, d, n_max, P)

    return jax.vmap(one)(seq, seq_len, node_char, pred_idx, pred_ok,
                         sink_mask)


class _BlockState:
    def __init__(self, seqs: List[np.ndarray]):
        self.seqs = seqs
        self.graph = PoaGraph()
        self.graph.add_first(seqs[0])
        self.next = 1
        self.fallback = False

    @property
    def done(self) -> bool:
        return self.fallback or self.next >= len(self.seqs)


def _extract_arrays(g: PoaGraph, n_max: int):
    """Topo-rank-space arrays for the device DP, or None if over budget."""
    topo = g.topo_nodes()
    N = len(topo)
    if N > n_max:
        return None
    rank = {nid: r for r, nid in enumerate(topo)}
    node_char = np.zeros(n_max, dtype=np.uint8)
    pred_idx = np.full((n_max, MAX_PREDS), n_max, dtype=np.int32)
    pred_ok = np.zeros((n_max, MAX_PREDS), dtype=bool)
    sink = np.zeros(n_max, dtype=bool)
    for r, nid in enumerate(topo):
        node_char[r] = g.char[nid]
        ps = g.preds[nid]
        if len(ps) > MAX_PREDS:
            return None
        if ps:
            for k, p in enumerate(ps):
                pred_idx[r, k] = rank[p]
                pred_ok[r, k] = True
        else:
            pred_idx[r, 0] = n_max  # virtual source
            pred_ok[r, 0] = True
        sink[r] = not g.succs[nid]
    return topo, node_char, pred_idx, pred_ok, sink


# Bytes of MODELED scratch (H + dirs) per dispatch.  The true XLA
# allocation plan runs ~2.6x the model (measured on v5e: a 6 GB-modeled
# bucket compiled to a 15.84 GB plan and OOMed a 15.75 GB chip — the
# while_loop double-buffers H and the traceback phase adds its own
# scratch), so the budget is set to keep the TRUE plan near 10.5 GB with
# headroom for the resident inputs.
HBM_BUDGET = 4 << 30


def device_budget_eligible(
    blocks_seqs: Sequence[Sequence[np.ndarray]],
    node_budget_factor: float = 1.75,
    budget_bytes: Optional[int] = None,
) -> List[bool]:
    """Per block: does its (L, n_max) bucket fit the device scratch
    budget?  The same routing test poa_msa_batch_tpu applies up front —
    callers can schedule ineligible blocks on the native engine
    CONCURRENTLY with the device dispatches instead of serially after
    them (the native redo was ~40% of the device-engine wall time on the
    examples-full-maf config)."""
    hbm_budget = HBM_BUDGET if budget_bytes is None else max(
        64 << 20, budget_bytes // 3
    )
    out = []
    for seqs in blocks_seqs:
        max_len = max(len(s) for s in seqs)
        L = max(64, 1 << (max_len - 1).bit_length())
        n_max = -(-int(L * node_budget_factor) // _TILE) * _TILE
        per_block = (n_max + 1) * (L + 1) * 4 + n_max * (L + 1)
        out.append(per_block <= hbm_budget)
    return out


def poa_msa_batch_tpu(
    blocks_seqs: Sequence[Sequence[np.ndarray]],
    node_budget_factor: float = 1.75,
    mesh=None,
    budget_bytes: Optional[int] = None,
) -> List[Optional[List[bytes]]]:
    """MSA per block computed with the device DP; None for blocks that fell
    back (caller should route those to the native engine).

    Blocks are bucketed by padded sequence length so a 100 bp block never
    pays a 16 kbp block's (L, n_max) pad, and each bucket's dispatches are
    capped so the per-block H + dirs scratch fits the modeled budget
    (default HBM_BUDGET; budget_bytes — the driver's -f — overrides it,
    divided by 3 because the true XLA plan runs ~2.6x the model)."""
    if not blocks_seqs:
        return []
    hbm_budget = HBM_BUDGET if budget_bytes is None else max(
        64 << 20, budget_bytes // 3
    )
    all_states = [_BlockState([np.asarray(s, dtype=np.uint8) for s in seqs])
                  for seqs in blocks_seqs]
    buckets: dict = {}
    for b, st in enumerate(all_states):
        max_len = max(len(s) for s in st.seqs)
        L = max(64, 1 << (max_len - 1).bit_length())
        buckets.setdefault(L, []).append(b)
    # Merge small buckets upward: per-dispatch RPC latency dominates this
    # tunneled backend (135 ms measured at B=8), so fewer, FULLER
    # dispatches beat tighter padding — the DP runs at ~1.5% of its HBM
    # bound, so padded compute is nearly free.  Greedy smallest-first:
    # absorb a bucket into the next one whenever the combined block count
    # still fits one batch dispatch at the larger shape.
    def _cap_at(L: int) -> int:
        n_max = -(-int(L * node_budget_factor) // _TILE) * _TILE
        per_block = (n_max + 1) * (L + 1) * 4 + n_max * (L + 1)
        return int(hbm_budget // max(per_block, 1))

    merged: dict = {}
    pend_members: list = []
    items = sorted(buckets.items())
    for idx, (L, members) in enumerate(items):
        pend_members += members
        if idx + 1 < len(items):
            nxt_L, nxt_members = items[idx + 1]
            if len(pend_members) + len(nxt_members) <= _cap_at(nxt_L):
                continue  # absorb into the next (larger) bucket
        merged.setdefault(L, []).extend(pend_members)
        pend_members = []
    buckets = merged
    for L, members in sorted(buckets.items()):
        n_max = -(-int(L * node_budget_factor) // _TILE) * _TILE
        per_block = (n_max + 1) * (L + 1) * 4 + n_max * (L + 1)  # H + dirs
        if per_block > hbm_budget:
            # even ONE such block's true allocation plan exceeds the chip
            # (measured: a modeled-9.4G single-block dispatch compiled to a
            # 15.84G plan and OOMed a 15.75G v5e) — route the bucket to the
            # native fallback instead of forcing a doomed dispatch
            for b in members:
                all_states[b].fallback = True
            continue
        # round the cap DOWN to a power of two: _run_bucket pads batches up
        # to a power of two, which must never exceed the memory budget
        b_cap = max(1, int(hbm_budget // per_block))
        b_cap = 1 << (b_cap.bit_length() - 1)
        _run_bucket(all_states, members, L, n_max, b_cap, mesh=mesh)
    out: List[Optional[List[bytes]]] = []
    for st in all_states:
        out.append(None if st.fallback else st.graph.msa())
    return out


import os as _os
import sys as _sys
import time as _time

_STATS = {"extract_s": 0.0, "device_s": 0.0, "thread_s": 0.0, "h2d_build_s": 0.0,
          "dispatches": 0, "blocks_dispatched": 0}


def _poa_stats_enabled() -> bool:
    return bool(_os.environ.get("SZ_POA_STATS"))


def poa_stats_dump() -> dict:
    if _poa_stats_enabled():
        print(f"[tpu_poa] {_STATS}", file=_sys.stderr, flush=True)
    return dict(_STATS)


def _run_bucket(states: List[_BlockState], members: List[int], L: int,
                n_max: int, b_cap: int, mesh=None) -> None:
    """Drive one (L, n_max) bucket's blocks to completion.

    With a mesh, the batch (block) axis is sharded over the mesh's first
    axis — blocks are independent, so GSPMD partitions the whole fused
    DP+traceback with no cross-device communication."""
    while any(not states[b].done for b in members):
        active = [b for b in members if not states[b].done][:b_cap]
        t0 = _time.time()
        arrs = []
        for b in active:
            st = states[b]
            ex = _extract_arrays(st.graph, n_max)
            if ex is None:
                st.fallback = True
                continue
            arrs.append((b, ex))
        _STATS["extract_s"] += _time.time() - t0
        if not arrs:
            continue
        # pad the batch to a power of two so jit compilations are reused
        t0 = _time.time()
        B = len(arrs)
        B_pad = 1 << (B - 1).bit_length()
        if mesh is not None:  # batch axis must split evenly over devices
            B_pad = -(-max(B_pad, mesh.size) // mesh.size) * mesh.size
        seq_b = np.zeros((B_pad, L), dtype=np.uint8)
        len_b = np.zeros(B_pad, dtype=np.int32)
        char_b = np.zeros((B_pad, n_max), dtype=np.uint8)
        pi_b = np.full((B_pad, n_max, MAX_PREDS), n_max, dtype=np.int32)
        po_b = np.zeros((B_pad, n_max, MAX_PREDS), dtype=bool)
        sink_b = np.zeros((B_pad, n_max), dtype=bool)
        for j, (b, (topo, nc, pi, po, sk)) in enumerate(arrs):
            st = states[b]
            s = st.seqs[st.next]
            seq_b[j, : len(s)] = s
            len_b[j] = len(s)
            char_b[j] = nc
            pi_b[j] = pi
            po_b[j] = po
            sink_b[j] = sk
        P = L + n_max + 2
        if mesh is None:
            dev = jnp.asarray
        else:
            from jax.sharding import NamedSharding, PartitionSpec as PSpec

            ax = mesh.axis_names[0]

            def dev(x):
                spec = PSpec(ax, *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))

        _STATS["h2d_build_s"] += _time.time() - t0
        t0 = _time.time()
        out_r, out_i, tcount = _dp_tb_batch(
            dev(seq_b), dev(len_b), dev(char_b),
            dev(pi_b), dev(po_b), dev(sink_b),
            n_max, P,
        )
        out_r = np.asarray(out_r)
        out_i = np.asarray(out_i)
        tcount = np.asarray(tcount)
        _STATS["device_s"] += _time.time() - t0
        _STATS["dispatches"] += 1
        _STATS["blocks_dispatched"] += len(arrs)
        t0 = _time.time()
        for j, (b, (topo, *_rest)) in enumerate(arrs):
            st = states[b]
            s = st.seqs[st.next]
            t = int(tcount[j])
            if t >= P:  # traceback register overflow (cannot happen for a
                st.fallback = True  # well-formed DP; never trust garbage)
                continue
            aln: List[Tuple[Optional[int], Optional[int]]] = []
            for q in range(t - 1, -1, -1):
                r = int(out_r[j, q])
                i = int(out_i[j, q])
                aln.append((topo[r] if r >= 0 else None,
                            i if i >= 0 else None))
            st.graph.add_alignment(aln, s)
            st.next += 1
        _STATS["thread_s"] += _time.time() - t0
