"""Device score kernel: Path::Score for a whole lane batch in one program.

The score sums, over the good list in append order, RealLength minus the
squared flank penalty, bailing to -INT32_MAX when any flank exceeds the
bound (path.h:604-628).  Order independence: the sum is over exact ints and
the bail-out yields the same value regardless of traversal order, so the
device version is a masked reduction over the [lanes, I_CAP] arrays — no
append-order bookkeeping needed for the VALUE (the order still matters for
best-instance snapshots, which stay host-side)."""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sibeliaz_tpu.junctions.table import JunctionTable
from sibeliaz_tpu.lcb.batched_push import LaneState
from sibeliaz_tpu.lcb.batched_push_device import DeviceTables
from sibeliaz_tpu.lcb.oracle import NEG_INF_SCORE


@jax.jit
def _score_kernel(tb: DeviceTables, chr_, fi, bi, fdist, bdist, good, n,
                  right_flank, left_flank, flank):
    L, CAP = chr_.shape
    col = jnp.arange(CAP, dtype=jnp.int64)[None, :]
    live = (col < n[:, None]) & good
    base = tb.chr_off[jnp.clip(chr_, 0, tb.chr_off.shape[0] - 2)]
    jf = tb.jpos[jnp.clip(base + fi, 0, tb.jpos.shape[0] - 1)]
    jb = tb.jpos[jnp.clip(base + bi, 0, tb.jpos.shape[0] - 1)]
    real = jnp.abs(jf - jb)
    right_pen = right_flank[:, None] - bdist
    left_pen = -left_flank[:, None] + fdist
    bad = live & (
        (left_pen >= flank) | (right_pen >= flank)
    )
    pen = right_pen + left_pen
    contrib = jnp.where(live, real - pen * pen, 0)
    total = jnp.sum(contrib, axis=1)
    any_bad = jnp.any(bad, axis=1)
    return jnp.where(any_bad, jnp.int64(NEG_INF_SCORE), total)


def score_batch_device(
    table: JunctionTable, lanes: Sequence[LaneState], flank: int
) -> List[int]:
    from sibeliaz_tpu.lcb.batched_push_device import _pad_lanes

    tb = DeviceTables.build(table)
    n_real = len(lanes)
    lanes = _pad_lanes(lanes)
    L = len(lanes)

    def stack(attr, dtype=np.int64):
        return jnp.asarray(
            np.stack([getattr(st, attr).astype(dtype) for st in lanes])
        )

    out = _score_kernel(
        tb,
        stack("chr"), stack("fi"), stack("bi"), stack("fdist"),
        stack("bdist"),
        jnp.asarray(np.stack([st.good_seq >= 0 for st in lanes])),
        jnp.asarray(np.array([st.n for st in lanes], np.int64)),
        jnp.asarray(np.array([st.right_flank for st in lanes], np.int64)),
        jnp.asarray(np.array([st.left_flank for st in lanes], np.int64)),
        jnp.int64(flank),
    )
    return [int(x) for x in np.asarray(out)][:n_real]
