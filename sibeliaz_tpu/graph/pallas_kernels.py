"""Pallas TPU kernels for the graph stage.

`canon_packed` fuses the entire per-position front-half of junction
enumeration — 2-bit encoding, k-window validity, forward/rc k-mer codes,
canonical-orientation test, extension-character evidence, run-boundary
flags — into one VMEM-resident pass.  The XLA formulation of the same math
(graph/construct.py) materializes ~20 rolled copies of the position array
in HBM; here each grid step DMAs one tile plus halo rows into VMEM and
emits three int32 outputs, so HBM traffic drops to ~1 read + 3 writes.

Toolchain status: the kernel is verified against its numpy oracle in
interpret mode and written to Mosaic's constraints, but the axon
remote-compile toolchain in this environment fails to legalize ANY gridded
pallas_call (`func.return` legalization error on even the textbook blocked
elementwise kernel — gridless whole-array kernels compile fine), so the
XLA formulation remains the production path until the toolchain catches
up.  tests/test_pallas_kernels.py carries a TPU smoke test that skips on
that toolchain error.

TPU-shape notes (hard-won against this Mosaic toolchain):
  * 1-D vectors are unsupported — the genome stream is laid out (rows, 128)
    and a flat shift by `off` becomes a lane rotate + row rotate pair with
    a column-mask select,
  * 64-bit integers are avoided: the canonical code is emitted as a
    (hi, lo) int32 pair (hi = first k-16 chars, lo = last 16) that the
    caller packs into the int64 sort key,
  * bool vectors are neither rolled nor converted (Mosaic's bool-conversion
    fallback recurses); definiteness is re-derived per shifted copy and
    all constants are strongly typed int32 to dodge weak-type no-op
    converts.

Outputs per position p (genome order):
  canon_hi, canon_lo: canonical k-mer code halves (hi < 2^30),
  packed: bits 0-4 right-extension presence (bit 4 = none), 5-9 left,
      10 boundary, 11 positive orientation, 12 valid window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sibeliaz_tpu.core import alphabet

_NO_EXT = 4
LANES = 128
ROWS = 256
TILE = ROWS * LANES  # positions per grid step


def _kernel(hbm_ref, hi_ref, lo_ref, packed_ref, *, k: int):
    t = pl.program_id(0)
    n_rows = ROWS + 2  # one lead halo row + one tail halo row

    def body(win, sem):
        copy = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(t * ROWS, n_rows), :], win, sem
        )
        copy.start()
        copy.wait()

        raw = win[:]  # int32 [n_rows, 128]; position j at flat 128 + j
        i0 = jnp.int32(0)
        i3 = jnp.int32(3)
        i4 = jnp.int32(4)
        bad = jnp.int32(alphabet.BAD_CODE)
        col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)

        _cache = {}

        def rawsl(off):
            """flat shift: out[j] = raw_flat[j + 128 + off], first TILE."""
            o = 128 + off
            if o not in _cache:
                q, rem = divmod(o, LANES)
                xa = pltpu.roll(raw, jnp.int32(n_rows - q), 0)
                if rem == 0:
                    out = xa[:ROWS, :]
                else:
                    xb = pltpu.roll(raw, jnp.int32(n_rows - q - 1), 0)
                    a = pltpu.roll(xa, jnp.int32(LANES - rem), 1)
                    b = pltpu.roll(xb, jnp.int32(LANES - rem), 1)
                    out = jnp.where(
                        col < jnp.int32(LANES - rem), a[:ROWS, :], b[:ROWS, :]
                    )
                _cache[o] = out
            return _cache[o]

        def sl(off):
            r = rawsl(off)
            return jnp.where(r != bad, r, i0)

        def dsl(off):
            return rawsl(off) != bad

        # window validity: AND of definite over [p, p+k)
        valid = dsl(0)
        for i in range(1, k):
            valid = valid & dsl(i)

        # forward / rc code halves (big-endian); hi = first a chars
        b_ = min(k, 16)
        a_ = k - b_
        fwd_hi = jnp.zeros((ROWS, LANES), jnp.int32)
        for i in range(a_):
            fwd_hi = fwd_hi * i4 + sl(i)
        fwd_lo = jnp.zeros((ROWS, LANES), jnp.int32)
        for i in range(b_):
            fwd_lo = fwd_lo * i4 + sl(a_ + i)
        rc_hi = jnp.zeros((ROWS, LANES), jnp.int32)
        for j in range(a_):  # rc char j = 3 - kmer[k-1-j]
            rc_hi = rc_hi * i4 + (i3 - sl(k - 1 - j))
        rc_lo = jnp.zeros((ROWS, LANES), jnp.int32)
        for j in range(b_):
            rc_lo = rc_lo * i4 + (i3 - sl(k - 1 - (a_ + j)))

        # lexicographic comparison on (hi, lo-as-unsigned); the unsigned
        # compare runs in signed lanes via the sign-bit flip identity
        sign = jnp.int32(-2147483648)
        fl = fwd_lo ^ sign
        rl = rc_lo ^ sign
        positive = (fwd_hi < rc_hi) | ((fwd_hi == rc_hi) & (fl < rl))
        canon_hi = jnp.where(positive, fwd_hi, rc_hi)
        canon_lo = jnp.where(positive, fwd_lo, rc_lo)

        no_ext = jnp.int32(_NO_EXT)
        nxt_ok = dsl(k)
        prv_ok = dsl(-1)
        nxt = jnp.where(nxt_ok, sl(k), no_ext)
        prv = jnp.where(prv_ok, sl(-1), no_ext)
        comp_nxt = jnp.where(nxt_ok, i3 - sl(k), no_ext)
        comp_prv = jnp.where(prv_ok, i3 - sl(-1), no_ext)
        right_ext = jnp.where(positive, nxt, comp_prv)
        left_ext = jnp.where(positive, prv, comp_nxt)

        # neighbor-window validity for run boundaries
        prev_valid = prv_ok
        next_valid = nxt_ok
        for i in range(k):
            prev_valid = prev_valid & dsl(i - 1)
            next_valid = next_valid & dsl(i + 1)
        at_boundary = valid & (~prev_valid | ~next_valid)

        one = jnp.int32(1)
        zero = jnp.int32(0)
        five = jnp.int32(5)
        packed = (
            (one << right_ext)
            | (one << (left_ext + five))
            | (jnp.where(at_boundary, jnp.int32(1 << 10), zero))
            | (jnp.where(positive, jnp.int32(1 << 11), zero))
            | (jnp.where(valid, jnp.int32(1 << 12), zero))
        )
        hi_ref[:, :] = canon_hi
        lo_ref[:, :] = canon_lo
        packed_ref[:, :] = packed

    pl.run_scoped(
        body,
        pltpu.VMEM((ROWS + 2, LANES), jnp.int32),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnums=(1,))
def canon_packed(codes_u8: jnp.ndarray, k: int):
    """Run the fused front-half; codes_u8 length must be a TILE multiple.

    Returns (canon_hi, canon_lo, packed) int32 arrays of the same length."""
    n = codes_u8.shape[0]
    assert n % TILE == 0, "pad input to a TILE multiple"
    assert k + 2 <= LANES, "halo fits one tail row"
    # int32 2-D layout with one BAD lead row and one BAD tail row
    codes_i32 = codes_u8.astype(jnp.int32)
    padded = jnp.concatenate(
        [
            jnp.full((LANES,), alphabet.BAD_CODE, jnp.int32),
            codes_i32,
            jnp.full((LANES,), alphabet.BAD_CODE, jnp.int32),
        ]
    ).reshape(-1, LANES)
    grid = n // TILE
    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((ROWS, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
        ),
    )(padded)
    return tuple(o.reshape(-1) for o in out)


def canon_packed_reference(codes_np: np.ndarray, k: int):
    """Slow numpy oracle for the kernel (same output contract)."""
    n = len(codes_np)
    definite = codes_np != alphabet.BAD_CODE
    v = np.where(definite, codes_np, 0).astype(np.int64)
    hi = np.zeros(n, np.int32)
    lo = np.zeros(n, np.int32)
    packed = np.zeros(n, np.int32)
    b = min(k, 16)
    for p in range(n):
        ok = p + k <= n and definite[p : p + k].all()
        fwd = 0
        for i in range(k):
            fwd = fwd * 4 + (int(v[p + i]) if p + i < n else 0)
        rcv = 0
        for j in range(k):
            q = p + k - 1 - j
            rcv = rcv * 4 + (3 - int(v[q]) if q < n else 3)
        positive = fwd < rcv
        canon = fwd if positive else rcv
        chi, clo = canon >> (2 * b), canon & ((1 << (2 * b)) - 1)
        nxt_ok = p + k < n and definite[p + k]
        prv_ok = p >= 1 and definite[p - 1]
        nxt = int(v[p + k]) if nxt_ok else _NO_EXT
        prv = int(v[p - 1]) if prv_ok else _NO_EXT
        right = nxt if positive else (3 - prv if prv_ok else _NO_EXT)
        left = prv if positive else (3 - nxt if nxt_ok else _NO_EXT)
        pv = prv_ok and p - 1 + k <= n and definite[p - 1 : p - 1 + k].all()
        nv = p + 1 + k <= n and definite[p + 1 : p + 1 + k].all()
        bnd = ok and (not pv or not nv)
        packed[p] = (
            (1 << right)
            | (1 << (left + 5))
            | (int(bnd) << 10)
            | (int(positive) << 11)
            | (int(ok) << 12)
        )
        hi[p] = chi
        lo[p] = np.uint32(clo & 0xFFFFFFFF).astype(np.int32)
    return hi, lo, packed
