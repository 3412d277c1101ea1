"""TPU-hardware smoke test for the pallas kernel; skips when the platform
has no TPU or when the toolchain cannot legalize gridded pallas calls
(a known limitation of this environment's remote Mosaic pipeline)."""

import os

import numpy as np
import pytest


@pytest.mark.skipif(
    os.environ.get("JAX_PLATFORMS", "") == "cpu",
    reason="TPU-only smoke test",
)
def test_canon_packed_on_tpu():
    import jax

    if not any(d.platform != "cpu" for d in jax.devices()):
        pytest.skip("no TPU device")
    import jax.numpy as jnp

    from sibeliaz_tpu.graph import pallas_kernels as pk

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=pk.TILE).astype(np.uint8)
    try:
        out = pk.canon_packed(jnp.asarray(codes), 15)
        out[0].block_until_ready()
    except Exception as e:  # noqa: BLE001
        if "Mosaic failed" in str(e) or "legalize" in str(e):
            pytest.skip(f"toolchain cannot compile gridded pallas: {e!s:.120}")
        raise
    hi, lo, packed = [np.asarray(o) for o in out]
    m = 1000
    ehi, elo, epk = pk.canon_packed_reference(codes[: m + 15 + 2], 15)
    assert np.array_equal(packed[:m], epk[:m])
    assert np.array_equal(hi[:m], ehi[:m])
    assert np.array_equal(lo[:m], elo[:m])
