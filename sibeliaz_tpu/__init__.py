"""sibeliaz_tpu — a TPU-native whole-genome aligner / locally collinear block (LCB) builder.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SibeliaZ
(reference: medvedevgroup/SibeliaZ v1.2.7):

  * compacted de Bruijn graph junction enumeration (TwoPaCo stage) as a
    sort-based, exactly-batched XLA program (``sibeliaz_tpu.graph``),
  * locally collinear block construction via greedy carrier-path extension
    with speculative phase-parallelism and deterministic serial commit
    (``sibeliaz_tpu.lcb``),
  * partial-order-alignment MSA of block copies (spoa stage) as batched
    wavefront DP (``sibeliaz_tpu.align``),
  * GFF3 / MAF serialization byte-compatible with the reference
    (``sibeliaz_tpu.output``),
  * multi-chip scaling via jax.sharding meshes with sequence-axis halo
    sharding (``sibeliaz_tpu.parallel``).

64-bit integer support is required for exact k-mer codes (2 bits/char,
k <= 31 fits int64); we enable it globally at import, before any JAX
computation happens.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the junction kernels compile in minutes on
# the remote TPU toolchain; caching makes that a once-per-machine cost.
try:
    _cache_dir = _os.environ.get(
        "SIBELIAZ_TPU_COMPILE_CACHE",
        _os.path.join(
            _os.environ.get(
                "XDG_CACHE_HOME",
                _os.path.join(_os.path.expanduser("~"), ".cache"),
            ),
            "sibeliaz_tpu",
            "jax_cache",
        ),
    )
    if _cache_dir and _cache_dir != "0":
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # pragma: no cover — cache is best-effort
    pass

from sibeliaz_tpu.config import Config  # noqa: E402

__version__ = "0.1.0"

__all__ = ["Config", "__version__"]
