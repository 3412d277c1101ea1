"""Shared build-and-cache helper for the native C++ engines.

Both ctypes bindings (lcb/engine.py, align/msa.py) compile their .cpp on
first use into ~/.cache/sibeliaz_tpu/ keyed by source mtime; this is the
single copy of that recipe, and it surfaces the compiler's stderr when g++
fails instead of a bare CalledProcessError.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_CACHE_DIR = os.path.join(
    os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    ),
    "sibeliaz_tpu",
)


def build_native(src: str, libname: str) -> str:
    """Compile `src` into the cache as `libname` (if stale) and return the
    shared-object path."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    lib = os.path.join(_CACHE_DIR, libname)
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=_CACHE_DIR, delete=False
    ) as tmp:
        tmp_path = tmp.name
    cmd = [
        "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-fopenmp",
        "-march=native", src, "-o", tmp_path,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"native build failed ({' '.join(cmd)}):\n{proc.stderr}"
        )
    os.replace(tmp_path, lib)
    return lib
