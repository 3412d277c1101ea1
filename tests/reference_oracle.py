"""Test helper: build and run the *reference* sibeliaz-lcb binary as a
differential oracle.  The reference source is mounted read-only; we compile
it in a temp dir (never into our repo) and feed it our .dbg + FASTA, then
compare GFF output byte-for-byte with our engine's."""

import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

REF_SRC = "/root/reference/SibeliaZ-LCB"
_BUILD_DIR = Path(tempfile.gettempdir()) / "sibeliaz_ref_oracle"
_BIN = _BUILD_DIR / "sibeliaz-lcb"


def reference_binary() -> str:
    if _BIN.exists():
        return str(_BIN)
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    srcs = [
        f"{REF_SRC}/sibeliaz.cpp",
        f"{REF_SRC}/blocksfinder.cpp",
        f"{REF_SRC}/common/dnachar.cpp",
        f"{REF_SRC}/common/streamfastaparser.cpp",
    ]
    subprocess.run(
        [
            "g++", "-O2", "-std=c++11", "-fopenmp",
            "-I", f"{REF_SRC}/common", "-I", f"{REF_SRC}",
            *srcs, "-o", str(_BIN),
        ],
        check=True,
        capture_output=True,
    )
    return str(_BIN)


def run_reference_lcb(
    dbg_path: str,
    fasta_path: str,
    out_dir: str,
    k: int,
    b: int = 200,
    m: int = 50,
    a: int = 150,
    threads: int = 1,
) -> str:
    """Run the reference binary with --noseq; return the GFF text."""
    os.makedirs(out_dir, exist_ok=True)
    subprocess.run(
        [
            reference_binary(),
            "--graph", dbg_path, fasta_path,
            "-k", str(k), "-b", str(b), "-m", str(m),
            "-t", str(threads), "--abundance", str(a),
            "--noseq", "-o", out_dir,
        ],
        check=True,
        capture_output=True,
        timeout=300,
    )
    with open(os.path.join(out_dir, "blocks_coords.gff")) as f:
        return f.read()


def random_related_genomes(seed, n_genomes=2, n_chr=1, length=3000,
                           mut=0.01, rearrange=False, n_prob=0.0):
    """Simulated close genomes: point mutations on a common ancestor, with
    optional segment reversal to exercise negative strands."""
    from sibeliaz_tpu.core import alphabet

    rng = np.random.default_rng(seed)
    ancestors = [
        alphabet.decode(rng.integers(0, 4, size=length).astype(np.uint8))
        for _ in range(n_chr)
    ]
    genomes = []
    for g in range(n_genomes):
        seqs = []
        for anc in ancestors:
            seq = anc.copy()
            for p in np.flatnonzero(rng.random(len(seq)) < mut):
                seq[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
            if rearrange and g > 0:
                lo = int(rng.integers(0, len(seq) // 2))
                hi = lo + int(rng.integers(len(seq) // 4, len(seq) // 2))
                seq[lo:hi] = alphabet.reverse_complement(seq[lo:hi])
            if n_prob:
                mask = rng.random(len(seq)) < n_prob
                seq[mask] = ord("N")
            seqs.append(seq)
        genomes.append(seqs)
    # flatten: genome-major, chromosome-minor; names Genome{g}.Chr{c}
    flat, names = [], []
    for g, seqs in enumerate(genomes):
        for c, s in enumerate(seqs):
            flat.append(s)
            names.append(f"Genome{g + 1}.Chr{c + 1}")
    return flat, names
