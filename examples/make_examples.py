"""Deterministic generator for the committed example inputs.

Mirrors the reference's `examples/` layout (two related simulated genomes,
four chromosomes each — /root/reference/examples/README.md:1-4; its FASTA
inputs are missing large blobs in this environment, so we commit our own
small deterministic pair).  Running this script always reproduces
genome1.fa / genome2.fa byte-for-byte; the committed blocks_coords.gff is
the pipeline's output on them (cross-validated against the compiled
reference binary in tests/test_examples_dir.py).

  python examples/make_examples.py          # regenerate the FASTA inputs
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sibeliaz_tpu.core import alphabet  # noqa: E402
from sibeliaz_tpu.io import fasta  # noqa: E402

N_CHR = 4
CHR_LEN = 25_000
MUT = 0.01
SEED = 20_26


def build():
    rng = np.random.default_rng(SEED)
    ancestors = [
        alphabet.decode(rng.integers(0, 4, size=CHR_LEN).astype(np.uint8))
        for _ in range(N_CHR)
    ]
    genomes = []
    for g in range(2):
        recs = []
        for c, anc in enumerate(ancestors):
            s = anc.copy()
            pos = np.flatnonzero(rng.random(CHR_LEN) < MUT)
            s[pos] = alphabet.decode(
                rng.integers(0, 4, size=len(pos)).astype(np.uint8)
            )
            if g == 1 and c % 2 == 0:  # one inversion per even chromosome
                lo = int(rng.integers(0, CHR_LEN // 2))
                hi = lo + int(rng.integers(CHR_LEN // 8, CHR_LEN // 4))
                s[lo:hi] = alphabet.reverse_complement(s[lo:hi])
            recs.append(fasta.FastaRecord(f"genome{g + 1}.chr{c + 1}", s))
        genomes.append(recs)
    return genomes


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for g, recs in enumerate(build()):
        fasta.write_fasta(os.path.join(here, f"genome{g + 1}.fa"), recs)
    print("wrote genome1.fa genome2.fa")


if __name__ == "__main__":
    main()
