"""Deterministic generator for the LARGE example (reference-scale golden).

The reference's walkthrough example is 2 genomes x 4 chromosomes x ~1.5 Mbp
whose committed golden GFF has 6,801 lines / 1,350 blocks
(/root/reference/examples/sibeliaz_out/blocks_coords.gff); its FASTA inputs
are missing large blobs in this environment.  This generator reproduces the
same scale class deterministically — 2 genomes x 4 x 1.5 Mbp, ~4%
divergence, 10 inversions per chromosome, plus deletions on genome2 so
coordinates genuinely diverge — yielding 1,256 blocks / 2,521 GFF lines /
both strands / coverage 0.955 with the committed k=25 invocation.

The 12 MB FASTA inputs are NOT committed; they regenerate byte-for-byte:

  python examples/large/make_large_example.py        # writes genome*.fa here

then reproduce the committed golden with:

  python -m sibeliaz_tpu -k 25 -n -o examples/large/sibeliaz_out \
      examples/large/genome1.fa examples/large/genome2.fa

tests/test_examples_dir.py checks generator determinism (FASTA digests) in
the default suite and full golden byte-equality + reference-binary parity
under SIBELIAZ_SLOW_TESTS=1.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

from sibeliaz_tpu.core import alphabet  # noqa: E402
from sibeliaz_tpu.io import fasta  # noqa: E402

SEED = 33
N_CHR = 4
CHR_LEN = 1_500_000
MUT = 0.04


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
            pos = np.flatnonzero(rng.random(len(s)) < MUT)
            s[pos] = alphabet.decode(
                rng.integers(0, 4, size=len(pos)).astype(np.uint8)
            )
            for _ in range(10):
                lo = int(rng.integers(0, len(s) - 20000))
                hi = lo + int(rng.integers(2000, 20000))
                s[lo:hi] = alphabet.reverse_complement(s[lo:hi])
            if g == 1:
                # deletions so genome2's coordinates truly diverge
                cuts = sorted(rng.integers(0, len(s), size=8))
                parts, last = [], 0
                for ct in cuts:
                    parts.append(s[last:ct])
                    last = ct + int(rng.integers(200, 2000))
                parts.append(s[last:] if last < len(s) else s[:0])
                s = np.concatenate(parts)
            recs.append(fasta.FastaRecord(f"genome{g + 1}.chr{c + 1}", s))
        genomes.append(recs)
    return genomes


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for g, recs in enumerate(build(), start=1):
        fasta.write_fasta(os.path.join(here, f"genome{g}.fa"), recs)
        print(f"wrote genome{g}.fa ({sum(len(r.seq) for r in recs)} bp)")


if __name__ == "__main__":
    main()
