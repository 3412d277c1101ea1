"""spoa output-parity risk characterization: the POA tie census.

The reference aligns each LCB with the external spoa binary
(`spoa <block.fa> -l 1 -r 1 -e -8`, SibeliaZ-LCB/sibeliaz:67), which is an
unmounted submodule here — byte-parity of alignment.maf is untestable
directly.  What IS provable: a block whose POA dynamic program has NO ties
(every traceback decision and the end-node choice attain their optimum
uniquely) has exactly one optimal alignment under that scoring, so every
correct implementation emits the same MSA rows for it.  Only tie-carrying
blocks are exposed to implementation tie-break order.

This script builds an examples-class workload, runs the LCB stage, and
reports the census over all aligned blocks:

  {"blocks": N, "tie_free": M, "tie_free_fraction": M/N,
   "total_ties": T, "tie_decisions_per_kcol": ...}

The census runs the pure-Python spec (O(copies * len^2) per block), so the
default workload is sized for minutes, not the full bench scale; the block
length/divergence distribution matches the examples-class shape.

Usage: python benchmarks/poa_tie_census.py [length=60000] [n_genomes=4]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    length = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_genomes = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    # The census itself is host Python; pin the pipeline to the CPU backend
    # so this characterization never contends with (or waits on) the
    # tunneled chip.  (The image's sitecustomize overrides JAX_PLATFORMS,
    # so the config update is the reliable override.)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sibeliaz_tpu import pipeline
    from sibeliaz_tpu.align.msa import block_copies, copy_sequence
    from sibeliaz_tpu.align.poa_ref import (
        poa_msa_alt_ties,
        poa_msa_with_census,
    )
    from sibeliaz_tpu.config import Config
    from sibeliaz_tpu.core import alphabet

    # Block-rich shape (divergence + inversions) so the LCB stage yields
    # many bounded-length blocks rather than one chromosome-length block —
    # matching the committed examples/ configuration's block statistics.
    rng = np.random.default_rng(13)
    base = alphabet.decode(rng.integers(0, 4, size=length).astype(np.uint8))
    seqs, names = [], []
    for g in range(n_genomes):
        s = base.copy()
        for p in np.flatnonzero(rng.random(length) < 0.04):
            s[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
        for _ in range(4):
            lo = int(rng.integers(0, length - 5000))
            hi = lo + int(rng.integers(1000, 5000))
            s[lo:hi] = alphabet.reverse_complement(s[lo:hi])
        seqs.append(s)
        names.append(f"G{g}.chr1")

    cfg = Config(k=15, threads=min(os.cpu_count() or 1, 8))
    res = pipeline.find_blocks(seqs, names, cfg)
    groups = block_copies(res.blocks)

    # cap: the pure-Python spec is quadratic; blocks beyond the cap are
    # skipped and REPORTED, not silently dropped
    max_len = int(os.environ.get("SZ_CENSUS_MAX_LEN", "6000"))
    t0 = time.time()
    n_blocks = 0
    tie_free = 0
    total_ties = 0
    total_cols = 0
    skipped = 0
    worst = []
    msa_changed = 0
    changed_cols = 0
    for bid, grp in groups:
        rows = [copy_sequence(b, seqs) for b in grp]
        if max(len(r) for r in rows) > max_len:
            skipped += 1
            continue
        msa, ties = poa_msa_with_census(rows)
        n_blocks += 1
        total_cols += len(msa[0]) if msa else 0
        total_ties += ties
        if ties == 0:
            tie_free += 1
        else:
            worst.append((ties, bid))
            # sensitivity: does an opposite (still optimal) tie order
            # actually change the MSA bytes?
            alt = poa_msa_alt_ties(rows)
            if alt != msa:
                msa_changed += 1
                if len(alt[0]) == len(msa[0]):
                    changed_cols += sum(
                        1
                        for c in range(len(msa[0]))
                        if any(a[c] != m[c] for a, m in zip(alt, msa))
                    )
                else:
                    changed_cols += max(len(alt[0]), len(msa[0]))
    worst.sort(reverse=True)
    out = {
        "blocks": n_blocks,
        "skipped_over_cap": skipped,
        "tie_free": tie_free,
        "tie_free_fraction": round(tie_free / max(1, n_blocks), 4),
        "total_ties": total_ties,
        "tie_decisions_per_kcol": round(
            1000.0 * total_ties / max(1, total_cols), 3
        ),
        "msa_changed_by_tie_order": msa_changed,
        "changed_fraction": round(msa_changed / max(1, n_blocks), 4),
        "changed_cols_per_kcol": round(
            1000.0 * changed_cols / max(1, total_cols), 3
        ),
        "worst_blocks": worst[:5],
        "census_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
