"""Long-running randomized differential fuzzer: our native pipeline vs the
compiled reference binary, random genomes and random (k, b, m, a).

Usage: python tests/fuzz_differential.py [n_iters] [seed0]
Writes failures (inputs + params) to /tmp/sibeliaz_fuzz_failures/.
"""

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(__file__))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.io import dbg, fasta
from sibeliaz_tpu import pipeline

from reference_oracle import run_reference_lcb


def random_case(rng):
    n_genomes = int(rng.integers(2, 5))
    n_chr = int(rng.integers(1, 3))
    length = int(rng.integers(500, 4000))
    mut = float(rng.uniform(0.002, 0.08))
    k = int(rng.choice([9, 11, 15, 21, 25]))
    b = int(rng.choice([50, 100, 200, 400]))
    m = int(rng.choice([20, 50, 100, 200]))
    a = int(rng.choice([4, 10, 50, 150]))
    ancestors = [
        alphabet.decode(rng.integers(0, 4, size=length).astype(np.uint8))
        for _ in range(n_chr)
    ]
    seqs, names = [], []
    for g in range(n_genomes):
        for c, anc in enumerate(ancestors):
            s = anc.copy()
            pos = np.flatnonzero(rng.random(length) < mut)
            s[pos] = alphabet.decode(
                rng.integers(0, 4, size=len(pos)).astype(np.uint8)
            )
            if rng.random() < 0.5:
                lo = int(rng.integers(0, max(1, length - 200)))
                hi = lo + int(rng.integers(50, 200))
                s[lo:hi] = alphabet.reverse_complement(s[lo:hi])
            if rng.random() < 0.3:
                nmask = rng.random(length) < 0.005
                s[nmask] = ord("N")
            if rng.random() < 0.2:  # duplication (repeats)
                lo = int(rng.integers(0, max(1, length - 300)))
                seg = s[lo : lo + int(rng.integers(60, 300))].copy()
                ins = int(rng.integers(0, length))
                s = np.concatenate([s[:ins], seg, s[ins:]])
            seqs.append(s)
            names.append(f"G{g}.C{c}")
    return seqs, names, k, b, m, a


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    faildir = "/tmp/sibeliaz_fuzz_failures"
    os.makedirs(faildir, exist_ok=True)
    fails = 0
    for it in range(n_iters):
        seed = seed0 + it
        rng = np.random.default_rng(seed)
        seqs, names, k, b, m, a = random_case(rng)
        try:
            records = construct.build_junctions(seqs, k)
            with tempfile.TemporaryDirectory() as td:
                fa = os.path.join(td, "g.fa")
                fasta.write_fasta(
                    fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)]
                )
                dp = os.path.join(td, "g.dbg")
                dbg.write_dbg(dp, records)
                ref = run_reference_lcb(
                    dp, fa, os.path.join(td, "ref"), k, b=b, m=m, a=a,
                    threads=2,
                )
            cfg = Config(
                k=k, max_branch_size=b, min_block_size=m,
                abundance_threshold=a, threads=2,
            )
            ours = pipeline.find_blocks(
                seqs, names, cfg, records=records, engine="native"
            )
            ok = ours.gff == ref
        except Exception:
            ok = False
            ref = traceback.format_exc()
            ours = None
        if not ok:
            fails += 1
            path = os.path.join(faildir, f"fail_{seed}")
            fasta.write_fasta(
                path + ".fa",
                [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)],
            )
            with open(path + ".txt", "w") as f:
                f.write(f"seed={seed} k={k} b={b} m={m} a={a}\n")
                f.write("=== REF ===\n" + (ref or "") + "\n")
                if ours is not None:
                    f.write("=== OURS ===\n" + ours.gff + "\n")
            print(f"[{it}] seed {seed}: MISMATCH (k={k} b={b} m={m} a={a})", flush=True)
        if (it + 1) % 20 == 0:
            print(f"[{it + 1}/{n_iters}] failures so far: {fails}", flush=True)
    print(f"DONE: {n_iters} cases, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
