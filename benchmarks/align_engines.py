"""Timing comparison of the POA/MAF engines on one input.

Builds the LCB blocks once (native engine), then runs the alignment stage
end-to-end (align_blocks_to_maf) with each engine and byte-compares the
MAFs (modulo the # cmd= stamp).  Prints a JSON line per engine.

  native : OpenMP C++ POA with certificate-exact banding (production)
  tpu    : batched device DP + on-device traceback (align/tpu_poa.py),
           native fallback for blocks over its padded budgets

Usage: python benchmarks/align_engines.py [length=400000] [n_genomes=2] [engines]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    length = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_genomes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    engines = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else ["native", "tpu"]
    )

    from sibeliaz_tpu import pipeline
    from sibeliaz_tpu.align import msa as msa_mod
    from sibeliaz_tpu.config import Config
    from sibeliaz_tpu.core import alphabet

    # examples-full-maf shape (run_configs.py): 2 x 2 x 400 kbp, 3% div
    rng = np.random.default_rng(1)
    n_chr = 2
    ancestors = [
        alphabet.decode(rng.integers(0, 4, size=length).astype(np.uint8))
        for _ in range(n_chr)
    ]
    seqs, names = [], []
    for g in range(n_genomes):
        for c, anc in enumerate(ancestors):
            s = anc.copy()
            pos = np.flatnonzero(rng.random(length) < 0.03)
            s[pos] = alphabet.decode(
                rng.integers(0, 4, size=len(pos)).astype(np.uint8)
            )
            if g % 3 == 1:
                lo = int(rng.integers(0, length // 2))
                hi = lo + int(rng.integers(length // 8, length // 4))
                s[lo:hi] = alphabet.reverse_complement(s[lo:hi])
            seqs.append(s)
            names.append(f"G{g + 1}.C{c + 1}")

    threads = min(os.cpu_count() or 1, 8)
    cfg = Config(k=15, threads=threads)
    res = pipeline.find_blocks(seqs, names, cfg)
    print(
        json.dumps({"blocks": res.blocks_found, "threads": threads}),
        file=sys.stderr,
        flush=True,
    )

    mafs = {}
    for engine in engines:
        out = f"/tmp/align_bench_{engine}.maf"
        t0 = time.time()
        overflow = msa_mod.align_blocks_to_maf(
            res.blocks, seqs, names, out,
            cmd=f"bench-{engine}", threads=threads, engine=engine,
        )
        dt = time.time() - t0
        body = "".join(
            ln for ln in open(out) if not ln.startswith("# cmd=")
        )
        mafs[engine] = body
        print(json.dumps({
            "engine": engine,
            "align_seconds": round(dt, 3),
            "maf_bytes": len(body),
            "overflow_blocks": len(overflow),
        }), flush=True)
        if engine == "tpu":
            from sibeliaz_tpu.align.tpu_poa import poa_stats_dump

            poa_stats_dump()
    if len(set(mafs.values())) != 1:
        print("ENGINES DISAGREE", file=sys.stderr)
        sys.exit(1)
    print("all engines byte-identical", file=sys.stderr)


if __name__ == "__main__":
    main()
