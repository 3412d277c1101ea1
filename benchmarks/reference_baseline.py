"""Measure the COMPILED reference sibeliaz-lcb binary on the bench input.

Round-3 verdict: BENCH's vs_baseline divided by the README's "< 5 min"
documentation upper bound (/root/reference/README.md:92-93) — generous by
construction.  This script produces a MEASURED baseline instead: it builds
the reference binary from the mounted source (tests/reference_oracle.py),
generates the exact bench.py workload (16 strains x 1 Mbp, k=15), hands the
reference the same .dbg junction stream our engines consume (--graph, so
both sides skip graph construction and the LCB stage is head-to-head), and
times it at -t 1 / 2 / 32 (this machine has 2 cores; t=32 records the
thread-cap config the reference driver uses, sibeliaz:139).

Our side: the native engine (production default) and, where previously
recorded, the device engines (benchmarks/results/lcb_engines.json).

Artifact: benchmarks/results/reference_baseline.json.  CPU-only — safe to
run alongside TPU work (the .dbg is built on the CPU backend).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

OUT = os.path.join(REPO, "benchmarks", "results", "reference_baseline.json")
WORK = "/tmp/sibeliaz_ref_baseline"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from reference_oracle import reference_binary

    from sibeliaz_tpu.io import dbg as dbg_io
    from sibeliaz_tpu.io import fasta as fasta_io

    os.makedirs(WORK, exist_ok=True)
    fa = os.path.join(WORK, "input.fa")
    dbg = os.path.join(WORK, "input.dbg")

    # exact bench.py workload
    sys.path.insert(0, REPO)
    import bench

    seqs, names = bench.make_input()
    k = bench.K
    total_mbp = sum(len(s) for s in seqs) / 1e6

    if not os.path.exists(fa):
        fasta_io.write_fasta(
            fa, [fasta_io.FastaRecord(name=n, seq=s)
                 for n, s in zip(names, seqs)]
        )
    if not os.path.exists(dbg):
        from sibeliaz_tpu.graph import construct

        t0 = time.time()
        records = construct.build_junctions(seqs, k)
        print(f"[ref-baseline] CPU graph build: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        dbg_io.write_dbg(dbg, records)
    records = dbg_io.read_dbg(dbg)
    n_junctions = int(sum(len(r.pos) for r in records))

    binpath = reference_binary()
    print(f"[ref-baseline] reference binary: {binpath}", file=sys.stderr,
          flush=True)

    results = {
        "date": "2026-08-21 (round 4)",
        "config": (
            f"bench.py workload: {len(seqs)} strains x {len(seqs[0])} bp, "
            f"k={k}, {n_junctions} junctions; reference sibeliaz-lcb "
            f"compiled -O2 -fopenmp from /root/reference/SibeliaZ-LCB; "
            f"--graph (LCB stage only, same .dbg both sides); "
            f"host: {os.cpu_count()} cores"
        ),
        "reference": {},
    }

    gff_ref = None
    for t in (1, 2, 32):
        outdir = os.path.join(WORK, f"ref_t{t}")
        os.makedirs(outdir, exist_ok=True)
        t0 = time.time()
        subprocess.run(
            [
                binpath, "--graph", dbg, fa,
                "-k", str(k), "-b", "200", "-m", "50",
                "-t", str(t), "--abundance", "150",
                "--noseq", "-o", outdir,
            ],
            check=True, capture_output=True, timeout=3600,
        )
        dt = time.time() - t0
        with open(os.path.join(outdir, "blocks_coords.gff")) as f:
            g = f.read()
        if gff_ref is None:
            gff_ref = g
        assert g == gff_ref, f"reference output differs at t={t}"
        blocks = sum(1 for ln in g.splitlines() if "\tSibeliaZ\t" in ln)
        results["reference"][f"t{t}"] = {
            "lcb_seconds": round(dt, 3),
            "gff_rows": blocks,
        }
        print(f"[ref-baseline] reference t={t}: {dt:.2f}s",
              file=sys.stderr, flush=True)

    # our native engine, same process class, same .dbg
    from sibeliaz_tpu import pipeline
    from sibeliaz_tpu.config import Config
    from sibeliaz_tpu.lcb.engine import ensure_built

    ensure_built()
    cfg = Config(k=k, threads=min(os.cpu_count() or 1, 32))
    t0 = time.time()
    res = pipeline.find_blocks(seqs, names, cfg, records=records,
                               engine="native")
    dt = time.time() - t0
    results["ours_native"] = {
        "lcb_seconds": round(dt, 3),
        "blocks": res.blocks_found,
        "threads": cfg.threads,
    }
    print(f"[ref-baseline] ours native: {dt:.2f}s", file=sys.stderr,
          flush=True)

    # byte-equality cross-check while we're here
    results["gff_byte_equal"] = bool(res.gff == gff_ref)

    best_ref = min(v["lcb_seconds"] for v in results["reference"].values())
    results["summary"] = {
        "input_mbp": total_mbp,
        "reference_best_lcb_seconds": best_ref,
        "ours_native_lcb_seconds": results["ours_native"]["lcb_seconds"],
        "speedup_lcb_stage": round(
            best_ref / results["ours_native"]["lcb_seconds"], 2
        ),
        "reference_lcb_mbps": round(total_mbp / best_ref, 3),
        "readme_anchor_mbps": 0.04,
        "note": (
            "LCB stage head-to-head on the identical .dbg; graph "
            "construction is excluded on both sides (TwoPaCo is not "
            "mounted, so the reference's graph stage cannot be measured "
            "in this environment — the README end-to-end anchor stays "
            "the only end-to-end reference number)"
        ),
    }

    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1)
    os.replace(tmp, OUT)
    print(json.dumps(results["summary"]), flush=True)


if __name__ == "__main__":
    main()
