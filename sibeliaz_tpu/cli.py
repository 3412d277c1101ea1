"""Command-line interface, flag-compatible with the reference driver
(`sibeliaz [-k -b -m -a -t -f -o -n] <fasta...>`, SibeliaZ-LCB/sibeliaz:19-41)
plus explicit subcommands for the individual stages.

Differences from the reference by design: one process, no intermediate
files unless asked (--graph to dump/load the .dbg checkpoint artifact).
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import List, Optional

from sibeliaz_tpu.config import Config


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("-k", type=int, default=25, help="k-mer (vertex) size, odd")
    p.add_argument("-b", type=int, default=200, help="maximum bubble branch size")
    p.add_argument("-m", type=int, default=50, help="minimum LCB size")
    p.add_argument("-a", type=int, default=150, help="maximum junction abundance")
    p.add_argument("-t", type=int, default=0, help="worker threads (0 = all cores)")
    p.add_argument(
        "-f", type=int, default=0,
        help="device-memory budget in GB (driver -f parity): bounds the "
        "graph stage's HBM routing, the fused LCB engine's vote dispatch "
        "size, and the device POA scratch budget",
    )
    p.add_argument("-o", dest="outdir", default="./sibeliaz_out", help="output directory")
    p.add_argument("-n", dest="noalign", action="store_true", help="skip the alignment stage")
    p.add_argument("--graph", default=None, help="load junctions from a .dbg file instead of running graph construction")
    p.add_argument("--dump-graph", default=None, help="write the junction stream to this .dbg file (checkpoint)")
    p.add_argument(
        "--legacy-chunks", type=int, default=0, metavar="N",
        help="also emit reference-format <i>.tmp chunk files (N chunks) for "
        "external alignment tooling",
    )
    p.add_argument(
        "--align-engine", choices=("native", "tpu"), default="native",
        help="POA engine for the alignment stage (tpu = batched device DP "
        "with native fallback; identical output)",
    )
    p.add_argument(
        "--poa-ties", choices=("first", "last"), default="first",
        help="POA tie-break policy: 'last' is the spoa-envelope analysis "
        "mode (opposite still-optimal tie preferences via the executable "
        "spec; spec-speed) — any correct spoa-compatible aligner emits an "
        "MSA between the two policies' outputs",
    )
    p.add_argument(
        "--lcb-engine", choices=("native", "oracle", "tpu", "tpu-fused"),
        default="native",
        help="LCB exploration engine (tpu = resident-device batched phase "
        "exploration with host-oracle fallback lanes; identical output)",
    )
    p.add_argument("fastas", nargs="+", help="FASTA files with genomes")


def make_config(args) -> Config:
    import os

    threads = args.t if args.t > 0 else min(os.cpu_count() or 1, 32)
    return Config(
        k=args.k,
        max_branch_size=args.b,
        min_block_size=args.m,
        abundance_threshold=args.a,
        threads=threads,
        no_align=args.noalign,
        out_dir=args.outdir,
        memory_budget_bytes=(args.f << 30) if args.f > 0 else None,
    )


def run(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="sibeliaz-tpu",
        description="TPU-native whole-genome LCB construction and alignment",
    )
    _add_common(ap)
    args = ap.parse_args(argv)
    cfg = make_config(args)

    import os

    import numpy as np

    from sibeliaz_tpu.io import dbg as dbg_io
    from sibeliaz_tpu.io import fasta as fasta_io
    from sibeliaz_tpu import pipeline

    os.makedirs(cfg.out_dir, exist_ok=True)
    records_in = fasta_io.read_many(args.fastas)
    seqs = [r.seq for r in records_in]
    names = [r.name for r in records_in]

    t0 = time.time()
    if args.graph:
        print("Loading the graph...")
        records = dbg_io.read_dbg(args.graph)
        while len(records) < len(seqs):
            records.append(
                dbg_io.JunctionChr(
                    pos=np.zeros(0, np.uint32), ids=np.zeros(0, np.int64)
                )
            )
    else:
        print("Constructing the graph...")
        from sibeliaz_tpu.graph import construct

        # -f GB (TwoPaCo --filtermemory role) caps device memory;
        # build_junctions itself routes to the multi-round streamed path
        # when the monolithic kernel's measured footprint would exceed it
        records = construct.build_junctions(
            seqs, cfg.k, hbm_budget_bytes=cfg.memory_budget_bytes
        )
    t_graph = time.time()
    if args.dump_graph:
        dbg_io.write_dbg(args.dump_graph, records)

    print("Analyzing the graph...")
    res = pipeline.find_blocks(
        seqs, names, cfg, records=records, engine=args.lcb_engine
    )
    t_lcb = time.time()

    print("Generating the output...")
    with open(os.path.join(cfg.out_dir, "blocks_coords.gff"), "w") as f:
        f.write(res.gff)
    print(f"Blocks found: {res.blocks_found}")
    print(f"Coverage: {res.coverage:.2f}")

    if args.legacy_chunks:
        from sibeliaz_tpu.output import chunks as chunks_mod

        chunks_mod.write_chunks(
            res.blocks, seqs, names, cfg.out_dir, chunks=args.legacy_chunks
        )

    if not cfg.no_align:
        print("Performing global alignment..")
        from sibeliaz_tpu.align import msa as msa_mod

        maf_path = os.path.join(cfg.out_dir, "alignment.maf")
        msa_mod.align_blocks_to_maf(
            res.blocks, seqs, names, maf_path,
            cmd=" ".join(argv if argv is not None else sys.argv[1:]),
            chunks=cfg.chunks, threads=cfg.threads,
            engine=args.align_engine,
            budget_bytes=cfg.memory_budget_bytes,
            tie_policy=args.poa_ties,
        )
    t_end = time.time()
    print(
        f"Timings: graph {t_graph - t0:.2f}s, lcb {t_lcb - t_graph:.2f}s, "
        f"total {t_end - t0:.2f}s"
    )
    from sibeliaz_tpu.utils.metrics import GLOBAL as metrics

    metrics.dump(os.path.join(cfg.out_dir, "metrics.json"))
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
