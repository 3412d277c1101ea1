"""End-to-end pipeline orchestration (the reference's bash driver, as a
library; SibeliaZ-LCB/sibeliaz:138-152).

Stages: graph construction (device) -> junction table -> LCB engine ->
trim/renumber -> GFF (+ optionally POA alignment -> MAF)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.io.dbg import JunctionChr
from sibeliaz_tpu.junctions.table import JunctionTable
from sibeliaz_tpu.lcb.blocks import Block
from sibeliaz_tpu.output import gff as gff_mod
from sibeliaz_tpu.output import trim as trim_mod


@dataclasses.dataclass
class LcbResult:
    blocks: List[Block]
    gff: str
    blocks_found: int
    coverage: float
    table: JunctionTable


def build_table(
    seqs: Sequence[np.ndarray],
    names: Sequence[str],
    cfg: Config,
    records: Optional[Sequence[JunctionChr]] = None,
) -> JunctionTable:
    if records is None:
        records = construct.build_junctions(list(seqs), cfg.k)
    return JunctionTable.build(records, list(seqs), list(names), cfg.k, cfg.abundance_threshold)


def find_blocks(
    seqs: Sequence[np.ndarray],
    names: Sequence[str],
    cfg: Config,
    records: Optional[Sequence[JunctionChr]] = None,
    engine: str = "native",
) -> LcbResult:
    from sibeliaz_tpu.utils.metrics import GLOBAL as metrics

    with metrics.stage("junction_table"):
        table = build_table(seqs, names, cfg, records)
    metrics.set("vertices", table.n_vertices)
    metrics.set("junction_records", int(sum(len(p) for p in table.jpos)))
    with metrics.stage("lcb_engine", engine=engine):
        if engine in ("oracle", "tpu", "resident", "tpu-fused"):
            from sibeliaz_tpu.lcb.oracle import LcbEngine

            eng = LcbEngine(
                table,
                min_block_size=cfg.min_block_size,
                max_branch_size=cfg.max_branch_size,
                max_flanking_size=cfg.flanking,
                looking_depth=cfg.looking_depth,
            )
            if engine == "oracle":
                raw = eng.run()
            elif engine == "tpu-fused":
                from sibeliaz_tpu.lcb.fused import (
                    run_fused,
                    vote_budget_from_bytes,
                )

                vb = (
                    vote_budget_from_bytes(cfg.memory_budget_bytes)
                    if cfg.memory_budget_bytes
                    else None
                )
                raw = run_fused(eng, vote_budget=vb)
            else:
                from sibeliaz_tpu.lcb.resident import run_resident

                raw = run_resident(eng)
        else:
            from sibeliaz_tpu.lcb.engine import run_native

            raw = run_native(
                table,
                min_block_size=cfg.min_block_size,
                max_branch_size=cfg.max_branch_size,
                max_flanking_size=cfg.flanking,
                looking_depth=cfg.looking_depth,
                threads=cfg.threads,
            )
    chr_lengths = [len(s) for s in seqs]
    with metrics.stage("trim_and_render"):
        blocks, n_found = trim_mod.trim_blocks(raw, chr_lengths, cfg.min_block_size)
        cov = trim_mod.coverage(blocks, chr_lengths)
        text = gff_mod.render_gff(blocks, list(names), chr_lengths)
    metrics.set("blocks_found", n_found)
    metrics.set("coverage", cov)
    return LcbResult(
        blocks=blocks, gff=text, blocks_found=n_found, coverage=cov, table=table
    )
