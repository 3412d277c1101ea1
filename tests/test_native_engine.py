"""Native C++ engine: parity with the Python oracle AND with the compiled
reference binary; thread-count independence."""

import numpy as np
import pytest

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.io import dbg, fasta
from sibeliaz_tpu import pipeline

from reference_oracle import run_reference_lcb, random_related_genomes


@pytest.mark.parametrize(
    "seed,k,kwargs",
    [
        (0, 15, dict(length=3000, mut=0.01)),
        (2, 11, dict(length=2000, mut=0.02, rearrange=True)),
        (3, 15, dict(length=4000, mut=0.01, n_genomes=3)),
        (5, 15, dict(length=2500, mut=0.01, n_chr=2)),
        (7, 15, dict(length=2000, mut=0.02, n_prob=0.002)),
        (8, 21, dict(length=6000, mut=0.02, rearrange=True)),
    ],
)
def test_native_matches_reference(tmp_path, seed, k, kwargs):
    seqs, names = random_related_genomes(seed, **kwargs)
    cfg = Config(k=k)
    records = construct.build_junctions(seqs, k)
    fa = str(tmp_path / "g.fa")
    fasta.write_fasta(fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)])
    dpath = str(tmp_path / "g.dbg")
    dbg.write_dbg(dpath, records)
    ref_gff = run_reference_lcb(dpath, fa, str(tmp_path / "ref_out"), k)
    ours = pipeline.find_blocks(seqs, names, cfg, records=records, engine="native")
    assert ours.gff == ref_gff


def test_native_matches_oracle_engine(tmp_path):
    seqs, names = random_related_genomes(20, length=3000, mut=0.02, rearrange=True)
    cfg = Config(k=15)
    records = construct.build_junctions(seqs, 15)
    a = pipeline.find_blocks(seqs, names, cfg, records=records, engine="oracle")
    b = pipeline.find_blocks(seqs, names, cfg, records=records, engine="native")
    assert a.gff == b.gff
    assert a.blocks_found == b.blocks_found


def test_native_thread_independence(tmp_path):
    seqs, names = random_related_genomes(21, length=5000, mut=0.02, n_genomes=3)
    records = construct.build_junctions(seqs, 15)
    outs = []
    for t in (1, 4):
        cfg = Config(k=15, threads=t)
        outs.append(
            pipeline.find_blocks(seqs, names, cfg, records=records, engine="native").gff
        )
    assert outs[0] == outs[1]
