"""Differential test: our pipeline's GFF must be byte-identical to the
compiled reference sibeliaz-lcb run on the same .dbg + FASTA."""

import os

import numpy as np
import pytest

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.io import dbg, fasta
from sibeliaz_tpu import pipeline

from reference_oracle import run_reference_lcb, random_related_genomes


def run_both(tmp_path, seqs, names, k, b=200, m=50, a=150, engine="oracle"):
    cfg = Config(k=k, max_branch_size=b, min_block_size=m, abundance_threshold=a)
    records = construct.build_junctions(seqs, k)
    fa = str(tmp_path / "g.fa")
    fasta.write_fasta(fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)])
    dpath = str(tmp_path / "g.dbg")
    dbg.write_dbg(dpath, records)
    ref_gff = run_reference_lcb(dpath, fa, str(tmp_path / "ref_out"), k, b, m, a)
    ours = pipeline.find_blocks(seqs, names, cfg, records=records, engine=engine)
    return ref_gff, ours.gff


@pytest.mark.parametrize(
    "seed,k,kwargs",
    [
        (0, 15, dict(length=3000, mut=0.01)),
        (1, 15, dict(length=3000, mut=0.03)),
        (2, 11, dict(length=2000, mut=0.02, rearrange=True)),
        (3, 15, dict(length=4000, mut=0.01, n_genomes=3)),
        (4, 9, dict(length=1500, mut=0.05)),
        (5, 15, dict(length=2500, mut=0.01, n_chr=2)),
        (6, 21, dict(length=5000, mut=0.02, rearrange=True)),
        (7, 15, dict(length=2000, mut=0.02, n_prob=0.002)),
    ],
)
def test_gff_byte_equal(tmp_path, seed, k, kwargs):
    seqs, names = random_related_genomes(seed, **kwargs)
    ref, ours = run_both(tmp_path, seqs, names, k)
    assert ours == ref


def test_gff_byte_equal_small_m(tmp_path):
    seqs, names = random_related_genomes(10, length=3000, mut=0.02)
    ref, ours = run_both(tmp_path, seqs, names, 15, m=30)
    assert ours == ref


def test_reference_determinism_across_threads(tmp_path):
    # Sanity: the reference's own t=1 vs t=4 output is identical (NEWS.md:46),
    # so comparing our engine against t=1 covers all thread counts.
    seqs, names = random_related_genomes(3, length=3000, mut=0.02)
    records = construct.build_junctions(seqs, 15)
    fa = str(tmp_path / "g.fa")
    fasta.write_fasta(fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)])
    dpath = str(tmp_path / "g.dbg")
    dbg.write_dbg(dpath, records)
    g1 = run_reference_lcb(dpath, fa, str(tmp_path / "o1"), 15, threads=1)
    g4 = run_reference_lcb(dpath, fa, str(tmp_path / "o4"), 15, threads=4)
    assert g1 == g4


def test_empty_middle_chromosome_we_work_reference_aborts(tmp_path):
    """A chromosome with zero junction records (all-N) fires the
    reference's per-record idx-reset quirk (junctionstorage.h:600-613),
    desyncing vertex idx from the dense position index — and the reference
    binary then ABORTS (verified SIGABRT).  Divergence by design: our
    table keeps dense indexing, the pipeline produces a valid GFF, and
    oracle/native engines agree."""
    import subprocess

    rng = np.random.default_rng(88)
    from sibeliaz_tpu.core import alphabet

    base = alphabet.decode(rng.integers(0, 4, size=2500).astype(np.uint8))
    mut = base.copy()
    idx = np.flatnonzero(rng.random(len(mut)) < 0.02)
    mut[idx] = alphabet.decode(
        rng.integers(0, 4, size=len(idx)).astype(np.uint8)
    )
    blank = np.full(400, ord("N"), np.uint8)
    seqs = [base, blank, mut]
    names = ["g1.chr1", "g1.gap", "g2.chr1"]
    try:
        _, ours = run_both(tmp_path, seqs, names, 15)
    except subprocess.CalledProcessError:
        # the reference aborted; run only our side
        cfg = Config(k=15)
        records = construct.build_junctions(seqs, 15)
        ours = pipeline.find_blocks(
            seqs, names, cfg, records=records, engine="oracle"
        ).gff
    cfg = Config(k=15)
    records = construct.build_junctions(seqs, 15)
    ours_native = pipeline.find_blocks(
        seqs, names, cfg, records=records, engine="native"
    ).gff
    assert ours == ours_native
    assert ours.startswith("##gff-version")
    assert "g2.chr1" in ours
