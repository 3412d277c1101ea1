"""Chunk-file byte parity with the reference and abundance-filter parity."""

import os
import subprocess
import sys

sys.path.insert(0, "tests")

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.io import dbg, fasta
from sibeliaz_tpu.output import chunks as chunks_mod
from sibeliaz_tpu import pipeline

from reference_oracle import (
    random_related_genomes,
    reference_binary,
    run_reference_lcb,
)


def test_chunk_files_byte_identical(tmp_path):
    seqs, names = random_related_genomes(60, length=2500, mut=0.02, rearrange=True)
    k = 15
    records = construct.build_junctions(seqs, k)
    fa = str(tmp_path / "g.fa")
    fasta.write_fasta(fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)])
    dpath = str(tmp_path / "g.dbg")
    dbg.write_dbg(dpath, records)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    subprocess.run(
        [reference_binary(), "--graph", dpath, fa, "-k", str(k), "-b", "200",
         "-m", "50", "-t", "1", "--abundance", "150", "-o", str(ref_out),
         "--chunks", "8"],
        check=True, capture_output=True, timeout=300,
    )
    cfg = Config(k=k)
    ours = pipeline.find_blocks(seqs, names, cfg, records=records, engine="native")
    our_out = tmp_path / "our_out"
    chunks_mod.write_chunks(ours.blocks, seqs, names, str(our_out), chunks=8)
    for i in range(8):
        ref_f = (ref_out / f"{i}.tmp").read_text()
        our_f = (our_out / f"{i}.tmp").read_text()
        assert our_f == ref_f, f"chunk {i} differs"


def test_abundance_filter_parity(tmp_path):
    # Low -a forces the filter to actually drop repeat-heavy vertices.
    import numpy as np

    from sibeliaz_tpu.core import alphabet

    rng = np.random.default_rng(61)
    unit = alphabet.decode(rng.integers(0, 4, size=200).astype(np.uint8))
    base = np.concatenate(
        [unit] * 5
        + [alphabet.decode(rng.integers(0, 4, size=2000).astype(np.uint8))]
    )
    g2 = base.copy()
    for p in np.flatnonzero(rng.random(len(g2)) < 0.01):
        g2[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
    seqs, names = [base, g2], ["s1", "s2"]
    k = 11
    a = 6
    records = construct.build_junctions(seqs, k)
    fa = str(tmp_path / "g.fa")
    fasta.write_fasta(fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)])
    dpath = str(tmp_path / "g.dbg")
    dbg.write_dbg(dpath, records)
    ref_gff = run_reference_lcb(dpath, fa, str(tmp_path / "ref_out"), k, a=a)
    cfg = Config(k=k, abundance_threshold=a)
    ours = pipeline.find_blocks(seqs, names, cfg, records=records, engine="native")
    assert ours.gff == ref_gff


def test_chunk_files_byte_identical_many_blocks(tmp_path):
    """>16 block instances: GroupBy's UNSTABLE std::sort by id leaves an
    introsort residue in the within-group record order (insertion sort
    below 16 elements masks it) — byte parity must survive that."""
    seqs, names = random_related_genomes(
        61, length=6000, mut=0.06, rearrange=True, n_genomes=4
    )
    k = 15
    records = construct.build_junctions(seqs, k)
    fa = str(tmp_path / "g.fa")
    fasta.write_fasta(fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)])
    dpath = str(tmp_path / "g.dbg")
    dbg.write_dbg(dpath, records)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    subprocess.run(
        [reference_binary(), "--graph", dpath, fa, "-k", str(k), "-b", "200",
         "-m", "50", "-t", "1", "--abundance", "150", "-o", str(ref_out),
         "--chunks", "4"],
        check=True, capture_output=True, timeout=300,
    )
    cfg = Config(k=k)
    ours = pipeline.find_blocks(seqs, names, cfg, records=records, engine="native")
    assert len(ours.blocks) > 16, "scenario must exceed the introsort threshold"
    our_out = tmp_path / "our_out"
    chunks_mod.write_chunks(ours.blocks, seqs, names, str(our_out), chunks=4)
    for i in range(4):
        ref_f = (ref_out / f"{i}.tmp").read_text()
        our_f = (our_out / f"{i}.tmp").read_text()
        assert our_f == ref_f, f"chunk {i} differs"
