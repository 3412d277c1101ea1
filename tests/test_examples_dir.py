"""The committed examples/ directory is a golden artifact: the generator is
deterministic, the pipeline reproduces the committed GFF byte-for-byte, and
the compiled *reference* binary agrees on the same junction graph (the same
role the reference repo's examples/sibeliaz_out plays, SURVEY.md §4)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")
sys.path.insert(0, EXAMPLES)

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.io import dbg, fasta
from sibeliaz_tpu import pipeline

import make_examples
import reference_oracle


def _load_inputs():
    seqs, names = [], []
    for g in (1, 2):
        for rec in fasta.read_fasta(
            os.path.join(EXAMPLES, f"genome{g}.fa")
        ):
            seqs.append(rec.seq)
            names.append(rec.name)
    return seqs, names


def test_generator_matches_committed_fastas(tmp_path):
    built = make_examples.build()
    for g, recs in enumerate(built):
        path = tmp_path / f"genome{g + 1}.fa"
        fasta.write_fasta(str(path), recs)
        committed = open(
            os.path.join(EXAMPLES, f"genome{g + 1}.fa"), "rb"
        ).read()
        assert path.read_bytes() == committed


def test_pipeline_reproduces_committed_gff():
    seqs, names = _load_inputs()
    cfg = Config(k=15)
    res = pipeline.find_blocks(seqs, names, cfg)
    committed = open(
        os.path.join(EXAMPLES, "sibeliaz_out", "blocks_coords.gff")
    ).read()
    assert res.gff == committed
    assert res.blocks_found == 11


def test_reference_binary_agrees_on_committed_example(tmp_path):
    seqs, names = _load_inputs()
    records = construct.build_junctions(seqs, 15)
    dbg_path = str(tmp_path / "graph.dbg")
    dbg.write_dbg(dbg_path, records)
    fa_path = str(tmp_path / "all.fa")
    fasta.write_fasta(
        fa_path,
        [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)],
    )
    ref_gff = reference_oracle.run_reference_lcb(
        dbg_path, fa_path, str(tmp_path / "ref_out"), k=15
    )
    committed = open(
        os.path.join(EXAMPLES, "sibeliaz_out", "blocks_coords.gff")
    ).read()
    assert ref_gff == committed


def test_committed_maf_despells_to_inputs():
    seqs, names = _load_inputs()
    by_name = {n: s for n, s in zip(names, seqs)}
    from sibeliaz_tpu.core import alphabet

    maf = open(
        os.path.join(EXAMPLES, "sibeliaz_out", "alignment.maf")
    ).read()
    n_s = 0
    for line in maf.splitlines():
        if not line.startswith("s "):
            continue
        _, name, start, ln, strand, chr_size, row = line.split()
        start, ln, chr_size = int(start), int(ln), int(chr_size)
        seq = by_name[name]
        assert chr_size == len(seq)
        ungapped = row.replace("-", "")
        assert len(ungapped) == ln
        if strand == "+":
            frag = seq[start : start + ln]
            assert alphabet.seq_to_str(frag) == ungapped
        else:
            frag = seq[chr_size - start - ln : chr_size - start]
            assert (
                alphabet.seq_to_str(alphabet.reverse_complement(frag))
                == ungapped
            )
        n_s += 1
    assert n_s > 0


# ---- large example (reference-scale golden: examples/large/) ----

LARGE = os.path.join(EXAMPLES, "large")
sys.path.insert(0, LARGE)

LARGE_SHA = {
    "genome1.fa": "f44bc27bba29089c1f142796f0a4631131a8668908d83fb149aac67868e0c6cc",
    "genome2.fa": "ea148275a6a76583ddd7eff23a66fb1d48c33a4d8110d51aa770de11f2d52a89",
}


def test_large_generator_deterministic(tmp_path):
    """The 12 MB inputs are regenerated, not committed; their digests pin
    the generator so the committed golden stays reproducible."""
    import hashlib

    import make_large_example

    for g, recs in enumerate(make_large_example.build(), start=1):
        path = tmp_path / f"genome{g}.fa"
        fasta.write_fasta(str(path), recs)
        digest = hashlib.sha256(path.read_bytes()).hexdigest()
        assert digest == LARGE_SHA[f"genome{g}.fa"], f"genome{g}.fa drifted"


@pytest.mark.skipif(
    not os.environ.get("SIBELIAZ_SLOW_TESTS"),
    reason="set SIBELIAZ_SLOW_TESTS=1 for the 12 Mbp large-example golden run",
)
def test_large_pipeline_reproduces_committed_gff(tmp_path):
    import make_large_example

    seqs, names = [], []
    for recs in make_large_example.build():
        for r in recs:
            seqs.append(r.seq)
            names.append(r.name)
    cfg = Config(k=25, threads=4)
    res = pipeline.find_blocks(seqs, names, cfg)
    committed = open(
        os.path.join(LARGE, "sibeliaz_out", "blocks_coords.gff")
    ).read()
    assert res.gff == committed
    assert res.blocks_found == 1256

    # reference binary parity on the same junction graph
    records = construct.build_junctions(seqs, 25)
    dbg_path = str(tmp_path / "graph.dbg")
    dbg.write_dbg(dbg_path, records)
    fa = str(tmp_path / "all.fa")
    fasta.write_fasta(
        fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)]
    )
    ref = reference_oracle.run_reference_lcb(
        dbg_path, fa, str(tmp_path / "ref"), 25, threads=4
    )
    assert res.gff == ref
