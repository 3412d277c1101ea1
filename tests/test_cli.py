"""CLI end-to-end: full pipeline from FASTA files on disk, both -n and
aligned modes, plus .dbg checkpoint interop."""

import subprocess
import sys

sys.path.insert(0, "tests")

from sibeliaz_tpu.cli import run
from sibeliaz_tpu.io import fasta

from reference_oracle import random_related_genomes


def write_inputs(tmp_path, seqs, names):
    fa = tmp_path / "genomes.fa"
    fasta.write_fasta(
        str(fa), [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)]
    )
    return str(fa)


def test_cli_noalign(tmp_path, capsys):
    seqs, names = random_related_genomes(50, length=2000, mut=0.02)
    fa = write_inputs(tmp_path, seqs, names)
    out = tmp_path / "out"
    rc = run(["-k", "15", "-n", "-o", str(out), fa])
    assert rc == 0
    gff = (out / "blocks_coords.gff").read_text()
    assert gff.startswith("##gff-version 3.1.26\n")
    assert "SibeliaZ" in gff


def test_cli_full_with_maf(tmp_path):
    seqs, names = random_related_genomes(51, length=1500, mut=0.02)
    fa = write_inputs(tmp_path, seqs, names)
    out = tmp_path / "out"
    rc = run(["-k", "15", "-o", str(out), "-t", "2", fa])
    assert rc == 0
    maf = (out / "alignment.maf").read_text()
    assert maf.startswith("##maf version=1\n")
    assert "\na\n" in maf


def test_cli_dbg_checkpoint_roundtrip(tmp_path):
    seqs, names = random_related_genomes(52, length=1500, mut=0.02)
    fa = write_inputs(tmp_path, seqs, names)
    out1, out2 = tmp_path / "o1", tmp_path / "o2"
    dbg = tmp_path / "g.dbg"
    assert run(["-k", "15", "-n", "-o", str(out1), "--dump-graph", str(dbg), fa]) == 0
    assert run(["-k", "15", "-n", "-o", str(out2), "--graph", str(dbg), fa]) == 0
    assert (out1 / "blocks_coords.gff").read_text() == (
        out2 / "blocks_coords.gff"
    ).read_text()


def _maf_body(path):
    # drop the '# cmd=' provenance line (argv differs by construction)
    return "\n".join(
        l for l in path.read_text().splitlines() if not l.startswith("# cmd=")
    )


def test_cli_tpu_align_engine(tmp_path):
    seqs, names = random_related_genomes(53, length=1200, mut=0.02)
    fa = write_inputs(tmp_path, seqs, names)
    out_n, out_t = tmp_path / "on", tmp_path / "ot"
    assert run(["-k", "15", "-o", str(out_n), fa]) == 0
    assert run(["-k", "15", "-o", str(out_t), "--align-engine", "tpu", fa]) == 0
    assert _maf_body(out_n / "alignment.maf") == _maf_body(
        out_t / "alignment.maf"
    )


def test_cli_tpu_lcb_engine(tmp_path):
    """--lcb-engine tpu (resident device exploration) produces a GFF
    byte-identical to the native engine's."""
    seqs, names = random_related_genomes(53, length=2000, mut=0.02,
                                         rearrange=True)
    fa = write_inputs(tmp_path, seqs, names)
    out_n = tmp_path / "out_native"
    out_t = tmp_path / "out_tpu"
    assert run(["-k", "15", "-n", "-o", str(out_n), fa]) == 0
    assert run(["-k", "15", "-n", "-o", str(out_t),
                "--lcb-engine", "tpu", fa]) == 0
    assert (out_n / "blocks_coords.gff").read_text() == (
        out_t / "blocks_coords.gff"
    ).read_text()


def test_cli_tpu_fused_lcb_engine(tmp_path):
    """--lcb-engine tpu-fused (single-dispatch phase state machine)
    produces a GFF byte-identical to the native engine's."""
    seqs, names = random_related_genomes(53, length=2000, mut=0.02,
                                         rearrange=True)
    fa = write_inputs(tmp_path, seqs, names)
    out_n = tmp_path / "out_native2"
    out_f = tmp_path / "out_fused"
    assert run(["-k", "15", "-n", "-o", str(out_n), fa]) == 0
    assert run(["-k", "15", "-n", "-o", str(out_f),
                "--lcb-engine", "tpu-fused", fa]) == 0
    assert (out_n / "blocks_coords.gff").read_text() == (
        out_f / "blocks_coords.gff"
    ).read_text()


def test_cli_wide_k_cross_engine(tmp_path):
    """k=33 (two-limb k-mer codes) end-to-end: the full -n pipeline runs
    and the native and oracle LCB engines agree byte-for-byte, exercising
    the -strand pos+k coordinate rule at a wide k."""
    seqs, names = random_related_genomes(52, length=2500, mut=0.02)
    fa = write_inputs(tmp_path, seqs, names)
    gffs = []
    for eng in ("native", "oracle"):
        out = tmp_path / f"out_{eng}"
        rc = run(["-k", "33", "-n", "-o", str(out), "--lcb-engine", eng, fa])
        assert rc == 0
        gffs.append((out / "blocks_coords.gff").read_text())
    assert gffs[0] == gffs[1]
    assert "SO:0000856" in gffs[0]
