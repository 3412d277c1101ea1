"""Parameter-matrix differential sweep vs the reference binary: byte
equality must hold across the full (k, b, m, a) surface, not just defaults."""

import sys

import pytest

sys.path.insert(0, "tests")

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.io import dbg, fasta
from sibeliaz_tpu import pipeline

from reference_oracle import run_reference_lcb, random_related_genomes


@pytest.mark.parametrize(
    "seed,k,b,m,a",
    [
        (200, 25, 200, 50, 150),   # reference defaults at k=25
        (201, 15, 50, 50, 150),    # tight branch bound
        (202, 15, 500, 50, 150),   # loose branch bound
        (203, 15, 200, 200, 150),  # binary's own -m default
        (204, 15, 200, 20, 150),   # small blocks kept
        (205, 15, 200, 50, 4),     # aggressive abundance filtering
        (206, 9, 100, 30, 150),    # small k
        (207, 21, 300, 100, 20),   # mixed
    ],
)
def test_param_surface(tmp_path, seed, k, b, m, a):
    seqs, names = random_related_genomes(
        seed, n_genomes=2, length=2500, mut=0.03, rearrange=(seed % 2 == 0)
    )
    records = construct.build_junctions(seqs, k)
    fa = str(tmp_path / "g.fa")
    fasta.write_fasta(fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)])
    dp = str(tmp_path / "g.dbg")
    dbg.write_dbg(dp, records)
    ref = run_reference_lcb(dp, fa, str(tmp_path / "ref"), k, b=b, m=m, a=a)
    cfg = Config(
        k=k, max_branch_size=b, min_block_size=m, abundance_threshold=a
    )
    ours = pipeline.find_blocks(seqs, names, cfg, records=records, engine="native")
    assert ours.gff == ref


def test_full_pipeline_deterministic_with_maf(tmp_path):
    from sibeliaz_tpu.align import msa as msa_mod

    seqs, names = random_related_genomes(210, length=2000, mut=0.02)
    outs = []
    for t in (1, 3):
        cfg = Config(k=15, threads=t)
        res = pipeline.find_blocks(seqs, names, cfg, engine="native")
        maf = tmp_path / f"t{t}.maf"
        msa_mod.align_blocks_to_maf(
            res.blocks, seqs, names, str(maf), cmd="x", threads=t
        )
        outs.append((res.gff, maf.read_text()))
    assert outs[0] == outs[1]


def test_tpu_poa_engine_maf_matches_native(tmp_path):
    from sibeliaz_tpu.align import msa as msa_mod

    seqs, names = random_related_genomes(211, length=1500, mut=0.02)
    cfg = Config(k=15)
    res = pipeline.find_blocks(seqs, names, cfg, engine="native")
    m1 = tmp_path / "native.maf"
    m2 = tmp_path / "tpu.maf"
    msa_mod.align_blocks_to_maf(res.blocks, seqs, names, str(m1), cmd="x")
    msa_mod.align_blocks_to_maf(
        res.blocks, seqs, names, str(m2), cmd="x", engine="tpu"
    )
    assert m1.read_text() == m2.read_text()
