"""Device bundle enumeration must equal the oracle's make_bundles exactly
(count/rank/resolve values AND final order, incl. unstable-sort residue)."""

import sys

import pytest

sys.path.insert(0, "tests")

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.lcb.device_bundles import make_bundles_device
from sibeliaz_tpu.lcb.oracle import LcbEngine
from sibeliaz_tpu import pipeline

from reference_oracle import random_related_genomes


@pytest.mark.parametrize("seed,kwargs", [
    (0, dict(length=2000, mut=0.02)),
    (1, dict(length=1500, mut=0.05, rearrange=True)),
    (2, dict(length=2500, mut=0.01, n_genomes=3)),
    (3, dict(length=1000, mut=0.03, n_chr=2, n_prob=0.01)),
])
def test_matches_oracle(seed, kwargs):
    seqs, names = random_related_genomes(seed + 400, **kwargs)
    cfg = Config(k=15)
    table = pipeline.build_table(seqs, names, cfg)
    eng = LcbEngine(table, cfg.min_block_size, cfg.max_branch_size, cfg.flanking)
    expect = eng.make_bundles()
    got = make_bundles_device(table)
    assert len(got) == len(expect)
    for a, b in zip(got, expect):
        assert (a.vid, a.ch, a.count, a.rank, a.resolve) == (
            b.vid, b.ch, b.count, b.rank, b.resolve
        )
