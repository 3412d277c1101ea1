"""Low-complexity / repeat-heavy genomes vs the reference binary — the
riskiest input class for junction semantics (dense classes, palindromic
arrangements, abundance-filter interplay)."""

import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, "tests")

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu.graph import construct
from sibeliaz_tpu.io import dbg, fasta
from sibeliaz_tpu import pipeline

from reference_oracle import run_reference_lcb


def _cases():
    rng = np.random.default_rng(7)
    unit = alphabet.decode(rng.integers(0, 4, size=30).astype(np.uint8))
    tandem = [
        np.concatenate([unit] * 60),
        np.concatenate([unit] * 55 + [alphabet.reverse_complement(unit)] * 5),
    ]
    h = np.concatenate(
        [
            np.full(300, ord("A"), np.uint8),
            alphabet.decode(rng.integers(0, 4, size=800).astype(np.uint8)),
            np.full(200, ord("T"), np.uint8),
        ]
    )
    h2 = h.copy()
    for p in np.flatnonzero(rng.random(len(h2)) < 0.02):
        h2[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
    d = alphabet.str_to_seq("AT" * 500 + "GC" * 300)
    d2 = d.copy()
    for p in np.flatnonzero(rng.random(len(d2)) < 0.03):
        d2[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
    pal = alphabet.decode(rng.integers(0, 4, size=400).astype(np.uint8))
    seqp = np.concatenate([pal, alphabet.reverse_complement(pal), pal])
    return {
        "tandem": tandem,
        "homopolymer": [h, h2],
        "dinuc": [d, d2],
        "palindromic": [seqp, seqp.copy()],
    }


@pytest.mark.parametrize("case", ["tandem", "homopolymer", "dinuc", "palindromic"])
@pytest.mark.parametrize("k,a", [(9, 150), (15, 6)])
def test_low_complexity_byte_identical(case, k, a):
    seqs = _cases()[case]
    names = [f"s{i}" for i in range(len(seqs))]
    records = construct.build_junctions(seqs, k)
    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "g.fa")
        fasta.write_fasta(
            fa, [fasta.FastaRecord(n, s) for n, s in zip(names, seqs)]
        )
        dp = os.path.join(td, "g.dbg")
        dbg.write_dbg(dp, records)
        ref = run_reference_lcb(dp, fa, os.path.join(td, "ref"), k, a=a)
    cfg = Config(k=k, abundance_threshold=a)
    ours = pipeline.find_blocks(seqs, names, cfg, records=records, engine="native")
    assert ours.gff == ref
