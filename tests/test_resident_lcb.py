"""Resident device LCB engine (lcb/resident.py): exactness vs the oracle.

The resident engine keeps lane state on device for a whole phase; these
tests assert (a) per-bundle best-instance snapshots identical to the
oracle's Process, and (b) byte-identical GFF through the full phase/commit
protocol, including multi-phase runs where `used` flags refresh."""

import sys

import numpy as np

sys.path.insert(0, "tests")

from sibeliaz_tpu import pipeline
from sibeliaz_tpu.config import Config
from sibeliaz_tpu.lcb.oracle import LcbEngine
from sibeliaz_tpu.lcb.resident import process_phase_resident, run_resident

from reference_oracle import random_related_genomes


def build(seed, **kwargs):
    seqs, names = random_related_genomes(seed, **kwargs)
    cfg = Config(k=15)
    table = pipeline.build_table(seqs, names, cfg)
    eng = LcbEngine(table, cfg.min_block_size, cfg.max_branch_size, cfg.flanking)
    return seqs, names, cfg, table, eng


def test_resident_phase_matches_oracle_process():
    _, _, _, table, eng = build(520, length=2500, mut=0.03, rearrange=True)
    bundles = eng.make_bundles()[:64]
    got = process_phase_resident(eng, bundles)
    for b, bundle in enumerate(bundles):
        expect = eng.process(bundle)
        g = [(i.c, i.s, i.fi, i.bi, i.fdist, i.bdist, i.cmp, i.ffin, i.bfin)
             for i in got[b]]
        e = [(i.c, i.s, i.fi, i.bi, i.fdist, i.bdist, i.cmp, i.ffin, i.bfin)
             for i in expect]
        assert g == e, f"bundle {b} ({bundle.vid},{bundle.ch})"


def test_resident_full_gff_byte_equal():
    from sibeliaz_tpu.output import gff as gff_mod
    from sibeliaz_tpu.output import trim as trim_mod

    seqs, names = random_related_genomes(521, length=2500, mut=0.03,
                                         rearrange=True)
    cfg = Config(k=15)

    def run(resident):
        table = pipeline.build_table(seqs, names, cfg)
        eng = LcbEngine(table, cfg.min_block_size, cfg.max_branch_size,
                        cfg.flanking)
        raw = run_resident(eng) if resident else eng.run()
        chr_lengths = [len(s) for s in seqs]
        blocks, _ = trim_mod.trim_blocks(raw, chr_lengths, cfg.min_block_size)
        return gff_mod.render_gff(blocks, names, chr_lengths)

    assert run(True) == run(False)


def test_device_seeding_matches_host():
    """_seed_lanes_device must produce the identical DeviceLanes slab as
    the host _seed_lanes for every field (the h2d-lean seeding path)."""
    import numpy as np
    from sibeliaz_tpu.lcb.resident import (
        _device_tables, _seed_lanes, _seed_lanes_device,
    )

    _, _, _, _, eng = build(123, length=4000, mut=0.03, rearrange=True)
    bundles = eng.make_bundles()[:48]
    # mark a few junctions used so the used-slot filter is exercised
    for c in range(eng.t.n_chr):
        eng.t.used[c][:: max(1, len(eng.t.used[c]) // 7)] = 1
    tb = _device_tables(eng)
    L = 64
    h_ln, h_n, h_ovf = _seed_lanes(eng.t, bundles, L)
    d_ln, d_n, d_ovf = _seed_lanes_device(tb, bundles, L)
    assert np.array_equal(h_n, d_n)
    assert np.array_equal(h_ovf, d_ovf)
    import dataclasses as dc

    for f in dc.fields(h_ln):
        a = np.asarray(getattr(h_ln, f.name))
        b = np.asarray(getattr(d_ln, f.name))
        assert np.array_equal(a, b), f"seed field {f.name} diverged"
