"""Batched-LCB scaffolding: seeding and used-prefix range queries must
match the oracle engine's behavior exactly."""

import sys

import numpy as np

sys.path.insert(0, "tests")

from sibeliaz_tpu.config import Config
from sibeliaz_tpu.lcb import batched
from sibeliaz_tpu.lcb.oracle import LcbEngine
from sibeliaz_tpu import pipeline

from reference_oracle import random_related_genomes


def build(seed, **kwargs):
    seqs, names = random_related_genomes(seed, **kwargs)
    cfg = Config(k=15)
    table = pipeline.build_table(seqs, names, cfg)
    eng = LcbEngine(table, cfg.min_block_size, cfg.max_branch_size, cfg.flanking)
    return table, eng


def test_seed_batch_matches_oracle_init():
    table, eng = build(500, length=2000, mut=0.03, rearrange=True)
    bundles = eng.make_bundles()[:64]
    batch = batched.seed_batch(table, bundles)
    for b, bundle in enumerate(bundles):
        path = LcbEngine.Path(eng)
        path.init(bundle.vid, bundle.ch)
        expect = [(i.c, i.fi, i.s) for i in path.all]
        got = [
            (int(batch.chr[b, t]), int(batch.idx[b, t]), int(batch.strand[b, t]))
            for t in range(int(batch.n[b]))
        ]
        assert got == expect, f"bundle {b}: {bundle.vid},{bundle.ch}"


def test_seed_batch_respects_used():
    table, eng = build(501, length=1500, mut=0.03)
    bundles = eng.make_bundles()
    # run the engine so some junctions are marked used, then re-seed
    eng.run()
    batch = batched.seed_batch(table, bundles[:32])
    for b, bundle in enumerate(bundles[:32]):
        path = LcbEngine.Path(eng)
        path.init(bundle.vid, bundle.ch)
        expect = [(i.c, i.fi, i.s) for i in path.all]
        got = [
            (int(batch.chr[b, t]), int(batch.idx[b, t]), int(batch.strand[b, t]))
            for t in range(int(batch.n[b]))
        ]
        assert got == expect


def test_used_prefix_range_queries():
    table, eng = build(502, length=1500, mut=0.04)
    eng.run()  # populate used flags
    prefix = batched.used_prefix(table)
    rng = np.random.default_rng(0)
    for _ in range(200):
        c = int(rng.integers(0, table.n_chr))
        n = len(table.used[c])
        if n == 0:
            continue
        lo = int(rng.integers(0, n))
        hi = int(rng.integers(lo, n + 1))
        expect = bool(table.used[c][lo:hi].any())
        assert batched.used_range_any(prefix, c, lo, hi) == expect


def test_first_votes_match_oracle():
    table, eng = build(503, length=2500, mut=0.03, rearrange=True)
    bundles = eng.make_bundles()[:96]
    seeds = batched.seed_batch(table, bundles)
    vids, origins, counts = batched.first_votes(
        table, bundles, seeds, looking_depth=8, max_branch=200
    )
    for b, bundle in enumerate(bundles):
        path = LcbEngine.Path(eng)
        path.init(bundle.vid, bundle.ch)
        evid, eorigin, ecnt = eng.most_popular(path, forward=True, try_used=False)
        assert int(vids[b]) == evid, f"bundle {b} vid"
        assert int(counts[b]) == (ecnt if evid != 0 else 0), f"bundle {b} count"
        if evid != 0:
            t = int(origins[b])
            got_origin = (
                int(seeds.chr[b, t]), int(seeds.idx[b, t]), int(seeds.strand[b, t])
            )
            assert got_origin == (eorigin[0], eorigin[1], eorigin[2])


def test_first_votes_device_matches_host():
    table, eng = build(504, length=2500, mut=0.03, rearrange=True)
    bundles = eng.make_bundles()[:64]
    seeds = batched.seed_batch(table, bundles)
    h_vid, h_org, h_cnt = batched.first_votes(
        table, bundles, seeds, looking_depth=8, max_branch=200
    )
    d_vid, d_org, d_cnt, overflow = batched.first_votes_device(
        table, bundles, seeds, looking_depth=8, max_branch=200, max_window=128
    )
    for b in range(len(bundles)):
        if overflow[b]:
            continue  # fallback lanes are allowed to defer to the host
        assert int(d_vid[b]) == int(h_vid[b]), f"lane {b} vid"
        assert int(d_cnt[b]) == int(h_cnt[b]), f"lane {b} cnt"
        assert int(d_org[b]) == int(h_org[b]), f"lane {b} origin"
    # the window should be big enough that most lanes stay on device
    assert overflow.sum() <= len(bundles) // 4
