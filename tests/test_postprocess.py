"""Post-processing tools: GFA round-trip, XMFA layout, synteny merge."""

import io
import sys

import numpy as np

sys.path.insert(0, "tests")

from sibeliaz_tpu.align import msa as msa_mod
from sibeliaz_tpu.config import Config
from sibeliaz_tpu.core import alphabet
from sibeliaz_tpu import pipeline
from sibeliaz_tpu.postprocess import gfa, synteny, xmfa

from reference_oracle import random_related_genomes


def run_pipeline_with_maf(tmp_path, seed=40, **kwargs):
    seqs, names = random_related_genomes(seed, length=2500, mut=0.02, **kwargs)
    cfg = Config(k=15)
    res = pipeline.find_blocks(seqs, names, cfg, engine="native")
    maf = tmp_path / "alignment.maf"
    msa_mod.align_blocks_to_maf(res.blocks, seqs, names, str(maf), cmd="t")
    gff = tmp_path / "blocks_coords.gff"
    gff.write_text(res.gff)
    return seqs, names, res, str(maf), str(gff)


def test_gfa_roundtrip(tmp_path):
    seqs, names, res, maf, _ = run_pipeline_with_maf(tmp_path, rearrange=True)
    out = io.StringIO()
    gfa.maf_to_gfa(maf, {n: s for n, s in zip(names, seqs)}, out)
    gfa_path = tmp_path / "g.gfa"
    gfa_path.write_text(out.getvalue())
    glued = gfa.glue(str(gfa_path))
    for n, s in zip(names, seqs):
        assert glued[n] == alphabet.seq_to_str(s), f"round-trip failed for {n}"


def test_xmfa_layout(tmp_path):
    _, _, _, maf, _ = run_pipeline_with_maf(tmp_path, seed=41)
    out = io.StringIO()
    xmfa.maf_to_xmfa(maf, out)
    text = out.getvalue()
    assert text.startswith("#FormatVersion Mauve1\n")
    assert "=\n" in text
    # every alignment entry header is parseable
    for line in text.splitlines():
        if line.startswith(">"):
            body = line[2:]
            coords, strand, name = body.split(" ", 2)
            sid, rng = coords.split(":")
            lo, hi = rng.split("-")
            assert int(sid) >= 1 and int(lo) >= 1 and int(hi) >= int(lo)
            assert strand in "+-"


def test_synteny_merges_blocks(tmp_path):
    seqs, names, res, _, gff = run_pipeline_with_maf(tmp_path, seed=42)
    synteny.run(gff, str(tmp_path / "syn"), block_sizes=[100])
    out = (tmp_path / "syn" / "100" / "blocks_coords.txt").read_text()
    assert out.startswith("Seq_id\tSize\tDescription\n")
    assert "Block #1" in out
    perms = (tmp_path / "syn" / "100" / "genomes_permutations.txt").read_text()
    assert perms.count(">") == len(names)
    # merged representation must not have more blocks than the input LCBs
    n_syn = out.count("Block #")
    assert 1 <= n_syn <= res.blocks_found


def test_synteny_bulge_skip_and_inversion_boundary():
    """Stage pruning must let chains merge across a small inserted block
    (an A-Bruijn bulge) while a true rearrangement boundary still splits
    blocks (postprocess/synteny.py; maf2synteny role, README.md:96-112)."""
    from sibeliaz_tpu.postprocess.synteny import Occ, build_synteny

    # genome 0: A(2k) B(40bp) C(2k) | D(2k)
    # genome 1: A(2k)         C(2k) | -D(2k) (inverted)
    # genome 2: A(2k) B'(35bp) C(2k)
    occs = [
        Occ(1, 0, 0, 2000), Occ(4, 0, 2010, 2050), Occ(2, 0, 2060, 4060),
        Occ(3, 0, 4100, 6100),
        Occ(1, 1, 0, 2000), Occ(2, 1, 2030, 4030),
        Occ(-3, 1, 4100, 6100),
        Occ(1, 2, 0, 2000), Occ(5, 2, 2010, 2045), Occ(2, 2, 2055, 4055),
    ]
    out = build_synteny(occs, 3, min_block=1000)
    # A and C merge into ONE synteny block across the bulge in all genomes;
    # D stays separate (strand flip = rearrangement boundary).
    by_chr = {}
    for o in out:
        by_chr.setdefault(o.chr, []).append(o)
    merged_ids = {abs(o.block) for o in out if o.start == 0}
    assert len(merged_ids) == 1
    mid = merged_ids.pop()
    spans = sorted(
        (o.chr, o.start, o.end) for o in out if abs(o.block) == mid
    )
    assert spans == [(0, 0, 4060), (1, 0, 4030), (2, 0, 4055)]
    d_ids = {abs(o.block) for o in out if o.end == 6100}
    assert len(d_ids) == 1 and d_ids.pop() != mid


def test_synteny_parse_stages(tmp_path):
    assert synteny.parse_stages("loose") == synteny.LOOSE_STAGES
    assert synteny.parse_stages("fine") == synteny.FINE_STAGES
    assert synteny.DEFAULT_STAGES == synteny.FINE_STAGES
    assert synteny.LOOSE_STAGES[: len(synteny.FINE_STAGES)] == synteny.FINE_STAGES
    f = tmp_path / "params.txt"
    f.write_text("# custom schedule\n30 10\n\n200 500  # wide\n")
    assert synteny.parse_stages(str(f)) == [(30, 10), (200, 500)]


def test_synteny_cli_simpl_flag(tmp_path):
    from sibeliaz_tpu.tools import main as tools_main

    gff = tmp_path / "in.gff"
    gff.write_text(
        "##gff-version 3.1.26\n"
        "##sequence-region g1 1 3000\n"
        "##sequence-region g2 1 3000\n"
        "g1\tSibeliaZ\tSO:0000856\t1\t1000\t.\t+\t.\tID=1\n"
        "g2\tSibeliaZ\tSO:0000856\t1\t1000\t.\t+\t.\tID=1\n"
        "g1\tSibeliaZ\tSO:0000856\t1011\t2000\t.\t+\t.\tID=2\n"
        "g2\tSibeliaZ\tSO:0000856\t1011\t2000\t.\t+\t.\tID=2\n"
    )
    out = tmp_path / "syn"
    assert tools_main(
        ["synteny", str(gff), "-o", str(out), "-b", "100", "-s", "fine"]
    ) == 0
    assert (out / "100" / "blocks_coords.txt").exists()


def test_synteny_terminal_occurrence_blocks_chain():
    """A block with an occurrence at a permutation end must not chain with
    its neighbor elsewhere — adjacency must hold in EVERY occurrence."""
    occs = [
        synteny.Occ(block=1, chr=0, start=0, end=6000),
        synteny.Occ(block=2, chr=0, start=6000, end=12000),
        synteny.Occ(block=1, chr=1, start=0, end=6000),
    ]
    out = synteny.build_synteny(occs, 2, min_block=100)
    ids = sorted(abs(o.block) for o in out)
    # block 1 survives with 2 occurrences; block 2 (single copy) is dropped
    assert len(out) == 2 and ids == [1, 1]


def test_synteny_true_bulge_removal():
    """A bulge that noise-pruning alone cannot collapse: the detour block
    is LARGE (>= every stage's min_block it meets) but short enough to fit
    a stage's max_gap; only real bulge removal merges the anchors.
    g0: A(5k) X(800) B(5k);  g1: A(5k) B(5k) direct;  g2 like g1."""
    from sibeliaz_tpu.postprocess.synteny import Occ, build_synteny

    occs = [
        Occ(1, 0, 0, 5000), Occ(9, 0, 5100, 5900), Occ(2, 0, 6000, 11000),
        Occ(1, 1, 0, 5000), Occ(2, 1, 5030, 10030),
        Occ(1, 2, 0, 5000), Occ(2, 2, 5040, 10040),
    ]
    out = build_synteny(occs, 3, min_block=2000)
    # anchors merge in ALL THREE genomes (the g0 detour is deleted as the
    # minority bulge branch and its interval absorbed by the merged span)
    ids = {abs(o.block) for o in out}
    assert len(ids) == 1
    spans = sorted((o.chr, o.start, o.end) for o in out)
    assert spans == [(0, 0, 11000), (1, 0, 10030), (2, 0, 10040)]


def test_synteny_bulge_respects_gap_bound():
    """A detour longer than every applicable max_gap must NOT be removed:
    the permutations stay split at the rearrangement."""
    from sibeliaz_tpu.postprocess.synteny import Occ, build_synteny

    occs = [
        Occ(1, 0, 0, 5000), Occ(9, 0, 5100, 45000), Occ(2, 0, 45100, 50100),
        Occ(1, 1, 0, 5000), Occ(2, 1, 5030, 10030),
    ]
    out = build_synteny(occs, 2, min_block=2000)
    ids = sorted(abs(o.block) for o in out)
    # A and B never merge; both survive with 2 occurrences each (9 is
    # single-copy and dropped)
    assert len(set(ids)) == 2 and len(ids) == 4


class TestSyntenyProperties:
    """Invariants of the simplification (maf2synteny parity properties)."""

    def _random_case(self, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        from sibeliaz_tpu.postprocess.synteny import Occ

        # a shared backbone of blocks with per-genome indels/inversions
        n_blocks = 12
        occs = []
        for c in range(3):
            pos = 0
            bid = 1
            while bid <= n_blocks:
                ln = int(rng.integers(200, 3000))
                gap = int(rng.integers(0, 120))
                strand = -1 if rng.random() < 0.15 else 1
                if rng.random() < 0.8:  # genome carries this block
                    occs.append(Occ(strand * bid, c, pos, pos + ln))
                    pos += ln + gap
                bid += 1
        return occs

    def test_multiplicity_and_disjointness(self):
        from sibeliaz_tpu.postprocess.synteny import build_synteny

        for seed in (1, 2, 3, 4):
            occs = self._random_case(seed)
            out = build_synteny(occs, 3, min_block=500)
            mult = {}
            for o in out:
                mult[abs(o.block)] = mult.get(abs(o.block), 0) + 1
            assert all(m >= 2 for m in mult.values())
            by_chr = {}
            for o in out:
                by_chr.setdefault(o.chr, []).append((o.start, o.end))
            for rows in by_chr.values():
                rows.sort()
                for (s1, e1), (s2, e2) in zip(rows, rows[1:]):
                    assert e1 <= s2, "synteny blocks overlap on a chromosome"

    def test_coverage_monotone_in_scale(self):
        """Coarser output scales never cover MORE sequence than finer ones
        (blocks only get filtered / absorbed as min_block grows)."""
        from sibeliaz_tpu.postprocess.synteny import build_synteny

        occs = self._random_case(7)
        covs = []
        for mbs in (200, 1000, 4000):
            out = build_synteny(occs, 3, min_block=mbs)
            covs.append(sum(o.length for o in out))
        assert covs[0] >= covs[1] >= covs[2] - 1  # absorption may add bp
        assert covs[0] > 0

    def test_determinism(self):
        from sibeliaz_tpu.postprocess.synteny import build_synteny

        occs1 = self._random_case(11)
        occs2 = self._random_case(11)
        a = build_synteny(occs1, 3, min_block=500)
        b = build_synteny(occs2, 3, min_block=500)
        assert [(o.block, o.chr, o.start, o.end) for o in a] == [
            (o.block, o.chr, o.start, o.end) for o in b
        ]
