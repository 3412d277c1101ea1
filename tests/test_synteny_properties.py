"""Property tests pinning the maf2synteny-equivalent's behavior.

The reference pins maf2synteny as a submodule that is not mounted
(reference CMakeLists.txt:14-15), so byte-parity is untestable here; these
properties pin the re-implementation's semantics instead (VERDICT round-2
item 7): fixpoint idempotence, schedule-prefix equivalence, structural
invariants of the output, and input-order/determinism guarantees.

Note two tempting properties deliberately NOT asserted because they do not
hold (and are not claimed by the published algorithm either): strict
coverage monotonicity across stage prefixes (a coarser stage's noise filter
can drop sub-scale blocks whose intervals were previously counted), and
exact strand symmetry (keeper tie-breaks in bulge removal are
lexicographic over signed ids, which is not mirror-invariant).
"""

import numpy as np
import pytest

from sibeliaz_tpu.postprocess.synteny import (
    FINE_STAGES,
    LOOSE_STAGES,
    Occ,
    build_synteny,
    parse_stages,
)


def gen(seed, n_chr=3, n_units=40):
    """Synthesize LCB occurrences: shared unit blocks with length jitter,
    occasional dropped occurrences, interleaved noise blocks, and one
    inverted range on the last genome."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(40, 4000, size=n_units)
    occs = []
    sizes = []
    unit_ids = list(range(1, n_units + 1))
    for c in range(n_chr):
        pos = 0
        order = list(unit_ids)
        if c == n_chr - 1:
            lo, hi = 10, 25
            order[lo:hi] = [-x for x in reversed(order[lo:hi])]
        for u in order:
            if rng.random() < 0.1:
                pos += int(rng.integers(0, 30))
                continue
            L = int(lens[abs(u) - 1] + rng.integers(-5, 6))
            occs.append(Occ(block=u, chr=c, start=pos, end=pos + L))
            pos += L + int(rng.integers(0, 12))
            if rng.random() < 0.15:
                nid = 1000 + int(rng.integers(0, 15))
                Ln = int(rng.integers(30, 120))
                occs.append(Occ(block=nid, chr=c, start=pos, end=pos + Ln))
                pos += Ln + int(rng.integers(0, 12))
        sizes.append(pos + 100)
    return occs, sizes


def normalized(blocks):
    """Coordinates + orientation with ids renumbered by first appearance,
    so two outputs compare independent of absolute id values."""
    ren = {}
    out = []
    for o in sorted(blocks, key=lambda o: (o.chr, o.start)):
        a = abs(o.block)
        if a not in ren:
            ren[a] = len(ren) + 1
        out.append(
            (o.chr, o.start, o.end, (1 if o.block > 0 else -1) * ren[a])
        )
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fixpoint_idempotence(seed):
    """Feeding build_synteny its own output must be a no-op: the stage
    loop already ran compression + bulge removal to a fixpoint."""
    occs, sizes = gen(seed)
    out1 = build_synteny(occs, len(sizes), 1000)
    out2 = build_synteny(out1, len(sizes), 1000)
    assert normalized(out1) == normalized(out2)


@pytest.mark.parametrize("seed", [0, 3])
def test_fine_is_a_prefix_of_loose(seed):
    """The loose schedule extends fine with (10000,50000) (50000,500000)
    stages that only activate above the requested scale, so for
    min_block <= 5000 both schedules are identical."""
    occs, sizes = gen(seed)
    a = build_synteny(occs, len(sizes), 1000, stages=FINE_STAGES)
    b = build_synteny(occs, len(sizes), 1000, stages=LOOSE_STAGES)
    assert normalized(a) == normalized(b)


@pytest.mark.parametrize("seed", [0, 1, 4])
def test_output_invariants(seed):
    """Every output block: >= 2 occurrences, dense 1..K ids, length >=
    min_block, and non-overlapping occurrences per chromosome (input LCBs
    are non-overlapping; merging only absorbs the gaps between them)."""
    occs, sizes = gen(seed)
    min_block = 1000
    out = build_synteny(occs, len(sizes), min_block)
    assert out, "generator produced a degenerate case"
    from collections import Counter

    mult = Counter(abs(o.block) for o in out)
    assert all(v >= 2 for v in mult.values())
    assert sorted(mult) == list(range(1, len(mult) + 1))
    assert all(o.end - o.start >= min_block for o in out)
    for c in range(len(sizes)):
        row = sorted((o for o in out if o.chr == c), key=lambda o: o.start)
        for a, b in zip(row, row[1:]):
            assert b.start >= a.end, f"overlap on chr {c}"


@pytest.mark.parametrize("seed", [1, 2])
def test_input_order_invariance(seed):
    """The occurrence list's order must not matter (permutations are
    rebuilt by start coordinate)."""
    occs, sizes = gen(seed)
    rng = np.random.default_rng(99)
    shuffled = [occs[i] for i in rng.permutation(len(occs))]
    a = build_synteny(occs, len(sizes), 1000)
    b = build_synteny(shuffled, len(sizes), 1000)
    assert normalized(a) == normalized(b)


def test_identical_genomes_get_identical_permutations():
    """Two byte-identical genomes must produce the same synteny
    permutation on both chromosomes — the 'permutation consistency'
    guarantee that survives bulge removal."""
    occs, sizes = gen(7, n_chr=1)
    twin = [
        Occ(block=o.block, chr=1, start=o.start, end=o.end) for o in occs
    ]
    out = build_synteny(list(occs) + twin, 2, 1000)
    rows = [
        [
            (o.block, o.start, o.end)
            for o in sorted(
                (o for o in out if o.chr == c), key=lambda o: o.start
            )
        ]
        for c in (0, 1)
    ]
    assert rows[0] == rows[1]
    assert rows[0], "degenerate case"


def test_noise_blocks_are_absorbed():
    """Sub-scale noise blocks sitting between two large collinear blocks
    must not break the merge: the pair compresses across them and the
    noise interval is absorbed into the merged span."""
    occs = []
    for c in range(2):
        occs.append(Occ(block=1, chr=c, start=0, end=4000))
        # 50 bp noise block, below every stage scale that matters
        occs.append(Occ(block=900 + c, chr=c, start=4005, end=4055))
        occs.append(Occ(block=2, chr=c, start=4060, end=9000))
    out = build_synteny(occs, 2, 5000)
    assert len(out) == 2
    for o in out:
        assert (o.start, o.end) == (0, 9000)
    assert abs(out[0].block) == abs(out[1].block)


def test_bulge_collapses_minority_detour():
    """A minority detour branch (u -> x -> v in one genome, u -> v in two)
    is a bulge: x's occurrence is deleted and all three genomes compress
    to one block spanning [0, end)."""
    occs = []
    for c in range(3):
        occs.append(Occ(block=1, chr=c, start=0, end=3000))
        pos = 3004
        if c == 0:
            occs.append(Occ(block=5, chr=c, start=pos, end=pos + 40))
            pos += 44
        occs.append(Occ(block=2, chr=c, start=pos, end=pos + 3000))
    out = build_synteny(occs, 3, 2000)
    assert len(out) == 3
    ids = {abs(o.block) for o in out}
    assert len(ids) == 1
    for o in out:
        assert o.end - o.start >= 6000


def test_parse_stages_file_and_errors(tmp_path):
    p = tmp_path / "stages.txt"
    p.write_text("# custom schedule\n30 10\n\n500 1000  # inline\n")
    assert parse_stages(str(p)) == [(30, 10), (500, 1000)]
    assert parse_stages("fine") == FINE_STAGES
    assert parse_stages("loose") == LOOSE_STAGES
    bad = tmp_path / "bad.txt"
    bad.write_text("30\n")
    with pytest.raises(ValueError):
        parse_stages(str(bad))
    empty = tmp_path / "empty.txt"
    empty.write_text("# nothing\n")
    with pytest.raises(ValueError):
        parse_stages(str(empty))
