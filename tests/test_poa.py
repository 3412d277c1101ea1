"""POA: spec sanity, native-engine parity, MAF assembly invariants."""

import numpy as np
import pytest

from sibeliaz_tpu.align import msa as msa_mod
from sibeliaz_tpu.align import poa_ref
from sibeliaz_tpu.core import alphabet


def s(x):
    return alphabet.str_to_seq(x)


def despell(row: bytes) -> str:
    return row.replace(b"-", b"").decode()


class TestPoaSpec:
    def test_identical_sequences_no_gaps(self):
        rows = poa_ref.poa_msa([s("ACGTACGT")] * 3)
        assert rows == [b"ACGTACGT"] * 3

    def test_rows_despell_to_inputs(self):
        seqs = [s("ACGTACGTAA"), s("ACGTACGAA"), s("ACCTACGTAA")]
        rows = poa_ref.poa_msa(seqs)
        assert len({len(r) for r in rows}) == 1
        for seq, row in zip(seqs, rows):
            assert despell(row) == alphabet.seq_to_str(seq)

    def test_single_substitution_aligns(self):
        rows = poa_ref.poa_msa([s("AAACAAA"), s("AAAGAAA")])
        assert rows[0] == b"AAACAAA"
        assert rows[1] == b"AAAGAAA"

    def test_deletion_gets_gap(self):
        rows = poa_ref.poa_msa([s("AAACCTTT"), s("AAATTT")])
        assert despell(rows[1]) == "AAATTT"
        assert len(rows[0]) == 8
        assert rows[1].count(b"-") == 2


class TestNativeParity:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_parity(self, seed):
        rng = np.random.default_rng(seed)
        base = alphabet.decode(rng.integers(0, 4, size=60).astype(np.uint8))
        seqs = []
        for _ in range(int(rng.integers(2, 6))):
            seq = base.copy()
            for p in np.flatnonzero(rng.random(len(seq)) < 0.1):
                seq[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
            # random indel
            if rng.random() < 0.5:
                cut = int(rng.integers(0, len(seq) - 5))
                seq = np.delete(seq, slice(cut, cut + int(rng.integers(1, 4))))
            seqs.append(seq)
        expect = poa_ref.poa_msa(seqs)
        got = msa_mod.poa_msa_batch([seqs])[0]
        assert got == expect

    def test_batch_multiple_blocks(self):
        blocks = [
            [s("ACGTACGT"), s("ACGAACGT")],
            [s("TTTTCCCC"), s("TTTCCCC"), s("TTTTCCCC")],
        ]
        got = msa_mod.poa_msa_batch(blocks, threads=2)
        for seqs, rows in zip(blocks, got):
            for seq, row in zip(seqs, rows):
                assert despell(row) == alphabet.seq_to_str(seq)

    def test_budget_overflow_reported(self):
        seqs = [s("ACGT" * 50), s("ACGT" * 50)]
        got = msa_mod.poa_msa_batch([seqs], budget_bytes=100)
        assert got[0] is None


class TestMafAssembly:
    def test_end_to_end_maf(self, tmp_path):
        import sys

        sys.path.insert(0, "tests")
        from reference_oracle import random_related_genomes

        from sibeliaz_tpu.config import Config
        from sibeliaz_tpu import pipeline

        seqs, names = random_related_genomes(30, length=3000, mut=0.02,
                                             rearrange=True)
        cfg = Config(k=15)
        res = pipeline.find_blocks(seqs, names, cfg, engine="native")
        maf = tmp_path / "alignment.maf"
        msa_mod.align_blocks_to_maf(
            res.blocks, seqs, names, str(maf), cmd="test", threads=2
        )
        text = maf.read_text()
        lines = text.splitlines()
        assert lines[0] == "##maf version=1"
        assert lines[2].startswith("# cmd=")
        # validate every s line maps back to the input sequence
        n_blocks_seen = 0
        for line in lines:
            if line.startswith("a"):
                n_blocks_seen += 1
            if not line.startswith("s "):
                continue
            _, name, start, ln, strand, chr_size, row = line.split(" ", 6)
            start, ln, chr_size = int(start), int(ln), int(chr_size)
            c = names.index(name)
            assert chr_size == len(seqs[c])
            ungapped = row.replace("-", "")
            assert len(ungapped) == ln
            if strand == "+":
                expect = alphabet.seq_to_str(seqs[c][start : start + ln])
            else:
                frag = seqs[c][chr_size - start - ln : chr_size - start]
                expect = alphabet.seq_to_str(alphabet.reverse_complement(frag))
            assert ungapped == expect
        assert n_blocks_seen == res.blocks_found


class TestCheckpointedTraceback:
    def test_checkpoint_mode_equals_spec(self):
        # budget too small for a full direction matrix but enough for
        # checkpointed traceback -> same MSA as the spec
        rng = np.random.default_rng(5)
        base = alphabet.decode(rng.integers(0, 4, size=300).astype(np.uint8))
        seqs = [base]
        for _ in range(3):
            seq = base.copy()
            for p in np.flatnonzero(rng.random(len(seq)) < 0.05):
                seq[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
            cut = int(rng.integers(0, len(seq) - 5))
            seq = np.delete(seq, slice(cut, cut + 3))
            seqs.append(seq)
        expect = poa_ref.poa_msa(seqs)
        got_full = msa_mod.poa_msa_batch([seqs])[0]
        got_ckpt = msa_mod.poa_msa_batch([seqs], budget_bytes=60_000)[0]
        assert got_full == expect
        assert got_ckpt == expect

    def test_tiny_budget_still_overflows(self):
        seqs = [s("ACGT" * 50), s("ACGT" * 50)]
        got = msa_mod.poa_msa_batch([seqs], budget_bytes=100)
        assert got[0] is None


class TestExactBanding:
    """The banded DP (poa.cpp '---- exact banding ----') must be
    byte-identical to the full DP: the score-certificate band provably
    contains every co-optimal traceback cell, so tracebacks — not just
    scores — match.  These tests compare banded (default) against
    SZ_POA_BAND=0 across divergences that exercise pass-1 acceptance,
    the pass-2 re-band, and the full-DP fallback."""

    @staticmethod
    def _blocks(rng, n, copies, div):
        base = alphabet.decode(rng.integers(0, 4, size=n).astype(np.uint8))
        seqs = [base]
        for _ in range(copies - 1):
            seq = base.copy()
            for p in np.flatnonzero(rng.random(n) < div):
                seq[p] = alphabet.decode(np.uint8(rng.integers(0, 4)))
            for _ in range(int(n * div / 40) + 1):
                cut = int(rng.integers(0, len(seq) - 10))
                seq = np.delete(
                    seq, slice(cut, cut + int(rng.integers(1, 6)))
                )
            seqs.append(seq)
        return seqs

    @pytest.mark.parametrize("div", [0.002, 0.01, 0.05, 0.15])
    def test_banded_equals_full(self, monkeypatch, div):
        rng = np.random.default_rng(int(div * 1000))
        blocks = [self._blocks(rng, 900, 3, div) for _ in range(3)]
        monkeypatch.setenv("SZ_POA_BAND", "0")
        full = msa_mod.poa_msa_batch(blocks)
        monkeypatch.setenv("SZ_POA_BAND", "1")
        monkeypatch.setenv("SZ_POA_BAND_MIN", "64")
        banded = msa_mod.poa_msa_batch(blocks)
        assert banded == full

    def test_unrelated_sequences_full_fallback(self, monkeypatch):
        # completely unrelated copies: pass 1 finds a poor S, pass 2's
        # allowed(S) band is ~full width — output must still match
        rng = np.random.default_rng(7)
        blocks = [
            [
                alphabet.decode(
                    rng.integers(0, 4, size=400).astype(np.uint8)
                )
                for _ in range(2)
            ]
        ]
        monkeypatch.setenv("SZ_POA_BAND", "0")
        full = msa_mod.poa_msa_batch(blocks)
        monkeypatch.setenv("SZ_POA_BAND", "1")
        monkeypatch.setenv("SZ_POA_BAND_MIN", "64")
        banded = msa_mod.poa_msa_batch(blocks)
        assert banded == full

    def test_banded_checkpoint_traceback(self, monkeypatch):
        # budget small enough to force checkpointed traceback *within* the
        # banded pass: segment refills must respect the per-row bands
        rng = np.random.default_rng(11)
        blocks = [self._blocks(rng, 1200, 3, 0.02)]
        monkeypatch.setenv("SZ_POA_BAND", "0")
        full = msa_mod.poa_msa_batch(blocks)
        monkeypatch.setenv("SZ_POA_BAND", "1")
        monkeypatch.setenv("SZ_POA_BAND_MIN", "64")
        banded_ckpt = msa_mod.poa_msa_batch(blocks, budget_bytes=120_000)
        assert banded_ckpt == full

    @pytest.mark.parametrize("seed", range(15))
    def test_fuzz_banded_vs_full(self, monkeypatch, seed):
        # randomized divergences, indels, copies, and budgets (including
        # budgets that force checkpointed traceback).  Two legal outcomes
        # per block: byte-identical MSAs, or banding fitting a block whose
        # full DP overflows the budget (banded must then still despell to
        # the inputs).  Any other difference is a banding bug.
        rng = np.random.default_rng(3000 + seed)
        n = int(rng.integers(80, 2000))
        copies = int(rng.integers(2, 7))
        div = float(rng.choice([0.001, 0.01, 0.04, 0.12, 0.5]))
        budget = int(rng.choice([2 << 30, 200_000, 60_000]))
        seqs = [
            np.asarray(x)
            for x in self._blocks(rng, n, copies, div)
        ]
        monkeypatch.setenv("SZ_POA_BAND_MIN", "64")
        monkeypatch.setenv("SZ_POA_BAND", "0")
        full = msa_mod.poa_msa_batch([seqs], budget_bytes=budget)[0]
        monkeypatch.setenv("SZ_POA_BAND", "1")
        banded = msa_mod.poa_msa_batch([seqs], budget_bytes=budget)[0]
        if full is None:
            if banded is not None:  # banding fit what full DP couldn't
                for seq, row in zip(seqs, banded):
                    assert row.replace(b"-", b"") == bytes(seq)
        else:
            assert banded == full

    def test_banded_vs_spec(self, monkeypatch):
        # direct spec differential with banding forced on small inputs
        rng = np.random.default_rng(13)
        seqs = self._blocks(rng, 150, 4, 0.04)
        expect = poa_ref.poa_msa(seqs)
        monkeypatch.setenv("SZ_POA_BAND_MIN", "1")
        got = msa_mod.poa_msa_batch([seqs])[0]
        assert got == expect


class TestTieCensus:
    """spoa-divergence risk machinery: the tie census and the alt-tie
    traceback (benchmarks/poa_tie_census.py is the characterization run;
    committed result: benchmarks/results/poa_tie_census.json)."""

    def test_identical_rows_are_tie_free_censuswise_stable(self):
        from sibeliaz_tpu.align.poa_ref import (
            poa_msa,
            poa_msa_alt_ties,
            poa_msa_with_census,
        )

        rows = [b"ACGTACGTAGGCTA"] * 3
        msa, ties = poa_msa_with_census(rows)
        assert msa == poa_msa(rows)
        assert msa == [b"ACGTACGTAGGCTA"] * 3
        # identical rows: every decision is a strict match maximum
        assert ties == 0
        assert poa_msa_alt_ties(rows) == msa

    def test_zero_ties_implies_tie_order_independence(self):
        """Whenever the census reports 0 ties, the alt-tie traceback must
        produce byte-identical MSA rows (the core of the risk argument)."""
        import numpy as np

        from sibeliaz_tpu.align.poa_ref import (
            poa_msa_alt_ties,
            poa_msa_with_census,
        )

        rng = np.random.default_rng(3)
        n_zero = 0
        for _ in range(30):
            src = rng.integers(0, 4, size=60).astype(np.uint8) + ord("A")
            rows = []
            for _ in range(3):
                r = src.copy()
                for p in np.flatnonzero(rng.random(len(r)) < 0.05):
                    r[p] = ord("A") + (r[p] - ord("A") + 1) % 4
                rows.append(bytes(r))
            msa, ties = poa_msa_with_census(rows)
            if ties == 0:
                n_zero += 1
                assert poa_msa_alt_ties(rows) == msa
        assert n_zero > 0, "generator never produced a tie-free case"

    def test_census_counts_engineered_tie(self):
        from sibeliaz_tpu.align.poa_ref import poa_msa_with_census

        # Aligning "A" against the graph A->A: match-first-then-delete and
        # delete-first-then-match both score 5 - 8 — a genuine tie.
        _, ties = poa_msa_with_census([b"AA", b"A"])
        assert ties >= 1
