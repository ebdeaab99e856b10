"""Parity against the reference's own data and goldens.

Reference oracles reproduced here:

* the 354 bp fixture read and its per-filter max-matched counts 282/182
  (reference: src/test/libIBFTests/read.hpp:18,235-241) against filters
  built from the in-tree FASTAs
  (src/test/libIBFTests/data/test.fasta, data/test1.fasta) — the counts
  goldens VERDICT.md flagged as unreachable are in fact *exact k-mer
  containment* counts: at the reference sizing (max_fp=0.01, 1.24M bits
  per bin, <=1.3k inserted k-mers) the Bloom false-positive probability
  is ~1e-8 per (k-mer, bin), so both SeqAn's counts and rbt1's counts
  equal the exact containment counts with overwhelming probability.
  PARITY.md states the formal waiver.
* CI [5,30] / threshold -7 for the 35 bp read and the uint16 wrap
  semantics (production max_matches, src/IBF/IBFClassify.cpp:48-71:
  negative threshold wraps to 65529 => NO match; the reference's own
  unit test assumes signed semantics — parity follows production code,
  SURVEY.md §7 Hard Parts #2).
* classify-mode decisions on the reference's primary e2e data
  testData/testQueries.fasta (BASELINE.md), locked as a golden.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from readbouncer_tpu.classify.engine import ClassifyEngine, encode_batch
from readbouncer_tpu.classify.math import calculate_ci, ci_and_threshold_batch
from readbouncer_tpu.ibf.build import build_ibf, cut_out_nnns, fragment_bounds
from readbouncer_tpu.ibf.params import IBFParams
from readbouncer_tpu.ibf.query import FilterStack

REF = Path("/root/reference")
DATA = REF / "src/test/libIBFTests/data"
TESTQUERIES = REF / "testData/testQueries.fasta"

# the ReadTest fixture read (reference: src/test/libIBFTests/read.hpp:18)
READ_354 = (
    "AAAAAAAACCCCCCCCCGAGAGAGGAGAGAGGAGAGAGAGAGCCCCAAAAGAGAGGAGA"
    "AAAAAAAACCCCCCCCCGAGAGAGGAGAGAGGAGAGAGAGAGCCCCAAAAGAGAGGAGA"
    "AAAAAAAACCCCCCCCCGAGAGAGGAGAGAGGAGAGAGAGAGCCCCAAAAGAGAGGAGA"
    "AAAAAAAACCCCCCCCCGAGAGAGGAGAGAGGAGAGAGAGAGCCCCAAAAGAGAGGAGA"
    "AAAAAAAACCCCCCCCCGAGAGAGGAGAGAGGAGAGAGAGAGCCCCAAAAGAGAGGAGA"
    "AAAAAAAACCCCCCCCCGAGAGAGGAGAGAGGAGAGAGAGAGCCCCAAAAGAGAGGAGA"
)
# the select_matches fixture read (reference: src/test/libIBFTests/read.hpp:114)
READ_35 = "AAAAAAACCCCCCCCCGAGAGAGGAGAGAGGAGAG"

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def ref_filters():
    params = IBFParams(kmer_size=13, fragment_length=100_000)
    f0, _ = build_ibf([DATA / "test.fasta"], params, name="test")
    f1, _ = build_ibf([DATA / "test1.fasta"], params, name="test1")
    return f0, f1


def _max_matched(stack: FilterStack, seq: str, error_rate=0.1, significance=0.95):
    reads, lens = encode_batch([seq], len(seq))
    counts = stack.counts(reads, lens)
    thr = ci_and_threshold_batch(lens, stack.kmer_size, error_rate, significance)
    return np.asarray(stack.max_counts(counts, thr))[0]


def test_fixture_read_length():
    assert len(READ_354) == 354  # read.hpp:201
    assert len(READ_35) == 35  # read.hpp:160


def test_count_goldens_282_182(ref_filters):
    """Per-filter max matched counts on the 354 bp read == the reference's
    goldens (read.hpp:235-241): 282 for test.ibf, 182 for test1.ibf."""
    f0, f1 = ref_filters
    stack = FilterStack([f0, f1])
    mx = _max_matched(stack, READ_354)
    assert mx.tolist() == [282, 182]


def test_classify_354_best_index_0(ref_filters):
    """read->classify(filters, config) == 0 (read.hpp:243) and the
    dual-filter pair == (282, 182) (read.hpp:262-266)."""
    f0, f1 = ref_filters
    stack = FilterStack([f0, f1])
    mx = _max_matched(stack, READ_354)
    best = int(np.argmax(mx)) if mx.max() > 0 else -1
    assert best == 0
    # dual-filter overload: (max over filt1, max over filt2)
    s0, s1 = FilterStack([f0]), FilterStack([f1])
    assert int(_max_matched(s0, READ_354)[0]) == 282
    assert int(_max_matched(s1, READ_354)[0]) == 182


def test_short_read_ci_threshold_wrap(ref_filters):
    """CI [5,30], threshold -7 (read.hpp:148-169) and the PRODUCTION
    uint16-wrap: -7 wraps to 65529 so no bin can match
    (src/IBF/IBFClassify.cpp:48-71; SURVEY §7 Hard Parts #2)."""
    ci = calculate_ci(0.1, 13, 35, 0.95)
    assert ci == (5, 30)
    thr_eff = ci_and_threshold_batch(np.array([35]), 13, 0.1, 0.95)[0]
    assert int(thr_eff) == 65529  # (35 - 13 + 1 - 30) mod 2**16
    f0, f1 = ref_filters
    for f in (f0, f1):
        mx = _max_matched(FilterStack([f]), READ_35)
        assert int(mx[0]) == 0  # production semantics: NO match


def test_exact_containment_oracle_agrees(ref_filters):
    """rbt1 Bloom counts == exact k-mer containment counts on the
    reference data (the FP waiver in PARITY.md, made checkable)."""
    k = 13
    comp = str.maketrans("ACGT", "TGCA")

    def kmers(s):
        return [s[i : i + k] for i in range(len(s) - k + 1)]

    f0, f1 = ref_filters
    for fa, filt in ((DATA / "test.fasta", f0), (DATA / "test1.fasta", f1)):
        bins: list[set] = []
        sid, cur, seqs = None, [], []
        for line in fa.read_text().splitlines():
            if line.startswith(">"):
                if sid is not None:
                    seqs.append("".join(cur))
                sid, cur = line, []
            else:
                cur.append(line.strip())
        seqs.append("".join(cur))
        for seq in seqs:
            clean = cut_out_nnns(seq)
            for s, e in fragment_bounds(len(clean), 100_000, k):
                bins.append(set(kmers(clean[s:e])))
        stack = FilterStack([filt])
        reads, lens = encode_batch([READ_354], 354)
        counts = np.asarray(stack.counts(reads, lens))[0]  # [2, B]
        rc_read = READ_354.translate(comp)[::-1]
        for b, kset in enumerate(bins):
            exact_f = sum(1 for km in kmers(READ_354) if km in kset)
            exact_r = sum(1 for km in kmers(rc_read) if km in kset)
            assert counts[0, b] == exact_f
            assert counts[1, b] == exact_r


@pytest.mark.skipif(not TESTQUERIES.exists(), reason="testQueries.fasta absent")
def test_testqueries_decisions_golden(ref_filters, tmp_path):
    """classify-mode decisions on testData/testQueries.fasta (BASELINE.md's
    primary e2e oracle), against filters built from the reference's
    in-tree FASTAs.  The single 1890 bp query shares no 13-mer with
    either reference (verified here from first principles), so the
    locked golden decision is: processed, unclassified."""
    from readbouncer_tpu.classify.engine import classify_read_files

    f0, f1 = ref_filters
    res = classify_read_files(
        [TESTQUERIES],
        target_filters=[f0, f1],
        deplete_filters=[],
        error_rate=0.1,
        output_dir=tmp_path,
        verbose=False,
    )
    assert res.read_counter == 1
    assert res.too_short == 0
    assert res.found == 0  # golden: unclassified
    assert res.failed == 0
    uncl = (tmp_path / "unclassified.fasta").read_text()
    assert uncl.startswith(">1")

    # first principles: no shared 13-mer between query and references
    q = "".join(
        l.strip() for l in TESTQUERIES.read_text().splitlines() if not l.startswith(">")
    )
    refk = set()
    for fa in (DATA / "test.fasta", DATA / "test1.fasta"):
        seq = "".join(
            l.strip() for l in fa.read_text().splitlines() if not l.startswith(">")
        )
        refk |= {seq[i : i + 13] for i in range(len(seq) - 12)}
    assert not any(q[i : i + 13] in refk for i in range(len(q) - 12))
