"""Build semantics: N-splitting quirk, fragment bounds, stats, save/load."""

import numpy as np
import pytest

from readbouncer_tpu.ibf.build import (
    build_ibf,
    cut_out_nnns,
    fragment_bounds,
    update_ibf,
)
from readbouncer_tpu.ibf.params import IBFParams
from readbouncer_tpu.ibf.storage import IBFData, sniff


def test_cut_out_nnns_drops_last_char_of_final_segment():
    # reference quirk: the trailing segment loses its final character
    # (src/IBF/IBFBuild.cpp:121-124: substr(start, seqlen - start - 1))
    assert cut_out_nnns("ACGT") == "ACG"
    assert cut_out_nnns("ACGTNNNTTTT") == "ACGT" + "TTT"
    assert cut_out_nnns("NNNACGT") == "ACG"
    assert cut_out_nnns("ACGTNNN") == "ACGT"  # N-run at end: no final segment
    assert cut_out_nnns("NNNN") == ""
    assert cut_out_nnns("") == ""


def test_cut_out_nnns_multiple_runs():
    assert cut_out_nnns("AANCCNNGGNTT") == "AA" + "CC" + "GG" + "T"


def test_fragment_bounds_single():
    # short sequence: one fragment [0, len)
    assert fragment_bounds(100, 100_000, 13) == [(0, 100)]


def test_fragment_bounds_overlap_k_minus_1():
    # fragment i >= 1 starts at i*F - (k-1): effective overlap is k-1=12,
    # NOT the documented 1500 (reference: src/IBF/IBFBuild.cpp:202)
    b = fragment_bounds(250, 100, 13)
    assert b == [(0, 100), (88, 200), (188, 250)]


def test_fragment_bounds_loop_guard():
    # loop runs while fragstart < len-1 (reference: src/IBF/IBFBuild.cpp:171)
    assert fragment_bounds(99_989, 100_000, 13) == [(0, 99_989)]
    b = fragment_bounds(99_990, 100_000, 13)
    assert b == [(0, 99_990), (99_988, 99_990)]


def _fasta(tmp_path, name, records):
    p = tmp_path / name
    with open(p, "w") as f:
        for rid, seq in records:
            f.write(f">{rid}\n{seq}\n")
    return p


def test_build_stats_and_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    seq1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    seq2 = "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
    ref = _fasta(tmp_path, "ref.fasta", [("s1 extra words", seq1), ("s2", seq2)])
    params = IBFParams(kmer_size=13, fragment_length=100)
    ibf, stats = build_ibf([ref], params, name="ref")
    # cleaned lengths are 299 and 149 (final-char drop)
    assert stats.sum_seq_len == 299 + 149
    assert stats.total_seqs_file == 2
    # declared bins: 299//100+1 + 149//100+1 = 3 + 2
    assert stats.total_bins_declared == 5
    assert ibf.num_bins == 5
    assert ibf.padded_bins == 64
    assert ibf.bin_seqids[:3] == ["s1", "s1", "s1"]
    assert stats.total_bins_inserted == len(ibf.bin_seqids)

    out = tmp_path / "ref.ribf"
    ibf.save(out)
    assert sniff(out)
    assert not sniff(ref)
    loaded = IBFData.load(out)
    assert loaded.kmer_size == 13
    assert loaded.num_bins == 5
    assert (loaded.bits == ibf.bits).all()
    assert loaded.bin_seqids == ibf.bin_seqids


def test_build_skips_too_short_seqs(tmp_path):
    ref = _fasta(tmp_path, "r.fasta", [("tiny", "ACGTACGT"), ("ok", "A" * 100)])
    ibf, stats = build_ibf([ref], IBFParams(kmer_size=13, fragment_length=100))
    assert stats.invalid_seqs == 1
    assert stats.total_seqs_file == 2


def test_update_appends_bins(tmp_path):
    rng = np.random.default_rng(1)
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    ref1 = _fasta(tmp_path, "a.fasta", [("a", mk(120))])
    ref2 = _fasta(tmp_path, "b.fasta", [("b", mk(250))])
    params = IBFParams(kmer_size=13, fragment_length=100)
    ibf, s1 = build_ibf([ref1], params)
    n_old = ibf.num_bins
    ibf, s2 = update_ibf(ibf, [ref2], params)
    assert ibf.num_bins == n_old + 3  # 249//100+1
    assert s2.new_bins == 3
    assert len(ibf.bin_seqids) == s1.total_bins_inserted + s2.total_bins_inserted


def test_native_insert_matches_numpy(tmp_path):
    """The C++ insert_fragments kernel and the numpy scatter-OR oracle
    must produce bit-identical filters (multi-seq, N-runs, edge windows)."""
    pytest.importorskip("readbouncer_tpu._native")
    from readbouncer_tpu.ibf.build import BuildStats, _insert_all, _parse_refs

    rng = np.random.default_rng(7)
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    seqs = [
        ("a", mk(950) + "NNNN" + mk(431)),
        ("b", mk(87)),  # single short fragment
        ("c", mk(2500)),  # multiple fragments + k-1 overlap
    ]
    ref = _fasta(tmp_path, "r.fasta", seqs)
    params = IBFParams(kmer_size=13, fragment_length=500)
    stats = BuildStats()
    parsed = _parse_refs([ref], params, stats)
    mk_ibf = lambda: IBFData.empty(
        rows=params.rows,
        num_bins=stats.total_bins_declared,
        kmer_size=params.kmer_size,
        hash_functions=params.hash_functions,
        fragment_length=params.fragment_length,
    )
    nat, pyv = mk_ibf(), mk_ibf()
    _insert_all(nat, parsed, params, BuildStats(), 0, use_native=True)
    _insert_all(pyv, parsed, params, BuildStats(), 0, use_native=False)
    assert np.array_equal(nat.bits, pyv.bits)
    assert nat.bits.any()
