"""Filter sizing goldens (reference: src/test/libIBFTests/createfilter.hpp:139-152)."""

import pytest

from readbouncer_tpu.ibf.params import (
    IBFParams,
    bin_size_bits,
    filter_size_bits,
    optimal_bins,
)


def test_golden_filter_size_bits():
    # 2 bins, k=13, fragLen=100000, h=3, fp=0.01 -> 79_121_216 total bits
    assert filter_size_bits(2, 100_000, 13, 3, 0.01) == 79_121_216


def test_golden_bin_size_bits():
    assert bin_size_bits(100_000, 13, 3, 0.01) * 64 == 79_121_216


def test_optimal_bins_floor_plus_one():
    # the reference pads exact multiples of 64 up by another 64
    assert optimal_bins(2) == 64
    assert optimal_bins(63) == 64
    assert optimal_bins(64) == 128
    assert optimal_bins(65) == 128
    assert optimal_bins(128) == 192


def test_params_validate():
    IBFParams().validate()
    with pytest.raises(ValueError):
        IBFParams(kmer_size=16).validate()
    with pytest.raises(ValueError):
        IBFParams(kmer_size=13, fragment_length=10).validate()
    with pytest.raises(ValueError):
        IBFParams(max_fp=0.0).validate()


def test_rows_property():
    p = IBFParams(kmer_size=13, fragment_length=100_000, hash_scheme="rbt1")
    assert p.rows == 79_121_216 // 64
    assert p.total_bits(2) == 79_121_216


def test_blocked_sizing():
    """rbt2 sizing: minimal multiple of 8 meeting max_fp, always >= rbt1."""
    from readbouncer_tpu.ibf.params import blocked_fp, blocked_rows_for_fp

    n = 100_000 - 13 + 1
    rows = blocked_rows_for_fp(n, 3, 0.01)
    assert rows % 8 == 0
    assert blocked_fp(rows, n, 3) <= 0.01
    assert blocked_fp(rows - 8, n, 3) > 0.01  # minimality
    assert rows > bin_size_bits(100_000, 13, 3, 0.01)  # blocking costs bits
    # rbt2 must be explicitly requested; the production default is rbt1
    # (the gather engine gives blocked layouts no discount on v5e)
    p2 = IBFParams(kmer_size=13, fragment_length=100_000, hash_scheme="rbt2")
    assert p2.hash_scheme == "rbt2" and p2.rows == rows
    assert IBFParams(kmer_size=13, fragment_length=100_000).hash_scheme == "rbt1"


def test_blocked_fp_saturation_and_empty():
    from readbouncer_tpu.ibf.params import blocked_fp

    assert blocked_fp(8, 10_000, 3) == 1.0  # saturated block shortcut
    assert blocked_fp(8_000_000, 1, 3) < 1e-5  # nearly empty filter
