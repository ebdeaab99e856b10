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
    p = IBFParams(kmer_size=13, fragment_length=100_000)
    assert p.rows == 79_121_216 // 64
    assert p.total_bits(2) == 79_121_216
