"""IBF sizing and configuration parameters.

Reproduces the reference's filter geometry exactly:

* ``bin_size_bits`` — bits per bin slice, from the max false-positive
  rate, hash count and fragment length
  (reference: src/IBF/IBFBuild.cpp:404-413).
* bins are padded up to the next multiple of 64 — the interleaved layout
  stores one 64-bin block per hash row in the reference; we keep the same
  logical padding so filter-bit parity is meaningful
  (reference: src/IBF/IBFBuild.cpp:407).
* default constants k=13, 3 hash functions, max_fp=0.01, overlap 1500
  (reference: src/IBF/IBFConfig.hpp:67-77).

Golden: 2 bins, k=13, fragment_length=100000, h=3, fp=0.01
=> 79_121_216 total bits (reference: src/test/libIBFTests/createfilter.hpp:139-152).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

__all__ = ["IBFParams", "bin_size_bits", "optimal_bins", "filter_size_bits"]


def bin_size_bits(
    fragment_length: int, kmer_size: int, hash_functions: int, max_fp: float
) -> int:
    """Bits per bin slice (= number of hash rows).

    ``ceil(-1 / ((1 - max_fp^(1/h))^(1/(h*(fragLen-k+1))) - 1))``
    Reference: src/IBF/IBFBuild.cpp:406-409.
    """
    max_kmer_count = fragment_length - kmer_size + 1
    inner = math.pow(
        1.0 - math.pow(max_fp, 1.0 / hash_functions),
        1.0 / (hash_functions * max_kmer_count),
    )
    return int(math.ceil(-1.0 / (inner - 1.0)))


def optimal_bins(num_bins: int) -> int:
    """Bins padded to the next multiple of 64.

    The reference computes ``floor(bins/64 + 1) * 64`` — note this pads an
    exact multiple of 64 up by another 64 (floor semantics with +1);
    reproduced verbatim.  Reference: src/IBF/IBFBuild.cpp:407.
    """
    return int(math.floor(num_bins / 64.0 + 1.0)) * 64


def filter_size_bits(
    num_bins: int,
    fragment_length: int,
    kmer_size: int = 13,
    hash_functions: int = 3,
    max_fp: float = 0.01,
) -> int:
    """Total filter size in bits. Reference: src/IBF/IBFBuild.cpp:404-413."""
    return bin_size_bits(fragment_length, kmer_size, hash_functions, max_fp) * optimal_bins(
        num_bins
    )


@dataclass
class IBFParams:
    """Build/query parameters (reference: src/IBF/IBFConfig.hpp:48-145)."""

    kmer_size: int = 13
    fragment_length: int = 100_000
    hash_functions: int = 3
    max_fp: float = 0.01
    overlap_length: int = 1500  # only applied to fragment 0 in the reference

    # number of sequence records read per host batch (streaming)
    n_refs: int = 400
    # build worker threads (native insert path); 0 = all available cores.
    # Reference analog: IBF_Params.threads (src/IBF/IBFConfig.hpp:98-105).
    build_threads: int = 0

    @property
    def threads(self) -> int:
        import os

        return self.build_threads if self.build_threads > 0 else (os.cpu_count() or 1)

    def validate(self) -> "IBFParams":
        if self.kmer_size < 1 or self.kmer_size > 15:
            raise ValueError(
                f"kmer_size must be in [1, 15] (base-5 k-mer codes), got {self.kmer_size}"
            )
        if self.fragment_length <= self.kmer_size:
            raise ValueError("fragment_length must exceed kmer_size")
        if self.hash_functions < 1 or self.hash_functions > 5:
            raise ValueError("hash_functions must be in [1, 5]")
        if not (0.0 < self.max_fp < 1.0):
            raise ValueError("max_fp must be in (0, 1)")
        return self

    @property
    def rows(self) -> int:
        """Hash rows = bits per bin slice."""
        return bin_size_bits(
            self.fragment_length, self.kmer_size, self.hash_functions, self.max_fp
        )

    def total_bits(self, num_bins: int) -> int:
        return self.rows * optimal_bins(num_bins)
