"""IBF construction: FASTA references -> fragments -> bit matrix.

Faithful to the reference build semantics:

* N-run splitting with the reference's truncation quirk: the final
  segment of every sequence loses its last character
  (``substr(start, seqlen-start-1)`` when the trailing segment runs to
  the end; reference: src/IBF/IBFBuild.cpp:112-132).
* fragmentation: fragment 0 is ``[0, fragment_length)``; fragment i>=1 is
  ``[i*fragment_length - (kmer_size-1), (i+1)*fragment_length)``; ends
  clamp to the sequence length; the loop runs while
  ``fragstart < seqlen - 1`` (reference: src/IBF/IBFBuild.cpp:165-204).
  The documented 1500-nt overlap_length only affects fragment 0 (where it
  clamps to 0); the effective inter-fragment overlap is k-1.
* declared bin count per sequence is ``len//fragment_length + 1``
  (counted before fragmentation; reference: src/IBF/IBFBuild.cpp:90) —
  this is what sizes the filter, even though the fragment loop may insert
  one more fragment for lengths in ``[m*F - k + 2, m*F)``-adjacent edge
  windows; the 64-bin padding absorbs the difference exactly as in the
  reference.
* sequences shorter than kmer_size are skipped as invalid
  (reference: src/IBF/IBFBuild.cpp:70-73).

The bit-setting hot loop has two implementations:

* native (default when built): ``_native.insert_fragments`` — the rbt1
  hash + atomic scatter-OR in C++, fragments distributed over worker
  threads — the TPU-rebuild equivalent of the reference's reader+worker
  insert pipeline (src/IBF/IBFBuild.cpp:28,153-156).  ~100x the numpy
  path; measured 22 Mb/s on this 2-core host — 51.2 Mb (the realistic
  512 x 100 kb bench filter) in ~2.3 s (scripts/bench_build.py).
* numpy fallback/oracle: `insert_sequence` computes all (row, word,
  bitmask) triples for a fragment in one shot and scatter-ORs them.
  Equivalence is asserted in tests/test_build.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

from readbouncer_tpu.errors import BinCapacityError
from readbouncer_tpu.fastio.fasta import read_records
from readbouncer_tpu.ibf.hashing import encode_bases, hash_rows_np, kmer_codes_np
from readbouncer_tpu.ibf.params import IBFParams, optimal_bins
from readbouncer_tpu.ibf.storage import IBFData

__all__ = ["BuildStats", "cut_out_nnns", "fragment_bounds", "build_ibf", "update_ibf"]

try:  # native insert kernel (native/rbt_native.cpp); numpy fallback below
    from readbouncer_tpu import _native as _rbt_native
except ImportError:  # pragma: no cover - environment without the build
    _rbt_native = None


@dataclass
class BuildStats:
    """Mirror of the reference's FilterStats (src/IBF/IBF.hpp:51-79)."""

    sum_seq_len: int = 0
    total_seqs_file: int = 0
    total_bins_declared: int = 0  # totalBinsBinId
    total_bins_inserted: int = 0
    invalid_seqs: int = 0
    new_bins: int = 0
    filter_size_bits: int = 0
    build_seconds: float = 0.0


def cut_out_nnns(seq: str) -> str:
    """Remove N-runs; reproduces the reference's final-segment truncation.

    Reference: src/IBF/IBFBuild.cpp:112-132 — segments are the maximal
    N-free stretches; if a segment runs to the end of the sequence the
    reference takes ``substr(start, seqlen - start - 1)``, dropping the
    final character.  Only 'N' (uppercase) delimits, as in the reference.
    """
    seqlen = len(seq)
    out: list[str] = []
    start = 0
    while True:
        while start < seqlen and seq[start] == "N":
            start += 1
        if start >= seqlen:
            break
        end = seq.find("N", start)
        if end == -1:
            out.append(seq[start : start + (seqlen - start - 1)])
            break
        out.append(seq[start:end])
        start = end
    return "".join(out)


def fragment_bounds(seqlen: int, fragment_length: int, kmer_size: int) -> list[tuple[int, int]]:
    """(start, end) for every inserted fragment of a cleaned sequence.

    Reference loop: src/IBF/IBFBuild.cpp:165-204.
    """
    bounds: list[tuple[int, int]] = []
    frag_idx = 0
    fragstart = 0  # 0*F - overlap + 1 clamps to 0
    while fragstart < seqlen - 1:
        fragend = min((frag_idx + 1) * fragment_length, seqlen)
        bounds.append((fragstart, fragend))
        frag_idx += 1
        fragstart = frag_idx * fragment_length - kmer_size + 1
    return bounds


def insert_sequence(ibf: IBFData, bases: np.ndarray, bin_id: int) -> None:
    """Insert every forward k-mer of an encoded fragment into *bin_id*.

    The reference inserts only forward-strand k-mers at build time;
    reverse complements are handled at query time as a second count pass
    (reference: src/IBF/IBFClassify.cpp:97-98).
    """
    fwd, _ = kmer_codes_np(bases, ibf.kmer_size)
    if fwd.size == 0:
        return
    rows = hash_rows_np(fwd, ibf.hash_functions, ibf.rows, scheme=ibf.scheme)  # [n, h]
    word = np.uint32(bin_id // 32)
    mask = np.uint32(1 << (bin_id % 32))
    flat = ibf.bits.reshape(-1)
    idx = rows.reshape(-1).astype(np.int64) * ibf.words + int(word)
    np.bitwise_or.at(flat, idx, mask)


@dataclass
class _ParsedRefs:
    seqids: list[str] = field(default_factory=list)
    cleaned: list[str] = field(default_factory=list)


def _parse_refs(
    reference_files: Sequence[str | Path], params: IBFParams, stats: BuildStats
) -> _ParsedRefs:
    """Stream + clean reference sequences (reference: src/IBF/IBFBuild.cpp:16-104)."""
    out = _ParsedRefs()
    for ref in reference_files:
        for rec in read_records(ref, first_word_id=True):
            stats.total_seqs_file += 1
            if len(rec.seq) < params.kmer_size:
                stats.invalid_seqs += 1
                continue
            newseq = cut_out_nnns(rec.seq)
            out.seqids.append(rec.id)
            out.cleaned.append(newseq)
            stats.total_bins_declared += len(newseq) // params.fragment_length + 1
            stats.sum_seq_len += len(newseq)
    return out


def build_ibf(
    reference_files: Sequence[str | Path],
    params: IBFParams,
    name: str = "",
) -> tuple[IBFData, BuildStats]:
    """Build a filter from FASTA files (reference: IBF::create_filter,
    src/IBF/IBFBuild.cpp:421-521)."""
    import time

    params.validate()
    stats = BuildStats()
    t0 = time.monotonic()
    parsed = _parse_refs(reference_files, params, stats)

    rows = params.rows
    stats.filter_size_bits = rows * optimal_bins(stats.total_bins_declared)
    ibf = IBFData.empty(
        rows=rows,
        num_bins=stats.total_bins_declared,
        kmer_size=params.kmer_size,
        hash_functions=params.hash_functions,
        fragment_length=params.fragment_length,
        max_fp=params.max_fp,
        name=name,
        scheme=params.hash_scheme,
    )
    _insert_all(ibf, parsed, params, stats, bin_offset=0)
    stats.build_seconds = time.monotonic() - t0
    return ibf, stats


def _insert_all(
    ibf: IBFData,
    parsed: _ParsedRefs,
    params: IBFParams,
    stats: BuildStats,
    bin_offset: int,
    use_native: bool | None = None,
) -> None:
    if use_native is None:
        use_native = _rbt_native is not None
    bin_id = bin_offset
    ranges: list[tuple[int, int]] = list(
        map(tuple, ibf.bin_ranges.tolist()) if ibf.bin_ranges is not None else []
    )
    for seqid, seq in zip(parsed.seqids, parsed.cleaned):
        bases = encode_bases(seq)
        bounds = fragment_bounds(len(seq), params.fragment_length, params.kmer_size)
        if bin_id + len(bounds) > ibf.padded_bins:
            # edge-window overflow beyond the 64-bin padding; the
            # reference would write out of declared range — we refuse.
            raise BinCapacityError(
                f"fragment count exceeded padded bin capacity ({ibf.padded_bins})"
            )
        if use_native and bounds:
            frags = np.array(
                [(s, e, bin_id + i) for i, (s, e) in enumerate(bounds)],
                dtype=np.int64,
            )
            _rbt_native.insert_fragments(
                ibf.bits.reshape(-1),
                ibf.rows,
                ibf.words,
                bases.tobytes(),
                frags.tobytes(),
                params.kmer_size,
                params.hash_functions,
                params.threads,
                1 if ibf.scheme == "rbt2" else 0,
            )
        else:
            for i, (fragstart, fragend) in enumerate(bounds):
                insert_sequence(ibf, bases[fragstart:fragend], bin_id + i)
        for fragstart, fragend in bounds:
            ibf.bin_seqids.append(seqid)
            ranges.append((fragstart, fragend))
            bin_id += 1
    ibf.bin_ranges = np.array(ranges, dtype=np.uint64) if ranges else None
    stats.total_bins_inserted = bin_id - bin_offset


def update_ibf(
    ibf: IBFData,
    reference_files: Sequence[str | Path],
    params: IBFParams,
) -> tuple[IBFData, BuildStats]:
    """Append new references to an existing filter.

    Mirrors IBF::update_filter (reference: src/IBF/IBFBuild.cpp:223-321):
    load -> resize bins to old+new -> insert new fragments starting at the
    old declared bin count.
    """
    params.validate()
    if params.hash_scheme != ibf.scheme:
        # the existing bits govern: new fragments must hash the same way
        params = replace(params, hash_scheme=ibf.scheme)
    stats = BuildStats()
    old_bins = ibf.num_bins
    parsed = _parse_refs(reference_files, params, stats)
    new_total = old_bins + stats.total_bins_declared
    if new_total > old_bins:
        ibf.resize_bins(new_total)
        stats.new_bins = stats.total_bins_declared
    _insert_all(ibf, parsed, params, stats, bin_offset=old_bins)
    stats.total_bins_declared = new_total
    stats.filter_size_bits = ibf.total_bits
    return ibf, stats
