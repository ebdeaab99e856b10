"""Fused whole-read classification: ONE device call per read batch.

Motivation: the TPU is reached through a network tunnel, so a host<->device
round trip costs ~35 ms while the whole 2048-read count pass costs ~0.5 ms
on device.  The reference's control flow (chunk loop with early exit per
read, src/main/classify.hpp:262-299) would cost one round trip per wave
per filter stack; here every chunk of every read is classified
speculatively in a single XLA program and the "first chunk that
classifies wins" reduction happens on device — decisions are provably
identical because a classified read's later chunks are simply discarded.

Components:

* threshold lookup tables — the CI/threshold math stays on the host in
  float64 (SURVEY.md §7 Hard Parts #7) but is precomputed for every
  possible chunk length (0..chunk_length) and baked into the program as
  constants; the device just does a table lookup per fragment.
* device-side decision policy — exact jnp ports of
  classify/policy.py's classify_decisions / live_decisions.
* a jitted program per (batch shape, filter geometry): reads [R, C*cl]
  -> (classified [R], best_target [R], attempts [R]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from readbouncer_tpu.classify.math import ci_and_threshold_batch
from readbouncer_tpu.ibf.query import (
    FilterSegment,
    FilterStack,
    _counts_impl,
    _max_counts_impl,
)

__all__ = [
    "threshold_table",
    "jax_best_filter_index",
    "jax_classify_decisions",
    "jax_live_decisions",
    "make_fused_classify_fn",
    "make_fused_classify_packed_fn",
    "make_fused_live_fn",
    "pack5_np",
    "unpack5_jnp",
    "pack4_np",
    "unpack4_jnp",
    "packed_bytes_per_read",
    "unpack_results_np",
]


def pack5_np(enc: np.ndarray) -> np.ndarray:
    """Pack base codes (u8 in 0..4) 3-per-byte: byte = c0 + 5*c1 + 25*c2.

    DNA over the Dna5 alphabet is 5 symbols = log2(5) = 2.32 bits/base;
    base-243 packing hits 2.67 bits/base with a trivial VPU decode.  The
    tunnel to the chip runs at single-digit MB/s on bad days
    (scripts/transfer_probe.py; docs/PERF_NOTES.md), so the engine ships
    packed reads and unpacks on device.
    """
    R, L = enc.shape
    P = -(-L // 3)
    if L % 3:
        enc = np.pad(enc, ((0, 0), (0, 3 * P - L)))
    e = enc.reshape(R, P, 3).astype(np.uint16)
    return (e[:, :, 0] + 5 * e[:, :, 1] + 25 * e[:, :, 2]).astype(np.uint8)


def unpack5_jnp(packed: jnp.ndarray, length: int) -> jnp.ndarray:
    """Device inverse of pack5_np: [R, P] u8 -> [R, length] u8 codes."""
    x = packed.astype(jnp.uint32)
    parts = jnp.stack([x % 5, (x // 5) % 5, x // 25], axis=-1)
    return parts.reshape(packed.shape[0], -1)[:, :length].astype(jnp.uint8)


def pack4_np(enc: np.ndarray) -> np.ndarray:
    """Pack PURE-ACGT base codes (u8 in 0..3) 4-per-byte (2 bits/base).

    25% fewer H2D bytes than base-243 — the tunnel serializes transfers
    with device compute, so pool bytes are wall-clock (docs/PERF_NOTES.md).
    Only valid when the pool holds no N (code 4); the engine checks per
    host batch and falls back to pack5_np (N reads are rare: basecalled
    sequences are ACGT-only, Ns come only from FASTA/FASTQ inputs).
    """
    R, L = enc.shape
    P = -(-L // 4)
    if L % 4:
        enc = np.pad(enc, ((0, 0), (0, 4 * P - L)))
    e = enc.reshape(R, P, 4).astype(np.uint8)
    return e[:, :, 0] | (e[:, :, 1] << 2) | (e[:, :, 2] << 4) | (e[:, :, 3] << 6)


def unpack4_jnp(packed: jnp.ndarray, length: int) -> jnp.ndarray:
    """Device inverse of pack4_np: [R, P] u8 -> [R, length] u8 codes."""
    x = packed.astype(jnp.uint32)
    parts = jnp.stack(
        [x & 3, (x >> 2) & 3, (x >> 4) & 3, (x >> 6) & 3], axis=-1
    )
    return parts.reshape(packed.shape[0], -1)[:, :length].astype(jnp.uint8)


def packed_bytes_per_read(length: int, packing: str) -> int:
    """Pool row bytes for one read of ``length`` bases under ``packing``."""
    if packing == "2bit":
        return -(-length // 4)
    if packing == "base243":
        return -(-length // 3)
    raise ValueError(f"unknown packing {packing!r}")


def _unpack_for(packing: str):
    return unpack4_jnp if packing == "2bit" else unpack5_jnp


# result packing: the per-read (classified, best_target, attempts) triple
# crosses D2H as ONE int32 — bit 0 classified, bits 1-8 attempts,
# bits 9+ best_target+1.  3 arrays -> 1 and 9 B/read -> 4 B/read; on the
# tunnel D2H bytes are serialized wall-clock like H2D.
def _pack_result_jnp(classified, best, attempts):
    return (
        classified.astype(jnp.int32)
        + (attempts.astype(jnp.int32) << 1)
        + ((best.astype(jnp.int32) + 1) << 9)
    )


def unpack_results_np(res: np.ndarray):
    """Host inverse of _pack_result_jnp -> (classified, best, attempts)."""
    res = np.asarray(res)
    return (res & 1).astype(bool), (res >> 9) - 1, (res >> 1) & 0xFF


def threshold_table(
    max_len: int, kmer_size: int, error_rate: float, significance: float
) -> np.ndarray:
    """uint32[max_len+1] effective uint16-wrapped thresholds per length.

    Computed on host in float64 (bit-identical to classify/math.py) and
    embedded in the device program as a constant.
    """
    lens = np.arange(max_len + 1, dtype=np.int64)
    return ci_and_threshold_batch(lens, kmer_size, error_rate, significance)


def jax_best_filter_index(counts: jnp.ndarray) -> jnp.ndarray:
    """First-max argmax per row; -1 where the max is 0 (policy.py port)."""
    best = jnp.argmax(counts, axis=1)
    return jnp.where(jnp.max(counts, axis=1) > 0, best, -1)


def jax_classify_decisions(t_base, d_base, t_retry, d_retry):
    """Device port of policy.classify_decisions (same None semantics)."""
    have_t = t_base is not None and t_base.shape[1] > 0
    have_d = d_base is not None and d_base.shape[1] > 0
    if have_t and have_d:
        tmax = jnp.max(t_base, axis=1)
        dmax = jnp.max(d_base, axis=1)
        tmax2 = jnp.max(t_retry, axis=1)
        dmax2 = jnp.max(d_retry, axis=1)
        both = (tmax > 0) & (dmax > 0)
        retry_ok = (tmax2 > 0) & (dmax2 == 0)
        classified = ((tmax > 0) & (dmax == 0)) | (both & retry_ok)
        best = jax_best_filter_index(t_base)
        best = jnp.where(classified, best, -1)
        return classified & (best >= 0), best
    if have_d:
        dbest = jax_best_filter_index(d_base)
        return dbest > -1, jnp.full(d_base.shape[0], -1, dtype=jnp.int32)
    best = jax_best_filter_index(t_base)
    return best != -1, best


def jax_live_decisions(d_base, t_base, d_retry, t_retry):
    """Device port of policy.live_decisions (0/1/2 decisions)."""
    have_t = t_base is not None and t_base.shape[1] > 0
    have_d = d_base is not None and d_base.shape[1] > 0
    if have_t and have_d:
        dmax = jnp.max(d_base, axis=1)
        tmax = jnp.max(t_base, axis=1)
        dmax2 = jnp.max(d_retry, axis=1)
        tmax2 = jnp.max(t_retry, axis=1)
        out = jnp.zeros(dmax.shape[0], dtype=jnp.int32)
        out = jnp.where((dmax > 0) & (tmax == 0), 1, out)
        both = (dmax > 0) & (tmax > 0)
        out = jnp.where(both & (dmax2 > 0) & (tmax2 == 0), 1, out)
        out = jnp.where((dmax == 0) & (tmax > 0), 2, out)
        return out
    if have_d:
        return jnp.where(jnp.max(d_base, axis=1) > 0, 1, 0)
    return jnp.where(jnp.max(t_base, axis=1) > 0, 2, 1)


def _stack_dual_max(stack: FilterStack, bits, frags, lens, tab_base, tab_retry):
    """counts once, per-filter maxes at both threshold tables.

    bits is threaded through as a runtime argument, NOT read off the
    stack: a closure-captured device array becomes an XLA constant, and
    large constants get a compiler-chosen padded layout that demotes the
    Bloom-row gather from VMEM-resident (~0.2 ms) to HBM random access
    (~100 ms per batch on v5e) — see docs/PERF_NOTES.md.

    On TPU the expansion + two threshold passes fuse into ONE Pallas
    reduction straight off the bit planes (planes_dual_max_pallas):
    expand_planes + 2x _max_counts_impl cost two full HBM passes over
    the 32x expanded counts tensor (~16 ms per 2048-chunk batch,
    docs/PERF_NOTES.md round-4); the fused reducer keeps counts in
    VMEM and writes only [R, F].
    """
    thr_b = jnp.take(tab_base, lens)
    thr_r = jnp.take(tab_retry, lens)
    R = frags.shape[0]
    rb = min(128, R)
    if jax.default_backend() != "cpu" and R % rb == 0:
        from readbouncer_tpu.ibf.query import counts_planes_pallas
        from readbouncer_tpu.ops.ibf_count_pallas import (
            pack_bin_mask,
            planes_dual_max_pallas,
        )

        planes = counts_planes_pallas(
            bits,
            frags,
            lens,
            k=stack.kmer_size,
            h=stack.hash_functions,
            rows=stack.rows,
            scheme=stack.scheme,
        )
        mask_words = jnp.asarray(pack_bin_mask(np.asarray(stack.bin_mask)))
        return planes_dual_max_pallas(
            planes, thr_b, thr_r, mask_words, stack._seg_spec, read_block=rb
        )
    counts = _counts_impl(
        bits,
        frags,
        lens,
        k=stack.kmer_size,
        h=stack.hash_functions,
        rows=stack.rows,
        scheme=stack.scheme,
    )
    mb = _max_counts_impl(counts, thr_b, stack.bin_mask, segments=stack._seg_spec)
    mr = _max_counts_impl(counts, thr_r, stack.bin_mask, segments=stack._seg_spec)
    return mb, mr


def _plan_stacks(targets: FilterStack | None, depletes: FilterStack | None):
    """Merge both filter kinds into ONE stack when geometry matches.

    Target and deplete filters built with the same (k, h, rows) share
    hash rows, so their bin blocks concatenate into a single bits matrix:
    one gather pass serves both kinds (halving the gather count — the
    kernel's bottleneck) where the reference fans out per-filter async
    tasks (src/IBF/IBFClassify.cpp:256-259, 315-341).
    """
    if targets is None or depletes is None:
        return None, 0
    if (targets.kmer_size, targets.hash_functions, targets.rows, targets.scheme) != (
        depletes.kmer_size,
        depletes.hash_functions,
        depletes.rows,
        depletes.scheme,
    ):
        return None, 0
    combined = FilterStack.__new__(FilterStack)
    combined.kmer_size = targets.kmer_size
    combined.hash_functions = targets.hash_functions
    combined.rows = targets.rows
    combined.scheme = targets.scheme
    combined.interpret = targets.interpret
    off = targets.total_bins
    combined.segments = list(targets.segments) + [
        FilterSegment(s.name, s.bin_offset + off, s.num_bins, s.padded_bins)
        for s in depletes.segments
    ]
    combined.total_bins = off + depletes.total_bins
    combined.words = combined.total_bins // 32
    combined.bits = jnp.concatenate(
        [jnp.asarray(targets.bits), jnp.asarray(depletes.bits)], axis=1
    )
    combined.bin_mask = jnp.concatenate(
        [jnp.asarray(targets.bin_mask), jnp.asarray(depletes.bin_mask)]
    )
    combined._seg_spec = tuple(
        (s.bin_offset, s.padded_bins) for s in combined.segments
    )
    return combined, targets.num_filters


def make_fused_classify_fn(
    targets: FilterStack | None,
    depletes: FilterStack | None,
    chunk_length: int,
    max_chunks: int,
    error_rate: float,
    significance: float,
    attempt_offset: int = 0,
    plan=None,
):
    """Build the jitted whole-read classifier.

    Returned fn: (reads [R, max_chunks*chunk_length] u8, lengths [R] i32)
    -> (classified [R] bool, best_target [R] i32, attempts [R] i32).

    attempt_offset shifts the reported chunk indices: a program built for
    chunks [off, off+max_chunks) of a longer read (the two-phase classify
    in engine.py scores chunk 0 for everything, then only the remaining
    chunks of still-unresolved reads).
    """
    plan = plan if plan is not None else _plan_stacks(targets, depletes)
    fn = _fused_core(
        targets, depletes, chunk_length, max_chunks, error_rate, significance,
        attempt_offset, plan,
    )
    jfn = jax.jit(fn)
    bits_args = _bits_args(targets, depletes, plan)
    return lambda reads, lengths: jfn(bits_args, reads, lengths)


def _bits_args(targets, depletes, plan):
    combined, _ = plan
    if combined is not None:
        return (combined.bits,)
    return tuple(s.bits for s in (targets, depletes) if s is not None)


def _fused_core(
    targets, depletes, chunk_length, max_chunks, error_rate, significance,
    attempt_offset, plan,
):
    """The whole-read classifier body: fn(bits_args, reads, lengths)."""
    cl, C = chunk_length, max_chunks
    combined, n_targets = plan
    tabs = {}
    for name, stack in (("t", targets), ("d", depletes)):
        if stack is None:
            continue
        tabs[name + "b"] = jnp.asarray(
            threshold_table(cl, stack.kmer_size, error_rate, significance)
        )
        tabs[name + "r"] = jnp.asarray(
            threshold_table(cl, stack.kmer_size, error_rate - 0.02, significance)
        )

    def fn(bits_args, reads: jnp.ndarray, lengths: jnp.ndarray):
        R = reads.shape[0]
        frags = reads.reshape(R * C, cl)
        clens = jnp.clip(
            lengths[:, None] - jnp.arange(C, dtype=lengths.dtype)[None, :] * cl,
            0,
            cl,
        )  # [R, C]
        lens_flat = clens.reshape(-1)
        t_b = t_r = d_b = d_r = None
        if combined is not None:
            mb, mr = _stack_dual_max(
                combined, bits_args[0], frags, lens_flat, tabs["tb"], tabs["tr"]
            )
            t_b, d_b = mb[:, :n_targets], mb[:, n_targets:]
            t_r, d_r = mr[:, :n_targets], mr[:, n_targets:]
        else:
            i = 0
            if targets is not None:
                t_b, t_r = _stack_dual_max(
                    targets, bits_args[i], frags, lens_flat, tabs["tb"], tabs["tr"]
                )
                i += 1
            if depletes is not None:
                d_b, d_r = _stack_dual_max(
                    depletes, bits_args[i], frags, lens_flat, tabs["db"], tabs["dr"]
                )
        ok_flat, best_flat = jax_classify_decisions(t_b, d_b, t_r, d_r)
        ok = ok_flat.reshape(R, C)
        best = best_flat.reshape(R, C)
        first = jnp.argmax(ok, axis=1)  # first classified chunk
        classified = jnp.any(ok, axis=1)
        best_read = jnp.take_along_axis(best, first[:, None], axis=1)[:, 0]
        avail = jnp.sum((clens > 0).astype(jnp.int32), axis=1)
        off = jnp.int32(attempt_offset)
        attempts = jnp.where(
            classified, first.astype(jnp.int32) + 1 + off, avail + off
        )
        return classified, jnp.where(classified, best_read, -1), attempts

    return fn


def make_fused_classify_packed_fn(
    targets: FilterStack | None,
    depletes: FilterStack | None,
    chunk_length: int,
    max_chunks: int,
    error_rate: float,
    significance: float,
    batch_size: int,
    attempt_offset: int = 0,
    plan=None,
    packing: str = "base243",
):
    """Bulk-upload variant of make_fused_classify_fn.

    The engine uploads ONE packed array for a whole phase (pack5_np, or
    pack4_np for pure-ACGT pools — ``packing`` = "base243" | "2bit") and
    every batch program slices its rows on device — per-batch H2D costs
    ~110-420 ms on the tunnel (scripts/transfer_probe.py), one bulk put
    amortizes to ~12 MB/s.

    Returned fn: (packed_pool: FLAT u8 device array holding N_pad rows of
                  packed_bytes_per_read(C*cl, packing) bytes (padded to a
                  power-of-two bucket so pool size does not retrace the
                  program),
                  lens_pool: i32 device array (same bucketing),
                  start: int (row offset, traced))
    -> (res [B] i32 — unpack_results_np, pending [B] bool).

    ``pending`` marks reads this program left unresolved that have more
    chunks to score (lens > C*cl past attempt_offset): the engine's
    phase-B candidate set, computed on device so the mid-batch fetch is
    1 byte/read instead of the full result triple.
    """
    cl, C, B = chunk_length, max_chunks, batch_size
    L = C * cl
    P = packed_bytes_per_read(L, packing)
    unpack = _unpack_for(packing)
    plan = plan if plan is not None else _plan_stacks(targets, depletes)
    base_fn = _fused_core(
        targets, depletes, cl, C, error_rate, significance, attempt_offset, plan
    )

    def fn(bits_args, packed_pool, lens_pool, start):
        seg = jax.lax.dynamic_slice(packed_pool, (start * P,), (B * P,))
        lens = jax.lax.dynamic_slice(lens_pool, (start,), (B,))
        reads = unpack(seg.reshape(B, P), L)
        classified, best, attempts = base_fn(bits_args, reads, lens)
        pending = ~classified & (lens > jnp.int32(C * cl))
        return _pack_result_jnp(classified, best, attempts), pending

    jfn = jax.jit(fn)
    bits_args = _bits_args(targets, depletes, plan)
    # start is passed as a traced scalar so every batch offset shares ONE
    # compiled program (a Python int would re-trace per offset)
    return lambda all_packed, all_lens, start: jfn(
        bits_args, all_packed, all_lens, jnp.int32(start)
    )


def make_fused_classify_indexed_fn(
    targets: FilterStack | None,
    depletes: FilterStack | None,
    chunk_length: int,
    max_chunks: int,
    error_rate: float,
    significance: float,
    batch_size: int,
    pool_row_words: int,
    attempt_offset: int = 0,
    plan=None,
):
    """Gather-by-index variant of make_fused_classify_packed_fn.

    Phase B of the engine scores a compacted SUBSET of the phase-A pool.
    Rather than packing + uploading that subset while the device idles,
    the engine uploads the FULL candidate pool during phase-A compute
    (overlapped) and phase-B programs pick their rows on device from a
    tiny index array.

    Returned fn: (pool_u32: flat u32 device array of N rows x
                  pool_row_words words (pack5 bytes, 4-byte padded),
                  lens_pool: i32 (phase-B lengths, same row ids),
                  idx_pool: i32 (pending row ids, pow2-bucketed),
                  start: int (offset into idx_pool, traced))
    -> (classified [B] bool, best_target [B] i32, attempts [B] i32).
    """
    cl, C, B = chunk_length, max_chunks, batch_size
    L = C * cl
    PW = pool_row_words
    plan = plan if plan is not None else _plan_stacks(targets, depletes)
    base_fn = _fused_core(
        targets, depletes, cl, C, error_rate, significance, attempt_offset, plan
    )

    def fn(bits_args, pool_u32, lens_pool, idx_pool, start):
        idx = jax.lax.dynamic_slice(idx_pool, (start,), (B,))
        # the pool is pow2-bucketed, so trim the tail that does not fill
        # a whole row before viewing it 2-D
        n_rows = pool_u32.shape[0] // PW
        rows = jnp.take(
            pool_u32[: n_rows * PW].reshape(n_rows, PW), idx, axis=0
        )  # [B, PW]
        packed = jax.lax.bitcast_convert_type(rows, jnp.uint8).reshape(B, PW * 4)
        lens = jnp.take(lens_pool, idx)
        reads = unpack5_jnp(packed, L)
        classified, best, attempts = base_fn(bits_args, reads, lens)
        pending = jnp.zeros_like(classified)  # phase B scores every rest chunk
        return _pack_result_jnp(classified, best, attempts), pending

    jfn = jax.jit(fn)
    bits_args = _bits_args(targets, depletes, plan)
    return lambda pool_u32, lens_pool, idx_pool, start: jfn(
        bits_args, pool_u32, lens_pool, idx_pool, jnp.int32(start)
    )


def make_fused_live_fn(
    targets: FilterStack | None,
    depletes: FilterStack | None,
    max_seq_len: int,
    error_rate: float,
    significance: float,
    packed: bool = False,
    plan=None,
):
    """Build the jitted live decision step (check_unblock for a batch).

    Returned fn: (reads [R, max_seq_len] u8, lengths [R] i32)
    -> decisions [R] i32 (0 continue / 1 unblock / 2 stop_receiving).
    With ``packed=True`` the fn takes base-243 packed reads
    [R, ceil(max_seq_len/3)] instead (pack5_np) — 3x less H2D on the
    live tick path.
    """
    plan = plan if plan is not None else _plan_stacks(targets, depletes)
    combined, n_targets = plan
    tabs = {}
    for name, stack in (("t", targets), ("d", depletes)):
        if stack is None:
            continue
        tabs[name + "b"] = jnp.asarray(
            threshold_table(max_seq_len, stack.kmer_size, error_rate, significance)
        )
        tabs[name + "r"] = jnp.asarray(
            threshold_table(max_seq_len, stack.kmer_size, error_rate - 0.02, significance)
        )

    def fn(bits_args, reads: jnp.ndarray, lengths: jnp.ndarray):
        lens = jnp.minimum(lengths, max_seq_len)
        t_b = t_r = d_b = d_r = None
        if combined is not None:
            mb, mr = _stack_dual_max(
                combined, bits_args[0], reads, lens, tabs["tb"], tabs["tr"]
            )
            t_b, d_b = mb[:, :n_targets], mb[:, n_targets:]
            t_r, d_r = mr[:, :n_targets], mr[:, n_targets:]
        else:
            i = 0
            if targets is not None:
                t_b, t_r = _stack_dual_max(
                    targets, bits_args[i], reads, lens, tabs["tb"], tabs["tr"]
                )
                i += 1
            if depletes is not None:
                d_b, d_r = _stack_dual_max(
                    depletes, bits_args[i], reads, lens, tabs["db"], tabs["dr"]
                )
        return jax_live_decisions(d_b, t_b, d_r, t_r)

    jfn = jax.jit(fn)
    bits_args = _bits_args(targets, depletes, (combined, n_targets))
    if packed:

        def pfn(b_args, packed_reads, lengths):
            return fn(b_args, unpack5_jnp(packed_reads, max_seq_len), lengths)

        jpfn = jax.jit(pfn)
        return lambda packed_reads, lengths: jpfn(bits_args, packed_reads, lengths)
    return lambda reads, lengths: jfn(bits_args, reads, lengths)
