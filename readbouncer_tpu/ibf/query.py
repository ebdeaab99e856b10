"""Batched IBF query on device (XLA path).

One jitted program computes, for a padded batch of encoded reads, the
per-bin k-mer match counts against a stack of filters, for forward and
reverse-complement strands, and reduces them to per-filter maximum
matched counts under a per-read threshold:

    reads [R, L] u8 -> k-mer codes [R, 2, Wn] u32      (k shifted MACs)
                    -> hash rows  [R, 2, Wn, h] u32    (fmix32 + fastrange)
                    -> row gather -> AND over h        (Bloom membership)
                    -> per-bin popcount-accumulate     -> counts [R, 2, B]
                    -> threshold + segment max         -> max_counts [R, F]

Everything is uint32; there is no 64-bit arithmetic anywhere (TPUs have
no native u64).  The semantics mirror seqan::count + max_matches
(reference: src/IBF/IBFClassify.cpp:97-98,48-71): a bin's count is the
number of read windows whose k-mer is present in the bin (all h bits
set); a bin "matches" when its forward OR revcomp count reaches the
threshold; the per-filter result is the max over matching bins of
max(fwd, rc).

A Pallas kernel (ops/ibf_query_pallas.py) implements the same
counts-contract for VMEM-resident filters; this XLA path is the
reference implementation and the fallback for any size.

Key performance choice: counts are *independent of error_rate*, so the
reference's "-0.02 retry" (a full second count pass in C++,
src/main/classify.hpp:67-69) is a free re-threshold here — the engine
evaluates both thresholds against one counts pass with identical
decisions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from readbouncer_tpu.errors import EmptyFilterError, FilterGeometryError
from readbouncer_tpu.ibf.hashing import BLOCK_ROWS, SEEDS
from readbouncer_tpu.ibf.storage import IBFData

__all__ = [
    "umulhi_u32",
    "fmix32_jnp",
    "kmer_codes_jnp",
    "block_offsets_jnp",
    "FilterStack",
]


def umulhi_u32(a: jnp.ndarray, b: jnp.ndarray | int) -> jnp.ndarray:
    """High 32 bits of a 32x32 unsigned multiply, via 16-bit limbs."""
    a = a.astype(jnp.uint32)
    b = jnp.asarray(b, dtype=jnp.uint32)
    mask = jnp.uint32(0xFFFF)
    al, ah = a & mask, a >> 16
    bl, bh = b & mask, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    t = (ll >> 16) + (lh & mask) + (hl & mask)
    return hh + (lh >> 16) + (hl >> 16) + (t >> 16)


def fmix32_jnp(z: jnp.ndarray) -> jnp.ndarray:
    """MurmurHash3 finalizer (matches hashing._fmix32)."""
    z = z.astype(jnp.uint32)
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> 13)
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    return z


def kmer_codes_jnp(reads: jnp.ndarray, k: int) -> jnp.ndarray:
    """(fwd, rc) base-5 window codes for a padded read batch.

    reads: [R, L] uint8 in {0..4} (padding value irrelevant — callers
    mask windows by length).  Returns uint32 [R, 2, L-k+1]; axis 1 is
    strand (0=fwd, 1=revcomp).
    """
    from readbouncer_tpu.ibf.hashing import POW5

    b = reads.astype(jnp.uint32)
    comp = jnp.where(b < 4, 3 - b, jnp.uint32(4))
    n = reads.shape[1] - k + 1
    fwd = jnp.zeros((reads.shape[0], n), dtype=jnp.uint32)
    rc = jnp.zeros((reads.shape[0], n), dtype=jnp.uint32)
    for t in range(k):
        fwd = fwd + b[:, t : t + n] * jnp.uint32(int(POW5[k - 1 - t]))
        rc = rc + comp[:, t : t + n] * jnp.uint32(int(POW5[t]))
    return jnp.stack([fwd, rc], axis=1)


def block_offsets_jnp(
    codes: jnp.ndarray, h: int, rows: int
) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """rbt2 (block, offset list) per code — device port of
    hashing.block_offsets_np (bit-identical; see ibf/hashing.py doc)."""
    n_blocks = rows // BLOCK_ROWS
    z0 = fmix32_jnp(codes * jnp.uint32(int(SEEDS[0])))
    block = umulhi_u32(z0, jnp.uint32(n_blocks))
    v = fmix32_jnp(codes * jnp.uint32(int(SEEDS[1])))
    offs = [v & jnp.uint32(7)]
    for i in range(1, h):
        t = (v >> jnp.uint32(3 * i)) % jnp.uint32(BLOCK_ROWS - i)
        prior = jnp.sort(jnp.stack(offs, axis=-1), axis=-1)
        for j in range(i):
            t = t + (t >= prior[..., j]).astype(jnp.uint32)
        offs.append(t)
    return block, offs


def _hash_rows_all_jnp(
    codes: jnp.ndarray, h: int, rows: int, scheme: str
) -> list[jnp.ndarray]:
    """Per-hash int32 row indices (list of h arrays shaped like codes)."""
    if scheme == "rbt2":
        block, offs = block_offsets_jnp(codes, h, rows)
        base = block * jnp.uint32(BLOCK_ROWS)
        return [(base + o).astype(jnp.int32) for o in offs]
    out = []
    for i in range(h):
        z = fmix32_jnp(codes * jnp.uint32(int(SEEDS[i])))
        out.append(umulhi_u32(z, jnp.uint32(rows)).astype(jnp.int32))
    return out


@dataclass(frozen=True)
class FilterSegment:
    """One filter's bin range inside a stacked bits matrix."""

    name: str
    bin_offset: int  # multiple of 64
    num_bins: int  # declared bins (max_matches scans only these)
    padded_bins: int


class FilterStack:
    """A set of compatible filters concatenated on the bin axis.

    Filters must share (kmer_size, hash_functions, rows).  Each filter
    keeps its own 64-padded bin block, so word offsets stay aligned; the
    reference's per-filter std::async fan-out
    (src/IBF/IBFClassify.cpp:256-259) becomes one batched device program
    over the concatenated bin axis.
    """

    def __init__(self, filters: list[IBFData], interpret: bool = False):
        if not filters:
            raise EmptyFilterError("FilterStack needs at least one filter")
        k = filters[0].kmer_size
        h = filters[0].hash_functions
        rows = filters[0].rows
        scheme = filters[0].scheme
        for f in filters:
            if (f.kmer_size, f.hash_functions, f.rows, f.scheme) != (k, h, rows, scheme):
                raise FilterGeometryError(
                    "all filters in a stack must share kmer_size/hash_functions/rows/scheme; "
                    f"got {(f.kmer_size, f.hash_functions, f.rows, f.scheme)} vs "
                    f"{(k, h, rows, scheme)}"
                )
        self.kmer_size = k
        self.hash_functions = h
        self.rows = rows
        self.scheme = scheme
        self.interpret = interpret
        self.segments: list[FilterSegment] = []
        off = 0
        mats = []
        for f in filters:
            self.segments.append(
                FilterSegment(f.name, off, f.num_bins, f.padded_bins)
            )
            off += f.padded_bins
            mats.append(f.bits)
        self.total_bins = off
        self.words = off // 32
        bits_np = np.concatenate(mats, axis=1)
        self.bits = jax.device_put(bits_np)
        # mask of scannable bins: within each segment, bins < declared
        bmask = np.zeros(self.total_bins, dtype=bool)
        for s in self.segments:
            bmask[s.bin_offset : s.bin_offset + s.num_bins] = True
        self.bin_mask = jax.device_put(bmask)
        self._seg_spec = tuple((s.bin_offset, s.padded_bins) for s in self.segments)

    @property
    def num_filters(self) -> int:
        return len(self.segments)

    def counts(self, reads: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """Per-bin match counts, int32 [R, 2, total_bins].

        Jitted at module level with static (k, h, rows) so stacks with the
        same geometry and batch shape share one compiled program.
        """
        return _counts_jit(
            self.bits,
            jnp.asarray(reads),
            jnp.asarray(lengths),
            k=self.kmer_size,
            h=self.hash_functions,
            rows=self.rows,
            scheme=self.scheme,
        )

    def max_counts(
        self, counts: jnp.ndarray, thresholds: jnp.ndarray
    ) -> jnp.ndarray:
        """Per-filter max matched count, int32 [R, F].

        thresholds: uint32 [R] effective per-read uint16-wrapped
        thresholds (classify.math.ci_and_threshold_batch).
        """
        return _max_counts_jit(
            counts, jnp.asarray(thresholds), self.bin_mask, segments=self._seg_spec
        )


_WINDOW_CHUNK = 128  # windows per scan step: bounds graph size and memory


def _add_planes(a: list, b: list) -> list:
    """Add two bit-plane numbers (lists of u32 arrays, little-endian).

    Element i of the result is bit i of the per-lane sum; one full adder
    per plane, vectorized over every array dimension.
    """
    out = []
    carry = None
    for j in range(max(len(a), len(b))):
        aj = a[j] if j < len(a) else None
        bj = b[j] if j < len(b) else None
        terms = [t for t in (aj, bj, carry) if t is not None]
        if len(terms) == 3:
            x, y, z = terms
            out.append(x ^ y ^ z)
            carry = (x & y) | (z & (x ^ y))
        elif len(terms) == 2:
            x, y = terms
            out.append(x ^ y)
            carry = x & y
        else:
            out.append(terms[0])
            carry = None
    if carry is not None:
        out.append(carry)
    return out


def _counts_impl(
    bits: jnp.ndarray,  # u32 [rows, W]
    reads: jnp.ndarray,  # u8  [R, L]
    lengths: jnp.ndarray,  # i32 [R]
    *,
    k: int,
    h: int,
    rows: int,
    scheme: str = "rbt1",
    accum: str | None = None,
) -> jnp.ndarray:
    """Per-bin window-match counts, int32 [R, 2, W*32].

    The per-bin accumulation is **bit-sliced**: instead of expanding every
    window's 32-bin membership word to 32 integer lanes (a [R,2,wc,W,32]
    intermediate whose HBM traffic dominates the kernel), counts are kept
    as packed bit planes [R,2,W] u32, expanded to integers once at the
    end.  The accumulator plane count is ceil(log2(L-k+2)) so counts are
    exact for any L.  Two equivalent accumulation strategies:

    * "ripple" — fold each window's membership word into the accumulator
      with a ripple-carry add (3 VPU ops per plane on tiny arrays).
      Fastest on TPU (measured), but the unrolled wc x n_planes scan body
      compiles slowly.
    * "tree" — vectorized binary carry-save adder tree over the window
      axis (log2(wc) levels, array halving per level), then one ripple
      add of the step sum.  ~50-op scan body, much faster to compile;
      the default on CPU where compile time dominates test runs.
    * "pallas" — the TPU production path: one scan-free XLA pass emits
      the masked AND-of-hashes membership words for every window
      ([W, n_pad, 2R] with reads on the lane axis), and a Pallas kernel
      (ops/ibf_count_pallas.py) does the per-bin accumulation with the
      counters VMEM-resident.  Default on TPU (~10x the XLA variants,
      whose accumulator state round-trips through HBM at every fusion
      boundary — see docs/PERF_NOTES.md).
    """
    R, L = reads.shape
    W = bits.shape[1]
    n = L - k + 1
    n_planes = max(int(n).bit_length(), 1)
    if accum is None:
        accum = "tree" if jax.default_backend() == "cpu" else "pallas"
    if accum == "pallas":
        return _counts_pallas(bits, reads, lengths, k=k, h=h, rows=rows, scheme=scheme)
    codes = kmer_codes_jnp(reads, k)  # [R, 2, n]
    n_valid = jnp.maximum(lengths - (k - 1), 0)  # [R]

    # power-of-two window block so the adder tree halves cleanly
    wc = min(_WINDOW_CHUNK, 1 << max(n - 1, 1).bit_length())
    n_pad = -(-n // wc) * wc
    codes = jnp.pad(codes, ((0, 0), (0, 0), (0, n_pad - n)))
    # [steps, R, 2, wc]
    codes = jnp.moveaxis(codes.reshape(R, 2, n_pad // wc, wc), 2, 0)

    def step(planes, inp):
        codes_c, base = inp  # [R, 2, wc], scalar window offset
        anded = None
        for ridx in _hash_rows_all_jnp(codes_c, h, rows, scheme):
            g = jnp.take(bits, ridx, axis=0)  # [R, 2, wc, W]
            anded = g if anded is None else (anded & g)
        win_idx = base + jnp.arange(wc, dtype=jnp.int32)  # [wc]
        valid = win_idx[None, :] < n_valid[:, None]  # [R, wc]
        anded = jnp.where(valid[:, None, :, None], anded, jnp.uint32(0))
        if accum == "ripple":
            for s in range(wc):
                carry = anded[:, :, s, :]  # [R, 2, W]
                new_planes = []
                for j in range(n_planes):
                    new_planes.append(planes[j] ^ carry)
                    carry = planes[j] & carry
                planes = tuple(new_planes)
            return planes, None
        # carry-save adder tree over the window axis: [R,2,m,W] halves
        # per level, planes grow by one bit per level
        tree = [anded]
        m = wc
        while m > 1:
            half = m // 2
            tree = _add_planes(
                [p[:, :, :half] for p in tree], [p[:, :, half:] for p in tree]
            )
            m = half
        step_sum = [p[:, :, 0, :] for p in tree]  # [R, 2, W] planes
        summed = _add_planes(list(planes), step_sum)[:n_planes]
        while len(summed) < n_planes:
            summed.append(jnp.zeros_like(planes[0]))
        return tuple(summed), None

    bases = jnp.arange(n_pad // wc, dtype=jnp.int32) * wc
    planes0 = tuple(
        jnp.zeros((R, 2, W), dtype=jnp.uint32) for _ in range(n_planes)
    )
    planes, _ = jax.lax.scan(step, planes0, (codes, bases))
    # expand the 8 packed planes to per-bin integer counts (once)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    counts = jnp.zeros((R, 2, W, 32), dtype=jnp.int32)
    for j in range(n_planes):
        bit = (planes[j][..., None] >> shifts) & jnp.uint32(1)
        counts = counts + (bit.astype(jnp.int32) << j)
    return counts.reshape(R, 2, W * 32)


def _counts_pallas(
    bits: jnp.ndarray,  # u32 [rows, W]
    reads: jnp.ndarray,  # u8  [R, L]
    lengths: jnp.ndarray,  # i32 [R]
    *,
    k: int,
    h: int,
    rows: int,
    scheme: str = "rbt1",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """counts via the Pallas accumulation kernel (see _counts_impl doc).

    The gather+AND stage is scheme-dependent and is the dominant cost
    (docs/PERF_NOTES.md):

    * rbt1 — h independent row gathers + AND.  Every row gather moves a
      full (8, 128) HBM tile on TPU, so this pays h tile fetches per
      window (measured 36.3 ms for the 2048x250 batch at realistic
      geometry on v5e).
    * rbt2 — ONE gather of the k-mer's 8-row block ([8, W] slice = the
      tile the hardware fetches anyway), then an AND-reduction over the
      8 block rows with non-selected rows masked to all-ones:
          anded = AND_s (g[s] | ~selected(s))
      where selected(s) = OR_i (offset_i == s).  This reads the gathered
      tile exactly once in one fused XLA consumer (a per-hash one-hot
      select would make the gather a producer of h consumers and risk
      fusion duplication — h gathers again).
    """
    if interpret is None:  # Mosaic kernels only compile for TPU backends
        interpret = jax.default_backend() == "cpu"
    R, L = reads.shape
    W = bits.shape[-1]
    n = L - k + 1
    anded = _anded_windows(bits, reads, lengths, k=k, h=h, rows=rows, scheme=scheme)

    # pad windows to a power-of-two block; the planes kernel consumes the
    # gather's natural [read-strand, window, word] layout (no transpose)
    from readbouncer_tpu.ops.ibf_count_pallas import (
        accumulate_planes_pallas,
        expand_planes,
    )

    n_pad = -(-n // 128) * 128 if n > 128 else (1 << max(n - 1, 1).bit_length())
    R2 = 2 * R
    a = anded.reshape(R2, n, W)
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, 0)))
    n_planes = max(int(n).bit_length(), 1)
    planes = accumulate_planes_pallas(a, n_planes, interpret=interpret)
    counts = expand_planes(planes)  # [R2, W*32] i32
    return counts.reshape(R, 2, W * 32)


def _anded_windows(
    bits: jnp.ndarray,
    reads: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    h: int,
    rows: int,
    scheme: str,
) -> jnp.ndarray:
    """Window-masked AND-of-h-hashes membership words [R, 2, n, W]."""
    R, L = reads.shape
    W = bits.shape[-1]
    n = L - k + 1
    codes = kmer_codes_jnp(reads, k)  # [R, 2, n]
    n_valid = jnp.maximum(lengths - (k - 1), 0)  # [R]

    if scheme == "rbt2":
        block, offs = block_offsets_jnp(codes, h, rows)
        # materialize indices before the gather: fused index expressions
        # make XLA's gather loop re-evaluate the hash per row (measured
        # +40% per-index cost — docs/PERF_NOTES.md)
        block = jax.lax.optimization_barrier(block)
        tab3 = bits.reshape(rows // BLOCK_ROWS, BLOCK_ROWS, W)
        # flat 1-D index gather (see the rbt1 branch note)
        g = jnp.take(tab3, block.astype(jnp.int32).reshape(-1), axis=0).reshape(
            R, 2, n, BLOCK_ROWS, W
        )
        s_idx = jnp.arange(BLOCK_ROWS, dtype=jnp.uint32)
        selected = None  # [R, 2, n, 8] — which block rows belong to this k-mer
        for o in offs:
            m = o[..., None] == s_idx
            selected = m if selected is None else (selected | m)
        masked = jnp.where(selected[..., None], g, jnp.uint32(0xFFFFFFFF))
        anded = masked[..., 0, :]
        for s in range(1, BLOCK_ROWS):
            anded = anded & masked[..., s, :]
    else:
        anded = None
        ridxs = jax.lax.optimization_barrier(
            _hash_rows_all_jnp(codes, h, rows, scheme)
        )
        for ridx in ridxs:
            # gather with FLAT 1-D indices: the same gather with
            # [R, 2, n]-shaped indices lowers to a 1.4-6x slower op
            # (scripts/gather_probe.py gprod vs g3; docs/PERF_NOTES.md)
            g = jnp.take(bits, ridx.reshape(-1), axis=0).reshape(
                R, 2, n, W
            )
            anded = g if anded is None else (anded & g)
    valid = jnp.arange(n, dtype=jnp.int32)[None, :] < n_valid[:, None]  # [R, n]
    return jnp.where(valid[:, None, :, None], anded, jnp.uint32(0))


def counts_planes_pallas(
    bits: jnp.ndarray,
    reads: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    h: int,
    rows: int,
    scheme: str = "rbt1",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Packed bit-plane counters [R2, n_planes, W] WITHOUT the integer
    expansion — the producer half of _counts_pallas, for consumers that
    reduce planes directly (ops.ibf_count_pallas.planes_dual_max_pallas
    — fusing expansion into the reduction deletes two full HBM passes
    over the 32x expanded counts tensor)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, L = reads.shape
    W = bits.shape[-1]
    n = L - k + 1
    anded = _anded_windows(bits, reads, lengths, k=k, h=h, rows=rows, scheme=scheme)

    from readbouncer_tpu.ops.ibf_count_pallas import accumulate_planes_pallas

    n_pad = -(-n // 128) * 128 if n > 128 else (1 << max(n - 1, 1).bit_length())
    a = anded.reshape(2 * R, n, W)
    if n_pad != n:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, 0)))
    n_planes = max(int(n).bit_length(), 1)
    return accumulate_planes_pallas(a, n_planes, interpret=interpret)


def _max_counts_impl(
    counts: jnp.ndarray,  # i32 [R, 2, B]
    thresholds: jnp.ndarray,  # u32 [R]
    bin_mask: jnp.ndarray,  # bool [B]
    *,
    segments: tuple[tuple[int, int], ...],
) -> jnp.ndarray:
    thr = thresholds.astype(jnp.int32)[:, None]  # [R, 1]; in [0, 65535]
    fwd = counts[:, 0, :]
    rc = counts[:, 1, :]
    matched = ((fwd >= thr) | (rc >= thr)) & bin_mask[None, :]
    cand = jnp.where(matched, jnp.maximum(fwd, rc), 0)  # [R, B]
    outs = []
    for off, padded in segments:
        outs.append(jnp.max(cand[:, off : off + padded], axis=1))
    return jnp.stack(outs, axis=1)  # [R, F]


_counts_jit = jax.jit(
    _counts_impl, static_argnames=("k", "h", "rows", "scheme", "accum")
)
_max_counts_jit = jax.jit(_max_counts_impl, static_argnames=("segments",))
