"""Pallas TPU kernel for the IBF per-bin count accumulation.

Profiling on a real chip (scripts/proto_counts_layout.py and the
experiments logged in docs/PERF_NOTES.md) shows the IBF query splits
into two very different regimes:

* the Bloom row **gather + AND across hashes** is nearly free — XLA
  keeps the (tens-of-MB) bit table VMEM-resident and a 12.6M-row gather
  with fused AND measures ~0.2 ms;
* every XLA formulation of the **per-bin accumulation** (expanding each
  window's W membership words into W*32 per-bin 0/1 lanes and summing
  over windows) lands at 70-90 ms for the same shape, because the
  accumulator state round-trips through HBM at every fusion boundary.

This kernel fixes the second half: XLA still produces the masked,
AND-combined membership words for *all* windows in one shot (laid out
[W, n_pad, R2] so reads are the lane dimension), and a Pallas kernel
streams window blocks through VMEM, expanding bits and accumulating the
[W, 32, R2-block] int32 counts entirely on-chip.  The semantics match
ibf/query._counts_impl exactly (reference: seqan::count,
src/IBF/IBFClassify.cpp:97-98): every window of every read counted,
including N-containing k-mers, saturating far above any real count.

Layout contract:
  a_t  [W, n_pad, R2]  u32 — AND-of-h-hashes membership words, window-
                             masked (invalid windows zeroed), where
                             R2 = 2 * R (strand folded into the row axis)
  out  [W, 32, R2]     i32 — per-(word, bit, read-strand) counts;
                             bin b of read r strand s lives at
                             [b // 32, b % 32, r * 2 + s]... (callers use
                             the transposed reshape in counts_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["accumulate_counts_pallas"]

_WCB = 128  # windows per VMEM block
_R2B = 512  # read-strand lanes per VMEM block


def _count_kernel(a_ref, o_ref, *, wcb: int):
    """Accumulate bit-expanded window membership into per-bin counts.

    a_ref: [W, wcb, R2B] u32 block of membership words
    o_ref: [W, 32, R2B] i32 counts, revisited across the window grid dim
    """

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    a = a_ref[...]
    one = jnp.uint32(1)
    for p in range(32):
        col = ((a >> jnp.uint32(p)) & one).astype(jnp.int32)  # [W, wcb, R2B]
        o_ref[:, p, :] += jnp.sum(col, axis=1)


def accumulate_counts_pallas(a_t: jnp.ndarray, *, interpret: bool = False):
    """a_t [W, n_pad, R2] u32 -> counts [W, 32, R2] i32.

    n_pad must be a multiple of the window block and R2 a multiple of
    the lane block (callers pad; padded lanes/windows must be zero).
    """
    W, n_pad, R2 = a_t.shape
    wcb = min(_WCB, n_pad)
    r2b = min(_R2B, R2)
    if n_pad % wcb or R2 % r2b:
        raise ValueError(f"bad padding: {a_t.shape} vs blocks ({wcb}, {r2b})")
    grid = (R2 // r2b, n_pad // wcb)
    return pl.pallas_call(
        functools.partial(_count_kernel, wcb=wcb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, wcb, r2b), lambda r, w: (0, w, r)),
        ],
        out_specs=pl.BlockSpec((W, 32, r2b), lambda r, w: (0, 0, r)),
        out_shape=jax.ShapeDtypeStruct((W, 32, R2), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(a_t)
