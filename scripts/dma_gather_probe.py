#!/usr/bin/env python
"""Hand-rolled Pallas DMA gather vs the XLA gather engine (TPU probe).

The round-3 speed-of-light study (docs/PERF_NOTES.md) proved the IBF
count kernel is capped by the XLA gather engine (~80 M rows/s for the
fused 3-gather+AND; 12-16 ns/index) — but only for formulations THROUGH
that engine.  This probe measures the one scheme never tried: streaming
Bloom rows via explicit double-buffered async HBM->VMEM copies driven by
an on-chip index array (pallas_guide.md "Async DMA" + "Double
Buffering"), bypassing the gather engine entirely.

Experiments (one per invocation, like scripts/gather_probe.py):

  dma_block   one (8, W) block DMA per index (rbt2 geometry: a k-mer's
              h rows live in one 8-row block -> 1 descriptor serves 3
              row lookups), NBUF-deep in-flight pipeline, XOR-consume
  dma_row     one (W,) row DMA per index (rbt1 geometry: 3 descriptors
              per k-mer)
  xla_block   the same block workload through jnp.take (baseline, same
              session so tunnel variance cancels)
  xla_g3      the production 3x flat gather + AND baseline (g3 of
              gather_probe.py)

Correctness: --check runs a small-M pass and compares the XOR
accumulator against numpy.

The verdict question this answers: raw tile traffic for the realistic
batch is ~0.6-0.7 s at 819 GB/s while the engine floor is 1.83 s — can
explicit DMA descriptors beat the engine's per-index cost, or is the
descriptor/issue rate the same wall?  Either way the measured ns/row
goes into docs/PERF_NOTES.md (reference hot loop:
/root/reference/src/IBF/IBFClassify.cpp:97-98).
"""

import argparse
import functools
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1_236_269  # realistic rbt1 sizing (docs/PERF_NOTES.md)
W = 72  # words per row at the realistic 4-filter stack


from _bench_util import sync, timeit  # noqa: E402


def _dma_gather_kernel(
    CH: int, NBUF: int, BR: int, WD: int, idx_hbm, tab_hbm, out_ref, idx_smem, blk, sem_idx, sem_blk
):
    """Grid step: DMA CH indices' (BR, W) slices through an NBUF-deep
    software pipeline, XOR-consuming each into a VMEM accumulator."""
    step = pl.program_id(0)
    # idx ships as [grid, CH] so each step DMAs one full row (1-D HBM
    # slices must align to 256-element tiles; full rows always do)
    cp_idx = pltpu.make_async_copy(idx_hbm.at[step], idx_smem, sem_idx)
    cp_idx.start()

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    cp_idx = pltpu.make_async_copy(idx_hbm.at[step], idx_smem, sem_idx)
    cp_idx.wait()

    def dma(j, slot):
        return pltpu.make_async_copy(
            tab_hbm.at[idx_smem[j]], blk.at[slot], sem_blk.at[slot]
        )

    for j in range(NBUF):  # prologue: fill the pipeline
        dma(j, j).start()

    U = 4  # manual unroll: amortize loop overhead over 4 DMA issues
    assert CH % U == 0 and NBUF % U == 0

    def body(g, acc):
        j0 = g * U
        for u in range(U):
            j = j0 + u
            slot = jax.lax.rem(j, NBUF)
            dma(j, slot).wait()

            @pl.when(j + NBUF < CH)
            def _():
                dma(j + NBUF, slot).start()

            acc = acc ^ blk[slot]
        return acc

    acc = jax.lax.fori_loop(0, CH // U, body, jnp.zeros((BR, WD), jnp.uint32))
    out_ref[...] ^= acc


def dma_gather(tab: jnp.ndarray, idx: jnp.ndarray, CH: int, NBUF: int):
    """XOR of tab[idx] via explicit DMA pipeline; tab [N, BR, W] u32."""
    M = idx.shape[0]
    assert M % CH == 0, (M, CH)
    idx = idx.reshape(M // CH, CH)
    BR, WD = tab.shape[1], tab.shape[2]
    kernel = functools.partial(_dma_gather_kernel, CH, NBUF, BR, WD)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(M // CH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # idx stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # tab stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (BR, WD), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((CH,), jnp.int32),
            pltpu.VMEM((NBUF, BR, WD), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BR, WD), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(idx, tab)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp")
    ap.add_argument("--m", type=int, default=2048 * 2 * 238)  # 974,848
    ap.add_argument("--ch", type=int, default=2048)
    ap.add_argument("--nbuf", type=int, default=8)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)

    if args.check:
        # small correctness pass (works on TPU and under interpret/CPU)
        n_blocks, m, ch, nbuf = 1024, 512, 128, 4  # CH >= 128 (lane tiling)
        tabs = jax.random.bits(key, (n_blocks, 8, 128), jnp.uint32)
        idx = jax.random.randint(key, (m,), 0, n_blocks, jnp.int32)
        out = np.asarray(dma_gather(tabs, idx, ch, nbuf))
        expect = np.bitwise_xor.reduce(np.asarray(tabs)[np.asarray(idx)], axis=0)
        np.testing.assert_array_equal(out, expect)
        print("dma_gather check OK")
        return

    M = -(-args.m // args.ch) * args.ch
    if args.exp == "dma_block":
        # DMA slices need 128-aligned lane dims: pad W 72 -> 128 (extra
        # bytes are free — the descriptor rate, not traffic, is the
        # candidate wall; a production table would ship 128-word rows)
        n_blocks = ROWS // 8
        tab = jax.random.bits(key, (n_blocks, 8, 128), jnp.uint32)
        idx = jax.random.randint(key, (M,), 0, n_blocks, jnp.int32)
        fn = jax.jit(lambda t, i: dma_gather(t, i, args.ch, args.nbuf))
        dt = timeit(fn, tab, idx)
        print(
            f"dma_block [blocks,8,{W}] M={M} CH={args.ch} NBUF={args.nbuf}: "
            f"{dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mblk/s  "
            f"({dt/M*1e9:.1f} ns/blk; 1 blk serves h=3 rows -> "
            f"{3*M/dt/1e6:.1f} eff Mrows/s)"
        )
    elif args.exp == "dma_row":
        tab = jax.random.bits(key, (ROWS, 1, 128), jnp.uint32)
        idx = jax.random.randint(key, (M,), 0, ROWS, jnp.int32)
        fn = jax.jit(lambda t, i: dma_gather(t, i, args.ch, args.nbuf))
        dt = timeit(fn, tab, idx)
        print(
            f"dma_row [rows,1,{W}] M={M} CH={args.ch} NBUF={args.nbuf}: "
            f"{dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s  ({dt/M*1e9:.1f} ns/row)"
        )
    elif args.exp == "xla_block":
        n_blocks = ROWS // 8
        tab = jax.random.bits(key, (n_blocks, 8, W), jnp.uint32)
        idx = jax.random.randint(key, (M,), 0, n_blocks, jnp.int32)
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, idx)
        print(
            f"xla_block [blocks,8,{W}] M={M}: {dt*1e3:.2f} ms  "
            f"{M/dt/1e6:.1f} Mblk/s"
        )
    elif args.exp == "xla_g3":
        tab = jax.random.bits(key, (ROWS, W), jnp.uint32)
        idx3 = jax.random.randint(key, (3, M), 0, ROWS, jnp.int32)

        def g3(t, i):
            return (
                jnp.take(t, i[0], axis=0)
                & jnp.take(t, i[1], axis=0)
                & jnp.take(t, i[2], axis=0)
            )

        dt = timeit(jax.jit(g3), tab, idx3)
        print(
            f"xla_g3 [rows,{W}] M={M}: {dt*1e3:.2f} ms  {3*M/dt/1e6:.1f} Mrows/s"
        )
    else:
        raise SystemExit(f"unknown exp {args.exp}")


if __name__ == "__main__":
    main()
