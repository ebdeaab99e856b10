#!/usr/bin/env python
"""One-experiment-per-invocation gather mechanics probe (TPU).

Usage: python scripts/gather_probe.py <exp> [--m M]
exps: g72 g128 tile tile_and g3 and3s
Persistent compilation cache keeps reruns cheap.
"""
import argparse
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


from _bench_util import sync, timeit  # noqa: E402


ROWS = 1_236_269


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp")
    ap.add_argument("--m", type=int, default=2048 * 2 * 238)
    args = ap.parse_args()
    M = args.m
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, ROWS, jnp.int32)

    if args.exp in ("g72", "g128"):
        W = 72 if args.exp == "g72" else 128
        tab = jax.random.bits(key, (ROWS, W), jnp.uint32)
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, idx)
        print(f"gather [rows,{W}] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s")
    elif args.exp == "tile":
        n_tiles = ROWS // 8
        tab3 = jax.random.bits(key, (n_tiles, 8, 72), jnp.uint32)
        tidx = jax.random.randint(key, (M,), 0, n_tiles, jnp.int32)
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab3, tidx)
        print(f"tile gather [tiles,8,72] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mtiles/s")
    elif args.exp == "tile_and":
        n_tiles = ROWS // 8
        tab3 = jax.random.bits(key, (n_tiles, 8, 72), jnp.uint32)
        tidx = jax.random.randint(key, (M,), 0, n_tiles, jnp.int32)
        g = jax.random.randint(key, (M, 3), 0, 8, jnp.int32)

        def tile_and(t, i, g):
            tiles = jnp.take(t, i, axis=0)  # [M, 8, W]
            outs = []
            for j in range(3):
                s = jax.nn.one_hot(g[:, j], 8, dtype=jnp.uint32)[:, :, None]
                outs.append(jnp.sum(tiles * s, axis=1))
            return outs[0] & outs[1] & outs[2]

        dt = timeit(jax.jit(tile_and), tab3, tidx, g)
        print(f"tile gather+select+AND M={M}: {dt*1e3:.2f} ms")
    elif args.exp in ("gpar2", "gpar4", "gpar8"):
        # split ONE gather into K independent gathers fused in one program:
        # g3 shows aggregate rate grows with concurrent gathers (80.6 vs
        # 62.5 Mrows/s) — find the concurrency ceiling
        K = int(args.exp[4:])
        tab = jax.random.bits(key, (ROWS, 72), jnp.uint32)
        parts = [
            jax.random.randint(jax.random.fold_in(key, j), (M // K,), 0, ROWS, jnp.int32)
            for j in range(K)
        ]

        def gpar(t, *idxs):
            return [jnp.take(t, i, axis=0) for i in idxs]

        dt = timeit(jax.jit(gpar), tab, *parts)
        print(f"{K}-way split gather M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s")
    elif args.exp == "g128h1":
        # h=1-sized table at full 128-lane rows: does lane alignment recover
        # the per-index cost on a multi-GB table?
        big_rows = ROWS * 8
        tab = jax.random.bits(key, (big_rows, 128), jnp.uint32)
        idxb = jax.random.randint(key, (M,), 0, big_rows, jnp.int32)
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, idxb)
        print(f"gather [8x rows,128] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s")
    elif args.exp == "g72h1":
        # single gather at h=1 table scale: the reference sizing formula at
        # h=1 gives ~99.5 bits/key -> 8x rows; tests whether per-index
        # gather cost survives a 2.9GB table (HBM reach/locality)
        big_rows = ROWS * 8
        tab = jax.random.bits(key, (big_rows, 72), jnp.uint32)
        idxb = jax.random.randint(key, (M,), 0, big_rows, jnp.int32)
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, idxb)
        print(f"gather [8x rows,72] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s")
    elif args.exp in ("gwide", "gwide_and"):
        # blocked table stored as ONE wide row per block: [n_blocks, 8*72];
        # if gather cost is per-index (not per-byte), this fetches a whole
        # 8-row block for the price of one row lookup
        n_blocks = ROWS // 8
        tabw = jax.random.bits(key, (n_blocks, 8 * 72), jnp.uint32)
        tidx = jax.random.randint(key, (M,), 0, n_blocks, jnp.int32)
        if args.exp == "gwide":
            dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tabw, tidx)
            print(f"wide gather [blocks,576] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mblk/s")
        else:
            g = jax.random.randint(key, (M, 3), 0, 8, jnp.int32)

            def wide_and(t, i, g):
                tiles = jnp.take(t, i, axis=0).reshape(M, 8, 72)
                sel = jnp.zeros((M, 8), jnp.bool_)
                for j in range(3):
                    sel = sel | (g[:, j : j + 1] == jnp.arange(8)[None, :])
                masked = jnp.where(sel[:, :, None], tiles, jnp.uint32(0xFFFFFFFF))
                out = masked[:, 0, :]
                for s in range(1, 8):
                    out = out & masked[:, s, :]
                return out

            dt = timeit(jax.jit(wide_and), tabw, tidx, g)
            print(f"wide gather+mask+AND M={M}: {dt*1e3:.2f} ms")
    elif args.exp in ("gwide1152", "gwide2304"):
        # rbt3 candidate: 16-row (or 32-row) blocks stored as ONE wide row;
        # a 2048x250 batch at stride-4 superwindows needs ~245k gathers
        lanes = 1152 if args.exp.endswith("1152") else 2304
        n_blocks = int(ROWS * 2.05) // 16  # h=2 s=4 sizing ~2.05x rbt1 rows
        tabw = jax.random.bits(key, (n_blocks, lanes), jnp.uint32)
        m = 245_000 if args.m == 2048 * 2 * 238 else args.m
        tidx = jax.random.randint(key, (m,), 0, n_blocks, jnp.int32)
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tabw, tidx)
        print(f"wide gather [blocks,{lanes}] M={m}: {dt*1e3:.2f} ms  "
              f"{m/dt/1e6:.2f} Mblk/s", flush=True)
    elif args.exp == "gsuper":
        # full rbt3 s=4 h=2 query compute: wide gather + per-window
        # 2-offset select + AND over 16 block rows -> anded [m, 4, 72]
        n_blocks = int(ROWS * 2.05) // 16
        tabw = jax.random.bits(key, (n_blocks, 1152), jnp.uint32)
        m = 245_000 if args.m == 2048 * 2 * 238 else args.m
        tidx = jax.random.randint(key, (m,), 0, n_blocks, jnp.int32)
        offs = jax.random.randint(key, (m, 4, 2), 0, 16, jnp.int32)

        def super_and(t, i, offs):
            g = jnp.take(t, i, axis=0).reshape(m, 16, 72)
            outs = []
            s_idx = jnp.arange(16, dtype=jnp.int32)
            for w in range(4):
                sel = (offs[:, w, 0:1] == s_idx) | (offs[:, w, 1:2] == s_idx)
                masked = jnp.where(sel[:, :, None], g, jnp.uint32(0xFFFFFFFF))
                out = masked[:, 0, :]
                for s in range(1, 16):
                    out = out & masked[:, s, :]
                outs.append(out)
            return jnp.stack(outs, axis=1)  # [m, 4, 72]

        dt = timeit(jax.jit(super_and), tabw, tidx, offs)
        print(f"rbt3 gather+select+AND M={m}: {dt*1e3:.2f} ms  "
              f"({4*m/dt/1e6:.1f} Mwindows/s)", flush=True)
    elif args.exp == "g144":
        # 2-row granularity: [rows/2, 144] — per-index cost vs payload probe
        tab = jax.random.bits(key, (ROWS // 2, 144), jnp.uint32)
        idx2 = jax.random.randint(key, (M,), 0, ROWS // 2, jnp.int32)
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, idx2)
        print(f"gather [rows/2,144] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s")
    elif args.exp in ("g72h1p2", "g128h1p2"):
        # h=1 realistic sizing (99.5 bits/key -> ~8x rows) split into TWO
        # concurrent gathers (the fwd/rc strands are independent): does
        # gather concurrency recover the big-table per-index degradation?
        W = 72 if "72" in args.exp else 128
        big_rows = ROWS * 8
        tab = jax.random.bits(key, (big_rows, W), jnp.uint32)
        parts = [
            jax.random.randint(jax.random.fold_in(key, j), (M // 2,), 0, big_rows, jnp.int32)
            for j in range(2)
        ]
        dt = timeit(jax.jit(lambda t, a, b: [jnp.take(t, a, axis=0), jnp.take(t, b, axis=0)]), tab, *parts)
        print(f"2-way h1 gather [8x rows,{W}] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s")
    elif args.exp == "g72h1p4":
        big_rows = ROWS * 8
        tab = jax.random.bits(key, (big_rows, 72), jnp.uint32)
        parts = [
            jax.random.randint(jax.random.fold_in(key, j), (M // 4,), 0, big_rows, jnp.int32)
            for j in range(4)
        ]
        dt = timeit(jax.jit(lambda t, *ix: [jnp.take(t, i, axis=0) for i in ix]), tab, *parts)
        print(f"4-way h1 gather [8x rows,72] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s")
    elif args.exp == "g2and":
        # h=2 sizing (18.98 bits/key -> 1.536x rows), 2 gathers + AND
        rows2 = int(ROWS * 1.536)
        tab = jax.random.bits(key, (rows2, 72), jnp.uint32)
        idx2 = jax.random.randint(key, (2, M), 0, rows2, jnp.int32)
        dt = timeit(
            jax.jit(lambda t, i: jnp.take(t, i[0], axis=0) & jnp.take(t, i[1], axis=0)),
            tab, idx2,
        )
        print(f"2x gather+AND [1.5x rows,72] M={M}: {dt*1e3:.2f} ms  {2*M/dt/1e6:.1f} Mrows/s")
    elif args.exp in ("gsort", "gsorth1"):
        # same gather with SORTED indices: is the cost per-index issue
        # overhead (sorted == unsorted) or memory locality (sorted wins)?
        rows = ROWS if args.exp == "gsort" else ROWS * 8
        tab = jax.random.bits(key, (rows, 72), jnp.uint32)
        idxs = jnp.sort(jax.random.randint(key, (M,), 0, rows, jnp.int32))
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tab, idxs)
        print(f"sorted gather [{rows},72] M={M}: {dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s")
    elif args.exp in ("gprod", "gprod_nobar", "gprod_idx"):
        # isolate the production counts-path overhead: today the in-situ
        # gather+AND measures ~61 ms while g3 (indices as inputs) is
        # ~36 ms.  Variants: full production subgraph (codes->hash->
        # barrier->gathers->AND->mask), same without the barrier, and
        # indices precomputed as program inputs.
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from readbouncer_tpu.ibf.query import (
            _hash_rows_all_jnp, kmer_codes_jnp,
        )

        R, cl, k, h = 2048, 250, 13, 3
        tab = jax.random.bits(key, (ROWS, 72), jnp.uint32)
        reads = jax.random.randint(key, (R, cl), 0, 4, jnp.int32).astype(jnp.uint8)
        lens = jnp.full((R,), cl, jnp.int32)
        n = cl - k + 1

        if args.exp == "gprod_idx":
            codes = kmer_codes_jnp(reads, k)
            ridxs = [np.asarray(r) for r in _hash_rows_all_jnp(codes, h, ROWS, "rbt1")]
            def f(t, i0, i1, i2, l):
                anded = jnp.take(t, i0, axis=0) & jnp.take(t, i1, axis=0) & jnp.take(t, i2, axis=0)
                valid = jnp.arange(n, dtype=jnp.int32)[None, :] < (l - (k - 1))[:, None]
                return jnp.where(valid[:, None, :, None], anded, jnp.uint32(0))
            dt = timeit(jax.jit(f), tab, *ridxs, lens)
        else:
            barrier = args.exp == "gprod"
            def f(t, r, l):
                codes = kmer_codes_jnp(r, k)
                ridxs = _hash_rows_all_jnp(codes, h, ROWS, "rbt1")
                if barrier:
                    ridxs = jax.lax.optimization_barrier(ridxs)
                anded = None
                for ridx in ridxs:
                    g = jnp.take(t, ridx, axis=0)
                    anded = g if anded is None else (anded & g)
                valid = jnp.arange(n, dtype=jnp.int32)[None, :] < (l - (k - 1))[:, None]
                return jnp.where(valid[:, None, :, None], anded, jnp.uint32(0))
            dt = timeit(jax.jit(f), tab, reads, lens)
        m3 = R * 2 * n * 3
        print(f"{args.exp} [2048x250 h=3]: {dt*1e3:.2f} ms  {m3/dt/1e6:.1f} Mrows/s")
    elif args.exp == "g3":
        tab = jax.random.bits(key, (ROWS, 72), jnp.uint32)
        idx3 = jax.random.randint(key, (3, M), 0, ROWS, jnp.int32)

        def g3(t, i):
            return (
                jnp.take(t, i[0], axis=0)
                & jnp.take(t, i[1], axis=0)
                & jnp.take(t, i[2], axis=0)
            )

        dt = timeit(jax.jit(g3), tab, idx3)
        print(f"3x gather+AND [rows,72] M={M}: {dt*1e3:.2f} ms  {3*M/dt/1e6:.1f} Mrows/s")
    else:
        raise SystemExit(f"unknown exp {args.exp}")


if __name__ == "__main__":
    main()
