#!/usr/bin/env python
"""Per-batch k-mer dedup vs the gather wall (VERDICT r4 next #2).

The speed-of-light argument (docs/PERF_NOTES.md) fixes the WINDOW count,
not the unique-CODE count: duplicate k-mers within a batch pay the
per-row gather price repeatedly.  A dedup pass would gather Bloom rows
once per UNIQUE code (3 gathers + AND -> anded[U, W]) and then expand
per window via an inverse-map gather (1 lookup/window):

    cost_baseline = 3*M lookups
    cost_dedup    = 3*U + M lookups (+ host unique pass)

so dedup wins iff the dup fraction d = 1 - U/M > 1/3 AND the inverse-map
gather (whose index array is a program INPUT, not computed in-program)
runs at engine speed — docs/PERF_NOTES.md reading #2 measured SHAPED
input indices at 13.2 M rows/s (6x under computed flat indices), so the
flat-input-index rate is the make-or-break number this probe measures.

Experiments (one per invocation, like gather_probe.py):
  invgather [--u U]   raw take(anded[U,72], inv_input[M]) rate
  counts --dup D      baseline vs dedup counts-shaped pipeline at dup
                      level D in [0,1) (host np.unique time reported
                      separately — it overlaps device compute in the
                      production pipeline)
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

ROWS = 1_236_269
W = 72
M = 2048 * 2 * 238  # windows x strands of a 2048-chunk batch

SEEDS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D)


from _bench_util import sync, timeit  # noqa: E402 (shared tunnel-safe timing)


def bloom_and(tab, codes):
    """3 flat gathers (indices computed in-program) + AND -> [N, W]
    (the library's device hash: ibf.query fmix32_jnp + umulhi_u32)."""
    from readbouncer_tpu.ibf.query import fmix32_jnp, umulhi_u32

    out = None
    for s in SEEDS:
        rows = umulhi_u32(fmix32_jnp(codes * jnp.uint32(s)), ROWS)
        g = jnp.take(tab, rows.astype(jnp.int32), axis=0)
        out = g if out is None else (out & g)
    return out


def synth_codes(rng, m, dup):
    """m u32 codes with ~dup duplicate fraction (pool sampling)."""
    u = max(1, int(m * (1.0 - dup)))
    pool = rng.integers(0, 1 << 32, size=u, dtype=np.uint64).astype(np.uint32)
    return pool[rng.integers(0, u, size=m)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["invgather", "counts"])
    ap.add_argument("--u", type=int, default=262_144)
    ap.add_argument("--dup", type=float, default=0.5)
    args = ap.parse_args()
    rng = np.random.default_rng(3)

    if args.exp == "invgather":
        U = args.u
        anded = jnp.asarray(
            rng.integers(0, 1 << 32, size=(U, W), dtype=np.uint64).astype(np.uint32)
        )
        inv = jnp.asarray(rng.integers(0, U, size=M).astype(np.int32))
        dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), anded, inv)
        print(
            f"invgather [U={U},{W}] M={M} (input flat idx): "
            f"{dt*1e3:.2f} ms  {M/dt/1e6:.1f} Mrows/s"
        )
        return

    # counts-shaped pipeline at a controlled dup level
    codes_np = synth_codes(rng, M, args.dup)
    tab = jnp.asarray(
        rng.integers(0, 1 << 32, size=(ROWS, W), dtype=np.uint64).astype(np.uint32)
    )
    codes = jnp.asarray(codes_np)

    base = jax.jit(lambda t, c: bloom_and(t, c).sum(axis=0))
    dt_base = timeit(base, tab, codes)
    print(
        f"baseline 3-gather+AND M={M}: {dt_base*1e3:.2f} ms "
        f"({3*M/dt_base/1e6:.1f} Mrows/s agg)"
    )

    # host unique pass (np.unique; a native hash pass would be faster —
    # measured separately because it overlaps device compute in the
    # pipelined engine)
    t0 = time.perf_counter()
    ucodes_np, inv_np = np.unique(codes_np, return_inverse=True)
    t_unique = time.perf_counter() - t0
    U = ucodes_np.size
    # pow2 bucket so program shape is dup-level independent
    U_pad = 1 << (U - 1).bit_length()
    ucodes_pad = np.zeros(U_pad, dtype=np.uint32)
    ucodes_pad[:U] = ucodes_np
    print(
        f"dup={args.dup:.2f}: unique {U}/{M} ({1-U/M:.2%} dup), "
        f"np.unique {t_unique*1e3:.1f} ms, U_pad={U_pad}"
    )

    dedup = jax.jit(
        lambda t, uc, iv: jnp.take(bloom_and(t, uc), iv, axis=0).sum(axis=0)
    )
    dt_dedup = timeit(
        dedup, tab, jnp.asarray(ucodes_pad), jnp.asarray(inv_np.astype(np.int32))
    )
    print(
        f"dedup 3-gather[U_pad={U_pad}]+AND+invgather: {dt_dedup*1e3:.2f} ms "
        f"(vs baseline {dt_base*1e3:.2f} ms -> {dt_base/dt_dedup:.2f}x)"
    )
    # equality spot check (sum over windows is permutation-invariant)
    a = np.asarray(base(tab, codes))
    b = np.asarray(dedup(tab, jnp.asarray(ucodes_pad), jnp.asarray(inv_np.astype(np.int32))))
    np.testing.assert_array_equal(a, b)
    print("decision-exactness: expanded sums equal baseline sums")


if __name__ == "__main__":
    main()
