#!/usr/bin/env python
"""Prototype layouts for the IBF count kernel (run on real TPU).

Compares per-call device time of count-kernel variants at the phase-A
bench shape (R=8192, L=250, W=8, rows=1.236M):

  ripple  — current production path (row gather, [R,2,wc,W] ripple)
  tree    — CSA tree over windows
  flat    — row gather, then reshape to [R,2,wc*W] and do the plane
            ripple at full lane utilization; wc-slot tree merge at end
  flatg   — element gather with flat [R,2,wc*W] indices (no 4D arrays)

All variants must agree exactly.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from readbouncer_tpu.ibf.hashing import SEEDS
from readbouncer_tpu.ibf.query import (
    _add_planes,
    _counts_impl,
    fmix32_jnp,
    kmer_codes_jnp,
    umulhi_u32,
)

R, L, W, ROWS, K, H = 8192, 250, 8, 1_236_269, 13, 3
WC = 128


def _flat_core(bits, reads, lengths, *, k, h, rows, elem_gather: bool):
    Rr, Ll = reads.shape
    Ww = bits.shape[1]
    n = Ll - k + 1
    n_planes = max(int(n).bit_length(), 1)
    codes = kmer_codes_jnp(reads, k)  # [R, 2, n]
    n_valid = jnp.maximum(lengths - (k - 1), 0)

    wc = min(WC, 1 << max(n - 1, 1).bit_length())
    n_pad = -(-n // wc) * wc
    codes = jnp.pad(codes, ((0, 0), (0, 0), (0, n_pad - n)))
    codes = jnp.moveaxis(codes.reshape(Rr, 2, n_pad // wc, wc), 2, 0)
    rows_u32 = jnp.uint32(rows)
    bits_flat = bits.reshape(-1)
    lane_off = jnp.tile(jnp.arange(Ww, dtype=jnp.int32), wc)  # [wc*W]

    def step(planes, inp):
        codes_c, base = inp  # [R, 2, wc]
        if elem_gather:
            anded = None
            for i in range(h):
                z = fmix32_jnp(codes_c * jnp.uint32(int(SEEDS[i])))
                ridx = umulhi_u32(z, rows_u32).astype(jnp.int32)
                idxf = (
                    jnp.repeat(ridx, Ww, axis=2) * Ww + lane_off[None, None, :]
                )  # [R, 2, wc*W]
                g = jnp.take(bits_flat, idxf, axis=0)
                anded = g if anded is None else (anded & g)
        else:
            anded4 = None
            for i in range(h):
                z = fmix32_jnp(codes_c * jnp.uint32(int(SEEDS[i])))
                ridx = umulhi_u32(z, rows_u32).astype(jnp.int32)
                g = jnp.take(bits, ridx, axis=0)  # [R, 2, wc, W]
                anded4 = g if anded4 is None else (anded4 & g)
            anded = anded4.reshape(Rr, 2, wc * Ww)
        win_idx = base + jnp.arange(wc, dtype=jnp.int32)
        valid = win_idx[None, :] < n_valid[:, None]  # [R, wc]
        validf = jnp.repeat(valid, Ww, axis=1)  # [R, wc*W]
        anded = jnp.where(validf[:, None, :], anded, jnp.uint32(0))
        # full-lane ripple: one 1-bit add into n_planes accumulator
        carry = anded
        new_planes = []
        for j in range(n_planes):
            new_planes.append(planes[j] ^ carry)
            carry = planes[j] & carry
        return tuple(new_planes), None

    bases = jnp.arange(n_pad // wc, dtype=jnp.int32) * wc
    planes0 = tuple(
        jnp.zeros((Rr, 2, wc * Ww), dtype=jnp.uint32) for _ in range(n_planes)
    )
    planes, _ = jax.lax.scan(step, planes0, (codes, bases))
    # merge the wc slots: CSA tree in plane domain
    tree = [p.reshape(Rr, 2, wc, Ww) for p in planes]
    m = wc
    while m > 1:
        half = m // 2
        tree = _add_planes(
            [p[:, :, :half] for p in tree], [p[:, :, half:] for p in tree]
        )
        m = half
    tot_planes = [p[:, :, 0, :] for p in tree]  # [R, 2, W]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    counts = jnp.zeros((Rr, 2, Ww, 32), dtype=jnp.int32)
    for j, p in enumerate(tot_planes):
        bit = (p[..., None] >> shifts) & jnp.uint32(1)
        counts = counts + (bit.astype(jnp.int32) << j)
    return counts.reshape(Rr, 2, Ww * 32)


def main() -> None:
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 1 << 32, size=(ROWS, W), dtype=np.uint32)
    reads = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lengths = np.full(R, L, dtype=np.int32)
    lengths[: R // 8] = 97  # some short reads exercise masking

    bits_d = jax.device_put(bits)
    reads_d = jax.device_put(reads)
    lens_d = jax.device_put(lengths)

    variants = {
        "ripple": jax.jit(
            partial(_counts_impl, k=K, h=H, rows=ROWS, accum="ripple")
        ),
        "tree": jax.jit(partial(_counts_impl, k=K, h=H, rows=ROWS, accum="tree")),
        "flat": jax.jit(partial(_flat_core, k=K, h=H, rows=ROWS, elem_gather=False)),
        "flatg": jax.jit(partial(_flat_core, k=K, h=H, rows=ROWS, elem_gather=True)),
    }
    ref = None
    for name, fn in variants.items():
        t0 = time.perf_counter()
        out = np.asarray(jax.block_until_ready(fn(bits_d, reads_d, lens_d)))
        t_compile = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn(bits_d, reads_d, lens_d))
        dt = (time.perf_counter() - t0) / reps
        if ref is None:
            ref = out
            match = "ref"
        else:
            match = "OK" if np.array_equal(out, ref) else "MISMATCH"
        print(f"{name:7s}: {dt*1e3:8.2f} ms/call  (compile+1st {t_compile:.1f}s)  {match}")


if __name__ == "__main__":
    main()
