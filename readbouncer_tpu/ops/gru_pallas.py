"""Pallas TPU kernel for the GRU recurrent scan.

The GRU forward (models/gru.py) hoists all input-side matmuls into big
MXU-friendly einsums; what remains is the sequential recurrence

    z = sigmoid(xg_z[t] + h Rz + bhz)
    r = sigmoid(xg_r[t] + h Rr + bhr)
    n = tanh  (xg_n[t] + r * (h Rn + bhn))
    h' = (1 - z) n + z h

which XLA runs as a lax.scan of tiny [B,H]x[H,·] matmuls — every step
round-trips h through HBM and pays per-step dispatch.  This kernel keeps
the carry h and the (small, ~60 KB) recurrent weights resident in VMEM
for the whole sequence and streams xg in [B_tile, T_chunk, 3H] blocks:

* grid = (B tiles, T chunks); the T dimension is sequential ("arbitrary")
  so the h scratch buffer legitimately carries state across T chunks,
* per timestep: two MXU matmuls ([B_tile,H]x[H,2H] and [B_tile,H]x[H,H])
  + VPU gate math, all on VMEM-resident data,
* the only HBM traffic is the unavoidable xg stream-in / ys stream-out.

Weight layout matches models/gru.py's per-layer params dict (w_zrn etc.).
Inference path only — training differentiates the XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gru_layer_pallas", "gru_logits_pallas"]


def _gru_kernel(xg_ref, r_zr_ref, b_hzr_ref, rn_ref, bhn_ref, out_ref, h_ref, *, t_chunk, hidden):
    """One (T_chunk, B_tile) block of the recurrence; h persists in VMEM.

    Layout is TIME-MAJOR: xg_ref [t_chunk, B_tile, 3H], out_ref
    [t_chunk, B_tile, H].  The per-step dynamic index then lands on the
    LEADING (block-offset) axis — indexing the time axis when it sat
    second-minor (sublane) cost a cross-sublane shuffle per batch row
    per step and made the whole forward ~50x slower (measured 676 ms
    for B=512, T=320 on v5e; docs/PERF_NOTES.md round-4).
    """
    H = hidden
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    r_zr = r_zr_ref[:]
    b_hzr = b_hzr_ref[:]
    rn = rn_ref[:]
    bhn = bhn_ref[:]

    def step(s, _):
        h = h_ref[:]
        xg_t = xg_ref[s]  # [B_tile, 3H]
        hzr = jnp.dot(h, r_zr, preferred_element_type=jnp.float32) + b_hzr
        z = jax.nn.sigmoid(xg_t[:, :H] + hzr[:, :H])
        r = jax.nn.sigmoid(xg_t[:, H : 2 * H] + hzr[:, H:])
        hn = jnp.dot(h, rn, preferred_element_type=jnp.float32) + bhn
        n = jnp.tanh(xg_t[:, 2 * H :] + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_ref[:] = h_new
        out_ref[s] = h_new
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)


def gru_layer_pallas(
    params: dict,
    xg: jnp.ndarray,  # [B, T, 3H] input-side gate contributions (+bias)
    *,
    b_tile: int = 256,
    t_chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run one GRU layer's recurrence; returns ys [B, T, H]."""
    B, T, threeH = xg.shape
    H = threeH // 3
    if B % b_tile != 0:
        b_tile = B  # small batches: single tile
    while T % t_chunk != 0:
        t_chunk //= 2  # T is a power-of-two multiple in practice
        if t_chunk == 0:
            raise ValueError(f"T={T} must be divisible by a power-of-two t_chunk")
    grid = (B // b_tile, T // t_chunk)
    kernel = functools.partial(_gru_kernel, t_chunk=t_chunk, hidden=H)
    ys_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (t_chunk, b_tile, threeH),
                lambda i, t: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((H, 2 * H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H,), lambda i, t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i, t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t_chunk, b_tile, H), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        jnp.swapaxes(xg, 0, 1).astype(jnp.float32),  # time-major
        params["r_zr"].astype(jnp.float32),
        params["b_hzr"].astype(jnp.float32),
        params["rn"].astype(jnp.float32),
        params["bhn"].astype(jnp.float32),
    )
    return jnp.swapaxes(ys_t, 0, 1)


def gru_logits_pallas(
    params: dict,
    frames: jnp.ndarray,
    *,
    precision: str = "default",
    interpret: bool = False,
) -> jnp.ndarray:
    """frames [B, T, window] -> CTC logits [B, T, 5].

    Same network as models/gru.gru_logits: input projection and
    per-layer input-side einsums on the MXU via XLA, recurrences via the
    Pallas kernel, alternating layer directions by flipping time.
    """
    x = (
        jnp.einsum(
            "bti,ih->bth",
            frames.astype(params["w_in"].dtype),
            params["w_in"],
            preferred_element_type=params["w_in"].dtype,
            precision=precision,
        )
        + params["b_in"]
    )
    for li, layer in enumerate(params["layers"]):
        if li % 2 == 1:
            x = jnp.flip(x, axis=1)
        xg = (
            jnp.einsum(
                "bti,ig->btg",
                x,
                layer["w_zrn"],
                preferred_element_type=x.dtype,
                precision=precision,
            )
            + layer["b_zrn"]
        )
        x = gru_layer_pallas(layer, xg, interpret=interpret)
        if li % 2 == 1:
            x = jnp.flip(x, axis=1)
    return (
        jnp.einsum(
            "bth,ho->bto",
            x,
            params["w_out"],
            preferred_element_type=x.dtype,
            precision=precision,
        )
        + params["b_out"]
    )
