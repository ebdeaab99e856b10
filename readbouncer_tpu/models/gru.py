"""Batched JAX GRU basecaller (DeepNano-blitz nets, TPU-first).

Replaces the reference's prebuilt Rust deepnano2 + MKL basecaller
(reference: src/basecaller/DeepNano/*, C ABI in DeepNano2.h:8-36) with a
pure-JAX network over the same weight files:

* **signal framing**: per-read median/MAD normalization, then overlapping
  windows of ``input_features`` (66) samples with stride ``frame_stride``
  — the framing is our documented design (the Rust featurizer is
  source-less); see docs/BASECALLER.md.
* **input-side matmuls hoisted**: the input projection and all per-layer
  input-gate contributions are computed for every timestep in large
  ``[B*T, H] x [H, H]`` MXU matmuls *before* the scan; the recurrent scan
  only does three ``[B, H] x [H, H]`` matmuls per step.
* **alternating directions**: consecutive layers process the sequence in
  opposite directions (cheap bidirectionality) — implemented by flipping
  the time axis between layers.
* output: per-step logits over 5 CTC symbols (blank + ACGT).

The whole forward is one jittable function of static (T, H); batches are
padded to fixed shapes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from readbouncer_tpu.models.weights import GRUWeights

__all__ = ["GRUBasecallerModel", "frame_signal", "med_mad_normalize"]


def med_mad_normalize(signal: np.ndarray) -> np.ndarray:
    """Per-read median / MAD scaling of the raw current signal."""
    signal = np.asarray(signal, dtype=np.float32)
    med = np.median(signal)
    mad = np.median(np.abs(signal - med)) + 1e-6
    return (signal - med) / mad


def frame_signal(
    signal: np.ndarray, window: int = 66, stride: int = 5, max_frames: int | None = None
) -> np.ndarray:
    """Normalized signal -> [T, window] overlapping frames (host side)."""
    signal = np.asarray(signal, dtype=np.float32)
    if signal.shape[0] < window:
        signal = np.pad(signal, (0, window - signal.shape[0]))
    n = (signal.shape[0] - window) // stride + 1
    if max_frames is not None:
        n = min(n, max_frames)
    idx = np.arange(window)[None, :] + stride * np.arange(n)[:, None]
    return signal[idx]


def frame_signal_jnp(sig: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """Device framing: [B, S] normalized signal -> [B, T, window].

    Host framing amplifies the upload ``window/stride`` = 13.2x (every
    sample appears in ~13 overlapping windows); a 512-chunk live tick
    would ship 42 MB of frames over the tunnel vs 3.4 MB of signal
    (measured 610 ms vs ~40 ms — docs/PERF_NOTES.md round-4).  The
    window gather is ``window`` strided slices, fused by XLA.
    """
    B, S = sig.shape
    T = (S - window) // stride + 1
    cols = [sig[:, w : w + stride * (T - 1) + 1 : stride] for w in range(window)]
    return jnp.stack(cols, axis=2)  # [B, T, window]


@dataclass
class GRUBasecallerModel:
    """Holds device weights + jitted forward.

    ``precision`` controls MXU matmul precision: "highest" (f32, exact,
    batch-invariant) or "default" (bf16 multiplies, faster).  The TPU
    default drifts between batch shapes; "highest" keeps
    batched == single bit-for-bit behavior within f32.
    """

    weights: GRUWeights | None
    frame_stride: int = 5
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    # "xla" = lax.scan recurrence; "pallas" = VMEM-resident Pallas kernel
    # (ops/gru_pallas.py); "auto" picks pallas on TPU backends
    backend: str = "auto"
    # pre-built param pytree (trained nets via weights.load_params_npz);
    # overrides `weights` when given
    params_in: dict | None = None

    def __post_init__(self):
        if self.params_in is not None:
            dt = self.dtype
            self.params = jax.tree.map(lambda v: jnp.asarray(v, dt), self.params_in)
            self._finish_init()
            return
        w = self.weights
        dt = self.dtype
        self.params = {
            "w_in": jnp.asarray(w.w_in, dt),
            "b_in": jnp.asarray(w.b_in, dt),
            "w_out": jnp.asarray(w.w_out, dt),
            "b_out": jnp.asarray(w.b_out, dt),
            "layers": [
                {
                    # input-side gate kernels fused: [H, 3H] (z, r, n)
                    "w_zrn": jnp.asarray(
                        np.concatenate([l.wz, l.wr, l.wn], axis=1), dt
                    ),
                    "b_zrn": jnp.asarray(
                        np.concatenate([l.biz, l.bir, l.bin_]), dt
                    ),
                    "r_zr": jnp.asarray(np.concatenate([l.rz, l.rr], axis=1), dt),
                    "b_hzr": jnp.asarray(np.concatenate([l.bhz, l.bhr]), dt),
                    "rn": jnp.asarray(l.rn, dt),
                    "bhn": jnp.asarray(l.bhn, dt),
                }
                for l in w.layers
            ],
        }
        self._finish_init()

    def _finish_init(self):
        backend = self.backend
        if backend == "auto":
            backend = (
                "pallas" if jax.default_backend() not in ("cpu",) else "xla"
            )
        if backend == "pallas":
            from readbouncer_tpu.ops.gru_pallas import gru_logits_pallas

            fwd = functools.partial(
                gru_logits_pallas, self.params, precision=self.precision
            )
        else:
            fwd = functools.partial(
                gru_logits, self.params, precision=self.precision
            )
        # XLA stack-allocates whole pallas operands/results in its scoped
        # VMEM budget (default 16 MB) and OOMs at compile time for
        # B >= 128, T = 320 — raise the budget on TPU backends
        # (docs/PERF_NOTES.md round-4)
        opts = (
            {"xla_tpu_scoped_vmem_limit_kib": 65536}
            if backend == "pallas"
            else None
        )
        self._logits = jax.jit(fwd, compiler_options=opts)

        def tokens(sig):  # [B, S] normalized signal -> argmax ids [B, T]
            # ships as f16 (normalized values are ±8 MAD units; the
            # ~1e-3 rounding is far under the pore noise) — halves the
            # tick upload.  Token ids are 0..4, so they cross back as
            # uint8: a full 512-chunk tick fetches 164 KB instead of
            # 655 KB of i32 through the wire-serialized tunnel
            frames = frame_signal_jnp(
                sig.astype(jnp.float32), self.window, self.frame_stride
            )
            return jnp.argmax(fwd(frames), axis=-1).astype(jnp.uint8)

        self._tokens = jax.jit(tokens, compiler_options=opts)

    @property
    def hidden(self) -> int:
        return int(self.params["w_in"].shape[1])

    @property
    def window(self) -> int:
        return int(self.params["w_in"].shape[0])

    def logits(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames [B, T, window] -> CTC logits [B, T, 5]."""
        return self._logits(frames)

    def tokens_from_signal(self, sig) -> jnp.ndarray:
        """Normalized signal [B, S] -> greedy argmax ids [B, T] on
        device (framing + forward + argmax in one program; only the
        tiny token array crosses back to the host)."""
        return self._tokens(jnp.asarray(sig))


def _gru_layer(params: dict, x: jnp.ndarray, precision) -> jnp.ndarray:
    """One GRU layer over [B, T, H] -> [B, T, H].

    CuDNN/reset_after form:
        z = sigmoid(x Wz + biz + h Rz + bhz)
        r = sigmoid(x Wr + bir + h Rr + bhr)
        n = tanh  (x Wn + bin + r * (h Rn + bhn))
        h' = (1 - z) * n + z * h
    """
    B, T, H = x.shape
    # hoist all input-side contributions into one big MXU matmul
    xg = (
        jnp.einsum(
            "bti,ig->btg",
            x,
            params["w_zrn"],
            preferred_element_type=x.dtype,
            precision=precision,
        )
        + params["b_zrn"]
    )  # [B, T, 3H]

    def step(h, xg_t):
        hzr = (
            jnp.dot(h, params["r_zr"], preferred_element_type=h.dtype, precision=precision)
            + params["b_hzr"]
        )  # [B, 2H]
        z = jax.nn.sigmoid(xg_t[:, :H] + hzr[:, :H])
        r = jax.nn.sigmoid(xg_t[:, H : 2 * H] + hzr[:, H:])
        hn = (
            jnp.dot(h, params["rn"], preferred_element_type=h.dtype, precision=precision)
            + params["bhn"]
        )
        n = jnp.tanh(xg_t[:, 2 * H :] + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((B, H), dtype=x.dtype)
    _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xg, 0, 1))  # [T, B, H]
    return jnp.swapaxes(ys, 0, 1)


def gru_logits(
    params: dict, frames: jnp.ndarray, precision: str = "highest"
) -> jnp.ndarray:
    """frames [B, T, window] -> logits [B, T, 5]."""
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
        x = _gru_layer(layer, x, precision)
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
