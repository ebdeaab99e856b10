"""CTC training for the GRU basecaller (data-parallel over the mesh).

The reference ships pretrained nets only (src/weights/rnn*.txt, consumed
through the prebuilt Rust library); the rebuild adds a first-class
trainer so nets for new chemistries can be produced on TPU: one jitted
step = forward (models/gru.py) -> optax CTC loss -> grads -> optimizer
update.  Multi-chip: params replicated, batch sharded on the ``data``
mesh axis — XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from readbouncer_tpu.models.gru import gru_logits
from readbouncer_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "init_gru_params",
    "ctc_loss",
    "make_train_step",
    "make_sharded_train_step",
]


def init_gru_params(
    key: jax.Array,
    hidden: int = 48,
    window: int = 66,
    num_layers: int = 4,
    num_symbols: int = 5,
    dtype=jnp.float32,
) -> dict:
    """Random params in the exact pytree layout gru_logits consumes
    (the layout GRUBasecallerModel builds from rnn*.txt weight files)."""
    H = hidden
    ks = jax.random.split(key, 3 + num_layers)

    def glorot(k, shape):
        scale = jnp.sqrt(2.0 / (shape[0] + shape[1]))
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    layers = []
    for i in range(num_layers):
        lk = jax.random.split(ks[3 + i], 3)
        layers.append(
            {
                "w_zrn": glorot(lk[0], (H, 3 * H)),
                "b_zrn": jnp.zeros((3 * H,), dtype),
                "r_zr": glorot(lk[1], (H, 2 * H)),
                "b_hzr": jnp.zeros((2 * H,), dtype),
                "rn": glorot(lk[2], (H, H)),
                "bhn": jnp.zeros((H,), dtype),
            }
        )
    return {
        "w_in": glorot(ks[0], (window, H)),
        "b_in": jnp.zeros((H,), dtype),
        "w_out": glorot(ks[1], (H, num_symbols)),
        "b_out": jnp.zeros((num_symbols,), dtype),
        "layers": layers,
    }


def ctc_loss(
    params: dict,
    frames: jnp.ndarray,  # [B, T, window] f32
    frame_lengths: jnp.ndarray,  # [B] i32
    labels: jnp.ndarray,  # [B, Lmax] i32 in 1..4 (0 = blank is never a label)
    label_lengths: jnp.ndarray,  # [B] i32
    precision: str = "default",
) -> jnp.ndarray:
    """Mean CTC loss over the batch (blank id 0, matching models/ctc.py)."""
    logits = gru_logits(params, frames, precision=precision)
    T = frames.shape[1]
    L = labels.shape[1]
    t_idx = jnp.arange(T)[None, :]
    l_idx = jnp.arange(L)[None, :]
    logit_pad = (t_idx >= frame_lengths[:, None]).astype(logits.dtype)
    label_pad = (l_idx >= label_lengths[:, None]).astype(logits.dtype)
    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=0)
    denom = jnp.maximum(label_lengths.astype(logits.dtype), 1.0)
    return jnp.mean(per_seq / denom)


def _train_step(params, opt_state, batch, *, optimizer, precision):
    frames, frame_lengths, labels, label_lengths = batch
    loss, grads = jax.value_and_grad(ctc_loss)(
        params, frames, frame_lengths, labels, label_lengths, precision
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_train_step(optimizer: optax.GradientTransformation, precision: str = "default"):
    """Single-chip jitted train step: (params, opt_state, batch) -> same + loss."""
    return jax.jit(
        functools.partial(_train_step, optimizer=optimizer, precision=precision),
        donate_argnums=(0, 1),
    )


def make_sharded_train_step(
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    precision: str = "default",
):
    """Data-parallel train step over *mesh*: params/opt_state replicated,
    batch sharded on the ``data`` axis; XLA all-reduces grads over ICI."""
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    batch_sh = (
        NamedSharding(mesh, P(DATA_AXIS, None, None)),  # frames
        bsh,  # frame_lengths
        NamedSharding(mesh, P(DATA_AXIS, None)),  # labels
        bsh,  # label_lengths
    )
    return jax.jit(
        functools.partial(_train_step, optimizer=optimizer, precision=precision),
        in_shardings=(repl, repl, batch_sh),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def synthetic_ctc_batch(
    rng: np.random.Generator,
    batch: int,
    frames_t: int,
    window: int = 66,
    max_label: int = 24,
):
    """Random (frames, frame_lengths, labels, label_lengths) batch —
    fixture for smoke tests and the multi-chip dryrun."""
    frames = rng.standard_normal((batch, frames_t, window), dtype=np.float32)
    frame_lengths = np.full((batch,), frames_t, dtype=np.int32)
    label_lengths = rng.integers(4, max_label + 1, size=batch).astype(np.int32)
    labels = rng.integers(1, 5, size=(batch, max_label)).astype(np.int32)
    labels[np.arange(max_label)[None, :] >= label_lengths[:, None]] = 0
    return frames, frame_lengths, labels, label_lengths
