"""Device-mesh construction for multi-chip runs.

The rebuild's two real parallel axes (SURVEY.md §2.2):

* ``data`` — read batches are data-parallel (the reference's
  classification worker threads, src/main/adaptive_sampling.hpp:745-751,
  recast as batch sharding), and the basecaller trains data-parallel.
* ``bins`` — the IBF's bin axis is the model/tensor-parallel axis (the
  reference's per-filter std::async fan-out, src/IBF/IBFClassify.cpp:
  256-259, generalized: bins shard across chips, partial per-bin counts
  merge over ICI).

No PP/EP/CP analog exists in this problem (SURVEY.md §5.7): per-read work
is bounded by prefix chunking, and the genome side scales by bins.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["parse_mesh_shape", "make_mesh", "DATA_AXIS", "BINS_AXIS"]

DATA_AXIS = "data"
BINS_AXIS = "bins"


def parse_mesh_shape(spec: str) -> dict[str, int]:
    """Parse a ``"data:4,bins:2"`` mesh spec (config key TPU.mesh_shape)."""
    out: dict[str, int] = {}
    if not spec:
        return out
    for part in spec.split(","):
        name, _, n = part.strip().partition(":")
        if not n:
            raise ValueError(f"mesh spec part {part!r} must be 'axis:count'")
        out[name.strip()] = int(n)
    return out


def make_mesh(
    shape: dict[str, int] | str | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default (no spec): all devices on the ``data`` axis with a size-1
    ``bins`` axis — pure data parallelism, the right default when every
    filter fits one chip's HBM (SURVEY.md §2.2 "replicated when small").
    """
    if isinstance(shape, str):
        shape = parse_mesh_shape(shape)
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not shape:
        shape = {DATA_AXIS: n, BINS_AXIS: 1}
    total = math.prod(shape.values())
    if total != n:
        raise ValueError(
            f"mesh shape {shape} needs {total} devices, have {n}"
        )
    dev_array = np.asarray(devices).reshape(tuple(shape.values()))
    return Mesh(dev_array, tuple(shape.keys()))
