"""Sharded IBF classification: bins tensor-parallel, reads data-parallel.

The single-chip query program (ibf/query.py) becomes multi-chip purely
through sharding annotations — XLA GSPMD inserts the collectives:

* the bit matrix ``bits[rows, W]`` shards on its word axis over ``bins``
  (each chip holds a contiguous 64-bin-aligned block of every hash row;
  the row gather is chip-local because hash rows index axis 0),
* reads/lengths/thresholds shard on the batch axis over ``data``,
* per-bin counts come out sharded on both axes; the per-filter segment
  max in ``max_counts`` triggers an ICI reduce across the ``bins`` axis
  (the rebuild's analog of merging the reference's per-filter async
  results, src/IBF/IBFClassify.cpp:256-273).

This replaces the reference's thread-level parallelism (SURVEY.md §2.2)
— there is no NCCL/MPI analog to translate; the mesh + annotations ARE
the communication design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from readbouncer_tpu.ibf.query import FilterStack, _counts_impl, _max_counts_impl
from readbouncer_tpu.parallel.mesh import BINS_AXIS, DATA_AXIS

__all__ = ["ShardedFilterStack"]


def _classify_step_impl(
    bits, reads, lengths, thr_base, thr_retry, bin_mask, *, k, h, rows, segments,
    scheme="rbt1",
):
    """Fused device step: counts once, both thresholds evaluated.

    The reference's "-0.02 retry" (src/main/classify.hpp:67-69) is a full
    second count pass in C++; counts are threshold-independent, so here it
    is a free re-threshold of one counts pass.
    """
    counts = _counts_impl(bits, reads, lengths, k=k, h=h, rows=rows, scheme=scheme)
    max_base = _max_counts_impl(counts, thr_base, bin_mask, segments=segments)
    max_retry = _max_counts_impl(counts, thr_retry, bin_mask, segments=segments)
    return max_base, max_retry


class ShardedFilterStack:
    """A FilterStack laid out over a device mesh.

    Requires the stack's word count to divide evenly over the ``bins``
    axis and the read batch to divide over the ``data`` axis (both are
    static program shapes — pad filters/batches up front).
    """

    def __init__(self, stack: FilterStack, mesh: Mesh):
        self.mesh = mesh
        self.stack = stack
        n_bins_shards = mesh.shape.get(BINS_AXIS, 1)
        if stack.words % max(n_bins_shards, 1) != 0:
            raise ValueError(
                f"stack words ({stack.words}) must divide over the "
                f"'{BINS_AXIS}' axis ({n_bins_shards}); pad filters to "
                f"{32 * n_bins_shards}-bin multiples"
            )
        # tolerate meshes that carry only one of the two axes (a pure
        # bins-TP or pure data-DP mesh): a missing axis means replicated
        bins_ax = BINS_AXIS if BINS_AXIS in mesh.shape else None
        data_ax = DATA_AXIS if DATA_AXIS in mesh.shape else None
        bits_sh = NamedSharding(mesh, P(None, bins_ax))
        mask_sh = NamedSharding(mesh, P(bins_ax))
        self.bits = jax.device_put(np.asarray(stack.bits), bits_sh)
        self.bin_mask = jax.device_put(np.asarray(stack.bin_mask), mask_sh)
        data = NamedSharding(mesh, P(data_ax))
        data2 = NamedSharding(mesh, P(data_ax, None))
        out_sh = NamedSharding(mesh, P(data_ax, None))
        self._step = jax.jit(
            functools.partial(
                _classify_step_impl,
                k=stack.kmer_size,
                h=stack.hash_functions,
                rows=stack.rows,
                segments=stack._seg_spec,
                scheme=stack.scheme,
            ),
            in_shardings=(bits_sh, data2, data, data, data, mask_sh),
            out_shardings=(out_sh, out_sh),
        )

    @property
    def data_shards(self) -> int:
        return self.mesh.shape.get(DATA_AXIS, 1)

    def max_counts_dual(
        self,
        reads: np.ndarray,
        lengths: np.ndarray,
        thr_base: np.ndarray,
        thr_retry: np.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-filter max matched counts at both thresholds, int32 [R, F] x2.

        The batch dimension R must be a multiple of the data-axis size.
        """
        if reads.shape[0] % self.data_shards != 0:
            raise ValueError(
                f"batch {reads.shape[0]} must divide over '{DATA_AXIS}' "
                f"axis ({self.data_shards})"
            )
        return self._step(
            self.bits,
            jnp.asarray(reads),
            jnp.asarray(lengths),
            jnp.asarray(thr_base),
            jnp.asarray(thr_retry),
            self.bin_mask,
        )
