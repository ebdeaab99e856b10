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

__all__ = ["ShardedFilterStack", "ShardedLiveClassifier"]


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


class ShardedLiveClassifier:
    """Live check_unblock over a bins-TP x data-DP device mesh.

    Drop-in for ``stream.scheduler.LiveClassifier`` (same ``decide``
    surface, same length-bucket structure, IDENTICAL decisions —
    asserted in tests/test_parallel.py) for deployments whose filter
    set is bins-sharded across chips because it exceeds one chip's HBM:
    the counts + dual-threshold step runs through
    :class:`ShardedFilterStack` (GSPMD inserts the bins-axis segment-max
    collective over ICI), the decision policy runs on host.  Selected
    by ``[TPU] mesh_shape`` in target mode (main.run_target).
    """

    def __init__(self, target_filters, deplete_filters, cfg, mesh: Mesh):
        from readbouncer_tpu.classify.fused import _plan_stacks

        if not target_filters and not deplete_filters:
            raise ValueError("live classification needs at least one filter")
        self.cfg = cfg
        t_stack = FilterStack(target_filters) if target_filters else None
        d_stack = FilterStack(deplete_filters) if deplete_filters else None
        combined, n_targets = _plan_stacks(t_stack, d_stack)
        self.n_targets = n_targets
        if combined is not None:
            self._stacks = [("td", ShardedFilterStack(combined, mesh), combined)]
        else:
            self._stacks = [
                (kind, ShardedFilterStack(s, mesh), s)
                for kind, s in (("t", t_stack), ("d", d_stack))
                if s is not None
            ]
        from readbouncer_tpu.stream.scheduler import (
            live_bucket_batches,
            live_bucket_widths,
        )

        widths = live_bucket_widths(cfg)
        self.short_len = widths[0]
        self.bucket_lens = widths
        self._batch = live_bucket_batches(cfg, widths)
        shards = self._stacks[0][1].data_shards
        for w, b in self._batch.items():
            if b % shards:
                raise ValueError(
                    f"bucket batch {b} (width {w}) must divide over the "
                    f"data axis ({shards})"
                )

    def _dual(self, enc, lens):
        """(t_base, d_base, t_retry, d_retry) numpy maxima for a batch."""
        from readbouncer_tpu.classify.math import ci_and_threshold_batch

        t_b = t_r = d_b = d_r = None
        for kind, sharded, stack in self._stacks:
            thr_b = ci_and_threshold_batch(
                lens, stack.kmer_size, self.cfg.error_rate, self.cfg.significance
            )
            thr_r = ci_and_threshold_batch(
                lens, stack.kmer_size, self.cfg.error_rate - 0.02,
                self.cfg.significance,
            )
            mb, mr = sharded.max_counts_dual(enc, lens, thr_b, thr_r)
            mb, mr = np.asarray(mb), np.asarray(mr)
            if kind == "td":
                nt = self.n_targets
                t_b, d_b = mb[:, :nt], mb[:, nt:]
                t_r, d_r = mr[:, :nt], mr[:, nt:]
            elif kind == "t":
                t_b, t_r = mb, mr
            else:
                d_b, d_r = mb, mr
        return t_b, d_b, t_r, d_r

    def decide(self, seqs: list[str]) -> np.ndarray:
        """Batched decisions: 0 continue / 1 unblock / 2 stop_receiving."""
        from readbouncer_tpu.classify.engine import encode_batch
        from readbouncer_tpu.classify.policy import live_decisions

        if not seqs:
            return np.zeros(0, dtype=np.int64)
        out = np.zeros(len(seqs), dtype=np.int64)
        lens_all = np.array([len(s) for s in seqs])
        lo = -1  # first bucket includes empty sequences
        for w in self.bucket_lens:
            hi = w if w != self.bucket_lens[-1] else np.inf
            idx = np.nonzero((lens_all > lo) & (lens_all <= hi))[0]
            lo = w
            B = self._batch[w]
            for start in range(0, len(idx), B):
                part_idx = idx[start : start + B]
                part = [seqs[j][:w] for j in part_idx]
                enc, lens = encode_batch(part, w, batch=B)
                t_b, d_b, t_r, d_r = self._dual(enc, lens)
                dec = live_decisions(d_b, t_b, d_r, t_r)
                out[part_idx] = dec[: len(part)]
        return out
