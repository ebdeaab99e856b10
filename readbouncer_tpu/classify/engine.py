"""Offline classification engine (`classify` usage).

Rebuild of the reference's classify driver (src/main/classify.hpp:142-380)
as batched device waves instead of a per-read loop:

* reads stream from FASTA/FASTQ in host batches,
* wave ``i`` classifies the ``i``-th disjoint chunk
  ``seq[i*chunk_length : (i+1)*chunk_length)`` of every still-unclassified
  read in the batch — one fixed-shape device program per wave
  (pad-to-bucket, SURVEY.md §7 Hard Parts #3),
* reads shorter than ``chunk_length`` are "too short" and skipped
  (reference: src/main/classify.hpp:247-250),
* a classified read's *full* sequence goes to the best target's FASTA;
  unclassified reads go to ``unclassified.fasta``
  (reference: src/main/classify.hpp:284-301).

Deliberate divergence from the reference, documented: the reference's
chunk loop keeps iterating past the end of the read and builds a
``seqan::infix(seq, fragstart > len, len)`` whose behavior is undefined
(src/main/classify.hpp:262-272); we stop attempting chunks once
``i*chunk_length >= len``.  Chunks whose tail is shorter than k count as
unmatched instead of raising (the reference's single-filter overload
would throw ShortReadException and drop the read from every output;
src/IBF/IBFClassify.cpp:290-294).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from readbouncer_tpu.classify.fused import pack5_np  # noqa: F401 (re-export)
from readbouncer_tpu.errors import EmptyFilterError
from readbouncer_tpu.classify.math import ci_and_threshold_batch
from readbouncer_tpu.classify.policy import classify_decisions
from readbouncer_tpu.fastio.fasta import FastaWriter, read_records
from readbouncer_tpu.ibf.hashing import encode_bases
from readbouncer_tpu.ibf.query import FilterStack
from readbouncer_tpu.ibf.storage import IBFData

__all__ = ["ClassifyResults", "ClassifyEngine", "classify_read_files"]


@dataclass
class ClassifyResults:
    """Counters matching the reference's final stats block
    (src/main/classify.hpp:349-365) and test back-channel
    (ClassificationResults_, src/main/classify.hpp:127-134)."""

    found: int = 0
    failed: int = 0
    too_short: int = 0
    read_counter: int = 0
    per_target: dict[str, int] = field(default_factory=dict)
    avg_classify_seconds: float = 0.0

    def report(self, chunk_length: int) -> str:
        lines = [
            "------------------------------- Final Results -------------------------------",
            f"Number of classified reads                         :   {self.found}",
            f"Number of of too short reads (len < {chunk_length})           :   {self.too_short}",
            f"Number of all reads                                :   {self.read_counter}",
        ]
        for name, n in self.per_target.items():
            frac = (n / self.read_counter) if self.read_counter else 0.0
            lines.append(f"{name}\t : {n}\t\t{frac}")
        lines.append(
            f"Average Processing Time Read Classification        :   {self.avg_classify_seconds}"
        )
        lines.append(
            "-----------------------------------------------------------------------------------"
        )
        return "\n".join(lines)


try:  # native batch packer (native/rbt_native.cpp); Python fallback below
    from readbouncer_tpu import _native as _rbt_native
except ImportError:  # pragma: no cover - environment without the build
    _rbt_native = None


def encode_batch(seqs: list[str], length: int, batch: int | None = None):
    """Encode + right-pad sequences to a fixed [R, length] u8 array."""
    R = batch if batch is not None else len(seqs)
    if _rbt_native is not None:
        buf, lens_buf = _rbt_native.encode_batch(seqs, length)
        enc = np.frombuffer(buf, dtype=np.uint8).reshape(len(seqs), length)
        enc_lens = np.frombuffer(lens_buf, dtype=np.int32)
        if R == len(seqs):
            return enc, enc_lens
        out = np.zeros((R, length), dtype=np.uint8)
        lens = np.zeros(R, dtype=np.int32)
        out[: len(seqs)] = enc
        lens[: len(seqs)] = enc_lens
        return out, lens
    out = np.zeros((R, length), dtype=np.uint8)
    lens = np.zeros(R, dtype=np.int32)
    for i, s in enumerate(seqs):
        b = encode_bases(s[:length])
        out[i, : b.shape[0]] = b
        lens[i] = b.shape[0]
    return out, lens


class ClassifyEngine:
    """Batched chunk classifier over target/deplete filter stacks."""

    def __init__(
        self,
        target_filters: list[IBFData],
        deplete_filters: list[IBFData],
        error_rate: float,
        significance: float = 0.95,
        chunk_length: int = 250,
        max_chunks: int = 5,
        batch_size: int = 1024,
        overlap_pool: bool = False,
        batch_size_b: int | None = None,
        packing: str = "auto",
    ):
        if not target_filters and not deplete_filters:
            raise EmptyFilterError(
                "No depletion or target filters have been provided for classification!"
            )
        self.targets = FilterStack(target_filters) if target_filters else None
        self.depletes = FilterStack(deplete_filters) if deplete_filters else None
        self.target_names = [f.name for f in target_filters]
        self.error_rate = error_rate
        self.significance = significance
        self.chunk_length = chunk_length
        if not 0 < max_chunks < 255:
            # the packed result word gives attempts 8 bits
            # (classify/fused._pack_result_jnp); the reference default
            # is 5 (src/config/configReader.cpp:238-243)
            raise ValueError(f"max_chunks must be in [1, 254], got {max_chunks}")
        self.max_chunks = max_chunks
        self.batch_size = batch_size
        # phase-B reads carry (max_chunks-1) chunks each, so a phase-B
        # launch's `anded` intermediate is (C-1)x a phase-A launch's at
        # the same read batch; a smaller phase-B batch keeps the
        # intermediates matched (r04 sweep: smaller anded wins)
        self.batch_size_b = batch_size_b or batch_size
        # "auto": per host batch — 2-bit for pure-ACGT, base-243 when a
        # batch carries N.  The first N-containing batch of a run then
        # lazily compiles the base-243 program set (minutes on the
        # tunnel, docs/PERF_NOTES.md); runs that KNOW their reads carry
        # Ns can pin packing="base243" up front to compile exactly one
        # set ("2bit" pins the other way and rejects N batches).
        if packing not in ("auto", "2bit", "base243"):
            raise ValueError(f"packing must be auto|2bit|base243, got {packing!r}")
        self.packing = packing
        # overlap_pool=True uploads the full phase-B candidate pool while
        # phase A computes and gathers compacted rows on device — removes
        # the serial pack+upload stall on congested-tunnel days, but its
        # indexed program costs ~4.5 min of extra cold compile per
        # process (the tunnel has no working compile cache) for a
        # within-noise gain on a healthy tunnel.  Off by default.
        self.overlap_pool = overlap_pool
        self.kmer_size = (self.targets or self.depletes).kmer_size
        # jitted fused programs keyed by (n_chunks, attempt_offset),
        # built lazily (make_fused_classify_packed_fn); the merged
        # target+deplete stack plan is built once and shared so its bits
        # matrix lives on device exactly once
        from readbouncer_tpu.classify.fused import _plan_stacks

        self._plan = _plan_stacks(self.targets, self.depletes)
        self._fused_cache: dict[tuple[int, int], object] = {}

    def _fused_fn(self, n_chunks: int, attempt_offset: int, packing: str = "base243"):
        """Packed bulk-input program for n_chunks-wide batches."""
        from readbouncer_tpu.classify.fused import make_fused_classify_packed_fn

        B = self.batch_size if attempt_offset == 0 else self.batch_size_b
        key = (n_chunks, attempt_offset, packing, B)
        fn = self._fused_cache.get(key)
        if fn is None:
            fn = make_fused_classify_packed_fn(
                self.targets,
                self.depletes,
                self.chunk_length,
                n_chunks,
                self.error_rate,
                self.significance,
                B,
                attempt_offset=attempt_offset,
                plan=self._plan,
                packing=packing,
            )
            self._fused_cache[key] = fn
        return fn

    def _indexed_fn(self, n_chunks: int, pool_words: int):
        """Gather-by-index phase-B program (rows picked on device)."""
        from readbouncer_tpu.classify.fused import make_fused_classify_indexed_fn

        key = ("idx", n_chunks, pool_words, self.batch_size_b)
        fn = self._fused_cache.get(key)
        if fn is None:
            fn = make_fused_classify_indexed_fn(
                self.targets,
                self.depletes,
                self.chunk_length,
                n_chunks,
                self.error_rate,
                self.significance,
                self.batch_size_b,
                pool_words,
                attempt_offset=1,
                plan=self._plan,
            )
            self._fused_cache[key] = fn
        return fn

    def classify_fragments(self, frags: np.ndarray, lens: np.ndarray):
        """One wave: decisions for a batch of chunk fragments.

        Returns (classified[R] bool, best_target[R] int).
        """
        t_base = t_retry = d_base = d_retry = None
        if self.targets is not None:
            counts = self.targets.counts(frags, lens)
            thr_b = ci_and_threshold_batch(
                lens, self.targets.kmer_size, self.error_rate, self.significance
            )
            thr_r = ci_and_threshold_batch(
                lens, self.targets.kmer_size, self.error_rate - 0.02, self.significance
            )
            t_base = np.asarray(self.targets.max_counts(counts, thr_b))
            t_retry = np.asarray(self.targets.max_counts(counts, thr_r))
        if self.depletes is not None:
            counts = self.depletes.counts(frags, lens)
            thr_b = ci_and_threshold_batch(
                lens, self.depletes.kmer_size, self.error_rate, self.significance
            )
            thr_r = ci_and_threshold_batch(
                lens, self.depletes.kmer_size, self.error_rate - 0.02, self.significance
            )
            d_base = np.asarray(self.depletes.max_counts(counts, thr_b))
            d_retry = np.asarray(self.depletes.max_counts(counts, thr_r))
        return classify_decisions(t_base, d_base, t_retry, d_retry)

    def classify_sequences(self, seqs: list[str]):
        """Classify a list of sequences (fused whole-read device path).

        Returns (classified[N] bool, best_target[N] int, attempts[N] int).
        Too-short filtering is the caller's concern.

        Two-phase speculative scoring, one device call per batch per
        phase (classify/fused.py).  Phase A scores only chunk 0 of every
        read — in adaptive-sampling workloads most reads resolve there.
        Reads that chunk 0 leaves unresolved are compacted and re-scored
        in phase B on exactly their remaining chunks (bucketed by how
        many chunks their length provides, so a 4-chunk read never pays
        for a 5-chunk program).  Decisions are identical to the
        reference's chunk loop (src/main/classify.hpp:262-299): each
        chunk's decision is independent and the first classified chunk
        wins.  Batches within a phase are dispatched asynchronously so
        transfers and compute pipeline.

        This is ``classify_submit(seqs).finish()``; drivers that overlap
        host work with device compute hold several submitted jobs in
        flight (classify_read_files pipeline).
        """
        return self.classify_submit(seqs).finish()

    def classify_submit(self, seqs: list[str]) -> "_ClassifyJob":
        """Encode + upload + dispatch phase A; returns a finishable job.

        All host-side preparation (native encode, pack5, H2D puts, async
        phase-A dispatch, and — with overlap_pool — the speculative
        phase-B pool upload) happens here, so a driver can prepare batch
        i+1 while the device computes batch i.  ``_ClassifyJob.finish``
        collects phase A, dispatches phase B and returns the results.
        """
        return _ClassifyJob(self, seqs)

    def classify_sequences_pipelined(
        self,
        seqs: list[str],
        host_batch_reads: int = 16384,
        depth: int = 2,
    ):
        """classify_sequences over pipelined host batches.

        Splits ``seqs`` into host batches and keeps ``depth`` submitted
        jobs in flight as a 3-stage pipeline — submit(i) →
        dispatch_b(i-1) → collect(i-2): batch i+1's encode/pack/H2D/
        phase-A dispatch happens while the device computes batch i, and
        batch i's phase-B programs are enqueued BEFORE batch i-1's final
        result fetch is paid, so the device queue never drains across
        host-batch seams.  Identical results to classify_sequences (same
        per-read decisions; batches are independent).
        """
        from collections import deque

        n = len(seqs)
        classified = np.zeros(n, dtype=bool)
        best = np.full(n, -1, dtype=np.int64)
        attempts = np.zeros(n, dtype=np.int64)
        in_flight: deque = deque()  # (job, start)

        def drain_one():
            job, start = in_flight.popleft()
            c, b, a = job.finish()
            classified[start : start + job.n] = c
            best[start : start + job.n] = b
            attempts[start : start + job.n] = a

        for start in range(0, n, host_batch_reads):
            in_flight.append(
                (self.classify_submit(seqs[start : start + host_batch_reads]), start)
            )
            if len(in_flight) >= 2:
                in_flight[-2][0].dispatch_b()
            while len(in_flight) > max(1, depth):
                drain_one()
        while in_flight:
            drain_one()
        return classified, best, attempts

    def probe_transfer_seconds(self, nbytes: int = 1 << 19) -> float:
        """Measure one synced H2D put of ``nbytes`` (the transfer-mode
        probe).  A D2H fetch of one element truly synchronizes on every
        backend including the tunnel (docs/PERF_NOTES.md: block_until_
        ready acks early there)."""
        import time as _time

        import jax

        # throwaway put first: the process's first transfer pays backend
        # + tunnel-session init (measured 127 s once!) and would bias
        # the probe toward "congested" on every healthy hour
        warm = jax.device_put(np.zeros(4096, dtype=np.uint8))
        np.asarray(warm[:1])
        buf = np.zeros(nbytes, dtype=np.uint8)
        t0 = _time.monotonic()
        dev = jax.device_put(buf)
        np.asarray(dev[:1])  # force completion
        return _time.monotonic() - t0

    def classify_sequences_waves(self, seqs: list[str]):
        """Chunk-wave implementation (one device pass per wave).

        Reference-shaped control flow kept as the semantics oracle for
        the fused path (tests assert equality); the fused path is the
        production route.
        """
        n = len(seqs)
        classified = np.zeros(n, dtype=bool)
        best = np.full(n, -1, dtype=np.int64)
        attempts = np.zeros(n, dtype=np.int64)
        seq_lens = np.array([len(s) for s in seqs], dtype=np.int64)
        cl = self.chunk_length
        for i in range(self.max_chunks):
            active = np.flatnonzero(~classified & (seq_lens > i * cl))
            if active.size == 0:
                break
            for start in range(0, active.size, self.batch_size):
                idx = active[start : start + self.batch_size]
                frag_seqs = [seqs[j][i * cl : (i + 1) * cl] for j in idx]
                frags, lens = encode_batch(frag_seqs, cl, batch=self.batch_size)
                ok, b = self.classify_fragments(frags, lens)
                ok = ok[: idx.size]
                b = b[: idx.size]
                classified[idx] |= ok
                best[idx] = np.where(ok, b, best[idx])
                attempts[idx] += 1
        return classified, best, attempts


class _ClassifyJob:
    """One submitted host batch: phase A in flight, phase B on finish().

    Split out of classify_sequences so drivers can overlap the host side
    (encode/pack/writes) and transfers of neighboring batches with
    device compute — the engine's compute floor is otherwise hidden
    behind serial uploads and D2H round trips (docs/PERF_NOTES.md).
    """

    def __init__(self, engine: ClassifyEngine, seqs: list[str]):
        import jax

        from readbouncer_tpu.classify.fused import pack4_np, pack5_np

        self.engine = engine
        self.n = n = len(seqs)
        self.futs_b = None  # set by dispatch_b (idempotence sentinel)
        cl, C = engine.chunk_length, engine.max_chunks
        L = cl * C
        B = engine.batch_size
        if n == 0:
            return

        # encode everything once on host; each phase ships ONE packed
        # array and batch programs slice rows on device — per-batch H2D
        # pays a ~0.1-0.4 s tunnel round trip, a bulk put amortizes to
        # streaming bandwidth (scripts/transfer_probe.py).  Pure-ACGT
        # pools (the common case: basecalled reads carry no N) pack
        # 2 bits/base (pack4_np, 25% fewer bytes than base-243); any N
        # in the batch falls back to base-243.  Pools are FLAT and
        # padded to power-of-two byte buckets so the program shape (and
        # its minutes-long server-side compile) does not depend on the
        # input count.
        enc, lens = encode_batch(seqs, L)
        self.enc, self.lens = enc, lens
        if engine.packing == "auto":
            self.packing = "base243" if bool((enc > 3).any()) else "2bit"
        else:
            self.packing = engine.packing
            if self.packing == "2bit" and bool((enc > 3).any()):
                raise ValueError(
                    "packing='2bit' pinned but this batch contains N bases"
                )
        self._pack = pack4_np if self.packing == "2bit" else pack5_np
        n_pad = -(-n // B) * B
        self.n_pad = n_pad

        def pool_put(rows2d: np.ndarray):
            flat = np.ascontiguousarray(rows2d).reshape(-1)
            bucket = 1 << max(int(flat.size - 1).bit_length(), 12)
            if bucket != flat.size:
                flat = np.concatenate(
                    [flat, np.zeros(bucket - flat.size, dtype=flat.dtype)]
                )
            return jax.device_put(flat)

        self._pool_put = pool_put

        # --- phase A: chunk 0 of every read ----------------------------
        fn_a = engine._fused_fn(1, 0, self.packing)
        pk_a = self._pack(enc[:, :cl])
        if n_pad != n:
            pk_a = np.concatenate(
                [pk_a, np.zeros((n_pad - n, pk_a.shape[1]), dtype=np.uint8)]
            )
        dev_a = pool_put(pk_a)
        dev_lens = pool_put(
            np.concatenate([lens, np.zeros(n_pad - n, dtype=np.int32)])
        )
        self.futs_a = [fn_a(dev_a, dev_lens, start) for start in range(0, n_pad, B)]

        # overlap_pool: speculatively pack + upload the phase-B candidate
        # pool (chunks 1..C-1 of EVERY multi-chunk read) while the device
        # chews on phase A — phase B then only uploads tiny row-index
        # arrays and gathers its rows on device.  ~2.7x the minimal
        # phase-B bytes, but fully overlapped with phase-A compute.
        self.dev_ball = self.dev_lb_all = None
        self.pool_words = 0
        if engine.overlap_pool and C > 1 and bool((lens > cl).any()):
            pk_all = pack5_np(enc[:, cl : cl * C])  # [n, ceil((C-1)*cl/3)]
            pw = pk_all.shape[1]
            self.pool_words = -(-pw // 4)
            if self.pool_words * 4 != pw:
                pk_all = np.pad(pk_all, ((0, 0), (0, self.pool_words * 4 - pw)))
            # '<u4' view pairs with the device's little-endian
            # bitcast_convert_type split (fused.py) on any host
            self.dev_ball = pool_put(pk_all.reshape(-1).view(np.dtype("<u4")))
            self.dev_lb_all = pool_put(np.maximum(lens.astype(np.int32) - cl, 0))

    def dispatch_b(self):
        """Fetch pending flags, dispatch phase B (idempotent).

        Split out of finish() so a pipelined driver can enqueue batch
        i's phase-B programs BEFORE paying batch i-1's final result
        fetch — the device queue stays full across host-batch seams.
        """
        import jax

        if self.n == 0 or self.futs_b is not None:
            return
        engine = self.engine
        cl, C = engine.chunk_length, engine.max_chunks
        B = engine.batch_size_b
        lens = self.lens
        n = self.n

        # mid-batch fetch: pending flags only (phase-A results stay on
        # device until the final merged fetch)
        pend = jax.device_get([f[1] for f in self.futs_a])
        pidx = np.nonzero(np.concatenate(pend)[:n])[0]

        # --- phase B: remaining chunks of unresolved reads --------------
        futs_b = []
        if pidx.size:
            plens = lens[pidx]
            # bucket by chunks still to score (ceil(len/cl)-1, cap C-1)
            n_rest = np.minimum(-(-plens // cl), C) - 1  # [U] in 1..C-1
            for c_rest in np.unique(n_rest):
                c_rest = int(c_rest)
                sel = np.nonzero(n_rest == c_rest)[0]
                u = sel.size
                u_pad = -(-u // B) * B
                if self.dev_ball is not None:
                    fn_b = engine._indexed_fn(c_rest, self.pool_words)
                    idx = np.zeros(u_pad, dtype=np.int32)
                    idx[:u] = pidx[sel]
                    dev_idx = self._pool_put(idx)
                    futs = [
                        fn_b(self.dev_ball, self.dev_lb_all, dev_idx, s)
                        for s in range(0, u_pad, B)
                    ]
                else:
                    fn_b = engine._fused_fn(c_rest, 1, self.packing)
                    pk_b = self._pack(
                        np.ascontiguousarray(
                            self.enc[pidx[sel], cl : cl * (1 + c_rest)]
                        )
                    )
                    if u_pad != u:
                        pk_b = np.concatenate(
                            [pk_b, np.zeros((u_pad - u, pk_b.shape[1]), dtype=np.uint8)]
                        )
                    lb = np.zeros(u_pad, dtype=np.int32)
                    lb[:u] = plens[sel] - cl
                    dev_b = self._pool_put(pk_b)
                    dev_lb = self._pool_put(lb)
                    futs = [fn_b(dev_b, dev_lb, s) for s in range(0, u_pad, B)]
                futs_b.append((pidx[sel], u, futs))
        self.futs_b = futs_b

    def finish(self):
        """Collect both phases; returns (classified[N] bool,
        best_target[N] int, attempts[N] int).

        D2H discipline (the tunnel serializes transfers with compute and
        charges ~25 ms per fetch): dispatch_b's mid-batch fetch pulls
        ONLY the device-computed pending flags (1 B/read); the full
        packed result words (4 B/read, i32) of BOTH phases come back in
        one final batched fetch here.
        """
        import jax

        from readbouncer_tpu.classify.fused import unpack_results_np

        n = self.n
        classified = np.zeros(n, dtype=bool)
        best = np.full(n, -1, dtype=np.int64)
        attempts = np.zeros(n, dtype=np.int64)
        if n == 0:
            return classified, best, attempts
        self.dispatch_b()
        futs_b = self.futs_b

        # final merged fetch: phase A + phase B packed results, 1 trip
        n_a = len(self.futs_a)
        flat = [f[0] for f in self.futs_a] + [
            f[0] for _, _, futs in futs_b for f in futs
        ]
        outs = jax.device_get(flat)
        res_a = np.concatenate(outs[:n_a])[:n]
        classified[:], best[:], attempts[:] = unpack_results_np(res_a)
        pos = n_a
        for out_idx, u, futs in futs_b:
            res_b = np.concatenate(outs[pos : pos + len(futs)])[:u]
            pos += len(futs)
            ok, bb, att = unpack_results_np(res_b)
            classified[out_idx] = ok
            best[out_idx] = bb
            attempts[out_idx] = att
        return classified, best, attempts


def choose_transfer_mode(
    mode: str,
    engine: ClassifyEngine,
    *,
    probe_bytes: int = 1 << 19,
    congested_seconds: float = 0.08,
    probe_fn=None,
    logger=None,
) -> bool:
    """Resolve a ``transfer_mode`` config value to overlap_pool on/off.

    ``serial``: pack phase-B inputs after phase A (minimal bytes, extra
    serial stall) — right on a healthy link.  ``overlap``: speculatively
    upload the full phase-B pool during phase-A compute (overlap_pool) —
    right when transfers are slow (congested tunnel hours), at the cost
    of one extra program compile.  ``auto``: one timed ~0.5 MB synced
    H2D put decides (>= ``congested_seconds`` means congested; the
    measured good/congested split is 27 ms vs 110-417 ms,
    docs/PERF_NOTES.md).
    """
    mode = (mode or "serial").lower()
    if mode not in ("serial", "overlap", "auto"):
        raise ValueError(f"transfer_mode must be serial|overlap|auto, got {mode!r}")
    if mode == "auto":
        seconds = (
            probe_fn(probe_bytes)
            if probe_fn is not None
            else engine.probe_transfer_seconds(probe_bytes)
        )
        decided = "overlap" if seconds >= congested_seconds else "serial"
        if logger is not None:
            logger.info(
                "transfer_mode=auto: %.0f KB H2D probe took %.1f ms -> %s",
                probe_bytes / 1024, seconds * 1e3, decided,
            )
        mode = decided
    return mode == "overlap"


def classify_read_files(
    read_files: list[str | Path],
    target_filters: list[IBFData],
    deplete_filters: list[IBFData],
    error_rate: float,
    output_dir: str | Path,
    significance: float = 0.95,
    chunk_length: int = 250,
    max_chunks: int = 5,
    batch_size: int = 1024,
    host_batch_reads: int = 16384,
    verbose: bool = True,
    shard: tuple[int, int] = (0, 1),
    output_suffix: str = "",
    transfer_mode: str = "serial",
    pipeline_depth: int = 2,
    packing: str = "auto",
) -> ClassifyResults:
    """Drive classification over read files, writing per-target FASTAs and
    unclassified.fasta (reference: classify_reads, src/main/classify.hpp:142-380).

    ``shard=(i, n)``: process only records whose index % n == i — the
    per-host input shard of a multi-host run (parallel/distributed.py);
    counters then cover this shard only (aggregate across hosts with
    aggregate_counters).  ``output_suffix`` keeps per-host FASTA outputs
    from colliding on a shared filesystem.

    ``transfer_mode``: "serial" | "overlap" | "auto" — whether phase-B
    inputs are packed after phase A or speculatively uploaded during it
    (see choose_transfer_mode); "auto" decides from a 1-put probe.

    ``pipeline_depth``: host batches in flight.  At depth >= 2 the
    driver submits batch i+1 (native encode + pack + H2D + async phase-A
    dispatch) and writes batch i-1's FASTAs while the device computes
    batch i — the transfers/host work that a serial loop serializes
    with compute (docs/PERF_NOTES.md stage budget).  Depth 1 restores
    the strictly serial behavior.
    """
    from readbouncer_tpu.utils.logging import get_logger

    engine = ClassifyEngine(
        target_filters,
        deplete_filters,
        error_rate,
        significance,
        chunk_length,
        max_chunks,
        batch_size,
        packing=packing,
    )
    log = get_logger("ClassifyLog")
    probe_s = None
    if (transfer_mode or "").lower() == "auto":
        probe_s = engine.probe_transfer_seconds()
    engine.overlap_pool = choose_transfer_mode(
        transfer_mode,
        engine,
        probe_fn=(None if probe_s is None else (lambda nb: probe_s)),
        logger=log,
    )
    if probe_s is not None and probe_s >= 0.08:
        # congested link: per-put/per-get ROUND TRIPS dominate, so ship
        # fewer, larger pools (measured 5.6k -> 14.2k reads/s on the
        # same congested hour — BENCHMARKS.md)
        host_batch_reads = max(host_batch_reads, 65536)
        pipeline_depth = 1
        log.info(
            "transfer probe %.0f ms: congested -> host_batch_reads=%d depth=1",
            probe_s * 1e3, host_batch_reads,
        )
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    results = ClassifyResults()
    results.per_target = {name: 0 for name in engine.target_names}

    target_writers = [
        FastaWriter(output_dir / f"{name}{output_suffix}.fasta")
        for name in engine.target_names
    ]
    unclassified = FastaWriter(output_dir / f"unclassified{output_suffix}.fasta")
    t_start = time.monotonic()
    # a still-unclassified read FAILS once its chunk loop reaches a
    # fragment shorter than the k-mer size (every classify overload
    # throws ShortReadException there and the driver counts the read
    # failed and drops it from every output, incl. unclassified.fasta;
    # reference: src/IBF/IBFClassify.cpp:218-225,290-294 via
    # src/main/classify.hpp:300-310).  Chunk lengths decrease, so the
    # loop hits a short fragment iff the last attempted chunk is
    # short: len < (max_chunks-1)*chunk_length + k.
    fail_below = (max_chunks - 1) * chunk_length + engine.kmer_size
    depth = max(1, pipeline_depth)
    from collections import deque

    in_flight: deque = deque()  # (job, ids, seqs)

    processed = [0]  # reads through finished host batches (interval log)

    def write_outputs(job, ids, seqs):
        classified, best, _ = job.finish()
        for j in range(len(seqs)):
            if classified[j]:
                results.found += 1
                if best[j] >= 0:
                    name = engine.target_names[best[j]]
                    results.per_target[name] += 1
                    target_writers[best[j]].write(ids[j], seqs[j])
            elif len(seqs[j]) < fail_below:
                results.failed += 1
            else:
                unclassified.write(ids[j], seqs[j])
        # per-host-batch intermediate log (the reference's rolling
        # avg-latency progress lines, src/main/classify.hpp:318-339)
        processed[0] += len(seqs)
        dt = time.monotonic() - t_start
        log.info(
            "intermediate: %d reads processed, %d classified, "
            "avg classification time per read: %.6f s",
            processed[0], results.found, dt / max(1, processed[0]),
        )

    def submit(ids, seqs):
        if not seqs:
            return
        in_flight.append((engine.classify_submit(seqs), ids, seqs))
        if len(in_flight) >= 2:
            # 3-stage pipeline: enqueue the previous batch's phase B
            # before paying any final result fetch (see
            # classify_sequences_pipelined)
            in_flight[-2][0].dispatch_b()
        while len(in_flight) >= depth + 1:
            write_outputs(*in_flight.popleft())

    try:
        for read_file in read_files:
            ids: list[str] = []
            seqs: list[str] = []
            shard_i, shard_n = shard
            for rec_idx, rec in enumerate(read_records(read_file)):
                if shard_n > 1 and rec_idx % shard_n != shard_i:
                    continue
                results.read_counter += 1
                if len(rec.seq) < chunk_length:
                    results.too_short += 1
                    continue
                ids.append(rec.id)
                seqs.append(rec.seq)
                if len(seqs) >= host_batch_reads:
                    submit(ids, seqs)
                    ids, seqs = [], []
            submit(ids, seqs)
        while in_flight:
            write_outputs(*in_flight.popleft())
    finally:
        for w in target_writers:
            w.close()
        unclassified.close()
    elapsed = time.monotonic() - t_start
    processed = results.read_counter - results.too_short
    results.avg_classify_seconds = elapsed / processed if processed else 0.0
    if verbose:
        print(results.report(chunk_length))
    return results
