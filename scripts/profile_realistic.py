#!/usr/bin/env python
"""Profile the IBF query path at REALISTIC filter geometry.

VERDICT.md weak-#2: the round-1 bench used 300 kb genomes -> W=2 words per
filter; the real workload (reference README.md:253-263) is multi-Mb genomes,
>=512 bins per filter, 4 filters.  This script builds that geometry once
(cached under .bench_cache/) and times each stage of the query separately on
the real chip:

    encode -> H2D transfer -> gather+AND -> accumulate (pallas) -> max_counts

Run:  python scripts/profile_realistic.py [--bins 512] [--batch 2048]
"""

from __future__ import annotations

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

from readbouncer_tpu.ibf.params import IBFParams
from readbouncer_tpu.ibf.storage import IBFData

CACHE = Path(__file__).resolve().parent.parent / ".bench_cache"


def synth_genome(rng: np.random.Generator, n: int) -> str:
    return bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, size=n)]).decode()


def get_filters(n_filters: int, bins_per_filter: int, params: IBFParams):
    """Build (or load cached) filters with bins_per_filter declared bins.

    Cache name carries scheme/h when they differ from the round-2 default
    (rbt1 h=3, whose files predate the suffix)."""
    from readbouncer_tpu.ibf.build import build_ibf

    CACHE.mkdir(exist_ok=True)
    genome_len = bins_per_filter * params.fragment_length
    suffix = ""
    if params.hash_scheme != "rbt1":
        suffix += f"_{params.hash_scheme}"
    if params.hash_functions != 3:
        suffix += f"_h{params.hash_functions}"
    filters = []
    for i in range(n_filters):
        name = f"g{i}_b{bins_per_filter}_f{params.fragment_length}_k{params.kmer_size}"
        p = CACHE / f"{name}{suffix}.ribf"
        gpath = CACHE / f"{name}.fasta"
        if p.exists():
            filters.append(IBFData.load(p))
            continue
        if not gpath.exists():
            rng = np.random.default_rng(1000 + i)
            gpath.write_text(f">{name}\n{synth_genome(rng, genome_len)}\n")
        t0 = time.monotonic()
        ibf, stats = build_ibf([gpath], params, name=name)
        print(f"built {name}{suffix}: bins={ibf.num_bins} words={ibf.words} "
              f"rows={ibf.rows} ({stats.build_seconds:.1f}s)", flush=True)
        ibf.save(p)
        filters.append(ibf)
    return filters


def _sync(out):
    """Force real completion: D2H a scalar of the first output leaf.

    block_until_ready on the axon tunnel backend acks before execution
    finishes (measured: a 4096^3 matmul "completes" in 67 us = 2 PFLOPs,
    impossible on v5e) — only a data fetch truly synchronizes.
    """
    leaf = jax.tree.leaves(out)[0]
    idx = tuple(0 for _ in leaf.shape)
    return np.asarray(leaf[idx] if leaf.ndim else leaf)


def timeit(fn, *args, n=20, warmup=2):
    """Amortized per-dispatch time over n queued dispatches + one sync."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    return dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bins", type=int, default=512)
    ap.add_argument("--filters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--h", type=int, default=3, help="hash functions (sizing follows)")
    ap.add_argument("--scheme", default="rbt1")
    args = ap.parse_args()

    params = IBFParams(
        kmer_size=13,
        fragment_length=100_000,
        hash_functions=args.h,
        hash_scheme=args.scheme,
    )
    filters = get_filters(args.filters, args.bins, params)

    from readbouncer_tpu.classify.engine import encode_batch
    from readbouncer_tpu.classify.math import ci_and_threshold_batch
    from readbouncer_tpu.ibf.query import (
        FilterStack, _counts_impl, fmix32_jnp, kmer_codes_jnp, umulhi_u32,
    )
    from readbouncer_tpu.ibf.hashing import SEEDS

    t0 = time.monotonic()
    stack = FilterStack(filters)
    jax.block_until_ready(stack.bits)
    print(f"FilterStack: W={stack.words} total_bins={stack.total_bins} "
          f"rows={stack.rows} bits={stack.bits.nbytes/1e6:.0f}MB "
          f"device_put={time.monotonic()-t0:.2f}s")

    R, cl = args.batch, args.chunk
    rng = np.random.default_rng(7)
    seqs = [synth_genome(rng, cl) for _ in range(R)]
    reads, lens = encode_batch(seqs, cl)

    t0 = time.perf_counter()
    encode_batch(seqs, cl)
    print(f"host encode [{R},{cl}]: {(time.perf_counter()-t0)*1e3:.1f} ms")

    put = lambda: jax.block_until_ready(jax.device_put(reads))
    tmin, tmed = timeit(lambda: jax.device_put(reads), n=5)
    print(f"H2D transfer {reads.nbytes/1e6:.1f}MB: min={tmin*1e3:.1f} med={tmed*1e3:.1f} ms")

    k, h, rows = stack.kmer_size, stack.hash_functions, stack.rows
    dreads = jax.device_put(reads)
    dlens = jax.device_put(lens)

    # full counts (pallas production path)
    scheme = stack.scheme
    f_counts = jax.jit(
        lambda b, r, l: _counts_impl(b, r, l, k=k, h=h, rows=rows, scheme=scheme)
    )
    tmin, tmed = timeit(f_counts, stack.bits, dreads, dlens)
    print(f"counts full (pallas path): min={tmin*1e3:.1f} med={tmed*1e3:.1f} ms", flush=True)

    # gather+AND only (flat 1-D index operands, like the production path)
    def gather_and(bits, reads):
        codes = kmer_codes_jnp(reads, k)
        anded = None
        for i in range(h):
            z = fmix32_jnp(codes * jnp.uint32(int(SEEDS[i])))
            ridx = umulhi_u32(z, jnp.uint32(rows)).astype(jnp.int32)
            g = jnp.take(bits, ridx.reshape(-1), axis=0).reshape(
                codes.shape + (bits.shape[1],)
            )
            anded = g if anded is None else (anded & g)
        return anded
    f_ga = jax.jit(gather_and)
    tmin, tmed = timeit(f_ga, stack.bits, dreads)
    n = cl - k + 1
    out_mb = R * 2 * n * stack.words * 4 / 1e6
    print(f"gather+AND only ({out_mb:.0f}MB out): min={tmin*1e3:.1f} med={tmed*1e3:.1f} ms", flush=True)

    # accumulate only (pallas) on a precomputed anded tensor
    from readbouncer_tpu.ops.ibf_count_pallas import accumulate_counts_pallas
    n_pad = -(-n // 128) * 128 if n > 128 else (1 << max(n - 1, 1).bit_length())
    R2 = 2 * R
    a_t = jnp.zeros((stack.words, n_pad, R2), dtype=jnp.uint32)
    a_t = jax.block_until_ready(a_t)
    f_acc = jax.jit(lambda a: accumulate_counts_pallas(a))
    tmin, tmed = timeit(f_acc, a_t)
    print(f"pallas accumulate only [{stack.words},{n_pad},{R2}]: "
          f"min={tmin*1e3:.1f} med={tmed*1e3:.1f} ms")

    # max_counts
    counts = jax.block_until_ready(f_counts(stack.bits, dreads, dlens))
    thr = ci_and_threshold_batch(lens, k, 0.1, 0.95)
    f_max = lambda c, t: stack.max_counts(c, t)
    tmin, tmed = timeit(f_max, counts, thr)
    print(f"max_counts: min={tmin*1e3:.1f} med={tmed*1e3:.1f} ms")

    # end-to-end per-read cost
    tmin, tmed = timeit(f_counts, stack.bits, dreads, dlens)
    print(f"=> counts throughput: {R/tmed:,.0f} chunk-reads/s "
          f"(batch {R}, W={stack.words})")


if __name__ == "__main__":
    main()
