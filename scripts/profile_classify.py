#!/usr/bin/env python
"""Stage-level timing of the classify hot path at the bench geometry.

Separates the headline run into its serialized components — host
encode/pack, H2D pool puts, phase-A compute, pending fetch, phase-B
pack/put/compute, final result fetch — so the gap between the measured
reads/s and the pure-compute floor (docs/PERF_NOTES.md) is attributed,
not guessed.  Reuses bench.py's cached filters and workload.

Run:  python scripts/profile_classify.py [--reads 16384]
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
import numpy as np


from _bench_util import sync  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=16384)
    args = ap.parse_args()

    import bench as bm
    from readbouncer_tpu.classify.engine import ClassifyEngine, encode_batch
    from readbouncer_tpu.ibf.params import IBFParams

    rng = np.random.default_rng(42)
    params = IBFParams(kmer_size=13, fragment_length=100_000)
    filters, genomes = bm.get_filters(params)
    targets, depletes = filters[:3], filters[3:]

    N = args.reads
    seqs = []
    per_t = N // 6
    for i in range(3):
        seqs += bm.reads_from(rng, genomes[i], per_t, bm.READ_LEN)
    seqs += bm.reads_from(rng, genomes[3], N // 4, bm.READ_LEN)
    seqs += bm.reads_from(
        rng, bm.synth_genome(rng, 1_000_000), N - len(seqs), bm.READ_LEN
    )
    order = rng.permutation(len(seqs))
    seqs = [seqs[i] for i in order]

    B = bm.BATCH_SIZE
    eng = ClassifyEngine(targets, depletes, error_rate=bm.ERROR_RATE, batch_size=B)
    print("# warmup (compiles both phases at production shapes)...", flush=True)
    t0 = time.monotonic()
    eng.classify_sequences(seqs)
    print(f"# warmup: {time.monotonic()-t0:.1f}s", flush=True)

    cl, C = eng.chunk_length, eng.max_chunks
    L = cl * C

    # -- stage: host encode + pack ------------------------------------
    t0 = time.perf_counter()
    enc, lens = encode_batch(seqs, L)
    t_encode = time.perf_counter() - t0
    from readbouncer_tpu.classify.fused import pack4_np

    t0 = time.perf_counter()
    pk_a = pack4_np(enc[:, :cl])
    t_pack = time.perf_counter() - t0

    # -- stage: H2D put of the phase-A pool (synced) ------------------
    t0 = time.perf_counter()
    dev = jax.device_put(np.ascontiguousarray(pk_a).reshape(-1))
    np.asarray(dev[:1])
    t_put_a = time.perf_counter() - t0

    # -- full job, stage-by-stage -------------------------------------
    t0 = time.perf_counter()
    job = eng.classify_submit(seqs)
    t_submit = time.perf_counter() - t0  # encode+pack+put+dispatch A

    t0 = time.perf_counter()
    sync(job.futs_a[-1][0])  # phase A drained
    t_phase_a = time.perf_counter() - t0

    t0 = time.perf_counter()
    job.dispatch_b()  # pend fetch + phase-B pack/put/dispatch
    t_dispatch_b = time.perf_counter() - t0

    t0 = time.perf_counter()
    if job.futs_b:
        sync(job.futs_b[-1][2][-1][0])  # phase B drained
    t_phase_b = time.perf_counter() - t0

    t0 = time.perf_counter()
    job.finish()
    t_final = time.perf_counter() - t0  # final merged fetch (+unpack)

    total = t_submit + t_phase_a + t_dispatch_b + t_phase_b + t_final
    print(f"backend              : {jax.default_backend()}")
    print(f"reads                : {N} (device batch {B}, packing {job.packing})")
    print(f"host encode          : {t_encode*1e3:8.1f} ms")
    print(f"host pack (phase A)  : {t_pack*1e3:8.1f} ms")
    print(f"H2D phase-A pool     : {t_put_a*1e3:8.1f} ms ({pk_a.nbytes/1e6:.1f} MB synced)")
    print(f"submit (enc+pack+put+dispatch A): {t_submit*1e3:8.1f} ms")
    print(f"phase A compute      : {t_phase_a*1e3:8.1f} ms")
    print(f"dispatch B (pend fetch+pack+put): {t_dispatch_b*1e3:8.1f} ms")
    print(f"phase B compute      : {t_phase_b*1e3:8.1f} ms")
    print(f"final fetch          : {t_final*1e3:8.1f} ms")
    print(f"serial total         : {total:8.3f} s = {N/total:.0f} reads/s")


if __name__ == "__main__":
    main()
