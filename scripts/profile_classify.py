#!/usr/bin/env python
"""Phase-level timing of the classify hot path on the current backend.

Reuses bench.py's synthetic workload; reports host encode, phase-A
device, phase-B device, and end-to-end times so optimization targets
the right stage.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench as bm
from readbouncer_tpu.classify.engine import ClassifyEngine, encode_batch
from readbouncer_tpu.ibf.build import build_ibf
from readbouncer_tpu.ibf.params import IBFParams


def main() -> None:
    rng = np.random.default_rng(42)
    params = IBFParams(kmer_size=13, fragment_length=100_000)
    with tempfile.TemporaryDirectory() as td:
        targets, depletes, genomes = [], [], {}
        for i in range(3):
            name = f"target{i}"
            genomes[name] = bm.synth_genome(rng, bm.GENOME_LEN)
            p = Path(td) / f"{name}.fasta"
            p.write_text(f">{name}\n{genomes[name]}\n")
            targets.append(build_ibf([p], params, name=name)[0])
        genomes["deplete"] = bm.synth_genome(rng, bm.GENOME_LEN)
        p = Path(td) / "deplete.fasta"
        p.write_text(f">deplete\n{genomes['deplete']}\n")
        depletes.append(build_ibf([p], params, name="deplete")[0])

    seqs = []
    per_t = bm.N_READS // 6
    for i in range(3):
        seqs += bm.reads_from(rng, genomes[f"target{i}"], per_t, bm.READ_LEN)
    seqs += bm.reads_from(rng, genomes["deplete"], bm.N_READS // 4, bm.READ_LEN)
    n_rand = bm.N_READS - len(seqs)
    seqs += bm.reads_from(rng, bm.synth_genome(rng, bm.GENOME_LEN), n_rand, bm.READ_LEN)
    order = rng.permutation(len(seqs))
    seqs = [seqs[i] for i in order]

    B = bm.BATCH_SIZE
    eng = ClassifyEngine(targets, depletes, error_rate=bm.ERROR_RATE, batch_size=B)
    eng.classify_sequences(seqs[:B])  # warm both phases

    cl, C = eng.chunk_length, eng.max_chunks
    L = cl * C

    # host encode only
    t0 = time.perf_counter()
    encs = []
    for start in range(0, len(seqs), B):
        encs.append(encode_batch(seqs[start : start + B], L, batch=B))
    t_encode = time.perf_counter() - t0

    # phase A device (sync at end)
    fn_a = eng._fused_fn(1, 0)
    t0 = time.perf_counter()
    outs = [fn_a(np.ascontiguousarray(r[:, :cl]), l) for r, l in encs]
    jax.block_until_ready(outs)
    t_a = time.perf_counter() - t0

    # one batch of phase A, synchronous (pure step latency)
    r0, l0 = encs[0]
    a0 = np.ascontiguousarray(r0[:, :cl])
    t0 = time.perf_counter()
    jax.block_until_ready(fn_a(a0, l0))
    t_a1 = time.perf_counter() - t0

    # phase B device on a full batch of 5-chunk work (upper bound shape)
    fn_b = eng._fused_fn(C - 1, 1)
    rb = np.ascontiguousarray(r0[:, cl:])
    lb = np.maximum(l0 - cl, 0).astype(l0.dtype)
    jax.block_until_ready(fn_b(rb, lb))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(fn_b(rb, lb))
    t_b1 = time.perf_counter() - t0

    # end to end
    t0 = time.perf_counter()
    eng.classify_sequences(seqs)
    t_e2e = time.perf_counter() - t0

    n_batches = len(encs)
    print(f"backend          : {jax.default_backend()}")
    print(f"batches          : {n_batches} x {B}")
    print(f"host encode      : {t_encode*1e3:8.1f} ms total")
    print(f"phase A pipelined: {t_a*1e3:8.1f} ms total ({t_a/n_batches*1e3:.1f}/batch)")
    print(f"phase A 1 batch  : {t_a1*1e3:8.1f} ms (sync)")
    print(f"phase B 1 batch  : {t_b1*1e3:8.1f} ms (sync, {C-1} chunks)")
    print(f"end-to-end       : {t_e2e*1e3:8.1f} ms  -> {len(seqs)/t_e2e:.0f} reads/s")


if __name__ == "__main__":
    main()
