#!/usr/bin/env python
"""Headline benchmark: offline classification throughput (reads/s).

Mirrors the reference's published benchmark shape — a 100k-read set
classified against 4 IBFs (3 target + 1 deplete), k=13 — at ~506 reads/s
on CPU (reference README.md:253-263; BASELINE.md).  Here: synthetic
genomes + reads (deterministic), one host, one chip; the measured span
covers host encode + device counts/thresholds/decisions, i.e. the full
classify hot path (classify/engine.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASELINE_READS_PER_SEC = 506.0  # reference README.md:253-263

GENOME_LEN = 300_000
N_READS = 40_960
READ_LEN = 1_000
ERROR_RATE = 0.1
BATCH_SIZE = 8_192


def synth_genome(rng: np.random.Generator, n: int) -> str:
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=n)])


def reads_from(rng: np.random.Generator, genome: str, n: int, length: int) -> list[str]:
    """Substrings with ERROR_RATE random substitutions (nanopore-ish)."""
    g = np.frombuffer(genome.encode(), dtype=np.uint8)
    starts = rng.integers(0, len(genome) - length, size=n)
    idx = starts[:, None] + np.arange(length)[None, :]
    arr = g[idx].copy()
    mut = rng.random((n, length)) < ERROR_RATE
    arr[mut] = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=int(mut.sum()))
    ]
    return [bytes(r).decode() for r in arr]


def main() -> None:
    from readbouncer_tpu.classify.engine import ClassifyEngine
    from readbouncer_tpu.ibf.build import build_ibf
    from readbouncer_tpu.ibf.params import IBFParams

    rng = np.random.default_rng(42)
    params = IBFParams(kmer_size=13, fragment_length=100_000)

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        targets, depletes = [], []
        genomes = {}
        for i in range(3):
            name = f"target{i}"
            genomes[name] = synth_genome(rng, GENOME_LEN)
            p = Path(td) / f"{name}.fasta"
            p.write_text(f">{name}\n{genomes[name]}\n")
            targets.append(build_ibf([p], params, name=name)[0])
        genomes["deplete"] = synth_genome(rng, GENOME_LEN)
        p = Path(td) / "deplete.fasta"
        p.write_text(f">deplete\n{genomes['deplete']}\n")
        depletes.append(build_ibf([p], params, name="deplete")[0])

    # read set: half on-target (split over the 3 targets), a quarter
    # deplete-derived, a quarter random (unclassifiable, runs all waves)
    seqs: list[str] = []
    per_t = N_READS // 6
    for i in range(3):
        seqs += reads_from(rng, genomes[f"target{i}"], per_t, READ_LEN)
    seqs += reads_from(rng, genomes["deplete"], N_READS // 4, READ_LEN)
    n_rand = N_READS - len(seqs)
    rand_g = synth_genome(rng, GENOME_LEN)
    seqs += reads_from(rng, rand_g, n_rand, READ_LEN)
    order = rng.permutation(len(seqs))
    seqs = [seqs[i] for i in order]

    engine = ClassifyEngine(
        targets, depletes, error_rate=ERROR_RATE, batch_size=BATCH_SIZE
    )
    # warmup: one FULL run — pool buckets are pow2-sized, so a small
    # warmup slice compiles different program shapes and the timed run
    # would pay minutes of server-side compile (same convention as
    # bench.py since round 4)
    t0 = time.perf_counter()
    engine.classify_sequences(seqs)
    print(f"# warmup (compile) run: {time.perf_counter()-t0:.1f}s")

    times = []
    for i in range(3):  # median-of-3 (tunnel variance is +-15%)
        t0 = time.perf_counter()
        classified, best, _ = engine.classify_sequences(seqs)
        times.append(time.perf_counter() - t0)
        print(f"# run {i+1}: {times[-1]:.2f}s")
    import numpy as _np
    elapsed = float(_np.median(times))

    reads_per_sec = len(seqs) / elapsed
    print(
        json.dumps(
            {
                "metric": "classify_reads_per_sec",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
