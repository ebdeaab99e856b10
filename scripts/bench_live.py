#!/usr/bin/env python
"""Live adaptive-sampling latency benchmark (VERDICT r2 missing #4).

Replays a full 512-channel run against the realistic filter geometry
(4 filters x 512 bins x 100 kb fragments — bench.py's cache) and
reports per-tick decision latency: every tick delivers one 0.4 s signal
window per active channel (the MinKNOW cadence contract,
reference src/main/adaptive_sampling.hpp:633-634) and the pipeline must
decide inside that budget; BASELINE.md's bar is p50 < 100 ms.

Run:  python scripts/bench_live.py [--channels 512] [--reads 2048]
          [--caller oracle|synth48] [--ticks N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--reads", type=int, default=2048)
    ap.add_argument("--read-bases", type=int, default=4000)
    ap.add_argument("--caller", default="oracle")
    ap.add_argument("--ticks", type=int, default=0, help="0 = run to completion")
    ap.add_argument("--batch", type=int, default=512)
    # frames per 0.4 s chunk: (1600 - 66)//5 + 1 = 307, padded to a
    # multiple of 64 — the default 2048 would pad every tick 6.7x
    ap.add_argument("--max-frames", type=int, default=320)
    ap.add_argument(
        "--mid-len", type=int, default=0,
        help="extra length bucket between 512 and 2048 (LiveConfig.mid_len)",
    )
    ap.add_argument(
        "--random-frac", type=float, default=0.0,
        help="fraction of reads drawn from no genome (unclassifiable): "
        "they retry through once_seen up to the 1500 bp give-up, "
        "exercising the concat/mid/long-bucket path every tick",
    )
    args = ap.parse_args()

    from bench import get_filters, reads_from
    from readbouncer_tpu.ibf.params import IBFParams
    from readbouncer_tpu.stream.replay import (
        NearestLevelBasecaller,
        ReplayRead,
        ReplaySource,
        sequence_to_signal,
    )
    from readbouncer_tpu.stream.scheduler import AdaptiveSampler, LiveClassifier, LiveConfig

    params = IBFParams(kmer_size=13, fragment_length=100_000)
    filters, genomes = get_filters(params)
    targets, depletes = filters[:3], filters[3:]

    rng = np.random.default_rng(7)
    n_r = int(args.reads * args.random_frac)
    n_t = (args.reads - n_r) // 2
    n_d = args.reads - n_r - n_t
    seqs = reads_from(rng, genomes[0], n_t, args.read_bases) + reads_from(
        rng, genomes[3], n_d, args.read_bases
    )
    if n_r:
        from bench import synth_genome

        seqs += reads_from(
            rng, synth_genome(rng, 1_000_000), n_r, args.read_bases
        )
    order = rng.permutation(len(seqs))
    reads = [
        ReplayRead(
            read_id=f"r{i}",
            signal=sequence_to_signal(seqs[j], rng=rng),
            true_seq=seqs[j],
        )
        for i, j in enumerate(order)
    ]

    src = ReplaySource(reads=reads, channels=args.channels)
    cfg = LiveConfig(
        batch_size=args.batch, profile_ticks=True, mid_len=args.mid_len
    )
    if args.caller == "oracle":
        basecaller = NearestLevelBasecaller()
    else:
        from readbouncer_tpu.models.basecaller import GRUBasecaller

        basecaller = GRUBasecaller(network=args.caller, max_frames=args.max_frames)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        sampler = AdaptiveSampler(
            source=src,
            basecaller=basecaller,
            classifier=LiveClassifier(targets, depletes, cfg),
            output_dir=td,
            cfg=cfg,
        )
        # warmup BOTH length-bucket programs (the short one fires on the
        # first tick, the long one only on the first once_seen retry —
        # mid-run server-side compiles cost minutes on the tunnel)
        t0 = time.monotonic()
        sampler.classifier.decide(
            ["ACGT" * (w // 4) for w in sampler.classifier.bucket_lens]
        )
        print(f"# classifier warmup (compiles): {time.monotonic()-t0:.1f}s", flush=True)
        if args.caller != "oracle":
            # warm every power-of-two GRU batch bucket the run will hit
            # (tick chunk counts shrink as channels drain)
            t0 = time.monotonic()
            b = 32
            while b <= max(32, args.channels):
                basecaller.basecall([np.zeros(1600, np.float32)] * b)
                b *= 2
            print(f"# basecaller warmup (compiles): {time.monotonic()-t0:.1f}s", flush=True)
        t0 = time.monotonic()
        sampler.step()
        print(f"# first tick: {time.monotonic()-t0:.1f}s", flush=True)
        t_run = time.monotonic()
        max_ticks = args.ticks if args.ticks > 0 else None
        stats = sampler.run(max_ticks=max_ticks)
        wall = time.monotonic() - t_run

    lat = np.array(stats.tick_latencies[1:] or [0.0])  # skip compile tick
    budget = 0.4  # break_reads_after_seconds (adaptive_sampling.hpp:634)
    print(stats.report())

    # p95-tail attribution: composition of the slowest ticks vs the rest
    prof = stats.tick_profile[1:]
    if prof:
        p95 = float(np.percentile([p["latency_ms"] for p in prof], 95))
        tail = [p for p in prof if p["latency_ms"] >= p95]
        body = [p for p in prof if p["latency_ms"] < p95]

        def comp(ps, key):
            vals = [p.get(key, 0) for p in ps]
            return round(float(np.mean(vals)), 1) if vals else 0.0

        for name, ps in (("tail(>=p95)", tail), ("body", body)):
            print(
                f"# {name}: n={len(ps)} "
                f"lat={comp(ps,'latency_ms')}ms "
                f"bc={comp(ps,'basecall_ms')}ms cl={comp(ps,'classify_ms')}ms "
                f"chunks={comp(ps,'chunks')} items={comp(ps,'items')} "
                f"long={comp(ps,'long_items')} retry={comp(ps,'retry_items')}",
                flush=True,
            )
    print(
        json.dumps(
            {
                "metric": "live_p50_tick_latency_ms",
                "value": round(float(np.median(lat)) * 1e3, 2),
                "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 2),
                "max_ms": round(float(lat.max()) * 1e3, 2),
                "ticks": stats.ticks,
                "channels": args.channels,
                "reads": len(reads),
                "unblocked": stats.unblocked,
                "stop_received": stats.stop_received,
                "within_0.4s_budget_pct": round(
                    100.0 * float((lat < budget).mean()), 2
                ),
                "wall_seconds": round(wall, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
