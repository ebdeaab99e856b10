#!/usr/bin/env python
"""Native IBF build throughput (the claim tracked in ibf/build.py docs).

Builds one realistic filter — 512 x 100 kb fragments (51.2 Mb genome),
k=13, rbt1 h=3 — through the production path (build_ibf -> native
_native.insert_fragments scatter-OR workers; reference counterpart:
the reader+worker insert pipeline, src/IBF/IBFBuild.cpp:28,153-156) and
reports Mbases/s.  Host-only: no TPU involved in build.

Prints ONE JSON line like bench.py.  Usage:
    python scripts/bench_build.py [--mb 51.2] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=51.2, help="genome megabases")
    ap.add_argument("--runs", type=int, default=3, help="timed runs (median)")
    args = ap.parse_args()

    from readbouncer_tpu.ibf.build import build_ibf
    from readbouncer_tpu.ibf.params import IBFParams

    n = int(args.mb * 1e6)
    rng = np.random.default_rng(7)
    genome = bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, n)])
    params = IBFParams(kmer_size=13, fragment_length=100_000)
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "g.fasta"
        path.write_bytes(b">g\n" + genome + b"\n")
        times = []
        for i in range(args.runs):
            t0 = time.monotonic()
            ibf, stats = build_ibf([path], params, name="g")
            times.append(time.monotonic() - t0)
            print(
                f"# run {i+1}: {times[-1]:.2f}s "
                f"({args.mb/times[-1]:.1f} Mb/s, {ibf.rows} rows x {ibf.words} words)",
                file=sys.stderr,
            )
    med = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "ibf_build_mbases_per_sec",
                "value": round(args.mb / med, 2),
                "unit": "Mb/s",
                "genome_mb": args.mb,
                "median_seconds": round(med, 2),
                "runs": args.runs,
            }
        )
    )


if __name__ == "__main__":
    main()
