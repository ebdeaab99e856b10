"""Shared microbenchmark helpers for the probe/profile scripts.

The tunnel's `block_until_ready` acks before execution completes
(docs/PERF_NOTES.md "tunnel caveats"), so the only true sync is a D2H
fetch of one element — `sync` embodies that; `timeit` amortizes a
dispatch loop over it and reports the best of several passes.  One
definition, imported by gather_probe/dma_gather_probe/dedup_probe/
profile_classify, so methodology fixes land once.
"""

from __future__ import annotations

import time

import numpy as np


def sync(out):
    """Truly synchronize on a device result (tree of arrays ok)."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, n: int = 15, passes: int = 3, verbose: bool = True):
    """Median-of-passes per-call time of fn(*args), synced per pass."""
    t0 = time.time()
    out = fn(*args)
    sync(out)
    if verbose:
        print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) / n)
    return float(np.median(ts))
