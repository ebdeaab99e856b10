#!/usr/bin/env python
"""Host<->device transfer mechanics over the axon tunnel.

The engine's dataflow design (one-big-upload + on-device slicing vs
per-batch uploads) hinges on the tunnel's small-transfer latency and
large-transfer bandwidth, both of which vary day to day.  Measures:

* H2D latency/bandwidth at 4 KB .. 64 MB
* D2H (device_get) latency at 4 B .. 4 MB
* whether queued device_puts pipeline (5 puts + one sync vs 5 synced)

Run:  python scripts/transfer_probe.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    print("-- H2D: single device_put, synced (block_until_ready + scalar fetch)")
    for size in (4 << 10, 512 << 10, 4 << 20, 64 << 20):
        host = np.random.randint(0, 255, size=size, dtype=np.uint8)
        x = jax.device_put(host)  # warm layout
        np.asarray(x[0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            x = jax.device_put(host)
            np.asarray(x[0])  # true completion (tunnel acks early otherwise)
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        print(f"  {size/1e6:8.3f} MB: {ms:8.1f} ms  {size/1e6/ms*1e3:8.1f} MB/s", flush=True)

    print("-- H2D: 5 queued puts then one sync (do transfers pipeline?)")
    host = np.random.randint(0, 255, size=512 << 10, dtype=np.uint8)
    jax.device_put(host)
    t0 = time.perf_counter()
    xs = [jax.device_put(host) for _ in range(5)]
    for x in xs:
        np.asarray(x[0])
    dt = (time.perf_counter() - t0) * 1e3
    print(f"  5 x 0.5 MB queued: {dt:.1f} ms total ({dt/5:.1f} ms each)", flush=True)

    print("-- D2H: device_get of n bytes (device-resident array)")
    for size in (4, 4 << 10, 512 << 10, 4 << 20):
        x = jax.device_put(np.zeros(max(size, 4), dtype=np.uint8))
        np.asarray(x)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(x)
            ts.append(time.perf_counter() - t0)
        print(f"  {size/1e6:8.3f} MB: {min(ts)*1e3:8.1f} ms", flush=True)

    print("-- D2H: fetch a pytree of 20 x 40KB at once (batched round trip?)")
    xs = [jax.device_put(np.zeros(40 << 10, dtype=np.uint8)) for _ in range(20)]
    [np.asarray(x[0]) for x in xs]
    t0 = time.perf_counter()
    jax.device_get(xs)
    print(f"  20 x 40KB device_get: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    print("-- dispatch latency: trivial jitted fn, queued x20 + one sync")
    f = jax.jit(lambda x: x + 1)
    x = jax.device_put(np.zeros(8, dtype=np.int32))
    np.asarray(f(x)[0])
    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = f(y)
    np.asarray(y[0])
    print(f"  20 chained dispatches: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
