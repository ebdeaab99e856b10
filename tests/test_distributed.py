"""Multi-host wiring (parallel/distributed.py).

The single-process helpers are tested in-process; the real multi-process
path runs TWO actual jax.distributed processes on the CPU backend (the
closest this single-chip environment can get to N hosts — SURVEY.md
build-plan step 8) and checks sharding + cross-process aggregation.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from readbouncer_tpu.parallel.distributed import (
    aggregate_counters,
    allgather_pytree,
    host_shard,
)


def test_host_shard_balanced():
    items = list(range(10))
    shards = [host_shard(items, i, 3) for i in range(3)]
    assert [len(s) for s in shards] == [4, 3, 3]
    assert sum(shards, []) == items
    assert host_shard(items, 0, 1) == items


def test_single_process_aggregation():
    tree = {"a": np.arange(3)}
    g = allgather_pytree(tree)
    assert g["a"].shape == (1, 3)
    agg = aggregate_counters({"x": 2, "y": 1.5})
    assert agg == {"x": 2, "y": 1.5}


_WORKER = r"""
import json, os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
sys.path.insert(0, os.environ["REPO"])
from readbouncer_tpu.parallel.distributed import (
    aggregate_counters, host_shard, process_count, process_index,
)
assert process_count() == nproc and process_index() == pid
items = list(range(7))
mine = host_shard(items)
total = aggregate_counters({"n": len(mine), "s": float(sum(mine))})
if pid == 0:
    print("RESULT " + json.dumps(total))
"""


def test_two_process_cpu_cluster(tmp_path):
    """Two real jax.distributed processes shard work and aggregate."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["REPO"] = str(Path(__file__).resolve().parent.parent)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed: {err[-2000:]}"
    result_lines = [
        ln for rc, out, _ in outs for ln in out.splitlines() if ln.startswith("RESULT ")
    ]
    assert len(result_lines) == 1
    total = json.loads(result_lines[0][len("RESULT "):])
    # 7 items over 2 hosts: all items counted exactly once across hosts
    assert total == {"n": 7, "s": float(sum(range(7)))}
