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


def test_aggregate_counters_int_exact_above_2_53():
    # int counters must not round-trip through float64 (exact only below
    # 2**53); 2**53 + 1 is the first integer float64 cannot represent
    big = (1 << 53) + 1
    agg = aggregate_counters({"n": big, "m": 3})
    assert agg["n"] == big
    assert isinstance(agg["n"], int)
    assert agg["m"] == 3


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


_CLASSIFY_WORKER = r"""
import json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
work = sys.argv[4]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
sys.path.insert(0, os.environ["REPO"])
from readbouncer_tpu.classify.engine import classify_read_files
from readbouncer_tpu.ibf.build import build_ibf
from readbouncer_tpu.ibf.params import IBFParams
from readbouncer_tpu.parallel.distributed import aggregate_counters

params = IBFParams(kmer_size=13, fragment_length=100_000)
target, _ = build_ibf([f"{work}/targetA.fasta"], params, name="targetA")
deplete, _ = build_ibf([f"{work}/host.fasta"], params, name="host")
res = classify_read_files(
    [f"{work}/reads.fasta"],
    target_filters=[target],
    deplete_filters=[deplete],
    error_rate=0.1,
    output_dir=f"{work}/out_multi",
    verbose=False,
    shard=(pid, nproc),
    output_suffix=f".h{pid}",
)
total = aggregate_counters(
    {
        "found": res.found,
        "failed": res.failed,
        "too_short": res.too_short,
        "read_counter": res.read_counter,
        "t:targetA": res.per_target["targetA"],
    }
)
if pid == 0:
    print("RESULT " + json.dumps(total))
"""


def test_two_process_classify_end_to_end(tmp_path):
    """Two jax.distributed processes run classify_read_files with
    shard=(i,2): outputs are disjoint, summed counters == the
    single-process run (SURVEY §2.2 last row; multi-host classify)."""
    from readbouncer_tpu.classify.engine import classify_read_files
    from readbouncer_tpu.ibf.build import build_ibf
    from readbouncer_tpu.ibf.params import IBFParams

    rng = np.random.default_rng(23)

    def rand_seq(n):
        return "".join("ACGT"[i] for i in rng.integers(0, 4, n))

    refs = {"targetA": rand_seq(3000), "host": rand_seq(3000)}
    for name, seq in refs.items():
        (tmp_path / f"{name}.fasta").write_text(f">{name}\n{seq}\n")
    reads = []
    for i in range(6):
        s = int(rng.integers(0, 2600))
        reads.append((f"a_{i}", refs["targetA"][s : s + 400]))
    for i in range(5):
        s = int(rng.integers(0, 2600))
        reads.append((f"h_{i}", refs["host"][s : s + 400]))
    reads.append(("short_0", "ACGT" * 20))
    rng.shuffle(reads)
    (tmp_path / "reads.fasta").write_text(
        "".join(f">{rid}\n{seq}\n" for rid, seq in reads)
    )

    # single-process oracle
    params = IBFParams(kmer_size=13, fragment_length=100_000)
    target, _ = build_ibf([tmp_path / "targetA.fasta"], params, name="targetA")
    deplete, _ = build_ibf([tmp_path / "host.fasta"], params, name="host")
    solo = classify_read_files(
        [tmp_path / "reads.fasta"],
        target_filters=[target],
        deplete_filters=[deplete],
        error_rate=0.1,
        output_dir=tmp_path / "out_solo",
        verbose=False,
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["REPO"] = str(Path(__file__).resolve().parent.parent)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    script = tmp_path / "worker.py"
    script.write_text(_CLASSIFY_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port), str(tmp_path)],
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
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("classify workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed: {err[-2000:]}"
    result_lines = [
        ln for rc, out, _ in outs for ln in out.splitlines() if ln.startswith("RESULT ")
    ]
    assert len(result_lines) == 1
    total = json.loads(result_lines[0][len("RESULT "):])
    assert total["found"] == solo.found
    assert total["failed"] == solo.failed
    assert total["too_short"] == solo.too_short
    assert total["read_counter"] == solo.read_counter
    assert total["t:targetA"] == solo.per_target["targetA"]

    def ids_in(path):
        if not path.exists():
            return set()
        return {
            ln[1:].split()[0]
            for ln in path.read_text().splitlines()
            if ln.startswith(">")
        }

    out_multi = tmp_path / "out_multi"
    for stem in ("targetA", "unclassified"):
        h0 = ids_in(out_multi / f"{stem}.h0.fasta")
        h1 = ids_in(out_multi / f"{stem}.h1.fasta")
        assert not (h0 & h1), f"{stem}: shard outputs overlap"
        solo_ids = ids_in(tmp_path / "out_solo" / f"{stem}.fasta")
        assert (h0 | h1) == solo_ids


_BINS_TP_WORKER = r"""
import json, os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
work = sys.argv[4]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
sys.path.insert(0, os.environ["REPO"])
from jax.sharding import Mesh

from readbouncer_tpu.classify.engine import encode_batch
from readbouncer_tpu.classify.math import ci_and_threshold_batch
from readbouncer_tpu.ibf.build import build_ibf
from readbouncer_tpu.ibf.params import IBFParams
from readbouncer_tpu.ibf.query import FilterStack
from readbouncer_tpu.parallel.mesh import BINS_AXIS
from readbouncer_tpu.parallel.sharded import ShardedFilterStack

params = IBFParams(kmer_size=13, fragment_length=100_000)
ibf, _ = build_ibf([f"{work}/targetA.fasta"], params, name="targetA")
stack = FilterStack([ibf])
assert stack.words % 2 == 0, stack.words

# every process holds the same global inputs; the mesh spans BOTH
# processes' devices -> the bins-axis segment-max reduction crosses
# the process boundary (the rebuild's DCN-analog collective)
devs = np.array(jax.devices()[:2])
mesh = Mesh(devs.reshape(2), (BINS_AXIS,))
sh = ShardedFilterStack(stack, mesh)

ref = open(f"{work}/targetA.fasta").read().split("\n", 1)[1].replace("\n", "")
seqs = [ref[i * 300 : i * 300 + 280] for i in range(8)]
reads, lens = encode_batch(seqs, 280)
thr_b = ci_and_threshold_batch(lens, 13, 0.1, 0.95)
thr_r = ci_and_threshold_batch(lens, 13, 0.08, 0.95)
mb, mr = sh.max_counts_dual(reads, lens, thr_b, thr_r)

# single-process oracle on the local stack
counts = stack.counts(reads, lens)
want_b = np.asarray(stack.max_counts(counts, thr_b))
want_r = np.asarray(stack.max_counts(counts, thr_r))
# out is replicated over the bins mesh: each process's local shard IS
# the full result
got_b = np.asarray(mb.addressable_shards[0].data)
got_r = np.asarray(mr.addressable_shards[0].data)
np.testing.assert_array_equal(got_b, want_b)
np.testing.assert_array_equal(got_r, want_r)
if pid == 0:
    print("RESULT " + json.dumps({"ok": 1, "max": int(want_b.max())}))
"""


def test_two_process_bins_sharded_classify(tmp_path):
    """Bins-TP across TWO jax.distributed processes: the filter's word
    axis shards over a mesh spanning both processes and the per-filter
    segment max reduces across the process boundary — the real
    cross-host collective path (SURVEY §5.8), asserted equal to the
    single-process oracle."""
    rng = np.random.default_rng(41)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    (tmp_path / "targetA.fasta").write_text(f">targetA\n{ref}\n")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["REPO"] = str(Path(__file__).resolve().parent.parent)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    script = tmp_path / "worker.py"
    script.write_text(_BINS_TP_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port), str(tmp_path)],
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
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("bins-TP workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed: {err[-2000:]}"
    result_lines = [
        ln for rc, out, _ in outs for ln in out.splitlines() if ln.startswith("RESULT ")
    ]
    assert len(result_lines) == 1
    res = json.loads(result_lines[0][len("RESULT "):])
    assert res["ok"] == 1 and res["max"] > 0  # on-target reads matched


_LIVE_WORKER = r"""
import csv, json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
work = sys.argv[4]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
sys.path.insert(0, os.environ["REPO"])
from readbouncer_tpu.main import main
from readbouncer_tpu.parallel.distributed import aggregate_counters

assert main(["--config", f"{work}/target_h{pid}.toml"]) == 0
rows = list(
    csv.reader(
        open(f"{work}/out_h{pid}/read_until_decision_stats.csv"), delimiter=";"
    )
)[1:]
total = aggregate_counters(
    {
        "decisions": len(rows),
        "unblock": sum(r[4] == "unblock" for r in rows),
        "stop": sum(r[4] == "stop_receiving" for r in rows),
    }
)
if pid == 0:
    print("RESULT " + json.dumps(total))
"""


def _live_toml(work, out_dir):
    return f'''
usage = "target"
output_directory = "{work}/{out_dir}"
log_directory = "{work}/log_{out_dir}"

[IBF]
kmer_size = 13
fragment_size = 2000
target_files = ["{work}/target.fasta"]
deplete_files = ["{work}/host.fasta"]
exp_seq_error_rate = 0.1

[MinKNOW]
channels = [1, 6]

[Basecaller]
caller = "Oracle"

[TPU]
batch_size = 16
replay_file = "{work}/live_reads.fasta"
'''


def test_two_process_live_target_end_to_end(tmp_path):
    """The live counterpart of test_two_process_classify_end_to_end
    (VERDICT r4 missing #4): two jax.distributed processes run the FULL
    target-mode replay pipeline (main.py run_target) over host-sharded
    channels/reads.  Per-host decision CSVs are disjoint, their union
    equals the single-process run's decisions read-for-read, and the
    cross-process aggregated counters equal the solo totals.
    Reference pipeline: src/main/adaptive_sampling.hpp:555-774."""
    import csv as _csv

    rng = np.random.default_rng(77)

    def rand_seq(n):
        return "".join("ACGT"[i] for i in rng.integers(0, 4, n))

    target, host = rand_seq(6000), rand_seq(6000)
    (tmp_path / "target.fasta").write_text(f">target\n{target}\n")
    (tmp_path / "host.fasta").write_text(f">host\n{host}\n")
    lines = []
    for i in range(3):
        s = int(rng.integers(0, 3000))
        lines.append(f">t_{i}\n{target[s:s+3000]}")
    for i in range(3):
        s = int(rng.integers(0, 3000))
        lines.append(f">h_{i}\n{host[s:s+3000]}")
    (tmp_path / "live_reads.fasta").write_text("\n".join(lines) + "\n")

    def decisions_of(csv_path):
        if not csv_path.exists():
            return {}
        rows = list(_csv.reader(open(csv_path), delimiter=";"))[1:]
        return {r[0]: r[4] for r in rows}

    # single-process oracle run (same CLI path)
    from readbouncer_tpu.main import main as rb_main

    (tmp_path / "target_solo.toml").write_text(_live_toml(tmp_path, "out_solo"))
    assert rb_main(["--config", str(tmp_path / "target_solo.toml")]) == 0
    solo = decisions_of(tmp_path / "out_solo" / "read_until_decision_stats.csv")
    assert len(solo) == 6  # every read decided
    assert sum(1 for d in solo.values() if d == "unblock") == 3

    for pid in range(2):
        (tmp_path / f"target_h{pid}.toml").write_text(
            _live_toml(tmp_path, f"out_h{pid}")
        )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["REPO"] = str(Path(__file__).resolve().parent.parent)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    script = tmp_path / "worker.py"
    script.write_text(_LIVE_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port), str(tmp_path)],
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
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("live workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed: {err[-2000:]}"
    result_lines = [
        ln for rc, out, _ in outs for ln in out.splitlines() if ln.startswith("RESULT ")
    ]
    assert len(result_lines) == 1
    total = json.loads(result_lines[0][len("RESULT "):])

    h0 = decisions_of(tmp_path / "out_h0" / "read_until_decision_stats.csv")
    h1 = decisions_of(tmp_path / "out_h1" / "read_until_decision_stats.csv")
    assert not (set(h0) & set(h1)), "per-host decision CSVs overlap"
    merged = {**h0, **h1}
    assert merged == solo  # same decision for every read, across hosts
    assert total == {
        "decisions": len(solo),
        "unblock": sum(1 for d in solo.values() if d == "unblock"),
        "stop": sum(1 for d in solo.values() if d == "stop_receiving"),
    }
