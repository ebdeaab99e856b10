"""RemoteBasecaller — the out-of-process (Guppy-slot) basecall client.

Reference semantics covered (src/basecaller/Guppy/GuppyBasecaller.cpp):
float->int16 conversion before transmission (:78-80), read_tag-based
result re-join tolerating out-of-order completion (:137-140), batched
submission (batch 200 start, GuppyBasecaller.hpp:34), bounded connect
(:24).  The server side is a thread running serve_basecalls over the
NearestLevel oracle — the stand-in for a guppy_basecall_server.
"""

import json
import socket
import threading

import numpy as np
import pytest

from readbouncer_tpu.errors import BasecallerError
from readbouncer_tpu.models.remote import RemoteBasecaller, serve_basecalls
from readbouncer_tpu.stream.replay import NearestLevelBasecaller, sequence_to_signal


def _server(basecall_fn, ready, served_out):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    ready["port"] = srv.getsockname()[1]
    ready["event"].set()
    with srv:
        served_out.append(serve_basecalls(srv, basecall_fn))


def _start_server(basecall_fn):
    ready = {"event": threading.Event()}
    served = []
    t = threading.Thread(target=_server, args=(basecall_fn, ready, served), daemon=True)
    t.start()
    ready["event"].wait(10)
    return ready["port"], t, served


def test_remote_basecaller_round_trip():
    rng = np.random.default_rng(3)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, 120)) for _ in range(7)]
    # noise below the int16 truncation floor keeps the oracle exact
    sigs = [sequence_to_signal(s, 9, 0.0, rng) for s in seqs]
    port, t, _ = _start_server(NearestLevelBasecaller().basecall)
    bc = RemoteBasecaller(port=port, batch_size=3)
    try:
        out = bc.basecall(sigs)
    finally:
        bc.close()
    assert out == seqs


def test_remote_basecaller_large_batch_no_deadlock():
    """A multi-MB batch against a serial request/response server must not
    deadlock (ADVICE r4): the client interleaves sends and receives, so
    the server's responses are drained while later reads are still being
    submitted.  A whole-batch sendall would wedge here once both socket
    buffers fill."""
    n, samples = 12, 100_000  # ~7 MB of JSON on the wire
    sigs = [np.full(samples, 100.0, np.float32) for _ in range(n)]
    echo = lambda batch: ["A" * 5 for _ in batch]
    port, t, served = _start_server(echo)
    bc = RemoteBasecaller(port=port, read_timeout=30.0)
    try:
        out = bc.basecall(sigs)
    finally:
        bc.close()
    assert out == ["A" * 5] * n
    t.join(10)
    assert served == [n]


def test_remote_basecaller_out_of_order_tags():
    """Results arriving out of order must re-join by tag."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def reversing_server():
        conn, _ = srv.accept()
        with conn, srv:
            rx = b""
            while rx.count(b"\n") < 4:
                rx += conn.recv(65536)
            reqs = [json.loads(l) for l in rx.split(b"\n") if l]
            for req in reversed(reqs):  # answer in reverse order
                seq = "A" * (req["tag"] % 5 + 1)  # tag-dependent payload
                conn.sendall((json.dumps({"tag": req["tag"], "seq": seq}) + "\n").encode())

    t = threading.Thread(target=reversing_server, daemon=True)
    t.start()
    bc = RemoteBasecaller(port=port, batch_size=4)
    try:
        out = bc.basecall([np.zeros(10, np.float32)] * 4)
    finally:
        bc.close()
    assert out == ["A" * (tag % 5 + 1) for tag in range(4)]


def test_remote_basecaller_int16_conversion():
    """The wire carries int16 samples (GuppyBasecaller.cpp:78-80)."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    seen = {}

    def capture_server():
        conn, _ = srv.accept()
        with conn, srv:
            rx = b""
            while b"\n" not in rx:
                rx += conn.recv(65536)
            req = json.loads(rx.split(b"\n")[0])
            seen["signal"] = req["signal"]
            conn.sendall((json.dumps({"tag": req["tag"], "seq": "ACGT"}) + "\n").encode())

    threading.Thread(target=capture_server, daemon=True).start()
    bc = RemoteBasecaller(port=port)
    try:
        out = bc.basecall([np.array([80.7, -3.2, 125.9], np.float32)])
    finally:
        bc.close()
    assert out == ["ACGT"]
    assert seen["signal"] == [80, -3, 125]  # truncated like the reference


def test_remote_basecaller_unreachable_raises():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        dead_port = s.getsockname()[1]
    bc = RemoteBasecaller(port=dead_port, connect_timeout=0.5)
    with pytest.raises(BasecallerError):
        bc.basecall([np.zeros(10, np.float32)])


def test_live_pipeline_with_remote_basecaller(tmp_path):
    """The full live loop driven through the remote (Guppy-slot) caller."""
    from readbouncer_tpu.ibf.build import build_ibf
    from readbouncer_tpu.ibf.params import IBFParams
    from readbouncer_tpu.stream.replay import ReplayRead, ReplaySource
    from readbouncer_tpu.stream.scheduler import AdaptiveSampler, LiveClassifier, LiveConfig

    rng = np.random.default_rng(13)
    host = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    (tmp_path / "host.fasta").write_text(f">host\n{host}\n")
    host_ibf, _ = build_ibf(
        [tmp_path / "host.fasta"], IBFParams(kmer_size=13, fragment_length=100_000),
        name="host",
    )
    reads = []
    for i in range(2):
        start = int(rng.integers(0, 2000))
        seq = host[start : start + 3000]
        reads.append(
            ReplayRead(
                read_id=f"h{i}",
                signal=sequence_to_signal(seq, 9, 0.0, rng),
                true_seq=seq,
            )
        )
    port, t, _ = _start_server(NearestLevelBasecaller().basecall)
    bc = RemoteBasecaller(port=port)
    src = ReplaySource(reads=reads, channels=2)
    cfg = LiveConfig(batch_size=16)
    sampler = AdaptiveSampler(
        source=src,
        basecaller=bc,
        classifier=LiveClassifier([], [host_ibf], cfg),
        output_dir=tmp_path,
        cfg=cfg,
    )
    stats = sampler.run(max_ticks=40)
    bc.close()
    assert stats.unblocked == 2  # deplete-only: host reads ejected
