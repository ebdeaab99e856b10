"""Run-control surface over the replay source (stream/control.py)."""

import numpy as np
import pytest

from readbouncer_tpu.errors import ConfigError
from readbouncer_tpu.stream.control import ReplayConnection
from readbouncer_tpu.stream.replay import ReplayRead, ReplaySource


def _source(n=2):
    reads = [
        ReplayRead(read_id=f"r{i}", signal=np.ones(3200, np.float32))
        for i in range(n)
    ]
    return ReplaySource(reads=reads, channels=4)


def test_bootstrap_sequence():
    src = _source()
    conn = ReplayConnection(src, "FC1").connect()
    assert conn.connected
    assert conn.acquisition.has_started()
    assert not conn.acquisition.is_finished()
    assert conn.device.device_id() == "FC1"
    assert conn.device.state() == "DEVICE_READY"
    assert conn.manager.resolve_rpc_port() == 9501
    assert "FC1" in conn.summary()


def test_break_reads_cadence_applies_to_source():
    src = _source()
    conn = ReplayConnection(src).connect()
    conn.analysis.set_break_reads_after_seconds(0.8)
    assert src.break_seconds == 0.8
    assert src.chunk_samples == int(src.sample_rate * 0.8)
    # one tick now delivers 0.8 s windows
    chunks = src.tick()
    assert chunks and chunks[0].signal.shape[0] == src.chunk_samples


def test_empty_source_refuses_connect():
    src = ReplaySource(reads=[], channels=1)
    with pytest.raises(ConfigError):
        ReplayConnection(src).connect()


def test_acquisition_finishes_when_replay_drains():
    src = _source(1)
    conn = ReplayConnection(src).connect()
    while not src.finished:
        src.tick()
    assert conn.acquisition.is_finished()
    assert conn.device.state() == "DEVICE_DISCONNECTED"
