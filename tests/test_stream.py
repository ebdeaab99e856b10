"""Replay source + action sender: protocol contract tests."""

import numpy as np
import pytest

from readbouncer_tpu.stream.actions import Action, ActionSender
from readbouncer_tpu.stream.replay import ReplayRead, ReplaySource, sequence_to_signal


def _mk_source(n_reads=4, sig_len=4000, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    reads = [
        ReplayRead(read_id=f"r{i}", signal=rng.normal(100, 5, sig_len).astype(np.float32))
        for i in range(n_reads)
    ]
    return ReplaySource(reads=reads, channels=channels)


def test_sequence_to_signal_shape():
    sig = sequence_to_signal("ACGT" * 10, samples_per_base=9)
    assert sig.shape == (360,)
    assert sig.dtype == np.float32


def test_tick_chunk_cadence():
    src = _mk_source(n_reads=1, sig_len=4000, channels=1)
    # 0.4 s at 4 kHz = 1600 samples/chunk -> 3 chunks (1600,1600,800)
    sizes = []
    while not src.finished:
        for c in src.tick():
            sizes.append(c.signal.shape[0])
    assert sizes == [1600, 1600, 800]


def test_channels_parallel_and_refill():
    src = _mk_source(n_reads=4, sig_len=3200, channels=2)
    chunks = src.tick()
    assert sorted(c.channel for c in chunks) == [1, 2]
    ticks = 1
    while not src.finished:
        src.tick()
        ticks += 1
    assert src.stats["reads_started"] == 4
    assert src.stats["reads_completed"] == 4
    # 2 channels x 2 reads each x 2 ticks per read
    assert ticks >= 4


def test_unblock_removes_read_and_counts_saved_samples():
    src = _mk_source(n_reads=2, sig_len=8000, channels=1)
    chunks = src.tick()
    c = chunks[0]
    assert src.unblock(c.channel, c.read_number)
    assert src.stats["unblocked"] == 1
    assert src.stats["samples_saved"] == 8000 - 1600
    # channel refills with the next read on the next tick
    nxt = src.tick()
    assert nxt[0].read_id == "r1"
    # unblocking a gone read fails (MinKNOW failed_to_apply analog)
    assert not src.unblock(c.channel, c.read_number)


def test_stop_receiving_suppresses_chunks_but_occupies_channel():
    src = _mk_source(n_reads=2, sig_len=4800, channels=1)
    c = src.tick()[0]
    assert src.stop_receiving(c.channel, c.read_number)
    assert src.tick() == []  # read still sequencing silently
    assert src.tick() == []
    nxt = src.tick()  # read done; next read starts
    assert nxt and nxt[0].read_id == "r1"


def test_action_sender_pacing_and_csv(tmp_path):
    src = _mk_source(n_reads=2, sig_len=8000, channels=2)
    chunks = src.tick()
    sender = ActionSender(src, tmp_path, batch_size=50)
    for c in chunks:
        sender.queue(
            Action(c.channel, c.read_number, c.read_id, unblock=True, seq_length=100)
        )
    n = sender.flush()
    assert n == 2
    assert sender.succeeded == 2
    sender.close()
    csv_text = (tmp_path / "read_until_decision_stats.csv").read_text()
    assert csv_text.count("unblock") == 2
    assert "read_id;channel;read_nr" in csv_text


def test_action_batch_adaptation():
    src = _mk_source(n_reads=1, sig_len=1600, channels=1)
    sender = ActionSender(src, "/tmp", batch_size=10)
    # queue longer than batch -> batch grows by backlog
    for i in range(25):
        sender.queue(Action(99, i, f"x{i}", unblock=True))
    sender.flush()
    assert sender.batch_size == 35  # 10 + 25
    sender.close()


def test_action_sender_retries_transient_failures(tmp_path):
    """Fault injection: exceptions from the sink are retried 5x then
    raised; False (read gone) is permanent (reference Data.cpp:229-243)."""
    from readbouncer_tpu.stream.actions import Action, ActionSender

    class FlakySource:
        def __init__(self, fail_times):
            self.fail_times = fail_times
            self.calls = 0
            self.applied = []

        def unblock(self, ch, nr):
            self.calls += 1
            if self.calls <= self.fail_times:
                raise ConnectionError("transient")
            self.applied.append((ch, nr))
            return True

        def stop_receiving(self, ch, nr):
            return False

    src = FlakySource(fail_times=2)
    sender = ActionSender(src, tmp_path)
    sender.queue(Action(channel=1, read_number=7, read_id="r", unblock=True))
    assert sender.flush() == 1
    assert sender.retries == 2 and src.applied == [(1, 7)]

    src2 = FlakySource(fail_times=99)
    sender2 = ActionSender(src2, tmp_path / "b")
    sender2.queue(Action(channel=1, read_number=7, read_id="r", unblock=True))
    import pytest as _pytest

    with _pytest.raises(ConnectionError):
        sender2.flush()
    assert sender2.retries == 5


def test_action_sender_latency_alarm(tmp_path, capsys):
    """>100 s processing time prints the outlier alarm to stderr
    (reference Data.cpp:197-213)."""
    from readbouncer_tpu.stream.actions import Action, ActionSender

    class Sink:
        def unblock(self, ch, nr):
            return True

        def stop_receiving(self, ch, nr):
            return True

    sender = ActionSender(Sink(), tmp_path)
    sender.queue(
        Action(channel=1, read_number=1, read_id="slow", unblock=True,
               processing_seconds=123.0)
    )
    sender.flush()
    assert "slow" in capsys.readouterr().err
