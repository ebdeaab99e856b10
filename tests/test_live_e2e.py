"""Live adaptive-sampling pipeline end-to-end on the replay harness.

The deterministic fake-stream fixture that replaces the reference's
manual MinKNOW playback validation (SURVEY.md §4: "build a deterministic
fake-stream fixture to replace manual playback").
"""

import numpy as np
import pytest

from readbouncer_tpu.ibf.build import build_ibf
from readbouncer_tpu.ibf.params import IBFParams
from readbouncer_tpu.stream.replay import (
    NearestLevelBasecaller,
    ReplayRead,
    ReplaySource,
    sequence_to_signal,
)
from readbouncer_tpu.stream.scheduler import AdaptiveSampler, LiveClassifier, LiveConfig


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("live")
    rng = np.random.default_rng(21)
    host = _rand_seq(rng, 6000)  # depletion genome
    target = _rand_seq(rng, 6000)
    params = IBFParams(kmer_size=13, fragment_length=100_000)
    for name, seq in [("host", host), ("target", target)]:
        with open(tmp / f"{name}.fasta", "w") as f:
            f.write(f">{name}\n{seq}\n")
    host_ibf, _ = build_ibf([tmp / "host.fasta"], params, name="host")
    target_ibf, _ = build_ibf([tmp / "target.fasta"], params, name="target")
    return rng, host, target, host_ibf, target_ibf


def _mk_reads(rng, genome, n, length, prefix):
    reads = []
    for i in range(n):
        start = int(rng.integers(0, len(genome) - length))
        seq = genome[start : start + length]
        reads.append(
            ReplayRead(
                read_id=f"{prefix}_{i}",
                signal=sequence_to_signal(seq, rng=rng),
                true_seq=seq,
            )
        )
    return reads


def test_nearest_level_basecaller_is_exact(world):
    rng, host, *_ = world
    seq = host[100:600]
    bc = NearestLevelBasecaller()
    out = bc.basecall([sequence_to_signal(seq, rng=rng)])
    assert out == [seq]


def test_live_depletion_pipeline(world, tmp_path):
    rng, host, target, host_ibf, target_ibf = world
    # 3 host reads (should be unblocked), 3 target reads (stop_receiving)
    reads = _mk_reads(rng, host, 3, 4000, "host") + _mk_reads(
        rng, target, 3, 4000, "tgt"
    )
    src = ReplaySource(reads=reads, channels=6)
    cfg = LiveConfig(batch_size=16)
    sampler = AdaptiveSampler(
        source=src,
        basecaller=NearestLevelBasecaller(),
        classifier=LiveClassifier([target_ibf], [host_ibf], cfg),
        output_dir=tmp_path,
        cfg=cfg,
    )
    stats = sampler.run(max_ticks=100)
    assert stats.unblocked == 3
    assert stats.stop_received == 3
    # unblocked reads cut short: samples saved on the device
    assert src.stats["unblocked"] == 3
    assert src.stats["samples_saved"] > 0
    depleted = (tmp_path / "DepletedReads.fasta").read_text()
    targeted = (tmp_path / "TargetReads.fasta").read_text()
    assert depleted.count(">") == 3 and all(f">host_{i}" in depleted for i in range(3))
    assert targeted.count(">") == 3 and all(f">tgt_{i}" in targeted for i in range(3))
    csv = (tmp_path / "read_until_decision_stats.csv").read_text()
    assert csv.count("unblock") == 3
    assert csv.count("stop_receiving") == 3


def test_live_once_seen_concat(world, tmp_path):
    # read whose first 0.4s chunk (~177bp) is junk but later chunks are
    # on-host: the once_seen concat machinery must still unblock it
    rng, host, target, host_ibf, target_ibf = world
    junk = _rand_seq(rng, 200)
    seq = junk + host[1000:3500]
    src = ReplaySource(
        reads=[ReplayRead("late", sequence_to_signal(seq, rng=rng), seq)], channels=1
    )
    cfg = LiveConfig(batch_size=16)
    sampler = AdaptiveSampler(
        src,
        NearestLevelBasecaller(),
        LiveClassifier([], [host_ibf], cfg),
        output_dir=tmp_path,
        cfg=cfg,
    )
    stats = sampler.run(max_ticks=50)
    assert stats.unblocked == 1
    assert (tmp_path / "DepletedReads.fasta").read_text().count(">late") == 1


def test_live_target_only_unblocks_off_target(world, tmp_path):
    rng, host, target, host_ibf, target_ibf = world
    reads = _mk_reads(rng, target, 2, 3000, "tgt") + _mk_reads(
        rng, host, 2, 3000, "off"
    )
    src = ReplaySource(reads=reads, channels=4)
    cfg = LiveConfig(batch_size=16)
    sampler = AdaptiveSampler(
        src,
        NearestLevelBasecaller(),
        LiveClassifier([target_ibf], [], cfg),
        output_dir=tmp_path,
        cfg=cfg,
    )
    stats = sampler.run(max_ticks=60)
    assert stats.stop_received == 2
    assert stats.unblocked == 2  # target-only mode unblocks off-target reads


def test_live_give_up_long_unclassified(world, tmp_path):
    # a read matching nothing grows past give_up_len -> assumed on-target
    rng, host, target, host_ibf, target_ibf = world
    seq = _rand_seq(rng, 2500)
    src = ReplaySource(
        reads=[ReplayRead("mystery", sequence_to_signal(seq, rng=rng), seq)], channels=1
    )
    cfg = LiveConfig(batch_size=16)
    sampler = AdaptiveSampler(
        src,
        NearestLevelBasecaller(),
        LiveClassifier([], [host_ibf], cfg),
        output_dir=tmp_path,
        cfg=cfg,
    )
    stats = sampler.run(max_ticks=50)
    assert stats.stop_received == 1
    assert src.stats["stop_received"] == 1
    assert (tmp_path / "TargetReads.fasta").read_text().count(">mystery") == 1


def test_live_report_action_counts(world, tmp_path):
    """LiveStats.report() carries the end-of-run success/failed action
    counts (reference: src/minknow/Data.cpp:404-421)."""
    rng, host, target, host_ibf, target_ibf = world
    reads = _mk_reads(rng, host, 2, 4000, "host")
    src = ReplaySource(reads=reads, channels=2)
    cfg = LiveConfig(batch_size=16)
    sampler = AdaptiveSampler(
        source=src,
        basecaller=NearestLevelBasecaller(),
        classifier=LiveClassifier([target_ibf], [host_ibf], cfg),
        output_dir=tmp_path,
        cfg=cfg,
    )
    stats = sampler.run(max_ticks=50)
    assert stats.actions_succeeded == 2
    assert stats.actions_failed == 0
    text = stats.report()
    assert "Number of successfully applied actions\t\t\t:\t2" in text
    assert "Number of actions failed to apply\t\t\t:\t0" in text


def test_live_sigint_graceful_stop(world, tmp_path):
    """SIGINT during the run loop stops gracefully: queued actions drain,
    the final report is still produced (src/main/main.cpp:69-78)."""
    import os
    import signal

    rng, host, target, host_ibf, target_ibf = world
    reads = _mk_reads(rng, host, 8, 4000, "host")
    src = ReplaySource(reads=reads, channels=2)
    cfg = LiveConfig(batch_size=16)

    class InterruptingBasecaller(NearestLevelBasecaller):
        calls = 0

        def basecall(self, signals):
            InterruptingBasecaller.calls += 1
            if InterruptingBasecaller.calls == 3:
                os.kill(os.getpid(), signal.SIGINT)
            return super().basecall(signals)

    sampler = AdaptiveSampler(
        source=src,
        basecaller=InterruptingBasecaller(),
        classifier=LiveClassifier([target_ibf], [host_ibf], cfg),
        output_dir=tmp_path,
        cfg=cfg,
    )
    stats = sampler.run(handle_sigint=True)  # returns instead of raising
    assert sampler._stop_requested
    assert not src.finished  # stopped early, reads still pending
    assert len(sampler.sender._queue) == 0  # drained
    assert "classified reads" in stats.report()
    # handler restored after the run
    assert signal.getsignal(signal.SIGINT) not in (None,)


def test_chunk_classification_filter(world):
    """Chunks whose classification is not strand/adapter are suppressed
    (reference: src/minknow/Data.cpp:55-66,378-391)."""
    from readbouncer_tpu.stream.replay import (
        CHUNK_CLASS_ADAPTER,
        CHUNK_CLASS_STRAND,
        ReplaySource,
    )

    rng, host, *_ = world
    reads = _mk_reads(rng, host, 1, 2000, "host")

    def classifier(read, chunk_index):
        # first chunk adapter, second chunk "pore" (unaccepted), rest strand
        if chunk_index == 0:
            return CHUNK_CLASS_ADAPTER
        if chunk_index == 1:
            return 66  # pore
        return CHUNK_CLASS_STRAND

    src = ReplaySource(reads=reads, channels=1, chunk_classifier=classifier)
    seen = []
    while not src.finished:
        seen.extend(src.tick())
    idxs = [c.chunk_index for c in seen]
    assert 1 not in idxs  # the unaccepted chunk was filtered
    assert 0 in idxs and 2 in idxs
    assert src.stats["chunks_filtered"] == 1
    assert seen[0].classification == CHUNK_CLASS_ADAPTER


def test_recorded_signal_replay_round_trip(world, tmp_path):
    """Recorded raw-signal ingestion (ReplaySource.from_signals): save a
    run's signals to .npz, reload, run the live pipeline — identical
    per-read decisions to the in-memory path.  The file-backed analog of
    the reference's bulk-FAST5 MinKNOW playback run (README.md:266-323)."""
    rng, host, target, host_ibf, target_ibf = world
    reads = _mk_reads(np.random.default_rng(9), host, 3, 4000, "h") + _mk_reads(
        np.random.default_rng(10), target, 3, 4000, "t"
    )

    npz = ReplaySource(reads=reads, channels=6).save_signals(
        tmp_path / "recorded.npz"
    )
    reloaded = ReplaySource.from_signals(npz, channels=6)
    # signals and ground truth survive the round trip bit-exactly, in order
    assert [r.read_id for r in reloaded.reads] == [r.read_id for r in reads]
    for a, b in zip(reloaded.reads, reads):
        np.testing.assert_array_equal(a.signal, b.signal)
        assert a.true_seq == b.true_seq

    outcomes = {}
    for tag, src in [
        ("memory", ReplaySource(reads=_mk_reads(np.random.default_rng(9), host, 3, 4000, "h")
                                + _mk_reads(np.random.default_rng(10), target, 3, 4000, "t"),
                                channels=6)),
        ("file", ReplaySource.from_signals(npz, channels=6)),
    ]:
        cfg = LiveConfig(batch_size=16)
        sampler = AdaptiveSampler(
            source=src,
            basecaller=NearestLevelBasecaller(),
            classifier=LiveClassifier([target_ibf], [host_ibf], cfg),
            output_dir=tmp_path / tag,
            cfg=cfg,
        )
        stats = sampler.run(max_ticks=100)
        outcomes[tag] = {
            r.read_id: ("unblocked" if r.unblocked else "stopped" if r.stopped else "ran")
            for r in src.reads
        }
        assert stats.unblocked == 3
    assert outcomes["memory"] == outcomes["file"]


def test_live_classifier_mid_bucket_same_decisions(world):
    """The opt-in mid length bucket (LiveConfig.mid_len) must not change
    any decision — only which compiled program width serves a read."""
    from readbouncer_tpu.stream.scheduler import LiveClassifier, LiveConfig

    rng, host, target, host_ibf, target_ibf = world
    seqs = [
        target[100:450],      # short bucket
        host[200:550],        # short
        target[500:1400],     # mid (900)
        host[1000:2100],      # mid/long boundary (1100)
        target[0:1900],       # long
        "",                   # empty: must not be dropped by bucketing
    ]
    two = LiveClassifier([target_ibf], [host_ibf], LiveConfig(batch_size=8))
    three = LiveClassifier(
        [target_ibf], [host_ibf], LiveConfig(batch_size=8, mid_len=1024)
    )
    assert three.bucket_lens == [512, 1024, 2048]
    np.testing.assert_array_equal(two.decide(seqs), three.decide(seqs))
