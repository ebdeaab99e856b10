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
