"""End-to-end classify mode — analog of the reference's integration golden
(3-read file: found=3 / failed=0 / too_short=0;
src/test/classifyTests/classifygtests.hpp:44-79) plus target/deplete routing."""

import numpy as np
import pytest

from readbouncer_tpu.classify.engine import ClassifyResults, classify_read_files
from readbouncer_tpu.ibf.build import build_ibf
from readbouncer_tpu.ibf.params import IBFParams


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _fasta(path, records):
    with open(path, "w") as f:
        for rid, seq in records:
            f.write(f">{rid}\n{seq}\n")
    return path


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(11)
    refs = {
        "targetA": _rand_seq(rng, 3000),
        "targetB": _rand_seq(rng, 3000),
        "host": _rand_seq(rng, 3000),
    }
    params = IBFParams(kmer_size=13, fragment_length=100_000)
    filters = {}
    for name, seq in refs.items():
        p = _fasta(tmp / f"{name}.fasta", [(name, seq)])
        ibf, _ = build_ibf([p], params, name=name)
        filters[name] = ibf
    return tmp, rng, refs, filters


def _reads_from(rng, seq, n, length, prefix):
    out = []
    for i in range(n):
        start = int(rng.integers(0, len(seq) - length))
        out.append((f"{prefix}_{i}", seq[start : start + length]))
    return out


def test_target_only_golden_found_all(world, tmp_path):
    tmp, rng, refs, filters = world
    reads = _reads_from(rng, refs["targetA"], 3, 400, "a")
    read_file = _fasta(tmp_path / "reads.fasta", reads)
    res = classify_read_files(
        [read_file],
        target_filters=[filters["targetA"]],
        deplete_filters=[],
        error_rate=0.1,
        output_dir=tmp_path / "out",
        verbose=False,
    )
    # integration golden analog: found=3, failed=0, too_short=0
    assert res.found == 3
    assert res.failed == 0
    assert res.too_short == 0
    assert res.read_counter == 3
    assert res.per_target["targetA"] == 3
    out = (tmp_path / "out" / "targetA.fasta").read_text()
    assert out.count(">") == 3
    assert (tmp_path / "out" / "unclassified.fasta").read_text() == ""


def test_two_targets_route_to_best(world, tmp_path):
    tmp, rng, refs, filters = world
    reads = (
        _reads_from(rng, refs["targetA"], 4, 400, "a")
        + _reads_from(rng, refs["targetB"], 5, 400, "b")
        + [("rand_0", _rand_seq(rng, 400))]
    )
    read_file = _fasta(tmp_path / "reads.fasta", reads)
    res = classify_read_files(
        [read_file],
        target_filters=[filters["targetA"], filters["targetB"]],
        deplete_filters=[],
        error_rate=0.1,
        output_dir=tmp_path / "out",
        verbose=False,
    )
    assert res.per_target == {"targetA": 4, "targetB": 5}
    assert res.found == 9
    # the 400 bp unclassified read reaches an empty chunk attempt ->
    # ShortReadException in the reference -> counted failed, dropped from
    # every output (src/main/classify.hpp:300-310)
    assert res.failed == 1
    uncls = (tmp_path / "out" / "unclassified.fasta").read_text()
    assert uncls == ""


def test_deplete_and_target(world, tmp_path):
    tmp, rng, refs, filters = world
    reads = (
        _reads_from(rng, refs["targetA"], 3, 400, "a")
        + _reads_from(rng, refs["host"], 3, 400, "h")
        + [("short_0", "ACGT" * 20)]  # 80bp < chunk_length -> too short
    )
    read_file = _fasta(tmp_path / "reads.fasta", reads)
    res = classify_read_files(
        [read_file],
        target_filters=[filters["targetA"]],
        deplete_filters=[filters["host"]],
        error_rate=0.1,
        output_dir=tmp_path / "out",
        verbose=False,
    )
    # host reads match deplete but not target -> unclassified; at 400 bp
    # their chunk loop hits an empty fragment -> failed in the reference
    # (ShortReadException, src/main/classify.hpp:300-310)
    assert res.found == 3
    assert res.too_short == 1
    assert res.read_counter == 7
    assert res.per_target["targetA"] == 3
    assert res.failed == 3
    uncls = (tmp_path / "out" / "unclassified.fasta").read_text()
    assert uncls.count(">") == 0


def test_chunk_waves_classify_long_tail(world, tmp_path):
    # read whose first chunk is random junk but whose 2nd chunk is on-target:
    # wave 2 must classify it (disjoint-chunk semantics)
    tmp, rng, refs, filters = world
    junk = _rand_seq(rng, 250)
    read = junk + refs["targetA"][500:900]
    read_file = _fasta(tmp_path / "reads.fasta", [("late", read)])
    res = classify_read_files(
        [read_file],
        target_filters=[filters["targetA"]],
        deplete_filters=[],
        error_rate=0.1,
        output_dir=tmp_path / "out",
        verbose=False,
    )
    assert res.found == 1


def test_report_format(world, tmp_path):
    res = ClassifyResults(found=2, too_short=1, read_counter=3)
    res.per_target = {"x": 2}
    text = res.report(250)
    assert "Final Results" in text
    assert "Number of classified reads                         :   2" in text


def test_pipelined_driver_matches_serial(world, tmp_path):
    """pipeline_depth>=2 + overlap transfer mode classify identically to
    the strictly serial driver (multiple in-flight host batches)."""
    tmp, rng, refs, filters = world
    reads = (
        _reads_from(rng, refs["targetA"], 7, 400, "a")
        + _reads_from(rng, refs["targetB"], 6, 700, "b")
        + _reads_from(rng, refs["host"], 5, 400, "h")
        + [(f"rand_{i}", _rand_seq(rng, 600)) for i in range(6)]
    )
    rng.shuffle(reads)
    read_file = _fasta(tmp_path / "reads.fasta", reads)
    kw = dict(
        target_filters=[filters["targetA"], filters["targetB"]],
        deplete_filters=[filters["host"]],
        error_rate=0.1,
        verbose=False,
        batch_size=8,
        host_batch_reads=5,  # force ~5 host batches in flight
    )
    r_serial = classify_read_files(
        [read_file], output_dir=tmp_path / "serial", pipeline_depth=1,
        transfer_mode="serial", **kw,
    )
    r_pipe = classify_read_files(
        [read_file], output_dir=tmp_path / "pipe", pipeline_depth=3,
        transfer_mode="overlap", **kw,
    )
    assert (r_pipe.found, r_pipe.failed, r_pipe.too_short, r_pipe.read_counter) == (
        r_serial.found, r_serial.failed, r_serial.too_short, r_serial.read_counter
    )
    assert r_pipe.per_target == r_serial.per_target
    for stem in ("targetA", "targetB", "unclassified"):
        a = (tmp_path / "serial" / f"{stem}.fasta").read_text()
        b = (tmp_path / "pipe" / f"{stem}.fasta").read_text()
        assert a == b, f"{stem} outputs diverge"


def test_choose_transfer_mode_auto_probe(world, caplog):
    """auto mode decides from the timed H2D probe and logs the decision
    (the congested-tunnel fallback knob)."""
    import logging

    from readbouncer_tpu.classify.engine import ClassifyEngine, choose_transfer_mode

    tmp, rng, refs, filters = world
    engine = ClassifyEngine([filters["targetA"]], [], 0.1, batch_size=8)
    log = logging.getLogger("test-transfer")
    with caplog.at_level(logging.INFO, logger="test-transfer"):
        slow = choose_transfer_mode(
            "auto", engine, probe_fn=lambda nb: 0.4, logger=log
        )
        fast = choose_transfer_mode(
            "auto", engine, probe_fn=lambda nb: 0.02, logger=log
        )
    assert slow is True and fast is False
    msgs = [r.getMessage() for r in caplog.records]
    assert any("-> overlap" in m for m in msgs)
    assert any("-> serial" in m for m in msgs)
    assert choose_transfer_mode("overlap", engine) is True
    assert choose_transfer_mode("serial", engine) is False
    with pytest.raises(ValueError):
        choose_transfer_mode("bogus", engine)
    # the real probe path runs and returns a sane duration
    assert 0.0 <= engine.probe_transfer_seconds(1 << 14) < 60.0


def test_auto_transfer_mode_congested_driver(world, tmp_path, monkeypatch, caplog):
    """transfer_mode=auto on a congested link switches the driver to
    fewer, larger pools (and still classifies identically)."""
    import logging

    from readbouncer_tpu.classify import engine as engine_mod

    tmp, rng, refs, filters = world
    reads = _reads_from(rng, refs["targetA"], 5, 400, "a") + [
        (f"rand_{i}", _rand_seq(rng, 600)) for i in range(3)
    ]
    read_file = _fasta(tmp_path / "reads.fasta", reads)
    monkeypatch.setattr(
        engine_mod.ClassifyEngine, "probe_transfer_seconds",
        lambda self, nbytes=1 << 19: 0.4,  # fake congested sink
    )
    with caplog.at_level(logging.INFO, logger="ClassifyLog"):
        res = classify_read_files(
            [read_file],
            target_filters=[filters["targetA"]],
            deplete_filters=[],
            error_rate=0.1,
            output_dir=tmp_path / "out",
            verbose=False,
            batch_size=8,
            transfer_mode="auto",
        )
    assert res.found == 5
    msgs = [r.getMessage() for r in caplog.records]
    assert any("congested" in m for m in msgs)
    assert any("-> overlap" in m for m in msgs)
