"""Command-line entry point: ``python -m readbouncer_tpu --config file.toml``.

Rebuild of the reference's main/dispatch (src/main/main.cpp:274-447 +
the Lyra parser, src/main/parser.hpp:13-39): one ``--config`` flag, four
usages dispatched from the TOML file, loggers initialized up front, and
a final Real/CPU/peak-RSS report (src/main/main.cpp:439-444).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

from readbouncer_tpu.config import ConfigReader
from readbouncer_tpu.errors import ConfigError
from readbouncer_tpu.utils.logging import get_logger, setup_loggers

__all__ = ["main", "run_program", "get_filters", "filter_output_path"]


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    """reference: parse_config, src/main/parser.hpp:13-39."""
    p = argparse.ArgumentParser(
        prog="readbouncer-tpu",
        description=(
            "TPU-native nanopore adaptive sampling: build IBF indexes, "
            "classify reads, run live selective sequencing"
        ),
    )
    p.add_argument("--config", required=True, help="TOML configuration file")
    p.add_argument(
        "--verbose", action="store_true", help="echo progress to stdout"
    )
    from readbouncer_tpu import __version__

    p.add_argument(
        "--version", action="version", version=f"readbouncer-tpu {__version__}"
    )
    return p.parse_args(argv)


def filter_output_path(output_dir: Path, source: Path) -> Path:
    """<output>/<fasta stem>.ribf (reference .ibf naming: ibfbuild.hpp:38-44)."""
    return output_dir / (source.stem + ".ribf")


def get_filters(config: ConfigReader, files: list[Path], verbose: bool = False):
    """Load-or-build each input (reference: getIBF, src/main/ibfbuild.hpp:69-180):
    filter files load directly; FASTA inputs are built and saved first."""
    from readbouncer_tpu.ibf.build import build_ibf
    from readbouncer_tpu.ibf.params import IBFParams
    from readbouncer_tpu.ibf.storage import IBFData, sniff

    log = get_logger("IbfLog")
    out = []
    for f in files:
        f = Path(f)
        if sniff(f):
            log.info("loading filter file %s", f)
            out.append(IBFData.load(f, name=f.stem))
            continue
        params = IBFParams(
            kmer_size=config.ibf.kmer_size,
            fragment_length=config.ibf.fragment_size,
            hash_functions=config.tpu.hash_functions,
            max_fp=config.tpu.max_fp,
        )
        log.info("building filter from %s (k=%d, fragment=%d)", f, params.kmer_size, params.fragment_length)
        ibf, stats = build_ibf([f], params, name=f.stem)
        dest = filter_output_path(config.output_dir, f)
        ibf.save(dest)
        log.info(
            "built %s: %d bins, %d bits, %.2fs",
            dest, stats.total_bins_declared, stats.filter_size_bits, stats.build_seconds,
        )
        if verbose:
            print(f"built {dest}: {stats.total_bins_declared} bins, {stats.filter_size_bits} bits")
        out.append(ibf)
    return out


def run_build(config: ConfigReader, verbose: bool) -> int:
    """reference: main.cpp:286-345 (build usage builds every input file)."""
    get_filters(config, config.ibf.target_files + config.ibf.deplete_files, verbose)
    return 0


def run_update(config: ConfigReader, verbose: bool) -> int:
    """Append new references to an existing filter (usage="update").

    Makes IBF::update_filter reachable — in the reference it exists but
    no TOML usage can call it (src/IBF/IBFBuild.cpp:223-321, SURVEY §5.4).
    The updated filter is written to <output>/<stem>.ribf.
    """
    from readbouncer_tpu.ibf.build import update_ibf
    from readbouncer_tpu.ibf.params import IBFParams
    from readbouncer_tpu.ibf.storage import IBFData

    log = get_logger("IbfLog")
    src = config.ibf.update_filter
    ibf = IBFData.load(src, name=Path(src).stem)
    params = IBFParams(
        kmer_size=ibf.kmer_size,
        fragment_length=ibf.fragment_length or config.ibf.fragment_size,
        hash_functions=ibf.hash_functions,
        max_fp=ibf.max_fp,
        hash_scheme=ibf.scheme,
    )
    ibf, stats = update_ibf(ibf, config.ibf.target_files, params)
    dest = filter_output_path(config.output_dir, Path(src))
    ibf.save(dest)
    log.info(
        "updated %s -> %s: +%d bins (%d total), %d bits",
        src, dest, stats.new_bins, ibf.num_bins, stats.filter_size_bits,
    )
    if verbose:
        print(f"updated {dest}: +{stats.new_bins} bins ({ibf.num_bins} total)")
    return 0


def run_classify(config: ConfigReader, verbose: bool) -> int:
    """reference: main.cpp:346-369 -> classify_reads."""
    from readbouncer_tpu.classify.engine import classify_read_files

    from readbouncer_tpu.parallel.distributed import (
        aggregate_counters,
        process_count,
        process_index,
    )

    targets = get_filters(config, config.ibf.target_files, verbose)
    depletes = get_filters(config, config.ibf.deplete_files, verbose)
    n_proc = process_count()
    idx = process_index()
    results = classify_read_files(
        read_files=config.ibf.read_files,
        target_filters=targets,
        deplete_filters=depletes,
        error_rate=config.ibf.error_rate,
        output_dir=config.output_dir,
        significance=config.tpu.significance,
        chunk_length=config.ibf.chunk_length,
        max_chunks=config.ibf.max_chunks,
        batch_size=config.tpu.batch_size,
        verbose=(n_proc == 1),
        shard=(idx, n_proc),
        output_suffix=f".h{idx}" if n_proc > 1 else "",
        transfer_mode=config.tpu.transfer_mode,
        pipeline_depth=config.tpu.pipeline_depth,
        packing=config.tpu.packing,
    )
    if n_proc > 1:
        # process-0 report over the summed per-host shard counters
        summed = aggregate_counters(
            {
                "found": results.found,
                "failed": results.failed,
                "too_short": results.too_short,
                "read_counter": results.read_counter,
                **{f"t:{k}": v for k, v in results.per_target.items()},
            }
        )
        if idx == 0:
            from readbouncer_tpu.classify.engine import ClassifyResults

            agg = ClassifyResults(
                found=summed["found"],
                failed=summed["failed"],
                too_short=summed["too_short"],
                read_counter=summed["read_counter"],
                per_target={
                    k[2:]: v for k, v in summed.items() if k.startswith("t:")
                },
                avg_classify_seconds=results.avg_classify_seconds,
            )
            print(agg.report(config.ibf.chunk_length))
    return 0


def make_replay_source(config: ConfigReader):
    """The MinKNOW stand-in (SURVEY.md §2.1 item 3): a replayed signal
    stream honoring the chunk/action timing contract."""
    from readbouncer_tpu.stream.replay import ReplaySource

    if not config.tpu.replay_file and not config.tpu.replay_signals:
        raise ConfigError(
            "target/test usage needs TPU.replay_file (FASTA, squiggles "
            "synthesized) or TPU.replay_signals (recorded raw-signal "
            ".npz) — the replayed signal source standing in for a live "
            "MinKNOW run"
        )
    channels = config.minknow.max_channel - config.minknow.min_channel + 1
    if config.tpu.replay_signals:
        # recorded raw signal — the analog of the reference's bulk-FAST5
        # playback run (reference README.md:266-323)
        src = ReplaySource.from_signals(
            config.tpu.replay_signals,
            channels=channels,
            break_seconds=config.tpu.break_reads_after_seconds,
        )
    else:
        src = ReplaySource.from_fasta(
            [config.tpu.replay_file],
            channels=channels,
            break_seconds=config.tpu.break_reads_after_seconds,
        )
    from readbouncer_tpu.parallel.distributed import host_shard, process_count

    if process_count() > 1:
        # per-host flowcell shard: each host serves a slice of the channel
        # range and of the queued reads — the multi-host data-parallel
        # split (parallel/distributed.py); decisions stay host-local
        src.reads = host_shard(src.reads)
        src.channels = max(1, len(host_shard(list(range(src.channels)))))
        src.__post_init__()
    return src


def run_target(config: ConfigReader, verbose: bool) -> int:
    """reference: adaptive_sampling, src/main/adaptive_sampling.hpp:555-774."""
    from readbouncer_tpu.stream.scheduler import AdaptiveSampler, LiveClassifier, LiveConfig

    from readbouncer_tpu.stream.control import ReplayConnection

    log = get_logger("RUClientLog")
    targets = get_filters(config, config.ibf.target_files, verbose)
    depletes = get_filters(config, config.ibf.deplete_files, verbose)
    source = make_replay_source(config)
    # bootstrap sequence mirrors the reference's adaptive_sampling
    # (connect -> wait for acquisition -> set chunk cadence;
    # src/main/adaptive_sampling.hpp:590-634)
    conn = ReplayConnection(source, config.minknow.flowcell or "replay").connect()
    conn.acquisition.has_started()
    conn.analysis.set_break_reads_after_seconds(
        config.tpu.break_reads_after_seconds
    )
    log.info(conn.summary())
    caller = config.basecaller.caller.lower()
    if caller == "oracle":
        # replay-harness oracle inverting the synthetic pore model —
        # rebuild-specific caller for deterministic pipeline validation
        from readbouncer_tpu.stream.replay import NearestLevelBasecaller

        basecaller = NearestLevelBasecaller()
    elif caller in ("guppy", "remote"):
        # out-of-process basecall server (the reference's Guppy slot,
        # src/basecaller/Guppy/*): batched TCP client, tag rejoin
        from readbouncer_tpu.models.remote import RemoteBasecaller

        basecaller = RemoteBasecaller(
            host=config.basecaller.host, port=int(config.basecaller.port)
        )
    else:
        # "DeepNano" (and any GPU-server caller name) maps to the on-chip
        # GRU — the JAX GRU *is* the native basecaller (SURVEY.md §2.1).
        from readbouncer_tpu.models.basecaller import GRUBasecaller

        basecaller = GRUBasecaller(
            network=config.basecaller.network,
            weights_dir=config.basecaller.weights_dir,
            gate_order=config.basecaller.gate_order,
        )
        # max_frames sized for one chunk window (padded x64) from the
        # LOADED model's window/stride and the SOURCE's sample rate —
        # a custom network or non-4000 Hz source must not silently
        # truncate chunk tails.  The live loop basecalls per-chunk
        # signals, never whole reads.
        w, st = basecaller.model.window, basecaller.frame_stride
        chunk_samples = int(
            source.sample_rate * config.tpu.break_reads_after_seconds
        )
        frames = (max(chunk_samples, w) - w) // st + 1
        basecaller.max_frames = -(-frames // 64) * 64
    cfg = LiveConfig(
        error_rate=config.ibf.error_rate,
        significance=config.tpu.significance,
        batch_size=config.tpu.batch_size,
        overlap_ticks=config.tpu.overlap_ticks,
        mid_len=config.tpu.live_mid_len,
    )
    if config.tpu.mesh_shape:
        # bins-TP x data-DP live classification over a device mesh —
        # for filter sets sharded across chips (parallel/sharded.py);
        # identical decisions to the single-chip fused path
        from readbouncer_tpu.parallel.mesh import make_mesh
        from readbouncer_tpu.parallel.sharded import ShardedLiveClassifier

        classifier = ShardedLiveClassifier(
            targets, depletes, cfg, make_mesh(config.tpu.mesh_shape)
        )
        log.info("live classifier: mesh %s", config.tpu.mesh_shape)
    else:
        classifier = LiveClassifier(targets, depletes, cfg)
    sampler = AdaptiveSampler(
        source,
        basecaller,
        classifier,
        output_dir=config.output_dir,
        cfg=cfg,
    )
    log.info("live run starting: %d queued reads", len(source.reads))
    # Ctrl-C requests a graceful stop: actions drain and the final block
    # still prints (reference SIGINT handler, src/main/main.cpp:69-78)
    stats = sampler.run(handle_sigint=True)
    print(stats.report())
    log.info("live run finished after %d ticks", stats.ticks)
    return 0


def run_test(config: ConfigReader, verbose: bool) -> int:
    """Connection test (reference: test_connection,
    src/main/connection_test.hpp:36-155): bring the stream up, probe one
    chunk window, report.  The reference's unblock-all load test exists
    but is hard-disabled (connection_test.hpp:75); same here."""
    from readbouncer_tpu.stream.control import ReplayConnection

    source = make_replay_source(config)
    conn = ReplayConnection(source, config.minknow.flowcell or "replay").connect()
    chunks = source.tick()
    print(f"Connection to replay source successful: {conn.summary()}")
    print(f"{len(chunks)} chunks in first window")
    unblock_all = False  # dormant, as in the reference
    if unblock_all:
        for c in chunks:
            source.unblock(c.channel, c.read_number)
    return 0


def run_program(config: ConfigReader, verbose: bool = False) -> int:
    """reference: run_program, src/main/main.cpp:274-404."""
    dispatch = {
        "build": run_build,
        "classify": run_classify,
        "update": run_update,
        "target": run_target,
        "test": run_test,
    }
    return dispatch[config.usage](config, verbose)


def _resource_report(wall_seconds: float) -> str:
    """Real/CPU/peak-RSS summary (reference: src/main/main.cpp:439-444)."""
    import resource

    ru = resource.getrusage(resource.RUSAGE_SELF)
    cpu = ru.ru_utime + ru.ru_stime
    peak_mb = ru.ru_maxrss / 1024.0  # linux: KiB
    return (
        f"Real time : {wall_seconds:.3f} sec\n"
        f"CPU time  : {cpu:.3f} sec\n"
        f"Peak RSS  : {peak_mb:.1f} MBytes"
    )


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    t0 = time.monotonic()
    config = ConfigReader(args.config).parse()
    if config.tpu.coordinator:
        from readbouncer_tpu.parallel.distributed import init_distributed

        init_distributed(
            config.tpu.coordinator,
            config.tpu.num_processes,
            config.tpu.process_id,
        )
    setup_loggers(config.log_dir)
    config.create_log()
    log = get_logger("ReadBouncerLog")
    log.info("usage=%s config=%s", config.usage, args.config)
    try:
        rc = run_program(config, verbose=args.verbose)
    except Exception:
        log.exception("run failed")
        raise
    print(_resource_report(time.monotonic() - t0))
    return rc


if __name__ == "__main__":
    sys.exit(main())
