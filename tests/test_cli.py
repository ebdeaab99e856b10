"""End-to-end CLI tests: all four usages through main(--config ...)."""

import numpy as np
import pytest

from readbouncer_tpu.main import main


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    rng = np.random.default_rng(11)
    td = tmp_path_factory.mktemp("cli")
    bases = np.array(list("ACGT"))
    target = "".join(bases[rng.integers(0, 4, size=6000)])
    deplete = "".join(bases[rng.integers(0, 4, size=6000)])
    (td / "target.fasta").write_text(f">t1\n{target}\n")
    (td / "deplete.fasta").write_text(f">d1\n{deplete}\n")
    # reads: 4 from target, 4 from deplete, 2 random
    lines = []
    for i in range(4):
        s = rng.integers(0, 6000 - 400)
        lines.append(f">tr{i}\n{target[s:s+400]}")
    for i in range(4):
        s = rng.integers(0, 6000 - 400)
        lines.append(f">dr{i}\n{deplete[s:s+400]}")
    for i in range(2):
        lines.append(f">rr{i}\n" + "".join(bases[rng.integers(0, 4, size=400)]))
    (td / "reads.fasta").write_text("\n".join(lines) + "\n")
    return td


def _write_config(td, usage, extra=""):
    cfg = td / f"{usage}.toml"
    cfg.write_text(
        f'''
usage = "{usage}"
output_directory = "{td}/out_{usage}"
log_directory = "{td}/log_{usage}"

[IBF]
kmer_size = 13
fragment_size = 2000
target_files = ["{td}/target.fasta"]
deplete_files = ["{td}/deplete.fasta"]
read_files = ["{td}/reads.fasta"]
exp_seq_error_rate = 0.1
chunk_length = 200
max_chunks = 2

[TPU]
batch_size = 16
{extra}
'''
    )
    return cfg


def test_cli_build(genome, capsys):
    cfg = _write_config(genome, "build")
    assert main(["--config", str(cfg), "--verbose"]) == 0
    out_dir = genome / "out_build"
    assert (out_dir / "target.ribf").exists()
    assert (out_dir / "deplete.ribf").exists()
    assert (genome / "log_build" / "configLog.toml").exists()
    assert "Peak RSS" in capsys.readouterr().out


def test_cli_classify_from_prebuilt(genome, capsys):
    # build first, then classify pointing at the .ribf files (load path)
    main(["--config", str(_write_config(genome, "build"))])
    td = genome
    cfg = td / "classify2.toml"
    cfg.write_text(
        f'''
usage = "classify"
output_directory = "{td}/out_classify"
log_directory = "{td}/log_classify"

[IBF]
kmer_size = 13
fragment_size = 2000
target_files = ["{td}/out_build/target.ribf"]
deplete_files = ["{td}/out_build/deplete.ribf"]
read_files = ["{td}/reads.fasta"]
chunk_length = 200
max_chunks = 2

[TPU]
batch_size = 16
'''
    )
    assert main(["--config", str(cfg)]) == 0
    out = capsys.readouterr().out
    assert "Final Results" in out
    assert (td / "out_classify" / "target.fasta").exists()
    assert (td / "out_classify" / "unclassified.fasta").exists()


def test_cli_target_oracle(genome, capsys):
    cfg = genome / "target.toml"
    cfg.write_text(
        f'''
usage = "target"
output_directory = "{genome}/out_target"
log_directory = "{genome}/log_target"

[IBF]
kmer_size = 13
fragment_size = 2000
target_files = ["{genome}/target.fasta"]
deplete_files = ["{genome}/deplete.fasta"]
exp_seq_error_rate = 0.1

[Basecaller]
caller = "Oracle"

[TPU]
batch_size = 16
replay_file = "{genome}/reads.fasta"
'''
    )
    assert main(["--config", str(cfg)]) == 0
    out = capsys.readouterr().out
    assert "classified reads" in out
    out_dir = genome / "out_target"
    assert (out_dir / "read_until_decision_stats.csv").exists()
    assert (out_dir / "DepletedReads.fasta").exists()


def test_cli_target_recorded_signals(genome, capsys):
    """usage="target" with [TPU] replay_signals: the live run drives off
    a recorded raw-signal .npz instead of FASTA-synthesized squiggles."""
    from readbouncer_tpu.stream.replay import ReplaySource

    npz = ReplaySource.from_fasta([genome / "reads.fasta"]).save_signals(
        genome / "recorded.npz"
    )
    cfg = genome / "target_rec.toml"
    cfg.write_text(
        f'''
usage = "target"
output_directory = "{genome}/out_target_rec"
log_directory = "{genome}/log_target_rec"

[IBF]
kmer_size = 13
fragment_size = 2000
target_files = ["{genome}/target.fasta"]
deplete_files = ["{genome}/deplete.fasta"]
exp_seq_error_rate = 0.1

[Basecaller]
caller = "Oracle"

[TPU]
batch_size = 16
replay_signals = "{npz}"
'''
    )
    assert main(["--config", str(cfg)]) == 0
    out = capsys.readouterr().out
    assert "classified reads" in out
    out_dir = genome / "out_target_rec"
    assert (out_dir / "read_until_decision_stats.csv").exists()
    assert (out_dir / "DepletedReads.fasta").exists()


def test_cli_test_usage(genome, capsys):
    cfg = genome / "conn.toml"
    cfg.write_text(
        f'''
usage = "test"
output_directory = "{genome}/out_test"
log_directory = "{genome}/log_test"

[IBF]
target_files = ["{genome}/target.fasta"]

[TPU]
replay_file = "{genome}/reads.fasta"
'''
    )
    assert main(["--config", str(cfg)]) == 0
    assert "successful" in capsys.readouterr().out


def test_cli_bad_usage(genome, tmp_path):
    cfg = tmp_path / "bad.toml"
    cfg.write_text('usage = "frobnicate"\n')
    with pytest.raises(ValueError, match="usage"):
        main(["--config", str(cfg)])


def test_cli_update_roundtrip(genome, capsys, tmp_path):
    """usage="update" extends an existing .ribf (VERDICT r2 missing #7).

    Build target.fasta, then append deplete.fasta's sequences via the
    update usage, and check the updated filter classifies reads from BOTH
    genomes to it.
    """
    cfg = _write_config(genome, "build")
    assert main(["--config", str(cfg)]) == 0
    ribf = genome / "out_build" / "target.ribf"
    assert ribf.exists()

    ucfg = genome / "update.toml"
    ucfg.write_text(
        f'''
usage = "update"
output_directory = "{genome}/out_update"
log_directory = "{genome}/log_update"

[IBF]
update_filter = "{ribf}"
target_files = ["{genome}/deplete.fasta"]
'''
    )
    assert main(["--config", str(ucfg), "--verbose"]) == 0
    out = capsys.readouterr().out
    assert "updated" in out

    from readbouncer_tpu.ibf.storage import IBFData
    from readbouncer_tpu.ibf.query_np import max_count_np
    from readbouncer_tpu.ibf.hashing import encode_bases

    orig = IBFData.load(ribf)
    upd = IBFData.load(genome / "out_update" / "target.ribf")
    assert upd.num_bins > orig.num_bins
    t_seq = (genome / "target.fasta").read_text().splitlines()[1]
    d_seq = (genome / "deplete.fasta").read_text().splitlines()[1]
    # reads from the ORIGINAL references still match the updated filter...
    assert max_count_np(upd, encode_bases(t_seq[100:300]), 1) >= 150
    # ...and reads from the APPENDED references now match too
    assert max_count_np(upd, encode_bases(d_seq[100:300]), 1) >= 150
    assert max_count_np(orig, encode_bases(d_seq[100:300]), 50) == 0


def test_cli_update_missing_inputs(genome, tmp_path):
    from readbouncer_tpu.errors import MissingInputError

    cfg = tmp_path / "bad_update.toml"
    cfg.write_text(
        f'usage = "update"\noutput_directory = "{tmp_path}"\n'
        f'log_directory = "{tmp_path}"\n[IBF]\ntarget_files = ["{genome}/target.fasta"]\n'
    )
    with pytest.raises(MissingInputError):
        main(["--config", str(cfg)])


def test_configlog_is_valid_toml_with_tpu_table(genome):
    """configLog.toml (the reference's effective-config echo,
    src/config/configReader.cpp:98-200) must parse as TOML and include
    the rebuild's [TPU] table and gate_order."""
    import tomllib

    # self-sufficient: produce the log here rather than relying on a
    # sibling test's side effect (ordering/-k selection safe)
    main(["--config", str(_write_config(genome, "build"))])
    parsed = tomllib.loads(
        (genome / "log_build" / "configLog.toml").read_text()
    )
    assert parsed["usage"] == "build"
    assert parsed["TPU"]["batch_size"] >= 1
    assert parsed["TPU"]["overlap_ticks"] is False
    assert parsed["Basecaller"]["gate_order"] in ("zrn", "rzn")


def test_cli_target_sharded_mesh(genome, capsys):
    """usage="target" with [TPU] mesh_shape: the live run classifies
    through ShardedLiveClassifier over the virtual 8-device mesh
    (bins-TP x data-DP), decisions identical to the fused path."""
    import csv as _csv

    def decisions(out_dir):
        rows = list(
            _csv.reader(
                open(genome / out_dir / "read_until_decision_stats.csv"),
                delimiter=";",
            )
        )[1:]
        return {r[0]: r[4] for r in rows}

    def cfg_text(out_dir, extra):
        return f'''
usage = "target"
output_directory = "{genome}/{out_dir}"
log_directory = "{genome}/log_{out_dir}"

[IBF]
kmer_size = 13
fragment_size = 2000
target_files = ["{genome}/target.fasta"]
deplete_files = ["{genome}/deplete.fasta"]
exp_seq_error_rate = 0.1

[Basecaller]
caller = "Oracle"

[TPU]
batch_size = 16
replay_file = "{genome}/reads.fasta"
{extra}
'''

    cfg = genome / "target_mesh.toml"
    cfg.write_text(cfg_text("out_target_mesh", 'mesh_shape = "data:4,bins:2"'))
    assert main(["--config", str(cfg)]) == 0
    capsys.readouterr()
    cfg2 = genome / "target_fused_ref.toml"
    cfg2.write_text(cfg_text("out_target_fused_ref", ""))
    assert main(["--config", str(cfg2)]) == 0
    capsys.readouterr()
    assert decisions("out_target_mesh") == decisions("out_target_fused_ref")
