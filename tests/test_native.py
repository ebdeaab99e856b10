"""Native extension (readbouncer_tpu._native) vs Python-fallback parity."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native():
    try:
        from readbouncer_tpu import _native
        return _native
    except ImportError:
        rc = subprocess.run(
            ["make", "-C", str(ROOT / "native")], capture_output=True, text=True
        )
        if rc.returncode != 0:
            pytest.skip(f"native build failed: {rc.stderr[-500:]}")
        import importlib
        import readbouncer_tpu
        importlib.reload(readbouncer_tpu)
        from readbouncer_tpu import _native
        return _native


def test_encode_matches_python(native):
    from readbouncer_tpu.ibf.hashing import encode_bases

    s = "ACGTNacgtnXYZ-0"
    got = np.frombuffer(native.encode(s), dtype=np.uint8)
    np.testing.assert_array_equal(got, encode_bases(s))


def test_encode_batch_matches_python(native):
    from readbouncer_tpu.ibf.hashing import encode_bases

    seqs = ["ACGT", "", "NNNNNNNNNNNN", "acgtACGTxx"]
    L = 8
    buf, lens = native.encode_batch(seqs, L)
    enc = np.frombuffer(buf, dtype=np.uint8).reshape(len(seqs), L)
    lens = np.frombuffer(lens, dtype=np.int32)
    for i, s in enumerate(seqs):
        b = encode_bases(s[:L])
        assert lens[i] == len(b)
        np.testing.assert_array_equal(enc[i, : len(b)], b)
        np.testing.assert_array_equal(enc[i, len(b) :], 0)


def test_read_records_fasta_parity(native, tmp_path):
    p = tmp_path / "multi.fasta"
    p.write_text(
        ">id1 some description\nACGT\nTTGG\n\n>id2\nNNNA\n>id3 x\nC\n"
    )
    got = native.read_records(str(p), False)
    assert got == [
        ("id1 some description", b"ACGTTTGG"),
        ("id2", b"NNNA"),
        ("id3 x", b"C"),
    ]
    got_first = native.read_records(str(p), True)
    assert [g[0] for g in got_first] == ["id1", "id2", "id3"]


def test_read_records_fastq_parity(native, tmp_path):
    p = tmp_path / "reads.fastq"
    p.write_text("@r1 d\nACGT\n+\nIIII\n@r2\nTT\n+r2\nII\n")
    got = native.read_records(str(p), True)
    assert got == [("r1", b"ACGT"), ("r2", b"TT")]


def test_fastio_uses_native(native, tmp_path):
    """The module-level wiring should produce identical SeqRecords."""
    from readbouncer_tpu.fastio import fasta as fa

    p = tmp_path / "x.fasta"
    p.write_text(">a b\nACGT\nAC\n>c\nGGTT\n")
    recs = list(fa.read_records(p, first_word_id=True))
    assert [(r.id, r.seq) for r in recs] == [("a", "ACGTAC"), ("c", "GGTT")]


def test_engine_encode_batch_native_path():
    from readbouncer_tpu.classify.engine import encode_batch

    seqs = ["ACGTN" * 10, "acgt"]
    enc, lens = encode_batch(seqs, 16, batch=4)
    assert enc.shape == (4, 16)
    assert list(lens) == [16, 4, 0, 0]
    np.testing.assert_array_equal(enc[1, :4], [0, 1, 2, 3])
    np.testing.assert_array_equal(enc[2:], 0)
