"""FASTA/FASTQ streaming reader and FASTA writer.

Mirrors the reference's seqan-based record I/O surface
(seqan::readRecords at src/IBF/IBFBuild.cpp:52, seqan::readRecord at
src/main/classify.hpp:237, seqan::writeRecord at
src/main/classify.hpp:301).  A native C++ fast path
(native/fastio.cpp, loaded via ctypes) accelerates bulk parsing +
base encoding when available; this module is the portable fallback and
the single entry point either way.

Record ids are truncated at the first space when requested, matching the
build path's seqid handling (reference: src/IBF/IBFBuild.cpp:77).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Iterator

__all__ = ["SeqRecord", "read_records", "FastaWriter"]


@dataclass
class SeqRecord:
    id: str
    seq: str


def _open_text(path: Path):
    if path.suffix == ".gz":
        return gzip.open(path, "rt")
    return open(path, "r")


def _iter_fasta(f) -> Iterator[SeqRecord]:
    header = None
    chunks: list[str] = []
    for line in f:
        line = line.rstrip("\r\n")
        if not line:
            continue
        if line.startswith(">"):
            if header is not None:
                yield SeqRecord(header, "".join(chunks))
            header = line[1:]
            chunks = []
        else:
            chunks.append(line)
    if header is not None:
        yield SeqRecord(header, "".join(chunks))


def _iter_fastq(f) -> Iterator[SeqRecord]:
    while True:
        header = f.readline()
        if not header:
            return
        header = header.rstrip("\r\n")
        if not header:
            continue
        if not header.startswith("@"):
            raise ValueError(f"malformed FASTQ record header: {header[:60]!r}")
        seq = f.readline().rstrip("\r\n")
        plus = f.readline()
        if not plus.startswith("+"):
            raise ValueError("malformed FASTQ record: missing '+' line")
        f.readline()  # quality line, unused
        yield SeqRecord(header[1:], seq)


_FASTQ_SUFFIXES = {".fastq", ".fq"}


try:  # native bulk parser (native/rbt_native.cpp); Python fallback below
    from readbouncer_tpu import _native as _rbt_native
except ImportError:  # pragma: no cover - environment without the build
    _rbt_native = None


def read_records(path: str | Path, first_word_id: bool = False) -> Iterator[SeqRecord]:
    """Stream records from a FASTA/FASTQ file (gzip supported by suffix)."""
    path = Path(path)
    if _rbt_native is not None:
        # streaming iterator; gzip transparent (zlib gzFile)
        for rec_id, seq in _rbt_native.read_records(str(path), first_word_id):
            yield SeqRecord(rec_id, seq.decode("ascii"))
        return
    suffixes = [s.lower() for s in path.suffixes]
    is_fastq = any(s in _FASTQ_SUFFIXES for s in suffixes)
    with _open_text(path) as f:
        if not is_fastq:
            # sniff: FASTQ files may be named .txt etc.
            pos_first = f.read(1)
            f.seek(0)
            is_fastq = pos_first == "@"
        it = _iter_fastq(f) if is_fastq else _iter_fasta(f)
        for rec in it:
            if first_word_id:
                rec.id = rec.id.split(" ", 1)[0]
            yield rec


class FastaWriter:
    """Sequential FASTA writer: one header line + one sequence line.

    Matches the reference's classified-read output shape
    (src/main/classify.hpp:289-290 writes id + full sequence on one line).
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._f = open(self.path, "w")

    def write(self, rec_id: str, seq: str) -> None:
        self._f.write(f">{rec_id}\n{seq}\n")

    def close(self) -> None:
        if not self._f.closed:
            self._f.close()

    def __enter__(self) -> "FastaWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
