"""Typed error surface.

Rebuild of the reference's 13-class exception hierarchy rooted at
``IBFException`` (reference: src/IBF/IBFExceptions.hpp:16-372), mapped to
the failure modes this framework actually has.  Every class also derives
from ``ValueError`` so call sites and tests written against the generic
errors of earlier rounds keep working; new code should catch the typed
classes.

Mapping to the reference classes:

| reference (IBFExceptions.hpp)      | here                       |
|------------------------------------|----------------------------|
| IBFException :16                   | IBFError                   |
| IBFBuildException :41              | BuildError                 |
| IBFClassifyException :69           | ClassifyError              |
| ShortReadException :96             | ShortReadError             |
| CountKmerException :123            | CountError                 |
| InvalidConfigException :150        | InvalidParamsError         |
| NullFilterException :178           | EmptyFilterError           |
| InsertSequenceException :206       | BinCapacityError           |
| StoreFilterException :234          | FilterFileError (write)    |
| FileParserException :262           | ConfigError                |
| MissingReferenceFilesException :290| MissingInputError          |
| MissingIBFFileException :317       | FilterFileError (missing)  |
| ParseIBFFileException :344         | FilterFileError (corrupt)  |

Rebuild-specific additions: FilterSchemeError (unknown .ribf hash
scheme), FilterGeometryError (mixed-geometry FilterStack — the analog of
querying incompatible filters, which the reference cannot express), and
WeightsError (basecaller weight files).
"""

from __future__ import annotations

__all__ = [
    "ReadBouncerError",
    "IBFError",
    "BuildError",
    "ClassifyError",
    "ShortReadError",
    "CountError",
    "InvalidParamsError",
    "EmptyFilterError",
    "BinCapacityError",
    "FilterFileError",
    "FilterSchemeError",
    "FilterGeometryError",
    "ConfigError",
    "MissingInputError",
    "WeightsError",
    "BasecallerError",
]


class ReadBouncerError(Exception):
    """Root of the framework's error hierarchy."""


class IBFError(ReadBouncerError, ValueError):
    """Any filter build/load/query failure (IBFException analog)."""


class BuildError(IBFError):
    """Filter construction failed (IBFBuildException analog)."""


class ClassifyError(IBFError):
    """Read classification failed (IBFClassifyException analog)."""


class ShortReadError(ClassifyError):
    """Sequence shorter than the k-mer size where a classification was
    required (ShortReadException analog)."""


class CountError(ClassifyError):
    """k-mer counting failed (CountKmerException analog)."""


class InvalidParamsError(BuildError):
    """Invalid IBF parameters (InvalidConfigException analog)."""


class EmptyFilterError(IBFError):
    """Operation on an absent/empty filter (NullFilterException analog)."""


class BinCapacityError(BuildError):
    """Fragments exceed padded bin capacity (InsertSequenceException analog)."""


class FilterFileError(IBFError, OSError):
    """Missing, unreadable or corrupt .ribf file (Missing/Parse/Store
    IBFFileException analogs)."""


class FilterSchemeError(FilterFileError):
    """.ribf built with a hash scheme this build does not support."""


class FilterGeometryError(IBFError):
    """Filters with incompatible (k, h, rows, scheme) stacked together."""


class ConfigError(ReadBouncerError, ValueError):
    """TOML configuration problem (FileParserException analog)."""


class MissingInputError(ConfigError):
    """Required input files absent (MissingReferenceFilesException analog)."""


class WeightsError(ReadBouncerError, ValueError):
    """Basecaller weight file missing or malformed."""


class BasecallerError(ReadBouncerError, RuntimeError):
    """Basecaller failure (reference: BasecallerException,
    src/basecaller/Basecaller.hpp:30-55): remote server unreachable,
    connection dropped, or malformed response."""
