"""Typed error surface (reference: src/IBF/IBFExceptions.hpp:16-372)."""

import numpy as np
import pytest

from readbouncer_tpu.errors import (
    BinCapacityError,
    ConfigError,
    EmptyFilterError,
    FilterFileError,
    FilterGeometryError,
    FilterSchemeError,
    IBFError,
    InvalidParamsError,
    ReadBouncerError,
    WeightsError,
)


def test_hierarchy_roots_and_valueerror_compat():
    # every typed error is catchable as both ReadBouncerError and the
    # generic class earlier rounds raised
    for cls in (InvalidParamsError, FilterGeometryError, EmptyFilterError,
                BinCapacityError, FilterSchemeError, ConfigError, WeightsError):
        assert issubclass(cls, ReadBouncerError)
        assert issubclass(cls, ValueError)
    assert issubclass(FilterFileError, OSError)
    assert issubclass(FilterSchemeError, IBFError)


def test_invalid_params_typed():
    from readbouncer_tpu.ibf.params import IBFParams

    with pytest.raises(InvalidParamsError):
        IBFParams(kmer_size=99).validate()
    with pytest.raises(InvalidParamsError):
        IBFParams(hash_scheme="nope").validate()


def test_filter_file_errors(tmp_path):
    from readbouncer_tpu.ibf.storage import IBFData

    bad = tmp_path / "bad.ribf"
    bad.write_bytes(b"definitely not a filter")
    with pytest.raises(FilterFileError):
        IBFData.load(bad)

    # corrupt scheme stamp -> FilterSchemeError
    ibf = IBFData.empty(rows=8, num_bins=1, kmer_size=5, hash_functions=2)
    ibf.scheme = "rbt999"
    p = tmp_path / "scheme.ribf"
    ibf.save(p)
    with pytest.raises(FilterSchemeError):
        IBFData.load(p)


def test_stack_geometry_and_empty():
    from readbouncer_tpu.ibf.query import FilterStack
    from readbouncer_tpu.ibf.storage import IBFData

    with pytest.raises(EmptyFilterError):
        FilterStack([])
    a = IBFData.empty(rows=16, num_bins=1, kmer_size=5, hash_functions=2)
    b = IBFData.empty(rows=16, num_bins=1, kmer_size=7, hash_functions=2)
    with pytest.raises(FilterGeometryError):
        FilterStack([a, b])
    c = IBFData.empty(rows=16, num_bins=1, kmer_size=5, hash_functions=2, scheme="rbt2")
    with pytest.raises(FilterGeometryError):
        FilterStack([a, c])  # scheme mismatch (default build scheme is rbt1)


def test_engine_requires_filters():
    from readbouncer_tpu.classify.engine import ClassifyEngine

    with pytest.raises(EmptyFilterError):
        ClassifyEngine([], [], 0.1)


def test_config_errors(tmp_path):
    from readbouncer_tpu.config import ConfigReader

    p = tmp_path / "c.toml"
    p.write_text('output_directory = "."\n')
    with pytest.raises(ConfigError):
        ConfigReader(p).parse()
    p.write_text('usage = "frobnicate"\n')
    with pytest.raises(ConfigError):
        ConfigReader(p).parse()


def test_weights_error(tmp_path):
    from readbouncer_tpu.models.weights import load_params_npz

    bad = tmp_path / "w.npz"
    np.savez(bad, foo=np.zeros(3))
    with pytest.raises(WeightsError):
        load_params_npz(bad)
