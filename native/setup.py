"""Build the native host I/O extension: readbouncer_tpu._native.

Usage:  make -C native   (or: python native/setup.py build_ext --inplace
run from the repo root; the .so lands in readbouncer_tpu/).
"""

from pathlib import Path

from setuptools import Extension, setup

ROOT = Path(__file__).resolve().parent

setup(
    name="rbt-native",
    version="0.1",
    ext_modules=[
        Extension(
            "readbouncer_tpu._native",
            sources=[str(ROOT / "rbt_native.cpp")],
            extra_compile_args=["-O3", "-std=c++20", "-Wall"],
            libraries=["z"],
            language="c++",
        )
    ],
)
