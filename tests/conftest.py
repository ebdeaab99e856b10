"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The surrounding environment preselects a TPU platform (JAX_PLATFORMS=axon)
and pre-imports jax at interpreter startup, so env vars are too late —
the override must go through jax.config before any backend initializes.
Real-TPU benchmarking happens in bench.py, not in the test suite.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# repo root importable regardless of how pytest is invoked
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
