"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test session, so
this sits in conftest.py at import time.  Real-TPU benchmarking happens
in bench.py, not in the test suite.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent compile cache: the axon remote compiler is slow (tens of
# seconds per program); caching across test runs keeps the suite usable
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root importable regardless of how pytest is invoked
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
