"""Multi-host (multi-process) execution wiring.

The reference is strictly single-process — its only "distribution" is
threads + a gRPC stream to MinKNOW (SURVEY.md §2.2, §5.8).  The rebuild
scales out the TPU-native way:

* ``jax.distributed.initialize`` connects N processes (one per host);
  all chips across hosts form one global device set, and the GSPMD
  programs in parallel/sharded.py run unchanged over a global Mesh —
  XLA routes the bins-axis count merges over ICI within a slice and DCN
  across hosts.
* input is sharded per host: each host reads/replays only its slice of
  read files or channels (``host_shard``) — pure data parallelism on
  the ``data`` axis, so the ONLY cross-host traffic is the collective
  count/decision merge (SURVEY.md §5.8).
* process 0 aggregates scalar results (``allgather_pytree`` /
  ``aggregate_counters``) for reporting.

Config: ``[TPU] coordinator = "host0:8476"``, ``num_processes``,
``process_id`` (or the standard cluster auto-detect when launched under
a supported scheduler).  Single-process runs skip initialization and the
helpers degrade to identities, so the same entry points serve 1..N
hosts.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = [
    "init_distributed",
    "is_distributed",
    "process_index",
    "process_count",
    "host_shard",
    "allgather_pytree",
    "aggregate_counters",
]

_initialized = False


def init_distributed(
    coordinator: str = "",
    num_processes: int = 0,
    process_id: int = -1,
) -> bool:
    """Connect this process to the cluster; no-op without a coordinator.

    Returns True when running distributed (after initialize), False for
    single-process runs.  With empty args, tries the environment-based
    auto-detection only if JAX_COORDINATOR_ADDRESS is set.
    """
    global _initialized
    if _initialized:
        return True
    import os

    if not coordinator and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return False
    kw = {}
    if coordinator:
        kw = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)
    _initialized = True
    return True


def is_distributed() -> bool:
    return _initialized or jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def host_shard(items: list, index: int | None = None, count: int | None = None) -> list:
    """This host's contiguous slice of a work list (reads, channels, files).

    Every host must pass the same ``items`` order; slices are balanced to
    within one element.
    """
    i = process_index() if index is None else index
    n = process_count() if count is None else count
    base, rem = divmod(len(items), n)
    start = i * base + min(i, rem)
    return items[start : start + base + (1 if i < rem else 0)]


def allgather_pytree(tree):
    """Gather a host-local pytree of arrays from every process.

    Returns the pytree with a leading process axis on every leaf.  In a
    single-process run this is just ``tree`` with a length-1 axis.
    """
    if process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(x)[None, ...], tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(np.asarray(x))),
        tree,
    )


def aggregate_counters(counters: dict[str, int | float]) -> dict[str, int | float]:
    """Sum scalar counters across hosts (process-0 report aggregation).

    Integers travel as int64 (exact for any count; a float64 round trip
    silently loses precision above 2**53), floats as float64.
    """
    keys = sorted(counters)
    int_keys = [k for k in keys if isinstance(counters[k], (int, np.integer))]
    flt_keys = [k for k in keys if k not in int_keys]
    out: dict[str, int | float] = {}
    if int_keys:
        ivec = np.array([counters[k] for k in int_keys], dtype=np.int64)
        itotal = allgather_pytree(ivec).sum(axis=0)
        out.update({k: int(v) for k, v in zip(int_keys, itotal)})
    if flt_keys:
        fvec = np.array([float(counters[k]) for k in flt_keys], dtype=np.float64)
        ftotal = allgather_pytree(fvec).sum(axis=0)
        out.update({k: float(v) for k, v in zip(flt_keys, ftotal)})
    return out
