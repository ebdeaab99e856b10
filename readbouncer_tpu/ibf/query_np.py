"""Host (numpy) reference implementation of the IBF query.

Semantically identical to the device path in ibf/query.py; used as the
equality oracle in tests and as a no-JAX fallback.  Kept deliberately
simple and obviously-correct.
"""

from __future__ import annotations

import numpy as np

from readbouncer_tpu.ibf.hashing import hash_rows_np, kmer_codes_np
from readbouncer_tpu.ibf.storage import IBFData

__all__ = ["counts_np", "max_count_np"]


def counts_np(ibf: IBFData, bases: np.ndarray) -> np.ndarray:
    """Per-bin (fwd, rc) match counts for one encoded read.

    Returns int32 [2, padded_bins].
    """
    out = np.zeros((2, ibf.padded_bins), dtype=np.int32)
    fwd, rc = kmer_codes_np(np.asarray(bases), ibf.kmer_size)
    for s, codes in enumerate((fwd, rc)):
        if codes.size == 0:
            continue
        rows = hash_rows_np(
            codes, ibf.hash_functions, ibf.rows, scheme=ibf.scheme
        )  # [n, h]
        words = ibf.bits[rows.astype(np.int64)]  # [n, h, W]
        anded = words[:, 0, :]
        for i in range(1, ibf.hash_functions):
            anded = anded & words[:, i, :]
        shifts = np.arange(32, dtype=np.uint32)
        sel = (anded[:, :, None] >> shifts) & np.uint32(1)  # [n, W, 32]
        out[s] = sel.sum(axis=0).reshape(-1).astype(np.int32)
    return out


def max_count_np(ibf: IBFData, bases: np.ndarray, threshold: int) -> int:
    """max_matches over declared bins (reference: src/IBF/IBFClassify.cpp:48-71)."""
    c = counts_np(ibf, bases)[:, : ibf.num_bins]
    matched = (c[0] >= threshold) | (c[1] >= threshold)
    cand = np.where(matched, np.maximum(c[0], c[1]), 0)
    return int(cand.max()) if cand.size else 0
