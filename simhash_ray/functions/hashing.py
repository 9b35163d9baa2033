"""Vectorized, process-stable hash helpers for partitioning keys.

Python's builtin ``hash`` is salted per process — never use it for a
shuffle key.  ``pandas.util.hash_array`` (SipHash with a pinned key) is
deterministic across processes and vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MIX = np.uint64(0x9E3779B97F4A7C15)


def hash_strings(values: np.ndarray) -> np.ndarray:
    """Deterministic u64 hash of an object/str ndarray."""
    return pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)


def part_of_strings(values: np.ndarray, n_parts: int) -> np.ndarray:
    return (hash_strings(values) % np.uint64(n_parts)).astype(np.int32)


def mix_ints(*cols: np.ndarray) -> np.ndarray:
    """Combine int64/uint64 columns into one u64 key (order-sensitive)."""
    acc = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        acc = (acc ^ np.asarray(c).astype(np.int64).view(np.uint64)) * _MIX
    acc ^= acc >> np.uint64(31)
    return acc


def part_of_ints(n_parts: int, *cols: np.ndarray) -> np.ndarray:
    return (mix_ints(*cols) % np.uint64(n_parts)).astype(np.int32)
