"""Shared Arrow-batch numeric conversion for the vectorized operator
tiers (the SRP signature matmul and the prefix scan). One copy of the
subtle precision-guard logic (ADVICE r11 / review r12): NULL-bearing
int64 list/columns cross the Arrow->pandas boundary as float64 (NaN for
NULL) or object (None), and a silent float64 round-trip drops low bits
past 2^53 — which would quietly break documented bit-identity
guarantees. int64 passes through untouched; object arrays (Python ints
+ None) convert exactly; only the inherently lossy float64 form is
guarded by a LOUD raise instead of divergence."""

from __future__ import annotations

import numpy as np


def to_int64_exact(v) -> tuple:
    """Convert an Arrow-delivered numeric vector to (int64 values,
    validity mask). Invalid (NULL) slots hold 0 in the value array."""
    a = np.asarray(v)
    if a.dtype.kind in "iu":
        return a.astype(np.int64, copy=False), np.ones(len(a), dtype=bool)
    if a.dtype == object:
        valid = np.array([e is not None for e in a], dtype=bool)
        vals = np.array(
            [0 if e is None else int(e) for e in a], dtype=np.int64
        )
        return vals, valid
    f = np.asarray(a, dtype=np.float64)
    valid = ~np.isnan(f)
    f = np.nan_to_num(f, nan=0.0)
    if np.any(np.abs(f) >= 2.0**53):
        raise ValueError(
            "int64 conversion: |value| >= 2^53 arrived through the "
            "float64 NULL path — the conversion would lose integer "
            "precision and silently diverge from the exact tier"
        )
    return f.astype(np.int64), valid
