"""Small numeric conventions shared by engine queries and SQL oracles.

The driver's correctness gate hashes float bytes exactly, so every
quantization the engine performs must follow the SAME rounding rule as
the DuckDB expression in the paired oracle SQL.
"""

from __future__ import annotations

import numpy as np


def sql_round(x) -> np.ndarray:
    """Round half AWAY from zero — the convention of SQL round() (DuckDB:
    round(62.5)=63, round(-62.5)=-63). numpy's np.round is half-to-even
    (np.round(62.5)=62), which silently diverges from a paired SQL oracle
    whenever a product lands on an exactly-representable .5 — latent on
    the current corpora (scanned: zero exact halves) but a false red at
    larger scale. Returns float64; callers cast to their integer dtype.
    """
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) + 0.5), x)
