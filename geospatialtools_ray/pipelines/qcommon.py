"""Shared helpers for the driver-query family modules (split from
extraqueries.py, round 5)."""

from __future__ import annotations

from .. import io

KNUTH_MULT = 2654435761  # 2^32 / phi, Knuth TAOCP vol 3 s6.4


def _read(sf_dir: str, table: str, columns=None):
    return io.read_named(sf_dir, table, columns=columns)
