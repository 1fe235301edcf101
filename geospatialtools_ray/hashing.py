"""Stateless, vectorized deterministic hashing for synthesis and sampling.

All synthetic data in this repo is a pure function of (seed, key) through
splitmix64 (Steele et al., public domain PRNG finalizer), so generation can
run inside `map_batches` over `ray.data.range(n)` with no driver-side RNG
state and no cross-task coordination — the property that makes corpus
synthesis scale to 10^12 docs.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 -> uint64 (wrapping)."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + _C1
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def h64(key, stream: int = 0) -> np.ndarray:
    """Hash key array with a stream discriminator (cheap independent streams)."""
    with np.errstate(over="ignore"):
        return splitmix64(splitmix64(np.asarray(key, dtype=np.uint64)) + np.uint64(stream) * _C3)


def uniform01(key, stream: int = 0) -> np.ndarray:
    """Deterministic U[0,1) from a key array."""
    return (h64(key, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def normal01(key, stream: int = 0) -> np.ndarray:
    """Deterministic standard normal via Box-Muller on two hash streams."""
    u1 = np.maximum(uniform01(key, stream * 2 + 101), 1e-300)
    u2 = uniform01(key, stream * 2 + 102)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def text_hash_u64(texts) -> np.ndarray:
    """Stable 64-bit content hash of a string sequence. Used for
    hash-partitioned exact dedup, where shuffling a 64-bit key instead of
    full document text is the difference between a cheap and an impossible
    shuffle at 100 TB. Vectorized through polars' Rust hash kernel
    (deterministic for a fixed polars version, which all workers share);
    falls back to per-row blake2b (C speed per string) without polars."""
    try:
        import polars as pl
        import pyarrow as pa

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # A Ray worker can inherit a HALF-EXECUTED polars module: if the
        # worker process template forked while some thread was mid-import,
        # every module in the polars package tree is registered in
        # sys.modules but its body never finished ("polars._reexport has
        # no attribute 'Series'", observed intermittently per worker pid,
        # persistent within that worker). Sleeping cannot fix a snapshot —
        # the repair is to EVICT the whole package tree and re-import
        # fresh in this process. If that still fails, raise LOUDLY: a
        # per-call fallback to a different hash function would let two
        # workers key the same text differently (silent dedup misses).
        last_err = None
        for attempt in range(3):
            try:
                if isinstance(texts, pa.Array):
                    s = pl.from_arrow(texts)
                else:
                    s = pl.Series(list(texts), dtype=pl.Utf8)
                return s.hash(seed=0).to_numpy().astype(np.uint64)
            except AttributeError as e:  # pragma: no cover - fork snapshot
                last_err = e
                import sys as _sys

                for mod in [m for m in _sys.modules if m == "polars" or m.startswith("polars.")]:
                    del _sys.modules[mod]
                import polars as pl  # noqa: F811 - deliberate fresh import
        raise RuntimeError(
            "text_hash_u64: polars unusable in this worker even after a "
            "fresh re-import — refusing the blake2b fallback mid-run "
            "because mixed hash functions across workers silently break "
            "hash-partitioned dedup"
        ) from last_err
    except ImportError:  # pragma: no cover
        import hashlib

        return np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little") for t in texts),
            dtype=np.uint64,
            count=len(texts),
        )
