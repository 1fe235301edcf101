"""Test-set decontamination: flag training documents that share word
k-grams with a (much smaller) evaluation corpus.

This is the standard LLM-training-data hygiene pass (Brown et al. 2020
appendix C; Gao et al. 2020 "The Pile" §6): build the set of evaluation
k-grams once, then stream every training document through a membership
probe. The Ray-Data shape is a classic broadcast join:

- the EVAL side is tiny relative to the corpus (benchmarks are MBs, the
  corpus is TBs), so its gram set is built with per-batch partial uniques
  and shipped to every worker ONCE via ``ray.put`` — never a shuffle;
- the TRAIN side is a single stateless ``map_batches`` pass: one flat
  gram-hash array per batch (`sketch.gram_hash_flat`, no per-doc Python),
  one ``searchsorted`` membership probe, one ``add.reduceat`` per-doc
  rollup. Nothing ever materializes.

Two membership structures, same probe API:

- exact: the sorted uint64 gram-hash array. Memory = 8 B/gram. Right up
  to ~1e9 eval grams (8 GB broadcast), far beyond any benchmark suite.
- :class:`BloomFilter`: fixed-size bit array, ~2 B/gram at 1e-4 FP. The
  per-batch partial is a Bloom OR-fold, which is ASSOCIATIVE — so at
  scale the build is a shuffle-free tree combine (same lever as
  relational.tree_group_sum), and the probe can only over-flag (no false
  negatives): safe for a removal pass, where a false positive costs one
  dropped document and a false negative leaks contamination.

Gram definition is shared with sketch.py / the DuckDB oracles: words =
text.split(); docs with >= k words emit n-k+1 sliding grams; shorter docs
emit ONE gram over all their words (empty doc -> gram hash 0 / '').
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64
from .sketch import gram_hash_flat

_STREAM_STEP = np.uint64(0x9E3779B97F4A7C15)


class BloomFilter:
    """Vectorized Bloom filter over uint64 keys.

    ``n_hashes`` probe positions are derived per key as
    splitmix64(key + i*step) % n_bits — independent streams from the same
    finalizer the rest of the repo uses. The backing array is uint64 words;
    two filters built with the same (n_bits, n_hashes) merge with ``|``.
    """

    __slots__ = ("bits", "n_bits", "n_hashes")

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        if n_bits <= 0 or n_bits % 64:
            raise ValueError("n_bits must be a positive multiple of 64")
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.bits = np.zeros(n_bits // 64, dtype=np.uint64) if bits is None else bits

    @staticmethod
    def params_for(n_items: int, fp_rate: float = 1e-4) -> tuple[int, int]:
        """Optimal (n_bits, n_hashes) for a target false-positive rate:
        m = -n ln p / ln(2)^2, j = m/n ln 2 (standard Bloom sizing)."""
        n = max(1, int(n_items))
        m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2.0) ** 2)))
        m = ((m + 63) // 64) * 64
        j = max(1, int(round(m / n * np.log(2.0))))
        return m, j

    def _positions(self, keys: np.ndarray, i: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (splitmix64(keys + np.uint64(i + 1) * _STREAM_STEP) % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        for i in range(self.n_hashes):
            p = self._positions(keys, i)
            np.bitwise_or.at(self.bits, p >> 6, np.uint64(1) << (p.astype(np.uint64) & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.n_hashes):
            p = self._positions(keys, i)
            word = self.bits[p >> 6]
            out &= (word >> (p.astype(np.uint64) & np.uint64(63))) & np.uint64(1) != 0
        return out

    def union(self, other: "BloomFilter") -> "BloomFilter":
        if (self.n_bits, self.n_hashes) != (other.n_bits, other.n_hashes):
            raise ValueError("Bloom params differ; filters are not mergeable")
        return BloomFilter(self.n_bits, self.n_hashes, self.bits | other.bits)


def gram_set_exact(ds, text_col: str = "text", k: int = 5) -> np.ndarray:
    """Sorted unique gram hashes of a (SMALL) dataset, as int64 views.

    Per-batch ``np.unique`` partials cut the driver volume to the distinct
    grams per batch; the driver merge is one more ``np.unique``. This is
    the eval-side build — the side that fits by construction. For an eval
    side too big to hold as a sorted array, use :func:`bloom_from_dataset`.
    """

    def partial(b: pa.Table) -> pa.Table:
        g, _, _ = gram_hash_flat(b[text_col], k)
        return pa.table({"g": pa.array(np.unique(g).view(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return np.unique(parts["g"].to_numpy(dtype=np.int64))


def bloom_tree_fold(ds, key_fn, n_bits: int, n_hashes: int) -> BloomFilter:
    """Fold a Dataset into ONE Bloom filter with the associative tree
    OR-combine: ``key_fn(batch) -> uint64 array`` extracts each batch's
    keys, per-batch partial filters fold through TWO 64-to-1 map_batches
    levels (one fixed-size row per 4096 input blocks reaches the driver —
    a single level would still collect ~15k rows x n_bits/8 bytes at 10^6
    blocks), and the driver ORs the survivors. OR is associative and
    commutative, so any combine order gives the same bits. Shared by the
    decontamination gram build and pipelines.joins.bloom_from_keys."""

    def partial(b: pa.Table) -> pa.Table:
        f = BloomFilter(n_bits, n_hashes)
        f.add(key_fn(b))
        return pa.table({"bits": pa.array([f.bits.view(np.int64)])})

    def combine(b: pa.Table) -> pa.Table:
        arrs = [np.asarray(x, dtype=np.int64).view(np.uint64) for x in b["bits"].to_pylist()]
        acc = arrs[0].copy()
        for a in arrs[1:]:
            acc |= a
        return pa.table({"bits": pa.array([acc.view(np.int64)])})

    lvl = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        combine, batch_format="pyarrow", batch_size=64
    ).map_batches(combine, batch_format="pyarrow", batch_size=64)
    rows = lvl.take_all()
    acc = BloomFilter(n_bits, n_hashes)
    for r in rows:
        acc.bits |= np.asarray(r["bits"], dtype=np.int64).view(np.uint64)
    return acc


def bloom_from_dataset(ds, text_col: str = "text", k: int = 5,
                       n_bits: int = 1 << 20, n_hashes: int = 7) -> BloomFilter:
    """Bloom filter of a dataset's grams (the eval-side build at scale)."""
    return bloom_tree_fold(ds, lambda b: gram_hash_flat(b[text_col], k)[0], n_bits, n_hashes)


def contamination_counts(ds, member, text_col: str = "text", id_col: str = "doc_id", k: int = 5):
    """Per-document gram counts + eval-set hit counts as a Dataset.

    ``member`` is either a ``ray.ObjectRef`` to a sorted int64 gram array
    (exact membership via searchsorted) or to a :class:`BloomFilter`
    (approximate, no false negatives). One probe per gram, one reduceat
    per batch — the corpus streams through untouched otherwise.
    """
    import ray

    def probe(b: pa.Table) -> pa.Table:
        m = ray.get(member)
        g, go, _ = gram_hash_flat(b[text_col], k)
        if isinstance(m, BloomFilter):
            hit = m.contains(g)
        elif len(m) == 0:  # empty eval set: nothing is contaminated
            hit = np.zeros(len(g), dtype=bool)
        else:
            gi = g.view(np.int64)
            pos = np.searchsorted(m, gi)
            hit = (pos < len(m)) & (m[np.clip(pos, 0, len(m) - 1)] == gi)
        n_docs = len(go) - 1
        hits = np.add.reduceat(hit.astype(np.int64), go[:-1]) if len(g) else np.zeros(n_docs, dtype=np.int64)
        # reduceat repeats the value at a duplicated offset (doc with 0
        # grams can't happen — every doc emits >= 1 gram), so counts align
        return pa.table(
            {
                id_col: b[id_col],
                "n_grams": pa.array((go[1:] - go[:-1]).astype(np.int64)),
                "n_hits": pa.array(hits),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")
