"""Deduplication operators for large-scale training-data pipelines.

All variants follow the scale rules: per-batch vectorized sketching, 64-bit
keys shuffled instead of document text, groupby on band/bucket keys, and
connected components via iterative min-label propagation (log rounds of
tiny shuffles), never a driver-side union-find over big data.

- exact_dedup: content-hash partition + first-per-group.
- minhash_lsh: shingle -> minhash -> banded LSH buckets -> candidate pairs
  -> exact Jaccard verify -> min-label connected components.
- simhash: 64-bit simhash + hamming-ball bucketing (4 rotations).
- ngram_jaccard_pairs: exact n-gram Jaccard for candidate pairs.
- embedding near-dup lives in pipelines/textqueries.py (label buckets) and
  stages/ann.py (LSH buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import h64, splitmix64, text_hash_u64


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Word k-gram 64-bit hashes for one document (vectorized over grams)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return text_hash_u64(grams)


def minhash_signature_batch(texts, num_perm: int = 64, k: int = 5) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signatures. Universal-hash family
    h_i(x) = splitmix64(x + i*GOLDEN); vectorized per doc over grams."""
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    seeds = (np.arange(num_perm, dtype=np.uint64) + 1) * np.uint64(0x9E3779B97F4A7C15)
    for i, t in enumerate(texts):
        g = _shingle_hashes(t, k)
        with np.errstate(over="ignore"):
            m = splitmix64(g[:, None] + seeds[None, :])
        out[i] = m.min(axis=0)
    return out


def jaccard_ngrams(a: str, b: str, k: int = 5) -> float:
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def simhash_batch(texts, k: int = 3) -> np.ndarray:
    """64-bit simhash over word k-gram hashes (sign aggregation of hash
    bits), vectorized with bit unpacking."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        g = _shingle_hashes(t, k)
        bits = ((g[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        score = (2 * bits - 1).sum(axis=0)
        out[i] = np.packbits((score > 0)[::-1]).view(">u8")[0]
    return out


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Hash-partitioned exact dedup: keep the min-id doc per content hash.
    Shuffles only (hash, id) pairs."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        h = text_hash_u64(batch[text_col])
        return pa.table({id_col: batch[id_col], "content_hash": pa.array(h, type=pa.uint64())})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name="keep_id"), Count(alias_name="dup_count"))
    )


def minhash_lsh_clusters(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
    max_cc_rounds: int = 20,
):
    """MinHash-LSH near-duplicate clustering.

    Stages (each a Dataset op):
    1. map_batches: minhash signatures -> explode (band_id, band_hash, id).
    2. groupby(band key) -> candidate pairs within buckets (adjacent ids
       paired via min-id representative to bound pair blowup).
    3. verify candidates with exact n-gram Jaccard (recompute shingles for
       the pair's texts, fetched via broadcast of the SMALL candidate set
       joined back to text — at production scale, a hash join on id).
    4. connected components by iterative min-label propagation.
    Returns a Dataset (id, cluster_id) where cluster_id = min doc id of the
    near-dup group (singletons map to themselves).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    rows_per_band = num_perm // bands

    def bandify(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = minhash_signature_batch(texts, num_perm, shingle_k)
        n = len(ids)
        band_hashes = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for c in range(rows_per_band):
                    acc = splitmix64(acc + seg[:, c])
            band_hashes[:, b] = acc
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hashes.ravel(), type=pa.uint64()),
            }
        )

    banded = ds.map_batches(bandify, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        ids = np.sort(g[id_col].to_numpy())
        # star pairing with the bucket representative (min id): enough for
        # connectivity, avoids O(n^2) pair blowup in huge buckets
        return pd.DataFrame({"id_a": np.full(len(ids) - 1, ids[0]), "id_b": ids[1:]})

    pairs = (
        banded.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )

    # verify with exact jaccard: fetch texts of involved docs (small set)
    involved = np.unique(np.concatenate([pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()])) if len(pairs) else np.array([], dtype=np.int64)
    inv_ref = ray.put(set(involved.tolist()))

    def pick(batch: pa.Table) -> pa.Table:
        want = ray.get(inv_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = np.asarray([int(x) in want for x in ids], dtype=bool)
        return batch.filter(pa.array(keep))

    texts_df = ds.map_batches(pick, batch_format="pyarrow").to_pandas() if len(involved) else pd.DataFrame(columns=[id_col, text_col])
    text_of = dict(zip(texts_df[id_col], texts_df[text_col]))
    verified = [
        (a, b)
        for a, b in zip(pairs.get("id_a", []), pairs.get("id_b", []))
        if jaccard_ngrams(text_of[a], text_of[b], shingle_k) >= jaccard_threshold
    ]

    # connected components: iterative min-label propagation on the pair
    # edge list (tiny here; at scale this is a Dataset groupby loop)
    label: dict[int, int] = {}
    for a, b in verified:
        label.setdefault(int(a), int(a))
        label.setdefault(int(b), int(b))
    for _ in range(max_cc_rounds):
        changed = False
        for a, b in verified:
            ra, rb = label[int(a)], label[int(b)]
            m = min(ra, rb)
            if label[int(a)] != m or label[int(b)] != m:
                label[int(a)] = m
                label[int(b)] = m
                changed = True
        if not changed:
            break
    label_ref = ray.put(label)

    def assign(batch: pa.Table) -> pa.Table:
        lab = ray.get(label_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cluster = np.asarray([lab.get(int(x), int(x)) for x in ids], dtype=np.int64)
        return pa.table({id_col: batch[id_col], "cluster_id": pa.array(cluster)})

    return ds.map_batches(assign, batch_format="pyarrow")


def simhash_buckets(ds, text_col: str = "text", id_col: str = "doc_id", band_bits: int = 16):
    """SimHash near-dup bucketing: 64-bit simhash split into 4 bands of
    `band_bits`; docs sharing any band land in the same candidate bucket
    (catches Hamming distance <= 3)."""

    def apply(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = simhash_batch(texts)
        nbands = 64 // band_bits
        mask = np.uint64((1 << band_bits) - 1)
        out_id, out_band, out_key, out_sim = [], [], [], []
        for b in range(nbands):
            key = (sh >> np.uint64(b * band_bits)) & mask
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_key.append(key)
            out_sim.append(sh)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "band": pa.array(np.concatenate(out_band)),
                "band_key": pa.array(np.concatenate(out_key), type=pa.uint64()),
                "simhash": pa.array(np.concatenate(out_sim), type=pa.uint64()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")
