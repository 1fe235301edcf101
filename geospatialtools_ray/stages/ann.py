"""Approximate-nearest-neighbor search over embedding columns.

- `brute_force_topk`: exact cosine top-k per batch against a broadcast
  query matrix (numpy matmul; the baseline). One small final merge.
- `lsh_partitioned_topk`: the scale path — random-hyperplane LSH buckets
  as the partition key; queries probe only their own (+optionally ring)
  buckets. Recall < 1 by construction; the baseline is the oracle.
- `ivf_partitioned_topk`: IVF-style alternative — deterministic KMeans
  coarse centroids (functions/cluster.py), search nprobe nearest lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import uniform01


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    try:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        n = len(batch)
        return np.asarray(flat, dtype=np.float64).reshape(n, -1)
    except Exception:  # tensor extension
        return np.stack([np.asarray(x) for x in arr.to_pylist()]).astype(np.float64)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 17) -> np.ndarray:
    """Deterministic hyperplane matrix from the splitmix stream."""
    keys = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(seed) * np.uint64(7919)
    u = uniform01(keys, 31)
    return (u.reshape(n_planes, dim) * 2.0 - 1.0)


def lsh_codes(E: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (E @ planes.T) > 0
    return (bits.astype(np.uint64) << np.arange(planes.shape[0], dtype=np.uint64)[None, :]).sum(axis=1)


class BruteForceTopK:
    """Actor stage: per batch, cosine of all rows vs the broadcast query
    matrix; emits per-(query, batch) partial top-k rows. A final tiny
    groupby-sort merge yields the global top-k."""

    def __init__(self, queries_ref, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if hasattr(queries_ref, "hex") else queries_ref
        self.Q = np.asarray(q, dtype=np.float64)  # (nq, dim)
        self.Qn = self.Q / np.maximum(np.linalg.norm(self.Q, axis=1, keepdims=True), 1e-30)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _emb_matrix(batch, self.emb_col)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        sims = En @ self.Qn.T  # (n, nq)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.Qn.shape[0]):
            s = sims[:, qi]
            top = np.argpartition(-s, k - 1)[:k] if k < len(s) else np.arange(len(s))
            order = top[np.lexsort((ids[top], -s[top]))]
            out_q.append(np.full(k, qi, dtype=np.int32))
            out_id.append(ids[order])
            out_sim.append(s[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "cos_sim": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding", concurrency=(1, 8)):
    """Exact top-k: partial per-batch top-k (actor pool) -> global merge of
    the tiny partials (sort+head per query on the driver)."""
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": q_ref, "k": k, "id_col": id_col, "emb_col": emb_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()
    out = (
        partials.sort_values(["query_id", "cos_sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def lsh_partitioned_topk(ds, queries: np.ndarray, k: int = 10, n_planes: int = 8, id_col: str = "vec_id", emb_col: str = "embedding"):
    """LSH-bucketed ANN: bucket = hyperplane sign code (the partition key);
    each query searches only its bucket. Returns (results_df, recall_probe):
    results may miss true neighbors in other buckets — benchmark against
    brute_force_topk for recall."""
    Q = np.asarray(queries, dtype=np.float64)
    dim = Q.shape[1]
    planes = random_hyperplanes(dim, n_planes)
    qcodes = lsh_codes(Q, planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        E = _emb_matrix(batch, emb_col)
        codes = lsh_codes(E, planes)
        return batch.append_column("lsh_bucket", pa.array(codes, type=pa.uint64()))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    wanted = set(qcodes.tolist())

    def in_wanted(batch: pa.Table) -> pa.Table:
        codes = batch["lsh_bucket"].to_numpy(zero_copy_only=False)
        keep = np.isin(codes, np.asarray(list(wanted), dtype=np.uint64))
        return batch.filter(pa.array(keep))

    cand = bucketed.map_batches(in_wanted, batch_format="pyarrow").to_pandas()
    results = []
    for qi, qc in enumerate(qcodes):
        sub = cand[cand["lsh_bucket"] == qc]
        if sub.empty:
            continue
        E = np.stack([np.asarray(e) for e in sub[emb_col]]).astype(np.float64)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        qn = Q[qi] / max(np.linalg.norm(Q[qi]), 1e-30)
        s = En @ qn
        ids = sub[id_col].to_numpy()
        kk = min(k, len(ids))
        order = np.lexsort((ids, -s))[:kk]
        results.append(pd.DataFrame({"query_id": qi, id_col: ids[order], "cos_sim": s[order]}))
    return pd.concat(results, ignore_index=True) if results else pd.DataFrame(columns=["query_id", id_col, "cos_sim"])
