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
    if len(arr) == 0:
        # reshape(0, -1) is ambiguous and np.stack([]) raises; empty blocks
        # are routine after upstream filters
        dim = arr.type.list_size if pa.types.is_fixed_size_list(arr.type) else 0
        return np.zeros((0, dim), dtype=np.float64)
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
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int32()),
                    self.id_col: pa.array([], type=pa.int64()),
                    "cos_sim": pa.array([], type=pa.float64()),
                }
            )
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


def _scored_topk_partials(bucketed, bucket_col, bucket_to_queries_ref, Q, k, id_col, emb_col):
    """groupby(bucket).map_groups scorer: each bucket group scores ONLY the
    queries probing that bucket against its own members and emits per-
    (bucket, query) top-k partials. Distributed — candidate rows never
    reach the driver; the driver merges k rows per (query, probed bucket)."""
    import ray

    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put(Qn)

    def score_group(g: pd.DataFrame) -> pd.DataFrame:
        b2q = ray.get(bucket_to_queries_ref)
        qn = ray.get(q_ref)
        qids = b2q.get(int(g[bucket_col].iloc[0]), ())
        if not qids:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"), id_col: pd.Series(dtype="int64"), "cos_sim": pd.Series(dtype="float64")})
        E = np.stack([np.asarray(e) for e in g[emb_col]]).astype(np.float64)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        ids = g[id_col].to_numpy()
        out = []
        sims = En @ qn[list(qids)].T  # (n, nq_probing)
        for col, qi in enumerate(qids):
            s = sims[:, col]
            kk = min(k, len(ids))
            top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            order = top[np.lexsort((ids[top], -s[top]))]
            out.append(pd.DataFrame({"query_id": qi, id_col: ids[order], "cos_sim": s[order]}))
        return pd.concat(out, ignore_index=True)

    partials = bucketed.groupby(bucket_col).map_groups(score_group, batch_format="pandas").to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["query_id", id_col, "cos_sim"])
    return (
        partials.sort_values(["query_id", "cos_sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )


def probe_masks_by_margin(margins: np.ndarray):
    """Yield bit-flip masks over ``len(margins)`` hyperplanes in nondecreasing
    order of summed flipped |projection| (the multi-probe LSH probing
    sequence of Lv et al., VLDB 2007). First yield is always 0 (the query's
    own bucket). Heap over perturbation sets: each set's successors are
    'shift' (replace max sorted-index m with m+1) and 'expand' (add m+1);
    both are score-nondecreasing because margins are visited sorted
    ascending, so heap-pop order is globally nondecreasing."""
    import heapq

    npl = len(margins)
    yield 0
    if npl == 0:
        return
    perm = np.argsort(margins, kind="stable")
    z = margins[perm]
    # heap entries: (score, tie, tuple_of_sorted_indices)
    tie = 0
    heap = [(float(z[0]), tie, (0,))]
    while heap:
        score, _, A = heapq.heappop(heap)
        mask = 0
        for i in A:
            mask |= 1 << int(perm[i])
        yield mask
        m = A[-1]
        if m + 1 < npl:
            tie += 1
            heapq.heappush(heap, (score - float(z[m]) + float(z[m + 1]), tie, A[:-1] + (m + 1,)))
            tie += 1
            heapq.heappush(heap, (score + float(z[m + 1]), tie, A + (m + 1,)))


def bucket_counts(ds, code_fn, emb_col: str = "embedding") -> dict[int, int]:
    """Per-bucket row counts via one codes-only pass: each batch emits its
    local (bucket, cnt) histogram (bounded by distinct codes per batch, not
    rows), summed on the driver. Driver sees <= n_blocks x n_buckets tiny
    rows — safe at any N for bounded bucket vocabularies (2^n_planes /
    n_lists)."""
    def cnt(batch: pa.Table) -> pa.Table:
        codes = np.asarray(code_fn(batch), dtype=np.int64)
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"bucket": pa.array(u, type=pa.int64()), "cnt": pa.array(c, type=pa.int64())})

    parts = ds.select_columns([emb_col]).map_batches(cnt, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return {}
    return {int(k): int(v) for k, v in parts.groupby("bucket")["cnt"].sum().items()}


def adaptive_lsh_probes(
    Q: np.ndarray, planes: np.ndarray, counts: dict[int, int], min_candidates: int, max_probes: int = 0
) -> list[list[int]]:
    """Per-query probe list grown in multi-probe margin order until the
    probed buckets hold >= ``min_candidates`` rows (or buckets run out /
    ``max_probes`` is hit). Empty buckets are skipped without counting
    against max_probes; candidates stay bounded per bucket because scoring
    still happens inside groupby(bucket).map_groups."""
    proj = Q @ planes.T
    base = ((proj > 0).astype(np.uint64) << np.arange(planes.shape[0], dtype=np.uint64)[None, :]).sum(axis=1)
    nbuckets_total = 1 << planes.shape[0]
    out = []
    for qi in range(Q.shape[0]):
        margins = np.abs(proj[qi])
        probes: list[int] = []
        total = 0
        seen = 0
        for mask in probe_masks_by_margin(margins):
            seen += 1
            code = int(base[qi]) ^ mask
            c = counts.get(code, 0)
            if c > 0 or mask == 0:
                probes.append(code)
                total += c
            if total >= min_candidates or (max_probes and len(probes) >= max_probes) or seen >= nbuckets_total:
                break
        out.append(probes)
    return out


def multiprobe_codes(Q: np.ndarray, planes: np.ndarray, n_probes: int) -> list[list[int]]:
    """Per-query probe sequence: the query's own bucket first, then the
    buckets reached by flipping the LOWEST-MARGIN hyperplane bits —
    perturbations ranked by summed |projection| of the flipped planes
    (single-bit then pair flips; standard multi-probe LSH ordering). A
    near-zero projection means the true neighbors straddle that plane, so
    those flips recover most of the recall lost to single-probe."""
    proj = Q @ planes.T  # (nq, n_planes)
    base = ((proj > 0).astype(np.uint64) << np.arange(planes.shape[0], dtype=np.uint64)[None, :]).sum(axis=1)
    npl = planes.shape[0]
    margins = np.abs(proj)
    out = []
    for qi in range(Q.shape[0]):
        perturbs: list[tuple[float, int]] = [(margins[qi, b], 1 << b) for b in range(npl)]
        perturbs += [
            (margins[qi, b1] + margins[qi, b2], (1 << b1) | (1 << b2))
            for b1 in range(npl)
            for b2 in range(b1 + 1, npl)
        ]
        perturbs.sort()
        probes = [int(base[qi])]
        for _, flip in perturbs[: max(0, n_probes - 1)]:
            probes.append(int(base[qi]) ^ flip)
        out.append(probes)
    return out


def lsh_partitioned_topk(
    ds, queries: np.ndarray, k: int = 10, n_planes: int = 8, id_col: str = "vec_id",
    emb_col: str = "embedding", n_probes: int = 1, min_candidates: int | None = None,
):
    """LSH-bucketed ANN: bucket = hyperplane sign code (the partition key);
    each query searches its own bucket plus, with ``n_probes > 1``, the
    ``n_probes - 1`` nearest perturbation buckets (lowest-margin bit flips
    — see multiprobe_codes). Scoring happens INSIDE a
    groupby(bucket).map_groups stage (round-2 rewrite — previously all
    candidate rows were materialized to the driver); only per-bucket top-k
    partials leave the cluster, so multiprobe multiplies probed-bucket
    count (driver merge rows), never shipped candidate rows. Recall < 1 by
    construction — benchmark against brute_force_topk.

    With ``min_candidates`` set, the per-query probe list instead GROWS in
    margin order until the probed buckets hold at least that many rows
    (adaptive candidate budget; one extra codes-only counting pass), which
    is the recall lever: budget B of N rows bounds work at ~B exact scores
    per query while recall approaches brute force as B grows."""
    import ray

    Q = np.asarray(queries, dtype=np.float64)
    planes = random_hyperplanes(Q.shape[1], n_planes)
    if min_candidates is not None:
        counts = bucket_counts(ds, lambda b: lsh_codes(_emb_matrix(b, emb_col), planes).astype(np.int64), emb_col)
        per_query = adaptive_lsh_probes(Q, planes, counts, min_candidates)
    else:
        per_query = multiprobe_codes(Q, planes, n_probes)
    b2q: dict[int, tuple[int, ...]] = {}
    for qi, probes in enumerate(per_query):
        for code in probes:
            b2q[code] = b2q.get(code, ()) + (qi,)
    wanted = np.asarray(sorted(b2q), dtype=np.uint64)

    def bucketize(batch: pa.Table) -> pa.Table:
        E = _emb_matrix(batch, emb_col)
        codes = lsh_codes(E, planes)
        keep = np.isin(codes, wanted)
        return batch.append_column("lsh_bucket", pa.array(codes, type=pa.uint64())).filter(pa.array(keep))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    return _scored_topk_partials(bucketed, "lsh_bucket", ray.put(b2q), Q, k, id_col, emb_col)


def ivf_partitioned_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 2,
    sample_rate: float = 0.25,
    max_sample_rows: int = 200_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    min_candidates: int | None = None,
):
    """IVF-style ANN: deterministic KMeans coarse centroids (fit on a
    hash-sampled subset), every vector assigned to its nearest list in
    map_batches, queries probe their `nprobe` nearest lists; scoring is
    the same distributed per-list map_groups as the LSH path.

    The fit sample is capped at an ABSOLUTE row budget (`max_sample_rows`),
    not just a fraction — a fractional sample is a linear driver-memory
    term at 100 TB. Recall impact: coarse centroids fit on <=200k rows are
    statistically indistinguishable for n_lists<<200k (KMeans sample
    complexity ~ O(k·dim)); only list *balance* drifts slightly."""
    import ray

    from ..functions.cluster import effective_sample_rate, deterministic_sample_mask, kmeans_fit, kmeans_predict

    Q = np.asarray(queries, dtype=np.float64)

    # fit centroids on a deterministic sample (bounded driver-side matrix)
    rate = effective_sample_rate(ds.count(), sample_rate, max_sample_rows)

    def sample_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = deterministic_sample_mask(ids, rate)
        return batch.filter(pa.array(m))

    # sort by id: Ray does not preserve block order by default, and the
    # deterministic KMeans init is order-sensitive — the fit must see the
    # sample in one canonical order under any parallelism
    sample = ds.map_batches(sample_batch, batch_format="pyarrow").to_pandas().sort_values(id_col)
    X = np.stack([np.asarray(e) for e in sample[emb_col]]).astype(np.float64)
    C = kmeans_fit(X, min(n_lists, len(X)))
    C_ref = ray.put(C)

    dist_order = np.argsort(((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1)
    b2q: dict[int, tuple[int, ...]] = {}
    if min_candidates is not None:
        # adaptive budget: probe lists in centroid-distance order until the
        # probed lists hold >= min_candidates rows (one codes-only count pass)
        counts = bucket_counts(
            ds, lambda b: kmeans_predict(_emb_matrix(b, emb_col), C).astype(np.int64), emb_col
        )
        for qi in range(len(Q)):
            total = 0
            for l in dist_order[qi]:
                c = counts.get(int(l), 0)
                if c > 0 or total == 0:
                    b2q[int(l)] = b2q.get(int(l), ()) + (qi,)
                    total += c
                if total >= min_candidates:
                    break
    else:
        qlists = dist_order[:, :nprobe]
        for qi in range(len(Q)):
            for l in qlists[qi]:
                b2q[int(l)] = b2q.get(int(l), ()) + (qi,)
    wanted = np.asarray(sorted(b2q), dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        C_ = ray.get(C_ref)
        E = _emb_matrix(batch, emb_col)
        lists = kmeans_predict(E, C_)
        keep = np.isin(lists, wanted)
        return batch.append_column("ivf_list", pa.array(lists.astype(np.int64))).filter(pa.array(keep))

    listed = ds.map_batches(assign, batch_format="pyarrow")
    return _scored_topk_partials(listed, "ivf_list", ray.put(b2q), Q, k, id_col, emb_col)


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): the compressed-domain ANN path. Vectors are
# split into M contiguous subspaces; each subspace gets its own
# deterministic-KMeans codebook (KSUB centroids), so a vector compresses
# to M uint8 codes + one stored float norm (64-dim float64 512 B ->
# 8 B + 8 B = 32x). Queries scan codes via ADC lookup tables (one
# (KSUB,) matvec per subspace, then gather+add — no decompression), and
# the top-RERANK ADC candidates are re-ranked with exact cosine. Every
# step is a shared pure function so the single-process oracle twin
# replays the identical fit/encode/scan/re-rank arithmetic.
# ---------------------------------------------------------------------------


def pq_fit(X: np.ndarray, m: int, ksub: int) -> list[np.ndarray]:
    """Per-subspace deterministic-KMeans codebooks for (n, d) sample X.
    d must divide evenly into m contiguous subspaces."""
    from ..functions.cluster import kmeans_fit

    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    dsub = d // m
    return [
        kmeans_fit(np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub]), min(ksub, n))
        for j in range(m)
    ]


def pq_encode(E: np.ndarray, codebooks: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Encode (n, d) vectors: (n, m) uint8 codes + (n,) true float64 norms
    (the stored norm turns ADC inner product into approximate cosine)."""
    from ..functions.cluster import kmeans_predict

    m = len(codebooks)
    n, d = E.shape
    dsub = d // m
    codes = np.empty((n, m), dtype=np.uint8)
    for j, C in enumerate(codebooks):
        codes[:, j] = kmeans_predict(np.ascontiguousarray(E[:, j * dsub : (j + 1) * dsub]), C).astype(np.uint8)
    return codes, np.linalg.norm(E, axis=1)


def pq_adc_scores(q: np.ndarray, codebooks: list[np.ndarray], codes: np.ndarray, norms: np.ndarray) -> np.ndarray:
    """Approximate cosine of every coded vector to query q: subspace LUT
    gathers accumulated in fixed subspace order (deterministic float path),
    divided by |q| * stored true norm."""
    m = len(codebooks)
    dsub = q.shape[0] // m
    ip = np.zeros(len(codes), dtype=np.float64)
    for j, C in enumerate(codebooks):
        lut = C @ q[j * dsub : (j + 1) * dsub]
        ip += lut[codes[:, j].astype(np.int64)]
    qn = max(float(np.linalg.norm(q)), 1e-30)
    return ip / (qn * np.maximum(norms, 1e-30))


def pq_topk(
    ds,
    queries: np.ndarray,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 50,
    sample_rate: float = 0.25,
    max_sample_rows: int = 200_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Distributed PQ ANN: fit codebooks on the same capped deterministic
    sample discipline as IVF, broadcast them once, then one map_batches
    pass per block does encode -> ADC scan -> per-batch top-RERANK per
    query -> exact cosine for just those candidates (cheap: <=RERANK rows).
    The driver merges bounded partials (RERANK x queries x blocks rows):
    global top-RERANK by (adc desc, id asc), then final top-k by exact
    cosine — candidate embeddings never ship, only (id, adc, cos) trios.
    At 100 TB the steady state stores (codes, norm) beside the table and
    skips the encode, so the scan touches 32 B/vector instead of 512."""
    import ray

    from ..functions.cluster import deterministic_sample_mask, effective_sample_rate

    Q = np.asarray(queries, dtype=np.float64)
    rate = effective_sample_rate(ds.count(), sample_rate, max_sample_rows)

    def sample_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(deterministic_sample_mask(ids, rate)))

    # canonical order for the order-sensitive deterministic fit (Ray does
    # not preserve block order)
    sample = ds.map_batches(sample_batch, batch_format="pyarrow").to_pandas().sort_values(id_col)
    X = np.stack([np.asarray(e) for e in sample[emb_col]]).astype(np.float64)
    books = pq_fit(X, m, ksub)
    books_ref = ray.put(books)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put((Q, Qn))

    def scan(batch: pa.Table) -> pd.DataFrame:
        bks = ray.get(books_ref)
        Q_, Qn_ = ray.get(q_ref)
        if batch.num_rows == 0:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"), id_col: pd.Series(dtype="int64"),
                 "adc": pd.Series(dtype="float64"), "cos_sim": pd.Series(dtype="float64")}
            )
        E = _emb_matrix(batch, emb_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, norms = pq_encode(E, bks)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        frames = []
        for qi in range(len(Q_)):
            adc = pq_adc_scores(Q_[qi], bks, codes, norms)
            r = min(rerank, len(ids))
            top = np.argpartition(-adc, r - 1)[:r] if r < len(adc) else np.arange(len(adc))
            top = top[np.lexsort((ids[top], -adc[top]))]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.int64(qi),
                        id_col: ids[top],
                        "adc": adc[top],
                        "cos_sim": En[top] @ Qn_[qi],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["query_id", id_col, "cos_sim"])
    cand = (
        partials.sort_values(["query_id", "adc", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(rerank)
    )
    out = (
        cand.sort_values(["query_id", "cos_sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .drop(columns=["adc"])
        .reset_index(drop=True)
    )
    return out
