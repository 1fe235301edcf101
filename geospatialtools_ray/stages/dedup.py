"""Deduplication operators for large-scale training-data pipelines.

Scale rules (all enforced here, round-2 rewrite):
- batch-vectorized sketching (stages/sketch.py — flat gram arrays +
  reduceat, no per-document Python loops),
- only 64-bit keys and id pairs are shuffled, never document text,
- candidate-pair verification is a hash JOIN of pairs against per-doc
  shingle sets (Dataset.join), not a driver-side text fetch,
- connected components is iterative min-label propagation over Datasets
  (join + groupby-min rounds), not a driver union-find,
- final cluster assignment is a left-outer hash join, not a broadcast dict.

Reference intent: SURVEY.md section 2.7 (distinct/dedup = hash-partition +
first, np.unique census at libraries/terrain_tools.py:259,740,871
generalized to content identity).

- exact_dedup: content-hash partition + first-per-group.
- minhash_lsh_clusters: shingle -> minhash -> banded LSH buckets ->
  candidate pairs (star + chain pairing inside buckets) -> join-verify
  with exact gram Jaccard -> distributed min-label connected components.
- simhash_buckets: 64-bit simhash + 16-bit band bucketing.
- jaccard_ngrams: exact gram Jaccard for one pair (test helper).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import text_hash_u64
from .sketch import gram_hash_flat, minhash_batch, simhash_batch


def minhash_signature_batch(texts, num_perm: int = 64, k: int = 5) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signatures (vectorized batch)."""
    return minhash_batch(texts, num_perm, k)


def jaccard_ngrams(a: str, b: str, k: int = 5) -> float:
    g, go, _ = gram_hash_flat([a, b], k)
    sa = set(g[go[0] : go[1]].tolist())
    sb = set(g[go[1] : go[2]].tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                approx_rows: int | None = None):
    """Hash-partitioned exact dedup: keep the min-id doc per content hash.
    Shuffles only (hash, id) pairs. The per-hash reduce goes through
    sorted_group_agg — the content-hash key space is ~n_docs, where Ray's
    per-group-Python aggregate finalize is the bottleneck. Pass
    ``approx_rows`` (parquet-metadata row count) so tiny corpora skip the
    sort's fixed cost (sorted_group_agg's size dispatch)."""
    from ..pipelines.relational import sorted_group_agg

    def add_hash(batch: pa.Table) -> pa.Table:
        h = text_hash_u64(batch[text_col])
        return pa.table({id_col: batch[id_col], "content_hash": pa.array(h, type=pa.uint64())})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = sorted_group_agg(hashed, "content_hash", {id_col: "min", "dup_count": "count"},
                           approx_rows=approx_rows)
    return out.map_batches(
        lambda b: pa.table(
            {
                "content_hash": b["content_hash"],
                "keep_id": b[id_col],
                "dup_count": b["dup_count"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _shingle_sets(ds, text_col: str, id_col: str, k: int):
    """Dataset of (id, grams: list<uint64> sorted unique) per doc — the
    join payload for pair verification (ids + hashes only, no text)."""

    def apply(batch: pa.Table) -> pa.Table:
        g, go, _ = gram_hash_flat(batch[text_col], k)
        # binary blob of sorted-unique u64 per doc: Acero joins don't carry
        # list-typed payload columns, binary passes through fine
        blobs = [np.unique(g[go[d] : go[d + 1]]).tobytes() for d in range(len(go) - 1)]
        return pa.table({id_col: batch[id_col], "grams": pa.array(blobs, type=pa.large_binary())})

    return ds.map_batches(apply, batch_format="pyarrow")


def minhash_lsh_candidate_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
):
    """Dataset of distinct candidate pairs (id_a < id_b) from banded LSH."""
    rows_per_band = num_perm // bands

    def bandify(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        sig = minhash_batch(batch[text_col], num_perm, shingle_k)
        n = len(ids)
        from ..hashing import splitmix64

        band_hashes = np.empty((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
                acc = np.zeros(n, dtype=np.uint64)
                for c in range(rows_per_band):
                    acc = splitmix64(acc + seg[:, c])
                band_hashes[:, b] = acc
        rep = pa.array(np.repeat(np.arange(n), bands))
        return pa.table(
            {
                id_col: ids.combine_chunks().take(rep) if isinstance(ids, pa.ChunkedArray) else ids.take(rep),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hashes.ravel(), type=pa.uint64()),
            }
        )

    banded = ds.map_batches(bandify, batch_format="pyarrow")
    # Bucket pairing WITHOUT per-group Python: one range sort on
    # (band, band_hash) co-locates buckets, then each block builds its
    # star+chain pairs vectorized over group runs (ids sorted within a run,
    # so the run head IS the star representative). A bucket straddling a
    # block boundary has all its parts at block edges (sorted blocks hold
    # disjoint key ranges — the sorted_group_agg argument), so a tiny
    # per-block edge collect lets the driver stitch the parts with
    # (max_i, min_j) chain links plus (min_i, min_j) star redundancy —
    # connectivity inside a bucket is preserved, which is all the
    # downstream verify + connected-components need. Replaced a
    # groupby.map_groups over ~n_docs x bands near-unique buckets that
    # spent 188 of 208 s of the 200k-doc dedup in per-group Python.
    import ray.data as rd

    s = banded.sort(["band", "band_hash"]).materialize()

    def _runs(b: pa.Table):
        band = b["band"].to_numpy(zero_copy_only=False)
        bh = b["band_hash"].to_numpy(zero_copy_only=False).view(np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        return band, bh, ids, new

    def block_pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        band, bh, ids, new = _runs(b)
        gidx = np.cumsum(new) - 1
        rep = ids[np.flatnonzero(new)][gidx]  # per-row group head = group min id
        star_keep = ids != rep
        chain_keep = ~new
        a = np.concatenate([rep[star_keep], ids[:-1][chain_keep[1:]]])
        bb = np.concatenate([ids[star_keep], ids[1:][chain_keep[1:]]])
        keep = a != bb
        a, bb = a[keep], bb[keep]
        if len(a) == 0:
            return empty
        pair = np.stack([a, bb], axis=1)
        pair = np.unique(pair, axis=0)
        return pa.table({"id_a": pa.array(pair[:, 0], type=pa.int64()), "id_b": pa.array(pair[:, 1], type=pa.int64())})

    def block_edges(b: pa.Table) -> pa.Table:
        cols = {"band": pa.array([], type=pa.int32()), "band_hash": pa.array([], type=pa.int64()),
                "pmin": pa.array([], type=pa.int64()), "pmax": pa.array([], type=pa.int64())}
        if b.num_rows == 0:
            return pa.table(cols)
        band, bh, ids, new = _runs(b)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ids)) - 1
        take = [0] if len(starts) == 1 else [0, len(starts) - 1]
        return pa.table(
            {
                "band": pa.array(band[starts[take]].astype(np.int32), type=pa.int32()),
                "band_hash": pa.array(bh[starts[take]], type=pa.int64()),
                "pmin": pa.array(ids[starts[take]].astype(np.int64), type=pa.int64()),
                "pmax": pa.array(ids[ends[take]].astype(np.int64), type=pa.int64()),
            }
        )

    pairs = s.map_batches(block_pairs, batch_size=None, batch_format="pyarrow")

    edf = s.map_batches(block_edges, batch_size=None, batch_format="pyarrow").to_pandas()
    extra = []
    if len(edf):
        for _, grp in edf.groupby(["band", "band_hash"]):
            if len(grp) < 2:
                continue
            g = grp.sort_values("pmin").reset_index(drop=True)
            for i in range(len(g) - 1):
                extra.append((int(g["pmax"].iloc[i]), int(g["pmin"].iloc[i + 1])))
                extra.append((int(g["pmin"].iloc[i]), int(g["pmin"].iloc[i + 1])))
    if extra:
        ex = np.asarray(extra, dtype=np.int64)
        lo, hi = np.minimum(ex[:, 0], ex[:, 1]), np.maximum(ex[:, 0], ex[:, 1])
        keep = lo != hi
        ex_t = pa.table({"id_a": pa.array(lo[keep], type=pa.int64()), "id_b": pa.array(hi[keep], type=pa.int64())})
        if ex_t.num_rows:
            pairs = pairs.union(rd.from_arrow(ex_t))

    # distinct pairs across bands: nearly-unique composite key -> the
    # sort + per-block combine + boundary fix beats Ray's aggregate
    from ..pipelines.relational import sorted_group_agg

    return sorted_group_agg(pairs, ["id_a", "id_b"], {"_n": "count"}).drop_columns(["_n"])


def _join_pair_shingles(pairs, ds, text_col: str, id_col: str, shingle_k: int, num_partitions: int):
    """Hash-join each (id_a, id_b) pair with both docs' shingle sets. Text
    never moves — only sorted-unique gram hash blobs of INVOLVED docs."""
    # materialize the (small) pair list once: the count sizes the join
    # partitioning (see connected_components_minlabel's note on empty
    # hash-join partitions) and the two joins below would otherwise
    # re-execute the whole LSH pipeline twice
    pairs = pairs.materialize()
    num_partitions = int(max(1, min(num_partitions, (pairs.count() + 9_999) // 10_000)))
    shingles = _shingle_sets(ds, text_col, id_col, shingle_k)

    def rename(side: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([f"id_{side}", f"grams_{side}"])

        return f

    sa = shingles.map_batches(rename("a"), batch_format="pyarrow")
    sb = shingles.map_batches(rename("b"), batch_format="pyarrow")
    j = pairs.join(sa, join_type="inner", num_partitions=num_partitions, on=("id_a",))
    return j.join(sb, join_type="inner", num_partitions=num_partitions, on=("id_b",))


def _overlap_counts(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(inter, union) set sizes per joined pair row. Flat zero-copy view
    over both blob columns: per-pair gram counts from the binary offsets,
    union sizes from ONE global lexsort over (pair, gram) — no per-row
    Python, no .as_py()."""
    n = batch.num_rows
    flats = []
    for col in ("grams_a", "grams_b"):
        arr = batch[col].combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
        dbuf = arr.buffers()[2]
        data = (
            np.frombuffer(dbuf, dtype=np.uint64, count=len(dbuf) // 8)
            if dbuf is not None and len(dbuf) >= 8
            else np.empty(0, dtype=np.uint64)
        )
        o8 = offs // 8  # every blob is a whole number of u64 grams
        flats.append((data[o8[0] : o8[-1]], (o8[1:] - o8[:-1])))
    (fa, la), (fb, lb) = flats
    pair = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), la), np.repeat(np.arange(n, dtype=np.int64), lb)])
    gram = np.concatenate([fa, fb])
    order = np.lexsort((gram, pair))
    p, g = pair[order], gram[order]
    newv = np.ones(len(p), dtype=bool)
    if len(p) > 1:
        newv[1:] = (p[1:] != p[:-1]) | (g[1:] != g[:-1])
    union = np.bincount(p[newv], minlength=n).astype(np.int64)
    inter = la + lb - union
    return inter, union


def verify_pairs_jaccard(
    pairs,
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
    num_partitions: int = 8,
):
    """Hash-join each candidate pair with both docs' shingle sets and keep
    pairs with exact gram Jaccard >= threshold."""
    j = _join_pair_shingles(pairs, ds, text_col, id_col, shingle_k, num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["id_a", "id_b"])
        inter, union = _overlap_counts(batch)
        # same IEEE expression as the single-process oracle: inter/union >= t
        keep = (union == 0) | (inter.astype(np.float64) / np.maximum(union, 1) >= jaccard_threshold)
        return batch.filter(pa.array(keep)).select(["id_a", "id_b"])

    return j.map_batches(verify, batch_format="pyarrow")


def pair_gram_overlap(
    pairs,
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_partitions: int = 8,
):
    """Exact per-pair shingle-set overlap (id_a, id_b, inter_sz, union_sz)
    — the integer numerator/denominator of jaccard_ngrams, distributed
    through the same joins as verify_pairs_jaccard. Exact ints, so a SQL
    oracle can recompute them from raw text with no float convention."""
    j = _join_pair_shingles(pairs, ds, text_col, id_col, shingle_k, num_partitions)

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "inter_sz": pa.array([], type=pa.int64()),
                    "union_sz": pa.array([], type=pa.int64()),
                }
            )
        inter, union = _overlap_counts(batch)
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "inter_sz": pa.array(inter, type=pa.int64()),
                "union_sz": pa.array(union, type=pa.int64()),
            }
        )

    return j.map_batches(emit, batch_format="pyarrow")


def connected_components_minlabel(edges, max_rounds: int = 25, num_partitions: int = 8,
                                  jump_after: int = 2):
    """Distributed connected components: iterative min-label propagation.

    edges: Dataset (id_a, id_b). Returns Dataset (node, cluster_id) for
    every node that appears in an edge; cluster_id = min node id of the
    component. Each round is one hop (labels onto edge endpoints -> min
    per dst -> merge back) PLUS one pointer jump (label <- label(label)),
    so chain depth halves per round — O(E + V) shuffled per round, rounds
    ~ log(component diameter). Rounds are latency-bound on real clusters,
    so log-rounds is the wall-clock lever for deep components.

    num_partitions is a CEILING: the effective partition count is scaled
    down so each join partition sees >=10k rows — Ray's hash-shuffle join
    delivers an EMPTY (schema-less) pyarrow table for a partition that
    received no rows, and Acero then fails with "No match for FieldRef";
    small inputs must collapse to few partitions.
    """
    from ..pipelines.relational import sorted_group_agg

    def symmetrize(batch: pa.Table) -> pa.Table:
        src = pa.concat_arrays([batch["id_a"].combine_chunks(), batch["id_b"].combine_chunks()])
        dst = pa.concat_arrays([batch["id_b"].combine_chunks(), batch["id_a"].combine_chunks()])
        return pa.table({"src": src, "dst": dst})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if sym.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    num_partitions = int(max(1, min(num_partitions, (sym.count() + 9_999) // 10_000)))

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["src"], "label": batch["src"]})

    # node-cardinality groupby-min: sorted_group_agg (sort + per-block
    # combine + boundary fix) — Ray's aggregate finalize is per-group Python
    labels = sorted_group_agg(
        sym.map_batches(init_labels, batch_format="pyarrow"), "node", {"label": "min"}
    ).materialize()

    for rnd in range(max_rounds):
        # candidate label for dst = min over neighbors of label(src)
        lab_src = labels.map_batches(
            lambda b: b.rename_columns(["src", "label"]), batch_format="pyarrow"
        )
        cand = sorted_group_agg(
            sym.join(lab_src, join_type="inner", num_partitions=num_partitions, on=("src",)).map_batches(
                lambda b: b.select(["dst", "label"]).rename_columns(["node", "cand"]), batch_format="pyarrow"
            ),
            "node",
            {"cand": "min"},
        )
        merged = labels.join(cand, join_type="left_outer", num_partitions=num_partitions, on=("node",)).materialize()

        def apply_min(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lab = batch["label"]
            cnd = batch["cand"]
            new = pc.min_element_wise(lab, pc.coalesce(cnd, lab))
            # keep the round's starting label: the convergence check spans
            # hop + jump, so "changed" compares against it after the jump
            return pa.table({"node": batch["node"], "old": lab, "label": new})

        hopped = merged.map_batches(apply_min, batch_format="pyarrow").materialize()

        # pointer jump (label <- label(label)): every label value IS a node
        # id (labels initialize to node ids and only min-combine), so one
        # left join of the post-hop label map onto the label column halves
        # chain depth per round — rounds ~ log(diameter) instead of
        # diameter. Measured on the 40k-doc star-reduced asset graph
        # (back-to-back, identical edges): never-jump 39.6 s, jump-after-2
        # 41.2 s, always-jump 46.8 s — on SHALLOW graphs the extra
        # node-cardinality join is ~4% overhead, so jumping starts only
        # after the plain hops have failed to converge. What it buys is the
        # deep tail: a diameter-199 chain converges in ~8 rounds where
        # plain hops would blow the 25-round ceiling and RAISE (regression
        # test below). The fixpoint is unique (per-component min), so final
        # labels are bit-identical with or without jumping.
        if rnd >= jump_after:
            jmap = hopped.map_batches(
                lambda b: pa.table({"jnode": b["node"], "jlabel": b["label"]}), batch_format="pyarrow"
            )
            jjoin = hopped.join(
                jmap, join_type="left_outer", num_partitions=num_partitions,
                on=("label",), right_on=("jnode",),
            )

            def jump(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                lab = batch["label"]
                fin = pc.min_element_wise(lab, pc.coalesce(batch["jlabel"], lab))
                changed = pc.sum(pc.cast(pc.less(fin, batch["old"]), pa.int64())).as_py() or 0
                return pa.table(
                    {"node": batch["node"], "label": fin, "_changed": pa.array(np.full(batch.num_rows, changed, dtype=np.int64))}
                )

            upd = jjoin.map_batches(jump, batch_format="pyarrow").materialize()
        else:
            def hop_changed(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                changed = pc.sum(pc.cast(pc.less(batch["label"], batch["old"]), pa.int64())).as_py() or 0
                return pa.table(
                    {"node": batch["node"], "label": batch["label"], "_changed": pa.array(np.full(batch.num_rows, changed, dtype=np.int64))}
                )

            upd = hopped.map_batches(hop_changed, batch_format="pyarrow").materialize()
        from ray.data.aggregate import Sum

        total_changed = upd.aggregate(Sum("_changed", alias_name="c"))["c"] or 0
        # plan cut (see terrain.dist._rebound): each round's plan embeds
        # the previous round's plan through the join, so without rebuilding
        # from materialized block refs the driver-side plan work doubles
        # per round
        import ray.data as rd

        labels = rd.from_arrow_refs(upd.drop_columns(["_changed"]).materialize().to_arrow_refs())
        if total_changed == 0:
            break
    else:
        # hop + pointer-jump covers ~2x the depth per round (rounds ~
        # log(diameter)); a component still unconverged after max_rounds
        # would otherwise be SILENTLY split into several clusters
        # (under-deduplication with no signal)
        raise RuntimeError(
            f"connected_components_minlabel: labels still changing after {max_rounds} rounds "
            f"(component depth exceeds the hop+jump budget) — raise max_rounds"
        )
    return labels.map_batches(lambda b: b.rename_columns(["node", "cluster_id"]), batch_format="pyarrow")


def minhash_lsh_clusters(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.7,
    max_cc_rounds: int = 25,
    num_partitions: int = 8,
):
    """MinHash-LSH near-duplicate clustering, Datasets end-to-end.

    Returns a Dataset (id, cluster_id) where cluster_id = min doc id of the
    verified near-dup component (singletons map to themselves). No stage
    materializes documents to the driver.
    """
    import pyarrow.compute as pc

    pairs = minhash_lsh_candidate_pairs(ds, text_col, id_col, num_perm, bands, shingle_k)
    verified = verify_pairs_jaccard(
        pairs, ds, text_col, id_col, shingle_k, jaccard_threshold, num_partitions
    )
    labels = connected_components_minlabel(verified, max_cc_rounds, num_partitions)
    labels = labels.materialize()
    ids_only = ds.map_batches(lambda b: b.select([id_col]), batch_format="pyarrow")
    if labels.count() == 0:
        # no verified near-dups anywhere: every doc is its own cluster
        return ids_only.map_batches(
            lambda b: b.append_column("cluster_id", b[id_col]), batch_format="pyarrow"
        )
    lab_nodes = labels.map_batches(
        lambda b: b.rename_columns([id_col, "cluster_id"]), batch_format="pyarrow"
    )
    # scale the final join's partitioning to the LABELED side (the small
    # one) — empty hash-join partitions are schema-less and crash Acero
    nparts = int(max(1, min(num_partitions, (labels.count() + 9_999) // 10_000)))
    out = ids_only.join(lab_nodes, join_type="left_outer", num_partitions=nparts, on=(id_col,))

    def finalize(batch: pa.Table) -> pa.Table:
        cl = pc.coalesce(batch["cluster_id"], batch[id_col])
        return pa.table({id_col: batch[id_col], "cluster_id": cl})

    return out.map_batches(finalize, batch_format="pyarrow")


def simhash_buckets(ds, text_col: str = "text", id_col: str = "doc_id", band_bits: int = 16):
    """SimHash near-dup bucketing: 64-bit simhash split into 4 bands of
    `band_bits`; docs sharing any band land in the same candidate bucket
    (catches Hamming distance <= 3). Sketching is batch-vectorized."""

    def apply(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
        sh = simhash_batch(batch[text_col])
        nbands = 64 // band_bits
        mask = np.uint64((1 << band_bits) - 1)
        n = len(sh)
        rep = pa.array(np.repeat(np.arange(n), nbands))
        bands_col = np.tile(np.arange(nbands, dtype=np.int32), n)
        shifts = (bands_col.astype(np.uint64)) * np.uint64(band_bits)
        keys = (np.repeat(sh, nbands) >> shifts) & mask
        return pa.table(
            {
                id_col: ids.take(rep),
                "band": pa.array(bands_col),
                "band_key": pa.array(keys, type=pa.uint64()),
                "simhash": pa.array(np.repeat(sh, nbands), type=pa.uint64()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


def _hash_id_multiplicity(hashes: np.ndarray, ids, id_col: str) -> pa.Table:
    """(h, id, m) pre-combine triple shared by chunk_exact_dedup and
    dup_span_stats: int64 view of the 64-bit hash (bit-identical as a key,
    avoids Ray's pandas-block uint64 round-trip overflowing in joins) and
    per-(hash, id) copy counts — the only rows these dedup signals ever
    shuffle."""
    h = hashes.view(np.int64) if hashes.dtype == np.uint64 else hashes.astype(np.int64)
    part = pd.DataFrame({"h": h, id_col: ids})
    part = part.groupby(["h", id_col], as_index=False).size().rename(columns={"size": "m"})
    return pa.table(
        {
            "h": pa.array(part["h"].to_numpy(dtype=np.int64), type=pa.int64()),
            id_col: pa.array(part[id_col].to_numpy()),
            "m": pa.array(part["m"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )


def chunk_exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", window_tokens: int = 32):
    """Chunk-level exact dedup over fixed token windows: split each document
    into W-token chunks (same pinned rule as the training-window chunker:
    words = split-on-space drop-empties, windows start at 0, W, 2W, ...,
    a zero-word document emits ONE empty chunk), hash each chunk's text,
    and assign every distinct chunk a canonical keeper = MIN(doc id) over
    the documents containing it. Returns one row per document:
    (id, n_chunks, n_kept, n_dropped) where n_kept counts chunk copies this
    document canonically owns and n_dropped counts copies whose content an
    earlier document already owns (the bytes a chunk-level deduper would
    strip from this doc).

    Scale shape: chunk text never leaves the chunking batch — only
    (hash, id, copies) triples shuffle, pre-combined per batch. The keeper
    table (one row per distinct chunk hash) is NOT broadcast: ownership is
    painted back with a hash-partitioned join on the chunk hash, so neither
    side ever has to fit in one worker. Final per-doc rollup is a Sum
    groupby on ids.
    """
    W = window_tokens

    def chunk_hash_partial(b: pa.Table) -> pa.Table:
        from .text import chunk_windows_df

        g = chunk_windows_df(b.select([id_col, text_col]).to_pandas(), id_col, text_col, W)
        h = text_hash_u64(pa.array(g["chunk_text"].to_numpy(dtype=object), type=pa.string()))
        return _hash_id_multiplicity(h, g[id_col].to_numpy(), id_col)

    # materialize the reduced (hash, id, copies) projection once: it feeds
    # both the keeper aggregate and the paint-back join, and is orders of
    # magnitude smaller than the text it summarizes
    pairs = ds.map_batches(chunk_hash_partial, batch_format="pyarrow").materialize()
    # keeper per hash via sorted_group_agg: the chunk-hash key space is
    # nearly unique, where Ray's sort-aggregate finalize (per-group Python)
    # is ~10x slower than sort + per-block combine + boundary fix
    from ..pipelines.relational import sorted_group_agg

    owners = sorted_group_agg(pairs, "h", {id_col: "min"}).map_batches(
        lambda b: pa.table({"h": b["h"], "_keeper": b[id_col]}), batch_format="pyarrow"
    )

    from ..pipelines.joins import hash_join

    joined = hash_join(pairs, owners, on=("h",))

    def flag(b: pa.Table) -> pa.Table:
        doc = b[id_col].to_numpy(zero_copy_only=False)
        keeper = b["_keeper"].to_numpy(zero_copy_only=False)
        m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept = np.where(doc == keeper, m, 0).astype(np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "n_chunks": pa.array(m, type=pa.int64()),
                "n_kept": pa.array(kept, type=pa.int64()),
                "n_dropped": pa.array(m - kept, type=pa.int64()),
            }
        )

    return sorted_group_agg(
        joined.map_batches(flag, batch_format="pyarrow"),
        id_col,
        {"n_chunks": "sum", "n_kept": "sum", "n_dropped": "sum"},
    )


def dup_span_stats(ds, text_col: str = "text", id_col: str = "doc_id", k: int = 8):
    """Duplicated-span statistics (the ExactSubstr-style fine-grained dedup
    signal, cf. Lee et al. 2021 "Deduplicating Training Data Makes Language
    Models Better"): every OVERLAPPING k-token window is hashed (stride 1 —
    unlike chunk_exact_dedup's non-overlapping chunks), and a window counts
    as duplicated when its content occurs >= 2 times anywhere in the corpus
    (including twice inside one document). Returns one row per document:
    (id, n_windows, n_dup_windows). Documents shorter than k tokens emit
    one whole-doc window — the same pinned short-doc rule the
    decontamination gram kernel uses (gram_hash_flat).

    Scale shape: windows never leave the hashing batch — (hash, id, copies)
    triples pre-combined per batch are all that shuffles; the global
    multiplicity table joins back hash-partitioned (never broadcast);
    per-doc rollup is a Sum groupby.
    """

    def window_hash_partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        g, go, docidx = gram_hash_flat(b[text_col], k)
        return _hash_id_multiplicity(g, ids[docidx], id_col)

    pairs = ds.map_batches(window_hash_partial, batch_format="pyarrow").materialize()
    # global multiplicity per window hash: nearly-unique key space — use the
    # sort + per-block combine + boundary fix (see sorted_group_agg) instead
    # of Ray's per-group-Python aggregate finalize
    from ..pipelines.relational import sorted_group_agg

    totals = sorted_group_agg(pairs, "h", {"m": "sum"}).map_batches(
        lambda b: pa.table({"h": b["h"], "_tot": b["m"]}), batch_format="pyarrow"
    )

    from ..pipelines.joins import hash_join

    joined = hash_join(pairs, totals, on=("h",))

    def flag(b: pa.Table) -> pa.Table:
        m = b["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = b["_tot"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "n_windows": pa.array(m, type=pa.int64()),
                "n_dup_windows": pa.array(np.where(tot >= 2, m, 0), type=pa.int64()),
            }
        )

    return sorted_group_agg(
        joined.map_batches(flag, batch_format="pyarrow"),
        id_col,
        {"n_windows": "sum", "n_dup_windows": "sum"},
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Set-bit count per uint64 (vectorized: 8-byte view -> unpackbits)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if len(x) == 0:
        return np.empty(0, dtype=np.int64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)


def simhash_hamming_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_buckets: int = 256,
    max_pairs_per_bucket: int | None = None,
):
    """EXACT SimHash near-dup pair join: every (id_a < id_b) pair whose
    64-bit simhashes differ in <= `max_hamming` bits, plus the distance.

    Pigeonhole candidate generation (Manku et al. 2007, WWW — the SimHash
    web-dedup paper): the sketch splits into 4 disjoint 16-bit bands, so
    any pair within Hamming distance 3 agrees EXACTLY on >= 1 band.
    Candidates therefore come from within-band-bucket pairs only — never
    an all-pairs scan — and each candidate verifies with one XOR+popcount.
    Requires max_hamming <= 3 (4 bands); asserts loudly otherwise.

    Shape: simhash_buckets (vectorized sketch, 4 rows/doc) -> whole-bucket
    hash partition (bucketed_key_apply on the packed (band, band_key)
    key) -> per-run all-pairs generation vectorized by RUN LENGTH (one
    triu gather per distinct bucket size — the triangles convention) with
    the Hamming verify INSIDE the bucket task (candidates never ship
    unverified) -> distinct across bands via one packed-key
    sorted_group_agg. Per-bucket work is O(m^2) in bucket size — inherent
    to the operator's exact output — and bucket sizes are band-hash
    balanced; id space must fit 31 bits for the packed pair key (loud
    guard; at larger id spaces key on the 2-column pair instead).
    """
    if max_hamming > 3:
        raise ValueError("pigeonhole with 4 x 16-bit bands is exact only for max_hamming <= 3")

    from ..pipelines.relational import sorted_group_agg
    from .keyapply import bucketed_key_apply, key_run_starts, run_all_pairs

    banded = simhash_buckets(ds, text_col=text_col, id_col=id_col)

    def add_bucket_key(b: pa.Table) -> pa.Table:
        band = b["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = b["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bkey": pa.array((band << np.int64(32)) | bk, type=pa.int64()),
                id_col: b[id_col],
                "simhash": pa.array(
                    b["simhash"].to_numpy(zero_copy_only=False).view(np.int64), type=pa.int64()
                ),
            }
        )

    keyed = banded.map_batches(add_bucket_key, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"pk": pd.Series([], dtype="int64"), "hamming": pd.Series([], dtype="int64")}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["bkey", id_col], kind="stable")
        keys = g["bkey"].to_numpy()
        ids = g[id_col].to_numpy(dtype=np.int64)
        sh = g["simhash"].to_numpy(dtype=np.int64)
        if ids.max() >= (1 << 31) or ids.min() < 0:
            raise ValueError(
                "simhash_hamming_pairs packs (id_a, id_b) into one int64; "
                f"ids must be in [0, 2^31) (got min {ids.min()}, max {ids.max()}) "
                "— key on the 2-column pair instead"
            )
        new = key_run_starts(keys)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(keys)))
        ai, bi = run_all_pairs(starts, lens)
        if len(ai) == 0:
            return empty
        if max_pairs_per_bucket is not None and len(ai) > max_pairs_per_bucket:
            # the operator's CONTRACT is every qualifying pair, which is
            # output-quadratic at adversarial near-dup density — fail loudly
            # (the asof stitch-cap convention) instead of OOMing a worker;
            # the scale route for dedup itself is simhash band buckets ->
            # min-label connected components (no pair materialization)
            raise ValueError(
                f"simhash_hamming_pairs: bucket generated {len(ai)} candidate "
                f"pairs > max_pairs_per_bucket={max_pairs_per_bucket}; the "
                "corpus is near-dup dense — use the bucket+connected-"
                "components dedup path or raise the cap"
            )
        ham = _popcount64(sh[ai].view(np.uint64) ^ sh[bi].view(np.uint64))
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        # ids ascend within a run, so id_a < id_b by construction
        pk = (ids[ai[keep]] << np.int64(31)) | ids[bi[keep]]
        return pd.DataFrame({"pk": pk, "hamming": ham[keep]})

    pairs = bucketed_key_apply(keyed, "bkey", bucket_pairs, num_buckets=num_buckets)
    # a pair found in k matching bands appears k times with the SAME
    # distance — distinct via one packed-key combine (min == the value)
    return sorted_group_agg(pairs, "pk", {"hamming": "min"})


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr criterion): a character
# position is "duplicated" iff it is covered by some length-L window whose
# text occurs >= 2 times in the whole corpus; the removable spans are the
# per-document maximal unions of covered windows (every such span is a
# union of corpus-repeated substrings of length >= L). The reference
# implementation builds one giant suffix array; this engine computes the
# identical answer with two linear shuffles.
# ---------------------------------------------------------------------------

def _doc_windows(texts: list[str], ids: np.ndarray, L: int):
    """All length-L character windows of a batch, vectorized: one uint8
    buffer with \\x01 fences + a single sliding_window_view; returns
    (gram_bytes, doc_id, pos) with pos 1-based (SQL substr convention).
    Requires ascii text (the documents contract, checked)."""
    from numpy.lib.stride_tricks import sliding_window_view

    joined = "\x01".join(texts)
    try:
        buf = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    except UnicodeEncodeError as e:
        raise ValueError(
            "dup_substring_spans assumes an ascii corpus; non-ascii input "
            "needs a byte-offset variant"
        ) from e
    if len(buf) < L:
        return np.empty(0, dtype=f"S{L}"), np.empty(0, np.int64), np.empty(0, np.int64)
    win = sliding_window_view(buf, L)
    # fence bookkeeping: windows containing \x01 cross a document boundary
    fences = np.flatnonzero(buf == 1)
    doc_of = np.cumsum(buf == 1)  # doc index per char (fences land on next doc — always invalid windows)
    starts = np.concatenate([[0], fences + 1])                # char offset of each doc
    valid = np.ones(len(win), dtype=bool)
    for off in range(L):
        lim = len(win)
        f = fences[fences - off < lim]
        valid[np.maximum(f - off, 0)] = False
    w0 = np.flatnonzero(valid)
    grams = np.ascontiguousarray(win[w0]).view(f"S{L}").ravel()
    di = doc_of[w0]
    pos = w0 - starts[di] + 1
    return grams, ids[di], pos


def _window_hash128(grams: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent salted u64 hashes per fixed-width gram (the 128-bit
    scale payload): one 8-byte-chunk mix per stream, vectorized."""
    from ..hashing import splitmix64

    if len(grams) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    L = grams.dtype.itemsize
    pad = (-L) % 8
    raw = np.frombuffer(grams.tobytes() + b"\x00" * 0, dtype=np.uint8).reshape(len(grams), L)
    if pad:
        raw = np.concatenate([raw, np.zeros((len(grams), pad), dtype=np.uint8)], axis=1)
    words = np.ascontiguousarray(raw).view(np.uint64)  # (n, ceil(L/8))
    outs = []
    with np.errstate(over="ignore"):
        for salt in (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)):
            acc = np.full(len(grams), salt, dtype=np.uint64)
            for c in range(words.shape[1]):
                acc = splitmix64(acc + words[:, c])
            outs.append(acc)
    return outs[0], outs[1]


def dup_substring_spans(ds, min_len: int = 20, text_col: str = "text",
                        id_col: str = "doc_id", num_buckets: int = 256,
                        payload: str = "gram"):
    """Per-document maximal duplicated spans: (doc_id, start, span_len),
    start 1-based. Shape: window explode (map_batches, one
    sliding_window_view per batch) -> whole-GRAM hash buckets (count per
    gram key, keep count >= 2) -> whole-DOC buckets (sort positions,
    islands split where the gap exceeds L, one cumsum — no per-doc
    Python). Both shuffles are linear in total corpus characters.

    payload="gram" ships the L-byte window text and groups on the exact
    string — zero collision hazard, equal to the SQL oracle byte-for-byte.
    payload="hash128" is the 100 TB path: 16 bytes/window through the
    shuffle regardless of L, grouping on two independent salted u64
    hashes (collision probability ~n^2/2^128 — astronomically below one
    false duplicate even at 10^12 windows, but not certificate-exact;
    use "gram" when the oracle demands byte equality)."""
    if payload not in ("gram", "hash128"):
        raise ValueError(f"payload must be 'gram' or 'hash128', got {payload!r}")
    from .keyapply import bucketed_key_apply

    use_hash = payload == "hash128"

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b[text_col].to_pylist()
        grams, di, pos = _doc_windows(texts, ids, min_len)
        if use_hash:
            h1, h2 = _window_hash128(grams)
            return pa.table(
                {
                    "h1": pa.array(h1.view(np.int64), type=pa.int64()),
                    "h2": pa.array(h2.view(np.int64), type=pa.int64()),
                    id_col: pa.array(di, type=pa.int64()),
                    "pos": pa.array(pos, type=pa.int64()),
                }
            )
        return pa.table(
            {
                "gram": pa.array(grams.astype("O"), type=pa.binary()),
                id_col: pa.array(di, type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
            }
        )

    windows = ds.map_batches(explode, batch_format="pyarrow")

    def keep_dup(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64")})
        if use_hash:
            a1 = g["h1"].to_numpy()
            a2 = g["h2"].to_numpy()
            order = np.lexsort((a2, a1))
            g = g.iloc[order]
            a1, a2 = a1[order], a2[order]
            new = np.ones(len(g), dtype=bool)
            new[1:] = (a1[1:] != a1[:-1]) | (a2[1:] != a2[:-1])
        else:
            g = g.sort_values("gram", kind="stable")
            gr = g["gram"].to_numpy()
            new = np.ones(len(g), dtype=bool)
            new[1:] = gr[1:] != gr[:-1]
        run_id = np.cumsum(new) - 1
        run_sizes = np.bincount(run_id)
        keep = run_sizes[run_id] >= 2
        return pd.DataFrame({id_col: g[id_col].to_numpy()[keep],
                             "pos": g["pos"].to_numpy()[keep]})

    hits = bucketed_key_apply(windows, "h1" if use_hash else "gram", keep_dup,
                              num_buckets=num_buckets)

    L = min_len

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                              "start": pd.Series([], dtype="int64"),
                              "span_len": pd.Series([], dtype="int64")})
        if len(g) == 0:
            return empty
        g = g.sort_values([id_col, "pos"], kind="stable")
        d = g[id_col].to_numpy()
        p = g["pos"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > L)
        isl = np.cumsum(brk) - 1
        starts = p[brk]
        last = np.zeros(isl.max() + 1, dtype=np.int64)
        np.maximum.at(last, isl, p)
        return pd.DataFrame({id_col: d[brk], "start": starts,
                             "span_len": last - starts + L})

    return bucketed_key_apply(hits, id_col, islands, num_buckets=num_buckets)


def remove_dup_substrings(text: str, spans: list[tuple[int, int]]) -> str:
    """Cut the (1-based start, span_len) spans out of one document's text —
    the removal step applied after dup_substring_spans (keep-first policies
    decide WHICH occurrences to cut; this helper does the surgery)."""
    out, cur = [], 0
    for start, span_len in sorted(spans):
        s0 = start - 1
        if s0 > cur:
            out.append(text[cur:s0])
        cur = max(cur, s0 + span_len)
    out.append(text[cur:])
    return "".join(out)
