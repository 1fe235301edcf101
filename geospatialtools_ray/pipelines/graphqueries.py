"""Doc-asset graph + interleaved-span analytics driver queries (split
from extraqueries.py, round 5): connected components, PageRank, triangles,
k-core, BFS hops, media dedup / decode-once composition, span rollups.
No behavior change — defs moved verbatim; oracle-gate re-ran green."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..numerics import sql_round

from .. import io
from .qcommon import KNUTH_MULT, _read


# ---------------------------------------------------------------------------
# Interleaved-span analytics family (BASELINE.json input_hint payload).
# All four oracles below are CROSS-ENGINE: DuckDB recomputes the answer from
# the raw list<struct> spans parquet with UNNEST/generate_subscripts — no
# staged twins. The engine side reads the same file with ray.data and never
# rebuilds the spans column (north-rule sequence invariant untouched).
# ---------------------------------------------------------------------------

def docs_media_dedup(sf_dir: str):
    """Asset-level exact dedup over the interleaved corpus's media spans:
    per distinct media_ref, the number of referencing documents, total span
    occurrences, and the keeper document (MIN doc id) — the keep-list a
    decode stage would use to fetch/decode each asset exactly ONCE and
    paint features back by hash join (the dominant multimodal-corpus
    pattern: asset reuse across pages means naive per-span decode does the
    same work many times over). Uses the dense-blob corpus fixture so reuse
    actually occurs at test scale. Distributed: vectorized span explode ->
    batch-local (ref, doc) pre-combine -> sorted_group_agg at ASSET
    cardinality (grows with data; never a broadcast)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def pairs(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64())
        df = pd.DataFrame({"media_ref": t["media_ref"].to_pandas(), "doc": doc.to_pandas()})
        # batch-local combine: only (ref, doc, occ) triples leave the batch
        g = df.groupby(["media_ref", "doc"], as_index=False).size().rename(columns={"size": "occ"})
        return pa.Table.from_pandas(g.astype({"occ": "int64"}), preserve_index=False)

    # (ref, doc) pairs may straddle batches (a doc lives in one batch, but a
    # ref spans many docs): first collapse to one row per (ref, doc), then
    # roll up per ref. Both levels run at data-growing cardinality, so both
    # use the sorted combine, never a driver groupby.
    per_doc = sorted_group_agg(ds.map_batches(pairs, batch_format="pyarrow"),
                               ["media_ref", "doc"], {"occ": "sum"})
    per_ref = sorted_group_agg(per_doc, "media_ref",
                               {"n_docs": "count", "occ": "sum", "doc": "min"})
    df = per_ref.to_pandas().rename(columns={"occ": "n_occ", "doc": "keeper_doc"})
    df = df.astype({"n_docs": "int64", "n_occ": "int64", "keeper_doc": "int64"})
    return df.sort_values("media_ref").reset_index(drop=True)[
        ["media_ref", "n_docs", "n_occ", "keeper_doc"]
    ]


def _media_dedup_sql() -> str:
    from .. import oracles as O

    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_dense")}')),
m AS (SELECT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS media_ref
      FROM s WHERE sp.kind = 'media'),
d AS (SELECT media_ref, doc, COUNT(*) AS occ FROM m GROUP BY 1, 2)
SELECT media_ref,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(occ) AS BIGINT) AS n_occ,
       CAST(MIN(doc) AS BIGINT) AS keeper_doc
FROM d GROUP BY media_ref ORDER BY media_ref
"""


def docs_span_kind_stats(sf_dir: str):
    """Per-kind corpus rollup over the interleaved spans: span count, total
    text chars, offset sum, and the number of documents containing the
    kind. Every doc is ONE row, so batch-local distinct (kind, doc) pairs
    are globally distinct and the distinct-doc count is a plain summable
    partial — the whole query is per-batch partials + the shuffle-free
    tree combine (3 groups; no groupby stage at all). Text is ASCII by
    construction; both engines count characters (utf8_length / length)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import tree_group_sum

    raw = OF.stage_docs_spans_raw(sf_dir)
    ds = rd.read_parquet(raw)

    def partial(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("kind", "text", "offset"))
        df = pd.DataFrame(
            {
                "kind": t["kind"].to_pandas(),
                "chars": pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64),
                "off": t["offset"].to_numpy(zero_copy_only=False).astype(np.int64),
                "doc": t["doc_id"].to_pandas(),
            }
        )
        g = df.groupby("kind", as_index=False).agg(
            n_spans=("kind", "size"), text_chars=("chars", "sum"),
            sum_offset=("off", "sum"), n_docs=("doc", "nunique"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["kind"],
        value_cols=["n_spans", "text_chars", "sum_offset", "n_docs"],
    )
    out = out.astype({c: "int64" for c in ["n_spans", "text_chars", "sum_offset", "n_docs"]})
    return out.sort_values("kind").reset_index(drop=True)


def _span_kind_stats_sql() -> str:
    from .. import oracles as O

    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_raw")}'))
SELECT sp.kind AS kind,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(length(sp.text)) AS BIGINT) AS text_chars,
       CAST(SUM(sp."offset") AS BIGINT) AS sum_offset,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM s GROUP BY 1 ORDER BY 1
"""


_KINDS = ("geo", "media", "text")  # alphabetical; codes = index


def docs_kind_transitions(sf_dir: str):
    """Corpus-wide counts of CONSECUTIVE span-kind transitions (from_kind ->
    to_kind over adjacent spans within each doc) — an ORDER-SENSITIVE
    statistic over the interleaved sequence, so any pipeline that perturbs
    span order (the north-rule invariant) changes this answer. Distributed:
    adjacency is computed vectorized inside each batch (a doc is one row,
    so every adjacent pair is batch-local), partials are a <=9-group
    bincount, finish is the shuffle-free tree combine."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from .relational import tree_group_sum

    raw = OF.stage_docs_spans_raw(sf_dir)
    ds = rd.read_parquet(raw)
    kinds = pa.array(list(_KINDS))

    def partial(batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"].combine_chunks()
        flat = spans_col.flatten()
        code = pc.index_in(flat.field("kind"), value_set=kinds).to_numpy(zero_copy_only=False)
        offsets = spans_col.offsets.to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        if len(code) < 2:
            return pa.table({"from_kind": pa.array([], type=pa.string()),
                             "to_kind": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        ok = parent[:-1] == parent[1:]
        packed = code[:-1][ok] * 3 + code[1:][ok]
        cnt = np.bincount(packed.astype(np.int64), minlength=9)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "from_kind": pa.array([_KINDS[i // 3] for i in nz], type=pa.string()),
                "to_kind": pa.array([_KINDS[i % 3] for i in nz], type=pa.string()),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    out = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["from_kind", "to_kind"], value_cols=["n"],
    )
    out = out.astype({"n": "int64"})
    return out.sort_values(["from_kind", "to_kind"]).reset_index(drop=True)


def _kind_transitions_sql() -> str:
    from .. import oracles as O

    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp, generate_subscripts(spans, 1) AS ord
           FROM read_parquet('{O.fixture_path("docs_spans_raw")}'))
SELECT a.sp.kind AS from_kind, b.sp.kind AS to_kind, CAST(COUNT(*) AS BIGINT) AS n
FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Exact distributed Gram matrix (X^T X) over the embedding column — the
# covariance/PCA building block and the one dense-linear-algebra reduction a
# training-data pipeline needs (whitening, low-rank probes). Components are
# 1e-3-quantized so per-batch int64 BLAS partials sum exactly in any merge
# order; output is the upper triangle in long (i, j, s) form so the value
# hash covers every entry. Scale: one d(d+1)/2-row partial per batch,
# combined shuffle-free (combine_batch raised so each tree level still
# reduces ~60x at d=64; bound documented at tree_group_sum).
# ---------------------------------------------------------------------------

def embeddings_gram_matrix(sf_dir: str):
    from .relational import tree_group_sum

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        n = batch.num_rows
        if n == 0:  # reshape(0, -1) raises; typed empty keeps the contract
            return pa.table({"i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        X = np.asarray(emb.flatten(), dtype=np.float64).reshape(n, -1)
        q = sql_round(X * 1000.0).astype(np.int64)
        G = q.T @ q
        iu, ju = np.triu_indices(G.shape[0])
        # 1-based indices: generate_subscripts is 1-based on the SQL side
        return pa.table(
            {
                "i": pa.array((iu + 1).astype(np.int64)),
                "j": pa.array((ju + 1).astype(np.int64)),
                "s": pa.array(G[iu, ju].astype(np.int64)),
            }
        )

    out = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], combine_batch=131072, value_cols=["s"],
    )
    out = out.astype({"i": "int64", "j": "int64", "s": "int64"})
    return out.sort_values(["i", "j"]).reset_index(drop=True)


EMBEDDINGS_GRAM_SQL = """
WITH e AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
           FROM embeddings),
q AS (SELECT vec_id, i, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS qx FROM e)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.qx * b.qx) AS BIGINT) AS s
FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_media_decode_dedup(sf_dir: str):
    """The decode-once multimodal composition: explode media spans, reduce
    to DISTINCT assets (sorted combine at asset cardinality), synthesize +
    decode each asset exactly ONCE through the actor-pool ImageDecode
    stage (small batches; payload bytes never ship to the span table), and
    hash-join the per-asset features back to every referencing span. At
    ~4-5x asset reuse this does ~4-5x less decode work than per-span
    decode — the dominant cost lever for a multimodal corpus where decode
    dwarfs the join. Oracle: a single-process naive loop that decodes at
    every OCCURRENCE (stage_docs_media_decode_dedup) — equality proves the
    dedup+join-back is lossless at span granularity."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from ..stages.multimodal import decode_pipeline, synth_media_batch
    from .joins import hash_join
    from .relational import sorted_group_agg

    OF.stage_docs_media_decode_dedup(sf_dir)
    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def media_spans(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64())
        return pa.table({"doc": doc, "span_ord": t["span_ord"], "media_ref": t["media_ref"]})

    # reused twice (distinct-asset reduce + join-back probe): materialize
    # once so the explode doesn't run again per consumer
    span_tbl = ds.map_batches(media_spans, batch_format="pyarrow").materialize()

    distinct = sorted_group_agg(
        span_tbl.select_columns(["media_ref"]), "media_ref", {"n_spans": "count"}
    )

    def to_media(batch: pa.Table) -> pa.Table:
        t = synth_media_batch(batch["media_ref"].to_pylist())
        return t.append_column("n_spans", batch["n_spans"])

    media = distinct.map_batches(to_media, batch_format="pyarrow", batch_size=64)
    decoded = decode_pipeline(media, concurrency=(1, 4), batch_size=64)

    def feat(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            # 0-row blocks reach per-batch UDFs after upstream stages;
            # reshape(0, -1) raises, so emit the typed empty table
            return pa.table(
                {
                    "media_ref": pa.array([], type=pa.string()),
                    "media_kind": pa.array([], type=pa.string()),
                    "n_spans": pa.array([], type=pa.int64()),
                    "feat_sum_um": pa.array([], type=pa.int64()),
                }
            )
        f = np.asarray(
            batch["image_features"].combine_chunks().flatten(), dtype=np.float32
        ).reshape(n, -1).astype(np.float64)
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "media_kind": batch["media_kind"],
                "n_spans": batch["n_spans"],
                "feat_sum_um": pa.array(np.round(f.sum(axis=1) * 1e6).astype(np.int64)),
            }
        )

    feats = decoded.map_batches(feat, batch_format="pyarrow")
    out = hash_join(span_tbl, feats, on="media_ref").to_pandas()
    out = out.astype({"doc": "int64", "span_ord": "int32", "n_spans": "int64", "feat_sum_um": "int64"})
    out["media_kind"] = out["media_kind"].astype(str)
    return out.sort_values(["doc", "span_ord"]).reset_index(drop=True)[
        ["doc", "span_ord", "media_ref", "media_kind", "n_spans", "feat_sum_um"]
    ]


def _media_decode_dedup_sql() -> str:
    from .. import oracles as O

    return O.fixture_sql("docs_media_decode_dedup", "doc, span_ord")


def docs_asset_components(sf_dir: str):
    """Asset-linked document clustering: connected components over the
    doc<->media_ref bipartite graph (docs sharing any media asset join one
    component) — the URL/asset-graph dedup shape for a multimodal corpus.
    Distributed: star-reduced edges (per asset, every referencing doc
    links to the asset's MIN doc — O(fanout) edges per asset instead of
    O(fanout^2), same connectivity) feed the iterative min-label CC; docs
    with no shared asset come back as singletons via a left-outer join.
    The oracle rebuilds doc-doc shared-asset edges in SQL and closes them
    with a RECURSIVE CTE — a full-value cross-engine check of a
    graph-clustering result."""
    import pyarrow.compute as pc
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from ..stages.dedup import connected_components_minlabel
    from .joins import hash_join
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_linked(sf_dir)
    ds = rd.read_parquet(raw)

    def media_spans(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64())
        return pa.table({"doc": doc, "media_ref": t["media_ref"]})

    pairs = ds.map_batches(media_spans, batch_format="pyarrow").materialize()
    # star reduction: one row per (asset, doc) would also work, but CC input
    # wants doc-doc edges — anchor every doc of an asset to the asset's min
    anchor = sorted_group_agg(pairs, "media_ref", {"doc": "min"}).map_batches(
        lambda b: b.rename_columns(["media_ref", "anchor"]), batch_format="pyarrow"
    )
    edges = hash_join(pairs, anchor, on="media_ref").map_batches(
        lambda b: pa.table(
            {"id_a": b["anchor"].cast(pa.int64()), "id_b": b["doc"].cast(pa.int64())}
        ).filter(pc.not_equal(b["anchor"], b["doc"])),
        batch_format="pyarrow",
    )
    labels = connected_components_minlabel(edges).materialize()

    all_docs = ds.map_batches(
        lambda b: pa.table(
            {"doc": pc.cast(pc.utf8_slice_codeunits(b["doc_id"], start=4, stop=64), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    if labels.count() == 0:
        # no shared assets anywhere: every doc is its own component (an
        # empty right side would crash the hash-shuffle finalize)
        df = all_docs.to_pandas()
        df["component_id"] = df["doc"]
        return df.sort_values("doc").reset_index(drop=True).astype(
            {"doc": "int64", "component_id": "int64"}
        )
    lab = labels.map_batches(lambda b: b.rename_columns(["doc", "_cid"]), batch_format="pyarrow")
    joined = hash_join(all_docs, lab, on="doc", join_type="left_outer")
    df = joined.map_batches(
        lambda b: pa.table(
            {
                "doc": b["doc"],
                "component_id": pc.coalesce(b["_cid"].cast(pa.int64()), b["doc"].cast(pa.int64())),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return df.sort_values("doc").reset_index(drop=True).astype({"doc": "int64", "component_id": "int64"})


def _asset_components_sql() -> str:
    from .. import oracles as O

    return f"""
WITH RECURSIVE s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_linked")}')),
m AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS ref
      FROM s WHERE sp.kind = 'media'),
e0 AS (SELECT a.doc AS s, b.doc AS d FROM m a JOIN m b ON a.ref = b.ref AND a.doc <> b.doc),
reach(s, d) AS (
  SELECT s, d FROM e0
  UNION
  SELECT r.s, e.d FROM reach r JOIN e0 e ON r.d = e.s
),
comp AS (SELECT s AS doc, LEAST(MIN(d), s) AS component_id FROM reach GROUP BY s),
docs AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc FROM s)
SELECT doc, CAST(COALESCE(c.component_id, doc) AS BIGINT) AS component_id
FROM docs LEFT JOIN comp c USING (doc) ORDER BY doc
"""


# ---------------------------------------------------------------------------
# Deterministic integer PageRank over the doc<->asset bipartite graph — the
# iterative graph-ranking shape (link analysis over a multimodal corpus:
# which docs/assets sit at reuse hubs). All arithmetic is pinned int64
# micro-units (pr//deg truncating contribution, (85*sum)//100 damping), so
# the SQL oracle unrolls the SAME three iterations exactly — no float
# accumulation-order hazard anywhere. Every node with an edge receives at
# least one contribution per round (the graph is symmetric), so no node
# drops out of the unrolled CTEs.
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 3
_ASSET_BASE = 1_000_000_000


def docs_asset_pagerank(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def edges_batch(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        asset = spans.hex8_to_int(t["media_ref"]) + _ASSET_BASE
        # distinct (doc, asset) pairs: a doc is ONE row, so batch-local
        # distinct is globally distinct
        pairs = pd.DataFrame({"doc": doc, "asset": asset}).drop_duplicates()
        s = np.concatenate([pairs["doc"].to_numpy(), pairs["asset"].to_numpy()])
        d = np.concatenate([pairs["asset"].to_numpy(), pairs["doc"].to_numpy()])
        return pa.table({"s": pa.array(s, type=pa.int64()), "d": pa.array(d, type=pa.int64())})

    edges = ds.map_batches(edges_batch, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # no media spans at all: the rank table is empty (the oracle's it3
        # is empty too); an empty join side would crash the shuffle
        return pd.DataFrame({"doc": pd.Series([], dtype="int64"),
                             "pr": pd.Series([], dtype="int64")})
    # small joins must collapse to few partitions (empty hash-join
    # partitions finalize schema-less — same guard as the distributed CC)
    parts = int(max(2, min(ray.cluster_resources().get("CPU", 8), (n_edges + 9_999) // 10_000)))

    deg = sorted_group_agg(edges, "s", {"deg": "count"}).materialize()
    e_deg = edges.join(deg, join_type="inner", num_partitions=parts, on=("s",)).materialize()

    pr = deg.map_batches(
        lambda b: pa.table(
            {"node": b["s"], "pr": pa.array(np.full(b.num_rows, 1_000_000, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(PAGERANK_ITERS):
        contrib = e_deg.join(pr, join_type="inner", num_partitions=parts, on=("s",), right_on=("node",))
        per_dst = contrib.map_batches(
            lambda b: pa.table(
                {
                    "d": b["d"],
                    "c": pa.array(
                        b["pr"].to_numpy(zero_copy_only=False) // b["deg"].to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        summed = sorted_group_agg(per_dst, "d", {"c": "sum"})
        nxt = summed.map_batches(
            lambda b: pa.table(
                {
                    "node": b["d"],
                    "pr": pa.array(150_000 + (85 * b["c"].to_numpy(zero_copy_only=False)) // 100),
                }
            ),
            batch_format="pyarrow",
        )
        # plan cut: each round's plan embeds the last through the join —
        # rebuild from materialized block refs (terrain.dist._rebound rule)
        pr = rd.from_arrow_refs(nxt.materialize().to_arrow_refs())

    docs_only = pr.map_batches(
        lambda b: b.filter(pc.less(b["node"], _ASSET_BASE)), batch_format="pyarrow"
    )
    df = docs_only.to_pandas()
    df = df.rename(columns={"node": "doc"}).astype({"doc": "int64", "pr": "int64"})
    return df.sort_values("doc").reset_index(drop=True)


def _asset_pagerank_sql() -> str:
    from .. import oracles as O

    hexval = (
        "SUM((CASE WHEN ascii(substr(ref, 14 + i, 1)) >= 97 "
        "THEN ascii(substr(ref, 14 + i, 1)) - 87 "
        "ELSE ascii(substr(ref, 14 + i, 1)) - 48 END) * (CAST(1 AS BIGINT) << (4 * (7 - i))))"
    )
    it = (
        "SELECT e.d AS node, 150000 + (85 * SUM(p.pr // g.deg)) // 100 AS pr "
        "FROM e JOIN {prev} p ON e.s = p.node JOIN deg g ON e.s = g.s GROUP BY e.d"
    )
    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_dense")}')),
m0 AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS ref
       FROM s WHERE sp.kind = 'media'),
m AS (SELECT doc, 1000000000 + CAST({hexval} AS BIGINT) AS asset
      FROM m0, range(8) t(i) GROUP BY doc, ref),
e AS (SELECT doc AS s, asset AS d FROM m UNION ALL SELECT asset, doc FROM m),
deg AS (SELECT s, COUNT(*) AS deg FROM e GROUP BY s),
pr0 AS (SELECT s AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
it1 AS ({it.format(prev="pr0")}),
it2 AS ({it.format(prev="it1")}),
it3 AS ({it.format(prev="it2")})
SELECT CAST(node AS BIGINT) AS doc, CAST(pr AS BIGINT) AS pr FROM it3
WHERE node < 1000000000 ORDER BY doc
"""


# ---------------------------------------------------------------------------
# Distributed triangle counting over the shared-asset doc graph — the classic
# MPC graph primitive. Edges are doc pairs sharing >= 1 asset (fanout-capped:
# assets referenced by more than TRIANGLE_FANOUT_CAP docs are excluded on
# BOTH engines — the standard heavy-hitter exclusion that bounds per-asset
# pair generation at O(CAP^2)); counting uses the degree-ordered orientation
# (every edge points from lower (deg, id) to higher), so each triangle is the
# unique wedge u->v->w whose closing edge u->w exists — one hash join for
# wedges + one for membership, no per-node adjacency broadcast. Doc ids are
# < 2^31 (documented corpus bound shared with docs_hash_sample), so edge
# membership keys pack into one int64.
# ---------------------------------------------------------------------------

TRIANGLE_FANOUT_CAP = 64


def docs_asset_triangles(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from ..stages.keyapply import bucketed_key_apply, key_run_starts, run_start_index
    from .joins import hash_join
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_linked(sf_dir)
    ds = rd.read_parquet(raw)

    def media_pairs(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64())
        df = pd.DataFrame({"media_ref": t["media_ref"].to_pandas(), "doc": doc.to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    pairs = ds.map_batches(media_pairs, batch_format="pyarrow")

    def ref_edges(g: pd.DataFrame) -> pd.DataFrame:
        """Whole refs per bucket: emit all a<b doc pairs per ref. Runs are
        grouped BY LENGTH so the all-pairs construction is one vectorized
        triu gather per distinct run length (<= CAP iterations), never a
        per-ref Python loop."""
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
        if len(g) == 0:
            return empty
        g = g.sort_values(["media_ref", "doc"], kind="stable").reset_index(drop=True)
        docs = g["doc"].to_numpy()
        starts = run_start_index(key_run_starts(g["media_ref"].to_numpy()))
        lens = np.diff(np.append(starts, len(g)))
        keep = lens <= TRIANGLE_FANOUT_CAP
        outs = []
        for k in np.unique(lens[keep]):
            if k < 2:
                continue
            st = starts[keep][lens[keep] == k]
            mat = docs[st[:, None] + np.arange(k)[None, :]]
            iu, ju = np.triu_indices(int(k), 1)
            outs.append(pd.DataFrame({"a": mat[:, iu].ravel(), "b": mat[:, ju].ravel()}))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True).astype({"a": "int64", "b": "int64"})

    raw_edges = bucketed_key_apply(pairs, "media_ref", ref_edges)

    # distinct edges: pack (a, b) into one int64 (a < b < 2^31) and dedupe
    # at edge cardinality via the sorted combine
    def pack(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": (b["a"].to_numpy() << np.int64(31)) | b["b"].to_numpy()})

    edges_packed = sorted_group_agg(
        raw_edges.map_batches(pack, batch_format="pandas"), "k", {"cnt": "count"}
    ).materialize()

    def unpack(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(k >> np.int64(31)), "b": pa.array(k & np.int64((1 << 31) - 1))})

    edges = edges_packed.map_batches(unpack, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        # no doc pair shares an asset: zero triangles for every doc (an
        # empty join side would crash the shuffle)
        all_docs_df = ds.map_batches(
            lambda b: pa.table({"doc": pc.cast(
                pc.utf8_slice_codeunits(b["doc_id"], start=4, stop=64), pa.int64())}),
            batch_format="pyarrow",
        ).to_pandas()
        all_docs_df["n_tri"] = np.int64(0)
        return all_docs_df.sort_values("doc").reset_index(drop=True).astype(
            {"doc": "int64", "n_tri": "int64"}
        )
    parts = int(max(2, min(ray.cluster_resources().get("CPU", 8), (n_edges + 9_999) // 10_000)))

    both = edges.map_batches(
        lambda b: pa.table({"doc": pa.concat_arrays(
            [b["a"].combine_chunks(), b["b"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    deg = sorted_group_agg(both, "doc", {"dg": "count"}).materialize()

    # orient: s = endpoint with smaller (deg, id); two deg lookups by join
    # (Ray's join drops the right key column, so e1 = (a, b, dga))
    deg_a = deg.map_batches(lambda b: b.rename_columns(["doc", "dga"]), batch_format="pyarrow")
    e1 = hash_join(edges, deg_a, on="a", right_on="doc", num_partitions=parts)
    e2 = hash_join(e1, deg, on="b", right_on="doc", num_partitions=parts)

    def orient(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        da = b["dga"].to_numpy(zero_copy_only=False)
        db = b["dg"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < bb))
        s = np.where(a_first, a, bb)
        d = np.where(a_first, bb, a)
        return pa.table({"s": pa.array(s), "d": pa.array(d),
                         "sd": pa.array((s << np.int64(31)) | d)})

    eo = e2.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges u->v->w (join on the middle vertex), then close with the
    # membership join on the packed (u, w) key
    left = eo.map_batches(lambda b: b.select(["s", "d"]).rename_columns(["u", "v"]), batch_format="pyarrow")
    right = eo.map_batches(lambda b: b.select(["s", "d"]).rename_columns(["v", "w"]), batch_format="pyarrow")
    wedges = hash_join(left, right, on="v", num_partitions=parts).map_batches(
        lambda b: pa.table({
            "u": b["u"], "v": b["v"], "w": b["w"],
            "uw": pa.array((b["u"].to_numpy(zero_copy_only=False) << np.int64(31))
                           | b["w"].to_numpy(zero_copy_only=False)),
        }),
        batch_format="pyarrow",
    )
    closing = eo.map_batches(lambda b: b.select(["sd"]).rename_columns(["uw"]), batch_format="pyarrow")
    tris = hash_join(wedges, closing, on="uw", num_partitions=parts)

    corners = tris.map_batches(
        lambda b: pa.table({"doc": pa.concat_arrays(
            [b["u"].combine_chunks(), b["v"].combine_chunks(), b["w"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    per_doc = sorted_group_agg(corners, "doc", {"n_tri": "count"}).materialize()

    all_docs = ds.map_batches(
        lambda b: pa.table({"doc": pc.cast(
            pc.utf8_slice_codeunits(b["doc_id"], start=4, stop=64), pa.int64())}),
        batch_format="pyarrow",
    )
    if per_doc.count() == 0:
        # edges but no triangles (sparse graph) — zero-fill without a join
        df = all_docs.to_pandas()
        df["n_tri"] = np.int64(0)
        return df.sort_values("doc").reset_index(drop=True).astype(
            {"doc": "int64", "n_tri": "int64"}
        )
    joined = hash_join(all_docs, per_doc, on="doc", join_type="left_outer", num_partitions=parts)
    df = joined.map_batches(
        lambda b: pa.table({
            "doc": b["doc"],
            "n_tri": pc.coalesce(b["n_tri"].cast(pa.int64()), pa.scalar(0, pa.int64())),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    return df.sort_values("doc").reset_index(drop=True).astype({"doc": "int64", "n_tri": "int64"})


def _asset_triangles_sql() -> str:
    from .. import oracles as O

    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_linked")}')),
m AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS ref
      FROM s WHERE sp.kind = 'media'),
fan AS (SELECT ref, COUNT(*) AS f FROM m GROUP BY ref),
mok AS (SELECT m.doc, m.ref FROM m JOIN fan USING (ref) WHERE fan.f <= {TRIANGLE_FANOUT_CAP}),
e0 AS (SELECT DISTINCT a.doc AS a, b.doc AS b
       FROM mok a JOIN mok b ON a.ref = b.ref AND a.doc < b.doc),
deg AS (SELECT doc, COUNT(*) AS dg
        FROM (SELECT a AS doc FROM e0 UNION ALL SELECT b FROM e0) GROUP BY doc),
eo AS (SELECT CASE WHEN (da.dg, e0.a) < (db.dg, e0.b) THEN e0.a ELSE e0.b END AS s,
              CASE WHEN (da.dg, e0.a) < (db.dg, e0.b) THEN e0.b ELSE e0.a END AS d
       FROM e0 JOIN deg da ON e0.a = da.doc JOIN deg db ON e0.b = db.doc),
tri AS (SELECT e1.s AS u, e1.d AS v, e2.d AS w
        FROM eo e1 JOIN eo e2 ON e1.d = e2.s
        JOIN eo e3 ON e3.s = e1.s AND e3.d = e2.d),
cnt AS (SELECT doc, COUNT(*) AS n_tri
        FROM (SELECT u AS doc FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
        GROUP BY doc),
docs AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc FROM s)
SELECT doc, CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_tri
FROM docs LEFT JOIN cnt USING (doc) ORDER BY doc
"""


# ---------------------------------------------------------------------------
# k-core decomposition (parallel peel): completes the graph family beside
# connected components, PageRank, and triangle counting. Each round drops
# EVERY node whose current degree is < K at once, so the round count is
# the graph's "peeling complexity" (small on real shared-asset graphs —
# 9 on this corpus; O(V) only on adversarial paths, guarded by a loud
# max_rounds raise). Rounds are two bounded hash joins (edge endpoint
# x surviving-node set) + one degree aggregate, with the CC/PageRank plan
# cut between rounds; nothing node- or edge-cardinality ever reaches the
# driver. Oracle = single-process twin running the same peel whole-array.
# ---------------------------------------------------------------------------

KCORE_K = 2


def docs_asset_kcore(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import sorted_group_agg

    OF.stage_docs_asset_kcore(sf_dir)
    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def edges_batch(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        asset = spans.hex8_to_int(t["media_ref"]) + _ASSET_BASE
        pairs = pd.DataFrame({"doc": doc, "asset": asset}).drop_duplicates()
        s = np.concatenate([pairs["doc"].to_numpy(), pairs["asset"].to_numpy()])
        d = np.concatenate([pairs["asset"].to_numpy(), pairs["doc"].to_numpy()])
        return pa.table({"s": pa.array(s, type=pa.int64()), "d": pa.array(d, type=pa.int64())})

    empty = pd.DataFrame({"node": pd.Series([], dtype="int64"), "core_deg": pd.Series([], dtype="int64")})
    cur = ds.map_batches(edges_batch, batch_format="pyarrow").materialize()
    n_edges = cur.count()
    if n_edges == 0:
        return empty
    parts = int(max(2, min(ray.cluster_resources().get("CPU", 8), (n_edges + 9_999) // 10_000)))

    max_rounds = 64
    for rnd in range(max_rounds + 1):
        deg = sorted_group_agg(cur, "s", {"deg": "count"})
        act = deg.map_batches(
            lambda b: pa.table({"node": b.filter(pa.compute.greater_equal(b["deg"], KCORE_K))["s"]}),
            batch_format="pyarrow",
        ).materialize()
        if act.count() == 0:
            return empty
        kept = cur.join(act, join_type="inner", num_partitions=parts, on=("s",), right_on=("node",))
        kept = kept.map_batches(lambda b: b.select(["s", "d"]), batch_format="pyarrow")
        kept = kept.join(act, join_type="inner", num_partitions=parts, on=("d",), right_on=("node",))
        kept = kept.map_batches(lambda b: b.select(["s", "d"]), batch_format="pyarrow")
        # plan cut: the joins embed the previous round's plan
        nxt = rd.from_arrow_refs(kept.materialize().to_arrow_refs())
        n_nxt = nxt.count()
        if n_nxt == cur.count():
            break
        cur = nxt
        if rnd == max_rounds:
            raise RuntimeError(
                f"k-core peel did not converge in {max_rounds} rounds — "
                "adversarial peeling depth; raise max_rounds explicitly"
            )

    core_deg = sorted_group_agg(cur, "s", {"core_deg": "count"}).to_pandas()
    out = core_deg.rename(columns={"s": "node"}).astype({"node": "int64", "core_deg": "int64"})
    return out.sort_values("node").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance over the doc<->asset bipartite graph — the
# neighborhood-expansion shape (link-graph crawl frontier, contamination
# blast radius). Per round: one bounded hash join (edges x frontier) and
# one min-combine at node cardinality; the iteration count is PINNED so
# the DuckDB oracle unrolls the identical min-relaxation — fully
# cross-engine, no staged twin. Hop values over the bipartite graph are
# even for doc nodes (doc -> asset -> doc), so the 4-round cap reaches
# doc-to-doc distance 2.
# ---------------------------------------------------------------------------

BFS_HOPS_MOD = 13
BFS_HOPS_ROUNDS = 4


def docs_asset_hops(sf_dir: str):
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from . import oracle_fixtures as OF
    from ..stages import spans
    from .relational import sorted_group_agg

    raw = OF.stage_docs_spans_dense(sf_dir)
    ds = rd.read_parquet(raw)

    def edges_batch(batch: pa.Table) -> pa.Table:
        t = spans.explode_spans(batch, fields=("media_ref",), kind="media")
        doc = pc.cast(
            pc.utf8_slice_codeunits(t["doc_id"], start=4, stop=64), pa.int64()
        ).to_numpy(zero_copy_only=False)
        asset = spans.hex8_to_int(t["media_ref"]) + _ASSET_BASE
        pairs = pd.DataFrame({"doc": doc, "asset": asset}).drop_duplicates()
        s = np.concatenate([pairs["doc"].to_numpy(), pairs["asset"].to_numpy()])
        d = np.concatenate([pairs["asset"].to_numpy(), pairs["doc"].to_numpy()])
        return pa.table({"s": pa.array(s, type=pa.int64()), "d": pa.array(d, type=pa.int64())})

    empty = pd.DataFrame(
        {"doc": pd.Series([], dtype="int64"), "hops": pd.Series([], dtype="int64")}
    )
    edges = ds.map_batches(edges_batch, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return empty
    parts = int(max(2, min(ray.cluster_resources().get("CPU", 8), (n_edges + 9_999) // 10_000)))

    def seed_batch(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        m = (s < _ASSET_BASE) & (s % BFS_HOPS_MOD == 0)
        u = np.unique(s[m])
        return pa.table(
            {"node": pa.array(u, type=pa.int64()),
             "h": pa.array(np.zeros(len(u), dtype=np.int64))}
        )

    # seed set from the edge endpoints themselves (duplicates across
    # batches collapse in the min-combine; h is 0 everywhere)
    seeds = edges.map_batches(seed_batch, batch_format="pyarrow")
    dist = sorted_group_agg(seeds, "node", {"h": "min"}).materialize()
    if dist.count() == 0:
        return empty
    for _ in range(BFS_HOPS_ROUNDS):
        relax = edges.join(dist, join_type="inner", num_partitions=parts, on=("s",), right_on=("node",))
        step = relax.map_batches(
            lambda b: pa.table(
                {"node": b["d"],
                 "h": pa.array(b["h"].to_numpy(zero_copy_only=False) + 1)}
            ),
            batch_format="pyarrow",
        )
        nxt = sorted_group_agg(dist.union(step), "node", {"h": "min"})
        # plan cut: the join embeds the previous round's plan (the
        # CC/PageRank rebound rule)
        dist = rd.from_arrow_refs(nxt.materialize().to_arrow_refs())
    out = dist.map_batches(
        lambda b: b.filter(pc.less(b["node"], _ASSET_BASE)), batch_format="pyarrow"
    ).to_pandas()
    out = out.rename(columns={"node": "doc", "h": "hops"}).astype({"doc": "int64", "hops": "int64"})
    return out.sort_values("doc").reset_index(drop=True)


def _asset_hops_sql() -> str:
    from .. import oracles as O

    hexval = (
        "SUM((CASE WHEN ascii(substr(ref, 14 + i, 1)) >= 97 "
        "THEN ascii(substr(ref, 14 + i, 1)) - 87 "
        "ELSE ascii(substr(ref, 14 + i, 1)) - 48 END) * (CAST(1 AS BIGINT) << (4 * (7 - i))))"
    )
    rel = (
        "SELECT node, MIN(h) AS h FROM ("
        "SELECT node, h FROM {prev} "
        "UNION ALL "
        "SELECT e.d AS node, p.h + 1 AS h FROM e JOIN {prev} p ON e.s = p.node"
        ") GROUP BY node"
    )
    return f"""
WITH s AS (SELECT doc_id, unnest(spans) AS sp
           FROM read_parquet('{O.fixture_path("docs_spans_dense")}')),
m0 AS (SELECT DISTINCT CAST(doc_id[5:] AS BIGINT) AS doc, sp.media_ref AS ref
       FROM s WHERE sp.kind = 'media'),
m AS (SELECT doc, 1000000000 + CAST({hexval} AS BIGINT) AS asset
      FROM m0, range(8) t(i) GROUP BY doc, ref),
e AS (SELECT doc AS s, asset AS d FROM m UNION ALL SELECT asset, doc FROM m),
d0 AS (SELECT DISTINCT s AS node, CAST(0 AS BIGINT) AS h FROM e
       WHERE s < 1000000000 AND s % {BFS_HOPS_MOD} = 0),
d1 AS ({rel.format(prev="d0")}),
d2 AS ({rel.format(prev="d1")}),
d3 AS ({rel.format(prev="d2")}),
d4 AS ({rel.format(prev="d3")})
SELECT CAST(node AS BIGINT) AS doc, CAST(h AS BIGINT) AS hops FROM d4
WHERE node < 1000000000 ORDER BY doc
"""


