"""LLM-training-data hygiene driver queries (split from extraqueries.py,
round 5): dedup (jaccard pairs, simhash Hamming pairs, chunk/substring
dedup), decontamination, sampling (hash/exact-k/stratified/weighted/quota),
packing, chunking, redaction-adjacent normalization, curation funnel,
ingest round-trips. No behavior change — defs moved verbatim;
oracle-gate re-ran green."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..numerics import sql_round

from .. import io
from .qcommon import KNUTH_MULT, _read
from .retrievalqueries import _doc_terms  # shared tokenize (curation funnel)


# ---------------------------------------------------------------------------
# n-gram Jaccard verify stage on the driver hash channel (reference
# dedup semantics; engine stages/dedup.py::pair_gram_overlap). The oracle
# recomputes the word-5-gram shingle sets FROM RAW TEXT in DuckDB (split,
# slice, distinct, set algebra) — genuinely cross-engine, no staged twin,
# and the compared quantities are exact integer set sizes.
# ---------------------------------------------------------------------------

def docs_jaccard_pairs(sf_dir: str):
    """Pair the 30 lexicographically-smallest doc_ids consecutively and
    compute each pair's exact shingle intersection/union sizes through the
    distributed join path (text never moves — only gram-hash blobs)."""
    import ray.data as rd

    from ..stages import dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ids = sorted(r["doc_id"] for r in ds.select_columns(["doc_id"]).sort("doc_id").limit(30).take_all())
    pairs = rd.from_pandas(pd.DataFrame({"id_a": ids[0::2], "id_b": ids[1::2]}))
    out = dedup.pair_gram_overlap(pairs, ds).to_pandas()
    return out.sort_values("id_a").reset_index(drop=True)


DOCS_JACCARD_PAIRS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
  FROM documents
  WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 30)
),
nd AS (
  SELECT doc_id, ws, len(ws) AS nw,
         row_number() OVER (ORDER BY doc_id) AS rn
  FROM d
),
grams AS (
  SELECT rn, doc_id,
         coalesce(array_to_string(ws[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' '), '') AS gram
  FROM nd, unnest(range(1, greatest(nw - 4, 1) + 1)) t(i)
),
sets AS (SELECT DISTINCT rn, gram FROM grams),
ps AS (SELECT CAST((rn - 1) // 2 AS BIGINT) AS p, rn % 2 AS side, gram FROM sets),
agg AS (SELECT p, gram, count(DISTINCT side) AS nsides FROM ps GROUP BY p, gram),
stats AS (
  SELECT p,
         CAST(SUM(CASE WHEN nsides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS inter_sz,
         CAST(COUNT(*) AS BIGINT) AS union_sz
  FROM agg GROUP BY p
),
names AS (
  SELECT CAST((rn - 1) // 2 AS BIGINT) AS p,
         MAX(CASE WHEN rn % 2 = 1 THEN doc_id END) AS id_a,
         MAX(CASE WHEN rn % 2 = 0 THEN doc_id END) AS id_b
  FROM nd GROUP BY 1
)
SELECT n.id_a, n.id_b, s.inter_sz, s.union_sz
FROM stats s JOIN names n USING (p)
ORDER BY n.id_a
"""


# ---------------------------------------------------------------------------
# Deterministic hash sampling: Knuth multiplicative hash on the id, keep
# h % 100 < rate. Pure per-batch filter (no shuffle, no RNG state), so the
# sample is reproducible across runs, partitionings, and engines. Domain
# bound: exact SQL mirroring holds for ids < 2^31 (the int64 product stays
# in range); past that the engine side wraps in uint64 and the oracle
# would need DuckDB's hugeint arithmetic.
# ---------------------------------------------------------------------------

KNUTH_MULT = 2654435761  # 2^32 / phi, Knuth TAOCP vol 3 s6.4
HASH_SAMPLE_PCT = 10  # pinned: interpolated into BOTH the engine filter and the SQL


def docs_hash_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pick(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)
        return b.filter(pa.array((h % np.uint64(100)) < np.uint64(HASH_SAMPLE_PCT)))

    return ds.map_batches(pick, batch_format="pyarrow")


DOCS_HASH_SAMPLE_SQL = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE ((doc_id * {KNUTH_MULT}) % 4294967296) % 100 < {HASH_SAMPLE_PCT}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact-size uniform sample (k smallest pinned-hash values = a determinis-
# tic sample of EXACTLY k rows, the rate-free counterpart of
# docs_hash_sample): batch-local top-k by (hash, id) + a combine level +
# driver final — the partial-top-k merge argument, no global sort. The
# oracle is ORDER BY the same hash LIMIT k.
# ---------------------------------------------------------------------------

SAMPLE_K = 20


def docs_sample_k(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def topk(b) -> pd.DataFrame:
        df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        did = df["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        df = df.assign(h=((did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.int64))
        return df.sort_values(["h", "doc_id"]).head(SAMPLE_K)

    lvl = ds.map_batches(topk, batch_format="pandas").map_batches(topk, batch_format="pandas", batch_size=4096)
    df = topk(lvl.to_pandas()).reset_index(drop=True)
    df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["rk", "doc_id", "lang", "n_chars", "h"]]


DOCS_SAMPLE_K_SQL = f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS rk,
       doc_id, lang, n_chars, h
FROM (
  SELECT doc_id, lang, n_chars,
         ((doc_id * {KNUTH_MULT}) % 4294967296) AS h
  FROM documents
)
ORDER BY h, doc_id LIMIT {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Test-set decontamination (stages/decontam.py): the eval split is a pinned
# Knuth-hash slice of the corpus (stand-in for a benchmark suite), its
# distinct 5-gram set is built with per-batch unique partials and broadcast
# ONCE; the train side streams through one gram-hash + searchsorted probe
# per batch. The oracle recomputes grams from raw text in DuckDB (string
# grams vs the engine's 64-bit gram hashes — cross-engine, not a twin).
# The documented scale path past a broadcastable eval set is the Bloom
# OR-fold build in the same module (no false negatives: over-flag only).
# ---------------------------------------------------------------------------

EVAL_PCT = 5  # pinned eval-slice rate, interpolated into engine + SQL
DECONTAM_K = 5


def docs_decontaminate(sf_dir: str):
    import ray

    from ..stages import decontam as DC

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def is_eval_mask(b: pa.Table) -> np.ndarray:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)
        return (h % np.uint64(100)) < np.uint64(EVAL_PCT)

    eval_ds = ds.map_batches(lambda b: b.filter(pa.array(is_eval_mask(b))), batch_format="pyarrow")
    train_ds = ds.map_batches(lambda b: b.filter(pa.array(~is_eval_mask(b))), batch_format="pyarrow")

    grams = DC.gram_set_exact(eval_ds, "text", k=DECONTAM_K)
    counts = DC.contamination_counts(train_ds, ray.put(grams), "text", "doc_id", k=DECONTAM_K)
    hit = counts.filter(expr="n_hits > 0").to_pandas()
    return hit.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_grams": "int64", "n_hits": "int64"}
    )


DOCS_DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w,
         ((doc_id * {KNUTH_MULT}) % 4294967296) % 100 < {EVAL_PCT} AS is_eval
  FROM documents
), g AS (
  SELECT doc_id, is_eval,
         CASE WHEN len(w) >= {DECONTAM_K} THEN array_to_string(w[i:i+{DECONTAM_K - 1}], ' ')
              ELSE COALESCE(array_to_string(w, ' '), '') END AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= {DECONTAM_K} THEN range(1, len(w) - {DECONTAM_K - 2})
                         ELSE [CAST(1 AS BIGINT)] END) AS t(i)
), eg AS (SELECT DISTINCT gram FROM g WHERE is_eval),
hits AS (
  SELECT g.doc_id, COUNT(*) AS n_grams,
         COUNT(*) FILTER (WHERE eg.gram IS NOT NULL) AS n_hits
  FROM g LEFT JOIN eg ON g.gram = eg.gram
  WHERE NOT g.is_eval GROUP BY g.doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, CAST(n_hits AS BIGINT) AS n_hits
FROM hits WHERE n_hits > 0 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Training-window chunking: explode each document into fixed-size token
# windows (the packing step before tokenizer sharding). Pinned rule shared
# with the SQL: words = split-and-drop-empties; chunk starts at 0, W, 2W,
# ...; a document with zero words still emits ONE empty chunk. Per-batch
# vectorized (explode + cumcount); the ' '.join is per OUTPUT row (chunk),
# the stage's own cardinality, not a per-word interpreter loop.
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32


def docs_chunk_windows(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    W = CHUNK_TOKENS

    def chunks(b: pa.Table) -> pa.Table:
        from ..stages.text import chunk_windows_df

        g = chunk_windows_df(b.to_pandas(), "doc_id", "text", W)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = ds.map_batches(chunks, batch_format="pyarrow").to_pandas()
    return df.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


DOCS_CHUNK_WINDOWS_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w FROM documents)
SELECT doc_id, CAST(s/{CHUNK_TOKENS} AS BIGINT) AS chunk_id,
       CAST(LEAST(s+{CHUNK_TOKENS}, len(w)) - s AS BIGINT) AS n_tokens,
       COALESCE(array_to_string(w[s+1 : LEAST(s+{CHUNK_TOKENS}, len(w))], ' '), '') AS chunk_text
FROM toks, UNNEST(range(0, GREATEST(len(w), 1), {CHUNK_TOKENS})) AS t(s)
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition stats (Rae et al. 2021 quality rules): per-doc
# duplicate-word fraction and top-word fraction. One word-hash pass +
# lexsort run-length per batch — no per-doc loop; fractions rounded via
# the shared sql_round convention so DuckDB's round() agrees exactly.
# ---------------------------------------------------------------------------

def docs_repetition_stats(sf_dir: str):
    from ..stages.sketch import word_hash_flat

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        Wh, off = word_hash_flat(b["text"])
        n_docs = len(off) - 1
        nwords = (off[1:] - off[:-1]).astype(np.int64)
        docidx = np.repeat(np.arange(n_docs), nwords)
        order = np.lexsort((Wh, docidx))
        Ws, Ds = Wh[order], docidx[order]
        if len(Ws):
            new = np.concatenate([[True], (Ws[1:] != Ws[:-1]) | (Ds[1:] != Ds[:-1])])
            run_id = np.cumsum(new) - 1
            run_counts = np.bincount(run_id)
            run_doc = Ds[new]
            distinct = np.bincount(run_doc, minlength=n_docs)
            starts = np.searchsorted(run_doc, np.arange(n_docs))
            has = distinct > 0
            maxc = np.zeros(n_docs, dtype=np.int64)
            if has.any():
                maxc[has] = np.maximum.reduceat(run_counts, starts[has])
        else:
            distinct = np.zeros(n_docs, dtype=np.int64)
            maxc = np.zeros(n_docs, dtype=np.int64)
        nz = np.maximum(nwords, 1).astype(np.float64)
        dup = sql_round((1.0 - distinct / nz) * 1e6) / 1e6
        top = sql_round((maxc / nz) * 1e6) / 1e6
        keep = nwords > 0  # SQL's per-word GROUP BY drops zero-word docs
        return pa.table(
            {
                "doc_id": b["doc_id"].filter(pa.array(keep)),
                "n_words": pa.array(nwords[keep]),
                "n_distinct": pa.array(distinct[keep].astype(np.int64)),
                "dup_frac": pa.array(dup[keep]),
                "top_frac": pa.array(top[keep]),
            }
        )

    df = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DOCS_REPETITION_STATS_SQL = """
WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS wd FROM documents),
c AS (SELECT doc_id, wd, COUNT(*) AS cnt FROM toks GROUP BY doc_id, wd),
a AS (SELECT doc_id, SUM(cnt) AS n_words, COUNT(*) AS n_distinct, MAX(cnt) AS max_cnt FROM c GROUP BY doc_id)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, CAST(n_distinct AS BIGINT) AS n_distinct,
       round(1 - CAST(n_distinct AS DOUBLE)/n_words, 6) AS dup_frac,
       round(CAST(max_cnt AS DOUBLE)/n_words, 6) AS top_frac
FROM a ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Stratified (per-group quota) sampling: k docs per language, determined by
# the pinned Knuth hash so the sample is reproducible across engines and
# partitionings. Batch-local per-group top-k -> tree combine -> driver
# finish over <= langs*k rows per level (the docs_top3_by_lang lever) — a
# per-group ORDER BY/LIMIT with NO global sort or shuffle.
# ---------------------------------------------------------------------------

STRATIFIED_K = 20


def docs_stratified_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def topk(b) -> pd.DataFrame:
        df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        did = df["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        df = df.assign(h=((did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.int64))
        df = df.sort_values(["lang", "h", "doc_id"])
        return df.groupby("lang", as_index=False).head(STRATIFIED_K)

    lvl = ds.map_batches(topk, batch_format="pandas").map_batches(
        topk, batch_format="pandas", batch_size=4096
    )
    df = topk(lvl.to_pandas()).reset_index(drop=True)
    df["rk"] = (df.groupby("lang").cumcount() + 1).astype("int64")
    return df[["lang", "rk", "doc_id"]].sort_values(["lang", "rk"]).reset_index(drop=True)


DOCS_STRATIFIED_SAMPLE_SQL = f"""
SELECT lang, CAST(rn AS BIGINT) AS rk, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY (doc_id * {KNUTH_MULT}) % 4294967296, doc_id) AS rn
  FROM documents
)
WHERE rn <= {STRATIFIED_K} ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-Res, 2006):
# each row draws u = (knuth_hash(id)+1)/2^32 in (0,1] and priority
# key = -ln(u)/w; the k SMALLEST keys are a weight-proportional sample.
# Deterministic (hash-derived u, no RNG state), so the SQL oracle
# recomputes the identical priorities. Distributed shape = the same
# batch-local top-k -> combine level -> driver top-k as docs_sample_k:
# moved volume is O(batches x k) rows, never the corpus. Weight here is
# n_chars (sample long documents proportionally more often).
# ---------------------------------------------------------------------------

def docs_weighted_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def topk(b) -> pd.DataFrame:
        df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        if "key" not in df.columns:
            did = df["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
            h = ((did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.float64)
            u = (h + 1.0) / 4294967296.0
            w = np.maximum(df["n_chars"].to_numpy(dtype=np.float64), 1.0)
            df = df.assign(key=-np.log(u) / w)
        return df.sort_values(["key", "doc_id"]).head(SAMPLE_K)

    lvl = ds.map_batches(topk, batch_format="pandas").map_batches(topk, batch_format="pandas", batch_size=4096)
    df = topk(lvl.to_pandas()).reset_index(drop=True)
    df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["key"] = sql_round(df["key"].to_numpy() * 1e6).astype(np.int64)
    return df[["rk", "doc_id", "lang", "n_chars", "key"]]


DOCS_WEIGHTED_SAMPLE_SQL = f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY key, doc_id) AS BIGINT) AS rk,
       doc_id, lang, n_chars, CAST(round(key * 1000000) AS BIGINT) AS key
FROM (
  SELECT doc_id, lang, n_chars,
         -LN((CAST((doc_id * {KNUTH_MULT}) % 4294967296 AS DOUBLE) + 1.0) / 4294967296.0)
           / GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS key
  FROM documents
)
ORDER BY key, doc_id LIMIT {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Sequence packing (stages/scan.py): GPT-style training-data prep —
# documents concatenated in doc_id order into fixed-length token windows;
# each doc's sequence id/offset is a pure function of the global ordered
# prefix sum, computed with the two-phase distributed scan (per-bucket
# sums -> tiny driver prefix -> one groupby(bucket) local cumsum). Oracle:
# the same pinned rule as a SQL window cumsum over the same tokenizer
# (regexp_split_to_array == the engine's Arrow split, proven by
# docs_token_stats).
# ---------------------------------------------------------------------------

PACK_SEQ_LEN = 512


def docs_pack_sequences(sf_dir: str):
    import pyarrow.compute as pc

    from ..stages.scan import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern_regex(b["text"], r"\s+")).cast(pa.int64())
        return pa.table({"doc_id": b["doc_id"], "n_tokens": n})

    out = pack_sequences(
        ds.map_batches(toks, batch_format="pyarrow"), "doc_id", "n_tokens", PACK_SEQ_LEN, bucket_width=64
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


DOCS_PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER (ORDER BY doc_id) AS cum FROM t)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {PACK_SEQ_LEN} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Chunk-level exact dedup: the window-chunker's windows, deduplicated
# globally by content with keeper = MIN(doc_id) per distinct chunk text.
# Distributed path shuffles only (chunk-hash, doc, copies) triples and
# paints keepers back with a hash-partitioned join (stages/dedup.py::
# chunk_exact_dedup); the oracle regroups the same windows by chunk_text.
# ---------------------------------------------------------------------------

def docs_chunk_dedup(sf_dir: str):
    from ..stages.dedup import chunk_exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df = chunk_exact_dedup(ds, window_tokens=CHUNK_TOKENS).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return df.astype({"doc_id": "int64", "n_chunks": "int64", "n_kept": "int64", "n_dropped": "int64"})


DOCS_CHUNK_DEDUP_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w FROM documents),
chunks AS (
  SELECT doc_id, COALESCE(array_to_string(w[s+1 : LEAST(s+{CHUNK_TOKENS}, len(w))], ' '), '') AS chunk_text
  FROM toks, UNNEST(range(0, GREATEST(len(w), 1), {CHUNK_TOKENS})) AS t(s)
),
owners AS (SELECT chunk_text, MIN(doc_id) AS keeper FROM chunks GROUP BY chunk_text)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) FILTER (WHERE o.keeper = c.doc_id) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE o.keeper <> c.doc_id) AS BIGINT) AS n_dropped
FROM chunks c JOIN owners o USING (chunk_text)
GROUP BY c.doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic global training shuffle: every document gets its position in
# the seeded shuffled stream (rank over the pinned Knuth hash, doc_id
# tie-break). Distributed as the ordered scan over a packed
# (hash << 31 | doc_id) key — value 1, so cum-1 IS the 0-based rank — with
# doc_id recovered from the key's low bits afterward; the bucket width is
# sized from the corpus row count so sparse hash-space keys still land
# ~4k rows per scan bucket. Shares the documented doc_id < 2^31 SQL-mirror
# bound with docs_hash_sample.
# ---------------------------------------------------------------------------

def docs_shuffle_rank(sf_dir: str):
    from ..stages.scan import ordered_prefix_sum

    ds = _read(sf_dir, "documents", ["doc_id"])
    n = ds.count()  # parquet metadata count — no pipeline execution

    def key(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)).astype(np.int64)
        k = (h << np.int64(31)) | did.astype(np.int64)
        return pa.table({"k": pa.array(k, type=pa.int64()), "one": pa.array(np.ones(len(k), dtype=np.int64))})

    # keys are uniform over [0, 2^63): size buckets to ~4k rows each so the
    # per-bucket map_groups pass gets real groups, not singletons
    bw = max((1 << 63) // max(n // 4096, 64), 1)
    scanned = ordered_prefix_sum(ds.map_batches(key, batch_format="pyarrow"), "k", "one", bucket_width=bw)

    def finish(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        cum = b["cum"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(k & np.int64((1 << 31) - 1), type=pa.int64()),
                "shuffle_pos": pa.array(cum - 1, type=pa.int64()),
            }
        )

    df = scanned.map_batches(finish, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DOCS_SHUFFLE_RANK_SQL = f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY (doc_id * {KNUTH_MULT}) % 4294967296, doc_id) - 1 AS BIGINT)
         AS shuffle_pos
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Duplicated-span statistics (ExactSubstr-style signal): every OVERLAPPING
# k-token window, counted as duplicated when its content occurs >= 2 times
# anywhere in the corpus. Distributed path shuffles only (window-hash, doc,
# copies) triples and paints global multiplicities back with a
# hash-partitioned join (stages/dedup.py::dup_span_stats); the oracle
# regroups the same windows by window TEXT (cross-engine: string grams vs
# the engine's 64-bit gram hashes). Short docs (< k words) emit one
# whole-doc window — the decontamination kernel's pinned rule.
# ---------------------------------------------------------------------------

DUP_SPAN_K = 8


def docs_dup_spans(sf_dir: str):
    from ..stages.dedup import dup_span_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df = dup_span_stats(ds, k=DUP_SPAN_K).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return df.astype({"doc_id": "int64", "n_windows": "int64", "n_dup_windows": "int64"})


DOCS_DUP_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {DUP_SPAN_K} THEN array_to_string(w[i:i+{DUP_SPAN_K - 1}], ' ')
              ELSE COALESCE(array_to_string(w, ' '), '') END AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= {DUP_SPAN_K} THEN range(1, len(w) - {DUP_SPAN_K - 2})
                         ELSE [CAST(1 AS BIGINT)] END) AS t(i)
),
tot AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(*) FILTER (WHERE tot.cnt >= 2) AS BIGINT) AS n_dup_windows
FROM g JOIN tot USING (gram)
GROUP BY g.doc_id ORDER BY g.doc_id
"""


# ---------------------------------------------------------------------------
# End-to-end LLM training-data prep funnel: the composition query — token
# filter -> exact dedup -> decontamination -> sequence packing, reported
# as per-stage (docs, tokens) totals. Every stage reuses the pinned rule
# its standalone query already proves (regexp \s+ token counts ==
# docs_token_stats; keeper = MIN(doc_id) per content group ==
# docs_exact_dedup; the 5-gram eval-slice rule == docs_decontaminate; the
# PACK_SEQ_LEN window == docs_pack_sequences), and the oracle is ONE pure
# SQL CTE chain over the raw parquet — a full cross-engine check of the
# composed pipeline, not of any staged fixture. Scale shape: stage totals
# are shuffle-free tree combines; the dedup keep-list is painted back with
# a hash-partitioned join on doc_id (keeper cardinality grows with the
# corpus — never broadcast); each stage recomputes its upstream lazily
# here (bounded corpus), where a production run would write each stage
# through the resumable sink (state/lineage.py) and resume per stage.
# NOTE the 2_exact_dedup stage drops 0 docs on the synthetic sf corpora
# (they contain no exact-duplicate texts) — the stage still executes its
# full distributed path and the oracle asserts the no-op.
# ---------------------------------------------------------------------------

TRAINPREP_MIN_TOKENS = 30


def docs_training_prep(sf_dir: str):
    import pyarrow.compute as pc
    import ray

    from ..hashing import text_hash_u64
    from ..stages import decontam as DC
    from .joins import hash_join
    from .relational import sorted_group_agg, tree_group_sum

    def totals(stage_ds, stage: str) -> tuple[str, int, int]:
        def cnt(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "k": pa.array([0], type=pa.int64()),
                    "n": pa.array([b.num_rows], type=pa.int64()),
                    "tok": pa.array([int(pc.sum(b["n_tokens"]).as_py() or 0)], type=pa.int64()),
                }
            )

        df = tree_group_sum(stage_ds.map_batches(cnt, batch_format="pyarrow"), ["k"], value_cols=["n", "tok"])
        return (stage, int(df["n"].sum()), int(df["tok"].sum()))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def with_tokens(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern_regex(b["text"], r"\s+")).cast(pa.int64())
        return b.append_column("n_tokens", n)

    base = ds.map_batches(with_tokens, batch_format="pyarrow")
    f1 = base.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_tokens"], pa.scalar(TRAINPREP_MIN_TOKENS, type=pa.int64()))),
        batch_format="pyarrow",
    )

    # exact dedup: content-hash group-min via sorted_group_agg; the keeper
    # ids ARE the kept docs, painted back with a hash join on doc_id
    def add_hash(b: pa.Table) -> pa.Table:
        return pa.table(
            {"h": pa.array(text_hash_u64(b["text"]).view(np.int64)), "doc_id": b["doc_id"]}
        )

    keepers = sorted_group_agg(f1.map_batches(add_hash, batch_format="pyarrow"), "h", {"doc_id": "min"})
    kept_ids = keepers.map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    # checkpoint the deduped corpus: four consumers read d2 (stage totals,
    # eval grams, train probe, clean paint) and lazy recompute would re-run
    # the sort+join chain for each — materialize() is the in-sandbox
    # stand-in for writing the stage through the resumable sink
    # (state/lineage.py) as a production run would
    d2 = hash_join(f1, kept_ids, on="doc_id").materialize()

    # decontamination over the deduped survivors: pinned eval slice,
    # eval-gram set broadcast once, train docs with any hit dropped —
    # the surviving training set excludes the eval slice itself
    def is_eval(b: pa.Table) -> np.ndarray:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (did * np.uint64(KNUTH_MULT)) & np.uint64(0xFFFFFFFF)
        return (h % np.uint64(100)) < np.uint64(EVAL_PCT)

    eval_ds = d2.map_batches(lambda b: b.filter(pa.array(is_eval(b))), batch_format="pyarrow")
    train_ds = d2.map_batches(lambda b: b.filter(pa.array(~is_eval(b))), batch_format="pyarrow").materialize()
    grams = DC.gram_set_exact(eval_ds, "text", k=DECONTAM_K)
    counts = DC.contamination_counts(train_ds, ray.put(grams), "text", "doc_id", k=DECONTAM_K)
    clean_ids = counts.filter(expr="n_hits == 0").map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )
    d3 = hash_join(train_ds, clean_ids, on="doc_id")

    rows = [
        totals(base, "0_input"),
        totals(f1, "1_token_filter"),
        totals(d2, "2_exact_dedup"),
        totals(d3, "3_decontam"),
    ]
    tok3 = rows[-1][2]
    rows.append(("4_sequences", (tok3 + PACK_SEQ_LEN - 1) // PACK_SEQ_LEN, tok3))
    out = pd.DataFrame(rows, columns=["stage", "n_docs", "n_tokens"]).astype(
        {"n_docs": "int64", "n_tokens": "int64"}
    )
    return out.sort_values("stage").reset_index(drop=True)


DOCS_TRAINING_PREP_SQL = f"""
WITH base AS (
  SELECT doc_id, text, CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
f1 AS (SELECT * FROM base WHERE n_tokens >= {TRAINPREP_MIN_TOKENS}),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM f1 GROUP BY text),
d2 AS (SELECT f1.* FROM f1 JOIN keepers USING (doc_id)),
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w,
         ((doc_id * {KNUTH_MULT}) % 4294967296) % 100 < {EVAL_PCT} AS is_eval
  FROM d2
),
g AS (
  SELECT doc_id, is_eval,
         CASE WHEN len(w) >= {DECONTAM_K} THEN array_to_string(w[i:i+{DECONTAM_K - 1}], ' ')
              ELSE COALESCE(array_to_string(w, ' '), '') END AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= {DECONTAM_K} THEN range(1, len(w) - {DECONTAM_K - 2})
                         ELSE [CAST(1 AS BIGINT)] END) AS t(i)
),
eg AS (SELECT DISTINCT gram FROM g WHERE is_eval),
dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN eg ON g.gram = eg.gram WHERE NOT g.is_eval),
d3 AS (
  SELECT d2.* FROM d2 JOIN toks USING (doc_id)
  WHERE NOT toks.is_eval AND doc_id NOT IN (SELECT doc_id FROM dirty)
),
stages AS (
  SELECT '0_input' AS stage, COUNT(*) AS n_docs, COALESCE(SUM(n_tokens), 0) AS n_tokens FROM base
  UNION ALL SELECT '1_token_filter', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM f1
  UNION ALL SELECT '2_exact_dedup', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM d2
  UNION ALL SELECT '3_decontam', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM d3
  UNION ALL SELECT '4_sequences',
            (COALESCE(SUM(n_tokens), 0) + {PACK_SEQ_LEN - 1}) // {PACK_SEQ_LEN},
            COALESCE(SUM(n_tokens), 0) FROM d3
)
SELECT stage, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens
FROM stages ORDER BY stage
"""


# ---------------------------------------------------------------------------
# JSONL ingest/egress round-trip — LLM training corpora ship as
# newline-delimited JSON, so the engine must read/write it losslessly. The
# corpus goes parquet -> distributed JSONL shards -> read_json -> per-lang
# rollup with a doc_id checksum column; the oracle computes the SAME rollup
# from the original parquet, so any row lost, duplicated, or text-mangled
# by the JSON codec breaks the hash. Shard count = input blocks (resumable
# one-file-per-shard layout, same rule as the parquet sink).
# ---------------------------------------------------------------------------

def docs_jsonl_roundtrip(sf_dir: str):
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd

    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    out_dir = tempfile.mkdtemp(prefix="graft_jsonl_")
    ds.write_json(out_dir)
    back = rd.read_json(out_dir)

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern_regex(batch["text"], r"\s+")).cast(pa.int64())
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pandas(),
                "t": toks.to_pandas(),
                "d": batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).agg(
                n_docs=("t", "size"), total_tokens=("t", "sum"), sum_doc_id=("d", "sum")
            ),
            preserve_index=False,
        )

    df = tree_group_sum(
        back.map_batches(partial, batch_format="pyarrow"), ["lang"],
        value_cols=["n_docs", "total_tokens", "sum_doc_id"],
    )
    df = df.astype({c: "int64" for c in ["n_docs", "total_tokens", "sum_doc_id"]})
    return df.sort_values("lang").reset_index(drop=True)


DOCS_JSONL_ROUNDTRIP_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Text normalization — the first stage of every LLM prep pipeline:
# lowercase, strip to [a-z0-9 ], collapse whitespace runs, trim. One
# vectorized Arrow regex chain per batch; the SAME pinned regexes run in
# DuckDB (RE2 semantics both sides), and the normalized TEXT itself is a
# result column — string equality is the check, like span_signature. The
# lowercase step is Unicode-fold-sensitive in general; this corpus is pure
# ASCII (verified), and any non-ASCII survivor of lower() is stripped by
# the [^a-z0-9\s] pass on both engines anyway.
# ---------------------------------------------------------------------------

def docs_text_normalize(sf_dir: str):
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, r"[^a-z0-9\s]", "")
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        toks = pc.if_else(
            pc.equal(t, ""), pa.scalar(0, pa.int64()),
            pc.list_value_length(pc.split_pattern(t, " ")).cast(pa.int64()),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "norm_text": t,
                "n_tokens": toks,
                "n_chars": pc.utf8_length(t).cast(pa.int64()),
            }
        )

    df = ds.map_batches(norm, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


DOCS_TEXT_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                             '\\s+', ' ', 'g')) AS t
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, t AS norm_text,
       CAST(CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS BIGINT) AS n_tokens,
       CAST(length(t) AS BIGINT) AS n_chars
FROM n ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Incremental aggregation — the snapshot-delta pattern: yesterday's totals
# (docs with doc_id % 10 != 0, the "previous snapshot") plus a delta pass
# that SCANS ONLY THE NEW DOCS, merged per group — never recomputing the
# base. The oracle computes the full totals directly, so base + delta ==
# full is the checked identity. At 100 TB this is the difference between
# re-reading the corpus daily and reading 1% of it.
# ---------------------------------------------------------------------------

def docs_incremental_lang_totals(sf_dir: str):
    import pyarrow.compute as pc

    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(where: str):
        def f(batch: pa.Table) -> pa.Table:
            did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mask = (did % 10 == 0) if where == "new" else (did % 10 != 0)
            t = batch.filter(pa.array(mask))
            toks = pc.list_value_length(pc.split_pattern_regex(t["text"], r"\s+")).cast(pa.int64())
            df = pd.DataFrame({"lang": t["lang"].to_pandas(), "t": toks.to_pandas()})
            return pa.Table.from_pandas(
                df.groupby("lang", as_index=False).agg(n_docs=("t", "size"), total_tokens=("t", "sum")),
                preserve_index=False,
            )
        return f

    base = tree_group_sum(ds.map_batches(partial("old"), batch_format="pyarrow"),
                          ["lang"], value_cols=["n_docs", "total_tokens"])
    delta = tree_group_sum(ds.map_batches(partial("new"), batch_format="pyarrow"),
                           ["lang"], value_cols=["n_docs", "total_tokens"])
    # base + delta merge: group count = languages, a driver-sized frame
    out = (
        pd.concat([base, delta], ignore_index=True)
        .groupby("lang", as_index=False).sum()
        .astype({"n_docs": "int64", "total_tokens": "int64"})
    )
    return out.sort_values("lang").reset_index(drop=True)


DOCS_INCREMENTAL_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Exact SimHash Hamming-pair join (pigeonhole band candidates + XOR
# popcount verify, stages/dedup.py::simhash_hamming_pairs). The oracle is
# a fully-SQL quadratic self-join with bit_count(xor(...)) over a staged
# per-doc simhash table (twin kernel) — the pair DEFINITION is engine-
# independent, so the band-bucketing + all-pairs-within-bucket + verify
# path is checked end to end.
# ---------------------------------------------------------------------------

def docs_simhash_hamming_pairs(sf_dir: str):
    from . import oracle_fixtures as OF
    from ..stages.dedup import simhash_hamming_pairs

    OF.stage_docs_simhash_hamming(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = simhash_hamming_pairs(ds, max_hamming=3).to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )
    pk = pairs["pk"].to_numpy(dtype=np.int64)
    out = pd.DataFrame(
        {"doc_a": pk >> np.int64(31), "doc_b": pk & np.int64((1 << 31) - 1),
         "hamming": pairs["hamming"].astype("int64")}
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Data-mix quota sampling — curate a training mix by taking a FIXED
# fraction of each language deterministically (the mixture-reweighting
# shape). Per-lang quota = n_lang // 5; membership = the quota smallest
# (hash, doc_id) per lang, i.e. an exact per-group rank. Rank is the
# two-phase distributed scan (stages/scan.py::ordered_prefix_sum) over a
# packed (lang_idx | hash | doc_id) key — rank-within-lang falls out as
# global_rank - per-lang base offset (tiny lang table, broadcast once).
# No per-group sort, no whole-lang bucket. Fully cross-engine: the oracle
# is ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hash, doc_id).
# ---------------------------------------------------------------------------

QUOTA_MIX_DENOM = 5  # keep 1/5 of each language


def docs_lang_quota_mix(sf_dir: str):
    import ray

    from ..stages.scan import ordered_prefix_sum
    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def lang_partial(b: pa.Table) -> pa.Table:
        out = (
            b.to_pandas().groupby("lang", as_index=False).size().rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    lt = tree_group_sum(ds.map_batches(lang_partial, batch_format="pyarrow"), ["lang"], value_cols=["n"])
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "lang": pd.Series([], dtype=str)})
    if lt.empty:
        return empty
    lt = lt.sort_values("lang").reset_index(drop=True)
    if len(lt) >= 256:
        raise ValueError("docs_lang_quota_mix packs lang_idx into 8 bits — >=256 languages needs a wider key")
    langs = lt["lang"].to_numpy()
    n_l = lt["n"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_l)[:-1]])  # rows in all smaller lang_idx
    quotas = n_l // QUOTA_MIX_DENOM
    mix_ref = ray.put((langs, offsets, quotas))

    def key(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (did >= (1 << 23)).any() or (did < 0).any():
            raise ValueError(
                "docs_lang_quota_mix packs doc_id into 23 bits — widen to a "
                "2-column rank key past 8.4M ids"
            )
        import ray as _ray

        v, _, _ = _ray.get(mix_ref)
        li = np.searchsorted(v, b["lang"].to_numpy(zero_copy_only=False)).astype(np.int64)
        hv = ((did.astype(np.uint64) * np.uint64(KNUTH_MULT)) % np.uint64(1 << 32)).astype(np.int64)
        k = (li << np.int64(55)) | (hv << np.int64(23)) | did
        return pa.table({"k": pa.array(k), "one": pa.array(np.ones(len(k), dtype=np.int64))})

    keyed = ds.map_batches(key, batch_format="pyarrow")
    n = ds.count()
    max_k = ((len(lt) - 1) << 55) | (((1 << 32) - 1) << 23) | ((1 << 23) - 1)
    bw = max(max_k // max(n // 4096, 64), 1)
    scanned = ordered_prefix_sum(keyed, "k", "one", bucket_width=bw)

    def finish(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, off, q = _ray.get(mix_ref)
        k = b["k"].to_numpy(zero_copy_only=False)
        li = (k >> np.int64(55)).astype(np.int64)
        rank = b["cum"].to_numpy(zero_copy_only=False) - off[li]  # 1-based within lang
        keep = rank <= q[li]
        did = (k & np.int64((1 << 23) - 1))[keep]
        return pa.table(
            {"doc_id": pa.array(did, type=pa.int64()),
             "lang": pa.array(v[li[keep]], type=pa.string())}
        )

    out = scanned.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})


DOCS_LANG_QUOTA_MIX_SQL = f"""
WITH q AS (SELECT lang, COUNT(*) // {QUOTA_MIX_DENOM} AS quota FROM documents GROUP BY lang),
r AS (SELECT doc_id, lang,
        ROW_NUMBER() OVER (
          PARTITION BY lang
          ORDER BY (doc_id * {KNUTH_MULT}) % 4294967296, doc_id) AS rk
      FROM documents)
SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
WHERE rk <= quota ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Grouped exact median — per-language median document length, the grouped
# order-statistic the global-quantile and per-user-median queries don't
# cover: the exact k-th element PER GROUP without a per-group sort or a
# whole-group bucket. Same machinery as the quota mix: pack
# (lang_idx | value | doc_id) -> ONE two-phase distributed rank scan ->
# keep the row whose within-group rank equals (n_lang + 1) // 2 (lower
# median, pinned). The oracle is the native ROW_NUMBER counterpart.
# ---------------------------------------------------------------------------

def docs_lang_median_chars(sf_dir: str):
    import ray

    from ..stages.scan import ordered_prefix_sum
    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def lang_partial(b: pa.Table) -> pa.Table:
        out = b.to_pandas().groupby("lang", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(out, preserve_index=False)

    lt = tree_group_sum(ds.map_batches(lang_partial, batch_format="pyarrow"), ["lang"], value_cols=["n"])
    empty = pd.DataFrame({"lang": pd.Series([], dtype=str), "median_chars": pd.Series([], dtype="int64")})
    if lt.empty:
        return empty
    lt = lt.sort_values("lang").reset_index(drop=True)
    if len(lt) >= 256:
        raise ValueError("docs_lang_median_chars packs lang_idx into 8 bits — widen the key past 255 langs")
    langs = lt["lang"].to_numpy()
    n_l = lt["n"].to_numpy(dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_l)[:-1]])
    target = (n_l + 1) // 2  # lower median rank, 1-based
    mref = ray.put((langs, offsets, target))

    def key(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (did >= (1 << 23)).any() or (did < 0).any() or (nc >= (1 << 24)).any() or (nc < 0).any():
            raise ValueError(
                "docs_lang_median_chars pack bounds: doc_id < 2^23 and n_chars < 2^24 "
                "— widen to a 2-column rank key past those"
            )
        import ray as _ray

        v, _, _ = _ray.get(mref)
        li = np.searchsorted(v, b["lang"].to_numpy(zero_copy_only=False)).astype(np.int64)
        k = (li << np.int64(47)) | (nc << np.int64(23)) | did
        return pa.table({"k": pa.array(k), "one": pa.array(np.ones(len(k), dtype=np.int64))})

    keyed = ds.map_batches(key, batch_format="pyarrow")
    n = ds.count()
    max_k = ((len(lt) - 1) << 47) | (((1 << 24) - 1) << 23) | ((1 << 23) - 1)
    bw = max(max_k // max(n // 4096, 64), 1)
    scanned = ordered_prefix_sum(keyed, "k", "one", bucket_width=bw)

    def finish(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, off, tgt = _ray.get(mref)
        k = b["k"].to_numpy(zero_copy_only=False)
        li = (k >> np.int64(47)).astype(np.int64)
        rank = b["cum"].to_numpy(zero_copy_only=False) - off[li]
        keep = rank == tgt[li]
        nc = ((k >> np.int64(23)) & np.int64((1 << 24) - 1))[keep]
        return pa.table(
            {"lang": pa.array(v[li[keep]], type=pa.string()),
             "median_chars": pa.array(nc, type=pa.int64())}
        )

    out = scanned.map_batches(finish, batch_format="pyarrow").to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


DOCS_LANG_MEDIAN_CHARS_SQL = """
WITH q AS (SELECT lang, (COUNT(*) + 1) // 2 AS tgt FROM documents GROUP BY lang),
r AS (SELECT lang, n_chars, doc_id,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk
      FROM documents)
SELECT r.lang, CAST(r.n_chars AS BIGINT) AS median_chars
FROM r JOIN q USING (lang) WHERE rk = tgt ORDER BY r.lang
"""


# ---------------------------------------------------------------------------
# Curation funnel — the standard corpus-cleaning report: how many docs
# survive each successive pinned filter (raw -> min length -> min token
# count -> ascii-only). One pass, vectorized cumulative masks per batch,
# 4-row shuffle-free tree combine; every predicate is a pinned expression
# evaluated identically in SQL.
# ---------------------------------------------------------------------------

FUNNEL_MIN_CHARS = 100
FUNNEL_MIN_TOKENS = 15


def docs_curation_funnel(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nc = b["n_chars"].to_numpy(zero_copy_only=False)
        s0 = np.ones(len(nc), dtype=bool)
        s1 = s0 & (nc >= FUNNEL_MIN_CHARS)
        # token count by the shared split convention, vectorized: non-empty
        # tokens per doc via the exploded frame's cython groupby
        t = _doc_terms(b, distinct=False)
        cnt = t.groupby("doc_id").size()
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        ntok = cnt.reindex(did, fill_value=0).to_numpy()
        s2 = s1 & (ntok >= FUNNEL_MIN_TOKENS)
        # ascii iff utf8 byte length == codepoint length (no per-row Python)
        sarr = pc.cast(b["text"], pa.string())
        is_ascii = pc.equal(
            pc.binary_length(sarr.cast(pa.binary())), pc.utf8_length(sarr)
        ).to_numpy(zero_copy_only=False)
        s3 = s2 & is_ascii
        out = pd.DataFrame(
            {
                "stage": ["0_raw", "1_min_chars", "2_min_tokens", "3_ascii"],
                "n_surviving": [int(s0.sum()), int(s1.sum()), int(s2.sum()), int(s3.sum())],
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    out = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["stage"], value_cols=["n_surviving"])
    out["n_surviving"] = out["n_surviving"].astype("int64")
    return out.sort_values("stage").reset_index(drop=True)


DOCS_CURATION_FUNNEL_SQL = f"""
WITH m AS (
  SELECT n_chars >= {FUNNEL_MIN_CHARS} AS p1,
         len(list_filter(string_split(text, ' '), w -> w <> '')) >= {FUNNEL_MIN_TOKENS} AS p2,
         text = regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS p3
  FROM documents
)
SELECT stage, n_surviving FROM (
  SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_surviving FROM m
  UNION ALL
  SELECT '1_min_chars', CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL
  SELECT '2_min_tokens', CAST(SUM(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) FROM m
  UNION ALL
  SELECT '3_ascii', CAST(SUM(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) FROM m
) ORDER BY stage
"""


# ---------------------------------------------------------------------------
# Exact substring dedup (round 5) — the ExactSubstr criterion of Lee et
# al. 2022: per-document maximal spans in which EVERY length-L character
# window occurs >= 2 times in the whole corpus (any such span is a union
# of corpus-repeated substrings of length >= L; removing them is the
# suffix-array dedup's removal set). Engine: stages/dedup.py
# dup_substring_spans — window explode (one sliding_window_view per
# batch) -> whole-gram buckets (exact string grouping, keep count >= 2)
# -> whole-doc buckets (one vectorized gaps-and-islands merge). Fully
# cross-engine oracle: DuckDB re-derives the same windows with substr,
# the same >= 2 filter, and the same island merge as a LAG window.
# ---------------------------------------------------------------------------

DUP_SUBSTR_L = 20


def docs_dup_substring_spans(sf_dir: str):
    from ..stages.dedup import dup_substring_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dup_substring_spans(ds, min_len=DUP_SUBSTR_L).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "start": pd.Series([], dtype="int64"),
             "span_len": pd.Series([], dtype="int64")}
        )
    out = out.astype({"doc_id": "int64", "start": "int64", "span_len": "int64"})
    return out.sort_values(["doc_id", "start"]).reset_index(drop=True)


DOCS_DUP_SUBSTRING_SPANS_SQL = f"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - {DUP_SUBSTR_L} + 2)) AS p
  FROM documents WHERE length(text) >= {DUP_SUBSTR_L}
),
w AS (SELECT doc_id, CAST(p AS BIGINT) AS p, substr(text, CAST(p AS INTEGER), {DUP_SUBSTR_L}) AS gram FROM pos),
dup AS (SELECT gram FROM w GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, p FROM w JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, p,
         CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p) <= {DUP_SUBSTR_L}
              THEN 0 ELSE 1 END AS brk
  FROM hits
),
grp AS (
  SELECT doc_id, p,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM isl
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MIN(p) AS BIGINT) AS start,
       CAST(MAX(p) - MIN(p) + {DUP_SUBSTR_L} AS BIGINT) AS span_len
FROM grp GROUP BY doc_id, g ORDER BY doc_id, start
"""


# ---------------------------------------------------------------------------
# Perplexity-bucketed data mix (round 5) — the CCNet/quality-mixing report:
# score every doc by mean unigram surprisal (int64 micro-nats, the
# docs_unigram_surprisal LM), split the corpus into exact QUINTILES with a
# pinned integer rank rule, and report docs/tokens per bucket. ONE corpus
# scan: per-batch partials keyed by the integer score value
# (distinct-value-bounded, far below doc cardinality), thresholds from the
# driver-side cumsum, buckets aggregated from the SAME value table — no
# second pass, no per-doc driver collect. Fully cross-engine.
# ---------------------------------------------------------------------------

def docs_surprisal_mix(sf_dir: str):
    import ray

    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_partial(b: pa.Table) -> pa.Table:
        out = (
            _doc_terms(b, distinct=False)
            .groupby("term", as_index=False).size().rename(columns={"size": "tf"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    tftab = tree_group_sum(
        ds.map_batches(tf_partial, batch_format="pyarrow"), ["term"], value_cols=["tf"]
    )
    empty = pd.DataFrame(
        {"bucket": pd.Series([], dtype="int64"), "n_docs": pd.Series([], dtype="int64"),
         "sum_tokens": pd.Series([], dtype="int64")}
    )
    if tftab.empty:
        return empty
    tftab = tftab.sort_values("term").reset_index(drop=True)
    total = float(tftab["tf"].sum())
    vocab = tftab["term"].to_numpy()
    smic = sql_round(
        -np.log(tftab["tf"].to_numpy(dtype=np.float64) / total) * 1e6
    ).astype(np.int64)
    lm_ref = ray.put((vocab, smic))

    def value_partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, sm = _ray.get(lm_ref)
        t = _doc_terms(b, distinct=False)
        emptyp = pd.DataFrame(
            {"v": pd.Series([], dtype="int64"), "n_docs": pd.Series([], dtype="int64"),
             "sum_tokens": pd.Series([], dtype="int64")}
        )
        if t.empty:
            return pa.Table.from_pandas(emptyp, preserve_index=False)
        t["s"] = sm[np.searchsorted(v, t["term"].to_numpy())]
        g = t.groupby("doc_id").agg(n_tokens=("s", "size"), ssum=("s", "sum")).reset_index()
        g["v"] = sql_round(
            g["ssum"].to_numpy(dtype=np.float64) / g["n_tokens"].to_numpy(dtype=np.float64)
        ).astype(np.int64)
        out = g.groupby("v", as_index=False).agg(
            n_docs=("doc_id", "size"), sum_tokens=("n_tokens", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    vt = tree_group_sum(
        ds.map_batches(value_partial, batch_format="pyarrow"), ["v"],
        value_cols=["n_docs", "sum_tokens"],
    )
    if vt.empty:
        return empty
    vt = vt.sort_values("v").reset_index(drop=True)
    n = int(vt["n_docs"].sum())
    cum = vt["n_docs"].cumsum().to_numpy()
    vals = vt["v"].to_numpy()
    # pinned INTEGER rank rule: threshold k at rank ceil(k*n/5) = (k*n+4)//5
    ths = [vals[np.searchsorted(cum, (k * n + 4) // 5)] for k in (1, 2, 3, 4)]
    bucket = np.zeros(len(vt), dtype=np.int64)
    for t_ in ths:
        bucket += (vals > t_).astype(np.int64)
    vt["bucket"] = bucket
    out = vt.groupby("bucket", as_index=False).agg(
        n_docs=("n_docs", "sum"), sum_tokens=("sum_tokens", "sum")
    )
    return out.astype({"bucket": "int64", "n_docs": "int64", "sum_tokens": "int64"}).sort_values(
        "bucket"
    ).reset_index(drop=True)


DOCS_SURPRISAL_MIX_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tf AS (SELECT term, COUNT(*) AS tf FROM t GROUP BY term),
tot AS (SELECT CAST(SUM(tf) AS DOUBLE) AS total FROM tf),
lm AS (SELECT term,
         CAST(round(-LN(CAST(tf AS DOUBLE) / tot.total) * 1000000, 0) AS BIGINT) AS s
       FROM tf CROSS JOIN tot),
d AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
        CAST(round(CAST(SUM(lm.s) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS v
      FROM t JOIN lm USING (term) GROUP BY t.doc_id),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
th AS (SELECT
  (SELECT v FROM d ORDER BY v LIMIT 1 OFFSET (SELECT (1*n + 4)//5 FROM nn) - 1) AS t1,
  (SELECT v FROM d ORDER BY v LIMIT 1 OFFSET (SELECT (2*n + 4)//5 FROM nn) - 1) AS t2,
  (SELECT v FROM d ORDER BY v LIMIT 1 OFFSET (SELECT (3*n + 4)//5 FROM nn) - 1) AS t3,
  (SELECT v FROM d ORDER BY v LIMIT 1 OFFSET (SELECT (4*n + 4)//5 FROM nn) - 1) AS t4)
SELECT CAST((CASE WHEN v > t1 THEN 1 ELSE 0 END) + (CASE WHEN v > t2 THEN 1 ELSE 0 END)
          + (CASE WHEN v > t3 THEN 1 ELSE 0 END) + (CASE WHEN v > t4 THEN 1 ELSE 0 END) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM d CROSS JOIN th
GROUP BY 1 ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# ExactSubstr REMOVAL step (round 5) — the per-doc outcome of cutting every
# duplicated span found by docs_dup_substring_spans: kept-character count
# per affected doc (spans are disjoint maximal islands by construction, so
# removal size is just their length sum). Oracle = the same islands CTE
# joined back to document lengths — fully cross-engine.
# ---------------------------------------------------------------------------

def docs_dedup_removal_report(sf_dir: str):
    from ..stages.dedup import dup_substring_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    spans = dup_substring_spans(ds, min_len=DUP_SUBSTR_L)

    def roll(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        out = df.groupby("doc_id", as_index=False).agg(
            n_spans=("span_len", "size"), removed=("span_len", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from .relational import sorted_group_agg

    per_doc = spans.map_batches(roll, batch_format="pyarrow")
    agg = sorted_group_agg(
        per_doc, "doc_id", {"n_spans": "sum", "removed": "sum"},
        approx_rows=io.table_num_rows(io.table_path(sf_dir, "documents")),
    ).to_pandas()
    if agg.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "n_spans": pd.Series([], dtype="int64"),
             "removed": pd.Series([], dtype="int64"), "kept": pd.Series([], dtype="int64")}
        )
    lens = _read(sf_dir, "documents", ["doc_id", "n_chars"]).to_pandas()
    out = agg.merge(lens, on="doc_id")
    out["kept"] = out["n_chars"] - out["removed"]
    out = out.drop(columns=["n_chars"]).astype({c: "int64" for c in
                                                ("doc_id", "n_spans", "removed", "kept")})
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_DEDUP_REMOVAL_SQL = f"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - {DUP_SUBSTR_L} + 2)) AS p
  FROM documents WHERE length(text) >= {DUP_SUBSTR_L}
),
w AS (SELECT doc_id, CAST(p AS BIGINT) AS p, substr(text, CAST(p AS INTEGER), {DUP_SUBSTR_L}) AS gram FROM pos),
dup AS (SELECT gram FROM w GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, p FROM w JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, p,
         CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p) <= {DUP_SUBSTR_L}
              THEN 0 ELSE 1 END AS brk
  FROM hits
),
grp AS (
  SELECT doc_id, p,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM isl
),
spans AS (
  SELECT doc_id, MAX(p) - MIN(p) + {DUP_SUBSTR_L} AS span_len
  FROM grp GROUP BY doc_id, g
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(span_len) AS BIGINT) AS removed
  FROM spans GROUP BY doc_id
)
SELECT a.doc_id, a.n_spans, a.removed,
       CAST(d.n_chars - a.removed AS BIGINT) AS kept
FROM agg a JOIN documents d USING (doc_id)
ORDER BY a.doc_id
"""
