"""Text-retrieval / embedding-analytics driver queries (split from
extraqueries.py, round 5): inverted index, BM25, TF-IDF, surprisal, PMI,
BPE pair counts, per-lang term stats, heavy hitters, source overlap,
embedding quantize/centroid/Gram/eigvec, PQ ANN. No behavior change —
defs moved verbatim; oracle-gate re-ran green."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..numerics import sql_round

from .. import io
from .qcommon import KNUTH_MULT, _read


# ---------------------------------------------------------------------------
# Per-group top-k WITHOUT a global sort: each batch keeps its own top-k per
# group (vectorized sort + head), a combine level collapses up to 4096
# partial rows, the driver ranks the tiny survivor set. Shuffle-free — the
# moved volume is O(batches x groups x k), independent of row count.
# ---------------------------------------------------------------------------

def docs_top3_by_lang(sf_dir: str, k: int = 3):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def topk(b) -> pd.DataFrame:
        df = b if isinstance(b, pd.DataFrame) else b.to_pandas()
        df = df.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
        return df.groupby("lang", as_index=False).head(k)

    lvl = ds.map_batches(topk, batch_format="pandas").map_batches(
        topk, batch_format="pandas", batch_size=4096
    )
    df = topk(lvl.to_pandas()).reset_index(drop=True)
    df["rk"] = (df.groupby("lang").cumcount() + 1).astype("int64")
    return df[["lang", "rk", "doc_id", "n_chars"]].sort_values(["lang", "rk"]).reset_index(drop=True)


DOCS_TOP3_BY_LANG_SQL = """
SELECT lang, CAST(rn AS BIGINT) AS rk, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
WHERE rn <= 3 ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# Per-label embedding centroid, exactly: components are quantized to 1e-6
# ints per batch (float32 -> float64 -> round, identical on both engines),
# summed per (label, dim) — exact in any order — and divided by the label
# count with one pinned IEEE expression at the end. Long (label, dim)
# format so the driver's sorted value hash covers every component.
# ---------------------------------------------------------------------------

def embeddings_label_centroid(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # np.stack needs >=1 array; empty blocks happen after repartition
            return pa.table({"label": pa.array([], type=pa.int64()), "dim": pa.array([], type=pa.int64()),
                             "s_q": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())})
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(b["embedding"].to_pandas().to_numpy())  # (rows, dim) float32
        q = sql_round(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        dim = q.shape[1]
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, dim)),
                "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), len(ulab))),
                "s_q": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(cnt, dim)),
            }
        )

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["label", "dim"], value_cols=["s_q", "n"])
    df = df.sort_values(["label", "dim"]).reset_index(drop=True)
    out = pd.DataFrame({"label": df["label"].astype("int64"), "dim": df["dim"].astype("int64")})
    out["n"] = df["n"].astype("int64")
    out["cmean"] = (df["s_q"].astype("float64") / 1_000_000.0) / df["n"].astype("float64")
    return out


EMBEDDINGS_LABEL_CENTROID_SQL = """
WITH comp AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings
)
SELECT label, dim, COUNT(*) AS n,
       (CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / 1000000.0) / CAST(COUNT(*) AS DOUBLE) AS cmean
FROM comp GROUP BY label, dim ORDER BY label, dim
"""


# ---------------------------------------------------------------------------
# Term document-frequency table (the inverted-index / TF-IDF base): one
# vectorized split+explode per batch; df partials are correct to sum
# because every document lives in exactly one batch (rows are documents).
# The moved volume is one row per distinct term per batch — vocabulary-
# bounded, not token-bounded.
# ---------------------------------------------------------------------------

def docs_term_df(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        toks = df.set_index("doc_id")["text"].str.split(" ").explode()
        toks = toks[toks != ""]
        t = toks.reset_index().rename(columns={"text": "term"})
        tf = t.groupby("term", as_index=False).size().rename(columns={"size": "tf"})
        dfreq = t.drop_duplicates().groupby("term", as_index=False).size().rename(columns={"size": "df"})
        out = tf.merge(dfreq, on="term")
        return pa.Table.from_pandas(out, preserve_index=False)

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["term"], value_cols=["tf", "df"])
    df = df.sort_values("term").reset_index(drop=True)
    return df.astype({"tf": "int64", "df": "int64"})[["term", "tf", "df"]]


DOCS_TERM_DF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), t AS (SELECT doc_id, term FROM toks WHERE term <> '')
SELECT term, COUNT(*) AS tf, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM t GROUP BY term ORDER BY term
"""


# ---------------------------------------------------------------------------
# Per-group argmax (mode): vocabulary-bounded (lang, term) counts via the
# shuffle-free tree combine, driver argmax with a pinned tie rule
# (highest count, then lexicographically smallest term).
# ---------------------------------------------------------------------------

def docs_top_term_per_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "text"])
    from .relational import tree_group_sum

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        toks = df.set_index("lang")["text"].str.split(" ").explode()
        toks = toks[toks != ""]
        t = toks.reset_index().rename(columns={"text": "term"})
        t["n"] = 1
        return pa.Table.from_pandas(t.groupby(["lang", "term"], as_index=False).sum(), preserve_index=False)

    df = tree_group_sum(ds.map_batches(partial, batch_format="pyarrow"), ["lang", "term"], value_cols=["n"])
    df = df.sort_values(["lang", "n", "term"], ascending=[True, False, True])
    top = df.groupby("lang", as_index=False).head(1).reset_index(drop=True)
    return pd.DataFrame(
        {"lang": top["lang"], "top_term": top["term"], "n": top["n"].astype("int64")}
    ).sort_values("lang").reset_index(drop=True)


DOCS_TOP_TERM_PER_LANG_SQL = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
), t AS (
  SELECT lang, term, COUNT(*) AS n FROM toks WHERE term <> '' GROUP BY 1, 2
), r AS (
  SELECT lang, term, n, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn FROM t
)
SELECT lang, term AS top_term, CAST(n AS BIGINT) AS n FROM r WHERE rn = 1 ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Frequent n-gram mining (boilerplate/template detection): every 5-word
# window whose content occurs >= T times corpus-wide, with its exact count.
# Threshold form, not top-k — no tie plateau at the cutoff, so the oracle
# is a plain GROUP BY ... HAVING. Two passes: (1) count by 64-bit gram-fold
# hash (sorted_group_agg — nearly-unique key space), survivors (tiny by
# construction) collected + broadcast; (2) gram TEXT is rebuilt only for
# survivor hits (a per-hit loop bounded by survivor occurrences, not corpus
# size) — full gram strings never shuffle. Short docs emit the pinned
# whole-doc gram (decontam kernel rule).
# ---------------------------------------------------------------------------

FREQ_NGRAM_K = 5
FREQ_NGRAM_MIN = 2


def docs_frequent_ngrams(sf_dir: str):
    import ray

    from ..stages.sketch import gram_hash_flat
    from .relational import sorted_group_agg

    K, T = FREQ_NGRAM_K, FREQ_NGRAM_MIN
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_partial(b: pa.Table) -> pa.Table:
        g, _, _ = gram_hash_flat(b["text"], K)
        part = pd.DataFrame({"h": g.view(np.int64)})
        part = part.groupby("h", as_index=False).size().rename(columns={"size": "m"})
        return pa.table(
            {
                "h": pa.array(part["h"].to_numpy(dtype=np.int64), type=pa.int64()),
                "m": pa.array(part["m"].to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    totals = sorted_group_agg(ds.map_batches(gram_partial, batch_format="pyarrow"), "h", {"m": "sum"})
    surv_df = totals.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b["m"], T)), batch_format="pyarrow"
    ).to_pandas()
    if len(surv_df) == 0:
        return pd.DataFrame({"gram": pd.Series([], dtype="object"), "cnt": pd.Series([], dtype="int64")})
    surv = np.sort(surv_df["h"].to_numpy(dtype=np.int64))
    surv_ref = ray.put(surv)

    def extract(b: pa.Table) -> pa.Table:
        sv = ray.get(surv_ref)
        g, go, docidx = gram_hash_flat(b["text"], K)
        gi = g.view(np.int64)
        pos = np.searchsorted(sv, gi)
        hit = (pos < len(sv)) & (sv[np.clip(pos, 0, len(sv) - 1)] == gi)
        idx = np.flatnonzero(hit)
        if len(idx) == 0:
            return pa.table({"h": pa.array([], type=pa.int64()), "gram": pa.array([], type=pa.string())})
        texts = b["text"].to_pandas()
        words_cache: dict[int, list[str]] = {}
        out_h, out_t = [], []
        # survivor-occurrence loop (bounded by the broadcast survivor set's
        # hits in this batch, not by corpus size)
        for i in idx.tolist():
            d = int(docidx[i])
            if d not in words_cache:
                t = texts.iloc[d]
                words_cache[d] = [w for w in t.split(" ") if w != ""] if isinstance(t, str) else []
            words = words_cache[d]
            p = i - int(go[d])
            gram = " ".join(words[p : p + K]) if len(words) >= K else " ".join(words)
            out_h.append(int(gi[i]))
            out_t.append(gram)
        df = pd.DataFrame({"h": out_h, "gram": out_t}).drop_duplicates("h")
        return pa.Table.from_pandas(df, preserve_index=False)

    texts_df = ds.map_batches(extract, batch_format="pyarrow").to_pandas().drop_duplicates("h")
    out = texts_df.merge(surv_df.rename(columns={"m": "cnt"}), on="h")[["gram", "cnt"]]
    return out.sort_values("gram").reset_index(drop=True).astype({"cnt": "int64"})


DOCS_FREQUENT_NGRAMS_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w FROM documents),
g AS (
  SELECT CASE WHEN len(w) >= {FREQ_NGRAM_K} THEN array_to_string(w[i:i+{FREQ_NGRAM_K - 1}], ' ')
              ELSE COALESCE(array_to_string(w, ' '), '') END AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= {FREQ_NGRAM_K} THEN range(1, len(w) - {FREQ_NGRAM_K - 2})
                         ELSE [CAST(1 AS BIGINT)] END) AS t(i)
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY gram HAVING COUNT(*) >= {FREQ_NGRAM_MIN}
ORDER BY gram
"""


# ---------------------------------------------------------------------------
# Inverted index over word bigrams: the posting-list build every retrieval
# / dedup-audit pipeline needs. Per batch, adjacent-word bigrams explode
# vectorized (each doc lives in one batch, so batch-local distinct
# (gram, doc_id) pairs are globally distinct); the posting lists assemble
# inside bucketed_key_apply — whole grams hash-bucket into a BOUNDED group
# count, and the per-gram ','.join is per OUTPUT row (the stage's own
# cardinality, the chunker convention), never a per-token loop. Posting
# lists ship as comma-joined doc_id strings sorted ascending — exactly
# reproducible by string_agg ORDER BY in the oracle.
# ---------------------------------------------------------------------------


def _bigram_pairs(b: pa.Table) -> pd.DataFrame:
    """Distinct (gram, doc_id) bigram pairs of one batch, vectorized:
    split+explode, then adjacent pairs via a shifted concat within docs."""
    df = b.to_pandas()
    toks = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
    toks = toks[toks != ""]
    if len(toks) == 0:
        return pd.DataFrame({"gram": pd.Series([], dtype=object),
                             "doc_id": pd.Series([], dtype="int64")})
    t = toks.reset_index().rename(columns={"text": "w"})
    nxt_w = t["w"].shift(-1)
    same_doc = t["doc_id"].eq(t["doc_id"].shift(-1))
    pairs = pd.DataFrame({
        "gram": t["w"].str.cat(nxt_w, sep=" ")[same_doc],
        "doc_id": t["doc_id"][same_doc],
    })
    return pairs.drop_duplicates()


def docs_inverted_index(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    pairs = ds.map_batches(
        lambda b: pa.Table.from_pandas(_bigram_pairs(b), preserve_index=False),
        batch_format="pyarrow",
    )

    def postings_kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype="int64"),
                                 "postings": pd.Series([], dtype=object)})
        g = g.sort_values(["gram", "doc_id"])
        ids = g["doc_id"].to_numpy().astype("U")  # one vectorized int->str
        out = (
            pd.DataFrame({"gram": g["gram"].to_numpy(), "_id": ids})
            .groupby("gram", as_index=False)
            .agg(df=("_id", "size"), postings=("_id", ",".join))
        )
        out["df"] = out["df"].astype("int64")
        return out

    idx = bucketed_key_apply(pairs, "gram", postings_kernel, num_buckets=64)
    out = idx.to_pandas()  # vocabulary-bounded (grams), not corpus-bounded
    return out.sort_values("gram").reset_index(drop=True)


DOCS_INVERTED_INDEX_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS gram
  FROM toks, UNNEST(CASE WHEN len(w) >= 2 THEN range(1, len(w))
                         ELSE CAST([] AS BIGINT[]) END) AS t(i)
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM g GROUP BY gram ORDER BY gram
"""


# ---------------------------------------------------------------------------
# BM25 top-k retrieval for a pinned term query (Robertson-Sparck Jones
# k1/b form): the scoring pass every retrieval-quality pipeline runs over
# a corpus. Two passes, both shuffle-free: (1) corpus stats — N, total
# length, per-query-term document frequencies — as integer tree-combine
# partials; (2) per-doc scores vectorized (tf via split/explode equality,
# never substring matching), batch-local top-k, driver final top-k over
# batches x k rows. The score is ONE pinned IEEE expression (term order
# hash, join, scan; ln via libm on both engines) rounded to 6 dp per the
# module convention; ties at the rounded score break by doc_id in both
# engines.
# ---------------------------------------------------------------------------

BM25_TERMS = ("hash", "join", "scan")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def docs_bm25_topk(sf_dir: str):
    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_frame(b: pa.Table) -> pd.DataFrame:
        """Per-doc (dl, tf_<term>...) — vectorized split/explode."""
        df = b.to_pandas()
        toks = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        toks = toks[toks != ""]
        base = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()}).set_index("doc_id")
        base["dl"] = toks.groupby(level=0).size().reindex(base.index, fill_value=0)
        for t in BM25_TERMS:
            base[f"tf_{t}"] = (
                (toks == t).groupby(level=0).sum().reindex(base.index, fill_value=0)
            )
        return base.reset_index().astype("int64")

    def stats_partial(b: pa.Table) -> pa.Table:
        f = b.to_pandas()  # already the per-doc tf table
        row = {"k": [0], "n_docs": [len(f)], "sum_len": [int(f["dl"].sum())]}
        for t in BM25_TERMS:
            row[f"df_{t}"] = [int((f[f"tf_{t}"] > 0).sum())]
        return pa.table({c: pa.array(v, type=pa.int64()) for c, v in row.items()})

    # tokenize ONCE: the per-doc integer tf table feeds both the stats
    # pass and the scoring pass (split/explode is the dominant cost)
    tfds = ds.map_batches(
        lambda b: pa.Table.from_pandas(tf_frame(b), preserve_index=False),
        batch_format="pyarrow",
    ).materialize()

    st = tree_group_sum(tfds.map_batches(stats_partial, batch_format="pyarrow"), ["k"],
                        value_cols=["n_docs", "sum_len"] + [f"df_{t}" for t in BM25_TERMS])
    n = float(st["n_docs"].sum())
    if n == 0:  # empty corpus: the oracle returns 0 rows, not a div-by-zero
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    # zero-word corpus (every doc empty/whitespace): avgdl would be 0 and
    # dl/avgdl = 0/0 = NaN, which pandas sorts LAST but DuckDB's DESC
    # sorts FIRST (review finding). tf is necessarily 0 everywhere, so any
    # positive avgdl gives the same 0.0 scores — pin 1.0 on both engines.
    avgdl = (float(st["sum_len"].sum()) / n) or 1.0
    idf = {t: float(np.log((n - float(st[f"df_{t}"].sum()) + 0.5)
                           / (float(st[f"df_{t}"].sum()) + 0.5) + 1.0))
           for t in BM25_TERMS}

    def score_topk(b: pa.Table) -> pa.Table:
        f = b.to_pandas()  # already the per-doc tf table
        dl = f["dl"].to_numpy(dtype=np.float64)
        score = np.zeros(len(f))
        for t in BM25_TERMS:  # pinned term order = pinned FP summation order
            tf = f[f"tf_{t}"].to_numpy(dtype=np.float64)
            score = score + idf[t] * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
            )
        f["score"] = sql_round(score * 1e6) / 1e6
        top = f.sort_values(["score", "doc_id"], ascending=[False, True]).head(BM25_TOPK)
        return pa.Table.from_pandas(top[["doc_id", "score"]], preserve_index=False)

    cand = tfds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["score", "doc_id"], ascending=[False, True]).head(BM25_TOPK)
    return out.reset_index(drop=True)


def _bm25_sql() -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"COUNT(*) FILTER (WHERE tf_{t} > 0) AS df_{t}" for t in BM25_TERMS
    )
    score_terms = " + ".join(
        f"ln((CAST(s.n AS DOUBLE) - s.df_{t} + 0.5)/(s.df_{t} + 0.5) + 1.0)"
        f" * (CAST(tf.tf_{t} AS DOUBLE) * ({BM25_K1} + 1.0))"
        f" / (CAST(tf.tf_{t} AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * "
        f"(CAST(tf.dl AS DOUBLE) / (CASE WHEN s.sum_len = 0 THEN 1.0 "
        f"ELSE CAST(s.sum_len AS DOUBLE)/CAST(s.n AS DOUBLE) END))))"
        for t in BM25_TERMS
    )
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS w
  FROM documents
), tf AS (
  SELECT doc_id, len(w) AS dl,
         {tf_cols}
  FROM toks
), s AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sum_len, {df_cols} FROM tf
)
SELECT doc_id, round({score_terms}, 6) AS score
FROM tf, s
ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
"""


DOCS_BM25_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# Int8 scalar quantization of the embedding table (the compression step
# before shipping vectors to an ANN index): pass 1 computes per-dimension
# min/max over 1e-6-quantized components as two shuffle-free min/max
# combine levels (64 dims — the HLL register pattern with min+max instead
# of max); pass 2 emits the LONG (vec_id, dim, code) table, codes from ONE
# pinned IEEE expression — (q - mn)/(mx - mn)*255, rounded half-away —
# evaluated identically in DuckDB, so the value hash covers every code.
# Degenerate dimensions (mx == mn) pin code = 0 on both engines.
# ---------------------------------------------------------------------------


def embeddings_quantize(sf_dir: str):
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def minmax_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"dim": pa.array([], type=pa.int64()),
                             "mn": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64())})
        emb = np.stack(b["embedding"].to_pandas().to_numpy())
        q = sql_round(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        d = q.shape[1]
        return pa.table({"dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                         "mn": pa.array(q.min(axis=0)),
                         "mx": pa.array(q.max(axis=0))})

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("dim", as_index=False).agg(mn=("mn", "min"), mx=("mx", "max"))

    lvl = ds.map_batches(minmax_partial, batch_format="pyarrow")
    lvl = lvl.map_batches(combine, batch_format="pandas", batch_size=4096)
    lvl = lvl.map_batches(combine, batch_format="pandas", batch_size=4096)
    mm = combine(lvl.to_pandas()).sort_values("dim")
    mn = mm["mn"].to_numpy(dtype=np.int64)
    mx = mm["mx"].to_numpy(dtype=np.int64)
    mm_ref = ray.put((mn, mx))

    def codes(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "code": pa.array([], type=pa.int64())})
        _mn, _mx = ray.get(mm_ref)
        emb = np.stack(b["embedding"].to_pandas().to_numpy())
        q = sql_round(emb.astype(np.float64) * 1_000_000.0).astype(np.int64)
        rng = (_mx - _mn).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            c = sql_round((q - _mn).astype(np.float64) / rng * 255.0)
        c = np.where(_mx > _mn, c, 0.0).astype(np.int64)
        n, d = q.shape
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vec_id": pa.array(np.repeat(vid, d)),
                         "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
                         "code": pa.array(c.reshape(-1))})

    out = ds.map_batches(codes, batch_format="pyarrow").to_pandas()
    return out.sort_values(["vec_id", "dim"]).reset_index(drop=True)


EMBEDDINGS_QUANTIZE_SQL = """
WITH comp AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings
), mm AS (
  SELECT dim, MIN(q) AS mn, MAX(q) AS mx FROM comp GROUP BY dim
)
SELECT c.vec_id, c.dim,
       CASE WHEN m.mx > m.mn
            THEN CAST(round(CAST(c.q - m.mn AS DOUBLE) / CAST(m.mx - m.mn AS DOUBLE) * 255.0) AS BIGINT)
            ELSE 0 END AS code
FROM comp c JOIN mm m ON m.dim = c.dim
ORDER BY c.vec_id, c.dim
"""


# ---------------------------------------------------------------------------
# Heavy hitters via mergeable Misra-Gries summaries + exact recount (the
# bounded-state alternative to docs_frequent_ngrams' full-cardinality
# shuffle). Pass 1 builds a <=HH_K-counter MG summary per block (exact
# block counts, then subtract the (k+1)-th largest and keep positive —
# the optimal MG summary of the block, error <= n_b/(k+1)); summaries
# tree-combine with the Agarwal et al. "Mergeable Summaries" rule (sum
# per term, re-truncate), which preserves total error <= N/(k+1) under
# ANY merge tree — multi-way included, since (k+1)*d <= surviving mass.
# Every term with true count >= T = N//(HH_K+1)+1 > N/(k+1) therefore
# survives into the final <=HH_K-term summary; pass 2 recounts exactly
# those candidates (broadcast isin filter, tiny tree_group_sum) and the
# >=T filter removes false positives, so the output EQUALS the plain SQL
# groupby-HAVING oracle while only ever shuffling <=HH_K+1 rows per block.
# At 100 TB this is the shape that matters: no term-cardinality shuffle,
# driver sees O(blocks/combine^2 * HH_K) then <=HH_K rows. The "__N "
# sentinel (contains a space, so unreachable by split(' ') tokens)
# carries the token total through the same summary stream.
# ---------------------------------------------------------------------------

HH_K = 63


def _hh_tokens(texts: pd.Series) -> pd.Series:
    toks = texts.fillna("").str.split(" ").explode()
    return toks[(toks != "") & toks.notna()]


def _mg_truncate(real: pd.DataFrame) -> pd.DataFrame:
    """Keep <=HH_K counters: subtract the (k+1)-th largest, drop <=0."""
    if len(real) <= HH_K:
        return real
    top = np.sort(real["c"].to_numpy(dtype=np.int64))[::-1]
    d = int(top[HH_K])
    real = real.assign(c=real["c"].to_numpy(dtype=np.int64) - d)
    return real[real["c"] > 0]


def _mg_combine(b: pd.DataFrame) -> pd.DataFrame:
    g = b.groupby("term", as_index=False)["c"].sum()
    sent = g["term"] == "__N "
    n = int(g.loc[sent, "c"].sum())
    real = _mg_truncate(g[~sent])
    return pd.concat(
        [pd.DataFrame({"term": ["__N "], "c": np.array([n], dtype=np.int64)}), real]
    ).reset_index(drop=True)


def docs_heavy_hitters(sf_dir: str):
    import ray

    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["text"])

    def mg_partial(b: pa.Table) -> pa.Table:
        toks = _hh_tokens(b["text"].to_pandas())
        vc = toks.value_counts()
        real = _mg_truncate(pd.DataFrame({"term": vc.index, "c": vc.to_numpy(dtype=np.int64)}))
        terms = np.concatenate([["__N "], real["term"].to_numpy(dtype=object)])
        cnts = np.concatenate([[np.int64(len(toks))], real["c"].to_numpy(dtype=np.int64)])
        return pa.table({"term": pa.array(terms, pa.string()), "c": pa.array(cnts, pa.int64())})

    lvl = ds.map_batches(mg_partial, batch_format="pyarrow")
    lvl = lvl.map_batches(_mg_combine, batch_format="pandas", batch_size=4096)
    lvl = lvl.map_batches(_mg_combine, batch_format="pandas", batch_size=4096)
    summ = _mg_combine(lvl.to_pandas())

    n_total = int(summ.loc[summ["term"] == "__N ", "c"].iloc[0])
    empty = pd.DataFrame({"term": pd.Series([], dtype="object"), "cnt": pd.Series([], dtype="int64")})
    if n_total == 0:
        return empty
    thresh = n_total // (HH_K + 1) + 1
    cands = np.sort(summ.loc[summ["term"] != "__N ", "term"].to_numpy(dtype=object))
    if len(cands) == 0:
        return empty
    cand_ref = ray.put(pd.Index(cands))

    def recount(b: pa.Table) -> pd.DataFrame:
        toks = _hh_tokens(b["text"].to_pandas())
        vc = toks[toks.isin(ray.get(cand_ref))].value_counts()
        return pd.DataFrame({"term": vc.index.astype(object), "cnt": vc.to_numpy(dtype=np.int64)})

    totals = tree_group_sum(
        ds.map_batches(recount, batch_format="pyarrow"), ["term"], value_cols=["cnt"]
    )
    out = totals[totals["cnt"] >= thresh]
    return out.sort_values("term").reset_index(drop=True).astype({"cnt": "int64"})


DOCS_HEAVY_HITTERS_SQL = f"""
WITH toks AS (SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS term FROM documents),
t AS (SELECT term FROM toks WHERE term <> ''),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t)
SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM t GROUP BY term
HAVING COUNT(*) >= (SELECT n // {HH_K + 1} + 1 FROM n)
ORDER BY term
"""


def ann_pq_topk(sf_dir: str):
    """Product-quantization ANN (Jegou et al. 2011): per-subspace
    deterministic-KMeans codebooks -> uint8 codes + stored norm (32x
    compression at dim=64) -> ADC LUT scan -> exact-cosine re-rank of the
    top-RERANK candidates. Oracle = single-process twin replaying the same
    shared pure kernels whole-array."""
    from ..stages.ann import pq_topk
    from . import oracle_fixtures as OF

    OF.stage_ann_pq_topk(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_tbl = io.read_table_arrow(io.table_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    Q = np.stack([np.asarray(q_tbl["embedding"][i].as_py()) for i in range(3)]).astype(np.float64)
    out = pq_topk(ds, Q, k=5, m=8, ksub=16, rerank=50)
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cos_sim"] = out["cos_sim"].round(6)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# TF-IDF top terms per document — the keyword-extraction / relevance shape.
# Pass A: document frequency per term (vocabulary-bounded partials, no
# shuffle); idf table broadcast ONCE via ray.put. Pass B: per-doc tf +
# score + top-3, exact per batch because a document is one row. The score
# is ONE pinned IEEE expression (tf * ln(N/df) * 1e6, rounded half away)
# evaluated identically in DuckDB, ties broken by term — fully
# cross-engine.
# ---------------------------------------------------------------------------

def _doc_terms(b: pa.Table, distinct: bool) -> pd.DataFrame:
    """THE pinned tokenization rule shared by every term-statistics query
    (tfidf / surprisal / pmi — and mirrored by their SQL oracles'
    string_split + WHERE term <> ''): split on single spaces, drop empty
    tokens, optionally distinct per doc. One definition so the convention
    can never desynchronize across queries."""
    toks = b.to_pandas().set_index("doc_id")["text"].str.split(" ").explode()
    toks = toks[(toks != "") & toks.notna()]
    t = toks.reset_index().rename(columns={"text": "term"})
    return t.drop_duplicates() if distinct else t


def _df_partial(b: pa.Table) -> pa.Table:
    """Per-batch document-frequency partial (docs are rows, so batch-local
    distinct (doc, term) pairs are globally distinct)."""
    out = (
        _doc_terms(b, distinct=True)
        .groupby("term", as_index=False).size().rename(columns={"size": "df"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def docs_tfidf_top3(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from .relational import tree_group_sum

    dftab = tree_group_sum(
        ds.map_batches(_df_partial, batch_format="pyarrow"), ["term"], value_cols=["df"]
    )
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"), "rk": pd.Series([], dtype="int64"),
         "term": pd.Series([], dtype=str), "score": pd.Series([], dtype="int64")}
    )
    if dftab.empty:
        return empty
    n_docs = io.table_num_rows(io.table_path(sf_dir, "documents"))
    dftab = dftab.sort_values("term").reset_index(drop=True)
    vocab = dftab["term"].to_numpy()
    idf = np.log(float(n_docs) / dftab["df"].to_numpy(dtype=np.float64))
    idf_ref = ray.put((vocab, idf))

    def score_batch(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, iv = _ray.get(idf_ref)
        t = _doc_terms(b, distinct=False)
        if t.empty:
            return pa.Table.from_pandas(empty, preserve_index=False)
        tf = t.groupby(["doc_id", "term"], as_index=False).size().rename(columns={"size": "tf"})
        pos = np.searchsorted(v, tf["term"].to_numpy())
        tf["score"] = sql_round(
            tf["tf"].to_numpy(dtype=np.float64) * iv[pos] * 1e6
        ).astype(np.int64)
        tf = tf.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="stable"
        ).reset_index(drop=True)
        rk = tf.groupby("doc_id").cumcount().to_numpy() + 1
        keep = rk <= 3
        out = tf.loc[keep, ["doc_id", "term", "score"]].copy()
        out.insert(1, "rk", rk[keep].astype(np.int64))
        return pa.Table.from_pandas(out, preserve_index=False)

    out = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    out = out.astype({"doc_id": "int64", "rk": "int64", "score": "int64"})
    return out.sort_values(["doc_id", "rk"]).reset_index(drop=True)


DOCS_TFIDF_TOP3_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.term,
         CAST(round(CAST(tf.tf AS DOUBLE)
                    * LN(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS score
       FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, score,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      FROM sc)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, score FROM r
WHERE rk <= 3 ORDER BY doc_id, rk
"""


# ---------------------------------------------------------------------------
# Corpus-LM mean token surprisal per document — the CCNet-style quality
# filter shape (score each doc against a language model fit on the corpus
# itself). Pass A: global unigram counts (vocabulary-bounded, shuffle-free
# tree combine); per-term surprisal quantized ONCE to int64 micro-nats in
# the broadcast table, so the per-doc sum is an ORDER-FREE integer sum —
# no float-accumulation hazard at any parallelism. One float division +
# pinned rounding at the end. Fully cross-engine (DuckDB recomputes the
# LM from raw text).
# ---------------------------------------------------------------------------

def docs_unigram_surprisal(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from .relational import tree_group_sum

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
        {"doc_id": pd.Series([], dtype="int64"), "n_tokens": pd.Series([], dtype="int64"),
         "surprisal": pd.Series([], dtype="float64")}
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

    def score_batch(b: pa.Table) -> pa.Table:
        import ray as _ray

        v, sm = _ray.get(lm_ref)
        t = _doc_terms(b, distinct=False)
        if t.empty:
            return pa.Table.from_pandas(
                pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "n_tokens": pd.Series([], dtype="int64"),
                     "ssum": pd.Series([], dtype="int64")}
                ),
                preserve_index=False,
            )
        t["s"] = sm[np.searchsorted(v, t["term"].to_numpy())]
        g = t.groupby("doc_id").agg(n_tokens=("s", "size"), ssum=("s", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    if g.empty:
        return empty
    surpr = (
        sql_round(g["ssum"].to_numpy(dtype=np.float64) / g["n_tokens"].to_numpy(dtype=np.float64))
        / 1e6
    )
    out = pd.DataFrame(
        {"doc_id": g["doc_id"].astype("int64"), "n_tokens": g["n_tokens"].astype("int64"),
         "surprisal": surpr}
    )
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_UNIGRAM_SURPRISAL_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tf AS (SELECT term, COUNT(*) AS tf FROM t GROUP BY term),
tot AS (SELECT CAST(SUM(tf) AS DOUBLE) AS total FROM tf),
lm AS (SELECT term,
         CAST(round(-LN(CAST(tf AS DOUBLE) / tot.total) * 1000000, 0) AS BIGINT) AS s
       FROM tf CROSS JOIN tot)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(CAST(SUM(lm.s) AS DOUBLE) / COUNT(*), 0) / 1000000.0 AS surprisal
FROM t JOIN lm USING (term)
GROUP BY t.doc_id ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# PMI collocations — pointwise mutual information over within-document
# term co-occurrence (the classic phrase/collocation detector). Per-doc
# DISTINCT term pairs generate vectorized (triu gather per distinct
# per-doc term count — a doc is one row, so batch partials are exact);
# the (term_a, term_b) space is vocabulary^2-bounded, finished by the
# shuffle-free tree combine; doc frequencies read the SAME materialized
# tokenize (the corpus is split exactly once). PMI =
# ln(c_ab * N / (df_a * df_b)) as ONE pinned IEEE expression in int64
# micro-nats; support floor keeps the result stable. Fully cross-engine.
# ---------------------------------------------------------------------------

PMI_MIN_SUPPORT = 5


def docs_term_pmi(sf_dir: str):
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from ..stages.keyapply import bucketed_key_apply, run_all_pairs
    from .relational import tree_group_sum

    # tokenize ONCE: the distinct (doc_id, term) explode is materialized and
    # feeds BOTH the pair partials and the doc-frequency partials. Pair
    # generation needs WHOLE docs, and Ray's output buffer may slice a large
    # tokenize output across blocks at target_max_block_size (arbitrary row
    # boundaries), so the pair pass routes through hash-buckets of doc_id —
    # the shuffle guarantees doc-wholeness (same shape as
    # docs_source_overlap's per-gram buckets). The df pass needs no
    # wholeness: dt is already DISTINCT (doc_id, term), so per-term row
    # counts are exact under any block split.
    dt = ds.map_batches(
        lambda b: pa.Table.from_pandas(_doc_terms(b, distinct=True), preserve_index=False),
        batch_format="pyarrow",
    ).materialize()

    def pair_fn(t: pd.DataFrame) -> pd.DataFrame:
        t = t.sort_values(["doc_id", "term"], kind="stable").reset_index(drop=True)
        terms = t["term"].to_numpy()
        doc = t["doc_id"].to_numpy()
        new = np.ones(len(t), dtype=bool)
        new[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(t)))
        ai, bi = run_all_pairs(starts, lens)
        if len(ai):
            pairs = pd.DataFrame({"term_a": terms[ai], "term_b": terms[bi]})
            return pairs.groupby(["term_a", "term_b"], as_index=False).size().rename(columns={"size": "c_ab"})
        return pd.DataFrame({"term_a": pd.Series([], dtype=str), "term_b": pd.Series([], dtype=str),
                             "c_ab": pd.Series([], dtype="int64")})

    def df_partial(b: pa.Table) -> pa.Table:
        out = (
            b.to_pandas().groupby("term", as_index=False).size().rename(columns={"size": "df"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = tree_group_sum(
        bucketed_key_apply(dt, "doc_id", pair_fn, num_buckets=64),
        ["term_a", "term_b"], value_cols=["c_ab"],
    )
    dftab = tree_group_sum(
        dt.map_batches(df_partial, batch_size=None, batch_format="pyarrow"),
        ["term"], value_cols=["df"],
    )
    empty = pd.DataFrame(
        {"term_a": pd.Series([], dtype=str), "term_b": pd.Series([], dtype=str),
         "c_ab": pd.Series([], dtype="int64"), "pmi_micro": pd.Series([], dtype="int64")}
    )
    if pairs.empty or dftab.empty:
        return empty
    pairs = pairs[pairs["c_ab"] >= PMI_MIN_SUPPORT].reset_index(drop=True)
    if pairs.empty:
        return empty
    n = io.table_num_rows(io.table_path(sf_dir, "documents"))
    dfmap = dftab.set_index("term")["df"]
    dfa = dfmap.loc[pairs["term_a"]].to_numpy(dtype=np.int64)
    dfb = dfmap.loc[pairs["term_b"]].to_numpy(dtype=np.int64)
    c = pairs["c_ab"].to_numpy(dtype=np.float64)
    x = (c * float(n)) / (dfa * dfb).astype(np.float64)
    pairs["pmi_micro"] = sql_round(np.log(x) * 1e6).astype(np.int64)
    pairs["c_ab"] = pairs["c_ab"].astype("int64")
    return pairs.sort_values(["term_a", "term_b"]).reset_index(drop=True)


DOCS_TERM_PMI_SQL = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
t AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
p AS (SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS c_ab
      FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term HAVING COUNT(*) >= {PMI_MIN_SUPPORT}),
df AS (SELECT term, COUNT(*) AS df FROM t GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT p.term_a, p.term_b, CAST(p.c_ab AS BIGINT) AS c_ab,
       CAST(round(LN(CAST(p.c_ab AS DOUBLE) * n.n / (da.df * db.df)) * 1000000, 0) AS BIGINT) AS pmi_micro
FROM p
JOIN df da ON da.term = p.term_a
JOIN df db ON db.term = p.term_b
CROSS JOIN n
ORDER BY p.term_a, p.term_b
"""


# ---------------------------------------------------------------------------
# Top-eigenvector power iteration — the PCA/spectral direction of the
# embedding covariance, computed at scale: the ONLY data-cardinality work
# is the exact distributed Gram reduction (int64-quantized per-batch
# X^T X partials + shuffle-free tree combine, the embeddings_gram_matrix
# machinery with BOTH triangles); the pinned-count power iterations then
# run on the d x d integer matrix (d = 64 — driver-sized by definition).
# Every iteration is exact integer matvec + ONE pinned float renormalize
# (divide by max|w|, round to int64 micro-units), so the DuckDB oracle
# unrolls bit-identical iterations. Loud overflow guard with the rescale
# path named.
# ---------------------------------------------------------------------------

POWER_ITERS = 3


def embeddings_top_eigvec(sf_dir: str):
    from .relational import tree_group_sum

    ds = _read(sf_dir, "embeddings", ["embedding"])
    n_total = io.table_num_rows(io.table_path(sf_dir, "embeddings"))

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        n = batch.num_rows
        if n == 0:
            return pa.table({"i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        X = np.asarray(emb.flatten(), dtype=np.float64).reshape(n, -1)
        q = sql_round(X * 1000.0).astype(np.int64)
        # PRE-accumulation bound: every |G[i,j]| over the WHOLE corpus is
        # <= n_total * gmax^2 where gmax is the global max |qx|; the batch
        # holding gmax trips this check, so a wrap can never happen inside
        # q.T @ q or the tree combine (the later matvec guard reads the
        # accumulated G and could not catch a wrap that already occurred)
        maxq = int(np.abs(q).max()) if q.size else 0
        if maxq and n_total * maxq * maxq >= (1 << 63):
            raise ValueError(
                "embeddings_top_eigvec Gram accumulation would overflow int64 "
                f"at {n_total} rows with max|qx|={maxq} — rescale the "
                "quantization (divide s by a pinned power of 10 on BOTH "
                "engines) before accumulating"
            )
        G = q.T @ q
        iu, ju = np.indices(G.shape)
        return pa.table(
            {
                "i": pa.array((iu.ravel() + 1).astype(np.int64)),
                "j": pa.array((ju.ravel() + 1).astype(np.int64)),
                "s": pa.array(G.ravel().astype(np.int64)),
            }
        )

    gt = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], combine_batch=131072, value_cols=["s"],
    )
    empty = pd.DataFrame({"i": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="int64")})
    if gt.empty:
        return empty
    d = int(gt["i"].max())
    G = np.zeros((d, d), dtype=np.int64)
    G[gt["i"].to_numpy(dtype=np.int64) - 1, gt["j"].to_numpy(dtype=np.int64) - 1] = gt["s"].to_numpy(dtype=np.int64)
    # matvec bound: |w| <= d * max|G| * max|v| with max|v| = 1e6
    if int(np.abs(G).max()) * d * 1_000_000 >= (1 << 62):
        raise ValueError(
            "embeddings_top_eigvec integer matvec would overflow int64 at this "
            "row count — rescale the Gram quantization (divide s by a pinned "
            "power of 10 on BOTH engines) before iterating"
        )
    v = np.full(d, 1_000_000, dtype=np.int64)
    for _ in range(POWER_ITERS):
        w = G @ v  # exact int64 (guarded above)
        m = float(np.abs(w).max())
        if m == 0.0:
            break
        v = sql_round(w.astype(np.float64) / m * 1e6).astype(np.int64)
    return pd.DataFrame({"i": np.arange(1, d + 1, dtype=np.int64), "v": v})


EMBEDDINGS_TOP_EIGVEC_SQL = """
WITH e AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
           FROM embeddings),
q AS (SELECT vec_id, i, CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS qx FROM e),
g AS (SELECT a.i AS i, b.i AS j, CAST(SUM(a.qx * b.qx) AS BIGINT) AS s
      FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM g),
w1 AS (SELECT g.i, CAST(SUM(g.s * p.v) AS BIGINT) AS w FROM g JOIN v0 p ON g.j = p.i GROUP BY g.i),
v1 AS (SELECT i, CAST(round(CAST(w AS DOUBLE) / (SELECT MAX(ABS(w)) FROM w1) * 1000000, 0) AS BIGINT) AS v FROM w1),
w2 AS (SELECT g.i, CAST(SUM(g.s * p.v) AS BIGINT) AS w FROM g JOIN v1 p ON g.j = p.i GROUP BY g.i),
v2 AS (SELECT i, CAST(round(CAST(w AS DOUBLE) / (SELECT MAX(ABS(w)) FROM w2) * 1000000, 0) AS BIGINT) AS v FROM w2),
w3 AS (SELECT g.i, CAST(SUM(g.s * p.v) AS BIGINT) AS w FROM g JOIN v2 p ON g.j = p.i GROUP BY g.i),
v3 AS (SELECT i, CAST(round(CAST(w AS DOUBLE) / (SELECT MAX(ABS(w)) FROM w3) * 1000000, 0) AS BIGINT) AS v FROM w3)
SELECT CAST(i AS BIGINT) AS i, v FROM v3 ORDER BY i
"""


# ---------------------------------------------------------------------------
# BPE-style adjacent character-pair counts — the first step of byte-pair-
# encoding tokenizer training: corpus-wide counts of every within-word
# adjacent character pair. Per batch the word stream flattens to ONE ascii
# byte buffer with NUL fences (no per-word Python), pair codes are
# first*256+second filtered on the fences, and np.bincount collapses the
# batch to <= 256^2 partial rows — finished by the shuffle-free tree
# combine. ASCII-corpus assumption verified loudly (same contract as
# docs_text_normalize). Oracle rebuilds pairs with substr over a numbers
# table — fully cross-engine.
# ---------------------------------------------------------------------------

def docs_bpe_pair_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from .relational import tree_group_sum

    def pair_partial(b: pa.Table) -> pa.Table:
        t = _doc_terms(b, distinct=False)
        empty = pd.DataFrame({"code": pd.Series([], dtype="int64"), "c": pd.Series([], dtype="int64")})
        if t.empty:
            return pa.Table.from_pandas(empty, preserve_index=False)
        joined = "\x00".join(t["term"].tolist())
        try:
            buf = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        except UnicodeEncodeError as e:
            raise ValueError(
                "docs_bpe_pair_counts assumes an ascii corpus (the documents "
                "table's contract); non-ascii input needs a byte-level variant"
            ) from e
        if len(buf) < 2:
            return pa.Table.from_pandas(empty, preserve_index=False)
        # \x00 is the word fence: a term CONTAINING an embedded NUL (valid
        # ascii, so it survives the encode guard) would silently split into
        # two fenced words here while the SQL oracle's substr counts the
        # pair across it — reject loudly instead of diverging
        if int((buf == 0).sum()) != len(t) - 1:
            raise ValueError(
                "docs_bpe_pair_counts: a term contains an embedded NUL byte — "
                "the \\x00 word fence would miscount; strip NULs upstream or "
                "switch the fence to an out-of-band sentinel"
            )
        first, second = buf[:-1].astype(np.int64), buf[1:].astype(np.int64)
        valid = (first != 0) & (second != 0)
        codes = first[valid] * 256 + second[valid]
        cnt = np.bincount(codes, minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.Table.from_pandas(
            pd.DataFrame({"code": nz.astype(np.int64), "c": cnt[nz].astype(np.int64)}),
            preserve_index=False,
        )

    out = tree_group_sum(
        ds.map_batches(pair_partial, batch_format="pyarrow"), ["code"], value_cols=["c"]
    )
    if out.empty:
        return pd.DataFrame({"pair": pd.Series([], dtype=str), "c": pd.Series([], dtype="int64")})
    code = out["code"].to_numpy(dtype=np.int64)
    out = pd.DataFrame(
        {"pair": [chr(x >> 8) + chr(x & 255) for x in code], "c": out["c"].astype("int64")}
    )
    return out.sort_values("pair").reset_index(drop=True)


DOCS_BPE_PAIR_COUNTS_SQL = """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
w2 AS (SELECT word FROM w WHERE length(word) >= 2),
mx AS (SELECT MAX(length(word)) AS m FROM w2),
nums AS (SELECT unnest(range(1, (SELECT m FROM mx))) AS i),
b AS (SELECT substr(word, CAST(i AS INTEGER), 2) AS pair
      FROM w2 JOIN nums ON i <= length(word) - 1)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY pair ORDER BY pair
"""


# ---------------------------------------------------------------------------
# Cross-source n-gram overlap matrix — the train/test LEAKAGE AUDIT: for
# every pair of corpus sources, how many distinct word-5-grams they share
# (the decontamination operator's diagnostic sibling). Engine path:
# batch-vectorized gram hashing (the shared sketch kernel convention:
# whole-doc gram when a doc has < 5 words) -> global distinct
# (gram, source) via one sorted combine -> whole-gram hash buckets where
# each gram's <= n_sources rows expand to pairs via the shared run-length
# all-pairs gather -> source^2-bounded tree combine. Sources never exceed
# a few hundred, so only (gram, source) rows ever shuffle. Oracle
# recomputes gram SETS from raw text in SQL (the docs_jaccard_pairs
# convention: distinct-hash cardinality == distinct-string cardinality,
# collision-free at 64 bits on these corpora).
# ---------------------------------------------------------------------------

def docs_source_overlap(sf_dir: str):
    from ..stages.keyapply import bucketed_key_apply, key_run_starts, run_all_pairs
    from ..stages.sketch import gram_hash_flat
    from .relational import sorted_group_agg, tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def gram_source(b: pa.Table) -> pa.Table:
        g, go, _ = gram_hash_flat(b["text"], 5)
        src = b["source"].to_numpy(zero_copy_only=False)
        n_docs = len(go) - 1
        rep = np.repeat(np.arange(n_docs), go[1:] - go[:-1])
        df = pd.DataFrame({"gram": g.view(np.int64), "source": src[rep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    gs = ds.map_batches(gram_source, batch_format="pyarrow")
    distinct = sorted_group_agg(gs, ["gram", "source"], {"_n": "count"}).drop_columns(["_n"])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source_a": pd.Series([], dtype=str),
                              "source_b": pd.Series([], dtype=str),
                              "shared_grams": pd.Series([], dtype="int64")})
        if len(g) < 2:
            return empty
        g = g.sort_values(["gram", "source"], kind="stable")
        keys = g["gram"].to_numpy()
        src = g["source"].to_numpy()
        new = key_run_starts(keys)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(keys)))
        ai, bi = run_all_pairs(starts, lens)
        if len(ai) == 0:
            return empty
        out = (
            pd.DataFrame({"source_a": src[ai], "source_b": src[bi]})
            .groupby(["source_a", "source_b"], as_index=False).size()
            .rename(columns={"size": "shared_grams"})
        )
        return out

    partials = bucketed_key_apply(distinct, "gram", bucket_pairs, num_buckets=256)
    out = tree_group_sum(partials, ["source_a", "source_b"], value_cols=["shared_grams"])
    if out.empty:
        return pd.DataFrame({"source_a": pd.Series([], dtype=str),
                             "source_b": pd.Series([], dtype=str),
                             "shared_grams": pd.Series([], dtype="int64")})
    out["shared_grams"] = out["shared_grams"].astype("int64")
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


DOCS_SOURCE_OVERLAP_SQL = r"""
WITH d AS (
  SELECT source,
         list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS ws
  FROM documents
),
nd AS (SELECT source, ws, len(ws) AS nw FROM d),
grams AS (
  SELECT source,
         coalesce(array_to_string(ws[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' '), '') AS gram
  FROM nd, unnest(range(1, greatest(nw - 4, 1) + 1)) t(i)
),
sets AS (SELECT DISTINCT source, gram FROM grams)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS shared_grams
FROM sets a JOIN sets b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""




# ---------------------------------------------------------------------------
# BPE TRAINER (round 5) — the full first-N-merges tokenizer training loop
# (Sennrich et al. 2016), not just the single pair-count step
# (docs_bpe_pair_counts). Scale shape: ONE corpus scan builds the
# (word, freq) table (vocabulary-bounded — the classic BPE-training
# optimization: all further work is corpus-size-INDEPENDENT); each merge
# iteration then runs on that small table: freq-weighted symbol-pair
# counts (vectorized utf-32 buffer + weighted bincount), pinned argmax
# (count desc, pair asc — numeric code order == lexicographic order),
# and a literal leftmost-non-overlapping replace introducing the new
# symbol chr(128+k) (python str.replace == SQL REPLACE semantics).
# Oracle: DuckDB unrolls the SAME three iterations over its own word
# table. Output = the learned merge table.
# ---------------------------------------------------------------------------

BPE_MERGES = 3


def _bpe_pair_argmax(words: np.ndarray, freqs: np.ndarray) -> tuple[str, int]:
    joined = "\x00".join(words.tolist())
    buf = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if (buf >= 65536).any():
        raise ValueError("bpe trainer packs symbol pairs into 2x16 bits — "
                         "codepoints past U+FFFF need a wider pack")
    wid = np.cumsum(buf == 0)
    first = buf[:-1].astype(np.int64)
    second = buf[1:].astype(np.int64)
    valid = (first != 0) & (second != 0)
    codes = first[valid] * 65536 + second[valid]
    w = freqs[wid[:-1][valid]].astype(np.float64)
    uniq, inv = np.unique(codes, return_inverse=True)
    cnt = np.bincount(inv, weights=w).astype(np.int64)
    # pinned tie rule: count desc, then pair ASC — code numeric order IS
    # (c1, c2) lexicographic order, which is UTF-8 string order
    best = np.lexsort((uniq, -cnt))[0]
    code = int(uniq[best])
    return chr(code >> 16) + chr(code & 0xFFFF), int(cnt[best])


def docs_bpe_train(sf_dir: str):
    from .relational import tree_group_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def word_partial(b: pa.Table) -> pa.Table:
        out = (
            _doc_terms(b, distinct=False)
            .groupby("term", as_index=False).size().rename(columns={"size": "freq"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    wt = tree_group_sum(
        ds.map_batches(word_partial, batch_format="pyarrow"), ["term"], value_cols=["freq"]
    )
    empty = pd.DataFrame(
        {"merge_rank": pd.Series([], dtype="int64"), "pair": pd.Series([], dtype=str),
         "c": pd.Series([], dtype="int64")}
    )
    if wt.empty:
        return empty
    words = wt["term"].to_numpy()
    if any("\x00" in w for w in words.tolist()):
        raise ValueError("bpe trainer uses \\x00 as the word fence — corpus "
                         "words must not contain NUL")
    freqs = wt["freq"].to_numpy(dtype=np.int64)
    rows = []
    for k in range(1, BPE_MERGES + 1):
        pair, c = _bpe_pair_argmax(words, freqs)
        rows.append({"merge_rank": k, "pair": pair, "c": c})
        sym = chr(128 + k)
        words = np.asarray([w.replace(pair, sym) for w in words.tolist()], dtype=object)
    return pd.DataFrame(rows).astype({"merge_rank": "int64", "pair": "str", "c": "int64"})


def _bpe_train_sql() -> str:
    # unroll BPE_MERGES iterations; each: pair counts over the word table
    # (freq-weighted, codepoint substr), pinned argmax, literal REPLACE
    its = []
    prev = "w0"
    sel = []
    for k in range(1, BPE_MERGES + 1):
        its.append(f"""
n{k} AS (SELECT word, freq, unnest(range(1, length(word))) AS i FROM {prev} WHERE length(word) >= 2),
p{k} AS (SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, CAST(SUM(freq) AS BIGINT) AS c
        FROM n{k} GROUP BY 1),
b{k} AS (SELECT pair, c FROM p{k} ORDER BY c DESC, pair LIMIT 1),
w{k} AS (SELECT REPLACE(word, (SELECT pair FROM b{k}), chr({128 + k})) AS word, freq FROM {prev})""")
        sel.append(f"SELECT {k} AS merge_rank, (SELECT pair FROM b{k}) AS pair, (SELECT c FROM b{k}) AS c")
        prev = f"w{k}"
    return (
        "WITH w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM "
        "(SELECT unnest(string_split(text, ' ')) AS word FROM documents) "
        "WHERE word <> '' GROUP BY word)," + ",".join(its) + "\n"
        + "\nUNION ALL\n".join(
            f"SELECT CAST({k} AS BIGINT) AS merge_rank, (SELECT pair FROM b{k}) AS pair, (SELECT c FROM b{k}) AS c"
            for k in range(1, BPE_MERGES + 1)
        )
        + "\nORDER BY merge_rank"
    )


# ---------------------------------------------------------------------------
# BPE APPLY (round 5) — tokenize the corpus with the merges learned by
# docs_bpe_train: broadcast the (ordered) merge list, apply it per batch
# as a chain of literal leftmost replaces over the doc text (word-fenced
# by spaces, so merges never cross words), and report per-lang BPE token
# counts beside the whitespace word counts (the compression the merges
# bought). Oracle: the same three REPLACEs inline over raw text — token
# count per word = its post-merge codepoint length, whole-doc BPE tokens
# = post-merge length of the space-joined text minus the space count.
# ---------------------------------------------------------------------------

def docs_bpe_tokenize(sf_dir: str):
    import ray

    from .relational import tree_group_sum

    merges = docs_bpe_train(sf_dir)  # tiny (BPE_MERGES rows), driver-side
    pairs = merges["pair"].tolist()
    merges_ref = ray.put(pairs)
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        ps = _ray.get(merges_ref)
        t = b.to_pandas()
        merged = t["text"]
        for k, p_ in enumerate(ps, start=1):
            merged = merged.str.replace(p_, chr(128 + k), regex=False)
        # BPE tokens per doc = symbols in the merged text excluding spaces
        n_sym = merged.str.len() - merged.str.count(" ")
        words = t["text"].str.split().str.len()
        out = pd.DataFrame(
            {"lang": t["lang"], "n_docs": 1, "bpe_tokens": n_sym.astype("int64"),
             "ws_tokens": words.fillna(0).astype("int64")}
        )
        return pa.Table.from_pandas(
            out.groupby("lang", as_index=False).sum(), preserve_index=False
        )

    out = tree_group_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["lang"],
        value_cols=["n_docs", "bpe_tokens", "ws_tokens"],
    )
    out = out.astype({"lang": "str", "n_docs": "int64", "bpe_tokens": "int64",
                      "ws_tokens": "int64"})
    return out.sort_values("lang").reset_index(drop=True)


def _bpe_tokenize_sql() -> str:
    base = _bpe_train_sql()
    # reuse the trainer CTE chain to get b1..b3, then apply the same
    # replaces to every document's full text (merges contain no spaces, so
    # full-text replace == per-word replace)
    with_block = base.split("\nSELECT CAST(1 AS BIGINT)")[0]
    rep = "d.text"
    for k in range(1, BPE_MERGES + 1):
        rep = f"REPLACE({rep}, (SELECT pair FROM b{k}), chr({128 + k}))"
    return f"""{with_block},
docs_t AS (
  SELECT d.lang,
         -- merges never touch spaces, so space count carries over
         length({rep}) - (length(d.text) - length(REPLACE(d.text, ' ', ''))) AS bpe_tokens,
         (SELECT COUNT(*) FROM unnest(string_split(d.text, ' ')) AS u(w) WHERE w <> '') AS ws_tokens
  FROM documents d
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(bpe_tokens) AS BIGINT) AS bpe_tokens,
       CAST(SUM(ws_tokens) AS BIGINT) AS ws_tokens
FROM docs_t GROUP BY lang ORDER BY lang
"""
