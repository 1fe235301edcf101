"""stages/decontam.py invariants: Bloom filter guarantees, exact-vs-bloom
probe relationship, per-doc contamination counts vs a literal Python twin,
and the chunk-window rule at its token-count boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geospatialtools_ray.stages.decontam import (
    BloomFilter,
    bloom_from_dataset,
    contamination_counts,
    gram_set_exact,
)


def _grams_py(text: str, k: int) -> list[tuple[str, ...]]:
    """Literal twin of the shared gram rule: sliding word k-grams; docs
    shorter than k words emit ONE gram over all their words."""
    w = text.split()
    if len(w) >= k:
        return [tuple(w[i : i + k]) for i in range(len(w) - k + 1)]
    return [tuple(w)]


DOCS = [
    "a b c d e f g",          # 3 5-grams
    "a b c d e",              # exactly k words -> 1 gram
    "a b",                    # short doc -> 1 whole-doc gram
    "",                       # empty -> 1 empty gram
    "x y z w v a b c d e",    # contains eval gram "a b c d e"
    "q r s t u q r s t u",    # repeated halves
]


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(7)
    items = rng.integers(0, 2**63, size=20_000, dtype=np.int64).astype(np.uint64)
    n_bits, n_hashes = BloomFilter.params_for(len(items), fp_rate=1e-3)
    f = BloomFilter(n_bits, n_hashes)
    f.add(items)
    assert f.contains(items).all(), "Bloom filters must never false-negative"
    probe = rng.integers(0, 2**63, size=50_000, dtype=np.int64).astype(np.uint64)
    fresh = probe[~np.isin(probe, items)]
    fp = f.contains(fresh).mean()
    assert fp < 5e-3, f"false-positive rate {fp} far above the 1e-3 design point"


def test_bloom_union_is_orderless():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**62, 500, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, 2**62, 500, dtype=np.int64).astype(np.uint64)
    f1, f2 = BloomFilter(1 << 14, 5), BloomFilter(1 << 14, 5)
    f1.add(a)
    f2.add(b)
    both = BloomFilter(1 << 14, 5)
    both.add(np.concatenate([a, b]))
    assert (f1.union(f2).bits == both.bits).all()
    assert (f2.union(f1).bits == both.bits).all()
    with pytest.raises(ValueError):
        f1.union(BloomFilter(1 << 13, 5))


def _docs_ds(texts, num_blocks=3):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    return rd.from_pandas(df, override_num_blocks=num_blocks)


def test_contamination_counts_match_python_twin(ray_session):
    import ray

    k = 5
    eval_texts = DOCS[:2]
    train_texts = DOCS[2:]
    eval_grams = {g for t in eval_texts for g in _grams_py(t, k)}
    want = []
    for i, t in enumerate(train_texts):
        gs = _grams_py(t, k)
        want.append((i, len(gs), sum(g in eval_grams for g in gs)))

    grams = gram_set_exact(_docs_ds(eval_texts), "text", k=k)
    got = (
        contamination_counts(_docs_ds(train_texts), ray.put(grams), "text", "doc_id", k=k)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(map(tuple, got.to_numpy())) == want


def test_bloom_probe_is_superset_of_exact(ray_session):
    import ray

    k = 3
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 25))) for _ in range(200)]
    eval_ds, train_ds = _docs_ds(texts[:40]), _docs_ds(texts[40:])

    grams = gram_set_exact(eval_ds, "text", k=k)
    exact = (
        contamination_counts(train_ds, ray.put(grams), "text", "doc_id", k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bf = bloom_from_dataset(eval_ds, "text", k=k, n_bits=1 << 16, n_hashes=6)
    approx = (
        contamination_counts(train_ds, ray.put(bf), "text", "doc_id", k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (approx["n_hits"].to_numpy() >= exact["n_hits"].to_numpy()).all(), (
        "Bloom probe may over-flag but must never miss a contaminated gram"
    )
    assert (approx["n_grams"] == exact["n_grams"]).all()


def test_bloom_from_dataset_matches_driver_build(ray_session):
    """The tree OR-combine must equal a single-process build — OR is
    associative/commutative, so block layout cannot change the filter."""
    from geospatialtools_ray.stages.sketch import gram_hash_flat

    texts = DOCS * 10
    k = 4
    for blocks in (1, 7):
        got = bloom_from_dataset(_docs_ds(texts, num_blocks=blocks), "text", k=k, n_bits=1 << 12, n_hashes=4)
        want = BloomFilter(1 << 12, 4)
        g, _, _ = gram_hash_flat(pa.array(texts, type=pa.string()), k)
        want.add(g)
        assert (got.bits == want.bits).all()


def _chunks_py(text: str, W: int) -> list[tuple[int, int, str]]:
    w = [x for x in text.split(" ") if x]
    if not w:
        return [(0, 0, "")]
    return [(s // W, min(s + W, len(w)) - s, " ".join(w[s : s + W])) for s in range(0, len(w), W)]


def test_chunk_windows_boundaries(ray_session, tmp_path):
    from geospatialtools_ray.pipelines.hygienequeries import CHUNK_TOKENS, docs_chunk_windows

    W = CHUNK_TOKENS
    texts = [
        " ".join(f"t{i}" for i in range(n)) for n in (0, 1, W - 1, W, W + 1, 2 * W, 2 * W + 3)
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(len(texts)), type=pa.int64()), "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"),
    )
    got = docs_chunk_windows(str(tmp_path))
    want = pd.DataFrame(
        [
            (d, cid, n, txt)
            for d, t in enumerate(texts)
            for cid, n, txt in _chunks_py(t, W)
        ],
        columns=["doc_id", "chunk_id", "n_tokens", "chunk_text"],
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "chunk_id", "n_tokens", "chunk_text"]].astype({"doc_id": "int64"}),
        want.astype({"doc_id": "int64", "chunk_id": "int64", "n_tokens": "int64"}),
        check_dtype=False,
    )


def test_contamination_counts_empty_eval_set(ray_session):
    """An eval corpus with zero grams (e.g. the decontaminate query's hash
    slice catching no documents on a tiny corpus) must report n_hits=0 for
    every training doc, not crash on the size-0 membership array
    (round-4 review: m[0] on an empty sorted array raised IndexError)."""
    import ray

    empty = np.empty(0, dtype=np.int64)
    got = (
        contamination_counts(_docs_ds(DOCS), ray.put(empty), "text", "doc_id", k=5)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(got) == len(DOCS)
    assert (got["n_hits"] == 0).all()
    assert (got["n_grams"] >= 1).all()
