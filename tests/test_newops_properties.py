"""Pure-kernel property tests (no Ray) for the invariants the round-4
continuation operators rely on: the interval-overlap anchor-bucket
exactly-once rule and the degree-orientation triangle-uniqueness rule."""

import numpy as np

from geospatialtools_ray.hashing import h64


def _rand(n, lo, hi, stream):
    u = h64(np.arange(n, dtype=np.uint64), stream)
    return (lo + (u % np.uint64(hi - lo))).astype(np.int64)


def test_anchor_bucket_rule_counts_each_overlap_exactly_once():
    """For half-open intervals and ANY bucket width W: an overlapping pair
    shares the bucket floor(max(lo_a, lo_b) / W) (both cover it), and that
    anchor is unique — so candidate pairs filtered to anchor==bucket equal
    the brute-force overlap set with multiplicity exactly 1."""
    n = 120
    lo = _rand(n, 0, 10_000, 1)
    length = _rand(n, 1, 500, 2)
    hi = lo + length
    for W in (7, 64, 256, 1024):
        # exploded (interval, bucket) cover
        cover = [(i, b) for i in range(n) for b in range(lo[i] // W, (hi[i] - 1) // W + 1)]
        from collections import defaultdict

        by_bucket = defaultdict(list)
        for i, b in cover:
            by_bucket[b].append(i)
        counted = defaultdict(int)
        for b, members in by_bucket.items():
            for x in range(len(members)):
                for y in range(len(members)):
                    i, j = members[x], members[y]
                    if i < j and lo[i] < hi[j] and lo[j] < hi[i] and max(lo[i], lo[j]) // W == b:
                        counted[(i, j)] += 1
        brute = {(i, j) for i in range(n) for j in range(i + 1, n)
                 if lo[i] < hi[j] and lo[j] < hi[i]}
        assert set(counted) == brute
        assert all(c == 1 for c in counted.values())


def test_degree_orientation_counts_each_triangle_exactly_once():
    """Orienting every edge from lower (deg, id) to higher makes each
    triangle the unique wedge u->v->w whose closing edge u->w exists."""
    n = 40
    a = _rand(300, 0, n, 11)
    b = _rand(300, 0, n, 12)
    edges = {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    deg = np.zeros(n, dtype=np.int64)
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    oriented = set()
    for x, y in edges:
        s, d = (x, y) if (deg[x], x) < (deg[y], y) else (y, x)
        oriented.add((s, d))
    wedges = [(u, v, w) for (u, v) in oriented for (v2, w) in oriented if v2 == v]
    tris = {tuple(sorted((u, v, w))) for (u, v, w) in wedges if (u, w) in oriented}
    brute = {tuple(sorted((i, j, k)))
             for (i, j) in edges for k in range(n)
             if (min(i, k), max(i, k)) in edges and (min(j, k), max(j, k)) in edges}
    assert tris == brute
    # uniqueness: every triangle closes by exactly one oriented wedge
    closed = [tuple(sorted((u, v, w))) for (u, v, w) in wedges if (u, w) in oriented]
    assert len(closed) == len(set(closed))


def test_misra_gries_merge_preserves_heavy_hitter_guarantee():
    """Any term with true count >= N//(K+1)+1 must survive an arbitrary
    multi-way merge tree of per-block MG summaries (the docs_heavy_hitters
    invariant): total undercount stays <= N/(K+1) because each truncation's
    subtracted d satisfies (K+1)*d <= mass present at that merge."""
    import pandas as pd

    from geospatialtools_ray.pipelines.retrievalqueries import HH_K, _mg_combine, _mg_truncate

    rng = np.random.default_rng(7)
    for trial in range(8):
        # skewed stream: a few heavy terms + a long uniform tail, split
        # into ragged blocks so truncation fires at every level
        heavy = [f"h{i}" for i in range(5)]
        tail_card = int(rng.integers(200, 2000))
        stream = []
        for h in heavy:
            stream += [h] * int(rng.integers(50, 400))
        stream += [f"t{int(x)}" for x in rng.integers(0, tail_card, size=int(rng.integers(1000, 8000)))]
        rng.shuffle(stream)
        n_total = len(stream)

        cuts = np.sort(rng.choice(np.arange(1, n_total), size=int(rng.integers(3, 40)), replace=False))
        blocks = np.split(np.asarray(stream, dtype=object), cuts)

        summaries = []
        for blk in blocks:
            vc = pd.Series(blk).value_counts()
            real = _mg_truncate(pd.DataFrame({"term": vc.index, "c": vc.to_numpy(np.int64)}))
            summaries.append(
                pd.concat([pd.DataFrame({"term": ["__N "], "c": [np.int64(len(blk))]}), real])
            )
        # multi-way merge in random fan-ins (mimics map_batches batching)
        while len(summaries) > 1:
            fan = int(rng.integers(2, min(5, len(summaries)) + 1))
            group, summaries = summaries[:fan], summaries[fan:]
            summaries.append(_mg_combine(pd.concat(group)))
        final = summaries[0]

        assert int(final.loc[final["term"] == "__N ", "c"].iloc[0]) == n_total
        thresh = n_total // (HH_K + 1) + 1
        exact = pd.Series(stream).value_counts()
        must_survive = set(exact[exact >= thresh].index)
        surv = set(final.loc[final["term"] != "__N ", "term"])
        assert must_survive <= surv, (trial, must_survive - surv)
        assert len(surv) <= HH_K
        # stored counts never exceed true counts (undercount-only summary)
        real_final = final[final["term"] != "__N "]
        for t, c in zip(real_final["term"], real_final["c"]):
            assert c <= exact.get(t, 0)


def test_kcore_parallel_peel_equals_sequential_peel():
    """The k-core is order-independent: removing all deg<K nodes per round
    (the distributed rule) and removing ONE minimal node at a time must
    yield the same maximal subgraph — and every surviving node has
    degree >= K inside it."""
    import pandas as pd

    K = 2
    for trial in range(10):
        m = int(_rand(1, 10, 120, 100 + trial)[0])
        s = _rand(m, 0, 40, 200 + trial)
        d = _rand(m, 0, 40, 300 + trial)
        keep = s != d
        pairs = pd.DataFrame({"s": s[keep], "d": d[keep]}).drop_duplicates()
        edges = pd.concat([pairs, pairs.rename(columns={"s": "d", "d": "s"})], ignore_index=True).drop_duplicates()

        # parallel peel (the engine rule)
        cur = edges.copy()
        while True:
            deg = cur.groupby("s").size()
            act = deg[deg >= K].index
            nxt = cur[cur["s"].isin(act) & cur["d"].isin(act)]
            if len(nxt) == len(cur):
                break
            cur = nxt

        # sequential peel: one minimal node at a time
        seq = edges.copy()
        while True:
            deg = seq.groupby("s").size()
            low = deg[deg < K]
            if low.empty:
                break
            v = low.index[0]
            seq = seq[(seq["s"] != v) & (seq["d"] != v)]

        a = set(map(tuple, cur[["s", "d"]].to_numpy()))
        b = set(map(tuple, seq[["s", "d"]].to_numpy()))
        assert a == b, trial
        if len(cur):
            assert cur.groupby("s").size().min() >= K


def test_pigeonhole_bands_cover_all_hamming3_pairs_and_verify_is_exact():
    """4 disjoint 16-bit bands: any u64 pair within Hamming distance 3
    shares >= 1 exact band (pigeonhole), so band-bucket candidates are a
    SUPERSET of the true pair set; XOR+popcount then recovers it exactly.
    Random sketches plus planted near-dups (random <=3-bit flips)."""
    from geospatialtools_ray.stages.dedup import _popcount64

    rng_u = h64(np.arange(400, dtype=np.uint64), 77)
    # plant near-dups: doc i in [200, 400) is doc i-200 with <= 3 bit flips
    planted = rng_u.copy()
    for i in range(200, 400):
        flips = int(h64(np.uint64(i), 5) % np.uint64(4))
        v = rng_u[i - 200]
        for f in range(flips):
            bit = int(h64(np.uint64(i * 8 + f), 6) % np.uint64(64))
            v = v ^ (np.uint64(1) << np.uint64(bit))
        planted[i] = v
    sk = planted
    n = len(sk)
    # brute truth
    xor = sk[:, None] ^ sk[None, :]
    pop = np.unpackbits(xor.view(np.uint8).reshape(n, n, 8), axis=2).sum(axis=2)
    iu = np.triu_indices(n, 1)
    truth = {(int(a), int(b)) for a, b in zip(*iu) if pop[a, b] <= 3}
    assert len(truth) >= 150  # planted pairs actually exist
    # pigeonhole candidates
    cands = set()
    for band in range(4):
        key = (sk >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        from collections import defaultdict

        buckets = defaultdict(list)
        for i, k in enumerate(key.tolist()):
            buckets[k].append(i)
        for members in buckets.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    cands.add((members[x], members[y]))
    assert truth <= cands
    # verify recovers exactly the truth
    ca = np.array([a for a, b in cands], dtype=np.int64)
    cb = np.array([b for a, b in cands], dtype=np.int64)
    ham = _popcount64(sk[ca] ^ sk[cb])
    got = {(int(a), int(b)) for a, b, h in zip(ca, cb, ham) if h <= 3}
    assert got == truth


def test_bfs_min_relaxation_rounds_equal_true_hop_distance():
    """R rounds of dist' = min(dist, min_nbr(dist)+1) equal true BFS hop
    distance for every node within R hops of a seed (and leave farther
    nodes unlabeled) — the docs_asset_hops iteration rule."""
    n = 60
    a = _rand(150, 0, n, 21)
    b = _rand(150, 0, n, 22)
    edges = {(int(x), int(y)) for x, y in zip(a, b) if x != y}
    sym = edges | {(y, x) for x, y in edges}
    seeds = [v for v in range(n) if v % 7 == 0]
    R = 4
    # iterated min relaxation
    INF = 1 << 30
    dist = {v: (0 if v in seeds else INF) for v in range(n)}
    for _ in range(R):
        nxt = dict(dist)
        for s, d in sym:
            if dist[s] + 1 < nxt[d]:
                nxt[d] = dist[s] + 1
        dist = nxt
    # true BFS
    from collections import deque

    true = {v: INF for v in range(n)}
    dq = deque()
    for s in seeds:
        true[s] = 0
        dq.append(s)
    adj = {}
    for s, d in sym:
        adj.setdefault(s, []).append(d)
    while dq:
        u = dq.popleft()
        for w in adj.get(u, []):
            if true[w] > true[u] + 1:
                true[w] = true[u] + 1
                dq.append(w)
    for v in range(n):
        if true[v] <= R:
            assert dist[v] == true[v]
        else:
            assert dist[v] == INF


def test_surprisal_integer_micro_nat_sum_is_order_free():
    """The docs_unigram_surprisal no-float-hazard argument, exercised for
    real: on adversarial magnitudes a float64 running sum of per-token
    surprisals DIFFERS across accumulation orders (so a float pipeline
    would be parallelism-dependent), while quantizing each term's
    surprisal to int64 micro-nats FIRST makes every order's sequential
    running sum bit-identical and equal to the exact integer total."""
    from geospatialtools_ray.numerics import sql_round

    rng = np.random.default_rng(9)
    # adversarial spread: surprisals spanning ~12 orders of magnitude
    s_float = np.concatenate(
        [rng.uniform(1e-9, 1e-8, 4000), rng.uniform(1.0, 20.0, 4000), np.full(2000, 1e3)]
    )
    rng.shuffle(s_float)

    def running_sum(x):
        acc = np.float64(0.0)
        for v in x:
            acc += v
        return float(acc)

    perm = rng.permutation(len(s_float))
    f1, f2 = running_sum(s_float), running_sum(s_float[perm])
    assert f1 != f2  # the float hazard is REAL on these magnitudes

    smic = sql_round(s_float * 1e6).astype(np.int64)
    i1 = int(np.int64(0) + smic.cumsum()[-1])
    acc = np.int64(0)
    for v in smic[perm]:
        acc += v
    assert int(acc) == i1 == int(smic.sum())


def test_unigram_surprisal_engine_matches_naive_recompute():
    """End-to-end kernel check (no Ray): the query's quantize-then-sum
    pipeline over a tiny corpus equals a naive per-doc recompute through
    the same pinned expressions, for shuffled doc orders."""
    from geospatialtools_ray.numerics import sql_round

    docs = {0: "a b b c", 1: "c c c", 2: "a", 3: "d d a b"}
    toks = [(d, w) for d, t in docs.items() for w in t.split(" ") if w]
    terms = sorted({w for _, w in toks})
    tf = {w: sum(1 for _, x in toks if x == w) for w in terms}
    total = float(sum(tf.values()))
    smic = {w: int(sql_round(np.array([-np.log(tf[w] / total) * 1e6]))[0]) for w in terms}
    expect = {}
    for d, t in docs.items():
        ws = [w for w in t.split(" ") if w]
        ssum = sum(smic[w] for w in ws)
        expect[d] = float(sql_round(np.array([ssum / len(ws)]))[0] / 1e6)
    # engine-shaped vectorized path over a shuffled token order
    rng = np.random.default_rng(4)
    order = rng.permutation(len(toks))
    dv = np.array([toks[i][0] for i in order])
    sv = np.array([smic[toks[i][1]] for i in order], dtype=np.int64)
    import pandas as pd

    g = pd.DataFrame({"doc_id": dv, "s": sv}).groupby("doc_id").agg(
        n=("s", "size"), ssum=("s", "sum")
    )
    got = sql_round(g["ssum"].to_numpy(np.float64) / g["n"].to_numpy(np.float64)) / 1e6
    for d, v in zip(g.index, got):
        assert expect[int(d)] == v


def test_packed_key_global_rank_minus_offset_equals_per_group_rank():
    """The quota-mix rank identity: sorting by the packed
    (group_idx | hash | id) key, a row's global 1-based rank minus the
    total count of all smaller groups equals its within-group rank by
    (hash, id) — for ANY group sizes and hash collisions."""
    rng = np.random.default_rng(3)
    n = 500
    gi = rng.integers(0, 7, n).astype(np.int64)
    hv = rng.integers(0, 50, n).astype(np.int64)  # small range -> collisions
    did = np.arange(n, dtype=np.int64)
    k = (gi << np.int64(55)) | (hv << np.int64(23)) | did
    order = np.argsort(k, kind="stable")
    grank = np.empty(n, dtype=np.int64)
    grank[order] = np.arange(1, n + 1)
    counts = np.bincount(gi, minlength=7)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = grank - offsets[gi]
    # expected: per-group rank by (hv, did)
    import pandas as pd

    df = pd.DataFrame({"g": gi, "h": hv, "d": did})
    df["rk"] = df.sort_values(["g", "h", "d"]).groupby("g").cumcount() + 1
    exp = df.sort_index()["rk"].to_numpy()
    assert (within == exp).all()


def test_integer_power_iteration_tracks_float_and_converges():
    """The embeddings_top_eigvec iteration rule: exact int64 matvec + one
    pinned max-norm float renormalize per round (a) stays within
    quantization distance of the float power iteration, and (b) converges
    toward the dominant eigenvector on a PSD Gram matrix."""
    from geospatialtools_ray.numerics import sql_round

    rng = np.random.default_rng(12)
    X = rng.normal(size=(200, 16))
    X[:, 0] += 3.0  # plant a dominant direction
    q = sql_round(X * 1000.0)
    G = (q.T @ q).astype(np.int64)
    d = G.shape[0]
    v = np.full(d, 1_000_000, dtype=np.int64)
    vf = np.ones(d, dtype=np.float64)
    evals, evecs = np.linalg.eigh(G.astype(np.float64))
    top = evecs[:, -1]
    coss = []
    for _ in range(6):
        w = G @ v
        m = float(np.abs(w).max())
        v = sql_round(w.astype(np.float64) / m * 1e6).astype(np.int64)
        wf = G.astype(np.float64) @ vf
        vf = wf / np.abs(wf).max()
        cos_int_float = abs(np.dot(v, vf)) / (np.linalg.norm(v) * np.linalg.norm(vf))
        assert cos_int_float > 0.999999
        coss.append(abs(np.dot(v, top)) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert coss[-1] > 0.999
    assert coss[-1] >= coss[0]


def test_islands_day_minus_rank_equals_brute_streaks():
    """The gaps-and-islands identity: within a user's sorted distinct
    days, day - within-user-index is constant exactly per consecutive
    run, so max island size == the brute longest streak."""
    rng = np.random.default_rng(21)
    for _ in range(20):
        days = np.unique(rng.integers(0, 60, size=rng.integers(1, 40)))
        idx = np.arange(len(days))
        island = days - idx
        import pandas as pd

        longest = pd.Series(island).value_counts().max()
        # brute: walk runs
        best = cur = 1
        for i in range(1, len(days)):
            cur = cur + 1 if days[i] == days[i - 1] + 1 else 1
            best = max(best, cur)
        assert int(longest) == best
