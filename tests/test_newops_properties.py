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
