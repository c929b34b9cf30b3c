"""connected_components: the distributed union-find behind
dedup_minhash_clusters. The chain graph is the adversarial shape — plain
min-propagation needs O(diameter) rounds (it OOM'd the first cut via plan
growth); pointer jumping must collapse it in O(log diameter)."""

from __future__ import annotations

import random

from harvester_spark.operators.dedup import connected_components


def _cc(spark, n_vertices, pairs):
    verts = spark.createDataFrame([(i,) for i in range(n_vertices)], "doc_id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] or [(0, 0)], "doc_a long, doc_b long"
    )
    if not pairs:
        edges = edges.limit(0)
    out = connected_components(verts, edges)
    return dict((r["doc_id"], r["label"]) for r in out.collect())


def _brute(n_vertices, pairs):
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label per component
    comp = {}
    for v in range(n_vertices):
        comp.setdefault(find(v), []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def test_long_chain(spark):
    # 120-vertex path, descending so the min (0) sits at one end
    pairs = [(i, i + 1) for i in range(119)]
    got = _cc(spark, 120, pairs)
    assert got == {i: 0 for i in range(120)}


def test_singletons_and_cliques(spark):
    pairs = [(3, 7), (7, 9), (20, 21)]
    got = _cc(spark, 25, pairs)
    want = _brute(25, pairs)
    assert got == want
    assert got[0] == 0 and got[9] == 3 and got[21] == 20


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 200
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    pairs = [(min(a, b), max(a, b)) for a, b in pairs if a != b]
    assert _cc(spark, n, pairs) == _brute(n, pairs)


def test_no_edges(spark):
    got = _cc(spark, 10, [])
    assert got == {i: i for i in range(10)}
