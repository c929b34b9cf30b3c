"""host_pagerank invariants beyond the oracle gate."""

from pyspark.sql import functions as F

from harvester_spark.operators.graph import (
    HITS_UNIT,
    PR_ITERS,
    PR_UNIT,
    _edges,
    hits_scores,
    host_pagerank,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_conserves_mass_and_ranks_are_nondegenerate(spark):
    rows = host_pagerank(spark, SF_DIR).collect()
    total = sum(r["rank_unit"] for r in rows)
    # every integer division truncates < 1 unit per (edge|node) per
    # iteration — mass loss is bounded far under 0.1%
    assert abs(total - PR_UNIT) < PR_UNIT * 0.001, total
    assert all(r["rank_unit"] > 0 for r in rows)
    # a real ranking, not a uniform fixed point
    assert len({r["rank_unit"] for r in rows}) > 5


def test_pagerank_orders_by_in_weight_share(spark):
    """The top-ranked host must be one with above-average weighted in-degree
    (sanity that the edge synthesis drives the ranking)."""
    ranks = {r["host"]: r["rank_unit"] for r in host_pagerank(spark, SF_DIR).collect()}
    inw = {
        r["dst"]: r["iw"]
        for r in _edges(spark, SF_DIR)
        .groupBy("dst")
        .agg(F.sum("w").alias("iw"))
        .collect()
    }
    top_host = max(ranks, key=lambda h: (ranks[h], h))
    avg_in = sum(inw.values()) / len(inw)
    assert inw.get(top_host, 0) > avg_in, (top_host, inw.get(top_host), avg_in)


def test_pagerank_iterations_converge(spark):
    """After PR_ITERS=8 damped iterations the ranking is stable: one more
    iteration must not reorder the hosts (integer ranks move < 1%)."""
    import harvester_spark.operators.graph as g

    base = {r["host"]: r["rank_unit"] for r in host_pagerank(spark, SF_DIR).collect()}
    orig = g.PR_ITERS
    try:
        g.PR_ITERS = orig + 1
        more = {r["host"]: r["rank_unit"] for r in host_pagerank(spark, SF_DIR).collect()}
    finally:
        g.PR_ITERS = orig
    order = sorted(base, key=lambda h: (-base[h], h))
    order2 = sorted(more, key=lambda h: (-more[h], h))
    assert order == order2
    for h in base:
        assert abs(base[h] - more[h]) < 0.01 * PR_UNIT


def test_hits_mass_and_nondegeneracy(spark):
    """Both score vectors carry ~HITS_UNIT total mass (the integer L1
    normalizer q = greatest(S DIV UNIT, 1) can overshoot by at most S/q - UNIT
    < UNIT/q, well under 5% here) and produce real, DIFFERENT rankings."""
    rows = hits_scores(spark, SF_DIR).collect()
    ta = sum(r["auth_unit"] for r in rows)
    th = sum(r["hub_unit"] for r in rows)
    assert abs(ta - HITS_UNIT) < 0.05 * HITS_UNIT, ta
    assert abs(th - HITS_UNIT) < 0.05 * HITS_UNIT, th
    assert len({r["auth_unit"] for r in rows}) > 5
    assert len({r["hub_unit"] for r in rows}) > 5
    auth_order = [r["host"] for r in sorted(rows, key=lambda r: (-r["auth_unit"], r["host"]))]
    hub_order = [r["host"] for r in sorted(rows, key=lambda r: (-r["hub_unit"], r["host"]))]
    assert auth_order != hub_order  # hubs and authorities are distinct signals


def test_hits_top_authority_has_high_in_weight(spark):
    """The top authority must sit above the average weighted in-degree —
    the edge synthesis, not an artifact, drives the ranking."""
    rows = hits_scores(spark, SF_DIR).collect()
    inw = {
        r["dst"]: r["iw"]
        for r in _edges(spark, SF_DIR)
        .groupBy("dst")
        .agg(F.sum("w").alias("iw"))
        .collect()
    }
    top = max(rows, key=lambda r: (r["auth_unit"], r["host"]))
    avg_in = sum(inw.values()) / len(inw)
    assert inw.get(top["host"], 0) > avg_in


def test_cocitation_cap_binds_and_matches_bruteforce(spark):
    """The per-source out-degree cap must actually bind on this corpus
    (otherwise the capped path is untested), and the distributed result must
    equal an in-memory reimplementation of capped co-citation exactly."""
    from harvester_spark.operators.graph import COCITE_CAP, host_cocitation

    edges = _edges(spark, SF_DIR).collect()
    by_src = {}
    for e in edges:
        by_src.setdefault(e["src"], []).append((e["dst"], e["w"]))
    assert max(len(v) for v in by_src.values()) > COCITE_CAP  # cap binds
    expected = {}
    for src, outs in by_src.items():
        outs = sorted(outs, key=lambda t: (-t[1], t[0]))[:COCITE_CAP]
        for i in range(len(outs)):
            for j in range(i + 1, len(outs)):
                (d1, w1), (d2, w2) = outs[i], outs[j]
                a, b = min(d1, d2), max(d1, d2)
                expected[(a, b)] = expected.get((a, b), 0) + min(w1, w2)
    got = {
        (r["host_a"], r["host_b"]): r["cocite_w"]
        for r in host_cocitation(spark, SF_DIR).collect()
    }
    assert got == expected


def test_textrank_nondegenerate_and_tracks_cooccurrence_hubness(spark):
    """Ranks must spread (a real centrality, not a constant column) and the
    top TextRank term must sit in the top quartile by weighted degree —
    centrality may reorder hubs but cannot crown a leaf."""
    from harvester_spark.operators.graph import _word_edges, textrank_keywords

    rows = textrank_keywords(spark, SF_DIR).collect()
    ranks = {r["term"]: r["rank_unit"] for r in rows}
    assert len(ranks) > 10
    assert len(set(ranks.values())) > len(ranks) // 2  # not collapsed
    assert max(ranks.values()) > 2 * min(ranks.values())
    deg = {}
    for e in _word_edges(spark, SF_DIR).collect():
        deg[e["src"]] = deg.get(e["src"], 0) + e["w"]
    top_tr = max(ranks, key=lambda t: (ranks[t], t))
    q = sorted(deg.values())[3 * len(deg) // 4]
    assert deg[top_tr] >= q


def test_frontier_schedule_is_polite_and_takeordered(spark):
    """Politeness: within a host, consecutive dispatches are exactly
    delay_s apart starting at 0 (fetch_at = pos * delay). The global cut
    must interleave several hosts in time order, and the physical plan
    must cut with TakeOrdered, not a global sort."""
    from harvester_spark.operators.graph import FRONTIER_TOPK, frontier_schedule

    df = frontier_schedule(spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= FRONTIER_TOPK
    assert [r["slot"] for r in rows] == list(range(1, len(rows) + 1))
    times = [r["fetch_at_s"] for r in rows]
    assert times == sorted(times)
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host) >= 3, "schedule must interleave hosts"
    delays = set()
    for host, hs in by_host.items():
        hs.sort(key=lambda r: r["pos_in_host"])
        for r in hs:
            assert r["fetch_at_s"] == r["pos_in_host"] * r["delay_s"]
        delays.add(hs[0]["delay_s"])
    assert len(delays) >= 2, "all hosts got the same delay — hash degenerate"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_harmonic_centrality_exact_bfs_recompute(spark):
    """Exact Python all-pairs-BFS recompute of the harmonic table, plus
    the non-degeneracy the reciprocal weighting needs: some pair at
    distance >= 2 must exist (measured: max finite distance 2 at
    sf0.001), otherwise harmonic == 840·n_reached everywhere and the
    840/d unit is dead weight."""
    from collections import deque

    from harvester_spark.operators.graph import (
        HARM_HOPS,
        HARM_UNIT,
        _edges,
        host_harmonic_centrality,
    )

    adj: dict[str, list] = {}
    hosts = set()
    for e in _edges(spark, SF_DIR).collect():
        adj.setdefault(e["src"], []).append(e["dst"])
        hosts.update((e["src"], e["dst"]))
    expect = {}
    for s in sorted(hosts):
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= HARM_HOPS:
                continue
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        ds = [d for d in dist.values() if d > 0]
        expect[s] = (
            len(ds),
            sum(ds),
            sum(HARM_UNIT // d for d in ds),
        )
    rows = host_harmonic_centrality(spark, SF_DIR).collect()
    assert {r["host"] for r in rows} == hosts
    for r in rows:
        assert (
            r["n_reached"], r["sum_dist"], r["harmonic_x840"]
        ) == expect[r["host"]], r["host"]
    # ordering contract + reciprocal non-degeneracy
    key = [(-r["harmonic_x840"], r["host"]) for r in rows]
    assert key == sorted(key)
    assert any(
        r["harmonic_x840"] != HARM_UNIT * r["n_reached"] for r in rows
    ), "every reached pair is at distance 1 — 840/d weighting dead"
