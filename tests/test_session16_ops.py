"""Semantics + parity guards for session-16 operators.

What each test pins:
- host_betweenness: full pure-Python recompute — independent edge
  synthesis from the raw parquet, an independently coded BFS carrying
  shortest-path counts, and the Brandes pair-identity accumulation with
  the same per-triple micro rounding — every output row must match the
  operator exactly.  Plus the non-degeneracy contract: the bounded
  community graph must produce genuine multi-hop shortest paths
  (max pair distance >= 2) and a non-flat betweenness profile
  (>= half the hosts nonzero, max >= 3x median) — a graph whose pairs
  are all at distance 1 has identically-zero betweenness and proves
  nothing.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict, deque

SF_DIR = "/root/testdata/sf0.001"


def _h56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _divround_micro(num: int, den: int) -> int:
    if num >= 0:
        return (num * 1000000 + den // 2) // den
    return -(((-num) * 1000000 + den // 2) // den)


# ------------------------------------------------- host_betweenness


def _bw_python_graph(spark):
    from harvester_spark.operators.graph import (
        BW_DOCS,
        BW_FAN,
        BW_GS,
        BW_INTRA_MOD,
        BW_INTRA_THR,
    )

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    stride = max(1, len(ids) // BW_DOCS)
    adj = defaultdict(set)
    for did in ids:
        if did % stride != 0:
            continue
        s = str(did)
        u = _h56(f"bwu|{s}") % BW_FAN
        if _h56(f"bwm|{s}") % BW_INTRA_MOD < BW_INTRA_THR:
            v = (u - u % BW_GS) + _h56(f"bwv|{s}") % BW_GS
        else:
            v = _h56(f"bww|{s}") % BW_FAN
        if u != v:
            adj[f"b{u}"].add(f"b{v}")
            adj[f"b{v}"].add(f"b{u}")
    return adj


def test_betweenness_matches_pure_python_brandes(spark):
    from harvester_spark.operators.graph import BW_HOPS, host_betweenness

    adj = _bw_python_graph(spark)
    hosts = sorted(adj)

    # BFS with path counts per source, bounded at BW_HOPS.
    dist: dict = {}
    sigma: dict = {}
    for s in hosts:
        d = {s: 0}
        sg = {s: 1}
        frontier = deque([s])
        for hop in range(1, BW_HOPS + 1):
            nxt = defaultdict(int)
            for u in frontier:
                for w in adj[u]:
                    if w not in d:
                        nxt[w] += sg[u]
            for w, c in nxt.items():
                d[w] = hop
                sg[w] = c
            frontier = deque(nxt)
        dist[s] = d
        sigma[s] = sg

    betw = defaultdict(int)
    n_tri = defaultdict(int)
    for s in hosts:
        for v in dist[s]:
            if v == s:
                continue
            for t in dist[v]:
                if t == v or t == s:
                    continue
                if t not in dist[s]:
                    continue
                if dist[s][v] + dist[v][t] != dist[s][t]:
                    continue
                betw[v] += _divround_micro(
                    sigma[s][v] * sigma[v][t], sigma[s][t]
                )
                n_tri[v] += 1

    got = {
        r["host"]: (r["degree"], r["n_triples"], r["betw_micro"])
        for r in host_betweenness(spark, SF_DIR).collect()
    }
    assert set(got) == set(hosts)
    for h in hosts:
        assert got[h] == (len(adj[h]), n_tri[h], betw[h]), h

    # Non-degeneracy: genuine multi-hop structure, non-flat profile.
    max_d = max(max(d.values()) for d in dist.values())
    assert max_d >= 2, "all pairs adjacent — betweenness is vacuous"
    vals = sorted(betw[h] for h in hosts)
    nonzero = sum(1 for b in vals if b > 0)
    assert nonzero * 2 >= len(hosts)
    assert vals[-1] >= 3 * vals[len(vals) // 2]


# ------------------------------------------------- postings_wah_size


def _wah_encode_words(doc_ids, n_docs, w=31):
    """Real word-at-a-time WAH encoder: returns (n_literal, n_zero_fills,
    n_one_fills) emitted for the bitmap of doc_ids over [0, n_docs)."""
    ids = set(doc_ids)
    n_words = (n_docs - 1) // w + 1
    lits = zf = of = 0
    run_kind = None  # 'z' | 'o'
    for wi in range(n_words):
        bits = sum(1 for b in range(w) if wi * w + b in ids)
        if bits == 0:
            kind = "z"
        elif bits == w:
            kind = "o"
        else:
            kind = None
        if kind is None:
            if run_kind == "z":
                zf += 1
            elif run_kind == "o":
                of += 1
            run_kind = None
            lits += 1
        elif kind != run_kind:
            if run_kind == "z":
                zf += 1
            elif run_kind == "o":
                of += 1
            run_kind = kind
    if run_kind == "z":
        zf += 1
    elif run_kind == "o":
        of += 1
    return lits, zf, of


def test_wah_size_matches_real_encoder(spark):
    from harvester_spark.analysis import tokenize
    from harvester_spark.operators.index_stats import WAH_W, postings_wah_size

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = docs.collect()
    n_docs = len(rows)
    lists = {
        "_live": [r["doc_id"] for r in rows],
        "_sparse": [r["doc_id"] for r in rows if r["doc_id"] % 37 == 0],
    }
    for t in ("key", "value", "table"):
        lists[t] = [r["doc_id"] for r in rows if t in tokenize(r["text"])]

    got = {r["term"]: r.asDict() for r in postings_wah_size(spark, SF_DIR).collect()}
    assert set(got) == set(lists)
    for t, ids in lists.items():
        lits, zf, of = _wah_encode_words(ids, n_docs, WAH_W)
        g = got[t]
        assert (g["n_literal"], g["n_zero_fills"], g["n_one_fills"]) == (
            lits,
            zf,
            of,
        ), t
        assert g["n_set"] == len(ids)
        assert g["wah_bytes"] == 4 * (lits + zf + of)
        assert g["bitmap_bytes"] == 4 * ((n_docs - 1) // WAH_W + 1)

    # Regime pins: '_live' is the WAH best case — one 1-fill covering
    # every complete word (plus at most a literal tail), no 0-fills.
    live = got["_live"]
    assert live["n_zero_fills"] == 0
    assert live["n_one_fills"] == 1
    assert live["n_literal"] == (1 if n_docs % WAH_W else 0)
    # '_sparse' (every 37th doc over 31-bit words) is the scattered
    # worst case: no word ever fills, fills are all zero-runs.
    sp = got["_sparse"]
    assert sp["n_one_fills"] == 0
    assert sp["n_zero_fills"] >= 1
    assert sp["ratio_milli"] > live["ratio_milli"]


# ------------------------------------------------- learned_bloom_eval


def test_learned_bloom_controls_and_recompute(spark):
    from harvester_spark.operators.sketches import (
        LB_BASE,
        LB_BACKUP_K,
        LB_FPR_DEN,
        LB_LIFT,
        LB_PLAIN_K,
        learned_bloom_eval,
    )

    ids = [
        str(r["doc_id"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]

    def scores(informative):
        out = []
        for x in ids:
            is_key = _h56(f"mem|{x}") % 2 == 0
            s = _h56(f"lb|{x}") % LB_BASE
            if informative and is_key:
                s += LB_LIFT + _h56(f"ll|{x}") % LB_LIFT
            out.append((is_key, s))
        return out

    got = {r["model"]: r.asDict() for r in learned_bloom_eval(spark, SF_DIR).collect()}
    assert set(got) == {"informative", "uninformative"}

    for model, informative in (("informative", True), ("uninformative", False)):
        sc = scores(informative)
        n_keys = sum(1 for k, _ in sc if k)
        n_non = len(sc) - n_keys
        budget = n_non // LB_FPR_DEN
        # tau = smallest s with at most `budget` non-keys at or above it.
        nk_scores = sorted(s for k, s in sc if not k)
        tau = None
        for cand in sorted({s for _, s in sc}):
            if sum(1 for s in nk_scores if s >= cand) <= budget:
                tau = cand
                break
        n_pass = sum(1 for s in nk_scores if s >= tau)
        n_backup = sum(1 for k, s in sc if k and s < tau)
        g = got[model]
        assert (g["n_keys"], g["n_nonkeys"], g["tau"]) == (n_keys, n_non, tau)
        assert (g["n_pass_nonkey"], g["n_backup"]) == (n_pass, n_backup)
        assert g["backup_bits"] == (n_backup * LB_BACKUP_K * 14427) // 10000
        assert g["plain_bits"] == (n_keys * LB_PLAIN_K * 14427) // 10000
        assert g["budget_bits"] == g["plain_bits"] - g["backup_bits"]

    # Planted controls: the informative model must leave a real budget
    # for the model; the uninformative control must lose (backup at the
    # tighter eps covers ~all keys and exceeds the plain filter).
    assert got["informative"]["learned_wins"]
    assert not got["uninformative"]["learned_wins"]
    # The informative model still misses some keys (overlapping
    # distributions) — a perfect separator would make the eval trivial.
    assert got["informative"]["n_backup"] > 0


# ------------------------------------------------- nra_cost_eval


def test_nra_trace_matches_sequential_algorithm(spark):
    from harvester_spark.operators.fulltext_queries import bm25_or_scored
    from harvester_spark.operators.index_stats import (
        NRA_K,
        NRA_SAMPLES,
        fagin_ta_cost_eval,
        nra_cost_eval,
    )
    import pyspark.sql.functions as F

    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    s1m = {
        r["doc_id"]: r["s1"]
        for r in bm25_or_scored(spark, SF_DIR)
        .select(
            "doc_id",
            F.expr("CAST(round(score * 1.0e6, 0) AS BIGINT)").alias("s1"),
        )
        .collect()
    }
    feats = {
        d: (s1m.get(d, 0), (1000000 * nc) // (nc + 1200))
        for d, nc in docs.items()
    }
    n = len(feats)
    l1 = sorted(feats, key=lambda d: (-feats[d][0], d))
    l2 = sorted(feats, key=lambda d: (-feats[d][1], d))
    sample_depths = sorted(
        {i * n // NRA_SAMPLES for i in range(1, NRA_SAMPLES + 1)} - {0}
    )

    # REAL sequential NRA: round-robin sorted access with bound
    # bookkeeping; record the state at each sampled depth.
    seen1, seen2 = {}, {}
    states = {}
    for p in range(1, n + 1):
        d1, d2 = l1[p - 1], l2[p - 1]
        seen1[d1] = feats[d1][0]
        seen2[d2] = feats[d2][1]
        if p not in states and p in set(sample_depths):
            t1, t2 = feats[d1][0], feats[d2][1]
            cand = set(seen1) | set(seen2)
            lb = {d: seen1.get(d, 0) + seen2.get(d, 0) for d in cand}
            ub = {d: seen1.get(d, t1) + seen2.get(d, t2) for d in cand}
            ranked = sorted(cand, key=lambda d: (-lb[d], d))
            topk, rest = ranked[:NRA_K], ranked[NRA_K:]
            kth = lb[topk[-1]] if len(topk) == NRA_K else 0
            max_rest = max((ub[d] for d in rest), default=0)
            stopped = (
                len(topk) == NRA_K and kth >= max_rest and kth >= t1 + t2
            )
            states[p] = {
                "kth": kth,
                "max_rest": max_rest,
                "unseen": t1 + t2,
                "n_seen": len(cand),
                "stopped": stopped,
                "topk_lb": sorted((lb[d] for d in topk), reverse=True),
            }

    trace = {r["p"]: r.asDict() for r in nra_cost_eval(spark, SF_DIR).collect()}
    assert sorted(trace) == sample_depths
    for p in sample_depths:
        sim, got = states[p], trace[p]
        assert got["kth_lb_micro"] == sim["kth"], p
        assert got["max_ub_rest_micro"] == sim["max_rest"], p
        assert got["unseen_ub_micro"] == sim["unseen"], p
        assert got["n_seen"] == sim["n_seen"], p
        assert got["stopped"] == sim["stopped"], p

    # NRA must actually stop inside the trace, and at the first stopped
    # depth its top-k by lower bound is the TRUE top-k by total score.
    stops = [p for p in sample_depths if states[p]["stopped"]]
    assert stops, "NRA never stopped within the sampled trace"
    true_tot = sorted(
        (s1 + s2 for s1, s2 in feats.values()), reverse=True
    )[:NRA_K]
    assert states[stops[0]]["topk_lb"] == true_tot

    # Cross-pin vs TA: sorted-access-only never stops earlier than TA
    # on the same instance/feature pair.
    ta = {
        r["p"]: r["stopped"] for r in fagin_ta_cost_eval(spark, SF_DIR).collect()
    }
    ta_stop = min(p for p, s in ta.items() if s)
    assert stops[0] >= ta_stop


# ------------------------------------------------- events_runs_test


def test_runs_test_matches_pure_python_recompute(spark):
    from collections import Counter

    from harvester_spark.operators.web_econ import (
        RUNS_SIG_MILLI,
        events_runs_test,
    )

    hours = [
        r["h"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("CAST(floor(unix_timestamp(ts) / 3600) AS LONG) AS h")
        .collect()
    ]
    cnt = Counter(hours)
    mn, mx = min(hours), max(hours)
    dens = [(h, cnt.get(h, 0)) for h in range(mn, mx + 1)]
    xs = sorted((x, h) for h, x in dens)
    median = xs[(len(xs) + 1) // 2 - 1][0]
    kept = [(h, x, 1 if x > median else 0) for h, x in dens if x != median]

    def runs_of(seq):
        r = 0
        prev = None
        for s in seq:
            if prev is None or s != prev:
                r += 1
            prev = s
        return r

    orderings = {
        "time": [s for _, _, s in sorted(kept)],
        "shuffled": [
            s
            for _, _, s in sorted(
                kept, key=lambda t: (_h56(f"ro|{t[0]}"), t[0])
            )
        ],
        "sorted": [s for _, _, s in sorted(kept, key=lambda t: (t[1], t[0]))],
    }
    n = len(kept)
    n1 = sum(s for _, _, s in kept)
    n2 = n - n1
    got = {r["ordering"]: r.asDict() for r in events_runs_test(spark, SF_DIR).collect()}
    assert set(got) == set(orderings)
    for name, seq in orderings.items():
        g = got[name]
        R = runs_of(seq)
        assert (g["n_kept"], g["n1"], g["n2"], g["runs"]) == (n, n1, n2, R)
        v = 2 * n1 * n2 * (2 * n1 * n2 - n)
        a = n * (R - 1) - 2 * n1 * n2
        z2 = 1000 * a * a * (n - 1) // v
        assert g["z2_milli"] == z2
        assert g["significant"] == (z2 >= RUNS_SIG_MILLI)

    # Controls: the sorted plant is the maximal-trend sequence — exactly
    # 2 runs and a z^2 that dominates the shuffled null draw by >= 10x
    # (never pin the null's absolute value — it is one chi^2(1) draw).
    assert got["sorted"]["runs"] == 2
    assert got["sorted"]["significant"]
    assert got["sorted"]["z2_milli"] >= 10 * max(got["shuffled"]["z2_milli"], 1)


# ------------------------------------------- sampling_neyman_allocation


def test_neyman_allocation_recompute_and_dominance(spark):
    import math

    from harvester_spark.operators.training_prep import (
        NY_BUDGET,
        NY_SCALES,
        NY_STRATA,
        sampling_neyman_allocation,
    )

    ids = [
        str(r["doc_id"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    strata = {s: [] for s in range(NY_STRATA)}
    for x in ids:
        s = _h56(f"ns|{x}") % NY_STRATA
        strata[s].append((_h56(f"ny|{x}") % 1000) * NY_SCALES[s])

    stats = {}
    for s, ys in strata.items():
        big_n = len(ys)
        s1 = sum(ys)
        ssq = sum(y * y for y in ys)
        s2 = (big_n * ssq - s1 * s1) // (big_n * (big_n - 1))
        s_milli = math.floor(math.sqrt(s2) * 1000 + 0.5)
        stats[s] = (big_n, s2, s_milli)

    def allocate(weights):
        m = NY_BUDGET - NY_STRATA
        wsum = sum(weights.values())
        q = {s: m * w // wsum for s, w in weights.items()}
        rem = {s: m * w % wsum for s, w in weights.items()}
        extra = m - sum(q.values())
        order = sorted(weights, key=lambda s: (-rem[s], s))
        return {
            s: 1 + q[s] + (1 if order.index(s) < extra else 0)
            for s in weights
        }

    expected = {}
    for design, weights in (
        ("proportional", {s: stats[s][0] for s in stats}),
        ("neyman", {s: stats[s][0] * stats[s][2] for s in stats}),
    ):
        alloc = allocate(weights)
        for s in stats:
            big_n, s2, s_milli = stats[s]
            n_h = alloc[s]
            expected[(design, s)] = (
                big_n,
                s2,
                s_milli,
                n_h,
                big_n * (big_n - n_h) * s2 // n_h,
            )

    got = {
        (r["design"], r["stratum"]): (
            r["big_n"],
            r["s2_int"],
            r["s_milli"],
            r["n_alloc"],
            r["var_term_micro"],
        )
        for r in sampling_neyman_allocation(spark, SF_DIR).collect()
    }
    assert got == expected

    # Budget identity: both designs seat exactly NY_BUDGET draws.
    for design in ("proportional", "neyman"):
        assert (
            sum(got[(design, s)][3] for s in range(NY_STRATA)) == NY_BUDGET
        )

    # Dominance: with the 20x planted spread, Neyman's total variance
    # beats proportional by a wide margin (structural via
    # Cauchy-Schwarz; the margin is the plant's doing).
    v = {
        d: sum(got[(d, s)][4] for s in range(NY_STRATA))
        for d in ("proportional", "neyman")
    }
    assert v["neyman"] * 2 < v["proportional"]


# ------------------------------------------- crawl_token_bucket_delay


def test_token_bucket_matches_sequential_regulator(spark):
    from collections import defaultdict

    from harvester_spark.operators.web_econ import (
        TB_HEAVY_DEN,
        TB_HEAVY_NUM,
        TB_HOSTS,
        TB_LIGHT_DEN,
        TB_LIGHT_NUM,
        crawl_token_bucket_delay,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id", "event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS a"
        )
        .collect()
    )
    byhost = defaultdict(list)
    for r in rows:
        uid = r["user_id"]
        h = f"h{_h56(f'tb|{uid}') % TB_HOSTS}"
        byhost[h].append((r["a"], r["event_id"]))

    expected = {}
    for h, arr in byhost.items():
        arr.sort()
        n = len(arr)
        mean_gap = (arr[-1][0] - arr[0][0]) // (n - 1)
        for regime, num, den in (
            ("light", TB_LIGHT_NUM, TB_LIGHT_DEN),
            ("heavy", TB_HEAVY_NUM, TB_HEAVY_DEN),
        ):
            g = num * mean_gap // den
            # REAL sequential regulator.
            prev_start = None
            delays = []
            for a, _ in arr:
                start = a if prev_start is None else max(a, prev_start + g)
                delays.append(start - a)
                prev_start = start
            expected[(regime, h)] = (
                n,
                g,
                sum(1 for d in delays if d > 0),
                max(delays),
                sum(delays),
            )

    got = {
        (r["regime"], r["host"]): (
            r["n_req"],
            r["gap_us"],
            r["n_delayed"],
            r["max_delay_us"],
            r["total_delay_us"],
        )
        for r in crawl_token_bucket_delay(spark, SF_DIR).collect()
    }
    assert got == expected

    # Regime contrast: the overloaded bucket (utilization ~2) must
    # dominate the light one on every host — total delay by >= 10x.
    for h in byhost:
        light, heavy = got[("light", h)], got[("heavy", h)]
        assert heavy[4] >= 10 * max(light[4], 1), h
        assert heavy[2] >= light[2], h


# --------------------------------------- ann_graph_greedy_search_eval


def test_graph_ann_matches_python_router(spark):
    from collections import defaultdict

    from harvester_spark.operators.similarity import (
        GG_BEAM,
        GG_HOPS,
        GG_K,
        GG_NODES,
        N_QUERIES,
        ann_graph_greedy_search_eval,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in rows}
    n_emb = len(vecs)
    stride = max(1, (n_emb - N_QUERIES) // GG_NODES)
    nodes = sorted(
        v
        for v in vecs
        if v >= N_QUERIES and (v - N_QUERIES) % stride == 0
    )

    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        na = math.sqrt(sum(x * x for x in vecs[a]))
        nb = math.sqrt(sum(x * x for x in vecs[b]))
        return round(d / (na * nb), 6)

    # kNN graph (top-GG_K per node, cos desc / vec_id asc).
    graph = {}
    for u in nodes:
        ranked = sorted(
            ((cos(u, v), v) for v in nodes if v != u),
            key=lambda t: (-t[0], t[1]),
        )
        graph[u] = [v for _, v in ranked[:GG_K]]

    entry = min(nodes)
    qcos = {
        q: {v: cos(q, v) for v in nodes} for q in range(N_QUERIES)
    }
    expected = {}
    for q in range(N_QUERIES):
        # greedy
        cur, moves = entry, 0
        for _ in range(GG_HOPS):
            cands = graph[cur] + [cur]
            best = min(cands, key=lambda v: (-qcos[q][v], v))
            if best != cur:
                moves += 1
                cur = best
        expected[("greedy", q)] = (cur, moves, (moves + 1) * (GG_K + 1))
        # beam
        frontier = {entry}
        for _ in range(GG_HOPS):
            exp = set()
            for u in frontier:
                exp.update(graph[u])
                exp.add(u)
            frontier = set(
                sorted(exp, key=lambda v: (-qcos[q][v], v))[:GG_BEAM]
            )
        bbest = min(frontier, key=lambda v: (-qcos[q][v], v))
        expected[(f"beam{GG_BEAM}", q)] = (
            bbest,
            GG_HOPS,
            GG_HOPS * GG_BEAM * (GG_K + 1),
        )

    got = {
        (r["method"], r["qid"]): r.asDict()
        for r in ann_graph_greedy_search_eval(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for key, (node, moves, comps) in expected.items():
        g = got[key]
        assert g["final_node"] == node, key
        assert g["moves"] == moves, key
        assert g["n_dist_comps"] == comps, key
        exact = min(nodes, key=lambda v: (-qcos[key[1]][v], v))
        assert g["exact_node"] == exact
        assert g["hit"] == (node == exact)

    # Structural dominance: the width-GG_BEAM frontier always contains
    # the greedy chain, so beam's final cosine never loses to greedy's.
    for q in range(N_QUERIES):
        assert (
            got[(f"beam{GG_BEAM}", q)]["final_cos"]
            >= got[("greedy", q)]["final_cos"]
        )


# ------------------------------------------------- shard_rebalance_plan


def test_shard_rebalance_recompute_and_bounds(spark):
    from collections import defaultdict

    from harvester_spark.operators.index_stats import (
        RB_HEAVY_MOD,
        RB_HEAVY_MULT,
        RB_NODES,
        RB_SHARDS,
        shard_rebalance_plan,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    base = defaultdict(int)
    for r in rows:
        base[_h56(f"sh|{r['doc_id']}") % RB_SHARDS] += r["n_chars"]
    shards = {
        s: b * (RB_HEAVY_MULT if s % RB_HEAVY_MOD == 0 else 1)
        for s, b in base.items()
    }
    node_of = {s: _h56(f"pl|{s}") % RB_NODES for s in shards}
    total = sum(shards.values())
    cap = -(-total // RB_NODES)

    expected = {}
    for n in range(RB_NODES):
        mine = sorted(
            ((shards[s], s) for s in shards if node_of[s] == n),
            key=lambda t: (-t[0], t[1]),
        )
        csum = 0
        kept_b = moved_b = moved_n = 0
        for b, s in mine:
            csum += b
            if csum <= cap:
                kept_b += b
            else:
                moved_b += b
                moved_n += 1
        load = kept_b + moved_b
        expected[n] = (
            len(mine),
            load,
            cap,
            moved_n,
            moved_b,
            load - moved_b,
            max(0, load - cap),
        )

    got = {
        r["node"]: (
            r["n_shards"],
            r["load_before"],
            r["cap"],
            r["n_moved_out"],
            r["bytes_moved_out"],
            r["load_after"],
            r["excess"],
        )
        for r in shard_rebalance_plan(spark, SF_DIR).collect()
    }
    assert got == expected

    # Feasibility + optimality bounds: every node lands at or under cap,
    # moved bytes never undercut the fractional excess, and the
    # keep-largest overshoot is less than one marginal shard.
    for n, (_, load, c, mn, mb, after, exc) in got.items():
        assert after <= c
        assert mb >= exc
        if mn:
            max_shard = max(
                shards[s] for s in shards if node_of[s] == n
            )
            assert mb - exc < max_shard
    # The plant actually creates work (no vacuous all-balanced pass).
    assert sum(g[6] for g in got.values()) > 0


# ------------------------------------------------- events_cvm_test


def test_cvm_matches_fraction_recompute(spark):
    from collections import Counter
    from fractions import Fraction

    from harvester_spark.operators.web_econ import (
        CVM_SIG_MICRO,
        MW_SHIFT_CENTS,
        events_cvm_test,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("event_id", "CAST(round(value * 100) AS LONG) AS c")
        .collect()
    )
    samples = [(r["c"], _h56(f"cvm|{r['event_id']}") % 2) for r in rows]

    def divround_signed(num, den):
        if num >= 0:
            return (num * 1000000 + den // 2) // den
        return -(((-num) * 1000000 + den // 2) // den)

    got = {r["comparison"]: r.asDict() for r in events_cvm_test(spark, SF_DIR).collect()}
    for comp, shift in (("null_split", 0), ("planted_shift", MW_SHIFT_CENTS)):
        vals = [(c + g * shift, g) for c, g in samples]
        per = Counter()
        ca = Counter()
        for v, g in vals:
            per[v] += 1
            if g == 0:
                ca[v] += 1
        n_a = sum(ca.values())
        n = len(vals)
        n_b = n - n_a
        cuma = cumb = 0
        a_sum = 0
        exact = Fraction(0)
        for v in sorted(per):
            m_v = per[v]
            cuma += ca.get(v, 0)
            cumb += m_v - ca.get(v, 0)
            e = divround_signed(n_b * cuma - n_a * cumb, n_a * n_b)
            a_sum += m_v * e * e
            exact += m_v * (Fraction(cuma, n_a) - Fraction(cumb, n_b)) ** 2
        t_micro = ((a_sum // n) * n_a // n) * n_b // 10**6
        g = got[comp]
        assert (g["n_a"], g["n_b"], g["n_values"]) == (n_a, n_b, len(per))
        assert g["t_micro"] == t_micro, comp
        assert g["significant"] == (t_micro >= CVM_SIG_MICRO)
        # The integer ladder tracks the exact Fraction omega^2 closely.
        omega2 = Fraction(n_a * n_b, n * n) * exact
        assert abs(t_micro - round(omega2 * 10**6)) <= 5, comp

    # Planted controls: the shift is significant and dominates the
    # null draw by >= 10x (the null is one draw, never pinned).
    assert got["planted_shift"]["significant"]
    assert got["planted_shift"]["t_micro"] >= 10 * max(
        got["null_split"]["t_micro"], 1
    )


# ------------------------------------------------- events_moving_median


def test_moving_median_recompute_and_breakdown(spark):
    from collections import Counter

    from harvester_spark.operators.es_aggs import (
        MM_OUT_MOD,
        MM_OUT_MULT,
        MM_WIN,
        events_moving_median,
    )

    hours = [
        r["h"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("CAST(floor(unix_timestamp(ts) / 3600) AS LONG) AS h")
        .collect()
    ]
    cnt = Counter(hours)
    mn, mx = min(hours), max(hours)
    clean = {h: cnt.get(h, 0) for h in range(mn, mx + 1)}
    spiked = {
        h: x * (MM_OUT_MULT if _h56(f"out|{h}") % MM_OUT_MOD == 0 else 1)
        for h, x in clean.items()
    }

    def expected(series):
        out = {}
        for h in series:
            wvals = sorted(
                (series[h2], h2)
                for h2 in range(max(mn, h - (MM_WIN - 1)), h + 1)
            )
            n = len(wvals)
            s = sum(v for v, _ in wvals)
            out[h] = (n, 1000 * s // n, wvals[(n + 1) // 2 - 1][0])
        return out

    exp = {"clean": expected(clean), "spiked": expected(spiked)}
    got = {
        (r["series"], r["hour"]): (r["win_n"], r["mean_milli"], r["median"], r["x"])
        for r in events_moving_median(spark, SF_DIR).collect()
    }
    for series, vals in exp.items():
        src = clean if series == "clean" else spiked
        for h, (n, mean_m, med) in vals.items():
            assert got[(series, h)] == (n, mean_m, med, src[h]), (series, h)

    # Breakdown contrast: the spikes move the windowed mean far more
    # than the windowed median (bounded influence).
    n_spikes = sum(
        1 for h in clean if _h56(f"out|{h}") % MM_OUT_MOD == 0 and clean[h]
    )
    assert n_spikes >= 1, "plant produced no spikes at this scale"
    dev_mean = sum(
        abs(exp["spiked"][h][1] - exp["clean"][h][1]) for h in clean
    )
    dev_med = sum(
        abs(1000 * exp["spiked"][h][2] - 1000 * exp["clean"][h][2])
        for h in clean
    )
    assert dev_mean >= 10 * max(dev_med, 1)


# ------------------------------------------------- events_aipw_ate_eval


def test_aipw_recompute_and_double_robustness(spark):
    from harvester_spark.operators.web_econ import (
        AIPW_NOISE,
        AIPW_STRATA,
        AIPW_TAU_CENTS,
        AIPW_TOL_MILLI,
        events_aipw_ate_eval,
    )

    eids = [
        str(r["event_id"])
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .collect()
    ]
    per = {x: [0, 0, 0, 0] for x in range(AIPW_STRATA)}  # nx, n1, s1, s0
    for e in eids:
        x = _h56(f"cx|{e}") % AIPW_STRATA
        t = 1 if _h56(f"ct|{e}") % 6 < x + 1 else 0
        y = 1000 + x * 500 + t * AIPW_TAU_CENTS + _h56(f"cn|{e}") % AIPW_NOISE
        per[x][0] += 1
        per[x][1] += t
        if t:
            per[x][2] += y
        else:
            per[x][3] += y

    n = sum(v[0] for v in per.values())
    gn1 = sum(v[1] for v in per.values())
    gn0 = n - gn1
    gs1 = sum(v[2] for v in per.values())
    gs0 = sum(v[3] for v in per.values())
    g1 = 1000 * gs1 // gn1
    g0 = 1000 * gs0 // gn0
    def tdiv(a, b):  # truncating division (both engines' sign-split)
        return a // b if a >= 0 else -((-a) // b)

    strat_num = ipw_num = corr_num = 0
    for x, (nx, n1, s1, s0) in per.items():
        n0 = nx - n1
        m1x = 1000 * s1 // n1
        m0x = 1000 * s0 // n0
        strat_num += nx * (m1x - m0x)
        ipw_num += (6000 * s1) // (1 + x) - (6000 * s0) // (5 - x)
        corr_num += tdiv(6 * (1000 * s1 - n1 * g1), 1 + x) - tdiv(
            6 * (1000 * s0 - n0 * g0), 5 - x
        )
    expected = {
        "naive": g1 - g0,
        "ipw": tdiv(ipw_num, n),
        "dr_bad_model": (g1 - g0) + tdiv(corr_num, n),
        "dr_bad_prop": tdiv(strat_num, n),
    }
    got = {r["estimator"]: r.asDict() for r in events_aipw_ate_eval(spark, SF_DIR).collect()}
    assert set(got) == set(expected)
    tau = AIPW_TAU_CENTS * 1000
    for name, est in expected.items():
        g = got[name]
        assert g["est_milli"] == est, name
        assert g["n"] == n
        assert g["abs_err_milli"] == abs(est - tau)
        assert g["recovered"] == (abs(est - tau) <= AIPW_TOL_MILLI)

    # Double robustness, measured: each half-broken DR variant and IPW
    # recover the planted effect; the naive contrast does not — and its
    # bias clears the tolerance by >= 2x.
    for name in ("ipw", "dr_bad_model", "dr_bad_prop"):
        assert got[name]["recovered"], name
    assert not got["naive"]["recovered"]
    assert got["naive"]["abs_err_milli"] >= 2 * AIPW_TOL_MILLI


# --------------------------------------------- host_richclub_coefficient


def test_richclub_matches_pure_python_recompute(spark):
    from collections import Counter

    from harvester_spark.operators.graph import (
        LP_EDGES,
        LP_GS,
        LP_INTRA_MOD,
        LP_INTRA_THR,
        RC_LEVELS,
        host_richclub_coefficient,
    )

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    fan = ((max(len(ids) // 4, 24) + LP_GS - 1) // LP_GS) * LP_GS
    nc = fan // LP_GS
    edges = set()
    for did in ids:
        for e in range(LP_EDGES):
            a = _h56(f"a{e}|{did}") % fan
            if _h56(f"m{e}|{did}") % LP_INTRA_MOD < LP_INTRA_THR:
                b = (_h56(f"r{e}|{did}") % LP_GS) * nc + (a % fan) % nc
            else:
                b = _h56(f"u{e}|{did}") % fan
            if a != b:
                edges.add((f"h{min(a, b)}", f"h{max(a, b)}"))

    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1

    expected = {}
    for k in RC_LEVELS:
        rich = {h for h, d in deg.items() if d > k}
        n_k = len(rich)
        e_k = sum(1 for u, v in edges if u in rich and v in rich)
        phi = (
            (2000 * e_k) // (n_k * (n_k - 1)) if n_k > 1 else None
        )
        expected[k] = (n_k, e_k, phi)

    got = {
        r["k"]: (r["n_rich"], r["e_rich"], r["phi_milli"])
        for r in host_richclub_coefficient(spark, SF_DIR).collect()
    }
    assert got == expected
    # Rich sets shrink with k and the profile is non-degenerate (at
    # least two levels keep a real club).
    sizes = [expected[k][0] for k in RC_LEVELS]
    assert all(a >= b for a, b in zip(sizes, sizes[1:]))
    assert sum(1 for k in RC_LEVELS if (expected[k][2] or 0) > 0) >= 2


# ------------------------------------------- hll_sparse_dense_switch


def test_hll_switch_recompute_and_both_regimes(spark):
    import math

    from harvester_spark.analysis import tokenize
    from harvester_spark.operators.sketches import (
        HS_CUTS,
        HS_P,
        hll_sparse_dense_switch,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    m = 1 << HS_P
    dense_bytes = m * 6 // 8
    expected = {}
    for cut in HS_CUTS:
        shingles = set()
        for r in rows:
            if r["doc_id"] >= cut:
                continue
            ts = tokenize(r["text"])
            shingles.update(
                f"{a} {b}" for a, b in zip(ts, ts[1:])
            )
        idx = {_h56(f"hs|{s}") % m for s in shingles}
        est = round(1e6 * m * math.log(m / (m - len(idx))))
        expected[cut] = (
            len(shingles),
            len(idx),
            4 * len(idx),
            "sparse" if 4 * len(idx) <= dense_bytes else "dense",
            est,
        )

    got = {
        r["cut_docs"]: (
            r["n_items"],
            r["n_idx"],
            r["sparse_bytes"],
            r["rep"],
            r["est_lc_micro"],
        )
        for r in hll_sparse_dense_switch(spark, SF_DIR).collect()
    }
    for cut in HS_CUTS:
        e, g = expected[cut], got[cut]
        assert g[:4] == e[:4], cut
        assert abs(g[4] - e[4]) <= 2, cut  # ln libm slack
        # LinearCounting tracks truth closely at these loads (<= 12%).
        assert abs(g[4] - e[0] * 10**6) <= e[0] * 120000, cut

    # Both representations must appear across the profile.
    reps = {got[c][3] for c in HS_CUTS}
    assert reps == {"sparse", "dense"}


# ------------------------------------------- events_tost_equivalence


def test_tost_recompute_and_direction_controls(spark):
    from harvester_spark.operators.web_econ import (
        TOST_DELTA,
        TOST_NOISE,
        TOST_SHIFT,
        TOST_T2_2SIDED_MILLI,
        TOST_TCRIT2_MILLI,
        events_tost_equivalence,
    )

    eids = [
        str(r["event_id"])
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .collect()
    ]
    d0 = [_h56(f"td|{e}") % (2 * TOST_NOISE + 1) - TOST_NOISE for e in eids]

    def tdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    got = {
        r["comparison"]: r.asDict()
        for r in events_tost_equivalence(spark, SF_DIR).collect()
    }
    for comp, shift in (("centered", 0), ("shifted", TOST_SHIFT)):
        ds = [d + shift for d in d0]
        n = len(ds)
        s = sum(ds)
        q = sum(d * d for d in ds)
        var_num = n * q - s * s
        mlo = tdiv(s + n * TOST_DELTA, n)
        mhi = tdiv(s - n * TOST_DELTA, n)
        mean_f = tdiv(s, n)
        lower = (s + n * TOST_DELTA) > 0 and 1000 * mlo * mlo * (
            n - 1
        ) >= TOST_TCRIT2_MILLI * var_num // n
        upper = (s - n * TOST_DELTA) < 0 and 1000 * mhi * mhi * (
            n - 1
        ) >= TOST_TCRIT2_MILLI * var_num // n
        ttest = (
            1000 * mean_f * mean_f * (n - 1)
            >= TOST_T2_2SIDED_MILLI * var_num // n
        )
        g = got[comp]
        assert (g["n"], g["s_sum"], g["q_sum"]) == (n, s, q)
        assert g["mean_floor_cents"] == mean_f
        assert (g["lower_reject"], g["upper_reject"]) == (lower, upper)
        assert g["equivalent"] == (lower and upper)
        assert g["ttest_significant"] == ttest

    # Direction controls: only TOST certifies the centered plant
    # (the silent t-test is NOT evidence of equivalence), and the
    # shifted plant fails equivalence while the t-test fires.
    assert got["centered"]["equivalent"]
    assert not got["centered"]["ttest_significant"]
    assert not got["shifted"]["equivalent"]
    assert got["shifted"]["ttest_significant"]


# ------------------------------------------- events_test_power_curve


def test_power_curve_recompute_and_monotone(spark):
    import math
    from collections import Counter

    from harvester_spark.operators.web_econ import (
        CVM_SIG_MICRO,
        MW_SIG_MILLI,
        PW_KS_C2_MICRO,
        PW_SHIFTS,
        PW_T_CRIT_MICRO,
        events_test_power_curve,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("event_id", "CAST(round(value * 100) AS LONG) AS c")
        .collect()
    )
    samples = [(r["c"], _h56(f"pw|{r['event_id']}") % 2) for r in rows]

    def divround_signed(num, den):
        if num >= 0:
            return (num * 1000000 + den // 2) // den
        return -(((-num) * 1000000 + den // 2) // den)

    expected = {}
    for shift in PW_SHIFTS:
        vals = [(c + g * shift, g) for c, g in samples]
        per = Counter()
        ca = Counter()
        for v, g in vals:
            per[v] += 1
            if g == 0:
                ca[v] += 1
        n_a = sum(ca.values())
        n = len(vals)
        n_b = n - n_a
        # shared sweep
        cuma = cumb = cbprev = 0
        r2a = tie_t = d_raw = a_sum = 0
        s1 = q1 = s2 = q2 = 0
        for v, g in vals:
            if g == 0:
                s1 += v
                q1 += v * v
            else:
                s2 += v
                q2 += v * v
        for v in sorted(per):
            m = per[v]
            a = ca.get(v, 0)
            r2a += a * (2 * cbprev + m + 1)
            tie_t += m * m * m - m
            cbprev += m
            cuma += a
            cumb += m - a
            d_raw = max(d_raw, abs(n_b * cuma - n_a * cumb))
            e = divround_signed(n_b * cuma - n_a * cumb, n_a * n_b)
            a_sum += m * e * e
        u2 = r2a - n_a * (n_a + 1)
        mw = (
            3000
            * (((u2 - n_a * n_b) * (u2 - n_a * n_b)) // (n_a * n_b))
            * (n - 1)
        ) // ((n * n * n - n - tie_t) // n)
        ks = 1000000 * d_raw // (n_a * n_b)
        ks_sig = ks * ks >= (PW_KS_C2_MICRO * n * 1000000) // (n_a * n_b)
        cvm = ((a_sum // n) * n_a // n) * n_b // 10**6
        t = round(
            1e6
            * ((s1 / n_a) - (s2 / n_b))
            / math.sqrt(
                ((q1 - s1 * s1 / n_a) / (n_a - 1)) / n_a
                + ((q2 - s2 * s2 / n_b) / (n_b - 1)) / n_b
            )
        )
        expected[shift] = {
            "welch_t": (abs(t), abs(t) >= PW_T_CRIT_MICRO),
            "mannwhitney": (mw, mw >= MW_SIG_MILLI),
            "ks": (ks, ks_sig),
            "cvm": (cvm, cvm >= CVM_SIG_MICRO),
        }

    got = {
        (r["shift_cents"], r["test"]): (r["stat"], r["significant"])
        for r in events_test_power_curve(spark, SF_DIR).collect()
    }
    for shift in PW_SHIFTS:
        for test, (stat, sig) in expected[shift].items():
            gstat, gsig = got[(shift, test)]
            if test == "welch_t":
                assert abs(gstat - stat) <= 2, (shift, test)  # float sqrt
            else:
                assert gstat == stat, (shift, test)
            assert gsig == sig, (shift, test)

    # Curve contract: the null split is silent on all four tests, every
    # planted shift fires all four, and each test's statistic grows
    # monotonically along the shift grid.
    tests = ("welch_t", "mannwhitney", "ks", "cvm")
    for test in tests:
        assert not got[(0, test)][1], test
        for shift in PW_SHIFTS[1:]:
            assert got[(shift, test)][1], (shift, test)
        curve = [got[(s, test)][0] for s in PW_SHIFTS]
        assert all(a < b for a, b in zip(curve, curve[1:])), test
