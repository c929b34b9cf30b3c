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
