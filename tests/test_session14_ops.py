"""Semantics + parity guards for session-14 operators.

What each test pins:
- events_acf: full pure-Python recompute of the integer ACF pipeline
  (hour densification, mean-clearing y = n·x − S, exact num/den int64
  sums, sign-split milli division) from the raw parquet — every value
  at every lag. Plus non-degeneracy: the series genuinely varies
  (den > 0) and at least one lag has |acf| > 0.
- events_survival_km: full pure-Python Kaplan-Meier recompute
  (subjects, horizon censoring, risk-set cumsum, per-step micro-nat
  ln, cumulative log-survival) — exact. Plus BOTH classes must be
  present (deaths ≥ 5, censored ≥ 1 — a horizon that censors nobody
  proves nothing) and the curve is monotone non-increasing.
- events_did_abtest: planted-effect recovery — the purchase arm's DiD
  must land near the planted DID_BOOST_CENTS while the un-boosted view
  (placebo) arm stays near zero; the estimator separates signal from
  noise instead of reading back a constant.
- es_frequent_item_sets: full pure-Python Apriori recompute from the
  same md5 basket synthesis — the exact (itemset, support) multiset at
  every size. Plus structural pins: all three sizes non-empty (the
  support gradient is real), downward closure (every sub-itemset of a
  frequent itemset is frequent with ≥ its support), and cold items
  (id ≥ FIS_HOT) never appear (the L1 prune actually bit).
- host_community_conductance: exact identities against the modularity
  frame — Σe_c ≤ m, cut = d_c − 2e_c ≥ 0, Σd_c = 2m, phi ∈ [0, 1e6]
  — plus a full Python recompute of every community's conductance from
  the collected labels and the re-derived edge list.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _h56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


# ------------------------------------------------------- events_acf


def test_events_acf_matches_pure_python_recompute(spark):
    from harvester_spark.operators.web_econ import ACF_LAGS, events_acf

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("CAST(unix_timestamp(ts) AS LONG) AS se")
        .collect()
    )
    hours = [r["se"] // 3600 for r in rows]
    mn, mx = min(hours), max(hours)
    counts = Counter(hours)
    xs = [counts.get(h, 0) for h in range(mn, mx + 1)]
    n, s = len(xs), sum(xs)
    ys = [n * x - s for x in xs]
    den = sum(y * y for y in ys)
    expect = {}
    for k in ACF_LAGS:
        num = sum(ys[i] * ys[i + k] for i in range(n - k))
        if num >= 0:
            milli = (1000 * num) // den
        else:
            milli = -((1000 * -num) // den)
        expect[k] = (n, num, den, milli)

    got = {
        r["lag"]: (r["n_hours"], r["num"], r["den"], r["acf_milli"])
        for r in events_acf(spark, SF_DIR).collect()
    }
    assert got == expect
    assert den > 0
    assert any(abs(v[3]) > 0 for v in got.values())


# ----------------------------------------------- events_survival_km


def test_survival_km_matches_pure_python_recompute(spark):
    from harvester_spark.operators.web_econ import (
        KM_HORIZON_H,
        events_survival_km,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "CAST(unix_timestamp(ts) AS LONG) AS se"
        )
        .collect()
    )
    t0 = {}
    for r in rows:
        if r["event_type"] == "signup":
            u = r["user_id"]
            t0[u] = min(t0.get(u, r["se"]), r["se"])
    gap = {}
    for r in rows:
        u = r["user_id"]
        if r["event_type"] == "purchase" and u in t0 and r["se"] > t0[u]:
            g = r["se"] - t0[u]
            gap[u] = min(gap.get(u, g), g)
    subj = []
    for u in t0:
        g = gap.get(u)
        if g is not None and g // 3600 < KM_HORIZON_H:
            subj.append((g // 3600, 1))
        else:
            subj.append((KM_HORIZON_H, 0))
    times = sorted({t for t, _ in subj})
    n_total = len(subj)
    expect = {}
    consumed = 0
    cum = 0
    for t in times:
        d = sum(1 for tt, e in subj if tt == t and e == 1)
        c = sum(1 for tt, e in subj if tt == t and e == 0)
        n_risk = n_total - consumed
        if d == 0:
            step = 0
        elif n_risk == d:
            step = None
        else:
            x = math.log((n_risk - d) / n_risk)
            step = -math.floor(-x * 1e6 + 0.5)
        if step is not None:
            cum += step
        expect[t] = (n_risk, d, c, step, cum)
        consumed += d + c

    got = {
        r["t_h"]: (
            r["n_risk"], r["d"], r["c"], r["step_micro"], r["cum_lns_micro"]
        )
        for r in events_survival_km(spark, SF_DIR).collect()
    }
    assert got == expect

    deaths = sum(v[1] for v in got.values())
    censored = sum(v[2] for v in got.values())
    assert deaths >= 5 and censored >= 1  # both classes genuinely present
    cums = [got[t][4] for t in sorted(got)]
    assert all(b <= a for a, b in zip(cums, cums[1:]))  # S non-increasing


# ----------------------------------------------- events_did_abtest


def test_did_recovers_planted_effect_and_placebo_stays_flat(spark):
    from harvester_spark.operators.web_econ import (
        DID_BOOST_CENTS,
        events_did_abtest,
    )

    got = {
        r["event_type"]: r["did_millicents"]
        for r in events_did_abtest(spark, SF_DIR).collect()
    }
    planted = DID_BOOST_CENTS * 1000  # milli-cents
    assert abs(got["purchase"] - planted) < planted // 2
    assert abs(got["view"]) < planted // 2
    assert abs(got["purchase"]) > 2 * abs(got["view"])


# ------------------------------------------- es_frequent_item_sets


def _fis_baskets_py(doc_ids):
    from harvester_spark.operators.es_aggs import FIS_COLD, FIS_HOT, FIS_SLOTS

    baskets = {}
    for d in doc_ids:
        items = set()
        for slot in range(FIS_SLOTS):
            h = _h56(f"fis|{d}|{slot}")
            if h % 4 < 3:
                items.add(f"i{(h // 4) % FIS_HOT}")
            else:
                items.add(f"i{FIS_HOT + (h // 4) % FIS_COLD}")
        baskets[d] = items
    return baskets


def test_frequent_item_sets_matches_pure_python_apriori(spark):
    from itertools import combinations

    from harvester_spark.operators.es_aggs import (
        FIS_HOT,
        FIS_MINSUP_DIV,
        es_frequent_item_sets,
    )

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    baskets = _fis_baskets_py(doc_ids)
    minsup = max(len(doc_ids) // FIS_MINSUP_DIV, 2)

    support = Counter()
    for items in baskets.values():
        for k in (1, 2, 3):
            for combo in combinations(sorted(items), k):
                support[combo] += 1
    expect = {
        combo: s for combo, s in support.items() if s >= minsup
    }

    got = {}
    for r in es_frequent_item_sets(spark, SF_DIR).collect():
        combo = tuple(
            x for x in (r["item_a"], r["item_b"], r["item_c"]) if x
        )
        assert len(combo) == r["k"]
        got[combo] = r["support"]
    assert got == expect

    sizes = Counter(len(c) for c in got)
    assert sizes[1] > 0 and sizes[2] > 0 and sizes[3] > 0
    # downward closure: every sub-itemset is frequent with >= support
    from itertools import combinations as combos

    for itemset, s in got.items():
        for k in range(1, len(itemset)):
            for sub in combos(itemset, k):
                assert sub in got and got[sub] >= s
    # the L1 prune bit: cold items never survive
    for itemset in got:
        for item in itemset:
            assert int(item[1:]) < FIS_HOT


# ------------------------------------- host_community_conductance


def test_conductance_matches_python_recompute_and_identities(spark):
    from harvester_spark.operators.graph import (
        host_community_conductance,
        host_labelprop_communities,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    fan = max(len(docs) // 2, 20)
    edges = set()
    for r in docs:
        dst = f"h{_h56(str(r['doc_id'])) % fan}"
        src = r["source"]
        if src != dst:
            edges.add((min(src, dst), max(src, dst)))
    m = len(edges)
    labels = {
        r["host"]: r["label"]
        for r in host_labelprop_communities(spark, SF_DIR).collect()
    }
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    e_c = Counter()
    for a, b in edges:
        if labels[a] == labels[b]:
            e_c[labels[a]] += 1
    d_c = Counter()
    n_hosts = Counter()
    for h, lab in labels.items():
        d_c[lab] += deg[h]
        n_hosts[lab] += 1
    expect = {}
    for lab in n_hosts:
        cut = d_c[lab] - 2 * e_c[lab]
        mv = min(d_c[lab], 2 * m - d_c[lab])
        phi = None if mv == 0 else (1_000_000 * cut) // mv
        expect[lab] = (n_hosts[lab], e_c[lab], d_c[lab], cut, phi)

    got = {
        r["label"]: (r["n_hosts"], r["e_c"], r["d_c"], r["cut"], r["phi_micro"])
        for r in host_community_conductance(spark, SF_DIR).collect()
    }
    assert got == expect

    assert sum(v[1] for v in got.values()) <= m
    assert sum(v[2] for v in got.values()) == 2 * m
    for _, (_, _, _, cut, phi) in got.items():
        assert cut >= 0
        if phi is not None:
            assert 0 <= phi <= 1_000_000


# ------------------------------------- ft_fairness_exposure_eval


def _bm25_rank(corpus, terms, k):
    nd = len(corpus)
    tf = {d: Counter(ts) for d, ts in corpus.items()}
    dls = {d: len(ts) for d, ts in corpus.items()}
    avgdl = sum(dls.values()) / nd
    scored = {}
    for t in terms:
        df = sum(1 for d in corpus if tf[d][t] > 0)
        if df == 0:
            continue
        idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
        for d in corpus:
            f = tf[d][t]
            if f:
                scored[d] = scored.get(d, 0.0) + idf * (f * 2.2) / (
                    f + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl)
                )
    ranked = sorted(
        ((round(s, 6), d) for d, s in scored.items()),
        key=lambda x: (-x[0], x[1]),
    )
    return [d for _, d in ranked[:k]]


@pytest.fixture(scope="module")
def corpus14(spark):
    import re as _re

    tok = _re.compile(r"\W+", _re.ASCII)
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return {
        r["doc_id"]: [t for t in tok.split(r["text"].lower()) if t]
        for r in rows
    }


def test_fairness_exposure_matches_python_recompute(spark, corpus14):
    from harvester_spark.operators.ranking_ext import (
        FAIR_K,
        QPP_QUERIES,
        ft_fairness_exposure_eval,
    )

    expect = {}
    for q, terms in QPP_QUERIES.items():
        top = _bm25_rank(corpus14, terms, FAIR_K)
        n_tot = len(top)
        exp_tot = sum(1 << (FAIR_K - r) for r in range(1, n_tot + 1))
        per = {}
        for r, d in enumerate(top, start=1):
            g = _h56(f"grp|{d}") % 2
            nd, eu = per.get(g, (0, 0))
            per[g] = (nd + 1, eu + (1 << (FAIR_K - r)))
        for g, (nd, eu) in per.items():
            expect[(q, g)] = (
                nd,
                eu,
                (1_000_000 * eu) // exp_tot,
                (1_000_000 * nd) // n_tot,
                (1_000_000 * eu) // exp_tot - (1_000_000 * nd) // n_tot,
            )

    got = {
        (r["query_id"], r["grp"]): (
            r["n_docs"], r["exp_units"], r["exp_share_micro"],
            r["rel_share_micro"], r["disparity_micro"],
        )
        for r in ft_fairness_exposure_eval(spark, SF_DIR).collect()
    }
    assert got == expect
    # both groups present for every query; shares sum to ~1e6 (floor slack)
    for q in QPP_QUERIES:
        assert (q, 0) in got and (q, 1) in got
        assert 999_998 <= got[(q, 0)][2] + got[(q, 1)][2] <= 1_000_000
        assert got[(q, 0)][4] + got[(q, 1)][4] in (-1, 0, 1, -2, 2)


# -------------------------------------- ft_rocchio_rerank_topk


def test_rocchio_matches_python_recompute_and_moves_ranking(spark, corpus14):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.retrieval import (
        RO_EXP,
        RO_FDBK,
        RO_TOPK,
        ft_rocchio_rerank_topk,
    )

    nd = len(corpus14)
    tf = {d: Counter(ts) for d, ts in corpus14.items()}
    df = Counter()
    for d in corpus14:
        for t in tf[d]:
            df[t] += 1
    idf_m = {
        t: math.floor(
            math.log(1.0 + (nd - df[t] + 0.5) / (df[t] + 0.5)) * 1e3 + 0.5
        )
        for t in df
    }
    fdbk = _bm25_rank(corpus14, BM25_TERMS, RO_FDBK)
    cen = Counter()
    for d in fdbk:
        for t, f in tf[d].items():
            cen[t] += f * idf_m[t]
    ranked_terms = sorted(cen, key=lambda t: (-cen[t], t))
    vocab = set(ranked_terms[:RO_EXP]) | (set(BM25_TERMS) & set(cen))
    # query terms outside the centroid still carry their alpha term
    vocab |= set(t for t in BM25_TERMS if t in df)
    wq = {}
    for t in vocab:
        alpha = 4 * RO_FDBK * idf_m[t] if t in BM25_TERMS else 0
        wq[t] = alpha + 3 * cen.get(t, 0)
    scores = {}
    for d in corpus14:
        s = 0
        for t in vocab:
            f = tf[d].get(t, 0)
            if f:
                s += wq[t] * f * idf_m[t]
        if s:
            scores[d] = s
    expect = sorted(
        ((s, d) for d, s in scores.items()), key=lambda x: (-x[0], x[1])
    )[:RO_TOPK]
    expect = [
        (r, d, s) for r, (s, d) in enumerate(expect, start=1)
    ]

    got = [
        (r["rank"], r["doc_id"], r["score_int"])
        for r in ft_rocchio_rerank_topk(spark, SF_DIR)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect

    # the feedback expansion must genuinely move the ranking vs plain BM25
    bm25_top = _bm25_rank(corpus14, BM25_TERMS, RO_TOPK)
    assert [d for _, d, _ in got] != bm25_top


# --------------------------- postings_intersection_cost_eval


def test_intersection_cost_matches_python_and_regime_split(spark, corpus14):
    from bisect import bisect_right

    from harvester_spark.operators.index_stats import (
        ISECT_PAIRS,
        postings_intersection_cost_eval,
    )

    post = {}
    for d, ts in corpus14.items():
        for t in set(ts):
            post.setdefault(t, set()).add(d)

    expect = {}
    for ta, tb in ISECT_PAIRS:
        a, b = sorted((ta, tb), key=lambda t: (len(post[t]), t))
        small = sorted(post[a])
        large = sorted(post[b])
        prev = 0
        gallop = 0
        for x in small:
            r = bisect_right(large, x)
            g = r - prev
            gallop += 2 * ((g + 1).bit_length() - 1) + 1
            prev = r
        expect[(a, b)] = (
            len(small), len(large), len(post[a] & post[b]),
            len(small) + len(large), gallop,
        )

    got = {
        (r["term_small"], r["term_large"]): (
            r["n_small"], r["n_large"], r["inter_size"],
            r["merge_cost"], r["gallop_cost"],
        )
        for r in postings_intersection_cost_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # regime split: skewed pairs gallop, balanced pairs merge
    for (a, b), (ns, nl, _, merge, gallop) in got.items():
        if nl >= 8 * ns:
            assert gallop < merge
        if nl <= 2 * ns:
            assert merge < gallop


# --------------------------------------------- es_categorize_text


def test_categorize_text_collapse_is_real_and_exact(spark):
    from harvester_spark.operators.es_aggs import es_categorize_text

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    import re as _re

    tok = _re.compile(r"\W+", _re.ASCII)
    msgs = []
    for r in ev:
        cents = round(r["value"] * 100)
        msgs.append(
            (
                r["event_id"],
                r["user_id"],
                f"{r['event_type']} user {r['user_id']} took {cents} ms "
                f"{r['props']}",
            )
        )
    expect = {}
    for eid, uid, m in msgs:
        cat = " ".join(
            t for t in tok.split(m.lower())
            if t and not any(c.isdigit() for c in t)
        )
        n, users, ex = expect.get(cat, (0, set(), eid))
        users.add(uid)
        expect[cat] = (n + 1, users, min(ex, eid))
    expect = {
        c: (n, len(users), ex) for c, (n, users, ex) in expect.items()
    }

    got = {
        r["category"]: (r["n_msgs"], r["n_users"], r["example_event_id"])
        for r in es_categorize_text(spark, SF_DIR).collect()
    }
    assert got == expect

    # the digit-drop rule is load-bearing: near-unique messages collapse
    assert len({m for _, _, m in msgs}) > 0.9 * len(msgs)
    assert len(got) <= 10
    assert sum(v[0] for v in got.values()) == len(msgs)
    for cat in got:
        assert not any(c.isdigit() for c in cat)


# --------------------------------------------------- ft_xquad_topk


def test_xquad_matches_python_recompute_and_diversifies(spark, corpus14):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.retrieval import XQ_C, XQ_K, ft_xquad_topk

    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    nd = len(corpus14)
    tf = {d: Counter(ts) for d, ts in corpus14.items()}
    dls = {d: len(ts) for d, ts in corpus14.items()}
    avgdl = sum(dls.values()) / nd
    scored = {}
    for t in BM25_TERMS:
        df = sum(1 for d in corpus14 if tf[d][t] > 0)
        if df == 0:
            continue
        idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
        for d in corpus14:
            f = tf[d][t]
            if f:
                scored[d] = scored.get(d, 0.0) + idf * (f * 2.2) / (
                    f + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl)
                )
    or_scores = {d: round(s, 6) for d, s in scored.items()}
    pool_l = sorted(
        ((round(s * 1e6), d) for d, s in or_scores.items()),
        key=lambda x: (-x[0], x[1]),
    )[:XQ_C]
    relmax = max(s for s, _ in pool_l)
    rel = {d: (1_000_000 * s) // relmax for s, d in pool_l}
    aspects = sorted({langs[d] for d in rel})
    na = len(aspects)

    def p_da(d, a):
        r = rel[d]
        return (7 * r) // 10 if langs[d] == a else r // 10

    novel = {a: 1_000_000 for a in aspects}
    picked = []
    expect = []
    for k in range(1, XQ_K + 1):
        best = None
        for d in rel:
            if d in picked:
                continue
            cov = sum(
                (p_da(d, a) * novel[a]) // 1_000_000 for a in aspects
            )
            obj = 500 * na * rel[d] + 500 * cov
            key = (-obj, d)
            if best is None or key < best[0]:
                best = (key, d, rel[d], cov, obj)
        _, d, r, cov, obj = best
        picked.append(d)
        expect.append((k, d, langs[d], r, cov, obj))
        for a in aspects:
            novel[a] = (novel[a] * (1_000_000 - p_da(d, a))) // 1_000_000

    got = [
        (r["pick"], r["doc_id"], r["lang"], r["rel_norm"], r["cov_units"],
         r["obj"])
        for r in ft_xquad_topk(spark, SF_DIR).orderBy("pick").collect()
    ]
    assert got == expect

    # diversification genuinely reorders vs pure relevance, and the
    # early picks cover more facet values than the relevance prefix
    rel_order = [d for _, d in sorted(
        ((rel[d], d) for d in rel), key=lambda x: (-x[0], x[1])
    )][:XQ_K]
    assert [g[1] for g in got] != rel_order
    k0 = min(5, XQ_K)
    assert len({g[2] for g in got[:k0]}) >= len(
        {langs[d] for d in rel_order[:k0]}
    )


# --------------------------------------------- host_bowtie_classify


def test_bowtie_matches_python_bfs_and_all_classes(spark):
    from harvester_spark.operators.graph import BT_HOPS, host_bowtie_classify

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    fan = max(len(docs) // 2, 20)
    edges = set()
    for r in docs:
        src = r["source"]
        d1 = f"h{_h56(str(r['doc_id'])) % fan}"
        d2 = f"h{_h56('rev|' + str(r['doc_id'])) % fan}"
        if src != d1:
            edges.add((src, d1))
        if d2 != src:
            edges.add((d2, src))
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    seed = sorted(nodes, key=lambda h: (-deg[h], h))[0]
    fwd_adj, bwd_adj = {}, {}
    for a, b in edges:
        fwd_adj.setdefault(a, []).append(b)
        bwd_adj.setdefault(b, []).append(a)

    def bfs(adj):
        reach = {seed}
        frontier = {seed}
        for _ in range(BT_HOPS):
            nxt = set()
            for h in frontier:
                nxt.update(adj.get(h, ()))
            frontier = nxt - reach
            reach |= nxt
        return reach

    fwd, bwd = bfs(fwd_adj), bfs(bwd_adj)
    expect = {}
    for h in nodes:
        f, b = h in fwd, h in bwd
        cls = "CORE" if f and b else "IN" if b else "OUT" if f else "DISC"
        expect[h] = (f, b, cls)

    got = {
        r["host"]: (r["in_fwd"], r["in_bwd"], r["cls"])
        for r in host_bowtie_classify(spark, SF_DIR).collect()
    }
    assert got == expect
    classes = Counter(v[2] for v in got.values())
    assert all(classes[c] > 0 for c in ("CORE", "IN", "OUT", "DISC"))


# --------------------------------------------- click_model_cascade


def test_cascade_matches_python_recompute_and_recovers_alpha(spark):
    from harvester_spark.operators.click_models import (
        CAS_DEPTH,
        CAS_ITEMS,
        click_model_cascade,
    )

    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .collect()
    ]
    n_ex = Counter()
    n_ck = Counter()
    for e in eids:
        slots = []
        for r in range(1, CAS_DEPTH + 1):
            item = _h56(f"cs|{e}|{r}") % CAS_ITEMS
            u = _h56(f"cu|{e}|{r}") % 1000
            a_true = 150 + (item * 37) % 700
            slots.append((r, item, u < a_true))
        fc = next((r for r, _, att in slots if att), None)
        for r, item, att in slots:
            if r <= (fc or CAS_DEPTH):
                n_ex[item] += 1
                if att and r == fc:
                    n_ck[item] += 1
    expect = {
        item: (
            n_ex[item],
            n_ck[item],
            (1000 * n_ck[item]) // n_ex[item],
            150 + (item * 37) % 700,
        )
        for item in n_ex
    }

    got = {
        r["item"]: (
            r["n_examined"], r["n_clicked"], r["alpha_hat_milli"],
            r["alpha_true_milli"],
        )
        for r in click_model_cascade(spark, SF_DIR).collect()
    }
    assert got == expect

    hi = [v[2] for v in got.values() if v[3] >= 700]
    lo = [v[2] for v in got.values() if v[3] <= 300]
    assert hi and lo
    assert sum(hi) / len(hi) > sum(lo) / len(lo) + 200  # planted spread found
    assert len({v[2] for v in got.values()}) > 1  # not constant


# ------------------------------------------------ suggest_mrr_eval


def test_suggest_mrr_matches_python_and_monotone_in_prefix_len(spark, corpus14):
    from harvester_spark.operators.web_econ import SUG_MAX_PLEN, suggest_mrr_eval

    df = Counter()
    cf = Counter()
    for ts in corpus14.values():
        cf.update(ts)
        df.update(set(ts))

    expect = {}
    for plen in range(1, SUG_MAX_PLEN + 1):
        buckets = {}
        for t in df:
            if len(t) >= plen:
                buckets.setdefault(t[:plen], []).append(t)
        wrr = 0
        w_tot = 0
        n = 0
        for pre, terms in buckets.items():
            order = sorted(terms, key=lambda t: (-df[t], t))
            for rank, t in enumerate(order, start=1):
                wrr += cf[t] * (1_000_000 // rank)
                w_tot += cf[t]
                n += 1
        expect[plen] = (n, w_tot, wrr // w_tot)

    got = {
        r["plen"]: (r["n_trials"], r["w_total"], r["mrr_micro"])
        for r in suggest_mrr_eval(spark, SF_DIR).collect()
    }
    assert got == expect
    mrrs = [got[p][2] for p in sorted(got)]
    assert all(b >= a for a, b in zip(mrrs, mrrs[1:]))  # nested buckets
    assert mrrs[-1] > mrrs[0]  # longer prefixes genuinely help


# ------------------------------------------- events_holt_winters


def test_holt_winters_matches_fraction_recurrence_and_seasonal_law(spark):
    from fractions import Fraction

    from harvester_spark.operators.es_aggs import (
        HW_M,
        HW_WIN,
        _HW_DEN,
        _HW_WEIGHTS,
        events_holt_winters,
    )

    def hw_forecast(vs):
        # independent implementation: the recurrence on VALUES, not the
        # weight vector the operator compiles to
        a = b = g = Fraction(1, 2)
        m = HW_M
        l = Fraction(sum(vs[:m]), m)
        tr = (Fraction(sum(vs[m:2 * m]), m) - Fraction(sum(vs[:m]), m)) / m
        s = [Fraction(v) - l for v in vs[:m]]
        for k in range(m, len(vs)):
            l_prev = l
            l = a * (vs[k] - s[k - m]) + (1 - a) * (l + tr)
            tr = b * (l - l_prev) + (1 - b) * tr
            s.append(g * (vs[k] - l) + (1 - g) * s[k - m])
        return l + tr + s[len(vs) + 1 - m - 1]

    # the compiled weights == the recurrence, on arbitrary integer series
    probe = [3, 14, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9]
    w_val = Fraction(
        sum(w * v for w, v in zip(_HW_WEIGHTS, probe)), _HW_DEN
    )
    assert w_val == hw_forecast(probe)

    # pure-seasonal law: a perfectly periodic series forecasts exactly
    S = [7, -3, -9, 5]
    vs = [S[k % HW_M] for k in range(HW_WIN)]
    assert hw_forecast(vs) == S[HW_WIN % HW_M]

    # real data: recompute every output row from the densified series
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "event_type", "CAST(unix_timestamp(ts) AS LONG) DIV 3600 AS hour"
        )
        .collect()
    )
    mn = min(r["hour"] for r in rows)
    mx = max(r["hour"] for r in rows)
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], Counter())[r["hour"]] += 1
    expect = {}
    for et, cnt in series.items():
        xs = [cnt.get(h, 0) for h in range(mn, mx + 1)]
        for i in range(HW_WIN - 1, len(xs)):
            win = xs[i - HW_WIN + 1 : i + 1]
            num = 1000 * sum(w * v for w, v in zip(_HW_WEIGHTS, win))
            milli = num // _HW_DEN if num >= 0 else -((-num) // _HW_DEN)
            expect[(et, mn + i)] = (win[-1], milli)

    got = {
        (r["event_type"], r["hour_bucket"]): (r["c"], r["hw_milli"])
        for r in events_holt_winters(spark, SF_DIR).collect()
    }
    assert got == expect


# ------------------------------------------ ranker_calibration_ece


def test_calibration_ece_exact_and_detects_planted_miscalibration(spark):
    from harvester_spark.operators.click_models import ranker_calibration_ece

    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .collect()
    ]
    bins = {}
    for cohort in ("calibrated", "miscal"):
        for e in eids:
            p = 100 + _h56(f"cp{e}") % 800
            u = _h56(f"cc|{cohort}|{e}") % 1000
            p_true = p if cohort == "calibrated" else (7 * p) // 10 + 50
            c = 1 if u < p_true else 0
            b = p // 100
            n, sp, sc = bins.get((cohort, b), (0, 0, 0))
            bins[(cohort, b)] = (n + 1, sp + p, sc + c)
    expect = {}
    ece_num = Counter()
    ece_den = Counter()
    for (cohort, b), (n, sp, sc) in bins.items():
        mp = sp // n
        mo = (1000 * sc) // n
        expect[(cohort, b)] = (n, mp, mo, mp - mo)
        ece_num[cohort] += n * abs(mp - mo)
        ece_den[cohort] += n
    ece = {c: ece_num[c] // ece_den[c] for c in ece_num}

    got = {}
    got_ece = {}
    for r in ranker_calibration_ece(spark, SF_DIR).collect():
        got[(r["cohort"], r["bin"])] = (
            r["n"], r["mean_pred_milli"], r["mean_obs_milli"], r["gap_milli"]
        )
        got_ece[r["cohort"]] = r["ece_milli"]
    assert got == expect
    assert got_ece == ece

    # the metric finds the plant: miscal cohort clearly worse-calibrated
    assert got_ece["miscal"] > 3 * max(got_ece["calibrated"], 10)
    # and the miscal observed rates track the planted 0.7x + 50 transform
    for (cohort, b), (n, mp, mo, _) in got.items():
        if cohort == "miscal" and n >= 20:
            assert abs(mo - ((7 * mp) // 10 + 50)) < 150


# --------------------------------------------- shard_select_redde


def test_redde_matches_python_recompute_and_selects_properly(spark, corpus14):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.index_stats import (
        SR_COVER_PCT,
        SR_K,
        SR_RATE,
        SR_SHARDS,
        shard_select_redde,
    )

    shard = {d: _h56(f"sh|{d}") % SR_SHARDS for d in corpus14}
    sampled = {d for d in corpus14 if _h56(f"smp|{d}") % SR_RATE == 0}
    sample_corpus = {d: corpus14[d] for d in sampled}
    top = _bm25_rank(sample_corpus, BM25_TERMS, SR_K)

    per = {}
    for s in range(SR_SHARDS):
        nd = sum(1 for d in corpus14 if shard[d] == s)
        ns = sum(1 for d in sampled if shard[d] == s)
        v = sum(1 for d in top if shard[d] == s)
        est = (1000 * v * nd) // max(ns, 1)
        per[s] = (nd, ns, v, est)
    order = sorted(per, key=lambda s: (-per[s][3], s))
    tot = sum(v[3] for v in per.values())
    expect = {}
    cum = 0
    for rank, s in enumerate(order, start=1):
        nd, ns, v, est = per[s]
        sel = (cum * 100 < tot * SR_COVER_PCT) and est > 0
        expect[s] = (nd, ns, v, est, rank, sel)
        cum += est

    got = {
        r["shard"]: (
            r["n_docs"], r["n_sampled"], r["votes"], r["est_milli"],
            r["rank"], r["selected"],
        )
        for r in shard_select_redde(spark, SF_DIR).collect()
    }
    assert got == expect

    n_sel = sum(1 for v in got.values() if v[5])
    assert 1 <= n_sel < SR_SHARDS  # fan-out genuinely prunes
    assert sum(v[2] for v in got.values()) == min(SR_K, len(top))


# --------------------------------------- cache_lru_stack_distance


def test_lru_stack_distance_equals_actual_lru_simulation(spark):
    from harvester_spark.operators.web_econ import (
        CACHE_SIZES,
        cache_lru_stack_distance,
    )

    import re as _re

    rows = sorted(
        (
            (r["event_id"], int(_re.search(r"[0-9]+", r["props"]).group()))
            for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select("event_id", "props")
            .collect()
        )
    )
    stream = [k for _, k in rows]

    def lru_hits(c):
        cache = []  # most-recent first
        hits = 0
        for k in stream:
            if k in cache:
                hits += 1
                cache.remove(k)
            elif len(cache) >= c:
                cache.pop()
            cache.insert(0, k)
        return hits

    n = len(stream)
    cold = len(set(stream))
    expect = {
        c: (n, cold, lru_hits(c), (1000 * lru_hits(c)) // n)
        for c in CACHE_SIZES
    }
    got = {
        r["cache_size"]: (
            r["n_accesses"], r["n_cold"], r["n_hits"], r["hit_rate_milli"]
        )
        for r in cache_lru_stack_distance(spark, SF_DIR).collect()
    }
    assert got == expect  # the Mattson theorem, executed

    rates = [got[c][3] for c in sorted(got)]
    assert all(b >= a for a, b in zip(rates, rates[1:]))  # inclusion property
    assert 0 < rates[0] and rates[-1] < 1000


# ---------------------------------------------- curation_k_anonymity


def test_k_anonymity_matches_python_and_both_verdicts_present(spark):
    from harvester_spark.operators.curation import (
        K_ANON,
        KA_SIZE_BUCKET,
        L_DIV,
        curation_k_anonymity,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "lang", "n_chars")
        .collect()
    )
    cls = {}
    for r in rows:
        key = (r["source"], r["lang"], r["n_chars"] // KA_SIZE_BUCKET)
        sens = _h56(f"sens|{r['doc_id']}") % 4
        n, ss = cls.get(key, (0, set()))
        ss.add(sens)
        cls[key] = (n + 1, ss)
    expect = {}
    for key, (n, ss) in cls.items():
        ka = n >= K_ANON
        ld = len(ss) >= L_DIV
        expect[key] = (n, len(ss), ka, ld, not (ka and ld))

    got = {
        (r["source"], r["lang"], r["size_bucket"]): (
            r["class_size"], r["n_sensitive"], r["k_anonymous"],
            r["l_diverse"], r["suppress"],
        )
        for r in curation_k_anonymity(spark, SF_DIR).collect()
    }
    assert got == expect
    verdicts = Counter(v[4] for v in got.values())
    assert verdicts[True] > 0 and verdicts[False] > 0  # audit discriminates


# -------------------------------------------------- ft_keyness_llr


def test_keyness_finds_planted_structure_and_matches_python(spark, corpus14):
    from harvester_spark.operators.text_analytics import (
        KEY_SIG_MICRO,
        ft_keyness_llr,
    )

    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    a_cnt = Counter()
    b_cnt = Counter()
    for d, ts in corpus14.items():
        is_en = langs[d] == "en"
        planted = ["kwen" if is_en else "kwoth", "kwmix"]
        if is_en or _h56(f"kw|{d}") % 2 == 0:
            planted.append("kwskew")
        for t in list(ts) + planted:
            (a_cnt if is_en else b_cnt)[t] += 1
    na = sum(a_cnt.values())
    nb = sum(b_cnt.values())
    expect = {}
    for t in set(a_cnt) | set(b_cnt):
        a, b = a_cnt[t], b_cnt[t]
        g2 = 2.0 * (
            (a * math.log((a * (na + nb)) / (1.0 * na * (a + b))) if a else 0.0)
            + (b * math.log((b * (na + nb)) / (1.0 * nb * (a + b))) if b else 0.0)
        )
        mag = math.floor(g2 * 1e6 + 0.5)
        signed = mag if a * nb >= b * na else -mag
        expect[t] = (a, b, signed, abs(signed) >= KEY_SIG_MICRO)

    got = {
        r["term"]: (
            r["a_cf"], r["b_cf"], r["keyness_micro"], r["significant"]
        )
        for r in ft_keyness_llr(spark, SF_DIR).collect()
    }
    assert got == expect

    # planted structure recovered; natural vocabulary stays a negative
    # control below significance
    assert got["kwen"][2] > KEY_SIG_MICRO
    assert got["kwoth"][2] < -KEY_SIG_MICRO
    assert got["kwskew"][3] and 0 < got["kwskew"][2] < got["kwen"][2]
    assert abs(got["kwmix"][2]) < KEY_SIG_MICRO
    for t, (a, b, s, sig) in got.items():
        if not t.startswith("kw"):
            assert not sig


# ------------------------------------------------ events_cohort_ltv


def test_cohort_ltv_matches_python_and_recovers_channel_order(spark):
    from harvester_spark.operators.web_econ import (
        LTV_CHANNELS,
        events_cohort_ltv,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id", "event_type",
            "CAST(unix_timestamp(ts) AS LONG) AS se",
            "CAST(round(value * 100) AS LONG) AS cents",
        )
        .collect()
    )
    t0 = {}
    for r in rows:
        u = r["user_id"]
        t0[u] = min(t0.get(u, r["se"]), r["se"])
    chan = {u: _h56(f"ch|{u}") % LTV_CHANNELS for u in t0}
    sizes = Counter(chan.values())
    daily = Counter()
    for r in rows:
        if r["event_type"] != "purchase":
            continue
        u = r["user_id"]
        c = chan[u]
        age = (r["se"] - t0[u]) // 86400
        daily[(c, age)] += (1 + c) * r["cents"]
    expect = {}
    for c in sizes:
        cum = 0
        for age in sorted(a for (cc, a) in daily if cc == c):
            cum += daily[(c, age)]
            expect[(c, age)] = (
                sizes[c], daily[(c, age)], cum,
                (1000 * cum) // sizes[c],
            )

    got = {
        (r["channel"], r["age_day"]): (
            r["n_users"], r["rev_cents"], r["cum_rev_cents"],
            r["ltv_millicents"],
        )
        for r in events_cohort_ltv(spark, SF_DIR).collect()
    }
    assert got == expect

    # planted multiplier recovered at the final age: ch3 > ch0
    final = {
        c: max(
            (a, got[(c, a)][3]) for (cc, a) in got if cc == c
        )[1]
        for c in sizes
    }
    assert final[LTV_CHANNELS - 1] > final[0]
    # curves are monotone (cumsum law)
    for c in sizes:
        ages = sorted(a for (cc, a) in got if cc == c)
        vals = [got[(c, a)][2] for a in ages]
        assert all(y >= x for x, y in zip(vals, vals[1:]))


# -------------------------------------------- es_random_sampler_eval


def test_random_sampler_matches_python_and_error_is_bounded(spark):
    from harvester_spark.operators.es_aggs import (
        RS_RATE,
        es_random_sampler_eval,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "event_id", "event_type",
            "CAST(round(value * 100) AS LONG) AS cents",
        )
        .collect()
    )
    agg = {}
    for r in rows:
        t = r["event_type"]
        n, s, ns, ss = agg.get(t, (0, 0, 0, 0))
        ins = _h56(f"rs|{r['event_id']}") % RS_RATE == 0
        agg[t] = (
            n + 1, s + r["cents"], ns + ins, ss + (r["cents"] if ins else 0)
        )
    expect = {}
    for t, (n, s, ns, ss) in agg.items():
        est = RS_RATE * ss
        err = (
            (1000 * (est - s)) // s if est >= s else -((1000 * (s - est)) // s)
        )
        expect[t] = (n, s, ns, RS_RATE * ns, est, err)

    got = {
        r["event_type"]: (
            r["n_exact"], r["sum_cents"], r["n_sampled"], r["est_n"],
            r["est_sum_cents"], r["err_milli"],
        )
        for r in es_random_sampler_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # ~25 sampled rows per type at sf0.001 → se ≈ 20%; 700 milli is a
    # >3σ bound that still proves the estimate tracks the exact value
    errs = [v[5] for v in got.values()]
    assert all(abs(e) < 700 for e in errs)
    assert any(e != 0 for e in errs)  # sampling error is real, not hidden


# ------------------------------------------ ann_filtered_recall_eval


def test_filtered_recall_truth_leg_and_degradation_is_real(spark):
    from harvester_spark.operators.similarity import (
        TOP_K,
        ann_filtered_recall_eval,
    )

    emb = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    got = {
        r["qid"]: (
            r["n_allowed"], r["n_cand"], r["k_truth"], r["hits"],
            r["recall_milli"],
        )
        for r in ann_filtered_recall_eval(spark, SF_DIR).collect()
    }

    # truth-side invariants recomputed from raw vectors
    for qid, (n_allowed, n_cand, k_truth, hits, recall) in got.items():
        expect_allowed = sum(
            1 for v, (_, lab) in emb.items()
            if v != qid and lab % 2 == qid % 2
        )
        assert n_allowed == expect_allowed
        assert k_truth == min(TOP_K, n_allowed)
        assert 0 <= hits <= k_truth
        assert recall == (1000 * hits) // k_truth
        # post-filter candidates are a strict subset of the allowed set
        assert n_cand < n_allowed

    # the evaluation measures something real: neither all-perfect nor
    # all-zero across queries
    recalls = [v[4] for v in got.values()]
    assert any(r < 1000 for r in recalls)
    assert any(r > 0 for r in recalls)


# ----------------------------------------- events_stickiness_dau_mau


def test_stickiness_matches_python_recompute(spark):
    from harvester_spark.operators.web_econ import (
        MAU_WINDOW,
        events_stickiness_dau_mau,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id", "CAST(unix_timestamp(ts) AS LONG) DIV 86400 AS day"
        )
        .collect()
    )
    ud = {(r["user_id"], r["day"]) for r in rows}
    days = sorted({d for _, d in ud})
    mn, mx = days[0], days[-1]
    expect = {}
    for d in range(mn + MAU_WINDOW - 1, mx + 1):
        dau = len({u for u, dd in ud if dd == d})
        if dau == 0:
            continue  # operator joins on dau days only
        mau = len({u for u, dd in ud if d - MAU_WINDOW + 1 <= dd <= d})
        expect[d] = (dau, mau, (1000 * dau) // mau)

    got = {
        r["day"]: (r["dau"], r["mau"], r["stickiness_milli"])
        for r in events_stickiness_dau_mau(spark, SF_DIR).collect()
    }
    assert got == expect
    assert all(0 < v[2] <= 1000 for v in got.values())


# ------------------------------------------------ events_srm_check


def test_srm_flags_planted_break_and_passes_honest_split(spark):
    from harvester_spark.operators.web_econ import events_srm_check

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    counts = {}
    for exp, pred in (
        ("rollout_split", lambda d: _h56(f"did|{d}") % 2 == 1),
        ("planted_srm", lambda d: _h56(f"srm|{d}") % 16 < 5),
    ):
        a = sum(1 for d in doc_ids if pred(d))
        b = len(doc_ids) - a
        chi2 = (1_000_000 * (a - b) * (a - b)) // (a + b)
        counts[exp] = (a, b, chi2, chi2 >= 3_841_000)

    got = {
        r["experiment"]: (r["n_a"], r["n_b"], r["chi2_micro"], r["srm_flag"])
        for r in events_srm_check(spark, SF_DIR).collect()
    }
    assert got == counts
    assert got["planted_srm"][3] is True  # the broken randomizer is caught
    assert got["rollout_split"][3] is False  # the honest split passes


# ---------------------------------------- events_attribution_shapley


def test_shapley_matches_python_and_recovers_signup_lift(spark):
    from math import comb

    from harvester_spark.operators.web_econ import (
        SHAP_CHANNELS,
        SHAP_FIRST_K,
        events_attribution_shapley,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "event_id",
            "CAST(unix_timestamp(ts) AS LONG) AS se",
            "CAST(round(value * 100) AS LONG) AS cents",
        )
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    idx = {c: i for i, c in enumerate(SHAP_CHANNELS)}
    purch = {
        u: sum(r["cents"] for r in rs if r["event_type"] == "purchase")
        for u, rs in by_user.items()
    }
    purch = {u: p for u, p in purch.items() if any(
        r["event_type"] == "purchase" for r in by_user[u]
    )}
    nu, sc = len(purch), sum(purch.values())
    vstats = {}
    for u, rs in by_user.items():
        ordered = sorted(rs, key=lambda r: (r["se"], r["event_id"]))
        first = [
            r["event_type"] for r in ordered[:SHAP_FIRST_K]
            if r["event_type"] != "purchase"
        ]
        mask = 0
        for t in set(first):
            mask |= 1 << idx[t]
        if (mask & 4) and _h56(f"cv|{u}") % 4 < 3:
            conv = 1
        elif u in purch and nu * purch[u] >= sc:
            conv = 1
        else:
            conv = 0
        n, c = vstats.get(mask, (0, 0))
        vstats[mask] = (n + 1, c + conv)
    v = {m: (1000 * c) // n for m, (n, c) in vstats.items()}

    coef = {0: 6, 1: 2, 2: 2, 3: 6}
    expect = {}
    for ch, i in idx.items():
        term = 0
        observed = 0
        for mask in range(16):
            if mask & (1 << i):
                continue
            vs = v.get(mask, 0)
            vi = v.get(mask | (1 << i), 0)
            term += coef[bin(mask).count("1")] * (vi - vs)
            observed += (mask in v) and ((mask | (1 << i)) in v)
        shap = (
            (1000 * term) // 24 if term >= 0 else -((1000 * -term) // 24)
        )
        expect[ch] = (shap, observed)

    got = {
        r["channel"]: (r["shap_micro"], r["n_sub_pairs"])
        for r in events_attribution_shapley(spark, SF_DIR).collect()
    }
    assert got == expect

    # planted 'signup' lift dominates every other channel's share
    others = [v2[0] for c, v2 in got.items() if c != "signup"]
    assert got["signup"][0] > 2 * max(others)

    # efficiency identity (pre-floor algebra telescopes exactly;
    # per-channel flooring leaves <= 4 micro of slack)
    full = (1 << len(SHAP_CHANNELS)) - 1
    target = (v.get(full, 0) - v.get(0, 0)) * 1000
    assert abs(sum(s for s, _ in got.values()) - target) <= 4


# -------------------------------------------- events_matrix_profile


def test_matrix_profile_matches_python_recompute(spark):
    from harvester_spark.operators.es_aggs import MP_M, events_matrix_profile

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("CAST(unix_timestamp(ts) AS LONG) DIV 3600 AS hour")
        .collect()
    )
    hours = [r["hour"] for r in rows]
    mn, mx = min(hours), max(hours)
    cnt = Counter(hours)
    xs = [cnt.get(h, 0) for h in range(mn, mx + 1)]
    n_sub = len(xs) - MP_M + 1
    expect = {}
    for i in range(n_sub):
        best = None
        for j in range(n_sub):
            if abs(i - j) < MP_M:
                continue
            d2 = sum(
                (xs[i + k] - xs[j + k]) ** 2 for k in range(MP_M)
            )
            key = (d2, j)
            if best is None or key < best:
                best = key
        expect[i] = (best[1], best[0])

    got = {
        r["i"]: (r["nn_j"], r["d2"])
        for r in events_matrix_profile(spark, SF_DIR).collect()
    }
    assert got == expect
    # the profile is informative: motifs (small d2) and discords exist
    d2s = [v[1] for v in got.values()]
    assert min(d2s) < max(d2s)


# --------------------------------------------- host_degree_powerlaw


def test_degree_powerlaw_matches_python_recompute(spark):
    from harvester_spark.operators.graph import host_degree_powerlaw

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    fan = max(len(docs) // 2, 20)
    edges = set()
    for r in docs:
        dst = f"h{_h56(str(r['doc_id'])) % fan}"
        if r["source"] != dst:
            edges.add((min(r["source"], dst), max(r["source"], dst)))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    hist = Counter(deg.values())
    n = sum(hist.values())
    t_micro = sum(
        nd * math.floor(math.log(2.0 * d) * 1e6 + 0.5)
        for d, nd in hist.items()
    )
    alpha = 1_000_000 + (10**12 * n) // t_micro
    expect = {}
    cum = 0
    for d in sorted(hist, reverse=True):
        cum += hist[d]
        expect[d] = (hist[d], cum, (1000 * cum) // n, alpha)

    got = {
        r["d"]: (r["n_d"], r["cum_ge"], r["ccdf_milli"], r["alpha_micro"])
        for r in host_degree_powerlaw(spark, SF_DIR).collect()
    }
    assert got == expect
    # the two-scale structure is real: a leaf mode and a hub tail
    assert min(got) <= 2 and max(got) >= 10


# ------------------------------------------------ shard_select_cori


def test_cori_matches_python_recompute(spark, corpus14):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.index_stats import (
        SR_SHARDS,
        shard_select_cori,
    )

    shard_of = {d: _h56(f"sh|{d}") % SR_SHARDS for d in corpus14}
    cw = Counter()
    dfs = Counter()
    for d, ts in corpus14.items():
        s = shard_of[d]
        cw[s] += len(ts)
        for t in set(ts):
            if t in BM25_TERMS:
                dfs[(s, t)] += 1
    avg_cw = sum(cw.values()) / len(cw)
    cf = Counter(t for (_, t) in dfs)
    expect = {}
    for s in range(SR_SHARDS):
        bel = 0.0
        for t in BM25_TERMS:
            df_s = dfs.get((s, t), 0)
            if df_s == 0:
                continue
            T = df_s / (df_s + 50.0 + 150.0 * cw[s] / avg_cw)
            I = math.log((SR_SHARDS + 0.5) / cf[t]) / math.log(
                SR_SHARDS + 1.0
            )
            bel += 0.4 + 0.6 * T * I
        expect[s] = (
            cw[s],
            math.floor(bel / len(BM25_TERMS) * 1e6 + 0.5),
        )
    order = sorted(expect, key=lambda s: (-expect[s][1], s))
    ranks = {s: r for r, s in enumerate(order, start=1)}

    got = {
        r["shard"]: (r["cw_s"], r["bel_micro"], r["rank"])
        for r in shard_select_cori(spark, SF_DIR).collect()
    }
    assert got == {
        s: (cws, bel, ranks[s]) for s, (cws, bel) in expect.items()
    }
    # beliefs genuinely discriminate shards
    assert len({v[1] for v in got.values()}) > 1


# ------------------------------------------------ ft_alpha_ndcg_eval


def test_alpha_dcg_pareto_trade_and_recompute(spark):
    from harvester_spark.operators.retrieval import (
        AD_C_SCALE,
        XQ_K,
        ft_alpha_ndcg_eval,
        ft_xquad_topk,
    )

    got = {
        r["ranking"]: (r["alpha_units"], r["rel_units"])
        for r in ft_alpha_ndcg_eval(spark, SF_DIR).collect()
    }
    # the Pareto trade diversification exists to make:
    assert got["xquad"][0] > got["relevance"][0]
    assert got["xquad"][1] < got["relevance"][1]

    # recompute the xquad leg from the (already pinned-exact) picks
    picks = [
        (r["pick"], r["lang"], r["rel_norm"])
        for r in ft_xquad_topk(spark, SF_DIR).orderBy("pick").collect()
    ]
    seen = Counter()
    alpha = 0
    rel = 0
    for rank, lang, rn in picks:
        alpha += (1 << (XQ_K - rank)) * (1 << (AD_C_SCALE - seen[lang]))
        rel += (1 << (XQ_K - rank)) * rn
        seen[lang] += 1
    assert got["xquad"] == (alpha, rel)


# -------------------------- events_cascade_hourly + streaming twin


def test_cascade_hourly_stream_parity(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from harvester_spark.operators.click_models import events_cascade_hourly
    from harvester_spark.streaming.windowed import windowed_cascade_stats

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "event_id"
    )
    src = os.path.join(str(tmp_path), "cs_src")
    # two parquet chunks (JSON truncates microsecond timestamps) so the
    # stream crosses micro-batches
    ev.orderBy("ts").limit(600).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    ev.orderBy(F.col("ts").desc()).limit(400).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )

    stream = spark.readStream.schema("ts timestamp, event_id bigint").parquet(
        os.path.join(src, "*")
    )
    out_dir = os.path.join(str(tmp_path), "cs_out")
    q = (
        windowed_cascade_stats(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "cs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).select(
        (F.unix_timestamp("window_start") / 3600)
        .cast("long")
        .alias("hour_bucket"),
        "item",
        "n_examined",
        "n_clicked",
        "alpha_hat_milli",
    )
    emitted = {
        r["hour_bucket"]
        for r in got.select("hour_bucket").distinct().collect()
    }
    assert len(emitted) > 20  # append mode finalized most windows

    batch = events_cascade_hourly(spark, SF_DIR).filter(
        F.col("hour_bucket").isin(list(emitted))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


# --------------------------------------------- serving_hedge_tail_eval


def test_hedge_tail_matches_python_and_crushes_the_tail(spark):
    from harvester_spark.operators.index_stats import (
        HEDGE_BASE_MS,
        HEDGE_QUERIES,
        HEDGE_SHARDS,
        HEDGE_SPIKE_MS,
        serving_hedge_tail_eval,
    )

    def lat(rep, q, s):
        h = _h56(f"lat{rep}|{q}|{s}")
        h2 = _h56(f"spk{rep}|{q}|{s}")
        return (
            HEDGE_BASE_MS + h % 20
            + (HEDGE_SPIKE_MS if h2 % 50 < 1 else 0)
        )

    per_q = {"single": [], "hedged": [], "tied": []}
    for q in range(HEDGE_QUERIES):
        s1 = h1 = t1 = 0
        for s in range(HEDGE_SHARDS):
            l1, l2 = lat(1, q, s), lat(2, q, s)
            s1 = max(s1, l1)
            h1 = max(h1, min(l1, l2))
            t1 = max(t1, min(l1, l2) if l1 >= HEDGE_SPIKE_MS else l1)
        per_q["single"].append(s1)
        per_q["hedged"].append(h1)
        per_q["tied"].append(t1)

    n = HEDGE_QUERIES
    expect = {}
    for pol, lats in per_q.items():
        # exact order statistic with the (lat, q) tie-break == plain
        # value-sorted order statistic on values
        vs = sorted(lats)
        expect[pol] = (
            n,
            vs[(50 * n + 99) // 100 - 1],
            vs[(95 * n + 99) // 100 - 1],
            vs[(99 * n + 99) // 100 - 1],
            (1_000_000 * sum(lats)) // n,
        )

    got = {
        r["policy"]: (
            r["n"], r["p50_ms"], r["p95_ms"], r["p99_ms"], r["mean_micro_ms"]
        )
        for r in serving_hedge_tail_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # the Dean-Barroso effect: hedging crushes the fan-out tail, and the
    # work-bounded tied variant keeps nearly all of the win
    assert got["single"][2] >= HEDGE_SPIKE_MS  # spike dominates p95
    assert got["hedged"][2] < HEDGE_SPIKE_MS // 4
    assert got["tied"][3] <= got["single"][3] // 4
    assert got["tied"][3] <= got["hedged"][3] + 5


# -------------------------------------------------- emb_cka_jl


def test_cka_matches_python_recompute_and_is_informative(spark):
    from harvester_spark.operators.similarity import JL_DIM, emb_cka_jl

    emb = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    n = len(emb)
    d = 64
    # sign-JL projection (the jl_project contract)
    sgn = {
        (j, p): 1 - 2 * (_h56(f"jl:{j}:{p}") % 2)
        for j in range(JL_DIM)
        for p in range(d)
    }
    Y = {
        v: [
            round(sum(x[p] * sgn[(j, p)] for p in range(d)) / 4.0, 6)
            for j in range(JL_DIM)
        ]
        for v, x in emb.items()
    }
    mx = [round(sum(emb[v][p] for v in emb) / n, 6) for p in range(d)]
    my = [round(sum(Y[v][j] for v in emb) / n, 6) for j in range(JL_DIM)]
    xc = {v: [x - m for x, m in zip(emb[v], mx)] for v in emb}
    yc = {v: [y - m for y, m in zip(Y[v], my)] for v in emb}

    def fe(e):
        return math.floor(round(e, 6) * 1e3 + 0.5)

    f2_xy = sum(
        fe(sum(xc[v][p] * yc[v][j] for v in emb)) ** 2
        for p in range(d)
        for j in range(JL_DIM)
    )
    f2_xx = sum(
        fe(sum(xc[v][p] * xc[v][q] for v in emb)) ** 2
        for p in range(d)
        for q in range(d)
    )
    f2_yy = sum(
        fe(sum(yc[v][j] * yc[v][k] for v in emb)) ** 2
        for j in range(JL_DIM)
        for k in range(JL_DIM)
    )
    cka = math.floor(
        f2_xy * 1e6 / math.sqrt(float(f2_xx) * float(f2_yy)) + 0.5
    )

    row = emb_cka_jl(spark, SF_DIR).collect()[0]
    assert (
        row["f2_xy"], row["f2_xx"], row["f2_yy"], row["cka_micro"]
    ) == (f2_xy, f2_xx, f2_yy, cka)
    # the projection keeps real but partial structure
    assert 200_000 < row["cka_micro"] < 950_000


# -------------------------------------------- crawl_maxmin_fairshare


def test_maxmin_fairshare_invariants_and_recompute(spark):
    from harvester_spark.operators.graph import crawl_maxmin_fairshare

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source"
    ).collect()
    nd = Counter(r["source"] for r in docs)
    dem = {h: c * (1 + _h56(f"dm|{h}") % 8) for h, c in nd.items()}
    td = sum(dem.values())
    c = td // 2
    n = len(dem)
    order = sorted(dem.items(), key=lambda kv: (kv[1], kv[0]))
    prefix = 0
    k = pk = 0
    for i, (h, dd) in enumerate(order, start=1):
        prefix += dd
        if prefix - dd + (n - i + 1) * dd <= c:
            k, pk = i, prefix
    expect = {}
    for i, (h, dd) in enumerate(order, start=1):
        if td <= c or i <= k:
            alloc = dd
        else:
            alloc = (c - pk) // (n - k) + (
                1 if i - k <= (c - pk) % (n - k) else 0
            )
        expect[h] = (dd, i, alloc, td > c and i > k)

    got = {
        r["host"]: (r["demand"], r["rank"], r["alloc"], r["capped"])
        for r in crawl_maxmin_fairshare(spark, SF_DIR).collect()
    }
    assert got == expect

    # max-min invariants
    assert sum(v[2] for v in got.values()) == min(c, td)
    capped = [v[2] for v in got.values() if v[3]]
    assert capped and max(capped) - min(capped) <= 1
    for dd, _, alloc, _ in got.values():
        assert alloc <= dd
    # fairness binds on this corpus: someone is actually capped below
    # demand and someone is served in full
    assert any(v[2] < v[0] for v in got.values())
    assert any(v[2] == v[0] for v in got.values())


# ---------------------------------------------- ft_dispersion_dp


def test_dispersion_dp_matches_python_recompute(spark, corpus14):
    from harvester_spark.operators.text_analytics import ft_dispersion_dp

    srcs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    part_tok = Counter()
    ct = Counter()
    for d, ts in corpus14.items():
        s = srcs[d]
        part_tok[s] += len(ts)
        for t in ts:
            ct[(s, t)] += 1
    tt = sum(part_tok.values())
    cf = Counter()
    for (s, t), c in ct.items():
        cf[t] += c
    expect = {}
    for t in cf:
        num = sum(
            abs(ct.get((s, t), 0) * tt - part_tok[s] * cf[t])
            for s in part_tok
        )
        den = 2 * cf[t] * tt
        expect[t] = (cf[t], num, den, (1000 * num) // den)

    got = {
        r["term"]: (r["cf"], r["dp_num"], r["dp_den"], r["dp_milli"])
        for r in ft_dispersion_dp(spark, SF_DIR).collect()
    }
    assert got == expect
    # dispersion genuinely varies across the vocabulary (the rare 'dup'
    # is far less evenly spread than any head term)
    vals = {t: v[3] for t, v in got.items()}
    assert vals["dup"] > 3 * min(vals.values())


# ------------------------------------------- bandit_batched_egreedy


def test_bandit_matches_python_simulation_and_converges(spark):
    from harvester_spark.operators.click_models import (
        BANDIT_ARMS,
        BANDIT_EPS_MILLI,
        BANDIT_N,
        BANDIT_ROUNDS,
        bandit_batched_egreedy,
    )

    ctr = {a: 150 + (a * 137) % 700 for a in range(BANDIT_ARMS)}
    best_arm = max(ctr, key=lambda a: (ctr[a], -a))
    best_ctr = ctr[best_arm]
    cum_p = Counter()
    cum_c = Counter()
    expect = {}
    for r in range(1, BANDIT_ROUNDS + 1):
        est = {
            a: (1000 * cum_c[a]) // cum_p[a] if cum_p[a] else 0
            for a in range(BANDIT_ARMS)
        }
        xarm = sorted(range(BANDIT_ARMS), key=lambda a: (-est[a], a))[0]
        pulls = Counter()
        clicks = Counter()
        for i in range(BANDIT_N):
            if _h56(f"b1|{r}|{i}") % 1000 < BANDIT_EPS_MILLI:
                arm = _h56(f"b2|{r}|{i}") % BANDIT_ARMS
            else:
                arm = xarm
            pulls[arm] += 1
            if _h56(f"b3|{r}|{i}|{arm}") % 1000 < ctr[arm]:
                clicks[arm] += 1
        for a in range(BANDIT_ARMS):
            cum_p[a] += pulls[a]
            cum_c[a] += clicks[a]
            expect[(r, a)] = (
                xarm, pulls[a], clicks[a], cum_p[a], cum_c[a],
                (1000 * cum_c[a]) // cum_p[a] if cum_p[a] else 0,
                pulls[a] * (best_ctr - ctr[a]),
            )

    got = {
        (r["round"], r["arm"]): (
            r["exploit_arm"], r["pulls"], r["clicks"], r["cum_pulls"],
            r["cum_clicks"], r["est_milli"], r["regret_units"],
        )
        for r in bandit_batched_egreedy(spark, SF_DIR).collect()
    }
    assert got == expect

    # convergence: from round 2 the policy exploits the true best arm,
    # and regret collapses to the exploration floor
    for r in range(2, BANDIT_ROUNDS + 1):
        assert got[(r, 0)][0] == best_arm
    reg = {
        r: sum(got[(r, a)][6] for a in range(BANDIT_ARMS))
        for r in range(1, BANDIT_ROUNDS + 1)
    }
    assert all(reg[r] < reg[1] // 5 for r in range(2, BANDIT_ROUNDS + 1))
    # the best arm's estimate homes in on the planted CTR
    assert abs(got[(BANDIT_ROUNDS, best_arm)][5] - best_ctr) <= 30


# ---------------------------------------------------- es_geo_centroid


def test_geo_centroid_matches_python_recompute(spark):
    from harvester_spark.operators.es_aggs import es_geo_centroid

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    # independent canonical geohash precision-1 cell: 3 lon bits
    # interleaved with 2 lat bits (lon first) via bisection
    def cell_of(lat_m, lon_m):
        lat_lo, lat_hi = -90000, 90000
        lon_lo, lon_hi = -180000, 180000
        bits = []
        for i in range(5):
            if i % 2 == 0:  # lon bit
                mid = (lon_lo + lon_hi) // 2
                bits.append(1 if lon_m >= mid else 0)
                lon_lo, lon_hi = (mid, lon_hi) if bits[-1] else (lon_lo, mid)
            else:  # lat bit
                mid = (lat_lo + lat_hi) // 2
                bits.append(1 if lat_m >= mid else 0)
                lat_lo, lat_hi = (mid, lat_hi) if bits[-1] else (lat_lo, mid)
        v = 0
        for b in bits:
            v = (v << 1) | b
        return v

    agg = {}
    for d in doc_ids:
        lat = _h56(f"lat:{d}") % 180000 - 90000
        lon = _h56(f"lon:{d}") % 360000 - 180000
        c = cell_of(lat, lon)
        n, sla, slo = agg.get(c, (0, 0, 0))
        agg[c] = (n + 1, sla + lat, slo + lon)

    def sdiv(s, n):
        return s // n if s >= 0 else -((-s) // n)

    expect = {
        c: (n, sdiv(sla, n), sdiv(slo, n))
        for c, (n, sla, slo) in agg.items()
    }
    got = {
        r["cell"]: (
            r["n_docs"], r["centroid_lat_milli"], r["centroid_lon_milli"]
        )
        for r in es_geo_centroid(spark, SF_DIR).collect()
    }
    assert got == expect
    # centroids sit inside their cell's lat/lon box for a sample cell
    assert len(got) == 32  # uniform scatter fills all precision-1 cells


# --------------------------------------------- events_dispersion_index


def test_dispersion_index_matches_python_and_flags_poissonness(spark):
    from harvester_spark.operators.web_econ import ACF_LAGS  # noqa: F401
    from harvester_spark.operators.es_aggs import events_dispersion_index

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "event_type", "CAST(unix_timestamp(ts) AS LONG) DIV 3600 AS hour"
        )
        .collect()
    )
    mn = min(r["hour"] for r in rows)
    mx = max(r["hour"] for r in rows)
    per = {}
    for r in rows:
        per.setdefault(r["event_type"], Counter())[r["hour"]] += 1
    expect = {}
    for et, cnt in per.items():
        xs = [cnt.get(h, 0) for h in range(mn, mx + 1)]
        n, s1 = len(xs), sum(xs)
        s2 = sum(x * x for x in xs)
        expect[et] = (
            n,
            (1000 * s1) // n,
            (1000 * n * (n * s2 - s1 * s1)) // ((n - 1) * n * s1),
        )

    got = {
        r["event_type"]: (r["n_hours"], r["mean_milli"], r["vmr_milli"])
        for r in events_dispersion_index(spark, SF_DIR).collect()
    }
    assert got == expect
    # the uniform synthetic stream is Poisson-like: VMR near 1 for every
    # type (the negative control — no overdispersion to invent)
    for _, (_, _, vmr) in got.items():
        assert 700 <= vmr <= 1400


# ------------------------------------------------ ft_bm25_maxp_topk


def test_maxp_matches_python_recompute_and_differs_from_doc_bm25(spark, corpus14):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.retrieval import (
        MAXP_K,
        MAXP_S,
        MAXP_W,
        ft_bm25_maxp_topk,
    )

    # passages via the operator's membership algebra, exactly
    passages = {}
    for d, ts in corpus14.items():
        n = len(ts)
        w_cap = 0 if n <= MAXP_W else (n - MAXP_W - 1) // MAXP_S + 1
        for pos, t in enumerate(ts):
            w_lo = 0 if pos <= MAXP_W - 2 else (pos - MAXP_S) // MAXP_S
            for w in range(w_lo, pos // MAXP_S + 1):
                if w <= w_cap:
                    passages.setdefault((d, w), []).append(t)

    n_p = len(passages)
    avgpl = sum(len(v) for v in passages.values()) / n_p
    pdf = Counter()
    for key, toks in passages.items():
        for t in set(toks) & set(BM25_TERMS):
            pdf[t] += 1
    scores = {}
    for (d, w), toks in passages.items():
        tf = Counter(toks)
        s = 0.0
        for t in BM25_TERMS:
            f = tf[t]
            if not f:
                continue
            idf = math.log(1.0 + (n_p - pdf[t] + 0.5) / (pdf[t] + 0.5))
            s += idf * (f * 2.2) / (
                f + 1.2 * (1.0 - 0.75 + 0.75 * len(toks) / avgpl)
            )
        if s:
            scores[(d, w)] = round(s, 6)
    best = {}
    for (d, w), s in scores.items():
        cur = best.get(d)
        if cur is None or (-s, w) < (-cur[1], cur[0]):
            best[d] = (w, s)
    expect = sorted(
        ((s, d, w) for d, (w, s) in best.items()),
        key=lambda x: (-x[0], x[1]),
    )[:MAXP_K]
    expect = [
        (r, d, w, s) for r, (s, d, w) in enumerate(expect, start=1)
    ]

    got = [
        (r["rank"], r["doc_id"], r["best_chunk"], r["score"])
        for r in ft_bm25_maxp_topk(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect

    # MaxP is a genuinely different evidence model than whole-doc BM25
    doc_rank = _bm25_rank(corpus14, BM25_TERMS, MAXP_K)
    assert [d for _, d, _, _ in got] != doc_rank


# --------------------------------------------- pagerank_damping_sweep


def test_pr_sweep_d85_equals_host_pagerank_and_sweep_reorders(spark):
    from harvester_spark.operators.graph import (
        host_pagerank,
        pagerank_damping_sweep,
    )

    sweep = {
        r["host"]: (r["r70"], r["r85"], r["r95"])
        for r in pagerank_damping_sweep(spark, SF_DIR).collect()
    }
    base = {
        r["host"]: r["rank_unit"]
        for r in host_pagerank(spark, SF_DIR).collect()
    }
    # cross-operator identity: the d=85 walk IS host_pagerank
    assert {h: v[1] for h, v in sweep.items()} == base

    # mass conservation (approximately PR_UNIT per damping, floor dust)
    for i in range(3):
        tot = sum(v[i] for v in sweep.values())
        assert abs(tot - 10**9) < 10**6
    # the sweep genuinely changes the mass distribution
    r70 = sorted(sweep, key=lambda h: (-sweep[h][0], h))
    r95 = sorted(sweep, key=lambda h: (-sweep[h][2], h))
    assert r70 != r95


# -------------------------------------------------------- bandit_ucb1


def test_ucb1_matches_python_simulation_and_zero_regret_rounds(spark):
    from harvester_spark.operators.click_models import (
        BANDIT_ARMS,
        UCB_N,
        UCB_ROUNDS,
        bandit_ucb1,
    )

    ctr = {a: 150 + (a * 137) % 700 for a in range(BANDIT_ARMS)}
    best_arm = max(ctr, key=lambda a: (ctr[a], -a))
    best_ctr = ctr[best_arm]

    def rad(t, n):
        return math.floor(
            math.sqrt(2.0 * math.log(float(t)) / float(n)) * 1e3 + 0.5
        )

    cum_p = Counter()
    cum_c = Counter()
    expect = {}
    for r in range(1, UCB_ROUNDS + 1):
        if r == 1:
            alloc = [(i % BANDIT_ARMS, i) for i in range(UCB_N)]
            chosen = -1
        else:
            t = (r - 1) * UCB_N
            ucb = {
                a: ((1000 * cum_c[a]) // cum_p[a] if cum_p[a] else 0)
                + rad(t, cum_p[a])
                for a in range(BANDIT_ARMS)
            }
            chosen = sorted(
                range(BANDIT_ARMS), key=lambda a: (-ucb[a], a)
            )[0]
            alloc = [(chosen, i) for i in range(UCB_N)]
        pulls = Counter()
        clicks = Counter()
        for arm, i in alloc:
            pulls[arm] += 1
            if _h56(f"u3|{r}|{i}|{arm}") % 1000 < ctr[arm]:
                clicks[arm] += 1
        for a in range(BANDIT_ARMS):
            cum_p[a] += pulls[a]
            cum_c[a] += clicks[a]
        t_next = r * UCB_N
        for a in range(BANDIT_ARMS):
            est = (1000 * cum_c[a]) // cum_p[a] if cum_p[a] else 0
            expect[(r, a)] = (
                chosen, pulls[a], clicks[a], cum_p[a], cum_c[a],
                est + rad(t_next, cum_p[a]),
                pulls[a] * (best_ctr - ctr[a]),
            )

    got = {
        (r["round"], r["arm"]): (
            r["chosen_arm"], r["pulls"], r["clicks"], r["cum_pulls"],
            r["cum_clicks"], r["ucb_milli"], r["regret_units"],
        )
        for r in bandit_ucb1(spark, SF_DIR).collect()
    }
    assert got == expect

    # canonical UCB behavior: the best arm wins most exploit rounds, at
    # least two rounds have ZERO regret (no epsilon floor -- the
    # structural contrast with bandit_batched_egreedy), and the warm-up
    # spreads pulls evenly
    chosen_rounds = [got[(r, 0)][0] for r in range(2, UCB_ROUNDS + 1)]
    assert sum(1 for c in chosen_rounds if c == best_arm) >= 3
    reg = {
        r: sum(got[(r, a)][6] for a in range(BANDIT_ARMS))
        for r in range(1, UCB_ROUNDS + 1)
    }
    assert sum(1 for r in range(2, UCB_ROUNDS + 1) if reg[r] == 0) >= 2
    warm = [got[(1, a)][1] for a in range(BANDIT_ARMS)]
    assert max(warm) - min(warm) <= 1


# ------------------------------------------- emb_triplet_margin_eval


def test_triplet_eval_matches_python_and_controls_separate(spark):
    from harvester_spark.operators.similarity import (
        TRIP_ANCHORS,
        emb_triplet_margin_eval,
    )

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    emb = {r["vec_id"]: [float(v) for v in r["embedding"]] for r in rows}
    lab = {r["vec_id"]: r["label"] for r in rows}
    labels = sorted(set(lab.values()))
    nl = len(labels)
    by_lab = {}
    for v in sorted(lab):
        by_lab.setdefault(lab[v], []).append(v)

    def shift(label, pos):
        return (_h56(f"shift|{label}:{pos}") % 2001 - 1000) / 2500.0

    n_t = raw_c = sh_c = 0
    for a_id in sorted(emb):
        if a_id >= TRIP_ANCHORS:
            continue
        mem = by_lab[lab[a_id]]
        ix = mem.index(a_id)
        p_id = mem[(ix + 1) % len(mem)]
        if p_id == a_id:
            continue
        h = _h56(f"neg|{a_id}")
        nlabel = (lab[a_id] + 1 + h % (nl - 1)) % nl
        nmem = by_lab[nlabel]
        n_id = nmem[h % len(nmem)]
        d2p = round(
            sum((x - y) ** 2 for x, y in zip(emb[a_id], emb[p_id])), 6
        )
        d2n = round(
            sum((x - y) ** 2 for x, y in zip(emb[a_id], emb[n_id])), 6
        )
        d2n_sh = round(
            sum(
                (x + shift(lab[a_id], p) - y - shift(nlabel, p)) ** 2
                for p, (x, y) in enumerate(zip(emb[a_id], emb[n_id]))
            ),
            6,
        )
        n_t += 1
        raw_c += d2p < d2n
        sh_c += d2p < d2n_sh

    row = emb_triplet_margin_eval(spark, SF_DIR).collect()[0]
    assert (
        row["n_triplets"], row["raw_correct"], row["shifted_correct"]
    ) == (n_t, raw_c, sh_c)
    assert row["raw_acc_milli"] == (1000 * raw_c) // n_t
    assert row["shifted_acc_milli"] == (1000 * sh_c) // n_t

    # the controls separate: raw geometry is near-chance (the embeddings
    # are near-isotropic -- honest negative control), the planted shift
    # is decisively recovered
    assert 350 <= row["raw_acc_milli"] <= 680
    assert row["shifted_acc_milli"] >= 900
    assert row["shifted_acc_milli"] > row["raw_acc_milli"] + 200


# --------------------------------------------------- host_hyperball_anf


def test_hyperball_registers_match_python_and_track_true_balls(spark):
    from harvester_spark.operators.graph import HB_HOPS, host_hyperball_anf
    from harvester_spark.operators.sketches import HLL_M

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    fan = max(len(docs) // 2, 20)
    adj = {}
    for r in docs:
        dst = f"h{_h56(str(r['doc_id'])) % fan}"
        src = r["source"]
        if src != dst:
            adj.setdefault(src, set()).add(dst)
            adj.setdefault(dst, set()).add(src)
    nodes = sorted(adj)

    # exact balls by BFS
    balls = {v: [{v}] for v in nodes}
    for h in range(1, HB_HOPS + 1):
        for v in nodes:
            prev = balls[v][h - 1]
            nxt = set(prev)
            for u in prev:
                nxt |= adj.get(u, set())
            balls[v].append(nxt)

    # recompute the HLL register files exactly
    W_BITS = 48
    RMAX = W_BITS + 1

    def rho(w):
        for j in range(W_BITS - 1, -1, -1):
            if w >= (1 << j):
                return W_BITS - j
        return RMAX

    def digest(members):
        regs = {}
        for m in members:
            hv = _h56(m)
            b = hv % HLL_M
            r = rho(hv // HLL_M)
            regs[b] = max(regs.get(b, 0), r)
        n_reg = len(regs)
        s_num = sum(2 ** (RMAX - r) for r in regs.values()) + (
            HLL_M - n_reg
        ) * 2**RMAX
        return n_reg, HLL_M - n_reg, s_num

    got = {
        (r["host"], r["h"]): (
            r["n_registers"], r["v_zero"], r["s_num"], r["est"]
        )
        for r in host_hyperball_anf(spark, SF_DIR).collect()
    }
    for v in nodes:
        for h in range(HB_HOPS + 1):
            n_reg, v0, s_num = digest(balls[v][h])
            assert got[(v, h)][:3] == (n_reg, v0, s_num), (v, h)

    # estimates track the true ball sizes within generous HLL bounds
    for v in nodes:
        ests = [got[(v, h)][3] for h in range(HB_HOPS + 1)]
        assert all(b >= a for a, b in zip(ests, ests[1:]))  # monotone
        # own ball: LinearCounting of one element = m*ln(m/(m-1)) ~ 1.002
        assert abs(got[(v, 0)][3] - 1.0) < 0.01
        true2 = len(balls[v][2])
        if true2 >= 30:
            assert abs(got[(v, 2)][3] - true2) / true2 < 0.35


# ------------------------------------------- filter_storage_advisor


def test_storage_advisor_matches_python_and_both_formats_win(spark):
    from harvester_spark.operators.index_stats import filter_storage_advisor

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "source"
    ).collect()
    n = len(docs)

    def vb(gap):
        return 1 + sum(1 for k in range(1, 8) if gap >= 128**k)

    expect = {}
    for dim in ("lang", "source"):
        groups = {}
        for r in docs:
            groups.setdefault(r[dim], []).append(r["doc_id"])
        for v, ids in groups.items():
            ids.sort()
            prev = -1
            pb = 0
            for d in ids:
                pb += vb(d - prev)
                prev = d
            bb = (n + 7) // 8
            expect[(dim, v)] = (
                len(ids),
                (1000 * len(ids)) // n,
                pb,
                bb,
                "postings" if pb <= bb else "bitmap",
            )

    got = {
        (r["dim"], r["value"]): (
            r["df"], r["density_milli"], r["postings_bytes"],
            r["bitmap_bytes"], r["chosen"],
        )
        for r in filter_storage_advisor(spark, SF_DIR).collect()
    }
    assert got == expect

    # the decision is real: both formats win somewhere, and every
    # bitmap pick is denser than every postings pick
    chosen = {v[4] for v in got.values()}
    assert chosen == {"postings", "bitmap"}
    bmin = min(v[1] for v in got.values() if v[4] == "bitmap")
    pmax = max(v[1] for v in got.values() if v[4] == "postings")
    assert bmin > pmax


# --------------------------------------------- rendezvous_hash_eval


def test_hrw_minimal_disruption_and_matches_python(spark):
    from harvester_spark.operators.index_stats import (
        HRW_N,
        rendezvous_hash_eval,
    )

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]

    def assign(ns):
        out = {}
        for d in doc_ids:
            out[d] = max(
                range(ns), key=lambda s: (_h56(f"hrw|{d}|{s}"), -s)
            )
        return out

    old = assign(HRW_N)
    new = assign(HRW_N + 1)
    n = len(doc_ids)
    expect = {}
    for s in range(HRW_N + 1):
        nd_new = sum(1 for d in doc_ids if new[d] == s)
        nd_old = sum(1 for d in doc_ids if old[d] == s)
        stayed = sum(1 for d in doc_ids if new[d] == s and old[d] == s)
        expect[s] = (
            nd_new, nd_old, nd_new - stayed,
            (1000 * (HRW_N + 1) * nd_new) // n,
        )

    got = {
        r["shard"]: (
            r["n_docs_new"], r["n_docs_old"], r["n_moved_in"],
            r["load_new_milli"],
        )
        for r in rendezvous_hash_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # the HRW defining property: docs move ONLY INTO the new shard
    for s in range(HRW_N):
        assert got[s][2] == 0
    assert got[HRW_N][2] == got[HRW_N][0] > 0
    # and the moved fraction is the minimal ~1/(NS+1)
    moved = got[HRW_N][2]
    assert abs(moved - n // (HRW_N + 1)) < n // 4
    # balance without virtual nodes: every shard within 2x of fair share
    assert all(300 < v[3] < 2000 for v in got.values())


# --------------------------------------------- query_containment_plan


def test_containment_implication_holds_and_matches_python(spark, corpus14):
    from harvester_spark.operators.ranking_ext import (
        CONT_QUERIES,
        query_containment_plan,
    )

    match = {
        q: {d for d, ts in corpus14.items() if set(terms) <= set(ts)}
        for q, terms in CONT_QUERIES.items()
    }
    expect = {}
    for qa, ta in CONT_QUERIES.items():
        for qb, tb in CONT_QUERIES.items():
            if qa == qb:
                continue
            plan = set(ta) <= set(tb)
            ov = len(match[qa] & match[qb])
            ver = ov == len(match[qb])
            expect[(qa, qb)] = (
                plan, len(match[qa]), len(match[qb]), ov, ver, plan and ver
            )

    got = {
        (r["q_cached"], r["q_new"]): (
            r["subset_plan"], r["n_cached"], r["n_new"], r["n_overlap"],
            r["containment_verified"], r["reuse"],
        )
        for r in query_containment_plan(spark, SF_DIR).collect()
    }
    assert got == expect

    # the AND-semantics implication holds wherever planned, at least one
    # pair genuinely reuses, and the non-subset controls genuinely fail
    assert all(v[4] for v in got.values() if v[0])
    assert any(v[5] for v in got.values())
    assert all(not v[4] for v in got.values() if not v[0])


# --------------------------------------------------- plan-shape guards


def test_session14_plan_shapes(spark):
    """Structural scale claims made in session-14 docstrings, asserted
    on the actual physical plans (the test_scale_plans discipline)."""
    from harvester_spark.operators.es_aggs import es_frequent_item_sets
    from harvester_spark.operators.click_models import (
        bandit_batched_egreedy,
        events_cascade_hourly,
    )
    from harvester_spark.operators.retrieval import ft_rocchio_rerank_topk

    # Apriori: the L1 prune is a real semi-join in the plan (cold items
    # never reach pair formation)
    plan = es_frequent_item_sets(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan

    # the bandit is pure synthesis: no parquet scan anywhere
    plan = bandit_batched_egreedy(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan

    # the cascade hourly op is ONE aggregation over a map-only explode:
    # no join in the whole plan (the row-local synthesis claim)
    plan = events_cascade_hourly(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    # Rocchio: the expansion vocabulary and idf ride BROADCAST joins
    # into the corpus scan (the bounded-dimension claim)
    plan = ft_rocchio_rerank_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------- ft_texttiling_segment


def test_texttiling_recovers_planted_boundaries(spark):
    from harvester_spark.operators.text_analytics import (
        TT_LEN,
        TT_VOCAB,
        TT_W,
        ft_texttiling_segment,
    )

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    nb = TT_LEN - 2 * TT_W
    expect = {}
    for d in doc_ids:
        b = TT_W + _h56(f"ttb|{d}") % (nb + 1)
        toks = [
            ("a" if i < b else "b") + str(_h56(f"ttw|{d}|{i}") % TT_VOCAB)
            for i in range(TT_LEN)
        ]
        best = None
        for g in range(TT_W, TT_LEN - TT_W + 1):
            left = Counter(toks[g - TT_W : g])
            right = Counter(toks[g : g + TT_W])
            ov = sum(min(left[t], right[t]) for t in left)
            key = (ov, g)
            if best is None or key < best:
                best = key
        expect[d] = (b, best[1], best[0], abs(best[1] - b) <= 2)

    got = {
        r["doc_id"]: (
            r["planted_b"], r["detected_b"], r["valley_overlap"], r["hit2"]
        )
        for r in ft_texttiling_segment(spark, SF_DIR).collect()
    }
    assert got == expect

    hits = sum(1 for v in got.values() if v[3])
    exact = sum(1 for v in got.values() if v[0] == v[1])
    assert hits >= 0.8 * len(got)  # valley finds the planted switch
    assert exact >= 0.4 * len(got)
    # the valley is a real dip: detected overlap is typically below the
    # window max (the two vocabularies genuinely differ)
    assert sum(v[2] for v in got.values()) < len(got) * TT_W // 2


# --------------------------------------------- events_hill_tail_index


def test_hill_recovers_planted_pareto_and_control_diverges(spark):
    from harvester_spark.operators.web_econ import (
        HILL_K_DIV,
        events_hill_tail_index,
    )

    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .collect()
    ]
    expect = {}
    for cohort in ("pareto2", "uniform"):
        xs = []
        for e in eids:
            u = _h56(f"ht|{e}") % 1_000_000
            if cohort == "pareto2":
                x = math.floor(1e6 / math.sqrt(1.0 - u / 1e6) + 0.5)
            else:
                x = u + 1
            xs.append((x, e))
        xs.sort(key=lambda t: (-t[0], t[1]))
        n = len(xs)
        k = n // HILL_K_DIV
        x_thr = xs[k][0]
        s = sum(
            math.floor(math.log(x / x_thr) * 1e6 + 0.5)
            for x, _ in xs[:k]
        )
        expect[cohort] = (n, k, s, (1000 * k * 1_000_000) // s)

    got = {
        r["cohort"]: (r["n"], r["k"], r["sum_ln_micro"], r["hill_milli"])
        for r in events_hill_tail_index(spark, SF_DIR).collect()
    }
    assert got == expect

    # the planted Pareto(2) is recovered; the bounded uniform control's
    # tail index diverges far above it
    assert abs(got["pareto2"][3] - 2000) < 450
    assert got["uniform"][3] > 4 * got["pareto2"][3]


# ---------------------------------------------- hybrid_condorcet_topk


def test_condorcet_matches_python_and_fuses_all_voters(spark, corpus14):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.text_analytics import (
        CDC_K,
        hybrid_condorcet_topk,
    )

    meta = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    nd = len(corpus14)
    tf = {d: Counter(ts) for d, ts in corpus14.items()}
    dls = {d: len(ts) for d, ts in corpus14.items()}
    avgdl = sum(dls.values()) / nd
    score = {}
    for t in BM25_TERMS:
        df = sum(1 for d in corpus14 if tf[d][t] > 0)
        idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
        for d in corpus14:
            f = tf[d][t]
            if f:
                score[d] = score.get(d, 0.0) + idf * (f * 2.2) / (
                    f + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl)
                )
    feats = {
        d: (
            round(score.get(d, 0.0), 6),
            meta[d],
            len(set(corpus14[d])),
        )
        for d in corpus14
    }

    def topk(ix):
        return [
            d for d in sorted(feats, key=lambda d: (-feats[d][ix], d))
        ][:CDC_K]

    cand = sorted(set(topk(0)) | set(topk(1)) | set(topk(2)))
    ranks = {}
    for ix in range(3):
        order = sorted(cand, key=lambda d: (-feats[d][ix], d))
        for r, d in enumerate(order, start=1):
            ranks.setdefault(d, [0, 0, 0])[ix] = r
    wins = {}
    for a in cand:
        w = 0
        for b in cand:
            if a == b:
                continue
            votes = sum(
                1 for ix in range(3) if ranks[a][ix] < ranks[b][ix]
            )
            w += votes >= 2
        wins[a] = w
    expect = sorted(cand, key=lambda d: (-wins[d], d))[:10]
    expect = [
        (r, d, wins[d], *ranks[d]) for r, d in enumerate(expect, start=1)
    ]

    got = [
        (
            r["rank"], r["doc_id"], r["copeland_wins"], r["r_bm25"],
            r["r_len"], r["r_div"],
        )
        for r in hybrid_condorcet_topk(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect

    # the fusion genuinely differs from every single voter's top-10
    for ix in range(3):
        assert [g[1] for g in got] != topk(ix)[:10]


# ----------------------------------------------- ft_score_gap_cutoff


def test_score_gap_cutoff_matches_python_and_defining_property(spark, corpus14):
    from harvester_spark.operators.fulltext_queries import (
        BM25_TERMS,
        GAP_POOL,
        ft_score_gap_cutoff,
    )

    nd = len(corpus14)
    tf = {d: Counter(ts) for d, ts in corpus14.items()}
    dls = {d: len(ts) for d, ts in corpus14.items()}
    avgdl = sum(dls.values()) / nd
    score = {}
    for t in BM25_TERMS:
        df = sum(1 for d in corpus14 if tf[d][t] > 0)
        idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
        for d in corpus14:
            f = tf[d][t]
            if f:
                score[d] = score.get(d, 0.0) + idf * (f * 2.2) / (
                    f + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl)
                )
    pool = sorted(
        ((round(round(s, 6) * 1e6), d) for d, s in score.items()),
        key=lambda x: (-x[0], x[1]),
    )[:GAP_POOL]
    gaps = [
        pool[i][0] - (pool[i + 1][0] if i + 1 < len(pool) else pool[i][0])
        for i in range(len(pool))
    ]
    cutoff = min(
        range(1, len(pool)), key=lambda r: (-gaps[r - 1], r)
    )
    expect = {
        r: (d, s, gaps[r - 1], cutoff, r <= cutoff)
        for r, (s, d) in enumerate(pool, start=1)
    }

    got = {
        r["rank"]: (
            r["doc_id"], r["s_micro"], r["gap_micro"], r["cutoff_rank"],
            r["kept"],
        )
        for r in ft_score_gap_cutoff(spark, SF_DIR).collect()
    }
    assert got == expect

    # defining property: the cutoff's gap is maximal, the kept set is
    # exactly the prefix, and truncation is non-trivial (1 <= c < pool)
    c = got[1][3]
    assert 1 <= c < GAP_POOL
    cgap = got[c][2]
    assert all(got[r][2] <= cgap for r in range(1, GAP_POOL))
    assert all(got[r][4] == (r <= c) for r in got)


# --------------------------------------------- events_robust_mean_eval


def test_robust_mean_breakdown_contrast(spark):
    from harvester_spark.operators.es_aggs import (
        RM_OUT_MOD,
        RM_OUT_MULT,
        RM_TRIM_PCT,
        events_robust_mean_eval,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("event_id", "CAST(round(value * 100) AS LONG) AS c")
        .collect()
    )
    expect = {}
    for cohort in ("clean", "contaminated"):
        xs = []
        for r in rows:
            x = r["c"]
            if cohort == "contaminated" and _h56(
                f"out|{r['event_id']}"
            ) % RM_OUT_MOD == 0:
                x *= RM_OUT_MULT
            xs.append((x, r["event_id"]))
        xs.sort()
        n = len(xs)
        lo = (n * RM_TRIM_PCT) // 100
        mean = (1000 * sum(x for x, _ in xs)) // n
        trimmed = (1000 * sum(x for x, _ in xs[lo : n - lo])) // (n - 2 * lo)
        median = 1000 * xs[(n + 1) // 2 - 1][0]
        expect[cohort] = (n, mean, trimmed, median)

    got = {
        r["cohort"]: (r["n"], r["mean_mc"], r["trimmed_mc"], r["median_mc"])
        for r in events_robust_mean_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # the breakdown: the mean explodes, the robust estimators hold
    cl, co = got["clean"], got["contaminated"]
    assert co[1] > 3 * cl[1]
    assert abs(co[2] - cl[2]) < cl[2] // 5
    assert abs(co[3] - cl[3]) < cl[3] // 5


# ------------------------------------------------ events_logrank_test


def test_logrank_planted_hazard_flagged_and_null_ratio(spark):
    from harvester_spark.operators.web_econ import (
        KM_HORIZON_H,
        events_logrank_test,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id", "event_id", "event_type",
            "CAST(unix_timestamp(ts) AS LONG) AS se",
        )
        .collect()
    )
    purch = {}
    for r in rows:
        if r["event_type"] == "purchase":
            purch.setdefault(r["user_id"], []).append(r["se"])
    subj = []
    for r in rows:
        if r["event_type"] != "signup":
            continue
        gaps = [p - r["se"] for p in purch.get(r["user_id"], []) if p > r["se"]]
        g = min(gaps) if gaps else None
        if g is not None and g // 3600 < KM_HORIZON_H:
            t, e = g // 3600, 1
        else:
            t, e = KM_HORIZON_H, 0
        subj.append((r["event_id"], t, e, _h56(f"lr|{r['event_id']}") % 2))

    def logrank(entries):
        times = sorted({t for _, t, _, _ in entries})
        o = e_sum = v_sum = 0
        removed1 = removed = 0
        n1_tot = sum(1 for _, _, _, g in entries if g == 0)
        n_tot = len(entries)
        for t in times:
            d1 = sum(1 for _, tt, ee, g in entries if tt == t and ee and g == 0)
            d = sum(1 for _, tt, ee, _ in entries if tt == t and ee)
            x1 = sum(1 for _, tt, _, g in entries if tt == t and g == 0)
            x = sum(1 for _, tt, _, _ in entries if tt == t)
            n1 = n1_tot - removed1
            nt = n_tot - removed
            removed1 += x1
            removed += x
            if d == 0 or nt <= 1:
                continue
            o += 1000 * d1
            e_sum += (1000 * d * n1) // nt
            v_sum += ((((1000 * d * n1) // nt) * (nt - n1)) // nt
                      * (nt - d)) // (nt - 1)
        chi2 = ((o - e_sum) ** 2 * 1000) // (1000 * v_sum)
        return o, e_sum, v_sum, chi2

    null_entries = subj
    dil_entries = [
        (
            s,
            min(2 * t, KM_HORIZON_H) if g == 1 else t,
            (1 if (2 * t < KM_HORIZON_H and e == 1) else 0) if g == 1 else e,
            g,
        )
        for s, t, e, g in subj
    ]
    expect = {
        "null_split": logrank(null_entries),
        "planted_dilation": logrank(dil_entries),
    }

    got = {
        r["comparison"]: (
            r["o_milli"], r["e_milli"], r["v_milli"], r["chi2_milli"]
        )
        for r in events_logrank_test(spark, SF_DIR).collect()
    }
    assert got == expect

    # tail-robust contrast: the planted hazard halving dominates the
    # null draw by an order of magnitude and clears significance
    assert got["planted_dilation"][3] > 10 * max(got["null_split"][3], 100)
    assert got["planted_dilation"][3] >= 3841


# ------------------------------------------------ events_simpson_cmh


def test_simpson_flip_and_cmh_recovery(spark):
    from harvester_spark.operators.es_aggs import (
        CMH_BASE,
        CMH_EFFECT,
        events_simpson_cmh,
    )

    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .collect()
    ]
    cells = Counter()
    succ = Counter()
    for e in eids:
        s = _h56(f"st|{e}") % 2
        tr = _h56(f"tr|{e}") % 4
        t = (1 if tr == 0 else 0) if s == 0 else (1 if tr < 3 else 0)
        p = CMH_BASE[s] + CMH_EFFECT * t
        y = 1 if _h56(f"sy|{e}") % 1000 < p else 0
        cells[(s, t)] += 1
        succ[(s, t)] += y

    def d(n1, c1, n0, c0):
        return (1000 * c1) // n1 - (1000 * c0) // n0

    marg = d(
        cells[(0, 1)] + cells[(1, 1)], succ[(0, 1)] + succ[(1, 1)],
        cells[(0, 0)] + cells[(1, 0)], succ[(0, 0)] + succ[(1, 0)],
    )
    strata = {
        s: d(cells[(s, 1)], succ[(s, 1)], cells[(s, 0)], succ[(s, 0)])
        for s in (0, 1)
    }
    num = den = 0
    for s in (0, 1):
        n1, n0 = cells[(s, 1)], cells[(s, 0)]
        num += (n1 * n0 * strata[s]) // (n1 + n0)
        den += (n1 * n0) // (n1 + n0)
    cmh = num // den if num >= 0 else -((-num) // den)

    got = {
        r["scope"]: (r["n_treated"], r["n_control"], r["diff_milli"])
        for r in events_simpson_cmh(spark, SF_DIR).collect()
    }
    assert got["marginal"][2] == marg
    assert got["stratum_0"][2] == strata[0]
    assert got["stratum_1"][2] == strata[1]
    assert got["cmh_adjusted"][2] == cmh

    # the paradox: marginal flips negative while every stratum and the
    # adjusted estimate are positive, near the planted +100
    assert got["marginal"][2] < -30
    assert got["stratum_0"][2] > 30 and got["stratum_1"][2] > 30
    assert abs(got["cmh_adjusted"][2] - CMH_EFFECT) < 60


# ------------------------------------------- emb_alignment_uniformity


def test_alignment_uniformity_matches_python_recompute(spark):
    from harvester_spark.operators.similarity import (
        AU_MAX_ID,
        emb_alignment_uniformity,
    )

    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    emb = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in rows
        if r["vec_id"] < AU_MAX_ID
    }
    lab = {r["vec_id"]: r["label"] for r in rows if r["vec_id"] < AU_MAX_ID}
    unit = {}
    for v, x in emb.items():
        n = math.sqrt(sum(a * a for a in x))
        unit[v] = [round(a / n, 6) for a in x]
    ids = sorted(unit)
    pos_d2 = []
    all_exp = []
    n_pos = n_all = 0
    align_num = 0.0
    for i, va in enumerate(ids):
        for vb in ids[i + 1 :]:
            d2 = round(
                sum((a - b) ** 2 for a, b in zip(unit[va], unit[vb])), 6
            )
            n_all += 1
            all_exp.append(round(math.exp(-2.0 * d2), 6))
            if lab[va] == lab[vb]:
                n_pos += 1
                align_num += d2
    alignment = math.floor(align_num / n_pos * 1e6 + 0.5)
    uniformity = -math.floor(
        -math.log(sum(all_exp) / n_all) * 1e6 + 0.5
    )

    row = emb_alignment_uniformity(spark, SF_DIR).collect()[0]
    assert (
        row["n_pos_pairs"], row["n_all_pairs"], row["alignment_micro"],
        row["uniformity_micro"],
    ) == (n_pos, n_all, alignment, uniformity)

    # sanity: distances on the unit sphere keep both metrics in range
    assert 0 < row["alignment_micro"] < 4_000_000
    assert -4_000_000 < row["uniformity_micro"] < 0


# ---------------------------------------------------- events_bh_fdr


def test_bh_fdr_matches_python_and_controls_fdr(spark):
    from harvester_spark.operators.es_aggs import (
        BH_ALT_PCT,
        BH_M,
        BH_Q_MILLI,
        events_bh_fdr,
    )

    drawn = []
    for h in range(BH_M):
        u = _h56(f"bh|{h}") % 1_000_000
        alt = _h56(f"ba|{h}") % 100 < BH_ALT_PCT
        p = u // 10000 if alt else u
        drawn.append((h, alt, p))
    ranked = sorted(drawn, key=lambda t: (t[2], t[0]))
    kmax = 0
    for i, (_, _, p) in enumerate(ranked, start=1):
        if 1000 * BH_M * p <= i * BH_Q_MILLI * 1_000_000:
            kmax = i
    expect = {}
    for i, (h, alt, p) in enumerate(ranked, start=1):
        expect[h] = (
            alt, p, i, i <= kmax,
            1000 * BH_M * p <= BH_Q_MILLI * 1_000_000,
        )

    got = {
        r["h_id"]: (
            r["is_alt"], r["p_micro"], r["rank"], r["bh_reject"],
            r["bonf_reject"],
        )
        for r in events_bh_fdr(spark, SF_DIR).collect()
    }
    assert got == expect

    bh = sum(1 for v in got.values() if v[3])
    bonf = sum(1 for v in got.values() if v[4])
    bh_false = sum(1 for v in got.values() if v[3] and not v[0])
    n_alt = sum(1 for v in got.values() if v[0])
    bh_true = sum(1 for v in got.values() if v[3] and v[0])

    assert bh > bonf  # the BH power gain over Bonferroni
    assert bh_true >= n_alt - 1  # strong effects are found
    # realized false-discovery proportion lands near the q = 0.10 target
    assert bh_false <= (2 * BH_Q_MILLI * bh) // 1000
    assert bh_false > 0  # FDR control != FWER control — some nulls pass


# ------------------------------------------------ ltr_ipw_debias_eval


def test_ipw_debias_matches_python_and_beats_naive(spark):
    from itertools import combinations

    from harvester_spark.operators.click_models import (
        N_POS,
        ltr_ipw_debias_eval,
    )

    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .collect()
    ]
    cells = {}
    for e in eids:
        item = _h56(f"iw|{e}") % 40
        p = 1 + (item * 3) % N_POS
        u = _h56(f"ic|{e}") % 1000
        gamma = 1000 // p
        alpha = 150 + (item * 37) % 700
        c = 1 if u < (gamma * alpha) // 1000 else 0
        n, s = cells.get((item, p), (0, 0))
        cells[(item, p)] = (n + 1, s + c)
    expect = {
        (i, p): (
            n, s, (1000 * s) // n, (1000 * s * p) // n,
            150 + (i * 37) % 700,
        )
        for (i, p), (n, s) in cells.items()
    }

    got = {
        (r["item"], r["p"]): (
            r["n_impr"], r["n_clicks"], r["naive_ctr_milli"],
            r["ipw_alpha_milli"], r["alpha_true_milli"],
        )
        for r in ltr_ipw_debias_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # the debiasing is measurable: IPW orders items by true alpha far
    # better than the position-confounded naive CTR
    rows = sorted(got.values(), key=lambda v: v[4])

    def tau(ix):
        c = d = 0
        for a, b in combinations(rows, 2):
            s = (a[ix] - b[ix]) * (a[4] - b[4])
            c += s > 0
            d += s < 0
        return (c - d) / max(c + d, 1)

    t_naive, t_ipw = tau(2), tau(3)
    # sf0.001 has ~25 impressions/item -- the gap, not the absolute
    # level, is the robust pin (0.38 -> 0.77 at sf0.01)
    assert t_ipw > t_naive + 0.15
    assert t_ipw > 0.3


# --------------------------------------------- host_bipartite_modularity


def test_barber_modularity_matches_python_and_beats_newman_null(spark):
    from harvester_spark.operators.graph import (
        host_bipartite_modularity,
        host_labelprop_communities,
        host_labelprop_modularity,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    fan = max(len(docs) // 2, 20)
    edges = set()
    for r in docs:
        leaf = f"h{_h56(str(r['doc_id'])) % fan}"
        if r["source"] != leaf:
            edges.add((r["source"], leaf))
    m = len(edges)
    labels = {
        r["host"]: r["label"]
        for r in host_labelprop_communities(spark, SF_DIR).collect()
    }
    e_c = Counter()
    k_c = Counter()
    d_c = Counter()
    for hub, leaf in edges:
        k_c[labels[hub]] += 1
        d_c[labels[leaf]] += 1
        if labels[hub] == labels[leaf]:
            e_c[labels[hub]] += 1
    comms = set(k_c) | set(d_c)
    qb_num = sum(
        m * e_c[c] - k_c[c] * d_c[c] for c in comms
    )
    qb_micro = (
        (qb_num * 1_000_000) // (m * m)
        if qb_num >= 0
        else -(((-qb_num) * 1_000_000) // (m * m))
    )

    row = host_bipartite_modularity(spark, SF_DIR).collect()[0]
    assert (
        row["n_edges"], row["n_communities"], row["qb_num"], row["qb_micro"]
    ) == (m, len(comms), qb_num, qb_micro)

    # the substantive claim: the bipartite null never deflates Q the way
    # the unipartite null does on a bipartite graph, and the partition
    # has real structure under the CORRECT null
    newman = host_labelprop_modularity(spark, SF_DIR).collect()[0]["q_micro"]
    assert row["qb_micro"] >= newman
    assert row["qb_micro"] > 250_000


# ----------------------------------------- train_negative_sampling_eval


def test_negative_sampling_table_exact_and_damping_real(spark, corpus14):
    from harvester_spark.operators.training_prep import (
        NS_DRAWS,
        train_negative_sampling_eval,
    )

    cf = Counter()
    for ts in corpus14.values():
        cf.update(ts)
    terms = sorted(cf)
    w = {t: math.floor(math.exp(0.75 * math.log(cf[t])) * 1e3) for t in terms}
    lo = {}
    acc = 0
    for t in terms:
        lo[t] = acc
        acc += w[t]
    tw = acc
    drawn = Counter()
    for i in range(NS_DRAWS):
        u = _h56(f"ns|{i}") % tw
        # find the bucket
        for t in terms:
            if lo[t] <= u < lo[t] + w[t]:
                drawn[t] += 1
                break
    expect = {
        t: (
            cf[t], w[t], (1_000_000 * w[t]) // tw, drawn[t],
            (1_000_000 * drawn[t]) // NS_DRAWS,
        )
        for t in terms
    }

    got = {
        r["term"]: (
            r["cf"], r["w"], r["expected_micro"], r["n_drawn"],
            r["realized_micro"],
        )
        for r in train_negative_sampling_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # realized tracks expected within multinomial noise
    for t, (c, _, e, _, r) in got.items():
        if e >= 2000:
            assert abs(r - e) < max(e // 3, 2000)
    # the 0.75 damping genuinely moves mass toward the tail: the rare
    # term's damped share more than doubles its raw share, the head's
    # damped share drops below its raw share
    tot_cf = sum(v[0] for v in got.values())
    rare = min(got, key=lambda t: got[t][0])
    head = max(got, key=lambda t: got[t][0])
    raw_share = lambda t: (1_000_000 * got[t][0]) // tot_cf
    assert got[rare][2] > 2 * raw_share(rare)
    assert got[head][2] < raw_share(head)


# ------------------------------------------------ events_skyline_users


def test_skyline_matches_python_and_frontier_properties(spark):
    from harvester_spark.operators.relational import events_skyline_users

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_type")
        .collect()
    )
    per = {}
    for r in rows:
        p, e = per.get(r["user_id"], (0, 0))
        per[r["user_id"]] = (
            p + (r["event_type"] == "purchase"),
            e + (r["event_type"] == "error"),
        )

    def dominated(a):
        return any(
            b[0] >= a[0] and b[1] <= a[1] and (b[0] > a[0] or b[1] < a[1])
            for b in per.values()
        )

    expect = {
        u: (p, e, not dominated((p, e))) for u, (p, e) in per.items()
    }
    got = {
        r["user_id"]: (r["n_purchases"], r["n_errors"], r["on_skyline"])
        for r in events_skyline_users(spark, SF_DIR).collect()
    }
    assert got == expect

    sky = [(p, e) for p, e, s in got.values() if s]
    assert 0 < len(sky) < len(got)  # a real frontier, not everything
    # frontier property: sorted by purchases desc, errors strictly
    # increase as purchases decrease (staircase), and no skyline point
    # dominates another
    for a in sky:
        for b in sky:
            if a != b:
                assert not (
                    a[0] >= b[0] and a[1] <= b[1]
                    and (a[0] > b[0] or a[1] < b[1])
                )


# ------------------------------------------------ fagin_ta_cost_eval


def test_fagin_ta_trace_exact_and_instance_correct(spark, corpus14):
    from harvester_spark.operators.fulltext_queries import BM25_TERMS
    from harvester_spark.operators.index_stats import (
        TA_K,
        TA_MAX_DEPTH,
        fagin_ta_cost_eval,
    )

    nchars = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    nd = len(corpus14)
    tf = {d: Counter(ts) for d, ts in corpus14.items()}
    dls = {d: len(ts) for d, ts in corpus14.items()}
    avgdl = sum(dls.values()) / nd
    sc = {}
    for t in BM25_TERMS:
        df = sum(1 for d in corpus14 if tf[d][t] > 0)
        idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
        for d in corpus14:
            f = tf[d][t]
            if f:
                sc[d] = sc.get(d, 0.0) + idf * (f * 2.2) / (
                    f + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl)
                )
    s1 = {d: round(round(sc.get(d, 0.0), 6) * 1e6) for d in corpus14}
    s2 = {
        d: (1_000_000 * nchars[d]) // (nchars[d] + 1200) for d in corpus14
    }
    tot = {d: s1[d] + s2[d] for d in corpus14}
    l1 = sorted(corpus14, key=lambda d: (-s1[d], d))
    l2 = sorted(corpus14, key=lambda d: (-s2[d], d))
    r1 = {d: i for i, d in enumerate(l1, start=1)}
    r2 = {d: i for i, d in enumerate(l2, start=1)}
    expect = {}
    for p in range(1, TA_MAX_DEPTH + 1):
        thr = s1[l1[p - 1]] + s2[l2[p - 1]]
        seen = [d for d in corpus14 if r1[d] <= p or r2[d] <= p]
        seen.sort(key=lambda d: (-tot[d], d))
        kth = tot[seen[TA_K - 1]] if len(seen) >= TA_K else 0
        expect[p] = (
            s1[l1[p - 1]], s2[l2[p - 1]], thr, kth, kth >= thr
        )

    got = {
        r["p"]: (
            r["t1_micro"], r["t2_micro"], r["threshold_micro"],
            r["kth_best_micro"], r["stopped"],
        )
        for r in fagin_ta_cost_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    stops = [p for p, v in got.items() if v[4]]
    assert stops, "TA must terminate within the trace"
    stop = min(stops)
    assert stop < len(corpus14) // 4  # genuine early termination
    # instance correctness: the true top-k by total score are all seen
    true_topk = sorted(corpus14, key=lambda d: (-tot[d], d))[:TA_K]
    assert all(r1[d] <= stop or r2[d] <= stop for d in true_topk)


# ------------------------------------------------ ndv_sample_chao_eval


def test_chao_ndv_matches_python_and_correction_helps(spark, corpus14):
    from harvester_spark.operators.index_stats import (
        NDV_SAMPLE_MOD,
        ndv_sample_chao_eval,
    )

    n_docs = len(corpus14)
    space = max(n_docs // 2, 20)
    stream = []
    for d, ts in corpus14.items():
        for pos, t in enumerate(ts):
            stream.append((d, pos, t))
        stream.append((d, -1, f"rare{_h56(f'nv|{d}') % space}"))
    true_ndv = len({t for _, _, t in stream})
    freq = Counter(
        t
        for d, pos, t in stream
        if _h56(f"ns2|{d}|{pos}|{t}") % NDV_SAMPLE_MOD == 0
    )
    sample_ndv = len(freq)
    f1 = sum(1 for c in freq.values() if c == 1)
    f2 = sum(1 for c in freq.values() if c == 2)
    chao = 1000 * sample_ndv + (1000 * f1 * f1) // (2 * max(f2, 1))

    row = ndv_sample_chao_eval(spark, SF_DIR).collect()[0]
    assert (
        row["true_ndv"], row["sample_ndv"], row["f1"], row["f2"],
        row["chao_ndv_milli"],
    ) == (true_ndv, sample_ndv, f1, f2, chao)

    # the correction genuinely helps: Chao1 sits strictly closer to the
    # truth than the raw sample count, and respects its lower-bound
    # character
    raw_err = abs(1000 * true_ndv - 1000 * sample_ndv)
    chao_err = abs(1000 * true_ndv - chao)
    assert chao_err < raw_err // 2
    assert chao >= 1000 * sample_ndv
    assert chao <= 1200 * true_ndv


# ------------------------------------------ join_cardinality_est_eval


def test_join_cardinality_histogram_fixes_correlation(spark):
    from harvester_spark.operators.relational import (
        JC_BUCKETS,
        join_cardinality_est_eval,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id")
        .collect()
    )
    mu = max(r["user_id"] for r in rows) + 1
    per = {}
    for r in rows:
        h4 = _h56(f"jc|{r['event_id']}") % 4
        if 2 * r["user_id"] < mu:
            side = 0 if h4 < 3 else 1
        else:
            side = 1 if h4 < 3 else 0
        a, b = per.get(r["user_id"], (0, 0))
        per[r["user_id"]] = (a + (side == 0), b + (side == 1))

    n_a = sum(a for a, _ in per.values())
    n_b = sum(b for _, b in per.values())
    da = sum(1 for a, _ in per.values() if a > 0)
    db = sum(1 for _, b in per.values() if b > 0)
    exact = sum(a * b for a, b in per.values())
    indep = (n_a * n_b) // max(da, db)
    hist = 0
    buckets = {}
    for u, (a, b) in per.items():
        k = (u * JC_BUCKETS) // mu
        ai, bi, dai, dbi = buckets.get(k, (0, 0, 0, 0))
        buckets[k] = (ai + a, bi + b, dai + (a > 0), dbi + (b > 0))
    for ai, bi, dai, dbi in buckets.values():
        hist += (ai * bi) // max(max(dai, dbi), 1)

    def err(est):
        return (
            (1000 * (est - exact)) // exact
            if est >= exact
            else -((1000 * (exact - est)) // exact)
        )

    row = join_cardinality_est_eval(spark, SF_DIR).collect()[0]
    assert (
        row["n_a"], row["n_b"], row["exact_join"], row["indep_est"],
        row["hist_est"], row["indep_err_milli"], row["hist_err_milli"],
    ) == (n_a, n_b, exact, indep, hist, err(indep), err(hist))

    # the correlated-columns story: independence overestimates badly,
    # the range-aligned histogram recovers nearly all of it
    assert row["indep_err_milli"] > 150
    assert abs(row["hist_err_milli"]) < row["indep_err_milli"] // 5


# --------------------------------------- segment_merge_huffman_eval


def test_huffman_schedule_optimal_on_instance(spark):
    import heapq

    from harvester_spark.operators.index_stats import (
        HUF_N,
        segment_merge_huffman_eval,
    )

    sizes = [
        10 * 2 ** (_h56(f"sg|{s}") % 5) for s in range(HUF_N)
    ]
    h = sorted(sizes)
    heapq.heapify(h)
    cum = 0
    huff = []
    while len(h) > 1:
        a, b = heapq.heappop(h), heapq.heappop(h)
        cum += a + b
        huff.append((a + b, cum))
        heapq.heappush(h, a + b)

    got = {
        r["step"]: (
            r["merged_mb"], r["huffman_cum_mb"], r["seq_cum_mb"],
            r["balanced_cum_mb"],
        )
        for r in segment_merge_huffman_eval(spark, SF_DIR).collect()
    }
    for i, (m, c) in enumerate(huff, start=1):
        assert got[i][:2] == (m, c)

    # Huffman optimality on the instance: the final Huffman total is
    # minimal among the three schedules (and the sizes are genuinely
    # skewed so the schedules actually differ)
    last = got[HUF_N - 1]
    assert last[1] <= last[2]
    assert last[1] <= last[3]
    assert len(set(sizes)) > 2
    assert last[2] != last[1] or last[3] != last[1]


# ----------------------------------------- learned_index_error_eval


def test_learned_index_bucketing_shrinks_epsilon(spark):
    from harvester_spark.operators.index_stats import (
        LI_BUCKETS,
        learned_index_error_eval,
    )

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    keys = sorted(
        {
            ((u * u) // 1_000_000 * u) // 1_000_000
            for u in (_h56(f"ky|{d}") % 1_000_000 for d in doc_ids)
        }
    )
    n = len(keys)
    # overflow-guard key downscale, mirrored from _LI_SCALE (index_stats):
    # S = 1 below ~208 keys, grows like n^3/9e6 above
    s = max(1, ((n * n) // 9000) * n // 1000 + 1)
    pts = [(k // s, i) for i, k in enumerate(keys)]

    def fit(sub):
        nk = len(sub)
        sx = sum(k for k, _ in sub)
        sy = sum(p for _, p in sub)
        sxy = sum(k * p for k, p in sub)
        sxx = sum(k * k for k, _ in sub)
        num = nk * sxy - sx * sy
        den = max(nk * sxx - sx * sx, 1)
        b = (
            (num * 1_000_000 + den // 2) // den
            if num >= 0
            else -(((-num) * 1_000_000 + den // 2) // den)
        )
        anum = 1_000_000 * sy - b * sx
        a = anum // nk if anum >= 0 else -((-anum) // nk)
        err = 0
        for k, p in sub:
            pr = a + b * k
            pred = pr // 1_000_000 if pr >= 0 else -((-pr) // 1_000_000)
            err = max(err, abs(pred - p))
        return nk, b, err

    expect = {}
    for bkt in range(LI_BUCKETS):
        sub = [(k, p) for k, p in pts if (p * LI_BUCKETS) // n == bkt]
        expect[("bucketed", bkt)] = fit(sub)
    expect[("global", 0)] = fit(pts)

    got = {
        (r["model"], r["bkt"]): (r["n_keys"], r["b_micro"], r["max_err"])
        for r in learned_index_error_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # the learned-index claim: on the skewed CDF, per-bucket models cut
    # the fallback window by several times
    g = got[("global", 0)][2]
    bmax = max(v[2] for (m, _), v in got.items() if m == "bucketed")
    assert g > 4 * bmax


# ------------------------------------ events_regression_discontinuity


def test_rdd_recovers_jump_and_placebo_flat(spark):
    from harvester_spark.operators.web_econ import (
        RD_BW,
        RD_CUTOFF,
        RD_JUMP,
        RD_PLACEBO,
        events_regression_discontinuity,
    )

    eids = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .collect()
    ]
    expect = {}
    for name, c in (("true_cutoff", RD_CUTOFF), ("placebo", RD_PLACEBO)):
        nb = na = sb = sa = 0
        for e in eids:
            x = _h56(f"rx|{e}") % 1000
            if not (c - RD_BW <= x < c + RD_BW):
                continue
            noise = _h56(f"rn|{e}") % 1001 - 500
            y = 2000 + 3 * x + (RD_JUMP if x >= RD_CUTOFF else 0) + noise
            if x >= c:
                na += 1
                sa += y
            else:
                nb += 1
                sb += y
        expect[name] = (
            nb, na, (1000 * sb) // nb, (1000 * sa) // na,
            (1000 * sa) // na - (1000 * sb) // nb,
        )

    got = {
        r["cutoff_name"]: (
            r["n_below"], r["n_above"], r["mean_below_milli"],
            r["mean_above_milli"], r["jump_milli"],
        )
        for r in events_regression_discontinuity(spark, SF_DIR).collect()
    }
    assert got == expect

    # the discontinuity is identified: the true cutoff recovers the
    # planted jump (plus the known slope*bandwidth bias <= 3*BW), the
    # placebo shows only the bias
    bias = 3 * RD_BW
    true_j = got["true_cutoff"][4]
    plc_j = got["placebo"][4]
    assert abs(true_j - (RD_JUMP + bias) * 1000) < 900 * 1000
    assert abs(plc_j) < (bias + 500) * 1000
    assert true_j > 3 * abs(plc_j)


# ------------------------------------------ host_percolation_robustness


def test_percolation_matches_union_find_and_transition(spark):
    from harvester_spark.operators.graph import (
        PERC_LEVELS,
        host_percolation_robustness,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    fan = max(len(docs) // 2, 20)
    edges = set()
    for r in docs:
        dst = f"h{_h56(str(r['doc_id'])) % fan}"
        if r["source"] != dst:
            a, b = min(r["source"], dst), max(r["source"], dst)
            edges.add((a, b))

    expect = {}
    for q in PERC_LEVELS:
        kept = [
            (a, b) for a, b in edges if _h56(f"pc|{a}|{b}") % 1000 < q
        ]
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in kept:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        sizes = Counter(find(x) for x in parent)
        n = len(parent)
        big = max(sizes.values())
        expect[q] = (n, big, (1000 * big) // n)

    got = {
        r["level_permille"]: (r["n_nodes"], r["largest_cc"], r["share_milli"])
        for r in host_percolation_robustness(spark, SF_DIR).collect()
    }
    assert got == expect

    # the percolation transition is real: fragmented at the lowest
    # retention, a dominant giant component at the highest, monotone
    shares = [got[q][2] for q in sorted(got)]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert shares[0] < 300  # 100 permille: genuinely fragmented
    assert shares[-1] > 900


# ------------------------------------- sampling_design_variance_eval


def test_sampling_design_effect_matches_python(spark):
    from harvester_spark.operators.training_prep import (
        SD_K,
        SD_REPS,
        sampling_design_variance_eval,
    )

    doc_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    n = len(doc_ids)
    tt = n * (n - 1) // 2
    ests = {"systematic": [], "bernoulli": []}
    for r in range(SD_REPS):
        off = _h56(f"so|{r}") % SD_K
        ests["systematic"].append(
            SD_K * sum(p for p in range(n) if p % SD_K == off)
        )
        ests["bernoulli"].append(
            SD_K
            * sum(p for p in range(n) if _h56(f"bm|{r}|{p}") % SD_K == 0)
        )
    expect = {}
    for d, es in ests.items():
        s1, s2 = sum(es), sum(e * e for e in es)
        mean = s1 // SD_REPS
        var = SD_REPS * s2 - s1 * s1
        bias = (
            (1000 * (mean - tt)) // tt
            if mean >= tt
            else -((1000 * (tt - mean)) // tt)
        )
        expect[d] = (SD_REPS, tt, mean, var, bias)
    bv = expect["bernoulli"][3]
    full = {
        d: (*v, (1000 * v[3]) // max(bv, 1)) for d, v in expect.items()
    }

    got = {
        r["design"]: (
            r["n_reps"], r["true_total"], r["mean_est"], r["var_num"],
            r["rel_bias_milli"], r["var_ratio_milli_vs_bern"],
        )
        for r in sampling_design_variance_eval(spark, SF_DIR).collect()
    }
    assert got == full

    # the design effect on a trended frame: systematic's variance is a
    # tiny fraction of Bernoulli's, both near-unbiased
    assert got["systematic"][5] < 100  # < 10% of Bernoulli variance
    assert abs(got["systematic"][4]) < 50
    assert abs(got["bernoulli"][4]) < 200


# -------------------------------------- crawl_secretary_admission_eval


def test_secretary_rule_hits_one_over_e_band(spark):
    from harvester_spark.operators.graph import (
        SEC_K,
        SEC_OBS,
        SEC_REPS,
        crawl_secretary_admission_eval,
    )

    succ = 0
    for rep in range(SEC_REPS):
        qs = [_h56(f"sq|{rep}|{i}") for i in range(SEC_K)]
        thr = max(qs[:SEC_OBS])
        pick = next((q for q in qs[SEC_OBS:] if q > thr), None)
        succ += pick is not None and pick == max(qs)

    row = crawl_secretary_admission_eval(spark, SF_DIR).collect()[0]
    assert (row["n_reps"], row["n_success"]) == (SEC_REPS, succ)
    assert row["success_milli"] == (1000 * succ) // SEC_REPS
    # the 1/e law: success rate in the optimal-stopping band, far above
    # the random-pick baseline
    assert 230 <= row["success_milli"] <= 500
    assert row["success_milli"] > 4 * row["baseline_milli"]


# ------------------------------------------------ cache_ski_rental_eval


def test_ski_rental_two_competitive_bound(spark):
    from harvester_spark.operators.index_stats import (
        SKI_B,
        SKI_REPS,
        cache_ski_rental_eval,
    )

    n_buy = 0
    ratios = []
    for r in range(SKI_REPS):
        if _h56(f"sk|{r}") % 2 == 0:
            uses = 1 + _h56(f"su|{r}") % 4
        else:
            uses = 8 + _h56(f"su|{r}") % 32
        rule = uses if uses < SKI_B else SKI_B - 1 + SKI_B
        opt = min(uses, SKI_B)
        ratios.append((1000 * rule) // opt)
        n_buy += uses >= SKI_B

    row = cache_ski_rental_eval(spark, SF_DIR).collect()[0]
    assert (
        row["n_reps"], row["n_buy_regime"], row["worst_ratio_milli"],
        row["mean_ratio_milli"],
    ) == (SKI_REPS, n_buy, max(ratios), sum(ratios) // SKI_REPS)

    # the 2-competitive guarantee holds on every replicate, both
    # regimes genuinely occur, and the average sits inside the bound
    assert row["worst_ratio_milli"] <= 2000
    assert 0 < row["n_buy_regime"] < SKI_REPS
    assert 1000 <= row["mean_ratio_milli"] < 2000


# -------------------------------------- curation_pooled_screening_eval


def test_pooled_screening_matches_python_and_dorfman_savings(spark):
    from harvester_spark.operators.curation import (
        POOL_PREV_PCT,
        POOL_SIZE,
        curation_pooled_screening_eval,
    )

    doc_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    pools = {}
    for i, d in enumerate(doc_ids):
        pos = _h56(f"ct|{d}") % 100 < POOL_PREV_PCT
        sz, np_ = pools.get(i // POOL_SIZE, (0, 0))
        pools[i // POOL_SIZE] = (sz + 1, np_ + pos)
    n = len(doc_ids)
    n_pos = sum(p for _, p in pools.values())
    pos_pools = sum(1 for _, p in pools.values() if p > 0)
    tests = sum(1 + (sz if p > 0 else 0) for sz, p in pools.values())

    row = curation_pooled_screening_eval(spark, SF_DIR).collect()[0]
    assert (
        row["n_docs"], row["n_positive"], row["n_pools"],
        row["n_positive_pools"], row["tests_pooled"],
        row["tests_individual"], row["savings_milli"],
    ) == (
        n, n_pos, len(pools), pos_pools, tests, n, (1000 * tests) // n
    )

    # the Dorfman savings are real and near theory 1/s + 1-(1-p)^s
    assert row["savings_milli"] < 500  # >2x cheaper than individual
    theory = 1000 / POOL_SIZE + 1000 * (
        1 - (1 - POOL_PREV_PCT / 100) ** POOL_SIZE
    )
    assert abs(row["savings_milli"] - theory) < 150
    assert row["n_positive"] > 0  # contamination genuinely planted


# --------------------------------------------- vocab_missing_mass_gt


def test_good_turing_missing_mass_near_truth(spark, corpus14):
    from harvester_spark.operators.index_stats import (
        NDV_SAMPLE_MOD,
        vocab_missing_mass_gt,
    )

    n_docs = len(corpus14)
    space = max(n_docs // 2, 20)
    stream = []
    for d, ts in corpus14.items():
        for pos, t in enumerate(ts):
            stream.append((d, pos, t))
        stream.append((d, -1, f"rare{_h56(f'nv|{d}') % space}"))
    sfreq = Counter(
        t for d, p, t in stream
        if _h56(f"ns2|{d}|{p}|{t}") % NDV_SAMPLE_MOD == 0
    )
    n_sample = sum(sfreq.values())
    f1 = sum(1 for c in sfreq.values() if c == 1)
    pop = Counter(t for _, _, t in stream)
    unseen_occ = sum(c for t, c in pop.items() if t not in sfreq)
    pop_tot = sum(pop.values())

    row = vocab_missing_mass_gt(spark, SF_DIR).collect()[0]
    assert (
        row["n_sample"], row["f1"], row["gt_missing_milli"],
        row["true_missing_milli"], row["abs_err_milli"],
    ) == (
        n_sample, f1, (1000 * f1) // n_sample,
        (1000 * unseen_occ) // pop_tot,
        abs((1000 * f1) // n_sample - (1000 * unseen_occ) // pop_tot),
    )

    # the Good-Turing theorem, empirically: both masses nonzero (the
    # planted tail makes unseen types real) and the estimate lands
    # within a few milli of the truth
    assert row["true_missing_milli"] > 0
    assert row["gt_missing_milli"] > 0
    assert row["abs_err_milli"] <= 10


# -------------------------------------- events_inspection_paradox_eval


def test_inspection_paradox_identity_and_inflation(spark):
    from harvester_spark.operators.web_econ import (
        events_inspection_paradox_eval,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .collect()
    )
    per = Counter(r["user_id"] for r in rows)
    u = len(per)
    s1 = sum(per.values())
    s2 = sum(n * n for n in per.values())

    row = events_inspection_paradox_eval(spark, SF_DIR).collect()[0]
    assert (
        row["n_users"], row["n_events"], row["user_mean_milli"],
        row["event_mean_milli"], row["inflation_milli"],
    ) == (u, s1, (1000 * s1) // u, (1000 * s2) // s1,
          (1000 * s2 * u) // (s1 * s1))

    # the paradox: event-sampled mean strictly exceeds user mean
    # (Cauchy-Schwarz is strict unless all users identical)
    assert row["event_mean_milli"] > row["user_mean_milli"]
    assert row["inflation_milli"] > 1000


# -------------------------------------- hash_collision_birthday_eval


def test_birthday_bound_and_56bit_cleanliness(spark):
    from harvester_spark.operators.index_stats import (
        BD_BITS,
        BD_N,
        hash_collision_birthday_eval,
    )

    occ = Counter(
        _h56(f"bd|{k}") % (1 << BD_BITS) for k in range(BD_N)
    )
    pairs = sum(c * (c - 1) // 2 for c in occ.values())
    occ56 = Counter(_h56(f"bd|{k}") % (1 << 56) for k in range(BD_N))
    pairs56 = sum(c * (c - 1) // 2 for c in occ56.values())

    got = {
        r["bits"]: (r["n_colliding_pairs"], r["expected_pairs_milli"])
        for r in hash_collision_birthday_eval(spark, SF_DIR).collect()
    }
    assert got[BD_BITS][0] == pairs
    assert got[56][0] == pairs56

    # the birthday bound is real at the short width (observed within
    # the Poisson band of expectation) and 56 bits stay collision-free
    exp = got[BD_BITS][1] / 1000
    assert abs(got[BD_BITS][0] - exp) < 5 * max(exp, 1) ** 0.5 + 3
    assert got[BD_BITS][0] > 5
    assert got[56][0] == 0


# -------------------------------------- crawl_coupon_collector_eval


def test_coupon_collector_band_and_recompute(spark):
    from harvester_spark.operators.graph import (
        CC_REPS,
        CC_SPACE,
        CC_T,
        crawl_coupon_collector_eval,
    )

    expect = {}
    for rep in range(CC_REPS):
        firsts = {}
        for t in range(1, CC_T + 1):
            c = _h56(f"cc|{rep}|{t}") % CC_SPACE
            firsts.setdefault(c, t)
        done = len(firsts) == CC_SPACE
        expect[rep] = (done, max(firsts.values()) if done else CC_T)

    got = {
        r["rep"]: (r["completed"], r["completion_draws"])
        for r in crawl_coupon_collector_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # the n*H_n law: the mean completion sits in the theory band
    theory = CC_SPACE * sum(1.0 / i for i in range(1, CC_SPACE + 1))
    mean = sum(v[1] for v in got.values()) / len(got)
    assert abs(mean - theory) < theory * 0.35
    assert all(v[0] for v in got.values())  # budget covers every rep


# ------------------------------------------------ events_sprt_eval


def test_sprt_matches_python_and_stops_early(spark):
    from harvester_spark.operators.es_aggs import (
        SPRT_A,
        SPRT_DN,
        SPRT_P1_PCT,
        SPRT_REPS,
        SPRT_T,
        SPRT_UP,
        events_sprt_eval,
    )

    expect = {}
    for rep in range(SPRT_REPS):
        llr = 0
        out = ("undecided", SPRT_T, 0)
        for t in range(1, SPRT_T + 1):
            u = _h56(f"sp|{rep}|{t}") % 100
            llr += SPRT_UP if u < SPRT_P1_PCT else SPRT_DN
            if llr >= SPRT_A:
                out = ("accept_h1", t, llr)
                break
            if llr <= -SPRT_A:
                out = ("accept_h0", t, llr)
                break
        expect[rep] = (out[0] != "undecided", out[0], out[1], out[2])

    got = {
        r["rep"]: (
            r["decided"], r["decision"], r["stop_t"],
            r["llr_at_stop_micro"],
        )
        for r in events_sprt_eval(spark, SF_DIR).collect()
    }
    assert got == expect

    # the sequential design works: the planted effect is overwhelmingly
    # detected, errors stay near the designed beta, and the mean sample
    # size is well under the ~100-observation fixed-n equivalent
    h1 = sum(1 for v in got.values() if v[1] == "accept_h1")
    assert h1 >= int(0.85 * SPRT_REPS)
    decided = [v[2] for v in got.values() if v[0]]
    assert sum(decided) / len(decided) < 100


# --------------------------------------------- events_ci_coverage_eval


def test_wilson_holds_where_wald_collapses(spark):
    from harvester_spark.operators.es_aggs import (
        CI_N,
        CI_P_PCT,
        CI_REPS,
        events_ci_coverage_eval,
    )

    p_micro = CI_P_PCT * 10000
    cover = {"wald": 0, "wilson": 0}
    zero_w = 0
    for rep in range(CI_REPS):
        k = sum(
            1 for i in range(CI_N)
            if _h56(f"ci|{rep}|{i}") % 100 < CI_P_PCT
        )
        # wald
        cw = (1_000_000 * k) // CI_N
        hw = (
            196 * math.floor(
                math.sqrt(k * (CI_N - k) / CI_N) * 1e6 + 0.5
            )
        ) // (100 * CI_N)
        if cw - hw <= p_micro <= cw + hw:
            cover["wald"] += 1
        zero_w += k == 0
        # wilson
        cwl = math.floor(
            (k + 38416.0 / 20000.0) / (CI_N + 38416.0 / 10000.0) * 1e6 + 0.5
        )
        hwl = math.floor(
            1.96 * math.sqrt(
                k * (CI_N - k) / CI_N + 38416.0 / 40000.0
            ) / (CI_N + 38416.0 / 10000.0) * 1e6 + 0.5
        )
        if cwl - hwl <= p_micro <= cwl + hwl:
            cover["wilson"] += 1

    got = {
        r["method"]: (r["n_cover"], r["coverage_milli"], r["n_zero_width"])
        for r in events_ci_coverage_eval(spark, SF_DIR).collect()
    }
    assert got["wald"][0] == cover["wald"]
    assert got["wilson"][0] == cover["wilson"]
    assert got["wald"][2] == zero_w

    # Brown-Cai-DasGupta: Wilson holds its level at small n / extreme p
    # while Wald collapses (zero-width intervals on zero-success draws)
    assert got["wilson"][1] >= 900
    assert got["wald"][1] < got["wilson"][1] - 200
    assert got["wald"][2] > CI_REPS // 4


# --------------------------------------------- events_littles_law_eval


def test_littles_law_identity_on_natural_spans(spark):
    from harvester_spark.operators.web_econ import events_littles_law_eval

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "CAST(unix_timestamp(ts) AS LONG) AS se"
        )
        .collect()
    )
    t0 = {}
    for r in rows:
        if r["event_type"] == "signup":
            u = r["user_id"]
            t0[u] = min(t0.get(u, r["se"]), r["se"])
    tp = {}
    for r in rows:
        u = r["user_id"]
        if r["event_type"] == "purchase" and u in t0 and r["se"] > t0[u]:
            tp[u] = min(tp.get(u, r["se"]), r["se"])
    spans = [
        (t0[u] // 3600, tp[u] // 3600)
        for u in tp
        if tp[u] // 3600 > t0[u] // 3600
    ]
    n = len(spans)
    sum_dur = sum(h1 - h0 for h0, h1 in spans)
    mn = min(h0 for h0, _ in spans)
    mx = max(h1 for _, h1 in spans)
    T = mx - mn
    active = Counter()
    for h0, h1 in spans:
        for h in range(h0, h1):
            active[h] += 1
    sc = sum(active.get(h, 0) for h in range(mn, mx))

    row = events_littles_law_eval(spark, SF_DIR).collect()[0]
    assert (
        row["n_spans"], row["total_hours"], row["lam_micro"],
        row["w_milli"], row["l_sampled_milli"], row["l_from_law_milli"],
    ) == (
        n, T, (1_000_000 * n) // T, (1000 * sum_dur) // n,
        (1000 * sc) // T, (1000 * sum_dur) // T,
    )

    # Little's law, exactly: the independently sampled concurrency
    # equals lambda*W (integer-hour spans make the hourly sampling an
    # identity — sc == sum_dur), and the cross-multiplied law holds
    assert row["l_sampled_milli"] == row["l_from_law_milli"]
    assert sc == sum_dur
    # lambda*W == L in exact cross-multiplied integers:
    # (n/T)*(sum_dur/n) == sum_dur/T
    assert n * sum_dur * T == n * T * sum_dur  # identity, kept explicit
    assert row["l_sampled_milli"] > 0
