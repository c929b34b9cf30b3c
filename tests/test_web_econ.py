"""Semantics guards for the web-economics operators.

What each test pins:
- mirror_host_detect is NON-degenerate on the real corpus: the top pair
  shares ≥ 2 retained fingerprints with jaccard > 0 (the corpus carries
  genuinely token-set-identical pages across hosts — detection must fire
  on content, not on planted labels), pairs are canonical (host_a <
  host_b), and Jaccard is bounded.
- static_cache_plan is a MAXIMAL greedy prefix: cached_postings ≤ budget
  AND adding the next term in QtfDf order would exceed it (recomputed in
  pure Python, boundary term included) — an under-filled cache would
  pass a weaker bound check. The cache must also beat proportionality:
  hit_mass_milli > 10·CACHE_PCT (Zipf demand concentration is the whole
  point of the policy).
- heaps_law_fit: β is recomputed in exact integer arithmetic in Python
  and must match; 0 < β < 1 (sublinear vocabulary growth) — β ≥ 1 means
  the fit degenerated to linear and the forecast is useless.
"""

from __future__ import annotations

from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def test_mirror_detect_fires_on_real_content(spark):
    from harvester_spark.operators.web_econ import mirror_host_detect

    rows = mirror_host_detect(spark, SF_DIR).collect()
    assert rows, "no host pairs at all"
    top = rows[0]
    assert top["shared"] >= 2
    assert 0 < top["jaccard_milli"] <= 1000
    for r in rows:
        assert r["host_a"] < r["host_b"]
        assert r["shared"] <= min(r["n_a"], r["n_b"])


def _term_stats(spark):
    import re

    from harvester_spark.operators.common import load

    cf, df = Counter(), Counter()
    for r in load(spark, SF_DIR, "documents").collect():
        toks = [t for t in re.split(r"\W+", r["text"].lower(), flags=re.ASCII) if t]
        cf.update(toks)
        df.update(set(toks))
    return cf, df


def test_cache_plan_is_maximal_greedy_prefix(spark):
    from harvester_spark.operators.web_econ import CACHE_PCT, static_cache_plan

    cf, df = _term_stats(spark)
    row = static_cache_plan(spark, SF_DIR).collect()[0]
    order = sorted(df, key=lambda t: (-((cf[t] * 1000000) // df[t]), t))
    budget = (sum(df.values()) * CACHE_PCT) // 100
    assert row["budget_postings"] == budget
    cum, n_cached, demand, boundary = 0, 0, 0, None
    for t in order:
        if cum + df[t] > budget:
            break
        cum += df[t]
        n_cached += 1
        demand += cf[t]
        boundary = t
    assert row["n_cached"] == n_cached
    assert row["cached_postings"] == cum <= budget
    assert row["demand_cached"] == demand
    assert row["boundary_term"] == boundary
    # Zipf concentration: the cache must capture MORE demand share than
    # its postings share, or the policy is pointless.
    assert row["hit_mass_milli"] > 10 * CACHE_PCT


def test_heaps_beta_exact_and_sublinear(spark):
    import hashlib
    import math
    import re

    from harvester_spark.operators.web_econ import HEAPS_M, heaps_law_fit
    from harvester_spark.operators.index_stats import VOCAB_CUTS
    from harvester_spark.operators.common import load

    docs = sorted(
        (r["doc_id"], r["text"]) for r in load(spark, SF_DIR, "documents").collect()
    )
    xs, ys, vocabs = [], [], []
    for cut in VOCAB_CUTS:
        ntok, vocab = 0, set()
        for did, text in docs:
            if did < cut:
                toks = [
                    t for t in re.split(r"\W+", text.lower(), flags=re.ASCII) if t
                ]
                for pos in range(len(toks)):
                    h = int(
                        hashlib.md5(f"{did}:{pos}".encode()).hexdigest()[:14], 16
                    )
                    vocab.add(HEAPS_M // (1 + (h % HEAPS_M)))
                ntok += len(toks)
        vocabs.append(len(vocab))
        xs.append(int(math.floor(math.log(ntok) * 1e3 + 0.5)))
        ys.append(int(math.floor(math.log(len(vocab)) * 1e3 + 0.5)))
    # synthesis non-degeneracy: the vocabulary genuinely grows between cuts
    assert all(a < b for a, b in zip(vocabs, vocabs[1:])), vocabs
    n = len(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    beta = (num * 1000000 + den // 2) // den if num >= 0 else -(
        (-num * 1000000 + den // 2) // den
    )
    row = heaps_law_fit(spark, SF_DIR).collect()[0]
    assert row["n_cuts"] == n
    assert row["beta_micro"] == beta
    # the Zipf-tail draw gives V(n) ~ n^0.5 — a flat (saturated) or
    # linear (all-singleton) synthesis would both fail this band
    assert 300_000 < row["beta_micro"] < 900_000
