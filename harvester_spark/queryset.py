"""The reference query set fixture + graded rank evaluation.

Shaped after the harvester's curated ``Query``/``QueryRanking`` models
(/root/reference/harvester/core/models/search/query.py:63-110: saved queries
with per-user graded relevance judgments keyed ``index:doc_id → rating``) and
FIXTURES.md §4: ~50 deterministic queries mixing head terms, planted phrases,
rare ``term_{ix}`` markers, a zero-hit term, and an nl-only term.

``rank_eval`` computes NDCG@k per query against graded ratings — the
OpenSearch rank-eval analogue the reference drives from QueryRanking
(query.py:100-110).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from harvester_spark.corpus import NL_ONLY_TERM, PHRASES, ZERO_HIT_TERM


def reference_queries(n_rare: int = 10) -> pd.DataFrame:
    """Deterministic ~50-query fixture: (query_id, query_text, k, lang)."""
    rows: list[tuple[str, str, int, str]] = []

    def add(qid, text, k=10, lang="all"):
        rows.append((qid, text, k, lang))

    for i in range(8):  # head terms
        add(f"head_{i}", f"w{i:05d}")
    add("and_2", "w00000 w00001")
    add("and_3", "w00001 w00002 w00003")
    add("and_4", "w00000 w00001 w00002 w00003")
    add("and_mixed", "w00000 w00100 w01000")
    for i, p in enumerate(PHRASES):  # planted phrases
        add(f"phrase_{i}", p)
    for i in range(n_rare):  # unique rare markers
        add(f"rare_{i}", f"term_{7 * (i + 1)}")
    add("zero_hit", ZERO_HIT_TERM)
    add("zero_hit_and", f"w00000 {ZERO_HIT_TERM}")
    add("nl_only_all", NL_ONLY_TERM)
    add("nl_only_nl", NL_ONLY_TERM, lang="nl")
    add("nl_only_en", NL_ONLY_TERM, lang="en")
    for lang in ("en", "nl", "unk"):  # language-scoped head queries
        add(f"lang_{lang}", "w00000 w00001", lang=lang)
    for i in range(5):  # mid-frequency terms
        add(f"mid_{i}", f"w{100 + 37 * i:05d}")
    for i in range(5):  # tail terms
        add(f"tail_{i}", f"w{4999 - 11 * i:05d}")
    add("case_fold", "W00000 w00001")
    add("punct", "w00000, w00001!")
    add("k_large", "w00000", k=50)
    add("k_one", "w00000", k=1)
    return pd.DataFrame(rows, columns=["query_id", "query_text", "k", "lang"])


def build_expected_topk(docs_pdf: pd.DataFrame, queries: pd.DataFrame) -> pd.DataFrame:
    """Freeze the oracle golden table (FIXTURES.md §5) via brute force."""
    from harvester_spark.search.oracle import brute_force_topk

    frames = []
    for q in queries.itertuples(index=False):
        topk = brute_force_topk(docs_pdf, q.query_text, k=q.k, lang=q.lang)
        topk.insert(0, "query_id", q.query_id)
        frames.append(topk)
    return pd.concat(frames, ignore_index=True)


def synthetic_ratings(expected_topk: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """Graded relevance judgments derived deterministically from the golden
    top-k (rating 3 for top ranks decaying to 0, QueryRanking.ranking shape)."""
    rng = np.random.default_rng(seed)
    rows = []
    for qid, grp in expected_topk.groupby("query_id"):
        for r in grp.itertuples(index=False):
            base = max(0, 3 - (r.rank - 1) // 3)
            jitter = int(rng.integers(0, 2)) if base > 0 else 0
            rows.append((qid, int(r.doc_id), min(3, base + jitter)))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "rating"])


def ndcg_at_k(ranked_doc_ids: list[int], ratings: dict[int, int], k: int = 10) -> float:
    """Standard NDCG@k with graded gains 2^rating - 1."""
    gains = [2 ** ratings.get(int(d), 0) - 1 for d in ranked_doc_ids[:k]]
    dcg = sum(g / np.log2(i + 2) for i, g in enumerate(gains))
    ideal = sorted(ratings.values(), reverse=True)[:k]
    idcg = sum((2**r - 1) / np.log2(i + 2) for i, r in enumerate(ideal))
    return float(dcg / idcg) if idcg > 0 else 0.0


def rank_eval(
    searcher, queries: pd.DataFrame, ratings: pd.DataFrame, k: int = 10
) -> pd.DataFrame:
    """Run every query through the engine and score NDCG@k per query."""
    rows = []
    rating_map = {
        qid: dict(zip(g["doc_id"], g["rating"]))
        for qid, g in ratings.groupby("query_id")
    }
    for q in queries.itertuples(index=False):
        res = searcher.search(q.query_text, k=q.k, lang=q.lang)
        ranked = [int(d) for d in res.topk["doc_id"]]
        r = rating_map.get(q.query_id, {})
        rows.append((q.query_id, len(ranked), ndcg_at_k(ranked, r, k) if r else None))
    return pd.DataFrame(rows, columns=["query_id", "n_results", "ndcg"])
