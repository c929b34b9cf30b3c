"""Brute-force BM25 oracle — exact scoring over an in-memory corpus.

Independent of the index structures (no postings/codec involvement): it
re-tokenizes every document with the canonical analyzer and scores the AND
candidate set directly, using the shared kernel in :mod:`bm25` so the float
semantics match the engine by construction (SURVEY.md §7 hard-part 1).

Query semantics mirror the reference's search body
(/root/reference/harvester/core/models/search/query.py:73-98):
``simple_query_string`` with ``default_operator: AND`` — a document matches
only if it contains EVERY query term; k1=1.2, b=0.75; ties broken
``(score desc, doc_id asc)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.search import bm25


def brute_force_topk(
    docs: pd.DataFrame,
    query_text: str,
    k: int = 10,
    lang: str = ALL_LANG,
    allowed_doc_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact top-k → DataFrame(rank, doc_id, score).

    ``docs`` needs columns (doc_id, text, lang). ``allowed_doc_ids`` is the
    pre-restriction hook for field/date filters (AND with the text match —
    /root/reference/harvester/search/views/document.py:70-94).
    """
    # Language scoping selects a different index (own N/df/avgdl stats);
    # field/date filters are NON-SCORING restrictions — they narrow the
    # candidate set but leave the BM25 statistics index-wide, matching
    # Lucene/OpenSearch filter-context semantics.
    sub = docs if lang == ALL_LANG else docs[docs["lang"] == lang]
    sub = sub.reset_index(drop=True)

    tokens = [tokenize(t) for t in sub["text"].fillna("")]
    dl = np.array([len(ts) for ts in tokens], dtype=np.float64)
    n_docs = len(sub)
    if n_docs == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    avgdl = float(dl.mean())

    q_terms = sorted(set(tokenize(query_text)))
    if not q_terms:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])

    tf = {t: np.array([ts.count(t) for ts in tokens], dtype=np.float64) for t in q_terms}
    dfs = {t: int((tf[t] > 0).sum()) for t in q_terms}
    if any(dfs[t] == 0 for t in q_terms):
        return pd.DataFrame(columns=["rank", "doc_id", "score"])

    match_all = np.ones(n_docs, dtype=bool)
    for t in q_terms:
        match_all &= tf[t] > 0
    if allowed_doc_ids is not None:
        match_all &= sub["doc_id"].isin(allowed_doc_ids).to_numpy()
    cand = np.flatnonzero(match_all)
    return _score_and_rank(sub, q_terms, tf, dfs, dl, n_docs, avgdl, cand, k)


def brute_force_topk_or(
    docs: pd.DataFrame,
    query_text: str,
    k: int = 10,
    lang: str = ALL_LANG,
) -> pd.DataFrame:
    """Disjunctive (OR) exact top-k — oracle for the block-max WAND path."""
    sub = docs if lang == ALL_LANG else docs[docs["lang"] == lang]
    sub = sub.reset_index(drop=True)
    tokens = [tokenize(t) for t in sub["text"].fillna("")]
    dl = np.array([len(ts) for ts in tokens], dtype=np.float64)
    n_docs = len(sub)
    if n_docs == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    avgdl = float(dl.mean())
    q_terms = sorted(set(tokenize(query_text)))
    tf = {t: np.array([ts.count(t) for ts in tokens], dtype=np.float64) for t in q_terms}
    dfs = {t: int((tf[t] > 0).sum()) for t in q_terms}
    q_terms = [t for t in q_terms if dfs[t] > 0]
    if not q_terms:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    match_any = np.zeros(n_docs, dtype=bool)
    for t in q_terms:
        match_any |= tf[t] > 0
    cand = np.flatnonzero(match_any)
    return _score_and_rank(sub, q_terms, tf, dfs, dl, n_docs, avgdl, cand, k)


def _score_and_rank(sub, q_terms, tf, dfs, dl, n_docs, avgdl, cand, k) -> pd.DataFrame:
    if cand.size == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])

    scores = np.zeros(cand.size, dtype=np.float64)
    for t in bm25.term_order(q_terms, dfs):
        scores += bm25.idf(n_docs, dfs[t]) * bm25.tf_norm(tf[t][cand], dl[cand], avgdl)

    doc_ids = sub["doc_id"].to_numpy()[cand]
    top = bm25.topk_order(scores, doc_ids, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": doc_ids[top].astype(np.int64),
            "score": scores[top],
        }
    )
