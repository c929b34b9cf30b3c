"""The BM25 scoring kernel — ONE implementation shared by oracle and engine.

Parameters are the Lucene/OpenSearch defaults the reference runs with
(k1=1.2, b=0.75 — no custom ``similarity`` is configured anywhere;
/root/reference/harvester/search/models/index.py:173-188 only sets analyzers):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))          (Lucene BM25)
    tf_norm     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(D, q) = Σ_t idf(t) * tf_norm(t, D)

Rank-identity discipline (SURVEY.md §7 hard-part 1): float64 throughout,
terms accumulated in a FIXED order — (df ascending, term ascending) — and
ties broken ``(score desc, doc_id asc)``. The oracle (:mod:`oracle`) and the
index engine (:mod:`engine`) both call these functions, so scores agree
bit-for-bit by construction; tests additionally pin golden values.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(n_docs: float, df: np.ndarray | float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm(tf, dl, avgdl: float):
    """The idf-independent part of the score (the block-max 'impact')."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / float(avgdl)))


def term_order(terms: list[str], dfs: dict[str, int]) -> list[str]:
    """Fixed accumulation order: df ascending, term ascending."""
    return sorted(terms, key=lambda t: (dfs[t], t))


def topk_order(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc) — deterministic."""
    order = np.lexsort((doc_ids, -scores))
    return order[:k]
