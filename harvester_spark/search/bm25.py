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


def sorted_member_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Membership mask of sorted-unique ``a`` in sorted-unique ``b``.

    Equivalent to ``np.isin(a, b, assume_unique=True)`` but exploits both
    sides being sorted (posting lists are) — one binary-search pass, no
    internal concatenate+argsort."""
    if b.size == 0 or a.size == 0:
        return np.zeros(a.size, dtype=bool)
    i = np.searchsorted(b, a)
    i[i == b.size] = b.size - 1
    return b[i] == a


def topk_order(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc) — deterministic.

    Exact selection without sorting the full candidate set: partition for
    the k-th largest score, fully order everything strictly above it, and
    fill the remainder from the boundary-score ties by ascending doc_id.
    Identical output to ``lexsort((doc_ids, -scores))[:k]`` (fuzz-tested);
    O(n + m log m) with m ≈ k instead of O(n log n) — the difference between
    lex-sorting 2M candidates and selecting 10.
    """
    n = scores.size
    if k <= 0:
        return np.empty(0, dtype=np.int64)
    if k >= n:
        return np.lexsort((doc_ids, -scores))
    s_k = np.partition(scores, n - k)[n - k]  # k-th largest score
    above_ix = np.flatnonzero(scores > s_k)
    eq_ix = np.flatnonzero(scores == s_k)
    above_order = above_ix[np.lexsort((doc_ids[above_ix], -scores[above_ix]))]
    need = k - above_order.size
    eq_order = eq_ix[np.argsort(doc_ids[eq_ix], kind="stable")][:need]
    return np.concatenate([above_order, eq_order])
