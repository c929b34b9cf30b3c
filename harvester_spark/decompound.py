"""Dutch dictionary decompounder — the reference's nl analyzer extra.

The harvester's Dutch index enables a dictionary decompounder with a
53,175-word list (/root/reference/harvester/search/models/index.py:173-188;
opensearch/config/decompound_word_list.nl.txt, generated from a compound
dictionary keeping ≥3-char tokens — commands/opensearch/tasks.py:11-24),
behind the ``OPENSEARCH_ENABLE_DECOMPOUND_ANALYZERS`` flag (index.py:179-181).

Spark rebuild: a pure function splitting a token into dictionary sub-words
(greedy longest-match DP, Lucene ``DictionaryCompoundWordTokenFilter``
semantics: the ORIGINAL token is kept and sub-words are appended), applied
vectorized with the word list as a broadcast frozenset. Disabled by default
— the rank-identity contract runs the canonical analyzer; enabling it
re-analyzes both index and query sides the same way.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column

MIN_SUBWORD = 3


def decompound_token(token: str, words: frozenset[str], min_len: int = MIN_SUBWORD) -> list[str]:
    """token → [token] + dictionary sub-words found by full-cover split.

    Only emits sub-words when the WHOLE token can be covered by dictionary
    words (avoids false positives on ordinary long words); the original
    token always stays first.
    """
    n = len(token)
    if n < 2 * min_len:
        return [token]
    # DP: best split covering token[0:i]
    best: list[list[str] | None] = [None] * (n + 1)
    best[0] = []
    for i in range(min_len, n + 1):
        for j in range(max(0, i - 30), i - min_len + 1):
            if best[j] is not None and token[j:i] in words:
                cand = best[j] + [token[j:i]]
                if best[i] is None or len(cand) < len(best[i]):
                    best[i] = cand
    if best[n] and len(best[n]) >= 2:
        return [token] + best[n]
    return [token]


def expand_index_tokens(tokens: list[str], words: frozenset[str]) -> list[str]:
    """Index-side expansion: every token followed by its sub-words (the
    stream a flagged ``nl`` build feeds the block encoder)."""
    return [w for t in tokens for w in decompound_token(t, words)]


def decompound_search(searcher, query_text: str, words, k: int = 10, lang: str = "nl"):
    """Query-side decompound search against a flag-built nl index.

    Each query token becomes a SYNONYM GROUP ``[token] + sub-words``
    (stacked query tokens, like the search analyzer running the same
    decompound filter). Semantics (defined, oracle-tested):

    - a document matches iff EVERY group has ≥1 member present (AND over
      groups, OR within a group),
    - score = Σ over the UNIQUE member terms present in the doc of
      ``idf(term) · tf_norm`` — the shared BM25 kernel in the fixed
      (df asc, term asc) accumulation order, ties (score desc, doc_id asc).
    """
    import numpy as np
    import pandas as pd

    from harvester_spark.analysis import tokenize
    from harvester_spark.index.codec import decode_blocks_batch
    from harvester_spark.search import bm25

    words = frozenset(words)
    q_tokens = tokenize(query_text)
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    if not q_tokens:
        return empty
    groups = [sorted(set(decompound_token(t, words))) for t in sorted(set(q_tokens))]
    all_terms = sorted({m for g in groups for m in g})
    dfs = searcher._dfs(all_terms, lang)
    live_terms = [t for t in all_terms if dfs[t] > 0]
    if any(all(dfs[m] == 0 for m in g) for g in groups):
        return empty  # a group with no live member can never match

    blocks = searcher._term_postings(live_terms, lang)
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in live_terms:
        tb = blocks[blocks["term"] == t]
        ids, tfv = decode_blocks_batch(
            tb["base_doc_id"].to_numpy(),
            tb["n"].to_numpy(),
            [bytes(b) for b in tb["doc_deltas"]],
            [bytes(b) for b in tb["tfs"]],
        )
        order = np.argsort(ids, kind="stable")
        per_term[t] = (ids[order], tfv[order])

    candidates: np.ndarray | None = None
    for g in groups:
        union = np.unique(
            np.concatenate([per_term[m][0] for m in g if dfs[m] > 0])
        )
        candidates = union if candidates is None else candidates[
            np.isin(candidates, union, assume_unique=True)
        ]
        if candidates.size == 0:
            return empty

    n_docs, avgdl = searcher._corpus_stats[lang]
    dl = searcher._doc_lens()[candidates]
    scores = np.zeros(candidates.size, dtype=np.float64)
    for t in bm25.term_order(live_terms, dfs):
        ids, tfv = per_term[t]
        pos = np.searchsorted(ids, candidates)
        pos_c = np.minimum(pos, max(ids.size - 1, 0))
        hit = (ids[pos_c] == candidates) if ids.size else np.zeros(candidates.size, bool)
        tf_here = np.where(hit, tfv[pos_c] if ids.size else 0, 0)
        scores += np.where(
            hit,
            bm25.idf(n_docs, dfs[t]) * bm25.tf_norm(tf_here, dl, avgdl),
            0.0,
        )
    top = bm25.topk_order(scores, candidates, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1),
            "doc_id": candidates[top].astype(np.int64),
            "score": scores[top],
        }
    )


def decompound_tokens_column(tokens_col: Column, words_bc) -> Column:
    """Array<string> column → decompounded array (vectorized pandas UDF)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _decomp(tokens: pd.Series) -> pd.Series:
        words = words_bc.value
        return tokens.map(
            lambda ts: [
                w
                for t in (ts if ts is not None else [])
                for w in decompound_token(t, words)
            ]
        )

    return _decomp(tokens_col)
