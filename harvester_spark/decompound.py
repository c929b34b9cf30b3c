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
