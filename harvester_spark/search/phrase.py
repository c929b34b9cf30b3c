"""Phrase queries: exact adjacent-term matching.

``simple_query_string`` accepts quoted phrases; the reference's AND body
makes a quoted group match documents containing the terms CONSECUTIVELY.
Our postings store (docID, tf) without positions, so phrase matching runs as
candidate-AND + verification — the classic "slow phrase" plan:

1. conjunctive index lookup restricts candidates to docs containing every
   phrase term (usually few),
2. candidate texts are fetched with a docID-pushdown scan and re-tokenized,
3. adjacency is verified positionally (numpy; the canonical analyzer is
   position-stable), scoring stays the plain BM25 AND score of the terms.

At 10^12 scale step 2 is a semi-join against the documents table with docID
partition pruning; positional postings (delta-encoded positions per posting)
are the round-2 alternative when phrase traffic dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.search.engine import IndexSearcher, SearchResult


def _contains_phrase(tokens: list[str], phrase: list[str]) -> bool:
    n, m = len(tokens), len(phrase)
    if m == 0 or n < m:
        return False
    first = phrase[0]
    arr = np.array(tokens)
    starts = np.flatnonzero(arr[: n - m + 1] == first)
    for s in starts:
        if list(arr[s : s + m]) == phrase:
            return True
    return False


def phrase_search(
    searcher: IndexSearcher,
    documents: DataFrame,
    phrase_text: str,
    k: int = 10,
    lang: str = ALL_LANG,
) -> SearchResult:
    """Quoted-phrase top-k: exact adjacency required; BM25 scores of the
    constituent terms (same kernel → comparable with term queries)."""
    phrase = tokenize(phrase_text)
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    if not phrase:
        return SearchResult(phrase_text, lang, empty, 0)

    # step 1: conjunctive candidates with scores (big k: we re-filter below)
    base = searcher.search(" ".join(phrase), k=10**9, lang=lang)
    if len(base.topk) == 0:
        return SearchResult(phrase_text, lang, empty, 0)

    # step 2+3: fetch candidate texts (docID pushdown) and verify adjacency
    cand_ids = [int(x) for x in base.topk["doc_id"]]
    texts = (
        documents.filter(F.col("doc_id").isin(cand_ids))
        .select("doc_id", "text")
        .toPandas()
    )
    ok = {
        int(r.doc_id)
        for r in texts.itertuples(index=False)
        if _contains_phrase(tokenize(r.text), phrase)
    }
    kept = base.topk[base.topk["doc_id"].isin(ok)].head(k).reset_index(drop=True)
    kept["rank"] = np.arange(1, len(kept) + 1)
    return SearchResult(phrase_text, lang, kept, len(ok))


def brute_force_phrase(
    docs_pdf: pd.DataFrame, phrase_text: str, k: int = 10, lang: str = ALL_LANG
) -> pd.DataFrame:
    """Oracle: filter docs containing the exact phrase, score with the AND
    oracle restricted to them."""
    from harvester_spark.search.oracle import brute_force_topk

    phrase = tokenize(phrase_text)
    ok = docs_pdf[
        docs_pdf["text"].map(lambda t: _contains_phrase(tokenize(t or ""), phrase))
    ]["doc_id"].to_numpy()
    return brute_force_topk(
        docs_pdf, " ".join(phrase), k=k, lang=lang, allowed_doc_ids=ok
    )
