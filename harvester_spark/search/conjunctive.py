"""Vectorized conjunctive block-max top-k — the ``require_all`` fast path.

Round-1 gap (BENCH.md): the θ-driven conjunctive mode existed only as the
WAND cursor walk, whose per-doc Python loop loses to vectorized full decode
on dense intersections. This module keeps everything batch-vectorized:

1. the RAREST term is decoded fully (it is the smallest list by
   definition) and its per-posting impacts computed in one numpy pass;
2. its postings are processed in docID-ordered batches; for each batch a
   score upper bound is computed from BLOCK METADATA ONLY (rare-term exact
   per-posting impacts + other terms' block-max impacts over the batch's
   docID span) — when the bound cannot beat the current k-th score θ the
   whole batch is skipped without decoding anything;
3. surviving batches decode only the other terms' blocks overlapping the
   batch span (cached across batches), membership + tf via binary search,
   scores for the whole batch in one vectorized BM25 evaluation.

Exactness: a skipped batch's docs all score ≤ bound ≤ θ, and batches are
processed in ascending docID order, so an exactly-θ doc would lose its
(score desc, doc_id asc) tie to every current heap entry anyway — the
returned top-k is IDENTICAL to the exhaustive AND ranking (tested).
``results_total`` is the scored count — a lower bound, is_precise=False
(the OpenSearch 10k-bound analogue). The exact-total path stays
``IndexSearcher.search``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.index.codec import decode_blocks_batch
from harvester_spark.search import bm25
from harvester_spark.search.engine import SearchResult

BATCH = 4096  # rare-term postings per batch


def and_search_fast(
    searcher,
    query_text: str,
    k: int = 10,
    lang: str = ALL_LANG,
    batch: int = BATCH,
) -> SearchResult:
    terms = sorted(set(tokenize(query_text)))
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    if not terms:
        return SearchResult(query_text, lang, empty, 0, is_precise=False)
    dfs = searcher._dfs(terms, lang)
    if any(dfs[t] == 0 for t in terms):
        return SearchResult(query_text, lang, empty, 0, is_precise=False)

    impact_col = "impact_all" if lang == ALL_LANG else "impact_lang"
    n_docs, avgdl = searcher._corpus_stats[lang]
    doc_lens = searcher._doc_lens()
    idfs = {t: float(bm25.idf(n_docs, dfs[t])) for t in terms}
    order_terms = bm25.term_order(terms, dfs)
    rare, others = order_terms[0], order_terms[1:]

    blocks = searcher._term_postings(terms, lang)

    # 1. rare term: full batch decode + exact per-posting impacts
    rb = blocks[blocks["term"] == rare]
    r_ids, r_tfs = decode_blocks_batch(
        rb["base_doc_id"].to_numpy(),
        rb["n"].to_numpy(),
        [bytes(b) for b in rb["doc_deltas"]],
        [bytes(b) for b in rb["tfs"]],
    )
    o = np.argsort(r_ids, kind="stable")
    r_ids, r_tfs = r_ids[o], r_tfs[o]
    if r_ids.size == 0:
        return SearchResult(query_text, lang, empty, 0, is_precise=False)
    r_imp = bm25.tf_norm(r_tfs, doc_lens[r_ids], avgdl)

    # other terms: block metadata sorted by base + one-shot batch decode
    # (decode_blocks_batch per overlap set: a Python per-block decode loop
    # here costs more than the skipping saves on block-dense head terms)
    class _TermBlocks:
        __slots__ = ("bases", "maxes", "imps", "ns", "deltas", "tfbufs")

        def __init__(self, tb: pd.DataFrame):
            tb = tb.sort_values("base_doc_id").reset_index(drop=True)
            self.bases = tb["base_doc_id"].to_numpy(np.int64)
            self.maxes = tb["max_doc_id"].to_numpy(np.int64)
            self.imps = tb[impact_col].to_numpy(np.float64)
            self.ns = tb["n"].to_numpy(np.int64)
            self.deltas = [bytes(b) for b in tb["doc_deltas"]]
            self.tfbufs = [bytes(b) for b in tb["tfs"]]

        def overlapping(self, lo: int, hi: int) -> np.ndarray:
            """Indices of blocks whose [base, max] intersects [lo, hi]."""
            return np.flatnonzero((self.bases <= hi) & (self.maxes >= lo))

        def decoded(self, ixs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            if ixs.size == 0:
                z = np.empty(0, np.int64)
                return z, z
            ids, tfs = decode_blocks_batch(
                self.bases[ixs],
                self.ns[ixs],
                [self.deltas[i] for i in map(int, ixs)],
                [self.tfbufs[i] for i in map(int, ixs)],
            )
            o = np.argsort(ids, kind="stable")
            return ids[o], tfs[o]

    other_blocks = {t: _TermBlocks(blocks[blocks["term"] == t]) for t in others}

    top_scores = np.empty(0, np.float64)
    top_docs = np.empty(0, np.int64)
    theta = -np.inf
    scored = 0

    for s in range(0, r_ids.size, batch):
        e = min(s + batch, r_ids.size)
        lo, hi = int(r_ids[s]), int(r_ids[e - 1])
        # 2. metadata-only batch bound
        if top_docs.size == k:
            ub = idfs[rare] * float(r_imp[s:e].max())
            for t in others:
                tb = other_blocks[t]
                ov = tb.overlapping(lo, hi)
                if ov.size == 0:
                    ub = -np.inf  # no doc in span has t → nothing can match
                    break
                ub += idfs[t] * float(tb.imps[ov].max())
            if ub <= theta:
                continue  # ties lose on ascending doc_id — skip is exact
        # 3. decode + vectorized conjunction for this batch
        cand = r_ids[s:e]
        tf_by_term = {rare: r_tfs[s:e]}
        alive = np.ones(cand.size, dtype=bool)
        for t in others:
            tb = other_blocks[t]
            ids, tfs = tb.decoded(tb.overlapping(lo, hi))
            if ids.size == 0:
                alive[:] = False
                break
            pos = np.searchsorted(ids, cand)
            pos_c = np.minimum(pos, ids.size - 1)
            hit = ids[pos_c] == cand
            alive &= hit
            tf_by_term[t] = np.where(hit, tfs[pos_c], 0)
            if not alive.any():
                break
        if not alive.any():
            continue
        docs = cand[alive]
        dl = doc_lens[docs]
        scores = np.zeros(docs.size, np.float64)
        for t in order_terms:  # fixed accumulation order → exact equality
            scores += idfs[t] * bm25.tf_norm(tf_by_term[t][alive], dl, avgdl)
        scored += int(docs.size)
        # top-k merge (batch docs all > existing docs → ties resolved right)
        all_scores = np.concatenate([top_scores, scores])
        all_docs = np.concatenate([top_docs, docs])
        sel = bm25.topk_order(all_scores, all_docs, k)
        top_scores, top_docs = all_scores[sel], all_docs[sel]
        if top_docs.size == k:
            theta = float(top_scores[-1])

    sel = bm25.topk_order(top_scores, top_docs, k)
    topk = pd.DataFrame(
        {
            "rank": np.arange(1, sel.size + 1),
            "doc_id": top_docs[sel],
            "score": top_scores[sel],
        }
    )
    return SearchResult(query_text, lang, topk, scored, is_precise=False)
