"""Phrase queries: exact adjacent-term matching over POSITIONAL postings.

``simple_query_string`` accepts quoted phrases; the reference's AND body
makes a quoted group match documents containing the terms CONSECUTIVELY —
OpenSearch serves this from Lucene's positional postings
(/root/reference/harvester/core/models/search/query.py:81-86). Our postings
blocks carry a delta-encoded per-posting position list (``positions``
column, :mod:`harvester_spark.index.codec`), so phrase matching is pure
index work:

1. decode (docID, tf, positions) for each phrase term — the positions
   column is read only here (parquet column pruning),
2. AND-intersect candidates, verify adjacency by position-set intersection
   (``ok = (ok + 1) ∩ positions[next term]``),
3. score survivors with the shared BM25 kernel in the fixed accumulation
   order — identical to the AND score of the constituent terms.

No document text is ever fetched. ``phrase_search`` (candidate-AND +
driver-side re-tokenization of candidate texts) remains as the fallback for
indexes built without positions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.index.codec import decode_blocks_batch, decode_positions

# (doc_id << SHIFT) | position packing for the vectorized adjacency join:
# positions fit 22 bits (the reference caps extracted text at 10k words —
# files/models/datatypes/file.py:182-185), doc ids fit the remaining 41.
_POS_SHIFT = 22
_POS_MASK = (1 << _POS_SHIFT) - 1
from harvester_spark.search import bm25
from harvester_spark.search.engine import IndexSearcher, SearchResult


def _decode_term_positions(blocks: pd.DataFrame):
    """Blocks of ONE term → (ids asc, tfs, flat positions, posting starts).

    Blocks from different languages/chunks interleave docID ranges; postings
    are stable-sorted by docID and the per-posting position slices gathered
    into the same order with one vectorized index build (no Python loop over
    postings)."""
    if not len(blocks):
        z = np.empty(0, np.int64)
        return z, z, z, z
    tb = blocks.sort_values("base_doc_id")
    ids, tfs = decode_blocks_batch(
        tb["base_doc_id"].to_numpy(),
        tb["n"].to_numpy(),
        [bytes(b) for b in tb["doc_deltas"]],
        [bytes(b) for b in tb["tfs"]],
    )
    # position blobs concatenate in the same block order; decode_positions
    # undoes the per-posting delta baseline in ONE varbyte pass
    flat, _starts = decode_positions(
        b"".join(bytes(b) for b in tb["positions"]), tfs
    )
    if ids.size < 2 or bool(np.all(ids[:-1] < ids[1:])):
        # clean-build fast path: one monotone chain — no re-sort gather
        return ids, tfs, flat, np.concatenate(([0], np.cumsum(tfs)[:-1]))
    order = np.argsort(ids, kind="stable")
    src_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    new_lens = tfs[order]
    new_starts = np.concatenate(([0], np.cumsum(new_lens)[:-1]))
    gidx = (
        np.repeat(src_starts[order], new_lens)
        + np.arange(flat.size)
        - np.repeat(new_starts, new_lens)
    )
    return ids[order], new_lens, flat[gidx], new_starts


def select_postings(
    ids: np.ndarray, lens: np.ndarray, flat: np.ndarray, starts: np.ndarray,
    sel: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Gather postings (and their position slices) at indices ``sel`` into
    contiguous arrays — the one slice-gather kernel shared by the driver
    phrase paths and the per-range distributed kernel."""
    lens_s = lens[sel]
    total = int(lens_s.sum())
    out_starts = np.concatenate(([0], np.cumsum(lens_s)[:-1]))
    if total == 0:
        return ids[sel], lens_s, np.empty(0, np.int64), out_starts
    gidx = (
        np.repeat(starts[sel], lens_s)
        + np.arange(total)
        - np.repeat(out_starts, lens_s)
    )
    return ids[sel], lens_s, flat[gidx], out_starts


def pack_offset_keys(
    ids: np.ndarray, lens: np.ndarray, flat: np.ndarray, offset: int
) -> np.ndarray:
    """Sorted packed ``(doc << SHIFT) | (pos - offset)`` keys for postings
    whose ``flat`` positions are contiguous in ``ids``/``lens`` order (ids
    ascending, positions ascending per doc ⇒ keys ascending)."""
    docs_rep = np.repeat(ids, lens)
    base = flat - offset
    k = (docs_rep << _POS_SHIFT) | base
    if offset > 0:
        k = k[base >= 0]
    return k


def chain_slop_keys(
    keys: dict[str, np.ndarray], phrase: list, slop: int
) -> np.ndarray:
    """Lucene sloppy-phrase matching over per-word sorted packed keys →
    sorted docIDs. FULL Lucene semantics (round-3: the ordered-only subset
    is gone): a doc matches iff one position per phrase slot exists —
    DISTINCT positions for repeated words — with
    ``max_i(p_i - i) - min_i(p_i - i) ≤ slop``. Out-of-order terms cost
    their displacement, so ``"a b"~2`` matches ``b a`` (transposition = 2),
    and every ordered window ≤ len-1+slop still matches (for an ordered
    chain the shifted values are non-decreasing, so the shifted span equals
    window-(len-1)).

    Vectorized exact check, no per-candidate Python loop:

    - candidate window starts = EVERY shifted position ``p - i + m`` of
      every slot, packed (the true minimal start is one of them);
    - per distinct word, its slot occurrences chain greedily to distinct
      ascending positions inside the staggered intervals
      ``[v+i_j, v+i_j+slop]`` — greedy is exact because interval lefts and
      rights both increase with j (exchange argument), and one
      ``searchsorted`` per slot advances every start at once;
    - different words can never share a position (one token per position),
      so cross-word distinctness is free. A start survives iff every word's
      chain completes.

    Positions must stay ≪ 2^{_POS_SHIFT} - len - slop so the packed
    position field never carries into docID bits (doc lens are bounded by
    the extract cap — same assumption the exact path's offset packing
    already makes)."""
    empty = np.empty(0, np.int64)
    m = len(phrase)
    offs: dict[str, list[int]] = {}
    for i, w in enumerate(phrase):
        offs.setdefault(w, []).append(i)
    for w in offs:
        if keys[w].size == 0:
            return empty
    starts = np.unique(
        np.concatenate([keys[w] + (m - i) for w, oo in offs.items() for i in oo])
    )
    alive = np.ones(starts.size, dtype=bool)
    for w, oo in offs.items():
        kw = keys[w] + m  # packed (doc << SHIFT) | (p + m), still sorted
        prev: np.ndarray | None = None
        for i in oo:
            lo = starts + i if prev is None else np.maximum(starts + i, prev + 1)
            idx = np.searchsorted(kw, lo, side="left")
            ok = idx < kw.size
            cur = kw[np.minimum(idx, kw.size - 1)]
            # window bound AND explicit same-doc mask: slop comes straight
            # from user query syntax ("a b"~4194304 parses fine), so the
            # bound alone could carry into docID bits and admit a
            # cross-document "match" — the doc compare keeps huge slops
            # exact instead of clamping them
            ok &= cur <= starts + i + slop
            ok &= (cur >> _POS_SHIFT) == (starts >> _POS_SHIFT)
            alive &= ok
            prev = cur
        if not alive.any():
            return empty
    return np.unique(starts[alive] >> _POS_SHIFT).astype(np.int64)


# Cost-model dispatch for phrase matching (mirrors or_search's strategy
# dispatch): when EVERY constraint term is head-scale, the driver path
# serializes a huge varbyte position decode in one Python process — fan the
# decode+verify out by docID range instead (distributed.phrase_match_ids_
# batch, identical ids). With any rare constraint term the driver path is
# already fast: the rarest term decodes first and prunes the rest by span.
PHRASE_BATCH_MIN_DF = 200_000


def _dispatch_batch(searcher, dfs: dict) -> bool:
    if getattr(searcher, "spark", None) is None or not dfs:
        return False
    return min(dfs.values()) >= PHRASE_BATCH_MIN_DF


def adjacency_constraints(phrase: list, common_grams: set | None) -> list:
    """The (term, offset) constraint list for an exact phrase — with a
    common-grams build, adjacent listed-term pairs collapse to one bigram
    constraint."""
    constraints: list[tuple[str, int]] = [(t, o) for o, t in enumerate(phrase)]
    if common_grams:
        covered = [False] * len(phrase)
        bigrams: list[tuple[str, int]] = []
        for o in range(len(phrase) - 1):
            a, b = phrase[o], phrase[o + 1]
            if a in common_grams and b in common_grams:
                bigrams.append((f"{a} {b}", o))
                covered[o] = covered[o + 1] = True
        constraints = bigrams + [
            (t, o) for o, t in enumerate(phrase) if not covered[o]
        ]
    return constraints


def phrase_match_ids(
    searcher: IndexSearcher, phrase_text: str, lang: str = ALL_LANG, slop: int = 0
) -> np.ndarray:
    """ALL docIDs containing the phrase — via positional postings.

    ``slop`` > 0 (``"a b"~N`` simple_query_string syntax) relaxes adjacency
    to FULL Lucene slop: one position per slot (distinct for repeated
    words) with shifted-position span ``max(p_i - i) - min(p_i - i) ≤
    slop`` — slop ≥ 2 admits transposed order (:func:`chain_slop_keys`);
    slop=0 is exact adjacency.

    Vectorized adjacency: the phrase occurs at base position b in doc d iff
    every constraint (term_key, offset o) has (d, b+o) in its positions.
    Constraints are the phrase's offsets — with common-grams builds,
    adjacent listed-term pairs collapse to ONE bigram-token constraint, so
    a head∧head phrase becomes a (typically rare) bigram lookup instead of
    a full-corpus positions decode. Constraints process in df-ascending
    order; later constraints decode only blocks whose docID span overlaps
    the surviving candidates and intersect sorted
    ``(doc << SHIFT) | (pos - o)`` keys — no per-candidate Python loop.
    """
    from harvester_spark.search.engine import _span_hits

    phrase = tokenize(phrase_text)
    if not phrase:
        return np.empty(0, np.int64)
    if slop > 0 and len(phrase) > 1:
        return _sloppy_match_ids(searcher, phrase, lang, slop)

    constraints = adjacency_constraints(phrase, searcher.common_grams())

    terms = sorted({t for t, _o in constraints})
    dfs = searcher._dfs(terms, lang)
    if any(dfs[t] == 0 for t in terms):
        return np.empty(0, np.int64)
    if _dispatch_batch(searcher, dfs):
        from harvester_spark.search.distributed import phrase_match_ids_batch

        return phrase_match_ids_batch(
            searcher.spark, searcher, phrase_text, lang=lang, slop=0
        )
    blocks = searcher._term_postings(terms, lang, with_positions=True)

    keys: np.ndarray | None = None
    cand_docs: np.ndarray | None = None
    for t, o in sorted(constraints, key=lambda c: (dfs[c[0]], c[0], c[1])):
        tb = blocks[blocks["term"] == t]
        if cand_docs is not None and len(tb):
            bases = tb["base_doc_id"].to_numpy()
            uppers = tb["max_doc_id"].to_numpy()
            keep = np.fromiter(
                (_span_hits(cand_docs, int(lo), int(hi)) for lo, hi in zip(bases, uppers)),
                dtype=bool,
                count=len(bases),
            )
            tb = tb[keep]
        ids, lens, flat, starts = _decode_term_positions(tb)
        if cand_docs is not None:
            sel = np.flatnonzero(bm25.sorted_member_mask(ids, cand_docs))
            ids, lens, flat, starts = select_postings(ids, lens, flat, starts, sel)
        if flat.size == 0:
            return np.empty(0, np.int64)
        k = pack_offset_keys(ids, lens, flat, o)
        keys = k if keys is None else keys[bm25.sorted_member_mask(keys, k)]
        if keys.size == 0:
            return np.empty(0, np.int64)
        cand_docs = np.unique(keys >> _POS_SHIFT)
    return cand_docs.astype(np.int64)


def _sloppy_match_ids(
    searcher: IndexSearcher, phrase: list, lang: str, slop: int
) -> np.ndarray:
    """Sloppy matching (full Lucene semantics), fully vectorized.

    1. decode positional postings per distinct word, pruning each later
       word's blocks to the surviving candidate docID span (df-ascending,
       the exact path's pruning order);
    2. AND-intersect candidate docs on sorted id arrays;
    3. :func:`chain_slop_keys` over packed ``(doc << SHIFT) | pos`` keys —
       shifted-span ≤ slop with per-word distinct greedy chains, one
       ``searchsorted`` per slot advancing every candidate window at once.
       No per-candidate Python loop; common-gram bigrams don't apply (they
       encode adjacency, not proximity)."""
    from harvester_spark.search.engine import _span_hits

    empty = np.empty(0, np.int64)
    terms = sorted(set(phrase))
    dfs = searcher._dfs(terms, lang)
    if any(dfs[t] == 0 for t in terms):
        return empty
    if _dispatch_batch(searcher, dfs):
        from harvester_spark.search.distributed import phrase_match_ids_batch

        return phrase_match_ids_batch(
            searcher.spark, searcher, " ".join(phrase), lang=lang, slop=slop
        )
    blocks = searcher._term_postings(terms, lang, with_positions=True)

    decoded: dict[str, tuple] = {}
    cand: np.ndarray | None = None
    for t in sorted(terms, key=lambda t: (dfs[t], t)):
        tb = blocks[blocks["term"] == t]
        if cand is not None and len(tb):
            bases = tb["base_doc_id"].to_numpy()
            uppers = tb["max_doc_id"].to_numpy()
            keep = np.fromiter(
                (_span_hits(cand, int(lo), int(hi)) for lo, hi in zip(bases, uppers)),
                dtype=bool,
                count=len(bases),
            )
            tb = tb[keep]
        ids, lens, flat, starts = _decode_term_positions(tb)
        decoded[t] = (ids, lens, flat, starts)
        cand = ids if cand is None else cand[bm25.sorted_member_mask(cand, ids)]
        if cand.size == 0:
            return empty

    keys: dict[str, np.ndarray] = {}
    for t in terms:
        ids, lens, flat, starts = decoded[t]
        sel = np.flatnonzero(bm25.sorted_member_mask(ids, cand))
        ids_s, lens_s, flat_s, _ = select_postings(ids, lens, flat, starts, sel)
        if flat_s.size == 0:
            return empty
        keys[t] = pack_offset_keys(ids_s, lens_s, flat_s, 0)

    return chain_slop_keys(keys, phrase, slop)


def positional_phrase_search(
    searcher: IndexSearcher,
    phrase_text: str,
    k: int = 10,
    lang: str = ALL_LANG,
    page: int = 1,
) -> SearchResult:
    """Quoted-phrase top-k from positional postings — exact adjacency, BM25
    scores of the constituent terms (same kernel → comparable with term
    queries), exact totals, no document fetch."""
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    matched = phrase_match_ids(searcher, phrase_text, lang)
    if matched.size == 0:
        return SearchResult(phrase_text, lang, empty, 0)
    base = searcher.search(
        " ".join(tokenize(phrase_text)), k=k, lang=lang,
        allowed_doc_ids=matched, page=page,
    )
    return SearchResult(phrase_text, lang, base.topk, base.results_total)


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


def phrase_tf_for_docs(
    searcher: IndexSearcher,
    phrase_text: str,
    doc_ids: np.ndarray,
    lang: str = ALL_LANG,
) -> dict[int, int]:
    """Exact-adjacency occurrence COUNTS of the phrase inside the given doc
    set only — the ES ``rescore`` primitive (SearchAPI.search
    rescore_phrase=...).

    Same constraint chain as :func:`phrase_match_ids` (common-grams
    collapse included), but candidates start PINNED to the caller's bounded
    window, so only posting blocks whose docID span overlaps those docs are
    decoded — O(window) work, never a corpus-wide positions pass. The
    surviving packed base keys are reduced to per-doc counts with one
    ``np.unique``. Returns {doc_id: n_occurrences}, omitting zero-count
    docs."""
    from harvester_spark.search.engine import _span_hits

    phrase = tokenize(phrase_text)
    cand_docs = np.unique(np.asarray(doc_ids, dtype=np.int64))
    if not phrase or cand_docs.size == 0:
        return {}
    constraints = adjacency_constraints(phrase, searcher.common_grams())
    terms = sorted({t for t, _o in constraints})
    dfs = searcher._dfs(terms, lang)
    if any(dfs[t] == 0 for t in terms):
        return {}
    blocks = searcher._term_postings(terms, lang, with_positions=True)
    keys: np.ndarray | None = None
    for t, o in sorted(constraints, key=lambda c: (dfs[c[0]], c[0], c[1])):
        tb = blocks[blocks["term"] == t]
        if len(tb):
            bases = tb["base_doc_id"].to_numpy()
            uppers = tb["max_doc_id"].to_numpy()
            keep = np.fromiter(
                (
                    _span_hits(cand_docs, int(lo), int(hi))
                    for lo, hi in zip(bases, uppers)
                ),
                dtype=bool,
                count=len(bases),
            )
            tb = tb[keep]
        ids, lens, flat, starts = _decode_term_positions(tb)
        sel = np.flatnonzero(bm25.sorted_member_mask(ids, cand_docs))
        ids, lens, flat, starts = select_postings(ids, lens, flat, starts, sel)
        if flat.size == 0:
            return {}
        k = pack_offset_keys(ids, lens, flat, o)
        keys = k if keys is None else keys[bm25.sorted_member_mask(keys, k)]
        if keys.size == 0:
            return {}
        cand_docs = np.unique(keys >> _POS_SHIFT)
    uniq, counts = np.unique((keys >> _POS_SHIFT).astype(np.int64), return_counts=True)
    return {int(d): int(c) for d, c in zip(uniq, counts)}
