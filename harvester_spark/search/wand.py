"""Block-max WAND top-k for disjunctive (OR) queries.

The algorithm of Broder et al. (WAND) with the block-max refinement of Ding &
Suel: posting blocks carry an exact per-block score upper bound
(``idf(term) * block_max_impact`` — impact stored at encode time,
:mod:`harvester_spark.index.codec`), so whole blocks are skipped when the sum
of upper bounds of the terms that could contain the pivot document cannot
beat the current k-th score (threshold θ).

Safety invariant (tested): pruning only decides WHICH documents get fully
scored — every document whose true score could reach the top-k is scored
EXACTLY with the shared :mod:`bm25` kernel in the fixed (df asc, term asc)
accumulation order, so surviving scores are bit-identical to the brute-force
OR oracle and the final ranking equals the oracle's.

Used by ``more_like_this``-style OR queries; conjunctive (AND) search keeps
the intersection path in :mod:`engine`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.index.codec import decode_block
from harvester_spark.search import bm25


def _monotone_chains(blocks: pd.DataFrame) -> list[list]:
    """Split a term's blocks into monotone chains (docID-increasing runs).

    Block spans from different languages ('all' queries), docID shards, or
    delta appends interleave; WAND cursors require monotone streams. Greedy
    patience assignment: each block (sorted by base) joins the first chain
    whose last max_doc_id is below its base — minimal chains, each strictly
    increasing.
    """
    chains: list[dict] = []
    for row in blocks.sort_values("base_doc_id").itertuples(index=False):
        for ch in chains:
            if ch["last_max"] < row.base_doc_id:
                ch["rows"].append(row)
                ch["last_max"] = row.max_doc_id
                break
        else:
            chains.append({"rows": [row], "last_max": row.max_doc_id})
    return [ch["rows"] for ch in chains]


class _ChainCursor:
    """Iterates one monotone block chain with lazy decode."""

    __slots__ = (
        "term", "idf", "rows", "impact_col", "bix", "ids", "tfs", "pos",
        "exhausted", "list_ub",
    )

    def __init__(self, term: str, idf: float, rows: list, impact_col: str):
        self.term = term
        self.idf = idf
        self.rows = rows
        self.impact_col = impact_col
        # Whole-chain upper bound (term-level in Ding & Suel terms): the max
        # impact over ALL blocks of this chain. Pivot selection and loop
        # termination MUST use this — the current block's bound says nothing
        # about later blocks of the same chain.
        self.list_ub = idf * max(
            (float(getattr(r, impact_col)) for r in rows), default=0.0
        )
        self.bix = -1
        self.ids = np.empty(0, np.int64)
        self.tfs = np.empty(0, np.int64)
        self.pos = 0
        self.exhausted = False
        self._next_block()

    def _next_block(self) -> None:
        self.bix += 1
        if self.bix >= len(self.rows):
            self.exhausted = True
            return
        row = self.rows[self.bix]
        self.ids, self.tfs = decode_block(row.base_doc_id, row.doc_deltas, row.tfs)
        self.pos = 0

    def current_doc(self) -> int:
        return np.iinfo(np.int64).max if self.exhausted else int(self.ids[self.pos])

    def current_block_ub(self) -> float:
        if self.exhausted:
            return 0.0
        return self.idf * float(getattr(self.rows[self.bix], self.impact_col))

    def advance_to(self, target: int) -> None:
        """Move cursor to the first posting with doc_id >= target."""
        while not self.exhausted:
            if self.rows[self.bix].max_doc_id < target:
                self._next_block()
                continue
            i = int(np.searchsorted(self.ids, target, side="left"))
            if i < len(self.ids):
                self.pos = i
                return
            self._next_block()

    def next(self) -> None:
        self.pos += 1
        if self.pos >= len(self.ids):
            self._next_block()


def wand_topk(
    term_blocks: dict[str, pd.DataFrame],
    dfs: dict[str, int],
    n_docs: int,
    avgdl: float,
    doc_lens: np.ndarray,
    k: int = 10,
    impact_col: str = "impact_all",
    allowed_doc_ids: np.ndarray | None = None,
    require_all: bool = False,
) -> tuple[pd.DataFrame, dict]:
    """Block-max WAND over per-term block tables → (topk frame, stats).

    ``term_blocks[t]`` columns: base_doc_id, max_doc_id, doc_deltas, tfs,
    impact_lang, impact_all. ``require_all=True`` switches to conjunctive
    (AND) semantics with the same θ-driven block skipping — the
    early-terminating fast path whose result totals are imprecise but whose
    top-k is exact (bounds are upper bounds, so no top-k doc is skipped).
    """
    terms = [t for t in term_blocks if dfs.get(t, 0) > 0]
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    stats = {"scored": 0, "blocks_decoded": 0}
    if not terms:
        return empty, stats

    idfs = {t: float(bm25.idf(n_docs, dfs[t])) for t in terms}
    cursors = [
        _ChainCursor(t, idfs[t], chain, impact_col)
        for t in terms
        for chain in _monotone_chains(term_blocks[t])
    ]
    order_terms = bm25.term_order(terms, dfs)

    # exact scorer for one candidate doc: fixed accumulation order
    def score_doc(doc: int, present: dict[str, int]) -> float:
        dl = doc_lens[doc]
        s = 0.0
        for t in order_terms:
            tf = present.get(t)
            if tf:
                s += idfs[t] * float(bm25.tf_norm(np.float64(tf), np.float64(dl), avgdl))
        return s

    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap of top-k
    import heapq

    theta = -np.inf
    while True:
        live = [c for c in cursors if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.current_doc())
        # Find pivot: smallest doc where the prefix sum of WHOLE-LIST upper
        # bounds reaches theta. Ding & Suel safety: pivot selection and loop
        # termination must use term-level bounds — the current block's bound
        # says nothing about postings in later blocks of the same chain, so
        # using it here would skip (or never score) high-impact postings
        # behind a low-impact block.
        ub = 0.0
        pivot_ix = None
        for i, c in enumerate(live):
            ub += c.list_ub
            # >= (not >): a doc scoring exactly θ can still win its tie on
            # ascending doc_id — pruning it would break rank identity
            if len(heap) < k or ub >= theta:
                pivot_ix = i
                break
        if pivot_ix is None:
            break  # no document anywhere can beat theta (list-level bounds)
        pivot_doc = live[pivot_ix].current_doc()
        if live[0].current_doc() == pivot_doc:
            # Block-max refinement: all cursors at the pivot have it inside
            # their CURRENT blocks, so the sum of current-block bounds (plus
            # list bounds of cursors that could still join ≤ pivot — none,
            # they're all > pivot) is a valid bound for the pivot doc.
            aligned = [c for c in live if c.current_doc() == pivot_doc]
            bub = sum(c.current_block_ub() for c in aligned)
            if len(heap) >= k and bub < theta:
                # No doc in [pivot, d2) can beat θ: inside that range only
                # the aligned cursors' CURRENT blocks can contribute (the
                # next unaligned cursor sits at d2 or later), and their
                # block-max sum is below θ. Advance only to
                # min(current block boundary)+1 capped by the next unaligned
                # cursor — never past a block boundary on the strength of
                # the current block's bound.
                block_end = min(c.rows[c.bix].max_doc_id for c in aligned)
                d2 = block_end + 1
                for c in live:
                    if c.current_doc() != pivot_doc:
                        d2 = min(d2, c.current_doc())
                        break  # live is sorted; first unaligned is smallest
                d2 = max(d2, pivot_doc + 1)
                for c in aligned:
                    c.advance_to(d2)
                continue
            # all cursors up to pivot are aligned — score the pivot doc
            # (filters are non-scoring restrictions: skip disallowed docs
            # without touching θ or the statistics)
            if allowed_doc_ids is not None and not _allowed(allowed_doc_ids, pivot_doc):
                for c in live:
                    if c.current_doc() == pivot_doc:
                        c.next()
                continue
            present: dict[str, int] = {}
            for c in live:
                if c.current_doc() == pivot_doc:
                    present[c.term] = int(c.tfs[c.pos])
            if require_all and len(present) < len(terms):
                for c in live:
                    if c.current_doc() == pivot_doc:
                        c.next()
                continue
            s = score_doc(pivot_doc, present)
            stats["scored"] += 1
            item = (s, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            if len(heap) == k:
                theta = heap[0][0]
            for c in live:
                if c.current_doc() == pivot_doc:
                    c.next()
        else:
            # advance the earliest cursor(s) to the pivot
            for c in live[:pivot_ix]:
                c.advance_to(pivot_doc)

    if not heap:
        return empty, stats
    rows = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return (
        pd.DataFrame(
            {
                "rank": np.arange(1, len(rows) + 1),
                "doc_id": [-d for _s, d in rows],
                "score": [s for s, _d in rows],
            }
        ),
        stats,
    )


def or_accumulate_topk(
    term_blocks: dict[str, pd.DataFrame],
    dfs: dict[str, int],
    n_docs: int,
    avgdl: float,
    doc_lens: np.ndarray,
    k: int = 10,
    allowed_doc_ids=None,
) -> tuple[pd.DataFrame, dict]:
    """Exhaustive vectorized OR top-k — the dense-accumulator twin of WAND.

    One ``decode_blocks_batch`` pass per term, then a dense float64 score
    array indexed by doc_id: ``scores[ids] += idf * tf_norm(tf, dl)`` (ids
    are unique within a term's postings, so fancy-index addition is exact).
    Terms accumulate in the fixed (df asc, term asc) order, so every doc's
    float additions happen in exactly the order the WAND scorer and the
    brute-force oracle use — scores are bit-identical by construction.

    WAND's per-posting Python cursor costs ~10 µs; this path costs ~30 ns
    per posting but cannot skip. It wins whenever the query has no rare term
    to drive θ-pruning (head-heavy OR: 30 s → sub-second on a 2M-doc index);
    :func:`or_search` picks per-query via the cost model. ``stats['scored']``
    is the EXACT match count here (the accumulator sees every match).
    """
    from harvester_spark.index.codec import decode_blocks_batch
    from harvester_spark.search.allowed import allowed_filter_mask

    terms = [t for t in term_blocks if dfs.get(t, 0) > 0]
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    stats = {"scored": 0, "blocks_decoded": 0}
    if not terms:
        return empty, stats

    scores = np.zeros(doc_lens.size, dtype=np.float64)
    matched = np.zeros(doc_lens.size, dtype=bool)
    for t in bm25.term_order(terms, dfs):
        tb = term_blocks[t]
        ids, tfv = decode_blocks_batch(
            tb["base_doc_id"].to_numpy(),
            tb["n"].to_numpy(),
            [bytes(b) for b in tb["doc_deltas"]],
            [bytes(b) for b in tb["tfs"]],
        )
        stats["blocks_decoded"] += len(tb)
        if ids.size == 0:
            continue
        scores[ids] += bm25.idf(n_docs, dfs[t]) * bm25.tf_norm(
            tfv, doc_lens[ids], avgdl
        )
        matched[ids] = True

    candidates = np.flatnonzero(matched)
    if allowed_doc_ids is not None and candidates.size:
        keep = allowed_filter_mask(allowed_doc_ids, candidates)
        candidates = candidates[keep]
    stats["scored"] = int(candidates.size)
    if candidates.size == 0:
        return empty, stats
    svals = scores[candidates]
    sel = bm25.topk_order(svals, candidates, k)
    return (
        pd.DataFrame(
            {
                "rank": np.arange(1, sel.size + 1),
                "doc_id": candidates[sel].astype(np.int64),
                "score": svals[sel],
            }
        ),
        stats,
    )


def or_maxscore_topk(
    term_blocks: dict[str, pd.DataFrame],
    dfs: dict[str, int],
    n_docs: int,
    avgdl: float,
    doc_lens: np.ndarray,
    k: int = 10,
    impact_col: str = "impact_all",
    allowed_doc_ids=None,
) -> tuple[pd.DataFrame, dict]:
    """Vectorized term-at-a-time MaxScore (Buckley & Lewit '85; Turtle &
    Flood '95) — the third dynamic-pruning family between WAND and the
    dense accumulator.

    Phase 1 (selection, ub-DESCENDING term order): terms accumulate into a
    sorted candidate array; after each term, candidates whose partial score
    plus the remaining-terms upper-bound sum cannot reach the running k-th
    partial score θ are dropped, and once that remainder itself falls below
    θ no NEW document can enter the top-k — remaining (non-essential) lists
    switch to PROBE-ONLY mode, decoding only blocks whose
    [base_doc_id, max_doc_id] span contains a surviving candidate
    (``stats['blocks_skipped']`` counts the decode savings; WAND cannot
    skip this way without a per-posting Python cursor walk).

    Phase 2 (exact): survivors are re-scored with the shared kernel in the
    FIXED (df asc, term asc) accumulation order, so returned scores are
    bit-identical to :func:`or_accumulate_topk` / :func:`wand_topk` — the
    rank-identity contract. Safe because candidates only ever shrink: every
    block containing a survivor was decoded in whichever phase ran.

    Bound comparisons carry a 1e-9 margin so Phase-1 float addition order
    (ub-desc) can never prune a document the fixed-order kernel would keep;
    a tie at exactly θ must survive (doc_id asc can win the tie).
    ``stats['scored']`` is the surviving-candidate count — a lower bound on
    the true match total, like WAND's.
    """
    from harvester_spark.index.codec import decode_blocks_batch
    from harvester_spark.search.allowed import allowed_filter_mask

    terms = [t for t in term_blocks if dfs.get(t, 0) > 0]
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    stats = {"scored": 0, "blocks_decoded": 0, "blocks_skipped": 0}
    if not terms:
        return empty, stats

    eps = 1e-9
    idfs = {t: float(bm25.idf(n_docs, dfs[t])) for t in terms}
    ub = {t: idfs[t] * float(term_blocks[t][impact_col].max()) for t in terms}
    order = sorted(terms, key=lambda t: (-ub[t], t))
    # rem[j] = Σ ub of terms strictly after position j
    rem = np.concatenate(
        [np.cumsum([ub[t] for t in order][::-1])[::-1][1:], [0.0]]
    )

    cand_ids = np.empty(0, dtype=np.int64)
    cand_scores = np.empty(0, dtype=np.float64)
    decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    admitting = True
    theta = -np.inf
    for j, t in enumerate(order):
        tb = term_blocks[t]
        if admitting:
            rows = tb
        else:
            base = tb["base_doc_id"].to_numpy()
            mx = tb["max_doc_id"].to_numpy()
            lo = np.searchsorted(cand_ids, base, side="left")
            hi = np.searchsorted(cand_ids, mx, side="right")
            keep_blk = hi > lo  # block span contains >= 1 survivor
            stats["blocks_skipped"] += int((~keep_blk).sum())
            rows = tb[keep_blk]
        if len(rows):
            ids, tfv = decode_blocks_batch(
                rows["base_doc_id"].to_numpy(),
                rows["n"].to_numpy(),
                [bytes(b) for b in rows["doc_deltas"]],
                [bytes(b) for b in rows["tfs"]],
            )
            stats["blocks_decoded"] += len(rows)
        else:
            ids = np.empty(0, dtype=np.int64)
            tfv = np.empty(0, dtype=np.int64)
        if ids.size:
            # chains interleave ('all' spans, delta appends): sort once —
            # ids are unique within a term (accumulator invariant)
            o = np.argsort(ids, kind="stable")
            ids, tfv = ids[o], tfv[o]
            if allowed_doc_ids is not None:
                keep = allowed_filter_mask(allowed_doc_ids, ids)
                ids, tfv = ids[keep], tfv[keep]
        decoded[t] = (ids, tfv)
        if ids.size:
            contrib = idfs[t] * bm25.tf_norm(tfv, doc_lens[ids], avgdl)
            if admitting:
                merged = np.union1d(cand_ids, ids)
                ns = np.zeros(merged.size, dtype=np.float64)
                ns[np.searchsorted(merged, cand_ids)] = cand_scores
                ns[np.searchsorted(merged, ids)] += contrib
                cand_ids, cand_scores = merged, ns
            else:
                m = bm25.sorted_member_mask(ids, cand_ids)
                pos = np.searchsorted(cand_ids, ids[m])
                cand_scores[pos] += contrib[m]
        if cand_ids.size >= k:
            theta = float(
                np.partition(cand_scores, cand_scores.size - k)[
                    cand_scores.size - k
                ]
            )
            keep = cand_scores + rem[j] >= theta - eps
            cand_ids, cand_scores = cand_ids[keep], cand_scores[keep]
            if admitting and rem[j] < theta - eps:
                admitting = False

    stats["scored"] = int(cand_ids.size)
    if cand_ids.size == 0:
        return empty, stats
    # Phase 2: exact scores, fixed accumulation order (rank identity)
    final = np.zeros(cand_ids.size, dtype=np.float64)
    for t in bm25.term_order(terms, dfs):
        ids, tfv = decoded[t]
        if ids.size == 0:
            continue
        m = bm25.sorted_member_mask(cand_ids, ids)
        if not m.any():
            continue
        pos = np.searchsorted(ids, cand_ids[m])
        final[m] += idfs[t] * bm25.tf_norm(
            tfv[pos], doc_lens[cand_ids[m]], avgdl
        )
    sel = bm25.topk_order(final, cand_ids, k)
    return (
        pd.DataFrame(
            {
                "rank": np.arange(1, sel.size + 1),
                "doc_id": cand_ids[sel].astype(np.int64),
                "score": final[sel],
            }
        ),
        stats,
    )


# Cost model for the OR strategy dispatch (measured on this host, but the
# RATIO is what matters and it is hardware-stable: an interpreted cursor
# step costs ~300× a vectorized per-posting op).
_WAND_SEC_PER_POSTING = 8e-6  # Python cursor walk, per posting visited
_VEC_SEC_PER_POSTING = 3e-8  # numpy decode+accumulate, per posting
_VEC_FIXED_SEC = 8e-3  # dense-array zeroing + top-k selection


# MaxScore routing constants (round-4, the conservative switch the round-3
# VERDICT asked for): route `auto` to the term-at-a-time MaxScore only when
#   (a) the query has a genuinely selective driver — min df ≤ 0.1 × max df,
#       so Phase 1's θ forms from the selective list(s) and the head lists
#       actually flip to probe-only mode (all-head queries never probe:
#       BENCH.md session-10, 1.22 s maxscore vs 0.93 s accumulate), and
#   (b) the decode volume is large enough that skipped blocks dominate the
#       probe/rescore overhead — Σ df ≥ 500k postings (below it the dense
#       accumulator finishes in ≤ ~25 ms and the margin is noise).
# Both are RATIO/volume conditions, not wall-clock constants, so they are
# load-insensitive — the blocker the round-3 session documented for a
# 3-way wall-clock cost model. Measured at 2M (BENCH.md round-4): mid+head
# auto→maxscore 0.30 s (best fixed 0.30 s), all-head auto→accumulate
# 0.93 s (maxscore 1.22 s), rare-driven auto→wand unchanged.
_MAXSCORE_DF_RATIO = 0.1
_MAXSCORE_MIN_SUM_DF = 500_000


def _pick_or_strategy(dfs: dict[str, int], live: list[str]) -> str:
    """'wand' when θ-pruning can win, else 'maxscore' on selective-driver
    high-volume mixes, else 'accumulate'.

    WAND visits ≈ n_terms × min_df postings when a rare term drives the
    pivot (its classic win: ``rare OR head``); the accumulator always pays
    Σ df but at memory-bandwidth cost. Head-heavy queries (no rare term)
    make the cursor walk degenerate to Σ df Python steps — 30 s vs 0.3 s on
    a 3-head-term query over 2M docs. Between them, mid+head mixes route to
    MaxScore: the mid-df list drives θ, the head lists switch to probe-only
    and skip ~99% of their blocks (BENCH.md session-10)."""
    min_df = min(dfs[t] for t in live)
    max_df = max(dfs[t] for t in live)
    sum_df = sum(dfs[t] for t in live)
    if _maxscore_carveout(dfs, live) and sum_df >= OR_BATCH_MIN_SUM_DF:
        # batch-scale volume with a selective driver: probe-only MaxScore
        # skips ~99% of the head blocks AND avoids both the cursor-walk
        # risk (8M measured: wand 5.4-15.8 s on these mixes) and the batch
        # job launch (1.5-2.7 s) — 0.85-0.97 s measured. Below batch scale
        # the 2M-validated order (wand cost model first) stands.
        return "maxscore"
    est_wand = _WAND_SEC_PER_POSTING * len(live) * min_df
    est_vec = _VEC_SEC_PER_POSTING * sum_df + _VEC_FIXED_SEC
    if est_wand < est_vec:
        return "wand"
    if (
        len(live) >= 2
        and min_df <= _MAXSCORE_DF_RATIO * max_df
        and sum_df >= _MAXSCORE_MIN_SUM_DF
    ):
        return "maxscore"
    return "accumulate"


# Single-query distributed dispatch (round-3): above this total decode
# volume a single Python process is the bottleneck — fan the decode across
# executors by docID range (or_search_batch), exactly like the phrase
# path's PHRASE_BATCH_MIN_DF dispatch. Below it, driver-side numpy wins on
# job-launch latency. Measured crossover on the 2M bench is recorded in
# BENCH.md.
OR_BATCH_MIN_SUM_DF = 5_000_000
# MaxScore carve-out from the batch dispatch (round-5, validated at 8M):
# when a selective term drives θ (min_df ≤ 0.1·max_df) AND its full decode
# stays driver-cheap (min_df below this cap), probe-only MaxScore beats
# the batch fan-out even at batch-scale Σdf — measured 0.85-0.97 s vs
# batch 1.5-2.7 s on the 8M mid+head / rare+head / head+mid+rare mixes.
# The absolute cap keeps the carve-out from re-serializing at 100× scale:
# a driving list beyond ~1M postings is itself a batch-scale decode.
OR_MAXSCORE_MAX_DRIVER_DF = 1_000_000


def _maxscore_carveout(dfs: dict, live: list[str]) -> bool:
    min_df = min(dfs[t] for t in live)
    max_df = max(dfs[t] for t in live)
    return (
        len(live) >= 2
        and min_df <= _MAXSCORE_DF_RATIO * max_df
        and min_df <= OR_MAXSCORE_MAX_DRIVER_DF
    )


def _dispatch_or_batch(searcher, dfs: dict, live: list[str], allowed) -> bool:
    return (
        allowed is None
        and getattr(searcher, "spark", None) is not None
        and sum(dfs[t] for t in live) >= OR_BATCH_MIN_SUM_DF
        and not _maxscore_carveout(dfs, live)
    )


def _allowed(allowed, doc: int) -> bool:
    if hasattr(allowed, "test_one"):  # AllowedSet bitmap — O(1) probe
        return allowed.test_one(doc)
    i = int(np.searchsorted(allowed, doc))
    return i < allowed.size and int(allowed[i]) == doc


def or_search(searcher, query_text: str, k: int = 10, lang: str = ALL_LANG,
              allowed_doc_ids=None, with_stats: bool = False,
              strategy: str = "auto"):
    """Disjunctive top-k through the index.

    ``strategy``: ``'wand'`` (θ-pruned cursor walk — wins when a rare term
    bounds the pivot), ``'accumulate'`` (exhaustive vectorized dense
    accumulator — wins on head-heavy queries), or ``'auto'`` (cost model,
    the default). Both produce bit-identical rankings (shared kernel, fixed
    accumulation order) — the strategy changes WHERE time goes, never what
    comes back. ``allowed_doc_ids``: an
    :class:`~harvester_spark.search.allowed.AllowedSet` bitmap (O(1)
    probes) or a plain id array (sorted here). With ``with_stats=True``
    returns ``(topk, stats)`` so callers can report the scored count as the
    results_total (exact on the accumulate path, a lower bound under WAND)."""
    terms = sorted(set(tokenize(query_text)))
    empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
    stats = {"scored": 0, "blocks_decoded": 0}
    if not terms:
        return (empty, stats) if with_stats else empty
    dfs = searcher._dfs(terms, lang)
    live = [t for t in terms if dfs[t] > 0]
    if not live:
        return (empty, stats) if with_stats else empty
    # SINGLE-QUERY DISTRIBUTED DISPATCH: at head-heavy decode volume the
    # driver path serializes Σdf posting decodes in one process — route
    # through the docID-range executors instead (rank-identical: shared
    # kernels, global df/stats). Decided BEFORE any driver-side block load.
    if strategy == "batch" and (
        allowed_doc_ids is not None or getattr(searcher, "spark", None) is None
    ):
        # explicit 'batch' requires a Spark-backed searcher and no allowed
        # filter (or_search_batch has neither) — fail loudly rather than
        # silently returning unfiltered results
        raise ValueError(
            "strategy='batch' needs searcher.spark and allowed_doc_ids=None"
        )
    if strategy == "batch" or (
        strategy == "auto" and _dispatch_or_batch(searcher, dfs, live, allowed_doc_ids)
    ):
        from harvester_spark.search.distributed import or_search_batch

        stacked, totals, precise = or_search_batch(
            searcher.spark, searcher, [("q", query_text)], k=k, lang=lang,
            with_totals=True,
        )
        topk = stacked[["rank", "doc_id", "score"]].reset_index(drop=True)
        stats = {
            "scored": int(totals.get("q", 0)),
            "blocks_decoded": 0,
            "strategy": "batch",
            "precise": bool(precise.get("q", True)),
        }
        return (topk, stats) if with_stats else topk
    blocks = searcher._term_postings(live, lang)
    term_blocks = {t: blocks[blocks["term"] == t] for t in live}
    n_docs, avgdl = searcher._corpus_stats[lang]
    impact_col = "impact_all" if lang == ALL_LANG else "impact_lang"
    if allowed_doc_ids is not None and not hasattr(allowed_doc_ids, "test_one"):
        allowed_doc_ids = np.sort(allowed_doc_ids)
    if strategy == "auto":
        strategy = _pick_or_strategy(dfs, live)
    if strategy == "accumulate":
        topk, stats = or_accumulate_topk(
            term_blocks, dfs, n_docs, avgdl, searcher._doc_lens(), k,
            allowed_doc_ids=allowed_doc_ids,
        )
    elif strategy == "maxscore":
        topk, stats = or_maxscore_topk(
            term_blocks, dfs, n_docs, avgdl, searcher._doc_lens(), k, impact_col,
            allowed_doc_ids=allowed_doc_ids,
        )
    else:
        topk, stats = wand_topk(
            term_blocks, dfs, n_docs, avgdl, searcher._doc_lens(), k, impact_col,
            allowed_doc_ids=allowed_doc_ids,
        )
    # the accumulator sees every match — its scored count is the EXACT total
    stats["strategy"] = strategy
    return (topk, stats) if with_stats else topk
