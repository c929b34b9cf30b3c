"""Distributed OR serving: docID-range-partitioned top-k.

Round-1 gap (BENCH.md): OR and more-like-this ran a Python cursor loop on
the driver. Here the docID space is split into contiguous ranges; each range
runs the SAME per-query strategy dispatch as driver ``or_search`` (block-max
``wand_topk`` for rare-term queries, the dense accumulator for head-heavy
ones) over the blocks whose [base, max] span
overlaps it (straddling blocks are masked to the range with an O(1)
interval filter), producing an exact per-range top-k; the driver merges the
k·ranges candidates by (score desc, doc_id asc). Every document is scored
with global df/idf and corpus stats, so the merged result is EXACTLY the
driver-side ``or_search`` ranking — per-range WAND only changes which
blocks get pruned, never any surviving score.

On a cluster the ranges are the postings' docID shards and the doc-length
sidecar is co-partitioned with them; locally doc_lens ships as one
broadcast (the per-shard slice at scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.search.wand import _pick_or_strategy, or_accumulate_topk, wand_topk


def _default_n_ranges(spark: SparkSession) -> int:
    """Fan-out for a dispatched single query.

    Single-tenant default: half the shuffle partitions (one wave on the
    local scheduler, room for the reduce). A SERVING process with
    concurrent clients sets the per-thread local property
    ``hs.serving.n_ranges`` (inherited by every job the client thread
    submits, pinned-thread mode) to cap how many task slots one query may
    occupy — combined with FAIR scheduler pools per client this bounds
    head-of-line blocking: one head∧head query costs its fair share of the
    cluster, never the whole thing (see scripts/bench_serving_concurrent.py
    for the measured FIFO-vs-FAIR-vs-capped contrast)."""
    cap = spark.sparkContext.getLocalProperty("hs.serving.n_ranges")
    if cap:
        return max(2, int(cap))
    return max(4, int(spark.conf.get("spark.sql.shuffle.partitions", "8")) // 2)


def _delta_context(searcher, what: str):
    """Seq-tagged view of a possibly-delta'd index for batch fan-out.

    Returns ``(delta_blocks_df_or_None, name→seq map, tomb_ids,
    tomb_maxseq)``. The batch kernels decode per (term, seq) group, apply
    latest-wins tombstone filtering with the broadcast folded tombstone
    arrays, and merge ascending seq — the executor-side twin of
    DeltaSearcher's driver-side merge, so batch serving over un-compacted
    deltas equals the delta-aware driver ranking exactly (like per-segment
    search in a segmented engine, with the range shards as the segments).

    A plain IndexSearcher on a delta'd index is refused: its df/stats/doc
    lens are pre-delta, so even a merged executor scan would score wrong.
    """
    from harvester_spark.search.engine import read_delta_state

    state = read_delta_state(searcher.index_dir)
    if not (state and state.get("deltas")):
        return None, {}, np.empty(0, np.int64), np.empty(0, np.int64)
    if not hasattr(searcher, "_delta_seq"):
        raise ValueError(
            f"{what}: index at {searcher.index_dir} has un-compacted deltas "
            "— open it with DeltaSearcher (streaming.incremental) so "
            "df/stats/doc-lens are post-delta"
        )
    return (
        searcher._delta,
        dict(searcher._delta_seq),
        searcher._tomb_ids,
        searcher._tomb_maxseq,
    )


def _seq_tagged_blocks(searcher, all_terms, lang, cols, what: str):
    """Blocks for ``all_terms`` with term+lang pushdown, each row tagged with
    its delta seq (base = 0): base postings ∪ manifest-listed delta postings.
    Also returns the folded tombstone arrays and whether a merge is needed."""
    delta, seq_map, tomb_ids, tomb_maxseq = _delta_context(searcher, what)
    blocks = searcher.postings.filter(F.col("term").isin(all_terms))
    if lang != ALL_LANG:
        blocks = blocks.filter(F.col("lang") == lang)
    blocks = blocks.select(*cols).withColumn("seq", F.lit(0).cast("long"))
    if delta is not None:
        d = delta.filter(F.col("term").isin(all_terms))
        if lang != ALL_LANG:
            d = d.filter(F.col("lang") == lang)
        seq_lit = F.create_map(
            *[F.lit(x) for kv in seq_map.items() for x in kv]
        )
        d = d.select(
            *cols,
            F.element_at(seq_lit, F.col("delta")).cast("long").alias("seq"),
        )
        blocks = blocks.unionByName(d)
    return blocks, tomb_ids, tomb_maxseq, bool(seq_map)


def _merged_tf_range(pdf_term, tomb_ids, tomb_maxseq, lo, hi):
    """Executor-side merge of one term's seq-tagged blocks within a docID
    range: decode per seq, mask to [lo, hi], drop tombstone-superseded
    postings (latest-wins), merge ascending seq. Pure numpy — equals what
    DeltaSearcher._merged_term_arrays holds for this range."""
    from harvester_spark.index.codec import decode_blocks_batch
    from harvester_spark.streaming.incremental import dead_mask, merge_tf_parts

    parts = []
    for seq in sorted(pdf_term["seq"].unique()):
        tb = pdf_term[pdf_term["seq"] == seq]
        ids, tfv = decode_blocks_batch(
            tb["base_doc_id"].to_numpy(),
            tb["n"].to_numpy(),
            [bytes(b) for b in tb["doc_deltas"]],
            [bytes(b) for b in tb["tfs"]],
        )
        keep = (ids >= lo) & (ids <= hi)
        ids, tfv = ids[keep], tfv[keep]
        order = np.argsort(ids, kind="stable")
        ids, tfv = ids[order], tfv[order]
        dead = dead_mask(tomb_ids, tomb_maxseq, ids, int(seq))
        if dead is not None:
            ids, tfv = ids[~dead], tfv[~dead]
        parts.append((ids, tfv))
    return merge_tf_parts(parts)


def _merged_pos_range(pdf_term, tomb_ids, tomb_maxseq, lo, hi):
    """Positional twin of :func:`_merged_tf_range`: per-seq positional
    decode, range + tombstone mask, ascending-seq merge."""
    from harvester_spark.search.phrase import _decode_term_positions, select_postings
    from harvester_spark.streaming.incremental import dead_mask, merge_pos_parts

    parts = []
    for seq in sorted(pdf_term["seq"].unique()):
        tb = pdf_term[pdf_term["seq"] == seq]
        ids, lens_, flat, starts = _decode_term_positions(tb)
        keep = (ids >= lo) & (ids <= hi)
        dead = dead_mask(tomb_ids, tomb_maxseq, ids, int(seq))
        if dead is not None:
            keep &= ~dead
        sel = np.flatnonzero(keep)
        tup = (
            (ids, lens_, flat, starts)
            if sel.size == ids.size
            else select_postings(ids, lens_, flat, starts, sel)
        )
        parts.append(tup)
    return merge_pos_parts(parts)


class RangeInterval:
    """Allowed-set view of a contiguous docID range [lo, hi]."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = int(lo), int(hi)

    def test_one(self, doc_id: int) -> bool:
        return self.lo <= doc_id <= self.hi

    def test(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        return (ids >= self.lo) & (ids <= self.hi)


def or_search_batch(
    spark: SparkSession,
    searcher,
    queries: list[tuple[str, str]],
    k: int = 10,
    lang: str = ALL_LANG,
    n_ranges: int | None = None,
    strategy: str = "auto",
    with_totals: bool = False,
) -> pd.DataFrame:
    """Batch OR top-k: (query_id, query_text) list → stacked exact top-k.

    One Spark job: postings blocks for ALL queries' terms are scanned with
    term+lang pushdown, fanned out to docID ranges, per-range WAND runs in
    executors (applyInPandas, numpy kernel), and the driver merges k·ranges
    rows per query. Over a DeltaSearcher with un-compacted deltas, delta
    blocks fan out seq-tagged and each range merges them with latest-wins
    tombstone filtering, then re-encodes synthetic blocks for the WAND
    kernel — bit-identical to the delta-aware driver ranking.

    ``with_totals=True`` returns ``(frame, totals, precise)``: per-query
    scored counts summed over the disjoint docID ranges. A range scored
    under the accumulator counts every match in the range, so when ALL of a
    query's ranges ran accumulate (the head-heavy regime that triggers the
    single-query dispatch) the sum is the EXACT total; a WAND range makes
    it a lower bound (``precise[qid]=False``).
    """
    if n_ranges is None:
        n_ranges = _default_n_ranges(spark)
    empty = pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    q_terms = {qid: sorted(set(tokenize(qtext))) for qid, qtext in queries}
    all_terms = sorted({t for ts in q_terms.values() for t in ts})
    if with_totals and not all_terms:
        return empty, {qid: 0 for qid, _ in queries}, {qid: True for qid, _ in queries}
    if not all_terms:
        return empty
    dfs = searcher._dfs(all_terms, lang)  # GLOBAL df → global idf everywhere
    live_queries = {
        qid: [t for t in ts if dfs.get(t, 0) > 0] for qid, ts in q_terms.items()
    }
    n_docs, avgdl = searcher._corpus_stats[lang]
    avg_all = searcher._corpus_stats[ALL_LANG][1]
    avg_lang = None if lang == ALL_LANG else avgdl
    doc_lens = searcher._doc_lens()
    n_ids = len(doc_lens)
    step = max(1, (n_ids + n_ranges - 1) // n_ranges)
    impact_col = "impact_all" if lang == ALL_LANG else "impact_lang"

    sc = spark.sparkContext
    bc_lens = sc.broadcast(doc_lens)
    bc_dfs = sc.broadcast(dfs)
    bc_queries = sc.broadcast(live_queries)

    block_cols = [
        "term", "base_doc_id", "max_doc_id", "n", "doc_deltas", "tfs",
        "impact_lang", "impact_all",
    ]
    blocks, tomb_ids, tomb_maxseq, has_deltas = _seq_tagged_blocks(
        searcher, all_terms, lang, block_cols, "or_search_batch"
    )
    bc_tombs = sc.broadcast((tomb_ids, tomb_maxseq))
    # fan a block out to every range its [base, max] span overlaps
    fanned = blocks.select(
        *block_cols, "seq",
        F.explode(
            F.sequence(
                F.floor(F.col("base_doc_id") / step),
                F.floor(F.col("max_doc_id") / step),
            )
        ).alias("range_ix"),
    )

    out_cols = ["query_id", "doc_id", "score", "rtotal", "rprecise"]

    def run_range(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(columns=out_cols)
        rix = int(pdf["range_ix"].iloc[0])
        lo, hi = rix * step, (rix + 1) * step - 1
        interval = RangeInterval(lo, hi)
        lens = bc_lens.value
        dfs_g = bc_dfs.value
        if has_deltas:
            # merge per (term, seq) and re-encode synthetic blocks so the
            # WAND/accumulator kernels below run unchanged
            from harvester_spark.streaming.incremental import synth_block_rows

            t_ids, t_maxseq = bc_tombs.value
            rows = []
            for t in pdf["term"].unique():
                ids, tfv = _merged_tf_range(
                    pdf[pdf["term"] == t], t_ids, t_maxseq, lo, hi
                )
                rows.extend(
                    synth_block_rows(t, ids, tfv, lens, avg_all, avg_lang)
                )
            pdf = pd.DataFrame(rows, columns=block_cols)
        out_rows = []
        for qid, terms in bc_queries.value.items():
            if not terms:
                continue
            tb = {t: pdf[pdf["term"] == t] for t in terms}
            if all(len(v) == 0 for v in tb.values()):
                continue
            # same per-query strategy dispatch as driver-side or_search:
            # per-range dfs are ~df/n_ranges, so the global ratio decides
            pick = strategy if strategy != "auto" else _pick_or_strategy(dfs_g, terms)
            if pick == "accumulate":
                topk, rstats = or_accumulate_topk(
                    tb, dfs_g, n_docs, avgdl, lens, k=k,
                    allowed_doc_ids=interval,
                )
            else:
                topk, rstats = wand_topk(
                    tb, dfs_g, n_docs, avgdl, lens, k=k, impact_col=impact_col,
                    allowed_doc_ids=interval,
                )
            for r in topk.itertuples(index=False):
                out_rows.append((qid, int(r.doc_id), float(r.score), 0, True))
            # per-range summary row: the accumulator's scored count is the
            # range's EXACT match count (ranges partition docID space)
            out_rows.append(
                (qid, -1, 0.0, int(rstats["scored"]), pick == "accumulate")
            )
        return pd.DataFrame(out_rows, columns=out_cols)

    parts = (
        fanned.groupBy("range_ix")
        .applyInPandas(
            run_range,
            "query_id string, doc_id long, score double, rtotal long, rprecise boolean",
        )
        .toPandas()
    )
    summaries = parts[parts["doc_id"] < 0]
    parts = parts[parts["doc_id"] >= 0]

    frames = []
    for qid, _ in queries:
        sub = parts[parts["query_id"] == qid]
        sub = sub.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        sub.insert(1, "rank", np.arange(1, len(sub) + 1))
        frames.append(sub[["query_id", "rank", "doc_id", "score"]])
    stacked = pd.concat(frames, ignore_index=True) if frames else empty
    if not with_totals:
        return stacked
    totals, precise = {}, {}
    for qid, _ in queries:
        s = summaries[summaries["query_id"] == qid]
        totals[qid] = int(s["rtotal"].sum())
        precise[qid] = bool(s["rprecise"].all()) if len(s) else True
    return stacked, totals, precise


def phrase_search_batch(
    spark: SparkSession,
    searcher,
    queries: list[tuple[str, str, int]],
    k: int = 10,
    lang: str = ALL_LANG,
    n_ranges: int | None = None,
) -> tuple[pd.DataFrame, dict]:
    """Batch phrase top-k over docID ranges — the distributed twin of
    ``positional_phrase_search`` (slop=0) and the sloppy-phrase path.

    ``queries`` is ``(query_id, phrase_text, slop)``. Phrase matching is
    per-document, so ranges verify independently: positional blocks for all
    constraint terms scan ONCE with term+lang pushdown (the ``positions``
    column is read only here), fan out to the ranges their span overlaps,
    and each range runs the SAME packed-key kernels as the driver path
    (:func:`harvester_spark.search.phrase.pack_offset_keys` /
    :func:`chain_slop_keys`) on its masked slice. Scores use GLOBAL
    df/idf/corpus stats (range-independent), so the k·ranges driver merge
    equals the driver-side ranking exactly, and per-range match counts sum
    to the EXACT total. This is the scale path for the head∧head phrase
    pathology: the ~100M-position decode spreads across executors instead
    of serializing on the driver. Over a DeltaSearcher with un-compacted
    deltas, positional delta blocks fan out seq-tagged and each range
    merges them (latest-wins tombstones, position slices gathered) before
    the packed-key kernels run — equal to the delta-aware driver phrase
    ranking.
    """
    from harvester_spark.search import bm25
    from harvester_spark.search.phrase import (
        _POS_SHIFT as _PS,
        _decode_term_positions,
        adjacency_constraints,
        chain_slop_keys,
        pack_offset_keys,
        select_postings,
    )

    if not searcher.has_positions:
        raise ValueError("phrase_search_batch requires a positional index")
    if n_ranges is None:
        n_ranges = _default_n_ranges(spark)
    empty = pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    cg = searcher.common_grams()
    specs: dict[str, tuple[list, int, list]] = {}
    for qid, text, slop in queries:
        words = tokenize(text)
        if not words:
            continue
        constraints = (
            adjacency_constraints(words, cg)
            if slop == 0
            else [(t, 0) for t in sorted(set(words))]
        )
        specs[qid] = (words, int(slop), constraints)
    totals = {qid: 0 for qid, _t, _s in queries}
    if not specs:
        return empty, totals
    all_terms = sorted(
        {t for words, _s, cons in specs.values() for t, _o in cons}
        | {w for words, _s, _c in specs.values() for w in words}
    )
    dfs = searcher._dfs(all_terms, lang)
    # a dead word or dead bigram constraint ⇒ the phrase matches nothing
    live = {
        qid: spec
        for qid, spec in specs.items()
        if all(dfs.get(t, 0) > 0 for t, _o in spec[2])
        and all(dfs.get(w, 0) > 0 for w in spec[0])
    }
    if not live:
        return empty, totals
    n_docs, avgdl = searcher._corpus_stats[lang]
    doc_lens = searcher._doc_lens()
    n_ids = len(doc_lens)
    step = max(1, (n_ids + n_ranges - 1) // n_ranges)

    sc = spark.sparkContext
    bc_lens = sc.broadcast(doc_lens)
    bc_dfs = sc.broadcast(dfs)
    bc_queries = sc.broadcast(live)

    block_cols = [
        "term", "base_doc_id", "max_doc_id", "n", "doc_deltas", "tfs",
        "positions",
    ]
    blocks, tomb_ids, tomb_maxseq, has_deltas = _seq_tagged_blocks(
        searcher, all_terms, lang, block_cols, "phrase_search_batch"
    )
    bc_tombs = sc.broadcast((tomb_ids, tomb_maxseq))
    fanned = blocks.select(
        *block_cols, "seq",
        F.explode(
            F.sequence(
                F.floor(F.col("base_doc_id") / step),
                F.floor(F.col("max_doc_id") / step),
            )
        ).alias("range_ix"),
    )

    def run_range(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "doc_id", "score", "range_total"]
        if not len(pdf):
            return pd.DataFrame(columns=cols)
        rix = int(pdf["range_ix"].iloc[0])
        lo, hi = rix * step, (rix + 1) * step - 1
        lens_g = bc_lens.value
        dfs_g = bc_dfs.value
        t_ids, t_maxseq = bc_tombs.value
        decoded: dict[str, tuple] = {}

        def dec(t: str):
            if t not in decoded:
                if has_deltas:
                    decoded[t] = _merged_pos_range(
                        pdf[pdf["term"] == t], t_ids, t_maxseq, lo, hi
                    )
                    return decoded[t]
                ids, lens_, flat, starts = _decode_term_positions(
                    pdf[pdf["term"] == t]
                )
                # straddling blocks: mask whole postings to this range (a
                # doc's positions all live in its one range)
                sel = np.flatnonzero((ids >= lo) & (ids <= hi))
                if sel.size != ids.size:
                    ids, lens_, flat, starts = select_postings(
                        ids, lens_, flat, starts, sel
                    )
                decoded[t] = (ids, lens_, flat, starts)
            return decoded[t]

        out_rows = []
        for qid, (words, slop, constraints) in bc_queries.value.items():
            if slop == 0:
                keys = None
                dead = False
                for t, o in sorted(
                    constraints, key=lambda c: (dfs_g[c[0]], c[0], c[1])
                ):
                    ids, lens_, flat, _ = dec(t)
                    if flat.size == 0:
                        dead = True
                        break
                    kk = pack_offset_keys(ids, lens_, flat, o)
                    keys = kk if keys is None else keys[
                        bm25.sorted_member_mask(keys, kk)
                    ]
                    if keys.size == 0:
                        dead = True
                        break
                matched = (
                    np.empty(0, np.int64)
                    if dead or keys is None
                    else np.unique(keys >> _PS)
                )
            else:
                wkeys: dict[str, np.ndarray] = {}
                dead = False
                for t in sorted(set(words)):
                    ids, lens_, flat, _ = dec(t)
                    if flat.size == 0:
                        dead = True
                        break
                    wkeys[t] = pack_offset_keys(ids, lens_, flat, 0)
                matched = (
                    np.empty(0, np.int64)
                    if dead
                    else chain_slop_keys(wkeys, words, slop)
                )
            if matched.size == 0:
                continue
            dl = lens_g[matched]
            scores = np.zeros(matched.size, dtype=np.float64)
            for t in bm25.term_order(sorted(set(words)), dfs_g):
                ids, tfv, _flat, _ = dec(t)
                pos = np.searchsorted(ids, matched)
                scores += bm25.idf(n_docs, dfs_g[t]) * bm25.tf_norm(
                    tfv[pos], dl, avgdl
                )
            top = bm25.topk_order(scores, matched, k)
            for i in top:
                out_rows.append(
                    (qid, int(matched[i]), float(scores[i]), int(matched.size))
                )
        return pd.DataFrame(out_rows, columns=cols)

    parts = (
        fanned.groupBy("range_ix")
        .applyInPandas(
            run_range,
            "query_id string, doc_id long, score double, range_total long",
        )
        .toPandas()
    )

    frames = []
    for qid, _t, _s in queries:
        sub = parts[parts["query_id"] == qid]
        if len(sub):
            totals[qid] = int(
                sub.drop_duplicates("doc_id")
                .groupby(sub["doc_id"] // step)["range_total"]
                .first()
                .sum()
            )
        sub = sub.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        sub.insert(1, "rank", np.arange(1, len(sub) + 1))
        frames.append(sub[["query_id", "rank", "doc_id", "score"]])
    return (
        pd.concat(frames, ignore_index=True) if frames else empty
    ), totals


def phrase_match_ids_batch(
    spark: SparkSession,
    searcher,
    phrase_text: str,
    lang: str = ALL_LANG,
    slop: int = 0,
    n_ranges: int | None = None,
) -> np.ndarray:
    """ALL docIDs matching one phrase, decoded+verified range-parallel.

    The distributed twin of ``phrase.phrase_match_ids`` for the head∧head
    pathology: the driver path serializes an ~O(sum tf) varbyte position
    decode in one Python process; here the positional blocks fan out by
    docID range and each range runs the SAME packed-key kernels
    (``pack_offset_keys`` intersection for slop=0 incl. common-gram
    collapse, ``chain_slop_keys`` for slop>0) on its masked slice. Matching
    is doc-local, ranges partition the docID space, so the concatenated
    per-range ids are exactly the driver result (sorted, unique). Driver
    transfer is the match id array itself — the same array the driver path
    would build. ``phrase_match_ids`` auto-dispatches here when every
    constraint term is head-scale (min df >= its threshold)."""
    from harvester_spark.search import bm25
    from harvester_spark.search.phrase import (
        _POS_SHIFT as _PS,
        _decode_term_positions,
        adjacency_constraints,
        chain_slop_keys,
        pack_offset_keys,
        select_postings,
    )

    if not searcher.has_positions:
        raise ValueError("phrase_match_ids_batch requires a positional index")
    if n_ranges is None:
        n_ranges = 2 * _default_n_ranges(spark)
    words = tokenize(phrase_text)
    if not words:
        return np.empty(0, np.int64)
    slop = int(slop)
    sloppy = slop > 0 and len(words) > 1
    constraints = (
        [(t, 0) for t in sorted(set(words))]
        if sloppy
        else adjacency_constraints(words, searcher.common_grams())
    )
    terms = sorted({t for t, _o in constraints})
    dfs = searcher._dfs(terms, lang)
    if any(dfs[t] == 0 for t in terms):
        return np.empty(0, np.int64)
    n_ids = len(searcher._doc_lens())
    step = max(1, (n_ids + n_ranges - 1) // n_ranges)

    sc = spark.sparkContext
    bc_dfs = sc.broadcast(dfs)
    bc_spec = sc.broadcast((words, slop, constraints))

    block_cols = [
        "term", "base_doc_id", "max_doc_id", "n", "doc_deltas", "tfs",
        "positions",
    ]
    blocks, tomb_ids, tomb_maxseq, has_deltas = _seq_tagged_blocks(
        searcher, terms, lang, block_cols, "phrase_match_ids_batch"
    )
    bc_tombs = sc.broadcast((tomb_ids, tomb_maxseq))
    fanned = blocks.select(
        *block_cols, "seq",
        F.explode(
            F.sequence(
                F.floor(F.col("base_doc_id") / step),
                F.floor(F.col("max_doc_id") / step),
            )
        ).alias("range_ix"),
    )

    def run_range(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(columns=["doc_id"])
        rix = int(pdf["range_ix"].iloc[0])
        lo, hi = rix * step, (rix + 1) * step - 1
        dfs_g = bc_dfs.value
        t_ids, t_maxseq = bc_tombs.value
        wq, sl, cons = bc_spec.value
        decoded: dict[str, tuple] = {}

        def dec(t: str):
            if t not in decoded:
                if has_deltas:
                    decoded[t] = _merged_pos_range(
                        pdf[pdf["term"] == t], t_ids, t_maxseq, lo, hi
                    )
                    return decoded[t]
                ids, lens_, flat, starts = _decode_term_positions(
                    pdf[pdf["term"] == t]
                )
                sel = np.flatnonzero((ids >= lo) & (ids <= hi))
                if sel.size != ids.size:
                    ids, lens_, flat, starts = select_postings(
                        ids, lens_, flat, starts, sel
                    )
                decoded[t] = (ids, lens_, flat, starts)
            return decoded[t]

        if not sl:
            keys = None
            for t, o in sorted(cons, key=lambda c: (dfs_g[c[0]], c[0], c[1])):
                ids, lens_, flat, _ = dec(t)
                if flat.size == 0:
                    return pd.DataFrame(columns=["doc_id"])
                kk = pack_offset_keys(ids, lens_, flat, o)
                keys = kk if keys is None else keys[
                    bm25.sorted_member_mask(keys, kk)
                ]
                if keys.size == 0:
                    return pd.DataFrame(columns=["doc_id"])
            matched = np.unique(keys >> _PS)
        else:
            wkeys: dict[str, np.ndarray] = {}
            for t in sorted(set(wq)):
                ids, lens_, flat, _ = dec(t)
                if flat.size == 0:
                    return pd.DataFrame(columns=["doc_id"])
                wkeys[t] = pack_offset_keys(ids, lens_, flat, 0)
            matched = chain_slop_keys(wkeys, wq, sl)
        return pd.DataFrame({"doc_id": matched})

    parts = (
        fanned.groupBy("range_ix")
        .applyInPandas(run_range, "doc_id long")
        .toPandas()
    )
    return np.sort(parts["doc_id"].to_numpy(dtype=np.int64, copy=True))


def and_search_batch(
    spark: SparkSession,
    searcher,
    queries: list[tuple[str, str]],
    k: int = 10,
    lang: str = ALL_LANG,
    n_ranges: int | None = None,
    search_after: dict[str, tuple[float, int]] | None = None,
) -> tuple[pd.DataFrame, dict]:
    """Batch conjunctive (AND) top-k over docID ranges — the distributed twin
    of ``IndexSearcher.search`` for query batches.

    Same fan-out as :func:`or_search_batch`: blocks for all queries' terms
    scan once with term+lang pushdown, each docID range intersects and
    scores its slice with GLOBAL df/idf/corpus stats (per-doc scores are
    range-independent, so the merged ranking equals the driver path
    exactly), and per-range candidate counts sum to the EXACT total.
    ``search_after[qid] = (score, doc_id)`` applies the ES deep-pagination
    cursor per range — one mask over that range's scored candidates before
    its local top-k, so the merged page-after-cursor is exact while the
    reported totals stay cursor-independent (ES semantics).
    Returns (stacked top-k frame, {query_id: exact_total}). Over a
    DeltaSearcher with un-compacted deltas, each range merges seq-tagged
    base+delta blocks with latest-wins tombstone filtering before
    intersecting — equal to the delta-aware driver ranking.
    """
    if n_ranges is None:
        n_ranges = _default_n_ranges(spark)
    empty = pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    q_terms = {qid: sorted(set(tokenize(qtext))) for qid, qtext in queries}
    all_terms = sorted({t for ts in q_terms.values() for t in ts})
    if not all_terms:
        return empty, {qid: 0 for qid, _ in queries}
    dfs = searcher._dfs(all_terms, lang)
    # AND semantics: any dead term kills the whole query
    live_queries = {
        qid: ts
        for qid, ts in q_terms.items()
        if ts and all(dfs.get(t, 0) > 0 for t in ts)
    }
    totals = {qid: 0 for qid, _ in queries}
    if not live_queries:
        return empty, totals
    n_docs, avgdl = searcher._corpus_stats[lang]
    doc_lens = searcher._doc_lens()
    n_ids = len(doc_lens)
    step = max(1, (n_ids + n_ranges - 1) // n_ranges)

    sc = spark.sparkContext
    bc_lens = sc.broadcast(doc_lens)
    bc_dfs = sc.broadcast(dfs)
    bc_queries = sc.broadcast(live_queries)

    block_cols = ["term", "base_doc_id", "max_doc_id", "n", "doc_deltas", "tfs"]
    blocks, tomb_ids, tomb_maxseq, has_deltas = _seq_tagged_blocks(
        searcher, all_terms, lang, block_cols, "and_search_batch"
    )
    bc_tombs = sc.broadcast((tomb_ids, tomb_maxseq))
    fanned = blocks.select(
        *block_cols, "seq",
        F.explode(
            F.sequence(
                F.floor(F.col("base_doc_id") / step),
                F.floor(F.col("max_doc_id") / step),
            )
        ).alias("range_ix"),
    )

    def run_range(pdf: pd.DataFrame) -> pd.DataFrame:
        from harvester_spark.search import bm25

        if not len(pdf):
            return pd.DataFrame(
                columns=["query_id", "doc_id", "score", "range_total"]
            )
        rix = int(pdf["range_ix"].iloc[0])
        lo, hi = rix * step, (rix + 1) * step - 1
        lens = bc_lens.value
        dfs_g = bc_dfs.value
        t_ids, t_maxseq = bc_tombs.value
        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}

        def term_arrays(t: str):
            if t not in decoded:
                tb = pdf[pdf["term"] == t]
                if len(tb) == 0:
                    decoded[t] = (np.empty(0, np.int64), np.empty(0, np.int64))
                else:
                    # merges seq-tagged base+delta groups (latest-wins
                    # tombstones); with no deltas this is one seq-0 decode
                    decoded[t] = _merged_tf_range(tb, t_ids, t_maxseq, lo, hi)
            return decoded[t]

        out_rows = []
        for qid, terms in bc_queries.value.items():
            by_df = bm25.term_order(terms, dfs_g)
            cand = None
            for t in by_df:
                ids, _tfv = term_arrays(t)
                cand = ids if cand is None else cand[
                    bm25.sorted_member_mask(cand, ids)
                ]
                if cand.size == 0:
                    break
            if cand is None or cand.size == 0:
                continue
            dl = lens[cand]
            scores = np.zeros(cand.size, dtype=np.float64)
            for t in by_df:
                ids, tfv = term_arrays(t)
                pos = np.searchsorted(ids, cand)
                scores += bm25.idf(n_docs, dfs_g[t]) * bm25.tf_norm(
                    tfv[pos], dl, avgdl
                )
            sa = (search_after or {}).get(qid)
            if sa is not None:
                # ES deep-pagination cursor: one mask over this range's
                # scored candidates; range_total stays cursor-independent
                s0, d0 = sa
                keep_sa = (scores < s0) | ((scores == s0) & (cand > d0))
                cand_k, scores_k = cand[keep_sa], scores[keep_sa]
                if cand_k.size == 0:
                    # totals-carrier sentinel (filtered out of the ranking
                    # on the driver): a cursor-emptied range must still
                    # report its candidate count
                    out_rows.append(
                        (qid, int(lo), float("-inf"), int(cand.size))
                    )
                    continue
            else:
                cand_k, scores_k = cand, scores
            top = bm25.topk_order(scores_k, cand_k, k)
            for i in top:
                out_rows.append(
                    (qid, int(cand_k[i]), float(scores_k[i]), int(cand.size))
                )
        return pd.DataFrame(
            out_rows, columns=["query_id", "doc_id", "score", "range_total"]
        )

    parts = (
        fanned.groupBy("range_ix")
        .applyInPandas(
            run_range,
            "query_id string, doc_id long, score double, range_total long",
        )
        .toPandas()
    )

    frames = []
    for qid, _ in queries:
        sub = parts[parts["query_id"] == qid]
        if len(sub):
            # each surviving range reports its candidate count once per row;
            # per-range first-row values sum to the exact global total
            totals[qid] = int(
                sub.drop_duplicates("doc_id")
                .groupby(sub["doc_id"] // step)["range_total"]
                .first()
                .sum()
            )
        sub = sub[np.isfinite(sub["score"])]  # drop totals-carrier sentinels
        sub = sub.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        sub.insert(1, "rank", np.arange(1, len(sub) + 1))
        frames.append(sub[["query_id", "rank", "doc_id", "score"]])
    return (
        pd.concat(frames, ignore_index=True) if frames else empty
    ), totals
