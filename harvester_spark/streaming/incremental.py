"""Incremental updates: merge-on-srn, delta postings, tombstones.

Mirrors the reference's incremental machinery (SURVEY.md §2.10):

- content-hash guarded upsert — only documents whose canonical payload hash
  changed are rewritten (/root/reference/harvester/core/models/datatypes/
  document.py:89-94,133-139),
- soft deletes: ``deleted_at`` set, state flips to ``deleted``
  (core/models/datatypes/set.py:69-85; delete docs by srn
  document.py:195-201),
- the index is updated by APPENDING a delta: freshly-encoded blocks for
  new/changed docs plus a tombstone set for superseded docIDs; queries read
  base ∪ delta minus tombstones. Correctness contract (tested):
  **base ∪ delta answers == full-rebuild answers, bit-for-bit** — achieved
  by recomputing corpus stats exactly from the merged doc_stats and by
  deriving per-term df from the decoded, tombstone-filtered postings at
  query time (so the BM25 accumulation order matches a rebuild).

At cluster scale the merge is an Iceberg ``MERGE INTO`` on srn and the delta
append an atomic snapshot commit; locally: full-outer-join copy-on-write +
parquet append dirs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.extract import with_extracted_text
from harvester_spark.index.build import compute_corpus_stats, encode_postings, postings_rows
from harvester_spark.index.codec import decode_blocks_batch
from harvester_spark.normalize import normalize_documents
from harvester_spark.search import bm25
from harvester_spark.search.engine import IndexSearcher, SearchResult


def normalize_delta(delta_corpus: DataFrame) -> DataFrame:
    """Delta corpus (url, warc_ts, html, lang[, deleted]) → normalized docs.

    ``deleted = true`` rows are tombstone seeds (url identifies the doc).
    """
    has_deleted = "deleted" in delta_corpus.columns
    extracted = with_extracted_text(
        delta_corpus.drop("text") if "text" in delta_corpus.columns else delta_corpus,
        "html",
        "text",
    )
    docs = normalize_documents(extracted)
    if has_deleted:
        # normalize projects a fixed schema; re-attach the tombstone flag by url
        docs = docs.join(delta_corpus.select("url", "deleted"), "url", "left")
        docs = docs.withColumn("is_delete", F.coalesce(F.col("deleted"), F.lit(False))).drop("deleted")
    else:
        docs = docs.withColumn("is_delete", F.lit(False))
    return docs


def merge_documents(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Hash-guarded MERGE on srn → the new documents table.

    - matching srn, same content_hash → keep base row untouched,
    - matching srn, new hash → take delta payload, keep base doc_id,
      bump modified_at,
    - delta-only srn → insert with a fresh dense doc_id (continuing after
      ``max(base.doc_id)`` in (set_name, srn) order — monotonic+offset over
      the insert set),
    - delete marker → keep base row with state='deleted', deleted_at set.
    """
    spark = base.sparkSession
    d = delta.select(
        F.col("srn").alias("d_srn"),
        F.col("set_name").alias("d_set_name"),
        F.col("url").alias("d_url"),
        F.col("warc_ts").alias("d_warc_ts"),
        F.col("text").alias("d_text"),
        F.col("lang").alias("d_lang"),
        F.col("content_hash").alias("d_hash"),
        F.col("modified_at").alias("d_modified_at"),
        F.col("publisher_date").alias("d_publisher_date"),
        F.col("doc_len").alias("d_doc_len"),
        "is_delete",
    )
    joined = base.join(d, base.srn == d.d_srn, "full_outer")

    is_insert = F.col("srn").isNull()
    is_delete = F.coalesce(F.col("is_delete"), F.lit(False))
    is_update = (~is_insert) & F.col("d_srn").isNotNull() & (~is_delete) & (
        F.col("content_hash") != F.col("d_hash")
    )

    def pick(b: str, dcol: str):
        return F.when(is_insert | is_update, F.col(dcol)).otherwise(F.col(b))

    merged = joined.select(
        F.coalesce(F.col("srn"), F.col("d_srn")).alias("srn"),
        F.coalesce(F.col("set_name"), F.col("d_set_name")).alias("set_name"),
        pick("url", "d_url").alias("url"),
        pick("warc_ts", "d_warc_ts").alias("warc_ts"),
        pick("text", "d_text").alias("text"),
        pick("lang", "d_lang").alias("lang"),
        F.when(is_delete, F.lit("deleted"))
        .when(is_insert, F.lit("active"))
        .otherwise(F.col("state"))
        .alias("state"),
        pick("content_hash", "d_hash").alias("content_hash"),
        F.coalesce(F.col("created_at"), F.col("d_modified_at")).alias("created_at"),
        F.when(is_insert | is_update, F.col("d_modified_at"))
        .otherwise(F.col("modified_at"))
        .alias("modified_at"),
        F.when(is_delete, F.col("d_modified_at")).otherwise(F.col("deleted_at")).alias("deleted_at"),
        pick("publisher_date", "d_publisher_date").alias("publisher_date"),
        pick("doc_len", "d_doc_len").alias("doc_len"),
        F.col("doc_id"),
        is_insert.alias("_is_insert"),
        (is_update | is_delete).alias("_is_changed"),
    )

    max_id = base.agg(F.max("doc_id")).collect()[0][0]
    max_id = -1 if max_id is None else int(max_id)
    inserts = merged.filter(F.col("_is_insert"))
    # dense ids for inserts: rank in (set_name, srn) order after max_id —
    # insert sets are small, a window rank is the monotonic+offset scheme
    # with a single partition offset
    from pyspark.sql import Window as W

    w = W.orderBy("set_name", "srn")
    inserts = inserts.withColumn(
        "doc_id", (F.row_number().over(w) + F.lit(max_id)).cast("long")
    )
    out = merged.filter(~F.col("_is_insert")).unionByName(inserts)
    return out.drop("_is_insert", "_is_changed")


def changed_and_deleted(base: DataFrame, merged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(docs needing re-index, tombstoned docIDs) between base and merged."""
    b = base.select("srn", F.col("content_hash").alias("b_hash"), F.col("state").alias("b_state"))
    j = merged.join(b, "srn", "left")
    fresh = j.filter(
        (F.col("b_hash").isNull())  # inserts
        | ((F.col("content_hash") != F.col("b_hash")) & (F.col("state") == "active"))
    ).select(merged.columns)
    tombstones = j.filter(
        (F.col("b_hash").isNotNull())
        & (
            ((F.col("content_hash") != F.col("b_hash")) & (F.col("state") == "active"))
            | ((F.col("state") == "deleted") & (F.col("b_state") == "active"))
        )
    ).select("doc_id")
    return fresh, tombstones


def apply_index_delta(
    spark: SparkSession,
    index_dir: str,
    merged_documents: DataFrame,
    fresh_docs: DataFrame,
    tombstones: DataFrame,
    delta_name: str = "delta-1",
) -> None:
    """Append delta blocks + tombstones; publish atomically via manifest.

    All new state — refreshed doc_stats/corpus_stats (recomputed exactly from
    the merged documents, tiny relative to postings), the delta's postings
    blocks, and its tombstone set — is STAGED under new paths and published
    with a single ``os.replace`` of ``delta_state.json`` as the last step
    (the IndexCatalog pattern). A searcher opened mid-apply or after a crash
    sees the previous consistent snapshot, never refreshed n_docs/avgdl with
    missing tombstones.

    Deltas are SEQUENCED: the manifest orders them, and each tombstone set
    carries the delta's ordinal. A tombstone recorded at seq N invalidates
    the doc's postings in base (seq 0) and in every delta with seq < N —
    update-then-update and update-then-delete across micro-batches fold to
    latest-wins (the stacked-delta contract: base ∪ deltas == rebuild).
    """
    import json

    from harvester_spark.search.engine import read_delta_state

    state = read_delta_state(index_dir) or {"seq": 0, "deltas": [], "stats_dir": None}
    seq = int(state["seq"]) + 1

    stats_dir = f"stats/v{seq:06d}"
    active = merged_documents.filter(F.col("state") == "active")
    active.select("doc_id", "lang", "doc_len").write.mode("overwrite").parquet(
        f"{index_dir}/{stats_dir}/doc_stats"
    )
    doc_stats = spark.read.parquet(f"{index_dir}/{stats_dir}/doc_stats")
    compute_corpus_stats(doc_stats).write.mode("overwrite").parquet(
        f"{index_dir}/{stats_dir}/corpus_stats"
    )
    avgdl = {
        r["lang"]: float(r["avgdl"])
        for r in spark.read.parquet(f"{index_dir}/{stats_dir}/corpus_stats").collect()
    }
    rows = postings_rows(fresh_docs.select("doc_id", "text", "lang", "doc_len"))
    encode_postings(rows, avgdl).write.mode("overwrite").partitionBy("lang").parquet(
        f"{index_dir}/postings_delta/delta={delta_name}"
    )
    tombstones.select(
        F.col("doc_id").cast("long"), F.lit(seq).cast("long").alias("seq")
    ).write.mode("overwrite").parquet(f"{index_dir}/tombstones/{delta_name}")

    new_state = {
        "seq": seq,
        "deltas": state["deltas"] + [{"name": delta_name, "seq": seq}],
        "stats_dir": stats_dir,
    }
    tmp = os.path.join(index_dir, "delta_state.json.tmp")
    with open(tmp, "w") as f:
        json.dump(new_state, f)
    os.replace(tmp, os.path.join(index_dir, "delta_state.json"))  # atomic publish


class DeltaSearcher(IndexSearcher):
    """Searches base ∪ delta postings minus tombstones, bit-identical to a
    full rebuild: df comes from the decoded+filtered postings (so term
    accumulation order matches) and stats from the refreshed tables."""

    def __init__(self, spark: SparkSession, index_dir: str):
        from harvester_spark.search.engine import read_delta_state

        super().__init__(spark, index_dir)
        state = read_delta_state(index_dir)
        deltas = list(state["deltas"]) if state else []
        self._delta_seq = {d["name"]: int(d["seq"]) for d in deltas}

        # Only manifest-LISTED deltas are read (a crash can leave staged but
        # unpublished delta dirs on disk); delta dirs are partition-style
        # (delta=<name>/lang=<l>), so a basePath read keeps both columns.
        delta_root = f"{index_dir}/postings_delta"
        self._delta = None
        if deltas:
            paths = [f"{delta_root}/delta={d['name']}" for d in deltas]
            self._delta = spark.read.option("basePath", delta_root).parquet(*paths)

        # Tombstones carry the recording delta's seq: a tombstone at seq N
        # kills the doc's postings in base (seq 0) and every delta < N.
        # Fold to per-doc MAX seq; a posting at seq s survives iff
        # tomb_max_seq(doc) <= s.
        self._tomb_ids = np.empty(0, dtype=np.int64)
        self._tomb_maxseq = np.empty(0, dtype=np.int64)
        if deltas:
            paths = [f"{index_dir}/tombstones/{d['name']}" for d in deltas]
            pdf = spark.read.parquet(*paths).toPandas()
            if len(pdf):
                folded = pdf.groupby("doc_id")["seq"].max().sort_index()
                self._tomb_ids = folded.index.to_numpy(dtype=np.int64)
                self._tomb_maxseq = folded.to_numpy(dtype=np.int64)

    def _filter_tombstoned(
        self, ids: np.ndarray, tfv: np.ndarray, seq: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Drop postings superseded by a tombstone recorded AFTER ``seq``."""
        if self._tomb_ids.size == 0 or ids.size == 0:
            return ids, tfv
        pos = np.searchsorted(self._tomb_ids, ids)
        pos_c = np.minimum(pos, self._tomb_ids.size - 1)
        dead = (self._tomb_ids[pos_c] == ids) & (self._tomb_maxseq[pos_c] > seq)
        if dead.any():
            return ids[~dead], tfv[~dead]
        return ids, tfv

    def _decode_term(self, blocks: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        if len(blocks) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ids, tfv = decode_blocks_batch(
            blocks["base_doc_id"].to_numpy(),
            blocks["n"].to_numpy(),
            [bytes(b) for b in blocks["doc_deltas"]],
            [bytes(b) for b in blocks["tfs"]],
        )
        order = np.argsort(ids, kind="stable")
        return ids[order], tfv[order]

    def search(
        self,
        query_text: str,
        k: int = 10,
        lang: str = ALL_LANG,
        allowed_doc_ids: np.ndarray | None = None,
        page: int = 1,
    ) -> SearchResult:
        terms = sorted(set(tokenize(query_text)))
        empty = pd.DataFrame(columns=["rank", "doc_id", "score"])
        if not terms:
            return SearchResult(query_text, lang, empty, 0)

        base_blocks = self._term_postings(terms, lang)
        delta_blocks = None
        if self._delta is not None:
            d = self._delta.filter(F.col("term").isin(terms))
            if lang != ALL_LANG:
                d = d.filter(F.col("lang") == lang)
            delta_blocks = d.select(
                "delta", "term", "base_doc_id", "n", "doc_deltas", "tfs",
                "impact_lang", "impact_all"
            ).toPandas()

        # deltas applied in ascending seq order, each filtered by tombstones
        # recorded AFTER it — stacked updates/deletes fold to latest-wins
        delta_order = sorted(self._delta_seq, key=self._delta_seq.get)
        per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        dfs: dict[str, int] = {}
        for t in terms:
            tb = base_blocks[base_blocks["term"] == t]
            ids, tfv = self._decode_term(tb)
            ids, tfv = self._filter_tombstoned(ids, tfv, seq=0)
            if delta_blocks is not None:
                parts_ids, parts_tfv = [ids], [tfv]
                for name in delta_order:
                    dt = delta_blocks[
                        (delta_blocks["term"] == t) & (delta_blocks["delta"] == name)
                    ]
                    d_ids, d_tfv = self._decode_term(dt)
                    d_ids, d_tfv = self._filter_tombstoned(
                        d_ids, d_tfv, seq=self._delta_seq[name]
                    )
                    if d_ids.size:
                        parts_ids.append(d_ids)
                        parts_tfv.append(d_tfv)
                if len(parts_ids) > 1:
                    ids = np.concatenate(parts_ids)
                    tfv = np.concatenate(parts_tfv)
                    order = np.argsort(ids, kind="stable")
                    ids, tfv = ids[order], tfv[order]
            per_term[t] = (ids, tfv)
            dfs[t] = int(ids.size)
        if any(dfs[t] == 0 for t in terms):
            return SearchResult(query_text, lang, empty, 0)

        candidates: np.ndarray | None = None
        for t in bm25.term_order(terms, dfs):
            ids = per_term[t][0]
            candidates = ids if candidates is None else candidates[
                bm25.sorted_member_mask(candidates, ids)
            ]
            if candidates.size == 0:
                return SearchResult(query_text, lang, empty, 0)

        n_docs, avgdl = self._corpus_stats[lang]
        dl = self._doc_lens()[candidates]
        scores = np.zeros(candidates.size, dtype=np.float64)
        for t in bm25.term_order(terms, dfs):
            ids, tfv = per_term[t]
            pos = np.searchsorted(ids, candidates)
            scores += bm25.idf(n_docs, dfs[t]) * bm25.tf_norm(tfv[pos], dl, avgdl)

        if allowed_doc_ids is not None:
            from harvester_spark.search.allowed import allowed_filter_mask

            keep = allowed_filter_mask(allowed_doc_ids, candidates)
            candidates, scores = candidates[keep], scores[keep]
        total = int(candidates.size)
        take = page * k
        top = bm25.topk_order(scores, candidates, take)[(page - 1) * k :]
        topk = pd.DataFrame(
            {
                "rank": np.arange((page - 1) * k + 1, (page - 1) * k + 1 + len(top)),
                "doc_id": candidates[top].astype(np.int64),
                "score": scores[top],
            }
        )
        return SearchResult(query_text, lang, topk, total)
