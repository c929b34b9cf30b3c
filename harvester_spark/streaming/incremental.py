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
    """Append delta blocks + tombstones; rewrite the small stats tables.

    doc_stats / corpus_stats are recomputed exactly from the merged documents
    (they are tiny relative to postings), so scoring stats equal a rebuild.
    """
    active = merged_documents.filter(F.col("state") == "active")
    active.select("doc_id", "lang", "doc_len").write.mode("overwrite").parquet(
        f"{index_dir}/doc_stats"
    )
    doc_stats = spark.read.parquet(f"{index_dir}/doc_stats")
    compute_corpus_stats(doc_stats).write.mode("overwrite").parquet(
        f"{index_dir}/corpus_stats"
    )
    avgdl = {
        r["lang"]: float(r["avgdl"])
        for r in spark.read.parquet(f"{index_dir}/corpus_stats").collect()
    }
    rows = postings_rows(fresh_docs.select("doc_id", "text", "lang", "doc_len"))
    encode_postings(rows, avgdl).write.mode("overwrite").partitionBy("lang").parquet(
        f"{index_dir}/postings_delta/delta={delta_name}"
    )
    tombstones.write.mode("overwrite").parquet(
        f"{index_dir}/tombstones/{delta_name}"
    )


class DeltaSearcher(IndexSearcher):
    """Searches base ∪ delta postings minus tombstones, bit-identical to a
    full rebuild: df comes from the decoded+filtered postings (so term
    accumulation order matches) and stats from the refreshed tables."""

    def __init__(self, spark: SparkSession, index_dir: str):
        super().__init__(spark, index_dir)
        self._tombstones: np.ndarray | None = None
        delta_root = f"{index_dir}/postings_delta"
        # delta dirs are written partition-style (delta=<name>/lang=<l>), so
        # plain partition discovery keeps the lang column
        self._delta = (
            spark.read.option("basePath", delta_root).parquet(delta_root).drop("delta")
            if os.path.isdir(delta_root)
            else None
        )
        tomb_root = f"{index_dir}/tombstones"
        if os.path.isdir(tomb_root):
            pdf = (
                spark.read.option("recursiveFileLookup", "true")
                .parquet(tomb_root)
                .toPandas()
            )
            self._tombstones = np.sort(pdf["doc_id"].to_numpy(dtype=np.int64))
        else:
            self._tombstones = np.empty(0, dtype=np.int64)

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
                "term", "base_doc_id", "n", "doc_deltas", "tfs",
                "impact_lang", "impact_all"
            ).toPandas()

        per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        dfs: dict[str, int] = {}
        for t in terms:
            tb = base_blocks[base_blocks["term"] == t]
            ids, tfv = self._decode_term(tb)
            if self._tombstones.size:
                keep = ~np.isin(ids, self._tombstones, assume_unique=True)
                ids, tfv = ids[keep], tfv[keep]
            if delta_blocks is not None:
                dt = delta_blocks[delta_blocks["term"] == t]
                d_ids, d_tfv = self._decode_term(dt)
                if d_ids.size:
                    ids = np.concatenate([ids, d_ids])
                    tfv = np.concatenate([tfv, d_tfv])
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
                np.isin(candidates, ids, assume_unique=True)
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
            keep = np.isin(candidates, allowed_doc_ids)
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
