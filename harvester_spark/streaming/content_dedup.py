"""Streaming content dedup: drop a webhook push whose TEXT already lives in
the corpus under a different key — the seen-content filter every web-crawl
ingest runs (the batch analogue is operators/dedup.dedup_exact; this is its
incremental twin on the ingest seam).

Semantics are EXACT current-content dedup, not append-only "seen once ever":
a push is dropped iff some *active* document with a *different* srn holds
byte-identical text RIGHT NOW. Content whose holder was deleted or updated
away is ingestable again (regression-tested).

Scale design — bounded probe + point verify, never a corpus scan:

1. A ``content_digests/`` parquet sidecar next to the index maps
   text digest → doc_id, hash-partitioned by the digest's first two hex
   chars (``dp``, 256 partitions). Batches read ONLY the partitions their
   digests land in (partition pruning — the dict_probe pattern).
2. Sidecar hits are CANDIDATES, not verdicts: the sidecar is append-only
   between compactions, so rows can be stale (doc updated away from that
   text, or deleted). Every candidate is verified against the CURRENT
   documents table by doc_id point lookup (pyarrow row-group pruning — the
   fetch_documents pattern): drop only if the doc is still active, still
   holds the digest, and its srn differs from the push's.
3. New digests append after the batch promotes (a crash in between loses
   digest rows — future duplicates possible, false drops never); the
   ingest loop's compaction trigger rebuilds the sidecar from the merged
   table, GC'ing stale rows and re-bounding the file count.

Within one batch, pushes with identical text collapse to the smallest srn
(deterministic; mirrors dedup_exact's min-doc_id canonical).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DIGESTS_DIR = "content_digests"


def _text_digest(col: F.Column) -> F.Column:
    return F.sha1(col)


def digests_dir(index_dir: str) -> str:
    return os.path.join(index_dir, DIGESTS_DIR)


def _with_dp(df: DataFrame) -> DataFrame:
    return df.withColumn("dp", F.substring("dig", 1, 2))


def build_digest_table(spark: SparkSession, documents: DataFrame, index_dir: str) -> None:
    """(Re)build the sidecar from a documents table — bootstrap on first
    enable, and the compaction-time GC of stale rows."""
    rows = (
        documents.filter(F.col("state") == "active")
        .select(_text_digest(F.col("text")).alias("dig"), "doc_id")
    )
    _with_dp(rows).write.mode("overwrite").partitionBy("dp").parquet(
        digests_dir(index_dir)
    )


def ensure_digest_table(spark: SparkSession, documents: DataFrame, index_dir: str) -> None:
    d = digests_dir(index_dir)
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        build_digest_table(spark, documents, index_dir)


def append_digests(spark: SparkSession, fresh_docs: DataFrame, index_dir: str) -> None:
    """Register the batch's surviving new/updated docs. Append-only: stale
    rows (superseded digests) are tolerated by verification and GC'd at
    compaction. Idempotent under batch replay (duplicate rows collapse in
    the probe's semi-join semantics)."""
    rows = (
        fresh_docs.filter(F.col("state") == "active")
        .select(_text_digest(F.col("text")).alias("dig"), "doc_id")
    )
    _with_dp(rows).write.mode("append").partitionBy("dp").parquet(
        digests_dir(index_dir)
    )


def filter_seen_content(
    spark: SparkSession,
    delta: DataFrame,
    documents_dir: str | list[str],
    index_dir: str,
) -> DataFrame:
    """Normalized batch (one row per srn) → batch minus content duplicates.

    Deletes always pass through (a tombstone carries no content). The batch
    side is webhook-sized — it is collected once for the probe and the
    verification is driver-side point lookups, mirroring the serving path's
    bounded suggestion probes. The caller owns ``delta``'s cache lifetime
    (it is consumed twice: the probe collect and the downstream merge).
    """
    pushes = [
        (r["srn"], r["dig"])
        for r in delta.filter(~F.col("is_delete"))
        .select("srn", _text_digest(F.col("text")).alias("dig"))
        .collect()
    ]
    drop_srns = _in_batch_losers(pushes)
    survivors = {(s, d) for s, d in pushes if s not in drop_srns}
    drop_srns |= _seen_in_base(spark, survivors, documents_dir, index_dir)
    if not drop_srns:
        return delta
    return delta.filter(~F.col("srn").isin(list(drop_srns)))


def _in_batch_losers(pushes: list[tuple[str, str]]) -> set[str]:
    """srns losing the in-batch same-text race (keep the smallest srn)."""
    best: dict[str, str] = {}
    for srn, dig in pushes:
        if dig not in best or srn < best[dig]:
            best[dig] = srn
    return {srn for srn, dig in pushes if best[dig] != srn}


def _seen_in_base(
    spark: SparkSession,
    pushes: set[tuple[str, str]],
    documents_dir: str | list[str],
    index_dir: str,
) -> set[str]:
    if not pushes:
        return set()
    digs = sorted({d for _, d in pushes})
    prefixes = sorted({d[:2] for d in digs})
    ddir = digests_dir(index_dir)
    # bounded probe: only the partitions the batch's digests hash into
    side = (
        spark.read.parquet(ddir)
        .filter(F.col("dp").isin(prefixes) & F.col("dig").isin(digs))
        .select("dig", "doc_id")
        .distinct()
        .collect()
    )
    if not side:
        return set()
    cand_ids = sorted({int(r["doc_id"]) for r in side})
    live = _fetch_live(spark, documents_dir, cand_ids)
    # digest → set of srns that currently hold it (verified live)
    holders: dict[str, set[str]] = {}
    for r in side:
        doc = live.get(int(r["doc_id"]))
        if doc is None:
            continue  # stale sidecar row (doc gone)
        srn, state, dig_now = doc
        if state == "active" and dig_now == r["dig"]:
            holders.setdefault(r["dig"], set()).add(srn)
    dropped = set()
    for srn, dig in pushes:
        held_by = holders.get(dig, set())
        if held_by - {srn}:  # someone ELSE already holds this exact text
            dropped.add(srn)
    return dropped


def _fetch_live(
    spark: SparkSession, documents_dir: str | list[str], doc_ids: list[int]
):
    """doc_id → (srn, state, text_digest) point lookups over the CURRENT
    documents (row-group statistics prune; docs are docID-ordered).

    ``documents_dir`` may be an overlay CHAIN (newest first, from
    ``IndexCatalog.document_dirs``): each dir is probed in precedence
    order and the first hit per doc_id wins — still bounded point lookups,
    never a corpus scan."""
    import hashlib

    dirs = [documents_dir] if isinstance(documents_dir, str) else list(documents_dir)
    out: dict[int, tuple] = {}
    remaining = list(doc_ids)
    for d in dirs:
        if not remaining:
            break
        try:
            import pyarrow.dataset as ds

            t = ds.dataset(d, format="parquet").to_table(
                columns=["doc_id", "srn", "state", "text"],
                filter=ds.field("doc_id").isin(remaining),
            )
            rows = t.to_pylist()
        except Exception:
            rows = [
                r.asDict()
                for r in spark.read.parquet(d)
                .filter(F.col("doc_id").isin(remaining))
                .select("doc_id", "srn", "state", "text")
                .collect()
            ]
        for r in rows:
            did = int(r["doc_id"])
            if did not in out:
                out[did] = (
                    r["srn"],
                    r["state"],
                    hashlib.sha1((r["text"] or "").encode("utf-8")).hexdigest(),
                )
        remaining = [i for i in remaining if i not in out]
    return out
