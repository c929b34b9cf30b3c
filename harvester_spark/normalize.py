"""Corpus → normalized ``documents`` table.

Maps the reference's Document build semantics onto columns:

- ``srn`` identity ``{set}:{sha1(url)}`` —
  /root/reference/harvester/core/models/datatypes/document.py:58-60 and
  files/sources/sharekit.py:79-86 (sha1-of-url external ids),
- ``content_hash`` = sha1 of canonical JSON of the payload —
  document.py:133-138 (sort_keys canonicalization becomes a fixed
  ``struct`` field order),
- lifecycle timestamps ``created_at/modified_at/deleted_at`` — document.py:20-28,
- ``state`` enum active|deleted|inactive|skipped — document.py:40-44,
- ``lang`` normalized to {en,nl,unk} — core/utils/analyzers.py:6-14,
- ``publisher_date`` — drives range-filter and recency-boost semantics
  (search/views/document.py:83-88),
- ``doc_len`` — token count, the BM25 length norm input.

Everything is built-in column expressions (whole-stage codegen); the only
Python in the pipeline is the upstream extractor UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from harvester_spark.analysis import doc_len_column, normalize_lang

DOC_STATES = ("active", "deleted", "inactive", "skipped")


def normalize_documents(corpus: DataFrame) -> DataFrame:
    """corpus(url, warc_ts, html, text, lang) → documents table (no doc_id yet).

    ``doc_ix`` is recovered from the deterministic url scheme to derive
    ``publisher_date`` (FIXTURES.md §2); on a real crawl it would come from
    source metadata.
    """
    doc_ix = F.regexp_extract("url", r"/(\d{8})$", 1).cast("long")
    set_name = F.regexp_extract("url", r"^https?://[^/]+/([^/]+)/", 1)
    return (
        corpus.withColumn("set_name", set_name)
        .withColumn("srn", F.concat_ws(":", F.col("set_name"), F.sha1(F.col("url"))))
        .withColumn("lang", normalize_lang(F.col("lang")))
        .withColumn(
            "content_hash",
            F.sha1(F.to_json(F.struct(F.col("lang"), F.col("text"), F.col("url")))),
        )
        .withColumn("state", F.lit("active"))
        .withColumn("created_at", F.col("warc_ts"))
        .withColumn("modified_at", F.col("warc_ts"))
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
        .withColumn("publisher_date", F.date_add(F.lit("1970-01-01").cast("date"), (doc_ix % 20000).cast("int")))
        .withColumn("doc_len", doc_len_column(F.col("text")))
        .select(
            "srn",
            "set_name",
            "url",
            "warc_ts",
            "text",
            "lang",
            "state",
            "content_hash",
            "created_at",
            "modified_at",
            "deleted_at",
            "publisher_date",
            "doc_len",
        )
    )
