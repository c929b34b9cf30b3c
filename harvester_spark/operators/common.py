"""Shared helpers for operator-library queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from harvester_spark.analysis import tokens_column

# DuckDB-side tokenizer expression (same chain as tokens_column / tokenize).
SQL_TOKS = "list_filter(string_split_regex(lower({col}), '\\W+'), t -> t <> '')"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, lang, term, pos) exploded token stream."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.posexplode(tokens_column(F.col("text"))).alias("pos", "term"),
    )


# Zip-unnest gives (term, 0-based pos) pairs, matching Spark's posexplode.
SQL_DOC_TOKS = f"""
    SELECT doc_id, lang, term, pos
    FROM (
        SELECT doc_id, lang,
               unnest({SQL_TOKS.format(col='text')}) AS term,
               unnest(range(len({SQL_TOKS.format(col='text')}))) AS pos
        FROM documents
    )
"""


def cents(col: str) -> F.Column:
    """Exact integer cents from a double column (bit-identical per row)."""
    return F.round(F.col(col) * 100).cast("long")


def sql_cents(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"
