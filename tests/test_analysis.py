"""Analyzer-chain parity: Python spec == pandas batch == Spark JVM == DuckDB."""

import duckdb
import pandas as pd

from harvester_spark.analysis import (
    DUCKDB_TOKENS_EXPR,
    normalize_lang,
    normalize_lang_value,
    tokenize,
    tokenize_series,
    tokens_column,
)

SAMPLES = [
    "Hello, World!",
    "a  b\tc\nd",
    "under_score stays one-token-not",
    "MiXeD CaSe 123 x9",
    "",
    "   ",
    "trailing punct...",
    "w00001 w00002 term_42",
]


def test_tokenize_spec():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("under_score x") == ["under_score", "x"]
    assert tokenize("a-b c.d") == ["a", "b", "c", "d"]
    assert tokenize("") == []
    assert tokenize("...") == []


def test_series_matches_scalar():
    out = tokenize_series(pd.Series(SAMPLES))
    assert [list(x) for x in out] == [tokenize(s) for s in SAMPLES]


def test_spark_tokens_match_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
    got = [r["toks"] for r in df.select(tokens_column(F.col("text")).alias("toks")).collect()]
    assert got == [tokenize(s) for s in SAMPLES]


def test_duckdb_tokens_match_python():
    con = duckdb.connect()
    expr = DUCKDB_TOKENS_EXPR.format(col="text")
    got = con.execute(
        f"select {expr} as toks from (select unnest(?) as text)", [SAMPLES]
    ).fetchall()
    assert [g[0] for g in got] == [tokenize(s) for s in SAMPLES]


def test_normalize_lang(spark):
    from pyspark.sql import functions as F

    cases = [("en", "en"), ("EN", "en"), ("nl", "nl"), ("nl-NL", "nl"),
             ("fr", "unk"), ("", "unk"), (None, "unk"), ("english", "en")]
    assert [normalize_lang_value(c) for c, _ in cases] == [e for _, e in cases]
    df = spark.createDataFrame([(c,) for c, _ in cases], "lang string")
    got = [r["l"] for r in df.select(normalize_lang(F.col("lang")).alias("l")).collect()]
    assert got == [e for _, e in cases]
