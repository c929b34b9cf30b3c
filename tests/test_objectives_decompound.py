"""Extraction-objective compiler + Dutch decompounder tests."""

import json

from harvester_spark.decompound import decompound_token, decompound_tokens_column
from harvester_spark.objectives import compile_objective, extract_seeds


def _pages(spark):
    pages = [
        {
            "data": [
                {"id": "r1", "attributes": {"title": "First Title", "email": "A@X.COM"}},
                {"id": "r2", "attributes": {"title": "Second", "email": "b@y.com"}},
            ]
        },
        {"data": [{"id": "r3", "attributes": {"title": "Third", "email": None}}]},
    ]
    return spark.createDataFrame([(json.dumps(p),) for p in pages], "payload string")


OBJECTIVE = {
    "@": "$.data",
    "external_id": "$.id",
    "title": "$.attributes.title",
    # callable rule → pandas stage (lower-cased email, None-safe)
    "email": lambda node: (node["attributes"]["email"] or "").lower() or None,
}


def test_extract_seeds(spark):
    out = extract_seeds(_pages(spark), OBJECTIVE).orderBy("external_id").collect()
    assert [r["external_id"] for r in out] == ["r1", "r2", "r3"]
    assert [r["title"] for r in out] == ["First Title", "Second", "Third"]
    assert [r["email"] for r in out] == ["a@x.com", "b@y.com", None]


def test_compile_objective_literal_and_path():
    cols, calls = compile_objective({"a": "$.x", "b": "fixed", "c": lambda n: 1})
    assert len(cols) == 2 and set(calls) == {"c"}


WORDS = frozenset({"fiets", "band", "winkel", "boek", "handel"})


def test_decompound_pure():
    assert decompound_token("fietsband", WORDS) == ["fietsband", "fiets", "band"]
    assert decompound_token("boekhandel", WORDS) == ["boekhandel", "boek", "handel"]
    # partial cover -> no split
    assert decompound_token("fietsxyz", WORDS) == ["fietsxyz"]
    # short token untouched
    assert decompound_token("de", WORDS) == ["de"]
    # three-part compounds
    assert decompound_token("fietsbandwinkel", WORDS) == [
        "fietsbandwinkel", "fiets", "band", "winkel",
    ]


def test_decompound_column(spark):
    from pyspark.sql import functions as F

    bc = spark.sparkContext.broadcast(WORDS)
    df = spark.createDataFrame(
        [(["fietsband", "de", "boekhandel"],)], "toks array<string>"
    )
    out = df.select(decompound_tokens_column(F.col("toks"), bc).alias("d")).collect()
    assert out[0]["d"] == [
        "fietsband", "fiets", "band", "de", "boekhandel", "boek", "handel",
    ]
