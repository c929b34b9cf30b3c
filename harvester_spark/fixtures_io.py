"""S9 fixture dump/load — JSON round-trip of engine tables.

The reference dumps/loads harvester tables as JSON fixtures
(/root/reference/harvester/harvester/management/commands/dump_harvester_data.py,
load_harvester_data.py). Spark equivalent: schema-preserving ``df.write.json``
plus a sidecar schema file so the load needs no inference (binary columns are
base64 via a hex sidecar transform — Spark's JSON writer doesn't round-trip
binary, so those columns are hex-encoded on dump and decoded on load).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def dump_table(df: DataFrame, path: str) -> None:
    schema = df.schema
    out = df
    for f in schema.fields:
        if isinstance(f.dataType, T.BinaryType):
            out = out.withColumn(f.name, F.hex(F.col(f.name)))
    out.write.mode("overwrite").json(path)
    with open(os.path.join(path, "_schema.json"), "w") as fh:
        fh.write(json.dumps(json.loads(schema.json())))


def load_table(spark: SparkSession, path: str) -> DataFrame:
    with open(os.path.join(path, "_schema.json")) as fh:
        schema = T.StructType.fromJson(json.load(fh))
    read_schema = T.StructType(
        [
            T.StructField(f.name, T.StringType() if isinstance(f.dataType, T.BinaryType) else f.dataType, f.nullable)
            for f in schema.fields
        ]
    )
    df = spark.read.schema(read_schema).json(path)
    for f in schema.fields:
        if isinstance(f.dataType, T.BinaryType):
            df = df.withColumn(f.name, F.unhex(F.col(f.name)))
    return df
