"""S9 fixture dump/load round-trip (including binary columns)."""

import os

from harvester_spark.corpus import generate_corpus
from harvester_spark.fixtures_io import dump_table, load_table


def test_json_roundtrip_with_binary(spark, tmp_root):
    df = generate_corpus(spark, 40, num_partitions=2)
    path = os.path.join(tmp_root, "fixture_corpus")
    dump_table(df, path)
    back = load_table(spark, path)
    assert back.schema == df.schema
    a = df.orderBy("url").toPandas()
    b = back.orderBy("url").toPandas()
    assert (a["text"] == b["text"]).all()
    assert (a["html"].map(bytes) == b["html"].map(bytes)).all()
    assert list(a["warc_ts"]) == list(b["warc_ts"])
