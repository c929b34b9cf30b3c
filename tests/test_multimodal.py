"""Multimodal plumbing: stubbed codec stage + byte-level frame ops."""

import pytest
from pyspark.sql import functions as F

from harvester_spark.operators.multimodal import (
    FRAME_SIZE,
    decode_media,
    media_table,
    mm_frame_sample,
)

SF = "/root/testdata/sf0.001"


def test_media_schema(spark):
    m = media_table(spark, SF)
    assert [f.name for f in m.schema.fields] == ["doc_id", "kind", "payload", "meta"]
    assert m.schema["payload"].dataType.simpleString() == "binary"
    row = m.first()
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))


def test_decode_stub_raises(spark):
    m = media_table(spark, SF).limit(5)
    with pytest.raises(Exception) as exc:
        decode_media(m, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc.value) or "codecs" in str(exc.value)


def test_decode_fake_deterministic(spark):
    m = media_table(spark, SF).limit(5)
    out = decode_media(m, fake_decode=True).collect()
    src = {r["doc_id"]: bytes(r["payload"]) for r in m.collect()}
    for r in out:
        assert bytes(r["frame0"]) == src[r["doc_id"]][:FRAME_SIZE][::-1]


def test_frame_sample_offsets(spark):
    frames = mm_frame_sample(spark, SF)
    bad = frames.filter(F.col("offset") != F.col("frame_ix") * FRAME_SIZE)
    assert bad.count() == 0
    per_doc = frames.groupBy("doc_id").count()
    assert per_doc.agg(F.max("count")).collect()[0][0] <= 4
