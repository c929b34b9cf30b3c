"""chunk_passages semantics + the zero-exchange plan contract."""

import hashlib
import re

from pyspark.sql import functions as F

from harvester_spark.operators.training_prep import (
    CHUNK_S,
    CHUNK_W,
    chunk_passages,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_chunks(text: str):
    toks = [t for t in re.split(r"\W+", text.lower(), flags=re.ASCII) if t]
    n = len(toks)
    n_chunks = 1 + max(0, -(-(n - CHUNK_W) // CHUNK_S)) if n > CHUNK_W else 1
    out = []
    for i in range(n_chunks):
        ct = toks[i * CHUNK_S : i * CHUNK_S + CHUNK_W]
        out.append(
            (i, i * CHUNK_S, len(ct), hashlib.md5(" ".join(ct).encode()).hexdigest())
        )
    return out


def test_chunks_match_python_reference(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(30)
        .collect()
    }
    got = (
        chunk_passages(spark, SF_DIR)
        .filter(F.col("doc_id").isin(list(docs)))
        .collect()
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_ix"], r["start_pos"], r["n_tokens"], r["chunk_digest"])
        )
    for doc_id, text in docs.items():
        assert sorted(by_doc[doc_id]) == _ref_chunks(text), doc_id


def test_every_token_is_covered_and_neighbors_overlap(spark):
    rows = chunk_passages(spark, SF_DIR).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) > 100
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_ix"])
        # contiguous chunk indexes from 0
        assert [c["chunk_ix"] for c in chunks] == list(range(len(chunks)))
        # coverage: next chunk starts inside the previous one's span
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_pos"] == a["start_pos"] + CHUNK_S
            assert b["start_pos"] < a["start_pos"] + a["n_tokens"]
        # only the last chunk may be short
        for c in chunks[:-1]:
            assert c["n_tokens"] == CHUNK_W


def test_chunking_is_map_only(spark):
    plan = (
        chunk_passages(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
