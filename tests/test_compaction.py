"""Compaction: after folding deltas, the plain IndexSearcher (no tombstone
filtering) answers exactly like the DeltaSearcher did before compaction."""

import os

import numpy as np
import pandas as pd

from harvester_spark.corpus import corpus_pdf
from harvester_spark.pipeline import run_build
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.streaming.compaction import compact_in_place
from harvester_spark.streaming.incremental import (
    DeltaSearcher,
    apply_index_delta,
    changed_and_deleted,
    merge_documents,
    normalize_delta,
)


def test_compaction_equals_delta_view(spark, tmp_root):
    out = os.path.join(tmp_root, "compact")
    run_build(spark, out, n_docs=150, resume=False, num_partitions=4)
    base = spark.read.parquet(f"{out}/documents")

    mod = corpus_pdf(np.array([3, 9]))
    mod["html"] = [b"<p>compacted fresh text one</p>", b"<p>compacted fresh text two</p>"]
    mod["deleted"] = [False, True]
    delta = normalize_delta(
        spark.createDataFrame(
            mod,
            "url string, warc_ts timestamp, html binary, text string, lang string, deleted boolean",
        )
    )
    merged = merge_documents(base, delta)
    merged.write.mode("overwrite").parquet(f"{out}/documents_v2")
    merged = spark.read.parquet(f"{out}/documents_v2")
    fresh, tombstones = changed_and_deleted(base, merged)
    apply_index_delta(spark, f"{out}/index", merged, fresh, tombstones)

    queries = ["w00000", "compacted", "w00000 w00001", "fresh one"]
    ds = DeltaSearcher(spark, f"{out}/index")
    before = {q: ds.search(q, k=10).topk for q in queries}

    compact_in_place(spark, f"{out}/index", merged, num_partitions=4)
    assert not os.path.isdir(f"{out}/index/postings_delta")  # deltas folded
    cs = IndexSearcher(spark, f"{out}/index")
    for q in queries:
        after = cs.search(q, k=10).topk
        assert list(after["doc_id"]) == list(before[q]["doc_id"]), q
        a = np.asarray(after["score"], dtype=np.float64)
        b = np.asarray(before[q]["score"], dtype=np.float64)
        assert a.shape == b.shape and (a == b).all(), q
