"""Distributed batch search == driver-side engine (rank + near-exact score)."""

import os

import numpy as np
import pandas as pd
import pytest

from harvester_spark.pipeline import run_build
from harvester_spark.search.batch import search_batch
from harvester_spark.search.engine import IndexSearcher


@pytest.fixture(scope="module")
def env(spark, tmp_root):
    out = os.path.join(tmp_root, "batch")
    run_build(spark, out, n_docs=250, resume=False, num_partitions=8)
    return out, IndexSearcher(spark, f"{out}/index")


def test_batch_matches_engine(env, spark):
    out, searcher = env
    queries = pd.DataFrame(
        {
            "query_id": ["q1", "q2", "q3", "q4"],
            "query_text": [
                "w00000",
                "w00000 w00001",
                "block max wand",
                "w00001 w00002 w00003",
            ],
        }
    )
    got = search_batch(spark, f"{out}/index", queries, k=10).toPandas()
    for qid, qtext in zip(queries["query_id"], queries["query_text"]):
        g = got[got["query_id"] == qid].sort_values("rank")
        e = searcher.search(qtext, k=10).topk
        assert list(g["doc_id"]) == list(e["doc_id"]), qid
        assert np.allclose(
            g["score"].to_numpy(), e["score"].to_numpy(), rtol=1e-12, atol=1e-12
        ), qid


def test_batch_dead_term_empty(env, spark):
    out, _ = env
    queries = pd.DataFrame({"query_id": ["qz"], "query_text": ["w00000 zzznohit"]})
    got = search_batch(spark, f"{out}/index", queries, k=10).toPandas()
    assert len(got) == 0
