"""OR operator through the public API: WAND + filters == filtered OR oracle."""

import os

import numpy as np
import pytest

from harvester_spark.pipeline import run_build
from harvester_spark.search.api import Filters, SearchAPI
from harvester_spark.search.oracle import brute_force_topk_or
from harvester_spark.search.wand import or_search


@pytest.fixture(scope="module")
def env(spark, tmp_root):
    out = os.path.join(tmp_root, "orapi")
    run_build(spark, out, n_docs=200, resume=False, num_partitions=4)
    documents = spark.read.parquet(f"{out}/documents")
    api = SearchAPI(spark, f"{out}/index", documents)
    docs_pdf = documents.select("doc_id", "text", "lang", "set_name").toPandas()
    return api, docs_pdf


def test_or_operator_via_api(env):
    api, docs_pdf = env
    r = api.search("w00000 term_7", k=5, operator="or")
    exp = brute_force_topk_or(docs_pdf, "w00000 term_7", k=5)
    assert [x["doc_id"] for x in r["results"]] == list(exp["doc_id"])
    assert r["results_total"]["is_precise"] is False


def test_or_with_filter_matches_filtered_oracle(env):
    api, docs_pdf = env
    allowed = docs_pdf[docs_pdf["set_name"] == "alpha"]["doc_id"].to_numpy()
    got = or_search(api.searcher, "w00000 w00100", k=10, allowed_doc_ids=allowed)
    # oracle: restrict candidates, keep stats index-wide (non-scoring filter)
    full = brute_force_topk_or(docs_pdf, "w00000 w00100", k=10**6)
    kept = full[full["doc_id"].isin(allowed)].head(10).reset_index(drop=True)
    assert list(got["doc_id"]) == list(kept["doc_id"])
    assert (
        np.asarray(got["score"], dtype=np.float64)
        == np.asarray(kept["score"], dtype=np.float64)
    ).all()
