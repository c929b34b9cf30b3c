"""Salted head-term chunk path: exercised with tiny thresholds.

At production thresholds the salted shuffle only activates above 64k
postings per term; these tests inject small thresholds so CI runs the
chunked encode + query path end-to-end.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from harvester_spark.index.build import IndexBuilder
from harvester_spark.pipeline import build_documents
from harvester_spark.corpus import generate_corpus
from harvester_spark.search.engine import IndexSearcher
from harvester_spark.search.oracle import brute_force_topk

N_DOCS = 300


@pytest.fixture(scope="module")
def salted(spark, tmp_root):
    out = os.path.join(tmp_root, "salted")
    corpus = generate_corpus(spark, N_DOCS, num_partitions=4)
    docs = build_documents(corpus, num_partitions=4)
    docs.write.mode("overwrite").parquet(f"{out}/documents")
    docs = spark.read.parquet(f"{out}/documents")
    builder = IndexBuilder(spark, f"{out}/index")
    tables = builder.build(
        docs,
        resume=False,
        num_partitions=4,
        head_df_threshold=20,   # head terms = almost all vocab words
        head_chunk_target=25,   # force multiple chunks per head term
    )
    return out, tables


def test_head_terms_are_chunked(salted):
    """A head term's postings must span several non-overlapping chunk runs."""
    out, tables = salted
    blocks = (
        tables["postings"]
        .filter((F.col("term") == "w00000") & (F.col("lang") == "en"))
        .orderBy("base_doc_id")
        .select("base_doc_id", "max_doc_id", "n")
        .toPandas()
    )
    assert len(blocks) >= 3  # df ~100 per lang / chunk_target 25
    # runs must be non-overlapping and cover increasing docID ranges
    assert (blocks["base_doc_id"].values[1:] > blocks["max_doc_id"].values[:-1]).all()
    # no reducer output held the whole term
    assert blocks["n"].max() < 100


def test_dictionary_df_correct_under_chunking(salted, spark):
    out, tables = salted
    docs = spark.read.parquet(f"{out}/documents").select("doc_id", "text", "lang").toPandas()
    from harvester_spark.analysis import tokenize

    true_df = sum(1 for t in docs[docs["lang"] == "en"]["text"] if "w00000" in tokenize(t))
    row = (
        tables["dictionary"]
        .filter((F.col("term") == "w00000") & (F.col("lang") == "en"))
        .collect()
    )
    assert row and int(row[0]["df"]) == true_df


def test_rank_identity_under_chunking(salted, spark):
    out, _ = salted
    searcher = IndexSearcher(spark, f"{out}/index")
    docs_pdf = spark.read.parquet(f"{out}/documents").select("doc_id", "text", "lang").toPandas()
    for q in ["w00000", "w00000 w00001", "w00001 w00002 w00003"]:
        for lang in ["all", "en"]:
            eng = searcher.search(q, k=10, lang=lang).topk
            ora = brute_force_topk(docs_pdf, q, k=10, lang=lang)
            assert list(eng["doc_id"]) == list(ora["doc_id"]), (q, lang)
            assert (
                np.asarray(eng["score"], dtype=np.float64)
                == np.asarray(ora["score"], dtype=np.float64)
            ).all(), (q, lang)
