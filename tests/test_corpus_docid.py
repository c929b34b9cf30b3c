"""Corpus determinism + docID assignment invariants."""

import numpy as np

from harvester_spark.corpus import corpus_pdf, generate_corpus
from harvester_spark.docid import assign_doc_ids
from harvester_spark.extract import extract_text


def test_corpus_deterministic_per_doc():
    a = corpus_pdf(np.array([0, 5, 17, 23, 42]))
    b = corpus_pdf(np.array([42, 17, 0, 23, 5])).sort_values("url").reset_index(drop=True)
    a = a.sort_values("url").reset_index(drop=True)
    assert (a["html"].map(bytes) == b["html"].map(bytes)).all()
    assert (a["text"] == b["text"]).all()


def test_corpus_golden_text_matches_extractor():
    pdf = corpus_pdf(np.arange(60))
    assert list(pdf["text"]) == [extract_text(h) for h in pdf["html"]]


def test_corpus_partitioning_invariant(spark):
    one = generate_corpus(spark, 64, num_partitions=1).orderBy("url").toPandas()
    many = generate_corpus(spark, 64, num_partitions=7).orderBy("url").toPandas()
    assert (one["text"] == many["text"]).all()
    assert (one["html"].map(bytes) == many["html"].map(bytes)).all()
    assert list(one["lang"]) == list(many["lang"])


def test_docid_dense_and_sorted(spark):
    df = generate_corpus(spark, 200, num_partitions=4).selectExpr(
        "url as srn", "lang as set_name", "text"
    )
    out = assign_doc_ids(df, ("set_name", "srn"), num_partitions=5).toPandas()
    assert sorted(out["doc_id"]) == list(range(200))
    ordered = out.sort_values(["set_name", "srn"]).reset_index(drop=True)
    assert list(ordered["doc_id"]) == list(range(200))  # id == global rank


def test_docid_deterministic_across_partitioning(spark):
    df = generate_corpus(spark, 150, num_partitions=3).selectExpr(
        "url as srn", "lang as set_name", "text"
    )
    a = assign_doc_ids(df, ("set_name", "srn"), num_partitions=2).toPandas()
    b = assign_doc_ids(df, ("set_name", "srn"), num_partitions=11).toPandas()
    a = a.sort_values("srn").reset_index(drop=True)
    b = b.sort_values("srn").reset_index(drop=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
