"""Batch query execution as a distributed DataFrame job.

The cluster-scale serving path of SURVEY.md §3.2 for query SETS (rank-eval
sweeps, offline relevance jobs): instead of looping queries on the driver,
the query set becomes a DataFrame and scoring is one Spark job —

    queries(query_id, term)                       (exploded, analyzed)
      ⋈ dictionary(term, lang)                    broadcast (df per term)
      ⋈ postings blocks (term pushdown into scan)
      → mapInPandas decode blocks → (term, doc_id, tf)
      ⋈ doc_stats (dl)                            broadcast at local scale
      → groupBy(query_id, doc_id): n_terms, Σ contrib
      → AND filter (n_terms == |q|) → window top-k per query

Scores are float64; SQL SUM order is engine-nondeterministic, so ranking
uses scores rounded to 9 dp with doc_id tie-break — agreement with the
driver-side engine is asserted to 1 ulp-class tolerance in tests (the
driver-side engine remains the bit-exact rank-identity path).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.index.codec import decode_block
from harvester_spark.search.bm25 import B, K1


def _decode_blocks_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"term": [], "doc_id": [], "tf": []}
        for r in pdf.itertuples(index=False):
            ids, tfs = decode_block(r.base_doc_id, r.doc_deltas, r.tfs)
            out["term"].extend([r.term] * len(ids))
            out["doc_id"].extend(ids.tolist())
            out["tf"].extend(tfs.tolist())
        yield pd.DataFrame(out)


def search_batch(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,  # columns: query_id, query_text
    k: int = 10,
    lang: str = ALL_LANG,
) -> DataFrame:
    """All queries in one Spark job → DataFrame(query_id, rank, doc_id, score)."""
    from harvester_spark.search.engine import read_delta_state

    _state = read_delta_state(index_dir)
    if _state and _state.get("deltas"):
        raise ValueError(
            f"index at {index_dir} has un-compacted deltas; search_batch "
            "reads base postings/stats only — use the distributed paths on "
            "a DeltaSearcher or compact first"
        )
    qrows = [
        (q.query_id, t)
        for q in queries.itertuples(index=False)
        for t in sorted(set(tokenize(q.query_text)))
    ]
    qdf = spark.createDataFrame(qrows, "query_id string, term string")
    n_terms = qdf.groupBy("query_id").agg(F.count("*").alias("n_terms"))
    terms = [r["term"] for r in qdf.select("term").distinct().collect()]

    dictionary = spark.read.parquet(f"{index_dir}/dictionary").filter(
        (F.col("lang") == lang) & F.col("term").isin(terms)
    )
    postings = spark.read.parquet(f"{index_dir}/postings").filter(
        F.col("term").isin(terms)
    )
    if lang != ALL_LANG:
        postings = postings.filter(F.col("lang") == lang)
    from harvester_spark.search.engine import stats_paths

    doc_stats_path, corpus_stats_path = stats_paths(index_dir)
    stats = {
        r["lang"]: (int(r["n_docs"]), float(r["avgdl"]))
        for r in spark.read.parquet(corpus_stats_path).collect()
    }
    n_docs, avgdl = stats[lang]
    doc_stats = spark.read.parquet(doc_stats_path).select("doc_id", "doc_len")

    decoded = postings.select(
        "term", "base_doc_id", "doc_deltas", "tfs"
    ).mapInPandas(_decode_blocks_udf, "term string, doc_id long, tf long")

    contrib = (
        decoded.join(F.broadcast(dictionary.select("term", "df")), "term")
        .join(doc_stats, "doc_id")
        .withColumn(
            "contrib",
            F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (K1 + 1.0))
            / (
                F.col("tf")
                + K1 * (1.0 - B + B * F.col("doc_len") / F.lit(avgdl))
            ),
        )
    )
    scored = (
        F.broadcast(qdf).join(contrib, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("nt"), F.sum("contrib").alias("score"))
        .join(F.broadcast(n_terms), "query_id")
        .filter(F.col("nt") == F.col("n_terms"))  # AND semantics
    )
    w = W.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
