"""Operator library: each module exposes ``QUERIES: dict[name, (fn, sql)]``.

``fn(spark, sf_dir) -> DataFrame`` is the Spark-first implementation;
``sql`` is the equivalent ANSI SQL DuckDB runs on the same parquet tables
(driver correctness gate). ``sql=None`` marks non-SQL-expressible operators
(driver falls back to a rows-only check).

Cross-engine determinism rules used throughout (so value hashes match):

- money/measure aggregates sum integer cents (per-row ``round(x*100)`` is
  bit-identical across engines; integer sums are exact),
- ratios/scores divide exact integers, or are ``round(x, 6)``-ed when the
  summation order of doubles differs between engines (ulp noise),
- every top-k has a total ordering (unique tie-break column),
- hashing uses md5 (identical hex in Spark and DuckDB); hex→int via
  ``conv``/hex-literal cast (verified identical).
"""

from harvester_spark.operators import (
    click_models,
    curation,
    dedup,
    es_aggs,
    es_ext,
    file_metadata,
    fulltext_queries,
    graph,
    index_stats,
    multimodal,
    ranking_ext,
    ranking_models,
    relational,
    retrieval,
    similarity,
    sketches,
    substring,
    text_analytics,
    tpch_ext,
    training_prep,
    web_econ,
)

ALL_QUERIES: dict = {}
for mod in (
    fulltext_queries,
    click_models,
    dedup,
    similarity,
    relational,
    multimodal,
    file_metadata,
    training_prep,
    curation,
    text_analytics,
    sketches,
    graph,
    substring,
    retrieval,
    index_stats,
    ranking_ext,
    ranking_models,
    es_aggs,
    es_ext,
    tpch_ext,
    web_econ,
):
    ALL_QUERIES.update(mod.QUERIES)
