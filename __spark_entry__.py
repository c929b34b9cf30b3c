"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k over sf0.001;
``queries()``/``oracle_sql()`` expose the operator library
(harvester_spark.operators) — one Spark implementation + DuckDB oracle per
operator from SURVEY.md §2 plus the training-data-pipeline components
(dedup / similarity / text analysis).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from harvester_spark.operators import ALL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed BM25 AND-semantics top-10 on sf0.001."""
    from harvester_spark.operators.fulltext_queries import ft_bm25_topk

    return ft_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
