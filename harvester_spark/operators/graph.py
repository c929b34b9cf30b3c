"""Host-graph link analysis — crawl prioritization for a harvester.

The reference decides what to (re)harvest with per-set priorities
(/root/reference/harvester/core/models/datatypes/dataset.py indirectly via
harvest_state); at web scale the standard prioritization signal is link-graph
centrality. ``host_pagerank`` is weighted PageRank over the host graph with
everything INTEGER: ranks live in fixed-point RANK_UNIT micro-shares and
every update is multiply-then-integer-divide on nonnegative int64 (floor ==
trunc, identical in Spark ``DIV`` and DuckDB ``//``), so eight power
iterations produce bit-identical tables in both engines — the same
integer-exact-iteration contract as the k-means trainer (similarity.py) and
the BPE trainer (training_prep.py), with the DuckDB oracle unrolled as
chained MATERIALIZED CTEs.

Graph synthesis (the documents table has no link column): each doc emits one
edge from its own ``source`` host to a deterministic md5-derived target host,
weights = doc counts, self-loops dropped. Non-degeneracy (unequal in-weights
=> a real ranking) is test-pinned.

Scale shape: per iteration, ONE edges-to-ranks equi-join keyed on the src
host, one dst-keyed groupBy, and a scalar dangling-mass agg — the textbook
distributed PageRank plan (ranks stay a DataFrame; nothing host-count-sized
ever reaches the driver); ``localCheckpoint`` cuts the 8-deep lineage like
the connected-components operator (dedup.py).

Overflow bound: 85 * rank * w needs rank * w < 1.08e17; rank <= RANK_UNIT
= 1e9 keeps headroom for per-host-pair weights up to 1e8 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from harvester_spark.operators.common import load

_SQL_HASH56 = "CAST(('0x' || substr(md5({col}), 1, 14)) AS BIGINT)"


def _hash56(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


PR_ITERS = 8
PR_UNIT = 10**9  # fixed-point: total rank mass
PR_FANOUT = 20  # synthesized target-host space ('src0'..'src19')


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dst = F.concat(
        F.lit("src"),
        (_hash56(F.col("doc_id").cast("string")) % PR_FANOUT).cast("string"),
    )
    e = docs.select(F.col("source").alias("src"), dst.alias("dst"))
    return (
        e.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )


def host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, rank_unit) after {PR_ITERS} damped (0.85) power iterations,
    rank_unit in integer 1e-9 shares of the total mass."""
    edges = _edges(spark, sf_dir).cache()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    n_df = F.broadcast(nodes.agg(F.count("*").cast("long").alias("n")))

    ranks = nodes.crossJoin(n_df).select(
        "host", F.expr(f"CAST({PR_UNIT} DIV n AS BIGINT)").alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(
                ranks.select(F.col("host").alias("src"), "r"), "src"
            )
            .join(outw, "src")
            .select(
                F.col("dst").alias("host"),
                F.expr("(85 * r * w) DIV (100 * wout)").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        dang = F.broadcast(
            ranks.join(outw, ranks["host"] == outw["src"], "left_anti").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dg")
            )
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .crossJoin(dang)
            .crossJoin(n_df)
            .select(
                "host",
                F.expr(
                    f"CAST({15 * PR_UNIT} DIV (100 * n)"
                    f" + (85 * dg) DIV (100 * n)"
                    f" + coalesce(c, CAST(0 AS BIGINT)) AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("host", F.col("r").alias("rank_unit"))


def _sql_host_pagerank() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    parts = [
        f"""WITH e AS (
  SELECT source AS src,
         'src' || CAST({hash_doc} % {PR_FANOUT} AS VARCHAR) AS dst
  FROM documents
),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM e WHERE src <> dst GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
),
outw AS MATERIALIZED (
  SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY 1
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
it0 AS MATERIALIZED (
  SELECT host, CAST({PR_UNIT} // n AS BIGINT) AS r FROM nodes CROSS JOIN nn
)"""
    ]
    for k in range(1, PR_ITERS + 1):
        parts.append(
            f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS host,
         CAST(sum((85 * r.r * e.w) // (100 * o.wout)) AS BIGINT) AS c
  FROM edges e JOIN it{k - 1} r ON e.src = r.host JOIN outw o ON e.src = o.src
  GROUP BY 1
),
d{k} AS MATERIALIZED (
  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dg
  FROM it{k - 1} r LEFT JOIN outw o ON r.host = o.src WHERE o.src IS NULL
),
it{k} AS MATERIALIZED (
  SELECT nodes.host,
         CAST({15 * PR_UNIT} // (100 * n) + (85 * dg) // (100 * n)
              + coalesce(c, CAST(0 AS BIGINT)) AS BIGINT) AS r
  FROM nodes LEFT JOIN c{k} USING (host) CROSS JOIN d{k} CROSS JOIN nn
)"""
        )
    parts.append(f"\nSELECT host, r AS rank_unit FROM it{PR_ITERS}")
    return "".join(parts)


QUERIES = {
    "host_pagerank": (host_pagerank, _sql_host_pagerank()),
}
