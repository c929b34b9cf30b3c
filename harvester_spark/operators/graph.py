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

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from harvester_spark.operators.common import SQL_DOC_TOKS, load

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


# ---------------------------------------------------------------- HITS

# Kleinberg hubs & authorities over the same host graph — the second classic
# crawl-prioritization signal next to PageRank (a good HUB host is a directory
# worth re-crawling for link discovery; a good AUTHORITY host is content worth
# fetching deeply). Same integer-exact-iteration contract as host_pagerank:
# scores are fixed-point HITS_UNIT shares, every update is
# multiply-then-integer-divide on nonnegative int64, and the per-sweep L1
# normalization divides by q = greatest(total DIV HITS_UNIT, 1) — a pure
# integer expression, so the divisor (and therefore every score) is
# bit-identical in Spark `DIV` and DuckDB `//`. (The textbook L2 norm needs a
# sqrt; L1 keeps the iteration rational and changes nothing about the
# ranking fixed point.)
#
# Scale shape per sweep: one src-keyed equi-join + dst groupBy (authority
# update), one dst-keyed equi-join + src groupBy (hub update), one scalar agg
# each for the normalizer — nothing host-count-sized on the driver;
# localCheckpoint cuts the 2·HITS_ITERS-deep lineage.
#
# Overflow bound: normalized scores are ≤ ~2·HITS_UNIT (= 2e6), so the update
# term score*w needs w < 4.6e12 docs per host pair, and the normalizer sum
# Σ score*w < 2e6 · Σw keeps int64 headroom up to ~4.6e12 total edges.

HITS_ITERS = 4
HITS_UNIT = 10**6


def hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, auth_unit, hub_unit) after HITS_ITERS weighted hub/authority
    sweeps, both in integer 1e-6 shares of the total mass."""
    edges = _edges(spark, sf_dir).cache()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    n_df = F.broadcast(nodes.agg(F.count("*").cast("long").alias("n")))
    hub = nodes.crossJoin(n_df).select(
        "host", F.expr(f"CAST({HITS_UNIT} DIV n AS BIGINT)").alias("h")
    )
    auth = None
    for _ in range(HITS_ITERS):
        araw = (
            edges.join(hub.select(F.col("host").alias("src"), "h"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("h") * F.col("w")).cast("long").alias("ar"))
        )
        qa = F.broadcast(
            araw.agg(
                F.expr(
                    f"CAST(greatest(sum(ar) DIV {HITS_UNIT},"
                    f" CAST(1 AS BIGINT)) AS BIGINT)"
                ).alias("qa")
            )
        )
        auth = (
            nodes.join(araw.withColumnRenamed("dst", "host"), "host", "left")
            .crossJoin(qa)
            .select(
                "host",
                F.expr(
                    "CAST(coalesce(ar, CAST(0 AS BIGINT)) DIV qa AS BIGINT)"
                ).alias("a"),
            )
            .localCheckpoint()
        )
        hraw = (
            edges.join(auth.select(F.col("host").alias("dst"), "a"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("a") * F.col("w")).cast("long").alias("hr"))
        )
        qh = F.broadcast(
            hraw.agg(
                F.expr(
                    f"CAST(greatest(sum(hr) DIV {HITS_UNIT},"
                    f" CAST(1 AS BIGINT)) AS BIGINT)"
                ).alias("qh")
            )
        )
        hub = (
            nodes.join(hraw.withColumnRenamed("src", "host"), "host", "left")
            .crossJoin(qh)
            .select(
                "host",
                F.expr(
                    "CAST(coalesce(hr, CAST(0 AS BIGINT)) DIV qh AS BIGINT)"
                ).alias("h"),
            )
            .localCheckpoint()
        )
    return (
        nodes.join(auth, "host", "left")
        .join(hub, "host", "left")
        .select(
            "host",
            F.coalesce("a", F.lit(0)).cast("long").alias("auth_unit"),
            F.coalesce("h", F.lit(0)).cast("long").alias("hub_unit"),
        )
    )


def _sql_hits() -> str:
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
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
h0 AS MATERIALIZED (
  SELECT host, CAST({HITS_UNIT} // n AS BIGINT) AS h FROM nodes CROSS JOIN nn
)"""
    ]
    for k in range(1, HITS_ITERS + 1):
        parts.append(
            f""",
ar{k} AS MATERIALIZED (
  SELECT e.dst AS host, CAST(sum(h.h * e.w) AS BIGINT) AS ar
  FROM edges e JOIN h{k - 1} h ON e.src = h.host GROUP BY 1
),
qa{k} AS MATERIALIZED (
  SELECT CAST(greatest(sum(ar) // {HITS_UNIT}, 1) AS BIGINT) AS qa FROM ar{k}
),
a{k} AS MATERIALIZED (
  SELECT nodes.host,
         CAST(coalesce(ar, CAST(0 AS BIGINT)) // qa AS BIGINT) AS a
  FROM nodes LEFT JOIN ar{k} USING (host) CROSS JOIN qa{k}
),
hr{k} AS MATERIALIZED (
  SELECT e.src AS host, CAST(sum(a.a * e.w) AS BIGINT) AS hr
  FROM edges e JOIN a{k} a ON e.dst = a.host GROUP BY 1
),
qh{k} AS MATERIALIZED (
  SELECT CAST(greatest(sum(hr) // {HITS_UNIT}, 1) AS BIGINT) AS qh FROM hr{k}
),
h{k} AS MATERIALIZED (
  SELECT nodes.host,
         CAST(coalesce(hr, CAST(0 AS BIGINT)) // qh AS BIGINT) AS h
  FROM nodes LEFT JOIN hr{k} USING (host) CROSS JOIN qh{k}
)"""
        )
    parts.append(
        f"""
SELECT nodes.host,
       CAST(coalesce(a, 0) AS BIGINT) AS auth_unit,
       CAST(coalesce(h, 0) AS BIGINT) AS hub_unit
FROM nodes LEFT JOIN a{HITS_ITERS} USING (host)
           LEFT JOIN h{HITS_ITERS} USING (host)"""
    )
    return "".join(parts)


QUERIES["hits_scores"] = (hits_scores, _sql_hits())


# -------------------------------------------- crawl budget apportionment

# Largest-remainder (Hamilton) apportionment of a fixed global crawl budget
# across hosts, proportional to PageRank mass — the "how many pages may each
# host get this crawl cycle" decision a frontier scheduler makes from the
# centrality signal above. All integer: base_i = (B*r_i) DIV W,
# rem_i = (B*r_i) MOD W, and the L = B - Σbase leftover seats go to the L
# largest remainders (ties: host asc). Σquota == B EXACTLY (test-pinned),
# and quota is monotone in rank.
#
# Scale shape: base/remainder are map-only behind one scalar broadcast (W);
# the top-L-remainders selection reuses the distributed order-statistic
# recipe from stratified_quota_sample (training_prep.py) — histogram the
# remainders into 4096 range buckets (one map-side agg, ≤4097 rows to the
# driver), cumulative-sum from the top to find the boundary bucket, keep
# whole buckets above it outright, and rank ONLY the boundary bucket
# (~n/4096 rows) by (rem desc, host asc). No global sort, no
# single-partition window, nothing O(hosts) on the driver.
#
# Overflow: B * rank_unit <= 1e6 * 1e9 = 1e15 < 2^63.

CRAWL_BUDGET = 1_000_000
_REM_BUCKETS = 4096


def crawl_budget_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, rank_unit, base_quota, extra, quota): exact integer
    apportionment of CRAWL_BUDGET pages by PageRank share."""
    return allocate_budget(spark, host_pagerank(spark, sf_dir), CRAWL_BUDGET)


def allocate_budget(
    spark: SparkSession, pr: DataFrame, budget: int
) -> DataFrame:
    """Largest-remainder apportionment of ``budget`` over (host, rank_unit)
    rows; Σquota == budget exactly."""
    tot = F.broadcast(pr.agg(F.sum("rank_unit").cast("long").alias("W")))
    scored = (
        pr.crossJoin(tot)
        .select(
            "host",
            "rank_unit",
            F.expr(f"CAST(({budget} * rank_unit) DIV W AS BIGINT)").alias(
                "base_quota"
            ),
            F.expr(f"CAST(({budget} * rank_unit) % W AS BIGINT)").alias(
                "rem"
            ),
        )
        .cache()
    )
    row = scored.agg(
        F.sum("base_quota").cast("long").alias("b"),
        F.max("rem").cast("long").alias("mx"),
    ).collect()[0]
    leftover = budget - row.b
    extras = None
    if leftover > 0:
        bwidth = max((row.mx + 1) // _REM_BUCKETS, 1)
        bucketed = scored.withColumn(
            "bkt", F.expr(f"rem DIV {bwidth}").cast("long")
        )
        hist = {
            r.bkt: r.c
            for r in bucketed.groupBy("bkt").agg(F.count("*").alias("c")).collect()
        }
        cum_above, bstar, slots = 0, None, 0
        for b in sorted(hist, reverse=True):
            if cum_above + hist[b] >= leftover:
                bstar, slots = b, leftover - cum_above
                break
            cum_above += hist[b]
        whole = bucketed.filter(F.col("bkt") > bstar).select("host")
        wq = W.partitionBy("bkt").orderBy(
            F.col("rem").desc(), F.col("host").asc()
        )
        edge = (
            bucketed.filter(F.col("bkt") == bstar)
            .withColumn("rk", F.row_number().over(wq))
            .filter(F.col("rk") <= slots)
            .select("host")
        )
        extras = whole.unionByName(edge).withColumn("extra", F.lit(1))
    out = scored if extras is None else scored.join(extras, "host", "left")
    extra = (
        F.lit(0).cast("long")
        if extras is None
        else F.coalesce(F.col("extra"), F.lit(0)).cast("long")
    )
    return out.select(
        "host",
        "rank_unit",
        "base_quota",
        extra.alias("extra"),
        (F.col("base_quota") + extra).cast("long").alias("quota"),
    )


def _sql_crawl_budget() -> str:
    return f"""
WITH pr AS MATERIALIZED (SELECT * FROM ({_sql_host_pagerank()})),
tot AS (SELECT CAST(sum(rank_unit) AS BIGINT) AS W FROM pr),
scored AS (
  SELECT host, rank_unit,
         CAST(({CRAWL_BUDGET} * rank_unit) // W AS BIGINT) AS base_quota,
         CAST(({CRAWL_BUDGET} * rank_unit) % W AS BIGINT) AS rem
  FROM pr CROSS JOIN tot
),
l AS (SELECT CAST({CRAWL_BUDGET} - sum(base_quota) AS BIGINT) AS L FROM scored),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, host ASC) AS rk FROM scored
)
SELECT host, rank_unit, base_quota,
       CAST(CASE WHEN rk <= L THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base_quota + CASE WHEN rk <= L THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM ranked CROSS JOIN l
"""


QUERIES["crawl_budget_allocate"] = (crawl_budget_allocate, _sql_crawl_budget())


# ------------------------------------------------------------ co-citation

# Host co-citation similarity (Small 1973, applied to the web graph): two
# hosts are related when the same sources link to both — the link-graph
# signal behind "related sites" and seed-list expansion for a focused crawl.
# cocite_w(d1, d2) = Σ_src min(w(src,d1), w(src,d2)) over each source's
# out-edges, d1 < d2 — all integer, engine-exact.
#
# Scale shape: the pair generation is a self-join of out-edges keyed on src,
# whose fan-out is out_degree² — unbounded on hub sources at web scale, so
# the out-edge list is CAPPED to the top-COCITE_CAP edges per source by
# (w desc, dst asc) FIRST (one window keyed on src), the standard
# degree-capping any production co-citation job applies. The cap binds even
# at sandbox scale (out-degree 16 > 12) so the capped path is what the
# oracle gate verifies (max out-degree is 16 already at sf0.001).

COCITE_CAP = 12


def host_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host_a, host_b, cocite_w): co-citation weight for every host pair
    sharing at least one capped in-linking source, host_a < host_b."""
    edges = _edges(spark, sf_dir)
    wc = W.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst").asc())
    capped = (
        edges.withColumn("r", F.row_number().over(wc))
        .filter(F.col("r") <= COCITE_CAP)
        .select("src", "dst", "w")
    )
    a = capped.select("src", F.col("dst").alias("host_a"), F.col("w").alias("wa"))
    b = capped.select("src", F.col("dst").alias("host_b"), F.col("w").alias("wb"))
    return (
        a.join(b, "src")
        .filter(F.col("host_a") < F.col("host_b"))
        .select(
            "host_a",
            "host_b",
            F.least(F.col("wa"), F.col("wb")).alias("mw"),
        )
        .groupBy("host_a", "host_b")
        .agg(F.sum("mw").cast("long").alias("cocite_w"))
    )


def _sql_cocitation() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH e AS (
  SELECT source AS src,
         'src' || CAST({hash_doc} % {PR_FANOUT} AS VARCHAR) AS dst
  FROM documents
),
edges AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM e WHERE src <> dst GROUP BY 1, 2
),
capped AS (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC) AS r
    FROM edges
  ) WHERE r <= {COCITE_CAP}
)
SELECT a.dst AS host_a, b.dst AS host_b,
       CAST(sum(least(a.w, b.w)) AS BIGINT) AS cocite_w
FROM capped a JOIN capped b ON a.src = b.src AND a.dst < b.dst
GROUP BY 1, 2
"""


QUERIES["host_cocitation"] = (host_cocitation, _sql_cocitation())


# ---------------------------------------------------------------- TextRank

# TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04): PageRank over
# the word co-occurrence graph — the graph-centrality companion to the
# frequency-based ft_keyword_extract. Nodes are corpus terms; an undirected
# edge (a, b) weights how often b occurs within TR_WINDOW tokens after a in
# any document (both directions emitted, self-pairs dropped). The damped
# update is the classic TextRank form r_v = 0.15 + 0.85·Σ w_uv/out_u·r_u —
# no 1/N teleport scaling and no dangling mass (the graph is symmetric by
# construction, so every node with an out-edge has in-edges; non-degeneracy
# is test-pinned). Same integer-exact-iteration contract as host_pagerank:
# fixed-point TR_UNIT micro-scores, multiply-then-integer-divide on
# nonnegative int64 (Spark DIV == DuckDB //), TR_ITERS sweeps unrolled as
# MATERIALIZED CTEs in the oracle, bit-identical tables in both engines.
#
# Scale shape: edge construction is TR_WINDOW lead() columns over the
# (doc_id, pos) token window — map-side, no self-join — then one (src, dst)
# groupBy; each sweep is one src-keyed equi-join + dst groupBy, ranks stay
# a DataFrame, localCheckpoint cuts the lineage. Overflow: 85·r·w needs
# r·w < 1.08e17; r stays ≤ ~V·TR_UNIT shares of a V-term vocabulary, so
# int64 holds for V·Σw up to ~1e11 — parameterize TR_UNIT down for a
# 10^9-edge web vocabulary.

TR_ITERS = 4
TR_UNIT = 10**6
TR_WINDOW = 2


def _word_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harvester_spark.operators.common import doc_tokens

    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = None
    for d in range(1, TR_WINDOW + 1):
        p = toks.select(
            F.col("term").alias("src"),
            F.lead("term", d).over(w).alias("dst"),
        ).filter(F.col("dst").isNotNull())
        pairs = p if pairs is None else pairs.unionByName(p)
    both = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return (
        both.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )


def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, rank_unit): TextRank centrality of every corpus term after
    TR_ITERS damped sweeps, in integer 1e-6 fixed-point units."""
    edges = _word_edges(spark, sf_dir).cache()
    nodes = edges.select(F.col("src").alias("term")).distinct()
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))

    ranks = nodes.select("term", F.lit(TR_UNIT).cast("long").alias("r"))
    for _ in range(TR_ITERS):
        contrib = (
            edges.join(ranks.select(F.col("term").alias("src"), "r"), "src")
            .join(outw, "src")
            .select(
                F.col("dst").alias("term"),
                F.expr("(85 * r * w) DIV (100 * wout)").alias("c"),
            )
            .groupBy("term")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        ranks = (
            nodes.join(contrib, "term", "left")
            .select(
                "term",
                F.expr(
                    f"CAST({15 * TR_UNIT} DIV 100"
                    f" + coalesce(c, CAST(0 AS BIGINT)) AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("term", F.col("r").alias("rank_unit"))


def _sql_textrank() -> str:
    from harvester_spark.operators.common import SQL_DOC_TOKS

    leads = ",\n".join(
        f"p{d} AS (\n"
        f"  SELECT term AS src,\n"
        f"         lead(term, {d}) OVER (PARTITION BY doc_id ORDER BY pos)"
        f" AS dst\n  FROM toks\n)"
        for d in range(1, TR_WINDOW + 1)
    )
    unions = "\n  UNION ALL\n".join(
        f"  SELECT src, dst FROM p{d} WHERE dst IS NOT NULL"
        for d in range(1, TR_WINDOW + 1)
    )
    parts = [
        f"""WITH toks AS ({SQL_DOC_TOKS}),
{leads},
fwd AS (
{unions}
),
both_ AS (
  SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM both_ WHERE src <> dst GROUP BY 1, 2
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS term FROM edges),
outw AS MATERIALIZED (
  SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY 1
),
it0 AS MATERIALIZED (
  SELECT term, CAST({TR_UNIT} AS BIGINT) AS r FROM nodes
)"""
    ]
    for k in range(1, TR_ITERS + 1):
        parts.append(
            f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS term,
         CAST(sum((85 * r.r * e.w) // (100 * o.wout)) AS BIGINT) AS c
  FROM edges e JOIN it{k - 1} r ON e.src = r.term JOIN outw o ON e.src = o.src
  GROUP BY 1
),
it{k} AS MATERIALIZED (
  SELECT nodes.term,
         CAST({15 * TR_UNIT} // 100
              + coalesce(c, CAST(0 AS BIGINT)) AS BIGINT) AS r
  FROM nodes LEFT JOIN c{k} USING (term)
)"""
        )
    parts.append(f"\nSELECT term, r AS rank_unit FROM it{TR_ITERS}")
    return "".join(parts)


QUERIES["textrank_keywords"] = (textrank_keywords, _sql_textrank())


# Triangle counting (Suri & Vassilvitskii "Counting Triangles and the Curse
# of the Last Reducer", WWW'11): the MapReduce-classic degree-ordered
# orientation. Every undirected edge points from its lower-(deg, node)
# endpoint to the higher one, so each triangle is generated EXACTLY once —
# as a wedge at its lowest-ordered vertex (the pivot) closed by a third
# oriented edge — and the wedge join's fan-out per node is bounded by the
# oriented out-degree, which is O(sqrt(m)) on ANY graph. That bound is the
# whole point at web scale: the naive undirected wedge join explodes on
# hub nodes; the oriented one cannot.
#
# Graph: a synthesized 16-node hash graph over documents (same device as
# host_pagerank's PR_FANOUT target space) — two 56-bit salted hashes per
# doc give a deterministic, partitioning-independent edge multiset.

TRI_NODES = 16


def host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    ha = _hash56(F.concat(F.col("doc_id").cast("string"), F.lit(":a"))) % TRI_NODES
    hb = _hash56(F.concat(F.col("doc_id").cast("string"), F.lit(":b"))) % TRI_NODES
    e = (
        docs.select(
            F.least(ha, hb).alias("u"), F.greatest(ha, hb).alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    ed = e.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    # orient lower (deg, node) → higher; u < v already breaks degree ties
    fwd = (F.col("deg_u") < F.col("deg_v")) | (F.col("deg_u") == F.col("deg_v"))
    o = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_dst"),
    )
    o1 = o.select(
        F.col("src").alias("pivot"), F.col("dst").alias("w1"),
        F.col("deg_dst").alias("d1"),
    )
    o2 = o.select(
        F.col("src").alias("pivot"), F.col("dst").alias("w2"),
        F.col("deg_dst").alias("d2"),
    )
    wedges = o1.join(o2, "pivot").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("w1") < F.col("w2")))
    )
    closer = o.select(F.col("src").alias("w1"), F.col("dst").alias("w2"))
    tri = wedges.join(closer, ["w1", "w2"], "left_semi")
    return tri.groupBy("pivot").agg(F.count("*").alias("n_triangles"))


def _sql_host_triangles() -> str:
    ha = _SQL_HASH56.format(col="(CAST(doc_id AS VARCHAR) || ':a')")
    hb = _SQL_HASH56.format(col="(CAST(doc_id AS VARCHAR) || ':b')")
    return f"""
WITH h AS (
  SELECT {ha} % {TRI_NODES} AS a, {hb} % {TRI_NODES} AS b FROM documents
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM h WHERE a <> b
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY node
),
o AS (
  SELECT CASE WHEN du.deg <= dv.deg THEN e.u ELSE e.v END AS src,
         CASE WHEN du.deg <= dv.deg THEN e.v ELSE e.u END AS dst,
         CASE WHEN du.deg <= dv.deg THEN dv.deg ELSE du.deg END AS deg_dst
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
)
SELECT o1.src AS pivot, CAST(count(*) AS BIGINT) AS n_triangles
FROM o o1
JOIN o o2 ON o2.src = o1.src
         AND (o1.deg_dst < o2.deg_dst
              OR (o1.deg_dst = o2.deg_dst AND o1.dst < o2.dst))
WHERE EXISTS (
  SELECT 1 FROM o o3 WHERE o3.src = o1.dst AND o3.dst = o2.dst
)
GROUP BY o1.src
"""


QUERIES["host_triangles"] = (host_triangles, _sql_host_triangles())


# ---------------------------------------------- frontier politeness schedule
# The other half of crawl planning (crawl_budget_allocate says HOW MANY
# pages per host; this says WHEN): a Heritrix/Nutch-style polite frontier.
# Every host gets a deterministic crawl delay (1..5 s from the md5-hash
# idiom — robots.txt Crawl-delay stands in); within a host, candidates are
# fetched best-first (n_chars desc as the priority, doc_id tiebreak), so
# candidate p of a host dispatches at t = p * delay(host). The global
# output is the first FRONTIER_TOPK dispatches across all hosts — the
# interleaving a polite fetcher actually executes, where a slow (high
# delay) host's queue naturally yields to fast hosts.
#
# Scale shape: ONE per-host window (frontier queues are per-host by
# definition — the partitioning IS the politeness domain) and a
# TakeOrdered global cut; no global sort, nothing driver-resident. The
# final slot numbering is a window over the already-cut TOPK rows.

FRONTIER_TOPK = 100


def frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(slot, doc_id, host, pos_in_host, delay_s, fetch_at_s): the first
    FRONTIER_TOPK polite-crawl dispatches."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("source").alias("host"), "n_chars"
    )
    wh = W.partitionBy("host").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    sched = (
        docs.withColumn("pos_in_host", F.row_number().over(wh) - 1)
        .withColumn("delay_s", (F.lit(1) + _hash56(F.col("host")) % 5).cast("long"))
        .withColumn("fetch_at_s", (F.col("pos_in_host") * F.col("delay_s")).cast("long"))
    )
    top = sched.orderBy(
        F.col("fetch_at_s").asc(), F.col("host").asc(), F.col("doc_id").asc()
    ).limit(FRONTIER_TOPK)
    ws = W.orderBy(F.col("fetch_at_s").asc(), F.col("host").asc(), F.col("doc_id").asc())
    return top.select(
        F.row_number().over(ws).alias("slot"),
        "doc_id",
        "host",
        F.col("pos_in_host").cast("long").alias("pos_in_host"),
        "delay_s",
        "fetch_at_s",
    )


def _sql_frontier() -> str:
    hash_host = _SQL_HASH56.format(col="host")
    return f"""
WITH cand AS (
  SELECT doc_id, source AS host, n_chars FROM documents
),
sched AS (
  SELECT doc_id, host,
         row_number() OVER (PARTITION BY host
                            ORDER BY n_chars DESC, doc_id ASC) - 1
           AS pos_in_host,
         CAST(1 + {hash_host} % 5 AS BIGINT) AS delay_s
  FROM cand
),
top AS (
  SELECT doc_id, host, pos_in_host,
         delay_s, CAST(pos_in_host * delay_s AS BIGINT) AS fetch_at_s
  FROM sched
  ORDER BY fetch_at_s ASC, host ASC, doc_id ASC LIMIT {FRONTIER_TOPK}
)
SELECT CAST(row_number() OVER (ORDER BY fetch_at_s ASC, host ASC, doc_id ASC)
            AS INT) AS slot,
       doc_id, host, CAST(pos_in_host AS BIGINT) AS pos_in_host,
       delay_s, fetch_at_s
FROM top
"""


QUERIES["frontier_schedule"] = (frontier_schedule, _sql_frontier())


# ------------------------------------------------------ anchor-text rollup
# Anchor-text aggregation — the webgraph enrichment every web ranker feeds
# on (Common Crawl publishes it as a first-class dataset; the reference's
# OpenSearch mapping boosts title/anchor-ish fields): for each TARGET host,
# the top-K anchor phrases pointing at it, by link count. Links are the
# same per-doc md5-derived edges host_pagerank walks; the anchor phrase is
# the linking document's leading bigram (the deterministic stand-in for
# <a> text). Scale shape: one groupBy (dst, anchor) — map-side combined —
# then the per-dst top-K via row_number ≤ K, which Spark compiles to a
# WindowGroupLimit partial top-K on each side of the one dst-keyed
# exchange; ties break (links desc, anchor asc) so the cut is unique.

ANCHOR_TOPK = 3


def anchor_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dst, anchor, links, rk): top-K anchor bigrams per target host."""
    from harvester_spark.analysis import tokens_column

    docs = load(spark, sf_dir, "documents")
    dst = F.concat(
        F.lit("src"),
        (_hash56(F.col("doc_id").cast("string")) % PR_FANOUT).cast("string"),
    )
    links = docs.select(
        F.col("source").alias("src"),
        dst.alias("dst"),
        tokens_column(F.col("text")).alias("t"),
    ).filter(F.size("t") >= 2)
    anch = links.filter(F.col("src") != F.col("dst")).select(
        "dst", F.expr("concat(t[0], ' ', t[1])").alias("anchor")
    )
    counts = anch.groupBy("dst", "anchor").agg(
        F.count("*").cast("long").alias("links")
    )
    wk = W.partitionBy("dst").orderBy(F.col("links").desc(), F.col("anchor").asc())
    return (
        counts.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= ANCHOR_TOPK)
        .select("dst", "anchor", "links", F.col("rk").cast("int").alias("rk"))
    )


def _sql_anchor_text() -> str:
    from harvester_spark.operators.common import SQL_TOKS

    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH links AS (
  SELECT source AS src,
         'src' || CAST({hash_doc} % {PR_FANOUT} AS VARCHAR) AS dst,
         {SQL_TOKS.format(col='text')} AS t
  FROM documents
),
anch AS (
  SELECT dst, t[1] || ' ' || t[2] AS anchor
  FROM links WHERE len(t) >= 2 AND src <> dst
),
counts AS (
  SELECT dst, anchor, CAST(count(*) AS BIGINT) AS links
  FROM anch GROUP BY dst, anchor
)
SELECT dst, anchor, links, rk FROM (
  SELECT dst, anchor, links,
         CAST(row_number() OVER (PARTITION BY dst
              ORDER BY links DESC, anchor ASC) AS INT) AS rk
  FROM counts
)
WHERE rk <= {ANCHOR_TOPK}
"""


QUERIES["anchor_text_topk"] = (anchor_text_topk, _sql_anchor_text())


# ------------------------------------------------------ recrawl scheduling

# Change-rate-driven recrawl scheduling (Cho & Garcia-Molina 2003,
# "Estimating frequency of change"): a crawler that revisits every page at
# the same cadence wastes fetches on static pages and staleness on fast-
# moving ones. Per page, from its visit history: the Cho estimator for the
# per-visit change probability, λ̂ = -ln((n - X + 0.5) / (n + 0.5)) (the
# +0.5 regularizer keeps X == n finite and X == 0 at exactly 0), and the
# revisit interval ∝ observed-gap / λ̂, capped at RECRAWL_CAP_S — the
# frequency-class table a Heritrix-style scheduler (frontier_schedule)
# consumes. The reference re-harvests whole sets on a fixed schedule
# (/root/reference/harvester/core/models/datatypes/dataset.py harvest
# lifecycle); per-page adaptive recrawl is what that becomes at web scale.
#
# Page synthesis: the events table is the fetch log — page = user_id,
# visit = event, "changed" = event_type IN ('click','purchase','signup')
# (measured at sf0.01: change ratios span 0.41-0.73 across 150 pages, so
# the estimator orders pages non-degenerately).
#
# Determinism: one shared λ expression string in both engines; ln() output
# goes through the micro-nat idiom (floor(x·1e6 + 0.5), x ≥ 0 always since
# the ratio ≤ 1); every division after that is integer DIV/// on
# nonnegative int64. Timestamps: Spark unix_timestamp() truncates to
# seconds == DuckDB floor(epoch()).
#
# Scale shape: ONE map-side-combinable groupBy(page) over the fetch log —
# no joins, no windows, nothing driver-sized; the output is page-dim-sized
# and feeds TakeOrdered dispatch (frontier_schedule), never a global sort.

RECRAWL_CAP_S = 30 * 86400  # 30-day ceiling on the revisit interval

_LAM_MICRO = (
    "CAST(floor(-ln((n_visits - n_changes + 0.5e0) / (n_visits + 0.5e0))"
    " * 1.0e6 + 0.5e0) AS BIGINT)"
)
# interval = gap_s·1e6 / λ_micro, floor-div, capped; λ == 0 → cap
_INTERVAL = (
    f"CAST(least((gap_s * 1000000) {{div}} greatest(lam_micro, 1),"
    f" {RECRAWL_CAP_S}) AS BIGINT)"
)


def recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(page_id, n_visits, n_changes, span_s, gap_s, lam_micro,
    interval_s): per-page Cho change-rate estimate and the capped optimal
    revisit interval."""
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("page_id"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.col("event_type").isin("click", "purchase", "signup").alias("chg"),
    )
    per = ev.groupBy("page_id").agg(
        F.count("*").cast("long").alias("n_visits"),
        F.sum(F.col("chg").cast("long")).cast("long").alias("n_changes"),
        (F.max("sec") - F.min("sec")).cast("long").alias("span_s"),
    )
    return (
        per.withColumn(
            "gap_s",
            F.expr("CAST(span_s DIV greatest(n_visits - 1, 1) AS BIGINT)"),
        )
        .withColumn("lam_micro", F.expr(_LAM_MICRO))
        .withColumn("interval_s", F.expr(_INTERVAL.format(div="DIV")))
        .select(
            "page_id", "n_visits", "n_changes", "span_s", "gap_s",
            "lam_micro", "interval_s",
        )
    )


SQL_RECRAWL = f"""
WITH per AS (
  SELECT user_id AS page_id,
         CAST(count(*) AS BIGINT) AS n_visits,
         CAST(sum(CASE WHEN event_type IN ('click','purchase','signup')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
           AS span_s
  FROM events GROUP BY user_id
),
gaps AS (
  SELECT *, CAST(span_s // greatest(n_visits - 1, 1) AS BIGINT) AS gap_s
  FROM per
),
lam AS (SELECT *, {_LAM_MICRO} AS lam_micro FROM gaps)
SELECT page_id, n_visits, n_changes, span_s, gap_s, lam_micro,
       {_INTERVAL.format(div='//')} AS interval_s
FROM lam
"""

QUERIES["recrawl_schedule"] = (recrawl_schedule, SQL_RECRAWL)


# ------------------------------------------------------------- TrustRank
# Gyöngyi, Garcia-Molina & Pedersen (VLDB 2004): PageRank with the teleport
# restricted to a trusted SEED set, plus the derived spam-mass signal
# (what fraction of a host's PageRank arrives from un-trusted flow) — the
# third crawl-prioritization signal next to host_pagerank / hits_scores,
# and the one an adversarial web corpus actually needs before spending
# crawl budget. Same integer contract as host_pagerank: both walks run in
# the SAME loop over the same weighted host graph, every update is
# multiply-then-integer-divide on nonnegative int64, dangling mass
# redistributes to ALL nodes for the PR walk but ONLY to seeds for the TR
# walk (trust never leaks to the teleport of untrusted hosts), and the
# final spam-mass division is sign-split so Spark DIV and DuckDB //
# agree on the (seed) hosts whose trust exceeds their rank.
#
# Seed selection is hash-deterministic (smallest md5('seed|'||host), host
# tie-break) — content-independent, so the oracle CTE twin reproduces it
# relationally. Scale shape per sweep: one src-keyed equi-join + one dst
# groupBy carrying BOTH walks' contributions (the second walk is two extra
# int64 columns on the same shuffle, not a second pass), two scalar
# dangling aggs, localCheckpoint lineage cut.

TR_SEEDS = 4
TRUST_ITERS = PR_ITERS


def host_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, is_seed, rank_unit, trust_unit, spam_mass_milli): PageRank
    and seed-teleport TrustRank after {TRUST_ITERS} joint damped iterations,
    spam mass = (rank - trust) / rank in signed milli-units."""
    edges = _edges(spark, sf_dir).cache()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    wseed = W.orderBy(
        _hash56(F.concat(F.lit("seed|"), F.col("host"))).asc(), F.col("host").asc()
    )
    nodes = nodes.withColumn(
        "is_seed", F.row_number().over(wseed) <= TR_SEEDS
    ).localCheckpoint()
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    n_df = F.broadcast(nodes.agg(F.count("*").cast("long").alias("n")))

    ranks = nodes.crossJoin(n_df).select(
        "host",
        "is_seed",
        F.expr(f"CAST({PR_UNIT} DIV n AS BIGINT)").alias("r"),
        F.expr(
            f"CASE WHEN is_seed THEN CAST({PR_UNIT} DIV {TR_SEEDS} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("t"),
    )
    for _ in range(TRUST_ITERS):
        contrib = (
            edges.join(
                ranks.select(F.col("host").alias("src"), "r", "t"), "src"
            )
            .join(outw, "src")
            .select(
                F.col("dst").alias("host"),
                F.expr("(85 * r * w) DIV (100 * wout)").alias("cr"),
                F.expr("(85 * t * w) DIV (100 * wout)").alias("ct"),
            )
            .groupBy("host")
            .agg(
                F.sum("cr").cast("long").alias("cr"),
                F.sum("ct").cast("long").alias("ct"),
            )
        )
        dang = F.broadcast(
            ranks.join(outw, ranks["host"] == outw["src"], "left_anti").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dgr"),
                F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("dgt"),
            )
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .crossJoin(dang)
            .crossJoin(n_df)
            .select(
                "host",
                "is_seed",
                F.expr(
                    f"CAST({15 * PR_UNIT} DIV (100 * n)"
                    f" + (85 * dgr) DIV (100 * n)"
                    f" + coalesce(cr, CAST(0 AS BIGINT)) AS BIGINT)"
                ).alias("r"),
                F.expr(
                    f"CAST(CASE WHEN is_seed THEN {15 * PR_UNIT} DIV (100 * {TR_SEEDS})"
                    f" + (85 * dgt) DIV (100 * {TR_SEEDS}) ELSE 0 END"
                    f" + coalesce(ct, CAST(0 AS BIGINT)) AS BIGINT)"
                ).alias("t"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "host",
        "is_seed",
        F.col("r").alias("rank_unit"),
        F.col("t").alias("trust_unit"),
        F.expr(
            "CASE WHEN r = 0 THEN CAST(0 AS BIGINT)"
            " WHEN r - t >= 0 THEN CAST((1000 * (r - t)) DIV r AS BIGINT)"
            " ELSE CAST(-((1000 * (t - r)) DIV r) AS BIGINT) END"
        ).alias("spam_mass_milli"),
    )


def _sql_host_trustrank() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    seed_hash = _SQL_HASH56.format(col="'seed|' || host")
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
  SELECT host,
         row_number() OVER (ORDER BY {seed_hash} ASC, host ASC)
           <= {TR_SEEDS} AS is_seed
  FROM (SELECT src AS host FROM edges UNION SELECT dst FROM edges)
),
outw AS MATERIALIZED (
  SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY 1
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
it0 AS MATERIALIZED (
  SELECT host, is_seed, CAST({PR_UNIT} // n AS BIGINT) AS r,
         CASE WHEN is_seed THEN CAST({PR_UNIT} // {TR_SEEDS} AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS t
  FROM nodes CROSS JOIN nn
)"""
    ]
    for k in range(1, TRUST_ITERS + 1):
        parts.append(
            f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS host,
         CAST(sum((85 * r.r * e.w) // (100 * o.wout)) AS BIGINT) AS cr,
         CAST(sum((85 * r.t * e.w) // (100 * o.wout)) AS BIGINT) AS ct
  FROM edges e JOIN it{k - 1} r ON e.src = r.host JOIN outw o ON e.src = o.src
  GROUP BY 1
),
d{k} AS MATERIALIZED (
  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dgr,
         CAST(coalesce(sum(r.t), 0) AS BIGINT) AS dgt
  FROM it{k - 1} r LEFT JOIN outw o ON r.host = o.src WHERE o.src IS NULL
),
it{k} AS MATERIALIZED (
  SELECT nodes.host, nodes.is_seed,
         CAST({15 * PR_UNIT} // (100 * n) + (85 * dgr) // (100 * n)
              + coalesce(cr, CAST(0 AS BIGINT)) AS BIGINT) AS r,
         CAST(CASE WHEN is_seed THEN {15 * PR_UNIT} // (100 * {TR_SEEDS})
                   + (85 * dgt) // (100 * {TR_SEEDS}) ELSE 0 END
              + coalesce(ct, CAST(0 AS BIGINT)) AS BIGINT) AS t
  FROM nodes LEFT JOIN c{k} USING (host) CROSS JOIN d{k} CROSS JOIN nn
)"""
        )
    parts.append(
        f"""
SELECT host, is_seed, r AS rank_unit, t AS trust_unit,
       CASE WHEN r = 0 THEN CAST(0 AS BIGINT)
            WHEN r - t >= 0 THEN CAST((1000 * (r - t)) // r AS BIGINT)
            ELSE CAST(-((1000 * (t - r)) // r) AS BIGINT) END
         AS spam_mass_milli
FROM it{TRUST_ITERS}"""
    )
    return "".join(parts)


QUERIES["host_trustrank"] = (host_trustrank, _sql_host_trustrank())


# ---------------------------------------------------------------- SALSA

# Lempel & Moran's SALSA — the degree-normalized cousin of HITS (and what
# production link-analysis stacks actually ran, e.g. Twitter's WTF
# recommender): hubs and authorities are the stationary walks on the
# bipartite link graph where every step divides by the local degree, so
# scores conserve mass and no per-sweep normalizer is needed. Same
# integer-exact-iteration contract as host_pagerank: scores are
# fixed-point SALSA_UNIT shares, every edge contribution is
# multiply-then-integer-divide on nonnegative int64 ((h·w) DIV wout on
# the authority sweep, (a·w) DIV win on the hub sweep), DuckDB oracle
# unrolled as chained MATERIALIZED CTEs.
#
# Scale shape per sweep: one src-keyed equi-join + dst groupBy, one
# dst-keyed join + src groupBy — identical to the HITS plan, minus the
# two scalar normalizer aggs (SALSA's degree division makes the walk
# stochastic by construction). localCheckpoint cuts the unrolled lineage.
# Overflow: scores ≤ SALSA_UNIT = 1e9, so score·w needs per-pair weights
# w < 9.2e9 — 1e8-docs-per-host-pair headroom at 100 TB.

SALSA_ITERS = 4
SALSA_UNIT = 10**9


def salsa_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, salsa_auth_unit, salsa_hub_unit) after {SALSA_ITERS}
    degree-normalized sweeps, integer 1e-9 shares of the walk mass."""
    edges = _edges(spark, sf_dir).cache()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    inw = edges.groupBy("dst").agg(F.sum("w").cast("long").alias("win"))
    n_df = F.broadcast(nodes.agg(F.count("*").cast("long").alias("n")))
    hub = nodes.crossJoin(n_df).select(
        "host", F.expr(f"CAST({SALSA_UNIT} DIV n AS BIGINT)").alias("h")
    )
    auth = None
    for _ in range(SALSA_ITERS):
        auth = (
            edges.join(hub.select(F.col("host").alias("src"), "h"), "src")
            .join(outw, "src")
            .select(
                F.col("dst").alias("host"),
                F.expr("(h * w) DIV wout").alias("ac"),
            )
            .groupBy("host")
            .agg(F.sum("ac").cast("long").alias("a"))
            .localCheckpoint()
        )
        hub = (
            edges.join(auth.select(F.col("host").alias("dst"), "a"), "dst")
            .join(inw, "dst")
            .select(
                F.col("src").alias("host"),
                F.expr("(a * w) DIV win").alias("hc"),
            )
            .groupBy("host")
            .agg(F.sum("hc").cast("long").alias("h"))
            .localCheckpoint()
        )
    return (
        nodes.join(auth, "host", "left")
        .join(hub, "host", "left")
        .select(
            "host",
            F.coalesce("a", F.lit(0)).cast("long").alias("salsa_auth_unit"),
            F.coalesce("h", F.lit(0)).cast("long").alias("salsa_hub_unit"),
        )
    )


def _sql_salsa() -> str:
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
  SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src
),
inw AS MATERIALIZED (
  SELECT dst, CAST(sum(w) AS BIGINT) AS win FROM edges GROUP BY dst
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
h0 AS MATERIALIZED (
  SELECT host, CAST({SALSA_UNIT} // n AS BIGINT) AS h FROM nodes CROSS JOIN nn
)"""
    ]
    for k in range(1, SALSA_ITERS + 1):
        parts.append(
            f""",
a{k} AS MATERIALIZED (
  SELECT e.dst AS host, CAST(sum((h.h * e.w) // o.wout) AS BIGINT) AS a
  FROM edges e JOIN h{k - 1} h ON e.src = h.host
       JOIN outw o ON o.src = e.src
  GROUP BY 1
),
h{k} AS MATERIALIZED (
  SELECT e.src AS host, CAST(sum((a.a * e.w) // i.win) AS BIGINT) AS h
  FROM edges e JOIN a{k} a ON e.dst = a.host
       JOIN inw i ON i.dst = e.dst
  GROUP BY 1
)"""
        )
    parts.append(
        f"""
SELECT nodes.host,
       CAST(coalesce(a, 0) AS BIGINT) AS salsa_auth_unit,
       CAST(coalesce(h, 0) AS BIGINT) AS salsa_hub_unit
FROM nodes LEFT JOIN a{SALSA_ITERS} USING (host)
           LEFT JOIN h{SALSA_ITERS} USING (host)"""
    )
    return "".join(parts)


QUERIES["salsa_scores"] = (salsa_scores, _sql_salsa())


# ------------------------------------------------------ link reciprocity

# Reciprocal-link fraction per host — the classic nepotism / link-farm
# signal (Davison 2000): organic hosts link asymmetrically, farms trade
# links. recip_milli = reciprocated out-neighbors / out-neighbors, exact
# integer milli. Scale shape: one self-semi-join of the (src, dst) edge
# relation on the flipped key — edge-count-sized, never doc-sized; the
# host rollup is a map-side-combinable groupBy.


def host_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, n_out, n_recip, w_out, recip_milli): out-degree, count of
    reciprocated out-neighbors, out-weight, and the reciprocity ratio."""
    edges = _edges(spark, sf_dir).cache()
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = (
        edges.join(rev, ["src", "dst"], "semi")
        .groupBy("src")
        .agg(F.count("*").cast("long").alias("n_recip"))
    )
    deg = edges.groupBy("src").agg(
        F.count("*").cast("long").alias("n_out"),
        F.sum("w").cast("long").alias("w_out"),
    )
    return (
        deg.join(recip, "src", "left")
        .select(
            F.col("src").alias("host"),
            "n_out",
            F.coalesce("n_recip", F.lit(0)).cast("long").alias("n_recip"),
            "w_out",
            F.expr(
                "CAST(coalesce(n_recip, 0) * 1000 DIV n_out AS BIGINT)"
            ).alias("recip_milli"),
        )
    )


def _sql_reciprocity() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH e AS (
  SELECT source AS src,
         'src' || CAST({hash_doc} % {PR_FANOUT} AS VARCHAR) AS dst
  FROM documents
),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM e WHERE src <> dst GROUP BY 1, 2
),
recip AS (
  SELECT a.src, CAST(count(*) AS BIGINT) AS n_recip
  FROM edges a
  WHERE EXISTS (SELECT 1 FROM edges b
                WHERE b.src = a.dst AND b.dst = a.src)
  GROUP BY a.src
),
deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_out,
         CAST(sum(w) AS BIGINT) AS w_out
  FROM edges GROUP BY src
)
SELECT d.src AS host, d.n_out AS n_out,
       CAST(coalesce(r.n_recip, 0) AS BIGINT) AS n_recip,
       d.w_out AS w_out,
       CAST(coalesce(r.n_recip, 0) * 1000 // d.n_out AS BIGINT) AS recip_milli
FROM deg d LEFT JOIN recip r ON r.src = d.src
"""


QUERIES["host_reciprocity"] = (host_reciprocity, _sql_reciprocity())


# ----------------------------------------------------- degree assortativity

# Newman's degree-assortativity coefficient over the host graph: across
# directed edges, the Pearson correlation between the source's out-degree
# and the destination's in-degree (weighted degrees). Spam farms and
# mirror clusters show up as strong positive assortativity; organic web
# graphs are famously disassortative — the one-number structural health
# check next to host_reciprocity. Moments are exact integers over the
# edge relation; only the final Pearson touches doubles, through the
# es_matrix_stats sign-split micro string on identical integer inputs.
#
# Scale shape: two degree groupBys + two broadcast joins back onto edges
# + one scalar agg. Edge-count-sized throughout.

_ASSORT_MICRO = (
    "CAST(CASE WHEN covn >= 0 "
    "THEN floor(covn * 1.0e6 / sqrt(CAST(va AS DOUBLE) * CAST(vb AS DOUBLE)) + 0.5e0) "
    "ELSE -floor(-(covn) * 1.0e6 / sqrt(CAST(va AS DOUBLE) * CAST(vb AS DOUBLE)) + 0.5e0) "
    "END AS BIGINT)"
)


def host_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(m, sx, sy, covn, assort_micro): edge count, degree sums, n·cov
    numerator, and the degree-assortativity Pearson in micro-units."""
    edges = _edges(spark, sf_dir).cache()
    outd = edges.groupBy("src").agg(F.sum("w").cast("long").alias("x"))
    ind = edges.groupBy("dst").agg(F.sum("w").cast("long").alias("y"))
    e = edges.join(outd, "src").join(ind, "dst")
    agg = e.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
    )
    return agg.select(
        "m",
        "sx",
        "sy",
        F.expr("CAST(m * sxy - sx * sy AS BIGINT)").alias("covn"),
        F.expr(
            "CAST(m * sx2 - sx * sx AS BIGINT)"
        ).alias("va"),
        F.expr(
            "CAST(m * sy2 - sy * sy AS BIGINT)"
        ).alias("vb"),
    ).select("m", "sx", "sy", "covn", F.expr(_ASSORT_MICRO).alias("assort_micro"))


def _sql_assortativity() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH e0 AS (
  SELECT source AS src,
         'src' || CAST({hash_doc} % {PR_FANOUT} AS VARCHAR) AS dst
  FROM documents
),
edges AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM e0 WHERE src <> dst GROUP BY 1, 2
),
outd AS (SELECT src, CAST(sum(w) AS BIGINT) AS x FROM edges GROUP BY src),
ind AS (SELECT dst, CAST(sum(w) AS BIGINT) AS y FROM edges GROUP BY dst),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sx2,
         CAST(sum(y * y) AS BIGINT) AS sy2
  FROM edges JOIN outd USING (src) JOIN ind USING (dst)
)
SELECT m, sx, sy,
       CAST(m * sxy - sx * sy AS BIGINT) AS covn,
       {_ASSORT_MICRO.replace("covn", "(m * sxy - sx * sy)")
                      .replace("va", "(m * sx2 - sx * sx)")
                      .replace("vb", "(m * sy2 - sy * sy)")} AS assort_micro
FROM m
"""


QUERIES["host_assortativity"] = (host_assortativity, _sql_assortativity())


# ------------------------------------------------------------- k-core

# k-core membership by iterative peeling (Seidman 1983; the crawl/spam
# tier's "dense nucleus" extractor — hosts outside the core are leaf-like
# and cheap to deprioritize). This operator uses its OWN sparse host
# synthesis (doc → 'h'||md5%fanout with fanout DERIVED as n_docs DIV 2,
# the derive_n_planes discipline): the shared 20-host _edges graph is
# near-complete, where peeling is all-or-nothing and proves nothing; a
# scale-invariant ~2 docs/host ratio keeps a genuine leaf fringe below
# the fixed k = {KCORE_K} at EVERY scale factor (survivor split
# test-pinned). {KCORE_ITERS} peel rounds are unrolled as chained
# MATERIALIZED CTEs — drop every host whose degree within the surviving
# set is < k, recompute, repeat.
#
# Scale shape per round: two semi-joins of edges against survivors + one
# degree groupBy — edge-count-sized; survivors only ever shrink. The
# driver-side n_docs is a parquet-metadata count (catalog statistic),
# never a scan.

KCORE_ITERS = 4
KCORE_K = 3


def host_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, degree0, in_core, k): initial undirected distinct-neighbor
    degree and survival of {KCORE_ITERS} peeling rounds at k={KCORE_K}
    over the sparse derived-fanout host graph."""
    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    e0 = docs.select(F.col("source").alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    und = (
        e0.select("src", "dst")
        .union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    deg0 = und.groupBy("src").agg(F.count("*").cast("long").alias("degree0"))
    alive = deg0.select(F.col("src").alias("host"))
    for _ in range(KCORE_ITERS):
        kept_edges = (
            und.join(alive.withColumnRenamed("host", "src"), "src", "semi")
            .join(alive.withColumnRenamed("host", "dst"), "dst", "semi")
        )
        deg = kept_edges.groupBy("src").agg(F.count("*").cast("long").alias("d"))
        alive = (
            deg.filter(F.col("d") >= KCORE_K)
            .select(F.col("src").alias("host"))
            .localCheckpoint()
        )
    return (
        deg0.select(F.col("src").alias("host"), "degree0")
        .join(alive.withColumn("inc", F.lit(1)), "host", "left")
        .select(
            "host",
            "degree0",
            F.coalesce("inc", F.lit(0)).cast("long").alias("in_core"),
            F.lit(KCORE_K).cast("long").alias("k"),
        )
    )


def _sql_kcore() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    parts = [
        f"""WITH fan AS (
  SELECT greatest(count(*) // 2, 20) AS f FROM documents
),
e0 AS (
  SELECT source AS src,
         'h' || CAST({hash_doc} % (SELECT f FROM fan) AS VARCHAR) AS dst
  FROM documents
),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM e0 WHERE src <> dst
    UNION
    SELECT dst, src FROM e0 WHERE src <> dst
  )
),
deg0 AS MATERIALIZED (
  SELECT src AS host, CAST(count(*) AS BIGINT) AS degree0
  FROM edges GROUP BY 1
),
alive0 AS MATERIALIZED (SELECT host FROM deg0)"""
    ]
    for i in range(1, KCORE_ITERS + 1):
        parts.append(
            f""",
deg{i} AS MATERIALIZED (
  SELECT e.src AS host, CAST(count(*) AS BIGINT) AS d
  FROM edges e
  WHERE e.src IN (SELECT host FROM alive{i - 1})
    AND e.dst IN (SELECT host FROM alive{i - 1})
  GROUP BY 1
),
alive{i} AS MATERIALIZED (
  SELECT host FROM deg{i} WHERE d >= {KCORE_K}
)"""
        )
    parts.append(
        f"""
SELECT d.host, d.degree0,
       CAST((a.host IS NOT NULL) AS BIGINT) AS in_core,
       CAST({KCORE_K} AS BIGINT) AS k
FROM deg0 d LEFT JOIN alive{KCORE_ITERS} a ON a.host = d.host"""
    )
    return "".join(parts)


QUERIES["host_kcore"] = (host_kcore, _sql_kcore())


# ------------------------------------------------------ reachability probe

# BFS frontier probe from the strongest hub: hop-by-hop reachable-set
# growth over the DIRECTED host graph, seeded at the max-out-weight host
# — the cheap empirical stand-in for diameter/ball-growth statistics
# (Broder et al.'s bow-tie measurements ran exactly these probes at web
# scale). {REACH_HOPS} rounds are unrolled: frontier_{k+1} = out-
# neighbors of frontier_k minus everything already reached — two
# semi/anti joins per hop, the connected-components discipline.
#
# Scale shape per hop: one edges⋈frontier equi-join + one anti-join
# against the reached set; sets only grow, frontiers shrink to empty.

REACH_HOPS = 4


def host_reach_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hop, frontier_size, reached_size): BFS ball growth from the
    max-out-weight seed host."""
    edges = _edges(spark, sf_dir).cache()
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    seed = (
        outw.orderBy(F.col("wout").desc(), F.col("src").asc())
        .limit(1)
        .select(F.col("src").alias("host"))
    )
    reached = seed
    frontier = seed
    out = [(0, 1, 1)]
    rows = []
    for hop in range(1, REACH_HOPS + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("host", "src"), "src", "semi")
            .select(F.col("dst").alias("host"))
            .distinct()
            .join(reached, "host", "anti")
            .localCheckpoint()
        )
        reached = reached.union(nxt).distinct().localCheckpoint()
        frontier = nxt
        rows.append((hop, nxt.count(), reached.count()))
    data = out + rows
    return spark.createDataFrame(
        [(int(h), int(f), int(r)) for h, f, r in data],
        "hop long, frontier_size long, reached_size long",
    )


def _sql_reach() -> str:
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
seed AS MATERIALIZED (
  SELECT src AS host FROM (
    SELECT src, sum(w) AS wout FROM edges GROUP BY src
    ORDER BY wout DESC, src ASC LIMIT 1
  )
),
reached0 AS MATERIALIZED (SELECT host FROM seed),
frontier0 AS MATERIALIZED (SELECT host FROM seed)"""
    ]
    for k in range(1, REACH_HOPS + 1):
        parts.append(
            f""",
frontier{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS host FROM edges e
  WHERE e.src IN (SELECT host FROM frontier{k - 1})
    AND e.dst NOT IN (SELECT host FROM reached{k - 1})
),
reached{k} AS MATERIALIZED (
  SELECT host FROM reached{k - 1}
  UNION
  SELECT host FROM frontier{k}
)"""
        )
    legs = ["SELECT CAST(0 AS BIGINT) AS hop, CAST(1 AS BIGINT) AS frontier_size, CAST(1 AS BIGINT) AS reached_size"]
    for k in range(1, REACH_HOPS + 1):
        legs.append(
            f"SELECT CAST({k} AS BIGINT),"
            f" (SELECT CAST(count(*) AS BIGINT) FROM frontier{k}),"
            f" (SELECT CAST(count(*) AS BIGINT) FROM reached{k})"
        )
    parts.append("\n" + "\nUNION ALL\n".join(legs))
    return "".join(parts)


QUERIES["host_reach_probe"] = (host_reach_probe, _sql_reach())


# ------------------------------------------------- pagerank convergence

# The convergence certificate for host_pagerank's fixed iteration count:
# per-iteration L1 delta Σ|r_k − r_{k−1}| in rank units, for every k up
# to PR_ITERS — the table that justifies (or indicts) stopping at 8
# sweeps. Power iteration contracts the L1 error by the damping factor,
# so successive deltas must shrink ~0.85× (monotone decrease is
# test-pinned); the final row's delta over PR_UNIT is the residual the
# ranking carries. Same integer chain as host_pagerank — the deltas are
# exact int64 sums of absolute differences of the SAME iteration tables.
#
# Scale shape: the pagerank chain plus one host-keyed join and scalar
# agg per iteration — nothing new touches the corpus.


def pagerank_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(iter, l1_delta_unit, residual_milli): L1 movement of each power
    iteration and its share of total rank mass."""
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
    deltas = []
    for k in range(1, PR_ITERS + 1):
        contrib = (
            edges.join(ranks.select(F.col("host").alias("src"), "r"), "src")
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
        nxt = (
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
        d = (
            ranks.withColumnRenamed("r", "rp")
            .join(nxt, "host")
            .agg(F.sum(F.expr("abs(r - rp)")).cast("long").alias("d"))
            .collect()[0]["d"]
        )
        deltas.append((k, int(d)))
        ranks = nxt
    return spark.createDataFrame(
        [
            (k, d, d * 1000 // PR_UNIT)
            for k, d in deltas
        ],
        "iter long, l1_delta_unit long, residual_milli long",
    )


def _sql_pagerank_convergence() -> str:
    base = _sql_host_pagerank()
    # reuse the full unrolled chain, tap every consecutive pair
    chain = base[: base.rindex("\nSELECT host")]
    legs = []
    for k in range(1, PR_ITERS + 1):
        legs.append(
            f"""SELECT CAST({k} AS BIGINT) AS iter,
       (SELECT CAST(sum(abs(a.r - b.r)) AS BIGINT)
        FROM it{k} a JOIN it{k - 1} b ON a.host = b.host) AS l1_delta_unit,
       (SELECT CAST(sum(abs(a.r - b.r)) * 1000 // {PR_UNIT} AS BIGINT)
        FROM it{k} a JOIN it{k - 1} b ON a.host = b.host) AS residual_milli"""
        )
    return chain + "\n" + "\nUNION ALL\n".join(legs)


QUERIES["pagerank_convergence"] = (
    pagerank_convergence,
    _sql_pagerank_convergence(),
)


# -------------------------------------------- harmonic centrality (APSP)

# Harmonic centrality (Boldi & Vigna, "Axioms for centrality", 2014) over
# the host graph within a fixed HARM_HOPS horizon: H(v) = Σ_u 840/d(v,u)
# for every host u reached in 1..HARM_HOPS hops along edge direction —
# the centrality family that handles disconnected/unreached pairs
# natively (∞ distance contributes 0, no closeness blow-up). 840 =
# lcm(1..8), so every 840/d is an EXACT integer for any horizon up to 8
# and the scores are exact int64 sums — no float reciprocal anywhere.
# sum_dist doubles as the (reached-set) closeness numerator.
#
# Scale shape: multi-source BFS as |hops| rounds of (frontier ⋈ edges)
# + anti-join against the settled distance set — the connected-components
# discipline host_reach_probe uses, with an origin column carried through
# so ONE pass settles all sources. Pair state is O(hosts²) rows keyed
# (origin, host): at web scale this is the HyperBall/ANF regime where the
# exact set would be replaced per-origin by the repo's HLL registers
# (hll_fold_registers) — the exact variant here is the small-graph oracle
# twin of that sketch path.

HARM_HOPS = 4
HARM_UNIT = 840  # lcm(1..8): 840/d exact for every horizon d <= 8


def host_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, n_reached, sum_dist, harmonic_x840): exact harmonic
    centrality within HARM_HOPS hops, in 1/840 units; ties (harmonic
    desc, host asc)."""
    edges = _edges(spark, sf_dir).select("src", "dst").cache()
    hosts = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    dist = hosts.select(
        F.col("host").alias("origin"),
        F.col("host"),
        F.lit(0).cast("long").alias("d"),
    ).localCheckpoint()
    frontier = dist.select("origin", "host")
    for k in range(1, HARM_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["host"] == edges["src"])
            .select("origin", F.col("dst").alias("host"))
            .distinct()
            .join(dist.select("origin", "host"), ["origin", "host"], "anti")
            .localCheckpoint()
        )
        dist = dist.union(
            nxt.withColumn("d", F.lit(k).cast("long"))
        ).localCheckpoint()
        frontier = nxt
    agg = (
        dist.filter(F.col("d") > 0)
        .groupBy("origin")
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum("d").cast("long").alias("sum_dist"),
            F.sum(F.expr(f"{HARM_UNIT} DIV d")).cast("long").alias(
                "harmonic_x840"
            ),
        )
    )
    return (
        hosts.join(agg, hosts["host"] == agg["origin"], "left")
        .select(
            "host",
            F.coalesce("n_reached", F.lit(0)).cast("long").alias("n_reached"),
            F.coalesce("sum_dist", F.lit(0)).cast("long").alias("sum_dist"),
            F.coalesce("harmonic_x840", F.lit(0))
            .cast("long")
            .alias("harmonic_x840"),
        )
        .orderBy(F.col("harmonic_x840").desc(), F.col("host").asc())
    )


def _sql_harmonic() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    parts = [
        f"""WITH e AS (
  SELECT source AS src,
         'src' || CAST({hash_doc} % {PR_FANOUT} AS VARCHAR) AS dst
  FROM documents
),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM e WHERE src <> dst
),
hosts AS MATERIALIZED (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
),
d0 AS MATERIALIZED (
  SELECT host AS origin, host, CAST(0 AS BIGINT) AS d FROM hosts
),
f0 AS MATERIALIZED (SELECT origin, host FROM d0)"""
    ]
    for k in range(1, HARM_HOPS + 1):
        parts.append(
            f""",
f{k} AS MATERIALIZED (
  SELECT DISTINCT f.origin, e.dst AS host
  FROM f{k - 1} f JOIN edges e ON e.src = f.host
  WHERE NOT EXISTS (
    SELECT 1 FROM d{k - 1} dd
    WHERE dd.origin = f.origin AND dd.host = e.dst
  )
),
d{k} AS MATERIALIZED (
  SELECT origin, host, d FROM d{k - 1}
  UNION ALL
  SELECT origin, host, CAST({k} AS BIGINT) FROM f{k}
)"""
        )
    parts.append(
        f"""
SELECT h.host,
       CAST(coalesce(a.n_reached, 0) AS BIGINT) AS n_reached,
       CAST(coalesce(a.sum_dist, 0) AS BIGINT) AS sum_dist,
       CAST(coalesce(a.h840, 0) AS BIGINT) AS harmonic_x840
FROM hosts h
LEFT JOIN (
  SELECT origin,
         CAST(count(*) AS BIGINT) AS n_reached,
         CAST(sum(d) AS BIGINT) AS sum_dist,
         CAST(sum({HARM_UNIT} // d) AS BIGINT) AS h840
  FROM d{HARM_HOPS} WHERE d > 0 GROUP BY origin
) a ON a.origin = h.host
ORDER BY harmonic_x840 DESC, h.host ASC"""
    )
    return "".join(parts)


QUERIES["host_harmonic_centrality"] = (
    host_harmonic_centrality,
    _sql_harmonic(),
)


# ---------------------------------------------- Adamic-Adar link prediction

# Adamic & Adar (2003): for a NON-adjacent host pair, score the likelihood
# of a future link by their common neighbors, down-weighting promiscuous
# ones — AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg(z)). This is the classic
# seed-list-expansion / "related sites" predictor one step up from raw
# co-citation (host_cocitation counts common neighbors unweighted); a
# focused crawler uses it to rank which unlinked host pairs belong to the
# same topical cluster.
#
# Semantics: undirected view of the weighted host digraph (an edge in
# either direction makes hosts adjacent); deg(z) = distinct undirected
# neighbors. A common neighbor structurally has deg ≥ 2, so 1/ln(deg) is
# always finite. Predicted pairs EXCLUDE already-adjacent pairs (it is
# link prediction, not edge scoring) via an anti-join on the undirected
# edge set. Per-z weight is ONE shared micro string
# (round(1e6/ln(deg))); pair scores are exact int64 sums of those.
#
# Scale shape: neighbors-of-z self-join (the wedge expansion) — the same
# frontier host_cocitation/host_triangles pay; at web scale the standard
# mitigation applies (cap per-hub neighbor lists / orient by degree as
# host_triangles does) and the final anti-join is an equi-join on the
# normalized (a < b) pair key. Top-15 bounded output, unique tie-break.

AA_TOP = 15
_AA_W = "CAST(round(1000000.0e0 / ln(1.0e0 * deg), 0) AS BIGINT)"


def host_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, host_a, host_b, n_common, aa_micro): top-15 NON-adjacent
    host pairs by Adamic-Adar common-neighbor score, per-neighbor weights
    in integer micro-units."""
    edges = _edges(spark, sf_dir)
    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count("*").cast("long").alias("deg"))
    nbrs = und.select(F.col("a").alias("z"), F.col("b").alias("n"))
    x, y = nbrs.alias("x"), nbrs.alias("y")
    wedges = (
        x.join(
            y,
            (F.col("x.z") == F.col("y.z"))
            & (F.col("x.n") < F.col("y.n")),
        )
        .select(
            F.col("x.z").alias("z"),
            F.col("x.n").alias("host_a"),
            F.col("y.n").alias("host_b"),
        )
        .join(deg.select(F.col("a").alias("z"), "deg"), "z")
        .withColumn("w", F.expr(_AA_W))
    )
    adj = und.filter(F.col("a") < F.col("b")).select(
        F.col("a").alias("host_a"), F.col("b").alias("host_b")
    )
    scored = (
        wedges.join(adj, ["host_a", "host_b"], "left_anti")
        .groupBy("host_a", "host_b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("w").cast("long").alias("aa_micro"),
        )
    )
    top = scored.orderBy(
        F.col("aa_micro").desc(), F.col("host_a").asc(), F.col("host_b").asc()
    ).limit(AA_TOP)
    w = W.orderBy(
        F.col("aa_micro").desc(), F.col("host_a").asc(), F.col("host_b").asc()
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "host_a", "host_b", "n_common", "aa_micro"
    )


def _sql_adamic_adar() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH e0 AS (
  SELECT source AS src,
         'src' || CAST({hash_doc} % {PR_FANOUT} AS VARCHAR) AS dst
  FROM documents
),
edges AS MATERIALIZED (
  SELECT src, dst FROM e0 WHERE src <> dst GROUP BY 1, 2
),
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT dst AS a, src AS b FROM edges
),
deg AS (SELECT a AS z, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
wedges AS (
  SELECT x.a AS z, x.b AS host_a, y.b AS host_b
  FROM und x JOIN und y ON x.a = y.a AND x.b < y.b
),
adj AS (SELECT a AS host_a, b AS host_b FROM und WHERE a < b),
scored AS (
  SELECT w.host_a, w.host_b,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum({_AA_W}) AS BIGINT) AS aa_micro
  FROM wedges w JOIN deg USING (z)
  WHERE NOT EXISTS (
    SELECT 1 FROM adj
    WHERE adj.host_a = w.host_a AND adj.host_b = w.host_b
  )
  GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (
         ORDER BY aa_micro DESC, host_a ASC, host_b ASC) AS INT) AS rank,
       host_a, host_b, n_common, aa_micro
FROM scored
ORDER BY aa_micro DESC, host_a ASC, host_b ASC LIMIT {AA_TOP}
"""


QUERIES["host_adamic_adar"] = (host_adamic_adar, _sql_adamic_adar())


# ------------------------------------- label-propagation communities

# Raghavan/Albert/Kumara (2007): near-linear community detection — each
# node adopts its neighborhood's most frequent label. The synthesized
# host graph is BIPARTITE (source hubs × hashed leaf hosts), where fully
# synchronous LPA provably oscillates — measured here as ANTI-modular
# partitions (Q ≈ −0.06…−0.15 at any round count). The fix is the
# standard one, Cordasco & Gargano (2010) SEMI-SYNCHRONOUS LPA: update
# one color class at a time. Each iteration runs two deterministic
# half-rounds — leaves (nodes never appearing as a source) first, from
# hub labels; then hubs, from the UPDATED leaf labels — with the argmax
# tie-break (count desc, label asc). Q ≈ +0.30 at LPA_ITERS = 4 on this
# corpus (host_labelprop_modularity pins it), vs negative for sync.
# Uses the same sparse derived-fanout synthesis as host_kcore (the
# shared 20-host graph collapses to one community and proves nothing).
#
# Scale shape per half-round: one edges⋈labels equi-join + one per-node
# argmax window restricted to the updating side + a union with the
# carried side — the connected-components / pagerank family's plan;
# labels stay a DataFrame end to end.

LPA_ITERS = 4


def host_labelprop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, label, comm_size) after {LPA_ITERS} semi-synchronous
    deterministic label-propagation iterations (leaves then hubs per
    iteration) over the sparse derived-fanout host graph."""
    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    e0 = docs.select(F.col("source").alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    und = (
        e0.select("src", "dst")
        .union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    hubs = e0.select(F.col("src").alias("host")).distinct().withColumn(
        "is_hub", F.lit(1)
    )
    labels = (
        und.select(F.col("src").alias("host"))
        .distinct()
        .join(F.broadcast(hubs), "host", "left")
        .select(
            "host",
            F.col("host").alias("label"),
            F.coalesce("is_hub", F.lit(0)).alias("is_hub"),
        )
    )
    wv = W.partitionBy("host").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )

    def half_round(labels, update_hubs: int):
        upd = (
            und.join(
                labels.select(F.col("host").alias("dst"), "label"), "dst"
            )
            .groupBy(F.col("src").alias("host"), "label")
            .agg(F.count("*").cast("long").alias("c"))
            .withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("host", F.col("label").alias("new_label"))
        )
        return (
            labels.join(upd, "host", "left")
            .select(
                "host",
                F.when(
                    F.col("is_hub") == update_hubs, F.col("new_label")
                )
                .otherwise(F.col("label"))
                .alias("label"),
                "is_hub",
            )
        )

    for _ in range(LPA_ITERS):
        labels = half_round(labels, 0).localCheckpoint()
        labels = half_round(labels, 1).localCheckpoint()
    labels = labels.select("host", "label")
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("comm_size")
    )
    return labels.join(sizes, "label").select("host", "label", "comm_size")


def _sql_labelprop(sf_dir: str) -> str:
    # fanout must match the Spark side's parquet-count derivation; the
    # oracle recomputes it from the same table (a scalar subquery).
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    rounds = []
    prev = "lab0"
    step = 0
    for _ in range(LPA_ITERS):
        for update_hubs in (0, 1):
            step += 1
            cur = f"lab{step}"
            rounds.append(f""",
{cur} AS MATERIALIZED (
  SELECT l.host,
         CASE WHEN l.is_hub = {update_hubs} THEN u.new_label
              ELSE l.label END AS label,
         l.is_hub
  FROM {prev} l
  LEFT JOIN (
    SELECT host, label AS new_label FROM (
      SELECT u.src AS host, l2.label,
             row_number() OVER (
               PARTITION BY u.src
               ORDER BY count(*) DESC, l2.label ASC) AS rn
      FROM und u JOIN {prev} l2 ON l2.host = u.dst
      GROUP BY u.src, l2.label
    ) WHERE rn = 1
  ) u ON u.host = l.host
)""")
            prev = cur
    return f"""
WITH fan AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS f FROM documents
),
e0 AS (
  SELECT source AS src,
         'h' || CAST({hash_doc} % (SELECT f FROM fan) AS VARCHAR) AS dst
  FROM documents
),
und AS MATERIALIZED (
  SELECT src, dst FROM e0 WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM e0 WHERE src <> dst
),
hubs AS (SELECT DISTINCT src AS host FROM e0 WHERE src <> dst),
lab0 AS MATERIALIZED (
  SELECT n.host, n.host AS label,
         CASE WHEN h.host IS NULL THEN 0 ELSE 1 END AS is_hub
  FROM (SELECT DISTINCT src AS host FROM und) n
  LEFT JOIN hubs h USING (host)
){"".join(rounds)},
sizes AS (
  SELECT label, CAST(count(*) AS BIGINT) AS comm_size
  FROM {prev} GROUP BY label
)
SELECT l.host, l.label, s.comm_size
FROM {prev} l JOIN sizes s USING (label)
"""


QUERIES["host_labelprop_communities"] = (
    host_labelprop_communities,
    _sql_labelprop(""),
)


# ----------------------------------------- BM25 × PageRank static prior

# The classic web-ranking fusion (Brin & Page 1998 onward; Lucene's
# FeatureField/rank_feature is the modern surface — cf. the
# ft_rank_feature_topk operator): text relevance blended with a
# query-independent authority prior, score = w_t·bm25 + w_s·ln(1 + PR).
# Text side: the ONE disjunctive kernel (bm25_or_scored), its round-6
# score recovered to exact micro integers via CAST(round(score·1e6))
# (the es_ext boosting-blend discipline). Prior side: host_pagerank's
# integer rank_unit through ONE shared ln(1+r) micro string, joined via
# documents.source. Blend = 80·bm25_micro + 20·prior_micro — exact
# int64 centi-micro units.
#
# Scale shape: the PR table is host-cardinality (broadcast); the blend
# is a map-side join on the scored frame — the serving path would fold
# the prior into the stored per-doc boost exactly like rank_feature.

PRB_W_TEXT = 80
PRB_W_STATIC = 20
_PRB_PRIOR = "CAST(round(1000000.0e0 * ln(1.0e0 + {col}), 0) AS BIGINT)"


def ft_bm25_pagerank_blend(spark, sf_dir):
    """(rank, doc_id, score_cm): top-10 docs by the 0.8·BM25 +
    0.2·ln(1+PageRank) static-prior blend, exact centi-micro units."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    pr = host_pagerank(spark, sf_dir).select(
        F.col("host"), F.col("rank_unit").alias("r")
    ).withColumn("prior_micro", F.expr(_PRB_PRIOR.format(col="r")))
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    scored = (
        bm25_or_scored(spark, sf_dir)
        .withColumn(
            "bm25_micro", F.round(F.col("score") * 1e6).cast("long")
        )
        .join(docs, "doc_id")
        .join(
            F.broadcast(pr.select(F.col("host").alias("source"), "prior_micro")),
            "source",
            "left",
        )
        .withColumn(
            "score_cm",
            (
                F.lit(PRB_W_TEXT) * F.col("bm25_micro")
                + F.lit(PRB_W_STATIC)
                * F.coalesce(F.col("prior_micro"), F.lit(0))
            ).cast("long"),
        )
    )
    top = scored.orderBy(
        F.col("score_cm").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = W.orderBy(F.col("score_cm").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score_cm"
    )


def _sql_bm25_pagerank_blend() -> str:
    from harvester_spark.operators.fulltext_queries import SQL_BM25_OR_TOPK

    # the PR oracle chain is host_pagerank's own SQL twin — reuse it as a
    # CTE and blend on top; the BM25 side rebuilds the OR kernel's full
    # scored frame (SQL_BM25_OR_TOPK truncates to 10).
    pr_sql = QUERIES["host_pagerank"][1]
    return f"""
WITH pr AS MATERIALIZED ({pr_sql}),
toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
tfs_ AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY 1, 2
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfs_ GROUP BY 1),
scored AS (
  SELECT doc_id,
         CAST(round(round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
         ), 6) * 1e6) AS BIGINT) AS bm25_micro
  FROM tfs_ t JOIN dfs USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats
  GROUP BY doc_id
),
blended AS (
  SELECT s.doc_id,
         CAST({PRB_W_TEXT} * s.bm25_micro
              + {PRB_W_STATIC} * coalesce(p.prior_micro, 0) AS BIGINT)
           AS score_cm
  FROM scored s
  JOIN documents d USING (doc_id)
  LEFT JOIN (
    SELECT host, {_PRB_PRIOR.format(col="rank_unit")} AS prior_micro
    FROM pr
  ) p ON p.host = d.source
)
SELECT CAST(row_number() OVER (ORDER BY score_cm DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score_cm
FROM blended
ORDER BY score_cm DESC, doc_id ASC LIMIT 10
"""


QUERIES["ft_bm25_pagerank_blend"] = (
    ft_bm25_pagerank_blend,
    _sql_bm25_pagerank_blend(),
)


# ------------------------------------------- partition modularity (Q)

# The external-validity score for host_labelprop_communities (what
# purity/NMI are to the k-means trainer): Newman modularity of the
# final label partition over the same sparse undirected graph,
#   Q = Σ_c (e_c/m − (d_c/2m)²)
# with m = |undirected edges|, e_c = intra-community edges, d_c = Σ
# degrees in c. Exact integer rational via the common denominator 4m²:
#   Q·4m² = Σ_c (4·m·e_c − d_c²)
# — reported as q_num/q_den plus a sign-split floored micro quotient
# (Q can be negative for anti-community partitions; Spark DIV truncates
# while DuckDB // floors, so magnitudes only). Overflow: d_c ≤ 2m and
# m ≤ edge count ≈ docs, so Σ d_c² ≤ 4m² ≈ 4e12 at 1M docs — headroom.
#
# Scale shape: the labelprop rounds (unchanged) + one edges⋈labels
# equi-join per endpoint + two tiny aggs.


def host_labelprop_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_edges, n_communities, q_num, q_den, q_micro): Newman modularity
    of the label-propagation partition, exact integer rational."""
    labels = host_labelprop_communities(spark, sf_dir).select(
        "host", "label"
    ).cache()
    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    e0 = docs.select(F.col("source").alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    # one undirected edge per unordered pair (a < b)
    und = (
        e0.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .cache()
    )
    m_df = und.agg(F.count("*").cast("long").alias("m"))
    la = labels.select(F.col("host").alias("a"), F.col("label").alias("lab_a"))
    lb = labels.select(F.col("host").alias("b"), F.col("label").alias("lab_b"))
    intra = (
        und.join(la, "a")
        .join(lb, "b")
        .filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("label"))
        .agg(F.count("*").cast("long").alias("e_c"))
    )
    deg = (
        und.select(F.col("a").alias("host"))
        .union(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("d"))
    )
    d_c = (
        deg.join(labels, "host")
        .groupBy("label")
        .agg(F.sum("d").cast("long").alias("d_c"))
    )
    per_c = d_c.join(intra, "label", "left").select(
        "label",
        "d_c",
        F.coalesce("e_c", F.lit(0)).cast("long").alias("e_c"),
    )
    num = (
        per_c.crossJoin(F.broadcast(m_df))
        .select(
            (4 * F.col("m") * F.col("e_c") - F.col("d_c") * F.col("d_c"))
            .cast("long")
            .alias("t")
        )
        .agg(
            F.sum("t").cast("long").alias("q_num"),
            F.count("*").cast("long").alias("n_communities"),
        )
    )
    return num.crossJoin(F.broadcast(m_df)).select(
        F.col("m").alias("n_edges"),
        "n_communities",
        "q_num",
        (4 * F.col("m") * F.col("m")).cast("long").alias("q_den"),
        F.expr(
            "CASE WHEN q_num >= 0 THEN (q_num * 1000000) DIV (4 * m * m)"
            " ELSE -(((-q_num) * 1000000) DIV (4 * m * m)) END"
        ).cast("long").alias("q_micro"),
    )


def _sql_labelprop_modularity() -> str:
    lp_sql = _sql_labelprop("")
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH lp AS MATERIALIZED ({lp_sql}),
fan2 AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS f FROM documents
),
e0 AS (
  SELECT source AS src,
         'h' || CAST({hash_doc} % (SELECT f FROM fan2) AS VARCHAR) AS dst
  FROM documents
),
und2 AS MATERIALIZED (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
  GROUP BY 1, 2
),
ms AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und2),
intra AS (
  SELECT la.label, CAST(count(*) AS BIGINT) AS e_c
  FROM und2 u
  JOIN lp la ON la.host = u.a
  JOIN lp lb ON lb.host = u.b
  WHERE la.label = lb.label
  GROUP BY 1
),
deg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS host FROM und2 UNION ALL SELECT b AS host FROM und2
  ) GROUP BY 1
),
dcs AS (
  SELECT l.label, CAST(sum(g.d) AS BIGINT) AS d_c
  FROM deg g JOIN lp l USING (host) GROUP BY 1
),
per_c AS (
  SELECT d.label, d.d_c, CAST(coalesce(i.e_c, 0) AS BIGINT) AS e_c
  FROM dcs d LEFT JOIN intra i USING (label)
),
agg AS (
  SELECT CAST(sum(4 * m * e_c - d_c * d_c) AS BIGINT) AS q_num,
         CAST(count(*) AS BIGINT) AS n_communities
  FROM per_c CROSS JOIN ms
)
SELECT m AS n_edges, n_communities, q_num,
       CAST(4 * m * m AS BIGINT) AS q_den,
       CAST(CASE WHEN q_num >= 0 THEN (q_num * 1000000) // (4 * m * m)
                 ELSE -(((-q_num) * 1000000) // (4 * m * m)) END
            AS BIGINT) AS q_micro
FROM agg CROSS JOIN ms
"""


QUERIES["host_labelprop_modularity"] = (
    host_labelprop_modularity,
    _sql_labelprop_modularity(),
)


# ----------------------------------------- per-community conductance

# The INTERNAL cut-quality twin of host_labelprop_modularity (Q scores
# the partition globally; conductance — Shi & Malik's normalized-cut
# score, the standard community-quality measure of Leskovec et al.'s
# NCP plots — scores each community): for community C over the same
# sparse undirected graph,
#   phi(C) = cut(C) / min(vol(C), 2m − vol(C))
# with vol(C) = Σ degrees = d_c and cut(C) = d_c − 2·e_c (every intra
# edge absorbs 2 of the volume; whatever degree is left crosses the
# boundary). All three terms come straight from modularity's per_c
# frame — exact int64 — and the ratio is a floored micro division
# (cut ≥ 0 and volumes > 0, so no sign split; a community spanning the
# whole graph has min-vol 0 and NULL phi, documented).
#
# Scale shape: identical to host_labelprop_modularity — the LPA rounds
# plus two label equi-joins and per-label aggs; output is
# community-cardinality.


def host_community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_hosts, e_c, d_c, cut, phi_micro): per-LPA-community
    intra edges, volume, boundary cut, and conductance in micro-units."""
    labels = host_labelprop_communities(spark, sf_dir).select(
        "host", "label"
    ).cache()
    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    e0 = docs.select(F.col("source").alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    und = (
        e0.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .cache()
    )
    m_df = F.broadcast(und.agg(F.count("*").cast("long").alias("m")))
    la = labels.select(F.col("host").alias("a"), F.col("label").alias("lab_a"))
    lb = labels.select(F.col("host").alias("b"), F.col("label").alias("lab_b"))
    intra = (
        und.join(la, "a")
        .join(lb, "b")
        .filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("label"))
        .agg(F.count("*").cast("long").alias("e_c"))
    )
    deg = (
        und.select(F.col("a").alias("host"))
        .union(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("d"))
    )
    per_c = (
        deg.join(labels, "host")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.sum("d").cast("long").alias("d_c"),
        )
        .join(intra, "label", "left")
        .select(
            "label",
            "n_hosts",
            F.coalesce("e_c", F.lit(0)).cast("long").alias("e_c"),
            "d_c",
        )
    )
    return per_c.crossJoin(m_df).select(
        "label",
        "n_hosts",
        "e_c",
        "d_c",
        (F.col("d_c") - 2 * F.col("e_c")).cast("long").alias("cut"),
        F.expr(
            "CASE WHEN least(d_c, 2 * m - d_c) = 0 THEN NULL"
            " ELSE CAST((1000000 * (d_c - 2 * e_c))"
            " DIV least(d_c, 2 * m - d_c) AS BIGINT) END"
        ).alias("phi_micro"),
    )


def _sql_community_conductance() -> str:
    lp_sql = _sql_labelprop("")
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH lp AS MATERIALIZED ({lp_sql}),
fan2 AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS f FROM documents
),
e0 AS (
  SELECT source AS src,
         'h' || CAST({hash_doc} % (SELECT f FROM fan2) AS VARCHAR) AS dst
  FROM documents
),
und2 AS MATERIALIZED (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
  GROUP BY 1, 2
),
ms AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und2),
intra AS (
  SELECT la.label, CAST(count(*) AS BIGINT) AS e_c
  FROM und2 u
  JOIN lp la ON la.host = u.a
  JOIN lp lb ON lb.host = u.b
  WHERE la.label = lb.label
  GROUP BY 1
),
deg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS host FROM und2 UNION ALL SELECT b AS host FROM und2
  ) GROUP BY 1
),
per_c AS (
  SELECT l.label, CAST(count(*) AS BIGINT) AS n_hosts,
         CAST(sum(g.d) AS BIGINT) AS d_c
  FROM deg g JOIN lp l USING (host) GROUP BY 1
),
joined AS (
  SELECT p.label, p.n_hosts, CAST(coalesce(i.e_c, 0) AS BIGINT) AS e_c,
         p.d_c
  FROM per_c p LEFT JOIN intra i USING (label)
)
SELECT label, n_hosts, e_c, d_c,
       CAST(d_c - 2 * e_c AS BIGINT) AS cut,
       CASE WHEN least(d_c, 2 * m - d_c) = 0 THEN NULL
            ELSE CAST((1000000 * (d_c - 2 * e_c))
                 // least(d_c, 2 * m - d_c) AS BIGINT) END AS phi_micro
FROM joined CROSS JOIN ms
"""


QUERIES["host_community_conductance"] = (
    host_community_conductance,
    _sql_community_conductance(),
)


# ------------------------------------------------ bow-tie decomposition

# Broder et al. (WWW 2000) "Graph structure in the web": classify hosts
# into the bow-tie components relative to the seed's strongly-connected
# core — CORE (reaches the seed AND is reached by it), IN (reaches the
# seed only), OUT (reached from the seed only), DISC (neither) — the
# macro-map every crawl scheduler draws before allocating frontier
# budget. Reachability is the BOUNDED {BT_HOPS}-hop probe in each
# direction (the host_reach_probe contract: web diameters make the
# bounded probe the production form; exact SCC needs unbounded
# iteration, documented).
#
# The shared hub→leaf synthesis is a DAG (no cycles → the seed's SCC
# would be trivially {{seed}}), so the graph here adds a REVERSE draw:
# each doc contributes hub→h(md5(doc)) and h(md5('rev|'doc))→hub —
# two independent hash scatters that close hub→leaf→hub cycles and give
# all four classes real mass (test-pinned non-degeneracy).
#
# Deterministic seed: max total degree, host-asc tie-break. Scale shape
# per hop: one edges⋈frontier equi-join + distinct (the pagerank-family
# plan); the two directions are independent (a real run shares one
# job); classification is two left-semi flags on the host dimension.

BT_HOPS = 4


def _bt_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    fwd_dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    rev_src = F.concat(
        F.lit("h"),
        (
            _hash56(F.concat(F.lit("rev|"), F.col("doc_id").cast("string")))
            % fan
        ).cast("string"),
    )
    e = docs.select(
        F.col("source").alias("src"), fwd_dst.alias("dst")
    ).unionByName(
        docs.select(rev_src.alias("src"), F.col("source").alias("dst"))
    )
    return e.filter(F.col("src") != F.col("dst")).distinct()


def host_bowtie_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, in_fwd, in_bwd, cls): bow-tie class of every host relative
    to the max-degree seed under {BT_HOPS}-hop bounded reachability."""
    edges = _bt_edges(spark, sf_dir).cache()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .cache()
    )
    deg = (
        edges.select(F.col("src").alias("host"))
        .unionAll(edges.select(F.col("dst").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    seed = (
        deg.orderBy(F.col("deg").desc(), F.col("host").asc())
        .limit(1)
        .select("host")
        .localCheckpoint()
    )
    fwd = seed
    for _ in range(BT_HOPS):
        step = (
            edges.join(
                fwd.withColumnRenamed("host", "src"), "src"
            ).select(F.col("dst").alias("host"))
        )
        fwd = fwd.union(step).distinct().localCheckpoint()
    bwd = seed
    for _ in range(BT_HOPS):
        step = (
            edges.join(
                bwd.withColumnRenamed("host", "dst"), "dst"
            ).select(F.col("src").alias("host"))
        )
        bwd = bwd.union(step).distinct().localCheckpoint()
    out = (
        nodes.join(
            fwd.withColumn("in_fwd", F.lit(True)), "host", "left"
        )
        .join(bwd.withColumn("in_bwd", F.lit(True)), "host", "left")
        .select(
            "host",
            F.coalesce("in_fwd", F.lit(False)).alias("in_fwd"),
            F.coalesce("in_bwd", F.lit(False)).alias("in_bwd"),
        )
    )
    return out.withColumn(
        "cls",
        F.expr(
            "CASE WHEN in_fwd AND in_bwd THEN 'CORE'"
            " WHEN in_bwd THEN 'IN'"
            " WHEN in_fwd THEN 'OUT'"
            " ELSE 'DISC' END"
        ),
    )


def _sql_bowtie() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    hash_rev = _SQL_HASH56.format(col="'rev|' || CAST(doc_id AS VARCHAR)")
    parts = [f"""
WITH fanb AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS f FROM documents
),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT source AS src,
           'h' || CAST({hash_doc} % (SELECT f FROM fanb) AS VARCHAR) AS dst
    FROM documents
    UNION ALL
    SELECT 'h' || CAST({hash_rev} % (SELECT f FROM fanb) AS VARCHAR) AS src,
           source AS dst
    FROM documents
  ) WHERE src <> dst
),
nodes AS MATERIALIZED (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
),
seed AS MATERIALIZED (
  SELECT host FROM (
    SELECT host, CAST(count(*) AS BIGINT) AS deg FROM (
      SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges
    ) GROUP BY 1
  ) ORDER BY deg DESC, host ASC LIMIT 1
),
f0 AS (SELECT host FROM seed),
b0 AS (SELECT host FROM seed)"""]
    for k in range(1, BT_HOPS + 1):
        parts.append(f""",
f{k} AS MATERIALIZED (
  SELECT host FROM f{k - 1}
  UNION
  SELECT e.dst FROM edges e JOIN f{k - 1} r ON e.src = r.host
),
b{k} AS MATERIALIZED (
  SELECT host FROM b{k - 1}
  UNION
  SELECT e.src FROM edges e JOIN b{k - 1} r ON e.dst = r.host
)""")
    parts.append(f"""
SELECT n.host,
       (f.host IS NOT NULL) AS in_fwd,
       (b.host IS NOT NULL) AS in_bwd,
       CASE WHEN f.host IS NOT NULL AND b.host IS NOT NULL THEN 'CORE'
            WHEN b.host IS NOT NULL THEN 'IN'
            WHEN f.host IS NOT NULL THEN 'OUT'
            ELSE 'DISC' END AS cls
FROM nodes n
LEFT JOIN f{BT_HOPS} f ON f.host = n.host
LEFT JOIN b{BT_HOPS} b ON b.host = n.host""")
    return "".join(parts)


QUERIES["host_bowtie_classify"] = (host_bowtie_classify, _sql_bowtie())


# ------------------------------------- degree distribution + CSN MLE

# Clauset, Shalizi & Newman (SIAM Rev 2009) power-law fitting over the
# host graph's degree distribution — the sanity check behind every
# "the web is scale-free" assumption a crawl planner makes (budget
# allocation, cache sizing, salting thresholds all key on the degree
# tail): the degree histogram, the exact CCDF, and the continuous-
# approximation MLE exponent α = 1 + n / Σᵢ ln(dᵢ / (d_min − ½)) at
# d_min = 1 (so each node contributes ln(2·dᵢ)). The synthesized graph
# is two-scale (hash leaves ≈ 1-2, source hubs ≈ n/40) rather than a
# clean power law — the estimator surface is what's tested (exact
# recompute); the hub/leaf bimodality is itself pinned (the CCDF has a
# real tail step).
#
# Determinism: degrees and histogram are exact BIGINTs; per-degree
# ln(2d) micro-nats through ONE shared string, summed as n_d-weighted
# integers; α_micro = 1e6 + (1e12·n) DIV T_micro; CCDF is a floored
# milli division over a degree-ordered window.
#
# Scale shape: one degree agg + one degree-histogram agg (both
# map-side combinable) + a window over the DISTINCT-degree frame
# (bounded by max degree, not node count).

_PL_LN2D_MICRO = (
    "CAST(floor(ln(2.0e0 * d) * 1.0e6 + 0.5e0) AS BIGINT)"
)


def host_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, n_d, cum_ge, ccdf_milli, alpha_micro): degree histogram,
    exact CCDF, and the CSN continuous-MLE power-law exponent of the
    sparse host graph."""
    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    e0 = docs.select(F.col("source").alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    und = e0.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("host"))
        .union(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("d"))
    )
    hist = deg.groupBy("d").agg(F.count("*").cast("long").alias("n_d"))
    tot = F.broadcast(
        hist.agg(
            F.sum("n_d").cast("long").alias("n"),
            F.sum(F.expr(f"n_d * {_PL_LN2D_MICRO}"))
            .cast("long")
            .alias("t_micro"),
        )
    )
    wd = W.orderBy(F.col("d").desc()).rowsBetween(W.unboundedPreceding, 0)
    return (
        hist.withColumn("cum_ge", F.sum("n_d").over(wd).cast("long"))
        .crossJoin(tot)
        .select(
            "d",
            "n_d",
            "cum_ge",
            F.expr("CAST((1000 * cum_ge) DIV n AS BIGINT)").alias(
                "ccdf_milli"
            ),
            F.expr(
                "CAST(1000000 + (1000000000000 * n) DIV t_micro AS BIGINT)"
            ).alias("alpha_micro"),
        )
    )


def _sql_degree_powerlaw() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH fanp AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS f FROM documents
),
e0 AS (
  SELECT source AS src,
         'h' || CAST({hash_doc} % (SELECT f FROM fanp) AS VARCHAR) AS dst
  FROM documents
),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst GROUP BY 1, 2
),
deg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS host FROM und UNION ALL SELECT b AS host FROM und
  ) GROUP BY 1
),
hist AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n_d FROM deg GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_d) AS BIGINT) AS n,
         CAST(sum(n_d * {_PL_LN2D_MICRO}) AS BIGINT) AS t_micro
  FROM hist
)
SELECT d, n_d,
       CAST(sum(n_d) OVER (ORDER BY d DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_ge,
       CAST((1000 * sum(n_d) OVER (ORDER BY d DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) // n AS BIGINT)
         AS ccdf_milli,
       CAST(1000000 + (1000000000000 * n) // t_micro AS BIGINT)
         AS alpha_micro
FROM hist CROSS JOIN tot
"""


QUERIES["host_degree_powerlaw"] = (
    host_degree_powerlaw,
    _sql_degree_powerlaw(),
)


# ------------------------------------------- max-min fair crawl shares

# Max-min fairness / progressive filling (Bertsekas & Gallager) for
# crawl capacity: hosts demand fetches (their document counts), the
# crawler has capacity for half the total, and the water-filling
# allocation gives every host min(demand, λ) with λ the unique level
# exhausting capacity — small hosts are served in full, big hosts share
# the remainder equally. The integer closed form replaces the iterative
# filling: with demands sorted ascending (rank i, prefix sums P_i),
# rank i is "feasible" iff P_{i−1} + (n−i+1)·d_i ≤ C; the largest
# feasible k gets ranks ≤ k their full demand, and the n−k capped hosts
# split C − P_k as base = DIV and the remainder as +1 to the first
# (C−P_k) mod (n−k) capped ranks (deterministic, documented). The
# complement of crawl_budget_allocate (which splits by PageRank
# priority; this splits by fairness — real schedulers blend both).
#
# Determinism: pure int64 arithmetic; ranks tie-break (demand, host).
# Invariants pinned by pytest: Σ alloc == min(C, Σ demand) EXACTLY;
# capped allocations differ by ≤ 1 (the max-min property); no host
# exceeds its demand.
#
# Scale shape: one demand agg, one rank window over the HOST dimension
# (at 10^8 hosts: the token_budget_select histogram + boundary-bucket
# order-statistic selection — same shape, documented), two scalar aggs.


def crawl_maxmin_fairshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, demand, rank, alloc, capped): integer water-filling
    allocation of half the total fetch demand across hosts."""
    # demand = docs × a planted per-host refresh-rate multiplier (1..8,
    # md5): the raw per-host doc counts are near-UNIFORM on this corpus
    # (≈25 each), which makes water-filling degenerate — k = 0, nobody
    # served in full (the pytest caught it); the multiplier gives the
    # allocation both regimes to exercise.
    dem = (
        load(spark, sf_dir, "documents")
        .groupBy(F.col("source").alias("host"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            "host",
            (
                F.col("n_docs")
                * (1 + _hash56(F.concat(F.lit("dm|"), F.col("host"))) % 8)
            ).cast("long").alias("demand"),
        )
    )
    cap = F.broadcast(
        dem.agg(
            F.expr("CAST(sum(demand) DIV 2 AS BIGINT)").alias("c"),
            F.count("*").cast("long").alias("n"),
            F.sum("demand").cast("long").alias("td"),
        )
    )
    wr = W.orderBy(F.col("demand").asc(), F.col("host").asc())
    ranked = (
        dem.withColumn("rank", F.row_number().over(wr).cast("long"))
        .withColumn(
            "prefix",
            F.sum("demand").over(wr.rowsBetween(W.unboundedPreceding, 0))
            .cast("long"),
        )
        .crossJoin(cap)
        .withColumn(
            "feasible",
            F.expr("prefix - demand + (n - rank + 1) * demand <= c"),
        )
    ).cache()
    kdf = F.broadcast(
        ranked.agg(
            F.coalesce(
                F.max(F.when(F.col("feasible"), F.col("rank"))), F.lit(0)
            ).cast("long").alias("k"),
            F.coalesce(
                F.max(F.when(F.col("feasible"), F.col("prefix"))), F.lit(0)
            ).cast("long").alias("pk"),
        )
    )
    return ranked.crossJoin(kdf).select(
        "host",
        "demand",
        "rank",
        F.expr(
            "CAST(CASE WHEN td <= c THEN demand"
            " WHEN rank <= k THEN demand"
            " ELSE (c - pk) DIV (n - k)"
            " + CASE WHEN rank - k <= (c - pk) % (n - k) THEN 1 ELSE 0 END"
            " END AS BIGINT)"
        ).alias("alloc"),
        F.expr("td > c AND rank > k").alias("capped"),
    )


def _sql_maxmin() -> str:
    return """
WITH dem AS (
  SELECT host,
         CAST(n_docs * (1 + CAST(('0x' || substr(md5('dm|' || host), 1, 14)) AS BIGINT) % 8) AS BIGINT) AS demand
  FROM (
    SELECT source AS host, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
  )
),
cap AS (
  SELECT CAST(sum(demand) // 2 AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(demand) AS BIGINT) AS td
  FROM dem
),
ranked AS MATERIALIZED (
  SELECT host, demand,
         CAST(row_number() OVER w AS BIGINT) AS rank,
         CAST(sum(demand) OVER (
           w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS prefix,
         c, n, td,
         (CAST(sum(demand) OVER (
            w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          ) AS BIGINT) - demand
          + (n - row_number() OVER w + 1) * demand) <= c AS feasible
  FROM dem CROSS JOIN cap
  WINDOW w AS (ORDER BY demand ASC, host ASC)
),
kk AS (
  SELECT CAST(coalesce(max(CASE WHEN feasible THEN rank END), 0) AS BIGINT)
           AS k,
         CAST(coalesce(max(CASE WHEN feasible THEN prefix END), 0)
              AS BIGINT) AS pk
  FROM ranked
)
SELECT host, demand, rank,
       CAST(CASE WHEN td <= c THEN demand
            WHEN rank <= k THEN demand
            ELSE (c - pk) // (n - k)
            + CASE WHEN rank - k <= (c - pk) % (n - k) THEN 1 ELSE 0 END
            END AS BIGINT) AS alloc,
       td > c AND rank > k AS capped
FROM ranked CROSS JOIN kk
"""


QUERIES["crawl_maxmin_fairshare"] = (crawl_maxmin_fairshare, _sql_maxmin())


# --------------------------------------------- damping-factor sweep

# PageRank's one tunable swept in a SINGLE job (the bm25_grid_tune_eval
# discipline applied to the graph side): three damping factors
# {70, 85, 95}% run as three integer fixed-point walks carried as
# EXTRA COLUMNS on the same per-iteration edge join + groupBy — the
# host_trustrank two-walk pattern generalized, so the sweep costs one
# extra int64 column per grid point, not one extra pass over the graph.
# The d = 85 column is BIT-IDENTICAL to host_pagerank's output (the
# cross-operator identity the pytest pins), and the sweep's read-out —
# how much the induced ranking reorders as damping rises — is the
# sensitivity a link-spam analyst actually checks.
#
# Same integer contract as host_pagerank: multiply-then-integer-divide
# on nonnegative int64, per-damping dangling redistribution,
# localCheckpoint lineage cuts.

PR_SWEEP = (70, 85, 95)


def pagerank_damping_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, r70, r85, r95): integer PageRank mass per host under the
    three swept damping factors, one shared edge scan per iteration."""
    edges = _edges(spark, sf_dir).cache()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    n_df = F.broadcast(nodes.agg(F.count("*").cast("long").alias("n")))

    ranks = nodes.crossJoin(n_df).select(
        "host",
        *[
            F.expr(f"CAST({PR_UNIT} DIV n AS BIGINT)").alias(f"r{d}")
            for d in PR_SWEEP
        ],
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(
                ranks.select(
                    F.col("host").alias("src"),
                    *[f"r{d}" for d in PR_SWEEP],
                ),
                "src",
            )
            .join(outw, "src")
            .select(
                F.col("dst").alias("host"),
                *[
                    F.expr(f"({d} * r{d} * w) DIV (100 * wout)").alias(f"c{d}")
                    for d in PR_SWEEP
                ],
            )
            .groupBy("host")
            .agg(
                *[
                    F.sum(f"c{d}").cast("long").alias(f"c{d}")
                    for d in PR_SWEEP
                ]
            )
        )
        dang = F.broadcast(
            ranks.join(outw, ranks["host"] == outw["src"], "left_anti").agg(
                *[
                    F.coalesce(F.sum(f"r{d}"), F.lit(0))
                    .cast("long")
                    .alias(f"dg{d}")
                    for d in PR_SWEEP
                ]
            )
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .crossJoin(dang)
            .crossJoin(n_df)
            .select(
                "host",
                *[
                    F.expr(
                        f"CAST({(100 - d) * PR_UNIT} DIV (100 * n)"
                        f" + ({d} * dg{d}) DIV (100 * n)"
                        f" + coalesce(c{d}, CAST(0 AS BIGINT)) AS BIGINT)"
                    ).alias(f"r{d}")
                    for d in PR_SWEEP
                ],
            )
            .localCheckpoint()
        )
    return ranks.select(
        "host", *[F.col(f"r{d}").alias(f"r{d}") for d in PR_SWEEP]
    )


def _sql_pr_sweep() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    init_cols = ",\n         ".join(
        f"CAST({PR_UNIT} // n AS BIGINT) AS r{d}" for d in PR_SWEEP
    )
    parts = [f"""WITH e AS (
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
  SELECT host,
         {init_cols}
  FROM nodes CROSS JOIN nn
)"""]
    for k in range(1, PR_ITERS + 1):
        csel = ",\n         ".join(
            f"CAST(sum(({d} * r.r{d} * e.w) // (100 * o.wout)) AS BIGINT)"
            f" AS c{d}"
            for d in PR_SWEEP
        )
        dsel = ",\n         ".join(
            f"CAST(coalesce(sum(r.r{d}), 0) AS BIGINT) AS dg{d}"
            for d in PR_SWEEP
        )
        rsel = ",\n         ".join(
            f"CAST({(100 - d) * PR_UNIT} // (100 * n)"
            f" + ({d} * dg{d}) // (100 * n)"
            f" + coalesce(c{d}, CAST(0 AS BIGINT)) AS BIGINT) AS r{d}"
            for d in PR_SWEEP
        )
        parts.append(f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS host,
         {csel}
  FROM edges e JOIN it{k - 1} r ON e.src = r.host JOIN outw o ON e.src = o.src
  GROUP BY 1
),
d{k} AS MATERIALIZED (
  SELECT {dsel}
  FROM it{k - 1} r LEFT JOIN outw o ON r.host = o.src WHERE o.src IS NULL
),
it{k} AS MATERIALIZED (
  SELECT nodes.host,
         {rsel}
  FROM nodes LEFT JOIN c{k} USING (host) CROSS JOIN d{k} CROSS JOIN nn
)""")
    cols = ", ".join(f"r{d}" for d in PR_SWEEP)
    parts.append(f"\nSELECT host, {cols} FROM it{PR_ITERS}")
    return "".join(parts)


QUERIES["pagerank_damping_sweep"] = (pagerank_damping_sweep, _sql_pr_sweep())


# ----------------------------------------------- HyperBall / ANF

# Palmer-Gibbons-Faloutsos ANF via Boldi-Vigna HyperBall (WSDM 2011) —
# THE distributed algorithm for neighborhood functions and effective
# diameter on web graphs: every node carries a 256-register HyperLogLog
# of its ≤h-hop ball, and one hop is ONE edge join + a (node, bucket)
# register max — the register file is the mergeable state, exactly the
# windowed_user_hll discipline lifted onto graph iteration. Runs
# HB_HOPS hops on the sparse undirected host graph and emits every
# node's per-depth register digest + estimate (the fold is the shared
# sketches.hll_fold_registers algebra, s_num an exact int64 so both
# engines agree bit-for-bit; only the final estimate division is the
# ONE shared float string).
#
# Pinned invariants: est is non-decreasing in h per node (registers
# only grow), h=0 estimates 1 exactly (LinearCounting at a single
# filled register), and the pytest BFS-recomputes every TRUE ball size
# and bounds the relative error at the 1.04/√256 scale.
#
# Scale shape per hop: one edges⋈registers equi-join + one
# map-side-combinable max agg — state is nodes×256 rows, never
# ball-sized; the classic trillion-edge formulation is this exact plan.

HB_HOPS = 3


def host_hyperball_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, h, n_registers, v_zero, s_num, est): per-node HyperLogLog
    ball-size digests for hop depths 0..{HB_HOPS} over the sparse
    undirected host graph."""
    from harvester_spark.operators.sketches import (
        HLL_M,
        _rho_case,
        hll_fold_registers,
    )

    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    e0 = docs.select(F.col("source").alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    und = (
        e0.select("src", "dst")
        .union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    nodes = und.select(F.col("src").alias("host")).distinct()
    hv = _hash56(F.col("host"))
    # the rho CASE expression needs the raw hash bound as a column first
    reg = (
        nodes.withColumn("h56", hv)
        .select(
            "host",
            (F.col("h56") % HLL_M).cast("long").alias("bucket"),
            F.expr(f"CAST({_rho_case(f'(h56 DIV {HLL_M})')} AS BIGINT)")
            .alias("r"),
        )
        .localCheckpoint()
    )
    out = hll_fold_registers(reg, "host").withColumn(
        "h", F.lit(0).cast("int")
    )
    for k in range(1, HB_HOPS + 1):
        nbr = (
            und.join(reg.withColumnRenamed("host", "dst"), "dst")
            .select(F.col("src").alias("host"), "bucket", "r")
        )
        reg = (
            reg.unionByName(nbr)
            .groupBy("host", "bucket")
            .agg(F.max("r").alias("r"))
            .localCheckpoint()
        )
        out = out.unionByName(
            hll_fold_registers(reg, "host").withColumn(
                "h", F.lit(k).cast("int")
            )
        )
    return out.select("host", "h", "n_registers", "v_zero", "s_num", "est")


def _sql_hyperball() -> str:
    from harvester_spark.operators.sketches import (
        _HLL_C,
        _HLL_RMAX,
        HLL_M,
        _rho_case,
    )

    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    hash_host = _SQL_HASH56.format(col="host")
    fold = f"""
  SELECT host, {{h}} AS h, CAST(count(*) AS BIGINT) AS n_registers,
         CAST({HLL_M} - count(*) AS BIGINT) AS v_zero,
         CAST(sum(CAST(power(2, {_HLL_RMAX} - r) AS BIGINT))
              + ({HLL_M} - count(*)) * CAST(power(2, {_HLL_RMAX}) AS BIGINT)
              AS BIGINT) AS s_num
  FROM reg{{k}} GROUP BY host"""
    parts = [f"""
WITH fanh AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS f FROM documents
),
e0 AS (
  SELECT source AS src,
         'h' || CAST({hash_doc} % (SELECT f FROM fanh) AS VARCHAR) AS dst
  FROM documents
),
und AS MATERIALIZED (
  SELECT src, dst FROM e0 WHERE src <> dst
  UNION
  SELECT dst, src FROM e0 WHERE src <> dst
),
nodes AS (SELECT DISTINCT src AS host FROM und),
reg0 AS MATERIALIZED (
  SELECT host, CAST(h56 % {HLL_M} AS BIGINT) AS bucket,
         CAST({_rho_case(f"(h56 // {HLL_M})")} AS BIGINT) AS r
  FROM (SELECT host, {hash_host} AS h56 FROM nodes)
)"""]
    for k in range(1, HB_HOPS + 1):
        parts.append(f""",
reg{k} AS MATERIALIZED (
  SELECT host, bucket, max(r) AS r FROM (
    SELECT host, bucket, r FROM reg{k - 1}
    UNION ALL
    SELECT u.src AS host, p.bucket, p.r
    FROM und u JOIN reg{k - 1} p ON p.host = u.dst
  ) GROUP BY 1, 2
)""")
    folds = []
    for k in range(0, HB_HOPS + 1):
        folds.append(
            f"SELECT host, h, n_registers, v_zero, s_num,\n"
            f"       round(CASE WHEN {_HLL_C} / s_num <= {2.5 * HLL_M}"
            f" AND v_zero > 0\n"
            f"       THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v_zero)\n"
            f"       ELSE {_HLL_C} / s_num END, 6) AS est\n"
            f"FROM ({fold.format(h=k, k=k)})"
        )
    parts.append("\n" + "\nUNION ALL\n".join(folds))
    return "".join(parts)


QUERIES["host_hyperball_anf"] = (host_hyperball_anf, _sql_hyperball())


# ------------------------------------------ bipartite modularity (Q_B)

# Barber (PRE 2007) bipartite modularity — the CORRECT null model for
# this repo's host graphs, which are all hub×leaf BIPARTITE by
# construction (every docstring from LPA to rich-club has noted it;
# Newman's null allows impossible hub-hub edges and so systematically
# misjudges the partition): Q_B = (1/m)·Σ_c (e_c − K_c·D_c/m) with
# K_c / D_c the community's HUB and LEAF degree sums and e_c its intra
# edges. Exact integer rational over the common denominator m²:
# Q_B·m² = Σ_c (m·e_c − K_c·D_c), plus the sign-split micro quotient —
# the host_labelprop_modularity contract with the bipartite null. The
# pytest pins the substantive claim: Q_B ≥ the Newman Q on the same
# partition (the unipartite null wastes probability mass on forbidden
# hub-hub / leaf-leaf edges, deflating Q on bipartite graphs).
#
# Scale shape: the LPA rounds (unchanged) + one edges⋈labels join per
# side + per-community aggs — identical to the Newman twin.


def host_bipartite_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_edges, n_communities, qb_num, qb_den, qb_micro): Barber
    bipartite modularity of the label-propagation partition, exact
    integer rational."""
    labels = host_labelprop_communities(spark, sf_dir).select(
        "host", "label"
    ).cache()
    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    # bipartite edge list: hub (source) side × leaf (hashed) side,
    # deduplicated — m counts DISTINCT hub-leaf pairs
    e0 = (
        docs.select(F.col("source").alias("hub"), dst.alias("leaf"))
        .filter(F.col("hub") != F.col("leaf"))
        .distinct()
        .cache()
    )
    m_df = F.broadcast(e0.agg(F.count("*").cast("long").alias("m")))
    lh = labels.select(F.col("host").alias("hub"), F.col("label").alias("lab_h"))
    ll = labels.select(F.col("host").alias("leaf"), F.col("label").alias("lab_l"))
    tagged = e0.join(lh, "hub").join(ll, "leaf").cache()
    e_c = (
        tagged.filter(F.col("lab_h") == F.col("lab_l"))
        .groupBy(F.col("lab_h").alias("label"))
        .agg(F.count("*").cast("long").alias("e_c"))
    )
    k_c = (
        tagged.groupBy(F.col("lab_h").alias("label"))
        .agg(F.count("*").cast("long").alias("k_c"))
    )
    d_c = (
        tagged.groupBy(F.col("lab_l").alias("label"))
        .agg(F.count("*").cast("long").alias("d_c"))
    )
    per_c = (
        k_c.join(d_c, "label", "full")
        .join(e_c, "label", "left")
        .select(
            "label",
            F.coalesce("k_c", F.lit(0)).cast("long").alias("k_c"),
            F.coalesce("d_c", F.lit(0)).cast("long").alias("d_c"),
            F.coalesce("e_c", F.lit(0)).cast("long").alias("e_c"),
        )
    )
    agg = per_c.crossJoin(m_df).agg(
        F.sum(
            F.expr("m * e_c - k_c * d_c")
        ).cast("long").alias("qb_num"),
        F.count("*").cast("long").alias("n_communities"),
    )
    return agg.crossJoin(m_df).select(
        F.col("m").alias("n_edges"),
        "n_communities",
        "qb_num",
        (F.col("m") * F.col("m")).cast("long").alias("qb_den"),
        F.expr(
            "CASE WHEN qb_num >= 0 THEN CAST((qb_num * 1000000) DIV (m * m)"
            " AS BIGINT)"
            " ELSE CAST(-(((-qb_num) * 1000000) DIV (m * m)) AS BIGINT) END"
        ).alias("qb_micro"),
    )


def _sql_bipartite_modularity() -> str:
    lp_sql = _sql_labelprop("")
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH lp AS MATERIALIZED ({lp_sql}),
fanb2 AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS f FROM documents
),
e0 AS MATERIALIZED (
  SELECT DISTINCT source AS hub,
         'h' || CAST({hash_doc} % (SELECT f FROM fanb2) AS VARCHAR) AS leaf
  FROM documents
  WHERE source <> 'h' || CAST({hash_doc} % (SELECT f FROM fanb2) AS VARCHAR)
),
ms AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
tagged AS MATERIALIZED (
  SELECT e.hub, e.leaf, lh.label AS lab_h, ll.label AS lab_l
  FROM e0 e
  JOIN lp lh ON lh.host = e.hub
  JOIN lp ll ON ll.host = e.leaf
),
ec AS (
  SELECT lab_h AS label, CAST(count(*) AS BIGINT) AS e_c
  FROM tagged WHERE lab_h = lab_l GROUP BY 1
),
kc AS (
  SELECT lab_h AS label, CAST(count(*) AS BIGINT) AS k_c
  FROM tagged GROUP BY 1
),
dc AS (
  SELECT lab_l AS label, CAST(count(*) AS BIGINT) AS d_c
  FROM tagged GROUP BY 1
),
per_c AS (
  SELECT coalesce(kc.label, dc.label) AS label,
         CAST(coalesce(kc.k_c, 0) AS BIGINT) AS k_c,
         CAST(coalesce(dc.d_c, 0) AS BIGINT) AS d_c
  FROM kc FULL JOIN dc USING (label)
),
joined AS (
  SELECT p.label, p.k_c, p.d_c, CAST(coalesce(ec.e_c, 0) AS BIGINT) AS e_c
  FROM per_c p LEFT JOIN ec USING (label)
),
agg AS (
  SELECT CAST(sum(m * e_c - k_c * d_c) AS BIGINT) AS qb_num,
         CAST(count(*) AS BIGINT) AS n_communities
  FROM joined CROSS JOIN ms
)
SELECT m AS n_edges, n_communities, qb_num,
       CAST(m * m AS BIGINT) AS qb_den,
       CAST(CASE WHEN qb_num >= 0 THEN (qb_num * 1000000) // (m * m)
                 ELSE -(((-qb_num) * 1000000) // (m * m)) END
            AS BIGINT) AS qb_micro
FROM agg CROSS JOIN ms
"""


QUERIES["host_bipartite_modularity"] = (
    host_bipartite_modularity,
    _sql_bipartite_modularity(),
)


# ------------------------------------------- percolation robustness

# Bond-percolation robustness of the crawl graph (Callaway et al.,
# PRL 2000 — the question behind "how much of the link graph can we
# lose before discovery fragments"): md5-subsample the undirected edge
# set at retention levels {PERC_LEVELS}‰, and measure the largest
# connected component at each level via {PERC_ROUNDS} rounds of
# min-label propagation. The round budget is FIXED at {PERC_ROUNDS}
# so both engines run the identical computation — the measured
# convergence on this graph family is 11 rounds at the lowest
# retention (fragmented components have long paths; the first draft's
# 6 rounds under-converged and the union-find pytest caught it);
# at unbounded scale the dedup pointer-jumping CC (O(log d) rounds)
# is the right kernel, documented.
# Output per level: nodes with any retained edge, the largest CC, and
# its share. Pinned: the giant component's share is monotone in
# retention and spans a real range (near-total at 750‰, genuinely
# fragmented at 250‰).
#
# Scale shape per round: one edges⋈labels join + per-node min agg —
# pagerank-family; the three levels ride ONE unioned edge frame keyed
# by level (one job, three walks — the damping-sweep discipline).

PERC_LEVELS = (100, 250, 500, 750)
PERC_ROUNDS = 16


def host_percolation_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(level_permille, n_nodes, largest_cc, share_milli): giant-
    component size under md5 edge retention at each level."""
    docs = load(spark, sf_dir, "documents")
    fan = max(docs.count() // 2, 20)
    dst = F.concat(
        F.lit("h"),
        (_hash56(F.col("doc_id").cast("string")) % fan).cast("string"),
    )
    e0 = (
        docs.select(F.col("source").alias("a"), dst.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    levels = spark.createDataFrame(
        [(q,) for q in PERC_LEVELS], "level long"
    )
    kept = (
        e0.crossJoin(F.broadcast(levels))
        .filter(
            _hash56(
                F.concat_ws("|", F.lit("pc"), F.col("a"), F.col("b"))
            )
            % 1000
            < F.col("level")
        )
        .cache()
    )
    und = kept.select("level", "a", "b").unionByName(
        kept.select("level", F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nodes = und.select("level", F.col("a").alias("host")).distinct()
    labels = nodes.withColumn("lbl", F.col("host"))
    for _ in range(PERC_ROUNDS):
        nbr = (
            und.join(
                labels.select(
                    "level", F.col("host").alias("b"), "lbl"
                ),
                ["level", "b"],
            )
            .select("level", F.col("a").alias("host"), "lbl")
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("level", "host")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
    cc = labels.groupBy("level", "lbl").agg(
        F.count("*").cast("long").alias("sz")
    )
    nn = labels.groupBy("level").agg(
        F.count("*").cast("long").alias("n_nodes")
    )
    big = cc.groupBy("level").agg(F.max("sz").cast("long").alias("largest_cc"))
    return (
        nn.join(big, "level")
        .select(
            F.col("level").alias("level_permille"),
            "n_nodes",
            "largest_cc",
            F.expr("CAST((1000 * largest_cc) DIV n_nodes AS BIGINT)").alias(
                "share_milli"
            ),
        )
    )


def _sql_percolation() -> str:
    hash_doc = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    hash_e = _SQL_HASH56.format(col="'pc' || '|' || a || '|' || b")
    lv = ", ".join(f"({q})" for q in PERC_LEVELS)
    parts = [f"""
WITH fanp2 AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS f FROM documents
),
e0 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM (
    SELECT source AS src,
           'h' || CAST({hash_doc} % (SELECT f FROM fanp2) AS VARCHAR) AS dst
    FROM documents
  ) WHERE src <> dst
),
kept AS MATERIALIZED (
  SELECT l.level, e.a, e.b
  FROM e0 e CROSS JOIN (SELECT * FROM (VALUES {lv}) v(level)) l
  WHERE {hash_e} % 1000 < l.level
),
und AS MATERIALIZED (
  SELECT level, a, b FROM kept
  UNION ALL
  SELECT level, b AS a, a AS b FROM kept
),
lab0 AS MATERIALIZED (
  SELECT DISTINCT level, a AS host, a AS lbl FROM und
)"""]
    prev = "lab0"
    for k in range(1, PERC_ROUNDS + 1):
        parts.append(f""",
lab{k} AS MATERIALIZED (
  SELECT level, host, min(lbl) AS lbl FROM (
    SELECT level, host, lbl FROM {prev}
    UNION ALL
    SELECT u.level, u.a AS host, p.lbl
    FROM und u JOIN {prev} p ON p.level = u.level AND p.host = u.b
  ) GROUP BY 1, 2
)""")
        prev = f"lab{k}"
    parts.append(f"""
SELECT level AS level_permille,
       CAST(sum(sz) AS BIGINT) AS n_nodes,
       CAST(max(sz) AS BIGINT) AS largest_cc,
       CAST((1000 * max(sz)) // sum(sz) AS BIGINT) AS share_milli
FROM (
  SELECT level, lbl, CAST(count(*) AS BIGINT) AS sz
  FROM {prev} GROUP BY 1, 2
) x
GROUP BY level""")
    return "".join(parts)


QUERIES["host_percolation_robustness"] = (
    host_percolation_robustness,
    _sql_percolation(),
)


# ----------------------------------------- secretary-rule admission

# Optimal stopping for streaming admission (the secretary problem;
# Dynkin 1963): a crawler must commit to ONE candidate per slot (e.g.,
# which mirror of a page to canonicalize, which snapshot to keep) as
# candidates stream by, no revisiting. The 1/e rule — observe the
# first ⌊K/e⌋ candidates, then take the first that beats them all —
# achieves ≈ 37% probability of picking the overall best, against the
# 1/K random baseline. Measured over {SEC_REPS} md5 replicate streams
# of {SEC_K} planted qualities: per replicate, the observation-phase
# max (one window), the first subsequent candidate beating it (one min
# over a filtered window), success = that pick is the stream max.
# Pins: the success RATE lands in the 1/e band and beats the random
# baseline several-fold; exact recompute.
#
# Scale shape: a reps×K grid (map-only synthesis) + per-replicate
# window aggs + one scalar rollup.

SEC_K = 20
SEC_REPS = 64
SEC_OBS = 7  # floor(20 / e)


def crawl_secretary_admission_eval(spark, sf_dir):
    """(n_reps, n_success, success_milli, baseline_milli): empirical
    success rate of the 1/e stopping rule over planted candidate
    streams, with the random-pick baseline."""
    from harvester_spark.operators.dedup import _hash56

    grid = (
        spark.range(SEC_REPS)
        .select(F.col("id").cast("long").alias("rep"))
        .crossJoin(
            F.broadcast(
                spark.range(SEC_K).select(F.col("id").cast("long").alias("i"))
            )
        )
        .select(
            "rep",
            "i",
            _hash56(
                F.concat_ws(
                    "|", F.lit("sq"), F.col("rep").cast("string"),
                    F.col("i").cast("string"),
                )
            ).alias("q"),
        )
    )
    wrep = W.partitionBy("rep")
    obs_max = grid.filter(F.col("i") < SEC_OBS).groupBy("rep").agg(
        F.max("q").alias("thr")
    )
    best = grid.groupBy("rep").agg(F.max("q").alias("best"))
    pick = (
        grid.filter(F.col("i") >= SEC_OBS)
        .join(obs_max, "rep")
        .filter(F.col("q") > F.col("thr"))
        .groupBy("rep")
        .agg(F.min("i").alias("pick_i"))
    )
    picked_q = (
        pick.join(
            grid.select("rep", F.col("i").alias("pick_i"), F.col("q")),
            ["rep", "pick_i"],
        )
    )
    outcomes = (
        best.join(picked_q, "rep", "left")
        .select(
            "rep",
            (F.col("q").isNotNull() & (F.col("q") == F.col("best")))
            .cast("long")
            .alias("success"),
        )
    )
    return outcomes.agg(
        F.count("*").cast("long").alias("n_reps"),
        F.sum("success").cast("long").alias("n_success"),
    ).select(
        "n_reps",
        "n_success",
        F.expr("CAST((1000 * n_success) DIV n_reps AS BIGINT)").alias(
            "success_milli"
        ),
        F.lit(1000 // SEC_K).cast("long").alias("baseline_milli"),
    )


def _sql_secretary() -> str:
    h = _SQL_HASH56.format(
        col="'sq' || '|' || CAST(rep AS VARCHAR) || '|' || CAST(i AS VARCHAR)"
    )
    return f"""
WITH grid AS (
  SELECT CAST(rep AS BIGINT) AS rep, CAST(i AS BIGINT) AS i, {h} AS q
  FROM (SELECT unnest(range({SEC_REPS})) AS rep)
  CROSS JOIN (SELECT unnest(range({SEC_K})) AS i)
),
obs AS (
  SELECT rep, max(q) AS thr FROM grid WHERE i < {SEC_OBS} GROUP BY 1
),
best AS (SELECT rep, max(q) AS best FROM grid GROUP BY 1),
pick AS (
  SELECT g.rep, min(g.i) AS pick_i
  FROM grid g JOIN obs o USING (rep)
  WHERE g.i >= {SEC_OBS} AND g.q > o.thr
  GROUP BY 1
),
outcome AS (
  SELECT b.rep,
         CASE WHEN gq.q IS NOT NULL AND gq.q = b.best THEN 1 ELSE 0 END
           AS success
  FROM best b
  LEFT JOIN pick p USING (rep)
  LEFT JOIN grid gq ON gq.rep = b.rep AND gq.i = p.pick_i
)
SELECT CAST(count(*) AS BIGINT) AS n_reps,
       CAST(sum(success) AS BIGINT) AS n_success,
       CAST((1000 * CAST(sum(success) AS BIGINT)) // count(*) AS BIGINT)
         AS success_milli,
       CAST({1000 // SEC_K} AS BIGINT) AS baseline_milli
FROM outcome
"""


QUERIES["crawl_secretary_admission_eval"] = (
    crawl_secretary_admission_eval,
    _sql_secretary(),
)


# ------------------------------------------- coupon-collector coverage

# The coupon-collector bound behind every "how many fetches until all
# shards/hosts/mirrors are covered" estimate: drawing uniformly from
# {CC_SPACE} coupons, full coverage needs ≈ n·H_n draws in expectation
# (≈ {CC_SPACE}·H ≈ 72 here). Measured over {CC_REPS} planted md5 draw
# streams: per replicate, the completion time is max over coupons of
# the FIRST position drawing that coupon (a per-(rep, coupon) min +
# per-rep max — fully relational, no sequential scan), with an
# incomplete flag if the {CC_T}-draw budget never covers. Pins: the
# mean completion sits in the n·H_n band, and the per-replicate values
# match an exact Python recompute.
#
# Scale shape: one reps×draws map-only grid + two aggs.

CC_SPACE = 20
CC_T = 300
CC_REPS = 32


def crawl_coupon_collector_eval(spark, sf_dir):
    """(rep, completed, completion_draws): draws until full coupon
    coverage per planted replicate stream (NULL-free; incomplete reps
    carry completion_draws = {CC_T} and completed = false)."""
    from harvester_spark.operators.dedup import _hash56

    grid = (
        spark.range(CC_REPS)
        .select(F.col("id").cast("long").alias("rep"))
        .crossJoin(
            F.broadcast(
                spark.range(1, CC_T + 1).select(
                    F.col("id").cast("long").alias("t")
                )
            )
        )
        .select(
            "rep",
            "t",
            (
                _hash56(
                    F.concat_ws(
                        "|", F.lit("cc"), F.col("rep").cast("string"),
                        F.col("t").cast("string"),
                    )
                )
                % CC_SPACE
            ).alias("coupon"),
        )
    )
    firsts = grid.groupBy("rep", "coupon").agg(F.min("t").alias("first_t"))
    per_rep = firsts.groupBy("rep").agg(
        F.count("*").cast("long").alias("n_seen"),
        F.max("first_t").cast("long").alias("tmax"),
    )
    return per_rep.select(
        "rep",
        (F.col("n_seen") == CC_SPACE).alias("completed"),
        F.expr(
            f"CAST(CASE WHEN n_seen = {CC_SPACE} THEN tmax"
            f" ELSE {CC_T} END AS BIGINT)"
        ).alias("completion_draws"),
    )


def _sql_coupon() -> str:
    h = _SQL_HASH56.format(
        col="'cc' || '|' || CAST(rep AS VARCHAR) || '|' || CAST(t AS VARCHAR)"
    )
    return f"""
WITH grid AS (
  SELECT CAST(rep AS BIGINT) AS rep, CAST(t AS BIGINT) AS t,
         {h} % {CC_SPACE} AS coupon
  FROM (SELECT unnest(range({CC_REPS})) AS rep)
  CROSS JOIN (SELECT unnest(range(1, {CC_T + 1})) AS t)
),
firsts AS (
  SELECT rep, coupon, min(t) AS first_t FROM grid GROUP BY 1, 2
),
per_rep AS (
  SELECT rep, CAST(count(*) AS BIGINT) AS n_seen,
         CAST(max(first_t) AS BIGINT) AS tmax
  FROM firsts GROUP BY 1
)
SELECT rep, n_seen = {CC_SPACE} AS completed,
       CAST(CASE WHEN n_seen = {CC_SPACE} THEN tmax ELSE {CC_T} END
            AS BIGINT) AS completion_draws
FROM per_rep
"""


QUERIES["crawl_coupon_collector_eval"] = (
    crawl_coupon_collector_eval,
    _sql_coupon(),
)


# --------------------------------- politeness-constrained crawl makespan

# The scheduling member of the crawl-economics family (crawl_budget_
# allocate apportions BUDGET, crawl_maxmin_fairshare splits BANDWIDTH,
# frontier_schedule orders the QUEUE): per-host politeness delays make a
# host's fetch queue strictly serial (one request per D_h), so a K-way
# crawler is the classic P||Cmax machine-scheduling problem with job
# weights w_h = pages_h * D_h. Graham (1969) LPT: sort jobs by weight
# descending, always assign to the least-loaded machine — the textbook
# 4/3-approximation every crawl scheduler reinvents.
#
# The per-host delay derives IN-ENGINE from md5 (never shipped as
# constants): D_h = 200 + h56('pol|'||host) % 1800 ms — the corpus'
# uniform per-host page counts would make scheduling degenerate without
# the delay spread (the host_kcore non-degeneracy discipline).
#
# Determinism: the LPT pass is a bounded driver fold over the POL_H
# top-weight rows (the interleave_team_draft_eval pattern: k-row driver
# list == CTE unroll), tie-breaks (w desc, host asc) for job order and
# lowest-thread-id for machine choice; the oracle re-derives the same
# schedule as a POL_H-step unrolled CTE chain carrying the K load /
# count / last-weight registers. The pytest pins Graham's inequality
# K*Cmax <= total + (K-1)*w_last EXACTLY (w_last = last job assigned to
# the makespan machine) plus the lower-bound sandwich.
#
# Scale shape: ONE documents scan (groupBy source); everything after is
# POL_H rows. The corpus has exactly POL_H = 20 sources at every gated
# scale (the operator requires >= POL_H hosts; fewer would need a
# shorter unroll).

POL_K = 4  # crawler threads
POL_H = 20  # scheduled hosts (= corpus source count at every scale)
POL_D_BASE = 200  # ms
POL_D_SPREAD = 1800  # ms


def crawl_politeness_lpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(thread, n_hosts, load_ms, makespan_ms, lb_ms, w_last_ms,
    ratio_milli): LPT schedule of per-host politeness-serial crawl work
    over POL_K threads, with Graham-bound bookkeeping columns."""
    docs = load(spark, sf_dir, "documents")
    jobs = (
        docs.groupBy(F.col("source").alias("host"))
        .agg(F.count("*").cast("long").alias("pages"))
        .select(
            "host",
            "pages",
            (
                POL_D_BASE
                + _hash56(F.concat(F.lit("pol|"), F.col("host")))
                % POL_D_SPREAD
            )
            .cast("long")
            .alias("d_ms"),
        )
        .withColumn("w", (F.col("pages") * F.col("d_ms")).cast("long"))
        .orderBy(F.col("w").desc(), F.col("host").asc())
        .limit(POL_H)
    )
    rows = jobs.collect()  # bounded: POL_H rows
    loads = [0] * POL_K
    counts = [0] * POL_K
    last_w = [0] * POL_K
    for r in rows:
        t = min(range(POL_K), key=lambda i: (loads[i], i))
        loads[t] += r["w"]
        counts[t] += 1
        last_w[t] = r["w"]
    makespan = max(loads)
    tm = min(i for i in range(POL_K) if loads[i] == makespan)
    total = sum(r["w"] for r in rows)
    wmax = max(r["w"] for r in rows)
    lb = max((total + POL_K - 1) // POL_K, wmax)
    out = [
        (
            t,
            counts[t],
            loads[t],
            makespan,
            lb,
            last_w[tm],
            (1000 * makespan) // lb,
        )
        for t in range(POL_K)
    ]
    return spark.createDataFrame(
        out,
        "thread long, n_hosts long, load_ms long, makespan_ms long,"
        " lb_ms long, w_last_ms long, ratio_milli long",
    )


def _sql_politeness_lpt() -> str:
    h = _SQL_HASH56.format(col="'pol|' || host")
    parts = [
        f"""WITH pj AS (
  SELECT source AS host, CAST(count(*) AS BIGINT) AS pages
  FROM documents GROUP BY 1
),
pw AS (
  SELECT host, pages,
         CAST({POL_D_BASE} + {h} % {POL_D_SPREAD} AS BIGINT) AS d_ms,
         CAST(pages * ({POL_D_BASE} + {h} % {POL_D_SPREAD}) AS BIGINT) AS w
  FROM pj
),
pr AS (
  SELECT host, w, row_number() OVER (ORDER BY w DESC, host ASC) AS rk
  FROM pw QUALIFY rk <= {POL_H}
),
st0 AS (SELECT {", ".join(f"CAST(0 AS BIGINT) AS l{t}, CAST(0 AS BIGINT) AS c{t}, CAST(0 AS BIGINT) AS lw{t}" for t in range(POL_K))})"""
    ]
    for i in range(1, POL_H + 1):
        # argmin over the K loads, lowest thread id on ties.
        conds = []
        for t in range(POL_K):
            cc = " AND ".join(
                f"l{t} <= l{u}" for u in range(POL_K) if u != t
            )
            conds.append(f"WHEN {cc} THEN {t}")
        argmin = "CASE " + " ".join(conds[:-1]) + f" ELSE {POL_K - 1} END"
        cols = []
        for t in range(POL_K):
            cols.append(
                f"CAST(l{t} + CASE WHEN tm = {t} THEN wi ELSE 0 END AS BIGINT) AS l{t}"
            )
            cols.append(
                f"CAST(c{t} + CASE WHEN tm = {t} THEN 1 ELSE 0 END AS BIGINT) AS c{t}"
            )
            cols.append(
                f"CAST(CASE WHEN tm = {t} THEN wi ELSE lw{t} END AS BIGINT) AS lw{t}"
            )
        parts.append(
            f""",
st{i} AS (
  SELECT {", ".join(cols)}
  FROM (
    SELECT s.*, (SELECT w FROM pr WHERE rk = {i}) AS wi,
           {argmin} AS tm
    FROM st{i - 1} s
  )
)"""
        )
    mk = "greatest(" + ", ".join(f"l{t}" for t in range(POL_K)) + ")"
    tm_final = (
        "CASE "
        + " ".join(
            f"WHEN l{t} = {mk} THEN {t}" for t in range(POL_K)
        )
        + " END"
    )
    wl = (
        "CASE tmk "
        + " ".join(f"WHEN {t} THEN lw{t}" for t in range(POL_K))
        + " END"
    )
    parts.append(
        f""",
pfin AS (
  SELECT *, {mk} AS mk, {tm_final} AS tmk FROM st{POL_H}
),
ptot AS (
  SELECT CAST(sum(w) AS BIGINT) AS total, CAST(max(w) AS BIGINT) AS wmax
  FROM pr
),
plb AS (
  SELECT CAST(greatest((total + {POL_K} - 1) // {POL_K}, wmax) AS BIGINT)
           AS lb
  FROM ptot
)
SELECT CAST(th.t AS BIGINT) AS thread,
       CAST(CASE th.t {" ".join(f"WHEN {t} THEN c{t}" for t in range(POL_K))} END AS BIGINT) AS n_hosts,
       CAST(CASE th.t {" ".join(f"WHEN {t} THEN l{t}" for t in range(POL_K))} END AS BIGINT) AS load_ms,
       CAST(mk AS BIGINT) AS makespan_ms,
       CAST(lb AS BIGINT) AS lb_ms,
       CAST({wl} AS BIGINT) AS w_last_ms,
       CAST((1000 * mk) // lb AS BIGINT) AS ratio_milli
FROM pfin CROSS JOIN plb
CROSS JOIN (VALUES {", ".join(f"({t})" for t in range(POL_K))}) th(t)"""
    )
    return "".join(parts)


QUERIES["crawl_politeness_lpt"] = (crawl_politeness_lpt, _sql_politeness_lpt())


# ------------------------------------ greedy max-coverage source select

# Budgeted source selection as MAX-COVERAGE: pick SC_K of the corpus'
# source hosts so their combined outlink-target sets cover as much of
# the SC_M-slot target universe as possible — the "which feeds do I few
# crawl first" decision (shard_select_redde/cori rank by CONTENT score;
# this is the set-union view). Nemhauser-Wolsey-Fisher (1978): greedy
# achieves >= 1 - (1 - 1/k)^k of OPT for max-coverage; at k = 4 that is
# the EXACT RATIONAL 175/256, so the pin is division-free integer
# arithmetic: 256 * greedy >= 175 * OPT.
#
# OPT is computed EXACTLY, not bounded: the source masks are int64
# bitmasks over SC_M = 48 slots, and all C(20, 4) = 4845 source
# quadruples are enumerated relationally (a 4-way self-join on the
# 20-row mask frame) with coverage = bit_count(m1|m2|m3|m4) — the
# subset enumeration is hosts^4-bounded, corpus-size-independent.
#
# Coverage-set synthesis (non-degeneracy at EVERY scale — the
# vocab_oov_holdout lesson): raw per-source target draws saturate the
# universe as the corpus grows (250 docs/src fill all 48 slots), so
# each source keeps only its SC_SETSZ = 12 md5-first-ranked distinct
# targets — 25% of the universe per source at any sf, forcing a real
# 4-step greedy. Gain uses bit_count(mask | cov) - bit_count(cov)
# (no bitwise NOT — portable across both engines).
#
# Scale shape: one documents scan -> (src, target) distinct pairs ->
# per-src top-SC_SETSZ rank (20 partitions) -> 20 masks; greedy is a
# bounded driver fold (interleave_team_draft_eval pattern), OPT is the
# bounded relational enumeration; the oracle unrolls greedy as 4 CTE
# steps.

SC_K = 4  # sources to pick
SC_M = 48  # target universe slots (bitmask fits int64)
SC_SETSZ = 12  # per-source coverage-set cap


def _source_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = (
        docs.select(
            F.col("source").alias("src"),
            (_hash56(F.concat(F.lit("cov|"), F.col("doc_id").cast("string"))) % SC_M)
            .cast("long")
            .alias("t"),
        )
        .distinct()
    )
    word = W.partitionBy("src").orderBy(
        _hash56(
            F.concat(F.lit("ord|"), F.col("src"), F.lit("|"), F.col("t").cast("string"))
        ).asc(),
        F.col("t").asc(),
    )
    return (
        pairs.withColumn("rk", F.row_number().over(word))
        .filter(F.col("rk") <= SC_SETSZ)
        .groupBy("src")
        .agg(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(t AS INT))"))
            .cast("long")
            .alias("mask")
        )
    )


def crawl_source_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(step, host, gain, covered_after, greedy_total, opt_cover,
    bound_holds): greedy max-coverage pick of SC_K sources vs the exact
    optimum over all source quadruples; bound_holds is the exact
    256*greedy >= 175*OPT Nemhauser-Wolsey-Fisher check."""
    masks = _source_masks(spark, sf_dir).cache()
    rows = sorted(
        ((r["src"], r["mask"]) for r in masks.collect()),
        key=lambda t: t[0],
    )  # bounded: one row per source host
    cov = 0
    picks = []
    for step in range(1, SC_K + 1):
        # deterministic argmax: gain desc, host asc
        best = min(
            (t for t in rows),
            key=lambda t: (
                -(bin(t[1] | cov).count("1") - bin(cov).count("1")),
                t[0],
            ),
        )
        gain = bin(best[1] | cov).count("1") - bin(cov).count("1")
        cov |= best[1]
        picks.append((step, best[0], gain, bin(cov).count("1")))
    greedy_total = bin(cov).count("1")

    m1, m2, m3, m4 = (masks.alias(a) for a in ("m1", "m2", "m3", "m4"))
    opt = (
        m1.join(m2, F.col("m1.src") < F.col("m2.src"))
        .join(m3, F.col("m2.src") < F.col("m3.src"))
        .join(m4, F.col("m3.src") < F.col("m4.src"))
        .select(
            F.expr(
                "bit_count(m1.mask | m2.mask | m3.mask | m4.mask)"
            ).cast("long").alias("cov")
        )
        .agg(F.max("cov").cast("long").alias("opt_cover"))
    )
    out = spark.createDataFrame(
        picks, "step long, host string, gain long, covered_after long"
    )
    return (
        out.crossJoin(F.broadcast(opt))
        .select(
            "step",
            "host",
            "gain",
            "covered_after",
            F.lit(greedy_total).cast("long").alias("greedy_total"),
            "opt_cover",
            (F.lit(256 * greedy_total) >= 175 * F.col("opt_cover")).alias(
                "bound_holds"
            ),
        )
    )


def _sql_set_cover() -> str:
    hcov = _SQL_HASH56.format(col="'cov|' || CAST(doc_id AS VARCHAR)")
    hord = _SQL_HASH56.format(col="'ord|' || src || '|' || CAST(t AS VARCHAR)")
    parts = [
        f"""WITH scp AS (
  SELECT DISTINCT source AS src,
         CAST({hcov} % {SC_M} AS BIGINT) AS t
  FROM documents
),
scr AS (
  SELECT src, t,
         row_number() OVER (PARTITION BY src ORDER BY {hord} ASC, t ASC)
           AS rk
  FROM scp
),
scm AS (
  SELECT src, CAST(sum(CAST(1 AS BIGINT) << CAST(t AS INT)) AS BIGINT)
           AS mask
  FROM scr WHERE rk <= {SC_SETSZ} GROUP BY 1
),
g0 AS (SELECT CAST(0 AS BIGINT) AS cov)"""
    ]
    for i in range(1, SC_K + 1):
        parts.append(
            f""",
p{i} AS (
  SELECT m.src, m.mask,
         CAST(bit_count(m.mask | g.cov) - bit_count(g.cov) AS BIGINT)
           AS gain,
         CAST(m.mask | g.cov AS BIGINT) AS newcov
  FROM scm m CROSS JOIN g{i - 1} g
  ORDER BY gain DESC, m.src ASC LIMIT 1
),
g{i} AS (SELECT newcov AS cov FROM p{i})"""
        )
    steps = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, src AS host, gain,"
        f" CAST(bit_count(newcov) AS BIGINT) AS covered_after FROM p{i}"
        for i in range(1, SC_K + 1)
    )
    parts.append(
        f""",
gsteps AS ({steps}),
gtot AS (
  SELECT CAST(bit_count(cov) AS BIGINT) AS greedy_total FROM g{SC_K}
),
sopt AS (
  SELECT CAST(max(bit_count(a.mask | b.mask | c.mask | d.mask))
              AS BIGINT) AS opt_cover
  FROM scm a JOIN scm b ON a.src < b.src
  JOIN scm c ON b.src < c.src
  JOIN scm d ON c.src < d.src
)
SELECT s.step, s.host, s.gain, s.covered_after,
       t.greedy_total, o.opt_cover,
       256 * t.greedy_total >= 175 * o.opt_cover AS bound_holds
FROM gsteps s CROSS JOIN gtot t CROSS JOIN sopt o"""
    )
    return "".join(parts)


QUERIES["crawl_source_set_cover"] = (crawl_source_set_cover, _sql_set_cover())


# ----------------------------------------- link prediction holdout eval

# Liben-Nowell & Kleinberg (CIKM 2003): score the classic neighborhood
# predictors — common neighbors, Jaccard, Adamic-Adar — by how well
# they recover EDGES HELD OUT of the graph. host_adamic_adar reports
# scores; this operator closes the loop with the evaluation protocol:
# an md5-deterministic 1-in-LP_HOLD_MOD edge holdout, predictor scores
# computed on the TRAINING residual only, and threshold-at-K precision
# with K = n_test DIV 2 (ties included, so no global ranking window is
# needed — the K-th score arrives as an order statistic from the
# per-predictor score histogram; K = n_test lets the tie block at the
# lowest score engulf the whole candidate set, measured).
#
# Graph synthesis (three measured failure modes shaped it — the
# host_bowtie / host_kcore non-degeneracy discipline):
#   1. source->h edges alone are BIPARTITE: no held-out edge ever has a
#      common neighbor (0 hits, measured) — dropped entirely.
#   2. a pure hash graph has NO triadic closure: every predictor lands
#      AT the random rate (measured) — edges get a planted COMMUNITY
#      preference instead (15/16 of draws stay inside the endpoint's
#      community).
#   3. community SIZE must stay constant as the corpus grows (fixed
#      LP_GS = 8 members, community count = fan/8): scaling the size
#      dilutes closure back to random (precision 0.10 at sf0.1,
#      measured). With fixed-size communities all three predictors hold
#      ~0.90 precision vs ~0.12 random at every gated scale.
# Per doc, LP_EDGES = 4 draws: hA = h56(a<e>|doc) % fan; hB intra
# (same residue class mod nc) 15/16 of the time, uniform otherwise.
#
# Integer: cn is a count; jaccard is milli of an exact ratio;
# Adamic-Adar is SUM 1e9 // milli-ln(deg_w) (pair-forming w has
# deg >= 2, so the ln is never 0). Scale shape: candidate volume is
# SUM_w deg(w)^2 over the sparse training graph (degree is constant by
# construction); one distinct-edge shuffle, one w-keyed join, one
# groupBy; thresholds via per-predictor histogram cumsums.

LP_HOLD_MOD = 4  # hold out 1-in-4 edges
LP_GS = 8  # community size (fixed — see failure mode 3)
LP_EDGES = 4  # edge draws per doc
LP_INTRA_MOD, LP_INTRA_THR = 16, 15  # 15/16 draws stay intra-community


def _lp_und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (u, v) edges of the planted-community host
    graph (shared by host_linkpred_eval and host_spectral_bisection)."""
    docs = load(spark, sf_dir, "documents")
    fan = ((max(docs.count() // 4, 24) + LP_GS - 1) // LP_GS) * LP_GS
    nc = fan // LP_GS
    legs = []
    for e in range(LP_EDGES):
        aix = (
            _hash56(F.concat(F.lit(f"a{e}|"), F.col("doc_id").cast("string")))
            % fan
        ).cast("long")
        intra = (
            (
                _hash56(
                    F.concat(F.lit(f"r{e}|"), F.col("doc_id").cast("string"))
                )
                % LP_GS
            )
            * nc
            + aix % nc
        ).cast("long")
        unif = (
            _hash56(F.concat(F.lit(f"u{e}|"), F.col("doc_id").cast("string")))
            % fan
        ).cast("long")
        mixed = (
            _hash56(F.concat(F.lit(f"m{e}|"), F.col("doc_id").cast("string")))
            % LP_INTRA_MOD
            < LP_INTRA_THR
        )
        bix = F.when(mixed, intra).otherwise(unif)
        legs.append(
            docs.select(
                F.concat(F.lit("h"), aix.cast("string")).alias("a"),
                F.concat(F.lit("h"), bix.cast("string")).alias("b"),
            )
        )
    e0 = legs[0]
    for leg in legs[1:]:
        e0 = e0.unionByName(leg)
    e0 = e0.filter(F.col("a") != F.col("b"))
    return (
        e0.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )


def host_linkpred_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(predictor, n_train, n_test, n_cand, k_at, thr, n_taken, hits,
    precision_milli): threshold-at-(n_test/2) holdout precision of the
    CN / Jaccard / Adamic-Adar link predictors on the planted-community
    host graph."""
    und = (
        _lp_und_edges(spark, sf_dir)
        .withColumn(
            "held",
            _hash56(F.concat(F.lit("lp|"), F.col("u"), F.lit("|"), F.col("v")))
            % LP_HOLD_MOD
            == 0,
        )
        .cache()
    )
    train = und.filter(~F.col("held")).select("u", "v")
    test = und.filter(F.col("held")).select("u", "v")
    adj = train.select(F.col("u").alias("w"), F.col("v").alias("x")).union(
        train.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count("*").cast("long").alias("d"))
    a1 = adj.select(F.col("w"), F.col("x").alias("u"))
    a2 = adj.select(F.col("w"), F.col("x").alias("v"))
    tri = (
        a1.join(a2, "w")
        .filter(F.col("u") < F.col("v"))
        .join(deg, "w")
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("cn"),
            F.sum(
                F.expr(
                    "CAST(1000000000 AS BIGINT)"
                    f" DIV {_MILLILN_G.format(v='d')}"
                )
            )
            .cast("long")
            .alias("aa"),
        )
        .join(train, ["u", "v"], "left_anti")
    )
    du = deg.select(F.col("w").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("w").alias("v"), F.col("d").alias("dv"))
    cand = (
        tri.join(du, "u")
        .join(dv, "v")
        .withColumn(
            "jacc", F.expr("CAST((1000 * cn) DIV (du + dv - cn) AS BIGINT)")
        )
        .join(test.withColumn("is_test", F.lit(1)), ["u", "v"], "left")
        .select(
            "u",
            "v",
            "cn",
            "jacc",
            "aa",
            F.coalesce("is_test", F.lit(0)).cast("long").alias("is_test"),
        )
        # The candidate frame feeds three melted legs plus the count and
        # threshold paths — cut the 8-join lineage once (measured: the
        # uncut DAG re-runs it 5x, ~270 stages, 9 s warm on 500 docs).
        .localCheckpoint()
    )
    melted = (
        cand.select("is_test", F.lit("cn").alias("predictor"), F.col("cn").alias("score"))
        .unionByName(
            cand.select("is_test", F.lit("jaccard").alias("predictor"), F.col("jacc").alias("score"))
        )
        .unionByName(
            cand.select("is_test", F.lit("adamic_adar").alias("predictor"), F.col("aa").alias("score"))
        )
    )
    counts = F.broadcast(
        und.agg(
            F.sum(F.expr("CAST(NOT held AS BIGINT)")).cast("long").alias("n_train"),
            F.sum(F.expr("CAST(held AS BIGINT)")).cast("long").alias("n_test"),
        ).withColumn("k_at", F.expr("greatest(1, n_test DIV 2)"))
    )
    hist = melted.groupBy("predictor", "score").agg(
        F.count("*").cast("long").alias("m")
    )
    wdesc = W.partitionBy("predictor").orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    thr = (
        hist.select(
            "predictor", "score", F.sum("m").over(wdesc).cast("long").alias("cum")
        )
        .crossJoin(counts)
        .filter(F.col("cum") >= F.col("k_at"))
        .groupBy("predictor")
        .agg(F.max("score").cast("long").alias("thr"))
    )
    taken = (
        melted.join(F.broadcast(thr), "predictor")
        .filter(F.col("score") >= F.col("thr"))
        .groupBy("predictor")
        .agg(
            F.count("*").cast("long").alias("n_taken"),
            F.sum("is_test").cast("long").alias("hits"),
            F.first("thr").alias("thr"),
        )
    )
    ncand = F.broadcast(cand.agg(F.count("*").cast("long").alias("n_cand")))
    return (
        taken.crossJoin(counts)
        .crossJoin(ncand)
        .select(
            "predictor",
            "n_train",
            "n_test",
            "n_cand",
            "k_at",
            "thr",
            "n_taken",
            "hits",
            F.expr("CAST((1000 * hits) DIV n_taken AS BIGINT)").alias(
                "precision_milli"
            ),
        )
    )


_MILLILN_G = "CAST(floor(ln({v}) * 1.0e3 + 0.5e0) AS BIGINT)"


def _sql_lp_edge_ctes() -> str:
    """The lpn/lpfan/lpe0/lpbase CTE fragment producing the distinct
    undirected planted-community edges (shared oracle plumbing)."""
    draw_legs = []
    for e in range(LP_EDGES):
        ha = _SQL_HASH56.format(col=f"'a{e}|' || CAST(doc_id AS VARCHAR)")
        hr = _SQL_HASH56.format(col=f"'r{e}|' || CAST(doc_id AS VARCHAR)")
        hu = _SQL_HASH56.format(col=f"'u{e}|' || CAST(doc_id AS VARCHAR)")
        hm = _SQL_HASH56.format(col=f"'m{e}|' || CAST(doc_id AS VARCHAR)")
        draw_legs.append(f"""
  SELECT 'h' || CAST({ha} % fan AS VARCHAR) AS a,
         'h' || CAST(CASE WHEN {hm} % {LP_INTRA_MOD} < {LP_INTRA_THR}
              THEN ({hr} % {LP_GS}) * (fan // {LP_GS}) + ({ha} % fan) % (fan // {LP_GS})
              ELSE {hu} % fan END AS VARCHAR) AS b
  FROM documents CROSS JOIN lpfan""")
    legs_sql = " UNION ALL ".join(draw_legs)
    return f"""lpn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
lpfan AS (
  SELECT ((greatest(nd // 4, 24) + {LP_GS} - 1) // {LP_GS}) * {LP_GS} AS fan
  FROM lpn
),
lpe0 AS ({legs_sql}),
lpbase AS MATERIALIZED (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM lpe0 WHERE a <> b
)"""


def _sql_linkpred() -> str:
    hl = _SQL_HASH56.format(col="'lp|' || u || '|' || v")
    ml = _MILLILN_G.format(v="d")
    return f"""
WITH {_sql_lp_edge_ctes()},
lpund AS MATERIALIZED (
  SELECT u, v, {hl} % {LP_HOLD_MOD} = 0 AS held FROM lpbase
),
lptrain AS (SELECT u, v FROM lpund WHERE NOT held),
lptest AS (SELECT u, v FROM lpund WHERE held),
lpadj AS (
  SELECT u AS w, v AS x FROM lptrain
  UNION ALL SELECT v, u FROM lptrain
),
lpdeg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM lpadj GROUP BY 1),
lptri AS (
  SELECT a1.x AS u, a2.x AS v,
         CAST(count(*) AS BIGINT) AS cn,
         CAST(sum(CAST(1000000000 AS BIGINT) // {ml}) AS BIGINT) AS aa
  FROM lpadj a1 JOIN lpadj a2 ON a1.w = a2.w AND a1.x < a2.x
  JOIN lpdeg dg ON dg.w = a1.w
  GROUP BY 1, 2
),
lpcand AS MATERIALIZED (
  SELECT t.u, t.v, t.cn, t.aa,
         CAST((1000 * t.cn) // (du.d + dv.d - t.cn) AS BIGINT) AS jacc,
         CAST(CASE WHEN ts.u IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_test
  FROM lptri t
  LEFT JOIN lptrain tr ON tr.u = t.u AND tr.v = t.v
  JOIN lpdeg du ON du.w = t.u
  JOIN lpdeg dv ON dv.w = t.v
  LEFT JOIN lptest ts ON ts.u = t.u AND ts.v = t.v
  WHERE tr.u IS NULL
),
lpm AS MATERIALIZED (
  SELECT is_test, 'cn' AS predictor, cn AS score FROM lpcand
  UNION ALL
  SELECT is_test, 'jaccard', jacc FROM lpcand
  UNION ALL
  SELECT is_test, 'adamic_adar', aa FROM lpcand
),
lpcounts AS (
  SELECT CAST(sum(CASE WHEN held THEN 0 ELSE 1 END) AS BIGINT) AS n_train,
         CAST(sum(CASE WHEN held THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
         CAST(greatest(1, sum(CASE WHEN held THEN 1 ELSE 0 END) // 2)
              AS BIGINT) AS k_at
  FROM lpund
),
lphist AS (
  SELECT predictor, score, CAST(count(*) AS BIGINT) AS m
  FROM lpm GROUP BY 1, 2
),
lpthr AS (
  SELECT predictor, CAST(max(score) AS BIGINT) AS thr
  FROM (
    SELECT predictor, score,
           CAST(sum(m) OVER (PARTITION BY predictor ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
    FROM lphist
  ) CROSS JOIN lpcounts
  WHERE cum >= k_at GROUP BY 1
),
lptaken AS (
  SELECT m.predictor,
         CAST(count(*) AS BIGINT) AS n_taken,
         CAST(sum(m.is_test) AS BIGINT) AS hits,
         CAST(min(t.thr) AS BIGINT) AS thr
  FROM lpm m JOIN lpthr t ON m.predictor = t.predictor
  WHERE m.score >= t.thr GROUP BY 1
),
lpnc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM lpcand)
SELECT tk.predictor, c.n_train, c.n_test, nc.n_cand, c.k_at, tk.thr,
       tk.n_taken, tk.hits,
       CAST((1000 * tk.hits) // tk.n_taken AS BIGINT) AS precision_milli
FROM lptaken tk CROSS JOIN lpcounts c CROSS JOIN lpnc nc
"""


QUERIES["host_linkpred_eval"] = (host_linkpred_eval, _sql_linkpred())


# -------------------------------------------- spectral graph bisection

# Fiedler (1973) / the spectral partitioning classic: the sign pattern
# of the Laplacian's second eigenvector cuts the graph along its
# sparsest direction. Complements the label-propagation communities
# (host_labelprop_*) with the eigenvector method, evaluated by
# CONDUCTANCE against an md5 random balanced cut on the SAME graph —
# the planted-community edge synthesis shared with host_linkpred_eval
# (_lp_und_edges), where a real sparse direction exists to find.
#
# Algorithm: power iteration on M = cI - L (c = max degree + 1, so M is
# PSD with top eigenvector all-ones); the all-ones component is
# DEFLATED by re-centering every sweep, so iteration converges to the
# Fiedler direction. One sweep, all integer fixed-point (UNIT = 1e6):
#   v' = (c - deg) * v + SUM_neighbors v      (one src-keyed join)
#   v'' = v' - truncdiv(SUM v', n)            (deflation)
#   v  <- truncdiv(UNIT * v'', max|v''|)      (renormalization)
# truncdiv = sign-split floored division — Spark DIV truncates toward
# zero while DuckDB // floors, so EVERY division is sign-split (the
# events_theilsen_trend rule); with that, SB_ITERS sweeps are
# bit-identical in both engines. Init: md5 parity +/-UNIT per node.
#
# Output: cut size, side volumes and conductance for the spectral sign
# cut AND the random cut; the pytest recomputes the whole iteration in
# Python and pins spectral conductance strictly below random (measured
# ~0.21 vs ~0.50).
#
# Scale shape: per sweep one edges-to-values equi-join + groupBy and
# two scalar aggs (the host_pagerank plan), localCheckpoint lineage
# cuts; the graph is the sparse derived-fanout synthesis (degree
# bounded by construction).

SB_ITERS = 16
SB_UNIT = 10**6

_SB_TDIV = "CASE WHEN {num} >= 0 THEN ({num}) {div} ({den}) ELSE -((-({num})) {div} ({den})) END"


def host_spectral_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(method, n_a, n_b, cut_edges, vol_a, vol_b, cond_milli):
    Fiedler-sign spectral cut vs md5 random cut of the planted-
    community host graph, with exact conductance bookkeeping."""
    edges = _lp_und_edges(spark, sf_dir).cache()
    adj = edges.select(F.col("u").alias("w"), F.col("v").alias("x")).union(
        edges.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count("*").cast("long").alias("d")).cache()
    c = deg.agg(F.max("d")).collect()[0][0] + 1  # bounded scalar
    nodes = deg.select(F.col("w").alias("host"), "d")
    v = nodes.select(
        "host",
        "d",
        (
            (
                2
                * (
                    _hash56(F.concat(F.lit("sbi|"), F.col("host")))
                    % 2
                )
                - 1
            )
            * SB_UNIT
        ).cast("long").alias("v"),
    ).localCheckpoint()
    tdiv = _SB_TDIV
    for _ in range(SB_ITERS):
        nb = (
            adj.join(
                v.select(F.col("host").alias("x"), F.col("v").alias("vx")),
                "x",
            )
            .groupBy("w")
            .agg(F.sum("vx").cast("long").alias("s"))
        )
        upd = (
            v.join(nb, v["host"] == nb["w"], "left")
            .select(
                "host",
                "d",
                (
                    (F.lit(int(c)) - F.col("d")) * F.col("v")
                    + F.coalesce(F.col("s"), F.lit(0))
                )
                .cast("long")
                .alias("vp"),
            )
        )
        tot = F.broadcast(
            upd.agg(
                F.sum("vp").cast("long").alias("sv"),
                F.count("*").cast("long").alias("n"),
            )
        )
        cen = upd.crossJoin(tot).select(
            "host",
            "d",
            F.expr(
                "CAST(vp - ("
                + tdiv.format(num="sv", den="n", div="DIV")
                + ") AS BIGINT)"
            ).alias("vc"),
        )
        mx = F.broadcast(
            cen.agg(F.max(F.abs(F.col("vc"))).cast("long").alias("mx"))
        )
        v = (
            cen.crossJoin(mx)
            .select(
                "host",
                "d",
                F.expr(
                    "CASE WHEN mx = 0 THEN CAST(0 AS BIGINT) ELSE CAST("
                    + tdiv.format(num=f"{SB_UNIT} * vc", den="mx", div="DIV")
                    + " AS BIGINT) END"
                ).alias("v"),
            )
            .localCheckpoint()
        )
    sides = v.select(
        "host",
        "d",
        (F.col("v") >= 0).cast("long").alias("spectral"),
        (
            _hash56(F.concat(F.lit("sb|"), F.col("host"))) % 2
        ).cast("long").alias("random"),
    ).cache()

    out = None
    for method in ("spectral", "random"):
        su = sides.select(
            F.col("host").alias("u"), F.col(method).alias("side_u")
        )
        sv_ = sides.select(
            F.col("host").alias("v"), F.col(method).alias("side_v")
        )
        cut = (
            edges.join(su, "u")
            .join(sv_, "v")
            .agg(
                F.sum(
                    (F.col("side_u") != F.col("side_v")).cast("long")
                )
                .cast("long")
                .alias("cut_edges")
            )
        )
        vols = sides.agg(
            F.sum(F.expr(f"CAST({method} = 1 AS BIGINT)")).cast("long").alias("n_a"),
            F.sum(F.expr(f"CAST({method} = 0 AS BIGINT)")).cast("long").alias("n_b"),
            F.sum(F.expr(f"CASE WHEN {method} = 1 THEN d ELSE 0 END"))
            .cast("long")
            .alias("vol_a"),
            F.sum(F.expr(f"CASE WHEN {method} = 0 THEN d ELSE 0 END"))
            .cast("long")
            .alias("vol_b"),
        )
        row = (
            vols.crossJoin(F.broadcast(cut))
            .select(
                F.lit(method).alias("method"),
                "n_a",
                "n_b",
                "cut_edges",
                "vol_a",
                "vol_b",
                F.expr(
                    "CASE WHEN least(vol_a, vol_b) = 0 THEN CAST(NULL AS BIGINT)"
                    " ELSE CAST((1000 * cut_edges) DIV least(vol_a, vol_b)"
                    " AS BIGINT) END"
                ).alias("cond_milli"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_spectral() -> str:
    hsb = _SQL_HASH56.format(col="'sb|' || host")
    hsbi = _SQL_HASH56.format(col="'sbi|' || host")
    tdiv = _SB_TDIV
    parts = [
        f"""WITH {_sql_lp_edge_ctes()},
sbadj AS MATERIALIZED (
  SELECT u AS w, v AS x FROM lpbase
  UNION ALL SELECT v, u FROM lpbase
),
sbdeg AS MATERIALIZED (
  SELECT w AS host, CAST(count(*) AS BIGINT) AS d FROM sbadj GROUP BY 1
),
sbc AS (SELECT CAST(max(d) + 1 AS BIGINT) AS c FROM sbdeg),
sbv0 AS MATERIALIZED (
  SELECT host, d,
         CAST((2 * ({hsbi} % 2) - 1) * {SB_UNIT} AS BIGINT) AS v
  FROM sbdeg
)"""
    ]
    for k in range(1, SB_ITERS + 1):
        cen_div = tdiv.format(num="sv", den="n", div="//")
        res_div = tdiv.format(num=f"{SB_UNIT} * vc", den="mx", div="//")
        parts.append(
            f""",
sbn{k} AS MATERIALIZED (
  SELECT a.w AS host, CAST(sum(p.v) AS BIGINT) AS s
  FROM sbadj a JOIN sbv{k - 1} p ON p.host = a.x
  GROUP BY 1
),
sbu{k} AS MATERIALIZED (
  SELECT p.host, p.d,
         CAST((sbc.c - p.d) * p.v + coalesce(n.s, 0) AS BIGINT) AS vp
  FROM sbv{k - 1} p
  LEFT JOIN sbn{k} n USING (host)
  CROSS JOIN sbc
),
sbt{k} AS (
  SELECT CAST(sum(vp) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS n
  FROM sbu{k}
),
sbcn{k} AS MATERIALIZED (
  SELECT host, d, CAST(vp - ({cen_div}) AS BIGINT) AS vc
  FROM sbu{k} CROSS JOIN sbt{k}
),
sbm{k} AS (SELECT CAST(max(abs(vc)) AS BIGINT) AS mx FROM sbcn{k}),
sbv{k} AS MATERIALIZED (
  SELECT host, d,
         CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST({res_div} AS BIGINT) END AS v
  FROM sbcn{k} CROSS JOIN sbm{k}
)"""
        )
    parts.append(
        f""",
sbsides AS MATERIALIZED (
  SELECT host, d,
         CAST(v >= 0 AS BIGINT) AS spectral,
         CAST({hsb} % 2 AS BIGINT) AS random
  FROM sbv{SB_ITERS}
),
sbrows AS (
  SELECT 'spectral' AS method, spectral AS side, host, d FROM sbsides
  UNION ALL
  SELECT 'random', random, host, d FROM sbsides
),
sbcut AS (
  SELECT m.method,
         CAST(sum(CASE WHEN su.side <> sv2.side THEN 1 ELSE 0 END)
              AS BIGINT) AS cut_edges
  FROM lpbase e
  CROSS JOIN (SELECT DISTINCT method FROM sbrows) m
  JOIN sbrows su ON su.method = m.method AND su.host = e.u
  JOIN sbrows sv2 ON sv2.method = m.method AND sv2.host = e.v
  GROUP BY 1
),
sbvol AS (
  SELECT method,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN side = 1 THEN d ELSE 0 END) AS BIGINT) AS vol_a,
         CAST(sum(CASE WHEN side = 0 THEN d ELSE 0 END) AS BIGINT) AS vol_b
  FROM sbrows GROUP BY 1
)
SELECT v.method, v.n_a, v.n_b, c.cut_edges, v.vol_a, v.vol_b,
       CASE WHEN least(v.vol_a, v.vol_b) = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((1000 * c.cut_edges) // least(v.vol_a, v.vol_b)
                 AS BIGINT) END AS cond_milli
FROM sbvol v JOIN sbcut c USING (method)"""
    )
    return "".join(parts)


QUERIES["host_spectral_bisection"] = (host_spectral_bisection, _sql_spectral())


# ------------------------------------------------- exact betweenness

# Exact shortest-path betweenness centrality (Freeman 1977) via the
# Brandes (2001) pair-dependency identity: for ordered pairs (s, t) and
# an interior vertex v,  delta(v) = sum_{s,t} sigma_sv * sigma_vt /
# sigma_st  over exactly those triples with d(s,v) + d(v,t) = d(s,t) —
# no sequential dependency accumulation needed, so the whole computation
# is |hops| BFS rounds (carrying shortest-path COUNTS, not just
# distances) plus one self-join of the settled pair table. This closes
# the centrality family (pagerank / HITS / SALSA / harmonic / hyperball
# -> betweenness): betweenness is the "bridge" score crawl schedulers
# use to find chokepoint hosts whose removal fragments the link graph
# (host_percolation_robustness's planning twin).
#
# Graph synthesis (bounded, corpus-derived — the pseudo-rare-plant
# discipline of vocab_oov_holdout): the _lp_und_edges community graph
# SCALES with the corpus (fan = n_docs/4), and exact all-pairs
# betweenness is Theta(n * reach^2) pair-triple rows — unbounded on a
# growing graph in BOTH engines. Instead, a stride-sampled doc subset
# (stride = n_docs DIV 96, i.e. ~96-192 drawing docs at EVERY scale)
# draws edges over a FIXED 32-host universe split into 4 communities of
# 8, with 13/16 of draws staying intra-community. Cost is
# corpus-size-independent while the edge set stays corpus-derived and
# deterministic; the sparse intra density (~16 distinct edges per
# 8-host community) plus ~1 in 6 inter-community bridges guarantees
# genuine multi-hop shortest paths and a non-flat betweenness profile
# (pinned by tests/test_session16_ops.py against an independent
# pure-Python Brandes recompute).
#
# Integer contract: sigma values are exact int64 path counts; each
# triple contributes _DIVROUND(sigma_sv * sigma_vt, sigma_st) micro
# units (floored-half-up long division, identical in both engines);
# betweenness is the exact int64 sum of those per-triple micro
# contributions. Ordered-pair convention: (s,t) and (t,s) both count,
# i.e. exactly 2x the undirected Freeman value.
#
# Scale shape: the BFS is |hops| rounds of (frontier JOIN edges ->
# groupBy-sum sigma -> anti-join settled) — at a web-scale host graph
# this state is the HyperBall/ANF regime (host_hyperball_anf) and exact
# betweenness is replaced by pivot-sampled approximation (Brandes &
# Pich 2007: the same pair identity over a sampled source set, which
# THIS implementation expresses verbatim — only the source filter
# changes); the bounded variant here is that sampler's exact oracle
# twin.

BW_FAN = 32  # fixed host universe 'b0'..'b31'
BW_GS = 8  # community size (4 communities)
BW_DOCS = 96  # target drawing-doc count at every scale
BW_INTRA_MOD, BW_INTRA_THR = 16, 13  # 13/16 draws stay intra-community
BW_HOPS = 6  # BFS horizon (graph diameter comfortably below this)


def _bw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (both-direction) edges of the bounded
    32-host betweenness graph."""
    docs = load(spark, sf_dir, "documents")
    stride = max(1, docs.count() // BW_DOCS)
    draws = docs.filter((F.col("doc_id") % stride) == 0)
    did = F.col("doc_id").cast("string")
    u_ix = (_hash56(F.concat(F.lit("bwu|"), did)) % BW_FAN).cast("long")
    intra = (
        (u_ix - u_ix % BW_GS)
        + _hash56(F.concat(F.lit("bwv|"), did)) % BW_GS
    ).cast("long")
    unif = (_hash56(F.concat(F.lit("bww|"), did)) % BW_FAN).cast("long")
    mixed = (
        _hash56(F.concat(F.lit("bwm|"), did)) % BW_INTRA_MOD < BW_INTRA_THR
    )
    v_ix = F.when(mixed, intra).otherwise(unif)
    e0 = draws.select(
        F.concat(F.lit("b"), u_ix.cast("string")).alias("a"),
        F.concat(F.lit("b"), v_ix.cast("string")).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return (
        e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(
            e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
    )


def host_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, degree, n_triples, betw_micro): exact ordered-pair
    shortest-path betweenness within BW_HOPS hops on the bounded
    32-host community graph, in micro units; ties (betw desc, host
    asc). Brandes pair identity — see the module comment."""
    edges = _bw_edges(spark, sf_dir).cache()
    hosts = edges.select(F.col("src").alias("host")).distinct()
    settled = hosts.select(
        F.col("host").alias("origin"),
        F.col("host"),
        F.lit(0).cast("long").alias("d"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint()
    frontier = settled.select("origin", "host", "sigma")
    for k in range(1, BW_HOPS + 1):
        cand = (
            frontier.join(edges, frontier["host"] == edges["src"])
            .groupBy("origin", "dst")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .withColumnRenamed("dst", "host")
        )
        nxt = cand.join(
            settled.select("origin", "host"), ["origin", "host"], "anti"
        ).localCheckpoint()
        settled = settled.unionByName(
            nxt.withColumn("d", F.lit(k).cast("long")).select(
                "origin", "host", "d", "sigma"
            )
        ).localCheckpoint()
        frontier = nxt.select("origin", "host", "sigma")
    pairs = settled.filter(F.col("d") > 0)
    p_sv = pairs.select(
        F.col("origin").alias("s"),
        F.col("host").alias("v"),
        F.col("d").alias("dsv"),
        F.col("sigma").alias("s1"),
    )
    p_vt = pairs.select(
        F.col("origin").alias("v"),
        F.col("host").alias("t"),
        F.col("d").alias("dvt"),
        F.col("sigma").alias("s2"),
    )
    p_st = pairs.select(
        F.col("origin").alias("s"),
        F.col("host").alias("t"),
        F.col("d").alias("dst_d"),
        F.col("sigma").alias("s3"),
    )
    tri = (
        p_sv.join(p_vt, "v")
        .filter(F.col("s") != F.col("t"))
        .join(p_st, ["s", "t"])
        .filter(F.col("dsv") + F.col("dvt") == F.col("dst_d"))
    )
    from harvester_spark.operators.index_stats import _DIVROUND

    contrib = _DIVROUND.format(num="s1 * s2", den="s3", div="DIV")
    betw = tri.groupBy("v").agg(
        F.count("*").cast("long").alias("n_triples"),
        F.sum(F.expr(f"CAST({contrib} AS BIGINT)"))
        .cast("long")
        .alias("betw_micro"),
    )
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("degree"))
    return (
        hosts.join(deg, hosts["host"] == deg["src"], "left")
        .select("host", F.coalesce("degree", F.lit(0)).cast("long").alias("degree"))
        .join(betw, hosts["host"] == betw["v"], "left")
        .select(
            "host",
            "degree",
            F.coalesce("n_triples", F.lit(0)).cast("long").alias("n_triples"),
            F.coalesce("betw_micro", F.lit(0)).cast("long").alias("betw_micro"),
        )
        .orderBy(F.col("betw_micro").desc(), F.col("host").asc())
    )


def _sql_betweenness() -> str:
    from harvester_spark.operators.index_stats import _DIVROUND

    did = "CAST(doc_id AS VARCHAR)"
    hu = _SQL_HASH56.format(col=f"'bwu|' || {did}")
    hv = _SQL_HASH56.format(col=f"'bwv|' || {did}")
    hw = _SQL_HASH56.format(col=f"'bww|' || {did}")
    hm = _SQL_HASH56.format(col=f"'bwm|' || {did}")
    contrib = _DIVROUND.format(num="p1.sigma * p2.sigma", den="p3.sigma", div="//")
    parts = [
        f"""WITH stride AS (
  SELECT greatest(1, count(*) // {BW_DOCS}) AS s FROM documents
),
draws AS (
  SELECT {hu} % {BW_FAN} AS u_ix,
         CASE WHEN {hm} % {BW_INTRA_MOD} < {BW_INTRA_THR}
              THEN ({hu} % {BW_FAN}) - ({hu} % {BW_FAN}) % {BW_GS}
                   + {hv} % {BW_GS}
              ELSE {hw} % {BW_FAN} END AS v_ix
  FROM documents WHERE doc_id % (SELECT s FROM stride) = 0
),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT 'b' || CAST(u_ix AS VARCHAR) AS src,
           'b' || CAST(v_ix AS VARCHAR) AS dst
    FROM draws WHERE u_ix <> v_ix
    UNION
    SELECT 'b' || CAST(v_ix AS VARCHAR),
           'b' || CAST(u_ix AS VARCHAR)
    FROM draws WHERE u_ix <> v_ix
  )
),
hosts AS MATERIALIZED (SELECT DISTINCT src AS host FROM edges),
d0 AS MATERIALIZED (
  SELECT host AS origin, host, CAST(0 AS BIGINT) AS d,
         CAST(1 AS BIGINT) AS sigma
  FROM hosts
),
f0 AS MATERIALIZED (SELECT origin, host, sigma FROM d0)"""
    ]
    for k in range(1, BW_HOPS + 1):
        parts.append(
            f""",
f{k} AS MATERIALIZED (
  SELECT c.origin, c.host, c.sigma FROM (
    SELECT f.origin, e.dst AS host, CAST(sum(f.sigma) AS BIGINT) AS sigma
    FROM f{k - 1} f JOIN edges e ON e.src = f.host
    GROUP BY f.origin, e.dst
  ) c
  WHERE NOT EXISTS (
    SELECT 1 FROM d{k - 1} dd
    WHERE dd.origin = c.origin AND dd.host = c.host
  )
),
d{k} AS MATERIALIZED (
  SELECT origin, host, d, sigma FROM d{k - 1}
  UNION ALL
  SELECT origin, host, CAST({k} AS BIGINT), sigma FROM f{k}
)"""
        )
    parts.append(
        f""",
pairs AS MATERIALIZED (
  SELECT origin, host, d, sigma FROM d{BW_HOPS} WHERE d > 0
),
tri AS (
  SELECT p2.origin AS v,
         CAST({contrib} AS BIGINT) AS contrib
  FROM pairs p1
  JOIN pairs p2 ON p2.origin = p1.host
  JOIN pairs p3 ON p3.origin = p1.origin AND p3.host = p2.host
  WHERE p1.origin <> p2.host AND p1.d + p2.d = p3.d
),
betw AS (
  SELECT v, CAST(count(*) AS BIGINT) AS n_triples,
         CAST(sum(contrib) AS BIGINT) AS betw_micro
  FROM tri GROUP BY v
),
deg AS (
  SELECT src AS host, CAST(count(*) AS BIGINT) AS degree
  FROM edges GROUP BY src
)
SELECT h.host,
       CAST(coalesce(dg.degree, 0) AS BIGINT) AS degree,
       CAST(coalesce(b.n_triples, 0) AS BIGINT) AS n_triples,
       CAST(coalesce(b.betw_micro, 0) AS BIGINT) AS betw_micro
FROM hosts h
LEFT JOIN deg dg ON dg.host = h.host
LEFT JOIN betw b ON b.v = h.host
ORDER BY betw_micro DESC, h.host ASC"""
    )
    return "".join(parts)


QUERIES["host_betweenness"] = (host_betweenness, _sql_betweenness())


# ------------------------------------------------- rich-club profile

# The rich-club coefficient (Zhou & Mondragon 2004; Colizza et al.
# 2006): phi(k) = 2*E_k / (N_k*(N_k-1)) — the edge density among the
# N_k hosts of degree > k — profiled over doubling thresholds. The
# degree-structure companion host_assortativity was missing: an
# assortativity coefficient is one number, the rich-club CURVE says
# whether the hubs of the crawl graph wire to each other (a dense core
# that a crawler should treat as one crawl-frontier equivalence class)
# or avoid each other. Computed on the planted-community
# link-prediction graph (_lp_und_edges — degrees are genuinely
# heterogeneous there); the un-normalized phi is reported with the
# whole-graph density as the k=0 baseline row (the degree-preserving
# null-model normalization needs rewiring randomness and is out of
# the deterministic-oracle contract, documented).
#
# Determinism: N_k, E_k exact counts; phi_milli = (2000 * E_k) DIV
# (N_k * (N_k - 1)) with the compound denominator PARENTHESIZED (the
# session's _DIVROUND lesson); N_k <= 1 yields NULL.
#
# Scale shape: one degree agg over the distinct-edge frame, then per
# threshold one broadcast-able semi-join of edges against the rich
# set — edges are scanned |levels| times but never shuffled on a new
# key.

RC_LEVELS = (0, 2, 4, 8, 16, 32)


def host_richclub_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, n_rich, e_rich, phi_milli): rich-club edge density among
    hosts of degree > k on the undirected community host graph."""
    und = _lp_und_edges(spark, sf_dir).cache()
    deg = (
        und.select(F.col("u").alias("host"))
        .union(und.select(F.col("v").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("d"))
    ).cache()
    out = None
    for k in RC_LEVELS:
        rich = deg.filter(F.col("d") > k).select("host")
        e_k = (
            und.join(rich.withColumnRenamed("host", "u"), "u", "semi")
            .join(rich.withColumnRenamed("host", "v"), "v", "semi")
            .agg(F.count("*").cast("long").alias("e_rich"))
        )
        n_k = rich.agg(F.count("*").cast("long").alias("n_rich"))
        row = n_k.crossJoin(e_k).select(
            F.lit(k).cast("long").alias("k"),
            "n_rich",
            "e_rich",
            F.expr(
                "CASE WHEN n_rich <= 1 THEN CAST(NULL AS BIGINT)"
                " ELSE CAST((2000 * e_rich) DIV (n_rich * (n_rich - 1))"
                " AS BIGINT) END"
            ).alias("phi_milli"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("k")


def _sql_richclub() -> str:
    levels = ", ".join(str(k) for k in RC_LEVELS)
    return f"""
WITH {_sql_lp_edge_ctes()},
deg AS MATERIALIZED (
  SELECT host, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS host FROM lpbase UNION ALL SELECT v FROM lpbase
  ) GROUP BY 1
),
levels AS (SELECT CAST(unnest([{levels}]) AS BIGINT) AS k),
rich AS (
  SELECT l.k, d.host FROM levels l JOIN deg d ON d.d > l.k
),
nk AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_rich FROM rich GROUP BY 1
),
ek AS (
  SELECT l.k, CAST(count(*) AS BIGINT) AS e_rich
  FROM levels l
  JOIN lpbase e ON EXISTS (
      SELECT 1 FROM rich r WHERE r.k = l.k AND r.host = e.u
    ) AND EXISTS (
      SELECT 1 FROM rich r WHERE r.k = l.k AND r.host = e.v
    )
  GROUP BY 1
)
SELECT l.k,
       CAST(coalesce(nk.n_rich, 0) AS BIGINT) AS n_rich,
       CAST(coalesce(ek.e_rich, 0) AS BIGINT) AS e_rich,
       CASE WHEN coalesce(nk.n_rich, 0) <= 1 THEN CAST(NULL AS BIGINT)
            ELSE CAST((2000 * coalesce(ek.e_rich, 0))
                 // (nk.n_rich * (nk.n_rich - 1)) AS BIGINT) END
         AS phi_milli
FROM levels l
LEFT JOIN nk ON nk.k = l.k
LEFT JOIN ek ON ek.k = l.k
ORDER BY l.k
"""


QUERIES["host_richclub_coefficient"] = (
    host_richclub_coefficient,
    _sql_richclub(),
)
