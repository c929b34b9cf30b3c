"""Web-corpus economics: mirror detection, static cache policy, Heaps fit.

Three planning/detection surfaces a web-scale crawl + serve stack runs on
top of the index the reference's harvester feeds (the reference's crawl
bookkeeping lives in Django models —
/root/reference/harvester/core/models/resources/harvest.py — and its
serving economics inside OpenSearch; both are re-expressed here as
verifiable (Spark, DuckDB-oracle) pairs):

- ``mirror_host_detect`` — Bharat & Broder (WWW 1999) host-mirror
  detection: hosts are fingerprinted by their documents' ORDER-INSENSITIVE
  content fingerprints (md5 of the sorted distinct token set — the corpus
  carries genuinely token-set-identical pages across hosts under reordered
  text, so this is detection on real content, not planted labels). Shared
  fingerprints pair hosts through an equi-join; fingerprints present on
  more than ``MIRROR_MAX_HOSTS`` hosts are dropped FIRST (boilerplate —
  the df-cap discipline of dedup_boilerplate_ngrams), and host-pair
  similarity is Jaccard over the retained fingerprint sets.
- ``static_cache_plan`` — Baeza-Yates et al. (SIGIR 2007) static
  posting-list caching: terms are admitted to a cache of
  ``CACHE_PCT`` % of total postings in decreasing QtfDf order (demand /
  cost; collection frequency stands in for query-log frequency, the
  standard offline proxy, documented). The plan reports the boundary term
  and the demand hit-mass the cache captures — the number that decides
  how much of a serving cluster's postings I/O a RAM tier absorbs.
- ``heaps_law_fit`` — the Heaps-law exponent β (V(n) = K·n^β) fitted by
  the ft_zipf_slope integer least-squares kernel over (ln tokens-seen,
  ln vocabulary) at the vocab_growth document cuts — the dictionary-size
  forecast that justifies the partitioned-dictionary suggestion surfaces
  (search/api.py dict_probe) at 10^12 docs.

Determinism contract (operators/__init__.py): Jaccard/hit-mass are
round-to-milli of exact integer ratios; the least-squares fit is pure
int64 (milli-ln inputs, _DIVROUND closed form — no float division);
every ordering carries a unique tie-break.

Scale shapes:
- mirror: the only corpus-sized work is the fingerprint scan; pairing is
  an equi-join on fingerprint with the boilerplate df-cap bounding any
  per-fingerprint host list to ≤ MIRROR_MAX_HOSTS (no quadratic blowup on
  template pages); host set sizes ride a broadcast join.
- cache plan: everything after the (dictionary-sized) term agg is a rank
  window over the vocabulary — at 10^8 terms this becomes the
  histogram + boundary-bucket order-statistic selection
  (token_budget_select's shape); at sandbox vocabulary one partition is
  the right plan.
- heaps: one dictionary agg + a 4-row cut frame.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.analysis import tokens_column
from harvester_spark.operators.common import SQL_DOC_TOKS, SQL_TOKS, doc_tokens, load
from harvester_spark.operators.index_stats import _DIVROUND, _MILLILN, VOCAB_CUTS

QUERIES: dict = {}

# ------------------------------------------------- mirror host detection

MIRROR_MAX_HOSTS = 50  # boilerplate cap: fingerprints on more hosts are noise
MIRROR_TOP = 20

_SET_FP_SPARK = None  # built inline (needs tokens_column)
_SQL_SET_FP = (
    "md5(array_to_string(list_sort(list_distinct("
    + SQL_TOKS.format(col="text")
    + ")), ' '))"
)


def mirror_host_detect(spark, sf_dir):
    """(host_a, host_b, shared, n_a, n_b, jaccard_milli): top host pairs
    by Jaccard over order-insensitive content-fingerprint sets."""
    docs = load(spark, sf_dir, "documents")
    hostfp = docs.select(
        F.col("source").alias("host"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(tokens_column(F.col("text"))))
            )
        ).alias("fp"),
    ).distinct()
    keep = (
        hostfp.groupBy("fp")
        .agg(F.count("*").alias("nh"))
        .filter(F.col("nh") <= MIRROR_MAX_HOSTS)
        .select("fp")
    )
    kept = hostfp.join(keep, "fp")
    sizes = kept.groupBy("host").agg(F.count("*").cast("long").alias("sz"))
    a = kept.select(F.col("host").alias("host_a"), "fp")
    b = kept.select(F.col("host").alias("host_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    out = (
        pairs.join(
            F.broadcast(sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("n_a"))),
            "host_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("n_b"))),
            "host_b",
        )
        .withColumn(
            "jaccard_milli",
            F.expr(
                "CAST(round(shared * 1000.0e0 / (n_a + n_b - shared), 0) AS BIGINT)"
            ),
        )
    )
    return (
        out.orderBy(
            F.col("jaccard_milli").desc(),
            F.col("host_a").asc(),
            F.col("host_b").asc(),
        )
        .limit(MIRROR_TOP)
        .select("host_a", "host_b", "shared", "n_a", "n_b", "jaccard_milli")
    )


SQL_MIRROR = f"""
WITH hostfp AS (
  SELECT DISTINCT source AS host, {_SQL_SET_FP} AS fp FROM documents
),
keep AS (
  SELECT fp FROM hostfp GROUP BY fp HAVING count(*) <= {MIRROR_MAX_HOSTS}
),
kept AS (SELECT h.host, h.fp FROM hostfp h JOIN keep USING (fp)),
sizes AS (SELECT host, CAST(count(*) AS BIGINT) AS sz FROM kept GROUP BY 1),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b, CAST(count(*) AS BIGINT) AS shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.host < b.host
  GROUP BY 1, 2
)
SELECT host_a, host_b, shared, sa.sz AS n_a, sb.sz AS n_b,
       CAST(round(shared * 1000.0e0 / (sa.sz + sb.sz - shared), 0) AS BIGINT)
         AS jaccard_milli
FROM pairs
JOIN sizes sa ON sa.host = host_a
JOIN sizes sb ON sb.host = host_b
ORDER BY jaccard_milli DESC, host_a ASC, host_b ASC
LIMIT {MIRROR_TOP}
"""

QUERIES["mirror_host_detect"] = (mirror_host_detect, SQL_MIRROR)


# ------------------------------------------------- static cache plan

CACHE_PCT = 10  # cache capacity: 10% of total postings

# integer demand/cost ratio for ORDERING only — identical truncation in
# both engines, tie-broken on term, so the admitted prefix is identical.
_QTFDF = "(cf * 1000000) {div} df"


def static_cache_plan(spark, sf_dir):
    """(n_terms, n_cached, budget_postings, cached_postings, demand_total,
    demand_cached, hit_mass_milli, boundary_term): greedy QtfDf static
    posting-cache admission under a postings budget."""
    stats = (
        doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("cf"),
            F.countDistinct("doc_id").cast("long").alias("df"),
        )
        .withColumn("ratio", F.expr(_QTFDF.format(div="DIV")))
    )
    wr = W.orderBy(F.col("ratio").desc(), F.col("term").asc())
    cum = stats.withColumn(
        "cum_df",
        F.sum("df").over(wr.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    tot = stats.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("total_postings"),
        F.sum("cf").cast("long").alias("demand_total"),
    ).withColumn(
        "budget_postings",
        F.expr(f"(total_postings * {CACHE_PCT}) DIV 100"),
    )
    cached = cum.crossJoin(F.broadcast(tot)).filter(
        F.col("cum_df") <= F.col("budget_postings")
    )
    summary = cached.agg(
        F.count("*").cast("long").alias("n_cached"),
        F.max("cum_df").cast("long").alias("cached_postings"),
        F.sum("cf").cast("long").alias("demand_cached"),
        F.max(F.struct(F.col("cum_df"), F.col("term"))).alias("_b"),
    ).select(
        "n_cached", "cached_postings", "demand_cached",
        F.col("_b.term").alias("boundary_term"),
    )
    return (
        tot.crossJoin(F.broadcast(summary))
        .withColumn(
            "hit_mass_milli",
            F.expr(
                "CAST(round(demand_cached * 1000.0e0 / demand_total, 0) AS BIGINT)"
            ),
        )
        .select(
            "n_terms", "n_cached", "budget_postings", "cached_postings",
            "demand_total", "demand_cached", "hit_mass_milli", "boundary_term",
        )
    )


SQL_CACHE_PLAN = f"""
WITH stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM ({SQL_DOC_TOKS}) GROUP BY term
),
ranked AS (
  SELECT term, cf, df, {_QTFDF.format(div='//')} AS ratio,
         CAST(sum(df) OVER (ORDER BY {_QTFDF.format(div='//')} DESC, term ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_df
  FROM stats
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(df) AS BIGINT) AS total_postings,
         CAST(sum(cf) AS BIGINT) AS demand_total,
         (CAST(sum(df) AS BIGINT) * {CACHE_PCT}) // 100 AS budget_postings
  FROM stats
),
cached AS (
  SELECT r.* FROM ranked r CROSS JOIN tot
  WHERE r.cum_df <= tot.budget_postings
),
summary AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cached,
         CAST(max(cum_df) AS BIGINT) AS cached_postings,
         CAST(sum(cf) AS BIGINT) AS demand_cached,
         arg_max(term, cum_df) AS boundary_term
  FROM cached
)
SELECT n_terms, n_cached, budget_postings, cached_postings, demand_total,
       demand_cached,
       CAST(round(demand_cached * 1000.0e0 / demand_total, 0) AS BIGINT)
         AS hit_mass_milli,
       boundary_term
FROM tot CROSS JOIN summary
"""

QUERIES["static_cache_plan"] = (static_cache_plan, SQL_CACHE_PLAN)


# ------------------------------------------------------- Heaps-law fit

# The raw corpus is word-soup over a ~31-type closed vocabulary — its
# growth curve saturates at doc 5 and any fit on it is degenerate (the
# test_corpus_synthesis_actually_collapses_variants discipline: an oracle
# passing on a flat column proves nothing). Real web text is open-class
# Zipfian, so the operator synthesizes the type stream the way the corpus
# generator would at web scale: each token SLOT (doc_id, pos) draws a
# type id r = M DIV (1 + h mod M) from the slot's md5 (h uniform ⇒
# P(r) ∝ 1/r(r+1) ≈ r^-2, the Zipf tail), giving genuinely Heaps-shaped
# V(n) ≈ c·n^0.5 growth for n ≪ M. The hash is the repo-wide 56-bit
# md5 idiom (Spark conv == DuckDB hex-cast, verified identical).
HEAPS_M = 1 << 20


def heaps_law_fit(spark, sf_dir):
    """(n_cuts, beta_micro, intercept_milli): integer least-squares fit of
    ln(synthetic-Zipf vocabulary) on ln(tokens seen) at the vocab_growth
    document cuts."""
    slot = F.concat(
        F.col("doc_id").cast("string"), F.lit(":"), F.col("pos").cast("string")
    )
    h = F.conv(F.substring(F.md5(slot), 1, 14), 16, 10).cast("long")
    toks = (
        doc_tokens(spark, sf_dir)
        .withColumn("h", h)
        .select(
            "doc_id",
            F.expr(f"{HEAPS_M} DIV (1 + (h % {HEAPS_M}))").alias("ztype"),
        )
    )
    cuts = spark.createDataFrame([(int(c),) for c in VOCAB_CUTS], "cut long")
    at = (
        toks.crossJoin(F.broadcast(cuts))
        .filter(F.col("doc_id") < F.col("cut"))
        .groupBy("cut")
        .agg(
            F.count("*").cast("long").alias("ntok"),
            F.countDistinct("ztype").cast("long").alias("vocab"),
        )
    )
    xy = at.select(
        F.expr(_MILLILN.format(v="ntok")).alias("x"),
        F.expr(_MILLILN.format(v="vocab")).alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    sl = s.withColumn(
        "beta_micro",
        F.expr(
            _DIVROUND.format(
                num="(n * sxy - sx * sy)", den="(n * sxx - sx * sx)", div="DIV"
            )
        ),
    )
    return sl.select(
        F.col("n").alias("n_cuts"),
        "beta_micro",
        F.expr("(sy * 1000000 - beta_micro * sx) DIV (n * 1000000)").alias(
            "intercept_milli"
        ),
    )


SQL_HEAPS = f"""
WITH raw AS ({SQL_DOC_TOKS}),
toks AS (
  SELECT doc_id,
         {HEAPS_M} // (1 + (CAST(('0x' || substr(md5(
             CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)
         ), 1, 14)) AS BIGINT) % {HEAPS_M})) AS ztype
  FROM raw
),
cuts AS (SELECT unnest({list(VOCAB_CUTS)}) AS cut),
at_ AS (
  SELECT cut, CAST(count(*) AS BIGINT) AS ntok,
         CAST(count(DISTINCT ztype) AS BIGINT) AS vocab
  FROM toks JOIN cuts ON doc_id < cut GROUP BY cut
),
xy AS (
  SELECT {_MILLILN.format(v='ntok')} AS x, {_MILLILN.format(v='vocab')} AS y
  FROM at_
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy
),
sl AS (
  SELECT n, {_DIVROUND.format(num="(n * sxy - sx * sy)",
                              den="(n * sxx - sx * sx)", div="//")} AS beta_micro,
         sx, sy
  FROM s
)
SELECT n AS n_cuts, beta_micro,
       (sy * 1000000 - beta_micro * sx) // (n * 1000000) AS intercept_milli
FROM sl
"""

QUERIES["heaps_law_fit"] = (heaps_law_fit, SQL_HEAPS)
