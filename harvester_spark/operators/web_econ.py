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
from harvester_spark.operators.common import (
    SQL_DOC_TOKS,
    SQL_TOKS,
    cents,
    doc_tokens,
    load,
    sql_cents,
)
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


# ----------------------------------------------------------- bot scoring

# Rule-based bot/automation detection over the interaction log — the
# traffic-curation step every web analytics (and LLM-training-data) tier
# runs before trusting its click/usage signals. Three classic per-client
# features, each an exact integer:
# - request rate (events/hour, milli) over the client's active span,
# - inter-arrival REGULARITY: the squared coefficient of variation of
#   event gaps — humans are bursty (CV² ≈ 1, the Poisson value), cron-like
#   automation is metronomic (CV² → 0). Exact integer moments over gaps
#   in MINUTES, reported milli (the unit choice keeps
#   n·Σgap² · 1000 inside int64 up to ~9e15 gap-minute² mass per client —
#   documented overflow bound),
# - error ratio (milli) — scrapers hit dead endpoints.
# Flags fire against fixed thresholds chosen at the distribution medians
# (RATE > {BOT_RATE_T}, CV² < {BOT_CV2_T} with ≥ 5 gaps, err ≥
# {BOT_ERR_T}) so both flag values occur on organic traffic; bot_score
# sums the flags. Timestamps go through unix_micros(CAST(ts AS
# TIMESTAMP)) / epoch_us — exact integer µs, no fractional-epoch seam
# (the CLAUDE.md epoch() gotcha).
#
# Scale shape: one user-keyed lag window + one groupBy — the sessionize
# cost envelope; thresholds are literals, nothing reaches the driver.

BOT_RATE_T = 100  # events/hour milli
BOT_CV2_T = 900  # CV^2 milli
BOT_ERR_T = 250  # error-ratio milli

_BOT_FLAGS = (
    "CAST((rate_milli > {rate_t}) AS BIGINT) + "
    "CAST((n_gaps >= 5 AND cv2_milli < {cv2_t}) AS BIGINT) + "
    "CAST((err_milli >= {err_t}) AS BIGINT)"
)


def events_bot_detection(spark, sf_dir):
    """(user_id, n_events, rate_milli, cv2_milli, err_milli, bot_score):
    per-client automation features + rule score."""
    ev = load(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    g = ev.withColumn(
        "gap_m", F.expr("(us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)) DIV 60000000")
    )
    per = g.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).cast("long").alias("n_err"),
        F.expr("CAST((max(us) - min(us)) DIV 1000000 AS BIGINT)").alias("span_s"),
        F.count("gap_m").cast("long").alias("n_gaps"),
        F.coalesce(F.sum("gap_m"), F.lit(0)).cast("long").alias("g1"),
        F.coalesce(F.sum(F.col("gap_m") * F.col("gap_m")), F.lit(0)).cast("long").alias("g2"),
    )
    feats = per.select(
        "user_id",
        "n_events",
        "n_gaps",
        F.expr("CAST(n_events * 3600000 DIV greatest(span_s, 1) AS BIGINT)").alias("rate_milli"),
        F.expr(
            "CAST((n_gaps * g2 - g1 * g1) * 1000 DIV greatest(g1 * g1, 1) AS BIGINT)"
        ).alias("cv2_milli"),
        F.expr("CAST(n_err * 1000 DIV n_events AS BIGINT)").alias("err_milli"),
    )
    return feats.select(
        "user_id",
        "n_events",
        "rate_milli",
        "cv2_milli",
        "err_milli",
        F.expr(
            _BOT_FLAGS.format(rate_t=BOT_RATE_T, cv2_t=BOT_CV2_T, err_t=BOT_ERR_T)
        ).alias("bot_score"),
    )


SQL_BOT_DETECTION = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_us(ts)) AS BIGINT) AS us
  FROM events
),
g AS (
  SELECT user_id, event_type, us,
         (us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id))
           // 60000000 AS gap_m
  FROM ev
),
per AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_err,
         CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS span_s,
         CAST(count(gap_m) AS BIGINT) AS n_gaps,
         CAST(coalesce(sum(gap_m), 0) AS BIGINT) AS g1,
         CAST(coalesce(sum(gap_m * gap_m), 0) AS BIGINT) AS g2
  FROM g GROUP BY user_id
),
feats AS (
  SELECT user_id, n_events, n_gaps,
         CAST(n_events * 3600000 // greatest(span_s, 1) AS BIGINT)
           AS rate_milli,
         CAST((n_gaps * g2 - g1 * g1) * 1000 // greatest(g1 * g1, 1)
           AS BIGINT) AS cv2_milli,
         CAST(n_err * 1000 // n_events AS BIGINT) AS err_milli
  FROM per
)
SELECT user_id, n_events, rate_milli, cv2_milli, err_milli,
       CAST({_BOT_FLAGS.format(rate_t=BOT_RATE_T, cv2_t=BOT_CV2_T,
                               err_t=BOT_ERR_T)} AS BIGINT) AS bot_score
FROM feats
"""

QUERIES["events_bot_detection"] = (events_bot_detection, SQL_BOT_DETECTION)


# ------------------------------------------------------- Gini / Lorenz

# Traffic-concentration analytics: the Lorenz curve and Gini coefficient
# of per-client event volume — the standard inequality read on any web
# log (a handful of clients generating most traffic is the capacity-
# planning and abuse-triage signal). With counts sorted ascending and
# ranked i = 1..n, Gini has the EXACT closed form
#   G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)
# — pure integers end to end (the numerator is nonnegative for ascending
# order by the rearrangement inequality), reported micro. Lorenz is the
# decile cumulative-share curve off the same ranked prefix sums.
#
# Scale shape: one user groupBy, one global rank + running sum over the
# CLIENT-count-sized relation (clients ≪ events; at 10^9 clients this is
# the one justified global sort — it IS the statistic), one scalar agg
# broadcast back. Deciles are a map expression on the rank.


def events_gini_lorenz(spark, sf_dir):
    """(decile, n_users_cum, events_cum, cum_share_micro, gini_micro):
    Lorenz decile points + the exact Gini of per-user event counts."""
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("x"))
    wr = W.orderBy(F.col("x").asc(), F.col("user_id").asc())
    ranked = per.withColumn("i", F.row_number().over(wr).cast("long"))
    tot = F.broadcast(
        ranked.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
            F.sum(F.col("i") * F.col("x")).cast("long").alias("six"),
        )
    )
    wc = W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = ranked.withColumn("cum", F.sum("x").over(wc).cast("long"))
    dec = (
        cum.crossJoin(tot)
        .withColumn("decile", F.expr("CAST(((i - 1) * 10) DIV n + 1 AS BIGINT)"))
        .groupBy("decile")
        .agg(
            F.max("i").cast("long").alias("n_users_cum"),
            F.max("cum").cast("long").alias("events_cum"),
            F.expr("CAST(max(cum) * 1000000 DIV max(s) AS BIGINT)").alias(
                "cum_share_micro"
            ),
            F.expr(
                "CAST((2 * max(six) - (max(n) + 1) * max(s)) * 1000000"
                " DIV (max(n) * max(s)) AS BIGINT)"
            ).alias("gini_micro"),
        )
    )
    return dec.select(
        "decile", "n_users_cum", "events_cum", "cum_share_micro", "gini_micro"
    )


SQL_GINI_LORENZ = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY user_id
),
ranked AS (
  SELECT user_id, x,
         CAST(row_number() OVER (ORDER BY x ASC, user_id ASC) AS BIGINT) AS i
  FROM per
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(i * x) AS BIGINT) AS six
  FROM ranked
),
cum AS (
  SELECT i, x,
         CAST(sum(x) OVER (ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM ranked
)
SELECT CAST(((i - 1) * 10) // n + 1 AS BIGINT) AS decile,
       CAST(max(i) AS BIGINT) AS n_users_cum,
       CAST(max(cum) AS BIGINT) AS events_cum,
       CAST(max(cum) * 1000000 // max(s) AS BIGINT) AS cum_share_micro,
       CAST((2 * max(six) - (max(n) + 1) * max(s)) * 1000000
            // (max(n) * max(s)) AS BIGINT) AS gini_micro
FROM cum CROSS JOIN tot
GROUP BY 1
"""

QUERIES["events_gini_lorenz"] = (events_gini_lorenz, SQL_GINI_LORENZ)


# ---------------------------------------------- hourly autocorrelation

# The time-series diagnostic the forecasting family (events_moving_holt,
# events_forecast_eval, events_seasonality_r2) was missing: the sample
# autocorrelation function of the hourly event-count series at the
# standard diagnostic lags. FULLY integer-exact — no floats anywhere:
# with n hours, S = Σx, center through y_h = n·x_h − S (clears the mean
# without division), then
#   acf(k) = Σ_h y_h·y_{h+k} / Σ_h y_h²
# (the standard full-series-variance normalization, so |acf| ≤ 1 and
# lags are comparable). Both sums are exact int64; the milli ratio is a
# sign-split floored division (numerators go negative, Spark DIV
# truncates / DuckDB // floors — magnitudes only).
#
# Overflow bound: |y| ≤ n·max(x), so Σy² ≤ n³·max(x)² — at a year of
# hours (n = 8760) and 10^6 events/hour that is ~7e20: past int64. The
# scale path centers per-WEEK blocks (same algebra, block-local S) or
# drops to 128-bit decimal for the two sums; at the sandbox's bounded
# spans (≤ 720 hours) int64 has 10^4 headroom, documented here.
#
# Scale shape: one hourly groupBy (map-side partial) → a calendar-bounded
# series frame; the lag alignment is an equi-join of the series to itself
# on hour+k (no window, no single-partition sort of the corpus); the
# scalar (S, n, den) aggs broadcast.

ACF_LAGS = (1, 2, 3, 6, 12, 24)


def events_acf(spark, sf_dir):
    """(lag, n_hours, num, den, acf_milli): integer-exact sample ACF of
    the densified hourly event-count series at the diagnostic lags."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("x"))
    hours = spark.range(b.mn, b.mx + 1).select(F.col("id").alias("hour"))
    dens = hours.join(counts, "hour", "left").select(
        "hour", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    tot = F.broadcast(
        dens.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        )
    )
    y = dens.crossJoin(tot).select(
        "hour", (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("y")
    )
    den_df = F.broadcast(
        y.agg(F.sum(F.col("y") * F.col("y")).cast("long").alias("den"))
    )
    lags = spark.createDataFrame([(k,) for k in ACF_LAGS], "lag long")
    lead = y.select(F.col("hour").alias("hour2"), F.col("y").alias("y2"))
    prod = (
        y.crossJoin(F.broadcast(lags))
        .withColumn("hour2", F.col("hour") + F.col("lag"))
        .join(lead, "hour2")
        .groupBy("lag")
        .agg(F.sum(F.col("y") * F.col("y2")).cast("long").alias("num"))
    )
    return (
        prod.crossJoin(den_df)
        .crossJoin(tot)
        .select(
            "lag",
            F.col("n").alias("n_hours"),
            "num",
            "den",
            F.expr(
                "CASE WHEN den = 0 THEN NULL"
                " WHEN num >= 0 THEN CAST((1000 * num) DIV den AS BIGINT)"
                " ELSE CAST(-((1000 * (-num)) DIV den) AS BIGINT) END"
            ).alias("acf_milli"),
        )
    )


SQL_EVENTS_ACF = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour FROM events
),
b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (
  SELECT hour, CAST(count(*) AS BIGINT) AS x FROM ev GROUP BY 1
),
dens AS MATERIALIZED (
  SELECT CAST(h AS BIGINT) AS hour, CAST(coalesce(c.x, 0) AS BIGINT) AS x
  FROM (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b) + 1)) AS h)
  LEFT JOIN counts c ON c.hour = h
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM dens
),
y AS MATERIALIZED (
  SELECT hour, CAST(n * x - s AS BIGINT) AS y FROM dens CROSS JOIN tot
),
dn AS (SELECT CAST(sum(y * y) AS BIGINT) AS den FROM y),
lags AS (SELECT CAST(unnest({list(ACF_LAGS)}) AS BIGINT) AS lag),
prod AS (
  SELECT lag, CAST(sum(a.y * b2.y) AS BIGINT) AS num
  FROM y a CROSS JOIN lags JOIN y b2 ON b2.hour = a.hour + lag
  GROUP BY 1
)
SELECT lag, n AS n_hours, num, den,
       CASE WHEN den = 0 THEN NULL
            WHEN num >= 0 THEN CAST((1000 * num) // den AS BIGINT)
            ELSE CAST(-((1000 * (-num)) // den) AS BIGINT) END AS acf_milli
FROM prod CROSS JOIN dn CROSS JOIN tot
"""

QUERIES["events_acf"] = (events_acf, SQL_EVENTS_ACF)


# ------------------------------------------ Kaplan-Meier survival curve

# Product-limit survival estimate (Kaplan & Meier 1958) of
# time-to-first-purchase after signup, with REAL right-censoring: a
# user's clock starts at their first signup second; death = first
# purchase strictly after it; subjects with no purchase within the
# KM_HORIZON_H-hour administrative window are censored at the horizon
# (the horizon is what makes censoring non-degenerate on this corpus —
# every user eventually purchases, so "censored at end of data" would be
# structurally empty, the vocab_oov_holdout lesson). The retention /
# funnel / absorption family had no censoring-aware estimator.
#
# Determinism: event times are integer HOURS from integer epoch seconds
# (unix_timestamp truncates to seconds = DuckDB floor(epoch()) — the
# CLAUDE.md fractional-epoch rule); the risk set n_t is an integer
# window cumsum; each KM step ln((n−d)/n) is ONE shared float-expression
# string on identical integers, rounded half-away-from-zero to integer
# micro-nats; the survival curve is the exact integer CUMSUM of step
# micro-nats (Π(1−d/n) in log space — the product itself would need
# bigint rationals). A d = n_t step (everyone at risk dies) is NULL and
# both engines' sum() skip NULLs identically — documented, not reachable
# on this corpus.
#
# Scale shape: one per-user agg (shuffle on user_id), one per-hour agg
# (≤ horizon+1 rows), then windows over the horizon-bounded time frame —
# the curve frame is O(horizon), never O(users).

KM_HORIZON_H = 72


def _km_step_expr() -> str:
    x = "(ln((n_risk - d) / (1.0e0 * n_risk)))"
    return (
        "CASE WHEN d = 0 THEN CAST(0 AS BIGINT)"
        " WHEN n_risk = d THEN NULL"
        f" ELSE CAST(-floor(-{x} * 1.0e6 + 0.5e0) AS BIGINT) END"
    )


def events_survival_km(spark, sf_dir):
    """(t_h, n_risk, d, c, step_micro, cum_lns_micro): Kaplan-Meier
    curve of hours from first signup to first purchase, administratively
    censored at {KM_HORIZON_H} h; survival in cumulative micro-nats."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("se"),
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("se").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("se") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min(F.col("se") - F.col("t0")).alias("gap_s"))
    )
    subj = s.join(p, "user_id", "left").select(
        "user_id",
        F.expr(
            f"CASE WHEN gap_s IS NOT NULL AND gap_s DIV 3600 < {KM_HORIZON_H}"
            f" THEN gap_s DIV 3600 ELSE CAST({KM_HORIZON_H} AS BIGINT) END"
        ).alias("t_h"),
        F.expr(
            f"CASE WHEN gap_s IS NOT NULL AND gap_s DIV 3600 < {KM_HORIZON_H}"
            " THEN 1 ELSE 0 END"
        ).cast("long").alias("event"),
    )
    n_df = F.broadcast(subj.agg(F.count("*").cast("long").alias("n_subj")))
    grp = subj.groupBy("t_h").agg(
        F.sum("event").cast("long").alias("d"),
        F.sum(1 - F.col("event")).cast("long").alias("c"),
    )
    w_prev = W.orderBy("t_h").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.orderBy("t_h").rowsBetween(W.unboundedPreceding, 0)
    curve = grp.crossJoin(n_df).select(
        "t_h",
        "d",
        "c",
        (
            F.col("n_subj")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        ).cast("long").alias("n_risk"),
    )
    stepped = curve.withColumn("step_micro", F.expr(_km_step_expr()))
    return stepped.select(
        "t_h",
        "n_risk",
        "d",
        "c",
        "step_micro",
        F.sum("step_micro").over(w_cum).cast("long").alias("cum_lns_micro"),
    )


SQL_SURVIVAL_KM = f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS se
  FROM events
),
s AS (
  SELECT user_id, min(se) AS t0 FROM ev WHERE event_type = 'signup'
  GROUP BY 1
),
p AS (
  SELECT e.user_id, CAST(min(e.se - s.t0) AS BIGINT) AS gap_s
  FROM ev e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.se > s.t0
  GROUP BY 1
),
subj AS (
  SELECT s.user_id,
         CASE WHEN p.gap_s IS NOT NULL AND p.gap_s // 3600 < {KM_HORIZON_H}
              THEN p.gap_s // 3600
              ELSE CAST({KM_HORIZON_H} AS BIGINT) END AS t_h,
         CASE WHEN p.gap_s IS NOT NULL AND p.gap_s // 3600 < {KM_HORIZON_H}
              THEN 1 ELSE 0 END AS event
  FROM s LEFT JOIN p USING (user_id)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_subj FROM subj),
grp AS (
  SELECT t_h, CAST(sum(event) AS BIGINT) AS d,
         CAST(sum(1 - event) AS BIGINT) AS c
  FROM subj GROUP BY 1
),
curve AS (
  SELECT t_h, d, c,
         CAST(n_subj - coalesce(sum(d + c) OVER (
           ORDER BY t_h ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS n_risk
  FROM grp CROSS JOIN nn
),
stepped AS (
  SELECT t_h, n_risk, d, c, {_km_step_expr()} AS step_micro
  FROM curve
)
SELECT t_h, n_risk, d, c, step_micro,
       CAST(sum(step_micro) OVER (
         ORDER BY t_h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_lns_micro
FROM stepped
"""

QUERIES["events_survival_km"] = (events_survival_km, SQL_SURVIVAL_KM)


# ------------------------------------- difference-in-differences (DiD)

# The 2x2 difference-in-differences estimator (Card & Krueger 1994's
# workhorse) over the event stream: users are hash-assigned to
# treatment/control, the 30-day span splits into pre/post at day
# DID_POST_DAY, and the outcome is per-event purchase value in integer
# cents. The corpus carries no real intervention, so a DID_BOOST_CENTS
# effect is PLANTED on treated∧post purchase events (the click_model_pbm
# / emb_pca_power planted-recovery discipline — the estimator machinery,
# not the synthesis, is what the oracle and the recovery test pin); the
# 'view' cohort gets NO boost and rides the same pipeline as the placebo
# arm, so the pair (purchase ≈ boost, view ≈ 0) shows the estimator
# separates signal from noise rather than reading back a constant.
#
# Determinism: treatment = md5-hash parity (content-independent, both
# engines); day index from integer epoch seconds; cell means are
# floored milli-cent divisions of exact integer (sum, n) pairs — values
# are positive so no sign split is needed on the means; the DiD itself
# is integer subtraction of the four floored means (documented: the
# floor-then-subtract estimator, bit-identical across engines, within
# 4 milli-cents of the rational DiD which would overflow int64 on a
# common denominator at sf ≥ 0.1).
#
# Scale shape: one map-side-combined groupBy(event_type) with eight
# conditional aggregates — no joins, no windows; the global t-min is a
# 1-row broadcast.

DID_POST_DAY = 15  # day index where the post period starts
DID_BOOST_CENTS = 50_000  # planted treated∧post effect (purchase arm)


def events_did_abtest(spark, sf_dir):
    """(event_type, n00..n11, m00..m11, did_millicents): 2x2 DiD cell
    counts, floored milli-cent means, and the DiD estimate; the planted
    {DID_BOOST_CENTS}-cent effect sits only on the purchase arm."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    mn = F.broadcast(
        load(spark, sf_dir, "events")
        .agg(F.min(F.unix_timestamp("ts").cast("long")).alias("mn_se"))
    )
    from harvester_spark.operators.graph import _hash56

    rows = (
        ev.crossJoin(mn)
        .select(
            "event_type",
            (_hash56(F.concat(F.lit("did|"), F.col("user_id").cast("string"))) % 2)
            .cast("long")
            .alias("treated"),
            (
                (
                    (F.unix_timestamp("ts").cast("long") - F.col("mn_se"))
                    / F.lit(86400)
                ).cast("long")
                >= DID_POST_DAY
            )
            .cast("long")
            .alias("post"),
            cents("value").alias("cents"),
        )
        .withColumn(
            "y",
            (
                F.col("cents")
                + F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("treated") == 1)
                    & (F.col("post") == 1),
                    F.lit(DID_BOOST_CENTS),
                ).otherwise(F.lit(0))
            ).cast("long"),
        )
    )

    def cell(t, p, col, how):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        if how == "n":
            return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(col)
        return (
            F.sum(F.when(cond, F.col("y")).otherwise(0)).cast("long").alias(col)
        )

    agg = rows.groupBy("event_type").agg(
        cell(0, 0, "n00", "n"), cell(0, 1, "n01", "n"),
        cell(1, 0, "n10", "n"), cell(1, 1, "n11", "n"),
        cell(0, 0, "s00", "s"), cell(0, 1, "s01", "s"),
        cell(1, 0, "s10", "s"), cell(1, 1, "s11", "s"),
    )
    m = {
        f"m{t}{p}": F.expr(f"CAST((1000 * s{t}{p}) DIV n{t}{p} AS BIGINT)")
        for t in (0, 1) for p in (0, 1)
    }
    out = agg.select(
        "event_type", "n00", "n01", "n10", "n11",
        *[m[k].alias(k) for k in ("m00", "m01", "m10", "m11")],
    )
    return out.withColumn(
        "did_millicents",
        (
            (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
        ).cast("long"),
    )


def _sql_events_did() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'did|' || CAST(user_id AS VARCHAR)")
    cells_n = ",\n".join(
        f"         CAST(sum(CASE WHEN treated = {t} AND post = {p} THEN 1"
        f" ELSE 0 END) AS BIGINT) AS n{t}{p}"
        for t in (0, 1) for p in (0, 1)
    )
    cells_s = ",\n".join(
        f"         CAST(sum(CASE WHEN treated = {t} AND post = {p} THEN y"
        f" ELSE 0 END) AS BIGINT) AS s{t}{p}"
        for t in (0, 1) for p in (0, 1)
    )
    means = ",\n".join(
        f"       CAST((1000 * s{t}{p}) // n{t}{p} AS BIGINT) AS m{t}{p}"
        for t in (0, 1) for p in (0, 1)
    )
    return f"""
WITH mn AS (
  SELECT CAST(min(floor(epoch(ts))) AS BIGINT) AS mn_se FROM events
),
rows_ AS (
  SELECT event_type,
         {h} % 2 AS treated,
         CASE WHEN (CAST(floor(epoch(ts)) AS BIGINT) - mn_se) // 86400
                   >= {DID_POST_DAY} THEN 1 ELSE 0 END AS post,
         {sql_cents('value')} AS cents
  FROM events CROSS JOIN mn
  WHERE event_type IN ('purchase', 'view')
),
boosted AS (
  SELECT event_type, treated, post,
         CAST(cents + CASE WHEN event_type = 'purchase' AND treated = 1
                            AND post = 1
                           THEN {DID_BOOST_CENTS} ELSE 0 END AS BIGINT) AS y
  FROM rows_
),
agg AS (
  SELECT event_type,
{cells_n},
{cells_s}
  FROM boosted GROUP BY 1
)
SELECT event_type, n00, n01, n10, n11,
{means},
       CAST((CAST((1000 * s11) // n11 AS BIGINT)
             - CAST((1000 * s10) // n10 AS BIGINT))
            - (CAST((1000 * s01) // n01 AS BIGINT)
               - CAST((1000 * s00) // n00 AS BIGINT)) AS BIGINT)
         AS did_millicents
FROM agg
"""


QUERIES["events_did_abtest"] = (events_did_abtest, _sql_events_did())


# ------------------------------------------- autocomplete MRR eval

# Offline ranking-quality eval for the suggest surface (the reference's
# suggest_completion — search/views/autocomplete.py — ranks completions
# by document frequency; ft_suggest_completion twins the ranking, this
# operator scores it): for every vocabulary term and prefix length
# 1..SUG_MAX_PLEN, the "user" types the prefix intending that term, and
# the reciprocal rank of the term inside its prefix bucket (ordered df
# desc, term asc — the serving order) is aggregated into MRR, weighted
# by collection frequency (frequent terms are typed more — the standard
# log-free offline proxy, same stand-in static_cache_plan documents).
#
# Determinism: rr is the floored 1e6 DIV rank; MRR is Σ cf·rr DIV Σ cf
# — all exact int64. The per-plen MRR is monotone non-decreasing in
# prefix length BY CONSTRUCTION of nested buckets (a longer prefix can
# only shrink the bucket and never demote the intended term) — the
# pytest pins it as the semantic invariant.
#
# Scale shape: one dictionary agg (df, cf) + a rank window PARTITIONED
# BY (plen, prefix) — the dict_probe bucket discipline: at a 10^8-term
# web dictionary every window partition is one prefix bucket, never the
# whole vocabulary; the final agg is SUG_MAX_PLEN rows.

SUG_MAX_PLEN = 3


def suggest_mrr_eval(spark, sf_dir):
    """(plen, n_trials, w_total, mrr_micro): cf-weighted mean reciprocal
    rank of the df-ordered completion list at prefix lengths 1..{SUG_MAX_PLEN}."""
    toks = doc_tokens(spark, sf_dir)
    dic = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count("*").cast("long").alias("cf"),
    )
    plens = spark.range(1, SUG_MAX_PLEN + 1).select(
        F.col("id").cast("int").alias("plen")
    )
    trials = dic.crossJoin(F.broadcast(plens)).filter(
        F.length("term") >= F.col("plen")
    ).withColumn("prefix", F.expr("substring(term, 1, plen)"))
    wr = W.partitionBy("plen", "prefix").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    ranked = trials.withColumn("rank", F.row_number().over(wr)).withColumn(
        "rr_micro", F.expr("CAST(1000000 DIV rank AS BIGINT)")
    )
    return (
        ranked.groupBy("plen")
        .agg(
            F.count("*").cast("long").alias("n_trials"),
            F.sum("cf").cast("long").alias("w_total"),
            F.sum(F.col("cf") * F.col("rr_micro")).cast("long").alias("wrr"),
        )
        .select(
            "plen",
            "n_trials",
            "w_total",
            F.expr("CAST(wrr DIV w_total AS BIGINT)").alias("mrr_micro"),
        )
    )


SQL_SUGGEST_MRR = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dic AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS cf
  FROM toks GROUP BY 1
),
trials AS (
  SELECT term, df, cf, CAST(plen AS INT) AS plen,
         substring(term, 1, plen) AS prefix
  FROM dic CROSS JOIN (SELECT unnest(range(1, {SUG_MAX_PLEN + 1})) AS plen)
  WHERE length(term) >= plen
),
ranked AS (
  SELECT plen, cf,
         CAST(1000000 // row_number() OVER (
           PARTITION BY plen, prefix ORDER BY df DESC, term ASC
         ) AS BIGINT) AS rr_micro
  FROM trials
)
SELECT plen, CAST(count(*) AS BIGINT) AS n_trials,
       CAST(sum(cf) AS BIGINT) AS w_total,
       CAST(CAST(sum(cf * rr_micro) AS BIGINT) // CAST(sum(cf) AS BIGINT)
            AS BIGINT) AS mrr_micro
FROM ranked GROUP BY 1
"""

QUERIES["suggest_mrr_eval"] = (suggest_mrr_eval, SQL_SUGGEST_MRR)


# ------------------------------------- LRU stack-distance cache eval

# Mattson et al. (IBM Sys J 1970) stack-distance analysis — the DYNAMIC
# complement of static_cache_plan: one pass over the access stream
# yields the exact LRU hit count for EVERY cache size simultaneously,
# because an access hits an LRU cache of size C iff its reuse stack
# distance (1 + the number of DISTINCT other keys touched since this
# key's previous access) is ≤ C. The stream is the event log in
# event_id order, keyed by the props payload item.
#
# Relational form of the distance: with pos = global access rank,
# prev = the key's previous pos, and nxt = each access's next pos for
# the same key, the distinct-key count over (prev, pos) is the count of
# accesses m in that OPEN interval whose nxt falls at/after pos (each
# intervening key is counted exactly once — at its LAST access inside
# the interval; nxt IS NULL counts, the key never recurs). That is a
# pos-range join — exact, set-based, no sequential LRU state. The
# pytest runs an ACTUAL LRU simulation at every size and pins equality
# (the Mattson theorem, executed).
#
# Scale shape (documented): the global rank and the range join are
# log-bounded, not corpus-bounded; at a 10^11-access log the exact form
# shards the stream into time blocks with per-block Fenwick counting
# (classic parallel Mattson) — the relational twin here IS the per-block
# computation. Output is |CACHE_SIZES| rows.

CACHE_SIZES = (4, 16, 64)


def cache_lru_stack_distance(spark, sf_dir):
    """(cache_size, n_accesses, n_cold, n_hits, hit_rate_milli): exact
    LRU hit counts for every cache size from one stack-distance pass
    over the event-log access stream."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long").alias("key"),
    )
    wpos = W.orderBy("event_id")
    wkey = W.partitionBy("key").orderBy("pos")
    acc = (
        ev.withColumn("pos", F.row_number().over(wpos).cast("long"))
        .withColumn("prev", F.lag("pos").over(wkey))
        .withColumn("nxt", F.lead("pos").over(wkey))
        .cache()
    )
    reuse = acc.filter(F.col("prev").isNotNull()).select(
        F.col("pos").alias("apos"), F.col("prev").alias("aprev")
    )
    mids = acc.select(F.col("pos").alias("mpos"), F.col("nxt").alias("mnxt"))
    sd = (
        reuse.join(
            mids,
            (F.col("mpos") > F.col("aprev"))
            & (F.col("mpos") < F.col("apos"))
            & (F.col("mnxt").isNull() | (F.col("mnxt") >= F.col("apos"))),
            "left",
        )
        .groupBy("apos")
        .agg(
            F.count("mpos").cast("long").alias("sd")  # distinct others
        )
    )
    tot = F.broadcast(
        acc.agg(
            F.count("*").cast("long").alias("n_accesses"),
            F.sum(F.col("prev").isNull().cast("long"))
            .cast("long")
            .alias("n_cold"),
        )
    )
    sizes = spark.createDataFrame(
        [(c,) for c in CACHE_SIZES], "cache_size long"
    )
    hits = (
        sd.crossJoin(F.broadcast(sizes))
        .groupBy("cache_size")
        .agg(
            F.sum((F.col("sd") + 1 <= F.col("cache_size")).cast("long"))
            .cast("long")
            .alias("n_hits")
        )
    )
    return (
        sizes.join(hits, "cache_size", "left")
        .crossJoin(tot)
        .select(
            "cache_size",
            "n_accesses",
            "n_cold",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                "CAST((1000 * coalesce(n_hits, 0)) DIV n_accesses AS BIGINT)"
            ).alias("hit_rate_milli"),
        )
    )


SQL_LRU_STACK = f"""
WITH ev AS (
  SELECT event_id,
         CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS key
  FROM events
),
acc AS MATERIALIZED (
  SELECT key,
         CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS pos
  FROM ev
),
linked AS MATERIALIZED (
  SELECT pos,
         lag(pos) OVER (PARTITION BY key ORDER BY pos) AS prev,
         lead(pos) OVER (PARTITION BY key ORDER BY pos) AS nxt
  FROM acc
),
sd AS (
  SELECT a.pos AS apos, CAST(count(m.pos) AS BIGINT) AS sd
  FROM linked a
  LEFT JOIN linked m
    ON m.pos > a.prev AND m.pos < a.pos
   AND (m.nxt IS NULL OR m.nxt >= a.pos)
  WHERE a.prev IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_accesses,
         CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cold
  FROM linked
),
sizes AS (SELECT CAST(unnest({list(CACHE_SIZES)}) AS BIGINT) AS cache_size),
hits AS (
  SELECT cache_size,
         CAST(sum(CASE WHEN sd + 1 <= cache_size THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM sd CROSS JOIN sizes GROUP BY 1
)
SELECT s.cache_size, t.n_accesses, t.n_cold,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((1000 * coalesce(h.n_hits, 0)) // t.n_accesses AS BIGINT)
         AS hit_rate_milli
FROM sizes s LEFT JOIN hits h USING (cache_size) CROSS JOIN tot t
"""

QUERIES["cache_lru_stack_distance"] = (
    cache_lru_stack_distance,
    SQL_LRU_STACK,
)


# --------------------------------------------- cohort LTV curves

# Customer-lifetime-value curves per acquisition channel — the
# REVENUE-weighted sibling of events_retention (which counts active
# users): per (channel, age-in-days since the user's first event), the
# cumulative purchase revenue per cohort user. Time cohorts are
# degenerate on this corpus (every user's first event lands in the
# first days of the uniform scatter), so the cohort dimension is a
# hash-assigned acquisition CHANNEL, and a per-channel revenue
# multiplier (1+channel)x is PLANTED so the curves have an ordering the
# estimator must recover (the events_did_abtest discipline — the
# machinery, not the synthesis, is under test; the recovery pin is the
# final-age LTV ordering ch3 > ch0).
#
# Determinism: channel is an md5 scatter; ages from integer epoch days;
# revenue is integer cents times the integer multiplier; the curve is
# an integer window cumsum and a floored milli-cent per-user division.
#
# Scale shape: one per-user min (shuffle on user), one groupBy
# ((channel, age)) with map-side combine, a cumsum window whose
# partitions are calendar-bounded, and a broadcast channel-size dim.

LTV_CHANNELS = 4


def events_cohort_ltv(spark, sf_dir):
    """(channel, age_day, n_users, rev_cents, cum_rev_cents,
    ltv_millicents): cumulative per-user purchase revenue by days since
    first activity, per planted acquisition channel."""
    from harvester_spark.operators.graph import _hash56

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("se"),
        cents("value").alias("cents"),
    )
    first = ev.groupBy("user_id").agg(F.min("se").alias("t0"))
    chan = first.select(
        "user_id",
        "t0",
        (
            _hash56(F.concat(F.lit("ch|"), F.col("user_id").cast("string")))
            % LTV_CHANNELS
        ).cast("long").alias("channel"),
    )
    sizes = chan.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_users")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(chan, "user_id")
        .select(
            "channel",
            F.expr("(se - t0) DIV 86400").cast("long").alias("age_day"),
            ((1 + F.col("channel")) * F.col("cents")).cast("long").alias("y"),
        )
    )
    daily = purch.groupBy("channel", "age_day").agg(
        F.sum("y").cast("long").alias("rev_cents")
    )
    wc = (
        W.partitionBy("channel")
        .orderBy("age_day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        daily.withColumn(
            "cum_rev_cents", F.sum("rev_cents").over(wc).cast("long")
        )
        .join(F.broadcast(sizes), "channel")
        .select(
            "channel",
            "age_day",
            "n_users",
            "rev_cents",
            "cum_rev_cents",
            F.expr(
                "CAST((1000 * cum_rev_cents) DIV n_users AS BIGINT)"
            ).alias("ltv_millicents"),
        )
    )


def _sql_cohort_ltv() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'ch|' || CAST(user_id AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS se,
         {sql_cents('value')} AS cents
  FROM events
),
first_ AS (
  SELECT user_id, min(se) AS t0, {h} % {LTV_CHANNELS} AS channel
  FROM ev GROUP BY user_id
),
sizes AS (
  SELECT channel, CAST(count(*) AS BIGINT) AS n_users
  FROM first_ GROUP BY 1
),
purch AS (
  SELECT f.channel, (e.se - f.t0) // 86400 AS age_day,
         CAST((1 + f.channel) * e.cents AS BIGINT) AS y
  FROM ev e JOIN first_ f USING (user_id)
  WHERE e.event_type = 'purchase'
),
daily AS (
  SELECT channel, age_day, CAST(sum(y) AS BIGINT) AS rev_cents
  FROM purch GROUP BY 1, 2
),
cum AS (
  SELECT *, CAST(sum(rev_cents) OVER (
    PARTITION BY channel ORDER BY age_day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS cum_rev_cents
  FROM daily
)
SELECT c.channel, c.age_day, s.n_users, c.rev_cents, c.cum_rev_cents,
       CAST((1000 * c.cum_rev_cents) // s.n_users AS BIGINT)
         AS ltv_millicents
FROM cum c JOIN sizes s USING (channel)
"""


QUERIES["events_cohort_ltv"] = (events_cohort_ltv, _sql_cohort_ltv())


# ------------------------------------------- DAU/MAU stickiness

# The product-analytics engagement ratio (DAU / 28-day MAU): for every
# day with a full trailing window, the count of distinct daily-active
# users over the count of distinct 28-day-active users. The MAU is
# EXACT: each distinct (user, day) activity contributes to the 28
# window-end days it keeps the user "monthly active" for, and MAU(d) is
# a distinct count over contributions — the events_hll_sliding
# explode-into-starts alignment, with exact distinct instead of HLL
# (the HLL twin is the 100 TB path; this is the ground-truth surface).
#
# Determinism: integer epoch days; exact BIGINT counts; stickiness is a
# floored milli division.
#
# Scale shape: the distinct (user, day) reduction happens FIRST (one
# shuffle, corpus → user-day cardinality); the 28× explode runs on that
# reduced frame; both counts are map-side-combinable aggs keyed by day.

MAU_WINDOW = 28


def events_stickiness_dau_mau(spark, sf_dir):
    """(day, dau, mau, stickiness_milli): daily actives over exact
    trailing-{MAU_WINDOW}-day monthly actives."""
    ud = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("CAST(unix_timestamp(ts) AS LONG) DIV 86400")
            .cast("long")
            .alias("day"),
        )
        .distinct()
        .cache()
    )
    b = ud.agg(F.min("day").alias("mn"), F.max("day").alias("mx")).collect()[0]
    dau = ud.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    mau = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"), F.col("day") + (MAU_WINDOW - 1)
                )
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .filter(
            (F.col("day") >= b.mn + MAU_WINDOW - 1) & (F.col("day") <= b.mx)
        )
        .select(
            "day",
            "dau",
            "mau",
            F.expr("CAST((1000 * dau) DIV mau AS BIGINT)").alias(
                "stickiness_milli"
            ),
        )
    )


SQL_STICKINESS = f"""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
),
b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM ud GROUP BY 1
),
mau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS mau FROM (
    SELECT DISTINCT user_id, day + o AS day
    FROM ud CROSS JOIN (
      SELECT CAST(unnest(range({MAU_WINDOW})) AS BIGINT) AS o
    )
  ) GROUP BY 1
)
SELECT d.day, d.dau, m.mau,
       CAST((1000 * d.dau) // m.mau AS BIGINT) AS stickiness_milli
FROM dau d JOIN mau m USING (day)
WHERE d.day >= (SELECT mn FROM b) + {MAU_WINDOW - 1}
  AND d.day <= (SELECT mx FROM b)
"""

QUERIES["events_stickiness_dau_mau"] = (
    events_stickiness_dau_mau,
    SQL_STICKINESS,
)


# ------------------------------------------- sample-ratio mismatch

# The experimentation-platform guardrail (Fabijan et al., KDD 2019
# diagnostics): before reading ANY A/B metric, check that the realized
# assignment split matches the design. The audit runs at the
# RANDOMIZATION-UNIT grain — here document-level rollout splits (e.g.,
# which index build serves each doc) where unit == row, so the χ² is
# valid. (The first draft audited user-randomized assignments at the
# exposure/event grain and the pytest caught it flagging an HONEST
# split — clustered exposures inflate χ², the classic
# cluster-randomization trap; kept as a docstring warning.) Two
# experiments ride the audit: an honest md5 %2 split (the null
# control) and a PLANTED broken randomizer (md5 %16 < 5 — a 31.25%
# share masquerading as 50/50). The audit must flag the plant and pass
# the honest split — pytest-pinned.
#
# Determinism: integer counts; χ² against the 50/50 design for two
# cells reduces to (a−b)²/n, an exact integer micro division; the 3.84
# (p=0.05, 1 df) line as a fixed micro constant.
#
# Scale shape: one conditional-aggregation scan carrying both
# experiments on the same shuffle via the experiment dimension.

SRM_SIG_MICRO = 3_841_000


def events_srm_check(spark, sf_dir):
    """(experiment, n_a, n_b, chi2_micro, srm_flag): unit-grain
    sample-ratio-mismatch χ² vs the 50/50 design for an honest
    doc-level rollout split and a planted broken randomizer."""
    from harvester_spark.operators.graph import _hash56

    docs = load(spark, sf_dir, "documents").select("doc_id")
    honest = docs.select(
        F.lit("rollout_split").alias("experiment"),
        (
            (_hash56(F.concat(F.lit("did|"), F.col("doc_id").cast("string"))) % 2)
            == 1
        ).alias("in_a"),
    )
    broken = docs.select(
        F.lit("planted_srm").alias("experiment"),
        (
            (_hash56(F.concat(F.lit("srm|"), F.col("doc_id").cast("string"))) % 16)
            < 5
        ).alias("in_a"),
    )
    both = honest.unionByName(broken)
    agg = both.groupBy("experiment").agg(
        F.sum(F.col("in_a").cast("long")).cast("long").alias("n_a"),
        F.sum((~F.col("in_a")).cast("long")).cast("long").alias("n_b"),
    )
    return agg.select(
        "experiment",
        "n_a",
        "n_b",
        F.expr(
            "CAST((1000000 * (n_a - n_b) * (n_a - n_b))"
            " DIV (n_a + n_b) AS BIGINT)"
        ).alias("chi2_micro"),
        F.expr(
            f"(1000000 * (n_a - n_b) * (n_a - n_b)) DIV (n_a + n_b)"
            f" >= {SRM_SIG_MICRO}"
        ).alias("srm_flag"),
    )


def _sql_srm() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h_did = _SQL_HASH56.format(col="'did|' || CAST(doc_id AS VARCHAR)")
    h_srm = _SQL_HASH56.format(col="'srm|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH both_g AS (
  SELECT 'rollout_split' AS experiment, ({h_did} % 2 = 1) AS in_a
  FROM documents
  UNION ALL
  SELECT 'planted_srm', ({h_srm} % 16 < 5) FROM documents
),
agg AS (
  SELECT experiment,
         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM both_g GROUP BY 1
)
SELECT experiment, n_a, n_b,
       CAST((1000000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b) AS BIGINT)
         AS chi2_micro,
       (1000000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b)
         >= {SRM_SIG_MICRO} AS srm_flag
FROM agg
"""


QUERIES["events_srm_check"] = (events_srm_check, _sql_srm())


# --------------------------------------- Shapley-value attribution

# Data-driven multi-touch attribution (Shapley 1953 via the simplified
# coalition estimator of Zhao et al. 2018 — what replaced last-touch in
# every ads platform; the position-rule sibling of events_attribution's
# ASOF last-touch): channels are the four non-purchase event types, a
# user's coalition S is the set of channel types among their FIRST
# {SHAP_FIRST_K} events (the early journey — full-history sets barely
# vary on this corpus), v(S) = observed conversion rate of users with
# exactly that coalition (unobserved coalitions ⇒ v = 0, the standard
# simplified estimator), and
#   φ_i = Σ_{S ∌ i} |S|!·(n−|S|−1)!/n! · (v(S∪i) − v(S)).
# Conversion is value-based (user's purchase total ≥ the cross-
# multiplied corpus mean — no float division), PLUS a planted lift on
# 'signup'-containing coalitions so the estimator has a real signal to
# recover (φ_signup must dominate; natural conversion alone is
# noise-level, documented).
#
# Determinism: coalitions are bitmasks over the sorted channel list;
# v is a floored milli division; the factorial weights are the exact
# integers {{6,2,2,6}}/24 (n = 4), so φ_micro is a sign-split
# (1000·Σ coef·Δv_milli) DIV 24. The Shapley EFFICIENCY identity
# Σφ = v(full) − v(∅) holds exactly in the pre-floor algebra and
# within ±4 micro after per-channel flooring — pytest-pinned.
#
# Scale shape: per-user first-K selection is one user-keyed window;
# coalition aggregation is one groupBy(mask) (≤ 2^n rows); the Shapley
# sum is a 2^n × n dimension join — constant-sized, broadcast.

SHAP_FIRST_K = 6
SHAP_CHANNELS = ("click", "error", "signup", "view")


def events_attribution_shapley(spark, sf_dir):
    """(channel, shap_micro, n_sub_pairs): simplified Shapley-value
    attribution over first-{SHAP_FIRST_K}-event coalitions with a
    planted 'signup' conversion lift."""
    from harvester_spark.operators.graph import _hash56

    n_ch = len(SHAP_CHANNELS)
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("se"),
        cents("value").alias("cents"),
    )
    wfk = W.partitionBy("user_id").orderBy("se", "event_id")
    first_k = (
        ev.withColumn("rn", F.row_number().over(wfk))
        .filter(
            (F.col("rn") <= SHAP_FIRST_K)
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", "event_type")
        .distinct()
    )
    idx = spark.createDataFrame(
        [(c, i) for i, c in enumerate(SHAP_CHANNELS)],
        "event_type string, ix int",
    )
    masks = (
        first_k.join(F.broadcast(idx), "event_type")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(1 AS BIGINT) << ix")).cast("long").alias("mask")
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.sum("cents").cast("long").alias("pc"))
    tot = F.broadcast(
        purch.agg(
            F.count("*").cast("long").alias("nu"),
            F.sum("pc").cast("long").alias("sc"),
        )
    )
    users = (
        ev.select("user_id")
        .distinct()
        .join(masks, "user_id", "left")
        .join(purch, "user_id", "left")
        .crossJoin(tot)
        .select(
            "user_id",
            F.coalesce("mask", F.lit(0)).cast("long").alias("mask"),
            "pc",
            "nu",
            "sc",
        )
        .withColumn(
            "h",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cv|"), F.col("user_id").cast("string"))),
                    1, 14,
                ), 16, 10,
            ).cast("long"),
        )
        .select(
            "user_id",
            "mask",
            F.expr(
                "CASE WHEN (mask & 4) != 0 AND h % 4 < 3 THEN 1"
                " WHEN pc IS NOT NULL AND nu * pc >= sc THEN 1"
                " ELSE 0 END"
            ).cast("long").alias("conv"),
        )
    )
    vtab = users.groupBy("mask").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_conv"),
    ).select(
        "mask",
        F.expr("CAST((1000 * n_conv) DIV n_users AS BIGINT)").alias("v_milli"),
    )
    all_masks = spark.range(1 << n_ch).select(
        F.col("id").cast("long").alias("mask")
    )
    chans = spark.createDataFrame(
        [(c, i) for i, c in enumerate(SHAP_CHANNELS)],
        "channel string, ix int",
    )
    # coef(|S|) for n=4: 0!3!, 1!2!, 2!1!, 3!0! = 6, 2, 2, 6
    pairs = (
        all_masks.crossJoin(F.broadcast(chans))
        .filter(F.expr("(mask & (CAST(1 AS BIGINT) << ix)) = 0"))
        .withColumn("mask_i", F.expr("mask | (CAST(1 AS BIGINT) << ix)"))
        .withColumn("s_size", F.expr("bit_count(mask)"))
        .withColumn(
            "coef",
            F.expr(
                "CASE bit_count(mask) WHEN 0 THEN 6 WHEN 1 THEN 2"
                " WHEN 2 THEN 2 ELSE 6 END"
            ).cast("long"),
        )
        .join(vtab.withColumnRenamed("v_milli", "v_s"), "mask", "left")
        .join(
            vtab.select(
                F.col("mask").alias("mask_i"),
                F.col("v_milli").alias("v_si"),
            ),
            "mask_i",
            "left",
        )
        .select(
            "channel",
            (
                F.col("coef")
                * (F.coalesce("v_si", F.lit(0)) - F.coalesce("v_s", F.lit(0)))
            ).cast("long").alias("term"),
            (F.col("v_s").isNotNull() & F.col("v_si").isNotNull())
            .cast("long")
            .alias("observed"),
        )
    )
    return pairs.groupBy("channel").agg(
        F.expr(
            "CASE WHEN sum(term) >= 0"
            " THEN CAST((1000 * sum(term)) DIV 24 AS BIGINT)"
            " ELSE CAST(-((1000 * (-sum(term))) DIV 24) AS BIGINT) END"
        ).alias("shap_micro"),
        F.sum("observed").cast("long").alias("n_sub_pairs"),
    )


def _sql_shapley() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'cv|' || CAST(user_id AS VARCHAR)")
    chvals = ", ".join(
        f"('{c}', {i})" for i, c in enumerate(SHAP_CHANNELS)
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS se,
         {sql_cents('value')} AS cents
  FROM events
),
first_k AS (
  SELECT DISTINCT user_id, event_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY se, event_id) AS rn
    FROM ev
  ) WHERE rn <= {SHAP_FIRST_K} AND event_type <> 'purchase'
),
idx AS (SELECT * FROM (VALUES {chvals}) v(event_type, ix)),
masks AS (
  SELECT user_id,
         CAST(sum(CAST(1 AS BIGINT) << ix) AS BIGINT) AS mask
  FROM first_k JOIN idx USING (event_type) GROUP BY 1
),
purch AS (
  SELECT user_id, CAST(sum(cents) AS BIGINT) AS pc
  FROM ev WHERE event_type = 'purchase' GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nu, CAST(sum(pc) AS BIGINT) AS sc
  FROM purch
),
users AS (
  SELECT u.user_id, coalesce(m.mask, 0) AS mask,
         CASE WHEN (coalesce(m.mask, 0) & 4) != 0 AND {h} % 4 < 3 THEN 1
              WHEN p.pc IS NOT NULL AND t.nu * p.pc >= t.sc THEN 1
              ELSE 0 END AS conv
  FROM (SELECT DISTINCT user_id FROM ev) u
  LEFT JOIN masks m USING (user_id)
  LEFT JOIN purch p USING (user_id)
  CROSS JOIN tot t
),
vtab AS (
  SELECT mask,
         CAST((1000 * CAST(sum(conv) AS BIGINT)) // count(*) AS BIGINT)
           AS v_milli
  FROM users GROUP BY 1
),
chans AS (SELECT * FROM (VALUES {chvals}) v(channel, ix)),
pairs AS (
  SELECT c.channel,
         CAST((CASE bit_count(am.mask) WHEN 0 THEN 6 WHEN 1 THEN 2
               WHEN 2 THEN 2 ELSE 6 END)
              * (coalesce(vi.v_milli, 0) - coalesce(vs.v_milli, 0))
              AS BIGINT) AS term,
         CASE WHEN vs.v_milli IS NOT NULL AND vi.v_milli IS NOT NULL
              THEN 1 ELSE 0 END AS observed
  FROM (SELECT CAST(unnest(range({1 << len(SHAP_CHANNELS)})) AS BIGINT)
          AS mask) am
  CROSS JOIN chans c
  LEFT JOIN vtab vs ON vs.mask = am.mask
  LEFT JOIN vtab vi ON vi.mask = (am.mask | (CAST(1 AS BIGINT) << c.ix))
  WHERE (am.mask & (CAST(1 AS BIGINT) << c.ix)) = 0
)
SELECT channel,
       CASE WHEN sum(term) >= 0
            THEN CAST((1000 * CAST(sum(term) AS BIGINT)) // 24 AS BIGINT)
            ELSE CAST(-((1000 * (-CAST(sum(term) AS BIGINT))) // 24)
                 AS BIGINT) END AS shap_micro,
       CAST(sum(observed) AS BIGINT) AS n_sub_pairs
FROM pairs GROUP BY 1
"""


QUERIES["events_attribution_shapley"] = (
    events_attribution_shapley,
    _sql_shapley(),
)


# ------------------------------------------------ Hill tail index

# Extreme-value theory enters the library: the Hill (1975) estimator of
# the Pareto tail index over the top-k order statistics,
#   α̂ = k / Σ_{i≤k} ln(x_(i) / x_(k+1)),
# the number that decides whether a latency / revenue / degree tail has
# finite variance (α > 2) or will wreck every mean-based SLO. The
# event values are UNIFORM (no tail — kept as the honest control whose
# α̂ must blow up: a bounded distribution's tail index diverges), so a
# Pareto(α = 2) cohort is PLANTED from the same md5 uniforms via
# inverse-CDF x = 1/√(1−u) — the estimator must recover α ≈ 2 while
# the control reads ≫ 2 (both pinned).
#
# Determinism: u is an integer micro-uniform; the inverse-CDF and each
# ln(x_i/x_thr) go through ONE shared float string on identical
# integers with the micro-floor idiom; the order statistics use the
# (value desc, event_id asc) total order; α̂ is a floored milli
# division of exact integers.
#
# Scale shape: one rank window per cohort (at 10^11 events: the
# token_budget_select histogram + boundary-bucket selection — only the
# top-k tail ever ranks fully), one scalar agg each.

HILL_K_DIV = 10  # k = n / 10


def events_hill_tail_index(spark, sf_dir):
    """(cohort, n, k, sum_ln_micro, hill_milli): Hill tail-index
    estimates for the planted Pareto(2) cohort and the uniform
    control."""
    ev = load(spark, sf_dir, "events").select("event_id")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ht|"), F.col("event_id").cast("string"))),
                1, 14,
            ), 16, 10,
        ).cast("long") % 1_000_000
    )
    base = ev.select("event_id", u.alias("u"))
    pareto = base.select(
        F.lit("pareto2").alias("cohort"),
        "event_id",
        F.expr(
            "CAST(floor(1.0e6 / sqrt(1.0e0 - u / 1.0e6) + 0.5e0) AS BIGINT)"
        ).alias("x_micro"),
    )
    ctrl = base.select(
        F.lit("uniform").alias("cohort"),
        "event_id",
        (F.col("u") + 1).cast("long").alias("x_micro"),
    )
    both = pareto.unionByName(ctrl)
    wr = W.partitionBy("cohort").orderBy(
        F.col("x_micro").desc(), F.col("event_id").asc()
    )
    ranked = both.withColumn("rn", F.row_number().over(wr))
    nk = F.broadcast(
        both.groupBy("cohort").agg(
            F.count("*").cast("long").alias("n"),
            F.expr(f"CAST(count(*) DIV {HILL_K_DIV} AS BIGINT)").alias("k"),
        )
    )
    thr = (
        ranked.join(nk, "cohort")
        .filter(F.col("rn") == F.col("k") + 1)
        .select("cohort", F.col("x_micro").alias("x_thr"))
    )
    lns = (
        ranked.join(nk, "cohort")
        .filter(F.col("rn") <= F.col("k"))
        .join(F.broadcast(thr), "cohort")
        .select(
            "cohort",
            F.expr(
                "CAST(floor(ln(CAST(x_micro AS DOUBLE)"
                " / CAST(x_thr AS DOUBLE)) * 1.0e6 + 0.5e0) AS BIGINT)"
            ).alias("l"),
        )
        .groupBy("cohort")
        .agg(F.sum("l").cast("long").alias("sum_ln_micro"))
    )
    return (
        nk.join(lns, "cohort")
        .select(
            "cohort",
            "n",
            "k",
            "sum_ln_micro",
            F.expr(
                "CAST((1000 * k * 1000000) DIV sum_ln_micro AS BIGINT)"
            ).alias("hill_milli"),
        )
    )


def _sql_hill() -> str:
    h = "CAST(('0x' || substr(md5('ht|' || CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) % 1000000"
    return f"""
WITH base AS (
  SELECT event_id, {h} AS u FROM events
),
both_c AS (
  SELECT 'pareto2' AS cohort, event_id,
         CAST(floor(1.0e6 / sqrt(1.0e0 - u / 1.0e6) + 0.5e0) AS BIGINT)
           AS x_micro
  FROM base
  UNION ALL
  SELECT 'uniform', event_id, CAST(u + 1 AS BIGINT) FROM base
),
ranked AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY cohort
                               ORDER BY x_micro DESC, event_id ASC) AS rn
  FROM both_c
),
nk AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) // {HILL_K_DIV} AS BIGINT) AS k
  FROM both_c GROUP BY 1
),
thr AS (
  SELECT r.cohort, r.x_micro AS x_thr
  FROM ranked r JOIN nk USING (cohort)
  WHERE r.rn = nk.k + 1
),
lns AS (
  SELECT r.cohort,
         CAST(sum(CAST(floor(ln(CAST(r.x_micro AS DOUBLE)
              / CAST(t.x_thr AS DOUBLE)) * 1.0e6 + 0.5e0) AS BIGINT))
              AS BIGINT) AS sum_ln_micro
  FROM ranked r JOIN nk USING (cohort) JOIN thr t USING (cohort)
  WHERE r.rn <= nk.k
  GROUP BY 1
)
SELECT nk.cohort, nk.n, nk.k, l.sum_ln_micro,
       CAST((1000 * nk.k * 1000000) // l.sum_ln_micro AS BIGINT)
         AS hill_milli
FROM nk JOIN lns l USING (cohort)
"""


QUERIES["events_hill_tail_index"] = (events_hill_tail_index, _sql_hill())


# ------------------------------------------------ log-rank test

# Mantel's log-rank test — the TWO-SAMPLE companion of
# events_survival_km (the km curve describes; log-rank DECIDES whether
# two cohorts' hazards differ): at every death time, observed group-1
# deaths vs the hypergeometric expectation E = d·n1/n and variance
# V = d·(n1/n)(n2/n)(n−d)/(n−1); χ² = (Σ(O−E))²/ΣV. Subjects are
# SIGNUP EVENTS (each signup starts a clock to the user's next purchase
# within the KM horizon — the recurrent-event framing; USER-level
# subjects have no power at the sandbox's 15 users, measured). Two
# comparisons ride the same machinery:
#   null_split — md5 parity halves of the same durations (a single
#     χ²(1) draw under the true null — it CAN land in the 5% tail at a
#     given sf, measured 4.2 at sf0.01; the pinned contrast is the
#     RATIO against the planted comparison, which is tail-robust),
#   planted_dilation — group B's durations doubled (hazard halved;
#     χ² must flag decisively, ≫ the null draw).
# E and V fold to MILLI integers per death time via CHAINED floored
# divisions (each intermediate ≤ ~8e15 at 2·10⁴ subjects — the
# documented overflow ladder; a single big product would overflow);
# χ²_milli = (ΣO−ΣE)²·1000 DIV (1000·ΣV) on exact int64.
#
# Scale shape: one per-subject gap computation (the KM plan), one
# per-(comparison, time) agg, one horizon-bounded cumsum window, two
# scalar aggs.

LR_SIG_MILLI = 3841  # chi2(1df, p=0.05) in milli


def events_logrank_test(spark, sf_dir):
    """(comparison, n1, n2, o_milli, e_milli, v_milli, chi2_milli,
    significant): log-rank χ² for the null split and the planted
    hazard dilation over signup-to-purchase durations."""
    from harvester_spark.operators.graph import _hash56

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("se"),
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("sid"), F.col("se").alias("t0")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("se").alias("tp")
    )
    gaps = (
        signups.join(purch, "user_id", "left")
        .filter(F.col("tp").isNull() | (F.col("tp") > F.col("t0")))
        .groupBy("sid")
        .agg(F.min(F.col("tp") - F.col("t0")).alias("gap_s"))
    )
    subj = signups.select("sid").join(gaps, "sid", "left").select(
        "sid",
        F.expr(
            f"CASE WHEN gap_s IS NOT NULL AND gap_s DIV 3600 < {KM_HORIZON_H}"
            f" THEN gap_s DIV 3600 ELSE CAST({KM_HORIZON_H} AS BIGINT) END"
        ).alias("t_raw"),
        F.expr(
            f"CASE WHEN gap_s IS NOT NULL AND gap_s DIV 3600 < {KM_HORIZON_H}"
            " THEN 1 ELSE 0 END"
        ).cast("long").alias("e_raw"),
        (
            _hash56(F.concat(F.lit("lr|"), F.col("sid").cast("string"))) % 2
        ).cast("long").alias("grp"),
    )
    null_s = subj.select(
        F.lit("null_split").alias("comparison"), "sid", "grp",
        F.col("t_raw").alias("t"), F.col("e_raw").alias("e"),
    )
    dil = subj.select(
        F.lit("planted_dilation").alias("comparison"), "sid", "grp",
        F.expr(
            f"CASE WHEN grp = 1 THEN least(2 * t_raw,"
            f" CAST({KM_HORIZON_H} AS BIGINT)) ELSE t_raw END"
        ).alias("t"),
        F.expr(
            f"CASE WHEN grp = 1 THEN CASE WHEN 2 * t_raw < {KM_HORIZON_H}"
            " AND e_raw = 1 THEN 1 ELSE 0 END ELSE e_raw END"
        ).cast("long").alias("e"),
    )
    both = null_s.unionByName(dil)
    per_t = both.groupBy("comparison", "t").agg(
        F.sum(F.expr("CASE WHEN grp = 0 THEN e ELSE 0 END"))
        .cast("long").alias("d1"),
        F.sum("e").cast("long").alias("d"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END"))
        .cast("long").alias("x1"),
        F.count("*").cast("long").alias("x"),
    )
    wt = (
        W.partitionBy("comparison")
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    tot = F.broadcast(
        both.groupBy("comparison").agg(
            F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END"))
            .cast("long").alias("n1_tot"),
            F.count("*").cast("long").alias("n_tot"),
        )
    )
    risk = (
        per_t.join(tot, "comparison")
        .withColumn(
            "n1",
            (F.col("n1_tot") - F.coalesce(
                F.sum("x1").over(wt), F.lit(0))).cast("long"),
        )
        .withColumn(
            "nt",
            (F.col("n_tot") - F.coalesce(
                F.sum("x").over(wt), F.lit(0))).cast("long"),
        )
        .filter((F.col("d") > 0) & (F.col("nt") > 1))
        .withColumn("n2", (F.col("nt") - F.col("n1")).cast("long"))
        .withColumn("o_m", (1000 * F.col("d1")).cast("long"))
        .withColumn(
            "e_m", F.expr("CAST((1000 * d * n1) DIV nt AS BIGINT)")
        )
        .withColumn(
            "v_m",
            F.expr(
                "CAST(((((1000 * d * n1) DIV nt) * n2) DIV nt"
                " * (nt - d)) DIV (nt - 1) AS BIGINT)"
            ),
        )
    )
    agg = risk.groupBy("comparison").agg(
        F.sum("o_m").cast("long").alias("o_milli"),
        F.sum("e_m").cast("long").alias("e_milli"),
        F.sum("v_m").cast("long").alias("v_milli"),
    )
    return (
        agg.join(tot, "comparison")
        .select(
            "comparison",
            F.col("n1_tot").alias("n1"),
            (F.col("n_tot") - F.col("n1_tot")).cast("long").alias("n2"),
            "o_milli",
            "e_milli",
            "v_milli",
            F.expr(
                "CAST(((o_milli - e_milli) * (o_milli - e_milli) * 1000)"
                " DIV (1000 * v_milli) AS BIGINT)"
            ).alias("chi2_milli"),
            F.expr(
                "((o_milli - e_milli) * (o_milli - e_milli) * 1000)"
                f" DIV (1000 * v_milli) >= {LR_SIG_MILLI}"
            ).alias("significant"),
        )
    )


def _sql_logrank() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'lr|' || CAST(sid AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS se
  FROM events
),
signups AS (
  SELECT user_id, event_id AS sid, se AS t0 FROM ev
  WHERE event_type = 'signup'
),
purch AS (
  SELECT user_id, se AS tp FROM ev WHERE event_type = 'purchase'
),
gaps AS (
  SELECT s.sid, CAST(min(p.tp - s.t0) AS BIGINT) AS gap_s
  FROM signups s LEFT JOIN purch p
    ON p.user_id = s.user_id AND p.tp > s.t0
  GROUP BY 1
),
subj AS (
  SELECT sid,
         CASE WHEN gap_s IS NOT NULL AND gap_s // 3600 < {KM_HORIZON_H}
              THEN gap_s // 3600
              ELSE CAST({KM_HORIZON_H} AS BIGINT) END AS t_raw,
         CASE WHEN gap_s IS NOT NULL AND gap_s // 3600 < {KM_HORIZON_H}
              THEN 1 ELSE 0 END AS e_raw,
         {h} % 2 AS grp
  FROM gaps
),
both_s AS (
  SELECT 'null_split' AS comparison, sid, grp, t_raw AS t, e_raw AS e
  FROM subj
  UNION ALL
  SELECT 'planted_dilation', sid, grp,
         CASE WHEN grp = 1
              THEN least(2 * t_raw, CAST({KM_HORIZON_H} AS BIGINT))
              ELSE t_raw END,
         CASE WHEN grp = 1
              THEN CASE WHEN 2 * t_raw < {KM_HORIZON_H} AND e_raw = 1
                        THEN 1 ELSE 0 END
              ELSE e_raw END
  FROM subj
),
per_t AS (
  SELECT comparison, t,
         CAST(sum(CASE WHEN grp = 0 THEN e ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(e) AS BIGINT) AS d,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
         CAST(count(*) AS BIGINT) AS x
  FROM both_s GROUP BY 1, 2
),
tot AS (
  SELECT comparison,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1_tot,
         CAST(count(*) AS BIGINT) AS n_tot
  FROM both_s GROUP BY 1
),
risk AS (
  SELECT p.comparison, p.t, p.d1, p.d,
         CAST(tt.n1_tot - coalesce(sum(p.x1) OVER w, 0) AS BIGINT) AS n1,
         CAST(tt.n_tot - coalesce(sum(p.x) OVER w, 0) AS BIGINT) AS nt
  FROM per_t p JOIN tot tt USING (comparison)
  WINDOW w AS (PARTITION BY p.comparison ORDER BY p.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
contrib AS (
  SELECT comparison,
         CAST(1000 * d1 AS BIGINT) AS o_m,
         CAST((1000 * d * n1) // nt AS BIGINT) AS e_m,
         CAST(((((1000 * d * n1) // nt) * (nt - n1)) // nt
              * (nt - d)) // (nt - 1) AS BIGINT) AS v_m
  FROM risk WHERE d > 0 AND nt > 1
),
agg AS (
  SELECT comparison,
         CAST(sum(o_m) AS BIGINT) AS o_milli,
         CAST(sum(e_m) AS BIGINT) AS e_milli,
         CAST(sum(v_m) AS BIGINT) AS v_milli
  FROM contrib GROUP BY 1
)
SELECT a.comparison, t.n1_tot AS n1,
       CAST(t.n_tot - t.n1_tot AS BIGINT) AS n2,
       a.o_milli, a.e_milli, a.v_milli,
       CAST(((a.o_milli - a.e_milli) * (a.o_milli - a.e_milli) * 1000)
            // (1000 * a.v_milli) AS BIGINT) AS chi2_milli,
       ((a.o_milli - a.e_milli) * (a.o_milli - a.e_milli) * 1000)
         // (1000 * a.v_milli) >= {LR_SIG_MILLI} AS significant
FROM agg a JOIN tot t USING (comparison)
"""


QUERIES["events_logrank_test"] = (events_logrank_test, _sql_logrank())


# --------------------------------------- regression discontinuity

# The last member of the causal toolkit (DiD, CUPED, CMH, Shapley,
# log-rank, SRM, BH now have all their classic company): sharp
# regression discontinuity (Thistlethwaite & Campbell 1960) — units
# just above an eligibility cutoff get the treatment, and the causal
# effect is the JUMP in outcome at the cutoff, identified because
# nothing else changes discontinuously there. Planted synthesis: a
# running variable x ~ md5 uniform on [0,1000), outcome
# y = 2000 + 3·x + {RD_JUMP}·1[x ≥ {RD_CUTOFF}] + noise(±500).
# Estimator: difference of mean outcomes in the ±{RD_BW} bandwidth
# windows around the cutoff. Two cutoffs ride the same machinery: the
# TRUE cutoff (must recover ≈ RD_JUMP plus the known slope·bandwidth
# bias ≈ 3·{RD_BW}) and a PLACEBO at {RD_PLACEBO} (must read only the
# slope bias — no jump). Both pinned.
#
# Determinism: x, noise are md5 integers; y is exact; local means are
# floored milli divisions.
#
# Scale shape: map-only synthesis + one (cutoff, side) conditional agg.

RD_CUTOFF = 500
RD_PLACEBO = 250
RD_BW = 50
RD_JUMP = 3000


def events_regression_discontinuity(spark, sf_dir):
    """(cutoff_name, n_below, n_above, mean_below_milli,
    mean_above_milli, jump_milli): local-mean RDD estimates at the true
    and placebo cutoffs over the planted running variable."""
    from harvester_spark.operators.dedup import _hash56

    ev = load(spark, sf_dir, "events").select("event_id")
    rows = ev.select(
        "event_id",
        (
            _hash56(F.concat(F.lit("rx|"), F.col("event_id").cast("string")))
            % 1000
        ).cast("long").alias("x"),
        (
            _hash56(F.concat(F.lit("rn|"), F.col("event_id").cast("string")))
            % 1001
            - 500
        ).cast("long").alias("noise"),
    ).withColumn(
        "y",
        F.expr(
            f"CAST(2000 + 3 * x"
            f" + CASE WHEN x >= {RD_CUTOFF} THEN {RD_JUMP} ELSE 0 END"
            " + noise AS BIGINT)"
        ),
    )
    cuts = spark.createDataFrame(
        [("true_cutoff", RD_CUTOFF), ("placebo", RD_PLACEBO)],
        "cutoff_name string, c long",
    )
    local = (
        rows.crossJoin(F.broadcast(cuts))
        .filter(
            (F.col("x") >= F.col("c") - RD_BW)
            & (F.col("x") < F.col("c") + RD_BW)
        )
        .withColumn("above", (F.col("x") >= F.col("c")).cast("long"))
    )
    agg = local.groupBy("cutoff_name").agg(
        F.sum(1 - F.col("above")).cast("long").alias("n_below"),
        F.sum("above").cast("long").alias("n_above"),
        F.sum(F.expr("CASE WHEN above = 0 THEN y ELSE 0 END"))
        .cast("long").alias("sb"),
        F.sum(F.expr("CASE WHEN above = 1 THEN y ELSE 0 END"))
        .cast("long").alias("sa"),
    )
    return agg.select(
        "cutoff_name",
        "n_below",
        "n_above",
        F.expr("CAST((1000 * sb) DIV n_below AS BIGINT)").alias(
            "mean_below_milli"
        ),
        F.expr("CAST((1000 * sa) DIV n_above AS BIGINT)").alias(
            "mean_above_milli"
        ),
        F.expr(
            "CAST((1000 * sa) DIV n_above - (1000 * sb) DIV n_below"
            " AS BIGINT)"
        ).alias("jump_milli"),
    )


def _sql_rdd() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    hx = _SQL_HASH56.format(col="'rx|' || CAST(event_id AS VARCHAR)")
    hn = _SQL_HASH56.format(col="'rn|' || CAST(event_id AS VARCHAR)")
    return f"""
WITH rows_ AS (
  SELECT event_id, x, noise,
         CAST(2000 + 3 * x
              + CASE WHEN x >= {RD_CUTOFF} THEN {RD_JUMP} ELSE 0 END
              + noise AS BIGINT) AS y
  FROM (
    SELECT event_id, {hx} % 1000 AS x, {hn} % 1001 - 500 AS noise
    FROM events
  )
),
cuts AS (
  SELECT * FROM (VALUES ('true_cutoff', {RD_CUTOFF}),
                        ('placebo', {RD_PLACEBO})) v(cutoff_name, c)
),
local_w AS (
  SELECT cutoff_name,
         CASE WHEN x >= c THEN 1 ELSE 0 END AS above, y
  FROM rows_ CROSS JOIN cuts
  WHERE x >= c - {RD_BW} AND x < c + {RD_BW}
),
agg AS (
  SELECT cutoff_name,
         CAST(sum(1 - above) AS BIGINT) AS n_below,
         CAST(sum(above) AS BIGINT) AS n_above,
         CAST(sum(CASE WHEN above = 0 THEN y ELSE 0 END) AS BIGINT) AS sb,
         CAST(sum(CASE WHEN above = 1 THEN y ELSE 0 END) AS BIGINT) AS sa
  FROM local_w GROUP BY 1
)
SELECT cutoff_name, n_below, n_above,
       CAST((1000 * sb) // n_below AS BIGINT) AS mean_below_milli,
       CAST((1000 * sa) // n_above AS BIGINT) AS mean_above_milli,
       CAST((1000 * sa) // n_above - (1000 * sb) // n_below AS BIGINT)
         AS jump_milli
FROM agg
"""


QUERIES["events_regression_discontinuity"] = (
    events_regression_discontinuity,
    _sql_rdd(),
)


# ------------------------------------------- inspection paradox eval

# Length-biased sampling / the inspection paradox (Feller) — the
# analytics trap beside Simpson's: "average activity of the user behind
# a random EVENT" inflates over "average activity of a random USER" by
# exactly 1 + CV² (event-sampling hits heavy users proportionally more
# often). Both means are exact integer rationals over per-user counts
# (event-weighted mean = Σn²/Σn, user mean = Σn/U), the inflation is a
# cross-multiplied milli ratio, and the identity ratio = 1 + CV² is
# pinned EXACTLY in integers (Σn²·U vs (Σn)² — the same moments). The
# trap is real on this log (pinned > 1) even with mild skew.
#
# Scale shape: one per-user agg + one 3-moment rollup.


def events_inspection_paradox_eval(spark, sf_dir):
    """(n_users, n_events, user_mean_milli, event_mean_milli,
    inflation_milli): user-sampled vs event-sampled mean activity and
    the 1 + CV² inflation, exact integers."""
    per = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return per.agg(
        F.count("*").cast("long").alias("u"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    ).select(
        F.col("u").alias("n_users"),
        F.col("s1").alias("n_events"),
        F.expr("CAST((1000 * s1) DIV u AS BIGINT)").alias("user_mean_milli"),
        F.expr("CAST((1000 * s2) DIV s1 AS BIGINT)").alias(
            "event_mean_milli"
        ),
        F.expr(
            "CAST((1000 * s2 * u) DIV (s1 * s1) AS BIGINT)"
        ).alias("inflation_milli"),
    )


SQL_INSPECTION_PARADOX = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS u, CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM per
)
SELECT u AS n_users, s1 AS n_events,
       CAST((1000 * s1) // u AS BIGINT) AS user_mean_milli,
       CAST((1000 * s2) // s1 AS BIGINT) AS event_mean_milli,
       CAST((1000 * s2 * u) // (s1 * s1) AS BIGINT) AS inflation_milli
FROM mom
"""

QUERIES["events_inspection_paradox_eval"] = (
    events_inspection_paradox_eval,
    SQL_INSPECTION_PARADOX,
)


# ------------------------------------------------ Little's law check

# Little's law (1961): L = λ·W — time-average concurrency equals
# arrival rate times mean time-in-system, distribution-free. Checked on
# NATURAL data (no plant): the signup→purchase spans of the survival
# operator are the "customers in system"; λ and W come from the span
# table directly, while L is measured by an INDEPENDENT path — sampling
# the active-span count at every hour boundary (span explode + hourly
# mean). The two sides then disagree only by sampling discretization
# (hour-boundary counting vs continuous time) and edge effects — the
# pytest pins |L_sampled − λ·W| within that band, the recompute
# exactly. All quantities integer: durations in hours, means floored
# milli.
#
# Scale shape: the KM span computation + one bounded hour explode
# (≤ horizon per span) + calendar-sized aggs.


def events_littles_law_eval(spark, sf_dir):
    """(n_spans, total_hours, lam_micro, w_milli, l_sampled_milli,
    l_from_law_milli): Little's-law sides measured independently over
    the signup→purchase spans."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("se"),
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("se").alias("t0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("se") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("se").alias("tp"))
    )
    spans = (
        s.join(p, "user_id")
        .select(
            "user_id",
            F.expr("t0 DIV 3600").cast("long").alias("h0"),
            F.expr("tp DIV 3600").cast("long").alias("h1"),
        )
        .filter(F.col("h1") > F.col("h0"))
        .cache()
    )
    b = spans.agg(
        F.min("h0").alias("mn"), F.max("h1").alias("mx")
    ).collect()[0]
    total_h = b.mx - b.mn
    stats = spans.agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("h1") - F.col("h0")).cast("long").alias("sum_dur"),
    )
    # independent L: active-count at each hour boundary in [mn, mx)
    active = (
        spans.select(
            F.explode(
                F.sequence(F.col("h0"), F.col("h1") - 1)
            ).alias("h")
        )
        .groupBy("h")
        .agg(F.count("*").cast("long").alias("c"))
    )
    l_samp = (
        spark.range(b.mn, b.mx)
        .select(F.col("id").alias("h"))
        .join(active, "h", "left")
        .agg(
            F.sum(F.coalesce("c", F.lit(0))).cast("long").alias("sc"),
            F.count("*").cast("long").alias("nh"),
        )
    )
    return stats.crossJoin(l_samp).select(
        "n_spans",
        F.lit(total_h).cast("long").alias("total_hours"),
        F.expr(
            f"CAST((1000000 * n_spans) DIV {total_h} AS BIGINT)"
        ).alias("lam_micro"),
        F.expr("CAST((1000 * sum_dur) DIV n_spans AS BIGINT)").alias(
            "w_milli"
        ),
        F.expr("CAST((1000 * sc) DIV nh AS BIGINT)").alias(
            "l_sampled_milli"
        ),
        F.expr(
            f"CAST((1000 * sum_dur) DIV {total_h} AS BIGINT)"
        ).alias("l_from_law_milli"),
    )


def _sql_littles_law() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS se
  FROM events
),
s AS (
  SELECT user_id, min(se) AS t0 FROM ev WHERE event_type = 'signup'
  GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.se) AS tp
  FROM ev e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.se > s.t0
  GROUP BY 1
),
spans AS MATERIALIZED (
  SELECT s.user_id, s.t0 // 3600 AS h0, p.tp // 3600 AS h1
  FROM s JOIN p USING (user_id)
  WHERE p.tp // 3600 > s.t0 // 3600
),
b AS (SELECT min(h0) AS mn, max(h1) AS mx FROM spans),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(h1 - h0) AS BIGINT) AS sum_dur
  FROM spans
),
active AS (
  SELECT CAST(u.h AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS c
  FROM spans, unnest(range(h0, h1)) AS u(h)
  GROUP BY 1
),
lsamp AS (
  SELECT CAST(sum(coalesce(a.c, 0)) AS BIGINT) AS sc,
         CAST(count(*) AS BIGINT) AS nh
  FROM (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b))) AS h) g
  LEFT JOIN active a ON a.h = g.h
)
SELECT st.n_spans,
       CAST((SELECT mx - mn FROM b) AS BIGINT) AS total_hours,
       CAST((1000000 * st.n_spans) // (SELECT mx - mn FROM b) AS BIGINT)
         AS lam_micro,
       CAST((1000 * st.sum_dur) // st.n_spans AS BIGINT) AS w_milli,
       CAST((1000 * ls.sc) // ls.nh AS BIGINT) AS l_sampled_milli,
       CAST((1000 * st.sum_dur) // (SELECT mx - mn FROM b) AS BIGINT)
         AS l_from_law_milli
FROM stats st CROSS JOIN lsamp ls
"""


QUERIES["events_littles_law_eval"] = (
    events_littles_law_eval,
    _sql_littles_law(),
)


# --------------------------------------- Mann-Whitney U (rank-sum) test

# The nonparametric two-sample location test the A/B toolkit was missing
# (events_did_abtest / events_cuped_abtest / es_t_test compare MEANS and
# lean on CLT normality; the log-rank handles censoring; KS compares whole
# CDFs without a location alternative). Mann & Whitney (1947) / Wilcoxon
# (1945): rank all values, U_A = R_A - n_a(n_a+1)/2; under H0,
# E[U] = n_a n_b / 2 and Var(U) = n_a n_b (n+1)/12 with the tie
# correction - n_a n_b T / (12 n (n-1)), T = SUM_v (m_v^3 - m_v).
#
# Everything integer (operators/__init__.py determinism contract): ranks
# are DOUBLED midranks (a tie group of size m after cb predecessors has
# doubled midrank 2 cb + m + 1 — an odd integer, so no .5 ever exists),
# u2 = 2 U_A, d = u2 - n_a n_b = 2(U - E[U]), and z^2 in milli arrives
# through a FIXED chained floored-division ladder identical in both
# engines (the events_logrank_test overflow-ladder discipline):
#   z^2 = 3 d^2 n (n-1) / (n_a n_b (n^3 - n - T))
#   z2_milli = (3000 * ((d*d) DIV (n_a n_b)) * (n-1))
#              DIV ((n^3 - n - T) DIV n)
# Overflow bound: |d| <= n_a n_b, so d*d needs n_a n_b <= 3e9 — events
# rows n <= ~1.1e5 (sf0.1 = 1e5 gated; larger scales would re-ladder).
#
# Planted-controls discipline (events_logrank_test): the md5 event split
# is evaluated twice — 'null_split' on the raw cents (a single chi^2(1)
# draw: do NOT pin its absolute value; pin the planted/null RATIO) and
# 'planted_shift' with +MW_SHIFT_CENTS on group 1 (0.4 sigma of the
# value distribution — z^2 lands far beyond the 3.841 critical value at
# every gated scale).
#
# Scale shape: one events scan, one (comparison, value)-grained groupBy,
# one window partitioned by comparison over the DISTINCT-cents rows
# (bounded by the cents cardinality, not the row count), one 2-row agg.

MW_SHIFT_CENTS = 2000
MW_SIG_MILLI = 3841  # chi^2(1) 0.95 critical value, milli

_MW_Z2 = (
    "(3000 * (((u2 - n_a * n_b) * (u2 - n_a * n_b)) {div} (n_a * n_b))"
    " * (n - 1)) {div} ((n * n * n - n - tie_t) {div} n)"
)


def events_mannwhitney_eval(spark, sf_dir):
    """(comparison, n_a, n_b, u2, tie_t, z2_milli, significant) — exact
    doubled-rank Mann-Whitney U for the null md5 split and the planted
    +MW_SHIFT_CENTS shift, tie-corrected z^2 in milli."""
    from harvester_spark.operators.graph import _hash56

    ev = load(spark, sf_dir, "events").select(
        cents("value").alias("c"),
        (
            _hash56(F.concat(F.lit("mw|"), F.col("event_id").cast("string")))
            % 2
        ).cast("long").alias("grp"),
    )
    both_c = ev.select(
        F.lit("null_split").alias("comparison"), F.col("c").alias("v"), "grp"
    ).unionByName(
        ev.select(
            F.lit("planted_shift").alias("comparison"),
            (F.col("c") + F.col("grp") * MW_SHIFT_CENTS).alias("v"),
            "grp",
        )
    )
    per = both_c.groupBy("comparison", "v").agg(
        F.sum((F.col("grp") == 0).cast("long")).cast("long").alias("a"),
        F.count("*").cast("long").alias("m"),
    )
    w = W.partitionBy("comparison").orderBy("v").rowsBetween(
        W.unboundedPreceding, -1
    )
    ranked = per.select(
        "comparison",
        "a",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long").alias("cb"),
    )
    agg = ranked.groupBy("comparison").agg(
        F.sum(F.col("a") * (2 * F.col("cb") + F.col("m") + 1))
        .cast("long")
        .alias("r2a"),
        F.sum("a").cast("long").alias("n_a"),
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("m") * F.col("m") * F.col("m") - F.col("m"))
        .cast("long")
        .alias("tie_t"),
    )
    z2 = _MW_Z2.format(div="DIV")
    return (
        agg.select(
            "comparison",
            "n_a",
            (F.col("n") - F.col("n_a")).cast("long").alias("n_b"),
            F.col("n"),
            "tie_t",
            (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1))
            .cast("long")
            .alias("u2"),
        )
        .select(
            "comparison",
            "n_a",
            "n_b",
            "u2",
            "tie_t",
            F.expr(f"CAST({z2} AS BIGINT)").alias("z2_milli"),
            F.expr(f"{z2} >= {MW_SIG_MILLI}").alias("significant"),
        )
    )


def _sql_mannwhitney() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'mw|' || CAST(event_id AS VARCHAR)")
    z2 = _MW_Z2.format(div="//")
    return f"""
WITH ev AS (
  SELECT {sql_cents('value')} AS c, {h} % 2 AS grp FROM events
),
both_c AS (
  SELECT 'null_split' AS comparison, c AS v, grp FROM ev
  UNION ALL
  SELECT 'planted_shift', c + grp * {MW_SHIFT_CENTS}, grp FROM ev
),
per AS (
  SELECT comparison, v,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(count(*) AS BIGINT) AS m
  FROM both_c GROUP BY 1, 2
),
ranked AS (
  SELECT comparison, a, m,
         CAST(coalesce(sum(m) OVER (PARTITION BY comparison ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cb
  FROM per
),
agg AS (
  SELECT comparison,
         CAST(sum(a * (2 * cb + m + 1)) AS BIGINT) AS r2a,
         CAST(sum(a) AS BIGINT) AS n_a,
         CAST(sum(m) AS BIGINT) AS n,
         CAST(sum(m * m * m - m) AS BIGINT) AS tie_t
  FROM ranked GROUP BY 1
),
u AS (
  SELECT comparison, n_a, CAST(n - n_a AS BIGINT) AS n_b, n, tie_t,
         CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2
  FROM agg
)
SELECT comparison, n_a, n_b, u2, tie_t,
       CAST({z2} AS BIGINT) AS z2_milli,
       {z2} >= {MW_SIG_MILLI} AS significant
FROM u
"""


QUERIES["events_mannwhitney_eval"] = (
    events_mannwhitney_eval,
    _sql_mannwhitney(),
)


# --------------------------------------- Theil-Sen robust trend

# Theil (1950) / Sen (1968): the median of all pairwise slopes
# (y_j - y_i)/(h_j - h_i) — the robust trend estimator with a 29.3%
# breakdown point, vs 0% for least squares (one bad hour already moves
# OLS). The planted-contrast synthesis makes that breakdown DIFFERENCE
# the tested contract (the events_robust_mean_eval discipline): the
# densified hourly count series (events_acf grid, T = 720 hours at every
# gated scale) gets a planted +TS_TREND/hour linear trend ('clean'), and
# the 'spiked' twin additionally gets +TS_SPIKE outliers on the md5-drawn
# 1-in-TS_SPIKE_MOD hours. Both estimators run on both series; the
# pytest pins that spikes move OLS by an order of magnitude more than
# they move Theil-Sen.
#
# Determinism: pair slopes are _DIVROUND sign-split round-half micro
# integers (never a bare negative DIV — Spark truncates toward zero,
# DuckDB floors); the median is the exact k = (P+1) DIV 2 order
# statistic selected as a VALUE via per-series cumulative counts over
# the slope-value histogram (no row tie-break needed — the k-th smallest
# value is tie-free by construction); OLS is the ft_zipf_slope integer
# least-squares closed form.
#
# Scale shape: T is span-bounded (720), so the pair self-join is
# ~259k rows per series — constant in corpus size; the only
# corpus-sized work is the one events scan feeding the hourly groupBy.
# Overflow: num*1e6 for OLS <= T*Σhy*1e6 ~ 1e18 at gated scales.

TS_TREND = 3  # planted per-hour trend (both series)
TS_SPIKE = 500  # outlier magnitude (spiked series only)
TS_SPIKE_MOD = 10  # 1-in-10 md5 hours spike


def events_theilsen_trend(spark, sf_dir):
    """(series, estimator, n, slope_micro): Theil-Sen median pairwise
    slope vs integer OLS on the planted-trend hourly series, clean and
    outlier-spiked."""
    from harvester_spark.operators.graph import _hash56

    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("c"))
    grid = (
        spark.range(0, b.mx - b.mn + 1)
        .select(F.col("id").cast("long").alias("h"))
        .withColumn("hour", F.col("h") + F.lit(int(b.mn)))
        .join(counts, "hour", "left")
        .select("h", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    spike = (
        (
            _hash56(F.concat(F.lit("ts|"), F.col("h").cast("string")))
            % TS_SPIKE_MOD
            == 0
        ).cast("long")
        * TS_SPIKE
    )
    ser = (
        grid.select(
            F.lit("clean").alias("series"),
            "h",
            (F.col("c") + TS_TREND * F.col("h")).cast("long").alias("y"),
        )
        .unionByName(
            grid.select(
                F.lit("spiked").alias("series"),
                "h",
                (F.col("c") + TS_TREND * F.col("h") + spike)
                .cast("long")
                .alias("y"),
            )
        )
    )
    a1 = ser.select("series", F.col("h").alias("h1"), F.col("y").alias("y1"))
    a2 = ser.select("series", F.col("h").alias("h2"), F.col("y").alias("y2"))
    slope = _DIVROUND.format(num="(y2 - y1)", den="(h2 - h1)", div="DIV")
    sl = (
        a1.join(a2, "series")
        .filter(F.col("h1") < F.col("h2"))
        .select("series", F.expr(f"CAST({slope} AS BIGINT)").alias("s"))
    )
    cnts = sl.groupBy("series", "s").agg(F.count("*").cast("long").alias("m"))
    tot = cnts.groupBy("series").agg(F.sum("m").cast("long").alias("p"))
    wcum = W.partitionBy("series").orderBy("s").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = cnts.select(
        "series", "s", F.sum("m").over(wcum).cast("long").alias("cm")
    )
    med = (
        cum.join(tot, "series")
        .filter(F.expr("cm >= (p + 1) DIV 2"))
        .groupBy("series")
        .agg(F.min("s").alias("slope_micro"), F.first("p").alias("p"))
        .select(
            "series",
            F.lit("theil_sen").alias("estimator"),
            F.col("p").alias("n"),
            F.col("slope_micro").cast("long"),
        )
    )
    sums = ser.groupBy("series").agg(
        F.count("*").cast("long").alias("nh"),
        F.sum("h").cast("long").alias("sh"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("h") * F.col("y")).cast("long").alias("shy"),
        F.sum(F.col("h") * F.col("h")).cast("long").alias("sh2"),
    )
    ols_expr = _DIVROUND.format(
        num="(nh * shy - sh * sy)", den="(nh * sh2 - sh * sh)", div="DIV"
    )
    ols = sums.select(
        "series",
        F.lit("ols").alias("estimator"),
        F.col("nh").alias("n"),
        F.expr(f"CAST({ols_expr} AS BIGINT)").alias("slope_micro"),
    )
    return med.unionByName(ols)


def _sql_theilsen() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'ts|' || CAST(h AS VARCHAR)")
    slope = _DIVROUND.format(num="(y2 - y1)", den="(h2 - h1)", div="//")
    ols = _DIVROUND.format(
        num="(nh * shy - sh * sy)", den="(nh * sh2 - sh * sh)", div="//"
    )
    return f"""
WITH tb AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) // 3600 AS mn,
         CAST(floor(epoch(max(ts))) AS BIGINT) // 3600 AS mx
  FROM events
),
tcnt AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
tgrid AS (
  SELECT g.hh - tb.mn AS h, CAST(coalesce(tcnt.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(range((SELECT mn FROM tb), (SELECT mx + 1 FROM tb)))
          AS hh) g
  CROSS JOIN tb
  LEFT JOIN tcnt ON tcnt.hour = g.hh
),
tser AS (
  SELECT 'clean' AS series, h, CAST(c + {TS_TREND} * h AS BIGINT) AS y
  FROM tgrid
  UNION ALL
  SELECT 'spiked', h,
         CAST(c + {TS_TREND} * h
              + CASE WHEN {h} % {TS_SPIKE_MOD} = 0
                     THEN {TS_SPIKE} ELSE 0 END AS BIGINT)
  FROM tgrid
),
tsl AS (
  SELECT a.series, CAST({slope} AS BIGINT) AS s
  FROM (SELECT series, h AS h1, y AS y1 FROM tser) a
  JOIN (SELECT series, h AS h2, y AS y2 FROM tser) b2
    ON a.series = b2.series AND a.h1 < b2.h2
),
tcnts AS (
  SELECT series, s, CAST(count(*) AS BIGINT) AS m FROM tsl GROUP BY 1, 2
),
ttot AS (
  SELECT series, CAST(sum(m) AS BIGINT) AS p FROM tcnts GROUP BY 1
),
tcum AS (
  SELECT series, s,
         CAST(sum(m) OVER (PARTITION BY series ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cm
  FROM tcnts
),
tmed AS (
  SELECT c.series, 'theil_sen' AS estimator,
         CAST(min(t.p) AS BIGINT) AS n,
         CAST(min(c.s) AS BIGINT) AS slope_micro
  FROM tcum c JOIN ttot t USING (series)
  WHERE c.cm >= (t.p + 1) // 2
  GROUP BY 1
),
tsums AS (
  SELECT series, CAST(count(*) AS BIGINT) AS nh,
         CAST(sum(h) AS BIGINT) AS sh, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(h * y) AS BIGINT) AS shy,
         CAST(sum(h * h) AS BIGINT) AS sh2
  FROM tser GROUP BY 1
),
tols AS (
  SELECT series, 'ols' AS estimator, nh AS n,
         CAST({ols} AS BIGINT) AS slope_micro
  FROM tsums
)
SELECT series, estimator, n, slope_micro FROM tmed
UNION ALL
SELECT series, estimator, n, slope_micro FROM tols
"""


QUERIES["events_theilsen_trend"] = (events_theilsen_trend, _sql_theilsen())


# ------------------------------------------------ Qini uplift targeting

# Radcliffe (2007): the targeting-policy eval the causal family was
# missing — DiD/CUPED/IPW estimate an AVERAGE effect; uplift modeling
# asks WHO to treat. Units are ranked by a targeting score; the Qini
# curve plots cumulative INCREMENTAL conversions
#   g(d) = Yt(d) - Yc(d) * Nt(d) / Nc(d)
# against depth d, and the Qini coefficient is the area between the
# curve and the random-targeting diagonal g(1) * d/10. (The per-capita
# uplift formulation has a FLAT random baseline, not a diagonal — the
# first cut used it with the diagonal and the "random" ranker scored
# 40% of oracle; measured, fixed.)
#
# Units are DOC-derived (doc_id), not user-derived: the events table
# has only 15 users at sf0.001 — deciles of 1-2 units divide by zero
# and drown the plant (measured). Planted heterogeneous effect per
# unit: covariate x ~ md5 U(0,100); responders (x >= QN_X_CUT) convert
# at base+tau under treatment, everyone else at base; assignment is a
# fair md5 coin. Rankers: 'oracle' (ranks by x) vs 'random'
# (independent hash) on the SAME population.
#
# Integer: cumulative counts exact; g in milli with ONE floored
# division (zero-control guard shared by both engines); area =
# SUM_d (g_d - (g_full * d) DIV 10). Deciles via ntile with the
# unit-id tie-break (events_rfm_segments discipline).
#
# Scale shape: one documents scan; everything downstream unit-grained
# with a 10-row decile aggregation.

QN_BASE_PM = 100  # base conversion, per-mille
QN_TAU_PM = 500  # planted responder uplift, per-mille
QN_X_CUT = 60  # responders: x >= 60 (40% of units)


def events_qini_uplift_eval(spark, sf_dir):
    """(ranker, decile, nt_cum, yt_cum, nc_cum, yc_cum, g_milli,
    qini_area_milli): cumulative Qini table per decile for oracle-
    covariate vs random targeting over the planted-uplift population."""
    from harvester_spark.operators.graph import _hash56

    def h(pfx):
        return _hash56(F.concat(F.lit(pfx), F.col("unit").cast("string")))

    units = (
        load(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("unit"))
        .select(
            "unit",
            (h("t|") % 2).cast("long").alias("t"),
            (h("x|") % 100).cast("long").alias("x"),
            (h("s|") % 1000000).cast("long").alias("rnd"),
            (h("y|") % 1000).cast("long").alias("draw"),
        )
        .withColumn(
            "y",
            F.expr(
                f"CAST(draw < {QN_BASE_PM} + CASE WHEN x >= {QN_X_CUT}"
                f" AND t = 1 THEN {QN_TAU_PM} ELSE 0 END AS BIGINT)"
            ),
        )
    )
    both_r = units.select(
        F.lit("oracle").alias("ranker"), F.col("x").alias("score"), "unit", "t", "y"
    ).unionByName(
        units.select(
            F.lit("random").alias("ranker"), F.col("rnd").alias("score"), "unit", "t", "y"
        )
    )
    wrk = W.partitionBy("ranker").orderBy(
        F.col("score").desc(), F.col("unit").asc()
    )
    dec = both_r.withColumn("decile", F.ntile(10).over(wrk).cast("long"))
    per = dec.groupBy("ranker", "decile").agg(
        F.sum("t").cast("long").alias("nt"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("yt"),
        F.sum(1 - F.col("t")).cast("long").alias("nc"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("yc"),
    )
    wcum = W.partitionBy("ranker").orderBy("decile").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    g_expr = (
        "CASE WHEN nc_cum = 0 THEN 1000 * yt_cum"
        " ELSE 1000 * yt_cum - (1000 * yc_cum * nt_cum) DIV nc_cum END"
    )
    cum = per.select(
        "ranker",
        "decile",
        F.sum("nt").over(wcum).cast("long").alias("nt_cum"),
        F.sum("yt").over(wcum).cast("long").alias("yt_cum"),
        F.sum("nc").over(wcum).cast("long").alias("nc_cum"),
        F.sum("yc").over(wcum).cast("long").alias("yc_cum"),
    ).withColumn("g_milli", F.expr(f"CAST({g_expr} AS BIGINT)"))
    final = cum.filter(F.col("decile") == 10).select(
        "ranker", F.col("g_milli").alias("g_full")
    )
    area = (
        cum.join(final, "ranker")
        .groupBy("ranker")
        .agg(
            F.sum(F.expr("g_milli - (g_full * decile) DIV 10"))
            .cast("long")
            .alias("qini_area_milli")
        )
    )
    return cum.join(area, "ranker").select(
        "ranker",
        "decile",
        "nt_cum",
        "yt_cum",
        "nc_cum",
        "yc_cum",
        "g_milli",
        "qini_area_milli",
    )


def _sql_qini() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    def h(pfx):
        return _SQL_HASH56.format(col=f"'{pfx}' || CAST(unit AS VARCHAR)")

    return f"""
WITH qu AS (
  SELECT unit,
         {h('t|')} % 2 AS t,
         {h('x|')} % 100 AS x,
         {h('s|')} % 1000000 AS rnd,
         {h('y|')} % 1000 AS draw
  FROM (SELECT doc_id AS unit FROM documents)
),
qy AS (
  SELECT unit, t, x, rnd,
         CAST(draw < {QN_BASE_PM} + CASE WHEN x >= {QN_X_CUT} AND t = 1
              THEN {QN_TAU_PM} ELSE 0 END AS BIGINT) AS y
  FROM qu
),
qb AS (
  SELECT 'oracle' AS ranker, x AS score, unit, t, y FROM qy
  UNION ALL
  SELECT 'random', rnd, unit, t, y FROM qy
),
qd AS (
  SELECT ranker, t, y,
         CAST(ntile(10) OVER (PARTITION BY ranker
              ORDER BY score DESC, unit ASC) AS BIGINT) AS decile
  FROM qb
),
qp AS (
  SELECT ranker, decile,
         CAST(sum(t) AS BIGINT) AS nt,
         CAST(sum(t * y) AS BIGINT) AS yt,
         CAST(sum(1 - t) AS BIGINT) AS nc,
         CAST(sum((1 - t) * y) AS BIGINT) AS yc
  FROM qd GROUP BY 1, 2
),
qc AS (
  SELECT ranker, decile,
         CAST(sum(nt) OVER w AS BIGINT) AS nt_cum,
         CAST(sum(yt) OVER w AS BIGINT) AS yt_cum,
         CAST(sum(nc) OVER w AS BIGINT) AS nc_cum,
         CAST(sum(yc) OVER w AS BIGINT) AS yc_cum
  FROM qp
  WINDOW w AS (PARTITION BY ranker ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
qm AS (
  SELECT *, CAST(CASE WHEN nc_cum = 0 THEN 1000 * yt_cum
                 ELSE 1000 * yt_cum - (1000 * yc_cum * nt_cum) // nc_cum
                 END AS BIGINT) AS g_milli
  FROM qc
),
qf AS (SELECT ranker, g_milli AS g_full FROM qm WHERE decile = 10),
qa AS (
  SELECT m.ranker,
         CAST(sum(m.g_milli - (f.g_full * m.decile) // 10) AS BIGINT)
           AS qini_area_milli
  FROM qm m JOIN qf f USING (ranker) GROUP BY 1
)
SELECT m.ranker, m.decile, m.nt_cum, m.yt_cum, m.nc_cum, m.yc_cum,
       m.g_milli, a.qini_area_milli
FROM qm m JOIN qa a USING (ranker)
"""


QUERIES["events_qini_uplift_eval"] = (events_qini_uplift_eval, _sql_qini())


# ------------------------------------ LRU vs LFU on a skewed key trace

# The policy COMPARISON the caching family was missing:
# cache_lru_stack_distance computes exact LRU hit curves (Mattson),
# cache_ski_rental_eval prices eviction — this operator pits RECENCY
# (LRU) against FREQUENCY (offline static LFU: pin the top-C most
# frequent keys, the optimal static cache under IID access) on the SAME
# skewed trace, at every cache size. On an IID skewed reference stream
# frequency beats recency: rare keys churn the LRU stack but never
# enter the frequency cache — the measured gap is the operator's
# deliverable (and the reason TinyLFU-style admission exists).
#
# Trace synthesis: key = trailing-zero count of the md5 draw
# (bit_count((h & -h) - 1) — branch-free in both engines), a geometric
# popularity law: key k carries ~2^-(k+1) of the traffic, ~18 distinct
# keys over the events stream. LRU hits come from the Mattson
# stack-distance pass (cache_lru_stack_distance's range-join, same
# sd + 1 <= C convention); LFU hits are SUM over the top-C keys by
# (frequency desc, key asc) of (f - 1) — first touch is a cold miss
# under both policies.
#
# The pytest replays the trace through REAL LRU and static-LFU
# simulators and pins both hit counts at every size, plus the
# frequency >= recency dominance on every row.
#
# Scale shape: one events scan; the range join is bounded by
# n_accesses * n_keys (the key space is ~log2(2^56) small); the LFU
# side is a keys-sized frequency groupBy with a cumulative-count
# ranking, no per-access state.

LL_SIZES = (2, 4, 8, 16)


def cache_lru_vs_lfu_eval(spark, sf_dir):
    """(cache_size, n_accesses, n_keys, n_cold, lru_hits, lfu_hits,
    lru_rate_milli, lfu_rate_milli, lfu_wins): exact LRU vs offline
    static-LFU hit counts on the geometric-key trace."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.expr(
            f"CAST(bit_count(({_H56_EID} & -{_H56_EID}) - 1) AS BIGINT)"
        ).alias("key"),
    )
    wpos = W.orderBy("event_id")
    wkey = W.partitionBy("key").orderBy("pos")
    acc = (
        ev.withColumn("pos", F.row_number().over(wpos).cast("long"))
        .withColumn("prev", F.lag("pos").over(wkey))
        .withColumn("nxt", F.lead("pos").over(wkey))
        .cache()
    )
    reuse = acc.filter(F.col("prev").isNotNull()).select(
        F.col("pos").alias("apos"), F.col("prev").alias("aprev")
    )
    mids = acc.select(F.col("pos").alias("mpos"), F.col("nxt").alias("mnxt"))
    sd = (
        reuse.join(
            mids,
            (F.col("mpos") > F.col("aprev"))
            & (F.col("mpos") < F.col("apos"))
            & (F.col("mnxt").isNull() | (F.col("mnxt") >= F.col("apos"))),
            "left",
        )
        .groupBy("apos")
        .agg(F.count("mpos").cast("long").alias("sd"))
    )
    sizes = spark.createDataFrame([(c,) for c in LL_SIZES], "cache_size long")
    lru = (
        sd.crossJoin(F.broadcast(sizes))
        .groupBy("cache_size")
        .agg(
            F.sum((F.col("sd") + 1 <= F.col("cache_size")).cast("long"))
            .cast("long")
            .alias("lru_hits")
        )
    )
    freq = acc.groupBy("key").agg(F.count("*").cast("long").alias("f"))
    wfr = W.orderBy(F.col("f").desc(), F.col("key").asc())
    lfu = (
        freq.withColumn("rk", F.row_number().over(wfr).cast("long"))
        .crossJoin(F.broadcast(sizes))
        .filter(F.col("rk") <= F.col("cache_size"))
        .groupBy("cache_size")
        .agg(F.sum(F.col("f") - 1).cast("long").alias("lfu_hits"))
    )
    tot = F.broadcast(
        acc.agg(
            F.count("*").cast("long").alias("n_accesses"),
            F.countDistinct("key").cast("long").alias("n_keys"),
            F.sum(F.col("prev").isNull().cast("long"))
            .cast("long")
            .alias("n_cold"),
        )
    )
    return (
        sizes.join(lru, "cache_size", "left")
        .join(lfu, "cache_size", "left")
        .crossJoin(tot)
        .select(
            "cache_size",
            "n_accesses",
            "n_keys",
            "n_cold",
            F.coalesce("lru_hits", F.lit(0)).cast("long").alias("lru_hits"),
            F.coalesce("lfu_hits", F.lit(0)).cast("long").alias("lfu_hits"),
            F.expr("CAST((1000 * coalesce(lru_hits, 0)) DIV n_accesses AS BIGINT)").alias(
                "lru_rate_milli"
            ),
            F.expr("CAST((1000 * coalesce(lfu_hits, 0)) DIV n_accesses AS BIGINT)").alias(
                "lfu_rate_milli"
            ),
            F.expr("coalesce(lfu_hits, 0) >= coalesce(lru_hits, 0)").alias(
                "lfu_wins"
            ),
        )
    )


_H56_EID = (
    "CAST(conv(substring(md5(concat('ll|', CAST(event_id AS STRING))), 1, 14),"
    " 16, 10) AS BIGINT)"
)


def _sql_lru_lfu() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'ll|' || CAST(event_id AS VARCHAR)")
    svals = ", ".join(f"({c})" for c in LL_SIZES)
    return f"""
WITH lle AS (
  SELECT event_id,
         CAST(bit_count((h & -h) - 1) AS BIGINT) AS key
  FROM (SELECT event_id, {h} AS h FROM events)
),
llacc AS MATERIALIZED (
  SELECT event_id, key,
         CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS pos
  FROM lle
),
llp AS MATERIALIZED (
  SELECT pos, key,
         lag(pos) OVER (PARTITION BY key ORDER BY pos) AS prev,
         lead(pos) OVER (PARTITION BY key ORDER BY pos) AS nxt
  FROM llacc
),
llsd AS (
  SELECT a.pos AS apos, CAST(count(m.pos) AS BIGINT) AS sd
  FROM (SELECT pos, prev FROM llp WHERE prev IS NOT NULL) a
  LEFT JOIN llp m
    ON m.pos > a.prev AND m.pos < a.pos
   AND (m.nxt IS NULL OR m.nxt >= a.pos)
  GROUP BY 1
),
llsz AS (SELECT CAST(cache_size AS BIGINT) AS cache_size
         FROM (VALUES {svals}) v(cache_size)),
lllru AS (
  SELECT s.cache_size,
         CAST(sum(CASE WHEN d.sd + 1 <= s.cache_size THEN 1 ELSE 0 END)
              AS BIGINT) AS lru_hits
  FROM llsd d CROSS JOIN llsz s GROUP BY 1
),
llfreq AS (
  SELECT key, CAST(count(*) AS BIGINT) AS f,
         row_number() OVER (ORDER BY count(*) DESC, key ASC) AS rk
  FROM llacc GROUP BY key
),
lllfu AS (
  SELECT s.cache_size, CAST(sum(q.f - 1) AS BIGINT) AS lfu_hits
  FROM llfreq q CROSS JOIN llsz s
  WHERE q.rk <= s.cache_size GROUP BY 1
),
lltot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_accesses,
         CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cold
  FROM llp
)
SELECT s.cache_size, t.n_accesses, t.n_keys, t.n_cold,
       CAST(coalesce(r.lru_hits, 0) AS BIGINT) AS lru_hits,
       CAST(coalesce(f.lfu_hits, 0) AS BIGINT) AS lfu_hits,
       CAST((1000 * coalesce(r.lru_hits, 0)) // t.n_accesses AS BIGINT)
         AS lru_rate_milli,
       CAST((1000 * coalesce(f.lfu_hits, 0)) // t.n_accesses AS BIGINT)
         AS lfu_rate_milli,
       coalesce(f.lfu_hits, 0) >= coalesce(r.lru_hits, 0) AS lfu_wins
FROM llsz s
LEFT JOIN lllru r USING (cache_size)
LEFT JOIN lllfu f USING (cache_size)
CROSS JOIN lltot t
"""


QUERIES["cache_lru_vs_lfu_eval"] = (cache_lru_vs_lfu_eval, _sql_lru_lfu())


# --------------------------------------- instrumental variable (Wald)

# The causal-toolkit member still missing after DiD / RDD / CUPED /
# CMH / IPW / Shapley: when treatment is CONFOUNDED (units choose it,
# and the chooser also drives the outcome), a randomized INSTRUMENT
# that moves treatment but touches the outcome only through it
# identifies the effect — Wald (1940):
#   beta_IV = (E[y|z=1] - E[y|z=0]) / (E[x|z=1] - E[x|z=0]).
# Planted structural model per md5 unit (doc-derived, the Qini lesson):
#   confounder u ~ U(0,100); instrument z ~ Bernoulli(1/2);
#   x = 1{draw_x < 20 + 40 z + u/3}   (z is RELEVANT, u CONFOUNDS)
#   y = 50 x + 2 u + noise            (true effect 50, u hits y too)
# The naive treated-minus-control difference absorbs u's bias; Wald
# divides it out. Integer exactness: the group-mean differences share
# the n1*n0 denominator, so it CANCELS in the ratio —
#   wald = (Sy1*n0 - Sy0*n1) / (Sx1*n0 - Sx0*n1)
# is a ratio of exact int64s, one sign-split round-half milli division
# (the _DIVROUND idiom); the naive contrast keeps its own ladder.

IV_BETA = 50  # planted treatment effect
IV_GAMMA = 2  # confounder slope into the outcome


def events_iv_wald_eval(spark, sf_dir):
    """(n, true_beta_milli, naive_milli, wald_milli, naive_bias_milli,
    wald_bias_milli, wald_wins): confounded-treatment recovery, naive
    difference vs the Wald instrumental estimator."""
    from harvester_spark.operators.dedup import _hash56

    def h(pfx):
        return _hash56(F.concat(F.lit(pfx), F.col("unit").cast("string")))

    units = (
        load(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("unit"))
        .select(
            "unit",
            (h("u|") % 100).cast("long").alias("u"),
            (h("z|") % 2).cast("long").alias("z"),
            (h("xn|") % 100).cast("long").alias("dx"),
            (h("yn|") % 21).cast("long").alias("dy"),
        )
        .withColumn(
            "x", F.expr("CAST(dx < 20 + 40 * z + u DIV 3 AS BIGINT)")
        )
        .withColumn(
            "y",
            F.expr(
                f"CAST({IV_BETA} * x + {IV_GAMMA} * u + dy - 10 AS BIGINT)"
            ),
        )
    )
    agg = units.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z").cast("long").alias("n1"),
        F.sum(F.expr("CAST(z = 0 AS BIGINT)")).cast("long").alias("n0"),
        F.sum(F.expr("CASE WHEN z = 1 THEN y ELSE 0 END")).cast("long").alias("sy1"),
        F.sum(F.expr("CASE WHEN z = 0 THEN y ELSE 0 END")).cast("long").alias("sy0"),
        F.sum(F.expr("CASE WHEN z = 1 THEN x ELSE 0 END")).cast("long").alias("sx1"),
        F.sum(F.expr("CASE WHEN z = 0 THEN x ELSE 0 END")).cast("long").alias("sx0"),
        F.sum("x").cast("long").alias("m1"),
        F.sum(F.expr("CASE WHEN x = 1 THEN y ELSE 0 END")).cast("long").alias("ty1"),
        F.sum(F.expr("CASE WHEN x = 0 THEN y ELSE 0 END")).cast("long").alias("ty0"),
    )
    wald = _DIVROUND.format(
        num="(sy1 * n0 - sy0 * n1)", den="(sx1 * n0 - sx0 * n1)", div="DIV"
    )
    naive = _DIVROUND.format(
        num="(ty1 * (n - m1) - ty0 * m1)", den="(m1 * (n - m1))", div="DIV"
    )
    return agg.select(
        "n",
        F.lit(IV_BETA * 1000).cast("long").alias("true_beta_milli"),
        F.expr(f"CAST(({naive}) DIV 1000 AS BIGINT)").alias("naive_milli"),
        F.expr(f"CAST(({wald}) DIV 1000 AS BIGINT)").alias("wald_milli"),
        F.expr(
            f"CAST(abs(({naive}) DIV 1000 - {IV_BETA * 1000}) AS BIGINT)"
        ).alias("naive_bias_milli"),
        F.expr(
            f"CAST(abs(({wald}) DIV 1000 - {IV_BETA * 1000}) AS BIGINT)"
        ).alias("wald_bias_milli"),
        F.expr(
            f"abs(({wald}) DIV 1000 - {IV_BETA * 1000})"
            f" < abs(({naive}) DIV 1000 - {IV_BETA * 1000})"
        ).alias("wald_wins"),
    )


def _sql_iv_wald() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    def h(pfx):
        return _SQL_HASH56.format(col=f"'{pfx}' || CAST(unit AS VARCHAR)")

    wald = _DIVROUND.format(
        num="(sy1 * n0 - sy0 * n1)", den="(sx1 * n0 - sx0 * n1)", div="//"
    )
    naive = _DIVROUND.format(
        num="(ty1 * (n - m1) - ty0 * m1)", den="(m1 * (n - m1))", div="//"
    )
    return f"""
WITH ivu AS (
  SELECT unit, {h('u|')} % 100 AS u, {h('z|')} % 2 AS z,
         {h('xn|')} % 100 AS dx, {h('yn|')} % 21 AS dy
  FROM (SELECT doc_id AS unit FROM documents)
),
ivx AS (
  SELECT unit, u, z,
         CAST(dx < 20 + 40 * z + u // 3 AS BIGINT) AS x, dy
  FROM ivu
),
ivy AS (
  SELECT unit, u, z, x,
         CAST({IV_BETA} * x + {IV_GAMMA} * u + dy - 10 AS BIGINT) AS y
  FROM ivx
),
iva AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(z) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
         CAST(sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
         CAST(sum(CASE WHEN z = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
         CAST(sum(CASE WHEN z = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
         CAST(sum(x) AS BIGINT) AS m1,
         CAST(sum(CASE WHEN x = 1 THEN y ELSE 0 END) AS BIGINT) AS ty1,
         CAST(sum(CASE WHEN x = 0 THEN y ELSE 0 END) AS BIGINT) AS ty0
  FROM ivy
)
SELECT n, CAST({IV_BETA * 1000} AS BIGINT) AS true_beta_milli,
       CAST(({naive}) // 1000 AS BIGINT) AS naive_milli,
       CAST(({wald}) // 1000 AS BIGINT) AS wald_milli,
       CAST(abs(({naive}) // 1000 - {IV_BETA * 1000}) AS BIGINT)
         AS naive_bias_milli,
       CAST(abs(({wald}) // 1000 - {IV_BETA * 1000}) AS BIGINT)
         AS wald_bias_milli,
       abs(({wald}) // 1000 - {IV_BETA * 1000})
         < abs(({naive}) // 1000 - {IV_BETA * 1000}) AS wald_wins
FROM iva
"""


QUERIES["events_iv_wald_eval"] = (events_iv_wald_eval, _sql_iv_wald())


# ---------------------------------------------- Wald-Wolfowitz runs test

# The runs test for randomness (Wald & Wolfowitz 1940) on the hourly
# event-count series — the sequence-order companion to
# events_mannwhitney_eval (which tests LEVEL differences and is blind
# to order): values are split above/below the exact median (median
# ties dropped, the standard treatment), and the number of RUNS of
# same-side values is compared against its null distribution
#   E[R] = 1 + 2*n1*n2/N,  Var[R] = 2*n1*n2*(2*n1*n2 - N) / (N^2*(N-1)).
# Three orderings of the SAME kept values make the operator its own
# control battery (the events_mannwhitney discipline): 'time' (the real
# diagnostic — is the hourly series serially random?), 'shuffled' (md5
# order — the null draw, never pinned absolutely), and 'sorted' (all
# below-median hours then all above: exactly 2 runs, the maximal
# trend plant — pinned to dominate the shuffled z^2 by >= 10x in
# tests/test_session16_ops.py, which also recomputes every row in pure
# Python).
#
# Integer contract: with a = N*(R-1) - 2*n1*n2,
#   z^2 = a^2 * (N-1) / (2*n1*n2*(2*n1*n2 - N))
# exactly; z2_milli = 1000*a^2*(N-1) DIV v — at the calendar-bounded
# series (N <= ~720 hours) the numerator tops out ~7e17, inside int64
# (the events_acf overflow-bound discipline); degenerate variance
# (n1*n2 = 0 or 2*n1*n2 = N) yields NULL.
#
# Scale shape: one hourly groupBy (map-side partial), a broadcast
# median order statistic, one 3-way unioned window ordered by
# (ordering, k1, k2) over a calendar-bounded frame.

RUNS_SIG_MILLI = 3841  # chi^2(1) 0.95 critical value, milli


def events_runs_test(spark, sf_dir):
    """(ordering, n_kept, n1, n2, runs, z2_milli, significant): exact
    Wald-Wolfowitz runs test of the densified hourly count series under
    the time / shuffled / sorted orderings."""
    from harvester_spark.operators.graph import _hash56

    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("x"))
    dens = (
        spark.range(b.mn, b.mx + 1)
        .select(F.col("id").alias("hour"))
        .join(counts, "hour", "left")
        .select("hour", F.coalesce("x", F.lit(0)).cast("long").alias("x"))
    )
    wmed = W.orderBy(F.col("x").asc(), F.col("hour").asc())
    med = F.broadcast(
        dens.withColumn("rn", F.row_number().over(wmed))
        .crossJoin(
            F.broadcast(dens.agg(F.count("*").cast("long").alias("nh")))
        )
        .filter(F.expr("rn = (nh + 1) DIV 2"))
        .select(F.col("x").alias("median"))
    )
    kept = (
        dens.crossJoin(med)
        .filter(F.col("x") != F.col("median"))
        .select(
            "hour",
            "x",
            (F.col("x") > F.col("median")).cast("long").alias("side"),
        )
    )
    seqs = (
        kept.select(
            F.lit("time").alias("ordering"),
            F.col("hour").alias("k1"),
            F.lit(0).cast("long").alias("k2"),
            "side",
        )
        .unionByName(
            kept.select(
                F.lit("shuffled").alias("ordering"),
                _hash56(F.concat(F.lit("ro|"), F.col("hour").cast("string")))
                .alias("k1"),
                F.col("hour").alias("k2"),
                "side",
            )
        )
        .unionByName(
            kept.select(
                F.lit("sorted").alias("ordering"),
                F.col("x").alias("k1"),
                F.col("hour").alias("k2"),
                "side",
            )
        )
    )
    wseq = W.partitionBy("ordering").orderBy("k1", "k2")
    runs = (
        seqs.withColumn("ps", F.lag("side").over(wseq))
        .groupBy("ordering")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("side").cast("long").alias("n1"),
            F.sum(
                F.expr("CASE WHEN ps IS NULL OR side <> ps THEN 1 ELSE 0 END")
            )
            .cast("long")
            .alias("runs"),
        )
        .withColumn("n2", (F.col("n_kept") - F.col("n1")).cast("long"))
    )
    z2 = (
        "CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - n_kept) <= 0 THEN NULL "
        "ELSE CAST(1000 * (n_kept * (runs - 1) - 2 * n1 * n2)"
        " * (n_kept * (runs - 1) - 2 * n1 * n2) * (n_kept - 1)"
        " {div} (2 * n1 * n2 * (2 * n1 * n2 - n_kept)) AS BIGINT) END"
    )
    sp = z2.format(div="DIV")
    return runs.select(
        "ordering",
        "n_kept",
        "n1",
        "n2",
        "runs",
        F.expr(sp).alias("z2_milli"),
        F.expr(f"coalesce({sp} >= {RUNS_SIG_MILLI}, false)").alias(
            "significant"
        ),
    ).orderBy("ordering")


def _sql_runs_test() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'ro|' || CAST(hour AS VARCHAR)")
    z2 = (
        "CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - n_kept) <= 0 THEN NULL "
        "ELSE CAST(1000 * (n_kept * (runs - 1) - 2 * n1 * n2)"
        " * (n_kept * (runs - 1) - 2 * n1 * n2) * (n_kept - 1)"
        " // (2 * n1 * n2 * (2 * n1 * n2 - n_kept)) AS BIGINT) END"
    )
    return f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour FROM events
),
bounds AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (SELECT hour, CAST(count(*) AS BIGINT) AS x FROM ev GROUP BY 1),
dens AS (
  SELECT g.hour, CAST(coalesce(c.x, 0) AS BIGINT) AS x
  FROM (SELECT unnest(range((SELECT mn FROM bounds),
                            (SELECT mx FROM bounds) + 1)) AS hour) g
  LEFT JOIN counts c USING (hour)
),
med AS (
  SELECT x AS median FROM (
    SELECT x, row_number() OVER (ORDER BY x ASC, hour ASC) AS rn,
           count(*) OVER () AS nh
    FROM dens
  ) WHERE rn = (nh + 1) // 2
),
kept AS (
  SELECT hour, x,
         CAST(CASE WHEN x > (SELECT median FROM med) THEN 1 ELSE 0 END
              AS BIGINT) AS side
  FROM dens WHERE x <> (SELECT median FROM med)
),
seqs AS (
  SELECT 'time' AS ordering, hour AS k1, CAST(0 AS BIGINT) AS k2, side
  FROM kept
  UNION ALL
  SELECT 'shuffled', {h}, hour, side FROM kept
  UNION ALL
  SELECT 'sorted', x, hour, side FROM kept
),
runs AS (
  SELECT ordering,
         CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(side) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN ps IS NULL OR side <> ps THEN 1 ELSE 0 END)
              AS BIGINT) AS runs
  FROM (
    SELECT ordering, side,
           lag(side) OVER (PARTITION BY ordering ORDER BY k1, k2) AS ps
    FROM seqs
  ) GROUP BY 1
),
full_ AS (
  SELECT ordering, n_kept, n1, CAST(n_kept - n1 AS BIGINT) AS n2, runs
  FROM runs
)
SELECT ordering, n_kept, n1, n2, runs,
       {z2} AS z2_milli,
       coalesce({z2} >= {RUNS_SIG_MILLI}, false) AS significant
FROM full_ ORDER BY ordering
"""


QUERIES["events_runs_test"] = (events_runs_test, _sql_runs_test())


# ---------------------------------------------- politeness queue delay

# Per-host politeness rate limiting as a Lindley queue (Lindley 1952;
# the token-bucket regulator every crawler runs in front of a host):
# requests arrive at a_1 <= a_2 <= ... and may START no earlier than
# g microseconds after the previous start, so
#   start_i = max(a_i, start_{i-1} + g),   delay_i = start_i - a_i.
# The recursion is SEQUENTIAL but has the exact prefix closed form
#   start_i = i*g + max_{j<=i} P_j,   P_j = a_j - j*g   (0-based j),
# i.e. delay_i = runmax(P)_i - P_i — one running-max window, no
# iteration (the events_cusum_changepoint prefix-extremum discipline;
# tests/test_session16_ops.py replays the REAL sequential regulator
# and pins every per-host aggregate).
#
# Two gap regimes make the operator its own control pair: 'light'
# (g = half the host's mean inter-arrival, utilization ~0.5 — delays
# stay incidental) and 'heavy' (g = 2x mean, utilization ~2 — the
# queue diverges linearly and total delay explodes), both DERIVED from
# the host's own span (derive_bloom_m discipline: regime constants are
# ratios, not absolutes, so the contrast survives any corpus scale).
#
# Integer contract: arrivals are exact event-time microseconds
# (unix_micros / epoch_us on the NTZ timestamps — parquet inputs, so
# no JSON microsecond truncation); P, the running max, and every delay
# are int64 (total delay <= n * span ~ 2.6e17 at sf0.1, inside
# int64).
#
# Scale shape: one (host-keyed) sort window per regime over the event
# scan — the same per-key ordered pass a real frontier scheduler
# shards by host; per-host scalars ride a broadcast join.

TB_HOSTS = 8
TB_LIGHT_NUM, TB_LIGHT_DEN = 1, 2  # g_light = mean_gap / 2
TB_HEAVY_NUM, TB_HEAVY_DEN = 2, 1  # g_heavy = 2 * mean_gap


def crawl_token_bucket_delay(spark, sf_dir):
    """(regime, host, n_req, gap_us, n_delayed, max_delay_us,
    total_delay_us): exact Lindley waiting times of the per-host
    politeness regulator under the light/heavy derived gap regimes."""
    from harvester_spark.operators.graph import _hash56

    ev = load(spark, sf_dir, "events").select(
        F.concat(
            F.lit("h"),
            (
                _hash56(F.concat(F.lit("tb|"), F.col("user_id").cast("string")))
                % TB_HOSTS
            ).cast("string"),
        ).alias("host"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("a"),
        "event_id",
    )
    scal = ev.groupBy("host").agg(
        F.count("*").cast("long").alias("n_req"),
        F.min("a").cast("long").alias("amn"),
        F.max("a").cast("long").alias("amx"),
    )
    gaps = scal.select(
        "host",
        "n_req",
        F.expr(
            f"CAST({TB_LIGHT_NUM} * ((amx - amn) DIV (n_req - 1))"
            f" DIV {TB_LIGHT_DEN} AS BIGINT)"
        ).alias("light"),
        F.expr(
            f"CAST({TB_HEAVY_NUM} * ((amx - amn) DIV (n_req - 1))"
            f" DIV {TB_HEAVY_DEN} AS BIGINT)"
        ).alias("heavy"),
    )
    regimes = gaps.select(
        F.lit("light").alias("regime"), "host", F.col("light").alias("gap_us")
    ).unionByName(
        gaps.select(
            F.lit("heavy").alias("regime"), "host", F.col("heavy").alias("gap_us")
        )
    )
    wseq = W.partitionBy("regime", "host").orderBy("a", "event_id")
    wrun = wseq.rowsBetween(W.unboundedPreceding, W.currentRow)
    delays = (
        ev.join(F.broadcast(regimes), "host")
        .withColumn("i", (F.row_number().over(wseq) - 1).cast("long"))
        .withColumn("p", (F.col("a") - F.col("i") * F.col("gap_us")).cast("long"))
        .withColumn("delay", (F.max("p").over(wrun) - F.col("p")).cast("long"))
    )
    return (
        delays.groupBy("regime", "host", "gap_us")
        .agg(
            F.count("*").cast("long").alias("n_req"),
            F.sum(F.expr("CASE WHEN delay > 0 THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_delayed"),
            F.max("delay").cast("long").alias("max_delay_us"),
            F.sum("delay").cast("long").alias("total_delay_us"),
        )
        .select(
            "regime",
            "host",
            "n_req",
            "gap_us",
            "n_delayed",
            "max_delay_us",
            "total_delay_us",
        )
        .orderBy("regime", "host")
    )


def _sql_token_bucket() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'tb|' || CAST(user_id AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT 'h' || CAST({h} % {TB_HOSTS} AS VARCHAR) AS host,
         epoch_us(ts) AS a, event_id
  FROM events
),
scal AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_req,
         min(a) AS amn, max(a) AS amx
  FROM ev GROUP BY 1
),
regimes AS (
  SELECT 'light' AS regime, host,
         CAST({TB_LIGHT_NUM} * ((amx - amn) // (n_req - 1))
              // {TB_LIGHT_DEN} AS BIGINT) AS gap_us
  FROM scal
  UNION ALL
  SELECT 'heavy', host,
         CAST({TB_HEAVY_NUM} * ((amx - amn) // (n_req - 1))
              // {TB_HEAVY_DEN} AS BIGINT)
  FROM scal
),
delays AS (
  SELECT r.regime, e.host, r.gap_us,
         max(e.a - (rn - 1) * r.gap_us)
           OVER (PARTITION BY r.regime, e.host ORDER BY e.a, e.event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (e.a - (rn - 1) * r.gap_us) AS delay
  FROM (
    SELECT host, a, event_id,
           row_number() OVER (PARTITION BY host ORDER BY a, event_id) AS rn
    FROM ev
  ) e JOIN regimes r USING (host)
)
SELECT regime, host,
       CAST(count(*) AS BIGINT) AS n_req,
       gap_us,
       CAST(sum(CASE WHEN delay > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_delayed,
       CAST(max(delay) AS BIGINT) AS max_delay_us,
       CAST(sum(delay) AS BIGINT) AS total_delay_us
FROM delays
GROUP BY regime, host, gap_us
ORDER BY regime, host
"""


QUERIES["crawl_token_bucket_delay"] = (
    crawl_token_bucket_delay,
    _sql_token_bucket(),
)


# ------------------------------------------ Cramer-von Mises two-sample

# The two-sample Cramer-von Mises statistic (Anderson, AMS 1962) —
# the INTEGRATED-difference companion to events_ks_test's supremum and
# events_mannwhitney_eval's rank shift (KS sees the largest ECDF gap,
# CvM sees the whole curve; a distribution change that spreads many
# small gaps moves CvM before KS):
#   omega^2 = n*m/(n+m) * integral (F_a - F_b)^2 dH_{n+m}
# evaluated exactly on the pooled distinct-value grid (atom weight
# m_v), which handles ties natively — no midrank convention needed.
# Same planted-control battery as Mann-Whitney: the null md5 split of
# the event value cents, and the same split with +{MW_SHIFT_CENTS} on
# group 1 (pinned to dominate the null draw >= 10x; the null is one
# draw and never pinned absolutely).
#
# Integer ladder (the events_mannwhitney overflow discipline): the
# per-value ECDF gap arrives as e_v = DIVROUND(m*cumA - n*cumB, n*m)
# in SIGNED micro (sign-split floored division); then
#   A = sum_v m_v * e_v^2            (<= (n+m) * 1e12 ~ 1e17)
#   t_micro = ((A DIV (n+m)) * n DIV (n+m)) * m DIV 1e6
# — each floor loses < 1 part in 1e12 of the running value, measured
# exact against the pure-Fraction recompute in
# tests/test_session16_ops.py. Significance at the asymptotic 5%
# critical value omega^2 = 0.461.
#
# Scale shape: one distinct-value histogram + one cumsum window (the
# mannwhitney plan), scalar totals broadcast.

CVM_SIG_MICRO = 461000  # asymptotic 5% critical value, micro


def events_cvm_test(spark, sf_dir):
    """(comparison, n_a, n_b, n_values, t_micro, significant): exact
    pooled-grid two-sample Cramer-von Mises test for the null md5
    split and the planted shift."""
    from harvester_spark.operators.graph import _hash56
    from harvester_spark.operators.index_stats import _DIVROUND

    ev = load(spark, sf_dir, "events").select(
        cents("value").alias("c"),
        (
            _hash56(F.concat(F.lit("cvm|"), F.col("event_id").cast("string")))
            % 2
        ).cast("long").alias("grp"),
    )
    both_c = ev.select(
        F.lit("null_split").alias("comparison"), F.col("c").alias("v"), "grp"
    ).unionByName(
        ev.select(
            F.lit("planted_shift").alias("comparison"),
            (F.col("c") + F.col("grp") * MW_SHIFT_CENTS).alias("v"),
            "grp",
        )
    )
    per = both_c.groupBy("comparison", "v").agg(
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("ca"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("cb"),
    )
    wcum = (
        W.partitionBy("comparison")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot = both_c.groupBy("comparison").agg(
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_a"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_b"),
    )
    ev_micro = _DIVROUND.format(
        num="(n_b * cuma - n_a * cumb)", den="(n_a * n_b)", div="DIV"
    )
    contrib = (
        per.withColumn("cuma", F.sum("ca").over(wcum))
        .withColumn("cumb", F.sum("cb").over(wcum))
        .join(F.broadcast(tot), "comparison")
        .withColumn("e", F.expr(f"CAST({ev_micro} AS BIGINT)"))
        .groupBy("comparison")
        .agg(
            F.count("*").cast("long").alias("n_values"),
            F.sum(F.expr("(ca + cb) * e * e")).cast("long").alias("a_sum"),
        )
    )
    return (
        contrib.join(tot, "comparison")
        .select(
            "comparison",
            "n_a",
            "n_b",
            "n_values",
            F.expr(
                "CAST(((a_sum DIV (n_a + n_b)) * n_a DIV (n_a + n_b))"
                " * n_b DIV 1000000 AS BIGINT)"
            ).alias("t_micro"),
        )
        .withColumn("significant", F.col("t_micro") >= CVM_SIG_MICRO)
        .orderBy("comparison")
    )


def _sql_cvm() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56
    from harvester_spark.operators.index_stats import _DIVROUND

    h = _SQL_HASH56.format(col="'cvm|' || CAST(event_id AS VARCHAR)")
    ev_micro = _DIVROUND.format(
        num="(n_b * cuma - n_a * cumb)", den="(n_a * n_b)", div="//"
    )
    return f"""
WITH ev AS (
  SELECT {sql_cents('value')} AS c, {h} % 2 AS grp FROM events
),
both_c AS (
  SELECT 'null_split' AS comparison, c AS v, grp FROM ev
  UNION ALL
  SELECT 'planted_shift', c + grp * {MW_SHIFT_CENTS}, grp FROM ev
),
per AS (
  SELECT comparison, v,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM both_c GROUP BY 1, 2
),
tot AS (
  SELECT comparison,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM both_c GROUP BY 1
),
cum AS (
  SELECT comparison, v, ca, cb,
         sum(ca) OVER (PARTITION BY comparison ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cuma,
         sum(cb) OVER (PARTITION BY comparison ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumb
  FROM per
),
contrib AS (
  SELECT c.comparison,
         CAST(count(*) AS BIGINT) AS n_values,
         CAST(sum((c.ca + c.cb)
                  * CAST({ev_micro} AS BIGINT)
                  * CAST({ev_micro} AS BIGINT)) AS BIGINT) AS a_sum
  FROM cum c JOIN tot USING (comparison)
  GROUP BY 1
)
SELECT comparison, n_a, n_b, n_values,
       CAST(((a_sum // (n_a + n_b)) * n_a // (n_a + n_b)) * n_b
            // 1000000 AS BIGINT) AS t_micro,
       ((a_sum // (n_a + n_b)) * n_a // (n_a + n_b)) * n_b
         // 1000000 >= {CVM_SIG_MICRO} AS significant
FROM contrib JOIN tot USING (comparison)
ORDER BY comparison
"""


QUERIES["events_cvm_test"] = (events_cvm_test, _sql_cvm())


# ------------------------------------------ doubly-robust ATE (AIPW)

# The augmented-IPW / doubly-robust average-treatment-effect estimator
# (Robins, Rotnitzky & Zhao 1994; Bang & Robins 2005) — the missing
# member of the causal family next to events_did_abtest /
# events_cuped_abtest / events_iv_wald_eval: with a planted
# confounder x (4 strata), treatment propensity e(x) = (1+x)/6 and
# outcome baseline both RISING in x, the naive treated-minus-control
# difference absorbs the confounding, while
#   tau_AIPW = mean[ m1(x) - m0(x)
#                    + T (y - m1(x)) / e(x)
#                    - (1-T)(y - m0(x)) / (1 - e(x)) ]
# recovers the planted tau if EITHER leg is right. The operator runs
# the two half-broken variants that make double robustness a measured
# property, not a slogan: 'dr_bad_model' (global position-blind
# outcome means + CORRECT propensities) and 'dr_bad_prop' (stratum
# outcome means + a flat e = 1/2; the model leg makes the correction
# vanish in-sample, so this is exactly the stratified estimator).
# Both recover tau; 'naive' must not (pinned with the measured
# margins in tests/test_session16_ops.py).
#
# Integer contract: y is exact planted cents; every mean/weighted term
# is a per-stratum floored milli division with PARENTHESIZED compound
# denominators (the session's _DIVROUND precedence lesson), summed
# int64.
#
# Scale shape: one scan -> 8-row (stratum x arm) moment agg;
# everything after is arithmetic over the broadcast-scale frame.

AIPW_STRATA = 4
AIPW_TAU_CENTS = 300  # planted effect
AIPW_NOISE = 200  # uniform noise span, cents
AIPW_TOL_MILLI = 150000  # recovery tolerance: 150 cents, milli
# (dr_bad_model is IPW-variance: measured err 102k milli at the n=1000
# sf0.001 draw; naive's confounding bias is ~432k at every scale, 3x
# above the tolerance)


def _aipw_rows(spark, sf_dir):
    from harvester_spark.operators.graph import _hash56

    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("eid")
    )
    x = (_hash56(F.concat(F.lit("cx|"), F.col("eid"))) % AIPW_STRATA).cast(
        "long"
    )
    t = (
        _hash56(F.concat(F.lit("ct|"), F.col("eid"))) % 6 < (x + 1)
    ).cast("long")
    noise = (_hash56(F.concat(F.lit("cn|"), F.col("eid"))) % AIPW_NOISE).cast(
        "long"
    )
    return ev.select(
        x.alias("x"),
        t.alias("t"),
        (
            F.lit(1000)
            + x * 500
            + t * AIPW_TAU_CENTS
            + noise
        ).cast("long").alias("y"),
    )


def events_aipw_ate_eval(spark, sf_dir):
    """(estimator, n, est_milli, tau_true_milli, abs_err_milli,
    recovered): naive vs IPW vs the two half-broken doubly-robust
    variants on the planted confounded outcome."""
    rows = _aipw_rows(spark, sf_dir)
    per = rows.groupBy("x").agg(
        F.count("*").cast("long").alias("nx"),
        F.sum("t").cast("long").alias("n1"),
        F.sum(F.expr("CASE WHEN t = 1 THEN y ELSE 0 END"))
        .cast("long")
        .alias("s1"),
        F.sum(F.expr("CASE WHEN t = 0 THEN y ELSE 0 END"))
        .cast("long")
        .alias("s0"),
    ).withColumn("n0", (F.col("nx") - F.col("n1")).cast("long"))
    tot = per.agg(
        F.sum("nx").cast("long").alias("n"),
        F.sum("n1").cast("long").alias("gn1"),
        F.sum("n0").cast("long").alias("gn0"),
        F.sum("s1").cast("long").alias("gs1"),
        F.sum("s0").cast("long").alias("gs0"),
    )
    j = per.crossJoin(F.broadcast(tot))
    # per-stratum milli means (parenthesized denominators throughout)
    terms = j.select(
        "x", "nx", "n1", "n0", "s1", "s0", "n", "gn1", "gn0", "gs1", "gs0",
        F.expr("CAST((1000 * s1) DIV n1 AS BIGINT)").alias("m1x"),
        F.expr("CAST((1000 * s0) DIV n0 AS BIGINT)").alias("m0x"),
        F.expr("CAST((1000 * gs1) DIV gn1 AS BIGINT)").alias("g1"),
        F.expr("CAST((1000 * gs0) DIV gn0 AS BIGINT)").alias("g0"),
    )
    agg = terms.agg(
        F.max("n").alias("n"),
        F.max("g1").alias("g1"),
        F.max("g0").alias("g0"),
        # naive numerators are global; stratified pieces below
        F.sum(F.expr("nx * (m1x - m0x)")).cast("long").alias("strat_num"),
        # IPW: sum_x [ 6*1000*s1/(1+x) - 6*1000*s0/(6-(1+x)) ]
        F.sum(
            F.expr(
                "CAST((6000 * s1) DIV (1 + x) AS BIGINT)"
                " - CAST((6000 * s0) DIV (5 - x) AS BIGINT)"
            )
        ).cast("long").alias("ipw_num"),
        # dr_bad_model correction with correct e(x): residuals vs the
        # global means, reweighted per stratum
        F.sum(
            F.expr(
                "CAST(CASE WHEN 1000 * s1 - n1 * g1 >= 0"
                " THEN (6 * (1000 * s1 - n1 * g1)) DIV (1 + x)"
                " ELSE -((6 * (n1 * g1 - 1000 * s1)) DIV (1 + x)) END"
                " AS BIGINT)"
                " - CAST(CASE WHEN 1000 * s0 - n0 * g0 >= 0"
                " THEN (6 * (1000 * s0 - n0 * g0)) DIV (5 - x)"
                " ELSE -((6 * (n0 * g0 - 1000 * s0)) DIV (5 - x)) END"
                " AS BIGINT)"
            )
        ).cast("long").alias("corr_num"),
    )
    trunc = (
        "CASE WHEN {v} >= 0 THEN ({v}) DIV n ELSE -((-({v})) DIV n) END"
    )
    ests = agg.select(
        F.col("n"),
        F.expr("CAST(g1 - g0 AS BIGINT)").alias("naive"),
        F.expr(f"CAST({trunc.format(v='ipw_num')} AS BIGINT)").alias("ipw"),
        F.expr(
            f"CAST((g1 - g0) + {trunc.format(v='corr_num')} AS BIGINT)"
        ).alias("dr_bad_model"),
        F.expr(f"CAST({trunc.format(v='strat_num')} AS BIGINT)").alias(
            "dr_bad_prop"
        ),
    )
    out = None
    for name in ("naive", "ipw", "dr_bad_model", "dr_bad_prop"):
        row = ests.select(
            F.lit(name).alias("estimator"),
            F.col("n"),
            F.col(name).cast("long").alias("est_milli"),
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "estimator",
        "n",
        "est_milli",
        F.lit(AIPW_TAU_CENTS * 1000).cast("long").alias("tau_true_milli"),
        F.expr(f"CAST(abs(est_milli - {AIPW_TAU_CENTS * 1000}) AS BIGINT)").alias(
            "abs_err_milli"
        ),
        F.expr(
            f"abs(est_milli - {AIPW_TAU_CENTS * 1000}) <= {AIPW_TOL_MILLI}"
        ).alias("recovered"),
    ).orderBy("estimator")


def _sql_aipw() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    hx = _SQL_HASH56.format(col="'cx|' || eid")
    ht = _SQL_HASH56.format(col="'ct|' || eid")
    hn = _SQL_HASH56.format(col="'cn|' || eid")
    return f"""
WITH ev AS (SELECT CAST(event_id AS VARCHAR) AS eid FROM events),
rows_ AS (
  SELECT x, t,
         CAST(1000 + x * 500 + t * {AIPW_TAU_CENTS} + noise AS BIGINT) AS y
  FROM (
    SELECT {hx} % {AIPW_STRATA} AS x,
           CASE WHEN {ht} % 6 < ({hx} % {AIPW_STRATA}) + 1
                THEN 1 ELSE 0 END AS t,
           {hn} % {AIPW_NOISE} AS noise
    FROM ev
  )
),
per AS (
  SELECT x, CAST(count(*) AS BIGINT) AS nx,
         CAST(sum(t) AS BIGINT) AS n1,
         CAST(count(*) - sum(t) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS s0
  FROM rows_ GROUP BY 1
),
tot AS (
  SELECT CAST(sum(nx) AS BIGINT) AS n,
         CAST(sum(n1) AS BIGINT) AS gn1, CAST(sum(n0) AS BIGINT) AS gn0,
         CAST(sum(s1) AS BIGINT) AS gs1, CAST(sum(s0) AS BIGINT) AS gs0
  FROM per
),
terms AS (
  SELECT p.*, t.n,
         CAST((1000 * p.s1) // p.n1 AS BIGINT) AS m1x,
         CAST((1000 * p.s0) // p.n0 AS BIGINT) AS m0x,
         CAST((1000 * t.gs1) // t.gn1 AS BIGINT) AS g1,
         CAST((1000 * t.gs0) // t.gn0 AS BIGINT) AS g0
  FROM per p CROSS JOIN tot t
),
agg AS (
  SELECT max(n) AS n, max(g1) AS g1, max(g0) AS g0,
         CAST(sum(nx * (m1x - m0x)) AS BIGINT) AS strat_num,
         CAST(sum(CAST((6000 * s1) // (1 + x) AS BIGINT)
                  - CAST((6000 * s0) // (5 - x) AS BIGINT)) AS BIGINT)
           AS ipw_num,
         CAST(sum(CAST(CASE WHEN 1000 * s1 - n1 * g1 >= 0
                       THEN (6 * (1000 * s1 - n1 * g1)) // (1 + x)
                       ELSE -((6 * (n1 * g1 - 1000 * s1)) // (1 + x)) END
                       AS BIGINT)
                  - CAST(CASE WHEN 1000 * s0 - n0 * g0 >= 0
                       THEN (6 * (1000 * s0 - n0 * g0)) // (5 - x)
                       ELSE -((6 * (n0 * g0 - 1000 * s0)) // (5 - x)) END
                       AS BIGINT))
              AS BIGINT) AS corr_num
  FROM terms
),
ests AS (
  SELECT 'naive' AS estimator, n, CAST(g1 - g0 AS BIGINT) AS est_milli
  FROM agg
  UNION ALL
  SELECT 'ipw', n,
         CAST(CASE WHEN ipw_num >= 0 THEN ipw_num // n
              ELSE -((-ipw_num) // n) END AS BIGINT)
  FROM agg
  UNION ALL
  SELECT 'dr_bad_model', n,
         CAST((g1 - g0) + CASE WHEN corr_num >= 0 THEN corr_num // n
              ELSE -((-corr_num) // n) END AS BIGINT)
  FROM agg
  UNION ALL
  SELECT 'dr_bad_prop', n,
         CAST(CASE WHEN strat_num >= 0 THEN strat_num // n
              ELSE -((-strat_num) // n) END AS BIGINT)
  FROM agg
)
SELECT estimator, n, est_milli,
       CAST({AIPW_TAU_CENTS * 1000} AS BIGINT) AS tau_true_milli,
       CAST(abs(est_milli - {AIPW_TAU_CENTS * 1000}) AS BIGINT)
         AS abs_err_milli,
       abs(est_milli - {AIPW_TAU_CENTS * 1000}) <= {AIPW_TOL_MILLI}
         AS recovered
FROM ests ORDER BY estimator
"""


QUERIES["events_aipw_ate_eval"] = (events_aipw_ate_eval, _sql_aipw())


# ------------------------------------------ TOST equivalence testing

# Two one-sided tests (Schuirmann 1987; Lakens 2017) — the direction
# the significance family (events_mannwhitney_eval, ranker_sign_test,
# events_srm_check) cannot speak to: a NON-significant difference
# test is not evidence of equivalence; TOST certifies |mean d| < delta
# by REJECTING both one-sided nulls mean <= -delta and mean >= +delta.
# Planted-control pair: 'centered' (uniform +-{TOST_NOISE} cent
# deltas, mean ~0 — must certify equivalence at delta =
# {TOST_DELTA} while the plain two-sided t-test stays silent) and
# 'shifted' (+{TOST_SHIFT} cents — equivalence must FAIL while the
# t-test fires). Both directions pinned in
# tests/test_session16_ops.py.
#
# Integer contract: with S = sum d, Q = sum d^2 (exact cents), the
# one-sided condition t = (dbar -+ delta)/SE >= t_crit is evaluated
# cross-multiplied:  m = (S +- n*delta) DIV n (milli-free floored
# mean, the CUPED cents-scale discipline), then
#   1000 * m^2 * n * (n-1) >= {TOST_TCRIT2_MILLI} * (n*Q - S^2)
# plus the sign guard on (S +- n*delta). Overflow bound: n*Q ~ 1e15
# at sf0.1 (cents-scale deltas), x2706 < 3e18 — inside int64 with
# 3x headroom; larger scales re-ladder (documented, the
# events_mannwhitney discipline).

TOST_NOISE = 300  # centered plant: uniform [-300, 300] cents
TOST_SHIFT = 500  # shifted plant offset, cents
TOST_DELTA = 400  # equivalence margin, cents
TOST_TCRIT2_MILLI = 2706  # z_{0.95}^2 = 1.645^2, milli
TOST_T2_2SIDED_MILLI = 3841  # z_{0.975}^2, milli (plain t-test)


def events_tost_equivalence(spark, sf_dir):
    """(comparison, n, mean_floor_cents, s_sum, q_sum, lower_reject,
    upper_reject, equivalent, ttest_significant): TOST equivalence vs
    the plain difference test on the planted centered/shifted paired
    deltas."""
    from harvester_spark.operators.graph import _hash56

    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("eid")
    )
    base = ev.select(
        (
            (_hash56(F.concat(F.lit("td|"), F.col("eid"))) % (2 * TOST_NOISE + 1))
            - TOST_NOISE
        ).cast("long").alias("d0")
    )
    both_d = base.select(
        F.lit("centered").alias("comparison"), F.col("d0").alias("d")
    ).unionByName(
        base.select(
            F.lit("shifted").alias("comparison"),
            (F.col("d0") + TOST_SHIFT).alias("d"),
        )
    )
    agg = both_d.groupBy("comparison").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("s_sum"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("q_sum"),
    )
    # sign-split floored means (trunc semantics, both engines)
    mdiv = "CASE WHEN {v} >= 0 THEN ({v}) DIV n ELSE -((-({v})) DIV n) END"
    mlo = mdiv.format(v=f"s_sum + n * {TOST_DELTA}")
    mhi = mdiv.format(v=f"s_sum - n * {TOST_DELTA}")
    mean_f = mdiv.format(v="s_sum")
    var_num = "(n * q_sum - s_sum * s_sum)"
    lower = (
        f"(s_sum + n * {TOST_DELTA}) > 0 AND "
        f"1000 * ({mlo}) * ({mlo}) * (n - 1) >= {TOST_TCRIT2_MILLI} * {var_num} DIV n"
    )
    upper = (
        f"(s_sum - n * {TOST_DELTA}) < 0 AND "
        f"1000 * ({mhi}) * ({mhi}) * (n - 1) >= {TOST_TCRIT2_MILLI} * {var_num} DIV n"
    )
    ttest = (
        f"1000 * ({mean_f}) * ({mean_f}) * (n - 1)"
        f" >= {TOST_T2_2SIDED_MILLI} * {var_num} DIV n"
    )
    return agg.select(
        "comparison",
        "n",
        F.expr(f"CAST({mean_f} AS BIGINT)").alias("mean_floor_cents"),
        "s_sum",
        "q_sum",
        F.expr(lower).alias("lower_reject"),
        F.expr(upper).alias("upper_reject"),
        F.expr(f"({lower}) AND ({upper})").alias("equivalent"),
        F.expr(ttest).alias("ttest_significant"),
    ).orderBy("comparison")


def _sql_tost() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(col="'td|' || eid")
    mdiv = "CASE WHEN {v} >= 0 THEN ({v}) // n ELSE -((-({v})) // n) END"
    mlo = mdiv.format(v=f"s_sum + n * {TOST_DELTA}")
    mhi = mdiv.format(v=f"s_sum - n * {TOST_DELTA}")
    mean_f = mdiv.format(v="s_sum")
    var_num = "(n * q_sum - s_sum * s_sum)"
    lower = (
        f"(s_sum + n * {TOST_DELTA}) > 0 AND "
        f"1000 * ({mlo}) * ({mlo}) * (n - 1) >= {TOST_TCRIT2_MILLI} * {var_num} // n"
    )
    upper = (
        f"(s_sum - n * {TOST_DELTA}) < 0 AND "
        f"1000 * ({mhi}) * ({mhi}) * (n - 1) >= {TOST_TCRIT2_MILLI} * {var_num} // n"
    )
    ttest = (
        f"1000 * ({mean_f}) * ({mean_f}) * (n - 1)"
        f" >= {TOST_T2_2SIDED_MILLI} * {var_num} // n"
    )
    return f"""
WITH ev AS (SELECT CAST(event_id AS VARCHAR) AS eid FROM events),
base AS (
  SELECT CAST({h} % {2 * TOST_NOISE + 1} - {TOST_NOISE} AS BIGINT) AS d0
  FROM ev
),
both_d AS (
  SELECT 'centered' AS comparison, d0 AS d FROM base
  UNION ALL
  SELECT 'shifted', d0 + {TOST_SHIFT} FROM base
),
agg AS (
  SELECT comparison, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS s_sum,
         CAST(sum(d * d) AS BIGINT) AS q_sum
  FROM both_d GROUP BY 1
)
SELECT comparison, n,
       CAST({mean_f} AS BIGINT) AS mean_floor_cents,
       s_sum, q_sum,
       {lower} AS lower_reject,
       {upper} AS upper_reject,
       ({lower}) AND ({upper}) AS equivalent,
       {ttest} AS ttest_significant
FROM agg ORDER BY comparison
"""


QUERIES["events_tost_equivalence"] = (events_tost_equivalence, _sql_tost())


# ------------------------------------------ two-sample test power curve

# The significance family's capstone (the curation_filter_agreement
# meta-eval pattern applied to statistics): the SAME md5 split of the
# event value cents is planted with every shift in {PW_SHIFTS} cents
# and ALL FOUR two-sample tests run on each — Welch's t (es_t_test's
# shared float string), Mann-Whitney z^2 (the _MW_Z2 doubled-midrank
# ladder verbatim), Kolmogorov-Smirnov D (events_ks_test's
# cross-multiplied supremum, micro-normalized), and Cramer-von Mises
# (events_cvm_test's chained-floored ladder verbatim). The power curve
# is the headline: each test's smallest firing shift exposes the
# classic ordering for pure location alternatives (t and MW fire
# first, the omnibus KS last — it spends power on shape), pinned at
# the measured sf0.001 frontier in tests/test_session16_ops.py along
# with a full recompute of every statistic. One histogram pass feeds
# MW/KS/CvM; one moment pass feeds t.
#
# stat column units are each test's NATIVE integer (t: |micro-t|, MW:
# milli-z^2, KS: micro-D, CvM: micro-omega^2) with per-test critical
# values — comparable within a test across shifts, not across tests.

PW_SHIFTS = (0, 250, 500, 1000, 2000, 4000)  # planted shifts, cents
PW_T_CRIT_MICRO = 1959964  # z_{0.975}, micro
PW_KS_C2_MICRO = 1844164  # c(0.05)^2 = 1.358^2, micro


def events_test_power_curve(spark, sf_dir):
    """(shift_cents, test, stat, significant): Welch t / Mann-Whitney /
    KS / CvM decisions for every planted shift of the same md5 split."""
    from harvester_spark.operators.graph import _hash56
    from harvester_spark.operators.index_stats import _DIVROUND

    ev = load(spark, sf_dir, "events").select(
        cents("value").alias("c"),
        (
            _hash56(F.concat(F.lit("pw|"), F.col("event_id").cast("string")))
            % 2
        ).cast("long").alias("grp"),
    )
    shifts = spark.createDataFrame(
        [(s,) for s in PW_SHIFTS], "shift_cents long"
    )
    base = ev.crossJoin(F.broadcast(shifts)).select(
        "shift_cents",
        (F.col("c") + F.col("grp") * F.col("shift_cents")).alias("v"),
        "grp",
    )
    hist = base.groupBy("shift_cents", "v").agg(
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("ca"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("cb"),
    )
    tot = base.groupBy("shift_cents").agg(
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_a"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_b"),
    )
    wcum = (
        W.partitionBy("shift_cents")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wprev = (
        W.partitionBy("shift_cents")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    e_micro = _DIVROUND.format(
        num="(n_b * cuma - n_a * cumb)", den="(n_a * n_b)", div="DIV"
    )
    enriched = (
        hist.withColumn("m", (F.col("ca") + F.col("cb")).cast("long"))
        .withColumn("cuma", F.sum("ca").over(wcum))
        .withColumn("cumb", F.sum("cb").over(wcum))
        .withColumn(
            "cbprev", F.coalesce(F.sum("m").over(wprev), F.lit(0)).cast("long")
        )
        .join(F.broadcast(tot), "shift_cents")
    )
    agg = enriched.groupBy("shift_cents").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(F.expr("ca * (2 * cbprev + m + 1)")).cast("long").alias("r2a"),
        F.sum(F.expr("m * m * m - m")).cast("long").alias("tie_t"),
        F.max(F.expr("abs(n_b * cuma - n_a * cumb)")).cast("long").alias(
            "d_raw"
        ),
        F.sum(F.expr(f"(ca + cb) * CAST({e_micro} AS BIGINT)"
                     f" * CAST({e_micro} AS BIGINT)"))
        .cast("long")
        .alias("a_sum"),
    ).select(
        "shift_cents", "n_a", "n_b", "r2a", "tie_t", "d_raw", "a_sum",
        (F.col("n_a") + F.col("n_b")).cast("long").alias("n"),
        (F.expr("r2a - n_a * (n_a + 1)")).cast("long").alias("u2"),
    )
    mw = _MW_Z2.format(div="DIV")
    ks_stat = "CAST(1000000 * d_raw DIV (n_a * n_b) AS BIGINT)"
    ks_sig = (
        f"({ks_stat}) * ({ks_stat})"
        f" >= ({PW_KS_C2_MICRO} * n * 1000000) DIV (n_a * n_b)"
    )
    cvm_stat = (
        "CAST(((a_sum DIV n) * n_a DIV n) * n_b DIV 1000000 AS BIGINT)"
    )
    rows_mw = agg.select(
        "shift_cents",
        F.lit("mannwhitney").alias("test"),
        F.expr(f"CAST({mw} AS BIGINT)").alias("stat"),
        F.expr(f"{mw} >= {MW_SIG_MILLI}").alias("significant"),
    )
    rows_ks = agg.select(
        "shift_cents",
        F.lit("ks").alias("test"),
        F.expr(ks_stat).alias("stat"),
        F.expr(ks_sig).alias("significant"),
    )
    rows_cvm = agg.select(
        "shift_cents",
        F.lit("cvm").alias("test"),
        F.expr(cvm_stat).alias("stat"),
        F.expr(f"{cvm_stat} >= {CVM_SIG_MICRO}").alias("significant"),
    )
    mom = base.groupBy("shift_cents").agg(
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END")).cast("long").alias("n1"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN v ELSE 0 END")).cast("long").alias("s1"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN v * v ELSE 0 END")).cast("long").alias("q1"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END")).cast("long").alias("n2"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN v ELSE 0 END")).cast("long").alias("s2"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN v * v ELSE 0 END")).cast("long").alias("q2"),
    )
    from harvester_spark.operators.es_aggs import _TT_MICRO

    rows_t = mom.select(
        "shift_cents",
        F.lit("welch_t").alias("test"),
        F.expr(f"CAST(abs({_TT_MICRO}) AS BIGINT)").alias("stat"),
        F.expr(f"abs({_TT_MICRO}) >= {PW_T_CRIT_MICRO}").alias("significant"),
    )
    return (
        rows_t.unionByName(rows_mw)
        .unionByName(rows_ks)
        .unionByName(rows_cvm)
        .orderBy("shift_cents", "test")
    )


def _sql_power_curve() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56
    from harvester_spark.operators.index_stats import _DIVROUND
    from harvester_spark.operators.es_aggs import _TT_MICRO

    h = _SQL_HASH56.format(col="'pw|' || CAST(event_id AS VARCHAR)")
    e_micro = _DIVROUND.format(
        num="(n_b * cuma - n_a * cumb)", den="(n_a * n_b)", div="//"
    )
    mw = _MW_Z2.format(div="//")
    ks_stat = "CAST(1000000 * d_raw // (n_a * n_b) AS BIGINT)"
    ks_sig = (
        f"({ks_stat}) * ({ks_stat})"
        f" >= ({PW_KS_C2_MICRO} * n * 1000000) // (n_a * n_b)"
    )
    cvm_stat = "CAST(((a_sum // n) * n_a // n) * n_b // 1000000 AS BIGINT)"
    shifts = ", ".join(str(s) for s in PW_SHIFTS)
    return f"""
WITH ev AS (
  SELECT {sql_cents('value')} AS c, {h} % 2 AS grp FROM events
),
shifts AS (SELECT CAST(unnest([{shifts}]) AS BIGINT) AS shift_cents),
base AS (
  SELECT s.shift_cents, e.c + e.grp * s.shift_cents AS v, e.grp
  FROM ev e CROSS JOIN shifts s
),
hist AS (
  SELECT shift_cents, v,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM base GROUP BY 1, 2
),
tot AS (
  SELECT shift_cents,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM base GROUP BY 1
),
enriched AS (
  SELECT h.shift_cents, h.ca, h.cb, h.ca + h.cb AS m,
         sum(h.ca) OVER w AS cuma,
         sum(h.cb) OVER w AS cumb,
         CAST(coalesce(sum(h.ca + h.cb) OVER (PARTITION BY h.shift_cents
              ORDER BY h.v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS cbprev,
         t.n_a, t.n_b
  FROM hist h JOIN tot t USING (shift_cents)
  WINDOW w AS (PARTITION BY h.shift_cents ORDER BY h.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
agg AS (
  SELECT shift_cents,
         max(n_a) AS n_a, max(n_b) AS n_b,
         max(n_a) + max(n_b) AS n,
         CAST(sum(ca * (2 * cbprev + m + 1)) AS BIGINT)
           - max(n_a) * (max(n_a) + 1) AS u2,
         CAST(sum(m * m * m - m) AS BIGINT) AS tie_t,
         CAST(max(abs(n_b * cuma - n_a * cumb)) AS BIGINT) AS d_raw,
         CAST(sum((ca + cb) * CAST({e_micro} AS BIGINT)
                  * CAST({e_micro} AS BIGINT)) AS BIGINT) AS a_sum
  FROM enriched GROUP BY 1
),
mom AS (
  SELECT shift_cents,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN grp = 0 THEN v ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN grp = 0 THEN v * v ELSE 0 END) AS BIGINT) AS q1,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN grp = 1 THEN v ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN grp = 1 THEN v * v ELSE 0 END) AS BIGINT) AS q2
  FROM base GROUP BY 1
)
SELECT shift_cents, 'welch_t' AS test,
       CAST(abs({_TT_MICRO}) AS BIGINT) AS stat,
       abs({_TT_MICRO}) >= {PW_T_CRIT_MICRO} AS significant
FROM mom
UNION ALL
SELECT shift_cents, 'mannwhitney',
       CAST({mw} AS BIGINT), {mw} >= {MW_SIG_MILLI}
FROM agg
UNION ALL
SELECT shift_cents, 'ks', {ks_stat}, {ks_sig}
FROM agg
UNION ALL
SELECT shift_cents, 'cvm', {cvm_stat}, {cvm_stat} >= {CVM_SIG_MICRO}
FROM agg
ORDER BY shift_cents, test
"""


QUERIES["events_test_power_curve"] = (
    events_test_power_curve,
    _sql_power_curve(),
)
