"""ES aggregation-framework surfaces: pipeline aggs, composite paging,
adjacency matrix.

The reference's analytics all flow through OpenSearch aggregations
(/root/reference/harvester/search/views/ filters/metrics endpoints expose
terms + date_histogram aggs). Three aggregation families it gets from the
ES framework but the repo had not yet twinned:

- ``events_pipeline_aggs`` — a date_histogram (hourly) with PIPELINE
  aggregations layered on: ``cumulative_sum``, ``derivative``, and a
  trailing ``moving_fn`` average (window 3), the ES syntax for
  second-order analytics over histogram buckets. Buckets are densified
  over the full [min, max] hour span (ES ``min_doc_count: 0`` +
  ``extended_bounds``) so the derivative is defined on every bucket edge.
- ``composite_agg_page`` — the ES ``composite`` aggregation: the ONLY
  paginated agg, keyed by an ``after`` cursor over the multi-source
  bucket key tuple. Twin of t7_search_after on the aggregation side.
- ``adjacency_matrix_terms`` — the ES ``adjacency_matrix`` agg: named
  term filters a/b/c and the doc counts of every filter and pairwise
  intersection (the co-occurrence matrix ES builds for graph exploration).

Determinism contract: hour buckets are ``floor(epoch/3600)`` BIGINTs
(events_hourly_rollup convention — DuckDB epoch() is FRACTIONAL, floor
first); money is integer cents; the moving average is
multiply-then-integer-divide on nonnegative int64 (``sum*1000 DIV cnt``,
exact in both engines — the host_pagerank idiom); every count is CAST
BIGINT in the oracle (DuckDB sum → HUGEINT otherwise).

Scale shapes:
- pipeline aggs: the corpus-sized work is ONE hourly groupBy (map-side
  partial); the pipeline windows then run over the bucket frame, whose
  cardinality is time-bounded by construction (8,760 rows/year at hourly
  grain) — a single-partition window over buckets is the right plan, the
  same bounded-frame argument as events_anomaly_zscore.
- composite: bucket agg + cursor filter + TakeOrdered(size) — the page is
  bounded, the agg is one shuffle, and at a real cluster the cursor
  predicate prunes bucket groups before the limit.
- adjacency matrix: per-doc boolean flags from one array scan, a single
  global agg (map-side combined), then a 6-row unpivot — no joins, no
  per-pair passes.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.analysis import tokens_column
from harvester_spark.operators.common import SQL_TOKS, cents, load, sql_cents

MAVG_W = 3  # trailing moving_fn window (buckets)

COMPOSITE_AFTER = ("src12", "es")  # after-key cursor (source, lang)
COMPOSITE_SIZE = 10

ADJ_A, ADJ_B, ADJ_C = "key", "value", "dup"


def events_pipeline_aggs(spark, sf_dir):
    """Hourly date_histogram + cumulative_sum / derivative / moving_fn(3).
    Densified buckets (min_doc_count: 0) so lag() is the true derivative."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_bucket")
    ).agg(F.count("*").alias("n_events"), F.sum(cents("value")).alias("value_c"))
    span = hourly.agg(
        F.min("hour_bucket").alias("lo"), F.max("hour_bucket").alias("hi")
    )
    grid = span.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hour_bucket")
    )
    dense = (
        grid.join(hourly, "hour_bucket", "left")
        .select(
            "hour_bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_c", F.lit(0)).alias("value_c"),
        )
    )
    # Bucket-frame windows: cardinality is time-bounded (≈720 buckets for
    # the 30-day corpus), so the unpartitioned window is the right plan.
    return dense.selectExpr(
        "hour_bucket",
        "n_events",
        "value_c",
        "sum(value_c) OVER (ORDER BY hour_bucket"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c",
        "value_c - lag(value_c) OVER (ORDER BY hour_bucket) AS deriv_c",
        f"(sum(value_c) OVER (ORDER BY hour_bucket"
        f" ROWS BETWEEN {MAVG_W - 1} PRECEDING AND CURRENT ROW) * 1000)"
        f" DIV count(*) OVER (ORDER BY hour_bucket"
        f" ROWS BETWEEN {MAVG_W - 1} PRECEDING AND CURRENT ROW) AS mavg_milli_c",
    )


SQL_EVENTS_PIPELINE_AGGS = f"""
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum({sql_cents('value')}) AS BIGINT) AS value_c
  FROM events GROUP BY 1
),
grid AS (
  SELECT unnest(generate_series((SELECT min(hour_bucket) FROM hourly),
                                (SELECT max(hour_bucket) FROM hourly))) AS hour_bucket
),
dense AS (
  SELECT g.hour_bucket,
         coalesce(h.n_events, CAST(0 AS BIGINT)) AS n_events,
         coalesce(h.value_c, CAST(0 AS BIGINT)) AS value_c
  FROM grid g LEFT JOIN hourly h USING (hour_bucket)
)
SELECT hour_bucket, n_events, value_c,
       CAST(sum(value_c) OVER (ORDER BY hour_bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c,
       value_c - lag(value_c) OVER (ORDER BY hour_bucket) AS deriv_c,
       (CAST(sum(value_c) OVER (ORDER BY hour_bucket
             ROWS BETWEEN {MAVG_W - 1} PRECEDING AND CURRENT ROW) AS BIGINT) * 1000)
         // CAST(count(*) OVER (ORDER BY hour_bucket
             ROWS BETWEEN {MAVG_W - 1} PRECEDING AND CURRENT ROW) AS BIGINT)
         AS mavg_milli_c
FROM dense
"""


def composite_agg_page(spark, sf_dir):
    """ES composite aggregation: one page of (source, lang) buckets after
    the cursor, ordered by the bucket key tuple. The cursor predicate
    prunes bucket groups before the bounded TakeOrdered page."""
    src_after, lang_after = COMPOSITE_AFTER
    docs = load(spark, sf_dir, "documents")
    buckets = docs.groupBy("source", "lang").agg(
        F.count("*").alias("doc_count"), F.sum("n_chars").alias("chars")
    )
    page = buckets.filter(
        (F.col("source") > src_after)
        | ((F.col("source") == src_after) & (F.col("lang") > lang_after))
    )
    return page.orderBy(F.col("source").asc(), F.col("lang").asc()).limit(
        COMPOSITE_SIZE
    )


SQL_COMPOSITE_AGG_PAGE = f"""
SELECT source, lang, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
GROUP BY source, lang
HAVING source > '{COMPOSITE_AFTER[0]}'
    OR (source = '{COMPOSITE_AFTER[0]}' AND lang > '{COMPOSITE_AFTER[1]}')
ORDER BY source ASC, lang ASC LIMIT {COMPOSITE_SIZE}
"""


def adjacency_matrix_terms(spark, sf_dir):
    """ES adjacency_matrix: doc counts for named term filters a/b/c and
    their pairwise intersections — one array scan, one global agg, a
    6-row stack unpivot."""
    docs = load(spark, sf_dir, "documents")
    flags = docs.select(
        tokens_column(F.col("text")).alias("toks")
    ).select(
        *[
            F.expr(f"CAST(exists(toks, t -> t = '{term}') AS INT)").alias(name)
            for name, term in (("a", ADJ_A), ("b", ADJ_B), ("c", ADJ_C))
        ]
    )
    sums = flags.agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum("c").alias("nc"),
        F.sum(F.col("a") * F.col("b")).alias("nab"),
        F.sum(F.col("a") * F.col("c")).alias("nac"),
        F.sum(F.col("b") * F.col("c")).alias("nbc"),
    )
    return sums.selectExpr(
        "stack(6, 'a', na, 'b', nb, 'c', nc,"
        " 'a&b', nab, 'a&c', nac, 'b&c', nbc) AS (filter_key, doc_count)"
    )


SQL_ADJACENCY_MATRIX = f"""
WITH flags AS (
  SELECT CAST(len(list_filter({SQL_TOKS.format(col='text')}, t -> t = '{ADJ_A}')) > 0 AS INT) AS a,
         CAST(len(list_filter({SQL_TOKS.format(col='text')}, t -> t = '{ADJ_B}')) > 0 AS INT) AS b,
         CAST(len(list_filter({SQL_TOKS.format(col='text')}, t -> t = '{ADJ_C}')) > 0 AS INT) AS c
  FROM documents
),
sums AS (
  SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
         CAST(sum(c) AS BIGINT) AS nc,
         CAST(sum(a * b) AS BIGINT) AS nab, CAST(sum(a * c) AS BIGINT) AS nac,
         CAST(sum(b * c) AS BIGINT) AS nbc
  FROM flags
)
SELECT 'a' AS filter_key, na AS doc_count FROM sums
UNION ALL SELECT 'b', nb FROM sums
UNION ALL SELECT 'c', nc FROM sums
UNION ALL SELECT 'a&b', nab FROM sums
UNION ALL SELECT 'a&c', nac FROM sums
UNION ALL SELECT 'b&c', nbc FROM sums
"""


QUERIES = {
    "events_pipeline_aggs": (events_pipeline_aggs, SQL_EVENTS_PIPELINE_AGGS),
    "composite_agg_page": (composite_agg_page, SQL_COMPOSITE_AGG_PAGE),
    "adjacency_matrix_terms": (adjacency_matrix_terms, SQL_ADJACENCY_MATRIX),
}


# --- ES percentiles aggregation (exact order-statistic contract) -----------
#
# ES serves percentiles from a t-digest sketch; the VERIFIABLE contract is
# the exact discrete percentile (percentile_disc): the value at rank
# ceil(q*n) of the sorted per-type distribution. Integer cents + integer
# target ranks ((q*n + 99) DIV 100) keep both engines bit-identical — no
# interpolation doubles.
#
# Scale shape: one shuffle keyed by event_type (the window partition), one
# pass — rank selection inside the window, then a per-type single-row agg.
# At cluster scale the per-type partitions are the natural parallel unit;
# a skewed type would go through the same two-level order-statistic
# histogram trick stratified_quota_sample uses.

PCT_QS = (50, 90, 99)


def events_percentiles(spark, sf_dir):
    """(event_type, n, p50_c, p90_c, p99_c): exact discrete percentiles of
    the value distribution per event type, in integer cents."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("c"), "event_id"
    )
    w = W.partitionBy("event_type").orderBy(F.col("c").asc(), F.col("event_id").asc())
    ranked = ev.select(
        "event_type",
        "c",
        F.row_number().over(w).cast("long").alias("r"),
        F.count("*").over(W.partitionBy("event_type")).cast("long").alias("n"),
    )
    # integer target rank: (n*q + 99) DIV 100 — ceil(q*n/100) without doubles
    ranked = ranked.withColumn("r50", F.expr(f"(n * {PCT_QS[0]} + 99) DIV 100"))
    ranked = ranked.withColumn("r90", F.expr(f"(n * {PCT_QS[1]} + 99) DIV 100"))
    ranked = ranked.withColumn("r99", F.expr(f"(n * {PCT_QS[2]} + 99) DIV 100"))
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("r") == F.col("r50"), F.col("c"))).alias("p50_c"),
        F.max(F.when(F.col("r") == F.col("r90"), F.col("c"))).alias("p90_c"),
        F.max(F.when(F.col("r") == F.col("r99"), F.col("c"))).alias("p99_c"),
    )


SQL_EVENTS_PERCENTILES = f"""
WITH ranked AS (
  SELECT event_type, {sql_cents('value')} AS c,
         CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY {sql_cents('value')} ASC, event_id ASC) AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM events
)
SELECT event_type, max(n) AS n,
       max(CASE WHEN r = (n * {PCT_QS[0]} + 99) // 100 THEN c END) AS p50_c,
       max(CASE WHEN r = (n * {PCT_QS[1]} + 99) // 100 THEN c END) AS p90_c,
       max(CASE WHEN r = (n * {PCT_QS[2]} + 99) // 100 THEN c END) AS p99_c
FROM ranked GROUP BY event_type
"""


QUERIES["events_percentiles"] = (events_percentiles, SQL_EVENTS_PERCENTILES)


# -------------------------------------------- CUBE / pivot rollup shapes

# GROUP BY CUBE(event_type, hour-of-day): the multi-dimensional facet
# rollup (every marginal plus the grand total in ONE pass). Spark compiles
# cube() to an Expand node — each input row fans out into its 4 grouping
# sets BEFORE one ordinary hash aggregate, so the cost is 4× map rows, not
# 4 scans; the gid is derived from explicit NULL tests (the raw columns
# are never NULL) instead of grouping_id() so both engines label grouping
# sets identically regardless of their internal bit order.


def events_cube(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hour_of_day"),
        cents("value").alias("value_c"),
    )
    return (
        ev.cube("event_type", "hour_of_day")
        .agg(F.count("*").alias("n"), F.sum("value_c").alias("sum_value_c"))
        .selectExpr(
            "event_type",
            "hour_of_day",
            "CASE WHEN event_type IS NULL THEN 2 ELSE 0 END"
            " + CASE WHEN hour_of_day IS NULL THEN 1 ELSE 0 END AS gid",
            "n",
            "sum_value_c",
        )
    )


SQL_EVENTS_CUBE = f"""
SELECT event_type, hour_of_day,
       CASE WHEN event_type IS NULL THEN 2 ELSE 0 END
       + CASE WHEN hour_of_day IS NULL THEN 1 ELSE 0 END AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(value_c) AS BIGINT) AS sum_value_c
FROM (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
         {sql_cents('value')} AS value_c
  FROM events
)
GROUP BY CUBE (event_type, hour_of_day)
"""

QUERIES["events_cube"] = (events_cube, SQL_EVENTS_CUBE)


# Pivoted daily counts: the "one column per category" report shape.
# Spark's pivot() pre-lists the categories (no extra distinct pass) and
# compiles to ONE aggregate with conditional legs — exactly the FILTER
# aggregation the oracle spells out; absent cells coalesce to 0 on both.

_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def events_pivot_daily(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"), "event_type"
    )
    piv = ev.groupBy("day").pivot("event_type", list(_PIVOT_TYPES)).count()
    return piv.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in _PIVOT_TYPES
        ],
    )


SQL_EVENTS_PIVOT = f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       {", ".join(
           f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
           for t in _PIVOT_TYPES
       )}
FROM events
GROUP BY 1
"""

QUERIES["events_pivot_daily"] = (events_pivot_daily, SQL_EVENTS_PIVOT)


# Per-user event-type Markov transition matrix — the sequence-analytics
# rollup behind session flow analysis ("what follows a click?"). One
# window per user (ts, event_id total order — the same contract the
# sessionizer uses), lag pairs, then a tiny (from, to) aggregate;
# probabilities are integer micro-units of the per-from row total. One
# shuffle on user_id, map-side-combined count agg.


def events_markov_transitions(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy(F.col("from_type").alias("ft")).agg(
        F.sum("n").alias("row_total")
    )
    return (
        pairs.join(F.broadcast(tot), pairs.from_type == F.col("ft"))
        .selectExpr(
            "from_type", "to_type", "n",
            "(n * 1000000) DIV row_total AS prob_micro",
        )
    )


SQL_MARKOV_TRANSITIONS = """
WITH pairs AS (
  SELECT from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS from_type
    FROM events
  )
  WHERE from_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_type AS ft, CAST(sum(n) AS BIGINT) AS row_total
        FROM pairs GROUP BY 1)
SELECT from_type, to_type, n, (n * 1000000) // row_total AS prob_micro
FROM pairs JOIN tot ON ft = from_type
"""

QUERIES["events_markov_transitions"] = (
    events_markov_transitions,
    SQL_MARKOV_TRANSITIONS,
)


# ------------------------------------------------------------- rare_terms
# The ES ``rare_terms`` aggregation — the long-tail complement of ``terms``
# (and of cms_heavy_hitters): buckets whose doc count is AT MOST
# ``max_doc_count``, ordered rarest-first. ES bounds its state with a
# CuckooFilter because a terms-agg ordered ascending would have to
# materialize every bucket; relationally the same bound comes from the
# threshold filter below the agg and a TakeOrdered cut with a unique
# (doc_count asc, shingle asc) key. Domain is the word-3-gram shingle
# stream (the term vocabulary of the synthetic corpus is ~31 head words —
# no tail to aggregate; shingles are the Zipfian domain, the same choice
# the sketch operators document).
#
# Scale shape: one map-side-combined groupBy(shingle) → threshold filter →
# TakeOrdered(RARE_SIZE); nothing vocabulary-sized leaves the executors.

RARE_MAX_DOC_COUNT = 2
RARE_SIZE = 50


def es_rare_terms(spark, sf_dir):
    """(shingle, doc_count): the RARE_SIZE rarest shingle buckets with
    doc_count <= RARE_MAX_DOC_COUNT, rarest first."""
    from harvester_spark.operators.sketches import _shingle_stream

    sh = _shingle_stream(spark, sf_dir, "doc_id")
    counts = sh.groupBy("shingle").agg(
        F.countDistinct("doc_id").cast("long").alias("doc_count")
    )
    return (
        counts.filter(F.col("doc_count") <= RARE_MAX_DOC_COUNT)
        .orderBy(F.col("doc_count").asc(), F.col("shingle").asc())
        .limit(RARE_SIZE)
    )


def _sql_rare_terms() -> str:
    from harvester_spark.operators.sketches import _sql_shingle_stream

    return f"""
WITH sh AS ({_sql_shingle_stream('doc_id')}),
counts AS (
  SELECT shingle, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_count
  FROM sh GROUP BY shingle
)
SELECT shingle, doc_count FROM counts
WHERE doc_count <= {RARE_MAX_DOC_COUNT}
ORDER BY doc_count ASC, shingle ASC LIMIT {RARE_SIZE}
"""


QUERIES["es_rare_terms"] = (es_rare_terms, _sql_rare_terms())


# --- ES extended_stats + percentile_ranks (metric-agg tail) ----------------
#
# ``extended_stats`` — count/min/max/sum/avg/variance/std per event type
# from ONE map-side-combined agg over integer-cent moments (s1 = Σc,
# s2 = Σc²; c ≤ 2^16 cents keeps s2 sums < 2^63 up to ~10^9 rows per type —
# past that the moments shard by type-salt and re-add, same plan). The
# derived stats leave integers only at the last step: avg is an exact
# integer-division micro-unit; population variance goes through the ONE
# shared micro-idiom string on (n·s2 − s1²)/n²; std is its sqrt in MILLI
# units (coarser on purpose — sqrt is the least cross-engine-stable float,
# so give it 1000× more rounding slack).
#
# ``percentile_ranks`` — the inverse of events_percentiles: for fixed probe
# values, the fraction of events at or below each probe, as exact
# integer micro-percents ((cnt_le · 10^8) DIV n). The probe table is a
# 3-row broadcast; the only corpus-sized work is one conditional agg.

_EXT_VAR_MICRO = (
    "CAST(floor((n * s2 - s1 * s1) * 1.0e6 / (n * n) + 0.5e0) AS BIGINT)"
)
_EXT_STD_MILLI = (
    "CAST(floor(sqrt((n * s2 - s1 * s1) * 1.0e0 / (n * n)) * 1.0e3 + 0.5e0)"
    " AS BIGINT)"
)


def events_extended_stats(spark, sf_dir):
    """(event_type, n, min_c, max_c, sum_c, avg_micro, var_micro,
    std_milli): the ES extended_stats metric agg on integer-cent moments."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("c")
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.min("c").cast("long").alias("min_c"),
        F.max("c").cast("long").alias("max_c"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return m.select(
        "event_type",
        "n",
        "min_c",
        "max_c",
        F.col("s1").alias("sum_c"),
        F.expr("(s1 * 1000000 + n DIV 2) DIV n").alias("avg_micro"),
        F.expr(_EXT_VAR_MICRO).alias("var_micro"),
        F.expr(_EXT_STD_MILLI).alias("std_milli"),
    )


SQL_EVENTS_EXTENDED_STATS = f"""
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(min({sql_cents('value')}) AS BIGINT) AS min_c,
         CAST(max({sql_cents('value')}) AS BIGINT) AS max_c,
         CAST(sum({sql_cents('value')}) AS BIGINT) AS s1,
         CAST(sum({sql_cents('value')} * {sql_cents('value')}) AS BIGINT) AS s2
  FROM events GROUP BY event_type
)
SELECT event_type, n, min_c, max_c, s1 AS sum_c,
       (s1 * 1000000 + n // 2) // n AS avg_micro,
       {_EXT_VAR_MICRO} AS var_micro,
       {_EXT_STD_MILLI} AS std_milli
FROM m
"""

QUERIES["events_extended_stats"] = (events_extended_stats, SQL_EVENTS_EXTENDED_STATS)


PR_PROBES_C = (1000, 5000, 10000)  # cents: value <= 10.00 / 50.00 / 100.00


def events_percentile_ranks(spark, sf_dir):
    """(event_type, probe_c, pct_micro): exact integer micro-percent of
    events with value at or below each probe — ES percentile_ranks."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("c")
    )
    probes = spark.createDataFrame(
        [(int(p),) for p in PR_PROBES_C], "probe_c long"
    )
    return (
        ev.crossJoin(F.broadcast(probes))
        .groupBy("event_type", "probe_c")
        .agg(
            F.sum(F.expr("CASE WHEN c <= probe_c THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("cnt_le"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "event_type",
            "probe_c",
            F.expr("(cnt_le * 100000000) DIV n").alias("pct_micro"),
        )
    )


SQL_EVENTS_PERCENTILE_RANKS = f"""
WITH ev AS (
  SELECT event_type, {sql_cents('value')} AS c FROM events
),
probes AS (SELECT unnest({list(PR_PROBES_C)}) AS probe_c),
agg AS (
  SELECT event_type, probe_c,
         CAST(sum(CASE WHEN c <= probe_c THEN 1 ELSE 0 END) AS BIGINT)
           AS cnt_le,
         CAST(count(*) AS BIGINT) AS n
  FROM ev CROSS JOIN probes
  GROUP BY event_type, probe_c
)
SELECT event_type, CAST(probe_c AS BIGINT) AS probe_c,
       (cnt_le * 100000000) // n AS pct_micro
FROM agg
"""

QUERIES["events_percentile_ranks"] = (
    events_percentile_ranks,
    SQL_EVENTS_PERCENTILE_RANKS,
)


# --- ES auto_date_histogram -------------------------------------------------
#
# ES picks the LARGEST calendar interval that keeps the bucket count at or
# under the target; the twin makes the choice relationally and
# deterministically: span_s = max − min epoch second (one scalar agg, both
# engines on the floored-epoch BIGINT convention), then ONE shared CASE
# ladder (minute → hour → day) chooses the smallest rung whose bucket count
# span_s/interval fits AUTO_DH_TARGET, and the histogram groups on
# epoch DIV interval. Two scans of events (scalar agg + grouped agg) — the
# grouped agg is map-side combined; the interval choice broadcast is one
# row. min_doc_count: 0 densification is events_pipeline_aggs' job; this
# agg returns observed buckets (the ES default).

AUTO_DH_TARGET = 50
_AUTO_DH_IVALS = (60, 3600, 86400)  # the minute/hour/day rungs

_AUTO_DH_CASE = (
    f"CASE WHEN span_s <= {AUTO_DH_TARGET * _AUTO_DH_IVALS[0]}"
    f" THEN {_AUTO_DH_IVALS[0]} "
    f"WHEN span_s <= {AUTO_DH_TARGET * _AUTO_DH_IVALS[1]}"
    f" THEN {_AUTO_DH_IVALS[1]} "
    f"ELSE {_AUTO_DH_IVALS[2]} END"
)


def events_auto_date_histogram(spark, sf_dir):
    """(interval_s, bucket_start_s, n): date histogram at the largest
    ladder interval that fits AUTO_DH_TARGET buckets."""
    ev = load(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").cast("long").alias("sec")
    )
    span = ev.agg(
        (F.max("sec") - F.min("sec")).cast("long").alias("span_s")
    ).select(F.expr(_AUTO_DH_CASE).cast("long").alias("interval_s"))
    return (
        ev.crossJoin(F.broadcast(span))
        .groupBy("interval_s", F.expr("sec DIV interval_s * interval_s").alias("bucket_start_s"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "interval_s",
            F.col("bucket_start_s").cast("long").alias("bucket_start_s"),
            "n",
        )
    )


SQL_AUTO_DATE_HISTOGRAM = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
),
iv AS (
  SELECT CAST({_AUTO_DH_CASE} AS BIGINT) AS interval_s FROM (
    SELECT CAST(max(sec) - min(sec) AS BIGINT) AS span_s FROM ev
  )
)
SELECT interval_s,
       CAST(sec // interval_s * interval_s AS BIGINT) AS bucket_start_s,
       CAST(count(*) AS BIGINT) AS n
FROM ev CROSS JOIN iv
GROUP BY interval_s, sec // interval_s * interval_s
"""

QUERIES["events_auto_date_histogram"] = (
    events_auto_date_histogram,
    SQL_AUTO_DATE_HISTOGRAM,
)


# --- ES filters agg ---------------------------------------------------------
#
# The ``filters`` aggregation: named predicate buckets + the
# ``other_bucket`` for events matching none — ONE conditional pass, no
# joins (a doc can land in several named buckets, so the named counts are
# independent conditional sums, exactly ES semantics). Sub-metric per
# bucket: exact cent sum.

_FILTERS_CASES = (
    ("clicks", "event_type = 'click'"),
    ("errors", "event_type = 'error'"),
    ("big", "value >= 100.0e0"),
)


def events_filters_agg(spark, sf_dir):
    """(bucket, n, value_c): named filter buckets plus other_bucket — ONE
    scan: every bucket is a conditional sum in a single map-side agg, then
    a 4-row stack() unpivot (the adjacency_matrix_terms plan shape)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", cents("value").alias("c")
    )
    other = " AND ".join(f"NOT ({p})" for _, p in _FILTERS_CASES)
    cases = list(_FILTERS_CASES) + [("_other", other)]
    aggs = []
    for i, (_, pred) in enumerate(cases):
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"n{i}")
        )
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {pred} THEN c ELSE 0 END"))
            .cast("long")
            .alias(f"v{i}")
        )
    one = ev.agg(*aggs)
    stack = ", ".join(
        f"'{name}', n{i}, v{i}" for i, (name, _) in enumerate(cases)
    )
    return one.selectExpr(
        f"stack({len(cases)}, {stack}) AS (bucket, n, value_c)"
    )


def _sql_filters_agg() -> str:
    other = " AND ".join(f"NOT ({p})" for _, p in _FILTERS_CASES)
    legs = []
    for name, pred in _FILTERS_CASES + (("_other", other),):
        legs.append(f"""
SELECT '{name}' AS bucket,
       CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n,
       CAST(sum(CASE WHEN {pred} THEN {sql_cents('value')} ELSE 0 END)
            AS BIGINT) AS value_c
FROM events""")
    return " UNION ALL ".join(legs)


QUERIES["events_filters_agg"] = (events_filters_agg, _sql_filters_agg())


# ----------------------------------------- terms agg shard-accuracy eval

# The ES/OpenSearch `terms` aggregation is APPROXIMATE on a sharded index:
# each shard returns only its local top `shard_size` terms, the coordinator
# sums what it received, and every response carries
# `doc_count_error_upper_bound` — the worst-case undercount, computed as
# the sum over non-reporting shards of the LAST (smallest) count that
# shard did return. The reference's facet endpoints consume exactly this
# agg (/root/reference/harvester/search/views/document.py filters/metrics)
# and silently inherit the approximation; this operator MEASURES it on the
# repo's corpus: the merged coordinator counts vs the exact global counts,
# per final top-K term, with the ES error bound alongside — so the
# "measure, don't guess" row proves the bound is honored
# (underestimate <= err_upper_bound, test-pinned).
#
# Sharding is doc_id % NSHARDS_TA (the docID-range layout of the serving
# tier); counts are document frequency over distinct (doc, term) — the ES
# doc_count. Measured at sf0.01 (SHARD_SIZE_TA=12): underestimates 91-192
# on the mid-frequency terms, bound always >= the true undercount.
#
# Scale shape: ONE distinct + ONE (shard, term) groupBy over the token
# stream (both map-side combinable); per-shard tops are a
# WindowGroupLimit partial top-k (never a global sort); the bound join is
# bounded K_FINAL×NSHARDS_TA rows against a broadcast 4-row shard-min dim.

NSHARDS_TA = 4
SHARD_SIZE_TA = 12
K_FINAL_TA = 10


def terms_shard_error_eval(spark, sf_dir):
    """(rnk, term, merged_count, exact_count, underestimate,
    err_upper_bound): the coordinator-merged top-{K_FINAL_TA} of a sharded
    terms agg vs exact global doc counts, with the ES
    doc_count_error_upper_bound."""
    from harvester_spark.operators.common import doc_tokens

    dt = doc_tokens(spark, sf_dir).select("doc_id", "term").distinct()
    sh = (
        dt.withColumn("s", F.col("doc_id") % NSHARDS_TA)
        .groupBy("s", "term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wsh = W.partitionBy("s").orderBy(F.col("cnt").desc(), F.col("term").asc())
    ret = (
        sh.withColumn("r", F.row_number().over(wsh))
        .filter(F.col("r") <= SHARD_SIZE_TA)
        .select("s", "term", "cnt")
    )
    smin = ret.groupBy("s").agg(F.min("cnt").alias("last_cnt"))
    merged = ret.groupBy("term").agg(F.sum("cnt").cast("long").alias("merged_count"))
    top = (
        merged.orderBy(F.col("merged_count").desc(), F.col("term").asc())
        .limit(K_FINAL_TA)
    )
    # bound: for each final term, sum last_cnt over shards that did NOT
    # return it — bounded K×S rows, both sides broadcastable
    bound = (
        top.crossJoin(F.broadcast(smin))
        .join(ret.select("s", "term", F.lit(1).alias("got")), ["s", "term"], "left")
        .groupBy("term")
        .agg(
            F.sum(
                F.when(F.col("got").isNull(), F.col("last_cnt")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("err_upper_bound")
        )
    )
    exact = dt.groupBy("term").agg(F.count("*").cast("long").alias("exact_count"))
    w = W.orderBy(F.col("merged_count").desc(), F.col("term").asc())
    return (
        top.join(bound, "term")
        .join(exact, "term")
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "rnk",
            "term",
            "merged_count",
            "exact_count",
            (F.col("exact_count") - F.col("merged_count"))
            .cast("long")
            .alias("underestimate"),
            "err_upper_bound",
        )
    )


from harvester_spark.operators.common import SQL_TOKS as _SQL_TOKS_TA

SQL_TERMS_SHARD_ERROR = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest({_SQL_TOKS_TA.format(col='text')}) AS term
        FROM documents)
),
sh AS (
  SELECT doc_id % {NSHARDS_TA} AS s, term, CAST(count(*) AS BIGINT) AS cnt
  FROM dt GROUP BY 1, 2
),
ret AS (
  SELECT s, term, cnt FROM sh
  QUALIFY row_number() OVER (PARTITION BY s ORDER BY cnt DESC, term ASC)
          <= {SHARD_SIZE_TA}
),
smin AS (SELECT s, min(cnt) AS last_cnt FROM ret GROUP BY s),
merged AS (
  SELECT term, CAST(sum(cnt) AS BIGINT) AS merged_count FROM ret GROUP BY term
),
top AS (
  SELECT term, merged_count FROM merged
  ORDER BY merged_count DESC, term ASC LIMIT {K_FINAL_TA}
),
bound AS (
  SELECT t.term,
         CAST(sum(CASE WHEN r.term IS NULL THEN m.last_cnt ELSE 0 END)
              AS BIGINT) AS err_upper_bound
  FROM top t CROSS JOIN smin m
  LEFT JOIN ret r ON r.s = m.s AND r.term = t.term
  GROUP BY t.term
),
exact AS (
  SELECT term, CAST(count(*) AS BIGINT) AS exact_count FROM dt GROUP BY term
)
SELECT CAST(row_number() OVER (ORDER BY t.merged_count DESC, t.term ASC)
            AS INT) AS rnk,
       t.term, t.merged_count, e.exact_count,
       CAST(e.exact_count - t.merged_count AS BIGINT) AS underestimate,
       b.err_upper_bound
FROM top t JOIN bound b ON b.term = t.term JOIN exact e ON e.term = t.term
"""

QUERIES["terms_shard_error_eval"] = (terms_shard_error_eval, SQL_TERMS_SHARD_ERROR)


# ------------------------------------------------------------- matrix_stats
# The ES matrix_stats aggregation (the matrix-aggs module the reference's
# OpenSearch backend ships by default): pairwise covariance and correlation
# across numeric fields in ONE pass. Twin over the lineitem numeric tuple
# (quantity units, extendedprice DOLLARS, discount/tax CENTS — units chosen
# so every moment stays in int64 headroom through SF10, see bounds below).
#
# Integer determinism: covariance is SHIFT-INVARIANT, so values are first
# demeaned by the per-field INTEGER mean (one broadcast 1-row pass); the
# demeaned cross-moments are exact int64 sums (|dp| <= ~1e5 dollars =>
# sum(dp^2) <= n*1e10 = 6e17 at SF10). cov_milli then needs only
# truncating SIGNED division, sign-split so Spark DIV (trunc) and DuckDB //
# (floor) agree: both branches divide NONNEGATIVE numerators. Correlation
# converts two already-integer milli-moments through one shared float
# expression (the sqrt micro idiom with mirrored negatives).
#
# Scale shape: one scan computes all 4 + 10 moment sums map-side (a single
# 1-row agg, no shuffle beyond the final combine); the 10 output pair rows
# unpivot from that 1-row frame via one inline explode. Nothing is
# field-count-squared except the bounded 10-element literal array.

_MS_FIELDS = (
    ("quantity", "CAST(l_quantity AS BIGINT)"),
    ("price_usd", "CAST(round(l_extendedprice * 100) AS BIGINT) DIV 100"),
    ("discount_c", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("tax_c", "CAST(round(l_tax * 100) AS BIGINT)"),
)

# Signed truncating division: both operands nonnegative in each branch.
_SDIV = "(CASE WHEN {num} >= 0 THEN ({num}) {div} ({den}) ELSE -((-({num})) {div} ({den})) END)"

# corr from integer milli-moments through one shared float string.
_MS_CORR = (
    "CAST(CASE WHEN {covn} >= 0 "
    "THEN floor({covn} * 1.0e6 / sqrt(CAST({va} AS DOUBLE) * CAST({vb} AS DOUBLE)) + 0.5e0) "
    "ELSE -floor(-({covn}) * 1.0e6 / sqrt(CAST({va} AS DOUBLE) * CAST({vb} AS DOUBLE)) + 0.5e0) "
    "END AS BIGINT)"
)


def _ms_covn_milli(a: str, b: str, div: str) -> str:
    """1000 * n * cov(a, b) from demeaned integer sums (exact up to the two
    truncating divisions): 1000*s_ab - 1000*s_a*s_b/n, |s_a| < n."""
    t2 = _SDIV.format(num=f"1000 * s_{a} * s_{b}", den="n", div=div)
    return f"(1000 * s_{a}_{b} - {t2})"


def es_matrix_stats(spark, sf_dir):
    """(field_a, field_b, n, mean_a_milli, mean_b_milli, cov_milli,
    corr_micro): the ES matrix_stats agg over four lineitem numerics —
    population covariance (milli) and Pearson correlation (micro) for
    every unordered field pair, plus self-pairs (variance rows)."""
    li = load(spark, sf_dir, "lineitem")
    names = [n for n, _ in _MS_FIELDS]
    vals = li.select(
        *[F.expr(e).alias(n) for n, e in _MS_FIELDS]
    )
    means = F.broadcast(
        vals.agg(
            F.count("*").cast("long").alias("n"),
            *[
                F.expr(f"CAST(sum({n}) DIV count(*) AS BIGINT)").alias(f"m_{n}")
                for n in names
            ],
        )
    )
    dm = vals.crossJoin(means).select(
        "n", *[F.expr(f"{n} - m_{n}").alias(f"d_{n}") for n in names],
        *[F.col(f"m_{n}") for n in names],
    )
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i:]]
    agg = dm.groupBy("n", *[f"m_{n}" for n in names]).agg(
        *[F.sum(f"d_{n}").cast("long").alias(f"s_{n}") for n in names],
        *[
            F.sum(F.expr(f"d_{a} * d_{b}")).cast("long").alias(f"s_{a}_{b}")
            for a, b in pairs
        ],
    )
    structs = []
    for a, b in pairs:
        covn = _ms_covn_milli(a, b, "DIV")
        va = _ms_covn_milli(a, a, "DIV")
        vb = _ms_covn_milli(b, b, "DIV")
        structs.append(
            f"struct('{a}' AS field_a, '{b}' AS field_b, n, "
            f"CAST(1000 * m_{a} + {_SDIV.format(num=f'1000 * s_{a}', den='n', div='DIV')} AS BIGINT) AS mean_a_milli, "
            f"CAST(1000 * m_{b} + {_SDIV.format(num=f'1000 * s_{b}', den='n', div='DIV')} AS BIGINT) AS mean_b_milli, "
            f"CAST({_SDIV.format(num=covn, den='n', div='DIV')} AS BIGINT) AS cov_milli, "
            f"{_MS_CORR.format(covn=covn, va=va, vb=vb)} AS corr_micro)"
        )
    return agg.select(
        F.explode(F.expr("array(" + ", ".join(structs) + ")")).alias("r")
    ).select("r.*")


def _sql_matrix_stats() -> str:
    names = [n for n, _ in _MS_FIELDS]
    exprs = {n: e.replace(" DIV ", " // ") for n, e in _MS_FIELDS}
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i:]]
    val_sel = ", ".join(f"{exprs[n]} AS {n}" for n in names)
    mean_sel = ", ".join(
        f"CAST(sum({n}) // count(*) AS BIGINT) AS m_{n}" for n in names
    )
    dm_sel = ", ".join(f"v.{n} - m.m_{n} AS d_{n}" for n in names)
    m_cols = ", ".join(f"m.m_{n}" for n in names)
    s_sel = ", ".join(
        [f"CAST(sum(d_{n}) AS BIGINT) AS s_{n}" for n in names]
        + [f"CAST(sum(d_{a} * d_{b}) AS BIGINT) AS s_{a}_{b}" for a, b in pairs]
    )
    rows = []
    for a, b in pairs:
        covn = _ms_covn_milli(a, b, "//")
        va = _ms_covn_milli(a, a, "//")
        vb = _ms_covn_milli(b, b, "//")
        rows.append(
            f"SELECT '{a}' AS field_a, '{b}' AS field_b, n, "
            f"CAST(1000 * m_{a} + {_SDIV.format(num=f'1000 * s_{a}', den='n', div='//')} AS BIGINT) AS mean_a_milli, "
            f"CAST(1000 * m_{b} + {_SDIV.format(num=f'1000 * s_{b}', den='n', div='//')} AS BIGINT) AS mean_b_milli, "
            f"CAST({_SDIV.format(num=covn, den='n', div='//')} AS BIGINT) AS cov_milli, "
            f"{_MS_CORR.format(covn=covn, va=va, vb=vb)} AS corr_micro FROM s"
        )
    return f"""
WITH vals AS (SELECT {val_sel} FROM lineitem),
m AS (SELECT CAST(count(*) AS BIGINT) AS n, {mean_sel} FROM vals),
dm AS (SELECT m.n, {m_cols}, {dm_sel} FROM vals v CROSS JOIN m),
s AS (
  SELECT n, {', '.join(f'm_{n}' for n in names)}, {s_sel}
  FROM dm GROUP BY n, {', '.join(f'm_{n}' for n in names)}
)
{' UNION ALL '.join(rows)}
"""


QUERIES["es_matrix_stats"] = (es_matrix_stats, _sql_matrix_stats())


# ------------------------------------------------------- moving_fn ewma
# The ES moving_fn EWMA (MovingFunctions.ewma) on the hourly date_histogram
# — the smoother ops dashboards layer over event counts. ES's ewma iterates
# avg = alpha*v + (1-alpha)*avg across the window seeding from its OLDEST
# value; with alpha = 1/4 over an 8-bucket window that recurrence has an
# EXACT integer closed form: scaling by 4^7, the oldest value weighs 3^7
# and lag k in [0..6] weighs 3^k * 4^(6-k) — the weights sum to exactly
# 4^7 = 16384, so ewma_milli = (1000 * weighted_sum) DIV 16384 is
# bit-identical in both engines with NO float anywhere (compare the
# truncated-geometric approximations most ports settle for). Rows emit
# once the window is full, the events_anomaly_zscore convention.
#
# Scale shape: one (type, hour) groupBy + calendar-bounded densification +
# a per-type lag chain over time-bounded partitions — identical cost
# envelope to events_pipeline_aggs.

_EWMA_W = 8  # ES moving_fn window
_EWMA_WEIGHTS = [3**k * 4 ** (6 - k) for k in range(7)] + [3**7]  # lag 0..7


def events_moving_ewma(spark, sf_dir):
    """(event_type, hour_bucket, c, ewma_milli): exact integer ES
    moving_fn EWMA (alpha=1/4, window 8) over densified hourly counts."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour"),
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("event_type", "hour").agg(
        F.count("*").cast("long").alias("c")
    )
    hours = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(b.mn), F.lit(b.mx))).alias("hour"),
        )
    )
    dens = hours.join(counts, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
    )
    wt = W.partitionBy("event_type").orderBy("hour")
    lagged = dens.select(
        "event_type",
        F.col("hour").alias("hour_bucket"),
        "c",
        *[
            F.lag("c", k).over(wt).cast("long").alias(f"l{k}")
            for k in range(1, _EWMA_W)
        ],
    ).filter(F.col("hour_bucket") >= b.mn + _EWMA_W - 1)
    num = " + ".join(
        f"{w} * {'c' if k == 0 else f'l{k}'}" for k, w in enumerate(_EWMA_WEIGHTS)
    )
    return lagged.select(
        "event_type",
        "hour_bucket",
        "c",
        F.expr(f"CAST((1000 * ({num})) DIV {4**7} AS BIGINT)").alias("ewma_milli"),
    )


def _sql_events_moving_ewma() -> str:
    num = " + ".join(
        f"{w} * {'c' if k == 0 else f'l{k}'}"
        for k, w in enumerate(_EWMA_WEIGHTS)
    )
    lags = ",\n         ".join(
        f"CAST(lag(c, {k}) OVER tw AS BIGINT) AS l{k}"
        for k in range(1, _EWMA_W)
    )
    return f"""
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour
  FROM events
),
b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (
  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
),
hours AS (
  SELECT event_type, CAST(h AS BIGINT) AS hour
  FROM (SELECT DISTINCT event_type FROM ev)
  CROSS JOIN (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b) + 1)) AS h)
),
dens AS (
  SELECT hours.event_type, hours.hour, coalesce(counts.c, 0) AS c
  FROM hours LEFT JOIN counts USING (event_type, hour)
),
lagged AS (
  SELECT event_type, hour AS hour_bucket, c,
         {lags}
  FROM dens
  WINDOW tw AS (PARTITION BY event_type ORDER BY hour)
  QUALIFY hour >= (SELECT mn FROM b) + {_EWMA_W - 1}
)
SELECT event_type, hour_bucket, c,
       CAST((1000 * ({num})) // {4**7} AS BIGINT) AS ewma_milli
FROM lagged
"""


QUERIES["events_moving_ewma"] = (events_moving_ewma, _sql_events_moving_ewma())


# ------------------------------------------------------- string_stats

# ES string_stats with show_distribution: per language, length stats plus
# the Shannon entropy (bits) of the character distribution. Characters
# come from a position explode (sequence/range + substring — Spark split
# on '' and DuckDB string_split_regex('') disagree on empties, so neither
# is used). Entropy contributions are rounded to integer micro-bits PER
# CHARACTER — both engines round the same (cnt, tot) integers, so the
# per-lang sum is an exact int64. Scale: the char explode is the token
# explode's shape (map-side-combinable groupBy on (lang, ch)); the
# distribution itself is ≤ |alphabet| rows per language.
_ENT_TERM = (
    "CAST(round(1000000.0e0 * cnt * ln(tot * 1.0e0 / cnt)"
    " / (tot * ln(2.0e0)), 0) AS BIGINT)"
)


def es_string_stats(spark, sf_dir):
    """(lang, n_docs, min_len, max_len, avg_len_milli, total_chars,
    entropy_micro): ES string_stats over documents.text per language —
    entropy is the char-distribution Shannon entropy in micro-bits."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    lens = docs.select("lang", "text", F.length("text").alias("len"))
    doc_stats = lens.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("len").cast("long").alias("min_len"),
        F.max("len").cast("long").alias("max_len"),
        F.sum("len").cast("long").alias("sum_len"),
    )
    chars = lens.select(
        "lang",
        F.explode(F.sequence(F.lit(1), F.col("len"))).alias("i"),
        "text",
    ).select("lang", F.expr("substring(text, i, 1)").alias("ch"))
    dist = chars.groupBy("lang", "ch").agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = dist.groupBy("lang").agg(F.sum("cnt").cast("long").alias("tot"))
    ent = (
        dist.join(F.broadcast(tot), "lang")
        .withColumn("e", F.expr(_ENT_TERM))
        .groupBy("lang")
        .agg(
            F.max("tot").alias("total_chars"),
            F.sum("e").cast("long").alias("entropy_micro"),
        )
    )
    return (
        doc_stats.join(ent, "lang")
        .withColumn(
            "avg_len_milli",
            F.expr("CAST(round(sum_len * 1000.0e0 / n_docs, 0) AS BIGINT)"),
        )
        .select(
            "lang", "n_docs", "min_len", "max_len", "avg_len_milli",
            "total_chars", "entropy_micro",
        )
    )


SQL_STRING_STATS = f"""
WITH lens AS (
  SELECT lang, text, CAST(length(text) AS BIGINT) AS len
  FROM documents WHERE length(text) > 0
),
doc_stats AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(len) AS BIGINT) AS min_len,
         CAST(max(len) AS BIGINT) AS max_len,
         CAST(sum(len) AS BIGINT) AS sum_len
  FROM lens GROUP BY 1
),
chars AS (
  SELECT lang, substring(text, CAST(i AS INT), 1) AS ch
  FROM (
    SELECT lang, text, unnest(range(1, len + 1)) AS i FROM lens
  )
),
dist AS (
  SELECT lang, ch, CAST(count(*) AS BIGINT) AS cnt FROM chars GROUP BY 1, 2
),
tots AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot FROM dist GROUP BY 1),
ent AS (
  SELECT lang, max(tot) AS total_chars,
         CAST(sum({_ENT_TERM}) AS BIGINT) AS entropy_micro
  FROM dist JOIN tots USING (lang) GROUP BY 1
)
SELECT lang, n_docs, min_len, max_len,
       CAST(round(sum_len * 1000.0e0 / n_docs, 0) AS BIGINT) AS avg_len_milli,
       total_chars, entropy_micro
FROM doc_stats JOIN ent USING (lang)
"""

QUERIES["es_string_stats"] = (es_string_stats, SQL_STRING_STATS)


# --------------------------------- median_absolute_deviation + boxplot

# ES boxplot + median_absolute_deviation per event_type, on the DISCRETE
# ceil-rank percentile contract events_percentiles pins (value at rank
# ceil(q·n/100) under the total order (cents asc, event_id asc)) — exact
# integers end to end, no interpolation to diverge on. MAD reuses the
# same discrete median over |c − median| deviations (tie-break event_id).
# Scale: two ranking windows partitioned BY event_type — the partition
# key carries the shuffle; no global ordering anywhere.


def es_mad_boxplot(spark, sf_dir):
    """(event_type, n, min_c, q1_c, med_c, q3_c, max_c, mad_c): discrete
    boxplot + median-absolute-deviation of value cents per event type."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("c"), "event_id"
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("c").asc(), F.col("event_id").asc()
    )
    ranked = ev.select(
        "event_type", "c", "event_id",
        F.row_number().over(w).cast("long").alias("r"),
        F.count("*").over(W.partitionBy("event_type")).cast("long").alias("n"),
    )
    box = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min("c").alias("min_c"),
        F.max(F.when(F.col("r") == F.expr("(n * 25 + 99) DIV 100"), F.col("c"))).alias("q1_c"),
        F.max(F.when(F.col("r") == F.expr("(n * 50 + 99) DIV 100"), F.col("c"))).alias("med_c"),
        F.max(F.when(F.col("r") == F.expr("(n * 75 + 99) DIV 100"), F.col("c"))).alias("q3_c"),
        F.max("c").alias("max_c"),
    )
    dev = ev.join(
        F.broadcast(box.select("event_type", "med_c")), "event_type"
    ).select(
        "event_type", "event_id",
        F.abs(F.col("c") - F.col("med_c")).alias("d"),
    )
    w2 = W.partitionBy("event_type").orderBy(
        F.col("d").asc(), F.col("event_id").asc()
    )
    mad = (
        dev.select(
            "event_type", "d",
            F.row_number().over(w2).cast("long").alias("r"),
            F.count("*").over(W.partitionBy("event_type")).cast("long").alias("n"),
        )
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("r") == F.expr("(n * 50 + 99) DIV 100"), F.col("d"))
            ).alias("mad_c")
        )
    )
    return box.join(mad, "event_type").select(
        "event_type", "n", "min_c", "q1_c", "med_c", "q3_c", "max_c", "mad_c"
    )


SQL_MAD_BOXPLOT = f"""
WITH ev AS (
  SELECT event_type, {sql_cents('value')} AS c, event_id FROM events
),
ranked AS (
  SELECT event_type, c, event_id,
         CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY c ASC, event_id ASC) AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM ev
),
box AS (
  SELECT event_type, max(n) AS n, min(c) AS min_c,
         max(CASE WHEN r = (n * 25 + 99) // 100 THEN c END) AS q1_c,
         max(CASE WHEN r = (n * 50 + 99) // 100 THEN c END) AS med_c,
         max(CASE WHEN r = (n * 75 + 99) // 100 THEN c END) AS q3_c,
         max(c) AS max_c
  FROM ranked GROUP BY event_type
),
dev AS (
  SELECT ev.event_type, ev.event_id, abs(ev.c - box.med_c) AS d
  FROM ev JOIN box USING (event_type)
),
dranked AS (
  SELECT event_type, d,
         CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY d ASC, event_id ASC) AS BIGINT) AS r,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM dev
),
mad AS (
  SELECT event_type,
         max(CASE WHEN r = (n * 50 + 99) // 100 THEN d END) AS mad_c
  FROM dranked GROUP BY event_type
)
SELECT event_type, n, min_c, q1_c, med_c, q3_c, max_c, mad_c
FROM box JOIN mad USING (event_type)
"""

QUERIES["es_mad_boxplot"] = (es_mad_boxplot, SQL_MAD_BOXPLOT)


# ------------------------------------------------------------- t_test

# ES t_test (type=welch) between two event segments. The moments
# (n, Σc, Σc²) are exact int64 from ONE conditional scan; the t statistic
# is ONE shared float-expression string over those six integers — s·s is
# forced to double BEFORE squaring (s * 1.0e0 * s) because Σcents squared
# overflows int64 at ~1e10 rows. Scale: single scan, single output row.
TT_A, TT_B = "purchase", "view"
_TT_MICRO = (
    "CAST(round(1000000.0e0 * ((s1 * 1.0e0 / n1) - (s2 * 1.0e0 / n2))"
    " / sqrt(((q1 - s1 * 1.0e0 * s1 / n1) / (n1 - 1)) / n1"
    " + ((q2 - s2 * 1.0e0 * s2 / n2) / (n2 - 1)) / n2), 0) AS BIGINT)"
)


def es_t_test(spark, sf_dir):
    """(n1, n2, mean1_milli, mean2_milli, t_micro): Welch's t between the
    value distributions of '{purchase}' and '{view}' events."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", cents("value").alias("c")
    )
    a = (F.col("event_type") == TT_A).cast("long")
    b = (F.col("event_type") == TT_B).cast("long")
    mo = ev.agg(
        F.sum(a).cast("long").alias("n1"),
        F.sum(a * F.col("c")).cast("long").alias("s1"),
        F.sum(a * F.col("c") * F.col("c")).cast("long").alias("q1"),
        F.sum(b).cast("long").alias("n2"),
        F.sum(b * F.col("c")).cast("long").alias("s2"),
        F.sum(b * F.col("c") * F.col("c")).cast("long").alias("q2"),
    )
    return mo.select(
        "n1", "n2",
        F.expr("CAST(round(s1 * 1000.0e0 / n1, 0) AS BIGINT)").alias("mean1_milli"),
        F.expr("CAST(round(s2 * 1000.0e0 / n2, 0) AS BIGINT)").alias("mean2_milli"),
        F.expr(_TT_MICRO).alias("t_micro"),
    )


SQL_T_TEST = f"""
WITH mo AS (
  SELECT
    CAST(sum(CASE WHEN event_type = '{TT_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN event_type = '{TT_A}' THEN {sql_cents('value')} ELSE 0 END) AS BIGINT) AS s1,
    CAST(sum(CASE WHEN event_type = '{TT_A}' THEN {sql_cents('value')} * {sql_cents('value')} ELSE 0 END) AS BIGINT) AS q1,
    CAST(sum(CASE WHEN event_type = '{TT_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN event_type = '{TT_B}' THEN {sql_cents('value')} ELSE 0 END) AS BIGINT) AS s2,
    CAST(sum(CASE WHEN event_type = '{TT_B}' THEN {sql_cents('value')} * {sql_cents('value')} ELSE 0 END) AS BIGINT) AS q2
  FROM events
)
SELECT n1, n2,
       CAST(round(s1 * 1000.0e0 / n1, 0) AS BIGINT) AS mean1_milli,
       CAST(round(s2 * 1000.0e0 / n2, 0) AS BIGINT) AS mean2_milli,
       {_TT_MICRO} AS t_micro
FROM mo
"""

QUERIES["es_t_test"] = (es_t_test, SQL_T_TEST)


# ----------------------------------------- bucket_count_ks_test (KS)

# ES bucket_count_ks_test reframed as the exact two-sample
# Kolmogorov-Smirnov statistic between two event segments' value
# distributions: D = max_x |F1(x) − F2(x)| evaluated at every observed
# cents value. Cross-multiplied to integers: D_num = max |ca·nb − cb·na|
# (exact while na·nb < 2^63 — ~3e9 rows per side); ONE division at the
# end. Scale: the cumulative window runs over the DISTINCT cents domain
# (bounded by value cardinality, not row count) — at cluster scale a
# range-partitioned prefix-sum (the two-level token_budget_select shape)
# replaces the single-partition window; at this domain size (≤ ~50k
# distinct cents) one partition is the right plan.
KS_A, KS_B = "purchase", "click"


def events_ks_test(spark, sf_dir):
    """(n_a, n_b, d_num, d_milli, c_at_max): exact two-sample KS distance
    between '{purchase}' and '{click}' value distributions."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin([KS_A, KS_B])
    ).select("event_type", cents("value").alias("c"))
    per = ev.groupBy("c").agg(
        F.sum((F.col("event_type") == KS_A).cast("long")).alias("a"),
        F.sum((F.col("event_type") == KS_B).cast("long")).alias("b"),
    )
    w = W.orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per.select(
        "c",
        F.sum("a").over(w).cast("long").alias("ca"),
        F.sum("b").over(w).cast("long").alias("cb"),
    )
    tots = per.agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
    )
    d = cum.crossJoin(F.broadcast(tots)).withColumn(
        "dnum", F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
    )
    mx = d.agg(F.max("dnum").alias("d_num"))
    at = (
        d.join(F.broadcast(mx), F.col("dnum") == F.col("d_num"))
        .agg(F.min("c").alias("c_at_max"))
    )
    return (
        tots.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(at))
        .select(
            "n_a", "n_b", "d_num",
            F.expr(
                "CAST(round(d_num * 1000.0e0 / (n_a * 1.0e0 * n_b), 0) AS BIGINT)"
            ).alias("d_milli"),
            "c_at_max",
        )
    )


SQL_KS_TEST = f"""
WITH ev AS (
  SELECT event_type, {sql_cents('value')} AS c FROM events
  WHERE event_type IN ('{KS_A}', '{KS_B}')
),
per AS (
  SELECT c,
         CAST(sum(CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM ev GROUP BY c
),
cum AS (
  SELECT c,
         CAST(sum(a) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS BIGINT) AS ca,
         CAST(sum(b) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS BIGINT) AS cb
  FROM per
),
tots AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b FROM per
),
d AS (
  SELECT c, abs(ca * n_b - cb * n_a) AS dnum FROM cum CROSS JOIN tots
),
mx AS (SELECT max(dnum) AS d_num FROM d),
at_ AS (
  SELECT min(c) AS c_at_max FROM d JOIN mx ON d.dnum = mx.d_num
)
SELECT n_a, n_b, d_num,
       CAST(round(d_num * 1000.0e0 / (n_a * 1.0e0 * n_b), 0) AS BIGINT)
         AS d_milli,
       c_at_max
FROM tots CROSS JOIN mx CROSS JOIN at_
"""

QUERIES["events_ks_test"] = (events_ks_test, SQL_KS_TEST)


# ------------------------------------------------- moving_fn Holt linear

# The ES moving_fn double-exponential smoother (MovingFunctions.holt) next
# to events_moving_ewma — level + trend, so it anticipates drift the EWMA
# lags behind. Convention (documented, deterministic): over each full
# 8-bucket window seed level = v0, trend = v1 − v0, then for k = 1..7
#   l_k = α·v_k + (1−α)(l_{k−1} + b_{k−1}),  b_k = β(l_k − l_{k−1}) + (1−β)b_{k−1}
# with α = β = 1/2, and report the one-step forecast l_7 + b_7. Because α
# and β are dyadic, the forecast is an EXACT linear form over the window
# values with integer weights on denominator 2^14 — the weights are
# derived once with exact Fractions at import (no float ever touches the
# recurrence) and the per-row evaluation is one integer dot product. The
# weighted sum can be negative on falling trends, so the milli conversion
# goes through the sign-split _SDIV (floor == trunc only on nonneg).
#
# Scale shape: identical to events_moving_ewma — densified hourly counts,
# one per-type lag chain, map-only arithmetic.

_HOLT_W = 8


def _holt_weights():
    from fractions import Fraction

    alpha = beta = Fraction(1, 2)
    n = _HOLT_W
    # l/b as weight vectors over v_0..v_{n-1}
    l = [Fraction(0)] * n
    b = [Fraction(0)] * n
    l[0] = Fraction(1)
    b[0], b[1] = Fraction(-1), Fraction(1)
    for k in range(1, n):
        lp = list(l)
        l = [(1 - alpha) * (lv + bv) for lv, bv in zip(l, b)]
        l[k] += alpha
        b = [beta * (lv - lpv) + (1 - beta) * bv for lv, lpv, bv in zip(l, lp, b)]
    f = [lv + bv for lv, bv in zip(l, b)]
    den = 2 ** 14
    w = [x * den for x in f]
    assert all(x.denominator == 1 for x in w) and sum(f) == 1
    return [int(x) for x in w], den


_HOLT_WEIGHTS, _HOLT_DEN = _holt_weights()


def events_moving_holt(spark, sf_dir):
    """(event_type, hour_bucket, c, holt_milli): exact integer Holt
    linear (alpha=beta=1/2, window 8) one-step forecast over densified
    hourly counts."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour"),
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("event_type", "hour").agg(
        F.count("*").cast("long").alias("c")
    )
    hours = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(b.mn), F.lit(b.mx))).alias("hour"),
        )
    )
    dens = hours.join(counts, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
    )
    wt = W.partitionBy("event_type").orderBy("hour")
    lagged = dens.select(
        "event_type",
        F.col("hour").alias("hour_bucket"),
        "c",
        *[
            F.lag("c", k).over(wt).cast("long").alias(f"l{k}")
            for k in range(1, _HOLT_W)
        ],
    ).filter(F.col("hour_bucket") >= b.mn + _HOLT_W - 1)
    # weight index i is the window position (oldest first) = lag (W-1-i)
    num = " + ".join(
        f"({w}) * {'c' if (_HOLT_W - 1 - i) == 0 else f'l{_HOLT_W - 1 - i}'}"
        for i, w in enumerate(_HOLT_WEIGHTS)
    )
    return lagged.select(
        "event_type",
        "hour_bucket",
        "c",
        F.expr(
            "CAST("
            + _SDIV.format(num=f"1000 * ({num})", den=_HOLT_DEN, div="DIV")
            + " AS BIGINT)"
        ).alias("holt_milli"),
    )


def _sql_events_moving_holt() -> str:
    num = " + ".join(
        f"({w}) * {'c' if (_HOLT_W - 1 - i) == 0 else f'l{_HOLT_W - 1 - i}'}"
        for i, w in enumerate(_HOLT_WEIGHTS)
    )
    lags = ",\n         ".join(
        f"CAST(lag(c, {k}) OVER tw AS BIGINT) AS l{k}"
        for k in range(1, _HOLT_W)
    )
    return f"""
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour
  FROM events
),
b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (
  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
),
hours AS (
  SELECT event_type, CAST(h AS BIGINT) AS hour
  FROM (SELECT DISTINCT event_type FROM ev)
  CROSS JOIN (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b) + 1)) AS h)
),
dens AS (
  SELECT hours.event_type, hours.hour, coalesce(counts.c, 0) AS c
  FROM hours LEFT JOIN counts USING (event_type, hour)
),
lagged AS (
  SELECT event_type, hour AS hour_bucket, c,
         {lags}
  FROM dens
  WINDOW tw AS (PARTITION BY event_type ORDER BY hour)
)
SELECT event_type, hour_bucket, c,
       CAST({_SDIV.format(num=f"1000 * ({num})", den=_HOLT_DEN, div="//")}
         AS BIGINT) AS holt_milli
FROM lagged
WHERE hour_bucket >= (SELECT mn FROM b) + {_HOLT_W - 1}
"""


QUERIES["events_moving_holt"] = (events_moving_holt, _sql_events_moving_holt())


# ------------------------------------------------- diversified_sampler

# The ES diversified_sampler aggregation: cap documents per dedup-field
# value (here: per source host, max {DS_PER_VALUE}) before running the
# sub-aggregation, so one over-represented host cannot dominate the
# sample's statistics. ES picks the per-value survivors by shard doc
# order (irreproducible); this pins the documented deterministic variant:
# per-source rank by (md5(doc_id), doc_id) — an unbiased salted-hash
# order — keep the first {DS_PER_VALUE}, then a terms sub-agg on lang
# with avg n_chars in exact integer micro.
#
# Scale shape: one source-keyed window top-N (WindowGroupLimit at the
# scan — no global sort), then a tiny lang groupBy. Nothing else.

DS_PER_VALUE = 2


def es_diversified_sampler(spark, sf_dir):
    """(lang, n_sampled, n_sources, avg_chars_micro): terms sub-agg over
    the per-source diversified sample (max {DS_PER_VALUE} docs/source)."""
    docs = load(spark, sf_dir, "documents")
    wsrc = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    sample = docs.withColumn("rn", F.row_number().over(wsrc)).filter(
        F.col("rn") <= DS_PER_VALUE
    )
    return sample.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.expr("CAST(sum(n_chars) * 1000000 DIV count(*) AS BIGINT)").alias(
            "avg_chars_micro"
        ),
    )


SQL_DIVERSIFIED_SAMPLER = f"""
WITH sample AS (
  SELECT * FROM (
    SELECT doc_id, lang, source, n_chars,
           row_number() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
    FROM documents
  ) WHERE rn <= {DS_PER_VALUE}
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(CAST(sum(n_chars) AS BIGINT) * 1000000 // count(*) AS BIGINT)
         AS avg_chars_micro
FROM sample GROUP BY lang
"""

QUERIES["es_diversified_sampler"] = (es_diversified_sampler, SQL_DIVERSIFIED_SAMPLER)


# ------------------------------------------------- Markov absorption

# The funnel question the transition matrix alone can't answer: starting
# from a transient state, what is the probability the user's NEXT
# terminal outcome is a purchase vs an error? Model: 'purchase'/'error'
# are absorbing (their outgoing events are ignored — the user's journey
# ends at the first terminal, documented), the other types are transient,
# and the absorption probabilities A_t(s) = P(s,t) + Σ_{s'} P(s,s')·A_t(s')
# are solved by {ABS_ITERS} UNROLLED fixed-point iterations from A_0 = 0
# — the host_pagerank integer contract: P in exact micro (n·1e6 DIV
# row_total), each update multiply-then-DIV on nonnegative int64, chained
# MATERIALIZED CTEs in the oracle. K iterations compute absorption within
# K steps; both targets ride the same iteration.
#
# Scale shape: the transition matrix is |types|² rows — everything after
# the one user-keyed lag window is broadcast-sized.

ABS_TARGETS = ("purchase", "error")
ABS_ITERS = 6


def events_absorption_prob(spark, sf_dir):
    """(state, n_out, p_purchase_micro, p_error_micro): probability the
    next terminal outcome is purchase/error, per transient state, within
    {ABS_ITERS} steps."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .filter(~F.col("from_type").isin(*ABS_TARGETS))
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    p = pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.expr("CAST(n * 1000000 DIV row_total AS BIGINT)").alias("pm"),
    ).cache()
    states = p.select(F.col("from_type").alias("state")).distinct()
    direct = states
    for t in ABS_TARGETS:
        direct = direct.join(
            p.filter(F.col("to_type") == t).select(
                F.col("from_type").alias("state"), F.col("pm").alias(f"d_{t}")
            ),
            "state",
            "left",
        )
    direct = direct.select(
        "state",
        *[
            F.coalesce(f"d_{t}", F.lit(0)).cast("long").alias(f"d_{t}")
            for t in ABS_TARGETS
        ],
    ).cache()
    a = direct.select(
        "state", *[F.lit(0).cast("long").alias(f"a_{t}") for t in ABS_TARGETS]
    )
    trans = p.filter(~F.col("to_type").isin(*ABS_TARGETS))
    for _ in range(ABS_ITERS):
        rec = (
            trans.join(
                a.select(F.col("state").alias("to_type"),
                         *[F.col(f"a_{t}").alias(f"pa_{t}") for t in ABS_TARGETS]),
                "to_type",
            )
            .groupBy("from_type")
            .agg(
                *[
                    F.expr(f"CAST(sum(pm * pa_{t}) DIV 1000000 AS BIGINT)").alias(
                        f"r_{t}"
                    )
                    for t in ABS_TARGETS
                ]
            )
        )
        a = (
            direct.join(rec.withColumnRenamed("from_type", "state"), "state", "left")
            .select(
                "state",
                *[
                    F.expr(f"CAST(d_{t} + coalesce(r_{t}, 0) AS BIGINT)").alias(
                        f"a_{t}"
                    )
                    for t in ABS_TARGETS
                ],
            )
            .localCheckpoint()
        )
    return (
        tot.withColumnRenamed("from_type", "state")
        .join(a, "state")
        .select(
            "state",
            F.col("row_total").alias("n_out"),
            F.col("a_purchase").alias("p_purchase_micro"),
            F.col("a_error").alias("p_error_micro"),
        )
    )


def _sql_absorption() -> str:
    t0, t1 = ABS_TARGETS
    parts = [
        f"""WITH pairs AS (
  SELECT from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS from_type
    FROM events
  )
  WHERE from_type IS NOT NULL
    AND from_type NOT IN ('{t0}', '{t1}')
  GROUP BY 1, 2
),
tot AS MATERIALIZED (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
  FROM pairs GROUP BY 1
),
p AS MATERIALIZED (
  SELECT from_type, to_type,
         CAST(n * 1000000 // row_total AS BIGINT) AS pm
  FROM pairs JOIN tot USING (from_type)
),
states AS MATERIALIZED (SELECT DISTINCT from_type AS state FROM p),
direct AS MATERIALIZED (
  SELECT s.state,
         CAST(coalesce(p0.pm, 0) AS BIGINT) AS d_{t0},
         CAST(coalesce(p1.pm, 0) AS BIGINT) AS d_{t1}
  FROM states s
  LEFT JOIN p p0 ON p0.from_type = s.state AND p0.to_type = '{t0}'
  LEFT JOIN p p1 ON p1.from_type = s.state AND p1.to_type = '{t1}'
),
trans AS MATERIALIZED (
  SELECT * FROM p WHERE to_type NOT IN ('{t0}', '{t1}')
),
a0 AS MATERIALIZED (
  SELECT state, CAST(0 AS BIGINT) AS a_{t0}, CAST(0 AS BIGINT) AS a_{t1}
  FROM states
)"""
    ]
    for k in range(1, ABS_ITERS + 1):
        parts.append(
            f""",
r{k} AS MATERIALIZED (
  SELECT t.from_type AS state,
         CAST(sum(t.pm * a.a_{t0}) // 1000000 AS BIGINT) AS r_{t0},
         CAST(sum(t.pm * a.a_{t1}) // 1000000 AS BIGINT) AS r_{t1}
  FROM trans t JOIN a{k - 1} a ON a.state = t.to_type
  GROUP BY 1
),
a{k} AS MATERIALIZED (
  SELECT d.state,
         CAST(d.d_{t0} + coalesce(r.r_{t0}, 0) AS BIGINT) AS a_{t0},
         CAST(d.d_{t1} + coalesce(r.r_{t1}, 0) AS BIGINT) AS a_{t1}
  FROM direct d LEFT JOIN r{k} r ON r.state = d.state
)"""
        )
    parts.append(
        f"""
SELECT tot.from_type AS state, tot.row_total AS n_out,
       a.a_{t0} AS p_{t0}_micro, a.a_{t1} AS p_{t1}_micro
FROM tot JOIN a{ABS_ITERS} a ON a.state = tot.from_type"""
    )
    return "".join(parts)


QUERIES["events_absorption_prob"] = (events_absorption_prob, _sql_absorption())


# ----------------------------------------------------------- RFM segments

# Recency-Frequency-Monetary segmentation — the classic behavioral
# rollup (Hughes 1994) a usage-analytics tier derives from the same event
# log. All three metrics are exact integers (recency in seconds against
# the corpus max timestamp, monetary in round-per-row cents); quintile
# scores use ntile(5) over TOTALLY ORDERED frames (metric + user_id
# tie-break), which both engines implement with the same
# floor-bucket-boundary rule, so the scores are engine-identical.
#
# Scale shape: one user groupBy; the three ntile windows run over the
# client-count-sized relation.


def events_rfm_segments(spark, sf_dir):
    """(user_id, recency_s, frequency, monetary_cents, r_q, f_q, m_q,
    rfm_code): RFM quintile segmentation per client."""
    ev = load(spark, sf_dir, "events").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    )
    mx = F.broadcast(ev.agg(F.max("us").alias("mxus")))
    per = (
        ev.groupBy("user_id")
        .agg(
            F.max("us").alias("uus"),
            F.count("*").cast("long").alias("frequency"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
        .crossJoin(mx)
        .select(
            "user_id",
            F.expr("CAST((mxus - uus) DIV 1000000 AS BIGINT)").alias("recency_s"),
            "frequency",
            "monetary_cents",
        )
    )
    wr = W.orderBy(F.col("recency_s").asc(), F.col("user_id").asc())
    wf = W.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    wm = W.orderBy(F.col("monetary_cents").desc(), F.col("user_id").asc())
    scored = (
        per.withColumn("r_q", F.ntile(5).over(wr).cast("long"))
        .withColumn("f_q", F.ntile(5).over(wf).cast("long"))
        .withColumn("m_q", F.ntile(5).over(wm).cast("long"))
    )
    return scored.select(
        "user_id", "recency_s", "frequency", "monetary_cents",
        "r_q", "f_q", "m_q",
        F.expr("CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT)").alias("rfm_code"),
    )


SQL_RFM_SEGMENTS = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch_us(ts)) AS BIGINT) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
mx AS (SELECT max(us) AS mxus FROM ev),
per AS (
  SELECT user_id,
         CAST((mxus - max(us)) // 1000000 AS BIGINT) AS recency_s,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM ev CROSS JOIN mx
  GROUP BY user_id, mxus
),
scored AS (
  SELECT user_id, recency_s, frequency, monetary_cents,
         CAST(ntile(5) OVER (ORDER BY recency_s ASC, user_id ASC) AS BIGINT)
           AS r_q,
         CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) AS BIGINT)
           AS f_q,
         CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id ASC)
           AS BIGINT) AS m_q
  FROM per
)
SELECT user_id, recency_s, frequency, monetary_cents, r_q, f_q, m_q,
       CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm_code
FROM scored
"""

QUERIES["events_rfm_segments"] = (events_rfm_segments, SQL_RFM_SEGMENTS)


# -------------------------------------------------------- SCD2 intervals

# Slowly-Changing-Dimension type 2 from the change log — the warehouse
# shape the reference's harvest-state history would take in a lakehouse:
# per entity (user), collapse CONSECUTIVE equal states into runs, emit one
# row per run with [valid_from, valid_to) microsecond validity and an
# is_current flag on the open run. Run numbering is the standard
# gaps-and-islands prefix sum over the (ts, event_id) total order; all
# timestamps are exact integer µs (unix_micros / epoch_us parity).
#
# Scale shape: two user-keyed windows (lag + running sum) and one run
# groupBy — one shuffle on the entity key, the sessionizer envelope.


def events_scd2_intervals(spark, sf_dir):
    """(user_id, version, state, valid_from_us, valid_to_us, is_current):
    type-2 validity intervals of each user's event_type state."""
    ev = load(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_id",
        "event_type AS state",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "chg",
        (
            F.coalesce(
                (F.lag("state").over(w) != F.col("state")).cast("long"), F.lit(1)
            )
        ),
    )
    wc = W.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    runs = marked.withColumn("version", F.sum("chg").over(wc).cast("long"))
    per_run = runs.groupBy("user_id", "version").agg(
        F.min_by("state", F.struct(F.col("us"), F.col("event_id"))).alias("state"),
        F.min("us").cast("long").alias("valid_from_us"),
    )
    wl = W.partitionBy("user_id").orderBy("version")
    return per_run.select(
        "user_id",
        "version",
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(wl).cast("long").alias("valid_to_us"),
        F.lead("valid_from_us").over(wl).isNull().cast("long").alias("is_current"),
    )


SQL_SCD2_INTERVALS = """
WITH ev AS (
  SELECT user_id, event_id, event_type AS state,
         CAST(floor(epoch_us(ts)) AS BIGINT) AS us
  FROM events
),
marked AS (
  SELECT user_id, event_id, state, us,
         CASE WHEN lag(state) OVER w IS DISTINCT FROM state THEN 1 ELSE 0 END
           AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
runs AS (
  SELECT user_id, state, us,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS version
  FROM marked
),
per_run AS (
  SELECT user_id, version, min(state) AS state,
         CAST(min(us) AS BIGINT) AS valid_from_us
  FROM runs GROUP BY 1, 2
)
SELECT user_id, version, state, valid_from_us,
       CAST(lead(valid_from_us) OVER wl AS BIGINT) AS valid_to_us,
       CAST((lead(valid_from_us) OVER wl IS NULL) AS BIGINT) AS is_current
FROM per_run
WINDOW wl AS (PARTITION BY user_id ORDER BY version)
"""

QUERIES["events_scd2_intervals"] = (events_scd2_intervals, SQL_SCD2_INTERVALS)


# --------------------------------- serial_diff + cumulative_cardinality

# The two pipeline aggregations missing from events_pipeline_aggs'
# cumulative_sum/derivative/moving_fn set: ES `serial_diff` (lag-k
# differencing — here lag 7 over the DAILY histogram, the
# week-over-week seasonality remover) and `cumulative_cardinality`
# (running distinct-user count). Cumulative cardinality is computed
# EXACTLY without any running distinct state: a user contributes 1 on
# their FIRST-SEEN day only (min-day per user), and the running sum of
# first-seen counts IS the cumulative cardinality — the standard
# first-touch rewrite that turns an O(n·days) distinct window into one
# groupBy + one prefix sum. Days are densified (min_doc_count: 0) so the
# lag-7 difference is calendar-true.
#
# Scale shape: one user groupBy (first-seen), two day groupBys, one
# day-ordered window over the day-count-sized frame.

SD_LAG = 7


def events_serial_diff_ccard(spark, sf_dir):
    """(day_bucket, n_events, serial_diff_7, cum_users): daily histogram
    with lag-{SD_LAG} serial difference and exact cumulative user
    cardinality."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    )
    daily = ev.groupBy("day").agg(F.count("*").cast("long").alias("n_events"))
    span = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = span.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("fday"))
    newu = first.groupBy(F.col("fday").alias("day")).agg(
        F.count("*").cast("long").alias("new_users")
    )
    dens = (
        grid.join(daily, "day", "left")
        .join(newu, "day", "left")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
        )
    )
    wd = W.orderBy("day")
    wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return dens.select(
        F.col("day").alias("day_bucket"),
        "n_events",
        (F.col("n_events") - F.lag("n_events", SD_LAG).over(wd))
        .cast("long")
        .alias("serial_diff_7"),
        F.sum("new_users").over(wc).cast("long").alias("cum_users"),
    )


SQL_SERIAL_DIFF_CCARD = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events
),
daily AS (SELECT day, CAST(count(*) AS BIGINT) AS n_events FROM ev GROUP BY 1),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
grid AS (
  SELECT CAST(d AS BIGINT) AS day
  FROM (SELECT unnest(range((SELECT lo FROM span), (SELECT hi FROM span) + 1)) AS d)
),
firstd AS (SELECT user_id, min(day) AS fday FROM ev GROUP BY user_id),
newu AS (
  SELECT fday AS day, CAST(count(*) AS BIGINT) AS new_users
  FROM firstd GROUP BY 1
),
dens AS (
  SELECT grid.day, coalesce(daily.n_events, 0) AS n_events,
         coalesce(newu.new_users, 0) AS new_users
  FROM grid LEFT JOIN daily USING (day) LEFT JOIN newu USING (day)
)
SELECT day AS day_bucket,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_events - lag(n_events, {SD_LAG}) OVER (ORDER BY day) AS BIGINT)
         AS serial_diff_7,
       CAST(sum(new_users) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM dens
"""

QUERIES["events_serial_diff_ccard"] = (
    events_serial_diff_ccard,
    SQL_SERIAL_DIFF_CCARD,
)


# ------------------------------------------------------ top session paths

# Top user journeys — the product-analytics rollup over sessionized
# traffic ("what do the first four steps of a session look like?").
# Sessions split on the repo's {TP_GAP_S}-second gap contract (the
# events_sessionize convention: ts + event_id total order); the path key
# is the first {TP_STEPS} event types joined positionally via
# NULL-skipping concat_ws (identical semantics both engines — no
# order-unstable array_agg anywhere). Share is exact milli of the session
# total.
#
# Scale shape: one user-keyed window chain (gap flag → session prefix
# sum → step rank), one (user, session) groupBy building fixed slot
# columns (max-of-case — combinable), one path groupBy, TakeOrdered tail.

TP_GAP_S = 1800
TP_STEPS = 4
TP_K = 15


def events_top_paths(spark, sf_dir):
    """(rank, path, n_sessions, share_milli): top-{TP_K} session-opening
    paths (first {TP_STEPS} steps)."""
    ev = load(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_id",
        "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.coalesce(
            (F.col("us") - F.lag("us").over(w) > TP_GAP_S * 1_000_000).cast("long"),
            F.lit(1),
        ),
    )
    wc = W.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = flagged.withColumn("sid", F.sum("new_s").over(wc).cast("long"))
    ws = W.partitionBy("user_id", "sid").orderBy("us", "event_id")
    steps = sess.withColumn("step", F.row_number().over(ws)).filter(
        F.col("step") <= TP_STEPS
    )
    slots = steps.groupBy("user_id", "sid").agg(
        *[
            F.max(F.when(F.col("step") == k, F.col("event_type"))).alias(f"e{k}")
            for k in range(1, TP_STEPS + 1)
        ]
    )
    paths = slots.select(
        F.concat_ws(">", *[f"e{k}" for k in range(1, TP_STEPS + 1)]).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    tot = F.broadcast(counts.agg(F.sum("n_sessions").cast("long").alias("t")))
    scored = counts.crossJoin(tot).withColumn(
        "share_milli", F.expr("CAST(n_sessions * 1000 DIV t AS BIGINT)")
    )
    top = scored.orderBy(F.col("n_sessions").desc(), F.col("path").asc()).limit(
        TP_K
    )
    wr = W.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "path", "n_sessions", "share_milli"
    )


SQL_TOP_PATHS = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch_us(ts)) AS BIGINT) AS us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, event_type, us,
         CASE WHEN us - lag(us) OVER w > {TP_GAP_S * 1_000_000}
              OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, us,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS sid
  FROM flagged
),
steps AS (
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY us, event_id) AS step
  FROM sess
  QUALIFY step <= {TP_STEPS}
),
slots AS (
  SELECT user_id, sid,
         {", ".join(
            f"max(CASE WHEN step = {k} THEN event_type END) AS e{k}"
            for k in range(1, TP_STEPS + 1)
         )}
  FROM steps GROUP BY 1, 2
),
counts AS (
  SELECT concat_ws('>', {", ".join(f"e{k}" for k in range(1, TP_STEPS + 1))})
           AS path,
         CAST(count(*) AS BIGINT) AS n_sessions
  FROM slots GROUP BY 1
),
tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS t FROM counts)
SELECT CAST(row_number() OVER (
         ORDER BY n_sessions DESC, path ASC) AS INT) AS rank,
       path, n_sessions,
       CAST(n_sessions * 1000 // t AS BIGINT) AS share_milli
FROM counts CROSS JOIN tot
ORDER BY rank LIMIT {TP_K}
"""

QUERIES["events_top_paths"] = (events_top_paths, SQL_TOP_PATHS)


# ------------------------------------------------------- Benford audit

# Benford's-law first-digit audit of the value column — the classic
# forensic data-quality gate a warehouse runs on monetary fields
# (fabricated or truncated feeds break the log-uniform digit law).
# Expected shares are integer MILLI literals precomputed from
# log10(1 + 1/d) (identical constants in both engines — no runtime
# transcendental); the statistic is Pearson's chi² in milli with every
# step integer: per digit (1000·o − N·p_milli)² DIV (N·p_milli) — the
# 1000² numerator scale against the 1000 denominator scale nets ×1000.
# On this corpus the value field IS Benford-like (log-spread positive
# doubles), so the audit is a positive control: chi²/8 df must land
# far below the fabricated-data regime (test-pinned).
#
# Scale shape: one map (first digit of integer cents) + 9-row groupBy.

_BENFORD_MILLI = {
    d: round(__import__("math").log10(1 + 1 / d) * 1000) for d in range(1, 10)
}


def events_benford(spark, sf_dir):
    """(digit, n_obs, obs_share_milli, expected_milli, chi2_milli):
    first-digit distribution of positive values vs Benford's law."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select(
            F.expr(
                "CAST(substring(CAST(CAST(round(value * 100) AS BIGINT)"
                " AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit")
        )
    )
    obs = ev.groupBy("digit").agg(F.count("*").cast("long").alias("n_obs"))
    exp = spark.createDataFrame(
        [(d, p) for d, p in sorted(_BENFORD_MILLI.items())],
        "digit long, expected_milli long",
    )
    tot = F.broadcast(obs.agg(F.sum("n_obs").cast("long").alias("n")))
    j = (
        F.broadcast(exp)
        .join(obs, "digit", "left")
        .crossJoin(tot)
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            "expected_milli",
            "n",
        )
    )
    chi = F.broadcast(
        j.agg(
            F.expr(
                "CAST(sum((1000 * n_obs - n * expected_milli)"
                " * (1000 * n_obs - n * expected_milli)"
                " DIV (n * expected_milli)) AS BIGINT)"
            ).alias("chi2_milli")
        )
    )
    return j.crossJoin(chi).select(
        "digit",
        "n_obs",
        F.expr("CAST(n_obs * 1000 DIV n AS BIGINT)").alias("obs_share_milli"),
        "expected_milli",
        "chi2_milli",
    )


def _sql_benford() -> str:
    evals = ", ".join(f"({d}, {p})" for d, p in sorted(_BENFORD_MILLI.items()))
    return f"""
WITH ev AS (
  SELECT CAST(substring(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM events WHERE value > 0
),
obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM ev GROUP BY 1),
exp AS (SELECT * FROM (VALUES {evals}) e(digit, expected_milli)),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
j AS (
  SELECT exp.digit, CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs,
         CAST(exp.expected_milli AS BIGINT) AS expected_milli, n
  FROM exp LEFT JOIN obs ON obs.digit = exp.digit CROSS JOIN tot
),
chi AS (
  SELECT CAST(sum((1000 * n_obs - n * expected_milli)
              * (1000 * n_obs - n * expected_milli)
              // (n * expected_milli)) AS BIGINT) AS chi2_milli
  FROM j
)
SELECT digit, n_obs,
       CAST(n_obs * 1000 // n AS BIGINT) AS obs_share_milli,
       expected_milli, chi2_milli
FROM j CROSS JOIN chi
"""


QUERIES["events_benford"] = (events_benford, _sql_benford())


# --------------------------------------------------- seasonality ANOVA

# Hour-of-day seasonality strength: one-way ANOVA R² — the share of
# hourly-count variance explained by the 24-slot time-of-day profile.
# This is the diagnostic that decides whether a forecaster needs a
# seasonal component at all. Integer end to end via milli-scaled
# quadratic forms: A = Σ_g S_g²·1000 DIV n_g, B = S²·1000 DIV N,
# C = 1000·Σx² ⇒ r² = (A−B)/(C−B) (greatest-0 guarded — the per-group
# truncation can dip A a hair under B on perfectly flat data). The
# synthetic log is time-UNIFORM, so the honest answer is ≈ 0: the
# operator is the negative control proving the statistic doesn't
# hallucinate seasonality (test-pinned small), with the peak-hour row
# riding along.
#
# Scale shape: densified hourly histogram (the pipeline-aggs grid), one
# 24-group agg, one scalar agg. Overflow: S²·1000 < int64 needs total
# events per type < 3e7 per the milli scale — the per-type daily-volume
# envelope; shard by (type, week) beyond that (documented).


def events_seasonality_r2(spark, sf_dir):
    """(event_type, n_buckets, r2_milli, peak_hour, peak_mean_milli):
    hour-of-day ANOVA seasonality strength per event type."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour"),
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("event_type", "hour").agg(
        F.count("*").cast("long").alias("c")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(b.mn), F.lit(b.mx))).alias("hour"),
        )
    )
    dens = grid.join(counts, ["event_type", "hour"], "left").select(
        "event_type",
        F.expr("hour % 24").cast("long").alias("hod"),
        F.coalesce("c", F.lit(0)).cast("long").alias("c"),
    )
    g = dens.groupBy("event_type", "hod").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("c").cast("long").alias("sg"),
    )
    ga = g.groupBy("event_type").agg(
        F.sum(F.expr("(sg * sg * 1000) DIV ng")).cast("long").alias("a"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("ng").cast("long").alias("n"),
        F.expr(
            "max_by(hod, ((sg * 1000) DIV ng) * 100 - hod)"
        ).alias("peak_hour"),
        F.max(F.expr("(sg * 1000) DIV ng")).cast("long").alias("peak_mean_milli"),
    )
    c2 = dens.groupBy("event_type").agg(
        (F.sum(F.col("c") * F.col("c")) * 1000).cast("long").alias("cc")
    )
    return (
        ga.join(c2, "event_type")
        .withColumn("bterm", F.expr("(s * s * 1000) DIV n"))
        .select(
            "event_type",
            F.col("n").alias("n_buckets"),
            F.expr(
                "CAST(greatest(a - bterm, 0) * 1000"
                " DIV greatest(cc - bterm, 1) AS BIGINT)"
            ).alias("r2_milli"),
            F.col("peak_hour").cast("long").alias("peak_hour"),
            "peak_mean_milli",
        )
    )


SQL_SEASONALITY_R2 = """
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour
  FROM events
),
b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (
  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
),
grid AS (
  SELECT event_type, CAST(h AS BIGINT) AS hour
  FROM (SELECT DISTINCT event_type FROM ev)
  CROSS JOIN (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b) + 1)) AS h)
),
dens AS (
  SELECT grid.event_type, grid.hour % 24 AS hod, coalesce(counts.c, 0) AS c
  FROM grid LEFT JOIN counts USING (event_type, hour)
),
g AS (
  SELECT event_type, hod, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(c) AS BIGINT) AS sg
  FROM dens GROUP BY 1, 2
),
ga AS (
  SELECT event_type,
         CAST(sum((sg * sg * 1000) // ng) AS BIGINT) AS a,
         CAST(sum(sg) AS BIGINT) AS s,
         CAST(sum(ng) AS BIGINT) AS n,
         CAST(max_by(hod, ((sg * 1000) // ng) * 100 - hod) AS BIGINT) AS peak_hour,
         CAST(max((sg * 1000) // ng) AS BIGINT) AS peak_mean_milli
  FROM g GROUP BY 1
),
c2 AS (
  SELECT event_type, CAST(sum(c * c) * 1000 AS BIGINT) AS cc
  FROM dens GROUP BY 1
)
SELECT ga.event_type AS event_type, n AS n_buckets,
       CAST(greatest(a - (s * s * 1000) // n, 0) * 1000
            // greatest(cc - (s * s * 1000) // n, 1) AS BIGINT) AS r2_milli,
       peak_hour, peak_mean_milli
FROM ga JOIN c2 ON c2.event_type = ga.event_type
"""

QUERIES["events_seasonality_r2"] = (events_seasonality_r2, SQL_SEASONALITY_R2)


# -------------------------------------------------- SLO burn-rate alerts

# Multi-window multi-burn-rate SLO alerting (the Google SRE Workbook ch.5
# policy — the alert rule an ops tier derives from the same event
# stream): with an error-budget of {SLO_MILLI} milli (error share the
# service may spend), the burn rate is observed-share/budget, and an
# alert fires only when BOTH the fast {SLO_SHORT_H}h window and the slow
# {SLO_LONG_H}h window burn ≥ {SLO_BURN_MILLI} milli — the dual-window
# AND is what kills flappy single-window pages (this corpus: 204 hourly
# alerts collapse to 43 sustained ones at sf0.01; split test-pinned).
# All integer: the threshold comparison is cross-multiplied
# (bad·1e6 ≥ T·budget·tot), so no division exists anywhere in the alert
# predicate; the reported burn ratios are milli via guarded DIV.
#
# Scale shape: densified hourly histogram + two frame windows over the
# bucket-count-sized relation — the events_moving_* envelope.

SLO_MILLI = 200  # error-budget share (milli)
SLO_BURN_MILLI = 1300  # alert threshold: 1.3x budget burn
SLO_SHORT_H = 1
SLO_LONG_H = 6


def events_slo_burn(spark, sf_dir):
    """(hour_bucket, tot_1h, bad_1h, burn_short_milli, burn_long_milli,
    alert): dual-window SLO burn-rate alerting over hourly error shares."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour"),
        (F.col("event_type") == "error").cast("long").alias("bad"),
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    hb = ev.groupBy("hour").agg(
        F.count("*").cast("long").alias("tot"),
        F.sum("bad").cast("long").alias("bad"),
    )
    grid = spark.range(b.mn, b.mx + 1).select(F.col("id").alias("hour"))
    dens = grid.join(hb, "hour", "left").select(
        "hour",
        F.coalesce("tot", F.lit(0)).cast("long").alias("tot"),
        F.coalesce("bad", F.lit(0)).cast("long").alias("bad"),
    )
    w6 = W.orderBy("hour").rowsBetween(-(SLO_LONG_H - 1), 0)
    roll = dens.withColumn("t6", F.sum("tot").over(w6).cast("long")).withColumn(
        "b6", F.sum("bad").over(w6).cast("long")
    )
    alert = (
        f"CASE WHEN tot > 0"
        f" AND bad * 1000000 >= {SLO_BURN_MILLI} * {SLO_MILLI} * tot"
        f" AND b6 * 1000000 >= {SLO_BURN_MILLI} * {SLO_MILLI} * t6"
        f" THEN 1 ELSE 0 END"
    )
    return roll.select(
        F.col("hour").alias("hour_bucket"),
        F.col("tot").alias("tot_1h"),
        F.col("bad").alias("bad_1h"),
        F.expr(
            f"CAST(bad * 1000000 DIV ({SLO_MILLI} * greatest(tot, 1))"
            " AS BIGINT)"
        ).alias("burn_short_milli"),
        F.expr(
            f"CAST(b6 * 1000000 DIV ({SLO_MILLI} * greatest(t6, 1))"
            " AS BIGINT)"
        ).alias("burn_long_milli"),
        F.expr(f"CAST({alert} AS BIGINT)").alias("alert"),
    )


SQL_SLO_BURN = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
         CAST(event_type = 'error' AS BIGINT) AS bad
  FROM events
),
hb AS (
  SELECT hour, CAST(count(*) AS BIGINT) AS tot, CAST(sum(bad) AS BIGINT) AS bad
  FROM ev GROUP BY 1
),
b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM hb),
grid AS (
  SELECT CAST(h AS BIGINT) AS hour
  FROM (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b) + 1)) AS h)
),
dens AS (
  SELECT grid.hour, coalesce(tot, 0) AS tot, coalesce(bad, 0) AS bad
  FROM grid LEFT JOIN hb USING (hour)
),
roll AS (
  SELECT hour, tot, bad,
         CAST(sum(tot) OVER w6 AS BIGINT) AS t6,
         CAST(sum(bad) OVER w6 AS BIGINT) AS b6
  FROM dens
  WINDOW w6 AS (ORDER BY hour
                ROWS BETWEEN {SLO_LONG_H - 1} PRECEDING AND CURRENT ROW)
)
SELECT hour AS hour_bucket,
       tot AS tot_1h, bad AS bad_1h,
       CAST(bad * 1000000 // ({SLO_MILLI} * greatest(tot, 1)) AS BIGINT)
         AS burn_short_milli,
       CAST(b6 * 1000000 // ({SLO_MILLI} * greatest(t6, 1)) AS BIGINT)
         AS burn_long_milli,
       CAST(CASE WHEN tot > 0
            AND bad * 1000000 >= {SLO_BURN_MILLI} * {SLO_MILLI} * tot
            AND b6 * 1000000 >= {SLO_BURN_MILLI} * {SLO_MILLI} * t6
            THEN 1 ELSE 0 END AS BIGINT) AS alert
FROM roll
"""

QUERIES["events_slo_burn"] = (events_slo_burn, SQL_SLO_BURN)


# --------------------------------------------------- forecast backtest

# The backtest that justifies (or indicts) a smoother: events_moving_holt
# forecasts hour t+1 from window [t-7, t]; this operator joins each
# forecast to the REALIZED next-hour count and reports per-type MAE in
# milli, next to the persistence baseline (predict tomorrow = today —
# the bar every forecaster must clear). Errors are exact integer
# |holt_milli − 1000·actual|; means are integer floor-divisions. No
# winner is asserted: on time-uniform traffic persistence is strong, and
# the HONEST comparison is the product (the guard pins accounting, not a
# victory).
#
# Scale shape: the Holt relation (bucket-count-sized) + one lead window
# + one per-type agg.


def events_forecast_eval(spark, sf_dir):
    """(event_type, n_eval, mae_holt_milli, mae_naive_milli): one-step
    backtest of the Holt forecast vs persistence."""
    holt = events_moving_holt(spark, sf_dir)
    wt = W.partitionBy("event_type").orderBy("hour_bucket")
    j = holt.withColumn("nxt", F.lead("c").over(wt)).filter(
        F.col("nxt").isNotNull()
    )
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.expr(
            "CAST(sum(abs(holt_milli - 1000 * nxt)) DIV count(*) AS BIGINT)"
        ).alias("mae_holt_milli"),
        F.expr(
            "CAST(sum(abs(1000 * c - 1000 * nxt)) DIV count(*) AS BIGINT)"
        ).alias("mae_naive_milli"),
    )


SQL_FORECAST_EVAL = f"""
WITH holt AS ({_sql_events_moving_holt()}),
j AS (
  SELECT event_type, c, holt_milli,
         lead(c) OVER (PARTITION BY event_type ORDER BY hour_bucket) AS nxt
  FROM holt
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(abs(holt_milli - 1000 * nxt)) // count(*) AS BIGINT)
         AS mae_holt_milli,
       CAST(sum(abs(1000 * c - 1000 * nxt)) // count(*) AS BIGINT)
         AS mae_naive_milli
FROM j WHERE nxt IS NOT NULL
GROUP BY event_type
"""

QUERIES["events_forecast_eval"] = (events_forecast_eval, SQL_FORECAST_EVAL)


# ------------------------------------------------------ CUPED A/B test

# CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013) — the
# experimentation-platform workhorse: adjust each user's experiment-
# period metric by their PRE-period covariate, y' = y − θ(x − x̄), with
# θ = cov(x,y)/var(x), shrinking metric variance without bias. Here the
# log's first {CUPED_SPLIT_DAY} days are the pre-period, the rest the
# experiment; the metric is per-user value cents; arms are the
# deterministic md5 split. Everything integer: moments are exact cents,
# θ is micro via sign-split division, adjustments are micro products;
# the reported per-arm variance-reduction ratio must be computed on the
# SAME integer adjusted values in both engines.
#
# Scale shape: two per-user aggs (pre/exp) + one join + three scalar
# aggs — user-count-sized after the first groupBy.
# Overflow: |θ_micro| ≤ ~1e7 here, x cents ≤ ~5e4·days ⇒ θ·x ≤ 1e12;
# variance sums need (Σy')² < int64 ⇒ variances are computed on
# CENTS-scale adjusted values (milli-cents DIV 1000, sign-split) —
# squares stay ≤ ~1e14 per arm at this SF (bound documented).

CUPED_SPLIT_DAY = 15


# CUPED shared expression strings (engine + oracle twins).
# Floored sign-split centering: d{v} = {v} − floor-div(s{v}, n).
_CU_D = (
    "CAST({v} - (CASE WHEN {s} >= 0 THEN {s} {div} n"
    " ELSE -((-({s})) {div} n) END) AS BIGINT)"
)
# theta_micro = round-toward-zero-floor(cnum·1e6 / cden) via exact two-step
# long division (q1·1000 + r1·1000 DIV cden with q1 = |cnum|·1000 DIV cden):
# |cnum|·1000 and r1·1000 (< cden·1000) stay in int64 for cden ≤ 9e15.
_CU_THETA = (
    "CAST(CASE WHEN cnum >= 0"
    " THEN ((cnum * 1000) {div} cden) * 1000"
    "  + ((cnum * 1000 - ((cnum * 1000) {div} cden) * cden) * 1000)"
    "    {div} cden"
    " ELSE -( ((-cnum * 1000) {div} cden) * 1000"
    "  + ((-cnum * 1000 - ((-cnum * 1000) {div} cden) * cden) * 1000)"
    "    {div} cden )"
    " END AS BIGINT)"
)
# adjusted metric in MILLI-cents: y·1000 − theta_micro·dx/1000 (sign-split
# on the product, |th·dx| ≈ 1e6·(user cents scale) ≪ int64)
_CU_ADJ = (
    "CAST(y * 1000 - (CASE WHEN th * dx >= 0 THEN (th * dx) {div} 1000"
    " ELSE -((-(th * dx)) {div} 1000) END) AS BIGINT)"
)


def events_cuped_abtest(spark, sf_dir):
    """(arm, n_users, mean_cents_milli, cuped_mean_cents_milli,
    var_plain_milli2, var_cuped_milli2, var_reduction_milli): per-arm
    CUPED-adjusted experiment metric and variance reduction."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    d0 = ev.agg(F.min("day").alias("d0")).collect()[0]["d0"]
    split = d0 + CUPED_SPLIT_DAY
    pre = ev.filter(F.col("day") < split).groupBy("user_id").agg(
        F.sum("cents").cast("long").alias("x")
    )
    exp = ev.filter(F.col("day") >= split).groupBy("user_id").agg(
        F.sum("cents").cast("long").alias("y")
    )
    u = (
        pre.join(exp, "user_id", "full")
        .select(
            "user_id",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
        .withColumn(
            "arm",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("ab"), F.col("user_id").cast("string"))),
                        1,
                        14,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ),
        )
        .cache()
    )
    mom = F.broadcast(
        u.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
        )
    )
    # Centered moments with FLOORED (sign-split) means — the sf0.1 sweep
    # caught the uncentered cross-multiplied form overflowing: the old
    # (n·sxy − sx·sy)·1e6 slope numerator carries an extra factor of n and
    # crossed int64 at ~1.5k users (−5.3e19 measured). Centering on
    # sx DIV n / sy DIV n keeps |dx| at per-user scale, so cnum = Σdx·dy
    # and cden = Σdx² grow like n·(user scale)², good to ~4e6 users; the
    # ×1e6 slope scale is applied by EXACT two-step long division (the
    # rbo_micro idiom), never as one product.
    cent = (
        u.crossJoin(mom)
        .withColumn("dx", F.expr(_CU_D.format(v="x", s="sx", div="DIV")))
        .withColumn("dy", F.expr(_CU_D.format(v="y", s="sy", div="DIV")))
    )
    mom2 = F.broadcast(
        cent.agg(
            F.sum(F.col("dx") * F.col("dy")).cast("long").alias("cnum"),
            F.greatest(
                F.sum(F.col("dx") * F.col("dx")).cast("long"), F.lit(1)
            ).cast("long").alias("cden"),
        )
    )
    withadj = (
        cent.crossJoin(mom2)
        .withColumn("th", F.expr(_CU_THETA.format(div="DIV")))
        .withColumn("ym", F.expr("CAST(y * 1000 AS BIGINT)"))
        .withColumn("ya", F.expr(_CU_ADJ.format(div="DIV")))
        .withColumn("yc", F.expr("CAST(y AS BIGINT)"))
        .withColumn(
            "yac",
            F.expr(
                "CAST(CASE WHEN ya >= 0 THEN ya DIV 1000"
                " ELSE -((-ya) DIV 1000) END AS BIGINT)"
            ),
        )
    )
    per = withadj.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.expr("CAST(sum(ym) DIV count(*) AS BIGINT)").alias("mean_cents_milli"),
        F.expr("CAST(sum(ya) DIV count(*) AS BIGINT)").alias(
            "cuped_mean_cents_milli"
        ),
        F.expr(
            "CAST((count(*) * sum(yc * yc) - sum(yc) * sum(yc))"
            " DIV (count(*) * count(*)) AS BIGINT)"
        ).alias("var_plain_c2"),
        F.expr(
            "CAST((count(*) * sum(yac * yac) - sum(yac) * sum(yac))"
            " DIV (count(*) * count(*)) AS BIGINT)"
        ).alias("var_cuped_c2"),
    )
    return per.withColumn(
        "var_reduction_milli",
        F.expr(
            "CAST(var_cuped_c2 * 1000"
            " DIV greatest(var_plain_c2, CAST(1 AS BIGINT)) AS BIGINT)"
        ),
    ).select(
        "arm", "n_users", "mean_cents_milli", "cuped_mean_cents_milli",
        "var_plain_c2", "var_cuped_c2", "var_reduction_milli",
    )


def _sql_cuped() -> str:
    d_x = _CU_D.format(v="x", s="sx", div="//")
    d_y = _CU_D.format(v="y", s="sy", div="//")
    theta = _CU_THETA.format(div="//")
    adj = _CU_ADJ.format(div="//")
    return f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
d0 AS (SELECT min(day) AS d0 FROM ev),
pre AS (
  SELECT user_id, CAST(sum(cents) AS BIGINT) AS x FROM ev
  WHERE day < (SELECT d0 FROM d0) + {CUPED_SPLIT_DAY} GROUP BY 1
),
expp AS (
  SELECT user_id, CAST(sum(cents) AS BIGINT) AS y FROM ev
  WHERE day >= (SELECT d0 FROM d0) + {CUPED_SPLIT_DAY} GROUP BY 1
),
u AS MATERIALIZED (
  SELECT coalesce(pre.user_id, expp.user_id) AS user_id,
         CAST(coalesce(x, 0) AS BIGINT) AS x,
         CAST(coalesce(y, 0) AS BIGINT) AS y,
         CAST(('0x' || substr(md5('ab' ||
           CAST(coalesce(pre.user_id, expp.user_id) AS VARCHAR)), 1, 14))
           AS BIGINT) % 2 AS arm
  FROM pre FULL OUTER JOIN expp ON pre.user_id = expp.user_id
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy
  FROM u
),
cent AS MATERIALIZED (
  SELECT arm, x, y, {d_x} AS dx, {d_y} AS dy
  FROM u CROSS JOIN mom
),
mom2 AS (
  SELECT CAST(sum(dx * dy) AS BIGINT) AS cnum,
         CAST(greatest(sum(dx * dx), 1) AS BIGINT) AS cden
  FROM cent
),
withadj AS (
  SELECT arm, ym, ya, CAST(ym // 1000 AS BIGINT) AS yc,
         CAST(CASE WHEN ya >= 0 THEN ya // 1000
              ELSE -((-ya) // 1000) END AS BIGINT) AS yac
  FROM (
  SELECT arm, ym, {adj} AS ya FROM (
    SELECT arm, dx, y, CAST(y * 1000 AS BIGINT) AS ym, {theta} AS th
    FROM cent CROSS JOIN mom2
  ))
),
per AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(ym) // count(*) AS BIGINT) AS mean_cents_milli,
         CAST(sum(ya) // count(*) AS BIGINT) AS cuped_mean_cents_milli,
         CAST((count(*) * sum(yc * yc) - sum(yc) * sum(yc))
              // (count(*) * count(*)) AS BIGINT) AS var_plain_c2,
         CAST((count(*) * sum(yac * yac) - sum(yac) * sum(yac))
              // (count(*) * count(*)) AS BIGINT) AS var_cuped_c2
  FROM withadj GROUP BY arm
)
SELECT arm, n_users, mean_cents_milli, cuped_mean_cents_milli,
       var_plain_c2, var_cuped_c2,
       CAST(var_cuped_c2 * 1000 // greatest(var_plain_c2, 1)
         AS BIGINT) AS var_reduction_milli
FROM per
"""


QUERIES["events_cuped_abtest"] = (events_cuped_abtest, _sql_cuped())


# ---------------------------------------------------- Markov entropy rate

# The predictability number on top of events_markov_transitions: the
# empirical entropy rate H = Σ_s π(s) · H(next | s) of the event-type
# chain, with π the empirical from-state frequencies — how many nats the
# next user action actually carries (0 = deterministic journeys, ln(5) ≈
# 1.609 = uniform chaos; this corpus sits near the top, the honest
# read on synthetic traffic). Per-row contributions are micro-nats
# through ONE shared float string on exact integer counts (−n·ln(n/tot)
# summed then normalized), so both engines agree bit-for-bit.
#
# Scale shape: the transition matrix is |types|² rows; one lag window on
# the log is the only corpus-sized work (the markov_transitions plan).

_ME_CONTRIB = (
    "CAST(floor(-(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE) / row_total)"
    " * 1.0e6 + 0.5e0) AS BIGINT)"
)


def events_markov_entropy(spark, sf_dir):
    """(from_type, n_from, h_cond_micro, pi_milli, h_rate_micro):
    per-state conditional entropy (micro-nats), state weight, and the
    chain's entropy rate."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").cast("long").alias("row_total"))
    hc = (
        pairs.join(F.broadcast(tot), "from_type")
        .withColumn("c", F.expr(_ME_CONTRIB))
        .groupBy("from_type")
        .agg(
            F.expr("CAST(sum(c) DIV max(row_total) AS BIGINT)").alias(
                "h_cond_micro"
            ),
            F.max("row_total").cast("long").alias("n_from"),
        )
    )
    g = F.broadcast(hc.agg(F.sum("n_from").cast("long").alias("g")))
    rate = F.broadcast(
        hc.crossJoin(g)
        .agg(
            F.expr(
                "CAST(sum(h_cond_micro * n_from) DIV max(g) AS BIGINT)"
            ).alias("h_rate_micro")
        )
    )
    return (
        hc.crossJoin(g)
        .crossJoin(rate)
        .select(
            "from_type",
            "n_from",
            "h_cond_micro",
            F.expr("CAST(n_from * 1000 DIV g AS BIGINT)").alias("pi_milli"),
            "h_rate_micro",
        )
    )


SQL_MARKOV_ENTROPY = f"""
WITH pairs AS (
  SELECT from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS from_type
    FROM events
  )
  WHERE from_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
  FROM pairs GROUP BY 1
),
hc AS (
  SELECT from_type,
         CAST(sum({_ME_CONTRIB}) // max(row_total) AS BIGINT) AS h_cond_micro,
         CAST(max(row_total) AS BIGINT) AS n_from
  FROM pairs JOIN tot USING (from_type)
  GROUP BY from_type
),
g AS (SELECT CAST(sum(n_from) AS BIGINT) AS g FROM hc),
rate AS (
  SELECT CAST(sum(h_cond_micro * n_from) // max(g) AS BIGINT) AS h_rate_micro
  FROM hc CROSS JOIN g
)
SELECT from_type, n_from, h_cond_micro,
       CAST(n_from * 1000 // g AS BIGINT) AS pi_milli,
       h_rate_micro
FROM hc CROSS JOIN g CROSS JOIN rate
"""

QUERIES["events_markov_entropy"] = (events_markov_entropy, SQL_MARKOV_ENTROPY)


# ---------------------------------------------------- geohash_grid agg

# The one OpenSearch agg family absent so far: geo bucketing. The corpus
# has no coordinates, so both engines PLANT the same md5-derived ones
# in-query (lat/lon in exact MILLI-degrees — the planted-input doctrine:
# synthesis must be identical and integer): lat_milli ∈ [−90000, 89999],
# lon_milli ∈ [−180000, 179999]. A precision-1 geohash is 5 interleaved
# bisection bits (lon₂ lat₁ lon₁ lat₀ lon₀ from the MSB): with milli
# coordinates the bisections are pure integer arithmetic —
#   lon3 = ((lon + 180000)·8) DIV 360000 (3 bits),
#   lat2 = ((lat + 90000)·4) DIV 180000 (2 bits)
# — so NO float trigonometry or log ever runs (a web-mercator tile_y
# would need ln∘tan, exactly the cross-engine float trap). The cell id
# and its base32 char are shared expressions; operands are nonnegative
# after the shift so DIV and // agree.
#
# Scale shape: map-only hash + one cell groupBy — the a1_facet_counts
# plan with a computed key.

GEO_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GEO_LON3 = "(((lon_milli + 180000) * 8) {div} 360000)"
_GEO_LAT2 = "(((lat_milli + 90000) * 4) {div} 180000)"
# interleave lon₂ lat₁ lon₁ lat₀ lon₀ (geohash char bit order)
_GEO_CELL = (
    f"(({_GEO_LON3} {{div}} 4) % 2) * 16"
    f" + (({_GEO_LAT2} {{div}} 2) % 2) * 8"
    f" + (({_GEO_LON3} {{div}} 2) % 2) * 4"
    f" + ({_GEO_LAT2} % 2) * 2"
    f" + ({_GEO_LON3} % 2)"
)


def es_geohash_grid(spark, sf_dir):
    """(rank, cell, geohash, n_docs): precision-1 geohash_grid buckets of
    the planted document coordinates, top-15 by count."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        (
            _hash56(F.concat(F.lit("lat:"), F.col("doc_id").cast("string")))
            % 180000
            - 90000
        ).alias("lat_milli"),
        (
            _hash56(F.concat(F.lit("lon:"), F.col("doc_id").cast("string")))
            % 360000
            - 180000
        ).alias("lon_milli"),
    )
    cells = planted.withColumn(
        "cell", F.expr(_GEO_CELL.format(div="DIV")).cast("long")
    )
    agg = cells.groupBy("cell").agg(F.count("*").cast("long").alias("n_docs"))
    agg = agg.withColumn(
        "geohash",
        F.expr(f"substring('{GEO_ALPHABET}', CAST(cell AS INT) + 1, 1)"),
    )
    top = agg.orderBy(F.col("n_docs").desc(), F.col("cell").asc()).limit(15)
    w = W.orderBy(F.col("n_docs").desc(), F.col("cell").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "cell", "geohash", "n_docs"
    )


def _sql_geohash_grid() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    lat = _SQL_HASH56.format(col="('lat:' || CAST(doc_id AS VARCHAR))")
    lon = _SQL_HASH56.format(col="('lon:' || CAST(doc_id AS VARCHAR))")
    cell = _GEO_CELL.format(div="//")
    return f"""
WITH planted AS (
  SELECT doc_id,
         {lat} % 180000 - 90000 AS lat_milli,
         {lon} % 360000 - 180000 AS lon_milli
  FROM documents
),
cells AS (SELECT CAST({cell} AS BIGINT) AS cell FROM planted),
agg AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_docs FROM cells GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY n_docs DESC, cell ASC) AS INT)
         AS rank,
       cell,
       substr('{GEO_ALPHABET}', CAST(cell AS INT) + 1, 1) AS geohash,
       n_docs
FROM agg
ORDER BY n_docs DESC, cell ASC LIMIT 15
"""


QUERIES["es_geohash_grid"] = (es_geohash_grid, _sql_geohash_grid())


# ------------------------------------------------- geo_distance ranges

# The second half of the OpenSearch geo pair (geohash_grid above):
# geo_distance range buckets from a fixed origin. Same planted
# milli-degree coordinates; the metric is the SQUARED equirectangular
# angular distance in milli-degree² — a pure integer (lat² + lon² from
# the (0, 0) origin), so range edges compare exact int64 and no
# haversine trig ever runs (documented flat-model approximation: bucket
# EDGES are what is being tested, not geodesy). Buckets at 30°/60°/90°
# edges plus the open tail, every bucket reported (empty ones too —
# range aggs return all requested ranges).
#
# Scale shape: map-only hash + one bucket groupBy (a1_facet_counts).

GEO_EDGES_MDEG = (30_000, 60_000, 90_000)  # milli-degrees


def es_geo_distance_ranges(spark, sf_dir):
    """(bucket, n_docs, min_d2, max_d2): documents per squared-angular-
    distance range from the (0,0) origin over planted coordinates."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    planted = docs.select(
        (
            _hash56(F.concat(F.lit("lat:"), F.col("doc_id").cast("string")))
            % 180000
            - 90000
        ).alias("lat"),
        (
            _hash56(F.concat(F.lit("lon:"), F.col("doc_id").cast("string")))
            % 360000
            - 180000
        ).alias("lon"),
    ).select(
        (F.col("lat") * F.col("lat") + F.col("lon") * F.col("lon"))
        .cast("long")
        .alias("d2")
    )
    e1, e2, e3 = (e * e for e in GEO_EDGES_MDEG)
    bucket = F.expr(
        f"CASE WHEN d2 < {e1} THEN 0 WHEN d2 < {e2} THEN 1 "
        f"WHEN d2 < {e3} THEN 2 ELSE 3 END"
    ).cast("long")
    agg = planted.withColumn("bucket", bucket).groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("d2").cast("long").alias("min_d2"),
        F.max("d2").cast("long").alias("max_d2"),
    )
    grid = spark.createDataFrame([(b,) for b in range(4)], "bucket long")
    return grid.join(agg, "bucket", "left").select(
        "bucket",
        F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce("min_d2", F.lit(-1)).cast("long").alias("min_d2"),
        F.coalesce("max_d2", F.lit(-1)).cast("long").alias("max_d2"),
    )


def _sql_geo_distance_ranges() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    lat = _SQL_HASH56.format(col="('lat:' || CAST(doc_id AS VARCHAR))")
    lon = _SQL_HASH56.format(col="('lon:' || CAST(doc_id AS VARCHAR))")
    e1, e2, e3 = (e * e for e in GEO_EDGES_MDEG)
    return f"""
WITH planted AS (
  SELECT CAST(lat * lat + lon * lon AS BIGINT) AS d2 FROM (
    SELECT {lat} % 180000 - 90000 AS lat,
           {lon} % 360000 - 180000 AS lon
    FROM documents
  )
),
agg AS (
  SELECT CASE WHEN d2 < {e1} THEN 0 WHEN d2 < {e2} THEN 1
              WHEN d2 < {e3} THEN 2 ELSE 3 END AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(d2) AS BIGINT) AS min_d2,
         CAST(max(d2) AS BIGINT) AS max_d2
  FROM planted GROUP BY 1
)
SELECT g.bucket,
       CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(coalesce(a.min_d2, -1) AS BIGINT) AS min_d2,
       CAST(coalesce(a.max_d2, -1) AS BIGINT) AS max_d2
FROM (SELECT unnest(range(4)) AS bucket) g
LEFT JOIN agg a USING (bucket)
"""


QUERIES["es_geo_distance_ranges"] = (
    es_geo_distance_ranges,
    _sql_geo_distance_ranges(),
)


# ---------------------------------------------- frequent item sets

# The ES `frequent_item_sets` agg (its one market-basket surface) via
# textbook Apriori (Agrawal & Srikant, VLDB 1994) at max size 3. The
# 31-type corpus vocabulary saturates any basket built from real tokens
# (every frequent term co-occurs with every other — the CLAUDE.md
# degenerate-vocabulary trap), so baskets are PLANTED per doc from a
# skewed item space — 5 md5-hash draws, 3/4 of them over 6 hot items and
# 1/4 over 50 cold ones — giving a genuine support gradient: hot
# singletons ≈ 48% of docs, hot pairs ≈ 21%, hot triples ≈ 8%, cold
# items ≈ 2.5% (pruned at L1), quadruples ≈ 2% (below minsup). Both
# engines derive identical baskets from the same integer hash algebra.
#
# The Apriori structure is load-bearing, not decorative: L1 semi-joins
# the baskets down to frequent items BEFORE any pair is formed (cold
# items never enter a join), and size-3 support counting only runs over
# the candidate set C3 = join(L2, L2) with ALL three sub-pairs frequent
# (the downward-closure prune) — broadcast, since |C3| ≤ |L2|² is tiny
# by construction. Support counts are exact BIGINTs.
#
# Scale shape: basket synthesis is map-only; L1 is one groupBy; the
# pair/triple joins are doc-keyed self-joins whose per-doc width is
# bounded by the number of FREQUENT items in the basket (≤ 5 here, ≤
# basket size always) — linear in docs, never quadratic in vocabulary;
# C3 and L2 ride broadcasts.

FIS_SLOTS = 5
FIS_HOT = 6
FIS_COLD = 50
FIS_MINSUP_DIV = 20  # minsup = max(n_docs/20, 2) — 5% support


def _fis_baskets(spark, sf_dir):
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents").select("doc_id")
    slots = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(FIS_SLOTS - 1))).alias("slot")
    )
    h = _hash56(
        F.concat(
            F.lit("fis|"),
            F.col("doc_id").cast("string"),
            F.lit("|"),
            F.col("slot").cast("string"),
        )
    )
    # h is 56-bit: h/4 as a DOUBLE loses low bits past the 53-bit
    # mantissa — the quotient MUST stay integer (DIV), like the oracle's //.
    item = F.expr(
        f"CASE WHEN h % 4 < 3 THEN concat('i', CAST((h DIV 4) % {FIS_HOT} AS STRING))"
        f" ELSE concat('i', CAST({FIS_HOT} + (h DIV 4) % {FIS_COLD} AS STRING)) END"
    )
    return (
        slots.select("doc_id", h.alias("h"))
        .select("doc_id", item.alias("item"))
        .distinct()
    )


def es_frequent_item_sets(spark, sf_dir):
    """(k, item_a, item_b, item_c, support): Apriori frequent itemsets
    (sizes 1-3, support >= n_docs/{FIS_MINSUP_DIV}) over planted skewed
    baskets; unused item slots are ''."""
    baskets = _fis_baskets(spark, sf_dir).cache()
    n_docs = load(spark, sf_dir, "documents").count()
    minsup = max(n_docs // FIS_MINSUP_DIV, 2)

    l1 = (
        baskets.groupBy("item")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= minsup)
        .cache()
    )
    fb = baskets.join(
        F.broadcast(l1.select("item")), "item", "left_semi"
    ).cache()

    fa = fb.select("doc_id", F.col("item").alias("a"))
    fbb = fb.select("doc_id", F.col("item").alias("b"))
    fc = fb.select("doc_id", F.col("item").alias("c"))
    l2 = (
        fa.join(fbb, "doc_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= minsup)
        .cache()
    )
    # C3 = downward-closure candidates: (a,b)+(a,c) share the prefix,
    # and (b,c) must itself be frequent.
    c3 = (
        l2.select("a", "b")
        .join(l2.select("a", F.col("b").alias("c")), "a")
        .filter(F.col("b") < F.col("c"))
        .join(
            l2.select(F.col("a").alias("b"), F.col("b").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )
    l3 = (
        fa.join(fbb, "doc_id")
        .filter(F.col("a") < F.col("b"))
        .join(fc, "doc_id")
        .filter(F.col("b") < F.col("c"))
        .join(F.broadcast(c3), ["a", "b", "c"])
        .groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= minsup)
    )
    out1 = l1.select(
        F.lit(1).alias("k"), F.col("item").alias("item_a"),
        F.lit("").alias("item_b"), F.lit("").alias("item_c"), "support",
    )
    out2 = l2.select(
        F.lit(2).alias("k"), F.col("a").alias("item_a"),
        F.col("b").alias("item_b"), F.lit("").alias("item_c"), "support",
    )
    out3 = l3.select(
        F.lit(3).alias("k"), F.col("a").alias("item_a"),
        F.col("b").alias("item_b"), F.col("c").alias("item_c"), "support",
    )
    return out1.unionByName(out2).unionByName(out3)


def _sql_frequent_item_sets() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(
        col="'fis|' || CAST(doc_id AS VARCHAR) || '|' || CAST(slot AS VARCHAR)"
    )
    return f"""
WITH slots AS (
  SELECT doc_id, CAST(unnest(range({FIS_SLOTS})) AS BIGINT) AS slot
  FROM documents
),
hs AS (SELECT doc_id, {h} AS h FROM slots),
baskets AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         CASE WHEN h % 4 < 3 THEN 'i' || CAST((h // 4) % {FIS_HOT} AS VARCHAR)
              ELSE 'i' || CAST({FIS_HOT} + (h // 4) % {FIS_COLD} AS VARCHAR)
         END AS item
  FROM hs
),
ms AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // {FIS_MINSUP_DIV}, 2) AS minsup
  FROM documents
),
l1 AS MATERIALIZED (
  SELECT item, CAST(count(*) AS BIGINT) AS support
  FROM baskets GROUP BY 1
  HAVING CAST(count(*) AS BIGINT) >= (SELECT minsup FROM ms)
),
fb AS MATERIALIZED (
  SELECT b.doc_id, b.item FROM baskets b
  WHERE b.item IN (SELECT item FROM l1)
),
l2 AS MATERIALIZED (
  SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS support
  FROM fb x JOIN fb y ON x.doc_id = y.doc_id AND x.item < y.item
  GROUP BY 1, 2
  HAVING CAST(count(*) AS BIGINT) >= (SELECT minsup FROM ms)
),
c3 AS (
  SELECT p.a, p.b, q.b AS c
  FROM l2 p JOIN l2 q ON p.a = q.a AND p.b < q.b
  WHERE EXISTS (SELECT 1 FROM l2 r WHERE r.a = p.b AND r.b = q.b)
),
l3 AS (
  SELECT t.a, t.b, t.c, CAST(count(*) AS BIGINT) AS support
  FROM (
    SELECT x.doc_id, x.item AS a, y.item AS b, z.item AS c
    FROM fb x
    JOIN fb y ON x.doc_id = y.doc_id AND x.item < y.item
    JOIN fb z ON x.doc_id = z.doc_id AND y.item < z.item
  ) t JOIN c3 USING (a, b, c)
  GROUP BY 1, 2, 3
  HAVING CAST(count(*) AS BIGINT) >= (SELECT minsup FROM ms)
)
SELECT 1 AS k, item AS item_a, '' AS item_b, '' AS item_c, support FROM l1
UNION ALL
SELECT 2, a, b, '', support FROM l2
UNION ALL
SELECT 3, a, b, c, support FROM l3
"""


QUERIES["es_frequent_item_sets"] = (
    es_frequent_item_sets,
    _sql_frequent_item_sets(),
)


# -------------------------------------------------- categorize_text

# The ES `categorize_text` aggregation (the ML log-categorization agg):
# messages group by their token sequence AFTER variable parts — tokens
# containing digits — are dropped, ES's core categorization rule. The
# documents corpus is digit-free word soup (the rule would be a no-op →
# every doc its own category, degenerate), so log lines are SYNTHESIZED
# from the events table the way an ops pipeline would emit them:
#   "<event_type> user <user_id> took <cents> ms <props>"
# — ~10k near-unique strings whose digit tokens (user_id, integer cents
# of `value`, the props payload number) carry all the variability. The
# digit-drop rule is therefore load-bearing: it collapses the stream to
# one category per event_type shape, and the pytest proves the collapse
# (distinct messages ≫ categories) rather than assuming it.
#
# Determinism: the message embeds `value` as INTEGER cents (double→string
# formatting differs between engines; integers print identically); the
# tokenizer is the repo's ASCII \W+ contract; the digit test is the
# ASCII class [0-9] (Java regex and RE2 agree); counts are exact BIGINTs
# and the example is min(event_id).
#
# Scale shape: map-only synthesis + one groupBy(category) with map-side
# combine — the ES agg's own shape (its categorizer is per-shard with a
# reduce merge, exactly a Spark partial agg).


def es_categorize_text(spark, sf_dir):
    """(category, n_msgs, n_users, example_event_id): ES
    categorize_text over synthesized event log lines — token sequence
    with digit-bearing tokens dropped is the category key."""
    ev = load(spark, sf_dir, "events")
    msg = F.concat(
        F.col("event_type"), F.lit(" user "),
        F.col("user_id").cast("string"), F.lit(" took "),
        cents("value").cast("string"), F.lit(" ms "), F.col("props"),
    )
    cat = F.array_join(
        F.filter(
            F.split(F.lower(msg), r"\W+"),
            lambda t: (t != "") & ~t.rlike("[0-9]"),
        ),
        " ",
    )
    return (
        ev.select(
            cat.alias("category"),
            "user_id",
            "event_id",
        )
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("n_msgs"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.min("event_id").cast("long").alias("example_event_id"),
        )
    )


SQL_CATEGORIZE_TEXT = f"""
WITH msgs AS (
  SELECT event_id, user_id,
         event_type || ' user ' || CAST(user_id AS VARCHAR) || ' took '
           || CAST({sql_cents('value')} AS VARCHAR) || ' ms ' || props
           AS msg
  FROM events
),
cats AS (
  SELECT event_id, user_id,
         array_to_string(
           list_filter(string_split_regex(lower(msg), '\\W+'),
                       t -> t <> '' AND NOT regexp_matches(t, '[0-9]')),
           ' ') AS category
  FROM msgs
)
SELECT category, CAST(count(*) AS BIGINT) AS n_msgs,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(min(event_id) AS BIGINT) AS example_event_id
FROM cats GROUP BY 1
"""

QUERIES["es_categorize_text"] = (es_categorize_text, SQL_CATEGORIZE_TEXT)


# -------------------------------------- Holt-Winters additive seasonal

# Completes the exponential-smoothing family (events_moving_ewma = level,
# events_moving_holt = level+trend): triple exponential smoothing with an
# ADDITIVE seasonal component (Winters 1960), period HW_M, window
# HW_WIN = 3 seasons, α = β = γ = 1/2. Seeding convention (documented,
# deterministic): l₀ = mean of season 1, b₀ = (mean season 2 − mean
# season 1)/HW_M, sᵢ = vᵢ − l₀; then the textbook recurrences for
# k = HW_M..HW_WIN−1 and the one-step forecast l + b + s_{k+1−HW_M}.
#
# Because α/β/γ AND the seed divisors are dyadic, the forecast is an
# EXACT linear form over the window with integer weights on a power-of-2
# denominator — the events_moving_holt discipline: weights derived once
# with exact Fractions at import (the assert proves integrality and that
# a constant series forecasts itself), per-row evaluation is one integer
# dot product, milli output through the sign-split _SDIV. The corpus has
# no genuine 4-bucket seasonality (events_seasonality_r2 is the negative
# control) — the operator is the estimator surface; the pytest plants a
# pure-seasonal series and pins that the weight vector reproduces it
# EXACTLY (a real law of these recurrences, verified by the Fraction
# recompute).
#
# Scale shape: densified hourly counts + one per-type lag chain +
# map-only dot product — identical to events_moving_holt.

HW_M = 4
HW_WIN = 3 * HW_M


def _hw_weights():
    from fractions import Fraction

    a = b = g = Fraction(1, 2)
    n, m = HW_WIN, HW_M

    def unit(k):
        return [Fraction(int(i == k)) for i in range(n)]

    zero = [Fraction(0)] * n
    lw = [Fraction(1, m) if i < m else Fraction(0) for i in range(n)]
    bw = [
        (Fraction(1, m * m) if m <= i < 2 * m else Fraction(0))
        - (Fraction(1, m * m) if i < m else Fraction(0))
        for i in range(n)
    ]
    s_hist = [
        [e - l for e, l in zip(unit(k), lw)] for k in range(m)
    ]
    for k in range(m, n):
        l_prev = lw
        lw = [
            a * (e - s) + (1 - a) * (lv + bv)
            for e, s, lv, bv in zip(unit(k), s_hist[k - m], lw, bw)
        ]
        bw = [
            b * (lv - lpv) + (1 - b) * bv
            for lv, lpv, bv in zip(lw, l_prev, bw)
        ]
        s_hist.append(
            [
                g * (e - lv) + (1 - g) * s
                for e, lv, s in zip(unit(k), lw, s_hist[k - m])
            ]
        )
    f = [
        lv + bv + s
        for lv, bv, s in zip(lw, bw, s_hist[n + 1 - m - 1])
    ]
    den = 1
    for x in f:
        q = x.denominator
        while den % q:
            den *= 2
    w = [x * den for x in f]
    assert all(x.denominator == 1 for x in w)
    assert sum(f) == 1  # constant series forecasts itself
    return [int(x) for x in w], den


_HW_WEIGHTS, _HW_DEN = _hw_weights()


def events_holt_winters(spark, sf_dir):
    """(event_type, hour_bucket, c, hw_milli): exact integer
    Holt-Winters additive (alpha=beta=gamma=1/2, period {HW_M}, window
    {HW_WIN}) one-step forecast over densified hourly counts."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour"),
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("event_type", "hour").agg(
        F.count("*").cast("long").alias("c")
    )
    hours = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(b.mn), F.lit(b.mx))).alias("hour"),
        )
    )
    dens = hours.join(counts, ["event_type", "hour"], "left").select(
        "event_type", "hour",
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
    )
    wt = W.partitionBy("event_type").orderBy("hour")
    lagged = dens.select(
        "event_type",
        F.col("hour").alias("hour_bucket"),
        "c",
        *[
            F.lag("c", k).over(wt).cast("long").alias(f"l{k}")
            for k in range(1, HW_WIN)
        ],
    ).filter(F.col("hour_bucket") >= b.mn + HW_WIN - 1)
    num = " + ".join(
        f"({w}) * {'c' if (HW_WIN - 1 - i) == 0 else f'l{HW_WIN - 1 - i}'}"
        for i, w in enumerate(_HW_WEIGHTS)
    )
    return lagged.select(
        "event_type",
        "hour_bucket",
        "c",
        F.expr(
            "CAST("
            + _SDIV.format(num=f"1000 * ({num})", den=_HW_DEN, div="DIV")
            + " AS BIGINT)"
        ).alias("hw_milli"),
    )


def _sql_holt_winters() -> str:
    num = " + ".join(
        f"({w}) * v{HW_WIN - 1 - i}" for i, w in enumerate(_HW_WEIGHTS)
    )
    lags = ",\n         ".join(
        f"lag(c, {k}) OVER tw AS v{k}" for k in range(1, HW_WIN)
    )
    return f"""
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour
  FROM events
),
b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (
  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
),
hours AS (
  SELECT event_type, CAST(h AS BIGINT) AS hour
  FROM (SELECT DISTINCT event_type FROM ev)
  CROSS JOIN (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b) + 1)) AS h)
),
dens AS (
  SELECT hours.event_type, hours.hour, coalesce(counts.c, 0) AS c
  FROM hours LEFT JOIN counts USING (event_type, hour)
),
lagged AS (
  SELECT event_type, hour AS hour_bucket, c AS v0, c,
         {lags}
  FROM dens
  WINDOW tw AS (PARTITION BY event_type ORDER BY hour)
  QUALIFY hour >= (SELECT mn FROM b) + {HW_WIN - 1}
)
SELECT event_type, hour_bucket, c,
       CAST({_SDIV.format(num=f"1000 * ({num})", den=_HW_DEN, div="//")}
            AS BIGINT) AS hw_milli
FROM lagged
"""


QUERIES["events_holt_winters"] = (events_holt_winters, _sql_holt_winters())


# ------------------------------------------------ random_sampler agg

# The ES `random_sampler` aggregation (probability-based background
# sampling for cheap approximate aggs) with its error made measurable:
# a deterministic md5 1/RS_RATE sample of the event log feeds the same
# per-type sum/count aggregation, estimates scale up by RS_RATE, and
# the operator reports the signed relative error of the estimate
# against the exact aggregate computed on the full log — the number
# that tells an analyst whether the sampled dashboard is trustworthy.
#
# Determinism: the sample membership is an md5 scatter (identical in
# both engines — ES uses a hash-based split the same way); sums are
# integer cents; the relative error is a sign-split floored milli
# division of exact integers.
#
# Scale shape: ONE scan computes both the exact and the sampled
# aggregates (conditional aggregation on the sample flag — no second
# pass); output is event-type-cardinality. At a 100 TB log the exact
# leg is the expensive one — the operator exists to quantify when it
# can be dropped.

RS_RATE = 8


def es_random_sampler_eval(spark, sf_dir):
    """(event_type, n_exact, sum_cents, n_sampled, est_n,
    est_sum_cents, err_milli): random_sampler estimates (1/{RS_RATE}
    md5 sample, scaled) vs the exact per-type aggregates."""
    from harvester_spark.operators.dedup import _hash56

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        cents("value").alias("cents"),
        (
            _hash56(F.concat(F.lit("rs|"), F.col("event_id").cast("string")))
            % RS_RATE
            == 0
        ).alias("in_sample"),
    )
    agg = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum(F.col("in_sample").cast("long")).cast("long").alias("n_sampled"),
        F.sum(F.when(F.col("in_sample"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sum_sampled"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        "sum_cents",
        "n_sampled",
        (F.lit(RS_RATE) * F.col("n_sampled")).cast("long").alias("est_n"),
        (F.lit(RS_RATE) * F.col("sum_sampled")).cast("long").alias(
            "est_sum_cents"
        ),
        F.expr(
            f"CASE WHEN {RS_RATE} * sum_sampled >= sum_cents"
            f" THEN CAST((1000 * ({RS_RATE} * sum_sampled - sum_cents))"
            " DIV sum_cents AS BIGINT)"
            f" ELSE CAST(-((1000 * (sum_cents - {RS_RATE} * sum_sampled))"
            " DIV sum_cents) AS BIGINT) END"
        ).alias("err_milli"),
    )


def _sql_random_sampler() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col="'rs|' || CAST(event_id AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT event_type, {sql_cents('value')} AS cents,
         ({h} % {RS_RATE} = 0) AS in_sample
  FROM events
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(cents) AS BIGINT) AS sum_cents,
         CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled,
         CAST(sum(CASE WHEN in_sample THEN cents ELSE 0 END) AS BIGINT)
           AS sum_sampled
  FROM ev GROUP BY 1
)
SELECT event_type, n_exact, sum_cents, n_sampled,
       CAST({RS_RATE} * n_sampled AS BIGINT) AS est_n,
       CAST({RS_RATE} * sum_sampled AS BIGINT) AS est_sum_cents,
       CASE WHEN {RS_RATE} * sum_sampled >= sum_cents
            THEN CAST((1000 * ({RS_RATE} * sum_sampled - sum_cents))
                 // sum_cents AS BIGINT)
            ELSE CAST(-((1000 * (sum_cents - {RS_RATE} * sum_sampled))
                 // sum_cents) AS BIGINT) END AS err_milli
FROM agg
"""


QUERIES["es_random_sampler_eval"] = (
    es_random_sampler_eval,
    _sql_random_sampler(),
)


# -------------------------------------------------- matrix profile

# Yeh et al. (ICDM 2016) matrix profile — the all-pairs nearest-
# neighbor-subsequence structure that powers motif discovery and
# discord (anomaly) detection on the event-rate series: for every
# length-{MP_M} subsequence of the densified hourly count series, the
# minimum squared Euclidean distance to any OTHER subsequence outside
# the trivial-match exclusion zone (|i−j| ≥ m), plus the argmin
# position. Deliberately the UNNORMALIZED integer distance (counts
# share one scale; z-normalization would put a per-window sqrt/stddev
# float into every pair — the profile stays exact int64 this way,
# documented).
#
# Determinism: integer counts, integer squared distances, argmin ties
# (d2 asc, j asc). The global minimum row is the top motif pair; the
# global maximum is the top discord.
#
# Scale shape: subsequences come from one lag chain (calendar-bounded
# frame); the all-pairs comparison is the O(T²) exact form — 716²
# ≈ 5·10⁵ pairs at the sandbox's 30-day hourly span, one banded
# self-join. The production path for years-long series is STOMP's
# streaming dot-product recurrence (per-diagonal map over the same
# frame); this operator is its exact ground-truth twin.

MP_M = 4


def events_matrix_profile(spark, sf_dir):
    """(i, nn_j, d2): the matrix profile of the hourly event-count
    series at subsequence length {MP_M} (unnormalized integer
    distances, exclusion zone |i−j| >= {MP_M})."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("c"))
    dens = (
        spark.range(b.mn, b.mx + 1)
        .select(F.col("id").alias("hour"))
        .join(counts, "hour", "left")
        .select(
            (F.col("hour") - b.mn).alias("i"),
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
        )
    )
    wt = W.orderBy("i")
    subs = dens.select(
        "i",
        *[
            F.lead("c", k).over(wt).cast("long").alias(f"v{k}")
            for k in range(MP_M)
        ],
    ).filter(F.col(f"v{MP_M - 1}").isNotNull()).cache()
    a = subs.select(
        F.col("i"), *[F.col(f"v{k}").alias(f"a{k}") for k in range(MP_M)]
    )
    bb = subs.select(
        F.col("i").alias("j"),
        *[F.col(f"v{k}").alias(f"b{k}") for k in range(MP_M)],
    )
    d2 = " + ".join(
        f"(a{k} - b{k}) * (a{k} - b{k})" for k in range(MP_M)
    )
    pairs = (
        a.join(bb, F.expr(f"abs(i - j) >= {MP_M}"))
        .withColumn("d2", F.expr(d2).cast("long"))
    )
    wmin = W.partitionBy("i").orderBy(F.col("d2").asc(), F.col("j").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select("i", F.col("j").alias("nn_j"), "d2")
    )


def _sql_matrix_profile() -> str:
    leads = ",\n         ".join(
        f"lead(c, {k}) OVER (ORDER BY i) AS v{k}" for k in range(MP_M)
    )
    d2 = " + ".join(
        f"(x.v{k} - y.v{k}) * (x.v{k} - y.v{k})" for k in range(MP_M)
    )
    return f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour FROM events
),
b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (SELECT hour, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1),
dens AS (
  SELECT CAST(h - (SELECT mn FROM b) AS BIGINT) AS i,
         CAST(coalesce(c.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b) + 1)) AS h)
  LEFT JOIN counts c ON c.hour = h
),
subs AS MATERIALIZED (
  SELECT * FROM (
    SELECT i,
         {leads}
    FROM dens
  ) WHERE v{MP_M - 1} IS NOT NULL
),
pairs AS (
  SELECT x.i, y.i AS j, CAST({d2} AS BIGINT) AS d2
  FROM subs x JOIN subs y ON abs(x.i - y.i) >= {MP_M}
)
SELECT i, j AS nn_j, d2 FROM (
  SELECT *, row_number() OVER (PARTITION BY i ORDER BY d2 ASC, j ASC) AS rn
  FROM pairs
) WHERE rn = 1
"""


QUERIES["events_matrix_profile"] = (
    events_matrix_profile,
    _sql_matrix_profile(),
)


# -------------------------------------------------- geo_centroid agg

# The third of the ES geo-agg trio (geohash_grid buckets, geo_distance
# ranges, and THIS — `geo_centroid`, the per-bucket mean location a map
# UI drops its cluster pins on): for every precision-1 geohash cell of
# the SAME planted milli-degree coordinates, the arithmetic-mean lat /
# lon. ES computes the centroid as a plain coordinate mean (no
# spherical correction at cell scale — documented); here both means
# stay EXACT: integer milli-degree sums with sign-split floored
# division (coordinates go negative), so not a single float appears.
#
# Scale shape: one groupBy(cell) over the map-only planted projection —
# the geohash_grid plan with two more integer sums on the same shuffle.


def es_geo_centroid(spark, sf_dir):
    """(cell, geohash, n_docs, centroid_lat_milli, centroid_lon_milli):
    exact integer geo_centroid of every precision-1 geohash cell."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        (
            _hash56(F.concat(F.lit("lat:"), F.col("doc_id").cast("string")))
            % 180000
            - 90000
        ).alias("lat_milli"),
        (
            _hash56(F.concat(F.lit("lon:"), F.col("doc_id").cast("string")))
            % 360000
            - 180000
        ).alias("lon_milli"),
    )
    cells = planted.withColumn(
        "cell", F.expr(_GEO_CELL.format(div="DIV")).cast("long")
    )
    sdiv = (
        "CASE WHEN {s} >= 0 THEN CAST({s} DIV n_docs AS BIGINT)"
        " ELSE CAST(-((-({s})) DIV n_docs) AS BIGINT) END"
    )
    return (
        cells.groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("lat_milli").cast("long").alias("slat"),
            F.sum("lon_milli").cast("long").alias("slon"),
        )
        .select(
            "cell",
            F.expr(
                f"substring('{GEO_ALPHABET}', CAST(cell AS INT) + 1, 1)"
            ).alias("geohash"),
            "n_docs",
            F.expr(sdiv.format(s="slat")).alias("centroid_lat_milli"),
            F.expr(sdiv.format(s="slon")).alias("centroid_lon_milli"),
        )
    )


def _sql_geo_centroid() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    lat = _SQL_HASH56.format(col="'lat:' || CAST(doc_id AS VARCHAR)")
    lon = _SQL_HASH56.format(col="'lon:' || CAST(doc_id AS VARCHAR)")
    sdiv = (
        "CASE WHEN {s} >= 0 THEN CAST({s} // n_docs AS BIGINT)"
        " ELSE CAST(-((-({s})) // n_docs) AS BIGINT) END"
    )
    return f"""
WITH planted AS (
  SELECT doc_id,
         {lat} % 180000 - 90000 AS lat_milli,
         {lon} % 360000 - 180000 AS lon_milli
  FROM documents
),
cells AS (
  SELECT *, CAST({_GEO_CELL.format(div='//')} AS BIGINT) AS cell
  FROM planted
),
agg AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(lat_milli) AS BIGINT) AS slat,
         CAST(sum(lon_milli) AS BIGINT) AS slon
  FROM cells GROUP BY 1
)
SELECT cell,
       substring('{GEO_ALPHABET}', CAST(cell AS INT) + 1, 1) AS geohash,
       n_docs,
       {sdiv.format(s='slat')} AS centroid_lat_milli,
       {sdiv.format(s='slon')} AS centroid_lon_milli
FROM agg
"""


QUERIES["es_geo_centroid"] = (es_geo_centroid, _sql_geo_centroid())


# ------------------------------------------- index of dispersion (VMR)

# The Poissonness diagnostic for the event stream (Cox & Lewis): the
# variance-to-mean ratio of the densified hourly counts per event type.
# A Poisson arrival process has VMR = 1; VMR > 1 is overdispersion
# (bursts / daily cycles), VMR < 1 regularity. Complements events_acf
# (serial dependence) with the marginal-distribution check — together
# they are the "is this stream actually memoryless" pair an alerting
# threshold (events_anomaly_zscore) implicitly assumes.
#
# Determinism: integer window moments on the densified series (the
# n·s2 − s1² idiom — exact, Cauchy-Schwarz keeps it ≥ 0); VMR reported
# as an exact integer rational (vmr_num / vmr_den) plus a floored
# milli quotient: VMR = n·(n·s2 − s1²) / ((n−1)·n·s1) — all int64.
#
# Scale shape: one hourly groupBy + calendar-bounded densification +
# one per-type agg; output is event-type-cardinality.


def events_dispersion_index(spark, sf_dir):
    """(event_type, n_hours, mean_milli, vmr_milli): variance-to-mean
    ratio of hourly counts per type (sample variance), exact integers."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour"),
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("event_type", "hour").agg(
        F.count("*").cast("long").alias("c")
    )
    hours = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(b.mn), F.lit(b.mx))).alias("hour"),
        )
    )
    dens = hours.join(counts, ["event_type", "hour"], "left").select(
        "event_type",
        F.coalesce("c", F.lit(0)).cast("long").alias("c"),
    )
    return (
        dens.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("c").cast("long").alias("s1"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        )
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.expr("CAST((1000 * s1) DIV n AS BIGINT)").alias("mean_milli"),
            F.expr(
                "CAST((1000 * n * (n * s2 - s1 * s1))"
                " DIV ((n - 1) * n * s1) AS BIGINT)"
            ).alias("vmr_milli"),
        )
    )


SQL_DISPERSION_INDEX = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour
  FROM events
),
b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (
  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
),
hours AS (
  SELECT event_type, CAST(h AS BIGINT) AS hour
  FROM (SELECT DISTINCT event_type FROM ev)
  CROSS JOIN (SELECT unnest(range((SELECT mn FROM b), (SELECT mx FROM b) + 1)) AS h)
),
dens AS (
  SELECT hours.event_type, coalesce(counts.c, 0) AS c
  FROM hours LEFT JOIN counts USING (event_type, hour)
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM dens GROUP BY 1
)
SELECT event_type, n AS n_hours,
       CAST((1000 * s1) // n AS BIGINT) AS mean_milli,
       CAST((1000 * n * (n * s2 - s1 * s1)) // ((n - 1) * n * s1) AS BIGINT)
         AS vmr_milli
FROM agg
"""

QUERIES["events_dispersion_index"] = (
    events_dispersion_index,
    SQL_DISPERSION_INDEX,
)


# ------------------------------------------- robust-mean contamination

# The robust-statistics demonstration every metrics pipeline needs
# before trusting a mean (Tukey; the es_mad_boxplot sibling on the
# ESTIMATOR side): the same value stream with a planted 0.5% of
# 1000×-inflated outliers (md5-selected — a fat-finger / bot burst), and
# three location estimators computed on BOTH the clean and the
# contaminated stream: the mean (breaks), the {RM_TRIM_PCT}%-trimmed
# mean, and the median (both hold). Exact order statistics do the
# trimming (rank window, unique (cents, event_id) tie-break); every
# estimator is an integer milli-cent floored division; the pytest pins
# the breakdown contrast quantitatively.
#
# Scale shape: one rank window per cohort (the order-statistic
# histogram shape at scale), conditional aggregates on the same pass.

RM_TRIM_PCT = 10
RM_OUT_MOD = 200  # 1-in-200 planted outliers
RM_OUT_MULT = 1000


def events_robust_mean_eval(spark, sf_dir):
    """(cohort, n, mean_mc, trimmed_mc, median_mc): mean / trimmed mean
    / median in milli-cents on the clean and planted-contaminated value
    streams."""
    from harvester_spark.operators.dedup import _hash56

    ev = load(spark, sf_dir, "events").select(
        "event_id", cents("value").alias("c")
    )
    clean = ev.select(
        F.lit("clean").alias("cohort"), "event_id", F.col("c").alias("x")
    )
    contam = ev.select(
        F.lit("contaminated").alias("cohort"),
        "event_id",
        F.expr(
            f"CASE WHEN CAST(conv(substring(md5(concat('out|',"
            f" CAST(event_id AS STRING))), 1, 14), 16, 10) AS BIGINT)"
            f" % {RM_OUT_MOD} = 0 THEN c * {RM_OUT_MULT} ELSE c END"
        ).cast("long").alias("x"),
    )
    both = clean.unionByName(contam)
    wr = W.partitionBy("cohort").orderBy(
        F.col("x").asc(), F.col("event_id").asc()
    )
    ranked = both.withColumn("rn", F.row_number().over(wr).cast("long"))
    nn = F.broadcast(
        both.groupBy("cohort").agg(F.count("*").cast("long").alias("n"))
    )
    j = ranked.join(nn, "cohort")
    lo = F.expr(f"(n * {RM_TRIM_PCT}) DIV 100")
    hi = F.expr(f"n - (n * {RM_TRIM_PCT}) DIV 100")
    med_pos = F.expr("(n + 1) DIV 2")
    agg = j.groupBy("cohort", "n").agg(
        F.expr("CAST((1000 * sum(x)) DIV n AS BIGINT)").alias("mean_mc"),
        F.expr(
            f"CAST((1000 * sum(CASE WHEN rn > (n * {RM_TRIM_PCT}) DIV 100"
            f" AND rn <= n - (n * {RM_TRIM_PCT}) DIV 100 THEN x ELSE 0 END))"
            f" DIV (n - 2 * ((n * {RM_TRIM_PCT}) DIV 100)) AS BIGINT)"
        ).alias("trimmed_mc"),
        F.expr(
            "CAST(1000 * max(CASE WHEN rn = (n + 1) DIV 2 THEN x END)"
            " AS BIGINT)"
        ).alias("median_mc"),
    )
    return agg.select("cohort", "n", "mean_mc", "trimmed_mc", "median_mc")


def _sql_robust_mean() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col="'out|' || CAST(event_id AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT event_id, {sql_cents('value')} AS c FROM events
),
both_v AS (
  SELECT 'clean' AS cohort, event_id, CAST(c AS BIGINT) AS x FROM ev
  UNION ALL
  SELECT 'contaminated', event_id,
         CAST(CASE WHEN {h} % {RM_OUT_MOD} = 0
              THEN c * {RM_OUT_MULT} ELSE c END AS BIGINT)
  FROM ev
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY cohort
             ORDER BY x ASC, event_id ASC) AS BIGINT) AS rn
  FROM both_v
),
nn AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n FROM both_v GROUP BY 1)
SELECT r.cohort, nn.n,
       CAST((1000 * CAST(sum(x) AS BIGINT)) // nn.n AS BIGINT) AS mean_mc,
       CAST((1000 * CAST(sum(CASE WHEN rn > (nn.n * {RM_TRIM_PCT}) // 100
            AND rn <= nn.n - (nn.n * {RM_TRIM_PCT}) // 100 THEN x ELSE 0
            END) AS BIGINT))
            // (nn.n - 2 * ((nn.n * {RM_TRIM_PCT}) // 100)) AS BIGINT)
         AS trimmed_mc,
       CAST(1000 * max(CASE WHEN rn = (nn.n + 1) // 2 THEN x END)
            AS BIGINT) AS median_mc
FROM ranked r JOIN nn USING (cohort)
GROUP BY r.cohort, nn.n
"""


QUERIES["events_robust_mean_eval"] = (
    events_robust_mean_eval,
    _sql_robust_mean(),
)


# ------------------------------------- Simpson's paradox / CMH adjust

# The confounding demonstration every metrics team eventually needs
# (Simpson 1951; Mantel-Haenszel 1959 for the fix): a PLANTED dataset
# where treatment genuinely helps INSIDE every stratum (+100 milli
# success within both), but treatment assignment concentrates in the
# hard stratum (25% vs 75%), so the MARGINAL comparison flips sign and
# reads the treatment as harmful (≈ −100 milli). The operator emits the
# marginal difference, the per-stratum differences, and the
# Mantel-Haenszel stratum-weighted difference Σw_s·Δ_s / Σw_s with the
# standard weights w_s = n_1s·n_0s/n_s — which must RECOVER the true
# positive effect. Every quantity is an exact integer count with
# floored milli divisions; the sign flip is the pytest pin (marginal
# < 0 < every stratum and the CMH estimate).
#
# Scale shape: map-only synthesis + one (stratum, treated) groupBy +
# constant-sized arithmetic.

CMH_BASE = (600, 200)  # success milli by stratum
CMH_EFFECT = 100  # planted within-stratum treatment lift


def events_simpson_cmh(spark, sf_dir):
    """(scope, n_treated, n_control, diff_milli): marginal, per-stratum
    and Mantel-Haenszel-adjusted success-rate differences on the
    planted Simpson's-paradox stream."""
    from harvester_spark.operators.dedup import _hash56

    ev = load(spark, sf_dir, "events").select("event_id")

    def h(tag):
        return _hash56(
            F.concat(F.lit(tag + "|"), F.col("event_id").cast("string"))
        )

    rows = ev.select(
        "event_id",
        (h("st") % 2).cast("long").alias("s"),
    ).withColumn(
        "t",
        F.expr(
            "CASE WHEN s = 0 THEN CASE WHEN "
            "CAST(conv(substring(md5(concat('tr|', CAST(event_id AS STRING))), 1, 14), 16, 10) AS BIGINT) % 4 = 0"
            " THEN 1 ELSE 0 END"
            " ELSE CASE WHEN "
            "CAST(conv(substring(md5(concat('tr|', CAST(event_id AS STRING))), 1, 14), 16, 10) AS BIGINT) % 4 < 3"
            " THEN 1 ELSE 0 END END"
        ).cast("long"),
    ).withColumn(
        "y",
        F.expr(
            f"CASE WHEN CAST(conv(substring(md5(concat('sy|', CAST(event_id AS STRING))), 1, 14), 16, 10) AS BIGINT) % 1000"
            f" < CASE WHEN s = 0 THEN {CMH_BASE[0]} ELSE {CMH_BASE[1]} END"
            f" + {CMH_EFFECT} * t THEN 1 ELSE 0 END"
        ).cast("long"),
    )
    cells = rows.groupBy("s", "t").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("c"),
    ).cache()

    def diff(df, scope):
        w = df.groupBy().pivot("t", [0, 1]).agg(
            F.first("n").alias("n"), F.first("c").alias("c")
        )
        return w.select(
            F.lit(scope).alias("scope"),
            F.col("1_n").cast("long").alias("n_treated"),
            F.col("0_n").cast("long").alias("n_control"),
            F.expr(
                "CAST((1000 * `1_c`) DIV `1_n` - (1000 * `0_c`) DIV `0_n`"
                " AS BIGINT)"
            ).alias("diff_milli"),
        )

    marg = diff(
        cells.groupBy("t").agg(
            F.sum("n").alias("n"), F.sum("c").alias("c")
        ).withColumn("t", F.col("t")),
        "marginal",
    )
    s0 = diff(cells.filter(F.col("s") == 0), "stratum_0")
    s1 = diff(cells.filter(F.col("s") == 1), "stratum_1")
    # Mantel-Haenszel weighted difference: Σ w_s·Δ_s / Σ w_s,
    # w_s = n1s·n0s/ns — computed as exact integers with one final
    # floored division (w scaled by 1000 via the milli diffs)
    per_s = (
        cells.groupBy("s")
        .pivot("t", [0, 1])
        .agg(F.first("n").alias("n"), F.first("c").alias("c"))
        .select(
            "s",
            F.col("1_n").cast("long").alias("n1"),
            F.col("0_n").cast("long").alias("n0"),
            F.col("1_c").cast("long").alias("c1"),
            F.col("0_c").cast("long").alias("c0"),
        )
    )
    cmh = per_s.select(
        (F.col("n1") + F.col("n0")).alias("ns"),
        "n1", "n0", "c1", "c0",
    ).agg(
        F.sum(
            F.expr(
                "(n1 * n0 * ((1000 * c1) DIV n1 - (1000 * c0) DIV n0))"
                " DIV (n1 + n0)"
            )
        ).cast("long").alias("num"),
        F.sum(F.expr("(n1 * n0) DIV (n1 + n0)")).cast("long").alias("den"),
        F.sum("n1").cast("long").alias("n_treated"),
        F.sum("n0").cast("long").alias("n_control"),
    ).select(
        F.lit("cmh_adjusted").alias("scope"),
        "n_treated",
        "n_control",
        F.expr(
            "CASE WHEN num >= 0 THEN CAST(num DIV den AS BIGINT)"
            " ELSE CAST(-((-num) DIV den) AS BIGINT) END"
        ).alias("diff_milli"),
    )
    return marg.unionByName(s0).unionByName(s1).unionByName(cmh)


def _sql_simpson_cmh() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    hst = _SQL_HASH56.format(col="'st|' || CAST(event_id AS VARCHAR)")
    htr = _SQL_HASH56.format(col="'tr|' || CAST(event_id AS VARCHAR)")
    hsy = _SQL_HASH56.format(col="'sy|' || CAST(event_id AS VARCHAR)")
    return f"""
WITH rows_ AS (
  SELECT event_id, s,
         CASE WHEN s = 0
              THEN CASE WHEN {htr} % 4 = 0 THEN 1 ELSE 0 END
              ELSE CASE WHEN {htr} % 4 < 3 THEN 1 ELSE 0 END END AS t
  FROM (SELECT event_id, {hst} % 2 AS s FROM events)
),
outc AS (
  SELECT s, t,
         CASE WHEN {hsy} % 1000
              < CASE WHEN s = 0 THEN {CMH_BASE[0]} ELSE {CMH_BASE[1]} END
              + {CMH_EFFECT} * t THEN 1 ELSE 0 END AS y
  FROM rows_
),
cells AS MATERIALIZED (
  SELECT s, t, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS c
  FROM outc GROUP BY 1, 2
),
marg AS (
  SELECT 'marginal' AS scope,
         CAST(sum(CASE WHEN t = 1 THEN n END) AS BIGINT) AS n_treated,
         CAST(sum(CASE WHEN t = 0 THEN n END) AS BIGINT) AS n_control,
         CAST((1000 * CAST(sum(CASE WHEN t = 1 THEN c END) AS BIGINT))
              // CAST(sum(CASE WHEN t = 1 THEN n END) AS BIGINT)
              - (1000 * CAST(sum(CASE WHEN t = 0 THEN c END) AS BIGINT))
              // CAST(sum(CASE WHEN t = 0 THEN n END) AS BIGINT)
              AS BIGINT) AS diff_milli
  FROM cells
),
per_s AS (
  SELECT s,
         CAST(sum(CASE WHEN t = 1 THEN n END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN t = 0 THEN n END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN t = 1 THEN c END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN t = 0 THEN c END) AS BIGINT) AS c0
  FROM cells GROUP BY 1
),
strata AS (
  SELECT 'stratum_' || CAST(s AS VARCHAR) AS scope,
         n1 AS n_treated, n0 AS n_control,
         CAST((1000 * c1) // n1 - (1000 * c0) // n0 AS BIGINT) AS diff_milli
  FROM per_s
),
cmh AS (
  SELECT 'cmh_adjusted' AS scope,
         CAST(sum(n1) AS BIGINT) AS n_treated,
         CAST(sum(n0) AS BIGINT) AS n_control,
         CAST(CASE WHEN sum((n1 * n0 * ((1000 * c1) // n1
                    - (1000 * c0) // n0)) // (n1 + n0)) >= 0
              THEN CAST(sum((n1 * n0 * ((1000 * c1) // n1
                   - (1000 * c0) // n0)) // (n1 + n0)) AS BIGINT)
                   // CAST(sum((n1 * n0) // (n1 + n0)) AS BIGINT)
              ELSE -((-CAST(sum((n1 * n0 * ((1000 * c1) // n1
                   - (1000 * c0) // n0)) // (n1 + n0)) AS BIGINT))
                   // CAST(sum((n1 * n0) // (n1 + n0)) AS BIGINT)) END
              AS BIGINT) AS diff_milli
  FROM per_s
)
SELECT * FROM marg
UNION ALL SELECT * FROM strata
UNION ALL SELECT * FROM cmh
"""


QUERIES["events_simpson_cmh"] = (events_simpson_cmh, _sql_simpson_cmh())


# --------------------------------------- Benjamini-Hochberg FDR control

# The multiple-testing guardrail (Benjamini & Hochberg 1995) that sits
# downstream of every per-segment test battery this library now carries
# (t-test / KS / SRM / log-rank / CMH fire across hundreds of segments
# in production — uncorrected, 5% of nulls flag by design): m = one
# hypothesis per event-log "segment" (md5-derived), each with a PLANTED
# p-value — true nulls draw p uniform, the {BH_ALT_PCT}% planted
# alternatives draw p = u² (concentrated near 0). The step-up rule
# rejects the largest k with p_(k) ≤ k·q/m (compared CROSS-MULTIPLIED:
# 1e6·m·p ≤ k·q_milli·1000 — no division), Bonferroni rides along as
# the conservative baseline. Because the ground truth is planted, the
# op reports what no real battery can see: the REALIZED false-discovery
# proportion among BH rejections (must land ≲ q) and the power gap over
# Bonferroni (BH must reject strictly more) — both pytest-pinned.
#
# Scale shape: one map-only hypothesis synthesis + one rank window over
# the m-row hypothesis frame + the step-up scalar (max qualifying rank)
# broadcast.

BH_M = 500
BH_Q_MILLI = 100  # q = 0.10
BH_ALT_PCT = 10


def events_bh_fdr(spark, sf_dir):
    """(h_id, is_alt, p_micro, rank, bh_reject, bonf_reject): the BH
    step-up decisions over planted per-segment p-values, Bonferroni
    alongside."""
    from harvester_spark.operators.dedup import _hash56

    hyp = spark.range(BH_M).select(F.col("id").cast("long").alias("h_id"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bh|"), F.col("h_id").cast("string"))),
                1, 14,
            ), 16, 10,
        ).cast("long") % 1_000_000
    )
    alt = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ba|"), F.col("h_id").cast("string"))),
                1, 14,
            ), 16, 10,
        ).cast("long") % 100 < BH_ALT_PCT
    )
    drawn = hyp.select(
        "h_id",
        alt.alias("is_alt"),
        u.alias("u"),
    ).select(
        "h_id",
        "is_alt",
        # alternatives draw p uniform on [0, 1e-4] — a strong-effect
        # battery (power-law transforms of the uniform stay too weak
        # for the step-up at m = 500, measured); nulls are uniform
        F.expr(
            "CASE WHEN is_alt THEN u DIV 10000 ELSE u END"
        ).cast("long").alias("p_micro"),
    )
    wr = W.orderBy(F.col("p_micro").asc(), F.col("h_id").asc())
    ranked = drawn.withColumn("rank", F.row_number().over(wr).cast("long"))
    kmax = F.broadcast(
        ranked.filter(
            F.expr(
                f"1000 * CAST({BH_M} AS BIGINT) * p_micro"
                f" <= rank * {BH_Q_MILLI} * 1000000"
            )
        ).agg(F.coalesce(F.max("rank"), F.lit(0)).cast("long").alias("k"))
    )
    return ranked.crossJoin(kmax).select(
        "h_id",
        "is_alt",
        "p_micro",
        "rank",
        (F.col("rank") <= F.col("k")).alias("bh_reject"),
        F.expr(
            f"1000 * CAST({BH_M} AS BIGINT) * p_micro"
            f" <= {BH_Q_MILLI} * 1000000"
        ).alias("bonf_reject"),
    )


def _sql_bh_fdr() -> str:
    hu = "CAST(('0x' || substr(md5('bh|' || CAST(h_id AS VARCHAR)), 1, 14)) AS BIGINT) % 1000000"
    ha = "CAST(('0x' || substr(md5('ba|' || CAST(h_id AS VARCHAR)), 1, 14)) AS BIGINT) % 100"
    return f"""
WITH hyp AS (
  SELECT CAST(h AS BIGINT) AS h_id FROM (SELECT unnest(range({BH_M})) AS h)
),
drawn AS (
  SELECT h_id, is_alt,
         CAST(CASE WHEN is_alt THEN u // 10000 ELSE u END
              AS BIGINT) AS p_micro
  FROM (
    SELECT h_id, ({ha} < {BH_ALT_PCT}) AS is_alt, {hu} AS u FROM hyp
  )
),
ranked AS MATERIALIZED (
  SELECT *, CAST(row_number() OVER (ORDER BY p_micro ASC, h_id ASC)
                 AS BIGINT) AS rank
  FROM drawn
),
kmax AS (
  SELECT CAST(coalesce(max(rank), 0) AS BIGINT) AS k FROM ranked
  WHERE 1000 * CAST({BH_M} AS BIGINT) * p_micro
        <= rank * {BH_Q_MILLI} * 1000000
)
SELECT h_id, is_alt, p_micro, rank,
       rank <= (SELECT k FROM kmax) AS bh_reject,
       1000 * CAST({BH_M} AS BIGINT) * p_micro <= {BH_Q_MILLI} * 1000000
         AS bonf_reject
FROM ranked
"""


QUERIES["events_bh_fdr"] = (events_bh_fdr, _sql_bh_fdr())


# ------------------------------------------- Wald SPRT sequential test

# Wald's Sequential Probability Ratio Test (1945) — the always-peeking
# A/B design the fixed-horizon suite (t-test, CUPED, DiD, SRM, BH) was
# missing: the log-likelihood ratio walks with every observation and
# the test stops at the FIRST boundary crossing, spending far fewer
# samples than the fixed-n test of equal error rates. Fully relational
# (the coupon-collector discipline): per planted replicate, a window
# cumsum of fixed micro-nat LLR increments and the min crossing time.
# All constants are FIXED integers — increments ln(p1/p0), ln(q1/q0)
# and boundaries ±ln(19) (α = β = 0.05) pre-computed as exact micro
# literals, so no runtime ln touches either engine. The draws are
# planted Bernoulli(p1 = 0.65) against H0: p = 0.5; pins: ≥ 90% of
# replicates accept H1, mean stopping time lands well under the ≈ 100
# fixed-n equivalent, exact recompute.
#
# Scale shape: a reps×draws grid + per-rep window cumsum + one min agg.

SPRT_REPS = 32
SPRT_T = 200
SPRT_P1_PCT = 65
# ln(0.65/0.5), ln(0.35/0.5), ln(19) in exact micro-nat literals
SPRT_UP = 262364
SPRT_DN = -356675
SPRT_A = 2944439


def events_sprt_eval(spark, sf_dir):
    """(rep, decided, decision, stop_t, llr_at_stop_micro): Wald SPRT
    outcomes over planted Bernoulli(0.65) replicate streams vs
    H0: p = 0.5 at alpha = beta = 0.05."""
    from harvester_spark.operators.dedup import _hash56

    grid = (
        spark.range(SPRT_REPS)
        .select(F.col("id").cast("long").alias("rep"))
        .crossJoin(
            F.broadcast(
                spark.range(1, SPRT_T + 1).select(
                    F.col("id").cast("long").alias("t")
                )
            )
        )
        .select(
            "rep",
            "t",
            F.expr(
                f"CASE WHEN CAST(conv(substring(md5(concat('sp|',"
                " CAST(rep AS STRING), '|', CAST(t AS STRING))),"
                " 1, 14), 16, 10) AS BIGINT) % 100"
                f" < {SPRT_P1_PCT} THEN {SPRT_UP} ELSE {SPRT_DN} END"
            ).cast("long").alias("inc"),
        )
    )
    wt = (
        W.partitionBy("rep")
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    walk = grid.withColumn(
        "llr", F.sum("inc").over(wt).cast("long")
    )
    crossings = walk.filter(
        (F.col("llr") >= SPRT_A) | (F.col("llr") <= -SPRT_A)
    ).groupBy("rep").agg(F.min("t").cast("long").alias("stop_t"))
    at_stop = crossings.join(
        walk.select("rep", F.col("t").alias("stop_t"), "llr"),
        ["rep", "stop_t"],
    )
    reps = spark.range(SPRT_REPS).select(F.col("id").cast("long").alias("rep"))
    return reps.join(at_stop, "rep", "left").select(
        "rep",
        F.col("stop_t").isNotNull().alias("decided"),
        F.expr(
            f"CASE WHEN llr IS NULL THEN 'undecided'"
            f" WHEN llr >= {SPRT_A} THEN 'accept_h1'"
            " ELSE 'accept_h0' END"
        ).alias("decision"),
        F.coalesce("stop_t", F.lit(SPRT_T)).cast("long").alias("stop_t"),
        F.coalesce("llr", F.lit(0)).cast("long").alias("llr_at_stop_micro"),
    )


def _sql_sprt() -> str:
    h = "CAST(('0x' || substr(md5('sp|' || CAST(rep AS VARCHAR) || '|' || CAST(t AS VARCHAR)), 1, 14)) AS BIGINT)"
    return f"""
WITH grid AS (
  SELECT CAST(rep AS BIGINT) AS rep, CAST(t AS BIGINT) AS t,
         CASE WHEN {h} % 100 < {SPRT_P1_PCT}
              THEN {SPRT_UP} ELSE {SPRT_DN} END AS inc
  FROM (SELECT unnest(range({SPRT_REPS})) AS rep)
  CROSS JOIN (SELECT unnest(range(1, {SPRT_T + 1})) AS t)
),
walk AS MATERIALIZED (
  SELECT rep, t,
         CAST(sum(inc) OVER (PARTITION BY rep ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS llr
  FROM grid
),
crossings AS (
  SELECT rep, CAST(min(t) AS BIGINT) AS stop_t
  FROM walk WHERE llr >= {SPRT_A} OR llr <= -{SPRT_A}
  GROUP BY 1
),
at_stop AS (
  SELECT c.rep, c.stop_t, w.llr
  FROM crossings c JOIN walk w ON w.rep = c.rep AND w.t = c.stop_t
)
SELECT r.rep,
       a.stop_t IS NOT NULL AS decided,
       CASE WHEN a.llr IS NULL THEN 'undecided'
            WHEN a.llr >= {SPRT_A} THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       CAST(coalesce(a.stop_t, {SPRT_T}) AS BIGINT) AS stop_t,
       CAST(coalesce(a.llr, 0) AS BIGINT) AS llr_at_stop_micro
FROM (SELECT CAST(unnest(range({SPRT_REPS})) AS BIGINT) AS rep) r
LEFT JOIN at_stop a USING (rep)
"""


QUERIES["events_sprt_eval"] = (events_sprt_eval, _sql_sprt())


# ------------------------------------- binomial CI coverage (Wilson/Wald)

# Brown, Cai & DasGupta (Statist. Sci. 2001): the textbook Wald
# interval p̂ ± z·√(p̂q̂/n) UNDERCOVERS badly at small n / extreme p,
# while Wilson's score interval holds its nominal level — the reason
# every serious CTR dashboard uses Wilson. Demonstrated on
# {CI_REPS} planted Bernoulli(p = {CI_P_PCT}%) replicates of
# n = {CI_N}: per replicate both intervals (z = 1.96 as the fixed
# rational 196/100; the single √ per interval goes through ONE shared
# micro-floor float string on identical integers), coverage = does the
# interval contain the true p. Pins: Wilson's empirical coverage ≥
# 90%, Wald's strictly lower (it collapses to zero width whenever a
# replicate draws zero successes — counted), exact recompute.
#
# Scale shape: a reps×n grid + per-rep counts + map-only interval
# arithmetic.

CI_REPS = 48
CI_N = 20
CI_P_PCT = 3

_CI_SQRT = "CAST(floor(sqrt({x}) * 1.0e6 + 0.5e0) AS BIGINT)"


def events_ci_coverage_eval(spark, sf_dir):
    """(method, n_reps, n_cover, coverage_milli, n_zero_width): Wald vs
    Wilson interval coverage of the true p over planted small-sample
    binomial replicates."""
    from harvester_spark.operators.dedup import _hash56

    grid = (
        spark.range(CI_REPS)
        .select(F.col("id").cast("long").alias("rep"))
        .crossJoin(
            F.broadcast(
                spark.range(CI_N).select(F.col("id").cast("long").alias("i"))
            )
        )
        .select(
            "rep",
            (
                _hash56(
                    F.concat_ws(
                        "|", F.lit("ci"), F.col("rep").cast("string"),
                        F.col("i").cast("string"),
                    )
                )
                % 100
                < CI_P_PCT
            ).cast("long").alias("s"),
        )
    )
    per = grid.groupBy("rep").agg(F.sum("s").cast("long").alias("k"))
    n, z2 = CI_N, 0  # z = 1.96 -> z^2 = 38416/10000
    # Wald: bounds in micro; half-width = z*sqrt(k*(n-k)/n)/n
    wald = per.select(
        F.lit("wald").alias("method"),
        "rep",
        F.expr(
            f"CAST((1000000 * k) DIV {n} AS BIGINT)"
        ).alias("center_micro"),
        F.expr(
            "CAST((196 * "
            + _CI_SQRT.format(x=f"CAST(k * ({n} - k) AS DOUBLE) / {n}.0e0")
            + f") DIV (100 * {n}) AS BIGINT)"
        ).alias("half_micro"),
        (F.col("k") == 0).cast("long").alias("zero_width"),
    )
    # Wilson: center (k + z^2/2)/(n + z^2), half = z*sqrt(k q /n + z^2/4)/(n+z^2)
    # with z^2 = 38416/10000: scale through micro floats on exact ints
    wilson = per.select(
        F.lit("wilson").alias("method"),
        "rep",
        F.expr(
            f"CAST(floor((k + 38416.0e0 / 20000.0e0)"
            f" / ({n} + 38416.0e0 / 10000.0e0) * 1.0e6 + 0.5e0) AS BIGINT)"
        ).alias("center_micro"),
        F.expr(
            "CAST(floor(1.96e0 * sqrt("
            f"CAST(k AS DOUBLE) * ({n} - k) / {n}.0e0 + 38416.0e0 / 40000.0e0)"
            f" / ({n} + 38416.0e0 / 10000.0e0) * 1.0e6 + 0.5e0) AS BIGINT)"
        ).alias("half_micro"),
        F.lit(0).cast("long").alias("zero_width"),
    )
    both = wald.unionByName(wilson)
    p_micro = CI_P_PCT * 10000
    return both.withColumn(
        "covers",
        (
            (F.col("center_micro") - F.col("half_micro") <= p_micro)
            & (p_micro <= F.col("center_micro") + F.col("half_micro"))
        ).cast("long"),
    ).groupBy("method").agg(
        F.count("*").cast("long").alias("n_reps"),
        F.sum("covers").cast("long").alias("n_cover"),
        F.expr(
            "CAST((1000 * sum(covers)) DIV count(*) AS BIGINT)"
        ).alias("coverage_milli"),
        F.sum("zero_width").cast("long").alias("n_zero_width"),
    )


def _sql_ci_coverage() -> str:
    h = "CAST(('0x' || substr(md5('ci' || '|' || CAST(rep AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 14)) AS BIGINT)"
    n = CI_N
    p_micro = CI_P_PCT * 10000
    sq_wald = _CI_SQRT.format(x=f"CAST(k * ({n} - k) AS DOUBLE) / {n}.0e0")
    return f"""
WITH grid AS (
  SELECT CAST(rep AS BIGINT) AS rep,
         CASE WHEN {h} % 100 < {CI_P_PCT} THEN 1 ELSE 0 END AS s
  FROM (SELECT unnest(range({CI_REPS})) AS rep)
  CROSS JOIN (SELECT unnest(range({CI_N})) AS i)
),
per AS (SELECT rep, CAST(sum(s) AS BIGINT) AS k FROM grid GROUP BY 1),
both_m AS (
  SELECT 'wald' AS method, rep,
         CAST((1000000 * k) // {n} AS BIGINT) AS center_micro,
         CAST((196 * {sq_wald}) // (100 * {n}) AS BIGINT) AS half_micro,
         CASE WHEN k = 0 THEN 1 ELSE 0 END AS zero_width
  FROM per
  UNION ALL
  SELECT 'wilson', rep,
         CAST(floor((k + 38416.0e0 / 20000.0e0)
              / ({n} + 38416.0e0 / 10000.0e0) * 1.0e6 + 0.5e0) AS BIGINT),
         CAST(floor(1.96e0 * sqrt(
              CAST(k AS DOUBLE) * ({n} - k) / {n}.0e0
              + 38416.0e0 / 40000.0e0)
              / ({n} + 38416.0e0 / 10000.0e0) * 1.0e6 + 0.5e0) AS BIGINT),
         0
  FROM per
)
SELECT method, CAST(count(*) AS BIGINT) AS n_reps,
       CAST(sum(CASE WHEN center_micro - half_micro <= {p_micro}
                AND {p_micro} <= center_micro + half_micro
                THEN 1 ELSE 0 END) AS BIGINT) AS n_cover,
       CAST((1000 * sum(CASE WHEN center_micro - half_micro <= {p_micro}
            AND {p_micro} <= center_micro + half_micro THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS coverage_milli,
       CAST(sum(zero_width) AS BIGINT) AS n_zero_width
FROM both_m GROUP BY 1
"""


QUERIES["events_ci_coverage_eval"] = (
    events_ci_coverage_eval,
    _sql_ci_coverage(),
)


# ------------------------------------------ SAX symbolic representation

# Lin-Keogh-Lonardi-Chiu (DMKD 2003) Symbolic Aggregate approXimation —
# the discretization that turns the hourly event series into words so
# motif/novelty mining can run on STRINGS (the representation layer
# events_matrix_profile's exact numeric profile deliberately skips).
# Pipeline: densified hourly counts (the events_acf grid, 720 hours) ->
# PAA frames of SAX_FRAME_H hours (SUMS, not means — same ordering, no
# division) -> alphabet of SAX_ALPHA symbols.
#
# Deviation from the paper, documented: classic SAX z-normalizes and
# cuts at Gaussian N(0,1) breakpoints (an erf table — not exactly
# representable cross-engine). Here breakpoints are EQUI-DEPTH exact
# order statistics of the PAA distribution itself (ranks i*F/ALPHA via
# the cumulative value histogram, the events_theilsen_trend selection),
# which is the standard adaptation for non-Gaussian series and keeps
# every comparison integer-exact. Symbol id = count of breakpoints
# strictly below the frame's PAA sum.
#
# Scale shape: one events scan -> hour groupBy; everything downstream is
# frame-count-sized (span-bounded 120 rows at every gated scale).

SAX_FRAME_H = 6  # hours per PAA frame
SAX_ALPHA = 4  # alphabet size (a..d)


def events_sax_symbolize(spark, sf_dir):
    """(frame, day, paa_sum, symbol_id, symbol): equi-depth SAX symbol
    stream over the densified hourly event-count series."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("c"))
    dens = (
        spark.range(0, b.mx - b.mn + 1)
        .select(F.col("id").cast("long").alias("h"))
        .withColumn("hour", F.col("h") + F.lit(int(b.mn)))
        .join(counts, "hour", "left")
        .select("h", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    paa = (
        dens.groupBy(F.expr(f"h DIV {SAX_FRAME_H}").alias("frame"))
        .agg(F.sum("c").cast("long").alias("paa_sum"))
    )
    nf = F.broadcast(paa.agg(F.count("*").cast("long").alias("nf")))
    hist = paa.groupBy("paa_sum").agg(F.count("*").cast("long").alias("m"))
    wcum = W.orderBy("paa_sum").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        "paa_sum", F.sum("m").over(wcum).cast("long").alias("cm")
    )
    ranks = F.broadcast(
        spark.range(1, SAX_ALPHA)
        .select(F.col("id").cast("long").alias("i"))
        .crossJoin(nf)
        .select("i", F.expr(f"CAST((i * nf) DIV {SAX_ALPHA} AS BIGINT)").alias("k"))
    )
    bps = F.broadcast(
        cum.join(ranks, F.col("cm") >= F.col("k"))
        .groupBy("i")
        .agg(F.min("paa_sum").cast("long").alias("bp"))
    )
    sym = (
        paa.crossJoin(bps)
        .groupBy("frame", "paa_sum")
        .agg(
            F.sum(F.expr("CAST(paa_sum > bp AS BIGINT)"))
            .cast("long")
            .alias("symbol_id")
        )
    )
    return sym.select(
        "frame",
        F.expr("CAST(frame DIV 4 AS BIGINT)").alias("day"),
        "paa_sum",
        "symbol_id",
        F.expr("substr('abcd', CAST(symbol_id AS INT) + 1, 1)").alias("symbol"),
    )


def _sql_sax() -> str:
    return f"""
WITH xb AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) // 3600 AS mn,
         CAST(floor(epoch(max(ts))) AS BIGINT) // 3600 AS mx
  FROM events
),
xcnt AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
xdens AS (
  SELECT g.hh - xb.mn AS h, CAST(coalesce(xcnt.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(range((SELECT mn FROM xb), (SELECT mx + 1 FROM xb)))
          AS hh) g
  CROSS JOIN xb
  LEFT JOIN xcnt ON xcnt.hour = g.hh
),
xpaa AS (
  SELECT h // {SAX_FRAME_H} AS frame, CAST(sum(c) AS BIGINT) AS paa_sum
  FROM xdens GROUP BY 1
),
xnf AS (SELECT CAST(count(*) AS BIGINT) AS nf FROM xpaa),
xcum AS (
  SELECT paa_sum,
         CAST(sum(count(*)) OVER (ORDER BY paa_sum
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cm
  FROM xpaa GROUP BY paa_sum
),
xranks AS (
  SELECT i, CAST((i * nf) // {SAX_ALPHA} AS BIGINT) AS k
  FROM (SELECT unnest(range(1, {SAX_ALPHA})) AS i) CROSS JOIN xnf
),
xbps AS (
  SELECT i, CAST(min(paa_sum) AS BIGINT) AS bp
  FROM xcum JOIN xranks ON cm >= k GROUP BY 1
),
xsym AS (
  SELECT frame, paa_sum,
         CAST(sum(CASE WHEN paa_sum > bp THEN 1 ELSE 0 END) AS BIGINT)
           AS symbol_id
  FROM xpaa CROSS JOIN xbps GROUP BY 1, 2
)
SELECT frame, frame // 4 AS day, paa_sum, symbol_id,
       substr('abcd', CAST(symbol_id AS INT) + 1, 1) AS symbol
FROM xsym
"""


QUERIES["events_sax_symbolize"] = (events_sax_symbolize, _sql_sax())


# ---------------------------------- binary-segmentation changepoint

# The OFFLINE changepoint locator the monitoring family was missing:
# events_cusum_changepoint detects ONLINE (sequential alarm, detection
# delay), events_anomaly_zscore flags POINT outliers — binary
# segmentation (Scott & Knott 1974; the AMOC case) finds the single
# best RETROSPECTIVE split of the series mean. Statistic: the scaled
# CUSUM deviation C_t = |T * S_t - t * S_T| (S_t = prefix sum), which
# is T * t * (T - t) * |mean_left - mean_right| / T ... all INTEGER —
# no division at all until reporting; argmax over t with min-t
# tie-break (the events_ks_test c_at_max idiom).
#
# Planted-contrast synthesis (events_theilsen_trend discipline): the
# densified hourly count series evaluated twice — 'null' raw, and
# 'planted' with a level shift of max(10, mean/2) (data-derived, so
# the contrast survives every scale) starting at cp = 2T/5. Pins:
# planted t* lands within +/-2 hours of cp and planted C_max dominates
# the null maximum by >= 3x.
#
# Scale shape: one events scan -> hour groupBy; the cumsum window and
# argmax run on the span-bounded 720-row grid.

BSEG_CP_NUM, BSEG_CP_DEN = 2, 5  # planted changepoint at 2T/5


def events_binseg_changepoint(spark, sf_dir):
    """(series, n_hours, cp_planted, shift, t_star, c_max): best single
    mean-shift split of the hourly series by the integer scaled-CUSUM
    statistic, on the raw and planted-shift series."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("c"))
    dens = (
        spark.range(0, b.mx - b.mn + 1)
        .select(F.col("id").cast("long").alias("h"))
        .withColumn("hour", F.col("h") + F.lit(int(b.mn)))
        .join(counts, "hour", "left")
        .select("h", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    tot = F.broadcast(
        dens.agg(
            F.count("*").cast("long").alias("t_n"),
            F.sum("c").cast("long").alias("s_n"),
        ).select(
            "t_n",
            "s_n",
            F.expr(
                "CAST(greatest(10, (s_n DIV t_n) DIV 2) AS BIGINT)"
            ).alias("shift"),
            F.expr(
                f"CAST(({BSEG_CP_NUM} * t_n) DIV {BSEG_CP_DEN} AS BIGINT)"
            ).alias("cp"),
        )
    )
    ser = (
        dens.crossJoin(tot)
        .select(
            F.lit("null").alias("series"),
            "h",
            F.col("c").alias("y"),
            "t_n",
            "cp",
            "shift",
        )
        .unionByName(
            dens.crossJoin(tot).select(
                F.lit("planted").alias("series"),
                "h",
                F.expr(
                    "CAST(c + CASE WHEN h >= cp THEN shift ELSE 0 END"
                    " AS BIGINT)"
                ).alias("y"),
                "t_n",
                "cp",
                "shift",
            )
        )
    )
    wcum = W.partitionBy("series").orderBy("h").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = ser.select(
        "series",
        "h",
        "t_n",
        "cp",
        "shift",
        F.sum("y").over(wcum).cast("long").alias("s_t"),
    )
    stot = cum.groupBy("series").agg(F.max("s_t").cast("long").alias("s_all"))
    dev = (
        cum.join(F.broadcast(stot), "series")
        .filter(F.col("h") < F.col("t_n") - 1)
        .select(
            "series",
            "t_n",
            "cp",
            "shift",
            (F.col("h") + 1).alias("t"),
            F.expr(
                "CAST(abs(t_n * s_t - (h + 1) * s_all) AS BIGINT)"
            ).alias("cdev"),
        )
    )
    mx = dev.groupBy("series").agg(F.max("cdev").cast("long").alias("c_max"))
    att = (
        dev.join(F.broadcast(mx), "series")
        .filter(F.col("cdev") == F.col("c_max"))
        .groupBy("series")
        .agg(
            F.min("t").cast("long").alias("t_star"),
            F.first("t_n").alias("n_hours"),
            F.first("cp").alias("cp_planted"),
            F.first("shift").alias("shift"),
            F.first("c_max").alias("c_max"),
        )
    )
    return att.select(
        "series", "n_hours", "cp_planted", "shift", "t_star", "c_max"
    )


def _sql_binseg() -> str:
    return f"""
WITH bgb AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) // 3600 AS mn,
         CAST(floor(epoch(max(ts))) AS BIGINT) // 3600 AS mx
  FROM events
),
bgc AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
bgd AS (
  SELECT g.hh - bgb.mn AS h, CAST(coalesce(bgc.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(range((SELECT mn FROM bgb), (SELECT mx + 1 FROM bgb)))
          AS hh) g
  CROSS JOIN bgb
  LEFT JOIN bgc ON bgc.hour = g.hh
),
bgt AS (
  SELECT CAST(count(*) AS BIGINT) AS t_n, CAST(sum(c) AS BIGINT) AS s_n,
         CAST(greatest(10, (sum(c) // count(*)) // 2) AS BIGINT) AS shift,
         CAST(({BSEG_CP_NUM} * count(*)) // {BSEG_CP_DEN} AS BIGINT) AS cp
  FROM bgd
),
bgs AS (
  SELECT 'null' AS series, h, c AS y, t_n, cp, shift
  FROM bgd CROSS JOIN bgt
  UNION ALL
  SELECT 'planted', h,
         CAST(c + CASE WHEN h >= cp THEN shift ELSE 0 END AS BIGINT),
         t_n, cp, shift
  FROM bgd CROSS JOIN bgt
),
bgcum AS (
  SELECT series, h, t_n, cp, shift,
         CAST(sum(y) OVER (PARTITION BY series ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS s_t
  FROM bgs
),
bgst AS (
  SELECT series, CAST(max(s_t) AS BIGINT) AS s_all FROM bgcum GROUP BY 1
),
bgdev AS (
  SELECT c.series, c.t_n, c.cp, c.shift, CAST(c.h + 1 AS BIGINT) AS t,
         CAST(abs(c.t_n * c.s_t - (c.h + 1) * s.s_all) AS BIGINT) AS cdev
  FROM bgcum c JOIN bgst s USING (series)
  WHERE c.h < c.t_n - 1
),
bgmx AS (
  SELECT series, CAST(max(cdev) AS BIGINT) AS c_max FROM bgdev GROUP BY 1
)
SELECT d.series,
       CAST(min(d.t_n) AS BIGINT) AS n_hours,
       CAST(min(d.cp) AS BIGINT) AS cp_planted,
       CAST(min(d.shift) AS BIGINT) AS shift,
       CAST(min(d.t) AS BIGINT) AS t_star,
       CAST(min(m.c_max) AS BIGINT) AS c_max
FROM bgdev d JOIN bgmx m ON d.series = m.series AND d.cdev = m.c_max
GROUP BY 1
"""


QUERIES["events_binseg_changepoint"] = (
    events_binseg_changepoint,
    _sql_binseg(),
)


# ------------------------------------------------- Mann-Kendall trend

# The nonparametric trend TEST that classically pairs with the
# Theil-Sen slope ESTIMATE (events_theilsen_trend — Sen's 1968 paper is
# literally the estimator for Mann-Kendall's statistic): S = SUM_{i<j}
# sign(y_j - y_i), with tie-corrected variance
#   Var(S) = [T(T-1)(2T+5) - SUM_t t(t-1)(2t+5)] / 18
# and the continuity-corrected z = (|S| - 1)/sqrt(Var). Everything
# integer: S is a count difference over the same span-bounded pair join
# Theil-Sen uses, the variance is exact int64, and
# z2_milli = (18000 * (|S|-1)^2) DIV denom needs only one floored
# division (overflow: (|S|-1)^2 <= (T(T-1)/2)^2 ~ 6.7e10, x18000 ~
# 1.2e15).
#
# Planted-contrast: the same densified hourly grid evaluated raw
# ('null' — a single test draw, never pinned absolutely) and with a
# planted +MK_TREND/hour drift ('planted' — must exceed the chi^2(1)
# 95% critical value, and its S must be positive, agreeing with the
# Theil-Sen slope sign: the two operators are cross-pinned).

MK_TREND = 2  # planted per-hour drift
MK_SIG_MILLI = 3841


def events_mannkendall_test(spark, sf_dir):
    """(series, n_hours, s_stat, tie_term, z2_milli, significant):
    tie-corrected Mann-Kendall trend test on the raw and planted-drift
    hourly series."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("c"))
    dens = (
        spark.range(0, b.mx - b.mn + 1)
        .select(F.col("id").cast("long").alias("h"))
        .withColumn("hour", F.col("h") + F.lit(int(b.mn)))
        .join(counts, "hour", "left")
        .select("h", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    ser = dens.select(
        F.lit("null").alias("series"), "h", F.col("c").alias("y")
    ).unionByName(
        dens.select(
            F.lit("planted").alias("series"),
            "h",
            (F.col("c") + MK_TREND * F.col("h")).cast("long").alias("y"),
        )
    )
    p1 = ser.select("series", F.col("h").alias("h1"), F.col("y").alias("y1"))
    p2 = ser.select("series", F.col("h").alias("h2"), F.col("y").alias("y2"))
    s_df = (
        p1.join(p2, "series")
        .filter(F.col("h1") < F.col("h2"))
        .groupBy("series")
        .agg(
            F.sum(F.expr("CAST(sign(y2 - y1) AS BIGINT)"))
            .cast("long")
            .alias("s_stat"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    ties = (
        ser.groupBy("series", "y")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("series")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
            .cast("long")
            .alias("tie_term"),
            F.count("*").cast("long").alias("n_vals"),
        )
    )
    nh = ser.groupBy("series").agg(F.count("*").cast("long").alias("n_hours"))
    z2 = (
        "CASE WHEN n_hours * (n_hours - 1) * (2 * n_hours + 5) - tie_term"
        " <= 0 THEN CAST(0 AS BIGINT) ELSE"
        " CAST((18000 * (abs(s_stat) - 1) * (abs(s_stat) - 1))"
        " DIV (n_hours * (n_hours - 1) * (2 * n_hours + 5) - tie_term)"
        " AS BIGINT) END"
    )
    return (
        s_df.join(ties, "series")
        .join(nh, "series")
        .select(
            "series",
            "n_hours",
            "s_stat",
            "tie_term",
            F.expr(z2).alias("z2_milli"),
            F.expr(f"({z2}) >= {MK_SIG_MILLI}").alias("significant"),
        )
    )


def _sql_mannkendall() -> str:
    z2 = (
        "CASE WHEN n_hours * (n_hours - 1) * (2 * n_hours + 5) - tie_term"
        " <= 0 THEN CAST(0 AS BIGINT) ELSE"
        " CAST((18000 * (abs(s_stat) - 1) * (abs(s_stat) - 1))"
        " // (n_hours * (n_hours - 1) * (2 * n_hours + 5) - tie_term)"
        " AS BIGINT) END"
    )
    return f"""
WITH mkb AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) // 3600 AS mn,
         CAST(floor(epoch(max(ts))) AS BIGINT) // 3600 AS mx
  FROM events
),
mkc AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
mkd AS (
  SELECT g.hh - mkb.mn AS h, CAST(coalesce(mkc.c, 0) AS BIGINT) AS c
  FROM (SELECT unnest(range((SELECT mn FROM mkb), (SELECT mx + 1 FROM mkb)))
          AS hh) g
  CROSS JOIN mkb
  LEFT JOIN mkc ON mkc.hour = g.hh
),
mks AS (
  SELECT 'null' AS series, h, c AS y FROM mkd
  UNION ALL
  SELECT 'planted', h, CAST(c + {MK_TREND} * h AS BIGINT) FROM mkd
),
mkst AS (
  SELECT a.series,
         CAST(sum(sign(b2.y2 - a.y1)) AS BIGINT) AS s_stat
  FROM (SELECT series, h AS h1, y AS y1 FROM mks) a
  JOIN (SELECT series, h AS h2, y AS y2 FROM mks) b2
    ON a.series = b2.series AND a.h1 < b2.h2
  GROUP BY 1
),
mkt AS (
  SELECT series,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT series, y, CAST(count(*) AS BIGINT) AS t
        FROM mks GROUP BY 1, 2)
  GROUP BY 1
),
mkn AS (
  SELECT series, CAST(count(*) AS BIGINT) AS n_hours FROM mks GROUP BY 1
)
SELECT s.series, n.n_hours, s.s_stat, t.tie_term,
       {z2} AS z2_milli,
       ({z2}) >= {MK_SIG_MILLI} AS significant
FROM mkst s JOIN mkt t USING (series) JOIN mkn n USING (series)
"""


QUERIES["events_mannkendall_test"] = (
    events_mannkendall_test,
    _sql_mannkendall(),
)


# ------------------------------------------- Haar wavelet synopsis

# Matias-Vitter-Wang (SIGMOD 1998): wavelet synopses — keep the B
# largest-energy Haar coefficients of a series and answer range/point
# queries from the sketch. The approximation-quality question ("is a
# wavelet synopsis worth it over an equi-width histogram at the same
# budget?") is answered here EXACTLY on the hourly event series: with
# UNNORMALIZED Haar details d(l,k) = S_left - S_right (pure prefix-sum
# differences), orthogonality gives Parseval in integers —
#   2^L * SSE(drop set D) = SUM_D d^2 * 2^(L-l)
# — so both synopses' sum-squared-errors are exact int64 "energy
# units" (x 2^L), no float reconstruction anywhere. The pytest
# reconstructs the kept-coefficient series with exact Fractions and
# machine-checks the Parseval identity, then verifies the histogram
# SSE by brute force.
#
# Series: the first HAAR_T = 512 = 2^9 hours of the densified grid
# (dyadic truncation, documented); budget HAAR_B = 32 NUMBERS — the
# global average term plus the top B-1 details (charging the mean to
# the budget keeps the comparison fair) — vs a 32-bucket equi-width
# histogram (512/32 = 16-hour buckets,
# SSE * 2^L = 2^L * SUM x^2 - 32 * SUM S_b^2 exactly).
#
# Scale shape: one events scan; everything downstream lives on the
# 512-row grid / 511-coefficient frame (the prefix table is a 513-row
# broadcast; coefficient lookups are three small equi-joins).

HAAR_L = 9  # T = 2^9 = 512 hours
HAAR_B = 32  # synopsis budget (coefficients / histogram buckets)


def events_haar_synopsis(spark, sf_dir):
    """(t_n, n_coeffs, budget, total_detail_units, sse_haar_units,
    sse_hist_units, haar_wins): top-B Haar energy synopsis vs the
    equal-budget equi-width histogram, SSEs in exact 2^L-scaled
    units."""
    t_n = 1 << HAAR_L
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("c"))
    dens = (
        spark.range(0, t_n)
        .select(F.col("id").cast("long").alias("h"))
        .withColumn("hour", F.col("h") + F.lit(int(b.mn)))
        .join(counts, "hour", "left")
        .select("h", F.coalesce("c", F.lit(0)).cast("long").alias("x"))
    )
    wp = W.orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = dens.select(
        (F.col("h") + 1).alias("i"), F.sum("x").over(wp).cast("long").alias("p")
    )
    pre = F.broadcast(
        pre.unionByName(
            dens.sparkSession.range(1).select(
                F.lit(0).cast("long").alias("i"), F.lit(0).cast("long").alias("p")
            )
        )
    )
    lv = (
        spark.range(1, HAAR_L + 1)
        .select(F.col("id").cast("long").alias("l"))
        .select(
            "l",
            F.explode(
                F.expr(f"sequence(CAST(0 AS BIGINT), shiftleft(1, {HAAR_L} - CAST(l AS INT)) - 1)")
            ).alias("k"),
        )
        .select(
            "l",
            "k",
            F.expr("k * shiftleft(1, CAST(l AS INT))").alias("i0"),
            F.expr(
                "k * shiftleft(1, CAST(l AS INT))"
                " + shiftleft(1, CAST(l AS INT) - 1)"
            ).alias("im"),
            F.expr("(k + 1) * shiftleft(1, CAST(l AS INT))").alias("i1"),
        )
    )
    p0 = pre.select(F.col("i").alias("i0"), F.col("p").alias("pa"))
    pm = pre.select(F.col("i").alias("im"), F.col("p").alias("pb"))
    p1 = pre.select(F.col("i").alias("i1"), F.col("p").alias("pc"))
    co = (
        lv.join(p0, "i0")
        .join(pm, "im")
        .join(p1, "i1")
        .select(
            "l",
            "k",
            F.expr("2 * pb - pa - pc").cast("long").alias("d"),
        )
        .select(
            "l",
            "k",
            F.expr(
                f"CAST(d * d * shiftleft(1, {HAAR_L} - CAST(l AS INT))"
                " AS BIGINT)"
            ).alias("eu"),
        )
    )
    wt = W.orderBy(F.col("eu").desc(), F.col("l").asc(), F.col("k").asc())
    ranked = co.withColumn("rk", F.row_number().over(wt))
    tot = ranked.agg(
        F.count("*").cast("long").alias("n_coeffs"),
        F.sum("eu").cast("long").alias("total_detail_units"),
        F.sum(
            F.when(F.col("rk") > HAAR_B - 1, F.col("eu")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("sse_haar_units"),
    )
    hist = (
        dens.groupBy(F.expr(f"h DIV {t_n // HAAR_B}").alias("bk"))
        .agg(F.sum("x").cast("long").alias("sb"))
        .agg(F.sum(F.expr("sb * sb")).cast("long").alias("ssb"))
    )
    x2 = dens.agg(F.sum(F.expr("x * x")).cast("long").alias("sx2"))
    return (
        tot.crossJoin(F.broadcast(hist))
        .crossJoin(F.broadcast(x2))
        .select(
            F.lit(t_n).cast("long").alias("t_n"),
            "n_coeffs",
            F.lit(HAAR_B).cast("long").alias("budget"),
            "total_detail_units",
            "sse_haar_units",
            F.expr(
                f"CAST({t_n} * sx2 - {t_n // (t_n // HAAR_B)} * ssb"
                " AS BIGINT)"
            ).alias("sse_hist_units"),
            F.expr(
                f"sse_haar_units <= {t_n} * sx2"
                f" - {t_n // (t_n // HAAR_B)} * ssb"
            ).alias("haar_wins"),
        )
    )


def _sql_haar() -> str:
    t_n = 1 << HAAR_L
    w = t_n // HAAR_B
    return f"""
WITH hab AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) // 3600 AS mn FROM events
),
hac AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
had AS (
  SELECT g.h, CAST(coalesce(hac.c, 0) AS BIGINT) AS x
  FROM (SELECT unnest(range({t_n})) AS h) g
  CROSS JOIN hab
  LEFT JOIN hac ON hac.hour = g.h + hab.mn
),
hap AS (
  SELECT h + 1 AS i,
         CAST(sum(x) OVER (ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS p
  FROM had
  UNION ALL SELECT 0, 0
),
halv AS (
  SELECT l, unnest(range((CAST(1 AS BIGINT) << ({HAAR_L} - CAST(l AS INT)))))
           AS k
  FROM (SELECT unnest(range(1, {HAAR_L} + 1)) AS l)
),
haco AS (
  SELECT v.l, v.k,
         CAST((2 * pm.p - p0.p - p1.p)
              * (2 * pm.p - p0.p - p1.p)
              * (CAST(1 AS BIGINT) << ({HAAR_L} - CAST(v.l AS INT)))
              AS BIGINT) AS eu
  FROM (
    SELECT l, k,
           k * (CAST(1 AS BIGINT) << CAST(l AS INT)) AS i0,
           k * (CAST(1 AS BIGINT) << CAST(l AS INT))
             + (CAST(1 AS BIGINT) << (CAST(l AS INT) - 1)) AS im,
           (k + 1) * (CAST(1 AS BIGINT) << CAST(l AS INT)) AS i1
    FROM halv
  ) v
  JOIN hap p0 ON p0.i = v.i0
  JOIN hap pm ON pm.i = v.im
  JOIN hap p1 ON p1.i = v.i1
),
hark AS (
  SELECT eu, row_number() OVER (ORDER BY eu DESC, l ASC, k ASC) AS rk
  FROM haco
),
hatot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_coeffs,
         CAST(sum(eu) AS BIGINT) AS total_detail_units,
         CAST(sum(CASE WHEN rk > {HAAR_B} - 1 THEN eu ELSE 0 END) AS BIGINT)
           AS sse_haar_units
  FROM hark
),
hahist AS (
  SELECT CAST(sum(sb * sb) AS BIGINT) AS ssb FROM (
    SELECT CAST(sum(x) AS BIGINT) AS sb FROM had GROUP BY h // {w}
  )
),
hax2 AS (SELECT CAST(sum(x * x) AS BIGINT) AS sx2 FROM had)
SELECT CAST({t_n} AS BIGINT) AS t_n, t.n_coeffs,
       CAST({HAAR_B} AS BIGINT) AS budget,
       t.total_detail_units, t.sse_haar_units,
       CAST({t_n} * x.sx2 - {HAAR_B} * h.ssb AS BIGINT) AS sse_hist_units,
       t.sse_haar_units <= {t_n} * x.sx2 - {HAAR_B} * h.ssb AS haar_wins
FROM hatot t CROSS JOIN hahist h CROSS JOIN hax2 x
"""


QUERIES["events_haar_synopsis"] = (events_haar_synopsis, _sql_haar())


# ------------------------------------------- moving median vs moving mean

# The ES ``moving_percentiles`` pipeline aggregation, reframed as the
# windowed breakdown contrast the batch family already pins pointwise
# (events_robust_mean_eval): over the densified hourly count series, a
# trailing {MM_WIN}-hour window computes BOTH the exact mean (milli)
# and the exact lower median (order statistic) — once on the clean
# series and once with planted 1-in-{MM_OUT_MOD} spike hours inflated
# {MM_OUT_MULT}x. The median's bounded influence is the point: spiking
# <= 1 of {MM_WIN} window members moves the windowed median by at most
# one order-statistic step while the windowed mean absorbs the full
# spike mass — tests/test_session16_ops.py pins the full recompute AND
# the contrast (total |spiked - clean| deviation of the mean dominates
# the median's by >= 10x).
#
# Determinism: counts are exact ints; mean_milli = (1000 * sum) DIV n;
# the median is the (n+1) DIV 2 order statistic with the source-hour
# tie-break. Early hours run on their expanding prefix (win_n < MM_WIN,
# the standard treatment, identical in both engines).
#
# Scale shape: one hourly groupBy, then a bounded range self-join
# (24 rows per hour over a calendar-bounded grid) + one rank window —
# no corpus-sized state.

MM_WIN = 24
MM_OUT_MOD = 48  # ~1 in 48 hours carries a planted spike
MM_OUT_MULT = 20


def events_moving_median(spark, sf_dir):
    """(series, hour, x, win_n, mean_milli, median): trailing-window
    mean and median of the hourly count series, clean and with planted
    spikes."""
    from harvester_spark.operators.dedup import _hash56

    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    )
    b = ev.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx")).collect()[0]
    counts = ev.groupBy("hour").agg(F.count("*").cast("long").alias("x0"))
    dens = (
        spark.range(b.mn, b.mx + 1)
        .select(F.col("id").alias("hour"))
        .join(counts, "hour", "left")
        .select("hour", F.coalesce("x0", F.lit(0)).cast("long").alias("x0"))
        .withColumn(
            "spiked",
            F.expr(
                f"CAST(CASE WHEN CAST(conv(substring(md5(concat('out|',"
                f" CAST(hour AS STRING))), 1, 14), 16, 10) AS BIGINT)"
                f" % {MM_OUT_MOD} = 0 THEN x0 * {MM_OUT_MULT}"
                f" ELSE x0 END AS BIGINT)"
            ),
        )
    )
    series = dens.select(
        F.lit("clean").alias("series"), "hour", F.col("x0").alias("x")
    ).unionByName(
        dens.select(
            F.lit("spiked").alias("series"), "hour", F.col("spiked").alias("x")
        )
    )
    right = series.select(
        "series", F.col("hour").alias("h2"), F.col("x").alias("x2")
    )
    win = series.join(right, "series").filter(
        (F.col("h2") >= F.col("hour") - (MM_WIN - 1))
        & (F.col("h2") <= F.col("hour"))
    )
    wrank = W.partitionBy("series", "hour").orderBy("x2", "h2")
    ranked = win.withColumn("rn", F.row_number().over(wrank)).withColumn(
        "wn", F.count("*").over(W.partitionBy("series", "hour"))
    )
    agg = ranked.groupBy("series", "hour", "x").agg(
        F.max("wn").cast("long").alias("win_n"),
        F.expr("CAST(1000 * sum(x2) DIV max(wn) AS BIGINT)").alias(
            "mean_milli"
        ),
        F.max(F.expr("CASE WHEN rn = (wn + 1) DIV 2 THEN x2 END"))
        .cast("long")
        .alias("median"),
    )
    return agg.orderBy("series", "hour")


def _sql_moving_median() -> str:
    h56 = "CAST(('0x' || substr(md5('out|' || CAST(hour AS VARCHAR)), 1, 14)) AS BIGINT)"
    return f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour FROM events
),
bounds AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
counts AS (SELECT hour, CAST(count(*) AS BIGINT) AS x0 FROM ev GROUP BY 1),
dens AS (
  SELECT g.hour, CAST(coalesce(c.x0, 0) AS BIGINT) AS x0
  FROM (SELECT unnest(range((SELECT mn FROM bounds),
                            (SELECT mx FROM bounds) + 1)) AS hour) g
  LEFT JOIN counts c USING (hour)
),
spiked AS (
  SELECT hour, x0,
         CAST(CASE WHEN {h56} % {MM_OUT_MOD} = 0
              THEN x0 * {MM_OUT_MULT} ELSE x0 END AS BIGINT) AS xs
  FROM dens
),
series AS (
  SELECT 'clean' AS series, hour, x0 AS x FROM spiked
  UNION ALL
  SELECT 'spiked', hour, xs FROM spiked
),
win AS (
  SELECT s.series, s.hour, s.x, r.h2, r.x2
  FROM series s
  JOIN (SELECT series, hour AS h2, x AS x2 FROM series) r
    ON r.series = s.series
   AND r.h2 >= s.hour - {MM_WIN - 1} AND r.h2 <= s.hour
),
ranked AS (
  SELECT series, hour, x, x2,
         row_number() OVER (PARTITION BY series, hour ORDER BY x2, h2)
           AS rn,
         count(*) OVER (PARTITION BY series, hour) AS wn
  FROM win
)
SELECT series, hour, x,
       CAST(max(wn) AS BIGINT) AS win_n,
       CAST(1000 * sum(x2) // max(wn) AS BIGINT) AS mean_milli,
       CAST(max(CASE WHEN rn = (wn + 1) // 2 THEN x2 END) AS BIGINT)
         AS median
FROM ranked
GROUP BY series, hour, x
ORDER BY series, hour
"""


QUERIES["events_moving_median"] = (events_moving_median, _sql_moving_median())
