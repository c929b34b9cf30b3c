"""Relational operator coverage over the TPC-H-ish tables — the harvester's
dataflow operators (SURVEY.md §2) re-expressed on generic inputs.

Money aggregates sum exact integer cents (per-row double→cents rounding is
bit-identical across engines); window top-k always has a unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.operators.common import cents, load, sql_cents

# A4/A8-style exact aggregation (TPC-H Q1 shape).


def q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents("l_quantity")).alias("sum_qty_c"),
        F.sum(cents("l_extendedprice")).alias("sum_base_c"),
        F.sum(F.round(disc_price * 100).cast("long")).alias("sum_disc_c"),
        F.sum(F.round(charge * 100).cast("long")).alias("sum_charge_c"),
        F.count("*").alias("count_order"),
    )


SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum({sql_cents('l_quantity')}) AS BIGINT) AS sum_qty_c,
       CAST(sum({sql_cents('l_extendedprice')}) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# J1: the central product⋈files join — priority-ordered first-item merge
# (/root/reference/harvester/products/models/datatypes/product.py:81-167).


def j1_priority_first(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    first = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", cents("l_extendedprice").alias("first_price_c"))
    )
    return orders.join(
        first, orders.o_orderkey == first.l_orderkey, "left"
    ).select(
        "o_orderkey",
        F.col("l_partkey").alias("first_partkey"),
        "first_price_c",
        cents("o_totalprice").alias("total_c"),
    )


SQL_J1 = f"""
WITH ranked AS (
  SELECT l_orderkey, l_partkey, {sql_cents('l_extendedprice')} AS first_price_c,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
  FROM lineitem
)
SELECT o.o_orderkey, r.l_partkey AS first_partkey, r.first_price_c,
       {sql_cents('o.o_totalprice')} AS total_c
FROM orders o LEFT JOIN ranked r ON r.l_orderkey = o.o_orderkey AND r.rn = 1
"""

# J5-style broadcast dimension chain: customer → nation → region.


def j5_region_revenue(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    dims = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        orders.join(
            F.broadcast(dims.select("c_custkey", "r_name")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("r_name")
        .agg(
            F.sum(cents("o_totalprice")).alias("revenue_c"),
            F.count("*").alias("n_orders"),
        )
    )


SQL_J5 = f"""
SELECT r.r_name,
       CAST(sum({sql_cents('o.o_totalprice')}) AS BIGINT) AS revenue_c,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
"""

# J4 back_fill-deletes analogue: anti join.


def j4_anti_customers(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


SQL_J4 = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

# J8 multi-get / semi join.


def j8_semi_orders(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


SQL_J8 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
)
GROUP BY o_orderpriority
"""

# A1 facet/filter counts: (field, value, doc_count) across fields
# (/root/reference/harvester/search/views/document.py:129-142).


def a1_facet_counts(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    f1 = orders.groupBy(
        F.lit("o_orderstatus").alias("field"), F.col("o_orderstatus").alias("value")
    ).agg(F.count("*").alias("doc_count"))
    f2 = orders.groupBy(
        F.lit("o_orderpriority").alias("field"), F.col("o_orderpriority").alias("value")
    ).agg(F.count("*").alias("doc_count"))
    return f1.unionByName(f2)


SQL_A1 = """
SELECT 'o_orderstatus' AS field, o_orderstatus AS value, count(*) AS doc_count
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT 'o_orderpriority' AS field, o_orderpriority AS value, count(*) AS doc_count
FROM orders GROUP BY o_orderpriority
"""

# W2 latest-version-per-group (/root/reference/harvester/core/models/
# datatypes/dataset.py:57-102).


def w2_latest_event_per_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


SQL_W2 = """
SELECT user_id, event_id, event_type, ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""

# T1 pagination: page 2 (rows 21-40) of the ranked order list
# (/root/reference/harvester/search/views/document.py:28-29).


def t1_pagination(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    # page-k pagination = top-(page*size) then slice: orderBy+limit compiles
    # to TakeOrderedAndProject (per-partition heaps, driver merge of 40), so
    # the rank window covers 40 rows — never a global single-partition sort.
    # Deep pagination stays bounded the way OpenSearch bounds it (10k cap).
    top = orders.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).limit(40)
    w = W.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        top.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 20) & (F.col("rn") <= 40))
        .select("rn", "o_orderkey", cents("o_totalprice").alias("total_c"))
    )


SQL_T1 = f"""
WITH ranked AS (
  SELECT o_orderkey, {sql_cents('o_totalprice')} AS total_c,
         CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
  FROM orders
)
SELECT rn, o_orderkey, total_c FROM ranked WHERE rn > 20 AND rn <= 40
"""

# P6 modified_since incremental predicate (/root/reference/harvester/core/
# views/document.py:49-51).

CUTOFF = "2024-01-15 00:00:00"


def p6_modified_since(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") >= F.lit(CUTOFF).cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents("value")).alias("value_c"),
        )
    )


SQL_P6 = f"""
SELECT event_type, count(*) AS n_events,
       CAST(sum({sql_cents('value')}) AS BIGINT) AS value_c
FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
GROUP BY event_type
"""

# J7 set-integrity guard: historic vs current counts, 5% shrink flag
# (/root/reference/harvester/core/tasks/harvest/set.py:99-126).


def j7_set_integrity(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    cut = F.lit(CUTOFF).cast("timestamp")
    counts = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("n_historic"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("n_current"),
    )
    return counts.select(
        "event_type",
        "n_historic",
        "n_current",
        (
            (F.col("n_historic") >= 50)
            & (F.col("n_current") * 100 < F.col("n_historic") * 95)
        ).alias("should_replace"),
    )


SQL_J7 = f"""
WITH counts AS (
  SELECT event_type,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{CUTOFF}' THEN 1 ELSE 0 END) AS BIGINT) AS n_historic,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUTOFF}' THEN 1 ELSE 0 END) AS BIGINT) AS n_current
  FROM events GROUP BY event_type
)
SELECT event_type, n_historic, n_current,
       (n_historic >= 50 AND n_current * 100 < n_historic * 95) AS should_replace
FROM counts
"""

# §2.10 periodic-sync shape: tumbling-window counts on the event stream
# (batch equivalent of the Structured Streaming hourly rollup).


def events_hourly_rollup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    return ev.groupBy(hour.alias("hour_bucket"), F.col("event_type")).agg(
        F.count("*").alias("n_events"),
        F.sum(cents("value")).alias("value_c"),
    )


SQL_EVENTS_HOURLY = f"""
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket, event_type,
       count(*) AS n_events,
       CAST(sum({sql_cents('value')}) AS BIGINT) AS value_c
FROM events GROUP BY 1, 2
"""

# J8-srn multi-get: exact id lookup batch
# (/root/reference/harvester/search/views/document.py:186-227).


def srn_multiget(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id").isin(3, 7, 11, 13, 400)).select(
        "doc_id", "lang", "source", "n_chars"
    )


SQL_MULTIGET = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id IN (3, 7, 11, 13, 400)
"""

# T6 union of seed entities (/root/reference/harvester/sources/tasks/
# entities.py:14-77): two heterogeneous sources into one pipeline frame.


def t6_union_entities(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("entity_id"), F.lit("document").alias("kind")
    )
    vecs = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("entity_id"), F.lit("embedding").alias("kind")
    )
    return docs.unionByName(vecs).groupBy("kind").agg(F.count("*").alias("n"))


SQL_T6 = """
SELECT kind, count(*) AS n FROM (
  SELECT doc_id AS entity_id, 'document' AS kind FROM documents
  UNION ALL
  SELECT vec_id AS entity_id, 'embedding' AS kind FROM embeddings
) GROUP BY kind
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, SQL_Q1),
    "j1_priority_first": (j1_priority_first, SQL_J1),
    "j5_region_revenue": (j5_region_revenue, SQL_J5),
    "j4_anti_customers": (j4_anti_customers, SQL_J4),
    "j8_semi_orders": (j8_semi_orders, SQL_J8),
    "a1_facet_counts": (a1_facet_counts, SQL_A1),
    "w2_latest_event_per_user": (w2_latest_event_per_user, SQL_W2),
    "t1_pagination": (t1_pagination, SQL_T1),
    "p6_modified_since": (p6_modified_since, SQL_P6),
    "j7_set_integrity": (j7_set_integrity, SQL_J7),
    "events_hourly_rollup": (events_hourly_rollup, SQL_EVENTS_HOURLY),
    "srn_multiget": (srn_multiget, SQL_MULTIGET),
    "t6_union_entities": (t6_union_entities, SQL_T6),
}


# A2 frequency sync: corpus-wide value frequencies MERGEd into the metadata
# dimension — new values inserted, present ones updated, missing ones
# soft-deleted (/root/reference/harvester/metadata/tasks.py:31-85).

_A2_EXISTING = [("lang", "en"), ("lang", "fr"), ("lang", "xx"), ("source", "src0")]


def a2_frequency_sync(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select(F.lit("lang").alias("field"), F.col("lang").alias("value"))
        .unionByName(
            docs.select(F.lit("source").alias("field"), F.col("source").alias("value"))
        )
        .groupBy("field", "value")
        .agg(F.count("*").alias("frequency"))
    )
    existing = spark.createDataFrame(_A2_EXISTING, "field string, value string")
    merged = existing.withColumn("in_dim", F.lit(True)).join(
        freq, ["field", "value"], "full_outer"
    )
    status = (
        F.when(F.col("in_dim").isNull(), F.lit("new"))
        .when(F.col("frequency").isNull(), F.lit("deleted"))
        .otherwise(F.lit("updated"))
    )
    return merged.select(
        "field",
        "value",
        F.coalesce("frequency", F.lit(0)).alias("frequency"),
        status.alias("status"),
    )


_a2_vals = ", ".join(f"('{f}', '{v}')" for f, v in _A2_EXISTING)
SQL_A2 = f"""
WITH freq AS (
  SELECT field, value, count(*) AS frequency FROM (
    SELECT 'lang' AS field, lang AS value FROM documents
    UNION ALL
    SELECT 'source' AS field, source AS value FROM documents
  ) GROUP BY field, value
),
existing(field, value) AS (VALUES {_a2_vals})
SELECT coalesce(e.field, f.field) AS field,
       coalesce(e.value, f.value) AS value,
       coalesce(f.frequency, 0) AS frequency,
       CASE WHEN e.field IS NULL THEN 'new'
            WHEN f.frequency IS NULL THEN 'deleted'
            ELSE 'updated' END AS status
FROM existing e FULL OUTER JOIN freq f USING (field, value)
"""

QUERIES["a2_frequency_sync"] = (a2_frequency_sync, SQL_A2)


# A2b i18n facet dimension: facet values joined to a translations dimension
# (MetadataValue.translation → nl/en labels, is_hidden filter —
# /root/reference/harvester/metadata/models/value.py:21-64). Untranslated
# values fall back to the raw value as label; hidden values are excluded
# from the facet. The translations dimension is tiny → broadcast.

_TRANSLATIONS = [
    # (field, value, label_en, label_nl, is_hidden)
    ("lang", "en", "English", "Engels", False),
    ("lang", "nl", "Dutch", "Nederlands", False),
    ("lang", "unk", "Unknown", "Onbekend", False),
    ("source", "src0", "Source zero", "Bron nul", False),
    ("source", "src1", "Source one", "Bron een", True),  # hidden
]


def a2b_translated_facets(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select(F.lit("lang").alias("field"), F.col("lang").alias("value"))
        .unionByName(
            docs.select(F.lit("source").alias("field"), F.col("source").alias("value"))
        )
        .groupBy("field", "value")
        .agg(F.count("*").alias("frequency"))
    )
    trans = spark.createDataFrame(
        _TRANSLATIONS,
        "field string, value string, label_en string, label_nl string, is_hidden boolean",
    )
    joined = freq.join(F.broadcast(trans), ["field", "value"], "left")
    return (
        joined.filter(~F.coalesce(F.col("is_hidden"), F.lit(False)))
        .select(
            "field",
            "value",
            F.coalesce("label_en", "value").alias("label_en"),
            F.coalesce("label_nl", "value").alias("label_nl"),
            "frequency",
        )
    )


_trans_vals = ", ".join(
    f"('{f}', '{v}', '{en}', '{nl}', {str(h).upper()})"
    for f, v, en, nl, h in _TRANSLATIONS
)
SQL_A2B = f"""
WITH freq AS (
  SELECT field, value, count(*) AS frequency FROM (
    SELECT 'lang' AS field, lang AS value FROM documents
    UNION ALL
    SELECT 'source' AS field, source AS value FROM documents
  ) GROUP BY field, value
),
trans(field, value, label_en, label_nl, is_hidden) AS (VALUES {_trans_vals})
SELECT f.field, f.value,
       coalesce(t.label_en, f.value) AS label_en,
       coalesce(t.label_nl, f.value) AS label_nl,
       f.frequency
FROM freq f LEFT JOIN trans t USING (field, value)
WHERE NOT coalesce(t.is_hidden, FALSE)
"""

QUERIES["a2b_translated_facets"] = (a2b_translated_facets, SQL_A2B)


# A8 exact distinct counts (the reference keeps counts exact;
# approx_count_distinct stays an opt-in metric — SURVEY.md §2.4 A8).


def a8_distinct_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


SQL_A8 = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""

QUERIES["a8_distinct_users"] = (a8_distinct_users, SQL_A8)


# A9 grouping sets / ROLLUP: absent from the reference (SURVEY §2.4 A9) but
# table stakes for an analytics engine — subtotals + grand total in one pass.


def a9_rollup_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_extendedprice")).alias("rev_c"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "rev_c",
            "n_items",
        )
    )


SQL_A9 = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum({sql_cents('l_extendedprice')}) AS BIGINT) AS rev_c,
       count(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

QUERIES["a9_rollup_revenue"] = (a9_rollup_revenue, SQL_A9)


# Batch gap-sessionization over events — the distributed twin of the
# streaming stateful operator (streaming/sessionize.py, same 30-minute
# inactivity gap). With the streaming path's pandas oracle and this
# operator's DuckDB oracle, one contract is checked four ways:
# applyInPandasWithState == pandas fold == Spark window job == SQL
# (tests/test_text_analytics.py::TestEventsSessionize closes the square).
#
# Scale shape: ONE shuffle on user_id; both windows (lag, running sum) and
# the final groupBy reuse that partitioning (no second exchange — the
# classic sessionization plan). Millisecond integer arithmetic end to end:
# epoch-ms lag for the gap test, exact BIGINT sums, money as integer cents.

SESSION_GAP_MS = 30 * 60 * 1000  # == streaming/sessionize.GAP_MINUTES


def events_sessionize(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).withColumn(
        # ts is TIMESTAMP_NTZ; the session tz is pinned UTC (session.py), so
        # the cast keeps wall time == UTC epoch — identical to DuckDB's
        # naive-as-UTC epoch_ms
        "tms",
        F.unix_millis(F.col("ts").cast("timestamp")),
    )
    w = W.partitionBy("user_id").orderBy(F.col("tms").asc(), F.col("event_id").asc())
    prev = F.lag("tms").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("tms") - prev) > SESSION_GAP_MS), 1
    ).otherwise(0)
    run = (
        ev.withColumn("is_new", is_new)
        .withColumn(
            "session_seq",
            F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    return run.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(cents("value")).alias("value_cents"),
        (F.max("tms") - F.min("tms")).alias("duration_ms"),
    )


SQL_EVENTS_SESSIONIZE = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, value, epoch_ms(ts) AS tms FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN lag(tms) OVER w IS NULL
                OR tms - lag(tms) OVER w > {30 * 60 * 1000}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tms ASC, event_id ASC)
),
runs AS (
  SELECT *,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tms ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({sql_cents('value')}) AS BIGINT) AS value_cents,
       CAST(max(tms) - min(tms) AS BIGINT) AS duration_ms
FROM runs
GROUP BY user_id, session_seq
"""

QUERIES["events_sessionize"] = (events_sessionize, SQL_EVENTS_SESSIONIZE)


# -------------------------------------------------------- funnel / retention

# Ordered-funnel and cohort-retention analytics over ``events`` — the two
# standard product-analytics queries a webtext events stream feeds (the
# reference's metrics/ dashboards consume exactly these shapes from its
# OpenSearch aggregations; here they are relational plans). Both reuse the
# sessionize timestamp contract: TIMESTAMP_NTZ under the pinned-UTC session,
# integer epoch-ms end to end.
#
# Scale shape: every join/groupBy in the funnel chain is keyed user_id —
# ONE shuffle partitioning reused down the chain (step frames are
# aggregates of the same key, so AQE reuses the exchange); retention is a
# user_id agg + a (user, week) distinct + a tiny cohort-key agg. No
# windows, no skewed keys (user activity is bounded), no driver residency.

FUNNEL_STEPS = ("signup", "view", "purchase")


def events_funnel(spark, sf_dir):
    """Per-user ordered funnel over {FUNNEL_STEPS}: first signup, first
    view strictly after it, first purchase strictly after that —
    (user_id, t1_ms, t2_ms, t3_ms, depth), missing steps -1."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("tms"),
    )
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("tms").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("tms") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tms").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("tms") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("tms").alias("t3"))
    )
    out = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    depth = (
        F.lit(1)
        + F.col("t2").isNotNull().cast("int")
        + F.col("t3").isNotNull().cast("int")
    ).cast("long")
    return out.select(
        "user_id",
        F.col("t1").alias("t1_ms"),
        F.coalesce(F.col("t2"), F.lit(-1)).alias("t2_ms"),
        F.coalesce(F.col("t3"), F.lit(-1)).alias("t3_ms"),
        depth.alias("depth"),
    )


SQL_EVENTS_FUNNEL = f"""
WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
s1 AS (
  SELECT user_id, min(tms) AS t1 FROM ev
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.tms) AS t2
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.tms > s1.t1
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.tms) AS t3
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.tms > s2.t2
  GROUP BY 1
)
SELECT s1.user_id,
       t1 AS t1_ms,
       coalesce(t2, -1) AS t2_ms,
       coalesce(t3, -1) AS t3_ms,
       CAST(1 + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT)
            AS BIGINT) AS depth
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""

QUERIES["events_funnel"] = (events_funnel, SQL_EVENTS_FUNNEL)

WEEK_MS = 7 * 86_400_000


def events_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by the epoch-week of their
    FIRST event; one row per (cohort_week, week_offset) with the count of
    cohort users active in that week."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_millis(F.col("ts").cast("timestamp")) / WEEK_MS)
        .cast("long")
        .alias("wk"),
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


SQL_EVENTS_RETENTION = f"""
WITH ev AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // {WEEK_MS} AS wk FROM events
),
first AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1)
SELECT cohort_week, wk - cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ev JOIN first USING (user_id)
GROUP BY 1, 2
"""

QUERIES["events_retention"] = (events_retention, SQL_EVENTS_RETENTION)


# ------------------------------------------------------------- as-of join

# The driver brief names as-of joins a first-class custom operator Spark
# lacks. Spark-first form: the UNION-WINDOW technique — tag dimension and
# fact rows, union, and carry the last dimension value forward with
# last(ignorenulls) over an event-time window per key. ONE shuffle on the
# join key, no inequality join, no BroadcastNestedLoopJoin (plan-guarded);
# on a real cluster a skewed key set gets salted by time range first.
# Oracle: DuckDB's native ASOF LEFT JOIN — an independent implementation
# of the same semantics, so the value hash cross-checks the union-window
# trick against a purpose-built engine feature.
#
# Dimension synthesis (no rates table in testdata): a slowly-changing
# per-event_type daily rate, kept only every third day so the as-of MUST
# reach back across days (and events before the first retained day get
# NULL — the left-join contract). Rates derive from md5(type:day), so the
# dimension is a pure function of the events table.

_ASOF_DAY = 86400


def _asof_dim(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / _ASOF_DAY).cast("long")
    dim = (
        ev.select("event_type", day.alias("day_int"))
        .distinct()
        .filter(F.col("day_int") % 3 == 0)
    )
    rate = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("event_type"), F.col("day_int").cast("string"))
                ),
                1,
                14,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return dim.select(
        "event_type",
        (F.col("day_int") * _ASOF_DAY).alias("eff_epoch"),
        rate.alias("rate_cents"),
    )


_SQL_ASOF_DIM = f"""
  SELECT event_type, day_int * {_ASOF_DAY} AS eff_epoch,
         CAST(('0x' || substr(md5(event_type || ':' || CAST(day_int AS VARCHAR)), 1, 14)) AS BIGINT) % 10000 AS rate_cents
  FROM (SELECT DISTINCT event_type,
               CAST(floor(epoch(ts) / {_ASOF_DAY}) AS BIGINT) AS day_int
        FROM events)
  WHERE day_int % 3 = 0
"""


def j9_asof_rates(spark, sf_dir):
    """Each event joined to the latest dimension rate effective at or
    before its timestamp: (event_id, event_type, ev_epoch, rate_cents
    NULLable)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("ev_epoch"),
    )
    dim = _asof_dim(spark, sf_dir)
    tagged = ev.select(
        "event_type",
        F.col("ev_epoch").alias("epoch"),
        F.lit(0).alias("is_dim"),
        F.lit(None).cast("long").alias("rate"),
        "event_id",
    ).unionByName(
        dim.select(
            "event_type",
            F.col("eff_epoch").alias("epoch"),
            F.lit(1).alias("is_dim"),
            F.col("rate_cents").alias("rate"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy(F.col("epoch").asc(), F.col("is_dim").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "rate_cents", F.last("rate", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("is_dim") == 0).select(
        "event_id",
        "event_type",
        F.col("epoch").alias("ev_epoch"),
        "rate_cents",
    )


SQL_J9_ASOF = f"""
WITH dim AS ({_SQL_ASOF_DIM}),
ev AS (
  SELECT event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ev_epoch
  FROM events
)
SELECT ev.event_id, ev.event_type, ev.ev_epoch, dim.rate_cents
FROM ev ASOF LEFT JOIN dim
  ON ev.event_type = dim.event_type AND ev.ev_epoch >= dim.eff_epoch
"""

QUERIES["j9_asof_rates"] = (j9_asof_rates, SQL_J9_ASOF)


# ------------------------------------------------------------- range join

# The second custom join the driver brief names. A naive interval-
# containment join compiles to BroadcastNestedLoopJoin (the scale-killer);
# the Spark-first form BUCKETS the time axis: each window explodes into the
# hour buckets it covers (bounded by its duration), events key to their own
# hour bucket, and the join is a pure equi-join on (event_type, bucket)
# with the range predicate as a post-filter. Plan-guarded: no BNLJ, no
# cartesian. Window synthesis: one maintenance window per (event_type,
# even day) with md5-derived non-hour-aligned start and 1-4 h duration
# (never crossing midnight, so windows of one type never overlap and the
# bucket explode adds no duplicates).

_RJ_BUCKET = 3600


def _maintenance_windows(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / _ASOF_DAY).cast("long")
    base = (
        ev.select("event_type", day.alias("win_day"))
        .distinct()
        .filter(F.col("win_day") % 2 == 0)
    )

    def h(prefix):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(prefix),
                        F.col("event_type"),
                        F.col("win_day").cast("string"),
                    )
                ),
                1,
                14,
            ),
            16,
            10,
        ).cast("long")

    start = F.col("win_day") * _ASOF_DAY + h("s") % 64800
    dur = F.lit(3600) + h("d") % 10800
    return base.select(
        "event_type",
        "win_day",
        start.alias("start_epoch"),
        (start + dur).alias("end_epoch"),
    )


_SQL_MAINT_WINDOWS = f"""
  SELECT event_type, win_day,
         win_day * {_ASOF_DAY}
           + CAST(('0x' || substr(md5('s' || ':' || event_type || ':' || CAST(win_day AS VARCHAR)), 1, 14)) AS BIGINT) % 64800 AS start_epoch,
         win_day * {_ASOF_DAY}
           + CAST(('0x' || substr(md5('s' || ':' || event_type || ':' || CAST(win_day AS VARCHAR)), 1, 14)) AS BIGINT) % 64800
           + 3600 + CAST(('0x' || substr(md5('d' || ':' || event_type || ':' || CAST(win_day AS VARCHAR)), 1, 14)) AS BIGINT) % 10800 AS end_epoch
  FROM (SELECT DISTINCT event_type,
               CAST(floor(epoch(ts) / {_ASOF_DAY}) AS BIGINT) AS win_day
        FROM events)
  WHERE win_day % 2 = 0
"""


def j10_range_join_windows(spark, sf_dir):
    """Events inside their type's maintenance windows:
    (event_id, event_type, ev_epoch, win_day, start_epoch, end_epoch)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("ev_epoch"),
    )
    win = _maintenance_windows(spark, sf_dir)
    win_b = win.select(
        "*",
        F.explode(
            F.expr(
                f"sequence(start_epoch DIV {_RJ_BUCKET},"
                f" (end_epoch - 1) DIV {_RJ_BUCKET})"
            )
        ).alias("bucket"),
    )
    ev_b = ev.withColumn("bucket", F.expr(f"ev_epoch DIV {_RJ_BUCKET}"))
    return (
        ev_b.join(win_b, ["event_type", "bucket"])
        .filter(
            (F.col("ev_epoch") >= F.col("start_epoch"))
            & (F.col("ev_epoch") < F.col("end_epoch"))
        )
        .select(
            "event_id", "event_type", "ev_epoch", "win_day",
            "start_epoch", "end_epoch",
        )
    )


SQL_J10_RANGE = f"""
WITH win AS ({_SQL_MAINT_WINDOWS}),
ev AS (
  SELECT event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ev_epoch
  FROM events
)
SELECT ev.event_id, ev.event_type, ev.ev_epoch, win.win_day,
       win.start_epoch, win.end_epoch
FROM ev JOIN win ON ev.event_type = win.event_type
                AND ev.ev_epoch >= win.start_epoch
                AND ev.ev_epoch < win.end_epoch
"""

QUERIES["j10_range_join_windows"] = (j10_range_join_windows, SQL_J10_RANGE)


# ----------------------------------------------------- Z-order data layout

# Multi-dimensional data clustering for scan pruning — the lakehouse
# OPTIMIZE ZORDER BY (c1, c2) operation (Delta/Iceberg): interleave the
# bits of the per-dimension codes so rows close in BOTH dimensions land in
# the same file, giving every file tight min/max stats on BOTH columns —
# the stats a format-level reader uses to skip files for 2-D predicates.
# Output is the layout's stats table (file_id, n_rows, per-dim min/max):
# exactly what the pruning decision consumes; clustering quality (mean
# bounding-box area ≪ a row-order layout's) is test-pinned.
#
# Scale shape: ONE scalar min/max agg (broadcast as literals), then the
# scaled codes, 32-bit Morton interleave and file assignment are pure
# integer map expressions; the only keyed shuffle is the groupBy(file_id)
# stats agg. No global sort: files are fixed-width zval ranges (uniform
# dims → balanced files; a production pass would range-partition by
# sampled zval quantiles — same dataflow, one extra sampling agg). File
# COUNT is derived from corpus size (derive_n_planes contract):
# n_files = max(n // Z_ROWS_PER_FILE, 1).
#
# Integer-exact everywhere: scaled = ((v - min) * 65535) DIV max(range,1)
# on nonnegative int64, interleave via DIV/%/× (floor == trunc, identical
# in Spark DIV and DuckDB //).

Z_ROWS_PER_FILE = 250
_Z_SPACE = 1 << 32


def _interleave_expr(x: str, y: str, div: str) -> str:
    """32-bit Morton code of two 16-bit nonnegative codes (engine-shared
    arithmetic; ``div`` is the engine's integer-division token)."""
    terms = []
    for i in range(16):
        terms.append(f"(({x} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_layout(spark, sf_dir):
    """(file_id, n_rows, min_ck, max_ck, min_day, max_day): per-file
    min/max pruning stats after Z-ordering orders on (o_custkey, day)."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("long").alias("d"),
    )
    st = o.agg(
        F.min("ck").alias("mnc"), F.max("ck").alias("mxc"),
        F.min("d").alias("mnd"), F.max("d").alias("mxd"),
        F.count("*").alias("n"),
    ).collect()[0]
    n_files = max(st.n // Z_ROWS_PER_FILE, 1)
    width = (_Z_SPACE + n_files - 1) // n_files
    sx = f"((ck - {st.mnc}) * 65535) DIV {max(st.mxc - st.mnc, 1)}"
    sy = f"((d - {st.mnd}) * 65535) DIV {max(st.mxd - st.mnd, 1)}"
    coded = o.withColumn("sx", F.expr(sx).cast("long")).withColumn(
        "sy", F.expr(sy).cast("long")
    )
    z = coded.withColumn(
        "z", F.expr(_interleave_expr("sx", "sy", "DIV")).cast("long")
    )
    return (
        z.select("ck", "d", F.expr(f"z DIV {width}").cast("long").alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("ck").cast("long").alias("min_ck"),
            F.max("ck").cast("long").alias("max_ck"),
            F.min("d").cast("long").alias("min_day"),
            F.max("d").cast("long").alias("max_day"),
        )
    )


def _sql_zorder_layout() -> str:
    inter = _interleave_expr("sx", "sy", "//")
    return f"""
WITH o AS (
  SELECT o_custkey AS ck,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d
  FROM orders
),
st AS (
  SELECT min(ck) AS mnc, max(ck) AS mxc, min(d) AS mnd, max(d) AS mxd,
         greatest(count(*) // {Z_ROWS_PER_FILE}, 1) AS nf
  FROM o
),
coded AS (
  SELECT ck, d,
         ((ck - mnc) * 65535) // greatest(mxc - mnc, 1) AS sx,
         ((d - mnd) * 65535) // greatest(mxd - mnd, 1) AS sy,
         nf
  FROM o CROSS JOIN st
),
z AS (
  SELECT ck, d, ({inter}) AS z, ({_Z_SPACE} + nf - 1) // nf AS width
  FROM coded
)
SELECT CAST(z // width AS BIGINT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(ck) AS BIGINT) AS min_ck, CAST(max(ck) AS BIGINT) AS max_ck,
       CAST(min(d) AS BIGINT) AS min_day, CAST(max(d) AS BIGINT) AS max_day
FROM z GROUP BY 1
"""


QUERIES["zorder_layout"] = (zorder_layout, _sql_zorder_layout())


# --------------------------------------- TPC-H-shaped analytics (Q3, Q18)

# Two more canonical warehouse shapes over the TPC-H-ish tables, rounding
# out q1/j5: the top-k join-aggregate (Q3 shipping priority) and the
# having-filtered semi-join (Q18 large-volume customers). Both follow the
# money-determinism rules (integer cents per row before any sum) and carry
# unique top-k tie-breaks.
#
# Scale shape — Q3: the customer dim filter broadcasts (segment filter
# first), orders⋈lineitem shuffles once on the order key, and the top-10
# is TakeOrdered (distributed partial top-k), never a global sort.
# Q18: lineitem aggregates once on l_orderkey (map-side combined), the
# HAVING threshold prunes before any join, and only qualifying orders
# (~1% by construction) reach the orders/customer joins.


def q3_shipping_priority(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    rev = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            rev.alias("revenue_c"),
            F.floor(F.min(F.unix_timestamp("o_orderdate")) / 86400)
            .cast("long")
            .alias("o_day"),
        )
        .orderBy(F.col("revenue_c").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
       CAST(floor(min(epoch(o_orderdate)) / 86400) AS BIGINT) AS o_day
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue_c DESC, l_orderkey ASC
LIMIT 10
"""


Q18_QTY_C = 250 * 100  # HAVING sum(quantity-cents) > this


def q18_large_volume_customers(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > Q18_QTY_C)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.floor(F.unix_timestamp("o_orderdate") / 86400)
            .cast("long")
            .alias("o_day"),
            cents("o_totalprice").alias("total_c"),
            "sum_qty_c",
        )
        .orderBy(F.col("total_c").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


SQL_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum({sql_cents('l_quantity')}) AS BIGINT) AS sum_qty_c
  FROM lineitem GROUP BY 1 HAVING sum({sql_cents('l_quantity')}) > {Q18_QTY_C}
)
SELECT c_name, c_custkey, o_orderkey,
       CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS o_day,
       {sql_cents('o_totalprice')} AS total_c,
       sum_qty_c
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_c DESC, o_orderkey ASC
LIMIT 100
"""


QUERIES["q3_shipping_priority"] = (q3_shipping_priority, SQL_Q3)
QUERIES["q18_large_volume_customers"] = (q18_large_volume_customers, SQL_Q18)


# ------------------------------------------- hourly anomaly z-score

# Ops-analytics shape over the event stream: per event_type, flag hours
# whose count deviates from the TRAILING 24-hour baseline — the alerting
# query every ingest pipeline runs. Hours are DENSIFIED first (a missing
# hour is c=0, not a missing row — skipping gaps would corrupt the
# baseline); the trailing mean/variance come from integer window sums
# (s1 = Σc, s2 = Σc², var = (24·s2 − s1²)/(24·23) — Cauchy-Schwarz keeps
# the numerator ≥ 0 exactly), and the ONE float expression
# z = (24c − s1) / sqrt(...) is a single shared string evaluated on
# identical integers in both engines (IEEE sqrt/division are correctly
# rounded, so the rounded z is bit-stable — the micro-nat idiom).
#
# Scale shape: one groupBy((type, hour)) count, a bounded hours×types
# densification (sequence explode — calendar-sized, not corpus-sized),
# and per-type time-ordered windows whose partitions are calendar-bounded.

_AZ_WIN = 24  # trailing baseline hours


def _az_z_expr(div: str) -> str:
    # z in INTEGER micro-units. round(x, 6) is NOT cross-engine stable for
    # sqrt-derived values sitting on a .5 boundary (Spark converts the full
    # double to decimal HALF_UP; DuckDB scales and rounds — 1-ulp flips
    # observed at sf0.001). floor(x * 1e6 + 0.5) is three IEEE ops with one
    # correctly-rounded result each -> bit-identical on identical integer
    # inputs; negatives mirror through -floor(-x ... ) (half away from 0).
    # Literal dialect trap: Spark parses "24.0" as DECIMAL (DuckDB as
    # DOUBLE) — a BIGINT / DECIMAL division then truncates to decimal
    # scale and the engines diverge. "24.0e0" parses as DOUBLE in BOTH.
    w, wm1 = _AZ_WIN, _AZ_WIN - 1
    zx = (
        f"(({w}.0e0 * c - s1) / ({w}.0e0 * sqrt("
        f"({w} * s2 - s1 * s1) / ({w}.0e0 * {wm1}.0e0))))"
    )
    return (
        f"CASE WHEN {w} * s2 = s1 * s1 THEN NULL "
        f"WHEN {zx} >= 0 THEN CAST(floor({zx} * 1.0e6 + 0.5e0) AS BIGINT) "
        f"ELSE CAST(-floor(-{zx} * 1.0e6 + 0.5e0) AS BIGINT) END"
    )


def events_anomaly_zscore(spark, sf_dir):
    """(event_type, hour_bucket, c, z, is_anomaly): hourly counts vs the
    trailing 24-hour baseline; rows emitted only once the baseline window
    is full."""
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
    wt = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-_AZ_WIN, -1)
    )
    scored = dens.select(
        "event_type",
        F.col("hour").alias("hour_bucket"),
        "c",
        F.sum("c").over(wt).cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(wt).cast("long").alias("s2"),
    ).filter(F.col("hour_bucket") >= b.mn + _AZ_WIN)
    z = F.expr(_az_z_expr("DIV"))
    # zero-variance baseline (24*s2 == s1²): z is undefined, but ANY
    # deviation from the constant baseline is an anomaly by definition
    flat_dev = (F.expr(f"{_AZ_WIN} * s2 = s1 * s1")) & (
        F.expr(f"{_AZ_WIN} * c != s1")
    )
    return scored.select(
        "event_type",
        "hour_bucket",
        "c",
        z.alias("z_micro"),
        ((z.isNotNull() & (F.abs(z) >= 3_000_000)) | flat_dev).alias(
            "is_anomaly"
        ),
    )


def _sql_events_anomaly() -> str:
    w = _AZ_WIN
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
scored AS (
  SELECT event_type, hour AS hour_bucket, c,
         CAST(sum(c) OVER tw AS BIGINT) AS s1,
         CAST(sum(c * c) OVER tw AS BIGINT) AS s2
  FROM dens
  WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING)
  QUALIFY hour >= (SELECT mn FROM b) + {w}
)
SELECT event_type, hour_bucket, c,
       {_az_z_expr('//')} AS z_micro,
       ((({_az_z_expr('//')}) IS NOT NULL
         AND abs({_az_z_expr('//')}) >= 3000000)
        OR ({w} * s2 = s1 * s1 AND {w} * c != s1)) AS is_anomaly
FROM scored
"""


QUERIES["events_anomaly_zscore"] = (events_anomaly_zscore, _sql_events_anomaly())


# ------------------------------------------- CUSUM changepoint detection

# Page's CUSUM (1954) over the hourly event stream — the LEVEL-SHIFT
# detector next to events_anomaly_zscore's spike detector (a z-score
# forgets after its 24 h window; CUSUM accumulates small sustained drifts
# until they cross a decision threshold, which is how crawl-rate /
# ingest-health monitors actually catch slow regressions).
#
# The recurrence S_t = max(0, S_{t-1} + d_t) looks inherently sequential,
# but has an exact RELATIONAL closed form: with prefix sums
# P_t = Σ_{j<=t} d_j (P_0 = 0), S_t = P_t - min_{0<=j<=t} P_j — one
# running-sum window plus one running-min window, both per event_type,
# partitions calendar-bounded (same densified-hours argument as the
# z-score above). The downward detector mirrors through the prefix MAX.
# Everything is integer milli-units: d = 1000·c - mean_milli with the
# per-type integer mean, so both engines agree bit-for-bit; the decision
# threshold h = 5·sd_floor·1000 uses floor(sqrt(mean)) — exact except on
# perfect squares, where IEEE sqrt of an int is exact anyway.

_CUSUM_H_SD = 5  # decision threshold in floor(sqrt(mean)) units


def events_cusum_changepoint(spark, sf_dir):
    """(event_type, hour_bucket, c, s_pos_milli, s_neg_milli, h_milli,
    alarm_up, alarm_down): two-sided CUSUM over densified hourly counts."""
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
    # integer per-type mean via whole-partition window sums (DIV, no float)
    wall = W.partitionBy("event_type")
    dev = dens.select(
        "event_type",
        "hour",
        "c",
        F.sum("c").over(wall).cast("long").alias("tot"),
        F.count("*").over(wall).cast("long").alias("nh"),
    ).select(
        "event_type",
        "hour",
        "c",
        F.expr("CAST((1000 * tot) DIV nh AS BIGINT)").alias("mean_milli"),
        F.expr("CAST(tot DIV nh AS BIGINT)").alias("mean_c"),
    ).select(
        "event_type",
        "hour",
        "c",
        "mean_milli",
        F.expr(
            "CAST(greatest(CAST(floor(sqrt(CAST(mean_c AS DOUBLE))) AS BIGINT), 1)"
            " AS BIGINT)"
        ).alias("sd_floor"),
    ).select(
        "event_type",
        "hour",
        "c",
        F.expr(f"CAST({_CUSUM_H_SD} * 1000 * sd_floor AS BIGINT)").alias("h_milli"),
        # Page's slack k = sd/2 keeps noise from accumulating: only
        # sustained shifts beyond half a standard deviation build mass.
        F.expr("1000 * c - mean_milli - 500 * sd_floor").alias("dp"),
        F.expr("mean_milli - 1000 * c - 500 * sd_floor").alias("dn"),
    )
    wcum = W.partitionBy("event_type").orderBy("hour").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        dev.select(
            "event_type",
            F.col("hour").alias("hour_bucket"),
            "c",
            "h_milli",
            F.sum("dp").over(wcum).cast("long").alias("cp"),
            F.sum("dn").over(wcum).cast("long").alias("cn"),
        )
        .select(
            "event_type",
            "hour_bucket",
            "c",
            "h_milli",
            "cp",
            "cn",
            F.min("cp")
            .over(
                W.partitionBy("event_type")
                .orderBy("hour_bucket")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            .cast("long")
            .alias("pmin"),
            F.min("cn")
            .over(
                W.partitionBy("event_type")
                .orderBy("hour_bucket")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            .cast("long")
            .alias("nmin"),
        )
        .select(
            "event_type",
            "hour_bucket",
            "c",
            F.expr("CAST(cp - least(CAST(0 AS BIGINT), pmin) AS BIGINT)").alias(
                "s_pos_milli"
            ),
            F.expr("CAST(cn - least(CAST(0 AS BIGINT), nmin) AS BIGINT)").alias(
                "s_neg_milli"
            ),
            "h_milli",
            F.expr("cp - least(CAST(0 AS BIGINT), pmin) > h_milli").alias("alarm_up"),
            F.expr("cn - least(CAST(0 AS BIGINT), nmin) > h_milli").alias(
                "alarm_down"
            ),
        )
    )


def _sql_events_cusum() -> str:
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
means AS (
  SELECT event_type, hour, c,
         CAST((1000 * sum(c) OVER tw) // (count(*) OVER tw) AS BIGINT)
           AS mean_milli,
         greatest(CAST(floor(sqrt(CAST(
               (sum(c) OVER tw) // (count(*) OVER tw) AS DOUBLE)))
               AS BIGINT), 1) AS sd_floor
  FROM dens
  WINDOW tw AS (PARTITION BY event_type)
),
dev AS (
  SELECT event_type, hour, c,
         CAST({_CUSUM_H_SD} * 1000 * sd_floor AS BIGINT) AS h_milli,
         1000 * c - mean_milli - 500 * sd_floor AS dp,
         mean_milli - 1000 * c - 500 * sd_floor AS dn
  FROM means
),
cums AS (
  SELECT event_type, hour AS hour_bucket, c, h_milli,
         CAST(sum(dp) OVER cw AS BIGINT) AS cp,
         CAST(sum(dn) OVER cw AS BIGINT) AS cn
  FROM dev
  WINDOW cw AS (PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
mm AS (
  SELECT event_type, hour_bucket, c, h_milli, cp, cn,
         CAST(min(cp) OVER cw AS BIGINT) AS pmin,
         CAST(min(cn) OVER cw AS BIGINT) AS nmin
  FROM cums
  WINDOW cw AS (PARTITION BY event_type ORDER BY hour_bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, hour_bucket, c,
       CAST(cp - least(CAST(0 AS BIGINT), pmin) AS BIGINT) AS s_pos_milli,
       CAST(cn - least(CAST(0 AS BIGINT), nmin) AS BIGINT) AS s_neg_milli,
       h_milli,
       cp - least(CAST(0 AS BIGINT), pmin) > h_milli AS alarm_up,
       cn - least(CAST(0 AS BIGINT), nmin) > h_milli AS alarm_down
FROM mm
"""


QUERIES["events_cusum_changepoint"] = (
    events_cusum_changepoint,
    _sql_events_cusum(),
)


# ---------------------------------------------------- click attribution

# Last-touch click→purchase attribution — the event⋈event as-of join with
# a window bound (the web-analytics sibling of j9's event⋈dimension as-of;
# the reference tracks harvest provenance per document, a web pipeline
# tracks conversion provenance per event). Each purchase is attributed to
# the SAME USER's latest click at or before it, but only if that click is
# at most ATTR_WINDOW_S seconds earlier.
#
# Spark-first plan: the union-window technique again — ONE shuffle on
# user_id, no inequality join (a naive ts-range self-join of two event
# streams is quadratic in hot users). Same-second click ties resolve to
# max event_id WITHOUT a separate dedup exchange: the carry window orders
# (epoch asc, is_click desc, event_id asc), so among clicks of one second
# the LAST one carried is the max event_id — the same total order gives
# the tie rule and the single shuffle. The rule itself is load-bearing:
# DuckDB's ASOF picks an ARBITRARY row among equal timestamps, so the
# oracle dedups clicks per (user, second) to max event_id explicitly —
# both engines land on the identical attribution. Oracle: DuckDB's native
# ASOF JOIN + the window filter — an independent engine feature cross-
# checking the union-window trick. Timestamps are integer epoch-seconds
# on BOTH sides (DuckDB epoch() is fractional — floor before CAST, the
# j9 contract).

ATTR_WINDOW_S = 3600


def events_attribution(spark, sf_dir):
    """(purchase_id, user_id, click_id, lag_sec): every purchase with a
    same-user click at most ATTR_WINDOW_S seconds before it, attributed
    last-touch (latest qualifying click; click ties broken max event_id)."""
    ev = load(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        epoch.alias("epoch"),
        F.col("event_id").cast("long").alias("click_id"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", epoch.alias("epoch")
    )
    tagged = clicks.select(
        "user_id",
        "epoch",
        F.lit(1).alias("is_click"),
        "click_id",
        F.lit(None).cast("long").alias("purchase_id"),
    ).unionByName(
        buys.select(
            "user_id",
            "epoch",
            F.lit(0).alias("is_click"),
            F.lit(None).cast("long").alias("click_id"),
            "purchase_id",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(
            F.col("epoch").asc(),
            F.col("is_click").desc(),
            F.coalesce("click_id", "purchase_id").asc(),
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "c_id", F.last("click_id", ignorenulls=True).over(w)
    ).withColumn(
        "c_ep",
        F.last(
            F.when(F.col("is_click") == 1, F.col("epoch")), ignorenulls=True
        ).over(w),
    )
    return (
        carried.filter(
            (F.col("is_click") == 0)
            & F.col("c_id").isNotNull()
            & (F.col("epoch") - F.col("c_ep") <= ATTR_WINDOW_S)
        )
        .select(
            "purchase_id",
            "user_id",
            F.col("c_id").alias("click_id"),
            (F.col("epoch") - F.col("c_ep")).cast("long").alias("lag_sec"),
        )
    )


SQL_EVENTS_ATTRIBUTION = f"""
WITH clicks AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS c_ep,
         CAST(max(event_id) AS BIGINT) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
buys AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS p_ep
  FROM events WHERE event_type = 'purchase'
)
SELECT buys.purchase_id AS purchase_id, buys.user_id AS user_id,
       clicks.click_id AS click_id,
       CAST(buys.p_ep - clicks.c_ep AS BIGINT) AS lag_sec
FROM buys ASOF JOIN clicks
  ON buys.user_id = clicks.user_id AND buys.p_ep >= clicks.c_ep
WHERE buys.p_ep - clicks.c_ep <= {ATTR_WINDOW_S}
"""

QUERIES["events_attribution"] = (events_attribution, SQL_EVENTS_ATTRIBUTION)


# Multi-touch twin of the stream-stream interval join
# (streaming/attribution.py): the SAME attribution_pairs function run in
# batch mode — the queries() gate for the plan the stream executes. Equi-
# join on user_id (the equality conjunct keys the shuffle; the time range
# is a post-filter — no BNLJ), lag in exact integer microseconds.
def events_attribution_pairs(spark, sf_dir):
    """(user_id, purchase_id, click_id, lag_us): every same-user
    (click, purchase) pair with the purchase within ATTR_WINDOW_S of the
    click — multi-touch attribution, the batch twin of the stream-stream
    join."""
    from harvester_spark.streaming.attribution import attribution_pairs

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    return attribution_pairs(clicks, buys, window_s=ATTR_WINDOW_S)


SQL_EVENTS_ATTRIBUTION_PAIRS = f"""
WITH c AS (
  SELECT event_id AS click_id, user_id, ts FROM events
  WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
)
SELECT p.user_id AS user_id, p.purchase_id AS purchase_id,
       c.click_id AS click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
FROM c JOIN p ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL {ATTR_WINDOW_S} SECOND
"""

QUERIES["events_attribution_pairs"] = (
    events_attribution_pairs,
    SQL_EVENTS_ATTRIBUTION_PAIRS,
)


# ------------------------------------------------------------- TPC-H Q6

# The forecast-revenue-change query — the canonical predicate-pushdown /
# vectorized-scan showcase (no join, no shuffle beyond one scalar agg):
# every predicate reaches the parquet scan as a PushedFilter and the agg
# is a map-side partial sum. Money determinism: per-row integer cents
# (round(extendedprice·discount·100)) then an exact BIGINT sum — float
# SUM order never matters (the a9/cents contract). Date window shifted to
# the corpus's 1995–2001 shipdate range; the band predicates bind
# (test: 1251 of 60k rows at sf0.01).

_Q6_LO, _Q6_HI = "1996-01-01", "1997-01-01"


def q6_forecast_revenue(spark, sf_dir):
    """(n_rows, revenue_cents): Σ extendedprice·discount over the Q6 band
    — one filtered scan, one scalar aggregate."""
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.select(
        F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
        .cast("long")
        .alias("cents")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


SQL_Q6_FORECAST = f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}' AND l_shipdate < TIMESTAMP '{_Q6_HI}'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

QUERIES["q6_forecast_revenue"] = (q6_forecast_revenue, SQL_Q6_FORECAST)


# ----------------------------------------------- search_after pagination

# ES/OpenSearch `search_after` — THE deep-pagination contract at scale
# (page-number paging tops out at the 10k window cap t1_pagination models;
# the reference's paginator — core/views/document.py pagination over search
# results — inherits exactly that cap). A cursor is the sort-key tuple of
# the last row served; the next page is the top-k STRICTLY AFTER it in
# (ts desc, event_id asc) order. No window over the full table, no global
# sort: the cursor predicate pushes to the scan (ts <= cursor prunes whole
# files/row-groups by min/max stats) and the tail is TakeOrdered(k) —
# per-partition heaps, driver merge of k rows. Page 10^6 costs the same as
# page 1.

_SA_TS = "2024-01-15 12:00:00"
_SA_ID = 4000


def t7_search_after(spark, sf_dir):
    """(ts, event_id, user_id, event_type): the 20 events strictly after
    the cursor (ts desc, event_id asc) — cursor semantics: older ts, or
    same ts with larger event_id."""
    ev = load(spark, sf_dir, "events")
    cur_ts = F.lit(_SA_TS).cast("timestamp")
    after = ev.filter(
        (F.col("ts") < cur_ts)
        | ((F.col("ts") == cur_ts) & (F.col("event_id") > _SA_ID))
    )
    return (
        after.orderBy(F.col("ts").desc(), F.col("event_id").asc())
        .limit(20)
        .select("ts", "event_id", "user_id", "event_type")
    )


SQL_T7_SEARCH_AFTER = f"""
SELECT ts, event_id, user_id, event_type
FROM events
WHERE ts < TIMESTAMP '{_SA_TS}'
   OR (ts = TIMESTAMP '{_SA_TS}' AND event_id > {_SA_ID})
ORDER BY ts DESC, event_id ASC
LIMIT 20
"""

QUERIES["t7_search_after"] = (t7_search_after, SQL_T7_SEARCH_AFTER)


# ------------------------------------------- TPC-H Q4/Q16 shapes

# Q4 (order-priority checking), adapted to the synthetic schema: the
# reference grid lacks l_commitdate/l_receiptdate, so "late" is defined as
# a lineitem shipping more than 60 days after its order date. The shape is
# the point: a quarter-filtered fact scan with a DECORRELATED EXISTS —
# Spark executes it as a left-semi join with the non-equi lateness
# predicate folded into the join, so the probe never materializes the
# per-order lineitem fan-out.
#
# Scale: both inputs filter before the shuffle (quarter predicate pushes
# to the orders scan); the semi-join shuffles each side once on orderkey;
# the final priority rollup is a 5-row map-side-combined agg.


def q4_order_priority(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


SQL_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# Q16 (parts/supplier relationship), adapted: suppliers-per-(brand, type)
# excluding one brand and every supplier with a negative account balance
# (the NOT IN correlated exclusion). Shape: broadcast anti-join against the
# tiny bad-supplier dim BEFORE the fact join, broadcast part dim, then a
# count(DISTINCT) rollup — the exclusion never shuffles the fact table.


def q16_supplier_part_counts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#13")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = """
SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
"""


QUERIES["q4_order_priority"] = (q4_order_priority, SQL_Q4)
QUERIES["q16_supplier_part_counts"] = (q16_supplier_part_counts, SQL_Q16)


# Q14 (promotion effect): share of revenue from PROMO parts in one month.
# Shape: month-filtered fact scan, broadcast part dim, ONE conditional agg.
# Revenue in exact integer cents; the share is multiply-then-integer-divide
# micro basis (promo_c * 1e6 DIV total_c) — no float division.


def q14_promo_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.when(F.col("p_type") == "PROMO", rev_c).otherwise(0).alias("promo_c"),
            rev_c.alias("rev_c"),
        )
        .agg(F.sum("promo_c").alias("promo_c"), F.sum("rev_c").alias("total_c"))
    )
    return agg.selectExpr(
        "promo_c", "total_c", "(promo_c * 1000000) DIV total_c AS promo_share_micro"
    )


SQL_Q14 = """
WITH agg AS (
  SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS promo_c,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS total_c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-02-01'
)
SELECT promo_c, total_c, (promo_c * 1000000) // total_c AS promo_share_micro
FROM agg
"""


# Q19 (discounted revenue): the OR-of-ANDs predicate — three disjoint
# (brand, size-range, quantity-range) branches. Shape: the whole disjunction
# is ONE residual filter under a broadcast hash join; Catalyst pushes the
# common l_quantity bounds and the dim-side p_size/p_brand bounds into the
# scans, so neither side reads rows no branch can accept.


def q19_discounted_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev_c = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev_c).alias("revenue_c"),
        )
    )


SQL_Q19 = """
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_c
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


QUERIES["q14_promo_revenue"] = (q14_promo_revenue, SQL_Q14)
QUERIES["q19_discounted_revenue"] = (q19_discounted_revenue, SQL_Q19)


# ------------------------------------------------- skyline / Pareto

# The skyline operator (Börzsönyi, Kossmann & Stocker, ICDE 2001) — the
# classic multi-objective relational operator the library was missing:
# the Pareto-optimal users under (purchase count ↑ good, error count ↓
# good). A user is dominated iff another user is at least as good on
# BOTH objectives and strictly better on one; the skyline is the
# anti-join against the dominance condition. Output is every user with
# their objectives and the skyline flag (dominated rows kept — the
# frontier is meaningful only against what it dominates).
#
# Determinism: objectives are exact counts; dominance is pure integer
# comparison; ties on both objectives leave BOTH rows in the skyline
# (the standard set semantics).
#
# Scale shape: one per-user agg; the dominance test is the classic
# block-nested quadratic over the DISTINCT objective grid (not the
# user list — users sharing an objective pair collapse first, the
# standard pre-aggregation), with sort-filter-skyline the documented
# big-data path.


def events_skyline_users(spark, sf_dir):
    """(user_id, n_purchases, n_errors, on_skyline): every user's
    objective pair and whether it sits on the Pareto frontier."""
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("n_purchases"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("n_errors"),
    ).cache()
    grid = per.select("n_purchases", "n_errors").distinct()
    dominated_pairs = (
        grid.alias("a")
        .join(
            grid.alias("b"),
            F.expr(
                "b.n_purchases >= a.n_purchases AND b.n_errors <= a.n_errors"
                " AND (b.n_purchases > a.n_purchases"
                " OR b.n_errors < a.n_errors)"
            ),
            "left_semi",
        )
        .select(
            F.col("n_purchases").alias("dp"), F.col("n_errors").alias("de")
        )
    )
    return (
        per.join(
            dominated_pairs,
            (per["n_purchases"] == F.col("dp"))
            & (per["n_errors"] == F.col("de")),
            "left",
        )
        .select(
            "user_id",
            "n_purchases",
            "n_errors",
            F.col("dp").isNull().alias("on_skyline"),
        )
    )


SQL_SKYLINE_USERS = """
WITH per AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
),
grid AS (SELECT DISTINCT n_purchases, n_errors FROM per),
dominated AS (
  SELECT a.n_purchases AS dp, a.n_errors AS de
  FROM grid a
  WHERE EXISTS (
    SELECT 1 FROM grid b
    WHERE b.n_purchases >= a.n_purchases AND b.n_errors <= a.n_errors
      AND (b.n_purchases > a.n_purchases OR b.n_errors < a.n_errors)
  )
)
SELECT p.user_id, p.n_purchases, p.n_errors,
       d.dp IS NULL AS on_skyline
FROM per p
LEFT JOIN dominated d
  ON d.dp = p.n_purchases AND d.de = p.n_errors
"""

QUERIES["events_skyline_users"] = (events_skyline_users, SQL_SKYLINE_USERS)


# ------------------------------------- join cardinality estimation

# The query-optimizer's oldest gamble (Selinger 1979 onward): estimate
# |A ⋈ B| before running it. Two relations split from the event log
# (md5 halves), joined on user_id; three estimators against the exact
# join size:
#   indep    — |A|·|B| / max(ndv_A, ndv_B)   (textbook independence)
#   hist     — Σ_buckets a_i·b_i / max(da_i, db_i) over {JC_BUCKETS}
#              equi-WIDTH user_id buckets (per-bucket containment)
#   exact    — the true Σ_keys a_k·b_k
# The histogram refines the global estimate exactly as the textbooks
# promise. The natural log's per-user activity is near-uniform (the
# independence estimate landed within 0.5% — measured, nothing for the
# histogram to fix), so the side assignment carries a PLANTED
# range-correlated skew: users in the lower id half are A-heavy (3/4),
# the upper half B-heavy — per-key a/b anticorrelate, independence
# overestimates by ~1/3, and the user_id-bucketed histogram (whose
# buckets align with the planted ranges) recovers most of it — the
# classic correlated-columns story, pinned by the pytest.
#
# Determinism: all counts exact BIGINTs; estimators are floored
# divisions; errors sign-split milli.
#
# Scale shape: two grouped scans + a bucket-keyed agg — the ANALYZE
# pass; the exact join is one equi-join agg (the ground truth an
# optimizer never gets to see).

JC_BUCKETS = 8


def join_cardinality_est_eval(spark, sf_dir):
    """(n_a, n_b, exact_join, indep_est, hist_est, indep_err_milli,
    hist_err_milli): optimizer join-size estimates vs the true join
    cardinality."""
    from harvester_spark.operators.dedup import _hash56

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (
            _hash56(F.concat(F.lit("jc|"), F.col("event_id").cast("string")))
            % 4
        ).alias("h4"),
    )
    maxu = F.broadcast(
        ev.agg((F.max("user_id") + 1).cast("long").alias("mu"))
    )
    ev = ev.crossJoin(maxu).select(
        "event_id",
        "user_id",
        # planted range-correlated side bias: lower-half users A-heavy
        F.expr(
            "CASE WHEN 2 * user_id < mu"
            " THEN CASE WHEN h4 < 3 THEN 0 ELSE 1 END"
            " ELSE CASE WHEN h4 < 3 THEN 1 ELSE 0 END END"
        ).cast("long").alias("side"),
    ).cache()
    per_key = (
        ev.groupBy("user_id", "side")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("user_id")
        .pivot("side", [0, 1])
        .agg(F.first("c"))
        .select(
            "user_id",
            F.coalesce("0", F.lit(0)).cast("long").alias("a"),
            F.coalesce("1", F.lit(0)).cast("long").alias("b"),
        )
        .crossJoin(maxu)
        .withColumn(
            "bkt", F.expr(f"(user_id * {JC_BUCKETS}) DIV mu").cast("long")
        )
        .cache()
    )
    tot = per_key.agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
        F.sum((F.col("a") > 0).cast("long")).cast("long").alias("da"),
        F.sum((F.col("b") > 0).cast("long")).cast("long").alias("db"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("exact_join"),
    )
    hist = (
        per_key.groupBy("bkt")
        .agg(
            F.sum("a").cast("long").alias("ai"),
            F.sum("b").cast("long").alias("bi"),
            F.sum((F.col("a") > 0).cast("long")).cast("long").alias("dai"),
            F.sum((F.col("b") > 0).cast("long")).cast("long").alias("dbi"),
        )
        .agg(
            F.sum(
                F.expr("(ai * bi) DIV greatest(greatest(dai, dbi), 1)")
            ).cast("long").alias("hist_est")
        )
    )
    err = (
        "CASE WHEN {est} >= exact_join"
        " THEN CAST((1000 * ({est} - exact_join)) DIV exact_join AS BIGINT)"
        " ELSE CAST(-((1000 * (exact_join - {est})) DIV exact_join)"
        " AS BIGINT) END"
    )
    return (
        tot.crossJoin(hist)
        .withColumn(
            "indep_est",
            F.expr("(n_a * n_b) DIV greatest(da, db)").cast("long"),
        )
        .select(
            "n_a",
            "n_b",
            "exact_join",
            "indep_est",
            "hist_est",
            F.expr(err.format(est="indep_est")).alias("indep_err_milli"),
            F.expr(err.format(est="hist_est")).alias("hist_err_milli"),
        )
    )


def _sql_join_card() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col="'jc|' || CAST(event_id AS VARCHAR)")
    return f"""
WITH ev0 AS (
  SELECT event_id, user_id, {h} % 4 AS h4 FROM events
),
mu AS (SELECT CAST(max(user_id) + 1 AS BIGINT) AS mu FROM ev0),
ev AS (
  SELECT event_id, user_id,
         CASE WHEN 2 * user_id < (SELECT mu FROM mu)
              THEN CASE WHEN h4 < 3 THEN 0 ELSE 1 END
              ELSE CASE WHEN h4 < 3 THEN 1 ELSE 0 END END AS side
  FROM ev0
),
per_key AS MATERIALIZED (
  SELECT user_id,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         (user_id * {JC_BUCKETS}) // (SELECT mu FROM mu) AS bkt
  FROM ev GROUP BY user_id
),
tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS da,
         CAST(sum(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS db,
         CAST(sum(a * b) AS BIGINT) AS exact_join
  FROM per_key
),
hist AS (
  SELECT CAST(sum((ai * bi) // greatest(greatest(dai, dbi), 1)) AS BIGINT)
           AS hist_est
  FROM (
    SELECT bkt, CAST(sum(a) AS BIGINT) AS ai, CAST(sum(b) AS BIGINT) AS bi,
           CAST(sum(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS dai,
           CAST(sum(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS dbi
    FROM per_key GROUP BY 1
  )
)
SELECT n_a, n_b, exact_join,
       CAST((n_a * n_b) // greatest(da, db) AS BIGINT) AS indep_est,
       hist_est,
       CASE WHEN (n_a * n_b) // greatest(da, db) >= exact_join
            THEN CAST((1000 * ((n_a * n_b) // greatest(da, db) - exact_join))
                 // exact_join AS BIGINT)
            ELSE CAST(-((1000 * (exact_join - (n_a * n_b) // greatest(da, db)))
                 // exact_join) AS BIGINT) END AS indep_err_milli,
       CASE WHEN hist_est >= exact_join
            THEN CAST((1000 * (hist_est - exact_join)) // exact_join AS BIGINT)
            ELSE CAST(-((1000 * (exact_join - hist_est)) // exact_join)
                 AS BIGINT) END AS hist_err_milli
FROM tot CROSS JOIN hist
"""


QUERIES["join_cardinality_est_eval"] = (
    join_cardinality_est_eval,
    _sql_join_card(),
)


# ---------------------------------- Hilbert vs Z-order layout locality

# The space-filling-curve upgrade question over zorder_layout: Morton
# (Z-order) interleaving is cheap but its curve JUMPS — consecutive
# curve positions are not always grid-adjacent, so range scans cross
# seams. The Hilbert curve (1891; Faloutsos & Roseman PODS 1989 for
# databases) never jumps: EVERY consecutive index pair is a unit grid
# step. Both claims are machine-checked here exactly, per cell, on the
# full HC_N x HC_N grid:
#   - hilbert adj_violations == 0 and max_step_jump == 1 (the Hilbert
#     property, all N^2-1 steps);
#   - morton adj_violations > 0 and max_step_jump = a real seam.
# The cost metric is Moon et al.'s (TKDE 2001) CLUSTER COUNT: the
# number of contiguous curve runs a rectangular range query touches
# (each run = one sequential scan range). 64 md5-planted query
# rectangles (2..7 cells per side); runs = in-rect cells whose curve
# predecessor lies outside the rectangle. Average |d_a - d_b| over
# grid-adjacent pairs is NOT the right metric — Morton actually wins
# it (measured 8.5 vs 9.9 here) while losing run counts 426 vs 260;
# the first cut used it and the comparison inverted. mass_covered
# (md5 doc occupancy inside the rectangles) is emitted as a
# curve-invariant sanity column.
#
# The Hilbert index is the classic xy2d bit loop UNROLLED over
# HC_BITS = 4 levels (s = 8,4,2,1) as chained CTEs carrying (x, y, d):
# quadrant code q = (3*rx) XOR ry by CASE table, then the reflect/swap
# rotation — integer CASE arithmetic only, identical in both engines
# (the zorder DIV/%/x discipline; no bit intrinsics beyond & with
# powers of two).
#
# Scale shape: the grid is 256 rows; the only corpus-sized work is one
# documents scan for cell occupancy.

HC_BITS = 4
HC_N = 1 << HC_BITS  # 16 x 16 grid
HC_RECTS = 64  # planted query rectangles


def layout_hilbert_vs_zorder(spark, sf_dir):
    """(curve, n_cells, adj_violations, max_step_jump, n_rects,
    total_runs, mass_covered): exact curve-continuity and range-query
    cluster-count comparison of Hilbert vs Morton on the 16x16 grid."""
    from harvester_spark.operators.dedup import _hash56

    cells = spark.range(HC_N * HC_N).select(
        (F.col("id") % HC_N).cast("long").alias("x"),
        (F.col("id") / HC_N).cast("long").alias("y"),
    )
    # Morton: interleave 4+4 bits via DIV/% arithmetic.
    mort = "+".join(
        f"((x DIV {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((y DIV {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(HC_BITS)
    )
    grid = cells.withColumn("morton", F.expr(f"CAST({mort} AS BIGINT)"))
    # Hilbert xy2d, unrolled: carry (hx, hy, d) through the levels.
    cur = grid.select("x", "y", "morton",
                      F.col("x").alias("hx"), F.col("y").alias("hy"),
                      F.lit(0).cast("long").alias("d"))
    s = HC_N // 2
    while s > 0:
        rx = f"(CASE WHEN (hx DIV {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy DIV {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        q = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 AND {ry} = 1 THEN 1"
            f" WHEN {rx} = 1 AND {ry} = 1 THEN 2"
            f" ELSE 3 END)"
        )
        cur = cur.select(
            "x",
            "y",
            "morton",
            F.expr(
                f"CAST(CASE WHEN {ry} = 0 AND {rx} = 1"
                f" THEN {s} - 1 - (CASE WHEN {ry} = 0 THEN hy ELSE hx END)"
                f" WHEN {ry} = 0"
                f" THEN (CASE WHEN {ry} = 0 THEN hy ELSE hx END)"
                f" ELSE hx END AS BIGINT)"
            ).alias("nhx"),
            F.expr(
                f"CAST(CASE WHEN {ry} = 0 AND {rx} = 1"
                f" THEN {s} - 1 - (hx % {s})"
                f" WHEN {ry} = 0 THEN hx % {s}"
                f" ELSE hy END AS BIGINT)"
            ).alias("nhy"),
            F.expr(f"CAST(d + {s} * {s} * {q} AS BIGINT)").alias("d"),
        ).select(
            "x",
            "y",
            "morton",
            F.expr(f"CAST(nhx % {s} AS BIGINT)").alias("hx"),
            F.expr(f"CAST(nhy % {s} AS BIGINT)").alias("hy"),
            "d",
        )
        s //= 2
    hil = cur.select("x", "y", "morton", F.col("d").alias("hilbert"))
    docs = load(spark, sf_dir, "documents").select(
        (
            _hash56(F.concat(F.lit("gx|"), F.col("doc_id").cast("string")))
            % HC_N
        ).cast("long").alias("x"),
        (
            _hash56(F.concat(F.lit("gy|"), F.col("doc_id").cast("string")))
            % HC_N
        ).cast("long").alias("y"),
    )
    w = docs.groupBy("x", "y").agg(F.count("*").cast("long").alias("w"))
    g = F.broadcast(
        hil.join(w, ["x", "y"], "left").select(
            "x", "y", "morton", "hilbert",
            F.coalesce("w", F.lit(0)).cast("long").alias("w"),
        )
    ).cache()
    rects = F.broadcast(
        spark.range(HC_RECTS).select(
            F.col("id").cast("long").alias("ri"),
            (2 + _hash56(F.concat(F.lit("rw|"), F.col("id").cast("string"))) % 6)
            .cast("long").alias("rw"),
            (2 + _hash56(F.concat(F.lit("rh|"), F.col("id").cast("string"))) % 6)
            .cast("long").alias("rh"),
        ).select(
            "ri", "rw", "rh",
            (
                _hash56(F.concat(F.lit("rx|"), F.col("ri").cast("string")))
                % (HC_N + 1 - F.col("rw"))
            ).cast("long").alias("rx"),
            (
                _hash56(F.concat(F.lit("ry|"), F.col("ri").cast("string")))
                % (HC_N + 1 - F.col("rh"))
            ).cast("long").alias("ry"),
        )
    )

    out = None
    for curve in ("hilbert", "morton"):
        pred = g.select(
            (F.col(curve) + 1).alias("dn"),
            F.col("x").alias("px"),
            F.col("y").alias("py"),
        )
        cur2 = g.select(
            "x", "y", "w", F.col(curve).alias("dn")
        ).join(pred, "dn", "left")
        inrect = cur2.join(
            rects,
            (F.col("x") >= F.col("rx"))
            & (F.col("x") < F.col("rx") + F.col("rw"))
            & (F.col("y") >= F.col("ry"))
            & (F.col("y") < F.col("ry") + F.col("rh")),
        )
        runs = inrect.agg(
            F.sum(
                F.expr(
                    "CAST(px IS NULL OR px < rx OR px >= rx + rw"
                    " OR py < ry OR py >= ry + rh AS BIGINT)"
                )
            ).cast("long").alias("total_runs"),
            F.sum("w").cast("long").alias("mass_covered"),
        )
        steps = (
            g.select(F.col(curve).alias("da"), "x", "y")
            .join(
                g.select(
                    (F.col(curve) - 1).alias("da"),
                    F.col("x").alias("x2"),
                    F.col("y").alias("y2"),
                ),
                "da",
            )
            .agg(
                F.sum(
                    F.expr("CAST(abs(x - x2) + abs(y - y2) <> 1 AS BIGINT)")
                ).cast("long").alias("adj_violations"),
                F.max(F.expr("abs(x - x2) + abs(y - y2)")).cast("long").alias(
                    "max_step_jump"
                ),
            )
        )
        row = (
            steps.crossJoin(F.broadcast(runs))
            .select(
                F.lit(curve).alias("curve"),
                F.lit(HC_N * HC_N).cast("long").alias("n_cells"),
                "adj_violations",
                "max_step_jump",
                F.lit(HC_RECTS).cast("long").alias("n_rects"),
                "total_runs",
                "mass_covered",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_hilbert() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    hx = _SQL_HASH56.format(col="'gx|' || CAST(doc_id AS VARCHAR)")
    hy = _SQL_HASH56.format(col="'gy|' || CAST(doc_id AS VARCHAR)")
    hrw = _SQL_HASH56.format(col="'rw|' || CAST(i AS VARCHAR)")
    hrh = _SQL_HASH56.format(col="'rh|' || CAST(i AS VARCHAR)")
    hrx = _SQL_HASH56.format(col="'rx|' || CAST(ri AS VARCHAR)")
    hry = _SQL_HASH56.format(col="'ry|' || CAST(ri AS VARCHAR)")
    mort = "+".join(
        f"((x // {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((y // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(HC_BITS)
    )
    parts = [
        f"""WITH hc0 AS (
  SELECT g.i % {HC_N} AS x, g.i // {HC_N} AS y,
         CAST({mort} AS BIGINT) AS morton,
         CAST(g.i % {HC_N} AS BIGINT) AS hx,
         CAST(g.i // {HC_N} AS BIGINT) AS hy,
         CAST(0 AS BIGINT) AS d
  FROM (SELECT unnest(range({HC_N * HC_N})) AS i,
               unnest(range({HC_N * HC_N})) % {HC_N} AS x,
               unnest(range({HC_N * HC_N})) // {HC_N} AS y) g
)"""
    ]
    s = HC_N // 2
    k = 0
    while s > 0:
        k += 1
        rx = f"(CASE WHEN (hx // {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy // {s}) % 2 = 1 THEN 1 ELSE 0 END)"
        q = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 AND {ry} = 1 THEN 1"
            f" WHEN {rx} = 1 AND {ry} = 1 THEN 2"
            f" ELSE 3 END)"
        )
        parts.append(
            f""",
hc{k} AS (
  SELECT x, y, morton,
         CAST((CASE WHEN {ry} = 0 AND {rx} = 1
               THEN {s} - 1 - (CASE WHEN {ry} = 0 THEN hy ELSE hx END)
               WHEN {ry} = 0
               THEN (CASE WHEN {ry} = 0 THEN hy ELSE hx END)
               ELSE hx END) % {s} AS BIGINT) AS hx,
         CAST((CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s} - 1 - (hx % {s})
               WHEN {ry} = 0 THEN hx % {s}
               ELSE hy END) % {s} AS BIGINT) AS hy,
         CAST(d + {s} * {s} * {q} AS BIGINT) AS d
  FROM hc{k - 1}
)"""
        )
        s //= 2
    parts.append(
        f""",
hcg AS MATERIALIZED (
  SELECT c.x, c.y, c.morton, c.d AS hilbert,
         CAST(coalesce(w.w, 0) AS BIGINT) AS w
  FROM hc{k} c
  LEFT JOIN (
    SELECT {hx} % {HC_N} AS x, {hy} % {HC_N} AS y,
           CAST(count(*) AS BIGINT) AS w
    FROM documents GROUP BY 1, 2
  ) w USING (x, y)
),
hcrows AS (
  SELECT 'hilbert' AS curve, x, y, hilbert AS d, w FROM hcg
  UNION ALL
  SELECT 'morton', x, y, morton, w FROM hcg
),
hcrects AS (
  SELECT ri, rw, rh,
         {hrx} % ({HC_N} + 1 - rw) AS rx,
         {hry} % ({HC_N} + 1 - rh) AS ry
  FROM (
    SELECT i AS ri,
           2 + {hrw} % 6 AS rw,
           2 + {hrh} % 6 AS rh
    FROM (SELECT unnest(range({HC_RECTS})) AS i)
  )
),
hcpred AS (
  SELECT c.curve, c.x, c.y, c.w, c.d, p.x AS px, p.y AS py
  FROM hcrows c
  LEFT JOIN hcrows p ON p.curve = c.curve AND p.d = c.d - 1
),
hcruns AS (
  SELECT c.curve,
         CAST(sum(CASE WHEN c.px IS NULL OR c.px < r.rx
                   OR c.px >= r.rx + r.rw OR c.py < r.ry
                   OR c.py >= r.ry + r.rh THEN 1 ELSE 0 END) AS BIGINT)
           AS total_runs,
         CAST(sum(c.w) AS BIGINT) AS mass_covered
  FROM hcpred c JOIN hcrects r
    ON c.x >= r.rx AND c.x < r.rx + r.rw
   AND c.y >= r.ry AND c.y < r.ry + r.rh
  GROUP BY 1
),
hcsteps AS (
  SELECT a.curve,
         CAST(sum(CASE WHEN abs(a.x - b.x) + abs(a.y - b.y) <> 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS adj_violations,
         CAST(max(abs(a.x - b.x) + abs(a.y - b.y)) AS BIGINT)
           AS max_step_jump
  FROM hcrows a JOIN hcrows b
    ON a.curve = b.curve AND b.d = a.d + 1
  GROUP BY 1
)
SELECT s.curve, CAST({HC_N * HC_N} AS BIGINT) AS n_cells,
       s.adj_violations, s.max_step_jump,
       CAST({HC_RECTS} AS BIGINT) AS n_rects,
       r.total_runs, r.mass_covered
FROM hcsteps s JOIN hcruns r USING (curve)"""
    )
    return "".join(parts)


QUERIES["layout_hilbert_vs_zorder"] = (
    layout_hilbert_vs_zorder,
    _sql_hilbert(),
)
