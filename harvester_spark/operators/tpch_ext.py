"""TPC-H remainder — the 14 classic rollup/subquery shapes not yet covered
by relational.py (Q2/Q5/Q7/Q8/Q9/Q10/Q11/Q12/Q13/Q15/Q17/Q20/Q21/Q22),
adapted to the synthetic reduced schema (no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no c_phone): each adaptation keeps
the SHAPE — correlated scalar aggregates, decorrelated EXISTS/NOT EXISTS,
scalar-subquery HAVING, CASE rollups — which is what exercises the
optimizer. "Late" is l_shipdate > o_orderdate + 60 days throughout (the
same stand-in relational.py's Q4 uses); Q22's country code is
c_custkey % 7.

Determinism (cross-engine value hashes): all money in integer cents, all
shares in integer micro-units via multiply-then-integer-divide, all
avg-threshold comparisons cross-multiplied into exact integer form
(5·q·n < Σq instead of q < 0.2·avg), years cast to BIGINT on both
engines. No LIMIT without a unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.operators.common import cents, load, sql_cents

QUERIES: dict = {}

def _rev_c() -> F.Column:
    """Exact per-line revenue in integer cents (columns must be built lazily
    — module import happens before any SparkSession exists)."""
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")


_SQL_REV_C = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


# ------------------------------------------------------------------ Q2
# Minimum-cost supplier. No partsupp table, so "cost" is the minimum unit
# price a supplier ever shipped the part at: cents(extendedprice) DIV
# quantity (exact integer division — quantities are integral). The
# correlated scalar subquery (cost = MIN cost over the part) decorrelates
# into agg → agg → equi-join-back: per-(part, supplier) min, per-part min,
# then the join keeps min achievers.
#
# Scale: one shuffle on (partkey, suppkey) for the base agg; the per-part
# min is a map-side-combinable re-agg of that (already partitioned on a
# superset key); join-back is an equi-join AQE can broadcast when the
# filtered part set is small. Supplier/nation/region dims broadcast.


def q2_min_cost_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    unit_c = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT)"
        " DIV CAST(round(l_quantity) AS BIGINT)"
    )
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "n_name")
        .agg(F.min(unit_c).alias("unit_c"))
    )
    part_min = base.groupBy(F.col("p_partkey").alias("pm_key")).agg(
        F.min("unit_c").alias("min_c")
    )
    return base.join(
        part_min,
        (F.col("p_partkey") == F.col("pm_key")) & (F.col("unit_c") == F.col("min_c")),
    ).select("p_partkey", "s_suppkey", "s_name", "n_name", "unit_c")


SQL_Q2 = """
WITH eligible AS (
  SELECT l.l_partkey AS p_partkey, s.s_suppkey, s.s_name, n.n_name,
         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)
                  // CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS unit_c
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4
)
SELECT p_partkey, s_suppkey, s_name, n_name, unit_c
FROM eligible e
WHERE unit_c = (SELECT min(unit_c) FROM eligible m
                WHERE m.p_partkey = e.p_partkey)
"""

QUERIES["q2_min_cost_supplier"] = (q2_min_cost_supplier, SQL_Q2)


# ------------------------------------------------------------------ Q5
# Local supplier volume: revenue where the customer and the supplier sit in
# the same ASIA nation, one order year. Shape: the fact shuffles once per
# equi-join (orderkey, then the row-level c_nationkey = s_nationkey filter
# rides the customer join); nation⋈region broadcast twice.


def q5_local_supplier_volume(spark, sf_dir):
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = nat.join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(asia), F.col("s_nationkey") == asia.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_rev_c()).alias("revenue_c"))
    )


SQL_Q5 = f"""
SELECT n_name, CAST(sum({_SQL_REV_C}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

QUERIES["q5_local_supplier_volume"] = (q5_local_supplier_volume, SQL_Q5)


# ------------------------------------------------------------------ Q7
# Volume shipping between two nations, both directions, by ship year.
# Shape: two broadcast nation lookups rename into (supp_nation,
# cust_nation); the pair disjunction is a residual filter under the joins.


def q7_volume_shipping(spark, sf_dir):
    n1, n2 = "NATION_1", "NATION_2"
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(_rev_c()).alias("revenue_c"))
    )


SQL_Q7 = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum({_SQL_REV_C}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

QUERIES["q7_volume_shipping"] = (q7_volume_shipping, SQL_Q7)


# ------------------------------------------------------------------ Q8
# National market share: NATION_3 suppliers' share of ECONOMY-part revenue
# sold to AMERICA-region customers, per order year. Share in integer
# micro-units (nation_c · 1e6 DIV total_c) — no float division anywhere.


def q8_market_share(spark, sf_dir):
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    amer = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        F.col("n_nationkey").alias("am_key")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load(spark, sf_dir, "lineitem")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(amer), cust.c_nationkey == F.col("am_key"), "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", _rev_c()).otherwise(0)
            ).alias("nation_c"),
            F.sum(_rev_c()).alias("total_c"),
        )
    )
    return agg.selectExpr(
        "order_year",
        "nation_c",
        "total_c",
        "(nation_c * 1000000) DIV total_c AS mkt_share_micro",
    )


SQL_Q8 = f"""
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_SQL_REV_C}
                       ELSE 0 END) AS BIGINT) AS nation_c,
         CAST(sum({_SQL_REV_C}) AS BIGINT) AS total_c
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT order_year, nation_c, total_c,
       (nation_c * 1000000) // total_c AS mkt_share_micro
FROM agg
"""

QUERIES["q8_market_share"] = (q8_market_share, SQL_Q8)


# ------------------------------------------------------------------ Q9
# Product-type profit by supplier nation and year. No ps_supplycost — cost
# is p_retailprice per unit: profit_c = rev_c − cents(p_retailprice)·qty
# (exact: per-row cents rounding, integer multiply).


def q9_product_profit(spark, sf_dir):
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey", cents("p_retailprice").alias("retail_c")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    profit_c = _rev_c() - F.col("retail_c") * F.round("l_quantity").cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("long").alias("order_year")
        )
        .agg(F.sum(profit_c).alias("profit_c"))
    )


SQL_Q9 = f"""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(sum({_SQL_REV_C}
                - {sql_cents('p_retailprice')}
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS profit_c
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
"""

QUERIES["q9_product_profit"] = (q9_product_profit, SQL_Q9)


# ------------------------------------------------------------------ Q10
# Returned-item reporting: top 20 customers by returned revenue in one
# quarter. TakeOrdered tail with the unique (revenue_c desc, custkey asc)
# tie-break; nation broadcast.


def q10_returned_items(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", cents("c_acctbal").alias("acctbal_c")
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_rev_c()).alias("revenue_c"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "acctbal_c", "revenue_c")
        .orderBy(F.col("revenue_c").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


SQL_Q10 = f"""
SELECT c_custkey, c_name, n_name, {sql_cents('c_acctbal')} AS acctbal_c,
       CAST(sum({_SQL_REV_C}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_c DESC, c_custkey ASC
LIMIT 20
"""

QUERIES["q10_returned_items"] = (q10_returned_items, SQL_Q10)


# ------------------------------------------------------------------ Q11
# Important parts: parts whose revenue exceeds 1.5× the average per-part
# revenue. TPC-H's fixed fraction (1/1000 · 1/SF) degenerates to an empty
# set whenever the part count outgrows it, so the threshold here is
# RELATIVE to the part count — scale-invariant and non-empty at every sf
# by construction. The scalar HAVING subquery is a 1-row agg cross-joined
# back (Spark broadcasts the single row); the comparison is exact integers
# cross-multiplied (2·value_c·n > 3·total_c ⟺ value > 1.5·avg).


def q11_important_parts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev_c()).alias("value_c"))
    total = per_part.agg(
        F.sum("value_c").alias("total_c"), F.count("*").alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * F.col("n_parts") * 2 > F.col("total_c") * 3)
        .select(F.col("l_partkey").alias("p_partkey"), "value_c")
    )


SQL_Q11 = f"""
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         CAST(sum({_SQL_REV_C}) AS BIGINT) AS value_c
  FROM lineitem GROUP BY 1
), t AS (
  SELECT CAST(sum(value_c) AS BIGINT) AS total_c,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM per_part
)
SELECT p_partkey, value_c
FROM per_part, t
WHERE value_c * n_parts * 2 > total_c * 3
"""

QUERIES["q11_important_parts"] = (q11_important_parts, SQL_Q11)


# ------------------------------------------------------------------ Q12
# Shipping-priority rollup. No l_shipmode — the bucket is ship speed
# (FAST ≤ 30 days from order to ship, else SLOW); the CASE-sums split
# orders by priority class exactly like the original's high/low line.


def q12_ship_priority(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    speed = F.when(
        F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
        "FAST",
    ).otherwise("SLOW")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(speed.alias("ship_speed")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


SQL_Q12 = """
SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
            THEN 'FAST' ELSE 'SLOW' END AS ship_speed,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""

QUERIES["q12_ship_priority"] = (q12_ship_priority, SQL_Q12)


# ------------------------------------------------------------------ Q13
# Customer order-count distribution: LEFT join so zero-order customers
# land in the c_count = 0 bucket; the priority exclusion stands in for the
# original's comment NOT LIKE. Two inherent shuffles (per-customer count,
# then the tiny histogram re-agg).


def q13_customer_distribution(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


SQL_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey
                   AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
"""

QUERIES["q13_customer_distribution"] = (q13_customer_distribution, SQL_Q13)


# ------------------------------------------------------------------ Q15
# Top supplier: suppliers achieving the maximum quarterly revenue. The
# scalar MAX subquery is a 1-row agg broadcast back; integer cents make
# "equals the max" exact (no float-equality hazard).


def q15_top_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_c()).alias("total_c"))
    mx = rev.agg(F.max("total_c").alias("max_c"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_c") == F.col("max_c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_c")
    )


SQL_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum({_SQL_REV_C}) AS BIGINT) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_c
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_c = (SELECT max(total_c) FROM rev)
"""

QUERIES["q15_top_supplier"] = (q15_top_supplier, SQL_Q15)


# ------------------------------------------------------------------ Q17
# Small-quantity-order revenue: lines under 20% of their part's average
# quantity, one brand. The correlated AVG decorrelates into a per-part agg
# joined back; the threshold is cross-multiplied to exact integers:
# 5·qty·n_part < Σqty_part  ⟺  qty < 0.2·avg(qty).


def q17_small_quantity_revenue(spark, sf_dir):
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        cents("l_extendedprice").alias("price_c"),
        F.round("l_quantity").cast("long").alias("qty"),
    )
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    stats = brand_li.groupBy(F.col("l_partkey").alias("sp_key")).agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("n_lines")
    )
    return (
        brand_li.join(F.broadcast(stats), F.col("l_partkey") == F.col("sp_key"))
        .filter(F.col("qty") * F.col("n_lines") * 5 < F.col("sum_qty"))
        .agg(
            F.count("*").alias("n_small"),
            F.sum("price_c").alias("revenue_c"),
        )
    )


SQL_Q17 = f"""
WITH brand_li AS (
  SELECT l_partkey, {sql_cents('l_extendedprice')} AS price_c,
         CAST(round(l_quantity) AS BIGINT) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#5'
), stats AS (
  SELECT l_partkey AS sp_key, CAST(sum(qty) AS BIGINT) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM brand_li GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_small,
       CAST(sum(price_c) AS BIGINT) AS revenue_c
FROM brand_li JOIN stats ON l_partkey = sp_key
WHERE qty * n_lines * 5 < sum_qty
"""

QUERIES["q17_small_quantity_revenue"] = (q17_small_quantity_revenue, SQL_Q17)


# ------------------------------------------------------------------ Q20
# Dominant suppliers: suppliers who shipped MORE THAN HALF of some
# STANDARD part's 1997 volume (the excess-availability shape without
# partsupp: nested agg → semi-join → dim join). Exact integer comparison
# 2·supp_qty > part_qty.


def q20_dominant_suppliers(spark, sf_dir):
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", F.round("l_quantity").cast("long").alias("qty"))
    std_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_ps = std_li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("supp_qty")
    )
    per_part = per_ps.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        per_ps.join(per_part, per_ps.l_partkey == F.col("pp_key"))
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


SQL_Q20 = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS supp_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'STANDARD'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey AS pp_key, CAST(sum(supp_qty) AS BIGINT) AS part_qty
  FROM per_ps GROUP BY 1
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_part ON l_partkey = pp_key
  WHERE supp_qty * 2 > part_qty
)
"""

QUERIES["q20_dominant_suppliers"] = (q20_dominant_suppliers, SQL_Q20)


# ------------------------------------------------------------------ Q21
# Suppliers who kept orders waiting: the sole late supplier on a finished
# multi-supplier order ("late" = shipped > 60 days after order date).
# Shape: the classic EXISTS (another supplier) + NOT EXISTS (another LATE
# supplier) pair — expressed as two aggregated flags over one grouped pass
# instead of two correlated probes: per (order, supplier) compute
# any_late; per order compute n_suppliers and n_late_suppliers; keep late
# suppliers where n_suppliers > 1 AND n_late_suppliers = 1. One shuffle on
# orderkey, one tiny re-agg — no self-join of the fact table at all.


def q21_waiting_suppliers(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int")
        ).alias("is_late")
    )
    per_o = per_os.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    waiting = (
        per_os.join(per_o, per_os.l_orderkey == F.col("ok"))
        .filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


SQL_Q21 = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
), per_o AS (
  SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(is_late) AS BIGINT) AS n_late
  FROM per_os GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_os
JOIN per_o ON l_orderkey = ok
JOIN supplier ON s_suppkey = l_suppkey
WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY 1, 2
"""

QUERIES["q21_waiting_suppliers"] = (q21_waiting_suppliers, SQL_Q21)


# ------------------------------------------------------------------ Q22
# Global sales opportunity: well-funded customers (balance above the
# average positive balance — cross-multiplied exact: bal_c·n > Σbal_c)
# in certain "country codes" (c_custkey % 7 stands in for the phone
# prefix) with no RECENT order (every synthetic customer has some order,
# so the original's never-ordered predicate is degenerate here; "lapsed
# since 2000-07-01" keeps the NOT-EXISTS shape and a non-empty answer).
# Scalar agg broadcast + anti-join against the date-filtered order scan.


def q22_sales_opportunity(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 7).alias("cntrycode"),
        cents("c_acctbal").alias("bal_c"),
    )
    in_code = cust.filter(F.col("cntrycode").isin(1, 3, 5))
    pos = in_code.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_c"), F.count("*").alias("n_pos")
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-07-01"
    ).select("o_custkey")
    return (
        in_code.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_c"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"), F.sum("bal_c").alias("totbal_c"))
    )


SQL_Q22 = f"""
WITH in_code AS (
  SELECT c_custkey, c_custkey % 7 AS cntrycode,
         {sql_cents('c_acctbal')} AS bal_c
  FROM customer WHERE c_custkey % 7 IN (1, 3, 5)
), pos AS (
  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM in_code WHERE bal_c > 0
)
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_c) AS BIGINT) AS totbal_c
FROM in_code, pos
WHERE bal_c * n_pos > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY 1
"""

QUERIES["q22_sales_opportunity"] = (q22_sales_opportunity, SQL_Q22)
