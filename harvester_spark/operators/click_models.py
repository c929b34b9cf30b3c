"""Click-model analytics over the interaction log — the feedback loop of a
web-scale search tier.

The reference records user interactions only implicitly (harvest metrics);
a production search engine closes the loop with click modeling: position
bias must be removed from click-through logs before clicks can train or
evaluate rankers (unbiased LTR). Three operators:

- ``events_ctr_position`` — the naive position-CTR curve (the biased
  baseline every click-model paper starts from).
- ``click_model_pbm`` — the Position-Based Model (Craswell et al. 2008;
  EM formulation as in Chuklin/Markov/de Rijke, *Click Models for Web
  Search* 2015): P(click) = γ_position · α_item, with γ (examination) and
  α (attractiveness) estimated by EM. Three EM iterations are UNROLLED
  with all parameters in integer milli-units — every E-step latent and
  M-step mean is multiply-then-integer-divide on nonnegative int64, the
  host_pagerank / k-means integer-exact-iteration contract — so Spark and
  the DuckDB chained-CTE oracle agree bit-for-bit.
- ``coclick_item_sim`` — item-item co-click cosine similarity (the
  classic "related items" / query-suggestion signal): ranking by cosine²
  = co²/(n_i·n_j), an exact integer rational that orders identically to
  cosine on nonnegatives, so no float ever enters the top-k.

Click synthesis (events carry no click-per-impression label): every event
row is an impression of item = props.k at position 1 + event_id % 10;
the label is drawn deterministically as u < γ_true(p)·α_true(item)/1000
with u = md5-derived uniform in [0,1000) — Philox-style determinism,
partitioning-independent, and NON-degenerate by construction (both a real
position effect γ_true = 1000/p and a real item effect α_true spread over
[150,849] exist for the EM to find; test-pinned).

Scale shape (the plan a 100 TB click log needs): the impression relation
is scanned once and cached; each EM iteration is two BROADCAST hash joins
(γ is |positions| rows, α is |items| rows — parameter tables are always
dimension-sized, never log-sized) plus two map-side-combinable groupBys.
Nothing log-sized reaches the driver. The co-click self-join fans out per
(user, item-pair) bounded by the per-user distinct-item count — the
standard cap-and-salt guard at planetary scale is documented on the
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from harvester_spark.operators.common import load

QUERIES: dict = {}

N_POS = 10
PBM_ITERS = 3
_MILLI = 1000

# --- deterministic impression/click synthesis (shared by all three ops)

# item attractiveness spread over [150, 849] milli, coprime stride so the
# item→alpha map is a permutation-ish scatter (non-degenerate)
_ALPHA_TRUE = "CAST(150 + (item * 37) % 700 AS BIGINT)"
_GAMMA_TRUE = f"CAST({_MILLI} {{div}} p AS BIGINT)"

_SQL_IMPR = f"""
  SELECT event_id,
         1 + event_id % {N_POS} AS p,
         CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS item,
         CASE WHEN CAST(('0x' || substr(md5('ck' || CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) % {_MILLI}
              < ({_GAMMA_TRUE.format(div='//')} * {_ALPHA_TRUE}) // {_MILLI}
              THEN 1 ELSE 0 END AS c
  FROM events
"""


def _impressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    item = F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long")
    p = (F.lit(1) + F.col("event_id") % N_POS).cast("long")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ck"), F.col("event_id").cast("string"))), 1, 14
            ),
            16,
            10,
        ).cast("long")
        % _MILLI
    )
    return (
        ev.select("event_id", p.alias("p"), item.alias("item"), u.alias("u"))
        .withColumn(
            "c",
            F.expr(
                f"CASE WHEN u < ({_GAMMA_TRUE.format(div='DIV')} * {_ALPHA_TRUE}) DIV {_MILLI}"
                " THEN 1 ELSE 0 END"
            ).cast("long"),
        )
        .select("event_id", "p", "item", "c")
    )


# ------------------------------------------------ position-CTR baseline


def events_ctr_position(spark, sf_dir):
    """(p, n_impr, n_clicks, ctr_micro, gamma_true_milli): the raw
    position-CTR curve of the synthesized click log — the biased estimate
    the PBM exists to correct."""
    impr = _impressions(spark, sf_dir)
    return (
        impr.groupBy("p")
        .agg(
            F.count("*").cast("long").alias("n_impr"),
            F.sum("c").cast("long").alias("n_clicks"),
        )
        .withColumn(
            "ctr_micro", F.expr("CAST(n_clicks * 1000000 DIV n_impr AS BIGINT)")
        )
        .withColumn("gamma_true_milli", F.expr(_GAMMA_TRUE.format(div="DIV")))
        .select("p", "n_impr", "n_clicks", "ctr_micro", "gamma_true_milli")
    )


SQL_CTR_POSITION = f"""
WITH impr AS ({_SQL_IMPR})
SELECT p,
       CAST(count(*) AS BIGINT) AS n_impr,
       CAST(sum(c) AS BIGINT) AS n_clicks,
       CAST(CAST(sum(c) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS ctr_micro,
       {_GAMMA_TRUE.format(div='//')} AS gamma_true_milli
FROM impr GROUP BY p
"""

QUERIES["events_ctr_position"] = (events_ctr_position, SQL_CTR_POSITION)


# --------------------------------------------------------- PBM via EM

# E-step latents for an unclicked impression (clicked ⇒ both examined and
# attractive, deterministically 1000):
#   P(E=1 | C=0) = γ(1−α) / (1 − γα),  P(A=1 | C=0) = α(1−γ) / (1 − γα)
# in milli: numerators γ·(1000−α)·1000 and α·(1000−γ)·1000 over
# denom = 1000·1000 − γ·α (guarded ≥ 1, reachable only if BOTH params
# saturate at exactly 1000). M-step: per-parameter integer mean.
_E_DENOM = f"greatest({_MILLI * _MILLI} - g * a, CAST(1 AS BIGINT))"
_E_EXAM = (
    f"CAST(CASE WHEN c = 1 THEN {_MILLI}"
    f" ELSE (g * ({_MILLI} - a) * {_MILLI}) {{div}} ({_E_DENOM}) END AS BIGINT)"
)
_E_ATTR = (
    f"CAST(CASE WHEN c = 1 THEN {_MILLI}"
    f" ELSE (a * ({_MILLI} - g) * {_MILLI}) {{div}} ({_E_DENOM}) END AS BIGINT)"
)


def click_model_pbm(spark, sf_dir):
    """(p, n_impr, gamma_true_milli, gamma_em_milli): examination
    probability per position after {PBM_ITERS} integer-exact EM
    iterations, next to the planted truth."""
    impr = _impressions(spark, sf_dir).cache()
    gamma = impr.select("p").distinct().withColumn(
        "g", F.lit(_MILLI // 2).cast("long")
    )
    alpha = impr.select("item").distinct().withColumn(
        "a", F.lit(_MILLI // 2).cast("long")
    )
    for _ in range(PBM_ITERS):
        est = (
            impr.join(F.broadcast(gamma), "p")
            .join(F.broadcast(alpha), "item")
            .withColumn("ee", F.expr(_E_EXAM.format(div="DIV")))
            .withColumn("ea", F.expr(_E_ATTR.format(div="DIV")))
        )
        gamma = est.groupBy("p").agg(
            F.expr("CAST(sum(ee) DIV count(*) AS BIGINT)").alias("g")
        ).localCheckpoint()
        alpha = est.groupBy("item").agg(
            F.expr("CAST(sum(ea) DIV count(*) AS BIGINT)").alias("a")
        ).localCheckpoint()
    counts = impr.groupBy("p").agg(F.count("*").cast("long").alias("n_impr"))
    return (
        counts.join(gamma, "p")
        .withColumn("gamma_true_milli", F.expr(_GAMMA_TRUE.format(div="DIV")))
        .select(
            "p", "n_impr", "gamma_true_milli", F.col("g").alias("gamma_em_milli")
        )
    )


def _sql_pbm() -> str:
    parts = [
        f"""WITH impr AS MATERIALIZED ({_SQL_IMPR}),
g0 AS MATERIALIZED (
  SELECT DISTINCT p, CAST({_MILLI // 2} AS BIGINT) AS g FROM impr
),
a0 AS MATERIALIZED (
  SELECT DISTINCT item, CAST({_MILLI // 2} AS BIGINT) AS a FROM impr
)"""
    ]
    for k in range(1, PBM_ITERS + 1):
        parts.append(
            f""",
e{k} AS MATERIALIZED (
  SELECT i.p, i.item,
         {_E_EXAM.format(div='//')} AS ee,
         {_E_ATTR.format(div='//')} AS ea
  FROM impr i JOIN g{k - 1} USING (p) JOIN a{k - 1} USING (item)
),
g{k} AS MATERIALIZED (
  SELECT p, CAST(sum(ee) // count(*) AS BIGINT) AS g FROM e{k} GROUP BY p
),
a{k} AS MATERIALIZED (
  SELECT item, CAST(sum(ea) // count(*) AS BIGINT) AS a FROM e{k} GROUP BY item
)"""
        )
    parts.append(
        f"""
SELECT p, CAST(count(*) AS BIGINT) AS n_impr,
       {_GAMMA_TRUE.format(div='//')} AS gamma_true_milli,
       max(g) AS gamma_em_milli
FROM impr JOIN g{PBM_ITERS} USING (p)
GROUP BY p"""
    )
    return "".join(parts)


QUERIES["click_model_pbm"] = (click_model_pbm, _sql_pbm())


# ------------------------------------------------ co-click item cosine

# "Users who clicked X also clicked Y": item-item cosine over the binary
# user-item click matrix. Ranking uses cosine² = co² / (n_i · n_j) — an
# exact integer rational, order-identical to cosine for nonnegative
# counts, so the top-k needs no float and no sqrt. At planetary scale the
# per-user self-join is capped (drop users with > L distinct clicked
# items — power users add O(L²) pairs and mostly noise) and the pair
# groupBy is the one shuffle; here the item space is compacted to
# {COCLICK_ITEMS} so sandbox-SF co-occurrence is dense (non-degenerate).

COCLICK_ITEMS = 30
COCLICK_K = 20


def coclick_item_sim(spark, sf_dir):
    """(rank, item_i, item_j, co, n_i, n_j, cos2_micro): top-{COCLICK_K}
    co-clicked item pairs by cosine² of the binary user-item matrix."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    ui = (
        ev.select(
            "user_id",
            (F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long") % COCLICK_ITEMS).alias("item"),
        )
        .distinct()
    )
    ni = ui.groupBy("item").agg(F.count("*").cast("long").alias("n"))
    a = ui.select("user_id", F.col("item").alias("item_i"))
    b = ui.select("user_id", F.col("item").alias("item_j"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("item_i") < F.col("item_j"))
        .groupBy("item_i", "item_j")
        .agg(F.count("*").cast("long").alias("co"))
    )
    scored = (
        co.join(F.broadcast(ni.withColumnRenamed("item", "item_i").withColumnRenamed("n", "n_i")), "item_i")
        .join(F.broadcast(ni.withColumnRenamed("item", "item_j").withColumnRenamed("n", "n_j")), "item_j")
        .withColumn(
            "cos2_micro", F.expr("CAST(co * co * 1000000 DIV (n_i * n_j) AS BIGINT)")
        )
    )
    top = scored.orderBy(
        F.col("cos2_micro").desc(), F.col("item_i").asc(), F.col("item_j").asc()
    ).limit(COCLICK_K)
    w = W.orderBy(
        F.col("cos2_micro").desc(), F.col("item_i").asc(), F.col("item_j").asc()
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "item_i", "item_j", "co", "n_i", "n_j", "cos2_micro"
    )


SQL_COCLICK = f"""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % {COCLICK_ITEMS} AS item
  FROM events WHERE event_type = 'click'
),
ni AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM ui GROUP BY item),
co AS (
  SELECT a.item AS item_i, b.item AS item_j, CAST(count(*) AS BIGINT) AS co
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
),
scored AS (
  SELECT item_i, item_j, co, ni.n AS n_i, nj.n AS n_j,
         CAST(co * co * 1000000 // (ni.n * nj.n) AS BIGINT) AS cos2_micro
  FROM co JOIN ni ON ni.item = co.item_i JOIN ni nj ON nj.item = co.item_j
)
SELECT CAST(row_number() OVER (
         ORDER BY cos2_micro DESC, item_i ASC, item_j ASC) AS INT) AS rank,
       item_i, item_j, co, n_i, n_j, cos2_micro
FROM scored
ORDER BY rank LIMIT {COCLICK_K}
"""

QUERIES["coclick_item_sim"] = (coclick_item_sim, SQL_COCLICK)


# ---------------------------------------------------- cascade model

# The Cascade Model (Craswell et al., WSDM 2008) — the third classic
# next to the position-CTR baseline and the PBM EM: the user scans the
# ranked list top-down, clicks the FIRST attractive item, and stops.
# Its MLE is CLOSED-FORM (no EM): α̂(d) = clicks(d) / examinations(d),
# where d is examined iff its rank ≤ the session's first-click rank
# (every rank if the session has no click) — so the whole estimator is
# one explode + one per-session min + one groupBy, all exact integers.
#
# Session synthesis (events carry no ranked lists): each event row is a
# session of CAS_DEPTH ranked slots; slot items and the per-slot
# attraction draw come from independent md5 scatters, attraction uses
# the SAME planted α_true = 150 + (item·37) % 700 as the PBM — so the
# recovery test pins that the closed form finds the planted spread
# (non-degenerate: α̂ is NOT constant, high-α items beat low-α items).
# Determinism: the md5-uniform u < α_true comparison is pure integer in
# both engines; α̂ is a floored milli division.
#
# Scale shape: explode is map-only (CAS_DEPTH× the log, the standard
# impression unnesting); first-click is ONE session-keyed window min;
# the item agg is map-side combinable. Parameter output is item-sized.

CAS_DEPTH = 5
CAS_ITEMS = 40


def click_model_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item, n_examined, n_clicked, alpha_hat_milli, alpha_true_milli):
    closed-form cascade-model attractiveness MLE over synthesized
    top-down-scan sessions with the planted α_true."""
    ev = load(spark, sf_dir, "events").select("event_id")
    slots = ev.select(
        "event_id",
        F.explode(F.sequence(F.lit(1), F.lit(CAS_DEPTH))).alias("r"),
    )
    h_item = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("cs|"),
                    F.col("event_id").cast("string"),
                    F.lit("|"),
                    F.col("r").cast("string"),
                )
            ),
            1,
            14,
        ),
        16,
        10,
    ).cast("long")
    h_u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("cu|"),
                    F.col("event_id").cast("string"),
                    F.lit("|"),
                    F.col("r").cast("string"),
                )
            ),
            1,
            14,
        ),
        16,
        10,
    ).cast("long")
    imp = slots.select(
        "event_id",
        "r",
        (h_item % CAS_ITEMS).alias("item"),
        (h_u % _MILLI).alias("u"),
    ).withColumn(
        "attracted",
        F.expr(f"CASE WHEN u < {_ALPHA_TRUE} THEN 1 ELSE 0 END"),
    )
    wfc = W.partitionBy("event_id")
    imp = imp.withColumn(
        "fc",
        F.min(F.when(F.col("attracted") == 1, F.col("r"))).over(wfc),
    )
    examined = imp.filter(
        F.col("r") <= F.coalesce(F.col("fc"), F.lit(CAS_DEPTH))
    ).withColumn(
        "clicked",
        ((F.col("attracted") == 1) & (F.col("r") == F.col("fc")))
        .cast("long"),
    )
    return (
        examined.groupBy("item")
        .agg(
            F.count("*").cast("long").alias("n_examined"),
            F.sum("clicked").cast("long").alias("n_clicked"),
        )
        .select(
            "item",
            "n_examined",
            "n_clicked",
            F.expr(
                f"CAST(({_MILLI} * n_clicked) DIV n_examined AS BIGINT)"
            ).alias("alpha_hat_milli"),
            F.expr(f"{_ALPHA_TRUE}").alias("alpha_true_milli"),
        )
    )


SQL_CASCADE = f"""
WITH slots AS (
  SELECT event_id, CAST(r AS BIGINT) AS r
  FROM events CROSS JOIN (SELECT unnest(range(1, {CAS_DEPTH + 1})) AS r)
),
imp AS (
  SELECT event_id, r,
         CAST(('0x' || substr(md5('cs|' || CAST(event_id AS VARCHAR)
           || '|' || CAST(r AS VARCHAR)), 1, 14)) AS BIGINT)
           % {CAS_ITEMS} AS item,
         CAST(('0x' || substr(md5('cu|' || CAST(event_id AS VARCHAR)
           || '|' || CAST(r AS VARCHAR)), 1, 14)) AS BIGINT)
           % {_MILLI} AS u
  FROM slots
),
att AS (
  SELECT event_id, r, item,
         CASE WHEN u < {_ALPHA_TRUE} THEN 1 ELSE 0 END AS attracted
  FROM imp
),
fc AS (
  SELECT *,
         min(CASE WHEN attracted = 1 THEN r END)
           OVER (PARTITION BY event_id) AS fc
  FROM att
),
examined AS (
  SELECT item,
         CASE WHEN attracted = 1 AND r = fc THEN 1 ELSE 0 END AS clicked
  FROM fc WHERE r <= coalesce(fc, {CAS_DEPTH})
)
SELECT item, CAST(count(*) AS BIGINT) AS n_examined,
       CAST(sum(clicked) AS BIGINT) AS n_clicked,
       CAST(({_MILLI} * CAST(sum(clicked) AS BIGINT)) // count(*)
            AS BIGINT) AS alpha_hat_milli,
       {_ALPHA_TRUE} AS alpha_true_milli
FROM examined GROUP BY item
"""

QUERIES["click_model_cascade"] = (click_model_cascade, SQL_CASCADE)


# ------------------------------------------- calibration / ECE eval

# Score calibration of a click predictor (Platt/ECE methodology —
# Naeini et al. AAAI 2015 for the binned ECE): reliability bins of
# predicted click probability vs observed click rate, and the Expected
# Calibration Error Σ_b (n_b/N)·|mean_pred_b − mean_obs_b|. Two
# synthesized cohorts ride the same pipeline:
#   'calibrated'  — clicks drawn with p_true = p_pred
#   'miscal'      — clicks drawn with p_true = (7·p_pred)/10 + 50 milli
# (a planted slope-0.7 + offset miscalibration). The eval must find the
# plant: ECE(miscal) ≫ ECE(calibrated), and the per-bin observed rates
# of the miscal cohort track the planted transform — pinned by the
# pytest, so the metric is shown to DETECT miscalibration rather than
# reporting a constant.
#
# Determinism: p_pred and the click draw are md5 scatters (integer
# milli comparisons in both engines); per-bin means are floored milli
# divisions; ECE is an exact integer Σ n_b·|gap| with ONE final floored
# division by N.
#
# Scale shape: map-only synthesis, one groupBy((cohort, bin)) with
# map-side combine, a cohort-level broadcast for N and ECE — nothing
# log-sized leaves the executors.


def ranker_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort, bin, n, mean_pred_milli, mean_obs_milli, gap_milli,
    ece_milli): reliability-diagram bins + ECE for a calibrated and a
    planted-miscalibrated click cohort."""
    ev = load(spark, sf_dir, "events").select("event_id")
    cohorts = spark.createDataFrame(
        [("calibrated",), ("miscal",)], "cohort string"
    )
    imp = ev.crossJoin(F.broadcast(cohorts)).select(
        "cohort",
        "event_id",
        (
            100
            + F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cp"), F.col("event_id").cast("string"))),
                    1, 14,
                ), 16, 10,
            ).cast("long") % 800
        ).alias("p_pred"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cc|"), F.col("cohort"), F.lit("|"),
                            F.col("event_id").cast("string"),
                        )
                    ), 1, 14,
                ), 16, 10,
            ).cast("long") % _MILLI
        ).alias("u"),
    )
    clicked = imp.withColumn(
        "p_true",
        F.expr(
            "CASE WHEN cohort = 'calibrated' THEN p_pred"
            " ELSE (7 * p_pred) DIV 10 + 50 END"
        ),
    ).withColumn(
        "c", F.expr("CASE WHEN u < p_true THEN 1 ELSE 0 END").cast("long")
    )
    bins = (
        clicked.withColumn("bin", F.expr("p_pred DIV 100"))
        .groupBy("cohort", "bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("p_pred").cast("long").alias("sp"),
            F.sum("c").cast("long").alias("sc"),
        )
        .select(
            "cohort",
            "bin",
            "n",
            F.expr("CAST(sp DIV n AS BIGINT)").alias("mean_pred_milli"),
            F.expr(f"CAST(({_MILLI} * sc) DIV n AS BIGINT)").alias(
                "mean_obs_milli"
            ),
        )
        .withColumn(
            "gap_milli",
            (F.col("mean_pred_milli") - F.col("mean_obs_milli")).cast("long"),
        )
    )
    ece = bins.groupBy("cohort").agg(
        F.expr(
            "CAST(sum(n * abs(gap_milli)) DIV sum(n) AS BIGINT)"
        ).alias("ece_milli")
    )
    return bins.join(F.broadcast(ece), "cohort").select(
        "cohort", "bin", "n", "mean_pred_milli", "mean_obs_milli",
        "gap_milli", "ece_milli",
    )


SQL_CALIBRATION = f"""
WITH imp AS (
  SELECT cohort, event_id,
         100 + CAST(('0x' || substr(md5('cp' || CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) % 800
           AS p_pred,
         CAST(('0x' || substr(md5('cc|' || cohort || '|' || CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) % {_MILLI}
           AS u
  FROM events
  CROSS JOIN (SELECT unnest(['calibrated', 'miscal']) AS cohort)
),
clicked AS (
  SELECT cohort, p_pred,
         CASE WHEN u < CASE WHEN cohort = 'calibrated' THEN p_pred
                            ELSE (7 * p_pred) // 10 + 50 END
              THEN 1 ELSE 0 END AS c
  FROM imp
),
bins AS (
  SELECT cohort, p_pred // 100 AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(p_pred) AS BIGINT) // count(*) AS BIGINT)
           AS mean_pred_milli,
         CAST(({_MILLI} * CAST(sum(c) AS BIGINT)) // count(*) AS BIGINT)
           AS mean_obs_milli
  FROM clicked GROUP BY 1, 2
),
gaps AS (
  SELECT *, CAST(mean_pred_milli - mean_obs_milli AS BIGINT) AS gap_milli
  FROM bins
),
ece AS (
  SELECT cohort,
         CAST(CAST(sum(n * abs(gap_milli)) AS BIGINT)
              // CAST(sum(n) AS BIGINT) AS BIGINT) AS ece_milli
  FROM gaps GROUP BY 1
)
SELECT g.cohort, g.bin, g.n, g.mean_pred_milli, g.mean_obs_milli,
       g.gap_milli, e.ece_milli
FROM gaps g JOIN ece e USING (cohort)
"""

QUERIES["ranker_calibration_ece"] = (ranker_calibration_ece, SQL_CALIBRATION)


# ------------------------------------- hourly cascade stats (+ stream)

# The WINDOWED twin of click_model_cascade, built so the SAME derivation
# is streaming-legal: the whole synthesized session (slots, attraction
# draws, first-click position) is computed ROW-LOCALLY with higher-order
# array functions — no per-session window over the stream — and only
# then exploded into (item, examined, clicked) impression rows. The
# batch operator aggregates them per (hour, item); the streaming twin
# (streaming/windowed.windowed_cascade_stats) runs the identical
# expression chain under a watermark + tumbling window, so per-window
# sufficient statistics (n_examined, n_clicked) are mergeable integers
# and the stream's output is row-identical to this operator (parity
# test, parquet chunks — JSON truncates microseconds).
#
# Scale shape: map-only synthesis (CAS_DEPTH-wide arrays), ONE
# (hour, item)-keyed groupBy with map-side combine; streaming state is
# bounded by open-windows × items.

_CAS_SLOTS_EXPR = f"""
transform(
  transform(sequence(1, {CAS_DEPTH}), r -> named_struct(
    'r', r,
    'item', CAST(conv(substring(md5(concat('cs|', CAST(event_id AS STRING),
              '|', CAST(r AS STRING))), 1, 14), 16, 10) AS BIGINT)
            % {CAS_ITEMS},
    'u', CAST(conv(substring(md5(concat('cu|', CAST(event_id AS STRING),
           '|', CAST(r AS STRING))), 1, 14), 16, 10) AS BIGINT) % {_MILLI}
  )),
  s -> named_struct('r', s.r, 'item', s.item,
                    'att', s.u < 150 + (s.item * 37) % 700)
)
"""


def cascade_impressions(df: DataFrame) -> DataFrame:
    """events(ts, event_id) → row-local exploded cascade impressions
    (ts, item, examined=1 rows with clicked flag) — streaming-legal."""
    slotted = df.withColumn("slots", F.expr(_CAS_SLOTS_EXPR)).withColumn(
        "fc",
        F.expr(
            "array_min(transform(filter(slots, s -> s.att), s -> s.r))"
        ),
    )
    return slotted.select(
        "ts",
        F.explode(
            F.expr(f"filter(slots, s -> s.r <= coalesce(fc, {CAS_DEPTH}))")
        ).alias("s"),
        "fc",
    ).select(
        "ts",
        F.col("s.item").alias("item"),
        F.expr("CASE WHEN s.att AND s.r = fc THEN 1 ELSE 0 END")
        .cast("long")
        .alias("clicked"),
    )


def events_cascade_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour_bucket, item, n_examined, n_clicked, alpha_hat_milli):
    per-hour cascade-model sufficient statistics and attractiveness
    MLE — the batch twin of the watermarked streaming aggregation."""
    ev = load(spark, sf_dir, "events").select("ts", "event_id")
    imp = cascade_impressions(ev)
    return (
        imp.select(
            F.floor(F.unix_timestamp("ts") / 3600)
            .cast("long")
            .alias("hour_bucket"),
            "item",
            "clicked",
        )
        .groupBy("hour_bucket", "item")
        .agg(
            F.count("*").cast("long").alias("n_examined"),
            F.sum("clicked").cast("long").alias("n_clicked"),
        )
        .withColumn(
            "alpha_hat_milli",
            F.expr(
                f"CAST(({_MILLI} * n_clicked) DIV n_examined AS BIGINT)"
            ),
        )
    )


SQL_CASCADE_HOURLY = f"""
WITH slotted AS (
  SELECT ts, event_id,
         list_transform(
           list_transform(range(1, {CAS_DEPTH + 1}), r -> {{
             'r': r,
             'item': CAST(('0x' || substr(md5('cs|' || CAST(event_id AS VARCHAR)
                       || '|' || CAST(r AS VARCHAR)), 1, 14)) AS BIGINT)
                     % {CAS_ITEMS},
             'u': CAST(('0x' || substr(md5('cu|' || CAST(event_id AS VARCHAR)
                    || '|' || CAST(r AS VARCHAR)), 1, 14)) AS BIGINT)
                  % {_MILLI}
           }}),
           s -> {{'r': s.r, 'item': s.item,
                  'att': s.u < 150 + (s.item * 37) % 700}}
         ) AS slots
  FROM events
),
fcs AS (
  SELECT ts,
         slots,
         list_min(list_transform(list_filter(slots, s -> s.att),
                                 s -> s.r)) AS fc
  FROM slotted
),
imp AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
         u.s.item AS item,
         CASE WHEN u.s.att AND u.s.r = fc THEN 1 ELSE 0 END AS clicked
  FROM fcs,
       unnest(list_filter(slots, s -> s.r <= coalesce(fc, {CAS_DEPTH})))
         AS u(s)
)
SELECT hour_bucket, item,
       CAST(count(*) AS BIGINT) AS n_examined,
       CAST(sum(clicked) AS BIGINT) AS n_clicked,
       CAST(({_MILLI} * CAST(sum(clicked) AS BIGINT)) // count(*) AS BIGINT)
         AS alpha_hat_milli
FROM imp GROUP BY 1, 2
"""

QUERIES["events_cascade_hourly"] = (events_cascade_hourly, SQL_CASCADE_HOURLY)


# ---------------------------------------------- batched ε-greedy bandit

# The sequential-decision family (absent until now): a BATCHED ε-greedy
# multi-armed bandit over planted arm CTRs — the production shape of
# online ranking experiments (policies update per BATCH, not per event;
# Chapelle & Li's batched-bandit setting): each of BANDIT_ROUNDS rounds
# allocates BANDIT_N impressions — an ε = 0.2 md5 slice explores a
# uniform arm, the rest exploit the argmax of the cumulative
# clicks/pulls estimate from PREVIOUS rounds (ties arm asc; the cold
# start exploits arm 0) — then observes planted-CTR clicks and updates.
# The recovery pin: the exploit choice converges to the true best arm
# and per-round regret collapses after convergence.
#
# Determinism: every draw is an md5 scatter keyed (round, impression);
# the click draw is keyed by the CHOSEN arm too, so the counterfactual
# stream is well-defined; estimates are floored milli divisions;
# per-round argmax is a 6-row ORDER BY ... LIMIT 1. The round loop is
# the PBM/k-means integer-exact-iteration contract — the oracle unrolls
# it as a CTE chain.
#
# Scale shape: each round is one map-only impression synthesis + one
# arm-keyed groupBy; the policy state is an ARMS-row frame (broadcast);
# rounds are inherently sequential (that IS the semantics).

BANDIT_ARMS = 6
BANDIT_ROUNDS = 5
BANDIT_N = 2000
BANDIT_EPS_MILLI = 200
_B_CTR = "CAST(150 + ({arm} * 137) % 700 AS BIGINT)"  # best = arm 5: 835


def bandit_batched_egreedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, arm, exploit_arm, pulls, clicks, cum_pulls, cum_clicks,
    est_milli, regret_units): batched ε-greedy over planted arm CTRs;
    est_milli is the post-round cumulative estimate, regret_units =
    pulls·(best_ctr − ctr(arm)) in milli-impressions."""
    best_ctr = max(150 + (a * 137) % 700 for a in range(BANDIT_ARMS))
    arms = spark.range(BANDIT_ARMS).select(
        F.col("id").cast("long").alias("arm")
    )
    stats = arms.select(
        "arm",
        F.lit(0).cast("long").alias("cum_pulls"),
        F.lit(0).cast("long").alias("cum_clicks"),
    ).localCheckpoint()
    out = None
    for r in range(1, BANDIT_ROUNDS + 1):
        exploit = F.broadcast(
            stats.select(
                F.col("arm").alias("exploit_arm"),
                F.expr(
                    "CASE WHEN cum_pulls > 0"
                    " THEN (1000 * cum_clicks) DIV cum_pulls"
                    " ELSE CAST(0 AS BIGINT) END"
                ).alias("est"),
            )
            .orderBy(F.col("est").desc(), F.col("exploit_arm").asc())
            .limit(1)
            .select("exploit_arm")
        )
        imp = (
            spark.range(BANDIT_N)
            .select(F.col("id").cast("long").alias("i"))
            .crossJoin(exploit)
            .select(
                F.expr(
                    f"CASE WHEN CAST(conv(substring(md5(concat('b1|{r}|',"
                    " CAST(i AS STRING))), 1, 14), 16, 10) AS BIGINT)"
                    f" % 1000 < {BANDIT_EPS_MILLI}"
                    f" THEN CAST(conv(substring(md5(concat('b2|{r}|',"
                    " CAST(i AS STRING))), 1, 14), 16, 10) AS BIGINT)"
                    f" % {BANDIT_ARMS}"
                    " ELSE exploit_arm END"
                ).cast("long").alias("arm"),
                F.col("i"),
                F.col("exploit_arm"),
            )
            .withColumn(
                "clicked",
                F.expr(
                    f"CASE WHEN CAST(conv(substring(md5(concat('b3|{r}|',"
                    " CAST(i AS STRING), '|', CAST(arm AS STRING))),"
                    " 1, 14), 16, 10) AS BIGINT) % 1000"
                    f" < {_B_CTR.format(arm='arm')} THEN 1 ELSE 0 END"
                ).cast("long"),
            )
        )
        round_counts = imp.groupBy("arm", "exploit_arm").agg(
            F.count("*").cast("long").alias("pulls"),
            F.sum("clicked").cast("long").alias("clicks"),
        )
        stats = (
            stats.join(round_counts.select("arm", "pulls", "clicks"), "arm", "left")
            .select(
                "arm",
                (F.col("cum_pulls") + F.coalesce("pulls", F.lit(0)))
                .cast("long").alias("cum_pulls"),
                (F.col("cum_clicks") + F.coalesce("clicks", F.lit(0)))
                .cast("long").alias("cum_clicks"),
            )
            .localCheckpoint()
        )
        row = (
            arms.join(round_counts, "arm", "left")
            .crossJoin(F.broadcast(exploit.withColumnRenamed(
                "exploit_arm", "xarm")))
            .join(stats, "arm")
            .select(
                F.lit(r).alias("round"),
                "arm",
                F.col("xarm").alias("exploit_arm"),
                F.coalesce("pulls", F.lit(0)).cast("long").alias("pulls"),
                F.coalesce("clicks", F.lit(0)).cast("long").alias("clicks"),
                "cum_pulls",
                "cum_clicks",
                F.expr(
                    "CASE WHEN cum_pulls > 0"
                    " THEN CAST((1000 * cum_clicks) DIV cum_pulls AS BIGINT)"
                    " ELSE CAST(0 AS BIGINT) END"
                ).alias("est_milli"),
                F.expr(
                    f"CAST(coalesce(pulls, 0) * ({best_ctr} - {_B_CTR.format(arm='arm')})"
                    " AS BIGINT)"
                ).alias("regret_units"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_bandit() -> str:
    best_ctr = max(150 + (a * 137) % 700 for a in range(BANDIT_ARMS))
    parts = [f"""
WITH arms AS (SELECT CAST(unnest(range({BANDIT_ARMS})) AS BIGINT) AS arm),
st0 AS (
  SELECT arm, CAST(0 AS BIGINT) AS cum_pulls, CAST(0 AS BIGINT) AS cum_clicks
  FROM arms
)"""]
    prev = "st0"
    selects = []
    for r in range(1, BANDIT_ROUNDS + 1):
        parts.append(f""",
ex{r} AS MATERIALIZED (
  SELECT arm AS exploit_arm FROM (
    SELECT arm, CASE WHEN cum_pulls > 0
                     THEN (1000 * cum_clicks) // cum_pulls
                     ELSE CAST(0 AS BIGINT) END AS est
    FROM {prev}
  ) ORDER BY est DESC, exploit_arm ASC LIMIT 1
),
imp{r} AS (
  SELECT CASE WHEN CAST(('0x' || substr(md5('b1|{r}|' ||
              CAST(i AS VARCHAR)), 1, 14)) AS BIGINT) % 1000
              < {BANDIT_EPS_MILLI}
         THEN CAST(('0x' || substr(md5('b2|{r}|' ||
              CAST(i AS VARCHAR)), 1, 14)) AS BIGINT) % {BANDIT_ARMS}
         ELSE (SELECT exploit_arm FROM ex{r}) END AS arm,
         i
  FROM (SELECT CAST(unnest(range({BANDIT_N})) AS BIGINT) AS i)
),
rc{r} AS MATERIALIZED (
  SELECT arm, CAST(count(*) AS BIGINT) AS pulls,
         CAST(sum(CASE WHEN
           CAST(('0x' || substr(md5('b3|{r}|' || CAST(i AS VARCHAR)
                || '|' || CAST(arm AS VARCHAR)), 1, 14)) AS BIGINT) % 1000
           < {_B_CTR.format(arm='arm')} THEN 1 ELSE 0 END) AS BIGINT) AS clicks
  FROM imp{r} GROUP BY 1
),
st{r} AS MATERIALIZED (
  SELECT s.arm,
         CAST(s.cum_pulls + coalesce(c.pulls, 0) AS BIGINT) AS cum_pulls,
         CAST(s.cum_clicks + coalesce(c.clicks, 0) AS BIGINT) AS cum_clicks
  FROM {prev} s LEFT JOIN rc{r} c USING (arm)
)""")
        selects.append(f"""
SELECT {r} AS round, a.arm,
       (SELECT exploit_arm FROM ex{r}) AS exploit_arm,
       CAST(coalesce(c.pulls, 0) AS BIGINT) AS pulls,
       CAST(coalesce(c.clicks, 0) AS BIGINT) AS clicks,
       s.cum_pulls, s.cum_clicks,
       CASE WHEN s.cum_pulls > 0
            THEN CAST((1000 * s.cum_clicks) // s.cum_pulls AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS est_milli,
       CAST(coalesce(c.pulls, 0) * ({best_ctr} - {_B_CTR.format(arm='a.arm')})
            AS BIGINT) AS regret_units
FROM arms a
LEFT JOIN rc{r} c ON c.arm = a.arm
JOIN st{r} s ON s.arm = a.arm""")
        prev = f"st{r}"
    return "".join(parts) + "\nUNION ALL".join(selects)


QUERIES["bandit_batched_egreedy"] = (bandit_batched_egreedy, _sql_bandit())


# --------------------------------------------------- batched UCB1

# Auer, Cesa-Bianchi & Fischer (2002) UCB1 beside the ε-greedy batch
# bandit — the DETERMINISTIC exploration strategy (optimism under
# uncertainty replaces the random ε slice): each round allocates ALL
# of its traffic to the arm maximizing
#   ucb = est + sqrt(2·ln(t) / n_arm)
# over the cumulative stats, seeded by one warm-up round that pulls
# every arm equally (UCB is undefined at n = 0 — the standard init).
# Same planted arm CTRs as bandit_batched_egreedy, so the two
# strategies are directly comparable on regret; the pytest pins that
# UCB1 also finds the best arm and that its post-convergence regret is
# ZERO (no ε floor — the structural difference between the two).
#
# Determinism: est is a floored milli division; the confidence radius
# is ONE shared float string on the integer (t, n) pair with the
# micro-floor idiom, so the per-round 6-row argmax is bit-identical in
# both engines; click draws are the same md5 scatter keyed by the
# chosen arm.

UCB_ROUNDS = 5
UCB_N = 2000
_UCB_RAD = (
    "CAST(floor(sqrt(2.0e0 * ln(CAST({t} AS DOUBLE)) /"
    " CAST({n} AS DOUBLE)) * 1.0e3 + 0.5e0) AS BIGINT)"
)


def bandit_ucb1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, arm, chosen_arm, pulls, clicks, cum_pulls, cum_clicks,
    ucb_milli, regret_units): batched UCB1 over the planted arm CTRs;
    round 1 is the equal-pull warm-up."""
    best_ctr = max(150 + (a * 137) % 700 for a in range(BANDIT_ARMS))
    arms = spark.range(BANDIT_ARMS).select(
        F.col("id").cast("long").alias("arm")
    )
    stats = arms.select(
        "arm",
        F.lit(0).cast("long").alias("cum_pulls"),
        F.lit(0).cast("long").alias("cum_clicks"),
    ).localCheckpoint()
    out = None
    for r in range(1, UCB_ROUNDS + 1):
        if r == 1:
            # warm-up: every arm gets an equal slice
            imp = spark.range(UCB_N).select(
                (F.col("id") % BANDIT_ARMS).cast("long").alias("arm"),
                F.col("id").cast("long").alias("i"),
            )
            chosen = None
        else:
            t_total = (r - 1) * UCB_N
            chosen = F.broadcast(
                stats.select(
                    F.col("arm").alias("chosen_arm"),
                    (
                        F.expr(
                            "CASE WHEN cum_pulls > 0"
                            " THEN (1000 * cum_clicks) DIV cum_pulls"
                            " ELSE CAST(0 AS BIGINT) END"
                        )
                        + F.expr(
                            _UCB_RAD.format(t=t_total, n="cum_pulls")
                        )
                    ).alias("ucb"),
                )
                .orderBy(F.col("ucb").desc(), F.col("chosen_arm").asc())
                .limit(1)
                .select("chosen_arm")
            )
            imp = (
                spark.range(UCB_N)
                .select(F.col("id").cast("long").alias("i"))
                .crossJoin(chosen)
                .select(F.col("chosen_arm").alias("arm"), "i")
            )
        imp = imp.withColumn(
            "clicked",
            F.expr(
                f"CASE WHEN CAST(conv(substring(md5(concat('u3|{r}|',"
                " CAST(i AS STRING), '|', CAST(arm AS STRING))),"
                " 1, 14), 16, 10) AS BIGINT) % 1000"
                f" < {_B_CTR.format(arm='arm')} THEN 1 ELSE 0 END"
            ).cast("long"),
        )
        rc = imp.groupBy("arm").agg(
            F.count("*").cast("long").alias("pulls"),
            F.sum("clicked").cast("long").alias("clicks"),
        )
        stats = (
            stats.join(rc, "arm", "left")
            .select(
                "arm",
                (F.col("cum_pulls") + F.coalesce("pulls", F.lit(0)))
                .cast("long").alias("cum_pulls"),
                (F.col("cum_clicks") + F.coalesce("clicks", F.lit(0)))
                .cast("long").alias("cum_clicks"),
            )
            .localCheckpoint()
        )
        t_next = r * UCB_N
        row = (
            arms.join(rc, "arm", "left")
            .join(stats, "arm")
            .select(
                F.lit(r).alias("round"),
                "arm",
                F.coalesce("pulls", F.lit(0)).cast("long").alias("pulls"),
                F.coalesce("clicks", F.lit(0)).cast("long").alias("clicks"),
                "cum_pulls",
                "cum_clicks",
                (
                    F.expr(
                        "CASE WHEN cum_pulls > 0"
                        " THEN (1000 * cum_clicks) DIV cum_pulls"
                        " ELSE CAST(0 AS BIGINT) END"
                    )
                    + F.expr(_UCB_RAD.format(t=t_next, n="cum_pulls"))
                ).cast("long").alias("ucb_milli"),
                F.expr(
                    f"CAST(coalesce(pulls, 0)"
                    f" * ({best_ctr} - {_B_CTR.format(arm='arm')})"
                    " AS BIGINT)"
                ).alias("regret_units"),
            )
        )
        if chosen is None:
            row = row.withColumn("chosen_arm", F.lit(-1).cast("long"))
        else:
            row = row.crossJoin(
                chosen.withColumnRenamed("chosen_arm", "ca")
            ).withColumn("chosen_arm", F.col("ca")).drop("ca")
        out_row = row.select(
            "round", "arm", "chosen_arm", "pulls", "clicks",
            "cum_pulls", "cum_clicks", "ucb_milli", "regret_units",
        )
        out = out_row if out is None else out.unionByName(out_row)
    return out


def _sql_ucb1() -> str:
    best_ctr = max(150 + (a * 137) % 700 for a in range(BANDIT_ARMS))
    parts = [f"""
WITH arms AS (SELECT CAST(unnest(range({BANDIT_ARMS})) AS BIGINT) AS arm),
ist AS (
  SELECT arm, CAST(0 AS BIGINT) AS cum_pulls, CAST(0 AS BIGINT) AS cum_clicks
  FROM arms
)"""]
    prev = "ist"
    selects = []
    for r in range(1, UCB_ROUNDS + 1):
        if r == 1:
            impsrc = f"""
  SELECT CAST(i % {BANDIT_ARMS} AS BIGINT) AS arm, CAST(i AS BIGINT) AS i
  FROM (SELECT unnest(range({UCB_N})) AS i)"""
            chosen_expr = "CAST(-1 AS BIGINT)"
        else:
            t_total = (r - 1) * UCB_N
            parts.append(f""",
ch{r} AS MATERIALIZED (
  SELECT arm AS chosen_arm FROM (
    SELECT arm,
           CASE WHEN cum_pulls > 0
                THEN (1000 * cum_clicks) // cum_pulls
                ELSE CAST(0 AS BIGINT) END
           + {_UCB_RAD.format(t=t_total, n='cum_pulls')} AS ucb
    FROM {prev}
  ) ORDER BY ucb DESC, chosen_arm ASC LIMIT 1
)""")
            impsrc = f"""
  SELECT (SELECT chosen_arm FROM ch{r}) AS arm, CAST(i AS BIGINT) AS i
  FROM (SELECT unnest(range({UCB_N})) AS i)"""
            chosen_expr = f"(SELECT chosen_arm FROM ch{r})"
        parts.append(f""",
urc{r} AS MATERIALIZED (
  SELECT arm, CAST(count(*) AS BIGINT) AS pulls,
         CAST(sum(CASE WHEN
           CAST(('0x' || substr(md5('u3|{r}|' || CAST(i AS VARCHAR)
                || '|' || CAST(arm AS VARCHAR)), 1, 14)) AS BIGINT) % 1000
           < {_B_CTR.format(arm='arm')} THEN 1 ELSE 0 END) AS BIGINT)
           AS clicks
  FROM ({impsrc}) GROUP BY 1
),
ust{r} AS MATERIALIZED (
  SELECT s.arm,
         CAST(s.cum_pulls + coalesce(c.pulls, 0) AS BIGINT) AS cum_pulls,
         CAST(s.cum_clicks + coalesce(c.clicks, 0) AS BIGINT) AS cum_clicks
  FROM {prev} s LEFT JOIN urc{r} c USING (arm)
)""")
        t_next = r * UCB_N
        selects.append(f"""
SELECT {r} AS round, a.arm, {chosen_expr} AS chosen_arm,
       CAST(coalesce(c.pulls, 0) AS BIGINT) AS pulls,
       CAST(coalesce(c.clicks, 0) AS BIGINT) AS clicks,
       s.cum_pulls, s.cum_clicks,
       CAST(CASE WHEN s.cum_pulls > 0
            THEN (1000 * s.cum_clicks) // s.cum_pulls
            ELSE CAST(0 AS BIGINT) END
            + {_UCB_RAD.format(t=t_next, n='s.cum_pulls')} AS BIGINT)
         AS ucb_milli,
       CAST(coalesce(c.pulls, 0)
            * ({best_ctr} - {_B_CTR.format(arm='a.arm')}) AS BIGINT)
         AS regret_units
FROM arms a
LEFT JOIN urc{r} c ON c.arm = a.arm
JOIN ust{r} s ON s.arm = a.arm""")
        prev = f"ust{r}"
    return "".join(parts) + "\nUNION ALL".join(selects)


QUERIES["bandit_ucb1"] = (bandit_ucb1, _sql_ucb1())


# ---------------------------------------------- IPW click debiasing

# Unbiased learning-to-rank (Joachims et al., WSDM 2017) — the reason
# the click-model family exists: click COUNTS are position-confounded,
# and the inverse-propensity estimator α̂ = (1/n_i)·Σ c/γ(pos) removes
# the bias when the examination propensities γ are known (here: the
# synthesis' own γ = 1/p — in production, the PBM EM estimates them;
# click_model_pbm shows that works). The synthesis PLANTS the
# confound the estimator exists for: each item is always shown at
# position 1 + (item·3) % N_POS, so the naive CTR conflates an item's
# attractiveness with its position luck, while IPW divides it back
# out. The pytest pins both sides: IPW recovers the planted α spread
# (high-α items beat low-α across position assignments) AND the naive
# CTR provably misorders specific item pairs the plant scrambles.
#
# Determinism: γ = 1/p makes c/γ = c·p — pure integers; both
# estimators are floored milli divisions.
#
# Scale shape: map-only synthesis + one item-keyed groupBy carrying
# both estimators on the same shuffle.


def ltr_ipw_debias_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item, p, n_impr, n_clicks, naive_ctr_milli, ipw_alpha_milli,
    alpha_true_milli): naive vs inverse-propensity attractiveness
    estimates under planted position-item confounding."""
    ev = load(spark, sf_dir, "events").select("event_id")
    imp = ev.select(
        "event_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("iw|"), F.col("event_id").cast("string"))),
                    1, 14,
                ), 16, 10,
            ).cast("long") % 40
        ).alias("item"),
    ).withColumn(
        "p", (1 + (F.col("item") * 3) % N_POS).cast("long")
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ic|"), F.col("event_id").cast("string"))),
                1, 14,
            ), 16, 10,
        ).cast("long") % _MILLI,
    ).withColumn(
        "c",
        F.expr(
            f"CASE WHEN u < ({_GAMMA_TRUE.format(div='DIV')}"
            f" * {_ALPHA_TRUE}) DIV {_MILLI} THEN 1 ELSE 0 END"
        ).cast("long"),
    )
    return (
        imp.groupBy("item", "p")
        .agg(
            F.count("*").cast("long").alias("n_impr"),
            F.sum("c").cast("long").alias("n_clicks"),
        )
        .select(
            "item",
            "p",
            "n_impr",
            "n_clicks",
            F.expr(
                f"CAST(({_MILLI} * n_clicks) DIV n_impr AS BIGINT)"
            ).alias("naive_ctr_milli"),
            # gamma = 1/p  =>  c/gamma = c*p, exact integers
            F.expr(
                f"CAST(({_MILLI} * n_clicks * p) DIV n_impr AS BIGINT)"
            ).alias("ipw_alpha_milli"),
            F.expr(_ALPHA_TRUE).alias("alpha_true_milli"),
        )
    )


SQL_IPW_DEBIAS = f"""
WITH imp AS (
  SELECT event_id,
         CAST(('0x' || substr(md5('iw|' || CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) % 40
           AS item
  FROM events
),
pos AS (
  SELECT event_id, item, 1 + (item * 3) % {N_POS} AS p,
         CAST(('0x' || substr(md5('ic|' || CAST(event_id AS VARCHAR)), 1, 14)) AS BIGINT) % {_MILLI}
           AS u
  FROM imp
),
clk AS (
  SELECT item, p,
         CASE WHEN u < ({_GAMMA_TRUE.format(div='//')} * {_ALPHA_TRUE})
                       // {_MILLI} THEN 1 ELSE 0 END AS c
  FROM pos
)
SELECT item, CAST(p AS BIGINT) AS p,
       CAST(count(*) AS BIGINT) AS n_impr,
       CAST(sum(c) AS BIGINT) AS n_clicks,
       CAST(({_MILLI} * CAST(sum(c) AS BIGINT)) // count(*) AS BIGINT)
         AS naive_ctr_milli,
       CAST(({_MILLI} * CAST(sum(c) AS BIGINT) * p) // count(*) AS BIGINT)
         AS ipw_alpha_milli,
       {_ALPHA_TRUE} AS alpha_true_milli
FROM clk GROUP BY item, p
"""

QUERIES["ltr_ipw_debias_eval"] = (ltr_ipw_debias_eval, SQL_IPW_DEBIAS)
