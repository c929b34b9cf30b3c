"""Third ranking-family close-out: Jelinek-Mercer LM, DFR PL2, SDM.

Lucene ships four pluggable similarity families — BM25 (the repo-wide
contract in search/bm25.py), LM-Dirichlet (ft_lm_dirichlet_topk),
LM-Jelinek-Mercer, and DFR — selectable per-field in an OpenSearch index
body. The reference's index config
(/root/reference/harvester/search/models/index.py) only customizes
analyzers, so BM25 stays its default; these operators are the remaining
alternatives a ranking engineer would A/B against it, re-expressed as
verifiable (Spark, DuckDB-oracle) pairs. The sequential dependence model
(Metzler & Croft, SIGIR 2005) is the classic positional upgrade of the
unigram LM — the term-proximity family the reference reaches only through
OpenSearch `match_phrase` boosts.

- ``ft_lm_jm_topk`` — Jelinek-Mercer smoothed query likelihood
  (Lucene ``LMJelinekMercerSimilarity``, λ = 0.1 default):
  score(D,q) = Σ_t ln((1−λ)·tf/dl + λ·cf_t/|C|). Like the Dirichlet op,
  EVERY document scores every query term (tf = 0 falls back to the
  collection model), so the spine is documents × a broadcast 3-row term
  dim — map-only after the tf/dl aggs.
- ``ft_dfr_pl2_topk`` — DFR PL2 (Amati & van Rijsbergen 2002; Lucene
  ``DFRSimilarity(P, L, H2)``, c = 1): tfn = tf·log2(1 + avgdl/dl),
  λ_t = cf_t/N, and per matched term
  gain = (tfn·log2(tfn/λ) + (λ − tfn)·log2(e) + 0.5·log2(2π·tfn))/(tfn+1).
  Only matching (tf ≥ 1) docs are scored — the spine is the tf agg, the
  dims (df, N, total-length) broadcast.
- ``ft_sdm_topk`` — SDM with weights (λ_T, λ_O, λ_U) = (0.85, 0.10, 0.05):
  Dirichlet-smoothed log-likelihoods of three feature classes — unigram tf,
  ordered adjacent-bigram tf (positions p, p+1), and unordered
  window-8 co-occurrence tf (position pairs |p_a − p_b| < 8) — each
  smoothed against its own collection frequency over the same document
  length. Feature tfs come from ONE positional self-join restricted to the
  2 query bigrams; the scoring spine is documents × a broadcast 7-row
  feature dim (3 T + 2 O + 2 U).

Determinism contract (operators/__init__.py): per-(doc, feature)
log-probs are integer micro-nats via ONE shared expression string per
operator (the _DIR_LP idiom — ln-derived, round-to-micro, CAST BIGINT);
doc scores are exact int64 sums of those; SDM's λ weights become integer
centi-weights (85, 10, 5) multiplying micro-nats so the blend is an exact
int64 in centi-micro-nats. Every top-k tie-breaks (score desc, doc_id
asc). Float literals are written ``X.Ye0`` so both engines parse DOUBLE
(never DECIMAL — see CLAUDE.md).

Scale shapes (the 100 TB question):
- JM/Dirichlet-style all-docs scoring is a broadcast NLJ over a ≤7-row
  feature dim — map-only, no shuffle beyond the tf/dl aggs the corpus
  scan already pays. At cluster scale the all-docs spine is exactly the
  "every doc has a language-model score" table a training-data scorer
  materializes once per corpus snapshot.
- PL2 scores only matching docs: candidates come from the term postings
  (Σ df rows), the classic impact-ordered pruning shape.
- SDM's positional join self-joins ONLY the ≤3 query terms' position
  lists per doc (the phrase-scan shape search/phrase.py uses), never the
  full token stream against itself.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.operators.common import SQL_DOC_TOKS, doc_tokens, load
from harvester_spark.operators.fulltext_queries import BM25_TERMS

QUERIES: dict = {}

_TERMS_SQL = "('" + "', '".join(BM25_TERMS) + "')"

# ------------------------------------------------- Jelinek-Mercer LM

# λ = 0.1 (Lucene LMJelinekMercerSimilarity default). greatest(dl, 1)
# guards empty documents (tf is 0 there, so the doc term is 0 anyway).
_JM_LP = (
    "CAST(round(1000000.0e0 * ln("
    "0.9e0 * tf / greatest(dl, 1) + 0.1e0 * cf / ct"
    "), 0) AS BIGINT)"
)


def ft_lm_jm_topk(spark, sf_dir):
    """(rank, doc_id, logp_micro): top-10 docs by Jelinek-Mercer smoothed
    query likelihood of the flagship query, scores in integer micro-nats."""
    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    cf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
    )
    ct = toks.agg(F.count("*").cast("long").alias("ct"))
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    scored = (
        docs.join(dl, "doc_id", "left")
        .crossJoin(F.broadcast(cf))
        .join(tf, ["term", "doc_id"], "left")
        .crossJoin(F.broadcast(ct))
        .fillna(0, ["tf", "dl"])
        .withColumn("lp", F.expr(_JM_LP))
        .groupBy("doc_id")
        .agg(F.sum("lp").cast("long").alias("logp_micro"))
    )
    top = scored.orderBy(
        F.col("logp_micro").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = W.orderBy(F.col("logp_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "logp_micro"
    )


SQL_LM_JM = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
cfs AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN {_TERMS_SQL} GROUP BY 1
),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN {_TERMS_SQL} GROUP BY 1, 2
),
joined AS (
  SELECT d.doc_id AS doc_id, coalesce(tfs_.tf, 0) AS tf,
         coalesce(dls.dl, 0) AS dl, cfs.cf AS cf, ctt.ct AS ct
  FROM (SELECT doc_id FROM documents) d
  LEFT JOIN dls USING (doc_id)
  CROSS JOIN cfs
  LEFT JOIN tfs_ ON tfs_.term = cfs.term AND tfs_.doc_id = d.doc_id
  CROSS JOIN ctt
),
scored AS (
  SELECT doc_id, CAST(sum({_JM_LP}) AS BIGINT) AS logp_micro
  FROM joined GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY logp_micro DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, logp_micro
FROM scored
ORDER BY logp_micro DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_lm_jm_topk"] = (ft_lm_jm_topk, SQL_LM_JM)


# ------------------------------------------------------------- DFR PL2

# tfn: H2 length normalization with c = 1; avgdl = tdl/nd computed inside
# the shared string from exact BIGINT totals so both engines divide the
# same integers in the same order.
_PL2_TFN = "tf * log2(1.0e0 + (tdl * 1.0e0 / nd) / dl)"
# gain in micro-units; λ_t = cf/nd appears as (cf/nd) and its reciprocal
# as (nd/cf) inside log2. 2π as a literal (both engines parse e0 DOUBLE).
_PL2_GAIN = (
    "CAST(round(1000000.0e0 * ("
    "tfn * log2(tfn * nd / cf)"
    " + (1.0e0 * cf / nd - tfn) / ln(2.0e0)"
    " + 0.5e0 * log2(6.283185307179586e0 * tfn)"
    ") / (tfn + 1.0e0), 0) AS BIGINT)"
)


def ft_dfr_pl2_topk(spark, sf_dir):
    """(rank, doc_id, score_micro): top-10 docs by DFR PL2 over the
    flagship OR query — only matching (tf ≥ 1) documents are scored."""
    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    stats = docs.agg(F.count("*").cast("long").alias("nd")).crossJoin(
        toks.agg(F.count("*").cast("long").alias("tdl"))
    )
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    scored = (
        tf.join(F.broadcast(cf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("tfn", F.expr(_PL2_TFN))
        .withColumn("gain", F.expr(_PL2_GAIN))
        .groupBy("doc_id")
        .agg(F.sum("gain").cast("long").alias("score_micro"))
    )
    top = scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = W.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score_micro"
    )


SQL_DFR_PL2 = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS nd,
         (SELECT CAST(count(*) AS BIGINT) FROM toks) AS tdl
),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN {_TERMS_SQL} GROUP BY 1, 2
),
cfs AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tfs_ GROUP BY 1),
normed AS (
  SELECT t.doc_id, t.tf, c.cf, d.dl, s.nd, s.tdl, {_PL2_TFN} AS tfn
  FROM tfs_ t JOIN cfs c USING (term) JOIN dls d USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, CAST(sum({_PL2_GAIN}) AS BIGINT) AS score_micro
  FROM normed GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score_micro
FROM scored
ORDER BY score_micro DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_dfr_pl2_topk"] = (ft_dfr_pl2_topk, SQL_DFR_PL2)


# -------------------------------------- Sequential Dependence Model (SDM)

# Metzler & Croft 2005 weights; as integer centi-weights so the blended
# score Σ w·lp_micro is an exact int64 in centi-micro-nats.
SDM_W_T, SDM_W_O, SDM_W_U = 85, 10, 5
SDM_MU = 2000
SDM_WINDOW = 8
SDM_PAIRS = list(zip(BM25_TERMS, BM25_TERMS[1:]))  # adjacent query bigrams

_SDM_LP = (
    f"CAST(round(1000000.0e0 * ln((tf + {SDM_MU}.0e0 * cf / ct)"
    f" / (dl + {SDM_MU}.0e0)), 0) AS BIGINT)"
)


def ft_sdm_topk(spark, sf_dir):
    """(rank, doc_id, score_cm): top-10 docs under the sequential dependence
    model — 0.85·unigram + 0.10·ordered-bigram + 0.05·unordered-window-8
    Dirichlet log-likelihoods, in exact centi-micro-nats."""
    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    ct = toks.agg(F.count("*").cast("long").alias("ct"))
    qpos = toks.filter(F.col("term").isin(BM25_TERMS)).select(
        "doc_id", "term", "pos"
    )
    pairs = spark.createDataFrame(SDM_PAIRS, "ta string, tb string")

    tf_t = (
        qpos.groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .select(
            F.concat(F.lit("T:"), F.col("term")).alias("f"),
            F.lit(SDM_W_T).alias("w"),
            "doc_id",
            "tf",
        )
    )
    x, y = qpos.alias("x"), qpos.alias("y")
    paired = (
        F.broadcast(pairs)
        .join(x, F.col("x.term") == F.col("ta"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("x.doc_id"))
            & (F.col("y.term") == F.col("tb")),
        )
    )
    tf_o = (
        paired.filter(F.col("y.pos") == F.col("x.pos") + 1)
        .groupBy("ta", "tb", "x.doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .select(
            F.concat(F.lit("O:"), F.col("ta"), F.lit(" "), F.col("tb")).alias("f"),
            F.lit(SDM_W_O).alias("w"),
            "doc_id",
            "tf",
        )
    )
    tf_u = (
        paired.filter(
            F.abs(F.col("x.pos") - F.col("y.pos")) < F.lit(SDM_WINDOW)
        )
        .groupBy("ta", "tb", "x.doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .select(
            F.concat(F.lit("U:"), F.col("ta"), F.lit(" "), F.col("tb")).alias("f"),
            F.lit(SDM_W_U).alias("w"),
            "doc_id",
            "tf",
        )
    )
    utfs = tf_t.unionByName(tf_o).unionByName(tf_u)
    feats = utfs.groupBy("f", "w").agg(F.sum("tf").cast("long").alias("cf"))
    scored = (
        docs.crossJoin(F.broadcast(feats))
        .join(utfs.select("f", "doc_id", "tf"), ["f", "doc_id"], "left")
        .join(dl, "doc_id", "left")
        .crossJoin(F.broadcast(ct))
        .fillna(0, ["tf", "dl"])
        .withColumn("lp", F.expr(_SDM_LP))
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("lp")).cast("long").alias("score_cm"))
    )
    top = scored.orderBy(
        F.col("score_cm").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = W.orderBy(F.col("score_cm").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score_cm"
    )


_SDM_PAIRS_SQL = ", ".join(f"('{a}', '{b}')" for a, b in SDM_PAIRS)

SQL_SDM = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
qpos AS (SELECT doc_id, term, pos FROM toks WHERE term IN {_TERMS_SQL}),
pairs(ta, tb) AS (VALUES {_SDM_PAIRS_SQL}),
tf_t AS (
  SELECT 'T:' || term AS f, {SDM_W_T} AS w, doc_id,
         CAST(count(*) AS BIGINT) AS tf
  FROM qpos GROUP BY 1, 2, 3
),
tf_o AS (
  SELECT 'O:' || p.ta || ' ' || p.tb AS f, {SDM_W_O} AS w, x.doc_id,
         CAST(count(*) AS BIGINT) AS tf
  FROM pairs p
  JOIN qpos x ON x.term = p.ta
  JOIN qpos y ON y.doc_id = x.doc_id AND y.term = p.tb
             AND y.pos = x.pos + 1
  GROUP BY 1, 2, 3
),
tf_u AS (
  SELECT 'U:' || p.ta || ' ' || p.tb AS f, {SDM_W_U} AS w, x.doc_id,
         CAST(count(*) AS BIGINT) AS tf
  FROM pairs p
  JOIN qpos x ON x.term = p.ta
  JOIN qpos y ON y.doc_id = x.doc_id AND y.term = p.tb
             AND abs(x.pos - y.pos) < {SDM_WINDOW}
  GROUP BY 1, 2, 3
),
utfs AS (
  SELECT * FROM tf_t UNION ALL SELECT * FROM tf_o UNION ALL SELECT * FROM tf_u
),
feats AS (SELECT f, w, CAST(sum(tf) AS BIGINT) AS cf FROM utfs GROUP BY 1, 2),
joined AS (
  SELECT d.doc_id AS doc_id, fe.w AS w, coalesce(u.tf, 0) AS tf,
         coalesce(dls.dl, 0) AS dl, fe.cf AS cf, ctt.ct AS ct
  FROM (SELECT doc_id FROM documents) d
  CROSS JOIN feats fe
  LEFT JOIN (SELECT f, doc_id, tf FROM utfs) u
         ON u.f = fe.f AND u.doc_id = d.doc_id
  LEFT JOIN dls ON dls.doc_id = d.doc_id
  CROSS JOIN ctt
),
scored AS (
  SELECT doc_id, CAST(sum(w * {_SDM_LP}) AS BIGINT) AS score_cm
  FROM joined GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score_cm DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score_cm
FROM scored
ORDER BY score_cm DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_sdm_topk"] = (ft_sdm_topk, SQL_SDM)


# ------------------------------------------- DFI (divergence from independence)

# Lucene's fourth pluggable similarity family (DFISimilarity, chi-squared
# independence measure; Kocabaş/Dinçer/Karaoğlan, IRJ 2014) — the last one
# missing after BM25 / LM-Dirichlet / LM-JM / DFR PL2. Under independence
# a term's expected frequency in a doc is dl·cf/tdl; only tf ABOVE
# expectation contributes (Lucene clamps at 0), and the gate is the exact
# integer cross-multiplication tf·tdl > cf·dl so no float boundary ever
# decides inclusion. The measure is chi² = (tf−ex)²/ex and the per-term
# gain log2(chi² + 1) in integer micro-units via ONE shared string.
#
# Scale shape: identical to PL2 — only matching (tf ≥ 1) docs are scored,
# the spine is the (term, doc) tf agg, every dim (cf, dl totals) broadcast.
# ex is recomputed inline from the same three BIGINTs in both engines
# ((1.0e0·cf)·dl/tdl — double products exact below 2^53, identical IEEE).

_DFI_EX = "(1.0e0 * cf * dl / tdl)"
_DFI_GAIN = (
    "CASE WHEN tf * tdl <= cf * dl THEN CAST(0 AS BIGINT) "
    "ELSE CAST(round(1000000.0e0 * log2("
    f"(tf - {_DFI_EX}) * (tf - {_DFI_EX}) / {_DFI_EX} + 1.0e0"
    "), 0) AS BIGINT) END"
)


def ft_dfi_topk(spark, sf_dir):
    """(rank, doc_id, score_micro): top-10 docs by Lucene DFI (chi-squared)
    similarity over the flagship OR query — only docs whose tf exceeds the
    independence expectation contribute (integer-gated).

    Reference parity: OpenSearch exposes this as ``similarity: {type: DFI,
    independence_measure: chisquared}`` per field; the reference's index
    bodies (/root/reference/harvester/search/models/index.py) keep the BM25
    default, so this is the A/B alternative a ranking engineer would test.
    """
    toks = doc_tokens(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    tdl = toks.agg(F.count("*").cast("long").alias("tdl"))
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    cf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
    )
    scored = (
        tf.join(F.broadcast(cf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(tdl))
        .withColumn("gain", F.expr(_DFI_GAIN))
        .groupBy("doc_id")
        .agg(F.sum("gain").cast("long").alias("score_micro"))
    )
    top = scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = W.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score_micro"
    )


SQL_DFI = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
tdls AS (SELECT CAST(count(*) AS BIGINT) AS tdl FROM toks),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN {_TERMS_SQL} GROUP BY 1, 2
),
cfs AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tfs_ GROUP BY 1),
scored AS (
  SELECT doc_id, CAST(sum({_DFI_GAIN}) AS BIGINT) AS score_micro
  FROM (
    SELECT t.doc_id, t.tf, c.cf, d.dl, s.tdl
    FROM tfs_ t JOIN cfs c USING (term) JOIN dls d USING (doc_id)
    CROSS JOIN tdls s
  ) GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score_micro
FROM scored
ORDER BY score_micro DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_dfi_topk"] = (ft_dfi_topk, SQL_DFI)


# ------------------------------------------- IB (information-based, LL)

# Lucene's FIFTH pluggable similarity family (IBSimilarity; Clinchant &
# Gaussier, SIGIR 2010) — with DFI above this completes the whole zoo
# (BM25 / LM-Dirichlet / LM-JM / DFR-PL2 / DFI / IB). Configuration is
# Lucene's common preset: distribution LL (log-logistic), lambda DF
# (λ_t = (df+1)/(N+1)), normalization H2 with c = 1 (the same tfn string
# PL2 uses — literally _PL2_TFN, so the two families share one
# normalization seam). DistributionLL scores −ln(λ/(tfn+λ)) =
# ln(1 + tfn/λ); with λ rational the gain is
#   ln(1 + tfn·(N+1)/(df+1))
# computed left-associative in ONE shared string (double × BIGINT
# promotes identically in both engines; N+1 and df+1 are exact in
# double far below 2^53).
#
# Scale shape: identical to PL2/DFI — only matching (tf ≥ 1) docs score,
# spine = the (term, doc) tf agg; df is a ≤3-row broadcast dim derived
# from the SAME tf spine (df = #rows per term), nd/tdl a 1-row broadcast.

_IB_GAIN = (
    "CAST(round(1000000.0e0 * ln("
    "1.0e0 + tfn * (nd + 1) / (1.0e0 * (df + 1))"
    "), 0) AS BIGINT)"
)


def ft_ib_ll_topk(spark, sf_dir):
    """(rank, doc_id, score_micro): top-10 docs by Lucene IB similarity
    (log-logistic distribution, DF lambda, H2 normalization, c = 1) over
    the flagship OR query — only matching documents are scored.

    Reference parity: OpenSearch exposes this as ``similarity: {type: IB,
    distribution: ll, lambda: df, normalization: h2}`` per field; the
    reference keeps the BM25 default
    (/root/reference/harvester/search/models/index.py), so this is the
    last A/B alternative in the similarity zoo.
    """
    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    stats = docs.agg(F.count("*").cast("long").alias("nd")).crossJoin(
        toks.agg(F.count("*").cast("long").alias("tdl"))
    )
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_dim = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df_dim), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("tfn", F.expr(_PL2_TFN))
        .withColumn("gain", F.expr(_IB_GAIN))
        .groupBy("doc_id")
        .agg(F.sum("gain").cast("long").alias("score_micro"))
    )
    top = scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = W.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score_micro"
    )


SQL_IB_LL = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS nd,
         (SELECT CAST(count(*) AS BIGINT) FROM toks) AS tdl
),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN {_TERMS_SQL} GROUP BY 1, 2
),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfs_ GROUP BY 1),
normed AS (
  SELECT t.doc_id, t.tf, f.df, d.dl, s.nd, s.tdl, {_PL2_TFN} AS tfn
  FROM tfs_ t JOIN dfs f USING (term) JOIN dls d USING (doc_id)
  CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, CAST(sum({_IB_GAIN}) AS BIGINT) AS score_micro
  FROM normed GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score_micro
FROM scored
ORDER BY score_micro DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_ib_ll_topk"] = (ft_ib_ll_topk, SQL_IB_LL)


# --------------------------------------- SMART lnc.ltc vector-space cosine

# The pre-probabilistic classic (Salton & Buckley 1988; SMART notation
# lnc.ltc): doc weights 1+ln(tf) cosine-normalized over the WHOLE document
# vector, query weights (1+ln(qtf))·ln(N/df) with qtf = 1. Lucene shipped
# exactly this as ClassicSimilarity/TFIDFSimilarity before BM25 became the
# default — the sixth and last similarity family after BM25 / LM-Dirichlet /
# LM-JM / DFR-PL2 / DFI / IB (the reference keeps OpenSearch's BM25 default,
# /root/reference/harvester/search/models/index.py, so like the others this
# is the A/B alternative).
#
# Determinism: per-(doc, term) weights are integer micro-units via ONE
# shared string (_LNC_W); the doc norm is Σ dwm² — an EXACT int64 sum, so
# the engine-dependent float-sum-order problem never arises (a double
# Σ(1+ln tf)² would differ in ulps between engines). The final score
# divides two deterministic doubles (int64→double conversion and IEEE
# sqrt/division are bit-identical in both engines) and floors at +0.5 in
# micro-weight units. Overflow: dwm ≤ round(1e6·(1+ln tf)) ≈ 8e6 at
# tf ≈ 1e3, so dwm² ≤ 6.4e13 and a 10^4-distinct-term doc stays < 2^63.
#
# Scale shape: the norm is one (doc_id, term) tf agg + one doc_id agg over
# the SAME exploded-tokens scan the dl agg already pays; the dot is the
# PL2 shape (only matching docs score; df/N broadcast dims). At 100 TB the
# norm table is a per-doc scalar materialized once per snapshot next to dl.

_LNC_W = "CAST(round(1000000.0e0 * (1.0e0 + ln(tf)), 0) AS BIGINT)"
_LTC_W = "CAST(round(1000000.0e0 * ln(1.0e0 * nd / df), 0) AS BIGINT)"
_COS_SCORE = "CAST(floor(1.0e0 * dot / sqrt(1.0e0 * n2) + 0.5e0) AS BIGINT)"


def ft_tfidf_lnc_ltc_topk(spark, sf_dir):
    """(rank, doc_id, score_micro): top-10 docs by SMART lnc.ltc cosine
    (Lucene ClassicSimilarity's family) over the flagship OR query —
    doc-side 1+ln(tf) weights cosine-normalized over the full doc vector,
    query-side ln(N/df) idf; integer micro-weight units end to end."""
    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    tf_all = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    norms = (
        tf_all.withColumn("dwm", F.expr(_LNC_W))
        .groupBy("doc_id")
        .agg(F.sum(F.col("dwm") * F.col("dwm")).cast("long").alias("n2"))
    )
    nd = docs.agg(F.count("*").cast("long").alias("nd"))
    tf = tf_all.filter(F.col("term").isin(BM25_TERMS))
    df_dim = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    dots = (
        tf.join(F.broadcast(df_dim), "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("dwm", F.expr(_LNC_W))
        .withColumn("qwm", F.expr(_LTC_W))
        .groupBy("doc_id")
        .agg(F.sum(F.col("qwm") * F.col("dwm")).cast("long").alias("dot"))
    )
    scored = dots.join(norms, "doc_id").withColumn(
        "score_micro", F.expr(_COS_SCORE)
    )
    top = scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = W.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score_micro"
    )


SQL_TFIDF_LNC_LTC = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf_all AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
),
norms AS (
  SELECT doc_id, CAST(sum(dwm * dwm) AS BIGINT) AS n2
  FROM (SELECT doc_id, {_LNC_W} AS dwm FROM tf_all)
  GROUP BY doc_id
),
nds AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
tfs_ AS (SELECT * FROM tf_all WHERE term IN {_TERMS_SQL}),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfs_ GROUP BY 1),
dots AS (
  SELECT doc_id, CAST(sum(qwm * dwm) AS BIGINT) AS dot
  FROM (
    SELECT t.doc_id, {_LNC_W} AS dwm, {_LTC_W} AS qwm
    FROM tfs_ t JOIN dfs f USING (term) CROSS JOIN nds
  ) GROUP BY doc_id
),
scored AS (
  SELECT doc_id, {_COS_SCORE} AS score_micro
  FROM dots JOIN norms USING (doc_id)
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score_micro
FROM scored
ORDER BY score_micro DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_tfidf_lnc_ltc_topk"] = (ft_tfidf_lnc_ltc_topk, SQL_TFIDF_LNC_LTC)


# ------------------------------------------------------------------ BM25+

# Lv & Zhai (CIKM 2011, "Lower-Bounding Term Frequency Normalization"):
# long documents can score BELOW the tf = 0 baseline under plain BM25, so
# BM25+ adds δ = 1 to the saturated-tf component, guaranteeing every match
# beats every non-match regardless of dl. Same k1 = 1.2 / b = 0.75 /
# Lucene idf as the repo-wide kernel (search/bm25.py) — deliberately a
# SEPARATE formula registered under its own name (the "never introduce a
# second BM25" invariant protects the serving kernel; this is an A/B
# ranking operator, never wired into the engine).
#
# The δ term makes multi-term matches outrank tf-heavy single-term matches
# (each matched term contributes ≥ idf·δ) — the family-distinct ordering
# the pytest pins. Floats follow the ft_bm25_topk contract exactly:
# contribs summed over ≤ 3 terms, round(., 6) vs ulp noise.

BM25PLUS_DELTA = 1.0


def ft_bm25plus_topk(spark, sf_dir):
    """(rank, doc_id, score): top-10 docs by BM25+ (k1=1.2, b=0.75, δ=1,
    Lucene idf) over the flagship OR query — the lower-bounded tf
    normalization of Lv & Zhai 2011."""
    toks = doc_tokens(spark, sf_dir)
    docs_n = load(spark, sf_dir, "documents")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = docs_n.select(F.count("*").alias("n")).crossJoin(
        dl.select((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (
                (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
                + BM25PLUS_DELTA
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


SQL_BM25PLUS = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
tfs_ AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN {_TERMS_SQL} GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM tfs_ GROUP BY 1),
scored AS (
  SELECT doc_id,
         round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * ((tf * 2.2e0)
              / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
              + {BM25PLUS_DELTA}e0)
         ), 6) AS score
  FROM tfs_ t JOIN dfs f USING (term) JOIN dls d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score
FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_bm25plus_topk"] = (ft_bm25plus_topk, SQL_BM25PLUS)
