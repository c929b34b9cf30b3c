"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label).

Brute-force cosine top-k is the correctness baseline; the scale path is
sign-random-projection LSH bucketing (candidate generation inside a bucket +
exact re-rank), whose shuffle key is the uniform bucket id — at 10^9+ vectors
the brute-force quadratic join is replaced by the bucket join while the
re-rank stays identical.

Cross-engine determinism: float32 elements are cast to float64 before any
arithmetic (exact), per-row products are bit-identical, only SUM order
differs between engines → every summed score is ``round(.,6)``-ed and used
with a total tie-break ordering. The projection "planes" are hash-derived
integers (md5-based), identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.operators.common import load

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5
N_PLANES = 6


def _components(spark, sf_dir):
    """(vec_id, pos, val:double) position-wise exploded embeddings."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    )


_SQL_COMPONENTS = """
  SELECT vec_id,
         unnest(range(len(embedding))) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
"""


def _pairwise_cosine(spark, sf_dir):
    """(qid, vec_id, cos) for query vectors vs all others — brute force."""
    comp = _components(spark, sf_dir).cache()
    norms = comp.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm"))
    q = comp.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "pos", F.col("val").alias("qval")
    )
    dots = (
        q.join(comp, "pos")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("qval") * F.col("val")).alias("dot"))
    )
    qn = norms.select(F.col("vec_id").alias("qid"), F.col("nrm").alias("qnrm"))
    return (
        dots.join(F.broadcast(qn), "qid")
        .join(F.broadcast(norms), "vec_id")
        .withColumn("cos", F.round(F.col("dot") / (F.col("qnrm") * F.col("nrm")), 6))
        .select("qid", "vec_id", "cos")
    )


_SQL_PAIRWISE = f"""
comp AS ({_SQL_COMPONENTS}),
norms AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM comp GROUP BY vec_id),
dots AS (
  SELECT q.vec_id AS qid, c.vec_id, sum(q.val * c.val) AS dot
  FROM comp q JOIN comp c ON q.pos = c.pos AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY 1, 2
),
cosine AS (
  SELECT qid, d.vec_id,
         round(dot / (qn.nrm * cn.nrm), 6) AS cos
  FROM dots d
  JOIN norms qn ON qn.vec_id = d.qid
  JOIN norms cn ON cn.vec_id = d.vec_id
)
"""


def _cosine_for_pairs(spark, sf_dir, pairs):
    """Exact rounded cosine computed ONLY for the given (qid, vec_id)
    candidate pairs — the expensive dot-product job is restricted to the
    candidates the pruning structure (bucket / centroid list) produced, so
    at 10^9 vectors the cost is O(|candidates|·dim), not O(n·dim) per query.
    The query side is tiny (N_QUERIES) → broadcast both its components and
    the norms."""
    comp = _components(spark, sf_dir)
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    q = comp.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "pos", F.col("val").alias("qval")
    )
    qn = norms.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("nrm").alias("qnrm")
    )
    dots = (
        pairs.join(comp, "vec_id")            # candidate components only
        .join(F.broadcast(q), ["qid", "pos"])  # tiny query side
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("qval") * F.col("val")).alias("dot"))
    )
    return (
        dots.join(F.broadcast(qn), "qid")
        # candidate-side norms join is left to AQE: broadcast when small,
        # shuffle-on-vec_id (already the dots partitioning) at scale
        .join(norms, "vec_id")
        .withColumn("cos", F.round(F.col("dot") / (F.col("qnrm") * F.col("nrm")), 6))
        .select("qid", "vec_id", "cos")
    )


def ann_cosine_topk(spark, sf_dir):
    """Exact cosine top-{TOP_K} neighbors for each query vector."""
    cos = _pairwise_cosine(spark, sf_dir)
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cos.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "rnk", "vec_id", "cos")
    )


SQL_ANN_COSINE_TOPK = f"""
WITH {_SQL_PAIRWISE}
SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS INT) AS rnk,
       vec_id, cos
FROM cosine QUALIFY rnk <= {TOP_K}
"""


def knn_label_predict(spark, sf_dir):
    """k-NN majority-label classification of the query vectors (tie → min
    label) — the join + window + agg composition over the ANN result."""
    topk = ann_cosine_topk(spark, sf_dir)
    labels = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    votes = (
        topk.join(F.broadcast(labels), "vec_id")
        .groupBy("qid", "label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = W.partitionBy("qid").orderBy(F.col("n_votes").desc(), F.col("label").asc())
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("qid", F.col("label").alias("pred_label"), "n_votes")
    )


SQL_KNN_LABEL_PREDICT = f"""
WITH {_SQL_PAIRWISE},
topk AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM cosine QUALIFY rnk <= {TOP_K}
),
votes AS (
  SELECT t.qid, e.label, count(*) AS n_votes
  FROM topk t JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
)
SELECT qid, label AS pred_label, n_votes
FROM votes
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY n_votes DESC, label ASC) = 1
"""


def emb_label_centroids(spark, sf_dir):
    """Per-label centroid components (pos-wise mean, rounded)."""
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    )
    return comp.groupBy("label", "pos").agg(F.round(F.avg("val"), 6).alias("centroid_val"))


SQL_EMB_LABEL_CENTROIDS = """
WITH comp AS (
  SELECT label,
         unnest(range(len(embedding))) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
)
SELECT label, pos, round(avg(val), 6) AS centroid_val FROM comp GROUP BY label, pos
"""


def _hash_plane_component():
    """Deterministic pseudo-random plane weight in [-1000, 1000]: from the
    56-bit md5 int of 'p:pos' — identical integers across engines."""
    return None  # documentation anchor; inlined below


def _buckets(spark, sf_dir):
    """vec_id → {N_PLANES}-bit sign-random-projection bucket (deterministic
    hash-derived hyperplanes — identical integers across engines)."""
    comp = _components(spark, sf_dir).cache()
    return (
        comp.select("vec_id", "pos", "val")
        .crossJoin(
            F.broadcast(
                comp.sparkSession.range(N_PLANES).select(F.col("id").cast("int").alias("plane"))
            )
        )
        .withColumn(
            "w",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("plane"), F.col("pos"))), 1, 14
                    ),
                    16,
                    10,
                ).cast("long")
                % 2001
                - 1000
            ).cast("double"),
        )
        .groupBy("vec_id", "plane")
        .agg(F.round(F.sum(F.col("val") * F.col("w")), 6).alias("proj"))
        .withColumn("bit", F.when(F.col("proj") > 0, F.expr("shiftleft(1, plane)")).otherwise(0))
        .groupBy("vec_id")
        .agg(F.sum("bit").cast("long").alias("bucket"))
    )


def ann_lsh_bucketed(spark, sf_dir):
    """Sign-random-projection LSH: {N_PLANES}-bit bucket per vector from
    hash-derived hyperplanes; query results = exact cosine re-rank restricted
    to the query's bucket. The O(n²)→O(n·bucket) scale path."""
    planes = _buckets(spark, sf_dir)
    # PRUNE FIRST: candidates come from the bucket equi-join (shuffle key =
    # bucket id); cosine is then computed ONLY inside the bucket. The full
    # pairwise job never runs — the point of the LSH scale path.
    qb = planes.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("bucket").alias("qbucket")
    )
    cand_pairs = (
        planes.join(F.broadcast(qb), planes.bucket == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "bucket")
    )
    cand = _cosine_for_pairs(spark, sf_dir, cand_pairs.select("qid", "vec_id")).join(
        cand_pairs, ["qid", "vec_id"]
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "rnk", "vec_id", "cos", "bucket")
    )


# planes/buckets CTE fragment (expects a `comp` CTE in scope) — shared by
# the ANN operator and the embedding near-dup scale path in dedup.py
SQL_PLANES_BUCKETS = f"""
planes AS (
  SELECT c.vec_id, p.plane,
         round(sum(c.val * CAST(
           (CAST(('0x' || substr(md5(p.plane || ':' || c.pos), 1, 14)) AS BIGINT) % 2001 - 1000)
           AS DOUBLE)), 6) AS proj
  FROM comp c CROSS JOIN (SELECT unnest(range({N_PLANES})) AS plane) p
  GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN proj > 0 THEN 1 << plane ELSE 0 END) AS BIGINT) AS bucket
  FROM planes GROUP BY vec_id
)"""

SQL_ANN_LSH_BUCKETED = f"""
WITH {_SQL_PAIRWISE},
{SQL_PLANES_BUCKETS},
cand AS (
  SELECT c.qid, c.vec_id, c.cos, vb.bucket
  FROM cosine c
  JOIN buckets qb ON qb.vec_id = c.qid
  JOIN buckets vb ON vb.vec_id = c.vec_id
  WHERE vb.bucket = qb.bucket
)
SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS INT) AS rnk,
       vec_id, cos, bucket
FROM cand QUALIFY rnk <= {TOP_K}
"""


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "knn_label_predict": (knn_label_predict, SQL_KNN_LABEL_PREDICT),
    "emb_label_centroids": (emb_label_centroids, SQL_EMB_LABEL_CENTROIDS),
    "ann_lsh_bucketed": (ann_lsh_bucketed, SQL_ANN_LSH_BUCKETED),
}


# ------------------------------------------------------------------ IVF ANN

# IVF scale path: coarse quantizer = per-label centroids (deterministic,
# cross-engine identical after rounding), inverted lists = vectors assigned
# to their nearest centroid, queries probe n_probe=1 list and re-rank
# exactly inside it. At 10^9+ vectors the centroid set comes from k-means
# and each list is a partition — the probe join replaces the O(n²) scan.

_SQL_CENTROIDS = """
  SELECT label AS cent_id, pos, round(avg(val), 6) AS cval
  FROM (
    SELECT label,
           unnest(range(len(embedding))) AS pos,
           unnest(CAST(embedding AS DOUBLE[])) AS val
    FROM embeddings
  ) GROUP BY label, pos
"""


def _centroids(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        F.col("label").alias("cent_id"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    return comp.groupBy("cent_id", "pos").agg(F.round(F.avg("val"), 6).alias("cval"))


def _assignments(spark, sf_dir):
    """vec_id → nearest centroid (by rounded cosine, tie cent_id asc)."""
    comp = _components(spark, sf_dir)
    cent = _centroids(spark, sf_dir)
    dots = (
        comp.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cent_id")
        .agg(
            F.sum(F.col("val") * F.col("cval")).alias("dot"),
            F.sum(F.col("val") * F.col("val")).alias("v2"),
            F.sum(F.col("cval") * F.col("cval")).alias("c2"),
        )
        .withColumn("sim", F.round(F.col("dot") / F.sqrt(F.col("v2") * F.col("c2")), 6))
    )
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cent_id").asc())
    return (
        dots.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "cent_id")
    )


_SQL_ASSIGNMENTS = f"""
  SELECT vec_id, cent_id FROM (
    SELECT d.vec_id, d.cent_id,
           row_number() OVER (
             PARTITION BY d.vec_id
             ORDER BY round(d.dot / sqrt(d.v2 * d.c2), 6) DESC, d.cent_id ASC
           ) AS rnk
    FROM (
      SELECT c.vec_id, ct.cent_id,
             sum(c.val * ct.cval) AS dot,
             sum(c.val * c.val) AS v2,
             sum(ct.cval * ct.cval) AS c2
      FROM ({_SQL_COMPONENTS}) c
      JOIN ({_SQL_CENTROIDS}) ct USING (pos)
      GROUP BY c.vec_id, ct.cent_id
    ) d
  ) WHERE rnk = 1
"""


def ann_ivf_topk(spark, sf_dir):
    """IVF ANN: probe the query's own centroid list, exact cosine re-rank
    within it (n_probe=1) — top-{TOP_K} per query vector."""
    # PRUNE FIRST: probe membership via the centroid-list equi-join, then
    # compute cosine only for vectors in the probed list(s) — the full
    # pairwise job never runs.
    assign = _assignments(spark, sf_dir).cache()
    qa = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("cent_id").alias("q_cent")
    )
    cand_pairs = (
        assign.join(F.broadcast(qa), assign.cent_id == F.col("q_cent"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "q_cent")
    )
    probed = _cosine_for_pairs(spark, sf_dir, cand_pairs.select("qid", "vec_id")).join(
        cand_pairs, ["qid", "vec_id"]
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        probed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "rnk", "vec_id", "cos", F.col("q_cent").alias("cent_id"))
    )


SQL_ANN_IVF_TOPK = f"""
WITH {_SQL_PAIRWISE},
assign AS ({_SQL_ASSIGNMENTS}),
probed AS (
  SELECT c.qid, c.vec_id, c.cos, qa.cent_id
  FROM cosine c
  JOIN assign qa ON qa.vec_id = c.qid
  JOIN assign va ON va.vec_id = c.vec_id
  WHERE va.cent_id = qa.cent_id
)
SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS INT) AS rnk,
       vec_id, cos, cent_id
FROM probed QUALIFY rnk <= {TOP_K}
"""

QUERIES["ann_ivf_topk"] = (ann_ivf_topk, SQL_ANN_IVF_TOPK)


# ------------------------------------------------------------------ k-means

# The IVF coarse quantizer above seeds its lists from labels; at 10^9+
# vectors the centroid set comes from k-means (the note on _SQL_CENTROIDS).
# This is that trainer: Lloyd's algorithm made cross-engine hash-exact by
# running ENTIRELY in integer arithmetic — components scaled to integers
# (round(val·10^6), the cents() convention), squared-euclidean distances as
# integer sums (64·(2·3.2e5)^2 ≈ 2.6e13 ≪ int64), centroid updates as
# floor(sum/count) — exact while per-(centroid,pos) component sums stay
# below 2^53 (10^9 members × 3.2e5 scale ≈ 3.2e14 ≪ 9·10^15 ✓), because a
# correctly-rounded double quotient of such integers can only cross an
# integer boundary when the true quotient IS that integer. Ties: dist asc,
# cent_id asc. Seeds: the K lowest vec_ids. Empty clusters drop (both
# engines identically). Scale shape: centroids are K·dim integers —
# ALWAYS broadcast / driver-bounded (the MLlib contract); per iteration one
# exchange for the (vec_id, cent_id) distance agg and one for the argmin
# window — bounded iteration count, no quadratic stage, comp cached once.

K_CLUSTERS = 8
KMEANS_ITERS = 3
_KM_SCALE = 1_000_000


def _comp_int(spark, sf_dir):
    """(vec_id, pos, ival) integer-scaled components."""
    return _components(spark, sf_dir).select(
        "vec_id", "pos",
        F.round(F.col("val") * _KM_SCALE).cast("long").alias("ival"),
    )


def _km_assign(comp, cent):
    """argmin_c Σ_pos (ival-cval)² with (dist, cent_id) tie-break."""
    dists = (
        comp.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cent_id")
        .agg(
            F.sum(
                (F.col("ival") - F.col("cval")) * (F.col("ival") - F.col("cval"))
            ).alias("dist")
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("cent_id").asc())
    return (
        dists.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "cent_id", "dist")
    )


def emb_kmeans_assign(spark, sf_dir):
    """K-means (K={K_CLUSTERS}, {KMEANS_ITERS} Lloyd iterations) over the
    embeddings: final (vec_id, cent_id, dist) assignment under the trained
    centroids — the IVF centroid trainer. Integer-exact (see block comment),
    full value-hash oracle despite the iterative plan."""
    spark_ = spark
    comp = _comp_int(spark, sf_dir).cache()
    cent_rows = [
        (int(r["vec_id"]), int(r["pos"]), int(r["ival"]))
        for r in comp.filter(F.col("vec_id") < K_CLUSTERS).collect()
    ]
    for _ in range(KMEANS_ITERS):
        cent = spark_.createDataFrame(
            cent_rows, "cent_id long, pos int, cval long"
        )
        assign = _km_assign(comp, cent)
        cent_rows = [
            (int(r["cent_id"]), int(r["pos"]), int(r["cval"]))
            for r in (
                comp.join(assign.select("vec_id", "cent_id"), "vec_id")
                .groupBy("cent_id", "pos")
                .agg(
                    F.floor(F.sum("ival") / F.count("*")).cast("long").alias("cval")
                )
                .collect()
            )
        ]
    cent = spark_.createDataFrame(cent_rows, "cent_id long, pos int, cval long")
    return _km_assign(comp, cent)


def _sql_km_assign(cent_cte: str) -> str:
    return f"""
  SELECT vec_id, cent_id, dist FROM (
    SELECT d.vec_id, d.cent_id, d.dist,
           row_number() OVER (
             PARTITION BY d.vec_id ORDER BY d.dist ASC, d.cent_id ASC
           ) AS rnk
    FROM (
      SELECT c.vec_id, ct.cent_id,
             CAST(sum((c.ival - ct.cval) * (c.ival - ct.cval)) AS BIGINT) AS dist
      FROM comp c JOIN {cent_cte} ct USING (pos)
      GROUP BY c.vec_id, ct.cent_id
    ) d
  ) WHERE rnk = 1"""


def _sql_km_update(assign_cte: str) -> str:
    return f"""
  SELECT a.cent_id, c.pos,
         CAST(floor(CAST(sum(c.ival) AS DOUBLE) / count(*)) AS BIGINT) AS cval
  FROM {assign_cte} a JOIN comp c USING (vec_id)
  GROUP BY a.cent_id, c.pos"""


SQL_EMB_KMEANS_ASSIGN = f"""
WITH comp AS (
  SELECT vec_id, pos, CAST(round(val * {_KM_SCALE}) AS BIGINT) AS ival
  FROM ({_SQL_COMPONENTS})
),
c0 AS (
  SELECT vec_id AS cent_id, pos, ival AS cval FROM comp WHERE vec_id < {K_CLUSTERS}
),
a1 AS ({_sql_km_assign('c0')}),
c1 AS ({_sql_km_update('a1')}),
a2 AS ({_sql_km_assign('c1')}),
c2 AS ({_sql_km_update('a2')}),
a3 AS ({_sql_km_assign('c2')}),
c3 AS ({_sql_km_update('a3')})
{_sql_km_assign('c3')}
"""

QUERIES["emb_kmeans_assign"] = (emb_kmeans_assign, SQL_EMB_KMEANS_ASSIGN)
