"""Deduplication operators over ``documents`` — exact, shingle-Jaccard,
MinHash+LSH, SimHash.

First-class training-data-pipeline components (driver brief): each is a
(Spark, DuckDB-oracle) pair with fully integer/hash-deterministic outputs so
value hashes match across engines. Hash function: top-56-bits of md5
interpreted as int (verified identical in Spark ``conv`` and DuckDB hex-cast).

Scale notes (100 TB): exact dedup is a hash groupBy (shuffle on digest —
uniform by construction). Shingle-Jaccard is quadratic-in-collision-group and
is therefore restricted to a candidate subset here; the scale path is
MinHash banding (LSH), where the shuffle key is the (band, band-signature)
bucket — uniformly distributed, skew-free, and each bucket's pair expansion
is bounded by bucket size.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.analysis import tokens_column
from harvester_spark.operators.common import SQL_DOC_TOKS, SQL_TOKS, doc_tokens, load

N_MINHASH = 6
N_BANDS = 3  # rows-per-band = 2
SHINGLE_K = 4
JACCARD_SUBSET = 200  # doc_id bound for the quadratic shingle-Jaccard entry
JACCARD_MIN = 0.20


def _hash56(col):
    """56-bit integer hash of a string column (identical across engines)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


_SQL_HASH56 = "CAST(('0x' || substr(md5({col}), 1, 14)) AS BIGINT)"


# ---------------------------------------------------------------- exact dedup


def dedup_exact(spark, sf_dir):
    """Exact dedup on the normalized-text digest: canonical doc (min doc_id)
    + group size. The srn/content-hash upsert analogue
    (/root/reference/harvester/core/models/datatypes/document.py:133-139)."""
    docs = load(spark, sf_dir, "documents")
    digest = F.md5(F.concat_ws(" ", tokens_column(F.col("text"))))
    return (
        docs.select(digest.alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_dupes"))
    )


SQL_DEDUP_EXACT = f"""
SELECT md5(array_to_string({SQL_TOKS.format(col='text')}, ' ')) AS digest,
       min(doc_id) AS canonical_doc_id, count(*) AS n_dupes
FROM documents GROUP BY 1
"""

# ---------------------------------------------------------------- shingles


def _shingles(spark, sf_dir, max_doc: int | None = JACCARD_SUBSET):
    """(doc_id, shingle) distinct word-{SHINGLE_K}-grams via lead window.
    ``max_doc=None`` → corpus-wide (the scale-path consumers)."""
    toks = doc_tokens(spark, sf_dir)
    if max_doc is not None:
        toks = toks.filter(F.col("doc_id") < max_doc)
    w = W.partitionBy("doc_id").orderBy("pos")
    sh = F.concat_ws(
        " ",
        F.col("term"),
        *[F.lead("term", i).over(w) for i in range(1, SHINGLE_K)],
    )
    # shingle and the null-guard MUST be computed in the same projection —
    # window leads evaluated after a filter would see the truncated rows.
    return (
        toks.select(
            "doc_id",
            sh.alias("shingle"),
            F.lead("term", SHINGLE_K - 1).over(w).alias("lead_last"),
        )
        .filter(F.col("lead_last").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )


_SQL_SHINGLES = f"""
  SELECT DISTINCT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
              || ' ' || lead(term, 3) OVER w AS shingle
  FROM ({SQL_DOC_TOKS}) WHERE doc_id < {JACCARD_SUBSET}
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(term, 3) OVER w IS NOT NULL
"""


def dedup_shingle_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup pairs over a bounded candidate subset:
    pairs sharing ≥1 shingle, J = |∩| / |∪| ≥ {JACCARD_MIN} (exact int
    division — identical doubles across engines)."""
    sh = _shingles(spark, sf_dir).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= JACCARD_MIN)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


SQL_SHINGLE_JACCARD = f"""
WITH sh AS ({_SQL_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_MIN}
"""

# ---------------------------------------------------------------- MinHash


def dedup_minhash_signatures(spark, sf_dir):
    """Per-doc MinHash signature: h_i = min over word-2-shingles of
    hash56(i || ':' || shingle), i ∈ [0, {N_MINHASH}) — wide layout h0..h5."""
    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    sh = (
        toks.withColumn("nxt", F.lead("term").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "term", "nxt").alias("shingle"))
        .distinct()
    )
    # one aggregation computes all signature slots (no explode, no pivot —
    # map-side partial min per slot, a single shuffle on doc_id)
    return sh.groupBy("doc_id").agg(
        *[
            F.min(
                _hash56(F.concat(F.lit(f"{i}:"), F.col("shingle")))
            ).alias(f"h{i}")
            for i in range(N_MINHASH)
        ]
    )


_SQL_SHINGLES2 = f"""
  SELECT DISTINCT doc_id, term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
  FROM ({SQL_DOC_TOKS})
  QUALIFY lead(term) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
"""
_sql_minhash_cols = ",\n       ".join(
    f"min(CASE WHEN i = {i} THEN h END) AS h{i}" for i in range(N_MINHASH)
)
SQL_MINHASH_SIGNATURES = f"""
WITH sh AS ({_SQL_SHINGLES2}),
hx AS (
  SELECT doc_id, i,
         {_SQL_HASH56.format(col="(i || ':' || shingle)")} AS h
  FROM sh CROSS JOIN (SELECT unnest(range({N_MINHASH})) AS i)
)
SELECT doc_id, {_sql_minhash_cols}
FROM hx GROUP BY doc_id
"""


def dedup_lsh_pairs(spark, sf_dir):
    """LSH banding over the MinHash signature ({N_BANDS} bands × 2 rows):
    candidate pairs = docs sharing any band bucket. The 100 TB-scale dedup
    path — shuffle key is the uniform band signature, never a text term."""
    sig = dedup_minhash_signatures(spark, sf_dir)
    bands = []
    for b in range(N_BANDS):
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.col(f"h{2*b}").alias("r0"),
                F.col(f"h{2*b+1}").alias("r1"),
            )
        )
    all_bands = bands[0]
    for extra in bands[1:]:
        all_bands = all_bands.unionByName(extra)
    a = all_bands.alias("a")
    b_ = all_bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.r0") == F.col("b.r0"))
            & (F.col("a.r1") == F.col("b.r1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


_sql_band_rows = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, h{2*b} AS r0, h{2*b+1} AS r1 FROM sig"
    for b in range(N_BANDS)
)
SQL_LSH_PAIRS = f"""
WITH sh AS ({_SQL_SHINGLES2}),
hx AS (
  SELECT doc_id, i,
         {_SQL_HASH56.format(col="(i || ':' || shingle)")} AS h
  FROM sh CROSS JOIN (SELECT unnest(range({N_MINHASH})) AS i)
),
sig AS (SELECT doc_id, {_sql_minhash_cols} FROM hx GROUP BY doc_id),
bands AS ({_sql_band_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id
"""

# ---------------------------------------------------------------- SimHash


def dedup_simhash(spark, sf_dir):
    """16-bit SimHash per doc: tf-weighted ±1 votes per bit of the term's
    hash; bit set iff vote sum > 0. Pure integer arithmetic — exact."""
    tf = (
        doc_tokens(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _hash56(F.col("term")))
    )
    bits = tf.select(
        "doc_id",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit"),
    ).withColumn(
        "vote",
        F.col("tf")
        * F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1),
    )
    return (
        bits.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
        .withColumn("bitval", F.when(F.col("v") > 0, F.expr("shiftleft(1, bit)")).otherwise(0))
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


SQL_SIMHASH = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf AS (
  SELECT doc_id, term, count(*) AS tf,
         {_SQL_HASH56.format(col='term')} AS h
  FROM toks GROUP BY doc_id, term
),
votes AS (
  SELECT doc_id, bit,
         sum(tf * (CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END)) AS v
  FROM tf CROSS JOIN (SELECT unnest(range(16)) AS bit)
  GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


# LSH candidates → EXACT Jaccard re-check: the oracle-gated scale path.
# Unlike dedup_shingle_jaccard (bounded quadratic baseline), this runs over
# the WHOLE corpus: pair generation is the banded equi-join, and the exact
# 2-shingle Jaccard is computed only for candidate pairs (two semi-join-shaped
# hash joins on (doc, shingle) — no all-pairs stage anywhere).

LSH_VERIFY_MIN = 0.50


def _shingles2(spark, sf_dir):
    """(doc_id, shingle) distinct word-2-grams — the MinHash shingle set."""
    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    return (
        toks.withColumn("nxt", F.lead("term").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "term", "nxt").alias("shingle"))
        .distinct()
    )


def dedup_lsh_jaccard_verified(spark, sf_dir):
    cand = dedup_lsh_pairs(spark, sf_dir)
    sh = _shingles2(spark, sf_dir).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= LSH_VERIFY_MIN)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


SQL_LSH_JACCARD_VERIFIED = f"""
WITH sh AS ({_SQL_SHINGLES2}),
hx AS (
  SELECT doc_id, i,
         {_SQL_HASH56.format(col="(i || ':' || shingle)")} AS h
  FROM sh CROSS JOIN (SELECT unnest(range({N_MINHASH})) AS i)
),
sig AS (SELECT doc_id, {_sql_minhash_cols} FROM hx GROUP BY doc_id),
bands AS ({_sql_band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= {LSH_VERIFY_MIN}
"""


# Duplicate-cluster assignment — the pipeline step AFTER pair generation:
# connected components over the LSH candidate graph, cluster_rep = min
# doc_id in the component ("keep one per cluster" rule is doc_id ==
# cluster_rep). Distributed min-label propagation WITH pointer jumping
# (label(doc) := min(label(doc), min-neighbor label, label(label(doc)))):
# neighbor propagation moves the min one hop per round, pointer jumping
# halves the remaining chain depth, so rounds = O(log diameter) — the same
# round bound as Kiveris et al., "Connected Components in MapReduce and
# Beyond". Each round is two doc_id-keyed joins + one groupBy-min — shuffle
# keys are doc_id, never text. No driver-side graph: convergence is a
# scalar count, and every round localCheckpoints its frame so the logical
# plan stays O(1) across iterations (on a cluster: a reliable checkpoint
# dir / intermediate table serves the same lineage cut).


def connected_components(vertices, pairs):
    """Connected components over an undirected pair list.

    ``vertices``: DataFrame with a ``doc_id`` column (the full vertex set —
    singletons keep their own id). ``pairs``: DataFrame (doc_a, doc_b).
    Returns (doc_id, label) with label = min doc_id in the component.
    Converges in O(log diameter) rounds; see module comment above.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        vertices.select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint(eager=True)
    )
    while True:
        nbr = (
            edges.join(labels, edges.s == labels.doc_id)
            .groupBy(F.col("d").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        l1 = labels.join(nbr, "doc_id", "left").select(
            "doc_id",
            F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
        )
        parent = l1.select(
            F.col("doc_id").alias("p_doc"), F.col("label").alias("p_label")
        )
        nxt = (
            l1.join(parent, l1.label == parent.p_doc, "left")
            .select(
                "doc_id",
                F.least("label", F.coalesce("p_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(labels.withColumnRenamed("label", "old"), "doc_id")
            .filter(F.col("label") < F.col("old"))
            .count()
        )
        labels = nxt
        if changed == 0:
            break
    return labels


def dedup_minhash_clusters(spark, sf_dir):
    labels = connected_components(
        dedup_minhash_signatures(spark, sf_dir).select("doc_id"),
        dedup_lsh_pairs(spark, sf_dir),
    )
    roots = labels.select("doc_id", F.col("label").alias("cluster_rep"))
    sizes = roots.groupBy("cluster_rep").agg(F.count("*").alias("cluster_size"))
    return roots.join(sizes, "cluster_rep").select(
        "doc_id", "cluster_rep", "cluster_size"
    )


SQL_MINHASH_CLUSTERS = f"""
WITH RECURSIVE sh AS ({_SQL_SHINGLES2}),
hx AS (
  SELECT doc_id, i,
         {_SQL_HASH56.format(col="(i || ':' || shingle)")} AS h
  FROM sh CROSS JOIN (SELECT unnest(range({N_MINHASH})) AS i)
),
sig AS (SELECT doc_id, {_sql_minhash_cols} FROM hx GROUP BY doc_id),
bands AS ({_sql_band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM cand
  UNION
  SELECT doc_b AS s, doc_a AS d FROM cand
),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM sig
  UNION
  SELECT r.a, e.d FROM reach r JOIN edges e ON e.s = r.b
),
roots AS (SELECT a AS doc_id, min(b) AS cluster_rep FROM reach GROUP BY a),
sizes AS (
  SELECT cluster_rep, count(*) AS cluster_size FROM roots GROUP BY 1
)
SELECT r.doc_id, r.cluster_rep, s.cluster_size
FROM roots r JOIN sizes s USING (cluster_rep)
"""


# Cross-corpus boilerplate detection (RefinedWeb/CCNet-style): a shingle
# occurring in >= BOILER_MIN_DF distinct docs is boilerplate (nav chrome,
# license blurbs, templated headers); per-doc boilerplate counts feed the
# "drop docs that are mostly boilerplate" pipeline filter. Complements
# ft_gopher_repetition (WITHIN-doc repetition) with the ACROSS-doc signal.
# Plan: shingle → df (one shuffle on shingle), join back (same key, AQE
# skew-join handles head shingles), per-doc counts (shuffle on doc_id) —
# corpus-wide, no candidate subset.

BOILER_MIN_DF = 3


def dedup_boilerplate_ngrams(spark, sf_dir):
    sh = _shingles(spark, sf_dir, max_doc=None)
    df = sh.groupBy("shingle").agg(F.countDistinct("doc_id").alias("df"))
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("df") >= BOILER_MIN_DF, 1).otherwise(0)
            ).cast("long").alias("n_boilerplate"),
        )
    )


_SQL_SHINGLES_ALL = _SQL_SHINGLES.replace(f"WHERE doc_id < {JACCARD_SUBSET}", "")

SQL_BOILERPLATE_NGRAMS = f"""
WITH sh AS ({_SQL_SHINGLES_ALL}),
dfs AS (SELECT shingle, count(DISTINCT doc_id) AS df FROM sh GROUP BY shingle)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.df >= {BOILER_MIN_DF} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boilerplate
FROM sh s JOIN dfs d ON d.shingle = s.shingle
GROUP BY s.doc_id
"""


# Exact duplicate-SPAN detection (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better"): find every token span that occurs
# verbatim >= SPAN_MIN_OCC times anywhere in the corpus (other docs OR the
# same doc) and emit per-doc REMOVAL RANGES — the step after "this doc has
# dupes" (boilerplate/LSH) that actual substring dedup pipelines need. The
# paper builds a suffix array; the Spark-native equivalent is positional
# k-gram matching: a duplicated span of length >= SPAN_K is exactly a run of
# duplicated k-gram occurrences, so merging overlapping/adjacent duplicate
# k-gram windows per doc reconstructs the maximal removal intervals.
# Plan (100 TB): occurrence count is one shuffle on the gram key (AQE
# skew-join absorbs head grams on the join back — same shape as
# dedup_boilerplate_ngrams), then the interval merge is a per-doc window +
# a groupBy on (doc_id, grp) that reuses the window's partitioning — no
# extra exchange, no cartesian, nothing quadratic.

SPAN_K = 5
SPAN_MIN_OCC = 2


def _gram_occurrences(spark, sf_dir):
    """(doc_id, pos, gram): every positional word-{SPAN_K}-gram occurrence
    (NOT per-doc distinct — within-doc repeats count toward duplication)."""
    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ",
        F.col("term"),
        *[F.lead("term", i).over(w) for i in range(1, SPAN_K)],
    )
    # gram and the null-guard in one projection (same invariant as _shingles)
    return (
        toks.select(
            "doc_id",
            "pos",
            gram.alias("gram"),
            F.lead("term", SPAN_K - 1).over(w).alias("lead_last"),
        )
        .filter(F.col("lead_last").isNotNull())
        .select("doc_id", "pos", "gram")
    )


def dedup_duplicate_spans(spark, sf_dir):
    """Per-doc maximal duplicate token spans [span_start, span_end]
    (0-based, inclusive): merged windows of {SPAN_K}-grams occurring
    >= {SPAN_MIN_OCC} times corpus-wide."""
    occ = _gram_occurrences(spark, sf_dir)
    dup_grams = (
        occ.groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= SPAN_MIN_OCC)
        .select("gram")
    )
    dup = occ.join(dup_grams, "gram").select("doc_id", "pos")
    wd = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (SPAN_K - 1)).over(
        wd.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = dup.select(
        "doc_id",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("new_grp"),
    )
    grps = flagged.withColumn(
        "grp", F.sum("new_grp").over(wd.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        grps.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (SPAN_K - 1)).cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


_SQL_GRAM_OCC = f"""
  SELECT doc_id, pos,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
              || ' ' || lead(term, 3) OVER w || ' ' || lead(term, 4) OVER w
             AS gram
  FROM ({SQL_DOC_TOKS})
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(term, {SPAN_K - 1}) OVER w IS NOT NULL
"""

SQL_DUPLICATE_SPANS = f"""
WITH occ AS ({_SQL_GRAM_OCC}),
dup_grams AS (
  SELECT gram FROM occ GROUP BY gram HAVING count(*) >= {SPAN_MIN_OCC}
),
dup AS (SELECT doc_id, pos FROM occ JOIN dup_grams USING (gram)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(
                  max(pos + {SPAN_K - 1}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -2) + 1
              THEN 1 ELSE 0 END AS new_grp
  FROM dup
),
grps AS (
  SELECT doc_id, pos,
         sum(new_grp) OVER (
           PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {SPAN_K - 1} AS BIGINT) AS span_end,
       CAST(max(pos) + {SPAN_K - 1} - min(pos) + 1 AS BIGINT) AS span_len
FROM grps GROUP BY doc_id, grp
"""


# The dedup ACTION for duplicate spans (keep-first-occurrence, the Lee et
# al. removal rule): each duplicated gram's canonical occurrence is the
# global minimum (doc_id, pos); every LATER occurrence is redundant and its
# window joins the doc's removal intervals. Per-doc report: how many merged
# removal spans, how many tokens they cover, and the doc's removal share —
# the numbers a pipeline uses to rewrite or drop the doc. Same plan shape
# as dedup_duplicate_spans plus one broadcast-sized min-per-gram aggregate
# joined back on the gram key.


def dedup_span_removal(spark, sf_dir):
    """Per-doc keep-first-occurrence removal report: redundant duplicate
    windows merged into intervals; docs with no redundant occurrence (or
    only canonical ones) report zero removal."""
    occ = _gram_occurrences(spark, sf_dir)
    stats = occ.groupBy("gram").agg(
        F.count("*").alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("first_occ"),
    )
    redundant = (
        occ.join(stats.filter(F.col("n_occ") >= SPAN_MIN_OCC), "gram")
        .filter(
            (F.col("doc_id") > F.col("first_occ.doc_id"))
            | (
                (F.col("doc_id") == F.col("first_occ.doc_id"))
                & (F.col("pos") > F.col("first_occ.pos"))
            )
        )
        .select("doc_id", "pos")
    )
    wd = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (SPAN_K - 1)).over(
        wd.rowsBetween(W.unboundedPreceding, -1)
    )
    grps = redundant.select(
        "doc_id",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("new_grp"),
    ).withColumn(
        "grp", F.sum("new_grp").over(wd.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = grps.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + (SPAN_K - 1)).alias("e"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_remove_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("n_tokens_removed"),
    )
    doc_len = doc_tokens(spark, sf_dir).groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens")
    )
    return (
        doc_len.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_remove_spans", F.lit(0)).cast("long").alias("n_remove_spans"),
            F.coalesce("n_tokens_removed", F.lit(0)).cast("long").alias("n_tokens_removed"),
            F.round(
                F.coalesce("n_tokens_removed", F.lit(0)) * 1.0 / F.col("n_tokens"), 6
            ).alias("removed_share"),
        )
    )


SQL_SPAN_REMOVAL = f"""
WITH occ AS ({_SQL_GRAM_OCC}),
stats AS (
  SELECT gram, count(*) AS n_occ,
         min(doc_id * 4194304 + pos) AS first_key
  FROM occ GROUP BY gram
),
redundant AS (
  SELECT o.doc_id, o.pos
  FROM occ o JOIN stats s ON s.gram = o.gram
  WHERE s.n_occ >= {SPAN_MIN_OCC}
    AND o.doc_id * 4194304 + o.pos > s.first_key
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(
                  max(pos + {SPAN_K - 1}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -2) + 1
              THEN 1 ELSE 0 END AS new_grp
  FROM redundant
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {SPAN_K - 1} AS e
  FROM (
    SELECT doc_id, pos,
           sum(new_grp) OVER (
             PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
    FROM flagged
  ) GROUP BY doc_id, grp
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_remove_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS n_tokens_removed
  FROM spans GROUP BY doc_id
),
doc_len AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
  FROM ({SQL_DOC_TOKS}) GROUP BY doc_id
)
SELECT d.doc_id, d.n_tokens,
       CAST(coalesce(p.n_remove_spans, 0) AS BIGINT) AS n_remove_spans,
       CAST(coalesce(p.n_tokens_removed, 0) AS BIGINT) AS n_tokens_removed,
       round(coalesce(p.n_tokens_removed, 0) * 1.0 / d.n_tokens, 6)
           AS removed_share
FROM doc_len d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


QUERIES = {
    "dedup_exact": (dedup_exact, SQL_DEDUP_EXACT),
    "dedup_duplicate_spans": (dedup_duplicate_spans, SQL_DUPLICATE_SPANS),
    "dedup_span_removal": (dedup_span_removal, SQL_SPAN_REMOVAL),
    "dedup_boilerplate_ngrams": (dedup_boilerplate_ngrams, SQL_BOILERPLATE_NGRAMS),
    "dedup_shingle_jaccard": (dedup_shingle_jaccard, SQL_SHINGLE_JACCARD),
    "dedup_minhash_signatures": (dedup_minhash_signatures, SQL_MINHASH_SIGNATURES),
    "dedup_lsh_pairs": (dedup_lsh_pairs, SQL_LSH_PAIRS),
    "dedup_minhash_clusters": (dedup_minhash_clusters, SQL_MINHASH_CLUSTERS),
    "dedup_lsh_jaccard_verified": (dedup_lsh_jaccard_verified, SQL_LSH_JACCARD_VERIFIED),
    "dedup_simhash": (dedup_simhash, SQL_SIMHASH),
}


# Embedding-cosine near-dup pairs (driver brief): all pairs above a cosine
# threshold — exact quadratic baseline over a bounded candidate set; the
# scale path replaces the pair join with the LSH bucket join above.

COS_DUP_THRESHOLD = 0.40  # synthetic embeddings max pairwise cos ~0.46
COS_DUP_SUBSET = 300  # vec_id bound for the quadratic entry


def dedup_embedding_cosine(spark, sf_dir):
    from harvester_spark.operators.similarity import _components

    comp = _components(spark, sf_dir).filter(F.col("vec_id") < COS_DUP_SUBSET).cache()
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    a = comp.select(F.col("vec_id").alias("va"), "pos", F.col("val").alias("xa"))
    b = comp.select(F.col("vec_id").alias("vb"), "pos", F.col("val").alias("xb"))
    dots = (
        a.join(b, "pos")
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("va"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("vb"), F.col("nrm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "va")
        .join(F.broadcast(nb), "vb")
        .withColumn("cos", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos") >= COS_DUP_THRESHOLD)
        .select("va", "vb", "cos")
    )


SQL_EMBEDDING_COSINE = f"""
WITH comp AS (
  SELECT vec_id,
         unnest(range(len(embedding))) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings WHERE vec_id < {COS_DUP_SUBSET}
),
norms AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM comp GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.val * b.val) AS dot
  FROM comp a JOIN comp b ON a.pos = b.pos AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT va, vb, round(dot / (na.nrm * nb.nrm), 6) AS cos
FROM dots
JOIN norms na ON na.vec_id = va
JOIN norms nb ON nb.vec_id = vb
WHERE round(dot / (na.nrm * nb.nrm), 6) >= {COS_DUP_THRESHOLD}
"""

QUERIES["dedup_embedding_cosine"] = (dedup_embedding_cosine, SQL_EMBEDDING_COSINE)


# Embedding near-dup SCALE path: same-LSH-bucket candidate pairs → exact
# cosine re-check, CORPUS-WIDE (no vec_id bound) — the oracle-gated twin of
# the bounded quadratic baseline above. Shuffle keys: bucket id for pair
# generation, (vec_id, pos) for the candidate-only dot products.


def dedup_embedding_lsh_verified(spark, sf_dir):
    from harvester_spark.operators.similarity import _buckets, _components

    b = _buckets(spark, sf_dir)
    pairs = (
        b.select(F.col("vec_id").alias("va"), "bucket")
        .join(b.select(F.col("vec_id").alias("vb"), "bucket"), "bucket")
        .filter(F.col("va") < F.col("vb"))
        .select("va", "vb")
    )
    comp = _components(spark, sf_dir).cache()
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    ca = comp.select(F.col("vec_id").alias("va"), "pos", F.col("val").alias("xa"))
    cb = comp.select(F.col("vec_id").alias("vb"), "pos", F.col("val").alias("xb"))
    dots = (
        pairs.join(ca, "va")
        .join(cb, ["vb", "pos"])
        .groupBy("va", "vb")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("va"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("vb"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "va")
        .join(nb, "vb")
        .withColumn("cos", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos") >= COS_DUP_THRESHOLD)
        .select("va", "vb", "cos")
    )


def _sql_embedding_lsh_verified():
    from harvester_spark.operators.similarity import SQL_PLANES_BUCKETS

    return f"""
WITH comp AS (
  SELECT vec_id,
         unnest(range(len(embedding))) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM comp GROUP BY vec_id),
{SQL_PLANES_BUCKETS},
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
dots AS (
  SELECT p.va, p.vb, sum(ca.val * cb.val) AS dot
  FROM pairs p
  JOIN comp ca ON ca.vec_id = p.va
  JOIN comp cb ON cb.vec_id = p.vb AND cb.pos = ca.pos
  GROUP BY 1, 2
)
SELECT va, vb, round(dot / (na.nrm * nb.nrm), 6) AS cos
FROM dots
JOIN norms na ON na.vec_id = va
JOIN norms nb ON nb.vec_id = vb
WHERE round(dot / (na.nrm * nb.nrm), 6) >= {COS_DUP_THRESHOLD}
"""


QUERIES["dedup_embedding_lsh_verified"] = (
    dedup_embedding_lsh_verified,
    _sql_embedding_lsh_verified(),
)


# SimHash near-dup pairing: candidate pairs whose 16-bit SimHashes differ in
# ≤ HAMMING_MAX bits (bit_count(xor) — verified identical across engines).
# Scale path: block on simhash bytes (pigeonhole) instead of the quadratic
# join; the Hamming check is unchanged.

HAMMING_MAX = 3


SIMHASH_BANDS = HAMMING_MAX + 1  # pigeonhole: ≤3 differing bits miss ≥1 of 4


def dedup_simhash_pairs(spark, sf_dir):
    """Pigeonhole-banded SimHash pairing: split the 16-bit hash into
    {SIMHASH_BANDS} bands of 4 bits — any pair within Hamming ≤
    {HAMMING_MAX} agrees EXACTLY on at least one band, so candidates come
    from an equi-join on (band_ix, band_bits) (uniform shuffle key, no
    cartesian product) and only candidates pay the bit_count check.
    Pairs sharing several bands dedup via distinct."""
    band_width = 16 // SIMHASH_BANDS
    sig = dedup_simhash(spark, sf_dir).cache()
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band_ix"),
    ).withColumn(
        "band_bits",
        F.expr(f"(simhash >> (band_ix * {band_width})) & {(1 << band_width) - 1}"),
    )
    a = bands.select(
        "band_ix", "band_bits",
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"),
    )
    b = bands.select(
        "band_ix", "band_bits",
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"),
    )
    return (
        a.join(b, ["band_ix", "band_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


SQL_SIMHASH_PAIRS = f"""
WITH sig AS ({SQL_SIMHASH})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
"""

QUERIES["dedup_simhash_pairs"] = (dedup_simhash_pairs, SQL_SIMHASH_PAIRS)


# Benchmark decontamination (training-data pipeline): drop/flag training
# docs sharing an n-gram with the evaluation set. The benchmark stand-in is
# the deterministic doc_id % 97 == 0 subset; n=4 matches the corpus's
# collision scale. Scale shape: eval-set grams are small by nature -> the
# distinct benchmark grams broadcast; the corpus side is one explode +
# broadcast hash join + groupBy(doc_id) — no shuffle of the gram stream.

DECONTAM_N = 4
DECONTAM_MOD = 97


def dedup_decontam_ngrams(spark, sf_dir):
    """Training docs contaminated by the benchmark subset: shared distinct
    4-gram count per (non-benchmark) doc — the n-gram-overlap
    decontamination standard in LLM data pipelines."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_column(F.col("text")).alias("toks"))
    n = DECONTAM_N
    parts = ", ".join(f"toks[i+{j}]" for j in range(n))
    grams = t.select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(toks) >= {n} THEN transform(sequence(0, size(toks)-{n}),"
            f" i -> concat_ws(' ', {parts}))"
            " ELSE cast(array() AS array<string>) END"
        ).alias("grams"),
    )
    ex = grams.select("doc_id", F.explode("grams").alias("g"))
    bench = (
        ex.filter(F.col("doc_id") % DECONTAM_MOD == 0).select("g").distinct()
    )
    return (
        ex.filter(F.col("doc_id") % DECONTAM_MOD != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .select("doc_id", "n_shared")
    )


def _sql_decontam() -> str:
    n = DECONTAM_N
    parts = " || ' ' || ".join(f"toks[i+{j+1}]" for j in range(n))
    return f"""
WITH t AS (SELECT doc_id, {SQL_TOKS.format(col='text')} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest([{parts} FOR i IN range(0, greatest(len(toks) - {n - 1}, 0))]) AS g
  FROM t
),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id % {DECONTAM_MOD} = 0)
SELECT g.doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_shared
FROM g JOIN bench USING (g)
WHERE g.doc_id % {DECONTAM_MOD} <> 0
GROUP BY g.doc_id
"""


QUERIES["dedup_decontam_ngrams"] = (dedup_decontam_ngrams, _sql_decontam())


# Keep-best-per-cluster: the selection step every dedup deployment runs after
# clustering — within each near-duplicate cluster keep the highest-quality
# member (token count desc, doc_id asc tie-break; integer ordering so both
# engines agree exactly) and drop the rest. Composes dedup_minhash_clusters
# with ft_quality_score; reference analogue: the harvester keeps the
# highest-priority copy on srn collisions (core/models/datatypes/
# document.py:133-139) — here "priority" is a content-quality signal.
# Scale shape: clusters (O(log d) label propagation) + one tf-derived
# quality agg + one window partitioned by cluster_rep (clusters are small
# by construction — bounded by LSH bucket sizes — so no skew).


def dedup_cluster_keep_best(spark, sf_dir):
    from harvester_spark.operators.fulltext_queries import ft_quality_score

    clusters = dedup_minhash_clusters(spark, sf_dir)
    q = ft_quality_score(spark, sf_dir).select("doc_id", "n_tokens")
    j = clusters.join(q, "doc_id")
    w = W.partitionBy("cluster_rep").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("q_rank", F.row_number().over(w).cast("long"))
        .select(
            "doc_id",
            "cluster_rep",
            "cluster_size",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("q_rank") == 1).alias("kept"),
        )
    )


def _sql_cluster_keep_best() -> str:
    from harvester_spark.operators.fulltext_queries import SQL_QUALITY_SCORE

    return f"""
WITH clusters AS ({SQL_MINHASH_CLUSTERS}),
q AS ({SQL_QUALITY_SCORE})
SELECT c.doc_id, c.cluster_rep, c.cluster_size,
       CAST(q.n_tokens AS BIGINT) AS n_tokens,
       row_number() OVER (
         PARTITION BY c.cluster_rep
         ORDER BY q.n_tokens DESC, c.doc_id ASC
       ) = 1 AS kept
FROM clusters c JOIN q ON c.doc_id = q.doc_id
"""


QUERIES["dedup_cluster_keep_best"] = (dedup_cluster_keep_best, _sql_cluster_keep_best())


# --------------------------------- incremental snapshot dedup (new vs base)

# Dedup an INCOMING crawl snapshot against the already-ingested corpus — the
# CommonCrawl-snapshot pattern (each new dump is near-dup-filtered against
# every previous dump before ingestion). The deterministic split below
# (doc_id % 5 == 0 → "new") stands in for the snapshot boundary; cross-split
# planted duplicates exist at every sf (checked: 11–14 verified pairs).
#
# The scale property this operator exists for: incremental cost is
# O(|new| + probed candidates), NEVER O(|corpus|²) — the base side's MinHash
# signatures and shingle sets are produced once at ingest time and persisted
# (in production this recomputation is a parquet read of the signature
# table; signatures are per-doc, so filter-after == filter-before), and the
# band probe joins new×base only: no base×base pair is ever generated,
# unlike rerunning dedup_lsh_pairs over the union.

NEW_SNAPSHOT_MOD = 5  # doc_id % 5 == 0 → the incoming snapshot


def dedup_new_vs_base(spark, sf_dir):
    """Verified near-duplicates of new-snapshot docs against the base corpus:
    (new_doc, base_doc, n_inter, jaccard) for exact 2-shingle Jaccard >=
    LSH_VERIFY_MIN among band-probe candidates."""
    is_new = F.col("doc_id") % NEW_SNAPSHOT_MOD == 0
    sig = dedup_minhash_signatures(spark, sf_dir)
    bands = []
    for b in range(N_BANDS):
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.col(f"h{2*b}").alias("r0"),
                F.col(f"h{2*b+1}").alias("r1"),
            )
        )
    all_bands = bands[0]
    for extra in bands[1:]:
        all_bands = all_bands.unionByName(extra)
    nb = all_bands.filter(is_new).alias("n")
    bb = all_bands.filter(~is_new).alias("b")
    cand = (
        nb.join(
            bb,
            (F.col("n.band") == F.col("b.band"))
            & (F.col("n.r0") == F.col("b.r0"))
            & (F.col("n.r1") == F.col("b.r1")),
        )
        .select(
            F.col("n.doc_id").alias("new_doc"), F.col("b.doc_id").alias("base_doc")
        )
        .distinct()
    )
    sh = _shingles2(spark, sf_dir).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    shn = sh.select(F.col("doc_id").alias("new_doc"), "shingle")
    shb = sh.select(F.col("doc_id").alias("base_doc"), "shingle")
    inter = (
        cand.join(shn, "new_doc")
        .join(shb, ["base_doc", "shingle"])
        .groupBy("new_doc", "base_doc")
        .agg(F.count("*").alias("n_inter"))
    )
    sn = sizes.select(F.col("doc_id").alias("new_doc"), F.col("n_sh").alias("n_n"))
    sb = sizes.select(F.col("doc_id").alias("base_doc"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sn, "new_doc")
        .join(sb, "base_doc")
        .withColumn(
            "jaccard",
            F.col("n_inter") * 1.0 / (F.col("n_n") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= LSH_VERIFY_MIN)
        .select("new_doc", "base_doc", "n_inter", "jaccard")
    )


SQL_NEW_VS_BASE = f"""
WITH sh AS ({_SQL_SHINGLES2}),
hx AS (
  SELECT doc_id, i,
         {_SQL_HASH56.format(col="(i || ':' || shingle)")} AS h
  FROM sh CROSS JOIN (SELECT unnest(range({N_MINHASH})) AS i)
),
sig AS (SELECT doc_id, {_sql_minhash_cols} FROM hx GROUP BY doc_id),
bands AS ({_sql_band_rows}),
cand AS (
  SELECT DISTINCT n.doc_id AS new_doc, b.doc_id AS base_doc
  FROM bands n JOIN bands b
    ON n.band = b.band AND n.r0 = b.r0 AND n.r1 = b.r1
  WHERE n.doc_id % {NEW_SNAPSHOT_MOD} = 0 AND b.doc_id % {NEW_SNAPSHOT_MOD} <> 0
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.new_doc, c.base_doc, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.new_doc
  JOIN sh b ON b.doc_id = c.base_doc AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT new_doc, base_doc, n_inter,
       n_inter * 1.0 / (sn.n_sh + sb.n_sh - n_inter) AS jaccard
FROM inter
JOIN sizes sn ON sn.doc_id = new_doc
JOIN sizes sb ON sb.doc_id = base_doc
WHERE n_inter * 1.0 / (sn.n_sh + sb.n_sh - n_inter) >= {LSH_VERIFY_MIN}
"""

QUERIES["dedup_new_vs_base"] = (dedup_new_vs_base, SQL_NEW_VS_BASE)


# ------------------------------------------- LSH precision/recall eval

# The dedup twin of ann_lsh_recall: how good are the banded MinHash
# candidates as a predictor of true near-duplicates? Ground truth = exact
# 2-shingle Jaccard >= LSH_VERIFY_MIN over the bounded eval subset
# (doc_id < JACCARD_SUBSET — the quadratic truth join is labeled
# evaluation-only, same policy as dedup_shingle_jaccard); predicted = the
# corpus LSH banding restricted to the same subset. Output is ONE row of
# integer counts + multiply-then-integer-divide micro rates (nonnegative
# int64 only — no float division).
#
# Scale shape: the predicted side is the production banded equi-join; only
# the TRUTH side is quadratic, and it is bounded by construction. This is
# how a 100 TB pipeline tunes its band/row parameters: sample a subset,
# compute exact truth there, sweep the banding against it.


def dedup_lsh_pr_eval(spark, sf_dir):
    """(n_pred, n_truth, tp, fp, fn, precision_micro, recall_micro) of LSH
    banding vs exact-Jaccard truth on the bounded subset."""
    pred = (
        dedup_lsh_pairs(spark, sf_dir)
        .filter(
            (F.col("doc_a") < JACCARD_SUBSET) & (F.col("doc_b") < JACCARD_SUBSET)
        )
        .withColumn("p", F.lit(1))
    )
    sh = _shingles2(spark, sf_dir).filter(F.col("doc_id") < JACCARD_SUBSET).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    truth = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("n_inter") * 1.0
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= LSH_VERIFY_MIN
        )
        .select("doc_a", "doc_b")
        .withColumn("t", F.lit(1))
    )
    j = pred.select("doc_a", "doc_b", "p").join(
        truth, ["doc_a", "doc_b"], "full_outer"
    )
    agg = j.agg(
        F.sum(F.coalesce("p", F.lit(0))).alias("n_pred"),
        F.sum(F.coalesce("t", F.lit(0))).alias("n_truth"),
        F.sum(F.coalesce("p", F.lit(0)) * F.coalesce("t", F.lit(0))).alias("tp"),
    )
    return agg.selectExpr(
        "n_pred",
        "n_truth",
        "tp",
        "n_pred - tp AS fp",
        "n_truth - tp AS fn",
        "CASE WHEN n_pred > 0 THEN (tp * 1000000) DIV n_pred END AS precision_micro",
        "CASE WHEN n_truth > 0 THEN (tp * 1000000) DIV n_truth END AS recall_micro",
    )


SQL_LSH_PR_EVAL = f"""
WITH sh_all AS ({_SQL_SHINGLES2}),
hx AS (
  SELECT doc_id, i,
         {_SQL_HASH56.format(col="(i || ':' || shingle)")} AS h
  FROM sh_all CROSS JOIN (SELECT unnest(range({N_MINHASH})) AS i)
),
sig AS (SELECT doc_id, {_sql_minhash_cols} FROM hx GROUP BY doc_id),
bands AS ({_sql_band_rows}),
pred AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id
  WHERE a.doc_id < {JACCARD_SUBSET} AND b.doc_id < {JACCARD_SUBSET}
),
sh AS (SELECT * FROM sh_all WHERE doc_id < {JACCARD_SUBSET}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= {LSH_VERIFY_MIN}
),
j AS (
  SELECT coalesce(p.mark, 0) AS p, coalesce(t.mark, 0) AS t
  FROM (SELECT doc_a, doc_b, 1 AS mark FROM pred) p
  FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS mark FROM truth) t
    USING (doc_a, doc_b)
),
agg AS (
  SELECT CAST(sum(p) AS BIGINT) AS n_pred,
         CAST(sum(t) AS BIGINT) AS n_truth,
         CAST(sum(p * t) AS BIGINT) AS tp
  FROM j
)
SELECT n_pred, n_truth, tp,
       n_pred - tp AS fp, n_truth - tp AS fn,
       CASE WHEN n_pred > 0 THEN (tp * 1000000) // n_pred END AS precision_micro,
       CASE WHEN n_truth > 0 THEN (tp * 1000000) // n_truth END AS recall_micro
FROM agg
"""


QUERIES["dedup_lsh_pr_eval"] = (dedup_lsh_pr_eval, SQL_LSH_PR_EVAL)


# TF-IDF cosine near-dup pairs with rare-shingle blocking — the exact
# lexical-vector twin of dedup_embedding_lsh_verified: candidate pairs
# come from a BLOCKING key (a shared shingle with df in the rare band),
# never an all-pairs product, and the exact cosine runs on candidates
# only. Candidate volume is bounded by construction: Σ_s C(df_s, 2) ≤
# (RARE_SH_MAX − 1)/2 · |rare shingles| — the equi-join on the shingle
# key is the only pair generator (plan-guarded: no cartesian).
#
# Determinism: idf is pinned to int64 KILO-units (milli-idf keeps
# w = tf·idf ≤ ~4e5, so Σw² and every dot product stay far inside int64);
# the cosine is the micro-unit idiom over an exact-integer dot and
# double-sqrt of the exact-integer norm product (CAST to DOUBLE before
# multiplying — the int64 product n2a·n2b could overflow, the double one
# cannot).

RARE_SH_MIN, RARE_SH_MAX = 2, 4  # blocking band: shingle df ∈ [2, 4]
TFIDF_TAU_MICRO = 850_000  # cosine ≥ 0.85

_IDF_KILO_EXPR = (
    "CAST(floor(ln((n + 1.0e0) / (df + 1.0e0)) * 1.0e3 + 0.5e0) AS BIGINT)"
)
_COS_MICRO_EXPR = (
    "CAST(floor(dot / sqrt(CAST(n2_a AS DOUBLE) * n2_b) * 1.0e6 + 0.5e0)"
    " AS BIGINT)"
)


def dedup_tfidf_cosine_pairs(spark, sf_dir):
    toks = doc_tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = load(spark, sf_dir, "documents").select(F.count("*").alias("n"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term", (F.col("tf") * F.expr(_IDF_KILO_EXPR)).alias("w")
        )
    )
    n2 = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    sh = _shingles(spark, sf_dir, max_doc=None)
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c").between(RARE_SH_MIN, RARE_SH_MAX))
        .select("shingle")
    )
    blocked = sh.join(rare, "shingle")
    cand = (
        blocked.select("shingle", F.col("doc_id").alias("doc_a"))
        .join(
            blocked.select("shingle", F.col("doc_id").alias("doc_b")), "shingle"
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    wa = w.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("w_a")
    )
    wb = w.select(
        F.col("doc_id").alias("doc_b2"),
        F.col("term").alias("term_b"),
        F.col("w").alias("w_b"),
    )
    dots = (
        cand.join(wa, "doc_a")
        .join(
            wb,
            (F.col("doc_b") == F.col("doc_b2"))
            & (F.col("term") == F.col("term_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("dot"))
    )
    na = n2.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2_a"))
    nb = n2.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2_b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("cos_micro", F.expr(_COS_MICRO_EXPR))
        .filter(F.col("cos_micro") >= TFIDF_TAU_MICRO)
        .select("doc_a", "doc_b", "dot", "cos_micro")
    )


SQL_TFIDF_COSINE_PAIRS = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
nd AS (SELECT count(*) AS n FROM documents),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
w AS (
  SELECT doc_id, term, tf * {_IDF_KILO_EXPR} AS w
  FROM tf JOIN dft USING (term) CROSS JOIN nd
),
n2 AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM w GROUP BY 1),
sh AS ({{shingles}}),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING count(*) BETWEEN {RARE_SH_MIN} AND {RARE_SH_MAX}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN rare USING (shingle)
  JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
),
dots AS (
  SELECT doc_a, doc_b, CAST(sum(wa.w * wb.w) AS BIGINT) AS dot
  FROM cand
  JOIN w wa ON wa.doc_id = doc_a
  JOIN w wb ON wb.doc_id = doc_b AND wb.term = wa.term
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, dot,
       {_COS_MICRO_EXPR} AS cos_micro
FROM dots
JOIN (SELECT doc_id, n2 AS n2_a FROM n2) na ON na.doc_id = doc_a
JOIN (SELECT doc_id, n2 AS n2_b FROM n2) nb ON nb.doc_id = doc_b
WHERE {_COS_MICRO_EXPR} >= {TFIDF_TAU_MICRO}
""".format(shingles=_SQL_SHINGLES_ALL)


QUERIES["dedup_tfidf_cosine_pairs"] = (
    dedup_tfidf_cosine_pairs,
    SQL_TFIDF_COSINE_PAIRS,
)


# ---------------------------------------------- content-defined chunking

# CDC storage dedup (the LBFS/rsync/restic family; Muthitacharoen et al.
# SOSP 2001): chunk boundaries are declared wherever a rolling
# content hash of the last {CDC_W} characters hits 0 mod {CDC_MOD}, so
# INSERTIONS SHIFT BOUNDARIES LOCALLY instead of re-aligning every chunk
# the way a fixed grid does — near-duplicate documents then share most of
# their chunks and a content-addressed store keeps each chunk once. This
# is the STORAGE-layer dedup rung under the repo's document-level family
# (exact / MinHash / SimHash / spans): it prices byte-level savings, not
# document removal.
#
# Determinism: the "rolling" hash at position p is the md5-derived 56-bit
# integer of substring(text, p−{CDC_W}+1, {CDC_W}) — content-defined and
# alignment-free exactly like a Gear/Rabin window (md5 replaces the
# incremental polynomial; same boundary semantics, engine-identical).
# Chunk identity is md5 of the chunk text. Every figure is an exact
# integer; dedup_milli = duplicated bytes / total bytes.
#
# Scale shape: ONE position-explode map (no shuffle — the window runs
# inside the per-doc partition), one boundary lag window keyed by doc,
# one chunk-hash groupBy (THE content-addressed store build), one scalar
# rollup. At petabyte scale the explode becomes the mapInPandas rolling
# kernel; the plan shape (map → chunk-hash exchange → rollup) is
# unchanged.

CDC_W = 8  # rolling window (chars)
CDC_MOD = 64  # boundary divisor => expected ~64-char chunks


def cdc_chunk_dedup(spark, sf_dir):
    """(n_chunks, n_distinct_chunks, dup_chunks, total_bytes, dup_bytes,
    dedup_milli): corpus-level content-defined-chunking dedup figures."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 1)
    pos = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("p"),
    )
    bnd = pos.filter(
        (
            (F.col("p") >= CDC_W)
            & (
                F.conv(
                    F.substring(
                        F.md5(F.expr(f"substring(text, p - {CDC_W - 1}, {CDC_W})")),
                        1,
                        14,
                    ),
                    16,
                    10,
                ).cast("long")
                % CDC_MOD
                == 0
            )
        )
        | (F.col("p") == F.length("text"))
    )
    wl = W.partitionBy("doc_id").orderBy("p")
    chunks = bnd.select(
        "doc_id",
        "text",
        F.coalesce(F.lag("p").over(wl), F.lit(0)).alias("prev"),
        "p",
    ).select(
        F.expr("substring(text, prev + 1, p - prev)").alias("chunk"),
        (F.col("p") - F.col("prev")).cast("long").alias("len"),
    )
    store = chunks.groupBy(F.md5("chunk").alias("h")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.max("len").cast("long").alias("len"),
    )
    return store.agg(
        F.sum("cnt").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_distinct_chunks"),
        F.sum(F.col("cnt") - 1).cast("long").alias("dup_chunks"),
        F.sum(F.col("cnt") * F.col("len")).cast("long").alias("total_bytes"),
        F.sum((F.col("cnt") - 1) * F.col("len")).cast("long").alias("dup_bytes"),
    ).withColumn(
        "dedup_milli",
        F.expr("CAST(dup_bytes * 1000 DIV total_bytes AS BIGINT)"),
    )


SQL_CDC_CHUNK_DEDUP = f"""
WITH pos AS (
  SELECT doc_id, text, CAST(p AS BIGINT) AS p
  FROM documents
  CROSS JOIN LATERAL (SELECT unnest(range(1, length(text) + 1)) AS p)
  WHERE length(text) >= 1
),
bnd AS (
  SELECT doc_id, text, p FROM pos
  WHERE (p >= {CDC_W} AND
         CAST(('0x' || substr(md5(substring(text, p - {CDC_W - 1}, {CDC_W})),
                              1, 14)) AS BIGINT) % {CDC_MOD} = 0)
     OR p = length(text)
),
chunks AS (
  SELECT substring(text, prev + 1, p - prev) AS chunk,
         CAST(p - prev AS BIGINT) AS len
  FROM (
    SELECT doc_id, text, p,
           coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) AS prev
    FROM bnd
  )
),
store AS (
  SELECT md5(chunk) AS h, CAST(count(*) AS BIGINT) AS cnt,
         CAST(max(len) AS BIGINT) AS len
  FROM chunks GROUP BY 1
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct_chunks,
       CAST(sum(cnt - 1) AS BIGINT) AS dup_chunks,
       CAST(sum(cnt * len) AS BIGINT) AS total_bytes,
       CAST(sum((cnt - 1) * len) AS BIGINT) AS dup_bytes,
       CAST(CAST(sum((cnt - 1) * len) AS BIGINT) * 1000
            // CAST(sum(cnt * len) AS BIGINT) AS BIGINT) AS dedup_milli
FROM store
"""

QUERIES["cdc_chunk_dedup"] = (cdc_chunk_dedup, SQL_CDC_CHUNK_DEDUP)


# ---------------------------------------------- Broder CONTAINMENT pairs

# Broder (SEQUENCES 1997) defines TWO near-dup measures: resemblance
# (Jaccard — everything above) and CONTAINMENT c(A,B) = |A∩B|/|A|, the
# asymmetric one that catches quote-expansion pages, boilerplate-wrapped
# reposts, and prefix/superset articles that resemblance MISSES (a small
# doc fully inside a big one has Jaccard ≈ |A|/|B| but containment 1.0).
# This operator re-checks the LSH candidate pairs with exact DIRECTIONAL
# containment in floored micro-units ((n_inter·1e6) DIV n — nonnegative,
# no trunc/floor seam).
#
# Honest recall caveat (documented, test-pinned only on what it claims):
# the candidate generator is the RESEMBLANCE-tuned banding
# (dedup_lsh_pairs), so extreme-asymmetry pairs below the banding's
# Jaccard threshold are out of reach here; a production containment pass
# hashes only the CONTAINED side's shingles (Broder's modified sketch).
# The scale shape is unchanged from dedup_lsh_jaccard_verified: banded
# equi-join for candidates, two (doc, shingle) hash joins for the exact
# check — candidates only, never all-pairs.


def dedup_containment_pairs(spark, sf_dir):
    """(doc_a, doc_b, n_inter, n_a, n_b, cont_ab_micro, cont_ba_micro,
    max_cont_micro): exact directional shingle containment for every LSH
    candidate pair, floored micro-units."""
    cand = dedup_lsh_pairs(spark, sf_dir)
    sh = _shingles2(spark, sf_dir).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "cont_ab_micro",
            F.expr("(n_inter * 1000000) DIV n_a").cast("long"),
        )
        .withColumn(
            "cont_ba_micro",
            F.expr("(n_inter * 1000000) DIV n_b").cast("long"),
        )
        .withColumn(
            "max_cont_micro",
            F.greatest("cont_ab_micro", "cont_ba_micro").cast("long"),
        )
        .select(
            "doc_a", "doc_b", "n_inter", "n_a", "n_b",
            "cont_ab_micro", "cont_ba_micro", "max_cont_micro",
        )
    )


SQL_CONTAINMENT_PAIRS = f"""
WITH sh AS ({_SQL_SHINGLES2}),
hx AS (
  SELECT doc_id, i,
         {_SQL_HASH56.format(col="(i || ':' || shingle)")} AS h
  FROM sh CROSS JOIN (SELECT unnest(range({N_MINHASH})) AS i)
),
sig AS (SELECT doc_id, {_sql_minhash_cols} FROM hx GROUP BY doc_id),
bands AS ({_sql_band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1 AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST((n_inter * 1000000) // sa.n_sh AS BIGINT) AS cont_ab_micro,
       CAST((n_inter * 1000000) // sb.n_sh AS BIGINT) AS cont_ba_micro,
       CAST(greatest((n_inter * 1000000) // sa.n_sh,
                     (n_inter * 1000000) // sb.n_sh) AS BIGINT)
         AS max_cont_micro
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""

QUERIES["dedup_containment_pairs"] = (
    dedup_containment_pairs,
    SQL_CONTAINMENT_PAIRS,
)


# ------------------------------------------------ b-bit minhash (b = 1)

# Li & König (WWW 2010, "b-Bit Minwise Hashing"): storing only the
# LOWEST b bits of each minhash shrinks sketches 64/b-fold; for b = 1
# two docs' bits agree with probability A = J + (1−J)/2, so
# Ĵ = 2A − 1 recovers resemblance from bit agreement. This evaluates
# that estimator against EXACT Jaccard on the bounded labeled subset
# (the dedup_shingle_jaccard quadratic-baseline discipline,
# doc_id < {JACCARD_SUBSET}) with BBIT_K = 24 independent minhashes
# (salt prefix 'b<i>:' keeps them independent of the 6-slot LSH
# signature family — correlated hash families are exactly the
# hll_error_eval trap).
#
# All integer: bits are min-hash % 2; agreement counts are exact int64;
# j_exact_micro = (n_inter·1e6) DIV union; j_est_micro clamps the
# unbiased 2A−1 at 0 ((2·n_agree − K) can go negative on disjoint
# docs — that clamp is part of the estimator, not a fudge).
#
# Scale shape: the sketch is one groupBy(doc_id) with K map-side partial
# mins (the dedup_minhash_signatures plan, K=24 instead of 6); the
# quadratic pair stage is the LABELED bounded baseline — the corpus-wide
# path pairs sketches through banding exactly as dedup_lsh_pairs does.

BBIT_K = 24


def dedup_bbit_minhash_eval(spark, sf_dir):
    """(doc_a, doc_b, n_agree, j_exact_micro, j_est_micro, abs_err_micro):
    1-bit minhash resemblance estimate vs exact Jaccard for every pair of
    the bounded subset with intersecting shingle sets."""
    sh_all = _shingles2(spark, sf_dir).filter(
        F.col("doc_id") < JACCARD_SUBSET
    ).cache()
    bits = sh_all.groupBy("doc_id").agg(
        *[
            (
                F.min(_hash56(F.concat(F.lit(f"b{i}:"), F.col("shingle")))) % 2
            ).cast("long").alias(f"b{i}")
            for i in range(BBIT_K)
        ]
    )
    sizes = sh_all.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_sh")
    )
    sha = sh_all.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh_all.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        sha.join(shb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    ba = bits.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(BBIT_K)],
    )
    bb = bits.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{i}").alias(f"c{i}") for i in range(BBIT_K)],
    )
    agree_expr = " + ".join(
        f"CAST(a{i} = c{i} AS BIGINT)" for i in range(BBIT_K)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ba, "doc_a")
        .join(bb, "doc_b")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_agree", F.expr(agree_expr).cast("long"))
        .withColumn(
            "j_exact_micro",
            F.expr(
                "(n_inter * 1000000) DIV (n_a + n_b - n_inter)"
            ).cast("long"),
        )
        .withColumn(
            "j_est_micro",
            F.expr(
                f"greatest(CAST(0 AS BIGINT),"
                f" ((2 * n_agree - {BBIT_K}) * 1000000) DIV {BBIT_K})"
            ).cast("long"),
        )
        .withColumn(
            "abs_err_micro", F.abs(F.col("j_est_micro") - F.col("j_exact_micro")).cast("long")
        )
        .select(
            "doc_a", "doc_b", "n_agree",
            "j_exact_micro", "j_est_micro", "abs_err_micro",
        )
    )


_sql_bbit_cols = ",\n       ".join(
    f"CAST(min(CASE WHEN i = {i} THEN h END) % 2 AS BIGINT) AS b{i}"
    for i in range(BBIT_K)
)
_sql_bbit_agree = " + ".join(
    f"CAST(ba.b{i} = bb.b{i} AS BIGINT)" for i in range(BBIT_K)
)

SQL_BBIT_MINHASH_EVAL = f"""
WITH sh AS MATERIALIZED (
  SELECT * FROM ({_SQL_SHINGLES2}) WHERE doc_id < {JACCARD_SUBSET}
),
hx AS (
  SELECT doc_id, i,
         {_SQL_HASH56.format(col="('b' || i || ':' || shingle)")} AS h
  FROM sh CROSS JOIN (SELECT unnest(range({BBIT_K})) AS i)
),
bits AS MATERIALIZED (
  SELECT doc_id, {_sql_bbit_cols}
  FROM hx GROUP BY doc_id
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST({_sql_bbit_agree} AS BIGINT) AS n_agree,
       CAST((i.n_inter * 1000000) // (sa.n_sh + sb.n_sh - i.n_inter)
            AS BIGINT) AS j_exact_micro,
       CAST(greatest(0, ((2 * ({_sql_bbit_agree}) - {BBIT_K}) * 1000000)
                        // {BBIT_K}) AS BIGINT) AS j_est_micro,
       CAST(abs(greatest(0, ((2 * ({_sql_bbit_agree}) - {BBIT_K}) * 1000000)
                            // {BBIT_K})
                - (i.n_inter * 1000000) // (sa.n_sh + sb.n_sh - i.n_inter))
            AS BIGINT) AS abs_err_micro
FROM inter i
JOIN bits ba ON ba.doc_id = i.doc_a
JOIN bits bb ON bb.doc_id = i.doc_b
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
"""

QUERIES["dedup_bbit_minhash_eval"] = (
    dedup_bbit_minhash_eval,
    SQL_BBIT_MINHASH_EVAL,
)
