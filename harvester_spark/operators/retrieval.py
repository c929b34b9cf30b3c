"""Retrieval-training and query-understanding operators.

Three classic IR surfaces the reference exposes only through OpenSearch
internals, re-expressed as verifiable (Spark, DuckDB-oracle) pairs:

- ``ft_rm3_expansion`` — RM3/RM1 pseudo-relevance feedback (Lavrenko &
  Croft 2001): the top-10 BM25 feedback documents vote expansion terms with
  weight Σ_d score(d)·tf(t,d)/dl(d). This is the server-side analogue of
  the reference's query-expansion needs (its OpenSearch config relies on
  analyzer synonyms; RM3 is the corpus-driven version a web-scale engine
  runs instead).
- ``hard_negative_mine`` — BM25 hard negatives for bi-encoder / reranker
  training (DPR, Karpukhin et al. 2020): for each (query, positive) pair,
  the top-ranked non-positive documents under the SAME BM25 contract as
  serving. A first-class LLM-retrieval-training component.
- ``ft_more_like_this`` — the reference's More-Like-This API
  (/root/reference/harvester/search/views/document.py similar-documents
  endpoint → OpenSearch ``more_like_this``) as a relational pipeline:
  select the source doc's top-25 interesting terms by tf·idf (Lucene MLT's
  term-selection heuristic), then rank the corpus by the length-normalized
  tf·idf dot product.

Determinism contract (operators/__init__.py): BM25 uses the ONE repo-wide
formula (k1=1.2, b=0.75, Lucene idf — identical expression text to
fulltext_queries.SQL_BM25_TOPK); per-doc float scores are round(.,6)
because double SUM order is engine-dependent; every top-k carries a unique
tie-break (term asc / doc_id asc).

Scale shapes:
- RM3: the feedback set is k=10 rows by construction → broadcast semi-join
  prunes the token scan to 10 documents before any aggregation; the only
  corpus-sized work is the BM25 feedback query itself (already the serving
  plan).
- hard negatives: the query-term dimension (NQ·QLEN ≤ 96 rows) is
  broadcast into the postings join — the classic impact-join; per-query
  top-5 is one window partitioned by q_id (shuffles candidate rows once,
  keyed by query — the fan-out a training-data miner wants to distribute).
- MLT: the source document is ONE row; its term vector (≤25 rows after
  selection) is broadcast, so the corpus-side cost is a single filtered
  tf aggregation + TakeOrdered top-10.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.operators.common import SQL_DOC_TOKS, doc_tokens, load
from harvester_spark.operators.fulltext_queries import (
    BM25_TERMS,
    SQL_BM25_OR_TOPK,
    ft_bm25_or_topk,
)

RM3_N_TERMS = 20  # expansion terms returned
HN_N_QUERIES = 16  # deterministic query set: the 16 smallest doc_ids
HN_Q_LEN = 6  # first 6 distinct tokens (by first position) form the query
HN_TOP_NEG = 5  # negatives kept per query
MLT_MAX_TERMS = 25  # Lucene MLT default max_query_terms
MLT_TOP_K = 10


# ---------------------------------------------------------------- RM3


def ft_rm3_expansion(spark, sf_dir):
    """(rank, term, weight): top-20 RM1 expansion terms for the flagship OR
    query — weight(t) = round(Σ_{d∈top10} bm25(d)·tf(t,d)/dl(d), 6),
    original query terms excluded, ties term asc.

    The feedback top-10 is ``ft_bm25_or_topk`` verbatim (rank identity
    already oracle-gated), so both engines expand from the same documents.
    """
    fb = ft_bm25_or_topk(spark, sf_dir).select("doc_id", "score")
    toks = doc_tokens(spark, sf_dir)
    tf = (
        toks.join(F.broadcast(fb), "doc_id")  # prunes the scan to 10 docs
        .groupBy("doc_id", "score", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    w = (
        tf.join(F.broadcast(dl), "doc_id")
        .filter(~F.col("term").isin(BM25_TERMS))
        .withColumn("contrib", F.col("score") * F.col("tf") / F.col("dl"))
        .groupBy("term")
        .agg(F.round(F.sum("contrib"), 6).alias("weight"))
    )
    top = w.orderBy(F.col("weight").desc(), F.col("term").asc()).limit(RM3_N_TERMS)
    wq = W.orderBy(F.col("weight").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(wq)).select(
        "rank", "term", "weight"
    )


SQL_RM3_EXPANSION = f"""
WITH fb AS MATERIALIZED (
  SELECT doc_id, score FROM ({SQL_BM25_OR_TOPK})
),
toks AS ({SQL_DOC_TOKS}),
tf AS (
  SELECT f.doc_id, f.score, t.term, count(*) AS tf
  FROM toks t JOIN fb f USING (doc_id)
  GROUP BY 1, 2, 3
),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
w AS (
  SELECT term, round(sum(tf.score * tf.tf / dl.dl), 6) AS weight
  FROM tf JOIN dl USING (doc_id)
  WHERE term NOT IN ('key', 'value', 'table')
  GROUP BY term
)
SELECT CAST(row_number() OVER (ORDER BY weight DESC, term ASC) AS INT) AS rank,
       term, weight
FROM w ORDER BY rank LIMIT {RM3_N_TERMS}
"""


# ------------------------------------------------------- hard negatives


def hard_negative_mine(spark, sf_dir):
    """(q_id, rank, neg_doc_id, score): per query, the top-5 BM25-OR ranked
    documents EXCLUDING the positive (the query's own source doc).

    Queries are deterministic: for each of the 16 smallest doc_ids, the
    first HN_Q_LEN distinct tokens by first position. Scoring is the
    repo-wide BM25 formula over whichever query terms a document contains;
    df is the corpus-global document frequency of each query term.
    """
    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)

    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(F.col("p0").asc(), F.col("term").asc())
    qterms = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )  # ≤ 96 rows by construction

    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = docs.select(F.count("*").alias("n")).crossJoin(
        dl.select((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    tf = (
        toks.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .filter(F.col("doc_id") != F.col("q_id"))  # positive excluded
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("q_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    wr = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= HN_TOP_NEG)
        .select("q_id", "rank", F.col("doc_id").alias("neg_doc_id"), "score")
    )


SQL_HARD_NEGATIVES = f"""
WITH toks AS ({SQL_DOC_TOKS}),
qd AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {HN_N_QUERIES}),
first AS (
  SELECT t.doc_id, t.term, min(pos) AS p0
  FROM toks t JOIN qd USING (doc_id) GROUP BY 1, 2
),
qterms AS (
  SELECT doc_id AS q_id, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY p0 ASC, term ASC) AS r
    FROM first
  ) WHERE r <= {HN_Q_LEN}
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0 / count(*) FROM dl) AS avgdl
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qterms) GROUP BY term, doc_id
),
dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.q_id, tf.doc_id,
         round(sum(
           ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS score
  FROM qterms q JOIN tf USING (term) JOIN dfq USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  WHERE tf.doc_id <> q.q_id
  GROUP BY 1, 2
)
SELECT q_id, rank, neg_doc_id, score FROM (
  SELECT q_id,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
         doc_id AS neg_doc_id, score
  FROM scored
) WHERE rank <= {HN_TOP_NEG}
"""


# --------------------------------------------------------------- MLT


def ft_more_like_this(spark, sf_dir):
    """(rank, doc_id, score): top-10 documents most like the smallest-id
    source doc. Term selection = Lucene MLT's heuristic (the source doc's
    top-25 terms by tf·idf, idf = ln((n+1)/(df+1)), ties term asc);
    candidate score = round(Σ_t w(t)·tf_d(t)/dl_d, 6), source excluded.
    """
    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    n_df = F.broadcast(docs.agg(F.count("*").alias("n")))

    src = docs.select("doc_id").orderBy("doc_id").limit(1)
    src_tf = (
        toks.join(F.broadcast(src), "doc_id")
        .groupBy("term")
        .agg(F.count("*").alias("stf"))
    )
    # global df, computed only for the source doc's own terms
    df_ = (
        toks.join(F.broadcast(src_tf.select("term")), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    sel = (
        src_tf.join(df_, "term")
        .crossJoin(n_df)
        .withColumn(
            "w", F.col("stf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
        )
        .orderBy(F.col("w").desc(), F.col("term").asc())
        .limit(MLT_MAX_TERMS)
        .select("term", "w")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tf = (
        toks.join(F.broadcast(sel), "term")
        .groupBy("doc_id", "term", "w")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(src.withColumnRenamed("doc_id", "src_id"), F.col("doc_id") == F.col("src_id"), "left_anti")
        .withColumn("contrib", F.col("w") * F.col("tf") / F.col("dl"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(MLT_TOP_K)
    wr = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "doc_id", "score"
    )


SQL_MORE_LIKE_THIS = f"""
WITH toks AS ({SQL_DOC_TOKS}),
nn AS (SELECT count(*) AS n FROM documents),
src AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 1),
src_tf AS (
  SELECT term, count(*) AS stf FROM toks JOIN src USING (doc_id) GROUP BY term
),
dfq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN (SELECT term FROM src_tf) GROUP BY term
),
sel AS (
  SELECT term, stf * ln((n + 1.0) / (df + 1.0)) AS w
  FROM src_tf JOIN dfq USING (term) CROSS JOIN nn
  ORDER BY w DESC, term ASC LIMIT {MLT_MAX_TERMS}
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
tf AS (
  SELECT doc_id, t.term, w, count(*) AS tf
  FROM toks t JOIN sel USING (term) GROUP BY 1, 2, 3
),
scored AS (
  SELECT tf.doc_id, round(sum(w * tf / dl.dl), 6) AS score
  FROM tf JOIN dl USING (doc_id)
  WHERE tf.doc_id NOT IN (SELECT doc_id FROM src)
  GROUP BY tf.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM scored ORDER BY rank LIMIT {MLT_TOP_K}
"""


QUERIES = {
    "ft_rm3_expansion": (ft_rm3_expansion, SQL_RM3_EXPANSION),
    "hard_negative_mine": (hard_negative_mine, SQL_HARD_NEGATIVES),
    "ft_more_like_this": (ft_more_like_this, SQL_MORE_LIKE_THIS),
}


# ------------------------------------------------------------- percolate

# Reverse search (the OpenSearch/ES *percolator*): a registry of stored
# queries is matched against documents — the "saved search / alerting"
# surface a harvester runs over every fresh crawl batch. Stored queries are
# synthesized deterministically from the corpus itself: the top
# 2·PERC_N_QUERIES vocabulary terms by (df desc, term asc) are paired
# head-with-tail (query i = {t_i, t_{i+N}}; the synthetic corpus vocabulary
# is a fixed 31-word soup at every sf, so N = 12 probes 24 of them), giving
# AND-queries whose
# selectivities genuinely spread (head∧head vs head∧tail) — non-degeneracy
# is test-pinned.
#
# Scale shape: the query registry is broadcast (a percolator registry is
# small by construction — thousands of alerts, not billions); matching is
# one semi-join of the distinct (doc, term) stream against the registry and
# a (qid, doc) count == arity aggregation. Per-query match counts are the
# output — O(#queries) rows, never O(docs).

PERC_N_QUERIES = 12


def ft_percolate(spark, sf_dir):
    """(qid, term_a, term_b, n_matches): #docs matching each stored
    two-term AND query, qid 1..12 in head-with-tail pairing order."""
    toks = doc_tokens(spark, sf_dir)
    dterm = toks.select("doc_id", "term").distinct()
    df_ = dterm.groupBy("term").agg(F.count("*").alias("df"))
    top = (
        df_.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(2 * PERC_N_QUERIES)
    )
    wv = W.orderBy(F.col("df").desc(), F.col("term").asc())
    ranked = top.withColumn("r", F.row_number().over(wv)).select("term", "r")
    qa = ranked.filter(F.col("r") <= PERC_N_QUERIES).select(
        F.col("r").alias("qid"), F.col("term").alias("term_a")
    )
    qb = ranked.filter(F.col("r") > PERC_N_QUERIES).select(
        (F.col("r") - PERC_N_QUERIES).alias("qid"), F.col("term").alias("term_b")
    )
    queries = qa.join(qb, "qid")  # PERC_N_QUERIES rows
    qterms = queries.select("qid", F.col("term_a").alias("term")).union(
        queries.select("qid", F.col("term_b").alias("term"))
    )
    hits = (
        dterm.join(F.broadcast(qterms), "term")
        .groupBy("qid", "doc_id")
        .agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == 2)  # AND semantics
        .groupBy("qid")
        .agg(F.count("*").alias("n_matches"))
    )
    return (
        queries.join(hits, "qid", "left")
        .select(
            "qid",
            "term_a",
            "term_b",
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
        )
    )


SQL_PERCOLATE = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dterm AS (SELECT DISTINCT doc_id, term FROM toks),
df AS (SELECT term, count(*) AS df FROM dterm GROUP BY term),
ranked AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS r
  FROM df ORDER BY r LIMIT {2 * PERC_N_QUERIES}
),
queries AS (
  SELECT a.r AS qid, a.term AS term_a, b.term AS term_b
  FROM ranked a JOIN ranked b ON b.r = a.r + {PERC_N_QUERIES}
  WHERE a.r <= {PERC_N_QUERIES}
),
qterms AS (
  SELECT qid, term_a AS term FROM queries
  UNION ALL SELECT qid, term_b FROM queries
),
hits AS (
  SELECT qid, CAST(count(*) AS BIGINT) AS n_matches FROM (
    SELECT qid, doc_id FROM dterm JOIN qterms USING (term)
    GROUP BY qid, doc_id HAVING count(*) = 2
  ) GROUP BY qid
)
SELECT qid, term_a, term_b,
       CAST(coalesce(n_matches, 0) AS BIGINT) AS n_matches
FROM queries LEFT JOIN hits USING (qid)
"""

QUERIES["ft_percolate"] = (ft_percolate, SQL_PERCOLATE)


# ---------------------------------------------------------- field collapse

# ES/OpenSearch `collapse`: SERP diversity — at most ONE result per source
# host in the top-k (the reference serves faceted portals where one noisy
# host must not fill the page). Relational form: best-doc-per-source window
# on the OR-scored kernel, then the global top-k over the survivors.
#
# Scale shape: the per-source argmax is one window keyed on source (the
# same shuffle a groupBy(source) would pay — host cardinality partitions
# well); the global tail stays TakeOrdered. No new corpus-sized exchange.

COLLAPSE_K = 10


def ft_collapse_topk(spark, sf_dir):
    """(rank, doc_id, source, score): BM25-OR top-10 collapsed to the best
    document per source; ties score desc → doc_id asc everywhere."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    scored = bm25_or_scored(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    wc = W.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    best = (
        scored.join(src, "doc_id")
        .withColumn("rs", F.row_number().over(wc))
        .filter(F.col("rs") == 1)
        .select("doc_id", "source", "score")
    )
    top = best.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(COLLAPSE_K)
    wr = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "doc_id", "source", "score"
    )


def _sql_collapse_topk() -> str:
    # the OR-scored kernel minus its final rank/limit (shared formula text)
    from harvester_spark.operators.fulltext_queries import SQL_BM25_OR_TOPK

    scored_body = SQL_BM25_OR_TOPK.split("SELECT CAST(row_number()")[0].rstrip()
    return f"""{scored_body},
best AS (
  SELECT doc_id, source, score FROM (
    SELECT s.doc_id, d.source, s.score,
           row_number() OVER (
             PARTITION BY d.source ORDER BY s.score DESC, s.doc_id ASC) AS rs
    FROM scored s JOIN documents d USING (doc_id)
  ) WHERE rs = 1
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, source, score
FROM best ORDER BY rank LIMIT {COLLAPSE_K}
"""


QUERIES["ft_collapse_topk"] = (ft_collapse_topk, _sql_collapse_topk())


# ------------------------------------------------------- static pruning

# Static index pruning (Carmel et al., SIGIR'01): keep only each term's
# top-PRUNE_P postings by BM25 impact, discarding the long low-impact tail —
# the standard way a web index trades disk/latency for a bounded quality
# loss. The output IS the pruned posting list (term, doc_id, tf, impact),
# so the oracle gate proves both engines select the IDENTICAL index, not
# just the same counts. Impact is the posting's full BM25 contribution
# (idf · tf-saturation · length-norm) — bit-identical per row from integer
# inputs; ties doc_id asc; PRUNE_P=100 < df of every flagship term at every
# sf, so pruning genuinely binds (test-pinned).
#
# Scale shape: tf/df/dl aggregation is the postings-build plan; the
# per-term top-P is one window keyed on term — exactly the impact-ordered
# index-build shuffle (terms partition well; a head term's postings fit an
# executor at P rows post-filter because row_number short-circuits nothing
# BUT the filter keeps only P rows per term downstream).

PRUNE_P = 100


def ft_static_prune(spark, sf_dir):
    """(term, doc_id, tf, impact): each flagship term's top-100 postings by
    BM25 impact — the pruned index a static-pruning pass would keep."""
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
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    wp = W.partitionBy("term").orderBy(F.col("impact").desc(), F.col("doc_id").asc())
    return (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "impact",
            F.round(
                F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
                6,
            ),
        )
        .withColumn("rp", F.row_number().over(wp))
        .filter(F.col("rp") <= PRUNE_P)
        .select("term", "doc_id", "tf", "impact")
    )


SQL_STATIC_PRUNE = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0 / count(*) FROM dl) AS avgdl
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY term, doc_id
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
impacts AS (
  SELECT tf.term, tf.doc_id, tf.tf,
         round(
           ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6
         ) AS impact
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT term, doc_id, tf, impact FROM (
  SELECT *, row_number() OVER (
    PARTITION BY term ORDER BY impact DESC, doc_id ASC) AS rp
  FROM impacts
) WHERE rp <= {PRUNE_P}
"""

QUERIES["ft_static_prune"] = (ft_static_prune, SQL_STATIC_PRUNE)


# ------------------------------------------------------ proximity distance

# Minimal pair distance (the proximity signal behind sloppy-phrase RANKING,
# as opposed to slop MATCHING which ft_phrase_slop covers): for every doc
# containing both probe terms, the minimum token distance between an
# occurrence of each. Uses the classic merged-order identity: the minimum
# |pa - pb| over all cross pairs is always achieved by two positions that
# are ADJACENT in the merged position order — so one lag() window keyed on
# doc_id replaces the quadratic cross join of occurrence lists.
#
# Scale shape: filter to the two terms' occurrences (predicate reaches the
# scan), one doc_id-keyed window, one groupBy(doc_id). O(occurrences), not
# O(tf_a · tf_b) per doc.

PROX_A, PROX_B = "table", "hash"  # == ft_phrase_match's probe pair


def ft_min_pair_distance(spark, sf_dir):
    """(doc_id, n_a, n_b, min_dist) for docs containing BOTH probe terms;
    min_dist >= 1 (adjacent tokens) by tokenizer construction."""
    occ = (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term").isin([PROX_A, PROX_B]))
        .select("doc_id", "term", "pos")
    )
    wd = W.partitionBy("doc_id").orderBy("pos")
    dists = (
        occ.withColumn("pterm", F.lag("term").over(wd))
        .withColumn("ppos", F.lag("pos").over(wd))
        .filter(F.col("pterm").isNotNull() & (F.col("pterm") != F.col("term")))
        .groupBy("doc_id")
        .agg(F.min(F.col("pos") - F.col("ppos")).cast("long").alias("min_dist"))
    )
    counts = occ.groupBy("doc_id").agg(
        F.sum(F.when(F.col("term") == PROX_A, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("term") == PROX_B, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    return (
        counts.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .join(dists, "doc_id")
        .select("doc_id", "n_a", "n_b", "min_dist")
    )


SQL_MIN_PAIR_DISTANCE = f"""
WITH toks AS ({SQL_DOC_TOKS}),
occ AS (
  SELECT doc_id, term, pos FROM toks WHERE term IN ('{PROX_A}', '{PROX_B}')
),
lagged AS (
  SELECT doc_id, term, pos,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS pterm,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS ppos
  FROM occ
),
dists AS (
  SELECT doc_id, CAST(min(pos - ppos) AS BIGINT) AS min_dist
  FROM lagged WHERE pterm IS NOT NULL AND pterm <> term
  GROUP BY doc_id
),
counts AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN term = '{PROX_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN term = '{PROX_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM occ GROUP BY doc_id
)
SELECT doc_id, n_a, n_b, min_dist
FROM counts JOIN dists USING (doc_id)
WHERE n_a > 0 AND n_b > 0
"""

QUERIES["ft_min_pair_distance"] = (ft_min_pair_distance, SQL_MIN_PAIR_DISTANCE)


# ------------------------------------------------------ MMR diversification

# Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) — the SERP /
# training-data diversity reranker: greedily pick K documents maximizing
# λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) over a bounded candidate pool. The
# relevance leg is the repo's ONE BM25 OR kernel; the similarity leg is
# embedding cosine over the vec_id ≡ doc_id convention (hybrid_rrf_topk).
#
# Determinism: the greedy argmax is taken over INTEGERS — rel_micro =
# round(1e6·score) of the already-round(.,6) BM25 score, cos_micro via the
# floor(x·1e6+0.5) idiom in ONE shared expression string, and the
# objective obj = 7·rel_micro − 3·maxsim_micro (λ = 0.7 scaled by 10, kept
# as an exact integer) — so the pick sequence is bit-identical across
# engines; ties break doc_id asc. The DuckDB oracle unrolls the K greedy
# steps as MATERIALIZED CTEs (the k-means/pagerank contract).
#
# Scale shape: the candidate pool is MMR_C rows by CONSTRUCTION (TakeOrdered
# over the corpus-sized OR scoring — the serving plan), so everything after
# the cut is O(C²·dim) work on broadcast-sized frames: the pos-keyed
# component join runs over C vectors only (semi-join prune first), and each
# greedy step is one broadcast semi/anti join + a C-row TakeOrdered.
# Nothing corpus-sized is ever iterated; localCheckpoint materializes each
# pick so the K-step loop doesn't re-execute the candidate query.

MMR_C = 20
MMR_K = 5
_MMR_COS_MICRO = "CAST(floor(dot / (na * nb) * 1.0e6 + 0.5e0) AS BIGINT)"


def ft_mmr_topk(spark, sf_dir):
    """(pick, doc_id, rel_micro, maxsim_micro, obj): the K MMR picks in
    greedy order from the top-MMR_C BM25-OR pool, λ = 0.7."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored
    from harvester_spark.operators.similarity import _components

    cand = (
        bm25_or_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(MMR_C)
        .select(
            "doc_id",
            F.expr("CAST(round(score * 1.0e6, 0) AS BIGINT)").alias("rel_micro"),
        )
        .cache()
    )
    ids = F.broadcast(cand.select(F.col("doc_id").alias("vec_id")))
    comp = _components(spark, sf_dir).join(ids, "vec_id", "semi")
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    a = comp.select(F.col("vec_id").alias("va"), "pos", F.col("val").alias("xa"))
    b = comp.select(F.col("vec_id").alias("vb"), "pos", F.col("val").alias("xb"))
    sims = (
        a.join(b, "pos")
        .filter(F.col("va") != F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"))
        .join(
            F.broadcast(
                norms.select(F.col("vec_id").alias("va"), F.col("nrm").alias("na"))
            ),
            "va",
        )
        .join(
            F.broadcast(
                norms.select(F.col("vec_id").alias("vb"), F.col("nrm").alias("nb"))
            ),
            "vb",
        )
        .select("va", "vb", F.expr(_MMR_COS_MICRO).alias("cos_micro"))
        .cache()
    )
    picks = (
        cand.orderBy(F.col("rel_micro").desc(), F.col("doc_id").asc())
        .limit(1)
        .select(
            F.lit(1).alias("pick"),
            "doc_id",
            "rel_micro",
            F.lit(0).cast("long").alias("maxsim_micro"),
            (F.col("rel_micro") * 7).cast("long").alias("obj"),
        )
        .localCheckpoint()
    )
    for k in range(2, MMR_K + 1):
        sel = F.broadcast(picks.select("doc_id"))
        ms = (
            sims.join(sel.withColumnRenamed("doc_id", "vb"), "vb", "semi")
            .join(sel.withColumnRenamed("doc_id", "va"), "va", "anti")
            .groupBy("va")
            .agg(F.max("cos_micro").cast("long").alias("maxsim_micro"))
            .withColumnRenamed("va", "doc_id")
        )
        nxt = (
            cand.join(ms, "doc_id")
            .select(
                F.lit(k).alias("pick"),
                "doc_id",
                "rel_micro",
                "maxsim_micro",
                (F.col("rel_micro") * 7 - F.col("maxsim_micro") * 3)
                .cast("long")
                .alias("obj"),
            )
            .orderBy(F.col("obj").desc(), F.col("doc_id").asc())
            .limit(1)
            .localCheckpoint()
        )
        picks = picks.unionByName(nxt)
    return picks


def _sql_mmr() -> str:
    cand = f"""
toks AS ({SQL_DOC_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0 / count(*) FROM dl) AS avgdl
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY term, doc_id
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         round(sum(
           ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
),
cand AS MATERIALIZED (
  SELECT doc_id, CAST(round(score * 1.0e6, 0) AS BIGINT) AS rel_micro
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT {MMR_C}
),
comp AS (
  SELECT vec_id, unnest(range(len(embedding))) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings WHERE vec_id IN (SELECT doc_id FROM cand)
),
norms AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM comp GROUP BY vec_id),
sims AS MATERIALIZED (
  SELECT va, vb, {_MMR_COS_MICRO} AS cos_micro FROM (
    SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.val * b.val) AS dot,
           any_value(na.nrm) AS na, any_value(nb.nrm) AS nb
    FROM comp a JOIN comp b ON a.pos = b.pos AND a.vec_id <> b.vec_id
    JOIN norms na ON na.vec_id = a.vec_id
    JOIN norms nb ON nb.vec_id = b.vec_id
    GROUP BY 1, 2
  )
),
s1 AS MATERIALIZED (
  SELECT CAST(1 AS INT) AS pick, doc_id, rel_micro,
         CAST(0 AS BIGINT) AS maxsim_micro,
         CAST(rel_micro * 7 AS BIGINT) AS obj
  FROM cand ORDER BY rel_micro DESC, doc_id ASC LIMIT 1
),
sel1 AS (SELECT doc_id FROM s1)"""
    parts = ["WITH " + cand.strip()]
    for k in range(2, MMR_K + 1):
        parts.append(
            f""",
s{k} AS MATERIALIZED (
  SELECT CAST({k} AS INT) AS pick, c.doc_id AS doc_id, c.rel_micro AS rel_micro,
         m.ms AS maxsim_micro,
         CAST(c.rel_micro * 7 - m.ms * 3 AS BIGINT) AS obj
  FROM cand c JOIN (
    SELECT va AS doc_id, CAST(max(cos_micro) AS BIGINT) AS ms
    FROM sims
    WHERE vb IN (SELECT doc_id FROM sel{k - 1})
      AND va NOT IN (SELECT doc_id FROM sel{k - 1})
    GROUP BY va
  ) m ON m.doc_id = c.doc_id
  ORDER BY obj DESC, c.doc_id ASC LIMIT 1
),
sel{k} AS (SELECT doc_id FROM sel{k - 1} UNION ALL SELECT doc_id FROM s{k})"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT pick, doc_id, rel_micro, maxsim_micro, obj FROM s{k}"
        for k in range(1, MMR_K + 1)
    )
    parts.append("\n" + union)
    return "".join(parts)


QUERIES["ft_mmr_topk"] = (ft_mmr_topk, _sql_mmr())

# ------------------------------------------------------------- rank eval

# The Ranking Evaluation API (OpenSearch/Elasticsearch `_rank_eval`, the
# reference's search backend exposes it next to the search surfaces the
# repo already mirrors): nDCG@10 of the serving BM25 ranking against
# graded qrels, per query of the SAME deterministic 16-query registry as
# hard_negative_mine. Qrels are corpus-derived AND phrase-aware — BM25 is
# order-blind, so adjacency grading genuinely separates ranking from
# judgment (a term-overlap grade saturates to nDCG == 1.0 on this corpus
# and proves nothing — the degenerate-synthesis trap):
#   rel 3  — the query's first two terms occur ADJACENT in the doc,
#   rel 2  — both terms occur (any positions),
#   rel 1  — any query term occurs (every scored doc).
#
# DCG addends are computed PER RANK as integers — gain(rel)/log2(rnk+1)
# = (2^rel − 1)·ln2/ln(rnk+1) in micro-units via one shared expression
# string — so each query's DCG/IDCG is an exact int64 sum (float SUM
# order never matters); nDCG is then a round(.,6) ratio of two exact
# integers. The ideal ranking orders by (rel desc, doc_id asc): tie order
# among equal grades cannot change IDCG's value.
#
# Scale shape: the hard_negative_mine plan plus two broadcast 16-row
# phrase legs (toks ⋈ t1, toks ⋈ t2, adjacency = pos equi-join within
# (q, doc)); per-query top-10 is a q_id-keyed window; output is 16 rows.

NDCG_K = 10
_NDCG_ADDEND = (
    "CAST(floor((power(2.0e0, rel) - 1.0e0) * ln(2.0e0)"
    " / ln(rnk + 1.0e0) * 1.0e6 + 0.5e0) AS BIGINT)"
)


def _graded_ranking(spark, sf_dir):
    """(q_id, doc_id, score, rel): BM25 score + phrase-aware grade for
    every (registry query, matching doc) — shared by the nDCG and
    precision/MRR rank-eval metrics."""
    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)

    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(F.col("p0").asc(), F.col("term").asc())
    qsel = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term", "r")
    )
    qterms = qsel.select("q_id", "term")

    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = docs.select(F.count("*").alias("n")).crossJoin(
        dl.select((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    tf = (
        toks.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("q_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )

    t1 = toks.join(
        F.broadcast(qsel.filter(F.col("r") == 1).select("q_id", "term")), "term"
    ).select("q_id", "doc_id", "pos")
    t2 = toks.join(
        F.broadcast(qsel.filter(F.col("r") == 2).select("q_id", "term")), "term"
    ).select(
        F.col("q_id").alias("q2"), F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
    )
    t1d = t1.select("q_id", "doc_id").distinct()
    t2d = t2.select(F.col("q2").alias("q_id"), F.col("d2").alias("doc_id")).distinct()
    both_ = t1d.join(t2d, ["q_id", "doc_id"], "semi").withColumn("b2", F.lit(1))
    adj = (
        t1.join(
            t2,
            (F.col("q_id") == F.col("q2"))
            & (F.col("doc_id") == F.col("d2"))
            & (F.col("p2") == F.col("pos") + 1),
        )
        .select("q_id", "doc_id")
        .distinct()
        .withColumn("b3", F.lit(1))
    )
    return (
        scored.join(both_, ["q_id", "doc_id"], "left")
        .join(adj, ["q_id", "doc_id"], "left")
        .withColumn(
            "rel",
            (1 + F.coalesce(F.col("b2"), F.lit(0)) + F.coalesce(F.col("b3"), F.lit(0)))
            .cast("long"),
        )
        .select("q_id", "doc_id", "score", "rel")
    )


def ft_rank_eval_ndcg(spark, sf_dir):
    """(q_id, dcg_micro, idcg_micro, ndcg): nDCG@10 of the BM25-OR serving
    ranking vs phrase-aware graded qrels, for the 16 registry queries."""
    graded = _graded_ranking(spark, sf_dir)
    wr = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    dcg = (
        graded.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("dcg_micro"))
    )
    wi = W.partitionBy("q_id").orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    idcg = (
        graded.withColumn("rnk", F.row_number().over(wi))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("idcg_micro"))
    )
    return dcg.join(idcg, "q_id").select(
        "q_id",
        "dcg_micro",
        "idcg_micro",
        F.round(F.col("dcg_micro") * 1.0 / F.col("idcg_micro"), 6).alias("ndcg"),
    )


_SQL_GRADED_PREFIX = f"""
WITH toks AS ({SQL_DOC_TOKS}),
qd AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {HN_N_QUERIES}),
first AS (
  SELECT t.doc_id, t.term, min(pos) AS p0
  FROM toks t JOIN qd USING (doc_id) GROUP BY 1, 2
),
qsel AS (
  SELECT doc_id AS q_id, term, r FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY p0 ASC, term ASC) AS r
    FROM first
  ) WHERE r <= {HN_Q_LEN}
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0 / count(*) FROM dl) AS avgdl
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qsel) GROUP BY term, doc_id
),
dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.q_id, tf.doc_id,
         round(sum(
           ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS score
  FROM qsel q JOIN tf USING (term) JOIN dfq USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY 1, 2
),
t1 AS (
  SELECT q_id, t.doc_id, pos FROM toks t
  JOIN qsel s ON t.term = s.term AND s.r = 1
),
t2 AS (
  SELECT q_id, t.doc_id, pos FROM toks t
  JOIN qsel s ON t.term = s.term AND s.r = 2
),
both_ AS (
  SELECT DISTINCT q_id, doc_id FROM t1
  INTERSECT
  SELECT DISTINCT q_id, doc_id FROM t2
),
adj AS (
  SELECT DISTINCT t1.q_id, t1.doc_id
  FROM t1 JOIN t2 ON t1.q_id = t2.q_id AND t1.doc_id = t2.doc_id
                 AND t2.pos = t1.pos + 1
),
graded AS (
  SELECT s.q_id, s.doc_id, s.score,
         CAST(1 + (b.q_id IS NOT NULL)::INT + (a.q_id IS NOT NULL)::INT
              AS BIGINT) AS rel
  FROM scored s
  LEFT JOIN both_ b ON b.q_id = s.q_id AND b.doc_id = s.doc_id
  LEFT JOIN adj a ON a.q_id = s.q_id AND a.doc_id = s.doc_id
)"""

SQL_RANK_EVAL_NDCG = _SQL_GRADED_PREFIX + f""",
dcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_micro FROM (
    SELECT q_id, rel,
           row_number() OVER (
             PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
),
idcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS idcg_micro FROM (
    SELECT q_id, rel,
           row_number() OVER (
             PARTITION BY q_id ORDER BY rel DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
)
SELECT q_id, dcg_micro, idcg_micro,
       round(dcg_micro * 1.0 / idcg_micro, 6) AS ndcg
FROM dcg JOIN idcg USING (q_id)
"""

QUERIES["ft_rank_eval_ndcg"] = (ft_rank_eval_ndcg, SQL_RANK_EVAL_NDCG)


# Precision@10 and MRR@10 over the same graded ranking — the other two
# metrics the `_rank_eval` API ships (precision / mean_reciprocal_rank
# metric blocks). "Relevant" = rel == 3 (the phrase grade; rel >= 2 saturates precision to 1.0 on this corpus and proves nothing); the
# reciprocal rank is integer micro-units from an INTEGER rank, and
# queries with no relevant doc in the top 10 report 0 (the API's
# convention), kept via a left join from the query spine.


def ft_rank_eval_prk(spark, sf_dir):
    """(q_id, n_rel_at10, prec_at10, rr_micro): precision@10 and
    reciprocal rank (micro-units) of the first rel==3 doc per registry
    query."""
    graded = _graded_ranking(spark, sf_dir)
    wr = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    top = graded.withColumn("rnk", F.row_number().over(wr)).filter(
        F.col("rnk") <= NDCG_K
    )
    hits = (
        top.filter(F.col("rel") >= 3)
        .groupBy("q_id")
        .agg(
            F.count("*").cast("long").alias("n_rel_at10"),
            F.min("rnk").alias("first_rnk"),
        )
    )
    qs = graded.select("q_id").distinct()
    return qs.join(hits, "q_id", "left").select(
        "q_id",
        F.coalesce(F.col("n_rel_at10"), F.lit(0)).cast("long").alias("n_rel_at10"),
        F.round(
            F.coalesce(F.col("n_rel_at10"), F.lit(0)) / F.lit(10.0), 6
        ).alias("prec_at10"),
        F.coalesce(
            F.expr("CAST(floor(1.0e6 / first_rnk + 0.5e0) AS BIGINT)"),
            F.lit(0).cast("long"),
        ).alias("rr_micro"),
    )


SQL_RANK_EVAL_PRK = _SQL_GRADED_PREFIX + f""",
top AS (
  SELECT q_id, rel,
         row_number() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS rnk
  FROM graded
),
hits AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel_at10,
         CAST(min(rnk) AS BIGINT) AS first_rnk
  FROM top WHERE rnk <= {NDCG_K} AND rel >= 3 GROUP BY q_id
),
qs AS (SELECT DISTINCT q_id FROM graded)
SELECT qs.q_id AS q_id,
       CAST(coalesce(n_rel_at10, 0) AS BIGINT) AS n_rel_at10,
       round(coalesce(n_rel_at10, 0) / 10.0e0, 6) AS prec_at10,
       coalesce(CAST(floor(1.0e6 / first_rnk + 0.5e0) AS BIGINT),
                CAST(0 AS BIGINT)) AS rr_micro
FROM qs LEFT JOIN hits ON hits.q_id = qs.q_id
"""

QUERIES["ft_rank_eval_prk"] = (ft_rank_eval_prk, SQL_RANK_EVAL_PRK)


# ------------------------------------------- rank eval: MAP / ERR / RBP

# The remaining `_rank_eval` metric blocks next to nDCG and precision/MRR:
# mean_average_precision, expected_reciprocal_rank (Chapelle et al. 2009),
# and rank-biased precision (Moffat & Zobel 2008, p = 4/5) — the standard
# graded-judgment eval battery a relevance team runs on the same qrels.
# Same 16-query registry, same phrase-aware graded ranking
# (_graded_ranking), "relevant" for the binary metrics = rel == 3 (the
# phrase grade — rel >= 2 saturates on this corpus and proves nothing,
# the ft_rank_eval_prk precedent).
#
# Every metric is an EXACT integer rational, no floats anywhere:
# - AP@10: P@r = cum_rel/r; each relevant rank contributes
#   cum_rel·(2520/r) with 2520 = lcm(1..10), so the per-query numerator
#   is an exact int and ap_micro = num·1e6 DIV (2520·min(R,10)).
# - ERR@10 with grades g ∈ {1,2,3}: R_r = (2^g−1)/8, and the stopping
#   product Π_{i<r}(1−R_i) has numerator 7^a·5^b·1^c where (a,b,c) are
#   the cumulative grade counts BEFORE rank r — so over the common
#   denominator D = 2520·8^10 each rank contributes
#   g_num·7^a·5^b·(2520 DIV r)·8^(10−r), max 2.4e12, sum ≤ D ≈ 2.7e12,
#   and err_micro = sum·1e6 DIV D stays under int64 (2.7e18 < 9.2e18).
# - RBP@10 (p=4/5): term (1−p)p^(r−1) = 4^(r−1)/5^r; over D = 5^10 each
#   relevant rank contributes 4^(r−1)·5^(10−r) (the truncated-at-k lower
#   bound, the metric's standard reported form).
# Integer powers go through CAST(round(power(..)) AS BIGINT) — the true
# values are integers < 2^53, so round() absorbs any libm ulp and both
# engines agree bit-for-bit.
#
# Scale shape: everything downstream of _graded_ranking (whose plan is
# the hard_negative_mine impact join) is two q_id-keyed windows over ≤
# 16·10 rows — nothing new touches the corpus.

_LCM10 = 2520
_ERR_DEN = _LCM10 * 8**NDCG_K
_RBP_DEN = 5**NDCG_K

# cumulative-count columns a (rel==1 before r) / b (rel==2 before r) and
# the rank rnk are exact ints; one shared contribution string per metric.
_ERR_CONTRIB = (
    "CAST((CAST(round(power(2.0e0, rel)) AS BIGINT) - 1)"
    " * CAST(round(power(7.0e0, a)) AS BIGINT)"
    " * CAST(round(power(5.0e0, b)) AS BIGINT)"
    f" * ({_LCM10} {{div}} rnk)"
    f" * CAST(round(power(8.0e0, {NDCG_K} - rnk)) AS BIGINT) AS BIGINT)"
)
_RBP_CONTRIB = (
    "CAST((CASE WHEN rel >= 3 THEN 1 ELSE 0 END)"
    " * CAST(round(power(4.0e0, rnk - 1)) AS BIGINT)"
    f" * CAST(round(power(5.0e0, {NDCG_K} - rnk)) AS BIGINT) AS BIGINT)"
)


def ft_rank_eval_map(spark, sf_dir):
    """(q_id, n_rel_total, n_rel_at10, ap_micro): average precision@10 of
    the BM25 serving ranking vs the phrase qrels (rel == 3 relevant),
    exact integer micro-units, 0 for queries with no relevant doc."""
    graded = _graded_ranking(spark, sf_dir)
    wr = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = graded.withColumn("rnk", F.row_number().over(wr)).withColumn(
        "rel3", (F.col("rel") >= 3).cast("long")
    )
    wc = (
        W.partitionBy("q_id")
        .orderBy("rnk")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    top = ranked.filter(F.col("rnk") <= NDCG_K).withColumn(
        "cum", F.sum("rel3").over(wc)
    )
    ap = (
        top.filter(F.col("rel3") == 1)
        .withColumn("c", F.expr(f"cum * ({_LCM10} DIV rnk)"))
        .groupBy("q_id")
        .agg(
            F.sum("c").cast("long").alias("ap_num"),
            F.count("*").cast("long").alias("n_rel_at10"),
        )
    )
    rtot = graded.groupBy("q_id").agg(
        F.sum((F.col("rel") >= 3).cast("long")).cast("long").alias("n_rel_total")
    )
    return rtot.join(ap, "q_id", "left").select(
        "q_id",
        "n_rel_total",
        F.coalesce("n_rel_at10", F.lit(0)).cast("long").alias("n_rel_at10"),
        F.expr(
            f"CAST(coalesce(ap_num, 0) * 1000000 DIV "
            f"({_LCM10} * greatest(least(n_rel_total, {NDCG_K}), 1)) AS BIGINT)"
        ).alias("ap_micro"),
    )


SQL_RANK_EVAL_MAP = _SQL_GRADED_PREFIX + f""",
ranked AS (
  SELECT q_id, rel,
         CASE WHEN rel >= 3 THEN 1 ELSE 0 END AS rel3,
         row_number() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS rnk
  FROM graded
),
top AS (
  SELECT q_id, rel3, rnk,
         sum(rel3) OVER (PARTITION BY q_id ORDER BY rnk
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM ranked WHERE rnk <= {NDCG_K}
),
ap AS (
  SELECT q_id, CAST(sum(cum * ({_LCM10} // rnk)) AS BIGINT) AS ap_num,
         CAST(count(*) AS BIGINT) AS n_rel_at10
  FROM top WHERE rel3 = 1 GROUP BY q_id
),
rtot AS (
  SELECT q_id,
         CAST(sum(CASE WHEN rel >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rel_total
  FROM graded GROUP BY q_id
)
SELECT r.q_id AS q_id, r.n_rel_total AS n_rel_total,
       CAST(coalesce(a.n_rel_at10, 0) AS BIGINT) AS n_rel_at10,
       CAST(coalesce(a.ap_num, 0) * 1000000 //
            ({_LCM10} * greatest(least(r.n_rel_total, {NDCG_K}), 1))
         AS BIGINT) AS ap_micro
FROM rtot r LEFT JOIN ap a ON a.q_id = r.q_id
"""

QUERIES["ft_rank_eval_map"] = (ft_rank_eval_map, SQL_RANK_EVAL_MAP)


def ft_rank_eval_err_rbp(spark, sf_dir):
    """(q_id, err_micro, rbp_micro): ERR@10 (graded cascade) and RBP@10
    (p = 4/5, rel == 3 relevant) of the BM25 serving ranking — exact
    integer rationals over denominators 2520·8^10 and 5^10."""
    graded = _graded_ranking(spark, sf_dir)
    wr = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = graded.withColumn("rnk", F.row_number().over(wr)).filter(
        F.col("rnk") <= NDCG_K
    )
    wprev = W.partitionBy("q_id").orderBy("rnk").rowsBetween(
        W.unboundedPreceding, -1
    )
    cum = ranked.withColumn(
        "a", F.coalesce(F.sum((F.col("rel") == 1).cast("long")).over(wprev), F.lit(0))
    ).withColumn(
        "b", F.coalesce(F.sum((F.col("rel") == 2).cast("long")).over(wprev), F.lit(0))
    )
    agg = cum.groupBy("q_id").agg(
        F.sum(F.expr(_ERR_CONTRIB.format(div="DIV"))).cast("long").alias("err_num"),
        F.sum(F.expr(_RBP_CONTRIB)).cast("long").alias("rbp_num"),
    )
    return agg.select(
        "q_id",
        F.expr(f"CAST(err_num * 1000000 DIV {_ERR_DEN} AS BIGINT)").alias(
            "err_micro"
        ),
        F.expr(f"CAST(rbp_num * 1000000 DIV {_RBP_DEN} AS BIGINT)").alias(
            "rbp_micro"
        ),
    )


SQL_RANK_EVAL_ERR_RBP = _SQL_GRADED_PREFIX + f""",
ranked AS (
  SELECT q_id, rel,
         row_number() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS rnk
  FROM graded
),
cum AS (
  SELECT q_id, rel, rnk,
         coalesce(sum(CASE WHEN rel = 1 THEN 1 ELSE 0 END) OVER (
           PARTITION BY q_id ORDER BY rnk
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a,
         coalesce(sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END) OVER (
           PARTITION BY q_id ORDER BY rnk
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
  FROM ranked WHERE rnk <= {NDCG_K}
),
agg AS (
  SELECT q_id,
         CAST(sum({_ERR_CONTRIB.format(div='//')}) AS BIGINT) AS err_num,
         CAST(sum({_RBP_CONTRIB}) AS BIGINT) AS rbp_num
  FROM cum GROUP BY q_id
)
SELECT q_id,
       CAST(err_num * 1000000 // {_ERR_DEN} AS BIGINT) AS err_micro,
       CAST(rbp_num * 1000000 // {_RBP_DEN} AS BIGINT) AS rbp_micro
FROM agg
"""

QUERIES["ft_rank_eval_err_rbp"] = (ft_rank_eval_err_rbp, SQL_RANK_EVAL_ERR_RBP)


# ------------------------------------------------ BM25 parameter sweep

# Relevance-engineering's bread and butter: sweep BM25's (k1, b) over a
# small grid and score each point by mean nDCG@10 against the SAME
# phrase-aware qrels the rank-eval family uses — judgments don't depend
# on the scorer, so ONE corpus scan scores EVERY grid point (the grid
# rides the component join as a broadcast VALUES dimension; this is the
# plan a 100 TB tuning job needs — grid size multiplies the aggregation,
# never the scan). The serving default (k1=1.2, b=0.75) must appear in
# the grid so the sweep is anchored to ft_rank_eval_ndcg.
#
# Determinism: per-(grid, query, doc) scores are round(.,6) doubles from
# ONE shared parameterized formula string (k1/b arrive as integer milli
# columns), then quantize to micro; DCG addends reuse the integer
# _NDCG_ADDEND; per-query nDCG and the grid mean are exact integer
# ratios.

BM25_GRID = [(800, 250), (800, 750), (1200, 250), (1200, 750), (2000, 250), (2000, 750)]
_GRID_CONTRIB = (
    "ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))"
    " * (tf * (k1m / 1000.0e0 + 1.0e0))"
    " / (tf + (k1m / 1000.0e0) * (1.0e0 - bm / 1000.0e0"
    " + (bm / 1000.0e0) * dl / avgdl))"
)


def bm25_grid_tune_eval(spark, sf_dir):
    """(k1_milli, b_milli, n_queries, mean_ndcg_micro): mean nDCG@10 of
    each BM25 grid point over the 16-query registry's phrase qrels."""
    graded = _graded_ranking(spark, sf_dir).select("q_id", "doc_id", "rel").cache()

    # rebuild raw components (tf, df, dl, n, avgdl) for the registry terms
    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(F.col("p0").asc(), F.col("term").asc())
    qterms = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = docs.select(F.count("*").alias("n")).crossJoin(
        dl.select((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    tf = (
        toks.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    grid = spark.createDataFrame(
        [(k, b) for k, b in BM25_GRID], "k1m long, bm long"
    )
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(grid))
        .withColumn("contrib", F.expr(_GRID_CONTRIB))
        .groupBy("k1m", "bm", "q_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    wr = W.partitionBy("k1m", "bm", "q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    dcg = (
        scored.join(graded, ["q_id", "doc_id"])
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("k1m", "bm", "q_id")
        .agg(F.sum("addend").cast("long").alias("dcg_micro"))
    )
    wi = W.partitionBy("q_id").orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    idcg = (
        graded.withColumn("rnk", F.row_number().over(wi))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("idcg_micro"))
    )
    return (
        dcg.join(F.broadcast(idcg), "q_id")
        .withColumn(
            "ndcg_micro",
            F.expr("CAST(dcg_micro * 1000000 DIV idcg_micro AS BIGINT)"),
        )
        .groupBy("k1m", "bm")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.expr("CAST(sum(ndcg_micro) DIV count(*) AS BIGINT)").alias(
                "mean_ndcg_micro"
            ),
        )
        .select(
            F.col("k1m").alias("k1_milli"),
            F.col("bm").alias("b_milli"),
            "n_queries",
            "mean_ndcg_micro",
        )
    )


def _sql_grid_tune() -> str:
    gvals = ", ".join(f"({k}, {b})" for k, b in BM25_GRID)
    return (
        _SQL_GRADED_PREFIX
        + f""",
grid AS (SELECT * FROM (VALUES {gvals}) g(k1m, bm)),
gscored AS (
  SELECT k1m, bm, q.q_id, tf.doc_id,
         round(sum({_GRID_CONTRIB
                    .replace('(n - df', '(stats.n - dfq.df')
                    .replace('(df + 0.5e0)', '(dfq.df + 0.5e0)')
                    .replace('(tf *', '(tf.tf *')
                    .replace('(tf +', '(tf.tf +')
                    .replace('* dl /', '* dl.dl /')
                    .replace('/ avgdl', '/ stats.avgdl')}), 6) AS score
  FROM qsel q JOIN tf USING (term) JOIN dfq USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats CROSS JOIN grid
  GROUP BY 1, 2, 3, 4
),
gdcg AS (
  SELECT k1m, bm, q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_micro
  FROM (
    SELECT s.k1m, s.bm, s.q_id, g.rel,
           row_number() OVER (PARTITION BY s.k1m, s.bm, s.q_id
                              ORDER BY s.score DESC, s.doc_id ASC) AS rnk
    FROM gscored s JOIN graded g ON g.q_id = s.q_id AND g.doc_id = s.doc_id
  ) WHERE rnk <= {NDCG_K} GROUP BY 1, 2, 3
),
gidcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS idcg_micro FROM (
    SELECT q_id, rel,
           row_number() OVER (
             PARTITION BY q_id ORDER BY rel DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
)
SELECT CAST(k1m AS BIGINT) AS k1_milli, CAST(bm AS BIGINT) AS b_milli,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(dcg_micro * 1000000 // idcg_micro) // count(*) AS BIGINT)
         AS mean_ndcg_micro
FROM gdcg JOIN gidcg USING (q_id)
GROUP BY 1, 2
"""
    )


QUERIES["bm25_grid_tune_eval"] = (bm25_grid_tune_eval, _sql_grid_tune())


# ------------------------------------------------ cascade ranking eval

# Multi-stage cascade evaluation (Wang, Lin & Metzler, SIGIR 2011): a
# cheap stage-1 feature (query-term match COUNT — no tf, no idf, no
# length norm; the cheapest boolean signal an index answers) prunes to
# {CASCADE_C} candidates per query, and the expensive BM25 stage-2 runs
# only on the survivors. The eval prices the trade: per registry query,
# stage-2 candidate volume saved vs nDCG@10 kept, against the same
# phrase qrels (judgments don't depend on the scorer). The cascade loses
# quality ONLY where a relevant doc matched fewer distinct terms than
# rank-{CASCADE_C}'s — exactly the tail the cascade literature prices.
#
# Determinism: stage-1 ranks on (n_match desc, doc_id asc) — exact ints;
# stage-2 reuses _graded_ranking's round-6 scores; nDCG micro is the
# integer _NDCG_ADDEND contract with the SAME IDCG for both arms.
#
# Scale shape: stage-1 is a (q, doc) countDistinct over the impact join
# + one q-keyed WindowGroupLimit; stage-2's scan is UNCHANGED (scores
# come from the same component join) — in production the win is decode
# volume, priced here by n_full vs n_cascade.

CASCADE_C = 50


def ft_cascade_cost_eval(spark, sf_dir):
    """(q_id, n_full, n_cascade, ndcg_full_micro, ndcg_cascade_micro):
    candidate volume and quality of the match-count → BM25 cascade vs
    single-stage BM25."""
    graded = _graded_ranking(spark, sf_dir).cache()

    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(F.col("p0").asc(), F.col("term").asc())
    qterms = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    nmatch = (
        toks.select("doc_id", "term")
        .distinct()
        .join(F.broadcast(qterms), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.countDistinct("term").cast("long").alias("n_match"))
    )
    w1 = W.partitionBy("q_id").orderBy(
        F.col("n_match").desc(), F.col("doc_id").asc()
    )
    survivors = (
        nmatch.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= CASCADE_C)
        .select("q_id", "doc_id")
    )
    wr = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())

    def dcg_of(frame, out):
        return (
            frame.withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= NDCG_K)
            .withColumn("addend", F.expr(_NDCG_ADDEND))
            .groupBy("q_id")
            .agg(F.sum("addend").cast("long").alias(out))
        )

    full_dcg = dcg_of(graded, "dcg_full")
    casc_dcg = dcg_of(graded.join(survivors, ["q_id", "doc_id"]), "dcg_casc")
    wi = W.partitionBy("q_id").orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    idcg = (
        graded.withColumn("rnk", F.row_number().over(wi))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("idcg"))
    )
    counts = graded.groupBy("q_id").agg(F.count("*").cast("long").alias("n_full"))
    casc_n = survivors.groupBy("q_id").agg(
        F.count("*").cast("long").alias("n_cascade")
    )
    return (
        counts.join(casc_n, "q_id")
        .join(full_dcg, "q_id")
        .join(casc_dcg, "q_id")
        .join(idcg, "q_id")
        .select(
            "q_id",
            "n_full",
            "n_cascade",
            F.expr("CAST(dcg_full * 1000000 DIV idcg AS BIGINT)").alias(
                "ndcg_full_micro"
            ),
            F.expr("CAST(dcg_casc * 1000000 DIV idcg AS BIGINT)").alias(
                "ndcg_cascade_micro"
            ),
        )
    )


SQL_CASCADE_EVAL = _SQL_GRADED_PREFIX + f""",
nmatch AS (
  SELECT q.q_id, t.doc_id,
         CAST(count(DISTINCT t.term) AS BIGINT) AS n_match
  FROM (SELECT DISTINCT doc_id, term FROM toks) t
  JOIN qsel q ON q.term = t.term
  GROUP BY 1, 2
),
survivors AS (
  SELECT q_id, doc_id FROM (
    SELECT q_id, doc_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY n_match DESC, doc_id ASC) AS rn
    FROM nmatch
  ) WHERE rn <= {CASCADE_C}
),
full_dcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_full FROM (
    SELECT q_id, rel,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY score DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
),
casc_dcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_casc FROM (
    SELECT g.q_id, g.rel,
           row_number() OVER (PARTITION BY g.q_id
                              ORDER BY g.score DESC, g.doc_id ASC) AS rnk
    FROM graded g JOIN survivors s ON s.q_id = g.q_id AND s.doc_id = g.doc_id
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
),
idcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS idcg FROM (
    SELECT q_id, rel,
           row_number() OVER (
             PARTITION BY q_id ORDER BY rel DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
),
counts AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS n_full FROM graded GROUP BY q_id
),
casc_n AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS n_cascade
  FROM survivors GROUP BY q_id
)
SELECT q_id, n_full, n_cascade,
       CAST(dcg_full * 1000000 // idcg AS BIGINT) AS ndcg_full_micro,
       CAST(dcg_casc * 1000000 // idcg AS BIGINT) AS ndcg_cascade_micro
FROM counts JOIN casc_n USING (q_id) JOIN full_dcg USING (q_id)
     JOIN casc_dcg USING (q_id) JOIN idcg USING (q_id)
"""

QUERIES["ft_cascade_cost_eval"] = (ft_cascade_cost_eval, SQL_CASCADE_EVAL)


# ------------------------------------------- RM3 second-pass re-retrieval

# ft_rm3_expansion (above) stops where most "query expansion" demos stop —
# at the expansion TERM list. The actual RM3 run (Abdul-Jaleel et al.,
# TREC 2004) re-queries with the interpolated model
# P'(t|Q) = α·P_mle(t|Q) + (1−α)·RM1(t) and ranks by KL divergence, i.e.
# score(d) = Σ_t P'(t|Q)·ln P(t|d). This operator is that second pass:
# the top-RM3_RR_TERMS expansion terms (taken verbatim from the
# oracle-gated ft_rm3_expansion ranking, so both engines expand from
# identical terms) joined with the originals under integer micro
# interpolation weights, scored by Dirichlet-smoothed query likelihood
# (μ = 2000, the repo-wide SDM_MU) over ALL documents.
#
# Determinism: interpolation weights are exact integers — originals get
# 600000 DIV |Q| each (α = 0.6); expansion term t gets
# (400000 · w_micro(t)) DIV Σ w_micro over the selected five, where
# w_micro recovers the round-6 expansion weight exactly
# (CAST(round(weight · 1e6)) of an already-round-6 double is the same
# int64 in both engines). Per-(doc, term) log-probs are the shared
# micro-nat Dirichlet string; doc scores are exact int64
# Σ weight·lp_micro (≤ 6e5 · 2e7 · 8 terms ≈ 1e14, far inside int64).
#
# Scale shape: stage 1 + the expansion vote are ft_rm3_expansion's plan
# (one BM25-OR serving pass + a 10-doc broadcast semi-join); stage 2 is
# the JM/Dirichlet all-docs spine — documents × a ≤ 8-row broadcast term
# dim, one tf left join, one doc_id agg. Nothing new shuffles at 100 TB
# beyond what one extra ranked query costs.

RM3_RR_TERMS = 5  # expansion terms carried into the second pass
RM3_ORIG_W = 600_000 // len(BM25_TERMS)  # α = 0.6 split over originals
RM3_EXP_POOL = 400_000  # (1 − α) split over expansion terms by RM1 mass

_RM3_LP = (
    "CAST(round(1000000.0e0 * ln("
    "(tf + 2000.0e0 * cf / ct) / (dl + 2000.0e0)"
    "), 0) AS BIGINT)"
)


def ft_rm3_rerank_topk(spark, sf_dir):
    """(rank, doc_id, score_units): top-10 docs of the RM3 second-pass
    retrieval — Dirichlet QL under the α = 0.6 interpolated query model of
    the 3 originals + top-5 RM1 expansion terms, exact integer units
    (micro-weight × micro-nats)."""
    exp = (
        ft_rm3_expansion(spark, sf_dir)
        .filter(F.col("rank") <= RM3_RR_TERMS)
        .select(
            "term",
            F.round(F.col("weight") * 1e6).cast("long").alias("wm"),
        )
    )
    wsum = exp.agg(F.sum("wm").cast("long").alias("wsum"))
    exp_w = (
        exp.crossJoin(F.broadcast(wsum))
        .select(
            "term",
            F.expr(f"({RM3_EXP_POOL} * wm) DIV wsum").cast("long").alias("wt"),
        )
    )
    orig_w = spark.createDataFrame(
        [(t, RM3_ORIG_W) for t in BM25_TERMS], "term string, wt long"
    )
    qmodel = (
        orig_w.unionByName(exp_w)
        .groupBy("term")
        .agg(F.sum("wt").cast("long").alias("wt"))
    )

    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    ct = toks.agg(F.count("*").cast("long").alias("ct"))
    toksq = toks.join(F.broadcast(qmodel.select("term")), "term")
    cfq = toksq.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    tfq = toksq.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    dim = qmodel.join(cfq, "term")  # (term, wt, cf) — ≤ 8 rows
    scored = (
        docs.crossJoin(F.broadcast(dim))
        .join(tfq, ["term", "doc_id"], "left")
        .join(dl, "doc_id", "left")
        .crossJoin(F.broadcast(ct))
        .fillna(0, ["tf", "dl"])
        .withColumn("lp", F.expr(_RM3_LP))
        .groupBy("doc_id")
        .agg(F.sum(F.col("wt") * F.col("lp")).cast("long").alias("score_units"))
    )
    top = scored.orderBy(
        F.col("score_units").desc(), F.col("doc_id").asc()
    ).limit(10)
    wq = W.orderBy(F.col("score_units").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(wq)).select(
        "rank", "doc_id", "score_units"
    )


_RM3_ORIG_VALUES = ", ".join(f"('{t}', {RM3_ORIG_W})" for t in BM25_TERMS)

SQL_RM3_RERANK = f"""
WITH expansion AS MATERIALIZED ({SQL_RM3_EXPANSION}),
exp5 AS (
  SELECT term, CAST(round(weight * 1e6) AS BIGINT) AS wm
  FROM expansion WHERE rank <= {RM3_RR_TERMS}
),
wsums AS (SELECT CAST(sum(wm) AS BIGINT) AS wsum FROM exp5),
exp_w AS (
  SELECT term, CAST(({RM3_EXP_POOL} * wm) // wsum AS BIGINT) AS wt
  FROM exp5 CROSS JOIN wsums
),
orig_w(term, wt) AS (VALUES {_RM3_ORIG_VALUES}),
qmodel AS (
  SELECT term, CAST(sum(wt) AS BIGINT) AS wt FROM (
    SELECT term, CAST(wt AS BIGINT) AS wt FROM orig_w
    UNION ALL SELECT term, wt FROM exp_w
  ) GROUP BY term
),
toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
toksq AS (SELECT t.* FROM toks t JOIN qmodel q USING (term)),
cfq AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toksq GROUP BY 1),
tfq AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toksq GROUP BY 1, 2
),
dim AS (SELECT q.term, q.wt, c.cf FROM qmodel q JOIN cfq c USING (term)),
joined AS (
  SELECT d.doc_id AS doc_id, dim.wt AS wt, coalesce(tfq.tf, 0) AS tf,
         coalesce(dls.dl, 0) AS dl, dim.cf AS cf, ctt.ct AS ct
  FROM (SELECT doc_id FROM documents) d
  CROSS JOIN dim
  LEFT JOIN tfq ON tfq.term = dim.term AND tfq.doc_id = d.doc_id
  LEFT JOIN dls ON dls.doc_id = d.doc_id
  CROSS JOIN ctt
),
scored AS (
  SELECT doc_id, CAST(sum(wt * {_RM3_LP}) AS BIGINT) AS score_units
  FROM joined GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score_units DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score_units
FROM scored
ORDER BY score_units DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_rm3_rerank_topk"] = (ft_rm3_rerank_topk, SQL_RM3_RERANK)


# --------------------------------------------------------------- bpref

# Buckley & Voorhees (SIGIR 2004): the binary-preference metric built for
# INCOMPLETE judgments — it only looks at the relative order of judged
# docs, so it is the standard metric when qrels are a sampled pool (the
# situation every web-scale harvest's eval set is in). Over the graded
# candidate pool (every candidate is judged; rel >= 3 = relevant, the
# phrase grade — see ft_rank_eval_map's threshold note):
#
#   bpref = (1/R) Σ_{r ∈ rel retrieved} (1 − min(n_above(r), M)/M),
#   M = min(R, N)
#
# with n_above(r) = judged-nonrelevant docs ranked above r. Exact integer
# rational: numerator = Σ (M − min(n_above, M)) over relevant docs, value
# = numerator/(R·M), reported as floored micro-units (1e6·num) DIV (R·M).
# NULL when R = 0 or N = 0 (the metric is undefined, and coercing to 0
# would alias "no relevant docs" with "all relevant ranked last").
#
# Scale shape: one window (running nonrel count) over the per-query
# ranking _graded_ranking already materializes + one groupBy(q_id) — the
# same partition-by-query shuffle every rank-eval op in this family pays.


def ft_rank_eval_bpref(spark, sf_dir):
    """(q_id, n_rel, n_nonrel, bpref_micro): binary-preference metric of
    the BM25 serving ranking vs the phrase qrels, exact floored
    micro-units; NULL where R = 0 or N = 0."""
    graded = _graded_ranking(spark, sf_dir)
    wr = W.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = graded.withColumn("rnk", F.row_number().over(wr)).withColumn(
        "rel3", (F.col("rel") >= 3).cast("long")
    )
    wc = (
        W.partitionBy("q_id")
        .orderBy("rnk")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    above = ranked.withColumn(
        "nonrel_above",
        F.coalesce(F.sum(1 - F.col("rel3")).over(wc), F.lit(0)).cast("long"),
    )
    totals = ranked.groupBy("q_id").agg(
        F.sum("rel3").cast("long").alias("n_rel"),
        F.sum(1 - F.col("rel3")).cast("long").alias("n_nonrel"),
    )
    contrib = (
        above.filter(F.col("rel3") == 1)
        .join(totals, "q_id")
        .withColumn("m", F.least("n_rel", "n_nonrel"))
        .withColumn("c", F.expr("m - least(nonrel_above, m)"))
        .groupBy("q_id")
        .agg(F.sum("c").cast("long").alias("num"))
    )
    return (
        totals.join(contrib, "q_id", "left")
        .withColumn("num", F.coalesce(F.col("num"), F.lit(0)).cast("long"))
        .withColumn(
            "bpref_micro",
            F.expr(
                "CASE WHEN n_rel = 0 OR n_nonrel = 0 THEN NULL "
                "ELSE (1000000 * num) DIV (n_rel * least(n_rel, n_nonrel))"
                " END"
            ).cast("long"),
        )
        .select("q_id", "n_rel", "n_nonrel", "bpref_micro")
    )


SQL_RANK_EVAL_BPREF = _SQL_GRADED_PREFIX + """,
ranked AS (
  SELECT q_id, doc_id, rel,
         CASE WHEN rel >= 3 THEN 1 ELSE 0 END AS rel3,
         row_number() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS rnk
  FROM graded
),
above AS (
  SELECT *,
         CAST(coalesce(sum(1 - rel3) OVER (
           PARTITION BY q_id ORDER BY rnk
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS nonrel_above
  FROM ranked
),
totals AS (
  SELECT q_id, CAST(sum(rel3) AS BIGINT) AS n_rel,
         CAST(sum(1 - rel3) AS BIGINT) AS n_nonrel
  FROM ranked GROUP BY q_id
),
contrib AS (
  SELECT a.q_id,
         CAST(sum(least(t.n_rel, t.n_nonrel)
                  - least(a.nonrel_above, least(t.n_rel, t.n_nonrel)))
              AS BIGINT) AS num
  FROM above a JOIN totals t USING (q_id)
  WHERE a.rel3 = 1
  GROUP BY a.q_id
)
SELECT t.q_id, t.n_rel, t.n_nonrel,
       CASE WHEN t.n_rel = 0 OR t.n_nonrel = 0 THEN NULL
            ELSE CAST((1000000 * coalesce(c.num, 0))
                      // (t.n_rel * least(t.n_rel, t.n_nonrel)) AS BIGINT)
       END AS bpref_micro
FROM totals t LEFT JOIN contrib c USING (q_id)
"""

QUERIES["ft_rank_eval_bpref"] = (ft_rank_eval_bpref, SQL_RANK_EVAL_BPREF)


# ------------------------------------------- Rocchio vector-space PRF

# Rocchio (1971) pseudo-relevance feedback — the VECTOR-SPACE classic
# next to the LM-based RM3 pair (ft_rm3_expansion / ft_rm3_rerank_topk;
# deliberately a SEPARATE formula family, like BM25+ next to BM25): the
# query vector moves toward the centroid of the top-RO_FDBK feedback
# documents, q' = α·q + (β/|F|)·Σ_{d∈F} d, with the standard α = 1,
# β = 0.75, and the corpus is re-retrieved by the integer dot product
# q'·d over tf·idf document vectors.
#
# Integer algebra (the dedup_tfidf_cosine_pairs discipline — MILLI idf
# keeps every product in int64): idf_milli through ONE shared ln string;
# document weights w_dt = tf·idf_milli; centroid component cen_t =
# Σ_{d∈F} w_dt (exact — the 1/|F| mean and the 0.75 fold into the
# common scale 4·|F|: wq_t = 4·|F|·idf_milli·[t ∈ q] + 3·cen_t). The
# expansion vocabulary is capped at the RO_EXP strongest centroid terms
# (cen desc, term asc) plus the original query terms — Rocchio's
# standard expansion-term cap. Overflow: wq ≤ 4·5·5500 + 3·5·50·5500 ≈
# 4e6, w_dt ≤ 50·5500 ≈ 3e5 → per-doc score ≤ 11 terms · 1.2e12 ≈
# 1.3e13 ≪ int64; at web scale the milli-idf cap and tf ceilings bound
# the same product (documented).
#
# Scale shape: the feedback set is RO_FDBK rows (broadcast semi-join
# prunes the token scan before aggregation — the RM3 plan); the
# expansion vocabulary (≤ RO_EXP + |q| rows) broadcasts into ONE
# term-filtered corpus scan + per-doc agg + TakeOrdered(10).

RO_FDBK = 5
RO_EXP = 8
RO_TOPK = 10
_RO_IDF_MILLI = (
    "CAST(floor(ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))"
    " * 1.0e3 + 0.5e0) AS BIGINT)"
)


def ft_rocchio_rerank_topk(spark, sf_dir):
    """(rank, doc_id, score_int): top-{RO_TOPK} docs by the Rocchio
    (α=1, β=0.75) expanded-query integer dot product after
    {RO_FDBK}-doc pseudo-relevance feedback on the flagship query."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    toks = doc_tokens(spark, sf_dir)
    n_df = F.broadcast(
        load(spark, sf_dir, "documents").agg(
            F.count("*").cast("long").alias("n")
        )
    )
    fdbk = (
        bm25_or_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(RO_FDBK)
        .select("doc_id")
    )
    tf_all = toks.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_all = tf_all.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    idf = df_all.crossJoin(n_df).select(
        "term", F.expr(_RO_IDF_MILLI).alias("idf_m")
    )
    cen = (
        tf_all.join(F.broadcast(fdbk), "doc_id", "left_semi")
        .join(F.broadcast(idf), "term")
        .groupBy("term")
        .agg(F.sum(F.col("tf") * F.col("idf_m")).cast("long").alias("cen"))
    )
    w_exp = W.orderBy(F.col("cen").desc(), F.col("term").asc())
    vocab = (
        cen.withColumn("rn", F.row_number().over(w_exp))
        .filter(
            (F.col("rn") <= RO_EXP) | F.col("term").isin(BM25_TERMS)
        )
        .join(F.broadcast(idf), "term")
        .select(
            "term",
            (
                F.lit(4 * RO_FDBK)
                * F.when(F.col("term").isin(BM25_TERMS), F.col("idf_m"))
                .otherwise(F.lit(0))
                + 3 * F.col("cen")
            ).cast("long").alias("wq"),
        )
    )
    scored = (
        tf_all.join(F.broadcast(vocab), "term")
        .join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("wq") * F.col("tf") * F.col("idf_m"))
            .cast("long")
            .alias("score_int")
        )
    )
    top = scored.orderBy(
        F.col("score_int").desc(), F.col("doc_id").asc()
    ).limit(RO_TOPK)
    w = W.orderBy(F.col("score_int").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score_int"
    )


def _sql_rocchio() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS ({SQL_DOC_TOKS}),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT n FROM nn) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
qtf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ({terms}) GROUP BY 1, 2
),
qdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtf GROUP BY 1),
fdbk AS (
  SELECT doc_id FROM (
    SELECT doc_id, round(sum(
      ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
    ), 6) AS score
    FROM qtf t JOIN qdf USING (term) JOIN dls USING (doc_id)
    CROSS JOIN stats
    GROUP BY doc_id
  ) ORDER BY score DESC, doc_id ASC LIMIT {RO_FDBK}
),
tf_all AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
idf AS (
  SELECT term, {_RO_IDF_MILLI} AS idf_m
  FROM (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf_all GROUP BY 1)
  CROSS JOIN nn
),
cen AS (
  SELECT t.term, CAST(sum(t.tf * i.idf_m) AS BIGINT) AS cen
  FROM tf_all t JOIN idf i USING (term)
  WHERE t.doc_id IN (SELECT doc_id FROM fdbk)
  GROUP BY 1
),
vocab AS (
  SELECT c.term,
         CAST({4 * RO_FDBK} * CASE WHEN c.term IN ({terms})
                                   THEN i.idf_m ELSE 0 END
              + 3 * c.cen AS BIGINT) AS wq
  FROM (
    SELECT term, cen,
           row_number() OVER (ORDER BY cen DESC, term ASC) AS rn
    FROM cen
  ) c JOIN idf i USING (term)
  WHERE c.rn <= {RO_EXP} OR c.term IN ({terms})
),
scored AS (
  SELECT t.doc_id,
         CAST(sum(v.wq * t.tf * i.idf_m) AS BIGINT) AS score_int
  FROM tf_all t JOIN vocab v USING (term) JOIN idf i USING (term)
  GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY score_int DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score_int
FROM scored
ORDER BY score_int DESC, doc_id ASC LIMIT {RO_TOPK}
"""


QUERIES["ft_rocchio_rerank_topk"] = (ft_rocchio_rerank_topk, _sql_rocchio())


# ------------------------------------------------ xQuAD diversification

# Santos, Macdonald & Ounis (WWW 2010) explicit aspect diversification —
# the ASPECT-aware sibling of ft_mmr_topk (MMR diversifies by pairwise
# document similarity; xQuAD by coverage of explicit query intents):
#   pick = argmax (1−λ)·P(d|q) + λ·Σ_a P(a|q)·P(d|a)·Π_{d'∈S}(1−P(d'|a))
# λ = 1/2, uniform aspect prior. The aspect set is the POOL'S LANGUAGE
# FACET (the reference's i18n facet dimension — result-set language
# diversification): term aspects are structurally degenerate on the
# word-soup corpus (every pool doc contains every flagship term with
# saturated tf, so term-aspect coverage cannot reorder anything — the
# CLAUDE.md degenerate-synthesis trap, verified empirically), while the
# lang facet genuinely partitions the pool. P(d|a) is the graded soft
# assignment (7/10)·rel_norm for the doc's own facet value and
# (1/10)·rel_norm otherwise (xQuAD's "relevance to sub-intent a").
#
# Integer algebra: rel_norm is the round-6 BM25-OR score recovered to
# micro and normalized by the pool max; the novelty Π(1−p) folds
# SEQUENTIALLY in pick order as novel' = novel·(1e6−p) DIV 1e6 (floored
# per step — the ordered fold is the deterministic contract, mirrored by
# the oracle's unrolled CTE chain); the objective
#   obj = 500·n_asp·rel_norm + 500·Σ_a (p_da·novel_a DIV 1e6)
# clears λ and the 1/n_asp prior exactly (every term ≤ ~1e10 ≪ int64).
# Greedy ties break (obj desc, doc_id asc).
#
# Scale shape: the corpus-sized work is the one BM25-OR scan (the
# serving plan); the greedy loop runs on the XQ_C-row candidate pool
# with an |aspects|-row novelty frame — XQ_K bounded mini-jobs, the
# ft_mmr_topk shape.

XQ_C = 20
XQ_K = 10


def ft_xquad_topk(spark, sf_dir):
    """(pick, doc_id, lang, rel_norm, cov_units, obj): the {XQ_K} xQuAD
    picks in greedy order from the top-{XQ_C} BM25-OR pool, aspects =
    the pool's language facet, λ = 1/2.

    The distributed work is the BM25-OR pool scan; the greedy itself
    runs DRIVER-SIDE over the collected XQ_C-row pool (bounded by
    construction — the interleave_team_draft_eval / emb_kmeans_assign
    bounded-collect precedent; a k-step selection over top-C candidates
    is inherently sequential, and C is a serving constant, never
    corpus-sized). All arithmetic is the exact integer algebra above.
    """
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    langs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    cand = (
        bm25_or_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(XQ_C)
        .select(
            "doc_id",
            F.expr("CAST(round(score * 1.0e6, 0) AS BIGINT)").alias("s_micro"),
        )
        .join(langs, "doc_id")
    )
    rows = cand.collect()  # bounded: XQ_C rows
    relmax = max(r["s_micro"] for r in rows)
    rel = {r["doc_id"]: (1_000_000 * r["s_micro"]) // relmax for r in rows}
    lang = {r["doc_id"]: r["lang"] for r in rows}
    aspects = sorted(set(lang.values()))
    na = len(aspects)

    def p_da(d, a):
        r = rel[d]
        return (7 * r) // 10 if lang[d] == a else r // 10

    novel = {a: 1_000_000 for a in aspects}
    picked: list = []
    out = []
    for k in range(1, XQ_K + 1):
        best = None
        for d in rel:
            if d in picked:
                continue
            cov = sum((p_da(d, a) * novel[a]) // 1_000_000 for a in aspects)
            obj = 500 * na * rel[d] + 500 * cov
            key = (-obj, d)
            if best is None or key < best[0]:
                best = (key, d, cov, obj)
        _, d, cov, obj = best
        picked.append(d)
        out.append((k, d, lang[d], rel[d], cov, obj))
        for a in aspects:
            novel[a] = (novel[a] * (1_000_000 - p_da(d, a))) // 1_000_000
    return spark.createDataFrame(
        out,
        "pick int, doc_id long, lang string, rel_norm long,"
        " cov_units long, obj long",
    )


def _sql_xquad() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    parts = [f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
qtf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ({terms}) GROUP BY 1, 2
),
qdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtf GROUP BY 1),
orsc AS (
  SELECT doc_id,
         CAST(round(round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
         ), 6) * 1.0e6, 0) AS BIGINT) AS s_micro
  FROM qtf t JOIN qdf USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats GROUP BY doc_id
),
cand AS MATERIALIZED (
  SELECT o.doc_id, o.s_micro, d.lang
  FROM orsc o JOIN documents d USING (doc_id)
  ORDER BY o.s_micro DESC, o.doc_id ASC LIMIT {XQ_C}
),
pool AS MATERIALIZED (
  SELECT doc_id, lang,
         CAST((1000000 * s_micro) // (SELECT max(s_micro) FROM cand)
              AS BIGINT) AS rel_norm
  FROM cand
),
aspects AS MATERIALIZED (SELECT DISTINCT lang AS aspect FROM pool),
nasp AS (SELECT CAST(count(*) AS BIGINT) AS na FROM aspects),
pmat AS MATERIALIZED (
  SELECT p.doc_id, a.aspect,
         CAST(CASE WHEN p.lang = a.aspect THEN (7 * p.rel_norm) // 10
                   ELSE p.rel_norm // 10 END AS BIGINT) AS p_micro
  FROM pool p CROSS JOIN aspects a
),
nov0 AS (
  SELECT aspect, CAST(1000000 AS BIGINT) AS novel FROM aspects
)"""]
    prev_nov = "nov0"
    prev_picks = None
    for k in range(1, XQ_K + 1):
        excl = (
            f"WHERE s.doc_id NOT IN (SELECT doc_id FROM {prev_picks})"
            if prev_picks
            else ""
        )
        parts.append(f""",
sc{k} AS MATERIALIZED (
  SELECT {k} AS pick, s.doc_id, s.lang, s.rel_norm, s.cov_units,
         CAST(500 * (SELECT na FROM nasp) * s.rel_norm
              + 500 * s.cov_units AS BIGINT) AS obj
  FROM (
    SELECT p.doc_id, p.lang, p.rel_norm,
           CAST(sum((m.p_micro * n.novel) // 1000000) AS BIGINT)
             AS cov_units
    FROM pool p
    JOIN pmat m ON m.doc_id = p.doc_id
    JOIN {prev_nov} n ON n.aspect = m.aspect
    GROUP BY p.doc_id, p.lang, p.rel_norm
  ) s {excl}
  ORDER BY obj DESC, doc_id ASC LIMIT 1
),
pk{k} AS MATERIALIZED (
  {"SELECT * FROM " + prev_picks + " UNION ALL " if prev_picks else ""}
  SELECT pick, doc_id, lang, rel_norm, cov_units, obj FROM sc{k}
),
nov{k} AS MATERIALIZED (
  SELECT n.aspect,
         CAST((n.novel * (1000000 - coalesce(m.p_micro, 0))) // 1000000
              AS BIGINT) AS novel
  FROM {prev_nov} n
  LEFT JOIN (
    SELECT aspect, p_micro FROM pmat
    WHERE doc_id = (SELECT doc_id FROM sc{k})
  ) m ON m.aspect = n.aspect
)""")
        prev_nov = f"nov{k}"
        prev_picks = f"pk{k}"
    parts.append(
        f"\nSELECT pick, doc_id, lang, rel_norm, cov_units, obj"
        f" FROM {prev_picks}"
    )
    return "".join(parts)


QUERIES["ft_xquad_topk"] = (ft_xquad_topk, _sql_xquad())


# --------------------------------------------- α-DCG diversity eval

# Clarke et al. (SIGIR 2008) α-DCG — the metric xQuAD optimizes for,
# closing the diversification loop: rank-discounted aspect gains where
# an aspect's value HALVES each time another document covering it has
# already appeared (α = 1/2 — dyadic, so every gain is an exact power
# of two). Aspects are the pool's language facet with binary coverage
# (the metric's standard binary-judgment form; the graded p in
# ft_xquad_topk is the SELECTION model). Two deliberate exactness
# choices, both documented: the position discount is the dyadic
# 2^(K−r) attention model (the ft_fairness_exposure_eval discipline —
# log2 discounts would put cross-engine floats in every cell), and the
# score is reported UN-normalized (α-DCG, not α-nDCG: the ideal
# ranking is itself NP-hard / greedy-approximated, so the comparison
# of two real rankings on identical units is the honest number).
#
# Evaluated rankings: the xQuAD picks vs the pure-relevance top-K of
# the SAME pool. The pytest pins the trade both ways: xQuAD wins the
# diversity-aware score, pure relevance wins the plain discounted
# relevance sum — the Pareto trade diversification exists to make.
#
# Units: score_units = Σ_r 2^(K−r) · 2^(C_SCALE − c_r), with c_r the
# count of prior same-facet docs (≤ K−1 < C_SCALE) — exact int64.
#
# Scale shape: two bounded rankings + one prior-coverage window per
# ranking + a 2-row agg. Corpus cost is the two scans already inside
# the ranking operators.

AD_C_SCALE = 10


def ft_alpha_ndcg_eval(spark, sf_dir):
    """(ranking, alpha_units, rel_units): α-DCG (α = 1/2, dyadic
    discount) and plain discounted relevance for the xQuAD picks vs the
    pure-relevance top-{XQ_K} of the same pool."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    langs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    pool = (
        bm25_or_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(XQ_C)
        .select(
            "doc_id",
            F.expr("CAST(round(score * 1.0e6, 0) AS BIGINT)").alias("s_micro"),
        )
        .join(langs, "doc_id")
        .cache()
    )
    relmax = F.broadcast(pool.agg(F.max("s_micro").alias("relmax")))
    wrel = W.orderBy(F.col("s_micro").desc(), F.col("doc_id").asc())
    rel_rank = (
        pool.withColumn("rank", F.row_number().over(wrel))
        .filter(F.col("rank") <= XQ_K)
        .crossJoin(relmax)
        .select(
            F.lit("relevance").alias("ranking"),
            "rank",
            "doc_id",
            "lang",
            F.expr("CAST((1000000 * s_micro) DIV relmax AS BIGINT)").alias(
                "rel_norm"
            ),
        )
    )
    xq = ft_xquad_topk(spark, sf_dir).select(
        F.lit("xquad").alias("ranking"),
        F.col("pick").alias("rank"),
        "doc_id",
        "lang",
        "rel_norm",
    )
    both = rel_rank.unionByName(xq)
    wprior = (
        W.partitionBy("ranking", "lang")
        .orderBy("rank")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    scored = both.withColumn(
        "c_r", F.coalesce(F.count("*").over(wprior), F.lit(0)).cast("long")
    ).select(
        "ranking",
        F.expr(
            f"(CAST(1 AS BIGINT) << ({XQ_K} - rank))"
            f" * (CAST(1 AS BIGINT) << ({AD_C_SCALE} - c_r))"
        ).cast("long").alias("g"),
        F.expr(
            f"(CAST(1 AS BIGINT) << ({XQ_K} - rank)) * rel_norm"
        ).cast("long").alias("pr"),
    )
    return scored.groupBy("ranking").agg(
        F.sum("g").cast("long").alias("alpha_units"),
        F.sum("pr").cast("long").alias("rel_units"),
    )


def _sql_alpha_ndcg() -> str:
    xq_sql = QUERIES["ft_xquad_topk"][1]
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH xq AS MATERIALIZED ({xq_sql}),
toks2 AS ({SQL_DOC_TOKS}),
dls2 AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY 1),
stats2 AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls2) AS avgdl
),
qtf2 AS (
  SELECT term, doc_id, count(*) AS tf FROM toks2
  WHERE term IN ({terms}) GROUP BY 1, 2
),
qdf2 AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtf2 GROUP BY 1),
orsc2 AS (
  SELECT doc_id,
         CAST(round(round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
         ), 6) * 1.0e6, 0) AS BIGINT) AS s_micro
  FROM qtf2 t JOIN qdf2 USING (term) JOIN dls2 USING (doc_id)
  CROSS JOIN stats2 GROUP BY doc_id
),
pool2 AS MATERIALIZED (
  SELECT o.doc_id, o.s_micro, d.lang
  FROM orsc2 o JOIN documents d USING (doc_id)
  ORDER BY o.s_micro DESC, o.doc_id ASC LIMIT {XQ_C}
),
rel_rank AS (
  SELECT 'relevance' AS ranking, rank, doc_id, lang,
         CAST((1000000 * s_micro) // (SELECT max(s_micro) FROM pool2)
              AS BIGINT) AS rel_norm
  FROM (
    SELECT *, CAST(row_number() OVER (
      ORDER BY s_micro DESC, doc_id ASC) AS INT) AS rank
    FROM pool2
  ) WHERE rank <= {XQ_K}
),
both_r AS (
  SELECT * FROM rel_rank
  UNION ALL
  SELECT 'xquad', pick, doc_id, lang, rel_norm FROM xq
),
scored AS (
  SELECT ranking,
         (CAST(1 AS BIGINT) << ({XQ_K} - rank))
           * (CAST(1 AS BIGINT) << ({AD_C_SCALE} - coalesce(c_r, 0))) AS g,
         (CAST(1 AS BIGINT) << ({XQ_K} - rank)) * rel_norm AS pr
  FROM (
    SELECT *, CAST(count(*) OVER (
      PARTITION BY ranking, lang ORDER BY rank
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS BIGINT) AS c_r
    FROM both_r
  )
)
SELECT ranking, CAST(sum(g) AS BIGINT) AS alpha_units,
       CAST(sum(pr) AS BIGINT) AS rel_units
FROM scored GROUP BY 1
"""


QUERIES["ft_alpha_ndcg_eval"] = (ft_alpha_ndcg_eval, _sql_alpha_ndcg())


# --------------------------------------------------- BM25 MaxP passages

# Dai & Callan (SIGIR 2019) BM25-MaxP — the passage-evidence ranking
# paradigm (retrieve by the BEST PASSAGE, not the whole document; the
# long-document fix every modern reranker inherits): documents split
# into overlapping token windows (width {MAXP_W}, stride {MAXP_S}),
# BM25 computed at PASSAGE level with passage-level df / lengths /
# avgdl, and a document's score is the max over its passages (best
# passage reported). Deliberately a different evidence model from
# ft_bm25_topk — long documents with one relevant region stop being
# drowned by their own length normalization.
#
# Window-membership algebra is kept NONNEGATIVE throughout (w_min =
# CASE pos ≤ {MAXP_W - 2} THEN 0 ELSE (pos − {MAXP_S}) DIV {MAXP_S}
# END — Spark DIV truncates toward zero while DuckDB // floors, so a
# negative intermediate would diverge; the CASE keeps every quotient
# ≥ 0). Scoring is the ONE repo BM25 formula text on passage stats,
# round-6; ties (score desc, chunk asc, doc asc).
#
# Scale shape: the membership explode is ≤ 2× the token scan (width =
# 2·stride); passage stats are one (doc, window) agg + one term-passage
# df agg (both map-side); the per-doc max is a WindowGroupLimit; the
# final top-k is TakeOrdered.

MAXP_W = 32
MAXP_S = 16
MAXP_K = 10


def ft_bm25_maxp_topk(spark, sf_dir):
    """(rank, doc_id, best_chunk, score): top-{MAXP_K} documents by
    max-passage BM25 over {MAXP_W}-token windows (stride {MAXP_S})."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    toks = doc_tokens(spark, sf_dir)
    memb = toks.select(
        "doc_id",
        "term",
        F.explode(
            F.expr(
                f"sequence(CASE WHEN pos <= {MAXP_W - 2} THEN 0"
                f" ELSE (pos - {MAXP_S}) DIV {MAXP_S} END,"
                f" pos DIV {MAXP_S})"
            )
        ).alias("w"),
    )
    # clamp to the document's real window count (the tail window absorbs
    # the remainder)
    ndoc = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    memb = memb.join(ndoc, "doc_id").filter(
        F.expr(
            f"w <= CASE WHEN n <= {MAXP_W} THEN 0"
            f" ELSE (n - {MAXP_W + 1}) DIV {MAXP_S} + 1 END"
        )
    )
    pl = memb.groupBy("doc_id", "w").agg(F.count("*").alias("pl"))
    np_df = F.broadcast(pl.agg(F.count("*").alias("n_p")))
    avg = F.broadcast(pl.agg((F.sum("pl") / F.count("*")).alias("avgpl")))
    ptf = (
        memb.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    pdf = ptf.groupBy("term").agg(
        F.countDistinct("doc_id", "w").alias("df")
    )
    scored = (
        ptf.join(F.broadcast(pdf), "term")
        .join(pl, ["doc_id", "w"])
        .crossJoin(np_df)
        .crossJoin(avg)
        .withColumn(
            "contrib",
            F.log(1.0 + (F.col("n_p") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("pl") / F.col("avgpl"))),
        )
        .groupBy("doc_id", "w")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    wmax = W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("w").asc()
    )
    best = (
        scored.withColumn("rn", F.row_number().over(wmax))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("w").alias("best_chunk"), "score")
    )
    top = best.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(MAXP_K)
    wr = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "doc_id", "best_chunk", "score"
    )


def _sql_maxp() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH toks AS ({SQL_DOC_TOKS}),
nd AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
memb AS MATERIALIZED (
  SELECT t.doc_id, t.term, CAST(u.w AS BIGINT) AS w
  FROM toks t
  JOIN nd USING (doc_id),
  unnest(range(
    CASE WHEN t.pos <= {MAXP_W - 2} THEN 0
         ELSE (t.pos - {MAXP_S}) // {MAXP_S} END,
    t.pos // {MAXP_S} + 1
  )) AS u(w)
  WHERE u.w <= CASE WHEN nd.n <= {MAXP_W} THEN 0
                    ELSE (nd.n - {MAXP_W + 1}) // {MAXP_S} + 1 END
),
pl AS (SELECT doc_id, w, count(*) AS pl FROM memb GROUP BY 1, 2),
np AS (SELECT count(*) AS n_p FROM pl),
avgp AS (SELECT sum(pl) * 1.0e0 / count(*) AS avgpl FROM pl),
ptf AS (
  SELECT term, doc_id, w, count(*) AS tf FROM memb
  WHERE term IN ({terms}) GROUP BY 1, 2, 3
),
pdf AS (
  SELECT term, count(*) AS df FROM ptf GROUP BY 1
),
scored AS (
  SELECT t.doc_id, t.w,
         round(sum(
           ln(1.0e0 + ((SELECT n_p FROM np) - d.df + 0.5e0) / (d.df + 0.5e0))
           * (t.tf * 2.2e0)
           / (t.tf + 1.2e0 * (1.0e0 - 0.75e0
              + 0.75e0 * p.pl / (SELECT avgpl FROM avgp)))
         ), 6) AS score
  FROM ptf t JOIN pdf d USING (term) JOIN pl p USING (doc_id, w)
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, w AS best_chunk, score FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, w ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, best_chunk, score
FROM best
ORDER BY score DESC, doc_id ASC LIMIT {MAXP_K}
"""


QUERIES["ft_bm25_maxp_topk"] = (ft_bm25_maxp_topk, _sql_maxp())


# ------------------------------------------------ PM-2 diversification

# Dang & Croft (WSDM 2012) PM-2: diversification as PROPORTIONAL seat
# allocation — each result position is a parliamentary seat, awarded by
# the Sainte-Laguë method: aspect quotients qt_a = v_a / (2 s_a + 1)
# (v_a = aspect votes = pool share, s_a = seats already held), the
# position goes to the aspect with the largest quotient, and the doc is
# chosen to maximize lam*qt_a*'s coverage plus (1-lam) of the others'.
# Complements ft_xquad_topk (relevance-weighted coverage with novelty
# decay) and ft_mmr_topk (similarity penalty) with the third classic
# diversification family: PROPORTIONALITY.
#
# Integer adaptations, documented: (1) seats are INTEGER — the picked
# doc's aspect gains one whole seat (paper: fractional p(d|a) credit);
# Sainte-Laguë with integer seats is the original apportionment method,
# and quotients stay micro-integers through ONE floored division
# identical in both engines. (2) lam = 9/10, NOT 1/2: with the two-level
# aspect-likelihood model (w = 7 for the doc's own lang, 1 otherwise,
# the ft_xquad_topk model), the lam = 1/2 objective algebraically
# collapses to r_d*(Q + 6*qt_lang(d)) — INDEPENDENT of the chosen
# aspect (proof: split the sum on lang(d) = a*), so the aspect-turn
# mechanism PM-2 exists for would be dead code; lam = 9/10 keeps it
# live (coefficients 9/1 after scaling by 10).
#
# Every greedy decision compares integers: obj(d) = SUM_a coef_a * qt_a
# * w_da * r_d <= ~6e15, tie-break doc_id asc; aspect turn tie-break
# aspect asc. The driver loop runs over the collected XQ_C-row pool
# (the ft_xquad_topk bounded-collect precedent); the oracle re-derives
# the identical schedule as a PM2_K-step CTE unroll carrying the seat
# table.

PM2_K = 10  # positions (seats)
PM2_LAM_NUM = 9  # lam = 9/10 (see collapse proof above)


def ft_pm2_topk(spark, sf_dir):
    """(pick, doc_id, lang, rel_norm, aspect_star, qt_star, obj): the
    PM2_K PM-2 picks in seat order from the top-XQ_C BM25-OR pool,
    aspects = the pool's language facet, Sainte-Laguë integer seats."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    langs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    cand = (
        bm25_or_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(XQ_C)
        .select(
            "doc_id",
            F.expr("CAST(round(score * 1.0e6, 0) AS BIGINT)").alias("s_micro"),
        )
        .join(langs, "doc_id")
    )
    rows = cand.collect()  # bounded: XQ_C rows
    relmax = max(r["s_micro"] for r in rows)
    rel = {r["doc_id"]: (1_000_000 * r["s_micro"]) // relmax for r in rows}
    lang = {r["doc_id"]: r["lang"] for r in rows}
    aspects = sorted(set(lang.values()))
    votes = {a: sum(1 for d in lang if lang[d] == a) for a in aspects}

    seats = {a: 0 for a in aspects}
    picked: list = []
    out = []
    for k in range(1, PM2_K + 1):
        qt = {a: (1_000_000 * votes[a]) // (2 * seats[a] + 1) for a in aspects}
        astar = min(aspects, key=lambda a: (-qt[a], a))
        best = None
        for d in rel:
            if d in picked:
                continue
            obj = 0
            for a in aspects:
                coef = PM2_LAM_NUM if a == astar else 1
                w = 7 if lang[d] == a else 1
                obj += coef * qt[a] * w * rel[d]
            key = (-obj, d)
            if best is None or key < best[0]:
                best = (key, d, obj)
        _, d, obj = best
        picked.append(d)
        seats[lang[d]] += 1
        out.append((k, d, lang[d], rel[d], astar, qt[astar], obj))
    return spark.createDataFrame(
        out,
        "pick int, doc_id long, lang string, rel_norm long,"
        " aspect_star string, qt_star long, obj long",
    )


def _sql_pm2() -> str:
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    parts = [f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
qtf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ({terms}) GROUP BY 1, 2
),
qdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtf GROUP BY 1),
orsc AS (
  SELECT doc_id,
         CAST(round(round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
         ), 6) * 1.0e6, 0) AS BIGINT) AS s_micro
  FROM qtf t JOIN qdf USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats GROUP BY doc_id
),
cand AS MATERIALIZED (
  SELECT o.doc_id, o.s_micro, d.lang
  FROM orsc o JOIN documents d USING (doc_id)
  ORDER BY o.s_micro DESC, o.doc_id ASC LIMIT {XQ_C}
),
pool AS MATERIALIZED (
  SELECT doc_id, lang,
         CAST((1000000 * s_micro) // (SELECT max(s_micro) FROM cand)
              AS BIGINT) AS rel_norm
  FROM cand
),
pasp AS MATERIALIZED (
  SELECT lang AS aspect, CAST(count(*) AS BIGINT) AS v
  FROM pool GROUP BY 1
),
pst0 AS (SELECT aspect, v, CAST(0 AS BIGINT) AS s FROM pasp),
ppk0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS doc_id WHERE 1 = 0)"""]
    for k in range(1, PM2_K + 1):
        parts.append(f""",
pqt{k} AS MATERIALIZED (
  SELECT aspect, v, s,
         CAST((1000000 * v) // (2 * s + 1) AS BIGINT) AS qt
  FROM pst{k - 1}
),
pas{k} AS MATERIALIZED (
  SELECT aspect AS astar, qt AS qt_star FROM pqt{k}
  ORDER BY qt DESC, aspect ASC LIMIT 1
),
pob{k} AS MATERIALIZED (
  SELECT p.doc_id, p.lang, p.rel_norm,
         CAST(sum(
           (CASE WHEN q.aspect = a.astar THEN {PM2_LAM_NUM} ELSE 1 END)
           * q.qt
           * (CASE WHEN p.lang = q.aspect THEN 7 ELSE 1 END)
           * p.rel_norm
         ) AS BIGINT) AS obj
  FROM pool p CROSS JOIN pqt{k} q CROSS JOIN pas{k} a
  WHERE p.doc_id NOT IN (SELECT doc_id FROM ppk{k - 1})
  GROUP BY 1, 2, 3
),
ppick{k} AS MATERIALIZED (
  SELECT CAST({k} AS INT) AS pick, o.doc_id, o.lang, o.rel_norm,
         a.astar AS aspect_star, a.qt_star, o.obj
  FROM pob{k} o CROSS JOIN pas{k} a
  ORDER BY o.obj DESC, o.doc_id ASC LIMIT 1
),
ppk{k} AS MATERIALIZED (
  SELECT doc_id FROM ppk{k - 1} UNION ALL SELECT doc_id FROM ppick{k}
),
pst{k} AS MATERIALIZED (
  SELECT t.aspect, t.v,
         CAST(t.s + CASE WHEN t.aspect =
              (SELECT lang FROM ppick{k}) THEN 1 ELSE 0 END AS BIGINT) AS s
  FROM pst{k - 1} t
)""")
    sel = " UNION ALL ".join(
        f"SELECT pick, doc_id, lang, rel_norm, aspect_star, qt_star, obj"
        f" FROM ppick{k}"
        for k in range(1, PM2_K + 1)
    )
    parts.append(f"\n{sel}")
    return "".join(parts)


QUERIES["ft_pm2_topk"] = (ft_pm2_topk, _sql_pm2())


# -------------------------------------- successive-halving grid tuning

# Jamieson & Talwalkar (AISTATS 2016) / Karnin et al.: evaluate many
# configurations on a small budget, keep the best half, re-evaluate the
# survivors on a bigger budget — the hyperparameter-search pattern that
# makes bm25_grid_tune_eval's exhaustive sweep affordable at 4x the
# grid. SH_GRID is a 24-point (k1, b) lattice; rounds evaluate
# 24 configs x 4 queries -> top 12 x 8 -> top 6 x 16 -> winner, every
# decision on integer micro-nDCG means with (mean desc, k1, b)
# tie-breaks. The eval economics and the SELECTION QUALITY are the
# deliverables: sh_evals = 288 (config, query) scorings vs 384
# exhaustive, and the winner's FULL-grid mean is compared against the
# exhaustive argmax (regret_micro — 0 when SH finds the true best).
#
# Scale shape: identical to bm25_grid_tune_eval — the grid is a
# broadcast VALUES dim over ONE tf/df/dl scan; the per-(config, query)
# nDCG table is grid x registry sized (384 rows), and the halving
# itself is a bounded driver fold over it (the interleave_team_draft
# pattern), re-derived in the oracle as a 3-round CTE chain.

SH_GRID = [
    (k, b)
    for k in (600, 800, 1000, 1200, 1600, 2000)
    for b in (0, 250, 500, 750)
]
SH_ROUNDS = [(24, 4), (12, 8), (6, 16)]  # (configs kept entering, queries)


def ft_sh_tune_eval(spark, sf_dir):
    """(round, n_configs, n_queries_used, evals_cum, lead_k1m, lead_bm,
    lead_partial_ndcg, winner_k1m, winner_bm, winner_full_ndcg,
    grid_best_ndcg, regret_micro, sh_evals, full_evals): successive-
    halving trace over the 24-point BM25 grid with full-grid regret."""
    graded = _graded_ranking(spark, sf_dir).select("q_id", "doc_id", "rel").cache()
    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(F.col("p0").asc(), F.col("term").asc())
    qterms = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = docs.select(F.count("*").alias("n")).crossJoin(
        dl.select((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    tf = (
        toks.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    grid = spark.createDataFrame(SH_GRID, "k1m long, bm long")
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(grid))
        .withColumn("contrib", F.expr(_GRID_CONTRIB))
        .groupBy("k1m", "bm", "q_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    wr = W.partitionBy("k1m", "bm", "q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    dcg = (
        scored.join(graded, ["q_id", "doc_id"])
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("k1m", "bm", "q_id")
        .agg(F.sum("addend").cast("long").alias("dcg_micro"))
    )
    wi = W.partitionBy("q_id").orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    idcg = (
        graded.withColumn("rnk", F.row_number().over(wi))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("idcg_micro"))
    )
    perq = [
        (r["k1m"], r["bm"], r["q_id"], r["ndcg_micro"])
        for r in dcg.join(F.broadcast(idcg), "q_id")
        .withColumn(
            "ndcg_micro",
            F.expr("CAST(dcg_micro * 1000000 DIV idcg_micro AS BIGINT)"),
        )
        .collect()
    ]  # bounded: |grid| x |registry| rows
    qids = sorted({q for _, _, q, _ in perq})
    table = {}
    for k, b, q, v in perq:
        table.setdefault((k, b), {})[q] = v

    def mean_over(cfg, qs):
        vals = [table[cfg].get(q, 0) for q in qs]
        return sum(vals) // len(vals)

    alive = sorted(table)
    out_rounds = []
    evals = 0
    for rnd, (n_in, nq) in enumerate(SH_ROUNDS, start=1):
        qs = qids[:nq]
        evals += len(alive) * len(qs)
        ranked = sorted(
            alive, key=lambda c: (-mean_over(c, qs), c[0], c[1])
        )
        lead = ranked[0]
        out_rounds.append(
            (rnd, len(alive), len(qs), evals, lead[0], lead[1],
             mean_over(lead, qs))
        )
        alive = ranked[: max(1, len(alive) // 2)]
    winner = out_rounds[-1][4], out_rounds[-1][5]
    full = {c: mean_over(c, qids) for c in table}
    best = min(full, key=lambda c: (-full[c], c[0], c[1]))
    rows = [
        (
            *r,
            winner[0],
            winner[1],
            full[winner],
            full[best],
            full[best] - full[winner],
            evals,
            len(table) * len(qids),
        )
        for r in out_rounds
    ]
    return spark.createDataFrame(
        rows,
        "round long, n_configs long, n_queries_used long, evals_cum long,"
        " lead_k1m long, lead_bm long, lead_partial_ndcg long,"
        " winner_k1m long, winner_bm long, winner_full_ndcg long,"
        " grid_best_ndcg long, regret_micro long, sh_evals long,"
        " full_evals long",
    )


def _sql_sh_tune() -> str:
    gvals = ", ".join(f"({k}, {b})" for k, b in SH_GRID)
    contrib = (
        _GRID_CONTRIB.replace("(n - df", "(stats.n - dfq.df")
        .replace("(df + 0.5e0)", "(dfq.df + 0.5e0)")
        .replace("(tf *", "(tf.tf *")
        .replace("(tf +", "(tf.tf +")
        .replace("* dl /", "* dl.dl /")
        .replace("/ avgdl", "/ stats.avgdl")
    )
    parts = [
        _SQL_GRADED_PREFIX
        + f""",
shgrid AS (SELECT * FROM (VALUES {gvals}) g(k1m, bm)),
shsc AS (
  SELECT k1m, bm, q.q_id, tf.doc_id,
         round(sum({contrib}), 6) AS score
  FROM qsel q JOIN tf USING (term) JOIN dfq USING (term)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats CROSS JOIN shgrid
  GROUP BY 1, 2, 3, 4
),
shdcg AS (
  SELECT k1m, bm, q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_micro
  FROM (
    SELECT s.k1m, s.bm, s.q_id, g.rel,
           row_number() OVER (PARTITION BY s.k1m, s.bm, s.q_id
                              ORDER BY s.score DESC, s.doc_id ASC) AS rnk
    FROM shsc s JOIN graded g ON g.q_id = s.q_id AND g.doc_id = s.doc_id
  ) WHERE rnk <= {NDCG_K} GROUP BY 1, 2, 3
),
shidcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS idcg_micro FROM (
    SELECT q_id, rel,
           row_number() OVER (
             PARTITION BY q_id ORDER BY rel DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
),
shpq AS MATERIALIZED (
  SELECT d.k1m, d.bm, d.q_id,
         CAST(d.dcg_micro * 1000000 // i.idcg_micro AS BIGINT) AS ndcg
  FROM shdcg d JOIN shidcg i USING (q_id)
),
shq AS MATERIALIZED (
  SELECT q_id, row_number() OVER (ORDER BY q_id) AS qrk
  FROM (SELECT DISTINCT q_id FROM shpq)
)"""
    ]
    prev_alive = None
    for rnd, (n_in, nq) in enumerate(SH_ROUNDS, start=1):
        src = "shgrid" if prev_alive is None else prev_alive
        parts.append(
            f""",
shm{rnd} AS MATERIALIZED (
  SELECT a.k1m, a.bm,
         CAST(sum(coalesce(p.ndcg, 0)) // count(*) AS BIGINT) AS pmean,
         row_number() OVER (
           ORDER BY sum(coalesce(p.ndcg, 0)) // count(*) DESC,
                    a.k1m ASC, a.bm ASC) AS crk
  FROM {src} a
  CROSS JOIN (SELECT q_id FROM shq WHERE qrk <= {nq}) qq
  LEFT JOIN shpq p
    ON p.k1m = a.k1m AND p.bm = a.bm AND p.q_id = qq.q_id
  GROUP BY a.k1m, a.bm
)"""
        )
        prev_alive = (
            f"(SELECT k1m, bm FROM shm{rnd} WHERE crk <= {max(1, n_in // 2)})"
        )
    rows_sql = " UNION ALL ".join(
        f"SELECT CAST({rnd} AS BIGINT) AS round,"
        f" CAST({n_in} AS BIGINT) AS n_configs,"
        f" CAST({nq} AS BIGINT) AS n_queries_used,"
        f" CAST({sum(SH_ROUNDS[i][0] * SH_ROUNDS[i][1] for i in range(rnd))}"
        f" AS BIGINT) AS evals_cum,"
        f" (SELECT k1m FROM shm{rnd} WHERE crk = 1) AS lead_k1m,"
        f" (SELECT bm FROM shm{rnd} WHERE crk = 1) AS lead_bm,"
        f" (SELECT pmean FROM shm{rnd} WHERE crk = 1) AS lead_partial_ndcg"
        for rnd, (n_in, nq) in enumerate(SH_ROUNDS, start=1)
    )
    n_rounds = len(SH_ROUNDS)
    sh_evals = sum(n * q for n, q in SH_ROUNDS)
    full_evals = len(SH_GRID) * 16
    parts.append(
        f""",
shfull AS MATERIALIZED (
  SELECT g.k1m, g.bm,
         CAST(sum(coalesce(p.ndcg, 0)) // count(*) AS BIGINT) AS fmean
  FROM shgrid g
  CROSS JOIN shq qq
  LEFT JOIN shpq p
    ON p.k1m = g.k1m AND p.bm = g.bm AND p.q_id = qq.q_id
  GROUP BY 1, 2
),
shwin AS (
  SELECT k1m AS wk, bm AS wb FROM shm{n_rounds} WHERE crk = 1
),
shbest AS (
  SELECT fmean AS best_ndcg FROM shfull
  ORDER BY fmean DESC, k1m ASC, bm ASC LIMIT 1
),
shrounds AS ({rows_sql})
SELECT r.round, r.n_configs, r.n_queries_used, r.evals_cum,
       r.lead_k1m, r.lead_bm, r.lead_partial_ndcg,
       w.wk AS winner_k1m, w.wb AS winner_bm,
       f.fmean AS winner_full_ndcg,
       b.best_ndcg AS grid_best_ndcg,
       CAST(b.best_ndcg - f.fmean AS BIGINT) AS regret_micro,
       CAST({sh_evals} AS BIGINT) AS sh_evals,
       CAST({full_evals} AS BIGINT) AS full_evals
FROM shrounds r
CROSS JOIN shwin w
JOIN shfull f ON f.k1m = w.wk AND f.bm = w.wb
CROSS JOIN shbest b"""
    )
    return "".join(parts)


QUERIES["ft_sh_tune_eval"] = (ft_sh_tune_eval, _sql_sh_tune())
