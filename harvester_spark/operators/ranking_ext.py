"""Second-ranking-family extensions: explain, common-terms, rescore, spans.

Five OpenSearch/Lucene serving surfaces the reference reaches only through
its OpenSearch cluster, re-expressed as verifiable (Spark, DuckDB-oracle)
pairs over the ONE repo-wide BM25 contract:

- ``ft_explain_score`` — the ``_explain`` API: per-(doc, term) BM25 score
  decomposition (tf, df, dl, idf, contribution) for the flagship OR
  query's top-10 documents. The reference surfaces opaque OpenSearch
  scores (/root/reference/harvester/search/views/document.py search
  endpoints); explain is how a ranking engineer audits them.
- ``ft_common_terms_topk`` — Lucene ``CommonTermsQuery``: query terms are
  split by document frequency at ``CT_CUTOFF`` — low-frequency terms are
  REQUIRED (candidate gate), high-frequency terms only contribute score.
  This is the classic stop-word-free way to keep head terms from
  exploding the candidate set: at web scale candidates come from the
  rare-term postings only (25 docs here, not 398).
- ``ft_rescore_topk`` — the ES ``rescore`` window: first-pass disjunctive
  BM25 selects ``RESCORE_WINDOW`` candidates; only that bounded window is
  re-scored with an exact-adjacency phrase bonus
  (``query_weight*orig + rescore_query_weight*phrase_tf``). The corpus
  never sees the phrase scan — the same bounded-rerank shape as the
  recency boost (search/api.py `_search_recency`).
- ``ft_span_first`` — Lucene ``SpanFirstQuery(term, end)``: documents
  whose first occurrence of the term falls inside the leading window,
  with the in-window occurrence count.
- ``ft_span_not`` — Lucene ``SpanNotQuery(include, exclude, pre, post)``:
  adjacent-bigram include spans surviving removal of spans that overlap
  an exclude term within [start-pre, start+1+post].

Determinism contract (operators/__init__.py): the BM25 expression text is
identical to fulltext_queries.SQL_BM25_TOPK (one formula repo-wide);
ln-derived components use the integer micro-unit idiom
``CAST(floor(x * 1.0e6 + 0.5e0) AS BIGINT)`` (all components positive);
per-doc scores are round(.,6); every top-k tie-breaks (score desc,
doc_id asc); array sizes/positions are cast BIGINT on both engines
(Spark ``size``/``pos`` are INT, DuckDB ``len``/``range`` are BIGINT).

Scale shapes:
- explain: the per-term join-back is semi-joined to the broadcast 10-row
  top list — bounded output, no second corpus pass beyond the tf agg the
  scoring already did.
- common-terms: the REQUIRED set is rare by construction, so the gating
  filter keeps the scored candidate set at Σ df(rare) rows; head terms
  join into that small set (at cluster scale: the WAND must-have list).
- rescore: phrase extraction runs on |window| = 50 docs via a broadcast
  semi-join on the token-array scan — O(window), not O(corpus).
- spans: one array expression per document, zero extra exchanges beyond
  the per-doc aggregation the tokenizer explode already co-partitions
  (span_first) or none at all (span_not is map-only + filter).
"""

from __future__ import annotations

import math

from pyspark.sql import Window as W, functions as F

from harvester_spark.analysis import tokens_column
from harvester_spark.operators.common import SQL_DOC_TOKS, SQL_TOKS, doc_tokens, load
from harvester_spark.operators.fulltext_queries import BM25_TERMS, bm25_or_scored

# CommonTermsQuery: rare iff df < CT_CUTOFF_NUM/CT_CUTOFF_DEN of corpus size
# (integer cross-engine comparison: df * DEN < n * NUM).
CT_TERMS = ["dup", "scan", "merge"]  # 'dup' is the corpus's only rare term
CT_CUTOFF_NUM, CT_CUTOFF_DEN = 3, 10  # cutoff_frequency = 0.3

RESCORE_WINDOW = 50
RESCORE_PHRASE = ("key", "value")  # exact-adjacency rescore query
# rescore_query_weight = 0.5, query_weight = 1 (ES score_mode=total)

SPAN_TERM = "value"
SPAN_END = 8  # SpanFirstQuery end boundary (positions 0..7)

SPAN_INC = ("key", "value")  # SpanNot include: adjacent bigram
SPAN_EXC = "slow"  # SpanNot exclude term
SPAN_PRE, SPAN_POST = 1, 1


def _bm25_components(spark, sf_dir, terms):
    """Per-(doc, term) BM25 components over ``terms`` — the shared
    decomposition both explain and common-terms build on. Columns:
    doc_id, term, tf, df, dl, n, idf, contrib."""
    toks = doc_tokens(spark, sf_dir)
    docs_n = load(spark, sf_dir, "documents")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = docs_n.select(F.count("*").alias("n")).crossJoin(
        dl.select((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return (
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
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
        )
    )


def _sql_components(terms) -> str:
    """DuckDB CTE block computing the same per-(doc, term) components."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
toks AS ({SQL_DOC_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0 / count(*) FROM dl) AS avgdl
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY term, doc_id
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
comps AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df, dl.dl, stats.n,
         ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) AS idf,
         ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS contrib
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)"""


def ft_explain_score(spark, sf_dir):
    """ES ``_explain`` twin: per-term decomposition for the flagship OR
    top-10. The 10-row top list is broadcast back into the component rows
    — the audit costs one bounded join, never a second corpus pass."""
    comps = _bm25_components(spark, sf_dir, BM25_TERMS)
    scored = comps.groupBy("doc_id").agg(F.round(F.sum("contrib"), 6).alias("score"))
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    top = top.withColumn("rank", F.row_number().over(w))
    return (
        comps.join(F.broadcast(top), "doc_id")
        .select(
            "rank",
            "doc_id",
            "score",
            "term",
            "tf",
            "df",
            "dl",
            F.floor(F.col("idf") * 1.0e6 + 0.5).cast("long").alias("idf_micro"),
            F.floor(F.col("contrib") * 1.0e6 + 0.5).cast("long").alias("contrib_micro"),
        )
    )


SQL_EXPLAIN_SCORE = f"""
WITH {_sql_components(BM25_TERMS)},
scored AS (SELECT doc_id, round(sum(contrib), 6) AS score FROM comps GROUP BY doc_id),
top AS (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
         doc_id, score
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT top.rank, c.doc_id, top.score, c.term,
       CAST(c.tf AS BIGINT) AS tf, CAST(c.df AS BIGINT) AS df,
       CAST(c.dl AS BIGINT) AS dl,
       CAST(floor(c.idf * 1.0e6 + 0.5e0) AS BIGINT) AS idf_micro,
       CAST(floor(c.contrib * 1.0e6 + 0.5e0) AS BIGINT) AS contrib_micro
FROM comps c JOIN top USING (doc_id)
"""


def ft_common_terms_topk(spark, sf_dir):
    """Lucene CommonTermsQuery: low-df terms REQUIRED (all must match),
    high-df terms score-only. Rare is an integer predicate
    ``df * DEN < n * NUM`` so both engines agree exactly; the candidate
    set is gated by the rare postings alone."""
    comps = _bm25_components(spark, sf_dir, CT_TERMS)
    rare_flag = (F.col("df") * CT_CUTOFF_DEN < F.col("n") * CT_CUTOFF_NUM).cast("int")
    df_n = comps.select("term", "df", "n").distinct()
    rare_total = df_n.agg(
        F.sum((F.col("df") * CT_CUTOFF_DEN < F.col("n") * CT_CUTOFF_NUM).cast("int")).alias(
            "rare_total"
        )
    )
    scored = (
        comps.withColumn("rare", rare_flag)
        .groupBy("doc_id")
        .agg(
            F.sum("rare").alias("n_rare"),
            F.round(F.sum("contrib"), 6).alias("score"),
        )
        .crossJoin(F.broadcast(rare_total))
        .filter(F.col("n_rare") == F.col("rare_total"))
        .select("doc_id", "score")
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


SQL_COMMON_TERMS_TOPK = f"""
WITH {_sql_components(CT_TERMS)},
rare_total AS (
  SELECT count(*) AS rt FROM (SELECT DISTINCT term, df, n FROM comps)
  WHERE df * {CT_CUTOFF_DEN} < n * {CT_CUTOFF_NUM}
),
scored AS (
  SELECT doc_id,
         sum(CASE WHEN df * {CT_CUTOFF_DEN} < n * {CT_CUTOFF_NUM} THEN 1 ELSE 0 END) AS n_rare,
         round(sum(contrib), 6) AS score
  FROM comps GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM scored CROSS JOIN rare_total WHERE n_rare = rt
ORDER BY rank LIMIT 10
"""


def ft_rescore_topk(spark, sf_dir):
    """ES rescore window: disjunctive BM25 top-50, then ONLY those 50 docs
    get the exact-adjacency phrase bonus (broadcast semi-join onto the
    token-array scan — the phrase never scans the corpus). Combined =
    round(orig + 0.5 * phrase_tf, 6)."""
    a, b = RESCORE_PHRASE
    scored = bm25_or_scored(spark, sf_dir)
    win = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        RESCORE_WINDOW
    )
    tarr = load(spark, sf_dir, "documents").select(
        "doc_id", tokens_column(F.col("text")).alias("toks")
    )
    ph = tarr.join(F.broadcast(win.select("doc_id")), "doc_id").select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(toks) >= 2 THEN size(filter(sequence(0, size(toks)-2),"
            f" i -> toks[i] = '{a}' AND toks[i+1] = '{b}'))"
            f" ELSE 0 END"
        )
        .cast("long")
        .alias("phrase_tf"),
    )
    combined = (
        win.join(ph, "doc_id")
        .withColumn("combined", F.round(F.col("score") + 0.5 * F.col("phrase_tf"), 6))
        .select("doc_id", F.col("score").alias("orig_score"), "phrase_tf", "combined")
    )
    top = combined.orderBy(F.col("combined").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("combined").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", F.col("combined").alias("score"), "orig_score", "phrase_tf"
    )


_T = SQL_TOKS.format(col="text")

SQL_RESCORE_TOPK = f"""
WITH {_sql_components(BM25_TERMS)},
scored AS (SELECT doc_id, round(sum(contrib), 6) AS score FROM comps GROUP BY doc_id),
win AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT {RESCORE_WINDOW}),
tarr AS (SELECT doc_id, {_T} AS toks FROM documents),
ph AS (
  SELECT w.doc_id, w.score AS orig_score,
         CAST(len([i FOR i IN range(0, greatest(len(t.toks) - 1, 0))
                   IF t.toks[i+1] = '{RESCORE_PHRASE[0]}' AND t.toks[i+2] = '{RESCORE_PHRASE[1]}']) AS BIGINT)
           AS phrase_tf
  FROM win w JOIN tarr t USING (doc_id)
),
combined AS (
  SELECT doc_id, orig_score, phrase_tf,
         round(orig_score + 0.5e0 * phrase_tf, 6) AS combined
  FROM ph
)
SELECT CAST(row_number() OVER (ORDER BY combined DESC, doc_id ASC) AS INT) AS rank,
       doc_id, combined AS score, orig_score, phrase_tf
FROM combined ORDER BY rank LIMIT 10
"""


def ft_span_first(spark, sf_dir):
    """SpanFirstQuery(term, end): docs whose first '{term}' occurrence is
    inside positions [0, end); returns first position + in-window count.
    One term-filtered aggregation — the postings shape serving uses."""
    toks = doc_tokens(spark, sf_dir)
    return (
        toks.filter(F.col("term") == SPAN_TERM)
        .groupBy("doc_id")
        .agg(
            F.min("pos").cast("long").alias("first_pos"),
            F.sum(F.when(F.col("pos") < SPAN_END, 1).otherwise(0)).alias("n_within"),
        )
        .filter(F.col("first_pos") < SPAN_END)
        .select("doc_id", "first_pos", "n_within")
    )


SQL_SPAN_FIRST = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT doc_id, CAST(min(pos) AS BIGINT) AS first_pos,
       CAST(sum(CASE WHEN pos < {SPAN_END} THEN 1 ELSE 0 END) AS BIGINT) AS n_within
FROM toks WHERE term = '{SPAN_TERM}'
GROUP BY doc_id HAVING min(pos) < {SPAN_END}
"""


def ft_span_not(spark, sf_dir):
    """SpanNotQuery(include=adjacent bigram, exclude=term, pre=1, post=1):
    per doc, bigram start positions surviving removal of any start s with
    an exclude occurrence in [s-pre, s+1+post]. Map-only array
    expressions — zero exchanges."""
    a, b = SPAN_INC
    lo, hi = -SPAN_PRE, 1 + SPAN_POST
    docs = load(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        tokens_column(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(toks) >= 2 THEN filter(sequence(0, size(toks)-2),"
            f" i -> toks[i] = '{a}' AND toks[i+1] = '{b}')"
            f" ELSE cast(array() AS array<int>) END"
        ).alias("starts"),
        F.expr(
            f"CASE WHEN size(toks) >= 1 THEN filter(sequence(0, size(toks)-1),"
            f" j -> toks[j] = '{SPAN_EXC}')"
            f" ELSE cast(array() AS array<int>) END"
        ).alias("excl"),
    )
    return (
        s.filter(F.size("starts") > 0)
        .select(
            "doc_id",
            F.size("starts").cast("long").alias("n_spans"),
            F.expr(
                f"size(filter(starts, s -> size(filter(excl,"
                f" j -> j >= s + ({lo}) AND j <= s + {hi})) = 0))"
            )
            .cast("long")
            .alias("n_kept"),
        )
    )


SQL_SPAN_NOT = f"""
WITH t AS (SELECT doc_id, {_T} AS toks FROM documents),
s AS (
  SELECT doc_id,
         [i FOR i IN range(0, greatest(len(toks) - 1, 0))
            IF toks[i+1] = '{SPAN_INC[0]}' AND toks[i+2] = '{SPAN_INC[1]}'] AS starts,
         [j FOR j IN range(0, len(toks)) IF toks[j+1] = '{SPAN_EXC}'] AS excl
  FROM t
)
SELECT doc_id, CAST(len(starts) AS BIGINT) AS n_spans,
       CAST(len(list_filter(starts, s -> len(list_filter(excl,
              j -> j >= s + ({-SPAN_PRE}) AND j <= s + {1 + SPAN_POST})) = 0)) AS BIGINT)
         AS n_kept
FROM s WHERE len(starts) > 0
"""


QUERIES = {
    "ft_explain_score": (ft_explain_score, SQL_EXPLAIN_SCORE),
    "ft_common_terms_topk": (ft_common_terms_topk, SQL_COMMON_TERMS_TOPK),
    "ft_rescore_topk": (ft_rescore_topk, SQL_RESCORE_TOPK),
    "ft_span_first": (ft_span_first, SQL_SPAN_FIRST),
    "ft_span_not": (ft_span_not, SQL_SPAN_NOT),
}


# --- Lucene intervals query (ES `intervals`, ordered + max_gaps) -----------
#
# Distinct from phrase slop: slop is a per-edit budget on the move distance;
# an ordered INTERVAL match requires occurrences i1 < i2 < i3 of the terms
# in order whose total stretch (end - start + 1 - n_terms) is <= max_gaps.
# A document end-position e of the last term admits a match iff
#   ∃ x2 ∈ p2: x2 < e ∧ ∃ x1 ∈ p1: x1 < x2 ∧ x1 >= e - max_gaps - (n-1)
# (if any witness chain exists, the minimal chain ending at e also
# qualifies — Lucene's minimal-interval semantics per end position).
# n_intervals counts qualifying end positions.
#
# Scale shape: map-only — per-term position arrays and the nested-exists
# check are array expressions over the tokenized text; the only exchange
# would be a downstream consumer's. At 100 TB: narrow scan, codegen.

IV_TERMS = ("key", "value", "table")
IV_MAX_GAPS = 2


def ft_intervals_ordered(spark, sf_dir):
    """ES intervals query (ordered, max_gaps): per-doc count of last-term
    end positions admitting an in-order chain within the gap budget."""
    a, b, c = IV_TERMS
    slack = IV_MAX_GAPS + len(IV_TERMS) - 1
    docs = load(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        tokens_column(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        *[
            F.expr(
                f"CASE WHEN size(toks) >= 1 THEN filter(sequence(0, size(toks)-1),"
                f" i -> toks[i] = '{t}') ELSE cast(array() AS array<int>) END"
            ).alias(name)
            for name, t in (("p1", a), ("p2", b), ("p3", c))
        ],
    )
    return (
        pos.select(
            "doc_id",
            F.expr(
                f"size(filter(p3, e -> exists(p2, x2 -> x2 < e AND"
                f" exists(p1, x1 -> x1 < x2 AND x1 >= e - {slack}))))"
            )
            .cast("long")
            .alias("n_intervals"),
        )
        .filter(F.col("n_intervals") > 0)
    )


def _sql_intervals_ordered() -> str:
    tk = _T
    a, b, c = IV_TERMS
    slack = IV_MAX_GAPS + len(IV_TERMS) - 1
    return f"""
WITH t AS (SELECT doc_id, {tk} AS toks FROM documents),
pos AS (
  SELECT doc_id,
         [i FOR i IN range(0, len(toks)) IF toks[i+1] = '{a}'] AS p1,
         [i FOR i IN range(0, len(toks)) IF toks[i+1] = '{b}'] AS p2,
         [i FOR i IN range(0, len(toks)) IF toks[i+1] = '{c}'] AS p3
  FROM t
)
SELECT doc_id,
       CAST(len(list_filter(p3, e ->
         len(list_filter(p2, x2 -> x2 < e AND
           len(list_filter(p1, x1 -> x1 < x2 AND x1 >= e - {slack})) > 0)) > 0
       )) AS BIGINT) AS n_intervals
FROM pos
WHERE len(list_filter(p3, e ->
        len(list_filter(p2, x2 -> x2 < e AND
          len(list_filter(p1, x1 -> x1 < x2 AND x1 >= e - {slack})) > 0)) > 0
      )) > 0
"""


QUERIES["ft_intervals_ordered"] = (ft_intervals_ordered, _sql_intervals_ordered())


# --- ES terms_set query (per-doc minimum_should_match) ----------------------
#
# ES `terms_set`: match docs containing at least `m` of the query terms
# (minimum_should_match_script / _field); score is the usual BM25 sum over
# the terms the doc DOES contain. m = TS_MIN_MATCH of TS_TERMS here.
#
# Scale shape: identical to the OR kernel (one tf agg over the term-filtered
# postings, one per-doc agg); the m-of-n gate is a HAVING on the counted
# distinct terms — no extra pass, and at serving time the WAND upper-bound
# dispatch applies unchanged (m-of-n tightens the threshold).

TS_TERMS = ["dup", "key", "value", "table"]
TS_MIN_MATCH = 2


def ft_terms_set_match(spark, sf_dir):
    """terms_set m-of-n: BM25 top-10 over docs matching >= TS_MIN_MATCH of
    TS_TERMS, plus the matched-term count."""
    comps = _bm25_components(spark, sf_dir, TS_TERMS)
    scored = (
        comps.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.round(F.sum("contrib"), 6).alias("score"),
        )
        .filter(F.col("n_matched") >= TS_MIN_MATCH)
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "n_matched", "score"
    )


SQL_TERMS_SET_MATCH = f"""
WITH {_sql_components(TS_TERMS)},
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         round(sum(contrib), 6) AS score
  FROM comps GROUP BY doc_id HAVING count(*) >= {TS_MIN_MATCH}
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, n_matched, score
FROM scored ORDER BY rank LIMIT 10
"""


# --- ES rank_feature query (saturation function) ----------------------------
#
# ES `rank_feature`: a static per-document feature folded into the score via
# the saturation function boost * x / (x + pivot) — the standard way to blend
# pagerank/recency/length priors into BM25 without unbounded dominance.
# Feature here: n_chars (the corpus's static doc-value), pivot = its
# corpus-wide mean ES default analogue (fixed constant RF_PIVOT so both
# engines share one literal); boost RF_BOOST.
#
# Scale shape: the feature join is docs-side (doc_id keyed, same partitioning
# as dl), the saturation is a scalar expression — zero cost over the OR
# kernel. Serving-side this is a WAND-compatible additive prior: the
# feature's max saturates at boost, so block upper bounds stay valid with a
# +boost slack.

RF_PIVOT = 1200  # saturation pivot (chars)
RF_BOOST = 2.0


def ft_rank_feature_topk(spark, sf_dir):
    """BM25 OR + rank_feature(n_chars) saturation top-10:
    combined = round(bm25 + boost * x/(x+pivot), 6)."""
    scored = bm25_or_scored(spark, sf_dir)
    feats = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return _take10(
        scored.join(feats, "doc_id").select(
            "doc_id",
            F.round(
                F.col("score")
                + RF_BOOST * F.col("n_chars") / (F.col("n_chars") + F.lit(RF_PIVOT)),
                6,
            ).alias("score"),
        )
    )


def _take10(scored):
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


SQL_RANK_FEATURE_TOPK = f"""
WITH {_sql_components(BM25_TERMS)},
-- round(.,6) BEFORE the blend, exactly like the Spark side's shared OR
-- kernel (bm25_or_scored) — both engines must blend from the SAME 6dp base
-- or the final rounding flips at .5 boundaries.
scored AS (SELECT doc_id, round(sum(contrib), 6) AS bm25 FROM comps GROUP BY doc_id),
combined AS (
  SELECT s.doc_id,
         round(s.bm25 + {RF_BOOST}e0 * d.n_chars * 1.0e0
               / (d.n_chars + {RF_PIVOT}), 6) AS score
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM combined ORDER BY rank LIMIT 10
"""


QUERIES["ft_terms_set_match"] = (ft_terms_set_match, SQL_TERMS_SET_MATCH)
QUERIES["ft_rank_feature_topk"] = (ft_rank_feature_topk, SQL_RANK_FEATURE_TOPK)


# ------------------------------------------------- pointwise linear LTR

# The learning-to-rank serving shape (ES `rescore` with a model, or the
# LTR plugin the reference's OpenSearch tier would grow into): first-pass
# BM25 proposes, a feature vector per (query, doc) is assembled, and a
# pointwise linear model re-scores. The MODEL here is a fixed integer
# weight vector (training is out of scope — what the gate must prove is
# the feature-extraction + blend plan, the part that runs at corpus
# scale); features are the standard LTR basics: the BM25 score itself,
# match completeness, raw tf mass, doc length, and a document-quality
# prior (n_chars). Everything blends in int64 micro-units — the BM25
# double is recovered through the ONE shared _BM25_MICRO_EXPR string, the
# rest are exact integers, so both engines agree bit-for-bit.
#
# Scale shape: the feature join is the OR kernel's own aggregation plus
# ONE broadcast-dim join (documents n_chars is doc-keyed, rides the same
# key); the tail is TakeOrdered(LTR_K), never a global sort.

LTR_K = 20
# (w_bm25, w_match, w_tf, w_dl, w_chars) — relevance dominates, quality
# prior nudges, length penalizes slightly
LTR_W = (3, 500_000, 20_000, -100, 10)

_LTR_SCORE = (
    f"CAST({LTR_W[0]} * bm25_micro + {LTR_W[1]} * n_match"
    f" + {LTR_W[2]} * tf_sum + {LTR_W[3]} * dl"
    f" + {LTR_W[4]} * n_chars AS BIGINT)"
)


def ltr_pointwise_topk(spark, sf_dir):
    """(rank, doc_id, bm25_micro, n_match, tf_sum, dl, n_chars, ltr_micro):
    top-{LTR_K} under the fixed pointwise linear model over the flagship
    OR query's feature vectors."""
    comps = _bm25_components(spark, sf_dir, BM25_TERMS)
    feats = (
        comps.groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("score"),
            F.count("*").cast("long").alias("n_match"),
            F.sum("tf").cast("long").alias("tf_sum"),
            F.max("dl").cast("long").alias("dl"),
        )
        .join(load(spark, sf_dir, "documents").select("doc_id", "n_chars"), "doc_id")
        .withColumn("bm25_micro", F.expr("CAST(floor(score * 1.0e6 + 0.5e0) AS BIGINT)"))
        .withColumn("ltr_micro", F.expr(_LTR_SCORE))
    )
    top = feats.orderBy(F.col("ltr_micro").desc(), F.col("doc_id").asc()).limit(LTR_K)
    w = W.orderBy(F.col("ltr_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "bm25_micro", "n_match", "tf_sum", "dl",
        "n_chars", "ltr_micro",
    )


SQL_LTR_POINTWISE = f"""
WITH {_sql_components(BM25_TERMS)},
feats AS (
  SELECT c.doc_id,
         CAST(floor(round(sum(c.contrib), 6) * 1.0e6 + 0.5e0) AS BIGINT)
           AS bm25_micro,
         CAST(count(*) AS BIGINT) AS n_match,
         CAST(sum(c.tf) AS BIGINT) AS tf_sum,
         CAST(max(c.dl) AS BIGINT) AS dl
  FROM comps c GROUP BY c.doc_id
),
scored AS (
  SELECT f.doc_id, f.bm25_micro, f.n_match, f.tf_sum, f.dl,
         d.n_chars, {_LTR_SCORE} AS ltr_micro
  FROM feats f JOIN documents d USING (doc_id)
)
SELECT CAST(row_number() OVER (ORDER BY ltr_micro DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, bm25_micro, n_match, tf_sum, dl, n_chars, ltr_micro
FROM scored ORDER BY rank LIMIT {LTR_K}
"""

QUERIES["ltr_pointwise_topk"] = (ltr_pointwise_topk, SQL_LTR_POINTWISE)


# --------------------------------------------- ranker agreement (Kendall)

# When two ranking families serve the same query (the repo carries BM25
# and Dirichlet QL — the Lucene per-field similarity choice), the eval
# question is HOW MUCH they disagree: overlap@k and Kendall's tau over the
# common documents. This is the offline A/B diagnostic a relevance team
# runs before an interleaving experiment — and the integer twin of it:
# ranks are exact ints, tau is concordant/discordant pair counts with the
# mirrored-floor micro division (no float sums anywhere).
#
# Scale shape: both rankers end in TakeOrdered({AGREE_K}); everything
# after operates on two broadcast-sized 50-row lists (the pair join is
# ≤ 50², bounded by construction).

AGREE_K = 50
AGREE_LEVELS = (10, 25, 50)

# mirrored-floor integer tau: (c-d)·1e6 / (c+d), exact floor toward -inf
# avoided by the CASE mirror (both engines floor nonneg identically)
_TAU = (
    "CASE WHEN n_pairs = 0 THEN 0"
    " WHEN conc >= disc THEN ((conc - disc) * 1000000) {div} n_pairs"
    " ELSE -(((disc - conc) * 1000000) {div} n_pairs) END"
)


def ranker_agreement_eval(spark, sf_dir):
    """(k, n_common, jaccard_milli, conc, disc, tau_micro): BM25 vs
    Dirichlet-QL agreement at cut-offs {AGREE_LEVELS}."""
    scored_a = bm25_or_scored(spark, sf_dir)
    wa = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    top_a = (
        scored_a.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(AGREE_K)
        .withColumn("ra", F.row_number().over(wa).cast("long"))
        .select("doc_id", "ra")
    )
    top_b = _dirichlet_topn(spark, sf_dir, AGREE_K).select("doc_id", "rb")
    both = F.broadcast(top_a.join(top_b, "doc_id"))
    out = None
    for k in AGREE_LEVELS:
        ck = both.filter((F.col("ra") <= k) & (F.col("rb") <= k))
        i = ck.alias("i")
        j = ck.alias("j")
        pairs = i.join(j, F.col("i.doc_id") < F.col("j.doc_id")).select(
            (
                (F.col("i.ra") - F.col("j.ra")) * (F.col("i.rb") - F.col("j.rb"))
                > 0
            ).alias("is_conc")
        )
        row = (
            ck.agg(F.count("*").cast("long").alias("n_common"))
            .crossJoin(
                pairs.agg(
                    F.coalesce(F.sum(F.col("is_conc").cast("long")), F.lit(0))
                    .cast("long")
                    .alias("conc"),
                    F.coalesce(
                        F.sum((~F.col("is_conc")).cast("long")), F.lit(0)
                    )
                    .cast("long")
                    .alias("disc"),
                )
            )
            .select(
                F.lit(k).cast("long").alias("k"),
                "n_common",
                F.expr(
                    f"CAST((n_common * 1000) DIV ({2 * k} - n_common) AS BIGINT)"
                ).alias("jaccard_milli"),
                "conc",
                "disc",
                F.expr(
                    "CAST("
                    + _TAU.format(div="DIV").replace("n_pairs", "(conc + disc)")
                    + " AS BIGINT)"
                ).alias("tau_micro"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _dirichlet_topn(spark, sf_dir, n):
    """Top-n Dirichlet-QL docs (rb rank) — the ft_lm_dirichlet_topk kernel
    with a parameterized cut."""
    from harvester_spark.operators.fulltext_queries import _DIR_LP

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
        .withColumn("lp", F.expr(_DIR_LP))
        .groupBy("doc_id")
        .agg(F.sum("lp").cast("long").alias("logp_micro"))
    )
    wb = W.orderBy(F.col("logp_micro").desc(), F.col("doc_id").asc())
    return (
        scored.orderBy(F.col("logp_micro").desc(), F.col("doc_id").asc())
        .limit(n)
        .withColumn("rb", F.row_number().over(wb).cast("long"))
    )


def _sql_ranker_agreement() -> str:
    from harvester_spark.operators.fulltext_queries import _DIR_LP

    in_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    legs = []
    for k in AGREE_LEVELS:
        legs.append(f"""
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM common
        WHERE ra <= {k} AND rb <= {k}) AS n_common,
       CAST(((SELECT count(*) FROM common WHERE ra <= {k} AND rb <= {k}) * 1000)
            // ({2 * k} - (SELECT count(*) FROM common
                           WHERE ra <= {k} AND rb <= {k})) AS BIGINT)
         AS jaccard_milli,
       (SELECT CAST(coalesce(sum(CASE WHEN (i.ra - j.ra) * (i.rb - j.rb) > 0
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM common i JOIN common j ON i.doc_id < j.doc_id
        WHERE i.ra <= {k} AND i.rb <= {k} AND j.ra <= {k} AND j.rb <= {k})
         AS conc,
       (SELECT CAST(coalesce(sum(CASE WHEN (i.ra - j.ra) * (i.rb - j.rb) < 0
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM common i JOIN common j ON i.doc_id < j.doc_id
        WHERE i.ra <= {k} AND i.rb <= {k} AND j.ra <= {k} AND j.rb <= {k})
         AS disc""")
    leg_sql = " UNION ALL ".join(
        f"SELECT k, n_common, jaccard_milli, conc, disc, "
        f"CAST({_TAU.format(div='//').replace('n_pairs', '(conc + disc)')} AS BIGINT)"
        f" AS tau_micro FROM ({leg})"
        for leg in legs
    )
    return f"""
WITH {_sql_components(BM25_TERMS)},
scored_a AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM comps GROUP BY doc_id
),
top_a AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT)
           AS ra
  FROM scored_a ORDER BY score DESC, doc_id ASC LIMIT {AGREE_K}
),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
cfs AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN ({in_list}) GROUP BY 1
),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY 1, 2
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
scored_b AS (
  SELECT doc_id, CAST(sum({_DIR_LP}) AS BIGINT) AS logp_micro
  FROM joined GROUP BY doc_id
),
top_b AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY logp_micro DESC, doc_id ASC)
              AS BIGINT) AS rb
  FROM scored_b ORDER BY logp_micro DESC, doc_id ASC LIMIT {AGREE_K}
),
common AS MATERIALIZED (
  SELECT doc_id, ra, rb FROM top_a JOIN top_b USING (doc_id)
)
{leg_sql}
"""


QUERIES["ranker_agreement_eval"] = (ranker_agreement_eval, _sql_ranker_agreement())


# ------------------------------------------------- Clarity-score QPP
# Query performance prediction (Cronen-Townsend, Zhou & Croft, SIGIR 2002):
# the CLARITY of a query is KL(P(w | top-k docs) || P(w | corpus)) — an
# unfocused head query draws its top-k from all over the corpus and lands
# near the corpus LM (clarity ~ 0); a topical query's result LM diverges
# sharply. Ships next to ft_rank_eval_* as the PRE-JUDGMENT eval: it
# predicts which queries will rank badly before any qrels exist. The
# pre-retrieval predictor avg-idf rides along for comparison (the classic
# cheap proxy).
#
# Determinism: the result LM is quantized per (doc, term) BEFORE summing —
# p_num = sum_d (tf * 1e9 DIV dl) is an integer, so the distributed sum is
# order-free; each term's KL contribution quantizes to micro-nats through
# ONE shared float string on identical integers (sign-split mirror floor),
# and clarity is the exact integer sum of those contributions — the
# ft_bigram_lm_logprob contract extended to a per-query reduction.
#
# Scale shape: scoring reuses the flagship component join (term-filtered
# scan, broadcast df); top-k per query is a WindowGroupLimit rank; the LM
# join touches only the K * avg_dl token rows of the top documents
# (broadcast semi-join on the 60-row top list); corpus marginals are the
# one map-side cf agg the engine already computes. No driver loops.

QPP_QUERIES = {
    "head": ("key", "value"),
    "mixed": ("table", "merge"),
    "rare": ("dup", "scan"),
}
QPP_K = 20
_QPP_SCALE = 10**9

_QPP_X = (
    "((CAST(p_num AS DOUBLE) / (CAST(n_topk AS DOUBLE) * 1.0e9)) * "
    "ln((CAST(p_num AS DOUBLE) * n_tok) / "
    "(CAST(n_topk AS DOUBLE) * 1.0e9 * cf)))"
)
_QPP_CONTRIB = (
    f"CASE WHEN {_QPP_X} >= 0 THEN CAST(floor({_QPP_X} * 1.0e6 + 0.5e0) AS BIGINT) "
    f"ELSE CAST(-floor(-({_QPP_X}) * 1.0e6 + 0.5e0) AS BIGINT) END"
)
_QPP_IDF_MICRO = (
    "CAST(floor(ln(1.0e0 + (CAST(n AS DOUBLE) - df + 0.5e0) / (df + 0.5e0))"
    " * 1.0e6 + 0.5e0) AS BIGINT)"
)


def ft_clarity_qpp(spark, sf_dir):
    """(query_id, n_topk, avg_idf_micro, clarity_micro): Clarity-score
    QPP + avg-idf pre-retrieval predictor for {QPP_QUERIES}."""
    all_terms = sorted({t for ts in QPP_QUERIES.values() for t in ts})
    comps = _bm25_components(spark, sf_dir, all_terms)
    qt = spark.createDataFrame(
        [(q, t) for q, ts in sorted(QPP_QUERIES.items()) for t in ts],
        "query_id string, term string",
    )
    scored = (
        qt.join(comps, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    topk = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= QPP_K)
        .select("query_id", "doc_id")
    )
    nt = topk.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_topk")
    )

    toks = doc_tokens(spark, sf_dir)
    tf_all = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = tf_all.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    cf = toks.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    n_tok = F.broadcast(toks.agg(F.count("*").cast("long").alias("n_tok")))

    pn = (
        topk.join(tf_all, "doc_id")
        .join(dl, "doc_id")
        .groupBy("query_id", "term")
        .agg(
            F.sum(F.expr(f"(tf * {_QPP_SCALE}) DIV dl")).cast("long").alias("p_num")
        )
    )
    clarity = (
        pn.join(F.broadcast(nt), "query_id")
        .join(cf, "term")
        .crossJoin(n_tok)
        .select("query_id", F.expr(_QPP_CONTRIB).alias("x"))
        .groupBy("query_id")
        .agg(F.sum("x").cast("long").alias("clarity_micro"))
    )
    idf = (
        qt.join(comps.select("term", "df", "n").distinct(), "term")
        .select("query_id", F.expr(_QPP_IDF_MICRO).alias("idf_micro"))
        .groupBy("query_id")
        .agg(
            F.expr("CAST(sum(idf_micro) DIV count(*) AS BIGINT)").alias(
                "avg_idf_micro"
            )
        )
    )
    return (
        nt.join(idf, "query_id")
        .join(clarity, "query_id")
        .select("query_id", "n_topk", "avg_idf_micro", "clarity_micro")
    )


def _sql_clarity() -> str:
    all_terms = sorted({t for ts in QPP_QUERIES.values() for t in ts})
    qvals = ", ".join(
        f"('{q}', '{t}')" for q, ts in sorted(QPP_QUERIES.items()) for t in ts
    )
    return f"""
WITH {_sql_components(all_terms)},
qt AS (SELECT * FROM (VALUES {qvals}) v(query_id, term)),
scored AS (
  SELECT query_id, doc_id, round(sum(contrib), 6) AS score
  FROM qt JOIN comps USING (term)
  GROUP BY 1, 2
),
topk AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {QPP_K}
),
nt AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_topk FROM topk GROUP BY 1
),
tf_all AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
),
dla AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf_all GROUP BY 1),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks GROUP BY 1),
ntok AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM toks),
pn AS (
  SELECT query_id, term,
         CAST(sum((tf * {_QPP_SCALE}) // dl) AS BIGINT) AS p_num
  FROM topk JOIN tf_all USING (doc_id) JOIN dla USING (doc_id)
  GROUP BY 1, 2
),
clarity AS (
  SELECT query_id, CAST(sum({_QPP_CONTRIB}) AS BIGINT) AS clarity_micro
  FROM pn JOIN nt USING (query_id) JOIN cf USING (term) CROSS JOIN ntok
  GROUP BY 1
),
idf AS (
  SELECT query_id,
         CAST(sum({_QPP_IDF_MICRO}) // count(*) AS BIGINT) AS avg_idf_micro
  FROM qt JOIN (SELECT DISTINCT term, df, n FROM comps) c USING (term)
  GROUP BY 1
)
SELECT query_id, n_topk, avg_idf_micro, clarity_micro
FROM nt JOIN idf USING (query_id) JOIN clarity USING (query_id)
"""


QUERIES["ft_clarity_qpp"] = (ft_clarity_qpp, _sql_clarity())


# ------------------------------------------- post-retrieval QPP: NQC/WIG

# The two post-retrieval query-performance predictors that complete the
# QPP family next to clarity (ft_clarity_qpp): NQC (normalized query
# commitment, Shtok et al. 2012 — std of the top-k retrieval scores over
# the corpus-wide mean score; spiky score curves predict success) and WIG
# (weighted information gain, Zhou & Croft 2007 — mean top-k score minus
# the corpus-wide mean). Same {QPP_QUERIES} registry and the ONE repo
# BM25 kernel.
#
# Determinism: scores quantize to micro ints first; the top-k variance is
# the integer-moment idiom (n·s2 − s1², exact), the corpus mean is an
# exact integer floor-division, WIG is a pure integer difference, and
# only NQC's final sqrt touches doubles — through ONE shared expression
# string on identical integer inputs, reported in milli (the
# events_extended_stats sqrt-slack precedent). Both predictors omit the
# 1/sqrt(|q|) normalizer: every registry query has the same length, so it
# is a global constant that cannot reorder queries (documented, matching
# the per-query-constant folding in ranker_agreement_eval).
#
# Scale shape: the scoring plan is the flagship impact join; the moment
# aggregation is one q-keyed window top-k + two tiny aggs. Nothing new
# touches the corpus. Overflow: s_micro ≤ ~3e7 → s2 ≤ 20·9e14 = 1.8e16,
# var_num ≤ 20·1.8e16 = 3.6e17 < int64.

_NQC_MILLI = (
    "CAST(floor(sqrt(CAST(var_num AS DOUBLE)) * 1000.0e0"
    " / (CAST(n_topk AS DOUBLE) * CAST(mu_all AS DOUBLE)) + 0.5e0) AS BIGINT)"
)
_S_MICRO = "CAST(floor(score * 1.0e6 + 0.5e0) AS BIGINT)"


def ft_qpp_nqc_wig(spark, sf_dir):
    """(query_id, n_topk, mu_all_micro, wig_micro, nqc_milli): NQC and
    WIG post-retrieval predictors for the {QPP_QUERIES} registry."""
    all_terms = sorted({t for ts in QPP_QUERIES.values() for t in ts})
    comps = _bm25_components(spark, sf_dir, all_terms)
    qt = spark.createDataFrame(
        [(q, t) for q, ts in sorted(QPP_QUERIES.items()) for t in ts],
        "query_id string, term string",
    )
    scored = (
        qt.join(comps, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .withColumn("s", F.expr(_S_MICRO))
    )
    allm = scored.groupBy("query_id").agg(
        F.expr("CAST(sum(s) DIV count(*) AS BIGINT)").alias("mu_all")
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    topm = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= QPP_K)
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_topk"),
            F.sum("s").cast("long").alias("s1"),
            F.sum(F.col("s") * F.col("s")).cast("long").alias("s2"),
        )
        .withColumn("var_num", F.expr("n_topk * s2 - s1 * s1"))
    )
    return (
        topm.join(allm, "query_id")
        .select(
            "query_id",
            "n_topk",
            F.col("mu_all").alias("mu_all_micro"),
            F.expr("CAST(s1 DIV n_topk - mu_all AS BIGINT)").alias("wig_micro"),
            F.expr(_NQC_MILLI).alias("nqc_milli"),
        )
    )


def _sql_nqc_wig() -> str:
    all_terms = sorted({t for ts in QPP_QUERIES.values() for t in ts})
    qvals = ", ".join(
        f"('{q}', '{t}')" for q, ts in sorted(QPP_QUERIES.items()) for t in ts
    )
    return f"""
WITH {_sql_components(all_terms)},
qt AS (SELECT * FROM (VALUES {qvals}) v(query_id, term)),
scored AS (
  SELECT query_id, doc_id, score, {_S_MICRO} AS s FROM (
    SELECT query_id, doc_id, round(sum(contrib), 6) AS score
    FROM qt JOIN comps USING (term)
    GROUP BY 1, 2
  )
),
allm AS (
  SELECT query_id, CAST(sum(s) // count(*) AS BIGINT) AS mu_all
  FROM scored GROUP BY 1
),
topm AS (
  SELECT query_id,
         CAST(count(*) AS BIGINT) AS n_topk,
         CAST(sum(s) AS BIGINT) AS s1,
         CAST(sum(s * s) AS BIGINT) AS s2
  FROM (
    SELECT query_id, s,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {QPP_K}
  GROUP BY 1
)
SELECT query_id, n_topk,
       mu_all AS mu_all_micro,
       CAST(s1 // n_topk - mu_all AS BIGINT) AS wig_micro,
       {_NQC_MILLI} AS nqc_milli
FROM (SELECT *, n_topk * s2 - s1 * s1 AS var_num
      FROM topm JOIN allm USING (query_id))
"""


QUERIES["ft_qpp_nqc_wig"] = (ft_qpp_nqc_wig, _sql_nqc_wig())


# --------------------------------------------------- CombMNZ rank fusion

# The second fusion family next to hybrid_rrf_topk: CombMNZ (Fox & Shaw
# 1994; Lee 1997) — min-max-normalize each ranker's scores over its own
# top pool, sum them, and multiply by the number of lists that retrieved
# the doc, rewarding cross-ranker consensus where RRF only counts ranks.
# Fuses the repo's two ranking families (BM25-OR and Dirichlet-QL — the
# ranker_agreement_eval pair) over their top-{FUSE_POOL} pools.
#
# Determinism: both raw scores quantize to micro ints first (the BM25
# double through the ONE shared floor string, Dirichlet is already
# integer micro-nats); min-max normalization is (s − mn)·1e6 DIV
# greatest(mx − mn, 1) on nonnegative differences; the fused score is a
# pure integer product. Unique tie-break (fused desc, doc_id asc).
#
# Scale shape: two TakeOrdered(FUSE_POOL) serving plans (each the
# existing ranker's plan), two scalar min/max aggs broadcast back over
# 20-row frames, one outer join of two 20-row lists. Fusion itself costs
# nothing at any scale.

FUSE_POOL = 20
FUSE_K = 10


def hybrid_combmnz_topk(spark, sf_dir):
    """(rank, doc_id, n_lists, na_micro, nb_micro, fused): CombMNZ fusion
    of the BM25-OR and Dirichlet-QL top-{FUSE_POOL} pools."""
    scored_a = bm25_or_scored(spark, sf_dir)
    top_a = (
        scored_a.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(FUSE_POOL)
        .withColumn("sa", F.expr("CAST(floor(score * 1.0e6 + 0.5e0) AS BIGINT)"))
        .select("doc_id", "sa")
    )
    amm = F.broadcast(
        top_a.agg(
            F.min("sa").cast("long").alias("mna"),
            F.max("sa").cast("long").alias("mxa"),
        )
    )
    na = top_a.crossJoin(amm).select(
        "doc_id",
        F.expr(
            "CAST((sa - mna) * 1000000 DIV greatest(mxa - mna, CAST(1 AS BIGINT))"
            " AS BIGINT)"
        ).alias("na_micro"),
    )
    top_b = _dirichlet_topn(spark, sf_dir, FUSE_POOL).select("doc_id", "logp_micro")
    bmm = F.broadcast(
        top_b.agg(
            F.min("logp_micro").cast("long").alias("mnb"),
            F.max("logp_micro").cast("long").alias("mxb"),
        )
    )
    nb = top_b.crossJoin(bmm).select(
        "doc_id",
        F.expr(
            "CAST((logp_micro - mnb) * 1000000"
            " DIV greatest(mxb - mnb, CAST(1 AS BIGINT)) AS BIGINT)"
        ).alias("nb_micro"),
    )
    fused = (
        na.join(nb, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce("na_micro", F.lit(0)).cast("long").alias("na_micro"),
            F.coalesce("nb_micro", F.lit(0)).cast("long").alias("nb_micro"),
            (
                (F.col("na_micro").isNotNull().cast("long"))
                + (F.col("nb_micro").isNotNull().cast("long"))
            ).alias("n_lists"),
        )
        .withColumn(
            "fused", F.expr("CAST(n_lists * (na_micro + nb_micro) AS BIGINT)")
        )
    )
    top = fused.orderBy(F.col("fused").desc(), F.col("doc_id").asc()).limit(FUSE_K)
    w = W.orderBy(F.col("fused").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "n_lists", "na_micro", "nb_micro", "fused"
    )


def _sql_combmnz() -> str:
    from harvester_spark.operators.fulltext_queries import _DIR_LP

    in_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH {_sql_components(BM25_TERMS)},
scored_a AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM comps GROUP BY doc_id
),
top_a AS (
  SELECT doc_id, CAST(floor(score * 1.0e6 + 0.5e0) AS BIGINT) AS sa
  FROM scored_a ORDER BY score DESC, doc_id ASC LIMIT {FUSE_POOL}
),
amm AS (SELECT min(sa) AS mna, max(sa) AS mxa FROM top_a),
na AS (
  SELECT doc_id,
         CAST((sa - mna) * 1000000 // greatest(mxa - mna, 1) AS BIGINT)
           AS na_micro
  FROM top_a CROSS JOIN amm
),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
cfs AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN ({in_list}) GROUP BY 1
),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY 1, 2
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
scored_b AS (
  SELECT doc_id, CAST(sum({_DIR_LP}) AS BIGINT) AS logp_micro
  FROM joined GROUP BY doc_id
),
top_b AS (
  SELECT doc_id, logp_micro
  FROM scored_b ORDER BY logp_micro DESC, doc_id ASC LIMIT {FUSE_POOL}
),
bmm AS (SELECT min(logp_micro) AS mnb, max(logp_micro) AS mxb FROM top_b),
nb AS (
  SELECT doc_id,
         CAST((logp_micro - mnb) * 1000000 // greatest(mxb - mnb, 1)
           AS BIGINT) AS nb_micro
  FROM top_b CROSS JOIN bmm
),
fused AS (
  SELECT coalesce(na.doc_id, nb.doc_id) AS doc_id,
         CAST(coalesce(na.na_micro, 0) AS BIGINT) AS na_micro,
         CAST(coalesce(nb.nb_micro, 0) AS BIGINT) AS nb_micro,
         CAST((na.doc_id IS NOT NULL)::INT + (nb.doc_id IS NOT NULL)::INT
           AS BIGINT) AS n_lists
  FROM na FULL OUTER JOIN nb ON na.doc_id = nb.doc_id
)
SELECT CAST(row_number() OVER (
         ORDER BY n_lists * (na_micro + nb_micro) DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, n_lists, na_micro, nb_micro,
       CAST(n_lists * (na_micro + nb_micro) AS BIGINT) AS fused
FROM fused
ORDER BY rank LIMIT {FUSE_K}
"""


QUERIES["hybrid_combmnz_topk"] = (hybrid_combmnz_topk, _sql_combmnz())


# ------------------------------------------------ team-draft interleaving

# Online ranker comparison by interleaving (Radlinski, Kurup & Joachims,
# CIKM 2008): the BM25-OR and Dirichlet-QL top-{IL_K} lists are merged
# team-draft style — rounds of two picks, the first-picker ALTERNATING
# deterministically (round 1: A first, round 2: B first, …; the
# published coin flip replaced by strict alternation so both engines and
# the unrolled oracle agree bit-for-bit), each team contributing its
# highest-ranked not-yet-picked document. Clicks on the interleaved list
# are synthesized with the click_models PBM truth (γ = 1000/pos
# examination, md5-derived item attractiveness — position-biased the way
# real interleaving traffic is), and each click credits the team that
# CONTRIBUTED the document; the winner column is the sign of the credit
# difference.
#
# Determinism/scale: the two input lists are k rows BY CONSTRUCTION, so
# the draft itself runs on the driver over bounded data (the sq8
# bounded-collect discipline) while both serving plans and the click
# scoring stay in Spark; the DuckDB oracle replays the draft as a
# {2 * IL_K}-step chained-CTE unroll — the cross-engine gate proves the
# two implementations of the draft are the same function.

IL_K = 10
_IL_ALPHA = "(150 + {h} % 700)"
_IL_CLICK = (
    "CASE WHEN {u} % 1000 <"
    " ((1000 {div} pos) * {alpha}) {div} 1000 THEN 1 ELSE 0 END"
)


def _il_team(step: int) -> str:
    rnd = (step + 1) // 2
    first = "A" if rnd % 2 == 1 else "B"
    other = "B" if first == "A" else "A"
    return first if step % 2 == 1 else other


def interleave_team_draft_eval(spark, sf_dir):
    """(pos, doc_id, team, clicked, a_clicks, b_clicks, winner):
    team-draft interleaving of BM25 vs Dirichlet with PBM-synthesized
    clicks and per-team credit."""
    scored_a = bm25_or_scored(spark, sf_dir)
    top_a = [
        int(r["doc_id"])
        for r in scored_a.orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        ).limit(IL_K).collect()
    ]
    top_b = [
        int(r["doc_id"])
        for r in _dirichlet_topn(spark, sf_dir, IL_K)
        .orderBy("rb")
        .collect()
    ]
    picked: list[tuple[int, str]] = []
    have = set()
    for t in range(1, 2 * IL_K + 1):
        team = _il_team(t)
        lst = top_a if team == "A" else top_b
        for d in lst:
            if d not in have:
                have.add(d)
                picked.append((d, team))
                break
    il = spark.createDataFrame(
        [(i + 1, d, tm) for i, (d, tm) in enumerate(picked)],
        "pos long, doc_id long, team string",
    )
    h_doc = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 14), 16, 10) AS BIGINT)"
    u = (
        "CAST(conv(substring(md5(concat('il', CAST(doc_id AS STRING), '_',"
        " CAST(pos AS STRING))), 1, 14), 16, 10) AS BIGINT)"
    )
    clicked = il.withColumn(
        "clicked",
        F.expr(
            _IL_CLICK.format(
                u=u, alpha=_IL_ALPHA.format(h=h_doc), div="DIV"
            )
        ).cast("long"),
    )
    summ = F.broadcast(
        clicked.agg(
            F.sum(F.when(F.col("team") == "A", F.col("clicked")).otherwise(0))
            .cast("long")
            .alias("a_clicks"),
            F.sum(F.when(F.col("team") == "B", F.col("clicked")).otherwise(0))
            .cast("long")
            .alias("b_clicks"),
        )
    )
    return clicked.crossJoin(summ).select(
        "pos",
        "doc_id",
        "team",
        "clicked",
        "a_clicks",
        "b_clicks",
        F.expr(
            "CASE WHEN a_clicks > b_clicks THEN 'A'"
            " WHEN b_clicks > a_clicks THEN 'B' ELSE 'tie' END"
        ).alias("winner"),
    )


def _sql_interleave() -> str:
    from harvester_spark.operators.fulltext_queries import _DIR_LP

    in_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    parts = [
        f"""WITH {_sql_components(BM25_TERMS)},
scored_a AS (
  SELECT doc_id, round(sum(contrib), 6) AS score FROM comps GROUP BY doc_id
),
top_a AS MATERIALIZED (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT)
           AS ra
  FROM scored_a ORDER BY score DESC, doc_id ASC LIMIT {IL_K}
),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
cfs AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN ({in_list}) GROUP BY 1
),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY 1, 2
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
scored_b AS (
  SELECT doc_id, CAST(sum({_DIR_LP}) AS BIGINT) AS logp_micro
  FROM joined GROUP BY doc_id
),
top_b AS MATERIALIZED (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY logp_micro DESC, doc_id ASC)
              AS BIGINT) AS rb
  FROM scored_b ORDER BY logp_micro DESC, doc_id ASC LIMIT {IL_K}
),
picked0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS doc_id, '' AS team,
         CAST(0 AS BIGINT) AS pos
  WHERE false
)"""
    ]
    for t in range(1, 2 * IL_K + 1):
        team = _il_team(t)
        lst, rk = ("top_a", "ra") if team == "A" else ("top_b", "rb")
        parts.append(
            f""",
pick{t} AS MATERIALIZED (
  SELECT doc_id, '{team}' AS team FROM {lst}
  WHERE doc_id NOT IN (SELECT doc_id FROM picked{t - 1}
                       WHERE doc_id IS NOT NULL)
  ORDER BY {rk} ASC LIMIT 1
),
picked{t} AS MATERIALIZED (
  SELECT doc_id, team, pos FROM picked{t - 1}
  UNION ALL
  SELECT doc_id, team,
         (SELECT count(*) FROM picked{t - 1}) + 1 AS pos
  FROM pick{t}
)"""
        )
    h_doc = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)"
    u = (
        "CAST(('0x' || substr(md5('il' || CAST(doc_id AS VARCHAR) || '_' ||"
        " CAST(pos AS VARCHAR)), 1, 14)) AS BIGINT)"
    )
    last = f"picked{2 * IL_K}"
    parts.append(
        f""",
clicked AS MATERIALIZED (
  SELECT pos, doc_id, team,
         CAST({_IL_CLICK.format(u=u, alpha=_IL_ALPHA.format(h=h_doc),
                                div='//')} AS BIGINT) AS clicked
  FROM {last}
),
summ AS (
  SELECT CAST(coalesce(sum(CASE WHEN team = 'A' THEN clicked END), 0)
           AS BIGINT) AS a_clicks,
         CAST(coalesce(sum(CASE WHEN team = 'B' THEN clicked END), 0)
           AS BIGINT) AS b_clicks
  FROM clicked
)
SELECT pos, doc_id, team, clicked, a_clicks, b_clicks,
       CASE WHEN a_clicks > b_clicks THEN 'A'
            WHEN b_clicks > a_clicks THEN 'B' ELSE 'tie' END AS winner
FROM clicked CROSS JOIN summ"""
    )
    return "".join(parts)


QUERIES["interleave_team_draft_eval"] = (
    interleave_team_draft_eval,
    _sql_interleave(),
)


# ------------------------------------------------ paired sign test (A/B)

# The offline counterpart of interleave_team_draft_eval: an EXACT paired
# sign test (the classic distribution-free system-comparison test in IR
# evaluation — Smucker/Allan/Carterette, CIKM 2007, evaluate it next to
# the t-test) between BM25 and Dirichlet-QL over the 16-query registry's
# per-query nDCG@10. Both rankers are scored against the SAME phrase
# qrels, so per query the IDCG cancels and comparing nDCG is comparing
# the integer dcg_micro sums directly — no float ever decides a win.
#
# The two-sided p-value is exact: p = min(1, 2·Σ_{k=0..min(w,l)} C(n,k)
# / 2^n) with n = wins+losses (ties dropped, the standard treatment).
# Binomials are exact int64: C(n,k) = Π_{i=1..k}(n−i+1) DIV k! — the
# full numerator product of a binomial is always divisible by k!, and at
# n ≤ 16 the products stay far below 2^63. p is reported in FLOORED
# micro-units ((2·S·10^6) DIV 2^n, capped at 10^6) — integer end to end.
#
# Scale shape: the _graded_ranking spine (one corpus scan + broadcast
# 16-row query dims) plus a second per-(query, doc) scoring leg over the
# SAME candidates (Dirichlet needs tf = 0 legs: candidates × 6 query
# terms, left-joined tf); the test statistic folds 16 rows to 1.

SIGN_MU = 2000  # Dirichlet mu, == SDM_MU (ranking_models)
_SIGN_LP = (
    "CAST(round(1000000.0e0 * ln("
    f"(tf + {SIGN_MU}.0e0 * cf / ct) / (dl + {SIGN_MU}.0e0)"
    "), 0) AS BIGINT)"
)
_SIGN_COMB = (
    "CASE WHEN k = 0 THEN CAST(1 AS BIGINT) ELSE "
    "aggregate(sequence(1, k), CAST(1 AS BIGINT),"
    " (acc, i) -> acc * CAST(ne - i + 1 AS BIGINT))"
    " DIV "
    "aggregate(sequence(1, k), CAST(1 AS BIGINT),"
    " (acc, i) -> acc * CAST(i AS BIGINT)) END"
)


def ranker_sign_test(spark, sf_dir):
    """(n_queries, wins_bm25, wins_dirichlet, ties, sum_delta_dcg_micro,
    sign_s_tail, sign_p_micro): exact two-sided paired sign test of
    BM25 vs Dirichlet-QL nDCG@10 over the 16-query registry."""
    from harvester_spark.operators.retrieval import (
        HN_N_QUERIES,
        HN_Q_LEN,
        NDCG_K,
        _NDCG_ADDEND,
        _graded_ranking,
    )

    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    graded = _graded_ranking(spark, sf_dir)

    # the registry's (q_id, term) selection — same derivation as
    # _graded_ranking (retrieval.py): first HN_Q_LEN distinct tokens of
    # each of the 16 smallest doc_ids, by first position then term.
    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(
        F.col("p0").asc(), F.col("term").asc()
    )
    qsel = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )

    qterms = qsel.select("term").distinct()
    toksq = toks.join(F.broadcast(qterms), "term")
    tfq = toksq.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    cfq = toksq.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    ct = toks.agg(F.count("*").cast("long").alias("ct"))

    dirs = (
        graded.select("q_id", "doc_id")
        .join(F.broadcast(qsel), "q_id")
        .join(tfq, ["term", "doc_id"], "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0)).cast("long"))
        .join(F.broadcast(cfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(ct))
        .withColumn("lp", F.expr(_SIGN_LP))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("lp").cast("long").alias("score_b"))
    )

    wa_ = W.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    dcg_a = (
        graded.withColumn("rnk", F.row_number().over(wa_))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("dcg_a"))
    )
    wb_ = W.partitionBy("q_id").orderBy(
        F.col("score_b").desc(), F.col("doc_id").asc()
    )
    dcg_b = (
        dirs.join(graded.select("q_id", "doc_id", "rel"), ["q_id", "doc_id"])
        .withColumn("rnk", F.row_number().over(wb_))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("dcg_b"))
    )
    counts = (
        dcg_a.join(dcg_b, "q_id")
        .agg(
            F.count("*").cast("long").alias("nq"),
            F.sum(F.expr("CAST(dcg_a > dcg_b AS BIGINT)"))
            .cast("long")
            .alias("wa"),
            F.sum(F.expr("CAST(dcg_a < dcg_b AS BIGINT)"))
            .cast("long")
            .alias("wb"),
            F.sum(F.expr("CAST(dcg_a = dcg_b AS BIGINT)"))
            .cast("long")
            .alias("ties"),
            F.sum(F.col("dcg_a") - F.col("dcg_b"))
            .cast("long")
            .alias("sum_delta"),
        )
        .withColumn("ne", (F.col("wa") + F.col("wb")).cast("long"))
        .withColumn("m", F.least("wa", "wb").cast("long"))
    )
    tail = (
        counts.select(
            "*", F.explode(F.expr("sequence(0, m)")).alias("k")
        )
        .withColumn("c", F.expr(_SIGN_COMB))
        .groupBy("nq", "wa", "wb", "ties", "sum_delta", "ne")
        .agg(F.sum("c").cast("long").alias("s"))
    )
    return tail.select(
        F.col("nq").alias("n_queries"),
        F.col("wa").alias("wins_bm25"),
        F.col("wb").alias("wins_dirichlet"),
        F.col("ties").alias("ties"),
        F.col("sum_delta").alias("sum_delta_dcg_micro"),
        F.col("s").alias("sign_s_tail"),
        F.expr(
            "least(CAST(1000000 AS BIGINT),"
            " (2 * s * 1000000) DIV shiftleft(CAST(1 AS BIGINT), ne))"
        ).alias("sign_p_micro"),
    )


def _sql_sign_test() -> str:
    from harvester_spark.operators.retrieval import (
        NDCG_K,
        _NDCG_ADDEND,
        _SQL_GRADED_PREFIX,
    )

    return _SQL_GRADED_PREFIX + f""",
cfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qsel) GROUP BY 1
),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
dirs AS (
  SELECT q_id, doc_id, CAST(sum({_SIGN_LP}) AS BIGINT) AS score_b
  FROM (
    SELECT g.q_id, g.doc_id,
           CAST(coalesce(tf.tf, 0) AS BIGINT) AS tf,
           cfq.cf, CAST(dl.dl AS BIGINT) AS dl, ctt.ct
    FROM (SELECT q_id, doc_id FROM graded) g
    JOIN qsel q ON q.q_id = g.q_id
    LEFT JOIN tf ON tf.term = q.term AND tf.doc_id = g.doc_id
    JOIN cfq ON cfq.term = q.term
    JOIN dl ON dl.doc_id = g.doc_id
    CROSS JOIN ctt
  ) GROUP BY 1, 2
),
dcg_a AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_a FROM (
    SELECT q_id, rel,
           row_number() OVER (
             PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
),
dcg_b AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_b FROM (
    SELECT d.q_id, g.rel,
           row_number() OVER (
             PARTITION BY d.q_id
             ORDER BY d.score_b DESC, d.doc_id ASC) AS rnk
    FROM dirs d JOIN graded g ON g.q_id = d.q_id AND g.doc_id = d.doc_id
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
),
counts AS (
  SELECT CAST(count(*) AS BIGINT) AS nq,
         CAST(sum((dcg_a > dcg_b)::INT) AS BIGINT) AS wa,
         CAST(sum((dcg_a < dcg_b)::INT) AS BIGINT) AS wb,
         CAST(sum((dcg_a = dcg_b)::INT) AS BIGINT) AS ties,
         CAST(sum(dcg_a - dcg_b) AS BIGINT) AS sum_delta
  FROM dcg_a JOIN dcg_b USING (q_id)
),
ext AS (SELECT *, wa + wb AS ne, least(wa, wb) AS m FROM counts),
ks AS (SELECT ext.*, unnest(range(0, m + 1)) AS k FROM ext),
combs AS (
  SELECT nq, wa, wb, ties, sum_delta, ne,
         list_reduce([CAST(1 AS BIGINT)] || range(1, k + 1),
                     (a, b) -> a * (ne - b + 1))
         // list_reduce([CAST(1 AS BIGINT)] || range(1, k + 1),
                        (a, b) -> a * b) AS c
  FROM ks
)
SELECT nq AS n_queries, wa AS wins_bm25, wb AS wins_dirichlet, ties,
       sum_delta AS sum_delta_dcg_micro,
       CAST(sum(c) AS BIGINT) AS sign_s_tail,
       least(CAST(1000000 AS BIGINT),
             (2 * CAST(sum(c) AS BIGINT) * 1000000)
               // (CAST(1 AS BIGINT) << ne)) AS sign_p_micro
FROM combs
GROUP BY nq, wa, wb, ties, sum_delta, ne
"""


QUERIES["ranker_sign_test"] = (ranker_sign_test, _sql_sign_test())


# ------------------------------------- Kendall tau-b ranker agreement

# The sign test above answers "which ranker wins more queries"; Kendall's
# τ-b answers the orthogonal question rank-eval suites (trec_eval's
# `kendalltau`, Voorhees 2001's meta-evaluation) ask: how much do the two
# SYSTEMS agree on ordering, per query. Computed between BM25 (the graded
# ranking's score) and Dirichlet-QL (the sign test's score_b leg) over the
# union of both rankers' top-TAU_K lists — a ≤ 2·TAU_K-doc set per query,
# so the pair expansion is bounded at C(2·TAU_K, 2) = 780 pairs by
# construction, never quadratic in candidates (the "labeled bounded"
# pattern of ann_cosine_topk).
#
# τ-b handles ties in either ranking: with n0 = all pairs, n1/n2 = pairs
# tied in A/B, τ-b = (C − D)/√((n0−n1)(n0−n2)). C/D/n1/n2 are exact
# int64 counts; the final ratio is ONE shared sign-split floor(+0.5)
# milli string (negative values mirrored — floor is not symmetric).
# BM25 score ties compare round-6 doubles (identical in both engines by
# the graded-ranking contract); Dirichlet ties compare exact micro-nats.

TAU_K = 20  # per-ranker list depth feeding the union

_TAU_B_MILLI = (
    "CASE WHEN (n0 - n1) * (n0 - n2) = 0 THEN NULL "
    "WHEN c >= d THEN CAST(floor(1000.0e0 * (c - d)"
    " / sqrt(1.0e0 * (n0 - n1) * (n0 - n2)) + 0.5e0) AS BIGINT) "
    "ELSE -CAST(floor(1000.0e0 * (d - c)"
    " / sqrt(1.0e0 * (n0 - n1) * (n0 - n2)) + 0.5e0) AS BIGINT) END"
)


def ranker_tau_correlation(spark, sf_dir):
    """(q_id, n_docs, n_pairs, concordant, discordant, ties_a, ties_b,
    tau_b_milli): per-registry-query Kendall τ-b agreement between the
    BM25 and Dirichlet-QL rankings over the union of their top-20 lists."""
    from harvester_spark.operators.retrieval import (
        HN_N_QUERIES,
        HN_Q_LEN,
        _graded_ranking,
    )

    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    graded = _graded_ranking(spark, sf_dir)

    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(
        F.col("p0").asc(), F.col("term").asc()
    )
    qsel = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )

    qterms = qsel.select("term").distinct()
    toksq = toks.join(F.broadcast(qterms), "term")
    tfq = toksq.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    cfq = toksq.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    ct = toks.agg(F.count("*").cast("long").alias("ct"))

    dirs = (
        graded.select("q_id", "doc_id")
        .join(F.broadcast(qsel), "q_id")
        .join(tfq, ["term", "doc_id"], "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0)).cast("long"))
        .join(F.broadcast(cfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(ct))
        .withColumn("lp", F.expr(_SIGN_LP))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("lp").cast("long").alias("score_b"))
    )

    both = graded.select("q_id", "doc_id", "score").join(
        dirs, ["q_id", "doc_id"]
    )
    wa_ = W.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    wb_ = W.partitionBy("q_id").orderBy(
        F.col("score_b").desc(), F.col("doc_id").asc()
    )
    sel = (
        both.withColumn("ra", F.row_number().over(wa_))
        .withColumn("rb", F.row_number().over(wb_))
        .filter((F.col("ra") <= TAU_K) | (F.col("rb") <= TAU_K))
        .select("q_id", "doc_id", "score", "score_b")
    )
    x, y = sel.alias("x"), sel.alias("y")
    pairs = x.join(
        y,
        (F.col("x.q_id") == F.col("y.q_id"))
        & (F.col("x.doc_id") < F.col("y.doc_id")),
    ).select(
        F.col("x.q_id").alias("q_id"),
        F.expr(
            "CASE WHEN x.score > y.score THEN 1"
            " WHEN x.score < y.score THEN -1 ELSE 0 END"
        ).alias("sa"),
        F.expr(
            "CASE WHEN x.score_b > y.score_b THEN 1"
            " WHEN x.score_b < y.score_b THEN -1 ELSE 0 END"
        ).alias("sb"),
    )
    per_q = (
        pairs.groupBy("q_id")
        .agg(
            F.count("*").cast("long").alias("n0"),
            F.sum(F.expr("CAST(sa = 0 AS BIGINT)")).cast("long").alias("n1"),
            F.sum(F.expr("CAST(sb = 0 AS BIGINT)")).cast("long").alias("n2"),
            F.sum(F.expr("CAST(sa * sb = 1 AS BIGINT)"))
            .cast("long")
            .alias("c"),
            F.sum(F.expr("CAST(sa * sb = -1 AS BIGINT)"))
            .cast("long")
            .alias("d"),
        )
    )
    n_docs = sel.groupBy("q_id").agg(F.count("*").cast("long").alias("n_docs"))
    return (
        per_q.join(n_docs, "q_id")
        .withColumn("tau_b_milli", F.expr(_TAU_B_MILLI))
        .select(
            "q_id",
            "n_docs",
            F.col("n0").alias("n_pairs"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            F.col("n1").alias("ties_a"),
            F.col("n2").alias("ties_b"),
            "tau_b_milli",
        )
    )


def _sql_tau_correlation() -> str:
    from harvester_spark.operators.retrieval import _SQL_GRADED_PREFIX

    return _SQL_GRADED_PREFIX + f""",
cfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qsel) GROUP BY 1
),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
dirs AS (
  SELECT q_id, doc_id, CAST(sum({_SIGN_LP}) AS BIGINT) AS score_b
  FROM (
    SELECT g.q_id, g.doc_id,
           CAST(coalesce(tf.tf, 0) AS BIGINT) AS tf,
           cfq.cf, CAST(dl.dl AS BIGINT) AS dl, ctt.ct
    FROM (SELECT q_id, doc_id FROM graded) g
    JOIN qsel q ON q.q_id = g.q_id
    LEFT JOIN tf ON tf.term = q.term AND tf.doc_id = g.doc_id
    JOIN cfq ON cfq.term = q.term
    JOIN dl ON dl.doc_id = g.doc_id
    CROSS JOIN ctt
  ) GROUP BY 1, 2
),
ab_scores AS (
  SELECT g.q_id, g.doc_id, g.score, d.score_b
  FROM graded g JOIN dirs d ON d.q_id = g.q_id AND d.doc_id = g.doc_id
),
sel AS (
  SELECT q_id, doc_id, score, score_b FROM (
    SELECT *,
           row_number() OVER (
             PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS ra,
           row_number() OVER (
             PARTITION BY q_id ORDER BY score_b DESC, doc_id ASC) AS rb
    FROM ab_scores
  ) WHERE ra <= {TAU_K} OR rb <= {TAU_K}
),
pairs AS (
  SELECT x.q_id,
         CASE WHEN x.score > y.score THEN 1
              WHEN x.score < y.score THEN -1 ELSE 0 END AS sa,
         CASE WHEN x.score_b > y.score_b THEN 1
              WHEN x.score_b < y.score_b THEN -1 ELSE 0 END AS sb
  FROM sel x JOIN sel y
    ON x.q_id = y.q_id AND x.doc_id < y.doc_id
),
per_q AS (
  SELECT q_id,
         CAST(count(*) AS BIGINT) AS n0,
         CAST(sum((sa = 0)::INT) AS BIGINT) AS n1,
         CAST(sum((sb = 0)::INT) AS BIGINT) AS n2,
         CAST(sum((sa * sb = 1)::INT) AS BIGINT) AS c,
         CAST(sum((sa * sb = -1)::INT) AS BIGINT) AS d
  FROM pairs GROUP BY q_id
),
nd_ AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_docs FROM sel GROUP BY 1)
SELECT p.q_id, n.n_docs, p.n0 AS n_pairs, p.c AS concordant,
       p.d AS discordant, p.n1 AS ties_a, p.n2 AS ties_b,
       {_TAU_B_MILLI} AS tau_b_milli
FROM per_q p JOIN nd_ n USING (q_id)
"""


QUERIES["ranker_tau_correlation"] = (
    ranker_tau_correlation,
    _sql_tau_correlation(),
)


# --------------------------------------------- rank-biased overlap (RBO)

# Webber/Moffat/Zobel (TOIS 2010): the top-weighted ranker-agreement
# metric — τ-b (above) weighs every pair equally; RBO discounts depth
# geometrically, which is what you actually want when comparing SERVING
# rankings (only the head is ever shown). Truncated RBO@K:
#   rbo = (1−p) Σ_{d=1..K} p^(d−1) · |A_d ∩ B_d| / d.
# p is chosen = 1/2 DELIBERATELY: the weights become dyadic rationals
# 1/(d·2^d), so with the common denominator D = lcm(1..K)·2^K every
# per-depth addend is an EXACT int64 (overlap_d · D/(d·2^d)) and the
# whole metric is an exact integer in D-units — no libm power() call
# whose ulps could differ between engines ever runs (p = 0.9 would need
# power(0.9, d), which is exactly the cross-engine trap CLAUDE.md bans).
# A doc with ranks (ra, rb) is inside both prefixes from depth
# m = max(ra, rb) on, so its contribution is Σ_{d=m..K} w_d — computed
# by exploding d = m..K against a K-row broadcast weight dim (VALUES
# twin in the oracle; both sides read the same Python-computed table).
#
# Scale shape: two row_number windows over the per-query candidate lists
# (partition-by-query, the family's one shuffle), a ≤ K·K-row explode,
# and a 16-row final agg. Rankings: A = BM25 (graded score), B =
# Dirichlet-QL (the sign test's score_b leg).

RBO_K = 20
_RBO_D = math.lcm(*range(1, RBO_K + 1)) * (1 << RBO_K)
_RBO_W = {d: _RBO_D // (d * (1 << d)) for d in range(1, RBO_K + 1)}


def ranker_rbo_overlap(spark, sf_dir):
    """(q_id, overlap_at_k, rbo_units, rbo_micro): truncated RBO@20 with
    p = 1/2 between the BM25 and Dirichlet-QL rankings per registry
    query — exact integer D-units (D = lcm(1..20)·2^20) plus floored
    micro-units."""
    from harvester_spark.operators.retrieval import (
        HN_N_QUERIES,
        HN_Q_LEN,
        _graded_ranking,
    )

    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    graded = _graded_ranking(spark, sf_dir)

    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(
        F.col("p0").asc(), F.col("term").asc()
    )
    qsel = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    qterms = qsel.select("term").distinct()
    toksq = toks.join(F.broadcast(qterms), "term")
    tfq = toksq.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    cfq = toksq.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    ct = toks.agg(F.count("*").cast("long").alias("ct"))
    dirs = (
        graded.select("q_id", "doc_id")
        .join(F.broadcast(qsel), "q_id")
        .join(tfq, ["term", "doc_id"], "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0)).cast("long"))
        .join(F.broadcast(cfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(ct))
        .withColumn("lp", F.expr(_SIGN_LP))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("lp").cast("long").alias("score_b"))
    )

    wa_ = W.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    wb_ = W.partitionBy("q_id").orderBy(
        F.col("score_b").desc(), F.col("doc_id").asc()
    )
    both = (
        graded.select("q_id", "doc_id", "score")
        .join(dirs, ["q_id", "doc_id"])
        .withColumn("ra", F.row_number().over(wa_))
        .withColumn("rb", F.row_number().over(wb_))
        .withColumn("m", F.greatest("ra", "rb"))
        .filter(F.col("m") <= RBO_K)
    )
    wdim = spark.createDataFrame(
        [(d, w) for d, w in _RBO_W.items()], "d int, w long"
    )
    per_q = (
        both.select("q_id", F.explode(F.expr(f"sequence(m, {RBO_K})")).alias("d"))
        .join(F.broadcast(wdim), "d")
        .groupBy("q_id")
        .agg(F.sum("w").cast("long").alias("rbo_units"))
    )
    ov = both.groupBy("q_id").agg(
        F.count("*").cast("long").alias("overlap_at_k")
    )
    qids = graded.select("q_id").distinct()
    return (
        qids.join(ov, "q_id", "left")
        .join(per_q, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("overlap_at_k"), F.lit(0))
            .cast("long")
            .alias("overlap_at_k"),
            F.coalesce(F.col("rbo_units"), F.lit(0))
            .cast("long")
            .alias("rbo_units"),
            # units·1e6 overflows int64 (units ≤ D ≈ 2.4e14) — exact
            # two-step long division: ((u·1e3) DIV D)·1e3 + (((u·1e3)
            # % D)·1e3) DIV D == floor(u·1e6/D), every operand < 2.5e17.
            F.expr(
                f"((coalesce(rbo_units, 0) * 1000) DIV {_RBO_D}) * 1000"
                f" + (((coalesce(rbo_units, 0) * 1000) % {_RBO_D}) * 1000)"
                f" DIV {_RBO_D}"
            ).cast("long").alias("rbo_micro"),
        )
    )


def _sql_rbo_overlap() -> str:
    from harvester_spark.operators.retrieval import _SQL_GRADED_PREFIX

    wvals = ", ".join(f"({d}, {w})" for d, w in sorted(_RBO_W.items()))
    return _SQL_GRADED_PREFIX + f""",
cfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qsel) GROUP BY 1
),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
dirs AS (
  SELECT q_id, doc_id, CAST(sum({_SIGN_LP}) AS BIGINT) AS score_b
  FROM (
    SELECT g.q_id, g.doc_id,
           CAST(coalesce(tf.tf, 0) AS BIGINT) AS tf,
           cfq.cf, CAST(dl.dl AS BIGINT) AS dl, ctt.ct
    FROM (SELECT q_id, doc_id FROM graded) g
    JOIN qsel q ON q.q_id = g.q_id
    LEFT JOIN tf ON tf.term = q.term AND tf.doc_id = g.doc_id
    JOIN cfq ON cfq.term = q.term
    JOIN dl ON dl.doc_id = g.doc_id
    CROSS JOIN ctt
  ) GROUP BY 1, 2
),
ab AS (
  SELECT q_id, doc_id, greatest(ra, rb) AS m FROM (
    SELECT g.q_id, g.doc_id,
           row_number() OVER (
             PARTITION BY g.q_id ORDER BY g.score DESC, g.doc_id ASC) AS ra,
           row_number() OVER (
             PARTITION BY g.q_id ORDER BY d.score_b DESC, d.doc_id ASC) AS rb
    FROM graded g JOIN dirs d ON d.q_id = g.q_id AND d.doc_id = g.doc_id
  ) WHERE greatest(ra, rb) <= {RBO_K}
),
wdim(d, w) AS (VALUES {wvals}),
per_q AS (
  SELECT q_id, CAST(sum(w) AS BIGINT) AS rbo_units
  FROM (SELECT q_id, unnest(range(m, {RBO_K} + 1)) AS d FROM ab)
  JOIN wdim USING (d)
  GROUP BY q_id
),
ov AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS overlap_at_k FROM ab GROUP BY 1
)
SELECT q.q_id,
       CAST(coalesce(ov.overlap_at_k, 0) AS BIGINT) AS overlap_at_k,
       CAST(coalesce(p.rbo_units, 0) AS BIGINT) AS rbo_units,
       CAST(((coalesce(p.rbo_units, 0) * 1000) // {_RBO_D}) * 1000
            + (((coalesce(p.rbo_units, 0) * 1000) % {_RBO_D}) * 1000)
              // {_RBO_D} AS BIGINT)
         AS rbo_micro
FROM (SELECT DISTINCT q_id FROM graded) q
LEFT JOIN ov USING (q_id)
LEFT JOIN per_q p USING (q_id)
"""


QUERIES["ranker_rbo_overlap"] = (ranker_rbo_overlap, _sql_rbo_overlap())


# ------------------------------------------ exposure fairness of rankings

# Singh & Joachims (KDD 2018) exposure-based group fairness, evaluated on
# the registry rankings: how much of a ranking's USER ATTENTION (exposure)
# each document group captures vs its share of the retrieved set (the
# demographic-parity target over retrieved docs — the repo has no graded
# group qrels, documented). Exposure uses the DYADIC geometric attention
# model p = 1/2 (the ranker_rbo_overlap discipline): rank r of K gets
# 2^(K−r) integer units, so every exposure sum is EXACT int64 and the
# model is the RBP-user with persistence 1/2 — the standard log-discount
# curve would need cross-engine log() on every rank (the reason RBO here
# is p = 1/2, see that operator's docstring).
#
# Groups are md5-parity of doc_id — content-independent and reproducible
# relationally in both engines (the events_did_abtest treatment idiom).
# Disparity = exposure share − retrieved share, both floored micro
# divisions on exact integers; their difference may be negative (integer
# subtraction, no further division — no sign split needed).
#
# Scale shape: scoring is the flagship term-filtered component join; the
# per-query top-K is a WindowGroupLimit rank; everything after is a
# 2·|queries|-row agg. Nothing corpus-sized beyond the serving plan.

FAIR_K = 20


def ft_fairness_exposure_eval(spark, sf_dir):
    """(query_id, grp, n_docs, exp_units, exp_share_micro,
    rel_share_micro, disparity_micro): dyadic exposure vs retrieved-set
    share per md5-parity group over the {QPP_QUERIES} registry top-K."""
    from harvester_spark.operators.dedup import _hash56

    all_terms = sorted({t for ts in QPP_QUERIES.values() for t in ts})
    comps = _bm25_components(spark, sf_dir, all_terms)
    qt = spark.createDataFrame(
        [(q, t) for q, ts in sorted(QPP_QUERIES.items()) for t in ts],
        "query_id string, term string",
    )
    scored = (
        qt.join(comps, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= FAIR_K)
        .select(
            "query_id",
            "rank",
            (
                _hash56(F.concat(F.lit("grp|"), F.col("doc_id").cast("string")))
                % 2
            ).cast("long").alias("grp"),
            F.expr(f"CAST(1 AS BIGINT) << ({FAIR_K} - rank)").alias("exp_u"),
        )
    )
    tot = F.broadcast(
        ranked.groupBy("query_id").agg(
            F.count("*").cast("long").alias("n_tot"),
            F.sum("exp_u").cast("long").alias("exp_tot"),
        )
    )
    per_g = ranked.groupBy("query_id", "grp").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("exp_u").cast("long").alias("exp_units"),
    )
    return per_g.join(tot, "query_id").select(
        "query_id",
        "grp",
        "n_docs",
        "exp_units",
        F.expr(
            "CAST((1000000 * exp_units) DIV exp_tot AS BIGINT)"
        ).alias("exp_share_micro"),
        F.expr("CAST((1000000 * n_docs) DIV n_tot AS BIGINT)").alias(
            "rel_share_micro"
        ),
        F.expr(
            "CAST((1000000 * exp_units) DIV exp_tot"
            " - (1000000 * n_docs) DIV n_tot AS BIGINT)"
        ).alias("disparity_micro"),
    )


def _sql_fairness_exposure() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    all_terms = sorted({t for ts in QPP_QUERIES.values() for t in ts})
    qvals = ", ".join(
        f"('{q}', '{t}')" for q, ts in sorted(QPP_QUERIES.items()) for t in ts
    )
    h = _SQL_HASH56.format(col="'grp|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH {_sql_components(all_terms)},
qt AS (SELECT * FROM (VALUES {qvals}) v(query_id, term)),
scored AS (
  SELECT query_id, doc_id, round(sum(contrib), 6) AS score
  FROM qt JOIN comps USING (term)
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id,
         {h} % 2 AS grp,
         CAST(1 AS BIGINT) << ({FAIR_K} - rank) AS exp_u
  FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {FAIR_K}
),
tot AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_tot,
         CAST(sum(exp_u) AS BIGINT) AS exp_tot
  FROM ranked GROUP BY 1
),
per_g AS (
  SELECT query_id, grp, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(exp_u) AS BIGINT) AS exp_units
  FROM ranked GROUP BY 1, 2
)
SELECT p.query_id, p.grp, p.n_docs, p.exp_units,
       CAST((1000000 * p.exp_units) // t.exp_tot AS BIGINT)
         AS exp_share_micro,
       CAST((1000000 * p.n_docs) // t.n_tot AS BIGINT) AS rel_share_micro,
       CAST((1000000 * p.exp_units) // t.exp_tot
            - (1000000 * p.n_docs) // t.n_tot AS BIGINT) AS disparity_micro
FROM per_g p JOIN tot t USING (query_id)
"""


QUERIES["ft_fairness_exposure_eval"] = (
    ft_fairness_exposure_eval,
    _sql_fairness_exposure(),
)


# ---------------------------------------- result-cache containment

# Semantic result-cache reuse (Fagni et al., ACM TOIS 2006 — the
# SDC/containment family): under AND semantics, adding terms can only
# SHRINK the result set, so a cached result for query q₁ can serve any
# q₂ ⊇ q₁ by filtering — IF the implication actually holds in the
# engine. This operator takes every ordered pair of registry queries
# (plus the flagship AND query), decides reuse by the TERM-SUBSET test,
# and then VERIFIES the set containment empirically against the exact
# AND result sets — emitting both the plan bit and the proof bit, so a
# violated implication (an analyzer or scoring asymmetry) would surface
# as plan=true, verified=false. On this corpus every subset pair must
# verify (pinned), and non-subset pairs serve as controls where
# containment genuinely fails.
#
# Determinism: result sets are exact AND matches (no scores involved);
# counts are BIGINTs.
#
# Scale shape: one term-filtered scan builds all per-query match sets
# (query dimension broadcast into the token scan); pair logic runs on
# the |Q|² dimension with two semi-join-shaped aggregates.

CONT_QUERIES = {
    "flag": ("key", "value", "table"),
    "head": ("key", "value"),
    "mixed": ("table", "merge"),
    "rare": ("dup", "scan"),
}


def query_containment_plan(spark, sf_dir):
    """(q_cached, q_new, subset_plan, n_cached, n_new, n_overlap,
    containment_verified, reuse): term-subset cache-reuse decisions for
    every ordered registry-query pair, with the set containment proven
    against exact AND results."""
    toks = doc_tokens(spark, sf_dir).select("doc_id", "term").distinct()
    qt = spark.createDataFrame(
        [(q, t) for q, ts in sorted(CONT_QUERIES.items()) for t in ts],
        "q string, term string",
    )
    qlen = F.broadcast(
        qt.groupBy("q").agg(F.count("*").cast("long").alias("qlen"))
    )
    matches = (
        qt.join(toks, "term")
        .groupBy("q", "doc_id")
        .agg(F.count("*").cast("long").alias("hit"))
        .join(qlen, "q")
        .filter(F.col("hit") == F.col("qlen"))
        .select("q", "doc_id")
        .cache()
    )
    counts = matches.groupBy("q").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    # term-subset plan bit per ordered pair
    a = qt.select(F.col("q").alias("q_cached"), "term")
    b = qt.select(F.col("q").alias("q_new"), F.col("term").alias("t2"))
    shared = (
        a.join(b, a["term"] == b["t2"])
        .groupBy("q_cached", "q_new")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    pairs = (
        qlen.select(F.col("q").alias("q_cached"), F.col("qlen").alias("la"))
        .crossJoin(
            qlen.select(F.col("q").alias("q_new"), F.col("qlen").alias("lb"))
        )
        .filter(F.col("q_cached") != F.col("q_new"))
        .join(shared, ["q_cached", "q_new"], "left")
        .withColumn(
            "subset_plan",
            F.coalesce("n_shared", F.lit(0)) == F.col("la"),
        )
    )
    ov = (
        matches.select(F.col("q").alias("q_cached"), "doc_id")
        .join(
            matches.select(F.col("q").alias("q_new"), "doc_id"), "doc_id"
        )
        .filter(F.col("q_cached") != F.col("q_new"))
        .groupBy("q_cached", "q_new")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        pairs.join(
            F.broadcast(
                counts.select(
                    F.col("q").alias("q_cached"), F.col("n_docs").alias("n_cached")
                )
            ),
            "q_cached",
        )
        .join(
            F.broadcast(
                counts.select(
                    F.col("q").alias("q_new"), F.col("n_docs").alias("n_new")
                )
            ),
            "q_new",
        )
        .join(ov, ["q_cached", "q_new"], "left")
        .select(
            "q_cached",
            "q_new",
            "subset_plan",
            "n_cached",
            "n_new",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)) == F.col("n_new")
            ).alias("containment_verified"),
            (
                F.col("subset_plan")
                & (F.coalesce("n_overlap", F.lit(0)) == F.col("n_new"))
            ).alias("reuse"),
        )
    )


def _sql_containment() -> str:
    qvals = ", ".join(
        f"('{q}', '{t}')" for q, ts in sorted(CONT_QUERIES.items()) for t in ts
    )
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, term FROM ({SQL_DOC_TOKS})
),
qt AS (SELECT * FROM (VALUES {qvals}) v(q, term)),
qlen AS (SELECT q, CAST(count(*) AS BIGINT) AS qlen FROM qt GROUP BY 1),
matches AS MATERIALIZED (
  SELECT m.q, m.doc_id
  FROM (
    SELECT qt.q, t.doc_id, count(*) AS hit
    FROM qt JOIN toks t USING (term)
    GROUP BY 1, 2
  ) m JOIN qlen l ON l.q = m.q AND m.hit = l.qlen
),
counts AS (
  SELECT q, CAST(count(*) AS BIGINT) AS n_docs FROM matches GROUP BY 1
),
shared AS (
  SELECT a.q AS q_cached, b.q AS q_new, CAST(count(*) AS BIGINT) AS n_shared
  FROM qt a JOIN qt b ON a.term = b.term
  GROUP BY 1, 2
),
pairs AS (
  SELECT la.q AS q_cached, lb.q AS q_new,
         coalesce(s.n_shared, 0) = la.qlen AS subset_plan
  FROM qlen la CROSS JOIN qlen lb
  LEFT JOIN shared s ON s.q_cached = la.q AND s.q_new = lb.q
  WHERE la.q <> lb.q
),
ov AS (
  SELECT a.q AS q_cached, b.q AS q_new, CAST(count(*) AS BIGINT) AS n_overlap
  FROM matches a JOIN matches b ON a.doc_id = b.doc_id AND a.q <> b.q
  GROUP BY 1, 2
)
SELECT p.q_cached, p.q_new, p.subset_plan,
       ca.n_docs AS n_cached, cb.n_docs AS n_new,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(o.n_overlap, 0) = cb.n_docs AS containment_verified,
       p.subset_plan AND coalesce(o.n_overlap, 0) = cb.n_docs AS reuse
FROM pairs p
JOIN counts ca ON ca.q = p.q_cached
JOIN counts cb ON cb.q = p.q_new
LEFT JOIN ov o ON o.q_cached = p.q_cached AND o.q_new = p.q_new
"""


QUERIES["query_containment_plan"] = (
    query_containment_plan,
    _sql_containment(),
)


# ------------------------------------------- Spearman rho + footrule

# The rank-correlation companion to Kendall τ-b (ranker_tau_correlation)
# and RBO (ranker_rbo_overlap): Spearman's rho (1904) over the SAME two
# rankers (BM25 vs Dirichlet-QL) and the SAME top-TAU_K union candidate
# sets. Contract difference vs τ-b: rho is defined here on the two
# DETERMINISTIC TOTAL ORDERS the engine actually serves — (score desc,
# doc_id asc), the rank-identity tie-break of search/bm25.py — so both
# rankings are PERMUTATIONS of 1..n and the tie-free classical formulas
# apply exactly:
#   rho  = 1 - 6 SUM d_i^2 / (n^3 - n)        d_i = ra_i - rb_i
#   tau  = 1 - 4 I / (n (n-1))                I = inversions between perms
#   D    = SUM |d_i|                          (Spearman footrule)
# Everything integer: sum_d2, footrule, inversions are exact int64; the
# micro metrics go through single floored divisions (identical DIV / //).
#
# The permutation setting buys two classical invariants the pytest pins
# (cheap, total, and they catch any rank-extraction bug):
#   Diaconis-Graham (1977):  I <= D <= 2 I          (exact integers)
#   Daniels (1948):          -1 <= 3 tau - 2 rho <= 1
# plus footrule parity: SUM d_i = 0 forces D even.
#
# Scale shape: identical to ranker_tau_correlation — per-query candidate
# sets are bounded (|union| <= 2 TAU_K), the pair self-join is <= ~780
# rows per query, and every dimension join is broadcast.


def ranker_spearman_corr(spark, sf_dir):
    """(q_id, n_docs, sum_d2, footrule, inversions, rho_micro,
    tau_micro): exact Spearman rho / footrule / inversion counts between
    the BM25 and Dirichlet-QL serving orders over the top-20 union."""
    from harvester_spark.operators.retrieval import (
        HN_N_QUERIES,
        HN_Q_LEN,
        _graded_ranking,
    )

    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    graded = _graded_ranking(spark, sf_dir)

    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(
        F.col("p0").asc(), F.col("term").asc()
    )
    qsel = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )

    qterms = qsel.select("term").distinct()
    toksq = toks.join(F.broadcast(qterms), "term")
    tfq = toksq.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    cfq = toksq.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    ct = toks.agg(F.count("*").cast("long").alias("ct"))

    dirs = (
        graded.select("q_id", "doc_id")
        .join(F.broadcast(qsel), "q_id")
        .join(tfq, ["term", "doc_id"], "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0)).cast("long"))
        .join(F.broadcast(cfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(ct))
        .withColumn("lp", F.expr(_SIGN_LP))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("lp").cast("long").alias("score_b"))
    )

    both_sc = graded.select("q_id", "doc_id", "score").join(
        dirs, ["q_id", "doc_id"]
    )
    wa_ = W.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    wb_ = W.partitionBy("q_id").orderBy(
        F.col("score_b").desc(), F.col("doc_id").asc()
    )
    sel = (
        both_sc.withColumn("ra", F.row_number().over(wa_))
        .withColumn("rb", F.row_number().over(wb_))
        .filter((F.col("ra") <= TAU_K) | (F.col("rb") <= TAU_K))
        .select("q_id", "doc_id", "score", "score_b")
    )
    # Re-rank WITHIN the union set: both orders become permutations of
    # 1..n over the same candidates.
    rk = sel.select(
        "q_id",
        "doc_id",
        F.row_number().over(wa_).alias("ra2"),
        F.row_number().over(wb_).alias("rb2"),
    )
    x, y = rk.alias("x"), rk.alias("y")
    inv = (
        x.join(
            y,
            (F.col("x.q_id") == F.col("y.q_id"))
            & (F.col("x.ra2") < F.col("y.ra2")),
        )
        .groupBy(F.col("x.q_id").alias("q_id"))
        .agg(
            F.sum(F.expr("CAST(x.rb2 > y.rb2 AS BIGINT)"))
            .cast("long")
            .alias("inversions")
        )
    )
    per = rk.groupBy("q_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            (F.col("ra2") - F.col("rb2")) * (F.col("ra2") - F.col("rb2"))
        )
        .cast("long")
        .alias("sum_d2"),
        F.sum(F.abs(F.col("ra2") - F.col("rb2")))
        .cast("long")
        .alias("footrule"),
    )
    return (
        per.join(inv, "q_id")
        .filter(F.col("n_docs") >= 2)
        .select(
            "q_id",
            "n_docs",
            "sum_d2",
            "footrule",
            "inversions",
            F.expr(
                "CAST(1000000 - (6000000 * sum_d2)"
                " DIV (n_docs * n_docs * n_docs - n_docs) AS BIGINT)"
            ).alias("rho_micro"),
            F.expr(
                "CAST(1000000 - (4000000 * inversions)"
                " DIV (n_docs * (n_docs - 1)) AS BIGINT)"
            ).alias("tau_micro"),
        )
    )


def _sql_spearman() -> str:
    from harvester_spark.operators.retrieval import _SQL_GRADED_PREFIX

    return _SQL_GRADED_PREFIX + f""",
sp_cfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qsel) GROUP BY 1
),
sp_ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
sp_dirs AS (
  SELECT q_id, doc_id, CAST(sum({_SIGN_LP}) AS BIGINT) AS score_b
  FROM (
    SELECT g.q_id, g.doc_id,
           CAST(coalesce(tf.tf, 0) AS BIGINT) AS tf,
           c.cf, CAST(dl.dl AS BIGINT) AS dl, sp_ctt.ct
    FROM (SELECT q_id, doc_id FROM graded) g
    JOIN qsel q ON q.q_id = g.q_id
    LEFT JOIN tf ON tf.term = q.term AND tf.doc_id = g.doc_id
    JOIN sp_cfq c ON c.term = q.term
    JOIN dl ON dl.doc_id = g.doc_id
    CROSS JOIN sp_ctt
  ) GROUP BY 1, 2
),
sp_ab AS (
  SELECT g.q_id, g.doc_id, g.score, d.score_b
  FROM graded g JOIN sp_dirs d
    ON d.q_id = g.q_id AND d.doc_id = g.doc_id
),
sp_sel AS (
  SELECT q_id, doc_id, score, score_b FROM (
    SELECT *,
           row_number() OVER (
             PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS ra,
           row_number() OVER (
             PARTITION BY q_id ORDER BY score_b DESC, doc_id ASC) AS rb
    FROM sp_ab
  ) WHERE ra <= {TAU_K} OR rb <= {TAU_K}
),
sp_rk AS (
  SELECT q_id, doc_id,
         row_number() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS ra2,
         row_number() OVER (
           PARTITION BY q_id ORDER BY score_b DESC, doc_id ASC) AS rb2
  FROM sp_sel
),
sp_inv AS (
  SELECT x.q_id,
         CAST(sum((x.rb2 > y.rb2)::INT) AS BIGINT) AS inversions
  FROM sp_rk x JOIN sp_rk y
    ON x.q_id = y.q_id AND x.ra2 < y.ra2
  GROUP BY 1
),
sp_per AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum((ra2 - rb2) * (ra2 - rb2)) AS BIGINT) AS sum_d2,
         CAST(sum(abs(ra2 - rb2)) AS BIGINT) AS footrule
  FROM sp_rk GROUP BY 1
)
SELECT p.q_id, p.n_docs, p.sum_d2, p.footrule, i.inversions,
       CAST(1000000 - (6000000 * p.sum_d2)
            // (p.n_docs * p.n_docs * p.n_docs - p.n_docs) AS BIGINT)
         AS rho_micro,
       CAST(1000000 - (4000000 * i.inversions)
            // (p.n_docs * (p.n_docs - 1)) AS BIGINT) AS tau_micro
FROM sp_per p JOIN sp_inv i USING (q_id)
WHERE p.n_docs >= 2
"""


QUERIES["ranker_spearman_corr"] = (ranker_spearman_corr, _sql_spearman())


# ------------------------------------------- isotonic calibration (PAV)

# ranker_calibration_ece DIAGNOSES miscalibration; this operator is the
# classic FIX: isotonic regression of click rate on score (Ayer et al.
# 1955; Zadrozny & Elkan KDD 2002 for rankers). Instead of the
# sequential pool-adjacent-violators sweep, the fit is computed by the
# MINIMAX characterization
#   iso_i = max_{j<=i} min_{k>=i} mean(y[j..k])
# which is pure interval algebra over bucket prefix sums — O(B^3) on
# B = ISO_BUCKETS score buckets, fully relational in both engines. The
# pytest runs the REAL sequential PAV pooling and asserts it equals the
# minimax values bucket-for-bucket (the classical equivalence theorem,
# machine-checked), plus monotonicity and blip pooling.
#
# Floored-milli exactness: floor is monotone, so max-min of floored
# interval means equals the floored max-min — computing with milli
# integer means is EXACT, not an approximation (argument in test).
#
# Planted violation: true CTR rises with the score bucket
# (ISO_BASE_PM + ISO_SLOPE_PM * b) except a planted dip over buckets
# ISO_DIP_LO..ISO_DIP_HI — the non-monotone blip isotonic pooling
# exists to flatten; md5 per-unit click draws realize it.
#
# Scale shape: one documents scan -> per-bucket counts; the interval
# frame is B^2 rows, corpus-independent.

ISO_BUCKETS = 20
ISO_BASE_PM = 100
ISO_SLOPE_PM = 40
ISO_DIP_LO, ISO_DIP_HI, ISO_DIP_PM = 12, 14, 200


def ranker_isotonic_calibrate(spark, sf_dir):
    """(bucket, n, clicks, raw_ctr_milli, iso_ctr_milli): per-score-
    bucket click rate and its isotonic (PAV) calibration via the exact
    minimax interval formula."""
    from harvester_spark.operators.graph import _hash56

    units = (
        load(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("unit"))
        .select(
            "unit",
            (
                _hash56(F.concat(F.lit("ib|"), F.col("unit").cast("string")))
                % ISO_BUCKETS
            ).cast("long").alias("bucket"),
            (
                _hash56(F.concat(F.lit("ic|"), F.col("unit").cast("string")))
                % 1000
            ).cast("long").alias("draw"),
        )
        .withColumn(
            "p_pm",
            F.expr(
                f"CAST(CASE WHEN bucket BETWEEN {ISO_DIP_LO} AND {ISO_DIP_HI}"
                f" THEN {ISO_DIP_PM}"
                f" ELSE {ISO_BASE_PM} + {ISO_SLOPE_PM} * bucket END"
                " AS BIGINT)"
            ),
        )
        .withColumn("y", F.expr("CAST(draw < p_pm AS BIGINT)"))
    )
    per = units.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("clicks"),
    )
    wp = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = per.select(
        "bucket",
        "n",
        "clicks",
        F.sum("n").over(wp).cast("long").alias("cn"),
        F.sum("clicks").over(wp).cast("long").alias("cy"),
    )
    lo = pre.select(
        F.col("bucket").alias("j"),
        (F.col("cn") - F.col("n")).alias("n_lo"),
        (F.col("cy") - F.col("clicks")).alias("y_lo"),
    )
    hi = pre.select(
        F.col("bucket").alias("k"),
        F.col("cn").alias("n_hi"),
        F.col("cy").alias("y_hi"),
    )
    iv = (
        lo.crossJoin(hi)
        .filter(F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            F.expr(
                "CAST((1000 * (y_hi - y_lo)) DIV (n_hi - n_lo) AS BIGINT)"
            ).alias("mean_milli"),
        )
    )
    idx = per.select(F.col("bucket").alias("i"))
    inner = (
        idx.join(iv, (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k")))
        .groupBy("i", "j")
        .agg(F.min("mean_milli").cast("long").alias("mn"))
    )
    iso = inner.groupBy("i").agg(F.max("mn").cast("long").alias("iso_ctr_milli"))
    return (
        per.join(iso, per["bucket"] == iso["i"])
        .select(
            "bucket",
            "n",
            "clicks",
            F.expr("CAST((1000 * clicks) DIV n AS BIGINT)").alias(
                "raw_ctr_milli"
            ),
            "iso_ctr_milli",
        )
    )


def _sql_isotonic() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    hb = _SQL_HASH56.format(col="'ib|' || CAST(unit AS VARCHAR)")
    hc = _SQL_HASH56.format(col="'ic|' || CAST(unit AS VARCHAR)")
    return f"""
WITH iu AS (
  SELECT unit, {hb} % {ISO_BUCKETS} AS bucket, {hc} % 1000 AS draw
  FROM (SELECT doc_id AS unit FROM documents)
),
iy AS (
  SELECT bucket,
         CAST(draw < CASE WHEN bucket BETWEEN {ISO_DIP_LO} AND {ISO_DIP_HI}
              THEN {ISO_DIP_PM}
              ELSE {ISO_BASE_PM} + {ISO_SLOPE_PM} * bucket END
              AS BIGINT) AS y
  FROM iu
),
iper AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS clicks
  FROM iy GROUP BY 1
),
ipre AS (
  SELECT bucket, n, clicks,
         CAST(sum(n) OVER w AS BIGINT) AS cn,
         CAST(sum(clicks) OVER w AS BIGINT) AS cy
  FROM iper
  WINDOW w AS (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
iiv AS (
  SELECT l.bucket AS j, h.bucket AS k,
         CAST((1000 * (h.cy - (l.cy - l.clicks)))
              // (h.cn - (l.cn - l.n)) AS BIGINT) AS mean_milli
  FROM ipre l CROSS JOIN ipre h
  WHERE l.bucket <= h.bucket
),
iin AS (
  SELECT p.bucket AS i, v.j, CAST(min(v.mean_milli) AS BIGINT) AS mn
  FROM iper p JOIN iiv v ON v.j <= p.bucket AND p.bucket <= v.k
  GROUP BY 1, 2
),
iiso AS (
  SELECT i, CAST(max(mn) AS BIGINT) AS iso_ctr_milli FROM iin GROUP BY 1
)
SELECT p.bucket, p.n, p.clicks,
       CAST((1000 * p.clicks) // p.n AS BIGINT) AS raw_ctr_milli,
       s.iso_ctr_milli
FROM iper p JOIN iiso s ON s.i = p.bucket
"""


QUERIES["ranker_isotonic_calibrate"] = (
    ranker_isotonic_calibrate,
    _sql_isotonic(),
)


# ------------------------------------- paired randomization (Fisher) test

# Smucker-Allan-Carterette (CIKM 2007): the randomization test is the
# preferred significance test for paired IR evaluation — the sign test
# (ranker_sign_test) throws away magnitudes; the permutation test keeps
# them by re-randomizing the SIGN of each per-query delta. Same paired
# nDCG@10 delta frame as the sign test (BM25 vs Dirichlet-QL over the
# 16-query registry), PT_REPS md5-derived sign-flip replicates:
#   stat_r = SUM_q flip(r, q) * delta_q,  flip in {-1, +1}
#   p = (1 + #{r: |stat_r| >= |observed|}) / (PT_REPS + 1)
# (the add-one Monte-Carlo convention — exact-valid for any replicate
# count). Everything integer: deltas are micro-DCG int64, flips are
# hash parity bits, and p arrives in micro units through one floored
# division.
#
# Scale shape: the delta frame is HN_N_QUERIES rows; the replicate
# cross is queries x PT_REPS (~4k rows). All the corpus-sized work is
# the shared graded/Dirichlet scoring prefix.

PT_REPS = 256


def ranker_permutation_test(spark, sf_dir):
    """(n_queries, sum_delta_micro, n_reps, n_extreme, p_micro): paired
    sign-flip randomization test on the per-query BM25-vs-Dirichlet
    nDCG@10 deltas."""
    from harvester_spark.operators.graph import _hash56
    from harvester_spark.operators.retrieval import (
        HN_N_QUERIES,
        HN_Q_LEN,
        NDCG_K,
        _NDCG_ADDEND,
        _graded_ranking,
    )

    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    graded = _graded_ranking(spark, sf_dir)

    qdocs = docs.select("doc_id").orderBy("doc_id").limit(HN_N_QUERIES)
    first = (
        toks.join(F.broadcast(qdocs), "doc_id")
        .groupBy("doc_id", "term")
        .agg(F.min("pos").alias("p0"))
    )
    wsel = W.partitionBy("doc_id").orderBy(
        F.col("p0").asc(), F.col("term").asc()
    )
    qsel = (
        first.withColumn("r", F.row_number().over(wsel))
        .filter(F.col("r") <= HN_Q_LEN)
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    qterms = qsel.select("term").distinct()
    toksq = toks.join(F.broadcast(qterms), "term")
    tfq = toksq.groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    cfq = toksq.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    ct = toks.agg(F.count("*").cast("long").alias("ct"))
    dirs = (
        graded.select("q_id", "doc_id")
        .join(F.broadcast(qsel), "q_id")
        .join(tfq, ["term", "doc_id"], "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0)).cast("long"))
        .join(F.broadcast(cfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(ct))
        .withColumn("lp", F.expr(_SIGN_LP))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("lp").cast("long").alias("score_b"))
    )
    wa_ = W.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    dcg_a = (
        graded.withColumn("rnk", F.row_number().over(wa_))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("dcg_a"))
    )
    wb_ = W.partitionBy("q_id").orderBy(
        F.col("score_b").desc(), F.col("doc_id").asc()
    )
    dcg_b = (
        dirs.join(graded.select("q_id", "doc_id", "rel"), ["q_id", "doc_id"])
        .withColumn("rnk", F.row_number().over(wb_))
        .filter(F.col("rnk") <= NDCG_K)
        .withColumn("addend", F.expr(_NDCG_ADDEND))
        .groupBy("q_id")
        .agg(F.sum("addend").cast("long").alias("dcg_b"))
    )
    deltas = (
        dcg_a.join(dcg_b, "q_id")
        .select("q_id", (F.col("dcg_a") - F.col("dcg_b")).alias("delta"))
        .localCheckpoint()
    )
    obs = F.broadcast(
        deltas.agg(
            F.count("*").cast("long").alias("n_queries"),
            F.sum("delta").cast("long").alias("obs"),
        )
    )
    reps = F.broadcast(
        spark.range(PT_REPS).select(F.col("id").cast("long").alias("rep"))
    )
    flip = (
        2
        * (
            _hash56(
                F.concat(
                    F.lit("pt"),
                    F.col("rep").cast("string"),
                    F.lit("|"),
                    F.col("q_id").cast("string"),
                )
            )
            % 2
        )
        - 1
    ).cast("long")
    stats = (
        deltas.crossJoin(reps)
        .select("rep", (flip * F.col("delta")).alias("fd"))
        .groupBy("rep")
        .agg(F.sum("fd").cast("long").alias("stat"))
    )
    ext = (
        stats.crossJoin(obs)
        .agg(
            F.sum(F.expr("CAST(abs(stat) >= abs(obs) AS BIGINT)"))
            .cast("long")
            .alias("n_extreme")
        )
    )
    return (
        obs.crossJoin(F.broadcast(ext))
        .select(
            "n_queries",
            F.col("obs").alias("sum_delta_micro"),
            F.lit(PT_REPS).cast("long").alias("n_reps"),
            "n_extreme",
            F.expr(
                f"CAST((1000000 * (1 + n_extreme)) DIV ({PT_REPS} + 1)"
                " AS BIGINT)"
            ).alias("p_micro"),
        )
    )


def _sql_permutation_test() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56
    from harvester_spark.operators.retrieval import (
        NDCG_K,
        _NDCG_ADDEND,
        _SQL_GRADED_PREFIX,
    )

    h = _SQL_HASH56.format(
        col="'pt' || CAST(rep AS VARCHAR) || '|' || CAST(q_id AS VARCHAR)"
    )
    return _SQL_GRADED_PREFIX + f""",
pt_cfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qsel) GROUP BY 1
),
pt_ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
pt_dirs AS (
  SELECT q_id, doc_id, CAST(sum({_SIGN_LP}) AS BIGINT) AS score_b
  FROM (
    SELECT g.q_id, g.doc_id,
           CAST(coalesce(tf.tf, 0) AS BIGINT) AS tf,
           c.cf, CAST(dl.dl AS BIGINT) AS dl, pt_ctt.ct
    FROM (SELECT q_id, doc_id FROM graded) g
    JOIN qsel q ON q.q_id = g.q_id
    LEFT JOIN tf ON tf.term = q.term AND tf.doc_id = g.doc_id
    JOIN pt_cfq c ON c.term = q.term
    JOIN dl ON dl.doc_id = g.doc_id
    CROSS JOIN pt_ctt
  ) GROUP BY 1, 2
),
pt_dcga AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_a
  FROM (
    SELECT q_id, rel,
           row_number() OVER (PARTITION BY q_id
             ORDER BY score DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY 1
),
pt_dcgb AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_b
  FROM (
    SELECT d.q_id, g.rel,
           row_number() OVER (PARTITION BY d.q_id
             ORDER BY d.score_b DESC, d.doc_id ASC) AS rnk
    FROM pt_dirs d JOIN graded g
      ON g.q_id = d.q_id AND g.doc_id = d.doc_id
  ) WHERE rnk <= {NDCG_K} GROUP BY 1
),
pt_deltas AS MATERIALIZED (
  SELECT a.q_id, CAST(a.dcg_a - b.dcg_b AS BIGINT) AS delta
  FROM pt_dcga a JOIN pt_dcgb b USING (q_id)
),
pt_obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_queries,
         CAST(sum(delta) AS BIGINT) AS obs
  FROM pt_deltas
),
pt_stats AS (
  SELECT rep, CAST(sum((2 * ({h} % 2) - 1) * delta) AS BIGINT) AS stat
  FROM pt_deltas CROSS JOIN (SELECT unnest(range({PT_REPS})) AS rep)
  GROUP BY 1
),
pt_ext AS (
  SELECT CAST(sum(CASE WHEN abs(s.stat) >= abs(o.obs)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM pt_stats s CROSS JOIN pt_obs o
)
SELECT o.n_queries, o.obs AS sum_delta_micro,
       CAST({PT_REPS} AS BIGINT) AS n_reps, e.n_extreme,
       CAST((1000000 * (1 + e.n_extreme)) // ({PT_REPS} + 1) AS BIGINT)
         AS p_micro
FROM pt_obs o CROSS JOIN pt_ext e
"""


QUERIES["ranker_permutation_test"] = (
    ranker_permutation_test,
    _sql_permutation_test(),
)


# ----------------------------------- pre-retrieval QPP concordance eval

# The QPP family's other half: ft_qpp_nqc_wig and ft_clarity_qpp are
# POST-retrieval predictors (they look at scores); the classic
# PRE-retrieval ones (He & Ounis 2004; Zhao, Scholer & Tsegay 2008)
# predict difficulty from term statistics alone — avgIDF, maxIDF and
# the summed collection-query similarity SCQ = SUM (1 + ln cf) * ln(1
# + N/df). This operator closes the loop the NQC op leaves open: each
# predictor's per-query value is ranked against the query's REALIZED
# BM25 nDCG@10 (the sign-test graded machinery) and scored by exact
# Kendall concordance counts over the 16-query registry.
#
# Everything integer: predictor values are micro-nat sums (the shared
# floor-ln idiom), nDCG is the exact micro ratio, concordance is
# sign-product counting (the ranker_tau_correlation kernel), tau_a in
# milli with one floored division. Measured: the predictors are NOISE
# on this corpus (tau between -0.37 and +0.14, sign-unstable across
# scales) — an honest negative control mirroring the literature's
# finding that pre-retrieval predictors are weak, and the contrast
# with the post-retrieval family (ft_qpp_nqc_wig, ft_clarity_qpp)
# whose evidence actually comes from the score distribution. The
# pytest pins the recompute and |tau| <= 0.5 (the no-real-signal
# band), never a flattering magnitude.

QPP_PRE_PREDICTORS = ("avg_idf", "max_idf", "scq")


def ft_qpp_preretrieval_eval(spark, sf_dir):
    """(predictor, n_queries, n_pairs, concordant, discordant, ties,
    tau_a_milli): Kendall concordance of avgIDF / maxIDF / SCQ against
    realized per-query BM25 nDCG@10."""
    from harvester_spark.operators.retrieval import (
        HN_N_QUERIES,
        HN_Q_LEN,
        NDCG_K,
        _NDCG_ADDEND,
        _graded_ranking,
    )

    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    graded = _graded_ranking(spark, sf_dir)
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
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    n_df = F.broadcast(docs.agg(F.count("*").cast("long").alias("n")))
    stats = (
        toks.join(F.broadcast(qsel.select("term").distinct()), "term")
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count("*").cast("long").alias("cf"),
        )
        .crossJoin(n_df)
        .select(
            "term",
            F.expr(
                "CAST(floor(ln(n * 1.0e0 / df) * 1.0e6 + 0.5e0) AS BIGINT)"
            ).alias("idf_micro"),
            F.expr(
                "CAST(floor((1.0e0 + ln(cf)) * ln(1.0e0 + n * 1.0e0 / df)"
                " * 1.0e6 + 0.5e0) AS BIGINT)"
            ).alias("scq_micro"),
        )
    )
    pred = (
        qsel.join(F.broadcast(stats), "term")
        .groupBy("q_id")
        .agg(
            F.expr("CAST(sum(idf_micro) DIV count(*) AS BIGINT)").alias(
                "avg_idf"
            ),
            F.max("idf_micro").cast("long").alias("max_idf"),
            F.sum("scq_micro").cast("long").alias("scq"),
        )
    )
    wa_ = W.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    dcg = (
        graded.withColumn("rnk", F.row_number().over(wa_))
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
    frame = (
        pred.join(dcg, "q_id")
        .join(F.broadcast(idcg), "q_id")
        .withColumn(
            "ndcg",
            F.expr("CAST(dcg_micro * 1000000 DIV idcg_micro AS BIGINT)"),
        )
    )
    melted = None
    for p in QPP_PRE_PREDICTORS:
        leg = frame.select(
            F.lit(p).alias("predictor"),
            "q_id",
            F.col(p).alias("pv"),
            "ndcg",
        )
        melted = leg if melted is None else melted.unionByName(leg)
    x, y = melted.alias("x"), melted.alias("y")
    pairs = x.join(
        y,
        (F.col("x.predictor") == F.col("y.predictor"))
        & (F.col("x.q_id") < F.col("y.q_id")),
    ).select(
        F.col("x.predictor").alias("predictor"),
        F.expr(
            "CASE WHEN x.pv > y.pv THEN 1 WHEN x.pv < y.pv THEN -1"
            " ELSE 0 END"
        ).alias("sp"),
        F.expr(
            "CASE WHEN x.ndcg > y.ndcg THEN 1 WHEN x.ndcg < y.ndcg"
            " THEN -1 ELSE 0 END"
        ).alias("sn"),
    )
    return (
        pairs.groupBy("predictor")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.expr("CAST(sp * sn = 1 AS BIGINT)")).cast("long").alias(
                "concordant"
            ),
            F.sum(F.expr("CAST(sp * sn = -1 AS BIGINT)")).cast("long").alias(
                "discordant"
            ),
            F.sum(F.expr("CAST(sp * sn = 0 AS BIGINT)")).cast("long").alias(
                "ties"
            ),
        )
        .select(
            "predictor",
            F.lit(HN_N_QUERIES).cast("long").alias("n_queries"),
            "n_pairs",
            "concordant",
            "discordant",
            "ties",
            F.expr(
                "CASE WHEN concordant - discordant >= 0 THEN"
                " CAST((1000 * (concordant - discordant)) DIV n_pairs"
                " AS BIGINT)"
                " ELSE -CAST((1000 * (discordant - concordant)) DIV n_pairs"
                " AS BIGINT) END"
            ).alias("tau_a_milli"),
        )
    )


def _sql_qpp_pre() -> str:
    from harvester_spark.operators.retrieval import (
        HN_N_QUERIES,
        NDCG_K,
        _NDCG_ADDEND,
        _SQL_GRADED_PREFIX,
    )

    return _SQL_GRADED_PREFIX + f""",
qpn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
qpst AS (
  SELECT t.term,
         CAST(floor(ln(qpn.n * 1.0e0 / count(DISTINCT t.doc_id))
              * 1.0e6 + 0.5e0) AS BIGINT) AS idf_micro,
         CAST(floor((1.0e0 + ln(count(*)))
              * ln(1.0e0 + qpn.n * 1.0e0 / count(DISTINCT t.doc_id))
              * 1.0e6 + 0.5e0) AS BIGINT) AS scq_micro
  FROM toks t CROSS JOIN qpn
  WHERE t.term IN (SELECT DISTINCT term FROM qsel)
  GROUP BY t.term, qpn.n
),
qppred AS (
  SELECT q.q_id,
         CAST(sum(s.idf_micro) // count(*) AS BIGINT) AS avg_idf,
         CAST(max(s.idf_micro) AS BIGINT) AS max_idf,
         CAST(sum(s.scq_micro) AS BIGINT) AS scq
  FROM qsel q JOIN qpst s USING (term)
  GROUP BY 1
),
qpdcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS dcg_micro
  FROM (
    SELECT q_id, rel,
           row_number() OVER (PARTITION BY q_id
             ORDER BY score DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY 1
),
qpidcg AS (
  SELECT q_id, CAST(sum({_NDCG_ADDEND}) AS BIGINT) AS idcg_micro FROM (
    SELECT q_id, rel,
           row_number() OVER (
             PARTITION BY q_id ORDER BY rel DESC, doc_id ASC) AS rnk
    FROM graded
  ) WHERE rnk <= {NDCG_K} GROUP BY q_id
),
qpfr AS MATERIALIZED (
  SELECT p.q_id, p.avg_idf, p.max_idf, p.scq,
         CAST(d.dcg_micro * 1000000 // i.idcg_micro AS BIGINT) AS ndcg
  FROM qppred p JOIN qpdcg d USING (q_id) JOIN qpidcg i USING (q_id)
),
qpm AS MATERIALIZED (
  SELECT 'avg_idf' AS predictor, q_id, avg_idf AS pv, ndcg FROM qpfr
  UNION ALL SELECT 'max_idf', q_id, max_idf, ndcg FROM qpfr
  UNION ALL SELECT 'scq', q_id, scq, ndcg FROM qpfr
),
qpp AS (
  SELECT x.predictor,
         CASE WHEN x.pv > y.pv THEN 1 WHEN x.pv < y.pv THEN -1 ELSE 0 END
           AS sp,
         CASE WHEN x.ndcg > y.ndcg THEN 1 WHEN x.ndcg < y.ndcg THEN -1
              ELSE 0 END AS sn
  FROM qpm x JOIN qpm y
    ON x.predictor = y.predictor AND x.q_id < y.q_id
)
SELECT predictor, CAST({HN_N_QUERIES} AS BIGINT) AS n_queries,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum((sp * sn = 1)::INT) AS BIGINT) AS concordant,
       CAST(sum((sp * sn = -1)::INT) AS BIGINT) AS discordant,
       CAST(sum((sp * sn = 0)::INT) AS BIGINT) AS ties,
       CASE WHEN sum((sp * sn = 1)::INT) - sum((sp * sn = -1)::INT) >= 0
            THEN CAST((1000 * (sum((sp * sn = 1)::INT)
                 - sum((sp * sn = -1)::INT))) // count(*) AS BIGINT)
            ELSE -CAST((1000 * (sum((sp * sn = -1)::INT)
                 - sum((sp * sn = 1)::INT))) // count(*) AS BIGINT) END
         AS tau_a_milli
FROM qpp GROUP BY 1
"""


QUERIES["ft_qpp_preretrieval_eval"] = (
    ft_qpp_preretrieval_eval,
    _sql_qpp_pre(),
)
