"""ES/OpenSearch query-DSL tail: function_score decay, boosting query,
match_phrase_prefix, _termvectors, top_hits aggregation.

Five more OpenSearch serving surfaces the reference reaches only through
its cluster config (/root/reference/harvester/search/), re-expressed as
verifiable (Spark, DuckDB-oracle) pairs:

- ``ft_function_score_topk`` — ``function_score`` with a ``gauss`` decay
  on a numeric field (n_chars; the synthetic corpus has no timestamp) and
  ``boost_mode: multiply``. The decay multiplier is computed in integer
  MICRO-UNITS from ONE shared expression string (the exp/ln micro idiom
  of operators/__init__.py), and the blend is pure int64 arithmetic
  (bm25_micro · decay_micro DIV 1e6) — no cross-engine float product.
- ``ft_boosting_topk`` — the ``boosting`` query: docs matching the
  negative term keep their positive BM25 demoted by negative_boost = 0.5
  (integer halving of the micro score). The negative set is a broadcast
  left join, not a second scoring pass.
- ``ft_phrase_prefix`` — ``match_phrase_prefix``: the final query term is
  a prefix that expands against the dictionary ('key s*' → key followed
  by any s-term). Relational form: position adjacency with a prefix
  predicate on the second leg — the serving engine does the same through
  IndexSearcher.dict_probe + the positional chain kernel.
- ``ft_term_vectors`` — the ``_termvectors`` API with term_statistics:
  per (doc, term) tf, sorted position list, first position, and the
  corpus-wide doc_freq.
- ``es_top_hits_per_bucket`` — the ``top_hits`` sub-aggregation: top-3
  events per event_type bucket by (value desc, event_id asc).

Scale shapes:
- function_score/boosting: bounded joins onto the already-aggregated
  per-doc score frame (one row per candidate doc); the decay input is a
  broadcast-able doc attribute; TakeOrdered tail.
- phrase_prefix: the prefix leg filters BEFORE the position join, so the
  join is |postings(key)| ⋈ |postings(s*)| on doc_id — an equi-join,
  never a cartesian; at cluster scale the prefix expansion is a bounded
  dictionary probe (dict_probe), not a vocabulary scan.
- term_vectors: the per-doc leg prunes to the requested docs at the scan
  (pushed IN filter); only the df join touches corpus-wide stats, and it
  joins on the tiny distinct-term set of those docs.
- top_hits: ``row_number() <= k`` compiles to WindowGroupLimit (partial
  per-partition top-k BEFORE the shuffle) — each mapper ships at most k
  rows per bucket, the classic distributed grouped-top-k.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.operators.common import SQL_DOC_TOKS, load, doc_tokens
from harvester_spark.operators.fulltext_queries import BM25_TERMS, bm25_or_scored
from harvester_spark.operators.ranking_ext import _sql_components

QUERIES: dict = {}

# gauss(n_chars; origin=300, offset=50, scale=100): multiplier 1.0 inside
# |n_chars-300| <= 50, half-life at distance `scale` beyond the offset.
_GAUSS_ORIGIN, _GAUSS_OFFSET, _GAUSS_SCALE2 = 300, 50, 10000

# ONE shared expression string — identical text on both engines (the
# micro-unit idiom: exp is libm/JVM 1-ulp territory, so the result is
# pinned to int64 micro-units immediately).
_DECAY_MICRO_EXPR = (
    "CAST(floor(exp(-(greatest(abs(n_chars - 300) - 50, 0)"
    " * greatest(abs(n_chars - 300) - 50, 0))"
    " * ln(2.0e0) / 10000.0e0) * 1.0e6 + 0.5e0) AS BIGINT)"
)

# Recover the round(.,6) BM25 double into exact int64 micro-units (the
# value IS a 6dp decimal, so *1e6 is integral up to float noise).
_BM25_MICRO_EXPR = "CAST(floor(score * 1.0e6 + 0.5e0) AS BIGINT)"

_SQL_OR_SCORED = f"""
WITH {_sql_components(BM25_TERMS)},
scored AS (SELECT doc_id, round(sum(contrib), 6) AS score FROM comps GROUP BY doc_id)
"""


def _take10_micro(scored):
    top = scored.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score_micro"
    )


def ft_function_score_topk(spark, sf_dir):
    """function_score gauss-decay top-10: bm25_micro · decay_micro DIV 1e6
    — all-integer blend over the shared OR kernel."""
    scored = bm25_or_scored(spark, sf_dir)
    feats = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    combined = (
        scored.join(feats, "doc_id")
        .withColumn("bm25_micro", F.expr(_BM25_MICRO_EXPR))
        .withColumn("decay_micro", F.expr(_DECAY_MICRO_EXPR))
        .selectExpr(
            "doc_id", "(bm25_micro * decay_micro) DIV 1000000 AS score_micro"
        )
    )
    return _take10_micro(combined)


SQL_FUNCTION_SCORE_TOPK = f"""
{_SQL_OR_SCORED},
combined AS (
  SELECT s.doc_id,
         ({_BM25_MICRO_EXPR} * {_DECAY_MICRO_EXPR}) // 1000000 AS score_micro
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score_micro
FROM combined ORDER BY rank LIMIT 10
"""

QUERIES["ft_function_score_topk"] = (ft_function_score_topk, SQL_FUNCTION_SCORE_TOPK)


_NEG_TERM = "slow"  # boosting-query negative leg; negative_boost = 0.5


def ft_boosting_topk(spark, sf_dir):
    """boosting-query top-10: positive BM25 OR, docs containing the
    negative term demoted to half (integer DIV on the micro score)."""
    scored = bm25_or_scored(spark, sf_dir).withColumn(
        "bm25_micro", F.expr(_BM25_MICRO_EXPR)
    )
    neg = (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term") == _NEG_TERM)
        .select("doc_id")
        .distinct()
        .withColumn("is_neg", F.lit(1))
    )
    combined = scored.join(neg, "doc_id", "left").selectExpr(
        "doc_id",
        "CASE WHEN is_neg IS NULL THEN bm25_micro"
        " ELSE bm25_micro DIV 2 END AS score_micro",
    )
    return _take10_micro(combined)


SQL_BOOSTING_TOPK = f"""
{_SQL_OR_SCORED},
neg AS (
  SELECT DISTINCT doc_id FROM ({SQL_DOC_TOKS}) WHERE term = '{_NEG_TERM}'
),
combined AS (
  SELECT s.doc_id,
         CASE WHEN n.doc_id IS NULL THEN {_BM25_MICRO_EXPR}
              ELSE {_BM25_MICRO_EXPR} // 2 END AS score_micro
  FROM scored s LEFT JOIN neg n USING (doc_id)
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score_micro
FROM combined ORDER BY rank LIMIT 10
"""

QUERIES["ft_boosting_topk"] = (ft_boosting_topk, SQL_BOOSTING_TOPK)


_PP_FIRST, _PP_PREFIX = "key", "s"  # match_phrase_prefix: "key s*"


def ft_phrase_prefix(spark, sf_dir):
    """match_phrase_prefix hits: first term followed immediately by ANY
    term with the prefix; per doc the occurrence count and how many
    distinct expansions matched."""
    toks = doc_tokens(spark, sf_dir)
    a = toks.filter(F.col("term") == _PP_FIRST).select("doc_id", "pos")
    b = toks.filter(F.col("term").startswith(_PP_PREFIX)).select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("pos").alias("pos_b"),
        F.col("term").alias("expansion"),
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_id_b"))
            & (F.col("pos_b") == F.col("pos") + 1),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("expansion").alias("n_expansions"),
        )
    )


SQL_PHRASE_PREFIX = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT a.doc_id, count(*) AS n_occurrences,
       count(DISTINCT b.term) AS n_expansions
FROM toks a
JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
WHERE a.term = '{_PP_FIRST}' AND b.term LIKE '{_PP_PREFIX}%'
GROUP BY a.doc_id
"""

QUERIES["ft_phrase_prefix"] = (ft_phrase_prefix, SQL_PHRASE_PREFIX)


_TV_DOCS = (1, 2, 3)  # _termvectors request


def ft_term_vectors(spark, sf_dir):
    """_termvectors with term_statistics: per (doc, term) tf, ordered
    positions, first position, corpus doc_freq."""
    toks = doc_tokens(spark, sf_dir)
    per_doc = (
        toks.filter(F.col("doc_id").isin(*_TV_DOCS))
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").alias("tf"),
            F.min("pos").cast("long").alias("first_pos"),
            F.array_join(F.sort_array(F.collect_list("pos")), ",").alias(
                "positions_csv"
            ),
        )
    )
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("doc_freq"))
    return per_doc.join(df_, "term").select(
        "doc_id", "term", "tf", "doc_freq", "first_pos", "positions_csv"
    )


SQL_TERM_VECTORS = f"""
WITH toks AS ({SQL_DOC_TOKS}),
per_doc AS (
  SELECT doc_id, term, count(*) AS tf,
         CAST(min(pos) AS BIGINT) AS first_pos,
         string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions_csv
  FROM toks WHERE doc_id IN (1, 2, 3)
  GROUP BY doc_id, term
),
df AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM toks GROUP BY term)
SELECT doc_id, term, tf, doc_freq, first_pos, positions_csv
FROM per_doc JOIN df USING (term)
"""

QUERIES["ft_term_vectors"] = (ft_term_vectors, SQL_TERM_VECTORS)


def es_top_hits_per_bucket(spark, sf_dir):
    """top_hits sub-aggregation: top-3 events per event_type by
    (value desc, event_id asc) — row_number <= k compiles to
    WindowGroupLimit (per-partition partial top-k before the shuffle)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "value")
    )


SQL_TOP_HITS = """
SELECT event_type, CAST(rnk AS INT) AS rnk, event_id, value
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rnk
  FROM events
)
WHERE rnk <= 3
"""

QUERIES["es_top_hits_per_bucket"] = (es_top_hits_per_bucket, SQL_TOP_HITS)


# ------------------------------------------- synonym-graph expansion

# Lucene/OpenSearch SynonymGraphFilter at QUERY time: each query term
# becomes an OR-group {term, synonym}; group tf in a doc is the sum over
# the group's members and the group's df/idf is computed over the
# EXPANDED match set — exactly how Lucene scores a synonym-expanded
# TermQuery wrapped in a SynonymQuery (one idf for the blended postings).
# The reference's index config relies on analyzer synonym files
# (/root/reference/harvester/search/models/index.py analyzers); a
# web-scale engine derives them from the corpus instead: here each
# flagship term's synonym is its max-PMI co-occurring term
# (micro-nat PMI, co-doc support ≥ SYN_MIN_CODF, candidates outside the
# query itself; tie → term asc), so both engines derive identical
# synonym tables from data — no shipped wordlist.
#
# Determinism: PMI is ONE shared micro string over exact BIGINT counts;
# group scores follow the ft_bm25_topk float contract (≤ 2-member sums
# per group, round(.,6) vs ulp noise); top-10 ties break doc_id asc.
#
# Scale shape: the synonym vote is a (query-matching docs) ⋈ (their
# distinct terms) equi-join on doc_id — Σ df(q)·distinct-terms rows,
# bounded by the query's df like every serving-path candidate walk; the
# scoring pass is the BM25 OR spine over ≤ 6 terms with broadcast dims.

SYN_MIN_CODF = 5

_PMI_MICRO = (
    "CAST(round(1000000.0e0 * ln("
    "(1.0e0 * n_ab * nd) / (1.0e0 * n_a * n_b)"
    "), 0) AS BIGINT)"
)


def ft_synonym_graph_topk(spark, sf_dir):
    """(rank, doc_id, score): top-10 docs under synonym-graph OR scoring —
    each flagship term OR-blended with its max-PMI corpus synonym
    (SynonymQuery semantics: group tf summed, one idf per group)."""
    toks = doc_tokens(spark, sf_dir)
    docs_n = load(spark, sf_dir, "documents")
    dt = toks.select("doc_id", "term").distinct().cache()
    nd = docs_n.agg(F.count("*").cast("long").alias("nd"))
    dfs = dt.groupBy("term").agg(F.count("*").cast("long").alias("df"))

    qdt = dt.filter(F.col("term").isin(BM25_TERMS)).select(
        F.col("term").alias("qt"), "doc_id"
    )
    co = (
        qdt.join(dt, "doc_id")
        .filter(~F.col("term").isin(BM25_TERMS))
        .groupBy("qt", "term")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= SYN_MIN_CODF)
    )
    pmi = (
        co.join(
            F.broadcast(dfs.select(F.col("term").alias("qt"), F.col("df").alias("n_a"))),
            "qt",
        )
        .join(F.broadcast(dfs.select("term", F.col("df").alias("n_b"))), "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("pmi", F.expr(_PMI_MICRO))
    )
    wsyn = W.partitionBy("qt").orderBy(F.col("pmi").desc(), F.col("term").asc())
    syn = (
        pmi.withColumn("rn", F.row_number().over(wsyn))
        .filter(F.col("rn") == 1)
        .select("qt", F.col("term").alias("syn"))
    )
    groups = (
        syn.select(F.col("qt").alias("grp"), F.col("qt").alias("term"))
        .unionByName(syn.select(F.col("qt").alias("grp"), F.col("syn").alias("term")))
    )

    tf = (
        toks.join(F.broadcast(groups), "term")
        .groupBy("grp", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_g = tf.groupBy("grp").agg(F.count("*").alias("df"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = docs_n.select(F.count("*").alias("n")).crossJoin(
        dl.select((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_g), "grp")
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
            / (
                F.col("tf")
                + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
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


_SYN_TERMS_SQL = "('" + "', '".join(BM25_TERMS) + "')"

SQL_SYNONYM_GRAPH = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dt AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM toks),
nds AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
qdt AS (SELECT term AS qt, doc_id FROM dt WHERE term IN {_SYN_TERMS_SQL}),
co AS (
  SELECT q.qt, d.term, CAST(count(*) AS BIGINT) AS n_ab
  FROM qdt q JOIN dt d USING (doc_id)
  WHERE d.term NOT IN {_SYN_TERMS_SQL}
  GROUP BY 1, 2
  HAVING count(*) >= {SYN_MIN_CODF}
),
pmi AS (
  SELECT co.qt, co.term,
         {_PMI_MICRO} AS pmi
  FROM co
  JOIN (SELECT term AS qt, df AS n_a FROM dfs) a USING (qt)
  JOIN (SELECT term, df AS n_b FROM dfs) b USING (term)
  CROSS JOIN nds
),
syn AS (
  SELECT qt, term AS syn FROM (
    SELECT qt, term,
           row_number() OVER (
             PARTITION BY qt ORDER BY pmi DESC, term ASC) AS rn
    FROM pmi
  ) WHERE rn = 1
),
groups AS (
  SELECT qt AS grp, qt AS term FROM syn
  UNION ALL
  SELECT qt AS grp, syn AS term FROM syn
),
tf AS (
  SELECT g.grp, t.doc_id, count(*) AS tf
  FROM toks t JOIN groups g USING (term)
  GROUP BY 1, 2
),
df_g AS (SELECT grp, count(*) AS df FROM tf GROUP BY 1),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
scored AS (
  SELECT doc_id,
         round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
         ), 6) AS score
  FROM tf JOIN df_g USING (grp) JOIN dls USING (doc_id)
  CROSS JOIN stats
  GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, score
FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_synonym_graph_topk"] = (ft_synonym_graph_topk, SQL_SYNONYM_GRAPH)


# -------------------------------------------------- phonetic analyzer

# The OpenSearch phonetic plugin (analysis-phonetic, Soundex encoder):
# index-time each token emits its phonetic code so "herman" matches
# "hermann". Spark ships American Soundex as a builtin (F.soundex —
# h/w transparent, vowel reset, adjacent-code merge); the oracle
# reimplements the SAME automaton relationally in DuckDB list algebra
# (char→code map; h/w REMOVED, which makes merge-across-h/w automatic;
# vowels kept as '0' separators through the adjacency dedup, dropped
# after; the first letter's code joins the dedup only when the first
# letter is not h/w) — parity over the full vocabulary is what the gate
# proves, and a pytest pins a third pure-Python automaton against both.
#
# The corpus' pure-alpha vocabulary has no natural soundex collisions,
# so the operator synthesizes one VARIANT per base term by vowel
# rotation (a→e→i→o→u→a, parallel translate) — soundex-INVARIANT by
# construction (every vowel maps to '0'), so variants MUST collapse into
# their base term's bucket through the real encoder, and buckets with
# n_forms > n_base prove the collapse (the corpus-synthesis
# non-degeneracy doctrine: a bucket table over collision-free input
# would prove nothing).
#
# Scale shape: vocabulary-sized — one distinct-terms agg, a map-only
# encode, one code groupBy; df join rides the same distinct spine.

PHON_TOP = 20


def ft_phonetic_buckets(spark, sf_dir):
    """(rank, code, n_forms, n_base, df_base): top-20 soundex buckets over
    the pure-alpha vocabulary ∪ vowel-rotated variants — n_forms counts
    all collapsed surface forms, n_base the real corpus terms, df_base
    their summed document frequency."""
    toks = doc_tokens(spark, sf_dir)
    base = (
        toks.filter(F.col("term").rlike("^[a-z]+$"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
    )
    forms = base.select(
        "term", F.lit(1).alias("is_base"), "df"
    ).unionByName(
        base.filter(F.length("term") >= 3).select(
            F.translate("term", "aeiou", "eioua").alias("term"),
            F.lit(0).alias("is_base"),
            F.lit(0).cast("long").alias("df"),
        )
    ).groupBy("term").agg(
        F.max("is_base").alias("is_base"), F.max("df").cast("long").alias("df")
    )
    buckets = (
        forms.withColumn("code", F.soundex("term"))
        .groupBy("code")
        .agg(
            F.count("*").cast("long").alias("n_forms"),
            F.sum("is_base").cast("long").alias("n_base"),
            F.sum(F.col("df") * F.col("is_base")).cast("long").alias("df_base"),
        )
    )
    top = buckets.orderBy(
        F.col("n_forms").desc(), F.col("code").asc()
    ).limit(PHON_TOP)
    w = W.orderBy(F.col("n_forms").desc(), F.col("code").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "code", "n_forms", "n_base", "df_base"
    )


SQL_PHONETIC_BUCKETS = f"""
WITH toks AS ({SQL_DOC_TOKS}),
base AS MATERIALIZED (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks WHERE regexp_matches(term, '^[a-z]+$') GROUP BY 1
),
forms AS MATERIALIZED (
  SELECT term, CAST(max(is_base) AS BIGINT) AS is_base,
         CAST(max(df) AS BIGINT) AS df
  FROM (
    SELECT term, 1 AS is_base, df FROM base
    UNION ALL
    SELECT list_aggregate(list_transform(string_split(term, ''), c ->
             CASE WHEN c = 'a' THEN 'e' WHEN c = 'e' THEN 'i'
                  WHEN c = 'i' THEN 'o' WHEN c = 'o' THEN 'u'
                  WHEN c = 'u' THEN 'a' ELSE c END), 'string_agg', '')
             AS term,
           0 AS is_base, CAST(0 AS BIGINT) AS df
    FROM base WHERE length(term) >= 3
  ) GROUP BY term
),
coded AS (
  SELECT term, is_base, df,
         upper(substr(term, 1, 1)) ||
         substr(
           coalesce(list_aggregate(
             list_filter(
               dedup[CASE WHEN first_hw THEN 1 ELSE 2 END:],
               c -> c <> '0'),
             'string_agg', ''), '')
           || '000', 1, 3) AS code
  FROM (
    SELECT term, is_base, df, first_hw,
           list_filter(kept, (c, i) -> i = 1 OR kept[i - 1] <> c) AS dedup
    FROM (
      SELECT term, is_base, df,
             codes0[1] = '-' AS first_hw,
             list_filter(codes0, c -> c <> '-') AS kept
      FROM (
        SELECT term, is_base, df,
          list_transform(string_split(term, ''), c ->
            CASE
              WHEN c IN ('b','f','p','v') THEN '1'
              WHEN c IN ('c','g','j','k','q','s','x','z') THEN '2'
              WHEN c IN ('d','t') THEN '3'
              WHEN c = 'l' THEN '4'
              WHEN c IN ('m','n') THEN '5'
              WHEN c = 'r' THEN '6'
              WHEN c IN ('h','w') THEN '-'
              ELSE '0'
            END) AS codes0
        FROM forms
      )
    )
  )
),
buckets AS (
  SELECT code, CAST(count(*) AS BIGINT) AS n_forms,
         CAST(sum(is_base) AS BIGINT) AS n_base,
         CAST(sum(df * is_base) AS BIGINT) AS df_base
  FROM coded GROUP BY code
)
SELECT CAST(row_number() OVER (
         ORDER BY n_forms DESC, code ASC) AS INT) AS rank,
       code, n_forms, n_base, df_base
FROM buckets
ORDER BY n_forms DESC, code ASC LIMIT {PHON_TOP}
"""

QUERIES["ft_phonetic_buckets"] = (ft_phonetic_buckets, SQL_PHONETIC_BUCKETS)
