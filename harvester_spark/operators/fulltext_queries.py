"""Fulltext operators over the ``documents`` table — the engine's query
surface re-expressed as verifiable (Spark, DuckDB-oracle) pairs.

Covers SURVEY.md §2 operators A6/A7 (term/doc frequency, postings), the BM25
ranking contract (W3), autocomplete prefix top-N (T4), facet-style counts
(A1), and the text-analysis chain (quality scoring, language heuristic,
fingerprinting) a large-scale training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.analysis import tokens_column
from harvester_spark.operators.common import SQL_DOC_TOKS, SQL_TOKS, doc_tokens, load

BM25_TERMS = ["key", "value", "table"]  # AND-semantics flagship query

# ---------------------------------------------------------------- term stats


def ft_term_doc_freq(spark, sf_dir):
    """term → df (docs containing it), cf (total occurrences). SPIMI stats."""
    return (
        doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf"))
    )


SQL_TERM_DOC_FREQ = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM toks GROUP BY term
"""


def ft_postings(spark, sf_dir):
    """Uncompressed postings rows (term, doc_id, tf) for the flagship terms."""
    return (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


SQL_POSTINGS = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT term, doc_id, count(*) AS tf FROM toks
WHERE term IN ('key', 'value', 'table')
GROUP BY term, doc_id
"""


def ft_doc_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", F.size(tokens_column(F.col("text"))).alias("doc_len")
    )


SQL_DOC_STATS = f"""
SELECT doc_id, lang, len({SQL_TOKS.format(col='text')}) AS doc_len FROM documents
"""


def ft_corpus_stats(spark, sf_dir):
    """Per-language N and avgdl (BM25 norm inputs); avg = exact-int division."""
    return (
        ft_doc_stats(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("doc_len") / F.count("*")).alias("avgdl"),
        )
    )


SQL_CORPUS_STATS = f"""
WITH ds AS ({SQL_DOC_STATS})
SELECT lang, count(*) AS n_docs,
       sum(doc_len) * 1.0 / count(*) AS avgdl
FROM ds GROUP BY lang
"""

# ---------------------------------------------------------------- BM25 top-k


def _ranked_top10(scored):
    """Distributed top-10: ``orderBy().limit()`` compiles to
    TakeOrderedAndProject (per-partition partial top-k, driver merge of 10-row
    heads) instead of a single-partition global window; ranking the 10
    survivors with ``row_number`` is then O(k)."""
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


def ft_bm25_topk(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75, Lucene idf) AND-match top-10 as a pure
    DataFrame job — the distributed scoring shape of SURVEY.md §3.2.

    Scores are ``round(.,6)`` because SQL SUM order is engine-dependent (ulp
    noise only); ranking ties break on doc_id asc.
    """
    toks = doc_tokens(spark, sf_dir)
    docs_n = load(spark, sf_dir, "documents")
    n_terms = len(BM25_TERMS)

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
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("nt"), F.round(F.sum("contrib"), 6).alias("score"))
        .filter(F.col("nt") == n_terms)  # AND semantics
        .select("doc_id", "score")
    )
    return _ranked_top10(scored)


def bm25_or_scored(spark, sf_dir):
    """(doc_id, score) over whichever flagship terms a doc contains — the
    disjunctive kernel shared by ft_bm25_or_topk and the hybrid-RRF fusion
    (text_analytics.hybrid_rrf_topk). ONE BM25 formula repo-wide."""
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
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return scored


def ft_bm25_or_topk(spark, sf_dir):
    """Disjunctive (OR) BM25 top-10 — the relational twin of the engine's
    block-max WAND serving path: same kernel, docs scored over whichever
    query terms they contain."""
    return _ranked_top10(bm25_or_scored(spark, sf_dir))


def ft_gopher_repetition(spark, sf_dir):
    """Gopher/MassiveText-style repetition signal: duplicate-3-gram ratio
    per document (``1 - distinct/total``), a standard training-data quality
    filter. 3-grams come from one array ``transform`` over the tokens
    column — no per-doc window shuffle; the only exchange is the final
    groupBy(doc_id), which the tokenize explode already co-partitions."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_column(F.col("text")).alias("toks"))
    grams = t.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(toks) >= 3 THEN transform(sequence(0, size(toks)-3),"
            " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
            " ELSE cast(array() AS array<string>) END"
        ).alias("grams"),
    )
    ex = grams.select("doc_id", F.explode_outer("grams").alias("g"))
    return (
        ex.groupBy("doc_id")
        .agg(F.count("g").alias("n_grams"), F.countDistinct("g").alias("n_distinct"))
        .withColumn(
            "rep_ratio",
            F.when(
                F.col("n_grams") > 0,
                F.round(1.0 - F.col("n_distinct") * 1.0 / F.col("n_grams"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .select("doc_id", "n_grams", "n_distinct", "rep_ratio")
    )


SQL_GOPHER_REPETITION = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS.format(col='text')} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 FOR i IN range(0, greatest(len(toks) - 2, 0))]) AS g
  FROM t
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
  FROM g GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_grams, CAST(0 AS BIGINT)) AS n_grams,
       coalesce(a.n_distinct, CAST(0 AS BIGINT)) AS n_distinct,
       CASE WHEN coalesce(a.n_grams, 0) > 0
            THEN round(1.0 - a.n_distinct * 1.0 / a.n_grams, 6)
            ELSE 0.0 END AS rep_ratio
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


SQL_BM25_OR_TOPK = f"""
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
scored AS (
  SELECT tf.doc_id,
         round(sum(
           ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM scored
ORDER BY rank LIMIT 10
"""


SQL_BM25_TOPK = f"""
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
scored AS (
  SELECT tf.doc_id,
         count(*) AS nt,
         round(sum(
           ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM scored WHERE nt = 3
ORDER BY rank LIMIT 10
"""


def ft_and_match_count(spark, sf_dir):
    """#docs matching ALL terms of each query (simple_query_string AND —
    /root/reference/harvester/core/models/search/query.py:81-86)."""
    queries = spark.createDataFrame(
        [("q1", "key value"), ("q2", "table row scan"), ("q3", "key zzznohit")],
        "query_id string, query_text string",
    ).select("query_id", F.explode(tokens_column(F.col("query_text"))).alias("term"))
    n_terms = queries.groupBy("query_id").agg(F.count("*").alias("n_terms"))
    toks = doc_tokens(spark, sf_dir).select("doc_id", "term").distinct()
    matched = (
        queries.join(toks, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("nt"))
        .join(n_terms, "query_id")
        .filter(F.col("nt") == F.col("n_terms"))
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        n_terms.join(matched, "query_id", "left")
        .select("query_id", F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
    )


SQL_AND_MATCH_COUNT = f"""
WITH queries(query_id, query_text) AS (
  VALUES ('q1', 'key value'), ('q2', 'table row scan'), ('q3', 'key zzznohit')
),
qterms AS (
  SELECT query_id, unnest({SQL_TOKS.format(col='query_text')}) AS term FROM queries
),
nt AS (SELECT query_id, count(*) AS n_terms FROM qterms GROUP BY query_id),
toks AS (SELECT DISTINCT doc_id, term FROM ({SQL_DOC_TOKS})),
matched AS (
  SELECT q.query_id, t.doc_id, count(*) AS nq
  FROM qterms q JOIN toks t USING (term) GROUP BY q.query_id, t.doc_id
),
hits AS (
  SELECT m.query_id, count(*) AS n_hits
  FROM matched m JOIN nt USING (query_id) WHERE m.nq = nt.n_terms
  GROUP BY m.query_id
)
SELECT nt.query_id, coalesce(h.n_hits, 0) AS n_hits
FROM nt LEFT JOIN hits h USING (query_id)
"""

# ----------------------------------------------------- rankings / dictionary


def ft_top_terms_per_lang(spark, sf_dir):
    """Top-5 terms per language by collection frequency (facet-style A1+T3)."""
    cf = doc_tokens(spark, sf_dir).groupBy("lang", "term").agg(F.count("*").alias("cf"))
    w = W.partitionBy("lang").orderBy(F.col("cf").desc(), F.col("term").asc())
    return (
        cf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "rnk", "term", "cf")
    )


SQL_TOP_TERMS_PER_LANG = f"""
WITH toks AS ({SQL_DOC_TOKS}),
cf AS (SELECT lang, term, count(*) AS cf FROM toks GROUP BY lang, term)
SELECT lang, CAST(row_number() OVER (PARTITION BY lang ORDER BY cf DESC, term ASC) AS INT) AS rnk,
       term, cf
FROM cf QUALIFY rnk <= 5
"""


def ft_autocomplete_prefix(spark, sf_dir):
    """Prefix-range top-10 of the term dictionary by df — the completion
    suggester analogue (/root/reference/harvester/search/views/autocomplete.py:25-33)."""
    dfs = (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term").startswith("s"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    # distributed top-k: orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps, driver merge); the rank window then covers 10 rows, never a
    # global single-partition sort over the whole prefix range
    top = dfs.orderBy(F.col("df").desc(), F.col("term").asc()).limit(10)
    w = W.orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("rnk", "term", "df")
    )


SQL_AUTOCOMPLETE_PREFIX = f"""
WITH toks AS ({SQL_DOC_TOKS}),
d AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term LIKE 's%' GROUP BY term
)
SELECT CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS INT) AS rnk, term, df
FROM d ORDER BY rnk LIMIT 10
"""

# ------------------------------------------------------------- text analysis


def ft_quality_score(spark, sf_dir):
    """Per-doc quality features: token count, type/token ratio, mean token
    length — all exact-integer divisions (identical doubles both engines)."""
    toks = doc_tokens(spark, sf_dir)
    return toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.countDistinct("term") * 1.0 / F.count("*")).alias("type_token_ratio"),
        (F.sum(F.length("term")) * 1.0 / F.count("*")).alias("mean_token_len"),
    )


SQL_QUALITY_SCORE = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT doc_id, count(*) AS n_tokens,
       count(DISTINCT term) * 1.0 / count(*) AS type_token_ratio,
       sum(len(term)) * 1.0 / count(*) AS mean_token_len
FROM toks GROUP BY doc_id
"""

_EN_MARKERS = ("the", "and", "of", "a", "to")
_NL_MARKERS = ("de", "het", "een", "en", "van")


def ft_lang_heuristic(spark, sf_dir):
    """Marker-stopword language ID (n-gram-heuristic family): count EN vs NL
    marker hits per doc, predict the larger (ties/zero → 'unk')."""
    toks = doc_tokens(spark, sf_dir)
    agg = toks.groupBy("doc_id").agg(
        F.sum(F.when(F.col("term").isin(*_EN_MARKERS), 1).otherwise(0)).alias("en_hits"),
        F.sum(F.when(F.col("term").isin(*_NL_MARKERS), 1).otherwise(0)).alias("nl_hits"),
    )
    pred = (
        F.when(F.col("en_hits") > F.col("nl_hits"), F.lit("en"))
        .when(F.col("nl_hits") > F.col("en_hits"), F.lit("nl"))
        .otherwise(F.lit("unk"))
    )
    return agg.select("doc_id", "en_hits", "nl_hits", pred.alias("pred_lang"))


_sql_in = lambda xs: ", ".join(f"'{x}'" for x in xs)  # noqa: E731
SQL_LANG_HEURISTIC = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT doc_id,
       CAST(sum(CASE WHEN term IN ({_sql_in(_EN_MARKERS)}) THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
       CAST(sum(CASE WHEN term IN ({_sql_in(_NL_MARKERS)}) THEN 1 ELSE 0 END) AS BIGINT) AS nl_hits,
       CASE WHEN sum(CASE WHEN term IN ({_sql_in(_EN_MARKERS)}) THEN 1 ELSE 0 END)
               > sum(CASE WHEN term IN ({_sql_in(_NL_MARKERS)}) THEN 1 ELSE 0 END) THEN 'en'
            WHEN sum(CASE WHEN term IN ({_sql_in(_NL_MARKERS)}) THEN 1 ELSE 0 END)
               > sum(CASE WHEN term IN ({_sql_in(_EN_MARKERS)}) THEN 1 ELSE 0 END) THEN 'nl'
            ELSE 'unk' END AS pred_lang
FROM toks GROUP BY doc_id
"""


def ft_fingerprint(spark, sf_dir):
    """Normalized-text fingerprint: md5 over the canonical token join —
    the content-hash change-detection analogue
    (/root/reference/harvester/core/models/datatypes/document.py:133-138)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", tokens_column(F.col("text")))).alias("fingerprint"),
    )


SQL_FINGERPRINT = f"""
SELECT doc_id,
       md5(array_to_string({SQL_TOKS.format(col='text')}, ' ')) AS fingerprint
FROM documents
"""


# Phrase matching (quoted simple_query_string groups — the reference's
# OpenSearch phrase semantics, core/models/search/query.py:81-86): docs
# containing the words CONSECUTIVELY, with occurrence counts. Relational
# form of the engine's positional-postings path (search/phrase.py): a
# position-offset self-equi-join on (doc_id, pos+1) — shuffle key is doc_id,
# no cartesian anywhere.

PHRASE_W0, PHRASE_W1 = "table", "hash"


def ft_phrase_match(spark, sf_dir):
    toks = doc_tokens(spark, sf_dir)
    a = toks.filter(F.col("term") == PHRASE_W0).select("doc_id", "pos")
    b = toks.filter(F.col("term") == PHRASE_W1).select(
        F.col("doc_id").alias("doc_id_b"), F.col("pos").alias("pos_b")
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_id_b"))
            & (F.col("pos_b") == F.col("pos") + 1),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_occurrences"))
    )


SQL_PHRASE_MATCH = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT a.doc_id, count(*) AS n_occurrences
FROM toks a
JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
WHERE a.term = '{PHRASE_W0}' AND b.term = '{PHRASE_W1}'
GROUP BY a.doc_id
"""


# Sloppy-phrase proximity ("a b c"~N simple_query_string syntax,
# search/phrase.py::_sloppy_match_ids): ordered window — positions
# pa < pb < pc with pc - pa ≤ (m-1) + slop. Relational form: doc_id
# equi-joins (shuffle key = doc_id, never a cartesian) with the window
# predicate as a pushed range condition; counts EVERY qualifying ordered
# triple, so both engines agree without tie-break rules.

SLOP_W = ("key", "value", "table")
PHRASE_SLOP = 4


def ft_phrase_slop(spark, sf_dir):
    toks = doc_tokens(spark, sf_dir)
    win = len(SLOP_W) - 1 + PHRASE_SLOP
    a = toks.filter(F.col("term") == SLOP_W[0]).select("doc_id", F.col("pos").alias("pa"))
    b = toks.filter(F.col("term") == SLOP_W[1]).select(
        F.col("doc_id").alias("db"), F.col("pos").alias("pb")
    )
    c = toks.filter(F.col("term") == SLOP_W[2]).select(
        F.col("doc_id").alias("dc"), F.col("pos").alias("pc")
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("db"))
            & (F.col("pb") > F.col("pa"))
            & (F.col("pb") <= F.col("pa") + win),
        )
        .join(
            c,
            (F.col("doc_id") == F.col("dc"))
            & (F.col("pc") > F.col("pb"))
            & (F.col("pc") <= F.col("pa") + win),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_windows"))
    )


SQL_PHRASE_SLOP = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_windows
FROM toks a
JOIN toks b ON b.doc_id = a.doc_id
           AND b.pos > a.pos AND b.pos <= a.pos + {len(SLOP_W) - 1 + PHRASE_SLOP}
JOIN toks c ON c.doc_id = a.doc_id
           AND c.pos > b.pos AND c.pos <= a.pos + {len(SLOP_W) - 1 + PHRASE_SLOP}
WHERE a.term = '{SLOP_W[0]}' AND b.term = '{SLOP_W[1]}' AND c.term = '{SLOP_W[2]}'
GROUP BY a.doc_id
"""


# Fuzzy term query (term~N, search/sqs.py::Fuzzy): expand the DICTIONARY
# within Levenshtein ≤ N (both engines' levenshtein is classic full edit
# distance over these ASCII terms), then score AND(fuzzy leaf, plain term)
# with the constant-score-expansion convention: the fuzzy leaf contributes
# 1.0 per matching doc, the plain term its BM25. Scale shape: the
# expansion set is a tiny distinct-terms frame → BROADCAST semi-join onto
# the token stream; a cluster dictionary would prune with a length band /
# Levenshtein automaton before the distance check (sqs.py::expand_fuzzy).

FUZZY_Q, FUZZY_MAXD, FUZZY_AND_TERM = "valu", 1, "table"


def ft_sqs_fuzzy(spark, sf_dir):
    toks = doc_tokens(spark, sf_dir)
    docs_n = load(spark, sf_dir, "documents")
    exp = (
        toks.select("term")
        .distinct()
        .filter(F.levenshtein(F.col("term"), F.lit(FUZZY_Q)) <= FUZZY_MAXD)
    )
    fuzzy_docs = toks.join(F.broadcast(exp), "term").select("doc_id").distinct()
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = docs_n.select(F.count("*").alias("n")).crossJoin(
        dl.select((F.sum("dl") / F.count("*")).alias("avgdl"))
    )
    tf = (
        toks.filter(F.col("term") == FUZZY_AND_TERM)
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.agg(F.count("*").alias("df"))
    scored = (
        tf.join(fuzzy_docs, "doc_id", "semi")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(df_))
        .withColumn(
            "score",
            F.round(
                1.0
                + F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ),
        )
    )
    # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps + driver merge of 10); the rank window then runs
    # over 10 rows, never a global single-partition sort
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


SQL_SQS_FUZZY = f"""
WITH toks AS ({SQL_DOC_TOKS}),
exp AS (
  SELECT DISTINCT term FROM toks WHERE levenshtein(term, '{FUZZY_Q}') <= {FUZZY_MAXD}
),
fuzzy_docs AS (SELECT DISTINCT doc_id FROM toks JOIN exp USING (term)),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0 / count(*) FROM dl) AS avgdl
),
tf AS (
  SELECT doc_id, count(*) AS tf FROM toks
  WHERE term = '{FUZZY_AND_TERM}' GROUP BY doc_id
),
df AS (SELECT count(*) AS df FROM tf),
scored AS (
  SELECT tf.doc_id,
         round(1.0
           + ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6) AS score
  FROM tf
  JOIN fuzzy_docs USING (doc_id)
  JOIN dl USING (doc_id)
  CROSS JOIN stats CROSS JOIN df
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM scored
ORDER BY rank LIMIT 10
"""


# Per-source quality rollup (RefinedWeb-style domain filtering): web-scale
# pipelines drop or down-weight whole domains by aggregate signals — doc
# count, exact-dup rate (distinct normalized-text digests vs docs), token
# volume, and the share of length outliers (Gopher length rule). One
# groupBy on source (map-side partial agg), md5 digest is the dedup_exact
# convention so both engines agree bit-for-bit.

LEN_LO, LEN_HI = 25, 1000


def ft_source_quality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    dl = F.size(tokens_column(F.col("text")))
    digest = F.md5(F.concat_ws(" ", tokens_column(F.col("text"))))
    per = docs.select("source", dl.alias("doc_len"), digest.alias("digest"))
    return per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("digest").cast("long").alias("n_unique"),
        F.sum("doc_len").cast("long").alias("sum_tokens"),
        F.sum(
            F.when((F.col("doc_len") < LEN_LO) | (F.col("doc_len") > LEN_HI), 1)
            .otherwise(0)
        ).cast("long").alias("n_len_outliers"),
    )


SQL_SOURCE_QUALITY = f"""
WITH per AS (
  SELECT source,
         len({SQL_TOKS.format(col='text')}) AS doc_len,
         md5(array_to_string({SQL_TOKS.format(col='text')}, ' ')) AS digest
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT digest) AS BIGINT) AS n_unique,
       CAST(sum(doc_len) AS BIGINT) AS sum_tokens,
       CAST(sum(CASE WHEN doc_len < {LEN_LO} OR doc_len > {LEN_HI}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_len_outliers
FROM per GROUP BY source
"""


# Unigram-LM quality proxy (CCNet-style, Wenzek et al.): per-doc average
# negative log-likelihood under a BOUNDED corpus unigram model — the top
# VOCAB_K terms by collection frequency (cf desc, term asc tie-break, so
# the model is deterministic); out-of-vocabulary tokens get the floor
# p = 1/total. This is the perplexity-bucketing signal web pipelines use
# to keep/drop/down-weight documents (low avg_nll ≈ head-term soup, high ≈
# rare-term noise). Plan: the model is top-K by construction → always
# BROADCASTable regardless of corpus vocabulary size (a full web vocab is
# multi-GB; a fixed-K LM vocab mirrors CCNet's fixed SentencePiece vocab).
# No shuffle ever touches the skewed term key; the only wide exchange is
# the doc_id groupBy. round(.,6) because float SUM order is
# engine-dependent.

# 20 < the sf0.01 vocabulary (31 terms), so the OOV floor path is exercised
# by the oracle gate; at web scale this would be a 10^5-ish configured vocab.
VOCAB_K = 20


def ft_unigram_logprob(spark, sf_dir):
    toks = doc_tokens(spark, sf_dir)
    tf = toks.groupBy("term").agg(F.count("*").alias("cf"))
    top = tf.orderBy(F.col("cf").desc(), F.col("term").asc()).limit(VOCAB_K)
    tot = toks.agg(F.count("*").alias("total"))
    model = F.broadcast(top.crossJoin(tot))
    dt = toks.groupBy("doc_id", "term").agg(F.count("*").alias("dtf"))
    ln_p = F.log(F.coalesce(F.col("cf"), F.lit(1)) * 1.0 / F.col("total"))
    return (
        dt.join(model.drop("total"), "term", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("dtf").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("cf").isNull(), F.col("dtf")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.round(-F.sum(F.col("dtf") * ln_p) / F.sum("dtf"), 6).alias("avg_nll"),
        )
    )


SQL_UNIGRAM_LOGPROB = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
top AS (SELECT term, cf FROM tf ORDER BY cf DESC, term ASC LIMIT {VOCAB_K}),
tot AS (SELECT count(*) AS total FROM toks),
dt AS (SELECT doc_id, term, count(*) AS dtf FROM toks GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(dtf) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN cf IS NULL THEN dtf ELSE 0 END) AS BIGINT) AS n_oov,
       round(-sum(dtf * ln(coalesce(cf, 1) * 1.0 / total)) / sum(dtf), 6)
           AS avg_nll
FROM dt LEFT JOIN top USING (term) CROSS JOIN tot
GROUP BY doc_id
"""


# simple_query_string grammar as a RELATIONAL plan — the distributed twin of
# search/sqs.py (the reference's query language: simple_query_string with
# ALL default flags, core/models/search/query.py:73-98). The fixed query is
#   spark -join (c* | "table hash")
# i.e. MUST 'spark', MUST_NOT 'join', and (prefix-expansion OR exact
# adjacency). Every leg is a doc_id semi/anti join — shuffle key doc_id
# throughout, prefix pushdown via LIKE/startswith, no cartesian.

SQS_POS, SQS_NEG, SQS_PREFIX = "spark", "join", "c"


def ft_sqs_match(spark, sf_dir):
    toks = doc_tokens(spark, sf_dir)
    has_pos = toks.filter(F.col("term") == SQS_POS).select("doc_id").distinct()
    has_neg = toks.filter(F.col("term") == SQS_NEG).select("doc_id").distinct()
    has_pre = (
        toks.filter(F.col("term").startswith(SQS_PREFIX)).select("doc_id").distinct()
    )
    a = toks.filter(F.col("term") == PHRASE_W0).select("doc_id", "pos")
    b = toks.filter(F.col("term") == PHRASE_W1).select(
        F.col("doc_id").alias("doc_id_b"), F.col("pos").alias("pos_b")
    )
    has_ph = (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_id_b"))
            & (F.col("pos_b") == F.col("pos") + 1),
        )
        .select("doc_id")
        .distinct()
    )
    either = has_pre.unionByName(has_ph).distinct()
    return (
        has_pos.join(either, "doc_id", "semi").join(has_neg, "doc_id", "anti")
    )


SQL_SQS_MATCH = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT d.doc_id
FROM documents d
WHERE EXISTS (SELECT 1 FROM toks t WHERE t.doc_id = d.doc_id AND t.term = '{SQS_POS}')
  AND NOT EXISTS (SELECT 1 FROM toks t WHERE t.doc_id = d.doc_id AND t.term = '{SQS_NEG}')
  AND (EXISTS (SELECT 1 FROM toks t WHERE t.doc_id = d.doc_id AND t.term LIKE '{SQS_PREFIX}%')
       OR EXISTS (SELECT 1 FROM toks a JOIN toks b
                  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                  WHERE a.doc_id = d.doc_id
                    AND a.term = '{PHRASE_W0}' AND b.term = '{PHRASE_W1}'))
"""


# Autocomplete candidate field with the REFERENCE's suggest_completion
# semantics (products/models/datatypes/product.py:169-180): first 1000
# SPACE-split words (not the analyzer chain), accent-folded, stripped to
# letters, lowercased (the completion suggester's 'simple' analyzer),
# deduped per doc → (term, doc_freq). The corpus is ASCII so the
# accent-fold is identity in both engines; the regexp strip is the real one.


def ft_suggest_completion(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    words = F.slice(F.split(F.col("text"), " "), 1, 1000)
    cleaned = F.filter(
        F.transform(
            words, lambda w: F.lower(F.regexp_replace(w, "[^a-zA-Z]+", ""))
        ),
        lambda w: w != "",
    )
    per_doc = docs.select(
        "doc_id", F.explode(F.array_distinct(cleaned)).alias("term")
    )
    return per_doc.groupBy("term").agg(F.count("*").alias("doc_freq"))


SQL_SUGGEST_COMPLETION = """
SELECT term, count(*) AS doc_freq FROM (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(list_filter(
             list_transform(string_split(text, ' ')[1:1000],
                            w -> lower(regexp_replace(w, '[^a-zA-Z]+', '', 'g'))),
             w -> w <> '')) AS term
    FROM documents
  )
) GROUP BY term
"""


QUERIES = {
    "ft_term_doc_freq": (ft_term_doc_freq, SQL_TERM_DOC_FREQ),
    "ft_phrase_match": (ft_phrase_match, SQL_PHRASE_MATCH),
    "ft_phrase_slop": (ft_phrase_slop, SQL_PHRASE_SLOP),
    "ft_sqs_match": (ft_sqs_match, SQL_SQS_MATCH),
    "ft_sqs_fuzzy": (ft_sqs_fuzzy, SQL_SQS_FUZZY),
    "ft_source_quality": (ft_source_quality, SQL_SOURCE_QUALITY),
    "ft_unigram_logprob": (ft_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "ft_suggest_completion": (ft_suggest_completion, SQL_SUGGEST_COMPLETION),
    "ft_postings": (ft_postings, SQL_POSTINGS),
    "ft_doc_stats": (ft_doc_stats, SQL_DOC_STATS),
    "ft_corpus_stats": (ft_corpus_stats, SQL_CORPUS_STATS),
    "ft_bm25_topk": (ft_bm25_topk, SQL_BM25_TOPK),
    "ft_bm25_or_topk": (ft_bm25_or_topk, SQL_BM25_OR_TOPK),
    "ft_gopher_repetition": (ft_gopher_repetition, SQL_GOPHER_REPETITION),
    "ft_and_match_count": (ft_and_match_count, SQL_AND_MATCH_COUNT),
    "ft_top_terms_per_lang": (ft_top_terms_per_lang, SQL_TOP_TERMS_PER_LANG),
    "ft_autocomplete_prefix": (ft_autocomplete_prefix, SQL_AUTOCOMPLETE_PREFIX),
    "ft_quality_score": (ft_quality_score, SQL_QUALITY_SCORE),
    "ft_lang_heuristic": (ft_lang_heuristic, SQL_LANG_HEURISTIC),
    "ft_fingerprint": (ft_fingerprint, SQL_FINGERPRINT),
}


# §2.11 author_suggestions: docs MENTIONING a name in their text while
# LACKING it in the structured authors field — match minus term-filter
# (/root/reference/harvester/search/views/similarity.py:84-110). The
# synthetic authors field is the doc's first token (deterministic in both
# engines), the probe name is a frequent corpus term.

_AUTHOR_NAME = "customer"


def author_suggestions(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = tokens_column(F.col("text"))
    authors = F.array(F.element_at(toks, 1))
    return (
        docs.select(
            "doc_id",
            authors.alias("authors"),
            F.array_contains(toks, _AUTHOR_NAME).alias("mentions"),
        )
        .filter(F.col("mentions") & ~F.array_contains(F.col("authors"), _AUTHOR_NAME))
        .select("doc_id", F.element_at("authors", 1).alias("author0"))
    )


SQL_AUTHOR_SUGGESTIONS = f"""
WITH d AS (
  SELECT doc_id,
         {SQL_TOKS.format(col='text')} AS toks
  FROM documents
)
SELECT doc_id, toks[1] AS author0
FROM d
WHERE list_contains(toks, '{_AUTHOR_NAME}') AND toks[1] <> '{_AUTHOR_NAME}'
"""

QUERIES["author_suggestions"] = (author_suggestions, SQL_AUTHOR_SUGGESTIONS)


# BPE-ish subword token counting (driver brief: "token counting (whitespace
# + a BPE-ish regex)"): a GPT-2-style pretokenizer restricted to ASCII
# classes so Java regex and RE2 agree byte-for-byte (verified).

_BPE_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def ft_bpe_token_count(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    pieces = F.expr(f"regexp_extract_all(lower(text), '{_BPE_RE}', 0)")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.select(
        "doc_id",
        F.size(pieces).alias("n_bpe_tokens"),
        ws.alias("n_ws_tokens"),
    )


SQL_BPE_TOKEN_COUNT = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS n_bpe_tokens,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens
FROM documents
"""

QUERIES["ft_bpe_token_count"] = (ft_bpe_token_count, SQL_BPE_TOKEN_COUNT)


# Adjacent-pair (bigram) statistics: the data-driven SOURCE for the
# common-grams build list (index/build.py ``common_gram_terms`` — the
# Lucene/ES common-grams model indexes a bigram token for adjacent listed
# head-term pairs, collapsing head∧head phrase constraints to one posting
# lookup; BENCH.md worst-case table). The reference gets its phrase
# acceleration implicitly from Lucene; here the pair list is chosen from
# measured adjacency counts. Top pairs by occurrence count with the
# pair's document frequency — integer-only, unique (n desc, term1, term2)
# tie-break. Scale: the lead window shuffles on doc_id (uniform), the pair
# groupBy is map-side partially aggregated (head-pair skew never reaches a
# single reducer unreduced), and the top-N is TakeOrderedAndProject
# (per-partition heaps + driver merge — no global sort).

TOP_BIGRAMS_N = 50


def ft_top_bigrams(spark, sf_dir):
    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    # pair and its null-guard in one projection (same caveat as the shingle
    # operator: a filter must not be pushed below the window's lead)
    pairs = toks.select(
        "doc_id",
        F.col("term").alias("term1"),
        F.lead("term", 1).over(w).alias("term2"),
    ).filter(F.col("term2").isNotNull())
    return (
        pairs.groupBy("term1", "term2")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "term1", "term2")
        .limit(TOP_BIGRAMS_N)
    )


SQL_TOP_BIGRAMS = f"""
WITH toks AS ({SQL_DOC_TOKS}),
big AS (
  SELECT a.term AS term1, b.term AS term2, a.doc_id
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
)
SELECT term1, term2,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM big GROUP BY term1, term2
ORDER BY n_occurrences DESC, term1, term2
LIMIT {TOP_BIGRAMS_N}
"""

QUERIES["ft_top_bigrams"] = (ft_top_bigrams, SQL_TOP_BIGRAMS)


# §2.11 did_you_mean WITH COLLATION (round-3): the reference returns the
# OpenSearch phrase suggester's {original, suggestion} payload
# (/root/reference/harvester/search/tests/views/document.py:56-60); the
# phrase suggester COLLATES — a corrected phrase must actually have matches.
# Shared semantics (engine SearchAPI.did_you_mean + this oracle pair):
# per absent token, candidates are dictionary terms with the same first
# char, length within ±2, Levenshtein ≤ 2, ranked by (distance asc, df
# desc, term asc); the suggestion is the FIRST of the top-10 candidates
# that co-occurs in at least one document with ALL present tokens of the
# query (the ES num_candidates-bounded collate). Queries with no present
# tokens collate trivially (the candidate's own document is the evidence).

DYM_QUERIES = [
    ("q1", "key tabel"),        # one typo beside a present term → collated fix
    ("q2", "valu"),             # single absent token → trivial collation
    ("q3", "scna merge sort"),  # typo with two present anchor terms
    ("q4", "key value"),        # fully spelled → suggestion NULL
    ("q5", "qzx"),              # nothing within distance 2 → suggestion NULL
]
DYM_TOPN = 10


def ft_did_you_mean(spark, sf_dir):
    dt = doc_tokens(spark, sf_dir).select("doc_id", "term").distinct()
    dict_df = dt.groupBy("term").agg(F.count("*").alias("df"))
    q = spark.createDataFrame(
        [(qid, i, t) for qid, qs in DYM_QUERIES for i, t in enumerate(qs.split())],
        "query_id string, pos int, tok string",
    )
    qp = (
        q.join(dict_df.withColumnRenamed("term", "tok"), "tok", "left")
        .na.fill({"df": 0})
        .select("query_id", "pos", "tok", "df")
    )
    present = qp.filter(F.col("df") > 0).select("query_id", "tok")
    npres = present.groupBy("query_id").agg(F.count("*").alias("n"))
    # docs matching ALL present tokens of a query (the collation universe)
    qdocs = (
        present.join(dt, present.tok == dt.term)
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("nm"))
        .join(npres, "query_id")
        .filter(F.col("nm") == F.col("n"))
        .select("query_id", "doc_id")
    )
    absent = qp.filter(F.col("df") == 0).select("query_id", "pos", "tok")
    # candidate generation: first-char equi key + pushed length band, the
    # absent-token side is a handful of rows → broadcast
    cand = (
        dict_df.withColumn("c0", F.substring("term", 1, 1))
        .join(
            F.broadcast(absent.withColumn("c0", F.substring("tok", 1, 1))), "c0"
        )
        .filter(
            (F.abs(F.length("term") - F.length("tok")) <= 2)
            & (F.col("term") != F.col("tok"))
            & (F.levenshtein("term", "tok") <= 2)
        )
        .select(
            "query_id", "pos", "tok", F.col("term").alias("c"),
            F.levenshtein("term", "tok").alias("dist"), "df",
        )
    )
    wnd = W.partitionBy("query_id", "pos").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("c").asc()
    )
    cand_top = cand.withColumn("rk", F.row_number().over(wnd)).filter(
        F.col("rk") <= DYM_TOPN
    )
    # collation: candidate appears in a doc matching all present tokens
    collated = (
        cand_top.join(dt, cand_top.c == dt.term)
        .join(qdocs, ["query_id", "doc_id"], "semi")
        .select("query_id", "pos", "rk")
        .distinct()
    )
    needs = cand_top.join(npres.select("query_id"), "query_id", "semi")
    trivial = cand_top.join(npres.select("query_id"), "query_id", "anti")
    eligible = needs.join(collated, ["query_id", "pos", "rk"], "semi").unionByName(
        trivial
    )
    w2 = W.partitionBy("query_id", "pos").orderBy(F.col("rk").asc())
    best = (
        eligible.withColumn("rk2", F.row_number().over(w2))
        .filter(F.col("rk2") == 1)
        .select("query_id", "pos", "c")
    )
    fixed = (
        qp.join(best, ["query_id", "pos"], "left")
        .withColumn("ctok", F.coalesce(F.col("c"), F.col("tok")))
        .withColumn("chg", (F.col("ctok") != F.col("tok")).cast("int"))
    )
    agg = fixed.groupBy("query_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ctok"))),
                lambda s: s["ctok"],
            ),
            " ",
        ).alias("sugg"),
        F.max("chg").alias("changed"),
    )
    queries = spark.createDataFrame(DYM_QUERIES, "query_id string, query string")
    return queries.join(agg, "query_id").select(
        "query_id",
        "query",
        F.when(F.col("changed") == 1, F.col("sugg")).alias("suggestion"),
    )


_DYM_Q_VALUES = ", ".join(
    f"('{qid}', {i}, '{t}')"
    for qid, qs in DYM_QUERIES
    for i, t in enumerate(qs.split())
)
_DYM_QUERY_VALUES = ", ".join(f"('{qid}', '{qs}')" for qid, qs in DYM_QUERIES)

SQL_DID_YOU_MEAN = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY term),
q(query_id, pos, tok) AS (VALUES {_DYM_Q_VALUES}),
queries(query_id, query) AS (VALUES {_DYM_QUERY_VALUES}),
qp AS (
  SELECT q.query_id, q.pos, q.tok, coalesce(d.df, 0) AS df
  FROM q LEFT JOIN dict d ON d.term = q.tok
),
present AS (SELECT query_id, tok FROM qp WHERE df > 0),
npres AS (SELECT query_id, count(*) AS n FROM present GROUP BY query_id),
qdocs AS (
  SELECT x.query_id, x.doc_id FROM (
    SELECT p.query_id, t.doc_id, count(*) AS nm
    FROM present p JOIN dt t ON t.term = p.tok
    GROUP BY p.query_id, t.doc_id
  ) x JOIN npres USING (query_id) WHERE x.nm = npres.n
),
absent AS (SELECT query_id, pos, tok FROM qp WHERE df = 0),
cand AS (
  SELECT a.query_id, a.pos, a.tok, d.term AS c,
         levenshtein(d.term, a.tok) AS dist, d.df
  FROM absent a JOIN dict d
    ON substr(d.term, 1, 1) = substr(a.tok, 1, 1)
  WHERE abs(length(d.term) - length(a.tok)) <= 2
    AND d.term <> a.tok AND levenshtein(d.term, a.tok) <= 2
),
cand_top AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id, pos ORDER BY dist ASC, df DESC, c ASC) AS rk
  FROM cand QUALIFY rk <= {DYM_TOPN}
),
collated AS (
  SELECT DISTINCT ct.query_id, ct.pos, ct.rk
  FROM cand_top ct
  JOIN dt t ON t.term = ct.c
  JOIN qdocs qd ON qd.query_id = ct.query_id AND qd.doc_id = t.doc_id
),
eligible AS (
  SELECT ct.query_id, ct.pos, ct.c, ct.rk FROM cand_top ct
  LEFT JOIN npres np ON np.query_id = ct.query_id
  LEFT JOIN collated co
    ON co.query_id = ct.query_id AND co.pos = ct.pos AND co.rk = ct.rk
  WHERE np.query_id IS NULL OR co.rk IS NOT NULL
),
best AS (
  SELECT query_id, pos, c FROM eligible
  QUALIFY row_number() OVER (PARTITION BY query_id, pos ORDER BY rk) = 1
),
fixed AS (
  SELECT qp.query_id, qp.pos, qp.tok, coalesce(b.c, qp.tok) AS ctok
  FROM qp LEFT JOIN best b ON b.query_id = qp.query_id AND b.pos = qp.pos
),
agg AS (
  SELECT query_id,
         string_agg(ctok, ' ' ORDER BY pos) AS sugg,
         max(CASE WHEN ctok <> tok THEN 1 ELSE 0 END) AS changed
  FROM fixed GROUP BY query_id
)
SELECT qs.query_id, qs.query,
       CASE WHEN a.changed = 1 THEN a.sugg END AS suggestion
FROM queries qs JOIN agg a USING (query_id)
"""

QUERIES["ft_did_you_mean"] = (ft_did_you_mean, SQL_DID_YOU_MEAN)


# Out-of-order sloppy phrase (round-3: full Lucene slop semantics — engine
# twin: search/phrase.py chain_slop_keys). A doc matches "w0 w1 w2"~slop iff
# positions (pa, pb, pc) of the three (distinct) words exist with shifted
# span max(pa-0, pb-1, pc-2) - min(...) <= slop — equivalently ALL pairwise
# shifted differences <= slop, which is exactly the band-join predicate
# below (doc_id equi-join + integer range conditions, no cartesian).
# Transposed orders match when their displacement fits the budget.

UNORD_SLOP = 2


def ft_phrase_slop_unordered(spark, sf_dir):
    toks = doc_tokens(spark, sf_dir)
    a = toks.filter(F.col("term") == SLOP_W[0]).select(
        "doc_id", (F.col("pos") - 0).alias("sa")
    )
    b = toks.filter(F.col("term") == SLOP_W[1]).select(
        F.col("doc_id").alias("db"), (F.col("pos") - 1).alias("sb")
    )
    c = toks.filter(F.col("term") == SLOP_W[2]).select(
        F.col("doc_id").alias("dc"), (F.col("pos") - 2).alias("sc")
    )
    s = F.lit(UNORD_SLOP)
    joined = (
        a.join(
            b,
            (F.col("doc_id") == F.col("db"))
            & (F.abs(F.col("sb") - F.col("sa")) <= s),
        )
        .join(
            c,
            (F.col("doc_id") == F.col("dc"))
            & (F.abs(F.col("sc") - F.col("sa")) <= s)
            & (F.abs(F.col("sc") - F.col("sb")) <= s),
        )
        .withColumn(
            "span",
            F.greatest("sa", "sb", "sc") - F.least("sa", "sb", "sc"),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.min("span").cast("long").alias("best_span"),
        F.count("*").alias("n_assignments"),
    )


SQL_PHRASE_SLOP_UNORDERED = f"""
WITH toks AS ({SQL_DOC_TOKS})
SELECT a.doc_id,
       CAST(min(greatest(a.pos - 0, b.pos - 1, c.pos - 2)
              - least(a.pos - 0, b.pos - 1, c.pos - 2)) AS BIGINT) AS best_span,
       CAST(count(*) AS BIGINT) AS n_assignments
FROM toks a
JOIN toks b ON b.doc_id = a.doc_id
           AND abs((b.pos - 1) - (a.pos - 0)) <= {UNORD_SLOP}
JOIN toks c ON c.doc_id = a.doc_id
           AND abs((c.pos - 2) - (a.pos - 0)) <= {UNORD_SLOP}
           AND abs((c.pos - 2) - (b.pos - 1)) <= {UNORD_SLOP}
WHERE a.term = '{SLOP_W[0]}' AND b.term = '{SLOP_W[1]}' AND c.term = '{SLOP_W[2]}'
GROUP BY a.doc_id
"""

QUERIES["ft_phrase_slop_unordered"] = (
    ft_phrase_slop_unordered,
    SQL_PHRASE_SLOP_UNORDERED,
)


# Real BPE token counting (round-3): actual byte-pair merges from the frozen
# 64-merge table (harvester_spark/bpe.py — trained once with the classic
# Sennrich procedure, committed like GPT-2's merges.txt), applied as pure
# string replaces inside whole-stage codegen. Replaces nothing: the
# "BPE-ish" regex pretokenizer (ft_bpe_token_count) stays as the cheap
# estimator; this is the exact counter training-prep packs by
# (training_prep.pack_sequences_bpe).


def ft_bpe_encode_count(spark, sf_dir):
    from harvester_spark.bpe import bpe_token_count_col

    docs = load(spark, sf_dir, "documents")
    words = tokens_column(F.col("text"))
    total = F.aggregate(
        F.transform(words, bpe_token_count_col),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        total.alias("bpe_tokens"),
        F.size(words).cast("long").alias("n_words"),
    )


def _sql_bpe_encode_count() -> str:
    from harvester_spark.bpe import sql_bpe_token_count

    toks = SQL_TOKS.format(col="text")
    per_word = sql_bpe_token_count("w")
    return f"""
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform({toks}, w -> {per_word})), 0) AS BIGINT)
         AS bpe_tokens,
       CAST(len({toks}) AS BIGINT) AS n_words
FROM documents
"""


QUERIES["ft_bpe_encode_count"] = (ft_bpe_encode_count, _sql_bpe_encode_count())


# Winnowing document fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD'03):
# the local document-fingerprinting algorithm behind MOSS-style near-dup /
# overlap detection. Per doc: hash every word-K-gram, slide a W-gram window,
# select each window's minimum hash; the selected set is the fingerprint.
# Guarantee: any shared run of K+W-1 tokens between two docs shares at least
# one selected fingerprint — unlike MinHash (corpus-level similarity) this
# localizes WHERE the overlap is, complementing dedup_duplicate_spans.
#
# Determinism trick shared with the oracle: the per-window argmin must
# tie-break identically in both engines, so (hash, pos) is packed into ONE
# integer key = (hash56 % 2^40) * 2^20 + pos — min(key) is the lexicographic
# (hash, pos) min, leftmost-on-tie, decodable exactly. pos < 2^20 bounds
# docs at ~1M tokens; the Spark side raise_error()s past the bound (an
# overflowing pos would bleed into the hash bits and corrupt fingerprints
# IDENTICALLY in both engines, invisible to the parity gate — fail loudly
# instead). Web pages sit orders of magnitude under it; the reference's own
# extractor caps docs at 10k words (file.py:182-185).
#
# Scale shape: one shuffle on doc_id (the ordered-token window); the k-gram
# build, hashing, window min, and decode are all map-side within the
# per-doc partition — no joins, no second shuffle; DISTINCT stays inside
# the same doc_id partitioning.

WINNOW_K = 4  # k-gram length (tokens)
WINNOW_W = 5  # winnowing window (grams)
_W_HMOD = 1 << 40
_W_PMOD = 1 << 20


def ft_winnow_fingerprints(spark, sf_dir):
    from harvester_spark.operators.dedup import _hash56

    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("term"), *[F.lead("term", i).over(w) for i in range(1, WINNOW_K)]
    )
    grams = (
        toks.select(
            "doc_id",
            "pos",
            gram.alias("gram"),
            F.lead("term", WINNOW_K - 1).over(w).alias("lead_last"),
        )
        .filter(F.col("lead_last").isNotNull())
        .select(
            "doc_id",
            "pos",
            (
                (_hash56(F.col("gram")) % _W_HMOD) * _W_PMOD
                + F.when(F.col("pos") < _W_PMOD, F.col("pos")).otherwise(
                    F.raise_error(
                        F.lit(f"winnowing pos >= {_W_PMOD}: doc exceeds the 2^20-token packing bound")
                    )
                )
            ).alias("key"),
        )
    )
    wf = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    sel = grams.select(
        "doc_id",
        F.min("key").over(wf).alias("k"),
        F.count("*").over(wf).alias("cnt"),
    ).filter(F.col("cnt") == WINNOW_W)
    return sel.select(
        "doc_id",
        F.expr(f"k DIV {_W_PMOD}").alias("fp_hash"),
        (F.col("k") % _W_PMOD).alias("fp_pos"),
    ).distinct()


def _sql_winnow_fingerprints() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    lead_cat = " || ' ' || ".join(
        f"lead(term, {i}) OVER w" for i in range(1, WINNOW_K)
    )
    return f"""
WITH toks AS ({SQL_DOC_TOKS}),
grams AS (
  SELECT doc_id, pos, term || ' ' || {lead_cat} AS gram
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(term, {WINNOW_K - 1}) OVER w IS NOT NULL
),
keys AS (
  SELECT doc_id, pos,
         ({_SQL_HASH56.format(col='gram')} % {_W_HMOD}) * {_W_PMOD} + pos AS key
  FROM grams
),
sel AS (
  SELECT doc_id,
         min(key) OVER fw AS k,
         count(*) OVER fw AS cnt
  FROM keys
  WINDOW fw AS (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
)
SELECT DISTINCT doc_id,
       CAST(k // {_W_PMOD} AS BIGINT) AS fp_hash,
       CAST(k % {_W_PMOD} AS BIGINT) AS fp_pos
FROM sel WHERE cnt = {WINNOW_W}
"""


QUERIES["ft_winnow_fingerprints"] = (
    ft_winnow_fingerprints,
    _sql_winnow_fingerprints(),
)


# ------------------------------------------------------------------- BM25F

# Multi-field weighted ranking. The reference scores simple_query_string
# over a FIELD LIST with per-field weights — OpenSearch's multi-field
# scoring contract (/root/reference/harvester/core/models/search/query.py:
# 73-88, the `fields` parameter of get_search_query_body; the boosts live
# in the search_client SearchConfiguration). BM25F (Robertson & Zaragoza
# 2009, "simple BM25F") is the principled form: weighted field tf with
# per-field length normalization folded into ONE saturation, never one
# BM25 per field summed. The synthetic table has no title column, so the
# title is derived deterministically as the first TITLE_K tokens (the
# established synthesis pattern — curation._pages); everything downstream
# is the real multi-field math.
#
# NOTE: this is a relational operator over the documents table. The
# serving engine's single BM25 kernel (search/bm25.py — rank-identity
# contract) is untouched; BM25F is a different named scorer with its own
# oracle.

TITLE_K = 6  # first tokens form the synthesized title field
BM25F_W_TITLE, BM25F_W_BODY = 3.0, 1.0
BM25F_B_TITLE, BM25F_B_BODY = 0.5, 0.75
BM25F_K1 = 1.2


def ft_bm25f_topk(spark, sf_dir):
    """BM25F AND-match top-10 over (title = first {TITLE_K} tokens, body =
    rest): tf~ = sum_f w_f*tf_f/(1-b_f+b_f*len_f/avglen_f), score =
    sum_t idf_t * tf~*(k1+1)/(k1+tf~). Same plan skeleton as ft_bm25_topk:
    term filter before the tf groupBy, df/stats broadcast, one doc agg,
    TakeOrdered tail. Scores round(.,6); ties doc_id asc."""
    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    n_terms = len(BM25_TERMS)

    lens = docs.select(
        "doc_id", F.size(tokens_column(F.col("text"))).alias("n")
    ).select(
        "doc_id",
        F.least(F.col("n"), F.lit(TITLE_K)).alias("title_len"),
        F.greatest(F.col("n") - TITLE_K, F.lit(0)).alias("body_len"),
    )
    stats = lens.agg(
        (F.sum("title_len") * 1.0 / F.count("*")).alias("avg_title"),
        (F.sum("body_len") * 1.0 / F.count("*")).alias("avg_body"),
        F.count("*").alias("n"),
    )
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy(
            "term",
            "doc_id",
            F.when(F.col("pos") < TITLE_K, F.lit("title"))
            .otherwise(F.lit("body"))
            .alias("field"),
        )
        .agg(F.count("*").alias("tf"))
    )
    wtf = (
        tf.join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "wtf",
            F.when(
                F.col("field") == "title",
                F.col("tf")
                * BM25F_W_TITLE
                / (
                    1.0
                    - BM25F_B_TITLE
                    + BM25F_B_TITLE * F.col("title_len") / F.col("avg_title")
                ),
            ).otherwise(
                F.col("tf")
                * BM25F_W_BODY
                / (
                    1.0
                    - BM25F_B_BODY
                    + BM25F_B_BODY * F.col("body_len") / F.col("avg_body")
                ),
            ),
        )
        .groupBy("term", "doc_id")
        .agg(F.sum("wtf").alias("tfd"), F.first("n").alias("n"))
    )
    df_ = wtf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        wtf.join(F.broadcast(df_), "term")
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tfd") * (BM25F_K1 + 1.0))
            / (BM25F_K1 + F.col("tfd")),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("nt"), F.round(F.sum("contrib"), 6).alias("score"))
        .filter(F.col("nt") == n_terms)
        .select("doc_id", "score")
    )
    return _ranked_top10(scored)


SQL_BM25F_TOPK = f"""
WITH toks AS ({SQL_DOC_TOKS}),
lens AS (
  SELECT doc_id,
         LEAST(len({SQL_TOKS.format(col='text')}), {TITLE_K}) AS title_len,
         GREATEST(len({SQL_TOKS.format(col='text')}) - {TITLE_K}, 0) AS body_len
  FROM documents
),
stats AS (
  SELECT sum(title_len) * 1.0 / count(*) AS avg_title,
         sum(body_len) * 1.0 / count(*) AS avg_body,
         count(*) AS n
  FROM lens
),
tf AS (
  SELECT term, doc_id,
         CASE WHEN pos < {TITLE_K} THEN 'title' ELSE 'body' END AS field,
         count(*) AS tf
  FROM toks WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
  GROUP BY 1, 2, 3
),
wtf AS (
  SELECT term, tf.doc_id,
         sum(CASE WHEN field = 'title'
                  THEN tf * {BM25F_W_TITLE}
                       / (1.0 - {BM25F_B_TITLE} + {BM25F_B_TITLE} * title_len / avg_title)
                  ELSE tf * {BM25F_W_BODY}
                       / (1.0 - {BM25F_B_BODY} + {BM25F_B_BODY} * body_len / avg_body)
             END) AS tfd,
         any_value(n) AS n
  FROM tf JOIN lens USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM wtf GROUP BY term),
scored AS (
  SELECT wtf.doc_id, count(*) AS nt,
         round(sum(
           ln(1.0 + (wtf.n - df.df + 0.5) / (df.df + 0.5))
           * (tfd * {BM25F_K1 + 1.0}) / ({BM25F_K1} + tfd)
         ), 6) AS score
  FROM wtf JOIN df USING (term)
  GROUP BY wtf.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score
FROM scored WHERE nt = {len(BM25_TERMS)}
ORDER BY rank LIMIT 10
"""

QUERIES["ft_bm25f_topk"] = (ft_bm25f_topk, SQL_BM25F_TOPK)


# -------------------------------------------------------------- bigram LM

# One level above ft_unigram_logprob on the CCNet ladder: a PRUNED
# interpolated bigram language model (the KenLM-recipe shape at Spark
# scale). Train = two map-side-combined histograms (unigram per lang,
# bigram per lang pruned to the top BIGRAM_M by count — the standard LM
# pruning step, so the scoring joins broadcast a bounded model no matter
# the corpus size); score = one per-doc window (lag) plus three broadcast
# joins. Per-token log-probs are integer micro-nats (round(1e6*ln(p)) —
# the DSIR idiom), so each doc's sum is an exact int64 in both engines;
# the one float expression is written ONCE and fed verbatim to Spark and
# DuckDB. First token of a doc scores unigram-only (no back-context);
# unseen bigrams fall back through the 0.3 unigram interpolation weight.

BIGRAM_M = 4096  # pruned bigram rows per language
_BIGRAM_LOGP = (
    "CASE WHEN prev IS NULL"
    " THEN round(1000000.0 * ln((cu + 1.0) / (lt + lv)), 0)"
    " ELSE round(1000000.0 * ln(0.7 * coalesce(cb, 0) / cv"
    " + 0.3 * ((cu + 1.0) / (lt + lv))), 0) END"
)


def ft_bigram_lm_logprob(spark, sf_dir):
    """(doc_id, lang, n_tokens, logp_micro, avg_nll_micro): interpolated
    bigram-LM log-prob of every doc under the corpus-trained pruned model."""
    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        "doc_id", "lang", "term", F.lag("term").over(w).alias("prev")
    )
    uni = toks.groupBy("lang", "term").agg(F.count("*").cast("long").alias("cu"))
    tot = toks.groupBy("lang").agg(
        F.count("*").cast("long").alias("lt"),
        F.countDistinct("term").cast("long").alias("lv"),
    )
    bi = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("lang", "prev", "term")
        .agg(F.count("*").cast("long").alias("cb"))
    )
    rw = W.partitionBy("lang").orderBy(
        F.col("cb").desc(), F.col("prev").asc(), F.col("term").asc()
    )
    bi_pruned = (
        bi.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= BIGRAM_M)
        .drop("rn")
    )
    cv = uni.select("lang", F.col("term").alias("prev"), F.col("cu").alias("cv"))
    scored = (
        pairs.join(F.broadcast(uni), ["lang", "term"], "left")
        .join(F.broadcast(cv), ["lang", "prev"], "left")
        .join(F.broadcast(bi_pruned), ["lang", "prev", "term"], "left")
        .join(F.broadcast(tot), "lang")
        .withColumn("lp", F.expr(f"CAST({_BIGRAM_LOGP} AS BIGINT)"))
    )
    return scored.groupBy("doc_id", "lang").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("lp").cast("long").alias("logp_micro"),
        F.round(-F.sum("lp") * 1.0 / F.count("*"), 6).alias("avg_nll_micro"),
    )


SQL_BIGRAM_LM_LOGPROB = f"""
WITH toks AS ({SQL_DOC_TOKS}),
pairs AS (
  SELECT doc_id, lang, term,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
),
uni AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY 1, 2),
tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS lt,
         CAST(count(DISTINCT term) AS BIGINT) AS lv
  FROM toks GROUP BY 1
),
bi AS (
  SELECT lang, prev, term, CAST(count(*) AS BIGINT) AS cb
  FROM pairs WHERE prev IS NOT NULL GROUP BY 1, 2, 3
),
bi_pruned AS (
  SELECT lang, prev, term, cb FROM bi
  QUALIFY row_number() OVER (PARTITION BY lang
                             ORDER BY cb DESC, prev ASC, term ASC) <= {BIGRAM_M}
),
joined AS (
  SELECT p.doc_id AS doc_id, p.lang AS lang, p.prev AS prev,
         u.cu AS cu, c.cv AS cv, b.cb AS cb, t.lt AS lt, t.lv AS lv
  FROM pairs p
  LEFT JOIN uni u ON p.lang = u.lang AND p.term = u.term
  LEFT JOIN (SELECT lang, term AS prev, cu AS cv FROM uni) c
         ON p.lang = c.lang AND p.prev = c.prev
  LEFT JOIN bi_pruned b ON p.lang = b.lang AND p.prev = b.prev AND p.term = b.term
  JOIN tot t ON p.lang = t.lang
),
scored AS (
  SELECT doc_id, lang, CAST({_BIGRAM_LOGP} AS BIGINT) AS lp FROM joined
)
SELECT doc_id, lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(lp) AS BIGINT) AS logp_micro,
       round(-sum(lp) * 1.0 / count(*), 6) AS avg_nll_micro
FROM scored GROUP BY doc_id, lang
"""

QUERIES["ft_bigram_lm_logprob"] = (ft_bigram_lm_logprob, SQL_BIGRAM_LM_LOGPROB)


# ------------------------------------------------- lexical diversity signal

# Per-doc lexical-diversity quality signals (the CCNet/Gopher companion to
# ft_quality_score): type-token ratio and hapax share — generated word-soup
# and template boilerplate sit far below natural text on both. Integer
# counts; the two ratios are single shared divisions rounded to 6 (exact
# integers in, correctly-rounded IEEE division out — bit-stable).
#
# Scale shape: ZERO exchanges — distinct-count and hapax-count are array
# expressions inside the scan (hapax via sort + neighbor comparison, no
# per-token map lookup), whole-stage-codegen end to end (plan-guarded).


def ft_lexical_diversity(spark, sf_dir):
    """(doc_id, n_tokens, n_types, n_hapax, ttr, hapax_ratio)."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens_column(F.col("text"))
    srt = F.array_sort(toks)
    # a sorted token is a hapax iff it differs from BOTH neighbors
    hapax = F.size(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(srt), F.lit(1))),
                # F.get is 0-based and NULL-safe at both boundaries
                lambda i: (
                    (F.get(srt, i - 1) != F.coalesce(F.get(srt, i - 2), F.lit(" ")))
                    & (F.get(srt, i - 1) != F.coalesce(F.get(srt, i), F.lit(" ")))
                ).cast("int"),
            ),
            lambda x: x == 1,
        )
    )
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
        F.when(F.size(toks) == 0, F.lit(0))
        .otherwise(hapax)
        .cast("long")
        .alias("n_hapax"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.when(F.col("n_tokens") == 0, 0.0)
        .otherwise(F.round(F.col("n_types") / F.col("n_tokens"), 6))
        .alias("ttr"),
        F.when(F.col("n_tokens") == 0, 0.0)
        .otherwise(F.round(F.col("n_hapax") / F.col("n_tokens"), 6))
        .alias("hapax_ratio"),
    )


SQL_LEXICAL_DIVERSITY = f"""
WITH base AS (
  SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
),
tc AS (
  SELECT doc_id, term, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS term FROM base) GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
  FROM tc GROUP BY 1
)
SELECT b.doc_id,
       CAST(len(b.t) AS BIGINT) AS n_tokens,
       coalesce(a.n_types, 0) AS n_types,
       coalesce(a.n_hapax, 0) AS n_hapax,
       CASE WHEN len(b.t) = 0 THEN 0.0
            ELSE round(coalesce(a.n_types, 0) / CAST(len(b.t) AS DOUBLE), 6)
       END AS ttr,
       CASE WHEN len(b.t) = 0 THEN 0.0
            ELSE round(coalesce(a.n_hapax, 0) / CAST(len(b.t) AS DOUBLE), 6)
       END AS hapax_ratio
FROM base b LEFT JOIN agg a USING (doc_id)
"""


QUERIES["ft_lexical_diversity"] = (ft_lexical_diversity, SQL_LEXICAL_DIVERSITY)


# Tokenizer fertility (BPE subtokens per whitespace word, per language) —
# the standard multilingual-pipeline health metric (a tokenizer with high
# fertility on a language inflates its training cost and truncates its
# effective context). Integer sums (engine-exact) with one final division,
# round(.,6); reuses the frozen BPE merge table (bpe.py) end to end.
def ft_bpe_fertility(spark, sf_dir):
    per_doc = ft_bpe_encode_count(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.round(
                F.sum("bpe_tokens") * 1.0 / F.sum("n_words"), 6
            ).alias("fertility"),
        )
    )


def _sql_bpe_fertility() -> str:
    return f"""
WITH per_doc AS ({_sql_bpe_encode_count()})
SELECT lang,
       CAST(sum(bpe_tokens) AS BIGINT) AS bpe_tokens,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       round(sum(bpe_tokens) * 1.0 / sum(n_words), 6) AS fertility
FROM per_doc JOIN (SELECT doc_id, lang FROM documents) USING (doc_id)
GROUP BY lang
"""


QUERIES["ft_bpe_fertility"] = (ft_bpe_fertility, _sql_bpe_fertility())


# Language-ID confusion matrix: the heuristic's predictions
# (ft_lang_heuristic) cross-tabulated against the labeled lang column —
# the evaluation artifact a pipeline publishes before trusting a classifier
# as a routing filter. recall = exact integer ratio per truth row,
# round(.,6); one groupBy after the per-doc prediction.
def ft_langid_confusion(spark, sf_dir):
    pred = ft_lang_heuristic(spark, sf_dir).select("doc_id", "pred_lang")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    cells = (
        docs.join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )
    wl = W.partitionBy("lang")
    return cells.withColumn(
        "recall", F.round(F.col("n") * 1.0 / F.sum("n").over(wl), 6)
    ).select("lang", "pred_lang", "n", "recall")


SQL_LANGID_CONFUSION = f"""
WITH pred AS ({SQL_LANG_HEURISTIC}),
cells AS (
  SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang, pred_lang, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY lang), 6) AS recall
FROM cells
"""


QUERIES["ft_langid_confusion"] = (ft_langid_confusion, SQL_LANGID_CONFUSION)


# ------------------------------------------- Dirichlet query likelihood

# The second classic ranking family next to BM25: Dirichlet-smoothed query
# likelihood (Zhai & Lafferty 2001; Lucene's LMDirichletSimilarity, which
# the reference could select per-field instead of BM25 —
# /root/reference/harvester/search/models/index.py only configures
# analyzers, so BM25 stays the default and this is the alternative).
# score(D, q) = Σ_t ln((tf + μ·cf_t/|C|) / (dl + μ)), μ = 2000 (Lucene's
# default). EVERY doc scores every query term (tf = 0 rows fall back to
# the collection model), so the spine is documents × the 3-term dim — a
# broadcast nested loop over a 3-row side, map-only. Per-term log-probs
# are integer micro-nats via the ONE shared expression string (the
# bigram-LM idiom), so the doc score is an exact int64 sum in both
# engines; ranking ties break on doc_id asc. This intentionally does NOT
# touch search/bm25.py — ONE BM25 formula repo-wide stays true.

DIR_MU = 2000
_DIR_LP = (
    f"CAST(round(1000000.0e0 * ln((tf + {DIR_MU}.0e0 * cf / ct)"
    f" / (dl + {DIR_MU}.0e0)), 0) AS BIGINT)"
)


def ft_lm_dirichlet_topk(spark, sf_dir):
    """(rank, doc_id, logp_micro): top-10 docs by Dirichlet-smoothed query
    likelihood of the flagship query, scores in integer micro-nats."""
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
    top = scored.orderBy(
        F.col("logp_micro").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = W.orderBy(F.col("logp_micro").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "logp_micro"
    )


SQL_LM_DIRICHLET = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
cfs AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY 1
),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY 1, 2
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
  SELECT doc_id, CAST(sum({_DIR_LP}) AS BIGINT) AS logp_micro
  FROM joined GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY logp_micro DESC, doc_id ASC) AS INT)
         AS rank,
       doc_id, logp_micro
FROM scored
ORDER BY logp_micro DESC, doc_id ASC LIMIT 10
"""


QUERIES["ft_lm_dirichlet_topk"] = (ft_lm_dirichlet_topk, SQL_LM_DIRICHLET)


# ------------------------------------------------- significant terms (JLH)

# The OpenSearch/ES `significant_text` aggregation backing "what terms
# characterize this result set" drill-downs (the reference exposes its
# cousin, the terms-agg facet counts — search/views/document.py:95-112; this
# is the significance-scored upgrade every relevance UI grows into). JLH
# score = (fg_rate − bg_rate) · (fg_rate / bg_rate): absolute lift times
# relative lift, the ES default.
#
# The synthetic corpus has NO term↔metadata association (measured: max
# per-term lift for any lang/source slice is within 12% of the base rate),
# so a real-column foreground would make the score degenerate — the repo
# rule for that (CLAUDE.md) is deterministic in-operator synthesis plus a
# discrimination test. Foreground = doc_id % 5 == 0; those docs get ONE
# topic token (3-way by doc_id % 3) appended to their text; background
# noise docs (doc_id % 17 == 0) get the same token so bg_df is nonzero and
# the score has to beat real noise. Identical synthesis expression in both
# engines; the test pins that topic terms out-rank every organic term.
#
# Scale shape: fg term-df is one groupBy over the FILTERED token stream;
# bg term-df is the index dictionary (one groupBy over the full stream at
# build time — serving would read the dictionary, not re-scan). The two
# meet in one equi-join on term; the 1-row (n_fg, n_bg) stats frame is a
# broadcast crossJoin; the tail is TakeOrdered(20), never a global sort.
# All doubles derive from the same integer-ratio expression string in both
# engines (e0 literals, mirrored-negative micro-unit rounding).

SIG_TOPICS = ("alphatopic", "betatopic", "gammatopic")
SIG_MIN_FG_DF = 3  # ES min_doc_count default

# text with the deterministic topical overlay (shared expression string)
_SIG_TEXT = (
    "CASE WHEN doc_id % 5 = 0 OR doc_id % 17 = 0 THEN "
    "text || ' ' || CASE doc_id % 3 "
    "WHEN 0 THEN 'alphatopic' WHEN 1 THEN 'betatopic' "
    "ELSE 'gammatopic' END "
    "ELSE text END"
)

_SIG_JLH = (
    "((fg_df * 1.0e0 / n_fg) - (df * 1.0e0 / n_bg))"
    " * ((fg_df * 1.0e0 / n_fg) / (df * 1.0e0 / n_bg))"
)
_SIG_JLH_MICRO = (
    f"CASE WHEN {_SIG_JLH} >= 0e0 "
    f"THEN CAST(floor({_SIG_JLH} * 1.0e6 + 0.5e0) AS BIGINT) "
    f"ELSE CAST(-floor(-({_SIG_JLH}) * 1.0e6 + 0.5e0) AS BIGINT) END"
)


def ft_significant_terms(spark, sf_dir):
    """(rank, term, fg_df, df, jlh_micro): top-20 terms most significant
    for the foreground slice (doc_id % 5 == 0 over the topic-overlaid
    corpus) vs the whole corpus, JLH-scored in integer micro-units; ties
    term asc."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "is_fg", (F.col("doc_id") % 5 == 0)
    )
    toks = docs.select(
        "doc_id",
        "is_fg",
        F.explode(tokens_column(F.expr(_SIG_TEXT))).alias("term"),
    )

    term_doc = toks.select("term", "doc_id", "is_fg").distinct()
    bg = term_doc.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    fg = (
        term_doc.filter(F.col("is_fg"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("fg_df"))
        .filter(F.col("fg_df") >= SIG_MIN_FG_DF)
    )
    stats = docs.agg(
        F.count("*").cast("long").alias("n_bg"),
        F.sum(F.col("is_fg").cast("long")).cast("long").alias("n_fg"),
    )
    scored = (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("jlh_micro", F.expr(_SIG_JLH_MICRO))
        .select("term", "fg_df", "df", "jlh_micro")
    )
    top = scored.orderBy(F.col("jlh_micro").desc(), F.col("term").asc()).limit(20)
    w = W.orderBy(F.col("jlh_micro").desc(), F.col("term").asc())
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "term", "fg_df", "df", "jlh_micro")


SQL_SIGNIFICANT_TERMS = f"""
WITH synth AS (
  SELECT doc_id, doc_id % 5 = 0 AS is_fg, {_SIG_TEXT} AS text2
  FROM documents
),
toks AS (
  SELECT doc_id, is_fg,
         unnest({SQL_TOKS.format(col='text2')}) AS term
  FROM synth
),
term_doc AS (SELECT DISTINCT term, doc_id, is_fg FROM toks),
bg AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM term_doc GROUP BY 1),
fg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS fg_df FROM term_doc
  WHERE is_fg GROUP BY 1
  HAVING count(*) >= {SIG_MIN_FG_DF}
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_bg,
         CAST(sum(CASE WHEN is_fg THEN 1 ELSE 0 END) AS BIGINT) AS n_fg
  FROM synth
),
scored AS (
  SELECT term, fg_df, df, {_SIG_JLH_MICRO} AS jlh_micro
  FROM fg JOIN bg USING (term) CROSS JOIN stats
)
SELECT CAST(row_number() OVER (ORDER BY jlh_micro DESC, term ASC) AS INT)
         AS rank,
       term, fg_df, df, jlh_micro
FROM scored
ORDER BY jlh_micro DESC, term ASC LIMIT 20
"""


QUERIES["ft_significant_terms"] = (ft_significant_terms, SQL_SIGNIFICANT_TERMS)


# --------------------------------------------- dis_max best_fields ranking

# ES `multi_match type=best_fields` — the OTHER multi-field combination
# the reference's field-list queries can request (OpenSearch's default
# multi_match type; the reference passes a fields list to
# simple_query_string — core/models/search/query.py:73-88 — whose
# cross-field scoring has two canonical modes: the fielded-saturation
# BM25F above, and this one). Each field is scored as its own BM25 index
# (field-local tf, length norm, df) over the full AND query; a doc
# qualifies if at least ONE field matches all terms; the combined score is
# Lucene's DisjunctionMaxQuery: max over matching fields plus
# tie_breaker · (sum − max). Fields are the same deterministic synthesis
# as BM25F (title = first TITLE_K tokens, body = rest).
#
# Same scale skeleton as ft_bm25_topk: term filter before the tf groupBy,
# broadcast df/stats, two doc-keyed aggs, TakeOrdered(10) tail. The
# serving kernel (search/bm25.py) is untouched.

DISMAX_TIE_BREAKER = 0.3


def ft_dismax_topk(spark, sf_dir):
    """(rank, doc_id, n_fields, score): top-10 docs by dis_max best_fields
    over (title, body); score = max + 0.3·(sum − max), round(.,6); ties
    doc_id asc."""
    toks = doc_tokens(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    n_terms = len(BM25_TERMS)

    lens = docs.select(
        "doc_id", F.size(tokens_column(F.col("text"))).alias("n_toks")
    ).select(
        "doc_id",
        F.least(F.col("n_toks"), F.lit(TITLE_K)).alias("title_len"),
        F.greatest(F.col("n_toks") - TITLE_K, F.lit(0)).alias("body_len"),
    )
    stats = lens.agg(
        (F.sum("title_len") * 1.0 / F.count("*")).alias("avg_title"),
        (F.sum("body_len") * 1.0 / F.count("*")).alias("avg_body"),
        F.count("*").alias("n"),
    )
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy(
            "term",
            "doc_id",
            F.when(F.col("pos") < TITLE_K, F.lit("title"))
            .otherwise(F.lit("body"))
            .alias("field"),
        )
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term", "field").agg(
        F.countDistinct("doc_id").alias("df")
    )
    contrib = (
        tf.join(F.broadcast(df_), ["term", "field"])
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "flen",
            F.when(F.col("field") == "title", F.col("title_len")).otherwise(
                F.col("body_len")
            ),
        )
        .withColumn(
            "favg",
            F.when(F.col("field") == "title", F.col("avg_title")).otherwise(
                F.col("avg_body")
            ),
        )
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "c",
            F.col("idf")
            * (F.col("tf") * (BM25F_K1 + 1.0))
            / (
                F.col("tf")
                + BM25F_K1
                * (1.0 - 0.75 + 0.75 * F.col("flen") / F.col("favg"))
            ),
        )
    )
    per_field = (
        contrib.groupBy("doc_id", "field")
        .agg(F.count("*").alias("nt"), F.sum("c").alias("s_f"))
        .filter(F.col("nt") == n_terms)  # per-field AND match
    )
    scored = (
        per_field.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_fields"),
            F.max("s_f").alias("smax"),
            F.sum("s_f").alias("ssum"),
        )
        .withColumn(
            "score",
            F.round(
                F.col("smax")
                + DISMAX_TIE_BREAKER * (F.col("ssum") - F.col("smax")),
                6,
            ),
        )
        .select("doc_id", "n_fields", "score")
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "doc_id", "n_fields", "score"
    )


SQL_DISMAX_TOPK = f"""
WITH toks AS ({SQL_DOC_TOKS}),
lens AS (
  SELECT doc_id,
         LEAST(len({SQL_TOKS.format(col='text')}), {TITLE_K}) AS title_len,
         GREATEST(len({SQL_TOKS.format(col='text')}) - {TITLE_K}, 0) AS body_len
  FROM documents
),
stats AS (
  SELECT sum(title_len) * 1.0 / count(*) AS avg_title,
         sum(body_len) * 1.0 / count(*) AS avg_body,
         count(*) AS n
  FROM lens
),
tf AS (
  SELECT term, doc_id,
         CASE WHEN pos < {TITLE_K} THEN 'title' ELSE 'body' END AS field,
         count(*) AS tf
  FROM toks WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
  GROUP BY 1, 2, 3
),
df AS (SELECT term, field, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1, 2),
contrib AS (
  SELECT tf.term, tf.doc_id, tf.field,
         ln(1.0 + (n - df.df + 0.5) / (df.df + 0.5))
         * (tf * {BM25F_K1 + 1.0})
         / (tf + {BM25F_K1} * (1.0 - 0.75 + 0.75
            * (CASE WHEN tf.field = 'title' THEN title_len ELSE body_len END)
            / (CASE WHEN tf.field = 'title' THEN avg_title ELSE avg_body END)))
         AS c
  FROM tf
  JOIN df USING (term, field)
  JOIN lens USING (doc_id)
  CROSS JOIN stats
),
per_field AS (
  SELECT doc_id, field, count(*) AS nt, sum(c) AS s_f
  FROM contrib GROUP BY 1, 2
  HAVING count(*) = {len(BM25_TERMS)}
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fields,
         round(max(s_f) + {DISMAX_TIE_BREAKER} * (sum(s_f) - max(s_f)), 6)
           AS score
  FROM per_field GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       doc_id, n_fields, score
FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10
"""

QUERIES["ft_dismax_topk"] = (ft_dismax_topk, SQL_DISMAX_TOPK)


# ----------------------------------------------------- Kneser-Ney bigram

# The third rung of the LM ladder (unigram → interpolated bigram →
# modified-context bigram): interpolated Kneser-Ney (Kneser & Ney 1995;
# Chen & Goodman 1999's interpolated form) with absolute discount
# D = 3/4 — the smoothing KenLM ships as its default and the one that
# actually matters for CCNet-style perplexity filtering, because the
# continuation probability P_cont(w) ∝ |distinct left contexts of w|
# de-weights tokens that are frequent only inside one collocation.
#
#   P(w|v) = (max(c(vw) − D, 0) + D·N1+(v·)·P_cont(w)) / c(v·)
#   P_cont(w) = (N1+(·w) + 1) / (B + V)        (add-one over bigram types
#                                               so doc-initial-only tokens
#                                               keep finite mass)
# with c(v·) the bigram-left mass of v, N1+(v·)/N1+(·w) distinct right /
# left continuation counts, B = bigram types, V = vocab — ALL exact
# integers, fed through ONE shared micro-nat float string (the
# ft_bigram_lm_logprob contract), so per-doc sums are exact int64.
# First tokens and unseen left contexts back off to P_cont alone; unseen
# or PRUNED bigrams keep only the continuation term (max(0−D,0) = 0 —
# KN's backoff is exactly what model pruning needs: dropping a bigram row
# degrades gracefully to the continuation estimate).
#
# Scale shape: identical to ft_bigram_lm_logprob — histogram aggs are
# map-side-combinable and vocab-bounded, the bigram table is pruned to
# BIGRAM_M rows per language before broadcast, scoring is one lag window
# plus broadcast joins.

_KN_LOGP = (
    "CASE WHEN prev IS NULL OR cv IS NULL"
    " THEN round(1000000.0e0 * ln((coalesce(nl, 0) + 1.0e0) / (bt + lv)), 0)"
    " ELSE round(1000000.0e0 * ln("
    "(greatest(coalesce(cb, 0) - 0.75e0, 0.0e0)"
    " + 0.75e0 * n1p * ((coalesce(nl, 0) + 1.0e0) / (bt + lv))) / cv), 0) END"
)


def ft_kneser_ney_logprob(spark, sf_dir):
    """(doc_id, lang, n_tokens, logp_micro, avg_nll_micro): interpolated
    Kneser-Ney bigram log-prob of every doc under the corpus-trained
    pruned model."""
    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        "doc_id", "lang", "term", F.lag("term").over(w).alias("prev")
    )
    bp = pairs.filter(F.col("prev").isNotNull())
    left = bp.groupBy("lang", "prev").agg(
        F.count("*").cast("long").alias("cv"),
        F.countDistinct("term").cast("long").alias("n1p"),
    )
    right = bp.groupBy("lang", "term").agg(
        F.countDistinct("prev").cast("long").alias("nl")
    )
    bi = bp.groupBy("lang", "prev", "term").agg(
        F.count("*").cast("long").alias("cb")
    )
    consts = bi.groupBy("lang").agg(F.count("*").cast("long").alias("bt")).join(
        toks.groupBy("lang").agg(F.countDistinct("term").cast("long").alias("lv")),
        "lang",
    )
    rw = W.partitionBy("lang").orderBy(
        F.col("cb").desc(), F.col("prev").asc(), F.col("term").asc()
    )
    bi_pruned = (
        bi.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= BIGRAM_M)
        .drop("rn")
    )
    scored = (
        pairs.join(F.broadcast(left), ["lang", "prev"], "left")
        .join(F.broadcast(right), ["lang", "term"], "left")
        .join(F.broadcast(bi_pruned), ["lang", "prev", "term"], "left")
        .join(F.broadcast(consts), "lang")
        .withColumn("lp", F.expr(f"CAST({_KN_LOGP} AS BIGINT)"))
    )
    return scored.groupBy("doc_id", "lang").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("lp").cast("long").alias("logp_micro"),
        F.round(-F.sum("lp") * 1.0 / F.count("*"), 6).alias("avg_nll_micro"),
    )


SQL_KNESER_NEY_LOGPROB = f"""
WITH toks AS ({SQL_DOC_TOKS}),
pairs AS (
  SELECT doc_id, lang, term,
         lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
),
bp AS (SELECT * FROM pairs WHERE prev IS NOT NULL),
leftc AS (
  SELECT lang, prev, CAST(count(*) AS BIGINT) AS cv,
         CAST(count(DISTINCT term) AS BIGINT) AS n1p
  FROM bp GROUP BY 1, 2
),
rightc AS (
  SELECT lang, term, CAST(count(DISTINCT prev) AS BIGINT) AS nl
  FROM bp GROUP BY 1, 2
),
bi AS (
  SELECT lang, prev, term, CAST(count(*) AS BIGINT) AS cb
  FROM bp GROUP BY 1, 2, 3
),
consts AS (
  SELECT b.lang AS lang, b.bt AS bt, v.lv AS lv
  FROM (SELECT lang, CAST(count(*) AS BIGINT) AS bt FROM bi GROUP BY 1) b
  JOIN (SELECT lang, CAST(count(DISTINCT term) AS BIGINT) AS lv
        FROM toks GROUP BY 1) v USING (lang)
),
bi_pruned AS (
  SELECT lang, prev, term, cb FROM bi
  QUALIFY row_number() OVER (PARTITION BY lang
                             ORDER BY cb DESC, prev ASC, term ASC) <= {BIGRAM_M}
),
joined AS (
  SELECT p.doc_id AS doc_id, p.lang AS lang, p.prev AS prev,
         l.cv AS cv, l.n1p AS n1p, r.nl AS nl, b.cb AS cb,
         c.bt AS bt, c.lv AS lv
  FROM pairs p
  LEFT JOIN leftc l ON p.lang = l.lang AND p.prev = l.prev
  LEFT JOIN rightc r ON p.lang = r.lang AND p.term = r.term
  LEFT JOIN bi_pruned b ON p.lang = b.lang AND p.prev = b.prev
                        AND p.term = b.term
  JOIN consts c ON p.lang = c.lang
),
scored AS (
  SELECT doc_id, lang, CAST({_KN_LOGP} AS BIGINT) AS lp FROM joined
)
SELECT doc_id, lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(lp) AS BIGINT) AS logp_micro,
       round(-sum(lp) * 1.0 / count(*), 6) AS avg_nll_micro
FROM scored GROUP BY doc_id, lang
"""

QUERIES["ft_kneser_ney_logprob"] = (ft_kneser_ney_logprob, SQL_KNESER_NEY_LOGPROB)


# --------------------------------------------- JM lambda EM (deleted interp)

# Tuning the Jelinek-Mercer interpolation weight by EM on the corpus
# itself (Jelinek & Mercer 1980's deleted-interpolation estimation, the
# procedure behind every λ anyone ships in an interpolated LM): per
# language, iterate
#   e_tok = λ·P_bi / (λ·P_bi + (1−λ)·P_uni),   λ' = mean(e_tok)
# over all bigram positions. {JM_EM_ITERS} iterations are UNROLLED with λ
# in integer milli — the E-step ratio is multiply-then-DIV on exact
# integer micro probabilities (P_bi = cb·1e6 DIV cv, P_uni = cu·1e6 DIV
# lt), the M-step an integer mean — so both engines agree bit-for-bit
# (the PBM/PageRank iteration contract). Sandbox behavior worth pinning:
# on a corpus this size bigram MLEs beat smoothed unigrams on seen
# bigrams, so EM pushes λ UP from 500 — the guard asserts strict
# monotone growth, i.e. the estimator genuinely moves.
#
# Scale shape: the token-level E-step is one scan over the lag-windowed
# bigram stream joined against two broadcast vocab-bounded histograms;
# λ is |lang| rows. Per iteration: one scan, one tiny groupBy. At 100 TB
# the histograms prune to top-M like ft_bigram_lm_logprob (documented).

JM_EM_ITERS = 3
_JM_E = (
    "CAST((lam * pb) * 1000 {div}"
    " greatest(lam * pb + (1000 - lam) * pu, CAST(1 AS BIGINT)) AS BIGINT)"
)


def ft_jm_lambda_em(spark, sf_dir):
    """(lang, n_tokens_em, lambda1_milli, lambda2_milli, lambda3_milli):
    per-language JM interpolation weight after each EM iteration."""
    toks = doc_tokens(spark, sf_dir)
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        "lang", "term", F.lag("term").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    uni = toks.groupBy("lang", "term").agg(F.count("*").cast("long").alias("cu"))
    lt = toks.groupBy("lang").agg(F.count("*").cast("long").alias("lt"))
    cv = pairs.groupBy("lang", "prev").agg(F.count("*").cast("long").alias("cv"))
    bi = pairs.groupBy("lang", "prev", "term").agg(
        F.count("*").cast("long").alias("cb")
    )
    ptab = (
        pairs.join(F.broadcast(bi), ["lang", "prev", "term"])
        .join(F.broadcast(cv), ["lang", "prev"])
        .join(F.broadcast(uni), ["lang", "term"])
        .join(F.broadcast(lt), "lang")
        .select(
            "lang",
            F.expr("CAST(cb * 1000000 DIV cv AS BIGINT)").alias("pb"),
            F.expr("CAST(cu * 1000000 DIV lt AS BIGINT)").alias("pu"),
        )
        .cache()
    )
    lam = ptab.select("lang").distinct().withColumn(
        "lam", F.lit(500).cast("long")
    )
    trail = []
    for _ in range(JM_EM_ITERS):
        lam = (
            ptab.join(F.broadcast(lam), "lang")
            .withColumn("e", F.expr(_JM_E.format(div="DIV")))
            .groupBy("lang")
            .agg(F.expr("CAST(sum(e) DIV count(*) AS BIGINT)").alias("lam"))
            .localCheckpoint()
        )
        trail.append(lam)
    n = ptab.groupBy("lang").agg(F.count("*").cast("long").alias("n_tokens_em"))
    out = n
    for i, t in enumerate(trail, start=1):
        out = out.join(
            t.withColumnRenamed("lam", f"lambda{i}_milli"), "lang"
        )
    return out.select(
        "lang", "n_tokens_em",
        *[f"lambda{i}_milli" for i in range(1, JM_EM_ITERS + 1)],
    )


def _sql_jm_lambda() -> str:
    parts = [
        f"""WITH toks AS ({SQL_DOC_TOKS}),
pairs AS MATERIALIZED (
  SELECT lang, term, prev FROM (
    SELECT lang, term,
           lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM toks
  ) WHERE prev IS NOT NULL
),
uni AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY 1, 2),
lt AS (SELECT lang, CAST(count(*) AS BIGINT) AS lt FROM toks GROUP BY 1),
cv AS (SELECT lang, prev, CAST(count(*) AS BIGINT) AS cv FROM pairs GROUP BY 1, 2),
bi AS (
  SELECT lang, prev, term, CAST(count(*) AS BIGINT) AS cb
  FROM pairs GROUP BY 1, 2, 3
),
ptab AS MATERIALIZED (
  SELECT p.lang,
         CAST(cb * 1000000 // cv AS BIGINT) AS pb,
         CAST(cu * 1000000 // lt AS BIGINT) AS pu
  FROM pairs p
  JOIN bi USING (lang, prev, term)
  JOIN cv USING (lang, prev)
  JOIN uni ON uni.lang = p.lang AND uni.term = p.term
  JOIN lt ON lt.lang = p.lang
),
l0 AS MATERIALIZED (
  SELECT DISTINCT lang, CAST(500 AS BIGINT) AS lam FROM ptab
)"""
    ]
    for k in range(1, JM_EM_ITERS + 1):
        parts.append(
            f""",
l{k} AS MATERIALIZED (
  SELECT lang, CAST(sum({_JM_E.format(div='//')}) // count(*) AS BIGINT) AS lam
  FROM ptab JOIN l{k - 1} USING (lang)
  GROUP BY lang
)"""
        )
    sel = ", ".join(
        f"l{k}.lam AS lambda{k}_milli" for k in range(1, JM_EM_ITERS + 1)
    )
    joins = " ".join(
        f"JOIN l{k} USING (lang)" for k in range(1, JM_EM_ITERS + 1)
    )
    parts.append(
        f"""
SELECT lang, CAST(count_rows AS BIGINT) AS n_tokens_em, {sel}
FROM (SELECT lang, count(*) AS count_rows FROM ptab GROUP BY lang) n
{joins}"""
    )
    return "".join(parts)


QUERIES["ft_jm_lambda_em"] = (ft_jm_lambda_em, _sql_jm_lambda())


# ------------------------------------------------------- term burstiness

# Church & Gale burstiness: how much a term CLUMPS — E[tf | tf > 0] =
# cf/df. Function words spread evenly (ratio ≈ 1); topical terms burst
# (a doc that mentions them once mentions them again). The signal feeds
# two consumers the repo already ships: DFR ranking models (the
# within-doc elite-set assumption) and quality scoring (burst-heavy docs
# are listy/spammy). Exact integers: burst_milli = cf·1000 DIV df, the
# corpus baseline rides along, and the ratio column is
# burst·1000 DIV baseline. Top-{BURST_K} by (burst desc, term asc) plus
# the same count of the LEAST bursty (burst asc) — both tails matter.
#
# Scale shape: one token groupBy (cf, df via countDistinct) + two
# TakeOrdered tails.

BURST_K = 15


def ft_term_burstiness(spark, sf_dir):
    """(term, cf, df, burst_milli, vs_baseline_milli, tail): the
    {BURST_K} most and least bursty terms (min df 5)."""
    toks = doc_tokens(spark, sf_dir)
    stats = toks.groupBy("term").agg(
        F.count("*").cast("long").alias("cf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    ).filter(F.col("df") >= 5)
    base = F.broadcast(
        stats.agg(
            F.expr("CAST(sum(cf) * 1000 DIV sum(df) AS BIGINT)").alias("baseline")
        )
    )
    scored = stats.crossJoin(base).select(
        "term",
        "cf",
        "df",
        F.expr("CAST(cf * 1000 DIV df AS BIGINT)").alias("burst_milli"),
        F.expr(
            "CAST((cf * 1000 DIV df) * 1000 DIV baseline AS BIGINT)"
        ).alias("vs_baseline_milli"),
    )
    hi = (
        scored.orderBy(F.col("burst_milli").desc(), F.col("term").asc())
        .limit(BURST_K)
        .withColumn("tail", F.lit("bursty"))
    )
    lo = (
        scored.orderBy(F.col("burst_milli").asc(), F.col("term").asc())
        .limit(BURST_K)
        .withColumn("tail", F.lit("even"))
    )
    return hi.unionByName(lo)


SQL_TERM_BURSTINESS = f"""
WITH toks AS ({SQL_DOC_TOKS}),
stats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY term
  HAVING count(DISTINCT doc_id) >= 5
),
base AS (
  SELECT CAST(CAST(sum(cf) AS BIGINT) * 1000 // CAST(sum(df) AS BIGINT)
    AS BIGINT) AS baseline FROM stats
),
scored AS (
  SELECT term, cf, df,
         CAST(cf * 1000 // df AS BIGINT) AS burst_milli,
         CAST((cf * 1000 // df) * 1000 // baseline AS BIGINT)
           AS vs_baseline_milli
  FROM stats CROSS JOIN base
)
SELECT * FROM (
  SELECT term, cf, df, burst_milli, vs_baseline_milli, 'bursty' AS tail
  FROM scored ORDER BY burst_milli DESC, term ASC LIMIT {BURST_K}
)
UNION ALL
SELECT * FROM (
  SELECT term, cf, df, burst_milli, vs_baseline_milli, 'even' AS tail
  FROM scored ORDER BY burst_milli ASC, term ASC LIMIT {BURST_K}
)
"""

QUERIES["ft_term_burstiness"] = (ft_term_burstiness, SQL_TERM_BURSTINESS)


# ------------------------------------------- score-gap list truncation

# Adaptive result-list truncation (Arampatzis, Kamps & Robertson,
# SIGIR 2009 "score distribution" family): instead of a fixed k, cut
# the ranked list at the largest SCORE GAP — the point where relevance
# plausibly ends. Over the flagship BM25-OR top-{GAP_POOL}: scores to
# exact micro ints, consecutive gaps g_r = s_r − s_{r+1}, cutoff =
# argmax g_r (smallest rank on ties — truncate early when ambiguous),
# every row emitted with its gap and a kept/cut flag. The pytest pins
# the defining property (the gap at the cutoff is the maximum, and the
# kept prefix is exactly ranks ≤ cutoff) plus the pure-Python
# recompute.
#
# Scale shape: the pool is TakeOrdered({GAP_POOL}); gaps ride one lead
# window over the bounded pool; the argmax is a scalar agg broadcast.

GAP_POOL = 20


def ft_score_gap_cutoff(spark, sf_dir):
    """(rank, doc_id, s_micro, gap_micro, cutoff_rank, kept): the
    flagship top-{GAP_POOL} with the max-score-gap truncation point."""
    pool = (
        bm25_or_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(GAP_POOL)
        .select(
            "doc_id",
            F.expr("CAST(round(score * 1.0e6, 0) AS BIGINT)").alias("s_micro"),
        )
    )
    wr = W.orderBy(F.col("s_micro").desc(), F.col("doc_id").asc())
    ranked = pool.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).withColumn(
        "gap_micro",
        (F.col("s_micro") - F.coalesce(
            F.lead("s_micro").over(wr), F.col("s_micro")
        )).cast("long"),
    ).cache()
    cut = F.broadcast(
        ranked.filter(F.col("rank") < GAP_POOL)
        .orderBy(F.col("gap_micro").desc(), F.col("rank").asc())
        .limit(1)
        .select(F.col("rank").alias("cutoff_rank"))
    )
    return ranked.crossJoin(cut).select(
        "rank",
        "doc_id",
        "s_micro",
        "gap_micro",
        "cutoff_rank",
        (F.col("rank") <= F.col("cutoff_rank")).alias("kept"),
    )


def _sql_score_gap() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
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
pool AS MATERIALIZED (
  SELECT doc_id, s_micro FROM orsc
  ORDER BY s_micro DESC, doc_id ASC LIMIT {GAP_POOL}
),
ranked AS MATERIALIZED (
  SELECT doc_id, s_micro,
         CAST(row_number() OVER w AS BIGINT) AS rank,
         CAST(s_micro - coalesce(lead(s_micro) OVER w, s_micro) AS BIGINT)
           AS gap_micro
  FROM pool
  WINDOW w AS (ORDER BY s_micro DESC, doc_id ASC)
),
cut AS (
  SELECT rank AS cutoff_rank FROM ranked
  WHERE rank < {GAP_POOL}
  ORDER BY gap_micro DESC, rank ASC LIMIT 1
)
SELECT rank, doc_id, s_micro, gap_micro,
       (SELECT cutoff_rank FROM cut) AS cutoff_rank,
       rank <= (SELECT cutoff_rank FROM cut) AS kept
FROM ranked
"""


QUERIES["ft_score_gap_cutoff"] = (ft_score_gap_cutoff, _sql_score_gap())
