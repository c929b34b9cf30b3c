"""Text-analytics operators over ``documents`` — the search-surface and
corpus-exploration features a fulltext engine serves beside ranking:

- ``ft_snippet_topk``: Lucene-highlighter-style best-fragment snippets for
  the BM25 top-10 (the reference surfaces result documents through
  OpenSearch, whose highlighter picks the best term-dense fragment; here the
  deterministic window-scored equivalent, prune-first on the 10 result docs).
- ``ft_keyword_extract``: per-document top-N TF-IDF keywords (the classic
  corpus-exploration signal; same idf family as the BM25 kernel).
- ``ft_cooccur_pmi``: windowed term co-occurrence with PMI scoring (the
  distributional-statistics workload a training-data pipeline runs to audit
  corpus composition; Church & Hanks 1990).

All three follow the module contract of operators/__init__.py: the Spark
plan is the scale plan (prune-first semi-joins, map-side-combinable aggs,
no cartesian products), and the DuckDB oracle is a full value-hash twin.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.operators.common import SQL_DOC_TOKS, doc_tokens, load
from harvester_spark.operators.fulltext_queries import (
    BM25_TERMS,
    SQL_BM25_TOPK,
    ft_bm25_topk,
)

# ------------------------------------------------------------- snippets

SNIP_W = 8  # snippet window length (tokens)


def ft_snippet_topk(spark, sf_dir):
    """Best-snippet extraction for the BM25 top-10: for each result doc,
    the ``SNIP_W``-token window anchored at a query-term hit that maximizes
    (distinct query terms, total hits), tie-break earliest start.

    Scale shape: everything after the ranking is pruned to the 10 result
    docs FIRST (broadcast semi-join), so the hit×hit window join and the
    snippet-text reassembly touch ~10 docs of tokens regardless of corpus
    size — the highlighter never rescans the corpus. The window join is a
    doc-local position band (no cartesian), like the sloppy-phrase kernel.
    """
    # materialize the 10-row ranking ONCE (bounded collect, the serving
    # path's bounded-rerank contract) — it is consumed by three joins below
    # and re-deriving it would re-scan the corpus each time
    tdf = ft_bm25_topk(spark, sf_dir)  # rank, doc_id, score
    top = spark.createDataFrame(tdf.collect(), tdf.schema)
    ids = F.broadcast(top.select("doc_id"))
    toks = doc_tokens(spark, sf_dir).join(ids, "doc_id", "semi")
    hits = toks.filter(F.col("term").isin(BM25_TERMS)).select(
        "doc_id", "pos", "term"
    )
    a = hits.select("doc_id", F.col("pos").alias("apos"))
    b = hits.select(
        F.col("doc_id").alias("db"), F.col("pos").alias("bpos"), "term"
    )
    wins = (
        a.join(
            b,
            (F.col("doc_id") == F.col("db"))
            & (F.col("bpos") >= F.col("apos"))
            & (F.col("bpos") <= F.col("apos") + (SNIP_W - 1)),
        )
        .groupBy("doc_id", "apos")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.count("*").alias("n_hits"),
        )
    )
    wbest = W.partitionBy("doc_id").orderBy(
        F.col("n_terms").desc(), F.col("n_hits").desc(), F.col("apos").asc()
    )
    best = (
        wins.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("apos").cast("long").alias("snip_start"),
            "n_terms",
            "n_hits",
        )
    )
    snip = (
        toks.join(
            best.select("doc_id", "snip_start"),
            ["doc_id"],
        )
        .filter(
            (F.col("pos") >= F.col("snip_start"))
            & (F.col("pos") <= F.col("snip_start") + (SNIP_W - 1))
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda s: s["term"],
                ),
                " ",
            ).alias("snippet")
        )
    )
    return top.join(best, "doc_id").join(snip, "doc_id").select(
        "rank", "doc_id", "score", "snip_start", "n_terms", "n_hits", "snippet"
    )


SQL_SNIPPET_TOPK = f"""
WITH toks AS ({SQL_DOC_TOKS}),
top AS (SELECT * FROM ({SQL_BM25_TOPK})),
ptoks AS (SELECT t.doc_id, t.pos, t.term FROM toks t JOIN top USING (doc_id)),
hits AS (
  SELECT doc_id, pos, term FROM ptoks
  WHERE term IN ('key', 'value', 'table')
),
wins AS (
  SELECT a.doc_id, a.pos AS apos,
         count(DISTINCT b.term) AS n_terms, count(*) AS n_hits
  FROM hits a
  JOIN hits b ON b.doc_id = a.doc_id
             AND b.pos BETWEEN a.pos AND a.pos + {SNIP_W - 1}
  GROUP BY a.doc_id, a.pos
),
best AS (
  SELECT doc_id, CAST(apos AS BIGINT) AS snip_start,
         CAST(n_terms AS BIGINT) AS n_terms, CAST(n_hits AS BIGINT) AS n_hits
  FROM wins
  QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY n_terms DESC, n_hits DESC, apos ASC) = 1
),
snip AS (
  SELECT b.doc_id, string_agg(t.term, ' ' ORDER BY t.pos) AS snippet
  FROM best b
  JOIN ptoks t ON t.doc_id = b.doc_id
              AND t.pos BETWEEN b.snip_start AND b.snip_start + {SNIP_W - 1}
  GROUP BY b.doc_id
)
SELECT top.rank, top.doc_id, top.score,
       best.snip_start, best.n_terms, best.n_hits, snip.snippet
FROM top JOIN best USING (doc_id) JOIN snip USING (doc_id)
"""


# ------------------------------------------------------- keyword extraction

KW_TOPN = 3


def ft_keyword_extract(spark, sf_dir):
    """Per-document top-``KW_TOPN`` TF-IDF keywords. idf = ln((N+1)/(df+1))
    (smoothed; same ln both engines), score ``round(.,6)``, ties break on
    term asc so every top-k is totally ordered.

    Scale shape: tf agg shuffles on (doc_id, term) with map-side combine;
    df is a second map-side-combined agg reusing the (doc, term) grain (one
    row per posting, countDistinct-free); tf⋈df is a plain equi-join on term
    (vocabulary-sized — NOT broadcast; AQE may elect to at small scale);
    the per-doc top-k window re-partitions on doc_id, bounded per group.
    """
    tf = (
        doc_tokens(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = load(spark, sf_dir, "documents").select(F.count("*").alias("n"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ),
        )
    )
    wk = W.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KW_TOPN)
        .select("doc_id", "rk", "term", "tf", "df", "score")
    )


SQL_KEYWORD_EXTRACT = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, CAST(rk AS INT) AS rk, term, tf, df, score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
) WHERE rk <= {KW_TOPN}
"""


# ---------------------------------------------------- PMI co-occurrence

PMI_DIST = 3  # max forward distance (tokens) between pair members
PMI_MINC = 5  # min pair count (noise floor)
PMI_TOPN = 50


def ft_cooccur_pmi(spark, sf_dir):
    """Windowed co-occurrence PMI (Church & Hanks 1990): directed pairs
    (a before b, gap ≤ ``PMI_DIST``), PMI = ln((c_ab/N_pairs) /
    ((cf_a/N_tok)·(cf_b/N_tok))), min count ``PMI_MINC``, top-``PMI_TOPN``
    by (pmi desc, ta asc, tb asc).

    Scale shape: pair generation is a doc-local position band self-join
    (≤ ``PMI_DIST``·N_tok rows, linear — no cartesian); pair counts shuffle
    once on (ta, tb) with map-side combine; unigram marginals are a second
    map-side agg; totals are 1-row broadcasts; final top-k is
    TakeOrderedAndProject.
    """
    toks = doc_tokens(spark, sf_dir)
    a = toks.select("doc_id", F.col("pos").alias("apos"), F.col("term").alias("ta"))
    b = toks.select(
        F.col("doc_id").alias("db"), F.col("pos").alias("bpos"),
        F.col("term").alias("tb"),
    )
    pairs = a.join(
        b,
        (F.col("doc_id") == F.col("db"))
        & (F.col("bpos") > F.col("apos"))
        & (F.col("bpos") <= F.col("apos") + PMI_DIST),
    ).select("ta", "tb")
    pc = pairs.groupBy("ta", "tb").agg(F.count("*").alias("c_ab"))
    npairs = pc.select(F.sum("c_ab").alias("n_pairs"))
    cf = toks.groupBy("term").agg(F.count("*").alias("cf"))
    ntok = cf.select(F.sum("cf").alias("n_tok"))
    scored = (
        pc.filter(F.col("c_ab") >= PMI_MINC)
        .join(cf.select(F.col("term").alias("ta"), F.col("cf").alias("cf_a")), "ta")
        .join(cf.select(F.col("term").alias("tb"), F.col("cf").alias("cf_b")), "tb")
        .crossJoin(F.broadcast(npairs))
        .crossJoin(F.broadcast(ntok))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("n_pairs"))
                    / ((F.col("cf_a") / F.col("n_tok")) * (F.col("cf_b") / F.col("n_tok")))
                ),
                6,
            ),
        )
        .select("ta", "tb", "c_ab", "cf_a", "cf_b", "pmi")
    )
    top = scored.orderBy(
        F.col("pmi").desc(), F.col("ta").asc(), F.col("tb").asc()
    ).limit(PMI_TOPN)
    wr = W.orderBy(F.col("pmi").desc(), F.col("ta").asc(), F.col("tb").asc())
    return top.withColumn("rk", F.row_number().over(wr)).select(
        "rk", "ta", "tb", "c_ab", "pmi"
    )


SQL_COOCCUR_PMI = f"""
WITH toks AS ({SQL_DOC_TOKS}),
pairs AS (
  SELECT a.term AS ta, b.term AS tb
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id
             AND b.pos > a.pos AND b.pos <= a.pos + {PMI_DIST}
),
pc AS (
  SELECT ta, tb, CAST(count(*) AS BIGINT) AS c_ab FROM pairs GROUP BY ta, tb
),
npairs AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_pairs FROM pc),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks GROUP BY term),
ntok AS (SELECT CAST(sum(cf) AS BIGINT) AS n_tok FROM cf),
scored AS (
  SELECT pc.ta, pc.tb, pc.c_ab,
         round(ln((pc.c_ab * 1.0 / np.n_pairs)
                / ((ca.cf * 1.0 / nt.n_tok) * (cb.cf * 1.0 / nt.n_tok))), 6)
           AS pmi
  FROM pc
  JOIN cf ca ON ca.term = pc.ta
  JOIN cf cb ON cb.term = pc.tb
  CROSS JOIN npairs np CROSS JOIN ntok nt
  WHERE pc.c_ab >= {PMI_MINC}
)
SELECT CAST(row_number() OVER (ORDER BY pmi DESC, ta ASC, tb ASC) AS INT) AS rk,
       ta, tb, c_ab, pmi
FROM scored
ORDER BY rk LIMIT {PMI_TOPN}
"""


QUERIES = {
    "ft_snippet_topk": (ft_snippet_topk, SQL_SNIPPET_TOPK),
    "ft_keyword_extract": (ft_keyword_extract, SQL_KEYWORD_EXTRACT),
    "ft_cooccur_pmi": (ft_cooccur_pmi, SQL_COOCCUR_PMI),
}


# ---------------------------------------------------- hybrid RRF retrieval

# Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09): the
# standard way modern search stacks combine a sparse (BM25) and a dense
# (embedding-cosine) retriever without score calibration. Each doc's fused
# score sums 1/(K + rank) over the lists that retrieved it (union
# semantics: one-list docs keep their single term).
#
# Scale shape: each leg is the repo's existing ranked retriever — the
# sparse leg is the shared BM25-OR kernel (TakeOrdered-style rank <= N),
# the dense leg is cosine vs the query vector (the labeled brute-force
# baseline here; the IVF/LSH operators are the candidate-generation scale
# path and plug in unchanged since fusion only consumes (doc, rank)). The
# fusion itself is a full-outer join of two <=N-row frames — negligible.

RRF_K = 60
RRF_N = 50   # depth of each retriever's list
RRF_TOPN = 20
RRF_QID = 0  # the dense leg's query vector


def hybrid_rrf_topk(spark, sf_dir):
    from harvester_spark.operators.fulltext_queries import bm25_or_scored
    from harvester_spark.operators.similarity import _pairwise_cosine

    # each leg: distributed TakeOrderedAndProject to N rows FIRST, then a
    # window over the N survivors only (the _ranked_top10 pattern — a global
    # row_number before the limit would single-partition the whole corpus)
    wb = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bm = (
        bm25_or_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(RRF_N)
        .withColumn("r_bm", F.row_number().over(wb))
        .select("doc_id", "r_bm")
    )
    wc = W.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    cs = (
        _pairwise_cosine(spark, sf_dir)
        .filter(F.col("qid") == RRF_QID)
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(RRF_N)
        .withColumn("r_cos", F.row_number().over(wc))
        .select(F.col("vec_id").alias("doc_id"), "r_cos")
    )
    fused = bm.join(cs, "doc_id", "full").withColumn(
        "rrf",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_bm")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_cos")), F.lit(0.0)),
            6,
        ),
    )
    top = fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(RRF_TOPN)
    wr = W.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "doc_id", "rrf", "r_bm", "r_cos"
    )


def _sql_hybrid_rrf() -> str:
    from harvester_spark.operators.similarity import _SQL_PAIRWISE

    return f"""
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
),
bm AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS r_bm
  FROM scored QUALIFY r_bm <= {RRF_N}
),
{_SQL_PAIRWISE},
cosr AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS r_cos
  FROM cosine WHERE qid = {RRF_QID} QUALIFY r_cos <= {RRF_N}
),
fused AS (
  SELECT doc_id, bm.r_bm, cosr.r_cos,
         round(coalesce(1.0 / ({RRF_K} + bm.r_bm), 0)
             + coalesce(1.0 / ({RRF_K} + cosr.r_cos), 0), 6) AS rrf
  FROM bm FULL JOIN cosr USING (doc_id)
)
SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank,
       doc_id, rrf, r_bm, r_cos
FROM fused
ORDER BY rank LIMIT {RRF_TOPN}
"""


QUERIES["hybrid_rrf_topk"] = (hybrid_rrf_topk, _sql_hybrid_rrf())


# ------------------------------------------- Dunning LLR collocations
# Dunning (1993) log-likelihood-ratio collocations over ADJACENT bigrams —
# the significance-test complement to ft_cooccur_pmi (PMI over-rewards
# rare pairs; LLR is the 2x2 contingency G-test that stays calibrated at
# low counts, which is why Lucene's significant_terms offers it as a
# heuristic). Counts are the exact integer contingency table per bigram:
# k11 = c(w1 w2), k12 = c1 - k11, k21 = c2 - k11, k22 = N - c1 - c2 + k11,
# with c1/c2 the LEFT/RIGHT positional unigram marginals (so every row of
# the table is nonnegative by construction). The ONLY float is the final
# G = 2 * sum(xlx) evaluated through one shared expression string on
# identical integers (micro floor idiom) — the ft_bigram_lm_logprob
# contract.
#
# Scale shape: bigrams from one array transform (zero extra shuffle over
# the token scan), one (w1, w2) groupBy with map-side combine, two
# marginal aggs joined back by key, 1-row total broadcast, TakeOrdered
# tail. No driver vocabulary, no cartesian.

LLR_TOPN = 100
LLR_MINC = 3

_XLX = "(CASE WHEN {x} = 0 THEN 0.0e0 ELSE CAST({x} AS DOUBLE) * ln(CAST({x} AS DOUBLE)) END)"


def _llr_expr() -> str:
    g = (
        "(2.0e0 * ("
        + " + ".join(
            _XLX.format(x=x)
            for x in ("k11", "k12", "k21", "k22", "nn")
        )
        + " - "
        + " - ".join(_XLX.format(x=x) for x in ("c1", "(nn - c1)", "c2", "(nn - c2)"))
        + "))"
    )
    # G >= 0 up to float rounding; clamp the floor at zero like the
    # micro-nat idiom (negatives here are pure rounding dust).
    return (
        f"CAST(greatest(floor({g} * 1.0e6 + 0.5e0), 0.0e0) AS BIGINT)"
    )


def ft_llr_collocations(spark, sf_dir):
    """(rnk, w1, w2, k11, c1, c2, nn, llr_micro): top-{LLR_TOPN} adjacent
    bigrams by Dunning log-likelihood ratio (min count {LLR_MINC})."""
    toks = doc_tokens(spark, sf_dir)
    a = toks.select("doc_id", F.col("pos").alias("apos"), F.col("term").alias("w1"))
    b = toks.select(
        F.col("doc_id").alias("db"), F.col("pos").alias("bpos"),
        F.col("term").alias("w2"),
    )
    bg = a.join(
        b,
        (F.col("doc_id") == F.col("db")) & (F.col("bpos") == F.col("apos") + 1),
    ).select("w1", "w2")
    pc = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("k11"))
    left = pc.groupBy("w1").agg(F.sum("k11").cast("long").alias("c1"))
    right = pc.groupBy("w2").agg(F.sum("k11").cast("long").alias("c2"))
    nn = F.broadcast(pc.agg(F.sum("k11").cast("long").alias("nn")))
    scored = (
        pc.filter(F.col("k11") >= LLR_MINC)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(nn)
        .select(
            "w1", "w2", "k11", "c1", "c2", "nn",
            F.expr("CAST(c1 - k11 AS BIGINT)").alias("k12"),
            F.expr("CAST(c2 - k11 AS BIGINT)").alias("k21"),
            F.expr("CAST(nn - c1 - c2 + k11 AS BIGINT)").alias("k22"),
        )
        .select(
            "w1", "w2", "k11", "c1", "c2", "nn",
            F.expr(_llr_expr()).alias("llr_micro"),
        )
    )
    wr = W.orderBy(F.col("llr_micro").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        scored.orderBy(
            F.col("llr_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(LLR_TOPN)
        .withColumn("rnk", F.row_number().over(wr).cast("long"))
        .select("rnk", "w1", "w2", "k11", "c1", "c2", "nn", "llr_micro")
    )


def _sql_llr() -> str:
    return f"""
WITH toks AS ({SQL_DOC_TOKS}),
bg AS (
  SELECT a.term AS w1, b.term AS w2
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
pc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11 FROM bg GROUP BY 1, 2
),
lft AS (SELECT w1, CAST(sum(k11) AS BIGINT) AS c1 FROM pc GROUP BY 1),
rgt AS (SELECT w2, CAST(sum(k11) AS BIGINT) AS c2 FROM pc GROUP BY 1),
tot AS (SELECT CAST(sum(k11) AS BIGINT) AS nn FROM pc),
tab AS (
  SELECT w1, w2, k11, c1, c2, nn,
         CAST(c1 - k11 AS BIGINT) AS k12,
         CAST(c2 - k11 AS BIGINT) AS k21,
         CAST(nn - c1 - c2 + k11 AS BIGINT) AS k22
  FROM pc JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
  WHERE k11 >= {LLR_MINC}
),
scored AS (
  SELECT w1, w2, k11, c1, c2, nn, {_llr_expr()} AS llr_micro FROM tab
)
SELECT CAST(row_number() OVER (ORDER BY llr_micro DESC, w1 ASC, w2 ASC)
            AS BIGINT) AS rnk,
       w1, w2, k11, c1, c2, nn, llr_micro
FROM scored
ORDER BY llr_micro DESC, w1 ASC, w2 ASC
LIMIT {LLR_TOPN}
"""


QUERIES["ft_llr_collocations"] = (ft_llr_collocations, _sql_llr())


# ------------------------------------------------------------ readability

# Flesch reading ease + Flesch-Kincaid grade level — the readability
# signals a curation pipeline buckets web text by (next to the Gopher /
# quality-score rules this module's siblings implement). Both formulas
# need (words, sentences, syllables); on this corpus:
# - words = analyzer token count (the repo-wide ASCII \\W+ contract),
# - syllables = ASCII vowel-group runs [aeiou]+ (the standard heuristic),
# - sentences: the word-soup corpus has NO punctuation, so sentence
#   boundaries are SYNTHESIZED as occurrences of the stop token 'the'
#   plus one — a per-doc count that genuinely varies (the corpus-synthesis
#   non-degeneracy rule: a constant S would collapse the W/S term for
#   every doc and the gate would prove nothing).
#
# Exactness: both formulas are integer milli via round-half-up integer
# division on nonnegative counts ((num + den DIV 2) DIV den — identical
# in Spark DIV and DuckDB //); flesch_milli may legitimately go negative
# for long-run docs (it is 206835 minus two nonneg terms).
#
# Scale shape: one token groupBy per doc (shared shape with dl) plus a
# map-only regexp count on the raw text — no joins beyond doc_id.

_FLESCH_T1 = "((1015 * n_words + n_sents DIV 2) DIV n_sents)"
_FLESCH_T2 = "((84600 * n_syll + n_words DIV 2) DIV n_words)"
_FK_T1 = "((390 * n_words + n_sents DIV 2) DIV n_sents)"
_FK_T2 = "((11800 * n_syll + n_words DIV 2) DIV n_words)"


def ft_readability(spark, sf_dir):
    """(doc_id, n_words, n_sents, n_syll, flesch_milli, fk_grade_milli):
    Flesch reading ease and Flesch-Kincaid grade per document."""
    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
    counts = toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        (F.sum((F.col("term") == "the").cast("long")) + 1)
        .cast("long")
        .alias("n_sents"),
    )
    syll = docs.select(
        "doc_id",
        F.expr("CAST(size(regexp_extract_all(lower(text), '[aeiou]+', 0)) AS BIGINT)")
        .alias("n_syll"),
    )
    return (
        counts.join(syll, "doc_id")
        .withColumn(
            "flesch_milli",
            F.expr(f"CAST(206835 - {_FLESCH_T1} - {_FLESCH_T2} AS BIGINT)"),
        )
        .withColumn(
            "fk_grade_milli",
            F.expr(f"CAST({_FK_T1} + {_FK_T2} - 15590 AS BIGINT)"),
        )
        .select(
            "doc_id", "n_words", "n_sents", "n_syll",
            "flesch_milli", "fk_grade_milli",
        )
    )


SQL_READABILITY = f"""
WITH toks AS ({SQL_DOC_TOKS}),
counts AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN term = 'the' THEN 1 ELSE 0 END) + 1 AS BIGINT)
           AS n_sents
  FROM toks GROUP BY doc_id
),
syll AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)
           AS n_syll
  FROM documents
)
SELECT doc_id, n_words, n_sents, n_syll,
       CAST(206835 - {_FLESCH_T1.replace("DIV", "//")}
            - {_FLESCH_T2.replace("DIV", "//")} AS BIGINT) AS flesch_milli,
       CAST({_FK_T1.replace("DIV", "//")} + {_FK_T2.replace("DIV", "//")}
            - 15590 AS BIGINT) AS fk_grade_milli
FROM counts JOIN syll USING (doc_id)
"""

QUERIES["ft_readability"] = (ft_readability, SQL_READABILITY)


# -------------------------------------------------------- word segmentation

# Run-on query segmentation (the "didyoumean" → "did you mean" surface;
# Norvig's unigram-LM segmenter, *Beautiful Data* 2009, restricted to the
# one-split case a search box actually hits — two words typed without the
# space). Queries are SYNTHESIZED with planted truth: the corpus'
# top-{SEG_Q} bigrams concatenated (runon = t1||t2, true split =
# len(t1)); the segmenter must recover the split from the unigram LM
# alone. Every candidate split s scores lp(w1) + lp(w2) with lp =
# round(1e6·ln(cu/ct)) micro-nats for in-vocab words (the
# ft_bigram_lm_logprob float-string contract) and a fixed
# length-penalized OOV floor (−10e6 − len·1e6 — any all-vocab split
# dominates); best split = max score, tie s asc.
#
# Recovery is NOT guaranteed by construction — a competing split into two
# higher-mass vocab words can legitimately win — which is what makes the
# recovery-rate guard meaningful.
#
# Scale shape: candidates = |queries| × word length (bounded explode);
# two broadcast joins against the vocab histogram; one per-query argmin
# window. Nothing corpus-sized beyond the one vocab scan.

SEG_Q = 12
_SEG_LP = "CAST(round(1000000.0e0 * ln(CAST({cu} AS DOUBLE) / {ct}), 0) AS BIGINT)"


def ft_word_segment(spark, sf_dir):
    """(runon, true_split, best_split, recovered, best_score_micro):
    unigram-LM one-split segmentation of planted run-on bigrams."""
    toks = doc_tokens(spark, sf_dir)
    wd = W.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        F.lag("term").over(wd).alias("t1"), F.col("term").alias("t2")
    ).filter(F.col("t1").isNotNull())
    top_bi = (
        pairs.groupBy("t1", "t2")
        .agg(F.count("*").alias("cfb"))
        .orderBy(F.col("cfb").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(SEG_Q)
        .select(
            F.concat("t1", "t2").alias("runon"),
            F.length("t1").cast("long").alias("true_split"),
        )
    )
    vocab = toks.groupBy("term").agg(F.count("*").cast("long").alias("cu"))
    ct_df = F.broadcast(toks.agg(F.count("*").cast("long").alias("ct")))
    cand = top_bi.select(
        "runon",
        "true_split",
        F.explode(F.sequence(F.lit(1), F.length("runon") - 1)).alias("s"),
    ).select(
        "runon",
        "true_split",
        "s",
        F.expr("substring(runon, 1, s)").alias("w1"),
        F.expr("substring(runon, s + 1, length(runon) - s)").alias("w2"),
    )
    v1 = vocab.select(F.col("term").alias("w1"), F.col("cu").alias("cu1"))
    v2 = vocab.select(F.col("term").alias("w2"), F.col("cu").alias("cu2"))
    scored = (
        cand.join(F.broadcast(v1), "w1", "left")
        .join(F.broadcast(v2), "w2", "left")
        .crossJoin(ct_df)
        .withColumn(
            "lp1",
            F.expr(
                f"CASE WHEN cu1 IS NULL THEN -10000000 - length(w1) * 1000000"
                f" ELSE {_SEG_LP.format(cu='cu1', ct='ct')} END"
            ),
        )
        .withColumn(
            "lp2",
            F.expr(
                f"CASE WHEN cu2 IS NULL THEN -10000000 - length(w2) * 1000000"
                f" ELSE {_SEG_LP.format(cu='cu2', ct='ct')} END"
            ),
        )
        .withColumn("score", F.expr("CAST(lp1 + lp2 AS BIGINT)"))
    )
    wq = W.partitionBy("runon").orderBy(F.col("score").desc(), F.col("s").asc())
    best = scored.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") == 1
    )
    return best.select(
        "runon",
        "true_split",
        F.col("s").alias("best_split"),
        (F.col("s") == F.col("true_split")).cast("long").alias("recovered"),
        F.col("score").alias("best_score_micro"),
    )


SQL_WORD_SEGMENT = f"""
WITH toks AS ({SQL_DOC_TOKS}),
pairs AS (
  SELECT t1, term AS t2 FROM (
    SELECT term, lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
    FROM toks
  ) WHERE t1 IS NOT NULL
),
top_bi AS (
  SELECT t1 || t2 AS runon, CAST(length(t1) AS BIGINT) AS true_split
  FROM (
    SELECT t1, t2, count(*) AS cfb FROM pairs GROUP BY 1, 2
    ORDER BY cfb DESC, t1 ASC, t2 ASC LIMIT {SEG_Q}
  )
),
vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY term),
ctt AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
cand AS (
  SELECT runon, true_split, CAST(s AS BIGINT) AS s,
         substring(runon, 1, s) AS w1,
         substring(runon, s + 1, length(runon) - s) AS w2
  FROM top_bi
  CROSS JOIN LATERAL (SELECT unnest(range(1, length(runon))) AS s)
),
scored AS (
  SELECT runon, true_split, s,
         CAST((CASE WHEN v1.cu IS NULL
               THEN -10000000 - length(w1) * 1000000
               ELSE {_SEG_LP.format(cu='v1.cu', ct='ct')} END)
            + (CASE WHEN v2.cu IS NULL
               THEN -10000000 - length(w2) * 1000000
               ELSE {_SEG_LP.format(cu='v2.cu', ct='ct')} END) AS BIGINT)
           AS score
  FROM cand
  LEFT JOIN vocab v1 ON v1.term = cand.w1
  LEFT JOIN vocab v2 ON v2.term = cand.w2
  CROSS JOIN ctt
)
SELECT runon, true_split, s AS best_split,
       CAST((s = true_split) AS BIGINT) AS recovered,
       score AS best_score_micro
FROM (
  SELECT *, row_number() OVER (PARTITION BY runon
                               ORDER BY score DESC, s ASC) AS rn
  FROM scored
) WHERE rn = 1
"""

QUERIES["ft_word_segment"] = (ft_word_segment, SQL_WORD_SEGMENT)


# ---------------------------------------------- vocabulary richness (Yule)

# Yule's characteristic K (Yule 1944), Simpson's D, and Guiraud's R per
# language — the classical vocabulary-richness triple a corpus auditor
# reads next to heaps_law_fit / ft_zipf_slope / ft_lexical_diversity.
# K = 10^4·(Σ_t cf_t² − N)/N² (length-robust repeat-rate), D =
# Σ_t cf_t(cf_t−1)/(N(N−1)) (probability two random tokens are the same
# type), R = V/√N. The spine is ONE per-(lang, term) cf agg; the three
# statistics are map-only arithmetic over its per-lang rollup.
#
# Determinism: Σcf² and Σcf(cf−1) are exact BIGINTs; the final ratios
# divide those BIGINTs in DOUBLE inside shared strings (identical IEEE op
# order both engines; N² ≤ 2^53 at every test SF) and round to fixed
# micro/milli units. sqrt is IEEE-correctly-rounded in both engines, so
# the Guiraud string is exact-reproducible too.

_YULE_K = "CAST(round(1.0e10 * (s2 - n) / (1.0e0 * n * n), 0) AS BIGINT)"
_SIMPSON_D = "CAST(round(1.0e6 * sd / (1.0e0 * n * (n - 1)), 0) AS BIGINT)"
_GUIRAUD_R = "CAST(round(1000.0e0 * v / sqrt(1.0e0 * n), 0) AS BIGINT)"


def ft_yule_k(spark, sf_dir):
    """(lang, n_tokens, n_types, yule_k_micro, simpson_d_micro,
    guiraud_r_milli): vocabulary-richness statistics per language.

    Scale shape: the cf agg is the same map-side-combinable
    (lang, term) shuffle every dictionary build already pays; the rollup
    is one map-only projection per language — no second shuffle, no
    driver materialization of the vocabulary.
    """
    toks = doc_tokens(spark, sf_dir)
    cf = toks.groupBy("lang", "term").agg(
        F.count("*").cast("long").alias("cf")
    )
    per_lang = cf.groupBy("lang").agg(
        F.sum("cf").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.col("cf") * F.col("cf")).cast("long").alias("s2"),
        F.sum(F.col("cf") * (F.col("cf") - F.lit(1)))
        .cast("long")
        .alias("sd"),
    )
    return (
        per_lang.select(
            "lang",
            F.col("n").alias("n_tokens"),
            F.col("v").alias("n_types"),
            F.expr(_YULE_K).alias("yule_k_micro"),
            F.expr(_SIMPSON_D).alias("simpson_d_micro"),
            F.expr(_GUIRAUD_R).alias("guiraud_r_milli"),
        )
        .orderBy("lang")
    )


SQL_YULE_K = f"""
WITH toks AS ({SQL_DOC_TOKS}),
cfs AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS cf
  FROM toks GROUP BY 1, 2
),
per_lang AS (
  SELECT lang,
         CAST(sum(cf) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS v,
         CAST(sum(cf * cf) AS BIGINT) AS s2,
         CAST(sum(cf * (cf - 1)) AS BIGINT) AS sd
  FROM cfs GROUP BY 1
)
SELECT lang, n AS n_tokens, v AS n_types,
       {_YULE_K} AS yule_k_micro,
       {_SIMPSON_D} AS simpson_d_micro,
       {_GUIRAUD_R} AS guiraud_r_milli
FROM per_lang
ORDER BY lang
"""

QUERIES["ft_yule_k"] = (ft_yule_k, SQL_YULE_K)


# ----------------------------------------------- log-likelihood keyness

# Rayson & Garside (2000) corpus-comparison keyness — the ACROSS-corpora
# sibling of ft_llr_collocations (which scores within-window
# collocations): for each term, the G² log-likelihood of its frequency
# in corpus A (the 'en' documents) vs corpus B (the rest),
#   G² = 2·[a·ln(a/E_a) + b·ln(b/E_b)],  E_x = N_x·(a+b)/(N_A+N_B)
# signed by the direction of preference (positive = A-keyed, by the
# exact integer cross-comparison a·N_B vs b·N_A). Zero counts take the
# x·ln(x) → 0 limit explicitly, exercised for real (see below).
#
# The natural vocabulary is NEARLY BALANCED across languages (the
# word-soup generator draws terms independently of lang — max natural
# G² ≈ 2.5, below the 3.84 significance line: a true negative control,
# kept in the output). So the token stream is EXTENDED with planted
# per-doc pseudo-terms that give keyness real structure to find
# (the vocab_oov_holdout discipline):
#   kwen  — every 'en' doc        (fully A-keyed; exercises b = 0)
#   kwoth — every non-'en' doc    (fully B-keyed; exercises a = 0)
#   kwskew — every 'en' doc + an md5-half of the others (partial skew,
#            both counts nonzero)
#   kwmix — every doc             (balanced planted control)
# The pytest pins the sign/magnitude pattern: kwen ≫ 0 > kwoth, the
# planted skew lands between, the balanced plant and every natural term
# stay below significance.
#
# Determinism: counts are exact BIGINTs; G² goes through ONE shared
# float string on identical integers with the sign-split micro floor.
#
# Scale shape: one token scan + one planted map-only union + one
# groupBy(term) carrying both corpus counts on the same shuffle; totals
# broadcast. Output is vocabulary-sized.

KEY_SIG_MICRO = 3_841_000  # chi² (1 df, p=0.05) in micro units

_KEY_G2 = (
    "(2.0e0 * ((CASE WHEN a > 0 THEN a * ln((a * (na + nb))"
    " / (1.0e0 * na * (a + b))) ELSE 0.0e0 END)"
    " + (CASE WHEN b > 0 THEN b * ln((b * (na + nb))"
    " / (1.0e0 * nb * (a + b))) ELSE 0.0e0 END)))"
)
_KEY_SIGNED = (
    f"CASE WHEN a * nb >= b * na"
    f" THEN CAST(floor({_KEY_G2} * 1.0e6 + 0.5e0) AS BIGINT)"
    f" ELSE CAST(-floor({_KEY_G2} * 1.0e6 + 0.5e0) AS BIGINT) END"
)


def ft_keyness_llr(spark, sf_dir):
    """(term, a_cf, b_cf, keyness_micro, significant): signed G²
    keyness of every term (incl. the planted tail) between the 'en'
    subcorpus and the rest."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("is_en")),
        "doc_id",
    ).select("is_en", "term")
    half = (
        _hash56(F.concat(F.lit("kw|"), F.col("doc_id").cast("string"))) % 2
        == 0
    )
    planted = (
        docs.select(
            (F.col("lang") == "en").alias("is_en"),
            F.expr(
                "CASE WHEN lang = 'en' THEN 'kwen' ELSE 'kwoth' END"
            ).alias("t1"),
            F.when((F.col("lang") == "en") | half, F.lit("kwskew")).alias(
                "t2"
            ),
            F.lit("kwmix").alias("t3"),
        )
        .select(
            "is_en",
            F.explode(
                F.array_compact(F.array("t1", "t2", "t3"))
            ).alias("term"),
        )
    )
    allt = toks.unionByName(planted)
    counts = allt.groupBy("term").agg(
        F.sum(F.col("is_en").cast("long")).cast("long").alias("a"),
        F.sum((~F.col("is_en")).cast("long")).cast("long").alias("b"),
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("a").cast("long").alias("na"),
            F.sum("b").cast("long").alias("nb"),
        )
    )
    return counts.crossJoin(tot).select(
        "term",
        F.col("a").alias("a_cf"),
        F.col("b").alias("b_cf"),
        F.expr(_KEY_SIGNED).alias("keyness_micro"),
        F.expr(f"abs({_KEY_SIGNED}) >= {KEY_SIG_MICRO}").alias(
            "significant"
        ),
    )


def _sql_keyness() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col="'kw|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH toks AS (
  SELECT (d.lang = 'en') AS is_en, t.term
  FROM ({SQL_DOC_TOKS}) t JOIN documents d USING (doc_id)
),
planted AS (
  SELECT (lang = 'en') AS is_en, unnest(
    list_filter([
      CASE WHEN lang = 'en' THEN 'kwen' ELSE 'kwoth' END,
      CASE WHEN lang = 'en' OR {h} % 2 = 0 THEN 'kwskew' END,
      'kwmix'
    ], x -> x IS NOT NULL)
  ) AS term
  FROM documents
),
allt AS (
  SELECT * FROM toks UNION ALL SELECT * FROM planted
),
counts AS (
  SELECT term,
         CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM allt GROUP BY 1
),
tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
  FROM counts
)
SELECT term, a AS a_cf, b AS b_cf,
       {_KEY_SIGNED} AS keyness_micro,
       abs({_KEY_SIGNED}) >= {KEY_SIG_MICRO} AS significant
FROM counts CROSS JOIN tot
"""


QUERIES["ft_keyness_llr"] = (ft_keyness_llr, _sql_keyness())


# ------------------------------------------------ DP corpus dispersion

# Gries (2008) "Deviation of Proportions" — the corpus-linguistics
# dispersion measure the burstiness/keyness family was missing: how
# evenly a term spreads across corpus PARTS (sources here), vs how big
# the parts are:
#   DP = ½ · Σ_i |v_i − s_i|,  v_i = part's share of the term's
#   occurrences, s_i = part's share of all tokens
# (0 = perfectly proportional, → 1 = concentrated in one part). Exact
# integer form over the common denominator: with c_i the term's count
# in part i (total C) and t_i the part's token count (total T),
#   DP = Σ_i |c_i·T − t_i·C| / (2·C·T)
# — numerator and denominator exact int64 (c·T ≤ 10⁴·10⁵ at sf0.1,
# headroom documented), reported as a floored milli quotient plus the
# raw rational. Terms ordered by dispersion give the
# boilerplate-vs-bursty split a curation pipeline keys on.
#
# Scale shape: one (part, term) count + one part-size count — both
# map-side-combinable aggs on the same token scan; the |·| fold is a
# term-keyed sum. Output is vocabulary-sized.


def ft_dispersion_dp(spark, sf_dir):
    """(term, cf, dp_num, dp_den, dp_milli): Gries DP dispersion of
    every term across the source parts, exact integer rational."""
    toks = (
        doc_tokens(spark, sf_dir)
        .join(
            load(spark, sf_dir, "documents").select("doc_id", "source"),
            "doc_id",
        )
        .select("source", "term")
    )
    parts = toks.groupBy("source").agg(
        F.count("*").cast("long").alias("t_i")
    )
    tt = F.broadcast(parts.agg(F.sum("t_i").cast("long").alias("tt")))
    ct = toks.groupBy("source", "term").agg(
        F.count("*").cast("long").alias("c_i")
    )
    cf = ct.groupBy("term").agg(F.sum("c_i").cast("long").alias("cf"))
    # dense (term × part) grid: parts where the term is absent still
    # contribute |0 − s_i|
    grid = (
        cf.crossJoin(F.broadcast(parts))
        .join(ct, ["term", "source"], "left")
        .select(
            "term",
            "cf",
            "t_i",
            F.coalesce("c_i", F.lit(0)).cast("long").alias("c_i"),
        )
    )
    num = (
        grid.crossJoin(tt)
        .select(
            "term",
            "cf",
            F.abs(F.col("c_i") * F.col("tt") - F.col("t_i") * F.col("cf"))
            .cast("long")
            .alias("a"),
        )
        .groupBy("term", "cf")
        .agg(F.sum("a").cast("long").alias("dp_num"))
    )
    return num.crossJoin(tt).select(
        "term",
        "cf",
        "dp_num",
        (2 * F.col("cf") * F.col("tt")).cast("long").alias("dp_den"),
        F.expr(
            "CAST((1000 * dp_num) DIV (2 * cf * tt) AS BIGINT)"
        ).alias("dp_milli"),
    )


SQL_DISPERSION_DP = f"""
WITH toks AS (
  SELECT d.source, t.term
  FROM ({SQL_DOC_TOKS}) t JOIN documents d USING (doc_id)
),
parts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS t_i FROM toks GROUP BY 1
),
tt AS (SELECT CAST(sum(t_i) AS BIGINT) AS tt FROM parts),
ct AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c_i
  FROM toks GROUP BY 1, 2
),
cf AS (SELECT term, CAST(sum(c_i) AS BIGINT) AS cf FROM ct GROUP BY 1),
grid AS (
  SELECT f.term, f.cf, p.t_i, CAST(coalesce(c.c_i, 0) AS BIGINT) AS c_i
  FROM cf f CROSS JOIN parts p
  LEFT JOIN ct c ON c.term = f.term AND c.source = p.source
),
num AS (
  SELECT term, cf,
         CAST(sum(abs(c_i * (SELECT tt FROM tt) - t_i * cf)) AS BIGINT)
           AS dp_num
  FROM grid GROUP BY 1, 2
)
SELECT term, cf, dp_num,
       CAST(2 * cf * (SELECT tt FROM tt) AS BIGINT) AS dp_den,
       CAST((1000 * dp_num) // (2 * cf * (SELECT tt FROM tt)) AS BIGINT)
         AS dp_milli
FROM num
"""

QUERIES["ft_dispersion_dp"] = (ft_dispersion_dp, SQL_DISPERSION_DP)


# ---------------------------------------------- TextTiling segmentation

# Hearst (1997) TextTiling — discourse/topic segmentation, the family
# (snippets, keywords, collocations, dispersion) was missing: slide two
# adjacent TT_W-token windows across the stream and place a boundary at
# the lexical-cohesion VALLEY (adjacent windows sharing few tokens).
# The word-soup corpus has flat cohesion (no real topics — segmentation
# would be degenerate), so every doc gets a PLANTED two-topic pseudo
# stream: TT_LEN tokens, topic A vocabulary before a hash-chosen
# boundary b ∈ [{TT_W}, {TT_LEN - TT_W}], topic B after — the detector
# must RECOVER b (the planted-recovery discipline; ≥ 80% of docs within
# ±2 is the pytest pin, and the synthesis is non-degenerate because
# both vocabularies are 8-way draws, not constants).
#
# Cohesion is the exact integer multiset overlap Σ_t min(c_left(t),
# c_right(t)) (the cosine numerator without floats); detected boundary
# = argmin over gap positions (tie: position asc) — the valley pick of
# the simplified TextTiling (no smoothing pass; documented).
#
# Scale shape: the planted stream is a map-only explode; each gap's two
# windows come from ONE band join of token positions against the gap
# dimension (bounded: TT_LEN − 2·TT_W + 1 gaps/doc); counts and the min
# fold are map-side-combinable; argmin is a per-doc window.

TT_LEN = 48
TT_W = 8
TT_VOCAB = 8


def ft_texttiling_segment(spark, sf_dir):
    """(doc_id, planted_b, detected_b, valley_overlap, hit2): TextTiling
    valley boundary vs the planted topic switch, per document."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents").select("doc_id")
    nb = TT_LEN - 2 * TT_W  # boundary span width
    planted = docs.withColumn(
        "planted_b",
        (
            TT_W
            + _hash56(F.concat(F.lit("ttb|"), F.col("doc_id").cast("string")))
            % (nb + 1)
        ).cast("long"),
    ).cache()
    toks = planted.select(
        "doc_id",
        "planted_b",
        F.explode(F.sequence(F.lit(0), F.lit(TT_LEN - 1))).alias("i"),
    ).select(
        "doc_id",
        "planted_b",
        "i",
        F.expr(
            f"concat(CASE WHEN i < planted_b THEN 'a' ELSE 'b' END,"
            f" CAST(CAST(conv(substring(md5(concat('ttw|',"
            f" CAST(doc_id AS STRING), '|', CAST(i AS STRING))),"
            f" 1, 14), 16, 10) AS BIGINT) % {TT_VOCAB} AS STRING))"
        ).alias("tok"),
    )
    gaps = spark.range(TT_W, TT_LEN - TT_W + 1).select(
        F.col("id").cast("long").alias("g")
    )
    win = (
        toks.crossJoin(F.broadcast(gaps))
        .filter(
            (F.col("i") >= F.col("g") - TT_W) & (F.col("i") < F.col("g") + TT_W)
        )
        .withColumn("side", (F.col("i") < F.col("g")).cast("int"))
        .groupBy("doc_id", "planted_b", "g", "tok")
        .agg(
            F.sum(F.col("side")).cast("long").alias("cl"),
            F.sum(1 - F.col("side")).cast("long").alias("cr"),
        )
    )
    overlap = win.groupBy("doc_id", "planted_b", "g").agg(
        F.sum(F.least("cl", "cr")).cast("long").alias("ov")
    )
    wmin = W.partitionBy("doc_id").orderBy(F.col("ov").asc(), F.col("g").asc())
    return (
        overlap.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "planted_b",
            F.col("g").alias("detected_b"),
            F.col("ov").alias("valley_overlap"),
            (F.abs(F.col("g") - F.col("planted_b")) <= 2).alias("hit2"),
        )
    )


def _sql_texttiling() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    hb = _SQL_HASH56.format(col="'ttb|' || CAST(doc_id AS VARCHAR)")
    hw = _SQL_HASH56.format(
        col="'ttw|' || CAST(doc_id AS VARCHAR) || '|' || CAST(i AS VARCHAR)"
    )
    nb = TT_LEN - 2 * TT_W
    return f"""
WITH planted AS (
  SELECT doc_id,
         CAST({TT_W} + {hb} % {nb + 1} AS BIGINT) AS planted_b
  FROM documents
),
toks AS MATERIALIZED (
  SELECT doc_id, planted_b, CAST(i AS BIGINT) AS i,
         (CASE WHEN i < planted_b THEN 'a' ELSE 'b' END)
           || CAST({hw} % {TT_VOCAB} AS VARCHAR) AS tok
  FROM planted CROSS JOIN (SELECT unnest(range({TT_LEN})) AS i)
),
win AS (
  SELECT doc_id, planted_b, g, tok,
         CAST(sum(CASE WHEN i < g THEN 1 ELSE 0 END) AS BIGINT) AS cl,
         CAST(sum(CASE WHEN i >= g THEN 1 ELSE 0 END) AS BIGINT) AS cr
  FROM toks
  CROSS JOIN (SELECT CAST(unnest(range({TT_W}, {TT_LEN - TT_W + 1}))
                AS BIGINT) AS g)
  WHERE i >= g - {TT_W} AND i < g + {TT_W}
  GROUP BY 1, 2, 3, 4
),
overlap AS (
  SELECT doc_id, planted_b, g, CAST(sum(least(cl, cr)) AS BIGINT) AS ov
  FROM win GROUP BY 1, 2, 3
)
SELECT doc_id, planted_b, g AS detected_b, ov AS valley_overlap,
       abs(g - planted_b) <= 2 AS hit2
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY ov ASC, g ASC) AS rn
  FROM overlap
) WHERE rn = 1
"""


QUERIES["ft_texttiling_segment"] = (ft_texttiling_segment, _sql_texttiling())


# ---------------------------------------------- Condorcet rank fusion

# Montague & Aslam (CIKM 2002) Condorcet-fuse — the third fusion method
# beside hybrid_rrf_topk (reciprocal rank) and hybrid_combmnz_topk
# (score mass): documents are ordered by pairwise MAJORITY vote across
# rankers, realized deterministically as the Copeland score (number of
# pairwise wins; the paper's QuickSort-with-majority-comparator yields
# a Condorcet-consistent order, Copeland is its set-based twin —
# documented). The voters are three genuinely heterogeneous signals —
# the metasearch setting the method was built for: BM25 relevance, the
# document-length prior (the rank_feature family), and lexical
# diversity (distinct-term count). Candidates = the union of the three
# top-{CDC_K} lists; each voter ranks the WHOLE union (its signal is
# total), so no missing-rank convention is needed beyond BM25's
# score-0 floor.
#
# Determinism: per-voter ranks carry the (key desc, doc_id asc) total
# order; majority is an exact integer vote count over the bounded
# candidate-pair grid (≤ (3·K)², by construction); the fused order is
# (copeland desc, doc_id asc).
#
# Scale shape: three one-agg rankers + a union-bounded pair grid —
# nothing corpus-sized beyond the scans the rankers already make.

CDC_K = 20


def hybrid_condorcet_topk(spark, sf_dir):
    """(rank, doc_id, copeland_wins, r_bm25, r_len, r_div): top-10 by
    Copeland pairwise-majority fusion of BM25 / length-prior / lexical-
    diversity rankings over the union of their top-{CDC_K} lists."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ndist = (
        doc_tokens(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.countDistinct("term").cast("long").alias("ndist"))
    )
    bm = bm25_or_scored(spark, sf_dir)
    feats = (
        docs.join(ndist, "doc_id", "left")
        .join(bm, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("score", F.lit(0.0)).alias("score"),
            "n_chars",
            F.coalesce("ndist", F.lit(0)).cast("long").alias("ndist"),
        )
        .cache()
    )

    def top(key_cols):
        return (
            feats.orderBy(*key_cols, F.col("doc_id").asc())
            .limit(CDC_K)
            .select("doc_id")
        )

    cand = (
        top([F.col("score").desc()])
        .union(top([F.col("n_chars").desc()]))
        .union(top([F.col("ndist").desc()]))
        .distinct()
    )
    cf = feats.join(cand, "doc_id", "left_semi")
    ranks = cf.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("r_bm25"),
        F.row_number()
        .over(W.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("r_len"),
        F.row_number()
        .over(W.orderBy(F.col("ndist").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("r_div"),
    ).cache()
    b = ranks.select(
        F.col("doc_id").alias("b_id"),
        F.col("r_bm25").alias("b1"),
        F.col("r_len").alias("b2"),
        F.col("r_div").alias("b3"),
    )
    wins = (
        ranks.crossJoin(b)
        .filter(F.col("doc_id") != F.col("b_id"))
        .select(
            "doc_id",
            (
                (F.col("r_bm25") < F.col("b1")).cast("int")
                + (F.col("r_len") < F.col("b2")).cast("int")
                + (F.col("r_div") < F.col("b3")).cast("int")
                >= 2
            ).cast("long").alias("win"),
        )
        .groupBy("doc_id")
        .agg(F.sum("win").cast("long").alias("copeland_wins"))
    )
    fused = wins.join(ranks, "doc_id")
    top10 = fused.orderBy(
        F.col("copeland_wins").desc(), F.col("doc_id").asc()
    ).limit(10)
    wr = W.orderBy(F.col("copeland_wins").desc(), F.col("doc_id").asc())
    return top10.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "doc_id", "copeland_wins", "r_bm25", "r_len", "r_div"
    )


def _sql_condorcet() -> str:
    terms = ", ".join(f"'{t}'" for t in ("key", "value", "table"))
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
  SELECT doc_id, round(sum(
    ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
    * (tf * 2.2e0)
    / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
  ), 6) AS score
  FROM qtf t JOIN qdf USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats GROUP BY doc_id
),
nd AS (
  SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS ndist
  FROM toks GROUP BY 1
),
feats AS MATERIALIZED (
  SELECT d.doc_id, coalesce(o.score, 0.0e0) AS score, d.n_chars,
         CAST(coalesce(nd.ndist, 0) AS BIGINT) AS ndist
  FROM documents d
  LEFT JOIN orsc o USING (doc_id)
  LEFT JOIN nd USING (doc_id)
),
cand AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT doc_id FROM feats ORDER BY score DESC, doc_id ASC LIMIT {CDC_K}
  ) UNION
  SELECT doc_id FROM (
    SELECT doc_id FROM feats ORDER BY n_chars DESC, doc_id ASC
    LIMIT {CDC_K}
  ) UNION
  SELECT doc_id FROM (
    SELECT doc_id FROM feats ORDER BY ndist DESC, doc_id ASC LIMIT {CDC_K}
  )
),
ranks AS MATERIALIZED (
  SELECT f.doc_id,
         CAST(row_number() OVER (ORDER BY f.score DESC, f.doc_id ASC)
              AS BIGINT) AS r_bm25,
         CAST(row_number() OVER (ORDER BY f.n_chars DESC, f.doc_id ASC)
              AS BIGINT) AS r_len,
         CAST(row_number() OVER (ORDER BY f.ndist DESC, f.doc_id ASC)
              AS BIGINT) AS r_div
  FROM feats f JOIN cand USING (doc_id)
),
wins AS (
  SELECT a.doc_id, CAST(sum(CASE WHEN
           (CASE WHEN a.r_bm25 < b.r_bm25 THEN 1 ELSE 0 END
            + CASE WHEN a.r_len < b.r_len THEN 1 ELSE 0 END
            + CASE WHEN a.r_div < b.r_div THEN 1 ELSE 0 END) >= 2
         THEN 1 ELSE 0 END) AS BIGINT) AS copeland_wins
  FROM ranks a JOIN ranks b ON a.doc_id <> b.doc_id
  GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY w.copeland_wins DESC,
         w.doc_id ASC) AS INT) AS rank,
       w.doc_id, w.copeland_wins, r.r_bm25, r.r_len, r.r_div
FROM wins w JOIN ranks r USING (doc_id)
ORDER BY w.copeland_wins DESC, w.doc_id ASC LIMIT 10
"""


QUERIES["hybrid_condorcet_topk"] = (hybrid_condorcet_topk, _sql_condorcet())
