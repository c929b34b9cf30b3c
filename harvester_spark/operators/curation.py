"""Corpus-curation operators: PII redaction, URL canonicalization + dedup,
Gopher-style absolute quality rules.

The training-pipeline steps that sit between raw crawl and dedup/selection
(C4 drops lines with PII-ish content, CCNet/RefinedWeb canonicalize URLs
before url-level dedup, Gopher applies absolute quality rules before any
ranking). Reference analogue: the harvester normalizes/validates URLs per
file (files/models/datatypes/file.py:158-166) and scrubs documents during
normalization; these operators generalize that to corpus scale.

Determinism: the ``documents`` table carries no PII or URLs, so — following
the ``_files`` precedent in file_metadata.py — each operator first SYNTHESIZES
its inputs deterministically from ``doc_id`` with expressions that are
byte-identical in Spark and DuckDB, then applies the real detection /
canonicalization logic. The logic under test is the regex/normalization
chain, which unit tests additionally exercise on crafted real-world strings
(tests/test_curation.py).

Scale notes (100 TB): all three are map-only per-doc passes (regex chains,
no shuffle) followed by at most one groupBy — pii_redact is pure map + no
agg, url dedup shuffles once on the canonical url (uniform by construction),
gopher_rules shuffles once on doc_id for the tf agg. No UDFs anywhere: every
expression is a JVM-side built-in inside whole-stage codegen.

Regex dialect: ASCII-only classes, no replacement groups, no backrefs —
the subset where Java regex (Spark) and RE2 (DuckDB) agree; DuckDB's
``regexp_replace`` needs the explicit ``'g'`` flag to match Spark's
replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from harvester_spark.analysis import tokens_column
from harvester_spark.operators.common import SQL_DOC_TOKS, SQL_TOKS, doc_tokens, load
from harvester_spark.operators.dedup import _SQL_HASH56, _hash56
from harvester_spark.operators.fulltext_queries import _EN_MARKERS, _sql_in

# ---------------------------------------------------------------- PII redact

RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE_PHONE = r"\+31[0-9]{9}"
RE_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _pages(spark, sf_dir) -> DataFrame:
    """documents + deterministically synthesized PII suffixes (doc_id-keyed,
    byte-identical to the oracle's CASE chain)."""
    docs = load(spark, sf_dir, "documents")
    email = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.org"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" call +316"),
            F.lpad((F.col("doc_id") % 100000000).cast("string"), 8, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.lit(" host 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.expr("doc_id DIV 256") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 200).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("page_text")
    )


_SQL_PAGES = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +316' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 200 AS VARCHAR)
                 ELSE '' END AS page_text
  FROM documents
"""


def redact_pii(df: DataFrame, col: str = "page_text") -> DataFrame:
    """Add pii counts + a redacted copy of ``col``. Redaction order is fixed
    (email, phone, ip) so both engines transform identically; patterns are
    disjoint on any one span, so order only matters for determinism."""
    c = F.col(col)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, RE_EMAIL, "<EMAIL>"), RE_PHONE, "<PHONE>"
        ),
        RE_IP,
        "<IP>",
    )
    return df.select(
        "*",
        F.size(F.regexp_extract_all(c, F.lit(RE_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(RE_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(c, F.lit(RE_IP), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        red.alias("redacted_text"),
    )


def pii_redact(spark, sf_dir) -> DataFrame:
    """Per-doc PII detection + redaction over the synthesized pages: match
    counts, redacted length and digest (the full redacted text stays in the
    pipeline; the digest is what the oracle hashes)."""
    pages = _pages(spark, sf_dir)
    r = redact_pii(pages, "page_text")
    return r.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        F.length("redacted_text").cast("long").alias("redacted_len"),
        F.md5("redacted_text").alias("redacted_digest"),
    )


SQL_PII_REDACT = f"""
WITH pages AS ({_SQL_PAGES}),
red AS (
  SELECT doc_id, page_text,
         regexp_replace(
           regexp_replace(
             regexp_replace(page_text, '{RE_EMAIL}', '<EMAIL>', 'g'),
             '{RE_PHONE}', '<PHONE>', 'g'),
           '{RE_IP}', '<IP>', 'g') AS redacted_text
  FROM pages
)
SELECT doc_id,
       CAST(len(regexp_extract_all(page_text, '{RE_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(page_text, '{RE_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(page_text, '{RE_IP}')) AS BIGINT) AS n_ips,
       CAST(length(redacted_text) AS BIGINT) AS redacted_len,
       md5(redacted_text) AS redacted_digest
FROM red
"""


# ------------------------------------------------- URL canonicalize + dedup

URL_BASES = 512  # distinct logical pages; ~4 decorated variants each


def _decorated_urls(spark, sf_dir) -> DataFrame:
    """Deterministic decorated-URL synthesis: four variants of the same
    logical page (host case, trailing slash, utm tracking params,
    scheme/www/fragment) keyed by doc_id. The base uses doc_id DIV 4 so it
    is INDEPENDENT of the variant selector (doc_id % 4) — with base =
    doc_id % URL_BASES and 4 | URL_BASES every base would map to exactly
    one variant and the cross-variant collapse would never occur on corpus
    data (the constant-column trap the gopher test warns about)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    base = (F.expr("doc_id DIV 4") % URL_BASES).cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("https://Example.org/a/"), base))
        .when(v == 1, F.concat(F.lit("https://example.org/a/"), base, F.lit("/")))
        .when(
            v == 2,
            F.concat(
                F.lit("https://example.org/a/"),
                base,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .otherwise(
            F.concat(F.lit("http://www.example.org/a/"), base, F.lit("#frag"))
        )
    )
    return docs.select("doc_id", url.alias("url"))


_SQL_URLS = f"""
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'https://Example.org/a/' || CAST((doc_id // 4) % {URL_BASES} AS VARCHAR)
           WHEN 1 THEN 'https://example.org/a/' || CAST((doc_id // 4) % {URL_BASES} AS VARCHAR) || '/'
           WHEN 2 THEN 'https://example.org/a/' || CAST((doc_id // 4) % {URL_BASES} AS VARCHAR)
                       || '?utm_source=feed&utm_campaign=x'
           ELSE 'http://www.example.org/a/' || CAST((doc_id // 4) % {URL_BASES} AS VARCHAR) || '#frag'
         END AS url
  FROM documents
"""


def canonicalize_url(df: DataFrame, col: str = "url") -> DataFrame:
    """Add a ``canonical_url`` column: scheme stripped, fragment stripped,
    utm_* params stripped (dangling separators cleaned), host lowercased and
    de-www'd, trailing path slash stripped. String-regex chain only — the
    same chain runs verbatim in the oracle."""
    s = F.regexp_replace(F.col(col), r"^https?://", "")
    s = F.regexp_replace(s, r"#.*$", "")
    # utm params must be matched AT a parameter boundary ([?&]) — an
    # unanchored utm_ pattern would eat the tail of legitimate params like
    # noutm_x=1. No replacement groups (Java $1 vs RE2 \1 differ), so the
    # boundary is handled in three passes: &-joined, ?-leading-with-next,
    # ?-leading-at-end.
    s = F.regexp_replace(s, r"&utm_[a-z]+=[^&]*", "")
    s = F.regexp_replace(s, r"\?utm_[a-z]+=[^&]*&", "?")
    s = F.regexp_replace(s, r"\?utm_[a-z]+=[^&]*$", "")
    s = F.regexp_replace(s, r"[?&]+$", "")
    stripped = df.withColumn("_stripped", s)
    host = F.regexp_extract(F.col("_stripped"), r"^[^/?#]+", 0)
    rest = F.col("_stripped").substr(F.length(host) + F.lit(1), F.lit(1 << 30))
    canon = F.concat(
        F.regexp_replace(F.lower(host), r"^www\.", ""),
        F.regexp_replace(rest, r"/$", ""),
    )
    return stripped.select(*df.columns, canon.alias("canonical_url"))


def url_canonical_dedup(spark, sf_dir) -> DataFrame:
    """Canonicalize the decorated URLs and group: each canonical page reports
    how many docs and how many distinct raw spellings collapsed onto it, plus
    the canonical (min) doc_id — the url-level dedup step CCNet/RefinedWeb
    run before any content dedup."""
    urls = canonicalize_url(_decorated_urls(spark, sf_dir))
    return urls.groupBy("canonical_url").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("url").alias("n_raw_variants"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


_SQL_CANON = """
  SELECT doc_id, url,
         regexp_replace(lower(regexp_extract(s, '^[^/?#]+')), '^www\\.', '', 'g')
         || regexp_replace(substring(s, length(regexp_extract(s, '^[^/?#]+')) + 1),
                           '/$', '', 'g') AS canonical_url
  FROM (
    SELECT doc_id, url,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(
             url, '^https?://', '', 'g'), '#.*$', '', 'g'),
             '&utm_[a-z]+=[^&]*', '', 'g'),
             '\\?utm_[a-z]+=[^&]*&', '?', 'g'),
             '\\?utm_[a-z]+=[^&]*$', '', 'g'), '[?&]+$', '', 'g') AS s
    FROM urls
  )
"""

SQL_URL_CANONICAL_DEDUP = f"""
WITH urls AS ({_SQL_URLS}),
canon AS ({_SQL_CANON})
SELECT canonical_url,
       count(*) AS n_docs,
       count(DISTINCT url) AS n_raw_variants,
       min(doc_id) AS canonical_doc_id
FROM canon GROUP BY 1
"""


# ------------------------------------------------------- Gopher rule filter

GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_TOP_RATIO = 0.1


def gopher_rules(spark, sf_dir) -> DataFrame:
    """Gopher's absolute per-doc quality rules (Rae et al. 2021 §A1.1,
    simplified to the signals the synthetic corpus exercises): token-count
    window, mean-token-length window, >=2 stopword hits, and a max
    single-term frequency ratio (the repetition rule). Absolute thresholds —
    complements corpus_quality_select (relative rank within source) and
    ft_gopher_repetition (n-gram repetition fractions).

    Plan: tf agg on (doc_id, term), per-doc agg on doc_id — the tf shuffle
    reuses the same key layout every tf-based operator here uses; all rule
    math is integer or single-division double (identical across engines).
    The stopword set is ft_lang_heuristic's _EN_MARKERS — one shared
    constant, rendered into the oracle SQL from the same tuple."""
    toks = doc_tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).withColumn(
        "tlen", F.length("term")
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.max("tf").cast("long").alias("max_tf"),
        F.sum(F.col("tf") * F.col("tlen")).cast("long").alias("sum_len"),
        F.sum(F.when(F.col("term").isin(*_EN_MARKERS), F.col("tf")).otherwise(0))
        .cast("long")
        .alias("stop_hits"),
    )
    mean_len = F.round(F.col("sum_len") * 1.0 / F.col("n_tokens"), 6)
    top_ratio = F.round(F.col("max_tf") * 1.0 / F.col("n_tokens"), 6)
    out = agg.select(
        "doc_id",
        "n_tokens",
        mean_len.alias("mean_token_len"),
        "stop_hits",
        top_ratio.alias("top_term_ratio"),
    )
    r_count = (F.col("n_tokens") >= GOPHER_MIN_TOKENS) & (
        F.col("n_tokens") <= GOPHER_MAX_TOKENS
    )
    r_mean = (F.col("mean_token_len") >= GOPHER_MIN_MEAN_LEN) & (
        F.col("mean_token_len") <= GOPHER_MAX_MEAN_LEN
    )
    r_stop = F.col("stop_hits") >= GOPHER_MIN_STOP_HITS
    r_rep = F.col("top_term_ratio") <= GOPHER_MAX_TOP_RATIO
    return out.select(
        "*",
        r_count.alias("pass_token_count"),
        r_mean.alias("pass_mean_len"),
        r_stop.alias("pass_stopwords"),
        r_rep.alias("pass_repetition"),
        (r_count & r_mean & r_stop & r_rep).alias("keep"),
    )


SQL_GOPHER_RULES = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf AS (
  SELECT doc_id, term, count(*) AS tf, len(term) AS tlen
  FROM toks GROUP BY doc_id, term
),
agg AS (
  SELECT doc_id,
         CAST(sum(tf) AS BIGINT) AS n_tokens,
         CAST(max(tf) AS BIGINT) AS max_tf,
         CAST(sum(tf * tlen) AS BIGINT) AS sum_len,
         CAST(sum(CASE WHEN term IN ({_sql_in(_EN_MARKERS)}) THEN tf ELSE 0 END) AS BIGINT) AS stop_hits
  FROM tf GROUP BY doc_id
),
feat AS (
  SELECT doc_id, n_tokens,
         round(sum_len * 1.0 / n_tokens, 6) AS mean_token_len,
         stop_hits,
         round(max_tf * 1.0 / n_tokens, 6) AS top_term_ratio
  FROM agg
)
SELECT doc_id, n_tokens, mean_token_len, stop_hits, top_term_ratio,
       n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS} AS pass_token_count,
       mean_token_len BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN} AS pass_mean_len,
       stop_hits >= {GOPHER_MIN_STOP_HITS} AS pass_stopwords,
       top_term_ratio <= {GOPHER_MAX_TOP_RATIO} AS pass_repetition,
       (n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
       AND (mean_token_len BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN})
       AND stop_hits >= {GOPHER_MIN_STOP_HITS}
       AND top_term_ratio <= {GOPHER_MAX_TOP_RATIO} AS keep
FROM feat
"""


# ------------------------------------- hashed linear quality classifier

# fastText-style model-based quality scoring (the CCNet / GPT-3 "looks like
# reference text" filter): hashing-trick features (unigrams + word bigrams,
# fastText wordNgrams=2) → bucketed weight lookup → mean-pooled logit.
# The weight table is synthesized deterministically from the bucket index
# (Knuth multiplicative hash onto a symmetric integer range) — the sandbox
# stand-in for trained weights; the Spark-side structure (feature hashing,
# weight application, pooling, thresholding) is the real pipeline stage.
# All arithmetic is EXACT int64 until the final reporting division: the
# decision is made on the integer logit sum (sigmoid is monotone, so
# thresholding the logit == thresholding the probability).
CLS_BUCKETS = 4096
CLS_KNUTH = 2654435761  # Knuth's 2^32 multiplicative constant
CLS_WMOD = 2_000_001  # weight range [-1e6, 1e6] milli-units after the shift
CLS_WOFF = 1_000_000


def classifier_features(toks: F.Column) -> F.Column:
    """Unigrams ++ adjacent-word bigrams ('a_b') from a token array.
    zip_with pads the shifted copy with null → the dangling last pair
    concats to null and is filtered; no length branching needed."""
    shifted = F.slice(toks, 2, F.greatest(F.size(toks), F.lit(1)))
    bigrams = F.filter(
        F.zip_with(toks, shifted, lambda a, b: F.concat(a, F.lit("_"), b)),
        lambda x: x.isNotNull(),
    )
    return F.concat(toks, bigrams)


def classifier_weight(feat: F.Column) -> F.Column:
    """Deterministic bucket weight in [-1e6, 1e6] (integer milli-units)."""
    bucket = _hash56(feat) % CLS_BUCKETS
    return (bucket * CLS_KNUTH) % CLS_WMOD - CLS_WOFF


def quality_classifier_score(spark, sf_dir) -> DataFrame:
    """Per-doc classifier verdict: feature count, exact integer logit sum,
    mean-pooled score (reporting only, round 6), keep = logit >= 0.

    Scale shape: ZERO shuffles — tokenize, feature expansion, hashing,
    weight lookup and pooling are all array expressions inside one
    whole-stage-codegen map over the documents scan (classifier scoring is
    embarrassingly parallel; this is the plan a 100 TB filter pass needs).
    tests/test_scale_plans.py asserts the no-Exchange plan."""
    docs = load(spark, sf_dir, "documents")
    feats = classifier_features(tokens_column(F.col("text")))
    weights = F.transform(feats, classifier_weight)
    logit = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    out = docs.select(
        "doc_id",
        F.size(feats).cast("long").alias("n_feats"),
        logit.alias("logit_sum_milli"),
    )
    score = F.when(F.col("n_feats") == 0, F.lit(0.0)).otherwise(
        F.round(F.col("logit_sum_milli") / (F.col("n_feats") * 1_000_000.0), 6)
    )
    return out.select(
        "doc_id",
        "n_feats",
        "logit_sum_milli",
        score.alias("score"),
        ((F.col("n_feats") > 0) & (F.col("logit_sum_milli") >= 0)).alias("keep"),
    )


_SQL_CLS_W = (
    f"(({_SQL_HASH56.format(col='f')} % {CLS_BUCKETS}) * {CLS_KNUTH})"
    f" % {CLS_WMOD} - {CLS_WOFF}"
)

SQL_QUALITY_CLASSIFIER = f"""
WITH base AS (
  SELECT doc_id, {SQL_TOKS.format(col='text')} AS toks FROM documents
),
feats AS (
  SELECT doc_id,
         list_concat(
           toks,
           list_transform(range(1, greatest(len(toks), 1)),
                          i -> toks[i] || '_' || toks[i + 1])
         ) AS fs
  FROM base
),
scored AS (
  SELECT doc_id,
         CAST(len(fs) AS BIGINT) AS n_feats,
         CAST(coalesce(
           list_aggregate(list_transform(fs, f -> {_SQL_CLS_W}), 'sum'), 0)
         AS BIGINT) AS logit_sum_milli
  FROM feats
)
SELECT doc_id, n_feats, logit_sum_milli,
       CASE WHEN n_feats = 0 THEN 0.0
            ELSE round(logit_sum_milli / (n_feats * 1000000.0), 6)
       END AS score,
       (n_feats > 0 AND logit_sum_milli >= 0) AS keep
FROM scored
"""


QUERIES = {
    "pii_redact": (pii_redact, SQL_PII_REDACT),
    "url_canonical_dedup": (url_canonical_dedup, SQL_URL_CANONICAL_DEDUP),
    "gopher_rules": (gopher_rules, SQL_GOPHER_RULES),
    "quality_classifier_score": (quality_classifier_score, SQL_QUALITY_CLASSIFIER),
}


# ------------------------------------------------ end-to-end curation pass


def curate_pipeline(spark, sf_dir) -> DataFrame:
    """The composed training-data curation pass a real pipeline runs:
    absolute quality rules (gopher_rules) ∧ near-duplicate-cluster
    representative selection (dedup_cluster_keep_best; docs with no
    shingles — too short to cluster — default to kept) → selected, plus the
    hash-stable train/val split for the survivors. One row per doc with
    each gate's verdict, so downstream can both filter and audit WHY a doc
    dropped.

    Scale shape: three independently-computed per-doc columns joined on
    doc_id — each input keeps its own optimal plan (map-only split, tf-agg
    rules, LSH clustering), and the final joins shuffle only on doc_id.
    At 100 TB each stage would be persisted as its own table and the joins
    co-located by a shared doc_id bucketing; the composition here keeps
    the exact same dataflow."""
    from harvester_spark.operators.dedup import dedup_cluster_keep_best
    from harvester_spark.operators.training_prep import split_train_val

    g = gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_quality")
    )
    kb = dedup_cluster_keep_best(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("kept_rep")
    )
    sp = split_train_val(spark, sf_dir).select("doc_id", "split")
    j = (
        g.join(kb, "doc_id", "left")
        .join(sp, "doc_id")
        .select(
            "doc_id",
            "keep_quality",
            F.coalesce(F.col("kept_rep"), F.lit(True)).alias("keep_dedup"),
            "split",
        )
    )
    selected = F.col("keep_quality") & F.col("keep_dedup")
    return j.select(
        "doc_id",
        "keep_quality",
        "keep_dedup",
        selected.alias("selected"),
        F.when(selected, F.col("split")).otherwise(F.lit("dropped")).alias(
            "disposition"
        ),
    )


def _sql_curate_pipeline() -> str:
    from harvester_spark.operators.dedup import _sql_cluster_keep_best
    from harvester_spark.operators.training_prep import _sql_split_train_val

    return f"""
WITH g AS ({SQL_GOPHER_RULES}),
kb AS ({_sql_cluster_keep_best()}),
sp AS ({_sql_split_train_val()})
SELECT g.doc_id,
       g.keep AS keep_quality,
       coalesce(kb.kept, true) AS keep_dedup,
       (g.keep AND coalesce(kb.kept, true)) AS selected,
       CASE WHEN g.keep AND coalesce(kb.kept, true) THEN sp.split
            ELSE 'dropped' END AS disposition
FROM g
LEFT JOIN kb ON g.doc_id = kb.doc_id
JOIN sp ON g.doc_id = sp.doc_id
"""


QUERIES["curate_pipeline"] = (curate_pipeline, _sql_curate_pipeline())


# ------------------------------------------------- C4 exact line dedup

# C4's corpus-wide deduplication rule (Raffel et al. 2020 §2.2): any LINE
# that occurs more than once in the whole corpus is kept only at its FIRST
# occurrence; every later occurrence is cut out of its document and the
# survivors are re-joined. This is the exact-line counterpart of the n-gram
# span recipes in dedup.py (dedup_duplicate_spans / dedup_span_removal):
# lines PARTITION the token stream (non-overlapping), so removal needs no
# interval merging and the document reassembles by concatenating survivors.
# The synthetic corpus carries no newlines, so a "line" is a fixed
# LINE_K-token group (the trailing partial group is a line too — nothing is
# silently dropped); natural word-soup repetition makes ~6% of lines
# corpus-wide duplicates (non-degeneracy pinned by tests).
#
# Scale shape (the 100 TB C4 pass): line construction is a pure array
# expression inside the scan (no explode-then-regroup); then exactly TWO
# key shuffles — (1) line-hash → min(first-occurrence) agg, map-side
# combined, joined straight back on the same key (co-partitioned under
# AQE), (2) doc_id for the reassembly agg. Line text never travels with
# the first-occurrence agg — only the 56-bit hash and the (doc_id, line_ix)
# struct, so shuffle volume is O(lines · 24 bytes), not O(corpus bytes).

LINE_K = 5


def _doc_lines(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, line_ix, line): non-overlapping LINE_K-token
    groups built as one array expression (zero exchanges up to here)."""
    toks = tokens_column(F.col("text"))
    n_lines = F.ceil(F.size(toks) / F.lit(LINE_K)).cast("int")
    lines = F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(toks, i * LINE_K + 1, LINE_K), " "),
        )
    )
    return docs.select(
        "doc_id", F.posexplode(lines).alias("line_ix", "line")
    )


def c4_line_dedup(spark, sf_dir) -> DataFrame:
    """Per-doc C4 line-dedup report: total lines, removed (seen earlier
    anywhere, including earlier in the SAME doc), kept count, and the md5
    of the reassembled surviving text."""
    docs = load(spark, sf_dir, "documents")
    lined = _doc_lines(docs).withColumn("lh", _hash56(F.col("line")))
    first = lined.groupBy("lh").agg(
        F.min(F.struct("doc_id", "line_ix")).alias("f")
    )
    j = lined.join(first, "lh")
    kept = (F.col("doc_id") == F.col("f.doc_id")) & (
        F.col("line_ix") == F.col("f.line_ix")
    )
    agg = j.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(kept, 0).otherwise(1)).cast("long").alias("n_removed"),
        F.array_sort(
            F.collect_list(F.when(kept, F.struct("line_ix", "line")))
        ).alias("ks"),
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_removed",
        (F.col("n_lines") - F.col("n_removed")).alias("n_kept"),
        F.md5(
            F.array_join(F.transform("ks", lambda x: x["line"]), " ")
        ).alias("kept_md5"),
    )


# Oracle partitions by the line STRING (the true semantics) while the
# engine partitions by its 56-bit hash — the value-hash gate therefore
# also proves the hash is collision-free on this corpus.
SQL_C4_LINE_DEDUP = f"""
WITH base AS (
  SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents
),
lines AS (
  SELECT doc_id, ix AS line_ix,
         array_to_string(t[ix*{LINE_K}+1 : ix*{LINE_K}+{LINE_K}], ' ') AS line
  FROM (
    SELECT doc_id, t, unnest(range((len(t)+{LINE_K}-1)//{LINE_K})) AS ix
    FROM base
  )
),
ranked AS (
  SELECT doc_id, line_ix, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_ix) AS rk
  FROM lines
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(count(*) FILTER (WHERE rk = 1) AS BIGINT) AS n_kept,
       md5(coalesce(
         string_agg(line, ' ' ORDER BY line_ix) FILTER (WHERE rk = 1), ''
       )) AS kept_md5
FROM ranked GROUP BY doc_id
"""


QUERIES["c4_line_dedup"] = (c4_line_dedup, SQL_C4_LINE_DEDUP)


# -------------------------------------------------- URL path-template mining

# Crawl-frontier URL pattern mining: collapsing paths to templates
# (digit runs → {N}) is how a crawler discovers site structure — which
# sections are infinite calendar/pagination traps, where the content pages
# live, what to budget per pattern (the per-pattern sibling of
# crawl_budget_allocate's per-host quotas). The reference filters URLs one
# at a time (P10 url-check); template rollups are the aggregate view that
# scales that judgment to a billion-URL frontier.
#
# URL synthesis (documents carry no URL column — CLAUDE.md rule:
# deterministic in-operator synthesis, non-degenerate): three path
# families keyed by doc_id % 3, with page/month ids derived from doc_id.
# The /a/ family's page space is TPL_PAGES=50 so the template genuinely
# aggregates (n_urls > n_pages) at every test SF — the 1:1-mirror trap
# the session-11 test pins.
#
# Scale shape: template extraction is a map-only regexp_replace; the
# rollup is ONE groupBy(template) with map-side partial counts; the
# distinct URL/host counts ride the same shuffle key. No windows, no
# joins.

TPL_PAGES = 50  # /a/ and /p/ page-id space


def _templated_urls(spark, sf_dir) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    v = F.col("doc_id") % 3
    pid = (F.expr("doc_id DIV 3") % TPL_PAGES).cast("string")
    mo = (1 + F.col("doc_id") % 12).cast("string")
    rev = (F.col("doc_id") % 7).cast("string")
    url = (
        F.when(v == 0, F.concat(F.lit("/p/"), pid, F.lit("/review-"), rev))
        .when(v == 1, F.concat(F.lit("/blog/2024/"), mo, F.lit("/post-"), pid))
        .otherwise(F.concat(F.lit("/a/"), pid))
    )
    return docs.select("doc_id", F.col("source").alias("host"), url.alias("url"))


_SQL_TPL_URLS = f"""
  SELECT doc_id, source AS host,
         CASE doc_id % 3
           WHEN 0 THEN '/p/' || CAST((doc_id // 3) % {TPL_PAGES} AS VARCHAR)
                       || '/review-' || CAST(doc_id % 7 AS VARCHAR)
           WHEN 1 THEN '/blog/2024/' || CAST(1 + doc_id % 12 AS VARCHAR)
                       || '/post-' || CAST((doc_id // 3) % {TPL_PAGES} AS VARCHAR)
           ELSE '/a/' || CAST((doc_id // 3) % {TPL_PAGES} AS VARCHAR)
         END AS url
  FROM documents
"""


def url_path_templates(spark, sf_dir) -> DataFrame:
    """(template, n_urls, n_pages, n_hosts, sample_url): URL path
    templates (digit runs collapsed to {N}) with crawl volume, distinct
    page count and host spread."""
    urls = _templated_urls(spark, sf_dir)
    tpl = urls.withColumn(
        "template", F.regexp_replace(F.col("url"), "[0-9]+", "{N}")
    )
    return tpl.groupBy("template").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("url").cast("long").alias("n_pages"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.min("url").alias("sample_url"),
    )


SQL_URL_PATH_TEMPLATES = f"""
WITH urls AS ({_SQL_TPL_URLS}),
tpl AS (
  SELECT host, url, regexp_replace(url, '[0-9]+', '{{N}}', 'g') AS template
  FROM urls
)
SELECT template,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT url) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       min(url) AS sample_url
FROM tpl GROUP BY template
"""

QUERIES["url_path_templates"] = (url_path_templates, SQL_URL_PATH_TEMPLATES)


# ------------------------------------------------- secret/key scanning

# Training-data pipelines scan for leaked credentials before release
# (the Copilot-era lesson; CommonCrawl curation stacks run
# detect-secrets-style entropy scans next to the PII pass above). The
# detector is Shannon entropy over a long token's characters — random
# keys are near the alphabet's max entropy, natural-language and
# serial-numbered tokens far below it.
#
# The corpus contains no real secrets, so the operator PLANTS them
# deterministically (the planted-γ doctrine of click_model_pbm): docs
# with doc_id % 97 == 0 get ' ' || md5(doc_id) appended — a 32-char hex
# token whose char entropy ≈ ln 16. Both engines synthesize the same
# input inside the query, and the recovery test pins flagged docs ==
# exactly the planted set with ZERO false positives over the natural
# long tokens.
#
# Determinism: per-character contributions are integer micro-nats
# (round(1e6·c·ln c) — an engine-ordered double Σ c·ln c would drift by
# ulps); token entropy is h_micro = round(1e6·ln n) − (Σ cm) DIV n,
# a FLOORED exact-integer estimator, and the flag threshold compares
# integers only.
#
# Scale shape: candidate tokens are length-filtered BEFORE the char
# explode (≥ SECRET_MIN_LEN chars — a tiny fraction of the stream), so
# the explode is candidates·len, never corpus-chars; one (doc, token)
# agg + one doc agg.

SECRET_MIN_LEN = 24
SECRET_MIN_ENT = 2_300_000  # micro-nats; ln(16) ≈ 2.77e6, word-soup ≪

_CHAR_CM = "CAST(round(1000000.0e0 * c * ln(1.0e0 * c), 0) AS BIGINT)"
# {div} placeholder: Spark integer division is DIV, DuckDB's is //
_TOK_ENT = (
    "CAST(round(1000000.0e0 * ln(1.0e0 * n), 0) AS BIGINT) - (sum_cm {div} n)"
)


def curation_secret_entropy(spark, sf_dir):
    """(doc_id, n_secret_tokens, max_entropy_micro): docs containing
    high-entropy long tokens (planted md5 secrets), flagged by the
    integer micro-nat character-entropy detector."""
    docs = load(spark, sf_dir, "documents")
    text2 = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(F.lit(" "), F.md5(F.col("doc_id").cast("string"))),
        ).otherwise(F.lit("")),
    )
    toks = docs.select(
        "doc_id", F.explode(tokens_column(text2)).alias("tok")
    )
    cand = (
        toks.filter(F.length("tok") >= SECRET_MIN_LEN)
        .select("doc_id", "tok")
        .distinct()
    )
    chars = cand.select(
        "doc_id",
        "tok",
        F.explode(F.expr("split(tok, '(?!^)(?!$)')")).alias("ch"),
    )
    ent = (
        chars.groupBy("doc_id", "tok", "ch")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumn("cm", F.expr(_CHAR_CM))
        .groupBy("doc_id", "tok")
        .agg(F.sum("cm").cast("long").alias("sum_cm"))
        .withColumn("n", F.length("tok").cast("long"))
        .withColumn("h_micro", F.expr(_TOK_ENT.format(div="DIV")))
    )
    return (
        ent.filter(F.col("h_micro") >= SECRET_MIN_ENT)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_secret_tokens"),
            F.max("h_micro").cast("long").alias("max_entropy_micro"),
        )
    )


SQL_SECRET_ENTROPY = f"""
WITH docs2 AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 97 = 0
                      THEN ' ' || md5(CAST(doc_id AS VARCHAR))
                      ELSE '' END AS text
  FROM documents
),
cand AS MATERIALIZED (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest({SQL_TOKS.format(col='text')}) AS tok FROM docs2
  ) WHERE length(tok) >= {SECRET_MIN_LEN}
),
chars AS (
  SELECT doc_id, tok, unnest(string_split(tok, '')) AS ch FROM cand
),
ent AS (
  SELECT doc_id, tok, CAST(sum_cm AS BIGINT) AS sum_cm,
         CAST(length(tok) AS BIGINT) AS n
  FROM (
    SELECT doc_id, tok, sum(cm) AS sum_cm
    FROM (
      SELECT doc_id, tok, {_CHAR_CM} AS cm
      FROM (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        FROM chars GROUP BY doc_id, tok, ch
      )
    ) GROUP BY doc_id, tok
  )
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_secret_tokens,
       CAST(max(h_micro) AS BIGINT) AS max_entropy_micro
FROM (SELECT doc_id, {_TOK_ENT.format(div='//')} AS h_micro FROM ent)
WHERE h_micro >= {SECRET_MIN_ENT}
GROUP BY doc_id
"""

QUERIES["curation_secret_entropy"] = (
    curation_secret_entropy,
    SQL_SECRET_ENTROPY,
)


# ------------------------------------------------ k-anonymity audit

# Sweeney (2002) k-anonymity / Machanavajjhala (2006) l-diversity over
# the release-style view of the corpus — the privacy audit a
# training-data pipeline runs BEFORE publishing derived datasets (the
# complement of pii_redact, which scrubs direct identifiers; this audits
# QUASI-identifiers): equivalence classes are the tuples
# (source, lang, size bucket), a row is k-anonymous iff its class holds
# ≥ K_ANON rows, and a class is l-diverse iff its sensitive attribute
# (the doc-quality bucket, standing in for any per-row sensitive label)
# takes ≥ L_DIV distinct values. Output is the per-class audit plus the
# class's suppression verdict — what a Datafly-style generalizer would
# iterate on.
#
# Determinism: the size bucket is an integer division of n_chars; the
# sensitive bucket is an integer division of the md5-derived quality
# scatter (content-independent, both engines); counts and distinct
# counts are exact BIGINTs.
#
# Scale shape: ONE groupBy over the quasi-identifier tuple with a
# distinct-count aggregate — map-side combinable; the audit frame is
# class-cardinality, never row-cardinality.

K_ANON = 5
L_DIV = 2
KA_SIZE_BUCKET = 200  # n_chars bucket width


def curation_k_anonymity(spark, sf_dir):
    """(source, lang, size_bucket, class_size, n_sensitive, k_anonymous,
    l_diverse, suppress): per-equivalence-class k-anonymity / l-diversity
    audit over the (source, lang, size-bucket) quasi-identifier."""
    docs = load(spark, sf_dir, "documents")
    rows = docs.select(
        "source",
        "lang",
        F.expr(f"n_chars DIV {KA_SIZE_BUCKET}").cast("long").alias(
            "size_bucket"
        ),
        (
            _hash56(F.concat(F.lit("sens|"), F.col("doc_id").cast("string")))
            % 4
        ).cast("long").alias("sens"),
    )
    cls = rows.groupBy("source", "lang", "size_bucket").agg(
        F.count("*").cast("long").alias("class_size"),
        F.countDistinct("sens").cast("long").alias("n_sensitive"),
    )
    return cls.select(
        "source",
        "lang",
        "size_bucket",
        "class_size",
        "n_sensitive",
        (F.col("class_size") >= K_ANON).alias("k_anonymous"),
        (F.col("n_sensitive") >= L_DIV).alias("l_diverse"),
        (
            (F.col("class_size") < K_ANON) | (F.col("n_sensitive") < L_DIV)
        ).alias("suppress"),
    )


SQL_K_ANONYMITY = f"""
WITH rows_ AS (
  SELECT source, lang,
         CAST(n_chars // {KA_SIZE_BUCKET} AS BIGINT) AS size_bucket,
         {_SQL_HASH56.format(col="'sens|' || CAST(doc_id AS VARCHAR)")} % 4
           AS sens
  FROM documents
),
cls AS (
  SELECT source, lang, size_bucket,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT sens) AS BIGINT) AS n_sensitive
  FROM rows_ GROUP BY 1, 2, 3
)
SELECT source, lang, size_bucket, class_size, n_sensitive,
       class_size >= {K_ANON} AS k_anonymous,
       n_sensitive >= {L_DIV} AS l_diverse,
       (class_size < {K_ANON} OR n_sensitive < {L_DIV}) AS suppress
FROM cls
"""

QUERIES["curation_k_anonymity"] = (curation_k_anonymity, SQL_K_ANONYMITY)


# -------------------------------------------- pooled screening (Dorfman)

# Dorfman (1943) two-stage pooled testing, in its data-curation role:
# screening documents with an EXPENSIVE detector (an LLM safety judge,
# a human review) at low contamination rates — test pools of
# {POOL_SIZE} first, re-test individuals only inside positive pools.
# Contamination is planted at ~{POOL_PREV_PCT}% (md5), pools are
# contiguous doc_id ranks, and the operator emits the exact test
# counts: pooled = n/{POOL_SIZE} + {POOL_SIZE}·(positive pools) vs the
# individual baseline n. Pins: every planted positive is caught (the
# scheme is exhaustive by construction — pin it anyway, the
# two-stage logic is where bugs live), and the measured savings track
# Dorfman's expectation 1/s + 1 − (1−p)^s.
#
# Scale shape: one rank window (pool assignment), one pool agg, one
# rollup.

POOL_SIZE = 8
POOL_PREV_PCT = 2


def curation_pooled_screening_eval(spark, sf_dir):
    """(n_docs, n_positive, n_pools, n_positive_pools, tests_pooled,
    tests_individual, savings_milli): Dorfman two-stage test counts
    over planted contamination."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents").select("doc_id")
    tagged = docs.withColumn(
        "pos",
        (
            _hash56(F.concat(F.lit("ct|"), F.col("doc_id").cast("string")))
            % 100
            < POOL_PREV_PCT
        ).cast("long"),
    ).withColumn(
        "pool",
        F.expr(
            f"(CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) - 1)"
            f" DIV {POOL_SIZE}"
        ),
    )
    pools = tagged.groupBy("pool").agg(
        F.count("*").cast("long").alias("sz"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    return pools.agg(
        F.sum("sz").cast("long").alias("n_docs"),
        F.sum("n_pos").cast("long").alias("n_positive"),
        F.count("*").cast("long").alias("n_pools"),
        F.sum((F.col("n_pos") > 0).cast("long"))
        .cast("long")
        .alias("n_positive_pools"),
        F.sum(
            F.lit(1) + F.when(F.col("n_pos") > 0, F.col("sz")).otherwise(0)
        ).cast("long").alias("tests_pooled"),
    ).select(
        "n_docs",
        "n_positive",
        "n_pools",
        "n_positive_pools",
        "tests_pooled",
        F.col("n_docs").alias("tests_individual"),
        F.expr(
            "CAST((1000 * tests_pooled) DIV n_docs AS BIGINT)"
        ).alias("savings_milli"),
    )


def _sql_pooled_screening() -> str:
    h = _SQL_HASH56.format(col="'ct|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN {h} % 100 < {POOL_PREV_PCT} THEN 1 ELSE 0 END AS pos,
         (CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) - 1)
           // {POOL_SIZE} AS pool
  FROM documents
),
pools AS (
  SELECT pool, CAST(count(*) AS BIGINT) AS sz,
         CAST(sum(pos) AS BIGINT) AS n_pos
  FROM tagged GROUP BY 1
)
SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(sum(n_pos) AS BIGINT) AS n_positive,
       CAST(count(*) AS BIGINT) AS n_pools,
       CAST(sum(CASE WHEN n_pos > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_positive_pools,
       CAST(sum(1 + CASE WHEN n_pos > 0 THEN sz ELSE 0 END) AS BIGINT)
         AS tests_pooled,
       CAST(sum(sz) AS BIGINT) AS tests_individual,
       CAST((1000 * CAST(sum(1 + CASE WHEN n_pos > 0 THEN sz ELSE 0 END)
            AS BIGINT)) // CAST(sum(sz) AS BIGINT) AS BIGINT)
         AS savings_milli
FROM pools
"""


QUERIES["curation_pooled_screening_eval"] = (
    curation_pooled_screening_eval,
    _sql_pooled_screening(),
)


# ------------------------------------------- robots.txt rule semantics

# The crawl-permission decision layer over the synthesized URL space
# (_templated_urls): per-host allow/disallow PREFIX rules evaluated with
# the documented robots.txt precedence — the MOST SPECIFIC (longest)
# matching rule wins, allow wins length ties, no match defaults to
# allow (RFC 9309 / Google's documented semantics). This is the
# permission twin of url_path_templates' volume view: what a polite
# fetcher may actually download.
#
# Rule synthesis (md5 presence bits per host — non-degenerate nesting
# BY CONSTRUCTION): a catch-all '/' disallow on 1-in-5 hosts, section
# disallows ('/p/', '/blog/') with LONGER allow carve-outs ('/p/1',
# '/blog/2024/1') on hash-overlapping host subsets, plus a redundant
# explicit '/a/' allow. The carve-outs guarantee URLs where longest-
# match FLIPS the verdict of naive shortest-match precedence — the
# operator counts those (n_overridden) so the test can pin that the
# precedence order genuinely matters on this corpus, not vacuously.
#
# Determinism: the winning rule is max_by(allow, 2*len(prefix)+allow) —
# longest first, allow on ties; the naive foil is min_by of the same
# key (shortest, disallow on ties). Key collisions only occur between
# same-length same-verdict rules, which cannot change either verdict.
#
# Scale shape: rules is a hosts x <=6 broadcast dim; the only
# corpus-sized work is one urls scan -> per-(host,url) prefix-match
# join (bounded fan-out 6) -> one groupBy. No window functions.

ROB_RULES = (
    # (prefix, allow_flag, presence: host-hash modulus, residue)
    ("/", 0, 5, 0),
    ("/p/", 0, 3, 1),
    ("/p/", 0, 3, 2),  # same rule on a second host class (h%3 != 0)
    ("/p/1", 1, 2, 0),
    ("/blog/", 0, 4, 0),
    ("/blog/2024/1", 1, 4, 0),
    ("/a/", 1, 1, 0),
)


def _robots_rules(spark, sf_dir) -> DataFrame:
    hosts = (
        load(spark, sf_dir, "documents")
        .select(F.col("source").alias("host"))
        .distinct()
        .withColumn(
            "h", _hash56(F.concat(F.lit("rob|"), F.col("host"))).cast("long")
        )
    )
    legs = [
        hosts.filter(F.col("h") % F.lit(mod) == F.lit(res)).select(
            "host",
            F.lit(pfx).alias("prefix"),
            F.lit(allow).cast("long").alias("allow"),
        )
        for (pfx, allow, mod, res) in ROB_RULES
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.distinct()


def robots_rules_eval(spark, sf_dir) -> DataFrame:
    """(host, n_urls, n_allowed, n_disallowed, n_matched, n_overridden):
    RFC 9309 longest-match allow/disallow verdicts per host over the
    templated URL space, with the count of URLs where longest-match
    flips naive shortest-match precedence."""
    urls = _templated_urls(spark, sf_dir).select("host", "url")
    rules = F.broadcast(_robots_rules(spark, sf_dir))
    m = urls.join(rules, "host", "left").withColumn(
        "hit",
        F.expr("prefix IS NOT NULL AND startswith(url, prefix)"),
    )
    per = m.groupBy("host", "url").agg(
        F.expr(
            "max_by(CASE WHEN hit THEN allow END,"
            " CASE WHEN hit THEN 2 * length(prefix) + allow END)"
        ).alias("strict"),
        F.expr(
            "min_by(CASE WHEN hit THEN allow END,"
            " CASE WHEN hit THEN 2 * length(prefix) + allow END)"
        ).alias("naive"),
        F.expr("CAST(max(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "matched"
        ),
    )
    return per.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(F.expr("CAST(coalesce(strict, 1) = 1 AS BIGINT)"))
        .cast("long")
        .alias("n_allowed"),
        F.sum(F.expr("CAST(coalesce(strict, 1) = 0 AS BIGINT)"))
        .cast("long")
        .alias("n_disallowed"),
        F.sum("matched").cast("long").alias("n_matched"),
        F.sum(
            F.expr(
                "CAST(matched = 1 AND strict <> naive AS BIGINT)"
            )
        )
        .cast("long")
        .alias("n_overridden"),
    )


def _sql_robots() -> str:
    h = _SQL_HASH56.format(col="'rob|' || host")
    legs = " UNION ALL ".join(
        f"SELECT host, '{pfx}' AS prefix, CAST({allow} AS BIGINT) AS allow"
        f" FROM rhosts WHERE h % {mod} = {res}"
        for (pfx, allow, mod, res) in ROB_RULES
    )
    return f"""
WITH rurls AS ({_SQL_TPL_URLS}),
rhosts AS (
  SELECT DISTINCT source AS host, {h} AS h
  FROM documents
),
rrules AS (SELECT DISTINCT * FROM ({legs})),
rm AS (
  SELECT u.host, u.url, r.prefix, r.allow,
         r.prefix IS NOT NULL AND starts_with(u.url, r.prefix) AS hit
  FROM rurls u LEFT JOIN rrules r USING (host)
),
rper AS (
  SELECT host, url,
         max_by(CASE WHEN hit THEN allow END,
                CASE WHEN hit THEN 2 * length(prefix) + allow END) AS strict,
         min_by(CASE WHEN hit THEN allow END,
                CASE WHEN hit THEN 2 * length(prefix) + allow END) AS naive,
         CAST(max(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS matched
  FROM rm GROUP BY 1, 2
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN coalesce(strict, 1) = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_allowed,
       CAST(sum(CASE WHEN coalesce(strict, 1) = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_disallowed,
       CAST(sum(matched) AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN matched = 1 AND strict <> naive THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overridden
FROM rper GROUP BY 1
"""


QUERIES["robots_rules_eval"] = (robots_rules_eval, _sql_robots())


# --------------------------------- differential-privacy counts utility

# The privacy family's missing half: curation_k_anonymity measures
# SYNTACTIC privacy; Dwork et al. (TCC 2006) differential privacy is
# the statistical one. Per-source document counts get Laplace(1/eps)
# noise at three budgets, and the operator reports the measured
# utility loss against the theoretical mean absolute error E|Lap(b)| =
# b = 1/eps — the eps-vs-accuracy curve a release pipeline actually
# consults.
#
# Determinism: the "noise" is the Laplace inverse CDF evaluated at an
# md5 uniform u in (0,1):
#   noise = -(1/eps) * sign(u - 1/2) * ln(1 - 2|u - 1/2|)
# with w = 1e6 - 2|u_micro - 5e5| (an INTEGER in (0, 1e6]) and the ln
# through the standard micro-floor idiom — one shared expression
# string, bit-identical in both engines. Budgets are exact rationals
# (eps = num/den), never floats.
#
# Pins (test): full Python recompute; mean absolute error MONOTONE
# decreasing in eps across the three budgets; each budget's measured
# mean within a [1/3, 3]x band of the b = 1/eps theory (20 draws per
# budget — a band, not an equality; the draws are fixed md5).

DP_EPS = ((1, 10), (1, 1), (10, 1))  # eps = num/den: 0.1, 1, 10


def curation_dp_counts_eval(spark, sf_dir):
    """(eps_num, eps_den, n_groups, mean_abs_err_milli,
    max_abs_err_milli, theory_mean_milli): Laplace-mechanism utility on
    per-source counts at three privacy budgets."""
    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    eps_df = counts.sparkSession.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(DP_EPS)],
        "ei long, eps_num long, eps_den long",
    )
    keyed = counts.crossJoin(F.broadcast(eps_df)).select(
        "source",
        "c",
        "ei",
        "eps_num",
        "eps_den",
        (
            _hash56(
                F.concat(
                    F.lit("dp|"),
                    F.col("ei").cast("string"),
                    F.lit("|"),
                    F.col("source"),
                )
            )
            % 999_999
            + 1
        ).cast("long").alias("u"),
    )
    noise = (
        "CAST(floor((eps_den * 1.0e0 / eps_num)"
        " * (ln(1.0e6) - ln(w)) * 1.0e3 + 0.5e0) AS BIGINT)"
    )
    per = keyed.withColumn(
        "w", F.expr("CAST(1000000 - 2 * abs(u - 500000) AS BIGINT)")
    ).withColumn("abs_noise_milli", F.expr(noise))
    agg = per.groupBy("ei", "eps_num", "eps_den").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.expr("CAST(sum(abs_noise_milli) DIV count(*) AS BIGINT)").alias(
            "mean_abs_err_milli"
        ),
        F.max("abs_noise_milli").cast("long").alias("max_abs_err_milli"),
    )
    return agg.select(
        "eps_num",
        "eps_den",
        "n_groups",
        "mean_abs_err_milli",
        "max_abs_err_milli",
        F.expr("CAST((1000 * eps_den) DIV eps_num AS BIGINT)").alias(
            "theory_mean_milli"
        ),
    )


def _sql_dp_counts() -> str:
    h = _SQL_HASH56.format(
        col="'dp|' || CAST(ei AS VARCHAR) || '|' || source"
    )
    evals = ", ".join(
        f"({i}, {n}, {d})" for i, (n, d) in enumerate(DP_EPS)
    )
    noise = (
        "CAST(floor((eps_den * 1.0e0 / eps_num)"
        " * (ln(1.0e6) - ln(w)) * 1.0e3 + 0.5e0) AS BIGINT)"
    )
    return f"""
WITH dpc AS (
  SELECT source, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
),
dpe AS (SELECT * FROM (VALUES {evals}) e(ei, eps_num, eps_den)),
dpk AS (
  SELECT source, c, ei, eps_num, eps_den,
         CAST({h} % 999999 + 1 AS BIGINT) AS u
  FROM dpc CROSS JOIN dpe
),
dpn AS (
  SELECT *, CAST(1000000 - 2 * abs(u - 500000) AS BIGINT) AS w
  FROM dpk
),
dpa AS (
  SELECT ei, eps_num, eps_den,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum({noise}) // count(*) AS BIGINT) AS mean_abs_err_milli,
         CAST(max({noise}) AS BIGINT) AS max_abs_err_milli
  FROM dpn GROUP BY 1, 2, 3
)
SELECT eps_num, eps_den, n_groups, mean_abs_err_milli, max_abs_err_milli,
       CAST((1000 * eps_den) // eps_num AS BIGINT) AS theory_mean_milli
FROM dpa
"""


QUERIES["curation_dp_counts_eval"] = (curation_dp_counts_eval, _sql_dp_counts())


# ------------------------------------- quality-filter agreement (kappa)

# The meta-question over the curation stack: do the quality filters
# AGREE on which documents to drop? The literature's repeated finding
# (e.g. the Gopher and FineWeb ablation writeups) is that heuristic
# rule sets, classifier scores, and lexical-diversity cutoffs overlap
# far less than assumed — agreement must be MEASURED, chance-corrected.
# This operator composes three existing per-doc filters —
#   gopher: gopher_rules.keep (absolute heuristic rules)
#   classifier: quality_classifier_score.keep (logit score sign)
#   ttr: ft_quality_score's type-token ratio above the corpus MEDIAN
#        (exact order-statistic threshold, strictly-above)
# — and reports every pair's raw agreement, Cohen's kappa (exact
# integer cross-multiplication of po - pe over 1 - pe with one
# sign-split milli division) and the Jaccard of the REMOVED sets.
#
# Oracle composition: the three filters' full oracle SQLs embed as
# derived tables (WITH-inside-FROM), so the agreement oracle reuses
# the exact single-filter semantics the driver already gates.
#
# Scale shape: three already-gated per-doc frames joined on doc_id
# plus one median order statistic; the pair grid is 3 rows.

FA_PAIRS = (("gopher", "classifier"), ("gopher", "ttr"), ("classifier", "ttr"))


def curation_filter_agreement(spark, sf_dir):
    """(filter_a, filter_b, n_docs, keep_a, keep_b, n_agree,
    kappa_milli, removed_jaccard_milli): pairwise chance-corrected
    agreement of the three per-doc quality filters."""
    from harvester_spark.operators.fulltext_queries import ft_quality_score

    g = gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("long").alias("gopher")
    )
    c = quality_classifier_score(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("long").alias("classifier")
    )
    q = ft_quality_score(spark, sf_dir).select("doc_id", "type_token_ratio")
    nq = q.count()
    med = (
        q.orderBy("type_token_ratio", "doc_id")
        .limit((nq + 1) // 2)
        .agg(F.max("type_token_ratio").alias("med"))
    )
    t = q.crossJoin(F.broadcast(med)).select(
        "doc_id",
        (F.col("type_token_ratio") > F.col("med")).cast("long").alias("ttr"),
    )
    frame = g.join(c, "doc_id").join(t, "doc_id").cache()
    out = None
    for a, b in FA_PAIRS:
        agg = frame.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(a).cast("long").alias("keep_a"),
            F.sum(b).cast("long").alias("keep_b"),
            F.sum(F.expr(f"CAST({a} = {b} AS BIGINT)")).cast("long").alias(
                "n_agree"
            ),
            F.sum(F.expr(f"CAST({a} = 0 AND {b} = 0 AS BIGINT)"))
            .cast("long")
            .alias("both_removed"),
            F.sum(F.expr(f"CAST({a} = 0 OR {b} = 0 AS BIGINT)"))
            .cast("long")
            .alias("either_removed"),
        )
        kap = (
            "(n_docs * n_agree - (keep_a * keep_b"
            " + (n_docs - keep_a) * (n_docs - keep_b)))"
        )
        kden = (
            "(n_docs * n_docs - (keep_a * keep_b"
            " + (n_docs - keep_a) * (n_docs - keep_b)))"
        )
        row = agg.select(
            F.lit(a).alias("filter_a"),
            F.lit(b).alias("filter_b"),
            "n_docs",
            "keep_a",
            "keep_b",
            "n_agree",
            F.expr(
                f"CASE WHEN {kap} >= 0 THEN"
                f" CAST((1000 * {kap}) DIV {kden} AS BIGINT)"
                f" ELSE -CAST((1000 * -{kap}) DIV {kden} AS BIGINT) END"
            ).alias("kappa_milli"),
            F.expr(
                "CASE WHEN either_removed = 0 THEN CAST(NULL AS BIGINT)"
                " ELSE CAST((1000 * both_removed) DIV either_removed"
                " AS BIGINT) END"
            ).alias("removed_jaccard_milli"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_filter_agreement() -> str:
    from harvester_spark.operators.fulltext_queries import SQL_QUALITY_SCORE

    legs = []
    for a, b in FA_PAIRS:
        kap = (
            "(n_docs * n_agree - (keep_a * keep_b"
            " + (n_docs - keep_a) * (n_docs - keep_b)))"
        )
        kden = (
            "(n_docs * n_docs - (keep_a * keep_b"
            " + (n_docs - keep_a) * (n_docs - keep_b)))"
        )
        legs.append(f"""
SELECT '{a}' AS filter_a, '{b}' AS filter_b, n_docs, keep_a, keep_b,
       n_agree,
       CASE WHEN {kap} >= 0
            THEN CAST((1000 * {kap}) // {kden} AS BIGINT)
            ELSE -CAST((1000 * -{kap}) // {kden} AS BIGINT) END
         AS kappa_milli,
       CASE WHEN either_removed = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((1000 * both_removed) // either_removed AS BIGINT)
            END AS removed_jaccard_milli
FROM (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({a}) AS BIGINT) AS keep_a,
         CAST(sum({b}) AS BIGINT) AS keep_b,
         CAST(sum(CASE WHEN {a} = {b} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree,
         CAST(sum(CASE WHEN {a} = 0 AND {b} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS both_removed,
         CAST(sum(CASE WHEN {a} = 0 OR {b} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS either_removed
  FROM faframe
)""")
        # noqa: the frame CTE is shared below
    union = " UNION ALL ".join(legs)
    return f"""
WITH fag AS (SELECT doc_id, CASE WHEN keep THEN 1 ELSE 0 END AS gopher
             FROM ({SQL_GOPHER_RULES})),
fac AS (SELECT doc_id, CASE WHEN keep THEN 1 ELSE 0 END AS classifier
        FROM ({SQL_QUALITY_CLASSIFIER})),
faq AS MATERIALIZED (SELECT doc_id, type_token_ratio
                     FROM ({SQL_QUALITY_SCORE})),
famed AS (
  SELECT max(type_token_ratio) AS med FROM (
    SELECT type_token_ratio FROM faq
    ORDER BY type_token_ratio, doc_id
    LIMIT ((SELECT count(*) FROM faq) + 1) // 2
  )
),
fat AS (
  SELECT doc_id,
         CASE WHEN type_token_ratio > (SELECT med FROM famed)
              THEN 1 ELSE 0 END AS ttr
  FROM faq
),
faframe AS MATERIALIZED (
  SELECT g.doc_id, g.gopher, c.classifier, t.ttr
  FROM fag g JOIN fac c USING (doc_id) JOIN fat t USING (doc_id)
)
{union}
"""


QUERIES["curation_filter_agreement"] = (
    curation_filter_agreement,
    _sql_filter_agreement(),
)
