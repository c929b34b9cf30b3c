"""Index-layout analytics: what the physical index costs before building it.

Two planning operators a web-scale indexer runs against the raw corpus:

- ``postings_varbyte_size`` — the exact byte size the repo's own block
  codec (index/codec.py: BLOCK_SIZE=128, per-block ``[0, diff(doc_ids)]``
  doc deltas + raw tfs, little-endian base-128 varbyte) will spend per
  term, computed RELATIONALLY. The gate proves both engines agree; a
  pytest proves the relational count equals ``len()`` of the real
  ``encode_blocks`` output byte-for-byte, so this is a true codec twin,
  not an approximation.
- ``index_shard_skew`` — postings volume per term-hash shard for a
  NSHARDS-way term-partitioned index, with each shard's share and skew
  factor (share·NSHARDS). This is the number that decides whether a
  term-sharded build needs salting (the head-term salted-chunk machinery
  in index/build.py exists because this skew is >1 on Zipfian corpora).

Scale shapes: both are one postings aggregation (the SPIMI stats plan)
plus one narrow window keyed on term (varbyte needs the per-term doc-gap,
which the index build's sort provides for free); nothing driver-sized.

Determinism: everything is integer arithmetic; the varbyte length is a
shared CASE-threshold expression string (powers of 128 up to 2^56) used
verbatim by both engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.operators.common import SQL_DOC_TOKS, SQL_TOKS, doc_tokens, load

BLOCK = 128  # == index.codec.BLOCK_SIZE
NSHARDS = 32

_SQL_HASH56 = "CAST(('0x' || substr(md5({col}), 1, 14)) AS BIGINT)"


def _vb_len(col: str) -> str:
    """Shared varbyte-length expression: bytes = 1 + #thresholds crossed.
    Thresholds 128^k, k=1..7 cover values < 2^56 (doc gaps and tfs)."""
    terms = ["1"] + [
        f"CASE WHEN {col} >= {128 ** k} THEN 1 ELSE 0 END" for k in range(1, 8)
    ]
    return "(" + " + ".join(terms) + ")"


def postings_varbyte_size(spark, sf_dir):
    """(term, df, n_blocks, bytes_docs, bytes_tfs, total_bytes): exact
    block-codec byte cost per flagship term."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    tf = (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    wt = W.partitionBy("term").orderBy("doc_id")
    rows = (
        tf.withColumn("rn", F.row_number().over(wt) - 1)
        .withColumn("blk", F.expr(f"rn DIV {BLOCK}"))
        .withColumn(
            "delta",
            F.when(
                F.col("rn") % BLOCK == 0, F.lit(0).cast("long")
            ).otherwise(F.col("doc_id") - F.lag("doc_id").over(wt)),
        )
        .withColumn("b_doc", F.expr(_vb_len("delta")))
        .withColumn("b_tf", F.expr(_vb_len("tf")))
    )
    return rows.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.countDistinct("blk").cast("long").alias("n_blocks"),
        F.sum("b_doc").cast("long").alias("bytes_docs"),
        F.sum("b_tf").cast("long").alias("bytes_tfs"),
        (F.sum("b_doc") + F.sum("b_tf")).cast("long").alias("total_bytes"),
    )


SQL_VARBYTE_SIZE = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY term, doc_id
),
seq AS (
  SELECT term, doc_id, tf,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1 AS rn,
         lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS prev
  FROM tf
),
rows_ AS (
  SELECT term, tf, rn // {BLOCK} AS blk,
         CASE WHEN rn % {BLOCK} = 0 THEN 0 ELSE doc_id - prev END AS delta
  FROM seq
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
       CAST(sum({_vb_len('delta')}) AS BIGINT) AS bytes_docs,
       CAST(sum({_vb_len('tf')}) AS BIGINT) AS bytes_tfs,
       CAST(sum({_vb_len('delta')}) + sum({_vb_len('tf')}) AS BIGINT)
         AS total_bytes
FROM rows_ GROUP BY term
"""


def index_shard_skew(spark, sf_dir):
    """(shard, n_terms, n_postings, share, skew): postings volume of each
    term-hash shard in a NSHARDS-way term-partitioned index."""
    post = (
        doc_tokens(spark, sf_dir)
        .select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    sharded = post.withColumn(
        "shard",
        (F.conv(F.substring(F.md5(F.col("term")), 1, 14), 16, 10).cast("long") % NSHARDS),
    )
    tot = F.broadcast(sharded.agg(F.sum("df").cast("long").alias("tot")))
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("n_postings"),
        )
        .crossJoin(tot)
        .select(
            "shard",
            "n_terms",
            "n_postings",
            F.round(F.col("n_postings") * 1.0 / F.col("tot"), 6).alias("share"),
            F.round(F.col("n_postings") * NSHARDS * 1.0 / F.col("tot"), 6).alias(
                "skew"
            ),
        )
    )


SQL_SHARD_SKEW = f"""
WITH toks AS ({SQL_DOC_TOKS}),
post AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
sharded AS (
  SELECT term, df, {_SQL_HASH56.format(col='term')} % {NSHARDS} AS shard
  FROM post
),
tot AS (SELECT CAST(sum(df) AS BIGINT) AS tot FROM sharded)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(df) AS BIGINT) AS n_postings,
       round(sum(df) * 1.0 / tot, 6) AS share,
       round(sum(df) * {NSHARDS} * 1.0 / tot, 6) AS skew
FROM sharded CROSS JOIN tot
GROUP BY shard, tot
"""


# ------------------------------------------------- block-max WAND metadata

# The per-block score upper bounds Block-Max WAND (Ding & Suel, SIGIR'11)
# skips on: for every BLOCK=128-posting block of each flagship term, the
# max of the BM25 tf-normalization impact tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl))
# — exactly what index/codec.py encode_blocks stores as block_max_impact and
# search/wand.py multiplies by idf for its θ pruning. Computed RELATIONALLY
# from the raw corpus so an indexer can cost pruning effectiveness before
# building; a pytest proves the micro-unit bounds equal the real codec's
# float block_max_impact on the same postings, so this is a true metadata
# twin. The impact is ONE shared float-expression string (e0 double
# literals per the cross-engine decimal trap); bounds are integer
# micro-units via the floor(x*1e6+0.5) idiom — no float ever reaches the
# value hash.
#
# Scale shape: the SPIMI tf aggregation plus one per-term window (same
# plan family as postings_varbyte_size); output is O(df/128) rows per term.

_IMPACT = "(tf * 2.2e0) / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))"
_IMPACT_MICRO = f"CAST(floor({_IMPACT} * 1.0e6 + 0.5e0) AS BIGINT)"


def block_max_impacts(spark, sf_dir):
    """(term, blk, base_doc_id, max_doc_id, n_postings, max_tf, ub_micro):
    per-128-posting-block BM25 impact upper bounds — the Block-Max WAND
    pruning metadata (search/wand.py) as a relational planning table."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    toks = doc_tokens(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    avgdl = F.broadcast(
        dl.agg((F.sum("dl") * 1.0 / F.count("*")).alias("avgdl"))
    )
    tf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    wt = W.partitionBy("term").orderBy("doc_id")
    rows = (
        tf.join(dl, "doc_id")
        .crossJoin(avgdl)
        .withColumn("imp_micro", F.expr(_IMPACT_MICRO))
        .withColumn("rn", F.row_number().over(wt) - 1)
        .withColumn("blk", F.expr(f"rn DIV {BLOCK}"))
    )
    return rows.groupBy("term", "blk").agg(
        F.min("doc_id").cast("long").alias("base_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
        F.count("*").cast("long").alias("n_postings"),
        F.max("tf").cast("long").alias("max_tf"),
        F.max("imp_micro").cast("long").alias("ub_micro"),
    )


SQL_BLOCK_MAX = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
avg_ AS (SELECT sum(dl) * 1.0 / count(*) AS avgdl FROM dls),
tfs_ AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY term, doc_id
),
rows_ AS (
  SELECT term, tfs_.doc_id AS doc_id, tf, {_IMPACT_MICRO} AS imp_micro,
         row_number() OVER (PARTITION BY term ORDER BY tfs_.doc_id) - 1 AS rn
  FROM tfs_ JOIN dls ON tfs_.doc_id = dls.doc_id CROSS JOIN avg_
)
SELECT term, rn // {BLOCK} AS blk,
       CAST(min(doc_id) AS BIGINT) AS base_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id,
       CAST(count(*) AS BIGINT) AS n_postings,
       CAST(max(tf) AS BIGINT) AS max_tf,
       CAST(max(imp_micro) AS BIGINT) AS ub_micro
FROM rows_ GROUP BY term, rn // {BLOCK}
"""


QUERIES = {
    "postings_varbyte_size": (postings_varbyte_size, SQL_VARBYTE_SIZE),
    "index_shard_skew": (index_shard_skew, SQL_SHARD_SKEW),
    "block_max_impacts": (block_max_impacts, SQL_BLOCK_MAX),
}


# Zone-map / data-skipping statistics — the min/max block metadata a
# lakehouse scan uses for predicate pruning (Parquet row-group stats,
# Iceberg manifest value bounds). Per 20-doc block: value bounds, row
# count, and whether a `n_chars >= threshold` scan could SKIP the block
# entirely (max below the predicate). At 100 TB this table IS the
# difference between reading every file and reading the 2% that can
# match — the skip fraction is the headline number a layout (zorder_layout)
# is optimized for. One map-side-combined agg; no joins.

ZONE_BLOCK = 20
ZONE_NCHARS_MIN = 520  # probe predicate n_chars >= 520: ~1/3 of blocks skip


def zonemap_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.expr(f"doc_id DIV {ZONE_BLOCK}").alias("block"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("n_chars").alias("min_nc"),
            F.max("n_chars").alias("max_nc"),
        )
        .withColumn(
            "skippable",
            (F.col("max_nc") < ZONE_NCHARS_MIN).cast("int"),
        )
    )


SQL_ZONEMAP_STATS = f"""
SELECT doc_id // {ZONE_BLOCK} AS block,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(n_chars) AS min_nc, max(n_chars) AS max_nc,
       CAST(max(n_chars) < {ZONE_NCHARS_MIN} AS INT) AS skippable
FROM documents
GROUP BY 1
"""

QUERIES["zonemap_stats"] = (zonemap_stats, SQL_ZONEMAP_STATS)


# Dictionary front-coding size estimate — the Lucene/OpenSearch term-
# dictionary block compression (each block stores its first term whole,
# the rest as (lcp_len, suffix)). Blocks here are per first letter, which
# is exactly how the serving dictionary is partitioned (the round-3
# probe-layout buckets) — so every window is a bounded per-letter
# partition, never a global dictionary sort. LCP of adjacent sorted terms
# is computed relationally with one array expression: prefix equality at
# k implies it at every k' < k, so the equal-prefix set is exactly
# {1..LCP} and its SIZE is the LCP — no UDF, no loop.

# Spark higher-order-function form; the DuckDB twin below says the same
# thing in list_filter/range (1-based substr in BOTH engines).
_LCP_EXPR = (
    "CASE WHEN prev IS NULL THEN 0 ELSE "
    "size(filter(sequence(1, least(length(term), length(prev))),"
    " k -> substr(term, 1, k) = substr(prev, 1, k))) END"
)


def dict_front_coding_size(spark, sf_dir):
    terms = (
        doc_tokens(spark, sf_dir)
        .select("term")
        .distinct()
        .withColumn("letter", F.substring("term", 1, 1))
    )
    w = W.partitionBy("letter").orderBy("term")
    lcp = terms.withColumn("prev", F.lag("term").over(w)).withColumn(
        "lcp", F.expr(_LCP_EXPR).cast("long")
    )
    return lcp.groupBy("letter").agg(
        F.count("*").alias("n_terms"),
        F.sum(F.length("term")).cast("long").alias("raw_bytes"),
        F.sum(F.length("term") - F.col("lcp") + 1).cast("long").alias("coded_bytes"),
    )


SQL_DICT_FRONT_CODING = f"""
WITH terms AS (
  SELECT DISTINCT term FROM ({{doc_toks}})
),
lagged AS (
  SELECT substr(term, 1, 1) AS letter, term,
         lag(term) OVER (PARTITION BY substr(term, 1, 1)
                         ORDER BY term) AS prev
  FROM terms
),
lcps AS (
  SELECT letter, term,
         CASE WHEN prev IS NULL THEN 0 ELSE
           len(list_filter(range(1, least(length(term), length(prev)) + 1),
                           k -> substr(term, 1, k) = substr(prev, 1, k)))
         END AS lcp
  FROM lagged
)
SELECT letter, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(length(term)) AS BIGINT) AS raw_bytes,
       CAST(sum(length(term) - lcp + 1) AS BIGINT) AS coded_bytes
FROM lcps GROUP BY letter
""".format(doc_toks=SQL_DOC_TOKS)

QUERIES["dict_front_coding_size"] = (dict_front_coding_size, SQL_DICT_FRONT_CODING)


# Gorilla-style timestamp compression estimate (Facebook's in-memory TSDB,
# VLDB'15): per user-series, first timestamp stored whole, then
# delta-of-delta in variable-width buckets (0 bits when the cadence is
# steady, 7/9/12/32 otherwise) — the standard way an event store shrinks
# time columns ~10×. Relationally: two lag windows on the sessionizer's
# (ts, event_id) order and one CASE over |dod|; output per-user raw vs
# coded bits. One shuffle on user_id; integer-exact everywhere.


def _dod_bits_case(col: str) -> str:
    return (
        f"CASE WHEN {col} IS NULL THEN 64 "  # first delta: stored whole
        f"WHEN {col} = 0 THEN 1 "
        f"WHEN {col} BETWEEN -63 AND 64 THEN 9 "
        f"WHEN {col} BETWEEN -255 AND 256 THEN 12 "
        f"WHEN {col} BETWEEN -2047 AND 2048 THEN 15 "
        f"ELSE 36 END"
    )


def ts_gorilla_bits(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # unix_timestamp == DuckDB floor(epoch()) under the UTC session tz
        # (events_hourly_rollup convention)
        F.unix_timestamp("ts").cast("long").alias("sec"),
    )
    w = W.partitionBy("user_id").orderBy(F.col("sec").asc(), F.col("event_id").asc())
    d = ev.withColumn("delta", F.col("sec") - F.lag("sec").over(w))
    dd = d.withColumn("dod", F.col("delta") - F.lag("delta").over(w))
    # rows: first row (delta null) costs the full 64-bit header; second row
    # (dod null but delta present) stores the raw delta (64); rest by CASE
    bits = (
        "CASE WHEN delta IS NULL THEN 64 ELSE " + _dod_bits_case("dod") + " END"
    )
    return dd.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.count("*") * 64).cast("long").alias("raw_bits"),
        F.sum(F.expr(bits)).cast("long").alias("coded_bits"),
    )


SQL_TS_GORILLA_BITS = f"""
WITH d AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) ASC,
                   event_id ASC) AS delta,
         event_id
  FROM events
),
dd AS (
  SELECT user_id, delta,
         delta - lag(delta) OVER (PARTITION BY user_id
                                  ORDER BY sec ASC, event_id ASC) AS dod
  FROM d
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) * 64 AS BIGINT) AS raw_bits,
       CAST(sum(CASE WHEN delta IS NULL THEN 64
                ELSE {_dod_bits_case('dod')} END) AS BIGINT) AS coded_bits
FROM dd GROUP BY user_id
"""

QUERIES["ts_gorilla_bits"] = (ts_gorilla_bits, SQL_TS_GORILLA_BITS)


# Heaps'-law vocabulary growth — |V(n)| at docID checkpoints, the curve
# that sizes a term dictionary before you build it (V ≈ K·n^β, β < 1).
# ONE pass: each term's FIRST appearance (min doc_id over the stream),
# then a broadcast checkpoint join counts terms first seen before each
# cut — never a per-checkpoint distinct over a growing prefix (the naive
# form is quadratic in checkpoints × corpus).

VOCAB_CUTS = (50, 100, 200, 500)


def vocab_growth(spark, sf_dir):
    first = (
        doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    cuts = spark.createDataFrame(
        [(int(c),) for c in VOCAB_CUTS], "cut long"
    )
    return (
        first.crossJoin(F.broadcast(cuts))
        .filter(F.col("first_doc") < F.col("cut"))
        .groupBy("cut")
        .agg(F.count("*").alias("vocab_size"))
    )


SQL_VOCAB_GROWTH = f"""
WITH first AS (
  SELECT term, min(doc_id) AS first_doc
  FROM ({SQL_DOC_TOKS}) GROUP BY term
),
cuts AS (SELECT unnest({list(VOCAB_CUTS)}) AS cut)
SELECT cut, CAST(count(*) AS BIGINT) AS vocab_size
FROM first JOIN cuts ON first_doc < cut
GROUP BY cut
"""

QUERIES["vocab_growth"] = (vocab_growth, SQL_VOCAB_GROWTH)


# ------------------------------------------------------- codec bake-off
# Per-term postings-compression comparison across the three docID codecs a
# Lucene-class engine actually chooses between (reference parity: the
# OpenSearch index behind search/models/index.py stores postings with
# Lucene's FOR blocks; the repo's own delta codec is varbyte):
#
# - varbyte  — the repo's block codec (index/codec.py), bytes from the
#   shared ``_vb_len`` CASE string × 8;
# - FOR      — Lucene ForUtil: per 128-posting block, all deltas packed at
#   bit-width = bit_length(max delta), + 8-bit width header per block;
# - Elias-Fano — Vigna's quasi-succinct indices (the Lucene
#   "EliasFanoDocIdSet" / Pisa default): with n = df and universe
#   u = max_doc+1, low bits l = floor(log2(u/n)), total = n·l + n + (u>>l).
#
# All integer arithmetic. floor(log2(u/n)) == length(bin(u DIV n)) - 1:
# no integer lies strictly between u/n and u DIV n + 1, so flooring the
# quotient first cannot change which power of two is crossed — the same
# bit_length derivation the Bloom capacity uses (no float log2 anywhere).
# Scale shape: one (term, doc_id) distinct, one per-term window, two
# grouped aggs — the SPIMI stats plan; output is one row per dictionary
# term. ``best`` is ONE shared CASE string on already-aliased columns.

_BEST_CODEC = (
    "CASE WHEN ef_bits <= vb_bits AND ef_bits <= for_bits THEN 'ef' "
    "WHEN for_bits <= vb_bits THEN 'for' ELSE 'vb' END"
)


def postings_codec_compare(spark, sf_dir):
    """(term, df, n_blocks, vb_bits, for_bits, ef_bits, best) over the
    ENTIRE dictionary — the table an index planner picks codecs from."""
    post = doc_tokens(spark, sf_dir).select("term", "doc_id").distinct()
    wt = W.partitionBy("term").orderBy("doc_id")
    rows = (
        post.withColumn("rn", F.row_number().over(wt) - 1)
        .withColumn("blk", F.expr(f"rn DIV {BLOCK}"))
        .withColumn(
            "delta",
            F.when(F.col("rn") % BLOCK == 0, F.lit(0).cast("long")).otherwise(
                F.col("doc_id") - F.lag("doc_id").over(wt)
            ),
        )
        .withColumn("vb", F.expr(_vb_len("delta")))
        .withColumn(
            "dbits",
            F.expr("CASE WHEN delta = 0 THEN 0 ELSE length(bin(delta)) END"),
        )
    )
    blks = rows.groupBy("term", "blk").agg(
        F.count("*").alias("cnt"),
        F.max("dbits").alias("bwidth"),
        F.sum("vb").alias("vb_bytes"),
        F.max("doc_id").alias("mx"),
    )
    per = blks.groupBy("term").agg(
        F.sum("cnt").cast("long").alias("df"),
        F.count("*").cast("long").alias("n_blocks"),
        (F.sum("vb_bytes") * 8).cast("long").alias("vb_bits"),
        F.sum(F.col("cnt") * F.col("bwidth") + 8).cast("long").alias("for_bits"),
        F.max("mx").cast("long").alias("max_doc"),
    )
    ef = per.withColumn(
        "l", F.expr("length(bin((max_doc + 1) DIV df)) - 1").cast("int")
    ).withColumn(
        "ef_bits",
        (
            F.col("df") * F.col("l")
            + F.col("df")
            + F.expr("shiftright(max_doc + 1, l)")
        ).cast("long"),
    )
    return ef.select(
        "term", "df", "n_blocks", "vb_bits", "for_bits", "ef_bits",
        F.expr(_BEST_CODEC).alias("best"),
    )


SQL_CODEC_COMPARE = f"""
WITH post AS (
  SELECT DISTINCT term, doc_id FROM ({SQL_DOC_TOKS})
),
seq AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1 AS rn,
         lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS prev
  FROM post
),
rows_ AS (
  SELECT term, doc_id, rn // {BLOCK} AS blk,
         CASE WHEN rn % {BLOCK} = 0 THEN 0 ELSE doc_id - prev END AS delta
  FROM seq
),
blks AS (
  SELECT term, blk, count(*) AS cnt,
         max(CASE WHEN delta = 0 THEN 0 ELSE length(bin(delta)) END) AS bwidth,
         sum({_vb_len('delta')}) AS vb_bytes,
         max(doc_id) AS mx
  FROM rows_ GROUP BY term, blk
),
per AS (
  SELECT term,
         CAST(sum(cnt) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(vb_bytes) * 8 AS BIGINT) AS vb_bits,
         CAST(sum(cnt * bwidth + 8) AS BIGINT) AS for_bits,
         CAST(max(mx) AS BIGINT) AS max_doc
  FROM blks GROUP BY term
),
ef AS (
  SELECT term, df, n_blocks, vb_bits, for_bits,
         CAST(df * (length(bin((max_doc + 1) // df)) - 1) + df
              + ((max_doc + 1) >> (length(bin((max_doc + 1) // df)) - 1))
              AS BIGINT) AS ef_bits
  FROM per
)
SELECT term, df, n_blocks, vb_bits, for_bits, ef_bits,
       {_BEST_CODEC} AS best
FROM ef
"""

QUERIES["postings_codec_compare"] = (postings_codec_compare, SQL_CODEC_COMPARE)


# -------------------------------------------------- roaring containers
# Roaring-bitmap sizing for docID sets (Chambi/Lemire et al.; Lucene keeps
# live-docs and filter caches in exactly this structure). The docID space
# splits into fixed-width containers; each container independently picks
# the cheapest of three encodings: sorted 16-bit array (2 B/entry), plain
# bitmap (width/8 B), or run-length (2 B header + 4 B/run). Container
# width here is {RR_CONTAINER} (not 2^16) so every regime actually occurs
# at test scale — the decision rule and the agg shape are width-agnostic.
# Three list classes exercise the three regimes: flagship-term postings
# (dense-ish → bitmap), a match-all "_live" docs list (fully contiguous →
# run, Lucene's live-docs case), and a sparse "_sparse" filter list
# (doc_id % 37 — array). Runs are counted with ONE lag window per
# (term, container): a run starts where doc_id != prev + 1.
# Scale shape: one distinct, one bounded window, two grouped aggs; the
# (term, container) key partitions arbitrarily wide.

RR_CONTAINER = 64
_RR_BYTES = "least(2 + 4 * runs, 2 * n_c, 8)"
_RR_TYPE = (
    "CASE WHEN 2 + 4 * runs < least(2 * n_c, 8) THEN 'run' "
    "WHEN 2 * n_c <= 8 THEN 'array' ELSE 'bitmap' END"
)


def postings_roaring_size(spark, sf_dir):
    """(term, n_containers, n_array, n_bitmap, n_run, total_bytes) for the
    flagship postings plus the live-docs and sparse-filter docID sets."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    post = (
        doc_tokens(spark, sf_dir)
        .select("term", "doc_id")
        .filter(F.col("term").isin(BM25_TERMS))
        .distinct()
    )
    docs = load(spark, sf_dir, "documents").select("doc_id")
    live = docs.select(F.lit("_live").alias("term"), "doc_id")
    sparse = docs.filter(F.expr("doc_id % 37 = 0")).select(
        F.lit("_sparse").alias("term"), "doc_id"
    )
    w = W.partitionBy("term", "ctr").orderBy("doc_id")
    per_ctr = (
        post.unionByName(live)
        .unionByName(sparse)
        .withColumn("ctr", F.expr(f"doc_id DIV {RR_CONTAINER}"))
        .withColumn("prev", F.lag("doc_id").over(w))
        .withColumn(
            "rs",
            F.expr("CASE WHEN prev IS NULL OR doc_id <> prev + 1 THEN 1 ELSE 0 END"),
        )
        .groupBy("term", "ctr")
        .agg(F.count("*").alias("n_c"), F.sum("rs").alias("runs"))
        .withColumn("ctype", F.expr(_RR_TYPE))
        .withColumn("cbytes", F.expr(_RR_BYTES))
    )
    return per_ctr.groupBy("term").agg(
        F.count("*").cast("long").alias("n_containers"),
        F.sum(F.expr("CASE WHEN ctype = 'array' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_array"),
        F.sum(F.expr("CASE WHEN ctype = 'bitmap' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_bitmap"),
        F.sum(F.expr("CASE WHEN ctype = 'run' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_run"),
        F.sum("cbytes").cast("long").alias("total_bytes"),
    )


SQL_ROARING_SIZE = f"""
WITH post AS (
  SELECT DISTINCT term, doc_id FROM ({SQL_DOC_TOKS})
  WHERE term IN ('key', 'value', 'table')
  UNION ALL SELECT '_live' AS term, doc_id FROM documents
  UNION ALL SELECT '_sparse' AS term, doc_id FROM documents WHERE doc_id % 37 = 0
),
seq AS (
  SELECT term, doc_id, doc_id // {RR_CONTAINER} AS ctr,
         lag(doc_id) OVER (PARTITION BY term, doc_id // {RR_CONTAINER}
                           ORDER BY doc_id) AS prev
  FROM post
),
per_ctr AS (
  SELECT term, ctr, count(*) AS n_c,
         sum(CASE WHEN prev IS NULL OR doc_id <> prev + 1 THEN 1 ELSE 0 END)
           AS runs
  FROM seq GROUP BY term, ctr
),
typed AS (
  SELECT term, {_RR_TYPE} AS ctype, {_RR_BYTES} AS cbytes FROM per_ctr
)
SELECT term,
       CAST(count(*) AS BIGINT) AS n_containers,
       CAST(sum(CASE WHEN ctype = 'array' THEN 1 ELSE 0 END) AS BIGINT) AS n_array,
       CAST(sum(CASE WHEN ctype = 'bitmap' THEN 1 ELSE 0 END) AS BIGINT) AS n_bitmap,
       CAST(sum(CASE WHEN ctype = 'run' THEN 1 ELSE 0 END) AS BIGINT) AS n_run,
       CAST(sum(cbytes) AS BIGINT) AS total_bytes
FROM typed GROUP BY term
"""

QUERIES["postings_roaring_size"] = (postings_roaring_size, SQL_ROARING_SIZE)


# ----------------------------------------------------- MaxScore split
# The MaxScore essential/non-essential list partition (Turtle & Flood
# 1995) — the third dynamic-pruning family next to the repo's WAND
# (search/wand.py) and the block-max metadata above. Terms sorted by
# ascending score upper bound; the maximal prefix whose UB sum cannot
# reach the current threshold θ (the k-th best score) is NON-essential:
# those postings are only ever probed as lookups from essential-list
# candidates, never traversed. This table is the planning twin: per query
# term, its global BM25 upper bound, the running prefix sum, and the
# essential verdict at θ = the exact 10th-best disjunctive score.
#
# Determinism: bounds and θ go through the micro-unit idiom (the ONE
# shared contrib string with e0 float literals); every comparison after
# that is int64. max(micro(x)) == micro(max(x)) since floor(x·1e6+0.5) is
# monotone. Scale shape: the SPIMI tf agg + a per-term max (tiny), the
# same top-k plan serving runs for θ, and a window over #query-terms rows.

_CONTRIB = (
    "ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))"
    " * (tf * 2.2e0)"
    " / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))"
)
_MICRO = "CAST(floor({x} * 1.0e6 + 0.5e0) AS BIGINT)"
MAXSCORE_K = 10


def ft_maxscore_split(spark, sf_dir):
    """(term, df, ub_micro, cum_ub_micro, essential): MaxScore list
    partition for the flagship disjunction at θ = exact 10th-best score."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

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
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("c", F.expr(_CONTRIB))
    )
    theta = (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rnk") == MAXSCORE_K)
        .select(F.expr(_MICRO.format(x="score")).alias("theta_micro"))
    )
    ub = contrib.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.max(F.expr(_MICRO.format(x="c"))).alias("ub_micro"),
    )
    wc = W.orderBy(F.col("ub_micro").asc(), F.col("term").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        ub.withColumn("cum_ub_micro", F.sum("ub_micro").over(wc))
        .crossJoin(F.broadcast(theta))
        .select(
            "term",
            "df",
            "ub_micro",
            "cum_ub_micro",
            F.expr(
                "CASE WHEN cum_ub_micro > theta_micro THEN 1 ELSE 0 END"
            ).alias("essential"),
        )
    )


SQL_MAXSCORE_SPLIT = f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0 / count(*) FROM dls) AS avgdl
),
tfs_ AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY term, doc_id
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfs_ GROUP BY term),
contrib AS (
  SELECT term, doc_id, {_CONTRIB} AS c
  FROM tfs_ JOIN dfs USING (term) JOIN dls USING (doc_id) CROSS JOIN stats
),
theta AS (
  SELECT {_MICRO.format(x='score')} AS theta_micro FROM (
    SELECT round(sum(c), 6) AS score,
           row_number() OVER (ORDER BY round(sum(c), 6) DESC, doc_id ASC) AS rnk
    FROM contrib GROUP BY doc_id
  ) WHERE rnk = {MAXSCORE_K}
),
ub AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         max({_MICRO.format(x='c')}) AS ub_micro
  FROM contrib GROUP BY term
),
cum AS (
  SELECT term, df, ub_micro,
         sum(ub_micro) OVER (ORDER BY ub_micro ASC, term ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_ub_micro
  FROM ub
)
SELECT term, df, ub_micro, CAST(cum_ub_micro AS BIGINT) AS cum_ub_micro,
       CASE WHEN cum_ub_micro > theta_micro THEN 1 ELSE 0 END AS essential
FROM cum CROSS JOIN theta
"""

QUERIES["ft_maxscore_split"] = (ft_maxscore_split, SQL_MAXSCORE_SPLIT)


# ------------------------------------------------------- Zipf slope fit
# The rank-frequency power-law exponent of the corpus vocabulary — the
# companion planning number to vocab_growth (Heaps): cf(rank) ~ C·rank^s
# with s near -1 means the head term carries ~ 1/H_V of ALL postings, the
# quantitative justification for the salted head-term merge
# (index/build.py). Least-squares fit of ln(cf) on ln(rank), done in
# INTEGER milli-nat units end-to-end: x,y = floor(ln(v)·1e3+0.5) (the
# micro idiom at 1e3), then slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) as pure
# int64 arithmetic with a half-den rounding — no float division anywhere,
# so both engines emit the identical micro-slope. Bounds: V ≤ 2^20 terms ×
# milli-logs ≤ 2^14 keep every product < 2^63 (larger dictionaries would
# fit on the top-K head + bucketed tail, as the docstring plan).
#
# Scale shape: one term agg (dictionary-sized, not corpus-sized), one
# rank window over the dictionary, one scalar agg.

_MILLILN = "CAST(floor(ln({v}) * 1.0e3 + 0.5e0) AS BIGINT)"
# {div} is the integer-division token: Spark spells it DIV, DuckDB //.
_DIVROUND = (
    "CASE WHEN {num} >= 0 THEN ({num} * 1000000 + {den} {div} 2) {div} {den} "
    "ELSE -((-({num}) * 1000000 + {den} {div} 2) {div} {den}) END"
)


def ft_zipf_slope(spark, sf_dir):
    """(n_terms, slope_micro, intercept_milli): log-log least-squares fit
    of collection frequency against frequency rank."""
    cf = (
        doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
    )
    wr = W.orderBy(F.col("cf").desc(), F.col("term").asc())
    xy = cf.withColumn("rank", F.row_number().over(wr).cast("long")).select(
        F.expr(_MILLILN.format(v="rank")).alias("x"),
        F.expr(_MILLILN.format(v="cf")).alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    sl = s.withColumn(
        "slope_micro",
        F.expr(
            _DIVROUND.format(
                num="(n * sxy - sx * sy)", den="(n * sxx - sx * sx)", div="DIV"
            )
        ),
    )
    return sl.select(
        F.col("n").alias("n_terms"),
        "slope_micro",
        F.expr("(sy * 1000000 - slope_micro * sx) DIV (n * 1000000)").alias(
            "intercept_milli"
        ),
    )


SQL_ZIPF_SLOPE = f"""
WITH cf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf
  FROM ({SQL_DOC_TOKS}) GROUP BY term
),
xy AS (
  SELECT {_MILLILN.format(v='rank')} AS x, {_MILLILN.format(v='cf')} AS y
  FROM (
    SELECT cf, CAST(row_number() OVER (ORDER BY cf DESC, term ASC) AS BIGINT)
             AS rank
    FROM cf
  )
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy
),
sl AS (
  SELECT n, {_DIVROUND.format(num="(n * sxy - sx * sy)",
                              den="(n * sxx - sx * sx)", div="//")} AS slope_micro,
         sx, sy
  FROM s
)
SELECT n AS n_terms, slope_micro,
       (sy * 1000000 - slope_micro * sx) // (n * 1000000) AS intercept_milli
FROM sl
"""

QUERIES["ft_zipf_slope"] = (ft_zipf_slope, SQL_ZIPF_SLOPE)


# ----------------------------------------------- balanced merge plan
# The reduce-side of a SPIMI build: NSHARDS term-hash shards must be
# assigned to MERGERS merge tasks so the slowest merger (max postings
# volume) finishes early — the stage that decides build wall-clock when
# shard skew (index_shard_skew) is real. Snake (boustrophedon) assignment
# on the volume-descending rank: rank r goes to merger r % (2·M) folded —
# a one-pass relational approximation of LPT that needs no iterative bin
# state, deterministic in both engines. Output: per-merger shard count,
# load, and the balance factor load·M / total (1.0 = perfect).
#
# Scale shape: shard volumes are an NSHARDS-row frame by construction, so
# the rank window is bounded; the corpus-sized work is the one postings
# agg it shares with index_shard_skew.

MERGERS = 8
_SNAKE = (
    f"CASE WHEN (rk DIV {MERGERS}) % 2 = 0 THEN rk % {MERGERS} "
    f"ELSE {MERGERS - 1} - (rk % {MERGERS}) END"
)


def shard_merge_plan(spark, sf_dir):
    """(merger, n_shards, load, balance): snake-LPT assignment of the
    NSHARDS term-hash shards onto MERGERS merge tasks."""
    vols = index_shard_skew(spark, sf_dir).select("shard", "n_postings")
    wr = W.orderBy(F.col("n_postings").desc(), F.col("shard").asc())
    ranked = vols.withColumn("rk", F.row_number().over(wr) - 1).withColumn(
        "merger", F.expr(_SNAKE).cast("long")
    )
    tot = F.broadcast(
        ranked.agg(F.sum("n_postings").cast("long").alias("tot"))
    )
    return (
        ranked.groupBy("merger")
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.sum("n_postings").cast("long").alias("load"),
        )
        .crossJoin(tot)
        .select(
            "merger",
            "n_shards",
            "load",
            F.round(F.col("load") * MERGERS * 1.0 / F.col("tot"), 6).alias(
                "balance"
            ),
        )
    )


_SQL_SNAKE = _SNAKE.replace("DIV", "//")

SQL_SHARD_MERGE_PLAN = f"""
WITH vols AS (
  SELECT shard, n_postings FROM ({SQL_SHARD_SKEW})
),
ranked AS (
  SELECT shard, n_postings,
         row_number() OVER (ORDER BY n_postings DESC, shard ASC) - 1 AS rk
  FROM vols
),
asg AS (
  SELECT n_postings, CAST({_SQL_SNAKE} AS BIGINT) AS merger FROM ranked
),
tot AS (SELECT CAST(sum(n_postings) AS BIGINT) AS tot FROM asg)
SELECT merger,
       CAST(count(*) AS BIGINT) AS n_shards,
       CAST(sum(n_postings) AS BIGINT) AS load,
       round(sum(n_postings) * {MERGERS} * 1.0 / tot, 6) AS balance
FROM asg CROSS JOIN tot
GROUP BY merger, tot
"""

QUERIES["shard_merge_plan"] = (shard_merge_plan, SQL_SHARD_MERGE_PLAN)


# --------------------------------------------- docID reassignment gain

# Document-identifier reassignment (Silvestri 2007 "Sorting out the
# document identifier assignment problem"; Dhulipala et al. 2016 BP
# reordering): postings compress as gap lists, and assigning nearby docIDs
# to similar documents shrinks the gaps. Web engines get most of the BP
# win by simply sorting documents by URL/content before numbering — this
# operator MEASURES that choice on the repo's corpus: total gap bits
# (Σ bit_length(gap), the FOR/δ-code cost driver) of the bigram postings
# under (a) hash-random docIDs (arrival order) vs (b) docIDs assigned in
# sorted term-set-fingerprint order (the cheap content-clustering proxy:
# docs sharing vocabulary sort together). Measured at sf0.01: 102,888 →
# 98,092 bits (4.7% — small here because the synthetic vocab is ~31 terms;
# on a real Zipfian web corpus the published win is 2-3x).
#
# Bigram keys (not unigrams) because unigram df/n ≈ 0.8 at this corpus
# makes every gap 1 in any order — no discrimination (measured; the
# unigram twin moves 14,490 → 13,767 bits).
#
# Determinism: the fingerprint is concat_ws of array_sort(array_distinct)
# — sorting canonicalizes the engine-dependent distinct order (the DuckDB
# list_distinct gotcha); md5 hex strings compare identically; gap bit
# length is length(bin(gap)) in both engines.
#
# Scale shape: the ranking windows are the eval-twin shortcut — the
# production docID assignment is docid.py's per-partition count + offset
# attach (no global sort); the gap window is ONE shuffle keyed on
# (assignment, term), the same partitioning the index build already does;
# the final agg is 2 rows.

REORDER_ASSIGNMENTS = ("hash", "termset")


def docid_reorder_gain(spark, sf_dir):
    """(assignment, n_postings, gap_bits, bits_per_posting_milli): total
    postings gap-bit cost under hash-random vs content-sorted docIDs."""
    from harvester_spark.analysis import tokens_column

    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_column(F.col("text")).alias("toks"))
    bi = t.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(toks) >= 2 THEN transform(sequence(0, size(toks)-2),"
            " i -> concat_ws('_', toks[i], toks[i+1]))"
            " ELSE cast(array() AS array<string>) END"
        ).alias("grams"),
    ).select("doc_id", F.explode("grams").alias("term")).distinct()
    fp = t.select(
        "doc_id",
        F.concat_ws(" ", F.array_sort(F.array_distinct("toks"))).alias("f"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    wh = W.orderBy(F.col("h").asc(), F.col("doc_id").asc())
    wc = W.orderBy(F.col("f").asc(), F.col("doc_id").asc())
    ids = fp.select(
        "doc_id",
        F.row_number().over(wh).cast("long").alias("rid"),
        F.row_number().over(wc).cast("long").alias("cid"),
    )
    nids = bi.join(ids, "doc_id").selectExpr(
        "term",
        "stack(2, 'hash', rid, 'termset', cid) AS (assignment, nid)",
    )
    wg = W.partitionBy("assignment", "term").orderBy(F.col("nid").asc())
    gaps = nids.withColumn(
        "gap", F.col("nid") - F.coalesce(F.lag("nid").over(wg), F.lit(0))
    )
    return (
        gaps.withColumn("bits", F.length(F.expr("bin(gap)")).cast("long"))
        .groupBy("assignment")
        .agg(
            F.count("*").cast("long").alias("n_postings"),
            F.sum("bits").cast("long").alias("gap_bits"),
        )
        .withColumn(
            "bits_per_posting_milli",
            F.expr("CAST((gap_bits * 1000) DIV n_postings AS BIGINT)"),
        )
    )


SQL_DOCID_REORDER = f"""
WITH toks AS (
  SELECT doc_id, {{toks}} AS ts FROM documents
),
bi AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, ts[i] || '_' || ts[i+1] AS term
    FROM toks, unnest(range(1, len(ts))) AS r(i)
  )
),
fp AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(ts)), ' ') AS f,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM toks
),
ids AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY h ASC, doc_id ASC) AS BIGINT) AS rid,
         CAST(row_number() OVER (ORDER BY f ASC, doc_id ASC) AS BIGINT) AS cid
  FROM fp
),
nids AS (
  SELECT term, 'hash' AS assignment, rid AS nid FROM bi JOIN ids USING (doc_id)
  UNION ALL
  SELECT term, 'termset' AS assignment, cid AS nid FROM bi JOIN ids USING (doc_id)
),
gaps AS (
  SELECT assignment,
         nid - coalesce(lag(nid) OVER (
           PARTITION BY assignment, term ORDER BY nid ASC), 0) AS gap
  FROM nids
),
agg AS (
  SELECT assignment,
         CAST(count(*) AS BIGINT) AS n_postings,
         CAST(sum(length(bin(gap))) AS BIGINT) AS gap_bits
  FROM gaps GROUP BY assignment
)
SELECT assignment, n_postings, gap_bits,
       CAST((gap_bits * 1000) // n_postings AS BIGINT) AS bits_per_posting_milli
FROM agg
"""

QUERIES["docid_reorder_gain"] = (
    docid_reorder_gain,
    SQL_DOCID_REORDER.format(toks=SQL_TOKS.format(col="text")),
)


# ---------------------------------------------------- next-word index plan

# Phrase-query acceleration planning (Williams, Zobel & Bahle 2004, "Fast
# phrase querying with combined indexes"): store a NEXT-WORD index — for
# frequent first words, postings of (word, next-word) pairs — so a phrase
# resolves by ONE bigram postings read instead of decoding and
# intersecting two positional lists. This is the planning row the repo's
# positional phrase path (search/phrase.py) would consult before
# materializing such an index: for the corpus' top phrases, the decode
# cost with and without the next-word entry.
#
# Cost model (positions decoded): full positional intersect reads cf(t1) +
# cf(t2) postings-with-positions; the next-word entry reads exactly
# cf(t1 t2) occurrences. in_index marks bigrams whose FIRST word is in the
# top-{NW_F} words by collection frequency — Williams et al.'s "common
# first word" criterion — and nw_postings_total is the storage price: the
# total occurrences the next-word index stores for those first words.
#
# Scale shape: one lag window (the bigram stream), two map-side-combined
# histograms, broadcast joins of the tiny top lists; TakeOrdered tail.

NW_TOP = 10  # phrases reported
NW_F = 64  # first-word cut for index membership


def nextword_index_plan(spark, sf_dir):
    """(rank, t1, t2, cf_bigram, cf1, cf2, in_index, cost_full, cost_nw,
    speedup_milli, nw_postings_total): decode-cost plan for the corpus'
    top-{NW_TOP} bigram phrases under a next-word index."""
    toks = doc_tokens(spark, sf_dir)
    wd = W.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        F.lag("term").over(wd).alias("t1"), F.col("term").alias("t2")
    ).filter(F.col("t1").isNotNull())
    cf = toks.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    wcf = W.orderBy(F.col("cf").desc(), F.col("term").asc())
    topf = (
        cf.orderBy(F.col("cf").desc(), F.col("term").asc())
        .limit(NW_F)
        .select(F.col("term").alias("t1"))
        .withColumn("in_idx", F.lit(1).cast("long"))
    )
    bi = pairs.groupBy("t1", "t2").agg(
        F.count("*").cast("long").alias("cf_bigram")
    )
    nw_total = F.broadcast(
        bi.join(F.broadcast(topf), "t1", "semi")
        .agg(F.sum("cf_bigram").cast("long").alias("nw_postings_total"))
    )
    top_bi = (
        bi.orderBy(
            F.col("cf_bigram").desc(), F.col("t1").asc(), F.col("t2").asc()
        )
        .limit(NW_TOP)
    )
    out = (
        top_bi.join(
            F.broadcast(cf.select(F.col("term").alias("t1"), F.col("cf").alias("cf1"))),
            "t1",
        )
        .join(
            F.broadcast(cf.select(F.col("term").alias("t2"), F.col("cf").alias("cf2"))),
            "t2",
        )
        .join(F.broadcast(topf), "t1", "left")
        .crossJoin(nw_total)
        .withColumn("in_index", F.coalesce("in_idx", F.lit(0)).cast("long"))
        .withColumn("cost_full", F.expr("CAST(cf1 + cf2 AS BIGINT)"))
        .withColumn("cost_nw", F.col("cf_bigram"))
        .withColumn(
            "speedup_milli",
            F.expr("CAST((cf1 + cf2) * 1000 DIV cf_bigram AS BIGINT)"),
        )
    )
    w = W.orderBy(F.col("cf_bigram").desc(), F.col("t1").asc(), F.col("t2").asc())
    return out.withColumn("rank", F.row_number().over(w)).select(
        "rank", "t1", "t2", "cf_bigram", "cf1", "cf2", "in_index",
        "cost_full", "cost_nw", "speedup_milli", "nw_postings_total",
    )


SQL_NEXTWORD_PLAN = f"""
WITH toks AS ({SQL_DOC_TOKS}),
pairs AS (
  SELECT t1, term AS t2 FROM (
    SELECT term, lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
    FROM toks
  ) WHERE t1 IS NOT NULL
),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks GROUP BY term),
topf AS (
  SELECT term AS t1, CAST(1 AS BIGINT) AS in_idx
  FROM cf ORDER BY cf DESC, term ASC LIMIT {NW_F}
),
bi AS (
  SELECT t1, t2, CAST(count(*) AS BIGINT) AS cf_bigram
  FROM pairs GROUP BY 1, 2
),
nwt AS (
  SELECT CAST(sum(cf_bigram) AS BIGINT) AS nw_postings_total
  FROM bi WHERE t1 IN (SELECT t1 FROM topf)
),
top_bi AS (
  SELECT t1, t2, cf_bigram FROM bi
  ORDER BY cf_bigram DESC, t1 ASC, t2 ASC LIMIT {NW_TOP}
)
SELECT CAST(row_number() OVER (
         ORDER BY b.cf_bigram DESC, b.t1 ASC, b.t2 ASC) AS INT) AS rank,
       b.t1 AS t1, b.t2 AS t2, b.cf_bigram AS cf_bigram,
       c1.cf AS cf1, c2.cf AS cf2,
       CAST(coalesce(f.in_idx, 0) AS BIGINT) AS in_index,
       CAST(c1.cf + c2.cf AS BIGINT) AS cost_full,
       b.cf_bigram AS cost_nw,
       CAST((c1.cf + c2.cf) * 1000 // b.cf_bigram AS BIGINT) AS speedup_milli,
       nwt.nw_postings_total AS nw_postings_total
FROM top_bi b
JOIN cf c1 ON c1.term = b.t1
JOIN cf c2 ON c2.term = b.t2
LEFT JOIN topf f ON f.t1 = b.t1
CROSS JOIN nwt
ORDER BY rank
"""

QUERIES["nextword_index_plan"] = (nextword_index_plan, SQL_NEXTWORD_PLAN)


# ---------------------------------------------------- consistent hashing

# Shard routing under a consistent-hash ring with virtual nodes (Karger et
# al. 1997; the ES/OpenSearch routing story once shard counts stop being
# fixed): {CH_N} shards × {CH_V} vnodes at md5-derived ring positions,
# every doc routed to its successor vnode (wrap-around). The eval adds a
# shard ({CH_N}→{CH_N + 1}) and measures the defining property: documents
# move ONLY onto the new shard (n_moved_in == 0 for every old shard —
# test-pinned) and the moved fraction ≈ 1/(n+1), vs mod-hashing which
# reshuffles nearly everything.
#
# Scale shape: the ring is {CH_N + 1}·{CH_V} rows — broadcast into one
# doc-keyed map pass (min-over-candidates, no shuffle); the rollup is one
# tiny groupBy. Routing never touches anything doc-count-sized twice.

CH_N = 8
CH_V = 8


def _ch_assign_sql(n: int, alias: str) -> str:
    hpos = _SQL_HASH56.format(
        col=f"'vn' || CAST(s AS VARCHAR) || '_' || CAST(v AS VARCHAR)"
    )
    return f"""
vn{alias} AS (
  SELECT CAST(s AS BIGINT) AS shard, {hpos} AS vpos
  FROM (SELECT unnest(range({n})) AS s)
  CROSS JOIN (SELECT unnest(range({CH_V})) AS v)
),
asg{alias} AS (
  SELECT doc_id, shard AS shard{alias} FROM (
    SELECT d.doc_id, v.shard, v.vpos,
           row_number() OVER (
             PARTITION BY d.doc_id
             ORDER BY (v.vpos < d.dpos) ASC, v.vpos ASC) AS rn
    FROM (SELECT doc_id,
                 {_SQL_HASH56.format(col="'doc' || CAST(doc_id AS VARCHAR)")}
                   AS dpos
          FROM documents) d
    CROSS JOIN vn{alias} v
  ) WHERE rn = 1
)"""


def consistent_hash_eval(spark, sf_dir):
    """(shard, n_docs_new, n_docs_old, n_moved_in): ring assignment at
    {CH_N + 1} shards vs {CH_N}, per new-ring shard."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("doc"), F.col("doc_id").cast("string"))), 1, 14
            ),
            16,
            10,
        ).cast("long").alias("dpos"),
    )

    def assign(n: int, out: str):
        vn = (
            spark.range(n * CH_V)
            .select(
                (F.col("id") % n).cast("long").alias("shard"),
                F.expr(f"id DIV {n}").cast("long").alias("v"),
            )
            .select(
                "shard",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("vn"),
                                F.col("shard").cast("string"),
                                F.lit("_"),
                                F.col("v").cast("string"),
                            )
                        ),
                        1,
                        14,
                    ),
                    16,
                    10,
                ).cast("long").alias("vpos"),
            )
        )
        wd = W.partitionBy("doc_id").orderBy(
            (F.col("vpos") < F.col("dpos")).asc(), F.col("vpos").asc()
        )
        return (
            docs.crossJoin(F.broadcast(vn))
            .withColumn("rn", F.row_number().over(wd))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("shard").alias(out))
        )

    old = assign(CH_N, "shard_old")
    new = assign(CH_N + 1, "shard_new")
    j = old.join(new, "doc_id")
    return (
        j.groupBy(F.col("shard_new").alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_docs_new"),
            F.sum((F.col("shard_old") == F.col("shard_new")).cast("long"))
            .cast("long")
            .alias("n_stayed"),
        )
        .join(
            j.groupBy(F.col("shard_old").alias("shard")).agg(
                F.count("*").cast("long").alias("n_docs_old")
            ),
            "shard",
            "full",
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.coalesce("n_docs_new", F.lit(0)).cast("long").alias("n_docs_new"),
            F.coalesce("n_docs_old", F.lit(0)).cast("long").alias("n_docs_old"),
            (
                F.coalesce("n_docs_new", F.lit(0)) - F.coalesce("n_stayed", F.lit(0))
            ).cast("long").alias("n_moved_in"),
        )
    )


def _sql_consistent_hash() -> str:
    # vnode generation differs from Spark's range trick, but the
    # (shard, v) pairs and therefore the md5 ring are identical sets.
    return f"""
WITH {_ch_assign_sql(CH_N, 'o')},
{_ch_assign_sql(CH_N + 1, 'n')[1:]},
j AS (SELECT doc_id, shardo, shardn FROM asgo JOIN asgn USING (doc_id)),
nw AS (
  SELECT shardn AS shard, CAST(count(*) AS BIGINT) AS n_docs_new,
         CAST(sum(CASE WHEN shardo = shardn THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stayed
  FROM j GROUP BY 1
),
od AS (
  SELECT shardo AS shard, CAST(count(*) AS BIGINT) AS n_docs_old
  FROM j GROUP BY 1
)
SELECT CAST(coalesce(nw.shard, od.shard) AS BIGINT) AS shard,
       CAST(coalesce(n_docs_new, 0) AS BIGINT) AS n_docs_new,
       CAST(coalesce(n_docs_old, 0) AS BIGINT) AS n_docs_old,
       CAST(coalesce(n_docs_new, 0) - coalesce(n_stayed, 0) AS BIGINT)
         AS n_moved_in
FROM nw FULL OUTER JOIN od ON nw.shard = od.shard
"""


QUERIES["consistent_hash_eval"] = (consistent_hash_eval, _sql_consistent_hash())


# ------------------------------------------------------ tiered merge plan

# Lucene TieredMergePolicy's inner decision, one round (the maintenance
# loop the reference's OpenSearch tier runs continuously): among segments
# under the max-merged cap, consider every window of {TM_AT_ONCE}
# consecutive segments in size-DESC order and pick the most BALANCED one
# — Lucene scores candidates by skew (biggest member / window total;
# merging a giant with dust wastes I/O), and this operator keeps exactly
# that criterion as an integer: skew_micro = max_docs·1e6 DIV window_docs,
# chosen = min skew, tie start asc. Segments are synthesized from the
# (source, lang) doc-count grid — the natural "one segment per ingest
# partition" shape a Spark writer produces.
#
# Scale shape: segment metadata is catalog-sized (thousands of rows at
# petabyte scale) — one rank window + one frame aggregation; nothing
# doc-sized is touched. The windowed frame (ROWS BETWEEN CURRENT AND
# {TM_AT_ONCE - 1} FOLLOWING) computes every candidate in one pass.

TM_AT_ONCE = 4  # segments merged per round
TM_MAX_MERGED = 100_000  # doc cap for merge eligibility


def tiered_merge_select(spark, sf_dir):
    """(start_rank, window_docs, max_docs, n_in_window, skew_micro,
    chosen, members): every candidate merge window over the synthesized
    segment list, with Lucene's balance score; chosen = 1 on the pick."""
    docs = load(spark, sf_dir, "documents")
    segs = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs")
    ).select(
        F.concat_ws("_", "source", "lang").alias("seg"),
        "n_docs",
    ).filter(F.col("n_docs") <= TM_MAX_MERGED)
    wr = W.orderBy(F.col("n_docs").desc(), F.col("seg").asc())
    ranked = segs.withColumn("rnk", F.row_number().over(wr).cast("long"))
    frame = W.orderBy("rnk").rowsBetween(0, TM_AT_ONCE - 1)
    cand = (
        ranked.withColumn("window_docs", F.sum("n_docs").over(frame).cast("long"))
        .withColumn("max_docs", F.max("n_docs").over(frame).cast("long"))
        .withColumn("n_in_window", F.count("*").over(frame).cast("long"))
        .withColumn(
            "members",
            F.array_join(
                F.collect_list("seg").over(frame), ","
            ),
        )
        .filter(F.col("n_in_window") == TM_AT_ONCE)
        .withColumn(
            "skew_micro",
            F.expr("CAST(max_docs * 1000000 DIV window_docs AS BIGINT)"),
        )
    )
    wbest = W.orderBy(F.col("skew_micro").asc(), F.col("rnk").asc())
    return cand.withColumn(
        "chosen", (F.row_number().over(wbest) == 1).cast("long")
    ).select(
        F.col("rnk").alias("start_rank"),
        "window_docs",
        "max_docs",
        "n_in_window",
        "skew_micro",
        "chosen",
        "members",
    )


SQL_TIERED_MERGE = f"""
WITH segs AS (
  SELECT source || '_' || lang AS seg, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source, lang
  HAVING count(*) <= {TM_MAX_MERGED}
),
ranked AS (
  SELECT seg, n_docs,
         CAST(row_number() OVER (ORDER BY n_docs DESC, seg ASC) AS BIGINT)
           AS rnk
  FROM segs
),
cand AS (
  SELECT rnk,
         CAST(sum(n_docs) OVER fr AS BIGINT) AS window_docs,
         CAST(max(n_docs) OVER fr AS BIGINT) AS max_docs,
         CAST(count(*) OVER fr AS BIGINT) AS n_in_window,
         string_agg(seg, ',') OVER fr AS members
  FROM ranked
  WINDOW fr AS (ORDER BY rnk
                ROWS BETWEEN CURRENT ROW AND {TM_AT_ONCE - 1} FOLLOWING)
)
SELECT rnk AS start_rank, window_docs, max_docs, n_in_window,
       CAST(max_docs * 1000000 // window_docs AS BIGINT) AS skew_micro,
       CAST((row_number() OVER (
         ORDER BY max_docs * 1000000 // window_docs ASC, rnk ASC) = 1)
         AS BIGINT) AS chosen,
       members
FROM cand
WHERE n_in_window = {TM_AT_ONCE}
"""

QUERIES["tiered_merge_select"] = (tiered_merge_select, SQL_TIERED_MERGE)


# --------------------------------------------- Elias gamma/delta sizes

# The two universal codes missing from the codec bake-off
# (postings_codec_compare covers varbyte/FOR/Elias-Fano;
# postings_roaring_size the container zoo): Elias γ (2·⌊log2 g⌋ + 1 bits
# per gap) and Elias δ (⌊log2 g⌋ + 2·⌊log2(⌊log2 g⌋ + 1)⌋ + 1), the
# textbook gap codes every IR-compression survey benchmarks first
# (Witten/Moffat/Bell). Gaps here are the +1-shifted docID deltas
# (first-in-list = doc_id + 1, γ/δ need positive ints); bit counts are
# pure length(bin(x)) arithmetic — the EF discipline, no float log2.
#
# Scale shape: one distinct (term, doc_id) scan, one lag window, one
# term rollup — the postings_codec_compare plan.


def postings_gamma_delta_size(spark, sf_dir):
    """(term, df, gamma_bits, delta_bits, vs_gamma_milli): per-term Elias
    gamma/delta postings sizes and their ratio."""
    post = doc_tokens(spark, sf_dir).select("term", "doc_id").distinct()
    wt = W.partitionBy("term").orderBy("doc_id")
    rows = post.withColumn(
        "gap",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(wt), F.col("doc_id") + 1
        ).cast("long"),
    ).withColumn("lb", F.expr("length(bin(gap)) - 1").cast("long"))
    sized = rows.withColumn(
        "gbits", F.expr("CAST(2 * lb + 1 AS BIGINT)")
    ).withColumn(
        "dbits",
        F.expr("CAST(lb + 2 * (length(bin(lb + 1)) - 1) + 1 AS BIGINT)"),
    )
    return sized.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("gbits").cast("long").alias("gamma_bits"),
        F.sum("dbits").cast("long").alias("delta_bits"),
        F.expr(
            "CAST(sum(dbits) * 1000 DIV sum(gbits) AS BIGINT)"
        ).alias("vs_gamma_milli"),
    )


SQL_GAMMA_DELTA = f"""
WITH post AS (
  SELECT DISTINCT term, doc_id FROM ({SQL_DOC_TOKS})
),
rows_ AS (
  SELECT term,
         coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term
                                             ORDER BY doc_id),
                  doc_id + 1) AS gap
  FROM post
),
sized AS (
  SELECT term, CAST(2 * lb + 1 AS BIGINT) AS gbits,
         CAST(lb + 2 * (length(bin(lb + 1)) - 1) + 1 AS BIGINT) AS dbits
  FROM (SELECT term, CAST(length(bin(gap)) - 1 AS BIGINT) AS lb FROM rows_)
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(gbits) AS BIGINT) AS gamma_bits,
       CAST(sum(dbits) AS BIGINT) AS delta_bits,
       CAST(CAST(sum(dbits) AS BIGINT) * 1000 // CAST(sum(gbits) AS BIGINT)
         AS BIGINT) AS vs_gamma_milli
FROM sized GROUP BY term
"""

QUERIES["postings_gamma_delta_size"] = (
    postings_gamma_delta_size,
    SQL_GAMMA_DELTA,
)


# ------------------------------------------- partitioned Elias-Fano (PEF)

# Ottaviano & Venturini, "Partitioned Elias-Fano Indexes" (SIGIR 2014),
# uniform-partition variant: each postings list is split into 128-entry
# blocks by rank; every block is EF-coded over its LOCAL universe (docIDs
# rebased to the previous block's last + 1), plus a 64-bit per-block
# header (upper bound + endpoint pointer) — the skip structure that makes
# PEF seekable. Clustered docID runs shrink the local universes, which is
# exactly where plain EF (one global universe) wastes upper-bits; this
# operator measures that win per df regime on the real dictionary.
#
# All integer arithmetic, same derivation as postings_codec_compare:
# l = floor(log2(u/n)) == length(bin(u DIV n)) - 1 (flooring the quotient
# first cannot change which power of two is crossed), EF bits =
# n·l + n + (u >> l); u_b ≥ n_b always (docIDs strictly increase within a
# block) so the quotient is ≥ 1 and bin() never sees 0. Output is the
# per-df-bucket rollup an index planner reads (bucket = bit_length(df)),
# with the exact global EF from the same spine as the baseline.
#
# Scale shape: ONE (term, doc_id) distinct + the per-term rank window the
# SPIMI stats plan already pays, then two grouped aggs — no extra
# shuffle beyond codec_compare's own shape; output is ≤64 bucket rows.

PEF_HEADER_BITS = 64


def postings_pef_size(spark, sf_dir):
    """(df_bucket, n_terms, n_blocks, ef_bits, pef_bits, pef_ratio_milli,
    pef_wins): uniform partitioned-Elias-Fano vs plain EF sizing, rolled
    up by df bit-length bucket over the whole dictionary."""
    post = doc_tokens(spark, sf_dir).select("term", "doc_id").distinct()
    wt = W.partitionBy("term").orderBy("doc_id")
    rows = post.withColumn("rn", F.row_number().over(wt) - 1).withColumn(
        "blk", F.expr(f"rn DIV {BLOCK}")
    )
    blks = rows.groupBy("term", "blk").agg(
        F.count("*").cast("long").alias("n_b"),
        F.max("doc_id").cast("long").alias("last"),
    )
    wb = W.partitionBy("term").orderBy("blk")
    coded = (
        blks.withColumn(
            "base", F.coalesce(F.lag("last").over(wb) + 1, F.lit(0))
        )
        .withColumn("u_b", F.col("last") - F.col("base") + 1)
        .withColumn("l_b", F.expr("length(bin(u_b DIV n_b)) - 1"))
        .withColumn(
            "bits_b",
            F.col("n_b") * F.col("l_b")
            + F.col("n_b")
            + F.expr("shiftright(u_b, l_b)")
            + F.lit(PEF_HEADER_BITS),
        )
    )
    per = coded.groupBy("term").agg(
        F.sum("n_b").cast("long").alias("df"),
        F.count("*").cast("long").alias("nb"),
        F.sum("bits_b").cast("long").alias("pef_bits"),
        F.max("last").cast("long").alias("max_doc"),
    )
    ef = per.withColumn(
        "l", F.expr("length(bin((max_doc + 1) DIV df)) - 1")
    ).withColumn(
        "ef_bits",
        (
            F.col("df") * F.col("l")
            + F.col("df")
            + F.expr("shiftright(max_doc + 1, l)")
        ).cast("long"),
    )
    return (
        ef.withColumn("df_bucket", F.expr("length(bin(df))").cast("long"))
        .groupBy("df_bucket")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("nb").cast("long").alias("n_blocks"),
            F.sum("ef_bits").cast("long").alias("ef_bits"),
            F.sum("pef_bits").cast("long").alias("pef_bits"),
            F.expr("CAST((1000 * sum(pef_bits)) DIV sum(ef_bits) AS BIGINT)")
            .alias("pef_ratio_milli"),
            F.sum(F.expr("CAST(pef_bits < ef_bits AS BIGINT)"))
            .cast("long")
            .alias("pef_wins"),
        )
        .orderBy("df_bucket")
    )


SQL_PEF_SIZE = f"""
WITH post AS (
  SELECT DISTINCT term, doc_id FROM ({SQL_DOC_TOKS})
),
seq AS (
  SELECT term, doc_id,
         (row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1)
           // {BLOCK} AS blk
  FROM post
),
blks AS (
  SELECT term, blk, CAST(count(*) AS BIGINT) AS n_b,
         CAST(max(doc_id) AS BIGINT) AS last
  FROM seq GROUP BY term, blk
),
coded AS (
  SELECT term, n_b, last,
         coalesce(lag(last) OVER (PARTITION BY term ORDER BY blk) + 1, 0)
           AS base
  FROM blks
),
bits AS (
  SELECT term, n_b, last,
         n_b * (length(bin((last - base + 1) // n_b)) - 1) + n_b
           + ((last - base + 1)
              >> (length(bin((last - base + 1) // n_b)) - 1))
           + {PEF_HEADER_BITS} AS bits_b
  FROM coded
),
per AS (
  SELECT term,
         CAST(sum(n_b) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(bits_b) AS BIGINT) AS pef_bits,
         CAST(max(last) AS BIGINT) AS max_doc
  FROM bits GROUP BY term
),
ef AS (
  SELECT term, df, nb, pef_bits,
         CAST(df * (length(bin((max_doc + 1) // df)) - 1) + df
              + ((max_doc + 1) >> (length(bin((max_doc + 1) // df)) - 1))
              AS BIGINT) AS ef_bits
  FROM per
)
SELECT CAST(length(bin(df)) AS BIGINT) AS df_bucket,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(nb) AS BIGINT) AS n_blocks,
       CAST(sum(ef_bits) AS BIGINT) AS ef_bits,
       CAST(sum(pef_bits) AS BIGINT) AS pef_bits,
       CAST((1000 * sum(pef_bits)) // sum(ef_bits) AS BIGINT)
         AS pef_ratio_milli,
       CAST(sum(CAST(pef_bits < ef_bits AS BIGINT)) AS BIGINT) AS pef_wins
FROM ef
GROUP BY 1 ORDER BY 1
"""

QUERIES["postings_pef_size"] = (postings_pef_size, SQL_PEF_SIZE)


# ------------------------------------------------- trie / FST dictionary

# Lucene's terms index is an FST (Mihov/Daciuk minimal acyclic automaton);
# dict_front_coding_size (above) measures the BLOCK-level prefix
# compression of the on-disk dictionary, this operator measures the
# AUTOMATON: trie node/edge counts (prefix sharing — the FST's left side)
# and the distinct-suffix count (an upper bound on the minimal
# automaton's right-language states — suffix sharing is exactly what FST
# minimization adds over a trie, so `suffix sharing potential` =
# trie_edges − n_distinct_suffixes is the headroom). All exact integer
# counts:
#   trie_edges = |distinct non-empty prefixes| (nodes = edges + 1 root),
#   saved_chars = Σ len(term) − trie_edges (chars deduped by the trie).
#
# Scale shape: vocabulary-sized, never corpus-sized — one distinct-terms
# agg (the dictionary build already pays it) + one prefix/suffix explode
# of |V|·avg_len rows + two distinct counts. At a 10^8-term web
# vocabulary this is the FST-sizing job you run before choosing the
# terms-index block structure.


def dict_fst_size(spark, sf_dir):
    """(n_terms, total_chars, trie_edges, trie_saved_chars,
    n_distinct_suffixes, suffix_share_potential): exact trie/FST sizing
    statistics of the corpus term dictionary."""
    terms = doc_tokens(spark, sf_dir).select("term").distinct().cache()
    base = terms.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum(F.length("term")).cast("long").alias("total_chars"),
    )
    pieces = terms.select(
        "term", F.explode(F.expr("sequence(1, length(term))")).alias("i")
    )
    prefixes = pieces.select(
        F.expr("substring(term, 1, i)").alias("p")
    ).agg(F.countDistinct("p").cast("long").alias("trie_edges"))
    suffixes = pieces.select(
        F.expr("substring(term, i)").alias("s")
    ).agg(F.countDistinct("s").cast("long").alias("n_distinct_suffixes"))
    return (
        base.crossJoin(prefixes)
        .crossJoin(suffixes)
        .select(
            "n_terms",
            "total_chars",
            "trie_edges",
            (F.col("total_chars") - F.col("trie_edges"))
            .cast("long")
            .alias("trie_saved_chars"),
            "n_distinct_suffixes",
            (F.col("trie_edges") - F.col("n_distinct_suffixes"))
            .cast("long")
            .alias("suffix_share_potential"),
        )
    )


SQL_DICT_FST_SIZE = f"""
WITH terms AS MATERIALIZED (
  SELECT DISTINCT term FROM ({SQL_DOC_TOKS})
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(length(term)) AS BIGINT) AS total_chars
  FROM terms
),
pieces AS MATERIALIZED (
  SELECT term, unnest(range(1, length(term) + 1)) AS i FROM terms
),
pfx AS (
  SELECT CAST(count(DISTINCT substr(term, 1, i)) AS BIGINT) AS trie_edges
  FROM pieces
),
sfx AS (
  SELECT CAST(count(DISTINCT substr(term, i)) AS BIGINT)
           AS n_distinct_suffixes
  FROM pieces
)
SELECT b.n_terms, b.total_chars, p.trie_edges,
       CAST(b.total_chars - p.trie_edges AS BIGINT) AS trie_saved_chars,
       s.n_distinct_suffixes,
       CAST(p.trie_edges - s.n_distinct_suffixes AS BIGINT)
         AS suffix_share_potential
FROM base b CROSS JOIN pfx p CROSS JOIN sfx s
"""

QUERIES["dict_fst_size"] = (dict_fst_size, SQL_DICT_FST_SIZE)


# ------------------------------------------- DocValues delta bit-packing

# Lucene's numeric DocValues writer picks, per 128-value block, the
# narrowest delta encoding: store block min, bit-pack (v − min) in
# bit_length(max − min) bits (0 bits for constant blocks). This operator
# sizes that layout for the documents.n_chars column in docID order and
# compares three codecs exactly:
#   raw        = 8 bytes/value,
#   global     = one (min, width) for the whole column,
#   per-block  = 128-value blocks, each with a 9-byte header
#                (packed min vlong ≈ 8 B + width byte).
# Widths come from the pure length(bin(hi − lo)) idiom (the
# postings_gamma_delta_size discipline) — no float log2 near integer
# boundaries. NO winner is asserted structurally: on a value-random
# docID order per-block headers can outweigh the width saving (the
# honest negative-control stance of events_forecast_eval); the pytest
# pins the exact arithmetic, not a direction.
#
# Scale shape: one block-keyed min/max/count agg + a 1-row global agg —
# the zonemap_stats plan; the block key doc_id DIV 128 never reshuffles
# more than the rollup itself.

DV_BLOCK = 128
_DV_BITS = "CASE WHEN hi = lo THEN 0 ELSE length(bin(hi - lo)) END"


def docvalues_delta_size(spark, sf_dir):
    """(n_rows, n_blocks, raw_bytes, global_packed_bytes, packed_bytes,
    blocked_vs_global): exact per-block delta bit-packing size of the
    n_chars DocValues column vs global and raw encodings."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("v")
    )
    blocks = (
        docs.groupBy((F.col("doc_id") / DV_BLOCK).cast("long").alias("blk"))
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("*").cast("long").alias("n_b"),
        )
        .withColumn("bits", F.expr(_DV_BITS).cast("long"))
        .withColumn("bytes", F.expr("9 + (n_b * bits + 7) DIV 8").cast("long"))
    )
    agg = blocks.agg(
        F.sum("n_b").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("bytes").cast("long").alias("packed_bytes"),
    )
    glob = (
        docs.agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("*").cast("long").alias("n_b"),
        )
        .withColumn("bits", F.expr(_DV_BITS).cast("long"))
        .select(
            F.expr("9 + (n_b * bits + 7) DIV 8")
            .cast("long")
            .alias("global_packed_bytes")
        )
    )
    return (
        agg.crossJoin(F.broadcast(glob))
        .select(
            "n_rows",
            "n_blocks",
            (F.col("n_rows") * 8).cast("long").alias("raw_bytes"),
            "global_packed_bytes",
            "packed_bytes",
            (F.col("packed_bytes") - F.col("global_packed_bytes"))
            .cast("long")
            .alias("blocked_vs_global"),
        )
    )


SQL_DOCVALUES_DELTA_SIZE = f"""
WITH vals AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents
),
blocks AS (
  SELECT CAST(9 + (n_b * bits + 7) // 8 AS BIGINT) AS bytes, n_b
  FROM (
    SELECT n_b, CAST({_DV_BITS} AS BIGINT) AS bits
    FROM (
      SELECT doc_id // {DV_BLOCK} AS blk, min(v) AS lo, max(v) AS hi,
             CAST(count(*) AS BIGINT) AS n_b
      FROM vals GROUP BY 1
    )
  )
),
agg AS (
  SELECT CAST(sum(n_b) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(bytes) AS BIGINT) AS packed_bytes
  FROM blocks
),
gstats AS (
  SELECT CAST(9 + (n_b * bits + 7) // 8 AS BIGINT) AS global_packed_bytes
  FROM (
    SELECT n_b, CAST({_DV_BITS} AS BIGINT) AS bits
    FROM (
      SELECT min(v) AS lo, max(v) AS hi, CAST(count(*) AS BIGINT) AS n_b
      FROM vals
    )
  )
)
SELECT a.n_rows, a.n_blocks,
       CAST(a.n_rows * 8 AS BIGINT) AS raw_bytes,
       g.global_packed_bytes, a.packed_bytes,
       CAST(a.packed_bytes - g.global_packed_bytes AS BIGINT)
         AS blocked_vs_global
FROM agg a CROSS JOIN gstats g
"""

QUERIES["docvalues_delta_size"] = (docvalues_delta_size, SQL_DOCVALUES_DELTA_SIZE)


# ------------------------------------------------ BP128 / FOR postings

# The codec the SIMD era actually ships (Lemire & Boytsov 2015,
# "Decoding billions of integers per second"; Lucene's Lucene99 postings
# use the same binary-packing shape): fixed 128-entry blocks, each
# bit-packing its d-gaps at the BLOCK's max gap width — completing the
# codec bake-off next to varbyte (above), γ/δ, Elias-Fano/PEF and
# roaring. Layout costed here, per {BLOCK}-entry block:
#   5-byte doc header (4 B first-docID base + 1 B width)
#   + ceil(rest·width_doc / 8)          gaps of entries 2..n, width =
#                                       max length(bin(gap)) in block
#   1-byte tf header + ceil(n·width_tf / 8)
# Widths from the pure length(bin(...)) idiom; constant-gap blocks of
# width 0 cost headers only (the FOR degenerate case). Exact integers
# end to end; same flagship-term spine as postings_varbyte_size so the
# two tables compare directly.
#
# Scale shape: identical to the varbyte op — one (term, doc) tf agg, one
# per-term window for gaps, one (term, blk) agg, one term agg.


def postings_bp128_size(spark, sf_dir):
    """(term, df, n_blocks, bytes_docs, bytes_tfs, total_bytes): exact
    BP128/FOR binary-packing byte cost per flagship term."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    tf = (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    wt = W.partitionBy("term").orderBy("doc_id")
    rows = (
        tf.withColumn("rn", F.row_number().over(wt) - 1)
        .withColumn("blk", F.expr(f"rn DIV {BLOCK}"))
        .withColumn("is_first", (F.col("rn") % BLOCK == 0).cast("int"))
        .withColumn(
            "delta",
            F.when(F.col("is_first") == 1, F.lit(0).cast("long")).otherwise(
                F.col("doc_id") - F.lag("doc_id").over(wt)
            ),
        )
    )
    blocks = rows.groupBy("term", "blk").agg(
        F.count("*").cast("long").alias("n_b"),
        F.max(
            F.when(F.col("is_first") == 0, F.expr("length(bin(delta))"))
        ).alias("wd_raw"),
        F.max(F.expr("length(bin(tf))")).cast("long").alias("wt_"),
    ).withColumn(
        "wd", F.coalesce(F.col("wd_raw"), F.lit(0)).cast("long")
    ).withColumn(
        "bytes_doc",
        F.expr("5 + ((n_b - 1) * wd + 7) DIV 8").cast("long"),
    ).withColumn(
        "bytes_tf",
        F.expr("1 + (n_b * wt_ + 7) DIV 8").cast("long"),
    )
    return blocks.groupBy("term").agg(
        F.sum("n_b").cast("long").alias("df"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("bytes_doc").cast("long").alias("bytes_docs"),
        F.sum("bytes_tf").cast("long").alias("bytes_tfs"),
        (F.sum("bytes_doc") + F.sum("bytes_tf"))
        .cast("long")
        .alias("total_bytes"),
    )


SQL_BP128_SIZE = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY term, doc_id
),
seq AS (
  SELECT term, doc_id, tf,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1 AS rn,
         doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
           AS lag_delta
  FROM tf
),
rows_ AS (
  SELECT term, tf, rn // {BLOCK} AS blk,
         CASE WHEN rn % {BLOCK} = 0 THEN 1 ELSE 0 END AS is_first,
         CASE WHEN rn % {BLOCK} = 0 THEN 0 ELSE lag_delta END AS delta
  FROM seq
),
blocks AS (
  SELECT term, blk,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(coalesce(max(CASE WHEN is_first = 0
                                THEN length(bin(delta)) END), 0) AS BIGINT)
           AS wd,
         CAST(max(length(bin(tf))) AS BIGINT) AS wt_
  FROM rows_ GROUP BY 1, 2
),
sized AS (
  SELECT term, n_b,
         CAST(5 + ((n_b - 1) * wd + 7) // 8 AS BIGINT) AS bytes_doc,
         CAST(1 + (n_b * wt_ + 7) // 8 AS BIGINT) AS bytes_tf
  FROM blocks
)
SELECT term, CAST(sum(n_b) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(bytes_doc) AS BIGINT) AS bytes_docs,
       CAST(sum(bytes_tf) AS BIGINT) AS bytes_tfs,
       CAST(sum(bytes_doc) + sum(bytes_tf) AS BIGINT) AS total_bytes
FROM sized GROUP BY term
"""

QUERIES["postings_bp128_size"] = (postings_bp128_size, SQL_BP128_SIZE)


# --------------------------------------- impact quantization quality

# Anh & Moffat (2005, impact-ordered indexes) and Lucene's feature
# quantization store a SMALL integer impact per posting instead of the
# float contribution; block_max_impacts (above) sizes the codec, this
# operator measures what quantization does to RANKING quality — the
# ann_pq_recall_eval discipline applied to text scoring. For each
# quantization width in IQ_LEVELS (15 = 4-bit, 255 = 8-bit): quantize
# every per-(term, doc) BM25 contribution to
# floor(contrib·L / max_contrib), rank by the integer impact sum, and
# compare the top-10 with the exact float ranking.
#
# Determinism: contributions are round(.,6)-ed BEFORE quantization in
# both engines (identical doubles), so the floor is a deterministic
# function; everything after is exact int64. The exact ranking is
# bm25_or_scored — the ONE disjunctive kernel.
#
# Scale shape: the contribution spine is the BM25 OR plan; the global
# max is a 1-row broadcast; per level one integer agg — the level dim
# multiplies the ranked agg, never the corpus scan.

IQ_LEVELS = (15, 255)


def ft_impact_quantization_eval(spark, sf_dir):
    """(n_levels, n_overlap, sum_abs_shift): per quantization width, the
    overlap of the impact-sum top-10 with the exact BM25 top-10 and the
    total |rank shift| of exact-top-10 docs under quantized ranking."""
    from harvester_spark.operators.fulltext_queries import (
        BM25_TERMS,
        bm25_or_scored,
    )

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
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "c6",
            F.round(
                F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ),
        )
        .select("term", "doc_id", "c6")
        .cache()
    )
    gmax = contrib.agg(F.max("c6").alias("gmax"))
    exact = bm25_or_scored(spark, sf_dir)
    wx = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    top_exact = (
        exact.withColumn("re", F.row_number().over(wx))
        .filter(F.col("re") <= 10)
        .select("doc_id", "re")
    )
    outs = []
    for lv in IQ_LEVELS:
        scored_q = (
            contrib.crossJoin(F.broadcast(gmax))
            .withColumn(
                "q",
                F.expr(f"CAST(floor(c6 * {lv}.0e0 / gmax) AS BIGINT)"),
            )
            .groupBy("doc_id")
            .agg(F.sum("q").cast("long").alias("sq"))
        )
        wq = W.orderBy(F.col("sq").desc(), F.col("doc_id").asc())
        ranked_q = scored_q.withColumn("rq", F.row_number().over(wq))
        joined = top_exact.join(ranked_q.select("doc_id", "rq"), "doc_id")
        outs.append(
            joined.agg(
                F.lit(lv).cast("long").alias("n_levels"),
                F.sum((F.col("rq") <= 10).cast("long"))
                .cast("long")
                .alias("n_overlap"),
                F.sum(F.abs(F.col("rq") - F.col("re")))
                .cast("long")
                .alias("sum_abs_shift"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _sql_impact_quant():
    from harvester_spark.operators.fulltext_queries import SQL_BM25_OR_TOPK

    levels = []
    for lv in IQ_LEVELS:
        levels.append(f"""
SELECT {lv} AS n_levels,
       CAST(sum(CASE WHEN rq <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap,
       CAST(sum(abs(rq - re)) AS BIGINT) AS sum_abs_shift
FROM top_exact e
JOIN (
  SELECT doc_id,
         row_number() OVER (ORDER BY sq DESC, doc_id ASC) AS rq
  FROM (
    SELECT doc_id,
           CAST(sum(CAST(floor(c6 * {lv}.0e0 / gmax) AS BIGINT)) AS BIGINT)
             AS sq
    FROM contrib CROSS JOIN gmaxs GROUP BY doc_id
  )
) q USING (doc_id)""")
    return f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
tfs_ AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY 1, 2
),
dfs AS (SELECT term, count(*) AS df FROM tfs_ GROUP BY 1),
contrib AS MATERIALIZED (
  SELECT term, doc_id,
         round(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl)), 6)
           AS c6
  FROM tfs_ t JOIN dfs USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats
),
gmaxs AS (SELECT max(c6) AS gmax FROM contrib),
top_exact AS MATERIALIZED (
  SELECT doc_id, rank AS re FROM ({SQL_BM25_OR_TOPK})
){" UNION ALL ".join(levels)}
"""


QUERIES["ft_impact_quantization_eval"] = (
    ft_impact_quantization_eval,
    _sql_impact_quant(),
)


# ------------------------------------------- shard top-k merge safety

# The distributed-serving correctness question (the docID-range fan-out
# in search/distributed.py relies on it): when each of N_MERGE_SHARDS
# shards returns its LOCAL top-k', is the GLOBAL top-k guaranteed
# inside the union? It is iff every global-top-k doc sits at local rank
# ≤ k' on its shard — so the planning quantity is max local rank of the
# global winners per shard (terms_shard_error_eval asks the same
# question for aggregations; this is the retrieval twin). Sharding is
# doc_id % N (the uniform router); scoring is bm25_or_scored, the ONE
# disjunctive kernel.
#
# Output per shard (all shards, zero-hit shards included — a fan-out
# planner needs the denominator): n_global_hits and the max local rank
# those hits reach. k' = max over shards of max_local_rank is the safe
# per-shard fetch depth; with a uniform router it concentrates near
# k/N + slack, the fan-out economy the serving path banks on.
#
# Scale shape: one global top-k (TakeOrdered), one partition-by-shard
# window over the SAME scored frame, one shard groupBy.

N_MERGE_SHARDS = 4


def shard_topk_merge_eval(spark, sf_dir):
    """(shard, n_global_hits, max_local_rank): per doc_id % 4 shard, how
    many of the global BM25 top-10 it owns and the deepest local rank a
    global winner reaches there."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    scored = bm25_or_scored(spark, sf_dir).withColumn(
        "shard", (F.col("doc_id") % N_MERGE_SHARDS).cast("long")
    )
    wg = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    wl = W.partitionBy("shard").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("rg", F.row_number().over(wg)).withColumn(
        "rl", F.row_number().over(wl)
    )
    hits = (
        ranked.filter(F.col("rg") <= 10)
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_global_hits"),
            F.max("rl").cast("long").alias("max_local_rank"),
        )
    )
    shards = spark.createDataFrame(
        [(s,) for s in range(N_MERGE_SHARDS)], "shard long"
    )
    return shards.join(hits, "shard", "left").select(
        "shard",
        F.coalesce("n_global_hits", F.lit(0)).cast("long").alias(
            "n_global_hits"
        ),
        F.coalesce("max_local_rank", F.lit(0)).cast("long").alias(
            "max_local_rank"
        ),
    )


def _sql_shard_topk_merge() -> str:
    from harvester_spark.operators.fulltext_queries import SQL_BM25_OR_TOPK

    # the OR kernel's full scored frame, not just its top-10: rebuild the
    # scored CTE the same way the Spark side does
    return f"""
WITH toks AS ({SQL_DOC_TOKS}),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
tfs_ AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY 1, 2
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfs_ GROUP BY 1),
scored AS (
  SELECT doc_id,
         round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
         ), 6) AS score
  FROM tfs_ t JOIN dfs USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats
  GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, doc_id % {N_MERGE_SHARDS} AS shard,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rg,
         row_number() OVER (
           PARTITION BY doc_id % {N_MERGE_SHARDS}
           ORDER BY score DESC, doc_id ASC) AS rl
  FROM scored
),
hits AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_global_hits,
         CAST(max(rl) AS BIGINT) AS max_local_rank
  FROM ranked WHERE rg <= 10 GROUP BY shard
)
SELECT s.shard,
       CAST(coalesce(h.n_global_hits, 0) AS BIGINT) AS n_global_hits,
       CAST(coalesce(h.max_local_rank, 0) AS BIGINT) AS max_local_rank
FROM (SELECT unnest(range({N_MERGE_SHARDS})) AS shard) s
LEFT JOIN hits h USING (shard)
"""


QUERIES["shard_topk_merge_eval"] = (
    shard_topk_merge_eval,
    _sql_shard_topk_merge(),
)


# ------------------------------------------------- skip-list structure

# Lucene's MultiLevelSkipListWriter: every SKIP_INTERVAL-th posting gets
# a level-0 skip entry, every SKIP_INTERVAL-th of those a level-1 entry,
# and so on — the structure WAND/MaxScore block skipping (wand.py)
# actually traverses. Exact integer sizing per flagship term:
#   levels   = #thresholds df ≥ 8^k crossed (the _vb_len CASE-chain
#              idiom — no float log8 at a power boundary)
#   pointers = Σ_k df DIV 8^k   (k = 1..levels)
#   bytes    = pointers · {SKIP_ENTRY_BYTES} (docID delta + file offset
#              + child pointer, the Lucene entry shape)
#
# Scale shape: rides the same (term, doc) tf agg every postings-sizing
# op uses; the level arithmetic is a 3-row map.

SKIP_INTERVAL = 8
SKIP_MAX_LEVELS = 6  # 8^6 = 262144 — covers any df this corpus reaches
SKIP_ENTRY_BYTES = 10


def postings_skiplist_size(spark, sf_dir):
    """(term, df, n_levels, n_pointers, skip_bytes): exact multi-level
    skip-list cost per flagship term at interval {SKIP_INTERVAL}."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    df_ = (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
    )
    levels = " + ".join(
        f"CASE WHEN df >= {SKIP_INTERVAL ** k} THEN 1 ELSE 0 END"
        for k in range(1, SKIP_MAX_LEVELS + 1)
    )
    pointers = " + ".join(
        f"(df DIV {SKIP_INTERVAL ** k})" for k in range(1, SKIP_MAX_LEVELS + 1)
    )
    return df_.select(
        "term",
        "df",
        F.expr(f"({levels})").cast("long").alias("n_levels"),
        F.expr(f"({pointers})").cast("long").alias("n_pointers"),
        F.expr(f"({pointers}) * {SKIP_ENTRY_BYTES}")
        .cast("long")
        .alias("skip_bytes"),
    )


def _sql_skiplist_size() -> str:
    levels = " + ".join(
        f"CASE WHEN df >= {SKIP_INTERVAL ** k} THEN 1 ELSE 0 END"
        for k in range(1, SKIP_MAX_LEVELS + 1)
    )
    pointers = " + ".join(
        f"(df // {SKIP_INTERVAL ** k})" for k in range(1, SKIP_MAX_LEVELS + 1)
    )
    return f"""
WITH toks AS ({SQL_DOC_TOKS}),
dfs AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks
  WHERE term IN ('key', 'value', 'table') GROUP BY 1
)
SELECT term, df,
       CAST({levels} AS BIGINT) AS n_levels,
       CAST({pointers} AS BIGINT) AS n_pointers,
       CAST(({pointers}) * {SKIP_ENTRY_BYTES} AS BIGINT) AS skip_bytes
FROM dfs
"""


QUERIES["postings_skiplist_size"] = (
    postings_skiplist_size,
    _sql_skiplist_size(),
)


# ------------------------------------- gap-entropy compression bound

# The information-theoretic yardstick for the whole codec bake-off
# (varbyte / γ/δ / EF / PEF / roaring / BP128 above): a zero-order
# entropy coder cannot beat H(gap distribution) bits per gap, so
# per flagship term we compute the d-gap histogram's Shannon entropy and
# the implied floor ceil(df·H/8) bytes, next to the best measured codec.
# Gaps use the same (term, doc) spine as every sizing op; the first
# posting's docID is excluded (it is a base, not a gap — same convention
# as postings_bp128_size).
#
# Determinism: per-gap-value contributions are integer micro-nats
# (round(1e6·c·ln c) — the curation_secret_entropy discipline; an
# engine-ordered double Σ c·ln c drifts by ulps), H_micro =
# round(1e6·ln n) − Σcm DIV n, and the byte floor converts with pure
# integer arithmetic ((n·H_micro) DIV (8·1e6·ln2 scaled as the exact
# rational 5545177/1000000·... kept simpler: bits = n·H_micro nat-µ →
# bytes floor = (n·H_micro) DIV 5545177, since 8 bits = 8·ln2 nats =
# 5.545177 nats exactly to the micro digit used on BOTH engines).
#
# Scale shape: one (term, doc) agg + one per-term window for gaps + one
# (term, gap) histogram + one term agg.


def postings_gap_entropy_bound(spark, sf_dir):
    """(term, n_gaps, n_distinct_gaps, h_micro_nats, entropy_floor_bytes):
    zero-order Shannon bound of each flagship term's d-gap stream."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    tf = (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term").isin(BM25_TERMS))
        .select("term", "doc_id")
        .distinct()
    )
    wt = W.partitionBy("term").orderBy("doc_id")
    gaps = (
        tf.withColumn("gap", F.col("doc_id") - F.lag("doc_id").over(wt))
        .filter(F.col("gap").isNotNull())
        .groupBy("term", "gap")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ent = (
        gaps.withColumn(
            "cm",
            F.expr(
                "CAST(round(1000000.0e0 * c * ln(1.0e0 * c), 0) AS BIGINT)"
            ),
        )
        .groupBy("term")
        .agg(
            F.sum("c").cast("long").alias("n_gaps"),
            F.count("*").cast("long").alias("n_distinct_gaps"),
            F.sum("cm").cast("long").alias("sum_cm"),
        )
        .withColumn(
            "h_micro_nats",
            F.expr(
                "CAST(round(1000000.0e0 * ln(1.0e0 * n_gaps), 0) AS BIGINT)"
                " - (sum_cm DIV n_gaps)"
            ).cast("long"),
        )
        .withColumn(
            "entropy_floor_bytes",
            F.expr("(n_gaps * h_micro_nats) DIV 5545177").cast("long"),
        )
    )
    return ent.select(
        "term", "n_gaps", "n_distinct_gaps", "h_micro_nats",
        "entropy_floor_bytes",
    )


SQL_GAP_ENTROPY_BOUND = f"""
WITH toks AS ({SQL_DOC_TOKS}),
tf AS (
  SELECT DISTINCT term, doc_id FROM toks
  WHERE term IN ('key', 'value', 'table')
),
gaps AS (
  SELECT term, gap, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT term,
           doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
             AS gap
    FROM tf
  ) WHERE gap IS NOT NULL
  GROUP BY 1, 2
),
ent AS (
  SELECT term,
         CAST(sum(c) AS BIGINT) AS n_gaps,
         CAST(count(*) AS BIGINT) AS n_distinct_gaps,
         CAST(sum(CAST(round(1000000.0e0 * c * ln(1.0e0 * c), 0) AS BIGINT))
              AS BIGINT) AS sum_cm
  FROM gaps GROUP BY term
)
SELECT term, n_gaps, n_distinct_gaps,
       CAST(round(1000000.0e0 * ln(1.0e0 * n_gaps), 0) AS BIGINT)
         - (sum_cm // n_gaps) AS h_micro_nats,
       CAST((n_gaps * (CAST(round(1000000.0e0 * ln(1.0e0 * n_gaps), 0)
                            AS BIGINT) - (sum_cm // n_gaps)))
            // 5545177 AS BIGINT) AS entropy_floor_bytes
FROM ent
"""

QUERIES["postings_gap_entropy_bound"] = (
    postings_gap_entropy_bound,
    SQL_GAP_ENTROPY_BOUND,
)


# ----------------------------------- intersection strategy cost model

# The AND-serving planner's core decision — linear MERGE vs SvS GALLOPING
# (Demaine, López-Ortiz & Munro, SODA 2000; Lucene picks per-clause by
# the same df ratio) — evaluated as exact integer comparison counts over
# the REAL postings of flagship term pairs:
#   merge_cost  = n_small + n_large            (two-pointer scan)
#   gallop_cost = Σ_i (2·⌊log2(g_i + 1)⌋ + 1)  (per small-list element:
#     doubling probes + binary search over the advance g_i it forced in
#     the large list)
# with g_i the gap between consecutive insertion positions of the small
# list's elements in the large list — the standard adaptive-intersection
# cost measure. ⌊log2(x)⌋ = length(bin(x)) − 1 (the
# postings_gamma_delta_size idiom, integer in both engines).
#
# The corpus gives a genuine regime split: 'dup' (df ≈ 25) vs any head
# term (df ≈ 380) is the galloping regime; two head terms are the merge
# regime — a pytest pins both, plus a pure-Python recompute of every
# row from raw postings.
#
# Scale shape: postings come from the term-filtered token scan (the
# serving plan's posting source); insertion positions ride ONE
# (pair, doc_id)-ordered window per pair — the union frame is the size
# of the two postings lists, never corpus-wide; the 4-row output aggs
# map-side. At serving time the engine reads the same numbers from
# dictionary df stats — this operator is the offline planner twin.

ISECT_PAIRS = (("dup", "key"), ("dup", "merge"), ("key", "value"),
               ("scan", "batch"))


def postings_intersection_cost_eval(spark, sf_dir):
    """(term_small, term_large, n_small, n_large, inter_size,
    merge_cost, gallop_cost): exact comparison-count cost model for
    merge vs SvS-galloping intersection of flagship term-pair postings."""
    terms = sorted({t for p in ISECT_PAIRS for t in p})
    post = (
        doc_tokens(spark, sf_dir)
        .filter(F.col("term").isin(terms))
        .select("term", "doc_id")
        .distinct()
        .cache()
    )
    dfs = post.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    pairs = spark.createDataFrame(
        [(a, b) for a, b in ISECT_PAIRS], "ta string, tb string"
    )
    # role assignment: small = smaller df (term asc tie-break)
    roles = (
        pairs.join(
            F.broadcast(dfs.select(F.col("term").alias("ta"),
                                   F.col("df").alias("dfa"))), "ta")
        .join(
            F.broadcast(dfs.select(F.col("term").alias("tb"),
                                   F.col("df").alias("dfb"))), "tb")
        .select(
            F.expr(
                "CASE WHEN dfa < dfb OR (dfa = dfb AND ta < tb)"
                " THEN ta ELSE tb END"
            ).alias("term_small"),
            F.expr(
                "CASE WHEN dfa < dfb OR (dfa = dfb AND ta < tb)"
                " THEN tb ELSE ta END"
            ).alias("term_large"),
        )
    )
    rows = (
        roles.join(
            post.select(F.col("term").alias("term_small"),
                        "doc_id", F.lit(1).alias("is_small")),
            "term_small",
        )
        .select("term_small", "term_large", "doc_id", "is_small")
        .unionByName(
            roles.join(
                post.select(F.col("term").alias("term_large"),
                            "doc_id", F.lit(0).alias("is_small")),
                "term_large",
            ).select("term_small", "term_large", "doc_id", "is_small")
        )
    )
    # insertion position r = # large elements <= this small element
    # (large rows sort before small at equal doc_id: is_small asc)
    w_pos = (
        W.partitionBy("term_small", "term_large")
        .orderBy("doc_id", "is_small")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_lag = W.partitionBy("term_small", "term_large").orderBy("doc_id")
    small_rows = (
        rows.withColumn(
            "r", F.sum(1 - F.col("is_small")).over(w_pos).cast("long")
        )
        .filter(F.col("is_small") == 1)
        .withColumn("g", F.col("r") - F.coalesce(
            F.lag("r").over(w_lag), F.lit(0)))
    )
    costs = small_rows.groupBy("term_small", "term_large").agg(
        F.count("*").cast("long").alias("n_small"),
        F.sum(
            F.expr("2 * (length(bin(g + 1)) - 1) + 1")
        ).cast("long").alias("gallop_cost"),
    )
    inter = (
        rows.groupBy("term_small", "term_large", "doc_id")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") == 2)
        .groupBy("term_small", "term_large")
        .agg(F.count("*").cast("long").alias("inter_size"))
    )
    nl = rows.filter(F.col("is_small") == 0).groupBy(
        "term_small", "term_large"
    ).agg(F.count("*").cast("long").alias("n_large"))
    return (
        costs.join(nl, ["term_small", "term_large"])
        .join(inter, ["term_small", "term_large"], "left")
        .select(
            "term_small", "term_large", "n_small", "n_large",
            F.coalesce("inter_size", F.lit(0)).cast("long").alias(
                "inter_size"),
            (F.col("n_small") + F.col("n_large")).cast("long").alias(
                "merge_cost"),
            "gallop_cost",
        )
    )


def _sql_isect_cost() -> str:
    pvals = ", ".join(f"('{a}', '{b}')" for a, b in ISECT_PAIRS)
    terms = ", ".join(
        f"'{t}'" for t in sorted({t for p in ISECT_PAIRS for t in p})
    )
    return f"""
WITH toks AS ({SQL_DOC_TOKS}),
post AS MATERIALIZED (
  SELECT DISTINCT term, doc_id FROM toks WHERE term IN ({terms})
),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
pairs AS (SELECT * FROM (VALUES {pvals}) v(ta, tb)),
roles AS (
  SELECT CASE WHEN a.df < b.df OR (a.df = b.df AND ta < tb)
              THEN ta ELSE tb END AS term_small,
         CASE WHEN a.df < b.df OR (a.df = b.df AND ta < tb)
              THEN tb ELSE ta END AS term_large
  FROM pairs JOIN dfs a ON a.term = ta JOIN dfs b ON b.term = tb
),
rows_ AS (
  SELECT r.term_small, r.term_large, p.doc_id, 1 AS is_small
  FROM roles r JOIN post p ON p.term = r.term_small
  UNION ALL
  SELECT r.term_small, r.term_large, p.doc_id, 0 AS is_small
  FROM roles r JOIN post p ON p.term = r.term_large
),
pos AS (
  SELECT term_small, term_large, doc_id, is_small,
         CAST(sum(1 - is_small) OVER (
           PARTITION BY term_small, term_large
           ORDER BY doc_id, is_small
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS r
  FROM rows_
),
small_rows AS (
  SELECT term_small, term_large,
         r - coalesce(lag(r) OVER (
           PARTITION BY term_small, term_large ORDER BY doc_id
         ), 0) AS g
  FROM pos WHERE is_small = 1
),
costs AS (
  SELECT term_small, term_large,
         CAST(count(*) AS BIGINT) AS n_small,
         CAST(sum(2 * (length(bin(g + 1)) - 1) + 1) AS BIGINT)
           AS gallop_cost
  FROM small_rows GROUP BY 1, 2
),
inter AS (
  SELECT term_small, term_large, CAST(count(*) AS BIGINT) AS inter_size
  FROM (
    SELECT term_small, term_large, doc_id
    FROM rows_ GROUP BY 1, 2, 3 HAVING count(*) = 2
  ) GROUP BY 1, 2
),
nl AS (
  SELECT term_small, term_large, CAST(count(*) AS BIGINT) AS n_large
  FROM rows_ WHERE is_small = 0 GROUP BY 1, 2
)
SELECT c.term_small, c.term_large, c.n_small, n.n_large,
       CAST(coalesce(i.inter_size, 0) AS BIGINT) AS inter_size,
       CAST(c.n_small + n.n_large AS BIGINT) AS merge_cost,
       c.gallop_cost
FROM costs c
JOIN nl n USING (term_small, term_large)
LEFT JOIN inter i USING (term_small, term_large)
"""


QUERIES["postings_intersection_cost_eval"] = (
    postings_intersection_cost_eval,
    _sql_isect_cost(),
)


# ------------------------------------------ ReDDE resource selection

# Si & Callan (SIGIR 2003) ReDDE federated-search resource selection —
# the query-time complement of the static shard planners
# (index_shard_skew / shard_merge_plan / consistent_hash_eval): rank
# shards by their ESTIMATED count of relevant documents, computed from a
# small central sample of every shard. The flagship query is scored over
# the sample with the sample's own BM25 statistics (the central sample
# index IS the scorer in ReDDE — documented); each of the top SR_K
# sample hits votes for its home shard, and the vote scales up by the
# shard's sample rate: est = votes · n_docs / n_sampled. Shards are then
# admitted in decreasing estimate order until SR_COVER_PCT % of the
# total estimated relevance mass is covered — the broker's fan-out set.
#
# Determinism: shard assignment and sampling are md5 scatters; the BM25
# top-K carries the (score desc, doc_id asc) tie-break; estimates are
# floored milli divisions; the admission rule compares exact integers
# (prev_cum · 100 < total · SR_COVER_PCT).
#
# Scale shape: the sample relation is a hash-filtered scan (a 1/SR_RATE
# fraction of the corpus — at web scale the sample is materialized once,
# the ReDDE deployment); scoring is the flagship impact join on the
# sample only; everything after is NSHARDS rows.

SR_SHARDS = 8
SR_RATE = 4  # sample = 1/4 of docs
SR_K = 40
SR_COVER_PCT = 80


def shard_select_redde(spark, sf_dir):
    """(shard, n_docs, n_sampled, votes, est_milli, rank, selected):
    ReDDE shard relevance estimates for the flagship query and the
    {SR_COVER_PCT}%-mass fan-out selection."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sh|"), F.col("doc_id").cast("string"))),
                    1, 14,
                ), 16, 10,
            ).cast("long") % SR_SHARDS
        ).alias("shard"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))),
                    1, 14,
                ), 16, 10,
            ).cast("long") % SR_RATE == 0
        ).alias("sampled"),
    ).cache()
    per_shard = docs.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("sampled").cast("long")).cast("long").alias("n_sampled"),
    )
    sample_ids = docs.filter("sampled").select("doc_id")
    toks = doc_tokens(spark, sf_dir).join(
        F.broadcast(sample_ids), "doc_id", "left_semi"
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = sample_ids.agg(F.count("*").alias("n")).crossJoin(
        dl.agg((F.sum("dl") / F.count("*")).alias("avgdl"))
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
        .withColumn(
            "contrib",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    top = scored.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(SR_K)
    votes = (
        top.join(docs.select("doc_id", "shard"), "doc_id")
        .groupBy("shard")
        .agg(F.count("*").cast("long").alias("votes"))
    )
    est = (
        per_shard.join(votes, "shard", "left")
        .select(
            "shard",
            "n_docs",
            "n_sampled",
            F.coalesce("votes", F.lit(0)).cast("long").alias("votes"),
        )
        .withColumn(
            "est_milli",
            F.expr(
                "CAST((1000 * votes * n_docs) DIV greatest(n_sampled, 1)"
                " AS BIGINT)"
            ),
        )
    )
    wr = W.orderBy(F.col("est_milli").desc(), F.col("shard").asc())
    ranked = est.withColumn("rank", F.row_number().over(wr)).withColumn(
        "prev_cum",
        F.coalesce(
            F.sum("est_milli").over(wr.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    )
    tot = F.broadcast(est.agg(F.sum("est_milli").cast("long").alias("tot")))
    return ranked.crossJoin(tot).select(
        "shard", "n_docs", "n_sampled", "votes", "est_milli", "rank",
        F.expr(
            f"(prev_cum * 100 < tot * {SR_COVER_PCT}) AND est_milli > 0"
        ).alias("selected"),
    )


def _sql_redde() -> str:
    terms = ", ".join(
        f"'{t}'" for t in ("key", "value", "table")
    )
    h_sh = _SQL_HASH56.format(col="'sh|' || CAST(doc_id AS VARCHAR)")
    h_sm = _SQL_HASH56.format(col="'smp|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH dsh AS MATERIALIZED (
  SELECT doc_id, {h_sh} % {SR_SHARDS} AS shard,
         ({h_sm} % {SR_RATE} = 0) AS sampled
  FROM documents
),
per_shard AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled
  FROM dsh GROUP BY 1
),
toks AS (
  SELECT t.doc_id, t.term FROM ({SQL_DOC_TOKS}) t
  JOIN dsh ON dsh.doc_id = t.doc_id AND dsh.sampled
),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM dsh WHERE sampled) AS n,
         (SELECT sum(dl) * 1.0e0 / count(*) FROM dls) AS avgdl
),
qtf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks
  WHERE term IN ({terms}) GROUP BY 1, 2
),
qdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtf GROUP BY 1),
topd AS (
  SELECT doc_id FROM (
    SELECT doc_id, round(sum(
      ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
      * (tf * 2.2e0)
      / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
    ), 6) AS score
    FROM qtf t JOIN qdf USING (term) JOIN dls USING (doc_id)
    CROSS JOIN stats GROUP BY doc_id
  ) ORDER BY score DESC, doc_id ASC LIMIT {SR_K}
),
votes AS (
  SELECT d.shard, CAST(count(*) AS BIGINT) AS votes
  FROM topd JOIN dsh d USING (doc_id) GROUP BY 1
),
est AS (
  SELECT p.shard, p.n_docs, p.n_sampled,
         CAST(coalesce(v.votes, 0) AS BIGINT) AS votes,
         CAST((1000 * coalesce(v.votes, 0) * p.n_docs)
              // greatest(p.n_sampled, 1) AS BIGINT) AS est_milli
  FROM per_shard p LEFT JOIN votes v USING (shard)
),
ranked AS (
  SELECT *,
         CAST(row_number() OVER w AS INT) AS rank,
         CAST(coalesce(sum(est_milli) OVER (
           w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS prev_cum
  FROM est
  WINDOW w AS (ORDER BY est_milli DESC, shard ASC)
),
tot AS (SELECT CAST(sum(est_milli) AS BIGINT) AS tot FROM est)
SELECT shard, n_docs, n_sampled, votes, est_milli, rank,
       (prev_cum * 100 < tot * {SR_COVER_PCT}) AND est_milli > 0
         AS selected
FROM ranked CROSS JOIN tot
"""


QUERIES["shard_select_redde"] = (shard_select_redde, _sql_redde())


# ------------------------------------------ CORI resource selection

# Callan, Lu & Croft (SIGIR 1995) CORI — the STATISTICS-based federated
# resource-selection classic next to the sample-based shard_select_redde
# (production brokers run both families; their agreement is itself a
# signal): each shard is scored as a "giant document" by a tf-idf
# analogue over shard-level df statistics,
#   T = df_s / (df_s + 50 + 150·cw_s/avg_cw)
#   I = ln((NS + 0.5) / cf_t) / ln(NS + 1.0)
#   bel(q, s) = Σ_t (0.4 + 0.6·T·I) / |q|
# with df_s = term df inside shard s, cw_s = shard token count, cf_t =
# number of shards containing t. Same md5 shard assignment as ReDDE so
# the two operators rank THE SAME shards and can disagree honestly.
#
# Determinism: df/cw are exact BIGINTs; T, I and the belief go through
# ONE shared float-expression string on identical integers (the
# micro-floor idiom); ranking ties (bel desc, shard asc).
#
# Scale shape: everything flows from one (shard, term) df aggregation
# of the term-filtered scan — dictionary-by-shards sized; no sample
# materialization (CORI's operational advantage over ReDDE, and why
# engines keep both: df stats are already in every shard's dictionary).

CORI_DB = 0.4  # default belief

_CORI_BEL = (
    "(CASE WHEN df_s = 0 THEN 0.0e0 ELSE"
    f" {CORI_DB}e0 + {1 - CORI_DB:.1f}e0"
    " * (df_s / (df_s + 50.0e0 + 150.0e0 * cw_s / avg_cw))"
    f" * (ln(({{ns}} + 0.5e0) / cf_t) / ln({{ns}} + 1.0e0)) END)"
)


def shard_select_cori(spark, sf_dir):
    """(shard, cw_s, bel_micro, rank): CORI belief scores of the
    {SR_SHARDS} md5 shards for the flagship query, df-statistics only."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    toks = doc_tokens(spark, sf_dir).select(
        "doc_id",
        "term",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sh|"), F.col("doc_id").cast("string"))),
                    1, 14,
                ), 16, 10,
            ).cast("long") % SR_SHARDS
        ).alias("shard"),
    )
    cw = toks.groupBy("shard").agg(F.count("*").cast("long").alias("cw_s"))
    avg_cw = F.broadcast(
        cw.agg((F.sum("cw_s") / F.count("*")).alias("avg_cw"))
    )
    dfs = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("shard", "term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df_s"))
    )
    cf = dfs.filter(F.col("df_s") > 0).groupBy("term").agg(
        F.count("*").cast("long").alias("cf_t")
    )
    qterms = spark.createDataFrame(
        [(t,) for t in BM25_TERMS], "term string"
    )
    grid = (
        cw.crossJoin(F.broadcast(qterms))
        .join(dfs, ["shard", "term"], "left")
        .join(F.broadcast(cf), "term", "left")
        .crossJoin(avg_cw)
        .select(
            "shard",
            "cw_s",
            F.coalesce("df_s", F.lit(0)).cast("long").alias("df_s"),
            F.coalesce("cf_t", F.lit(1)).cast("long").alias("cf_t"),
            "avg_cw",
        )
    )
    nq = len(BM25_TERMS)
    bel = grid.groupBy("shard", "cw_s").agg(
        F.expr(
            "CAST(floor(sum("
            + _CORI_BEL.format(ns=SR_SHARDS)
            + f") / {nq}.0e0 * 1.0e6 + 0.5e0) AS BIGINT)"
        ).alias("bel_micro")
    )
    wr = W.orderBy(F.col("bel_micro").desc(), F.col("shard").asc())
    return bel.withColumn(
        "rank", F.row_number().over(wr)
    ).select("shard", "cw_s", "bel_micro", "rank")


def _sql_cori() -> str:
    terms = ", ".join(f"'{t}'" for t in ("key", "value", "table"))
    tvals = ", ".join(f"('{t}')" for t in ("key", "value", "table"))
    h_sh = _SQL_HASH56.format(col="'sh|' || CAST(doc_id AS VARCHAR)")
    nq = 3
    bel = _CORI_BEL.format(ns=SR_SHARDS)
    return f"""
WITH toks AS (
  SELECT t.doc_id, t.term, {h_sh} % {SR_SHARDS} AS shard
  FROM ({SQL_DOC_TOKS}) t
),
cw AS (SELECT shard, CAST(count(*) AS BIGINT) AS cw_s FROM toks GROUP BY 1),
acw AS (SELECT sum(cw_s) * 1.0e0 / count(*) AS avg_cw FROM cw),
dfs AS (
  SELECT shard, term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_s
  FROM toks WHERE term IN ({terms}) GROUP BY 1, 2
),
cf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf_t
  FROM dfs WHERE df_s > 0 GROUP BY 1
),
grid AS (
  SELECT c.shard, c.cw_s,
         CAST(coalesce(d.df_s, 0) AS BIGINT) AS df_s,
         CAST(coalesce(f.cf_t, 1) AS BIGINT) AS cf_t,
         (SELECT avg_cw FROM acw) AS avg_cw
  FROM cw c
  CROSS JOIN (SELECT * FROM (VALUES {tvals}) v(term)) q
  LEFT JOIN dfs d ON d.shard = c.shard AND d.term = q.term
  LEFT JOIN cf f ON f.term = q.term
),
bel AS (
  SELECT shard, cw_s,
         CAST(floor(sum({bel}) / {nq}.0e0 * 1.0e6 + 0.5e0) AS BIGINT)
           AS bel_micro
  FROM grid GROUP BY 1, 2
)
SELECT shard, cw_s, bel_micro,
       CAST(row_number() OVER (ORDER BY bel_micro DESC, shard ASC) AS INT)
         AS rank
FROM bel
"""


QUERIES["shard_select_cori"] = (shard_select_cori, _sql_cori())


# ------------------------------------------ hedged-request tail eval

# Dean & Barroso, "The Tail at Scale" (CACM 2013): a fan-out query is as
# slow as its SLOWEST shard, so per-shard tail latency multiplies at the
# broker — and hedged requests (send a backup replica request, take the
# first answer) crush the tail for ~2× the work on the straggler
# fraction only. This operator quantifies that on a synthesized
# latency model: per (query, shard, replica), latency = BASE + md5
# jitter + a 2%-probability straggler spike (the bimodal shape real
# serving fleets measure). Three policies over the SAME draws:
#   single  — max over shards of replica-1            (no hedging)
#   hedged  — max over shards of min(replica-1, -2)   (full hedge)
#   tied    — hedge only when replica-1 drew the spike (deferred hedge:
#             the work-bounded variant actually deployed)
# Output: exact order-statistic p50/p95/p99 and mean per policy.
#
# Determinism: latencies are integer milliseconds from md5 scatters;
# quantiles are EXACT order statistics (row_number over (latency,
# query_id) — unique tie-break, the repo's top-k rule; index =
# ceil(q·n) on the 1-based rank); means are floored micro divisions.
#
# Scale shape: map-only synthesis over a query×shard×replica grid
# (dimension explode), one per-query max agg, one per-policy rank
# window over the query-count-sized frame.

HEDGE_QUERIES = 1000
HEDGE_SHARDS = 8
HEDGE_BASE_MS = 10
HEDGE_SPIKE_MS = 200


def serving_hedge_tail_eval(spark, sf_dir):
    """(policy, n, p50_ms, p95_ms, p99_ms, mean_micro_ms): fan-out
    latency distribution under no / full / spike-tied hedging over the
    same planted per-replica latency draws."""
    grid = (
        spark.range(HEDGE_QUERIES)
        .select(F.col("id").alias("q"))
        .crossJoin(
            F.broadcast(
                spark.range(HEDGE_SHARDS).select(F.col("id").alias("s"))
            )
        )
    )

    def lat(rep: int) -> F.Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(f"lat{rep}"), F.col("q").cast("string"),
                        F.col("s").cast("string"),
                    )
                ), 1, 14,
            ), 16, 10,
        ).cast("long")
        h2 = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(f"spk{rep}"), F.col("q").cast("string"),
                        F.col("s").cast("string"),
                    )
                ), 1, 14,
            ), 16, 10,
        ).cast("long")
        return (
            F.lit(HEDGE_BASE_MS)
            + h % 20
            + F.when(h2 % 50 < 1, F.lit(HEDGE_SPIKE_MS)).otherwise(0)
        ).cast("long")

    drawn = grid.select(
        "q", "s", lat(1).alias("l1"), lat(2).alias("l2")
    )
    per_shard = drawn.select(
        "q",
        F.col("l1").alias("single"),
        F.least("l1", "l2").alias("hedged"),
        F.expr(
            f"CASE WHEN l1 >= {HEDGE_SPIKE_MS} THEN least(l1, l2)"
            " ELSE l1 END"
        ).cast("long").alias("tied"),
    )
    per_q = per_shard.groupBy("q").agg(
        F.max("single").alias("single"),
        F.max("hedged").alias("hedged"),
        F.max("tied").alias("tied"),
    )
    pols = per_q.selectExpr(
        "q", "stack(3, 'single', single, 'hedged', hedged,"
        " 'tied', tied) AS (policy, lat_ms)"
    )
    wp = W.partitionBy("policy").orderBy(F.col("lat_ms").asc(), F.col("q").asc())
    ranked = pols.withColumn("rk", F.row_number().over(wp))
    n = HEDGE_QUERIES
    qpos = {
        "p50_ms": (50 * n + 99) // 100,
        "p95_ms": (95 * n + 99) // 100,
        "p99_ms": (99 * n + 99) // 100,
    }
    quants = ranked.groupBy("policy").agg(
        F.count("*").cast("long").alias("n"),
        *[
            F.max(F.when(F.col("rk") == pos, F.col("lat_ms")))
            .cast("long")
            .alias(name)
            for name, pos in qpos.items()
        ],
        F.expr("CAST((1000000 * sum(lat_ms)) DIV count(*) AS BIGINT)").alias(
            "mean_micro_ms"
        ),
    )
    return quants.select(
        "policy", "n", "p50_ms", "p95_ms", "p99_ms", "mean_micro_ms"
    )


def _sql_hedge() -> str:
    n = HEDGE_QUERIES
    qpos = {
        "p50_ms": (50 * n + 99) // 100,
        "p95_ms": (95 * n + 99) // 100,
        "p99_ms": (99 * n + 99) // 100,
    }

    def lat(rep):
        return (
            f"{HEDGE_BASE_MS}"
            f" + CAST(('0x' || substr(md5('lat{rep}' || '|' ||"
            f" CAST(q AS VARCHAR) || '|' || CAST(s AS VARCHAR)), 1, 14))"
            f" AS BIGINT) % 20"
            f" + CASE WHEN CAST(('0x' || substr(md5('spk{rep}' || '|' ||"
            f" CAST(q AS VARCHAR) || '|' || CAST(s AS VARCHAR)), 1, 14))"
            f" AS BIGINT) % 50 < 1 THEN {HEDGE_SPIKE_MS} ELSE 0 END"
        )

    qsel = ",\n       ".join(
        f"CAST(max(CASE WHEN rk = {pos} THEN lat_ms END) AS BIGINT)"
        f" AS {name}"
        for name, pos in qpos.items()
    )
    return f"""
WITH grid AS (
  SELECT CAST(q AS BIGINT) AS q, CAST(s AS BIGINT) AS s
  FROM (SELECT unnest(range({HEDGE_QUERIES})) AS q)
  CROSS JOIN (SELECT unnest(range({HEDGE_SHARDS})) AS s)
),
drawn AS (
  SELECT q, s,
         CAST({lat(1)} AS BIGINT) AS l1,
         CAST({lat(2)} AS BIGINT) AS l2
  FROM grid
),
per_shard AS (
  SELECT q, l1 AS single, least(l1, l2) AS hedged,
         CASE WHEN l1 >= {HEDGE_SPIKE_MS} THEN least(l1, l2) ELSE l1 END
           AS tied
  FROM drawn
),
per_q AS (
  SELECT q, max(single) AS single, max(hedged) AS hedged,
         max(tied) AS tied
  FROM per_shard GROUP BY 1
),
pols AS (
  SELECT q, 'single' AS policy, single AS lat_ms FROM per_q
  UNION ALL SELECT q, 'hedged', hedged FROM per_q
  UNION ALL SELECT q, 'tied', tied FROM per_q
),
ranked AS (
  SELECT policy, q, lat_ms,
         row_number() OVER (PARTITION BY policy
                            ORDER BY lat_ms ASC, q ASC) AS rk
  FROM pols
)
SELECT policy, CAST(count(*) AS BIGINT) AS n,
       {qsel},
       CAST((1000000 * CAST(sum(lat_ms) AS BIGINT)) // count(*) AS BIGINT)
         AS mean_micro_ms
FROM ranked GROUP BY policy
"""


QUERIES["serving_hedge_tail_eval"] = (serving_hedge_tail_eval, _sql_hedge())


# ------------------------------------------ filter storage advisor

# The per-filter-value physical-layout decision every engine makes
# (Lucene: postings vs docvalues bitmap; warehouses: RLE bitmap vs
# id-list): for each facet value of the two filterable document
# dimensions (lang, source), store the matching docID set as a delta-
# varbyte postings run (bytes grow with df and SHRINK with clustering —
# dense runs have 1-byte gaps) or as a dense bitmap over the docID
# space (bytes = ⌈N/8⌉, df-independent)? The advisor computes BOTH
# exact byte costs from the real docID distribution and picks the
# smaller (ties → postings, the seekable format). The classic rule of
# thumb (bitmap wins past ~1/8 density with ~1-byte gaps) falls out of
# the numbers rather than being assumed.
#
# Determinism: gaps via a per-value lag window on docIDs; byte lengths
# through the SHARED _vb_len threshold expression; all counts BIGINT.
#
# Scale shape: one (dimension, value)-keyed window over the projected
# doc table + one agg; output is facet-cardinality. At web scale this
# runs on the same sorted-docID pass the index build already makes.


def filter_storage_advisor(spark, sf_dir):
    """(dim, value, df, density_milli, postings_bytes, bitmap_bytes,
    chosen): exact storage-format decision per filterable facet value."""
    docs = load(spark, sf_dir, "documents")
    n_df = F.broadcast(docs.agg(F.count("*").cast("long").alias("n")))
    vals = docs.selectExpr(
        "doc_id", "stack(2, 'lang', lang, 'source', source) AS (dim, value)"
    )
    wv = W.partitionBy("dim", "value").orderBy("doc_id")
    gaps = vals.withColumn(
        "gap",
        (F.col("doc_id") - F.coalesce(
            F.lag("doc_id").over(wv), F.lit(-1)
        )).cast("long"),
    )
    per = gaps.groupBy("dim", "value").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(F.expr(_vb_len("gap"))).cast("long").alias("postings_bytes"),
    )
    return per.crossJoin(n_df).select(
        "dim",
        "value",
        "df",
        F.expr("CAST((1000 * df) DIV n AS BIGINT)").alias("density_milli"),
        "postings_bytes",
        F.expr("CAST((n + 7) DIV 8 AS BIGINT)").alias("bitmap_bytes"),
        F.expr(
            "CASE WHEN postings_bytes <= (n + 7) DIV 8"
            " THEN 'postings' ELSE 'bitmap' END"
        ).alias("chosen"),
    )


def _sql_storage_advisor() -> str:
    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
vals AS (
  SELECT doc_id, 'lang' AS dim, lang AS value FROM documents
  UNION ALL
  SELECT doc_id, 'source', source FROM documents
),
gaps AS (
  SELECT dim, value,
         CAST(doc_id - coalesce(lag(doc_id) OVER (
           PARTITION BY dim, value ORDER BY doc_id
         ), -1) AS BIGINT) AS gap
  FROM vals
),
per AS (
  SELECT dim, value, CAST(count(*) AS BIGINT) AS df,
         CAST(sum({_vb_len('gap')}) AS BIGINT) AS postings_bytes
  FROM gaps GROUP BY 1, 2
)
SELECT dim, value, df,
       CAST((1000 * df) // n AS BIGINT) AS density_milli,
       postings_bytes,
       CAST((n + 7) // 8 AS BIGINT) AS bitmap_bytes,
       CASE WHEN postings_bytes <= (n + 7) // 8
            THEN 'postings' ELSE 'bitmap' END AS chosen
FROM per CROSS JOIN nn
"""


QUERIES["filter_storage_advisor"] = (
    filter_storage_advisor,
    _sql_storage_advisor(),
)


# ------------------------------------------ rendezvous (HRW) hashing

# Thaler & Ravishankar's Highest-Random-Weight hashing — the OTHER
# minimal-disruption placement scheme next to consistent_hash_eval's
# virtual-node ring (real fleets choose between them: HRW needs no ring
# state and gives per-key independence, the ring gives O(log n)
# lookup): every doc lands on the shard maximizing md5(doc, shard), at
# NS and again at NS+1 shards. The two defining properties are pinned:
# (1) MINIMAL DISRUPTION — a doc moves ONLY to the newly added shard
# (its old argmax is unchanged unless the new shard's weight beats it);
# (2) BALANCE — per-shard load stays near n/NS without virtual nodes
# (the ring needs CH_VNODES of them for the same spread; the balance
# columns make the comparison readable).
#
# Determinism: weights are the md5-56bit integers themselves; argmax
# ties (weight desc, shard asc) — a measure-zero tie on 56-bit hashes
# but the total order is the contract.
#
# Scale shape: a docs × NS weight grid (dimension explode, map-only) +
# one argmax window per regime + one shard agg. HRW's own cost model.

HRW_N = 8


def rendezvous_hash_eval(spark, sf_dir):
    """(shard, n_docs_new, n_docs_old, n_moved_in, load_new_milli):
    HRW assignment at {HRW_N + 1} shards vs {HRW_N}, per new shard."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n_df = F.broadcast(docs.agg(F.count("*").cast("long").alias("n")))

    def assign(ns: int, out: str):
        shards = spark.range(ns).select(F.col("id").cast("long").alias("s"))
        grid = docs.crossJoin(F.broadcast(shards)).select(
            "doc_id",
            "s",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit("hrw"), F.col("doc_id").cast("string"),
                            F.col("s").cast("string"),
                        )
                    ), 1, 14,
                ), 16, 10,
            ).cast("long").alias("w"),
        )
        wmax = W.partitionBy("doc_id").orderBy(
            F.col("w").desc(), F.col("s").asc()
        )
        return (
            grid.withColumn("rn", F.row_number().over(wmax))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("s").alias(out))
        )

    old = assign(HRW_N, "s_old")
    new = assign(HRW_N + 1, "s_new")
    both = old.join(new, "doc_id")
    agg = both.groupBy(F.col("s_new").alias("shard")).agg(
        F.count("*").cast("long").alias("n_docs_new"),
        F.sum((F.col("s_old") == F.col("s_new")).cast("long"))
        .cast("long")
        .alias("n_stayed"),
    )
    old_sizes = old.groupBy(F.col("s_old").alias("shard")).agg(
        F.count("*").cast("long").alias("n_docs_old")
    )
    return (
        agg.join(old_sizes, "shard", "left")
        .crossJoin(n_df)
        .select(
            "shard",
            "n_docs_new",
            F.coalesce("n_docs_old", F.lit(0)).cast("long").alias(
                "n_docs_old"
            ),
            (F.col("n_docs_new") - F.col("n_stayed")).cast("long").alias(
                "n_moved_in"
            ),
            F.expr(
                f"CAST((1000 * {HRW_N + 1} * n_docs_new) DIV n AS BIGINT)"
            ).alias("load_new_milli"),
        )
    )


def _sql_hrw() -> str:
    h = "CAST(('0x' || substr(md5('hrw' || '|' || CAST(doc_id AS VARCHAR) || '|' || CAST(s AS VARCHAR)), 1, 14)) AS BIGINT)"

    def assign(ns, name):
        return f"""
{name} AS MATERIALIZED (
  SELECT doc_id, s FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY {h} DESC, s ASC) AS rn
    FROM documents
    CROSS JOIN (SELECT CAST(unnest(range({ns})) AS BIGINT) AS s)
  ) WHERE rn = 1
)"""

    return f"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
{assign(HRW_N, 'old_a')},
{assign(HRW_N + 1, 'new_a')},
both_a AS (
  SELECT o.doc_id, o.s AS s_old, w.s AS s_new
  FROM old_a o JOIN new_a w USING (doc_id)
),
agg AS (
  SELECT s_new AS shard, CAST(count(*) AS BIGINT) AS n_docs_new,
         CAST(sum(CASE WHEN s_old = s_new THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stayed
  FROM both_a GROUP BY 1
),
old_sizes AS (
  SELECT s AS shard, CAST(count(*) AS BIGINT) AS n_docs_old
  FROM old_a GROUP BY 1
)
SELECT a.shard, a.n_docs_new,
       CAST(coalesce(o.n_docs_old, 0) AS BIGINT) AS n_docs_old,
       CAST(a.n_docs_new - a.n_stayed AS BIGINT) AS n_moved_in,
       CAST((1000 * {HRW_N + 1} * a.n_docs_new) // n AS BIGINT)
         AS load_new_milli
FROM agg a LEFT JOIN old_sizes o USING (shard) CROSS JOIN nn
"""


QUERIES["rendezvous_hash_eval"] = (rendezvous_hash_eval, _sql_hrw())


# -------------------------------------------- Fagin TA stopping depth

# Fagin's Threshold Algorithm (Fagin, Lotem & Naor, PODS 2001) — the
# instance-optimal top-k over sorted score lists, the relational
# ancestor of every block-max/WAND pruning trick this engine serves
# with: two lists ranked descending (BM25 micro over the flagship
# query; the n_chars rank-feature prior micro), aggregate = sum. At
# sorted depth p the THRESHOLD is T(p) = s₁(p) + s₂(p) — no unseen
# object can beat it — and TA stops at the first p where the k-th best
# COMPLETE score among objects seen in either top-p reaches T(p).
# The operator emits the full depth trace (threshold, k-th best,
# stopped flag); the stopping depth × 2 is the sorted-access cost the
# instance-optimality theorem bounds. Pins: TA is CORRECT (the true
# top-k by total score are all seen by the stopping depth) and
# actually early-terminates (stop ≪ corpus).
#
# Determinism: both scores are exact micro ints; list ranks carry
# doc_id tie-breaks; the k-th best per depth is an exact order
# statistic.
#
# Scale shape: two rank windows + a depth×seen-docs grid bounded by
# TA_MAX_DEPTH (the trace is diagnostic; the SERVING implementation is
# the cursor walk this table explains).

TA_K = 10
TA_MAX_DEPTH = 60


def fagin_ta_cost_eval(spark, sf_dir):
    """(p, t1_micro, t2_micro, threshold_micro, kth_best_micro,
    stopped): the TA depth trace for top-{TA_K} over the BM25 and
    length-prior lists."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s1 = bm25_or_scored(spark, sf_dir).select(
        "doc_id",
        F.expr("CAST(round(score * 1.0e6, 0) AS BIGINT)").alias("s1"),
    )
    feats = (
        docs.join(s1, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("s1", F.lit(0)).cast("long").alias("s1"),
            F.expr(
                "CAST((1000000 * n_chars) DIV (n_chars + 1200) AS BIGINT)"
            ).alias("s2"),
        )
        .withColumn("tot", (F.col("s1") + F.col("s2")).cast("long"))
        .withColumn(
            "r1",
            F.row_number()
            .over(W.orderBy(F.col("s1").desc(), F.col("doc_id").asc()))
            .cast("long"),
        )
        .withColumn(
            "r2",
            F.row_number()
            .over(W.orderBy(F.col("s2").desc(), F.col("doc_id").asc()))
            .cast("long"),
        )
        .cache()
    )
    depths = spark.range(1, TA_MAX_DEPTH + 1).select(
        F.col("id").cast("long").alias("p")
    )
    t1 = feats.select(F.col("r1").alias("p"), F.col("s1").alias("t1_micro"))
    t2 = feats.select(F.col("r2").alias("p"), F.col("s2").alias("t2_micro"))
    seen = (
        depths.join(
            feats.select("doc_id", "tot", "r1", "r2"),
            (F.col("r1") <= F.col("p")) | (F.col("r2") <= F.col("p")),
        )
    )
    wk = W.partitionBy("p").orderBy(F.col("tot").desc(), F.col("doc_id").asc())
    kth = (
        seen.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") == TA_K)
        .select("p", F.col("tot").alias("kth_best_micro"))
    )
    return (
        depths.join(t1, "p")
        .join(t2, "p")
        .join(kth, "p", "left")
        .select(
            "p",
            "t1_micro",
            "t2_micro",
            (F.col("t1_micro") + F.col("t2_micro")).cast("long").alias(
                "threshold_micro"
            ),
            F.coalesce("kth_best_micro", F.lit(0)).cast("long").alias(
                "kth_best_micro"
            ),
            F.expr(
                "coalesce(kth_best_micro, 0) >= t1_micro + t2_micro"
            ).alias("stopped"),
        )
    )


def _sql_fagin_ta() -> str:
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
  SELECT doc_id,
         CAST(round(round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
         ), 6) * 1.0e6, 0) AS BIGINT) AS s1
  FROM qtf t JOIN qdf USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats GROUP BY doc_id
),
feats AS MATERIALIZED (
  SELECT d.doc_id,
         CAST(coalesce(o.s1, 0) AS BIGINT) AS s1,
         CAST((1000000 * d.n_chars) // (d.n_chars + 1200) AS BIGINT) AS s2,
         CAST(coalesce(o.s1, 0)
              + (1000000 * d.n_chars) // (d.n_chars + 1200) AS BIGINT)
           AS tot,
         CAST(row_number() OVER (ORDER BY coalesce(o.s1, 0) DESC,
              d.doc_id ASC) AS BIGINT) AS r1,
         CAST(row_number() OVER (ORDER BY
              (1000000 * d.n_chars) // (d.n_chars + 1200) DESC,
              d.doc_id ASC) AS BIGINT) AS r2
  FROM documents d LEFT JOIN orsc o USING (doc_id)
),
depths AS (
  SELECT CAST(p AS BIGINT) AS p
  FROM (SELECT unnest(range(1, {TA_MAX_DEPTH + 1})) AS p)
),
kth AS (
  SELECT p, tot AS kth_best_micro FROM (
    SELECT dp.p, f.tot, f.doc_id,
           row_number() OVER (PARTITION BY dp.p
                              ORDER BY f.tot DESC, f.doc_id ASC) AS rk
    FROM depths dp JOIN feats f ON f.r1 <= dp.p OR f.r2 <= dp.p
  ) WHERE rk = {TA_K}
)
SELECT dp.p,
       t1.s1 AS t1_micro,
       t2.s2 AS t2_micro,
       CAST(t1.s1 + t2.s2 AS BIGINT) AS threshold_micro,
       CAST(coalesce(k.kth_best_micro, 0) AS BIGINT) AS kth_best_micro,
       coalesce(k.kth_best_micro, 0) >= t1.s1 + t2.s2 AS stopped
FROM depths dp
JOIN feats t1 ON t1.r1 = dp.p
JOIN feats t2 ON t2.r2 = dp.p
LEFT JOIN kth k ON k.p = dp.p
"""


QUERIES["fagin_ta_cost_eval"] = (fagin_ta_cost_eval, _sql_fagin_ta())


# ------------------------------------------ NDV-from-sample (Chao1)

# The query-optimizer statistics problem (every warehouse ANALYZE faces
# it): estimate the number of DISTINCT values from a sample. Raw
# sample-distinct is biased low (rare values are missed); Chao's
# (1984) abundance estimator corrects with the frequency-of-frequency
# tail: NDV̂ = d_s + f₁² / (2·f₂) (f₁ singletons, f₂ doubletons in the
# sample). The natural vocabulary saturates any sample (31 types — the
# CLAUDE.md degenerate-vocabulary trap), so the token stream is
# EXTENDED with the planted pseudo-rare tail (the vocab_oov_holdout
# synthesis: one planted token per doc from an n/2-sized space,
# expected df ≈ 2) — real missable rarity for the sample to miss and
# Chao1 to reconstruct. Pins: the raw sample NDV undercounts the truth,
# Chao1 lands strictly closer (the correction genuinely helps), and
# the estimator is exact integer arithmetic (f₁²·1000 DIV (2·f₂) milli
# + d_s·1000).
#
# Scale shape: one planted-union token scan; sampling is an md5 filter
# on OCCURRENCES (the ANALYZE access path); two dictionary aggs.

NDV_SAMPLE_MOD = 10  # 10% occurrence sample


def ndv_sample_chao_eval(spark, sf_dir):
    """(true_ndv, sample_ndv, f1, f2, chao_ndv_milli): Chao1
    sample-based distinct-count estimate vs the true type count over
    the real+planted token stream."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    space = max(n_docs // 2, 20)
    real = doc_tokens(spark, sf_dir).select("doc_id", "pos", "term")
    planted = docs.select(
        "doc_id",
        F.lit(-1).alias("pos"),
        F.concat(
            F.lit("rare"),
            (
                _hash56(F.concat(F.lit("nv|"), F.col("doc_id").cast("string")))
                % space
            ).cast("string"),
        ).alias("term"),
    )
    stream = real.unionByName(planted)
    true_ndv = F.broadcast(
        stream.agg(F.countDistinct("term").cast("long").alias("true_ndv"))
    )
    sampled = stream.filter(
        _hash56(
            F.concat_ws(
                "|", F.lit("ns2"), F.col("doc_id").cast("string"),
                F.col("pos").cast("string"), F.col("term"),
            )
        )
        % NDV_SAMPLE_MOD
        == 0
    )
    freq = sampled.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    fof = freq.agg(
        F.count("*").cast("long").alias("sample_ndv"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"),
    )
    return fof.crossJoin(true_ndv).select(
        "true_ndv",
        "sample_ndv",
        "f1",
        "f2",
        F.expr(
            "CAST(1000 * sample_ndv"
            " + (1000 * f1 * f1) DIV (2 * greatest(f2, 1)) AS BIGINT)"
        ).alias("chao_ndv_milli"),
    )


def _sql_ndv_chao() -> str:
    h_nv = _SQL_HASH56.format(col="'nv|' || CAST(doc_id AS VARCHAR)")
    h_s = _SQL_HASH56.format(
        col="'ns2' || '|' || CAST(doc_id AS VARCHAR) || '|'"
        " || CAST(pos AS VARCHAR) || '|' || term"
    )
    return f"""
WITH spc AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS space
  FROM documents
),
stream AS (
  SELECT doc_id, pos, term FROM ({SQL_DOC_TOKS})
  UNION ALL
  SELECT doc_id, -1 AS pos,
         'rare' || CAST({h_nv} % (SELECT space FROM spc) AS VARCHAR)
  FROM documents
),
tn AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS true_ndv FROM stream),
sampled AS (
  SELECT term FROM stream WHERE {h_s} % {NDV_SAMPLE_MOD} = 0
),
freq AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM sampled GROUP BY 1),
fof AS (
  SELECT CAST(count(*) AS BIGINT) AS sample_ndv,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM freq
)
SELECT tn.true_ndv, fof.sample_ndv, fof.f1, fof.f2,
       CAST(1000 * fof.sample_ndv
            + (1000 * fof.f1 * fof.f1) // (2 * greatest(fof.f2, 1))
            AS BIGINT) AS chao_ndv_milli
FROM fof CROSS JOIN tn
"""


QUERIES["ndv_sample_chao_eval"] = (ndv_sample_chao_eval, _sql_ndv_chao())


# -------------------------------------- Huffman merge-order scheduling

# Optimal k-way-to-binary merge scheduling (Huffman 1952, applied to
# LSM/segment merging the way tiered_merge_select applies size tiers):
# merging N sorted segments pairwise costs the SUM OF INTERNAL NODE
# WEIGHTS of the merge tree, and Huffman's always-merge-the-two-
# smallest rule minimizes it. The operator synthesizes {HUF_N}
# skewed segment sizes (md5, power-of-two-ish spread — real segment
# distributions are geometric), unrolls the {HUF_N − 1} Huffman steps
# as integer order-statistic picks (the bandit/k-means unrolled-
# iteration contract), and compares the total merge IO against the
# sequential-accumulate order (merge into a growing base — the naive
# compactor) and the fixed balanced-binary-tree order. Huffman's
# optimality on the instance is the pytest pin (≤ both alternatives),
# with the full step trace emitted.
#
# Scale shape: the state is an N-row frame; each step is a 2-row
# TakeOrdered + a union — scheduling cost, not data cost (the merges
# this plans are the expensive part).

HUF_N = 8


def segment_merge_huffman_eval(spark, sf_dir):
    """(step, merged_mb, huffman_cum_mb, seq_cum_mb, balanced_cum_mb):
    per-step merge costs of the Huffman schedule with the sequential
    and balanced-tree totals alongside."""
    from harvester_spark.operators.dedup import _hash56

    segs = (
        spark.range(HUF_N)
        .select(F.col("id").cast("long").alias("seg"))
        .select(
            "seg",
            F.expr(
                "CAST(10 * power(2, CAST(conv(substring(md5(concat('sg|',"
                " CAST(seg AS STRING))), 1, 14), 16, 10) AS BIGINT) % 5)"
                " AS BIGINT)"
            ).alias("mb"),
        )
    )
    sizes = [r["mb"] for r in segs.orderBy("seg").collect()]  # N rows

    # Huffman: repeatedly merge the two smallest (driver loop over the
    # N-row schedule state — inherently sequential, bounded)
    import heapq

    h = sorted(sizes)
    heapq.heapify(h)
    huff_steps = []
    cum = 0
    while len(h) > 1:
        a = heapq.heappop(h)
        b = heapq.heappop(h)
        cum += a + b
        huff_steps.append((a + b, cum))
        heapq.heappush(h, a + b)
    # sequential accumulate: sort ascending, fold left
    seq = sorted(sizes)
    acc = seq[0]
    seq_cum = 0
    seq_steps = []
    for x in seq[1:]:
        acc += x
        seq_cum += acc
        seq_steps.append(seq_cum)
    # balanced binary: merge adjacent pairs of the sorted list per level
    level = sorted(sizes)
    bal_cum = 0
    bal_steps = []
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level) - 1, 2):
            s = level[i] + level[i + 1]
            bal_cum += s
            bal_steps.append(bal_cum)
            nxt.append(s)
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    rows = [
        (
            i + 1,
            huff_steps[i][0],
            huff_steps[i][1],
            seq_steps[i],
            bal_steps[i],
        )
        for i in range(HUF_N - 1)
    ]
    return spark.createDataFrame(
        rows,
        "step int, merged_mb long, huffman_cum_mb long, seq_cum_mb long,"
        " balanced_cum_mb long",
    )


def _sql_huffman() -> str:
    # the oracle recomputes the identical schedules from the identical
    # hash-derived sizes via recursive CTE-free unrolled steps
    h = _SQL_HASH56.format(col="'sg|' || CAST(seg AS VARCHAR)")
    parts = [f"""
WITH segs AS (
  SELECT CAST(seg AS BIGINT) AS seg,
         CAST(10 * power(2, {h} % 5) AS BIGINT) AS mb
  FROM (SELECT unnest(range({HUF_N})) AS seg)
),
sorted_s AS (
  SELECT mb, row_number() OVER (ORDER BY mb, seg) AS rn FROM segs
),
h0 AS (SELECT mb, rn FROM sorted_s)"""]
    # unroll Huffman: at each step pick the two smallest of h{k-1}
    for k in range(1, HUF_N):
        parts.append(f""",
pick{k} AS (
  SELECT mb FROM h{k - 1} ORDER BY mb, rn LIMIT 2
),
m{k} AS (SELECT CAST(sum(mb) AS BIGINT) AS merged FROM pick{k}),
h{k} AS (
  SELECT mb, rn FROM (
    SELECT mb, rn, row_number() OVER (ORDER BY mb, rn) AS rr FROM h{k - 1}
  ) WHERE rr > 2
  UNION ALL
  SELECT merged AS mb, CAST(1000 + {k} AS BIGINT) AS rn FROM m{k}
)""")
    huff = " + ".join(f"(SELECT merged FROM m{j})" for j in range(1, HUF_N))
    # sequential: fold ascending — cum at step i = sum of prefix sums
    parts.append(f""",
seq AS (
  SELECT mb, row_number() OVER (ORDER BY mb, rn) AS i FROM sorted_s
),
seq_steps AS (
  SELECT i - 1 AS step,
         CAST(sum(pref) OVER (ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS seq_cum
  FROM (
    SELECT i, CAST(sum(mb) OVER (ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pref
    FROM seq
  ) WHERE i >= 2
)""")
    # balanced binary for N = 8: 3 levels of adjacent pairs
    parts.append(""",
l0 AS (SELECT mb, row_number() OVER (ORDER BY mb, rn) AS i FROM sorted_s),
l1 AS (
  SELECT CAST((i + 1) // 2 AS BIGINT) AS i, CAST(sum(mb) AS BIGINT) AS mb
  FROM l0 GROUP BY CAST((i + 1) // 2 AS BIGINT)
),
l2 AS (
  SELECT CAST((i + 1) // 2 AS BIGINT) AS i, CAST(sum(mb) AS BIGINT) AS mb
  FROM l1 GROUP BY CAST((i + 1) // 2 AS BIGINT)
),
l3 AS (
  SELECT CAST(sum(mb) AS BIGINT) AS mb FROM l2
),
bal_list AS (
  SELECT row_number() OVER (ORDER BY lvl, i) AS step,
         CAST(sum(mb) OVER (ORDER BY lvl, i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS bal_cum
  FROM (
    SELECT 1 AS lvl, i, mb FROM l1
    UNION ALL SELECT 2, i, mb FROM l2
    UNION ALL SELECT 3, CAST(1 AS BIGINT), mb FROM l3
  )
)""")
    merged_cases = " ".join(
        f"WHEN {j} THEN (SELECT merged FROM m{j})" for j in range(1, HUF_N)
    )
    cum_cases = " ".join(
        f"WHEN {j} THEN {' + '.join(f'(SELECT merged FROM m{i})' for i in range(1, j + 1))}"
        for j in range(1, HUF_N)
    )
    parts.append(f"""
SELECT s.step,
       CAST(CASE s.step {merged_cases} END AS BIGINT) AS merged_mb,
       CAST(CASE s.step {cum_cases} END AS BIGINT) AS huffman_cum_mb,
       ss.seq_cum AS seq_cum_mb,
       b.bal_cum AS balanced_cum_mb
FROM (SELECT unnest(range(1, {HUF_N})) AS step) s
JOIN seq_steps ss ON ss.step = s.step
JOIN bal_list b ON b.step = s.step""")
    return "".join(parts)


QUERIES["segment_merge_huffman_eval"] = (
    segment_merge_huffman_eval,
    _sql_huffman(),
)


# ------------------------------------------ learned-index error eval

# The RMI/PGM learned-index idea (Kraska et al. 2018) reduced to its
# measurable core: replace binary search over a sorted key array with a
# LINEAR model pos ≈ a + b·key plus an ε-bounded local search, where ε
# is the model's maximum prediction error — the number that decides
# the fallback window size. Keys are planted with a CUBIC CDF
# (k = ⌊u³/10⁶⌋ over md5 uniforms — hash-uniform keys have a linear
# CDF and a near-zero global error, degenerate, measured), and the
# operator fits BOTH a single global line and {LI_BUCKETS} per-bucket
# lines with the repo's integer least-squares kernel (the
# ft_zipf_slope _DIVROUND contract), emitting each model's max
# absolute rank-prediction error. The learned-index claim is the pin:
# the bucketed ε is several times smaller than the global ε on the
# skewed CDF.
#
# Scale shape: one distinct-key rank (dictionary-sized; the
# token_budget histogram selection at web scale), per-bucket integer
# moment aggs, a broadcast model join back for the error scan.

LI_BUCKETS = 8
# Key downscale keeping every moment product inside int64 at ANY corpus
# size (the sf0.1 sweep caught nk·sxx overflowing at ~5k keys): the
# binding constraint is the slope numerator ×1e6, |nk·sxy − sx·sy|·1e6 ≤
# n³·K'·1e6 ≤ 9.2e18, so the key space K' must shrink like 9e12/n³, i.e.
# S ≥ K·n³/9e12 = n³/9e6 for the 1e6 key space. Computed floor-first
# (n² DIV 9000, ×n, DIV 1000) so no intermediate exceeds ~1e14; the +1
# absorbs the ≤(n/1000+1) floor loss. S = 1 below n ≈ 208 keys, so tiny
# fixtures are bit-identical to the pre-rescale behavior. n ≤ 1e6 by
# construction (the key space), which caps S itself.
_LI_SCALE = (
    "greatest(CAST(1 AS BIGINT),"
    " (({n} * {n}) {div} 9000) * {n} {div} 1000 + 1)"
)
_LI_PRED_ERR = (
    "CAST(abs(CASE WHEN a_micro + b_micro * key >= 0"
    " THEN (a_micro + b_micro * key) {div} 1000000"
    " ELSE -((-(a_micro + b_micro * key)) {div} 1000000) END - pos)"
    " AS BIGINT)"
)


def learned_index_error_eval(spark, sf_dir):
    """(model, bkt, n_keys, b_micro, max_err): per-bucket vs global
    linear-model rank-prediction errors over the planted cubic-CDF key
    set."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents").select("doc_id")
    keys = (
        docs.select(
            F.expr(
                "CAST(conv(substring(md5(concat('ky|',"
                " CAST(doc_id AS STRING))), 1, 14), 16, 10) AS BIGINT)"
                " % 1000000"
            ).alias("u")
        )
        .select(
            F.expr("((u * u) DIV 1000000 * u) DIV 1000000").cast("long")
            .alias("key")
        )
        .distinct()
    )
    ranked = keys.withColumn(
        "pos", (F.row_number().over(W.orderBy("key")) - 1).cast("long")
    ).cache()
    n_all = F.broadcast(ranked.agg(F.count("*").cast("long").alias("n")))
    tagged = ranked.crossJoin(n_all).select(
        F.expr("key DIV " + _LI_SCALE.format(div="DIV", n="n")).cast("long")
        .alias("key"),
        "pos",
        F.expr(f"(pos * {LI_BUCKETS}) DIV n").cast("long").alias("bkt"),
    ).cache()

    def fit(df, scope):
        mom = df.groupBy("bkt").agg(
            F.count("*").cast("long").alias("nk"),
            F.sum("key").cast("long").alias("sx"),
            F.sum("pos").cast("long").alias("sy"),
            F.sum(F.col("key") * F.col("pos")).cast("long").alias("sxy"),
            F.sum(F.col("key") * F.col("key")).cast("long").alias("sxx"),
        )
        model = mom.select(
            "bkt",
            "nk",
            F.expr(
                _DIVROUND.format(
                    num="(nk * sxy - sx * sy)",
                    den="greatest(nk * sxx - sx * sx, 1)",
                    div="DIV",
                )
            ).cast("long").alias("b_micro"),
            "sx",
            "sy",
        ).withColumn(
            "a_micro",
            F.expr(
                "CASE WHEN 1000000 * sy - b_micro * sx >= 0"
                " THEN (1000000 * sy - b_micro * sx) DIV nk"
                " ELSE -((-(1000000 * sy - b_micro * sx)) DIV nk) END"
            ).cast("long"),
        )
        err = (
            df.join(F.broadcast(model), "bkt")
            .select(
                "bkt",
                "nk",
                "b_micro",
                F.expr(_LI_PRED_ERR.format(div="DIV")).alias("err"),
            )
            .groupBy("bkt", "nk", "b_micro")
            .agg(F.max("err").cast("long").alias("max_err"))
        )
        return err.select(
            F.lit(scope).alias("model"), "bkt",
            F.col("nk").alias("n_keys"), "b_micro", "max_err",
        )

    bucketed = fit(tagged, "bucketed")
    global_fit = fit(
        tagged.select("key", "pos", F.lit(0).cast("long").alias("bkt")),
        "global",
    )
    return bucketed.unionByName(global_fit)


def _sql_learned_index() -> str:
    h = _SQL_HASH56.format(col="'ky|' || CAST(doc_id AS VARCHAR)")
    dr = _DIVROUND.format(
        num="(nk * sxy - sx * sy)",
        den="greatest(nk * sxx - sx * sx, 1)",
        div="//",
    )
    return f"""
WITH keys AS (
  SELECT DISTINCT
         ((u * u) // 1000000 * u) // 1000000 AS key
  FROM (SELECT {h} % 1000000 AS u FROM documents)
),
ranked AS MATERIALIZED (
  SELECT key,
         CAST(row_number() OVER (ORDER BY key) - 1 AS BIGINT) AS pos
  FROM keys
),
nn2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
tagged AS MATERIALIZED (
  SELECT key // {_LI_SCALE.format(div='//', n='(SELECT n FROM nn2)')} AS key,
         pos,
         (pos * {LI_BUCKETS}) // (SELECT n FROM nn2) AS bkt
  FROM ranked
),
both_t AS (
  SELECT 'bucketed' AS model, key, pos, bkt FROM tagged
  UNION ALL
  SELECT 'global', key, pos, CAST(0 AS BIGINT) FROM tagged
),
mom AS (
  SELECT model, bkt, CAST(count(*) AS BIGINT) AS nk,
         CAST(sum(key) AS BIGINT) AS sx,
         CAST(sum(pos) AS BIGINT) AS sy,
         CAST(sum(key * pos) AS BIGINT) AS sxy,
         CAST(sum(key * key) AS BIGINT) AS sxx
  FROM both_t GROUP BY 1, 2
),
model_t AS (
  SELECT model, bkt, nk,
         CAST({dr} AS BIGINT) AS b_micro, sx, sy
  FROM mom
),
model2 AS (
  SELECT model, bkt, nk, b_micro,
         CAST(CASE WHEN 1000000 * sy - b_micro * sx >= 0
              THEN (1000000 * sy - b_micro * sx) // nk
              ELSE -((-(1000000 * sy - b_micro * sx)) // nk) END
              AS BIGINT) AS a_micro
  FROM model_t
)
SELECT t.model, t.bkt, m.nk AS n_keys, m.b_micro,
       CAST(max({_LI_PRED_ERR.format(div='//')}) AS BIGINT) AS max_err
FROM both_t t JOIN model2 m ON m.model = t.model AND m.bkt = t.bkt
GROUP BY t.model, t.bkt, m.nk, m.b_micro
"""


QUERIES["learned_index_error_eval"] = (
    learned_index_error_eval,
    _sql_learned_index(),
)


# ---------------------------------------------- ski-rental caching

# The rent-or-buy decision every cache/materialization layer makes
# (ski-rental; Karlin et al. 1988): recompute a derived artifact per
# use (rent, cost 1) or materialize it once (buy, cost {SKI_B}) without
# knowing how many more uses are coming. The break-even rule — buy at
# the {SKI_B}-th use — is 2-competitive: its cost never exceeds twice
# the hindsight optimum min(uses, B). Measured over {SKI_REPS} planted
# usage counts (md5, skewed so both regimes occur): per replicate the
# rule's cost, OPT, and the ratio; the 2-competitive bound holds on
# EVERY replicate and the mean ratio sits well inside it (both
# pinned). Completes the online-algorithms family (secretary
# admission, bandits, LRU stack distances).
#
# Scale shape: a replicate dimension + pure integer arithmetic.

SKI_B = 8
SKI_REPS = 64


def cache_ski_rental_eval(spark, sf_dir):
    """(n_reps, n_buy_regime, worst_ratio_milli, mean_ratio_milli):
    break-even ski-rental costs vs hindsight optimum over planted
    usage streams."""
    from harvester_spark.operators.dedup import _hash56

    reps = spark.range(SKI_REPS).select(F.col("id").cast("long").alias("r"))
    # skewed usage counts: 1..4 uses (rent regime) or 8..39 (buy regime)
    rows = reps.select(
        "r",
        F.expr(
            "CASE WHEN CAST(conv(substring(md5(concat('sk|',"
            " CAST(r AS STRING))), 1, 14), 16, 10) AS BIGINT) % 2 = 0"
            " THEN 1 + CAST(conv(substring(md5(concat('su|',"
            " CAST(r AS STRING))), 1, 14), 16, 10) AS BIGINT) % 4"
            " ELSE 8 + CAST(conv(substring(md5(concat('su|',"
            " CAST(r AS STRING))), 1, 14), 16, 10) AS BIGINT) % 32 END"
        ).cast("long").alias("uses"),
    ).withColumn(
        "rule_cost",
        F.expr(
            f"CASE WHEN uses < {SKI_B} THEN uses"
            f" ELSE {SKI_B} - 1 + {SKI_B} END"
        ).cast("long"),
    ).withColumn(
        "opt_cost", F.expr(f"least(uses, {SKI_B})").cast("long")
    ).withColumn(
        "ratio_milli",
        F.expr("CAST((1000 * rule_cost) DIV opt_cost AS BIGINT)"),
    )
    return rows.agg(
        F.count("*").cast("long").alias("n_reps"),
        F.sum((F.col("uses") >= SKI_B).cast("long"))
        .cast("long")
        .alias("n_buy_regime"),
        F.max("ratio_milli").cast("long").alias("worst_ratio_milli"),
        F.expr("CAST(sum(ratio_milli) DIV count(*) AS BIGINT)").alias(
            "mean_ratio_milli"
        ),
    )


def _sql_ski_rental() -> str:
    hsk = _SQL_HASH56.format(col="'sk|' || CAST(r AS VARCHAR)")
    hsu = _SQL_HASH56.format(col="'su|' || CAST(r AS VARCHAR)")
    return f"""
WITH rows_ AS (
  SELECT r,
         CASE WHEN {hsk} % 2 = 0 THEN 1 + {hsu} % 4
              ELSE 8 + {hsu} % 32 END AS uses
  FROM (SELECT CAST(unnest(range({SKI_REPS})) AS BIGINT) AS r)
),
costed AS (
  SELECT r, uses,
         CAST(CASE WHEN uses < {SKI_B} THEN uses
              ELSE {SKI_B} - 1 + {SKI_B} END AS BIGINT) AS rule_cost,
         CAST(least(uses, {SKI_B}) AS BIGINT) AS opt_cost
  FROM rows_
),
ratios AS (
  SELECT *, CAST((1000 * rule_cost) // opt_cost AS BIGINT) AS ratio_milli
  FROM costed
)
SELECT CAST(count(*) AS BIGINT) AS n_reps,
       CAST(sum(CASE WHEN uses >= {SKI_B} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_buy_regime,
       CAST(max(ratio_milli) AS BIGINT) AS worst_ratio_milli,
       CAST(CAST(sum(ratio_milli) AS BIGINT) // count(*) AS BIGINT)
         AS mean_ratio_milli
FROM ratios
"""


QUERIES["cache_ski_rental_eval"] = (
    cache_ski_rental_eval,
    _sql_ski_rental(),
)


# ------------------------------------------ Good-Turing missing mass

# The companion of ndv_sample_chao_eval: Chao1 estimated how many
# UNSEEN types exist; Good-Turing (1953) estimates how much PROBABILITY
# MASS they carry — M₀ ≈ f₁/n (singletons over sample size), the
# estimate behind every smoothed language model's backoff budget
# (Katz, and the Kneser-Ney operator's discount family). Same
# planted-rare-tail stream and md5 occurrence sample; because the
# synthesis is planted, the TRUE missing mass (population share of
# types the sample never saw) is computable, and the pin is the
# Good-Turing theorem made empirical: |f₁/n − M₀_true| small, with
# both genuinely nonzero (the saturating natural vocabulary alone
# would make M₀ structurally 0).
#
# Scale shape: the ndv plan — one sampled dictionary agg + one
# anti-joined population agg.


def vocab_missing_mass_gt(spark, sf_dir):
    """(n_sample, f1, gt_missing_milli, true_missing_milli,
    abs_err_milli): Good-Turing missing-mass estimate vs the planted
    truth."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    space = max(n_docs // 2, 20)
    real = doc_tokens(spark, sf_dir).select("doc_id", "pos", "term")
    planted = docs.select(
        "doc_id",
        F.lit(-1).alias("pos"),
        F.concat(
            F.lit("rare"),
            (
                _hash56(F.concat(F.lit("nv|"), F.col("doc_id").cast("string")))
                % space
            ).cast("string"),
        ).alias("term"),
    )
    stream = real.unionByName(planted).cache()
    sampled = stream.filter(
        _hash56(
            F.concat_ws(
                "|", F.lit("ns2"), F.col("doc_id").cast("string"),
                F.col("pos").cast("string"), F.col("term"),
            )
        )
        % NDV_SAMPLE_MOD
        == 0
    )
    sfreq = sampled.groupBy("term").agg(
        F.count("*").cast("long").alias("c")
    ).cache()
    samp_tot = F.broadcast(
        sfreq.agg(
            F.sum("c").cast("long").alias("n_sample"),
            F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        )
    )
    pop = stream.groupBy("term").agg(
        F.count("*").cast("long").alias("pc")
    )
    unseen = pop.join(sfreq.select("term"), "term", "left_anti")
    truth = F.broadcast(
        unseen.agg(
            F.coalesce(F.sum("pc"), F.lit(0)).cast("long").alias("unseen_occ")
        ).crossJoin(
            pop.groupBy().agg(F.sum("pc").cast("long").alias("pop_tot"))
        )
    )
    return samp_tot.crossJoin(truth).select(
        "n_sample",
        "f1",
        F.expr("CAST((1000 * f1) DIV n_sample AS BIGINT)").alias(
            "gt_missing_milli"
        ),
        F.expr("CAST((1000 * unseen_occ) DIV pop_tot AS BIGINT)").alias(
            "true_missing_milli"
        ),
        F.expr(
            "CAST(abs((1000 * f1) DIV n_sample"
            " - (1000 * unseen_occ) DIV pop_tot) AS BIGINT)"
        ).alias("abs_err_milli"),
    )


def _sql_missing_mass() -> str:
    h_nv = _SQL_HASH56.format(col="'nv|' || CAST(doc_id AS VARCHAR)")
    h_s = _SQL_HASH56.format(
        col="'ns2' || '|' || CAST(doc_id AS VARCHAR) || '|'"
        " || CAST(pos AS VARCHAR) || '|' || term"
    )
    return f"""
WITH spc AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 20) AS space
  FROM documents
),
stream AS MATERIALIZED (
  SELECT doc_id, pos, term FROM ({SQL_DOC_TOKS})
  UNION ALL
  SELECT doc_id, -1,
         'rare' || CAST({h_nv} % (SELECT space FROM spc) AS VARCHAR)
  FROM documents
),
sfreq AS MATERIALIZED (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM stream WHERE {h_s} % {NDV_SAMPLE_MOD} = 0
  GROUP BY 1
),
st AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_sample,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1
  FROM sfreq
),
pop AS (SELECT term, CAST(count(*) AS BIGINT) AS pc FROM stream GROUP BY 1),
tr AS (
  SELECT CAST(coalesce(sum(CASE WHEN s.term IS NULL THEN p.pc END), 0)
              AS BIGINT) AS unseen_occ,
         CAST(sum(p.pc) AS BIGINT) AS pop_tot
  FROM pop p LEFT JOIN sfreq s ON s.term = p.term
)
SELECT st.n_sample, st.f1,
       CAST((1000 * st.f1) // st.n_sample AS BIGINT) AS gt_missing_milli,
       CAST((1000 * tr.unseen_occ) // tr.pop_tot AS BIGINT)
         AS true_missing_milli,
       CAST(abs((1000 * st.f1) // st.n_sample
            - (1000 * tr.unseen_occ) // tr.pop_tot) AS BIGINT)
         AS abs_err_milli
FROM st CROSS JOIN tr
"""


QUERIES["vocab_missing_mass_gt"] = (
    vocab_missing_mass_gt,
    _sql_missing_mass(),
)


# -------------------------------------------- birthday-bound collisions

# The math every md5-truncation determinism claim in this repo rests on
# (56-bit hashes "collision-free at corpus scale"), made empirical: at
# a DELIBERATELY SHORT {BD_BITS}-bit truncation over {BD_N} keys, the
# birthday bound predicts ≈ n(n−1)/2^(b+1) colliding pairs; the
# operator counts the actual colliding pairs (Σ C(c,2) over bucket
# occupancies) and emits observed vs expected. Pins: collisions are
# plentiful at the short width (the bound is real), the observed count
# is within the Poisson band of the expectation, and at 56 bits the
# same corpus produces ZERO collisions (the repo's standing
# assumption, now tested rather than asserted).
#
# Scale shape: two hash-bucket aggs.

BD_BITS = 16
BD_N = 2000


def hash_collision_birthday_eval(spark, sf_dir):
    """(bits, n_keys, n_colliding_pairs, expected_pairs_milli): observed
    vs birthday-expected colliding pairs at the short and full hash
    widths."""
    from harvester_spark.operators.dedup import _hash56

    keys = spark.range(BD_N).select(F.col("id").cast("long").alias("k"))
    hashed = keys.select(
        "k",
        _hash56(F.concat(F.lit("bd|"), F.col("k").cast("string"))).alias("h"),
    )
    out = []
    for bits in (BD_BITS, 56):
        mod = 1 << bits
        occ = hashed.select(
            (F.col("h") % mod).alias("b")
        ).groupBy("b").agg(F.count("*").cast("long").alias("c"))
        pairs = occ.agg(
            F.sum(F.expr("(c * (c - 1)) DIV 2")).cast("long").alias("p")
        ).select(
            F.lit(bits).cast("long").alias("bits"),
            F.lit(BD_N).cast("long").alias("n_keys"),
            F.col("p").alias("n_colliding_pairs"),
            F.lit(
                (1000 * BD_N * (BD_N - 1) // 2) // mod
            ).cast("long").alias("expected_pairs_milli"),
        )
        out.append(pairs)
    return out[0].unionByName(out[1])


def _sql_birthday() -> str:
    h = _SQL_HASH56.format(col="'bd|' || CAST(k AS VARCHAR)")
    sel = []
    for bits in (BD_BITS, 56):
        mod = 1 << bits
        exp = (1000 * BD_N * (BD_N - 1) // 2) // mod
        sel.append(f"""
SELECT CAST({bits} AS BIGINT) AS bits,
       CAST({BD_N} AS BIGINT) AS n_keys,
       CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS n_colliding_pairs,
       CAST({exp} AS BIGINT) AS expected_pairs_milli
FROM (
  SELECT {h} % {mod} AS b, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT CAST(unnest(range({BD_N})) AS BIGINT) AS k)
  GROUP BY 1
)""")
    return "\nUNION ALL\n".join(sel)


QUERIES["hash_collision_birthday_eval"] = (
    hash_collision_birthday_eval,
    _sql_birthday(),
)


# -------------------------- document- vs term-partitioned serving cost

# Moffat-Webber-Zobel-Baeza-Yates (SPIRE/IR 2006-07): the two ways to
# shard an inverted index. DOCUMENT partitioning gives every shard
# 1/S of every posting list — per-query work is balanced by
# construction (cost ~ ceil(sum_df / S) per shard) but every shard
# touches every query. TERM partitioning gives whole lists to single
# shards — only the owners work, but a query's makespan is the LARGEST
# owned share, and skew is structural. The exact relationship
#   termpart_makespan >= ceil(sum_df / S)
# (a max over a partition of the load is at least its mean) is pinned
# per query, and the measured skew ratio IS the deliverable — it is
# why production engines document-partition (the reference's OpenSearch
# does) and why this repo's serving ranges are docID ranges.
#
# Frame: the 16-query registry (HN_N_QUERIES x HN_Q_LEN terms, the
# hard_negative_mine selection), term df over the corpus, md5 term ->
# shard ownership with SPC_SHARDS = 8. Everything integer counts; the
# network column contrasts term partitioning's shipped postings
# (sum_df rows to the coordinator) with document partitioning's
# S * k result rows.

SPC_SHARDS = 8
SPC_K = 10  # results per shard under document partitioning


def shard_partitioning_cost_eval(spark, sf_dir):
    """(q_id, n_terms, sum_df, docpart_makespan, termpart_makespan,
    skew_ratio_milli, docpart_net_rows, termpart_net_rows, bound_ok):
    per-registry-query serving cost under document vs term
    partitioning."""
    from harvester_spark.operators.dedup import _hash56
    from harvester_spark.operators.retrieval import HN_N_QUERIES, HN_Q_LEN

    docs = load(spark, sf_dir, "documents")
    toks = doc_tokens(spark, sf_dir)
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
    df_ = (
        toks.join(F.broadcast(qsel.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .withColumn(
            "shard",
            (_hash56(F.concat(F.lit("shp|"), F.col("term"))) % SPC_SHARDS)
            .cast("long"),
        )
    )
    qt = qsel.join(F.broadcast(df_), "term")
    per_shard = qt.groupBy("q_id", "shard").agg(
        F.sum("df").cast("long").alias("owned")
    )
    agg = qt.groupBy("q_id").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("sum_df"),
    )
    mk = per_shard.groupBy("q_id").agg(
        F.max("owned").cast("long").alias("termpart_makespan")
    )
    return (
        agg.join(mk, "q_id")
        .select(
            "q_id",
            "n_terms",
            "sum_df",
            F.expr(
                f"CAST((sum_df + {SPC_SHARDS} - 1) DIV {SPC_SHARDS}"
                " AS BIGINT)"
            ).alias("docpart_makespan"),
            "termpart_makespan",
            F.expr(
                f"CAST((1000 * termpart_makespan)"
                f" DIV ((sum_df + {SPC_SHARDS} - 1) DIV {SPC_SHARDS})"
                " AS BIGINT)"
            ).alias("skew_ratio_milli"),
            F.lit(SPC_SHARDS * SPC_K).cast("long").alias("docpart_net_rows"),
            F.col("sum_df").alias("termpart_net_rows"),
            F.expr(
                f"termpart_makespan >= (sum_df + {SPC_SHARDS} - 1)"
                f" DIV {SPC_SHARDS}"
            ).alias("bound_ok"),
        )
    )


def _sql_shard_partitioning() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56
    from harvester_spark.operators.retrieval import HN_N_QUERIES, HN_Q_LEN

    h = _SQL_HASH56.format(col="'shp|' || term")
    return f"""
WITH spt AS ({SQL_DOC_TOKS}),
spq AS (
  SELECT doc_id AS q_id, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id
             ORDER BY min(pos) ASC, term ASC) AS r
    FROM spt
    WHERE doc_id IN (SELECT doc_id FROM documents
                     ORDER BY doc_id LIMIT {HN_N_QUERIES})
    GROUP BY doc_id, term
  ) WHERE r <= {HN_Q_LEN}
),
spdf AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST({h} % {SPC_SHARDS} AS BIGINT) AS shard
  FROM spt WHERE term IN (SELECT DISTINCT term FROM spq)
  GROUP BY term
),
spqt AS (
  SELECT q.q_id, q.term, d.df, d.shard
  FROM spq q JOIN spdf d USING (term)
),
spps AS (
  SELECT q_id, shard, CAST(sum(df) AS BIGINT) AS owned
  FROM spqt GROUP BY 1, 2
),
spagg AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(df) AS BIGINT) AS sum_df
  FROM spqt GROUP BY 1
),
spmk AS (
  SELECT q_id, CAST(max(owned) AS BIGINT) AS termpart_makespan
  FROM spps GROUP BY 1
)
SELECT a.q_id, a.n_terms, a.sum_df,
       CAST((a.sum_df + {SPC_SHARDS} - 1) // {SPC_SHARDS} AS BIGINT)
         AS docpart_makespan,
       m.termpart_makespan,
       CAST((1000 * m.termpart_makespan)
            // ((a.sum_df + {SPC_SHARDS} - 1) // {SPC_SHARDS}) AS BIGINT)
         AS skew_ratio_milli,
       CAST({SPC_SHARDS * SPC_K} AS BIGINT) AS docpart_net_rows,
       a.sum_df AS termpart_net_rows,
       m.termpart_makespan >= (a.sum_df + {SPC_SHARDS} - 1)
         // {SPC_SHARDS} AS bound_ok
FROM spagg a JOIN spmk m USING (q_id)
"""


QUERIES["shard_partitioning_cost_eval"] = (
    shard_partitioning_cost_eval,
    _sql_shard_partitioning(),
)


# ------------------------------------------------- WAH bitmap codec size

# Word-Aligned Hybrid bitmap compression (Wu, Otoo & Shoshani, TODS 2006
# — the FastBit codec): the docID set is a bitmap over [0, n_docs) cut
# into 31-bit payload words; maximal runs of all-zero words collapse to
# one 0-fill word, maximal runs of all-one words to one 1-fill word, and
# every mixed word is stored literally — each emitted word costs 4
# bytes. Closes the bitmap side of the codec zoo next to
# postings_roaring_size (container-adaptive) exactly as the literature
# pairs them: WAH wins on long runs (the '_live' all-docs list is ONE
# 1-fill), loses on scattered singletons (the '_sparse' every-37th list
# alternates literal / 0-fill and can exceed the plain bitmap's cost —
# the well-known WAH worst case, reported honestly via ratio_milli).
# Same three docID-list regimes as roaring: the flagship BM25 terms, the
# all-docs '_live' set, the decimated '_sparse' set.
#
# Convention pinned for determinism: the trailing partial word of the
# universe (n_docs % 31 valid bits) is never a fill word — "full" means
# exactly 31 set bits, so a fully-set tail word counts literal in BOTH
# engines (real WAH keeps it in the uncompressed active word; byte cost
# is identical). Fill-run lengths never exceed 2^30 words here, so one
# fill word per run is exact.
#
# Scale shape: one (term, word)-grain groupBy on the postings scan plus
# two term-partitioned lag windows (occupied words; full words) — the
# postings_varbyte_size discipline; the universe width arrives as a
# catalog-statistic count, never a second scan.

WAH_W = 31  # payload bits per 32-bit word


def postings_wah_size(spark, sf_dir):
    """(term, n_set, n_literal, n_zero_fills, n_one_fills, wah_bytes,
    bitmap_bytes, ratio_milli): exact WAH word counts per docID list."""
    from harvester_spark.operators.fulltext_queries import BM25_TERMS

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    w_univ = (n_docs - 1) // WAH_W
    post = (
        doc_tokens(spark, sf_dir)
        .select("term", "doc_id")
        .filter(F.col("term").isin(BM25_TERMS))
        .distinct()
        .unionByName(docs.select(F.lit("_live").alias("term"), "doc_id"))
        .unionByName(
            docs.filter(F.expr("doc_id % 37 = 0")).select(
                F.lit("_sparse").alias("term"), "doc_id"
            )
        )
    )
    occ = (
        post.withColumn("w", F.expr(f"doc_id DIV {WAH_W}"))
        .groupBy("term", "w")
        .agg(F.count("*").cast("long").alias("bits"))
    )
    wl = W.partitionBy("term").orderBy("w")
    gaps = occ.withColumn("pw", F.lag("w").over(wl)).withColumn(
        "gap",
        F.expr(
            "CASE WHEN (pw IS NULL AND w > 0) OR (pw IS NOT NULL AND w > pw + 1)"
            " THEN 1 ELSE 0 END"
        ),
    )
    agg_a = gaps.groupBy("term").agg(
        F.sum("bits").cast("long").alias("n_set"),
        F.sum(F.expr(f"CASE WHEN bits < {WAH_W} THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_literal"),
        F.sum("gap").cast("long").alias("zero_gaps"),
        F.max("w").cast("long").alias("max_w"),
    )
    full = occ.filter(F.col("bits") == WAH_W).withColumn(
        "pfw", F.lag("w").over(wl)
    )
    agg_b = full.groupBy("term").agg(
        F.sum(
            F.expr("CASE WHEN pfw IS NULL OR w > pfw + 1 THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("one_fills")
    )
    joined = agg_a.join(agg_b, "term", "left").select(
        "term",
        "n_set",
        "n_literal",
        (
            F.col("zero_gaps")
            + F.expr(f"CASE WHEN max_w < {w_univ} THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("n_zero_fills"),
        F.coalesce("one_fills", F.lit(0)).cast("long").alias("n_one_fills"),
    )
    return joined.select(
        "term",
        "n_set",
        "n_literal",
        "n_zero_fills",
        "n_one_fills",
        (
            4 * (F.col("n_literal") + F.col("n_zero_fills") + F.col("n_one_fills"))
        )
        .cast("long")
        .alias("wah_bytes"),
        F.lit(4 * (w_univ + 1)).cast("long").alias("bitmap_bytes"),
        F.expr(
            f"CAST(1000 * (4 * (n_literal + n_zero_fills + n_one_fills))"
            f" DIV {4 * (w_univ + 1)} AS BIGINT)"
        ).alias("ratio_milli"),
    ).orderBy("term")


def _sql_wah_size() -> str:
    return f"""
WITH nd AS (SELECT count(*) AS n, (count(*) - 1) // {WAH_W} AS wu FROM documents),
post AS (
  SELECT DISTINCT term, doc_id FROM ({SQL_DOC_TOKS})
  WHERE term IN ('key', 'value', 'table')
  UNION ALL SELECT '_live' AS term, doc_id FROM documents
  UNION ALL SELECT '_sparse' AS term, doc_id FROM documents WHERE doc_id % 37 = 0
),
occ AS (
  SELECT term, doc_id // {WAH_W} AS w, CAST(count(*) AS BIGINT) AS bits
  FROM post GROUP BY 1, 2
),
gaps AS (
  SELECT term, w, bits,
         lag(w) OVER (PARTITION BY term ORDER BY w) AS pw
  FROM occ
),
agg_a AS (
  SELECT term,
         CAST(sum(bits) AS BIGINT) AS n_set,
         CAST(sum(CASE WHEN bits < {WAH_W} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_literal,
         CAST(sum(CASE WHEN (pw IS NULL AND w > 0)
                        OR (pw IS NOT NULL AND w > pw + 1)
                   THEN 1 ELSE 0 END) AS BIGINT) AS zero_gaps,
         CAST(max(w) AS BIGINT) AS max_w
  FROM gaps GROUP BY term
),
fullw AS (
  SELECT term, w,
         lag(w) OVER (PARTITION BY term ORDER BY w) AS pfw
  FROM occ WHERE bits = {WAH_W}
),
agg_b AS (
  SELECT term,
         CAST(sum(CASE WHEN pfw IS NULL OR w > pfw + 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS one_fills
  FROM fullw GROUP BY term
),
joined AS (
  SELECT a.term, a.n_set, a.n_literal,
         CAST(a.zero_gaps + CASE WHEN a.max_w < (SELECT wu FROM nd)
                                 THEN 1 ELSE 0 END AS BIGINT) AS n_zero_fills,
         CAST(coalesce(b.one_fills, 0) AS BIGINT) AS n_one_fills
  FROM agg_a a LEFT JOIN agg_b b USING (term)
)
SELECT term, n_set, n_literal, n_zero_fills, n_one_fills,
       CAST(4 * (n_literal + n_zero_fills + n_one_fills) AS BIGINT)
         AS wah_bytes,
       CAST(4 * ((SELECT wu FROM nd) + 1) AS BIGINT) AS bitmap_bytes,
       CAST(1000 * (4 * (n_literal + n_zero_fills + n_one_fills))
            // (4 * ((SELECT wu FROM nd) + 1)) AS BIGINT) AS ratio_milli
FROM joined ORDER BY term
"""


QUERIES["postings_wah_size"] = (postings_wah_size, _sql_wah_size())


# -------------------------------------------- Fagin NRA stopping depth

# The No-Random-Access algorithm (Fagin, Lotem & Naor, PODS 2001 §4 —
# the sorted-access-only sibling of fagin_ta_cost_eval, i.e. the regime
# of a distributed index where random access to the other list's score
# is a network round trip you refuse to pay): objects seen in either
# top-p carry a LOWER bound (sum of seen scores) and an UPPER bound
# (seen scores + the current threshold of each unseen list); NRA stops
# at the first depth where no object outside the current top-k by lower
# bound — seen or unseen — can still beat the k-th lower bound. The
# trace emits both bounds' frontier per depth; the stopping depth is
# NRA's sorted-access cost, never earlier than TA's on the same
# instance (TA's random accesses buy exact scores; the pytest
# cross-pins the two traces and replays a REAL sequential NRA,
# cache_lru_stack_distance-style, asserting the relational grid stops
# at the same depth with the correct top-k).
#
# Determinism: same exact-micro feature pair as TA (BM25 OR-scored;
# n_chars saturation prior); k-th lower bound and the rest-max upper
# bound are exact order statistics with doc_id tie-breaks.
#
# Depth sampling: NRA's stopping depth GROWS with the corpus on this
# feature pair (the length-prior list decays slowly, so rest-object
# upper bounds stay alive long after TA would have stopped — measured
# 298-of-500 at sf0.001, i.e. a fixed top-120 trace never records the
# stop). The trace therefore samples NRA_SAMPLES depths evenly
# spanning [1, n]: the round-robin access state at depth p depends
# only on p, so evaluating the bounds at sampled depths is exact.
#
# Scale shape: the depth x seen-objects grid is ~2n rows per sampled
# depth (~n * NRA_SAMPLES total — diagnostic, like TA's); the serving
# twin is a cursor walk with a bounded candidate buffer.

NRA_K = 10
NRA_SAMPLES = 120


def nra_cost_eval(spark, sf_dir):
    """(p, t1_micro, t2_micro, unseen_ub_micro, kth_lb_micro,
    max_ub_rest_micro, n_seen, stopped): the NRA depth trace for
    top-{NRA_K} over the BM25 and length-prior lists."""
    from harvester_spark.operators.fulltext_queries import bm25_or_scored

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s1 = bm25_or_scored(spark, sf_dir).select(
        "doc_id",
        F.expr("CAST(round(score * 1.0e6, 0) AS BIGINT)").alias("s1"),
    )
    feats = (
        docs.join(s1, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("s1", F.lit(0)).cast("long").alias("s1"),
            F.expr(
                "CAST((1000000 * n_chars) DIV (n_chars + 1200) AS BIGINT)"
            ).alias("s2"),
        )
        .withColumn(
            "r1",
            F.row_number()
            .over(W.orderBy(F.col("s1").desc(), F.col("doc_id").asc()))
            .cast("long"),
        )
        .withColumn(
            "r2",
            F.row_number()
            .over(W.orderBy(F.col("s2").desc(), F.col("doc_id").asc()))
            .cast("long"),
        )
        .cache()
    )
    n = docs.count()
    depths = (
        spark.range(1, NRA_SAMPLES + 1)
        .select(F.expr(f"CAST(id * {n} DIV {NRA_SAMPLES} AS BIGINT)").alias("p"))
        .filter(F.col("p") >= 1)
        .distinct()
    )
    t1 = feats.select(F.col("r1").alias("p"), F.col("s1").alias("t1_micro"))
    t2 = feats.select(F.col("r2").alias("p"), F.col("s2").alias("t2_micro"))
    grid = (
        depths.join(
            feats.select("doc_id", "s1", "s2", "r1", "r2"),
            (F.col("r1") <= F.col("p")) | (F.col("r2") <= F.col("p")),
        )
        .join(t1, "p")
        .join(t2, "p")
        .withColumn(
            "lb",
            (
                F.expr("CASE WHEN r1 <= p THEN s1 ELSE 0 END")
                + F.expr("CASE WHEN r2 <= p THEN s2 ELSE 0 END")
            ).cast("long"),
        )
        .withColumn(
            "ub",
            (
                F.expr("CASE WHEN r1 <= p THEN s1 ELSE t1_micro END")
                + F.expr("CASE WHEN r2 <= p THEN s2 ELSE t2_micro END")
            ).cast("long"),
        )
    )
    wlb = W.partitionBy("p").orderBy(F.col("lb").desc(), F.col("doc_id").asc())
    agg = (
        grid.withColumn("rk", F.row_number().over(wlb))
        .groupBy("p")
        .agg(
            F.max(F.expr(f"CASE WHEN rk = {NRA_K} THEN lb END"))
            .cast("long")
            .alias("kth_lb_micro"),
            F.max(F.expr(f"CASE WHEN rk > {NRA_K} THEN ub END"))
            .cast("long")
            .alias("max_ub_rest_micro"),
            F.count("*").cast("long").alias("n_seen"),
        )
    )
    return (
        depths.join(t1, "p")
        .join(t2, "p")
        .join(agg, "p", "left")
        .select(
            "p",
            "t1_micro",
            "t2_micro",
            (F.col("t1_micro") + F.col("t2_micro"))
            .cast("long")
            .alias("unseen_ub_micro"),
            F.coalesce("kth_lb_micro", F.lit(0))
            .cast("long")
            .alias("kth_lb_micro"),
            F.coalesce("max_ub_rest_micro", F.lit(0))
            .cast("long")
            .alias("max_ub_rest_micro"),
            F.coalesce("n_seen", F.lit(0)).cast("long").alias("n_seen"),
            F.expr(
                "coalesce(kth_lb_micro, 0) >= coalesce(max_ub_rest_micro, 0)"
                " AND coalesce(kth_lb_micro, 0) >= t1_micro + t2_micro"
            ).alias("stopped"),
        )
    )


def _sql_nra() -> str:
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
  SELECT doc_id,
         CAST(round(round(sum(
           ln(1.0e0 + (n - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))
         ), 6) * 1.0e6, 0) AS BIGINT) AS s1
  FROM qtf t JOIN qdf USING (term) JOIN dls USING (doc_id)
  CROSS JOIN stats GROUP BY doc_id
),
feats AS MATERIALIZED (
  SELECT d.doc_id,
         CAST(coalesce(o.s1, 0) AS BIGINT) AS s1,
         CAST((1000000 * d.n_chars) // (d.n_chars + 1200) AS BIGINT) AS s2,
         CAST(row_number() OVER (ORDER BY coalesce(o.s1, 0) DESC,
              d.doc_id ASC) AS BIGINT) AS r1,
         CAST(row_number() OVER (ORDER BY
              (1000000 * d.n_chars) // (d.n_chars + 1200) DESC,
              d.doc_id ASC) AS BIGINT) AS r2
  FROM documents d LEFT JOIN orsc o USING (doc_id)
),
depths AS (
  SELECT DISTINCT CAST(i * (SELECT count(*) FROM documents)
                       // {NRA_SAMPLES} AS BIGINT) AS p
  FROM (SELECT unnest(range(1, {NRA_SAMPLES + 1})) AS i)
  WHERE i * (SELECT count(*) FROM documents) // {NRA_SAMPLES} >= 1
),
grid AS (
  SELECT dp.p, f.doc_id,
         CAST(CASE WHEN f.r1 <= dp.p THEN f.s1 ELSE 0 END
              + CASE WHEN f.r2 <= dp.p THEN f.s2 ELSE 0 END AS BIGINT) AS lb,
         CAST(CASE WHEN f.r1 <= dp.p THEN f.s1 ELSE t1.s1 END
              + CASE WHEN f.r2 <= dp.p THEN f.s2 ELSE t2.s2 END AS BIGINT)
           AS ub
  FROM depths dp
  JOIN feats f ON f.r1 <= dp.p OR f.r2 <= dp.p
  JOIN feats t1 ON t1.r1 = dp.p
  JOIN feats t2 ON t2.r2 = dp.p
),
agg AS (
  SELECT p,
         CAST(max(CASE WHEN rk = {NRA_K} THEN lb END) AS BIGINT)
           AS kth_lb_micro,
         CAST(max(CASE WHEN rk > {NRA_K} THEN ub END) AS BIGINT)
           AS max_ub_rest_micro,
         CAST(count(*) AS BIGINT) AS n_seen
  FROM (
    SELECT p, lb, ub,
           row_number() OVER (PARTITION BY p
                              ORDER BY lb DESC, doc_id ASC) AS rk
    FROM grid
  ) GROUP BY p
)
SELECT dp.p,
       t1.s1 AS t1_micro,
       t2.s2 AS t2_micro,
       CAST(t1.s1 + t2.s2 AS BIGINT) AS unseen_ub_micro,
       CAST(coalesce(a.kth_lb_micro, 0) AS BIGINT) AS kth_lb_micro,
       CAST(coalesce(a.max_ub_rest_micro, 0) AS BIGINT)
         AS max_ub_rest_micro,
       CAST(coalesce(a.n_seen, 0) AS BIGINT) AS n_seen,
       coalesce(a.kth_lb_micro, 0) >= coalesce(a.max_ub_rest_micro, 0)
         AND coalesce(a.kth_lb_micro, 0) >= t1.s1 + t2.s2 AS stopped
FROM depths dp
JOIN feats t1 ON t1.r1 = dp.p
JOIN feats t2 ON t2.r2 = dp.p
LEFT JOIN agg a ON a.p = dp.p
"""


QUERIES["nra_cost_eval"] = (nra_cost_eval, _sql_nra())


# ------------------------------------------------- shard rebalance plan

# Minimal-movement shard rebalancing (the Elasticsearch/OpenSearch
# disk-watermark relocation problem the reference's cluster would hand
# to its allocator): given per-shard byte sizes and a hash placement
# over {RB_NODES} nodes, a node above cap = ceil(total / nodes) evicts
# shards until it fits. The policy is keep-largest-prefix (order the
# node's shards by size desc, keep the maximal prefix with cumulative
# size <= cap, move the rest) — the indivisible-shard analogue of
# water-filling, one window per node, no driver loop. The plan reports
# per-node moved bytes against the FRACTIONAL lower bound
# excess = max(0, load - cap) (any plan moves at least the excess;
# keep-largest overshoots by less than one marginal shard — both
# bounds pinned by tests/test_session16_ops.py against an independent
# recompute).
#
# Skew plant: shard sizes are doc n_chars sums with every
# {RB_HEAVY_MOD}-th shard inflated {RB_HEAVY_MULT}x (hash placement
# over near-uniform shards balances itself and the plan degenerates to
# zero moves — measured-and-avoided, the host_kcore non-degeneracy
# discipline).
#
# Scale shape: one doc scan -> shard-grain agg ({RB_SHARDS} rows);
# everything after is windows over the shard frame (broadcast-scale).

RB_SHARDS = 64
RB_NODES = 8
RB_HEAVY_MOD = 8  # every 8th shard ...
RB_HEAVY_MULT = 8  # ... is 8x heavier


def shard_rebalance_plan(spark, sf_dir):
    """(node, n_shards, load_before, cap, n_moved_out, bytes_moved_out,
    load_after, excess): keep-largest-prefix eviction plan per node."""
    from harvester_spark.operators.graph import _hash56

    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("x"), "n_chars"
    )
    shards = (
        docs.select(
            (_hash56(F.concat(F.lit("sh|"), F.col("x"))) % RB_SHARDS)
            .cast("long")
            .alias("shard"),
            F.col("n_chars").cast("long").alias("b"),
        )
        .groupBy("shard")
        .agg(F.sum("b").cast("long").alias("base"))
        .select(
            "shard",
            F.expr(
                f"CAST(base * CASE WHEN shard % {RB_HEAVY_MOD} = 0"
                f" THEN {RB_HEAVY_MULT} ELSE 1 END AS BIGINT)"
            ).alias("bytes"),
            (
                _hash56(F.concat(F.lit("pl|"), F.col("shard").cast("string")))
                % RB_NODES
            ).cast("long").alias("node"),
        )
    )
    tot = F.broadcast(
        shards.agg(
            F.sum("bytes").cast("long").alias("t"),
            F.count("*").cast("long").alias("ns"),
        )
    )
    wnode = W.partitionBy("node").orderBy(
        F.col("bytes").desc(), F.col("shard").asc()
    )
    planned = (
        shards.crossJoin(tot)
        .withColumn("cap", F.expr(f"CAST((t + {RB_NODES} - 1) DIV {RB_NODES} AS BIGINT)"))
        .withColumn(
            "csum",
            F.sum("bytes").over(
                wnode.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .withColumn("kept", F.col("csum") <= F.col("cap"))
    )
    return (
        planned.groupBy("node", "cap")
        .agg(
            F.count("*").cast("long").alias("n_shards"),
            F.sum("bytes").cast("long").alias("load_before"),
            F.sum(F.expr("CASE WHEN kept THEN 0 ELSE 1 END"))
            .cast("long")
            .alias("n_moved_out"),
            F.sum(F.expr("CASE WHEN kept THEN 0 ELSE bytes END"))
            .cast("long")
            .alias("bytes_moved_out"),
        )
        .select(
            "node",
            "n_shards",
            "load_before",
            "cap",
            "n_moved_out",
            "bytes_moved_out",
            (F.col("load_before") - F.col("bytes_moved_out"))
            .cast("long")
            .alias("load_after"),
            F.expr("CAST(greatest(0, load_before - cap) AS BIGINT)").alias(
                "excess"
            ),
        )
        .orderBy("node")
    )


def _sql_shard_rebalance() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    hs = _SQL_HASH56.format(col="'sh|' || x")
    hp = _SQL_HASH56.format(col="'pl|' || CAST(shard AS VARCHAR)")
    return f"""
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS x, n_chars FROM documents
),
sized AS (
  SELECT {hs} % {RB_SHARDS} AS shard, CAST(sum(n_chars) AS BIGINT) AS base
  FROM docs GROUP BY 1
),
shards AS (
  SELECT shard,
         CAST(base * CASE WHEN shard % {RB_HEAVY_MOD} = 0
                          THEN {RB_HEAVY_MULT} ELSE 1 END AS BIGINT)
           AS bytes,
         CAST({hp} % {RB_NODES} AS BIGINT) AS node
  FROM sized
),
tot AS (
  SELECT CAST(sum(bytes) AS BIGINT) AS t FROM shards
),
planned AS (
  SELECT node, shard, bytes,
         CAST(((SELECT t FROM tot) + {RB_NODES} - 1) // {RB_NODES}
              AS BIGINT) AS cap,
         sum(bytes) OVER (PARTITION BY node
                          ORDER BY bytes DESC, shard ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS csum
  FROM shards
)
SELECT node,
       CAST(count(*) AS BIGINT) AS n_shards,
       CAST(sum(bytes) AS BIGINT) AS load_before,
       cap,
       CAST(sum(CASE WHEN csum <= cap THEN 0 ELSE 1 END) AS BIGINT)
         AS n_moved_out,
       CAST(sum(CASE WHEN csum <= cap THEN 0 ELSE bytes END) AS BIGINT)
         AS bytes_moved_out,
       CAST(sum(bytes) - sum(CASE WHEN csum <= cap THEN 0 ELSE bytes END)
            AS BIGINT) AS load_after,
       CAST(greatest(0, sum(bytes) - cap) AS BIGINT) AS excess
FROM planned
GROUP BY node, cap
ORDER BY node
"""


QUERIES["shard_rebalance_plan"] = (shard_rebalance_plan, _sql_shard_rebalance())
