"""Training-data preparation operators over ``documents``.

Large-scale-training staples the driver brief calls first-class, beyond the
dedup/similarity/quality families:

- **sequence packing** (concat-then-chunk): assign every document its token
  offset in the corpus-order concatenation and the fixed-length pack (context
  window) range it lands in — the GPT-style "concatenate then split every
  ``SEQ_LEN`` tokens" layout.
- **domain mixture sampling**: deterministic hash-based subsampling with a
  per-source rate — the mixture-reweighting step of corpus assembly.
- **length bucketing**: integer token-length buckets per language for batch
  scheduling.

All outputs are integer-only (cross-engine hash-deterministic; see
operators/__init__ rules).

Scale notes (100 TB): the packing prefix-sum is the textbook scale trap — a
window ``sum() OVER (ORDER BY doc_id)`` with no partition key collapses the
whole corpus into ONE task. We compute it as a two-level prefix sum instead:
per-shard totals (one row per ``PACK_SHARD`` docs) get a tiny driver-side
cumulative pass, then a broadcast join seeds a PARTITIONED window inside each
shard — every stage is shuffle-on-shard with bounded partitions. Mixture
sampling and bucketing are map-only + one uniform groupBy.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from harvester_spark.analysis import tokens_column
from harvester_spark.operators.common import SQL_DOC_TOKS, SQL_TOKS, doc_tokens, load

SEQ_LEN = 256  # tokens per packed training sequence
PACK_SHARD = 64  # docs per prefix-sum shard (tune ~10k at real scale)
SAMPLE_MOD = 10_000  # basis-point granularity of the mixture sampler
RATE_FLOOR_BP = 2_000  # every source keeps at least 20%
BUCKET_W = 16  # tokens per length bucket


def _hash56(col):
    """56-bit integer hash of a string column (identical across engines —
    same convention as operators/dedup.py)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


_SQL_HASH56 = "CAST(('0x' || substr(md5({col}), 1, 14)) AS BIGINT)"

def _n_tokens():
    return F.size(tokens_column(F.col("text"))).cast("long")


_SQL_N_TOKENS = f"CAST(len({SQL_TOKS.format(col='text')}) AS BIGINT)"


# ------------------------------------------------------------ sequence packing


def pack_sequences(spark, sf_dir):
    """Concat-then-chunk packing index: for each doc (corpus concatenation in
    doc_id order), its global token ``start_offset`` and the [pack_first,
    pack_last] range of SEQ_LEN-token training sequences it spans.

    The reference has no packing analogue (it ships documents to OpenSearch
    whole); this is the training-data layout step. Two-level prefix sum (see
    module docstring) — no global single-partition window over documents.
    """
    return _pack_by(
        load(spark, sf_dir, "documents").select(
            "doc_id", _n_tokens().alias("n_tokens")
        )
    )


SQL_PACK_SEQUENCES = f"""
WITH d AS (
  SELECT doc_id, {_SQL_N_TOKENS} AS n_tokens FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM d
)
SELECT doc_id, n_tokens, start_offset,
       start_offset // {SEQ_LEN} AS pack_first,
       (start_offset + greatest(n_tokens, 1) - 1) // {SEQ_LEN} AS pack_last,
       (start_offset + greatest(n_tokens, 1) - 1) // {SEQ_LEN}
         - start_offset // {SEQ_LEN} + 1 AS packs_spanned
FROM o
"""


# ------------------------------------------------------ domain mixture sample


def domain_mixture_sample(spark, sf_dir):
    """Deterministic mixture sampling: each source gets a hash-derived keep
    rate in basis points (RATE_FLOOR_BP + hash % (SAMPLE_MOD-RATE_FLOOR_BP)),
    and a doc survives iff hash56(source:doc_id) % SAMPLE_MOD < rate. Reports
    per-source totals. Map-only + one groupBy on source — no skew (sources
    are the grouping key, counts are map-side-combined)."""
    docs = load(spark, sf_dir, "documents")
    rate = (
        F.lit(RATE_FLOOR_BP)
        + _hash56(F.col("source")) % F.lit(SAMPLE_MOD - RATE_FLOOR_BP)
    )
    draw = _hash56(
        F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))
    ) % F.lit(SAMPLE_MOD)
    return (
        docs.select(
            "source",
            rate.alias("rate_bp"),
            F.when(draw < rate, 1).otherwise(0).cast("long").alias("kept"),
        )
        .groupBy("source", "rate_bp")
        .agg(F.count("*").alias("n_docs"), F.sum("kept").alias("n_kept"))
    )


_SQL_RATE = (
    f"{RATE_FLOOR_BP} + {_SQL_HASH56.format(col='source')}"
    f" % {SAMPLE_MOD - RATE_FLOOR_BP}"
)
_SQL_DRAW = (
    _SQL_HASH56.format(col="source || ':' || CAST(doc_id AS VARCHAR)")
    + f" % {SAMPLE_MOD}"
)
SQL_DOMAIN_MIXTURE = f"""
SELECT source, {_SQL_RATE} AS rate_bp,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN {_SQL_DRAW} < {_SQL_RATE} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM documents
GROUP BY source
"""


# ------------------------------------------------------------ length buckets


def ft_length_buckets(spark, sf_dir):
    """Token-length bucketing per language (BUCKET_W-token integer buckets)
    for training-batch scheduling. Integer division only — no float log2
    whose boundary rounding could differ across engines."""
    docs = load(spark, sf_dir, "documents").select(
        "lang", _n_tokens().alias("n_tokens")
    )
    return (
        docs.withColumn(
            "bucket_lo",
            F.expr(f"(n_tokens div {BUCKET_W}) * {BUCKET_W}").cast("long"),
        )
        .groupBy("lang", "bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bucket_tokens"),
        )
    )


SQL_LENGTH_BUCKETS = f"""
WITH d AS (SELECT lang, {_SQL_N_TOKENS} AS n_tokens FROM documents)
SELECT lang, (n_tokens // {BUCKET_W}) * {BUCKET_W} AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens
FROM d GROUP BY lang, (n_tokens // {BUCKET_W}) * {BUCKET_W}
"""


QUERIES = {
    "pack_sequences": (pack_sequences, SQL_PACK_SEQUENCES),
    "domain_mixture_sample": (domain_mixture_sample, SQL_DOMAIN_MIXTURE),
    "ft_length_buckets": (ft_length_buckets, SQL_LENGTH_BUCKETS),
}


# ------------------------------------------- packing by REAL BPE counts


def _pack_by(docs):
    """The two-level prefix-sum packing layout over a (doc_id, n_tokens)
    frame — shared by the whitespace and real-BPE counters."""
    docs = docs.withColumn("shard", F.expr(f"doc_id div {PACK_SHARD}"))
    shard_sums = docs.groupBy("shard").agg(F.sum("n_tokens").alias("shard_tokens"))
    w_sh = W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    shard_off = shard_sums.select(
        "shard",
        F.coalesce(F.sum("shard_tokens").over(w_sh), F.lit(0)).alias("shard_offset"),
    )
    w_in = W.partitionBy("shard").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    out = (
        docs.join(F.broadcast(shard_off), "shard")
        .withColumn(
            "start_offset",
            (
                F.col("shard_offset")
                + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "pack_first", F.expr(f"start_offset div {SEQ_LEN}").cast("long")
        )
        .withColumn(
            "pack_last",
            F.expr(
                f"(start_offset + greatest(n_tokens, 1) - 1) div {SEQ_LEN}"
            ).cast("long"),
        )
        .withColumn(
            "packs_spanned", (F.col("pack_last") - F.col("pack_first") + 1)
        )
    )
    return out.select(
        "doc_id", "n_tokens", "start_offset", "pack_first", "pack_last",
        "packs_spanned",
    )


def pack_sequences_bpe(spark, sf_dir):
    """Sequence packing by the REAL BPE token counts (frozen merge table,
    harvester_spark/bpe.py) instead of the whitespace estimate — the counts
    a real training pipeline packs context windows by. Same two-level
    prefix-sum plan (no global single-partition window); the BPE fold is
    pure codegen string replaces, so the extra cost is map-side only."""
    from harvester_spark.bpe import bpe_token_count_col

    docs = load(spark, sf_dir, "documents")
    words = tokens_column(F.col("text"))
    n_bpe = F.aggregate(
        F.transform(words, bpe_token_count_col),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return _pack_by(docs.select("doc_id", n_bpe.alias("n_tokens")))


def _sql_pack_sequences_bpe() -> str:
    from harvester_spark.bpe import sql_bpe_token_count

    toks = SQL_TOKS.format(col="text")
    per_word = sql_bpe_token_count("w")
    n_bpe = (
        f"CAST(coalesce(list_sum(list_transform({toks}, w -> {per_word})), 0)"
        " AS BIGINT)"
    )
    return f"""
WITH d AS (
  SELECT doc_id, {n_bpe} AS n_tokens FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM d
)
SELECT doc_id, n_tokens, start_offset,
       start_offset // {SEQ_LEN} AS pack_first,
       (start_offset + greatest(n_tokens, 1) - 1) // {SEQ_LEN} AS pack_last,
       (start_offset + greatest(n_tokens, 1) - 1) // {SEQ_LEN}
         - start_offset // {SEQ_LEN} + 1 AS packs_spanned
FROM o
"""


QUERIES["pack_sequences_bpe"] = (pack_sequences_bpe, _sql_pack_sequences_bpe())


# -------------------------------------------- per-source quality selection


def corpus_quality_select(spark, sf_dir):
    """RefinedWeb-style per-source quality selection: rank every doc within
    its source by quality (type/token ratio desc, token count desc, doc_id
    asc — the exact-integer-division features of ft_quality_score) and keep
    the top half. Output is the per-doc rank + kept flag.

    Scale shape: ONE shuffle on source with a per-source sort (AQE skew
    split on). At 100 TB with one giant domain the exact within-source rank
    becomes the bottleneck; the production variant computes an approximate
    per-source quality THRESHOLD from a sample and keeps docs above it
    (map-only after a tiny broadcast), trading exact top-p% for no sort —
    this operator keeps the exact semantics the oracle can verify."""
    from harvester_spark.operators.fulltext_queries import ft_quality_score

    q = ft_quality_score(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    j = q.join(docs, "doc_id")
    w = W.partitionBy("source").orderBy(
        F.col("type_token_ratio").desc(), F.col("n_tokens").desc(),
        F.col("doc_id").asc(),
    )
    wc = W.partitionBy("source")
    return (
        j.withColumn("q_rank", F.row_number().over(w).cast("long"))
        .withColumn("n_source_docs", F.count("*").over(wc).cast("long"))
        .withColumn(
            "kept",
            (F.col("q_rank") * 2 <= F.col("n_source_docs")).cast("long"),
        )
        .select("source", "doc_id", "q_rank", "n_source_docs", "kept")
    )


def _sql_quality_select() -> str:
    from harvester_spark.operators.fulltext_queries import SQL_QUALITY_SCORE

    return f"""
WITH q AS ({SQL_QUALITY_SCORE}),
j AS (
  SELECT d.source, q.doc_id, q.n_tokens, q.type_token_ratio
  FROM q JOIN documents d USING (doc_id)
)
SELECT source, doc_id,
       CAST(row_number() OVER (
         PARTITION BY source
         ORDER BY type_token_ratio DESC, n_tokens DESC, doc_id ASC
       ) AS BIGINT) AS q_rank,
       CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_source_docs,
       CAST(CASE WHEN row_number() OVER (
         PARTITION BY source
         ORDER BY type_token_ratio DESC, n_tokens DESC, doc_id ASC
       ) * 2 <= count(*) OVER (PARTITION BY source) THEN 1 ELSE 0 END AS BIGINT)
         AS kept
FROM j
"""


QUERIES["corpus_quality_select"] = (corpus_quality_select, _sql_quality_select())


# ------------------------------------------ CCNet LM-perplexity buckets


def ft_lm_quality_buckets(spark, sf_dir):
    """CCNet's head/middle/tail corpus split: per language, tercile docs by
    unigram-LM average negative log-likelihood (ascending — head = most
    fluent) with a doc_id tie-break, then report per-bucket doc and token
    totals. The published pipeline keeps 'head' (and sometimes 'middle')
    for training. One window on (lang) over the already-aggregated per-doc
    LM scores + one groupBy — no extra pass over tokens."""
    from harvester_spark.operators.fulltext_queries import ft_unigram_logprob

    lm = ft_unigram_logprob(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    j = lm.join(docs, "doc_id")
    w = W.partitionBy("lang").orderBy(F.col("avg_nll").asc(), F.col("doc_id").asc())
    return (
        j.withColumn("bucket", F.ntile(3).over(w).cast("long"))
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bucket_tokens"),
            F.round(F.avg("avg_nll"), 6).alias("mean_nll"),
        )
    )


def _sql_lm_quality_buckets() -> str:
    from harvester_spark.operators.fulltext_queries import SQL_UNIGRAM_LOGPROB

    return f"""
WITH lm AS ({SQL_UNIGRAM_LOGPROB}),
j AS (
  SELECT d.lang, lm.doc_id, lm.n_tokens, lm.avg_nll,
         ntile(3) OVER (
           PARTITION BY d.lang ORDER BY lm.avg_nll ASC, lm.doc_id ASC
         ) AS bucket
  FROM lm JOIN documents d USING (doc_id)
)
SELECT lang, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens,
       round(avg(avg_nll), 6) AS mean_nll
FROM j GROUP BY lang, bucket
"""


QUERIES["ft_lm_quality_buckets"] = (ft_lm_quality_buckets, _sql_lm_quality_buckets())


# Deterministic train/validation split: bucket every doc by a salted content-
# independent hash of its id and carve the val set from fixed buckets. The
# property that matters at 100 TB: the assignment is a pure per-row function
# of doc_id (map-only, no shuffle, no sampling state), STABLE under corpus
# growth and repartitioning — adding docs never reshuffles existing
# assignments, unlike randomSplit (partition-order-dependent) or any
# sample() (seed × partitioning dependent). Salt isolates this split from
# every other hash-bucketed decision in the pipeline.

SPLIT_SALT = "hs-split-v1"
SPLIT_BUCKETS = 1000
VAL_BUCKETS = 10  # 1% validation


def split_train_val(spark, sf_dir):
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    bucket = (
        _hash56(F.concat(F.lit(SPLIT_SALT + ":"), F.col("doc_id").cast("string")))
        % SPLIT_BUCKETS
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < VAL_BUCKETS, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def _sql_split_train_val() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col=f"('{SPLIT_SALT}:' || CAST(doc_id AS VARCHAR))")
    return f"""
SELECT doc_id,
       {h} % {SPLIT_BUCKETS} AS bucket,
       CASE WHEN {h} % {SPLIT_BUCKETS} < {VAL_BUCKETS} THEN 'val' ELSE 'train' END AS split
FROM documents
"""


QUERIES["split_train_val"] = (split_train_val, _sql_split_train_val())


# Exact stratified quota sampling: take EXACTLY ceil(n_s * QUOTA_BP / 10000)
# docs per stratum (lang), the ones with the smallest salted hashes — the
# "give me exactly X tokens of each domain" selection real training mixes
# pin, where Bernoulli sampling (domain_mixture_sample) only hits the quota
# in expectation.
#
# Scale shape — DISTRIBUTED exact order-statistic selection, no per-stratum
# sort anywhere (the first cut of this operator ranked a ~2*quota candidate
# set in one per-stratum window partition; at a 10% quota that is n/5 rows
# on one executor — fixed):
# 1. one count agg per stratum (map-side combined);
# 2. hashes are uniform on [0, 2^56), so the q_s-th smallest concentrates
#    near q_s/n_s * 2^56; filter to a 2x-expected cutoff — the candidate
#    set is ~2*q_s rows (Chernoff: the true quota set escapes the cutoff
#    with prob < exp(-q_s/4); shortfall raises, never under-samples);
# 3. histogram the candidates into 4096 hash-range buckets per stratum (one
#    map-side agg, <= strata x 4096 rows to the driver), cumulative-sum on
#    the driver to locate each stratum's BOUNDARY bucket: buckets wholly
#    below it are kept outright (map-only broadcast-join filter), buckets
#    above dropped, and ONLY the boundary bucket — ~|cand|/4096 rows — is
#    ranked exactly by (h, doc_id) to take its remaining
#    q_s - cum_below slots.
# The oracle computes the TRUE order statistic over the full stratum with a
# plain window; the value-hash gate proves the bucketed execution selects
# the identical set.

QUOTA_BP = 1_000  # 10% per stratum
QUOTA_SALT = "hs-quota-v1"
_QUOTA_HSPACE = 1 << 56
_QUOTA_BUCKETS = 4096


def stratified_quota_sample(spark, sf_dir):
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    h = _hash56(
        F.concat(F.lit(QUOTA_SALT + ":"), F.col("doc_id").cast("string"))
    )
    d = docs.select("doc_id", "lang", h.alias("h"))
    counts = {
        r["lang"]: r["n_s"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n_s")).collect()
    }
    quotas = {
        lang: (n * QUOTA_BP + 9_999) // 10_000 for lang, n in counts.items() if n > 0
    }
    # 2x-expected-order-statistic cutoff per stratum (driver arithmetic —
    # exact Python ints, no float rounding)
    cuts = {
        lang: min(_QUOTA_HSPACE, (_QUOTA_HSPACE // counts[lang]) * 2 * q)
        for lang, q in quotas.items()
    }
    cut_df = F.broadcast(
        spark.createDataFrame(
            [(lang, c) for lang, c in sorted(cuts.items())], "lang string, cut long"
        )
    )
    bwidth = _QUOTA_HSPACE // _QUOTA_BUCKETS
    cand = (
        d.join(cut_df, "lang")
        .filter(F.col("h") < F.col("cut"))
        .withColumn("bkt", (F.col("h") / bwidth).cast("long"))
    )
    hist = {
        (r["lang"], r["bkt"]): r["c"]
        for r in cand.groupBy("lang", "bkt").agg(F.count("*").alias("c")).collect()
    }
    # driver cumsum: per stratum, find the boundary bucket and the number of
    # slots it contributes; buckets below are kept wholesale
    keep_below: list[tuple[str, int]] = []   # (lang, boundary_bkt)
    boundary: list[tuple[str, int, int]] = []  # (lang, boundary_bkt, slots)
    for lang, q in quotas.items():
        cum = 0
        bks = sorted(b for (l, b) in hist if l == lang)
        found = False
        for b in bks:
            c = hist[(lang, b)]
            if cum + c >= q:
                keep_below.append((lang, b))
                if q - cum > 0:
                    boundary.append((lang, b, q - cum))
                found = True
                break
            cum += c
        if not found:
            raise ValueError(
                f"stratified_quota_sample: candidate pool under quota for "
                f"stratum {lang!r} ({cum} < {q}) — widen cutoff"
            )
    kb_df = F.broadcast(
        spark.createDataFrame(keep_below, "lang string, bbkt long")
    )
    whole = cand.join(kb_df, "lang").filter(F.col("bkt") < F.col("bbkt"))
    bd_df = F.broadcast(
        spark.createDataFrame(boundary, "blang string, bbkt long, slots long")
    )
    wq = W.partitionBy("lang", "bkt").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    edge = (
        cand.join(
            bd_df,
            (F.col("lang") == F.col("blang")) & (F.col("bkt") == F.col("bbkt")),
        )
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= F.col("slots"))
    )
    return whole.select("doc_id", "lang").unionByName(edge.select("doc_id", "lang"))


def _sql_stratified_quota_sample() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col=f"('{QUOTA_SALT}:' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH d AS (SELECT doc_id, lang, {h} AS h FROM documents),
q AS (
  SELECT lang, (count(*) * {QUOTA_BP} + 9999) // 10000 AS q_s
  FROM d GROUP BY lang
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS rk
  FROM d
)
SELECT r.doc_id, r.lang
FROM ranked r JOIN q USING (lang)
WHERE r.rk <= q.q_s
"""


QUERIES["stratified_quota_sample"] = (
    stratified_quota_sample,
    _sql_stratified_quota_sample(),
)


# ------------------------------------------------ distributed BPE trainer

# The trainer that PRODUCES merge tables like the frozen asset in bpe.py
# (which stays frozen — oracle SQL embeds it). Classic Sennrich BPE over the
# analyzer word-frequency table: count adjacent symbol pairs weighted by word
# frequency, merge the most frequent (ties lexicographic), repeat. The
# sandbox reference is tools/train_bpe.py (driver-resident Counter); this is
# its distributed twin for a 10^8-word web vocabulary.
#
# Scale shape: ONE corpus-wide tokenize + groupBy(word) builds the histogram
# (persisted — every iteration reuses it); each Lloyd-style iteration is one
# map-side-combined pair agg over the VOCABULARY (not the corpus) plus a
# 1-row TakeOrdered collect (the bounded-driver contract emb_kmeans_assign
# documents). Re-segmentation is a pure string-replace column stacked onto
# the persisted histogram — bpe.py's double-separator rendering makes one
# left-to-right replace pass per merge EXACT BPE (see bpe.py docstring).

BPE_TRAIN_N = 8  # merges learned by the queries() entry


def bpe_train_merges(spark, sf_dir, n_merges: int = BPE_TRAIN_N):
    """Learn the top ``n_merges`` BPE merges from the corpus; returns one row
    per merge: (merge_ix, lhs, rhs, merged, pair_count). Deterministic —
    equals tools/train_bpe.train on the same parquet (tested)."""
    from harvester_spark.bpe import SEP
    from harvester_spark.operators.common import doc_tokens

    hist = (
        doc_tokens(spark, sf_dir)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count("*").cast("long").alias("freq"))
        .persist()
    )
    seg = F.concat(
        F.lit(SEP * 2), F.regexp_replace(F.col("word"), "(.)", "$1" + SEP * 2)
    )
    learned = []
    try:
        for k in range(1, n_merges + 1):
            s = F.filter(F.split(seg, SEP * 2), lambda t: t != F.lit(""))
            shifted = F.slice(s, 2, F.greatest(F.size(s), F.lit(1)))
            prs = F.filter(
                F.zip_with(
                    s, shifted, lambda x, y: F.struct(x.alias("a"), y.alias("b"))
                ),
                lambda p: p.getField("b").isNotNull(),
            )
            agg = (
                hist.select(F.explode(prs).alias("p"), "freq")
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").cast("long").alias("cnt"))
            )
            top = agg.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
            if not top:
                raise ValueError(
                    f"BPE training exhausted pairs after {k - 1} merges"
                )
            best = top[0]
            learned.append(
                (k, best["a"], best["b"], best["a"] + best["b"], best["cnt"])
            )
            seg = F.replace(
                seg,
                F.lit(f"{SEP}{best['a']}{SEP}{SEP}{best['b']}{SEP}"),
                F.lit(f"{SEP}{best['a']}{best['b']}{SEP}"),
            )
    finally:
        hist.unpersist()
    return spark.createDataFrame(
        learned,
        "merge_ix INT, lhs STRING, rhs STRING, merged STRING, pair_count LONG",
    )


def _sql_bpe_train(n_merges: int = BPE_TRAIN_N) -> str:
    """Chained-CTE twin: stage k counts pairs over seg(k-1), picks the argmax
    (cnt desc, a asc, b asc), and replaces — the same double-separator
    replace bpe.py proves exact."""
    parts = [
        f"""
words AS (
  SELECT unnest({SQL_TOKS.format(col='text')}) AS word FROM documents
),
hist AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM words GROUP BY word),
seg0 AS MATERIALIZED (
  SELECT word, freq,
         repeat(chr(31),2) || regexp_replace(word, '(.)', '\\1' || repeat(chr(31),2), 'g') AS seg
  FROM hist
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""
syms{k} AS (
  SELECT freq, list_filter(string_split(seg, repeat(chr(31),2)), t -> t <> '') AS s
  FROM seg{k - 1}
),
pairs{k} AS (
  SELECT unnest(list_transform(range(1, greatest(len(s),1)), i -> s[i])) AS a,
         unnest(list_transform(range(1, greatest(len(s),1)), i -> s[i+1])) AS b,
         freq
  FROM syms{k}
),
best{k} AS MATERIALIZED (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM pairs{k} GROUP BY a, b
  ORDER BY cnt DESC, a, b LIMIT 1
),
seg{k} AS MATERIALIZED (
  SELECT word, freq,
         replace(seg,
           chr(31) || (SELECT a FROM best{k}) || chr(31) || chr(31) || (SELECT b FROM best{k}) || chr(31),
           chr(31) || (SELECT a || b FROM best{k}) || chr(31)) AS seg
  FROM seg{k - 1}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_ix, a AS lhs, b AS rhs, a || b AS merged,"
        f" cnt AS pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",".join(parts) + "\n" + union


QUERIES["bpe_train_merges"] = (bpe_train_merges, _sql_bpe_train())


# --------------------------------------------------------------------- DSIR

# Data Selection via Importance Resampling (DSIR; Xie et al. 2023,
# arXiv:2302.03169): score every raw document by how target-like it is in a
# hashed n-gram feature space, then Gumbel-top-k resample — the standard
# "select web data that looks like the target domain" stage of LM corpus
# assembly. Reference anchor: the dataset-filtering role of
# /root/reference/harvester/core/models/datatypes/dataset.py (which curates
# by source/state) generalized to distribution matching.
#
# Determinism: the bucket log-ratios are INTEGER micro-nats (round(1e6*ln)
# per bucket, identical expression in both engines), so the per-doc
# importance log-weight is an exact int64 sum; the Gumbel noise derives from
# md5(salt || doc_id) so the resample is a pure function of the corpus.
#
# Scale shape — the paper's own two-pass structure: pass 1 reduces the
# corpus to a DSIR_BUCKETS-row (bucket, target_count, raw_count) table (one
# map-side-combined groupBy over hashed features; output is KB-sized
# regardless of corpus size); the model then joins back by BROADCAST and
# pass 2 is one partial-aggregated groupBy(doc_id) — shuffle volume is one
# row per doc, never one row per token. Selection is TakeOrdered (per-
# partition heaps), rank window AFTER the limit.

DSIR_BUCKETS = 1024
DSIR_K = 64
DSIR_SALT = "hs-dsir-v1"
DSIR_TARGET_LANG = "en"  # target slice: p = en docs, q = the whole pool
_DSIR_HSPACE = float(1 << 56)


def _dsir_feature_buckets(spark, sf_dir):
    """(doc_id, lang, bucket) — one row per unigram/bigram occurrence."""
    from harvester_spark.operators.curation import classifier_features

    docs = load(spark, sf_dir, "documents")
    feats = classifier_features(tokens_column(F.col("text")))
    return docs.select(
        "doc_id", "lang", F.explode(feats).alias("f")
    ).withColumn("bucket", _hash56(F.col("f")) % DSIR_BUCKETS)


def dsir_select(spark, sf_dir):
    """DSIR top-k selection: (rank, doc_id, n_feats, logw_micro,
    gumbel_micro, key_micro) — the DSIR_K raw docs sampled by importance
    weight p(features)/q(features) with deterministic Gumbel noise."""
    fb = _dsir_feature_buckets(spark, sf_dir)
    dist = fb.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0))
        .cast("long")
        .alias("pc"),
        F.count("*").cast("long").alias("qc"),
    )
    tot = dist.agg(
        F.sum("pc").cast("long").alias("p_tot"),
        F.sum("qc").cast("long").alias("q_tot"),
    )
    lr = (
        F.round(
            F.lit(1e6)
            * F.log((F.col("pc") + 1.0) / (F.col("p_tot") + DSIR_BUCKETS)),
            0,
        ).cast("long")
        - F.round(
            F.lit(1e6)
            * F.log((F.col("qc") + 1.0) / (F.col("q_tot") + DSIR_BUCKETS)),
            0,
        ).cast("long")
    )
    model = F.broadcast(
        dist.crossJoin(F.broadcast(tot)).select("bucket", lr.alias("lr_micro"))
    )
    logw = (
        fb.join(model, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("lr_micro").cast("long").alias("logw_micro"),
        )
    )
    u = (
        _hash56(F.concat(F.lit(DSIR_SALT), F.col("doc_id").cast("string")))
        + 0.5
    ) / F.lit(_DSIR_HSPACE)
    gumbel = F.round(F.lit(-1e6) * F.log(-F.log(u)), 0).cast("long")
    scored = logw.withColumn("gumbel_micro", gumbel).withColumn(
        "key_micro", F.col("logw_micro") + F.col("gumbel_micro")
    )
    topk = scored.orderBy(
        F.col("key_micro").desc(), F.col("doc_id").asc()
    ).limit(DSIR_K)
    w = W.orderBy(F.col("key_micro").desc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(
        "rank", "doc_id", "n_feats", "logw_micro", "gumbel_micro", "key_micro"
    )


_SQL_DSIR_FB = f"""
  SELECT doc_id, lang,
         {_SQL_HASH56.format(col='f')} % {DSIR_BUCKETS} AS bucket
  FROM (
    SELECT doc_id, lang,
           unnest(list_concat(
             toks,
             list_transform(range(1, greatest(len(toks), 1)),
                            i -> toks[i] || '_' || toks[i + 1])
           )) AS f
    FROM (SELECT doc_id, lang, {SQL_TOKS.format(col='text')} AS toks
          FROM documents)
  )
"""

SQL_DSIR_SELECT = f"""
WITH fb AS ({_SQL_DSIR_FB}),
dist AS (
  SELECT bucket,
         CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS pc,
         CAST(count(*) AS BIGINT) AS qc
  FROM fb GROUP BY bucket
),
tot AS (
  SELECT CAST(sum(pc) AS BIGINT) AS p_tot, CAST(sum(qc) AS BIGINT) AS q_tot
  FROM dist
),
model AS (
  SELECT bucket,
         CAST(round(1000000.0 * ln((pc + 1.0) / (p_tot + {DSIR_BUCKETS})), 0)
              AS BIGINT)
         - CAST(round(1000000.0 * ln((qc + 1.0) / (q_tot + {DSIR_BUCKETS})), 0)
                AS BIGINT) AS lr_micro
  FROM dist CROSS JOIN tot
),
logw AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(lr_micro) AS BIGINT) AS logw_micro
  FROM fb JOIN model USING (bucket)
  GROUP BY doc_id
),
scored AS (
  SELECT doc_id, n_feats, logw_micro,
         CAST(round(-1000000.0 * ln(-ln(
           ({_SQL_HASH56.format(col=f"'{DSIR_SALT}' || CAST(doc_id AS VARCHAR)")}
            + 0.5) / {_DSIR_HSPACE!r})), 0) AS BIGINT) AS gumbel_micro
  FROM logw
)
SELECT CAST(row_number() OVER (ORDER BY logw_micro + gumbel_micro DESC,
                               doc_id ASC) AS BIGINT) AS rank,
       doc_id, n_feats, logw_micro, gumbel_micro,
       logw_micro + gumbel_micro AS key_micro
FROM scored
QUALIFY rank <= {DSIR_K}
"""

QUERIES["dsir_select"] = (dsir_select, SQL_DSIR_SELECT)


# -------------------------------------------------------- exact quantiles

# Exact distributed order statistics (p50/p90/p99 token length per lang) —
# the length-distribution report every batch-scheduling / truncation
# decision reads. NOT approx_percentile: the length domain is bounded
# (thousands of distinct values no matter how many docs), so the exact
# answer comes from a (lang, n_tokens) histogram — corpus-sized input, one
# map-side-combined groupBy down to the bounded histogram, then a window
# over the HISTOGRAM (bounded rows per lang), never over documents. The
# same bounded-domain trick as stratified_quota_sample's selection, minus
# the boundary ranking. Thresholds are integer ceil((n·p)/100) on both
# engines — no float percent arithmetic.

QUANTILE_PS = (50, 90, 99)


def doc_length_quantiles(spark, sf_dir):
    """(lang, n_docs, p50, p90, p99) — exact discrete quantiles: the
    smallest length whose cumulative doc count reaches ceil(n·p/100)."""
    d = load(spark, sf_dir, "documents").select("lang", _n_tokens().alias("n_tokens"))
    hist = d.groupBy("lang", "n_tokens").agg(F.count("*").cast("long").alias("cnt"))
    tot = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    w = (
        W.partitionBy("lang")
        .orderBy(F.col("n_tokens").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    j = cum.join(F.broadcast(tot), "lang")
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n_docs * {p} + 99) div 100"),
                F.col("n_tokens"),
            )
        )
        .cast("long")
        .alias(f"p{p}")
        for p in QUANTILE_PS
    ]
    return j.groupBy("lang", "n_docs").agg(*aggs)


SQL_DOC_LENGTH_QUANTILES = f"""
WITH d AS (SELECT lang, {_SQL_N_TOKENS} AS n_tokens FROM documents),
hist AS (
  SELECT lang, n_tokens, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2
),
tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY 1),
cum AS (
  SELECT lang, n_tokens,
         sum(cnt) OVER (PARTITION BY lang ORDER BY n_tokens ASC
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
)
SELECT t.lang, t.n_docs,
       {", ".join(
           f"CAST(min(CASE WHEN cum >= (t.n_docs * {p} + 99) // 100 "
           f"THEN n_tokens END) AS BIGINT) AS p{p}"
           for p in QUANTILE_PS
       )}
FROM cum c JOIN tot t USING (lang)
GROUP BY t.lang, t.n_docs
"""

QUERIES["doc_length_quantiles"] = (doc_length_quantiles, SQL_DOC_LENGTH_QUANTILES)

# ------------------------------------------------------- passage chunking

# Retrieval-prep chunking: split every document into overlapping
# CHUNK_W-token windows on a CHUNK_S stride (the RAG passage layout —
# neighbors share CHUNK_W - CHUNK_S tokens of context so no answer span is
# ever cut without a copy). Pure map-side: the token array expands to its
# windows inside the scan's codegen stage — ZERO exchanges at any corpus
# size (plan-guarded in tests/test_chunk_passages.py). Contrast with
# pack_sequences above: packing is corpus-order concatenation (needs the
# two-level prefix sum); chunking is per-doc and embarrassingly parallel.

CHUNK_W = 32  # tokens per passage window
CHUNK_S = 24  # stride (overlap = CHUNK_W - CHUNK_S)


def chunk_passages(spark, sf_dir):
    """(doc_id, chunk_ix, start_pos, n_tokens, chunk_digest): every doc's
    overlapping token windows; the final window may be short, and an empty
    doc still yields exactly one (empty) chunk so no doc silently drops."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_column(F.col("text")).alias("t"))
    e = t.select("doc_id", "t", F.size("t").alias("n")).withColumn(
        "n_chunks",
        F.expr(
            f"1 + CASE WHEN n > {CHUNK_W}"
            f" THEN (n - {CHUNK_W} + {CHUNK_S - 1}) DIV {CHUNK_S} ELSE 0 END"
        ),
    )
    ch = e.select(
        "doc_id",
        "t",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_ix"),
    )
    ct = F.expr(f"slice(t, chunk_ix * {CHUNK_S} + 1, {CHUNK_W})")
    return ch.select(
        "doc_id",
        F.col("chunk_ix").cast("long").alias("chunk_ix"),
        (F.col("chunk_ix").cast("long") * CHUNK_S).alias("start_pos"),
        F.size(ct).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", ct)).alias("chunk_digest"),
    )


SQL_CHUNK_PASSAGES = f"""
WITH tk AS (SELECT doc_id, {SQL_TOKS.format(col='text')} AS t FROM documents),
e AS (
  SELECT doc_id, t,
         1 + CASE WHEN len(t) > {CHUNK_W}
                  THEN (len(t) - {CHUNK_W} + {CHUNK_S - 1}) // {CHUNK_S}
                  ELSE 0 END AS n_chunks
  FROM tk
),
ch AS (SELECT doc_id, t, unnest(range(0, n_chunks)) AS chunk_ix FROM e)
SELECT doc_id, CAST(chunk_ix AS BIGINT) AS chunk_ix,
       CAST(chunk_ix * {CHUNK_S} AS BIGINT) AS start_pos,
       CAST(len(list_slice(t, chunk_ix * {CHUNK_S} + 1,
                           chunk_ix * {CHUNK_S} + {CHUNK_W})) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(t, chunk_ix * {CHUNK_S} + 1,
                                      chunk_ix * {CHUNK_S} + {CHUNK_W}), ' ')) AS chunk_digest
FROM ch
"""

QUERIES["chunk_passages"] = (chunk_passages, SQL_CHUNK_PASSAGES)


# ------------------------------------------ deterministic training order

# The last step before a training run reads the corpus: a GLOBAL shuffle of
# the selected documents into shard files, reproducible run-to-run. Spark's
# own randomness (rand(), repartition's round-robin, randomSplit) is
# partition-order dependent — two runs over the same corpus can emit
# different orders. The stable recipe is the same salted-hash trick as
# split_train_val: order_key = h56(salt || doc_id) is a pure per-row
# function, so the induced permutation is independent of partitioning,
# cluster size, and input file layout.
#
# Shard capacity is DERIVED from corpus size (the derive_n_planes contract:
# never a fixed constant that breaks at 100×): n_shards = max(n // DOCS_PER
# _SHARD, 1), so the per-shard row_number window partition is ~DOCS_PER_
# SHARD rows by construction — the window never concentrates the corpus on
# one executor no matter how big n gets, and each shard is one training
# file. One shuffle total (on shard); the within-shard ordering rides the
# same exchange via the window sort.

ORDER_SALT = "hs-order-v1"
DOCS_PER_SHARD = 100


def train_order_shuffle(spark, sf_dir):
    """(doc_id, shard, order_key, pos): reproducible global training order —
    shard = derived-capacity bucket of the salted hash, pos = 1-based rank
    inside the shard by (order_key, doc_id)."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    n_shards = max(n // DOCS_PER_SHARD, 1)
    key = _hash56(
        F.concat(F.lit(ORDER_SALT + ":"), F.col("doc_id").cast("string"))
    )
    keyed = docs.select(
        "doc_id", key.alias("order_key"), (key % n_shards).alias("shard")
    )
    w = W.partitionBy("shard").orderBy(
        F.col("order_key").asc(), F.col("doc_id").asc()
    )
    return keyed.select(
        "doc_id",
        "shard",
        "order_key",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def _sql_train_order_shuffle() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col=f"('{ORDER_SALT}:' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH cap AS (
  SELECT greatest(count(*) // {DOCS_PER_SHARD}, 1) AS s FROM documents
),
keyed AS (
  SELECT doc_id, {h} AS order_key, {h} % s AS shard
  FROM documents CROSS JOIN cap
)
SELECT doc_id, shard, order_key,
       CAST(row_number() OVER (
         PARTITION BY shard ORDER BY order_key ASC, doc_id ASC
       ) AS BIGINT) AS pos
FROM keyed
"""


QUERIES["train_order_shuffle"] = (train_order_shuffle, _sql_train_order_shuffle())


# --------------------------------------- inverse cloze task (ICT) pairs

# Self-supervised (query, context) pair mining for retrieval-model training
# (Lee et al. 2019, "Latent Retrieval for Weakly Supervised Open Domain
# Question Answering"): from every document, lift out one ICT_Q_LEN-token
# span as the pseudo-query and keep the remainder as its positive context.
# The span start is the salted doc_id hash — a pure per-row function, so the
# mined pairs are reproducible and partitioning-independent (the
# split_train_val / train_order_shuffle contract).
#
# Scale shape: ZERO exchanges — tokenize, span selection, context excision
# and the overlap statistic are all array expressions inside one
# whole-stage-codegen map over the scan (plan test-guarded). At 100 TB this
# is a pure pipelined pass like quality_classifier_score.

ICT_SALT = "hs-ict-v1"
ICT_Q_LEN = 4


def ict_pairs(spark, sf_dir):
    """(doc_id, q_start, query, n_ctx, ctx_md5, overlap): one ICT pair per
    doc — query = the lifted span (0-based q_start), context = the doc with
    the span removed, overlap = |distinct query terms still in context|."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    toks = tokens_column(F.col("text"))
    n = F.size(toks)
    qs = _hash56(
        F.concat(F.lit(ICT_SALT + ":"), F.col("doc_id").cast("string"))
    ) % F.greatest(n - (ICT_Q_LEN - 1), F.lit(1))
    base = docs.select("doc_id", toks.alias("t"), qs.cast("long").alias("q_start"))
    query_arr = F.slice("t", F.col("q_start") + 1, ICT_Q_LEN)
    ctx = F.concat(
        F.slice("t", 1, F.col("q_start").cast("int")),
        F.slice(
            "t",
            F.col("q_start") + ICT_Q_LEN + 1,
            F.greatest(F.size("t") - F.col("q_start") - ICT_Q_LEN, F.lit(0)).cast("int"),
        ),
    )
    return base.select(
        "doc_id",
        "q_start",
        F.array_join(query_arr, " ").alias("query"),
        F.size(ctx).cast("long").alias("n_ctx"),
        F.md5(F.array_join(ctx, " ")).alias("ctx_md5"),
        F.size(F.array_intersect(query_arr, ctx)).cast("long").alias("overlap"),
    )


def _sql_ict_pairs() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col=f"('{ICT_SALT}:' || CAST(doc_id AS VARCHAR))")
    t = SQL_TOKS.format(col="text")
    return f"""
WITH base AS (
  SELECT doc_id, {t} AS t,
         {h} % greatest(len({t}) - {ICT_Q_LEN - 1}, 1) AS q_start
  FROM documents
),
cut AS (
  SELECT doc_id, q_start,
         t[q_start + 1 : q_start + {ICT_Q_LEN}] AS query_arr,
         list_concat(t[1 : q_start], t[q_start + {ICT_Q_LEN} + 1 : len(t)]) AS ctx
  FROM base
)
SELECT doc_id, CAST(q_start AS BIGINT) AS q_start,
       array_to_string(query_arr, ' ') AS query,
       CAST(len(ctx) AS BIGINT) AS n_ctx,
       md5(array_to_string(ctx, ' ')) AS ctx_md5,
       CAST(len(list_intersect(query_arr, ctx)) AS BIGINT) AS overlap
FROM cut
"""


QUERIES["ict_pairs"] = (ict_pairs, _sql_ict_pairs())


# --- T5 span corruption (Raffel et al. 2020, §3.1.4) -----------------------
#
# The denoising objective a seq2seq training pipeline derives from raw text:
# contiguous token spans are replaced by sentinel tokens in the input; the
# target is the sequence of sentinels each followed by the tokens it masked.
# Fixed span length 3, block-partitioned so spans never overlap (the
# practical variant of mean_noise_span_length=3), selection rate 15%
# (SPAN_SEL_NUM / SPAN_SEL_DEN).
#
# Determinism: block j of doc d is selected iff
# hash56('t5span:d:j') % SPAN_SEL_DEN < SPAN_SEL_NUM — the same salted-hash
# convention as train_order_shuffle / split_train_val, so masking is
# partitioning-independent and reproducible across engines. Sentinel
# ordinals are the 0-based rank of the block among the doc's selected
# blocks. No final sentinel is appended (documented simplification).
#
# Scale shape: map-only — every column is one array expression over the
# tokenized text; there is NO exchange at all. At 100 TB this is the ideal
# operator: pure narrow transformation, whole-stage-codegen end to end.

SPAN_SALT = "t5span"
SPAN_LEN = 3
SPAN_SEL_NUM, SPAN_SEL_DEN = 3, 20  # 15% of blocks


def span_corruption_pairs(spark, sf_dir):
    """(doc_id, n_masked, input_text, target_text): T5-style span-corruption
    pairs. Blocks of SPAN_LEN tokens; selected blocks become <extra_id_k>
    in the input and '<extra_id_k> t t t' segments in the target."""
    hash_j = (
        f"CAST(conv(substring(md5(concat('{SPAN_SALT}:', CAST(doc_id AS STRING),"
        f" ':', CAST(j AS STRING))), 1, 14), 16, 10) AS BIGINT)"
    )
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", tokens_column(F.col("text")).alias("toks")
    ).withColumn("nb", F.expr(f"size(toks) DIV {SPAN_LEN}"))
    s = t.withColumn(
        "sel",
        F.expr(
            f"CASE WHEN nb > 0 THEN filter(sequence(0, nb - 1),"
            f" j -> {hash_j} % {SPAN_SEL_DEN} < {SPAN_SEL_NUM})"
            f" ELSE cast(array() AS array<int>) END"
        ),
    )
    return s.select(
        "doc_id",
        (F.size("sel") * SPAN_LEN).cast("long").alias("n_masked"),
        F.expr(
            f"concat_ws(' ', flatten(concat("
            f"  CASE WHEN nb > 0 THEN transform(sequence(0, nb - 1),"
            f"    j -> CASE WHEN array_contains(sel, j)"
            f"      THEN array(concat('<extra_id_',"
            f"                 CAST(array_position(sel, j) - 1 AS STRING), '>'))"
            f"      ELSE slice(toks, {SPAN_LEN} * j + 1, {SPAN_LEN}) END)"
            f"  ELSE cast(array() AS array<array<string>>) END,"
            f"  array(slice(toks, {SPAN_LEN} * nb + 1,"
            f"        size(toks) - {SPAN_LEN} * nb)))))"
        ).alias("input_text"),
        F.expr(
            f"concat_ws(' ', transform(sel,"
            f" (j, k) -> concat('<extra_id_', CAST(k AS STRING), '> ',"
            f"   toks[{SPAN_LEN} * j], ' ', toks[{SPAN_LEN} * j + 1], ' ',"
            f"   toks[{SPAN_LEN} * j + 2])))"
        ).alias("target_text"),
    )


def _sql_span_corruption() -> str:
    tk = SQL_TOKS.format(col="text")
    h = (
        f"CAST(('0x' || substr(md5('{SPAN_SALT}:' || CAST(doc_id AS VARCHAR)"
        f" || ':' || CAST(j AS VARCHAR)), 1, 14)) AS BIGINT)"
    )
    L = SPAN_LEN
    return f"""
WITH t AS (SELECT doc_id, {tk} AS toks FROM documents),
b AS (SELECT doc_id, toks, len(toks) // {L} AS nb FROM t),
s AS (
  SELECT doc_id, toks, nb,
         [j FOR j IN range(0, nb)
            IF {h} % {SPAN_SEL_DEN} < {SPAN_SEL_NUM}] AS sel
  FROM b
)
SELECT doc_id,
       CAST({L} * len(sel) AS BIGINT) AS n_masked,
       array_to_string(flatten(list_append(
         [CASE WHEN list_contains(sel, j)
            THEN ['<extra_id_' || CAST(list_position(sel, j) - 1 AS VARCHAR) || '>']
            ELSE toks[{L} * j + 1 : {L} * j + {L}] END
          FOR j IN range(0, nb)],
         toks[{L} * nb + 1 : len(toks)])), ' ') AS input_text,
       coalesce(array_to_string(
         ['<extra_id_' || CAST(k AS VARCHAR) || '> '
            || toks[{L} * sel[k + 1] + 1] || ' '
            || toks[{L} * sel[k + 1] + 2] || ' '
            || toks[{L} * sel[k + 1] + 3]
          FOR k IN range(0, len(sel))], ' '), '') AS target_text
FROM s
"""


QUERIES["span_corruption_pairs"] = (span_corruption_pairs, _sql_span_corruption())


# --- Temperature-scaled mixture weights (multilingual-LM sampling) ---------
#
# The p_i^alpha / Σ p_j^alpha re-weighting every multilingual / multi-domain
# LM pipeline applies before sampling (XLM-R, mT5: alpha≈0.3 upsamples the
# tail). Input shares p_i are exact integer token counts per source; the
# pow() outputs go through the micro-unit idiom (the pow/ln/sqrt rule —
# round-trip doubles are not cross-engine stable at .5 decimal boundaries,
# the 1e6 floor grid is).
#
# Scale shape: one map-side-combined groupBy(source) over the corpus, then
# all arithmetic on the |sources|-row frame (broadcast-scale by
# construction — domains/languages are a small dimension at any corpus
# size).

MIX_ALPHA = 0.3


def mixture_temperature_weights(spark, sf_dir):
    """(source, tok_n, share_micro, weight_micro): temperature-scaled
    sampling weights — weight ∝ (tok_n/total)^alpha, micro-normalized."""
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", tokens_column(F.col("text")).alias("toks"))
        .groupBy("source")
        .agg(F.sum(F.size("toks").cast("long")).alias("tok_n"))
    )
    tot = per_src.agg(F.sum("tok_n").alias("total"))
    powed = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tok_n",
        (F.col("tok_n") * 1.0 / F.col("total")).alias("share"),
        F.pow(F.col("tok_n") * 1.0 / F.col("total"), F.lit(MIX_ALPHA)).alias("pw"),
    )
    z = powed.agg(F.sum("pw").alias("z"))
    return powed.crossJoin(F.broadcast(z)).select(
        "source",
        "tok_n",
        F.floor(F.col("share") * 1.0e6 + 0.5).cast("long").alias("share_micro"),
        F.floor(F.col("pw") / F.col("z") * 1.0e6 + 0.5).cast("long").alias("weight_micro"),
    )


def _sql_mixture_temperature() -> str:
    tk = SQL_TOKS.format(col="text")
    return f"""
WITH per_src AS (
  SELECT source, CAST(sum(len({tk})) AS BIGINT) AS tok_n
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(tok_n) AS BIGINT) AS total FROM per_src),
powed AS (
  SELECT source, tok_n,
         tok_n * 1.0e0 / total AS share,
         pow(tok_n * 1.0e0 / total, {MIX_ALPHA}e0) AS pw
  FROM per_src CROSS JOIN tot
),
z AS (SELECT sum(pw) AS z FROM powed)
SELECT source, tok_n,
       CAST(floor(share * 1.0e6 + 0.5e0) AS BIGINT) AS share_micro,
       CAST(floor(pw / z * 1.0e6 + 0.5e0) AS BIGINT) AS weight_micro
FROM powed CROSS JOIN z
"""


QUERIES["mixture_temperature_weights"] = (
    mixture_temperature_weights,
    _sql_mixture_temperature(),
)


# Token-budget selection: fill a training-token budget with the
# highest-quality documents first — the "give me the best 25% of the
# corpus by tokens" greedy a real data mix pins down. The order is the
# deterministic total order (quality desc, doc_id asc) with quality =
# type/token ratio in integer micro-units; selection = the maximal PREFIX
# of that order whose inclusive token cumsum fits the budget (cumsum is
# strictly increasing, so the kept set is exactly {cum <= B}).
#
# Scale shape — NO global sort / full-corpus window anywhere:
# 1. per-doc (n_tokens, q_micro) agg (one shuffle, map-side combined);
# 2. 4096-bucket histogram on q_micro DIV 256 → (bucket, Σtokens) —
#    <= 4096 rows to the driver;
# 3. driver cumsum descending locates the BOUNDARY bucket: buckets above
#    it are kept outright (map-only filter), buckets below dropped, and
#    only the boundary bucket — ~n/4096 docs — is ordered exactly and
#    prefix-cut at the remaining budget.
# The oracle runs the TRUE full-corpus window cumsum; the value-hash gate
# proves the bucketed execution selects the identical set.

BUDGET_DEN = 4  # budget = total corpus tokens // 4
_TB_BWIDTH = 256  # q_micro in [0, 1e6] → <= 3907 buckets


def _doc_quality(spark, sf_dir):
    """(doc_id, n_tokens, q_micro): integer type/token-ratio quality."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_column(F.col("text"))).alias("term")
    )
    return toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.expr("(count(DISTINCT term) * 1000000) DIV count(*)").alias("q_micro"),
    )


def token_budget_select(spark, sf_dir):
    q = _doc_quality(spark, sf_dir)
    q = q.withColumn("bkt", F.expr(f"q_micro DIV {_TB_BWIDTH}"))
    hist = {
        r["bkt"]: r["tok"]
        for r in q.groupBy("bkt").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    total = sum(hist.values())
    budget = total // BUDGET_DEN
    cum = 0
    bbkt, remaining = None, 0
    for b in sorted(hist, reverse=True):
        if cum + hist[b] > budget:
            bbkt, remaining = b, budget - cum
            break
        cum += hist[b]
    if bbkt is None:  # budget covers everything
        return q.select("doc_id", "q_micro", "n_tokens")
    whole = q.filter(F.col("bkt") > bbkt)
    w = W.orderBy(F.col("q_micro").desc(), F.col("doc_id").asc())
    edge = (
        q.filter(F.col("bkt") == bbkt)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= remaining)
    )
    return whole.select("doc_id", "q_micro", "n_tokens").unionByName(
        edge.select("doc_id", "q_micro", "n_tokens")
    )


def _sql_token_budget_select() -> str:
    tk = SQL_TOKS.format(col="text")
    return f"""
WITH q AS (
  SELECT doc_id, CAST(len({tk}) AS BIGINT) AS n_tokens,
         (CAST(len(list_distinct({tk})) AS BIGINT) * 1000000)
           // CAST(len({tk}) AS BIGINT) AS q_micro
  FROM documents
),
b AS (SELECT CAST(sum(n_tokens) AS BIGINT) // {BUDGET_DEN} AS budget FROM q),
ordered AS (
  SELECT doc_id, q_micro, n_tokens,
         sum(n_tokens) OVER (ORDER BY q_micro DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM q
)
SELECT doc_id, q_micro, n_tokens
FROM ordered, b WHERE cum <= budget
"""


QUERIES["token_budget_select"] = (token_budget_select, _sql_token_budget_select())


# Weighted sampling without replacement (Efraimidis–Spirakis 2006, the
# "A-ES" one-pass reservoir): each item draws an exponential clock
# key = -ln(u)/w from its salted uniform hash u and its weight w; the K
# SMALLEST keys are a weighted sample without replacement — the standard
# way a training mix samples documents with probability proportional to
# size/quality in ONE distributed pass. Selection compiles to TakeOrdered
# (per-partition heaps + driver merge of K-row heads), never a global
# sort; the key is pinned to int64 nano-units from ONE shared expression
# string (ln is libm/JVM 1-ulp territory).

WSAMPLE_K = 100
WSAMPLE_SALT = "hs-wsample-v1"
# -ln(u)/w with u = (h+1)/2^56  ⇒  (56·ln2 − ln(h+1)) / w, nano-pinned
_WSAMPLE_KEY_EXPR = (
    "CAST(floor((56.0e0 * ln(2.0e0) - ln(h + 1.0e0))"
    " / CAST(n_chars AS DOUBLE) * 1.0e9 + 0.5e0) AS BIGINT)"
)


def weighted_sample_topk(spark, sf_dir):
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = _hash56(
        F.concat(F.lit(WSAMPLE_SALT + ":"), F.col("doc_id").cast("string"))
    )
    keyed = docs.withColumn("h", h).withColumn(
        "key_nano", F.expr(_WSAMPLE_KEY_EXPR)
    )
    return (
        keyed.orderBy(F.col("key_nano").asc(), F.col("doc_id").asc())
        .limit(WSAMPLE_K)
        .select("doc_id", "n_chars", "key_nano")
    )


def _sql_weighted_sample() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col=f"('{WSAMPLE_SALT}:' || CAST(doc_id AS VARCHAR))")
    return f"""
SELECT doc_id, n_chars, key_nano
FROM (
  SELECT doc_id, n_chars,
         {_WSAMPLE_KEY_EXPR.replace('h +', f'{h} +')} AS key_nano
  FROM documents
)
ORDER BY key_nano ASC, doc_id ASC
LIMIT {WSAMPLE_K}
"""


QUERIES["weighted_sample_topk"] = (weighted_sample_topk, _sql_weighted_sample())


# ------------------------------------------------------- MLM mask plan
# BERT-style masked-language-model corruption planning — the bidirectional
# sibling of span_corruption_pairs (T5): each token position draws a
# salted-hash lot; 15% are selected, and selected positions split 80/10/10
# into [MASK] / random-token / keep-original (Devlin et al. 2018). Both
# draws come from the one md5 idiom on (doc_id, pos, salt) so the plan is
# partitioning-independent and the oracle recomputes it exactly. The
# output is the per-doc corruption accounting a data loader would assert
# against (counts, not token arrays — the arrays are a map-only decode of
# the same hashes at feed time). ONE map-side agg after the existing
# tokenize explode; no joins, no windows.

MLM_SALT = "mlmv1"
MLM_SEL_PCT = 15  # of positions
_MLM_LOT = "{h} % 100"  # selection lot
_MLM_SUB = "({h} DIV 100) % 10"  # 0-7 [MASK], 8 random, 9 keep


def mlm_mask_plan(spark, sf_dir):
    """(doc_id, n_tokens, n_selected, n_mask, n_random, n_keep): the
    80/10/10 MLM corruption plan per document."""
    from harvester_spark.operators.common import doc_tokens

    toks = doc_tokens(spark, sf_dir).select(
        "doc_id",
        "pos",
        _hash56(
            F.concat_ws(":", F.lit(MLM_SALT), F.col("doc_id"), F.col("pos"))
        ).alias("h"),
    )
    lot = _MLM_LOT.format(h="h")
    sub = _MLM_SUB.format(h="h")
    sel = f"CASE WHEN {lot} < {MLM_SEL_PCT} THEN 1 ELSE 0 END"
    return toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.expr(sel)).cast("long").alias("n_selected"),
        F.sum(F.expr(f"CASE WHEN {lot} < {MLM_SEL_PCT} AND {sub} < 8 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_mask"),
        F.sum(F.expr(f"CASE WHEN {lot} < {MLM_SEL_PCT} AND {sub} = 8 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_random"),
        F.sum(F.expr(f"CASE WHEN {lot} < {MLM_SEL_PCT} AND {sub} = 9 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_keep"),
    )


def _sql_mlm_mask_plan() -> str:
    from harvester_spark.operators.common import SQL_DOC_TOKS

    h = _SQL_HASH56.format(
        col=f"'{MLM_SALT}' || ':' || CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)"
    )
    lot = _MLM_LOT.format(h="h")
    sub = _MLM_SUB.format(h="h").replace("DIV", "//")
    return f"""
WITH toks AS (
  SELECT doc_id, pos, {h} AS h FROM ({SQL_DOC_TOKS})
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN {lot} < {MLM_SEL_PCT} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       CAST(sum(CASE WHEN {lot} < {MLM_SEL_PCT} AND {sub} < 8 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mask,
       CAST(sum(CASE WHEN {lot} < {MLM_SEL_PCT} AND {sub} = 8 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_random,
       CAST(sum(CASE WHEN {lot} < {MLM_SEL_PCT} AND {sub} = 9 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_keep
FROM toks GROUP BY doc_id
"""


QUERIES["mlm_mask_plan"] = (mlm_mask_plan, _sql_mlm_mask_plan())


# --------------------------------------- in-batch negative conflicts

# Contrastive retrieval training (DPR/ICT — ict_pairs above) treats every
# OTHER document in the batch as a negative. When two same-host (or
# near-duplicate) documents land in one batch they become FALSE negatives
# — the model is pushed to separate documents that are actually related,
# a well-documented quality leak in dense-retriever training. This
# operator audits the train_order_shuffle batching for exactly that:
# batches are SHARD-LOCAL (how real per-worker loaders batch, and the
# scale-safe plan — the window partitions by shard exactly like
# train_order_shuffle; a single global row_number would serialize the
# corpus through one partition), sliced every BATCH_SIZE rows of the
# within-shard salted-hash order; conflict = a same-batch pair sharing
# documents.source.
#
# Everything exact integers: per (batch, source) count c contributes
# C(c, 2) = c·(c−1) DIV 2 conflict pairs. Output: per-batch rows
# (batch_key, n_docs, n_conflict_pairs), batch_key = shard·2^32 + local
# index (injective); zero-conflict batches included — an audit that
# silently drops clean batches would under-report the denominator.

BATCH_SIZE = 32


def train_inbatch_conflicts(spark, sf_dir):
    """(batch_key, n_docs, n_conflict_pairs): per shard-local training
    batch of the salted-hash order, how many same-source
    (false-negative) pairs it contains."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    n_shards = max(n // DOCS_PER_SHARD, 1)
    key = _hash56(
        F.concat(F.lit(ORDER_SALT + ":"), F.col("doc_id").cast("string"))
    )
    keyed = docs.select(
        "doc_id", "source", key.alias("order_key"),
        (key % n_shards).alias("shard"),
    )
    w = W.partitionBy("shard").orderBy(
        F.col("order_key").asc(), F.col("doc_id").asc()
    )
    batched = keyed.withColumn(
        "batch_key",
        (
            F.col("shard") * F.lit(2**32)
            + F.expr(f"(row_number() OVER (PARTITION BY shard ORDER BY "
                     f"order_key ASC, doc_id ASC) - 1) DIV {BATCH_SIZE}")
        ).cast("long"),
    )
    per_src = batched.groupBy("batch_key", "source").agg(
        F.count("*").cast("long").alias("c")
    )
    return per_src.groupBy("batch_key").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.expr("(c * (c - 1)) DIV 2")).cast("long").alias(
            "n_conflict_pairs"
        ),
    )


def _sql_inbatch_conflicts() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col=f"('{ORDER_SALT}:' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH nsh AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // {DOCS_PER_SHARD}, 1) AS ns
  FROM documents
),
keyed AS (
  SELECT doc_id, source, {h} AS order_key,
         {h} % (SELECT ns FROM nsh) AS shard
  FROM documents
),
batched AS (
  SELECT source,
         shard * 4294967296
         + (row_number() OVER (
              PARTITION BY shard ORDER BY order_key ASC, doc_id ASC) - 1)
           // {BATCH_SIZE} AS batch_key
  FROM keyed
),
per_src AS (
  SELECT batch_key, source, CAST(count(*) AS BIGINT) AS c
  FROM batched GROUP BY 1, 2
)
SELECT batch_key, CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS n_conflict_pairs
FROM per_src GROUP BY batch_key
"""


QUERIES["train_inbatch_conflicts"] = (
    train_inbatch_conflicts,
    _sql_inbatch_conflicts(),
)


# ------------------------------------------------- held-out OOV rate

# The vocabulary question every tokenizer/LM choice starts with: how
# much of UNSEEN text falls outside a vocabulary built on the training
# split? Splits by doc_id parity (deterministic, disjoint, ~50/50 — the
# split_train_val discipline); vocabulary = distinct train-split terms.
#
# NON-DEGENERACY (the corpus-synthesis doctrine): the shared corpus
# vocabulary is 31 types and saturates both halves — natural OOV is
# structurally ZERO and would prove nothing. Both engines therefore
# extend each doc's token stream with ONE planted pseudo-rare token
# 'v<md5(doc_id) % (n DIV 2)>' — a type space of n/2 drawn n times, so
# expected df ≈ 2 and a hash-dependent ~1/3 of drawn types land only in
# the held-out half: genuine, non-trivially-predictable OOV measured
# through the real join machinery (not a planted answer).
#
#   token OOV — occurrences outside the vocab / all occurrences,
#   type  OOV — distinct unseen terms / distinct held-out terms
# (token OOV is what perplexity feels; type OOV is the dictionary's
# marginal growth — Heaps' law, cf. heaps_law_fit/vocab_growth).
# Exact integer counts; rates in floored micro DIV.
#
# Scale shape: one distinct-terms agg on the train half (vocabulary-
# sized vocab dim), one agg over held-out tokens.


def vocab_oov_holdout(spark, sf_dir):
    """(n_heldout_tokens, n_oov_tokens, n_heldout_types, n_oov_types,
    token_oov_micro, type_oov_micro): OOV rates of the doc_id-odd
    held-out split against the doc_id-even training vocabulary, over
    real tokens ∪ one planted pseudo-rare token per doc."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    k = max(n // 2, 1)
    rare = docs.select(
        "doc_id",
        F.concat(
            F.lit("v"),
            (
                _hash56(F.col("doc_id").cast("string")) % k
            ).cast("string"),
        ).alias("term"),
    )
    toks = doc_tokens(spark, sf_dir).select("doc_id", "term").unionByName(
        rare
    )
    vocab = (
        toks.filter(F.col("doc_id") % 2 == 0).select("term").distinct()
        .withColumn("in_vocab", F.lit(1))
    )
    held = toks.filter(F.col("doc_id") % 2 == 1).join(
        vocab, "term", "left"
    )
    tok = held.agg(
        F.count("*").cast("long").alias("n_heldout_tokens"),
        F.sum((F.col("in_vocab").isNull()).cast("long"))
        .cast("long")
        .alias("n_oov_tokens"),
    )
    typ = (
        held.select("term", "in_vocab")
        .distinct()
        .agg(
            F.count("*").cast("long").alias("n_heldout_types"),
            F.sum((F.col("in_vocab").isNull()).cast("long"))
            .cast("long")
            .alias("n_oov_types"),
        )
    )
    return tok.crossJoin(typ).select(
        "n_heldout_tokens",
        "n_oov_tokens",
        "n_heldout_types",
        "n_oov_types",
        F.expr("(n_oov_tokens * 1000000) DIV n_heldout_tokens")
        .cast("long")
        .alias("token_oov_micro"),
        F.expr("(n_oov_types * 1000000) DIV n_heldout_types")
        .cast("long")
        .alias("type_oov_micro"),
    )


def _sql_vocab_oov() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col="CAST(doc_id AS VARCHAR)")
    return f"""
WITH nk AS (
  SELECT greatest(CAST(count(*) AS BIGINT) // 2, 1) AS k FROM documents
),
toks AS (
  SELECT doc_id, unnest({SQL_TOKS.format(col='text')}) AS term
  FROM documents
  UNION ALL
  SELECT doc_id,
         'v' || CAST({h} % (SELECT k FROM nk) AS VARCHAR) AS term
  FROM documents
),
vocab AS MATERIALIZED (
  SELECT DISTINCT term FROM toks WHERE doc_id % 2 = 0
),
held AS MATERIALIZED (
  SELECT t.term, v.term IS NOT NULL AS in_vocab
  FROM (SELECT * FROM toks WHERE doc_id % 2 = 1) t
  LEFT JOIN vocab v ON v.term = t.term
),
tok AS (
  SELECT CAST(count(*) AS BIGINT) AS n_heldout_tokens,
         CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT)
           AS n_oov_tokens
  FROM held
),
typ AS (
  SELECT CAST(count(*) AS BIGINT) AS n_heldout_types,
         CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT)
           AS n_oov_types
  FROM (SELECT DISTINCT term, in_vocab FROM held)
)
SELECT n_heldout_tokens, n_oov_tokens, n_heldout_types, n_oov_types,
       CAST((n_oov_tokens * 1000000) // n_heldout_tokens AS BIGINT)
         AS token_oov_micro,
       CAST((n_oov_types * 1000000) // n_heldout_types AS BIGINT)
         AS type_oov_micro
FROM tok CROSS JOIN typ
"""


QUERIES["vocab_oov_holdout"] = (vocab_oov_holdout, _sql_vocab_oov())


# ------------------------------------- negative-sampling table eval

# The word2vec/contrastive negative-sampling distribution (Mikolov et
# al. 2013): negatives draw ∝ cf^0.75 — the damping that keeps head
# tokens from swamping the negatives while still favoring frequent
# ones. This operator builds the exact integer sampling table (weights
# w = ⌊cf^0.75·1e3⌋ via ONE shared exp/ln string, cumulative ranges by
# a term-ordered window) and then actually DRAWS NS_DRAWS md5 uniforms
# through the inverse CDF — a range join of draws against the
# cumulative table, the distributed form of the alias-table lookup.
# Output per term: expected vs realized draw shares. Pinned: realized
# tracks expected within multinomial noise, and the 0.75 damping
# genuinely reorders mass vs raw cf (the head term's share drops
# relative to its raw-frequency share — the whole point of the
# exponent).
#
# Scale shape: one dictionary agg + a vocabulary-bounded window for
# the cumulative table (broadcast — the sampling table IS small by
# design) + one range join of the draw dimension against it.

NS_DRAWS = 20_000
# The +1.0e-6 guards the floor boundary: when cf is a perfect fourth power
# (16, 81, 256, ...) cf^0.75*1e3 is an exact integer and a 1-ulp exp/ln
# difference between JVM libm and DuckDB libm would otherwise flip the floor
# by 1 (the floor(x*1e6+0.5) idiom's failure mode, see operators/__init__).
_NS_W = (
    "CAST(floor(exp(0.75e0 * ln(CAST(cf AS DOUBLE))) * 1.0e3 + 1.0e-6)"
    " AS BIGINT)"
)


def train_negative_sampling_eval(spark, sf_dir):
    """(term, cf, w, expected_micro, n_drawn, realized_micro): the
    cf^0.75 negative-sampling table with realized draw shares from
    {NS_DRAWS} md5 uniforms."""
    from harvester_spark.operators.dedup import _hash56

    cf = (
        doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
        .withColumn("w", F.expr(_NS_W))
    )
    wt = W.orderBy("term")
    table = cf.select(
        "term",
        "cf",
        "w",
        (
            F.coalesce(
                F.sum("w").over(wt.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            )
        ).cast("long").alias("lo"),
        F.sum("w").over(wt.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("hi"),
    ).cache()
    tot = F.broadcast(table.agg(F.max("hi").cast("long").alias("tw")))
    draws = (
        spark.range(NS_DRAWS)
        .select(F.col("id").cast("long").alias("i"))
        .crossJoin(tot)
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("ns|"), F.col("i").cast("string"))),
                        1, 14,
                    ), 16, 10,
                ).cast("long") % F.col("tw")
            ).alias("u")
        )
    )
    hits = (
        draws.join(
            F.broadcast(table),
            (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")),
        )
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n_drawn"))
    )
    return (
        table.join(hits, "term", "left")
        .crossJoin(tot)
        .select(
            "term",
            "cf",
            "w",
            F.expr("CAST((1000000 * w) DIV tw AS BIGINT)").alias(
                "expected_micro"
            ),
            F.coalesce("n_drawn", F.lit(0)).cast("long").alias("n_drawn"),
            F.expr(
                f"CAST((1000000 * coalesce(n_drawn, 0)) DIV {NS_DRAWS}"
                " AS BIGINT)"
            ).alias("realized_micro"),
        )
    )


def _sql_negative_sampling() -> str:
    return f"""
WITH cf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf
  FROM ({SQL_DOC_TOKS}) GROUP BY 1
),
wtab AS (
  SELECT term, cf, {_NS_W} AS w FROM cf
),
table_ AS MATERIALIZED (
  SELECT term, cf, w,
         CAST(coalesce(sum(w) OVER (ORDER BY term
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS lo,
         CAST(sum(w) OVER (ORDER BY term
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS hi
  FROM wtab
),
tot AS (SELECT CAST(max(hi) AS BIGINT) AS tw FROM table_),
draws AS (
  SELECT CAST(('0x' || substr(md5('ns|' || CAST(i AS VARCHAR)), 1, 14))
              AS BIGINT) % (SELECT tw FROM tot) AS u
  FROM (SELECT unnest(range({NS_DRAWS})) AS i)
),
hits AS (
  SELECT t.term, CAST(count(*) AS BIGINT) AS n_drawn
  FROM draws d JOIN table_ t ON d.u >= t.lo AND d.u < t.hi
  GROUP BY 1
)
SELECT t.term, t.cf, t.w,
       CAST((1000000 * t.w) // (SELECT tw FROM tot) AS BIGINT)
         AS expected_micro,
       CAST(coalesce(h.n_drawn, 0) AS BIGINT) AS n_drawn,
       CAST((1000000 * coalesce(h.n_drawn, 0)) // {NS_DRAWS} AS BIGINT)
         AS realized_micro
FROM table_ t LEFT JOIN hits h USING (term)
"""


QUERIES["train_negative_sampling_eval"] = (
    train_negative_sampling_eval,
    _sql_negative_sampling(),
)


# -------------------------------------- sampling-design variance eval

# The survey-sampling classic (Cochran): on a population with a TREND
# in frame order, SYSTEMATIC sampling (every k-th element from a random
# start) implicitly stratifies and beats Bernoulli sampling's variance
# — the reason table-sample implementations expose both. Measured here
# with planted trend y = doc rank (exact), {SD_REPS} md5 replicates per
# design at 1/{SD_K} rate: each replicate estimates the population
# total (systematic: offset = replicate hash; Bernoulli: per-element
# membership hash), and the operator emits each design's
# across-replicate mean and variance of the estimate (integer moments,
# the n·s2 − s1² idiom). Pins: both designs are ~unbiased (means near
# the true total) and systematic's variance is a small fraction of
# Bernoulli's on the trended frame — the design effect, demonstrated.
#
# Scale shape: a replicate×element grid (map-only; {SD_REPS}× the
# frame — the price of MEASURING variance, not of sampling), two
# aggs.

SD_K = 10
SD_REPS = 16


def sampling_design_variance_eval(spark, sf_dir):
    """(design, n_reps, true_total, mean_est, var_num, rel_bias_milli,
    var_ratio_milli_vs_bern): across-replicate estimator moments for
    systematic vs Bernoulli sampling of the trended frame."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents").select("doc_id")
    ranked = docs.withColumn(
        "pos",
        (F.row_number().over(W.orderBy("doc_id")) - 1).cast("long"),
    ).withColumn("y", F.col("pos"))  # planted trend in frame order
    true_total = F.broadcast(
        ranked.agg(F.sum("y").cast("long").alias("tt"))
    )
    reps = spark.range(SD_REPS).select(F.col("id").cast("long").alias("r"))
    grid = ranked.crossJoin(F.broadcast(reps))
    sys_est = (
        grid.filter(
            F.expr(
                f"pos % {SD_K} = CAST(conv(substring(md5(concat('so|',"
                f" CAST(r AS STRING))), 1, 14), 16, 10) AS BIGINT) % {SD_K}"
            )
        )
        .groupBy("r")
        .agg((F.sum("y") * SD_K).cast("long").alias("est"))
        .withColumn("design", F.lit("systematic"))
    )
    bern_est = (
        grid.filter(
            F.expr(
                "CAST(conv(substring(md5(concat('bm|', CAST(r AS STRING),"
                " '|', CAST(pos AS STRING))), 1, 14), 16, 10) AS BIGINT)"
                f" % {SD_K} = 0"
            )
        )
        .groupBy("r")
        .agg((F.sum("y") * SD_K).cast("long").alias("est"))
        .withColumn("design", F.lit("bernoulli"))
    )
    # Scale guard: est ~ tt ~ n²/2, so s1² ~ (16·tt)² would leave int64
    # around n ≈ 2e4 docs (sf ~0.4). Rescale est (and the bias reference)
    # by S = max(1, tt DIV 1e7) BEFORE the n·s2 − s1² idiom: S = 1 at every
    # gated scale (outputs unchanged), and for any n the rescaled est stays
    # ≤ ~2e7 so 16·s2 and s1² both fit. mean_est/var_num are in units of S.
    ests = (
        sys_est.unionByName(bern_est)
        .crossJoin(true_total)
        .select(
            "design",
            "r",
            F.expr(
                "CAST(est DIV greatest(1, tt DIV 10000000) AS BIGINT)"
            ).alias("est"),
            F.expr(
                "CAST(tt DIV greatest(1, tt DIV 10000000) AS BIGINT)"
            ).alias("tts"),
            "tt",
        )
    )
    mom = ests.groupBy("design").agg(
        F.count("*").cast("long").alias("n_reps"),
        F.sum("est").cast("long").alias("s1"),
        F.sum(F.col("est") * F.col("est")).cast("long").alias("s2"),
        F.max("tt").alias("tt"),
        F.max("tts").alias("tts"),
    )
    base = mom.select(
        "design",
        "n_reps",
        F.col("tt").alias("true_total"),
        F.expr("CAST(s1 DIV n_reps AS BIGINT)").alias("mean_est"),
        F.expr("CAST(n_reps * s2 - s1 * s1 AS BIGINT)").alias("var_num"),
        F.expr(
            "CASE WHEN s1 DIV n_reps >= tts"
            " THEN CAST((1000 * (s1 DIV n_reps - tts)) DIV tts AS BIGINT)"
            " ELSE CAST(-((1000 * (tts - s1 DIV n_reps)) DIV tts) AS BIGINT)"
            " END"
        ).alias("rel_bias_milli"),
    )
    bern_var = F.broadcast(
        base.filter(F.col("design") == "bernoulli").select(
            F.col("var_num").alias("bv")
        )
    )
    return base.crossJoin(bern_var).select(
        "design",
        "n_reps",
        "true_total",
        "mean_est",
        "var_num",
        "rel_bias_milli",
        F.expr(
            "CAST((1000 * var_num) DIV greatest(bv, 1) AS BIGINT)"
        ).alias("var_ratio_milli_vs_bern"),
    )


def _sql_sampling_design() -> str:
    hso = "CAST(('0x' || substr(md5('so|' || CAST(r AS VARCHAR)), 1, 14)) AS BIGINT)"
    hbm = "CAST(('0x' || substr(md5('bm|' || CAST(r AS VARCHAR) || '|' || CAST(pos AS VARCHAR)), 1, 14)) AS BIGINT)"
    return f"""
WITH ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS pos
  FROM documents
),
tt AS (SELECT CAST(sum(pos) AS BIGINT) AS tt FROM ranked),
reps AS (SELECT CAST(unnest(range({SD_REPS})) AS BIGINT) AS r),
ests0 AS (
  SELECT 'systematic' AS design, r,
         CAST(sum(pos) * {SD_K} AS BIGINT) AS est
  FROM ranked CROSS JOIN reps
  WHERE pos % {SD_K} = {hso} % {SD_K}
  GROUP BY r
  UNION ALL
  SELECT 'bernoulli', r, CAST(sum(pos) * {SD_K} AS BIGINT)
  FROM ranked CROSS JOIN reps
  WHERE {hbm} % {SD_K} = 0
  GROUP BY r
),
-- scale guard (twin of the Spark side): S = max(1, tt // 1e7); S = 1 at
-- every gated scale, keeps 16*s2 and s1*s1 inside int64 at any n
scl AS (SELECT greatest(1, (SELECT tt FROM tt) // 10000000) AS s),
ests AS (
  SELECT design, r, CAST(est // (SELECT s FROM scl) AS BIGINT) AS est
  FROM ests0
),
tts AS (
  SELECT CAST((SELECT tt FROM tt) // (SELECT s FROM scl) AS BIGINT) AS tts
),
mom AS (
  SELECT design, CAST(count(*) AS BIGINT) AS n_reps,
         CAST(sum(est) AS BIGINT) AS s1,
         CAST(sum(est * est) AS BIGINT) AS s2
  FROM ests GROUP BY 1
),
base AS (
  SELECT design, n_reps, (SELECT tt FROM tt) AS true_total,
         CAST(s1 // n_reps AS BIGINT) AS mean_est,
         CAST(n_reps * s2 - s1 * s1 AS BIGINT) AS var_num,
         CAST(CASE WHEN s1 // n_reps >= (SELECT tts FROM tts)
              THEN (1000 * (s1 // n_reps - (SELECT tts FROM tts)))
                   // (SELECT tts FROM tts)
              ELSE -((1000 * ((SELECT tts FROM tts) - s1 // n_reps))
                   // (SELECT tts FROM tts)) END AS BIGINT)
           AS rel_bias_milli
  FROM mom
)
SELECT design, n_reps, true_total, mean_est, var_num, rel_bias_milli,
       CAST((1000 * var_num) // greatest(
         (SELECT var_num FROM base WHERE design = 'bernoulli'), 1)
         AS BIGINT) AS var_ratio_milli_vs_bern
FROM base
"""


QUERIES["sampling_design_variance_eval"] = (
    sampling_design_variance_eval,
    _sql_sampling_design(),
)


# ------------------------------- pps systematic sampling + Horvitz-Thompson

# Madow (1949) systematic probability-proportional-to-size sampling +
# the Horvitz-Thompson estimator — the size-biased companion to
# sampling_design_variance_eval's equal-probability designs: draw
# PPS_M thresholds u + k*step (step = S DIV m, u an md5 draw mod step)
# along the cumulative n_chars scale; a document is selected with
# multiplicity = #thresholds inside its interval, i.e. pi_i ~ m*s_i/S.
# The HT total estimate SUM y_i/pi_i then weights small-probability
# docs up.
#
# Two EXACT integer facts the test pins:
#   1. #selections == m ALWAYS: f(C) = least(m, (C - u + step - 1) DIV
#      step) counts thresholds below C (numerator provably >= 0 — no
#      negative-DIV seam), and f(S) - f(0) telescopes to m.
#   2. SELF-WEIGHTING identity: estimating the sizing variable itself
#      (y = s) gives ht = (SUM mult * ((s*S) DIV s)) DIV m =
#      (m*S) DIV m = S EXACTLY — the floor never bites. est_chars ==
#      s_total is an exact equality, not an approximation.
# For y = token count (strongly size-correlated) the HT error is
# pinned below the equal-probability SRS estimate's error on the same
# m (the design-effect contrast, measured ~0 vs ~2-5%).
#
# Scale shape: the cumulative scale comes from the pack_sequences
# two-level prefix sum (shard sums -> broadcast offsets -> per-shard
# windows; no global single-partition window); selection multiplicity
# is a per-row closed form (no threshold join); SRS is a TakeOrdered
# top-m. Overflow: y*S needs y <= 9e18/S — fine through sf100.

PPS_M = 64  # thresholds (sample size)
PPS_SHARD = 64  # prefix-sum shard width (doc_id DIV)


def sampling_pps_ht_eval(spark, sf_dir):
    """(n_docs, s_total, m, step, u, n_sel, est_chars, tokens_true,
    ht_tokens, srs_tokens, ht_err_milli, srs_err_milli): systematic
    pps/HT estimate vs SRS on the same sample size."""
    from harvester_spark.operators.graph import _hash56

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("s"),
        _n_tokens().alias("y"),
    )
    docs = docs.withColumn("shard", F.expr(f"doc_id DIV {PPS_SHARD}"))
    ssum = docs.groupBy("shard").agg(F.sum("s").alias("st"))
    w_sh = W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    soff = ssum.select(
        "shard", F.coalesce(F.sum("st").over(w_sh), F.lit(0)).alias("off")
    )
    w_in = W.partitionBy("shard").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = (
        docs.join(F.broadcast(soff), "shard")
        .withColumn(
            "c_hi", (F.col("off") + F.sum("s").over(w_in)).cast("long")
        )
        .withColumn("c_lo", (F.col("c_hi") - F.col("s")).cast("long"))
    )
    tot = F.broadcast(
        docs.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("s").cast("long").alias("s_total"),
            F.sum("y").cast("long").alias("tokens_true"),
        ).select(
            "n_docs",
            "s_total",
            "tokens_true",
            F.expr(f"CAST(s_total DIV {PPS_M} AS BIGINT)").alias("step"),
        ).select(
            "n_docs",
            "s_total",
            "tokens_true",
            "step",
            (
                _hash56(F.concat(F.lit("pps|"), F.col("s_total").cast("string")))
                % F.col("step")
            ).cast("long").alias("u"),
        )
    )
    fexpr = (
        f"least(CAST({PPS_M} AS BIGINT), ({{c}} - u + step - 1) DIV step)"
    )
    sel = (
        cum.crossJoin(tot)
        .withColumn(
            "mult",
            F.expr(
                f"CAST({fexpr.format(c='c_hi')}"
                f" - {fexpr.format(c='c_lo')} AS BIGINT)"
            ),
        )
        .filter(F.col("mult") > 0)
    )
    agg = sel.agg(
        F.sum("mult").cast("long").alias("n_sel"),
        F.sum(F.expr("mult * ((s * s_total) DIV s)")).cast("long").alias("hc"),
        F.sum(F.expr("mult * ((y * s_total) DIV s)")).cast("long").alias("ht"),
    )
    srs = (
        docs.orderBy(
            _hash56(F.concat(F.lit("srs|"), F.col("doc_id").cast("string"))).asc(),
            F.col("doc_id").asc(),
        )
        .limit(PPS_M)
        .agg(F.sum("y").cast("long").alias("ys"))
    )
    return (
        tot.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(srs))
        .select(
            "n_docs",
            "s_total",
            F.lit(PPS_M).cast("long").alias("m"),
            "step",
            "u",
            "n_sel",
            F.expr(f"CAST(hc DIV {PPS_M} AS BIGINT)").alias("est_chars"),
            "tokens_true",
            F.expr(f"CAST(ht DIV {PPS_M} AS BIGINT)").alias("ht_tokens"),
            F.expr(f"CAST((n_docs * ys) DIV {PPS_M} AS BIGINT)").alias(
                "srs_tokens"
            ),
            F.expr(
                f"CAST((1000 * abs(ht DIV {PPS_M} - tokens_true))"
                " DIV tokens_true AS BIGINT)"
            ).alias("ht_err_milli"),
            F.expr(
                f"CAST((1000 * abs((n_docs * ys) DIV {PPS_M} - tokens_true))"
                " DIV tokens_true AS BIGINT)"
            ).alias("srs_err_milli"),
        )
    )


def _sql_pps_ht() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    hu = _SQL_HASH56.format(col="'pps|' || CAST(s_total AS VARCHAR)")
    hs = _SQL_HASH56.format(col="'srs|' || CAST(doc_id AS VARCHAR)")
    f_hi = f"least(CAST({PPS_M} AS BIGINT), (c_hi - u + step - 1) // step)"
    f_lo = f"least(CAST({PPS_M} AS BIGINT), (c_lo - u + step - 1) // step)"
    return f"""
WITH ppd AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS s, {_SQL_N_TOKENS} AS y
  FROM documents
),
ppc AS (
  SELECT doc_id, s, y,
         CAST(sum(s) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS c_hi
  FROM ppd
),
ppt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(s) AS BIGINT) AS s_total,
         CAST(sum(y) AS BIGINT) AS tokens_true,
         CAST(sum(s) // {PPS_M} AS BIGINT) AS step
  FROM ppd
),
ppu AS (SELECT *, {hu} % step AS u FROM ppt),
ppsel AS (
  SELECT c.doc_id, c.s, c.y,
         CAST({f_hi} - {f_lo} AS BIGINT) AS mult,
         t.s_total
  FROM (SELECT doc_id, s, y, c_hi, CAST(c_hi - s AS BIGINT) AS c_lo
        FROM ppc) c
  CROSS JOIN ppu t
),
ppagg AS (
  SELECT CAST(sum(mult) AS BIGINT) AS n_sel,
         CAST(sum(mult * ((s * s_total) // s)) AS BIGINT) AS hc,
         CAST(sum(mult * ((y * s_total) // s)) AS BIGINT) AS ht
  FROM ppsel WHERE mult > 0
),
ppsrs AS (
  SELECT CAST(sum(y) AS BIGINT) AS ys FROM (
    SELECT y FROM ppd ORDER BY {hs} ASC, doc_id ASC LIMIT {PPS_M}
  )
)
SELECT t.n_docs, t.s_total, CAST({PPS_M} AS BIGINT) AS m, t.step, t.u,
       a.n_sel,
       CAST(a.hc // {PPS_M} AS BIGINT) AS est_chars,
       t.tokens_true,
       CAST(a.ht // {PPS_M} AS BIGINT) AS ht_tokens,
       CAST((t.n_docs * s.ys) // {PPS_M} AS BIGINT) AS srs_tokens,
       CAST((1000 * abs(a.ht // {PPS_M} - t.tokens_true))
            // t.tokens_true AS BIGINT) AS ht_err_milli,
       CAST((1000 * abs((t.n_docs * s.ys) // {PPS_M} - t.tokens_true))
            // t.tokens_true AS BIGINT) AS srs_err_milli
FROM ppu t CROSS JOIN ppagg a CROSS JOIN ppsrs s
"""


QUERIES["sampling_pps_ht_eval"] = (sampling_pps_ht_eval, _sql_pps_ht())


# ------------------------------- cluster-sampling design effect (ICC)

# The third panel of the Cochran design triptych: sampling_design_
# variance_eval measures systematic-vs-Bernoulli via replicates,
# sampling_pps_ht_eval measures size-biased HT — this one computes the
# CLUSTER-sampling penalty in closed form from the population: the
# ANOVA intraclass correlation rho and Kish's design effect
# deff = 1 + (M - 1) * rho for single-stage equal-size cluster samples
# (clusters = the corpus' sources, whose per-source doc counts ARE
# equal at every gated scale — asserted via the m_min/m_max columns).
#
# Exact integers all the way: with per-cluster sums S_i and squares Q,
#   B2 = k * SUM S_i^2 - T^2        (N * (k-1) * MSB = B2 * ... )
#   A2 = N * Q - T^2
#   rho = [B2(N-k) - (A2-B2)(k-1)] / [B2(N-k) + (M-1)(A2-B2)(k-1)]
# (derivation: SSB = B2/N, SSW = (A2-B2)/N since kM = N; multiply the
# MSB/MSW ratio through by N(k-1)(N-k)). The milli step pre-divides the
# denominator (num DIV (den DIV 1000)) because 1000*num overflows int64
# at sf0.1 — the sf0.1-sweep class of bug, caught at authoring time.
#
# Planted-controls (events_mannwhitney_eval discipline): 'null' uses
# raw n_chars (sources get no effect — a genuine near-zero-ICC
# negative control); 'planted' adds CD_SHIFT * (md5(source) % 5) so
# between-cluster variance is real and deff blows up.

CD_SHIFT = 200
CD_LEVELS = 5


def sampling_cluster_deff_eval(spark, sf_dir):
    """(series, k, m_min, m_max, n, icc_milli, deff_milli): closed-form
    ANOVA intraclass correlation and Kish design effect for cluster
    sampling by source, null vs planted cluster effect."""
    from harvester_spark.operators.dedup import _hash56

    docs = load(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("y0")
    )
    shift = (
        _hash56(F.concat(F.lit("ce|"), F.col("source"))) % CD_LEVELS
    ).cast("long") * CD_SHIFT
    ser = docs.select(
        F.lit("null").alias("series"), "source", F.col("y0").alias("y")
    ).unionByName(
        docs.select(
            F.lit("planted").alias("series"),
            "source",
            (F.col("y0") + shift).cast("long").alias("y"),
        )
    )
    per = ser.groupBy("series", "source").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.expr("y * y")).cast("long").alias("q"),
    )
    agg = per.groupBy("series").agg(
        F.count("*").cast("long").alias("k"),
        F.min("m").cast("long").alias("m_min"),
        F.max("m").cast("long").alias("m_max"),
        F.sum("m").cast("long").alias("n"),
        F.sum("s").cast("long").alias("t"),
        F.sum(F.expr("s * s")).cast("long").alias("ss2"),
        F.sum("q").cast("long").alias("q"),
    )
    num = "(k * ss2 - t * t) * (n - k) - (n * q - k * ss2) * (k - 1)"
    den = (
        "(k * ss2 - t * t) * (n - k)"
        " + (m_max - 1) * (n * q - k * ss2) * (k - 1)"
    )
    # 1000*num overflows int64 at sf0.1 (num ~ 1.2e16, measured) — pre-
    # divide the (huge) denominator instead; relative error <= 1000/den.
    icc = (
        f"CASE WHEN ({num}) >= 0 THEN ({num}) DIV (({den}) DIV 1000)"
        f" ELSE -((-({num})) DIV (({den}) DIV 1000)) END"
    )
    return agg.select(
        "series",
        "k",
        "m_min",
        "m_max",
        "n",
        F.expr(f"CAST({icc} AS BIGINT)").alias("icc_milli"),
        F.expr(f"CAST(1000 + (m_max - 1) * ({icc}) AS BIGINT)").alias(
            "deff_milli"
        ),
    )


def _sql_cluster_deff() -> str:
    from harvester_spark.operators.dedup import _SQL_HASH56

    h = _SQL_HASH56.format(col="'ce|' || source")
    num = "(k * ss2 - t * t) * (n - k) - (n * q - k * ss2) * (k - 1)"
    den = (
        "(k * ss2 - t * t) * (n - k)"
        " + (m_max - 1) * (n * q - k * ss2) * (k - 1)"
    )
    icc = (
        f"CASE WHEN ({num}) >= 0 THEN ({num}) // (({den}) // 1000)"
        f" ELSE -((-({num})) // (({den}) // 1000)) END"
    )
    return f"""
WITH cds AS (
  SELECT 'null' AS series, source, CAST(n_chars AS BIGINT) AS y
  FROM documents
  UNION ALL
  SELECT 'planted', source,
         CAST(n_chars + ({h} % {CD_LEVELS}) * {CD_SHIFT} AS BIGINT)
  FROM documents
),
cdp AS (
  SELECT series, source, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
  FROM cds GROUP BY 1, 2
),
cda AS (
  SELECT series, CAST(count(*) AS BIGINT) AS k,
         CAST(min(m) AS BIGINT) AS m_min,
         CAST(max(m) AS BIGINT) AS m_max,
         CAST(sum(m) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS t,
         CAST(sum(s * s) AS BIGINT) AS ss2,
         CAST(sum(q) AS BIGINT) AS q
  FROM cdp GROUP BY 1
)
SELECT series, k, m_min, m_max, n,
       CAST({icc} AS BIGINT) AS icc_milli,
       CAST(1000 + (m_max - 1) * ({icc}) AS BIGINT) AS deff_milli
FROM cda
"""


QUERIES["sampling_cluster_deff_eval"] = (
    sampling_cluster_deff_eval,
    _sql_cluster_deff(),
)


# ------------------------------------------- Neyman vs proportional

# Optimal stratified allocation (Neyman 1934; Cochran §5.5): with a
# fixed sample budget n over K strata, proportional allocation sends
# n_h ~ N_h while Neyman sends n_h ~ N_h*S_h — oversampling the
# high-variance strata — and the stratified-total variance
#   V = sum_h N_h*(N_h - n_h)*S_h^2 / n_h
# is minimized by Neyman (Cauchy-Schwarz). The frame plants strong
# heteroscedasticity (stratum scale factors {NY_SCALES}: the spread
# spans 20x, so the two allocations differ materially — equal-variance
# strata make Neyman == proportional and the eval vacuous); both
# designs run through the SAME largest-remainder integer seating
# (crawl_budget_allocate's apportionment: one guaranteed seat per
# stratum, then floor quotas, then remainder-ranked extras, so
# sum(n_h) == {NY_BUDGET} EXACTLY for both designs).
#
# Integer contract: stratum population variance arrives as
# s2 = (N_h*sum(y^2) - sum(y)^2) DIV (N_h*(N_h-1)) (floored — the
# division is the sampling_cluster_deff pre-divide discipline, keeping
# every later product inside int64: var terms are ~N_h^2*S^2 <= ~5e13
# at sf0.1, headroom 1e5); the Neyman weight needs S_h itself, taken
# as ONE shared milli-sqrt string (the ft_qpp_nqc_wig idiom) used
# verbatim by both engines. Variance terms are floored per stratum
# then summed — deterministic in both engines.
#
# Scale shape: one scan -> K-row stratum moment agg; allocation and
# variance are windows over the K-row frame (broadcast-scale).

NY_STRATA = 4
NY_SCALES = (1, 2, 5, 20)  # planted per-stratum spread multipliers
NY_BUDGET = 100  # total sample budget n
_NY_SQRT_MILLI = (
    "CAST(floor(sqrt(CAST({s2} AS DOUBLE)) * 1000 + 0.5e0) AS BIGINT)"
)


def sampling_neyman_allocation(spark, sf_dir):
    """(design, stratum, big_n, s2_int, s_milli, n_alloc,
    var_term_micro): largest-remainder Neyman vs proportional
    allocation of NY_BUDGET draws over the planted heteroscedastic
    strata, with exact per-stratum variance terms."""
    from harvester_spark.operators.dedup import _hash56

    scale = (
        "CASE "
        + " ".join(
            f"WHEN s = {i} THEN {m}" for i, m in enumerate(NY_SCALES)
        )
        + " END"
    )
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("x")
    )
    ys = docs.select(
        (_hash56(F.concat(F.lit("ns|"), F.col("x"))) % NY_STRATA)
        .cast("long")
        .alias("s"),
        (_hash56(F.concat(F.lit("ny|"), F.col("x"))) % 1000)
        .cast("long")
        .alias("b"),
    ).select("s", F.expr(f"CAST(b * ({scale}) AS BIGINT)").alias("y"))
    mom = ys.groupBy("s").agg(
        F.count("*").cast("long").alias("big_n"),
        F.sum("y").cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ssq"),
    )
    strat = mom.select(
        F.col("s").alias("stratum"),
        "big_n",
        F.expr(
            "CAST((big_n * ssq - s1 * s1) DIV (big_n * (big_n - 1)) AS BIGINT)"
        ).alias("s2_int"),
    ).withColumn(
        "s_milli", F.expr(_NY_SQRT_MILLI.format(s2="s2_int"))
    )
    designs = strat.select(
        F.lit("proportional").alias("design"),
        "stratum",
        "big_n",
        "s2_int",
        "s_milli",
        F.col("big_n").alias("w"),
    ).unionByName(
        strat.select(
            F.lit("neyman").alias("design"),
            "stratum",
            "big_n",
            "s2_int",
            "s_milli",
            (F.col("big_n") * F.col("s_milli")).cast("long").alias("w"),
        )
    )
    wd = W.partitionBy("design")
    m = NY_BUDGET - NY_STRATA
    seated = (
        designs.withColumn("wsum", F.sum("w").over(wd))
        .withColumn("q", F.expr(f"CAST({m} * w DIV wsum AS BIGINT)"))
        .withColumn("rem", F.expr(f"CAST({m} * w % wsum AS BIGINT)"))
        .withColumn("qsum", F.sum("q").over(wd))
        .withColumn(
            "rrank",
            F.row_number().over(
                wd.orderBy(F.col("rem").desc(), F.col("stratum").asc())
            ),
        )
        .withColumn(
            "n_alloc",
            F.expr(
                f"CAST(1 + q + CASE WHEN rrank <= {m} - qsum"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ),
        )
    )
    return seated.select(
        "design",
        "stratum",
        "big_n",
        "s2_int",
        "s_milli",
        "n_alloc",
        F.expr(
            "CAST(big_n * (big_n - n_alloc) * s2_int DIV n_alloc AS BIGINT)"
        ).alias("var_term_micro"),
    ).orderBy("design", "stratum")


def _sql_neyman() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    hs = _SQL_HASH56.format(col="'ns|' || x")
    hy = _SQL_HASH56.format(col="'ny|' || x")
    scale = (
        "CASE "
        + " ".join(f"WHEN s = {i} THEN {m}" for i, m in enumerate(NY_SCALES))
        + " END"
    )
    sqrt_m = _NY_SQRT_MILLI.format(s2="s2_int")
    m = NY_BUDGET - NY_STRATA
    return f"""
WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS x FROM documents),
ys AS (
  SELECT s, CAST(b * ({scale}) AS BIGINT) AS y FROM (
    SELECT {hs} % {NY_STRATA} AS s, {hy} % 1000 AS b FROM ids
  )
),
mom AS (
  SELECT s AS stratum,
         CAST(count(*) AS BIGINT) AS big_n,
         CAST(sum(y) AS BIGINT) AS s1,
         CAST(sum(y * y) AS BIGINT) AS ssq
  FROM ys GROUP BY 1
),
strat AS (
  SELECT stratum, big_n,
         CAST((big_n * ssq - s1 * s1) // (big_n * (big_n - 1)) AS BIGINT)
           AS s2_int
  FROM mom
),
strat2 AS (
  SELECT stratum, big_n, s2_int, {sqrt_m} AS s_milli FROM strat
),
designs AS (
  SELECT 'proportional' AS design, stratum, big_n, s2_int, s_milli,
         big_n AS w
  FROM strat2
  UNION ALL
  SELECT 'neyman', stratum, big_n, s2_int, s_milli,
         CAST(big_n * s_milli AS BIGINT)
  FROM strat2
),
seated AS (
  SELECT design, stratum, big_n, s2_int, s_milli,
         CAST({m} * w // wsum AS BIGINT) AS q,
         CAST({m} * w % wsum AS BIGINT) AS rem,
         CAST(sum({m} * w // wsum) OVER (PARTITION BY design) AS BIGINT)
           AS qsum,
         row_number() OVER (PARTITION BY design
                            ORDER BY {m} * w % wsum DESC, stratum ASC)
           AS rrank
  FROM (SELECT design, stratum, big_n, s2_int, s_milli, w,
               sum(w) OVER (PARTITION BY design) AS wsum
        FROM designs)
)
SELECT design, stratum, big_n, s2_int, s_milli,
       CAST(1 + q + CASE WHEN rrank <= {m} - qsum THEN 1 ELSE 0 END
            AS BIGINT) AS n_alloc,
       CAST(big_n * (big_n - (1 + q + CASE WHEN rrank <= {m} - qsum
                                           THEN 1 ELSE 0 END))
            * s2_int
            // (1 + q + CASE WHEN rrank <= {m} - qsum THEN 1 ELSE 0 END)
            AS BIGINT) AS var_term_micro
FROM seated
ORDER BY design, stratum
"""


QUERIES["sampling_neyman_allocation"] = (
    sampling_neyman_allocation,
    _sql_neyman(),
)
