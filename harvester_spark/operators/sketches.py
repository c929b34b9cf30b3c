"""Sketch operators — the bounded-state primitives a 100 TB corpus forces.

Three classics, each with the property that the *distributed state* is
O(sketch), never O(corpus) or O(vocabulary):

- **HyperLogLog** distinct counting (Flajolet et al. 2007): register file is
  ``m = 256`` rows per language no matter how many shingles stream through —
  the shuffle after the map-side combine is O(langs x m).
- **Count-min sketch** heavy hitters (Cormode & Muthukrishnan 2005): the
  d x w counter grid (8 KB) replaces the full n-gram histogram; the exact
  verification groupBy only ever sees stream rows whose sketch estimate
  already crossed the threshold, so the term-keyed shuffle is bounded by the
  *heavy* occurrences, not the vocabulary.
- **Bloom filter** membership (Bloom 1970): the base corpus's n-gram set is
  represented as a 64 Kbit bitset (8 KB broadcast to every probe task),
  replacing the shingle-keyed shuffle join a naive "seen before?" needs.

Reference parity: the reference keeps corpus-level term statistics in
OpenSearch (shard-local Lucene term dictionaries) and never ships vocabulary
across nodes for stats queries (/root/reference/harvester/search/clients.py
facet/stats paths); these sketches are the Spark-native equivalent of that
"statistics without a vocabulary shuffle" contract.

Determinism: every hash is the top-56-bit md5 idiom (dedup.py:33) so both
engines compute bit-identical buckets; estimates divide a Python-inlined
float literal by an *exact* int64 (see ``hll_distinct_shingles``) and are
``round(.,6)``-ed per the module convention (operators/__init__.py).

All three consume word-3-gram shingles of ``documents.text`` — thousands of
distinct values per language at every SF (the raw term vocabulary of the
synthetic table is ~31 terms, degenerate for cardinality sketches; shingles
are the realistic n-gram domain these sketches exist for at web scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from harvester_spark.operators.common import SQL_DOC_TOKS, SQL_TOKS, doc_tokens, load
from harvester_spark.analysis import tokens_column

# ------------------------------------------------------------------ hashing

_SQL_HASH56 = "CAST(('0x' || substr(md5({col}), 1, 14)) AS BIGINT)"


def _hash56(col: F.Column) -> F.Column:
    """Top-56-bits of md5 as a nonnegative int64 (same idiom as dedup.py)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


# ------------------------------------------------------- 3-gram shingle feed

# Array-transform shingling: zero windows, zero shuffles — each doc's token
# array expands to its word-3-grams inside the scan's codegen stage.
_SPARK_SHINGLES3 = (
    "transform(sequence(0, size(t) - 3),"
    " i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"
)
_SQL_SHINGLES3 = "list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"


def _shingle_stream(spark: SparkSession, sf_dir: str, *cols: str) -> DataFrame:
    """(*cols, shingle): one row per 3-gram OCCURRENCE (docs < 3 tokens drop)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(*cols, tokens_column(F.col("text")).alias("t"))
        .filter(F.size("t") >= 3)
        .select(*cols, F.explode(F.expr(_SPARK_SHINGLES3)).alias("shingle"))
    )


def _sql_shingle_stream(*cols: str, distinct: bool = False, source: str = "documents") -> str:
    lst = _SQL_SHINGLES3 if not distinct else f"list_distinct({_SQL_SHINGLES3})"
    sel = ", ".join(cols)
    sel = sel + ", " if sel else ""
    return f"""
      SELECT {sel}unnest({lst}) AS shingle
      FROM (SELECT {sel}{SQL_TOKS.format(col='text')} AS t FROM {source})
      WHERE len(t) >= 3
    """


# ------------------------------------------------------------- HyperLogLog

HLL_M = 256  # 2^8 registers per language
_HLL_WBITS = 48  # 56-bit hash minus 8 bucket bits
_HLL_RMAX = _HLL_WBITS + 1  # rho of w == 0
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# Scaled-integer trick: a register holding rho contributes 2^-rho to the
# harmonic sum; scaling by 2^49 makes every contribution an exact int64
# (max 256 * 2^49 = 2^57), so BOTH engines sum the same integer and the
# estimate is ONE division of this literal by that integer.
_HLL_C = repr(_HLL_ALPHA * HLL_M * HLL_M * float(2**_HLL_RMAX))


def _rho_case(col: str) -> str:
    """rho(w) = leading zeros of the 48-bit value + 1 — a generated integer
    CASE chain (identical text in both engines; no libm, no bit builtins)."""
    whens = " ".join(
        f"WHEN {col} >= {1 << j} THEN {_HLL_WBITS - j}"
        for j in range(_HLL_WBITS - 1, -1, -1)
    )
    return f"CASE {whens} ELSE {_HLL_RMAX} END"


def hll_registers(df: DataFrame, value: F.Column, *keys: str) -> DataFrame:
    """(*keys, bucket, r) register rows for distinct-count(value) per key —
    one map-side-combined groupBy down to <= |keys|*256 rows. Also used as
    the streaming state shape (streaming/windowed.windowed_user_hll)."""
    wb = df.select(*keys, _hash56(value).alias("hv")).select(
        *keys,
        (F.col("hv") % HLL_M).alias("bucket"),
        F.expr(f"hv DIV {HLL_M}").alias("w"),
    )
    return wb.groupBy(*keys, "bucket").agg(
        F.max(F.expr(_rho_case("w"))).alias("r")
    )


def hll_fold_registers(reg: DataFrame, *keys: str) -> DataFrame:
    """(*keys, n_registers, v_zero, s_num, est) — the stateless estimate
    fold over register rows, shared by the batch operators and the
    streaming consumer. s_num is the exact scaled harmonic sum; est applies
    the standard small-range LinearCounting correction (raw <= 2.5m and
    empty registers exist -> m*ln(m/V))."""
    per = reg.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_registers"),
        F.sum(F.expr(f"CAST(power(2, {_HLL_RMAX} - r) AS BIGINT)"))
        .cast("long")
        .alias("s_present"),
    )
    fin = per.select(
        *keys,
        "n_registers",
        (F.lit(HLL_M) - F.col("n_registers")).cast("long").alias("v_zero"),
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_registers")) * F.lit(2**_HLL_RMAX)
        )
        .cast("long")
        .alias("s_num"),
    )
    est = F.expr(
        f"round(CASE WHEN {_HLL_C} / s_num <= {2.5 * HLL_M} AND v_zero > 0"
        f" THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v_zero)"
        f" ELSE {_HLL_C} / s_num END, 6)"
    )
    return fin.select(
        *keys, "n_registers", "v_zero", "s_num", est.alias("est")
    )


def hll_distinct_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language HyperLogLog distinct-3-gram estimate.

    (lang, n_registers, v_zero, s_num, est): the full register-file digest.
    Relative error ~= 1.04/sqrt(256) = 6.5% — cardinality-INVARIANT, so
    m=256 is not a scale parameter the way LSH planes are.

    Scale shape: one map-side-combined groupBy down to <= langs*256 register
    rows; the stream itself never shuffles.
    """
    sh = _shingle_stream(spark, sf_dir, "lang")
    return hll_fold_registers(
        hll_registers(sh, F.col("shingle"), "lang"), "lang"
    )


SQL_HLL_DISTINCT_SHINGLES = f"""
WITH sh AS ({_sql_shingle_stream('lang')}),
wb AS (
  SELECT lang, hv % {HLL_M} AS bucket, hv // {HLL_M} AS w
  FROM (SELECT lang, {_SQL_HASH56.format(col='shingle')} AS hv FROM sh)
),
reg AS (
  SELECT lang, bucket, max({_rho_case('w')}) AS r FROM wb GROUP BY 1, 2
),
per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(CAST(power(2, {_HLL_RMAX} - r) AS BIGINT)) AS BIGINT) AS s_present
  FROM reg GROUP BY 1
),
fin AS (
  SELECT lang, n_registers,
         CAST({HLL_M} - n_registers AS BIGINT) AS v_zero,
         CAST(s_present + ({HLL_M} - n_registers) * {2**_HLL_RMAX} AS BIGINT) AS s_num
  FROM per
)
SELECT lang, n_registers, v_zero, s_num,
       round(CASE WHEN {_HLL_C} / s_num <= {2.5 * HLL_M} AND v_zero > 0
                  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v_zero)
                  ELSE {_HLL_C} / s_num END, 6) AS est
FROM fin
"""


# ------------------------------------------------ hourly distinct-user HLL


def events_hll_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour HLL distinct-user estimate over ``events`` —
    (hour_bucket, n_registers, v_zero, s_num, est, exact_users).

    The batch twin of streaming/windowed.windowed_user_hll: the register
    rows are byte-identical to what the watermarked streaming agg emits
    (parity-tested), so "distinct users per window" costs bounded state in
    both modes — 256 register rows per window instead of a per-user set.
    exact_users is the gate/report comparison column (a real
    count-distinct); at stream scale you'd keep only the sketch.
    """
    ev = load(spark, sf_dir, "events")
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_bucket")
    reg = hll_registers(
        ev.select(hour, "user_id"), F.col("user_id").cast("string"), "hour_bucket"
    )
    folded = hll_fold_registers(reg, "hour_bucket")
    exact = (
        ev.select(hour, "user_id")
        .groupBy("hour_bucket")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    return folded.join(exact, "hour_bucket")


SQL_EVENTS_HLL_HOURLY = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
         CAST(user_id AS VARCHAR) AS uid, user_id
  FROM events
),
wb AS (
  SELECT hour_bucket, hv % {HLL_M} AS bucket, hv // {HLL_M} AS w
  FROM (SELECT hour_bucket, {_SQL_HASH56.format(col='uid')} AS hv FROM ev)
),
reg AS (
  SELECT hour_bucket, bucket, max({_rho_case('w')}) AS r FROM wb GROUP BY 1, 2
),
per AS (
  SELECT hour_bucket, CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(CAST(power(2, {_HLL_RMAX} - r) AS BIGINT)) AS BIGINT) AS s_present
  FROM reg GROUP BY 1
),
fin AS (
  SELECT hour_bucket, n_registers,
         CAST({HLL_M} - n_registers AS BIGINT) AS v_zero,
         CAST(s_present + ({HLL_M} - n_registers) * {2**_HLL_RMAX} AS BIGINT) AS s_num
  FROM per
),
exact AS (
  SELECT hour_bucket, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM ev GROUP BY 1
)
SELECT fin.hour_bucket, n_registers, v_zero, s_num,
       round(CASE WHEN {_HLL_C} / s_num <= {2.5 * HLL_M} AND v_zero > 0
                  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v_zero)
                  ELSE {_HLL_C} / s_num END, 6) AS est,
       exact_users
FROM fin JOIN exact ON fin.hour_bucket = exact.hour_bucket
"""


# -------------------------------------------------- count-min heavy hitters

CMS_D = 4  # hash rows
CMS_W = 2048  # buckets per row
HH_DEN = 300  # heavy = frequency >= N / HH_DEN

# The synthetic documents table is near-uniform over 3-grams (max natural
# share ~0.03%) — real web text is not: boilerplate banners dominate. The
# operator therefore synthesizes the skew it exists to find (the established
# pattern: curation._pages), appending one of three deterministic banner
# phrases twice to every even doc_id. Pure banner 3-grams land ~0.6% of the
# stream (>= N/300); every natural 3-gram stays two orders of magnitude
# below. A test pins the non-degeneracy in both directions.
_BANNERS = (
    "footer nav copyright",
    "cookie consent notice",
    "subscribe newsletter today",
)


def _banner_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    b = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_BANNERS[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_BANNERS[1]))
        .otherwise(F.lit(_BANNERS[2]))
    )
    page = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.col("text"), F.lit(" "), b, F.lit(" "), b),
    ).otherwise(F.col("text"))
    return docs.select("doc_id", page.alias("text"))


_SQL_BANNER_PAGES = f"""
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN text || ' ' || b || ' ' || b
              ELSE text END AS text
  FROM (SELECT doc_id, text,
               CASE doc_id % 3 WHEN 0 THEN '{_BANNERS[0]}'
                               WHEN 1 THEN '{_BANNERS[1]}'
                               ELSE '{_BANNERS[2]}' END AS b
        FROM documents)
"""


def _banner_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _banner_pages(spark, sf_dir)
    return (
        pages.select(tokens_column(F.col("text")).alias("t"))
        .filter(F.size("t") >= 3)
        .select(F.explode(F.expr(_SPARK_SHINGLES3)).alias("shingle"))
    )


def _cms_bucket(row: int) -> F.Column:
    return _hash56(F.concat(F.lit(f"{row}:"), F.col("shingle"))) % CMS_W


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shingle, cms_est, exact_cnt) for every 3-gram whose count-min
    estimate reaches N/{HH_DEN} of the banner-page stream.

    Two passes, the canonical batch shape:

    1. build the d x w counter grid — groupBy(row, bucket) with map-side
       combine, shuffle O(d*w) cells; collected to the driver (8 KB,
       bounded by the SKETCH, like the k-means centroid contract);
    2. re-stream, compute each occurrence's estimate map-side against the
       broadcast grid, FILTER BEFORE the shuffle — only sketch-heavy
       occurrences reach the exact groupBy(shingle), so the vocabulary
       never shuffles (CMS never undercounts, so no true heavy hitter can
       be filtered out). Plan guard: tests/test_sketches.py.
    """
    stream = _banner_shingles(spark, sf_dir)
    keyed = stream.select(
        F.posexplode(F.array(*[_cms_bucket(r) for r in range(CMS_D)])).alias(
            "row", "bucket"
        )
    )
    cells = {
        (r, b): int(c)
        for r, b, c in keyed.groupBy("row", "bucket").count().collect()
    }
    n_total = sum(c for (r, _), c in cells.items() if r == 0)
    thr = (n_total + HH_DEN - 1) // HH_DEN
    grids = [
        [cells.get((r, b), 0) for b in range(CMS_W)] for r in range(CMS_D)
    ]
    grid_df = spark.createDataFrame(
        [tuple(grids)], ", ".join(f"c{r}: array<bigint>" for r in range(CMS_D))
    )
    probed = stream.crossJoin(F.broadcast(grid_df))
    est = F.least(
        *[
            F.element_at(F.col(f"c{r}"), (_cms_bucket(r) + 1).cast("int"))
            for r in range(CMS_D)
        ]
    )
    return (
        probed.withColumn("est", est)
        .filter(F.col("est") >= thr)
        .groupBy("shingle")
        .agg(
            F.min("est").cast("long").alias("cms_est"),
            F.count("*").cast("long").alias("exact_cnt"),
        )
    )


_SQL_CMS_STREAM = f"""
      SELECT unnest({_SQL_SHINGLES3}) AS shingle
      FROM (SELECT {SQL_TOKS.format(col='text')} AS t
            FROM ({_SQL_BANNER_PAGES}))
      WHERE len(t) >= 3
"""

SQL_CMS_HEAVY_HITTERS = f"""
WITH stream AS ({_SQL_CMS_STREAM}),
keyed AS (
  SELECT shingle, r,
         {_SQL_HASH56.format(col="CAST(r AS VARCHAR) || ':' || shingle")} % {CMS_W} AS bucket
  FROM stream CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
),
cells AS (
  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c FROM keyed GROUP BY 1, 2
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM stream),
est AS (
  SELECT shingle, CAST(min(c) AS BIGINT) AS cms_est
  FROM (SELECT DISTINCT shingle, r, bucket FROM keyed) sk
  JOIN cells USING (r, bucket)
  GROUP BY 1
),
exact AS (
  SELECT shingle, CAST(count(*) AS BIGINT) AS exact_cnt FROM stream GROUP BY 1
)
SELECT shingle, cms_est, exact_cnt
FROM est JOIN exact USING (shingle) CROSS JOIN n
WHERE cms_est >= (n_total + {HH_DEN - 1}) // {HH_DEN}
"""


# ------------------------------------------------------ Bloom novelty probe

BLOOM_K = 3  # hash functions
BLOOM_BITS_PER_KEY = 8  # m = next power of two >= 8 * |base n-gram set|

# Same snapshot split as dedup.dedup_new_vs_base (dedup.py:1094).
_SNAP_MOD = 5


def derive_bloom_m(n_base: int) -> int:
    """Bloom capacity from the base-set cardinality: m = 2^ceil(log2(8n)),
    i.e. a fixed ~8 bits/key load (k=3 -> ~3% worst-case false positives)
    at ANY corpus size — the same derived-capacity contract as the ANN
    surfaces (similarity.derive_n_planes / derive_k). Computed with integer
    bit_length, never float log2 (power-of-two boundaries would diverge
    between engines); the oracle's CASE chain below is formula-identical."""
    v = 8 * n_base - 1
    return 1 << max(6, v.bit_length() if v > 0 else 1)


def _sql_bitlen_case(col: str, maxbits: int = 45) -> str:
    """Integer bit_length as a generated CASE chain (oracle twin of
    ``int.bit_length`` in derive_bloom_m)."""
    whens = " ".join(
        f"WHEN {col} >= {1 << j} THEN {j + 1}" for j in range(maxbits - 1, -1, -1)
    )
    return f"CASE {whens} ELSE 1 END"


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) per-doc DISTINCT 3-grams — array_distinct inside the
    scan stage, so per-doc dedup costs zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", tokens_column(F.col("text")).alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(F.expr(f"array_distinct({_SPARK_SHINGLES3})")).alias(
                "shingle"
            ),
        )
    )


def _bloom_pos(i: int, m: int) -> F.Column:
    return _hash56(F.concat(F.lit(f"{i}:"), F.col("shingle"))) % m


def bloom_snapshot_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per new-snapshot doc: how many of its distinct 3-grams the BASE corpus
    already contains — (doc_id, n_shingles, n_bloom_seen, n_exact_seen).

    The base n-gram set is folded into a {BLOOM_K}-hash Bloom bitset sized
    by ``derive_bloom_m`` (a fixed 8 bits/key load at any corpus size) — the
    bitset rides a broadcast and the probe is pure map-side expressions
    (word >> bit & 1), so "seen before?" costs the snapshot ZERO
    shingle-keyed shuffle. Bloom never misses: n_bloom_seen >= n_exact_seen
    always; the gap is the false positives (~3% at this load). The sizing
    pass here counts the base set exactly (one scalar agg); at 100 TB you'd
    feed ``hll_distinct_shingles``'s estimate in instead — HLL's 6.5% error
    moves the load factor, not correctness. n_exact_seen (a real semi-join
    against the base n-gram set) is the gate/report-only comparison column —
    at 100 TB you'd keep only the bloom column; that asymmetry is the point
    of the operator.
    """
    ds = _doc_shingles(spark, sf_dir)
    is_new = F.col("doc_id") % _SNAP_MOD == 0
    base = ds.filter(~is_new)
    new = ds.filter(is_new)

    n_base = base.select("shingle").distinct().count()
    m = derive_bloom_m(n_base)

    base_pos = (
        base.select(
            F.explode(
                F.array(*[_bloom_pos(i, m) for i in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )  # bounded by m rows by construction (8 bits/key), not by corpus size
    words = [0] * (m // 64)
    for (p,) in base_pos:
        words[p // 64] |= 1 << (p % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    words_df = spark.createDataFrame([(words,)], "bw: array<bigint>")

    probed = new.crossJoin(F.broadcast(words_df))
    for i in range(BLOOM_K):
        probed = probed.withColumn(f"p{i}", _bloom_pos(i, m))
    hit = None
    for i in range(BLOOM_K):
        bit = F.expr(
            f"(shiftrightunsigned(element_at(bw, CAST(p{i} DIV 64 AS INT) + 1),"
            f" CAST(p{i} % 64 AS INT)) & 1) = 1"
        )
        hit = bit if hit is None else (hit & bit)
    bloom_agg = probed.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.sum(hit.cast("long")).cast("long").alias("n_bloom_seen"),
    )
    exact_agg = (
        new.join(base.select("shingle").distinct(), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_exact_seen"))
    )
    return bloom_agg.join(exact_agg, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        "n_bloom_seen",
        F.coalesce(F.col("n_exact_seen"), F.lit(0).cast("long")).alias(
            "n_exact_seen"
        ),
    )


SQL_BLOOM_SNAPSHOT_NOVELTY = f"""
WITH ds AS ({_sql_shingle_stream('doc_id', distinct=True)}),
newsh AS (SELECT * FROM ds WHERE doc_id % {_SNAP_MOD} = 0),
basesh AS (SELECT DISTINCT shingle FROM ds WHERE doc_id % {_SNAP_MOD} <> 0),
mval AS (
  SELECT CAST(power(2, GREATEST(6, {_sql_bitlen_case(f'{BLOOM_BITS_PER_KEY} * CAST(count(*) AS BIGINT) - 1')})) AS BIGINT) AS m
  FROM basesh
),
basepos AS (
  SELECT DISTINCT
         {_SQL_HASH56.format(col="CAST(i AS VARCHAR) || ':' || shingle")} % m AS pos
  FROM basesh CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) CROSS JOIN mval
),
probe AS (
  SELECT doc_id, shingle,
         {", ".join(_SQL_HASH56.format(col=f"'{i}:' || shingle") + f" % m AS p{i}" for i in range(BLOOM_K))}
  FROM newsh CROSS JOIN mval
),
hits AS (
  SELECT doc_id,
         CASE WHEN {" AND ".join(f"p{i} IN (SELECT pos FROM basepos)" for i in range(BLOOM_K))}
              THEN 1 ELSE 0 END AS hit
  FROM probe
),
bl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(hit) AS BIGINT) AS n_bloom_seen
  FROM hits GROUP BY 1
),
ex AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact_seen
  FROM newsh WHERE shingle IN (SELECT shingle FROM basesh) GROUP BY 1
)
SELECT bl.doc_id, n_shingles, n_bloom_seen,
       COALESCE(ex.n_exact_seen, CAST(0 AS BIGINT)) AS n_exact_seen
FROM bl LEFT JOIN ex ON bl.doc_id = ex.doc_id
"""


# ------------------------------------- windowed CMS (streaming batch twin)

# Per-WINDOW heavy hitters with bounded state — the streaming counterpart
# of cms_heavy_hitters, sharing one cell shape with
# streaming/windowed.windowed_key_cms exactly like the HLL pair above:
# the stream maintains only the d x w counter grid per open window
# (groupBy(window, row, bucket).count() — algebraic, partial-merged,
# append-mode legal), and heavy keys are read off the finalized grid with
# the relational probe below. Cell rows are byte-identical between modes
# (parity-tested in tests/test_windowed_stream.py).
#
# Unlike the banner-shingle operator (driver-broadcast 8 KB grid — fine
# for ONE global sketch), the per-window probe here stays fully
# RELATIONAL: distinct (window, key, row, bucket) joined back to the cell
# table on its own key, then min over rows — one equi-join, no grid ever
# on the driver, which is the shape that survives 10^5 open windows.
# The exact-count verification joins the stream against the BROADCAST
# heavy-key set (<= CMS_EV_DEN keys per window by construction), so the
# full stream never shuffles on key.
#
# Key synthesis (events carry no page column): one deterministic dominant
# key ('hot', every third event — ~33% of each window) over the per-user
# tail, following the banner-pages precedent. Windows are DAILY: ~330
# events/day at sf0.01, threshold ceil(N_day/8) ≈ 42, hot ≈ 110 — two
# orders above any user key (non-degeneracy test-pinned).

CMS_EV_DEN = 8  # heavy = window frequency >= ceil(N_window / 8)
DAY_S = 86400


def event_key() -> F.Column:
    """Deterministic skewed key for the events stream."""
    return F.when(F.col("event_id") % 3 == 0, F.lit("hot")).otherwise(
        F.concat(F.lit("u"), F.col("user_id").cast("string"))
    )


_SQL_EVENT_KEY = (
    "CASE WHEN event_id % 3 = 0 THEN 'hot' "
    "ELSE 'u' || CAST(user_id AS VARCHAR) END"
)


def cms_key_buckets(key: F.Column) -> F.Column:
    """array of CMS_D bucket ids for a key (row r salted as 'r:key')."""
    return F.array(
        *[
            _hash56(F.concat(F.lit(f"{r}:"), key)) % CMS_W
            for r in range(CMS_D)
        ]
    )


def cms_heavy_from_cells(
    keyed: DataFrame, cells: DataFrame, *wkeys: str
) -> DataFrame:
    """Relational CMS probe: keyed (wkeys..., key, row, bucket) x cells
    (wkeys..., row, bucket, c) -> per-(wkeys, key) min-over-rows estimate."""
    on = [*wkeys, "row", "bucket"]
    return (
        keyed.select(*wkeys, "key", "row", "bucket")
        .distinct()
        .join(cells, on)
        .groupBy(*wkeys, "key")
        .agg(F.min("c").cast("long").alias("cms_est"))
    )


def events_cms_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day_bucket, key, cms_est, exact_cnt) for every key whose count-min
    estimate reaches ceil(N_day / CMS_EV_DEN) within its day window."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / DAY_S).cast("long").alias("day_bucket"),
        event_key().alias("key"),
    )
    keyed = ev.select(
        "day_bucket",
        "key",
        F.posexplode(cms_key_buckets(F.col("key"))).alias("row", "bucket"),
    )
    cells = keyed.groupBy("day_bucket", "row", "bucket").agg(
        F.count("*").cast("long").alias("c")
    )
    nd = ev.groupBy("day_bucket").agg(F.count("*").cast("long").alias("n_day"))
    est = cms_heavy_from_cells(keyed, cells, "day_bucket")
    heavy = est.join(nd, "day_bucket").filter(
        F.col("cms_est") >= F.expr(f"(n_day + {CMS_EV_DEN - 1}) DIV {CMS_EV_DEN}")
    )
    exact = (
        ev.join(
            F.broadcast(heavy.select("day_bucket", "key")), ["day_bucket", "key"]
        )
        .groupBy("day_bucket", "key")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
    )
    return heavy.select("day_bucket", "key", "cms_est").join(
        exact, ["day_bucket", "key"]
    )


SQL_EVENTS_CMS_DAILY = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / {DAY_S}) AS BIGINT) AS day_bucket,
         {_SQL_EVENT_KEY} AS key
  FROM events
),
keyed AS (
  SELECT day_bucket, key, r AS row,
         {_SQL_HASH56.format(col="CAST(r AS VARCHAR) || ':' || key")} % {CMS_W} AS bucket
  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
),
cells AS (
  SELECT day_bucket, row, bucket, CAST(count(*) AS BIGINT) AS c
  FROM keyed GROUP BY 1, 2, 3
),
nd AS (
  SELECT day_bucket, CAST(count(*) AS BIGINT) AS n_day FROM ev GROUP BY 1
),
est AS (
  SELECT day_bucket, key, CAST(min(c) AS BIGINT) AS cms_est
  FROM (SELECT DISTINCT day_bucket, key, row, bucket FROM keyed) k
  JOIN cells USING (day_bucket, row, bucket)
  GROUP BY 1, 2
),
heavy AS (
  SELECT e.day_bucket, e.key, e.cms_est
  FROM est e JOIN nd USING (day_bucket)
  WHERE cms_est >= (n_day + {CMS_EV_DEN - 1}) // {CMS_EV_DEN}
),
exact AS (
  SELECT day_bucket, key, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM ev SEMI JOIN heavy USING (day_bucket, key)
  GROUP BY 1, 2
)
SELECT day_bucket, key, cms_est, exact_cnt
FROM heavy JOIN exact USING (day_bucket, key)
"""


# --------------------------------------- sliding-window distinct-user HLL

# The SLIDING-window mode of the tumbling pair above: "distinct users in
# the trailing day, readable every 6 hours". A sliding window multiplies
# state by (size/slide); with a per-user set that is catastrophic — with
# the HLL register file it is exactly SLIDE_FACTOR x 256 rows per open
# span. Each event belongs to exactly SLIDE_FACTOR windows (starts at
# slide multiples in (ts - size, ts]); the batch operator EXPLODES the
# event into those starts with one array expression — bounded fan-out,
# the j10 range-join bucketing argument — and reuses hll_registers /
# hll_fold_registers unchanged. The streaming twin is the same
# groupBy(window(ts, size, slide)) with Spark's native sliding window
# (alignment: epoch multiples of the slide — identical arithmetic,
# parity-tested cell-for-cell in tests/test_windowed_stream.py).

SLIDE_S = 21_600  # 6 hours
WIN_S = 86_400  # 1 day
SLIDE_FACTOR = WIN_S // SLIDE_S


def sliding_starts(ts_col: str) -> F.Column:
    """array of the SLIDE_FACTOR window starts (epoch seconds) containing
    a timestamp."""
    base = F.expr(
        f"(CAST(floor(unix_timestamp({ts_col})) AS BIGINT) DIV {SLIDE_S})"
        f" * {SLIDE_S}"
    )
    return F.array(
        *[(base - k * SLIDE_S).cast("long") for k in range(SLIDE_FACTOR)]
    )


def events_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(win_start, n_registers, v_zero, s_num, est, exact_users) per
    sliding 1-day/6-hour window over events."""
    ev = load(spark, sf_dir, "events").select(
        F.explode(sliding_starts("ts")).alias("win_start"), "user_id"
    )
    folded = hll_fold_registers(
        hll_registers(ev, F.col("user_id").cast("string"), "win_start"),
        "win_start",
    )
    exact = ev.groupBy("win_start").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return folded.join(exact, "win_start")


SQL_EVENTS_HLL_SLIDING = f"""
WITH ev AS (
  SELECT ((CAST(floor(epoch(ts)) AS BIGINT) // {SLIDE_S}) - k) * {SLIDE_S}
           AS win_start,
         CAST(user_id AS VARCHAR) AS uid, user_id
  FROM events CROSS JOIN (SELECT unnest(range({SLIDE_FACTOR})) AS k)
),
wb AS (
  SELECT win_start, hv % {HLL_M} AS bucket, hv // {HLL_M} AS w
  FROM (SELECT win_start, {_SQL_HASH56.format(col='uid')} AS hv FROM ev)
),
reg AS (
  SELECT win_start, bucket, max({_rho_case('w')}) AS r FROM wb GROUP BY 1, 2
),
per AS (
  SELECT win_start, CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(CAST(power(2, {_HLL_RMAX} - r) AS BIGINT)) AS BIGINT) AS s_present
  FROM reg GROUP BY 1
),
fin AS (
  SELECT win_start, n_registers,
         CAST({HLL_M} - n_registers AS BIGINT) AS v_zero,
         CAST(s_present + ({HLL_M} - n_registers) * {2**_HLL_RMAX} AS BIGINT) AS s_num
  FROM per
),
exact AS (
  SELECT win_start, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM ev GROUP BY 1
)
SELECT fin.win_start, n_registers, v_zero, s_num,
       round(CASE WHEN {_HLL_C} / s_num <= {2.5 * HLL_M} AND v_zero > 0
                  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v_zero)
                  ELSE {_HLL_C} / s_num END, 6) AS est,
       exact_users
FROM fin JOIN exact ON fin.win_start = exact.win_start
"""


QUERIES = {
    "hll_distinct_shingles": (hll_distinct_shingles, SQL_HLL_DISTINCT_SHINGLES),
    "events_hll_hourly": (events_hll_hourly, SQL_EVENTS_HLL_HOURLY),
    "cms_heavy_hitters": (cms_heavy_hitters, SQL_CMS_HEAVY_HITTERS),
    "bloom_snapshot_novelty": (bloom_snapshot_novelty, SQL_BLOOM_SNAPSHOT_NOVELTY),
    "events_cms_daily": (events_cms_daily, SQL_EVENTS_CMS_DAILY),
    "events_hll_sliding": (events_hll_sliding, SQL_EVENTS_HLL_SLIDING),
}


# ------------------------------------------------ snapshot drift (KL)

# Corpus drift monitor between crawl snapshots: per language, the
# KL divergence of the BASE corpus's source-mixture from the NEW
# snapshot's (add-one smoothed over the union category set) — the "did
# this crawl's composition shift" gate a recurring pipeline runs before
# accepting a snapshot (CCNet re-crawls monitor exactly this). Micro-nat
# idiom (the DSIR/bigram-LM contract): every per-category term is rounded
# to integer micro-nats by ONE shared float expression evaluated on
# identical integer counts in both engines, and the per-lang KL is then
# an exact int64 sum.
#
# Snapshot synthesis (one corpus, no second crawl in testdata): drop every
# 5th doc and relabel every 7th doc's source to 'src_new' — a real mixture
# shift plus a new category, so smoothing and the union category set are
# both exercised (non-degeneracy test-pinned).
#
# Scale shape: two (lang, source) count aggs (map-side combined) full-outer
# joined on their own key, per-lang totals broadcast back — nothing larger
# than |langs × sources| ever shuffles twice.

# e0-suffixed literals: Spark parses bare "1.0" as DECIMAL (DuckDB as
# DOUBLE) and decimal division truncates — "1.0e0" is DOUBLE in both.
_DRIFT_EXPR = (
    "CAST(round(1.0e6 * ((bc + 1.0e0) / (nb + s_cats))"
    " * ln(((bc + 1.0e0) / (nb + s_cats)) / ((sc + 1.0e0) / (ns + s_cats))))"
    " AS BIGINT)"
)


def _snapshot(docs: DataFrame) -> DataFrame:
    return docs.filter(F.col("doc_id") % 5 != 0).select(
        "lang",
        F.when(F.col("doc_id") % 7 == 0, F.lit("src_new"))
        .otherwise(F.col("source"))
        .alias("source"),
    )


def snapshot_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_base, n_snap, n_cats, kl_micronat): smoothed
    KL(base || snapshot) over the source mixture, integer micro-nats."""
    docs = load(spark, sf_dir, "documents")
    bc = (
        docs.select("lang", "source")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("bc"))
    )
    sc = (
        _snapshot(docs)
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("sc"))
    )
    cells = (
        bc.join(sc, ["lang", "source"], "full_outer")
        .select(
            "lang",
            "source",
            F.coalesce(F.col("bc"), F.lit(0)).cast("long").alias("bc"),
            F.coalesce(F.col("sc"), F.lit(0)).cast("long").alias("sc"),
        )
    )
    tot = cells.groupBy("lang").agg(
        F.sum("bc").cast("long").alias("nb"),
        F.sum("sc").cast("long").alias("ns"),
        F.count("*").cast("long").alias("s_cats"),
    )
    terms = cells.join(F.broadcast(tot), "lang").select(
        "lang", "nb", "ns", "s_cats", F.expr(_DRIFT_EXPR).alias("t")
    )
    return terms.groupBy("lang").agg(
        F.min("nb").alias("n_base"),
        F.min("ns").alias("n_snap"),
        F.min("s_cats").alias("n_cats"),
        F.sum("t").cast("long").alias("kl_micronat"),
    )


SQL_SNAPSHOT_DRIFT_KL = f"""
WITH snap AS (
  SELECT lang,
         CASE WHEN doc_id % 7 = 0 THEN 'src_new' ELSE source END AS source
  FROM documents WHERE doc_id % 5 <> 0
),
bcnt AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS bc
  FROM documents GROUP BY 1, 2
),
scnt AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS sc
  FROM snap GROUP BY 1, 2
),
cells AS (
  SELECT coalesce(bcnt.lang, scnt.lang) AS lang,
         coalesce(bcnt.source, scnt.source) AS source,
         coalesce(bc, 0) AS bc, coalesce(sc, 0) AS sc
  FROM bcnt FULL OUTER JOIN scnt
    ON bcnt.lang = scnt.lang AND bcnt.source = scnt.source
),
tot AS (
  SELECT lang, CAST(sum(bc) AS BIGINT) AS nb, CAST(sum(sc) AS BIGINT) AS ns,
         CAST(count(*) AS BIGINT) AS s_cats
  FROM cells GROUP BY 1
),
terms AS (
  SELECT cells.lang, nb, ns, s_cats, {_DRIFT_EXPR} AS t
  FROM cells JOIN tot ON cells.lang = tot.lang
)
SELECT lang, min(nb) AS n_base, min(ns) AS n_snap, min(s_cats) AS n_cats,
       CAST(sum(t) AS BIGINT) AS kl_micronat
FROM terms GROUP BY 1
"""


QUERIES["snapshot_drift_kl"] = (snapshot_drift_kl, SQL_SNAPSHOT_DRIFT_KL)


# ---------------------------------------------- HLL measured-error eval
# "Measure, don't guess": the sketch family's accuracy claim (sigma =
# 1.04/sqrt(m) = 6.5% at m=256) verified against exact distinct counts at
# FOUR cardinalities from one stream — the hash-nested subsets
# hv % s == 0 for s in 1,4,16,64 give ~D, D/4, D/16, D/64 distinct
# shingles, so one operator exercises both estimator regimes (raw HLL on
# the large groups, the LinearCounting small-range correction on the
# smallest; a pytest pins that BOTH branches actually fire). The exact leg
# is a labeled shingle-keyed distinct — the eval needs ground truth by
# definition; the sketch leg stays O(m) state. Same eval pattern as
# jl_distortion_eval / ann_lsh_recall / dedup_lsh_pr_eval.

_HLL_EVAL_SCALES = (1, 4, 16, 64)


def hll_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(scale, exact, est, err_micro): HLL estimate vs exact distinct
    3-gram count on nested hash subsets of the corpus shingle stream.

    The subset hash is md5('sub|' || shingle) — INDEPENDENT of the HLL
    value hash. Reusing hv here is the classic sketch-correlation bug:
    hv % s == 0 forces bucket = hv % m onto 1/s of the register file and
    the estimator collapses (measured: est 74 vs exact 4112 at s=4).
    A pytest pins this independence by construction."""
    sh = _shingle_stream(spark, sf_dir).select(
        "shingle",
        _hash56(F.concat(F.lit("sub|"), F.col("shingle"))).alias("sv"),
    )
    scales = ",".join(str(s) for s in _HLL_EVAL_SCALES)
    sub = sh.select(
        "shingle",
        F.explode(
            F.expr(f"filter(array({scales}), s -> sv % s = 0)")
        ).alias("scale"),
    )
    est = hll_fold_registers(
        hll_registers(sub, F.col("shingle"), "scale"), "scale"
    ).select("scale", "est")
    exact = sub.groupBy("scale").agg(
        F.countDistinct("shingle").cast("long").alias("exact")
    )
    return exact.join(est, "scale").select(
        "scale",
        "exact",
        "est",
        F.expr(
            "CAST(floor(abs(est - exact) * 1.0e6 / exact + 0.5e0) AS BIGINT)"
        ).alias("err_micro"),
    )


SQL_HLL_ERROR_EVAL = f"""
WITH sh AS (
  SELECT shingle, {_SQL_HASH56.format(col="'sub|' || shingle")} AS sv
  FROM ({_sql_shingle_stream()})
),
sub AS (
  SELECT shingle, unnest(list_filter({list(_HLL_EVAL_SCALES)}, s -> sv % s = 0))
           AS scale
  FROM sh
),
wb AS (
  SELECT scale, hv % {HLL_M} AS bucket, hv // {HLL_M} AS w
  FROM (SELECT scale, {_SQL_HASH56.format(col='shingle')} AS hv FROM sub)
),
reg AS (
  SELECT scale, bucket, max({_rho_case('w')}) AS r FROM wb GROUP BY 1, 2
),
per AS (
  SELECT scale, CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(CAST(power(2, {_HLL_RMAX} - r) AS BIGINT)) AS BIGINT) AS s_present
  FROM reg GROUP BY 1
),
fin AS (
  SELECT scale, n_registers,
         CAST({HLL_M} - n_registers AS BIGINT) AS v_zero,
         CAST(s_present + ({HLL_M} - n_registers) * {2**_HLL_RMAX} AS BIGINT) AS s_num
  FROM per
),
est AS (
  SELECT scale,
         round(CASE WHEN {_HLL_C} / s_num <= {2.5 * HLL_M} AND v_zero > 0
                    THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v_zero)
                    ELSE {_HLL_C} / s_num END, 6) AS est
  FROM fin
),
exact AS (
  SELECT scale, CAST(count(DISTINCT shingle) AS BIGINT) AS exact FROM sub
  GROUP BY scale
)
SELECT scale, exact, est,
       CAST(floor(abs(est - exact) * 1.0e6 / exact + 0.5e0) AS BIGINT)
         AS err_micro
FROM exact JOIN est USING (scale)
"""

QUERIES["hll_error_eval"] = (hll_error_eval, SQL_HLL_ERROR_EVAL)


# ---------------------------------------- quantile histogram sketch + eval
# The fourth sketch: mergeable quantiles (HdrHistogram-style), completing
# distinct (HLL) / frequency (CMS) / membership (Bloom). Values go to
# exact integer cents (the money idiom), then to a log-scale bucket with a
# 4-bit mantissa: v < 16 exact, else bucket = 16 + (exp-5)*8 + top3, with
# exp = length(bin(v)) — INTEGER bit tricks only, so bucket assignment is
# bit-identical in both engines (a float log_gamma bucketer like DDSketch's
# would be engine-divergent at boundaries). Relative error of the bucket
# midpoint is <= 2^-4 = 6.25% by construction; the eval MEASURES it per
# percentile against the exact order statistic. Sketch state is <= ~112
# buckets no matter the corpus (map-side combined groupBy; merging sketches
# is adding histograms) — the cumulative window runs over that bounded
# frame, same argument as events_pipeline_aggs. The exact leg is the
# labeled ground truth: one distinct-cents agg + one bounded window.

QS_PCTS = (50, 90, 99)

# {shr}/{shl} filled per engine; the formula text is otherwise identical.
_QS_BUCKET_T = (
    "CASE WHEN v < 16 THEN v "
    "ELSE 16 + (length(bin(v)) - 5) * 8 + ({shr} - 8) END"
)
_QS_REP_T = (
    "CASE WHEN b < 16 THEN b "
    "ELSE {shl} END"
)


def _qs_spark_bucket() -> str:
    return _QS_BUCKET_T.format(shr="shiftright(v, length(bin(v)) - 4)")


def _qs_spark_rep() -> str:
    return _QS_REP_T.format(
        shl="shiftleft(2 * (8 + (b - 16) % 8) + 1, (b - 16) DIV 8)"
    )


def _qs_sql_bucket() -> str:
    return _QS_BUCKET_T.format(shr="(v >> (length(bin(v)) - 4))")


def _qs_sql_rep() -> str:
    return _QS_REP_T.format(
        shl="((2 * (8 + (b - 16) % 8) + 1) << ((b - 16) // 8))"
    )


def quantile_sketch_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_pct, exact_cents, est_cents, err_micro): histogram-sketch
    quantile estimate vs the exact order statistic of events.value."""
    ev = load(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v")
    )
    hist = (
        ev.withColumn("b", F.expr(_qs_spark_bucket()))
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wb = W.orderBy("b").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.withColumn("cum", F.sum("cnt").over(wb)).crossJoin(
        F.broadcast(ev.agg(F.count("*").cast("long").alias("n")))
    )
    pcts = spark.createDataFrame([(int(p),) for p in QS_PCTS], "q_pct long")
    est = (
        cum.crossJoin(F.broadcast(pcts))
        .filter(F.col("cum") * 100 >= F.col("q_pct") * F.col("n"))
        .groupBy("q_pct")
        .agg(F.min("b").alias("b"))
        .withColumn("est_cents", F.expr(_qs_spark_rep()).cast("long"))
    )
    vc = ev.groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    vcum = vc.withColumn("cum", F.sum("cnt").over(wv)).crossJoin(
        F.broadcast(ev.agg(F.count("*").cast("long").alias("n")))
    )
    exact = (
        vcum.crossJoin(F.broadcast(pcts))
        .filter(F.col("cum") * 100 >= F.col("q_pct") * F.col("n"))
        .groupBy("q_pct")
        .agg(F.min("v").cast("long").alias("exact_cents"))
    )
    return exact.join(est.select("q_pct", "est_cents"), "q_pct").select(
        "q_pct",
        "exact_cents",
        "est_cents",
        F.expr(
            "CAST(floor(abs(est_cents - exact_cents) * 1.0e6 / exact_cents"
            " + 0.5e0) AS BIGINT)"
        ).alias("err_micro"),
    )


SQL_QUANTILE_SKETCH_EVAL = f"""
WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
),
n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev),
hist AS (
  SELECT {_qs_sql_bucket()} AS b, CAST(count(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1
),
cum AS (
  SELECT b, sum(cnt) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
pcts AS (SELECT unnest({list(QS_PCTS)}) AS q_pct),
est AS (
  SELECT q_pct, CAST({_qs_sql_rep()} AS BIGINT) AS est_cents FROM (
    SELECT q_pct, min(b) AS b
    FROM cum CROSS JOIN n_ CROSS JOIN pcts
    WHERE cum * 100 >= q_pct * n GROUP BY q_pct
  )
),
vc AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM ev GROUP BY v),
vcum AS (
  SELECT v, sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
  FROM vc
),
exact AS (
  SELECT q_pct, CAST(min(v) AS BIGINT) AS exact_cents
  FROM vcum CROSS JOIN n_ CROSS JOIN pcts
  WHERE cum * 100 >= q_pct * n GROUP BY q_pct
)
SELECT q_pct, exact_cents, est_cents,
       CAST(floor(abs(est_cents - exact_cents) * 1.0e6 / exact_cents + 0.5e0)
            AS BIGINT) AS err_micro
FROM exact JOIN est USING (q_pct)
"""

QUERIES["quantile_sketch_eval"] = (quantile_sketch_eval, SQL_QUANTILE_SKETCH_EVAL)


# Batch twin of the streaming windowed value histogram (streaming/
# windowed.windowed_value_hist): per-hour log-bucket counts, the same
# (bucket, cnt) state rows the stream maintains — counts are algebraic, so
# Spark partial-merges them map-side in BOTH modes, and merging two
# histograms is adding them (the mergeable-sketch property
# quantile_sketch_eval's accuracy bound applies to). Hour buckets use the
# floored-epoch BIGINT convention.


def events_value_hist_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour_bucket, b, cnt): hourly log-bucket histogram of value cents."""
    ev = load(spark, sf_dir, "events").select(
        F.expr("CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)").alias(
            "hour_bucket"
        ),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    return (
        ev.withColumn("b", F.expr(_qs_spark_bucket()))
        .groupBy("hour_bucket", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


SQL_EVENTS_VALUE_HIST_HOURLY = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
)
SELECT hour_bucket, {_qs_sql_bucket()} AS b,
       CAST(count(*) AS BIGINT) AS cnt
FROM ev GROUP BY hour_bucket, {_qs_sql_bucket()}
"""

QUERIES["events_value_hist_hourly"] = (
    events_value_hist_hourly,
    SQL_EVENTS_VALUE_HIST_HOURLY,
)


# ------------------------------------------------ KMV / theta set-op sketch
# The fifth sketch closes the one gap the other four leave open: SET
# OPERATIONS on cardinalities. HLL unions cleanly (register max) but cannot
# intersect; a KMV/theta sketch (Bar-Yossef et al. 2002; Dasgupta et al.,
# "Theta sketch framework", 2016) keeps the K smallest distinct hash values
# per set, and any pair of sketches composes: theta = min(theta_a, theta_b),
# the retained entries below theta form a uniform sample of the union, and
# |retained ∩ condition| * SPACE / theta estimates union / intersection /
# difference cardinalities — the "how many shingles do snapshot A and B
# SHARE" question a 100 TB dedup planner actually asks before committing to
# a full shingle-keyed join.
#
# Scale shape: one distinct on (set, hash48) then row_number ≤ K — Spark
# plans the rank filter as WindowGroupLimit, so each map task forwards at
# most K rows per set and the post-shuffle state is O(K) per set, never
# O(distinct). Every cross-sketch op joins frames of ≤ K rows (broadcast by
# construction). The exact leg (labeled, eval-only) is the usual ground
# truth: one distinct + one flag agg, same pattern as hll_error_eval.
#
# Determinism: 48-bit top-of-md5 hashes (12 hex chars) keep EVERY estimate
# numerator inside int64 — retained ≤ 2(K-1) = 510, and 510 * 2^48 ≈ 1.4e17
# ≪ 2^63; the estimate itself is an exact integer DIV, so both engines agree
# bit-for-bit (no float estimator anywhere). Sets smaller than K degrade to
# EXACT counts through the same formula (theta = SPACE ⇒ est = retained).

K_KMV = 256
KMV_SPACE = 1 << 48  # 48-bit hash space: est numerators stay < 2^63

_SQL_HASH48 = "CAST(('0x' || substr(md5({col}), 1, 12)) AS BIGINT)"


def _hash48(col: F.Column) -> F.Column:
    """Top-48-bits of md5 as a nonnegative int64 (hash56's small sibling)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


# Overlapping doc subsets: A = even docIDs, B = docIDs % 3 == 0 (their
# shingle sets overlap via the docs in both, plus cross-doc shared 3-grams).
_KMV_EST = f"CAST((retained * {KMV_SPACE}) {{div}} theta AS BIGINT)"
_KMV_ERR = "CAST((abs(est - exact) * 1000) {div} greatest(exact, 1) AS BIGINT)"


def kmv_theta_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(measure, retained, theta, est, exact, err_permille): KMV/theta
    sketch estimates vs exact distinct 3-gram counts for two overlapping
    doc subsets and their union / intersection / difference."""
    sh = _shingle_stream(spark, sf_dir, "doc_id")
    tags = F.array(
        F.when(F.col("doc_id") % 2 == 0, F.lit("a")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("b")),
    )
    tagged = (
        sh.select(F.explode(tags).alias("st"), "shingle")
        .filter(F.col("st").isNotNull())
    )
    hv = tagged.select("st", _hash48(F.col("shingle")).alias("h")).distinct()
    w = W.partitionBy("st").orderBy(F.col("h").asc())
    sk = (
        hv.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K_KMV)
        .select("st", "h")
        .cache()
    )
    per = sk.groupBy("st").agg(
        F.count("*").cast("long").alias("n"),
        F.max("h").cast("long").alias("hmax"),
    ).select(
        "st",
        F.expr(
            f"CASE WHEN n = {K_KMV} THEN hmax"
            f" ELSE CAST({KMV_SPACE} AS BIGINT) END"
        ).alias("theta"),
    )

    # Per-set rows: retained = entries strictly below the set's own theta.
    per_set = (
        sk.join(F.broadcast(per), "st")
        .filter(F.col("h") < F.col("theta"))
        .groupBy("st", "theta")
        .agg(F.count("*").cast("long").alias("retained"))
    )
    exact_set = tagged.groupBy("st").agg(
        F.countDistinct("shingle").cast("long").alias("exact")
    )
    set_rows = per_set.join(exact_set, "st").select(
        F.concat(F.lit("set_"), F.col("st")).alias("measure"),
        "retained",
        "theta",
        F.expr(_KMV_EST.format(div="DIV")).alias("est"),
        "exact",
    )

    # Cross-set rows share theta_u = min(theta_a, theta_b).
    th_u = F.broadcast(per.agg(F.min("theta").cast("long").alias("theta")))
    au = (
        sk.filter(F.col("st") == "a")
        .crossJoin(th_u)
        .filter(F.col("h") < F.col("theta"))
        .select("h")
    )
    bu = (
        sk.filter(F.col("st") == "b")
        .crossJoin(th_u)
        .filter(F.col("h") < F.col("theta"))
        .select("h")
    )
    union_h = au.union(bu).distinct()
    inter_h = au.join(bu, "h", "left_semi")
    anb_h = au.join(bu, "h", "left_anti")

    flags = (
        tagged.distinct()
        .groupBy("shingle")
        .agg(
            F.max((F.col("st") == "a").cast("int")).alias("ia"),
            F.max((F.col("st") == "b").cast("int")).alias("ib"),
        )
    )
    cross_ex = flags.agg(
        F.sum(F.expr("CAST(ia * ib AS BIGINT)")).cast("long").alias("x_inter"),
        F.sum(F.expr("CAST(greatest(ia, ib) AS BIGINT)")).cast("long").alias("x_union"),
        F.sum(F.expr("CAST(ia * (1 - ib) AS BIGINT)")).cast("long").alias("x_anb"),
    )

    def cross_row(name: str, hdf: DataFrame, exact_col: str) -> DataFrame:
        return (
            hdf.agg(F.count("*").cast("long").alias("retained"))
            .crossJoin(th_u)
            .crossJoin(F.broadcast(cross_ex.select(F.col(exact_col).alias("exact"))))
            .select(
                F.lit(name).alias("measure"),
                "retained",
                "theta",
                F.expr(_KMV_EST.format(div="DIV")).alias("est"),
                "exact",
            )
        )

    out = (
        set_rows.unionByName(cross_row("union", union_h, "x_union"))
        .unionByName(cross_row("intersection", inter_h, "x_inter"))
        .unionByName(cross_row("a_not_b", anb_h, "x_anb"))
    )
    return out.select(
        "measure",
        "retained",
        "theta",
        "est",
        "exact",
        F.expr(_KMV_ERR.format(div="DIV")).alias("err_permille"),
    )


SQL_KMV_THETA_EVAL = f"""
WITH sh AS ({_sql_shingle_stream("doc_id")}),
tagged AS (
  SELECT unnest(list_filter([
           CASE WHEN doc_id % 2 = 0 THEN 'a' END,
           CASE WHEN doc_id % 3 = 0 THEN 'b' END], x -> x IS NOT NULL)) AS st,
         shingle
  FROM sh
),
hv AS (SELECT DISTINCT st, {_SQL_HASH48.format(col='shingle')} AS h FROM tagged),
sk AS MATERIALIZED (
  SELECT st, h FROM (
    SELECT st, h, row_number() OVER (PARTITION BY st ORDER BY h) AS rn FROM hv
  ) WHERE rn <= {K_KMV}
),
per AS MATERIALIZED (
  SELECT st,
         CASE WHEN count(*) = {K_KMV} THEN max(h)
              ELSE CAST({KMV_SPACE} AS BIGINT) END AS theta
  FROM sk GROUP BY 1
),
pset AS (
  SELECT s.st, p.theta, CAST(count(*) AS BIGINT) AS retained
  FROM sk s JOIN per p USING (st) WHERE s.h < p.theta GROUP BY 1, 2
),
exset AS (
  SELECT st, CAST(count(DISTINCT shingle) AS BIGINT) AS exact
  FROM tagged GROUP BY 1
),
set_rows AS (
  SELECT 'set_' || st AS measure, retained, theta,
         {_KMV_EST.format(div="//")} AS est, exact
  FROM pset JOIN exset USING (st)
),
thu AS (SELECT CAST(min(theta) AS BIGINT) AS theta FROM per),
au AS (SELECT h FROM sk, thu WHERE st = 'a' AND h < theta),
bu AS (SELECT h FROM sk, thu WHERE st = 'b' AND h < theta),
uni AS (SELECT DISTINCT h FROM (SELECT h FROM au UNION ALL SELECT h FROM bu)),
intr AS (SELECT h FROM au WHERE h IN (SELECT h FROM bu)),
anb AS (SELECT h FROM au WHERE h NOT IN (SELECT h FROM bu)),
flags AS (
  SELECT shingle,
         max(CASE WHEN st = 'a' THEN 1 ELSE 0 END) AS ia,
         max(CASE WHEN st = 'b' THEN 1 ELSE 0 END) AS ib
  FROM tagged GROUP BY 1
),
exc AS (
  SELECT CAST(sum(ia * ib) AS BIGINT) AS x_inter,
         CAST(sum(greatest(ia, ib)) AS BIGINT) AS x_union,
         CAST(sum(ia * (1 - ib)) AS BIGINT) AS x_anb
  FROM flags
),
cross_rows AS (
  SELECT 'union' AS measure,
         (SELECT CAST(count(*) AS BIGINT) FROM uni) AS retained,
         theta, x_union AS exact FROM thu, exc
  UNION ALL
  SELECT 'intersection',
         (SELECT CAST(count(*) AS BIGINT) FROM intr), theta, x_inter
  FROM thu, exc
  UNION ALL
  SELECT 'a_not_b',
         (SELECT CAST(count(*) AS BIGINT) FROM anb), theta, x_anb
  FROM thu, exc
),
allrows AS (
  SELECT measure, retained, theta, est, exact FROM set_rows
  UNION ALL
  SELECT measure, retained, theta, {_KMV_EST.format(div="//")} AS est, exact
  FROM cross_rows
)
SELECT measure, retained, theta, est, exact,
       {_KMV_ERR.format(div="//")} AS err_permille
FROM allrows
"""

QUERIES["kmv_theta_eval"] = (kmv_theta_eval, SQL_KMV_THETA_EVAL)


# ---------------------------------------------- AMQ structure bake-off

# bloom_snapshot_novelty (above) uses one approximate-membership
# structure; this sizes the three standard AMQs against each other at
# the SAME derived capacity and target FPR — the planning query a
# crawler runs before choosing its frontier dedup structure:
#   Bloom   (Bloom 1970):        m = n·k/ln2 bits, k = log2(1/ε)
#   Cuckoo  (Fan et al. 2014):   (log2(1/ε)+3)-bit fingerprints at
#                                α = 0.955 load
#   Quotient(Bender et al. 2012): 2^q slots (next pow2 ≥ n/0.75) of
#                                r+3 bits, r = log2(1/ε)
# ε = 2^-8 keeps every exponent integer. Irrational constants enter as
# FIXED RATIONALS (1/ln2 → 14427/10000; 1/0.955 → 10000/9550; 1/0.75 →
# 10000/7500) so both engines size from exact integer arithmetic — a
# float ln2 at a capacity boundary is exactly the divergence
# derive_bloom_m's bit_length contract exists to prevent. Next-pow2 via
# 1 << length(bin(x−1)) (the integer bit_length idiom).
#
# Scale shape: ONE distinct-count over corpus 2-shingles (the dedup
# spine's cardinality — at 100 TB you would feed the HLL estimate in
# instead, same sizing arithmetic); everything after is a 1-row map.

AMQ_EPS_LOG2 = 8  # ε = 2^-8


def amq_filter_compare(spark, sf_dir):
    """(n_items, bloom_bits, bloom_k, cuckoo_bits, qf_bits,
    bloom_bpi_milli, cuckoo_bpi_milli, qf_bpi_milli): exact integer
    sizing of Bloom vs cuckoo vs quotient filters for the corpus
    2-shingle set at ε = 2^-{AMQ_EPS_LOG2}."""
    from harvester_spark.operators.dedup import _shingles2

    n_df = _shingles2(spark, sf_dir).agg(
        F.countDistinct("shingle").cast("long").alias("n")
    )
    k = AMQ_EPS_LOG2
    f_cuckoo = AMQ_EPS_LOG2 + 3
    r_qf = AMQ_EPS_LOG2 + 3
    return n_df.select(
        F.col("n").alias("n_items"),
        F.expr(f"(n * {k} * 14427) DIV 10000").cast("long").alias("bloom_bits"),
        F.lit(k).cast("long").alias("bloom_k"),
        F.expr(f"((n * 10000) DIV 9550 + 1) * {f_cuckoo}")
        .cast("long")
        .alias("cuckoo_bits"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT),"
            f" length(bin((n * 10000) DIV 7500 - 1))) * {r_qf}"
        )
        .cast("long")
        .alias("qf_bits"),
        F.expr(f"(((n * {k} * 14427) DIV 10000) * 1000) DIV n")
        .cast("long")
        .alias("bloom_bpi_milli"),
        F.expr(f"((((n * 10000) DIV 9550 + 1) * {f_cuckoo}) * 1000) DIV n")
        .cast("long")
        .alias("cuckoo_bpi_milli"),
        F.expr(
            f"((shiftleft(CAST(1 AS BIGINT),"
            f" length(bin((n * 10000) DIV 7500 - 1))) * {r_qf}) * 1000) DIV n"
        )
        .cast("long")
        .alias("qf_bpi_milli"),
    )


def _sql_amq_compare() -> str:
    from harvester_spark.operators.dedup import _SQL_SHINGLES2

    k = AMQ_EPS_LOG2
    f = AMQ_EPS_LOG2 + 3
    return f"""
WITH ns AS (
  SELECT CAST(count(DISTINCT shingle) AS BIGINT) AS n
  FROM ({_SQL_SHINGLES2})
),
sized AS (
  SELECT n,
         CAST((n * {k} * 14427) // 10000 AS BIGINT) AS bloom_bits,
         CAST(((n * 10000) // 9550 + 1) * {f} AS BIGINT) AS cuckoo_bits,
         CAST((CAST(1 AS BIGINT) << length(bin((n * 10000) // 7500 - 1)))
              * {f} AS BIGINT) AS qf_bits
  FROM ns
)
SELECT n AS n_items, bloom_bits, CAST({k} AS BIGINT) AS bloom_k,
       cuckoo_bits, qf_bits,
       CAST((bloom_bits * 1000) // n AS BIGINT) AS bloom_bpi_milli,
       CAST((cuckoo_bits * 1000) // n AS BIGINT) AS cuckoo_bpi_milli,
       CAST((qf_bits * 1000) // n AS BIGINT) AS qf_bpi_milli
FROM sized
"""


QUERIES["amq_filter_compare"] = (amq_filter_compare, _sql_amq_compare())


# ----------------------------------- DGIM sliding-window bit counting

# Datar-Gionis-Indyk-Motwani (SODA 2002): approximate count of 1s in the
# last-W suffix of a bit stream using O(log^2 N) exponentially-sized
# buckets — THE classic bounded-state answer to "how many clicks in the
# last day" that windowed_key_cms / events_hll_sliding do not cover (they
# bound keys/distincts, not suffix bit-counts).
#
# The relational trick that makes a two-engine oracle possible: with
# eager merging (merge the two oldest of a size when a third appears,
# k = 2 buckets max per size), the bucket SIZE multiset after N1 ones is
# the BIJECTIVE BASE-2 representation of N1 — digits d in {1, 2},
# n = SUM d_i 2^i, which exists and is unique for every n >= 1 (digit
# set {1,2} covers each residue mod 2 exactly once, so the greedy
# low-digit choice is forced level by level). Closed form:
#   L = bit_length(N1 + 1) - 1   buckets span levels 0..L-1
#   m = N1 + 1 - 2^L             (0 <= m < 2^L)
#   d_k = 1 + ((m >> k) & 1)     buckets of size 2^k, newest at k = 0
# and since merges only ever combine time-adjacent buckets, bucket
# BOUNDARIES are the cumulative sums: the b-th bucket (newest first)
# covers a contiguous run of ones ending at reverse rank C + 1 (C = ones
# in all newer buckets). The pytest runs the actual streaming algorithm
# and asserts the simulated bucket list equals this closed form.
#
# Query answering (suffix window = the last W hours of the stream): drop
# buckets whose newest 1 is outside the window; estimate = sum of
# surviving sizes minus half the oldest survivor (its tail may hang out
# of the window) — error is confined to that oldest bucket, giving the
# classic <= 50% relative-error guarantee that the eval columns expose
# against the exact recount.
#
# Scale shape (the stratified_quota_sample selection discipline): no
# global row_number — bucket-boundary ranks (only ~2 log2 N1 of them)
# are located via the hour histogram (span-bounded, 720 rows) + driver-
# free cumulative window, and ONLY the <= ~30 boundary hours get an
# intra-hour ranking window. Everything else is one events scan plus
# small-broadcast joins.

DGIM_WINDOWS = [24, 72, 168, 360]  # suffix windows, hours
DGIM_BIT_TYPE = "click"  # the tracked bit


def dgim_window_count_eval(spark, sf_dir):
    """(w_hours, n1_total, exact_ones, dgim_est, n_alive, oldest_size,
    abs_err, err_milli): DGIM suffix-count estimate vs exact recount at
    each window, from the closed-form canonical bucket structure."""
    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("eid"),
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_type"),
    )
    ones = ev.filter(F.col("event_type") == DGIM_BIT_TYPE).select(
        "eid", "hr", "us"
    )
    n1df = F.broadcast(ones.agg(F.count("*").cast("long").alias("n1")))
    mxdf = F.broadcast(ev.agg(F.max("hr").cast("long").alias("mx")))

    # Canonical buckets from the bijective base-2 closed form.
    lv = (
        n1df.select(
            "n1",
            F.expr("CAST(length(bin(n1 + 1)) - 1 AS BIGINT)").alias("lmax"),
        )
        .select(
            "n1",
            F.expr(
                "CAST(n1 + 1 - shiftleft(CAST(1 AS BIGINT), CAST(lmax AS INT))"
                " AS BIGINT)"
            ).alias("m"),
            F.explode(
                F.expr("sequence(CAST(0 AS BIGINT), lmax - 1)")
            ).alias("k"),
        )
        .select(
            F.col("k"),
            F.expr(
                "CAST(1 + shiftright(m, CAST(k AS INT)) % 2 AS BIGINT)"
            ).alias("d"),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)) AS BIGINT)"
            ).alias("sz"),
        )
    )
    wc = W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
    buckets = (
        lv.withColumn(
            "c0", F.coalesce(F.sum(F.col("d") * F.col("sz")).over(wc), F.lit(0))
        )
        .select(
            "sz",
            "c0",
            F.explode(F.expr("sequence(CAST(0 AS BIGINT), d - 1)")).alias("t"),
        )
        .select(
            "sz",
            (F.col("c0") + F.col("t") * F.col("sz") + 1).cast("long").alias("j"),
        )
    )

    # Locate each boundary rank j's hour via the ones-per-hour histogram.
    oh = ones.groupBy("hr").agg(F.count("*").cast("long").alias("cnt"))
    wnew = W.orderBy(F.col("hr").desc()).rowsBetween(W.unboundedPreceding, -1)
    ohc = oh.select(
        "hr",
        "cnt",
        F.coalesce(F.sum("cnt").over(wnew), F.lit(0)).cast("long").alias("newer"),
    )
    tgt = F.broadcast(
        buckets.join(
            ohc,
            (F.col("newer") < F.col("j"))
            & (F.col("j") <= F.col("newer") + F.col("cnt")),
        ).select("sz", "j", "hr", (F.col("j") - F.col("newer")).alias("loc"))
    )
    bhours = F.broadcast(tgt.select("hr").distinct())
    wrk = W.partitionBy("hr").orderBy(F.col("us").desc(), F.col("eid").desc())
    ranked = (
        ones.join(bhours, "hr")
        .withColumn("rn", F.row_number().over(wrk).cast("long"))
        .select("hr", "rn")
    )
    bts = tgt.join(
        ranked, (tgt["hr"] == ranked["hr"]) & (tgt["loc"] == ranked["rn"])
    ).select("sz", "j", tgt["hr"].alias("hr_new"))

    wins = spark.createDataFrame(
        [(w,) for w in DGIM_WINDOWS], "w_hours long"
    )
    alive = (
        bts.crossJoin(F.broadcast(wins))
        .crossJoin(mxdf)
        .filter(F.col("hr_new") > F.col("mx") - F.col("w_hours"))
        .groupBy("w_hours")
        .agg(
            F.count("*").cast("long").alias("n_alive"),
            F.sum("sz").cast("long").alias("tot_sz"),
            F.max_by("sz", "j").cast("long").alias("oldest_size"),
        )
    )
    exact = (
        ohc.crossJoin(F.broadcast(wins))
        .crossJoin(mxdf)
        .filter(F.col("hr") > F.col("mx") - F.col("w_hours"))
        .groupBy("w_hours")
        .agg(F.sum("cnt").cast("long").alias("exact_ones"))
    )
    return (
        wins.join(exact, "w_hours", "left")
        .join(alive, "w_hours", "left")
        .crossJoin(n1df)
        .select(
            "w_hours",
            F.col("n1").alias("n1_total"),
            F.coalesce("exact_ones", F.lit(0)).cast("long").alias("exact_ones"),
            F.expr(
                "CAST(coalesce(tot_sz - oldest_size DIV 2, 0) AS BIGINT)"
            ).alias("dgim_est"),
            F.coalesce("n_alive", F.lit(0)).cast("long").alias("n_alive"),
            F.coalesce("oldest_size", F.lit(0)).cast("long").alias("oldest_size"),
            F.expr(
                "CAST(abs(coalesce(tot_sz - oldest_size DIV 2, 0)"
                " - coalesce(exact_ones, 0)) AS BIGINT)"
            ).alias("abs_err"),
            F.expr(
                "CASE WHEN coalesce(exact_ones, 0) = 0 THEN NULL"
                " ELSE CAST((1000 * abs(coalesce(tot_sz - oldest_size DIV 2, 0)"
                " - exact_ones)) DIV exact_ones AS BIGINT) END"
            ).alias("err_milli"),
        )
    )


def _sql_dgim() -> str:
    wvals = ", ".join(f"({w})" for w in DGIM_WINDOWS)
    return f"""
WITH dev AS (
  SELECT CAST(event_id AS BIGINT) AS eid,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
         epoch_us(ts) AS us, event_type
  FROM events
),
dones AS (
  SELECT eid, hr, us FROM dev WHERE event_type = '{DGIM_BIT_TYPE}'
),
dn1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM dones),
dmx AS (SELECT CAST(max(hr) AS BIGINT) AS mx FROM dev),
dlv AS (
  SELECT k,
         CAST(1 + ((m >> CAST(k AS INT)) & 1) AS BIGINT) AS d,
         CAST((CAST(1 AS BIGINT) << CAST(k AS INT)) AS BIGINT) AS sz
  FROM (
    SELECT CAST(n1 + 1 - (CAST(1 AS BIGINT) << CAST(lmax AS INT))
                AS BIGINT) AS m,
           unnest(range(lmax)) AS k
    FROM (SELECT n1, CAST(length(bin(n1 + 1)) - 1 AS BIGINT) AS lmax
          FROM dn1)
  )
),
dbuck AS (
  SELECT sz, CAST(c0 + t * sz + 1 AS BIGINT) AS j
  FROM (
    SELECT sz,
           CAST(coalesce(sum(d * sz) OVER (ORDER BY k
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS c0,
           unnest(range(d)) AS t
    FROM dlv
  )
),
doh AS (
  SELECT hr, CAST(count(*) AS BIGINT) AS cnt,
         CAST(coalesce(sum(count(*)) OVER (ORDER BY hr DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS newer
  FROM dones GROUP BY hr
),
dtgt AS (
  SELECT b.sz, b.j, o.hr, CAST(b.j - o.newer AS BIGINT) AS loc
  FROM dbuck b JOIN doh o
    ON o.newer < b.j AND b.j <= o.newer + o.cnt
),
dranked AS (
  SELECT hr, CAST(row_number() OVER (PARTITION BY hr
              ORDER BY us DESC, eid DESC) AS BIGINT) AS rn
  FROM dones
  WHERE hr IN (SELECT DISTINCT hr FROM dtgt)
),
dbts AS (
  SELECT t.sz, t.j, t.hr AS hr_new
  FROM dtgt t JOIN dranked r ON t.hr = r.hr AND t.loc = r.rn
),
dwins AS (SELECT CAST(w_hours AS BIGINT) AS w_hours
          FROM (VALUES {wvals}) v(w_hours)),
dalive AS (
  SELECT w.w_hours,
         CAST(count(*) AS BIGINT) AS n_alive,
         CAST(sum(b.sz) AS BIGINT) AS tot_sz,
         CAST(max_by(b.sz, b.j) AS BIGINT) AS oldest_size
  FROM dbts b CROSS JOIN dwins w CROSS JOIN dmx
  WHERE b.hr_new > dmx.mx - w.w_hours
  GROUP BY 1
),
dexact AS (
  SELECT w.w_hours, CAST(sum(o.cnt) AS BIGINT) AS exact_ones
  FROM doh o CROSS JOIN dwins w CROSS JOIN dmx
  WHERE o.hr > dmx.mx - w.w_hours
  GROUP BY 1
)
SELECT w.w_hours, dn1.n1 AS n1_total,
       CAST(coalesce(e.exact_ones, 0) AS BIGINT) AS exact_ones,
       CAST(coalesce(a.tot_sz - a.oldest_size // 2, 0) AS BIGINT)
         AS dgim_est,
       CAST(coalesce(a.n_alive, 0) AS BIGINT) AS n_alive,
       CAST(coalesce(a.oldest_size, 0) AS BIGINT) AS oldest_size,
       CAST(abs(coalesce(a.tot_sz - a.oldest_size // 2, 0)
            - coalesce(e.exact_ones, 0)) AS BIGINT) AS abs_err,
       CASE WHEN coalesce(e.exact_ones, 0) = 0 THEN NULL
            ELSE CAST((1000 * abs(coalesce(a.tot_sz - a.oldest_size // 2, 0)
                 - e.exact_ones)) // e.exact_ones AS BIGINT) END AS err_milli
FROM dwins w
LEFT JOIN dexact e USING (w_hours)
LEFT JOIN dalive a USING (w_hours)
CROSS JOIN dn1
"""


QUERIES["dgim_window_count_eval"] = (dgim_window_count_eval, _sql_dgim())


# ------------------------------------- AMS second frequency moment (F2)

# Alon-Matias-Szegedy (STOC 1996, Gödel Prize 2005): estimate
# F2 = SUM_i f_i^2 (the self-join size / repeat-rate of the user_id
# frequency vector) from R four-wise-independent +/-1 hash projections —
# the sketch family that complements HLL (F0) and CMS (point queries)
# with the MOMENT estimate a join-size planner needs. Per replicate r,
# S_r = SUM_i sigma_r(i) f_i and X_r = S_r^2 has E[X] = F2,
# Var[X] <= 2 F2^2; means of G groups then the median of group means
# gives the classic accuracy boost. Here sigma_r(i) is the md5 parity
# bit of 'ams<r>|<user_id>' mapped to +/-1.
#
# Everything integer: S_r is an exact int64 (|S_r| <= n_events), X_r =
# S_r^2 <= 1e10 at gated scales, group means are floored DIV, and the
# median of the G group means is the exact (G+1) DIV 2 order statistic
# (unique tie-break on group id). The pytest recomputes every replicate
# from the parquet + the same hash and pins all outputs exactly;
# measured err_milli at the gated scales: 119 / 409 / 104 (sf0.001 /
# 0.01 / 0.1), pinned <= 600. The user frequency vector is NEAR-UNIFORM
# (f_i ~ n/users), so X_r/F2 is ~chi^2(1) — the worst case for
# single-replicate concentration; the pinned envelope is honest AMS
# behavior at R = 96, not a flattered constant.
#
# Scale shape: ONE groupBy(user_id) shuffle builds the frequency vector;
# the replicate dimension (R = 96 rows) is a broadcast crossJoin on the
# per-user frame (users-sized, not events-sized); everything after is
# R-sized. At 100 TB the frequency frame is the only big intermediate
# and it already exists for any heavy-hitter analysis.

AMS_REPS = 96
AMS_GROUPS = 12  # median over 12 means of 8 replicates each


def events_f2_ams_eval(spark, sf_dir):
    """(n_users, n_events, f2_exact, n_reps, n_groups, est_med_means,
    abs_err, err_milli): AMS sketch estimate of F2 over user_id
    frequencies vs the exact second moment."""
    from harvester_spark.operators.graph import _hash56

    freq = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("f"))
    )
    reps = F.broadcast(
        spark.range(AMS_REPS).select(F.col("id").cast("long").alias("r"))
    )
    sig = (
        2
        * (
            _hash56(
                F.concat(
                    F.lit("ams"),
                    F.col("r").cast("string"),
                    F.lit("|"),
                    F.col("user_id").cast("string"),
                )
            )
            % 2
        )
        - 1
    ).cast("long")
    per = (
        freq.crossJoin(reps)
        .select("r", (sig * F.col("f")).alias("sf"))
        .groupBy("r")
        .agg(F.sum("sf").cast("long").alias("s"))
    )
    gsz = AMS_REPS // AMS_GROUPS
    gm = (
        per.select(
            (F.col("r") / gsz).cast("long").alias("g"),
            (F.col("s") * F.col("s")).alias("x"),
        )
        .groupBy("g")
        .agg(F.expr(f"CAST(sum(x) DIV {gsz} AS BIGINT)").alias("mx"))
    )
    wmed = W.orderBy("mx", "g")
    med = (
        gm.withColumn("rn", F.row_number().over(wmed))
        .filter(F.col("rn") == (AMS_GROUPS + 1) // 2)
        .select(F.col("mx").alias("est_med_means"))
    )
    tot = freq.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("f").cast("long").alias("n_events"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("f2_exact"),
    )
    return (
        tot.crossJoin(F.broadcast(med))
        .select(
            "n_users",
            "n_events",
            "f2_exact",
            F.lit(AMS_REPS).cast("long").alias("n_reps"),
            F.lit(AMS_GROUPS).cast("long").alias("n_groups"),
            "est_med_means",
            F.expr("CAST(abs(est_med_means - f2_exact) AS BIGINT)").alias(
                "abs_err"
            ),
            F.expr(
                "CAST((1000 * abs(est_med_means - f2_exact)) DIV f2_exact"
                " AS BIGINT)"
            ).alias("err_milli"),
        )
    )


def _sql_f2_ams() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    h = _SQL_HASH56.format(
        col="'ams' || CAST(r AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)"
    )
    gsz = AMS_REPS // AMS_GROUPS
    return f"""
WITH afreq AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS f FROM events GROUP BY 1
),
areps AS (SELECT unnest(range({AMS_REPS})) AS r),
aper AS (
  SELECT r, CAST(sum((2 * ({h} % 2) - 1) * f) AS BIGINT) AS s
  FROM afreq CROSS JOIN areps GROUP BY 1
),
agm AS (
  SELECT r // {gsz} AS g, CAST(sum(s * s) // {gsz} AS BIGINT) AS mx
  FROM aper GROUP BY 1
),
amed AS (
  SELECT mx AS est_med_means FROM (
    SELECT mx, row_number() OVER (ORDER BY mx, g) AS rn FROM agm
  ) WHERE rn = ({AMS_GROUPS} + 1) // 2
),
atot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(f) AS BIGINT) AS n_events,
         CAST(sum(f * f) AS BIGINT) AS f2_exact
  FROM afreq
)
SELECT n_users, n_events, f2_exact,
       CAST({AMS_REPS} AS BIGINT) AS n_reps,
       CAST({AMS_GROUPS} AS BIGINT) AS n_groups,
       est_med_means,
       CAST(abs(est_med_means - f2_exact) AS BIGINT) AS abs_err,
       CAST((1000 * abs(est_med_means - f2_exact)) // f2_exact AS BIGINT)
         AS err_milli
FROM atot CROSS JOIN amed
"""


QUERIES["events_f2_ams_eval"] = (events_f2_ams_eval, _sql_f2_ams())


# -------------------------------- Count-Sketch vs CMS point queries

# Charikar-Chen-Farach-Colton (ICALP 2002) Count-Sketch: the SIGNED
# cousin of Count-Min — each row hashes keys to CSK_W buckets AND
# multiplies by a +/-1 key sign, the row estimate is sign * counter,
# and the sketch estimate is the MEDIAN over CSK_D rows. Where CMS
# collisions always ADD (one-sided overestimate, min-over-rows), CS
# collisions cancel in expectation (unbiased, median-over-rows). This
# operator materializes that contrast on the corpus term-frequency
# vector with DELIBERATELY tiny width (31 vocabulary types into
# CSK_W = 8 buckets — collisions by construction, the hll_error_eval
# small-register discipline): per term, the true cf, the CMS estimate,
# and the CS estimate from the SAME bucket hashes.
#
# Structural pins (test): est_cms >= cf for EVERY term (the Count-Min
# theorem — exact, no slack); the CS median is the exact 3rd-of-5 order
# statistic; and on this skewed vector the signed sketch's total
# absolute error beats the one-sided sketch's (measured contrast, the
# operator's reason to exist).
#
# Integer: counters are exact int64 signed sums of cf (<= corpus token
# count); the median needs no tie-break (it is a VALUE order statistic
# over 5 integers). Scale shape: one token scan -> term cf; everything
# after is (vocab x CSK_D)-sized.

CSK_W = 8  # buckets per row (tiny on purpose: force collisions)
CSK_D = 5  # rows (odd: exact median)


def countsketch_point_eval(spark, sf_dir):
    """(term, cf_true, est_cms, est_cs, cms_err, cs_err): Count-Min vs
    Count-Sketch point-frequency estimates per vocabulary term from
    shared-width rows over the corpus term-frequency vector."""
    from harvester_spark.operators.graph import _hash56

    toks = doc_tokens(spark, sf_dir)
    cf = toks.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    rows = F.broadcast(
        spark.range(CSK_D).select(F.col("id").cast("long").alias("rw"))
    )
    keyed = cf.crossJoin(rows).select(
        "term",
        "cf",
        "rw",
        (
            _hash56(
                F.concat(F.lit("cb"), F.col("rw").cast("string"), F.lit("|"), F.col("term"))
            )
            % CSK_W
        ).cast("long").alias("bkt"),
        (
            2
            * (
                _hash56(
                    F.concat(
                        F.lit("cs"), F.col("rw").cast("string"), F.lit("|"), F.col("term")
                    )
                )
                % 2
            )
            - 1
        ).cast("long").alias("sg"),
    )
    counters = keyed.groupBy("rw", "bkt").agg(
        F.sum("cf").cast("long").alias("c_cms"),
        F.sum(F.col("sg") * F.col("cf")).cast("long").alias("c_cs"),
    )
    per = keyed.join(counters, ["rw", "bkt"]).select(
        "term",
        "cf",
        "rw",
        "c_cms",
        (F.col("sg") * F.col("c_cs")).cast("long").alias("est_row"),
    )
    wmed = W.partitionBy("term").orderBy("est_row", "rw")
    agg = (
        per.withColumn("rn", F.row_number().over(wmed))
        .groupBy("term")
        .agg(
            F.min("cf").cast("long").alias("cf_true"),
            F.min("c_cms").cast("long").alias("est_cms"),
            F.min(
                F.when(F.col("rn") == (CSK_D + 1) // 2, F.col("est_row"))
            )
            .cast("long")
            .alias("est_cs"),
        )
    )
    return agg.select(
        "term",
        "cf_true",
        "est_cms",
        "est_cs",
        (F.col("est_cms") - F.col("cf_true")).cast("long").alias("cms_err"),
        F.expr("CAST(abs(est_cs - cf_true) AS BIGINT)").alias("cs_err"),
    )


def _sql_countsketch() -> str:
    from harvester_spark.operators.graph import _SQL_HASH56

    hb = _SQL_HASH56.format(col="'cb' || CAST(rw AS VARCHAR) || '|' || term")
    hs = _SQL_HASH56.format(col="'cs' || CAST(rw AS VARCHAR) || '|' || term")
    return f"""
WITH kt AS ({SQL_DOC_TOKS}),
kcf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM kt GROUP BY 1
),
krw AS (SELECT unnest(range({CSK_D})) AS rw),
kkey AS (
  SELECT term, cf, rw,
         CAST({hb} % {CSK_W} AS BIGINT) AS bkt,
         CAST(2 * ({hs} % 2) - 1 AS BIGINT) AS sg
  FROM kcf CROSS JOIN krw
),
kcnt AS (
  SELECT rw, bkt,
         CAST(sum(cf) AS BIGINT) AS c_cms,
         CAST(sum(sg * cf) AS BIGINT) AS c_cs
  FROM kkey GROUP BY 1, 2
),
kper AS (
  SELECT k.term, k.cf, k.rw, c.c_cms,
         CAST(k.sg * c.c_cs AS BIGINT) AS est_row,
         row_number() OVER (PARTITION BY k.term
                            ORDER BY k.sg * c.c_cs, k.rw) AS rn
  FROM kkey k JOIN kcnt c USING (rw, bkt)
),
kagg AS (
  SELECT term,
         CAST(min(cf) AS BIGINT) AS cf_true,
         CAST(min(c_cms) AS BIGINT) AS est_cms,
         CAST(min(CASE WHEN rn = ({CSK_D} + 1) // 2 THEN est_row END)
              AS BIGINT) AS est_cs
  FROM kper GROUP BY 1
)
SELECT term, cf_true, est_cms, est_cs,
       CAST(est_cms - cf_true AS BIGINT) AS cms_err,
       CAST(abs(est_cs - cf_true) AS BIGINT) AS cs_err
FROM kagg
"""


QUERIES["countsketch_point_eval"] = (countsketch_point_eval, _sql_countsketch())


# ------------------------------------------------ learned Bloom filter

# Learned Bloom filter sizing (Kraska et al., "The Case for Learned
# Index Structures", SIGMOD 2018 §5, with Mitzenmacher's (NeurIPS 2018)
# corrected accounting): a score model front-ends the membership filter
# — queries scoring >= tau are answered "present" directly, and only the
# KEYS the model misses (score < tau) go into a small backup Bloom
# filter. With the overall false-positive budget p = 2^-{LB_PLAIN_K}
# split evenly, tau is set where the model's own non-key pass rate is
# p/2 (an exact order statistic over the integer score histogram) and
# the backup filter is sized at eps = 2^-{LB_BACKUP_K}; the learned
# stack wins exactly when backup_bits undercuts the plain Bloom at p by
# more than the model costs — reported as budget_bits, the break-even
# model size (the learned_index_error_eval framing: structure quality
# measured as the budget it buys, no float anywhere).
#
# Planted-model construction (the ranker_calibration_ece discipline —
# one informative plant, one uninformative negative control): keys are
# an md5 coin over doc_id; the 'informative' model score adds a planted
# [LB_LIFT, 2*LB_LIFT) lift on keys (overlapping distributions — the
# model is deliberately imperfect, so a real backup-set remains), the
# 'uninformative' model scores keys and non-keys identically, which
# MUST drive budget_bits negative (nearly every key falls below tau
# while the backup runs at the tighter eps) — pinned by
# tests/test_session16_ops.py. Both scores are pure functions of the
# element (membership itself is md5(doc_id)), so the plant is
# deterministic and engine-identical.
#
# Scale shape: one scan -> integer score histogram (score domain is
# bounded by construction) -> one cumsum window over <= 2000 rows for
# tau; every count/size is an exact int64 (the amq_filter_compare
# 14427/10000 bits-per-key rational).

LB_PLAIN_K = 6  # plain Bloom at p = 2^-6
LB_BACKUP_K = 7  # backup Bloom at eps = 2^-7 (half the budget)
LB_FPR_DEN = 128  # model non-key pass budget = n_nonkeys DIV 128
LB_BASE = 1000  # base score domain [0, 1000)
LB_LIFT = 400  # planted key lift: + [400, 800)


def learned_bloom_eval(spark, sf_dir):
    """(model, n_keys, n_nonkeys, tau, n_pass_nonkey, fpr_model_milli,
    n_backup, backup_bits, plain_bits, budget_bits, learned_wins):
    exact learned-vs-plain Bloom sizing for the informative and
    uninformative planted models."""
    ids = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("x")
    )
    base = ids.select(
        "x",
        (_hash56(F.concat(F.lit("mem|"), F.col("x"))) % 2 == 0).alias("is_key"),
        (_hash56(F.concat(F.lit("lb|"), F.col("x"))) % LB_BASE).alias("s0"),
        (
            LB_LIFT + _hash56(F.concat(F.lit("ll|"), F.col("x"))) % LB_LIFT
        ).alias("lift"),
    )
    scored = base.select(
        F.lit("informative").alias("model"),
        "is_key",
        (F.col("s0") + F.when(F.col("is_key"), F.col("lift")).otherwise(0))
        .cast("long")
        .alias("s"),
    ).unionByName(
        base.select(
            F.lit("uninformative").alias("model"),
            "is_key",
            F.col("s0").cast("long").alias("s"),
        )
    )
    hist = scored.groupBy("model", "s").agg(
        F.sum(F.when(F.col("is_key"), 1).otherwise(0)).cast("long").alias("nk"),
        F.sum(F.when(F.col("is_key"), 0).otherwise(1)).cast("long").alias("nn"),
    )
    wge = (
        W.partitionBy("model")
        .orderBy(F.col("s").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.withColumn("nn_ge", F.sum("nn").over(wge))
    tot = scored.groupBy("model").agg(
        F.sum(F.when(F.col("is_key"), 1).otherwise(0)).cast("long").alias("n_keys"),
        F.sum(F.when(F.col("is_key"), 0).otherwise(1))
        .cast("long")
        .alias("n_nonkeys"),
    )
    tau = (
        cum.join(tot, "model")
        .filter(F.col("nn_ge") <= F.expr(f"n_nonkeys DIV {LB_FPR_DEN}"))
        .groupBy("model")
        .agg(F.min("s").cast("long").alias("tau"))
    )
    sides = (
        scored.join(tau, "model")
        .groupBy("model", "tau")
        .agg(
            F.sum(F.when(~F.col("is_key") & (F.col("s") >= F.col("tau")), 1).otherwise(0))
            .cast("long")
            .alias("n_pass_nonkey"),
            F.sum(F.when(F.col("is_key") & (F.col("s") < F.col("tau")), 1).otherwise(0))
            .cast("long")
            .alias("n_backup"),
        )
    )
    return (
        sides.join(tot, "model")
        .select(
            "model",
            "n_keys",
            "n_nonkeys",
            "tau",
            "n_pass_nonkey",
            F.expr("CAST(1000 * n_pass_nonkey DIV n_nonkeys AS BIGINT)").alias(
                "fpr_model_milli"
            ),
            "n_backup",
            F.expr(f"CAST((n_backup * {LB_BACKUP_K} * 14427) DIV 10000 AS BIGINT)")
            .alias("backup_bits"),
            F.expr(f"CAST((n_keys * {LB_PLAIN_K} * 14427) DIV 10000 AS BIGINT)")
            .alias("plain_bits"),
        )
        .withColumn("budget_bits", (F.col("plain_bits") - F.col("backup_bits")).cast("long"))
        .withColumn("learned_wins", F.col("budget_bits") > 0)
        .orderBy("model")
    )


def _sql_learned_bloom() -> str:
    hm = _SQL_HASH56.format(col="'mem|' || x")
    hb = _SQL_HASH56.format(col="'lb|' || x")
    hl = _SQL_HASH56.format(col="'ll|' || x")
    return f"""
WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS x FROM documents),
base AS (
  SELECT x, ({hm} % 2 = 0) AS is_key,
         {hb} % {LB_BASE} AS s0,
         {LB_LIFT} + {hl} % {LB_LIFT} AS lift
  FROM ids
),
scored AS (
  SELECT 'informative' AS model, is_key,
         CAST(s0 + CASE WHEN is_key THEN lift ELSE 0 END AS BIGINT) AS s
  FROM base
  UNION ALL
  SELECT 'uninformative', is_key, CAST(s0 AS BIGINT) FROM base
),
hist AS (
  SELECT model, s,
         CAST(sum(CASE WHEN is_key THEN 1 ELSE 0 END) AS BIGINT) AS nk,
         CAST(sum(CASE WHEN is_key THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM scored GROUP BY 1, 2
),
cum AS (
  SELECT model, s, nn,
         sum(nn) OVER (PARTITION BY model ORDER BY s DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS nn_ge
  FROM hist
),
tot AS (
  SELECT model,
         CAST(sum(CASE WHEN is_key THEN 1 ELSE 0 END) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN is_key THEN 0 ELSE 1 END) AS BIGINT) AS n_nonkeys
  FROM scored GROUP BY 1
),
tau AS (
  SELECT c.model, CAST(min(c.s) AS BIGINT) AS tau
  FROM cum c JOIN tot t USING (model)
  WHERE c.nn_ge <= t.n_nonkeys // {LB_FPR_DEN}
  GROUP BY 1
),
sides AS (
  SELECT s.model, u.tau,
         CAST(sum(CASE WHEN NOT s.is_key AND s.s >= u.tau THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pass_nonkey,
         CAST(sum(CASE WHEN s.is_key AND s.s < u.tau THEN 1 ELSE 0 END)
              AS BIGINT) AS n_backup
  FROM scored s JOIN tau u USING (model)
  GROUP BY 1, 2
)
SELECT d.model, t.n_keys, t.n_nonkeys, d.tau, d.n_pass_nonkey,
       CAST(1000 * d.n_pass_nonkey // t.n_nonkeys AS BIGINT)
         AS fpr_model_milli,
       d.n_backup,
       CAST((d.n_backup * {LB_BACKUP_K} * 14427) // 10000 AS BIGINT)
         AS backup_bits,
       CAST((t.n_keys * {LB_PLAIN_K} * 14427) // 10000 AS BIGINT)
         AS plain_bits,
       CAST((t.n_keys * {LB_PLAIN_K} * 14427) // 10000
            - (d.n_backup * {LB_BACKUP_K} * 14427) // 10000 AS BIGINT)
         AS budget_bits,
       ((t.n_keys * {LB_PLAIN_K} * 14427) // 10000
        - (d.n_backup * {LB_BACKUP_K} * 14427) // 10000) > 0
         AS learned_wins
FROM sides d JOIN tot t USING (model)
ORDER BY d.model
"""


QUERIES["learned_bloom_eval"] = (learned_bloom_eval, _sql_learned_bloom())


# ------------------------------------------ HLL++ sparse/dense switch

# The HyperLogLog++ representation switch (Heule, Nunkesser & Hall,
# EDBT 2013 §5): below the switch point the register file is stored
# SPARSELY as (index, rho) pairs (4 bytes/pair here — the paper's
# packed 25-bit encoding rounded to the byte, documented) and
# promoted to the DENSE 2^P x 6-bit array exactly when the sparse
# form outgrows it; while sparse, cardinality is estimated by
# LinearCounting over the register indices (exact in expectation at
# these loads), not the HLL harmonic mean. The operator profiles the
# corpus 2-shingle stream at doc-prefix cuts: with P = {HS_P} the
# sparse form wins the small cuts and the promotion lands mid-profile
# (measured cut-16 sparse 1948 B vs cut-64 dense 3132 B at sf0.001 —
# both regimes appear at EVERY scale because the 31-type vocabulary
# saturates the shingle space, the CLAUDE.md degenerate-vocabulary
# fact used here deliberately as a stabilizer).
#
# Determinism: n_items / n_idx are exact distinct counts over the md5
# register hash; the LinearCounting estimate is ONE shared
# micro-floor ln string (m - n_idx > 0 structurally: the shingle
# space saturates far below m).
#
# Scale shape: per cut one distinct-agg over the (pushed-down)
# doc-prefix scan; the cut frame is 4 rows.

HS_P = 12  # 2^12 = 4096 registers
HS_CUTS = (4, 16, 64, 256)
_HS_M = 1 << HS_P
_HS_LC = (
    f"CAST(round(1.0e6 * {_HS_M} * ln({_HS_M}.0e0 / ({_HS_M} - n_idx)), 0)"
    " AS BIGINT)"
)


def hll_sparse_dense_switch(spark, sf_dir):
    """(cut_docs, n_items, n_idx, sparse_bytes, dense_bytes, rep,
    est_lc_micro): HLL++ representation sizing and the LinearCounting
    estimate at doc-prefix cuts of the 2-shingle stream."""
    from harvester_spark.operators.dedup import _shingles2

    sh = _shingles2(spark, sf_dir).cache()
    dense_bytes = _HS_M * 6 // 8
    out = None
    for cut in HS_CUTS:
        agg = (
            sh.filter(F.col("doc_id") < cut)
            .select("shingle")
            .distinct()
            .agg(
                F.count("*").cast("long").alias("n_items"),
                F.countDistinct(
                    _hash56(F.concat(F.lit("hs|"), F.col("shingle"))) % _HS_M
                )
                .cast("long")
                .alias("n_idx"),
            )
        )
        row = agg.select(
            F.lit(cut).cast("long").alias("cut_docs"),
            "n_items",
            "n_idx",
            (F.col("n_idx") * 4).cast("long").alias("sparse_bytes"),
            F.lit(dense_bytes).cast("long").alias("dense_bytes"),
            F.expr(
                f"CASE WHEN n_idx * 4 <= {dense_bytes}"
                " THEN 'sparse' ELSE 'dense' END"
            ).alias("rep"),
            F.expr(_HS_LC).alias("est_lc_micro"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("cut_docs")


def _sql_hll_switch() -> str:
    from harvester_spark.operators.dedup import _SQL_SHINGLES2

    dense_bytes = _HS_M * 6 // 8
    h = _SQL_HASH56.format(col="'hs|' || shingle")
    rows = []
    for cut in HS_CUTS:
        rows.append(
            f"""
  SELECT CAST({cut} AS BIGINT) AS cut_docs,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(count(DISTINCT {h} % {_HS_M}) AS BIGINT) AS n_idx
  FROM (SELECT DISTINCT shingle FROM shx WHERE doc_id < {cut})"""
        )
    union = "\n  UNION ALL".join(rows)
    return f"""
WITH shx AS ({_SQL_SHINGLES2}),
cuts AS ({union})
SELECT cut_docs, n_items, n_idx,
       CAST(n_idx * 4 AS BIGINT) AS sparse_bytes,
       CAST({dense_bytes} AS BIGINT) AS dense_bytes,
       CASE WHEN n_idx * 4 <= {dense_bytes} THEN 'sparse' ELSE 'dense' END
         AS rep,
       {_HS_LC} AS est_lc_micro
FROM cuts
ORDER BY cut_docs
"""


QUERIES["hll_sparse_dense_switch"] = (
    hll_sparse_dense_switch,
    _sql_hll_switch(),
)
