"""SPIMI-style partition-parallel inverted index build.

Pipeline (SURVEY.md §3.1 Spark rebuild / §4 custom-work list)::

    documents(doc_id, text, lang, doc_len)
      ├─ doc_stats(doc_id, lang, doc_len), corpus_stats(lang, n_docs, avgdl)
      ├─ head-term estimation from a seeded sample → (term, lang, n_splits)
      ├─ mapInPandas tokenize + per-doc term counts      (Arrow, no per-row Python)
      │    → postings_rows(term, lang, doc_id, tf, doc_len)
      ├─ postings blocks: SALTED hash shuffle on (lang, term, chunk) where
      │    chunk = floor(doc_id·n_splits/N) for head terms (contiguous,
      │    non-overlapping docID ranges — deterministic, no sampling job)
      │    → sortWithinPartitions(lang, term, doc_id) → run-aware block
      │    encoder (delta+varbyte, block 128, per-block max docID / max tf /
      │    max impact). No reducer ever holds a full head-term posting list.
      ├─ dictionary: JVM agg over block metadata (df=Σn, cf=Σblock_sum_tf)
      │    + derived 'all'-index rows (per-language + combined semantics,
      │    /root/reference/harvester/search/tasks/index.py:38-41)
      └─ lineage(build stage × partition metrics) — resumability contract

    (:func:`build_dictionary` keeps the classic salted two-phase aggregation
    over raw posting rows as an alternative path; the block-metadata
    derivation shuffles 128× less.)

Resumability: every stage writes to its own directory under ``index_dir`` and
is skipped on rebuild when its ``_SUCCESS`` marker exists (the anti-join-
completed pattern of /root/reference/harvester/core/processors/pipeline/
base.py:100-101). The postings stage can additionally be sharded by
``pmod(doc_id, n_shards)``; each shard commits independently, so a killed
build restarts at the first incomplete shard.
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from harvester_spark.analysis import ALL_LANG, tokenize_series
from harvester_spark.index.codec import BLOCK_SIZE, encode_blocks
from harvester_spark.search.bm25 import tf_norm

POSTINGS_ROWS_SCHEMA = (
    "term string, lang string, doc_id long, tf int, doc_len int, "
    "positions binary"
)
POSTINGS_SCHEMA = (
    "lang string, term string, base_doc_id long, max_doc_id long, n int, "
    "doc_deltas binary, tfs binary, block_max_tf int, block_sum_tf long, "
    "impact_lang double, impact_all double, positions binary"
)
LINEAGE_SCHEMA = (
    "build_id string, stage string, partition_id int, n_rows long, "
    "started_at double, finished_at double, status string"
)
N_SALT = 16

# "not provided" sentinel for precomputed_head_terms (None is a valid value
# meaning "no head terms in this corpus")
_UNSET = object()


def postings_rows(
    documents: DataFrame, decompound_words=None, common_gram_terms=None
) -> DataFrame:
    """documents → (term, lang, doc_id, tf, doc_len, positions).

    Vectorized tokenize + positional grouping with NO pandas groupby and NO
    per-posting Python objects: the flattened (doc, term-code, pos) triples
    are lexsorted once, group boundaries found with one comparison pass,
    tf = boundary diffs, and the per-posting ascending position lists are
    varbyte-encoded MAP-SIDE in one vectorized pass
    (:func:`encode_positions_per_posting`) and shipped as a ``binary``
    column built zero-copy over the single encoded buffer. Positions cross
    the build shuffle at ~1 byte/position instead of 4-byte int32 lists —
    the build's heaviest exchange (round-4: cuts shuffle+sort memory
    traffic ~4× on the positions payload, the scaling-efficiency-critical
    stage) — and the reduce-side block encoder assembles block blobs by
    byte slicing, byte-identical to the former reduce-side
    ``encode_positions``. Positions are the analyzer's 0-based token
    indices — the phrase-query substrate.

    ``decompound_words``: optional Dutch dictionary (iterable of words).
    When set, ``nl`` documents get dictionary sub-words APPENDED at the
    compound token's position — Lucene ``DictionaryCompoundWordTokenFilter``
    semantics behind the reference's OPENSEARCH_ENABLE_DECOMPOUND_ANALYZERS
    flag (/root/reference/harvester/search/models/index.py:173-188).
    ``doc_len`` stays the canonical token count (norms are unaffected by
    stacked sub-words).

    ``common_gram_terms``: optional frequent-term list (the Lucene/ES
    common-grams model — the list is configuration, typically the previous
    build's head terms). Adjacent pairs of listed terms additionally emit a
    bigram token ``"a b"`` at the FIRST term's position, turning
    head∧head exact-phrase queries from a ~full-corpus positions decode
    into a rare-term lookup. Bigrams derive from the ORIGINAL token stream
    (never from stacked decompound sub-words), contain a space so the
    analyzer can never produce them from query text, and are excluded from
    scoring/suggestion surfaces (phrase matching is their only consumer).
    """
    import itertools

    import pyarrow as pa

    words_bc = None
    if decompound_words:
        words_bc = documents.sparkSession.sparkContext.broadcast(
            frozenset(decompound_words)
        )
    cg_bc = None
    if common_gram_terms:
        cg_bc = documents.sparkSession.sparkContext.broadcast(
            frozenset(common_gram_terms)
        )

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("lang", pa.string()),
            ("doc_id", pa.int64()),
            ("tf", pa.int32()),
            ("doc_len", pa.int32()),
            ("positions", pa.binary()),
        ]
    )

    def explode_counts(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            if rb.num_rows == 0:
                continue
            pdf = rb.to_pandas()
            tokens = tokenize_series(pdf["text"])
            orig_tokens = tokens
            pos_override = None
            if words_bc is not None:
                # flag-gated nl decompound expansion: sub-words appended at
                # the compound's position (stacked tokens, Lucene-style)
                from harvester_spark.decompound import decompound_token

                words = words_bc.value
                langs = pdf["lang"].values
                new_tokens, pos_override = [], []
                for i, ts in enumerate(tokens):
                    if langs[i] == "nl":
                        tt, pp = [], []
                        for p, t in enumerate(ts):
                            for w in decompound_token(t, words):
                                tt.append(w)
                                pp.append(p)
                        new_tokens.append(tt)
                        pos_override.append(np.asarray(pp, np.int32))
                    else:
                        new_tokens.append(ts)
                        pos_override.append(
                            np.arange(len(ts), dtype=np.int32)
                        )
                tokens = new_tokens
            counts = np.fromiter((len(t) for t in tokens), np.int64, len(tokens))
            total = int(counts.sum())
            if total == 0:
                continue
            doc_rep = np.repeat(np.arange(len(pdf)), counts)
            flat_terms = np.fromiter(
                itertools.chain.from_iterable(tokens), dtype=object, count=total
            )
            if pos_override is not None:
                pos = np.concatenate(pos_override).astype(np.int32)
            else:
                before = np.concatenate(([0], np.cumsum(counts)[:-1]))
                pos = (np.arange(total) - np.repeat(before, counts)).astype(np.int32)
            if cg_bc is not None:
                # common-grams bigrams from the ORIGINAL stream (consecutive
                # positions by construction — adjacency is doc equality)
                if pos_override is not None:
                    counts_o = np.fromiter(
                        (len(t) for t in orig_tokens), np.int64, len(orig_tokens)
                    )
                    total_o = int(counts_o.sum())
                    doc_rep_o = np.repeat(np.arange(len(pdf)), counts_o)
                    flat_o = np.fromiter(
                        itertools.chain.from_iterable(orig_tokens),
                        dtype=object,
                        count=total_o,
                    )
                    before_o = np.concatenate(([0], np.cumsum(counts_o)[:-1]))
                    pos_o = (
                        np.arange(total_o) - np.repeat(before_o, counts_o)
                    ).astype(np.int32)
                else:
                    doc_rep_o, flat_o, pos_o = doc_rep, flat_terms, pos
                if flat_o.size >= 2:
                    member = pd.Index(flat_o).isin(cg_bc.value)
                    adj = member[:-1] & member[1:] & (doc_rep_o[:-1] == doc_rep_o[1:])
                    bidx = np.flatnonzero(adj)
                    if bidx.size:
                        bi = (
                            pd.Series(flat_o[bidx]).astype(str)
                            + " "
                            + pd.Series(flat_o[bidx + 1]).astype(str)
                        ).to_numpy(dtype=object)
                        doc_rep = np.concatenate([doc_rep, doc_rep_o[bidx]])
                        flat_terms = np.concatenate([flat_terms, bi])
                        pos = np.concatenate([pos, pos_o[bidx]])
                        total = flat_terms.size
            codes, uniq = pd.factorize(flat_terms, sort=False)
            order = np.lexsort((pos, codes, doc_rep))
            d_s, c_s, p_s = doc_rep[order], codes[order], pos[order]
            boundary = np.empty(total, dtype=bool)
            boundary[0] = True
            boundary[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
            starts = np.flatnonzero(boundary)
            tf = np.diff(np.append(starts, total))
            first = d_s[starts]
            from harvester_spark.index.codec import encode_positions_per_posting

            blob, boff = encode_positions_per_posting(p_s, tf)
            pos_arr = pa.Array.from_buffers(
                pa.binary(),
                len(starts),
                [None, pa.py_buffer(boff.astype(np.int32)), pa.py_buffer(blob)],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(uniq[c_s[starts]], type=pa.string()),
                    pa.array(pdf["lang"].values[first], type=pa.string()),
                    pa.array(pdf["doc_id"].values[first], type=pa.int64()),
                    pa.array(tf.astype(np.int32), type=pa.int32()),
                    pa.array(
                        pdf["doc_len"].values[first].astype(np.int32), type=pa.int32()
                    ),
                    pos_arr,
                ],
                schema=out_schema,
            )

    return documents.select("doc_id", "text", "lang", "doc_len").mapInArrow(
        explode_counts, POSTINGS_ROWS_SCHEMA
    )


def dictionary_from_blocks(postings: DataFrame) -> DataFrame:
    """(term, lang) → df, cf derived from block metadata — a JVM aggregation
    over block rows (≈ postings/128), replacing a second full shuffle of raw
    posting rows. ``df = Σ n``, ``cf = Σ block_sum_tf`` per term; combined
    'all'-index rows are the per-language sums
    (per-language + combined index semantics,
    /root/reference/harvester/search/tasks/index.py:38-41).

    Single-exchange plan (round-5): each block row is exploded into its own
    language plus the combined '{ALL}' index, then ONE range exchange on
    (lang, tlen, term) feeds both the aggregation (range clustering on the
    full grouping key satisfies the group's distribution — no second
    exchange) and the sorted, row-group-pruned layout serving probes rely
    on (IndexSearcher.dict_probe: prefix / edit-distance-band / exact-term
    probes stay O(probe), not O(vocabulary)). The former plan cost three
    jobs per build (hash agg + checkpoint materialization + range-sampled
    write of the checkpoint) and left a persisted RDD behind; this shape is
    sample + write, nothing persisted. Shuffled volume is the block-row
    count × 2 (~40-byte rows, 1/128th of the postings), with no map-side
    combine — acceptable at any corpus size because block rows are already
    the compressed representation.
    """
    src = postings.select(
        "term",
        F.explode(F.array(F.col("lang"), F.lit(ALL_LANG))).alias("lang"),
        "n",
        "block_sum_tf",
    ).withColumn("tlen", F.length("term"))
    return (
        src.repartitionByRange("lang", "tlen", "term")
        .groupBy("lang", "tlen", "term")
        .agg(F.sum("n").alias("df"), F.sum("block_sum_tf").alias("cf"))
        .sortWithinPartitions("lang", "tlen", "term")
    )


def build_suggest_table(documents: DataFrame) -> DataFrame:
    """suggest_completion candidates (term, doc_freq), range-clustered by
    term for row-group-pruned prefix probes — the reference's
    index-time completion-suggester build (title + first 1000 space-split
    words, accent-folded, alpha-only, lowercased —
    /root/reference/harvester/products/models/datatypes/product.py:169-180).
    Opt-in build stage (``IndexBuilder.build(suggest=True)``); SearchAPI
    prefers it over its lazy per-instance build when present and the index
    carries no un-compacted deltas (delta vocabulary stays fresh via the
    lazy path)."""
    parts = [F.split(F.col("text"), " ")]
    if "title" in documents.columns:
        parts.insert(0, F.split(F.coalesce(F.col("title"), F.lit("")), " "))
    words = F.slice(F.concat(*parts), 1, 1000) if len(parts) == 1 else (
        F.concat(parts[0], F.slice(parts[1], 1, 1000))
    )
    cleaned = F.filter(
        F.transform(words, lambda w: F.lower(F.regexp_replace(w, "[^a-zA-Z]+", ""))),
        lambda w: w != "",
    )
    return (
        documents.select(
            "doc_id", F.explode(F.array_distinct(cleaned)).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
        .repartitionByRange("term")
        .sortWithinPartitions("term")
    )


def sample_head_terms(
    documents: DataFrame,
    n_docs_total: int,
    threshold: int,
    chunk_target: int,
    sample_rows: int = 20000,
) -> DataFrame | None:
    """Estimate head terms (df ≥ threshold) from a seeded document sample.

    Head terms are by definition frequent, so a small sample finds them
    reliably; a missed borderline term just lands unsalted (≤ ~threshold
    postings on one reducer — harmless). Returns (term, lang, n_splits) or
    None when no term can exceed the threshold.
    """
    if n_docs_total < threshold:
        return None
    frac = min(1.0, sample_rows / n_docs_total)
    if frac >= 1.0:
        sampled = documents
    else:
        # Deterministic, LAYOUT-independent sample: keep rows whose doc_id
        # hash falls below ``frac`` of the hash space. Partition-seeded
        # Bernoulli (.sample) draws a different row set for different
        # physical layouts, so a pre-write (cached-frame) sample and a
        # resume-build (parquet) sample would chunk head terms differently
        # and the two builds would not be byte-identical — the hash filter
        # pins the sampled set to doc_id values alone.
        space = 1 << 30
        sampled = documents.filter(
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(42)), F.lit(space))
            < int(frac * space)
        )
    est = (
        postings_rows(sampled.select("doc_id", "text", "lang", "doc_len"))
        .groupBy("term", "lang")
        .agg((F.count("*") / frac).alias("est_df"))
        .filter(F.col("est_df") >= threshold / 2)
        .select(
            "term",
            "lang",
            F.greatest(
                F.lit(1), F.ceil(F.col("est_df") / chunk_target)
            ).alias("n_splits"),
        )
    )
    return est


def build_dictionary(rows: DataFrame) -> DataFrame:
    """(term, lang) → df, cf for each language plus the combined 'all' index.

    Two-phase salted aggregation: head terms ("the", "de") are first reduced
    within ``N_SALT`` salt groups, so no single reducer key carries a full
    head-term stream even without AQE (SURVEY.md §7 hard-part 3; AQE skew
    handling stays on as backstop).
    """
    partial = (
        rows.groupBy("term", "lang", F.pmod(F.col("doc_id"), F.lit(N_SALT)).alias("salt"))
        .agg(F.count("*").alias("df_p"), F.sum("tf").alias("cf_p"))
    )
    per_lang = partial.groupBy("term", "lang").agg(
        F.sum("df_p").alias("df"), F.sum("cf_p").alias("cf")
    )
    all_rows = per_lang.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    ).select("term", F.lit(ALL_LANG).alias("lang"), "df", "cf")
    return per_lang.select("term", "lang", "df", "cf").unionByName(all_rows)


def _encode_runs_arrays(
    lang: np.ndarray,
    term: np.ndarray,
    ids_all: np.ndarray,
    tf_all: np.ndarray,
    dl_all: np.ndarray,
    pos_off: np.ndarray,
    pos_vals: np.ndarray,
    avgdl: dict[str, float],
) -> pd.DataFrame:
    """Encode sorted (lang, term, doc_id) columnar arrays into block rows.

    Positions arrive PRE-ENCODED (round-4): ``pos_vals`` is the flat
    varbyte byte buffer and ``pos_off`` (len n+1) the per-posting byte
    boundaries — each posting's stream starts absolute, so a block's blob
    is the pure byte slice ``pos_vals[off[bs]:off[be]]``, byte-identical to
    what reduce-side ``encode_positions`` produced before.
    """
    out = {k: [] for k in (
        "lang", "term", "base_doc_id", "max_doc_id", "n", "doc_deltas", "tfs",
        "block_max_tf", "block_sum_tf", "impact_lang", "impact_all", "positions",
    )}
    n = len(ids_all)
    if n == 0:
        return pd.DataFrame(out)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = (term[1:] != term[:-1]) | (lang[1:] != lang[:-1])
    run_starts = np.flatnonzero(boundary)
    run_ends = np.append(run_starts[1:], n)
    for r0, r1 in zip(run_starts, run_ends):
        lg, tm = lang[r0], term[r0]
        ids = ids_all[r0:r1].astype(np.int64, copy=False)
        tf = tf_all[r0:r1].astype(np.int64, copy=False)
        dl = dl_all[r0:r1].astype(np.float64, copy=False)
        imp_lang = tf_norm(tf, dl, avgdl[lg])
        imp_all = tf_norm(tf, dl, avgdl[ALL_LANG])
        for bs in range(0, len(ids), BLOCK_SIZE):
            be = min(bs + BLOCK_SIZE, len(ids))
            tf_slice = tf[bs:be]
            blk = encode_blocks(ids[bs:be], tf_slice, imp_lang[bs:be])[0]
            pos_blob = pos_vals[pos_off[r0 + bs] : pos_off[r0 + be]]
            out["lang"].append(lg)
            out["term"].append(tm)
            out["base_doc_id"].append(blk[0])
            out["max_doc_id"].append(int(ids[bs:be].max()))
            out["n"].append(blk[1])
            out["doc_deltas"].append(blk[2])
            out["tfs"].append(blk[3])
            out["block_max_tf"].append(blk[4])
            out["block_sum_tf"].append(int(tf_slice.sum()))
            out["impact_lang"].append(blk[5])
            out["impact_all"].append(float(imp_all[bs:be].max()))
            out["positions"].append(pos_blob.tobytes())
    return pd.DataFrame(out)


HEAD_DF_THRESHOLD = 65536  # postings above this are "head" terms → salted
HEAD_CHUNK_TARGET = 65536  # target postings per head-term chunk


def encode_postings(
    rows: DataFrame,
    avgdl: dict[str, float],
    num_partitions: int | None = None,
    head_terms: DataFrame | None = None,
    n_docs_total: int | None = None,
) -> DataFrame:
    """postings_rows → compressed block table via salted hash shuffle.

    Shuffle key is ``(lang, term, chunk)`` where ``chunk`` is 0 for ordinary
    terms and ``floor(doc_id * n_splits / n_docs)`` for head terms (df ≥
    {HEAD_DF_THRESHOLD}) — the north-rule's salted-shuffle merge: no reducer
    ever holds a full head-term posting list, chunks cover contiguous
    non-overlapping docID ranges (block-span pruning stays effective), the
    salt is a deterministic function of doc_id (no sampling pass, stable
    under retries/AQE), and ``head_terms`` is a broadcast-joined dimension
    derived from the dictionary stage.
    """
    spark = rows.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bc = spark.sparkContext.broadcast(avgdl)

    if head_terms is not None and n_docs_total:
        rows = (
            rows.join(F.broadcast(head_terms), ["term", "lang"], "left")
            .withColumn(
                "chunk",
                F.when(F.col("n_splits").isNull(), F.lit(0)).otherwise(
                    F.floor(F.col("doc_id") * F.col("n_splits") / F.lit(n_docs_total))
                ),
            )
            .drop("n_splits")
        )
    else:
        rows = rows.withColumn("chunk", F.lit(0))

    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("lang", pa.string()),
            ("term", pa.string()),
            ("base_doc_id", pa.int64()),
            ("max_doc_id", pa.int64()),
            ("n", pa.int32()),
            ("doc_deltas", pa.binary()),
            ("tfs", pa.binary()),
            ("block_max_tf", pa.int32()),
            ("block_sum_tf", pa.int64()),
            ("impact_lang", pa.float64()),
            ("impact_all", pa.float64()),
            ("positions", pa.binary()),
        ]
    )

    def _unpack(rb: "pa.RecordBatch"):
        pl = rb.column("positions")
        # BinaryArray buffers: [validity, int32 offsets, byte data]. The
        # offsets are absolute into the shared data buffer (and the array
        # may itself be a slice) — rebase so row i's pre-encoded positions
        # are vals[off[i]:off[i+1]] with off[0] = 0
        bufs = pl.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int32)[
            pl.offset : pl.offset + len(pl) + 1
        ].astype(np.int64)
        vals = np.frombuffer(bufs[2], dtype=np.uint8)
        vals = vals[off[0] : off[-1]]
        off = off - off[0]
        return (
            rb.column("lang").to_numpy(zero_copy_only=False),
            rb.column("term").to_numpy(zero_copy_only=False),
            rb.column("doc_id").to_numpy(),
            rb.column("tf").to_numpy(),
            rb.column("doc_len").to_numpy(),
            off,
            vals,
        )

    def _emit(parts, avg):
        lang, term, did, tf, dl, off, vals = parts
        return pa.RecordBatch.from_pandas(
            _encode_runs_arrays(lang, term, did, tf, dl, off, vals, avg),
            schema=out_schema, preserve_index=False,
        )

    def encoder(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        avg = bc.value
        lf = None  # leftover trailing (lang, term) run — may continue in the
        # next Arrow batch of this sorted partition
        for rb in batches:
            if rb.num_rows == 0:
                continue
            lang, term, did, tf, dl, off, vals = _unpack(rb)
            if lf is not None:
                l_lang, l_term, l_did, l_tf, l_dl, l_off, l_vals = lf
                lang = np.concatenate([l_lang, lang])
                term = np.concatenate([l_term, term])
                did = np.concatenate([l_did, did])
                tf = np.concatenate([l_tf, tf])
                dl = np.concatenate([l_dl, dl])
                off = np.concatenate([l_off[:-1], l_off[-1] + off])
                vals = np.concatenate([l_vals, vals])
            n = len(did)
            # hold back the trailing (lang, term) run
            chg = np.flatnonzero((term[1:] != term[:-1]) | (lang[1:] != lang[:-1]))
            tail_start = int(chg[-1]) + 1 if chg.size else 0
            lf = (
                lang[tail_start:], term[tail_start:], did[tail_start:],
                tf[tail_start:], dl[tail_start:],
                off[tail_start:] - off[tail_start],
                vals[off[tail_start] : off[-1]].copy(),
            )
            if tail_start > 0:
                yield _emit(
                    (lang[:tail_start], term[:tail_start], did[:tail_start],
                     tf[:tail_start], dl[:tail_start],
                     off[: tail_start + 1], vals[: off[tail_start]]),
                    avg,
                )
        if lf is not None and len(lf[0]):
            yield _emit(lf, avg)

    sorted_rows = (
        rows.repartition(num_partitions, "lang", "term", "chunk")
        .sortWithinPartitions("lang", "term", "doc_id")
        .drop("chunk")
    )
    return sorted_rows.mapInArrow(encoder, POSTINGS_SCHEMA)


def compute_corpus_stats(documents: DataFrame) -> DataFrame:
    per_lang = documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    all_row = documents.groupBy().agg(
        F.lit(ALL_LANG).alias("lang"),
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    return per_lang.unionByName(all_row.select("lang", "n_docs", "avgdl"))


def read_analyzer_markers(index_dir: str) -> tuple[list | None, dict]:
    """(common_gram_terms, analyzer dict) persisted with an index build.

    ``common_grams.json`` carries the full bigram term list (so deltas and
    compactions can re-run the identical chain); ``analyzer.json`` records
    flags whose inputs are NOT persisted (the nl decompound wordlist) — a
    consumer seeing ``decompound_nl`` must be handed the same wordlist or
    refuse, never silently re-tokenize with a different chain."""
    import json

    cg = None
    try:
        with open(os.path.join(index_dir, "common_grams.json")) as f:
            cg = json.load(f)["terms"]
    except (FileNotFoundError, KeyError, ValueError):
        pass
    try:
        with open(os.path.join(index_dir, "analyzer.json")) as f:
            analyzer = json.load(f)
    except (FileNotFoundError, ValueError):
        analyzer = {}
    return cg, analyzer


def select_common_gram_terms(documents: DataFrame, n_pairs: int = 32) -> list[str]:
    """Derive the ``common_gram_terms`` build list from MEASURED adjacency
    counts: the distinct terms of the top-``n_pairs`` adjacent token pairs
    (count desc, pair asc — deterministic) under the default analyzer chain.
    The data-driven alternative to a hand-picked head-term list; the
    oracle-gated twin of this job is
    :func:`harvester_spark.operators.fulltext_queries.ft_top_bigrams`.
    Doc-partitioned lead window + map-side-combined pair count + distributed
    top-N (TakeOrderedAndProject) — only ``2·n_pairs`` terms reach the
    driver."""
    from pyspark.sql import Window as W

    from harvester_spark.analysis import tokens_column

    toks = documents.select(
        "doc_id", F.posexplode(tokens_column(F.col("text"))).alias("pos", "term")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        F.col("term").alias("t1"), F.lead("term", 1).over(w).alias("t2")
    ).filter(F.col("t2").isNotNull())
    top = (
        pairs.groupBy("t1", "t2")
        .count()
        .orderBy(F.desc("count"), "t1", "t2")
        .limit(n_pairs)
        .collect()
    )
    return sorted({t for r in top for t in (r["t1"], r["t2"])})


def _complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _parquet_file_rows(path: str) -> dict[str, int]:
    """Per-file row counts from parquet footers — no Spark job.

    (On a cluster this would read the Iceberg manifest instead.)
    """
    import pyarrow.parquet as pq

    counts = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                counts[full] = pq.read_metadata(full).num_rows
    return counts


class IndexBuilder:
    """Stage-checkpointed, resumable index build with lineage + metrics.

    On a cluster these directories would be Iceberg tables and the final
    manifest write an atomic snapshot commit (alias-promotion analogue,
    /root/reference/harvester/search/models/index.py:113-156); locally the
    same contract is realized with parquet dirs + ``_SUCCESS`` markers and
    the :mod:`harvester_spark.index.catalog` manifest swap.
    """

    def __init__(self, spark: SparkSession, index_dir: str, build_id: str = "build-0"):
        self.spark = spark
        self.index_dir = index_dir
        self.build_id = build_id
        self._lineage: list[tuple] = []

    def _path(self, name: str) -> str:
        return os.path.join(self.index_dir, name)

    @staticmethod
    def _footer_row_count(df: DataFrame) -> int | None:
        """Row count of a parquet-backed frame from file footers — no Spark
        job. Counts ALL rows (including any state-filtered ones), which is
        exactly what the head-term sampler needs: an upper bound on doc_id
        and the denominator of its sampling fraction (both tolerant of
        soft-deleted rows, see :func:`sample_head_terms`)."""
        import pyarrow.parquet as pq

        try:
            files = df.inputFiles()
        except Exception:
            return None
        if not files:
            return None
        from harvester_spark.session import local_path

        total = 0
        for f in files:
            try:
                total += pq.read_metadata(local_path(f)).num_rows
            except Exception:
                return None
        return total or None

    def _record(self, stage: str, partition_id: int, n_rows: int, t0: float, status: str):
        self._lineage.append(
            (self.build_id, stage, partition_id, n_rows, t0, time.time(), status)
        )

    def _run_stage(self, name: str, df_fn, resume: bool, partition_by: list[str] | None = None):
        path = self._path(name)
        t0 = time.time()
        if resume and _complete(path):
            self._record(name, -1, -1, t0, "skipped")
            return self.spark.read.parquet(path)
        writer = df_fn().write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        n_rows = sum(_parquet_file_rows(path).values())  # footer read, no job
        self._record(name, -1, n_rows, t0, "completed")
        return self.spark.read.parquet(path)

    def _clear_delta_artifacts(self) -> None:
        """Remove streaming-delta state from the target dir (non-resume).

        Artifacts: ``delta_state.json`` (the manifest readers key on),
        ``postings_delta/``, ``tombstones/``, versioned ``stats/`` dirs, and
        the base ``doc_lens.f8.npy`` mmap sidecar. The manifest is removed
        FIRST so a reader racing the cleanup falls back to base-only layout
        instead of a manifest referencing deleted dirs."""
        import shutil

        manifest = self._path("delta_state.json")
        try:
            os.remove(manifest)
        except FileNotFoundError:
            pass
        for d in ("postings_delta", "tombstones", "stats"):
            shutil.rmtree(self._path(d), ignore_errors=True)
        try:
            os.remove(self._path("doc_lens.f8.npy"))
        except FileNotFoundError:
            pass

    def build(self, *args, **kwargs) -> dict[str, DataFrame]:
        """See :meth:`_build_impl`. This wrapper restores the session's
        ``maxPartitionBytes`` after the build: ``tune_file_splits`` sizes
        scan splits to THIS documents table, and a long-lived session
        (SearchAPI, streaming driver) must not inherit a small corpus's
        tiny splits on every later scan of an unrelated large table."""
        prior = self.spark.conf.get("spark.sql.files.maxPartitionBytes", None)
        try:
            return self._build_impl(*args, **kwargs)
        finally:
            if prior is not None:
                self.spark.conf.set("spark.sql.files.maxPartitionBytes", prior)

    def _build_impl(
        self,
        documents: DataFrame,
        resume: bool = True,
        n_shards: int = 1,
        num_partitions: int | None = None,
        head_df_threshold: int = HEAD_DF_THRESHOLD,
        head_chunk_target: int = HEAD_CHUNK_TARGET,
        decompound_words=None,
        common_gram_terms=None,
        suggest: bool = False,
        precomputed_lang_counts: list[tuple] | None = None,
        precomputed_head_terms=_UNSET,
    ) -> dict[str, DataFrame]:
        spark = self.spark
        if not resume:
            # A fresh (non-resume) rebuild into an existing dir must not
            # leave the previous lifecycle's delta artifacts behind: a stale
            # delta_state.json would make a new SearchAPI open DeltaSearcher
            # and merge OLD delta postings / tombstones / mmap'd doc-length
            # sidecars over the fresh base. Resume builds keep them — they
            # continue the same lifecycle (compact_in_place handles folding).
            self._clear_delta_artifacts()
            # Likewise the previous build's suggest table: left in place,
            # a suggest=False rebuild (or one that crashes before its
            # suggest stage) would leave SearchAPI serving the OLD corpus's
            # vocabulary. suggest=True rewrites it from scratch anyway.
            import shutil

            shutil.rmtree(self._path("suggest"), ignore_errors=True)
        if "state" in documents.columns:
            # only active docs are indexed (soft-deleted/inactive excluded —
            # /root/reference/harvester/core/views/document.py:42-50)
            documents = documents.filter(F.col("state") == "active")
        docs = documents.select("doc_id", "text", "lang", "doc_len")
        # tokenize/sample parallelism is scan-split-bound: size splits to
        # the documents table before those scans are planned (round-4 —
        # the 16 MB static default packed a 100k-doc table into 11 splits,
        # capping the whole tokenize stage at 11-way parallelism)
        from harvester_spark.session import tune_file_splits

        tune_file_splits(spark, documents)

        # Head-term dimension for the salted-shuffle merge: estimated from a
        # seeded sample (cheap — head terms are frequent by definition), so
        # the single full tokenize pass feeds ONLY the block encoder and the
        # dictionary is derived from block metadata afterwards. Round-4
        # serial-floor cut: when the documents table is parquet-backed, its
        # row count comes from file footers (no job) and the sample job runs
        # CONCURRENTLY with the doc_stats/corpus_stats stages from a second
        # thread (Spark schedules jobs from multiple threads fine) — the
        # sample was otherwise a fully serialized ~1-2 s stage per build.
        import threading

        sample_holder: dict = {}
        sample_thread = None
        n_footer = None
        if precomputed_head_terms is not _UNSET:
            # run_build already sampled head terms off the pre-write cached
            # frame (overlapped with the documents write) — layout-
            # independent hash sampling makes those rows identical to what
            # the parquet-backed sample below would draw
            sample_holder["rows"] = precomputed_head_terms
        else:
            n_footer = self._footer_row_count(documents)
        if n_footer is not None:

            def _sample_job():
                try:
                    est = sample_head_terms(
                        docs, n_footer, head_df_threshold, head_chunk_target
                    )
                    sample_holder["rows"] = None if est is None else est.collect()
                except BaseException as exc:  # surfaced on join
                    sample_holder["err"] = exc

            sample_thread = threading.Thread(target=_sample_job, daemon=True)
            sample_thread.start()

        # Stats stages (round-5 serial-floor cut): postings encoding needs
        # only the avgdl dict and the total doc count, not the doc_stats /
        # corpus_stats TABLES — so both table writes run on worker threads
        # CONCURRENTLY with the postings encode and are joined before the
        # lineage commit. When the docID count job already collected
        # per-(lang, state) moments (run_build passes them through), the
        # corpus stats are pure driver arithmetic and cost zero jobs here;
        # otherwise one aggregation job computes them from the documents
        # table directly (same rows as the old doc_stats-derived pass).
        stage_holder: dict = {}

        def _stage_thread(key: str, df_fn, partition_by=None):
            def _run():
                try:
                    stage_holder[key] = self._run_stage(
                        key, df_fn, resume, partition_by
                    )
                except BaseException as exc:
                    stage_holder[key + "_err"] = exc

            t = threading.Thread(target=_run, daemon=True)
            t.start()
            return t

        stats_threads = []
        if precomputed_lang_counts:
            active: dict[str, list[int]] = {}
            for lang, state, n, sum_len in precomputed_lang_counts:
                if state is not None and state != "active":
                    continue
                slot = active.setdefault(lang, [0, 0])
                slot[0] += int(n)
                slot[1] += int(sum_len)
            # avgdl as double division of the exact int64 length sum — for
            # doc_len sums < 2^53 this is bit-identical to F.avg's result,
            # so a precomputed-stats index and a computed-stats index carry
            # the same corpus_stats bytes (rank identity invariant).
            srows = [
                (lang, n, (sl / n) if n else None)
                for lang, (n, sl) in sorted(active.items())
            ]
            tot_n = sum(n for _, n, _ in srows)
            tot_sl = sum(sl for _, (n, sl) in sorted(active.items()))
            srows.append((ALL_LANG, tot_n, (tot_sl / tot_n) if tot_n else None))
            avgdl = {lang: float(a) for lang, _, a in srows if a is not None}
            n_docs_total = tot_n
            stats_threads.append(
                _stage_thread(
                    "corpus_stats",
                    lambda: spark.createDataFrame(
                        srows, "lang string, n_docs long, avgdl double"
                    ),
                )
            )
        else:
            corpus_stats = self._run_stage(
                "corpus_stats",
                lambda: compute_corpus_stats(
                    documents.select("doc_id", "lang", "doc_len")
                ),
                resume,
            )
            stats_rows = corpus_stats.collect()
            avgdl = {
                r["lang"]: float(r["avgdl"])
                for r in stats_rows
                if r["avgdl"] is not None
            }
            n_docs_total = sum(
                int(r["n_docs"]) for r in stats_rows if r["lang"] != ALL_LANG
            )
            stage_holder["corpus_stats"] = corpus_stats
        stats_threads.append(
            _stage_thread(
                "doc_stats", lambda: documents.select("doc_id", "lang", "doc_len")
            )
        )

        if sample_thread is not None:
            sample_thread.join()
            if "err" in sample_holder:
                raise sample_holder["err"]
        if sample_thread is not None or "rows" in sample_holder:
            rows = sample_holder.get("rows")
            # tiny (term, lang, n_splits) dim — re-created for broadcast.
            # Explicit schema: inference over an all-NULL / empty collect
            # would silently drift the join types; an empty sample means
            # "no head terms" exactly like the serial path's empty frame.
            head_terms = (
                None
                if rows is None
                else spark.createDataFrame(
                    rows, "term string, lang string, n_splits bigint"
                )
            )
        else:
            head_terms = sample_head_terms(
                docs, n_docs_total, head_df_threshold, head_chunk_target
            )
        rows = postings_rows(
            docs,
            decompound_words=decompound_words,
            common_gram_terms=common_gram_terms,
        )
        if common_gram_terms:
            # query-side marker: phrase matching may ONLY rewrite an
            # adjacent pair to its bigram when the build emitted it
            import json as _json

            os.makedirs(self.index_dir, exist_ok=True)
            with open(self._path("common_grams.json"), "w") as f:
                _json.dump({"terms": sorted(common_gram_terms)}, f)
        if decompound_words:
            # analyzer marker so searchers know the index chain (the
            # reference records the analyzer in the index settings)
            import json as _json

            os.makedirs(self.index_dir, exist_ok=True)
            with open(self._path("analyzer.json"), "w") as f:
                _json.dump(
                    {"decompound_nl": True, "n_words": len(list(decompound_words))}, f
                )

        # Postings: optionally sharded by docID bucket for partition-level
        # resume (each shard is an independent atomic commit).
        postings_root = self._path("postings")
        if n_shards <= 1:
            self._run_stage(
                "postings",
                lambda: encode_postings(
                    rows, avgdl, num_partitions, head_terms, n_docs_total
                ),
                resume,
                partition_by=["lang"],  # per-language partition pruning
            )
        else:
            for shard in range(n_shards):
                shard_path = os.path.join(postings_root, f"shard={shard}")
                t0 = time.time()
                if resume and _complete(shard_path):
                    self._record("postings", shard, -1, t0, "skipped")
                    continue
                shard_rows = rows.filter(F.pmod(F.col("doc_id"), F.lit(n_shards)) == shard)
                encode_postings(
                    shard_rows, avgdl, num_partitions, head_terms, n_docs_total
                ).write.mode("overwrite").partitionBy("lang").parquet(shard_path)
                n = sum(_parquet_file_rows(shard_path).values())
                self._record("postings", shard, n, t0, "completed")
        postings = spark.read.option("basePath", postings_root).parquet(postings_root)

        # Dictionary: JVM aggregation over block metadata (≈1/128th of the
        # posting rows) — no second shuffle of the raw token stream, one
        # range exchange total, nothing persisted (dictionary_from_blocks).
        dictionary = self._run_stage(
            "dictionary", lambda: dictionary_from_blocks(postings), resume
        )

        if suggest:
            # index-time completion-suggester table (opt-in; SearchAPI
            # serves prefix probes from it instead of a per-instance agg)
            self._run_stage(
                "suggest", lambda: build_suggest_table(documents), resume
            )

        # Join the concurrent stats-table writes before the lineage commit:
        # the lineage must record every stage and a failed stats write must
        # fail the build, not linger on a daemon thread.
        for t in stats_threads:
            t.join()
        for key in ("doc_stats", "corpus_stats"):
            if key + "_err" in stage_holder:
                raise stage_holder[key + "_err"]
        doc_stats = stage_holder["doc_stats"]
        corpus_stats = stage_holder["corpus_stats"]

        # Per-partition (per output file) metrics → lineage, the north_rule's
        # lineage+metrics table (footer reads, no Spark job).
        now = time.time()
        for i, (f, n) in enumerate(sorted(_parquet_file_rows(postings_root).items())):
            self._lineage.append(
                (self.build_id, "postings_file", i, n, now, now, "metric")
            )
        lineage_df = spark.createDataFrame(self._lineage, LINEAGE_SCHEMA)
        lineage_df.write.mode("append").parquet(self._path("lineage"))

        return {
            "postings": postings,
            "dictionary": dictionary,
            "doc_stats": doc_stats,
            "corpus_stats": corpus_stats,
            "lineage": spark.read.parquet(self._path("lineage")),
        }
