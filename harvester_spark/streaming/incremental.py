"""Incremental updates: merge-on-srn, delta postings, tombstones.

Mirrors the reference's incremental machinery (SURVEY.md §2.10):

- content-hash guarded upsert — only documents whose canonical payload hash
  changed are rewritten (/root/reference/harvester/core/models/datatypes/
  document.py:89-94,133-139),
- soft deletes: ``deleted_at`` set, state flips to ``deleted``
  (core/models/datatypes/set.py:69-85; delete docs by srn
  document.py:195-201),
- the index is updated by APPENDING a delta: freshly-encoded blocks for
  new/changed docs plus a tombstone set for superseded docIDs; queries read
  base ∪ delta minus tombstones. Correctness contract (tested):
  **base ∪ delta answers == full-rebuild answers, bit-for-bit** — achieved
  by recomputing corpus stats exactly from the merged doc_stats and by
  deriving per-term df from the decoded, tombstone-filtered postings at
  query time (so the BM25 accumulation order matches a rebuild).

At cluster scale the merge is an Iceberg ``MERGE INTO`` on srn and the delta
append an atomic snapshot commit; locally: full-outer-join copy-on-write +
parquet append dirs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from harvester_spark.analysis import ALL_LANG, tokenize
from harvester_spark.extract import with_extracted_text
from harvester_spark.index.build import compute_corpus_stats, encode_postings, postings_rows
from harvester_spark.index.codec import decode_blocks_batch, encode_positions
from harvester_spark.normalize import normalize_documents
from harvester_spark.search import bm25
from harvester_spark.search.engine import IndexSearcher, SearchResult


def _gather_slices(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray, sel: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather per-posting variable-length slices of ``flat`` (described by
    ``starts``/``lens``) for postings ``sel``, in ``sel`` order →
    (new_flat, new_starts). One vectorized index build, no Python loop."""
    lens_s = lens[sel]
    total = int(lens_s.sum())
    new_starts = np.zeros(lens_s.size, dtype=np.int64)
    if lens_s.size > 1:
        np.cumsum(lens_s[:-1], out=new_starts[1:])
    if total == 0:
        return np.empty(0, dtype=flat.dtype), new_starts
    gidx = (
        np.repeat(starts[sel], lens_s)
        + np.arange(total)
        - np.repeat(new_starts, lens_s)
    )
    return flat[gidx], new_starts


def dead_mask(
    tomb_ids: np.ndarray, tomb_maxseq: np.ndarray, ids: np.ndarray, seq: int
) -> np.ndarray | None:
    """Mask of postings superseded by a tombstone recorded AFTER ``seq``
    (None when nothing is dead). Pure function of the folded tombstone
    arrays — shared by DeltaSearcher (driver) and the distributed batch
    kernels (executors)."""
    if tomb_ids.size == 0 or ids.size == 0:
        return None
    pos = np.searchsorted(tomb_ids, ids)
    pos_c = np.minimum(pos, tomb_ids.size - 1)
    dead = (tomb_ids[pos_c] == ids) & (tomb_maxseq[pos_c] > seq)
    return dead if dead.any() else None


def merge_tf_parts(
    parts: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate per-seq (ids, tfs) parts (ascending seq, each already
    tombstone-filtered) and stable-sort by doc id — the postings a rebuild
    would hold."""
    parts = [p for p in parts if p[0].size]
    if not parts:
        z = np.empty(0, np.int64)
        return z, z.copy()
    if len(parts) == 1:
        return parts[0]
    ids = np.concatenate([p[0] for p in parts])
    tfv = np.concatenate([p[1] for p in parts])
    order = np.argsort(ids, kind="stable")
    return ids[order], tfv[order]


def merge_pos_parts(
    parts: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Positional twin of :func:`merge_tf_parts`: merge per-seq
    (ids, tfs, flat positions, posting starts) decodes, keeping each
    posting's position slice contiguous after the sort gather."""
    parts = [p for p in parts if p[0].size]
    if not parts:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy(), z.copy()
    if len(parts) == 1:
        return parts[0]
    ids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    flat = np.concatenate([p[2] for p in parts])
    starts_parts, off = [], 0
    for p in parts:
        starts_parts.append(p[3] + off)
        off += p[2].size
    starts = np.concatenate(starts_parts)
    order = np.argsort(ids, kind="stable")
    flat2, starts2 = _gather_slices(flat, starts, tfs, order)
    return ids[order], tfs[order], flat2, starts2


def synth_block_rows(
    term: str,
    ids: np.ndarray,
    tfv: np.ndarray,
    lens: np.ndarray,
    avg_all: float,
    avg_lang: float | None,
    pos: tuple[np.ndarray, np.ndarray] | None = None,
) -> list[dict]:
    """Re-encode merged postings into synthetic block rows (base postings
    layout, impacts recomputed). ``avg_lang=None`` means the query language
    is ALL (impact_lang == impact_all). ``pos`` is the merged (flat
    positions, starts) pair when positional rows are wanted."""
    from harvester_spark.index.codec import BLOCK_SIZE, encode_blocks

    rows: list[dict] = []
    if ids.size == 0:
        return rows
    imp_all = bm25.tf_norm(tfv, lens[ids], avg_all)
    imp_lang = (
        imp_all if avg_lang is None else bm25.tf_norm(tfv, lens[ids], avg_lang)
    )
    for j, (base, n, deltas, tfb, _mtf, _mimp) in enumerate(
        encode_blocks(ids, tfv, imp_all)
    ):
        s = j * BLOCK_SIZE
        e = s + n
        row = {
            "term": term,
            "base_doc_id": int(base),
            "max_doc_id": int(ids[e - 1]),
            "n": int(n),
            "doc_deltas": deltas,
            "tfs": tfb,
            "impact_lang": float(imp_lang[s:e].max()),
            "impact_all": float(imp_all[s:e].max()),
        }
        if pos is not None:
            flat, starts = pos
            # postings are contiguous in flat after the merge gather
            fs = int(starts[s])
            fe = int(starts[e - 1] + tfv[e - 1])
            row["positions"] = encode_positions(flat[fs:fe], tfv[s:e])
        rows.append(row)
    return rows


def normalize_delta(delta_corpus: DataFrame) -> DataFrame:
    """Delta corpus (url, warc_ts, html, lang[, deleted]) → normalized docs.

    ``deleted = true`` rows are tombstone seeds (url identifies the doc).

    IN-BATCH LATEST-WINS: a url pushed more than once inside one micro-batch
    (rapid successive webhooks landing in the same trigger interval — routine
    at scale) must collapse to ONE row per srn BEFORE the merge join, or the
    full-outer MERGE fans out and writes duplicate srn rows. Winner is the
    newest ``warc_ts``; exact-timestamp ties break deterministically
    (delete beats update, then content_hash desc) — the batch analogue of
    the reference's row-locked last-write-wins
    (/root/reference/harvester/core/processors/pipeline/resource.py:119-135).
    """
    has_deleted = "deleted" in delta_corpus.columns
    if has_deleted and not delta_corpus.is_cached:
        # duplicate urls would also fan out the tombstone re-attach join.
        # Long-running streams must not leak one cached frame per batch:
        # process_webhook_batch caches the batch itself and unpersists after
        # the batch's writes complete; this fallback covers direct one-shot
        # callers only.
        delta_corpus = delta_corpus.cache()
    extracted = with_extracted_text(
        delta_corpus.drop("text") if "text" in delta_corpus.columns else delta_corpus,
        "html",
        "text",
    )
    docs = normalize_documents(extracted)
    if has_deleted:
        # normalize projects a fixed schema; re-attach the tombstone flag by
        # (url, warc_ts) — the pair identifies the push within the batch
        docs = docs.join(
            delta_corpus.select("url", "warc_ts", "deleted"), ["url", "warc_ts"], "left"
        )
        docs = docs.withColumn("is_delete", F.coalesce(F.col("deleted"), F.lit(False))).drop("deleted")
    else:
        docs = docs.withColumn("is_delete", F.lit(False))
    w = W.partitionBy("srn").orderBy(
        F.col("warc_ts").desc(),
        F.col("is_delete").desc(),
        F.col("content_hash").desc(),
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_documents(
    base: DataFrame, delta: DataFrame, max_doc_id: int | None = None
) -> DataFrame:
    """Hash-guarded MERGE on srn → the new documents table.

    ``max_doc_id`` is the GLOBAL docID high-water mark; pass it whenever
    ``base`` is a pruned subset (the overlay path hands only the touched
    srns) — inserts continue after it. Defaults to max(base.doc_id) for
    full-table callers.

    - matching srn, same content_hash → keep base row untouched,
    - matching srn, new hash → take delta payload, keep base doc_id,
      bump modified_at,
    - delta-only srn → insert with a fresh dense doc_id (continuing after
      ``max(base.doc_id)`` in (set_name, srn) order — monotonic+offset over
      the insert set),
    - delete marker → keep base row with state='deleted', deleted_at set.
    """
    spark = base.sparkSession
    d = delta.select(
        F.col("srn").alias("d_srn"),
        F.col("set_name").alias("d_set_name"),
        F.col("url").alias("d_url"),
        F.col("warc_ts").alias("d_warc_ts"),
        F.col("text").alias("d_text"),
        F.col("lang").alias("d_lang"),
        F.col("content_hash").alias("d_hash"),
        F.col("modified_at").alias("d_modified_at"),
        F.col("publisher_date").alias("d_publisher_date"),
        F.col("doc_len").alias("d_doc_len"),
        "is_delete",
    )
    joined = base.join(d, base.srn == d.d_srn, "full_outer")

    is_insert = F.col("srn").isNull()
    # VERSION GUARD: warc_ts is the push's version. A delta row OLDER than
    # the base row is a stale replay (at-least-once redelivery of an earlier
    # batch, or a file source listing batches out of order) and must NOT
    # regress the doc — updates and deletes apply only when
    # d_warc_ts >= base warc_ts (equality allowed: re-push with a corrected
    # payload at the same capture time).
    not_stale = F.col("srn").isNull() | (F.col("d_warc_ts") >= F.col("warc_ts"))
    is_delete = F.coalesce(F.col("is_delete"), F.lit(False)) & not_stale
    is_update = (~is_insert) & F.col("d_srn").isNotNull() & (~is_delete) & (
        F.col("content_hash") != F.col("d_hash")
    ) & not_stale

    def pick(b: str, dcol: str):
        return F.when(is_insert | is_update, F.col(dcol)).otherwise(F.col(b))

    merged = joined.select(
        F.coalesce(F.col("srn"), F.col("d_srn")).alias("srn"),
        F.coalesce(F.col("set_name"), F.col("d_set_name")).alias("set_name"),
        pick("url", "d_url").alias("url"),
        pick("warc_ts", "d_warc_ts").alias("warc_ts"),
        pick("text", "d_text").alias("text"),
        pick("lang", "d_lang").alias("lang"),
        F.when(is_delete, F.lit("deleted"))
        .when(is_insert, F.lit("active"))
        .otherwise(F.col("state"))
        .alias("state"),
        pick("content_hash", "d_hash").alias("content_hash"),
        F.coalesce(F.col("created_at"), F.col("d_modified_at")).alias("created_at"),
        F.when(is_insert | is_update, F.col("d_modified_at"))
        .otherwise(F.col("modified_at"))
        .alias("modified_at"),
        F.when(is_delete, F.col("d_modified_at")).otherwise(F.col("deleted_at")).alias("deleted_at"),
        pick("publisher_date", "d_publisher_date").alias("publisher_date"),
        pick("doc_len", "d_doc_len").alias("doc_len"),
        F.col("doc_id"),
        is_insert.alias("_is_insert"),
        (is_update | is_delete).alias("_is_changed"),
    )

    if max_doc_id is None:
        max_doc_id = base.agg(F.max("doc_id")).collect()[0][0]
    max_id = -1 if max_doc_id is None else int(max_doc_id)
    inserts = merged.filter(F.col("_is_insert"))
    # dense ids for inserts: rank in (set_name, srn) order after max_id —
    # insert sets are small, a window rank is the monotonic+offset scheme
    # with a single partition offset
    from pyspark.sql import Window as W

    w = W.orderBy("set_name", "srn")
    inserts = inserts.withColumn(
        "doc_id", (F.row_number().over(w) + F.lit(max_id)).cast("long")
    )
    out = merged.filter(~F.col("_is_insert")).unionByName(inserts)
    return out.drop("_is_insert", "_is_changed")


def changed_and_deleted(base: DataFrame, merged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(docs needing re-index, tombstoned docIDs) between base and merged."""
    b = base.select("srn", F.col("content_hash").alias("b_hash"), F.col("state").alias("b_state"))
    j = merged.join(b, "srn", "left")
    fresh = j.filter(
        (F.col("b_hash").isNull())  # inserts
        | ((F.col("content_hash") != F.col("b_hash")) & (F.col("state") == "active"))
    ).select(merged.columns)
    tombstones = j.filter(
        (F.col("b_hash").isNotNull())
        & (
            ((F.col("content_hash") != F.col("b_hash")) & (F.col("state") == "active"))
            | ((F.col("state") == "deleted") & (F.col("b_state") == "active"))
        )
    ).select("doc_id")
    return fresh, tombstones


def apply_index_delta(
    spark: SparkSession,
    index_dir: str,
    merged_documents: DataFrame,
    fresh_docs: DataFrame,
    tombstones: DataFrame,
    delta_name: str = "delta-1",
    decompound_words=None,
    stats_patch: DataFrame | None = None,
    max_doc_id: int | None = None,
) -> None:
    """Append delta blocks + tombstones; publish atomically via manifest.

    All new state — refreshed doc_stats/corpus_stats (recomputed exactly from
    the merged documents, tiny relative to postings), the delta's postings
    blocks, and its tombstone set — is STAGED under new paths and published
    with a single ``os.replace`` of ``delta_state.json`` as the last step
    (the IndexCatalog pattern). A searcher opened mid-apply or after a crash
    sees the previous consistent snapshot, never refreshed n_docs/avgdl with
    missing tombstones.

    Deltas are SEQUENCED: the manifest orders them, and each tombstone set
    carries the delta's ordinal. A tombstone recorded at seq N invalidates
    the doc's postings in base (seq 0) and in every delta with seq < N —
    update-then-update and update-then-delete across micro-batches fold to
    latest-wins (the stacked-delta contract: base ∪ deltas == rebuild).

    Delta postings run through the SAME analyzer chain the base index was
    built with: the common-grams term list is read back from the index's
    ``common_grams.json`` marker automatically; a decompound-built index
    (``analyzer.json``) requires the caller to pass the same
    ``decompound_words`` — applying a delta tokenized with a different chain
    would silently diverge from a rebuild.
    """
    fresh_docs = fresh_docs.cache()
    try:
        _apply_index_delta(
            spark, index_dir, merged_documents, fresh_docs, tombstones,
            delta_name, decompound_words, stats_patch, max_doc_id,
        )
    finally:
        # one cached frame per micro-batch must not outlive the batch
        fresh_docs.unpersist()


def _stats_patch_totals(patch_rows: list) -> dict[str, list[int]]:
    """Exact per-lang [Δn_docs, Δdoc_len_sum] of a stats patch (int64
    arithmetic only — removals carry the OLD row's lang/len, so the fold
    against base_totals reproduces a full recompute bit-for-bit)."""
    totals: dict[str, list[int]] = {}

    def bump(lang: str, dn: int, ds: int) -> None:
        t = totals.setdefault(lang, [0, 0])
        t[0] += dn
        t[1] += ds

    for r in patch_rows:
        sign = -1 if r["removed"] else 1
        bump(r["lang"], sign, sign * int(r["doc_len"]))
        bump(ALL_LANG, sign, sign * int(r["doc_len"]))
    return totals


def _bootstrap_base_totals(spark: SparkSession, doc_stats_path: str) -> dict:
    """One-time exact int totals of the full doc_stats table (first patch
    applied to an index whose manifest predates patch mode)."""
    per_lang = (
        spark.read.parquet(doc_stats_path)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("doc_len").cast("long").alias("s"),
        )
        .collect()
    )
    totals = {r["lang"]: [int(r["n"]), int(r["s"])] for r in per_lang}
    totals[ALL_LANG] = [
        sum(v[0] for k, v in totals.items() if k != ALL_LANG),
        sum(v[1] for k, v in totals.items() if k != ALL_LANG),
    ]
    return totals


def _apply_index_delta(
    spark: SparkSession,
    index_dir: str,
    merged_documents: DataFrame,
    fresh_docs: DataFrame,
    tombstones: DataFrame,
    delta_name: str,
    decompound_words,
    stats_patch: DataFrame | None = None,
    max_doc_id: int | None = None,
) -> None:
    import json

    from harvester_spark.search.engine import read_delta_state

    # At-least-once delivery makes NO-OP batches routine (redelivered pushes
    # whose content hash matches the base): nothing changed, so nothing is
    # written and no seq is consumed. A PURE-DELETE batch writes tombstones
    # + refreshed stats but NO postings dir — a partitioned parquet write of
    # an empty frame produces no footer files and would brick every
    # subsequent DeltaSearcher read of the manifest's delta list.
    has_postings = not fresh_docs.isEmpty()
    if not has_postings and tombstones.isEmpty():
        return

    state = read_delta_state(index_dir) or {"seq": 0, "deltas": [], "stats_dir": None}
    # IDEMPOTENT per delta_name: foreachBatch retries a crashed batch with
    # the same batch id (the promote that follows us may not have run), so a
    # re-apply keeps the existing seq and REPLACES the manifest entry —
    # never a duplicate name with a fresh seq. The re-apply stages under
    # attempt-suffixed dirs (never overwriting dirs the LIVE manifest
    # references — a reader mid-query must keep its consistent snapshot)
    # and publishes with the same single os.replace; superseded attempt
    # dirs stay as unreferenced garbage until compaction, like any
    # crash-staged dir.
    existing = next((d for d in state["deltas"] if d["name"] == delta_name), None)
    if existing is not None:
        import re as _re

        seq = int(existing["seq"])
        prev_dir = existing.get("dir", existing["name"])
        m = _re.search(r"__r(\d+)$", prev_dir)
        attempt = int(m.group(1)) + 1 if m else 1
        delta_dir = f"{delta_name}__r{attempt}"
        stats_suffix = f"__r{attempt}"
    else:
        seq = int(state["seq"]) + 1
        delta_dir = delta_name
        stats_suffix = ""

    entry_patch = entry_totals = None
    if stats_patch is not None:
        # PATCH MODE (the streaming default): never rewrite the O(corpus)
        # doc_stats table per batch. The patch holds the batch's upserted
        # (doc_id, lang, doc_len) rows plus removal markers carrying the
        # OLD lang/len; exact int totals_delta folds against base_totals in
        # the manifest so corpus stats (and avgdl for this delta's impact
        # bounds) are driver arithmetic — bit-identical to a full recompute
        # while staying O(batch) on disk and in compute.
        stats_dir = state.get("stats_dir")  # unchanged full base
        patch_dir = f"stats/p{seq:06d}{stats_suffix}"
        stats_patch.select(
            F.col("doc_id").cast("long"),
            "lang",
            F.col("doc_len").cast("long"),
            "removed",
        ).write.mode("overwrite").parquet(f"{index_dir}/{patch_dir}")
        patch_rows = spark.read.parquet(f"{index_dir}/{patch_dir}").collect()
        entry_totals = _stats_patch_totals(patch_rows)
        entry_patch = patch_dir
        if state.get("base_totals") is None:
            from harvester_spark.search.engine import stats_paths

            state["base_totals"] = _bootstrap_base_totals(
                spark, stats_paths(index_dir)[0]
            )
        # fold to the post-delta totals for this delta's encode avgdl
        folded: dict[str, list[int]] = {
            k: list(v) for k, v in state["base_totals"].items()
        }
        for d in state["deltas"]:
            if d["name"] == delta_name:
                continue  # retry: superseded attempt's totals excluded
            for lang, (dn, ds) in (d.get("totals_delta") or {}).items():
                t = folded.setdefault(lang, [0, 0])
                t[0] += int(dn)
                t[1] += int(ds)
        for lang, (dn, ds) in entry_totals.items():
            t = folded.setdefault(lang, [0, 0])
            t[0] += int(dn)
            t[1] += int(ds)
        avgdl = {lang: (s / n) if n else 0.0 for lang, (n, s) in folded.items()}
    else:
        # FULL MODE (legacy / compaction-adjacent callers): recompute the
        # complete stats tables from the merged documents. Subsumes any
        # prior patches — strip them so fold_totals can't double count.
        stats_dir = f"stats/v{seq:06d}{stats_suffix}"
        active = merged_documents.filter(F.col("state") == "active")
        active.select("doc_id", "lang", "doc_len").write.mode("overwrite").parquet(
            f"{index_dir}/{stats_dir}/doc_stats"
        )
        doc_stats = spark.read.parquet(f"{index_dir}/{stats_dir}/doc_stats")
        compute_corpus_stats(doc_stats).write.mode("overwrite").parquet(
            f"{index_dir}/{stats_dir}/corpus_stats"
        )
        avgdl = {
            r["lang"]: float(r["avgdl"])
            for r in spark.read.parquet(
                f"{index_dir}/{stats_dir}/corpus_stats"
            ).collect()
        }
        state["base_totals"] = None
        for d in state["deltas"]:
            d.pop("totals_delta", None)
            d.pop("stats_patch", None)
    from harvester_spark.index.build import read_analyzer_markers

    cg_terms, analyzer = read_analyzer_markers(index_dir)
    if analyzer.get("decompound_nl") and decompound_words is None:
        raise ValueError(
            "index was built with the nl decompound analyzer chain; pass the "
            "same decompound_words so delta postings match the base chain"
        )
    if has_postings:
        rows = postings_rows(
            fresh_docs.select("doc_id", "text", "lang", "doc_len"),
            decompound_words=decompound_words,
            common_gram_terms=cg_terms,
        )
        encode_postings(rows, avgdl).write.mode("overwrite").partitionBy(
            "lang"
        ).parquet(f"{index_dir}/postings_delta/delta={delta_dir}")
    tombstones.select(
        F.col("doc_id").cast("long"), F.lit(seq).cast("long").alias("seq")
    ).write.mode("overwrite").parquet(f"{index_dir}/tombstones/{delta_dir}")

    entry = {
        "name": delta_name, "seq": seq, "has_postings": has_postings,
        "dir": delta_dir,
    }
    if entry_patch is not None:
        entry["stats_patch"] = entry_patch
        entry["totals_delta"] = entry_totals
    new_state = {
        "seq": max(int(state["seq"]), seq),
        "deltas": [d for d in state["deltas"] if d["name"] != delta_name] + [entry],
        "stats_dir": stats_dir,
        "base_totals": state.get("base_totals"),
    }
    _maxes = [m for m in (max_doc_id, state.get("max_doc_id")) if m is not None]
    if _maxes:
        new_state["max_doc_id"] = max(int(m) for m in _maxes)
    # unique staging name: a shared .tmp would let two concurrent publishers
    # interleave write/replace into a torn manifest (the catalog.promote
    # defect found by tests/test_catalog_concurrency.py) — foreachBatch
    # serializes writers in production, but the publish step must be safe
    # regardless
    tmp = os.path.join(index_dir, f"delta_state.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(new_state, f)
    os.replace(tmp, os.path.join(index_dir, "delta_state.json"))  # atomic publish


class DeltaSearcher(IndexSearcher):
    """Searches base ∪ delta postings minus tombstones, bit-identical to a
    full rebuild: df comes from the decoded+filtered postings (so term
    accumulation order matches) and stats from the refreshed tables.

    Delta-awareness lives at the BLOCK interface (``_dfs`` and
    ``_term_postings`` are overridden to serve merged, tombstone-filtered
    synthetic blocks), so every DRIVER consumer — the inherited AND
    ``search``, ``or_search`` (both strategies), the conjunctive fast path,
    phrase search — sees the post-delta truth through one path instead of
    each needing its own merge. The distributed batch paths
    (``search.distributed``) do the same merge EXECUTOR-side: delta blocks
    fan out seq-tagged next to base blocks, the folded tombstone arrays
    ship as one broadcast, and each docID range folds latest-wins locally
    (per-segment search with range shards as segments — no compaction
    required, and a plain IndexSearcher on a delta'd index is refused
    because its df/stats would be stale). Positional phrase search works over
    un-compacted deltas too: ``with_positions=True`` merges the per-posting
    position lists (base ∪ deltas, tombstone-filtered) and re-encodes them
    into the synthetic blocks, so quoted-phrase queries equal a rebuild
    bit-for-bit without waiting for compaction."""

    # Eviction thresholds for the per-instance merged-postings caches.
    # Class attributes so the streaming soak test can run them at 1/100
    # scale (forcing hundreds of eviction cycles in minutes) — production
    # instances keep the defaults.
    MERGED_CACHE_MAX = 4096
    POS_CACHE_MAX = 1024

    def __init__(self, spark: SparkSession, index_dir: str):
        from harvester_spark.search.engine import read_delta_state

        super().__init__(spark, index_dir)
        self._merged_cache: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
        self._pos_cache: dict[
            tuple[str, str], tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]
        ] = {}
        state = read_delta_state(index_dir)
        deltas = list(state["deltas"]) if state else []
        # keyed by the DIR (the `delta=` partition value — differs from the
        # logical name after a streaming-retry re-stage; absent key = older
        # manifest = the name itself)
        self._delta_seq = {
            d.get("dir", d["name"]): int(d["seq"]) for d in deltas
        }

        # Only manifest-LISTED deltas are read (a crash can leave staged but
        # unpublished delta dirs on disk); delta dirs are partition-style
        # (delta=<name>/lang=<l>), so a basePath read keeps both columns.
        delta_root = f"{index_dir}/postings_delta"
        self._delta = None
        # pure-delete deltas carry tombstones + a seq but NO postings dir
        # (manifest has_postings=False; absent key = older manifest = True)
        post_paths = [
            f"{delta_root}/delta={d.get('dir', d['name'])}"
            for d in deltas
            if d.get("has_postings", True)
        ]
        if post_paths:
            self._delta = spark.read.option("basePath", delta_root).parquet(*post_paths)

        # Tombstones carry the recording delta's seq: a tombstone at seq N
        # kills the doc's postings in base (seq 0) and every delta < N.
        # Fold to per-doc MAX seq; a posting at seq s survives iff
        # tomb_max_seq(doc) <= s.
        self._tomb_ids = np.empty(0, dtype=np.int64)
        self._tomb_maxseq = np.empty(0, dtype=np.int64)
        if deltas:
            paths = [
                f"{index_dir}/tombstones/{d.get('dir', d['name'])}" for d in deltas
            ]
            pdf = spark.read.parquet(*paths).toPandas()
            if len(pdf):
                folded = pdf.groupby("doc_id")["seq"].max().sort_index()
                self._tomb_ids = folded.index.to_numpy(dtype=np.int64)
                self._tomb_maxseq = folded.to_numpy(dtype=np.int64)
        self._delta_terms_cache: dict[str, list[str]] = {}

    def delta_terms(self, lang: str) -> list[str]:
        """Distinct terms present in any delta postings for ``lang`` — terms
        the BASE dictionary may not know yet. Expansion surfaces (``pre*``
        prefix, ``term~N`` fuzzy) union these with the base dictionary so
        delta-only terms expand before compaction; extras whose postings are
        fully tombstoned are harmless under the expansions' constant-score
        union semantics (their merged decode is empty)."""
        if lang not in self._delta_terms_cache:
            if self._delta is None:
                self._delta_terms_cache[lang] = []
            else:
                d = self._delta
                if lang != ALL_LANG:
                    d = d.filter(F.col("lang") == lang)
                self._delta_terms_cache[lang] = sorted(
                    r["term"] for r in d.select("term").distinct().collect()
                )
        return self._delta_terms_cache[lang]

    def _dead_mask(self, ids: np.ndarray, seq: int) -> np.ndarray | None:
        """Postings superseded by a tombstone recorded AFTER ``seq`` (None
        when nothing is dead)."""
        return dead_mask(self._tomb_ids, self._tomb_maxseq, ids, seq)

    def _filter_tombstoned(
        self, ids: np.ndarray, tfv: np.ndarray, seq: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Drop postings superseded by a tombstone recorded AFTER ``seq``."""
        dead = self._dead_mask(ids, seq)
        if dead is None:
            return ids, tfv
        return ids[~dead], tfv[~dead]

    def _decode_term(self, blocks: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        if len(blocks) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ids, tfv = decode_blocks_batch(
            blocks["base_doc_id"].to_numpy(),
            blocks["n"].to_numpy(),
            [bytes(b) for b in blocks["doc_deltas"]],
            [bytes(b) for b in blocks["tfs"]],
        )
        order = np.argsort(ids, kind="stable")
        return ids[order], tfv[order]

    def _merged_term_arrays(
        self, terms: list[str], lang: str
    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """Per term: base ∪ deltas (ascending seq, each tombstone-filtered)
        as sorted (ids, tfs) — exactly the postings a rebuild would hold."""
        # Build the per-call result LOCALLY: cache eviction must never drop
        # entries this call still needs (earlier-cached query terms, or
        # fresh merges inserted before an eviction mid-loop).
        result: dict[str, tuple[np.ndarray, np.ndarray]] = {
            t: self._merged_cache[(t, lang)]
            for t in terms
            if (t, lang) in self._merged_cache
        }
        missing = [t for t in terms if t not in result]
        if missing:
            base_blocks = super()._term_postings(missing, lang)
            delta_blocks = None
            if self._delta is not None:
                d = self._delta.filter(F.col("term").isin(missing))
                if lang != ALL_LANG:
                    d = d.filter(F.col("lang") == lang)
                delta_blocks = d.select(
                    "delta", "term", "base_doc_id", "n", "doc_deltas", "tfs",
                    "impact_lang", "impact_all"
                ).toPandas()
            delta_order = sorted(self._delta_seq, key=self._delta_seq.get)
            for t in missing:
                tb = base_blocks[base_blocks["term"] == t]
                ids, tfv = self._decode_term(tb)
                ids, tfv = self._filter_tombstoned(ids, tfv, seq=0)
                if delta_blocks is not None:
                    parts = [(ids, tfv)]
                    for name in delta_order:
                        dt = delta_blocks[
                            (delta_blocks["term"] == t)
                            & (delta_blocks["delta"] == name)
                        ]
                        d_ids, d_tfv = self._decode_term(dt)
                        parts.append(
                            self._filter_tombstoned(
                                d_ids, d_tfv, seq=self._delta_seq[name]
                            )
                        )
                    ids, tfv = merge_tf_parts(parts)
                result[t] = (ids, tfv)
            # Evict only BETWEEN merges, after the call's results are safe.
            if len(self._merged_cache) > self.MERGED_CACHE_MAX:
                self._merged_cache.clear()
            for t in missing:
                self._merged_cache[(t, lang)] = result[t]
        return result

    def _filter_tombstoned_pos(
        self,
        decoded: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
        seq: int,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Tombstone-filter a positional decode: drop dead postings AND their
        position slices (one vectorized gather)."""
        ids, tfs, flat, starts = decoded
        dead = self._dead_mask(ids, seq)
        if dead is None:
            return decoded
        sel = np.flatnonzero(~dead)
        flat2, starts2 = _gather_slices(flat, starts, tfs, sel)
        return ids[sel], tfs[sel], flat2, starts2

    def _merged_term_positional(
        self, terms: list[str], lang: str
    ) -> dict[str, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """Positional twin of :meth:`_merged_term_arrays`: per term the
        merged, tombstone-filtered (ids asc, tfs, flat positions, posting
        starts) across base ∪ deltas — exactly the positional postings a
        rebuild would hold. Feeds the ``with_positions`` synthetic blocks so
        phrase queries work over un-compacted deltas."""
        from harvester_spark.search.phrase import _decode_term_positions

        result: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = {
            t: self._pos_cache[(t, lang)]
            for t in terms
            if (t, lang) in self._pos_cache
        }
        missing = [t for t in terms if t not in result]
        if missing:
            base_blocks = super()._term_postings(
                missing, lang, with_positions=True
            )
            delta_blocks = None
            if self._delta is not None:
                d = self._delta.filter(F.col("term").isin(missing))
                if lang != ALL_LANG:
                    d = d.filter(F.col("lang") == lang)
                delta_blocks = d.select(
                    "delta", "term", "base_doc_id", "n", "doc_deltas", "tfs",
                    "positions",
                ).toPandas()
            delta_order = sorted(self._delta_seq, key=self._delta_seq.get)
            for t in missing:
                tb = base_blocks[base_blocks["term"] == t]
                parts = [
                    self._filter_tombstoned_pos(_decode_term_positions(tb), seq=0)
                ]
                if delta_blocks is not None:
                    for name in delta_order:
                        dt = delta_blocks[
                            (delta_blocks["term"] == t)
                            & (delta_blocks["delta"] == name)
                        ]
                        if len(dt):
                            parts.append(
                                self._filter_tombstoned_pos(
                                    _decode_term_positions(dt),
                                    seq=self._delta_seq[name],
                                )
                            )
                result[t] = merge_pos_parts(parts)
            # Evict only after this call's results are held locally — a
            # mid-loop clear dropped entries the return still needed.
            if len(self._pos_cache) > self.POS_CACHE_MAX:
                self._pos_cache.clear()
            if len(self._merged_cache) > self.MERGED_CACHE_MAX:
                self._merged_cache.clear()
            for t in missing:
                merged = result[t]
                self._pos_cache[(t, lang)] = merged
                # ids/tfs are identical to the non-positional merge — share
                self._merged_cache[(t, lang)] = (merged[0], merged[1])
        return result

    def _dfs(self, terms: list[str], lang: str) -> dict[str, int]:
        """Post-delta document frequencies (the base dictionary's df counts
        tombstoned postings — idf must match what a rebuild computes)."""
        per = self._merged_term_arrays(terms, lang)
        return {t: int(per[t][0].size) for t in terms}

    def _term_postings(
        self, terms: list[str], lang: str, with_positions: bool = False
    ) -> pd.DataFrame:
        """Synthetic blocks re-encoded from the merged postings: every
        block-level consumer (AND/OR/conjunctive/distributed/phrase) decodes
        the post-delta truth without its own merge logic. With
        ``with_positions`` the merged per-posting position lists are
        re-encoded into each block (delta postings carry positions like the
        base; only the merge needed to thread them through)."""
        if with_positions and not self.has_positions:
            raise NotImplementedError(
                "positional search over a positionless base index — rebuild "
                "with positions (the round-2 default) first"
            )
        if with_positions:
            per_pos = self._merged_term_positional(terms, lang)
            per = {t: v[:2] for t, v in per_pos.items()}
        else:
            per = self._merged_term_arrays(terms, lang)
        lens = self._doc_lens()
        _n_all, avg_all = self._corpus_stats[ALL_LANG]
        avg_lang = None if lang == ALL_LANG else self._corpus_stats[lang][1]
        rows = []
        for t in terms:
            ids, tfv = per[t]
            rows.extend(
                synth_block_rows(
                    t, ids, tfv, lens, avg_all, avg_lang,
                    pos=per_pos[t][2:] if with_positions else None,
                )
            )
        cols = [
            "term", "base_doc_id", "max_doc_id", "n", "doc_deltas",
            "tfs", "impact_lang", "impact_all",
        ] + (["positions"] if with_positions else [])
        return pd.DataFrame(rows, columns=cols)
