"""Delta compaction: fold accumulated deltas + tombstones back into a clean
base index.

The incremental path (delta postings + tombstone filtering) trades write
amplification for read amplification; periodic compaction restores read
performance (SURVEY.md §2.10 "tombstones + periodic compaction; correctness
tests that base∪delta == rebuild"). Compaction here is a REBUILD over the
current merged documents into a fresh catalog version followed by an atomic
promote — the same strategy the reference uses (new index + alias swap,
/root/reference/harvester/search/models/index.py:72-156) and the only one
that also re-densifies block layout after many small deltas.

A cheaper block-level merge (decode base∪delta per term, drop tombstones,
re-encode) is possible when only postings changed; at 10^12-doc scale the
rebuild is restricted to the shards whose lineage shows delta activity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from harvester_spark.index.build import IndexBuilder, read_analyzer_markers
from harvester_spark.index.catalog import IndexCatalog


def _chain_kwargs(prev_index_dir: str | None, decompound_words) -> dict:
    """Carry the previous index's analyzer chain into the rebuild: the
    common-grams term list comes back from the persisted marker; a
    decompound build (wordlist not persisted) requires the caller's words —
    compacting with a different chain would silently change which phrase /
    compound queries match."""
    cg_terms = None
    if prev_index_dir is not None:
        cg_terms, analyzer = read_analyzer_markers(prev_index_dir)
        if analyzer.get("decompound_nl") and decompound_words is None:
            raise ValueError(
                "index was built with the nl decompound analyzer chain; pass "
                "the same decompound_words so the compacted index matches"
            )
    return {"common_gram_terms": cg_terms, "decompound_words": decompound_words}


def compact(
    spark: SparkSession,
    catalog: IndexCatalog,
    index_root: str,
    version_name: str,
    num_partitions: int | None = None,
    prev_index_dir: str | None = None,
    decompound_words=None,
) -> dict[str, DataFrame]:
    """Rebuild the current documents version into a fresh index + promote.

    ``index_root`` holds per-version index dirs (``<root>/<version>``); the
    documents come from the catalog's resolved current version (overlay
    chains fold at read). ``prev_index_dir`` (the index being superseded)
    carries its analyzer chain into the rebuild. Returns the new tables.
    """
    documents = catalog.read_documents(spark)
    new_index_dir = os.path.join(index_root, version_name)
    builder = IndexBuilder(spark, new_index_dir, build_id=f"compact-{version_name}")
    tables = builder.build(
        documents, resume=False, num_partitions=num_partitions,
        **_chain_kwargs(prev_index_dir, decompound_words),
    )
    return tables


def merge_deltas(
    spark: SparkSession,
    index_dir: str,
    docs_catalog: IndexCatalog,
    decompound_words=None,
) -> bool:
    """Tier-merge the live delta chain into ONE delta (and the documents
    overlay chain into one overlay version) — the Lucene-style minor merge.

    Cost is O(docs pushed since the last base fold): the merged delta is
    re-encoded from the overlay winners' CURRENT text (same analyzer chain
    markers as any delta apply), which resolves every intra-chain
    supersede for free — no decode-and-interleave of member blocks, and
    latest-wins stays unambiguous because all merged postings land at the
    chain's max seq while member tombstones (folded to per-doc max seq)
    keep targeting base postings below it. Totals are untouched (a merge
    moves no documents), so stats stay exact. The base index and the
    materialized documents version are never rewritten — that is the
    ratio-triggered FULL fold's job (``compact_in_place``).

    Returns True when a merge was published.
    """
    import json

    from pyspark.sql import Window, functions as F

    from harvester_spark.index.build import encode_postings, postings_rows
    from harvester_spark.search.engine import fold_totals, read_delta_state

    state = read_delta_state(index_dir)
    if not state or len(state.get("deltas", [])) < 2:
        return False
    winners = docs_catalog.read_overlay_winners(spark)
    if winners is None:
        # materialized documents under a multi-delta index: legacy callers
        # that applied deltas without overlays — nothing to tier-merge from
        return False
    cg_terms, analyzer = read_analyzer_markers(index_dir)
    if analyzer.get("decompound_nl") and decompound_words is None:
        raise ValueError(
            "index was built with the nl decompound analyzer chain; pass the "
            "same decompound_words so the merged delta matches"
        )
    winners = winners.cache()
    try:
        deltas = state["deltas"]
        seq = int(state["seq"])
        name = f"merged-{seq:06d}"
        # current avgdl: exact manifest totals (patch mode) or the full
        # corpus_stats snapshot (legacy full-stats deltas)
        folded = fold_totals(state)
        if folded is not None:
            avgdl = {lang: (s / n) if n else 0.0 for lang, (n, s) in folded.items()}
        else:
            from harvester_spark.search.engine import stats_paths

            avgdl = {
                r["lang"]: float(r["avgdl"])
                for r in spark.read.parquet(stats_paths(index_dir)[1]).collect()
            }

        actives = winners.filter(
            (F.col("state") == "active") & F.col("text").isNotNull()
        )
        has_postings = not actives.isEmpty()
        if has_postings:
            rows = postings_rows(
                actives.select("doc_id", "text", "lang", "doc_len"),
                decompound_words=decompound_words,
                common_gram_terms=cg_terms,
            )
            encode_postings(rows, avgdl).write.mode("overwrite").partitionBy(
                "lang"
            ).parquet(f"{index_dir}/postings_delta/delta={name}")

        # member tombstones fold to per-doc max seq (exactly the reader's
        # fold) — all of them target base postings (seq 0 < any member seq)
        tomb_paths = [
            f"{index_dir}/tombstones/{d.get('dir', d['name'])}" for d in deltas
        ]
        tomb = (
            spark.read.parquet(*tomb_paths)
            .groupBy("doc_id")
            .agg(F.max("seq").alias("seq"))
        )
        tomb.select(
            F.col("doc_id").cast("long"), F.col("seq").cast("long")
        ).write.mode("overwrite").parquet(f"{index_dir}/tombstones/{name}")

        # stats patches fold latest-wins per doc_id (within a seq the
        # upsert outranks its paired removal — an update's final state)
        entry = {"name": name, "seq": seq, "has_postings": has_postings, "dir": name}
        patches = [
            (d["stats_patch"], int(d["seq"]))
            for d in deltas
            if d.get("stats_patch")
        ]
        if patches:
            frames = []
            for pdir, pseq in patches:
                frames.append(
                    spark.read.parquet(f"{index_dir}/{pdir}").withColumn(
                        "_seq", F.lit(pseq)
                    )
                )
            allp = frames[0]
            for fdf in frames[1:]:
                allp = allp.unionByName(fdf)
            w = Window.partitionBy("doc_id").orderBy(
                F.col("_seq").desc(), F.col("removed").asc()
            )
            merged_patch_dir = f"stats/m{seq:06d}"
            (
                allp.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("doc_id", "lang", "doc_len", "removed")
                .write.mode("overwrite")
                .parquet(f"{index_dir}/{merged_patch_dir}")
            )
            entry["stats_patch"] = merged_patch_dir
            totals: dict[str, list[int]] = {}
            for d in deltas:
                for lang, (dn, ds) in (d.get("totals_delta") or {}).items():
                    t = totals.setdefault(lang, [0, 0])
                    t[0] += int(dn)
                    t[1] += int(ds)
            entry["totals_delta"] = totals

        new_state = dict(state)
        new_state["deltas"] = [entry]
        tmp = os.path.join(index_dir, f"delta_state.json.tmp.{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, os.path.join(index_dir, "delta_state.json"))

        # documents side: fold the overlay chain into one overlay version
        # (index manifest first — a crash between the two publishes leaves
        # content identical either way, just an unmerged chain)
        cur = docs_catalog.current()
        chain = docs_catalog.chain(cur)
        merged_version = cur + "m"
        winners.write.mode("overwrite").option(
            "parquet.block.size", 4 * 1024 * 1024
        ).parquet(docs_catalog.version_dir(merged_version))
        docs_catalog.write_version_meta(
            merged_version,
            {
                "base": chain[-1],
                "max_doc_id": docs_catalog.max_doc_id(spark, cur),
            },
        )
        docs_catalog.promote(merged_version)
        return True
    finally:
        winners.unpersist()


def compact_in_place(
    spark: SparkSession, index_dir: str, merged_documents: DataFrame,
    num_partitions: int | None = None, decompound_words=None,
) -> dict[str, DataFrame]:
    """Compact an index dir that has accumulated deltas: rebuild into
    ``<dir>.compact`` (same analyzer chain as the old index) then atomically
    swap directories."""
    import shutil

    tmp_dir = index_dir + ".compact"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    builder = IndexBuilder(spark, tmp_dir, build_id="compact")
    tables = builder.build(
        merged_documents, resume=False, num_partitions=num_partitions,
        **_chain_kwargs(index_dir, decompound_words),
    )
    old_dir = index_dir + ".old"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(index_dir, old_dir)
    os.rename(tmp_dir, index_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    return tables
