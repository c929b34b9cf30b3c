"""Large-index serving benchmark: build a 2M-doc positional index and time
the worst-case query classes (BENCH.md "Query serving" section).

Usage: python scripts/bench_serving_2m.py [n_docs] [work_dir]
Prints one JSON line with build + per-class latencies, including the
conjunctive fast path vs the exact-total AND on head∧head queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/hs_2m"
    # 2M docs cache ~5 GB of normalized batches while 32 tasks hold unroll
    # buffers — the 8g default heap OOMs intermittently. (On a cluster this
    # is per-executor memory sizing; local[32] concentrates it in one JVM.)
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from harvester_spark.pipeline import run_build
    from harvester_spark.search.conjunctive import and_search_fast
    from harvester_spark.search.engine import IndexSearcher
    from harvester_spark.search.phrase import positional_phrase_search
    from harvester_spark.search.sqs import sqs_search
    from harvester_spark.search.wand import or_search
    from harvester_spark.session import get_spark

    spark = get_spark("bench-2m", master="local[32]", shuffle_partitions=64)
    out = os.path.join(work, f"idx_{n_docs}")
    t0 = time.time()
    tables = run_build(spark, out, n_docs=n_docs, resume=True, num_partitions=64)
    build_sec = round(time.time() - t0, 1)

    # HS_2M_COMMON_GRAMS=1: additionally build a common-grams index (head
    # terms df >= n_docs/2) and report the head-and-head phrase pathology
    # on both (BENCH.md worst-case table).
    cg_searcher = None
    if os.environ.get("HS_2M_COMMON_GRAMS") == "1":
        from pyspark.sql import functions as F

        from harvester_spark.index.build import IndexBuilder

        docs = tables["documents"]
        cg_idx = os.path.join(work, f"idx_{n_docs}_cg")
        dict_df = spark.read.parquet(f"{out}/index/dictionary")
        cg_terms = [
            r["term"]
            for r in dict_df.filter(
                (F.col("lang") == "all") & (F.col("df") >= n_docs // 2)
            ).select("term").collect()
        ]
        IndexBuilder(spark, f"{cg_idx}/index").build(
            docs, resume=True, num_partitions=64, common_gram_terms=cg_terms
        )

    s = IndexSearcher(spark, f"{out}/index")
    s._doc_lens()  # warm the doc-length sidecar off the clock

    def t(fn, *a, **k):
        best = float("inf")
        for _ in range(3):
            t1 = time.time()
            fn(*a, **k)
            best = min(best, time.time() - t1)
        return round(best, 3)

    res = {
        "n_docs": n_docs,
        "build_or_resume_sec": build_sec,
        "rare_term": t(s.search, "w04999", 10),
        "head_and_head_exact": t(s.search, "w00000 w00001", 10),
        "three_head_and_exact": t(s.search, "w00000 w00001 w00002", 10),
        "head_and_head_fast": t(and_search_fast, s, "w00000 w00001", 10),
        "three_head_and_fast": t(and_search_fast, s, "w00000 w00001 w00002", 10),
        "phrase_positional": t(positional_phrase_search, s, "block max wand", 10),
        "or_wand_3head": t(or_search, s, "w00000 w00001 w00002", 10),
        "or_maxscore_3head": t(
            or_search, s, "w00000 w00001 w00002", 10, strategy="maxscore"
        ),
        # round-4 3-way auto gate: auto must be within 20% of the best
        # fixed strategy on every mix row and never lose to wand
        # (or_wand_3head above is historical naming — it times the DEFAULT
        # strategy, i.e. auto)
        "or_auto_mid_head": t(or_search, s, "w01000 w00000 w00001", 10),
        "or_accumulate_3head": t(
            or_search, s, "w00000 w00001 w00002", 10, strategy="accumulate"
        ),
        # MaxScore sweet spot: mid-df driver + head tails — probe-only mode
        # skips candidate-free head blocks (stats below)
        "or_accumulate_mid_head": t(
            or_search, s, "w01000 w00000 w00001", 10, strategy="accumulate"
        ),
        "or_maxscore_mid_head": t(
            or_search, s, "w01000 w00000 w00001", 10, strategy="maxscore"
        ),
        "or_wand_mid_head": t(
            or_search, s, "w01000 w00000 w00001", 10, strategy="wand"
        ),
        # ~N grammar: fuzzy = dictionary scan + banded DP + expansion OR;
        # sloppy rare-word phrase = positional chain over pruned blocks;
        # sloppy head∧head = the decode-heavy pathology (common-grams can't
        # help: bigrams encode adjacency, not proximity)
        "fuzzy_1edit": t(sqs_search, s, "w0499x~1", 10),
        "phrase_slop_rare": t(sqs_search, s, '"block max wand"~3', 10),
        "phrase_slop_headhead": t(sqs_search, s, '"w00000 w00001"~2', 10),
    }
    # distributed twins for the head∧head phrase pathologies: the ~100M-
    # position decode spreads across executors by docID range instead of
    # serializing on the driver (best-of-2: Spark jobs)
    from harvester_spark.search.distributed import phrase_search_batch

    def t2(qs):
        best = float("inf")
        for _ in range(2):
            t1 = time.time()
            phrase_search_batch(spark, s, qs, k=10, n_ranges=64)
            best = min(best, time.time() - t1)
        return round(best, 3)

    res["phrase_headhead_batch"] = t2([("q", "w00000 w00001", 0)])
    res["phrase_slop_headhead_batch"] = t2([("q", "w00000 w00001", 2)])
    if os.environ.get("HS_2M_COMMON_GRAMS") == "1":
        cg_s = IndexSearcher(spark, os.path.join(work, f"idx_{n_docs}_cg", "index"))
        cg_s._doc_lens()
        res["phrase_headhead_common_grams"] = t(
            positional_phrase_search, cg_s, "w00000 w00001", 10
        )
        a = positional_phrase_search(cg_s, "w00000 w00001", 10)
        t1 = time.time()  # single shot — the plain pathology costs ~a minute
        b = positional_phrase_search(s, "w00000 w00001", 10)
        res["phrase_headhead_plain"] = round(time.time() - t1, 3)
        res["cg_equals_plain"] = (
            list(a.topk["doc_id"]) == list(b.topk["doc_id"])
            and a.results_total == b.results_total
        )

    # suggestion surfaces: bounded dictionary probes (round-3 rework) — the
    # cold row includes the probe + per-length bucket encode; warm rows serve
    # from the per-searcher bucket caches
    from harvester_spark.search.api import SearchAPI

    api = SearchAPI(spark, f"{out}/index", tables["documents"])
    t1 = time.time()
    api.did_you_mean("w0499x")
    res["did_you_mean_cold"] = round(time.time() - t1, 3)
    res["did_you_mean"] = t(api.did_you_mean, "w0501x")
    res["autocomplete_prefix"] = t(api.autocomplete, "w049", 10)
    # highlight cost at 2M docs: bounded by the k result docs (one pyarrow
    # text point-fetch + O(hits x window) per doc) — the delta vs the plain
    # search row IS the highlighter
    res["search_and_k10"] = t(api.search, "w00000 w00001", 10)
    res["search_and_k10_highlight"] = t(
        api.search, "w00000 w00001", 10, highlight=True
    )
    res["fuzzy_1edit_warm"] = t(sqs_search, s, "w0499x~1", 10)

    # fast path must agree with the exact ranking
    exact = s.search("w00000 w00001 w00002", k=10)
    fast = and_search_fast(s, "w00000 w00001 w00002", k=10)
    res["fast_equals_exact"] = list(fast.topk["doc_id"]) == list(exact.topk["doc_id"]) and (
        list(fast.topk["score"]) == list(exact.topk["score"])
    )
    # all three OR strategies must agree bit-for-bit at this scale; record
    # the probe-only decode savings MaxScore gets on the mid+head mix
    ms, ms_stats = or_search(
        s, "w01000 w00000 w00001", k=10, strategy="maxscore", with_stats=True
    )
    acc = or_search(s, "w01000 w00000 w00001", k=10, strategy="accumulate")
    res["maxscore_equals_accumulate"] = list(ms["doc_id"]) == list(
        acc["doc_id"]
    ) and list(ms["score"]) == list(acc["score"])
    res["maxscore_blocks_skipped"] = int(ms_stats.get("blocks_skipped", 0))
    res["maxscore_blocks_decoded"] = int(ms_stats.get("blocks_decoded", 0))
    # what the round-4 3-way auto dispatch actually picks per mix
    for key, q in (
        ("auto_picks_mid_head", "w01000 w00000 w00001"),
        ("auto_picks_3head", "w00000 w00001 w00002"),
        ("auto_picks_rare_head", "w04999 w00000"),
    ):
        _, st = or_search(s, q, k=10, with_stats=True)
        res[key] = st.get("strategy")
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
