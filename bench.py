"""Benchmark entrypoint (driver contract).

Prints ONE JSON line:
``{"metric": "indexed_docs_per_sec", "value": N, "unit": "sec", "queries":
{...}, "sf": ..., "scaling": {...}}``

Three sections:

1. headline operator queries timed on ``$SPARK_GRAFT_SF_DIR`` (default
   /root/testdata/sf0.1) at ``local[$SPARK_GRAFT_CPUS]``,
2. full-pipeline index build (extract → normalize → docID → SPIMI index) over
   a deterministic synthetic corpus (``$HS_BENCH_DOCS``, default 20000) —
   the BASELINE.json "indexed docs/sec" metric,
3. scaling evidence (driver-mandated sandbox substitute for N vs 4N
   executors): the same build at ``local[8]`` and ``local[32]`` on the same
   corpus parquet; efficiency = thr_4N / (4 * thr_N).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HEADLINE = [
    "ft_term_doc_freq",
    "ft_bm25_topk",
    "ft_and_match_count",
    "ft_top_terms_per_lang",
    "ft_quality_score",
    "ft_fingerprint",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "q1_pricing_summary",
    "j1_priority_first",
    "j5_region_revenue",
    "w2_latest_event_per_user",
    "events_hourly_rollup",
]


def _fresh_spark(cpus: int):
    from harvester_spark.session import get_spark

    return get_spark(
        f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )


def _build_throughput(spark, corpus_path: str, out_dir: str, n_docs: int) -> float:
    from harvester_spark.pipeline import run_build

    shutil.rmtree(out_dir, ignore_errors=True)
    corpus_df = spark.read.parquet(corpus_path)
    t0 = time.time()
    run_build(spark, out_dir, corpus_df=corpus_df, resume=False)
    return n_docs / (time.time() - t0)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("HS_BENCH_DOCS", "20000"))
    do_scaling = os.environ.get("HS_BENCH_SCALING", "1") != "0"
    default_work = "/dev/shm/hs_bench" if os.path.isdir("/dev/shm") else "/tmp/hs_bench"
    work = os.environ.get("HS_BENCH_WORK", default_work)

    from harvester_spark.operators import ALL_QUERIES
    from harvester_spark import corpus as corpus_mod

    timings: dict[str, float] = {}
    spark = _fresh_spark(cpus)

    # 1. headline operator queries on the sf dir
    for name in HEADLINE:
        fn, _sql = ALL_QUERIES[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    # 2. index-build throughput at local[cpus]
    corpus_path = os.path.join(work, f"corpus_{n_docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_mod.write_corpus(spark, corpus_path, n_docs)
    thr_main = _build_throughput(spark, corpus_path, os.path.join(work, "idx_main"), n_docs)
    timings["index_build"] = round(n_docs / thr_main, 3)
    spark.stop()

    # 3. scaling: same job, same input, local[8] vs local[32]
    scaling = {}
    if do_scaling:
        thr = {}
        for m in (8, 32):
            s = _fresh_spark(m)
            thr[m] = _build_throughput(
                s, corpus_path, os.path.join(work, f"idx_{m}"), n_docs
            )
            s.stop()
        scaling = {
            "docs_per_sec_local8": round(thr[8], 1),
            "docs_per_sec_local32": round(thr[32], 1),
            "efficiency_8_to_32": round(thr[32] / (4 * thr[8]), 3),
        }

    print(
        json.dumps(
            {
                "metric": "indexed_docs_per_sec",
                "value": round(thr_main, 1),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "n_docs_indexed": n_docs,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
