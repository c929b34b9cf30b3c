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
    from harvester_spark.search.wand import or_search
    from harvester_spark.session import get_spark

    spark = get_spark("bench-2m", master="local[32]", shuffle_partitions=64)
    out = os.path.join(work, f"idx_{n_docs}")
    t0 = time.time()
    run_build(spark, out, n_docs=n_docs, resume=True, num_partitions=64)
    build_sec = round(time.time() - t0, 1)

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
    }
    # fast path must agree with the exact ranking
    exact = s.search("w00000 w00001 w00002", k=10)
    fast = and_search_fast(s, "w00000 w00001 w00002", k=10)
    res["fast_equals_exact"] = list(fast.topk["doc_id"]) == list(exact.topk["doc_id"]) and (
        list(fast.topk["score"]) == list(exact.topk["score"])
    )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
