"""Large-build validation: build an 8M-doc positional index, record
throughput + PEAK RSS of the whole process tree (python driver + JVM), then
spot-check correctness at the new scale via cross-path rank identity
(different code paths must agree exactly: exhaustive AND vs conjunctive
fast path vs distributed batch; WAND vs accumulator vs dispatched OR;
driver vs distributed phrase) and a dictionary-df recount.

Usage: python scripts/bench_build_8m.py [n_docs] [work_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_rss_gb(root_pid: int) -> float:
    """Sum RSS (GB) of root_pid and every descendant via /proc."""
    children: dict[int, list[int]] = {}
    rss_kb: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        pid = int(d)
        try:
            with open(f"/proc/{pid}/status") as f:
                ppid = rss = 0
                for line in f:
                    if line.startswith("PPid:"):
                        ppid = int(line.split()[1])
                    elif line.startswith("VmRSS:"):
                        rss = int(line.split()[1])
        except OSError:
            continue
        children.setdefault(ppid, []).append(pid)
        rss_kb[pid] = rss
    total, stack, seen = 0, [root_pid], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += rss_kb.get(p, 0)
        stack.extend(children.get(p, []))
    return total / 1024 / 1024


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/hs_8m"
    # validated 8M envelope (BENCH.md round-4): 24g heap + 4k arrow batches
    # → 76.8 GB peak tree RSS; 48g + default batches can OOM the 125G host
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    os.environ.setdefault("HS_ARROW_BATCH", "4000")

    peak = {"rss_gb": 0.0}
    stop = threading.Event()

    def sampler():
        me = os.getpid()
        while not stop.is_set():
            peak["rss_gb"] = max(peak["rss_gb"], _tree_rss_gb(me))
            stop.wait(3.0)

    t = threading.Thread(target=sampler, daemon=True)
    t.start()

    from harvester_spark.pipeline import run_build
    from harvester_spark.session import get_spark

    spark = get_spark("bench-8m", master="local[32]", shuffle_partitions=128)
    out = os.path.join(work, f"idx_{n_docs}")
    t0 = time.time()
    run_build(spark, out, n_docs=n_docs, resume=True, num_partitions=128)
    build_sec = round(time.time() - t0, 1)

    # ---- correctness spot-checks at scale: independent paths must agree
    import numpy as np
    from pyspark.sql import functions as F

    from harvester_spark.search.conjunctive import and_search_fast
    from harvester_spark.search.distributed import and_search_batch, or_search_batch
    from harvester_spark.search.engine import IndexSearcher
    from harvester_spark.search.phrase import phrase_match_ids
    from harvester_spark.search.wand import or_search

    s = IndexSearcher(spark, f"{out}/index")
    s._doc_lens()
    checks = {}

    q_and = "w00000 w00001"
    exact = s.search(q_and, k=10)  # auto-dispatches at this df scale
    fast = and_search_fast(s, q_and, k=10)
    stacked, totals = and_search_batch(spark, s, [("q", q_and)], k=10)
    checks["and_paths_identical"] = (
        list(exact.topk["doc_id"]) == list(fast.topk["doc_id"]) == list(stacked["doc_id"])
        and list(exact.topk["score"]) == list(fast.topk["score"]) == list(stacked["score"])
        and exact.results_total == totals["q"]
    )

    q_or = "w00000 term_7"
    wandk = or_search(s, q_or, k=10, strategy="wand")
    acc = or_search(s, q_or, k=10, strategy="accumulate")
    bat = or_search(s, q_or, k=10, strategy="batch")
    checks["or_paths_identical"] = (
        list(wandk["doc_id"]) == list(acc["doc_id"]) == list(bat["doc_id"])
        and list(wandk["score"]) == list(acc["score"]) == list(bat["score"])
    )

    ids_drv = phrase_match_ids(s, "block max wand", slop=2)
    from harvester_spark.search.distributed import phrase_match_ids_batch

    ids_bat = phrase_match_ids_batch(spark, s, "block max wand", slop=2)
    checks["phrase_slop_driver_eq_batch"] = bool(np.array_equal(ids_drv, ids_bat))

    # dictionary df recount for probe terms (Spark SQL over raw postings)
    # postings hold per-language blocks only; the dictionary's 'all' rows
    # are their per-term sums — recount across every language
    probe = ["w00000", "term_7", "block"]
    dfs = s._dfs(probe, "all")
    post = spark.read.parquet(f"{out}/index/postings").filter(
        F.col("term").isin(probe)
    )
    recount = {
        r["term"]: int(r["df"])
        for r in post.groupBy("term").agg(F.sum("n").alias("df")).collect()
    }
    checks["dictionary_df_matches_recount"] = all(
        dfs[t] == recount.get(t, 0) for t in probe
    )

    stop.set()
    t.join(5)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "build_or_resume_sec": build_sec,
                "docs_per_sec": round(n_docs / build_sec, 1),
                "peak_tree_rss_gb": round(peak["rss_gb"], 2),
                "checks": checks,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
