"""Concurrent-client serving benchmark: N client threads replaying the
reference query set against a large positional index, vs a single-stream
baseline on the same warm searcher (BENCH.md "Concurrent serving" section).

All other latency numbers in BENCH.md are single-stream; a real search API
serves parallel clients. The searcher's read path is pyarrow dataset scans +
numpy mmap kernels (GIL released in the hot loops), so threads are the
honest client model for one driver process — the same shape a pyspark-based
search API process would run (the reference serves via OpenSearch's own
threadpool; here the engine IS the process under test).

Usage: python scripts/bench_serving_concurrent.py [n_docs] [n_clients] [rounds] [work_dir]
Prints one JSON line:
  - single-stream per-class p50/max (each query best-of-3, warm)
  - concurrent per-class p50/p99/max over n_clients * rounds replays
    (per-thread deterministically shuffled order so clients don't run in
    lockstep), aggregate QPS, and the per-class p99 / single-stream-p50
    ratio (round-5 gate: no class's concurrent p99 > 3x single-stream).
"""

from __future__ import annotations

import json
import os
import random
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cls(query_id: str) -> str:
    """Query class = query_id with its trailing ordinal stripped."""
    head, _, tail = query_id.rpartition("_")
    return head if tail.isdigit() else query_id


def _pct(samples: list[float], q: float) -> float:
    s = sorted(samples)
    return s[min(len(s) - 1, int(q * len(s)))]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    work = sys.argv[4] if len(sys.argv) > 4 else "/dev/shm/hs_2m"
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from harvester_spark.pipeline import run_build
    from harvester_spark.queryset import reference_queries
    from harvester_spark.search.engine import IndexSearcher
    from harvester_spark.session import get_spark

    # FAIR scheduling with one pool per client: heavy queries auto-dispatch
    # to Spark batch jobs at this scale, and under FIFO a single head∧head
    # job's stages head-of-line-block every other client (measured: mixed
    # AND p99 31.8 s vs 0.57 s single-stream — 56x, pure starvation). Pools
    # are scheduled fairly against each other, so one client's heavy job
    # costs the others a fair share, not the whole machine. On a cluster
    # this is the standard multi-tenant serving setup; pinned-thread mode
    # (PySpark 4 default) carries each client thread's pool onto its jobs.
    spark = get_spark(
        "bench-serving-conc",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    out = os.path.join(work, f"idx_{n_docs}")
    t0 = time.time()
    run_build(spark, out, n_docs=n_docs, resume=True, num_partitions=64)
    build_sec = round(time.time() - t0, 1)

    searcher = IndexSearcher(spark, os.path.join(out, "index"))
    qset = list(reference_queries().head(20).itertuples(index=False))

    # Warm pass (same rationale as bench.py): dictionary row-group probes,
    # postings footers, doc-length mmap, each class's code path.
    for q in qset:
        searcher.search(q.query_text, k=q.k, lang=q.lang)

    # ---- single-stream baseline: best-of-3 per query, per-class rollup
    single: dict[str, list[float]] = {}
    for q in qset:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            searcher.search(q.query_text, k=q.k, lang=q.lang)
            best = min(best, time.time() - t0)
        single.setdefault(_cls(q.query_id), []).append(best)
    # single-stream QPS = one sequential pass at warm best-case latencies
    single_wall = sum(t for lst in single.values() for t in lst)

    # ---- concurrent replay: n_clients threads, each `rounds` full set
    # replays in a per-thread deterministic shuffle (no lockstep).
    samples: list[list[tuple[str, float]]] = [[] for _ in range(n_clients)]
    errors: list[str] = []
    barrier = threading.Barrier(n_clients + 1)

    def client(cid: int) -> None:
        rng = random.Random(cid)
        order = list(qset)
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"client-{cid}")
        # cap one query's task-slot footprint to its fair share of the box
        # (32 slots / n_clients): a dispatched head∧head job then COSTS a
        # fair share instead of relying on preemption-free FAIR interleave
        spark.sparkContext.setLocalProperty(
            "hs.serving.n_ranges", str(max(2, 32 // max(1, n_clients)))
        )
        barrier.wait()
        try:
            for _ in range(rounds):
                rng.shuffle(order)
                for q in order:
                    t0 = time.time()
                    searcher.search(q.query_text, k=q.k, lang=q.lang)
                    samples[cid].append((_cls(q.query_id), time.time() - t0))
        except Exception as exc:  # surface, don't hang the join
            errors.append(f"client {cid}: {exc!r}")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t_conc0 = time.time()
    for t in threads:
        t.join()
    conc_wall = time.time() - t_conc0
    if errors:
        raise RuntimeError("; ".join(errors))

    conc: dict[str, list[float]] = {}
    for lst in samples:
        for cls, sec in lst:
            conc.setdefault(cls, []).append(sec)

    n_total = sum(len(lst) for lst in samples)
    per_class = {}
    worst_ratio = 0.0
    for cls in sorted(conc):
        s_p50 = _pct(single[cls], 0.5)
        c = conc[cls]
        ratio = _pct(c, 0.99) / s_p50 if s_p50 > 0 else float("inf")
        worst_ratio = max(worst_ratio, ratio)
        per_class[cls] = {
            "n": len(c),
            "single_p50_ms": round(s_p50 * 1e3, 1),
            "single_max_ms": round(max(single[cls]) * 1e3, 1),
            "conc_p50_ms": round(_pct(c, 0.5) * 1e3, 1),
            "conc_p99_ms": round(_pct(c, 0.99) * 1e3, 1),
            "conc_max_ms": round(max(c) * 1e3, 1),
            "p99_vs_single_p50": round(ratio, 2),
        }

    print(json.dumps({
        "metric": "concurrent_serving",
        "n_docs": n_docs,
        "n_clients": n_clients,
        "rounds": rounds,
        "build_sec": build_sec,
        "single_stream_qps": round(len(qset) / single_wall, 1),
        "concurrent_qps": round(n_total / conc_wall, 1),
        "n_queries_concurrent": n_total,
        "worst_p99_vs_single_p50": round(worst_ratio, 2),
        "gate_3x": worst_ratio <= 3.0,
        "per_class": per_class,
        "loadavg": round(os.getloadavg()[0], 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
