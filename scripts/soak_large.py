"""Large-scale streaming soak: a 2M-doc base index absorbing ~100k webhook
docs across hundreds of micro-batches (round-5; BENCH.md "Streaming soak at
scale").

What this proves that the toy soak (tests/test_streaming_soak.py) cannot:

- per-batch ingest cost is O(batch), not O(corpus): the overlay documents
  versions + patch-mode stats keep a 500-doc push from ever rewriting the
  2M-doc table or its stats (the round-4 path did both, every batch),
- delta-serving latency stays BOUNDED as pushes accumulate, because the
  tiered compaction policy (count trigger → tier-merge, ratio trigger →
  full fold) holds the delta chain at <= compact_max_deltas forever,
- the ≤N-delta invariant and final bit-identity vs a fresh rebuild hold at
  a realistic base:delta ratio.

Prints one JSON line per REPORT_EVERY batches:
  {"batch": B, "apply_sec": s, "deltas": n, "chain": c, "serve_ms": {...}}
and a final summary line. Exits nonzero on any invariant breach.

Usage: python scripts/soak_large.py [n_base] [n_batches] [batch_docs] [work_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPORT_EVERY = 10
COMPACT_MAX_DELTAS = 3
QUERIES = ["w00000", "w00000 w00001", "soaked marker", "w00100"]


def _link_tree(src: str, dst: str) -> None:
    """Hard-link copy (same filesystem) — cheap snapshot of a built index."""
    for root, dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            os.link(os.path.join(root, f), os.path.join(out, f))


def _batch_rows(batch_ix: int, batch_docs: int):
    """Deterministic mixed batch: ~80% inserts, ~15% updates of earlier
    pushes, ~5% deletes — every doc carries head terms + a unique marker."""
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(minutes=batch_ix)
    rows = []
    n_upd = batch_docs * 15 // 100 if batch_ix > 0 else 0
    n_del = batch_docs * 5 // 100 if batch_ix > 3 else 0
    n_ins = batch_docs - n_upd - n_del
    for j in range(n_ins):
        i = 90_000_000 + batch_ix * 10_000 + j
        body = (
            f"soaked pushed document w{(i * 7) % 200:05d} "
            f"w{(i * 13) % 5000:05d} marker{i} body text stream"
        )
        rows.append(
            (f"https://example.org/soak/{i}", ts, f"<p>{body}</p>", "en", False)
        )
    for j in range(n_upd):
        i = 90_000_000 + (batch_ix - 1) * 10_000 + j
        rows.append(
            (
                f"https://example.org/soak/{i}",
                ts,
                f"<p>soaked updated document w00001 marker{i} rev{batch_ix}</p>",
                "en",
                False,
            )
        )
    for j in range(n_del):
        i = 90_000_000 + (batch_ix - 4) * 10_000 + 500 + j
        rows.append((f"https://example.org/soak/{i}", ts, "<p>x</p>", "en", True))
    return rows


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    batch_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    work = sys.argv[4] if len(sys.argv) > 4 else "/dev/shm/hs_soak"
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from harvester_spark.index.catalog import IndexCatalog
    from harvester_spark.pipeline import run_build
    from harvester_spark.search.engine import read_delta_state
    from harvester_spark.session import get_spark
    from harvester_spark.streaming.incremental import DeltaSearcher
    from harvester_spark.streaming.webhook import process_webhook_batch

    spark = get_spark("soak-large", master="local[32]", shuffle_partitions=64)
    base_out = os.path.join(work, f"base_{n_base}")
    t0 = time.time()
    run_build(spark, base_out, n_docs=n_base, resume=True, num_partitions=64)
    build_sec = round(time.time() - t0, 1)

    import shutil

    # fresh soak state every run; only the base build is reused (resume)
    shutil.rmtree(os.path.join(work, "catalog"), ignore_errors=True)
    shutil.rmtree(os.path.join(work, "index"), ignore_errors=True)
    catalog = IndexCatalog(os.path.join(work, "catalog"))
    _link_tree(f"{base_out}/documents", catalog.version_dir("v000000"))
    catalog.promote("v000000")
    index_dir = os.path.join(work, "index")
    _link_tree(f"{base_out}/index", index_dir)

    schema = "url string, warc_ts timestamp, html string, lang string, deleted boolean"
    serve_series: list[dict] = []
    apply_series: list[float] = []
    for b in range(n_batches):
        bdf = spark.createDataFrame(_batch_rows(b, batch_docs), schema)
        t0 = time.time()
        process_webhook_batch(
            spark, bdf, b, catalog, index_dir,
            compact_max_deltas=COMPACT_MAX_DELTAS, keep_versions=3,
        )
        apply_sec = time.time() - t0
        apply_series.append(apply_sec)
        state = read_delta_state(index_dir)
        n_deltas = len(state["deltas"]) if state else 0
        assert n_deltas <= COMPACT_MAX_DELTAS, (b, n_deltas)
        chain = len(catalog.chain())
        assert chain <= COMPACT_MAX_DELTAS + 2, (b, chain)
        if (b + 1) % REPORT_EVERY == 0 or b == n_batches - 1:
            # serving latency on a FRESH searcher (worst case: manifest,
            # tombstones, stats patches all loaded cold)
            ds = DeltaSearcher(spark, index_dir)
            serve = {}
            for q in QUERIES:
                t1 = time.time()
                ds.search(q, k=10)
                serve[q] = round((time.time() - t1) * 1e3, 1)
            serve_series.append({"batch": b + 1, **serve})
            print(
                json.dumps(
                    {
                        "batch": b + 1,
                        "apply_sec": round(apply_sec, 2),
                        "deltas": n_deltas,
                        "chain": chain,
                        "serve_ms": serve,
                    }
                ),
                flush=True,
            )

    # ---- bounded-latency assertion: the LAST quarter's serving latency
    # must not exceed 3x the first quarter's (chain growth must not leak
    # into serving as pushes accumulate)
    def _mean(block):
        vals = [v for row in block for k, v in row.items() if k != "batch"]
        return sum(vals) / len(vals)

    q = max(1, len(serve_series) // 4)
    first, last = _mean(serve_series[:q]), _mean(serve_series[-q:])
    bounded = last <= 3 * first
    # ---- final identity vs a fresh rebuild of the resolved corpus
    docs = catalog.read_documents(spark)
    rb_dir = os.path.join(work, "rebuild_final")
    import shutil

    shutil.rmtree(rb_dir, ignore_errors=True)
    from harvester_spark.index.build import IndexBuilder
    from harvester_spark.search.engine import IndexSearcher

    IndexBuilder(spark, rb_dir).build(docs, resume=False, num_partitions=64)
    rs = IndexSearcher(spark, rb_dir)
    ds = DeltaSearcher(spark, index_dir)
    identity = True
    for qq in QUERIES + ["w00001", "soaked updated"]:
        a, bb = ds.search(qq, k=20), rs.search(qq, k=20)
        same = list(a.topk["doc_id"]) == list(bb.topk["doc_id"]) and list(
            a.topk["score"]
        ) == list(bb.topk["score"]) and a.results_total == bb.results_total
        identity = identity and same
        if not same:
            print(f"IDENTITY MISMATCH on {qq!r}", file=sys.stderr)

    n_pushed = sum(len(_batch_rows(b, batch_docs)) for b in range(n_batches))
    summary = {
        "metric": "soak_large",
        "n_base": n_base,
        "n_batches": n_batches,
        "docs_pushed": n_pushed,
        "base_build_sec": build_sec,
        "apply_sec_mean": round(sum(apply_series) / len(apply_series), 2),
        "apply_sec_p90": round(sorted(apply_series)[int(0.9 * len(apply_series))], 2),
        "apply_sec_max": round(max(apply_series), 2),
        "serve_ms_first_quarter": round(first, 1),
        "serve_ms_last_quarter": round(last, 1),
        "latency_bounded_3x": bounded,
        "final_identity_vs_rebuild": identity,
        "loadavg": round(os.getloadavg()[0], 1),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()
    if not (bounded and identity):
        sys.exit(1)


if __name__ == "__main__":
    main()
