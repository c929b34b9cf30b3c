"""Validate the 3-way `auto` OR dispatch at 8M docs (round-5; the
constants were tuned at 2M — BENCH.md "session-10 mix table").

Runs every session-10 mix row against an existing index with all four
strategies (auto / wand / maxscore / accumulate), best-of-2 warm, asserts
rank identity across strategies, and reports what auto picked plus its
time vs the best fixed strategy. Gate (VERDICT r4 #4): auto within 20% of
best fixed on every row and never losing to wand.

Usage: python scripts/bench_or_dispatch_8m.py <index_dir> [k]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIX_ROWS = [
    ("3head", "w00000 w00001 w00002"),
    ("mid_head", "w01000 w00000 w00001"),
    ("rare_head", "w04999 w00000"),
    ("2head", "w00000 w00001"),
    ("mid_mid", "w01000 w01001 w01002"),
    ("rare_rare", "w04999 w04998"),
    ("rare_mid", "w04999 w01000"),
    ("head_mid_rare", "w00000 w01000 w04999"),
]
STRATEGIES = ["wand", "maxscore", "accumulate"]


def main() -> None:
    index_dir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from harvester_spark.search.engine import IndexSearcher
    from harvester_spark.search.wand import or_search
    from harvester_spark.session import get_spark

    spark = get_spark("or-dispatch-8m", master="local[32]", shuffle_partitions=64)
    s = IndexSearcher(spark, index_dir)
    s._doc_lens()  # warm

    def best2(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    rows = {}
    gate_within20 = True
    gate_never_loses_to_wand = True
    for name, q in MIX_ROWS:
        or_search(s, q, k=k)  # warm this term set
        r = {}
        ranked = {}
        for strat in STRATEGIES:
            r[strat] = best2(lambda: or_search(s, q, k=k, strategy=strat))
            out = or_search(s, q, k=k, strategy=strat)
            ranked[strat] = (list(out["doc_id"]), list(out["score"]))
        r["auto"] = best2(lambda: or_search(s, q, k=k))
        _, st = or_search(s, q, k=k, with_stats=True)
        r["auto_picks"] = st.get("strategy")
        assert len({str(v) for v in ranked.values()}) == 1, f"rank split on {name}"
        fixed_best = min(r[x] for x in STRATEGIES)
        r["auto_vs_best_fixed"] = round(r["auto"] / fixed_best, 2) if fixed_best else 1.0
        if r["auto"] > 1.2 * fixed_best + 0.05:
            gate_within20 = False
        if r["auto"] > r["wand"] * 1.2 + 0.05:
            gate_never_loses_to_wand = False
        rows[name] = r

    print(
        json.dumps(
            {
                "metric": "or_dispatch_8m",
                "index_dir": index_dir,
                "k": k,
                "rows": rows,
                "gate_auto_within_20pct": gate_within20,
                "gate_never_loses_to_wand": gate_never_loses_to_wand,
                "loadavg": round(os.getloadavg()[0], 1),
            }
        )
    )
    spark.stop()
    if not (gate_within20 and gate_never_loses_to_wand):
        sys.exit(1)


if __name__ == "__main__":
    main()
