"""spark-submit entrypoint for the index build.

Usage (north_rule launch contract)::

    python scripts/package_pyfiles.py                       # → dist/harvester_spark.zip
    spark-submit --py-files dist/harvester_spark.zip \\
        scripts/build_index.py --corpus /path/to/corpus_parquet \\
        --out /path/to/warehouse [--shards 4] [--partitions 64] [--resume]

    # or with a synthetic corpus:
    spark-submit --py-files dist/harvester_spark.zip \\
        scripts/build_index.py --n-docs 100000 --out /path/to/warehouse

The master comes from spark-submit (``--master local[8]`` in the sandbox,
YARN/K8s on a cluster); the script never hard-codes one. Prints one JSON
line with build metrics.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="input corpus parquet path")
    ap.add_argument("--n-docs", type=int, help="generate a synthetic corpus of N docs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    if not args.corpus and not args.n_docs:
        ap.error("one of --corpus / --n-docs is required")

    from harvester_spark.session import get_spark
    from harvester_spark.pipeline import run_build

    spark = get_spark("harvester-index-build")
    corpus_df = spark.read.parquet(args.corpus) if args.corpus else None
    t0 = time.time()
    tables = run_build(
        spark,
        args.out,
        n_docs=args.n_docs,
        corpus_df=corpus_df,
        resume=args.resume,
        n_shards=args.shards,
        num_partitions=args.partitions,
    )
    wall = time.time() - t0
    n_docs = tables["documents"].count()
    print(
        json.dumps(
            {
                "built_docs": n_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "postings_blocks": tables["postings"].count(),
                "dictionary_terms": tables["dictionary"].count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
