"""Stage-level wall-time profile of the bench build at one parallelism level.

Usage: python tools/profile_build.py <cpus> [n_docs]

Prints per-stage seconds so the serial floor (stages that do NOT shrink with
cores) is visible. Mirrors bench.py's _timed_build path exactly (corpus
parquet read -> run_build), but instruments the stages by monkey-timing the
IndexBuilder._run_stage boundary and the pipeline sub-steps.
"""
from __future__ import annotations

import os
import shutil
import sys
import time


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
    work = "/dev/shm/hs_profile"
    os.makedirs(work, exist_ok=True)

    sys.path.insert(0, "/root/repo")
    from harvester_spark.session import get_spark
    from harvester_spark import corpus as corpus_mod

    spark = get_spark(f"profile-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=4 * cpus)

    corpus_path = os.path.join(work, f"corpus_{n_docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_mod.write_corpus(spark, corpus_path, n_docs)

    # warm-up small build (JIT, python workers)
    from harvester_spark.pipeline import run_build
    warm = os.path.join(work, "idx_warm")
    shutil.rmtree(warm, ignore_errors=True)
    corpus_df = spark.read.parquet(corpus_path)
    run_build(spark, warm, corpus_df=corpus_df.limit(2000), resume=False,
              num_partitions=4 * cpus)

    # instrumented build
    from harvester_spark.index import build as build_mod
    marks: list[tuple[str, float]] = []
    orig_run_stage = build_mod.IndexBuilder._run_stage

    def timed_run_stage(self, name, df_fn, resume, partition_by=None):
        t0 = time.time()
        out = orig_run_stage(self, name, df_fn, resume, partition_by)
        marks.append((f"stage:{name}", time.time() - t0))
        return out

    build_mod.IndexBuilder._run_stage = timed_run_stage

    import harvester_spark.pipeline as pipe
    orig_build_documents = pipe.build_documents

    def timed_build_documents(corpus, num_partitions=None, verify_extraction=True):
        t0 = time.time()
        out = orig_build_documents(corpus, num_partitions, verify_extraction)
        marks.append(("build_documents(lazy-decl)", time.time() - t0))
        return out

    pipe.build_documents = timed_build_documents

    # time IndexBuilder.build as a whole (covers the precomputed-stats /
    # precomputed-head-terms path run_build actually takes)
    orig_build = build_mod.IndexBuilder.build

    def timed_build(self, *args, **kwargs):
        t0 = time.time()
        out = orig_build(self, *args, **kwargs)
        marks.append(("IndexBuilder.build total", time.time() - t0))
        return out

    build_mod.IndexBuilder.build = timed_build

    out_dir = os.path.join(work, f"idx_{cpus}")
    shutil.rmtree(out_dir, ignore_errors=True)
    t_all0 = time.time()
    run_build(spark, out_dir, corpus_df=corpus_df, resume=False,
              num_partitions=4 * cpus)
    total = time.time() - t_all0
    marks.append(("documents phase (total - builder)",
                  total - next(dt for n, dt in marks
                               if n == "IndexBuilder.build total")))
    print(f"\n=== cpus={cpus} n_docs={n_docs} total={total:.2f}s "
          f"({n_docs/total:.0f} docs/s) loadavg={os.getloadavg()}")
    for name, dt in marks:
        print(f"  {name:45s} {dt:7.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
