"""Kill-resume identity at scale (round-5): SIGKILL a fresh 8M-doc build
mid-flight (twice), resume it, and prove the final index is BYTE-identical
to an uninterrupted build of the same corpus.

The resume path (pending-work filter + dedup-against-processed,
index/build.py) is pytest-proven at toy scale; this validates it where it
matters — a multi-hundred-second build whose kill points land inside the
heavy extract/tokenize/encode stages, with the round-4/5 concurrency
(overlapped sample/stats jobs) active. Byte-identity holds because every
derived artifact is deterministic given the corpus (Philox docs, global
(set_name, srn) docIDs, layout-independent head-term sampling) — the
content dirs must hash equal file-by-file.

Usage:
  python scripts/resume_kill_8m.py [n_docs] [work_dir]        # driver
  python scripts/resume_kill_8m.py --worker <out_dir> <n_docs>  # internal
Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMPARE_DIRS = [
    "documents",
    "index/postings",
    "index/dictionary",
    "index/doc_stats",
    "index/corpus_stats",
]
KILL_FRACTIONS = [0.35, 0.7]  # of the uninterrupted build's wall time


def _worker(out: str, n_docs: int) -> None:
    # the validated 8M envelope (BENCH.md round-4): 24g heap + 4k arrow
    # batches → 76.8 GB peak tree RSS; a 48g heap with default batches
    # OOMs the 125G host when anything else is resident
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    os.environ.setdefault("HS_ARROW_BATCH", "4000")
    from harvester_spark.pipeline import run_build
    from harvester_spark.session import get_spark

    spark = get_spark(
        "resume-kill", master="local[32]", shuffle_partitions=128
    )
    run_build(spark, out, n_docs=n_docs, resume=True, num_partitions=128)
    spark.stop()


def _run_worker(out: str, n_docs: int, kill_after: float | None = None) -> float:
    """Run a build subprocess (own session group so the SIGKILL takes the
    JVM down with it — a real node crash, not a polite shutdown). Returns
    wall seconds; on kill, returns after the group is dead."""
    t0 = time.time()
    log = open(f"{out}.worker.log", "ab")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", out, str(n_docs)],
        start_new_session=True,
        stdout=log,
        stderr=subprocess.STDOUT,
    )
    if kill_after is None:
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"worker failed rc={rc}, see {out}.worker.log")
    else:
        time.sleep(kill_after)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass  # finished early — resume run will be a no-op re-verify
        proc.wait()
    return time.time() - t0


def _canon(name: str) -> str:
    """Strip the per-write random task UUID Spark embeds in part file
    names (part-00000-<uuid>-c000...) — the ordinal is the identity; the
    UUID differs per job even for byte-identical content."""
    import re

    return re.sub(
        r"(part-\d+)-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
        r"\1",
        name,
    )


def _tree_md5(root: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for sub in COMPARE_DIRS:
        base = os.path.join(root, sub)
        for dirpath, _dirs, files in os.walk(base):
            for f in sorted(files):
                if f.endswith(".crc") or f == "doc_lens.f8.npy":
                    continue  # transport checksums / lazily-built sidecar
                p = os.path.join(dirpath, f)
                h = hashlib.md5()
                with open(p, "rb") as fh:
                    for chunk in iter(lambda: fh.read(1 << 20), b""):
                        h.update(chunk)
                out[_canon(os.path.relpath(p, root))] = h.hexdigest()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/hs_resume"
    # the uninterrupted tree lives on disk (HS_RESUME_A_DIR) so tmpfs only
    # ever holds ONE 8M tree + the build's shuffle spill — two trees plus
    # the 77 GB build RSS exceed the 125 GB host (measured: global OOM)
    a_dir = os.path.join(
        os.environ.get("HS_RESUME_A_DIR", work), "uninterrupted"
    )
    b_dir = os.path.join(work, "killed")
    os.makedirs(os.path.dirname(a_dir), exist_ok=True)
    import shutil

    shutil.rmtree(a_dir, ignore_errors=True)
    shutil.rmtree(b_dir, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    t_full = _run_worker(a_dir, n_docs)
    kills = []
    for frac in KILL_FRACTIONS:
        kills.append(round(_run_worker(b_dir, n_docs, kill_after=frac * t_full), 1))
    t_resume = _run_worker(b_dir, n_docs)

    ha, hb = _tree_md5(a_dir), _tree_md5(b_dir)
    only_a = sorted(set(ha) - set(hb))
    only_b = sorted(set(hb) - set(ha))
    diff = sorted(k for k in set(ha) & set(hb) if ha[k] != hb[k])
    byte_identical = not (only_a or only_b or diff)

    # File layout is NOT part of the identity contract: AQE coalescing and
    # task boundaries legitimately vary between an uninterrupted run and a
    # resumed one (measured: documents/dictionary part counts and row-group
    # packing differ while postings/doc_stats/corpus_stats match
    # byte-for-byte). The contract is per-table CONTENT identity — exact
    # row multiset (count + order-independent row-hash fold) for every
    # compared table; serving reads values, not file boundaries.
    import duckdb

    con = duckdb.connect()
    tables = {}
    content_identical = True
    for sub in COMPARE_DIRS:
        touched = [k for k in set(only_a) | set(only_b) | set(diff) if k.startswith(sub)]
        if not touched:
            tables[sub] = "byte-identical"
            continue
        qa = con.execute(
            f"SELECT count(*), bit_xor(hash(t)) FROM read_parquet('{a_dir}/{sub}/*.parquet') t"
        ).fetchone()
        qb = con.execute(
            f"SELECT count(*), bit_xor(hash(t)) FROM read_parquet('{b_dir}/{sub}/*.parquet') t"
        ).fetchone()
        ok = qa == qb
        content_identical = content_identical and ok
        tables[sub] = (
            f"content-identical ({qa[0]} rows; file layout differs)"
            if ok
            else f"CONTENT MISMATCH a={qa} b={qb}"
        )
    print(
        json.dumps(
            {
                "metric": "resume_kill_identity",
                "n_docs": n_docs,
                "uninterrupted_sec": round(t_full, 1),
                "killed_runs_sec": kills,
                "resume_sec": round(t_resume, 1),
                "files_compared": len(ha),
                "byte_identical_files": byte_identical,
                "content_identical": content_identical,
                "tables": tables,
            }
        )
    )
    if not content_identical:
        sys.exit(1)


if __name__ == "__main__":
    main()
