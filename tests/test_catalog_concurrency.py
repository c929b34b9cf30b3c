"""Concurrent-writer / concurrent-reader contract for the atomic-publish
protocols (round-3, verdict item 9): the parquet+manifest emulation of
Iceberg's commit semantics must never expose a torn state.

- ``IndexCatalog.promote`` (index/catalog.py): N processes promoting
  different versions in a tight loop while M reader processes poll
  ``current()`` — every observed manifest parses, names a version whose
  directory (and completion marker) exists, and writes serialize to
  last-write-wins.
- ``delta_state.json`` publish (streaming/incremental.py apply protocol):
  N processes staging their own delta dirs and publishing with the same
  ``os.replace`` step — every state a reader observes parses and references
  only fully-staged delta dirs.

These are pure file-protocol tests (no Spark), so they hammer the race
window hard (thousands of iterations)."""

import json
import multiprocessing as mp
import os
import time

from harvester_spark.index.catalog import IndexCatalog

N_WRITERS = 4
N_READERS = 3
WRITE_ITERS = 150
READ_SECONDS = 3.0


def _promote_loop(root: str, wid: int, barrier):
    cat = IndexCatalog(root)
    barrier.wait()
    for i in range(WRITE_ITERS):
        name = f"w{wid}_v{i:04d}"
        d = cat.version_dir(name)
        os.makedirs(d, exist_ok=True)
        # completion marker written BEFORE promotion — the promote contract
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("ok")
        cat.promote(name)


def _reader_loop(root: str, out, barrier):
    cat = IndexCatalog(root)
    barrier.wait()
    bad = []
    n = 0
    t0 = time.time()
    while time.time() - t0 < READ_SECONDS:
        try:
            cur = cat.current()
        except json.JSONDecodeError as e:  # torn manifest
            bad.append(f"unparseable manifest: {e}")
            continue
        if cur is None:
            continue
        n += 1
        d = cat.version_dir(cur)
        if not os.path.isdir(d):
            bad.append(f"current -> missing dir {cur}")
        elif not os.path.exists(os.path.join(d, "_SUCCESS")):
            bad.append(f"current -> incomplete version {cur}")
    out.put((n, bad))


def test_concurrent_promote_never_torn(tmp_root):
    root = os.path.join(tmp_root, "cat_conc")
    barrier = mp.Barrier(N_WRITERS + N_READERS)
    out: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_promote_loop, args=(root, w, barrier))
        for w in range(N_WRITERS)
    ] + [
        mp.Process(target=_reader_loop, args=(root, out, barrier))
        for _ in range(N_READERS)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join(60)
        assert p.exitcode == 0
    total_reads = 0
    for _ in range(N_READERS):
        n, bad = out.get(timeout=10)
        total_reads += n
        assert bad == [], bad[:5]
    assert total_reads > 100  # the readers really raced the writers
    # last-write-wins: the final manifest names an existing complete version
    cat = IndexCatalog(root)
    assert os.path.exists(os.path.join(cat.current_dir(), "_SUCCESS"))


def _delta_publish_loop(index_dir: str, wid: int, barrier):
    """The apply_index_delta publish protocol: stage dirs fully, then one
    os.replace of delta_state.json (incremental.py:apply_index_delta)."""
    barrier.wait()
    for i in range(WRITE_ITERS):
        name = f"d{wid}_{i:04d}"
        pdir = os.path.join(index_dir, "postings_delta", f"delta={name}")
        tdir = os.path.join(index_dir, "tombstones", name)
        os.makedirs(pdir, exist_ok=True)
        os.makedirs(tdir, exist_ok=True)
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write("ok")
        # read-modify-write of the manifest (single-writer in production —
        # foreachBatch serializes; here we hammer the PUBLISH atomicity)
        state_path = os.path.join(index_dir, "delta_state.json")
        try:
            with open(state_path) as f:
                state = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            state = {"seq": 0, "deltas": [], "stats_dir": None}
        seq = int(state["seq"]) + 1
        entry = {"name": name, "seq": seq, "has_postings": True, "dir": name}
        new_state = {
            "seq": seq,
            "deltas": state["deltas"][-8:] + [entry],
            "stats_dir": None,
        }
        tmp = state_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(new_state, f)
        os.replace(tmp, state_path)  # the atomic publish under test


def _delta_reader_loop(index_dir: str, out, barrier):
    barrier.wait()
    bad = []
    n = 0
    t0 = time.time()
    state_path = os.path.join(index_dir, "delta_state.json")
    while time.time() - t0 < READ_SECONDS:
        try:
            with open(state_path) as f:
                state = json.load(f)
        except FileNotFoundError:
            continue
        except json.JSONDecodeError as e:
            bad.append(f"torn delta_state: {e}")
            continue
        n += 1
        for d in state["deltas"]:
            pdir = os.path.join(
                index_dir, "postings_delta", f"delta={d['dir']}", "_SUCCESS"
            )
            if not os.path.exists(pdir):
                bad.append(f"manifest references unstaged delta {d['dir']}")
    out.put((n, bad))


def test_concurrent_delta_publish_never_torn(tmp_root):
    index_dir = os.path.join(tmp_root, "delta_conc")
    os.makedirs(index_dir, exist_ok=True)
    barrier = mp.Barrier(N_WRITERS + N_READERS)
    out: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_delta_publish_loop, args=(index_dir, w, barrier))
        for w in range(N_WRITERS)
    ] + [
        mp.Process(target=_delta_reader_loop, args=(index_dir, out, barrier))
        for _ in range(N_READERS)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join(60)
        assert p.exitcode == 0
    total = 0
    for _ in range(N_READERS):
        n, bad = out.get(timeout=10)
        total += n
        assert bad == [], bad[:5]
    assert total > 100
