"""Index catalog: atomic snapshot promotion over parquet directories.

The reference publishes a finished index by atomically repointing an alias at
the new OpenSearch index and removing it from the old one
(/root/reference/harvester/search/models/index.py:113-156); dataset versions
carry ``is_current``/``is_index_promoted`` flags
(core/models/datatypes/dataset.py:124-177). On a cluster this maps to an
Iceberg snapshot/branch swap; locally the same contract is a tiny JSON
manifest written via ``os.replace`` (atomic on POSIX): readers resolve
``current`` → version directory at open time, so a half-built index is never
visible and promotion is all-or-nothing.
"""

from __future__ import annotations

import json
import os
import time


class IndexCatalog:
    """``root/versions/<name>/...`` index builds + ``root/current.json``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "versions"), exist_ok=True)

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "current.json")

    def version_dir(self, name: str) -> str:
        return os.path.join(self.root, "versions", name)

    def promote(self, name: str) -> None:
        """Atomically point ``current`` at version ``name`` (alias swap).

        The staging file is UNIQUE per promoter (mkstemp): with a shared
        ``.tmp`` name two concurrent promoters could interleave write and
        replace and publish a torn manifest (found by
        tests/test_catalog_concurrency.py). With unique staging, concurrent
        promotes serialize to last-``os.replace``-wins and a reader can
        never observe a partial manifest — the Iceberg commit-conflict
        analogue (last snapshot wins; no torn metadata)."""
        import tempfile

        target = self.version_dir(name)
        if not os.path.isdir(target):
            raise FileNotFoundError(f"index version not built: {target}")
        fd, tmp = tempfile.mkstemp(
            dir=self.root, prefix="current.json.tmp."
        )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"current": name, "promoted_at": time.time()}, f)
            os.replace(tmp, self._manifest_path())  # atomic publish
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise

    def current(self) -> str | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)["current"]
        except FileNotFoundError:
            return None

    def current_dir(self) -> str:
        name = self.current()
        if name is None:
            raise FileNotFoundError("no index version promoted yet")
        return self.version_dir(name)

    def versions(self) -> list[str]:
        return sorted(os.listdir(os.path.join(self.root, "versions")))

    # ---- overlay versions (merge-on-read documents) -------------------
    #
    # A full documents rewrite per point-ingest batch is O(corpus) write
    # amplification — at the 100 TB design point a 500-doc push must never
    # copy the table (the reference's Django/OpenSearch side does point
    # updates; a lakehouse does merge-on-read deltas + periodic rewrite).
    # An OVERLAY version holds only the batch's post-merge rows plus
    # ``_overlay.json`` naming its base version; readers resolve
    # base-minus-overlaid-srns ∪ overlays with latest-wins per srn. The
    # chain is bounded by the compaction policy (streaming/webhook.py),
    # which folds overlays back into a materialized version.

    _OVERLAY_META = "_overlay.json"

    def write_version_meta(self, name: str, meta: dict) -> None:
        """Attach metadata to a version dir (atomic; the dir must exist).
        ``meta['base']`` (optional) marks an overlay over that version;
        ``meta['max_doc_id']`` carries the docID high-water mark so merges
        need no O(corpus) max() job."""
        import tempfile

        target = self.version_dir(name)
        fd, tmp = tempfile.mkstemp(dir=target, prefix="meta.tmp.")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(target, self._OVERLAY_META))

    def version_meta(self, name: str) -> dict | None:
        try:
            with open(os.path.join(self.version_dir(name), self._OVERLAY_META)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def chain(self, name: str | None = None) -> list[str]:
        """[newest overlay, ..., materialized base] for a version."""
        name = name if name is not None else self.current()
        if name is None:
            raise FileNotFoundError("no index version promoted yet")
        out = [name]
        seen = {name}
        while True:
            meta = self.version_meta(out[-1])
            base = meta.get("base") if meta else None
            if not base:
                return out
            if base in seen:
                raise ValueError(f"overlay cycle at version {base}")
            seen.add(base)
            out.append(base)

    def read_overlay_winners(self, spark, name: str | None = None):
        """Latest-wins fold of the overlay chain ONLY (None when the
        version is materialized) — the live pushed rows since the last
        fold. Row count is bounded by docs pushed since then, never by the
        corpus."""
        from pyspark.sql import Window, functions as F

        chain = self.chain(name)
        overlays = chain[:-1]  # newest first
        if not overlays:
            return None
        frames = [
            spark.read.parquet(self.version_dir(v)).withColumn("_ov", F.lit(i))
            # oldest gets the lowest precedence ordinal
            for i, v in enumerate(reversed(overlays), start=1)
        ]
        ov = frames[0]
        for fdf in frames[1:]:
            ov = ov.unionByName(fdf)
        w = Window.partitionBy("srn").orderBy(F.col("_ov").desc())
        return (
            ov.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_ov", "_rn")
        )

    def read_documents(self, spark, name: str | None = None):
        """Resolved documents DataFrame for a version (current by default).

        Overlays win over their base per srn; among overlays the newest
        wins. Overlay frames are batch-sized, so the anti-join against the
        base broadcasts — resolution costs one base scan, no base shuffle."""
        from pyspark.sql import functions as F

        chain = self.chain(name)
        base = spark.read.parquet(self.version_dir(chain[-1]))
        winners = self.read_overlay_winners(spark, name)
        if winners is None:
            return base
        cols = base.columns
        resolved = base.join(
            F.broadcast(winners.select("srn")), "srn", "anti"
        ).select(cols).unionByName(winners.select(cols))
        return resolved

    def document_dirs(self, name: str | None = None) -> list[str]:
        """Version dirs of the chain, newest first — for bounded point
        lookups (probe each dir, first hit per key wins)."""
        return [self.version_dir(v) for v in self.chain(name)]

    def max_doc_id(self, spark, name: str | None = None) -> int:
        """docID high-water mark: from version meta when present, else one
        max() over the resolved view (legacy versions without meta)."""
        name = name if name is not None else self.current()
        meta = self.version_meta(name)
        if meta and meta.get("max_doc_id") is not None:
            return int(meta["max_doc_id"])
        from pyspark.sql import functions as F

        row = self.read_documents(spark, name).agg(F.max("doc_id")).collect()[0]
        return -1 if row[0] is None else int(row[0])

    def expire(self, keep: int = 2) -> list[str]:
        """Retention: drop all but the newest ``keep`` versions — never the
        current one, never any version the current overlay chain depends on
        (clean_data semantics,
        /root/reference/harvester/core/management/commands/clean_data.py:28-57)."""
        import shutil

        cur = self.current()
        live = set(self.chain(cur)) if cur is not None else set()
        victims = [v for v in self.versions()[:-keep] if v not in live]
        for v in victims:
            shutil.rmtree(self.version_dir(v), ignore_errors=True)
        return victims
