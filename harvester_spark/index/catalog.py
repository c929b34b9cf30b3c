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

    def expire(self, keep: int = 2) -> list[str]:
        """Retention: drop all but the newest ``keep`` versions, never the
        current one (clean_data semantics,
        /root/reference/harvester/core/management/commands/clean_data.py:28-57)."""
        import shutil

        cur = self.current()
        victims = [v for v in self.versions()[:-keep] if v != cur]
        for v in victims:
            shutil.rmtree(self.version_dir(v), ignore_errors=True)
        return victims
