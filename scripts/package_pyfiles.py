"""Package harvester_spark into dist/harvester_spark.zip for --py-files."""

from __future__ import annotations

import os
import zipfile


def main() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dist = os.path.join(root, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "harvester_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(root, "harvester_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    print(out)
    return out


if __name__ == "__main__":
    main()
