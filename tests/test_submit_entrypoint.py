"""spark-submit --py-files launch contract (north_rule)."""

import json
import os
import shutil
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_root):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "package_pyfiles.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    assert os.path.exists(zip_path)

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out_dir = os.path.join(tmp_root, "submit_build")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(root, "scripts", "build_index.py"),
            "--n-docs",
            "200",
            "--out",
            out_dir,
            "--partitions",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=tmp_root,  # NOT the repo root — forces imports through the zip
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["built_docs"] == 200
    assert metrics["docs_per_sec"] > 0
    assert os.path.exists(os.path.join(out_dir, "index", "postings", "_SUCCESS"))
