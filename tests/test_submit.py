"""The packaging contract: the pipeline must run via
``spark-submit --py-files dedupe_spark.zip`` (north_star / README recipe) —
this runs the REAL spark-submit on the real zip, from a directory that does
NOT contain the package, so imports can only resolve through --py-files."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = tmp_path / "dedupe_spark.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", str(zip_path), "dedupe_spark"],
        cwd=REPO,
        check=True,
    )
    # copy the entrypoint out of the repo: its sys.path.insert(parent-dir)
    # must NOT be able to find the package locally — only the zip counts
    script = tmp_path / "run_pipeline.py"
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), script)
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--driver-memory", "6g",
            "--py-files", str(zip_path),
            str(script),
            "--fixture", "--fixture-size", "120",
            "--workdir", str(tmp_path / "wd"),
            "--master", "local[4]",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert json_lines, out.stdout[-2000:]
    metrics = json.loads(json_lines[-1])
    assert metrics["pairwise_f1"]["f1"] >= 0.99
    assert metrics["n_clusters"] > 0
    assert metrics["records"]["rows"] > 0  # stage metrics made it through
