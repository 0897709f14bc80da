"""Packaging + spark-submit --py-files smoke (north rule: the job ships
via spark-submit --py-files on a cluster; here local[2] stands in)."""

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_builds_zip(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package

    out = package.build(str(tmp_path))
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    assert "entity_resolver_spark/__init__.py" in names
    assert "entity_resolver_spark/pipeline.py" in names
    assert not any("__pycache__" in n for n in names)


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files_end_to_end(spark, corpus, tmp_path):
    """Run the real spark-submit binary with ONLY the zip on the path
    (cwd is a temp dir, PYTHONPATH cleared) — proving the artifact is
    self-contained."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package

    zip_path = package.build(str(tmp_path))
    turns, _ = corpus
    inp = str(tmp_path / "turns")
    turns.where("conv_id < 'conv_00008'").write.parquet(inp)
    out = str(tmp_path / "resolved")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--input", inp,
            "--output", out,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert {"conv_id", "cluster", "canonical_text", "confidence_score"} <= set(got.columns)
    assert os.path.exists(out + "_metrics.json")


def test_metrics_sidecar_via_hadoop_fs(spark, tmp_path):
    """The sidecar goes through the Hadoop FileSystem API so DFS output
    paths (hdfs:// / s3a://) work on a real cluster; local paths use
    the file:// filesystem and must round-trip."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from submit_job import _write_sidecar

    target = str(tmp_path / "resolved_metrics.json")
    _write_sidecar(spark, target, json.dumps([{"stage": "x", "rows": 1}]))
    with open(target) as f:
        assert json.load(f) == [{"stage": "x", "rows": 1}]
