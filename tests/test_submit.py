"""North-rule mechanics end-to-end: the job really runs under
``spark-submit --py-files engine.zip job.py`` in a fresh process — no
repo on sys.path, engine code resolved from the shipped zip — and commits
resumable bucket output."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

from pdf_table_extractor_spark import synth
from pdf_table_extractor_spark.ship import package_zip

N_DOCS = 30


def test_spark_submit_py_files(spark, tmp_path):
    spark_submit = os.path.join(
        os.path.dirname(shutil.which("pyspark") or sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        spark_submit = shutil.which("spark-submit")
    if not spark_submit:
        pytest.skip("spark-submit not on PATH")

    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    synth.synth_spark(spark, N_DOCS, parallelism=2).write.parquet(pages)

    zip_path = package_zip()
    job_py = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pdf_table_extractor_spark",
        "job.py",
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only engine source
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            job_py,
            "--pages", pages,
            "--out", out,
            "--buckets", "2",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=str(tmp_path),  # NOT the repo root — nothing importable from cwd
        env=env,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    assert "committed buckets: [0, 1]" in proc.stdout

    from pdf_table_extractor_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(out)
    assert cat.committed_buckets() == [0, 1]
    urls = [r.url for r in cat.read_data(spark).select("url").collect()]
    assert len(urls) == len(set(urls)) == N_DOCS
