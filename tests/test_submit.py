"""North-rule ship path: the engine must run via
``spark-submit --py-files dist/inverted_index_spark.zip`` — executors
import the package from the shipped zip, not the repo cwd. This test
packages the zip, writes a standalone job (build → open → topk) into a
temp dir OUTSIDE the repo, and runs it under a real spark-submit."""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

JOB = """
import tempfile
from pyspark.sql import SparkSession
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts

spark = (
    SparkSession.builder.appName("submit-smoke")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix="submit_idx_")
docs = generate_transcripts(spark, 2000, include_doc_id=True)
store = SegmentStore(f"{tmp}/idx")
build_index(spark, docs, store, bucket_size=256)
s = Searcher(spark, store).open()
rows = s.topk(["w00000"], 3).collect()
assert rows, "no results"
print("SMOKE_OK", rows[0]["doc_id"], round(rows[0]["score"], 6))
spark.stop()
"""


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files(tmp_path):
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "package.py")], check=True
    )
    zip_path = REPO / "dist" / "inverted_index_spark.zip"
    assert zip_path.exists()
    job = tmp_path / "job.py"
    job.write_text(JOB)
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[8]",
            "--py-files",
            str(zip_path),
            str(job),
        ],
        cwd=tmp_path,  # NOT the repo: the zip must provide the package
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    smoke = [l for l in out.stdout.splitlines() if l.startswith("SMOKE_OK")]
    assert smoke, out.stdout[-2000:]
    # deterministic corpus → deterministic top hit
    assert smoke[0].split() == ["SMOKE_OK", "494", "0.057678"]
