"""The north rule's deployment clause, exercised for real: the engine must
run via ``spark-submit --py-files`` with executors importing from the zip
artifact, not from a repo checkout on the driver's path."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import json, sys
from pyspark.sql import SparkSession, functions as F

# the only import source for these is --py-files (cwd is a scratch dir)
from readability_spark.pipeline import build_session, run_extraction
import readability_core

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \\
    .limit(40)
tr = docs.select(
    F.concat(F.lit("c"), (F.col("doc_id") % 4).cast("string"))
    .alias("conv_id"),
    (F.col("doc_id") / 4).cast("int").alias("turn_idx"),
    F.expr("concat('<html><body><article><p>', text, "
           "'</p></article></body></html>')").alias("text"))
out = run_extraction(tr, num_buckets=4)
row = out.agg(F.count("page_type").alias("n"),
              F.sum("char_yield").alias("y")).first()
print("SUBMIT_RESULT " + json.dumps(
    {"n": row["n"], "y": int(row["y"]),
     "core_from": readability_core.__file__}))
spark.stop()
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    # build the artifact fresh so it reflects the current source
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, check=True).stdout.strip()
    assert zip_path.endswith("readability.zip")
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", zip_path, str(job)],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines()
             if l.startswith("SUBMIT_RESULT ")]
    assert lines, (r.stdout[-1000:], r.stderr[-1000:])
    res = json.loads(lines[-1].split(" ", 1)[1])
    assert res["n"] == 40 and res["y"] > 0
    # the import really came from the zip, not the repo tree
    assert "readability.zip" in res["core_from"], res["core_from"]
