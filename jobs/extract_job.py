"""Production entry point: spark-submit-able per-turn extraction job.

Usage (local or cluster — the driver only differs in --master):

    python tools/make_pyfiles.py              # build build/readability.zip
    spark-submit --py-files build/readability.zip \\
        jobs/extract_job.py \\
        --input  /path/to/transcripts \\
        --output /path/to/results \\
        --metrics /path/to/metrics \\
        [--format parquet|iceberg] [--buckets N] [--char-threshold 500] \\
        [--no-resume]

The job is the north-rule pipeline: read → resume anti-join against the
lineage table → salted repartition → Arrow-batched extraction → results +
per-bucket metrics.  On an Iceberg catalog pass --format iceberg and table
identifiers instead of paths.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--char-threshold", type=int, default=500)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from readability_spark.pipeline import build_session, run_pipeline

    # ONE source of truth for the pipeline-critical session config
    # (AQE, Arrow batch size, python-worker socket buffer): hand-rolling
    # the builder here drifted from build_session when levers changed.
    # Master/memory/GC ride spark-submit --conf / --master on a cluster.
    spark = build_session("readability-extract")
    spark.sparkContext.setLogLevel("WARN")

    stats = run_pipeline(
        spark, args.input, args.output, args.metrics,
        num_buckets=args.buckets, char_threshold=args.char_threshold,
        fmt=args.format, resume=not args.no_resume)
    print(json.dumps({"job": "readability-extract", **stats}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
