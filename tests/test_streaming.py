"""Structured Streaming ingestion tests (availableNow trigger, file sink)."""

import os

import pytest
from pyspark.sql import functions as F

from readability_spark.streaming import (
    run_stream,
    stream_conversation_stats,
    stream_extract,
    stream_source,
)
from readability_spark.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp = str(base / "in")
    generate_transcripts(spark, n_convs=12, seed=5, use_fixtures=False) \
        .repartition(4).write.mode("overwrite").parquet(inp)
    return {
        "in": inp,
        "out": str(base / "out"),
        "ckpt": str(base / "ckpt"),
    }


def test_stream_extract_end_to_end(spark, stream_dirs):
    q = run_stream(spark, stream_dirs["in"], stream_dirs["out"],
                   stream_dirs["ckpt"], num_buckets=8)
    q.awaitTermination(300)
    out = spark.read.parquet(stream_dirs["out"])
    n_in = spark.read.parquet(stream_dirs["in"]).count()
    assert out.count() == n_in
    assert "page_type" in out.columns and "bucket_id" in out.columns
    assert out.filter(F.col("page_type") == "article").count() > 0


def test_stream_restart_is_exactly_once(spark, stream_dirs):
    # second run with the same checkpoint: no new files, no duplicates
    q = run_stream(spark, stream_dirs["in"], stream_dirs["out"],
                   stream_dirs["ckpt"], num_buckets=8)
    q.awaitTermination(300)
    out = spark.read.parquet(stream_dirs["out"])
    n_in = spark.read.parquet(stream_dirs["in"]).count()
    assert out.count() == n_in


def test_windowed_stats_plan_is_streaming(spark, stream_dirs):
    extracted = stream_extract(stream_source(spark, stream_dirs["in"]), 8)
    stats = stream_conversation_stats(extracted)
    assert stats.isStreaming
    assert "n_articles" in stats.columns
