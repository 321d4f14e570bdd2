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


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """The stateful streaming operator must emit every gap-closed session
    (byte-equal aggregates to batch sessionize) plus whatever open sessions
    the final watermark batch times out — i.e. closed ⊆ emitted ⊆ all, as
    multisets, with nothing invented and nothing closed twice."""
    from collections import Counter
    from readability_spark.ops.relational import sessionize
    from readability_spark.streaming import stream_sessionize

    sf_dir = "/root/testdata/sf0.001"

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    inp = str(tmp_path / "in")
    # file source needs a dir; one time-ordered file = event-time-ordered
    # ingest (the operator's documented arrival assumption)
    events.orderBy("ts", "event_id").coalesce(1).write.parquet(inp)
    src = spark.readStream.schema(events.schema).parquet(inp)
    q = (stream_sessionize(src).writeStream
         .format("memory").queryName("sess_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = Counter((r["user_id"], r["n_events"], r["session_value_cents"])
                  for r in spark.sql("select * from sess_stream").collect())

    batch = sessionize(spark, sf_dir).collect()
    last_no = {}
    for r in batch:
        last_no[r["user_id"]] = max(last_no.get(r["user_id"], -1),
                                    r["session_no"])
    key = lambda r: (r["user_id"], r["n_events"], r["session_value_cents"])
    closed = Counter(key(r) for r in batch
                     if r["session_no"] != last_no[r["user_id"]])
    everything = Counter(key(r) for r in batch)
    assert not closed - got, "gap-closed session missing from the stream"
    assert not got - everything, "stream emitted a session batch never saw"
    assert sum(closed.values()) > 0
    # the final watermark batch should flush most open sessions by timeout
    assert sum(got.values()) > sum(closed.values())
