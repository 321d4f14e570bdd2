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
    """The stateful streaming operator must emit every session the final
    watermark can PROVE complete (end + watermark delay + gap strictly
    before the stream's max event time), byte-equal aggregates to batch
    sessionize; everything it emits must exist in the batch result; and
    nothing is emitted twice.  Sessions ending inside the final watermark
    window legitimately stay buffered — an endless stream would flush them
    on the next watermark advance."""
    from collections import Counter
    from readability_spark.ops.relational import sessionize
    from readability_spark.streaming import stream_sessionize

    sf_dir = "/root/testdata/sf0.001"

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    inp = str(tmp_path / "in")
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

    # batch twin, plus per-session end ts to reason about the watermark
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (events
            .withColumn("new_session",
                        F.when(gap.isNull() | (gap > 30 * 60), 1)
                        .otherwise(0))
            .withColumn("session_no", F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.floor(F.col("value") * 100).cast("long"))
                 .alias("session_value_cents"),
                 F.max(F.unix_timestamp("ts")).alias("end_s")))
    rows = sess.collect()
    # the batch operator itself must agree with this twin
    batch_keys = Counter(
        (r["user_id"], r["n_events"], r["session_value_cents"])
        for r in sessionize(spark, sf_dir).collect())
    everything = Counter((r["user_id"], r["n_events"],
                          r["session_value_cents"]) for r in rows)
    assert batch_keys == everything

    max_s = events.agg(F.max(F.unix_timestamp("ts"))).first()[0]
    # final watermark ≈ max_ts - 30min; flush needs wm - end > gap (30min);
    # 2s slack for ms truncation at the boundary
    must_emit = Counter(
        (r["user_id"], r["n_events"], r["session_value_cents"])
        for r in rows if r["end_s"] < max_s - (30 + 30) * 60 - 2)
    assert sum(must_emit.values()) > 0
    assert not must_emit - got, "provably-complete session missing"
    assert not got - everything, "stream emitted a session batch never saw"


def test_stream_sessionize_disordered_across_microbatches(spark, tmp_path):
    """Late data WITHIN the watermark must not corrupt sessions even when
    it arrives in a LATER microbatch: here file 2 delivers an event that
    belongs to a session file 1 already moved past (10:14 arrives after
    12:00).  The pre-r3 implementation kept only the open session in state,
    so 10:14 was folded into the 12:00 session (start 12:00, end 10:14);
    buffering up to the watermark restores batch parity."""
    from readability_spark.streaming import stream_sessionize

    from datetime import datetime

    schema = "user_id long, event_id long, ts timestamp, value double"
    t = lambda h, m: datetime(2024, 1, 1, h, m)
    f1 = spark.createDataFrame(
        [(1, 0, t(10, 0), 1.0),
         (1, 2, t(12, 0), 3.0)], schema)
    f2 = spark.createDataFrame(
        [(1, 1, t(10, 14), 2.0),        # late: within watermark
         (1, 3, t(16, 0), 9.0)], schema)  # advances the watermark
    inp = tmp_path / "in"
    inp.mkdir()
    # two files, one per microbatch, in arrival order
    f1.coalesce(1).write.parquet(str(inp / "f1"))
    f2.coalesce(1).write.parquet(str(inp / "f2"))
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .parquet(str(inp) + "/*"))
    q = (stream_sessionize(src).writeStream
         .format("memory").queryName("sess_disorder")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["user_id"], r["session_start"].strftime("%H:%M"),
            r["session_end"].strftime("%H:%M"), r["n_events"],
            r["session_value_cents"])
           for r in spark.sql("select * from sess_disorder").collect()}
    # batch semantics: [10:00, 10:14] one session, [12:00] another; the
    # 16:00 closer stays open (inside the final watermark window)
    assert (1, "10:00", "10:14", 2, 300) in got
    assert (1, "12:00", "12:00", 1, 300) in got
    assert len(got) == 2
