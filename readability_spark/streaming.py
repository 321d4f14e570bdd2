"""Structured Streaming ingestion: extract turns as they land.

The reference is strictly batch (SURVEY.md §2.13: no streaming operators),
and the north rule's 10^12-turn table is static — but a production
transcript pipeline also has an ingest tail, so the engine exposes the
same extraction as a streaming stage:

- ``stream_extract``: file-source readStream → salted extraction (the same
  extract_udf — stateless per turn, so it is trivially streamable) →
  append-mode writeStream with checkpointing.  Exactly-once via the file
  sink's commit log; the batch pipeline's lineage/metrics table remains
  the source of truth for resume.
- ``stream_conversation_stats``: watermarked sliding-window aggregation of
  extraction yields per conversation — the late-data-tolerant rollup a
  monitoring surface wants.

Both are thin: the engine's operators are stateless column transforms, so
batch and streaming share all of the actual logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import TRANSCRIPT_SCHEMA
from .udfs import extract_udf


def stream_source(spark: SparkSession, path: str,
                  max_files_per_trigger: int = 4) -> DataFrame:
    """File-source readStream over a transcript directory."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_extract(transcripts: DataFrame, num_buckets: int = 32) -> DataFrame:
    """Streaming extraction: same salt + UDF as the batch path.

    No shuffle is injected here — a streaming repartition would force a
    stateful exchange per microbatch; instead the salt travels as a column
    and the downstream sink partitions on it.
    """
    salted = transcripts.withColumn(
        "bucket_id",
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(num_buckets))
        .cast("int"))
    return salted.withColumn("x", extract_udf(F.col("text"))).select(
        "conv_id", "turn_idx", "bucket_id", "ts", "x.*")


def stream_conversation_stats(extracted: DataFrame,
                              window: str = "10 minutes",
                              slide: str = "5 minutes",
                              watermark: str = "15 minutes") -> DataFrame:
    """Watermarked windowed rollup: per-window article counts and yields."""
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("page_type") == "article", 1).otherwise(0))
            .alias("n_articles"),
            F.sum("char_yield").alias("sum_char_yield"),
        )
    )


def run_stream(spark: SparkSession, input_path: str, output_path: str,
               checkpoint_path: str, num_buckets: int = 32):
    """Wire source → extraction → parquet sink; returns the query handle."""
    extracted = stream_extract(stream_source(spark, input_path), num_buckets)
    return (
        extracted.writeStream
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
