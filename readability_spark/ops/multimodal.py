"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` so a
1000-executor cluster streams batches without ever materializing a payload
row-by-row in Python.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode_stub`` produces a deterministic fake feature vector from the
payload bytes, and ``decode_real`` raises ``NotImplementedError`` with the
intended signature documented — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("payload", T.BinaryType()),       # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    # formatted from the float64 values BEFORE the Arrow float32 cast —
    # JVM format_string over the float column would format the rounded
    # float32 and drift in the 6th decimal
    T.StructField("feature_csv", T.StringType()),
])

_FEATURE_DIM = 8


def decode_real(payload: bytes, mime: str):
    """Real decoder hook — wire PIL/libav here on a cluster with the codecs
    installed.  Intentionally unimplemented in this container."""
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this "
        "environment; decode_stub provides the deterministic test path")


def decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode': md5-derived feature vector.  Keeps the
    full pipeline runnable and its outputs stable for tests."""
    if payload is None:
        payload = b""
    d = hashlib.md5(payload).digest()
    return [d[i] / 255.0 for i in range(_FEATURE_DIM)]


def synth_media(spark: SparkSession, sf_dir: str, limit: int = 64) -> DataFrame:
    """Synthesize a media table from documents (payload = utf-8 bytes of the
    text — an opaque blob as far as the pipeline is concerned).

    Selection is a doc_id predicate, NOT .limit(): a global limit funnels
    through one partition and picks nondeterministic rows; the filter is
    deterministic and pushes down to the scan."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < limit))
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        # coalesce BEFORE encode: a NULL text must become an empty payload
        # on both engines, or the oracle's strlen(NULL)/md5(NULL) → NULL
        # diverges from the stub's None→b'' guard (equivalence must be
        # structural, not dependent on the testdata having no NULLs)
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8")
        .alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            # same NULL→empty normalization as the payload: a NULL text is
            # an empty clip (0 ms), not a NULL duration
            (F.length(F.coalesce(F.col("text"), F.lit(""))) * 10)
            .cast("int").alias("duration_ms"),
        ).alias("meta"))


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_stub)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0),
                "feature": feats,
                "feature_csv": feats.map(
                    lambda fs: ",".join("%.6f" % f for f in fs)),
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURE_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synth media → binary features, exactly oracled.

    The gate-facing projection serializes the vector as a fixed-format CSV
    string — array<float> cells are unsortable by the driver's pandas
    canonicalizer; ``extract_features`` keeps the array for internal use.
    The deterministic stub decode is md5-derived, so the whole mapInPandas
    path (synth → binary payload → Arrow batches → feature) is reproduced
    in SQL: byte i of md5(payload) / 255 printf'd identically (verified:
    DuckDB printf and Python %-format agree on all 256 byte values).
    """
    feats = extract_features(synth_media(spark, sf_dir))
    return (
        feats.select("media_id", "kind", "n_bytes", "feature_csv")
        .orderBy("media_id")
    )


def _media_features_sql(limit: int = 64) -> str:
    from .common import HEX

    def byte_expr(i: int) -> str:
        # coalesce mirrors synth_media's NULL→b'' payload normalization
        return (f"((instr('{HEX}', substr(md5(coalesce(text, '')), "
                f"{2 * i + 1}, 1)) - 1) * 16 + "
                f"(instr('{HEX}', substr(md5(coalesce(text, '')), "
                f"{2 * i + 2}, 1)) - 1))")

    csv = " || ',' || ".join(
        f"printf('%.6f', CAST({byte_expr(i)} AS DOUBLE) / 255.0)"
        for i in range(_FEATURE_DIM))
    return f"""
SELECT doc_id AS media_id,
       (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
       CAST(strlen(coalesce(text, '')) AS INTEGER) AS n_bytes,
       {csv} AS feature_csv
FROM documents WHERE doc_id < {limit} ORDER BY media_id
"""


MEDIA_FEATURES_SQL = _media_features_sql()
