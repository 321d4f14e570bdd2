"""Durable checkpoint artifacts: pairs-parquet → dedup_clusters round-trip.

The gate runs dedup_clusters self-contained (localCheckpoint lineage
truncation).  A real 100 TB pipeline instead ships durable artifacts: the
distinct-shingle table (near_dedup's ``checkpoint_dir``) and the candidate
pair table, then resumes cluster resolution from the stored pairs without
recomputing near_dedup.  This suite proves that staged path end-to-end:
write the artifacts, sever all lineage to the corpus by re-reading them
from disk, and pin that resumed clusters equal the in-memory result
row-for-row.
"""

import os

from pyspark.sql import functions as F

from readability_spark.ops.dedup import dedup_clusters, near_dedup

SF = "/root/testdata/sf0.001"


def test_pairs_parquet_roundtrip_equals_in_memory(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    # in-memory reference (the gate's self-contained form)
    mem = {(r["doc_id"], r["rep_id"], r["keep"])
           for r in dedup_clusters(spark, SF).collect()}

    # stage 1: pair generation with the durable checkpoint dir
    pairs = near_dedup(spark, SF, checkpoint_dir=ckpt)
    pairs_path = os.path.join(ckpt, "near_dup_pairs.parquet")
    pairs.filter(F.col("is_dup")).write.mode("overwrite").parquet(pairs_path)

    # the shingle artifact the checkpoint_dir contract promises must exist
    assert os.path.isdir(os.path.join(ckpt, "near_dedup_shingles.parquet"))

    # stage 2 ("fresh process"): resume from the stored pairs only — the
    # parquet read has NO lineage back to the documents scan or the LSH
    # stages, which is the whole point of the durable artifact
    spark.catalog.clearCache()
    stored = spark.read.parquet(pairs_path)
    resumed = {(r["doc_id"], r["rep_id"], r["keep"])
               for r in dedup_clusters(spark, SF, pairs=stored).collect()}

    assert resumed == mem


def test_checkpointed_near_dedup_equals_default(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    default = {(r["doc_a"], r["doc_b"], r["is_dup"])
               for r in near_dedup(spark, SF).collect()}
    durable = {(r["doc_a"], r["doc_b"], r["is_dup"])
               for r in near_dedup(spark, SF, checkpoint_dir=ckpt).collect()}
    assert durable == default
