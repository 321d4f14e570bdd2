"""Similarity search over the ``embeddings`` table (array<float> column).

- ``cosine_topk``: brute-force exact top-k — the baseline verifier.  The dot
  product runs JVM-side via ``aggregate(zip_with(...))`` higher-order
  functions (no Python), queries are a broadcast cross join.
- ``lsh_cosine_topk``: the scale path — random-hyperplane (sign-LSH)
  bucketing; candidates share a hyperplane signature, exact cosine re-ranks
  inside buckets only.  At 10^9 vectors the bucket join replaces the
  all-pairs cross product.

Outputs are (query_id, rank, neighbor_id) — integers only — so the DuckDB
oracle (list_cosine_similarity) matches regardless of float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import table

N_QUERIES = 5
TOP_K = 5

_DOT = ("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * "
        "cast(y as double)), 0D, (acc, v) -> acc + v)")
_NORM = ("sqrt(aggregate({c}, 0D, (acc, v) -> acc + cast(v as double) * "
         "cast(v as double)))")


def _with_cosine(joined: DataFrame) -> DataFrame:
    return joined.withColumn(
        "cos",
        F.expr(_DOT) / (F.expr(_NORM.format(c="a")) *
                        F.expr(_NORM.format(c="b"))))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("a"))
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("embedding").alias("b"))
    # queries are tiny → broadcast; corpus streams through unshuffled
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = _with_cosine(joined)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    )


COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS a
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.a, e.embedding) AS cos
  FROM embeddings e CROSS JOIN q
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""

# --- sign-LSH bucketed variant (scale path; verified rows-only) -------------

N_PLANES = 8


def _plane_sig_expr(dim: int) -> str:
    """Deterministic pseudo-random hyperplanes from md5 of (plane, coord):
    component sign = high bit of a hex digit.  Signature bit p = sign of
    dot(v, plane_p)."""
    bits = []
    for p in range(N_PLANES):
        dot = " + ".join(
            f"(case when instr('89abcdef', substr(md5('pl{p}_' || {i}), 1, 1))"
            f" > 0 then 1 else -1 end) * cast(v[{i}] as double)"
            for i in range(0, dim, max(1, dim // 16)))  # sample coords
        bits.append(f"(case when ({dot}) > 0 then {1 << p} else 0 end)")
    return " + ".join(bits)


def lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    sig = _plane_sig_expr(dim)
    bucketed = emb.select(
        F.col("vec_id"), F.col("embedding"),
        F.expr(sig.replace("v[", "embedding[")).alias("bucket"))
    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("a"),
        F.col("bucket"))
    corpus = bucketed.select(F.col("vec_id").alias("neighbor_id"),
                             F.col("embedding").alias("b"), F.col("bucket"))
    joined = corpus.join(F.broadcast(queries), "bucket")
    scored = _with_cosine(joined)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    )
