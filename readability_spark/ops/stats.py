"""Corpus distribution analytics: exact per-stratum length quantiles.

Beyond-reference tier (SURVEY.md §2.13): corpus auditing before training
needs length/size distributions per stratum (language, source, shard) —
the numbers that drive packing sequence length, truncation budgets, and
outlier triage.  approx_percentile is the Spark default at scale, but its
t-digest is engine-specific and non-deterministic across partitionings;
this operator computes EXACT rank-based quantiles (nearest-rank method:
the value at rank ceil(q·n/100) of the ascending sort), which are
integers and therefore bit-identical in any engine.

Scale notes (100 TB):
- One pruned scan → per-stratum window row_number + count — a single
  shuffle of (lang, n_tokens) pairs; the quantile pick is a conditional
  aggregation over ranked rows (map-side combinable).
- Exact quantiles cost a per-stratum sort, which is the honest price of
  determinism; strata are languages (dozens), so each sort is parallel
  across strata and bounded by the largest stratum.  For quantiles over
  10^12 rows in ONE stratum you would switch to the two-pass histogram
  method (bucket counts → cumulative → exact rank within one bucket) —
  same nearest-rank semantics, two scans, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import SQL_TOKENS, table, tokens_col

QUANTILES = (50, 90, 99)


def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact token-length quantiles (nearest-rank).

    Returns (lang, n_docs, p50, p90, p99) ordered by lang.
    """
    docs = (table(spark, sf_dir, "documents")
            .select("lang",
                    F.size(tokens_col("text")).cast("long")
                    .alias("n_tokens")))
    win = Window.partitionBy("lang").orderBy("n_tokens")
    ranked = (docs
              .withColumn("rnk", F.row_number().over(win).cast("long"))
              .withColumn("n_docs",
                          F.count("*").over(Window.partitionBy("lang"))
                          .cast("long")))
    aggs = [F.count("*").cast("long").alias("n_docs")]
    for q in QUANTILES:
        # nearest-rank: ceil(q*n/100) = (q*n + 99) div 100, all integers
        aggs.append(
            F.max(F.when(
                F.expr(f"rnk = (({q} * n_docs) + 99) div 100"),
                F.col("n_tokens"))).alias(f"p{q}"))
    return ranked.groupBy("lang").agg(*aggs).orderBy("lang")


def _quantiles_sql() -> str:
    toks = SQL_TOKENS.format(col="text")
    picks = ",\n       ".join(
        f"max(CASE WHEN rnk = (({q} * n_docs) + 99) // 100 "
        f"THEN n_tokens END) AS p{q}"
        for q in QUANTILES)
    return f"""
WITH d AS (
  SELECT lang, CAST(len({toks}) AS BIGINT) AS n_tokens FROM documents
), r AS (
  SELECT lang, n_tokens,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY n_tokens)
              AS BIGINT) AS rnk,
         CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_docs
  FROM d
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       {picks}
FROM r
GROUP BY lang
ORDER BY lang
"""


LENGTH_QUANTILES_SQL = _quantiles_sql()
