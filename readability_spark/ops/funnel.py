"""The curation funnel: the whole cleaning pass as ONE attrition report.

Every published pre-training corpus ships this table (C4 §2.2, Gopher
A.1.1, RefinedWeb fig. 2, FineWeb): documents in, documents removed, and
documents surviving each sequential cleaning stage.  This operator runs
the four canonical stages over the candidate corpus in one DataFrame and
returns the funnel — the capstone composition of the curation operators
this repo ships individually:

  1. exact_dedup    keep-first by md5(text) (dedup_exact's rule)
  2. length_band    FUNNEL_LEN_LO ≤ n_tokens ≤ FUNNEL_LEN_HI
                    (Gopher's word-count gate)
  3. repetition     top-bigram fraction < FUNNEL_REP_PCT/100
                    (Gopher's top-2-gram gate, quality_repetition's
                    metric)
  4. decontaminate  benchmark 3-gram overlap < DECON_FLAG_FRAC
                    (decontaminate's rule against the same md5-selected
                    benchmark quarter; bench docs are the benchmark, not
                    corpus, so they are not candidates)

Stage flags are measured per document, and the funnel counts are the
cumulative conjunctions — one aggregation over the flag table, no
per-stage recomputation.  Every threshold comparison is INTEGERIZED
(10·top_c < n_pos; 5·n_contam ≥ n_grams) so no float division sits on a
keep/drop boundary; both engines compare the same bigints.

Scale notes (100 TB):
- One corpus scan builds tokens in-row; the dedup window partitions by
  md5(text) (32-byte key, never the text); the repetition leg shuffles
  (doc_id, md5(bigram)) hashes only; the contamination leg broadcasts
  the distinct benchmark gram set exactly as decontaminate does and its
  corpus-sized exchange carries per-doc aggregates.  Document text never
  enters an exchange.
- The final funnel is a single-row aggregate exploded to 4 rows —
  constant output regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import SQL_TOKENS, ngram_zip_parts, table, tokens_col
from .curation import _BENCH_PRED, DECON_N

FUNNEL_LEN_LO = 16
FUNNEL_LEN_HI = 90
FUNNEL_REP_PCT = 10      # keep iff top-bigram fraction < 10%

_STAGES = ["exact_dedup", "length_band", "repetition", "decontaminate"]


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential keep/drop attrition over the four canonical cleaning
    stages; returns (stage, stage_name, docs_in, docs_removed,
    docs_out), one row per stage."""
    n = DECON_N
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text", tokens_col("text").alias("toks"))
        .withColumn("nt", F.size("toks"))
        .withColumn("is_bench", F.expr(_BENCH_PRED)))
    cand = docs.filter("NOT is_bench")
    # stage 1: keep-first within each md5(text) group (dedup_exact rule)
    f1 = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id")) == 1
    # stage 3 metric: per-doc top bigram count — bigrams md5'd in-row so
    # the exchange carries (doc_id, hash) only.  r8: zip-explode builders
    # (common.ngram_zip_parts) with md5/concat_ws codegen-side; the nt
    # pre-filters on the gram legs were redundant (short docs emit no
    # complete-gram rows) and cost cloned tokenizes at the scan
    zip2, gram2, last2 = ngram_zip_parts(2)
    rep = (
        cand.select("doc_id", F.explode(F.expr(zip2)).alias("z"))
        .filter(F.expr(f"{last2} IS NOT NULL"))
        .select("doc_id", F.expr(f"md5({gram2})").alias("h"))
        .groupBy("doc_id", "h").agg(F.count("*").alias("c"))
        .groupBy("doc_id").agg(F.max("c").cast("long").alias("top_c"),
                               F.sum("c").cast("long").alias("n_pos")))
    # stage 4 metric: benchmark 3-gram overlap (decontaminate's shape)
    zipn, gramn, lastn = ngram_zip_parts(n)

    def grams_of(side: DataFrame, *cols: str) -> DataFrame:
        return (side.select(*cols, F.explode(F.expr(zipn)).alias("z"))
                .filter(F.expr(f"{lastn} IS NOT NULL"))
                .select(*cols, F.expr(gramn).alias("gram")))

    bench = (grams_of(docs.filter("is_bench"))
             .select("gram").distinct()
             .withColumn("hit", F.lit(1)))
    con = (
        grams_of(cand, "doc_id")
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.coalesce(F.sum("hit"), F.lit(0)).cast("long")
             .alias("n_contam")))
    flags = (
        cand.select("doc_id", "text", "nt")
        .withColumn("f1", f1)
        .join(rep, "doc_id", "left")
        .join(con, "doc_id", "left")
        .select(
            "f1",
            (F.col("nt").between(FUNNEL_LEN_LO, FUNNEL_LEN_HI))
            .alias("f2"),
            # no bigrams → trivially non-repetitive; integer boundary
            F.expr(f"top_c IS NULL OR top_c * {FUNNEL_REP_PCT} < n_pos")
            .alias("f3"),
            # no grams → trivially clean; drop iff 5·contam ≥ grams
            F.expr("n_grams IS NULL OR NOT (n_contam * 5 >= n_grams)")
            .alias("f4")))
    row = flags.agg(
        F.count("*").alias("c0"),
        F.sum(F.expr("IF(f1, 1, 0)")).alias("c1"),
        F.sum(F.expr("IF(f1 AND f2, 1, 0)")).alias("c2"),
        F.sum(F.expr("IF(f1 AND f2 AND f3, 1, 0)")).alias("c3"),
        F.sum(F.expr("IF(f1 AND f2 AND f3 AND f4, 1, 0)")).alias("c4"))
    structs = ", ".join(
        f"named_struct('stage', CAST({k} AS BIGINT), "
        f"'stage_name', '{name}', "
        f"'docs_in', CAST(c{k - 1} AS BIGINT), "
        f"'docs_removed', CAST(c{k - 1} - c{k} AS BIGINT), "
        f"'docs_out', CAST(c{k} AS BIGINT))"
        for k, name in enumerate(_STAGES, start=1))
    return (
        row.select(F.explode(F.expr(f"array({structs})")).alias("s"))
        .select("s.*")
        .orderBy("stage")
    )


def _funnel_sql() -> str:
    n = DECON_N
    stage_rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS stage, '{name}' AS stage_name,"
        f" c{k - 1} AS docs_in, c{k - 1} - c{k} AS docs_removed,"
        f" c{k} AS docs_out FROM agg"
        for k, name in enumerate(_STAGES, start=1))
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, text, {SQL_TOKENS.format(col='text')} AS toks,
         {_BENCH_PRED} AS is_bench
  FROM documents
), cand AS MATERIALIZED (
  SELECT doc_id, text, toks, len(toks) AS nt FROM t WHERE NOT is_bench
), rep AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_c,
         CAST(sum(c) AS BIGINT) AS n_pos
  FROM (
    SELECT doc_id, h, count(*) AS c
    FROM (
      SELECT doc_id, md5(concat(toks[i], ' ', toks[i + 1])) AS h
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM cand WHERE nt >= 2)
    ) GROUP BY doc_id, h
  ) GROUP BY doc_id
), bgrams AS (
  SELECT DISTINCT concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])
           AS gram
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - {n} + 1)) AS i
        FROM t WHERE is_bench AND len(toks) >= {n})
), cgrams AS (
  SELECT doc_id, concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])
           AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {n} + 1)) AS i
        FROM cand WHERE nt >= {n})
), con AS (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(coalesce(sum(CASE WHEN b.gram IS NOT NULL THEN 1 END), 0)
              AS BIGINT) AS n_contam
  FROM cgrams c LEFT JOIN bgrams b ON c.gram = b.gram
  GROUP BY c.doc_id
), flags AS (
  SELECT
    (row_number() OVER (PARTITION BY md5(cand.text)
                        ORDER BY cand.doc_id)) = 1 AS f1,
    cand.nt BETWEEN {FUNNEL_LEN_LO} AND {FUNNEL_LEN_HI} AS f2,
    (rep.top_c IS NULL OR rep.top_c * {FUNNEL_REP_PCT} < rep.n_pos)
      AS f3,
    (con.n_grams IS NULL OR NOT (con.n_contam * 5 >= con.n_grams)) AS f4
  FROM cand
  LEFT JOIN rep ON cand.doc_id = rep.doc_id
  LEFT JOIN con ON cand.doc_id = con.doc_id
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT)
           AS c2,
         CAST(sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END)
              AS BIGINT) AS c3,
         CAST(sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END)
              AS BIGINT) AS c4
  FROM flags
)
{stage_rows}
ORDER BY stage
"""


CURATION_FUNNEL_SQL = _funnel_sql()
