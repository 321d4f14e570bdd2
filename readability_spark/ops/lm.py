"""CCNet-style language-model quality bucketing in integer rank form.

Wenzek et al. 2019 ("CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", arXiv:1911.00359) score every crawled document with
a KenLM 5-gram model trained on Wikipedia and split each language into
perplexity terciles — head/middle/tail — which downstream pipelines use
as the quality axis.  This operator is that mechanism over the documents
table, with the two moves the rest of this repo uses for cross-engine
exactness:

- The LM is a Laplace-smoothed BIGRAM model trained on an md5-selected
  reference quarter of the corpus (salt ``'lm|'`` — the stand-in for the
  external clean corpus, same device as decontaminate's benchmark split).
- Floating-point log-probabilities are replaced by an INTEGER surprise
  surrogate per bigram position: ``w = ((c1(prev) + V) * SCALE) div
  (c2(prev, tok) + 1)``, the scaled inverse of the Laplace-smoothed
  conditional ``p(tok|prev) = (c2 + 1) / (c1 + V)``.  Per position, w is
  a strictly decreasing function of p — rarer continuations score
  higher — and the per-document mean surprise is a deterministic,
  bit-exact ranking key where a float mean of logs is not (the same
  integer-rank move dsir_select and top_terms make; the document SUM of
  ratios is the scoring rule itself, not a monotone image of summed
  logs, and both engines compute it identically).

Tercile assignment is pure integer arithmetic: candidates of each lang
are ranked by (avg_surprise ASC, doc_id ASC) and bucket_idx =
((rank - 1) * 3) div n_lang → 0/1/2 → head/middle/tail — the
nearest-rank cut both engines agree on (no ntile, whose tie behavior is
engine-shaped).

Scale notes (100 TB):
- The reference leg aggregates (token, count) and (bigram, count) with
  map-side partials; c1 is localCheckpointed ONCE because two consumers
  read it (the per-position join and the vocabulary-size scalar V) and
  each broadcast would otherwise replay the reference scan.
- The candidate leg pre-aggregates to per-document (prev, bigram, count)
  rows before any join — join input is bounded by distinct bigrams per
  doc, not positions.
- Count-table joins are left joins on the gram key; Spark picks
  broadcast at gate scale and shuffle-hash at cluster scale (reference
  models are GBs when corpora are 100 TB — both shapes are correct, and
  AQE decides from actual sizes).
- The only window runs over per-LANG candidate DOCUMENT rows (corpus
  cardinality / ~300), partitioned by lang — no global single-partition
  funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import SQL_TOKENS, ngram_zip_parts, table, tokens_col

LM_SCALE = 1_000_000
_LM_REF_PRED = ("substr(md5(concat('lm|', CAST(doc_id AS STRING))), 1, 1)"
                " IN ('0', '1', '2', '3')")
_BUCKETS = ("CASE WHEN bucket_idx = 0 THEN 'head' "
            "WHEN bucket_idx = 1 THEN 'middle' ELSE 'tail' END")


def lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-document integer bigram-LM surprise + per-lang
    head/middle/tail perplexity bucket (CCNet's quality split)."""
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", tokens_col("text").alias("toks"))
        .withColumn("is_ref", F.expr(_LM_REF_PRED))
    )

    # r8: bigrams come from the zip-explode form (common.ngram_zip_parts
    # — 7x over the interpreted transform+array_join(slice) lambda), and
    # `prev` falls out of the zip struct for free where the old form
    # re-split the gram string with split_part.  The n_tokens >= 2
    # pre-filter is redundant on bigram legs (0/1-token docs emit no
    # complete-bigram rows) and kept only where it is semantic: the
    # unigram c1 leg, whose counts the oracle defines over >=2-token
    # reference docs.
    zip_expr, gram_expr, last = ngram_zip_parts(2)

    def bigrams(side: DataFrame, *cols: str) -> DataFrame:
        return (side.select(*cols, F.explode(F.expr(zip_expr)).alias("z"))
                .filter(F.expr(f"{last} IS NOT NULL"))
                .select(*cols, F.col("z.toks").alias("prev"),
                        F.expr(gram_expr).alias("bg")))

    # reference unigram counts; checkpointed once — BOTH the c1 join and
    # the scalar V below read it, and each would replay the ref scan
    c1 = (docs.filter("is_ref").filter(F.size("toks") >= 2)
          .select(F.explode("toks").alias("prev"))
          .groupBy("prev").agg(F.count("*").alias("c1"))
          .localCheckpoint())
    # reference bigram counts (single consumer — no checkpoint)
    c2 = (bigrams(docs.filter("is_ref"))
          .groupBy("bg").agg(F.count("*").alias("c2")))
    # vocabulary size V as a broadcast 1-row table (the Laplace denom)
    v = F.broadcast(c1.agg(F.count("*").cast("long").alias("v")))
    # candidate leg: per-POSITION rows join the count tables BEFORE any
    # shuffle (broadcast at gate scale; AQE picks shuffle-hash when the
    # reference model outgrows the broadcast threshold) — so the only
    # wide exchange on the corpus-sized leg carries (doc_id, lang,
    # integer partials), never gram text
    scored = (
        bigrams(docs.filter("NOT is_ref"), "doc_id", "lang")
        .join(c2, "bg", "left")
        .join(c1, "prev", "left")
        .crossJoin(v)
        .withColumn("w", F.expr(
            f"((coalesce(c1, 0) + v) * CAST({LM_SCALE} AS BIGINT))"
            " div (coalesce(c2, 0) + 1)"))
        .groupBy("doc_id", "lang")
        .agg(F.sum("w").cast("long").alias("score"),
             F.count("*").cast("long").alias("n_pos"))
        .withColumn("avg_surprise",
                    F.expr("score div n_pos").cast("long")))
    rank_w = Window.partitionBy("lang").orderBy(
        F.asc("avg_surprise"), F.asc("doc_id"))
    return (
        scored
        .withColumn("rn", F.row_number().over(rank_w))
        .withColumn("n_lang",
                    F.count("*").over(Window.partitionBy("lang")))
        .withColumn("bucket_idx", F.expr("((rn - 1) * 3) div n_lang"))
        .select("doc_id", "lang", "n_pos", "score", "avg_surprise",
                F.expr(_BUCKETS).alias("ppl_bucket"))
        .orderBy("doc_id")
    )


LM_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, {SQL_TOKENS.format(col='text')} AS toks
  FROM documents
), d AS MATERIALIZED (
  SELECT doc_id, lang, toks, len(toks) AS n_tokens,
         {_LM_REF_PRED} AS is_ref
  FROM t WHERE len(toks) >= 2
), pos AS MATERIALIZED (
  SELECT doc_id, lang, is_ref,
         toks[i] AS prev,
         concat(toks[i], ' ', toks[i + 1]) AS bg
  FROM (SELECT doc_id, lang, toks, is_ref,
               unnest(generate_series(1, len(toks) - 1)) AS i FROM d)
), c1 AS MATERIALIZED (
  SELECT tok AS prev, count(*) AS c1
  FROM (SELECT unnest(toks) AS tok FROM d WHERE is_ref)
  GROUP BY tok
), c2 AS (
  SELECT bg, count(*) AS c2 FROM pos WHERE is_ref GROUP BY bg
), vv AS (
  SELECT count(*) AS v FROM c1
), cbc AS (
  SELECT doc_id, lang, prev, bg, count(*) AS c
  FROM pos WHERE NOT is_ref
  GROUP BY doc_id, lang, prev, bg
), s AS (
  SELECT cbc.doc_id, cbc.lang,
         CAST(sum(cbc.c * (((coalesce(c1.c1, 0) + vv.v) * {LM_SCALE})
                           // (coalesce(c2.c2, 0) + 1))) AS BIGINT)
           AS score,
         CAST(sum(cbc.c) AS BIGINT) AS n_pos
  FROM cbc
  LEFT JOIN c2 ON cbc.bg = c2.bg
  LEFT JOIN c1 ON cbc.prev = c1.prev
  CROSS JOIN vv
  GROUP BY cbc.doc_id, cbc.lang
), r AS (
  SELECT doc_id, lang, n_pos, score,
         CAST(score // n_pos AS BIGINT) AS avg_surprise,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score // n_pos ASC, doc_id ASC)
           AS rn,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM s
)
SELECT doc_id, lang, n_pos, score, avg_surprise,
       CASE WHEN ((rn - 1) * 3) // n_lang = 0 THEN 'head'
            WHEN ((rn - 1) * 3) // n_lang = 1 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM r
ORDER BY doc_id
"""
