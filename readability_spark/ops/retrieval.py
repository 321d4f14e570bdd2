"""Corpus retrieval: inverted-index top-k search with integer tf-idf.

Beyond-reference tier (SURVEY.md §2.13): after extraction (the reference's
job) and curation, a training-data pipeline needs to FIND things in the
corpus — e.g. "which documents match this probe query" for targeted
decontamination, eval-set mining, or data auditing.  This operator is the
classic batch inverted-index retrieval shape: postings list + document
frequencies + a broadcast query set + per-query top-k.

Query workload is synthesized deterministically (same device as
curation.py's benchmark selection): documents whose md5('query|'||doc_id)
starts with hex digit '0' (~1/16 of the corpus) become probe queries, each
query being the document's first three tokens.  Both engines derive the
identical workload from the identical table, so the oracle is exact while
the join machinery sees a realistic skewed term distribution.

Cross-engine exactness: scores are INTEGERS —

    idf_int(t)    = N // df(t)            (integer division)
    score(q, d)   = sum over distinct query terms t of tf(t, d) * idf_int(t)

so aggregation order cannot perturb them (float BM25's log() is not
bit-portable across engines; the integer rank-form preserves the ordering
semantics that matter for top-k).  Ties broken by doc_id ASC; top-5 per
query via row_number — deterministic in both engines.

Scale notes (100 TB):
- One scan of the corpus builds the postings (term, doc_id, tf) via
  explode + partial-aggregated groupBy; df is a second aggregation over
  postings keyed by term only.  Both are map-side-combinable.
- The query set is DISTINCT query terms — broadcast (probe workloads are
  KBs-MBs; corpora are TBs).  The postings side therefore never shuffles
  on term for the probe join; the only post-join exchange carries
  partially-aggregated (query_id, doc_id, score) rows.
- Per-query top-k is a window over (query_id) — at 10^6 queries this
  partitions cleanly; for huge k-lists you'd pre-prune with a per-partition
  top-k before the window (same device as relational.py's topk_per_group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import SQL_TOKENS, table, tokens_col

SEARCH_K = 5
_QUERY_PRED = ("substr(md5(concat('query|', CAST(doc_id AS STRING))), 1, 1)"
               " = '0'")


def search_topk(spark: SparkSession, sf_dir: str,
                k: int = SEARCH_K) -> DataFrame:
    """Top-``k`` documents per probe query by integer tf-idf.

    Returns (query_id, rnk, doc_id, score) ordered by (query_id, rnk).
    """
    # r8: the len >= 1 pre-filter was redundant (token-less docs emit no
    # exploded postings/query-term rows) and cost a cloned tokenize in
    # the pushed-down scan filter on both legs
    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", tokens_col("text").alias("toks")))
    n = table(spark, sf_dir, "documents").count()  # driver scalar only

    qterms = (docs
              .filter(F.expr(_QUERY_PRED))
              .select(F.col("doc_id").alias("query_id"),
                      F.explode(F.slice("toks", 1, 3)).alias("term"))
              .distinct()
              # two broadcast consumers (postings pre-filter + scoring
              # join) — materialize the tiny probe workload once
              .localCheckpoint())

    # r8 (guide §3.2 semi-join pre-filter): only query-term postings can
    # reach the output (every downstream join is inner on term), so drop
    # non-matching tokens BEFORE the (term, doc_id) aggregation — the
    # corpus-sized exchange shrinks from every token to query-term tokens,
    # and the checkpointed artifact shrinks from the full postings table
    # to the probe slice.  tf and df are unchanged for surviving terms:
    # tf counts within (term, doc_id) and df(term) counts docs per term,
    # both over exactly the rows the full table holds for those terms.
    postings = (docs
                .select("doc_id", F.explode("toks").alias("term"))
                .join(F.broadcast(qterms.select("term").distinct()), "term")
                .groupBy("term", "doc_id")
                .agg(F.count("*").cast("long").alias("tf"))
                # materialize once: df_t and the scoring join both read it
                .localCheckpoint())
    df_t = (postings.groupBy("term")
            .agg(F.count("*").cast("long").alias("df")))

    scored = (postings
              .join(df_t, "term")
              .withColumn("idf_int", F.expr(f"CAST({n} AS BIGINT) div df"))
              .join(F.broadcast(qterms), "term")
              .groupBy("query_id", "doc_id")
              .agg(F.sum(F.col("tf") * F.col("idf_int"))
                   .cast("long").alias("score")))
    win = (Window.partitionBy("query_id")
           .orderBy(F.desc("score"), F.asc("doc_id")))
    return (scored
            .withColumn("rnk", F.row_number().over(win).cast("long"))
            .filter(F.col("rnk") <= k)
            .select("query_id", "rnk", "doc_id", "score")
            .orderBy("query_id", "rnk"))


def _search_sql(k: int = SEARCH_K) -> str:
    toks = SQL_TOKENS.format(col="text")
    return f"""
WITH d AS (
  SELECT doc_id, {toks} AS toks FROM documents
  WHERE len({toks}) >= 1
), p0 AS (
  SELECT doc_id, unnest(toks) AS term FROM d
), postings AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM p0 GROUP BY term, doc_id
), df_t AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY term
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, unnest(toks[1:3]) AS term
  FROM d WHERE {_QUERY_PRED}
), scored AS (
  SELECT q.query_id, p.doc_id,
         CAST(sum(p.tf * ((SELECT count(*) FROM documents) // t.df))
              AS BIGINT) AS score
  FROM postings p
  JOIN df_t t USING (term)
  JOIN qterms q USING (term)
  GROUP BY q.query_id, p.doc_id
), ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT query_id, rnk, doc_id, score
FROM ranked WHERE rnk <= {k}
ORDER BY query_id, rnk
"""


SEARCH_TOPK_SQL = _search_sql()
