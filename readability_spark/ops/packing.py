"""Training-sequence packing: deterministic concat-and-chop layout.

Beyond-reference tier (SURVEY.md §2.13): the last batch step a pretraining
data pipeline runs before tokenizer sharding is PACKING — concatenating
documents in a deterministic order and chopping the stream into
fixed-length training sequences.  This operator computes, per document,
where it lands in that packed stream: its start offset, the sequence id
and intra-sequence position of its first token, and how many sequence
boundaries it straddles.

Packing is per-language (each lang is an independent stream, mirroring
per-corpus sharding), ordered by doc_id within the stream — fully
deterministic, no seeds.  All quantities are integers (token counts,
prefix sums, floor divisions), so the DuckDB oracle is exact by
construction.

Scale notes (100 TB):
- The layout is one window aggregation: PARTITION BY lang ORDER BY doc_id
  with a running sum(n_tokens).  Spark executes this as range-partition +
  in-partition running sum — a single shuffle of (lang, doc_id, n_tokens)
  triples (12 bytes of payload per doc; the text itself never moves).
- A single global stream would serialize the prefix sum through one
  partition; per-lang streams keep the window parallel.  At 10^10 docs
  per lang you would go two-pass (per-partition partial sums, broadcast
  the per-partition prefix offsets, then a map-side add — the classic
  distributed scan), which preserves these exact semantics; the window
  form IS that computation for any lang that fits a task.
- Downstream, the actual byte movement (gathering token ids into packed
  sequences) groups by seq_id — also deterministic from this layout, and
  shuffle-bound by design; this operator is the planning pass that makes
  it a pure equi-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import SQL_TOKENS, table, tokens_col

PACK_SEQ_LEN = 256  # tokens per packed training sequence


def pack_sequences(spark: SparkSession, sf_dir: str,
                   seq_len: int = PACK_SEQ_LEN) -> DataFrame:
    """Per-document placement in the per-lang packed token stream.

    Returns (lang, doc_id, n_tokens, start_offset, seq_id, pos_in_seq,
    n_seqs_spanned) ordered by (lang, doc_id); empty documents are
    excluded (they occupy no tokens).
    """
    docs = (table(spark, sf_dir, "documents")
            .select("lang", "doc_id",
                    F.size(tokens_col("text")).cast("long")
                    .alias("n_tokens"))
            .filter(F.col("n_tokens") >= 1))
    win = (Window.partitionBy("lang").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs
            .withColumn("cum", F.sum("n_tokens").over(win))
            .select(
                "lang", "doc_id", "n_tokens",
                (F.col("cum") - F.col("n_tokens")).alias("start_offset"),
                F.expr(f"(cum - n_tokens) div {seq_len}").alias("seq_id"),
                F.expr(f"(cum - n_tokens) % {seq_len}").alias("pos_in_seq"),
                F.expr(f"((cum - 1) div {seq_len})"
                       f" - ((cum - n_tokens) div {seq_len}) + 1")
                .cast("long").alias("n_seqs_spanned"))
            .orderBy("lang", "doc_id"))


def _pack_sql(seq_len: int = PACK_SEQ_LEN) -> str:
    toks = SQL_TOKENS.format(col="text")
    return f"""
WITH d AS (
  SELECT lang, doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM documents
  WHERE len({toks}) >= 1
), c AS (
  SELECT lang, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM d
)
SELECT lang, doc_id, n_tokens,
       cum - n_tokens AS start_offset,
       (cum - n_tokens) // {seq_len} AS seq_id,
       (cum - n_tokens) % {seq_len} AS pos_in_seq,
       CAST((cum - 1) // {seq_len} - (cum - n_tokens) // {seq_len} + 1
            AS BIGINT) AS n_seqs_spanned
FROM c
ORDER BY lang, doc_id
"""


PACK_SEQUENCES_SQL = _pack_sql()
