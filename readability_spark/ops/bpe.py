"""Byte-Pair-Encoding tokenizer-vocabulary induction over the corpus.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units", arXiv:1508.07909): starting from characters, repeatedly
(1) count adjacent symbol pairs over the word-frequency table (overlapping
occurrences included, weighted by word count — the reference
implementation's ``get_stats``), (2) merge the most frequent pair
everywhere it occurs, greedy leftmost non-overlapping per word.  The
learned merge list IS the tokenizer — this is the vocab-training pass a
pre-training pipeline runs between curation and packing.

Output: one row per merge round — (merge_round, pair, merged,
pair_count) — the merge table verbatim, deterministic under the
(count DESC, pair ASC) tiebreak.

Cross-engine exactness rides one encoding trick: each word's symbol
sequence is kept as a string with TWO-space separators and two-space
ends (``"  a  b  c  "``).  Merging pair (A, B) is then a single
``replace(ws, ' A  B ', ' AB ')`` — the pattern consumes ONE space from
each flanking separator, so the invariant is restored in place and the
engine's native left-to-right non-overlapping scan implements exactly
the classic BPE merge order: ``[a,b,a,b] → [ab, ab]`` (boundary spaces
are not shared between adjacent matches) while ``[a,a,a] → [aa, a]``
(symbol-overlapping occurrences are not double-merged).  Verified
identical in Spark, DuckDB, and Python str.replace; pinned in
tests/test_bpe.py.  Symbols never contain spaces (words are whitespace
tokens), so the pattern cannot match across symbol boundaries.

Scale notes (100 TB):
- All rounds run over the WORD-FREQUENCY table (distinct words +
  counts), not the corpus — the one corpus-sized pass is the initial
  token groupBy.  This is the classic BPE formulation; the vocab table
  is bounded (tens of millions of rows) regardless of corpus size.
- Per round: one in-row pair explode + pair-keyed aggregation (map-side
  partials; exchange bounded by distinct pairs), a TakeOrderedAndProject
  top-1 (every partition forwards one row — the dsir_select lesson), a
  1-row broadcast crossJoin, and an in-row replace.  The word table is
  localCheckpointed per round so round r+1's plan is flat (the
  link_pagerank move — no 2^r lineage blow-up).
- Nothing in any round serializes with executor count except the 1-row
  argmax, which is the algorithm's sequential dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import SQL_TOKENS, table, tokens_col

BPE_ROUNDS = 8


def bpe_merges(spark: SparkSession, sf_dir: str,
               rounds: int = BPE_ROUNDS) -> DataFrame:
    """Learn ``rounds`` BPE merges over the documents word-frequency
    table; returns the merge table (merge_round, pair, merged,
    pair_count) in round order."""
    words = (
        table(spark, sf_dir, "documents")
        .select(F.explode(tokens_col("text")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("wc"))
        # two-space-separated character string: "  h  i  "
        .select("wc", F.expr(
            "concat('  ', array_join(transform(sequence(1, length(tok)), "
            "i -> substr(tok, i, 1)), '  '), '  ')").alias("ws"))
        .localCheckpoint())
    merges = []
    for r in range(1, rounds + 1):
        pairs = (
            words
            .withColumn("syms", F.expr("filter(split(ws, '  '), "
                                       "x -> x <> '')"))
            .withColumn("n", F.size("syms"))
            # overlapping adjacent pairs, get_stats-style; two-space
            # joined so the pair key cannot collide across symbols
            .withColumn("prs", F.expr(
                "transform(if(n >= 2, sequence(1, n - 1), array()), "
                "i -> array_join(slice(syms, i, 2), '  '))"))
            .select("wc", F.explode("prs").alias("pr"))
            .groupBy("pr").agg(F.sum("wc").cast("long").alias("c")))
        best = (
            pairs.orderBy(F.desc("c"), F.asc("pr")).limit(1)
            .select(
                F.lit(r).cast("long").alias("merge_round"),
                F.expr("split_part(pr, '  ', 1)").alias("a"),
                F.expr("split_part(pr, '  ', 2)").alias("b"),
                F.col("c").alias("pair_count"))
            .localCheckpoint())
        merges.append(best)
        words = (
            words.crossJoin(F.broadcast(best.select("a", "b")))
            .select("wc", F.expr(
                "replace(ws, concat(' ', a, '  ', b, ' '), "
                "concat(' ', a, b, ' '))").alias("ws"))
            .localCheckpoint())
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return (
        out.select(
            "merge_round",
            F.expr("concat(a, ' ', b)").alias("pair"),
            F.expr("concat(a, b)").alias("merged"),
            "pair_count")
        .orderBy("merge_round")
    )


def _bpe_sql(rounds: int = BPE_ROUNDS) -> str:
    parts = [f"""
WITH w0 AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS wc,
         concat('  ', array_to_string(list_transform(
             generate_series(1, len(tok)), i -> substr(tok, i, 1)),
             '  '), '  ') AS ws
  FROM (SELECT unnest({SQL_TOKENS.format(col='text')}) AS tok
        FROM documents)
  GROUP BY tok
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""", p{r} AS (
  SELECT pr, CAST(sum(wc) AS BIGINT) AS c
  FROM (
    SELECT wc, concat(syms[i], '  ', syms[i + 1]) AS pr
    FROM (
      SELECT wc,
             list_filter(string_split(ws, '  '), x -> x <> '') AS syms
      FROM w{r - 1}
    ), LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
    WHERE len(syms) >= 2
  )
  GROUP BY pr
), b{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS merge_round,
         split_part(pr, '  ', 1) AS a,
         split_part(pr, '  ', 2) AS b,
         c AS pair_count
  FROM p{r} ORDER BY c DESC, pr ASC LIMIT 1
), w{r} AS MATERIALIZED (
  SELECT wc, replace(ws, concat(' ', b{r}.a, '  ', b{r}.b, ' '),
                     concat(' ', b{r}.a, b{r}.b, ' ')) AS ws
  FROM w{r - 1} CROSS JOIN b{r}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT merge_round, concat(a, ' ', b) AS pair,"
        f" concat(a, b) AS merged, pair_count FROM b{r}"
        for r in range(1, rounds + 1))
    return "".join(parts) + f"\n{union}\nORDER BY merge_round\n"


BPE_MERGES_SQL = _bpe_sql()
