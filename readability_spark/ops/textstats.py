"""Text-analysis operators over ``documents``: language ID, quality score,
token counting, document fingerprinting.

All four are pure column expressions (whole-stage codegen; zero Python);
each has an exact DuckDB oracle built from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import (
    SQL_TOKENS,
    WS_CHARS_SPARK,
    WS_CHARS_SQL,
    md5_prefix_int_expr,
    md5_prefix_int_fast_expr,
    table,
    tokens_col,
)

# --- language ID (stopword-hit heuristic) ------------------------------------

LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "for", "with"),
    "es": ("el", "la", "de", "que", "en", "los", "por", "con"),
    "fr": ("le", "la", "les", "des", "est", "dans", "pour", "une"),
}


def _hits_expr(markers) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"size(filter(toks, t -> t in ({lst})))"


def _hits_sql(markers) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(toks, t -> t in ({lst})))"


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict language by marker-token hits; deterministic tiebreak by
    fixed language order, 'und' when nothing hits."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col("text").alias("toks"))
    for lang, markers in LANG_MARKERS.items():
        docs = docs.withColumn(f"hits_{lang}", F.expr(_hits_expr(markers)))
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:                      # first language reaching the max wins
        pred = pred.when(F.col(f"hits_{l}") == best, F.lit(l))
    return (
        docs.select("doc_id", pred.alias("pred_lang"),
                    *[F.col(f"hits_{l}").alias(f"hits_{l}") for l in langs])
        .orderBy("doc_id")
    )


def _lang_id_sql() -> str:
    langs = list(LANG_MARKERS)
    hits = ",\n       ".join(
        f"{_hits_sql(LANG_MARKERS[l])} AS hits_{l}" for l in langs)
    best = f"greatest({', '.join('hits_' + l for l in langs)})"
    cases = "\n         ".join(
        f"WHEN hits_{l} = {best} THEN '{l}'" for l in langs)
    return f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS.format(col='text')} AS toks FROM documents
), h AS (
  SELECT doc_id,
       {hits}
  FROM t
)
SELECT doc_id,
       CASE WHEN {best} = 0 THEN 'und'
         {cases}
       END AS pred_lang,
       {', '.join('hits_' + l for l in langs)}
FROM h ORDER BY doc_id
"""


LANG_ID_SQL = _lang_id_sql()

# --- quality score -------------------------------------------------------------

_STOPWORDS = LANG_MARKERS["en"]


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/uniqueness ratios → a [0,1]-ish quality score.

    score = 0.4·min(n_tokens/100, 1) + 0.3·min(stopword_ratio·5, 1)
          + 0.3·(distinct_tokens/n_tokens), rounded to 6 dp.
    """
    sw = ", ".join(f"'{m}'" for m in _STOPWORDS)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col("text").alias("toks"))
    return (
        docs.withColumn("n_tokens", F.expr("size(toks)"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("n_stop", F.expr(f"size(filter(toks, t -> t in ({sw})))"))
        .withColumn("n_distinct", F.expr("size(array_distinct(toks))"))
        .select(
            "doc_id", "n_tokens", "n_stop", "n_distinct",
            F.round(
                0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
                + 0.3 * F.least(F.col("n_stop") * 5.0 / F.col("n_tokens"),
                                F.lit(1.0))
                + 0.3 * (F.col("n_distinct") / F.col("n_tokens")),
                6).alias("quality"))
        .orderBy("doc_id")
    )


QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS.format(col='text')} AS toks FROM documents
), f AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_filter(toks, t -> t IN ({', '.join("'" + m + "'" for m in _STOPWORDS)}))) AS n_stop,
         len(list_distinct(toks)) AS n_distinct
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, n_tokens, n_stop, n_distinct,
       round(0.4 * least(n_tokens / 100.0, 1.0)
           + 0.3 * least(n_stop * 5.0 / n_tokens, 1.0)
           + 0.3 * (n_distinct / CAST(n_tokens AS DOUBLE)), 6) AS quality
FROM f ORDER BY doc_id
"""

# --- token counting -------------------------------------------------------------

# the negated class spells out the whitespace set (common.py) — a bare \s
# here would include VT on the Java side but not in RE2, silently skewing
# the oracle on VT-containing text
_BPE_RE = f"[a-z]+|[0-9]+|[^a-z0-9{WS_CHARS_SPARK}]"
_BPE_RE_SQL = f"[a-z]+|[0-9]+|[^a-z0-9{WS_CHARS_SQL}]"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens vs a BPE-ish regex segmentation (letters runs /
    digit runs / single symbols) — the unit a token-budgeted pipeline
    meters by."""
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(tokens_col("text")).alias("ws_tokens"),
            F.expr(f"size(regexp_extract_all(lower(text), '{_BPE_RE}', 0))")
            .alias("bpe_tokens"),
            F.length("text").alias("n_chars"))
        .orderBy("doc_id")
    )

TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len({SQL_TOKENS.format(col='text')}) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}', 0)) AS bpe_tokens,
       length(text) AS n_chars
FROM documents ORDER BY doc_id
"""

# --- document fingerprint -------------------------------------------------------

_FP_MOD = 2147483647


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling fingerprint:
    Σ (md5int(token) % M) · ((pos % 64) + 1) mod M — order-sensitive (unlike
    a bag-of-words hash) yet expressible as one grouped sum in both engines.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(tokens_col("text")).alias("pos", "tok"))
    # Spark side on the conv() fast md5-int (r8); the oracle text below
    # keeps the fingerprint-frozen instr chain — values are identical
    term = (f"(({md5_prefix_int_fast_expr('tok')} % {_FP_MOD}) * "
            f"((pos % 64) + 1)) % {_FP_MOD}")
    return (
        docs.groupBy("doc_id")
        .agg((F.sum(F.expr(term)) % _FP_MOD).cast("long")
             .alias("fingerprint"))
        .orderBy("doc_id")
    )


FINGERPRINT_SQL = f"""
WITH t AS (
  SELECT doc_id, {SQL_TOKENS.format(col='text')} AS toks FROM documents
), p AS (
  SELECT doc_id, toks[i] AS tok, i - 1 AS pos
  FROM (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i
    FROM t WHERE len(toks) >= 1
  )
)
SELECT doc_id,
       CAST(sum((({md5_prefix_int_expr('tok')} % {_FP_MOD}) * ((pos % 64) + 1))
           % {_FP_MOD}) % {_FP_MOD} AS BIGINT) AS fingerprint
FROM p GROUP BY doc_id ORDER BY doc_id
"""
