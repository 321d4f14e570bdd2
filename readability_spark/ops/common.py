"""Shared helpers for the relational/training-data operators.

Every operator here has two faces:
- a Spark DataFrame implementation (built-in functions only — JVM-side,
  whole-stage codegen, no Python in the hot path), and
- an ANSI-SQL oracle string DuckDB runs on the same parquet tables.

Hashing is the cross-engine pivot: both engines share ``md5`` byte-for-byte,
so every hash-derived value (simhash bits, minhash integers, fingerprints)
is defined in terms of md5 hex digits and reproduced exactly in both
dialects.  Engine-specific hashes (xxhash64, DuckDB ``hash``) are never used
in oracled queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- tokenization (identical semantics in both dialects) --------------------
#
# NOT `\s`: Java's \s is ASCII [ \t\n\x0B\f\r] while DuckDB's RE2 \s excludes
# vertical tab — a VT-containing document would tokenize differently and
# silently skew every token-derived oracle.  Spell the class out in both
# dialects (same character set as Java \s, so Spark outputs are unchanged).

# Spark SQL string literals unescape one level: '\\t' in the SQL text → \t
# regex escape.  The Python constants therefore carry doubled backslashes.
# The bare char sets are exported so other char classes (e.g. textstats'
# BPE-ish negated class) build on the SAME set in both dialects.
WS_CHARS_SPARK = " \\\\t\\\\n\\\\r\\\\f\\\\x0b"
# DuckDB string literals are verbatim: \t reaches RE2 as the two chars \ t.
WS_CHARS_SQL = " \\t\\n\\r\\f\\x0b"
_WS_CLASS_SPARK = f"[{WS_CHARS_SPARK}]+"
_WS_CLASS_SQL = f"[{WS_CHARS_SQL}]+"


def tokens_col(text_col: str = "text"):
    """Non-empty whitespace tokens of lower(trim(text)) as array<string>."""
    return F.expr(
        f"filter(split(lower(trim({text_col})), '{_WS_CLASS_SPARK}'), "
        f"x -> x <> '')")


SQL_TOKENS = ("list_filter(regexp_split_to_array(lower(trim({col})), "
              f"'{_WS_CLASS_SQL}'), x -> x <> '')")


# --- md5-derived integers -----------------------------------------------------

def md5_prefix_int_expr(col: str, nhex: int = 8, start: int = 1) -> str:
    """Spark SQL: ``nhex`` hex digits of md5(col) from 1-based offset
    ``start`` as a bigint.

    Written with instr() arithmetic (not conv()) so the DuckDB mirror is
    literally the same expression.  Disjoint ``start`` offsets over the
    32-digit md5 give independent-enough integers for multi-hash schemes
    (Bloom positions, banded signatures) without a second hash invocation.
    """
    terms = " + ".join(
        f"(instr('{HEX}', substr(md5({col}), {start + j}, 1)) - 1) * "
        f"CAST({16 ** (nhex - 1 - j)} AS BIGINT)"
        for j in range(nhex))
    return f"({terms})"


def md5_prefix_int_sql(col: str, nhex: int = 8, start: int = 1) -> str:
    """DuckDB mirror of md5_prefix_int_expr (identical by construction)."""
    return md5_prefix_int_expr(col, nhex, start)
