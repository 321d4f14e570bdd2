"""Row-level CSV / JSON serde round-trips over the documents table.

Source/sink format breadth (SURVEY.md §2.1) with gate-checkable
semantics: each document is serialized to a CSV line (``to_csv``) and a
JSON object (``to_json``) and parsed back (``from_csv`` / ``from_json``)
IN-ROW — no filesystem, the pdf_extract pattern — and the query emits
per-document equality flags.  The oracle asserts the CONTRACT (the
round-trip is the identity), so any quoting, escaping, or null-handling
regression in either serde leg breaks the correctness gate rather than
silently corrupting a copy job.

The one genuinely lossy CSV edge — the empty-string / NULL ambiguity —
is closed explicitly: the writer emits NULL as ``\\N`` (the classic
Hadoop/Hive marker) and the reader maps ``\\N`` back to NULL and the
quoted empty token to ``''`` (``nullValue`` / ``emptyValue`` options on
both sides).  Null-safe ``<=>`` comparisons make the flags honest for
NULL-bearing rows.  Quoted commas, embedded quotes, embedded newlines,
tabs, and non-ASCII are covered by tests/test_serde.py.

IRREDUCIBLE limitation (documented, oracled, pinned): a string field
whose ENTIRE value is the literal marker ``\\N`` cannot survive the CSV
leg.  ``to_csv`` writes a value equal to nullValue unquoted, so it reads
back as NULL; forcing ``quoteAll`` does NOT help — measured on Spark
4.1, the writer backslash-escapes inside quotes, so the NULL marker and
the literal field both serialize to the *identical* bytes ``"\\\\N"``
(the information is destroyed at write time, no reader can recover it).
The flag stays honest instead: csv_ok is genuinely 0 for such rows, and
the oracle PREDICTS 0 for them (whole-field marker match on any string
column), so a corpus document whose text is exactly ``\\N`` keeps the
gate green rather than tripping a hard-coded 1.  Embedded ``\\N``
(mid-text) round-trips fine.  Pinned in tests/test_serde.py.

Scale notes (100 TB): pure per-row expression work inside one pruned
scan — zero shuffles beyond the gate-determinism ORDER BY (drop the
sort in production and a CSV/JSON export-verify pass is scan-bound,
exactly what a format-migration job wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import table

_SCHEMA = ("doc_id BIGINT, text STRING, lang STRING, source STRING, "
           "n_chars BIGINT")
_FIELDS = "doc_id, text, lang, source, n_chars"
# ignore*WhiteSpace defaults are asymmetric in Spark CSV (true on write,
# false on read), so an unquoted trailing space silently disappears on
# the write leg — disable trimming on BOTH sides (caught by the
# adversarial "trailing space " row in tests/test_serde.py)
_WS = ("'ignoreLeadingWhiteSpace', 'false', "
       "'ignoreTrailingWhiteSpace', 'false'")
_W_OPTS = f"map('nullValue', '\\\\N', {_WS})"
_R_OPTS = f"map('nullValue', '\\\\N', 'emptyValue', '', {_WS})"
_EQ = " AND ".join(
    f"p.{c} <=> {c}" for c in _FIELDS.split(", "))


def serde_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: md5 of the payload plus CSV and JSON round-trip
    identity flags (1 = the parsed row is null-safely equal to the
    source row on every column)."""
    return (
        table(spark, sf_dir, "documents")
        .withColumn("line", F.expr(
            f"to_csv(struct({_FIELDS}), {_W_OPTS})"))
        .withColumn("p", F.expr(f"from_csv(line, '{_SCHEMA}', {_R_OPTS})"))
        .withColumn("csv_ok", F.expr(f"CAST(({_EQ}) AS INT)"))
        .drop("line", "p")
        .withColumn("js", F.expr(f"to_json(struct({_FIELDS}))"))
        .withColumn("p", F.expr(f"from_json(js, '{_SCHEMA}')"))
        .withColumn("json_ok", F.expr(f"CAST(({_EQ}) AS INT)"))
        .select("doc_id", F.md5("text").alias("text_md5"),
                "csv_ok", "json_ok")
        .orderBy("doc_id")
    )


# the oracle IS the contract: round-tripping is the identity — except the
# whole-field \N marker collision (see module docstring), which the oracle
# predicts so the flag is checkable rather than assumed.  NULL fields fall
# through the CASE's ELSE (NULL = '\N' is NULL, not true), as they should:
# NULL round-trips exactly.
SERDE_ROUNDTRIP_SQL = r"""
SELECT doc_id, md5(text) AS text_md5,
       CAST(CASE WHEN text = '\N' OR lang = '\N' OR source = '\N'
                 THEN 0 ELSE 1 END AS INT) AS csv_ok,
       CAST(1 AS INT) AS json_ok
FROM documents
ORDER BY doc_id
"""
