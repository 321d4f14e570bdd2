"""Pins for the CSV/JSON serde round-trip contract (ops/serde.py):
adversarial payloads (embedded commas, quotes, newlines, tabs,
backslashes, non-ASCII, the literal \\N marker text, empty string, and
NULL) all round-trip losslessly, the empty-vs-NULL CSV ambiguity stays
closed, and a deliberately broken reader config is DETECTED by the flag
(the contract is falsifiable, not tautological).

Plus the one irreducible CSV limitation: a field whose ENTIRE value is
the marker \\N reads back as NULL (quoteAll cannot fix it — the writer
escape-doubles the backslash identically for the marker and the literal,
producing byte-identical output), so csv_ok is honestly 0 for such rows
and the oracle predicts exactly that.
"""

from __future__ import annotations

import duckdb
import pytest

from readability_spark.ops.serde import (
    SERDE_ROUNDTRIP_SQL,
    serde_roundtrip,
)

DOCS = [
    (0, "plain text", "en", "src0", 10),
    (1, 'comma, and "quotes" here', "en", "src1", 24),
    (2, "line\nbreak and\ttab", "fr", "src0", 18),
    (3, "", "es", "src2", 0),                       # empty ≠ NULL
    (4, None, "en", "src3", 0),                     # NULL ≠ empty
    (5, "unicode: café 中文 🙂", "zh", "src1", 19),
    (6, "literal \\N marker in text", "en", "src2", 25),
    (7, "trailing space ", "de", "src0", 15),
    (8, "back\\slash", "en", "src1", 10),
    (9, "\\N", "en", "src0", 2),                    # WHOLE field = marker
]


@pytest.fixture()
def corpus(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        DOCS,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')")
    return d, con


def test_serde_adversarial_payloads_roundtrip(spark, corpus):
    d, con = corpus
    got = {r["doc_id"]: r for r in serde_roundtrip(spark, d).collect()}
    assert set(got) == set(range(10))
    for doc_id, r in got.items():
        # doc 9's text IS the \N marker: the CSV leg is irreducibly lossy
        # there (see ops/serde.py docstring) and the flag says so
        assert r["csv_ok"] == (0 if doc_id == 9 else 1), doc_id
        assert r["json_ok"] == 1, doc_id
    oracle = [tuple(r)
              for r in con.execute(SERDE_ROUNDTRIP_SQL).fetchall()]
    assert [tuple(got[i]) for i in sorted(got)] == oracle


def test_serde_contract_is_falsifiable(spark, corpus):
    # the same pipeline with the null/empty options REMOVED misparses
    # the empty-string row — proving the flag actually measures the
    # round-trip rather than being constant by construction
    from pyspark.sql import functions as F

    from readability_spark.ops.common import table
    from readability_spark.ops.serde import _FIELDS, _SCHEMA, _EQ

    d, _ = corpus
    broken = (
        table(spark, d, "documents")
        .withColumn("line", F.expr(f"to_csv(struct({_FIELDS}))"))
        .withColumn("p", F.expr(f"from_csv(line, '{_SCHEMA}')"))
        .withColumn("csv_ok", F.expr(f"CAST(({_EQ}) AS INT)"))
        .select("doc_id", "csv_ok"))
    flags = {r["doc_id"]: r["csv_ok"] for r in broken.collect()}
    assert flags[3] == 0          # '' → NULL without emptyValue
    assert flags[0] == 1          # plain rows still fine


def test_serde_null_and_empty_stay_distinct(spark, corpus):
    # the writer's \N marker and the reader's emptyValue mapping keep
    # the two states separate through the CSV line itself
    from pyspark.sql import functions as F

    from readability_spark.ops.common import table
    from readability_spark.ops.serde import _FIELDS, _W_OPTS

    d, _ = corpus
    lines = {
        r["doc_id"]: r["line"]
        for r in table(spark, d, "documents")
        .withColumn("line",
                    F.expr(f"to_csv(struct({_FIELDS}), {_W_OPTS})"))
        .select("doc_id", "line").collect()}
    assert ',"",' in lines[3]          # empty string: quoted empty token
    assert ",\\N," in lines[4]         # NULL: the marker, unquoted
    # the irreducible collision at the byte level: a whole-field literal
    # \N writes the SAME token as NULL — lost at write time, so csv_ok=0
    assert ",\\N," in lines[9]
