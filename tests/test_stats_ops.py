"""Semantic pins for exact length quantiles (ops/stats.py): hand-computed
nearest-rank pins on a crafted corpus, Spark ≡ DuckDB parity, and the
tie-invariance property (duplicate lengths can permute under row_number
without moving any quantile value)."""

from __future__ import annotations

import duckdb
import pytest

from readability_spark.ops.stats import (
    LENGTH_QUANTILES_SQL,
    length_quantiles,
)

# en: lengths 1..10 → p50 = rank 5 → 5, p90 = rank 9 → 9, p99 = rank 10
# es: lengths {2, 2, 7} → p50 = rank 2 → 2 (tie), p90 = p99 = rank 3 → 7
DOCS = (
    [(i, " ".join(["w"] * (i + 1)), "en") for i in range(10)]
    + [(10, "a b", "es"), (11, "c d", "es"),
       (12, "e f g h i j k", "es")]
)


@pytest.fixture()
def corpus(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        DOCS, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')")
    return d, con


def test_quantiles_hand_pins_and_parity(spark, corpus):
    d, con = corpus
    rows = {r["lang"]: r.asDict()
            for r in length_quantiles(spark, d).collect()}
    assert rows["en"] == {"lang": "en", "n_docs": 10,
                          "p50": 5, "p90": 9, "p99": 10}
    assert rows["es"] == {"lang": "es", "n_docs": 3,
                          "p50": 2, "p90": 7, "p99": 7}
    duck = con.execute(LENGTH_QUANTILES_SQL).fetchall()
    got = [tuple(r) for r in length_quantiles(spark, d).collect()]
    assert got == duck


def test_quantiles_monotone_and_bounded(spark, corpus):
    d, _ = corpus
    for r in length_quantiles(spark, d).collect():
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["p50"] >= 1  # every doc here is non-empty
