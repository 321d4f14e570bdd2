"""Semantic pins for incremental-snapshot dedup (ops/incremental.py):
three-way parity on a crafted old/new split with a verbatim cross-split
copy, a near-copy sharing most shingles, a fresh document, and a
too-short document — plus the routing invariants (exact ⊂ collision
evidence ordering, old docs never reported, new-vs-new duplicates do
NOT flag — the screen is against the INGESTED corpus only).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from readability_spark.ops.incremental import (
    DEDUP_INCREMENTAL_SQL,
    dedup_incremental,
)


def _is_new(doc_id):
    return hashlib.md5(f"snap|{doc_id}".encode()).hexdigest()[0] in "cdef"


_BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron")
# old (ingested): 1, 7, 9; new batch: 0, 2, 3, 4
DOCS = [
    (1, _BASE, "en"),                                   # OLD
    (7, "one two three four five six seven eight", "en"),  # OLD
    (9, "completely different ingested material here today", "en"),  # OLD
    (0, _BASE, "en"),                   # NEW: verbatim copy of old 1
    (2, _BASE + " extra tail words", "en"),  # NEW: near-copy (shares mins)
    (3, "fresh unseen vocabulary nobody ingested before now", "en"),  # NEW
    (4, "tiny doc", "en"),              # NEW: <3 tokens → no bands
    (5, "fresh unseen vocabulary nobody ingested before now", "en"),
    # ^ NEW: exact dup of NEW doc 3 — must NOT flag (old-only screen)
]


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


def test_incremental_split_premise():
    assert all(not _is_new(i) for i in (1, 7, 9))
    assert all(_is_new(i) for i in (0, 2, 3, 4, 5))


def test_incremental_routing(spark, corpus):
    d, _ = corpus
    got = {r["doc_id"]: r for r in dedup_incremental(spark, d).collect()}
    assert set(got) == {0, 2, 3, 4, 5}     # new batch only, old never
    # verbatim copy of ingested doc 1: exact + every band collides
    assert got[0]["exact_dup"] == 1
    assert got[0]["n_band_hits"] == 4
    assert got[0]["decision"] == "skip_exact"
    # near-copy: not exact, but shares shingle minima → band collision
    assert got[2]["exact_dup"] == 0
    assert got[2]["n_band_hits"] >= 1
    assert got[2]["decision"] == "verify"
    # fresh content: ingest without running the verifier
    assert got[3]["decision"] == "ingest"
    assert (got[3]["exact_dup"], got[3]["n_band_hits"]) == (0, 0)
    # <3 tokens: no shingles, no bands — ingests on exact evidence alone
    assert got[4]["decision"] == "ingest"
    assert got[4]["n_band_hits"] == 0
    # new-vs-new duplicate does NOT flag: the screen is against the
    # ingested corpus; intra-batch dedup is dedup_exact/near_dedup's job
    assert got[5]["exact_dup"] == 0 and got[5]["decision"] == "ingest"


def test_incremental_oracle_parity(spark, corpus):
    d, con = corpus
    got = [tuple(r) for r in dedup_incremental(spark, d).collect()]
    oracle = [tuple(r)
              for r in con.execute(DEDUP_INCREMENTAL_SQL).fetchall()]
    assert got == oracle


def test_incremental_exact_implies_band_hits(spark, corpus):
    # an exact duplicate has identical shingles, hence identical minhash
    # signature, hence collides in ALL bands present in the old index —
    # the near layer can never miss what the exact layer catches
    d, _ = corpus
    for r in dedup_incremental(spark, d).collect():
        if r["exact_dup"] == 1 and r["n_band_hits"] is not None:
            from readability_spark.ops.dedup import LSH_BANDS
            assert r["n_band_hits"] == LSH_BANDS
