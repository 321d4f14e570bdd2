"""SemDedup (ops.similarity.semdedup): quantizer-cell semantic dedup.

The DuckDB oracle (gate replica) pins cross-engine exactness; these tests
pin the SEMANTICS — the planted-duplicate design point the synthetic corpus
cannot exercise (its max pairwise cosine is ~0.5, so no real near-copies
exist), and the output invariants of the greedy keep-lowest-centroid-cos
rule.
"""

import pytest
from pyspark.sql import functions as F

from readability_spark.ops.similarity import (
    IVF_K,
    SEM_DUP_THRESHOLD,
    sem_k_for,
    semdedup,
    semdedup_df,
    semdedup_scaled,
)

SF_DIR = "/root/testdata/sf0.001"


def test_semdedup_output_invariants(spark):
    rows = semdedup(spark, SF_DIR).collect()
    assert len(rows) == 500
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 500 and ids == sorted(ids)
    for r in rows:
        assert r["dropped"] in (0, 1)
        assert r["n_dups"] >= 0
        # a vector with no above-threshold cluster neighbor can never drop
        if r["n_dups"] == 0:
            assert r["dropped"] == 0
        # centroid similarity is a cosine
        assert -1.0 <= r["cent_cos"] <= 1.0
    # gate-scale threshold must exercise BOTH paths (else the query is
    # vacuous and a semantics regression could hide)
    assert any(r["dropped"] == 1 for r in rows)
    assert any(r["dropped"] == 0 and r["n_dups"] > 0 for r in rows)


def test_semdedup_planted_duplicates_drop_all_but_edge(spark):
    """Three identical vectors (one original + two planted copies) share a
    cluster and a centroid-cosine, so the (cent_cos, vec_id) key keeps
    exactly the lowest vec_id.  threshold=0.999 isolates the planted
    triple: no natural pair in the corpus comes near it."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") == 100)
    planted = emb
    for new_id in (9000, 9001):
        planted = planted.union(
            src.select(F.lit(new_id).cast("long").alias("vec_id"),
                       "embedding", "label"))
    out = {r["vec_id"]: r for r in semdedup_df(planted, 0.999).collect()}
    assert len(out) == 502
    triple = [out[100], out[9000], out[9001]]
    # identical vectors -> identical cluster and centroid similarity
    assert len({r["centroid_id"] for r in triple}) == 1
    assert len({r["cent_cos"] for r in triple}) == 1
    # each sees the other two as duplicates; the lowest vec_id survives
    assert [r["n_dups"] for r in triple] == [2, 2, 2]
    assert [r["dropped"] for r in triple] == [0, 1, 1]
    # nothing else is within 0.999 of anything -> untouched
    for vid, r in out.items():
        if vid not in (100, 9000, 9001):
            assert r["n_dups"] == 0 and r["dropped"] == 0


def test_sem_k_rule_is_balanced_sqrt():
    """k = max(IVF_K, isqrt(n)): the flat-quantizer balance point where
    assignment (n·k) and within-cell pairs (n²/k) are both Θ(n^1.5) —
    either extreme is quadratic (the r7 10× probe measured fixed-k at
    48.7× wall for ~9× data).  Paper-order sanity: LAION-440M → ~21k
    cells vs the paper's 50k."""
    assert sem_k_for(0) == IVF_K
    assert sem_k_for(IVF_K * IVF_K) == IVF_K          # floor boundary
    assert sem_k_for(500) == 22
    assert sem_k_for(20_000) == 141
    assert 20_000 < sem_k_for(440_000_000) < 22_000


def test_semdedup_scaled_runs_and_keeps_invariants(spark):
    """The production √n form over the gate corpus (n=500 → k=22): same
    output contract as the oracled fixed-k query — one row per vector,
    verdicts consistent, and a genuinely wider quantizer in play."""
    rows = semdedup_scaled(spark, SF_DIR).collect()
    assert len(rows) == 500
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 500 and ids == sorted(ids)
    assert len({r["centroid_id"] for r in rows}) > IVF_K
    for r in rows:
        assert r["dropped"] in (0, 1)
        if r["n_dups"] == 0:
            assert r["dropped"] == 0
        assert -1.0 <= r["cent_cos"] <= 1.0


def test_semdedup_wider_quantizer_still_drops_planted_copies(spark):
    """The k-dial (the scaled form's anti-quadratic lever: the r7 10×
    probe measured 48.7× wall growth at fixed k=16) must not change the
    design-point semantics: identical vectors land in the SAME cell no
    matter how many cells exist, so the planted triple still resolves to
    keep-lowest-vec_id under a 2× wider quantizer."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") == 100)
    planted = emb
    for new_id in (9000, 9001):
        planted = planted.union(
            src.select(F.lit(new_id).cast("long").alias("vec_id"),
                       "embedding", "label"))
    out = {r["vec_id"]: r for r in
           semdedup_df(planted, 0.999, k=2 * IVF_K).collect()}
    assert len(out) == 502
    # the wider quantizer genuinely produced more cells
    assert len({r["centroid_id"] for r in out.values()}) > IVF_K
    triple = [out[100], out[9000], out[9001]]
    assert len({r["centroid_id"] for r in triple}) == 1
    assert [r["n_dups"] for r in triple] == [2, 2, 2]
    assert [r["dropped"] for r in triple] == [0, 1, 1]
    for vid, r in out.items():
        if vid not in (100, 9000, 9001):
            assert r["n_dups"] == 0 and r["dropped"] == 0


def test_semdedup_threshold_monotonicity(spark):
    """Raising the threshold can only shrink the duplicate relation: the
    set of (vec_id with n_dups>0) at a higher threshold is a subset of the
    lower threshold's, and total drops cannot grow."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lo = {r["vec_id"]: r for r in
          semdedup_df(emb, SEM_DUP_THRESHOLD).collect()}
    hi = {r["vec_id"]: r for r in
          semdedup_df(emb, 0.45).collect()}
    dup_lo = {v for v, r in lo.items() if r["n_dups"] > 0}
    dup_hi = {v for v, r in hi.items() if r["n_dups"] > 0}
    assert dup_hi <= dup_lo
    assert sum(r["dropped"] for r in hi.values()) <= \
        sum(r["dropped"] for r in lo.values())
