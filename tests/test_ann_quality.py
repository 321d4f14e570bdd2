"""ANN quality: the sign-LSH scale path must retain real recall against the
brute-force exact top-k (otherwise it's a fast wrong answer)."""

import pytest

from readability_spark.ops.similarity import (
    cosine_topk,
    lsh_bandor_topk,
    lsh_cosine_topk,
    lsh_multiprobe_topk,
)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_lsh_recall_against_exact(spark, sf_dir):
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(spark, sf_dir).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in lsh_cosine_topk(spark, sf_dir).collect()}
    assert exact, "exact top-k must not be empty"
    recall = len(exact & approx) / len(exact)
    # 8 hyperplanes over 500 vectors: buckets are coarse, but the scale
    # path must at least find the self-match and a meaningful share of
    # true neighbors
    assert recall >= 0.2, f"LSH recall {recall:.2f} too low"
    # every query's rank-1 should be itself (cosine(v,v)=1) in both
    exact_rank1 = {r["query_id"]: r["neighbor_id"]
                   for r in cosine_topk(spark, sf_dir).collect()
                   if r["rank"] == 1}
    assert all(q == n for q, n in exact_rank1.items())


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Probing the 8 one-bit-flip neighbor buckets must recover neighbors a
    single hyperplane separated from the query.  Pinned at the measured
    values: recall@5 is 0.20 single-probe vs 0.28 multiprobe at sf0.001
    (0.20 vs 0.32 at sf0.01) — the margin is the whole point of the probe
    fan-out."""
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(spark, sf_dir).collect()}
    single = {(r["query_id"], r["neighbor_id"])
              for r in lsh_cosine_topk(spark, sf_dir).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in lsh_multiprobe_topk(spark, sf_dir).collect()}
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single, (r_single, r_multi)
    assert r_multi >= 0.28, f"multiprobe recall regressed: {r_multi:.2f}"
    # (note: emitted top-5 PAIRS are not a superset of single-probe's —
    # better candidates from flipped buckets displace junk — but TRUE
    # neighbors can never be displaced, hence the recall dominance above)


@pytest.mark.parametrize("sf_dir",
                         ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_bandor_recall_meets_target(spark, sf_dir):
    """Band-OR amplification (L=4 independent signature tables, Hamming-≤2
    probes per table, union of candidates, exact re-rank) must lift
    recall@5 to a genuinely useful level.  Pinned at the measured value:
    0.80 at BOTH sf0.001 and sf0.01 — vs 0.20 single-probe and 0.28/0.32
    multiprobe.  The floor asserts the VERDICT r3 target (≥ 0.6) with the
    measured 0.80 recorded here; a drop below 0.8 on this seeded testdata
    means the signature family or probe set changed."""
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(spark, sf_dir).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in lsh_multiprobe_topk(spark, sf_dir).collect()}
    bandor = {(r["query_id"], r["neighbor_id"])
              for r in lsh_bandor_topk(spark, sf_dir).collect()}
    r_multi = len(multi & exact) / len(exact)
    r_bandor = len(bandor & exact) / len(exact)
    assert r_bandor >= r_multi, (r_multi, r_bandor)
    assert r_bandor >= 0.8, f"band-OR recall regressed: {r_bandor:.2f}"
    # self-match is always a candidate (a vector collides with itself in
    # every table) and always rank 1
    rank1 = {r["query_id"]: r["neighbor_id"]
             for r in lsh_bandor_topk(spark, sf_dir).collect()
             if r["rank"] == 1}
    assert all(q == n for q, n in rank1.items())
