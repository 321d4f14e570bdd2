"""ANN quality: the sign-LSH scale path must retain real recall against the
brute-force exact top-k (otherwise it's a fast wrong answer)."""

import pytest

from readability_spark.ops.similarity import cosine_topk, lsh_cosine_topk


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
