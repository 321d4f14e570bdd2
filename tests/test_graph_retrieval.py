"""Semantic pins for the link-graph PageRank (ops/graph.py) and the
inverted-index retrieval operator (ops/retrieval.py): three-way parity
(Spark ≡ DuckDB oracle ≡ pure-Python integer reference) on a crafted
corpus, plus the structural invariants the fixed-point design guarantees
(mass bounds, degenerate iteration counts, deterministic tie-breaks).

The pure-Python reference recomputes the identical integer recurrences
(// division, exact sums), so any drift in either engine's arithmetic or
graph construction fails loudly.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from readability_spark.ops.graph import (
    LINK_PAGERANK_SQL,
    PR_ITERS,
    PR_SCALE,
    _pagerank_sql,
    link_pagerank,
)
from readability_spark.ops.retrieval import (
    SEARCH_TOPK_SQL,
    _search_sql,
    search_topk,
)

# doc_ids 0..9: N=10 keeps the fixed-point arithmetic human-checkable.
# doc_id 3 is the one md5('query|'||id)-selected probe query in range
# (hexdigest[0] == '0'); texts share a small vocabulary so retrieval
# scores collide and exercise the doc_id tie-break.
DOCS = [
    (0, "alpha beta alpha gamma", "en"),
    (1, "beta beta delta", "en"),
    (2, "gamma delta epsilon zeta", "en"),
    (3, "alpha delta zeta", "en"),          # probe query: alpha delta zeta
    (4, "zeta zeta zeta alpha", "en"),
    (5, "epsilon gamma beta", "en"),
    (6, "solo", "en"),
    (7, "alpha delta zeta", "en"),          # verbatim twin of the query doc
    (8, "beta gamma delta epsilon", "en"),
    (9, "zeta alpha delta delta", "en"),
]
N = len(DOCS)


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


# --- pure-Python integer references ------------------------------------------

def _ref_graph(n):
    edges = set()
    for d in range(n):
        for k in range(d % 3 + 1):
            dst = (d * 31 + k * 17 + 17) % n
            if dst != d:
                edges.add((d, dst))
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    return edges, outdeg


def _ref_pagerank(n, iters):
    edges, outdeg = _ref_graph(n)
    init = PR_SCALE // n
    base = 15 * init // 100
    pr = {d: init for d in range(n)}
    for _ in range(iters):
        s = {d: 0 for d in range(n)}
        for src, dst in edges:
            s[dst] += pr[src] // outdeg[src]
        pr = {d: base + 85 * s[d] // 100 for d in range(n)}
    return pr


def _ref_search(k=5):
    toks = {d: t.split() for d, t, _ in DOCS}
    tf = {}
    df = {}
    for d, ts in toks.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
        for t in ts:
            tf[(t, d)] = tf.get((t, d), 0) + 1
    out = {}
    for qid, _, _ in DOCS:
        if hashlib.md5(f"query|{qid}".encode()).hexdigest()[0] != "0":
            continue
        qts = set(toks[qid][:3])
        scores = {}
        for d in toks:
            sc = sum(tf.get((t, d), 0) * (N // df[t]) for t in qts)
            if sc > 0:
                scores[d] = sc
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [(r + 1, d, sc) for r, (d, sc) in enumerate(ranked)]
    return out


# --- PageRank ----------------------------------------------------------------

def test_pagerank_three_way_parity(spark, corpus):
    d, con = corpus
    ref = _ref_pagerank(N, PR_ITERS)
    rows = link_pagerank(spark, d).collect()
    assert {r["doc_id"]: r["pagerank"] for r in rows} == ref
    duck = con.execute(LINK_PAGERANK_SQL).fetchall()
    assert [(r["doc_id"], r["pagerank"]) for r in rows] == duck
    # ordering contract: pagerank DESC then doc_id ASC
    assert rows == sorted(rows, key=lambda r: (-r["pagerank"], r["doc_id"]))


@pytest.mark.parametrize("iters", [0, 1, 2])
def test_pagerank_iteration_counts(spark, corpus, iters):
    d, con = corpus
    ref = _ref_pagerank(N, iters)
    got = {r["doc_id"]: r["pagerank"]
           for r in link_pagerank(spark, d, iters=iters).collect()}
    assert got == ref
    if iters > 0:
        duck = dict(con.execute(
            "SELECT doc_id, pagerank FROM (" + _pagerank_sql(iters) + ")"
        ).fetchall())
        assert got == duck


def test_pagerank_mass_invariants(spark, corpus):
    d, _ = corpus
    init = PR_SCALE // N
    base = 15 * init // 100
    pr = {r["doc_id"]: r["pagerank"]
          for r in link_pagerank(spark, d).collect()}
    assert len(pr) == N                       # every node ranked
    assert all(v >= base for v in pr.values())  # teleport floor
    # floor divisions only shed mass: total never exceeds the start mass
    assert sum(pr.values()) <= N * init
    # the graph is non-trivial: mass actually moved somewhere
    assert max(pr.values()) > init


def test_pagerank_empty_corpus(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = link_pagerank(spark, d)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "pagerank"]


def test_pagerank_deterministic(spark, corpus):
    d, _ = corpus
    a = link_pagerank(spark, d).collect()
    b = link_pagerank(spark, d).collect()
    assert a == b


# --- retrieval ---------------------------------------------------------------

def test_search_three_way_parity(spark, corpus):
    d, con = corpus
    ref = _ref_search()
    rows = search_topk(spark, d).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rnk"], r["doc_id"], r["score"]))
    assert got == ref
    duck = con.execute(SEARCH_TOPK_SQL).fetchall()
    assert [(r["query_id"], r["rnk"], r["doc_id"], r["score"])
            for r in rows] == duck


def test_search_shape_and_ties(spark, corpus):
    d, _ = corpus
    rows = search_topk(spark, d).collect()
    # the only probe in range is doc 3 ("alpha delta zeta")
    assert {r["query_id"] for r in rows} == {3}
    by_rnk = {r["rnk"]: r for r in rows}
    assert sorted(by_rnk) == list(range(1, len(rows) + 1))  # contiguous
    # hand-scored with idf_int = N//df (alpha 2, delta 1, zeta 2):
    # doc 4 = 3*2+1*2 = 8, doc 9 = 6, then the verbatim twins 3 and 7
    # at 5 each — identical score, doc_id tie-break puts 3 first
    assert (by_rnk[1]["doc_id"], by_rnk[1]["score"]) == (4, 8)
    assert (by_rnk[2]["doc_id"], by_rnk[2]["score"]) == (9, 6)
    assert (by_rnk[3]["doc_id"], by_rnk[4]["doc_id"]) == (3, 7)
    assert by_rnk[3]["score"] == by_rnk[4]["score"] == 5
    assert all(r["score"] > 0 for r in rows)
    scores = [r["score"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert scores == sorted(scores, reverse=True)


def test_search_k_cap(spark, corpus):
    d, con = corpus
    rows = search_topk(spark, d, k=2).collect()
    assert len(rows) == 2 and [r["rnk"] for r in rows] == [1, 2]
    duck = con.execute(_search_sql(2)).fetchall()
    assert [(r["query_id"], r["rnk"], r["doc_id"], r["score"])
            for r in rows] == duck


def test_search_broadcasts_query_terms(spark, corpus):
    d, _ = corpus
    plan = search_topk(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
