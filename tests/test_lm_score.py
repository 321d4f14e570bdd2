"""Semantic pins for the CCNet-style integer bigram-LM bucketing
(ops/lm.py): three-way parity (Spark ≡ DuckDB oracle ≡ pure-Python
reference), the CCNet ordering property (reference-like text scores
lower surprise than out-of-vocabulary text and lands in an earlier
bucket), the tercile arithmetic at small strata, and the <2-token drop.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from readability_spark.ops.lm import LM_SCALE, LM_SCORE_SQL, lm_score

# md5('lm|id')[0] in '0123' selects the reference (LM-training) docs.
# For this fixture: ref = {0, 2, 6, 8, 9}; candidates = {1, 3, 4, 5};
# doc 7 (<2 tokens) is dropped entirely.
DOCS = [
    (0, "the cat sat on the mat", "en"),        # REF (en model core)
    (1, "the cat sat on the mat again", "en"),  # near-copy of ref → head
    (2, "zz yy xx ww vv", "en"),                # REF (rare-token tail)
    (3, "the dog sat on the rug", "en"),        # partly in-model
    (4, "cat on mat the cat", "en"),            # seen tokens, unseen bigrams
    (5, "uno dos tres cuatro", "es"),           # single es candidate
    (6, "dos tres uno", "es"),                  # REF
    (7, "solo", "es"),                          # <2 tokens → dropped
    (8, "the mat sat", "en"),                   # REF
    (9, "qq rr ss tt", "es"),                   # REF
]


def _is_ref(doc_id):
    return hashlib.md5(f"lm|{doc_id}".encode()).hexdigest()[0] in "0123"


def _lm_ref(docs):
    toks = {i: t.lower().split() for i, t, _ in docs}
    langs = {i: lg for i, _, lg in docs}
    kept = {i: tk for i, tk in toks.items() if len(tk) >= 2}
    c1, c2 = {}, {}
    for i, tk in kept.items():
        if not _is_ref(i):
            continue
        for w in tk:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(c1)
    rows = {}
    for i, tk in kept.items():
        if _is_ref(i):
            continue
        ws = [((c1.get(a, 0) + v) * LM_SCALE) // (c2.get((a, b), 0) + 1)
              for a, b in zip(tk, tk[1:])]
        rows[i] = {"lang": langs[i], "n_pos": len(ws), "score": sum(ws),
                   "avg_surprise": sum(ws) // len(ws)}
    # per-lang terciles: rank by (avg asc, doc_id asc)
    for lg in {r["lang"] for r in rows.values()}:
        ids = sorted((rows[i]["avg_surprise"], i)
                     for i in rows if rows[i]["lang"] == lg)
        n = len(ids)
        for rank0, (_, i) in enumerate(ids):
            rows[i]["ppl_bucket"] = ("head", "middle", "tail")[
                (rank0 * 3) // n]
    return rows


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


def test_lm_score_three_way(spark, corpus):
    d, con = corpus
    assert {i for i, _, _ in DOCS if _is_ref(i)} == {0, 2, 6, 8, 9}
    got = {r["doc_id"]: r.asDict() for r in lm_score(spark, d).collect()}
    want = _lm_ref(DOCS)
    assert set(got) == set(want)          # ref docs + doc 7 absent
    for doc_id, exp in want.items():
        for k, val in exp.items():
            assert got[doc_id][k] == val, (doc_id, k)
    oracle = con.execute(LM_SCORE_SQL).df()
    assert len(oracle) == len(want)
    for _, row in oracle.iterrows():
        exp = want[row["doc_id"]]
        for k in exp:
            assert row[k] == exp[k], (row["doc_id"], k)


def test_lm_score_ccnet_ordering(spark, corpus):
    # the CCNet property the bucketing exists for: text that continues
    # the reference model (doc 1 ≈ ref doc 0) carries lower per-position
    # surprise than seen-tokens-in-unseen-order (doc 4), and strictly
    # lands in an earlier-or-equal bucket
    d, _ = corpus
    got = {r["doc_id"]: r for r in lm_score(spark, d).collect()}
    assert got[1]["avg_surprise"] < got[3]["avg_surprise"] \
        < got[4]["avg_surprise"]
    assert got[1]["ppl_bucket"] == "head"
    assert got[4]["ppl_bucket"] == "tail"
    # doc 5 is the only es candidate: rank 1 of 1 → bucket_idx 0 → head
    assert got[5]["ppl_bucket"] == "head"
    # the <2-token doc never appears
    assert 7 not in got


def test_lm_score_surprise_is_laplace_inverse(spark, corpus):
    # hand-check one position: ref = docs {0,2,6,8,9} → "the" occurs 3x
    # in ref (docs 0,8), V = |ref vocab|, bigram "the cat" occurs once
    # (doc 0).  Candidate doc 1 starts with that bigram:
    # w = ((3 + V) * SCALE) // (1 + 1).
    ref_toks = [t.lower().split() for i, t, _ in DOCS if _is_ref(i)]
    vocab = {w for tk in ref_toks for w in tk}
    c_the = sum(tk.count("the") for tk in ref_toks)
    assert c_the == 3
    w = ((c_the + len(vocab)) * LM_SCALE) // 2
    # recompute doc 1's full score in the python ref and confirm the
    # first position contributes exactly w
    rows = _lm_ref(DOCS)
    tk = "the cat sat on the mat again".split()
    c1 = {}
    c2 = {}
    for t in ref_toks:
        for x in t:
            c1[x] = c1.get(x, 0) + 1
        for a, b in zip(t, t[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    ws = [((c1.get(a, 0) + len(vocab)) * LM_SCALE)
          // (c2.get((a, b), 0) + 1) for a, b in zip(tk, tk[1:])]
    assert ws[0] == w
    assert rows[1]["score"] == sum(ws)


def test_lm_score_candidate_leg_never_shuffles_text(spark):
    # scale lock: the corpus-sized candidate leg joins the count tables
    # in place (broadcast at this scale) and its only hash exchanges
    # carry (doc_id, lang) / lang — gram text shuffles only inside the
    # reference-model training leg (c2 groupBy, bounded by the ref split)
    import re

    df = lm_score(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    gram_keyed = [k for k in keys if "bg" in k]
    assert len(gram_keyed) == 1, keys          # the c2 model build only
    assert all("doc_id" in k or "lang" in k
               for k in keys if "bg" not in k), keys
    assert len(re.findall(r"\n\(\d+\) SortMergeJoin\b", plan)) == 0, plan


def test_lm_score_fuzz_oracle_vs_reference():
    # randomized cross-check of the oracle builder against the pure-
    # Python reference over a shared small vocabulary — dense bigram
    # collisions, uneven lang strata (incl. 1-doc strata), and the
    # <2-token drop all occur naturally across seeds
    import random

    VOCAB = ["alpha", "beta", "gamma", "delta", "spam", "ham",
             "red", "blue", "xx", "yy"]
    for trial in range(10):
        rng = random.Random(100 + trial)
        docs = [(i, " ".join(rng.choice(VOCAB)
                             for _ in range(rng.randint(1, 40))),
                 rng.choice(["en", "fr"]))
                for i in range(rng.randint(2, 12))]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                    "lang VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?,?,?)", docs)
        want = _lm_ref(docs)
        got = con.execute(LM_SCORE_SQL).df()
        assert len(got) == len(want), trial
        for _, row in got.iterrows():
            exp = want[row["doc_id"]]
            for k in exp:
                assert row[k] == exp[k], (trial, row["doc_id"], k)
