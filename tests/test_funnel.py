"""Semantic pins for the curation funnel (ops/funnel.py): three-way
parity on a crafted corpus where every stage removes at least one
specific document for a hand-known reason, sequential (not independent)
stage accounting, and the integer boundary semantics of the repetition
and contamination thresholds.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from readability_spark.ops.curation import DECON_N
from readability_spark.ops.funnel import (
    CURATION_FUNNEL_SQL,
    FUNNEL_LEN_HI,
    FUNNEL_LEN_LO,
    FUNNEL_REP_PCT,
    curation_funnel,
)


def _is_bench(doc_id):
    return hashlib.md5(f"bench|{doc_id}".encode()).hexdigest()[0] in "0123"


def _funnel_ref(docs):
    toks = {i: t.lower().split() for i, t, _ in docs}
    cand = {i for i in toks if not _is_bench(i)}
    bench_grams = set()
    for i in toks:
        if _is_bench(i) and len(toks[i]) >= DECON_N:
            tk = toks[i]
            bench_grams |= {" ".join(tk[j:j + DECON_N])
                            for j in range(len(tk) - DECON_N + 1)}
    seen, flags = set(), {}
    for i in sorted(cand):            # keep-first by doc_id within md5
        tk = toks[i]
        text = dict((d, t) for d, t, _ in docs)[i]
        h = hashlib.md5(text.encode()).hexdigest()
        f1 = h not in seen
        seen.add(h)
        f2 = FUNNEL_LEN_LO <= len(tk) <= FUNNEL_LEN_HI
        if len(tk) >= 2:
            from collections import Counter
            bg = Counter(" ".join(tk[j:j + 2]) for j in range(len(tk) - 1))
            top_c, n_pos = max(bg.values()), len(tk) - 1
            f3 = top_c * FUNNEL_REP_PCT < n_pos
        else:
            f3 = True
        if len(tk) >= DECON_N:
            grams = [" ".join(tk[j:j + DECON_N])
                     for j in range(len(tk) - DECON_N + 1)]
            c = sum(1 for g in grams if g in bench_grams)
            f4 = not (c * 5 >= len(grams))
        else:
            f4 = True
        flags[i] = (f1, f2, f3, f4)
    c = [len(cand)]
    for k in range(4):
        c.append(sum(1 for f in flags.values() if all(f[:k + 1])))
    names = ["exact_dedup", "length_band", "repetition", "decontaminate"]
    return [(k, names[k - 1], c[k - 1], c[k - 1] - c[k], c[k])
            for k in range(1, 5)]


# doc ids 4, 5 are the benchmark quarter (md5('bench|id') in 0-3).
# Candidates: 0 dup-of-9 (dropped at stage 1 — 9 < 0 is false, so the
# keep-first survivor is 0... keep-first is by doc_id ASC, so 0 survives
# and 9 drops), 1 too short, 2 OK, 3 verbatim bench copy (contaminated),
# 6 repetitive (one bigram >= 10%), 7 OK, 9 dup of 0.
_OK = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
       "lam mu nu xi omicron pi rho sigma tau upsilon")   # 20 tokens
_REP = ("spam ham " * 10).strip() + " " + _OK[:_OK.index(" lam")]  # 32 toks
DOCS = [
    (0, _OK + " one", "en"),
    (1, "tiny doc here", "en"),                       # 3 < LEN_LO
    (2, _OK + " two", "en"),
    (3, "alpha beta gamma delta epsilon " + _OK, "en"),  # bench overlap
    (4, "alpha beta gamma delta epsilon", "en"),      # BENCH
    (5, "red green blue", "es"),                      # BENCH
    (6, _REP, "en"),                                  # repetitive
    (7, _OK + " three", "en"),
    (9, _OK + " one", "en"),                          # dup of 0
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


def test_funnel_three_way(spark, corpus):
    d, con = corpus
    assert _is_bench(4) and _is_bench(5)
    assert not any(_is_bench(i) for i in (0, 1, 2, 3, 6, 7, 9))
    got = [tuple(r) for r in curation_funnel(spark, d).collect()]
    want = _funnel_ref(DOCS)
    assert got == want
    oracle = [tuple(r) for r in con.execute(CURATION_FUNNEL_SQL).fetchall()]
    assert oracle == want


def test_funnel_every_stage_fires(spark, corpus):
    d, _ = corpus
    got = {r["stage_name"]: r for r in curation_funnel(spark, d).collect()}
    # 7 candidates in; the dup (9) drops first
    assert (got["exact_dedup"]["docs_in"],
            got["exact_dedup"]["docs_removed"]) == (7, 1)
    # the 3-token doc falls out of the length band
    assert got["length_band"]["docs_removed"] == 1
    # the spam/ham doc: 'spam ham' bigram 10/31 positions ≥ 10%
    assert got["repetition"]["docs_removed"] == 1
    # doc 3 leads with bench doc 4 verbatim: 3 of 24 grams... ≥ 20%?
    # 5·n_contam ≥ n_grams decides; the reference computed it — just pin
    # that exactly one doc fell here and three docs survive everything
    assert got["decontaminate"]["docs_removed"] == 1
    assert got["decontaminate"]["docs_out"] == 3


def test_funnel_accounting_is_sequential(spark, corpus):
    # docs_in of stage k+1 equals docs_out of stage k, and removed+out
    # always reconciles — the funnel is a chain, not independent filters
    d, _ = corpus
    rows = curation_funnel(spark, d).collect()
    for r in rows:
        assert r["docs_in"] == r["docs_removed"] + r["docs_out"]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["docs_in"] == prev["docs_out"]


def test_funnel_thresholds_are_integerized():
    # the keep/drop boundaries never touch float division: 10·top_c <
    # n_pos and 5·n_contam ≥ n_grams are the exact comparisons both
    # engines run.  Boundary cases: top 1 bigram in 10 positions is
    # dropped (10·1 == 10, not <); 1 contaminated of 5 grams is dropped
    # (5·1 == 5 ≥ 5); 1 of 6 survives.
    assert not (1 * FUNNEL_REP_PCT < 10)
    assert 1 * FUNNEL_REP_PCT < 11
    assert 1 * 5 >= 5
    assert not (1 * 5 >= 6)


def test_funnel_fuzz_oracle_vs_reference():
    # randomized cross-check of the funnel oracle against the pure-
    # Python reference: random doc counts/lengths over a small shared
    # vocabulary exercise duplicate groups, both length-band edges, the
    # integer repetition boundary, and graded contamination
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
        got = [tuple(r)
               for r in con.execute(CURATION_FUNNEL_SQL).fetchall()]
        assert got == _funnel_ref(docs), (trial, docs)
