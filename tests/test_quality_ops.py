"""Semantic pins for the corpus-quality operators (ops/quality.py) on
crafted corpora where every signal is hand-computable, plus three-way
parity (Spark ≡ DuckDB oracle ≡ pure-Python reference) on shapes the
shipped testdata doesn't exercise (ragged tails, sub-5-token docs,
alignment-sensitive chunk repeats, tf/df tiebreaks).
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from readability_spark.ops.quality import (
    CHUNK_DEDUP_SQL,
    CHUNK_TOKENS,
    LINE_DEDUP_SQL,
    REPEATED_SUBSTR_SQL,
    QUALITY_REPETITION_SQL,
    SAMPLE_STRATIFIED_SQL,
    TOP_TERMS_SQL,
    chunk_dedup,
    line_dedup,
    quality_repetition,
    repeated_substr,
    sample_stratified,
    top_terms,
)

DOCS = [
    # (doc_id, text, lang): plain single-space text so the pure-Python
    # split() reference matches the shared whitespace class exactly
    (0, "a b a b a b", "en"),                       # top bigram saturates
    (1, "x y z w v x y z w v x y z w v", "en"),     # repeated 5-gram
    (2, "one two three four five six seven eight", "fr"),  # all unique
    (3, "t u", "fr"),                               # < 5 tokens → dropped
    (4, "x y z w v q r s t u u u", "es"),           # shares doc 1's chunk
    (5, "p x y z w v k l m n o j", "es"),           # UNALIGNED shared run
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


def _rep_ref(text):
    toks = text.lower().split()
    n = len(toks)
    if n < 5:
        return None
    bi = Counter(" ".join(toks[i:i + 2]) for i in range(n - 1))
    g5 = Counter(" ".join(toks[i:i + 5]) for i in range(n - 4))
    dup5 = sum(v for v in g5.values() if v >= 2)
    return {
        "n_tokens": n,
        "top2_count": max(bi.values()),
        "n_bigrams": n - 1,
        "dup5_tokens": dup5,
        "n_5grams": n - 4,
        "top2gram_frac": round(max(bi.values()) * 2.0 / n, 6),
        "dup5_frac": round(dup5 * 1.0 / (n - 4), 6),
    }


def test_quality_repetition_three_way(spark, corpus):
    d, con = corpus
    got = {r["doc_id"]: r.asDict()
           for r in quality_repetition(spark, d).collect()}
    want = {i: _rep_ref(t) for i, t, _ in DOCS if _rep_ref(t) is not None}
    assert set(got) == set(want)          # doc 3 dropped (< 5 tokens)
    for doc_id, exp in want.items():
        for k, v in exp.items():
            assert got[doc_id][k] == pytest.approx(v), (doc_id, k)
    # the oracle agrees row-for-row
    oracle = con.execute(QUALITY_REPETITION_SQL).df()
    assert len(oracle) == len(got)
    for _, row in oracle.iterrows():
        exp = want[row["doc_id"]]
        for k in exp:
            assert row[k] == pytest.approx(exp[k]), (row["doc_id"], k)


def test_quality_repetition_hand_values(spark, corpus):
    d, _ = corpus
    got = {r["doc_id"]: r for r in quality_repetition(spark, d).collect()}
    # doc 0: "a b a b a b" — bigram "a b"×3 of 5 → frac 6/6 = 1.0
    assert got[0]["top2_count"] == 3
    assert got[0]["top2gram_frac"] == 1.0
    assert got[0]["dup5_tokens"] == 0
    # doc 1: 15 tokens with period 5, so EVERY 5-gram position repeats
    # (position i equals position i+5) → all 11 of 11 duplicated
    assert got[1]["n_5grams"] == 11
    assert got[1]["dup5_tokens"] == 11
    assert got[1]["dup5_frac"] == 1.0
    # doc 2: all-unique → minimal repetition
    assert got[2]["top2_count"] == 1
    assert got[2]["dup5_tokens"] == 0


def _chunk_ref(docs, n=CHUNK_TOKENS):
    chunks = {}      # doc_id -> [chunk strings], ragged tail dropped
    for doc_id, text, _ in docs:
        toks = text.lower().split()
        chunks[doc_id] = [
            " ".join(toks[i:i + n]) for i in range(0, len(toks) - n + 1, n)
            if len(toks[i:i + n]) == n]
    ndocs = Counter()
    for doc_id, cs in chunks.items():
        for c in set(cs):
            ndocs[c] += 1
    out = {}
    for doc_id, cs in chunks.items():
        if not cs:
            continue
        shared = sum(1 for c in cs if ndocs[c] >= 2)
        out[doc_id] = (len(cs), shared, round(shared / len(cs), 6))
    return out


def test_chunk_dedup_alignment_sensitive(spark, corpus):
    d, con = corpus
    got = {r["doc_id"]: r for r in chunk_dedup(spark, d).collect()}
    want = _chunk_ref(DOCS)
    assert set(got) == set(want)
    for doc_id, (n_chunks, shared, frac) in want.items():
        assert got[doc_id]["n_chunks"] == n_chunks, doc_id
        assert got[doc_id]["shared_chunks"] == shared, doc_id
        assert got[doc_id]["boilerplate_frac"] == pytest.approx(frac), doc_id
    # docs 1 and 4 both start "x y z w" on a chunk boundary → shared;
    # doc 5 contains the same run shifted by one token → NOT shared
    # (non-overlapping chunking is alignment-sensitive by design)
    assert got[1]["shared_chunks"] >= 1
    assert got[4]["shared_chunks"] >= 1
    assert got[5]["shared_chunks"] == 0
    # doc 3 ("t u") has no full chunk → absent entirely
    assert 3 not in got
    oracle = con.execute(CHUNK_DEDUP_SQL).df()
    assert {(r["doc_id"], r["n_chunks"], r["shared_chunks"])
            for _, r in oracle.iterrows()} == \
           {(k, v[0], v[1]) for k, v in want.items()}


def test_sample_stratified_exhaustive_when_k_exceeds_stratum(spark, corpus):
    d, con = corpus
    rows = sample_stratified(spark, d, k=25).collect()
    # every doc sampled (strata of 2 ≤ 25), ranks contiguous from 1
    assert len(rows) == len(DOCS)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["sample_rank"])
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang
    # deterministic: identical across invocations and vs the oracle
    again = sample_stratified(spark, d, k=25).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    oracle = con.execute(SAMPLE_STRATIFIED_SQL).fetchall()
    assert [tuple(r) for r in rows] == [tuple(r) for r in oracle]


def test_sample_stratified_k_cuts_per_stratum(spark, corpus):
    d, _ = corpus
    rows = sample_stratified(spark, d, k=1).collect()
    assert sorted(r["lang"] for r in rows) == ["en", "es", "fr"]
    assert all(r["sample_rank"] == 1 for r in rows)


def test_top_terms_tiebreaks(spark, corpus):
    d, con = corpus
    got = top_terms(spark, d).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: "a b a b a b" — tf ties at 3; df: 'a' in 1 doc, 'b' in 1 doc
    # → lexicographic tiebreak puts 'a' first
    assert [r["term"] for r in by_doc[0]] == ["a", "b"]
    assert [r["tf"] for r in by_doc[0]] == [3, 3]
    # doc 4: 'u'×3 dominates; then tf=1 terms ordered by (df, term):
    # terms unique to doc 4 (df=1: q,r,s) beat corpus-shared ones
    assert by_doc[4][0]["term"] == "u"
    assert by_doc[4][0]["tf"] == 3
    assert by_doc[4][1]["term"] == "q"      # df=1, lexicographically first
    # ranks are 1..k and ordering is (tf desc, df asc, term asc)
    for doc_id, rs in by_doc.items():
        assert [r["term_rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["tf"], r["df"], r["term"]) for r in rs]
        assert keys == sorted(keys), doc_id
    oracle = con.execute(TOP_TERMS_SQL).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in oracle)


# --- line_dedup (keep-first rewrite) ------------------------------------------

LDOCS = [
    # every keep/remove decision hand-computable at CHUNK_TOKENS=4
    (0, "a b c d e f g h", "en"),        # 2 full chunks, both unique
    (1, "a b c d x y z", "en"),          # chunk 0 repeats doc 0's → removed
    (2, "p q r s p q r s p q", "fr"),    # WITHIN-doc repeat + ragged tail
    (3, "a b c d", "fr"),                # whole doc removed → empty rewrite
    (4, "m n", "es"),                    # ragged-only doc, unique, kept
]


def _line_ref(docs, k=CHUNK_TOKENS):
    import hashlib
    chunks = {}
    for doc_id, text, _ in docs:
        toks = text.lower().split()
        chunks[doc_id] = [" ".join(toks[i:i + k])
                          for i in range(0, len(toks), k)]
    first = {}
    for doc_id in sorted(chunks):
        for cidx, c in enumerate(chunks[doc_id]):
            first.setdefault(c, (doc_id, cidx))
    out = {}
    for doc_id, cs in chunks.items():
        kept = [c for i, c in enumerate(cs) if first[c] == (doc_id, i)]
        cleaned = " ".join(kept)
        out[doc_id] = {
            "n_chunks": len(cs),
            "removed_chunks": len(cs) - len(kept),
            "kept_tokens": sum(len(c.split()) for c in kept),
            "cleaned_md5": hashlib.md5(cleaned.encode()).hexdigest(),
        }
    return out


def test_line_dedup_keep_first_rewrite(spark, tmp_path):
    import duckdb as ddb
    d = str(tmp_path)
    spark.createDataFrame(
        LDOCS, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: {k: v for k, v in r.asDict().items()
                         if k != "doc_id"}
           for r in line_dedup(spark, d).collect()}
    want = _line_ref(LDOCS)
    assert got == want
    # the hand-derivable pins, explicit:
    assert got[1]["removed_chunks"] == 1 and got[1]["kept_tokens"] == 3
    assert got[2]["removed_chunks"] == 1 and got[2]["kept_tokens"] == 6
    assert got[3]["kept_tokens"] == 0      # fully boilerplate doc
    import hashlib
    assert got[3]["cleaned_md5"] == hashlib.md5(b"").hexdigest()
    assert got[4]["n_chunks"] == 1         # ragged tail is a real line
    # oracle parity on the same crafted corpus
    con = ddb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    oracle = con.execute(LINE_DEDUP_SQL).df()
    assert {(r["doc_id"], r["n_chunks"], r["removed_chunks"],
             r["kept_tokens"], r["cleaned_md5"])
            for _, r in oracle.iterrows()} == \
           {(k, v["n_chunks"], v["removed_chunks"], v["kept_tokens"],
             v["cleaned_md5"]) for k, v in want.items()}


def test_line_dedup_idempotent_on_clean_corpus(spark, tmp_path):
    """A corpus with no repeated chunks rewrites to itself: zero removals
    and cleaned_md5 == md5 of the (lower/trimmed, space-joined) source."""
    import duckdb as ddb  # noqa: F401  (symmetry with the sibling test)
    import hashlib
    docs = [(i, " ".join(f"w{i}t{j}" for j in range(9)), "en")
            for i in range(6)]
    d = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r for r in line_dedup(spark, d).collect()}
    for i, text, _ in docs:
        assert got[i]["removed_chunks"] == 0
        assert got[i]["kept_tokens"] == 9
        assert got[i]["cleaned_md5"] == \
            hashlib.md5(text.encode()).hexdigest()


# --- repeated_substr (ExactSubstr-style span coverage) -------------------------

SDOCS = [
    # k=5 windows, every span hand-computable
    (0, "a b c d e f g h i j", "en"),     # shares "a b c d e" with doc 1
    (1, "z a b c d e y x w v u", "en"),   # the shared window at pos 1
    (2, "m m m m m m m m", "fr"),         # all 4 windows identical (self)
    (3, "q r s t", "fr"),                 # < k tokens -> absent
    (4, "n o p q r", "es"),               # one unique window -> zeros
]


def _substr_ref(docs, k=5):
    from collections import Counter
    wins = {}
    for doc_id, text, _ in docs:
        toks = text.lower().split()
        if len(toks) >= k:
            wins[doc_id] = [" ".join(toks[i:i + k])
                            for i in range(len(toks) - k + 1)]
    cnt = Counter(w for ws in wins.values() for w in ws)
    out = {}
    for doc_id, ws in wins.items():
        n = len(docs[doc_id][1].split())
        ps = [i for i, w in enumerate(ws) if cnt[w] >= 2]
        covered = spans = 0
        if ps:
            spans = 1 + sum(1 for a, b in zip(ps, ps[1:]) if b - a > k)
            covered = sum(min(k, b - a) for a, b in zip(ps, ps[1:])) + k
        frac = round(covered / n, 6)
        out[doc_id] = {"n_tokens": n, "n_windows": len(ws),
                       "n_repeated": len(ps), "n_spans": spans,
                       "covered_tokens": covered, "covered_frac": frac,
                       "flagged": int(frac >= 0.2)}
    return out


def test_repeated_substr_hand_pins(spark, tmp_path):
    import duckdb as ddb
    d = str(tmp_path)
    spark.createDataFrame(
        SDOCS, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: {k: v for k, v in r.asDict().items()
                         if k != "doc_id"}
           for r in repeated_substr(spark, d).collect()}
    want = _substr_ref(SDOCS)
    assert got == want
    assert 3 not in got                       # sub-k doc absent
    # cross-doc repeat covers exactly one window's span on each side
    assert got[0]["covered_tokens"] == 5 and got[0]["flagged"] == 1
    assert got[1]["covered_frac"] == pytest.approx(round(5 / 11, 6))
    # a fully self-repetitive doc is fully covered by ONE merged span
    assert got[2]["n_repeated"] == 4
    assert got[2]["n_spans"] == 1
    assert got[2]["covered_frac"] == 1.0
    # unique windows -> untouched
    assert got[4] == {"n_tokens": 5, "n_windows": 1, "n_repeated": 0,
                      "n_spans": 0, "covered_tokens": 0,
                      "covered_frac": 0.0, "flagged": 0}
    con = ddb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    oracle = con.execute(REPEATED_SUBSTR_SQL).df()
    assert {(r["doc_id"], r["n_repeated"], r["n_spans"],
             r["covered_tokens"], r["flagged"])
            for _, r in oracle.iterrows()} == \
           {(i, v["n_repeated"], v["n_spans"], v["covered_tokens"],
             v["flagged"]) for i, v in want.items()}


def test_repeated_substr_span_merge_gap_boundary(spark, tmp_path):
    """Positions k apart merge (adjacent spans), k+1 apart split: the
    interval arithmetic's boundary case, pinned on a crafted pair."""
    k = 5
    # doc 0 plants "c0..c4" at positions 0 and 5 (gap == k -> ONE span of
    # 10) and doc 1 plants it at 0 and 6 (gap k+1 -> TWO spans, 10 tokens
    # covered either way); doc 2 donates the second occurrence of each
    # window text so both planted docs repeat.
    c = "c0 c1 c2 c3 c4"
    docs = [
        (0, f"{c} {c} x0 x1 x2", "en"),
        (1, f"{c} y9 {c} y0 y1", "en"),
        (2, f"{c} z0 z1 z2 z3 z4 z5 z6 {c}", "fr"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r for r in repeated_substr(spark, d).collect()}
    assert got[0]["n_spans"] == 1 and got[0]["covered_tokens"] == 10
    assert got[1]["n_spans"] == 2 and got[1]["covered_tokens"] == 10
