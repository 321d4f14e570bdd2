"""Semantic pins for BPE vocabulary induction (ops/bpe.py): three-way
parity (Spark ≡ DuckDB oracle ≡ a faithful pure-Python Sennrich 2016
implementation with get_stats-style overlapping pair counts and greedy
leftmost non-overlapping merges), the overlap semantics the double-space
encoding exists for, the deterministic tiebreak, and exhaustion when the
vocabulary runs out of pairs.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from readability_spark.ops.bpe import BPE_MERGES_SQL, bpe_merges


def _bpe_ref(docs, rounds=8):
    """Classic BPE trainer (Sennrich et al. 2016 reference semantics)."""
    wc = Counter(w for _, t, _ in docs for w in t.lower().split())
    vocab = {tuple(w): c for w, c in wc.items()}
    merges = []
    for r in range(1, rounds + 1):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        # the operator's tiebreak is (count DESC, "A  B" string ASC);
        # for space-free symbols that equals tuple order
        (a, b), c = min(stats.items(),
                        key=lambda kv: (-kv[1], f"{kv[0][0]}  {kv[0][1]}"))
        merges.append((r, f"{a} {b}", a + b, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = cnt
        vocab = new_vocab
    return merges


DOCS = [
    (0, "low lower lowest low low", "en"),
    (1, "new newer newest new", "en"),
    (2, "wide wider widest", "en"),
    (3, "abab abab aaa", "en"),      # overlapping-pair + repeat-run pins
    (4, "low new wide lower", "en"),
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


def test_bpe_three_way(spark, corpus):
    d, con = corpus
    got = [tuple(r) for r in bpe_merges(spark, d).collect()]
    want = _bpe_ref(DOCS)
    assert got == want
    oracle = [tuple(r) for r in con.execute(BPE_MERGES_SQL).fetchall()]
    assert oracle == want
    # and the learned merges are the linguistically obvious ones
    assert got[0][1:3] == ("l o", "lo") and got[1][1:3] == ("lo w", "low")


def test_bpe_overlap_semantics(spark, tmp_path):
    # "abab": after merging (a, b), classic BPE yields [ab, ab] — BOTH
    # occurrences merge (they share no symbol, only the encoding's
    # separator).  "aaa" merging (a, a) yields [aa, a] — symbol-sharing
    # occurrences do NOT double-merge.  Round 2's counts expose both:
    # vocab {abab: 2, aaa: 1} → after r1 merges (a,b) c=4 →
    # {ab ab: 2, aa a?...}; assert against the python reference, then
    # pin the exact expected tables.
    docs = [(0, "abab abab aaa", "en")]
    want = _bpe_ref(docs, rounds=3)
    # r1: (a,b) appears 2x per "abab" (wc 2) → 4; beats (b,a) 2 and (a,a) 2
    assert want[0] == (1, "a b", "ab", 4)
    # r2: words are now [ab,ab]x2 and [aa?] — (a,a) merged leftmost only:
    # "aaa" → [aa, a]; pairs: (ab,ab) 2 vs (a,a) 2 → tie → "a  a" < "ab  ab"
    assert want[1] == (2, "a a", "aa", 2)
    # r3: (aa,a) 1 vs (ab,ab) 2 → (ab,ab)
    assert want[2] == (3, "ab ab", "abab", 2)
    d = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = [tuple(r) for r in bpe_merges(spark, d, rounds=3).collect()]
    assert got == want


def test_bpe_exhaustion_is_mirrored(spark, tmp_path):
    # single-character words have no pairs: round 1 finds no argmax, the
    # loop stops, and BOTH engines return zero merge rows rather than
    # erroring or padding — while ENCODE still returns every document at
    # its (trivial) segmentation instead of collapsing to zero rows
    # (the r6 ADVICE finding: the empty-argmax crossJoin used to empty
    # the word table)
    from readability_spark.ops.bpe import BPE_ENCODE_SQL, bpe_encode

    docs = [(0, "a b c a b", "en")]
    d = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    assert bpe_merges(spark, d).collect() == []
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    assert con.execute(BPE_MERGES_SQL).fetchall() == []
    assert _bpe_ref(docs) == []
    # encode under zero merges: each word is its characters
    enc = bpe_encode(spark, d).collect()
    assert [tuple(r) for r in enc] == [(0, 5, 5, 5, 1.0)]
    assert ([tuple(r) for r in con.execute(BPE_ENCODE_SQL).fetchall()]
            == [(0, 5, 5, 5, 1.0)])


def test_bpe_mid_training_exhaustion_encode(spark, tmp_path):
    # merges exhaust BETWEEN round 1 and `rounds`: "ab ab" learns (a, b)
    # in round 1, then every word is a single symbol — rounds 2..8 find
    # no pairs.  Both engines must keep the round-1 segmentation through
    # the remaining rounds (Spark: loop break; oracle: the NOT EXISTS
    # passthrough leg), so encode sees 2 words → 2 subwords → 4 chars.
    from readability_spark.ops.bpe import BPE_ENCODE_SQL, bpe_encode

    docs = [(0, "ab ab", "en")]
    d = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = [tuple(r) for r in bpe_merges(spark, d).collect()]
    assert got == [(1, "a b", "ab", 2)] == _bpe_ref(docs)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    assert [tuple(r) for r in con.execute(BPE_MERGES_SQL).fetchall()] == got
    want_enc = [(0, 2, 2, 4, 2.0)]
    assert [tuple(r) for r in bpe_encode(spark, d).collect()] == want_enc
    assert ([tuple(r) for r in con.execute(BPE_ENCODE_SQL).fetchall()]
            == want_enc)


def test_bpe_merge_encoding_replace_is_greedy():
    # the engine-shared primitive the operator rides: one replace() pass
    # over the double-space encoding implements greedy leftmost
    # non-overlapping merging (verified identical in Spark/DuckDB SQL by
    # the parity tests; python str.replace is the documented third)
    ws = "  a  b  a  b  a  b  "
    assert ws.replace(" a  b ", " ab ") == "  ab  ab  ab  "
    assert "  a  a  a  ".replace(" a  a ", " aa ") == "  aa  a  "


# --- bpe_encode (tokenize under the learned vocab) -----------------------------


def _encode_ref(docs, rounds=8):
    """Apply the reference trainer's merges in order, then count."""
    merges = _bpe_ref(docs, rounds)
    out = {}
    for doc_id, text, _ in docs:
        toks = text.lower().split()
        if not toks:
            continue
        n_sub = 0
        for w in toks:
            syms = list(w)
            for _, pair, merged, _ in merges:
                a, b = pair.split(" ")
                res, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == a
                            and syms[i + 1] == b):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            n_sub += len(syms)
        n_chars = sum(len(w) for w in toks)
        out[doc_id] = {
            "n_words": len(toks), "n_subwords": n_sub, "n_chars": n_chars,
            "chars_per_subword": round(n_chars / n_sub, 6)}
    return out


def test_bpe_encode_three_way(spark, corpus):
    from readability_spark.ops.bpe import BPE_ENCODE_SQL, bpe_encode
    d, con = corpus
    got = {r["doc_id"]: r.asDict() for r in bpe_encode(spark, d).collect()}
    want = _encode_ref(DOCS)
    assert set(got) == set(want)
    for doc_id, exp in want.items():
        for k, v in exp.items():
            assert got[doc_id][k] == pytest.approx(v), (doc_id, k)
    oracle = con.execute(BPE_ENCODE_SQL).df()
    assert len(oracle) == len(want)
    for _, row in oracle.iterrows():
        exp = want[row["doc_id"]]
        for k in exp:
            assert row[k] == pytest.approx(exp[k]), (row["doc_id"], k)


def test_bpe_encode_compresses(spark, corpus):
    # the point of the vocabulary: subword count sits strictly between
    # word count (perfect fusion) and char count (no fusion), and the
    # merges actually bought compression on the words they cover
    from readability_spark.ops.bpe import bpe_encode
    d, _ = corpus
    got = {r["doc_id"]: r for r in bpe_encode(spark, d).collect()}
    for doc_id, r in got.items():
        assert r["n_words"] <= r["n_subwords"] <= r["n_chars"], doc_id
    # doc 0 is all low/lower/lowest — the first two merges collapse
    # every "low" prefix: 20 chars in 10 subwords
    assert (got[0]["n_subwords"], got[0]["n_chars"]) == (10, 20)


def test_bpe_fuzz_oracle_vs_reference():
    # randomized cross-check of the full semantic chain — tokenization,
    # overlapping pair counts, (count DESC, pair ASC) tiebreak, and the
    # double-space replace encoding — DuckDB oracle vs the pure-Python
    # Sennrich trainer, over adversarially small alphabets (dense ties,
    # long same-symbol runs).  Spark parity is covered by the fixture
    # tests; this guards the oracle builder across input shapes.
    import random

    from readability_spark.ops.bpe import _bpe_sql

    sql = _bpe_sql(4)
    for trial in range(12):
        rng = random.Random(trial)
        docs = [
            (i, " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 8))), "en")
            for i in range(rng.randint(1, 6))]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
            "lang VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?,?,?)", docs)
        got = [tuple(r) for r in con.execute(sql).fetchall()]
        assert got == _bpe_ref(docs, rounds=4), (trial, docs)
