"""Semantic pins for the corpus-curation operators (ops/curation.py):
three-way parity (Spark ≡ DuckDB oracle ≡ pure-Python `re`/set reference)
on a crafted corpus with natural in-text PII, multi-hit and zero-hit
augmentation rows, fully/partially/un-contaminated candidates, and a
sub-n-token drop — plus hand-computed pins for each edge.

The Python `re` module is a valid third engine for these patterns by the
module's own discipline: no backslash classes, no lookaround, greedy
leftmost matching — semantics on which Python re, Java regex, and RE2
agree.
"""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest

from readability_spark.ops.curation import (
    DECON_FLAG_FRAC,
    DECON_N,
    DECONTAMINATE_SQL,
    DSIR_SELECT_SQL,
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    PII_REDACT_SQL,
    decontaminate,
    dsir_select,
    pii_redact,
)

# doc_ids 4 and 5 fall in the md5('bench|id') benchmark quarter; 0-3, 6, 7
# are candidates (6 is dropped: < DECON_N tokens).  Lowercase single-space
# text so the pure-Python split()/lower() reference matches tokens_col.
DOCS = [
    (0, "alpha beta gamma zeta eta", "en"),          # 1/3 grams contaminated
    (1, "one two three four ann@site.org here", "en"),   # natural email
    (2, "x red green blue y", "en"),                 # mid-doc bench gram
    (3, "alpha beta gamma delta epsilon", "fr"),     # verbatim bench copy
    (4, "alpha beta gamma delta epsilon", "en"),     # BENCH
    (5, "red green blue", "es"),                     # BENCH
    (6, "tiny doc", "en"),                           # < 3 tokens → dropped
    (7, "beta gamma delta 10.0.0.1 ok", "en"),       # natural IP literal
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


# --- PII ---------------------------------------------------------------------

def _pii_ref(doc_id, text):
    aug = text
    if doc_id % 2 == 0:
        aug += f" reach user{doc_id}@example.com"
    if doc_id % 3 == 0:
        aug += f" from 10.{doc_id % 256}.{doc_id * 7 % 256}.{doc_id * 13 % 256}"
    if doc_id % 5 == 0:
        aug += f" call 415-555-{doc_id % 10000:04d}"
    ne = len(re.findall(PII_EMAIL, aug))
    ni = len(re.findall(PII_IPV4, aug))
    np_ = len(re.findall(PII_PHONE, aug))
    red = re.sub(PII_PHONE, "<PHONE>",
                 re.sub(PII_IPV4, "<IP>",
                        re.sub(PII_EMAIL, "<EMAIL>", aug)))
    return {
        "n_emails": ne, "n_ips": ni, "n_phones": np_,
        "pii_total": ne + ni + np_,
        "redacted_md5": hashlib.md5(red.encode()).hexdigest(),
    }


def test_pii_redact_three_way(spark, corpus):
    d, con = corpus
    got = {r["doc_id"]: r.asDict() for r in pii_redact(spark, d).collect()}
    want = {i: _pii_ref(i, t) for i, t, _ in DOCS}
    assert set(got) == set(want)
    for doc_id, exp in want.items():
        for k, v in exp.items():
            assert got[doc_id][k] == v, (doc_id, k)
    oracle = con.execute(PII_REDACT_SQL).df()
    assert len(oracle) == len(want)
    for _, row in oracle.iterrows():
        exp = want[row["doc_id"]]
        for k in exp:
            assert row[k] == exp[k], (row["doc_id"], k)


def test_pii_redact_hand_values(spark, corpus):
    d, _ = corpus
    got = {r["doc_id"]: r for r in pii_redact(spark, d).collect()}
    # doc 0: all three moduli fire → one of each
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_phones"]) == \
        (1, 1, 1)
    # doc 1: no modulus fires, but the text carries a natural email
    assert (got[1]["n_emails"], got[1]["pii_total"]) == (1, 1)
    # doc 7: no modulus fires; natural IPv4 literal in the text
    assert (got[7]["n_ips"], got[7]["n_emails"], got[7]["n_phones"]) == \
        (1, 0, 0)
    # doc 3: ip-only (%3) — and the redaction actually moved the hash
    assert (got[3]["n_ips"], got[3]["pii_total"]) == (1, 1)
    aug3 = "alpha beta gamma delta epsilon from 10.3.21.39"
    assert got[3]["redacted_md5"] == hashlib.md5(
        aug3.replace("10.3.21.39", "<IP>").encode()).hexdigest()
    # a clean doc's redacted hash is the hash of its (augment-free) text —
    # impossible here since every doc_id in DOCS trips a modulus or has
    # natural PII except none; doc 1's aug == text, redaction touches only
    # the natural email
    assert got[1]["redacted_md5"] == hashlib.md5(
        "one two three four <EMAIL> here".encode()).hexdigest()


def test_pii_patterns_do_not_cross_match():
    # the phone pattern must not fire inside any constructible IPv4 (octets
    # are 1-3 digits, phones need a 4-digit tail)
    for ip in ("10.123.224.208", "192.168.1.1", "10.0.0.0"):
        assert re.findall(PII_PHONE, ip) == []
        assert re.findall(PII_EMAIL, ip) == []
    # and the email pattern consumes its full address greedily
    assert re.findall(PII_EMAIL, "user12@example.com rest") == \
        ["user12@example.com"]


# --- decontamination ---------------------------------------------------------

def _is_bench(doc_id):
    return hashlib.md5(f"bench|{doc_id}".encode()).hexdigest()[0] in "0123"


def _decon_ref(docs, n=DECON_N):
    toks = {i: t.lower().split() for i, t, _ in docs}
    bench = set()
    for i, tk in toks.items():
        if _is_bench(i) and len(tk) >= n:
            bench |= {" ".join(tk[j:j + n]) for j in range(len(tk) - n + 1)}
    out = {}
    for i, tk in toks.items():
        if _is_bench(i) or len(tk) < n:
            continue
        grams = [" ".join(tk[j:j + n]) for j in range(len(tk) - n + 1)]
        c = sum(1 for g in grams if g in bench)
        frac = round(c / len(grams), 6)
        out[i] = {"n_grams": len(grams), "n_contaminated": c,
                  "contam_frac": frac,
                  "flagged": int(frac >= DECON_FLAG_FRAC)}
    return out


def test_decontaminate_three_way(spark, corpus):
    d, con = corpus
    got = {r["doc_id"]: r.asDict()
           for r in decontaminate(spark, d).collect()}
    want = _decon_ref(DOCS)
    assert set(got) == set(want)          # bench docs + doc 6 absent
    for doc_id, exp in want.items():
        for k, v in exp.items():
            assert got[doc_id][k] == pytest.approx(v), (doc_id, k)
    oracle = con.execute(DECONTAMINATE_SQL).df()
    assert len(oracle) == len(want)
    for _, row in oracle.iterrows():
        exp = want[row["doc_id"]]
        for k in exp:
            assert row[k] == pytest.approx(exp[k]), (row["doc_id"], k)


def test_decontaminate_hand_values(spark, corpus):
    d, _ = corpus
    assert _is_bench(4) and _is_bench(5)          # the fixture's premise
    assert not any(_is_bench(i) for i in (0, 1, 2, 3, 6, 7))
    got = {r["doc_id"]: r for r in decontaminate(spark, d).collect()}
    assert 4 not in got and 5 not in got and 6 not in got
    # doc 3 is a verbatim copy of bench doc 4 → fully contaminated
    assert (got[3]["n_grams"], got[3]["n_contaminated"]) == (3, 3)
    assert got[3]["contam_frac"] == 1.0 and got[3]["flagged"] == 1
    # doc 0 shares exactly its leading trigram with bench
    assert (got[0]["n_contaminated"], got[0]["n_grams"]) == (1, 3)
    assert got[0]["flagged"] == 1                  # 0.333 ≥ 0.2
    # doc 2's hit is mid-document (boundary positions matter)
    assert got[2]["n_contaminated"] == 1
    # doc 1 is clean → not flagged
    assert (got[1]["n_contaminated"], got[1]["flagged"]) == (0, 0)


# --- dsir_select (importance resampling, integer rank form) --------------------


def _dsir_ref(docs, B=64, SCALE=1_000_000, K=50):
    from collections import Counter

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    def is_target(i):
        return hashlib.md5(f"dsir|{i}".encode()).hexdigest()[0] in "0123"

    t_cnt, r_cnt, per_doc = Counter(), Counter(), {}
    for i, text, _ in docs:
        toks = text.lower().split()
        if not toks:
            continue
        c = Counter(bucket(t) for t in toks)
        per_doc[i] = (is_target(i), c)
        for b, n in c.items():
            (t_cnt if is_target(i) else r_cnt)[b] += n
    w = {b: ((t_cnt[b] + 1) * SCALE) // (r_cnt[b] + 1)
         for b in set(t_cnt) | set(r_cnt)}
    rows = []
    for i, (tgt, c) in sorted(per_doc.items()):
        if tgt:
            continue
        score = sum(n * w[b] for b, n in c.items())
        ntok = sum(c.values())
        rows.append((i, ntok, score, score // ntok))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [(rank + 1, *r) for rank, r in enumerate(rows[:K])]


def test_dsir_select_three_way_and_ordering(spark, tmp_path):
    """A candidate written in the target domain's vocabulary must outrank
    one written in vocabulary the targets never use (its buckets carry the
    +1-smoothed floor weights), and all three engines must agree exactly.
    """
    target_ids = [i for i in range(40)
                  if hashlib.md5(f"dsir|{i}".encode()).hexdigest()[0]
                  in "0123"]
    cand_ids = [i for i in range(40) if i not in target_ids][:6]
    assert len(target_ids) >= 3
    tvocab = "amber basalt cedar dune ember flint"
    docs = [(i, tvocab, "en") for i in target_ids[:3]]
    docs.append((cand_ids[0], tvocab, "en"))            # in-domain cand
    docs.append((cand_ids[1], "zzq1 zzq2 zzq3 zzq4 zzq5 zzq6", "en"))
    docs.append((cand_ids[2], "amber basalt zzq7 zzq8 zzq9 zzq10", "fr"))
    d = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = [tuple(r) for r in dsir_select(spark, d).collect()]
    want = _dsir_ref(docs)
    assert got == want
    rank = {r[1]: r[0] for r in got}
    # full in-domain < half in-domain < out-of-domain
    assert rank[cand_ids[0]] < rank[cand_ids[2]] < rank[cand_ids[1]]
    # target docs are never selected
    assert not set(rank) & set(target_ids)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    oracle = [tuple(r) for r in con.execute(DSIR_SELECT_SQL).fetchall()]
    assert oracle == want


# --- decontaminate_bloom (the 100 TB broadcast shape) --------------------------


def _bloom_positions(gram, M, K):
    h = hashlib.md5(gram.encode()).hexdigest()
    return [int(h[8 * j:8 * j + 8], 16) % M for j in range(K)]


def _bloom_ref(docs, n=DECON_N):
    from readability_spark.ops.curation import BLOOM_K, BLOOM_M
    toks = {i: t.lower().split() for i, t, _ in docs}
    bits = set()
    for i, tk in toks.items():
        if _is_bench(i) and len(tk) >= n:
            for j in range(len(tk) - n + 1):
                bits.update(_bloom_positions(
                    " ".join(tk[j:j + n]), BLOOM_M, BLOOM_K))
    out = {}
    for i, tk in toks.items():
        if _is_bench(i) or len(tk) < n:
            continue
        grams = [" ".join(tk[j:j + n]) for j in range(len(tk) - n + 1)]
        c = sum(1 for g in grams
                if all(p in bits
                       for p in _bloom_positions(g, BLOOM_M, BLOOM_K)))
        frac = round(c / len(grams), 6)
        out[i] = {"n_grams": len(grams), "n_maybe_contaminated": c,
                  "bloom_frac": frac,
                  "flagged": int(frac >= DECON_FLAG_FRAC)}
    return out


def test_decontaminate_bloom_three_way(spark, corpus):
    from readability_spark.ops.curation import (DECONTAMINATE_BLOOM_SQL,
                                                decontaminate_bloom)
    d, con = corpus
    got = {r["doc_id"]: r.asDict()
           for r in decontaminate_bloom(spark, d).collect()}
    want = _bloom_ref(DOCS)
    assert set(got) == set(want)
    for doc_id, exp in want.items():
        for k, v in exp.items():
            assert got[doc_id][k] == pytest.approx(v), (doc_id, k)
    oracle = con.execute(DECONTAMINATE_BLOOM_SQL).df()
    assert len(oracle) == len(want)
    for _, row in oracle.iterrows():
        exp = want[row["doc_id"]]
        for k in exp:
            assert row[k] == pytest.approx(exp[k]), (row["doc_id"], k)


def test_decontaminate_bloom_no_false_negatives(spark, corpus):
    # Bloom guarantee: every exactly-contaminated gram position probes k
    # set bits, so the maybe-count is a per-document superset of the exact
    # count (false positives allowed, false negatives impossible).
    from readability_spark.ops.curation import decontaminate_bloom
    d, _ = corpus
    exact = {r["doc_id"]: r["n_contaminated"]
             for r in decontaminate(spark, d).collect()}
    bloom = {r["doc_id"]: r["n_maybe_contaminated"]
             for r in decontaminate_bloom(spark, d).collect()}
    assert set(exact) == set(bloom)
    for doc_id in exact:
        assert bloom[doc_id] >= exact[doc_id], doc_id
    # the verbatim bench copy (doc 3) is fully flagged by the filter too
    assert bloom[3] == exact[3] == 3


def test_bloom_positions_are_disjoint_md5_slices():
    # the k positions come from non-overlapping 8-hex-digit windows of one
    # md5 — k md5 calls collapse to one per gram in both engines, and the
    # slices stay inside the 32-digit digest
    from readability_spark.ops.curation import BLOOM_K, BLOOM_M
    assert 8 * BLOOM_K <= 32
    assert BLOOM_M & (BLOOM_M - 1) == 0   # power of two keeps % cheap
    ps = _bloom_positions("alpha beta gamma", BLOOM_M, BLOOM_K)
    assert len(ps) == BLOOM_K and all(0 <= p < BLOOM_M for p in ps)
