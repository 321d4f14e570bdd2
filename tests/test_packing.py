"""Semantic pins for training-sequence packing (ops/packing.py):
three-way parity (Spark ≡ DuckDB oracle ≡ pure-Python prefix-sum
reference) on a crafted multi-language corpus, plus the layout invariants
the concat-and-chop scheme guarantees (contiguity, boundary straddling,
empty-doc exclusion)."""

from __future__ import annotations

import duckdb
import pytest

from readability_spark.ops.packing import (
    PACK_SEQUENCES_SQL,
    _pack_sql,
    pack_sequences,
)

# Two language streams; doc 5 is empty (excluded); token counts chosen so
# that with seq_len=8 the "en" stream hits a boundary exactly (4+4), a
# straddle (6 tokens starting at offset 8+... ), and a multi-sequence
# whale (20 tokens spanning 3+ sequences).
DOCS = [
    (0, "a b c d", "en"),                        # en: [0,4)
    (1, "e f g h", "en"),                        # en: [4,8) exact boundary
    (2, "i j k l m n", "en"),                    # en: [8,14)
    (3, " ".join(f"t{i}" for i in range(20)), "en"),  # en: [14,34) whale
    (4, "uno dos tres", "es"),                   # es: [0,3)
    (5, "   ", "es"),                            # empty → excluded
    (6, "cuatro cinco seis siete ocho nueve", "es"),  # es: [3,9) straddle
]
SEQ_LEN = 8


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


def _ref_pack(seq_len):
    out = []
    by_lang = {}
    for doc_id, text, lang in DOCS:
        n = len(text.split())
        if n == 0:
            continue
        by_lang.setdefault(lang, []).append((doc_id, n))
    for lang in sorted(by_lang):
        off = 0
        for doc_id, n in sorted(by_lang[lang]):
            out.append({
                "lang": lang, "doc_id": doc_id, "n_tokens": n,
                "start_offset": off,
                "seq_id": off // seq_len,
                "pos_in_seq": off % seq_len,
                "n_seqs_spanned":
                    (off + n - 1) // seq_len - off // seq_len + 1,
            })
            off += n
    return out


def test_pack_three_way_parity(spark, corpus):
    d, con = corpus
    ref = _ref_pack(SEQ_LEN)
    rows = [r.asDict() for r in
            pack_sequences(spark, d, seq_len=SEQ_LEN).collect()]
    assert sorted(rows, key=lambda r: (r["lang"], r["doc_id"])) == ref
    duck = con.execute(_pack_sql(SEQ_LEN)).df().to_dict("records")
    assert rows == duck


def test_pack_layout_pins(spark, corpus):
    d, _ = corpus
    rows = {r["doc_id"]: r.asDict() for r in
            pack_sequences(spark, d, seq_len=SEQ_LEN).collect()}
    assert 5 not in rows                       # empty doc excluded
    # exact-boundary doc: starts at 4, next doc starts in sequence 1 at 0
    assert (rows[2]["seq_id"], rows[2]["pos_in_seq"]) == (1, 0)
    # whale spans sequences 1..4 → 4 sequences (offsets 14..33, len 8)
    assert rows[3]["n_seqs_spanned"] == 4
    # streams are independent: es restarts at offset 0
    assert rows[4]["start_offset"] == 0
    # es straddle: 6 tokens at offset 3 cross the len-8 boundary
    assert (rows[6]["start_offset"], rows[6]["n_seqs_spanned"]) == (3, 2)


def test_pack_contiguity_invariant(spark, corpus):
    d, _ = corpus
    rows = pack_sequences(spark, d, seq_len=SEQ_LEN).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        off = 0
        for r in sorted(rs, key=lambda r: r["doc_id"]):
            assert r["start_offset"] == off        # no gaps, no overlap
            assert r["seq_id"] == off // SEQ_LEN
            assert r["n_seqs_spanned"] >= 1
            off += r["n_tokens"]


def test_pack_default_len_gate_shape(spark, corpus):
    d, con = corpus
    rows = pack_sequences(spark, d).collect()   # default 256: all seq 0
    assert all(r["seq_id"] == 0 and r["n_seqs_spanned"] == 1 for r in rows)
    duck = con.execute(PACK_SEQUENCES_SQL).fetchall()
    assert [tuple(r) for r in rows] == duck
