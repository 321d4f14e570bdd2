"""PDF text extraction (readability_core.pdftext) — the PDF leg of the
extraction tier: generator/extractor round trip, spec escapes, degradation
on unsupported constructs, and the Spark mapInPandas plumbing.
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from readability_core.pdftext import extract_pdf_text, make_simple_pdf


class TestRoundTrip:
    def test_basic(self):
        texts = ["Hello world\nSecond line", "one"]
        assert extract_pdf_text(make_simple_pdf(texts)) == "\n".join(texts)

    def test_special_chars_and_unicode(self):
        texts = ["Parens (x) and \\ backslash",
                 "ünïcødé 日本語 🙂", "tabs\tkept", "", "trailing\n"]
        assert extract_pdf_text(make_simple_pdf(texts)) == "\n".join(texts)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=120), min_size=1, max_size=4))
    def test_property_roundtrip(self, texts):
        # \r is the one newline-class byte PDF writers normalize; our
        # generator emits it verbatim inside hex strings, so it survives
        assert extract_pdf_text(make_simple_pdf(texts)) == "\n".join(texts)


class TestSpecPaths:
    def test_literal_string_escapes(self):
        body = b"BT (A \\(b\\) \\\\ \\101\\12end) Tj ET"
        pdf = b"%PDF-1.4\n1 0 obj << /Length 1 >> stream\n" + body + \
            b"\nendstream endobj"
        assert extract_pdf_text(pdf) == "A (b) \\ A\nend"

    def test_tj_array_and_hex(self):
        body = b"BT [(He) -120 (llo) <2120>] TJ ET"
        pdf = b"%PDF-1.4\n1 0 obj << /Length 1 >> stream\n" + body + \
            b"\nendstream endobj"
        assert extract_pdf_text(pdf) == "Hello! "

    def test_flate_stream(self):
        content = zlib.compress(b"BT (deflated) Tj ET")
        pdf = (b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode >> stream\n"
               + content + b"\nendstream endobj")
        assert extract_pdf_text(pdf) == "deflated"

    def test_stray_backslash_before_non_octal_digit(self):
        # \8 and \9 are NOT octal escapes — the backslash is stray and
        # dropped per spec (this crashed with int(_, 8) before the fix)
        pdf = (b"%PDF-1.4\n1 0 obj << /Length 1 >> stream\n"
               b"BT (a\\8b \\9 \\778) Tj ET\nendstream endobj")
        assert extract_pdf_text(pdf) == "a8b 9 \x3f8"  # \77 = '?', then '8'

    @pytest.mark.parametrize("ref", [b"5 0 R", b"12 0 R", b"1234 0 R"])
    def test_indirect_length_falls_back_to_eol_strip(self, ref):
        # `/Length N 0 R` is an indirect reference: slicing to N (or to a
        # backtracked digit PREFIX of N) would kill the stream; the
        # single-EOL-strip fallback decodes it
        content = zlib.compress(b"BT (indirect) Tj ET")
        pdf = (b"%PDF-1.4\n1 0 obj << /Length " + ref +
               b" /Filter /FlateDecode >> stream\n" + content +
               b"\nendstream endobj")
        assert extract_pdf_text(pdf) == "indirect"

    def test_degrades_silently(self):
        assert extract_pdf_text(b"not a pdf") == ""
        assert extract_pdf_text(b"") == ""
        assert extract_pdf_text(None) == ""
        # corrupt flate stream: skipped, not crashed
        pdf = (b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode >> stream\n"
               b"\x00garbage\nendstream endobj")
        assert extract_pdf_text(pdf) == ""


class TestSparkPlumbing:
    def test_pdf_extract_round_trips_documents(self, spark):
        from readability_spark.ops.pdfsource import pdf_extract

        sf = "/root/testdata/sf0.001"
        got = pdf_extract(spark, sf).collect()
        want = (spark.read.parquet(f"{sf}/documents.parquet")
                .select("doc_id", "text").orderBy("doc_id").collect())
        assert [(r["doc_id"], r["text"]) for r in got] == \
            [(r["doc_id"], r["text"]) for r in want]
