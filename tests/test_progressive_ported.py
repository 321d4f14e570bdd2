"""Ported: /root/reference/src/cli-progressive.test.ts (the progressive
CLI analysis modes), against readability_core.progressive.

The reference drives cli.js as a subprocess; here each mode is a library
function and ``progressive_dispatch`` reproduces the printed string.
"""

from __future__ import annotations

import json

import pytest

from readability_core.progressive import (
    ai_structured,
    ai_summary,
    analyze_structure,
    doc_mode,
    extract_content,
    extract_nav,
    full_analysis,
    progressive_dispatch,
)

URL = "test-progressive.html"

# cli-progressive.test.ts:16-80 — verbatim test page
TEST_HTML = """
      <!DOCTYPE html>
      <html>
        <head>
          <title>Test Article</title>
        </head>
        <body>
          <header>
            <nav class="main-nav">
              <a href="/">Home</a>
              <a href="/about">About</a>
              <a href="/blog">Blog</a>
            </nav>
          </header>

          <nav class="breadcrumb">
            <a href="/">Home</a>
            <span>></span>
            <a href="/blog">Blog</a>
            <span>></span>
            <span>Test Article</span>
          </nav>

          <main>
            <article>
              <h1>Test Article Title</h1>
              <p>This is the introduction paragraph with enough content to ensure proper extraction.
                 We need to have sufficient text to pass the character threshold that the readability
                 algorithm uses to determine if content is worth extracting. This helps ensure that
                 our test cases work properly with the default settings.</p>

              <nav class="toc">
                <h2>Table of Contents</h2>
                <ul>
                  <li><a href="#section1">Section 1</a></li>
                  <li><a href="#section2">Section 2</a></li>
                </ul>
              </nav>

              <h2 id="section1">Section 1</h2>
              <p>Content of section 1 with additional text to ensure we have enough content.
                 This paragraph contains multiple sentences to help reach the character threshold
                 required for extraction. We want to make sure the content is substantial enough
                 to be considered meaningful by the extraction algorithm.</p>

              <h2 id="section2">Section 2</h2>
              <p>Content of section 2 also needs to be longer to contribute to the overall
                 character count. This ensures that our test content is realistic and will
                 be properly extracted by the readability algorithm. Having multiple paragraphs
                 with substantial content helps test the full functionality.</p>
            </article>
          </main>

          <aside class="sidebar">
            <h3>Related Articles</h3>
            <ul>
              <li><a href="/article1">Article 1</a></li>
              <li><a href="/article2">Article 2</a></li>
            </ul>
          </aside>

          <footer>
            <p>&copy; 2024 Test Site</p>
          </footer>
        </body>
      </html>
"""


class TestStructureAnalysis:
    def test_analyze_structure_without_content(self):
        a = analyze_structure(TEST_HTML, URL)
        assert a["url"] == URL
        assert a["pageType"] == "article"
        assert a["hasMainContent"] is True
        assert a["navigations"]["global"] is True
        assert a["navigations"]["breadcrumb"] is True
        assert a["navigations"]["toc"] is True
        assert a["navigations"]["sidebar"] is False
        assert a["contentAreas"]["header"] is True
        assert a["contentAreas"]["mainContent"] is True
        assert a["contentAreas"]["sidebar"] is True
        assert a["contentAreas"]["footer"] is True
        assert a["stats"]["navigationCount"] > 2
        assert a["stats"]["headerCount"] > 0


class TestNavigationExtraction:
    def test_extract_nav(self):
        r = extract_nav(TEST_HTML, URL)
        assert r["url"] == URL
        assert len(r["navigations"]) > 2
        nav_types = [n["type"] for n in r["navigations"]]
        assert "global" in nav_types
        assert "breadcrumb" in nav_types
        assert "toc" in nav_types

    def test_nav_only_backward_compat(self):
        nav_only = json.loads(
            progressive_dispatch(TEST_HTML, URL, nav_only=True))
        extract = json.loads(
            progressive_dispatch(TEST_HTML, URL, extract_nav=True))
        assert len(nav_only["navigations"]) == len(extract["navigations"])

    def test_nav_type_filter(self):
        r = extract_nav(TEST_HTML, URL, nav_type="breadcrumb")
        assert all(n["type"] == "breadcrumb" for n in r["navigations"])
        assert r["summary"]["total"] == len(r["navigations"])


class TestContentExtractionWithContext:
    def test_with_context(self):
        r = extract_content(TEST_HTML, URL, with_context=True)
        assert r["url"] == URL
        assert "Test Article" in r["title"]
        assert "Test Article Title" in r["content"]
        assert "Home" in r["context"]["breadcrumb"]
        assert "Blog" in r["context"]["breadcrumb"]
        assert r["context"]["section"] == "main"
        assert len(r["context"]["surroundingNavigation"]) > 0

    def test_plain_content_without_context(self):
        out = extract_content(TEST_HTML, URL)
        assert isinstance(out, str)
        with pytest.raises(json.JSONDecodeError):
            json.loads(out)
        assert "Test Article Title" in out
        assert "Section 1" in out


class TestFullAnalysis:
    def test_full_analysis(self):
        r = full_analysis(TEST_HTML, URL)
        assert r["url"] == URL
        assert r["structure"]["pageType"] == "article"
        assert isinstance(r["structure"]["navigations"], list)
        assert isinstance(r["structure"]["headers"], list)
        assert r["structure"]["contentAreas"]["main"] is True
        assert "navigation" in r
        assert "breadcrumb" in r["navigation"]
        assert "tableOfContents" in r["navigation"]
        assert "Test Article Title" in r["content"]["main"]
        assert "Test Article" in r["metadata"]["title"]


class TestAiOptimizedFormats:
    def test_ai_summary(self):
        r = ai_summary(TEST_HTML, URL)
        assert r["url"] == URL
        assert r["type"] in ("article", "other", "documentation")
        assert "Test Article" in r["title"]
        assert len(r["summary"]) < 250
        assert "Home" in r["navigationSummary"]["breadcrumb"]
        assert r["navigationSummary"]["hasTableOfContents"] is True
        assert r["navigationSummary"]["hasSidebar"] is True
        assert r["contentStats"]["wordCount"] > 0
        assert r["contentStats"]["hasCode"] is False
        # structure.sections quirk: always empty / zero
        assert r["mainTopics"] == []
        assert r["navigationSummary"]["sections"] == 0

    def test_ai_summary_word_count_uses_js_whitespace(self):
        """JS /\\s+/ includes U+FEFF but NOT \\x1c-\\x1f; Python's re \\s is
        the opposite.  wordCount must follow the JS set (cli.js:349).

        The fixture is deliberately ASYMMETRIC — two U+FEFF joins vs one
        \\x1c split — so the exact count detects a revert to Python \\s:
        JS sees alpha|beta|gamma (3) + delta\\x1cepsilon (1); Python \\s
        would see alpha﻿beta﻿gamma (1) + delta|epsilon (2), one word
        fewer.  (A 1-FEFF/1-\\x1c fixture cancels out and pins nothing.)"""
        html = ("<html><body><article><h1>T</h1>"
                + "<p>alpha﻿beta﻿gamma delta\x1cepsilon</p>"
                + "<p>" + "word " * 120 + "</p>"
                "</article></body></html>")
        r = ai_summary(html, URL)
        assert r["summary"]  # sanity: extraction happened
        import re as _re
        from readability_core.progressive import JS_WS
        # direct contract on the splitter class
        assert _re.split(f"[{JS_WS}]+", "a﻿b") == ["a", "b"]
        assert _re.split(f"[{JS_WS}]+", "a\x1cb") == ["a\x1cb"]
        # '#'+title (2) + 4 content words + 120 'word' = 126 JS-split
        # fields over the markdown; the Python-\s revert yields 125
        assert r["contentStats"]["wordCount"] == 126

    def test_ai_structured(self):
        r = ai_structured(TEST_HTML, URL)
        # metadata spread quirk: extractor's about:blank wins over CLI url
        assert r["metadata"]["url"] == "about:blank"
        types = r["structure"]["navigation"]["types"]
        assert "global" in types
        assert "breadcrumb" in types
        assert "toc" in types
        assert r["structure"]["content"]["main"]["present"] is True
        assert "Test Article Title" in (
            r["structure"]["content"]["main"]["markdown"])
        assert r["structure"]["content"]["sections"] == []
        assert r["structure"]["sidebar"]["present"] is True
        assert r["structure"]["sidebar"]["navigation"] == 0


class TestCreateExtractor:
    """extract.ts:866-890 — pluggable-parser extractor factory."""

    def test_default_matches_extract(self):
        from readability_core import create_extractor, extract
        ex = create_extractor()
        assert ex(TEST_HTML) == extract(TEST_HTML)

    def test_custom_parser_is_used(self):
        from readability_core import create_extractor
        from readability_core.vdom import parse_html
        calls = []

        def counting_parser(html, base_uri="about:blank"):
            calls.append(base_uri)
            return parse_html(html, base_uri)

        ex = create_extractor(parser=counting_parser)
        r = ex(TEST_HTML)
        assert calls == ["about:blank"]
        assert r["page_type"] == "article"

    def test_forced_page_type_default_and_override(self):
        from readability_core import create_extractor, extract
        # factory default forces OTHER → no root, empty extraction
        ex = create_extractor(forced_page_type="other")
        r = ex(TEST_HTML)
        assert r["page_type"] == "other"
        assert r["extracted_text"] == ""
        # per-call override beats the factory default (extract.ts:886-887)
        r2 = ex(TEST_HTML, forced_page_type_call="article")
        assert r2["page_type"] == "article"
        assert "Test Article Title" in r2["extracted_text"]
        # forcing article on an article page equals the classifier's output
        assert r2["extracted_text"] == extract(TEST_HTML)["extracted_text"]

    def test_generate_aria_tree_default(self):
        from readability_core import create_extractor
        ex = create_extractor(generate_aria_tree=False)
        assert ex(TEST_HTML)["aria_tree"] == ""
        assert ex(TEST_HTML, build_aria=True)["aria_tree"] != ""


class TestDefaultBehavior:
    def test_default_markdown(self):
        out = progressive_dispatch(TEST_HTML, URL)
        assert "Test Article Title" in out
        assert "Section 1" in out
        assert "Section 2" in out
        assert "main-nav" not in out
        assert "breadcrumb" not in out

    def test_legacy_format_options(self):
        html_out = progressive_dispatch(TEST_HTML, URL, fmt="html")
        assert "<h1>Test Article Title</h1>" in html_out
        doc_out = progressive_dispatch(TEST_HTML, URL, doc_mode=True)
        assert "# Document Content" in doc_out
        assert "## Main Content" in doc_out
        assert doc_out == doc_mode(TEST_HTML)
