"""Ported: /root/reference/src/detect/header.test.ts.

The upstream suite drives detectHeaders over buildAriaTree's COMPACT tree;
three of its expectations are unsatisfiable against the reference's own
shipped code and are documented (not silently skipped) here:

- "distinguishes between main and article headers" expects type
  "article", but determineHeaderType (header.ts:117-127) only ever
  returns "main" (depth ≤ 2) or "section" — "article" is unreachable
  (the TODO at header.ts:124 says so).
- "detects element with site-title class" / the banner siteTitle: a
  <span class="site-title">text</span> never reaches the aria tree —
  buildAriaNode's generic-with-text branch is dead code (readableAria.ts;
  see test_aria's quirk coverage), so detectSiteTitle sees no node.

Assertions below run against the same compact tree the upstream test
builds, with the unsatisfiable ones pinned to the behavior the shipped
reference code actually produces.
"""

from __future__ import annotations

from readability_core.aria import build_aria_tree
from readability_core.detect import detect_headers, detect_logo, detect_site_title
from readability_core.vdom import parse_html


def tree_root(html: str):
    return build_aria_tree(parse_html(f"<body>{html}</body>"))["root"]


class TestHeaderDetection:
    def test_detects_basic_header_element(self):
        html = """
      <header>
        <h1>My Website</h1>
        <nav>
          <a href="/">Home</a>
          <a href="/about">About</a>
        </nav>
      </header>
    """
        headers = detect_headers(tree_root(html))
        assert len(headers) == 1
        assert headers[0]["type"] == "main"
        assert headers[0]["contains"]["siteTitle"]["text"] == "My Website"
        assert len(headers[0]["contains"]["navigation"]) == 1

    def test_detects_header_with_banner_role(self):
        html = """
      <div role="banner">
        <img src="/logo.png" alt="Company Logo" />
        <span class="site-title">Example Corp</span>
      </div>
    """
        headers = detect_headers(tree_root(html))
        assert len(headers) == 1
        assert headers[0]["contains"]["logo"]["alt"] == "Company Logo"
        # upstream expects "Example Corp" — unreachable: the span never
        # enters the aria tree (dead generic-with-text branch)
        assert headers[0]["contains"].get("siteTitle") is None

    def test_main_vs_inner_header_types(self):
        html = """
        <header id="main-header">
          <h1>Blog Title</h1>
        </header>
        <article>
          <header>
            <h2>Article Title</h2>
          </header>
        </article>
    """
        headers = detect_headers(tree_root(html))
        assert len(headers) == 2
        # upstream expects ["main", "article"]; "article" is unreachable in
        # determineHeaderType (header.ts:117-127) — both sit at depth ≤ 2
        assert [h["type"] for h in headers] == ["main", "main"]
        assert headers[0]["depth"] < headers[1]["depth"]

    def test_detects_sticky_header(self):
        html = '<header class="sticky-header"><h1>Sticky Site</h1></header>'
        assert detect_headers(tree_root(html))[0]["isSticky"] is True

    def test_detects_search_form_in_header(self):
        html = """
      <header>
        <h1>Search Site</h1>
        <form role="search">
          <input type="search" placeholder="Search..." />
        </form>
      </header>
    """
        headers = detect_headers(tree_root(html))
        assert "search" in headers[0]["contains"]


class TestLogoDetection:
    def test_detects_image_logo(self):
        html = ('<img src="/images/logo.png" alt="Company Logo" '
                'class="site-logo" />')
        logo = detect_logo(tree_root(html))
        assert logo is not None
        assert logo["alt"] == "Company Logo"
        assert "logo.png" in logo["src"]

    def test_detects_text_based_logo(self):
        logo = detect_logo(tree_root('<div class="logo">ACME Corp</div>'))
        assert logo is not None
        assert logo["text"] == "ACME Corp"


class TestSiteTitleDetection:
    def test_detects_h1_as_site_title(self):
        title = detect_site_title(tree_root("<h1>My Awesome Blog</h1>"))
        assert title is not None
        assert title["text"] == "My Awesome Blog"
        assert title["level"] == 1

    def test_site_title_class_span_never_reaches_aria_tree(self):
        # upstream expects text "Corporate Website", level 0 — unreachable
        # (dead generic-with-text branch drops the span)
        title = detect_site_title(
            tree_root('<span class="site-title">Corporate Website</span>'))
        assert title is None
