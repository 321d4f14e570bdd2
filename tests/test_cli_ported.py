"""Ported: /root/reference/src/cli.test.ts (document-mode and navigation
CLI options) against readability_core.progressive.  File-output (-o) is a
CLI shell concern with no library analogue and is not ported.
"""

from __future__ import annotations

import json

from readability_core.progressive import (
    doc_mode,
    extract_nav,
    progressive_dispatch,
)

# cli.test.ts:15-80 — verbatim documentation-site page
DOC_HTML = """
      <!DOCTYPE html>
      <html>
        <head>
          <title>Test Documentation</title>
        </head>
        <body>
          <header>
            <nav class="main-nav">
              <a href="/">Home</a>
              <a href="/docs">Docs</a>
              <a href="/api">API</a>
            </nav>
          </header>

          <nav class="breadcrumb">
            <a href="/">Home</a>
            <span>></span>
            <a href="/docs">Documentation</a>
            <span>></span>
            <span>Getting Started</span>
          </nav>

          <aside class="sidebar">
            <nav>
              <ul>
                <li><a href="/docs/intro">Introduction</a></li>
                <li class="current"><a href="/docs/getting-started">Getting Started</a></li>
                <li><a href="/docs/advanced">Advanced</a></li>
              </ul>
            </nav>
          </aside>

          <main>
            <h1>Getting Started</h1>
            <p>Welcome to our documentation!</p>

            <nav class="toc">
              <h2>Table of Contents</h2>
              <ul>
                <li><a href="#install">Installation</a></li>
                <li><a href="#usage">Usage</a></li>
                <li><a href="#examples">Examples</a></li>
              </ul>
            </nav>

            <h2 id="install">Installation</h2>
            <p>Install using npm:</p>
            <pre><code>npm install our-package</code></pre>

            <h2 id="usage">Usage</h2>
            <p>Import and use the package:</p>
            <pre><code>import { feature } from 'our-package';</code></pre>

            <h2 id="examples">Examples</h2>
            <p>Here are some examples...</p>
          </main>

          <nav class="pagination">
            <a href="/docs/intro">← Previous</a>
            <a href="/docs/advanced">Next →</a>
          </nav>
        </body>
      </html>
"""

# cli.test.ts:191-231 — verbatim navigation-options page
NAV_HTML = """
      <!DOCTYPE html>
      <html>
        <body>
          <header>
            <nav class="global-nav">
              <a href="/">Home</a>
              <a href="/products">Products</a>
              <a href="/about">About</a>
            </nav>
          </header>

          <nav class="breadcrumb">
            <a href="/">Home</a>
            <span>></span>
            <a href="/products">Products</a>
            <span>></span>
            <span>Widget</span>
          </nav>

          <aside>
            <nav class="sidebar-nav">
              <a href="/products/widgets">Widgets</a>
              <a href="/products/gadgets">Gadgets</a>
            </nav>
          </aside>

          <main>
            <h1>Product Page</h1>
            <p>Content here.</p>
          </main>

          <footer>
            <nav class="footer-nav">
              <a href="/privacy">Privacy</a>
              <a href="/terms">Terms</a>
            </nav>
          </footer>
        </body>
      </html>
"""


class TestCliDocumentMode:
    def test_doc_mode_full_structure(self):
        out = doc_mode(DOC_HTML)
        assert "**Breadcrumb:** Home > Documentation" in out
        assert "## Table of Contents" in out
        assert "- Installation (#install)" in out
        assert "- Usage (#usage)" in out
        assert "- Examples (#examples)" in out
        assert "## Sidebar Navigation" in out
        assert "- Introduction (/docs/intro)" in out
        assert "- Getting Started (/docs/getting-started) **[Current]**" in out
        assert "- Advanced (/docs/advanced)" in out
        assert "## Document Outline" in out
        assert "# Getting Started" in out
        assert "## Installation {#install}" in out
        assert "## Usage {#usage}" in out
        assert "## Examples {#examples}" in out
        assert "## Main Content" in out
        assert "Welcome to our documentation!" in out
        assert "Install using npm:" in out

    def test_f_doc_equals_doc_mode(self):
        out = progressive_dispatch(DOC_HTML, "u", fmt="doc")
        assert out == doc_mode(DOC_HTML)
        assert "**Breadcrumb:** Home > Documentation" in out

    def test_doc_mode_ignores_nav_filters(self):
        # cli.js checks --extract-nav/--nav-only first; --doc-mode with a
        # nav filter (but no nav flag) still renders the full doc view
        out = progressive_dispatch(DOC_HTML, "u", doc_mode=True,
                                   nav_location="sidebar")
        assert "## Sidebar Navigation" in out
        assert "- Introduction (/docs/intro)" in out

    def test_handles_sites_without_navigation(self):
        simple = """
      <!DOCTYPE html>
      <html>
        <body>
          <main>
            <h1>Simple Page</h1>
            <p>This is a simple page without navigation.</p>
          </main>
        </body>
      </html>
    """
        out = doc_mode(simple)
        assert "## Main Content" in out
        assert "Simple Page" in out
        assert "This is a simple page without navigation" in out
        assert "## Sidebar Navigation" not in out
        assert "## Table of Contents" not in out
        assert "**Breadcrumb:**" not in out


class TestCliNavigationOptions:
    def test_nav_type_filter(self):
        r = extract_nav(NAV_HTML, "u", nav_type="global")
        assert len(r["navigations"]) == 1
        assert r["navigations"][0]["type"] == "global"
        assert len(r["navigations"][0]["items"]) == 3

    def test_nav_location_filter(self):
        r = extract_nav(NAV_HTML, "u", nav_location="header")
        assert r["navigations"]
        assert all(n["location"] == "header" for n in r["navigations"])

    def test_nav_only_shows_all(self):
        r = json.loads(progressive_dispatch(NAV_HTML, "u", nav_only=True))
        assert len(r["navigations"]) > 2
        assert r["summary"]["total"] == len(r["navigations"])
        assert r["summary"]["byType"]
        assert r["summary"]["mainNavigation"] is not None
        assert r["summary"]["breadcrumb"] is not None
