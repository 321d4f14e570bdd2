"""src/detect/document.test.ts ported verbatim (8 cases incl. the complex
documentation-site integration scenario)."""

import re

from readability_core.detect import (
    analyze_document_structure,
    extract_document_content,
)


def test_sidebar_navigation_from_docs_site():
    html = """
      <html><body>
        <aside class="sidebar"><nav><ul>
          <li><a href="/docs/intro">Introduction</a></li>
          <li><a href="/docs/getting-started">Getting Started</a></li>
          <li><a href="/docs/api">API Reference</a>
            <ul>
              <li><a href="/docs/api/core">Core API</a></li>
              <li><a href="/docs/api/utils">Utilities</a></li>
            </ul>
          </li>
        </ul></nav></aside>
        <main><h1>Documentation</h1><p>Welcome to our documentation.</p></main>
      </body></html>"""
    result = analyze_document_structure(html)
    nav = result["sidebarNavigation"]
    assert nav is not None
    assert len(nav["items"]) >= 3
    assert nav["items"][0]["label"] == "Introduction"
    api = next(i for i in nav["items"] if i["label"] == "API Reference")
    assert len(api["children"]) == 2


def test_sections_with_hierarchy():
    html = """
      <html><body><main>
        <h1 id="intro">Introduction</h1><p>This is the introduction.</p>
        <h2 id="overview">Overview</h2><p>This is an overview.</p>
        <h3 id="features">Features</h3><p>List of features.</p>
        <h2 id="installation">Installation</h2><p>How to install.</p>
      </main></body></html>"""
    result = analyze_document_structure(html)
    sections = result["sections"]
    assert len(sections) == 1
    assert sections[0]["title"] == "Introduction"
    assert sections[0]["id"] == "intro"
    assert len(sections[0]["children"]) == 2
    assert sections[0]["children"][0]["title"] == "Overview"
    assert len(sections[0]["children"][0]["children"]) == 1


def test_pagination_links():
    html = """
      <html><body>
        <nav class="pagination">
          <a href="/page/1">← Previous</a>
          <a href="/page/3">Next →</a>
        </nav>
        <main><h1>Page 2</h1><p>Content of page 2.</p></main>
      </body></html>"""
    result = analyze_document_structure(html)
    pag = result["pagination"]
    assert pag is not None
    assert pag["prev"]["label"] == "← Previous"
    assert pag["prev"]["href"] == "/page/1"
    assert pag["next"]["label"] == "Next →"
    assert pag["next"]["href"] == "/page/3"


def test_toc_prioritized_in_document_mode():
    html = """
      <html><body>
        <header><nav class="global-nav"><a href="/">Home</a><a href="/about">About</a></nav></header>
        <aside><nav class="toc"><ul>
          <li><a href="#section1">Section 1</a></li>
          <li><a href="#section2">Section 2</a></li>
        </ul></nav></aside>
        <main><h1>Document</h1>
          <h2 id="section1">Section 1</h2><p>Content 1</p>
          <h2 id="section2">Section 2</h2><p>Content 2</p>
        </main>
      </body></html>"""
    result = analyze_document_structure(html)
    assert len(result["navigations"]) > 0
    toc = next((n for n in result["navigations"] if n["type"] == "toc"), None)
    assert toc is not None
    assert result["toc"] is toc


def test_structured_content_with_navigation():
    html = """
      <html><body>
        <nav class="breadcrumb">
          <a href="/">Home</a><span>&gt;</span>
          <a href="/docs">Docs</a><span>&gt;</span><span>API</span>
        </nav>
        <aside class="sidebar"><nav><ul>
          <li><a href="/docs/intro">Introduction</a></li>
          <li class="current"><a href="/docs/api">API Reference</a></li>
          <li><a href="/docs/examples">Examples</a></li>
        </ul></nav></aside>
        <main>
          <h1>API Reference</h1><p>Welcome to the API documentation.</p>
          <h2>Authentication</h2><p>How to authenticate.</p>
          <h2>Endpoints</h2><p>Available endpoints.</p>
        </main>
      </body></html>"""
    result = extract_document_content(html)
    assert re.search(r"Home.*Docs", result["breadcrumb"])
    assert "- Introduction (/docs/intro)" in result["sidebarNav"]
    assert "- API Reference (/docs/api) **[Current]**" in result["sidebarNav"]
    assert "# API Reference" in result["outline"]
    assert "## Authentication" in result["outline"]
    assert "## Endpoints" in result["outline"]
    assert "Welcome to the API documentation" in result["content"]


def test_table_of_contents_rendering():
    html = """
      <html><body>
        <aside><nav class="toc"><h2>Table of Contents</h2><ul>
          <li><a href="#intro">1. Introduction</a></li>
          <li><a href="#basics">2. Basics</a>
            <ul>
              <li><a href="#setup">2.1 Setup</a></li>
              <li><a href="#config">2.2 Configuration</a></li>
            </ul>
          </li>
          <li><a href="#advanced">3. Advanced Topics</a></li>
        </ul></nav></aside>
        <main><h1 id="intro">Introduction</h1><p>Getting started guide.</p></main>
      </body></html>"""
    result = extract_document_content(html)
    toc = result.get("toc")
    assert toc is not None
    assert "- 1. Introduction (#intro)" in toc
    assert "- 2. Basics (#basics)" in toc
    assert "  - 2.1 Setup (#setup)" in toc
    assert "  - 2.2 Configuration (#config)" in toc
    assert "- 3. Advanced Topics (#advanced)" in toc


def test_markdown_output_formatting():
    html = """
      <html><body>
        <nav class="breadcrumb"><a href="/">Home</a><span>&gt;</span><a href="/guide">Guide</a></nav>
        <main>
          <h1>User Guide</h1><p>This is the user guide.</p>
          <h2>Getting Started</h2><p>Start here.</p>
        </main>
      </body></html>"""
    result = extract_document_content(html)
    assert "User Guide\n" in result["content"]
    assert "This is the user guide" in result["content"]
    assert "Getting Started\n" in result["content"]
    assert "Start here" in result["content"]
    assert result["breadcrumb"] == "Home > Guide"


def test_empty_sections_graceful():
    html = """
      <html><body><main>
        <h1>Page Title</h1><p>Some content.</p>
      </main></body></html>"""
    result = extract_document_content(html)
    assert "Page Title" in result["content"]
    assert "Some content" in result["content"]
    assert "sidebarNav" not in result
    assert "toc" not in result
    assert "breadcrumb" not in result


def test_complex_documentation_site_integration():
    html = """
      <html><body>
        <header><nav class="main-nav">
          <a href="/">Home</a><a href="/docs">Documentation</a>
          <a href="/api">API</a><a href="/blog">Blog</a>
        </nav></header>
        <nav class="breadcrumb"><ol>
          <li><a href="/">Home</a></li>
          <li><a href="/docs">Docs</a></li>
          <li><a href="/docs/guides">Guides</a></li>
          <li class="current">Getting Started</li>
        </ol></nav>
        <div class="container">
          <aside class="sidebar">
            <nav><h3>Guides</h3><ul>
              <li><a href="/docs/guides/intro">Introduction</a></li>
              <li class="active"><a href="/docs/guides/getting-started">Getting Started</a>
                <ul>
                  <li><a href="#prerequisites">Prerequisites</a></li>
                  <li><a href="#installation">Installation</a></li>
                  <li><a href="#first-app">Your First App</a></li>
                </ul>
              </li>
              <li><a href="/docs/guides/advanced">Advanced Topics</a></li>
            </ul></nav>
            <nav class="version-selector"><select>
              <option>v2.0</option><option selected>v1.0</option><option>v0.9</option>
            </select></nav>
          </aside>
          <main><article>
            <h1>Getting Started with Our Framework</h1>
            <p class="lead">Learn how to build your first application in under 5 minutes.</p>
            <nav class="toc"><h2>On this page</h2><ul>
              <li><a href="#prerequisites">Prerequisites</a></li>
              <li><a href="#installation">Installation</a></li>
              <li><a href="#first-app">Your First App</a>
                <ul>
                  <li><a href="#create-project">Create a New Project</a></li>
                  <li><a href="#run-dev">Run Development Server</a></li>
                </ul>
              </li>
              <li><a href="#next-steps">Next Steps</a></li>
            </ul></nav>
            <h2 id="prerequisites">Prerequisites</h2>
            <p>Before you begin, make sure you have the following installed:</p>
            <ul><li>Node.js 14 or later</li><li>npm or yarn</li></ul>
            <h2 id="installation">Installation</h2>
            <p>Install our CLI tool globally:</p>
            <pre><code>npm install -g our-framework-cli</code></pre>
            <h2 id="first-app">Your First App</h2>
            <p>Let's create your first application.</p>
            <h3 id="create-project">Create a New Project</h3>
            <p>Run the following command:</p>
            <pre><code>our-framework create my-app</code></pre>
            <h3 id="run-dev">Run Development Server</h3>
            <p>Navigate to your project and start the dev server:</p>
            <pre><code>cd my-app
npm run dev</code></pre>
            <h2 id="next-steps">Next Steps</h2>
            <p>Congratulations! You've created your first app. Check out these resources:</p>
            <ul>
              <li><a href="/docs/guides/tutorial">Complete Tutorial</a></li>
              <li><a href="/docs/api">API Reference</a></li>
              <li><a href="/examples">Example Projects</a></li>
            </ul>
          </article>
          <nav class="pagination">
            <a href="/docs/guides/intro" class="prev">← Introduction</a>
            <a href="/docs/guides/tutorial" class="next">Tutorial →</a>
          </nav></main>
        </div>
        <footer><nav>
          <a href="/privacy">Privacy</a><a href="/terms">Terms</a><a href="/contact">Contact</a>
        </nav></footer>
      </body></html>"""

    structure = analyze_document_structure(html)
    assert len(structure["navigations"]) > 3

    assert structure["mainNavigation"] is not None
    assert len(structure["mainNavigation"]["items"]) == 4

    assert structure["breadcrumb"] is not None
    assert len(structure["breadcrumb"]["items"]) == 4

    toc_like = next(
        (n for n in structure["navigations"]
         if n["type"] == "toc" or (n["items"] and (n["items"][0].get("href")
                                                   or "").startswith("#"))),
        None)
    assert toc_like is not None
    if structure["toc"] is not None:
        assert len(structure["toc"]["items"]) == 4

    assert structure["sidebarNavigation"] is not None
    assert len(structure["sidebarNavigation"]["items"]) >= 3

    pagination_nav = next(
        (n for n in structure["navigations"] if n["type"] == "pagination"),
        None)
    assert pagination_nav is not None
    if structure["pagination"]:
        assert "Introduction" in structure["pagination"]["prev"]["label"]
        assert "Tutorial" in structure["pagination"]["next"]["label"]

    sections = structure["sections"]
    assert sections
    main_heading = next(
        (s for s in sections
         if "Getting Started" in s["title"] or s["level"] == 1), None)
    assert main_heading is not None
    total_subsections = sum(len(s.get("children") or []) for s in sections)
    assert total_subsections >= 4

    content = extract_document_content(html)
    assert re.search(r"Home.*Docs.*Guides", content["breadcrumb"])
    assert "Getting Started" in content["sidebarNav"]
    if content.get("toc"):
        assert "Prerequisites" in content["toc"]
    assert content.get("outline")
    assert "Learn how to build your first application" in content["content"]
