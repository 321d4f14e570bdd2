"""src/detect/cloudflare-docs.test.ts ported verbatim (10 cases over a
realistic documentation-site structure with custom components)."""

import pytest

from readability_core.detect import (
    analyze_document_structure,
    analyze_page_structure,
    extract_document_content,
)

CLOUDFLARE_DOCS_HTML = """
<!DOCTYPE html>
<html lang="en">
  <head><title>Cloudflare Workers documentation · Cloudflare Workers docs</title></head>
  <body>
    <header>
      <nav class="theme-switcher"><button aria-label="Theme">Theme</button></nav>
      <nav class="top-nav">
        <a href="/workers/">Workers</a><a href="/pages/">Pages</a>
        <a href="/r2/">R2</a><a href="/d1/">D1</a>
      </nav>
    </header>
    <astro-breadcrumbs>
      <nav aria-label="Breadcrumbs" class="breadcrumbs"><ol>
        <li><a href="/">Docs</a></li>
        <li><a href="/workers/">Workers</a></li>
        <li aria-current="page">Documentation</li>
      </ol></nav>
    </astro-breadcrumbs>
    <div class="docs-content">
      <aside class="sidebar-content">
        <nav aria-label="Main"><ul>
          <li><details open><summary>Getting started</summary><ul>
            <li><a href="/workers/get-started/guide/">Get started guide</a></li>
            <li><a href="/workers/get-started/quickstarts/">Quickstarts</a></li>
          </ul></details></li>
          <li><details><summary>Development &amp; testing</summary><ul>
            <li><a href="/workers/testing/local-development/">Local development</a></li>
            <li><a href="/workers/testing/debugging/">Debugging</a></li>
            <li><a href="/workers/testing/unit-testing/">Unit testing</a></li>
          </ul></details></li>
          <li><details><summary>Configuration</summary><ul>
            <li><a href="/workers/configuration/versions-and-deployments/">Versions &amp; deployments</a></li>
            <li><a href="/workers/configuration/bindings/">Bindings</a></li>
            <li><a href="/workers/configuration/environment-variables/">Environment variables</a></li>
          </ul></details></li>
          <li><details><summary>Runtime APIs</summary><ul>
            <li><a href="/workers/runtime-apis/request/">Request</a></li>
            <li><a href="/workers/runtime-apis/response/">Response</a></li>
            <li><a href="/workers/runtime-apis/fetch-event/">FetchEvent</a></li>
            <li><a href="/workers/runtime-apis/scheduled-event/">ScheduledEvent</a></li>
            <li><details><summary>Web Standards</summary><ul>
              <li><a href="/workers/runtime-apis/web-standards/fetch/">Fetch API</a></li>
              <li><a href="/workers/runtime-apis/web-standards/streams/">Streams API</a></li>
              <li><a href="/workers/runtime-apis/web-standards/encoding/">Encoding API</a></li>
            </ul></details></li>
          </ul></details></li>
          <li><details><summary>Wrangler</summary><ul>
            <li><a href="/workers/wrangler/install-and-update/">Install/Update</a></li>
            <li><a href="/workers/wrangler/commands/">Commands</a></li>
            <li><a href="/workers/wrangler/configuration/">Configuration</a></li>
          </ul></details></li>
        </ul></nav>
      </aside>
      <main><article>
        <h1>Cloudflare Workers documentation</h1>
        <p class="lead">Build serverless applications and deploy instantly across the globe for exceptional performance, reliability, and scale.</p>
        <section>
          <h2 id="what-is-workers">What is Cloudflare Workers?</h2>
          <p>Cloudflare Workers provides a serverless execution environment that allows you to create new applications or augment existing ones without configuring or maintaining infrastructure.</p>
          <h3 id="benefits">Benefits</h3>
          <ul>
            <li>Global network: Deploy to Cloudflare's global network</li>
            <li>Auto-scaling: Automatic scaling with no configuration</li>
            <li>High performance: Run code within milliseconds of your users</li>
          </ul>
        </section>
        <section>
          <h2 id="get-started">Get started</h2>
          <p>Choose from our collection of guides and tutorials:</p>
          <nav class="tutorial-cards">
            <a href="/workers/get-started/guide/" class="card">
              <h3>Get started guide</h3>
              <p>Set up your development environment and deploy your first Worker</p>
            </a>
            <a href="/workers/tutorials/build-a-qr-code-generator/" class="card">
              <h3>Build a QR code generator</h3>
              <p>Build and deploy a QR code generator API</p>
            </a>
          </nav>
        </section>
        <section>
          <h2 id="frameworks">Framework guides</h2>
          <p>Deploy popular frameworks to Cloudflare Workers:</p>
          <ul>
            <li><a href="/workers/frameworks/framework-guides/nextjs/">Next.js</a></li>
            <li><a href="/workers/frameworks/framework-guides/remix/">Remix</a></li>
            <li><a href="/workers/frameworks/framework-guides/sveltekit/">SvelteKit</a></li>
            <li><a href="/workers/frameworks/framework-guides/nuxt/">Nuxt</a></li>
          </ul>
        </section>
      </article></main>
      <aside class="toc-sidebar">
        <nav aria-label="Table of contents"><h2>On this page</h2><ul>
          <li><a href="#what-is-workers">What is Cloudflare Workers?</a>
            <ul><li><a href="#benefits">Benefits</a></li></ul>
          </li>
          <li><a href="#get-started">Get started</a></li>
          <li><a href="#frameworks">Framework guides</a></li>
        </ul></nav>
      </aside>
    </div>
    <footer><nav>
      <a href="/workers/platform/changelog/">Changelog</a>
      <a href="https://discord.cloudflare.com">Discord</a>
      <a href="https://github.com/cloudflare">GitHub</a>
    </nav></footer>
  </body>
</html>
"""


@pytest.fixture(scope="module")
def doc_structure():
    return analyze_document_structure(CLOUDFLARE_DOCS_HTML)


def test_detects_all_navigation_types():
    structure = analyze_page_structure(CLOUDFLARE_DOCS_HTML,
                                       document_mode=True)
    assert len(structure["navigations"]) > 4
    nav_types = [n["type"] for n in structure["navigations"]]
    assert "global" in nav_types
    assert "breadcrumb" in nav_types
    assert "toc" in nav_types
    assert "local" in nav_types


def test_hierarchical_sidebar_navigation(doc_structure):
    nav = doc_structure["sidebarNavigation"]
    assert nav is not None
    labels = [i["label"] for i in nav["items"]]
    assert "Get started guide" in labels
    assert "Request" in labels
    assert "Install/Update" in labels
    assert "Fetch API" in labels
    assert "Streams API" in labels
    assert "Encoding API" in labels


def test_custom_breadcrumb_component():
    structure = analyze_page_structure(CLOUDFLARE_DOCS_HTML)
    bc = structure["breadcrumb"]
    assert bc is not None
    assert len(bc["items"]) == 3
    assert bc["items"][0]["label"] == "Docs"
    assert bc["items"][1]["label"] == "Workers"
    assert bc["items"][2]["label"] == "Documentation"


def test_toc_from_right_sidebar():
    structure = analyze_page_structure(CLOUDFLARE_DOCS_HTML)
    toc = next(
        (n for n in structure["navigations"]
         if n["type"] == "toc" or all(
             (i.get("href") or "").startswith("#") for i in n["items"])),
        None)
    assert toc is not None
    assert len(toc["items"]) > 0
    main_item = next(
        (i for i in toc["items"] if "What is" in i["label"]), None)
    assert main_item is not None
    assert main_item.get("children")


def test_structured_content_with_all_navigations():
    content = extract_document_content(CLOUDFLARE_DOCS_HTML)
    assert "Docs" in content["breadcrumb"]
    assert "Workers" in content["breadcrumb"]
    assert "Get started guide" in content["sidebarNav"]
    assert "Request" in content["sidebarNav"]
    assert "Fetch API" in content["sidebarNav"]
    assert "What is Cloudflare Workers?" in content["toc"]
    assert "Benefits" in content["toc"]
    assert "Cloudflare Workers documentation" in content["content"]
    assert ("serverless" in content["content"]
            or "Build and deploy" in content["content"])
    assert "Global network" in content["content"]


def test_section_hierarchy(doc_structure):
    sections = doc_structure["sections"]
    assert sections
    assert any(s["title"] == "Cloudflare Workers documentation"
               for s in sections)
    section_titles = [t for s in sections
                      for t in [s["title"]] + [c["title"]
                                               for c in s.get("children", [])]]
    assert "What is Cloudflare Workers?" in section_titles
    all_titles = [t for s in sections for t in
                  [s["title"]]
                  + [c["title"] for c in s.get("children", [])]
                  + [cc["title"] for c in s.get("children", [])
                     for cc in c.get("children", [])]]
    assert "Benefits" in all_titles
    assert "Get started" in section_titles
    assert "Framework guides" in section_titles


def test_tutorial_cards_as_navigation():
    structure = analyze_page_structure(CLOUDFLARE_DOCS_HTML)
    tutorial_nav = next(
        (n for n in structure["navigations"]
         if any("QR code generator" in i["label"]
                or "Get started guide" in i["label"] for i in n["items"])),
        None)
    if tutorial_nav:
        assert len(tutorial_nav["items"]) >= 2
        qr = next((i for i in tutorial_nav["items"]
                   if "QR code generator" in i["label"]), None)
        if qr:
            assert "/tutorials/build-a-qr-code-generator/" in qr["href"]


def test_framework_guides_in_content():
    content = extract_document_content(CLOUDFLARE_DOCS_HTML)
    assert "Framework guides" in content["content"]
    for fw in ("Next.js", "Remix", "SvelteKit", "Nuxt"):
        assert fw in content["content"]


def test_document_mode_prioritization():
    structure = analyze_page_structure(CLOUDFLARE_DOCS_HTML,
                                       document_mode=True,
                                       max_navigations=20)
    nav_types = [n["type"] for n in structure["navigations"][:5]]
    doc_nav_types = [t for t in nav_types
                     if t in ("toc", "local", "breadcrumb")]
    assert len(doc_nav_types) > 0


def test_nested_navigation_structures(doc_structure):
    sidebar = doc_structure["sidebarNavigation"]
    assert sidebar is not None
    fetch_api = next(
        (i for i in sidebar["items"] if i["label"] == "Fetch API"), None)
    assert fetch_api is not None
    assert "/web-standards/fetch/" in fetch_api["href"]


def test_markdown_formatting_of_navigation():
    content = extract_document_content(CLOUDFLARE_DOCS_HTML)
    if content.get("sidebarNav"):
        lines = content["sidebarNav"].split("\n")
        import re
        assert any(re.match(r"^- Get started guide", l) for l in lines)
        assert any(re.match(r"^- Request", l) for l in lines)
        assert any(re.match(r"^- Fetch API", l) for l in lines)
