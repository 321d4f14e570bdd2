"""Structure detection tests (parity: src/detect/{navigation,header,index,document}.ts)."""

from readability_core.detect import (
    analyze_document_structure,
    analyze_page_structure,
    detect_headers,
    detect_navigations,
    extract_document_content,
    extract_sections,
    prioritize_navigations,
)
from readability_core.aria import build_aria_node
from readability_core.vdom import parse_html


def root_of(html: str):
    return build_aria_node(parse_html(html).body)


PAGE = """<html><body>
<header class="site-header sticky"><img src="/logo.png" alt="Logo" class="logo">
<h1>My Site</h1>
<nav aria-label="Main"><ul>
<li class="active"><a href="/" aria-current="page">Home</a></li>
<li><a href="/docs">Docs</a></li><li><a href="/blog">Blog</a></li>
</ul></nav>
<form class="search-form"><input type="search"></form></header>
<nav class="breadcrumb"><ul><li><a href="/">Home</a></li>
<li><a href="/docs">Docs</a></li><li>Current Page</li><li>&gt;</li></ul></nav>
<aside class="sidebar"><nav><ul><li><a href="/a">Chapter A</a>
<ul><li><a href="/a1">A.1</a></li></ul></li></ul></nav></aside>
<main><h1>Doc Title</h1><h2 id="s1">Section 1</h2><p>text</p>
<h3>Sub 1.1</h3><h2>Section 2</h2></main>
<nav class="pagination"><a href="/prev">Prev</a><a href="/next">Next</a></nav>
<footer><nav><ul><li><a href="/tos">Terms</a></li></ul></nav></footer>
</body></html>"""


def test_detect_headers_main_and_contents():
    headers = detect_headers(root_of(PAGE))
    assert len(headers) == 1
    h = headers[0]
    assert h["type"] == "main" and h["isSticky"]
    assert h["contains"]["logo"]["src"] == "/logo.png"
    assert h["contains"]["siteTitle"]["text"] == "My Site"
    assert "search" in h["contains"]
    assert h["contains"]["navigation"]


def test_detect_navigation_types():
    navs = detect_navigations(root_of(PAGE))
    types = {n["type"] for n in navs}
    assert {"global", "breadcrumb", "pagination", "footer"} <= types
    global_nav = next(n for n in navs if n["type"] == "global")
    assert global_nav["location"] == "header"
    assert [i["label"] for i in global_nav["items"]] == ["Home", "Docs", "Blog"]
    assert global_nav["items"][0]["isCurrent"]


def test_breadcrumb_structure_by_separator():
    navs = detect_navigations(root_of(
        '<body><div class="menu"><ul><li><a href="/">A</a></li>'
        "<li>&gt;</li><li><a href='/b'>B</a></li></ul></div></body>"))
    assert navs and navs[0]["type"] == "breadcrumb"


def test_toc_by_anchor_ratio():
    navs = detect_navigations(root_of(
        '<body><nav><ul><li><a href="#a">A</a></li><li><a href="#b">B</a></li>'
        '<li><a href="#c">C</a></li></ul></nav></body>'))
    assert navs[0]["type"] == "toc"


def test_social_nav():
    navs = detect_navigations(root_of(
        '<body><nav><ul><li><a href="https://twitter.com/x">Twitter</a></li>'
        '<li><a href="https://github.com/x">GitHub</a></li></ul></nav></body>'))
    assert navs[0]["type"] == "social"


def test_utility_nav():
    navs = detect_navigations(root_of(
        '<body><nav><ul><li><a href="/login">Login</a></li>'
        '<li><a href="/help">Help</a></li></ul></nav></body>'))
    assert navs[0]["type"] == "utility"


def test_pagination_by_numbers():
    navs = detect_navigations(root_of(
        '<body><nav><ul><li><a href="/1">1</a></li><li><a href="/2">2</a></li>'
        '<li><a href="/3">3</a></li></ul></nav></body>'))
    assert navs[0]["type"] == "pagination"


def test_prioritize_and_cap():
    navs = [
        {"type": "social", "location": "inline", "items": [1]},
        {"type": "global", "location": "header", "items": [1, 2]},
        {"type": "toc", "location": "sidebar", "items": [1]},
    ]
    out = prioritize_navigations(navs)
    assert [n["type"] for n in out] == ["global", "toc", "social"]
    out_doc = prioritize_navigations(navs, document_mode=True)
    assert out_doc[0]["type"] == "toc"       # sidebar + toc priority in doc mode


def test_sections_stack_fold():
    sections = extract_sections(
        "<body><h1>T</h1><h2>A</h2><h3>A1</h3><h2>B</h2><h1>T2</h1></body>")
    assert [s["title"] for s in sections] == ["T", "T2"]
    t = sections[0]
    assert [c["title"] for c in t["children"]] == ["A", "B"]
    assert [c["title"] for c in t["children"][0]["children"]] == ["A1"]


def test_document_structure_and_content():
    d = analyze_document_structure(PAGE)
    assert d["sidebarNavigation"] is not None
    assert d["pagination"] == {
        "prev": {"label": "Prev", "href": "/prev"},
        "next": {"label": "Next", "href": "/next"},
    }
    c = extract_document_content(PAGE)
    assert c["content"].startswith("Doc Title")
    assert c["breadcrumb"].startswith("Home > Docs")
    assert "## Section 1 {#s1}" in c["outline"]


def test_page_structure_no_structure():
    s = analyze_page_structure("<body><p>just text</p></body>")
    assert s["headers"] == [] and s["navigations"] == []
    assert s["mainContent"] is None and s["footer"] is None
