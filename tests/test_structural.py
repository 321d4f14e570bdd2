"""Structural-element + content-characteristics tests
(parity: src/extract/extract.ts:102-281, src/classify/classify.ts:284-400)."""

from readability_core.scoring import find_main_candidates
from readability_core.structural import (
    analyze_content_characteristics,
    find_structural_elements,
    is_significant_node,
)
from readability_core.vdom import parse_html


def test_unique_header_footer_tags_win():
    doc = parse_html(
        "<body><header>h</header><main><p>x</p></main>"
        "<footer>f</footer></body>")
    s = find_structural_elements(doc)
    assert s["header"].tag == "header"
    assert s["footer"].tag == "footer"


def test_header_by_class_prefers_body_child():
    doc = parse_html(
        '<body><div><div class="inner-header">deep</div></div>'
        '<div class="site-header">top</div></body>')
    s = find_structural_elements(doc)
    assert s["header"].attrs["class"] == "site-header"


def test_footer_by_role_excludes_inside_header():
    doc = parse_html(
        '<body><div id="header"><div class="footer">inside</div></div>'
        '<div role="contentinfo">real</div></body>')
    s = find_structural_elements(doc)
    assert s["footer"].attrs.get("role") == "contentinfo"


def test_other_significant_nodes_exclude_header_footer():
    text = "Long enough body text for significance checks. " * 5
    doc = parse_html(
        f"<body><header><nav>n</nav></header>"
        f"<main><p>{text}</p></main>"
        f"<section><p>{text}</p></section>"
        f"<footer><section>inside footer</section></footer></body>")
    s = find_structural_elements(doc)
    tags = [el.tag for el in s["other_significant_nodes"]]
    assert "main" in tags and "section" in tags
    # nav was inside header; footer's section excluded
    assert tags.count("section") == 1
    assert "nav" not in tags


def test_is_significant_node_thresholds():
    doc = parse_html("<body><div>%s</div><div>short</div></body>"
                     % ("Fifty plus characters of real text content here. " * 3))
    big, small = [c for c in doc.body.children if c.nodeType == "element"]
    assert is_significant_node(big)
    assert not is_significant_node(small)


def test_content_characteristics_article():
    doc = parse_html(
        "<body><article><h2>H</h2><p>%s</p></article></body>"
        % ("enough text, with commas, for scoring. " * 30))
    cands = find_main_candidates(doc)
    out = analyze_content_characteristics(doc, cands)
    assert out["page_type"] == "article"
    assert any("semantic tag" in r for r in out["reasons"])


def test_content_characteristics_no_candidates():
    out = analyze_content_characteristics(parse_html("<body></body>"), [])
    assert out["page_type"] == "other"
