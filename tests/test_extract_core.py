"""Extraction scenario tests mirroring the reference's unit suites
(src/extract/extract.test.ts, src/extract/preprocess.test.ts,
src/test/readability-core.test.ts)."""

from readability_core import extract
from readability_core.dom import get_inner_text, get_link_density
from readability_core.preprocess import preprocess_document
from readability_core.scoring import find_main_candidates, get_class_weight
from readability_core.vdom import parse_html


ARTICLE_HTML = """
<html lang="en"><head><title>Test Article</title>
<meta property="og:site_name" content="TestSite">
<meta name="author" content="Jane Doe">
</head><body>
<header><h1>Site header</h1><nav><a href="/a">A</a><a href="/b">B</a></nav></header>
<div class="content">
<p>{p}</p><p>{p}</p><p>{p}</p><p>{p}</p>
</div>
<footer>copyright</footer>
</body></html>
""".format(p="This is a long paragraph of body text, with several clauses, "
             "commas, and enough length to be scored by the extractor. " * 3)


def test_article_end_to_end():
    r = extract(ARTICLE_HTML)
    assert r["page_type"] == "article"
    assert r["title"] == "Test Article"
    assert r["site_name"] == "TestSite"
    assert r["byline"] == "Jane Doe"
    assert r["lang"] == "en"
    assert "long paragraph" in r["extracted_text"]
    # header/nav/footer stripped
    assert "Site header" not in r["extracted_text"]
    assert "copyright" not in r["extracted_text"]
    assert r["node_count"] > 0
    assert r["span_start"] >= 0 and r["span_end"] > r["span_start"]


def test_semantic_single_article_short_circuit():
    html = "<body><article><p>%s</p></article><div><p>other text here</p></div></body>" % (
        "Real content with words, commas, and more. " * 20)
    doc = parse_html(html)
    cands = find_main_candidates(doc)
    assert len(cands) == 1
    assert cands[0].tag == "article"


def test_two_articles_no_short_circuit():
    html = ("<body><article><p>%s</p></article>"
            "<article><p>%s</p></article></body>") % (
        "First content, with commas. " * 10, "Second content, also long. " * 10)
    doc = parse_html(html)
    cands = find_main_candidates(doc)
    assert len(cands) >= 1  # scoring path, not the single-tag shortcut


def test_high_link_density_page_is_other():
    links = "".join(
        f'<li><a href="/x{i}">Interesting link number {i} with text</a></li>'
        for i in range(60))
    html = f"<html><body><div><ul>{links}</ul></div></body></html>"
    r = extract(html)
    assert r["page_type"] == "other"
    assert r["extracted_text"] == ""


def test_preprocess_removes_unwanted_tags():
    doc = parse_html(
        "<body><nav>n</nav><div>keep</div><script>x()</script>"
        "<aside>a</aside><iframe src='x'></iframe></body>")
    preprocess_document(doc)
    tags = [c.tag for c in doc.body.children if c.nodeType == "element"]
    assert tags == ["div"]


def test_preprocess_removes_ads():
    doc = parse_html(
        '<body><div class="ad-banner">buy</div><div class="adsense">x</div>'
        '<div data-ad-client="ca-pub">y</div><div class="story">keep</div></body>')
    preprocess_document(doc)
    classes = [c.attrs.get("class", c.attrs.get("id", "?"))
               for c in doc.body.children if c.nodeType == "element"]
    assert classes == ["story"]


def test_anchored_ad_patterns_never_match_combined_string():
    # faithful reference quirk (preprocess.ts:114-125): the match string is
    # `"{class} {id}"`, so the anchored /^ad$/ /^ads$/ patterns cannot match
    # a bare id="ads" (the leading space defeats the ^ anchor)
    doc = parse_html('<body><div id="ads">kept</div></body>')
    preprocess_document(doc)
    assert [c.tag for c in doc.body.children if c.nodeType == "element"] == ["div"]


def test_class_weight():
    doc = parse_html('<body><div class="article-body">x</div>'
                     '<div class="sidebar">y</div>'
                     '<div class="comment content">z</div></body>')
    divs = [c for c in doc.body.children if c.nodeType == "element"]
    assert get_class_weight(divs[0]) == 25     # positive only
    assert get_class_weight(divs[1]) == -25    # negative only
    assert get_class_weight(divs[2]) == 0      # both


def test_title_priority_title_tag_wins():
    html = "<html><head><title>From Title</title></head><body><h1>From H1</h1></body></html>"
    assert extract(html)["title"] == "From Title"


def test_title_single_h1_fallback():
    html = "<html><body><h1>Only H1</h1><p>text</p></body></html>"
    assert extract(html)["title"] == "Only H1"


def test_title_first_heading_fallback():
    html = "<html><body><h2>First H2</h2><h2>Second</h2></body></html>"
    assert extract(html)["title"] == "First H2"


def test_links_exclude_javascript():
    html = ('<body><div><p>%s</p>'
            '<a href="javascript:void(0)">js</a><a href="/real">real</a>'
            "</div></body>" % ("Body text with commas, etc. " * 30))
    r = extract(html)
    hrefs = [l["href"] for l in r["links"]]
    assert hrefs == ["/real"]


def test_empty_and_malformed_inputs():
    for html in ["", "<", "<html>", "</div></div>", None]:
        r = extract(html)
        assert r["page_type"] in ("article", "other")
        assert isinstance(r["extracted_text"], str)


def test_inner_text_normalization():
    doc = parse_html("<body><div>  a   b\t\tc  </div></body>")
    div = doc.body.children[0]
    assert get_inner_text(div) == "a b c"


def test_link_density_fragment_weight():
    doc = parse_html(
        '<body><div>0123456789<a href="#f">0123456789</a></div></body>')
    div = doc.body.children[0]
    # 10 link chars * 0.3 / 20 total
    assert abs(get_link_density(div) - 0.15) < 1e-9


def test_hidden_content_gate():
    html = ('<html><body><div style="display: none"><p>%s</p></div></body></html>'
            % ("Hidden text, with commas, hidden away. " * 30))
    r = extract(html)
    # top candidate is invisible → gate fails → other
    assert r["page_type"] == "other"
