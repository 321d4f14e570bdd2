"""The reference's own unit suites, ported verbatim.

Inputs and expected outputs are copied from
/root/reference/src/format/markdown-basic.test.ts and
/root/reference/src/extract/extract.test.ts — if these pass, our engine
passes the reference's tests.
"""

from readability_core.extract import extract_full
from readability_core.render import to_markdown
from readability_core.scoring import is_probably_content
from readability_core.vdom import VElement, VText, parse_html


def el(tag, children=(), **attrs):
    e = VElement(tag, dict(attrs))
    for c in children:
        node = VText(c, parent=e) if isinstance(c, str) else c
        node.parent = e
        e.children.append(node)
    return e


# --- markdown-basic.test.ts ---------------------------------------------------

def test_md_null():
    assert to_markdown(None) == ""


def test_md_simple_text():
    assert to_markdown(el("p", ["Hello, world!"])) == "Hello, world!"


def test_md_headings():
    assert to_markdown(el("h1", ["Title"])) == "# Title"
    for i, tag in enumerate(["h1", "h2", "h3", "h4", "h5", "h6"], 1):
        assert to_markdown(el(tag, ["Heading"])) == "#" * i + " Heading"


def test_md_bold_italic():
    assert to_markdown(el("strong", ["bold text"])) == "**bold text**"
    assert to_markdown(el("em", ["italic text"])) == "*italic text*"


def test_md_link():
    assert to_markdown(
        el("a", ["Example"], href="https://example.com")
    ) == "[Example](https://example.com)"


def test_md_image():
    assert to_markdown(
        el("img", [], src="image.jpg", alt="Description")
    ) == "![Description](image.jpg)"


def test_md_inline_code():
    assert to_markdown(el("code", ["const x = 42;"])) == "`const x = 42;`"


def test_md_code_block():
    pre = el("pre", [el("code", ["function hello() {\n  return 'world';\n}"])])
    assert to_markdown(pre) == \
        "```\nfunction hello() {\n  return 'world';\n}\n```"


def test_md_code_block_with_language():
    code = el("code", ["console.log('hello');"])
    code.attrs["class"] = "language-javascript"
    assert to_markdown(el("pre", [code])) == \
        "```javascript\nconsole.log('hello');\n```"


def test_md_unordered_list():
    ul = el("ul", [el("li", ["Item 1"]), el("li", ["Item 2"])])
    assert to_markdown(ul) == "- Item 1\n- Item 2"


def test_md_ordered_list():
    ol = el("ol", [el("li", ["First"]), el("li", ["Second"])])
    assert to_markdown(ol) == "1. First\n1. Second"


def test_md_blockquote():
    bq = el("blockquote", [el("p", ["This is a quote"])])
    assert to_markdown(bq) == "> This is a quote"


def test_md_hr():
    assert to_markdown(el("hr")) == "---"


def test_md_br():
    result = to_markdown(el("br"))
    assert "  " in result or result == ""


def test_md_escapes_specials():
    p = el("p", ["Text with *asterisks* and _underscores_"])
    assert to_markdown(p) == \
        "Text with \\*asterisks\\* and \\_underscores\\_"


# --- extract.test.ts -----------------------------------------------------------

BASIC_HTML = """
<html>
  <head><title>Test Page</title></head>
  <body>
    <div id="content">
      <h1>Test Article Title</h1>
      <p class="byline">Author: Test Taro</p>
      <p>This is the body of the test article. Used for Readability testing.</p>
      <p>A paragraph with sufficient length of text is required. This paragraph should be detected as the main content.
      In actual articles, it is common to have several such long paragraphs.
      Text length is an important factor in the scoring algorithm.</p>
    </div>
  </body>
</html>
"""

SEMANTIC_HTML = """
<html>
  <head><title>Semantic Tag Test</title></head>
  <body>
    <header><h1>Website Header</h1>
      <nav><ul><li><a href="#">Home</a></li><li><a href="#">About</a></li></ul></nav>
    </header>
    <main>
      <article>
        <h1>Article Title</h1>
        <p>This is the body of the article. Using semantic tags.</p>
        <p>This paragraph is inside the article tag and should be detected as the main content.
        Having sufficient length of text allows the scoring algorithm to
        recognize it as important content.</p>
      </article>
    </main>
    <footer><p>Copyright 2025</p></footer>
  </body>
</html>
"""

COMPLEX_HTML = """
<html>
  <head><title>Complex Layout</title></head>
  <body>
    <header class="site-header"><h1>News Site</h1><nav>Menu items go here</nav></header>
    <div class="container">
      <div class="sidebar"><div class="widget"><h3>Related Articles</h3>
        <ul><li><a href="#">Article 1</a></li><li><a href="#">Article 2</a></li></ul>
      </div></div>
      <div class="content">
        <h1>Main Content Title</h1>
        <div class="meta"><span class="author">Author: Content Creator</span>
          <span class="date">March 25, 2025</span></div>
        <p>This is the first paragraph of the main content. This part should be detected as the main content.</p>
        <p>This is the second paragraph. Having sufficient length of text allows the scoring algorithm to
        recognize it as important content. In actual articles, it is common to have several such long paragraphs.
        Text length is an important factor in the scoring algorithm.</p>
        <p>There is also a third paragraph. Having multiple paragraphs increases the score of this div element.</p>
      </div>
      <div class="comments"><h3>Comments</h3><div class="comment">
        <p>This is a comment on the article. It might be a long comment, but it's not the main content.
        The comment section should usually be excluded from the main content.</p>
      </div></div>
    </div>
    <footer><p>Footer information goes here</p></footer>
  </body>
</html>
"""

SHORT_TEXT_HTML = """
<html><body>
  <h1>Too Short</h1>
  <p>This is way too short to be an article.</p>
</body></html>
"""

HIGH_LINK_DENSITY_HTML = """
<html><body>
  <div class="navigation">
    <a href="#">Link 1</a><a href="#">Link 2</a><a href="#">Link 3</a>
    <a href="#">Link 4</a><a href="#">Link 5</a>
    <span>Just a little text</span>
  </div>
  <div class="content">
    <p>This is the main content. There are almost no links.</p>
    <p>A paragraph with sufficient length of text is required. This paragraph should be detected as the main content.
    In actual articles, it is common to have several such long paragraphs.
    Text length is an important factor in the scoring algorithm.</p>
    <a href="#">Reference Link</a>
  </div>
</body></html>
"""


def test_is_probably_content_long_vs_header():
    long_text = (
        "This is a paragraph with sufficient length of text. This paragraph "
        "should be detected as the main content.\n    In actual articles, it "
        "is common to have several such long paragraphs.\n    Text length is "
        "an important factor in the scoring algorithm.\n    This paragraph "
        "is over 140 characters long and has low link density, so it should "
        "be detected as content.")
    p = el("p", [long_text])
    p.attrs["class"] = "content"
    assert is_probably_content(p) is True
    assert is_probably_content(el("h1", ["Short header text"])) is False


def test_is_probably_content_link_density():
    doc = parse_html(HIGH_LINK_DENSITY_HTML)
    divs = {c.class_name: c for c in doc.body.children
            if c.nodeType == "element"}
    assert is_probably_content(divs["navigation"]) is False
    assert is_probably_content(divs["content"]) is True


def test_extract_basic_html():
    r, _doc, root, _c = extract_full(BASIC_HTML, char_threshold=100)
    assert root is not None
    assert r["node_count"] > 0
    text = "".join(
        t.text for p in root.children
        if p.nodeType == "element" and p.tag == "p"
        for t in p.children if t.nodeType == "text")
    assert "This is the body of the test article" in text


def test_extract_semantic_tags():
    r, _doc, root, _c = extract_full(SEMANTIC_HTML, char_threshold=100)
    assert root is not None
    assert r["node_count"] > 0
    assert root.tag == "article" or any(
        c.nodeType == "element" and c.tag == "article" for c in root.children)


def test_extract_complex_html():
    r, _doc, root, _c = extract_full(COMPLEX_HTML)
    assert root is not None
    assert r["node_count"] > 0
    assert root.class_name == "content" or any(
        c.nodeType == "element" and c.class_name == "content"
        for c in root.children)


def test_extract_short_text_is_other():
    r, _doc, root, _c = extract_full(SHORT_TEXT_HTML, char_threshold=500)
    assert root is None
    assert r["node_count"] == 0


# --- preprocess.test.ts ----------------------------------------------------

from readability_core.dom import get_elements_by_tag_name
from readability_core.preprocess import preprocess_document


def test_preprocess_removes_script_tags():
    doc = parse_html("""
      <html><body>
          <h1>Title</h1>
          <p>Some content.</p>
          <script>alert('Hello');</script>
          <p>More content.</p>
          <script src="script.js"></script>
      </body></html>""")
    preprocess_document(doc)
    assert len(get_elements_by_tag_name(doc.body, "script")) == 0
    assert len(get_elements_by_tag_name(doc.body, "p")) == 2


def test_preprocess_removes_style_tags():
    doc = parse_html("""
      <html><head><style>body { background: red; }</style></head>
      <body><h1>Title</h1>
          <style>.content { color: blue; }</style>
          <p>Some content.</p>
      </body></html>""")
    preprocess_document(doc)
    assert len(get_elements_by_tag_name(doc.document_element, "style")) == 0
    assert len(get_elements_by_tag_name(doc.body, "style")) == 0
    assert len(get_elements_by_tag_name(doc.body, "p")) == 1
    assert len(get_elements_by_tag_name(doc.body, "h1")) == 1


def test_preprocess_removes_both_script_and_style():
    doc = parse_html("""
      <html><body>
          <style>h1 { font-size: 2em; }</style>
          <h1>Title</h1>
          <script>console.log('Logging');</script>
          <p>Content between tags.</p>
          <script src="another.js"></script>
          <style>.footer { text-align: center; }</style>
      </body></html>""")
    preprocess_document(doc)
    assert len(get_elements_by_tag_name(doc.body, "script")) == 0
    assert len(get_elements_by_tag_name(doc.body, "style")) == 0
    assert len(get_elements_by_tag_name(doc.body, "h1")) == 1
    assert len(get_elements_by_tag_name(doc.body, "p")) == 1


def test_preprocess_keeps_clean_content():
    doc = parse_html("""
      <html><body>
          <h1>Main Title</h1>
          <p>This is the first paragraph.</p>
          <div><p>Nested paragraph.</p></div>
      </body></html>""")
    preprocess_document(doc)
    assert len(get_elements_by_tag_name(doc.body, "h1")) == 1
    assert len(get_elements_by_tag_name(doc.body, "p")) == 2


# --- classify.test.ts (the improved classifier) -----------------------------

from readability_core.classify_improved import classify_improved
from readability_core.scoring import find_main_candidates

SHORT_ARTICLE_WITH_STRUCTURE_HTML = """
<html><head><title>Short Article Test</title></head>
<body>
  <header id="page-header" role="banner"><h1>Website Title</h1><nav>Menu</nav></header>
  <main><article>
    <h1>Short Article</h1>
    <p>This content is too short to pass the threshold.</p>
  </article></main>
  <aside>Related links</aside>
  <footer id="page-footer" role="contentinfo"><p>Copyright Info</p></footer>
</body></html>
"""

NO_MAIN_CONTENT_HTML = """
<html><head><title>No Main Content</title></head>
<body>
  <div class="header-class"><h1>Site Header</h1></div>
  <p>Some random text, but not enough.</p>
  <div class="footer-class"><p>Footer Text</p></div>
</body></html>
"""


def _classify(html, threshold=500):
    doc = parse_html(html)
    return classify_improved(doc, find_main_candidates(doc), threshold)


def test_classify_basic_html_is_article():
    assert _classify(BASIC_HTML, 100) == "article"


def test_classify_semantic_html_is_article():
    assert _classify(SEMANTIC_HTML, 100) == "article"


def test_classify_complex_html_is_article():
    assert _classify(COMPLEX_HTML) == "article"


def test_classify_short_text_is_other():
    assert _classify(SHORT_TEXT_HTML, 500) == "other"


def test_classify_short_article_with_structure_is_other():
    assert _classify(SHORT_ARTICLE_WITH_STRUCTURE_HTML, 500) == "other"


def test_classify_no_main_content_is_other():
    assert _classify(NO_MAIN_CONTENT_HTML, 500) == "other"
