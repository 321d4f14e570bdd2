"""src/test/readability-core.test.ts ported — the reference's e2e API suite."""

from readability_core import Readable, deserialize_tree
from readability_core.aria import build_aria_tree
from readability_core.extract import extract_full
from readability_core.preprocess import preprocess_document
from readability_core.render import to_html, to_markdown
from readability_core.vdom import parse_html

BASIC_ARTICLE_HTML = """
<!DOCTYPE html>
<html>
  <head>
    <title>Test Article - Sample Blog</title>
    <meta name="author" content="John Doe">
  </head>
  <body>
    <header><h1>My Blog</h1>
      <nav><a href="/">Home</a><a href="/about">About</a></nav>
    </header>
    <main>
      <article>
        <h1>Test Article Title</h1>
        <p class="byline">By John Doe | January 1, 2024</p>
        <p>This is the first paragraph of the article. It contains enough text to be considered meaningful content by the extraction algorithm.</p>
        <p>The second paragraph provides additional context and information. Having multiple paragraphs helps the algorithm identify this as the main content of the page.</p>
        <p>A third paragraph ensures that the content is substantial enough to be recognized as an article rather than a navigation page or other non-article content.</p>
      </article>
    </main>
    <footer><p>&copy; 2024 Sample Blog</p></footer>
  </body>
</html>
"""


def test_readable_extracts_article():
    doc = Readable.from_html(BASIC_ARTICLE_HTML)
    assert doc.page_type == "article"
    md = doc.to_markdown()
    assert "Test Article Title" in md
    assert "first paragraph" in md
    assert "second paragraph" in md


def test_readable_metadata():
    doc = Readable.from_html(BASIC_ARTICLE_HTML)
    assert doc.title == "Test Article - Sample Blog"
    assert doc.snapshot["site_name"] is None   # no og:site_name


def test_readable_serialize_load_roundtrip():
    doc = Readable.from_html(BASIC_ARTICLE_HTML)
    out = Readable.load(doc.serialize())
    assert out["page_type"] == "article"
    assert to_markdown(out["root"]) == doc.to_markdown()


NAVIGATION_PAGE_HTML = """
<!DOCTYPE html>
<html>
  <head><title>Product Listing</title></head>
  <body>
    <h1>Our Products</h1>
    <div class="products">
      <div class="product-card"><h2><a href="/product/1">Product 1</a></h2><p>Short description</p></div>
      <div class="product-card"><h2><a href="/product/2">Product 2</a></h2><p>Short description</p></div>
      <div class="product-card"><h2><a href="/product/3">Product 3</a></h2><p>Short description</p></div>
    </div>
  </body>
</html>
"""


def test_navigation_listing_is_other():
    assert Readable.from_html(NAVIGATION_PAGE_HTML).page_type == "other"


TEST_HTML = """
<html><body>
  <article>
    <h1>Article Title</h1>
    <p>This is a test article with some content that should be extracted by the readability algorithm.</p>
  </article>
</body></html>
"""


def test_extract_low_threshold():
    r, _d, root, _c = extract_full(TEST_HTML, char_threshold=50)
    assert root is not None
    # the reference test asserts metadata.title === "" but its own
    # getArticleTitle falls back to the single <h1> (extract.ts:496-500);
    # we pin the faithful behavior
    assert r["title"] == "Article Title"
    assert r["n_links"] == 0


def test_extract_aria_tree():
    doc = parse_html(TEST_HTML)
    preprocess_document(doc)
    tree = build_aria_tree(doc)
    assert tree["root"] is not None
    assert tree["node_count"] > 0


FORMATTED_CONTENT_HTML = """
<html><body>
  <article>
    <h1>Formatting Test</h1>
    <h2>Subheading</h2>
    <p>Regular paragraph with <strong>bold</strong> and <em>italic</em> text.</p>
    <ul><li>List item 1</li><li>List item 2</li></ul>
    <blockquote><p>This is a quote.</p></blockquote>
    <pre><code>const code = "example";</code></pre>
  </article>
</body></html>
"""


def test_formatting_to_markdown():
    _r, _d, root, _c = extract_full(FORMATTED_CONTENT_HTML, char_threshold=50)
    md = to_markdown(root)
    assert "# Formatting Test" in md
    assert "## Subheading" in md
    assert "**bold**" in md
    assert "*italic*" in md
    assert "- List item 1" in md
    assert "> This is a quote." in md
    assert "```" in md
    assert 'const code = "example";' in md


def test_formatting_to_html():
    _r, _d, root, _c = extract_full(FORMATTED_CONTENT_HTML, char_threshold=50)
    html = to_html(root)
    assert "<h1>Formatting Test</h1>" in html
    assert "<strong>bold</strong>" in html
    assert "<em>italic</em>" in html
    assert "<ul>" in html
    assert "<blockquote>" in html


def test_edge_cases():
    assert Readable.from_html("<html><body></body></html>").page_type == "other"
    assert Readable.from_html("<p>Unclosed paragraph").snapshot is not None
    assert Readable.from_html("<div><p>Just a fragment</p></div>").snapshot \
        is not None


HTML_WITH_LINKS = """
<html>
  <head><meta property="og:url" content="https://example.com/articles/test"></head>
  <body>
    <nav>
      <a href="/">Home</a>
      <a href="/articles">Articles</a>
      <a href="/articles/test">Current Page</a>
    </nav>
    <article>
      <h1>Test Article</h1>
      <p>Content with <a href="/articles/test/section1">internal link</a> and
         <a href="https://external.com">external link</a>.</p>
    </article>
  </body>
</html>
"""


def test_link_hierarchy_analysis():
    # The reference test relies on the page URL; with the default
    # about:blank base all relative links are unresolvable (Node's URL
    # throws), so we pass the og:url the fixture clearly intends.
    doc = Readable.from_html(HTML_WITH_LINKS,
                             url="https://example.com/articles/test")
    h = doc.get_link_hierarchy()
    # the reference test also expects parent > 0, but preprocess removes
    # <nav> BEFORE link extraction (preprocess.ts:11-33), so only the
    # article's links survive — faithful behavior pinned here
    assert len(h["parent"]) == 0
    assert len(h["external"]) > 0        # external.com
    assert len(h["child"]) > 0           # /articles/test/section1


def test_character_threshold():
    short = "<html><body><article><h1>Short</h1><p>Too short.</p></article></body></html>"
    long_html = ("<html><body><article><h1>Long Article</h1><p>"
                 + "This is a long paragraph. " * 50
                 + "</p></article></body></html>")
    assert Readable.from_html(short, char_threshold=500).page_type == "other"
    assert Readable.from_html(long_html, char_threshold=100).page_type == "article"
