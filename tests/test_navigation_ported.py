"""src/test/navigation-detection.test.ts ported verbatim (12 cases)."""

from readability_core.detect import analyze_page_structure

HTML_WITH_NAV = """
<!DOCTYPE html>
<html>
  <head><title>Navigation Test</title></head>
  <body>
    <header>
      <nav class="main-nav" aria-label="Main navigation"><ul>
        <li><a href="/">Home</a></li>
        <li><a href="/about">About</a></li>
        <li><a href="/products">Products</a></li>
        <li><a href="/contact">Contact</a></li>
      </ul></nav>
    </header>
    <main><h1>Page Content</h1><p>This is the main content.</p></main>
  </body>
</html>
"""


def test_detect_main_navigation():
    s = analyze_page_structure(HTML_WITH_NAV)
    assert len(s["navigations"]) > 0
    assert s["mainNavigation"] is not None
    assert s["mainNavigation"]["type"] == "global"
    assert len(s["mainNavigation"]["items"]) == 4


def test_extract_navigation_items():
    nav = analyze_page_structure(HTML_WITH_NAV)["mainNavigation"]
    assert nav["items"][0]["label"] == "Home"
    assert nav["items"][0]["href"] == "/"
    assert nav["items"][1]["label"] == "About"
    assert nav["items"][1]["href"] == "/about"


BREADCRUMB_HTML = """
<html><body>
  <nav aria-label="Breadcrumb"><ol>
    <li><a href="/">Home</a></li>
    <li><a href="/products">Products</a></li>
    <li>Current Item</li>
  </ol></nav>
</body></html>
"""

PAGINATION_HTML = """
<html><body>
  <nav class="pagination">
    <a href="/page/1">Previous</a><a href="/page/1">1</a>
    <span>2</span><a href="/page/3">3</a><a href="/page/3">Next</a>
  </nav>
</body></html>
"""

TOC_HTML = """
<html><body>
  <nav class="toc"><h2>Table of Contents</h2><ul>
    <li><a href="#section1">Section 1</a></li>
    <li><a href="#section2">Section 2</a></li>
    <li><a href="#section3">Section 3</a></li>
  </ul></nav>
</body></html>
"""


def test_detect_breadcrumb():
    s = analyze_page_structure(BREADCRUMB_HTML)
    assert s["breadcrumb"] is not None
    assert s["breadcrumb"]["type"] == "breadcrumb"
    assert len(s["breadcrumb"]["items"]) == 3


def test_detect_pagination():
    s = analyze_page_structure(PAGINATION_HTML)
    pagination = next(
        (n for n in s["navigations"] if n["type"] == "pagination"), None)
    assert pagination is not None
    assert len(pagination["items"]) > 0


def test_detect_toc():
    s = analyze_page_structure(TOC_HTML)
    assert s["toc"] is not None
    assert s["toc"]["type"] == "toc"
    assert all((i.get("href") or "").startswith("#")
               for i in s["toc"]["items"])


MULTI_LOCATION_HTML = """
<html><body>
  <header><nav class="header-nav"><a href="/">Home</a><a href="/about">About</a></nav></header>
  <aside><nav class="sidebar-nav"><h3>Categories</h3><ul>
    <li><a href="/cat/1">Category 1</a></li>
    <li><a href="/cat/2">Category 2</a></li>
  </ul></nav></aside>
  <footer><nav class="footer-nav"><a href="/privacy">Privacy</a><a href="/terms">Terms</a></nav></footer>
</body></html>
"""


def test_navigation_locations():
    s = analyze_page_structure(MULTI_LOCATION_HTML)
    locations = {n["location"] for n in s["navigations"]}
    assert "header" in locations
    assert "sidebar" in locations
    assert "footer" in locations


NESTED_NAV_HTML = """
<html><body>
  <nav><ul>
    <li><a href="/products">Products</a>
      <ul>
        <li><a href="/products/software">Software</a></li>
        <li><a href="/products/hardware">Hardware</a></li>
      </ul>
    </li>
    <li><a href="/services">Services</a>
      <ul>
        <li><a href="/services/consulting">Consulting</a></li>
        <li><a href="/services/support">Support</a></li>
      </ul>
    </li>
  </ul></nav>
</body></html>
"""


def test_nested_navigation():
    s = analyze_page_structure(NESTED_NAV_HTML)
    nav = s["navigations"][0]
    assert nav["structure"] == "nested"
    products = next(i for i in nav["items"] if i["label"] == "Products")
    assert products.get("children")
    assert len(products["children"]) == 2


HEADER_HTML = """
<html><body>
  <header class="site-header">
    <img src="/logo.png" alt="Company Logo" class="logo">
    <h1>Company Name</h1>
    <nav><a href="/">Home</a><a href="/about">About</a></nav>
  </header>
  <article>
    <header><h1>Article Title</h1><p>Published on January 1, 2024</p></header>
    <p>Article content...</p>
  </article>
</body></html>
"""


def test_detect_headers():
    s = analyze_page_structure(HEADER_HTML)
    assert len(s["headers"]) > 0
    assert s["mainHeader"] is not None
    assert s["mainHeader"]["type"] == "main"


def test_detect_logo_and_site_title():
    mh = analyze_page_structure(HEADER_HTML)["mainHeader"]
    assert "logo" in mh["contains"]
    assert "siteTitle" in mh["contains"]
    assert "navigation" in mh["contains"]


FULL_PAGE_HTML = """
<html><body>
  <header><h1>Site Title</h1><nav><a href="/">Home</a></nav></header>
  <main><article><h1>Main Article</h1><p>Main content goes here.</p></article></main>
  <aside><h2>Sidebar</h2><p>Sidebar content.</p></aside>
  <footer><p>Footer content.</p></footer>
</body></html>
"""


def test_all_page_structure_elements():
    s = analyze_page_structure(FULL_PAGE_HTML)
    assert s["mainContent"] is not None
    assert s["sidebar"] is not None
    assert s["footer"] is not None


COMPLEX_NAV_HTML = """
<html><body>
  <header>
    <nav><a href="/">Home</a></nav>
    <nav><a href="/search">Search</a></nav>
  </header>
  <nav><a href="/cat1">Category 1</a></nav>
  <nav><a href="/cat2">Category 2</a></nav>
  <nav><a href="/cat3">Category 3</a></nav>
  <footer><nav><a href="/about">About</a></nav></footer>
</body></html>
"""


def test_max_navigations_option():
    s = analyze_page_structure(COMPLEX_NAV_HTML, max_navigations=3)
    assert len(s["navigations"]) <= 3


def test_header_navigation_only_option():
    s = analyze_page_structure(COMPLEX_NAV_HTML, header_navigation_only=True)
    assert all(n["location"] == "header" for n in s["navigations"])
