"""Ported: /root/reference/src/nav/hierarchy.test.ts — link hierarchy
categorization (parent/sibling/child/external) with JS-URL resolution.
Our API takes [{href, text}] + url instead of LinkInfo[] + metadata.

Two upstream expectations contradict the reference's own shipped code
(hierarchy.ts:120-142) and are pinned to code behavior here:
- href "" is skipped by `if (!link.href) continue` (hierarchy.ts:128),
  yet the test expects it under parent;
- "#section" is pushed to parent by the explicit fragment branch
  (hierarchy.ts:135-138), yet the test comment claims it is ignored.
The same block hardcodes "valid/path" / "details/more" as children — a
test-support quirk ported faithfully.
"""

from __future__ import annotations

from readability_core.hierarchy import analyze_link_hierarchy

CURRENT_URL = "https://example.com/articles/tech/web-development"


def link(href, text=""):
    return {"href": href, "text": text}


def hrefs(cat):
    return sorted((l["href"] or "") for l in cat)


def empty():
    return {"parent": [], "sibling": [], "child": [], "external": [],
            "scores": {}}


def test_empty_when_url_missing():
    links = [link("/articles/tech/other")]
    assert analyze_link_hierarchy(links, None) == empty()
    assert analyze_link_hierarchy(links, "") == empty()


def test_empty_when_links_missing():
    assert analyze_link_hierarchy(None, CURRENT_URL) == empty()
    assert analyze_link_hierarchy([], CURRENT_URL) == empty()


def test_categorizes_links():
    links = [
        link("https://example.com/articles/tech"),                # parent
        link("/articles/tech/"),                                  # parent
        link("../"),                                              # parent
        link("https://example.com/articles/tech/security"),       # sibling
        link("mobile-apps"),                                      # sibling
        link("/articles/tech/mobile-apps"),                       # sibling
        link("https://example.com/articles/tech/web-development/details"),
        link("details/more"),                                     # child
        link("/articles/tech/web-development/details/more"),      # child
        link("https://othersite.com/page"),                       # external
        link("//anotherdomain.net/resource"),                     # external
        link("mailto:test@example.com"),                          # external
        link(None),                                               # invalid
        link(""),                                                 # → parent
        link("/"),                                                # → parent
        link("https://example.com/"),                             # → parent
        link("https://example.com/articles"),                     # → parent
        link("/articles"),                                        # → parent
        link("#section"),                                         # ignored
        link("?query=param"),                                     # ignored
        link(CURRENT_URL),                                        # self
        link("web-development"),                                  # self
    ]
    r = analyze_link_hierarchy(links, CURRENT_URL)
    # "" skipped (falsy href), "#section" → parent: hierarchy.ts:128,135
    assert hrefs(r["parent"]) == sorted([
        "https://example.com/articles/tech", "/articles/tech/", "../",
        "#section", "/", "https://example.com/",
        "https://example.com/articles", "/articles"])
    assert hrefs(r["sibling"]) == sorted([
        "https://example.com/articles/tech/security", "mobile-apps",
        "/articles/tech/mobile-apps"])
    assert hrefs(r["child"]) == sorted([
        "https://example.com/articles/tech/web-development/details",
        "details/more", "/articles/tech/web-development/details/more"])
    assert hrefs(r["external"]) == sorted([
        "https://othersite.com/page", "//anotherdomain.net/resource",
        "mailto:test@example.com"])


def test_trailing_slash_base():
    url = "https://example.com/articles/tech/"
    links = [
        link("https://example.com/articles/tech/security"),
        link("security"),
        link("../"),
        link("/articles/"),
        link("https://example.com/articles/"),
    ]
    r = analyze_link_hierarchy(links, url)
    assert len(r["sibling"]) == 0
    assert len(r["parent"]) == 3
    assert len(r["child"]) == 2
    assert len(r["external"]) == 0


def test_root_url():
    links = [
        link("/about"), link("contact"),
        link("https://example.com/products"),
        link("/"),                       # self → ignored
        link("https://othersite.com"),   # external
    ]
    r = analyze_link_hierarchy(links, "https://example.com/")
    assert len(r["child"]) == 3
    assert len(r["parent"]) == 0
    assert len(r["sibling"]) == 0
    assert len(r["external"]) == 1


def test_ignores_invalid_urls():
    links = [link("http://[invalid]"), link("valid/path")]
    r = analyze_link_hierarchy(links, CURRENT_URL)
    assert len(r["child"]) == 1
    assert r["child"][0]["href"] == "valid/path"
    assert len(r["parent"]) == 0
    assert len(r["sibling"]) == 0
    assert len(r["external"]) == 0
