"""Link hierarchy tests (parity: src/nav/hierarchy.ts)."""

from readability_core.hierarchy import analyze_link_hierarchy


URL = "https://ex.com/a/b/c"


def lk(href, text=""):
    return {"href": href, "text": text}


def cat(analysis, href):
    for name in ("parent", "sibling", "child", "external"):
        if any(l["href"] == href for l in analysis[name]):
            return name
    return None


def test_categories():
    links = [
        lk("/a/b"),                 # prefix of current, shorter → parent
        lk("/a/b/c/d"),             # extends current → child
        lk("/a/b/x"),               # same parent, same depth → sibling
        lk("https://other.com/z"),  # different origin → external
        lk("#frag"),                # fragment → parent
        lk("?q=1"),                 # query-only → skipped
        lk("/a/b/c"),               # self → skipped
        lk("/"),                    # root → parent
        lk("/z/y/x"),               # diverging branch → parent (fallback)
    ]
    a = analyze_link_hierarchy(links, URL)
    assert cat(a, "/a/b") == "parent"
    assert cat(a, "/a/b/c/d") == "child"
    assert cat(a, "/a/b/x") == "sibling"
    assert cat(a, "https://other.com/z") == "external"
    assert cat(a, "#frag") == "parent"
    assert cat(a, "?q=1") is None
    assert cat(a, "/a/b/c") is None
    assert cat(a, "/") == "parent"
    assert cat(a, "/z/y/x") == "parent"


def test_relative_resolution():
    a = analyze_link_hierarchy([lk("d")], URL)
    # 'd' resolves to /a/b/d → sibling of /a/b/c
    assert cat(a, "d") == "sibling"


def test_hardcoded_test_hrefs():
    a = analyze_link_hierarchy([lk("valid/path"), lk("details/more")], URL)
    assert cat(a, "valid/path") == "child"
    assert a["scores"]["valid/path"] == 0.5


def test_missing_or_invalid_url():
    assert analyze_link_hierarchy([lk("/x")], None)["parent"] == []
    a = analyze_link_hierarchy([lk("/x")], "not a url at all")
    assert a == {"parent": [], "sibling": [], "child": [], "external": [],
                 "scores": {}}


def test_about_blank_base():
    # opaque base: absolute links are external, relative links skipped
    a = analyze_link_hierarchy(
        [lk("https://x.com/p"), lk("rel/path2")], "about:blank")
    assert cat(a, "https://x.com/p") == "external"
    assert cat(a, "rel/path2") is None


def test_aria_scores_join():
    links = [lk("/a/b/x", "Nice Link")]
    aria = {"role": "generic", "children": [
        {"role": "link", "name": "Nice Link"},
    ]}
    a = analyze_link_hierarchy(links, URL, aria)
    # depth 1, index 0 → 0.6*(1/2) + 0.4*1 = 0.7
    assert abs(a["scores"]["/a/b/x"] - 0.7) < 1e-9


def test_default_port_origin_equality():
    a = analyze_link_hierarchy([lk("https://ex.com:443/a/b/z")], URL)
    assert cat(a, "https://ex.com:443/a/b/z") == "sibling"
