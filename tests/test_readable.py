"""Readable facade tests (parity: src/readable.ts, src/test/readability-core.test.ts)."""

from readability_core import Readable, deserialize_tree
from readability_core.render import to_markdown


ARTICLE_HTML = (
    '<html lang="en"><head><title>My Article</title></head><body>'
    "<article><h2>Heading</h2><p>%s</p>"
    '<a href="/related">related</a></article></body></html>'
    % ("Sentence with words, commas, and length. " * 25))


def test_facade_projections_consistent():
    r = Readable.from_html(ARTICLE_HTML, url="https://ex.com/a/b/c")
    assert r.page_type == "article"
    assert r.title == "My Article"
    assert r.to_text().startswith("Heading")
    assert r.to_markdown().startswith("## Heading")
    assert r.to_html().startswith("<article>")
    assert "heading" in r.aria_snapshot()


def test_serialize_roundtrip_matches_projection():
    r = Readable.from_html(ARTICLE_HTML)
    out = deserialize_tree(r.serialize())
    assert out["page_type"] == "article"
    assert to_markdown(out["root"]) == r.to_markdown()
    assert out["metadata"]["title"] == "My Article"


def test_link_hierarchy_from_snapshot():
    r = Readable.from_html(ARTICLE_HTML, url="https://ex.com/a/b/c")
    h = r.get_link_hierarchy()
    # '/related' is root-absolute → ['related'] diverges from ['a','b','c']
    # → parent by the fallback rule (hierarchy.ts:210-216)
    assert any(l["href"] == "/related" for l in h["parent"])


def test_ai_summary_counts():
    r = Readable.from_html(ARTICLE_HTML)
    s = r.ai_summary()
    assert s["page_type"] == "article"
    assert s["word_count"] > 100
    assert s["n_links"] == 1


def test_other_page_empty_projections():
    r = Readable.from_html("<body><p>tiny</p></body>")
    assert r.page_type == "other"
    assert r.to_text() == "" and r.to_markdown() == ""
