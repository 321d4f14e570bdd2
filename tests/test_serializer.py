"""Serializer round-trip tests (parity: src/serializer.ts)."""

import json

from readability_core.render import stringify, to_markdown
from readability_core.serializer import deserialize_tree, serialize_tree
from readability_core.vdom import parse_html


def test_roundtrip_preserves_tree_and_renders():
    doc = parse_html(
        '<body><div id="main" class="content"><h2>T</h2>'
        "<p>hello <b>world</b></p></div></body>")
    root = doc.body.children[0]
    s = serialize_tree(root, node_count=7, page_type="article",
                       metadata={"title": "T", "url": "https://x/y"})
    out = deserialize_tree(s)
    assert out["page_type"] == "article"
    assert out["metadata"]["title"] == "T"
    r2 = out["root"]
    assert r2.tag == "div" and r2.attrs["id"] == "main"
    # renderings are identical before and after the round-trip
    assert stringify(r2) == stringify(root)
    assert to_markdown(r2) == to_markdown(root)


def test_flat_encoding_shape():
    doc = parse_html("<body><p>x</p></body>")
    s = serialize_tree(doc.body)
    data = json.loads(s)
    assert data["rootId"] == 1
    nodes = data["nodes"]
    body = nodes["1"]
    assert body["tagName"] == "body" and body["parentId"] is None
    p = nodes[str(body["childrenIds"][0])]
    assert p["tagName"] == "p" and p["parentId"] == 1
    t = nodes[str(p["childrenIds"][0])]
    assert t["type"] == "text" and t["textContent"] == "x"


def test_candidates_and_scores_survive():
    doc = parse_html("<body><div><p>%s</p></div></body>"
                     % ("words, with commas. " * 20))
    from readability_core.scoring import find_main_candidates
    cands = find_main_candidates(doc)
    root = cands[0]
    s = serialize_tree(root, candidates=[{"element": c, "score": c.score}
                                         for c in cands])
    out = deserialize_tree(s)
    assert out["main_candidates"]
    assert out["main_candidates"][0]["score"] == cands[0].score
    # readability score travels on the node itself too
    assert out["root"].score == root.score


def test_parent_pointers_relinked():
    doc = parse_html("<body><div><p>x</p></div></body>")
    out = deserialize_tree(serialize_tree(doc.body))
    div = out["root"].children[0]
    p = div.children[0]
    assert p.parent is div and div.parent is out["root"]


def test_no_root():
    out = deserialize_tree(serialize_tree(None))
    assert out["root"] is None and out["main_candidates"] == []
