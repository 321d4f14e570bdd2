"""ARIA tree tests (parity: src/nav/aria.ts, readableAria.ts, links.ts)."""

from readability_core.aria import (
    aria_tree_to_string,
    assign_weights,
    build_aria_node,
    build_aria_tree,
    calculate_node_weight,
    count_links,
    filter_nodes_by_weight,
    get_accessible_name,
    get_aria_node_type,
    get_aria_role,
    to_compact,
)
from readability_core.vdom import parse_html


def el_of(html: str):
    doc = parse_html(f"<body>{html}</body>")
    return doc.body.children[0]


def test_explicit_role_wins():
    assert get_aria_role(el_of('<div role="NAVIGATION">x</div>')) == "navigation"


def test_implicit_roles():
    assert get_aria_role(el_of('<a href="/x">l</a>')) == "link"
    assert get_aria_role(el_of("<a>l</a>")) == "generic"   # no href
    assert get_aria_role(el_of("<h3>h</h3>")) == "heading"
    assert get_aria_role(el_of('<input type="checkbox">')) == "checkbox"
    assert get_aria_role(el_of('<input type="search">')) == "searchbox"
    assert get_aria_role(el_of("<input>")) == "textbox"
    assert get_aria_role(el_of("<section>s</section>")) == "region"


def test_accessible_name_priority():
    assert get_accessible_name(
        el_of('<button aria-label="AL" title="T">text</button>')) == "AL"
    assert get_accessible_name(
        el_of('<img alt="Alt" title="T">')) == "Alt"
    assert get_accessible_name(el_of('<div title="T">x</div>')) == "T"
    assert get_accessible_name(el_of("<h1>Heading Text</h1>")) == "Heading Text"


def test_accessible_name_truncation():
    long = "x" * 60
    name = get_accessible_name(el_of(f"<a href='/'>{long}</a>"))
    assert name == "x" * 47 + "..."
    assert len(name) == 50


def test_generic_with_text_stays_generic():
    # parity with the reference's aria.ts:183 (`child.type` is undefined on
    # VNodes, so the text promotion never fires)
    assert get_aria_node_type(el_of("<div>some text</div>")) == "generic"


def test_build_node_states():
    n = build_aria_node(el_of('<input type="checkbox" checked>'))
    assert n["type"] == "checkbox" and n["checked"] is True
    n = build_aria_node(el_of('<div role="tab" aria-selected="true">T</div>'))
    assert n["selected"] is True
    n = build_aria_node(el_of('<button disabled>B</button>'))
    assert n["disabled"] is True
    n = build_aria_node(el_of(
        '<div role="slider" aria-valuemin="1" aria-valuemax="9"></div>'))
    assert n["valuemin"] == 1.0 and n["valuemax"] == 9.0


def test_invisible_children_skipped():
    n = build_aria_node(el_of(
        '<div><a href="/a" style="display: none">Hid</a>'
        '<a href="/b">Shown</a></div>'))
    kids = n.get("children", [])
    assert len(kids) == 1 and kids[0]["name"] == "Shown"


def test_compact_merges_single_generic_chain():
    # faithful trace: the nested generic divs merge (names concatenated),
    # body unwraps into them; the root-unwrap to <main> never fires because
    # it requires a "text"-typed root, a type that is dead at runtime
    # (aria.ts:183 quirk)
    doc = parse_html(
        "<body><div><div><main><p>content text</p></main></div></div></body>")
    root = build_aria_tree(doc)["root"]
    assert root["type"] == "generic"
    assert root["name"] == "content text content text"
    assert root["children"][0]["type"] == "main"


def test_compact_groups_listitems():
    doc = parse_html(
        "<body><main><ul><li>a</li><li>b</li><li>c</li></ul>"
        "<p>text here</p></main></body>")
    s = aria_tree_to_string(build_aria_tree(doc))
    assert "- list" in s and "listitem" in s


def test_tree_render_shapes():
    doc = parse_html(
        '<body><main><h2>Head</h2><a href="/x">Link</a>'
        '<img src="/i.png" alt="A"></main></body>')
    s = aria_tree_to_string(build_aria_tree(doc))
    assert '- heading "Head" [level=2]' in s
    assert '- link "Link" [href="/x"]' in s
    assert '[src="/i.png"] [alt="A"]' in s


def test_consecutive_links_merge():
    # faithful: consecutive same-type siblings merge into one node with
    # concatenated names (readableAria.ts:196-234)
    links = "".join(f'<a href="/l{i}">Link {i}</a>' for i in range(5))
    doc = parse_html(f"<body><nav>{links}</nav></body>")
    tree = build_aria_tree(doc)
    assert count_links(tree["root"]) == 1
    assert "Link 0 Link 1 Link 2 Link 3 Link 4" in aria_tree_to_string(tree)


def test_link_budget_filter():
    # interleave links with headings so consecutive-merge can't collapse them
    blocks = "".join(
        f'<h3>Head {i}</h3><a href="/l{i}">Link number {i}</a>'
        for i in range(80))
    doc = parse_html(f"<body><nav>{blocks}</nav></body>")
    tree = build_aria_tree(doc)
    assert count_links(tree["root"]) == 80
    s = aria_tree_to_string(tree, max_links=10)
    assert s.startswith("# 注")                 # filter notice header
    assert s.count("- link") <= 10


def test_weight_formula():
    node = {"type": "link", "role": "link", "name": "x"}
    w = calculate_node_weight(node, depth=0, index_in_parent=0, sibling_count=1)
    # (1*3 + 1*2 + 0.5 + 1.5 + 1.2) / 8
    assert abs(w - (3 + 2 + 0.5 + 1.5 + 1.2) / 8) < 1e-9


def test_filter_keeps_heaviest():
    tree = {"type": "generic", "role": "generic", "children": [
        {"type": "link", "role": "link", "name": "important main link"},
        {"type": "link", "role": "link"},
    ]}
    weighted = assign_weights(tree)
    out = filter_nodes_by_weight(weighted, 1)
    kids = out.get("children", [])
    assert len(kids) == 1 and kids[0].get("name") == "important main link"


def test_extract_includes_aria():
    from readability_core import extract
    r = extract("<html><body><main><h1>T</h1><p>%s</p></main></body></html>"
                % ("body text, with commas. " * 30))
    assert r["aria_node_count"] > 0
    assert "heading" in r["aria_tree"]
    r2 = extract("<html><body><p>x</p></body></html>", build_aria=False)
    assert r2["aria_tree"] == "" and r2["aria_node_count"] == 0
