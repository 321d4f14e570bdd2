"""Parser semantics tests (reference parity: src/parsers/htmlparser2.ts)."""

from readability_core.vdom import parse_html, serialize_to_html


def tags(children):
    return [c.tag for c in children if c.nodeType == "element"]


def test_basic_structure():
    d = parse_html("<html><head><title>T</title></head><body><p>x</p></body></html>")
    assert tags(d.document_element.children) == ["head", "body"]
    assert tags(d.body.children) == ["p"]


def test_fragment_without_body_leaves_body_empty():
    # matches reference: content without <body> hangs off documentElement
    d = parse_html("<p>hello</p>")
    assert d.body.children == []
    assert tags(d.document_element.children) == ["p"]


def test_body_attrs_merged():
    d = parse_html('<body class="c" id="i"><p>x</p></body>')
    assert d.body.attrs["class"] == "c"
    assert d.body.attrs["id"] == "i"


def test_implied_p_close():
    d = parse_html("<body><p>one<p>two</body>")
    assert tags(d.body.children) == ["p", "p"]


def test_implied_li_close():
    d = parse_html("<body><ul><li>a<li>b</ul></body>")
    ul = d.body.children[0]
    assert tags(ul.children) == ["li", "li"]


def test_div_closes_p():
    d = parse_html("<body><p>text<div>block</div></body>")
    assert tags(d.body.children) == ["p", "div"]


def test_void_elements_take_no_children():
    d = parse_html("<body><p>a<br>b<img src='x'>c</p></body>")
    p = d.body.children[0]
    assert tags(p.children) == ["br", "img"]
    texts = [c.text for c in p.children if c.nodeType == "text"]
    assert texts == ["a", "b", "c"]


def test_duplicate_attribute_first_wins():
    d = parse_html('<body><div id="first" id="second">x</div></body>')
    assert d.body.children[0].attrs["id"] == "first"


def test_bare_attribute_empty_string():
    d = parse_html("<body><div hidden>x</div></body>")
    assert d.body.children[0].attrs["hidden"] == ""


def test_entities_decoded():
    d = parse_html("<body><p>a &amp; b &lt;c&gt;</p></body>")
    assert d.body.children[0].children[0].text == "a & b <c>"


def test_stray_close_p_synthesizes_paragraph():
    d = parse_html("<body><div>x</p></div></body>")
    div = d.body.children[0]
    assert tags(div.children) == ["p"]


def test_close_br_acts_like_br():
    d = parse_html("<body><p>a</br>b</p></body>")
    p = d.body.children[0]
    assert tags(p.children) == ["br"]


def test_script_content_not_parsed_as_tags():
    d = parse_html("<body><script>if (a < b) { x('<div>') }</script><p>x</p></body>")
    assert tags(d.body.children) == ["script", "p"]


def test_comments_ignored():
    d = parse_html("<body><!-- <p>no</p> --><p>yes</p></body>")
    assert tags(d.body.children) == ["p"]
    assert len(tags(d.body.children)) == 1


def test_unclosed_tags_recovered():
    d = parse_html("<body><div><p>unclosed")
    div = d.body.children[0]
    assert div.tag == "div"
    assert tags(div.children) == ["p"]


def test_serialize_roundtrip_basic():
    d = parse_html("<body><p id='a'>x<br/>y</p></body>")
    html = serialize_to_html(d.body)
    assert html == '<body><p id="a">x<br/>y</p></body>'


def test_tag_and_attr_lowercased():
    d = parse_html("<body><DIV CLASS='c'>x</DIV></body>")
    el = d.body.children[0]
    assert el.tag == "div"
    assert el.attrs["class"] == "c"
