"""Golden tests for the markdown renderer (parity: src/format/markdown.ts)
and the plain-text stringifier (src/format/format.ts)."""

from readability_core.render import format_document, stringify, to_html, to_markdown
from readability_core.vdom import parse_html


def md(html: str) -> str:
    doc = parse_html(f"<body>{html}</body>")
    return to_markdown(doc.body)


def txt(html: str) -> str:
    doc = parse_html(f"<body>{html}</body>")
    return format_document(stringify(doc.body))


def test_headings():
    assert md("<h1>One</h1><h2>Two</h2><h6>Six</h6>") == "# One\n\n## Two\n\n###### Six"


def test_paragraph_and_emphasis():
    # the joiner suppresses the space before leading punctuation (markdown.ts:47)
    assert md("<p>plain <strong>bold</strong> and <em>italic</em>.</p>") == \
        "plain **bold** and *italic*."


def test_escape_markdown_specials():
    assert md("<p>a*b_c[d]e</p>") == r"a\*b\_c\[d\]e"


def test_inline_code_backtick_escalation():
    assert md("<p><code>x = 1</code></p>") == "`x = 1`"
    assert md("<p><code>a ` b</code></p>") == "``a ` b``"


def test_pre_code_block_with_language():
    out = md('<pre><code class="language-python">def f():\n    pass</code></pre>')
    assert out == "```python\ndef f():\n    pass\n```"


def test_pre_code_markdown_fence_escalation():
    out = md('<pre><code class="language-markdown"># t\n```js\nx\n```</code></pre>')
    assert out.startswith("````markdown\n") and out.endswith("\n````")


def test_blockquote():
    assert md("<blockquote><p>quoted text</p></blockquote>") == "> quoted text"


def test_unordered_list():
    assert md("<ul><li>a</li><li>b</li></ul>") == "- a\n- b"


def test_ordered_list():
    assert md("<ol><li>a</li><li>b</li></ol>") == "1. a\n1. b"


def test_nested_list_indentation():
    out = md("<ul><li>top<ul><li>nested</li></ul></li></ul>")
    assert out == "- top\n  - nested"


def test_link():
    assert md('<p><a href="/x">text</a></p>') == "[text](/x)"


def test_image_and_image_link():
    assert md('<p><img src="/i.png" alt="Alt"></p>') == "![Alt](/i.png)"
    assert md('<p><a href="/x"><img src="/i.png" alt="Alt"></a></p>') == "[Alt](/x)"
    assert md('<p><a href="/x"><img src="/i.png"></a></p>') == "[/i.png](/x)"


def test_img_title():
    assert md('<p><img src="/i.png" alt="A" title="T"></p>') == '![A](/i.png "T")'


def test_hr_and_br():
    # faithful quirk: br renders "  \n" but joinMarkdownParts drops
    # whitespace-only parts (markdown.ts:32), so a br between words is eaten
    assert md("<p>a<br>b</p>") == "a b"
    assert md("<p>x</p><hr><p>y</p>") == "x\n\n---\n\ny"


def test_table():
    out = md("<table><thead><tr><th>H1</th><th>H2</th></tr></thead>"
             "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>")
    assert out == "| H1 | H2 |\n| --- | --- |\n| a | b |"


def test_table_without_thead():
    out = md("<table><tr><td>a</td><td>b</td></tr></table>")
    assert out == "| --- | --- |\n| a | b |"


def test_ignored_tags():
    assert md("<p>keep</p><script>x</script><nav>n</nav><svg>s</svg>") == "keep"


def test_smart_spacing_no_space_before_punctuation():
    assert md("<p><a href='/x'>link</a>, and more</p>") == "[link](/x), and more"


def test_block_spacing_collapsed():
    out = md("<div><p>a</p></div><div><p>b</p></div>")
    assert out == "a\n\nb"


# --- stringify ---------------------------------------------------------------

def test_stringify_blocks():
    assert txt("<p>one</p><p>two</p>") == "one\ntwo"


def test_stringify_br_hr():
    # "a " + "\n" + "b": only the final trailing space is removed
    # (format.ts:174-185)
    assert txt("<p>a<br>b</p>") == "a \nb"
    assert txt("<p>a</p><hr><p>b</p>") == "a\n----------\nb"


def test_stringify_inline_join():
    # faithful quirk: each element strips its own trailing space and text
    # nodes are trimmed, so the gap after an inline element is lost
    # (format.ts:171-185)
    assert txt("<p>one <b>two</b> three</p>") == "one twothree"


def test_to_html_drops_span_and_class():
    doc = parse_html('<body><div class="c"><span>a</span>b</div></body>')
    assert to_html(doc.body) == "<body><div>ab</div></body>"


def test_to_html_escapes():
    doc = parse_html("<body><p>a &amp; b</p></body>")
    assert to_html(doc.body) == "<body><p>a &amp; b</p></body>"
