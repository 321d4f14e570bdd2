"""Ported: /root/reference/src/format/markdown.test.ts (the FULL markdown
suite — tables, nested structures, backtick-run escaping, decorated code
blocks; markdown-basic.test.ts is ported separately in
test_reference_ported.py).
"""

from __future__ import annotations

import re

from readability_core.render import to_markdown
from readability_core.vdom import parse_html


def md(html: str) -> str:
    # the reference test converts parsed.body; wrap fragments explicitly
    return to_markdown(parse_html(f"<body>{html}</body>").body)


def norm_table(s: str) -> str:
    s = s.replace("| ", "|").replace(" |", "|")
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r"\n+", "\n", s)
    return s.strip()


def norm_quote(s: str) -> str:
    s = re.sub(r"\n{2,}", "\n", s)
    s = re.sub(r"^ +", "", s, flags=re.M)
    return s.strip()


def test_basic_html_to_markdown():
    html = """
      <h1>Title</h1>
      <p>This is a paragraph with <strong>bold</strong> and <em>italic</em> text.</p>
      <p>Another paragraph with a <a href="http://example.com">link</a>.</p>
    """
    assert md(html).strip() == (
        "# Title\n\nThis is a paragraph with **bold** and *italic* text."
        "\n\nAnother paragraph with a [link](http://example.com).")


def test_headings():
    html = "".join(f"<h{i}>H{i}</h{i}>" for i in range(1, 7))
    assert md(html).strip() == "\n\n".join(
        f"{'#' * i} H{i}" for i in range(1, 7))


def test_ul():
    html = "<ul><li>Item 1</li><li>Item 2</li><li>Item 3</li></ul>"
    assert md(html).strip() == "- Item 1\n- Item 2\n- Item 3"


def test_ol_uses_1_for_all_items():
    html = "<ol><li>First</li><li>Second</li><li>Third</li></ol>"
    assert md(html).strip() == "1. First\n1. Second\n1. Third"


def test_inline_code():
    assert md("<p>Use <code>const</code> for constants.</p>").strip() == \
        "Use `const` for constants."


def test_code_block():
    html = ('<pre><code>function greet() {\n  console.log("Hello");\n}'
            "</code></pre>")
    assert md(html).strip() == \
        '```\nfunction greet() {\n  console.log("Hello");\n}\n```'


def test_code_block_with_language():
    html = ('<pre><code class="language-javascript">function greet() {\n'
            '  console.log("Hello");\n}</code></pre>')
    assert md(html).strip() == (
        '```javascript\nfunction greet() {\n  console.log("Hello");\n}\n```')


def test_markdown_code_block_fence_escalation():
    html = ('<pre><code class="language-markdown"># タイトル\n\n'
            "これは **マークダウン** です。\n```javascript\n"
            "function example() {\n  return true;\n}\n```\n</code></pre>")
    assert md(html).strip() == (
        "````markdown\n# タイトル\n\nこれは **マークダウン** です。\n"
        "```javascript\nfunction example() {\n  return true;\n}\n```\n````")


def test_md_code_block_fence_escalation():
    html = ('<pre><code class="language-md"># タイトル\n\n'
            "これは **マークダウン** です。\n```\nコードブロック\n```\n"
            "</code></pre>")
    assert md(html).strip() == (
        "````md\n# タイトル\n\nこれは **マークダウン** です。\n"
        "```\nコードブロック\n```\n````")


def test_blockquote():
    assert md("<blockquote>This is a quote.</blockquote>").strip() == \
        "> This is a quote."


def test_image():
    assert md('<img src="image.png" alt="Alt text">').strip() == \
        "![Alt text](image.png)"


def test_hr():
    assert md("<hr>").strip() == "---"


def test_ignores_script_and_style():
    html = """
      <p>Content</p>
      <script>alert('ignored');</script>
      <style>.ignored { color: red; }</style>
      <p>More Content</p>
    """
    assert md(html).strip() == "Content\n\nMore Content"


def test_nested_ul():
    html = """
      <ul>
        <li>Item 1</li>
        <li>
          Item 2
          <ul>
            <li>Nested 2.1</li>
            <li>Nested 2.2</li>
          </ul>
        </li>
        <li>Item 3</li>
      </ul>
    """
    assert md(html).strip() == (
        "- Item 1\n- Item 2\n  - Nested 2.1\n  - Nested 2.2\n- Item 3")


def test_nested_ol():
    html = """
      <ol>
        <li>First</li>
        <li>
          Second
          <ol>
            <li>Nested 2.1</li>
            <li>Nested 2.2</li>
          </ol>
        </li>
        <li>Third</li>
      </ol>
    """
    assert md(html).strip() == (
        "1. First\n1. Second\n  1. Nested 2.1\n  1. Nested 2.2\n1. Third")


def test_escapes_markdown_specials():
    html = ("<p>This has *asterisks*, _underscores_, `backticks`, "
            "[brackets], and \\backslashes\\.</p>")
    assert md(html).strip() == (
        "This has \\*asterisks\\*, \\_underscores\\_, \\`backticks\\`, "
        "\\[brackets\\], and \\\\backslashes\\\\.")


def test_no_escaping_inside_code():
    html = """
      <p>Inline: <code>_*[]()</code></p>
      <pre><code>
      This *should* not be escaped.
      Neither _should_ [this].
      </code></pre>
    """
    assert md(html).strip() == (
        "Inline: `_*[]()`\n\n```\n      This *should* not be escaped."
        "\n      Neither _should_ [this].\n```")


def test_image_link_collapse():
    html = ('<a href="http://example.com">'
            '<img src="image.png" alt="Alt text"></a>')
    assert md(html).strip() == "[Alt text](http://example.com)"


def test_complex_inline_code_backtick_runs():
    html = ("<p>Code with backticks: <code>foo `bar` baz</code> and "
            "double: <code>foo ``bar`` baz</code>.</p>"
            "<p>Code starting/ending with backtick: <code>`start</code> "
            "and <code>end`</code>.</p>"
            "<p>Just backticks: <code>`</code> and <code>``</code></p>")
    assert md(html).strip() == (
        "Code with backticks: ``foo `bar` baz`` and double: "
        "```foo ``bar`` baz```.\n\n"
        "Code starting/ending with backtick: `` `start `` and `` end` ``."
        "\n\nJust backticks: `` ` `` and ``` `` ```")


def test_simple_table():
    html = """
      <table>
        <thead>
          <tr><th>Header 1</th><th>Header 2</th></tr>
        </thead>
        <tbody>
          <tr><td>Data 1</td><td>Data 2</td></tr>
          <tr><td>Data 3</td><td>Data 4 <strong>bold</strong></td></tr>
        </tbody>
      </table>
    """
    want = ("| Header 1 | Header 2 |\n|---|---|\n| Data 1 | Data 2 |\n"
            "| Data 3 | Data 4 **bold** |")
    assert norm_table(md(html)) == norm_table(want)


def test_table_without_thead():
    html = """
      <table>
        <tbody>
          <tr><td>Row 1, Cell 1</td><td>Row 1, Cell 2</td></tr>
          <tr><td>Row 2, Cell 1</td><td>Row 2, Cell 2</td></tr>
        </tbody>
      </table>
    """
    want = ("|---|---|\n| Row 1, Cell 1 | Row 1, Cell 2 |\n"
            "| Row 2, Cell 1 | Row 2, Cell 2 |")
    assert norm_table(md(html)) == norm_table(want)


def test_table_varying_columns_padded():
    html = """
      <table>
        <thead><tr><th>A</th><th>B</th><th>C</th></tr></thead>
        <tbody>
          <tr><td>1</td><td>2</td></tr>
          <tr><td>3</td><td>4</td><td>5</td></tr>
        </tbody>
      </table>
    """
    want = "| A | B | C |\n|---|---|---|\n| 1 | 2 |  |\n| 3 | 4 | 5 |"
    assert norm_table(md(html)) == norm_table(want)


def test_nested_blockquotes():
    html = """
      <blockquote>
        <p>Outer quote.</p>
        <blockquote>
          <p>Inner quote.</p>
        </blockquote>
        <p>Outer quote continued.</p>
      </blockquote>
    """
    want = "> Outer quote.\n>\n> > Inner quote.\n>\n> Outer quote continued."
    assert norm_quote(md(html)) == norm_quote(want)


def test_code_block_with_decorative_spans():
    html = ('<pre><code class="language-javascript">function '
            '<span class="keyword">greet</span>() {\n  console.'
            '<span class="method">log</span>(<span class="string">"Hello"'
            "</span>);\n}</code></pre>")
    assert md(html).strip() == (
        '```javascript\nfunction greet() {\n  console.log("Hello");\n}\n```')


def test_complex_syntax_highlighted_block():
    # markdown.test.ts:436-489 — prism-style token spans with a
    # "language-ts code-line" class; the language regex stops at the word
    html = (
        '<pre class="language-ts" data-has-button="true">'
        '<code class="language-ts code-line" data-line="49">'
        '<span class="token keyword">const</span> x '
        '<span class="token operator">=</span> '
        '<span class="token number">1</span><span class="token punctuation">'
        ";</span></code></pre>")
    assert md(html).strip() == "```ts\nconst x = 1;\n```"
