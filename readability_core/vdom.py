"""Virtual DOM: node types + lenient HTML parser.

Reimplements, from public behavior only, the data model and parser semantics
of the reference extraction library (reference: /root/reference/src/types.ts:21-45,
/root/reference/src/parsers/htmlparser2.ts:18-132):

- A ``VDocument`` always owns a pre-created ``documentElement`` (<html>) and
  ``body`` (<body>).  An explicit ``<html>``/``<body>`` tag in the input only
  merges attributes onto these pre-created nodes; the body is attached to the
  documentElement the first time a ``<body>`` open tag is seen.  Content that
  appears when no ``<body>`` was opened hangs directly off the documentElement
  (fragment inputs therefore have an *empty* body — matching the reference).
- Tag and attribute names are lowercased; the first occurrence of a duplicated
  attribute wins; bare attributes get value ``""``.
- Lenient recovery mirrors htmlparser2's public behavior: implied end tags
  (``<p>`` closes ``<p>``, ``<li>`` closes ``<li>``, table-section rules, …),
  void elements never take children, a stray ``</p>`` synthesizes an empty
  paragraph, ``</br>`` acts like ``<br>``, and self-closing syntax on non-void
  tags is ignored (children nest inside).

The tree is plain Python objects with ``__slots__`` — it exists only inside a
pandas-UDF batch on the Spark side; Spark never sees node objects.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Optional, Union


class VText:
    __slots__ = ("text", "parent")
    nodeType = "text"

    def __init__(self, text: str, parent: Optional["VElement"] = None):
        self.text = text
        self.parent = parent

    def __repr__(self) -> str:  # pragma: no cover
        return f"VText({self.text[:30]!r})"


class VElement:
    __slots__ = ("tag", "attrs", "children", "parent", "score", "txt_cache",
                 "norm_cache")
    nodeType = "element"

    def __init__(self, tag: str, attrs: Optional[dict] = None,
                 parent: Optional["VElement"] = None):
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.children: list[VNode] = []
        self.parent = parent
        # readability.contentScore slot; None = not initialized
        self.score: Optional[float] = None
        # memoized inner text (raw + whitespace-normalized) — valid only
        # while the tree is immutable; preprocess invalidates
        self.txt_cache: Optional[str] = None
        self.norm_cache: Optional[str] = None

    @property
    def class_name(self) -> str:
        return self.attrs.get("class", "")

    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    def __repr__(self) -> str:  # pragma: no cover
        return f"VElement(<{self.tag}> {len(self.children)} children)"


VNode = Union[VElement, VText]


class VDocument:
    __slots__ = ("document_element", "body", "base_uri", "document_uri",
                 "depth_capped")

    def __init__(self, base_uri: str = "about:blank"):
        self.document_element = VElement("html")
        self.body = VElement("body", parent=self.document_element)
        self.base_uri = base_uri
        self.document_uri = base_uri
        # set when the parser refused to nest deeper than MAX_DOM_DEPTH
        self.depth_capped = False


# --- lenient-recovery tables (public htmlparser2 behavior) -----------------

# maximum element nesting the parser will build; real pages are < 100 deep,
# and the recursive renderers need a hard bound to be executor-safe
MAX_DOM_DEPTH = 512

VOID_ELEMENTS = frozenset(
    "area base basefont br col command embed frame hr img input isindex "
    "keygen link menuitem meta param source track wbr".split()
)

_FORM_TAGS = frozenset(
    "input option optgroup select button datalist textarea".split()
)
_P_CLOSERS = frozenset(["p"])

OPEN_IMPLIES_CLOSE: dict[str, frozenset] = {
    "tr": frozenset(["tr", "th", "td"]),
    "th": frozenset(["th"]),
    "td": frozenset(["thead", "th", "td"]),
    "body": frozenset(["head", "link", "script"]),
    "li": frozenset(["li"]),
    "p": _P_CLOSERS,
    "h1": _P_CLOSERS, "h2": _P_CLOSERS, "h3": _P_CLOSERS,
    "h4": _P_CLOSERS, "h5": _P_CLOSERS, "h6": _P_CLOSERS,
    "select": _FORM_TAGS, "input": _FORM_TAGS, "output": _FORM_TAGS,
    "button": _FORM_TAGS, "datalist": _FORM_TAGS, "textarea": _FORM_TAGS,
    "option": frozenset(["option"]),
    "optgroup": frozenset(["optgroup", "option"]),
    "dd": frozenset(["dt", "dd"]),
    "dt": frozenset(["dt", "dd"]),
    "rt": frozenset(["rt", "rp"]),
    "rp": frozenset(["rt", "rp"]),
    "tbody": frozenset(["thead", "tbody"]),
    "tfoot": frozenset(["thead", "tbody"]),
}
for _t in ("address article aside blockquote details div dl fieldset "
           "figcaption figure footer form header hr main nav ol pre "
           "section table ul").split():
    OPEN_IMPLIES_CLOSE[_t] = _P_CLOSERS


class _TreeBuilder(HTMLParser):
    """Streaming tokenizer → VDocument tree, with htmlparser2-style recovery."""

    def __init__(self, doc: VDocument):
        super().__init__(convert_charrefs=True)
        self.doc = doc
        self.current: VElement = doc.document_element
        self.body_found = False
        self.html_found = False
        # stack of open element tag names (excluding html/body sentinels)
        self.stack: list[VElement] = []

    def updatepos(self, i: int, j: int) -> int:
        # html.parser counts newlines on every token boundary to serve
        # getpos(), which this builder never reads — ~5% of parse time on
        # fixture pages.  Contract: goahead resumes from the returned j.
        return j

    # -- open ---------------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list) -> None:
        self._open(tag, attrs)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        # self-closing syntax: honored only for void elements (htmlparser2
        # default recognizeSelfClosing=false); non-void stays open
        self._open(tag, attrs)

    def _open(self, tag: str, attrs: list) -> None:
        doc = self.doc
        # implied end tags
        closers = OPEN_IMPLIES_CLOSE.get(tag)
        if closers is not None:
            while self.stack and self.stack[-1].tag in closers:
                self._close_top()

        if tag in ("html", "body"):
            el = doc.document_element if tag == "html" else doc.body
            seen = set()
            for k, v in attrs:  # first occurrence in THIS tag wins,
                if k in seen:   # but overwrites attrs from an earlier tag
                    continue
                seen.add(k)
                el.attrs[k] = v if v is not None else ""
        if tag == "html":
            self.html_found = True
            self.current = doc.document_element
            return
        if tag == "body":
            el = doc.body
            if not self.body_found:
                doc.document_element.children.append(doc.body)
                self.body_found = True
            self.current = el
            return

        # first occurrence wins AND insertion order must match document
        # order (attr order is serialized — a reversed comprehension breaks
        # golden hashes)
        amap: dict = {}
        for k, v in attrs:
            if k not in amap:
                amap[k] = v if v is not None else ""
        el = VElement(tag, amap, parent=self.current)
        self.current.children.append(el)
        if tag not in VOID_ELEMENTS:
            if len(self.stack) >= MAX_DOM_DEPTH:
                # refuse to nest deeper: adversarial 10^5-deep DOMs would
                # otherwise blow the recursive renderers; further children
                # attach at the cap level (flattened), flagged on the doc
                self.doc.depth_capped = True
                return
            self.current = el
            self.stack.append(el)

    # -- text ---------------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if data:
            self.current.children.append(VText(data, parent=self.current))

    # -- close --------------------------------------------------------------
    def _close_top(self) -> None:
        el = self.stack.pop()
        parent = el.parent
        self.current = parent if parent is not None else self.doc.document_element

    def handle_endtag(self, tag: str) -> None:
        # htmlparser2's Parser emits close events only for MATCHED tags —
        # a stray </html> or </body> with no corresponding open tag is
        # ignored, never an unwind-everything (which would reattach all
        # following content to the documentElement)
        if tag == "html":
            if not self.html_found:
                return
            # unwind everything; html close returns to documentElement
            while self.stack:
                self._close_top()
            self.current = self.doc.document_element
            return
        if tag == "body":
            if not self.body_found:
                return
            while self.stack:
                self._close_top()
            self.current = self.doc.document_element
            return
        if tag in VOID_ELEMENTS:
            if tag == "br":
                # </br> acts like <br>
                self.current.children.append(
                    VElement("br", {}, parent=self.current))
            return
        # find matching open tag in stack
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                while len(self.stack) > i:
                    self._close_top()
                return
        if tag == "p":
            # stray </p> synthesizes an empty paragraph
            self.current.children.append(VElement("p", {}, parent=self.current))

    # ignore comments / decls / PIs entirely (they produce no nodes)
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def unknown_decl(self, data: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass


def parse_html(html: str, base_uri: str = "about:blank") -> VDocument:
    """Parse HTML into a VDocument (reference: src/parsers/htmlparser2.ts:18-132).

    Uses the fused single-pass tokenizer (htmltok.build_tree); the
    html.parser-driven builder below is kept as ``parse_html_stdlib`` and
    the two are asserted tree-equal by tests/test_tokenizer_diff.py."""
    from .htmltok import build_tree
    doc = VDocument(base_uri)
    try:
        build_tree(html, doc)
    except Exception:
        # lenient: keep whatever tree was built before the tokenizer choked
        pass
    return doc


def parse_html_stdlib(html: str, base_uri: str = "about:blank") -> VDocument:
    """Reference implementation of :func:`parse_html` driven by CPython's
    html.parser.  Kept solely as the differential-canary oracle — a stdlib
    contract change OR a fast-tokenizer bug fails the diff suite loudly."""
    doc = VDocument(base_uri)
    builder = _TreeBuilder(doc)
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # lenient: keep whatever tree was built before the tokenizer choked
        pass
    return doc


# --- serialization ----------------------------------------------------------

SELF_CLOSING_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)


def serialize_to_html(node: VNode) -> str:
    """VDOM → HTML string (reference: src/parsers/htmlparser2.ts:140-181).

    Attribute values are emitted RAW: the reference's quote handling is
    `value.replace(/"/g, '"')` (htmlparser2.ts:167) — a no-op replacing a
    quote with a quote — and text nodes are raw too.  Quirk preserved per
    invariant 4 (escaped serialization lives in render.to_html, which
    mirrors format.ts's escapeHTML)."""
    if node.nodeType == "text":
        return node.text
    attrs = " ".join(
        f'{k}="{v}"' for k, v in node.attrs.items()
    )
    astr = f" {attrs}" if attrs else ""
    if node.tag in SELF_CLOSING_TAGS and not node.children:
        return f"<{node.tag}{astr}/>"
    inner = "".join(serialize_to_html(c) for c in node.children)
    return f"<{node.tag}{astr}>{inner}</{node.tag}>"
