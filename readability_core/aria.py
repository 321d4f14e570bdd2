"""ARIA accessibility tree: build, compact, weight, render.

Reimplements the reference's ARIA pipeline:
- role / accessible-name / node-type resolution
  (/root/reference/src/nav/aria.ts:16-188)
- recursive AriaNode build with state attributes (aria.ts:193-296)
- tree compaction: drop empty text, merge single children, hoist generics,
  group consecutive article/section/listitem/img, flatten same-type nesting
  (/root/reference/src/nav/readableAria.ts:81-339)
- link weighting + greedy budget filter
  (/root/reference/src/nav/links.ts:12-159)
- YAML-ish snapshot rendering (readableAria.ts:359-734)

AriaNode is a plain dict: {type, role, el, name?, level?, checked?,
selected?, expanded?, disabled?, required?, valuemin?, valuemax?,
valuetext?, children?, weight?}.

Quirk preserved: aria.ts:183 tests ``child.type === "text"`` on VNode
children, which only carry ``nodeType`` — the expression is always false at
runtime, so the generic-with-text → "text" promotion never fires; the
text-specific compaction rules are therefore dead paths in the reference
too, and stay dead here.
"""

from __future__ import annotations

import math
import re
from typing import Any, Optional

from .dom import get_attribute, get_inner_text, is_probably_visible
from .vdom import VDocument, VElement

AriaNode = dict  # {type, role, el, name?, level?, ..., children?}

_NAME_FROM_CONTENT = frozenset(
    ["a", "button", "h1", "h2", "h3", "h4", "h5", "h6", "label", "li"])

_ROLE_TO_TYPE = {
    "banner": "banner", "complementary": "complementary",
    "contentinfo": "contentinfo", "form": "form", "main": "main",
    "navigation": "navigation", "region": "region", "search": "search",
    "article": "article", "button": "button", "cell": "cell",
    "checkbox": "checkbox", "columnheader": "columnheader",
    "combobox": "combobox", "dialog": "dialog", "figure": "figure",
    "grid": "grid", "gridcell": "gridcell", "heading": "heading",
    "img": "img", "link": "link", "list": "list", "listitem": "listitem",
    "menuitem": "menuitem", "option": "option",
    "progressbar": "progressbar", "radio": "radio",
    "radiogroup": "radiogroup", "row": "row", "rowgroup": "rowgroup",
    "rowheader": "rowheader", "searchbox": "searchbox",
    "separator": "separator", "slider": "slider", "spinbutton": "spinbutton",
    "switch": "switch", "tab": "tab", "table": "table", "tablist": "tablist",
    "tabpanel": "tabpanel", "textbox": "textbox",
}

_IMPLICIT_ROLES = {
    "article": "article", "aside": "complementary", "body": "generic",
    "button": "button", "footer": "contentinfo", "form": "form",
    "h1": "heading", "h2": "heading", "h3": "heading", "h4": "heading",
    "h5": "heading", "h6": "heading", "header": "banner", "img": "img",
    "li": "listitem", "main": "main", "nav": "navigation", "ol": "list",
    "option": "option", "progress": "progressbar", "section": "region",
    "select": "combobox", "table": "table", "textarea": "textbox",
    "ul": "list",
}

_RE_FLOAT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


def _js_parse_float(s: str) -> float:
    """JS parseFloat: leading-prefix parse, NaN on failure."""
    m = _RE_FLOAT.match(s.strip())
    return float(m.group(0)) if m else math.nan


def get_aria_role(el: VElement) -> str:
    """aria.ts:16-72 — explicit role attr else implicit tag mapping."""
    explicit = get_attribute(el, "role")
    if explicit:
        return explicit.lower()
    tag = el.tag
    if tag == "a":
        return "link" if el.attrs.get("href") else "generic"
    if tag == "input":
        itype = (el.attrs.get("type") or "text").lower()
        return {"checkbox": "checkbox", "radio": "radio",
                "button": "button", "search": "searchbox"}.get(
                    itype, "textbox")
    return _IMPLICIT_ROLES.get(tag, "generic")


def get_accessible_name(el: VElement) -> Optional[str]:
    """aria.ts:78-129 — aria-label → alt(img) → title → content → short p/div."""
    aria_label = get_attribute(el, "aria-label")
    if aria_label:
        return aria_label
    alt = get_attribute(el, "alt")
    if alt and el.tag == "img":
        return alt
    title = get_attribute(el, "title")
    if title:
        return title
    if el.tag in _NAME_FROM_CONTENT:
        text = get_inner_text(el)
        if text:
            return text[:47] + "..." if len(text) > 50 else text
    if el.tag in ("p", "div"):
        text = get_inner_text(el)
        if text and len(text) < 100:
            return text
    return None


def get_aria_node_type(el: VElement) -> str:
    """aria.ts:134-188 (incl. the dead generic-with-text branch)."""
    role = get_aria_role(el)
    # aria.ts:183 checks child.type (undefined on VNodes) — always false;
    # kept for parity documentation, intentionally not re-enabled
    return _ROLE_TO_TYPE.get(role, "generic")


_INPUT_ROLES = {"checkbox": "checkbox", "radio": "radio",
                "button": "button", "search": "searchbox"}
_H_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def build_aria_node(el: VElement) -> AriaNode:
    """aria.ts:193-296.

    Hot path (one call per element per document): the role / accessible-
    name / state probes below are the INLINED bodies of get_aria_role,
    get_accessible_name and get_aria_node_type with direct dict reads
    (get_attribute's `or None` collapses into the truthiness checks —
    note the aria-expanded guard keeps the empty-string-means-unset
    behavior), plus an empty-attrs skip of every attribute-only branch.
    The public helpers above stay as the spec/reference forms; the
    equality is covered by the golden lock + ported aria suites."""
    a = el.attrs
    tag = el.tag
    # role (aria.ts:16-72)
    explicit = a.get("role") if a else None
    if explicit:
        role = explicit.lower()
    elif tag == "a":
        role = "link" if a.get("href") else "generic"
    elif tag == "input":
        role = _INPUT_ROLES.get((a.get("type") or "text").lower(), "textbox")
    else:
        role = _IMPLICIT_ROLES.get(tag, "generic")
    node: AriaNode = {
        "type": _ROLE_TO_TYPE.get(role, "generic"),
        "role": role,
        "el": el,
    }
    # accessible name (aria.ts:78-129)
    name = a.get("aria-label") if a else None
    if not name:
        if a:
            if tag == "img":
                name = a.get("alt")
            if not name:
                name = a.get("title")
        if not name:
            if tag in _NAME_FROM_CONTENT:
                text = get_inner_text(el)
                if text:
                    name = text[:47] + "..." if len(text) > 50 else text
            elif tag == "p" or tag == "div":
                text = get_inner_text(el)
                if text and len(text) < 100:
                    name = text
    if name:
        node["name"] = name

    t = node["type"]
    if t == "heading":
        lvl = _H_LEVEL.get(tag)
        if lvl:
            node["level"] = lvl
    elif t == "checkbox" or t == "radio":
        node["checked"] = bool(a) and (
            "checked" in a or a.get("aria-checked") == "true")
    elif t == "option" or t == "tab":
        node["selected"] = bool(a) and (
            "selected" in a or a.get("aria-selected") == "true")
    if a:
        expanded = a.get("aria-expanded")
        if expanded:  # get_attribute maps "" to None: empty means unset
            node["expanded"] = expanded == "true"
        if "disabled" in a or a.get("aria-disabled") == "true":
            node["disabled"] = True
        if "required" in a or a.get("aria-required") == "true":
            node["required"] = True
        valuemin = a.get("aria-valuemin") or a.get("min")
        if valuemin:
            node["valuemin"] = _js_parse_float(valuemin)
        valuemax = a.get("aria-valuemax") or a.get("max")
        if valuemax:
            node["valuemax"] = _js_parse_float(valuemax)
        valuetext = a.get("aria-valuetext") or a.get("value")
        if valuetext:
            node["valuetext"] = valuetext

    children: list[AriaNode] = []
    for child in el.children:
        if child.nodeType != "element":
            continue
        if child.attrs and not is_probably_visible(child):
            continue
        cn = build_aria_node(child)
        if cn.get("name") or cn["type"] != "generic" or cn.get("children"):
            children.append(cn)
    if children:
        node["children"] = children
    return node


# --- compaction (readableAria.ts:81-339) ------------------------------------

_SIGNIFICANT_TYPES = ("main", "article", "section", "navigation",
                      "banner", "contentinfo")
_GROUPABLE = ("article", "section", "listitem", "img")


def _is_insignificant(n: AriaNode) -> bool:
    return (not n.get("name") and n["type"] == "generic"
            and not n.get("children"))


def _is_empty_text(n: AriaNode) -> bool:
    name = n.get("name")
    return n["type"] == "text" and (not name or name.strip() == "")


def to_compact(node: AriaNode) -> AriaNode:
    """readableAria.ts:81-326 — the fixpoint-ish tree rewrite."""
    if not node.get("children"):
        if _is_empty_text(node):
            return {"type": "generic", "role": "generic", "el": node.get("el")}
        return node

    processed = [to_compact(c) for c in node["children"]]
    processed = [c for c in processed
                 if not _is_insignificant(c) and not _is_empty_text(c)]

    # text wrapping exactly one significant node → unwrap
    if node["type"] == "text" and len(processed) == 1:
        child = processed[0]
        if child["type"] in _SIGNIFICANT_TYPES:
            if node.get("name") and not child.get("name"):
                child["name"] = node["name"]
            return child

    # text over all-generic children → hoist grandchildren
    if (node["type"] == "text" and processed
            and all(c["type"] == "generic" for c in processed)):
        new_children = []
        for c in processed:
            if c.get("children"):
                new_children.extend(c["children"])
        if new_children:
            out = dict(node)
            out["children"] = new_children
            return out

    # single child → merge into parent when parent is nameless generic or
    # same type
    if len(processed) == 1:
        child = processed[0]
        if (node["type"] == "generic" and not node.get("name")) \
                or node["type"] == child["type"]:
            if node.get("name") and not child.get("name"):
                child["name"] = node["name"]
            elif node.get("name") and child.get("name"):
                child["name"] = f"{node['name']} {child['name']}"
            return child

    is_significant = node["type"] in (
        "main", "article", "section", "navigation", "banner", "contentinfo",
        "region", "form", "search")

    if processed and (
        all(c["type"] == "generic" for c in processed)
        or (is_significant and any(c["type"] == "generic" for c in processed))
    ):
        new_children = []
        for c in processed:
            if c["type"] == "generic":
                if c.get("children"):
                    new_children.extend(c["children"])
            else:
                new_children.append(c)
        if new_children:
            out = dict(node)
            out["children"] = new_children
            return out

    # merge consecutive same-type nodes; group article/section/listitem/img
    merged: list[AriaNode] = []
    current: Optional[AriaNode] = None
    group_by_type: dict[str, list[AriaNode]] = {}

    for child in processed:
        if child["type"] in _GROUPABLE:
            group_by_type.setdefault(child["type"], []).append(child)
            continue
        if current is None or current["type"] != child["type"]:
            current = dict(child)
            merged.append(current)
            continue
        if child.get("name"):
            current["name"] = (f"{current['name']} {child['name']}"
                               if current.get("name") else child["name"])
        if child.get("children"):
            current.setdefault("children", []).extend(child["children"])

    for t, group in group_by_type.items():
        if len(group) > 1:
            merged.append({"type": t, "role": t, "el": node.get("el"),
                           "children": group})
        elif group:
            merged.append(group[0])

    # flatten nesting inside the merged children (index-rewind loop)
    i = 0
    while i < len(merged):
        child = merged[i]
        kids = child.get("children")
        if kids and len(kids) == 1:
            grandchild = kids[0]
            if (child["type"] == grandchild["type"]
                    or (child["type"] == "text" and grandchild["type"] in
                        ("main", "article", "section"))):
                if grandchild.get("name"):
                    child["name"] = (f"{child['name']} {grandchild['name']}"
                                     if child.get("name")
                                     else grandchild["name"])
                if grandchild.get("children"):
                    child["children"] = grandchild["children"]
                    continue        # re-process same index
                else:
                    child.pop("children", None)
        kids = child.get("children")
        if kids and len(kids) > 1:
            same = [c for c in kids if c["type"] == child["type"]]
            if same:
                other = [c for c in kids if c["type"] != child["type"]]
                new_children: list[AriaNode] = []
                for s in same:
                    if s.get("name"):
                        child["name"] = (f"{child['name']} {s['name']}"
                                         if child.get("name") else s["name"])
                    if s.get("children"):
                        new_children.extend(s["children"])
                new_children.extend(other)
                child["children"] = new_children
                continue            # re-process same index
        i += 1

    result = dict(node)
    if merged:
        result["children"] = merged
    else:
        result.pop("children", None)
    return result


def count_aria_nodes(node: AriaNode) -> int:
    return 1 + sum(count_aria_nodes(c) for c in node.get("children") or [])


def build_aria_tree(doc: VDocument, compress: bool = True) -> dict:
    """readableAria.ts:23-78 — build (+compact +root-unwrap)."""
    root = build_aria_node(doc.body)
    if compress:
        root = to_compact(root)
        if root["type"] == "text" and root.get("children"):
            significant = next(
                (c for c in root["children"]
                 if c["type"] in _SIGNIFICANT_TYPES), None)
            if significant is not None:
                if root.get("name") and not significant.get("name"):
                    significant["name"] = root["name"]
                root = significant
            elif len(root["children"]) == 1:
                child = root["children"][0]
                if child.get("name"):
                    root["name"] = (f"{root['name']} {child['name']}"
                                    if root.get("name") else child["name"])
                if child.get("children"):
                    root["children"] = child["children"]
                else:
                    root.pop("children", None)
    return {"root": root, "node_count": count_aria_nodes(root)}


# --- weighting / budget filter (links.ts) ------------------------------------

def get_node_depth(node: AriaNode, depth: int = 0) -> int:
    kids = node.get("children")
    if not kids:
        return depth
    return max(get_node_depth(c, depth + 1) for c in kids)


def count_links(node: AriaNode) -> int:
    n = 1 if node["type"] == "link" else 0
    return n + sum(count_links(c) for c in node.get("children") or [])


_IMPORTANT_TYPES = frozenset(
    ["main", "article", "navigation", "heading", "link", "list"])


def _link_counts(root: AriaNode) -> dict:
    """One post-order pass: id(node) → count_links(node) for the whole
    subtree, turning assign_weights from O(n·depth) (count_links re-walks
    every descendant per node — quadratic on path-shaped trees) into
    O(n).  Values are identical to per-node count_links by construction."""
    counts: dict[int, int] = {}
    stack: list = [(root, False)]
    while stack:
        node, expanded = stack.pop()
        kids = node.get("children")
        if not expanded:
            stack.append((node, True))
            if kids:
                for c in kids:
                    stack.append((c, False))
        else:
            n = 1 if node["type"] == "link" else 0
            if kids:
                for c in kids:
                    n += counts[id(c)]
            counts[id(node)] = n
    return counts


def calculate_node_weight(node: AriaNode, depth: int = 0,
                          index_in_parent: int = 0,
                          sibling_count: int = 1,
                          _counts: Optional[dict] = None) -> float:
    """links.ts:42-68."""
    depth_weight = 1 / (depth + 1)
    position_weight = ((sibling_count - index_in_parent) / sibling_count
                       if sibling_count > 1 else 1)
    n_links = (_counts[id(node)] if _counts is not None
               else count_links(node))
    content_weight = (n_links * 0.5
                      + len(node.get("children") or []) * 0.3)
    type_weight = 1.5 if node["type"] in _IMPORTANT_TYPES else 1
    name_weight = 1.2 if node.get("name") else 0.8
    return (depth_weight * 3 + position_weight * 2 + content_weight
            + type_weight + name_weight) / 8


def assign_weights(node: AriaNode, depth: int = 0, index_in_parent: int = 0,
                   sibling_count: int = 1,
                   _counts: Optional[dict] = None) -> AriaNode:
    """links.ts:73-94."""
    if _counts is None:
        _counts = _link_counts(node)
    out = dict(node)
    out["weight"] = calculate_node_weight(
        node, depth, index_in_parent, sibling_count, _counts)
    kids = node.get("children")
    if kids:
        out["children"] = [
            assign_weights(c, depth + 1, i, len(kids), _counts)
            for i, c in enumerate(kids)
        ]
    return out


def filter_nodes_by_weight(node: AriaNode, max_links: int,
                           counter: Optional[list] = None) -> Optional[AriaNode]:
    """links.ts:99-159 — greedy weight-desc DFS keeping ≤max_links links."""
    if counter is None:
        counter = [0]
    if counter[0] >= max_links:
        return None
    if node["type"] == "link":
        counter[0] += 1
    kids = node.get("children")
    if kids:
        sorted_children = sorted(
            kids, key=lambda c: -(c.get("weight") or 0))
        filtered = []
        for c in sorted_children:
            if counter[0] >= max_links:
                break
            fc = filter_nodes_by_weight(c, max_links, counter)
            if fc is not None:
                filtered.append(fc)
        out = dict(node)
        if filtered:
            out["children"] = filtered
        else:
            out.pop("children", None)
        return out
    return node


# --- rendering (readableAria.ts:553-734) -------------------------------------

_COLON_TYPES = frozenset(["text", "paragraph", "listitem", "textbox"])


def _node_to_string(node: AriaNode, indent: int = 0) -> str:
    name = node.get("name")
    kids = node.get("children")
    if ((not name and not kids and node["type"] == "generic")
            or name == ""
            or (node["type"] == "list" and (
                not kids
                or all(not c.get("name") and not c.get("children")
                       for c in kids)))):
        return ""

    out = f"{'  ' * indent}- {node['type']}"

    href = src = alt = ""
    el = node.get("el")
    if el is not None:
        if node["type"] == "link":
            href = el.attrs.get("href", "")
        elif node["type"] == "img":
            src = el.attrs.get("src", "")
            alt = el.attrs.get("alt", "")

    if name:
        if name.startswith("/") and name.endswith("/"):
            out += f" {name}"
        elif node["type"] in _COLON_TYPES:
            out += f": {name}"
        else:
            out += f' "{name}"'

    if href:
        out += f' [href="{href}"]'
    if src:
        out += f' [src="{src}"]'
    if alt:
        out += f' [alt="{alt}"]'

    attrs: list[str] = []
    if node.get("level"):
        attrs.append(f"level={node['level']}")
    if "checked" in node:
        attrs.append(f"checked={'true' if node['checked'] else 'false'}")
    if "selected" in node:
        attrs.append(f"selected={'true' if node['selected'] else 'false'}")
    if "expanded" in node:
        attrs.append(f"expanded={'true' if node['expanded'] else 'false'}")
    if node.get("disabled"):
        attrs.append("disabled")
    if node.get("required"):
        attrs.append("required")
    if "valuemin" in node or "valuemax" in node:
        mn = _fmt_num(node["valuemin"]) if "valuemin" in node else ""
        mx = _fmt_num(node["valuemax"]) if "valuemax" in node else ""
        attrs.append(f"range={mn}-{mx}")
    if node.get("valuetext"):
        attrs.append(f'value="{node["valuetext"]}"')
    if attrs:
        out += f" [{', '.join(attrs)}]"
    out += "\n"

    if kids:
        if (len(kids) == 1 and kids[0]["type"] == node["type"]
                and node["type"] != "generic"):
            child = kids[0]
            combined = (f"{name} {child.get('name')}"
                        if name and child.get("name")
                        else name or child.get("name") or "")
            temp = dict(node)
            temp["name"] = combined
            if child.get("children"):
                temp["children"] = child["children"]
            else:
                temp.pop("children", None)
            return _node_to_string(temp, indent)
        for child in kids:
            out += _node_to_string(child, indent + 1)
    return out


def _fmt_num(x: float) -> str:
    """JS number stringification for the common cases."""
    if isinstance(x, float) and math.isnan(x):
        return "NaN"
    if isinstance(x, float) and x == int(x) and abs(x) < 1e21:
        return str(int(x))
    return str(x)


def aria_tree_to_string(tree: dict, max_links: int = 60) -> str:
    """readableAria.ts:553-734 (incl. the filter-notice header line)."""
    root = tree["root"]
    total_links = count_links(root)
    if total_links > max_links:
        weighted = assign_weights(root)
        root = filter_nodes_by_weight(weighted, max_links) or tree["root"]
    result = _node_to_string(root)
    if total_links > max_links:
        return (f"# 注: 元のツリーには{total_links}個のリンクがありましたが、"
                f"上限({max_links})に基づいてフィルタリングされています\n{result}")
    return result
