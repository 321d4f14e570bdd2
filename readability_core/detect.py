"""Structure detection: headers, navigations, page/document structure.

Reimplements the reference's two-phase detection layer, which runs on the
RAW (un-preprocessed) HTML with an UNCOMPRESSED aria tree — the
architecture-decision doc's "二段階処理" (/root/reference/docs/
architecture-decision.md; /root/reference/src/detect/index.ts:44-112):

- ``detect_navigations`` + 8-way type classification (breadcrumb,
  pagination, toc, social, footer, global, utility, local)
  (/root/reference/src/detect/navigation.ts)
- ``detect_headers`` with logo / site-title / search detection
  (/root/reference/src/detect/header.ts)
- ``analyze_page_structure`` — orchestration, priority capping
  (detect/index.ts:44-165)
- ``analyze_document_structure`` — doc mode: sidebar nav priority, h1-h6
  stack-fold section outline, prev/next pagination
  (/root/reference/src/detect/document.ts)
- ``extract_document_content`` — merged content + nav markdown views

Nodes are the dict AriaNodes from readability_core.aria (``el`` holds the
originating VElement).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from .aria import AriaNode, build_aria_node, get_accessible_name
from .vdom import VDocument, VElement, parse_html

# --- shared helpers -----------------------------------------------------------

def extract_text_from_aria_node(node: AriaNode,
                                include_newlines: bool = False) -> str:
    """aria/utils.ts:13-30."""
    text = ""
    if node.get("name"):
        text += node["name"]
        if include_newlines:
            text += "\n"
    for child in node.get("children") or []:
        text += extract_text_from_aria_node(child, include_newlines)
    return text


def _el(node: AriaNode) -> Optional[VElement]:
    return node.get("el")


def _cls(el: Optional[VElement]) -> str:
    return el.class_name if el is not None else ""


_RE_NAV_CLASS = re.compile(r"\b(nav|menu|navigation)\b", re.I)
_RE_HEADER_CLASS = re.compile(r"\bheader\b", re.I)
_RE_FOOTER_CLASS = re.compile(r"\bfooter\b", re.I)
_RE_SIDEBAR_CLASS = re.compile(r"\b(sidebar|aside)\b", re.I)
_RE_CURRENT = re.compile(r"\b(current|active)\b", re.I)
_RE_ACTIVE = re.compile(r"\bactive\b", re.I)
_RE_DROPDOWN = re.compile(r"\b(dropdown|submenu|mega-?menu)\b", re.I)
_RE_TABS = re.compile(r"\b(tabs?|tab-?list)\b", re.I)

_SOCIAL_PATTERNS = tuple(re.compile(p, re.I) for p in (
    "facebook", "twitter", "linkedin", "instagram", "youtube", "github",
    "pinterest", "tiktok"))
_UTILITY_KEYWORDS = ("login", "logout", "sign in", "sign out", "register",
                     "account", "profile", "settings", "help", "contact")
_PAGINATION_KEYWORDS = ("previous", "prev", "next", "first", "last")


# --- navigation detection (navigation.ts) ------------------------------------

def _find_lists(node: AriaNode) -> list[AriaNode]:
    out = []
    el = _el(node)
    if el is not None and el.tag in ("ul", "ol"):
        out.append(node)
    for c in node.get("children") or []:
        out.extend(_find_lists(c))
    return out


def _find_first_link(node: AriaNode) -> Optional[AriaNode]:
    el = _el(node)
    if el is not None and el.tag == "a":
        return node
    for c in node.get("children") or []:
        link = _find_first_link(c)
        if link is not None:
            return link
    return None


def _find_all_links(node: AriaNode) -> list[AriaNode]:
    out = []
    el = _el(node)
    if el is not None and el.tag == "a":
        out.append(node)
    for c in node.get("children") or []:
        out.extend(_find_all_links(c))
    return out


def _find_child_list(node: AriaNode) -> Optional[AriaNode]:
    for c in node.get("children") or []:
        el = _el(c)
        if el is not None and el.tag in ("ul", "ol"):
            return c
    return None


def _has_current(container: AriaNode, link: AriaNode) -> bool:
    cel, lel = _el(container), _el(link)
    return (
        (cel is not None and cel.attrs.get("aria-current") == "page")
        or (lel is not None and lel.attrs.get("aria-current") == "page")
        or bool(_RE_CURRENT.search(_cls(cel)))
    )


def _has_active(container: AriaNode, link: AriaNode) -> bool:
    return bool(_RE_ACTIVE.search(_cls(_el(container)))
                or _RE_ACTIVE.search(_cls(_el(link))))


def _item_from_li(li: AriaNode, level: int) -> Optional[dict]:
    """navigation.ts:253-307."""
    link = _find_first_link(li)
    if link is not None:
        lel = _el(link)
        if lel is None:
            return None
        label = get_accessible_name(lel)
        if not label:
            return None
        item = {
            "label": label,
            "href": lel.attrs.get("href"),
            "level": level,
            "isCurrent": _has_current(li, link),
            "isActive": _has_active(li, link),
        }
        child_list = _find_child_list(li)
        if child_list is not None:
            item["children"] = _items_from_list(child_list, level + 1)
        return item
    lel = _el(li)
    if lel is None:
        return None
    label = get_accessible_name(lel)
    if not label or label.strip() == "":
        text = extract_text_from_aria_node(li, False)
        if text and text.strip():
            return {"label": text.strip(), "level": level,
                    "isCurrent": True, "isActive": True}
        return None
    return {"label": label, "level": level,
            "isCurrent": True, "isActive": True}


def _items_from_list(lst: AriaNode, level: int) -> list[dict]:
    items = []
    for child in lst.get("children") or []:
        cel = _el(child)
        if cel is not None and cel.tag == "li":
            item = _item_from_li(child, level)
            if item:
                items.append(item)
    return items


def _direct_links(node: AriaNode, level: int) -> list[dict]:
    items = []
    for link in _find_all_links(node):
        lel = _el(link)
        if lel is not None:
            label = get_accessible_name(lel)
            if label:
                items.append({
                    "label": label, "href": lel.attrs.get("href"),
                    "level": level,
                    "isCurrent": _has_current(link, link),
                    "isActive": _has_active(link, link),
                })
    return items


def extract_navigation_items(node: AriaNode) -> list[dict]:
    """navigation.ts:212-227 — ul/ol lists, else direct links."""
    items: list[dict] = []
    for lst in _find_lists(node):
        items.extend(_items_from_list(lst, 0))
    if not items:
        items.extend(_direct_links(node, 0))
    return items


def _has_breadcrumb_structure(items: list[dict]) -> bool:
    return len(items) >= 3 and any(
        i["label"] in (">", "/", "»") for i in items)


def _has_pagination_pattern(items: list[dict]) -> bool:
    labels = [i["label"].lower() for i in items]
    return (any(re.match(r"^\d+$", l) for l in labels)
            or any(k in l for l in labels for k in _PAGINATION_KEYWORDS))


def _has_toc_pattern(items: list[dict]) -> bool:
    anchors = [i for i in items if i.get("href") and i["href"].startswith("#")]
    return len(anchors) > len(items) * 0.7


def _has_social_links(items: list[dict]) -> bool:
    n = sum(
        1 for i in items
        if any(p.search(i["label"]) or (i.get("href") and p.search(i["href"]))
               for p in _SOCIAL_PATTERNS))
    return n > len(items) * 0.5


def _has_utility_keyword(label: str) -> bool:
    low = label.lower()
    return any(k in low for k in _UTILITY_KEYWORDS)


def _ancestor_matches(ancestors: list[AriaNode], tag: str, role: str,
                      cls_re: re.Pattern) -> bool:
    for a in ancestors:
        el = _el(a)
        if el is not None and (
            el.tag == tag or el.attrs.get("role") == role
            or cls_re.search(el.class_name)
        ):
            return True
    return False


def _is_in_header(ancestors) -> bool:
    return _ancestor_matches(ancestors, "header", "banner", _RE_HEADER_CLASS)


def _is_in_footer(ancestors) -> bool:
    return _ancestor_matches(ancestors, "footer", "contentinfo",
                             _RE_FOOTER_CLASS)


def _is_in_sidebar(ancestors) -> bool:
    return _ancestor_matches(ancestors, "aside", "complementary",
                             _RE_SIDEBAR_CLASS)


def classify_navigation_type(node: AriaNode, items: list[dict],
                             ancestors: list[AriaNode]) -> str:
    """navigation.ts:94-159 — the 8-way cascade."""
    el = _el(node)
    class_name = _cls(el)
    aria_label = el.attrs.get("aria-label", "") if el is not None else ""

    if ("breadcrumb" in aria_label.lower()
            or "breadcrumb" in class_name
            or _has_breadcrumb_structure(items)):
        return "breadcrumb"
    if ("pagination" in class_name or "pager" in class_name
            or _has_pagination_pattern(items)):
        return "pagination"
    if ("toc" in class_name or "table-of-contents" in class_name
            or "contents" in aria_label.lower()
            or _has_toc_pattern(items)):
        return "toc"
    if "social" in class_name or _has_social_links(items):
        return "social"
    if _is_in_footer(ancestors):
        return "footer"
    if _is_in_header(ancestors) and len(items) >= 3:
        utility_count = sum(
            1 for i in items if _has_utility_keyword(i["label"]))
        if utility_count < len(items) * 0.5:
            return "global"
    if any(_has_utility_keyword(i["label"]) for i in items):
        return "utility"
    return "local"


def determine_location(node: AriaNode, ancestors: list[AriaNode]) -> str:
    """navigation.ts:164-182."""
    if _is_in_header(ancestors):
        return "header"
    if _is_in_footer(ancestors):
        return "footer"
    if _is_in_sidebar(ancestors):
        return "sidebar"
    return "inline"


def analyze_structure(node: AriaNode, items: list[dict]) -> str:
    """navigation.ts:187-207."""
    has_nested = any(i.get("children") for i in items)
    el = _el(node)
    if has_nested:
        if el is not None and _RE_DROPDOWN.search(el.class_name):
            return "dropdown"
        return "nested"
    if el is not None and (el.attrs.get("role") == "tablist"
                           or _RE_TABS.search(el.class_name)):
        return "tabs"
    return "flat"


def _is_navigation_element(node: AriaNode) -> bool:
    """navigation.ts:342-357."""
    if node["type"] == "navigation":
        return True
    el = _el(node)
    if el is not None:
        if el.tag == "nav" or el.attrs.get("role") == "navigation":
            return True
        return bool(_RE_NAV_CLASS.search(el.class_name))
    return False


def detect_navigations(root: AriaNode) -> list[dict]:
    """navigation.ts:40-89 — DFS collect + per-nav analysis."""
    navigations: list[dict] = []

    def traverse(node: AriaNode, ancestors: list[AriaNode]):
        if _is_navigation_element(node):
            items = extract_navigation_items(node)
            if items:
                el = _el(node)
                label = None
                if el is not None:
                    label = (el.attrs.get("aria-label")
                             or el.attrs.get("aria-labelledby") or None)
                navigations.append({
                    "element": node,
                    "type": classify_navigation_type(node, items, ancestors),
                    "location": determine_location(node, ancestors),
                    "items": items,
                    "structure": analyze_structure(node, items),
                    "label": label,
                })
        for child in node.get("children") or []:
            traverse(child, ancestors + [node])

    traverse(root, [])
    return navigations


# --- header detection (header.ts) ---------------------------------------------

_HEADER_PATTERNS = tuple(re.compile(p, re.I) for p in (
    r"\bheader\b", r"\bmasthead\b", r"\bpage-header\b", r"\bsite-header\b",
    r"\btop-bar\b"))
_STICKY_PATTERNS = tuple(re.compile(p, re.I) for p in (
    r"\bsticky\b", r"\bfixed\b", r"\bpinned\b"))
_LOGO_PATTERNS = tuple(re.compile(p, re.I) for p in (
    r"\blogo\b", r"\bbrand\b", r"\bsite-?icon\b"))
_TITLE_PATTERNS = tuple(re.compile(p, re.I) for p in (
    r"\bsite-?title\b", r"\bsite-?name\b", r"\bbrand-?name\b"))
_SEARCH_PATTERNS = tuple(re.compile(p, re.I) for p in (
    r"\bsearch\b", r"\bfind\b", r"\bquery\b"))


def _is_header_element(node: AriaNode) -> bool:
    el = _el(node)
    if el is None:
        return False
    if el.tag == "header" or node.get("role") == "banner":
        return True
    if el.attrs.get("role") == "banner":
        return True
    return any(p.search(el.class_name) for p in _HEADER_PATTERNS)


def detect_logo(node: AriaNode) -> Optional[dict]:
    """header.ts:183-223."""
    el = _el(node)
    if el is None:
        return None
    if el.tag == "img":
        alt = el.attrs.get("alt", "")
        src = el.attrs.get("src", "")
        cls = el.class_name
        if any(p.search(alt) or p.search(cls) or p.search(src)
               for p in _LOGO_PATTERNS):
            return {"element": node, "src": src, "alt": alt}
    if re.search(r"\blogo\b", el.class_name, re.I) \
            or re.search(r"\blogo\b", el.id, re.I):
        text = get_accessible_name(el)
        if text:
            return {"element": node, "text": text}
    return None


def detect_site_title(node: AriaNode) -> Optional[dict]:
    """header.ts:228-261."""
    el = _el(node)
    if el is None:
        return None
    if re.match(r"^h[1-3]$", el.tag, re.I):
        text = get_accessible_name(el)
        if text:
            return {"element": node, "text": text, "level": int(el.tag[1])}
    if any(p.search(el.class_name) for p in _TITLE_PATTERNS):
        text = get_accessible_name(el)
        if text:
            return {"element": node, "text": text, "level": 0}
    return None


def _is_search_element(node: AriaNode) -> bool:
    """header.ts:290-325."""
    el = _el(node)
    if el is None:
        return False
    if el.attrs.get("role") == "search":
        return True
    if el.tag == "form":
        cls, eid = el.class_name, el.id
        action = el.attrs.get("action", "")
        return any(p.search(cls) or p.search(eid) or p.search(action)
                   for p in _SEARCH_PATTERNS)
    for child in node.get("children") or []:
        cel = _el(child)
        if (cel is not None and cel.tag == "input"
                and cel.attrs.get("type") == "search"):
            return True
    return False


def detect_headers(root: AriaNode) -> list[dict]:
    """header.ts:33-127 — DFS collect, depth-sorted; type main if depth ≤2."""
    headers: list[dict] = []

    def analyze_content(node: AriaNode, info: dict):
        logo = detect_logo(node)
        if logo and "logo" not in info["contains"]:
            info["contains"]["logo"] = logo
        site_title = detect_site_title(node)
        if site_title and "siteTitle" not in info["contains"]:
            info["contains"]["siteTitle"] = site_title
        el = _el(node)
        if el is not None and (
            el.tag == "nav" or el.attrs.get("role") == "navigation"
            or _RE_NAV_CLASS.search(el.class_name)
        ):
            info["contains"].setdefault("navigation", []).append(node)
        if _is_search_element(node):
            info["contains"]["search"] = node
        for child in node.get("children") or []:
            analyze_content(child, info)

    def traverse(node: AriaNode, depth: int):
        if _is_header_element(node):
            el = _el(node)
            info = {
                "element": node,
                "type": "main" if depth <= 2 else "section",
                "contains": {},
                "isSticky": any(p.search(_cls(el))
                                for p in _STICKY_PATTERNS),
                "depth": depth,
            }
            for child in node.get("children") or []:
                analyze_content(child, info)
            headers.append(info)
        for child in node.get("children") or []:
            traverse(child, depth + 1)

    traverse(root, 0)
    headers.sort(key=lambda h: h["depth"])     # stable — ties keep doc order
    return headers


# --- page structure orchestration (detect/index.ts) ---------------------------

_PRIORITY_NORMAL = {"global": 10, "breadcrumb": 9, "toc": 8, "local": 7,
                    "utility": 6, "pagination": 5, "footer": 4, "social": 3}
_PRIORITY_DOC = {"toc": 10, "local": 9, "global": 8, "breadcrumb": 7,
                 "utility": 6, "pagination": 5, "footer": 4, "social": 3}


def prioritize_navigations(navigations: list[dict],
                           document_mode: bool = False) -> list[dict]:
    """detect/index.ts:117-165 — priority sort, sidebar-first in doc mode."""
    pmap = _PRIORITY_DOC if document_mode else _PRIORITY_NORMAL

    import functools

    def cmp(a, b):
        pa, pb = pmap.get(a["type"], 0), pmap.get(b["type"], 0)
        if document_mode:
            a_side = a["location"] == "sidebar"
            b_side = b["location"] == "sidebar"
            if a_side and not b_side:
                return -1
            if not a_side and b_side:
                return 1
        if pa == pb:
            return len(b["items"]) - len(a["items"])
        return pb - pa

    return sorted(navigations, key=functools.cmp_to_key(cmp))


def _find_by(root: AriaNode, pred) -> Optional[AriaNode]:
    if pred(root):
        return root
    for child in root.get("children") or []:
        found = _find_by(child, pred)
        if found is not None:
            return found
    return None


def find_main_content(root: AriaNode) -> Optional[AriaNode]:
    """detect/index.ts:170-210 — main/role=main, else first article."""
    main = _find_by(root, lambda n: (
        _el(n) is not None
        and (_el(n).tag == "main" or _el(n).attrs.get("role") == "main")))
    if main is not None:
        return main
    return _find_by(root, lambda n: _el(n) is not None
                    and _el(n).tag == "article")


def find_sidebar(root: AriaNode) -> Optional[AriaNode]:
    """detect/index.ts:215-239."""
    return _find_by(root, lambda n: (
        _el(n) is not None
        and (_el(n).tag == "aside"
             or _el(n).attrs.get("role") == "complementary"
             or bool(_RE_SIDEBAR_CLASS.search(_el(n).class_name)))))


def find_footer(root: AriaNode) -> Optional[AriaNode]:
    """detect/index.ts:244-268 — footer/contentinfo; footer class depth ≤2."""
    def find(node: AriaNode, depth: int):
        el = _el(node)
        if el is not None and (el.tag == "footer"
                               or el.attrs.get("role") == "contentinfo"):
            return node
        if depth <= 2 and el is not None \
                and _RE_FOOTER_CLASS.search(el.class_name):
            return node
        for child in node.get("children") or []:
            found = find(child, depth + 1)
            if found is not None:
                return found
        return None

    return find(root, 0)


def analyze_page_structure(html: str, max_navigations: int = 10,
                           header_navigation_only: bool = False,
                           document_mode: bool = False) -> dict:
    """detect/index.ts:44-112 — raw parse, UNCOMPRESSED aria tree."""
    doc = parse_html(html if isinstance(html, str) else "")
    return analyze_page_structure_doc(doc, max_navigations,
                                      header_navigation_only, document_mode)


def analyze_page_structure_doc(doc: VDocument, max_navigations: int = 10,
                               header_navigation_only: bool = False,
                               document_mode: bool = False) -> dict:
    """Structure analysis over an ALREADY-PARSED (raw, un-preprocessed)
    document — the fusion point SURVEY.md §7.6 calls for: one parse serves
    detection (raw tree, runs first) and extraction (which preprocesses the
    same tree afterwards)."""
    return analyze_page_structure_root(
        build_aria_node(doc.body), max_navigations, header_navigation_only,
        document_mode)


def analyze_page_structure_root(root: AriaNode, max_navigations: int = 10,
                                header_navigation_only: bool = False,
                                document_mode: bool = False) -> dict:
    headers = detect_headers(root)
    navigations = detect_navigations(root)

    if header_navigation_only:
        navigations = [n for n in navigations if n["location"] == "header"]

    effective_max = max_navigations
    if document_mode:
        sidebar = find_sidebar(root)
        if sidebar is not None:
            navigations = detect_navigations(sidebar) + navigations
        effective_max = max_navigations * 2

    if len(navigations) > effective_max:
        navigations = prioritize_navigations(
            navigations, document_mode)[:effective_max]

    return {
        "headers": headers,
        "navigations": navigations,
        "mainHeader": next((h for h in headers if h["type"] == "main"), None),
        "mainNavigation": next(
            (n for n in navigations if n["type"] == "global"), None),
        "breadcrumb": next(
            (n for n in navigations if n["type"] == "breadcrumb"), None),
        "toc": next((n for n in navigations if n["type"] == "toc"), None),
        "mainContent": find_main_content(root),
        "sidebar": find_sidebar(root),
        "footer": find_footer(root),
    }


# --- document structure (document.ts) ------------------------------------------

def extract_sections(html: str) -> list[dict]:
    """document.ts:91-141 — h1-h6 stack-fold into a nested outline."""
    doc = parse_html(html if isinstance(html, str) else "")
    return extract_sections_doc(doc)


def extract_sections_doc(doc: VDocument) -> list[dict]:
    return extract_sections_root(build_aria_node(doc.body))


def extract_sections_root(root: AriaNode) -> list[dict]:
    sections: list[dict] = []
    stack: list[tuple[dict, int]] = []

    def traverse(node: AriaNode):
        el = _el(node)
        if el is not None and re.match(r"^h[1-6]$", el.tag):
            level = int(el.tag[1])
            new_section = {
                "title": node.get("name") or "",
                "level": level,
                "children": [],
            }
            eid = el.id    # el.id IS attrs.get("id", ""); no fallback exists
            if eid:
                new_section["id"] = eid
            while stack and stack[-1][1] >= level:
                stack.pop()
            if stack:
                stack[-1][0]["children"].append(new_section)
            else:
                sections.append(new_section)
            stack.append((new_section, level))
        for child in node.get("children") or []:
            traverse(child)

    traverse(root)
    return sections


def extract_pagination(structure: dict) -> Optional[dict]:
    """document.ts:146-169 — prev/next by label keywords."""
    nav = next((n for n in structure["navigations"]
                if n["type"] == "pagination"), None)
    if nav is None:
        return None
    pagination: dict = {}
    for item in nav["items"]:
        label = item["label"].lower()
        if "prev" in label or "前" in label or label == "←":
            pagination["prev"] = {"label": item["label"],
                                  "href": item.get("href") or ""}
        elif "next" in label or "次" in label or label == "→":
            pagination["next"] = {"label": item["label"],
                                  "href": item.get("href") or ""}
    return pagination or None


def analyze_document_structure(html: str,
                               max_navigations: int = 10) -> dict:
    """document.ts:61-86."""
    doc = parse_html(html if isinstance(html, str) else "")
    return analyze_document_structure_doc(doc, max_navigations)


def analyze_document_structure_doc(doc: VDocument,
                                   max_navigations: int = 10) -> dict:
    """Doc-mode structure over an already-parsed document: ONE aria-root
    build serves page structure AND sections (the reference re-parses and
    rebuilds for each — document.ts:66+93)."""
    root = build_aria_node(doc.body)
    structure = analyze_page_structure_root(
        root, max_navigations=max_navigations, document_mode=True)
    structure["sidebarNavigation"] = next(
        (n for n in structure["navigations"] if n["location"] == "sidebar"),
        None)
    structure["sections"] = extract_sections_root(root)
    structure["pagination"] = extract_pagination(structure)
    return structure


# --- merged document content + markdown rendering (document.ts:204-314) -------

def format_navigation_as_markdown(nav: dict, indent: int = 0) -> str:
    md = ""
    for item in nav["items"]:
        md += "  " * indent + "- " + item["label"]
        if item.get("href"):
            md += f" ({item['href']})"
        if item.get("isCurrent"):
            md += " **[Current]**"
        md += "\n"
        if item.get("children"):
            md += _format_items_md(item["children"], indent + 1)
    return md


def _format_items_md(items: list[dict], indent: int) -> str:
    md = ""
    for item in items:
        md += "  " * indent + "- " + item["label"]
        if item.get("href"):
            md += f" ({item['href']})"
        md += "\n"
        if item.get("children"):
            md += _format_items_md(item["children"], indent + 1)
    return md


def format_sections_as_markdown(sections: list[dict],
                                base_level: int = 0) -> str:
    md = ""
    for s in sections:
        md += "#" * (s["level"] + base_level) + " " + s["title"]
        if s.get("id"):
            md += f" {{#{s['id']}}}"
        md += "\n\n"
        if s.get("children"):
            md += format_sections_as_markdown(s["children"], base_level)
    return md


def extract_document_content(html: str) -> dict:
    """document.ts:204-236 — content + sidebarNav/toc/breadcrumb/outline."""
    structure = analyze_document_structure(html)
    result: dict = {"content": ""}
    if structure["mainContent"] is not None:
        result["content"] = extract_text_from_aria_node(
            structure["mainContent"], True)
    if structure["sidebarNavigation"] is not None:
        result["sidebarNav"] = format_navigation_as_markdown(
            structure["sidebarNavigation"])
    if structure["toc"] is not None:
        result["toc"] = format_navigation_as_markdown(structure["toc"])
    if structure["breadcrumb"] is not None:
        result["breadcrumb"] = " > ".join(
            i["label"] for i in structure["breadcrumb"]["items"])
    if structure.get("sections"):
        result["outline"] = format_sections_as_markdown(structure["sections"])
    return result
