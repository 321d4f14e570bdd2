"""Structural element detection + content-characteristics analysis.

Reimplements the remaining §2.5/§2.7 operators:
- ``find_structural_elements`` — header/footer/other significant nodes by
  tag, role=banner/contentinfo, id/class patterns, position preference
  (/root/reference/src/extract/extract.ts:102-216; dead code in the
  reference — ported for API completeness, covered by tests here)
- ``add_significant_elements_by_class_or_id`` (extract.ts:221-256)
- ``is_significant_node`` (extract.ts:261-281)
- ``analyze_content_characteristics`` — classify() with human-readable
  reasons (/root/reference/src/classify/classify.ts:284-400)
"""

from __future__ import annotations

import re
from typing import Optional

from .classify import ARTICLE, OTHER
from .classify_improved import _is_semantic_top
from .constants import DEFAULT_CHAR_THRESHOLD
from .dom import (
    collect_by_tags,
    get_elements_by_tag_name,
    get_inner_text,
    get_link_density,
    get_text_density,
    is_probably_visible,
)
from .vdom import VDocument, VElement

_SIGNIFICANT_PATTERNS = tuple(re.compile(p, re.I) for p in (
    "content", "main", "article", "post", "entry", "body", "text", "story",
    "container", "wrapper", "page", "blog", "section"))

_SEMANTIC_TAGS = frozenset(["main", "article", "section", "aside", "nav"])


def is_significant_node(node: VElement) -> bool:
    """extract.ts:261-281 — text ≥50 ∧ textDensity ≥0.1 ∧ linkDensity ≤0.5."""
    if len(get_inner_text(node, False)) < 50:
        return False
    if get_text_density(node) < 0.1:
        return False
    if get_link_density(node) > 0.5:
        return False
    return True


def add_significant_elements_by_class_or_id(
        body: VElement, potential: list[VElement]) -> None:
    """extract.ts:221-256."""
    seen = {id(el) for el in potential}
    for el in get_elements_by_tag_name(body, "*"):
        combined = f"{el.class_name.lower()} {el.id.lower()}"
        for pat in _SIGNIFICANT_PATTERNS:
            if pat.search(combined):
                if id(el) not in seen:
                    potential.append(el)
                    seen.add(id(el))
                break


def _is_inside(el: VElement, ancestors: tuple, body: VElement) -> bool:
    cur: Optional[VElement] = el
    while cur is not None and cur is not body:
        if any(cur is a for a in ancestors if a is not None):
            return True
        cur = cur.parent
    return False


def find_structural_elements(doc: VDocument) -> dict:
    """extract.ts:102-216 — header / footer / other significant nodes."""
    body = doc.body
    header: Optional[VElement] = None
    footer: Optional[VElement] = None

    # 1. header: unique <header> tag, else role/id/class heuristics with
    # body-direct-child preference
    header_tags = get_elements_by_tag_name(doc.document_element, "header")
    if len(header_tags) == 1:
        header = header_tags[0]
    else:
        for el in get_elements_by_tag_name(body, "*"):
            role = (el.attrs.get("role") or "").lower()
            eid = el.id.lower()
            cls = el.class_name.lower()
            if (role == "banner" or eid in ("header", "masthead")
                    or "header" in cls or "masthead" in cls):
                if header is None or (el.parent is body
                                      and header.parent is not body):
                    header = el

    # 2. footer: unique <footer> tag, else reverse scan for
    # contentinfo/footer/colophon/site-info not inside the header
    footer_tags = get_elements_by_tag_name(doc.document_element, "footer")
    if len(footer_tags) == 1:
        footer = footer_tags[0]
    else:
        for el in reversed(get_elements_by_tag_name(body, "*")):
            role = (el.attrs.get("role") or "").lower()
            eid = el.id.lower()
            cls = el.class_name.lower()
            if (role == "contentinfo" or eid in ("footer", "colophon")
                    or "footer" in cls or "site-info" in cls):
                if footer is None and not _is_inside(el, (header,), body):
                    footer = el

    # 3. other significant nodes: semantic tags + class/id patterns,
    # excluding anything inside header/footer
    potential: list[VElement] = []
    by_tag = collect_by_tags(body, ("main", "article", "section",
                                    "aside", "nav"))
    for tag in ("main", "article", "section", "aside", "nav"):
        potential.extend(by_tag[tag])
    add_significant_elements_by_class_or_id(body, potential)

    others: list[VElement] = []
    seen: set[int] = set()
    for node in potential:
        if _is_inside(node, (header, footer), body):
            continue
        if id(node) in seen:
            continue
        if is_probably_visible(node) and (
                is_significant_node(node) or node.tag in _SEMANTIC_TAGS):
            others.append(node)
            seen.add(id(node))

    return {"header": header, "footer": footer,
            "other_significant_nodes": others}


def analyze_content_characteristics(
        doc: VDocument, candidates: list[VElement],
        char_threshold: int = DEFAULT_CHAR_THRESHOLD) -> dict:
    """classify.ts:284-400 — page type + human-readable reasons.

    Reason strings are our own (the reference's are Japanese debug text);
    the decision logic is ported exactly.
    """
    reasons: list[str] = []
    if not candidates:
        reasons.append("no content candidates found")
        return {"page_type": OTHER, "reasons": reasons}

    top = candidates[0]
    is_semantic = _is_semantic_top(top)
    if is_semantic:
        reasons.append(f"semantic tag ({top.tag}) in use")

    text_length = len(get_inner_text(top))
    link_density = get_link_density(top)
    reasons.append(f"text length: {text_length}")
    reasons.append(f"link density: {link_density:.2f}")

    d = collect_by_tags(doc.body, ("h1", "h2", "h3", "article"))
    heading_count = len(d["h1"]) + len(d["h2"]) + len(d["h3"])
    reasons.append(f"heading count: {heading_count}")

    # list elements: article tags + card/item/entry classed direct children
    # (NOTE: unlike classify(), li is excluded here — classify.ts:344)
    list_count = len(d["article"]) + sum(
        1 for c in doc.body.children
        if c.nodeType == "element" and any(
            k in c.class_name.lower() for k in ("card", "item", "entry")))
    reasons.append(f"list-like elements: {list_count}")

    score_ratio = 1.0
    if len(candidates) >= 2:
        top_score = top.score or 0.0
        second_score = candidates[1].score or 0.0
        score_ratio = second_score / top_score if top_score else (
            float("inf") if second_score > 0 else float("nan"))
        reasons.append(f"candidate score ratio: {score_ratio:.2f}")
        if score_ratio > 0.8:
            reasons.append("candidates are balanced")

    if (text_length >= char_threshold and link_density <= 0.5
            and 1 <= heading_count <= 10):
        reasons.append("sufficient text, low link density, sane headings")
        return {"page_type": ARTICLE, "reasons": reasons}
    if is_semantic and text_length >= char_threshold / 2 \
            and link_density <= 0.5:
        reasons.append("semantic tag with reasonable text volume")
        return {"page_type": ARTICLE, "reasons": reasons}
    if list_count > 10:
        reasons.append("many list-like elements (index-page signature)")
        return {"page_type": OTHER, "reasons": reasons}
    if len(candidates) >= 2 and score_ratio > 0.8 and link_density > 0.3:
        reasons.append("balanced candidates with high link density")
        return {"page_type": OTHER, "reasons": reasons}
    if text_length >= 140 and link_density <= 0.5:
        reasons.append("moderate text with low link density")
        return {"page_type": ARTICLE, "reasons": reasons}
    reasons.append("does not meet article criteria")
    return {"page_type": OTHER, "reasons": reasons}
