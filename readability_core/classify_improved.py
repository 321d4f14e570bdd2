"""Improved page-type classification + probabilistic snapshot classifier.

Reimplements /root/reference/src/classify/classify.ts:
- ``get_expected_page_type_by_url`` — URL-only prior (classify.ts:28-57)
- ``classify_improved`` — the 7-step cascade adding URL patterns, heading /
  image / list-element counts to the base classifier (classify.ts:70-249)
- ``analyze_url_pattern`` — URL tail categorization (classify.ts:254-278)
- ``classify_snapshot_score`` — additive possibility score in [0,1]
  (classify.ts:406-548); returned as (article_possibility, reasons)

The Spark layer expresses these as `when(...)` cascades over feature
columns; the snapshot score is a closed-form expression used as an exact
SQL oracle in __spark_entry__.
"""

from __future__ import annotations

import math
import re
from typing import Optional

from .classify import ARTICLE, OTHER, _js_div
from .constants import DEFAULT_CHAR_THRESHOLD
from .dom import (
    collect_by_tags,
    get_elements_by_tag_name,
    get_inner_text,
    get_link_density,
)
from .vdom import VDocument, VElement

_RE_DIGITS = re.compile(r"^\d+$")
_RE_ALNUM = re.compile(r"^[a-zA-Z0-9-_]+$")
_RE_HAS_DIGIT = re.compile(r"\d")
_RE_3LEVEL = re.compile(r"/[^/]+/[^/]+/[^/]+$")
_RE_TLD = re.compile(r"^https?://[^/]+/?$")
_RE_USERPAGE = re.compile(r"^https?://[^/]+/[^/]+/?$")


def _url_tail(url: str) -> str:
    last = url.split("/")[-1]
    return last.split(".")[0]


def get_expected_page_type_by_url(url: str) -> str:
    """classify.ts:28-57 — URL-only prior."""
    if "/articles/" in url or _RE_3LEVEL.search(url):
        return ARTICLE
    tail = _url_tail(url)
    if _RE_DIGITS.match(tail) or (
        _RE_ALNUM.match(tail) and _RE_HAS_DIGIT.search(tail)
        and len(tail) >= 5
    ):
        return ARTICLE
    return OTHER


def analyze_url_pattern(url: str) -> str:
    """classify.ts:254-278 (labels kept verbatim for parity)."""
    tail = _url_tail(url)
    if tail == "":
        return "末尾なし"
    if _RE_DIGITS.match(tail):
        return f"数字のみ ({tail})"
    if _RE_ALNUM.match(tail) and _RE_HAS_DIGIT.search(tail):
        return f"英数字混合 ({tail})"
    if re.match(r"^[a-zA-Z-_]+$", tail):
        return f"英字のみ ({tail})"
    return f"その他 ({tail})"


def _is_semantic_top(top: VElement) -> bool:
    return (
        top.tag in ("main", "article")
        or "content" in top.class_name.lower()
        or "content" in top.id.lower()
        or any(c.nodeType == "element" and c.tag in ("main", "article")
               for c in top.children)
    )


def _list_element_count(body: VElement, n_article: int, n_li: int) -> int:
    n = n_article + n_li
    n += sum(
        1 for c in body.children
        if c.nodeType == "element" and any(
            k in c.class_name.lower() for k in ("card", "item", "entry"))
    )
    return n


def classify_improved(doc: VDocument, candidates: list[VElement],
                      char_threshold: int = DEFAULT_CHAR_THRESHOLD,
                      url: Optional[str] = None,
                      body_nodes: Optional[dict] = None) -> str:
    """classify.ts:70-249.

    ``body_nodes``: optional pre-collected body tag map (superset fine,
    same order guarantee as collect_by_tags) shared by extract_from_doc."""
    if url:
        if "/articles/" in url:
            return ARTICLE if candidates else OTHER
        tail = _url_tail(url)
        if _RE_DIGITS.match(tail) or (
            _RE_ALNUM.match(tail) and _RE_HAS_DIGIT.search(tail)
            and len(tail) >= 5
        ):
            return ARTICLE if candidates else OTHER
        if _RE_TLD.match(url) or _RE_USERPAGE.match(url):
            if candidates:
                top = candidates[0]
                if (len(get_inner_text(top)) > char_threshold * 2
                        and get_link_density(top) < 0.3):
                    return ARTICLE
            return OTHER

    if not candidates:
        return OTHER
    top = candidates[0]
    body = doc.body

    # one DFS for all seven tag censuses (identical counts per tag)
    d = body_nodes if body_nodes is not None else collect_by_tags(
        body, ("h1", "h2", "h3", "img", "a", "article", "li"))
    heading_count = len(d["h1"]) + len(d["h2"]) + len(d["h3"])
    image_count = len(d["img"])
    link_count = len(d["a"])
    list_element_count = _list_element_count(
        body, len(d["article"]), len(d["li"]))

    # index-page heuristics
    if (list_element_count > 10
            or (link_count > 50 and image_count > 20)
            or heading_count > 10
            or heading_count == 0):
        return OTHER

    if _is_semantic_top(top):
        text_length = len(get_inner_text(top))
        link_density = get_link_density(top)
        if text_length >= char_threshold / 2 and link_density <= 0.5:
            if list_element_count > 10:
                return OTHER
            return ARTICLE
        if text_length < 100:
            return OTHER

    text_length = len(get_inner_text(top))
    link_density = get_link_density(top)
    if (text_length >= char_threshold and link_density <= 0.5
            and 1 <= heading_count <= 10):
        return ARTICLE

    if len(candidates) >= 2:
        top_score = top.score or 0.0
        second_score = candidates[1].score or 0.0
        score_ratio = _js_div(second_score, top_score)
        if score_ratio > 0.8:
            body_text_length = len(get_inner_text(body))
            body_link_density = link_count / (body_text_length or 1)
            if body_link_density > 0.25 or link_density > 0.3:
                return OTHER

    body_text_length = len(get_inner_text(body))
    if link_count > 30 and body_text_length < char_threshold * 1.5:
        return OTHER

    if text_length >= 140 and link_density <= 0.5:
        if list_element_count > 10:
            return OTHER
        return ARTICLE
    return OTHER


def classify_snapshot_score(root: Optional[VElement],
                            candidates: list[VElement],
                            url: str = "") -> tuple[float, list[str]]:
    """classify.ts:406-513 — additive article possibility, clamped [0,1].

    Returns (article_possibility, reasons).  When root is None the
    reference emits a single OTHER result with possibility 1.0 → article
    possibility 0.0.
    """
    if root is None or not candidates:
        return 0.0, ["no root/candidates"]

    top = candidates[0]
    p = 0.0
    reasons: list[str] = []

    if _is_semantic_top(top):
        p += 0.2
        reasons.append("Semantic tag found")

    text_length = len(get_inner_text(top))
    link_density = get_link_density(top)
    if text_length >= DEFAULT_CHAR_THRESHOLD:
        p += 0.3
        reasons.append(f"Sufficient text length ({text_length})")
    elif text_length < DEFAULT_CHAR_THRESHOLD / 2:
        p -= 0.1
        reasons.append(f"Insufficient text length ({text_length})")
    if link_density <= 0.3:
        p += 0.2
        reasons.append(f"Low link density ({link_density:.2f})")
    elif link_density > 0.6:
        p -= 0.2
        reasons.append(f"High link density ({link_density:.2f})")

    dr = collect_by_tags(root, ("h1", "h2", "h3", "article"))
    heading_count = len(dr["h1"]) + len(dr["h2"]) + len(dr["h3"])
    if 1 <= heading_count <= 10:
        p += 0.1
        reasons.append(f"Appropriate heading count ({heading_count})")
    elif heading_count == 0 or heading_count > 15:
        p -= 0.1
        reasons.append(f"Inappropriate heading count ({heading_count})")

    list_count = len(dr["article"]) + sum(
        1 for c in root.children
        if c.nodeType == "element" and any(
            k in c.class_name.lower() for k in ("card", "item", "entry"))
    )
    if list_count > 10:
        p -= 0.2
        reasons.append(f"Many list-like elements found ({list_count})")

    if len(candidates) >= 2:
        top_score = candidates[0].score or 0.0
        second_score = candidates[1].score or 0.0
        score_ratio = second_score / top_score if top_score > 0 else 0.0
        if score_ratio > 0.8:
            p -= 0.1
            reasons.append(
                f"Candidates scores are balanced (ratio: {score_ratio:.2f})")

    if get_expected_page_type_by_url(url) == ARTICLE:
        p += 0.1
        reasons.append("URL pattern suggests ARTICLE")
    else:
        reasons.append("URL pattern suggests OTHER")

    return max(0.0, min(1.0, p)), reasons
