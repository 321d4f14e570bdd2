"""Page-type classification — ARTICLE vs OTHER rule cascade.

Reimplements ``classifyPageType``
(/root/reference/src/extract/extract.ts:626-707): a 5-step decision cascade
over text length, link density, candidate score balance, and body link
counts.  In the Spark layer this is a nested ``when(...)`` expression over
feature columns.
"""

from __future__ import annotations

import math

from .constants import DEFAULT_CHAR_THRESHOLD
from .dom import (
    count_links_indexed,
    get_elements_by_tag_name,
    get_inner_text,
    get_link_density,
    get_link_density_indexed,
)
from .vdom import VDocument, VElement

ARTICLE = "article"
OTHER = "other"


def _js_div(a: float, b: float) -> float:
    """JS float division: x/0 → ±inf, 0/0 → nan."""
    if b == 0:
        if a == 0:
            return math.nan
        return math.inf if a > 0 else -math.inf
    return a / b


def classify_page_type(
    doc: VDocument,
    candidates: list[VElement],
    char_threshold: int = DEFAULT_CHAR_THRESHOLD,
    link_index=None,
) -> str:
    """extract.ts:626-707."""
    if not candidates:
        return OTHER
    top = candidates[0]

    # steps 1 and 2 both measure the top candidate — compute once
    text_length = len(get_inner_text(top))
    link_density = (get_link_density_indexed(top, link_index)
                    if link_index is not None else get_link_density(top))

    # 1. semantic tags / content class on the top candidate
    if (
        top.tag in ("main", "article")
        or "content" in top.class_name.lower()
        or "content" in top.id.lower()
        or any(
            c.nodeType == "element" and c.tag in ("main", "article")
            for c in top.children
        )
    ):
        if text_length >= char_threshold / 2 and link_density <= 0.5:
            return ARTICLE

    # 2. text length and link density of the top candidate
    if text_length >= char_threshold and link_density <= 0.5:
        return ARTICLE

    # 3. candidate score balance (ratio 2nd/1st > 0.8 → index-page signals)
    # (body link count / text length hoisted — steps 3 and 4 both use them)
    total_links = (count_links_indexed(doc.body, link_index)
                   if link_index is not None
                   else len(get_elements_by_tag_name(doc.body, "a")))
    body_text_length = len(get_inner_text(doc.body))
    if len(candidates) >= 2:
        top_score = top.score or 0.0
        second_score = candidates[1].score or 0.0
        score_ratio = _js_div(second_score, top_score)
        if score_ratio > 0.8:
            body_link_density = total_links / (body_text_length or 1)
            if body_link_density > 0.25 or link_density > 0.3:
                return OTHER

    # 4. many links + little text → OTHER
    if total_links > 30 and body_text_length < char_threshold * 1.5:
        return OTHER

    # 5. final: moderate text with low link density → ARTICLE
    if text_length >= 140 and link_density <= 0.5:
        return ARTICLE
    return OTHER
