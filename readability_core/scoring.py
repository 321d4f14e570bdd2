"""Candidate scoring — the aggregation core of the extractor.

Reimplements the reference's scoring pass
(/root/reference/src/extract/extract.ts:57-97, 294-483): tag-based base
scores, class/id regex weighting, per-element content scores propagated to
ancestors with level dividers, link/text-density scaling, parent-climb, and
the top-N candidate selection.  Quirks preserved deliberately:

- the parent-climb loop compares against the literal tag name ``"BODY"``
  while all tags are lowercase, so the climb can pass the body and reach the
  documentElement (extract.ts:398-415);
- score ties keep insertion (document) order — JS ``Array.sort`` and Python
  ``sorted`` are both stable;
- ``scoreRatio = second/top`` follows JS float semantics (x/0 → ±inf,
  0/0 → nan) in the classifier.
"""

from __future__ import annotations

import math
from typing import Optional

from .constants import (
    DEFAULT_N_TOP_CANDIDATES,
    DEFAULT_TAGS_TO_SCORE,
    RE_COMMAS,
    RE_NEGATIVE,
    RE_OK_MAYBE_CANDIDATE,
    RE_POSITIVE,
    RE_UNLIKELY_CANDIDATES,
)
from .dom import (
    collect_by_tags,
    get_elements_by_tag_name,
    get_inner_text,
    get_link_density,
    get_link_density_indexed,
    get_node_ancestors,
    get_text_density,
    is_probably_visible,
)
from .vdom import VDocument, VElement

_TAG_BASE_SCORE = {
    "article": 10, "main": 10,
    "div": 5,
    "pre": 3, "td": 3, "blockquote": 3,
    "address": -3, "ol": -3, "ul": -3, "dl": -3, "dd": -3, "dt": -3,
    "li": -3, "form": -3,
    "h1": -5, "h2": -5, "h3": -5, "h4": -5, "h5": -5, "h6": -5, "th": -5,
}


def get_class_weight(el: VElement) -> int:
    """±25 per positive/negative regex hit on class and id (extract.ts:294-318)."""
    weight = 0
    cls = el.class_name
    if cls:
        if RE_NEGATIVE.search(cls):
            weight -= 25
        if RE_POSITIVE.search(cls):
            weight += 25
    eid = el.id
    if eid:
        if RE_NEGATIVE.search(eid):
            weight -= 25
        if RE_POSITIVE.search(eid):
            weight += 25
    return weight


def initialize_node(el: VElement) -> None:
    """Tag base score + class weight (extract.ts:57-97)."""
    el.score = float(_TAG_BASE_SCORE.get(el.tag, 0) + get_class_weight(el))


def find_main_candidates(
    doc: VDocument, nb_top_candidates: int = DEFAULT_N_TOP_CANDIDATES,
    link_index: Optional[list] = None,
    de_nodes: Optional[dict] = None,
    body_nodes: Optional[dict] = None,
) -> list[VElement]:
    """Score-and-rank main-content candidates (extract.ts:324-443).

    ``de_nodes``/``body_nodes``: optional pre-collected tag maps (supersets
    fine) from collect_by_tags over the documentElement resp. body —
    identical lists/order by construction; extract_from_doc shares one
    pair of walks across metadata, scoring, and classification."""
    # 1. semantic short-circuit: a single <article> or <main> wins outright
    # (one DFS for both tags; identical per-tag lists and check order)
    semantic = de_nodes if de_nodes is not None else collect_by_tags(
        doc.document_element, ("article", "main"))
    for tag in ("article", "main"):
        els = semantic[tag]
        if len(els) == 1:
            return [els[0]]

    # 2. scoring-based detection
    body = doc.body
    candidates: list[VElement] = []
    elements_to_score: list[VElement] = []
    by_tag = body_nodes if body_nodes is not None else collect_by_tags(
        body, DEFAULT_TAGS_TO_SCORE)
    for tag in DEFAULT_TAGS_TO_SCORE:           # tag order defines tie order
        elements_to_score.extend(by_tag[tag])

    for el in elements_to_score:
        inner = get_inner_text(el)
        if len(inner) < 25:
            continue
        ancestors = get_node_ancestors(el, 3)
        if not ancestors:
            continue
        content_score = 1.0
        content_score += len(RE_COMMAS.split(inner))        # commas + 1
        content_score += min(len(inner) // 100, 3)          # length bonus ≤3

        for level, ancestor in enumerate(ancestors):
            if ancestor.score is None:
                initialize_node(ancestor)
                candidates.append(ancestor)
            divider = 1 if level == 0 else (2 if level == 1 else level * 3)
            ancestor.score += content_score / divider

    scored: list[tuple[VElement, float]] = []
    seen_ids: set[int] = set()
    for cand in candidates:
        if cand.score is None:
            continue
        link_density = (get_link_density_indexed(cand, link_index)
                        if link_index is not None
                        else get_link_density(cand))
        cand.score *= 1 - link_density
        text_density = get_text_density(cand)
        if text_density > 0:
            cand.score *= 1 + min(text_density / 10, 0.1)

        # parent-climb: replace by any strictly-higher-scoring ancestor
        # (extract.ts:398-415; "BODY" never matches lowercase tags, so the
        # walk can continue to the documentElement — preserved)
        cur = cand
        parent = cur.parent
        while parent is not None:
            if parent.tag == "BODY":
                break
            if parent.score is not None and parent.score > cur.score:
                cur = parent
            parent = parent.parent

        if cur.score is not None and id(cur) not in seen_ids:
            seen_ids.add(id(cur))
            scored.append((cur, cur.score))

    scored.sort(key=lambda t: -t[1])            # stable: ties keep doc order
    top = [el for el, _ in scored[:nb_top_candidates]]
    if not top and doc.body is not None:
        return [doc.body]
    return top


def is_probably_content(el: VElement,
                        link_index: Optional[list] = None) -> bool:
    """Content gate on the top candidate (extract.ts:448-483)."""
    if not is_probably_visible(el):
        return False
    match_string = f"{el.class_name} {el.id}"
    if RE_UNLIKELY_CANDIDATES.search(match_string) and not RE_OK_MAYBE_CANDIDATE.search(match_string):
        return False
    if len(get_inner_text(el)) < 140:
        return False
    density = (get_link_density_indexed(el, link_index)
               if link_index is not None else get_link_density(el))
    if density > 0.5:
        return False
    if get_text_density(el) < 0.1:
        return False
    return True
