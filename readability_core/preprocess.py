"""Boilerplate stripping — the DELETE pass before scoring.

Reimplements the reference's preprocess stage
(/root/reference/src/extract/preprocess.ts:62-138): remove unwanted
semantic/technical tags, then remove likely-ad elements by class/id
patterns and ad-related attributes.
"""

from __future__ import annotations

from .constants import AD_PATTERNS, TAGS_TO_REMOVE
from .dom import get_elements_by_tag_name
from .vdom import VDocument, VElement

_REMOVE_SET = frozenset(TAGS_TO_REMOVE)


def is_likely_ad(el: VElement) -> bool:
    """preprocess.ts:114-138."""
    combined = f"{el.class_name} {el.id}"
    for pat in AD_PATTERNS:
        if pat.search(combined):
            return True
    a = el.attrs
    return (
        a.get("role") == "advertisement"
        or "data-ad" in a
        or "data-ad-client" in a
        or "data-ad-slot" in a
    )


def preprocess_document(doc: VDocument) -> VDocument:
    """preprocess.ts:62-70 — remove unwanted tags, then ads."""
    # 1. unwanted tags (preprocess.ts:75-90): splice matching subtrees out
    for el in get_elements_by_tag_name(doc.document_element, _REMOVE_SET):
        parent = el.parent
        if parent is not None:
            try:
                parent.children.remove(el)
            except ValueError:
                pass  # already detached via an ancestor
    # 2. ad elements under body (preprocess.ts:95-109)
    for el in get_elements_by_tag_name(doc.body, "*"):
        parent = el.parent
        if parent is not None and is_likely_ad(el):
            try:
                parent.children.remove(el)
            except ValueError:
                pass
    # 3. invalidate memoized inner text: anything that read text BEFORE
    # preprocessing (e.g. the fused structure-detection pass) populated
    # txt_cache on nodes whose subtrees just changed — stale caches would
    # silently corrupt candidate scoring.  Clear from the body too: the
    # ad pass above can splice the body itself out of the documentElement
    # (root-inclusive tag scan — faithful to the reference) while the doc
    # keeps using the detached body
    _clear_text_caches(doc.document_element)
    _clear_text_caches(doc.body)
    return doc


def _clear_text_caches(root) -> None:
    stack = [root]
    while stack:
        node = stack.pop()
        node.txt_cache = None
        node.norm_cache = None
        stack.extend(c for c in node.children if c.nodeType == "element")
