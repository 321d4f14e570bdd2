"""Snapshot serialization: VDOM tree ↔ flat id-keyed JSON.

Reimplements /root/reference/src/serializer.ts:121-161 (serialize) and
209-284 (deserialize): the tree becomes a flat ``{id: node}`` table with
``childrenIds``/``parentId`` adjacency — the exact encoding the Spark node
table (readability_spark.udfs.explode_nodes) uses relationally, which is
why a serialized snapshot column round-trips losslessly through Parquet.

Ids are assigned depth-first starting at 1 (the reference pre-increments).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from .vdom import VElement, VNode, VText


def serialize_tree(root: Optional[VElement],
                   candidates: Optional[list] = None,
                   metadata: Optional[dict] = None,
                   links: Optional[list] = None,
                   node_count: int = 0,
                   page_type: str = "other") -> str:
    """Snapshot → JSON string (serializer.ts:121-161)."""
    nodes: dict[int, dict] = {}
    node_ids: dict[int, int] = {}        # id(obj) → serialized id
    counter = [0]

    def assign_id(node: VNode) -> int:
        key = id(node)
        if key in node_ids:
            return node_ids[key]
        counter[0] += 1
        node_ids[key] = counter[0]
        return counter[0]

    def serialize_node(node: VNode, parent_id: Optional[int]) -> int:
        nid = assign_id(node)
        if nid in nodes:
            if nodes[nid].get("parentId") is None and parent_id is not None:
                nodes[nid]["parentId"] = parent_id
            return nid
        if node.nodeType == "element":
            rec: dict[str, Any] = {
                "id": nid, "type": "element", "tagName": node.tag,
                "attributes": dict(node.attrs),
                "childrenIds": [],              # filled after registration
                "parentId": parent_id,
            }
            if node.score is not None:
                rec["readabilityScore"] = node.score
            nodes[nid] = rec
            rec["childrenIds"] = [
                serialize_node(c, nid) for c in node.children]
        else:
            nodes[nid] = {
                "id": nid, "type": "text", "textContent": node.text,
                "parentId": parent_id,
            }
        return nid

    root_id = serialize_node(root, None) if root is not None else None

    serializable_candidates = []
    for cand in candidates or []:
        el = cand.get("element") if isinstance(cand, dict) else cand
        score = cand.get("score", 0.0) if isinstance(cand, dict) else (
            el.score or 0.0)
        eid = node_ids.get(id(el))
        if eid is not None:
            serializable_candidates.append({"score": score,
                                            "elementId": eid})

    return json.dumps({
        "rootId": root_id,
        "nodes": nodes,
        "metadata": metadata or {},
        "links": links or [],
        "mainCandidates": serializable_candidates,
        "nodeCount": node_count,
        "pageType": page_type,
    }, ensure_ascii=False)


def deserialize_tree(json_string: str) -> dict:
    """JSON string → snapshot dict (serializer.ts:209-284).

    Returns {root, node_count, main_candidates, links, metadata, page_type};
    parent pointers ARE relinked (unlike the reference, which cannot rebuild
    its WeakRefs — serializer.ts:243-247 leaves parents unset; we can, and
    downstream scoring needs them)."""
    data = json.loads(json_string)
    built: dict[int, VNode] = {}

    for id_str, nd in data["nodes"].items():
        nid = int(id_str)
        if nd["type"] == "element":
            el = VElement(nd["tagName"], dict(nd["attributes"]))
            if "readabilityScore" in nd:
                el.score = nd["readabilityScore"]
            built[nid] = el
        else:
            built[nid] = VText(nd["textContent"])

    for id_str, nd in data["nodes"].items():
        if nd["type"] != "element":
            continue
        parent = built[int(id_str)]
        parent.children = []
        for cid in nd["childrenIds"]:
            child = built.get(cid)
            if child is not None:
                parent.children.append(child)
                child.parent = parent

    root = built.get(data["rootId"]) if data.get("rootId") is not None \
        else None
    main_candidates = []
    for c in data.get("mainCandidates") or []:
        el = built.get(c["elementId"])
        if el is not None and el.nodeType == "element":
            main_candidates.append({"element": el, "score": c["score"]})

    return {
        "root": root,
        "node_count": data.get("nodeCount", 0),
        "main_candidates": main_candidates,
        "links": data.get("links") or [],
        "metadata": data.get("metadata") or {},
        "page_type": data.get("pageType", "other"),
    }
