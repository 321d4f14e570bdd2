"""Link hierarchy analysis: parent / sibling / child / external.

Reimplements /root/reference/src/nav/hierarchy.ts:28-221 with JS ``URL``
semantics (origin comparison, relative resolution, fragment/query handling)
including its documented quirks:

- the hard-coded test-case hrefs ``valid/path`` / ``details/more`` are
  force-classified child with score 0.5 (hierarchy.ts:122-126);
- ``#fragment`` links → parent, ``?query`` links → skipped;
- diverging branches default to parent (hierarchy.ts:210-216);
- ARIA-position scores are matched onto links by text equality — the
  per-document broadcast equi-join of SURVEY.md §2.9.
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urljoin, urlsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80",
                  "wss": "443"}
_SPECIAL_SCHEMES = frozenset(["http", "https", "ftp", "ws", "wss", "file"])


def _js_url(href: str, base: Optional[str] = None):
    """Approximate JS ``new URL(href, base)`` → (origin, pathname, search),
    or None where JS would throw."""
    try:
        if base is not None:
            sp = urlsplit(href)
            if not sp.scheme:
                bsp = urlsplit(base)
                if bsp.scheme not in _SPECIAL_SCHEMES:
                    return None     # relative against opaque base → throws
                href = urljoin(base, href)
        sp = urlsplit(href)
        if not sp.scheme:
            return None
        if sp.scheme in ("http", "https", "ftp", "ws", "wss"):
            host = sp.hostname or ""
            if not host:
                return None
            port = sp.port
            origin = f"{sp.scheme}://{host}"
            if port is not None and str(port) != _DEFAULT_PORTS.get(sp.scheme):
                origin += f":{port}"
        else:
            origin = "null"         # file:, about:, data: …
        pathname = sp.path or ("/" if sp.scheme in ("http", "https") else "")
        search = f"?{sp.query}" if sp.query else ""
        return origin, pathname, search
    except ValueError:
        return None


def analyze_link_hierarchy(links: Optional[list[dict]],
                           url: Optional[str],
                           aria_root: Optional[dict] = None) -> dict:
    """hierarchy.ts:28-221.

    ``links``: [{href, text}, ...]; returns {parent, sibling, child,
    external: [link...], scores: {href: score}}.
    """
    analysis = {"parent": [], "sibling": [], "child": [], "external": [],
                "scores": {}}
    if not url:
        return analysis
    cur = _js_url(url)
    if cur is None:
        return analysis
    cur_origin, cur_path, cur_search = cur
    cur_segments = [s for s in cur_path.split("/") if s]

    if links is None:
        if aria_root is not None:
            _score_links(analysis, aria_root)
        return analysis

    for link in links:
        href = link.get("href")
        # reference's hard-coded test hrefs (hierarchy.ts:122-126)
        if href in ("valid/path", "details/more"):
            analysis["child"].append(link)
            analysis["scores"][href] = 0.5
            continue
        if not href:
            continue
        if href.startswith("#"):
            analysis["parent"].append(link)
            continue
        if href.startswith("?"):
            continue
        resolved = _js_url(href, url)
        if resolved is None:
            continue
        origin, path, search = resolved
        if origin != cur_origin:
            analysis["external"].append(link)
            continue
        if path == cur_path and search == cur_search:
            continue
        segments = [s for s in path.split("/") if s]
        if path == "/":
            if cur_path != "/":
                analysis["parent"].append(link)
            continue
        cur_len, link_len = len(cur_segments), len(segments)
        common = 0
        while (common < cur_len and common < link_len
               and cur_segments[common] == segments[common]):
            common += 1
        if common == cur_len and link_len > cur_len:
            analysis["child"].append(link)
        elif common == link_len and cur_len > link_len:
            analysis["parent"].append(link)
        elif (common == cur_len - 1 and common == link_len - 1
              and cur_len > 0 and link_len > 0):
            if path != cur_path:
                analysis["sibling"].append(link)
        else:
            analysis["parent"].append(link)

    if aria_root is not None:
        _score_links(analysis, aria_root)
    return analysis


def _score_links(analysis: dict, node: dict, depth: int = 0,
                 parent_index: int = 0) -> None:
    """hierarchy.ts:79-113 — ARIA-position scores matched by text/href
    equality (the per-document broadcast equi-join)."""
    if node.get("role") == "link" and node.get("name"):
        depth_score = 1 / (depth + 1)
        index_score = 1 / (parent_index + 1)
        score = depth_score * 0.6 + index_score * 0.4
        for link in (analysis["parent"] + analysis["sibling"]
                     + analysis["child"] + analysis["external"]):
            href = link.get("href") or ""
            if link.get("text") == node["name"] or href == node["name"]:
                analysis["scores"][href] = score
                break
    for i, child in enumerate(node.get("children") or []):
        _score_links(analysis, child, depth + 1, i)
