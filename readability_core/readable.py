"""Readable facade — the reference's convenience API surface.

Reimplements the ``Readable`` class workflow
(/root/reference/src/readable.ts:64-277): one parse+extract, then cheap
projections (text / markdown / html / aria snapshot / link hierarchy /
page structure / serialized snapshot).  On Spark, a Readable is simply a
row of the output table and these methods are column projections; this
class exists for single-document library use and for tests that mirror the
reference's e2e suites (src/test/readability-core.test.ts).
"""

from __future__ import annotations

from typing import Any, Optional

from .aria import aria_tree_to_string, build_aria_tree
from .classify import ARTICLE
from .constants import DEFAULT_CHAR_THRESHOLD
from .detect import analyze_page_structure, extract_document_content
from .extract import extract_full
from .hierarchy import analyze_link_hierarchy
from .render import format_document, stringify, to_html, to_markdown
from .serializer import serialize_tree


class Readable:
    """extract() once; project many ways (readable.ts:100-277)."""

    def __init__(self, html: str,
                 char_threshold: int = DEFAULT_CHAR_THRESHOLD,
                 url: str = "about:blank"):
        self._html = html
        self._url = url
        # one parse + one extraction; the doc/root/candidates are retained
        # for projections (readable.ts keeps the same references)
        self.snapshot, self._doc, self._root, self._candidates = \
            extract_full(html, char_threshold=char_threshold, base_uri=url)

    @classmethod
    def from_html(cls, html: str, **kw) -> "Readable":
        return cls(html, **kw)

    @classmethod
    def load(cls, json_string: str) -> dict:
        """readable.ts:179-192 — rehydrate a persisted snapshot.  Returns
        the deserialized snapshot dict (root/candidates/metadata/page_type);
        projections over it go through readability_core.render directly."""
        from .serializer import deserialize_tree
        return deserialize_tree(json_string)

    @property
    def page_type(self) -> str:
        return self.snapshot["page_type"]

    @property
    def title(self) -> str:
        return self.snapshot["title"]

    def to_text(self) -> str:
        return self.snapshot["extracted_text"]

    def to_markdown(self) -> str:
        return self.snapshot["extracted_md"]

    def to_html(self) -> str:
        return self.snapshot["extracted_html"]

    def aria_snapshot(self) -> str:
        return self.snapshot["aria_tree"]

    def get_link_hierarchy(self) -> dict:
        """readable.ts:255-257."""
        links = [{"href": l["href"], "text": l["text"]}
                 for l in self.snapshot["links"]]
        return analyze_link_hierarchy(links, self._url)

    def get_page_structure(self) -> dict:
        """readable.ts:267-276 — re-analyzes the retained RAW html."""
        return analyze_page_structure(self._html)

    def get_document_content(self) -> dict:
        return extract_document_content(self._html)

    def serialize(self) -> str:
        """readable.ts:237-240 — persistable snapshot JSON."""
        return serialize_tree(
            self._root,
            candidates=[{"element": c, "score": c.score or 0.0}
                        for c in self._candidates],
            metadata={"title": self.snapshot["title"],
                      "lang": self.snapshot["lang"],
                      "siteName": self.snapshot["site_name"],
                      "url": self._url},
            links=self.snapshot["links"],
            node_count=self.snapshot["node_count"],
            page_type=self.snapshot["page_type"],
        )

    def ai_summary(self) -> dict:
        """cli.js:351 — word/char counts over the markdown projection."""
        md = self.snapshot["extracted_md"]
        words = [w for w in md.split() if w]
        return {
            "title": self.snapshot["title"],
            "page_type": self.snapshot["page_type"],
            "word_count": len(words),
            "char_count": len(md),
            "n_links": self.snapshot["n_links"],
        }
