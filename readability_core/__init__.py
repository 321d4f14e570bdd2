"""readability_core — pure-Python main-content extraction heuristics.

No Spark imports anywhere in this package: it is the payload shipped to
executors via ``spark-submit --py-files`` and applied per Arrow batch by
the pandas UDFs in ``readability_spark``.

Reimplemented from the public behavior of mizchi/readability
(/root/reference, v0.7.6); see each module's docstring for file:line parity
citations.
"""

from .classify import ARTICLE, OTHER, classify_page_type
from .extract import extract
from .metadata import (
    extract_links,
    get_article_byline,
    get_article_lang,
    get_article_site_name,
    get_article_title,
)
from .preprocess import preprocess_document
from .render import (
    count_nodes,
    format_document,
    stringify,
    to_html,
    to_markdown,
)
from .scoring import find_main_candidates, is_probably_content
from .vdom import VDocument, VElement, VText, parse_html, serialize_to_html

__all__ = [
    "ARTICLE", "OTHER", "classify_page_type", "extract", "extract_links",
    "get_article_byline", "get_article_lang", "get_article_site_name",
    "get_article_title", "preprocess_document", "count_nodes",
    "format_document", "stringify", "to_html", "to_markdown",
    "find_main_candidates", "is_probably_content", "VDocument", "VElement",
    "VText", "parse_html", "serialize_to_html",
]
__version__ = "0.1.0"
