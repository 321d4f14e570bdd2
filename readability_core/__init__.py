"""readability_core — pure-Python main-content extraction heuristics.

No Spark imports anywhere in this package: it is the payload shipped to
executors via ``spark-submit --py-files`` and applied per Arrow batch by
the pandas UDFs in ``readability_spark``.

Reimplemented from the public behavior of mizchi/readability
(/root/reference, v0.7.6); see each module's docstring for file:line parity
citations.
"""

from .aria import aria_tree_to_string, build_aria_tree
from .classify import ARTICLE, OTHER, classify_page_type
from .classify_improved import (
    classify_improved,
    classify_snapshot_score,
    get_expected_page_type_by_url,
)
from .detect import (
    analyze_document_structure,
    analyze_page_structure,
    extract_document_content,
)
from .extract import create_extractor, extract, extract_full
from .hierarchy import analyze_link_hierarchy
from .progressive import progressive_dispatch
from .readable import Readable
from .serializer import deserialize_tree, serialize_tree
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
    "ARTICLE", "OTHER", "classify_page_type", "extract", "extract_full",
    "extract_links", "get_article_byline", "get_article_lang",
    "get_article_site_name", "get_article_title", "preprocess_document",
    "count_nodes", "format_document", "stringify", "to_html", "to_markdown",
    "find_main_candidates", "is_probably_content", "VDocument", "VElement",
    "VText", "parse_html", "serialize_to_html", "aria_tree_to_string",
    "build_aria_tree", "classify_improved", "classify_snapshot_score",
    "get_expected_page_type_by_url", "analyze_document_structure",
    "analyze_page_structure", "extract_document_content",
    "analyze_link_hierarchy", "Readable", "deserialize_tree",
    "serialize_tree", "create_extractor", "progressive_dispatch",
]
__version__ = "0.1.0"
