"""src/classify/classify-functions.test.ts ported verbatim."""

from readability_core.classify_improved import (
    analyze_url_pattern,
    get_expected_page_type_by_url,
)
from readability_core.structural import analyze_content_characteristics
from readability_core.vdom import VDocument, VElement, VText, parse_html


def test_url_articles_path():
    assert get_expected_page_type_by_url("https://example.com/articles/test") == "article"
    assert get_expected_page_type_by_url("https://blog.com/2024/articles/post") == "article"


def test_url_deep_paths():
    assert get_expected_page_type_by_url("https://example.com/blog/2024/my-post") == "article"
    assert get_expected_page_type_by_url("https://site.com/category/subcategory/item") == "article"


def test_url_numeric_ids():
    assert get_expected_page_type_by_url("https://example.com/posts/12345") == "article"
    assert get_expected_page_type_by_url("https://blog.com/p/123456789") == "article"


def test_url_alphanumeric_ids():
    assert get_expected_page_type_by_url("https://example.com/post/abc123def") == "article"
    assert get_expected_page_type_by_url("https://site.com/entry/a1b2c3d4e5") == "article"


def test_url_uuid_patterns():
    assert get_expected_page_type_by_url(
        "https://example.com/post/550e8400-e29b-41d4-a716-446655440000") == "article"
    assert get_expected_page_type_by_url("https://site.com/entry/abc-def-123") == "article"


def test_url_short_paths_are_other():
    assert get_expected_page_type_by_url("https://example.com/") == "other"
    assert get_expected_page_type_by_url("https://example.com/about") == "other"
    assert get_expected_page_type_by_url("https://example.com/blog") == "other"


def test_url_file_extensions():
    assert get_expected_page_type_by_url("https://example.com/posts/12345.html") == "article"
    assert get_expected_page_type_by_url("https://blog.com/entry/abc123.php") == "article"


def test_analyze_url_pattern_basics():
    assert analyze_url_pattern("https://example.com/") == "末尾なし"
    assert analyze_url_pattern("https://example.com/posts/12345") == "数字のみ (12345)"
    assert analyze_url_pattern("https://example.com/post/abc123def") == "英数字混合 (abc123def)"
    assert analyze_url_pattern("https://example.com/about/contact") == "英字のみ (contact)"
    assert analyze_url_pattern("https://example.com/日本語") == "その他 (日本語)"


def test_analyze_url_pattern_extensions():
    assert analyze_url_pattern("https://example.com/posts/12345.html") == "数字のみ (12345)"
    assert analyze_url_pattern("https://example.com/entry/abc123.php") == "英数字混合 (abc123)"
    assert analyze_url_pattern("https://example.com/page.aspx") == "英字のみ (page)"


def test_analyze_url_pattern_special_chars():
    assert analyze_url_pattern("https://example.com/post/my-article-title") == \
        "英字のみ (my-article-title)"
    assert analyze_url_pattern("https://example.com/posts/article_123") == \
        "英数字混合 (article_123)"
    assert analyze_url_pattern("https://example.com/550e8400-e29b-41d4-a716") == \
        "英数字混合 (550e8400-e29b-41d4-a716)"


def test_content_characteristics_no_candidates():
    doc = parse_html("<body></body>")
    out = analyze_content_characteristics(doc, [])
    assert out["page_type"] == "other"
    assert any("no content candidates" in r for r in out["reasons"])


def test_content_characteristics_semantic_tag():
    doc = parse_html("<body></body>")
    candidate = VElement("article")
    t = VText("A" * 300, parent=candidate)
    candidate.children.append(t)
    out = analyze_content_characteristics(doc, [candidate])
    assert any("semantic tag" in r for r in out["reasons"])
