"""Improved classifier + URL prior tests (parity: src/classify/classify.ts)."""

from readability_core.classify_improved import (
    analyze_url_pattern,
    classify_improved,
    classify_snapshot_score,
    get_expected_page_type_by_url,
)
from readability_core.scoring import find_main_candidates
from readability_core.vdom import parse_html


def test_url_prior_articles_path():
    assert get_expected_page_type_by_url("https://x.com/articles/a") == "article"


def test_url_prior_three_level_path():
    # the host segment counts toward the 3-level rule (classify.ts:33) —
    # any 2-path-segment https URL matches
    assert get_expected_page_type_by_url("https://x.com/p/q") == "article"


def test_url_prior_numeric_tail():
    assert get_expected_page_type_by_url("https://x.com/12345") == "article"
    assert get_expected_page_type_by_url("https://x.com/post-123.html") == "article"


def test_url_prior_other():
    assert get_expected_page_type_by_url("https://x.com/") == "other"
    assert get_expected_page_type_by_url("https://x.com/about") == "other"
    assert get_expected_page_type_by_url("https://x.com/ab1") == "other"  # <5


def test_analyze_url_pattern_labels():
    assert analyze_url_pattern("https://x.com/123") == "数字のみ (123)"
    assert analyze_url_pattern("https://x.com/a1b.html") == "英数字混合 (a1b)"
    assert analyze_url_pattern("https://x.com/abc") == "英字のみ (abc)"
    assert analyze_url_pattern("https://x.com/") == "末尾なし"


def _doc_and_cands(html):
    doc = parse_html(html)
    return doc, find_main_candidates(doc)


def test_classify_improved_no_headings_is_other():
    # headingCount == 0 triggers the index-page heuristic (classify.ts:159)
    doc, cands = _doc_and_cands(
        "<body><article><p>%s</p></article></body>" % ("words, words. " * 50))
    assert classify_improved(doc, cands) == "other"


def test_classify_improved_article_with_heading():
    doc, cands = _doc_and_cands(
        "<body><article><h2>Head</h2><p>%s</p></article></body>"
        % ("words, words. " * 50))
    assert classify_improved(doc, cands) == "article"


def test_classify_improved_many_listitems_is_other():
    lis = "".join(f"<li>item {i}</li>" for i in range(15))
    doc, cands = _doc_and_cands(
        "<body><article><h2>H</h2><p>%s</p><ul>%s</ul></article></body>"
        % ("text, with commas. " * 40, lis))
    assert classify_improved(doc, cands) == "other"


def test_classify_improved_url_article_id_shortcut():
    doc, cands = _doc_and_cands(
        "<body><article><h2>H</h2><p>short</p></article></body>")
    assert classify_improved(doc, cands, url="https://x.com/articles/a") == "article"
    assert classify_improved(doc, [], url="https://x.com/articles/a") == "other"


def test_snapshot_score_components():
    html = ("<html><body><article><h2>Head</h2><p>%s</p></article></body></html>"
            % ("long text, with commas. " * 40))
    doc = parse_html(html)
    cands = find_main_candidates(doc)
    root = cands[0]
    p, reasons = classify_snapshot_score(root, cands, "about:blank")
    # 0.2 semantic + 0.3 text>=500 + 0.2 low LD + 0.1 heading
    assert abs(p - 0.8) < 1e-9
    assert any("Semantic" in r for r in reasons)


def test_snapshot_score_no_root():
    assert classify_snapshot_score(None, [], "") == (0.0, ["no root/candidates"])


def test_snapshot_score_clamped():
    doc = parse_html("<body><div><p>tiny</p></div></body>")
    cands = find_main_candidates(doc)
    p, _ = classify_snapshot_score(cands[0] if cands else None, cands, "")
    assert 0.0 <= p <= 1.0
