"""Generate the golden extraction-hash table for the fixture corpus.

For each of the 128 reference fixture pages, records md5 hashes of every
deterministic output of the core extractor (FIXTURES.md §3's
expected_extractions, stored compactly as hashes).  tests/test_golden.py
compares the live extractor against this file — any semantic drift in the
parser/scorer/renderers fails loudly with the exact field that moved.

Regenerate ONLY when an intentional behavior change is made:
    python tools/gen_golden.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/reference/test/test-pages"
OUT = os.path.join(REPO, "tests", "golden", "fixture_hashes.json")

HASH_FIELDS = ("extracted_text", "extracted_md", "extracted_html",
               "aria_tree", "title")
SCALAR_FIELDS = ("page_type", "page_type_v2", "node_count", "n_links",
                 "n_candidates", "span_start", "span_end", "char_yield",
                 "body_text_len", "aria_node_count")


def h(s) -> str:
    return hashlib.md5((s or "").encode("utf-8")).hexdigest()[:16]


def main() -> None:
    from readability_core import extract

    golden = {}
    for case in sorted(os.listdir(BASE)):
        src = os.path.join(BASE, case, "source.html")
        if not os.path.exists(src):
            continue
        html = open(src, encoding="utf-8", errors="replace").read()
        r = extract(html)
        rec = {f: h(r[f]) for f in HASH_FIELDS}
        rec.update({f: r[f] for f in SCALAR_FIELDS})
        rec["top_score"] = round(r["top_score"], 6)
        rec["article_possibility"] = round(r["article_possibility"], 6)
        golden[case] = rec

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {len(golden)} cases to {OUT}")


if __name__ == "__main__":
    main()
