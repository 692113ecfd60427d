"""Generate the golden fixture file from the pure-Python oracle.

Run: python scripts/make_goldens.py [n_rows]
Writes tests/fixtures/golden.jsonl with one row per url:
{url, text_sha256, doc_type, decision, final_score} — the byte-identity
contract the Spark pipeline is checked against (FIXTURES.md §3).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import unicodedata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.fixtures.corpus import make_page, render_payload  # noqa: E402
from ocr_spark.oracle.reference_semantics import process_page  # noqa: E402

GOLDEN_ROWS = 300


def text_hash(text: str) -> str:
    return hashlib.sha256(unicodedata.normalize("NFC", text).encode("utf-8")).hexdigest()


def main(n_rows: int = GOLDEN_ROWS) -> str:
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "golden.jsonl")
    with open(out, "w") as f:
        for i in range(n_rows):
            p = make_page(i)
            blob = render_payload(p["payload_text"]) if p["payload_text"] else None
            r = process_page(p["html"], blob)
            f.write(json.dumps({
                "url": p["url"],
                "text_sha256": text_hash(r["extracted_text"]),
                "doc_type": r["doc_type"],
                "decision": r["decision"],
                "final_score": round(r["final_score"], 12),
                "multi_document": r["multi_document"],
                "conflicting_schemas": r["conflicting_schemas"],
            }, sort_keys=True) + "\n")
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else GOLDEN_ROWS
    print(main(n))
