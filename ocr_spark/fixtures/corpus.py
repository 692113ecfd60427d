"""Deterministic synthetic Common-Crawl-style page corpus.

Implements FIXTURES.md: every value derives from sha256 of the document index
— no RNG state, no wall clock — so any two runs (and any two parallelism
levels) generate bit-identical corpora. The `text` column carries the
ground-truth main-content text (what a perfect extractor returns); a fixture
test asserts ocr_spark.extraction.html_extract reproduces it byte-for-byte.

Page bodies embed the field patterns the reference extractors must find
(12-digit ids, PAN tokens incl. OCR-confusion corruption for the
fuzzy-correction path documents/pan.py:117-157, SS-DD-XX-NNNN registrations,
DD/MM/YYYY dates, 6-digit PINs, keyword anchors) plus nav/footer link farms
(boilerplate), script/style noise, and optional rasterized payload sidecars.
"""

from __future__ import annotations

import hashlib
import struct
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_spark.extraction.glyphs import GLYPH_H, glyph_array
from ocr_spark.extraction.recognizer import SPACE_COLS, COL_SPACE

N_HOSTS = 20
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

FIRST_NAMES = ["Ramesh", "Suresh", "Anita", "Priya", "Vikram", "Sunita", "Arjun", "Kavita", "Rahul", "Meena"]
MIDDLE_NAMES = ["Chandra", "Devi", "Lal", "Prasad", "Raj", "Kumari", "Nath", "Bala", "Mohan", "Rani"]
LAST_NAMES = ["Kumar", "Sharma", "Patel", "Singh", "Gupta", "Verma", "Reddy", "Iyer", "Das", "Nair"]
CITIES = ["Mumbai", "Pune", "Delhi", "Chennai", "Jaipur", "Lucknow", "Bhopal", "Nagpur", "Indore", "Surat"]
# Filler vocabulary deliberately avoids every classification keyword AND any
# substring thereof ('rc' in 'search', 'pan' in 'expanding', 'male', ...), so
# plain webpages take the all-zero -> default-'aadhaar' path
# (classification.py:97-99).
FILLER = (
    "the quick survey of municipal records shows steady progress across "
    "districts with new service centers opening where citizens verify "
    "their details and update records during working hours"
).split()
NAV_WORDS = ["Home", "About", "Services", "Contact", "Login", "Register", "Help", "News", "Portal", "Downloads"]
RC_STATES = ["MH", "DL", "KA", "TN", "UP", "GJ", "RJ", "WB", "MP", "HR"]
RC_SERIES = ["AB", "CD", "XY", "PQ", "ZZ", "KL", "MN", "RS", "TU", "VW"]
PAN_FOURTH = "PCFH"  # valid 4th chars subset (reference pan.py:178)

DEVANAGARI = "०१२३४५६७८९"


def _digest(seed: str) -> bytes:
    return hashlib.sha256(seed.encode("utf-8")).digest()


def _ints(seed: str, n: int) -> list[int]:
    """n deterministic 32-bit ints from chained sha256."""
    out: list[int] = []
    d = _digest(seed)
    while len(out) < n:
        for i in range(0, len(d) - 3, 4):
            out.append(struct.unpack(">I", d[i : i + 4])[0])
            if len(out) >= n:
                break
        d = hashlib.sha256(d).digest()
    return out


def render_payload(text: str) -> bytes:
    """Rasterize text with the fixed glyph set: 2-byte BE height + u8 pixels."""
    cols: list[np.ndarray] = []
    for ch in text:
        if ch == " ":
            cols.append(np.full((GLYPH_H, SPACE_COLS), 255, dtype=np.uint8))
        else:
            g = glyph_array(ch)
            cols.append(np.where(g > 0, 0, 255).astype(np.uint8))
        cols.append(np.full((GLYPH_H, COL_SPACE), 255, dtype=np.uint8))
    img = np.hstack(cols) if cols else np.full((GLYPH_H, 1), 255, dtype=np.uint8)
    return struct.pack(">H", img.shape[0]) + img.tobytes()


def _norm(s: str) -> str:
    """Whitespace-collapse exactly like html_extract block normalization."""
    return " ".join(s.split())


def _aadhaar_blocks(r: list[int], lang: str) -> list[str]:
    name = f"{FIRST_NAMES[r[0] % 10]} {MIDDLE_NAMES[r[19] % 10]} {LAST_NAMES[r[1] % 10]}"
    num = f"{2 + r[2] % 8}{r[3] % 1000:03d} {r[4] % 10000:04d} {r[5] % 10000:04d}"
    day, mon, year = 1 + r[6] % 28, 1 + r[7] % 12, 1950 + r[8] % 60
    pin = f"{1 + r[9] % 9}{r[10] % 100000:05d}"
    gender = "MALE" if r[11] % 2 else "FEMALE"
    sparse = r[18] % 6 == 1  # anchor-poor variant -> lands in the REVIEW band
    header = (
        "identity record issued for welfare scheme verification"
        if sparse
        else "GOVERNMENT OF INDIA UNIQUE IDENTIFICATION AUTHORITY OF INDIA UIDAI"
    )
    blocks = [
        header,
        f"{name} holder signature below",
        f"Date of Birth DOB : {day:02d}/{mon:02d}/{year}",
        f"Gender {gender} identification verified",
        f"Aadhaar Number {num}",
        f"address : {r[12] % 900 + 100} gandhi road {CITIES[r[13] % 10].lower()} pin {pin}",
    ]
    if r[14] % 3 == 0:
        blocks.append(f"Enrollment ID {r[15] % 10000:04d}/{r[16] % 100000:05d}/{r[17] % 100000:05d}")
    if lang == "hi":
        dev_pin = "".join(DEVANAGARI[int(c)] for c in pin)
        blocks.append(f"भारत सरकार आधार पता {CITIES[r[13] % 10].lower()} पिन {dev_pin}")
    if r[18] % 4 == 0:  # missing-name variant -> mandatory-field hard reject
        blocks[1] = "details of the holder are shown on this card"
    return blocks


def _pan_blocks(r: list[int], lang: str) -> list[str]:
    name = f"{FIRST_NAMES[r[0] % 10].upper()} {MIDDLE_NAMES[r[19] % 10].upper()} {LAST_NAMES[r[1] % 10].upper()}"
    father = f"{FIRST_NAMES[r[2] % 10].upper()} {MIDDLE_NAMES[r[18] % 10].upper()} {LAST_NAMES[r[3] % 10].upper()}"
    letters = "".join(chr(65 + x % 26) for x in r[4:7])
    pan = f"{letters[:3]}{PAN_FOURTH[r[7] % 4]}{chr(65 + r[8] % 26)}{r[9] % 10000:04d}{chr(65 + r[10] % 26)}"
    if r[11] % 5 == 0:  # OCR-confusion corruption: digits -> lookalike letters
        body = pan[5:9].replace("0", "O").replace("1", "I").replace("5", "S").replace("8", "B")
        pan_shown = pan[:5] + body + pan[9]
    else:
        pan_shown = pan
    day, mon, year = 1 + r[12] % 28, 1 + r[13] % 12, 1955 + r[14] % 50
    blocks = [
        "INCOME TAX DEPARTMENT GOVT. OF INDIA",
        f"Permanent Account Number PAN Card {pan_shown}",
        name,
        f"Father's Name : {father}.",
        f"Date of Birth : {day:02d}/{mon:02d}/{year}",
        "Signature of the card holder appears below this line",
    ]
    if r[15] % 4 == 0:  # missing-date variant -> mandatory-field hard reject
        blocks[4] = "the date field on this card is not printed clearly"
    return blocks


def _rc_blocks(r: list[int], lang: str) -> list[str]:
    owner = f"{FIRST_NAMES[r[0] % 10]} {MIDDLE_NAMES[r[19] % 10]} {LAST_NAMES[r[1] % 10]}"
    reg = f"{RC_STATES[r[2] % 10]}-{1 + r[3] % 99:02d}-{RC_SERIES[r[4] % 10]}-{1000 + r[5] % 9000}"
    engine = f"EN{r[6] % 10**8:08d}K"
    chassis = f"MA{r[7] % 10**10:010d}XZ"
    day, mon, year = 1 + r[8] % 28, 1 + r[9] % 12, 2005 + r[10] % 19
    fuel = ["PETROL", "DIESEL", "CNG", "ELECTRIC"][r[11] % 4]
    blocks = [
        "REGISTRATION CERTIFICATE issued by the Registering Authority",
        f"Registration Number {reg}",
        f"Owner Name : {owner}.",
        f"Engine No : {engine} and Chassis No : {chassis}",
        f"Registration Date : {day:02d}/{mon:02d}/{year} Fuel {fuel}",
        f"Vehicle Class LMV Maker : MARUTI SUZUKI. seating cap : {2 + r[12] % 6}",
    ]
    if r[13] % 7 == 2:
        # engine/chassis missing: mandatory fields still present (only
        # registration_number + owner_name are required, pipeline.py:603) but
        # schema score drops to 0.6 -> the REVIEW confidence band.
        blocks[3] = "the engine and chassis plate details are worn out"
    if r[13] % 5 == 0:  # second conflicting registration -> ambiguity reject (SO4)
        reg2 = f"{RC_STATES[r[14] % 10]}-{1 + r[15] % 99:02d}-{RC_SERIES[r[16] % 10]}-{1000 + r[17] % 9000}"
        if reg2 != reg:
            blocks.append(f"Previous Registration Number {reg2}")
    return blocks


def _generic_blocks(r: list[int], lang: str) -> list[str]:
    blocks = []
    for b in range(2 + r[0] % 4):
        words = [FILLER[(r[1] + b * 7 + k) % len(FILLER)] for k in range(8 + r[2 + b % 6] % 12)]
        blocks.append(" ".join(words))
    return blocks


_BUILDERS = {"aadhaar": _aadhaar_blocks, "pan": _pan_blocks, "vehicle_rc": _rc_blocks, "generic": _generic_blocks}
DOC_TYPES = ["aadhaar", "pan", "vehicle_rc", "generic"]


def make_page(i: int) -> dict:
    """Build one deterministic page row (+ optional payload sidecar)."""
    seed = f"doc-{i}"
    r = _ints(seed, 40)
    bucket = r[0]

    # Zipf-ish host skew: host0 owns ~30% of urls (FIXTURES.md §1).
    h = 0 if bucket % 100 < 30 else 1 + (r[1] % (N_HOSTS - 1))
    url = f"https://host{h}.example/{_digest(seed).hex()[:12]}"
    lang = "hi" if bucket % 7 == 0 else "en"
    doc_type = DOC_TYPES[r[2] % 4]

    # A small slice of pure link-farm pages (no content blocks at all)
    # exercises the no-text-detected hard-reject path (decision.py:85-93).
    if bucket % 23 == 5:
        doc_type = "linkfarm"
        blocks = []
    else:
        blocks = _BUILDERS[doc_type](r[3:], lang)

    # Conflict slice: a second DISTINCT aadhaar id on the same page (two
    # cards of one schema) -> conflicting_schemas hard-reject branch.
    conflict = bucket % 23 == 11 and doc_type == "aadhaar"
    if conflict:
        n2 = (2000 + r[34] % 8000, 1000 + r[35] % 9000, 1000 + r[36] % 9000)
        blocks.append(
            f"Duplicate card surrendered at office {n2[0]:04d} {n2[1]:04d} {n2[2]:04d}"
        )

    # Multi-document slice: the SAME document repeated as a second content
    # cluster behind a structural separator (two physical documents on one
    # scan) -> multi_document review branch. Same ids -> no schema conflict.
    multi = (
        bucket % 23 == 7
        and doc_type in ("aadhaar", "pan", "vehicle_rc")
        and not conflict
    )
    content = [_norm(b) for b in blocks] * (2 if multi else 1)

    # Payload sidecar on ~20% of urls: a field string rasterized to glyphs.
    payload_text = None
    if r[38] % 5 == 3 and doc_type != "linkfarm":
        if doc_type == "vehicle_rc":
            payload_text = f"FIT UPTO {1 + r[30] % 28:02d}/{1 + r[31] % 12:02d}/{2020 + r[32] % 5}"
        elif doc_type == "pan":
            payload_text = f"PAN REF {r[30] % 10**6:06d}"
        else:
            payload_text = f"VID {r[30] % 10000:04d} {r[31] % 10000:04d} {r[32] % 10000:04d} {r[33] % 10000:04d}"

    nav = " | ".join(
        f'<a href="/{NAV_WORDS[(r[20] + k) % 10].lower()}">{NAV_WORDS[(r[20] + k) % 10]}</a>'
        for k in range(3 + r[21] % 5)
    )
    footer = " ".join(
        f'<a href="/f{k}">{NAV_WORDS[(r[22] + k) % 10]}</a>' for k in range(2 + r[23] % 4)
    )
    body_parts = [f"<p>{b}</p>" for b in blocks]
    if payload_text is not None:
        body_parts.append(f'<figure><img data-payload-id="{url}" alt="scan"/></figure>')
    mains = f"<main>{''.join(body_parts)}</main>"
    if multi:
        # duplicate document behind an <aside> separator: two content
        # clusters for the region detector
        mains += f"<aside>{nav}</aside>{mains}"

    html = (
        "<!DOCTYPE html><html><head><title>Records portal</title>"
        "<style>body{font:14px serif}</style>"
        f"<script>var t={bucket % 997};</script></head>"
        f"<body><nav>{nav}</nav>"
        "<!-- generator: records-portal -->"
        f"{mains}"
        f"<footer>{footer}</footer></body></html>"
    )

    ts = int(EPOCH.timestamp()) + bucket % 86400
    return {
        "url": url,
        "warc_ts": ts * 1_000_000,  # microseconds for pyarrow timestamp('us')
        "html": html.encode("utf-8"),
        "text": "\n".join(content),
        "lang": lang,
        "doc_type_truth": doc_type,
        "payload_text": payload_text,
    }


def build_corpus(n_rows: int) -> tuple[pa.Table, pa.Table]:
    """Build (pages, payloads) Arrow tables for n_rows documents."""
    rows = [make_page(i) for i in range(n_rows)]
    pages = pa.table(
        {
            "url": pa.array([x["url"] for x in rows], pa.string()),
            "warc_ts": pa.array([x["warc_ts"] for x in rows], pa.timestamp("us", tz="UTC")),
            "html": pa.array([x["html"] for x in rows], pa.binary()),
            "text": pa.array([x["text"] for x in rows], pa.string()),
            "lang": pa.array([x["lang"] for x in rows], pa.string()),
        }
    )
    pay = [x for x in rows if x["payload_text"] is not None]
    payloads = pa.table(
        {
            "url": pa.array([x["url"] for x in pay], pa.string()),
            "payload": pa.array([render_payload(x["payload_text"]) for x in pay], pa.binary()),
            "payload_text": pa.array([x["payload_text"] for x in pay], pa.string()),
        }
    )
    return pages, payloads


def write_corpus(out_dir: str, n_rows: int) -> tuple[str, str]:
    """Write pages.parquet + payloads.parquet under out_dir; returns paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pages, payloads = build_corpus(n_rows)
    p1 = os.path.join(out_dir, "pages.parquet")
    p2 = os.path.join(out_dir, "payloads.parquet")
    # Small row groups: a single-row-group file caps the Spark scan (and the
    # shuffle write feeding the salt repartition) at ONE task — a serial
    # Amdahl fraction that wrecks scaling. Real crawls arrive as many files;
    # 2048-row groups reproduce that parallelism for the benchmark corpus.
    pq.write_table(pages, p1, row_group_size=2048)
    pq.write_table(payloads, p2, row_group_size=2048)
    return p1, p2


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "data/pages_smoke"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    print(write_corpus(out, n))
