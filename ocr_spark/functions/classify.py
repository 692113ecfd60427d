"""A4 — document classification as native Catalyst expressions
(reference core/classification.py:63-115): keyword containment scoring
(+1 / +2 multiword), regex pattern scoring (+5), argmax with tie priority
vehicle_rc > pan > aadhaar and all-zero default 'aadhaar'.

Fully JVM-side: sums of CASE WHEN over contains()/rlike() — Catalyst folds
the literal keyword lists at plan time."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_spark import config as C


def type_score(text: Column, dtype: str) -> Column:
    lower = F.lower(text)
    score: Column = F.lit(0)
    for kw in C.TYPE_KEYWORDS[dtype]:
        w = C.KEYWORD_MULTIWORD_WEIGHT if len(kw.split()) > 1 else C.KEYWORD_WEIGHT
        score = score + F.when(lower.contains(kw.lower()), F.lit(w)).otherwise(F.lit(0))
    for pat in C.TYPE_PATTERNS[dtype]:
        score = score + F.when(text.rlike("(?i)" + pat), F.lit(C.PATTERN_WEIGHT)).otherwise(F.lit(0))
    return score


def classify(text: Column) -> dict[str, Column]:
    """Returns {'doc_type': Column, 'score_<t>': Column...}."""
    scores = {t: type_score(text, t) for t in C.TYPE_KEYWORDS}
    mx = F.greatest(*scores.values())
    # Priority-ordered equality chain == reference argmax + tie-break
    # (classification.py:94-112): unique max picks itself; ties resolve in
    # CLASSIFY_PRIORITY order.
    doc_type = F.when(mx == 0, F.lit(C.CLASSIFY_DEFAULT))
    for t in C.CLASSIFY_PRIORITY[:-1]:
        doc_type = doc_type.when(scores[t] == mx, F.lit(t))
    doc_type = doc_type.otherwise(F.lit(C.CLASSIFY_PRIORITY[-1]))
    out = {"doc_type": doc_type}
    for t, s in scores.items():
        out[f"score_{t}"] = s
    return out
