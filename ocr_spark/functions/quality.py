"""F7/F8 — quality metric normalizers + weighted composite + gate as native
Catalyst expressions (reference quality/image_quality.py:58-121 assess and
:237-284 normalizers; weights config.yaml:16-21). Inputs are the raw page
metrics emitted by stage A (graft analogs of the six image metrics)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_spark import config as C


def normalize_blur(blur: Column) -> Column:
    return F.least(F.lit(1.0), blur / C.QUALITY_BLUR_CAP)


def normalize_brightness(b: Column) -> Column:
    peak = C.QUALITY_BRIGHTNESS_PEAK
    return (
        F.when((b < C.QUALITY_MIN_BALANCE) | (b > C.QUALITY_MAX_BALANCE), F.lit(0.0))
        .otherwise(F.lit(1.0) - F.abs(b - peak) / peak * 0.5)
    )


def normalize_resolution(r: Column) -> Column:
    lo, hi = C.PAGE_RES_MIN_BYTES, C.PAGE_RES_GOOD_BYTES
    return (
        F.when(r < lo, r / lo)
        .when(r < hi, F.lit(0.5) + 0.5 * (r - lo) / (hi - lo))
        .otherwise(F.lit(1.0))
    )


def normalize_contrast(c: Column) -> Column:
    return (
        F.when(c < C.QUALITY_CONTRAST_LOW, F.lit(0.0))
        .when(c < C.QUALITY_CONTRAST_KNEE, c / C.QUALITY_CONTRAST_KNEE)
        .otherwise(F.lit(1.0))
    )


def normalize_glare(g: Column) -> Column:
    mx = C.QUALITY_MAX_GLARE_RATIO
    return (
        F.when(g > mx, F.greatest(F.lit(0.0), F.lit(1.0) - g / mx))
        .otherwise(F.lit(1.0) - g / mx * 0.5)
    )


def quality_columns(blur: Column, bright: Column, res: Column, contrast: Column,
                    edge: Column, glare: Column) -> dict[str, Column]:
    """Composite score + gate + failure reasons array (image_quality.py:82-120)."""
    w = C.QUALITY_WEIGHTS
    composite = (
        w["blur"] * normalize_blur(blur)
        + w["brightness"] * normalize_brightness(bright)
        + w["resolution"] * normalize_resolution(res)
        + w["contrast"] * normalize_contrast(contrast)
        + w["glare"] * normalize_glare(glare)
    )
    reasons = F.filter(
        F.array(
            F.when(blur < C.QUALITY_MIN_CONTENT_SCORE, F.lit("low_content_score")),
            F.when((bright < C.QUALITY_MIN_BALANCE) | (bright > C.QUALITY_MAX_BALANCE),
                   F.lit("balance_out_of_range")),
            F.when(contrast < C.QUALITY_MIN_CONTRAST, F.lit("low_contrast")),
            F.when(edge < C.QUALITY_MIN_EDGE_DENSITY, F.lit("low_edge_density")),
            F.when(glare > C.QUALITY_MAX_GLARE_RATIO, F.lit("high_boilerplate_ratio")),
        ),
        lambda x: x.isNotNull(),
    )
    return {
        "quality_score": composite,
        "quality_passed": F.size(reasons) == 0,
        "quality_reasons": reasons,
    }
