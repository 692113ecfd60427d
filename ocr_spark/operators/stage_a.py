"""Stage A operator: batched DOM parsing + main-content extraction via
mapInArrow (graft analog of the reference's segmentation stage, SURVEY.md
§2.9 G1-G8).

One Python<->JVM crossing for the whole stage; the html column is consumed
here and NOT emitted — downstream sees only text + metrics columns, so
Catalyst never ships page bytes past this point (column-pruning discipline,
SURVEY.md §4.2)."""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from ocr_spark.extraction.html_extract import extract_page

STAGE_A_SCHEMA = (
    "url string, warc_ts timestamp, lang string, dom_text string, "
    "payload_id string, n_blocks int, n_content_blocks int, n_doc_regions int, "
    "total_chars long, text_chars long, content_chars long, link_chars long, "
    "tag_count long, blur_raw double, brightness_raw double, contrast_raw double, "
    "edge_density_raw double, glare_raw double, resolution_raw double"
)


def _stage_a_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        urls = batch.column("url")
        ts = batch.column("warc_ts")
        langs = batch.column("lang")
        htmls = batch.column("html").to_pylist()
        results = [extract_page(h or b"") for h in htmls]
        yield pa.RecordBatch.from_arrays(
            [
                urls,
                ts,
                langs,
                pa.array([r.text for r in results], pa.string()),
                pa.array([r.payload_ids[0] if r.payload_ids else None for r in results], pa.string()),
                pa.array([r.n_blocks for r in results], pa.int32()),
                pa.array([r.n_content_blocks for r in results], pa.int32()),
                pa.array([r.n_doc_regions for r in results], pa.int32()),
                pa.array([r.total_chars for r in results], pa.int64()),
                pa.array([r.text_chars for r in results], pa.int64()),
                pa.array([r.content_chars for r in results], pa.int64()),
                pa.array([r.link_chars for r in results], pa.int64()),
                pa.array([r.tag_count for r in results], pa.int64()),
                pa.array([r.blur_raw for r in results], pa.float64()),
                pa.array([r.brightness_raw for r in results], pa.float64()),
                pa.array([r.contrast_raw for r in results], pa.float64()),
                pa.array([r.edge_density_raw for r in results], pa.float64()),
                pa.array([r.glare_raw for r in results], pa.float64()),
                pa.array([r.resolution_raw for r in results], pa.float64()),
            ],
            schema=pa.schema(
                [
                    pa.field("url", pa.string()),
                    pa.field("warc_ts", ts.type),
                    pa.field("lang", pa.string()),
                    pa.field("dom_text", pa.string()),
                    pa.field("payload_id", pa.string()),
                    pa.field("n_blocks", pa.int32()),
                    pa.field("n_content_blocks", pa.int32()),
                    pa.field("n_doc_regions", pa.int32()),
                    pa.field("total_chars", pa.int64()),
                    pa.field("text_chars", pa.int64()),
                    pa.field("content_chars", pa.int64()),
                    pa.field("link_chars", pa.int64()),
                    pa.field("tag_count", pa.int64()),
                    pa.field("blur_raw", pa.float64()),
                    pa.field("brightness_raw", pa.float64()),
                    pa.field("contrast_raw", pa.float64()),
                    pa.field("edge_density_raw", pa.float64()),
                    pa.field("glare_raw", pa.float64()),
                    pa.field("resolution_raw", pa.float64()),
                ]
            ),
        )


def stage_a(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang, ...) -> extracted text + page metrics."""
    return pages.select("url", "warc_ts", "lang", "html").mapInArrow(
        _stage_a_batches, STAGE_A_SCHEMA
    )
