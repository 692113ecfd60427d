"""Unit tests for the stream-stream watermarked interval join."""

from __future__ import annotations

import datetime
import os

from ocr_spark.streaming.incremental import stream_interval_join

T = datetime.datetime
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write_one_file(spark, rows, path):
    spark.createDataFrame(rows, COLS).coalesce(1).write.parquet(path)


class TestStreamIntervalJoin:
    def test_cross_batch_pairs_and_boundaries(self, spark, tmp_path):
        base = str(tmp_path)
        views_dir = os.path.join(base, "views")
        clicks_dir = os.path.join(base, "clicks")
        # one file per side per write -> with maxFilesPerTrigger=1 the
        # second click file arrives in a LATER micro-batch than the view
        # it must match, so the pair can only come out of join state
        _write_one_file(spark, [
            (1, T(2024, 1, 1, 12, 0, 0), 7, "view", 0.0, "{}"),
            (2, T(2024, 1, 1, 12, 0, 0), 8, "view", 0.0, "{}"),
        ], views_dir)
        _write_one_file(spark, [
            # in-window click, same user
            (10, T(2024, 1, 1, 12, 5, 0), 7, "click", 0.0, "{}"),
            # click BEFORE the view: excluded (range is one-sided)
            (11, T(2024, 1, 1, 11, 59, 0), 7, "click", 0.0, "{}"),
        ], clicks_dir)
        # a SECOND file in the same click directory (mode=append) so the
        # stream sees two click files -> two micro-batches on that side
        spark.createDataFrame([
            # exactly AT view_ts + 10 min: inclusive -> matched
            (12, T(2024, 1, 1, 12, 10, 0), 8, "click", 0.0, "{}"),
            # one second past the gap: excluded
            (13, T(2024, 1, 1, 12, 10, 1), 7, "click", 0.0, "{}"),
            # right user, wrong window; and user 9 has no view at all
            (14, T(2024, 1, 2, 12, 0, 0), 7, "click", 0.0, "{}"),
            (15, T(2024, 1, 1, 12, 1, 0), 9, "click", 0.0, "{}"),
        ], COLS).coalesce(1).write.mode("append").parquet(clicks_dir)

        q = stream_interval_join(
            spark, views_dir, clicks_dir,
            out_dir=os.path.join(base, "out"),
            checkpoint_dir=os.path.join(base, "ckpt"),
            max_gap_minutes=10, watermark="1 hour")
        q.awaitTermination()
        # >= 2 micro-batches on the click side actually ran
        assert len(q.recentProgress) >= 2

        pairs = {(r["view_id"], r["click_id"])
                 for r in spark.read.parquet(
                     os.path.join(base, "out")).collect()}
        assert pairs == {(1, 10), (2, 12)}

    def test_sink_is_exactly_once_on_rerun(self, spark, tmp_path):
        base = str(tmp_path)
        views_dir = os.path.join(base, "views")
        clicks_dir = os.path.join(base, "clicks")
        _write_one_file(spark, [
            (1, T(2024, 1, 1, 12, 0, 0), 7, "view", 0.0, "{}")], views_dir)
        _write_one_file(spark, [
            (10, T(2024, 1, 1, 12, 5, 0), 7, "click", 0.0, "{}")], clicks_dir)
        for _ in range(2):  # second run with same checkpoint: no new input
            q = stream_interval_join(
                spark, views_dir, clicks_dir,
                out_dir=os.path.join(base, "out"),
                checkpoint_dir=os.path.join(base, "ckpt"),
                max_gap_minutes=10, watermark="1 hour")
            q.awaitTermination()
        rows = spark.read.parquet(os.path.join(base, "out")).collect()
        assert len(rows) == 1
