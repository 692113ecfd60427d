"""as-of join semantics: tie handling, unmatched rows, and the atomic
struct carry (a NULL in a carried column must not mix rows)."""

from __future__ import annotations

from datetime import datetime

from ocr_spark.functions.temporal import asof_join


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double")


def test_asof_basic_latest_at_or_before(spark):
    t = lambda s: datetime.fromisoformat(s)
    right = _mk(spark, [
        (10, t("2024-01-01T00:00:00"), 1, 1.0),
        (11, t("2024-01-01T00:05:00"), 1, 2.0),
        (12, t("2024-01-01T00:10:00"), 1, 3.0),
        (13, t("2024-01-01T00:00:00"), 2, 9.0),
    ])
    left = _mk(spark, [
        (20, t("2024-01-01T00:07:00"), 1, 0.0),   # between 11 and 12 -> 11
        (21, t("2024-01-01T00:10:00"), 1, 0.0),   # equal ts -> 12 (at-or-before)
        (22, t("2023-12-31T23:59:00"), 1, 0.0),   # before everything -> NULL
        (23, t("2024-01-01T00:01:00"), 3, 0.0),   # key with no right rows -> NULL
    ])
    out = {r["event_id"]: r for r in
           asof_join(left, right, "user_id", "ts", "event_id",
                     right_cols=("value",)).collect()}
    assert out[20]["matched_id"] == 11 and out[20]["matched_value"] == 2.0
    assert out[21]["matched_id"] == 12
    assert out[22]["matched_id"] is None and out[22]["matched_value"] is None
    assert out[23]["matched_id"] is None


def test_asof_null_carried_value_stays_atomic(spark):
    """The LATEST right row has value=NULL; matched_value must be that NULL,
    not a non-null value leaked from an older row."""
    t = lambda s: datetime.fromisoformat(s)
    right = _mk(spark, [
        (10, t("2024-01-01T00:00:00"), 1, 5.0),
        (11, t("2024-01-01T00:05:00"), 1, None),
    ])
    left = _mk(spark, [(20, t("2024-01-01T00:06:00"), 1, 0.0)])
    row = asof_join(left, right, "user_id", "ts", "event_id",
                    right_cols=("value",)).collect()[0]
    assert row["matched_id"] == 11
    assert row["matched_value"] is None


def test_range_pairs_matches_brute_force(spark):
    """Bucketing must find exactly the pairs a cross join finds — including
    gaps landing exactly on the bucket boundary and pairs spanning adjacent
    buckets."""
    import itertools

    from ocr_spark.functions.temporal import range_pairs

    gap = 1_000_000  # 1 s in us
    rows = []
    base = datetime(2024, 1, 1)
    # engineered: events at 0, 0.4s, 0.999999s, 1s, 1.7s, 2.5s for user 1
    offsets = [0, 400_000, 999_999, 1_000_000, 1_700_000, 2_500_000]
    from datetime import timedelta
    for i, off in enumerate(offsets):
        rows.append((i, base + timedelta(microseconds=off), 1, 0.0))
    rows.append((99, base, 2, 0.0))  # other user, no same-user partner
    df = _mk(spark, rows)

    got = sorted((r["id_a"], r["id_b"], r["gap_us"]) for r in
                 range_pairs(df, "user_id", "ts", "event_id", gap).collect())

    us = {i: off for i, off in enumerate(offsets)}
    want = sorted(
        (a, b, us[b] - us[a])
        for a, b in itertools.product(us, us)
        if a != b and 0 <= us[b] - us[a] <= gap
    )
    assert got == want


def test_asof_single_exchange_per_side(spark):
    t = lambda s: datetime.fromisoformat(s)
    right = _mk(spark, [(10, t("2024-01-01T00:00:00"), 1, 1.0)])
    left = _mk(spark, [(20, t("2024-01-01T00:01:00"), 1, 0.0)])
    plan = asof_join(left, right, "user_id", "ts", "event_id")._jdf \
        .queryExecution().executedPlan().toString()
    # the union feeds ONE window: one shuffle on the key, no join operator
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_funnel_strict_ordering_and_stages(spark):
    from datetime import datetime
    from ocr_spark.functions.temporal import funnel

    T = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: full funnel in order
        (1, T(1), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
        # user 2: click BEFORE first view -> stage stalls at view
        (2, T(5), "click"), (2, T(6), "view"),
        # user 3: purchase before click -> stage 2 (view, click) only
        (3, T(1), "view"), (3, T(2), "purchase"), (3, T(3), "click"),
        # user 4: never viewed -> absent from output
        (4, T(1), "click"), (4, T(2), "purchase"),
        # user 5: same-instant click as view -> strict '>' rejects it
        (5, T(1), "view"), (5, T(1), "click"),
        # user 6: first-touch anchoring — the EARLIEST view anchors, so a
        # click between two views still counts
        (6, T(1), "view"), (6, T(2), "click"), (6, T(9), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["user_id"]: r.asDict()
           for r in funnel(df, "user_id", "ts", "event_type").collect()}
    assert set(out) == {1, 2, 3, 5, 6}
    assert out[1]["stage"] == 3 and out[1]["t3"] is not None
    assert out[2]["stage"] == 1 and out[2]["t2"] is None
    assert out[3]["stage"] == 2 and out[3]["t3"] is None
    assert out[5]["stage"] == 1
    assert out[6]["stage"] == 2
    # epoch-micro ordering is preserved
    assert out[1]["t1"] < out[1]["t2"] < out[1]["t3"]


def test_funnel_rejects_single_step(spark):
    import pytest as _pytest
    from ocr_spark.functions.temporal import funnel

    df = spark.createDataFrame([(1, "2024-01-01", "view")],
                               ["user_id", "ts", "event_type"])
    with _pytest.raises(ValueError):
        funnel(df, "user_id", "ts", "event_type", steps=("view",))


def test_event_rate_anomalies_flags_spike(spark):
    """A constructed stream: steady 10 events/hour with one 100-event
    spike hour -> only the spike is flagged."""
    from datetime import datetime, timedelta
    from ocr_spark.queries import QUERIES
    import os
    import pyspark.sql.functions as F

    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(24):
        n = 100 if h == 12 else 10
        for i in range(n):
            rows.append((eid, base + timedelta(hours=h, seconds=i), 1, "view"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    # drive the same logic as the query via a temp parquet dir
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["event_rate_anomalies"](spark, d).collect()
    flagged = [r for r in out if r["is_anomaly"] == 1]
    assert len(flagged) == 1
    assert flagged[0]["n"] == 100
    # steady hours are far below the threshold
    steady = [r for r in out if r["n"] == 10]
    assert all(abs(r["z"]) < 1 for r in steady)
