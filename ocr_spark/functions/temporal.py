"""Temporal joins over event streams.

The as-of join (each left event matched to the latest right event at or
before it, per key) is the operator every attribution / point-in-time
feature pipeline needs and Spark lacks natively. The scale-correct shape is
NOT a range join (quadratic blow-up per key): union both sides tagged,
shuffle ONCE on the key, sort each key's events by time within its
partition, and carry the most recent right-side row forward with
last(ignorenulls) over an unbounded-preceding running frame. One exchange,
one per-key sort — the same cost as a windowed aggregation, independent of
how many left rows each right row serves.

Tie semantics: at equal timestamps the right side sorts BEFORE the left
(side 0 < side 1), so "at or before" includes same-instant matches; ties
within a side break deterministically on the id column, making the result
engine-exact (a native ASOF JOIN leaves same-timestamp winners undefined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def range_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_us: int,
) -> DataFrame:
    """All ordered pairs (a, b) of rows sharing ``key`` with
    0 <= ts(b) - ts(a) <= max_gap_us and id(a) != id(b) — the time-window
    range join behind dwell/co-occurrence analysis.

    A naive theta join on |Δt| explodes into a per-key cross join. The
    scale shape buckets time into max_gap_us-wide cells: any qualifying
    pair sits in the same or adjacent buckets, so the join runs as TWO
    equi-joins on (key, bucket) and (key, bucket+1) — hash joins Catalyst
    can shuffle or broadcast — and the exact gap predicate filters inside
    buckets. Cost is bounded by events-per-(key, bucket-window), never
    events-per-key²."""
    e = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("t"),
    ).withColumn("bucket", F.floor(F.col("t") / max_gap_us))
    a = e.select(F.col("k"), F.col("id").alias("id_a"), F.col("t").alias("t_a"),
                 F.col("bucket"))
    b = e.select(F.col("k").alias("k_b"), F.col("id").alias("id_b"),
                 F.col("t").alias("t_b"), F.col("bucket").alias("bucket_b"))
    same = a.join(b, (a.k == b.k_b) & (a.bucket == b.bucket_b), "inner")
    adj = a.join(b, (a.k == b.k_b) & (a.bucket + 1 == b.bucket_b), "inner")
    pairs = same.unionByName(adj)
    gap = F.col("t_b") - F.col("t_a")
    return (
        pairs.filter((gap >= 0) & (gap <= max_gap_us)
                     & (F.col("id_a") != F.col("id_b")))
        .select(F.col("k").alias(key), "id_a", "id_b", gap.alias("gap_us"))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """For each row of ``left``, attach the ``id_col`` (as ``matched_id``),
    timestamp (as ``matched_ts``) and any ``right_cols`` (as ``matched_<c>``)
    of the latest ``right`` row with the same ``key`` and ``ts`` at or
    before the left row's. Unmatched left rows keep NULLs.

    The carried right-side values travel as ONE struct, so last(ignorenulls)
    picks a whole row atomically — per-column carries could mix values from
    different right rows whenever a carried column is NULL."""
    carried = [id_col, ts, *right_cols]
    r = right.select(
        F.col(key), F.col(ts), F.col(id_col),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("_r"),
    )
    l = left.select(
        F.col(key), F.col(ts), F.col(id_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = u.select(
        key, ts, id_col, "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    out = [F.col(f"_m.{id_col}").alias("matched_id"),
           F.col(f"_m.{ts}").alias("matched_ts")]
    out += [F.col(f"_m.{c}").alias(f"matched_{c}") for c in right_cols]
    return m.filter(F.col("_side") == 1).select(key, ts, id_col, *out)


def funnel(
    df: DataFrame,
    key: str,
    ts: str,
    type_col: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel analysis: per key, the earliest completion time of
    each step where step i+1 must STRICTLY follow the chosen step-i event
    (first-touch semantics — each stage anchors on the earliest time the
    previous stage was reached). Returns one row per key that reached step
    1: (key, t1..tN as epoch micros, stage = furthest step reached).

    Scale shape: stage i is one conditional MIN aggregation keyed on the
    key (map-side partials), joined back onto the event stream for stage
    i+1 — N-1 key-keyed joins, no self-join on time, no per-key array
    materialization, and no window sort; every shuffle is keyed on the
    funnel key, so AQE handles hot users. Events outside ``steps`` are
    pruned at the scan."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    e = df.select(
        F.col(key).alias("k"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("t"),
        F.col(type_col).alias("typ"),
    ).filter(F.col("typ").isin(list(steps)))
    reached = (
        e.filter(F.col("typ") == steps[0])
        .groupBy("k").agg(F.min("t").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            e.filter(F.col("typ") == step)
            .join(reached.select("k", prev), "k")
            .filter(F.col("t") > F.col(prev))
            .groupBy("k").agg(F.min("t").alias(f"t{i}"))
        )
        reached = reached.join(nxt, "k", "left")
    stage = F.lit(1)
    for i in range(2, len(steps) + 1):
        stage = stage + F.col(f"t{i}").isNotNull().cast("int")
    return reached.select(
        F.col("k").alias(key),
        *[F.col(f"t{i}").cast("bigint").alias(f"t{i}")
          for i in range(1, len(steps) + 1)],
        stage.cast("int").alias("stage"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Markov transition mining over per-user event streams: for every
    ordered pair of consecutive events by the same user, count the
    (prev_type, next_type) transition and score its independence lift —
    ``lift_bp`` = P(pair) / (P(prev→·) * P(·→next)) in basis points
    (10000 = the pair occurs exactly as often as independent marginals
    predict; >>10000 = a funnel edge, <<10000 = an avoided path).

    Ordering within a user is (ts, tiebreak) so same-instant events
    resolve deterministically on any engine.

    Shape: ONE user-keyed shuffle for the lag window, then a hash agg on
    the (prev, next) pair; the marginals are window sums over the tiny
    distinct-pair frame (|event types|^2 rows), not the event stream.
    Lift arithmetic is exact BIGINT — n * total * 10000 must fit int64,
    which holds through ~10^7 transitions per run; beyond that swap the
    three lift columns to DECIMAL(38,0) (same plan, wider lanes).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    trans = (
        events
        .withColumn("prev_type", F.lag(type_col).over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.partitionBy("prev_type")
    wc = Window.partitionBy("next_type")
    wt = Window.partitionBy()
    return (
        trans
        .withColumn("row_m", F.sum("n").over(wr))
        .withColumn("col_m", F.sum("n").over(wc))
        .withColumn("total", F.sum("n").over(wt))
        .select(
            "prev_type", "next_type",
            F.col("n").cast("bigint").alias("n"),
            F.expr("CAST((n * total * 10000) DIV (row_m * col_m) AS BIGINT)")
            .alias("lift_bp"),
        )
    )
