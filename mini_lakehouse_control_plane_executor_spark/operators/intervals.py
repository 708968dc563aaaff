"""Interval analytics on Spark: gaps-and-islands interval building and
the bucket-rewrite that turns interval-overlap theta-joins into
equi-joins.

The rewrite (the published "partitioned interval join" — Chawda et al.,
interval joins on MapReduce; the range-bucketing DuckDB/Trino use): for
tumbling windows of width W, a window IS one bucket [wb*W, (wb+1)*W),
and a closed interval [start, end] overlaps that window IFF
wb in [start div W, end div W]. Expanding each interval to the buckets
it covers (explode of an integer sequence — exact, no approximation;
lemma property-tested in tests/test_properties.py::
test_interval_bucket_expansion_equals_overlap) converts the naive
|intervals| x |windows| BroadcastNestedLoop into an equi-join on the
bucket id: candidate volume is sum of ceil(len/W)+1 over intervals —
linear in the data — shuffled on a time key with no skew.

Consumers: queries.events_interval_overlap_join (sessions live per busy
window) and queries.events_session_concurrency_peak (peak concurrent
sessions per busy window — carry-in via the same expansion, in-window
deltas via per-bucket cumulative windows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000


def user_sessions(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """User sessions as closed microsecond intervals: gaps-and-islands
    over (user_id, us) with a >gap_us inactivity boundary. Expects
    columns user_id, event_id, us. Both the boundary lag and the
    session-id running sum order by (us, event_id) — the deterministic
    tiebreak under duplicate timestamps. One window shuffle on user_id.
    Returns (user_id, sid, s_start, s_end)."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    is_new = F.when(
        F.lag("us").over(w).isNull()
        | (F.col("us") - F.lag("us").over(w) > gap_us),
        1,
    ).otherwise(0)
    return (
        events.withColumn("is_new", is_new)
        .withColumn("sid", F.sum("is_new").over(run))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_start"), F.max("us").alias("s_end"))
    )


def expand_to_buckets(
    intervals: DataFrame,
    width_us: int,
    start_col: str = "s_start",
    end_col: str = "s_end",
    bucket_col: str = "wb",
) -> DataFrame:
    """The bucket-rewrite expansion: one output row per (interval,
    covered width_us bucket). Bucket membership is EXACTLY interval-
    overlap with that bucket's window (module docstring lemma), so an
    equi-join on ``bucket_col`` replaces the overlap theta-join.
    Adds ``bucket_col``; keeps every input column."""
    return intervals.withColumn(
        bucket_col,
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {width_us}"),
                F.expr(f"{end_col} div {width_us}"),
            )
        ),
    )


def bucket_deltas(
    intervals: DataFrame,
    width_us: int,
    start_col: str = "s_start",
    end_col: str = "s_end",
) -> DataFrame:
    """Per-(bucket, timestamp) interval start/end counts — the sweep-
    line input for per-bucket concurrency: an interval contributes a
    +1 delta in the bucket containing its start and a -1 delta in the
    bucket containing its end (buckets it fully spans see it only via
    the carry-in, which ``expand_to_buckets`` provides). Returns
    (wb, us, n_start, n_end)."""
    st = intervals.select(
        F.expr(f"{start_col} div {width_us}").alias("wb"),
        F.col(start_col).alias("us"),
        F.lit(1).alias("ds"),
        F.lit(0).alias("de"),
    )
    en = intervals.select(
        F.expr(f"{end_col} div {width_us}").alias("wb"),
        F.col(end_col).alias("us"),
        F.lit(0).alias("ds"),
        F.lit(1).alias("de"),
    )
    return (
        st.unionByName(en)
        .groupBy("wb", "us")
        .agg(
            F.sum("ds").cast("long").alias("n_start"),
            F.sum("de").cast("long").alias("n_end"),
        )
    )
