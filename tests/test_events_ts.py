"""ns→µs events conversion must use integer division: epoch-nanos
(~1.7e18) exceed double's 2^53 mantissa, so float division can be off by
~256 ns and flip the resulting microsecond at boundaries."""

import os

from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.queries import _load_events


def test_ns_to_us_integer_division(spark, tmp_path):
    # 1.7e18 + 999 ns: double rounds the intermediate; integer div must
    # truncate to exactly 1_700_000_000_000_000 µs.
    ns_values = [
        1_700_000_000_000_000_999,
        1_700_000_000_000_001_000,
        1_700_000_000_000_001_001,
    ]
    df = spark.createDataFrame(
        [(i, ns, i, "t", 0.0, "{}") for i, ns in enumerate(ns_values)],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(os.path.join(sf_dir, "events.parquet"))

    out = (
        _load_events(spark, sf_dir)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .collect()
    )
    assert [r.us for r in out] == [
        1_700_000_000_000_000,
        1_700_000_000_000_001,
        1_700_000_000_000_001,
    ]


def test_native_us_loads_as_ltz_timestamp(spark, tmp_path):
    """Round-3 regression: the driver regenerated events as
    timestamp[us] without timezone, which Spark's parquet reader infers
    as TIMESTAMP_NTZ — and ``F.unix_micros`` rejects NTZ. The loader
    must cast to TIMESTAMP (value-stable under the pinned-UTC session)
    so every downstream unix_micros call site resolves."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    us_values = [1_700_000_000_000_000, 1_700_000_000_000_001]
    table = pa.table(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "ts": pa.array(
                [dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=u) for u in us_values],
                pa.timestamp("us"),  # no tz -> Spark infers TIMESTAMP_NTZ
            ),
            "user_id": pa.array([0, 1], pa.int64()),
            "event_type": pa.array(["t", "t"]),
            "value": pa.array([0.0, 0.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    loaded = _load_events(spark, str(tmp_path))
    assert dict(loaded.dtypes)["ts"] == "timestamp"
    out = (
        loaded.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .collect()
    )
    assert [r.us for r in out] == us_values


def test_int64_magnitude_guard(spark, tmp_path):
    """A raw INT64 ts is unit-inferred from magnitude: epoch-micros must
    NOT be divided by 1000 (the old hard-coded nanos assumption)."""
    us = 1_700_000_000_000_000  # epoch-micros, ~2023
    df = spark.createDataFrame(
        [(0, us, 0, "t", 0.0, "{}")],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = _load_events(spark, str(tmp_path)).select(F.unix_micros("ts").alias("us")).collect()
    assert out[0].us == us


def test_profile_counts_variants_identical(spark):
    """The regexp_count profile must equal the array-fold profile row for
    row — the oracle checks the token-based semantics, so the fast path
    must be value-identical."""
    from mini_lakehouse_control_plane_executor_spark.operators import text as T
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fields = T._LANG_ORDER + ["stop", "chars"]
    fast = (
        d.select("doc_id", T.profile_counts_from_text(F.col("text")).alias("pc"))
        .select("doc_id", *[F.col(f"pc.{f}") for f in fields])
    )
    slow = (
        d.select("doc_id", T.tokens(F.col("text")).alias("toks"))
        .select("doc_id", T.profile_counts(F.col("toks")).alias("pc"))
        .select("doc_id", *[F.col(f"pc.{f}") for f in fields])
    )
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
