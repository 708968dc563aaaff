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
