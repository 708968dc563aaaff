"""Pruning soundness property: prune_files may only drop files that
contain ZERO rows matching the predicate — DELETE/UPDATE correctness
depends on this (a wrongly-pruned file would silently keep rows that
should have been rewritten). Checked per excluded file with DuckDB."""

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.functions.filters import prune_files
from mini_lakehouse_control_plane_executor_spark.table.schema import Field

SCHEMA = [Field("k", "int64"), Field("v", "string"), Field("x", "float64")]


@pytest.fixture(scope="module")
def stats_table(spark, tmp_path_factory):
    from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession

    lake = LakehouseSession(spark, str(tmp_path_factory.mktemp("prune")))
    lake.create_table("p", SCHEMA)
    t = lake.table("p")
    batches = [
        [(-50 + i, f"a{i}", -5.5 + i) for i in range(40)],        # negatives
        [(i, f"b{i:03d}", i * 0.5) for i in range(100, 140)],     # mid range
        [(i, f"c{i}", float(i)) for i in range(1000, 1020)],      # high range
        [(7, "dup", 7.0)] * 10,                                   # all-equal file
        [(i, None, None) for i in range(500, 510)]                # NULL file
        + [(510, "z", 1e9)],
    ]
    for rows in batches:
        t.insert(
            spark.createDataFrame(rows, "k long, v string, x double").coalesce(1)
        )
    return t


_COLS = {"k": st.integers(-60, 1100), "x": st.floats(-10, 1e9, allow_nan=False, width=32),
         "v": st.sampled_from(["a0", "b100", "c1005", "dup", "z", "", "zzz"])}
_OPS = ["=", "==", ">", "<", ">=", "<=", "!=", "<>"]


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_pruned_files_have_no_matches(stats_table, data):
    col = data.draw(st.sampled_from(["k", "v", "x"]))
    op = data.draw(st.sampled_from(_OPS))
    lit = data.draw(_COLS[col])
    lit_str = f"'{lit}'" if col == "v" else repr(lit)
    filter_str = f"{col} {op} {lit_str}"

    snap = stats_table.snapshot()
    pruned = prune_files(snap.files, filter_str)
    assert set(f.path for f in pruned) <= set(f.path for f in snap.files)

    sql_op = {"==": "=", "!=": "<>"}.get(op, op)
    excluded = [f for f in snap.files if f not in pruned]
    for f in excluded:
        path = os.path.join(stats_table.dir, f.path)
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{path}') WHERE {col} {sql_op} {lit_str}"
        ).fetchone()[0]
        assert n == 0, (
            f"file {f.path} pruned away but holds {n} rows matching {filter_str}"
        )


@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_conjunction_pruning_sound(stats_table, data):
    """AND-conjunctions prune as the intersection of their terms and
    never drop a file containing a row matching the whole predicate."""
    terms = []
    for _ in range(data.draw(st.integers(2, 3))):
        col = data.draw(st.sampled_from(["k", "x"]))
        op = data.draw(st.sampled_from(_OPS))
        lit = data.draw(_COLS[col])
        terms.append(f"{col} {op} {repr(lit)}")
    filter_str = " AND ".join(terms)

    snap = stats_table.snapshot()
    pruned = prune_files(snap.files, filter_str)
    sql = " AND ".join(
        t.replace(" == ", " = ").replace(" != ", " <> ") for t in terms
    )
    for f in snap.files:
        if f in pruned:
            continue
        path = os.path.join(stats_table.dir, f.path)
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{path}') WHERE {sql}"
        ).fetchone()[0]
        assert n == 0, f"{f.path} pruned but matches {filter_str}"


def test_conjunction_pruning_effective(stats_table):
    """A range conjunction actually drops files (not just soundness)."""
    snap = stats_table.snapshot()
    pruned = prune_files(snap.files, "k >= 100 AND k < 140")
    assert 0 < len(pruned) < len(snap.files)


def test_timestamp_date_pruning(spark, tmp_path):
    """date/timestamp columns harvest fixed-width ISO stats and prune on
    time-range predicates; DELETE on a time range rewrites only the
    intersecting files."""
    import datetime as dt

    from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession

    lake = LakehouseSession(spark, str(tmp_path))
    lake.create_table(
        "tt", [Field("id", "int64"), Field("ts", "timestamp"), Field("d", "date")]
    )
    t = lake.table("tt")
    for day in (1, 10, 20):
        rows = [
            (day * 100 + i,
             dt.datetime(2024, 3, day, i, 30, 0),
             dt.date(2024, 3, day))
            for i in range(5)
        ]
        t.insert(
            spark.createDataFrame(rows, "id long, ts timestamp, d date").coalesce(1)
        )

    snap = t.snapshot()
    assert all("ts" in f.min_values and "d" in f.min_values for f in snap.files)

    # Timestamp range prune: only the day-20 file can match.
    kept = prune_files(snap.files, "ts >= '2024-03-15 00:00:00'", snap.schema)
    assert len(kept) == 1
    # Midnight boundary: '2024-03-10' means midnight; the day-10 file's
    # earliest row is 00:30, so only the day-1 file can match.
    kept = prune_files(snap.files, "ts <= '2024-03-10'", snap.schema)
    assert len(kept) == 1
    assert spark.read.parquet(
        *[f"{t.dir}/{f.path}" for f in snap.files]
    ).filter("ts <= '2024-03-10'").count() == 5  # engine agrees: day-1 only
    # Date equality prunes to one file.
    kept = prune_files(snap.files, "d = '2024-03-10'", snap.schema)
    assert len(kept) == 1
    # Unintelligible literal: no pruning (conservative).
    assert len(prune_files(snap.files, "ts > 'not-a-time'", snap.schema)) == 3
    # Without the schema, mismatched shapes never prune.
    assert len(prune_files(snap.files, "ts >= '2024-03-15 00:00:00'")) == 3

    # End-to-end: reads and DELETE agree with engine semantics.
    assert t.read(prune_filter="ts >= '2024-03-15 00:00:00'").count() == 5
    assert t.read().filter("ts >= '2024-03-15 00:00:00'").count() == 5
    files_before = {f.path for f in snap.files}
    version, n = t.delete("ts >= '2024-03-20 00:00:00' AND ts < '2024-03-21 00:00:00'")
    assert n == 5
    survivors = {f.path for f in t.snapshot().files}
    # The two untouched day-files carried over by reference.
    assert len(files_before & survivors) == 2
    assert t.read().count() == 10
