"""Local mirror of the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle on the same parquet files,
compare row count, column names, and values (column-name-sorted,
row-sorted — order-insensitive like the driver's value hash)."""

import os

import duckdb
import pandas as pd
import pytest

from mini_lakehouse_control_plane_executor_spark import queries as qlib

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


ORACLES = qlib.all_oracles()
CASES = sorted(qlib.all_queries())

# ORACLE_SHARD="i/n" (0-based) deterministically partitions the case
# list so CI can split the parity gate across jobs WITHOUT sampling —
# every query is still covered, just not all in one job. Unset = all.
_shard = os.environ.get("ORACLE_SHARD")
if _shard:
    _i, _n = (int(x) for x in _shard.split("/"))
    if not (0 <= _i < _n):
        raise ValueError(f"ORACLE_SHARD {_shard!r}: need 0 <= i < n")
    CASES = [c for idx, c in enumerate(CASES) if idx % _n == _i]


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(name, spark, duck):
    fn = qlib.all_queries()[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), "column names differ"
    assert len(spark_pdf) == len(duck_pdf), "row counts differ"

    left = _normalize(spark_pdf)
    right = _normalize(duck_pdf)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


def test_sequence_packing_global_baseline(spark, duck):
    """The UNREGISTERED global-packing twin (dropped from the registry
    in r5 because its global cumsum window is a SinglePartition scale
    anti-pattern) stays oracle-pinned here: it is the semantic baseline
    that sequence_packing_sharded's per-shard relaxation is documented
    against, so its exact globally-sequential packing arithmetic must
    keep matching DuckDB even though no production user can run it."""
    assert "sequence_packing" not in qlib.all_queries()  # stays unregistered
    spark_pdf = qlib.sequence_packing(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(qlib._PACKING_SQL).fetchdf()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    assert len(spark_pdf) == len(duck_pdf)
    pd.testing.assert_frame_equal(
        _normalize(spark_pdf), _normalize(duck_pdf),
        check_dtype=False, check_exact=False, rtol=0, atol=1e-9,
    )


def test_driver_priority_names_are_registered():
    """Every DRIVER_PRIORITY entry must resolve to a registered query —
    a typo here silently reorders the driver's 50-slot verification
    window and can leave a stale query unverified for a round."""
    missing = [n for n in qlib.DRIVER_PRIORITY if n not in qlib.all_queries()]
    assert missing == [], missing
    # the prefix rule: priority names lead the registry ordering
    head = list(qlib.all_queries())[: len(qlib.DRIVER_PRIORITY)]
    assert head == qlib.DRIVER_PRIORITY
