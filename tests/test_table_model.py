"""Model-based property test of the transactional table layer: a random
sequence of INSERT / OVERWRITE / DELETE / UPDATE / MERGE / COMPACT is
applied both to a LakehouseTable and to a plain in-memory model; after
every op the table must agree with the model, and every recorded
historical version must still replay to what the model said at the time
(time travel is never invalidated by later writes)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.table.schema import Field

SCHEMA = [Field("k", "int64"), Field("v", "string"), Field("x", "float64")]


def _mk_rows(lo, n, tag="v"):
    return [(k, f"{tag}{k}", k * 1.5) for k in range(lo, lo + n)]


def _df_from(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, x double")


_OP = st.one_of(
    st.tuples(st.just("insert"), st.integers(0, 20), st.integers(1, 12)),
    st.tuples(st.just("overwrite"), st.integers(0, 20), st.integers(1, 12)),
    st.tuples(st.just("delete"), st.integers(0, 30), st.integers(1, 15)),
    st.tuples(st.just("update"), st.integers(0, 30), st.integers(1, 15)),
    st.tuples(st.just("merge"), st.integers(0, 25), st.integers(1, 10)),
    st.tuples(st.just("compact"), st.integers(0, 0), st.integers(1, 1)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(ops=st.lists(_OP, min_size=1, max_size=6))
def test_table_agrees_with_model(spark, tmp_path_factory, ops):
    from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession

    lake = LakehouseSession(spark, str(tmp_path_factory.mktemp("model")))
    lake.create_table("m", SCHEMA)
    t = lake.table("m")
    t.insert(_df_from(spark, _mk_rows(0, 10)))

    model = list(_mk_rows(0, 10))  # list of (k, v, x); duplicates allowed
    history = {t.versions()[-1]: sorted(model)}

    for i, (op, a, n) in enumerate(ops):
        if op == "insert":
            rows = _mk_rows(a, n, tag=f"i{i}_")
            t.insert(_df_from(spark, rows))
            model.extend(rows)
        elif op == "overwrite":
            rows = _mk_rows(a, n, tag=f"o{i}_")
            t.insert(_df_from(spark, rows), mode="overwrite")
            model = list(rows)
        elif op == "delete":
            _, n_del = t.delete(f"k >= {a} AND k < {a + n}")
            kept = [r for r in model if not (a <= r[0] < a + n)]
            assert n_del == len(model) - len(kept)
            model = kept
        elif op == "update":
            t.update(f"k >= {a} AND k < {a + n}", {"v": f"'u{i}'", "x": "x + 1"})
            model = [
                (k, f"u{i}", x + 1) if a <= k < a + n else (k, v, x)
                for (k, v, x) in model
            ]
        elif op == "merge":
            rows = _mk_rows(a, n, tag=f"m{i}_")
            t.merge(_df_from(spark, rows), "k")
            keys = {r[0] for r in rows}
            model = [r for r in model if r[0] not in keys] + rows
        elif op == "compact":
            lake.compact("m", force=True)
        got = sorted(tuple(r) for r in t.read().collect())
        assert got == sorted(model), f"divergence after op {i}: {op}"
        history[t.versions()[-1]] = sorted(model)

    # Every recorded version still replays to its historical state.
    for version, want in history.items():
        got = sorted(tuple(r) for r in t.read(version=version).collect())
        assert got == want, f"time travel to v{version} diverged"
