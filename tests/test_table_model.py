"""Model-based property test of the transactional table layer: a random
sequence of INSERT / OVERWRITE / DELETE / UPDATE / MERGE / COMPACT /
ADD_COLUMN / DROP_COLUMN / ADD_CONSTRAINT / DROP_CONSTRAINT / RESTORE /
CLONE is applied both to a LakehouseTable and to a plain in-memory model
(rows + schema + constraint set); after every op the table must agree
with the model, every recorded historical version must still replay to
what the model said at the time (time travel is never invalidated by
later writes — including writes that changed the schema), and
constraint-violating writes must fail atomically with the model
unchanged.

The model tracks three dimensions the reference's property discipline
(design.md:457-466) demands as SEQUENCES, not just as single ops:
- schema versions (add_column widens, drop_column narrows, restore
  re-imposes the target version's schema),
- constraint versions (add/drop are log commits; restore restores the
  target's constraint SET; enforcement applies to every later write),
- lineage switches (clone pins a new table at the current state whose
  own history then evolves independently).
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.table.schema import Field

SCHEMA = [Field("k", "int64"), Field("v", "string"), Field("x", "float64")]


def _mk_rows(lo, n, n_extra, tag="v"):
    return [
        (k, f"{tag}{k}", k * 1.5) + (None,) * n_extra for k in range(lo, lo + n)
    ]


def _ddl(extra_cols):
    return "k long, v string, x double" + "".join(
        f", {c} string" for c in extra_cols
    )


def _df_from(spark, rows, extra_cols):
    return spark.createDataFrame(rows, _ddl(extra_cols))


_OP = st.one_of(
    st.tuples(st.just("insert"), st.integers(0, 20), st.integers(1, 12)),
    st.tuples(st.just("overwrite"), st.integers(0, 20), st.integers(1, 12)),
    st.tuples(st.just("delete"), st.integers(0, 30), st.integers(1, 15)),
    st.tuples(st.just("update"), st.integers(0, 30), st.integers(1, 15)),
    st.tuples(st.just("merge"), st.integers(0, 25), st.integers(1, 10)),
    # n picks the layout: 0 bin-pack, 1 linear clustered, 2 z-ordered,
    # 3 predicate-scoped (OPTIMIZE WHERE) — all four are pure LAYOUT
    # ops, so the model is unchanged.
    st.tuples(st.just("compact"), st.integers(0, 3), st.integers(1, 1)),
    st.tuples(st.just("add_col"), st.integers(0, 0), st.integers(1, 1)),
    st.tuples(st.just("drop_col"), st.integers(0, 0), st.integers(1, 1)),
    # bound range straddles the generated k range (0..34) so both
    # accepted and refused adds, and both passing and violating later
    # writes, actually occur.
    st.tuples(st.just("add_constraint"), st.integers(5, 40), st.integers(1, 1)),
    st.tuples(st.just("drop_constraint"), st.integers(0, 0), st.integers(1, 1)),
    st.tuples(st.just("restore"), st.integers(0, 7), st.integers(1, 1)),
    st.tuples(st.just("clone"), st.integers(0, 0), st.integers(1, 1)),
)


@settings(
    # CI runs 6 examples; set MODEL_MAX_EXAMPLES for a deep local soak
    # (each op is a Spark job, ~25s per 6-op example).
    max_examples=int(os.environ.get("MODEL_MAX_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(ops=st.lists(_OP, min_size=1, max_size=6))
def test_table_agrees_with_model(spark, tmp_path_factory, ops):
    from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession

    lake = LakehouseSession(spark, str(tmp_path_factory.mktemp("model")))
    lake.create_table("m", SCHEMA)
    name = "m"
    t = lake.table(name)
    t.insert(_df_from(spark, _mk_rows(0, 10, 0), []))

    model = list(_mk_rows(0, 10, 0))  # list of tuples; duplicates allowed
    extra_cols: list[str] = []  # added nullable string columns, in order
    bounds: dict[str, int] = {}  # constraint name -> k-upper-bound
    # version -> (sorted rows at era arity, extra cols, bounds) — resets
    # when the active table switches to a clone (its OWN history).
    history = {t.versions()[-1]: (sorted(model), tuple(extra_cols), dict(bounds))}

    def violates(rows):
        return bounds and any(r[0] > min(bounds.values()) for r in rows)

    for i, (op, a, n) in enumerate(ops):
        if op == "insert":
            rows = _mk_rows(a, n, len(extra_cols), tag=f"i{i}_")
            if violates(rows):
                with pytest.raises(Exception, match="cs"):
                    t.insert(_df_from(spark, rows, extra_cols))
            else:
                t.insert(_df_from(spark, rows, extra_cols))
                model.extend(rows)
        elif op == "overwrite":
            rows = _mk_rows(a, n, len(extra_cols), tag=f"o{i}_")
            if violates(rows):
                with pytest.raises(Exception, match="cs"):
                    t.insert(_df_from(spark, rows, extra_cols), mode="overwrite")
            else:
                t.insert(_df_from(spark, rows, extra_cols), mode="overwrite")
                model = list(rows)
        elif op == "delete":
            # Alternate copy-on-write and merge-on-read (deletion
            # vector) by the generated offset's parity: the two modes
            # must be row-level EQUIVALENT under every interleaving
            # with compaction / restore / clone / update / merge.
            mode = "merge-on-read" if a % 2 else "copy-on-write"
            _, n_del = t.delete(f"k >= {a} AND k < {a + n}", mode=mode)
            kept = [r for r in model if not (a <= r[0] < a + n)]
            assert n_del == len(model) - len(kept)
            model = kept
        elif op == "update":
            # touches v/x only, so k-bounds can never be violated.
            # Same coin-flip as delete/merge: copy-on-write and
            # merge-on-read (dv old rows + append rewritten) UPDATE
            # must be row-level equivalent under every interleaving.
            umode = "merge-on-read" if a % 2 else "copy-on-write"
            t.update(
                f"k >= {a} AND k < {a + n}",
                {"v": f"'u{i}'", "x": "x + 1"},
                mode=umode,
            )
            model = [
                (r[0], f"u{i}", r[2] + 1) + r[3:] if a <= r[0] < a + n else r
                for r in model
            ]
        elif op == "merge":
            rows = _mk_rows(a, n, len(extra_cols), tag=f"m{i}_")
            # Same coin-flip as delete: copy-on-write and merge-on-read
            # MERGE must be row-level equivalent under interleavings.
            mmode = "merge-on-read" if a % 2 else "copy-on-write"
            if violates(rows):
                with pytest.raises(Exception, match="cs"):
                    t.merge(_df_from(spark, rows, extra_cols), "k", mode=mmode)
            else:
                t.merge(_df_from(spark, rows, extra_cols), "k", mode=mmode)
                keys = {r[0] for r in rows}
                model = [r for r in model if r[0] not in keys] + rows
        elif op == "compact":
            if a == 1:
                lake.compact(name, force=True, cluster_by=["k"])
            elif a == 2:
                lake.compact(name, force=True, zorder_by=["k", "x"])
            elif a == 3:
                lake.compact(name, force=True, where=f"k <= {10 + i % 20}")
            else:
                lake.compact(name, force=True)
        elif op == "add_col":
            col = f"c{i}"
            t.add_column(Field(col, "string", True))
            extra_cols.append(col)
            model = [r + (None,) for r in model]
        elif op == "drop_col":
            if not extra_cols:
                continue  # only the added columns are droppable here
            col = extra_cols.pop()
            idx = 3 + len(extra_cols)
            t.drop_column(col)
            model = [r[:idx] + r[idx + 1 :] for r in model]
        elif op == "add_constraint":
            cname = f"cs{i}"
            if any(r[0] > a for r in model):
                # existing rows violate -> refused, constraint set unchanged
                with pytest.raises(Exception):
                    t.add_constraint(cname, f"k <= {a}")
                assert cname not in t.constraints
            else:
                t.add_constraint(cname, f"k <= {a}")
                bounds[cname] = a
        elif op == "drop_constraint":
            if not bounds:
                continue
            cname = sorted(bounds)[0]
            t.drop_constraint(cname)
            del bounds[cname]
        elif op == "restore":
            versions = sorted(history)
            target = versions[a % len(versions)]
            t.restore(target)
            rows_s, cols_s, bounds_s = history[target]
            model = list(rows_s)
            extra_cols = list(cols_s)
            bounds = dict(bounds_s)
        elif op == "clone":
            clone_name = f"m_cl{i}"
            t = lake.clone_table(name, clone_name)
            name = clone_name
            history = {}  # the clone's log starts its own version line

        got = sorted(tuple(r) for r in t.read().collect())
        assert got == sorted(model), f"divergence after op {i}: {op}"
        assert dict(
            (c, int(e.split("<=")[1])) for c, e in t.constraints.items()
        ) == bounds, f"constraint set diverged after op {i}: {op}"
        assert [f.name for f in t.fields] == ["k", "v", "x"] + extra_cols, (
            f"schema diverged after op {i}: {op}"
        )
        history[t.versions()[-1]] = (sorted(model), tuple(extra_cols), dict(bounds))

    # Every recorded version still replays to its historical state —
    # at that version's own schema arity.
    for version, (want, _, _) in history.items():
        got = sorted(tuple(r) for r in t.read(version=version).collect())
        assert got == want, f"time travel to v{version} diverged"
