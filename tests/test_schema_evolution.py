"""Schema evolution (Delta ALTER TABLE ADD/DROP COLUMN semantics): the
schema is versioned in the log (latest-wins replay, already the
reference's rule — pkg/storage/transaction_log.go:156-218); reads impose
the SNAPSHOT schema over the files, so widening surfaces NULLs for old
rows and narrowing never scans the dropped column — zero data rewrite
either way, and time travel sees the schema of the version it reads."""

import pytest

from mini_lakehouse_control_plane_executor_spark.table.schema import Field, SchemaError

SCHEMA = [Field("id", "int64", False), Field("v", "float64", True)]


def _df(spark, rows, ddl="id long, v double"):
    return spark.createDataFrame(rows, ddl)


def test_add_column_null_fills_old_rows(lake, spark):
    lake.create_table("se", SCHEMA)
    lake.insert("se", _df(spark, [(1, 1.5), (2, 2.5)]))
    t = lake.table("se")
    v_old = t.log.latest_version()

    t.add_column(Field("tag", "string", True))
    assert [f.name for f in t.fields] == ["id", "v", "tag"]
    # Old rows surface the new column as NULL — no rewrite happened.
    rows = {r.id: r.tag for r in t.read().collect()}
    assert rows == {1: None, 2: None}
    # Time travel sees the old schema.
    assert [f.name for f in t.read(version=v_old).schema.fields] == ["id", "v"]

    # New inserts carry the column; old and new rows coexist.
    lake.insert("se", _df(spark, [(3, 3.5, "x")], "id long, v double, tag string"))
    rows = {r.id: r.tag for r in t.read().collect()}
    assert rows == {1: None, 2: None, 3: "x"}

    # Write-path name-equality now requires the column.
    with pytest.raises(Exception):
        lake.insert("se", _df(spark, [(4, 4.5)]))


def test_add_column_validation(lake, spark):
    lake.create_table("sev", SCHEMA)
    t = lake.table("sev")
    with pytest.raises(SchemaError, match="must be nullable"):
        t.add_column(Field("req", "string", False))
    with pytest.raises(SchemaError, match="already exists"):
        t.add_column(Field("v", "float64", True))


def test_drop_column_logical_and_time_travel(lake, spark):
    lake.create_table("sd", SCHEMA)
    lake.insert("sd", _df(spark, [(1, 1.5)]))
    t = lake.table("sd")
    v_old = t.log.latest_version()

    t.drop_column("v")
    assert [f.name for f in t.fields] == ["id"]
    assert t.read().collect()[0].asDict() == {"id": 1}
    # Pre-drop versions still see (and read) the column.
    assert t.read(version=v_old).collect()[0].v == 1.5
    # Inserts now use the narrowed schema.
    lake.insert("sd", _df(spark, [(2,)], "id long"))
    assert t.read().count() == 2
    with pytest.raises(KeyError, match="no such column"):
        t.drop_column("ghost")
    with pytest.raises(SchemaError, match="last column"):
        t.drop_column("id")


def test_drop_column_refuses_constraint_reference(lake, spark):
    lake.create_table("sc", SCHEMA, constraints={"pos": "v > 0"})
    t = lake.table("sc")
    with pytest.raises(SchemaError, match="references it"):
        t.drop_column("v")
    t.drop_constraint("pos")
    t.drop_column("v")
    assert [f.name for f in t.fields] == ["id"]


def test_evolution_restorable(lake, spark):
    """RESTORE returns the schema (and rows) of the target version —
    schema evolution is just another versioned event."""
    lake.create_table("sr", SCHEMA)
    lake.insert("sr", _df(spark, [(1, 1.5)]))
    t = lake.table("sr")
    v_before = t.log.latest_version()
    t.add_column(Field("tag", "string", True))
    lake.insert("sr", _df(spark, [(2, 2.5, "x")], "id long, v double, tag string"))
    t.restore(v_before)
    assert [f.name for f in t.fields] == ["id", "v"]
    assert t.read().count() == 1


def test_column_evolution_over_http(lake, spark):
    import json
    import urllib.request

    from mini_lakehouse_control_plane_executor_spark.api.rest import LakehouseRestServer

    lake.create_table("sh", SCHEMA)
    lake.insert("sh", _df(spark, [(1, 1.5)]))
    srv = LakehouseRestServer(lake).start()
    try:
        def call(method, path, body=None, expect=200):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}{path}", method=method,
                data=json.dumps(body).encode() if body is not None else None,
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req) as resp:
                    assert resp.status == expect
                    return json.load(resp)
            except urllib.error.HTTPError as err:
                assert err.code == expect, f"{path}: {err.code}"
                return json.loads(err.read() or b"{}")

        out = call("POST", "/tables/sh/columns", {"name": "tag", "type": "string"})
        assert [c["name"] for c in out["schema"]] == ["id", "v", "tag"]
        call("POST", "/tables/sh/columns", {"name": "v", "type": "float64"}, expect=400)
        call("POST", "/tables/sh/columns", {"name": "x", "type": "string", "nullable": False}, expect=400)
        out = call("DELETE", "/tables/sh/columns/tag")
        assert [c["name"] for c in out["schema"]] == ["id", "v"]
        call("DELETE", "/tables/sh/columns/ghost", expect=404)
    finally:
        srv.stop()


def test_format_reader_null_fills_after_add_column(lake, spark):
    """The minilake DataSource reader imposes the snapshot schema too:
    files written before ADD COLUMN surface the new column as NULL
    through spark.read.format('minilake'), same as the native path."""
    from tests.test_pydatasource import register

    register(spark)
    lake.create_table("sf", SCHEMA)
    lake.insert("sf", _df(spark, [(1, 1.5)]))
    lake.table("sf").add_column(Field("tag", "string", True))
    lake.insert("sf", _df(spark, [(2, 2.5, "x")], "id long, v double, tag string"))
    got = {
        r.id: r.tag
        for r in (
            spark.read.format("minilake")
            .option("root", lake.root)
            .option("table", "sf")
            .load()
            .collect()
        )
    }
    assert got == {1: None, 2: "x"}


def test_insert_extra_columns_errors_without_merge_schema(lake, spark):
    """Delta write semantics: a dataframe with columns the table lacks
    is an ERROR by default (silently dropping data is never correct) —
    nothing committed, no schema change."""
    lake.create_table("ms0", [Field("id", "int64", False)])
    t = lake.table("ms0")
    t.insert(spark.range(0, 3).selectExpr("id"))
    v = t.log.latest_version()
    df = spark.range(3, 5).selectExpr("id", "cast(id as string) AS note")
    with pytest.raises(Exception, match="merge_schema"):
        t.insert(df)
    assert t.log.latest_version() == v
    assert [f.name for f in t.fields] == ["id"]
    assert t.read().count() == 3


def test_insert_merge_schema_evolves_and_is_idempotent(lake, spark):
    """`insert(df, merge_schema=True)` (Delta mergeSchema): extra
    dataframe columns become nullable table columns in one additive
    schema commit, old rows surface NULL, the data commit follows, and
    replaying the same txn_id commits nothing twice."""
    lake.create_table("ms1", [Field("id", "int64", False)])
    t = lake.table("ms1")
    t.insert(spark.range(0, 3).selectExpr("id"))
    v_before = t.log.latest_version()

    df = spark.range(3, 5).selectExpr(
        "id", "cast(id as string) AS note", "cast(id * 2 as long) AS dbl"
    )
    t.insert(df, txn_id="ms1-tx", merge_schema=True)
    assert [f.name for f in t.fields] == ["id", "note", "dbl"]
    assert all(f.nullable for f in t.fields if f.name != "id")
    rows = {r["id"]: (r["note"], r["dbl"]) for r in t.read().collect()}
    assert rows[0] == (None, None) and rows[3] == ("3", 6) and rows[4] == ("4", 8)
    # two commits: schema evolution + data
    assert t.log.latest_version() == v_before + 2
    # idempotent replay (schema txn and data txn both keyed off txn_id)
    t.insert(df, txn_id="ms1-tx", merge_schema=True)
    assert t.read().count() == 5
    assert t.log.latest_version() == v_before + 2
    # pre-evolution time travel still sees the narrow schema
    old = t.read(version=v_before)
    assert old.columns == ["id"] and old.count() == 3
