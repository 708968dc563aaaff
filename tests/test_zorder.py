"""Z-order (multi-dimensional) clustering: layout, pruning benefit,
compaction path, and validation.

The point of z-ordering over linear ``cluster_by``: with a
lexicographic (x, y) sort, file-level min/max stats prune x-predicates
sharply but y-predicates not at all (every file spans ~the full y
range). The interleaved-bit Z-value gives every listed column partial
locality, so a selective predicate on ANY of them prunes files. These
tests pin that behavior mechanically via prune_files over the
committed footer stats — the same pruner the DataSource read path
uses."""

import pyspark.sql.functions as F
import pytest

from mini_lakehouse_control_plane_executor_spark.functions.filters import prune_files
from mini_lakehouse_control_plane_executor_spark.table.table import Field

FIELDS = [
    Field("x", "int64", False),
    Field("y", "int64", False),
    Field("v", "float64", True),
]


def _grid(spark, n=64000):
    # Independent 100x100 grid: x cycles fast, y slow — so a linear
    # (x, y) sort gives y no file-level locality at all.
    return spark.range(0, n).select(
        (F.col("id") % 100).alias("x"),
        ((F.col("id") / 100).cast("long") % 100).alias("y"),
        F.rand(7).alias("v"),
    )


def test_zorder_insert_prunes_every_listed_column(spark, lake):
    df = _grid(spark)
    tz = lake.create_table("tz_ins", FIELDS)
    tz.insert(df, zorder_by=["x", "y"], txn_id="z1")
    tl = lake.create_table("tl_ins", FIELDS)
    tl.insert(df, cluster_by=["x", "y"], txn_id="l1")

    zf = tz.log.snapshot().files
    lf = tl.log.snapshot().files
    assert len(zf) > 1 and len(lf) > 1

    # Linear layout: trailing column y prunes nothing (each file spans
    # the full y range). Z-order: the y predicate prunes a strict
    # majority of files, and so does x — balanced pruning.
    z_y = len(prune_files(zf, "y >= 90", tz.fields))
    l_y = len(prune_files(lf, "y >= 90", tl.fields))
    assert l_y == len(lf), "grid data: linear layout cannot prune on y"
    assert z_y <= len(zf) // 2, (z_y, len(zf))
    z_x = len(prune_files(zf, "x >= 90", tz.fields))
    assert z_x < len(zf), (z_x, len(zf))
    # Conjunctive predicate: intersection prunes at least as hard.
    z_xy = len(prune_files(zf, "x >= 90 AND y >= 90", tz.fields))
    assert z_xy <= min(z_x, z_y)

    # Layout never changes data: same rows under every predicate.
    for pred in ("y >= 90", "x >= 90 AND y >= 90"):
        assert (
            tz.read().filter(pred).count()
            == tl.read().filter(pred).count()
            == df.filter(pred).count()
        )


def test_zorder_compact_rewrites_and_prunes(spark, lake, monkeypatch):
    # Shrink the target so the rewrite emits several files (the real
    # 128MB target would bin this fixture into one file — correct at
    # scale, but then there is nothing to prune between files).
    from mini_lakehouse_control_plane_executor_spark.table import table as table_mod

    monkeypatch.setattr(table_mod, "COMPACT_TARGET_FILE_SIZE", 24 * 1024)
    t = lake.create_table("tz_cmp", FIELDS)
    df = _grid(spark, 20000)
    # Several unclustered small-batch inserts -> no pruning possible.
    for i in range(4):
        t.insert(
            df.filter((F.col("x") % 4) == i).repartition(4),
            txn_id=f"b{i}",
        )
    before = t.log.snapshot()
    assert len(prune_files(before.files, "y >= 90", t.fields)) == len(before.files)
    n_rows = t.read().count()

    v = t.compact(zorder_by=["x", "y"])
    assert v is not None
    after = t.log.snapshot()
    assert t.read().count() == n_rows
    # Old version still readable (property 30).
    assert t.read(version=before.version).count() == n_rows
    # The rewrite bought pruning on y.
    kept = len(prune_files(after.files, "y >= 90", t.fields))
    assert kept < len(after.files)


def test_zorder_supports_time_columns(spark, lake):
    t = lake.create_table(
        "tz_time",
        [
            Field("ts", "timestamp", False),
            Field("k", "int64", False),
        ],
    )
    df = spark.range(0, 8000).select(
        F.timestamp_seconds(1700000000 + (F.col("id") % 100) * 86400).alias("ts"),
        ((F.col("id") / 100).cast("long") % 80).alias("k"),
    )
    t.insert(df, zorder_by=["ts", "k"], txn_id="t1")
    files = t.log.snapshot().files
    assert len(files) > 1
    kept = len(prune_files(files, "k >= 70", t.fields))
    assert kept < len(files)
    assert t.read().count() == 8000


def test_zorder_validation(spark, lake):
    t = lake.create_table(
        "tz_val",
        FIELDS + [Field("s", "string", True)],
    )
    df = _grid(spark, 100).withColumn("s", F.lit("a"))
    with pytest.raises(ValueError, match="not both"):
        t.insert(df, cluster_by=["x"], zorder_by=["x", "y"])
    with pytest.raises(ValueError, match=">= 2 columns"):
        t.insert(df, zorder_by=["x"])
    with pytest.raises(ValueError, match="unsupported"):
        t.insert(df, zorder_by=["x", "s"])
    with pytest.raises(ValueError, match="unknown column"):
        t.compact(zorder_by=["x", "nope"])
