"""LakehouseTable: Parquet data files + transaction log, read through Spark.

Mirrors the reference's table lifecycle (``pkg/coordinator/table_service.go``):
layout ``<root>/tables/<name>/{_log/, data/, _tmp/}``
(``pkg/storage/paths.go:17-92``), insert = stage into ``_tmp/<txn>/`` → move
to ``data/part-%05d-<uuid>.parquet`` → OCC commit of adds
(``table_service.go:121-307,399-474``), compaction = small-file bin-pack →
rewrite → atomic adds+removes commit with retry/re-plan
(``pkg/coordinator/compaction_service.go``).

Spark-first differences from the reference:
- per-file min/max stats are harvested from Parquet footers at commit time
  and actually used for file-level pruning on filtered reads (the reference
  stores placeholders and never prunes — ``table_service.go:416-425``,
  ``query_planner.go:249-255``);
- reads are ``spark.read.parquet(<snapshot file list>)`` so Catalyst gets
  the real scan (column pruning, predicate pushdown, vectorized reader);
- compaction rewrite is real (coalesced re-write), not simulated.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.table.log import (
    CommitConflictError,
    CommitRetriesExhausted,
    FileAdd,
    Snapshot,
    TransactionLog,
)
from mini_lakehouse_control_plane_executor_spark.table.schema import (
    Field,
    SchemaError,
    from_spark_schema,
    to_spark_schema,
    validate_schema,
    validate_table_name,
)

# Compaction thresholds mirror the reference defaults
# (pkg/coordinator/compaction_service.go:59-65).
COMPACT_MIN_FILE_SIZE = 10 * 1024 * 1024
COMPACT_TARGET_FILE_SIZE = 128 * 1024 * 1024
COMPACT_MIN_CANDIDATES = 3
# Trigger: compact only when small files are also a meaningful fraction
# of the table (``compaction_service.go:315-332``).
COMPACT_SMALL_RATIO = 0.10
COMMIT_MAX_RETRIES = 3  # pkg/coordinator/transaction_manager.go:174-179
# Staging dirs older than this are crash leftovers: no writer keeps a
# stage alive for an hour (stage → promote → commit is one call).
TMP_SWEEP_AGE_SECONDS = 3600.0

# Deletion-vector bounds — the merge-on-read contract's self-enforcing
# half. A file whose deleted fraction reaches DV_MATERIALIZE_FRACTION is
# auto-rewritten right after the MoR commit that crossed the line
# (Delta's ~50% purge-eligibility heuristic): reading it costs full scan
# + anti-join for under half the live rows, so materializing is cheaper
# than the next two reads. DV_BROADCAST_MAX_ROWS bounds the dv side a
# native read will BROADCAST; above it the anti-join runs as a shuffled
# join instead (the per-file bitmap application in
# sources/pydatasource.py stays the at-scale shape). Both are module
# constants so tests (and operators) can tighten them.
DV_MATERIALIZE_FRACTION = 0.5
# Dust guard: auto-rewriting a file over a handful of dv'd rows is pure
# churn (the rewrite costs more than every future read saves); a file
# below this many dv rows only materializes through a normal compaction
# pass (where it is already a singleton-group candidate).
DV_MATERIALIZE_MIN_ROWS = 1024
# Table-wide pending-dv budget: above this, the post-commit pass also
# drafts the largest dv carriers (even under the fraction bar) until the
# projected total is back under budget.
DV_PENDING_MAX_ROWS = 4_000_000
DV_BROADCAST_MAX_ROWS = 4_000_000

# Stats are harvested only for scalar leaf types we can JSON-roundtrip.
# date/timestamp serialize as FIXED-WIDTH ISO strings ('%Y-%m-%d' /
# '%Y-%m-%d %H:%M:%S.%f'), whose lexicographic order equals their
# chronological order — so time-range pruning (the single most valuable
# prune on a 100 TB event table) works through plain string comparison.
_STATS_TYPES = {
    "int32", "int64", "float32", "float64", "string", "boolean",
    "date", "timestamp",
}


def _not_null_guard(col, field: Field):
    """Wrap a write-path column so a NULL in a non-nullable field fails
    the job inside the write pass itself (no separate validation scan).
    Used by every path that produces table rows: insert, merge source
    alignment, and when_matched rewrite expressions."""
    if field.nullable:
        return col
    from mini_lakehouse_control_plane_executor_spark.table.schema import to_spark_schema

    dtype = to_spark_schema([field])[field.name].dataType
    return F.when(
        col.isNull(),
        F.raise_error(
            F.lit(f"NOT NULL constraint violated: column {field.name!r}")
        ).cast(dtype),
    ).otherwise(col)


def _fill_partition_from_stats(adds: list, cluster_by: list[str]) -> list:
    """Record single-valued cluster columns in FileAdd.partition
    (FileInfo parity — ``proto/metadata.proto:94-113``): a file whose
    min == max for a clustered column is exactly a partition of that
    value, with no directory-layout commitment."""
    from dataclasses import replace as dc_replace

    return [
        dc_replace(
            a,
            partition={
                c: str(a.min_values[c])
                for c in cluster_by
                if c in a.min_values and a.min_values[c] == a.max_values.get(c)
            },
        )
        for a in adds
    ]


# Z-order clustering: quantile buckets per column (2^ZORDER_BITS), bit
# interleaved into one sort key. 8 bits = 256 buckets is the sweet spot:
# fine enough that each output file covers a narrow hyper-rectangle,
# coarse enough that the bucket-assignment expression (one HOF over a
# 255-literal cut array per column) stays cheap at scan speed.
ZORDER_BITS = 8

# Field types a z-order column may have, with how to project them onto
# the double line the quantile cuts live on. Strings are refused: there
# is no distance-preserving numeric embedding, and silently hashing them
# would destroy the locality z-ordering exists to create.
_ZORDER_CASTS = {
    "int32": lambda c: c.cast("double"),
    "int64": lambda c: c.cast("double"),
    "float32": lambda c: c.cast("double"),
    "float64": lambda c: c.cast("double"),
    "timestamp": lambda c: c.cast("double"),
    "date": lambda c: c.cast("timestamp").cast("double"),
}


def _zorder_value(df: DataFrame, cols: list[str], types: dict[str, str]):
    """Interleaved-bit Z-value column over per-column quantile buckets
    (the Delta OPTIMIZE ZORDER BY technique, built from public parts):
    each column is bucketed by its own approx-quantile cuts — so skewed
    columns still spread over all 256 buckets — and the bucket indexes'
    bits are interleaved LSB-first, giving the space-filling-curve key
    that range-partitioning then turns into files covering narrow
    hyper-rectangles in ALL clustered dimensions at once.

    Costs ONE extra aggregate pass over ``df`` (the quantile sketch,
    collected as a single driver row of ≤255 cuts per column) — the
    standard price of a z-order write."""
    n_buckets = 1 << ZORDER_BITS
    qs = [i / n_buckets for i in range(1, n_buckets)]
    casts = {c: _ZORDER_CASTS[types[c]] for c in cols}
    cuts_row = df.agg(
        *[
            F.percentile_approx(casts[c](df[c]), qs, 10000).alias(c)
            for c in cols
        ]
    ).first()
    k = len(cols)
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        cuts = sorted({x for x in (cuts_row[c] or []) if x is not None})
        if not cuts:
            continue  # empty/all-null column: contributes nothing
        arr = F.array(*[F.lit(float(x)) for x in cuts])
        v = casts[c](df[c])
        # Bucket = #cuts <= value; NULLs fall through to bucket 0.
        bucket = F.size(F.filter(arr, lambda x: x <= v))
        for i in range(ZORDER_BITS):
            z = z + F.shiftright(bucket, i).bitwiseAND(F.lit(1)).cast(
                "long"
            ) * F.lit(1 << (i * k + ci)).cast("long")
    return z


def _cluster_layout(
    df: DataFrame,
    n_part: int,
    cluster_by: list[str] | None,
    zorder_by: list[str] | None,
    types: dict[str, str],
) -> DataFrame:
    """Range-partition + sort the write so each output file covers a
    narrow slice of the cluster-key space. ``cluster_by`` sorts the
    columns lexicographically (sharpest pruning on the LEADING column);
    ``zorder_by`` sorts by the interleaved Z-value (balanced pruning on
    EVERY listed column — the right layout when queries filter the
    second column without the first)."""
    if cluster_by:
        return df.repartitionByRange(n_part, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    zcol = "__zorder"
    return (
        df.withColumn(zcol, _zorder_value(df, zorder_by, types))
        .repartitionByRange(n_part, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
    )


def _validate_cluster_args(
    fields: list[Field],
    cluster_by: list[str] | None,
    zorder_by: list[str] | None,
) -> None:
    if cluster_by and zorder_by:
        raise ValueError("pass either cluster_by or zorder_by, not both")
    names = {f.name for f in fields}
    unknown = set(cluster_by or []) | set(zorder_by or [])
    unknown -= names
    if unknown:
        raise ValueError(
            f"cluster_by/zorder_by unknown column(s): {sorted(unknown)}"
        )
    if zorder_by:
        types = {f.name: f.type for f in fields}
        bad = [c for c in zorder_by if types[c] not in _ZORDER_CASTS]
        if bad:
            raise ValueError(
                f"zorder_by supports {sorted(_ZORDER_CASTS)} columns; "
                f"unsupported: {bad}"
            )
        if len(zorder_by) < 2:
            raise ValueError(
                "zorder_by needs >= 2 columns (use cluster_by for one)"
            )


def _stat_value(v, ftype: str):
    import datetime as _dt

    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if ftype == "timestamp" and isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if ftype == "date" and isinstance(v, (_dt.date, _dt.datetime)):
        return v.strftime("%Y-%m-%d")
    return v


def _footer_stats(path: str, fields: list[Field]) -> tuple[int, dict, dict]:
    """(rows, min_values, max_values) from the Parquet footer — no data read."""
    md = pq.ParquetFile(path).metadata
    wanted = {f.name: f.type for f in fields if f.type in _STATS_TYPES}
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if name not in wanted:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mn = _stat_value(st.min, wanted[name])
            mx = _stat_value(st.max, wanted[name])
            if name not in mins or mn < mins[name]:
                mins[name] = mn
            if name not in maxs or mx > maxs[name]:
                maxs[name] = mx
    return md.num_rows, mins, maxs


def constraint_violation_over_files(
    spark: SparkSession,
    schema,
    abs_paths: list[str],
    constraints: dict[str, str],
) -> str | None:
    """Name of the first CHECK constraint any row in ``abs_paths``
    violates (TRUE/NULL passes, FALSE fails — SQL CHECK semantics), else
    None. ONE aggregate scan evaluates every constraint; the files are
    already schema-aligned (written post-cast), so this matches the
    in-write ``_constraint_guard`` exactly. Shared by the native insert
    commit loop and the ``minilake`` DataSource writer."""
    if not constraints or not abs_paths:
        return None
    names = sorted(constraints)
    row = (
        spark.read.schema(schema)
        .parquet(*abs_paths)
        .agg(
            *[
                F.count(
                    F.when(
                        ~F.coalesce(
                            F.expr(constraints[n]).cast("boolean"), F.lit(True)
                        ),
                        1,
                    )
                ).alias(n)
                for n in names
            ]
        )
        .collect()[0]
    )
    for n in names:
        if row[n]:
            return n
    return None


class LakehouseTable:
    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.name = name
        self.dir = os.path.join(root, "tables", name)
        self.data_dir = os.path.join(self.dir, "data")
        self.tmp_dir = os.path.join(self.dir, "_tmp")
        self.dv_dir = os.path.join(self.dir, "_dv")
        self.log = TransactionLog(self.dir)

    # -- lifecycle -----------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        name: str,
        fields: list[Field],
        constraints: dict[str, str] | None = None,
    ) -> "LakehouseTable":
        """``constraints``: optional CHECK constraints
        {name: boolean SQL expression} enforced on every insert (Delta
        `ALTER TABLE ADD CONSTRAINT CHECK` semantics: a row passes when
        the expression is TRUE or NULL, the write FAILS — inside the
        write pass, no extra scan — when any row evaluates FALSE).
        Expressions are analyzed against the table schema at create
        time, so a typo'd column fails here, not on first insert."""
        validate_table_name(name)
        validate_schema(fields)
        table = LakehouseTable(spark, root, name)
        if table.log.latest_version() > 0:
            raise ValueError(f"table {name!r} already exists")
        os.makedirs(table.data_dir, exist_ok=True)
        os.makedirs(table.tmp_dir, exist_ok=True)
        if constraints:
            probe = spark.createDataFrame([], to_spark_schema(fields))
            for cname, expr in constraints.items():
                if not re.fullmatch(r"[A-Za-z0-9_]+", cname):
                    raise ValueError(f"invalid constraint name {cname!r}")
                try:
                    probe.filter(F.expr(expr).cast("boolean")).schema
                except Exception as exc:
                    raise ValueError(
                        f"constraint {cname!r} does not analyze against the "
                        f"table schema: {exc}"
                    ) from exc
        # Version 1 = creation: schema + the constraint set, one atomic
        # commit — constraints are VERSIONED in the log (Delta table-
        # feature semantics), not a sidecar, so a crash can never leave
        # a half-written constraint file and time travel sees the CHECK
        # set of the version it reads.
        table.log.commit(
            0, f"create-{uuid.uuid4()}", fields, constraints=constraints or {}
        )
        return table

    @property
    def constraints(self) -> dict[str, str]:
        snap_c = self.log.snapshot().constraints
        if snap_c:
            return dict(snap_c)
        # Legacy sidecar fallback: tables created before constraints were
        # versioned in the log kept them in _constraints.json.
        path = os.path.join(self.dir, "_constraints.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    def add_constraint(self, cname: str, expr: str) -> None:
        """Delta ``ALTER TABLE ADD CONSTRAINT`` semantics: the new CHECK
        is validated against ALL existing rows first (one scan — Delta
        does the same); if any row violates it, nothing changes. The new
        set is published as a VERSIONED log commit through the same OCC
        CAS as data writes, which closes the race with a concurrent
        insert: either the insert commits first (its rows are covered by
        this validation scan, which retries on conflict against the
        fresh snapshot) or this commit lands first (the insert's own
        commit loop re-checks the snapshot's constraint set and
        validates its staged files before committing)."""
        if not re.fullmatch(r"[A-Za-z0-9_]+", cname):
            raise ValueError(f"invalid constraint name {cname!r}")
        try:
            F.expr(expr)  # syntax; analysis happens in the scan below
        except Exception as exc:
            raise ValueError(f"constraint {cname!r} does not parse: {exc}") from exc
        violating = ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
        txn = f"add-constraint-{cname}-{uuid.uuid4()}"
        last: Exception | None = None
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            current = self.constraints
            if cname in current:
                raise ValueError(f"constraint {cname!r} already exists")
            try:
                n_bad = (
                    self.read(version=snap.version)
                    .filter(violating)
                    .limit(1)
                    .count()
                )
            except Exception as exc:
                raise ValueError(
                    f"constraint {cname!r} does not analyze against the "
                    f"table schema: {exc}"
                ) from exc
            if n_bad:
                raise ValueError(
                    f"cannot add constraint {cname!r}: existing rows "
                    f"violate ({expr})"
                )
            try:
                self.log.commit(
                    snap.version,
                    txn,
                    snap.schema,
                    constraints={**current, cname: expr},
                )
                self._retire_legacy_sidecar()
                return
            except CommitConflictError as exc:
                # A data write landed between our validation snapshot and
                # the commit: re-validate against the fresh snapshot so
                # the new rows are covered, then try again.
                last = exc
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"add_constraint {cname!r} on {self.name!r} lost "
            f"{COMMIT_MAX_RETRIES + 1} OCC races"
        ) from last

    def drop_constraint(self, cname: str) -> None:
        """Delta ``ALTER TABLE DROP CONSTRAINT``: publish the shrunken
        CHECK set as a versioned log commit (same OCC CAS as
        ``add_constraint``), so the drop is time-travelable — a RESTORE
        to an earlier version brings the constraint back. Raises
        KeyError for an unknown name."""
        txn = f"drop-constraint-{cname}-{uuid.uuid4()}"
        last: Exception | None = None
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            current = self.constraints
            if cname not in current:
                raise KeyError(f"no such constraint: {cname!r}")
            remaining = {n: e for n, e in current.items() if n != cname}
            try:
                self.log.commit(
                    snap.version, txn, snap.schema, constraints=remaining
                )
                self._retire_legacy_sidecar()
                return
            except CommitConflictError as exc:
                last = exc
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"drop_constraint {cname!r} on {self.name!r} lost "
            f"{COMMIT_MAX_RETRIES + 1} OCC races"
        ) from last

    def add_column(self, field: Field) -> int:
        """Single-column convenience over ``add_columns`` (the additive
        schema-evolution commit, Delta ADD COLUMN semantics: nullable
        only, zero rewrite, old rows surface NULL)."""
        return self.add_columns([field])

    def drop_column(self, name: str) -> int:
        """Delta ``ALTER TABLE DROP COLUMN`` (logical): commit the
        narrowed schema; no data rewrite — reads impose the snapshot
        schema, so the files' extra column is simply never scanned
        (column pruning makes this free), and time travel to pre-drop
        versions still sees it. Refuses to orphan a CHECK constraint
        that references the column, and refuses to drop the last
        column."""
        txn = f"drop-column-{name}-{uuid.uuid4()}"
        last: Exception | None = None
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            if not any(f.name == name for f in snap.schema):
                raise KeyError(f"no such column: {name!r}")
            new_schema = [f for f in snap.schema if f.name != name]
            if not new_schema:
                raise SchemaError("cannot drop the last column")
            probe = self.spark.createDataFrame([], to_spark_schema(new_schema))
            for cname, expr in self.constraints.items():
                try:
                    probe.filter(F.expr(expr).cast("boolean")).schema
                except Exception:
                    raise SchemaError(
                        f"cannot drop column {name!r}: CHECK constraint "
                        f"{cname!r} references it ({expr}); drop the "
                        "constraint first"
                    )
            try:
                return self.log.commit(snap.version, txn, new_schema)
            except CommitConflictError as exc:
                last = exc
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"drop_column {name!r} on {self.name!r} lost "
            f"{COMMIT_MAX_RETRIES + 1} OCC races"
        ) from last

    def _retire_legacy_sidecar(self) -> None:
        """After a constraint commit, the log owns the full set; a
        lingering pre-versioning sidecar would shadow an empty log set
        through the legacy fallback (resurrecting dropped CHECKs)."""
        try:
            os.remove(os.path.join(self.dir, "_constraints.json"))
        except FileNotFoundError:
            pass

    def _constraint_guard(self, cols: list, df: DataFrame) -> list:
        """Fold CHECK enforcement into the first projected column so it
        cannot be pruned away: any row where a constraint evaluates
        FALSE (NULL passes, SQL CHECK semantics) raises inside the write
        pass — the `_not_null_guard` discipline."""
        constraints = self.constraints
        if not constraints:
            return cols
        first = cols[0]
        dtype = to_spark_schema(self.fields)[0].dataType
        for cname in sorted(constraints):
            violated = ~F.coalesce(
                F.expr(constraints[cname]).cast("boolean"), F.lit(True)
            )
            first = F.when(
                violated,
                F.raise_error(
                    F.lit(
                        f"CHECK constraint {cname!r} violated: "
                        f"({constraints[cname]})"
                    )
                ).cast(dtype),
            ).otherwise(first)
        return [first.alias(self.fields[0].name), *cols[1:]]

    def exists(self) -> bool:
        return self.log.latest_version() > 0

    @property
    def fields(self) -> list[Field]:
        return self.log.snapshot().schema

    @property
    def spark_schema(self):
        return to_spark_schema(self.fields)

    def versions(self) -> list[int]:
        return self.log.list_versions()

    # Operation inferred from the txn-id prefix each write path stamps.
    _HISTORY_OPS = (
        ("create-", "CREATE TABLE"),
        ("delete-", "DELETE"),
        ("update-", "UPDATE"),
        ("merge-", "MERGE"),
        ("compact-", "OPTIMIZE"),
        ("restore-", "RESTORE"),
        ("add-constraint-", "ADD CONSTRAINT"),
        ("drop-constraint-", "DROP CONSTRAINT"),
        ("alter-", "ADD COLUMN"),
        ("drop-column-", "DROP COLUMN"),
    )

    def history(self, limit: int | None = None) -> list[dict]:
        """Delta ``DESCRIBE HISTORY`` analogue: one dict per version,
        NEWEST first — version, timestamp_ms, txn_id, inferred
        operation, add/remove counts, rows added, whether the commit
        changed the schema, and whether it declared a constraint set
        (add/drop/create/restore do). Reads log entries only
        (no data files); ``limit`` bounds how many recent versions are
        returned."""
        # Bounded calls read only the newest limit+1 entries: every
        # commit stores a full schema, so the schema-changed diff for
        # version v needs only v-1's entry — walking the whole log for
        # history(limit=1) on a 10k-commit table was thousands of
        # redundant file reads. Each returned version still compares
        # against its true predecessor (the one extra entry read).
        versions = self.versions()  # oldest-first
        if limit is not None and limit >= 0:
            versions = versions[-(limit + 1):]
        out = []
        prev_schema: list[Field] = []
        for i, v in enumerate(versions):
            e = self.log.read_entry(v)
            op = "WRITE"
            for prefix, name in self._HISTORY_OPS:
                if e.txn_id.startswith(prefix):
                    op = name
                    break
            schema = e.schema or prev_schema
            out.append(
                {
                    "version": v,
                    "timestamp_ms": e.timestamp_ms,
                    "txn_id": e.txn_id,
                    "operation": op,
                    "n_added_files": len(e.adds),
                    "n_removed_files": len(e.removes),
                    "rows_added": sum(a.rows for a in e.adds),
                    "schema_changed": schema != prev_schema,
                    "constraints_changed": e.constraints is not None,
                }
            )
            prev_schema = schema
        out.reverse()
        return out if limit is None else out[:limit]

    # -- write path ----------------------------------------------------

    def insert(
        self,
        df: DataFrame,
        txn_id: str | None = None,
        mode: str = "append",
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        merge_schema: bool = False,
    ) -> int:
        """Commit ``df`` as a new version (staged write → move → OCC
        commit with bounded retry). Idempotent per ``txn_id``.

        ``mode='append'`` adds files; ``mode='overwrite'`` additionally
        removes every file visible at commit time (refreshed on each OCC
        retry, so a concurrent append cannot survive an overwrite that
        committed after it).

        ``cluster_by``: co-locate rows by these columns before writing so
        each file covers a narrow value range — the Spark-first answer to
        the reference's (always-empty) per-file partition map
        (``table_service.go:420`` "No partitioning for MVP"): file-level
        min/max stats then prune clustered columns exactly like partition
        pruning, with no schema surgery and no small-file-per-value
        explosion. Single-valued files additionally get their value
        recorded in ``FileAdd.partition`` (FileInfo parity).

        ``zorder_by``: multi-dimensional clustering — sort by the
        interleaved-bit Z-value of the columns' quantile buckets instead
        of lexicographically, so min/max pruning works on EVERY listed
        column, not just the leading one (see ``_zorder_value``)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown insert mode {mode!r}")
        txn_id = txn_id or str(uuid.uuid4())
        prior = self.log.find_txn(txn_id)
        if prior is not None:
            return prior

        fields = self.fields
        # Delta write semantics for EXTRA dataframe columns: error by
        # default (silently dropping data is never correct), evolve the
        # schema first when ``merge_schema=True`` (Delta's
        # ``mergeSchema`` option — one additive nullable-columns commit,
        # idempotent under this txn's replay, then the data commit).
        extra = [c for c in df.columns if c not in {f.name for f in fields}]
        if extra:
            if not merge_schema:
                raise SchemaError(
                    f"dataframe column(s) {extra} not in table schema; "
                    "pass merge_schema=True to evolve the schema, or drop "
                    "them explicitly"
                )
            new_fields = [
                Field(f.name, f.type, True)
                for f in from_spark_schema(df.select(*extra).schema)
            ]
            self.add_columns(new_fields, txn_id=f"{txn_id}-mergeschema")
            fields = self.fields
        schema = to_spark_schema(fields)
        _validate_cluster_args(fields, cluster_by, zorder_by)
        # Align column order/types to the table schema before writing.
        # NOT NULL enforcement rides the same projection (raise_error
        # fires inside the write pass — no extra scan), and also catches
        # a cast that nulled a non-null input.
        df = df.select(
            *[
                _not_null_guard(df[f.name].cast(schema[f.name].dataType), f).alias(
                    f.name
                )
                for f in fields
            ]
        )
        # CHECK constraints ride a second projection over the ALIGNED
        # (post-cast) columns — Delta semantics: constraints see final
        # values; CollapseProject folds both into one pass. The set
        # enforced here is captured so the commit loop can detect a
        # racing add_constraint and re-validate the staged files.
        enforced = self.constraints
        if enforced:
            df = df.select(
                *self._constraint_guard([df[f.name] for f in fields], df)
            )
        if cluster_by or zorder_by:
            # Range-partition (not hash): gives each output file a
            # CONTIGUOUS slice of the cluster-key space, the layout that
            # makes min/max pruning sharpest. Explicit numPartitions so
            # AQE cannot coalesce the clustered layout into one file.
            n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
            df = _cluster_layout(
                df, n_part, cluster_by, zorder_by,
                {f.name: f.type for f in fields},
            )

        self._sweep_stale_stages()
        stage = os.path.join(self.tmp_dir, txn_id)
        df.write.mode("overwrite").parquet(stage)
        try:
            adds = self._promote_staged(stage)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        if cluster_by or zorder_by:
            adds = _fill_partition_from_stats(adds, cluster_by or zorder_by)
        try:
            if mode == "append":
                return self._commit_with_retry(
                    txn_id, adds=adds, removes=[], enforced_constraints=enforced
                )
            last: Exception | None = None
            for attempt in range(COMMIT_MAX_RETRIES + 1):
                snap = self.log.snapshot()
                self._recheck_constraints(adds, enforced, snap.constraints)
                try:
                    # Commit the SNAPSHOT schema, not the entry-time
                    # field list: a concurrent add_column landing before
                    # a retry would otherwise be silently reverted by
                    # this commit's latest-schema-wins replay (the
                    # delete/update/compact loops already do this). The
                    # staged files simply lack the concurrent column and
                    # read as NULL under the committed schema.
                    return self.log.commit(
                        snap.version,
                        txn_id,
                        snap.schema,
                        adds,
                        [f.path for f in snap.files],
                    )
                except CommitConflictError as exc:
                    last = exc
                    time.sleep(0.01 * (attempt + 1))
            raise CommitRetriesExhausted(
                f"insert overwrite on {self.name!r} lost "
                f"{COMMIT_MAX_RETRIES + 1} OCC races"
            ) from last
        except BaseException:
            # Terminal commit failure: the promoted files were never made
            # visible by any log entry — reclaim them rather than leaking
            # orphans into data/ (reference cleans per-attempt staging,
            # ``table_service.go:477-494``).
            self._remove_adds(adds)
            raise

    def delete(
        self,
        filter_str: str,
        txn_id: str | None = None,
        mode: str = "copy-on-write",
    ) -> tuple[int | None, int]:
        """DELETE rows matching ``filter_str`` (reference grammar or any
        SQL predicate). Returns (new_version | None, rows_deleted); no
        version is committed when nothing matches. Old versions remain
        readable in both modes (commits add/replace log entries; they
        never mutate data files).

        ``mode='copy-on-write'`` (default, Delta's DELETE dataflow):
        files whose min/max stats admit matches are REWRITTEN without
        the matching rows; untouched files carry over by reference.
        Write amplification = the full size of every touched file.

        ``mode='merge-on-read'``: no data file is rewritten — the
        matching (file, row-position) pairs are written as a DELETION
        VECTOR (the public Delta/Iceberg merge-on-read design) and the
        affected files re-committed with the dv pointer attached; reads
        apply the dv as an anti-join, and compaction materializes it
        (rewrites the file without the deleted rows, clearing the dv).
        The write-amplification lever a selective DELETE over 100 TB
        needs: the commit costs O(deleted rows), not O(touched bytes).

        The reference stubs DeleteTable and has no row deletes
        (``rest_api.go:676-687``); this is beyond-reference surface.
        """
        from mini_lakehouse_control_plane_executor_spark.functions.filters import parse_filter, prune_files

        if mode not in ("copy-on-write", "cow", "merge-on-read", "mor"):
            raise ValueError(f"unknown delete mode {mode!r}")
        pred = parse_filter(filter_str)
        txn_id = txn_id or f"delete-{uuid.uuid4()}"
        prior = self.log.find_txn(txn_id)
        if prior is not None:
            return prior, 0
        if mode in ("merge-on-read", "mor"):
            return self._delete_mor(pred, filter_str, txn_id)

        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            candidates = prune_files(snap.files, filter_str, snap.schema)
            if not candidates:
                return None, 0
            schema = to_spark_schema(snap.schema)
            # Deletion vectors of candidate files apply here too: a
            # copy-on-write rewrite of a dv-carrying file must not
            # resurrect its already-deleted rows (and the rewrite
            # materializes the dv — the new add carries none).
            src = self._scan_files(candidates, schema)
            n_match = src.filter(pred).count()
            if n_match == 0:
                return None, 0
            stage = os.path.join(self.tmp_dir, txn_id)
            # SQL DELETE semantics: a row is deleted only when the predicate
            # is TRUE. ``~pred`` alone would also drop NULL-evaluating rows
            # (e.g. ``DELETE WHERE x > 5`` must keep rows with x IS NULL).
            keep = src.filter(~F.coalesce(pred, F.lit(False))).coalesce(
                max(1, len(candidates))
            )
            keep.write.mode("overwrite").parquet(stage)
            try:
                adds = self._promote_staged(stage)
            finally:
                shutil.rmtree(stage, ignore_errors=True)
            try:
                version = self.log.commit(
                    snap.version, txn_id, snap.schema, adds,
                    [f.path for f in candidates],
                )
                return version, n_match
            except CommitConflictError:
                # Concurrent commit: drop our rewrite and re-plan against
                # the fresh snapshot (same loop as compaction).
                self._remove_adds(adds)
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"delete on {self.name!r} lost {COMMIT_MAX_RETRIES + 1} OCC races"
        )

    def _write_dv(
        self, matches: DataFrame, candidates: list[FileAdd], tag: str
    ) -> tuple[list[FileAdd], dict[str, int], str | None]:
        """Write ONE new deletion-vector parquet carrying ``matches``
        (NEW deletions, as (src=basename, pos) over LIVE rows of
        ``candidates``) unioned with the affected files' existing dv
        positions (the new dv supersedes the old). Returns
        (dv-updated FileAdds, per-file new-deletion counts, abs dv path
        to remove on OCC-conflict cleanup); ([], {}, None) when nothing
        matched."""
        from dataclasses import replace as _dc_replace

        matches = matches.persist()
        try:
            new_counts = {
                r["src"]: r["n"]
                for r in matches.groupBy("src")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }  # bounded by |candidate files|
            if not new_counts:
                return [], {}, None
            by_name = {os.path.basename(f.path): f for f in candidates}
            affected = [by_name[s] for s in sorted(new_counts)]
            dv_df = matches
            carry = [f for f in affected if f.dv_path]
            if carry:
                dv_df = dv_df.unionByName(self._dv_rows(carry))
            stage = os.path.join(self.tmp_dir, f"dv-{tag}")
            dv_df.coalesce(1).write.mode("overwrite").parquet(stage)
            os.makedirs(self.dv_dir, exist_ok=True)
            part = next(
                f
                for f in sorted(os.listdir(stage))
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            dv_name = f"dv-{uuid.uuid4()}.parquet"
            shutil.move(
                os.path.join(stage, part), os.path.join(self.dv_dir, dv_name)
            )
            shutil.rmtree(stage, ignore_errors=True)
            rel_dv = os.path.join("_dv", dv_name)
            adds = [
                _dc_replace(
                    f,
                    dv_path=rel_dv,
                    dv_rows=f.dv_rows + new_counts[os.path.basename(f.path)],
                )
                for f in affected
            ]
            return adds, new_counts, os.path.join(self.dv_dir, dv_name)
        finally:
            matches.unpersist()

    def _dv_flagged(self, snap: Snapshot) -> list[FileAdd]:
        """Files due for deletion-vector materialization — the
        self-enforcing half of the MoR contract. Eligible: deleted
        fraction ≥ DV_MATERIALIZE_FRACTION (Delta's ~50% purge
        heuristic) with at least DV_MATERIALIZE_MIN_ROWS dv'd rows
        (dust guard). Additionally, when table-wide pending dv rows
        exceed DV_PENDING_MAX_ROWS, the largest dv carriers are drafted
        — fraction bar or not — until the projected total is back under
        budget, so a pathological client issuing millions of MoR
        deletes without ever compacting cannot grow the dv side
        unboundedly."""
        dvd = [f for f in snap.files if f.dv_path]
        flagged = {
            f.path: f
            for f in dvd
            if f.dv_rows >= DV_MATERIALIZE_MIN_ROWS
            and f.rows > 0
            and f.dv_rows / f.rows >= DV_MATERIALIZE_FRACTION
        }
        remaining = sum(f.dv_rows for f in dvd) - sum(
            f.dv_rows for f in flagged.values()
        )
        if sum(f.dv_rows for f in dvd) > DV_PENDING_MAX_ROWS:
            for f in sorted(dvd, key=lambda f: (-f.dv_rows, f.path)):
                if remaining <= DV_PENDING_MAX_ROWS:
                    break
                if f.path not in flagged:
                    flagged[f.path] = f
                    remaining -= f.dv_rows
        return sorted(flagged.values(), key=lambda f: f.path)

    def _auto_materialize_dvs(self) -> int | None:
        """Post-MoR-commit maintenance pass: rewrite (dv-applied) every
        flagged file, clearing its dv — its own OCC commit, retried like
        compaction's. BEST-EFFORT by design: losing every retry leaves
        the files flagged (the next MoR commit or compaction pass picks
        them up) and never fails the DML that triggered the pass.
        Returns the commit version, or None when nothing was flagged or
        every retry lost."""
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            flagged = self._dv_flagged(snap)
            if not flagged:
                return None
            txn = f"dvmat-{uuid.uuid4()}"
            schema = to_spark_schema(snap.schema)
            stage = os.path.join(self.tmp_dir, txn)
            adds: list[FileAdd] = []
            removes: list[str] = []
            try:
                for gi, f in enumerate(flagged):
                    out = os.path.join(stage, f"g{gi}")
                    self._scan_files([f], schema).coalesce(1).write.mode(
                        "overwrite"
                    ).parquet(out)
                    adds.extend(self._promote_staged(out))
                    removes.append(f.path)
            finally:
                shutil.rmtree(stage, ignore_errors=True)
            try:
                return self.log.commit(snap.version, txn, snap.schema, adds, removes)
            except CommitConflictError:
                self._remove_adds(adds)
                time.sleep(0.01 * (attempt + 1))
        return None

    def _delete_mor(
        self, pred, filter_str: str, txn_id: str
    ) -> tuple[int | None, int]:
        """Merge-on-read DELETE body: compute matching live row
        positions, union them with the affected files' existing dv
        positions into ONE new dv parquet, and commit the affected
        FileAdds with the new dv pointer (adds-only — log.commit allows
        re-adding an existing path when it swaps the dv). Matches are
        computed on the dv-APPLIED scan, so re-deleting an
        already-deleted row can never double-count."""
        from mini_lakehouse_control_plane_executor_spark.functions.filters import prune_files

        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            candidates = prune_files(snap.files, filter_str, snap.schema)
            if not candidates:
                return None, 0
            schema = to_spark_schema(snap.schema)
            live, src_col, pos_col = self._scan_files(
                candidates, schema, with_positions=True
            )
            matches = live.filter(pred).select(
                F.col(src_col).alias("src"), F.col(pos_col).alias("pos")
            )
            adds, new_counts, dv_abs = self._write_dv(
                matches, candidates, f"{txn_id}-a{attempt}"
            )
            if not new_counts:
                return None, 0
            try:
                version = self.log.commit(snap.version, txn_id, snap.schema, adds, [])
                self._auto_materialize_dvs()
                return version, sum(new_counts.values())
            except CommitConflictError:
                try:
                    os.remove(dv_abs)
                except OSError:
                    pass
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"delete on {self.name!r} lost {COMMIT_MAX_RETRIES + 1} OCC races"
        )

    def update(
        self,
        filter_str: str,
        assignments: dict[str, str],
        txn_id: str | None = None,
        mode: str = "copy-on-write",
    ) -> tuple[int | None, int]:
        """UPDATE: rows matching ``filter_str`` get each column in
        ``assignments`` set to the given SQL expression (evaluated
        against the pre-update row); all other rows — and all other
        files — carry over unchanged. Returns
        (new_version | None, rows_updated). Same OCC-retry, idempotency,
        and time-travel behavior as ``delete``.

        ``mode='copy-on-write'`` (default): files whose min/max stats
        admit matches are fully rewritten with the assignments applied.

        ``mode='merge-on-read'`` (Delta's DV UPDATE dataflow): the
        matched (file, position) pairs are committed as a deletion
        vector over the old rows and the REWRITTEN rows append as fresh
        files — one OCC commit, cost O(matched rows), not O(touched
        bytes). Row-level results are identical (pinned by the model
        test's mode coin-flip); compaction later materializes the dvs.
        Completes the DV write-path triple next to ``delete`` and
        ``merge``."""
        from mini_lakehouse_control_plane_executor_spark.functions.filters import parse_filter, prune_files

        if mode not in ("copy-on-write", "cow", "merge-on-read", "mor"):
            raise ValueError(f"unknown update mode {mode!r}")
        pred = parse_filter(filter_str)
        txn_id = txn_id or f"update-{uuid.uuid4()}"
        prior = self.log.find_txn(txn_id)
        if prior is not None:
            return prior, 0
        unknown = set(assignments) - {f.name for f in self.fields}
        if unknown:
            raise ValueError(f"UPDATE of unknown column(s): {sorted(unknown)}")
        if mode in ("merge-on-read", "mor"):
            return self._update_mor(pred, filter_str, assignments, txn_id)

        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            candidates = prune_files(snap.files, filter_str, snap.schema)
            if not candidates:
                return None, 0
            schema = to_spark_schema(snap.schema)
            # dv-aware: the rewrite must not resurrect deleted rows, and
            # it materializes any dv on the touched files.
            src = self._scan_files(candidates, schema)
            n_match = src.filter(pred).count()
            if n_match == 0:
                return None, 0
            out = src.select(
                *[
                    F.when(pred, F.expr(assignments[f.name]))
                    .otherwise(F.col(f.name))
                    .cast(schema[f.name].dataType)
                    .alias(f.name)
                    if f.name in assignments
                    else F.col(f.name)
                    for f in snap.schema
                ]
            )
            # Rewritten rows pass the same CHECK gate as insert; the
            # untouched rows trivially satisfy it (they already did).
            if self.constraints:
                out = out.select(
                    *self._constraint_guard(
                        [out[f.name] for f in snap.schema], out
                    )
                )
            out = out.coalesce(max(1, len(candidates)))
            stage = os.path.join(self.tmp_dir, txn_id)
            out.write.mode("overwrite").parquet(stage)
            try:
                adds = self._promote_staged(stage)
            finally:
                shutil.rmtree(stage, ignore_errors=True)
            try:
                version = self.log.commit(
                    snap.version, txn_id, snap.schema, adds,
                    [f.path for f in candidates],
                )
                return version, n_match
            except CommitConflictError:
                self._remove_adds(adds)
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"update on {self.name!r} lost {COMMIT_MAX_RETRIES + 1} OCC races"
        )

    def _update_mor(
        self,
        pred,
        filter_str: str,
        assignments: dict[str, str],
        txn_id: str,
    ) -> tuple[int | None, int]:
        """Merge-on-read UPDATE body (Delta's DV UPDATE): the matched
        live positions become deletion-vector entries over the old
        files, and the rewritten rows (assignments applied) append as
        fresh files — both in ONE OCC commit, so readers see the swap
        atomically. Matches are computed on the dv-APPLIED scan, so a
        previously MoR-deleted row can never be resurrected as an
        'updated' copy. Same re-plan-per-attempt loop as
        ``_delete_mor``; on conflict the fresh files AND the staged dv
        are both reclaimed before the retry."""
        from mini_lakehouse_control_plane_executor_spark.functions.filters import prune_files

        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            candidates = prune_files(snap.files, filter_str, snap.schema)
            if not candidates:
                return None, 0
            schema = to_spark_schema(snap.schema)
            live, src_col, pos_col = self._scan_files(
                candidates, schema, with_positions=True
            )
            matched = live.filter(pred)
            out = matched.select(
                *[
                    F.expr(assignments[f.name])
                    .cast(schema[f.name].dataType)
                    .alias(f.name)
                    if f.name in assignments
                    else F.col(f.name)
                    for f in snap.schema
                ]
            )
            # Rewritten rows pass the same CHECK gate as insert; the
            # dv'd old rows need none (they are being removed).
            if self.constraints:
                out = out.select(
                    *self._constraint_guard(
                        [out[f.name] for f in snap.schema], out
                    )
                )
            dv_adds, new_counts, dv_abs = self._write_dv(
                matched.select(
                    F.col(src_col).alias("src"), F.col(pos_col).alias("pos")
                ),
                candidates,
                f"{txn_id}-a{attempt}",
            )
            if not new_counts:
                return None, 0
            stage = os.path.join(self.tmp_dir, txn_id)
            try:
                # A failing rewrite (e.g. a CHECK-constraint violation
                # raised while materializing ``out``) must not leak the
                # already-written dv parquet — nothing referenced it yet.
                out.coalesce(max(1, len(candidates))).write.mode(
                    "overwrite"
                ).parquet(stage)
                adds = self._promote_staged(stage)
            except BaseException:
                if dv_abs is not None:
                    try:
                        os.remove(dv_abs)
                    except OSError:
                        pass
                raise
            finally:
                shutil.rmtree(stage, ignore_errors=True)
            try:
                version = self.log.commit(
                    snap.version, txn_id, snap.schema, adds + dv_adds, []
                )
                self._auto_materialize_dvs()
                return version, sum(new_counts.values())
            except CommitConflictError:
                # Fresh rewritten files are reclaimed; dv_adds point at
                # live data files (metadata-only updates) so only the
                # staged dv parquet itself is removed.
                self._remove_adds(adds)
                if dv_abs is not None:
                    try:
                        os.remove(dv_abs)
                    except OSError:
                        pass
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"update on {self.name!r} lost {COMMIT_MAX_RETRIES + 1} OCC races"
        )

    def merge(
        self,
        source: DataFrame,
        key: str,
        txn_id: str | None = None,
        when_matched: dict[str, str] | None = None,
        insert_unmatched: bool = True,
        mode: str = "copy-on-write",
    ) -> tuple[int, int, int]:
        """MERGE on ``key``. Default semantics (upsert): rows in the
        table whose key appears in ``source`` are replaced by the source
        row; source rows with unseen keys are appended.

        ``mode='copy-on-write'`` (default, Delta's dataflow) rewrites
        every candidate file without its matched rows; untouched files
        carry over by reference. ``mode='merge-on-read'`` instead
        DELETION-VECTORS the matched target rows (no candidate file is
        rewritten) and appends the replacement/updated rows as fresh
        files — the Iceberg MoR upsert: commit cost O(matched + source
        rows), not O(touched bytes). Row-level results are identical
        (pinned by the model test's mode coin-flip); compaction later
        materializes the dvs.

        Delta-style clauses:
        - ``when_matched``: instead of replacing, matched rows are
          rewritten column-by-column from SQL expressions that may
          reference both sides as ``target.<col>`` and ``source.<col>``
          (e.g. ``{"x": "target.x + source.x", "v": "source.v"}``);
          unlisted columns keep the target value. Requires source keys to
          be unique (Delta raises on multi-matches too).
        - ``insert_unmatched=False``: WHEN NOT MATCHED rows are dropped
          instead of appended.

        Only files whose [min,max] range for ``key`` intersects the
        source's key range are rewritten — everything else carries over
        by reference. Returns (new_version, rows_updated, rows_inserted).

        The source is materialized once (it is read for its key range,
        the joins, and the append)."""
        from pyspark.storagelevel import StorageLevel

        if mode not in ("copy-on-write", "cow", "merge-on-read", "mor"):
            raise ValueError(f"unknown merge mode {mode!r}")
        mor = mode in ("merge-on-read", "mor")
        txn_id = txn_id or f"merge-{uuid.uuid4()}"
        prior = self.log.find_txn(txn_id)
        if prior is not None:
            return prior, 0, 0

        fields = self.fields
        schema = to_spark_schema(fields)
        if key not in {f.name for f in fields}:
            raise ValueError(f"merge key {key!r} not in table schema")
        if when_matched:
            unknown = set(when_matched) - {f.name for f in fields}
            if unknown:
                raise ValueError(f"when_matched unknown column(s): {sorted(unknown)}")
        source = source.select(
            *[
                _not_null_guard(
                    source[f.name].cast(schema[f.name].dataType), f
                ).alias(f.name)
                for f in fields
            ]
        )
        # CHECK constraints gate merge-inserted/updated rows the same
        # way insert's write pass does (post-cast values).
        if self.constraints:
            source = source.select(
                *self._constraint_guard([source[f.name] for f in fields], source)
            )
        source = source.persist(StorageLevel.MEMORY_AND_DISK)
        if when_matched is not None:
            dups = (
                source.groupBy(key)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .limit(1)
                .count()
            )
            if dups:
                source.unpersist()
                raise ValueError(
                    "when_matched merge requires unique source keys "
                    "(a target row matched multiple source rows)"
                )
        bounds = source.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        if bounds["n"] == 0:
            source.unpersist()
            raise ValueError("merge source is empty")

        try:
            for attempt in range(COMMIT_MAX_RETRIES + 1):
                snap = self.log.snapshot()
                # Re-resolve the schema PER ATTEMPT: merge rewrites the
                # candidate files, so rewriting through the entry-time
                # schema after a concurrent add_column would physically
                # drop the new column's values from every rewritten file
                # and the commit would revert the schema via
                # latest-schema-wins replay. The source frame stays
                # aligned to the entry-time columns (a concurrent
                # column reads as NULL for merge-written rows — the
                # insert-overwrite semantics); target-side columns pass
                # through the rewrite intact.
                fields = snap.schema
                schema = to_spark_schema(fields)

                def _overlaps(f: FileAdd) -> bool:
                    mn, mx = f.min_values.get(key), f.max_values.get(key)
                    if mn is None or mx is None:
                        return True  # no stats: stay conservative
                    try:
                        return not (mx < bounds["lo"] or mn > bounds["hi"])
                    except TypeError:
                        return True
                candidates = [f for f in snap.files if _overlaps(f)]
                n_updated = 0
                adds: list[FileAdd] = []
                dv_adds: list[FileAdd] = []
                dv_abs: str | None = None
                stage = os.path.join(self.tmp_dir, txn_id)
                # dv-aware (and [] returns an empty frame): neither mode
                # may resurrect already-deleted rows of dv-carrying
                # files. Positions ride along for the merge-on-read
                # branch; ``cur`` is the live-row view both modes share.
                live, src_col, pos_col = self._scan_files(
                    candidates, schema, with_positions=True
                )
                cur = live.drop(src_col, pos_col)
                src_keys = source.select(key).distinct()
                if candidates:
                    if mor:
                        # Matched target rows become dv entries instead
                        # of a candidate-file rewrite; their replacement
                        # rows (source / when_matched output) append as
                        # fresh files below.
                        matched_pos = live.join(
                            src_keys, key, "left_semi"
                        ).select(
                            F.col(src_col).alias("src"),
                            F.col(pos_col).alias("pos"),
                        )
                        dv_adds, new_counts, dv_abs = self._write_dv(
                            matched_pos, candidates, f"{txn_id}-a{attempt}"
                        )
                        n_updated = sum(new_counts.values())
                    else:
                        n_updated = cur.join(src_keys, key, "left_semi").count()
                        kept = cur.join(src_keys, key, "left_anti")
                        kept.coalesce(max(1, len(candidates))).write.mode(
                            "overwrite"
                        ).parquet(os.path.join(stage, "kept"))
                    if when_matched is not None:
                        matched = cur.alias("target").join(
                            source.alias("source"),
                            F.col(f"target.{key}") == F.col(f"source.{key}"),
                        )
                        updated = matched.select(
                            *[
                                _not_null_guard(
                                    F.expr(when_matched[f.name]).cast(
                                        schema[f.name].dataType
                                    ),
                                    f,
                                ).alias(f.name)
                                if f.name in when_matched
                                else F.col(f"target.{f.name}").alias(f.name)
                                for f in fields
                            ]
                        )
                        # when_matched assignments produce NEW values, so
                        # they pass the same CHECK gate as inserts (the
                        # source-side guard above cannot cover them).
                        if self.constraints:
                            updated = updated.select(
                                *self._constraint_guard(
                                    [updated[f.name] for f in fields], updated
                                )
                            )
                        updated.coalesce(max(1, len(candidates))).write.mode(
                            "overwrite"
                        ).parquet(os.path.join(stage, "upd"))
                # WHEN NOT MATCHED rows (or the whole source for replace
                # semantics), written at natural parallelism — a large
                # upsert source must not serialize through one task.
                if when_matched is None:
                    news = source if insert_unmatched else source.join(
                        cur, key, "left_semi"
                    )
                    # rows_inserted = source rows whose key has no match
                    # in the target. Counted on the SOURCE side — the
                    # matched-target count (n_updated) over-counts when
                    # one source key matches several target rows.
                    n_inserted = (
                        bounds["n"] - source.join(cur, key, "left_semi").count()
                        if insert_unmatched
                        else 0
                    )
                else:
                    news = (
                        source.join(cur, key, "left_anti")
                        if insert_unmatched
                        else None
                    )
                    n_inserted = news.count() if news is not None else 0
                if news is not None:
                    news.write.mode("overwrite").parquet(os.path.join(stage, "src"))
                try:
                    for sub in ("kept", "upd", "src"):
                        subdir = os.path.join(stage, sub)
                        if os.path.isdir(subdir):
                            adds.extend(self._promote_staged(subdir))
                finally:
                    shutil.rmtree(stage, ignore_errors=True)
                try:
                    version = self.log.commit(
                        snap.version,
                        txn_id,
                        fields,
                        adds + dv_adds,
                        [] if mor else [f.path for f in candidates],
                    )
                    if mor and dv_adds:
                        self._auto_materialize_dvs()
                    return version, n_updated, n_inserted
                except CommitConflictError:
                    # Only FRESH files are reclaimed — dv_adds point at
                    # live data files (metadata-only updates).
                    self._remove_adds(adds)
                    if dv_abs is not None:
                        try:
                            os.remove(dv_abs)
                        except OSError:
                            pass
                    time.sleep(0.01 * (attempt + 1))
            raise CommitRetriesExhausted(
                f"merge on {self.name!r} lost {COMMIT_MAX_RETRIES + 1} OCC races"
            )
        finally:
            source.unpersist()

    def add_columns(self, new_fields: list[Field], txn_id: str | None = None) -> int:
        """Additive schema evolution: append nullable columns. Existing
        files are NOT rewritten — the snapshot read applies the latest
        schema (replay is already latest-schema-wins, as the reference's
        log replay is: ``transaction_log.go:191-194``) and Parquet scans
        surface missing columns as nulls."""
        txn_id = txn_id or f"alter-{uuid.uuid4()}"
        prior = self.log.find_txn(txn_id)
        if prior is not None:
            return prior
        for f in new_fields:
            if not f.nullable:
                raise SchemaError(
                    f"new column {f.name!r} must be nullable (existing rows have no value)"
                )
        last: Exception | None = None
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            # ONE snapshot per attempt: schema and commit base must come
            # from the same log read. Reading self.fields and then
            # latest_version() separately lets a concurrent schema commit
            # land between the two — base == latest, so the commit
            # succeeds with a merge computed from the STALE schema,
            # silently reverting the winner's column via latest-schema-
            # wins replay. Racing an identical column name still raises.
            snap = self.log.snapshot()
            names = {f.name for f in snap.schema}
            for f in new_fields:
                if f.name in names:
                    raise SchemaError(f"column {f.name!r} already exists")
            merged = list(snap.schema) + list(new_fields)
            validate_schema(merged)
            try:
                return self.log.commit(snap.version, txn_id, merged)
            except CommitConflictError as exc:
                last = exc
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"add_columns on {self.name!r} lost {COMMIT_MAX_RETRIES + 1} OCC races"
        ) from last

    def insert_path(
        self, path: str, fmt: str = "parquet", txn_id: str | None = None, **options
    ) -> int:
        """Reference InsertData: load external file(s) then append
        (``table_service.go:121-244``; CSV/JSON intent at ``:61``)."""
        reader = self.spark.read
        if fmt == "csv":
            df = reader.options(header=True, inferSchema=True, **options).csv(path)
        elif fmt == "json":
            df = reader.options(**options).json(path)
        elif fmt == "orc":
            df = reader.options(**options).orc(path)
        else:
            df = reader.options(**options).parquet(path)
        return self.insert(df, txn_id=txn_id)

    def _promote_staged(self, stage: str) -> list[FileAdd]:
        """Move staged part files into data/ with reference-style names and
        harvest footer stats (``table_service.go:455-474``)."""
        fields = self.fields
        adds: list[FileAdd] = []
        staged = sorted(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        for i, fname in enumerate(staged):
            src = os.path.join(stage, fname)
            dst_name = f"part-{i:05d}-{uuid.uuid4()}.parquet"
            dst = os.path.join(self.data_dir, dst_name)
            shutil.move(src, dst)
            rows, mins, maxs = _footer_stats(dst, fields)
            adds.append(
                FileAdd(
                    path=os.path.join("data", dst_name),
                    rows=rows,
                    size=os.path.getsize(dst),
                    min_values=mins,
                    max_values=maxs,
                )
            )
        return adds

    def _sweep_stale_stages(self) -> None:
        """Next-writer recovery from a crashed predecessor: remove
        staging dirs older than TMP_SWEEP_AGE_SECONDS (a crash between
        stage-write and promote leaves its ``_tmp/<txn>/`` behind; the
        reference likewise cleans per-attempt staging,
        ``table_service.go:477-494``). Never touches a live writer's
        stage — those are seconds old."""
        now = time.time()
        try:
            names = os.listdir(self.tmp_dir)
        except FileNotFoundError:
            return
        for dname in names:
            full = os.path.join(self.tmp_dir, dname)
            try:
                if now - os.stat(full).st_mtime < TMP_SWEEP_AGE_SECONDS:
                    continue
            except FileNotFoundError:
                continue
            shutil.rmtree(full, ignore_errors=True)

    def _remove_adds(self, adds: list[FileAdd]) -> None:
        """Reclaim files promoted into data/ whose commit never landed
        (conflict re-plan or terminal failure) — they are invisible to
        every snapshot, so deleting them is safe for all readers."""
        for add in adds:
            try:
                os.remove(os.path.join(self.dir, add.path))
            except FileNotFoundError:
                pass

    def _violated_constraint(
        self, adds: list[FileAdd], constraints: dict[str, str]
    ) -> str | None:
        """Name of the first CHECK constraint any row in ``adds``
        violates, else None. ONE aggregate scan evaluates every
        constraint (post-cast values — the files were written through
        the schema-aligned projection, so semantics match the in-write
        ``_constraint_guard``). Used when a constraint set changes
        between a writer's enforcement pass and its OCC commit."""
        if not constraints or not adds:
            return None
        paths = [os.path.join(self.dir, a.path) for a in adds]
        return constraint_violation_over_files(
            self.spark, self.spark_schema, paths, constraints
        )

    def _recheck_constraints(
        self,
        adds: list[FileAdd],
        enforced: dict[str, str],
        current: dict[str, str],
    ) -> None:
        """If CHECKs changed since this write's enforcement pass (a
        racing ``add_constraint`` won the OCC), validate the staged adds
        against the constraints it introduced before committing."""
        delta = {
            n: e for n, e in current.items() if enforced.get(n) != e
        }
        bad = self._violated_constraint(adds, delta)
        if bad:
            raise ValueError(
                f"CHECK constraint {bad!r} (added concurrently) violated "
                f"by this write: ({current[bad]})"
            )

    def _commit_with_retry(
        self,
        txn_id: str,
        adds: list[FileAdd],
        removes: list[str],
        enforced_constraints: dict[str, str] | None = None,
    ) -> int:
        """OCC commit, refreshing base_version on conflict, ≤3 retries
        (``transaction_manager.go:124-233``)."""
        last: Exception | None = None
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            base = snap.version
            if enforced_constraints is not None:
                self._recheck_constraints(
                    adds, enforced_constraints, snap.constraints
                )
            try:
                return self.log.commit(base, txn_id, self.fields, adds, removes)
            except CommitConflictError as exc:
                last = exc
                time.sleep(0.01 * (attempt + 1))
        # Typed exhaustion (not the last bare conflict) — the same error
        # contract as overwrite/delete/update/merge, so callers can tell
        # one lost race from running out of retries.
        raise CommitRetriesExhausted(
            f"commit on {self.name!r} lost {COMMIT_MAX_RETRIES + 1} OCC races"
        ) from last

    # -- read path -----------------------------------------------------

    def snapshot(self, version: int | None = None) -> Snapshot:
        return self.log.snapshot(version)

    # -- deletion-vector-aware scans ------------------------------------

    def _abs(self, path: str) -> str:
        # Shallow-clone FileAdds carry absolute paths; os.path.join
        # passes an absolute second argument through unchanged.
        return os.path.join(self.dir, path)

    def _dv_rows(self, files: list[FileAdd]) -> DataFrame:
        """Deleted (src=data-file basename, pos=row index) rows for the
        given dv-carrying files. Reading the UNION of their dv files and
        filtering src to the requested basenames is sound even when a dv
        file is shared across commits: a file's deleted-position set
        only GROWS until compaction materializes it (every new dv unions
        the old positions), so stale entries for a src in an older dv
        file are always a subset of its current set; and rewritten files
        get fresh uuid basenames, so a name never maps to two files."""
        names = [os.path.basename(f.path) for f in files]
        paths = sorted({self._abs(f.dv_path) for f in files})
        return (
            self.spark.read.schema("src string, pos long")
            .parquet(*paths)
            .where(F.col("src").isin(names))
        )

    def _scan_files(
        self, files: list[FileAdd], schema, with_positions: bool = False
    ) -> DataFrame:
        """Scan a file list with deletion vectors APPLIED: plain files
        read directly; dv-carrying files read with parquet row indexes
        (``_metadata.row_index``) and anti-joined against their deleted
        positions. The dv side broadcasts — it is bounded by
        deleted-but-not-yet-materialized rows, and compaction exists
        precisely to keep that bounded (at larger dv volumes the
        per-file bitmap application in sources/pydatasource.py is the
        shape to scale, as Delta's DV readers do).

        ``with_positions=True`` returns ``(df, src_col, pos_col)``: the
        frame keeps a file-basename column and a row-index column on
        every row (the merge-on-read write paths build new dv entries
        from them). The column NAMES are generated to avoid colliding
        with user columns — field names are unrestricted, so a literal
        ``_src`` could silently shadow (and then drop) a data column."""
        names = set(schema.fieldNames())
        src_col, pos_col = "_dv_src", "_dv_pos"
        while src_col in names:
            src_col += "_"
        while pos_col in names:
            pos_col += "_"
        if not files:
            df = self.spark.createDataFrame([], schema)
            if with_positions:
                df = df.withColumn(src_col, F.lit(None).cast("string")).withColumn(
                    pos_col, F.lit(None).cast("long")
                )
                return df, src_col, pos_col
            return df

        def _scan(fs: list[FileAdd], need_meta: bool) -> DataFrame:
            df = self.spark.read.schema(schema).parquet(
                *[self._abs(f.path) for f in fs]
            )
            if need_meta:
                df = df.withColumn(
                    src_col,
                    F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
                ).withColumn(pos_col, F.col("_metadata.row_index"))
            return df

        plain = [f for f in files if not f.dv_path]
        dvd = [f for f in files if f.dv_path]
        parts = []
        if plain:
            parts.append(_scan(plain, with_positions))
        if dvd:
            df = _scan(dvd, True)
            dv = self._dv_rows(dvd)
            # The dv side broadcasts only while it is broadcast-sane:
            # pending (deleted-but-not-materialized) rows are tracked
            # exactly in the log as dv_rows, so the bound costs no scan.
            # Above DV_BROADCAST_MAX_ROWS the anti-join runs as a
            # shuffled join instead of pushing an over-large build side
            # through the driver — the self-enforcing half of the
            # "compaction keeps it bounded" contract (the per-file
            # bitmap application in sources/pydatasource.py is the
            # fully task-local shape at Delta scale).
            if sum(f.dv_rows for f in dvd) <= DV_BROADCAST_MAX_ROWS:
                dv = F.broadcast(dv)
            else:
                # Explicit sort-merge: without the hint Catalyst's
                # size estimate of the (tiny-on-disk, wide-in-memory)
                # dv parquet could still pick a broadcast build.
                dv = dv.hint("merge")
            df = df.join(
                dv,
                (df[src_col] == dv["src"]) & (df[pos_col] == dv["pos"]),
                "left_anti",
            )
            if not with_positions:
                df = df.drop(src_col, pos_col)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if with_positions:
            return out, src_col, pos_col
        return out

    def read(
        self,
        version: int | None = None,
        prune_filter: str | None = None,
        timestamp_ms: int | None = None,
    ) -> DataFrame:
        """Snapshot-isolated read. The file list is resolved ONCE from the
        log (never by directory listing), so concurrent commits cannot
        change what this DataFrame sees — the reference's snapshot
        isolation guarantee (``pkg/coordinator/snapshot_isolation.go``).

        ``timestamp_ms`` resolves Delta-style ``timestampAsOf``: the last
        version committed at or before that wall-clock instant.

        ``prune_filter`` (reference filter grammar) additionally drops
        whole files via log min/max stats before Spark ever lists them —
        at 100 TB this is the difference between touching every object
        and touching the few that can match.
        """
        if timestamp_ms is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp_ms, not both")
            version = self.log.version_at_timestamp(timestamp_ms)
        snap = self.log.snapshot(version)
        schema = to_spark_schema(snap.schema)
        files = snap.files
        if prune_filter:
            from mini_lakehouse_control_plane_executor_spark.functions.filters import prune_files

            files = prune_files(files, prune_filter, snap.schema)
        return self._scan_files(files, schema)

    def diff(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Change-data-feed read: the multiset row difference between two
        versions, tagged ``_change_type`` in {insert, delete} (an update
        surfaces as delete+insert, as in Delta's CDF without per-commit
        change files).

        File-pruned: rows in data files common to BOTH snapshots cancel
        in the multiset difference by construction, so only the files
        added or removed between the versions are read — for the common
        case (an append or a compaction-sized rewrite between nearby
        versions) the diff touches the changed files, never the table.
        The exceptAll pair is two hash shuffles over just those rows.

        ``v_from=0`` is the empty pre-creation snapshot (Delta CDF's
        ``startingVersion=0`` convention): every row in ``v_to`` is an
        insert. It must NOT fall through to ``log.snapshot``, whose
        0-means-latest convention would silently diff latest→v_to."""
        if v_from < 0:
            raise ValueError(f"v_from must be >= 0, got {v_from}")
        new_snap = self.log.snapshot(v_to)
        schema = to_spark_schema(new_snap.schema)
        old_files = [] if v_from == 0 else self.log.snapshot(v_from).files

        # A file is "changed" when its (path, dv) PAIR differs — a
        # merge-on-read delete keeps the path but swaps the deletion
        # vector, and its deleted rows must surface in the diff. Both
        # sides scan dv-AWARE (each with its own version's dv), so rows
        # live in both versions cancel in the multiset difference and a
        # dv-only change nets exactly the newly-deleted rows.
        def _key(f: FileAdd):
            return (f.path, f.dv_path)

        old_keys = {_key(f) for f in old_files}
        new_keys = {_key(f) for f in new_snap.files}
        old_only = self._scan_files(
            sorted(
                (f for f in old_files if _key(f) not in new_keys),
                key=lambda f: f.path,
            ),
            schema,
        )
        new_only = self._scan_files(
            sorted(
                (f for f in new_snap.files if _key(f) not in old_keys),
                key=lambda f: f.path,
            ),
            schema,
        )
        # Columns added between versions read as NULL from old files
        # (parquet schema merge by name), so the diff is well-typed
        # under additive evolution.
        added = new_only.exceptAll(old_only).withColumn(
            "_change_type", F.lit("insert")
        )
        removed = old_only.exceptAll(new_only).withColumn(
            "_change_type", F.lit("delete")
        )
        return added.unionByName(removed)

    # -- retention -----------------------------------------------------

    def vacuum(
        self, retain_versions: int = 1, min_age_seconds: float = 3600.0
    ) -> dict:
        """Reclaim data files not referenced by any of the newest
        ``retain_versions`` versions (Delta-style VACUUM; the reference
        never garbage-collects, it only cleans per-attempt staging —
        ``pkg/coordinator/table_service.go:477-494``).

        Safety properties:
        - retained versions stay byte-identical (only files outside their
          union are touched), so a concurrent reader pinned at any
          retained version is unaffected;
        - files younger than ``min_age_seconds`` are never deleted, which
          protects a concurrent writer's promoted-but-not-yet-committed
          files (the same race Delta guards with its retention window);
        - time travel to vacuumed versions becomes unreadable — that is
          the documented trade the user opts into.

        Also sweeps crash-leftover ``_tmp/`` staging dirs older than the
        age threshold. Returns deletion stats."""
        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        versions = self.log.list_versions()
        retained = versions[-retain_versions:]
        referenced: set[str] = set()
        referenced_dv: set[str] = set()
        for v in retained:
            snap = self.log.snapshot(v)
            referenced.update(snap.file_paths)
            referenced_dv.update(f.dv_path for f in snap.files if f.dv_path)
        now = time.time()
        deleted_files = freed_bytes = 0

        def _sweep_dir(dirpath: str, prefix: str, keep: set[str]) -> None:
            nonlocal deleted_files, freed_bytes
            if not os.path.isdir(dirpath):
                return
            for fname in os.listdir(dirpath):
                if os.path.join(prefix, fname) in keep:
                    continue
                full = os.path.join(dirpath, fname)
                try:
                    st = os.stat(full)
                except FileNotFoundError:
                    continue
                if now - st.st_mtime < min_age_seconds:
                    continue  # possibly a concurrent writer's in-flight file
                try:
                    os.remove(full)
                    deleted_files += 1
                    freed_bytes += st.st_size
                except FileNotFoundError:
                    pass

        _sweep_dir(self.data_dir, "data", referenced)
        # Deletion-vector files unreferenced by every retained version
        # (superseded by a later dv, or materialized by compaction).
        _sweep_dir(self.dv_dir, "_dv", referenced_dv)
        removed_tmp = 0
        for dname in os.listdir(self.tmp_dir):
            full = os.path.join(self.tmp_dir, dname)
            try:
                if now - os.stat(full).st_mtime < min_age_seconds:
                    continue
            except FileNotFoundError:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed_tmp += 1
        # Commit-staging leftovers: a crash between writing <v>.json.*.tmp
        # and the hard-link leaves the tmp file behind (log.commit).
        for fname in os.listdir(self.log.log_dir):
            if ".tmp" not in fname:
                continue
            full = os.path.join(self.log.log_dir, fname)
            try:
                if now - os.stat(full).st_mtime >= min_age_seconds:
                    os.remove(full)
                    removed_tmp += 1
            except FileNotFoundError:
                pass
        return {
            "deleted_files": deleted_files,
            "freed_bytes": freed_bytes,
            "removed_tmp_dirs": removed_tmp,
            "retained_versions": retained,
        }

    # -- compaction ----------------------------------------------------

    def should_compact(self, snap: Snapshot | None = None) -> bool:
        """The reference's ShouldCompact trigger: ≥3 small files AND
        small-file count over 10% of the snapshot
        (``compaction_service.go:315-332``)."""
        snap = snap if snap is not None else self.log.snapshot()
        if not snap.files:
            return False
        small = [f for f in snap.files if f.size < COMPACT_MIN_FILE_SIZE]
        return (
            len(small) >= COMPACT_MIN_CANDIDATES
            and len(small) / len(snap.files) > COMPACT_SMALL_RATIO
        )

    def compaction_candidates(
        self, snap: Snapshot, files: list[FileAdd] | None = None
    ) -> list[list[FileAdd]]:
        """Greedy bin-packing of small files into ≤target-size groups
        (``compaction_service.go:79-141,144-200``). ``files`` restricts
        the candidate pool (the ``where``-scoped subset); default = the
        whole snapshot."""
        pool = files if files is not None else snap.files
        small = [f for f in pool if f.size < COMPACT_MIN_FILE_SIZE]
        groups: list[list[FileAdd]] = []
        if len(small) >= COMPACT_MIN_CANDIDATES:
            cur: list[FileAdd] = []
            cur_size = 0
            for f in sorted(small, key=lambda f: f.path):
                if cur and cur_size + f.size > COMPACT_TARGET_FILE_SIZE:
                    groups.append(cur)
                    cur, cur_size = [], 0
                cur.append(f)
                cur_size += f.size
            if len(cur) >= 2:
                groups.append(cur)
            groups = [g for g in groups if len(g) >= 2]
        # A file carrying a deletion vector is ALWAYS a candidate
        # (singleton group allowed): its rewrite is what materializes
        # the dv — the merge-on-read contract's second half.
        grouped = {f.path for g in groups for f in g}
        groups.extend(
            [f]
            for f in sorted(pool, key=lambda f: f.path)
            if f.dv_path and f.path not in grouped
        )
        return groups

    def compact(
        self,
        txn_id: str | None = None,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        where: str | None = None,
    ) -> int | None:
        """Rewrite small files into big ones; atomic adds+removes commit;
        on OCC conflict re-plan from the fresh snapshot and retry ≤3
        (``compaction_service.go:336-496,712-820``). Old versions remain
        readable (property 30, ``design.md:401-403``). Returns the new
        version, or None if nothing to compact.

        ``cluster_by`` switches to CLUSTERED compaction (Delta's
        ``OPTIMIZE ... ZORDER BY`` analogue for linear keys): ALL
        current files are rewritten in one group, range-partitioned and
        sorted by the cluster columns into ~target-size files — each
        output covers a contiguous key slice, so min/max stats prune
        the clustered columns like partitions on every later read. The
        storage-side lever for repeated selective scans at 100 TB: pay
        one clustered rewrite, then every query prunes.

        ``zorder_by`` is the multi-dimensional variant (Delta's actual
        ZORDER BY): interleaved-bit quantile-bucket key, so pruning
        works on every listed column — see ``_zorder_value``.

        ``where`` scopes WHICH FILES are eligible (Delta's
        ``OPTIMIZE ... WHERE`` at file granularity): only files whose
        min/max stats possibly match the predicate (the same sound
        ``prune_files`` test reads use) are rewritten; everything else
        is left byte-identical in place. Rows are never filtered —
        a rewritten file keeps ALL its rows, matching or not, so the
        table's data is unchanged (only its layout). The hot-partition
        lever: re-cluster last week's files without paying a full-table
        rewrite. Composes with ``cluster_by``/``zorder_by`` (the scoped
        subset is rewritten in the clustered layout)."""
        from mini_lakehouse_control_plane_executor_spark.functions.filters import (
            prune_files,
        )

        _validate_cluster_args(self.fields, cluster_by, zorder_by)
        for _ in range(COMMIT_MAX_RETRIES + 1):
            snap = self.log.snapshot()
            pool = list(snap.files)
            if where:
                pool = prune_files(pool, where, snap.schema)
            if cluster_by or zorder_by:
                groups = [pool] if pool else []
            else:
                groups = self.compaction_candidates(snap, files=pool)
            if not groups:
                return None
            # Caller-supplied txn id (the session's compaction run id,
            # so log/status/commit lines correlate) is safe to REUSE
            # across OCC retries: a conflicted attempt never registered
            # the txn, and its staging dir was already swept.
            txn = txn_id or f"compact-{uuid.uuid4()}"
            adds: list[FileAdd] = []
            removes: list[str] = []
            stage = os.path.join(self.tmp_dir, txn)
            schema = to_spark_schema(snap.schema)
            for gi, group in enumerate(groups):
                out = os.path.join(stage, f"g{gi}")
                # dv-aware: compaction is what MATERIALIZES deletion
                # vectors — the rewrite drops the deleted rows and the
                # fresh adds carry no dv.
                df = self._scan_files(group, schema)
                if cluster_by or zorder_by:
                    n_out = max(
                        1,
                        -(-sum(f.size for f in group) // COMPACT_TARGET_FILE_SIZE),
                    )
                    df = _cluster_layout(
                        df, n_out, cluster_by, zorder_by,
                        {f.name: f.type for f in snap.schema},
                    )
                else:
                    df = df.coalesce(1)
                df.write.mode("overwrite").parquet(out)
                adds.extend(self._promote_staged(out))
                removes.extend(f.path for f in group)
            shutil.rmtree(stage, ignore_errors=True)
            if cluster_by or zorder_by:
                adds = _fill_partition_from_stats(adds, cluster_by or zorder_by)
            try:
                return self.log.commit(snap.version, txn, snap.schema, adds, removes)
            except CommitConflictError:
                # Another writer advanced the table: drop our rewrite
                # output and re-plan against the new snapshot.
                self._remove_adds(adds)
                continue
        return None

    def restore(self, version: int, txn_id: str | None = None) -> int:
        """Delta-style RESTORE TABLE ... TO VERSION AS OF: make the
        CURRENT state identical to snapshot ``version`` via one new
        forward commit — history is never rewritten, so time travel to
        every interim version keeps working and the restore itself is
        a versioned, diffable event. adds = target files not visible
        now; removes = visible files not in the target; the commit also
        carries the target's schema AND its CHECK-constraint set
        (restore restores both, Delta semantics). Idempotent per
        ``txn_id``; on OCC conflict the diff
        recomputes against the fresh snapshot. Raises if a needed data
        file was vacuumed away (the same guard Delta applies)."""
        txn = txn_id or f"restore-{uuid.uuid4()}"
        prior = self.log.find_txn(txn)
        if prior is not None:
            return prior
        target = self.log.snapshot(version)  # raises on unknown version
        missing = [
            p
            for f in target.files
            for p in ([f.path] + ([f.dv_path] if f.dv_path else []))
            if not os.path.exists(os.path.join(self.dir, p))
        ]
        if missing:
            raise ValueError(
                f"version {version} is no longer restorable: "
                f"{len(missing)} data file(s) vacuumed (e.g. {missing[0]!r})"
            )
        last: Exception | None = None
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            cur = self.log.snapshot()
            cur_paths = {f.path for f in cur.files}
            tgt_paths = {f.path for f in target.files}
            # Diff on the (path, dv) PAIR: a file whose deletion vector
            # changed since the target version must be re-added with the
            # target's dv pointer (possibly none — that UNDOES a
            # merge-on-read delete), which log.commit allows for
            # dv-changing re-adds.
            cur_keys = {(f.path, f.dv_path) for f in cur.files}
            adds = [
                f for f in target.files if (f.path, f.dv_path) not in cur_keys
            ]
            removes = sorted(cur_paths - tgt_paths)
            try:
                # Constraints restore with the data (Delta versions CHECK
                # constraints in the log; so do we).
                return self.log.commit(
                    cur.version,
                    txn,
                    target.schema,
                    adds,
                    removes,
                    constraints=dict(target.constraints),
                )
            except CommitConflictError as exc:
                last = exc
                time.sleep(0.01 * (attempt + 1))
        raise CommitRetriesExhausted(
            f"restore of {self.name!r} to v{version} lost "
            f"{COMMIT_MAX_RETRIES + 1} OCC races"
        ) from last
