"""gRPC parity for the reference's stable protobuf interface.

The reference declares its protobufs the stable contract (requirement 0,
``.kiro/specs/mini-lakehouse/requirements.md:31-33``); of the three
services, ``MetadataService`` (``proto/metadata.proto:8-16``) is the one
a USER-facing engine must honor — CreateTable / GetLatestVersion /
GetSnapshot / Commit / ListVersions / Leader / Health. The other two
(``coordinator.proto``'s worker registration/heartbeat and
``worker.proto``'s RunTask) are the work-scheduling plane that Spark's
driver/executor machinery replaces wholesale (SURVEY §4.3), so they have
no analogue here by design.

Layering:

- **Messages** are plain dataclasses mirroring ``metadata.proto``
  field-for-field, with proto3 semantics: every field has a zero
  default, an empty ``error`` string means success, and unknown wire
  fields are ignored on parse.
- **``MetadataServicer``** is transport-agnostic: each RPC takes a
  request message and returns a response message, errors reported IN
  the response (the reference's convention — its handlers never raise
  over the wire, e.g. ``CommitResponse.error``), backed by
  ``LakehouseSession`` and the transaction log.
- **``serve()``** binds the servicer to a real ``grpc.Server`` when
  ``grpcio`` is importable and raises a clear ImportError otherwise.
  The repo ships no generated protobuf stubs, so the wire codec is
  JSON via generic method handlers — service path, method names, and
  message shapes are exactly the proto's; only the byte encoding
  differs, and swapping in generated stubs would touch ``serve()``
  alone, not the servicer.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field

from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession
from mini_lakehouse_control_plane_executor_spark.table.log import (
    CommitConflictError,
    CommitValidationError,
    FileAdd,
)
from mini_lakehouse_control_plane_executor_spark.table.schema import Field as SchemaField
from mini_lakehouse_control_plane_executor_spark.table.schema import SchemaError

SERVICE_NAME = "metadata.MetadataService"  # proto/metadata.proto:3,8


# ---------------------------------------------------------------------------
# Messages (proto/metadata.proto:18-113). One dataclass per proto
# message, same field names, proto3 zero defaults.
# ---------------------------------------------------------------------------


@dataclass
class Field:
    name: str = ""
    type: str = ""
    nullable: bool = False

    def to_json(self) -> dict:
        return {"name": self.name, "type": self.type, "nullable": self.nullable}

    @staticmethod
    def from_json(d: dict) -> "Field":
        return Field(d.get("name", ""), d.get("type", ""), bool(d.get("nullable", False)))


@dataclass
class Schema:
    fields: list[Field] = dc_field(default_factory=list)

    def to_json(self) -> dict:
        return {"fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(d: dict) -> "Schema":
        return Schema([Field.from_json(f) for f in d.get("fields") or []])


@dataclass
class FileStats:
    min_values: dict = dc_field(default_factory=dict)
    max_values: dict = dc_field(default_factory=dict)

    def to_json(self) -> dict:
        return {"min_values": self.min_values, "max_values": self.max_values}

    @staticmethod
    def from_json(d: dict) -> "FileStats":
        return FileStats(d.get("min_values") or {}, d.get("max_values") or {})


@dataclass
class FileInfo:
    """``FileInfo`` and ``FileAdd`` share one shape in the proto
    (``metadata.proto:94-113``); one dataclass serves both."""

    path: str = ""
    rows: int = 0
    size: int = 0
    partition: dict = dc_field(default_factory=dict)
    stats: FileStats = dc_field(default_factory=FileStats)

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "rows": self.rows,
            "size": self.size,
            "partition": self.partition,
            "stats": self.stats.to_json(),
        }

    @staticmethod
    def from_json(d: dict) -> "FileInfo":
        return FileInfo(
            path=d.get("path", ""),
            rows=int(d.get("rows", 0)),
            size=int(d.get("size", 0)),
            partition=d.get("partition") or {},
            stats=FileStats.from_json(d.get("stats") or {}),
        )


@dataclass
class FileRemove:
    path: str = ""

    def to_json(self) -> dict:
        return {"path": self.path}

    @staticmethod
    def from_json(d: dict) -> "FileRemove":
        return FileRemove(d.get("path", ""))


@dataclass
class CreateTableRequest:
    table_name: str = ""
    schema: Schema = dc_field(default_factory=Schema)

    @staticmethod
    def from_json(d: dict) -> "CreateTableRequest":
        return CreateTableRequest(
            d.get("table_name", ""), Schema.from_json(d.get("schema") or {})
        )

    def to_json(self) -> dict:
        return {"table_name": self.table_name, "schema": self.schema.to_json()}


@dataclass
class CreateTableResponse:
    success: bool = False
    error: str = ""

    def to_json(self) -> dict:
        return {"success": self.success, "error": self.error}

    @staticmethod
    def from_json(d: dict) -> "CreateTableResponse":
        return CreateTableResponse(bool(d.get("success", False)), d.get("error", ""))


@dataclass
class GetLatestVersionRequest:
    table_name: str = ""

    @staticmethod
    def from_json(d: dict) -> "GetLatestVersionRequest":
        return GetLatestVersionRequest(d.get("table_name", ""))

    def to_json(self) -> dict:
        return {"table_name": self.table_name}


@dataclass
class GetLatestVersionResponse:
    version: int = 0
    error: str = ""

    def to_json(self) -> dict:
        return {"version": self.version, "error": self.error}

    @staticmethod
    def from_json(d: dict) -> "GetLatestVersionResponse":
        return GetLatestVersionResponse(int(d.get("version", 0)), d.get("error", ""))


@dataclass
class GetSnapshotRequest:
    table_name: str = ""
    version: int = 0  # proto3 zero value -> latest (reference: log.py:233)

    @staticmethod
    def from_json(d: dict) -> "GetSnapshotRequest":
        return GetSnapshotRequest(d.get("table_name", ""), int(d.get("version", 0)))

    def to_json(self) -> dict:
        return {"table_name": self.table_name, "version": self.version}


@dataclass
class GetSnapshotResponse:
    files: list[FileInfo] = dc_field(default_factory=list)
    schema: Schema = dc_field(default_factory=Schema)
    error: str = ""

    def to_json(self) -> dict:
        return {
            "files": [f.to_json() for f in self.files],
            "schema": self.schema.to_json(),
            "error": self.error,
        }

    @staticmethod
    def from_json(d: dict) -> "GetSnapshotResponse":
        return GetSnapshotResponse(
            [FileInfo.from_json(f) for f in d.get("files") or []],
            Schema.from_json(d.get("schema") or {}),
            d.get("error", ""),
        )


@dataclass
class CommitRequest:
    table_name: str = ""
    base_version: int = 0
    txn_id: str = ""
    adds: list[FileInfo] = dc_field(default_factory=list)
    removes: list[FileRemove] = dc_field(default_factory=list)

    @staticmethod
    def from_json(d: dict) -> "CommitRequest":
        return CommitRequest(
            table_name=d.get("table_name", ""),
            base_version=int(d.get("base_version", 0)),
            txn_id=d.get("txn_id", ""),
            adds=[FileInfo.from_json(a) for a in d.get("adds") or []],
            removes=[FileRemove.from_json(r) for r in d.get("removes") or []],
        )

    def to_json(self) -> dict:
        return {
            "table_name": self.table_name,
            "base_version": self.base_version,
            "txn_id": self.txn_id,
            "adds": [a.to_json() for a in self.adds],
            "removes": [r.to_json() for r in self.removes],
        }


@dataclass
class CommitResponse:
    new_version: int = 0
    error: str = ""

    def to_json(self) -> dict:
        return {"new_version": self.new_version, "error": self.error}

    @staticmethod
    def from_json(d: dict) -> "CommitResponse":
        return CommitResponse(int(d.get("new_version", 0)), d.get("error", ""))


@dataclass
class ListVersionsRequest:
    table_name: str = ""

    @staticmethod
    def from_json(d: dict) -> "ListVersionsRequest":
        return ListVersionsRequest(d.get("table_name", ""))

    def to_json(self) -> dict:
        return {"table_name": self.table_name}


@dataclass
class ListVersionsResponse:
    versions: list[int] = dc_field(default_factory=list)
    error: str = ""

    def to_json(self) -> dict:
        return {"versions": self.versions, "error": self.error}

    @staticmethod
    def from_json(d: dict) -> "ListVersionsResponse":
        return ListVersionsResponse(
            [int(v) for v in d.get("versions") or []], d.get("error", "")
        )


@dataclass
class LeaderRequest:
    @staticmethod
    def from_json(d: dict) -> "LeaderRequest":
        return LeaderRequest()

    def to_json(self) -> dict:
        return {}


@dataclass
class LeaderResponse:
    leader_id: str = ""
    leader_address: str = ""

    def to_json(self) -> dict:
        return {"leader_id": self.leader_id, "leader_address": self.leader_address}

    @staticmethod
    def from_json(d: dict) -> "LeaderResponse":
        return LeaderResponse(d.get("leader_id", ""), d.get("leader_address", ""))


@dataclass
class HealthRequest:
    @staticmethod
    def from_json(d: dict) -> "HealthRequest":
        return HealthRequest()

    def to_json(self) -> dict:
        return {}


@dataclass
class HealthResponse:
    healthy: bool = False
    status: str = ""

    def to_json(self) -> dict:
        return {"healthy": self.healthy, "status": self.status}

    @staticmethod
    def from_json(d: dict) -> "HealthResponse":
        return HealthResponse(bool(d.get("healthy", False)), d.get("status", ""))


# ---------------------------------------------------------------------------
# Servicer
# ---------------------------------------------------------------------------


class MetadataServicer:
    """The seven MetadataService RPCs over a LakehouseSession.

    Error contract is the reference's: RPCs return normally with the
    failure in the response's ``error`` field (proto3 empty-string
    default == success); the transport never carries an exception for
    domain errors — only for malformed payloads.
    """

    def __init__(self, lake: LakehouseSession):
        self.lake = lake

    def CreateTable(self, req: CreateTableRequest) -> CreateTableResponse:
        try:
            self.lake.create_table(
                req.table_name,
                [
                    SchemaField(f.name, f.type, f.nullable)
                    for f in req.schema.fields
                ],
            )
        except (SchemaError, ValueError) as exc:
            return CreateTableResponse(success=False, error=str(exc))
        return CreateTableResponse(success=True)

    def GetLatestVersion(self, req: GetLatestVersionRequest) -> GetLatestVersionResponse:
        try:
            t = self.lake.table(req.table_name)
        except KeyError as exc:
            return GetLatestVersionResponse(error=str(exc))
        return GetLatestVersionResponse(version=t.log.latest_version())

    def GetSnapshot(self, req: GetSnapshotRequest) -> GetSnapshotResponse:
        try:
            t = self.lake.table(req.table_name)
            snap = t.snapshot(req.version or None)
        except KeyError as exc:
            return GetSnapshotResponse(error=str(exc))
        except ValueError as exc:
            return GetSnapshotResponse(error=str(exc))
        return GetSnapshotResponse(
            files=[
                FileInfo(
                    path=f.path,
                    rows=f.rows,
                    size=f.size,
                    partition=dict(f.partition),
                    stats=FileStats(dict(f.min_values), dict(f.max_values)),
                )
                for f in snap.files
            ],
            schema=Schema(
                [Field(f.name, f.type, f.nullable) for f in snap.schema]
            ),
        )

    def Commit(self, req: CommitRequest) -> CommitResponse:
        """The raw OCC commit the reference coordinator issues after
        writing data files to storage (``pkg/metadata/state.go:198-243``
        validation; CAS + txn-id idempotency ``table/log.py:350``)."""
        try:
            t = self.lake.table(req.table_name)
        except KeyError as exc:
            return CommitResponse(error=str(exc))
        adds = [
            FileAdd(
                path=a.path,
                rows=a.rows,
                size=a.size,
                partition=dict(a.partition),
                min_values=dict(a.stats.min_values),
                max_values=dict(a.stats.max_values),
            )
            for a in req.adds
        ]
        try:
            version = t.log.commit(
                base_version=req.base_version,
                txn_id=req.txn_id,
                schema=t.fields,
                adds=adds,
                removes=[r.path for r in req.removes],
            )
        except (CommitConflictError, CommitValidationError) as exc:
            return CommitResponse(error=str(exc))
        return CommitResponse(new_version=version)

    def ListVersions(self, req: ListVersionsRequest) -> ListVersionsResponse:
        try:
            t = self.lake.table(req.table_name)
        except KeyError as exc:
            return ListVersionsResponse(error=str(exc))
        return ListVersionsResponse(versions=t.versions())

    def Leader(self, req: LeaderRequest) -> LeaderResponse:
        """Single-node by construction: the Spark driver IS the
        metadata authority (no Raft plane to elect across — SURVEY
        §4.3), so Leader always answers itself, the degenerate case the
        reference reaches only after winning an election."""
        sc = self.lake.spark.sparkContext
        return LeaderResponse(
            leader_id=sc.applicationId or "spark-driver",
            leader_address=sc.master or "local",
        )

    def Health(self, req: HealthRequest) -> HealthResponse:
        return HealthResponse(healthy=True, status="healthy")


# RPC name -> (request parser, response type); drives both the generic
# gRPC wiring and the tests' exhaustive service-surface check.
RPCS: dict[str, tuple] = {
    "CreateTable": (CreateTableRequest, CreateTableResponse),
    "GetLatestVersion": (GetLatestVersionRequest, GetLatestVersionResponse),
    "GetSnapshot": (GetSnapshotRequest, GetSnapshotResponse),
    "Commit": (CommitRequest, CommitResponse),
    "ListVersions": (ListVersionsRequest, ListVersionsResponse),
    "Leader": (LeaderRequest, LeaderResponse),
    "Health": (HealthRequest, HealthResponse),
}


def serve(lake: LakehouseSession, host: str = "127.0.0.1", port: int = 0):
    """Bind MetadataServicer to a real grpc.Server (JSON codec over
    generic method handlers — see module docstring). Returns
    ``(server, bound_port)``; call ``server.stop(grace)`` to shut down.
    Raises ImportError when grpcio is not installed."""
    try:
        import grpc
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImportError(
            "grpcio is required for the gRPC transport; the MetadataServicer "
            "API is available without it"
        ) from exc
    from concurrent.futures import ThreadPoolExecutor

    servicer = MetadataServicer(lake)

    def _handler(method: str, req_cls):
        def unary(request, _context):
            return getattr(servicer, method)(request)

        return grpc.unary_unary_rpc_method_handler(
            unary,
            request_deserializer=lambda b: req_cls.from_json(json.loads(b.decode())),
            response_serializer=lambda resp: json.dumps(resp.to_json()).encode(),
        )

    handlers = {name: _handler(name, req_cls) for name, (req_cls, _) in RPCS.items()}
    server = grpc.server(ThreadPoolExecutor(max_workers=8))
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(SERVICE_NAME, handlers),)
    )
    bound = server.add_insecure_port(f"{host}:{port}")
    server.start()
    return server, bound
