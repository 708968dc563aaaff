"""Long-running service entrypoint: ``python -m
mini_lakehouse_control_plane_executor_spark.server`` starts one Spark
driver hosting the full control-plane surface — the REST API
(``api/rest.py``) on ``$LAKEHOUSE_PORT`` (default 8080, the address
``monitoring/prometheus.yml`` scrapes for ``/metrics``) and, when
grpcio is installed, the gRPC MetadataService on ``$LAKEHOUSE_GRPC_PORT``
(default 50051).

This is the deploy shape of the reference's coordinator container
(``docker/Dockerfile.coordinator`` runs ``bin/coordinator`` serving
REST :8080 + gRPC :50051 against object storage): on Spark the
coordinator/metad/worker split collapses into the one driver process
(SURVEY §4.3) and the warehouse lives on ``$LAKEHOUSE_ROOT`` (a volume
in docker-compose; any shared filesystem in production).
"""

from __future__ import annotations

import os
import signal
import threading


def main() -> int:
    from mini_lakehouse_control_plane_executor_spark.api.rest import LakehouseRestServer
    from mini_lakehouse_control_plane_executor_spark.session import get_spark
    from mini_lakehouse_control_plane_executor_spark.table.catalog import (
        LakehouseSession,
    )

    root = os.environ.get("LAKEHOUSE_ROOT", "/warehouse")
    host = os.environ.get("LAKEHOUSE_HOST", "0.0.0.0")
    port = int(os.environ.get("LAKEHOUSE_PORT", "8080"))
    os.makedirs(root, exist_ok=True)

    spark = get_spark("lakehouse-server")
    lake = LakehouseSession(spark, root)
    rest = LakehouseRestServer(lake, host=host, port=port).start()
    print(f"lakehouse REST serving on {host}:{rest.port} (root={root})", flush=True)

    grpc_server = None
    try:
        import grpc  # noqa: F401

        from mini_lakehouse_control_plane_executor_spark.api import grpc_api as g

        grpc_port = int(os.environ.get("LAKEHOUSE_GRPC_PORT", "50051"))
        grpc_server, bound = g.serve(lake, host=host, port=grpc_port)
        print(f"lakehouse gRPC serving on :{bound}", flush=True)
    except ImportError:
        print("grpcio not installed - gRPC surface disabled (REST only)", flush=True)

    stop = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: stop.set())
    stop.wait()
    print("shutting down", flush=True)
    if grpc_server is not None:
        grpc_server.stop(2)
    rest.stop()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
