from mini_lakehouse_control_plane_executor_spark.table.log import (
    CommitConflictError,
    FileAdd,
    LogEntry,
    TransactionLog,
)
from mini_lakehouse_control_plane_executor_spark.table.table import LakehouseTable
from mini_lakehouse_control_plane_executor_spark.table.catalog import LakehouseSession

__all__ = [
    "CommitConflictError",
    "FileAdd",
    "LogEntry",
    "TransactionLog",
    "LakehouseTable",
    "LakehouseSession",
]
