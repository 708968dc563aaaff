from mini_lakehouse_control_plane_executor_spark.functions.filters import (
    FilterParseError,
    parse_filter,
    prune_files,
)

__all__ = ["FilterParseError", "parse_filter", "prune_files"]
