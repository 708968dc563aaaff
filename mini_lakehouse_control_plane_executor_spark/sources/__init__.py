from mini_lakehouse_control_plane_executor_spark.sources.pydatasource import (
    MinilakeDataSource,
    MinilakeStreamDataSource,
    register,
)

__all__ = ["MinilakeDataSource", "MinilakeStreamDataSource", "register"]
