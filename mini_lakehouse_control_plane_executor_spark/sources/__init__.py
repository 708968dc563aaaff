from mini_lakehouse_control_plane_executor_spark.sources.pydatasource import (
    MinilakeDataSource,
    register,
)

__all__ = ["MinilakeDataSource", "register"]
