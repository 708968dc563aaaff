#!/usr/bin/env python
"""Isolated per-query timer for optimization A/B runs: warmup pass then
min-of-N noop-sink timings (the bench.py protocol, restricted to the
named queries so an experiment iterates in seconds, not a full bench).

Usage: python time_query.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_TIMER_PASSES (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

from mini_lakehouse_control_plane_executor_spark import queries as qlib
from mini_lakehouse_control_plane_executor_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("SPARK_GRAFT_TIMER_PASSES", "3"))
    spark = get_spark("time_query")
    registry = qlib.all_queries()
    for name in names:
        registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    times: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"time_query:{name}")
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, elapsed), elapsed)
            spark.catalog.clearCache()
    print(json.dumps(times))


if __name__ == "__main__":
    main()
