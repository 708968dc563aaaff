#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries to
plans/<tag>/<query>_<suffix>.txt (optimization-round evidence files).

Usage: python capture_plans.py <tag> <suffix> [query ...]
       (no query args = the bench HEADLINE set)

Planning only — nothing is executed, so this is safe to run on a
loaded box without skewing bench numbers.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

from mini_lakehouse_control_plane_executor_spark import queries as qlib
from mini_lakehouse_control_plane_executor_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    registry = qlib.all_queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
