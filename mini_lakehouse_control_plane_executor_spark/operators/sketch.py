"""Probabilistic sketch primitives shared by batch queries and streaming.

Count-min sketch (Cormode & Muthukrishnan 2005): d independent hash rows
of w buckets; increment d cells per item, estimate = min over rows.
Overestimates only — never undercounts — with error <= eN at probability
1 - delta for w = ceil(e/eps), d = ceil(ln 1/delta).

The hash family is md5-derived with a per-row salt so the SAME cell
layout is computable in Spark (``conv(substr(md5(...),1,8),16,10)``) and
in the DuckDB oracle (``('0x' || substr(md5(...),1,8))::BIGINT``) —
the determinism discipline every oracle-paired query uses.

Why a sketch at 100 TB: the cell table is d*w rows TOTAL regardless of
input size, the aggregation is map-side combinable, and the streaming
version's state is the same fixed d*w cells — an unwindowed streaming
aggregate whose state CANNOT grow with the stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 256


def cms_bucket_array(key_col: Column, d: int = CMS_D, w: int = CMS_W) -> Column:
    """Array of the d bucket indexes for one key — posexplode to get
    (row, bucket) pairs. Salt ``s<row>:`` prefixes keep the rows
    independent."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"s{i}:"), key_col.cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % w
            )
            for i in range(d)
        ]
    )


def cms_cells(df: DataFrame, key_col: str, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """The sketch itself: (d, bucket) -> count over ``df[key_col]``.
    Works identically on a batch OR streaming DataFrame — on a stream it
    is an unwindowed stateful aggregation whose state is exactly the
    d*w cells (bounded by construction, no watermark needed), emitted
    in update/complete mode as micro-batches revise it."""
    return (
        df.select(F.posexplode(cms_bucket_array(F.col(key_col), d, w)).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
