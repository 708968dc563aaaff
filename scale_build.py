#!/usr/bin/env python
"""Build a deterministic local sf1 (~10x sf0.1) for the scale-ladder
self-bench (SCALE.md): union 10 key-shifted copies of each sf0.1 table
into $SPARK_GRAFT_SCALE_OUT (default /root/repo/.scale/sf1).

Design choices, so the ladder measures the ENGINE's scaling and not a
data artifact:

- Fact/entity keys are shifted by copy*10^9 so the 10 copies are
  disjoint row sets and join fan-outs scale the way real 10x data
  would (10x orders per 10x customers, not 100x collisions).
- region/nation are BOUNDED dimensions (5/25 rows by spec) and are not
  replicated — real 10x data has the same nation list.
- documents.text gets a per-copy token suffix (every word w -> w<i>,
  copy 0 unchanged): near-duplicate CLUSTER SIZES stay what sf0.1
  planted instead of every doc gaining 9 cross-copy twins — 10x data
  should mean 10x clusters, not 10x-bigger clusters (which would make
  every pairwise-verify stage quadratically heavier as a pure data
  artifact). Vocabulary grows with scale, which is also how real
  corpora behave (Heaps' law).
- embeddings keep their vectors; only vec_id shifts. ANN query sets
  are pinned to vec_id < 10, so the probe count stays fixed while the
  corpus grows 10x — the production shape of a scale-up.
- events keep their timestamps: 10x events over the same wall-clock
  range is a rate increase, which is what a bigger deployment sees.

Each table is written with input-split parallelism in mind (32 files
for the big facts) so sf1 reads spread across local[32] the way a real
multi-file lake table would.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALE_OUT", "/root/repo/.scale/sf1")
OUT_DUP = os.environ.get("SPARK_GRAFT_SCALE_OUT_DUP", "/root/repo/.scale/sf1dup")
OUT_DUP100 = os.environ.get(
    "SPARK_GRAFT_SCALE_OUT_DUP100", "/root/repo/.scale/sf1dup100"
)
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
COPIES_D100 = 100
# First-10% slices for the d=100 twin (sf0.1 has 5000 docs / 2000 vecs;
# if SPARK_GRAFT_SCALE_SRC points elsewhere, override these too).
DOC_SLICE = int(os.environ.get("SPARK_GRAFT_SCALE_DOC_SLICE", "500"))
EMB_SLICE = int(os.environ.get("SPARK_GRAFT_SCALE_EMB_SLICE", "200"))
SHIFT = 10**9

# table -> (key columns to shift, output file count)
SHIFT_COLS: dict[str, tuple[list[str], int]] = {
    "customer": (["c_custkey"], 8),
    "supplier": (["s_suppkey"], 4),
    "part": (["p_partkey"], 8),
    "orders": (["o_orderkey", "o_custkey"], 16),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 32),
    "events": (["event_id", "user_id"], 16),
    "documents": (["doc_id"], 16),
    "embeddings": (["vec_id"], 8),
}
BOUNDED_DIMS = ["region", "nation"]


def main() -> None:
    spark = get_spark("scale-build")
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(OUT_DUP, exist_ok=True)
    t_start = time.time()
    for t in BOUNDED_DIMS:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        print(f"{t}: copied (bounded dim)", flush=True)
    for t, (keys, n_files) in SHIFT_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * SHIFT)).cast("long"))
            if t == "documents" and i > 0:
                # suffix every token with the copy index: in-copy
                # duplicate structure is preserved exactly, cross-copy
                # shingle overlap drops to ~0
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\w+)", rf"$1{i}")
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{OUT}/{t}.parquet"
        )
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows in {n_files} files", flush=True)
    # Duplicate-heavy twin corpus: VERBATIM document copies (id shift
    # only, no token suffixing) — the adversarial input for the
    # duplicate-skew guards in the text near-dup pipelines (minhash,
    # simhash, containment). Embeddings need no twin: the main sf1
    # build already keeps vectors verbatim, so .scale/sf1 IS the
    # duplicate-heavy corpus for the embedding-side guards.
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    dups = [
        base.withColumn("doc_id", (F.col("doc_id") + F.lit(i * SHIFT)).cast("long"))
        for i in range(COPIES)
    ]
    out = dups[0]
    for c in dups[1:]:
        out = out.unionAll(c)
    out.repartition(16).write.mode("overwrite").parquet(
        f"{OUT_DUP}/documents.parquet"
    )
    n = spark.read.parquet(f"{OUT_DUP}/documents.parquet").count()
    print(f"documents (verbatim dup twin): {n} rows -> {OUT_DUP}", flush=True)
    # d=100 twin: 100 VERBATIM copies of the FIRST-10% slice, so total
    # rows stay at 10x sf0.1 (same as sf1dup) while duplicate-group
    # multiplicity rises 10 -> 100. The guards' claim is d² -> linear;
    # d=100 is where an unguarded plan pays 100x the guarded one. The
    # first-10% slice (ids < N/10) keeps the pinned ANN probe ids
    # (vec_id < 10) alive. Both documents AND embeddings live here so
    # SCALE_SET=dup100 routes every guard query at one dir.
    os.makedirs(OUT_DUP100, exist_ok=True)
    for t, key, cut, n_files in (
        ("documents", "doc_id", DOC_SLICE, 16),
        ("embeddings", "vec_id", EMB_SLICE, 8),
    ):
        sl = spark.read.parquet(f"{SRC}/{t}.parquet").filter(F.col(key) < cut)
        copies100 = [
            sl.withColumn(key, (F.col(key) + F.lit(i * SHIFT)).cast("long"))
            for i in range(COPIES_D100)
        ]
        out = copies100[0]
        for c in copies100[1:]:
            out = out.unionAll(c)
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{OUT_DUP100}/{t}.parquet"
        )
        n = spark.read.parquet(f"{OUT_DUP100}/{t}.parquet").count()
        print(f"{t} (d=100 dup twin): {n} rows -> {OUT_DUP100}", flush=True)
    print(f"done in {time.time() - t_start:.0f}s -> {OUT}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
