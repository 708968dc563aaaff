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
from pyspark.storagelevel import StorageLevel

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


HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
_HLL_MAXRHO = 61 - HLL_P  # 60-bit md5 hash, p bits spent on the bucket


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """HyperLogLog register table over ``df[key_col]``: (group...,
    bucket, mj) where mj = max leading-zero rank of the md5-derived
    60-bit hash within the bucket. Deterministic (no RNG) and computable
    identically in a DuckDB oracle.

    Works on a batch OR streaming DataFrame: on a stream it is an
    unwindowed stateful MAX whose state is exactly |groups| * m
    registers — bounded by construction, the cms_cells discipline
    applied to cardinality."""
    group_cols = group_cols or []
    hv = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w_col = F.expr(f"_hll_hv div {HLL_M}")
    rho = (
        F.when(w_col > 0, _HLL_MAXRHO - F.length(F.bin(w_col)))
        .otherwise(_HLL_MAXRHO)
    )
    return (
        df.select(*group_cols, hv.alias("_hll_hv"))
        .select(
            *group_cols,
            (F.col("_hll_hv") % HLL_M).alias("bucket"),
            rho.alias("r"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r").alias("mj"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Finish a register table into (group..., hll) cardinality
    estimates: alpha_64 harmonic mean with the standard linear-counting
    small-range correction. Z accumulates as exact BIGINT 2^(maxrho-mj)
    terms, so the estimate is summation-order independent."""
    group_cols = group_cols or []
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_MAXRHO} - mj)")).alias(
            "z_num_present"
        ),
    )
    two_mr = 1 << _HLL_MAXRHO
    e_raw = (
        0.709
        * HLL_M
        * HLL_M
        * two_mr
        / (
            F.col("z_num_present") + (HLL_M - F.col("n_regs")) * F.lit(two_mr)
        ).cast("double")
    )
    est = agg.select(
        *group_cols,
        (HLL_M - F.col("n_regs")).alias("v_zero"),
        e_raw.alias("e_raw"),
    )
    hll = F.when(
        (F.col("v_zero") > 0) & (F.col("e_raw") <= 2.5 * HLL_M),
        float(HLL_M) * F.log(float(HLL_M) / F.col("v_zero")),
    ).otherwise(F.col("e_raw"))
    return est.select(*group_cols, hll.alias("hll"))


# ---------------------------------------------------------------------------
# Fixed-width histogram quantile sketch
# ---------------------------------------------------------------------------

QH_NB = 1024  # buckets per group
QH_W = 1.0  # bucket width (value units)


def quantile_hist_cells(
    df: DataFrame,
    group_cols: str | list[str],
    value_col: str,
    nb: int = QH_NB,
    width: float = QH_W,
) -> DataFrame:
    """(group..., bucket) -> count fixed-width histogram — the QUANTILE
    member of the mergeable-sketch family (CMS for heavy hitters, HLL
    for cardinality, Bloom for membership, this for percentiles; the
    HDR-histogram shape used by every latency pipeline). Works
    identically on a batch or streaming DataFrame: on a stream it is an
    unwindowed stateful aggregation whose state is at most
    |groups| * nb cells — bounded by construction however long the
    stream, no watermark needed. Merging two sketches is adding cell
    counts, which is exactly what Spark's partial aggregation does, so
    the sketch is map-side combinable for free (and what makes it
    rollup-able — see quantile rollup in queries.py). Values are
    clamped into [0, nb*width); the last bucket absorbs the overflow
    tail (estimates there degrade to the clamp edge — size nb to the
    domain). A single string ``group_cols`` keeps the legacy
    single-group shape with the column aliased to ``g``."""
    if isinstance(group_cols, str):
        sel: list = [F.col(group_cols).alias("g")]
        grp = ["g"]
    else:
        sel = list(group_cols)
        grp = list(group_cols)
    b = (
        F.least(
            F.greatest(F.floor(F.col(value_col) / width), F.lit(0)),
            F.lit(nb - 1),
        )
    ).cast("long")
    return (
        df.select(*sel, b.alias("bucket"))
        .groupBy(*grp, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def quantiles_from_cells(
    cells: DataFrame,
    q_pcts: list[int],
    width: float = QH_W,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Estimated quantiles from the cell table: for each q (integer
    percent — integer arithmetic keeps bucket selection engine-exact),
    the LOWER EDGE of the first bucket whose cumulative count reaches
    q% of n (cum*100 >= q*n). Error is bounded by one bucket width.
    Everything here runs on the |groups|*nb cell table — the raw data
    is never touched again. ``group_cols`` defaults to the legacy
    single ``g`` column."""
    from pyspark.sql import Window

    grp = group_cols if group_cols is not None else ["g"]
    wc = (
        Window.partitionBy(*grp)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*grp)
    cum = cells.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(wt)
    )
    return cum.groupBy(*grp).agg(
        F.max("n").alias("n"),
        *[
            F.round(
                F.min(
                    F.when(
                        F.col("cum") * 100 >= F.lit(q) * F.col("n"), F.col("bucket")
                    )
                )
                * width,
                6,
            ).alias(f"est_p{q}")
            for q in q_pcts
        ],
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch
# ---------------------------------------------------------------------------

KMV_K = 32


def kmv_bottom_k(
    df: DataFrame,
    group_col: str,
    hash_col: str,
    k: int = KMV_K,
    distinct: bool = True,
) -> DataFrame:
    """(g, sk) — the k smallest hash values per group, sorted ascending:
    the KMV distinct sketch (Bar-Yossef et al. 2002 / the theta-sketch
    ancestor). Distinct estimate = (k-1)/u_k on the normalized k-th
    minimum; sketches MERGE by keeping the k smallest of the union,
    which also yields union (from the merged sketch) and intersection
    (c/k over the merged k-window) estimates — the set-operation
    capability HLL registers don't have.

    100 TB shape: state is k values per group however large the input;
    bottom-k per low-cardinality group runs the salted two-phase window
    (a per-(g, salt) prune to k survivors parallelizes the stratum,
    then the exact window ranks only 32·k survivors) — never a
    per-group corpus sort on one task. Pass ``distinct=False`` when the
    input is already (group, hash)-distinct to skip the dedup shuffle.

    The streaming twin is ``streaming/stateful.py::kmv_sketch_stream``
    (bounded O(k) state per group; bottom-k is exactly mergeable:
    bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ B))."""
    from pyspark.sql import Window

    base = df.select(F.col(group_col).alias("g"), F.col(hash_col).alias("h"))
    if distinct:
        base = base.distinct()
    ws = Window.partitionBy("g", "salt").orderBy("h")
    w = Window.partitionBy("g").orderBy("h")
    pruned = (
        base.withColumn("salt", F.pmod(F.col("h"), F.lit(32)))
        .withColumn("prn", F.row_number().over(ws))
        .filter(F.col("prn") <= k)
    )
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("g")
        .agg(F.array_sort(F.collect_list("h")).alias("sk"))
    )


MG_K = 16  # counters kept per summary (per node and after the merge)
MG_P = 32  # summary sites ("nodes") — at production scale, #partitions


def mg_node_hash(col: Column, p: int = MG_P) -> Column:
    """Deterministic node assignment for an input row — the stand-in
    for "which partition saw this row" that both engines can compute
    (same md5 idiom as the CMS bucket hash). Rows of the SAME key
    scatter across nodes, which is what makes the merge step real."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("n:"), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % p
    )


def mg_node_counts(df: DataFrame, key_col: str, node_col: Column) -> DataFrame:
    """Per-(node, key) exact counts — the MERGEABLE state under the
    deterministic Misra-Gries formulation below (plain integer cells,
    map-side combinable; on a stream this is an unwindowed stateful
    aggregation like the CMS/HLL cell twins, state bounded by
    |nodes| x |active keys|). Production deployments with an unbounded
    key universe apply ``mg_prune`` per trigger instead, trading the
    bit-exact stream==batch guarantee for O(nodes*k) state."""
    return (
        df.select(node_col.alias("node"), F.col(key_col).alias("key"))
        .groupBy("node", "key")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def mg_prune(nc: DataFrame, k: int = MG_K) -> DataFrame:
    """The Misra-Gries / mergeable-summaries prune (Agarwal et al.,
    PODS 2012) applied deterministically to exact per-node counts:
    subtract the (k+1)-th largest count from every counter and keep the
    at-most-k positive survivors. Each prune removes >= (k+1)*lambda of
    total weight, removals are disjoint, so the summed lambdas over ALL
    prunes (every node + the merge) are <= n/(k+1) — the deterministic
    undercount guarantee (est <= exact always; exact - est <= n/(k+1)).

    100 TB shape: the rank window partitions by node (per-node frames
    are |keys present on that node|); lambda — the (k+1)-th largest
    count — comes from a SECOND window over the SAME node partitioning
    (max over the full frame of the rn==k+1 row's count), so both ride
    one node-keyed Exchange and the input is scanned ONCE. The r14
    profile caught the former shape (a separate broadcast-lambda join)
    re-scanning the node-count table twice per prune — and the query
    layer recomputed the prune per consumer, 8 vocab-sized window
    passes for one answer. Output is <= |nodes|*k rows regardless of
    input."""
    from pyspark.sql import Window

    wn = Window.partitionBy("node").orderBy(F.desc("c"), "key")
    wp = Window.partitionBy("node")
    lam = F.coalesce(
        F.max(F.when(F.col("rn") == k + 1, F.col("c"))).over(wp), F.lit(0)
    )
    return (
        nc.withColumn("rn", F.row_number().over(wn))
        .withColumn("s", F.col("c") - lam)
        .filter((F.col("rn") <= k) & (F.col("s") > 0))
        .select("node", "key", "s")
    )


def mg_merge_ranked(summ: DataFrame, k: int = MG_K) -> DataFrame:
    """Merge per-node MG summaries (sum counters per key) and rank the
    merged counters. The merged relation is <= |nodes|*k rows BY
    CONSTRUCTION (contract-bounded, input-size independent), so the
    global rank runs as a broadcast triangular self-join — never an
    Exchange SinglePartition window over data. Returns
    (key, s, rn); the caller applies the final prune with the
    rn == k+1 counter as lambda.

    ``merged`` is persisted here (contract-bounded <= |nodes|*k rows,
    the shingle_arrays internal-persist precedent): it feeds BOTH sides
    of the triangular join, and without the cache each side re-ran the
    whole summary lineage — including the upstream rank window over the
    node-count table — once per side (the r14 profile finding). Like
    shingle_arrays, the cache is NOT unpersisted here (the operator
    cannot know when the caller's last action ran); batch callers rely
    on session teardown / ``clearCache`` between pipelines (bench.py's
    protocol), and a long-lived per-trigger caller (the streaming-style
    use mg_node_counts' docstring anticipates) must
    ``spark.catalog.clearCache()`` or track-and-unpersist per trigger,
    or it accumulates one <= |nodes|*k-row cache entry per call."""
    merged = (
        summ.groupBy("key")
        .agg(F.sum("s").cast("long").alias("s"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = merged.select(F.col("key").alias("k1"), F.col("s").alias("s1"))
    b = merged.select(F.col("key").alias("k2"), F.col("s").alias("s2"))
    before = (F.col("s2") > F.col("s1")) | (
        (F.col("s2") == F.col("s1")) & (F.col("k2") < F.col("k1"))
    )
    return (
        a.join(F.broadcast(b), before, "left")
        .groupBy("k1", "s1")
        .agg((F.count("k2") + 1).cast("int").alias("rn"))
        .select(F.col("k1").alias("key"), F.col("s1").alias("s"), "rn")
    )
