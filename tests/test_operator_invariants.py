"""Algebraic invariants of the round-6 operators — properties the
oracle comparison cannot express (they hold at EVERY scale, not just on
one fixture): PageRank mass conservation, HLL register mergeability,
A-ES per-stratum exactness, BM25 rank well-formedness."""

import os

from pyspark.sql import functions as F

from mini_lakehouse_control_plane_executor_spark import queries as qlib
from mini_lakehouse_control_plane_executor_spark.operators import graph as G
from mini_lakehouse_control_plane_executor_spark.operators import sketch as SK

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def test_pagerank_conserves_mass(spark):
    """Total rank stays within integer-truncation leakage of SCALE:
    each iteration loses < 1 unit per edge (contrib div) plus < 100
    per node (the div-100 damping pair) — far under 1% here. A broken
    propagation (dropped nodes, double-counted edges) blows this bound
    immediately."""
    li = qlib._load(spark, SF_DIR, "lineitem")
    items = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    s_node = F.concat(F.lit("s"), F.col("s").cast("string"))
    p_node = F.concat(F.lit("p"), F.col("p").cast("string"))
    edges = items.select(s_node.alias("src"), p_node.alias("dst")).unionAll(
        items.select(p_node.alias("src"), s_node.alias("dst"))
    )
    ranks = G.pagerank(edges, iterations=3)
    total = ranks.agg(F.sum("r")).first()[0]
    assert 0.99 * G.PAGERANK_SCALE <= total <= G.PAGERANK_SCALE
    # every node kept a strictly positive rank (teleport floor)
    assert ranks.filter(F.col("r") <= 0).count() == 0


def test_hll_registers_merge_associatively(spark):
    """HLL's operational superpower: per-partition register tables
    max-merge to EXACTLY the global register table (max is associative),
    so shards/streams/days can be sketched independently and unioned.
    Computed per-source then merged == computed globally."""
    d = qlib._load(spark, SF_DIR, "documents")
    global_regs = {
        (r.bucket, r.mj)
        for r in SK.hll_registers(d, "doc_id").collect()
    }
    per_source = SK.hll_registers(d, "doc_id", group_cols=["source"])
    merged = {
        (r.bucket, r.mj)
        for r in per_source.groupBy("bucket")
        .agg(F.max("mj").alias("mj"))
        .collect()
    }
    assert merged == global_regs and len(global_regs) > 0


def test_weighted_sample_exact_k_per_stratum(spark):
    """A-ES emits exactly min(k, |stratum|) rows per source with dense
    ranks 1..k and positive weights — the contract a mixture builder
    depends on."""
    out = qlib.all_queries()["weighted_sample_aes"](spark, SF_DIR)
    rows = out.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    d = qlib._load(spark, SF_DIR, "documents")
    sizes = {r.source: r.n for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, grp in per_src.items():
        assert len(grp) == min(5, sizes[src])
        assert sorted(r.rnk for r in grp) == list(range(1, len(grp) + 1))
        assert all(r.weight > 0 for r in grp)
    assert set(per_src) == set(sizes)  # every stratum represented


def test_bm25_ranks_well_formed(spark):
    """Per query: dense ranks 1..10, scores non-increasing with rank,
    and every returned doc actually contains >=1 query term (BM25 of a
    term-free doc is 0 and never enters the top-k)."""
    out = qlib.all_queries()["bm25_topk"](spark, SF_DIR).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, grp in by_q.items():
        grp = sorted(grp, key=lambda r: r.rnk)
        assert [r.rnk for r in grp] == list(range(1, len(grp) + 1))
        scores = [r.bm25 for r in grp]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        assert all(s > 0 for s in scores)
