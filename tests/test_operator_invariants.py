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


def test_pagerank_rejects_dangling_nodes(spark):
    """A dst that never appears as a src silently absorbs rank mass the
    node-set inner join then drops; the default-on guard turns that
    wrong-ranks-no-error case into a ValueError naming offenders."""
    import pytest

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "sink")], ["src", "dst"]
    )  # "sink" has no out-edge
    with pytest.raises(ValueError, match="dangling"):
        G.pagerank(edges, iterations=1)
    # symmetric closure of the same edges passes the guard
    sym = edges.unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    assert G.pagerank(sym, iterations=1).count() == 3


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


def test_dedup_aware_split_has_zero_leakage(spark):
    """The split policy's DEFINING property: no near-duplicate pair may
    straddle a split boundary. Recompute the same MinHash pairs and
    cluster roots the query uses, assign each member its root's split,
    and assert every cluster is wholly inside ONE split — the guarantee
    that makes the policy dedup-AWARE rather than a plain id hash."""
    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D
    from mini_lakehouse_control_plane_executor_spark.queries import _split_col

    d = qlib._load(spark, SF_DIR, "documents")
    pairs = D.minhash_dedup_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    comp = D.connected_components(pairs)
    n_multi_split_clusters = (
        comp.select("root", _split_col(F.col("root")).alias("split"))
        .groupBy("root")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_multi_split_clusters == 0
    # census covers the whole corpus exactly once
    out = qlib.all_queries()["dedup_aware_split"](spark, SF_DIR)
    assert out.agg(F.sum("n_docs")).first()[0] == d.count()


def test_ccnet_buckets_partition_each_lang(spark):
    """Per language: bucket doc-counts sum to the language's doc count,
    terciles differ by at most ~one value-group from n/3 each, and the
    head cut <= middle cut <= tail cut (monotone surprisal bands)."""
    d = qlib._load(spark, SF_DIR, "documents")
    per_lang = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = qlib.all_queries()["ccnet_perplexity_buckets"](spark, SF_DIR).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        assert sum(b.n_docs for b in buckets.values()) == per_lang[lang]
        cuts = [buckets[b].cut_surprisal for b in ("head", "middle", "tail") if b in buckets]
        assert cuts == sorted(cuts)


def test_dsir_target_source_scores_highest(spark):
    """The importance weight is ln(p_target/p_raw) averaged over a
    document's features — so the target source itself must have the
    HIGHEST average weight (its features are by construction the
    target distribution), and weights must be finite everywhere."""
    rows = qlib.all_queries()["dsir_importance_weights"](spark, SF_DIR).collect()
    best = max(rows, key=lambda r: r.avg_logweight)
    assert best.source == "src0"
    import math

    assert all(math.isfinite(r.avg_logweight) for r in rows)


def test_embedding_outliers_are_per_label_minima(spark):
    """The returned rank-1 outlier per label really is that label's
    global cosine minimum: recompute every cosine-to-centroid and
    compare. Guards the salted two-phase window against a pruning bug
    that drops the true minimum."""
    out = qlib.all_queries()["embedding_outlier_centroid"](spark, SF_DIR).collect()
    rank1 = {r.label: r.cos_to_centroid for r in out if r.outlier_rank == 1}
    per_label = {}
    for r in out:
        per_label.setdefault(r.label, []).append(r)
    for label, grp in per_label.items():
        grp = sorted(grp, key=lambda r: r.outlier_rank)
        assert [r.outlier_rank for r in grp] == list(range(1, len(grp) + 1))
        cs = [r.cos_to_centroid for r in grp]
        assert cs == sorted(cs)  # ascending cosine = worst first
    # brute-force check of the rank-1 minimum via the exact same centroid math
    from mini_lakehouse_control_plane_executor_spark.operators import similarity as S

    e = qlib._load(spark, SF_DIR, "embeddings")
    dim = e.select(F.size("embedding")).first()[0]
    base = e.select(
        "vec_id", "label", S._as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", S.norm(F.col("v")))
    cent = (
        base.groupBy("label")
        .agg(*[F.round(F.avg(F.col("v")[i]), 6).alias(f"m{i}") for i in range(dim)])
        .select("label", F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("cv"))
        .withColumn("cnrm", S.norm(F.col("cv")))
    )
    cos = F.round(
        S.dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 6
    )
    mins = {
        r.label: r.mn
        for r in base.join(F.broadcast(cent), "label")
        .select("label", cos.alias("c"))
        .groupBy("label")
        .agg(F.min("c").alias("mn"))
        .collect()
    }
    for label, got in rank1.items():
        assert abs(got - mins[label]) < 1e-9, (label, got, mins[label])


def test_jsd_matrix_is_complete_and_bounded(spark):
    """C(n_sources, 2) rows, every JSD within [0, ln 2] (the JSD bound
    for two distributions), and self-similarity excluded by the a<b
    pairing. A sign error or un-normalized distribution breaks the
    bound immediately."""
    import math

    d = qlib._load(spark, SF_DIR, "documents")
    n_src = d.select("source").distinct().count()
    out = qlib.all_queries()["source_similarity_jsd"](spark, SF_DIR).collect()
    assert len(out) == n_src * (n_src - 1) // 2
    for r in out:
        assert 0.0 <= r.jsd <= math.log(2) + 1e-9, (r.source_a, r.source_b, r.jsd)
        assert r.source_a < r.source_b


def test_triangle_stats_match_bruteforce(spark):
    """The degree-ordered wedge enumeration must count EXACTLY the
    triangles of an arbitrary graph — orientation is a traversal
    optimization, never an approximation. Checked against an
    itertools brute force on a seeded random graph (a shape with hubs,
    leaves, and ties the TPC-H fixture doesn't exercise)."""
    import itertools
    import random

    rnd = random.Random(7)
    nodes = list(range(30))
    edges = sorted({tuple(sorted(rnd.sample(nodes, 2))) for _ in range(120)})
    adj = set(edges)
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    row = G.triangle_stats(spark.createDataFrame(edges, ["p1", "p2"])).first()
    assert row.n_triangles == tri
    assert row.n_wedges == wedges
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(deg)


def test_triangle_stats_zero_wedge_graph_defined(spark):
    """ADVICE regression: a graph whose components are all single edges
    has n_wedges = 0 — global_clustering must be a DEFINED 0.0 (the
    F.when zero guard), never a NULL division row."""
    row = G.triangle_stats(
        spark.createDataFrame([(1, 2), (3, 4), (5, 6)], ["p1", "p2"])
    ).first()
    assert row.n_wedges == 0 and row.n_triangles == 0
    assert row.global_clustering == 0.0
    assert row.n_nodes == 6 and row.n_edges == 3


def test_kmv_sketches_merge_exactly(spark):
    """KMV's operational superpower (like HLL's register max-merge):
    bottom-k of the UNION of per-source sketches equals the bottom-k
    of all values — shards/streams/days can be sketched independently
    and merged with zero error in the merge step."""
    d = qlib._load(spark, SF_DIR, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
    )
    base = d.select("source", h.alias("h"))
    per_source = SK.kmv_bottom_k(base, "source", "h")
    merged_in = per_source.select(
        F.lit("all").alias("g"), F.explode("sk").alias("h")
    )
    merged = SK.kmv_bottom_k(merged_in, "g", "h").first()
    glob = SK.kmv_bottom_k(
        d.select(F.lit("all").alias("g"), h.alias("h")), "g", "h"
    ).first()
    assert list(merged.sk) == list(glob.sk) and len(glob.sk) > 0


def test_trimmed_stats_equal_rowlevel_trimming(spark):
    """The histogram-with-partial-boundary-inclusion formulation must
    be BIT-IDENTICAL to sorting every row and dropping each 5% tail —
    the claim that lets the operator skip per-group corpus sorts.
    Row-level twin computed independently in DuckDB."""
    import duckdb

    got = {
        r.event_type: r
        for r in qlib.all_queries()["robust_trimmed_stats"](spark, SF_DIR).collect()
    }
    ev = qlib._load(spark, SF_DIR, "events").select("event_type", "value").toPandas()
    con = duckdb.connect()
    con.register("ev", ev)
    want = con.execute(
        """
        WITH v AS (
          SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v_u FROM ev
        ),
        r AS (
          SELECT event_type, v_u,
                 row_number() OVER (PARTITION BY event_type ORDER BY v_u) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM v
        ),
        k AS (SELECT * FROM r WHERE rn > n // 20 AND rn <= (19 * n) // 20)
        SELECT event_type, CAST(max(n) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS n_kept,
               round(CAST(sum(v_u) AS DOUBLE) / count(*) / 1000000, 4) AS trimmed_mean,
               round(min(v_u) / 1000000.0, 6) AS trimmed_min,
               round(max(v_u) / 1000000.0, 6) AS trimmed_max
        FROM k GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert len(want) == len(got) > 0
    for et, n_total, n_kept, mean, lo, hi in want:
        g = got[et]
        assert (g.n_total, g.n_kept) == (n_total, n_kept)
        assert (g.trimmed_mean, g.trimmed_min, g.trimmed_max) == (mean, lo, hi)


def test_attribution_conserves_revenue(spark):
    """Every purchase with at least one lookback touch is credited to
    EXACTLY ONE first-touch channel and one last-touch channel, so both
    channel columns must sum to the same total: the cent-exact revenue
    of attributable purchases. Double-credit (a window tie emitting two
    rank-1 rows) or dropped credit breaks the equality immediately."""
    rows = qlib.all_queries()["event_attribution_touch"](spark, SF_DIR).collect()
    assert len(rows) > 0
    first_total = round(sum(r.first_touch_revenue for r in rows), 2)
    last_total = round(sum(r.last_touch_revenue for r in rows), 2)
    assert first_total == last_total
    n_first = sum(r.n_first for r in rows)
    n_last = sum(r.n_last for r in rows)
    assert n_first == n_last  # one credit per attributable purchase each way


def test_containment_prefix_filter_is_complete(spark):
    """PPJoin prefix filtering must be LOSSLESS: if C(A→B) ≥ t then at
    least one of A's floor((1-t)|A|)+1 prefix shingles is in B, so the
    blocking join cannot drop a true pair. Planted subset-inclusion
    pairs (container = contained doc's full text + extra tokens) on
    random docs must all surface with containment 1.0 — a prefix-size
    off-by-one or a broken canonical order loses pairs SILENTLY, which
    the fixture-based oracle check can miss on lucky data."""
    import random

    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D

    rnd = random.Random(11)
    vocab = [f"w{i:03d}" for i in range(500)]
    rows = []
    for i in range(40):
        toks = [vocab[rnd.randrange(500)] for _ in range(rnd.randrange(30, 80))]
        rows.append((i, " ".join(toks)))
    planted = []
    for i in range(12):
        extra = " ".join(
            vocab[rnd.randrange(500)] for _ in range(rnd.randrange(20, 40))
        )
        rows.append((100 + i, rows[i][1] + " " + extra))
        planted.append((i, 100 + i))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in D.containment_pairs(df, "doc_id", "text", n=3).collect()
    }
    for pair in planted:
        assert pair in got, f"planted containment pair {pair} lost by blocking"
        assert got[pair] == 1.0


def test_kcore_peel_matches_bruteforce(spark):
    """The distributed peel must remove EXACTLY the nodes a literal
    round-by-round simulation removes — same surviving set, same
    residual degrees — on a seeded random sparse graph (chains, leaves,
    and a cyclic core the TPC-H fixture's shape doesn't vary)."""
    import random
    from collections import Counter

    rnd = random.Random(13)
    nodes = list(range(40))
    edges = sorted({tuple(sorted(rnd.sample(nodes, 2))) for _ in range(55)})

    adj = [(s, d) for s, d in edges] + [(d, s) for s, d in edges]
    for _ in range(3):
        deg = Counter(s for s, _ in adj)
        keep = {s for s, c in deg.items() if c >= 2}
        adj = [(s, d) for s, d in adj if s in keep and d in keep]
    want = dict(Counter(s for s, _ in adj))

    got = {
        r.s: r.residual_degree
        for r in G.kcore_peel(
            spark.createDataFrame(edges, ["p1", "p2"]), k=2, rounds=3
        ).collect()
    }
    assert got == want and len(want) > 0


def _dup_embeddings(spark, n_base=40, copies=3):
    """Duplicate-heavy embedding fixture: ``copies`` verbatim copies of
    each base vector (id-shifted, label kept) plus a handful of copies
    whose LABEL differs — the corpus shape that makes un-collapsed
    banded-LSH cost d² per duplicate group."""
    e = (
        qlib._load(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < n_base)
        .select("vec_id", "embedding", "label")
    )
    parts = [
        e.select(
            (F.col("vec_id") + F.lit(i * 1000)).cast("long").alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(copies)
    ]
    flipped = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + F.lit(9000)).cast("long").alias("vec_id"),
        "embedding",
        (F.col("label") + F.lit(100)).cast("int").alias("label"),
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.unionByName(flipped)


def _member_level_pairs(dup, threshold=0.45, bands=4, rpb=4, dim=64):
    """Independent witness: the PRE-collapse banded-pair algorithm,
    spelled out over every member copy — banding, candidate distinct,
    verification — with no shared code path through
    ``collapse_identical``."""
    from mini_lakehouse_control_plane_executor_spark.operators import (
        similarity as S,
    )

    planes = S.hyperplanes(bands * rpb, dim)
    v = dup.select(
        F.col("vec_id").alias("doc_id"),
        S._as_double(F.col("embedding")).alias("vec"),
    ).withColumn("nrm", S.norm(F.col("vec")))
    bk = v.select(
        "doc_id",
        F.posexplode(S._band_keys("vec", planes, bands, rpb)).alias("band", "bk"),
    )
    cands = (
        bk.alias("l")
        .join(
            bk.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bk") == F.col("r.bk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id1"), F.col("r.doc_id").alias("id2"))
        .distinct()
    )
    a = v.select(
        F.col("doc_id").alias("id1"), F.col("vec").alias("v1"), F.col("nrm").alias("n1")
    )
    b_ = v.select(
        F.col("doc_id").alias("id2"), F.col("vec").alias("v2"), F.col("nrm").alias("n2")
    )
    sim = F.round(S.dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6)
    return (
        cands.join(a, "id1")
        .join(b_, "id2")
        .select("id1", "id2", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def test_neardup_pairs_collapse_is_exact(spark):
    """The collapsed pair path must emit EXACTLY the member-level pair
    set on duplicate-heavy input — cross pairs (every copy-pair of two
    qualifying distinct vectors, same sim) and internal pairs (every
    copy-pair within a duplicate group at self-similarity), all ordered
    id1 < id2."""
    from mini_lakehouse_control_plane_executor_spark.operators import (
        similarity as S,
    )

    dup = _dup_embeddings(spark)
    kw = dict(threshold=0.45, bands=4, rows_per_band=4, dim=64)
    got = {
        (r["id1"], r["id2"], r["sim"])
        for r in S.neardup_pairs(dup, "vec_id", "embedding", **kw).collect()
    }
    want = {
        (r["id1"], r["id2"], r["sim"]) for r in _member_level_pairs(dup).collect()
    }
    assert got == want
    # the fixture's duplicate groups produce internal sim-1.0 pairs:
    # 35 groups of 3 copies (C(3,2)=3) + 5 groups of 4 (the flipped-label
    # copies share their base vector; labels don't key THIS collapse)
    assert any(s == 1.0 for _, _, s in want)
    assert len(want) >= 135


def test_neardup_components_collapse_is_exact(spark):
    """The d²-skew guard must be invisible in the answer: cluster
    assignment from the collapsed path (identical vectors grouped
    BEFORE banding + the component fixpoint) equals the member-level
    path (banded pairs over every copy, components over the full pair
    list) on duplicate-heavy input — every (id, root), not just
    aggregate counts."""
    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D
    from mini_lakehouse_control_plane_executor_spark.operators import (
        similarity as S,
    )

    dup = _dup_embeddings(spark)
    kw = dict(threshold=0.45, bands=4, rows_per_band=4, dim=64)
    got = {
        (r["doc_id"], r["root"])
        for r in S.neardup_components(dup, "vec_id", "embedding", **kw).collect()
    }
    pairs = _member_level_pairs(dup)
    want = {
        (r["id"], r["root"])
        for r in D.connected_components(pairs.select("id1", "id2")).collect()
    }
    assert got == want
    # sanity: the fixture really exercises duplicate groups (clusters
    # span id-shifted copies, so roots repeat across shifts)
    assert len(want) >= 120


def test_lsh_hard_negatives_collapse_is_exact(spark):
    """Collapsed hard-negative mining must reproduce the member-level
    algorithm row-for-row on duplicate-heavy input: same anchors, same
    (sim desc, c_id) top-k per anchor — including anchors whose copies
    share a candidate list and candidate groups that straddle the k
    boundary by c_id tiebreak."""
    from mini_lakehouse_control_plane_executor_spark.operators import (
        similarity as S,
    )
    from pyspark.sql import Window

    dup = _dup_embeddings(spark)
    k, bands, rpb, dim = 3, 4, 4, 64
    got = {
        (r["q_id"], r["c_id"], r["sim"], r["rank"])
        for r in S.lsh_hard_negatives(
            dup, "vec_id", "embedding", "label", k=k, bands=bands,
            rows_per_band=rpb, dim=dim,
        ).collect()
    }
    # Member-level reference: the pre-collapse algorithm, spelled out.
    planes = S.hyperplanes(bands * rpb, dim)
    v = (
        dup.select(
            F.col("vec_id").alias("vid"),
            F.col("label").alias("lbl"),
            S._as_double(F.col("embedding")).alias("vec"),
        )
        .withColumn("nrm", S.norm(F.col("vec")))
    )
    bk = v.select(
        "vid",
        F.posexplode(S._band_keys("vec", planes, bands, rpb)).alias("band", "bk"),
    )
    cands = (
        bk.alias("l")
        .join(
            bk.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bk") == F.col("r.bk"))
            & (F.col("l.vid") != F.col("r.vid")),
        )
        .select(F.col("l.vid").alias("q_id"), F.col("r.vid").alias("c_id"))
        .distinct()
    )
    qa = v.select(
        F.col("vid").alias("q_id"), F.col("lbl").alias("q_lbl"),
        F.col("vec").alias("q_vec"), F.col("nrm").alias("q_nrm"),
    )
    cb = v.select(
        F.col("vid").alias("c_id"), F.col("lbl").alias("c_lbl"),
        F.col("vec").alias("c_vec"), F.col("nrm").alias("c_nrm"),
    )
    sim = F.round(
        S.dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm")), 6
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    want = {
        (r["q_id"], r["c_id"], r["sim"], r["rank"])
        for r in (
            cands.join(qa, "q_id")
            .join(cb, "c_id")
            .filter(F.col("q_lbl") != F.col("c_lbl"))
            .select("q_id", "c_id", sim.alias("sim"))
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        ).collect()
    }
    assert got == want
    assert len(want) >= 300  # every copy is an anchor with a full top-k


def test_lsh_candidates_signature_collapse_is_exact(spark):
    """MinHash candidate generation's duplicate-skew guard must be
    invisible in the answer: the signature-collapsed path (band join
    over distinct signatures + member expansion + same-signature
    internal pairs) emits exactly the member-level candidate set on a
    corpus where every document has verbatim copies."""
    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D

    base = (
        qlib._load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    dup = base
    for i in (1, 2):
        dup = dup.unionByName(
            base.select(
                (F.col("doc_id") + F.lit(i * 10000)).cast("long").alias("doc_id"),
                "text",
            )
        )
    sigs = D.minhash_signatures(dup, "doc_id", "text", 3)
    got = {
        (r["id1"], r["id2"]) for r in D.lsh_candidates(sigs).collect()
    }
    # Member-level witness: the pre-collapse algorithm — band join over
    # EVERY doc's signature rows, no shared code through the collapse.
    bands = D.band_keys(sigs)
    want = {
        (r["id1"], r["id2"])
        for r in (
            bands.alias("l")
            .join(
                bands.alias("r"),
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bk") == F.col("r.bk"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            )
            .select(F.col("l.doc_id").alias("id1"), F.col("r.doc_id").alias("id2"))
            .distinct()
        ).collect()
    }
    assert got == want
    # the duplicate groups alone contribute 60·C(3,2)=180 internal pairs
    assert len(want) >= 180


def test_simhash_pairs_signature_collapse_is_exact(spark):
    """SimHash's duplicate-skew guard must be invisible in the answer:
    the signature-collapsed path equals the member-level chunk join —
    every (id1, id2, hamming) — on a corpus where every document has
    verbatim copies (hamming is a function of the signature alone, so
    rep-level distances transfer verbatim)."""
    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D
    from mini_lakehouse_control_plane_executor_spark.operators.text import tokens

    base = (
        qlib._load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    dup = base
    for i in (1, 2):
        dup = dup.unionByName(
            base.select(
                (F.col("doc_id") + F.lit(i * 10000)).cast("long").alias("doc_id"),
                "text",
            )
        )
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in D.simhash_pairs(dup, "doc_id", "text").collect()
    }
    # Member-level witness: chunk join over EVERY doc's fingerprint
    # (two 32-bit halves, 4x16-bit chunks).
    bits, bands, max_hamming = D.SIMHASH_BITS, D.SIMHASH_BANDS, 3
    half_bits = bits // 2
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    chunks_per_half = half_bits // band_bits
    sigs = (
        dup.select(F.col("doc_id"), tokens(F.col("text")).alias("toks"))
        .select("doc_id", D.shingles_from_tokens(F.col("toks"), 3).alias("shl"))
        .select(
            "doc_id",
            F.transform(F.col("shl"), D._feature_hash60).alias("hsa"),
            F.transform(F.col("shl"), D._feature_hash60b).alias("hsb"),
        )
        .select(
            "doc_id",
            D.simhash_from_hashes(F.col("hsa"), half_bits).alias("sha"),
            D.simhash_from_hashes(F.col("hsb"), half_bits).alias("shb"),
        )
    )
    chunk_arr = F.array(
        *[
            F.shiftright(F.col(h), b * band_bits).bitwiseAND(F.lit(mask))
            for h in ("sha", "shb")
            for b in range(chunks_per_half)
        ]
    )
    chunks = sigs.select(
        "doc_id", "sha", "shb", F.posexplode(chunk_arr).alias("band", "ck")
    )
    cands = (
        chunks.alias("l")
        .join(
            chunks.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.ck") == F.col("r.ck"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id1"),
            F.col("r.doc_id").alias("id2"),
            F.col("l.sha").alias("sha1"),
            F.col("l.shb").alias("shb1"),
            F.col("r.sha").alias("sha2"),
            F.col("r.shb").alias("shb2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sha1").bitwiseXOR(F.col("sha2"))) + F.bit_count(
        F.col("shb1").bitwiseXOR(F.col("shb2"))
    )
    want = {
        (r["id1"], r["id2"], r["hamming"])
        for r in cands.select(
            "id1", "id2", hamming.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
        .collect()
    }
    assert got == want
    # duplicate groups contribute 60*C(3,2)=180 hamming-0 internal pairs
    assert sum(1 for _, _, h in want if h == 0) >= 180


def test_containment_pairs_set_collapse_is_exact(spark):
    """Containment's duplicate-skew guard must be invisible in the
    answer: the set-collapsed path equals the member-level PPJoin —
    every DIRECTED (contained_id, container_id, containment) row — on a
    corpus where every document has verbatim copies. Identical-set
    members must appear in BOTH directions at containment 1.0, exactly
    as the member-level algorithm emits them."""
    from pyspark.sql import Window
    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D

    base = (
        qlib._load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    dup = base
    for i in (1, 2):
        dup = dup.unionByName(
            base.select(
                (F.col("doc_id") + F.lit(i * 10000)).cast("long").alias("doc_id"),
                "text",
            )
        )
    tn, td, mins = 9, 10, 5
    got = {
        (r["contained_id"], r["container_id"], r["containment"])
        for r in D.containment_pairs(
            dup, "doc_id", "text", 3, tn, td, mins
        ).collect()
    }
    # Member-level witness: the pre-collapse PPJoin, spelled out.
    arr = D.shingle_arrays(dup, "doc_id", "text", 3)
    ex = D.exploded_shingles(dup, "doc_id", "text", 3, arrays=arr)
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("dfr"))
    w = Window.partitionBy("doc_id")
    wo = w.orderBy("dfr", F.md5("s"), "s")
    ranked = (
        ex.join(dfreq, "s")
        .withColumn("rn", F.row_number().over(wo))
        .withColumn("n_sh", F.count(F.lit(1)).over(w))
    )
    miss = F.expr(f"n_sh * {td - tn} div {td}")
    pref = ranked.filter(
        (F.col("n_sh") >= mins) & (F.col("rn") <= miss + 1)
    ).select(F.col("doc_id").alias("a_id"), "s", F.col("n_sh").alias("na"))
    bside = ranked.select(
        F.col("doc_id").alias("b_id"), "s", F.col("n_sh").alias("nb")
    )
    cand = (
        pref.join(bside, ["s"])
        .filter(
            (F.col("a_id") != F.col("b_id"))
            & (F.col("nb") * td >= F.col("na") * tn)
        )
        .select("a_id", "b_id", "na")
        .distinct()
    )
    a_arr = arr.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b_arr = arr.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    want = {
        (r["contained_id"], r["container_id"], r["containment"])
        for r in (
            cand.join(a_arr, "a_id")
            .join(b_arr, "b_id")
            .withColumn("c", F.size(F.array_intersect("a_sh", "b_sh")).cast("long"))
            .filter(F.col("c") * td >= F.col("na") * tn)
            .select(
                F.col("a_id").alias("contained_id"),
                F.col("b_id").alias("container_id"),
                F.round(F.col("c") / F.col("na"), 4).alias("containment"),
            )
        ).collect()
    }
    assert got == want
    # duplicate groups contribute 60*3*2=360 directed containment-1.0 pairs
    assert sum(1 for _, _, c in want if c == 1.0) >= 360


def test_winnowing_local_guarantee(spark, tmp_path):
    """Winnowing's defining property (Schleimer et al. 2003, thm 1):
    any shared token run of length >= t = w + k - 1 = 7 MUST share a
    selected fingerprint — a window-frame off-by-one or a broken
    min-encode loses short copied passages SILENTLY while long
    verbatim pairs still surface, which fixture parity can miss.
    Per-doc disjoint vocabularies make planted runs the ONLY cross-doc
    4-grams, so the emitted pair set is exactly the planted set."""
    import random

    rnd = random.Random(23)
    rows = []
    for i in range(30):
        toks = [f"d{i}w{rnd.randrange(200)}" for _ in range(60)]
        rows.append((i, " ".join(toks)))
    # Plant three copied runs, one at the minimum guaranteed length 7:
    # (0 -> 1) 12 tokens, (2 -> 3) exactly 7 tokens, (4 -> 5) 9 tokens.
    planted = [(0, 1, 12), (2, 3, 7), (4, 5, 9)]
    for src, dst, run in planted:
        stoks = rows[src][1].split()
        dtoks = rows[dst][1].split()
        mid = len(dtoks) // 2
        rows[dst] = (dst, " ".join(dtoks[:mid] + stoks[10 : 10 + run] + dtoks[mid:]))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "source", F.lit("s")
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.id1, r.id2): r.shared_fp
        for r in qlib._REGISTRY["winnowing_dup_pairs"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {(s, d) for s, d, _ in planted}
    for s, d, _run in planted:
        assert got[(s, d)] >= 1


def test_embedding_covariance_matches_numpy(spark):
    """The distributed covariance must BE the covariance: rebuild the
    full dim x dim matrix from the upper-triangle output and compare to
    numpy's population covariance of the collected matrix (atol bounded
    by the 1e-6 per-row product quantization), and eigen-decompose it —
    PSD up to quantization noise, trace = total variance. This is the
    driver-side-PCA contract embedding_pca_covariance advertises."""
    import numpy as np

    from mini_lakehouse_control_plane_executor_spark.operators import (
        similarity as S,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cv = S.embedding_covariance(e, "vec_id", "embedding").collect()
    X = np.array(
        [r.embedding for r in e.select("embedding").collect()], dtype=np.float64
    )
    C = np.cov(X, rowvar=False, bias=True)
    dim = C.shape[0]
    M = np.zeros_like(C)
    for r in cv:
        M[r.i - 1, r.j - 1] = r.cov
        M[r.j - 1, r.i - 1] = r.cov
    assert len(cv) == dim * (dim + 1) // 2
    assert np.abs(M - C).max() < 1e-4
    ev = np.linalg.eigvalsh(M)
    assert ev.min() > -1e-6, "covariance must be PSD up to quantization"
    assert abs(np.trace(M) - C.trace()) < 1e-4


def test_embedding_covariance_gram_path_edge_inputs(spark):
    """The r14 Arrow Gram path (_gram_partials) replaced posexplode +
    self-join; its hand-rolled offset/take gathers must reproduce the
    posexplode semantics on the inputs the old plan handled
    structurally: ragged vector widths (a pair (i, j) exists only for
    rows long enough to carry both positions, with per-dim n varying)
    and null LISTS (contribute nothing). Expected sums are recomputed
    here per definition; null ELEMENTS inside a vector must raise
    loudly instead of silently diverging from the JVM null-skipping
    aggregate."""
    from decimal import ROUND_HALF_UP, Decimal

    import pytest

    from mini_lakehouse_control_plane_executor_spark.operators import (
        similarity as S,
    )

    rows = [
        (1, [1.25, -2.0, 0.5]),
        (2, [3.5]),
        (3, None),
        (4, [0.125, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {(r.i, r.j): r for r in S.embedding_covariance(
        df, "vec_id", "embedding", dim=3
    ).collect()}

    def rnd(x):
        return int(Decimal(x).to_integral_value(rounding=ROUND_HALF_UP))

    vecs = [v for _, v in rows if v is not None]
    for i in range(3):
        for j in range(i, 3):
            both = [v for v in vecs if len(v) > j]
            if not both:
                assert (i + 1, j + 1) not in got
                continue
            n_i = len([v for v in vecs if len(v) > i])
            sxy = sum(rnd((v[i] * v[j]) * 1e6) for v in both)
            sx_i = sum(rnd(v[i] * 1e6) for v in vecs if len(v) > i)
            sx_j = sum(rnd(v[j] * 1e6) for v in vecs if len(v) > j)
            r = got[(i + 1, j + 1)]
            # the operator's documented double-op sequence, verbatim
            exp_cov = (sxy / 1e6 - (sx_i / 1e6) * (sx_j / 1e6) / n_i) / n_i
            assert r.cov == exp_cov
            if i == j:
                exp_var = (sxy / 1e6 - (sx_i / 1e6) * (sx_i / 1e6) / n_i) / n_i
                assert r.var_i == exp_var
    # ragged pair count: (1,2),(1,3),(2,3) exist only where rows reach
    assert set(got) == {(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)}

    bad = spark.createDataFrame(
        [(1, [1.0, None, 2.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(Exception, match="null element inside a vector"):
        S.embedding_covariance(bad, "vec_id", "embedding", dim=3).collect()


def test_power_iteration_recovers_planted_spikes(spark):
    """Power iteration must CONVERGE, not just terminate: on a planted
    two-spike matrix C = l1*u1*u1^T + l2*u2*u2^T + eps*I with known
    orthogonal u1, u2 the deflated iterates must recover BOTH
    directions and eigenvalues, and the two recovered components must
    be orthogonal — the oracle pins the arithmetic, this pins that the
    arithmetic is power iteration with correct rank-1 deflation."""
    from mini_lakehouse_control_plane_executor_spark.operators import (
        similarity as S,
    )

    u1 = [3 / 13, 4 / 13, 12 / 13, 0.0, 0.0, 0.0]
    u2 = [0.0, 0.0, 0.0, 4 / 5, 0.0, 3 / 5]  # orthogonal to u1
    l1, l2, eps = 2.0, 0.5, 0.01
    rows = [
        (
            i + 1,
            j + 1,
            l1 * u1[i] * u1[j] + l2 * u2[i] * u2[j] + (eps if i == j else 0.0),
        )
        for i in range(6)
        for j in range(6)
    ]
    cov = spark.createDataFrame(rows, "i int, j int, c double")
    got = {
        (r.k, r.i): r
        for r in S.power_iteration_topk(cov, n_components=2, iters=8).collect()
    }
    assert abs(got[(1, 1)].eig_u / 1e6 - (l1 + eps)) < 1e-3
    assert abs(got[(2, 1)].eig_u / 1e6 - (l2 + eps)) < 1e-3
    # loadings align with the planted directions (all-ones start has
    # positive overlap with both, so signs are +u1 / +u2)
    for i in range(6):
        assert abs(got[(1, i + 1)].vu / 1e6 - u1[i]) < 1e-3
        assert abs(got[(2, i + 1)].vu / 1e6 - u2[i]) < 2e-3
    dot = sum(got[(1, i)].vu * got[(2, i)].vu for i in range(1, 7)) / 1e12
    assert abs(dot) < 1e-3, "recovered components must be orthogonal"


def test_bootstrap_weights_are_poisson(spark):
    """The md5-threshold inversion must actually produce Poisson(1)
    replica weights: over corpus x 40 deterministic draws the weight
    histogram must track the Poisson pmf (a wrong threshold constant or
    a >= vs < slip shifts whole probability mass classes), and the
    query's CI must be a well-formed interval around its point
    estimate."""
    import math

    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(7)
    for k in reversed(range(len(qlib._POIS_T))):
        w = F.when(F.col("h") < qlib._POIS_T[k], F.lit(k)).otherwise(w)
    counts = {
        r.w: r.c
        for r in (
            d.select(
                "doc_id",
                F.explode(F.sequence(F.lit(0), F.lit(qlib._BOOT_B - 1))).alias("b"),
            )
            .withColumn("h", h)
            .select(w.alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
    }
    n = sum(counts.values())
    mean_w = sum(k * c for k, c in counts.items()) / n
    assert abs(mean_w - 1.0) < 0.05, mean_w
    for k in range(3):  # the mass-carrying classes
        p = math.exp(-1) / math.factorial(k)
        assert abs(counts.get(k, 0) / n - p) < 0.02, (k, counts.get(k, 0) / n, p)

    out = qlib._REGISTRY["bootstrap_ci_mean_tokens"](spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.ci_lo < r.ci_hi
        width = r.ci_hi - r.ci_lo
        assert r.ci_lo - width <= r.mean_tokens <= r.ci_hi + width


def test_jl_projection_preserves_distances_in_expectation(spark):
    """The JL lemma, measured: across the audited pairs the
    pair-weighted mean distortion ratio must sit at 1 (a wrong 1/k
    scale, a biased sign matrix, or a mismatched pair join shifts it
    multiplicatively), and the mass must concentrate — most pairs
    within [0.5, 1.5] for k=16 (sd = sqrt(2/k) ~ 0.35)."""
    rows = qlib._REGISTRY["embedding_jl_projection_distortion"](
        spark, SF_DIR
    ).collect()
    n = sum(r.n_pairs for r in rows)
    mean = sum(r.n_pairs * r.avg_ratio for r in rows) / n
    assert 0.9 < mean < 1.1, mean
    central = sum(r.n_pairs for r in rows if 5 <= r.bin <= 14)
    assert central / n > 0.75, central / n


def test_ab_test_aa_split_is_calibrated(spark):
    """The md5 split is an A/A test on this data — both arms draw from
    one population — so the Welch z must stay inside a loose |z| < 4
    band (a biased assignment or a wrong variance pooling shifts it
    arbitrarily), arms must partition the user set, and means must be
    positive spend."""
    from pyspark.sql import functions as F

    r = qlib._REGISTRY["ab_test_value"](spark, SF_DIR).collect()[0]
    users = (
        qlib._load_events(spark, SF_DIR).select("user_id").distinct().count()
    )
    assert r.n_a + r.n_b == users
    assert r.n_a > 0 and r.n_b > 0
    assert r.mean_a > 0 and r.mean_b > 0
    assert abs(r.z_score) < 4


def test_winnowing_map_selection_equals_window_selection(spark):
    """The map-only fingerprint selection (array_min over slices — the
    streaming-safe form) must pick EXACTLY the fingerprints the batch
    query's doc-keyed window selects: same packed-integer minima, same
    truncated tail windows, same short-doc single-window rule."""
    from pyspark.sql import Window

    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D
    from mini_lakehouse_control_plane_executor_spark.operators import text as TX

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r.doc_id, r.h)
        for r in D.winnowing_fingerprints_map(d, "doc_id", "text").collect()
    }
    mod = qlib._WINNOW_POS_MOD
    grams = F.expr(
        "transform(slice(toks, 1, size(toks) - 3),"
        " (t, i) -> concat(t, ' ', element_at(toks, i + 2),"
        " ' ', element_at(toks, i + 3), ' ', element_at(toks, i + 4)))"
    )
    encs = (
        d.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 4)
        .select("doc_id", grams.alias("gs"))
        .select("doc_id", F.size("gs").alias("ng"), F.posexplode("gs").alias("p0", "g"))
        .select(
            "doc_id",
            "ng",
            (F.col("p0") + 1).alias("pos"),
            (
                F.conv(F.substring(F.md5("g"), 1, 9), 16, 10).cast("long") * mod
                + (F.lit(mod - 1) - (F.col("p0") + 1))
            ).alias("enc"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    want = {
        (r.doc_id, r.h)
        for r in encs.withColumn("m", F.min("enc").over(w))
        .filter(F.col("pos") <= F.greatest(F.col("ng") - 3, F.lit(1)))
        .select("doc_id", F.expr(f"m div {mod}").alias("h"))
        .distinct()
        .collect()
    }
    assert got == want and len(want) > 0


def test_embedding_covariance_refuses_wide_dims(spark):
    """The n·d² pair-fanout guard: dims above COVARIANCE_MAX_DIM must
    raise (pointing at the block outer-product escape hatch), never
    silently run the quadratic-width plan. A synthetic d=512 frame —
    the guard fires on the declared dim before any job runs."""
    import pytest as _pytest

    from mini_lakehouse_control_plane_executor_spark.operators import similarity as S

    e = spark.range(0, 4).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 512), x -> cast(x as double)) AS embedding",
    )
    with _pytest.raises(ValueError, match="COVARIANCE_MAX_DIM"):
        S.embedding_covariance(e, "vec_id", "embedding", dim=512)
    # dim omitted: the probe is max(size(vec)), so a RAGGED frame whose
    # widest row exceeds the bound is refused even when the first row
    # is narrow (a limit-1 sample would wave it through)
    ragged = spark.range(0, 4).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, CASE WHEN id = 3 THEN 512 ELSE 8 END),"
        " x -> cast(x as double)) AS embedding",
    )
    with _pytest.raises(ValueError, match="COVARIANCE_MAX_DIM"):
        S.embedding_covariance(ragged, "vec_id", "embedding")
    # at or below the bound the declared dim changes nothing
    ok = S.embedding_covariance(
        spark.range(0, 4).selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 8), x -> cast(x as double)) AS embedding",
        ),
        "vec_id",
        "embedding",
        dim=8,
    )
    assert ok.count() == 8 * 9 // 2


def test_cooccurrence_edges_arrays_equals_selfjoin(spark):
    """The array-form edge builder (ONE key aggregate + map-side pair
    generation — two shuffles) must produce exactly the incidence
    self-join form's edges, support counts included, on input WITH
    duplicate (key, item) rows (collect_set dedups where the selfjoin
    form needs an explicit distinct)."""
    rows = [
        (1, 10), (1, 20), (1, 30), (1, 20),  # dup incidence
        (2, 10), (2, 20),
        (3, 10), (3, 20), (3, 40),
        (4, 40),  # singleton key -> no pairs
    ]
    it = spark.createDataFrame(rows, "k long, p long")
    kw = dict(min_support=1, keep_support=True)
    got = sorted(
        (r.p1, r.p2, r.nord)
        for r in G.cooccurrence_edges(it, "k", "p", via="arrays", **kw).collect()
    )
    want = sorted(
        (r.p1, r.p2, r.nord)
        for r in G.cooccurrence_edges(it, "k", "p", via="selfjoin", **kw).collect()
    )
    assert got == want
    assert (10, 20, 3) in got  # support counted across keys
    # canonical orientation: p1 < p2 everywhere
    assert all(a < b for a, b, _ in got)
    # min_support filters
    ms = {
        (r.p1, r.p2)
        for r in G.cooccurrence_edges(
            it, "k", "p", via="arrays", min_support=2
        ).collect()
    }
    assert ms == {(a, b) for a, b, n in got if n >= 2}


def test_threshold_sweeps_survive_dedup_clean_corpus(spark, tmp_path):
    """dedup_token_savings / dedup_semdedup_prune: a corpus with ZERO
    near-duplicate pairs must still report one all-zero row PER
    threshold (the sweep is a single-row conditional aggregate
    unpivoted, never a group-by over an empty pair relation)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "red orange yellow green blue indigo violet maroon"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    # orthogonal one-hot embeddings -> every pairwise cosine is 0
    emb = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(64)], 0) for i in range(3)],
        "vec_id long, embedding array<float>, label int",
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))
    reg = qlib.all_queries()
    ts = reg["dedup_token_savings"](spark, str(tmp_path)).collect()
    assert len(ts) == 3
    assert all(r.docs_pruned == 0 and r.tokens_pruned == 0 for r in ts)
    assert all(r.tokens_kept > 0 and r.tokens_pruned_bp == 0 for r in ts)
    sd = reg["dedup_semdedup_prune"](spark, str(tmp_path)).collect()
    assert len(sd) == 3
    assert all(r.n_pruned == 0 and r.n_kept == 3 and r.pruned_bp == 0 for r in sd)


def test_band_marginal_recall_collapse_is_exact(spark):
    """The band-marginal histogram's duplicate-skew guard (shingle-set
    collapse + arithmetic C(g,2)/g1*g2 count expansion) must be
    invisible in the answer: on a corpus where every document has
    verbatim copies, the guarded histogram equals the member-level
    witness — raw per-doc band self-join, pair-keyed min-band
    attribution, exact Jaccard verification — row for row."""
    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D

    base = (
        qlib._load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    dup = base
    for i in (1, 2):
        dup = dup.unionByName(
            base.select(
                (F.col("doc_id") + F.lit(i * 10000)).cast("long").alias("doc_id"),
                "text",
            )
        )
    got = [tuple(r) for r in qlib._band_marginal_hist(spark, dup).collect()]

    # Member-level witness: the pre-guard algorithm, no shared code
    # through the collapse (every doc's signature rows join directly).
    n_bands = D.MINHASH_K // D.MINHASH_BAND_ROWS
    arrays = D.shingle_arrays(dup, "doc_id", "text", 3).filter(F.size("sh") > 0)
    ex = arrays.select("doc_id", F.explode("sh").alias("s"))
    sigs = D.minhash_signatures(dup, "doc_id", "text", shingles=ex)
    bands = D.band_keys(sigs)
    pairs_b = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bk") == F.col("r.bk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            "l.band", F.col("l.doc_id").alias("id1"), F.col("r.doc_id").alias("id2")
        )
        .persist()
    )
    fb = pairs_b.groupBy("id1", "id2").agg(F.min("band").alias("band"))
    a1 = arrays.select(
        F.col("doc_id").alias("id1"), F.col("sh").alias("sh1"),
        F.size("sh").cast("long").alias("n1"),
    )
    a2 = arrays.select(
        F.col("doc_id").alias("id2"), F.col("sh").alias("sh2"),
        F.size("sh").cast("long").alias("n2"),
    )
    c = F.size(F.array_intersect("sh1", "sh2")).cast("long")
    jud = (
        fb.join(a1, "id1")
        .join(a2, "id2")
        .select(
            "band",
            F.when(c * 10 >= (F.col("n1") + F.col("n2") - c) * 8, 1)
            .otherwise(0)
            .alias("istrue"),
        )
        .collect()
    )
    cand = {
        r["band"]: r["n"]
        for r in pairs_b.groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    n_first = {b: 0 for b in range(n_bands)}
    n_true = {b: 0 for b in range(n_bands)}
    for r in jud:
        n_first[r["band"]] += 1
        n_true[r["band"]] += r["istrue"]
    tot = sum(n_true.values())
    want, cp, ct = [], 0, 0
    for b in range(n_bands):
        cp += n_first[b]
        ct += n_true[b]
        rb = 0 if tot == 0 else int(round(10000.0 * ct / tot))
        want.append((b, cand.get(b, 0), n_first[b], cp, ct, rb))
    assert got == want
    # the fixture's duplicate groups alone contribute 60*C(3,2)=180
    # first-collision pairs at band 0, all verified true
    assert want[0][2] >= 180 and want[0][4] >= 180


def test_cms_cells_merge_equals_direct_build(spark):
    """The CMS rollup identity: summing per-segment cell tables must
    equal the directly-built global cell table bit for bit (counts are
    additive) — the property events_cms_rollup's merge relies on."""
    ev = qlib._load(spark, SF_DIR, "events").select("event_type", "user_id")
    direct = {
        (r["d"], r["bucket"]): r["c"]
        for r in SK.cms_cells(ev, "user_id").collect()
    }
    tcells = (
        ev.select(
            "event_type",
            F.posexplode(SK.cms_bucket_array(F.col("user_id"))).alias(
                "d", "bucket"
            ),
        )
        .groupBy("event_type", "d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = {
        (r["d"], r["bucket"]): r["c"]
        for r in tcells.groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    assert merged == direct
    assert len(direct) > 0


def test_ivf_assign_zero_norm_centroid_never_wins(spark):
    """The ivf_assign argmax must treat a NULL cosine (zero-norm
    centroid divides by zero) as WORST, matching the batch window's
    desc-nulls-last — struct ordering is nulls-first, so without the
    coalesce-to-inf guard every row would be assigned to the zero
    centroid."""
    from mini_lakehouse_control_plane_executor_spark.operators import similarity as S

    cents = [
        (0, [0.0, 0.0, 0.0, 0.0]),   # degenerate: zero norm
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    vecs = spark.createDataFrame(
        [
            (10, [0.9, 0.1, 0.0, 0.0]),   # nearest: centroid 1
            (11, [0.1, 0.9, 0.0, 0.0]),   # nearest: centroid 2
            (12, [1.0, 1.0, 0.0, 0.0]),   # tie at round 6dp -> min cent_id 1
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["cent_id"]
        for r in S.ivf_assign(vecs, "embedding", cents).collect()
    }
    assert got == {10: 1, 11: 2, 12: 1}
    # a zero-norm INPUT vector (every cosine NULL) falls back to the
    # lowest centroid id, the same row the batch window's tiebreak picks
    z = spark.createDataFrame(
        [(13, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert S.ivf_assign(z, "embedding", cents).first()["cent_id"] == 0


def test_interval_overlap_bucketing_equals_theta_join(spark):
    """events_interval_overlap_join's scale plan expands sessions to the
    6-hour buckets they cover and equi-joins on bucket id. The rewrite
    claims EXACTNESS: bucket-membership <=> interval overlap with that
    bucket's window (a window IS one bucket). Pin it by running the
    naive theta-join (broadcast nested loop over sessions x busy
    windows — fine at sf0.001, unrunnable at scale) and demanding the
    identical (window, n_sessions, n_users) rows."""
    from mini_lakehouse_control_plane_executor_spark.queries import (
        _IVAL_GAP_US,
        _IVAL_W_US,
        events_interval_overlap_join,
    )
    from pyspark.sql import Window

    got = {
        (r["window_start"], r["n_events"], r["n_sessions"], r["n_users"])
        for r in events_interval_overlap_join(spark, SF_DIR).collect()
    }

    e = qlib._load(spark, SF_DIR, "events")
    ew = e.select("user_id", "event_id", F.unix_micros(F.col("ts")).alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = Window.partitionBy("user_id").orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    is_new = F.when(
        F.lag("us").over(w).isNull()
        | (F.col("us") - F.lag("us").over(w) > _IVAL_GAP_US),
        1,
    ).otherwise(0)
    sess = (
        ew.withColumn("is_new", is_new)
        .withColumn("sid", F.sum("is_new").over(run))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_start"), F.max("us").alias("s_end"))
    )
    win = ew.groupBy(F.expr(f"us div {_IVAL_W_US}").alias("wb")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    thr = win.agg(F.avg("n_events").alias("thr"))
    busy = win.crossJoin(F.broadcast(thr)).filter(F.col("n_events") > F.col("thr"))
    naive = (
        F.broadcast(busy)
        .join(
            sess,
            (F.col("s_start") < (F.col("wb") + 1) * _IVAL_W_US)
            & (F.col("s_end") >= F.col("wb") * _IVAL_W_US),
        )
        .groupBy("wb")
        .agg(
            F.any_value("n_events").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.timestamp_micros(F.col("wb") * _IVAL_W_US).alias("window_start"),
            "n_events",
            "n_sessions",
            "n_users",
        )
    )
    want = {
        (r["window_start"], r["n_events"], r["n_sessions"], r["n_users"])
        for r in naive.collect()
    }
    assert got == want and len(got) > 0


def test_scd2_status_history_hand_computed(spark, tmp_path):
    """orders_scd2_status_history on a hand-built orders table with a
    known status trajectory: cust 1 goes A,A,B,A (3 versions — the
    consecutive-A collapse and the A-reopen split both exercised),
    cust 2 stays B,B (1 version, never closed). Validates the SCD2
    range stitching (eff_to = next version's eff_from) numerically:
    closed spans are 20d (A: d0->d20) and 10d (B: d20->d30)."""
    import datetime as dt

    rows = [
        # (custkey, orderdate, orderkey, status)
        (1, dt.date(2020, 1, 1), 100, "A"),
        (1, dt.date(2020, 1, 11), 101, "A"),
        (1, dt.date(2020, 1, 21), 102, "B"),
        (1, dt.date(2020, 1, 31), 103, "A"),
        (2, dt.date(2020, 2, 1), 200, "B"),
        (2, dt.date(2020, 2, 5), 201, "B"),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_orderkey long, o_orderstatus string"
    )
    df.write.parquet(f"{tmp_path}/orders.parquet")
    got = {
        r["status"]: (
            r["n_versions"],
            r["n_current"],
            r["n_closed"],
            r["avg_closed_span_days"],
            r["avg_orders_per_version"],
        )
        for r in qlib.orders_scd2_status_history(spark, str(tmp_path)).collect()
    }
    # cust 1: A[d0,d20) 2 orders, B[d20,d30) 1 order, A[d30,null) 1 order
    # cust 2: B[feb1,null) 2 orders
    assert got == {
        "A": (2, 1, 1, 20.0, 1.5),
        "B": (2, 1, 1, 10.0, 1.5),
    }


def test_markov_attribution_hand_computed(spark, tmp_path):
    """events_markov_attribution on hand-built journeys with exactly
    computable integer value-iteration results. Journeys (one session
    each): u1 view->purchase, u2 view->(no purchase), u3
    click->purchase->error (the post-purchase error MUST be truncated
    away — 'error' never becomes a channel), u4 click->view->purchase,
    u5 signup->(no purchase). Exact absorption: p(view)=2/3,
    p(click)=5/6, p(START)=3/5; in floor-micro space 666666/833333/
    599999, removal(view) leaves p=200000, removal(click) 266666,
    removal(signup) no-op."""
    import datetime as dt

    rows = []
    eid = 0

    def sess(uid, types, day):
        nonlocal eid
        for i, t in enumerate(types):
            rows.append(
                (eid, dt.datetime(2020, 1, day, 10, i), uid, t, 1.0)
            )
            eid += 1

    sess(1, ["view", "purchase"], 1)
    sess(2, ["view"], 2)
    sess(3, ["click", "purchase", "error"], 3)
    sess(4, ["click", "view", "purchase"], 4)
    sess(5, ["signup"], 5)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    got = {
        r["channel"]: (
            r["p_full_micro"],
            r["p_removed_micro"],
            r["removal_effect_bp"],
            r["attribution_bp"],
        )
        for r in qlib.events_markov_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {
        "click": (599999, 266666, 5555, 4545),
        "signup": (599999, 599999, 0, 0),
        "view": (599999, 200000, 6666, 5454),
    }


def test_moments_sketch_hand_computed(spark, tmp_path):
    """events_moments_skew_kurtosis on distributions with closed-form
    moments: a symmetric two-point distribution {9, 11} has mean 10,
    sd 1, skewness 0, excess kurtosis -2 (the two-point minimum); an
    asymmetric {0, 0, 0, 4} one has mean 1, sd sqrt(3), skewness
    2/sqrt(3) (third central moment 6 over 3^1.5), excess kurtosis
    21/9 - 3 = -2/3 (fourth central moment (3*1+81)/4 = 21) — all
    exactly representable through the centi-quantized integer moment
    sums."""
    import datetime as dt
    import math

    rows = []
    eid = 0
    for v in [9.0, 11.0] * 8:
        rows.append((eid, dt.datetime(2020, 1, 1, 10, 0), eid, "sym", v))
        eid += 1
    for v in [0.0, 0.0, 0.0, 4.0] * 4:
        rows.append((eid, dt.datetime(2020, 1, 1, 10, 0), eid, "skw", v))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    got = {
        r["event_type"]: (
            r["n"],
            r["mean_value"],
            r["sd_value"],
            r["skewness"],
            r["kurtosis_excess"],
        )
        for r in qlib.events_moments_skew_kurtosis(spark, str(tmp_path)).collect()
    }
    assert got["sym"] == (16, 10.0, 1.0, 0.0, -2.0)
    n, mean, sd, skew, kurt = got["skw"]
    assert (n, mean) == (16, 1.0)
    assert abs(sd - round(math.sqrt(3), 4)) < 1e-9
    assert abs(skew - round(2 / math.sqrt(3), 6)) < 1e-9
    assert abs(kurt - round(21 / 9 - 3, 6)) < 1e-9


def test_theil_decomposition_hand_computed(spark, tmp_path):
    """orders_theil_inequality on a hand fixture where the Theil
    decomposition T_total = T_between + sum_g share_g * T_within(g) is
    exactly computable: segment A has two equal customers (T_A = 0),
    segment B has a 3:1 split (T_B = 0.75*ln(1.5) + 0.25*ln(0.5) =
    0.130812), shares are 1/3 and 2/3, and the between terms are
    (1/3)ln(2/3) = -0.135155 and (2/3)ln(4/3) = +0.191788 — their sum
    (0.056633) plus the share-weighted withins (0.087208) equals the
    direct whole-population Theil (0.143841)."""
    cust = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "c_custkey long, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, 100.0), (11, 2, 100.0), (12, 3, 300.0), (13, 4, 100.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust.write.parquet(f"{tmp_path}/customer.parquet")
    orders.write.parquet(f"{tmp_path}/orders.parquet")
    got = {
        r["seg"]: (
            r["n_g"],
            r["rev_share_micro"],
            r["theil_within_micro"],
            r["between_term_micro"],
        )
        for r in qlib.orders_theil_inequality(spark, str(tmp_path)).collect()
    }
    assert got == {
        "A": (2, 333333, 0, -135155),
        "B": (2, 666666, 130812, 191788),
    }
    # Decomposition closes: between sum + share-weighted withins equal
    # the direct whole-population Theil (floor-micro share drift < 2e-6).
    import math

    t_between = sum(v[3] for v in got.values()) / 1e6
    t_within = sum(v[1] / 1e6 * v[2] / 1e6 for v in got.values())
    xs, total = [10000, 10000, 30000, 10000], 60000
    t_direct = sum(x / total * math.log(x * len(xs) / total) for x in xs)
    assert abs(t_between + t_within - t_direct) < 2e-6


def test_mg_prune_hand_values_and_bound(spark):
    """Misra-Gries prune algebra pinned on hand values: node counts
    {a:10, b:5, c:3} at k=2 -> lambda = 3rd largest = 3 -> summary
    {a:7, b:2} (c zeroed). And on the real fixture: per-node summaries
    keep <= k counters, every counter <= its exact count, and the
    merged estimate's undercount respects the n/(k+1) deterministic
    bound for every token (the Agarwal et al. mergeable-summaries
    guarantee, checked exhaustively — not just for the top-k)."""
    nc = spark.createDataFrame(
        [(0, "a", 10), (0, "b", 5), (0, "c", 3)], "node int, key string, c long"
    )
    got = {(r.node, r.key): r.s for r in SK.mg_prune(nc, k=2).collect()}
    assert got == {(0, "a"): 7, (0, "b"): 2}

    d = qlib._load(spark, SF_DIR, "documents")
    from mini_lakehouse_control_plane_executor_spark.operators import text as T

    tok = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("t"))
    ncr = SK.mg_node_counts(tok, "t", SK.mg_node_hash(F.col("doc_id"), 8))
    summ = SK.mg_prune(ncr, k=4)
    per_node = {r.node: r.cnt for r in summ.groupBy("node").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert per_node and max(per_node.values()) <= 4
    exact_nc = {(r.node, r.key): r.c for r in ncr.collect()}
    for r in summ.collect():
        assert 0 < r.s <= exact_nc[(r.node, r.key)]
    # merged estimate: undercount <= n/(k+1) for EVERY key
    merged = {r.key: r.s for r in summ.groupBy("key").agg(
        F.sum("s").alias("s")).collect()}
    exact = {}
    for (node, key), c in exact_nc.items():
        exact[key] = exact.get(key, 0) + c
    n = sum(exact.values())
    bound = n // 5  # k + 1 = 5
    for key, ex in exact.items():
        est = merged.get(key, 0)
        assert est <= ex and ex - est <= bound, (key, est, ex, bound)


def test_interval_bucket_expansion_equals_theta_join(spark):
    """operators/intervals.expand_to_buckets at the DataFrame level:
    membership rows equal the naive overlap theta-join against the
    window relation, row for row — the lemma the property test checks
    in pure integers, here checked through the actual Spark operator
    on real sessionized intervals."""
    from mini_lakehouse_control_plane_executor_spark.operators import intervals as IV

    e = qlib._load(spark, SF_DIR, "events")
    ew = e.select("user_id", "event_id", F.unix_micros(F.col("ts")).alias("us"))
    sess = IV.user_sessions(ew).persist()
    W_US = 6 * 3600 * 1_000_000
    got = sorted(
        (r.user_id, r.sid, r.wb)
        for r in IV.expand_to_buckets(sess, W_US).collect()
    )
    wins = (
        ew.select(F.expr(f"us div {W_US}").alias("wb")).distinct()
    )
    lo, hi = [
        (r.mn, r.mx)
        for r in sess.agg(
            F.min(F.expr(f"s_start div {W_US}")).alias("mn"),
            F.max(F.expr(f"s_end div {W_US}")).alias("mx"),
        ).collect()
    ][0]
    all_wb = spark.range(lo, hi + 1).select(F.col("id").alias("wb"))
    naive = sorted(
        (r.user_id, r.sid, r.wb)
        for r in sess.crossJoin(all_wb)
        .filter(
            (F.col("s_start") < (F.col("wb") + 1) * W_US)
            & (F.col("s_end") >= F.col("wb") * W_US)
        )
        .collect()
    )
    sess.unpersist()
    assert got == naive and len(got) > 0


def _oracle_rows(name: str, data_dir: str, tables: list[str]):
    """Run a registered query's DuckDB oracle over parquet files in
    ``data_dir`` (the driver's harness in miniature) and return rows as
    a sorted list of tuples, NULL-safe."""
    import duckdb

    con = duckdb.connect()
    for t in tables:
        p = f"{data_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out = con.execute(qlib._ORACLE[name]).fetchall()
    con.close()
    return sorted(out, key=lambda r: tuple((v is None, v) for v in r))


def test_cross_correlation_constant_series_null_guard(spark, tmp_path):
    """A type with a CONSTANT daily count series has zero variance —
    Pearson r is undefined, and the r11 ADVICE found the unguarded
    division diverges between engines (Spark NULL vs DuckDB inf/NaN).
    Both engines must now emit NULL for such pairs and agree exactly."""
    import datetime as dt

    rows, eid = [], 0
    # days 0..2; 'aa' constant 1/day, 'bb' 1,2,3, 'cc' 3,1,2
    counts = {"aa": [1, 1, 1], "bb": [1, 2, 3], "cc": [3, 1, 2]}
    for t, per_day in counts.items():
        for day, c in enumerate(per_day):
            for _ in range(c):
                rows.append(
                    (eid, dt.datetime(2020, 1, 1 + day, 12, 0), eid, t, 1.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.type_a, r.type_b): r.r_micro
        for r in qlib._REGISTRY["events_series_cross_correlation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[("aa", "bb")] is None and got[("aa", "cc")] is None
    # bb vs cc: x=(1,2,3) y=(3,1,2) -> r = -1/2
    assert got[("bb", "cc")] == -500000
    ora = _oracle_rows(
        "events_series_cross_correlation", str(tmp_path), ["events"]
    )
    assert sorted(
        [(a, b, 3, r) for (a, b), r in got.items()],
        key=lambda r: tuple((v is None, v) for v in r),
    ) == ora


def test_zipf_slope_degenerate_source_null_guard(spark, tmp_path):
    """A source with a single ranked term (den=0) must emit NULL
    slope/intercept/r2; a source whose top terms all share one
    frequency (deny=0) keeps slope 0 but NULLs r2. Engine-agreement
    checked against the DuckDB oracle on the same fixture."""
    rows = [
        (0, "foo foo foo", "en", "s1", 11),
        (1, "alpha beta", "en", "s2", 10),
        (2, "gamma delta", "en", "s2", 11),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.source: (r.n_terms, r.slope_micro, r.intercept_micro, r.r2_micro)
        for r in qlib._REGISTRY["docs_zipf_rank_slope"](spark, str(tmp_path)).collect()
    }
    assert got["s1"] == (1, None, None, None)
    n2, slope2, _, r22 = got["s2"]
    assert (n2, slope2, r22) == (4, 0, None)
    ora = _oracle_rows("docs_zipf_rank_slope", str(tmp_path), ["documents"])
    assert sorted(
        [(s, *v) for s, v in got.items()],
        key=lambda r: tuple((v is None, v) for v in r),
    ) == ora


def test_psi_drift_new_type_sentinel(spark, tmp_path):
    """A type that appears ONLY in the second half of the timeline has
    no baseline deciles — r11 ADVICE flagged that it silently dropped
    from the drift report. It must now surface as a sentinel row
    (psi NULL, n_buckets 0, both drift flags TRUE), and the DuckDB
    oracle must agree on the same fixture."""
    import datetime as dt

    rows, eid = [], 0
    for day in range(10):
        for _ in range(3):
            rows.append(
                (eid, dt.datetime(2020, 1, 1 + day, 12, 0), eid, "old",
                 float(1 + eid % 5), "{}")
            )
            eid += 1
        if day >= 5:  # second half only
            rows.append(
                (eid, dt.datetime(2020, 1, 1 + day, 13, 0), eid, "neu",
                 2.5, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        r.event_type: (r.psi_micro, r.n_buckets, r.drifted_25, r.drifted_10)
        for r in qlib._REGISTRY["events_value_psi_drift"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["neu"] == (None, 0, True, True)
    assert got["old"][1] == 10 and got["old"][0] is not None
    ora = _oracle_rows("events_value_psi_drift", str(tmp_path), ["events"])
    assert sorted(
        [(t, *v) for t, v in got.items()],
        key=lambda r: tuple((v is None, v) for v in r),
    ) == ora


def test_langid_nb_separable_corpus_and_short_docs(spark, tmp_path):
    """On a corpus whose languages use DISJOINT character inventories
    the NB trigram model must classify every document correctly (pure
    diagonal confusion matrix), sub-3-char docs must emit 'und', and
    the matrix total must equal the corpus size. Engine agreement
    checked against the DuckDB oracle on the same fixture."""
    rows = []
    did = 0
    for _ in range(4):
        rows.append((did, "aaab aabb abab baba", "aa", "s", 19)); did += 1
        rows.append((did, "xxxy xyyx yxyx yyxx", "xx", "s", 19)); did += 1
    rows.append((did, "zq", "aa", "s", 2)); did += 1  # too short -> und
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r.lang_true, r.lang_pred): r.n_docs
        for r in qlib._REGISTRY["docs_langid_nb_confusion"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {("aa", "aa"): 4, ("xx", "xx"): 4, ("aa", "und"): 1}
    ora = _oracle_rows("docs_langid_nb_confusion", str(tmp_path), ["documents"])
    assert sorted((a, b, n) for (a, b), n in got.items()) == ora


def test_exact_substring_run_length_exact(spark, tmp_path):
    """docs_exact_substring_dup recovers the EXACT shared-run length:
    two docs sharing a verbatim 20-token region (unique context either
    side) must report one run of exactly 20 tokens; the islands merge
    must not split or extend it. DuckDB oracle must agree."""
    common = " ".join(f"c{i}" for i in range(20))
    t0 = " ".join(f"a{i}" for i in range(10)) + " " + common + " " + " ".join(
        f"d{i}" for i in range(10)
    )
    t1 = " ".join(f"b{i}" for i in range(10)) + " " + common + " " + " ".join(
        f"e{i}" for i in range(10)
    )
    rows = [(0, t0, "en", "s", len(t0)), (1, t1, "en", "s", len(t1))]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = [
        (r.doc_a, r.doc_b, r.n_runs, r.max_run_tokens, r.dup_tokens)
        for r in qlib._REGISTRY["docs_exact_substring_dup"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [(0, 1, 1, 20, 20)]
    assert got == _oracle_rows("docs_exact_substring_dup", str(tmp_path), ["documents"])


def test_exact_substring_df_gate_drops_boilerplate(spark, tmp_path):
    """A window shared by MORE than MAXDF=8 distinct docs is boilerplate
    and must be excluded BEFORE the pair join (the quadratic-blowup
    guard): 9 docs sharing one 8-token template with unique filler
    produce ZERO pairs, in both engines."""
    template = " ".join(f"t{i}" for i in range(8))
    rows = [
        (i, " ".join(f"u{i}x{j}" for j in range(8)) + " " + template, "en", "s", 99)
        for i in range(9)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = qlib._REGISTRY["docs_exact_substring_dup"](spark, str(tmp_path)).collect()
    assert got == []
    assert _oracle_rows("docs_exact_substring_dup", str(tmp_path), ["documents"]) == []


def test_k1_digest_estimates_upper_bound_and_tail_win(spark):
    """Both digest estimates are vmax of the first centroid covering
    the probe, so they can never undershoot the exact percentile
    (err >= 0); the k1 scale must beat (or tie) the uniform scale at
    the extreme-tail probes it exists for (p99 on every type — the
    equi-depth digest's documented failure mode), while keeping the
    same 32-centroid state."""
    rows = qlib._REGISTRY["events_value_k1_digest_tail"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.uniform_err_c >= 0 and r.k1_err_c >= 0, r
    p990 = [r for r in rows if r.q_mille == 990]
    assert p990 and all(r.k1_err_c <= r.uniform_err_c for r in p990)


def test_unimax_water_filling_hand_computed(spark, tmp_path):
    """corpus_unimax_budget on a hand corpus where the epoch cap bites:
    token counts (1000, 100, 10) with N=4 give ascending caps
    (40, 400, 4000); water-filling caps the two low-resource languages
    at exactly 4 epochs and hands the freed budget to the largest:
    theta = 1110 - 440 = 670. Budget conservation must hold exactly
    and the DuckDB oracle must agree bit-for-bit."""
    rows = [
        (0, "x " * 1000, "aa", "s", 2000),
        (1, "y " * 100, "bb", "s", 200),
        (2, "z " * 10, "cc", "s", 20),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.lang: (r.n_tokens, r.cap_tokens, r.capped, r.alloc_tokens,
                 r.epochs_micro, r.weight_bp)
        for r in qlib._REGISTRY["corpus_unimax_budget"](spark, str(tmp_path)).collect()
    }
    assert got["aa"] == (1000, 4000, False, 670, 670000, 6036)
    assert got["bb"] == (100, 400, True, 400, 4000000, 3603)
    assert got["cc"] == (10, 40, True, 40, 4000000, 360)
    # budget conservation: allocations sum back to B = 1110
    assert sum(v[3] for v in got.values()) == 1110
    ora = _oracle_rows("corpus_unimax_budget", str(tmp_path), ["documents"])
    assert sorted((k, *v) for k, v in got.items()) == ora


def test_exact_substring_savings_union_hand_computed(spark, tmp_path):
    """docs_exact_substring_savings under keep-first with OVERLAPPING
    losing spans: doc1 holds c0..c29; doc0 (keeper) shares c0..c19,
    doc2 shares c10..c29 with both. doc1 loses exactly its c0..c19
    span to doc0; doc2's two losing spans (c10..c19 vs doc0, c10..c29
    vs doc1) overlap and must merge to ONE 20-token span — no double
    counting. doc0 keeps everything and must not appear. DuckDB oracle
    must agree."""
    c = [f"c{i}" for i in range(30)]
    t0 = "u0 u1 u2 " + " ".join(c[:20]) + " v0 v1 v2"
    t1 = "w0 " + " ".join(c) + " w1"
    t2 = "z0 z1 " + " ".join(c[10:30]) + " z2"
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate([t0, t1, t2])]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: (r.n_spans, r.tokens_removed, r.n_tokens, r.keep_ratio_bp)
        for r in qlib._REGISTRY["docs_exact_substring_savings"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        1: (1, 20, 32, (32 - 20) * 10000 // 32),
        2: (1, 20, 23, (23 - 20) * 10000 // 23),
    }
    ora = _oracle_rows(
        "docs_exact_substring_savings", str(tmp_path), ["documents"]
    )
    assert sorted((k, *v) for k, v in got.items()) == ora


def test_exact_substring_decontam_hand_computed(spark, tmp_path):
    """docs_exact_substring_decontam on a planted-contamination fixture:
    the benchmark doc (src0) holds c0..c19; train doc 10 (src1) shares
    c0..c9 (one 10-token contaminated span), train doc 30 (src2) shares
    c5..c19 (15 tokens). Docs 40/41 share a 10-token span WITH EACH
    OTHER but not with the benchmark — the asymmetric join must ignore
    intra-corpus duplication entirely. Per-source rollup and the DuckDB
    string-window oracle must agree exactly."""
    c = [f"c{i}" for i in range(20)]
    e = [f"e{i}" for i in range(10)]
    bench = "q0 q1 q2 " + " ".join(c) + " q3 q4"
    a = "a0 a1 a2 " + " ".join(c[:10]) + " a3 a4 a5"          # 16 tokens
    b = " ".join(f"b{i}" for i in range(10))                   # clean, 10
    dd = "d0 d1 " + " ".join(e) + " d2"                        # 13
    ee = "d3 d4 " + " ".join(e) + " d5"                        # 13
    cc = "g0 " + " ".join(c[5:20]) + " g1 g2"                  # 18
    rows = [
        (0, bench, "en", "src0", len(bench)),
        (10, a, "en", "src1", len(a)),
        (20, b, "en", "src1", len(b)),
        (40, dd, "en", "src1", len(dd)),
        (41, ee, "en", "src1", len(ee)),
        (30, cc, "en", "src2", len(cc)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = [
        (r.source, r.n_docs, r.n_flagged, r.n_spans, r.contam_tokens, r.contam_bp)
        for r in qlib._REGISTRY["docs_exact_substring_decontam"](
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == [
        ("src1", 4, 1, 1, 10, 10 * 10000 // (16 + 10 + 13 + 13)),
        ("src2", 1, 1, 1, 15, 15 * 10000 // 18),
    ]
    assert got == _oracle_rows(
        "docs_exact_substring_decontam", str(tmp_path), ["documents"]
    )


def test_neyman_allocation_hand_computed(spark, tmp_path):
    """orders_neyman_allocation on a hand fixture with closed-form
    strata: A = {9.00, 11.00} x2 (n=4, sd 100 cents, w = 4*100 = 400),
    B = {5.00} x4 (sd 0, w 0), C = {0.00, 20.00} x2 (sd 1000, w 4000).
    T = 4400; quotas 90.909 / 0 / 909.09 -> bases 90/0/909, leftover 1
    goes to the largest remainder (A: 4000 vs C: 400 vs B: 0). Exact
    allocations (91, 0, 909) sum to the budget; DuckDB must agree."""
    import datetime as dt

    segs = {"AA": [9.0, 11.0, 9.0, 11.0], "BB": [5.0] * 4,
            "CC": [0.0, 20.0, 0.0, 20.0]}
    cust, orders, ck, ok = [], [], 0, 0
    for seg, vals in segs.items():
        cust.append((ck, f"c{ck}", seg))
        for v in vals:
            orders.append((ok, ck, v, dt.datetime(2020, 1, 1)))
            ok += 1
        ck += 1
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_mktsegment string"
    ).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    got = {
        r.segment: (r.n_orders, r.neyman_w_cents, r.alloc_n, r.rate_bp)
        for r in qlib._REGISTRY["orders_neyman_allocation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        "AA": (4, 400, 91, 91 * 10000 // 4),
        "BB": (4, 0, 0, 0),
        "CC": (4, 4000, 909, 909 * 10000 // 4),
    }
    assert sum(v[2] for v in got.values()) == 1000
    ora = _oracle_rows("orders_neyman_allocation", str(tmp_path),
                       ["orders", "customer"])
    assert sorted((k, *v) for k, v in got.items()) == ora


def test_neyman_allocation_constant_strata_equal_split(spark, tmp_path):
    """All-constant strata (every Neyman weight 0) must degrade to
    EQUAL largest-remainder apportionment, not divide by zero: 3
    constant segments split 1000 as 334/333/333 (leftover to the
    lexicographically smallest on tied remainders), in both engines."""
    import datetime as dt

    cust = [(i, f"c{i}", s) for i, s in enumerate(["AA", "BB", "CC"])]
    orders = [
        (i * 10 + j, i, 5.0, dt.datetime(2020, 1, 1))
        for i in range(3)
        for j in range(4)
    ]
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_mktsegment string"
    ).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    got = {
        r.segment: r.alloc_n
        for r in qlib._REGISTRY["orders_neyman_allocation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {"AA": 334, "BB": 333, "CC": 333}
    ora = _oracle_rows("orders_neyman_allocation", str(tmp_path),
                       ["orders", "customer"])
    assert [(k, v[3]) for k, v in
            sorted((r[0], r) for r in ora)] == [
        ("AA", 334), ("BB", 333), ("CC", 333)]


def test_similarity_total_on_zero_vectors(spark):
    """A single all-zero embedding must not abort similarity jobs under
    Spark's default ANSI mode (r12 review finding, verified live as a
    DIVIDE_BY_ZERO crash): zero-norm rows score NULL via try_divide in
    the shared cosine helpers and sort out of every desc top-k."""
    from mini_lakehouse_control_plane_executor_spark.operators import (
        similarity as SIM,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [2.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") == 0)
    rows = SIM.brute_force_topk(df, "vec_id", "embedding", q, k=3).collect()
    ids = [r.c_id for r in rows]
    # the zero vector scores NULL and sorts after every real similarity
    assert ids[:2] == [3, 2] or ids[:2] == [2, 3]
    assert all(r.sim is not None for r in rows if r.c_id in (2, 3))


def test_simhash_short_docs_emit_no_pairs(spark, tmp_path):
    """Documents shorter than the shingle width have NO features; the
    r12 review verified they previously all collapsed onto the all-zero
    fingerprint and were reported pairwise as hamming-0 near-dups
    (quadratic false pairs). They must now be dropped — consistent with
    the MinHash path and with the oracle's shingles CTE, which always
    excluded them."""
    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D

    rows = [
        (1, "hello world", "en", "s", 11),
        (3, "x y", "en", "s", 3),
        (4, "quantum entanglement", "en", "s", 20),
        (5, "a b c d e f g h i j k l m n o p", "en", "s", 31),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = D.simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    assert got == []


def test_gopher_repetition_gates_hand_computed(spark, tmp_path):
    """Pin the repetition-gate arithmetic on crafted docs (the synthetic
    corpus has near-zero dup-n signal, so parity alone under-tests the
    dup path):

    - doc 0: 'a b c d e a b c d e x' — the 5-gram 'a b c d e' occurs
      twice, covering word positions 1..10 of 11; every word is 1 char,
      so dup_5 = 10000*10 div 11 = 9090.
    - doc 1: 'a a a a a a a' — all three 5-gram occurrences are the
      same gram; coverage is an interval UNION (all 7 positions =
      10000), not an occurrence sum (15/7 of the chars would exceed 1).
    - doc 0 top_2: 'a b' occurs twice (as do 3 other grams; 'a b' wins
      the lexicographic tie-break), chars = 2*2 of 11 -> 3636.
    """
    rows = [
        (0, "a b c d e a b c d e x", "en", "s", 21),
        (1, "a a a a a a a", "en", "s", 13),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r.source, r.gate): (r.n_docs, r.n_fail, r.bp_sum)
        for r in qlib._REGISTRY["gopher_repetition_gates"](
            spark, str(tmp_path)
        ).collect()
    }
    # doc0 dup_5 = 9090, doc1 dup_5 = 10000 (union, not 15/7 of chars)
    assert got[("s", "dup_5")] == (2, 2, 19090)
    # doc1's 7 positions are all covered at n=6 (two identical 6-grams);
    # doc0 has no duplicated 6-gram.
    assert got[("s", "dup_6")] == (2, 1, 10000)
    # n=7: doc1 has exactly ONE 7-gram — no duplication; n=8..10: no
    # n-grams at all -> bp 0 by contract.
    assert got[("s", "dup_7")] == (2, 0, 0)
    assert got[("s", "dup_8")] == (2, 0, 0)
    assert got[("s", "dup_10")] == (2, 0, 0)
    # doc0 top_2: max count 2, tie-broken to 'a b' (3 chars incl space
    # -> 2 word chars) = 10000*2*2 div 11 = 3636; doc1 top_2: 'a a' x6
    # = 10000*6*2 div 7 = 17142 (fails the 2000 bp threshold).
    assert got[("s", "top_2")] == (2, 2, 3636 + 17142)
    ora = {
        (s, g): (nd, nf, bp)
        for s, g, nd, nf, bp in _oracle_rows(
            "gopher_repetition_gates", str(tmp_path), ["documents"]
        )
    }
    assert ora == got


def test_unigram_lm_em_hand_computed(spark, tmp_path):
    """Pin the Viterbi hard-EM on a corpus where the best segmentations
    are hand-derivable: 'aa' must segment as 'a a' (two cheap singles
    beat one rare pair) while 'abab' must survive as one piece (the
    4-char piece beats every split under seed costs). A 20-char word is
    excluded from training by the length cap. Costs are checked to the
    exact micro-nat against math.log. DuckDB oracle must agree."""
    import math

    text = "aa aa aa b abab abab abab " + "a" * 20
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = [
        (r.em_round, r.piece, r.piece_count, r.cost_mnat)
        for r in qlib._REGISTRY["unigram_lm_em_learn"](spark, str(tmp_path)).collect()
    ]
    mn = lambda t, c: round(math.log(t / c) * 1e6)
    # E-step under seed costs: 'aa' -> 'a a' (2x a = 2407946 beats
    # aa = 2590267), 'abab' -> 'abab' (2590267 beats ab+ab = 3794240
    # and a+b+a+b = 5893884); the 20-a word contributes nothing.
    r1 = [
        (1, "a", 6, mn(10, 6)),
        (1, "abab", 3, mn(10, 3)),
        (1, "b", 1, mn(10, 1)),
    ]
    # Round 2 re-segments under round-1 costs; choices are stable.
    r2 = [(2, p, c, w) for (_r, p, c, w) in r1]
    assert got == r1 + r2
    assert got == _oracle_rows(
        "unigram_lm_em_learn", str(tmp_path), ["documents"]
    )


def test_seasonal_decomposition_densifies_gap_days(spark, tmp_path):
    """A zero-event day is DATA: the dense series must include it (a
    window over sparse rows would silently span >7 calendar days).
    11 days (Mon Jan 6 .. Thu Jan 16, 2020) with day index 4 (Fri
    Jan 10) absent: full windows exist for days 4..8 (index 3..7),
    the gap day carries c=0 with its own detrended value, and the
    run's arithmetic is hand-checked. DuckDB oracle must agree."""
    import datetime as dt

    # counts per day index 0..10; index 4 has NO rows at all
    counts = [2, 3, 4, 5, 0, 6, 7, 1, 2, 3, 4]
    rows, eid = [], 0
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, dt.datetime(2020, 1, 6 + day, 12, 0), eid, "t", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        r.day.day: (r.n_events, r.trend_sum7, r.detrended_x7, r.weekday)
        for r in qlib._REGISTRY["events_seasonal_decomposition"](
            spark, str(tmp_path)
        ).collect()
    }
    # full windows at day index 3..7 = Jan 9..13
    assert sorted(got) == [9, 10, 11, 12, 13]
    # Jan 10 (index 4) is the GAP day: c=0, window = idx1..7 = 3+4+5+0+6+7+1
    assert got[10] == (0, 26, -26, 4)  # Friday
    # Jan 9 (index 3): c=5, window idx0..6 = 2+3+4+5+0+6+7 = 27 -> r7 = 35-27
    assert got[9] == (5, 27, 8, 3)
    ora = _oracle_rows(
        "events_seasonal_decomposition", str(tmp_path), ["events"]
    )
    assert [(r[0].day, r[1], r[2], r[3], r[4]) for r in ora] == [
        (d, got[d][0], got[d][1], got[d][2], got[d][3]) for d in sorted(got)
    ]


def test_pii_scan_hand_computed(spark, tmp_path):
    """The synthetic corpus is PII-free, so this fixture is the
    behavioral pin: crafted docs with email/url/phone/ipv4 (and
    overlaps with plain text) must produce identical match counts and
    matched-char sums in BOTH regex dialects (Java vs RE2 — the
    patterns are restricted to their intersection)."""
    rows = [
        (0, "contact Bob.Smith+spam@Example.COM or visit https://x.io/a?b=1 now",
         "en", "s1", 64),
        (1, "call 555-123-4567 or 555.987.6543; server at 10.0.255.7 ok",
         "en", "s1", 58),
        (2, "no pii here just words", "en", "s2", 22),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.source: (
            r.n_docs, r.docs_with_pii, r.n_email, r.n_url, r.n_phone,
            r.n_ipv4, r.pii_chars,
        )
        for r in qlib._REGISTRY["docs_pii_scan"](spark, str(tmp_path)).collect()
    }
    # doc0: email 'bob.smith+spam@example.com' (26 ch), url
    # 'https://x.io/a?b=1' (18 ch). doc1: two phones (12 ch each),
    # one ipv4 '10.0.255.7' (10 ch).
    assert got["s1"] == (2, 2, 1, 1, 2, 1, 26 + 18 + 24 + 10)
    assert got["s2"] == (1, 0, 0, 0, 0, 0, 0)
    ora = {
        r[0]: tuple(r[1:8])
        for r in _oracle_rows("docs_pii_scan", str(tmp_path), ["documents"])
    }
    assert ora == got


def test_jaccard_pairs_distinct_on_pair(spark):
    """minhash_tuning_matrix derives n_candidates and n_verified from
    ONE aggregate over a LEFT join against the jaccard_pairs truth
    table (count(*) + count(marker)); that rewrite is equivalent to the
    former count + left_semi pair ONLY while the truth side is unique
    on (id1, id2) — a duplicate truth row would fan candidates out and
    silently inflate both counts for every band setting. Pin the
    invariant on a duplicate-heavy corpus (verbatim copies, so the
    exact path emits plenty of qualifying pairs)."""
    from mini_lakehouse_control_plane_executor_spark.operators import dedup as D

    base = (
        qlib._load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    dup = base
    for i in (1, 2):
        dup = dup.unionByName(
            base.select(
                (F.col("doc_id") + F.lit(i * 10000)).cast("long").alias("doc_id"),
                "text",
            )
        )
    arrays = D.shingle_arrays(dup, "doc_id", "text", 3)
    ex = D.exploded_shingles(dup, "doc_id", "text", 3, arrays=arrays)
    truth = D.jaccard_pairs(
        dup, "doc_id", "text", 3, 0.8, shingles=ex, arrays=arrays
    ).select("id1", "id2")
    n = truth.count()
    # verbatim copies alone contribute 40 groups x C(3,2) = 120 pairs
    assert n >= 120
    assert truth.distinct().count() == n
