"""Iterative graph algorithms as join-aggregate chains.

PageRank here is the join-based formulation every distributed engine
uses (contributions = rank/outdeg routed along edges, summed per
destination), with two scale/determinism disciplines:

- **Fixed, unrolled iterations**: each iteration is one edges⋈ranks
  join plus one dst-keyed aggregate; the rank table is node-sized, the
  edge table is persisted once and reused by every iteration.
- **Integer arithmetic throughout**: ranks live in pico-units
  (SCALE = 10^12) as BIGINT; per-edge contributions use integer
  division (r div outdeg) and the damping update is
  (85·Σcontrib) div 100 + (15·(SCALE div N)) div 100 — no float enters
  until the final display column, so the result is bit-identical to a
  DuckDB oracle regardless of summation order.

Related: connected components (pointer-doubling min-label) lives in
operators/dedup.py; this module holds the rank-propagation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12  # pico-units


def cooccurrence_edges(
    items: DataFrame,
    key_col: str,
    item_col: str,
    min_support: int = 2,
    keep_support: bool = False,
    persist: bool = False,
    distinct: bool = True,
    via: str = "arrays",
) -> DataFrame:
    """Canonical undirected co-occurrence edges from an (key, item)
    incidence list: (p1, p2) with p1 < p2 for item pairs sharing
    >= ``min_support`` keys. The ONE edge builder behind the whole
    co-occurrence family (part_cooccurrence, association_rules,
    triangle / k-core / label-propagation / components queries) — the
    same join shape was previously rebuilt inline at every call site.

    ``via="arrays"`` (default): ONE key-keyed aggregate collects each
    key's sorted distinct item set (incidence dedup comes free from
    collect_set), pairs are generated MAP-SIDE from the array
    (x-before-y combinations of a sorted array — canonical p1 < p2 by
    construction), and one (p1, p2) aggregate counts support. Two
    shuffles total, no self-join; vs the classic incidence self-join
    form (distinct + self-join + pair aggregate = three corpus
    exchanges). Requires per-key item counts bounded enough to collect
    (<= 7 lines/order in TPC-H; fine to ~10⁴) — for genuinely
    unbounded keys pass ``via="selfjoin"``, whose blow-up is the same
    per-key quadratic but streamed through a join instead of an array.

    With ``keep_support`` the per-pair key count survives as ``nord``.
    ``persist=True`` caches the edge table (MEMORY_AND_DISK) for
    multi-consumer algorithms — triangle closure reads the edges three
    times (degree, orientation, closure join); without the persist each
    consumer would recompute the corpus-sized build. Callers release it
    via Catalog.clearCache (the release_cached_intermediates
    discipline). ``distinct`` only affects the selfjoin form (arrays
    dedup inherently); False skips the incidence dedup for callers
    whose input is already (key, item)-distinct."""
    it = items.select(F.col(key_col).alias("k"), F.col(item_col).alias("p"))
    if via == "arrays":
        arrs = (
            it.groupBy("k")
            .agg(F.sort_array(F.collect_set("p")).alias("ps"))
            .filter(F.size("ps") >= 2)
        )
        pair_gen = F.expr(
            "flatten(transform(ps, (x, i) -> "
            "transform(slice(ps, i + 2, size(ps) - i - 1), "
            "y -> struct(x AS p1, y AS p2))))"
        )
        pairs = arrs.select(F.explode(pair_gen).alias("pr")).select(
            F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2")
        )
    else:
        # distinct=False skips the incidence dedup for callers whose
        # input is ALREADY (key, item)-distinct (e.g. a persisted shared
        # incidence table) — re-running it would add a redundant
        # corpus exchange.
        if distinct:
            it = it.distinct()
        a = it.alias("a")
        b = it.alias("b")
        pairs = a.join(
            b, (F.col("a.k") == F.col("b.k")) & (F.col("a.p") < F.col("b.p"))
        ).select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
    e = (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("nord"))
        .filter(F.col("nord") >= min_support)
    )
    e = e if keep_support else e.select("p1", "p2")
    if persist:
        from pyspark.storagelevel import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    return e


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = PAGERANK_SCALE,
    truncate_lineage: bool = True,
    check_dangling: bool = True,
) -> DataFrame:
    """PageRank (damping 0.85) over a directed edge table with columns
    (src, dst). Every node must have at least one out-edge (true by
    construction for undirected/bipartite doublings; dangling-mass
    redistribution is deliberately out of scope). Returns (node, r)
    with r in integer ``scale`` units.

    ``check_dangling`` (default on) enforces the no-dangling-node
    precondition at runtime with one distinct + left-anti pass over the
    persisted edge table: a dst that never appears as a src would
    silently absorb rank mass the inner node-set join then drops,
    returning wrong ranks with no error. Callers whose edges are
    symmetric by construction (undirected doublings) may pass False to
    skip the extra job.

    Plan shape per iteration: one src-keyed equi-join of the node-sized
    rank table onto the edges, one dst-keyed partial+final aggregate.
    Nothing quadratic, no windows, no driver collect.

    Iteration state is localCheckpoint'ed (the connected_components
    discipline): without it the rank lineage re-embeds every previous
    iteration's joins — each round re-executed the whole prefix and the
    3-iteration bench ran 11.5s at sf0.1; with truncation it is the
    three join+agg rounds it should be. ``truncate_lineage=False``
    swaps the checkpoints for plain persists so the full unrolled
    iteration plan stays visible to ``explain()`` — that is how
    tests/test_plan_shapes.py pins the per-iteration shape, since a
    checkpointed plan collapses to ``Scan ExistingRDD``."""

    def _cut(df: DataFrame) -> DataFrame:
        return df.localCheckpoint() if truncate_lineage else df.persist()

    edges = _cut(edges.select("src", "dst"))
    if check_dangling:
        dangling = (
            edges.select(F.col("dst").alias("node"))
            .distinct()
            .join(edges.select(F.col("src").alias("node")).distinct(), "node", "left_anti")
        )
        if not dangling.isEmpty():
            sample = [r.node for r in dangling.limit(5).collect()]
            raise ValueError(
                "pagerank requires every dst to also appear as a src "
                f"(no dangling nodes); offenders include {sample!r}. "
                "Symmetrize the edge set or pass check_dangling=False "
                "only when the invariant holds by construction."
            )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_tab = _cut(nodes.agg(F.count(F.lit(1)).alias("n")))
    # r0 = SCALE div N for every node; the (1-d)/N teleport term reuses
    # the same integer base so both constants agree with the oracle.
    ranks = (
        nodes.crossJoin(F.broadcast(n_tab))
        .select("node", F.expr(f"{scale} div n").alias("r"))
        .join(deg, F.col("node") == F.col("src"))
        .select("node", "r", "outdeg")
    )
    ranks = _cut(ranks)
    for _ in range(iterations):
        contrib = (
            edges.join(
                ranks.select(
                    F.col("node").alias("src"),
                    F.expr("r div outdeg").alias("c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ranks.select("node", "outdeg")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_tab))
            .select(
                "node",
                F.expr(
                    f"(15 * ({scale} div n)) div 100"
                    " + (85 * coalesce(s, cast(0 as bigint))) div 100"
                ).alias("r"),
                "outdeg",
            )
        )
        ranks = _cut(ranks)
    return ranks.select("node", "r")


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Triangle count + global clustering coefficient of an undirected
    graph given as CANONICAL edges (p1 < p2, no duplicates). Returns one
    row: (n_nodes, n_edges, n_wedges, n_triangles, global_clustering).

    Degree-ordered orientation (the compact-forward / MapReduce triangle
    discipline): every edge is directed from its lower-(degree, id)
    endpoint, so wedges are enumerated only at each triangle's
    LOWEST-degree vertex — per-node wedge work is O(out-degree²) with
    out-degree bounded ~sqrt(|E|) even on power-law graphs, never the
    raw hub degree. Closure is one equi-join of the wedge list against
    the canonical edge list; wedge totals come from the degree table
    (Σ d·(d−1)/2), n_edges from the handshake lemma (Σd/2) — neither is
    ever enumerated. The one-row assembly broadcasts the single-row
    triangle aggregate."""
    e = edges.select("p1", "p2").persist()
    deg = (
        e.select(F.col("p1").alias("v"))
        .unionAll(e.select(F.col("p2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    d1 = deg.select(F.col("v").alias("p1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("v").alias("p2"), F.col("d").alias("d2"))
    p1_lower = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("p1") < F.col("p2"))
    )
    ori = (
        e.join(d1, "p1")
        .join(d2, "p2")
        .select(
            F.when(p1_lower, F.col("p1")).otherwise(F.col("p2")).alias("src"),
            F.when(p1_lower, F.col("p2")).otherwise(F.col("p1")).alias("dst"),
        )
    )
    o1 = ori.alias("o1")
    o2 = ori.alias("o2")
    # Both wedge arms leave the same src, so (x, y) with x < y is the
    # id-canonical closing pair — exactly how e stores its edges.
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src")) & (F.col("o1.dst") < F.col("o2.dst")),
    ).select(F.col("o1.dst").alias("p1"), F.col("o2.dst").alias("p2"))
    tri = wedges.join(e, ["p1", "p2"]).agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"),
        F.expr("sum(d) div 2").cast("long").alias("n_edges"),
    )
    return node_stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        F.col("t").alias("n_triangles"),
        # Zero guard: a graph whose components are all single edges has
        # n_wedges = 0; clustering is defined as 0.0 there (mirrored in
        # the oracle), never NULL.
        F.when(
            F.col("n_wedges") > 0,
            F.round(F.lit(3.0) * F.col("t") / F.col("n_wedges"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("global_clustering"),
    )


def kcore_peel(edges: DataFrame, k: int = 2, rounds: int = 3) -> DataFrame:
    """Bounded-round k-core peel over CANONICAL undirected edges
    (p1 < p2): each round drops every node whose current degree is
    below k, then restricts the adjacency to surviving endpoints —
    after enough rounds the survivors are exactly the k-core (the
    maximal subgraph of minimum degree ≥ k, the standard community /
    spam-tail pruning primitive). Iterations are FIXED and unrolled
    (the pagerank discipline) so the plan is finite and oracle-twinned
    by an unrolled CTE chain; callers size ``rounds`` to their graph's
    peel depth (each round strictly shrinks or fixpoints).

    Returns (node, residual_degree) for nodes alive after ``rounds``.

    100 TB shape: per round one src-keyed degree aggregate and two
    node-keyed LEFT SEMI joins — all equi-joins on the node key, no
    wedge/pair enumeration anywhere; the adjacency is persisted per
    round (strictly shrinking), never recomputed from round 0."""
    adj = (
        edges.select(F.col("p1").alias("s"), F.col("p2").alias("d"))
        .unionAll(edges.select(F.col("p2").alias("s"), F.col("p1").alias("d")))
        .persist()
    )
    for _ in range(rounds):
        keep = (
            adj.groupBy("s")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= k)
            .select("s")
        )
        adj = (
            adj.join(keep, "s", "left_semi")
            .join(keep.withColumnRenamed("s", "d"), "d", "left_semi")
            .persist()
        )
    return adj.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("residual_degree")
    )


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan-style LPA, made
    deterministic) over canonical undirected edges (p1 < p2): every
    node starts as its own label; each round it adopts the label most
    frequent among its neighbors' CURRENT labels, ties broken toward
    the smallest label. Fixed unrolled rounds (the pagerank/kcore
    discipline) keep the plan finite and oracle-twinned by an unrolled
    CTE chain; the synchronous sweep with a total tie-break makes the
    result bit-identical in any engine (classic async LPA is
    update-order-dependent, useless against an oracle).

    Returns (node, lbl) after ``rounds``.

    100 TB shape: the symmetric adjacency is persisted once; per round
    one node-keyed equi-join routes neighbor labels and one
    (node, lbl) count + struct-max aggregate picks the winner — the
    struct max (count, -label) is partially aggregatable map-side, so
    hub nodes never need a per-node window over their full vote list.
    Labels are node ids (BIGINT); the vote table is edge-bounded."""
    adj = (
        edges.select(F.col("p1").alias("s"), F.col("p2").alias("d"))
        .unionAll(edges.select(F.col("p2").alias("s"), F.col("p1").alias("d")))
        .persist()
    )
    labels = (
        adj.select(F.col("s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for _ in range(rounds):
        votes = (
            adj.join(labels.withColumnRenamed("node", "d"), "d")
            .groupBy(F.col("s").alias("node"), F.col("lbl"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c").alias("c"), (-F.col("lbl")).alias("n"))
                ).alias("m")
            )
            .select("node", (-F.col("m.n")).alias("lbl"))
        )
    return labels


def min_label_components(edges: DataFrame, rounds: int = 6) -> DataFrame:
    """Connected components via synchronous hook+compress min-label
    propagation over canonical undirected edges (p1 < p2): every node
    starts labeled with its own id; each round it (a) HOOKs — takes the
    minimum of its label and its neighbors' current labels — then (b)
    COMPRESSes — pointer-jumps to its label's label (labels are node
    ids, so the label table joins to itself). The compress step is what
    makes convergence O(log diameter) instead of O(diameter): plain
    min-propagation needs one round per hop (measured 10 on the sf0.01
    co-occurrence graph), hook+compress closes the same graph in 6.
    Fixed unrolled rounds (the pagerank / kcore / LPA discipline) keep
    the plan finite and make the result bit-identical to an unrolled
    MATERIALIZED CTE chain in the oracle — equality holds round-for-
    round even on a pathological graph where neither engine has fully
    converged yet.

    Returns (node, lbl) after ``rounds``.

    100 TB shape: the symmetric adjacency is persisted once; per round
    one node-keyed equi-join routes neighbor labels, one node-keyed
    min aggregate folds them (partially aggregatable map-side — hub
    fan-in never materializes per-node lists), and one label-keyed
    self-join performs the jump. State is one (node, lbl) row per
    node; the label table never grows."""
    sym = edges.select(F.col("p1").alias("s"), F.col("p2").alias("d")).unionAll(
        edges.select(F.col("p2").alias("s"), F.col("p1").alias("d"))
    )
    # Self-loops fold the "own label" term into the neighbor-min
    # aggregate, so the hook step reads the label table ONCE (min over
    # {self} ∪ neighbors ≡ least(own, min(neighbors)) — same values,
    # one fewer corpus-width join per round).
    nodes = sym.select("s").distinct()
    adj = sym.unionAll(nodes.select("s", F.col("s").alias("d"))).persist()
    labels = nodes.select(
        F.col("s").alias("node"), F.col("s").alias("lbl")
    )
    for r in range(rounds):
        hooked = (
            adj.join(labels.withColumnRenamed("node", "d"), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("lbl").alias("lbl"))
        )
        a = hooked.alias("a")
        b = hooked.alias("b")
        labels = a.join(b, F.col("a.lbl") == F.col("b.node")).select(
            F.col("a.node").alias("node"), F.col("b.lbl").alias("lbl")
        )
        # Each round references the previous label table three times
        # (hook once thanks to the self-loops; compress self-joins the
        # hooked result) — without lineage truncation the logical plan
        # grows exponentially in rounds and Catalyst analysis alone
        # hangs (observed: >9min at rounds=6 on a 200-node graph). An
        # eager node-sized localCheckpoint every second round keeps the
        # plan bounded (≤9 prior-label references between truncations)
        # at half the checkpoint-job cost of per-round truncation — the
        # iterative-graph discipline (GraphFrames' connected components
        # does the same); each checkpoint is one short job, linear in
        # nodes, at any scale.
        if r % 2 == 1 or r == rounds - 1:
            labels = labels.localCheckpoint()
    return labels
