"""Embedding similarity search over `array<float>` columns.

Two paths, matching how ANN is actually deployed:

- **Brute-force cosine top-k** — the exact baseline. The query set is
  broadcast (it is small by construction); the corpus streams through a
  single narrow stage: no shuffle of the big side, embarrassingly
  parallel, the right answer at any scale where k·|Q| fits per task.
- **Hyperplane-LSH buckets** — the scale path. Sign-bit signatures
  against P deterministic hyperplanes put near-neighbors in the same
  bucket with high probability; the top-k search then only touches
  same-bucket candidates (one hash-shuffle instead of |Q|×|C| work).

Hyperplanes are derived from md5 (not an RNG), so signatures — and
therefore results — are bit-identical across engines and runs, which is
what makes the DuckDB oracle possible.

Vector math uses built-in higher-order functions (zip_with/aggregate):
JVM-side, no Python UDF in the hot path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

N_PLANES = 16


def _spread(df: DataFrame) -> DataFrame:
    """Spread a scan up to cluster parallelism when it
    under-parallelizes: a single input split would run a CPU-heavy
    vector map pass (plane signs, centroid argmax, PQ encode — all
    interpreted HOFs) on ONE core. A no-op when splits >= cores, so
    nothing extra moves at scale; the spread is RoundRobinPartitioning,
    which the plan-shape pins (hash-exchange key allow-lists) ignore."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    return df


def _spread_persist(df: DataFrame) -> DataFrame:
    """Corpus-side prep for the banded-LSH pipelines: ``_spread`` then
    persist — the vector table is consumed by the band-key build AND
    the verification re-joins."""
    return _spread(df).persist(StorageLevel.MEMORY_AND_DISK)


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane(p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane p: component j is derived
    from md5(f"plane:{p}:{j}") mapped into [-1, 1]."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"plane:{p}:{j}".encode()).hexdigest()[:15]
        out.append((int(h, 16) % 2001 - 1000) / 1000.0)
    return out


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [hyperplane(p, dim) for p in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p set iff vec·plane_p > 0."""
    v = _as_double(vec)
    out = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(c) for c in plane])
        out = out + F.when(dot(v, lit_plane) > 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0)
        )
    return out


def _paired_sim() -> Column:
    """cosine(q, c) with the norms read from per-row attributes computed
    BEFORE the join — per pair only the dot product and one divide
    remain (vs 3 full array passes when norms are re-derived per pair).
    The arithmetic (dot / (nq · nc), then round) is identical to
    ``cosine``, so results are bit-equal to the naive form. try_divide
    makes every consumer TOTAL on zero-norm vectors (sim NULL — sorts
    out of every desc top-k window): under Spark's default ANSI mode a
    single all-zero embedding would otherwise abort the whole job with
    DIVIDE_BY_ZERO (the ivf_assign guard, applied at the shared helper
    instead of per operator)."""
    return F.round(
        F.try_divide(
            dot(F.col("q_vec"), F.col("c_vec")), F.col("q_nrm") * F.col("c_nrm")
        ),
        6,
    )


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.
    ``queries`` must have columns (id_col, vec_col); it is broadcast.
    Self-matches (same id) are excluded. Ties break on corpus id after
    rounding, so ranking is engine-independent."""
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm(F.col("q_vec")))
    c = df.select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_nrm", norm(F.col("c_vec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", _paired_sim().alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = N_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. At 100 TB the bucket join replaces the full cross join; the
    recall/latency trade is tuned by n_planes."""
    planes = hyperplanes(n_planes, dim)
    c = df.select(
        F.col(id_col).alias("c_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("c_nrm", norm(F.col("c_vec")))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("q_nrm", norm(F.col("q_vec")))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", _paired_sim().alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def _centroid_array(c_tab: DataFrame) -> DataFrame:
    """Collapse the (cent_id, cent_vec, cent_nrm) table into ONE row
    holding a cent_id-sorted array of centroid structs, for broadcast
    into a map-only argmax (`_nearest_centroid`). Centroid counts are
    small by construction (IVF list count ~ sqrt(|corpus|) at most, 16
    here), so the single collected row is bounded."""
    return c_tab.agg(
        F.array_sort(
            F.collect_list(F.struct("cent_id", "cent_vec", "cent_nrm"))
        ).alias("cents")
    )


def _nearest_centroid(vec: str, nrm: str) -> Column:
    """Argmax over the broadcast `cents` array: cosine rounded to 6dp,
    ties to the LOWEST cent_id (strict > over the id-ascending array =
    first max wins — identical to the old max_by on (sim, -cent_id)).
    Pure per-row expression: assignment needs NO explode and NO shuffle,
    vs the former crossJoin+groupBy(c_id) which shuffled the whole
    corpus once per assignment — the difference between a map stage and
    a corpus-wide exchange at 100 TB."""
    scored = F.transform(
        F.col("cents"),
        lambda x: F.struct(
            F.round(
                F.try_divide(dot(F.col(vec), x["cent_vec"]), F.col(nrm) * x["cent_nrm"]), 6
            ).alias("sim"),
            x["cent_id"].alias("cent_id"),
        ),
    )
    return F.aggregate(
        scored,
        F.struct(
            F.lit(-2.0).cast("double").alias("sim"),
            F.lit(None).cast("long").alias("cent_id"),
        ),
        lambda acc, x: F.when(x["sim"] > acc["sim"], x).otherwise(acc),
        lambda acc: acc["cent_id"],
    )


def _probe_cent_ids(vec: str, nrm: str, n_probe: int) -> Column:
    """Top-``n_probe`` centroid ids for one query row, as a pure
    expression over the broadcast `cents` array — the probe-selection
    twin of `_nearest_centroid`: cosine rounded to 6dp, descending,
    ties to the LOWEST cent_id (explicit comparator — identical order
    to the former row_number window over (qsim DESC, cent_id)), sliced
    to ``n_probe``. Probe selection this way needs NO extra centroid
    scan, NO second broadcast shape, and NO window shuffle — it rides
    the same one-row array the assignment argmax already broadcasts
    (3 fewer jobs per query at bench scale; at 100 TB it removes a
    |queries|-row exchange and an entire broadcast build)."""
    scored = F.transform(
        F.col("cents"),
        lambda x: F.struct(
            F.round(
                F.try_divide(dot(F.col(vec), x["cent_vec"]), F.col(nrm) * x["cent_nrm"]), 6
            ).alias("sim"),
            x["cent_id"].alias("cent_id"),
        ),
    )
    ordered = F.array_sort(
        scored,
        lambda l, r: (
            F.when(l["sim"] > r["sim"], -1)
            .when(l["sim"] < r["sim"], 1)
            .when(l["cent_id"] < r["cent_id"], -1)
            .when(l["cent_id"] > r["cent_id"], 1)
            .otherwise(0)
        ),
    )
    return F.transform(F.slice(ordered, 1, n_probe), lambda x: x["cent_id"])


def kmeans_refine(
    corpus: DataFrame, centroids: DataFrame, dim: int, n_iters: int = 1
) -> DataFrame:
    """Lloyd iterations over (c_id, c_vec, c_nrm) corpus and
    (cent_id, cent_vec, cent_nrm) centroids: assign each vector to its
    nearest (cosine) centroid, recompute centroids as the element-wise
    mean of their members (empty clusters drop out).

    Fully deterministic and therefore oracle-checkable: assignment sims
    round to 6dp with cent_id tie-break, and every mean component rounds
    to 6dp — absorbing float summation-order noise so Spark and the SQL
    twin produce bit-identical centroids.

    Scale shape per iteration: assignment is a map-only argmax against
    the broadcast centroid array (`_nearest_centroid` — no explode, no
    shuffle), then ONE groupBy with ``dim`` scalar avg aggregates —
    map-side partial aggregation means the shuffle carries
    n_centroids·dim partial sums per task, NOT the corpus (an earlier
    crossJoin+groupBy(c_id) formulation shuffled the full corpus per
    iteration; a posexplode one shuffled |corpus|·dim rows)."""
    for _ in range(n_iters):
        assigned = (
            corpus.crossJoin(F.broadcast(_centroid_array(centroids)))
            .select(
                _nearest_centroid("c_vec", "c_nrm").alias("cent_id"), "c_vec"
            )
        )
        centroids = (
            assigned.groupBy("cent_id")
            .agg(
                *[
                    F.round(F.avg(F.col("c_vec")[i]), 6).alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .select(
                "cent_id",
                F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("cent_vec"),
            )
            .withColumn("cent_nrm", norm(F.col("cent_vec")))
        )
    return centroids


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_iters: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is bucketed by
    nearest centroid; each query probes only its ``n_probe`` nearest
    centroid lists. Centroids are real k-means: deterministic seeding
    (first ``n_centroids`` vectors by id) refined by ``n_iters`` Lloyd
    iterations (``kmeans_refine``) — still exactly oracle-checkable.

    Scale shape: assignment is a MAP-ONLY argmax against the broadcast
    centroid array (no shuffle of the corpus — see `_nearest_centroid`);
    the probe join is broadcast; the only data shuffle is the per-query
    top-k window over |corpus|·n_probe/n_centroids candidates.

    Bench-constant note (r5 profile, sf0.1): the embeddings table at
    bench SF is 2k rows, so wall-clock there is ~90% Catalyst
    plan+codegen of the two wide expression trees (the dim-component
    mean aggregate in `kmeans_refine` ~1.3s, the n_centroids×dim argmax
    scan ~1.1s measured standalone; the data pass itself is
    milliseconds). That one-time compile constant is what moved
    BENCH_r04 over r02 (+0.4s) when assignment switched from
    crossJoin+groupBy to the broadcast argmax — the trade removes a
    corpus-wide shuffle PER QUERY at scale, where the constant
    amortizes to nothing. Do not "fix" this by shrinking the
    expressions back into a shuffle."""
    corpus = df.select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_nrm", norm(F.col("c_vec")))
    seed = df.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), _as_double(F.col(vec_col)).alias("cent_vec")
    ).withColumn("cent_nrm", norm(F.col("cent_vec")))
    if n_iters > 0:
        # dim is a PLAN parameter (it unrolls the per-component mean
        # aggregate); callers that know it (e.g. from a parquet footer
        # probe) pass it to avoid a one-scalar Spark job here.
        if dim is None:
            dim = df.select(F.size(vec_col)).first()[0]
        # Persist: c_tab feeds BOTH the corpus assignment and the query
        # probes; without the cache the whole k-means subplan is inlined
        # (planned, compiled, executed) twice.
        c_tab = kmeans_refine(corpus, seed, dim, n_iters).persist()
    else:
        c_tab = seed
    # ONE persisted one-row centroid array feeds BOTH broadcast sites
    # (corpus assignment + query probe selection) — same shared-aux
    # discipline as ivfpq_topk.
    cent_arr = _centroid_array(c_tab).persist(StorageLevel.MEMORY_AND_DISK)
    assigned = (
        corpus.crossJoin(F.broadcast(cent_arr))
        .select(
            "c_id",
            "c_vec",
            "c_nrm",
            _nearest_centroid("c_vec", "c_nrm").alias("cent_id"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm(F.col("q_vec")))
    probes = q.crossJoin(F.broadcast(cent_arr)).select(
        "q_id",
        "q_vec",
        "q_nrm",
        F.explode(_probe_cent_ids("q_vec", "q_nrm", n_probe)).alias("cent_id"),
    )
    scored = (
        assigned.join(F.broadcast(probes), "cent_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", _paired_sim().alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def brute_force_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    broadcast_cap_rows: int = 200_000,
) -> DataFrame:
    """Exact cosine pairs (id1 < id2, sim ≥ threshold). Quadratic — the
    correctness baseline for ``neardup_pairs``; at scale use the
    LSH-blocked variant.

    The non-equi pairing plans as a BroadcastNestedLoopJoin; one side
    is explicitly broadcast and the STREAM side is spread up to cluster
    parallelism when the scan under-parallelizes (a single input split
    would otherwise evaluate all O(n²) cosine folds on ONE core —
    measured 41s -> ~2s at sf0.1; a no-op when splits >= cores).

    The broadcast hint is GATED on ``broadcast_cap_rows`` (default
    200k rows ~ tens of MB of doubles — comfortably inside the 8 GB
    broadcast hard limit and typical driver heaps): an unconditional
    hint would override the planner and OOM the driver on a large
    input instead of degrading. Above the cap the hint is dropped and
    the planner picks its own nested-loop strategy (and the caller
    should really be on ``neardup_pairs``). The probe is a
    short-circuiting ``limit(cap+1).count()`` — one cheap job."""
    v = df.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))
    sc = df.sparkSession.sparkContext
    stream = v
    if stream.rdd.getNumPartitions() < sc.defaultParallelism:
        stream = stream.repartition(sc.defaultParallelism)
    l = stream.alias("l")
    small = v.limit(broadcast_cap_rows + 1).count() <= broadcast_cap_rows
    r = (F.broadcast(v) if small else v).alias("r")
    sim = F.round(
        F.try_divide(dot(F.col("l.vec"), F.col("r.vec")), F.col("l.nrm") * F.col("r.nrm")), 6
    )
    return (
        l.join(r, F.col("l.vid") < F.col("r.vid"))
        .select(
            F.col("l.vid").alias("id1"),
            F.col("r.vid").alias("id2"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def _band_keys(vec_col: str, planes, bands: int, rows_per_band: int) -> Column:
    """Array of per-band sign-LSH bucket keys: bit i of band b's key is
    sign(vec · plane[b·r+i]) — the AND-construction inside each band,
    OR'd across bands by the caller's posexplode + equi-join."""
    return F.array(
        *[
            sum(
                (
                    F.when(
                        dot(
                            F.col(vec_col),
                            F.array(*[F.lit(c) for c in planes[b * rows_per_band + i]]),
                        )
                        > 0,
                        F.lit(1 << i),
                    ).otherwise(F.lit(0))
                    for i in range(rows_per_band)
                ),
                F.lit(0),
            )
            for b in range(bands)
        ]
    )


def neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 4,
    rows_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, sim ≥ threshold)
    via BANDED hyperplane-LSH blocking + exact verification of the
    candidates — the OR-construction MinHash banding uses, applied to
    sign-LSH. A pair collides if it agrees on ALL rows_per_band sign
    bits of ANY band: P(candidate) = 1-(1-p^r)^b for per-plane agreement
    p = 1-θ/π, so recall at a given cosine is tuned by (b, r) — a single
    wide bucket (the AND-only construction) loses recall exponentially
    in plane count.

    100 TB shape: ``collapse_identical`` first (exact duplicates
    otherwise cost d² inside the band self-join — see its docstring),
    then a self-join keyed (band, band_key) over distinct-vector REPS —
    sum of per-bucket squares over DISTINCT vectors, never
    corpus-squared; candidates are distinct'd as bare id pairs BEFORE
    vectors are re-joined for verification, so the banded explosion
    never carries the embedding payload. Qualifying rep pairs expand to
    member pairs LAST: cross pairs via two member joins (sim computed
    once per distinct-vector pair, shared by every copy pair), internal
    pairs of each ≥2 duplicate group at the vector's self-similarity.
    The OUTPUT is still every qualifying member pair — quadratic in
    duplicate-group size because the pair contract demands it — but the
    join work is linear in it, not d²-inflated before it."""
    planes = hyperplanes(bands * rows_per_band, dim)
    vm = collapse_identical(df, id_col, vec_col)
    reps = vm.filter(F.col("doc_id") == F.col("rep")).select(
        "doc_id", "vec", "nrm", "gsize"
    )
    bk = reps.select(
        "doc_id",
        F.posexplode(_band_keys("vec", planes, bands, rows_per_band)).alias(
            "band", "bk"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    l = bk.alias("l")
    r = bk.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bk") == F.col("r.bk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id1"), F.col("r.doc_id").alias("id2"))
        .distinct()
    )
    a = reps.select(F.col("doc_id").alias("id1"), F.col("vec").alias("v1"), F.col("nrm").alias("n1"))
    b_ = reps.select(F.col("doc_id").alias("id2"), F.col("vec").alias("v2"), F.col("nrm").alias("n2"))
    sim = F.round(dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6)
    rep_pairs = (
        cands.join(a, "id1")
        .join(b_, "id2")
        .select("id1", "id2", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
    # ONE expansion pass for both pair kinds (the lsh_candidates /
    # containment_pairs self-pair fusion): same-vector groups enter as
    # rep-level SELF pairs at their self-similarity; after the member
    # joins the (id1 != id2) | (m1 < m2) filter keeps every cross-group
    # expansion (members of distinct groups are distinct docs) and
    # exactly one orientation of each same-group member pair.
    self_sim = F.round(
        F.try_divide(dot(F.col("vec"), F.col("vec")), F.col("nrm") * F.col("nrm")), 6
    )
    self_reps = reps.filter((F.col("gsize") >= 2) & (self_sim >= threshold)).select(
        F.col("doc_id").alias("id1"),
        F.col("doc_id").alias("id2"),
        self_sim.alias("sim"),
    )
    m1 = vm.select(F.col("rep").alias("id1"), F.col("doc_id").alias("m1"))
    m2 = vm.select(F.col("rep").alias("id2"), F.col("doc_id").alias("m2"))
    return (
        rep_pairs.unionByName(self_reps)
        .join(m1, "id1")
        .join(m2, "id2")
        .filter((F.col("id1") != F.col("id2")) | (F.col("m1") < F.col("m2")))
        .select(
            F.least("m1", "m2").alias("id1"),
            F.greatest("m1", "m2").alias("id2"),
            "sim",
        )
    )


def collapse_identical(
    df: DataFrame, id_col: str, vec_col: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Exact-duplicate collapse — the stage every near-dup pipeline
    should run BEFORE LSH banding. One window pass groups rows whose
    (vector, *extra_cols) are identical, electing the min-id member as
    representative; the returned (persisted) frame carries every input
    row with its ``rep`` and the group size ``gsize``, so callers slice
    out members (``doc_id, rep``) and reps (``doc_id == rep``) from the
    same materialization.

    Why this is load-bearing at 100 TB: banded-LSH candidate generation
    costs Σ_buckets |bucket|², and exact duplicates land EVERY copy in
    EVERY one of its bands' buckets — d copies of one vector inflate the
    self-join by d². Duplicate-heavy corpora are precisely what dedup
    passes are pointed at (measured: 10× verbatim copies sent the
    sf0.1→sf1 scale ratio of the un-collapsed cluster pipeline to 45×).
    Collapsing first makes the banding see each distinct vector once —
    identical vectors have identical band keys and identical cosines, so
    rep-level candidacy/similarity is EXACTLY member-level candidacy/
    similarity and group structure re-expands linearly at the output
    stage (equivalence pinned on duplicate-heavy data in
    tests/test_operator_invariants.py). Cost when there are NO
    duplicates: the one vec-keyed exchange this window adds — the price
    a real pipeline pays anyway to run its exact-dedup stage."""
    v = _spread(
        df.select(
            F.col(id_col).alias("doc_id"),
            *[F.col(c).alias(c) for c in extra_cols],
            _as_double(F.col(vec_col)).alias("vec"),
        ).withColumn("nrm", norm(F.col("vec")))
    )
    w = Window.partitionBy("vec", *[F.col(c) for c in extra_cols])
    return v.select(
        "doc_id",
        *extra_cols,
        "vec",
        "nrm",
        F.min("doc_id").over(w).alias("rep"),
        F.count(F.lit(1)).over(w).alias("gsize"),
    ).persist(StorageLevel.MEMORY_AND_DISK)


def neardup_components(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 4,
    rows_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Semantic near-dup CLUSTER assignment: (doc_id, root) for every
    vector belonging to a cluster of ≥2 members, where clusters are
    connected components of the banded-LSH pair graph ``neardup_pairs``
    describes and root is the smallest member id (the SemDeDup keep-id
    convention).

    Shape: ``collapse_identical`` first (see its docstring — duplicate
    groups otherwise cost d² in the band self-join AND multiply the
    component fixpoint's edge list), then the rep-level banded pair
    graph plus one self-edge per ≥2-member duplicate group (its members
    are mutual near-dups at sim 1.0 whenever the threshold admits a
    vector's self-similarity — same filter expression as real pairs, so
    degenerate zero-norm vectors behave identically either way), then
    the pointer-doubling fixpoint over REP nodes only, and a final
    linear member→root expansion. With d duplicate copies per vector the
    component loop's input shrinks d²-fold vs member-level pairs; with
    no duplicates the plan degenerates to exactly the member-level one
    plus the collapse window."""
    planes = hyperplanes(bands * rows_per_band, dim)
    vm = collapse_identical(df, id_col, vec_col)
    reps = vm.filter(F.col("doc_id") == F.col("rep")).select(
        "doc_id", "vec", "nrm", "gsize"
    )
    bk = reps.select(
        "doc_id",
        F.posexplode(_band_keys("vec", planes, bands, rows_per_band)).alias(
            "band", "bk"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    l = bk.alias("l")
    r = bk.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bk") == F.col("r.bk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id1"), F.col("r.doc_id").alias("id2"))
        .distinct()
    )
    a = reps.select(
        F.col("doc_id").alias("id1"), F.col("vec").alias("v1"), F.col("nrm").alias("n1")
    )
    b_ = reps.select(
        F.col("doc_id").alias("id2"), F.col("vec").alias("v2"), F.col("nrm").alias("n2")
    )
    sim = F.round(dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6)
    edges = (
        cands.join(a, "id1")
        .join(b_, "id2")
        .select("id1", "id2", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("id1", "id2")
    )
    self_sim = F.round(
        F.try_divide(dot(F.col("vec"), F.col("vec")), F.col("nrm") * F.col("nrm")), 6
    )
    self_edges = (
        reps.filter((F.col("gsize") >= 2) & (self_sim >= threshold))
        .select(F.col("doc_id").alias("id1"), F.col("doc_id").alias("id2"))
    )
    from .dedup import connected_components

    comp = connected_components(edges.unionByName(self_edges))
    return (
        vm.select("doc_id", "rep")
        .join(comp.select(F.col("id").alias("rep"), "root"), "rep")
        .select("doc_id", "root")
    )


def lsh_hard_negatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Corpus-scale hard-negative mining: for EVERY vector, the top-k
    most-similar vectors with a different label, candidates restricted
    to banded sign-LSH bucket collisions — the scale path the
    brute-force ``hard_negative_mining`` query documents for anchor
    sets too large to broadcast (its contract allows broadcast anchors
    only). Hard negatives are by definition high-cosine pairs, which is
    exactly what LSH buckets surface, so the approximation loses only
    low-similarity (easy) negatives.

    100 TB shape mirrors ``neardup_pairs``: ``collapse_identical`` on
    (vector, label) first — duplicate copies otherwise cost d² in the
    band self-join, and every copy of an anchor recomputes the SAME
    candidate list — then one (band, key) equi self-join over bare REP
    ids (directed — both (a,b) and (b,a) survive, since each side is
    someone's anchor), distinct BEFORE the vectors re-join,
    label-mismatch applied with the verification join, a rep-level
    rank()≤k cut (ties kept: any group that could reach the expanded
    top-k has sim ≥ the k-th rep sim, so the cut is lossless), candidate
    groups expanded to member ids for the exact (sim desc, c_id)
    row_number, and anchors expanded LAST — every member of an anchor
    group shares the finished top-k list verbatim. No broadcast of the
    anchor set, no all-pairs anywhere; skew is bounded by
    distinct-vector bucket density."""
    planes = hyperplanes(bands * rows_per_band, dim)
    vm = collapse_identical(df, id_col, vec_col, extra_cols=(label_col,))
    reps = vm.filter(F.col("doc_id") == F.col("rep")).select(
        F.col("doc_id").alias("vid"), F.col(label_col).alias("lbl"), "vec", "nrm"
    )
    bk = reps.select(
        "vid",
        F.posexplode(_band_keys("vec", planes, bands, rows_per_band)).alias(
            "band", "bk"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    l = bk.alias("l")
    r = bk.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bk") == F.col("r.bk"))
            & (F.col("l.vid") != F.col("r.vid")),
        )
        .select(F.col("l.vid").alias("q_rep"), F.col("r.vid").alias("c_rep"))
        .distinct()
    )
    qa = reps.select(
        F.col("vid").alias("q_rep"),
        F.col("lbl").alias("q_lbl"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    cb = reps.select(
        F.col("vid").alias("c_rep"),
        F.col("lbl").alias("c_lbl"),
        F.col("vec").alias("c_vec"),
        F.col("nrm").alias("c_nrm"),
    )
    sim = F.round(
        F.try_divide(dot(F.col("q_vec"), F.col("c_vec")), F.col("q_nrm") * F.col("c_nrm")), 6
    )
    wg = Window.partitionBy("q_rep").orderBy(F.col("sim").desc())
    top_groups = (
        cands.join(qa, "q_rep")
        .join(cb, "c_rep")
        .filter(F.col("q_lbl") != F.col("c_lbl"))
        .select("q_rep", "c_rep", sim.alias("sim"))
        .withColumn("g_rank", F.rank().over(wg))
        .filter(F.col("g_rank") <= k)
        .select("q_rep", "c_rep", "sim")
    )
    cm = vm.select(F.col("rep").alias("c_rep"), F.col("doc_id").alias("c_id"))
    wr = Window.partitionBy("q_rep").orderBy(F.col("sim").desc(), F.col("c_id"))
    ranked = (
        top_groups.join(cm, "c_rep")
        .withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= k)
    )
    qm = vm.select(F.col("rep").alias("q_rep"), F.col("doc_id").alias("q_id"))
    return ranked.join(qm, "q_rep").select("q_id", "c_id", "sim", "rank")


def lsh_decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    bands: int = 4,
    rows_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-space decontamination: for each TRAIN vector, the max
    cosine to any EVAL vector among banded sign-LSH bucket collisions —
    the embedding counterpart of n-gram decontamination (a train doc
    paraphrasing an eval doc shares no 8-gram but sits next to it in
    embedding space). Returns (t_id, max_eval_sim, n_eval_hits,
    flagged) for train vectors with ≥1 colliding eval candidate;
    ``flagged`` = max_eval_sim ≥ threshold.

    100 TB shape: the eval side is usually tiny but is NOT assumed
    broadcastable — both sides band into the same (band, key) space and
    meet in ONE equi join whose cost is the sum of per-bucket
    train×eval products; candidates are distinct'd as bare id pairs
    before the vectors re-join. Same blocking recall argument as
    near-dup: contamination IS high-cosine, which is what buckets
    surface."""
    planes = hyperplanes(bands * rows_per_band, dim)

    def _bk(df: DataFrame, tag: str) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(f"{tag}_id"), _as_double(F.col(vec_col)).alias("vec")
        )
        return v.select(
            f"{tag}_id",
            F.posexplode(_band_keys("vec", planes, bands, rows_per_band)).alias(
                "band", "bk"
            ),
        )

    cands = (
        _bk(train, "t")
        .join(_bk(evalset, "e"), ["band", "bk"])
        .select("t_id", "e_id")
        .distinct()
    )
    tv = train.select(
        F.col(id_col).alias("t_id"), _as_double(F.col(vec_col)).alias("t_vec")
    ).withColumn("t_nrm", norm(F.col("t_vec")))
    ev = evalset.select(
        F.col(id_col).alias("e_id"), _as_double(F.col(vec_col)).alias("e_vec")
    ).withColumn("e_nrm", norm(F.col("e_vec")))
    sim = F.round(
        F.try_divide(dot(F.col("t_vec"), F.col("e_vec")), F.col("t_nrm") * F.col("e_nrm")), 6
    )
    return (
        cands.join(tv, "t_id")
        .join(ev, "e_id")
        .select("t_id", sim.alias("sim"))
        .groupBy("t_id")
        .agg(
            F.max("sim").alias("max_eval_sim"),
            F.count(F.lit(1)).alias("n_eval_hits"),
        )
        .withColumn("flagged", F.col("max_eval_sim") >= F.lit(threshold))
    )


def matmul_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched BLAS: the vectorized twin of
    ``brute_force_topk`` with identical output. The query matrix (q×d,
    small by construction) ships to every task; each ``mapInPandas``
    batch computes one float64 GEMM (b×d @ d×q) and keeps only its local
    top-k per query under the global comparator (sim DESC, c_id ASC) —
    so the union of per-batch winners provably contains the global
    top-k, and the final window touches k·batches rows, not |C|·|Q|.

    This is the scale path when |C|·|Q| pair enumeration dominates: one
    narrow Arrow stage at memory bandwidth instead of per-pair
    higher-order-function evaluation, then a negligible final top-k.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).collect()  # query set: small by contract (same contract as broadcast)
    q_ids = np.array([r["q_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype=np.float64)
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))

    out_schema = "q_id long, c_id long, sim double"

    def _score(batches):
        for pdf in batches:
            ids = pdf["c_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["c_vec"]), dtype=np.float64)
            if len(ids) == 0:
                continue
            c_nrm = np.sqrt((c_mat * c_mat).sum(axis=1))
            sims = (c_mat @ q_mat.T) / np.outer(c_nrm, q_nrm)  # b×q
            parts = []
            for j in range(len(q_ids)):
                col = sims[:, j]
                mask = ids != q_ids[j]  # exclude self-match
                cand_ids = ids[mask]
                # Round BEFORE selecting: ranking is defined on the
                # 6-dp-rounded sim (ties → c_id), and the per-batch
                # comparator must equal the global one for the batch
                # winners to provably contain the global top-k.
                cand = np.round(col[mask], 6)
                if len(cand) == 0:
                    continue
                kk = min(k, len(cand))
                # top-k under (sim DESC, c_id ASC): lexsort on
                # (-sim, c_id) gives exactly the global comparator.
                order = np.lexsort((cand_ids, -cand))[:kk]
                parts.append(
                    pd.DataFrame(
                        {
                            "q_id": np.full(kk, q_ids[j]),
                            "c_id": cand_ids[order],
                            "sim": cand[order],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    c = df.select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    cand = c.mapInPandas(_score, out_schema).withColumn("sim", F.round("sim", 6))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------


def _sub(vec: Column, m: int, sub_dim: int) -> Column:
    """Subspace m's slice of a vector (1-based F.slice)."""
    return F.slice(vec, m * sub_dim + 1, sub_dim)


def _l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    df: DataFrame, id_col: str, vec_col: str, n_sub: int, sub_dim: int, n_codes: int
) -> DataFrame:
    """One-row broadcastable PQ codebook: for each of ``n_sub``
    subspaces, a code_id-sorted array of (code_id, cv) structs. Codes
    are the subvectors of the first ``n_codes`` vectors by id — the
    deterministic seeding discipline of ``ivf_topk`` (n_iters=0), so the
    index build is exactly oracle-checkable; ``kmeans_refine`` per
    subspace would drop in the same way IVF's does."""
    seed = df.filter(F.col(id_col) < n_codes).select(
        F.col(id_col).alias("code_id"), _as_double(F.col(vec_col)).alias("v")
    )
    def _nrm2(cv):
        return F.aggregate(cv, F.lit(0.0), lambda acc, x: acc + x * x)

    return seed.agg(
        *[
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "code_id",
                        _sub(F.col("v"), m, sub_dim).alias("cv"),
                        _nrm2(_sub(F.col("v"), m, sub_dim)).alias("nrm2"),
                    )
                )
            ).alias(f"book{m}")
            for m in range(n_sub)
        ]
    )


def _pq_code(sub_vec: Column, book: Column) -> Column:
    """Argmin-L2 code for one subvector against one subspace's codebook
    array: squared distance rounded to 6dp, strict < over the
    id-ascending array means ties go to the LOWEST code_id — the same
    determinism contract as `_nearest_centroid`."""
    scored = F.transform(
        book,
        lambda x: F.struct(
            F.round(_l2sq(sub_vec, x["cv"]), 6).alias("dist"),
            x["code_id"].alias("code_id"),
        ),
    )
    return F.aggregate(
        scored,
        F.struct(
            F.lit(float("inf")).cast("double").alias("dist"),
            F.lit(None).cast("long").alias("code_id"),
        ),
        lambda acc, x: F.when(x["dist"] < acc["dist"], x).otherwise(acc),
        lambda acc: acc["code_id"],
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
) -> DataFrame:
    """PQ-ADC approximate top-k: the corpus is compressed to ``n_sub``
    small integer codes per vector (argmin-L2 per subspace against the
    codebook — here 4×3 bits instead of 64 floats, the memory-bandwidth
    lever of every large ANN index), and each query scores candidates
    ASYMMETRICALLY: exact query subvectors against reconstructed
    (decoded) corpus subvectors, cosine = Σ_m q_m·c_m / (|q|·|ĉ|).

    Scale shape: the codebook is ONE broadcast row; encoding is a
    map-only pass (no shuffle, no explode — the `_nearest_centroid`
    argmax discipline per subspace); scoring broadcasts the small query
    set and streams the CODES (n_sub longs per row, not the vectors);
    the only shuffle is the per-query top-k window. A production ADC
    would precompute the per-query n_sub×n_codes dot-product LUT —
    here the same arithmetic rides the codebook lookup expression
    (element_at on the broadcast book), which whole-stage codegen
    evaluates once per (query, code) anyway at this fan-out."""
    # The one-row codebook is broadcast at TWO sites (encode + ADC
    # scoring); persisting it makes the seed aggregate run once instead
    # of once per broadcast exchange (each broadcast is its own job).
    book = pq_codebook(df, id_col, vec_col, n_sub, sub_dim, n_codes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    base = _spread(
        df.select(F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("v"))
    )
    enc = base.crossJoin(F.broadcast(book)).select(
        "c_id",
        *[
            _pq_code(_sub(F.col("v"), m, sub_dim), F.col(f"book{m}")).alias(f"code{m}")
            for m in range(n_sub)
        ],
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm(F.col("q_vec")))
    adot = sum(
        (
            dot(
                _sub(F.col("q_vec"), m, sub_dim),
                F.element_at(F.col(f"book{m}"), F.col(f"code{m}").cast("int") + 1)[
                    "cv"
                ],
            )
            for m in range(n_sub)
        ),
        start=F.lit(0.0),
    )
    # |ĉ|² is an O(1) codebook lookup (nrm2 precomputed per code), not
    # a re-derivation from the vectors.
    cnorm2 = sum(
        (
            F.element_at(F.col(f"book{m}"), F.col(f"code{m}").cast("int") + 1)["nrm2"]
            for m in range(n_sub)
        ),
        start=F.lit(0.0),
    )
    scored = (
        enc.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(book))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(F.try_divide(adot, F.col("q_nrm") * F.sqrt(cnorm2)), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
) -> DataFrame:
    """IVF-PQ: the production ANN index shape — IVF pruning picks which
    lists a query touches (``n_probe`` of ``n_centroids``), PQ-ADC
    scoring decides within them, so the search reads ~n_probe/n_centroids
    of the corpus AND only codes, never raw vectors. Raw-vector PQ (no
    residual encoding) keeps the index build exactly oracle-checkable;
    FAISS's by_residual variant would drop in by subtracting the
    assigned centroid before ``_pq_code``.

    Scale shape: one map-only pass computes BOTH the centroid argmax
    assignment and the PQ codes (centroid table and codebook are each
    ONE broadcast row); probes broadcast; the scoring join is an equi
    join on cent_id against the code table; the only data shuffle is
    the per-query top-k window."""
    # ONE persisted one-row auxiliary table carrying the centroid array
    # AND the PQ codebook, built by ONE aggregate over ONE seed scan
    # (conditional collect_list per part — collect_list drops the
    # non-matching NULLs): the encode pass and the ADC scoring pass each
    # broadcast it, and every broadcast exchange is a separate job — a
    # shared cached row turns 3 seed-aggregate jobs over 2 scans (book
    # at two sites, centroid array at one) into 1 job over 1 scan.
    seed = (
        df.filter(F.col(id_col) < max(n_centroids, n_codes))
        .select(F.col(id_col).alias("sid"), _as_double(F.col(vec_col)).alias("sv"))
        .withColumn("snrm", norm(F.col("sv")))
    )

    def _nrm2(cv):
        return F.aggregate(cv, F.lit(0.0), lambda acc, x: acc + x * x)

    aux = seed.agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("sid") < n_centroids,
                    F.struct(
                        F.col("sid").alias("cent_id"),
                        F.col("sv").alias("cent_vec"),
                        F.col("snrm").alias("cent_nrm"),
                    ),
                )
            )
        ).alias("cents"),
        *[
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("sid") < n_codes,
                        F.struct(
                            F.col("sid").alias("code_id"),
                            _sub(F.col("sv"), m, sub_dim).alias("cv"),
                            _nrm2(_sub(F.col("sv"), m, sub_dim)).alias("nrm2"),
                        ),
                    )
                )
            ).alias(f"book{m}")
            for m in range(n_sub)
        ],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    base = _spread(
        df.select(F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("v"))
    ).withColumn("c_nrm", norm(F.col("v")))
    enc = (
        base.withColumnsRenamed({"v": "c_vec"})
        .crossJoin(F.broadcast(aux))
        .select(
            "c_id",
            _nearest_centroid("c_vec", "c_nrm").alias("cent_id"),
            *[
                _pq_code(_sub(F.col("c_vec"), m, sub_dim), F.col(f"book{m}")).alias(
                    f"code{m}"
                )
                for m in range(n_sub)
            ],
        )
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm(F.col("q_vec")))
    # Probe selection rides the SAME persisted aux row the encode pass
    # broadcasts (`_probe_cent_ids` — no second centroid scan, no
    # probe-window shuffle).
    probes = q.crossJoin(F.broadcast(aux.select("cents"))).select(
        "q_id",
        "q_vec",
        "q_nrm",
        F.explode(_probe_cent_ids("q_vec", "q_nrm", n_probe)).alias("cent_id"),
    )
    adot = sum(
        (
            dot(
                _sub(F.col("q_vec"), m, sub_dim),
                F.element_at(F.col(f"book{m}"), F.col(f"code{m}").cast("int") + 1)[
                    "cv"
                ],
            )
            for m in range(n_sub)
        ),
        start=F.lit(0.0),
    )
    cnorm2 = sum(
        (
            F.element_at(F.col(f"book{m}"), F.col(f"code{m}").cast("int") + 1)["nrm2"]
            for m in range(n_sub)
        ),
        start=F.lit(0.0),
    )
    scored = (
        enc.join(F.broadcast(probes), "cent_id")
        .crossJoin(F.broadcast(aux.drop("cents")))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(F.try_divide(adot, F.col("q_nrm") * F.sqrt(cnorm2)), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def ivfpq_residual_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
) -> DataFrame:
    """Residual-encoded IVF-PQ (FAISS's ``by_residual`` default for L2
    indexes, Jégou 2011 §IV): PQ codes quantize ``v - centroid(assigned)``
    instead of the raw vector, so the codebook covers the residual
    cloud around each list's centroid — a finer quantizer at the
    IDENTICAL code budget (same n_sub × n_codes) whenever lists are
    tight around their centroids. Scoring RECONSTRUCTS
    ĉ = centroid + decoded-residual and ranks by cosine(q, ĉ) — the
    asymmetric-distance form of the same paper. Whether the residual
    payoff materializes is an EMPIRICAL question per corpus/budget —
    ``ann_recall_matrix`` measures it side-by-side with the raw-vector
    variant (on the synthetic near-uniform embeddings with untrained
    seed codebooks, raw wins; on clustered production embeddings with
    k-means-trained books, residual is the published default for a
    reason — ``kmeans_refine`` drops into both builds the same way).

    Scale shape (same discipline as ``ivfpq_topk``): the centroid table
    and residual codebook are each ONE broadcast row (the codebook
    build adds one extra tiny seed job because residuals need the
    assignment first — a build-time-only cost); encoding is one
    map-only pass whose shared residual subexpression is LET-BOUND via
    the single-element ``inline`` generator (CollapseProject would
    otherwise re-evaluate the centroid argmax once per PQ code — the
    r13 HOF trap); probes broadcast; the scoring join is the same
    cent_id equi-join over codes; the only data shuffle is the
    per-query top-k window."""
    seed_c = (
        df.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("sid"), _as_double(F.col(vec_col)).alias("sv"))
        .withColumn("snrm", norm(F.col("sv")))
    )
    caux = seed_c.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("sid").alias("cent_id"),
                    F.col("sv").alias("cent_vec"),
                    F.col("snrm").alias("cent_nrm"),
                )
            )
        ).alias("cents")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    def _nrm2(cv):
        return F.aggregate(cv, F.lit(0.0), lambda acc, x: acc + x * x)

    def _resid(v_col, nrm_col):
        """v − cent_vec(argmax-cosine assignment), as one expression."""
        cid = _nearest_centroid(v_col, nrm_col)
        cv = F.element_at(F.col("cents"), (cid + F.lit(1)).cast("int"))["cent_vec"]
        return F.zip_with(F.col(v_col), cv, lambda a, b: a - b)

    # Residual codebook: code m = subvector m of the first n_codes
    # vectors' RESIDUALS (the deterministic seeding discipline of
    # pq_codebook, applied post-assignment so the build is exactly
    # oracle-checkable).
    baux = (
        df.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col).alias("code_id"), _as_double(F.col(vec_col)).alias("v"))
        .withColumn("c_nrm", norm(F.col("v")))
        .crossJoin(F.broadcast(caux))
        .select("code_id", _resid("v", "c_nrm").alias("r"))
        .agg(
            *[
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "code_id",
                            _sub(F.col("r"), m, sub_dim).alias("cv"),
                            _nrm2(_sub(F.col("r"), m, sub_dim)).alias("nrm2"),
                        )
                    )
                ).alias(f"book{m}")
                for m in range(n_sub)
            ]
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    base = _spread(
        df.select(F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("v"))
    ).withColumn("c_nrm", norm(F.col("v")))
    # Encode pass: inline-of-one-struct materializes (cent_id, codes)
    # exactly once per row — cent_id feeds the residual that feeds all
    # n_sub code argmins, and without the generator barrier
    # CollapseProject would inline the whole chain into every output
    # column.
    enc_struct = F.element_at(
        F.transform(
            F.array(F.struct(_nearest_centroid("v", "c_nrm").alias("cid"))),
            lambda t: F.element_at(
                F.transform(
                    F.array(
                        F.zip_with(
                            F.col("v"),
                            F.element_at(
                                F.col("cents"), (t["cid"] + F.lit(1)).cast("int")
                            )["cent_vec"],
                            lambda a, b: a - b,
                        )
                    ),
                    lambda r: F.struct(
                        t["cid"].alias("cent_id"),
                        *[
                            _pq_code(_sub(r, m, sub_dim), F.col(f"book{m}")).alias(
                                f"code{m}"
                            )
                            for m in range(n_sub)
                        ],
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    enc = (
        base.crossJoin(F.broadcast(caux))
        .crossJoin(F.broadcast(baux))
        .select("c_id", F.inline(F.array(enc_struct)))
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm(F.col("q_vec")))
    probes = q.crossJoin(F.broadcast(caux)).select(
        "q_id",
        "q_vec",
        "q_nrm",
        F.explode(_probe_cent_ids("q_vec", "q_nrm", n_probe)).alias("cent_id"),
    )
    # ĉ = centroid + concat(decoded residual subvectors); sim is
    # let-bound over the reconstruction so the 64-dim rebuild runs once
    # per (query, candidate), not once per reference.
    recon = F.zip_with(
        F.element_at(F.col("cents"), (F.col("cent_id") + F.lit(1)).cast("int"))[
            "cent_vec"
        ],
        F.concat(
            *[
                F.element_at(F.col(f"book{m}"), F.col(f"code{m}").cast("int") + 1)[
                    "cv"
                ]
                for m in range(n_sub)
            ]
        ),
        lambda a, b: a + b,
    )
    sim = F.element_at(
        F.transform(
            F.array(recon),
            lambda r: F.round(
                F.try_divide(dot(F.col("q_vec"), r), F.col("q_nrm") * norm(r)), 6
            ),
        ),
        1,
    )
    scored = (
        enc.join(F.broadcast(probes), "cent_id")
        .crossJoin(F.broadcast(caux))
        .crossJoin(F.broadcast(baux))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", sim.alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


# embedding_covariance streams n·d² (i, j)-product rows through its
# in-stage pair aggregate. At d = 64 that is a 2,144-key aggregate fed
# by a per-row fanout of 2,080 — fine. The fanout grows QUADRATICALLY
# in dim: at d = 512 every input row becomes ~131k pair rows before the
# map-side combine, and the exchange/combine width stops being "free".
# Above this bound the right plan is a block outer product — explode to
# (block_i, block_j, array_i, array_j) tiles of ~64 dims and aggregate
# zip_with products per tile — which no current caller needs (embeddings
# tables here are d = 64). Refuse loudly instead of silently degrading.
COVARIANCE_MAX_DIM = 128


def _gram_partials(batches):
    """Per-task integer Gram partials for embedding_covariance: consume
    the task's Arrow batches of (double-cast) vectors and emit ONE tiny
    upper-triangle batch of (i, j, sxy_u, sx_u, n) integer sums —
    d(d+1)/2 rows per task regardless of corpus size.

    All hot arithmetic runs through pyarrow.compute kernels (multiply /
    round / cast / sum on whole columns); NumPy appears only for
    zero-copy buffer wraps and tiny offset math. Quantization is per
    ROW ``round((v_i * v_j) * 1e6)`` with ``half_towards_infinity`` —
    Arrow's name for round-half-away-from-zero on the exact binary
    double, which matches Spark's BigDecimal HALF_UP because a double's
    shortest-decimal form never straddles a .5 boundary relative to its
    binary value (the power_iteration_topk arbiter argument) — applied
    BEFORE any sum, in the identical operation order to the former JVM
    expression, so partials are order-free exact integers and the merge
    is a plain rollup.

    Per-dim columns come from offset+take gathers, so ragged widths and
    null LISTS fall out naturally (a missing position is a null index
    -> null element -> excluded from n and skipped by sum — exactly the
    posexplode semantics). Null ELEMENTS inside a vector raise loudly
    rather than silently diverge from the JVM null-skipping aggregate.
    Diagonal rows double as the per-dim moment table: sxy_u there IS
    sum(round(v*v*1e6)) and the i==j emission carries sx_u / n."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    HALF_UP = "half_towards_infinity"
    d_seen = 0
    SXY = np.zeros((0, 0), dtype=object)
    SX = np.zeros(0, dtype=object)
    N = np.zeros(0, dtype=object)

    def _grow(d):
        nonlocal d_seen, SXY, SX, N
        if d > d_seen:
            g = np.zeros((d, d), dtype=object)
            g[:d_seen, :d_seen] = SXY
            sx = np.zeros(d, dtype=object)
            sx[:d_seen] = SX
            n2 = np.zeros(d, dtype=object)
            n2[:d_seen] = N
            SXY, SX, N, d_seen = g, sx, n2, d

    for batch in batches:
        col = batch.column(0)
        n_rows = len(col)
        if n_rows == 0:
            continue
        if isinstance(col, pa.ChunkedArray):  # defensive; batches are flat
            col = col.combine_chunks()
        if col.flatten().null_count:
            raise ValueError(
                "embedding_covariance: null element inside a vector — "
                "clean the embedding column before the covariance pass"
            )
        # offsets index into the RAW child (col.values); flatten() would
        # compact away null slots and break offset-based gathers. Null
        # list slots have unspecified offset ranges — zero them out.
        flat = col.values
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = offs[1:] - offs[:-1]
        starts = offs[:-1]
        if col.null_count:
            lens = np.where(
                col.is_null().to_numpy(zero_copy_only=False), 0, lens
            )
        L = int(lens.max()) if n_rows else 0
        if L == 0:
            continue
        _grow(L)
        cols = []
        counts = []
        for i in range(L):
            valid = lens > i
            idx = pa.array(starts + i, mask=~valid)
            cols.append(pc.take(flat, idx))
            counts.append(int(valid.sum()))
        for i in range(L):
            N[i] += counts[i]
            SX[i] += (
                pc.sum(
                    pc.cast(
                        pc.round(pc.multiply(cols[i], 1e6), 0, round_mode=HALF_UP),
                        pa.int64(),
                    )
                ).as_py()
                or 0
            )
            for j in range(i, L):
                s = pc.sum(
                    pc.cast(
                        pc.round(
                            pc.multiply(pc.multiply(cols[i], cols[j]), 1e6),
                            0,
                            round_mode=HALF_UP,
                        ),
                        pa.int64(),
                    )
                ).as_py()
                SXY[i, j] += s or 0

    if d_seen == 0:
        return
    iu, ju = np.triu_indices(d_seen)
    diag = iu == ju
    yield pa.record_batch(
        [
            pa.array((iu + 1).astype(np.int32)),
            pa.array((ju + 1).astype(np.int32)),
            pa.array([int(SXY[a, b]) for a, b in zip(iu, ju)], type=pa.int64()),
            pa.array(
                [int(SX[a]) if d else 0 for a, d in zip(iu, diag)], type=pa.int64()
            ),
            pa.array(
                [int(N[a]) if d else 0 for a, d in zip(iu, diag)], type=pa.int64()
            ),
        ],
        names=["i", "j", "sxy_u", "sx_u", "n"],
    )


def embedding_covariance(
    df: DataFrame, id_col: str, vec_col: str, dim: int | None = None
) -> DataFrame:
    """Upper-triangle population covariance of the embedding matrix —
    the statistic a PCA / whitening transform consumes (eigen-decompose
    the collected dim x dim result on the driver; the matrix is
    dim²-sized, corpus-size independent, so collecting it is correct).

    Returns (i, j, cov, var_i, var_j) for 1 <= i <= j <= dim, computed
    one-pass from integer micro-unit sums: per-row products are
    quantized to round(v_i * v_j * 1e6) BEFORE any aggregate, so the
    distributed sums are bit-identical however partitions land, and
    cov = (Sxy/1e6 - (Sx/1e6)(Sy/1e6)/n) / n is a handful of double ops
    over exact integers — engine-portable (the s_micro discipline).

    100 TB shape (r14): ZERO corpus-sized shuffles — one Arrow
    ``mapInArrow`` pass computes each scan task's integer Gram partials
    in vectorized NumPy (only the double-cast vector column crosses the
    Python boundary; the heavy math runs on whole batches) and emits
    d(d+1)/2 rows per task; the only exchange is the (i, j) rollup of
    those ~17 KB partials, then the 64-row per-dim moment table (the
    diagonal) broadcasts twice onto the 2,144-row pair table. Replaces
    the posexplode + id-keyed self-join of the exploded 64·n-row
    stream, which at scale shuffles the corpus twice (locally it
    auto-broadcast, hiding the cost). The rejected alternative stands
    as measured: a keyless aggregate with dim(dim+1)/2 product columns
    compiles slower than it runs at dim 64 (2,144 expressions).
    Bit-exactness with the former JVM expressions is preserved by
    per-row Arrow half_towards_infinity quantization before any sum in
    the identical op order (see _gram_partials) — pinned by the numpy
    invariant test and the unchanged DuckDB oracle.

    ``dim`` (pass it when known — the queries layer probes it from the
    parquet footer for free) gates the n·d² pair fanout: dims above
    ``COVARIANCE_MAX_DIM`` raise ValueError pointing at the block
    outer-product shape instead of silently running a quadratic-width
    plan against real embedding widths. When ``dim`` is omitted, the
    guard probes ``max(size(vec))`` — an EAGER one-aggregate Spark job
    at call time (the one deliberate break from this module's
    lazy-construction contract: the guard must see the WIDEST row, a
    LIMIT-1 sample would let ragged widths smuggle a 4096-dim row past
    it), so call with an explicit ``dim`` where an extra job matters —
    an opt-in guard that only fires for callers who already thought
    about dim protects nobody."""
    if dim is None:
        probe = df.agg(
            F.max(F.size(_as_double(F.col(vec_col)))).alias("d")
        ).collect()
        dim = probe[0]["d"]
    if dim is not None and dim > COVARIANCE_MAX_DIM:
        raise ValueError(
            f"embedding_covariance: dim {dim} exceeds COVARIANCE_MAX_DIM "
            f"({COVARIANCE_MAX_DIM}) — the (i, j) pair fanout is n*d^2 rows "
            "before the map-side combine. For wide embeddings implement the "
            "block outer-product shape (tile dims into ~64-wide blocks, "
            "aggregate zip_with products per (block_i, block_j))."
        )
    agg = (
        df.select(_as_double(F.col(vec_col)).alias("v"))
        .mapInArrow(_gram_partials, "i int, j int, sxy_u long, sx_u long, n long")
        .groupBy("i", "j")
        .agg(
            F.sum("sxy_u").alias("sxy_u"),
            F.sum("sx_u").alias("sx_u"),
            F.sum("n").alias("n"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = agg.select("i", "j", "sxy_u")
    # Diagonal rows double as the per-dim moment table: sxy_u there IS
    # sum(round(v*v*1e6)) and the i==j emission carries sx_u / n.
    dims = agg.filter(F.col("i") == F.col("j")).select(
        "i", "sx_u", F.col("sxy_u").alias("sxx_u"), "n"
    )
    da = dims.select("i", F.col("sx_u").alias("sxi_u"), F.col("sxx_u").alias("sxxi_u"), "n")
    db = dims.select(
        F.col("i").alias("j"), F.col("sx_u").alias("sxj_u"), F.col("sxx_u").alias("sxxj_u")
    )
    var_of = lambda sxx, sx: (  # noqa: E731 — mirrored verbatim in the SQL oracle
        (F.col(sxx) / 1e6 - (F.col(sx) / 1e6) * (F.col(sx) / 1e6) / F.col("n"))
        / F.col("n")
    )
    return (
        pairs.join(F.broadcast(da), "i")
        .join(F.broadcast(db), "j")
        .select(
            "i",
            "j",
            (
                (
                    F.col("sxy_u") / 1e6
                    - (F.col("sxi_u") / 1e6) * (F.col("sxj_u") / 1e6) / F.col("n")
                )
                / F.col("n")
            ).alias("cov"),
            var_of("sxxi_u", "sxi_u").alias("var_i"),
            var_of("sxxj_u", "sxj_u").alias("var_j"),
        )
    )


def power_iteration_topk(
    cov: DataFrame, n_components: int = 2, iters: int = 8
) -> DataFrame:
    """Top-k eigenpairs of a symmetric matrix given as a FULL (i, j, c)
    coordinate table — power iteration with rank-1 (Hotelling)
    deflation between components, fixed rounds, engine-exact
    integer-micro-unit arithmetic (the oracle unrolls the identical
    rounds as MATERIALIZED CTEs).

    The iteration runs ON THE DRIVER over the collected coordinate
    table — deliberately: the matrix is dim²-sized and corpus-size
    INDEPENDENT (the corpus pass happened once, inside
    embedding_covariance), so the collect is bounded by contract — the
    same class as the one-row aggregates and small-by-contract query
    sets collected elsewhere. A distributed unrolled loop was built and
    measured first: 17 eager lineage-truncation jobs over a 4,096-row
    table cost ~11s of pure stage latency at ANY scale — the iteration
    is job-count-bound, not data-bound, which is the signature of work
    that belongs on the driver (the documented PCA split: cluster for
    the covariance, driver for the eigen step).

    Arithmetic mirrors the SQL oracle bit-for-bit: per-term
    round(c · v_u) quantizes through decimal HALF-AWAY-FROM-ZERO on the
    exact binary double (what both Spark's BigDecimal ROUND and
    DuckDB's round compute), integer sums, one identical double-op
    renormalization round(1e6 · w_u / sqrt(n2)) per round, and
    deflation C' = C − λ u uᵀ written as the identical left-associated
    sequence c − eig_u/1e6 · (vu_i/1e6) · (vu_j/1e6). Start vector
    all-ones (1e6 per dim) — sign-deterministic. The k-th iterate is
    the DEFINED output whether or not the eigengap has converged it;
    convergence itself is pinned on planted-spike matrices in tests.

    Returns (k, i, vu, eig_u): per component the final iterate per
    dimension plus the eigenvalue estimate ||C v||·1e6 (v is unit-norm
    after the last round, so the next image's norm IS the
    Rayleigh-style estimate).

    The result relation is created from a pyarrow Table (r15): the
    list-of-tuples ``createDataFrame`` path parallelizes PICKLED rows
    over defaultParallelism partitions, so every downstream execution
    of this dim·k-row relation launched one Python worker PER CORE just
    to unpickle ~4 rows each — and the query's orderBy executes the
    child twice (range-partitioner sampling), so the r15 profile read
    2 × 32 zero-CPU ~270 ms tasks (~17 s executor occupancy) for 128
    rows. The Arrow table decodes JVM-side in one partition: no Python
    workers, no per-core fanout, at any scale."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow as pa

    def rnd(x: float) -> int:
        return int(Decimal(x).to_integral_value(rounding=ROUND_HALF_UP))

    rows = cov.select("i", "j", "c").collect()  # dim² rows, bounded by contract
    dims = sorted({r.i for r in rows})
    adj: dict[int, list[tuple[int, float]]] = {i: [] for i in dims}
    for r in rows:
        adj[r.i].append((r.j, float(r.c)))
    out: list[tuple[int, int, int, int]] = []
    for k in range(1, n_components + 1):
        vu = {i: 1000000 for i in dims}

        def image(v: dict[int, int]) -> dict[int, int]:
            return {i: sum(rnd(c * v[j]) for j, c in adj[i]) for i in dims}

        for _ in range(iters):
            wu = image(vu)
            nrm = math.sqrt(float(sum(w * w for w in wu.values())))
            vu = {i: rnd(1e6 * wu[i] / nrm) for i in dims}
        wf = image(vu)
        eig_u = rnd(math.sqrt(float(sum(w * w for w in wf.values()))))
        out.extend((k, i, vu[i], eig_u) for i in dims)
        adj = {
            i: [
                (j, c - eig_u / 1e6 * (vu[i] / 1e6) * (vu[j] / 1e6))
                for j, c in lst
            ]
            for i, lst in adj.items()
        }
    return cov.sparkSession.createDataFrame(
        pa.table(
            {
                "k": pa.array([r[0] for r in out], pa.int32()),
                "i": pa.array([r[1] for r in out], pa.int32()),
                "vu": pa.array([r[2] for r in out], pa.int64()),
                "eig_u": pa.array([r[3] for r in out], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Streaming-safe IVF assignment
# ---------------------------------------------------------------------------


def ivf_assign(
    df: DataFrame, vec_col: str, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Assign each row's vector to its nearest centroid as a PURE ROW
    EXPRESSION — the streaming-safe form of the IVF coarse quantizer
    (the batch queries use an equivalent broadcast-join + per-vector
    window; a stream can use neither a non-time window nor an
    aggregation in append mode, and a 16-row centroid set is
    contract-bounded, so it inlines as a literal array). Tie-breaking
    matches the batch form exactly: max round(cosine, 6), then min
    cent_id — encoded as array_min over (-sim, cent_id) structs, whose
    lexicographic order IS that argmax. Works identically on a batch
    or streaming DataFrame (stream≡batch pinned in
    tests/test_streaming.py); this is the per-batch assignment step of
    an incremental index update (queries.ann_ivf_incremental_assign),
    where appended vectors are quantized without touching the
    committed corpus."""
    carr = F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("cid"),
                F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
            )
            for cid, cv in cents
        ]
    )
    v = _as_double(F.col(vec_col))
    # A zero-norm vector or centroid makes the cosine denominator 0 —
    # an ERROR under ANSI mode, so try_divide (NULL instead), and the
    # NULL must sort LAST like the batch window's desc-nulls-last:
    # struct ordering is nulls-FIRST, so coalesce to +inf on the
    # negated axis.
    scored = F.transform(
        carr,
        lambda c: F.struct(
            F.coalesce(
                -F.round(
                    F.try_divide(dot(v, c["cv"]), norm(v) * norm(c["cv"])), 6
                ),
                F.lit(float("inf")),
            ).alias("nsim"),
            c["cid"].alias("cid"),
        ),
    )
    return df.withColumn("cent_id", F.array_min(scored)["cid"])


def _sq8(vec_col: Column) -> Column:
    """Symmetric int8 scalar quantization of a vector: each component
    maps to floor(x * 127.0 / maxabs + 0.5) — round-half-up, which
    Spark's and DuckDB's floor compute identically (banker's-rounding
    `round` would not). A zero vector quantizes to zeros. Values stay
    exact small ints, so downstream dot products are EXACT int64 and
    the whole SQ8 path is oracle-checkable bit-for-bit."""
    v = _as_double(vec_col)
    maxabs = F.array_max(F.transform(v, F.abs))
    return F.when(
        maxabs == 0, F.transform(v, lambda x: F.lit(0.0))
    ).otherwise(
        F.transform(
            v, lambda x: F.floor(x * 127.0 / maxabs + 0.5).cast("double")
        )
    )


def sq8_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Approximate cosine top-k over int8 scalar-quantized vectors
    (SQ8) — the cheap 4x-compression quantization every vector store
    ships alongside PQ: per-vector symmetric scale to [-127, 127],
    integer dot products, cosine on the quantized values. Same
    broadcast/window shape as ``brute_force_topk`` (the corpus scans
    once, queries broadcast), with the quantization as a pure map
    expression — at 100 TB the corpus side would be stored
    pre-quantized and scanned at a quarter the bytes, which is the
    operator's point."""
    q = queries.select(
        F.col(id_col).alias("q_id"), _sq8(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", norm(F.col("q_vec")))
    c = df.select(
        F.col(id_col).alias("c_id"), _sq8(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_nrm", norm(F.col("c_vec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", _paired_sim().alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", F.col("rank").cast("int").alias("rank"))
    )
