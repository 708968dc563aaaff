#!/usr/bin/env python
"""Scale-ladder self-bench: run the bench.py headline set at sf0.1 AND
at the locally-synthesized sf1 (scale_build.py, 10x rows) and report the
wall-time ratio per query.

This turns every SURVEY "100 TB shape" argument into a measurement: a
query whose plan is scale-correct (shuffles keyed, broadcasts bounded,
no per-pair blowup) should grow ~linearly in input size on a fixed
local[32] box — a superlinear ratio flags a plan whose cost is driven by
something other than the data (pair joins, driver collects, global
sorts).

Interpreting the ratio: 10x rows on UNCHANGED parallelism would be 10x
work, but sf0.1 timings are dominated by fixed per-query overhead
(query planning, stage scheduling, Python<->JVM round trips — the
observed floor is ~0.3-0.5s/query however small the input), so healthy
ratios land well UNDER 10x. The red line used here is 15x (vs a 10x
data increase) to leave headroom for cache effects; anything above it
gets investigated in SCALE.md.

Writes SCALE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import time

from bench import HEADLINE

from mini_lakehouse_control_plane_executor_spark import queries as qlib
from mini_lakehouse_control_plane_executor_spark.session import get_spark

SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = os.environ.get("SPARK_GRAFT_SCALE_OUT", "/root/repo/.scale/sf1")
PASSES = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2"))
RED_LINE = 15.0

# SPARK_GRAFT_SCALE_SET=full runs EVERY registered query (not just the
# bench headline) and writes SCALE_FULL.md. Exclusions are explicit and
# logged in the artifact — never silent (the no-silent-caps discipline):
# these are the documented QUADRATIC exact baselines whose scale path is
# a different registered query; measuring them at sf1 measures the
# quadratic by design, not a plan regression.
SCALE_SET = os.environ.get("SPARK_GRAFT_SCALE_SET", "headline")
FULL_EXCLUDED = {
    "dedup_jaccard_pairs": (
        "exact quadratic shingle self-join baseline; scale path = "
        "dedup_minhash_lsh (banded LSH)"
    ),
    "embedding_neardup_exact": (
        "exact pairwise cosine baseline; scale path = "
        "embedding_neardup_lsh (hyperplane banding)"
    ),
    "dedup_weighted_jaccard_exact": (
        "exact quadratic weighted-element self-join baseline; scale "
        "path = dedup_weighted_minhash (banded LSH over the same "
        "expanded universe)"
    ),
}


# SPARK_GRAFT_SCALE_SET=dup measures the DUPLICATE-SKEW GUARDS on their
# adversarial input: 10x VERBATIM copies (scale_build's .scale/sf1dup
# for documents; the main .scale/sf1 already keeps embedding vectors
# verbatim). Without the guards each verbatim copy lands in every one of
# its band/chunk/prefix buckets, so the blocking self-joins pay d² per
# duplicate group — pre-guard this measured 45x (semantic_dedup_clusters)
# and 31x (hard_negative_mining_lsh) wall ratios for 10x data. With the
# guards the banding runs on distinct texts/signatures/vectors and the
# ratio should be output-bound.
DUP_SET: dict[str, str] = {
    # text-side guards -> verbatim-copy documents
    "dedup_exact": "dup",
    "dedup_minhash_lsh": "dup",
    "dedup_simhash_pairs": "dup",
    "containment_dedup_pairs": "dup",
    "dedup_cluster_size_histogram": "dup",
    # winnowing's df-gate [2,8] IS its duplicate-skew guard: 10 verbatim
    # copies push every shared fingerprint past max-df, so the pair join
    # sees zero duplicate-family work (measured 0.9x on this input).
    "winnowing_dup_pairs": "dup",
    # r8: the weighted pipeline rides the same signature-collapse guard
    # (identical expanded-element multisets -> identical signatures ->
    # one rep per group in the band join).
    "dedup_weighted_minhash": "dup",
    # r9 (the r8 verdict's task 6): the pair-pass CONSUMERS — one
    # guarded pair pass reduced to per-doc max-sim + a broadcast sweep.
    # Their exposure is the pair pass's, but the reduction itself must
    # also absorb the contractually quadratic pair volume (C(d,2) rows
    # per duplicated doc into the max aggregate), which is what the
    # ladder checks.
    "dedup_token_savings": "dup",
    # r10 (the r9 verdict's task 2): the band-marginal histogram now
    # rides a shingle-set collapse with ARITHMETIC count expansion —
    # unlike the pair emitters its output is a constant 4 rows, so its
    # ratio here bounds pure guard join work (no output-growth term).
    "dedup_band_marginal_recall": "dup",
    # r11/r12 document-universe additions (rows first spliced manually;
    # registered here so future dup-ladder rebuilds cover them): MG and
    # KMV have no pair geometry (counts collapse linearly); the
    # ExactSubstr pair uses the winnowing-style df-gate, its savings
    # twin rides the same gate; langid is map-only scoring.
    "docs_token_heavy_hitters_mg": "dup",
    "source_shingle_overlap_kmv": "dup",
    "docs_exact_substring_dup": "dup",
    "docs_exact_substring_savings": "dup",
    "docs_langid_nb_confusion": "dup",
    # embedding-side guards -> the main sf1 (vectors already verbatim)
    "embedding_neardup_lsh": "big",
    "semantic_dedup_clusters": "big",
    "hard_negative_mining_lsh": "big",
    "dedup_semdedup_prune": "big",
}
DUP_DIR = os.environ.get("SPARK_GRAFT_SCALE_OUT_DUP", "/root/repo/.scale/sf1dup")

# SPARK_GRAFT_SCALE_SET=dup100 is the dup ladder at duplicate
# multiplicity d=100 (scale_build's .scale/sf1dup100: 100 VERBATIM
# copies of the first-10% slice — total rows stay 10x sf0.1, the d²
# exposure rises 100x). The guards' claim is d² -> linear join work;
# at d=100 an unguarded plan pays 100x the guarded one where the d=10
# ladder only shows 10x. Both documents and embeddings live in the one
# twin dir, so every DUP_SET query routes there. Note the pair-emitting
# queries' OUTPUT is inherently quadratic in group size (~C(100,2) =
# 4950 member pairs per base doc) — ratios bound guard join work plus
# that contractual output growth, which is why the red line stays at
# the shared 15x rather than something near 1x.
DUP100_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_OUT_DUP100", "/root/repo/.scale/sf1dup100"
)


def query_set(registry) -> list[str]:
    if SCALE_SET == "full":
        return [n for n in registry if n not in FULL_EXCLUDED]
    if SCALE_SET in ("dup", "dup100"):
        return [n for n in DUP_SET if n in registry]
    return [n for n in HEADLINE if n in registry]


def run_set(spark, registry, names, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    # warmup pass (untimed), then min of PASSES timed passes — same
    # methodology as bench.py (min-of-N beats mean under co-tenant noise)
    for timed in [False] + [True] * PASSES:
        for name in names:
            fn = registry.get(name)
            if fn is None:
                continue
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            if timed:
                times[name] = min(times.get(name, elapsed), elapsed)
            spark.catalog.clearCache()
    return times


def main() -> None:
    spark = get_spark("scale-ladder")
    registry = qlib.all_queries()
    names = query_set(registry)
    small = run_set(spark, registry, names, SMALL)
    if SCALE_SET == "dup":
        dup_names = [n for n in names if DUP_SET[n] == "dup"]
        big_names = [n for n in names if DUP_SET[n] == "big"]
        big = run_set(spark, registry, dup_names, DUP_DIR)
        big.update(run_set(spark, registry, big_names, BIG))
    elif SCALE_SET == "dup100":
        big = run_set(spark, registry, names, DUP100_DIR)
    else:
        big = run_set(spark, registry, names, BIG)
    rows = []
    for name in names:
        if name in small and name in big:
            r = big[name] / small[name] if small[name] else float("inf")
            rows.append((name, small[name], big[name], r))
    rows.sort(key=lambda t: -t[3])

    out_file = {
        "full": "SCALE_FULL.md", "dup": "SCALE_DUP.md",
        "dup100": "SCALE_DUP100.md",
    }.get(SCALE_SET, "SCALE.md")
    title = {
        "full": "# SCALE_FULL.md — full-registry scale ladder (sf0.1 -> sf1)",
        "dup": (
            "# SCALE_DUP.md — duplicate-skew guard ladder "
            "(sf0.1 -> 10x VERBATIM copies)"
        ),
        "dup100": (
            "# SCALE_DUP100.md — duplicate-skew guard ladder at d=100 "
            "(sf0.1 -> 100 VERBATIM copies of the first-10% slice)"
        ),
    }.get(SCALE_SET, "# SCALE.md — scale-ladder self-bench (sf0.1 -> sf1)")
    if SCALE_SET == "dup":
        data_line = (
            f"Data: `{SMALL}` vs 10x VERBATIM copies — `{DUP_DIR}` for the "
            "text queries (id shift only, NO token suffixing), the main "
            f"`{BIG}` for the embedding queries (its vectors are already "
            "verbatim copies). This is the adversarial input for the "
            "duplicate-skew guards: without them each copy lands in every "
            "one of its band/chunk/prefix buckets and the blocking "
            "self-joins pay d² per duplicate group (pre-guard: 45x "
            "semantic_dedup_clusters, 31x hard_negative_mining_lsh, 9x "
            "embedding_neardup_lsh on this input). Note the OUTPUT of the "
            "pair queries is itself quadratic in duplicate-group size "
            "(100x rows at d=10) — ratios here bound the guard's join "
            "work plus that inherent output growth. Min-of-%d after "
            "warmup per scale." % PASSES
        )
    elif SCALE_SET == "dup100":
        data_line = (
            f"Data: `{SMALL}` vs `{DUP100_DIR}` — 100 VERBATIM copies of "
            "the first-10%% document AND embedding slices (total rows "
            "stay 10x sf0.1, duplicate-group multiplicity rises 10 -> "
            "100; built by scale_build.py). The guards' claim is d² -> "
            "linear join work: at d=100 an unguarded blocking join pays "
            "100x the guarded one where the d=10 ladder only exposes "
            "10x. The pair-emitting queries' OUTPUT is contractually "
            "quadratic in group size (C(100,2)=4950 member pairs per "
            "base doc), so ratios here bound guard join work PLUS that "
            "output growth. Min-of-%d after warmup per scale." % PASSES
        )
    else:
        data_line = (
            f"Data: `{SMALL}` vs `{BIG}` (built by `scale_build.py`: 10 "
            "key-shifted copies of every fact table; bounded dims kept; "
            "document text token-suffixed per copy so near-dup cluster "
            "sizes stay constant — see its docstring). 10x rows, fixed "
            "local[32] box, min-of-%d after warmup per scale." % PASSES
        )
    lines = [
        title,
        "",
        data_line,
        "",
        "A scale-correct plan on a fixed box grows ~linearly in input "
        "size; sf0.1 timings carry ~0.3-0.5s fixed per-query overhead "
        "(planning, scheduling), so healthy ratios land well under "
        "10x. Red line: %.0fx." % RED_LINE,
        "",
        "| query | sf0.1 s | sf1 s | ratio |",
        "|---|---|---|---|",
    ]
    for name, s, b, r in rows:
        flag = " **<- over red line**" if r > RED_LINE else ""
        lines.append(f"| {name} | {s:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    tot_s = sum(s for _, s, _, _ in rows)
    tot_b = sum(b for _, _, b, _ in rows)
    lines += [
        f"| **total** | **{tot_s:.2f}** | **{tot_b:.2f}** | "
        f"**{tot_b / tot_s:.1f}x** |",
        "",
    ]
    if SCALE_SET == "full" and FULL_EXCLUDED:
        lines += ["Excluded (explicit, never silent):", ""]
        for name, why in sorted(FULL_EXCLUDED.items()):
            lines.append(f"- `{name}` — {why}")
        lines.append("")
    with open(out_file, "w") as fh:
        fh.write("\n".join(lines))
    print(
        json.dumps(
            {
                "metric": "scale_ladder_ratio",
                "value": round(tot_b / tot_s, 2),
                "unit": "x (sf1/sf0.1 wall)",
                "queries": {n: round(r, 2) for n, _, _, r in rows},
            }
        )
    )


if __name__ == "__main__":
    main()
