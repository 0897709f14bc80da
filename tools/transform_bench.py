"""Transform-path (incremental assignment) bench — VERDICT r4 directive #8.

`SparkEntityResolver.transform` / `assign_new` (G16) is the steady-state
operation of a production deployment: a fitted state sits in a table and
new conversations arrive in batches. It has correctness tests but no
scale number. This runner:

  1. fits on a `n_families`-family corpus (the 40k ladder point);
  2. derives the fitted state ONCE (as a long-running service would);
  3. assigns `batch_families` NEW families' turns against it at two
     batch sizes (half and full), reporting wall / CPU / turns/s for
     each — the half:full wall ratio is the O(batch) evidence (a path
     that secretly rescales with STATE size would show ~flat walls).

New conversations are corpus_distributed families with ids offset past
the fitted range: same generator, disjoint anchors, so the honest
expectation is assigned=False for all of them (they are genuinely new
entities) — the bench measures the path's cost, not its recall, which
tests/test_refine.py::test_assign_new_conversations covers. A replayed
slice of FITTED families (same fam ids, member ids shifted) is added as
10% of each batch so the assigned=True path executes too.

Usage: python tools/transform_bench.py <cores> <n_families> <batch_families>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from linear_ladder import _tree_cpu_sec  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_fam = int(sys.argv[2])
    batch_fam = int(sys.argv[3])

    from pyspark.sql import functions as F

    from entity_resolver_spark import SparkEntityResolver
    from entity_resolver_spark.datagen import corpus_distributed
    from entity_resolver_spark.session import get_spark, warm_up

    spark = get_spark(app_name="transform_bench", cores=cores)
    warm_up(spark)

    turns = corpus_distributed(spark, n_fam).localCheckpoint(eager=True)
    n_fit_turns = turns.count()

    t0 = time.time()
    res = SparkEntityResolver().fit(spark, turns)
    fit_wall = round(time.time() - t0, 1)

    # force the one-time fitted-state derivation OUT of the batch timing
    # (a service derives it once per fit, not once per batch)
    t0 = time.time()
    _ = res.transform(spark, corpus_distributed(spark, 10).limit(1))
    _.count()
    state_wall = round(time.time() - t0, 1)

    def batch(n: int):
        # new families: fam ids PAST the fitted range — the anchor token
        # derives from the fam id alone, so an overlapping id range
        # would share rare blocking keys with fitted families and the
        # batch would not be "genuinely new". Replay slice: first 10%
        # of the batch are FITTED families' member-0 conversations
        # under fresh conv_ids (exercises the assigned=True path).
        new = (
            corpus_distributed(spark, n_fam + n)
            .where(F.col("conv_id") >= f"f{n_fam:07d}")
            .withColumn("conv_id", F.concat(F.lit("new_"), "conv_id"))
        )
        replay = (
            turns.where(F.col("conv_id").endswith("_m0"))
            .join(
                spark.range(max(1, n // 10)).select(
                    F.format_string("f%07d_m0", "id").alias("conv_id")
                ),
                "conv_id",
            )
            .withColumn("conv_id", F.concat(F.lit("rep_"), "conv_id"))
        )
        return new.unionByName(replay).localCheckpoint(eager=True)

    out = {
        "cores": cores,
        "fit_families": n_fam,
        "fit_turns": n_fit_turns,
        "fit_wall_sec": fit_wall,
        "fitted_state_derive_sec": state_wall,
        "batches": [],
    }
    for n in (batch_fam // 2, batch_fam):
        b = batch(n)
        nb = b.count()
        c0 = _tree_cpu_sec()
        t0 = time.time()
        assigned = res.transform(spark, b)
        counts = assigned.agg(
            F.count("*").alias("n"),
            F.sum(F.col("assigned").cast("int")).alias("n_assigned"),
        ).first()
        wall = round(time.time() - t0, 1)
        out["batches"].append(
            {
                "batch_families": n,
                "batch_turns": nb,
                "wall_sec": wall,
                "cpu_sec": round(_tree_cpu_sec() - c0, 1),
                "turns_per_sec": round(nb / wall, 1),
                "conversations": counts["n"],
                "assigned_true": counts["n_assigned"],
            }
        )
    b0, b1 = out["batches"]
    out["wall_ratio_full_vs_half"] = round(b1["wall_sec"] / max(b0["wall_sec"], 0.1), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
