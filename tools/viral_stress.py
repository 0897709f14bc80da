"""Viral-template mega-component stress (VERDICT r4 directive #1).

A real 100 TB transcript corpus contains viral templates: ONE shared
document perturbed 10^5-10^6 times, producing a single giant
near-duplicate component. Nothing in the linear/quadratic ladders
exercises that shape — families cap at 256 members. This runner embeds
one `viral_members`-sized family (family 0) inside an otherwise-normal
corpus and pushes it through the FULL pipeline, reporting:

  * wall / CPU / per-pass stage metrics (superlinearity shows up here);
  * pairwise P/R/F1 over the whole corpus (the viral family dominates
    TP count — C(V,2) — so any fragmentation of it craters recall);
  * viral-family resolution detail: how many clusters its members
    landed in and the largest cluster's share (1 cluster / share 1.0
    is the pass bar).

The normal:viral ratio matters: blocking's stop-key filter drops keys
covering > stop_key_fraction (0.2) of records, so the viral family must
be a MINORITY of the corpus for its family-wide keys to be salted
(ring-linked sub-blocks) rather than dropped — exactly the real shape,
where a viral template is <1% of a 100 TB corpus. Keep
normal_families >= viral_members/2 (members=4 -> viral <= ~33% of
conversations).

Usage: python tools/viral_stress.py <cores> <normal_families> <viral_members>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from linear_ladder import _tree_cpu_sec  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_families = int(sys.argv[2])
    viral_members = int(sys.argv[3])

    from entity_resolver_spark.datagen import corpus_distributed, pairwise_prf
    from entity_resolver_spark.session import get_spark, warm_up

    spark = get_spark(app_name=f"viral_{viral_members}", cores=cores)
    warm_up(spark)
    turns = corpus_distributed(
        spark, n_families, members=4, viral_families=1, viral_members=viral_members
    ).localCheckpoint(eager=True)
    n_turns = turns.count()

    from pyspark.sql import functions as F

    from entity_resolver_spark import EntityResolverPipeline

    c0 = _tree_cpu_sec()
    t0 = time.time()
    pipe = EntityResolverPipeline()
    res = pipe.resolve(spark, turns)
    n_entities = res.count()
    wall = time.time() - t0
    cpu = round(_tree_cpu_sec() - c0, 1)

    prf = pairwise_prf(res)
    viral = (
        res.where(F.col("conv_id").startswith("f0000000_"))
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc())
    )
    vrows = viral.collect()
    v_clusters = len(vrows)
    v_total = sum(r["n"] for r in vrows)
    v_largest = vrows[0]["n"] if vrows else 0

    print(
        json.dumps(
            {
                "cores": cores,
                "normal_families": n_families,
                "viral_members": viral_members,
                "n_turns": n_turns,
                "n_entities": n_entities,
                "wall_sec": round(wall, 1),
                "cpu_sec_children": cpu,
                "turns_per_sec": round(n_turns / wall, 1),
                "precision": round(prf["precision"], 6),
                "recall": round(prf["recall"], 6),
                "f1": round(prf["f1"], 6),
                "viral_clusters": v_clusters,
                "viral_members_resolved": v_total,
                "viral_largest_share": round(v_largest / v_total, 6) if v_total else 0.0,
                "viral_straggler_sizes": [r["n"] for r in vrows[1:21]],
                "stages": [
                    (m["stage"], m["rows"], m["seconds"]) for m in pipe.metrics
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
