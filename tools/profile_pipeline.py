"""Profile the flagship pipeline per stage at a given SF (guide §1):
runs resolve() once (after warm-up) and prints the CheckpointManager's
per-stage wall seconds, including the clustered.<pass> segment rows.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=8 \
           python tools/profile_pipeline.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cap = int(os.environ.get("SPARK_GRAFT_CORE_CAP", "8"))
    cpus = min(int(os.environ.get("SPARK_GRAFT_CPUS", "8")), cap)
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    from entity_resolver_spark.session import get_spark, warm_up

    spark = get_spark(app_name="profile_pipeline", cores=cpus)
    warm_up(spark)

    from entity_resolver_spark import EntityResolverPipeline
    from entity_resolver_spark.lineage import eager_cut
    from entity_resolver_spark.sources.transcripts import (
        inject_duplicates,
        transcripts_from_events,
    )

    turns = eager_cut(inject_duplicates(transcripts_from_events(spark, sf_dir)))
    n = turns.count()
    for r in range(runs):
        p = EntityResolverPipeline()
        t0 = time.time()
        res = p.resolve(spark, turns)
        n_out = res.count()
        wall = round(time.time() - t0, 2)
        print(f"run {r}: {n} turns -> {n_out} entities in {wall}s", file=sys.stderr)
        for m in p.metrics:
            print(f"  {m['stage']:<28} {m['seconds']:>8.2f}s rows={m['rows']}",
                  file=sys.stderr)
        print(json.dumps({"run": r, "wall": wall, "n_turns": n,
                          "stages": {m["stage"]: m["seconds"] for m in p.metrics}}))


if __name__ == "__main__":
    main()
