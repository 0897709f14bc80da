"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

The flagship is the full record-linkage pipeline over transcripts
derived from the events table (turns/sec is the north-rule unit);
the rest cover the dedup / ANN / text-stats / relational surfaces.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default parallelism 8: this host exposes 32 vCPUs but delivers
    # ~12 cores of real compute (see BENCH.md's capacity probe);
    # local[32] measurably UNDERPERFORMS local[8] here. On a real
    # cluster this is sized to total executor cores instead.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from entity_resolver_spark.session import get_spark, warm_up

    spark = get_spark(app_name="bench", cores=cpus)
    warm_up(spark)  # steady-state executors; excluded from query timings

    import __spark_entry__ as entry

    timings: dict[str, float] = {}
    n_turns = 0

    def run(name: str, fn) -> None:
        t0 = time.time()
        df = fn(spark, sf_dir)
        # noop sink forces EVERY column (count() would let Catalyst prune
        # the expensive ones right out of the plan)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: done in {timings[name]}s", file=sys.stderr)

    # flagship: full pipeline; also record input turn count for turns/sec
    from entity_resolver_spark.sources.transcripts import (
        inject_duplicates,
        transcripts_from_events,
    )

    turns_df = inject_duplicates(transcripts_from_events(spark, sf_dir))
    n_turns = turns_df.count()

    t0 = time.time()
    from entity_resolver_spark import EntityResolverPipeline

    res = EntityResolverPipeline().resolve(spark, turns_df)
    n_entities = res.count()
    timings["resolve_pipeline"] = round(time.time() - t0, 3)
    print(f"# resolve_pipeline: {n_entities} entities from {n_turns} turns "
          f"in {timings['resolve_pipeline']}s", file=sys.stderr)

    qs = entry.queries()
    for name in [
        "collapse_turns", "group_stats", "join_agg_topn", "sessionize",
        "minhash_dedup", "simhash_dedup", "ngram_jaccard", "exact_dedup",
        "embedding_dedup", "token_stats", "quality_lang", "embedding_topk",
        "ivf_topk", "lev_similarity", "jaro_winkler", "components",
        "dedup_window", "confidence_penalty", "canonical_fd",
        "purity", "ensemble", "label_prop", "stream_fusion",
    ]:
        run(name, qs[name])

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / timings["resolve_pipeline"], 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
