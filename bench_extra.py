"""Per-query measurement harness for optimization work (bench.py is
FROZEN for driver measurement; this file exists so plan captures and
noop-sink isolation runs never touch it — guide §1.4/§1.5).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=8 \
      python bench_extra.py [--repeats 3] [--plans plans/r06 --suffix before] \
      [query ...]

Times each named query (default: the bench.py list) with the noop sink,
prints per-run seconds + median, and optionally writes
plans/<dir>/<query>_<suffix>.txt with .explain("formatted") output.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "collapse_turns", "group_stats", "join_agg_topn", "sessionize",
    "minhash_dedup", "simhash_dedup", "ngram_jaccard", "exact_dedup",
    "embedding_dedup", "token_stats", "quality_lang", "embedding_topk",
    "ivf_topk", "lev_similarity", "jaro_winkler", "components",
    "dedup_window", "confidence_penalty", "canonical_fd",
    "purity", "ensemble", "label_prop", "stream_fusion",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--production-dedup", action="store_true",
                    help="run minhash/simhash in production xxhash64 mode like bench.py")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cap = int(os.environ.get("SPARK_GRAFT_CORE_CAP", "8"))
    requested = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    cpus = min(requested, cap) if cap > 0 else requested

    from entity_resolver_spark.session import get_spark, warm_up

    spark = get_spark(app_name="bench_extra", cores=cpus)
    warm_up(spark)

    import __spark_entry__ as entry

    qs = dict(entry.queries())
    if args.production_dedup:
        from entity_resolver_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

        def _docs(s, d):
            return entry._read(s, d, "documents")

        qs["minhash_dedup"] = lambda s, d: minhash_lsh_pairs(_docs(s, d), jaccard_floor=0.5)
        qs["simhash_dedup"] = lambda s, d: simhash_pairs(_docs(s, d), max_hamming=6)

    names = args.queries or BENCH_QUERIES
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        ts = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        if ts:
            timings[name] = round(statistics.median(ts), 3)
            print(f"# {name}: median {timings[name]}s of {ts}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": timings}))


if __name__ == "__main__":
    main()
