"""Scaling-efficiency evidence (north rule: throughput efficiency >=0.8
between N and 4N parallelism on the same input).

Runs the IDENTICAL resolve job at local[N] with a deterministically
multiplied transcript corpus (variants perturbed copies per
conversation; hash-seeded, so both runs see byte-identical input) and
prints one JSON line with wall time + turns/sec.

Usage: python tools/scaling.py <cores> [variants] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1])
    variants = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from entity_resolver_spark.session import get_spark
    from entity_resolver_spark.sources.transcripts import (
        inject_duplicates,
        transcripts_from_events,
    )

    from entity_resolver_spark.session import warm_up

    spark = get_spark(app_name=f"scaling_{cores}", cores=cores)
    t_w = time.time()
    warm_up(spark)
    warm_s = round(time.time() - t_w, 1)
    turns = inject_duplicates(
        transcripts_from_events(spark, sf_dir), fraction=1.0, variants=variants
    ).localCheckpoint(eager=True)
    n_turns = turns.count()

    from entity_resolver_spark import EntityResolverPipeline

    import os

    def _tree_cpu_sec() -> float:
        """Total utime+stime of this process and every live descendant
        (JVM + python workers) from /proc. If ~constant across
        parallelism levels, the job does no extra work at higher
        parallelism and the wall ratio is purely host scheduling."""
        tick = os.sysconf("SC_CLK_TCK")
        pids, total = {os.getpid()}, 0.0
        grew = True
        while grew:
            grew = False
            for p in os.listdir("/proc"):
                if p.isdigit() and int(p) not in pids:
                    try:
                        with open(f"/proc/{p}/stat") as f:
                            parts = f.read().rsplit(")", 1)[1].split()
                    except OSError:
                        continue
                    if int(parts[1]) in pids:  # ppid
                        pids.add(int(p))
                        grew = True
        for p in pids:
            try:
                with open(f"/proc/{p}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                total += (int(parts[11]) + int(parts[12])) / tick
            except OSError:
                continue
        return total

    c0 = _tree_cpu_sec()
    t0 = time.time()
    pipe = EntityResolverPipeline()
    res = pipe.resolve(spark, turns)
    n_entities = res.count()
    wall = time.time() - t0
    cpu_children = round(_tree_cpu_sec() - c0, 1)
    print(
        json.dumps(
            {
                "cores": cores,
                "variants": variants,
                "sf_dir": sf_dir,
                "n_turns": n_turns,
                "n_entities": n_entities,
                "wall_sec": round(wall, 1),
                "warmup_sec": warm_s,
                "cpu_sec_children": cpu_children,
                "turns_per_sec": round(n_turns / wall, 1),
                "stages": [(m["stage"], m["rows"], m["seconds"]) for m in pipe.metrics],
            }
        )
    )


if __name__ == "__main__":
    main()
