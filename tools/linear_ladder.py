"""Linear-work scaling ladder (families grow, family size doesn't).

`tools/scaling.py` multiplies FAMILY SIZE, so candidate pairs grow
quadratically with the corpus — right for stress-testing the pair
stages, wrong as a model of a real corpus growing toward 10^12 turns
(where new conversations arrive in NEW families). This runner grows the
number of families at constant family size: total work is LINEAR in
corpus size, so turns/sec should hold roughly flat as the corpus grows —
that flatness IS the 100 TB evidence.

The corpus is generated distributed (`datagen.corpus_distributed`, pure
codegen, byte-deterministic) and ground truth is recoverable from
conv_id, so pairwise P/R/F1 is ALSO computed at full scale — the
quality gate travels with the throughput number instead of only being
measured on a 60-family test corpus.

Usage: python tools/linear_ladder.py <cores> <n_families> [members]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _tree_cpu_sec() -> float:
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
                if int(parts[1]) in pids:
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


def main() -> None:
    cores = int(sys.argv[1])
    n_families = int(sys.argv[2])
    members = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from entity_resolver_spark.datagen import corpus_distributed, pairwise_prf
    from entity_resolver_spark.session import get_spark, warm_up

    spark = get_spark(app_name=f"ladder_{n_families}", cores=cores)
    warm_up(spark)
    turns = corpus_distributed(spark, n_families, members=members).localCheckpoint(
        eager=True
    )
    n_turns = turns.count()

    from entity_resolver_spark import EntityResolverPipeline

    c0 = _tree_cpu_sec()
    t0 = time.time()
    pipe = EntityResolverPipeline()
    res = pipe.resolve(spark, turns)
    n_entities = res.count()
    wall = time.time() - t0
    cpu = round(_tree_cpu_sec() - c0, 1)
    prf = pairwise_prf(res)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_families": n_families,
                "members": members,
                "n_turns": n_turns,
                "n_entities": n_entities,
                "wall_sec": round(wall, 1),
                "cpu_sec_children": cpu,
                "turns_per_sec": round(n_turns / wall, 1),
                "precision": round(prf["precision"], 6),
                "recall": round(prf["recall"], 6),
                "f1": round(prf["f1"], 6),
                "stages": [
                    (m["stage"], m["rows"], m["seconds"]) for m in pipe.metrics
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
