"""Kill/resume at ladder scale (VERDICT r4 directive #6).

The resume test in tests/ runs on the 60-family corpus; this runner
proves the same contract at the 40k-family (~1.2M-turn) ladder point:

  1. COLD run with checkpoint_dir, SIGKILLed mid-`clustered` (the kill
     fires a fixed delay after the components stage's manifest lands —
     i.e. while the refinement passes are executing);
  2. RESUME run in the same dir: completed stages must come back as
     resumed=True from their parquet manifests (no recompute), and only
     clustered/canonical/resolved re-execute;
  3. the resumed output's orderless content hash must equal a separate
     UNINTERRUPTED run's hash (byte-identical result).

Prints one JSON line with resume wall vs cold wall and the per-stage
resumed flags (the BENCH.md row).

Usage: python tools/resume_stress.py <cores> <n_families>
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
ckpt_dir, n_fam, cores, out_path = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
from entity_resolver_spark.session import get_spark, warm_up
from entity_resolver_spark.datagen import corpus_distributed
from entity_resolver_spark import EntityResolverPipeline, ResolverConfig
spark = get_spark(app_name="resume_child", cores=cores)
warm_up(spark)
turns = corpus_distributed(spark, n_fam).localCheckpoint(eager=True)
turns.count()
cfg = ResolverConfig()
cfg.output.checkpoint_dir = ckpt_dir
import time as _t
t0 = _t.time()
pipe = EntityResolverPipeline(cfg)
res = pipe.resolve(spark, turns)
n = res.count()
from entity_resolver_spark.operators.report import content_hash
h = content_hash(res)
with open(out_path, "w") as f:
    json.dump({"wall": round(_t.time() - t0, 1), "rows": n, "hash": h,
               "stages": [(m["stage"], m.get("resumed", False), m["seconds"])
                          for m in pipe.metrics]}, f)
"""


def run_child(ckpt_dir: str, n_fam: int, cores: int, out_path: str,
              kill_after_stage: str | None = None, kill_delay: float = 15.0):
    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD, ckpt_dir, str(n_fam), str(cores), out_path],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    if kill_after_stage is None:
        proc.wait()
        return None
    marker = os.path.join(ckpt_dir, f"{kill_after_stage}.manifest.json")
    t_start = time.time()
    while proc.poll() is None:
        if os.path.exists(marker):
            time.sleep(kill_delay)  # let the NEXT stage get real work done
            if proc.poll() is None:
                os.killpg(proc.pid, signal.SIGKILL)
                return round(time.time() - t_start, 1)
            return None
        time.sleep(1.0)
    raise RuntimeError(f"child finished before {marker} appeared — corpus too small")


def main() -> None:
    cores = int(sys.argv[1])
    n_fam = int(sys.argv[2])
    work = tempfile.mkdtemp(prefix="resume_stress_")
    ckpt = os.path.join(work, "ckpt")
    try:
        # 1. cold run, killed mid-clustered
        killed_at = run_child(ckpt, n_fam, cores, os.path.join(work, "x.json"),
                              kill_after_stage="components")
        done_stages = sorted(
            f.split(".")[0] for f in os.listdir(ckpt) if f.endswith(".manifest.json")
        )

        # 2. resume in the same dir
        t0 = time.time()
        run_child(ckpt, n_fam, cores, os.path.join(work, "resumed.json"))
        resume_wall_total = round(time.time() - t0, 1)
        with open(os.path.join(work, "resumed.json")) as f:
            resumed = json.load(f)
        resumed_flags = {s: r for s, r, _ in resumed["stages"] if not s.startswith(
            ("clustered.", "resolved."))}

        # 3. uninterrupted reference run, fresh dir
        ckpt2 = os.path.join(work, "ckpt_cold")
        t0 = time.time()
        run_child(ckpt2, n_fam, cores, os.path.join(work, "cold.json"))
        cold_wall_total = round(time.time() - t0, 1)
        with open(os.path.join(work, "cold.json")) as f:
            cold = json.load(f)

        ok_hash = resumed["hash"] == cold["hash"]
        ok_resumed = all(
            resumed_flags.get(s, False) for s in done_stages
        )
        print(json.dumps({
            "cores": cores, "n_families": n_fam,
            "killed_after_sec": killed_at,
            "stages_complete_at_kill": done_stages,
            "resumed_stage_flags": resumed_flags,
            "resume_wall_pipeline": resumed["wall"],
            "cold_wall_pipeline": cold["wall"],
            "resume_wall_process": resume_wall_total,
            "cold_wall_process": cold_wall_total,
            "rows": resumed["rows"],
            "hash_resumed": resumed["hash"],
            "hash_cold": cold["hash"],
            "byte_identical": ok_hash,
            "completed_stages_not_recomputed": ok_resumed,
            "pass": ok_hash and ok_resumed,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
