"""Per-stage checkpoint / resume manager (north rule: every stage
checkpoints with lineage + match-count metrics; the pipeline resumes
mid-run).

Storage: parquet directories + a JSON manifest per stage. On a real
cluster with an Iceberg catalog this writes `writeTo(table).replace()`
instead — the layout (stage table + manifest/metrics row) is identical;
parquet is used here because the sandbox has no Iceberg jars.
Reference analog: model/canonical-map persistence,
/root/reference/entity_resolver/persistence.py:23-144 (already parquet
for the canonical map, persistence.py:141-144).

Resume contract: a stage re-runs iff (a) no manifest, or (b) the
config+input fingerprint changed. Metrics rows accumulate in
<dir>/_metrics.jsonl — the per-stage lineage record (stage, rows,
match counts, wall seconds, fingerprint).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from entity_resolver_spark.lineage import eager_cut


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str | None, run_fingerprint: str = "",
                 resume: bool = True) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.resume = resume
        self.run_fingerprint = run_fingerprint
        self.metrics: list[dict] = []
        if base_dir:
            os.makedirs(base_dir, exist_ok=True)

    @staticmethod
    def fingerprint(*parts: str) -> str:
        h = hashlib.sha256()
        for p in parts:
            h.update(p.encode())
            h.update(b"\x00")
        return h.hexdigest()[:16]

    def _paths(self, stage: str) -> tuple[str, str]:
        assert self.base_dir is not None
        d = os.path.join(self.base_dir, stage)
        return d, os.path.join(self.base_dir, f"{stage}.manifest.json")

    def stage(
        self,
        name: str,
        compute: Callable[[], DataFrame],
        extra_metrics: Callable[[DataFrame], dict] | None = None,
    ) -> DataFrame:
        """Run (or resume) one stage; returns the stage DataFrame.

        Without a base_dir this degrades to compute() + localCheckpoint
        (lineage cut only — still required for iterative stages)."""
        t0 = time.time()
        if self.base_dir is None:
            df = compute().transform(eager_cut)
            self._record(name, df, t0, resumed=False, extra=extra_metrics)
            return df

        data_dir, manifest_path = self._paths(name)
        if self.resume and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            if manifest.get("fingerprint") == self.run_fingerprint:
                df = self.spark.read.parquet(data_dir)
                self._record(name, df, t0, resumed=True, extra=None,
                             rows=manifest.get("rows"))
                return df

        df = compute()
        # the single write gate: Iceberg writeTo when the target is a
        # catalog table and a catalog is configured, parquet dir here
        from entity_resolver_spark.sinks import write_table

        write_table(df, data_dir, mode="overwrite")
        df = self.spark.read.parquet(data_dir)  # re-read: truncated lineage
        rows = df.count()
        with open(manifest_path, "w") as f:
            json.dump(
                {"stage": name, "rows": rows, "fingerprint": self.run_fingerprint,
                 "written_at": time.time()},
                f,
            )
        self._record(name, df, t0, resumed=False, extra=extra_metrics, rows=rows)
        return df

    def _record(self, name, df, t0, resumed, extra, rows=None):
        m = {
            "stage": name,
            "rows": rows if rows is not None else df.count(),
            "seconds": round(time.time() - t0, 3),
            "resumed": resumed,
            "fingerprint": self.run_fingerprint,
        }
        if extra is not None:
            m.update(extra(df))
        self.metrics.append(m)
        if self.base_dir:
            with open(os.path.join(self.base_dir, "_metrics.jsonl"), "a") as f:
                f.write(json.dumps(m) + "\n")
