"""Build the --py-files artifact for cluster submission (north rule:
"the job ships via spark-submit --py-files").

Produces dist/entity_resolver_spark.zip containing the package, then
prints the spark-submit command. No third-party packaging machinery —
the package is pure Python + PySpark, so a zip is the whole artifact.

Usage: python tools/package.py [dist_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dist_dir: str | None = None) -> str:
    dist = dist_dir or os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "entity_resolver_spark.zip")
    pkg = os.path.join(REPO, "entity_resolver_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    artifact = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(f"built {artifact}")
    print(
        "submit with:\n"
        f"  spark-submit --py-files {artifact} \\\n"
        "    tools/submit_job.py --input <turns.parquet> --output <out_dir> \\\n"
        "    [--config config.yaml] [--checkpoint-dir <ckpt_dir>]"
    )
