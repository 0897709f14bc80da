"""spark-submit entrypoint: resolve a transcript table end-to-end.

Designed for `spark-submit --py-files dist/entity_resolver_spark.zip`
on a multi-executor cluster (the session comes from the cluster
manager's config there; local runs get sane local defaults). Writes the
resolved table as parquet (or an Iceberg table if the catalog exists —
see entity_resolver_spark/sinks.py) plus a JSON metrics sidecar.

Usage:
  spark-submit --py-files dist/entity_resolver_spark.zip tools/submit_job.py \
      --input /data/turns --output /data/resolved \
      [--config resolver.yaml] [--checkpoint-dir /ckpt/run1]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript turns parquet/table path")
    ap.add_argument("--output", required=True, help="output directory (parquet)")
    ap.add_argument("--config", default=None, help="ResolverConfig YAML")
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    # On a cluster, spark-submit provides the session config (master,
    # executors); builder.getOrCreate() attaches to it. Local fallback
    # configs only apply when nothing is set.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("entity_resolver_spark_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from entity_resolver_spark.config import ResolverConfig
    from entity_resolver_spark.pipeline import EntityResolverPipeline

    cfg = ResolverConfig.from_yaml(args.config) if args.config else ResolverConfig()
    if args.checkpoint_dir:
        cfg.output.checkpoint_dir = args.checkpoint_dir

    turns = spark.read.parquet(args.input)
    pipe = EntityResolverPipeline(cfg)
    resolved = pipe.resolve(spark, turns)

    from entity_resolver_spark.sinks import looks_like_table, write_table

    write_table(resolved, args.output)
    # metrics sidecar: --output is usually a DFS path (hdfs:// / s3a://)
    # on a real cluster, where a local open() would fail AFTER the
    # expensive resolve+write — write through the Hadoop FileSystem API
    # instead, which resolves any scheme Spark itself can write to.
    # Table targets get a local sidecar next to nothing, so skip (the
    # metrics live in pipe.metrics / the driver log there).
    if not looks_like_table(args.output):
        _write_sidecar(
            spark, args.output.rstrip("/") + "_metrics.json",
            json.dumps(pipe.metrics, indent=2),
        )
    print(f"resolved {resolved.count()} records -> {args.output}")


def _write_sidecar(spark, path: str, content: str) -> None:
    """Write a small text file via Hadoop FileSystem (scheme-agnostic:
    file://, hdfs://, s3a://, ...)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


if __name__ == "__main__":
    main()
