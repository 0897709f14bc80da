"""Sources/sinks: parquet testdata adapters, Iceberg gating."""
