"""Sources: SparkSession factory, table IO (Iceberg-or-parquet), the
deterministic synthetic Common-Crawl-style pages generator, and the
bucketed edge store (write-once co-location: zero-Exchange degree
aggregation and co-bucketed joins in every later job)."""
