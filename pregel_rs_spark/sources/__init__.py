"""Sources: SparkSession factory, table IO (Iceberg-or-parquet), and the
deterministic synthetic Common-Crawl-style pages generator."""
