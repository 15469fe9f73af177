"""Plans: checkpoint/resume with per-partition lineage manifests."""
