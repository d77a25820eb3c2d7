"""Sources: parquet readers and deterministic synthetic token-table generation."""
