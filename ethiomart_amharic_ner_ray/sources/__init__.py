"""Sources: deterministic synthetic transcript generation + Parquet readers."""
