"""Input sources: deterministic transcript synthesizer, PDF generator,
Parquet read helpers."""
