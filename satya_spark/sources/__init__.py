"""Ingestion paths (SURVEY.md §2.1): JSON object / array / NDJSON
byte streams → validated DataFrames, mirroring satya's
validate_json(mode=object|array|ndjson) surface on Spark's native
readers."""
