"""Sources & sinks: parquet-backed table layout with Iceberg-style atomic
snapshot commits (manifest files), lineage rows, and resume support."""
