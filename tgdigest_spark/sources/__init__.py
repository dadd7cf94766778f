"""Sources & sinks: parquet-backed upsert, transcript table layout."""
