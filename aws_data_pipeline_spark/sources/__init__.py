"""Sources/sinks: JSONL bronze reader/writer, partitioned parquet zones."""
