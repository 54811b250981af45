"""Structured Streaming: incremental ingestion + watermarked windows."""
