"""Batch-equivalent streaming plans (windowed aggs over events) — populated incrementally."""
