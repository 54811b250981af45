"""North-star LLM-pipeline plans (dedup/similarity/text) — populated incrementally."""
