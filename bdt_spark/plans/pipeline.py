"""LLM-data-pipeline queries (dedup/similarity/text) — populated next."""
