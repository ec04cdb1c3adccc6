"""North-star LLM-data-pipeline operators (BASELINE.json): dedup families,
similarity search, text analysis, multimodal plumbing. Populated in M6."""
