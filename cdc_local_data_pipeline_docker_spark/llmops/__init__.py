"""LLM-training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — the north-star extensions over the reference's
CDC-only surface (SURVEY.md §2.C, BASELINE.json north_star)."""
