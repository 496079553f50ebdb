"""End-to-end pipelines: the crawl driver, its oracle, and the wider
operator suite (relational, dedup, ANN, text analysis, multimodal)."""
