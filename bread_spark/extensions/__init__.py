"""LLM-data-pipeline extensions beyond the reference's surface
(BASELINE.json north star): dedup, similarity search, text analysis,
multimodal columns — each designed against the 100 TB bar."""
