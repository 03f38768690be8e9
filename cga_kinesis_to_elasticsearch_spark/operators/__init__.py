"""Operator library: every SURVEY §2 inventory row as a pure
DataFrame -> DataFrame function, plus the north-star LLM-data-pipeline
operators (dedup, similarity, text analysis, multimodal)."""
