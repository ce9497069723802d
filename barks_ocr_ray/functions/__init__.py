"""Reusable operator layer (SURVEY.md §2): relational ops, text analysis,
dedup family, similarity search, windowed aggregates, tagging, multimodal
stubs. Each operator is a Dataset -> Dataset function usable both by the
pages pipeline and by the oracle-checked query registry."""
