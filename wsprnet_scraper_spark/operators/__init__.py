"""Custom operators beyond the reference surface: dedup, similarity,
text analysis, multimodal plumbing, UDF variants of the enrichment."""
