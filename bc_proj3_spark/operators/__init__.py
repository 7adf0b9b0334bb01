"""Composable dataframe operators: incremental loads, dedup family,
similarity search, text analysis, multimodal plumbing."""
