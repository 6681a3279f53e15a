"""Golden queries: dedup_text (filled in incrementally)."""
