"""Golden queries: documents (filled in incrementally)."""
