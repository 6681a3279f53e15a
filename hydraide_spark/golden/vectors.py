"""Golden queries: vectors (filled in incrementally)."""
