"""Golden queries: mutations (filled in incrementally)."""
