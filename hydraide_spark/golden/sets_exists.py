"""Golden queries: sets_exists (filled in incrementally)."""
