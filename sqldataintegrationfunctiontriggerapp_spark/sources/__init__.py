"""Change-feed sources (reference A1: SqlTrigger per-table change batches)."""
