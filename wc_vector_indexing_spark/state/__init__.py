"""State management: the sync ledger and vector index as MERGE-able
parquet tables."""
