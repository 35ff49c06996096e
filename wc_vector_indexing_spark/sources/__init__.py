"""Source readers: parquet test tables + product-corpus synthesis."""
