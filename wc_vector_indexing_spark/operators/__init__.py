"""Engine operators: chunking, embedding, delta-sync, rollup, dedup,
similarity search, text analysis, multimodal plumbing."""
