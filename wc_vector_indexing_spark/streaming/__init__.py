"""Structured Streaming wrappers for the incremental sync semantics."""
