"""Column-level functions (pure, JVM-side wherever possible)."""
