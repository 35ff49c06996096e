"""wc_vector_indexing_spark — a PySpark-native incremental embedding/index
pipeline engine.

Re-expresses the capabilities of the reference system
(web-lifter/wc-vector-indexing: an incremental product→chunk→embed→vector-index
CDC pipeline; see SURVEY.md) as idiomatic Spark DataFrame / SQL plans, extended
with large-scale training-data-pipeline operators (dedup, similarity search,
text analysis) designed for 100 TB scale.

Layout:
    session        SparkSession factory with scale-tuned defaults
    config         selection config, model matrix, canonicalization (SURVEY H2)
    functions/     column-level fns: text cleaning, hashing, vector math
    operators/     chunker, embedder, delta-sync, rollup, dedup, similarity,
                   text-stats, multimodal plumbing
    plans/         relational query catalog (scans S1-S11, joins J1-J10, ...)
    state/         parquet-backed MERGE state store (sync ledger, W1-W4)
    sources/       table loaders / product-corpus synthesis from test tables
    streaming/     structured-streaming incremental wrapper (T1-T8)
"""

__version__ = "0.1.0"

from wc_vector_indexing_spark.session import get_spark  # noqa: F401
