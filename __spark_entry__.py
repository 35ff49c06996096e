"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full M0 pipeline on sf0.001 (documents →
                 chunk → fingerprint → deterministic embed → vector index
                 → exact kNN top-10).
queries()      — one callable per implemented operator (SURVEY.md §2 +
                 north-star extensions), from the engine's query catalog.
oracle_sql()   — DuckDB mirror for each SQL-expressible query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from wc_vector_indexing_spark.plans.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig
    from wc_vector_indexing_spark.operators.embed import DeterministicEmbedder
    from wc_vector_indexing_spark.operators.indexer import build_index
    from wc_vector_indexing_spark.operators.similarity import knn_exact
    from wc_vector_indexing_spark.sources.readers import load

    sf = "/root/testdata/sf0.001"
    config = EngineConfig(
        model="fake-deterministic-64", chunking=ChunkingConfig(size=100, overlap=10)
    )
    docs = load(spark, "documents", sf).select(
        F.col("doc_id").alias("product_id"), "text"
    )
    index = build_index(docs, config, DeterministicEmbedder(), text_col="text")
    emb = load(spark, "embeddings", sf)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 1).select("embedding").head()[0]]
    return knn_exact(index, qv, k=10, vec_col="values", id_col="vector_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each SQL-expressible query."""
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
