"""The build pipeline: normalize → fingerprint → chunk → chunk-fingerprint
→ embed → vector payloads (SURVEY §3.1 'build phase',
class-indexer.php:184-273 restated as one lazy DataFrame plan).

The output is the engine's *vector index table*: one row per chunk with

    vector_id   string        'site-{s}:product-{p}:chunk-{i}'
    values      array<float>
    metadata    struct<site_id, product_id, sku, url, updated_at,
                       fingerprint, fields array<string>>
    + product_sha / chunk_sha / chunk_index for the delta diff

(payload shape: class-indexer.php:101-116, id scheme :147-150).

Unlike the reference — which keeps no local vectors, only remote ids
(README.md:118-121) — the index here IS a columnar table; at scale it is
written partitioned by bucket(product_id) so per-product delta syncs
prune to a handful of files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import EngineConfig
from wc_vector_indexing_spark.functions.hashing import sha_chunk_bound, sha_product
from wc_vector_indexing_spark.functions.text import assemble_document, label_line
from wc_vector_indexing_spark.operators.chunker import chunk_documents
from wc_vector_indexing_spark.operators.embed import EmbeddingBackend, embed_texts

# core-field label map (class-field-normalizer.php:92-155)
CORE_LABELS = {
    "title": "Title",
    "short_description": "Short description",
    "description": "Description",
    "sku": "SKU",
    "price": "Price",
    "sale_price": "Sale price",
    "stock_status": "Stock status",
    "product_type": "Product type",
    "permalink": "URL",
    "image_alt": "Image alt",
}


def normalize_products(df: DataFrame, config: EngineConfig) -> DataFrame:
    """Project selected core fields into the normalized document text
    (P1/P2/P10): '"Label: value"' lines joined by newlines, empty
    sections dropped. Price uses coalesce(regular, sale) fallback
    (class-field-normalizer.php:116-119)."""
    lines = []
    for key in config.selection.canonical()["core"]:
        label = CORE_LABELS.get(key, key.replace("_", " ").capitalize())
        if key == "price":
            col = F.coalesce(F.col("price"), F.col("sale_price")).cast("string")
            lines.append(label_line(label, col))
        elif key in df.columns:
            lines.append(label_line(label, F.col(key)))
    return df.withColumn("doc_text", assemble_document(*lines))


def build_chunks(
    products: DataFrame,
    config: EngineConfig,
    text_col: str | None = None,
    text_transform=None,
) -> DataFrame:
    """The cheap half of the build: products → normalized doc →
    product_sha → chunk rows → chunk_sha. NO embedding — the delta diff
    (operators/delta_sync.py) runs on these rows first, so unchanged
    chunks are never embedded (the reference's #1 cost optimization,
    class-indexer.php:329-388).

    If ``text_col`` is given the normalization step is skipped and that
    column is the document text directly (the documents-table path).

    ``text_transform`` is the U2 extension hook (≙ the reference's
    wcvec/final_normalized_text filter, class-indexer.php:131-137): a
    Column → Column function applied to the document text BEFORE
    fingerprinting, so a changed transform changes the shas and triggers
    re-embedding — exactly like editing the text.
    """
    if text_col is None:
        df = normalize_products(products, config)
        text_col = "doc_text"
    else:
        df = products

    if text_transform is not None:
        df = df.withColumn(text_col, text_transform(F.col(text_col)))
    df = df.withColumn("product_sha", sha_product(F.col(text_col), config))
    chunks = chunk_documents(df, text_col=text_col, size=config.chunking.size,
                             overlap=config.chunking.overlap)
    return chunks.withColumn(
        "chunk_sha", sha_chunk_bound(config, "chunk_index", "chunk_text")
    )


def attach_payload(chunks: DataFrame, config: EngineConfig, products_cols: list[str]) -> DataFrame:
    """Add vector_id + metadata struct to embedded chunk rows
    (class-indexer.php:101-116 payload shape)."""
    return chunks.withColumn(
        "vector_id",
        F.concat_ws(
            "",
            F.lit(f"site-{config.site_id}:product-"),
            F.col("product_id").cast("string"),
            F.lit(":chunk-"),
            F.col("chunk_index").cast("string"),
        ),
    ).withColumn(
        "metadata",
        F.struct(
            F.lit(config.site_id).cast("long").alias("site_id"),
            F.col("product_id").alias("product_id"),
            (F.col("sku") if "sku" in products_cols else F.lit(None).cast("string")).alias("sku"),
            (
                F.col("permalink") if "permalink" in products_cols else F.lit(None).cast("string")
            ).alias("url"),
            F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX").alias("updated_at"),
            F.col("product_sha").alias("fingerprint"),
            F.lit(sorted(config.selection.canonical()["core"])).alias("fields"),
        ),
    )


def build_index(
    products: DataFrame,
    config: EngineConfig,
    backend: EmbeddingBackend,
    text_col: str | None = None,
) -> DataFrame:
    """Full (non-incremental) build: build_chunks → embed → payload.
    The incremental path goes through operators.delta_sync instead, which
    embeds only the changed subset."""
    chunks = build_chunks(products, config, text_col=text_col)
    embedded = embed_texts(
        chunks, text_col="chunk_text", out_col="values",
        backend=backend, batch_size=config.embed_batch,
    )
    return attach_payload(embedded, config, products.columns)
