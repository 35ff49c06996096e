"""Variation rollup (SURVEY A1/K2/P11-P13, class-variation-rollup.php:22-153).

Groups child variations under their parent and renders a deterministic
text block appended to the parent document when variation_strategy =
'collapse':

    Variations: 12
    Price range: 9.99 – 24.99
    Color: Blue, Green, Red, +4 more
    Size: L, M, S
    SKUs: SKU-1, SKU-2, +10 more

All one groupBy: count / min / max / collect_set per attribute — with the
per-group value caps the reference enforces (values_cap default 20,
'+N more' overflow marker; rollup_max_variations cap on children).

Determinism note (K6): value sets render in lexicographic array_sort
order, not PHP SORT_NATURAL order — pinned by our golden tests
(K6: value sets render under the natural-sort key — "item2" before
"item10" — matching the reference's SORT_NATURAL renders; see
functions/text.natural_sort_key for the documented strnatcmp
approximation).

Scale: collect_set per (parent, attribute) is bounded by the attribute
cardinality, not the corpus: the cap is applied after a distinct-set agg
whose map-side partial combine dedupes early. For genuinely unbounded
attrs swap collect_set for approx top-K (not needed for catalog data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import (
    DEFAULT_ROLLUP_MAX_VARIATIONS,
    DEFAULT_ROLLUP_VALUES_CAP,
)
from wc_vector_indexing_spark.functions.text import natural_array_sort


def _render_capped(values_sorted, cap: int):
    """slice + '+N more' overflow marker (class-variation-rollup.php:109-148)."""
    n_over = F.size(values_sorted) - cap
    return F.when(
        F.size(values_sorted) > cap,
        F.concat(
            F.array_join(F.slice(values_sorted, 1, cap), ", "),
            F.lit(", +"),
            n_over.cast("string"),
            F.lit(" more"),
        ),
    ).otherwise(F.array_join(values_sorted, ", "))


def prettify_attribute(col) -> F.Column:
    """P12: 'attribute_pa_color'/'pa_color' slug → 'Color'
    (class-variation-rollup.php:156-183 label beautify)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"^(attribute_)?pa_", "")
    return F.initcap(F.regexp_replace(stripped, r"[-_]+", " "))


def money(col) -> F.Column:
    """P13 money format: two decimals (class-variation-rollup.php:186-192)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string("%.2f", c.cast("double"))


def rollup_variations(
    variations: DataFrame,
    terms: DataFrame | None = None,
    max_variations: int = DEFAULT_ROLLUP_MAX_VARIATIONS,
    values_cap: int = DEFAULT_ROLLUP_VALUES_CAP,
) -> DataFrame:
    """Per-parent rollup block.

    ``variations``: rows with parent_id, product_id, price, sku (children
    only). ``terms``: optional (product_id, taxonomy, term_name) rows for
    attribute values (taxonomy LIKE 'pa_%').

    Returns (parent_id, rollup_text). Child set is capped at
    ``max_variations`` by ascending product_id (S2's ORDER BY ID ASC
    LIMIT, class-variation-rollup.php:33-45).
    """
    ranked = variations.withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("parent_id").orderBy("product_id")),
    ).filter(F.col("_rn") <= max_variations)

    base = ranked.groupBy("parent_id").agg(
        F.count("*").alias("n_variations"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        natural_array_sort(F.collect_set("sku")).alias("skus"),  # sort($skuList, SORT_NATURAL), :126
    )
    # The count line always renders; the price-range line only when the
    # group produced a price (all-null children would otherwise
    # null-propagate through concat and erase the whole head — the
    # reference emits the count unconditionally and the range only when
    # prices exist, class-variation-rollup.php:95-107).
    price_line = F.when(
        F.col("min_price").isNotNull(),
        F.concat(
            F.lit("Price range: "), money("min_price"), F.lit(" – "), money("max_price")
        ),
    )
    base = base.select(
        "parent_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("Variations: "), F.col("n_variations").cast("string")),
            price_line,
        ).alias("_head"),
        _render_capped(F.col("skus"), values_cap).alias("_skus"),
    )

    if terms is not None:
        attr_vals = (
            ranked.select("parent_id", F.col("product_id").alias("vid"))
            .join(
                terms.filter(F.col("taxonomy").startswith("pa_")).select(
                    F.col("product_id").alias("vid"), "taxonomy", "term_name"
                ),
                "vid",
            )
            .groupBy("parent_id", "taxonomy")
            # sort($vals, SORT_NATURAL | SORT_FLAG_CASE), :112
            .agg(natural_array_sort(F.collect_set("term_name"), case_insensitive=True).alias("vals"))
            .withColumn(
                "line",
                F.concat(
                    prettify_attribute("taxonomy"),
                    F.lit(": "),
                    _render_capped(F.col("vals"), values_cap),
                ),
            )
            # ksort attrs: deterministic attribute order in the block
            .groupBy("parent_id")
            .agg(F.array_join(natural_array_sort(F.collect_list("line")), "\n").alias("_attrs"))  # ksort(SORT_NATURAL), :97
        )
        base = base.join(attr_vals, "parent_id", "left")
    else:
        base = base.withColumn("_attrs", F.lit(None).cast("string"))

    rollup_text = F.concat_ws(
        "\n",
        F.col("_head"),
        F.col("_attrs"),
        F.concat(F.lit("SKUs: "), F.col("_skus")),
    )
    return base.select("parent_id", rollup_text.alias("rollup_text"))


def apply_variation_strategy(
    products: DataFrame,
    strategy: str,
    terms: DataFrame | None = None,
    max_variations: int = DEFAULT_ROLLUP_MAX_VARIATIONS,
    values_cap: int = DEFAULT_ROLLUP_VALUES_CAP,
) -> DataFrame:
    """Select which rows become documents (class-options.php:596-601):

      separate     parents AND variations each indexed on their own
      parent_only  parents only; variations dropped
      collapse     parents only, with the rollup block in 'rollup_text'
                   (P11 appends it to the normalized doc)
    """
    is_child = F.col("product_type") == "variation"
    if strategy == "separate":
        return products.withColumn("rollup_text", F.lit(None).cast("string"))
    if strategy == "parent_only":
        return products.filter(~is_child).withColumn(
            "rollup_text", F.lit(None).cast("string")
        )
    if strategy == "collapse":
        children = products.filter(is_child).select("parent_id", "product_id", "price", "sku")
        blocks = rollup_variations(children, terms, max_variations, values_cap)
        return (
            products.filter(~is_child)
            .join(blocks.withColumnRenamed("parent_id", "product_id"), "product_id", "left")
        )
    raise ValueError(f"unknown variation strategy {strategy!r}")
