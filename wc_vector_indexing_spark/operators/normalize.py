"""Full field-normalization surface (SURVEY §2.2 P1-P14) — the document
assembly that turns a product row (+ its taxonomy terms, meta key/values
and ACF-style custom fields) into one normalized text.

Reference: class-field-normalizer.php. Every projection is a Catalyst
expression; the only joins are the two dimension joins (terms, meta) and
they aggregate back to one row per product before assembly, so document
building stays one shuffle-light pass:

  P1  core projection        indexer.normalize_products (select + coalesce)
  P2  plain()                functions.text.plain
  P3  taxonomy projection    terms ⋈ groupBy collect → 'a, b' joins
  P4  SEO meta               provider key lookup in the meta map
  P5  meta modes             text → flatten+join, json → to_json
  P6  ACF type-driven        when/otherwise over 14 type tags
  P7  flatten_array          F.flatten / from_json
  P8  flatten_kv             transform over array<struct> → 'k: v; ...'
  P9  object_to_title        broadcast join to the products dim
  P10 document assembly      functions.text.assemble_document
  P11 rollup append          operators.rollup (collapse strategy)
  P12-P14                    rollup.prettify_attribute / money / text.mask

Scale: terms/meta are skinny key-value tables co-keyed on product_id; at
100 TB both are bucketed on product_id so these joins are shuffle-free,
and every per-product agg benefits from map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import EngineConfig
from wc_vector_indexing_spark.functions.text import assemble_document, label_line, plain
from wc_vector_indexing_spark.operators.indexer import normalize_products
from wc_vector_indexing_spark.operators.rollup import apply_variation_strategy

# SEO provider meta-key resolution (class-field-discovery.php:81-120):
# selected SEO field → the provider-specific meta key that stores it.
SEO_PROVIDER_KEYS = {
    "seo_title": ["_yoast_wpseo_title", "rank_math_title"],
    "seo_description": ["_yoast_wpseo_metadesc", "rank_math_description"],
    "seo_focus_keyword": ["_yoast_wpseo_focuskw", "rank_math_focus_keyword"],
}


def terms_lines(terms: DataFrame, taxonomies: list[str]) -> DataFrame:
    """P3: (product_id, taxonomy, term_name) → one 'Label: a, b' line per
    selected taxonomy, aggregated to (product_id, tax_lines array)
    (class-field-normalizer.php:157-178)."""
    from wc_vector_indexing_spark.operators.rollup import prettify_attribute

    sel = terms.filter(F.col("taxonomy").isin(taxonomies))
    per_tax = (
        sel.withColumn("term_clean", plain("term_name"))
        .filter(F.col("term_clean") != "")
        .groupBy("product_id", "taxonomy")
        .agg(F.array_join(F.array_sort(F.collect_set("term_clean")), ", ").alias("vals"))
        .withColumn(
            "line", F.concat(prettify_attribute("taxonomy"), F.lit(": "), F.col("vals"))
        )
    )
    return per_tax.groupBy("product_id").agg(
        F.array_sort(F.collect_list("line")).alias("tax_lines")
    )


def meta_map(meta: DataFrame, include_private: bool = False) -> DataFrame:
    """S7-adjacent: pivot the meta kv rows into one map per product.
    '_'-prefixed keys are private and excluded unless flagged
    (class-field-discovery.php:133-178)."""
    m = meta
    if not include_private:
        m = m.filter(~F.col("meta_key").startswith("_"))
    return m.groupBy("product_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("meta_key", "meta_value")))
        ).alias("meta")
    )


META_KEY_BLACKLIST = (
    "_edit_lock",
    "_edit_last",
    "_wp_old_slug",
    "_thumbnail_id",
    "total_sales",
)


def discover_meta_keys(
    meta: DataFrame,
    include_private: bool = False,
    search: str | None = None,
    limit: int = 200,
) -> DataFrame:
    """S7 meta-key discovery: enumerate distinct keys minus the
    blacklist, excluding '_'-private keys unless flagged, optional
    substring filter, sorted (class-field-discovery.php:133-178).
    Sort is lexicographic (natural-sort parity is a documented
    non-goal, SURVEY K6)."""
    keys = meta.select("meta_key").distinct().filter(
        ~F.col("meta_key").isin(*META_KEY_BLACKLIST)
    )
    if not include_private:
        keys = keys.filter(~F.col("meta_key").startswith("_"))
    if search:
        keys = keys.filter(F.col("meta_key").contains(search))
    return keys.orderBy("meta_key").limit(limit)


def meta_lines(config: EngineConfig) -> F.Column:
    """P5: selected meta keys rendered by mode — 'json' keeps the raw
    value (values arrive JSON-encoded for nested data), 'text' flattens
    JSON arrays/objects to '; '-joined scalars, else plain()
    (class-field-normalizer.php:299-325)."""
    sel = config.selection.canonical()["meta"]
    lines = []
    for key, mode in sel.items():
        raw = F.element_at(F.col("meta"), F.lit(key))
        if mode == "json":
            rendered = raw
        else:
            # flatten JSON-array values to '; '-joined text; scalars pass through
            parsed = F.from_json(raw, "array<string>")
            rendered = F.when(parsed.isNotNull(), F.array_join(parsed, "; ")).otherwise(
                plain(raw)
            )
        lines.append(
            F.when(
                raw.isNull() | (raw == ""), F.lit("")
            ).otherwise(F.concat(F.lit(key + ": "), rendered))
        )
    return F.array(*lines) if lines else F.array().cast("array<string>")


def seo_lines(config: EngineConfig) -> F.Column:
    """P4: resolve each selected SEO field through the provider key list
    (first non-empty wins), render 'field: value'."""
    lines = []
    for field in config.selection.canonical()["seo"]:
        keys = SEO_PROVIDER_KEYS.get(field, [field])
        val = F.coalesce(
            *[F.element_at(F.col("meta_private"), F.lit(k)) for k in keys], F.lit("")
        )
        cleaned = plain(val)
        lines.append(
            F.when(cleaned == "", F.lit("")).otherwise(
                F.concat(F.lit(field + ": "), cleaned)
            )
        )
    return F.array(*lines) if lines else F.array().cast("array<string>")


# --- P6: ACF type-driven normalization (class-field-normalizer.php:327-444)

ACF_VALUE_SCHEMA = "array<struct<k:string,v:string>>"


def acf_render(type_col: F.Column, value_col: F.Column) -> F.Column:
    """14-type switch rendering an ACF value column (raw string; nested
    values arrive as JSON of [{k,v}] rows):

      text/textarea/wysiwyg → plain()        true_false → 'true'/'false'
      number/range          → as string      select/radio/checkbox → ', ' join
      date/time             → as string      repeater/flexible/group → flatten_kv
      image/gallery/file    → alt/url        default → plain()
    """
    kv = F.from_json(value_col, ACF_VALUE_SCHEMA)
    flatten_kv = F.array_join(  # P8: 'k: v; k2: v2'
        F.transform(kv, lambda r: F.concat_ws(": ", r["k"], r["v"])), "; "
    )
    list_join = F.array_join(F.from_json(value_col, "array<string>"), ", ")
    return (
        F.when(type_col.isin("text", "textarea", "wysiwyg"), plain(value_col))
        .when(
            type_col == "true_false",
            F.when(value_col.isin("1", "true", "True"), "true").otherwise("false"),
        )
        .when(type_col.isin("number", "range"), value_col.cast("string"))
        .when(type_col.isin("select", "radio", "checkbox"), F.coalesce(list_join, plain(value_col)))
        .when(type_col.isin("date_picker", "time_picker", "date_time_picker"), value_col)
        .when(type_col.isin("repeater", "flexible_content", "group"), F.coalesce(flatten_kv, plain(value_col)))
        .when(type_col.isin("image", "gallery", "file"), F.coalesce(list_join, plain(value_col)))
        .otherwise(plain(value_col))
    )


def acf_lines(config: EngineConfig, acf_values: DataFrame | None) -> DataFrame | None:
    """Render selected ACF fields to labelled lines, aggregated per
    product. ``acf_values``: (product_id, name, type, value) rows."""
    rows = config.selection.canonical()["acf"]
    if not rows or acf_values is None:
        return None
    wanted = {r["name"]: r["label"] or r["name"] for r in rows}
    sel = acf_values.filter(F.col("name").isin(list(wanted)))
    label_map = F.create_map(
        *[x for name, label in sorted(wanted.items()) for x in (F.lit(name), F.lit(label))]
    )
    rendered = sel.withColumn("val", acf_render(F.col("type"), F.col("value"))).withColumn(
        "line",
        F.when(
            F.col("val").isNull() | (F.col("val") == ""), F.lit("")
        ).otherwise(F.concat(label_map[F.col("name")], F.lit(": "), F.col("val"))),
    )
    return rendered.groupBy("product_id").agg(
        F.array_sort(F.collect_list("line")).alias("acf_lines")
    )


def object_to_title(df: DataFrame, ref_col: str, posts: DataFrame, out_col: str) -> DataFrame:
    """P9: polymorphic post-reference id → post title via broadcast join
    (class-field-normalizer.php:528-557)."""
    titles = posts.select(
        F.col("product_id").alias("_ref_id"), F.col("title").alias(out_col)
    )
    return df.join(
        F.broadcast(titles), df[ref_col].cast("long") == F.col("_ref_id"), "left"
    ).drop("_ref_id")


def build_documents(
    products: DataFrame,
    config: EngineConfig,
    terms: DataFrame | None = None,
    meta: DataFrame | None = None,
    acf_values: DataFrame | None = None,
) -> DataFrame:
    """The full document-assembly pipeline: core + taxonomy + SEO + meta
    + ACF sections, variation strategy applied, rollup appended (P11).
    Output: one row per document with ``doc_text``."""
    canonical = config.selection.canonical()
    docs = apply_variation_strategy(
        products,
        config.variation_strategy,
        terms=terms,
        max_variations=config.rollup_max_variations,
        values_cap=config.rollup_values_cap,
    )
    docs = normalize_products(docs, config)  # P1/P2/P10 core lines → doc_text

    extra_arrays = []
    if terms is not None and (canonical["tax"] or canonical["attributes"]):
        taxonomies = canonical["tax"] + canonical["attributes"]
        docs = docs.join(terms_lines(terms, taxonomies), "product_id", "left")
        extra_arrays.append(F.coalesce(F.col("tax_lines"), F.array().cast("array<string>")))
    if meta is not None and canonical["meta"]:
        docs = docs.join(meta_map(meta), "product_id", "left")
        extra_arrays.append(meta_lines(config))
    if meta is not None and canonical["seo"]:
        private = meta.groupBy("product_id").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("meta_key", "meta_value")))
            ).alias("meta_private")
        )
        docs = docs.join(private, "product_id", "left")
        extra_arrays.append(seo_lines(config))
    acf = acf_lines(config, acf_values)
    if acf is not None:
        docs = docs.join(acf, "product_id", "left")
        extra_arrays.append(F.coalesce(F.col("acf_lines"), F.array().cast("array<string>")))

    sections = F.concat(
        F.array(F.col("doc_text")),
        *extra_arrays,
        F.array(F.coalesce(F.col("rollup_text"), F.lit(""))),
    )
    non_empty = F.filter(sections, lambda x: x.isNotNull() & (x != ""))
    return docs.withColumn("doc_text", F.array_join(non_empty, "\n"))
