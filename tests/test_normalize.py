"""Full normalization surface (P1-P14) + variation rollup (A1) +
variation strategies (dev-plan :2215-2218)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig, Selection
from wc_vector_indexing_spark.functions.text import error_snippet, mask_secret, plain
from wc_vector_indexing_spark.operators.normalize import (
    acf_render,
    build_documents,
    meta_map,
    object_to_title,
    terms_lines,
)
from wc_vector_indexing_spark.operators.rollup import (
    apply_variation_strategy,
    money,
    prettify_attribute,
    rollup_variations,
)


T0 = datetime(2025, 6, 1)


@pytest.fixture()
def catalog(spark):
    products = spark.createDataFrame(
        [
            Row(product_id=1, parent_id=0, product_type="variable", status="publish",
                title="Parent Shirt", short_description="<b>Soft</b>   shirt",
                description="A parent product.", sku="PAR-1", price=None, sale_price=19.99,
                stock_status="instock", permalink="https://x/p/1", image_alt="shirt",
                modified_at=T0),
            Row(product_id=11, parent_id=1, product_type="variation", status="publish",
                title="Parent Shirt - Red", short_description="", description="",
                sku="PAR-1-R", price=9.99, sale_price=None, stock_status="instock",
                permalink="https://x/p/11", image_alt="", modified_at=T0),
            Row(product_id=12, parent_id=1, product_type="variation", status="publish",
                title="Parent Shirt - Blue", short_description="", description="",
                sku="PAR-1-B", price=24.99, sale_price=None, stock_status="instock",
                permalink="https://x/p/12", image_alt="", modified_at=T0),
            Row(product_id=2, parent_id=0, product_type="simple", status="publish",
                title="Simple Mug", short_description="", description="Just a mug.",
                sku="MUG-2", price=7.5, sale_price=None, stock_status="instock",
                permalink="https://x/p/2", image_alt="mug", modified_at=T0),
        ]
    )
    terms = spark.createDataFrame(
        [
            Row(product_id=1, taxonomy="product_cat", term_name="Apparel"),
            Row(product_id=1, taxonomy="product_tag", term_name="summer"),
            Row(product_id=11, taxonomy="pa_color", term_name="Red"),
            Row(product_id=12, taxonomy="pa_color", term_name="Blue"),
            Row(product_id=2, taxonomy="product_cat", term_name="Kitchen"),
        ]
    )
    meta = spark.createDataFrame(
        [
            Row(product_id=2, meta_key="material", meta_value="ceramic"),
            Row(product_id=2, meta_key="spec_json", meta_value='["dishwasher","microwave"]'),
            Row(product_id=2, meta_key="_private_key", meta_value="hidden"),
            Row(product_id=2, meta_key="_yoast_wpseo_title", meta_value="Best Mug"),
        ]
    )
    return products, terms, meta


def test_plain_and_masks(spark):
    df = spark.createDataFrame([Row(x="<p>Hello   <b>world</b></p>\n ok", k="sk-abcdef1234")])
    r = df.select(
        plain("x").alias("p"),
        mask_secret("k").alias("m"),
        error_snippet(F.lit("<b>err</b> " + "y" * 500), 20).alias("e"),
    ).head()
    assert r.p == "Hello world ok"
    assert r.m == "****1234"
    assert len(r.e) == 20 and r.e.startswith("err")


def test_prettify_and_money(spark):
    df = spark.createDataFrame([Row(t="attribute_pa_heel-height", p=3.5)])
    r = df.select(prettify_attribute("t").alias("a"), money("p").alias("m")).head()
    assert r.a == "Heel Height"
    assert r.m == "3.50"


def test_terms_lines(spark, catalog):
    _, terms, _ = catalog
    out = {r.product_id: r.tax_lines for r in terms_lines(terms, ["product_cat", "pa_color"]).collect()}
    assert out[2] == ["Product Cat: Kitchen"]
    assert out[11] == ["Color: Red"]


def test_meta_map_privacy(spark, catalog):
    _, _, meta = catalog
    m = {r.product_id: r.meta for r in meta_map(meta).collect()}
    assert "material" in m[2] and "_private_key" not in m[2]
    m2 = {r.product_id: r.meta for r in meta_map(meta, include_private=True).collect()}
    assert "_private_key" in m2[2]


def test_acf_render_types(spark):
    rows = [
        Row(t="text", v="<b>hello</b>  x"),
        Row(t="true_false", v="1"),
        Row(t="number", v="42"),
        Row(t="checkbox", v='["a","b"]'),
        Row(t="repeater", v='[{"k":"size","v":"L"},{"k":"fit","v":"slim"}]'),
    ]
    df = spark.createDataFrame(rows)
    out = [r.r for r in df.select(acf_render(F.col("t"), F.col("v")).alias("r")).collect()]
    assert out == ["hello x", "true", "42", "a, b", "size: L; fit: slim"]


def test_object_to_title(spark, catalog):
    products, _, _ = catalog
    refs = spark.createDataFrame([Row(ref="2"), Row(ref="999")])
    out = object_to_title(refs, "ref", products, "ref_title").orderBy("ref").collect()
    assert out[0].ref_title == "Simple Mug"
    assert out[1].ref_title is None


def test_rollup_block(spark, catalog):
    products, terms, _ = catalog
    children = products.filter("product_type = 'variation'").select(
        "parent_id", "product_id", "price", "sku"
    )
    block = rollup_variations(children, terms, values_cap=1).head()
    assert block.parent_id == 1
    assert "Variations: 2" in block.rollup_text
    assert "Price range: 9.99 – 24.99" in block.rollup_text
    assert "Color: Blue, +1 more" in block.rollup_text  # cap + overflow marker
    assert "SKUs: PAR-1-B, +1 more" in block.rollup_text


def test_rollup_block_all_null_prices(spark):
    # all children priceless: the count line must still render (the
    # reference emits it unconditionally; only the price-range line is
    # conditional on prices existing)
    children = spark.createDataFrame(
        [
            Row(parent_id=7, product_id=71, price=None, sku="A-1"),
            Row(parent_id=7, product_id=72, price=None, sku="A-2"),
        ],
        "parent_id int, product_id int, price double, sku string",
    )
    block = rollup_variations(children).head()
    assert "Variations: 2" in block.rollup_text
    assert "Price range" not in block.rollup_text
    assert "SKUs: A-1, A-2" in block.rollup_text


def test_variation_strategies(spark, catalog):
    products, terms, _ = catalog
    sep = apply_variation_strategy(products, "separate")
    assert sep.count() == 4
    par = apply_variation_strategy(products, "parent_only")
    assert {r.product_id for r in par.collect()} == {1, 2}
    col = apply_variation_strategy(products, "collapse", terms=terms)
    rows = {r.product_id: r.rollup_text for r in col.collect()}
    assert set(rows) == {1, 2}
    assert rows[1] and "Variations: 2" in rows[1]
    assert rows[2] is None  # simple product: no block


def test_build_documents_full(spark, catalog):
    products, terms, meta = catalog
    config = EngineConfig(
        model="fake-deterministic-64",
        chunking=ChunkingConfig(size=100, overlap=10),
        variation_strategy="collapse",
        selection=Selection(
            core=["title", "short_description", "description", "sku", "price"],
            tax=["product_cat", "product_tag"],
            attributes=["pa_color"],
            seo=["seo_title"],
            meta={"material": "text", "spec_json": "json"},
        ),
    )
    docs = build_documents(products, config, terms=terms, meta=meta)
    by_id = {r.product_id: r.doc_text for r in docs.collect()}
    assert set(by_id) == {1, 2}  # collapse drops variations
    p1, p2 = by_id[1], by_id[2]
    assert "Title: Parent Shirt" in p1
    assert "Short description: Soft shirt" in p1  # P2 strip tags
    assert "Price: 19.99" in p1  # coalesce fallback to sale price
    assert "Product Cat: Apparel" in p1 and "Product Tag: summer" in p1
    assert "Variations: 2" in p1 and "Color: Blue, Red" in p1  # rollup appended
    assert "material: ceramic" in p2
    assert 'spec_json: ["dishwasher","microwave"]' in p2  # json mode raw
    assert "seo_title: Best Mug" in p2  # provider key resolution
    # determinism
    again = {r.product_id: r.doc_text for r in build_documents(products, config, terms=terms, meta=meta).collect()}
    assert again == by_id


def test_discover_meta_keys(spark, catalog):
    from wc_vector_indexing_spark.operators.normalize import discover_meta_keys

    _, _, meta = catalog
    keys = [r.meta_key for r in discover_meta_keys(meta).collect()]
    assert keys == ["material", "spec_json"]  # private excluded, sorted
    with_private = [r.meta_key for r in discover_meta_keys(meta, include_private=True).collect()]
    assert "_private_key" in with_private
    filtered = [r.meta_key for r in discover_meta_keys(meta, search="spec").collect()]
    assert filtered == ["spec_json"]


def test_text_transform_hook_changes_fingerprint(spark):
    """U2 hook (wcvec/final_normalized_text): the transform participates
    in fingerprints, so changing it triggers re-embedding."""
    from pyspark.sql import Row

    from wc_vector_indexing_spark.config import ChunkingConfig, EngineConfig
    from wc_vector_indexing_spark.operators.indexer import build_chunks

    config = EngineConfig(
        model="fake-deterministic-64", chunking=ChunkingConfig(size=100, overlap=10)
    )
    docs = spark.createDataFrame([Row(product_id=1, text="hook target text.")])
    plain_rows = build_chunks(docs, config, text_col="text").collect()
    hooked_rows = build_chunks(
        docs, config, text_col="text",
        text_transform=lambda c: F.concat(F.lit("PREFIX "), c),
    ).collect()
    assert hooked_rows[0].chunk_text.startswith("PREFIX ")
    assert plain_rows[0].product_sha != hooked_rows[0].product_sha
    assert plain_rows[0].chunk_sha != hooked_rows[0].chunk_sha


def test_natural_sort_k6(spark):
    from pyspark.sql import Row

    from wc_vector_indexing_spark.functions.text import (
        natural_array_sort,
        natural_sort_key,
    )

    df = spark.createDataFrame([Row(xs=["item10", "item2", "Item1", "b", "a2", "a10"])])
    out = df.select(natural_array_sort(F.col("xs")).alias("s")).head().s
    # digit runs compare numerically; case-sensitive form sorts 'I' < 'a'
    assert out == ["Item1", "a2", "a10", "b", "item2", "item10"]
    ci = df.select(
        natural_array_sort(F.col("xs"), case_insensitive=True).alias("s")
    ).head().s
    assert ci == ["a2", "a10", "b", "Item1", "item2", "item10"]
    k = df.select(natural_sort_key(F.lit("v2"))).head()[0]
    assert k == "v000000000002"


def test_rollup_values_natural_order(spark):
    from pyspark.sql import Row

    from datetime import datetime

    t = datetime(2026, 1, 1)
    children = spark.createDataFrame(
        [
            Row(parent_id=1, product_id=10, price=1.0, sku="SKU-2", modified_at=t),
            Row(parent_id=1, product_id=11, price=2.0, sku="SKU-10", modified_at=t),
        ]
    )
    terms = spark.createDataFrame(
        [
            Row(product_id=10, taxonomy="pa_size", term_name="size10"),
            Row(product_id=11, taxonomy="pa_size", term_name="size2"),
        ]
    )
    block = rollup_variations(children, terms).head().rollup_text
    # natural order: 2 before 10, in both the SKU list and the values
    assert "SKU-2, SKU-10" in block
    assert "size2, size10" in block
