"""Sequence packing — assign documents to fixed token-budget training
bins (the "pack short docs together" step before batching a training
run; see e.g. the packing discussion in Raffel et al. 2020 §3.1.2 —
public). Greedy by cumulative token offset: within each packing group,
docs are laid end-to-end in deterministic (doc_id) order and a doc
belongs to the bin containing its first token. Bins can overflow by at
most one document tail — the standard approximation; training-side
truncation/wraparound handles the boundary, and the assignment needs
no sequential state.

Scale shape: the window partitions by ``group_col`` (source, shard,
date...), so packing parallelizes across groups — there is no global
order and no single-partition window. One shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wc_vector_indexing_spark.operators.textstats import token_count


def sequence_packing(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, group, n_tokens, bin_id): bin_id is local to the group.
    Deterministic: same data → same packing, on any engine (the DuckDB
    oracle runs the identical window)."""
    n_tok = token_count(F.col(text_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = docs.select(
        F.col(id_col), F.col(group_col), n_tok.alias("n_tokens")
    ).withColumn("_cum", F.sum("n_tokens").over(w))
    return with_cum.select(
        id_col,
        group_col,
        "n_tokens",
        F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(budget))
        .cast("long")
        .alias("bin_id"),
    )


def packing_stats(packed: DataFrame, budget: int = 2048, group_col: str = "source") -> DataFrame:
    """(group, n_bins, avg_fill): how full the packed bins are — the
    waste audit (1 - avg_fill is padding you would have trained on)."""
    per_bin = packed.groupBy(group_col, "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens")
    )
    return per_bin.groupBy(group_col).agg(
        F.count("*").alias("n_bins"),
        F.round(F.avg(F.least(F.col("bin_tokens"), F.lit(budget))) / budget, 4).alias(
            "avg_fill"
        ),
    )


def pack_encoded(
    enc: DataFrame,
    groups: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Packed MODEL-INPUT sequences: join vocab-encoded docs
    (vocab.encode_tokens output: id, n_tokens, token_ids) to their
    packing group, assign bins by the same cumulative-offset rule as
    ``sequence_packing`` (but over the ENCODED token counts, so the
    budget is measured in actual model tokens), and concatenate each
    bin's id arrays in doc order.

    Returns (group, bin_id, n_docs, bin_tokens, seq array<int>) — seq
    is the training sequence, docs laid end-to-end deterministically.
    One window + one groupBy, both keyed by the packing group.
    """
    with_grp = enc.join(groups.select(id_col, group_col), id_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = with_grp.withColumn("_cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id",
        F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(float(budget))).cast("long"),
    )
    return (
        binned.groupBy(group_col, "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(id_col, "token_ids"))),
                    lambda x: x["token_ids"],
                )
            ).alias("seq"),
        )
    )
