"""Parquet footer triage (operators/parquet_meta.py): the pure-Python
Thrift-compact footer parse verified against pyarrow — the independent
real writer — across codecs, row-group layouts, and schema shapes; plus
the corrupt-bytes ValueError quarantine contract and sniff routing."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wc_vector_indexing_spark.operators.bmp_gif import sniff_format
from wc_vector_indexing_spark.operators.parquet_meta import (
    parse_parquet_footer,
    to_parquet_bytes,
)


@pytest.mark.parametrize("codec", ["uncompressed", "snappy", "gzip", "zstd"])
def test_footer_matches_pyarrow_metadata(codec):
    data = to_parquet_bytes(100, 3, codec=codec, row_group_size=30)
    got = parse_parquet_footer(data)
    md = pq.ParquetFile(io.BytesIO(data)).metadata
    assert got["num_rows"] == md.num_rows == 100
    assert got["n_row_groups"] == md.num_row_groups == 4
    assert got["n_leaf_columns"] == md.num_columns == 3
    assert got["first_rg_rows"] == md.row_group(0).num_rows == 30
    assert got["codec"] == md.row_group(0).column(0).compression.lower()
    assert got["writer"] == md.created_by
    assert got["version"] == 2


@pytest.mark.parametrize(
    "rows,cols,rg", [(1, 1, None), (7, 2, None), (250, 5, 100), (64, 4, 64)]
)
def test_footer_layout_grid(rows, cols, rg):
    got = parse_parquet_footer(to_parquet_bytes(rows, cols, "snappy", rg))
    expect_rg = 1 if rg is None else -(-rows // rg)
    assert got["num_rows"] == rows
    assert got["n_leaf_columns"] == cols
    assert got["n_row_groups"] == expect_rg
    assert got["first_rg_rows"] == (rows if rg is None else min(rows, rg))


def test_footer_nested_schema_counts_leaves_only():
    """A struct column contributes its leaves, not the group node —
    the n_leaf_columns read must match pyarrow's num_columns."""
    table = pa.table(
        {
            "plain": [1, 2],
            "nested": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}],
            "arr": [[1, 2], [3]],
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf)
    got = parse_parquet_footer(buf.getvalue())
    md = pq.ParquetFile(io.BytesIO(buf.getvalue())).metadata
    assert got["n_leaf_columns"] == md.num_columns  # 1 + 2 + 1 leaves
    assert got["num_rows"] == 2


def test_footer_string_and_dictionary_columns():
    table = pa.table({"s": ["aa", "bb", "aa"] * 10, "f": [1.5] * 30})
    buf = io.BytesIO()
    pq.write_table(table, buf, use_dictionary=True)
    got = parse_parquet_footer(buf.getvalue())
    assert got["num_rows"] == 30
    assert got["n_leaf_columns"] == 2


def test_corrupt_quarantine():
    good = to_parquet_bytes(5, 2)
    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(b"NOPE" + good[4:])
    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(good[:-4] + b"NOPE")
    with pytest.raises(ValueError, match="magic"):
        parse_parquet_footer(b"")
    # footer length pointing past the file start
    bad = good[:-8] + b"\xff\xff\xff\x0f" + b"PAR1"
    with pytest.raises(ValueError, match="overruns"):
        parse_parquet_footer(bad)
    # truncated thrift payload: chop bytes out of the footer body
    footer_trunc = good[: len(good) - 200] + good[-8:]
    with pytest.raises(ValueError):
        parse_parquet_footer(footer_trunc)


def test_sniff_routes_parquet():
    assert sniff_format(to_parquet_bytes(3, 1)) == "parquet"
    assert sniff_format(b"\x28\xb5\x2f\xfd" + bytes(8)) == "zstd"


def test_column_stats_match_pyarrow_metadata():
    import pyarrow.parquet as pq
    import io

    from wc_vector_indexing_spark.operators.parquet_meta import (
        parquet_column_stats,
        to_parquet_bytes,
    )

    data = to_parquet_bytes(16, 3, codec="zstd", row_group_size=5)
    got = parquet_column_stats(data)
    meta = pq.ParquetFile(io.BytesIO(data)).metadata
    assert len(got) == meta.num_row_groups * meta.num_columns
    for s in got:
        col = meta.row_group(s["rg"]).column(s["column"] == "c0" and 0
                                             or int(s["column"][1:]))
        assert s["num_values"] == col.num_values
        assert s["min_v"] == col.statistics.min
        assert s["max_v"] == col.statistics.max
        assert s["null_count"] == col.statistics.null_count


def test_column_stats_string_and_null_columns():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from wc_vector_indexing_spark.operators.parquet_meta import (
        parquet_column_stats,
    )

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"s": ["m", "a", "z", None], "v": [3.5, None, -1.5, 0.0]}),
        buf,
    )
    got = {s["column"]: s for s in parquet_column_stats(buf.getvalue())}
    assert got["s"]["min_v"] == "a" and got["s"]["max_v"] == "z"
    assert got["s"]["null_count"] == 1
    assert got["v"]["min_v"] == -1.5 and got["v"]["max_v"] == 3.5


def test_skippable_row_groups_rules():
    from wc_vector_indexing_spark.operators.parquet_meta import (
        parquet_column_stats,
        skippable_row_groups,
        to_parquet_bytes,
    )

    stats = parquet_column_stats(to_parquet_bytes(18, 1, row_group_size=6))
    # c0 = row index: rg bounds [0..5], [6..11], [12..17]
    assert skippable_row_groups(stats, "c0", 7) == ([1], [0, 2])
    assert skippable_row_groups(stats, "c0", 99) == ([], [0, 1, 2])
    # absent stats are conservatively kept
    blind = [{**s, "min_v": None, "max_v": None} for s in stats]
    assert skippable_row_groups(blind, "c0", 99) == ([0, 1, 2], [])
