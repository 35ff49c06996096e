"""The parity tool must be type-aware: round 1's driver gate failed on
DuckDB HUGEINT (Arrow decimal128) vs Spark BIGINT (int64) while the old
stringifying parity_check reported a pass.  These tests pin the tool's
canonicalization so that class of bug cannot hide again."""

import datetime as dt
import decimal

import pyarrow as pa

from tools.parity_check import canon_rows, canon_type, norm_cell


def test_decimal_vs_int_types_differ():
    assert canon_type(pa.decimal128(38, 0)) != canon_type(pa.int64())


def test_int_widths_merge():
    assert canon_type(pa.int32()) == canon_type(pa.int64())


def test_float_widths_merge():
    assert canon_type(pa.float32()) == canon_type(pa.float64())


def test_timestamp_unit_tz_merge():
    assert canon_type(pa.timestamp("us", tz="UTC")) == canon_type(pa.timestamp("ns"))


def test_list_inner_type_counts():
    assert canon_type(pa.list_(pa.int64())) != canon_type(pa.list_(pa.decimal128(38, 0)))


def test_norm_cell_decimal_vs_int_value_differs():
    # identical numerals, different typed hash — the round-1 failure mode
    assert norm_cell(decimal.Decimal("33")) != norm_cell(33)


def test_norm_cell_timestamps_normalize_to_naive_utc():
    aware = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    naive = dt.datetime(2024, 1, 1, 12, 0, 0)
    assert norm_cell(aware) == norm_cell(naive)


def test_canon_rows_order_insensitive_but_typed():
    t_int = pa.table({"a": pa.array([2, 1], type=pa.int64())})
    t_int2 = pa.table({"a": pa.array([1, 2], type=pa.int64())})
    t_dec = pa.table({"a": pa.array([decimal.Decimal(1), decimal.Decimal(2)],
                                    type=pa.decimal128(38, 0))})
    assert canon_rows(t_int) == canon_rows(t_int2)
    assert canon_rows(t_int) != canon_rows(t_dec)
