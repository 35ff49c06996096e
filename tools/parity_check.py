"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf, compare
row count, column names, Arrow-level type classes, and the
order-insensitive multiset of *typed* values.

Type-aware on purpose: round 1 shipped oracles whose integer ``sum()``
came back from DuckDB as HUGEINT (Arrow decimal128) while Spark emitted
bigint — identical numerals, different typed hash — and the old
stringifying comparison reported 60/60 while the driver failed 3.  Both
sides are now fetched as Arrow tables; a decimal on one side and an
integer on the other is a FAIL here even when the digits match.

Benign physical differences are still tolerated (they hash equal after
python conversion on the driver too): integer width (int32 vs int64),
float32 vs float64, timestamp unit/timezone (values are normalized to
naive UTC microseconds).

Usage: python tools/parity_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

from wc_vector_indexing_spark.plans.queries import REGISTRY  # noqa: E402
from wc_vector_indexing_spark.session import get_spark  # noqa: E402
from wc_vector_indexing_spark.sources.readers import TABLES  # noqa: E402


def canon_type(t: pa.DataType) -> str:
    """Collapse an Arrow type to the python-object class the driver's
    value hash sees: int widths merge, float widths merge, timestamps
    merge across unit/tz — but decimal stays distinct from int/float."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)},{canon_type(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def norm_cell(v):
    """Typed canonical form: the type CLASS is part of the key, so
    Decimal('33') != 33 even though str() would agree."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{v:.6g}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return "ts:" + v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return f"bytes:{v.hex()}"
    return f"{type(v).__name__}:{v}"


def canon_rows(tbl: pa.Table) -> list[tuple]:
    cols = sorted(tbl.column_names)
    pylists = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    return sorted(tuple(norm_cell(pylists[c][i]) for c in cols) for i in range(n))


def open_oracle(sf: str) -> "duckdb.DuckDBPyConnection":
    """DuckDB connection with the test tables registered as views —
    exactly what the correctness driver does."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def check_query(spark, con, spec, sf: str) -> tuple[str | None, int]:
    """Run one registry entry on Spark and (if oracle-backed) its SQL on
    DuckDB; compare count / columns / canonical types / typed value
    multisets. Returns (error-or-None, spark rowcount). Importable so
    pytest can run the SAME comparison the tool and driver run."""
    try:
        s_tbl = spec.fn(spark, sf).toArrow()
    except Exception as e:  # noqa: BLE001
        return f"spark error: {e}", -1
    if spec.sql is None:
        return None, s_tbl.num_rows
    try:
        d_tbl = con.execute(spec.sql).arrow()
    except Exception as e:  # noqa: BLE001
        return f"duckdb error: {e}", s_tbl.num_rows
    s_cols, d_cols = sorted(s_tbl.column_names), sorted(d_tbl.column_names)
    if s_cols != d_cols:
        return f"columns {s_cols} != {d_cols}", s_tbl.num_rows
    if s_tbl.num_rows != d_tbl.num_rows:
        return (
            f"rowcount spark={s_tbl.num_rows} duckdb={d_tbl.num_rows}",
            s_tbl.num_rows,
        )
    type_diffs = []
    for c in s_cols:
        st = canon_type(s_tbl.schema.field(c).type)
        dt = canon_type(d_tbl.schema.field(c).type)
        if st != dt:
            type_diffs.append(f"{c}: spark={st} duckdb={dt}")
    if type_diffs:
        return "type mismatch: " + "; ".join(type_diffs), s_tbl.num_rows
    cs, cd = canon_rows(s_tbl), canon_rows(d_tbl)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return f"value mismatch; first diffs: {diff}", s_tbl.num_rows
    return None, s_tbl.num_rows


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = open_oracle(sf)

    failures = []
    ran = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        err, n_rows = check_query(spark, con, spec, sf)
        if err is not None:
            print(f"FAIL {name}: {err}")
            failures.append(name)
            continue
        if spec.sql is None:
            print(f"ok   {name}: rows-only, {n_rows} rows ({time.time()-t0:.1f}s)")
            if n_rows == 0 and name != "dedup_minhash_lsh":
                print(f"     WARNING: {name} returned 0 rows")
        else:
            print(f"ok   {name}: {n_rows} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{ran - len(failures)}/{ran} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
