"""Parquet footer triage (the public parquet-format Thrift schema +
Thrift compact protocol): row counts, row-group layout, leaf-column
count, compression codec and writer string read straight from the
`PAR1` footer WITHOUT touching a single data page — the first question
a 100 TB lake asks of every foreign file ("how big, how laid out, who
wrote you") answered in one constant-time tail read per blob.

The parser is pure Python over the wire format (varint/zigzag ints,
short/long-form field headers, size-prefixed lists, nested structs —
Apache Thrift compact protocol spec) against the parquet-format
`FileMetaData` IDL (field ids 1=version, 2=schema, 3=num_rows,
4=row_groups, 6=created_by; SchemaElement 4=name, 5=num_children;
RowGroup 1=columns, 3=num_rows; ColumnMetaData 4=codec). It shares no
code with pyarrow, which the tests and fixtures use as the independent
WRITER half — real files from the real writer, parsed by this reader.

Spark shape: a constant-time per-blob tail read, zero shuffle; at
cluster scale this is the `spark.read.format("binaryFile")` triage pass
that decides routing before any distributed scan is planned.

Reference note: the reference engine ingests only its own store rows
(SURVEY §1.1) and delegates file triage to SaaS; north-star
training-pipeline surface, public spec only.
"""

from __future__ import annotations

import io
import struct

from wc_vector_indexing_spark.operators.contract import quarantine

# thrift compact protocol element types
_STOP, _BOOL_T, _BOOL_F, _I8, _I16, _I32, _I64 = 0, 1, 2, 3, 4, 5, 6
_DOUBLE, _BINARY, _LIST, _SET, _MAP, _STRUCT = 7, 8, 9, 10, 11, 12

_CODEC_NAMES = {
    0: "uncompressed", 1: "snappy", 2: "gzip", 3: "lzo",
    4: "brotli", 5: "lz4", 6: "zstd", 7: "lz4_raw",
}


class _Reader:
    """Cursor over footer bytes; every read raises ValueError (not
    IndexError/struct.error) on truncation so the decode-quarantine
    contract holds."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("parquet footer: truncated")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("parquet footer: truncated")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def varint(self) -> int:
        result = shift = 0
        while True:
            b = self.byte()
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7
            if shift > 70:
                raise ValueError("parquet footer: varint overruns")

    def zigzag(self) -> int:
        n = self.varint()
        return (n >> 1) ^ -(n & 1)


def _read_value(r: _Reader, ctype: int):
    if ctype in (_BOOL_T, _BOOL_F):
        # container/list element form: one explicit byte
        return r.byte() == 1
    if ctype == _I8:
        return r.byte()
    if ctype in (_I16, _I32, _I64):
        return r.zigzag()
    if ctype == _DOUBLE:
        return struct.unpack("<d", r.take(8))[0]
    if ctype == _BINARY:
        return r.take(r.varint())
    if ctype in (_LIST, _SET):
        head = r.byte()
        size, etype = head >> 4, head & 0x0F
        if size == 0x0F:
            size = r.varint()
        return [_read_value(r, etype) for _ in range(size)]
    if ctype == _MAP:
        size = r.varint()
        if size == 0:
            return {}
        kv = r.byte()
        ktype, vtype = kv >> 4, kv & 0x0F
        return {
            _read_value(r, ktype): _read_value(r, vtype) for _ in range(size)
        }
    if ctype == _STRUCT:
        return _read_struct(r)
    raise ValueError(f"parquet footer: unknown thrift type {ctype}")


def _read_struct(r: _Reader) -> dict:
    """Struct → {field_id: value}; booleans ride in the field header."""
    fields: dict[int, object] = {}
    last_id = 0
    while True:
        head = r.byte()
        if head == _STOP:
            return fields
        delta, ctype = head >> 4, head & 0x0F
        fid = last_id + delta if delta else r.zigzag()
        last_id = fid
        if ctype == _BOOL_T:
            fields[fid] = True
        elif ctype == _BOOL_F:
            fields[fid] = False
        else:
            fields[fid] = _read_value(r, ctype)
    # unreachable


@quarantine("parquet footer")
def parse_parquet_footer(data: bytes) -> dict:
    """→ version, num_rows, n_row_groups, n_leaf_columns, first_rg_rows,
    codec (name of the first column chunk's codec), writer (created_by).
    Raises ValueError for non-parquet or truncated bytes."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise ValueError("parquet: missing PAR1 magic")
    footer_len = struct.unpack("<I", data[-8:-4])[0]
    if footer_len + 8 > len(data):
        raise ValueError("parquet: footer length overruns the file")
    meta = _read_struct(_Reader(data[len(data) - 8 - footer_len : -8]))

    schema = meta.get(2) or []
    if not schema or not isinstance(schema, list):
        raise ValueError("parquet: footer carries no schema")
    # leaves = elements with no children; schema[0] is the root group
    leaves = [
        el for el in schema[1:]
        if isinstance(el, dict) and not el.get(5)
    ]
    row_groups = meta.get(4) or []
    first_rg_rows = None
    codec = None
    if row_groups:
        first_rg = row_groups[0]
        first_rg_rows = first_rg.get(3)
        chunks = first_rg.get(1) or []
        if chunks and isinstance(chunks[0], dict):
            col_meta = chunks[0].get(3) or {}
            codec = _CODEC_NAMES.get(col_meta.get(4))
    created_by = meta.get(6)
    return {
        "version": meta.get(1),
        "num_rows": meta.get(3),
        "n_row_groups": len(row_groups),
        "n_leaf_columns": len(leaves),
        "first_rg_rows": first_rg_rows,
        "codec": codec,
        "writer": created_by.decode("utf-8", "replace")
        if isinstance(created_by, bytes) else None,
    }


_TYPE_INT32, _TYPE_INT64, _TYPE_FLOAT, _TYPE_DOUBLE, _TYPE_BYTES = 1, 2, 4, 5, 6


def _decode_stat(raw: bytes | None, ptype: int):
    """Statistics min/max are plain-encoded per the physical type."""
    if raw is None or not isinstance(raw, bytes):
        return None
    if ptype == _TYPE_INT32 and len(raw) == 4:
        return struct.unpack("<i", raw)[0]
    if ptype == _TYPE_INT64 and len(raw) == 8:
        return struct.unpack("<q", raw)[0]
    if ptype == _TYPE_FLOAT and len(raw) == 4:
        return float(struct.unpack("<f", raw)[0])
    if ptype == _TYPE_DOUBLE and len(raw) == 8:
        return struct.unpack("<d", raw)[0]
    if ptype == _TYPE_BYTES:
        return raw.decode("utf-8", "replace")
    return None


@quarantine("parquet footer")
def parquet_column_stats(data: bytes) -> list[dict]:
    """Per-(row_group, column) min/max/null statistics straight from
    the footer — the file-skipping index: at 100 TB, a predicate that
    prunes by these bounds never schedules the row group at all (the
    same machinery Spark's parquet filter pushdown consults; this
    parse makes it inspectable as a census). One dict per column
    chunk: rg, column (dotted path), type, num_values, null_count,
    min_v, max_v (decoded for int/float/bytes physical types;
    new-field 5/6 preferred, deprecated 1/2 the fallback per the
    format's stats history)."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise ValueError("parquet: missing PAR1 magic")
    footer_len = struct.unpack("<I", data[-8:-4])[0]
    if footer_len + 8 > len(data):
        raise ValueError("parquet: footer length overruns the file")
    meta = _read_struct(_Reader(data[len(data) - 8 - footer_len : -8]))
    out: list[dict] = []
    for rg_no, rg in enumerate(meta.get(4) or []):
        if not isinstance(rg, dict):
            raise ValueError("parquet: row group is not a struct")
        for chunk in rg.get(1) or []:
            cm = chunk.get(3) if isinstance(chunk, dict) else None
            if not isinstance(cm, dict):
                raise ValueError("parquet: column chunk without metadata")
            ptype = cm.get(1)
            path = cm.get(3) or []
            if not isinstance(path, list):
                raise ValueError("parquet: column path is not a list")
            name = ".".join(
                p.decode("utf-8", "replace") if isinstance(p, bytes) else str(p)
                for p in path
            )
            stats = cm.get(12) if isinstance(cm.get(12), dict) else {}
            min_raw = stats.get(6, stats.get(2))
            max_raw = stats.get(5, stats.get(1))
            out.append({
                "rg": rg_no,
                "column": name,
                "type": ptype,
                "num_values": cm.get(5),
                "null_count": stats.get(3),
                "min_v": _decode_stat(min_raw, ptype),
                "max_v": _decode_stat(max_raw, ptype),
            })
    return out


def skippable_row_groups(
    stats: list[dict], column: str, value,
) -> tuple[list[int], list[int]]:
    """(kept, skipped) row-group indexes for an equality predicate
    ``column = value`` judged purely by footer min/max — the driver-
    side planning decision file skipping makes before any I/O. A row
    group with missing bounds is conservatively KEPT (absent stats
    must never drop data)."""
    kept, skipped = [], []
    for s in stats:
        if s["column"] != column:
            continue
        lo, hi = s["min_v"], s["max_v"]
        if lo is not None and hi is not None and (value < lo or value > hi):
            skipped.append(s["rg"])
        else:
            kept.append(s["rg"])
    return kept, skipped


def to_parquet_bytes(
    n_rows: int,
    n_cols: int,
    codec: str = "snappy",
    row_group_size: int | None = None,
) -> bytes:
    """Fixture/export half: a REAL parquet file from the real writer
    (pyarrow), so the pure-Python footer parse above is verified against
    an implementation it shares nothing with. Columns are c0..c{k-1}
    int64 with deterministic values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {f"c{j}": [i * (j + 1) for i in range(n_rows)] for j in range(n_cols)}
    )
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        compression=None if codec == "uncompressed" else codec,
        row_group_size=row_group_size,
    )
    return buf.getvalue()
