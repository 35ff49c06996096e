"""Avro Object Container File source — the third bulk interchange
format (after TFRecord and tar/WebDataset) that training-data
pipelines ingest: Kafka dumps, Hive exports, and event-log archives
ship as ``.avro`` container files. Implemented from the PUBLIC Avro
1.11 specification (container format + binary encoding) in pure
stdlib — no avro package, no spark-avro jar (the external module is
not part of a stock PySpark install, so a self-contained reader is
the portable path).

Container layout (spec §Object Container Files)::

    magic "Obj\\x01"
    file metadata map: avro.schema (JSON), avro.codec (null|deflate)
    16-byte sync marker
    blocks: long count, long byte-size, data (codec-compressed), sync

Binary encoding (spec §Binary Encoding): int/long are zigzag varints;
float/double little-endian IEEE; bytes/string length-prefixed; unions
write the zigzag branch index then the value; arrays write counted
segments terminated by a 0 count.

Supported schema subset (typed-ingest posture — the caller supplies
the reader schema, as with ``read_jsonl_corpus``'s explicit-schema
path): top-level record of null / boolean / int / long / float /
double / bytes / string fields, unions of [null, X], and arrays of
primitives. Anything else raises the contract ``NotImplementedError``
seam.

Spark shape: whole-file ``binaryFile`` scan → one Arrow
``mapInPandas`` parse pass, zero shuffle — per-SHARD parallelism like
the WARC/WET/TFRecord readers. Every block's sync marker is verified
against the header's, so a spliced or mis-framed file is DETECTED
(contract ValueError), and ``on_error='skip'`` drops a rotten shard
whole (all-or-nothing, same 100 TB contract as the other readers).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"

_PRIMS = ("null", "boolean", "int", "long", "float", "double", "bytes", "string")


# ------------------------------------------------------------ binary codec

def _enc_long(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)  # zigzag (Python ints: arithmetic shift is fine)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated avro varint")
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return (val >> 1) ^ -(val & 1), i
        shift += 7
        if shift > 70:
            raise ValueError("avro varint overflow")


def _take(buf: bytes, i: int, n: int) -> tuple[bytes, int]:
    if n < 0 or i + n > len(buf):
        raise ValueError("avro value runs past end of block")
    return buf[i:i + n], i + n


def _base_type(schema):
    """Logical types (timestamp-millis, date, uuid, ...) annotate a
    base type; per the spec a reader that doesn't implement the
    logical type MUST fall back to the base type — so {"type":"long",
    "logicalType":"timestamp-micros"} reads as a plain long here."""
    if (
        isinstance(schema, dict)
        and schema.get("type") in _PRIMS
        and "logicalType" in schema
    ):
        return schema["type"]
    return schema


def _enc_value(schema, v) -> bytes:
    schema = _base_type(schema)
    if isinstance(schema, list):  # union — branch index then value
        for idx, branch in enumerate(schema):
            if (v is None) == (branch == "null"):
                return _enc_long(idx) + _enc_value(branch, v)
        raise ValueError(f"no union branch for {v!r} in {schema}")
    if isinstance(schema, dict):
        if schema.get("type") == "array":
            if not v:
                return _enc_long(0)
            body = b"".join(_enc_value(schema["items"], x) for x in v)
            return _enc_long(len(v)) + body + _enc_long(0)
        raise NotImplementedError(f"unsupported avro schema {schema}")
    if schema == "null":
        return b""
    if schema == "boolean":
        return b"\x01" if v else b"\x00"
    if schema in ("int", "long"):
        return _enc_long(int(v))
    if schema == "float":
        return struct.pack("<f", v)
    if schema == "double":
        return struct.pack("<d", v)
    if schema == "string":
        raw = v.encode("utf-8")
        return _enc_long(len(raw)) + raw
    if schema == "bytes":
        return _enc_long(len(v)) + bytes(v)
    raise NotImplementedError(f"unsupported avro type {schema!r}")


def _dec_value(schema, buf: bytes, i: int):
    schema = _base_type(schema)
    if isinstance(schema, list):
        idx, i = _dec_long(buf, i)
        if not 0 <= idx < len(schema):
            raise ValueError("avro union branch out of range")
        return _dec_value(schema[idx], buf, i)
    if isinstance(schema, dict):
        if schema.get("type") == "array":
            out = []
            while True:
                count, i = _dec_long(buf, i)
                if count == 0:
                    return out, i
                if count < 0:  # spec: negative count ⇒ block byte size follows
                    count = -count
                    _, i = _dec_long(buf, i)
                if count > len(buf) - i:  # every non-null item is ≥1 byte
                    raise ValueError("avro array count past end of block")
                for _ in range(count):
                    v, i = _dec_value(schema["items"], buf, i)
                    out.append(v)
        raise NotImplementedError(f"unsupported avro schema {schema}")
    if schema == "null":
        return None, i
    if schema == "boolean":
        b, i = _take(buf, i, 1)
        return b != b"\x00", i
    if schema in ("int", "long"):
        return _dec_long(buf, i)
    if schema == "float":
        b, i = _take(buf, i, 4)
        return struct.unpack("<f", b)[0], i
    if schema == "double":
        b, i = _take(buf, i, 8)
        return struct.unpack("<d", b)[0], i
    if schema == "string":
        n, i = _dec_long(buf, i)
        b, i = _take(buf, i, n)
        return b.decode("utf-8"), i
    if schema == "bytes":
        n, i = _dec_long(buf, i)
        b, i = _take(buf, i, n)
        return bytes(b), i
    raise NotImplementedError(f"unsupported avro type {schema!r}")


def _check_record_schema(schema: dict) -> list[tuple[str, object]]:
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise NotImplementedError("top-level avro schema must be a record")
    fields = []
    raw_fields = schema.get("fields", [])
    if not isinstance(raw_fields, list):
        raise ValueError("avro record 'fields' is not a list")
    for f in raw_fields:
        if not isinstance(f, dict) or "name" not in f or "type" not in f:
            raise ValueError(f"malformed avro field {f!r}")
        ftype = f["type"]
        base = _base_type(ftype)
        if isinstance(base, list):
            base = [_base_type(b) for b in base]
        ok = (
            base in _PRIMS
            or (isinstance(base, list)
                and all(b in _PRIMS for b in base))
            or (isinstance(base, dict) and base.get("type") == "array"
                and _base_type(base.get("items")) in _PRIMS
                and _base_type(base.get("items")) != "null")  # zero-byte
                # items would make a corrupted count an unbounded loop
        )
        if not ok:
            raise NotImplementedError(f"unsupported field type {ftype}")
        fields.append((f["name"], ftype))
    return fields


# --------------------------------------------------------------- container

def iter_avro_container(schema: dict, rows, codec: str = "deflate",
                        max_block_records: int = 1024):
    """Yield one Avro object-container file as byte chunks — the
    header first, then one chunk per data block of up to
    ``max_block_records`` rows. ``rows`` may be any iterable: peak
    memory is one block, not the container, which is what lets the
    distributed sink stream a ~1 GB shard through an executor without
    materializing it (see :func:`write_avro`). Deterministic output
    (sync marker is a hash of the schema), so fixtures are
    byte-stable."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be 'null' or 'deflate'")
    fields = _check_record_schema(schema)
    schema_json = json.dumps(schema, sort_keys=True).encode("utf-8")
    sync = hashlib.md5(schema_json).digest()
    meta = {"avro.schema": schema_json, "avro.codec": codec.encode()}
    head = bytearray(MAGIC)
    head += _enc_long(len(meta))
    for k in sorted(meta):
        head += _enc_value("string", k) + _enc_value("bytes", meta[k])
    head += _enc_long(0)  # map terminator
    head += sync
    yield bytes(head)

    def block(chunk: list[dict]) -> bytes:
        body = b"".join(
            b"".join(_enc_value(ftype, row.get(name)) for name, ftype in fields)
            for row in chunk
        )
        if codec == "deflate":
            body = zlib.compress(body)[2:-4]  # raw deflate per spec
        return _enc_long(len(chunk)) + _enc_long(len(body)) + body + sync

    chunk: list[dict] = []
    for row in rows:
        chunk.append(row)
        if len(chunk) >= max_block_records:
            yield block(chunk)
            chunk = []
    if chunk:
        yield block(chunk)


def to_avro_bytes(schema: dict, rows: list[dict], codec: str = "deflate",
                  max_block_records: int = 1024) -> bytes:
    """Serialize ``rows`` (dicts keyed by field name) as one Avro
    object-container file (the eager convenience form of
    :func:`iter_avro_container`)."""
    return b"".join(iter_avro_container(
        schema, rows, codec=codec, max_block_records=max_block_records))


def _read_meta_map(buf: bytes, i: int) -> tuple[dict[str, bytes], int]:
    meta: dict[str, bytes] = {}
    while True:
        count, i = _dec_long(buf, i)
        if count == 0:
            return meta, i
        if count < 0:
            count = -count
            _, i = _dec_long(buf, i)
        if count > len(buf) - i:
            raise ValueError("avro metadata count past end of file")
        for _ in range(count):
            k, i = _dec_value("string", buf, i)
            v, i = _dec_value("bytes", buf, i)
            meta[k] = v


def parse_avro_file(data: bytes) -> tuple[dict, list[dict]]:
    """Walk one container file → (schema, rows). All framing damage is
    a contract ValueError: bad magic, unknown codec, per-block sync
    mismatch, counts past EOF, truncated values."""
    if data[:4] != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta, i = _read_meta_map(data, 4)
    try:
        schema = json.loads(meta["avro.schema"])
    except (KeyError, json.JSONDecodeError) as e:
        raise ValueError(f"bad avro.schema metadata: {e!r}") from e
    codec = meta.get("avro.codec", b"null").decode("latin-1")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    fields = _check_record_schema(schema)
    sync, i = _take(data, i, 16)
    rows: list[dict] = []
    while i < len(data):
        count, i = _dec_long(data, i)
        size, i = _dec_long(data, i)
        if count < 0 or size < 0:
            raise ValueError("negative avro block header")
        if count > 0 and not fields:
            # zero-byte records: a corrupted count would loop unbounded
            raise ValueError("avro block count > 0 with empty record schema")
        block, i = _take(data, i, size)
        got_sync, i = _take(data, i, 16)
        if got_sync != sync:
            raise ValueError("avro block sync marker mismatch")
        if codec == "deflate":
            try:
                block = zlib.decompress(block, -15)
            except zlib.error as e:
                raise ValueError(f"corrupt avro deflate block: {e!r}") from e
        j = 0
        for _ in range(count):
            row = {}
            for name, ftype in fields:
                row[name], j = _dec_value(ftype, block, j)
            rows.append(row)
        if j != len(block):
            raise ValueError("avro block has trailing bytes after last record")
    return schema, rows


# ------------------------------------------------------------ Spark reader

_SPARK_TYPES = {"boolean": "boolean", "int": "int", "long": "long",
                "float": "float", "double": "double",
                "bytes": "binary", "string": "string"}


def _spark_field(ftype) -> str:
    ftype = _base_type(ftype)
    if isinstance(ftype, list):
        ftype = [_base_type(b) for b in ftype]
    if isinstance(ftype, list):
        branches = [b for b in ftype if b != "null"]
        if len(branches) != 1:
            raise NotImplementedError(f"unsupported union {ftype}")
        return _spark_field(branches[0])
    if isinstance(ftype, dict) and ftype.get("type") == "array":
        return f"array<{_spark_field(ftype['items'])}>"
    if ftype == "null":
        return "string"  # all-null column; any nullable type works
    return _SPARK_TYPES[ftype]


def _resolve_rows(
    reader_fields: list[tuple[str, object]],
    reader_schema: dict,
    writer_schema: dict,
    rows: list[dict],
) -> list[dict]:
    """Avro spec §Schema Resolution, record rules, applied after the
    writer-schema decode: writer fields absent from the reader are
    DROPPED; reader fields absent from the writer take their declared
    ``default`` (error if none — the spec's unresolvable case); fields
    present in both must have the identical type in this module's
    subset (promotions are out of scope, a documented seam)."""
    if json.dumps(writer_schema, sort_keys=True) == json.dumps(
        reader_schema, sort_keys=True
    ):
        return rows
    writer_types = {
        f["name"]: f["type"] for f in writer_schema.get("fields", [])
    }
    defaults: dict[str, object] = {}
    for f in reader_schema.get("fields", []):
        name, ftype = f["name"], f["type"]
        if name in writer_types:
            if writer_types[name] != ftype:
                raise NotImplementedError(
                    f"type promotion for field {name!r} "
                    f"({writer_types[name]} -> {ftype}) is unsupported"
                )
        elif "default" in f:
            d = f["default"]
            # spec: bytes defaults are JSON strings of latin-1 bytes
            defaults[name] = (
                d.encode("latin-1") if ftype == "bytes"
                and isinstance(d, str) else d
            )
        else:
            raise ValueError(
                f"reader field {name!r} missing from writer schema "
                "and has no default"
            )
    names = [n for n, _ in reader_fields]
    return [
        {n: (r[n] if n in r else defaults[n]) for n in names} for r in rows
    ]


def _parse_pass(
    raw: DataFrame, avro_schema: dict, on_error: str = "raise"
) -> DataFrame:
    """The shared Arrow parse stage over whole-file byte rows (columns:
    path, content) — used verbatim by the batch reader and the
    streaming twin, so the two can never disagree on what a record
    is. ``avro_schema`` is the READER schema; files written under an
    evolved schema resolve per :func:`_resolve_rows`."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    fields = _check_record_schema(avro_schema)
    ddl = ", ".join(
        ["avro_path string"] + [f"{n} {_spark_field(t)}" for n, t in fields]
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["avro_path"] + [n for n, _ in fields]
        out: list[dict] = []
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    schema, rows = parse_avro_file(bytes(content))
                    rows = _resolve_rows(fields, avro_schema, schema, rows)
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt avro file {fpath}: {e!r}") from e
                    continue
                for r in rows:
                    r["avro_path"] = fpath
                out.extend(rows)
                if len(out) >= 1024:
                    yield pd.DataFrame(out, columns=cols)
                    out = []
        yield pd.DataFrame(out, columns=cols)

    return raw.select("path", "content").mapInPandas(parse, schema=ddl)


def read_avro(
    spark: SparkSession,
    path: str,
    avro_schema: dict,
    on_error: str = "raise",
) -> DataFrame:
    """Read Avro container shard(s) into typed rows. ``avro_schema``
    is the reader schema (explicit-schema ingest, like
    ``read_jsonl_corpus`` — no inference scan); files whose embedded
    writer schema disagrees raise. Rows carry ``avro_path`` for
    shard-level lineage. ``on_error='skip'`` drops a corrupt shard
    WHOLE (all-or-nothing, same contract as the WARC/TFRecord
    readers)."""
    raw = spark.read.format("binaryFile").load(path)
    return _parse_pass(raw, avro_schema, on_error)


_AVRO_TYPES = {"BooleanType": "boolean", "IntegerType": "int",
               "LongType": "long", "FloatType": "float",
               "DoubleType": "double", "BinaryType": "bytes",
               "StringType": "string"}


def schema_for(df: DataFrame, name: str = "row") -> dict:
    """Derive the Avro record schema for a DataFrame over this
    module's supported subset; nullable columns become [null, T]
    unions, arrays of primitives map elementwise."""
    from pyspark.sql import types as T

    fields = []
    for f in df.schema.fields:
        dt = f.dataType
        if isinstance(dt, T.ArrayType):
            elem = type(dt.elementType).__name__
            if elem not in _AVRO_TYPES:
                raise NotImplementedError(f"array<{elem}> for {f.name!r}")
            # unions of complex types are outside this module's subset,
            # so a NULL array value writes as an empty array — the one
            # (documented) lossy corner of the derived schema
            ftype: object = {"type": "array", "items": _AVRO_TYPES[elem]}
        else:
            tname = type(dt).__name__
            if tname not in _AVRO_TYPES:
                raise NotImplementedError(f"{tname} for {f.name!r}")
            ftype = _AVRO_TYPES[tname]
        if f.nullable and not isinstance(ftype, dict):
            ftype = ["null", ftype]
        fields.append({"name": f.name, "type": ftype})
    return {"type": "record", "name": name, "fields": fields}


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> DataFrame:
    """Write ``df`` as one ``part-*.avro`` container per partition —
    the egress half of :func:`read_avro`, same one-shard-per-task
    model as the TFRecord/WebDataset writers (no driver funnel; shard
    count = partition count). The record schema derives from the
    DataFrame schema via :func:`schema_for`. Returns the eager
    (shard, n_records) manifest."""
    import os

    avro_schema = schema_for(df)
    # Arrow->pandas renders nulls in integral columns as float NaN;
    # only genuinely-floating columns keep NaN as a value
    float_cols = {
        f["name"] for f in avro_schema["fields"]
        if f["type"] in ("float", "double")
        or f["type"] in (["null", "float"], ["null", "double"])
    }
    float_array_cols = {
        f["name"] for f in avro_schema["fields"]
        if isinstance(f["type"], dict)
        and f["type"].get("items") in ("float", "double")
    }
    int_array_cols = {
        f["name"] for f in avro_schema["fields"]
        if isinstance(f["type"], dict)
        and f["type"].get("items") in ("int", "long")
    }
    os.makedirs(path, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        def norm(k, v):
            if v is None:
                return None
            if isinstance(v, float) and v != v and k not in float_cols:
                return None  # NaN standing in for a null
            if hasattr(v, "tolist") and not isinstance(v, bytes):
                v = v.tolist()  # numpy array/scalar -> python
            if isinstance(v, (list, tuple)):
                vals = list(v)
                # a null ELEMENT arrives as None or (numpy
                # float-ification of an integral child array) NaN;
                # this module's arrays are arrays of non-null prims,
                # so outside genuinely-floating arrays that is corrupt
                # input — the contract error beats int(nan) killing
                # the stage. Float arrays keep NaN as a value (the
                # same documented null→NaN merge as scalar columns).
                if any(e is None for e in vals) or (
                        k not in float_array_cols
                        and any(isinstance(e, float) and e != e
                                for e in vals)):
                    raise ValueError(
                        f"null element in array column {k!r}; Avro "
                        "array<prim> items cannot carry nulls")
                if k in int_array_cols and any(
                        isinstance(e, float) for e in vals):
                    vals = [int(e) for e in vals]  # un-float-ify
                return vals
            return v

        pid = TaskContext.get().partitionId()
        shard = os.path.join(path, f"part-{pid:05d}.avro")

        def rows_iter():
            for pdf in batches:
                for r in pdf.to_dict("records"):
                    yield {k: norm(k, v) for k, v in r.items()}

        it = rows_iter()
        try:
            first = next(it)
        except StopIteration:
            yield pd.DataFrame({"shard": [], "n_records": []})
            return
        n = 0

        def counted():
            nonlocal n
            yield first
            n += 1
            for r in it:
                yield r
                n += 1

        # stream block-by-block: peak memory is one Arrow batch + one
        # Avro block, never the whole shard (the TFRecord writer's
        # record-streaming posture, kept here at block granularity)
        with open(shard, "wb") as fh:
            for chunk in iter_avro_container(avro_schema, counted(),
                                             codec=codec):
                fh.write(chunk)
        yield pd.DataFrame({"shard": [shard], "n_records": [n]})

    from wc_vector_indexing_spark.sources.readers import eager_manifest

    return eager_manifest(df, dump)


def read_avro_stream(
    spark: SparkSession,
    path: str,
    avro_schema: dict,
    on_error: str = "raise",
) -> DataFrame:
    """Streaming twin of :func:`read_avro` — file-source ``readStream``
    over the same binaryFile format with the SAME Arrow parse stage
    (batch/stream can never disagree; the sources/warc.read_warc_stream
    contract). New ``.avro`` container drops become micro-batches with
    exactly-once via the file-source checkpoint."""
    from wc_vector_indexing_spark.sources.readers import binaryfile_stream

    return _parse_pass(binaryfile_stream(spark, path), avro_schema, on_error)
