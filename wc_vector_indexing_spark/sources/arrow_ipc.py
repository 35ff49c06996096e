"""Arrow IPC source/sink — the columnar interchange format (file
format a.k.a. Feather V2, plus the streaming variant) that
Arrow-native tooling (pandas, polars, DataFusion, Ray Data, torch
dataloaders via pyarrow) ships tables in; next to TFRecord shards,
Avro containers, and WebDataset tars it completes the interchange
family a 100 TB training-data engine must ingest and emit. Reference
behavior analogue: the bulk export/import surface (export CSV at
logs.php:137 scale) re-expressed for the columnar interchange format;
the format itself is the PUBLIC Arrow IPC specification
(arrow.apache.org/docs/format/Columnar.html#serialization-and-interprocess-communication-ipc),
accessed through ``pyarrow`` — the same public library Spark's own
Arrow exchange rides on, so no new dependency and no hand-rolled
FlatBuffers walker.

Spark shape — the same model as the TFRecord/Avro readers:

- whole-file ``binaryFile`` scan → ONE Arrow ``mapInPandas`` parse
  pass, zero shuffle. Arrow corpora ship as many shards (one table
  per file), which is the task-level parallelism; one shard rides
  through executor memory once.
- explicit READER schema (typed ingest, no inference scan — the
  ``read_avro`` / ``read_jsonl_corpus`` contract). Files whose
  embedded schema differs resolve by SAFE CAST (int32 file → long
  reader etc.); an unsafe or impossible cast is a contract
  ``ValueError``, never a silently-wrong column.
- per-FILE isolation: a corrupt shard is dropped WHOLE under
  ``on_error='skip'`` (all-or-nothing — no partial rows from a file
  whose later batches are rotten), raises under ``'raise'``.
- both IPC encodings are sniffed per file: the random-access FILE
  format (``ARROW1`` magic, footer) and the STREAM format
  (encapsulated-message framing) — corpora mix them freely.
- the sink writes one shard per partition (no driver funnel) with
  optional ``zstd``/``lz4`` buffer compression and a bounded
  ``max_rows_per_batch`` so a downstream reader never needs more
  than one record batch in memory.

Integrity posture (documented, asserted by the mutation sweep): the
IPC format carries NO per-buffer checksums — structural corruption
(flatbuffers metadata, framing, compressed-buffer headers) surfaces
as a contract error, but a bit-flip inside an UNCOMPRESSED data
buffer decodes as a wrong value, exactly like flipping a byte in a
raw parquet PLAIN page. Shipping shards compressed (the default
here) narrows that window substantially — zstd/lz4 frames fail to
decompress on most interior damage — but the end-to-end integrity
story at crawl scale is the job of the transport/checksum layer
(e.g. the CDX digest column), not this codec.
"""

from __future__ import annotations

import io
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_FILE_MAGIC = b"ARROW1"

# Spark DDL type -> pyarrow type factory; the supported subset matches
# the Avro sink's (primitives + arrays of primitives), which covers
# every relation this engine exchanges.
def _arrow_type(ddl: str):
    import pyarrow as pa

    prim = {
        "boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
        "float": pa.float32(), "double": pa.float64(),
        "string": pa.string(), "binary": pa.binary(),
    }
    ddl = ddl.strip().lower()
    if ddl in prim:
        return prim[ddl]
    if ddl.startswith("array<") and ddl.endswith(">"):
        inner = ddl[6:-1].strip()
        if inner in prim:
            return pa.list_(prim[inner])
    raise NotImplementedError(f"unsupported reader type {ddl!r}")


def _target_schema(columns: dict[str, str]):
    import pyarrow as pa

    return pa.schema([(n, _arrow_type(t)) for n, t in columns.items()])


# ------------------------------------------------------------- codec halves

def _open_batches(data: bytes):
    """Sniff file-vs-stream encoding and yield the record batches.
    Every pyarrow failure mode is re-raised as the contract
    ``ValueError`` (ArrowInvalid already IS one; ArrowIOError is an
    OSError and must not escape as a bare crash)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    try:
        if data[:6] == _FILE_MAGIC:
            reader = ipc.open_file(pa.BufferReader(data))
            batches = (reader.get_batch(i)
                       for i in range(reader.num_record_batches))
        else:
            batches = iter(ipc.open_stream(pa.BufferReader(data)))
        for batch in batches:
            # pyarrow's IPC reader does NOT bounds-check buffers on
            # read; converting a corrupt batch can read out of bounds
            # and SEGFAULT the worker (observed under the mutation
            # sweep). full validation walks every offset/buffer and
            # turns that into ArrowInvalid — the per-batch integrity
            # pass this format otherwise lacks.
            batch.validate(full=True)
            yield batch
    except ValueError:
        raise
    except (pa.ArrowException, OSError, IndexError) as e:
        raise ValueError(f"corrupt arrow ipc data: {e!r}") from e


def parse_arrow_file(data: bytes, columns: dict[str, str]) -> list[tuple]:
    """Decode one shard's bytes to ``(batch_index, pandas.DataFrame)``
    pairs under the declared reader schema — the pure codec half the
    sweeps drive. Fully materializes before returning so a file whose
    LAST batch is rotten contributes nothing (all-or-nothing)."""
    import pyarrow as pa

    target = _target_schema(columns)
    names = list(columns)
    out: list[tuple] = []
    for i, batch in enumerate(_open_batches(data)):
        missing = [n for n in names if n not in batch.schema.names]
        if missing:
            raise ValueError(f"arrow shard lacks reader columns {missing}")
        tbl = pa.Table.from_batches([batch]).select(names)
        try:
            tbl = tbl.cast(target, safe=True)
        except (pa.ArrowException, ValueError) as e:
            raise ValueError(
                f"arrow shard schema does not safely cast to reader "
                f"schema: {e!r}") from e
        # default to_pandas renders a NULLABLE int64 column as float64
        # (NaN for nulls) — which silently rounds values above 2^53;
        # route integral columns to pandas' nullable Int dtypes instead
        # (caught by the hypothesis roundtrip property)
        pdf = tbl.to_pandas(types_mapper={
            pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
        }.get)
        out.append((i, pdf))
    return out


def to_arrow_ipc_bytes(
    cols: dict[str, list],
    types: dict[str, str],
    fmt: str = "file",
    compression: str | None = None,
    max_rows_per_batch: int | None = None,
) -> bytes:
    """Deterministic writer half (fixtures, tests, driver-side
    plants): column dict + Spark-DDL types -> one shard's bytes in
    the chosen encoding (``file`` | ``stream``)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    if fmt not in ("file", "stream"):
        raise ValueError("fmt must be 'file' or 'stream'")
    schema = _target_schema(types)
    table = pa.table({n: pa.array(v, type=schema.field(n).type)
                      for n, v in cols.items()}, schema=schema)
    opts = ipc.IpcWriteOptions(compression=compression)
    sink = io.BytesIO()
    new = ipc.new_file if fmt == "file" else ipc.new_stream
    with new(sink, schema, options=opts) as writer:
        writer.write_table(table, max_chunksize=max_rows_per_batch)
    return sink.getvalue()


# ------------------------------------------------------------- Spark glue

def _parse_pass(raw: DataFrame, columns: dict[str, str],
                on_error: str) -> DataFrame:
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    _target_schema(columns)  # validate the declared types eagerly
    ddl = ", ".join(
        ["arrow_path string", "batch_index int"]
        + [f"{n} {t}" for n, t in columns.items()]
    )
    names = list(columns)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = pd.DataFrame(columns=["arrow_path", "batch_index"] + names)
        any_out = False
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    decoded = parse_arrow_file(bytes(content), columns)
                except (ValueError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt arrow shard {fpath}: {e!r}") from e
                    continue
                for i, part in decoded:
                    part = part.copy()
                    part.insert(0, "batch_index", i)
                    part.insert(0, "arrow_path", fpath)
                    any_out = True
                    yield part
        if not any_out:
            yield empty

    return raw.select("path", "content").mapInPandas(parse, schema=ddl)


def read_arrow_ipc(
    spark: SparkSession,
    path: str,
    columns: dict[str, str],
    on_error: str = "raise",
) -> DataFrame:
    """Read Arrow IPC shard(s) (file OR stream encoding, sniffed per
    file) into typed rows. ``columns`` is the explicit reader schema
    (column name -> Spark DDL type); file columns outside it are
    pruned at decode, missing or unsafely-typed columns are contract
    errors. Rows carry ``arrow_path`` + ``batch_index`` lineage."""
    raw = spark.read.format("binaryFile").load(path)
    return _parse_pass(raw, columns, on_error)


def read_arrow_ipc_stream(
    spark: SparkSession,
    path: str,
    columns: dict[str, str],
    on_error: str = "raise",
) -> DataFrame:
    """Streaming twin of :func:`read_arrow_ipc` — file-source
    ``readStream`` with the SAME Arrow parse stage (batch/stream can
    never disagree; the sources/warc.read_warc_stream contract)."""
    from wc_vector_indexing_spark.sources.readers import binaryfile_stream

    return _parse_pass(binaryfile_stream(spark, path), columns, on_error)


def _ddl_for(df: DataFrame) -> dict[str, str]:
    """Derive the reader-schema dict for a DataFrame over the
    supported subset (the sink's schema derivation)."""
    from pyspark.sql import types as T

    prim = {"BooleanType": "boolean", "IntegerType": "int",
            "LongType": "long", "FloatType": "float",
            "DoubleType": "double", "StringType": "string",
            "BinaryType": "binary"}
    out: dict[str, str] = {}
    for f in df.schema.fields:
        dt = f.dataType
        if isinstance(dt, T.ArrayType):
            elem = type(dt.elementType).__name__
            if elem not in prim:
                raise NotImplementedError(f"array<{elem}> for {f.name!r}")
            out[f.name] = f"array<{prim[elem]}>"
        else:
            tname = type(dt).__name__
            if tname not in prim:
                raise NotImplementedError(f"{tname} for {f.name!r}")
            out[f.name] = prim[tname]
    return out


MAX_OPEN_SHARDS = 128


def write_arrow_ipc(
    df: DataFrame,
    path: str,
    compression: str | None = "zstd",
    max_rows_per_batch: int = 1 << 16,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as one ``part-*.arrow`` IPC-file shard per
    partition — the egress half of :func:`read_arrow_ipc`, same
    one-shard-per-task model as the TFRecord/Avro/WebDataset writers
    (no driver funnel; shard count = partition count). Returns the
    eager (shard, n_records) manifest. Compressed by default: besides
    the bytes, zstd/lz4 framing is the only interior-corruption
    detection this format has (see module docstring).

    ``partition_by`` writes hive-style ``col=value/`` directories
    (values escaped, NULL as the hive sentinel, partition columns
    dropped from the payload) after a repartition on those columns;
    a task keeps one open IPC writer per value it holds, streaming
    record batches as they arrive — more than ``MAX_OPEN_SHARDS``
    distinct values in one task is a contract error."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    partition_by = list(partition_by or [])
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(f"partition_by columns not in frame: {missing}")
    data_df = df.drop(*partition_by) if partition_by else df
    if not data_df.columns:
        raise ValueError("partition_by consumes every column")
    types = _ddl_for(data_df)
    schema = _target_schema(types)
    data_cols = list(types)
    # Arrow->pandas renders nulls in integral columns as float NaN;
    # route integral columns through pandas' nullable Int dtypes so a
    # NaN goes back to a NULL, not a cast error (float columns keep
    # NaN as a value — same documented posture as the Avro sink)
    int_cols = [n for n, t in types.items() if t in ("int", "long")]
    os.makedirs(path, exist_ok=True)
    if partition_by:
        df = df.repartition(*partition_by)

    from wc_vector_indexing_spark.sources.readers import (
        eager_manifest,
        hive_partition_path,
    )

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        opts = ipc.IpcWriteOptions(compression=compression)
        # shard path -> (file handle, ipc writer, [row count])
        handles: dict[str, tuple] = {}

        def writer_for(pvals) -> tuple:
            base = (hive_partition_path(path, partition_by, pvals)
                    if partition_by else path)
            shard = os.path.join(base, f"part-{pid:05d}.arrow")
            if shard not in handles:
                if len(handles) >= MAX_OPEN_SHARDS:
                    raise ValueError(
                        f"more than {MAX_OPEN_SHARDS} partition values "
                        "in one task; use a coarser partition_by or "
                        "more tasks")
                os.makedirs(base, exist_ok=True)
                fh = open(shard, "wb")
                handles[shard] = (fh, ipc.new_file(fh, schema, options=opts),
                                  [0])
            return handles[shard]

        def emit(pdf: pd.DataFrame, writer, count):
            pdf = pdf[data_cols].copy()
            for c in int_cols:
                pdf[c] = pdf[c].astype("Int64")
            table = pa.Table.from_pandas(
                pdf, schema=schema, preserve_index=False)
            writer.write_table(table, max_chunksize=max_rows_per_batch)
            count[0] += len(pdf)

        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if not partition_by:
                    _, writer, count = writer_for(())
                    emit(pdf, writer, count)
                    continue
                for pvals, part in pdf.groupby(partition_by, dropna=False,
                                               sort=True):
                    if len(partition_by) == 1 and not isinstance(
                            pvals, tuple):
                        pvals = (pvals,)
                    _, writer, count = writer_for(pvals)
                    emit(part, writer, count)
        finally:
            for fh, writer, _ in handles.values():
                writer.close()
                fh.close()
        yield pd.DataFrame({
            "shard": list(handles),
            "n_records": [c[0] for _, _, c in handles.values()],
        })

    return eager_manifest(df, dump)
