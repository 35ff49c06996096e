"""safetensors interchange — the training-ecosystem tensor format
(public spec: github.com/huggingface/safetensors; format = 8-byte LE
header length, JSON tensor table {name: {dtype, shape, data_offsets}}
plus optional ``__metadata__`` str→str map, then the raw
little-endian tensor buffer). Embedding matrices, centroid tables,
and projection weights ship between pipelines in exactly this shape;
the parser is pure stdlib+numpy (same independent-writer discipline
as the Avro/TFRecord modules — round-trip tests pin it against our
own writer AND hand-built fixtures).

Validation posture (decode-front-door contract): header length
bounded (the spec's own 100 MB cap — a crafted length cannot allocate
the file), JSON must be an object, dtypes from the spec's table,
offsets must tile the data buffer EXACTLY (sorted, zero-origin,
gapless, end == buffer size — overlap or gap is corruption), element
counts must multiply out to the byte span. BF16 (the dominant dtype
of real HF checkpoints; numpy has no bfloat16 dtype) decodes through
the lossless bits<<16 widening to float32 and encodes with round-to-
nearest-even truncation — public IEEE-754 arithmetic, not an F16
reinterpretation.

Spark shape: the writer emits one shard per partition from a
``mapInPandas`` pass (no driver funnel); the reader is one
``binaryFile`` scan + one Arrow parse pass, zero shuffle. Shards are
whole-file units (the format is one contiguous buffer — the natural
parallelism unit is the shard, as with Arrow IPC / Avro here).

Reference note: the reference engine has no tensor interchange
(SURVEY §1.1); north-star training-pipeline surface, public spec
only.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# spec dtype → (numpy little-endian dtype, itemsize)
_DTYPES = {
    "F64": "<f8", "F32": "<f4", "F16": "<f2",
    "I64": "<i8", "I32": "<i4", "I16": "<i2", "I8": "<i1",
    "U64": "<u8", "U32": "<u4", "U16": "<u2", "U8": "<u1",
    "BOOL": "|b1",
}
_NP_TO_SPEC = {np.dtype(v).str.lstrip("<|=").lower(): k
               for k, v in _DTYPES.items()}

MAX_HEADER_BYTES = 100 * 1024 * 1024  # the spec's own cap


def _fp8_decode_table(exp_bits: int, mant_bits: int, bias: int,
                      ieee_special: bool) -> np.ndarray:
    """256-entry byte → float32 lookup for an FP8 format (OCP 8-bit
    floating point, public spec). ``ieee_special=True`` gives the
    IEEE-style top exponent (E5M2: inf when mantissa 0, NaN
    otherwise); ``False`` gives the E4M3FN convention (no infinities —
    the top exponent is ordinary except all-ones mantissa = NaN, which
    buys the 448 max normal)."""
    vals = np.empty(256, dtype="<f4")
    e_max = (1 << exp_bits) - 1
    m_den = float(1 << mant_bits)
    for b in range(256):
        s = -1.0 if b & 0x80 else 1.0
        e = (b >> mant_bits) & e_max
        m = b & ((1 << mant_bits) - 1)
        if e == e_max and ieee_special:
            vals[b] = s * np.inf if m == 0 else np.nan
        elif e == e_max and not ieee_special and m == (1 << mant_bits) - 1:
            vals[b] = np.nan
        elif e == 0:
            vals[b] = s * (m / m_den) * 2.0 ** (1 - bias)
        else:
            vals[b] = s * (1.0 + m / m_den) * 2.0 ** (e - bias)
    return vals


# built once at import: E4M3 = OCP E4M3FN (bias 7, no inf, max 448);
# E5M2 = IEEE-style binary8 (bias 15, inf/NaN, max 57344)
_F8_TABLES = {
    "F8_E4M3": _fp8_decode_table(4, 3, 7, ieee_special=False),
    "F8_E5M2": _fp8_decode_table(5, 2, 15, ieee_special=True),
}


def f32_to_bf16_bits(a: np.ndarray) -> np.ndarray:
    """float32 → bfloat16 bit patterns (uint16) with round-to-nearest-
    even — the hardware conversion semantics (bfloat16 = the top 16
    bits of the IEEE-754 binary32 layout; public arithmetic, no
    library dtype needed). NaNs keep their sign + top payload bits
    with the quiet bit forced so rounding can't collapse a NaN into
    infinity."""
    f = np.ascontiguousarray(a, dtype="<f4")
    bits = f.view("<u4")
    rne = ((bits.astype(np.uint64) + 0x7FFF + ((bits >> 16) & 1)) >> 16
           ).astype("<u2")
    nan = np.isnan(f)
    if nan.any():
        rne = rne.copy()
        rne[nan] = ((bits[nan] >> 16).astype("<u2") | 0x0040)
    return rne.reshape(f.shape)


def bf16_bits_to_f32(u16: np.ndarray) -> np.ndarray:
    """bfloat16 bit patterns (uint16) → float32: every bf16 value is
    exactly representable in binary32, so the widening is lossless
    (bits << 16)."""
    u = np.ascontiguousarray(u16, dtype="<u2")
    return (u.astype("<u4") << np.uint32(16)).view("<f4").reshape(u.shape)


def to_safetensors_bytes(
    tensors: dict[str, np.ndarray],
    metadata: dict[str, str] | None = None,
    dtype_overrides: dict[str, str] | None = None,
) -> bytes:
    """Serialize ``tensors`` (name → ndarray) into one safetensors
    blob: offsets assigned in insertion order, gapless from 0.

    ``dtype_overrides`` maps a tensor name to a spec dtype to store it
    as; the only conversion offered is float32 → ``"BF16"`` (round-to-
    nearest-even, the checkpoint-interchange case — numpy has no
    bfloat16 dtype so it can't arrive as an ndarray)."""
    header: dict[str, object] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v)
                                  for k, v in metadata.items()}
    payload = bytearray()
    for name, arr in tensors.items():
        a = np.ascontiguousarray(arr)
        want = (dtype_overrides or {}).get(name)
        if want is not None and want != "BF16":
            raise ValueError(
                f"safetensors: dtype_overrides supports only 'BF16', "
                f"got {want!r} for {name!r}")
        if want == "BF16":
            if a.dtype != np.dtype("<f4"):
                raise ValueError(
                    f"safetensors: BF16 override needs float32 input, "
                    f"{name!r} is {a.dtype}")
            a = f32_to_bf16_bits(a)
            spec = "BF16"
        else:
            key = a.dtype.str.lstrip("<|=").lower()
            spec = _NP_TO_SPEC.get(key)
            if spec is None:
                raise ValueError(
                    f"safetensors: unsupported dtype {a.dtype}")
            a = a.astype(_DTYPES[spec], copy=False)  # force little-endian
        start = len(payload)
        payload += a.tobytes()
        header[name] = {
            "dtype": spec,
            "shape": list(a.shape),
            "data_offsets": [start, len(payload)],
        }
    hj = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # the reference implementation pads the header with spaces to
    # 8-byte alignment so the buffer starts aligned
    pad = (-(8 + len(hj))) % 8
    hj += b" " * pad
    return struct.pack("<Q", len(hj)) + hj + bytes(payload)


def parse_safetensors(
    data: bytes,
) -> tuple[dict[str, np.ndarray], dict[str, str]]:
    """One blob → (tensors by name, metadata). Raises ValueError for
    corrupt bytes. BF16 and FP8 tensors come back widened to float32
    (lossless; numpy has no sub-single float dtypes)."""
    if len(data) < 8:
        raise ValueError("safetensors: truncated header length")
    (hlen,) = struct.unpack_from("<Q", data, 0)
    if hlen > MAX_HEADER_BYTES:
        raise ValueError(f"safetensors: header length {hlen} over the "
                         "spec's 100MB cap")
    if 8 + hlen > len(data):
        raise ValueError("safetensors: header overruns the file")
    try:
        header = json.loads(data[8:8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"safetensors: bad header JSON: {e}") from e
    if not isinstance(header, dict):
        raise ValueError("safetensors: header is not a JSON object")
    metadata = header.pop("__metadata__", {})
    if not isinstance(metadata, dict) or not all(
            isinstance(k, str) and isinstance(v, str)
            for k, v in metadata.items()):
        raise ValueError("safetensors: __metadata__ must map str to str")
    buf = memoryview(data)[8 + hlen:]
    spans = []
    tensors: dict[str, np.ndarray] = {}
    for name, info in header.items():
        if not isinstance(info, dict):
            raise ValueError(f"safetensors: tensor {name!r} entry is "
                             "not an object")
        dtype = info.get("dtype")
        if (dtype != "BF16" and dtype not in _F8_TABLES
                and dtype not in _DTYPES):
            raise ValueError(f"safetensors: unknown dtype {dtype!r}")
        shape = info.get("shape")
        if (not isinstance(shape, list)
                or any(not isinstance(s, int) or s < 0 for s in shape)):
            raise ValueError(f"safetensors: bad shape for {name!r}")
        off = info.get("data_offsets")
        if (not isinstance(off, list) or len(off) != 2
                or any(not isinstance(o, int) or o < 0 for o in off)
                or off[1] < off[0] or off[1] > len(buf)):
            raise ValueError(f"safetensors: bad offsets for {name!r}")
        # BF16 / FP8 (the dominant dtypes of real HF checkpoints) have
        # no numpy dtype — stored bits are uint16/uint8; the lossless
        # widenings (bits<<16, 256-entry LUT) surface them as float32
        if dtype == "BF16":
            np_dtype = np.dtype("<u2")
        elif dtype in _F8_TABLES:
            np_dtype = np.dtype("<u1")
        else:
            np_dtype = np.dtype(_DTYPES[dtype])
        n_elem = 1
        for s in shape:
            n_elem *= s
        if off[1] - off[0] != n_elem * np_dtype.itemsize:
            raise ValueError(
                f"safetensors: {name!r} byte span {off[1] - off[0]} != "
                f"shape {shape} x itemsize {np_dtype.itemsize}")
        spans.append((off[0], off[1]))
        raw = np.frombuffer(buf[off[0]:off[1]], dtype=np_dtype)
        if dtype == "BF16":
            tensors[name] = bf16_bits_to_f32(raw).reshape(shape)
        elif dtype in _F8_TABLES:
            tensors[name] = _F8_TABLES[dtype][raw].reshape(shape)
        else:
            tensors[name] = raw.reshape(shape)
    # offsets must TILE the buffer: sorted, zero-origin, gapless,
    # ending at the buffer end (overlap/gap = corruption per spec)
    spans.sort()
    pos = 0
    for s, e in spans:
        if s != pos:
            raise ValueError(
                f"safetensors: offset gap/overlap at byte {pos} (next "
                f"span starts {s})")
        pos = e
    if pos != len(buf):
        raise ValueError(
            f"safetensors: buffer has {len(buf) - pos} trailing bytes "
            "not covered by any tensor")
    return tensors, metadata


# ------------------------------------------------------------- Spark


def write_safetensors_vectors(
    df: DataFrame, path: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    vec_dtype: str = "F32",
) -> DataFrame:
    """Write an (id, vector) frame as one safetensors shard per
    partition — tensor ``ids`` (I64, [n]) + tensor ``vectors``
    (``vec_dtype``: F32 bit-exact, or BF16 with round-to-nearest-even
    quantization — the checkpoint-ecosystem default, half the bytes)
    — the embedding-matrix export shape. Ragged or null vectors are
    contract errors (a tensor has one dim). Returns the eager
    (shard, n_rows) manifest, one row per non-empty partition."""
    import os
    import uuid

    if vec_dtype not in ("F32", "BF16"):
        raise ValueError(
            f"vec_dtype must be 'F32' or 'BF16', got {vec_dtype!r}")
    os.makedirs(path, exist_ok=True)
    src = df.select(id_col, vec_col)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        ids: list[int] = []
        vecs: list[list[float]] = []
        dim = None
        for pdf in batches:
            for i, v in zip(pdf[id_col], pdf[vec_col]):
                if v is None or (isinstance(v, float) and v != v):
                    raise ValueError(
                        f"safetensors: null vector for id {i}")
                v = list(v)
                if dim is None:
                    dim = len(v)
                elif len(v) != dim:
                    raise ValueError(
                        f"safetensors: ragged vector for id {i} "
                        f"({len(v)} != {dim})")
                ids.append(int(i))
                vecs.append(v)
        if not ids:
            yield pd.DataFrame({"shard": [], "n_rows": []})
            return
        blob = to_safetensors_bytes(
            {
                "ids": np.asarray(ids, dtype="<i8"),
                "vectors": np.asarray(vecs, dtype="<f4"),
            },
            metadata={"id_col": id_col, "vec_col": vec_col},
            dtype_overrides=(
                {"vectors": "BF16"} if vec_dtype == "BF16" else None),
        )
        shard = os.path.join(
            path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.safetensors")
        tmp = shard + ".inprogress"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.rename(tmp, shard)  # atomic publish: no torn shard visible
        yield pd.DataFrame({"shard": [shard], "n_rows": [len(ids)]})

    from wc_vector_indexing_spark.sources.readers import eager_manifest

    return eager_manifest(src, dump, schema="shard string, n_rows long")


def read_safetensors_vectors(
    spark: SparkSession, path: str,
    on_error: str = "raise",
) -> DataFrame:
    """(shard, vec_id, embedding): every (id, vector) row of every
    ``*.safetensors`` shard written by :func:`write_safetensors_
    vectors`. One binaryFile scan + one Arrow parse pass, zero
    shuffle; ``on_error='skip'`` quarantines a corrupt shard WHOLE
    (all-or-nothing, the WARC/TFRecord contract)."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    raw = spark.read.format("binaryFile").load(path).select(
        "path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "vec_id", "embedding"]
        for pdf in batches:
            rows: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    tensors, _meta = parse_safetensors(bytes(content))
                    ids = tensors["ids"]
                    vecs = tensors["vectors"]
                    if ids.ndim != 1 or vecs.ndim != 2 or \
                            len(ids) != len(vecs):
                        raise ValueError(
                            "safetensors: ids/vectors shape mismatch")
                except (ValueError, KeyError, NotImplementedError) as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt safetensors shard {fpath}: {e!r}"
                        ) from e
                    continue
                rows.extend(
                    (fpath, int(i), [float(x) for x in v])
                    for i, v in zip(ids, vecs))
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(
        parse, schema="shard string, vec_id long, embedding array<float>")


def read_safetensors_index(
    spark: SparkSession, path: str,
    on_error: str = "raise",
) -> DataFrame:
    """(shard, tensor, dtype, shape, n_params, n_bytes, param_dtype):
    the tensor inventory of every ``*.safetensors`` file — what a
    checkpoint consumer asks first (which tensors, which dtypes, how
    many parameters). HEADERS ONLY: the JSON table is validated and
    each tensor's byte span checked against the buffer size, but no
    tensor data is decoded — so the pass is metadata-cheap even over
    multi-GB shards. One binaryFile scan + one Arrow parse pass, zero
    shuffle; ``on_error='skip'`` quarantines a corrupt shard whole.

    ``shape`` is returned as its canonical JSON string (e.g.
    ``[4096,128]``) so downstream groupBys and the DuckDB oracle
    treat it as a plain scalar."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    raw = spark.read.format("binaryFile").load(path).select(
        "path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "tensor", "dtype", "shape", "n_params", "n_bytes"]
        for pdf in batches:
            rows: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                try:
                    rows.extend(_index_rows(fpath, data))
                except ValueError as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt safetensors shard {fpath}: {e!r}"
                        ) from e
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(
        parse,
        schema="shard string, tensor string, dtype string, "
               "shape string, n_params long, n_bytes long")


def _index_rows(fpath: str, data: bytes) -> list[tuple]:
    """Header-only walk shared with the full parser's validation rules
    (length cap, JSON object, dtype table, span == shape x itemsize,
    offsets tile the buffer) — without touching tensor bytes."""
    if len(data) < 8:
        raise ValueError("safetensors: truncated header length")
    (hlen,) = struct.unpack_from("<Q", data, 0)
    if hlen > MAX_HEADER_BYTES:
        raise ValueError("safetensors: header length over the cap")
    if 8 + hlen > len(data):
        raise ValueError("safetensors: header overruns the file")
    try:
        header = json.loads(data[8:8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"safetensors: bad header JSON: {e}") from e
    if not isinstance(header, dict):
        raise ValueError("safetensors: header is not a JSON object")
    header.pop("__metadata__", None)
    buf_len = len(data) - 8 - hlen
    itemsize = {**{k: np.dtype(v).itemsize for k, v in _DTYPES.items()},
                "BF16": 2, "F8_E4M3": 1, "F8_E5M2": 1}
    rows: list[tuple] = []
    spans = []
    for name, info in header.items():
        if not isinstance(info, dict):
            raise ValueError(f"safetensors: tensor {name!r} entry is "
                             "not an object")
        dtype = info.get("dtype")
        if dtype not in itemsize:
            raise ValueError(f"safetensors: unknown dtype {dtype!r}")
        shape = info.get("shape")
        if (not isinstance(shape, list)
                or any(not isinstance(s, int) or s < 0 for s in shape)):
            raise ValueError(f"safetensors: bad shape for {name!r}")
        off = info.get("data_offsets")
        if (not isinstance(off, list) or len(off) != 2
                or any(not isinstance(o, int) or o < 0 for o in off)
                or off[1] < off[0] or off[1] > buf_len):
            raise ValueError(f"safetensors: bad offsets for {name!r}")
        n_elem = 1
        for s in shape:
            n_elem *= s
        if off[1] - off[0] != n_elem * itemsize[dtype]:
            raise ValueError(
                f"safetensors: {name!r} byte span != shape x itemsize")
        spans.append((off[0], off[1]))
        rows.append((fpath, name, dtype,
                     json.dumps(shape, separators=(",", ":")),
                     n_elem, off[1] - off[0]))
    spans.sort()
    pos = 0
    for s, e in spans:
        if s != pos:
            raise ValueError("safetensors: offset gap/overlap")
        pos = e
    if pos != buf_len:
        raise ValueError("safetensors: trailing bytes")
    return rows


def checkpoint_completeness(
    spark: SparkSession, model_dir: str,
    index_name: str = "model.safetensors.index.json",
) -> DataFrame:
    """(tensor, mapped_shard, found_shard, dtype, n_params, status):
    verify a sharded-checkpoint directory against its index file (the
    HF ``model.safetensors.index.json`` convention — a ``weight_map``
    of tensor name → shard filename, public format). status ∈

      ok            — tensor present in the shard the index maps it to
      missing       — mapped shard absent or tensor not in it
      misplaced     — tensor exists but in a different shard
      unindexed     — tensor present in a shard but absent from the map

    The index is a bounded driver-side JSON (tensor-count rows, KiB-MiB
    scale — the broadcast-dim class); shard inventories come from the
    headers-only distributed pass (:func:`read_safetensors_index`), so
    no tensor data is read. One broadcast full-outer join, no corpus
    shuffle."""
    import json as _json
    import os

    with open(os.path.join(model_dir, index_name)) as fh:
        idx = _json.load(fh)
    wmap = idx.get("weight_map")
    if not isinstance(wmap, dict) or not all(
            isinstance(k, str) and isinstance(v, str)
            for k, v in wmap.items()):
        raise ValueError(
            f"checkpoint index {index_name}: weight_map must map "
            "tensor name to shard filename")
    mapped = spark.createDataFrame(
        [(t, s) for t, s in sorted(wmap.items())],
        "tensor string, mapped_shard string")
    inv = read_safetensors_index(
        spark, os.path.join(model_dir, "*.safetensors"))
    found = inv.select(
        "tensor",
        F.element_at(F.split("shard", "/"), -1).alias("found_shard"),
        "dtype", "n_params",
    )
    joined = mapped.join(F.broadcast(found), "tensor", "full_outer")
    status = (
        F.when(F.col("mapped_shard").isNull(), F.lit("unindexed"))
        .when(F.col("found_shard").isNull(), F.lit("missing"))
        .when(F.col("mapped_shard") == F.col("found_shard"), F.lit("ok"))
        .otherwise(F.lit("misplaced"))
    )
    return joined.select(
        "tensor", "mapped_shard", "found_shard", "dtype", "n_params",
        status.alias("status"),
    ).orderBy("tensor")


def checkpoint_drift(
    a: DataFrame, b: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    atol: float = 0.0,
) -> DataFrame:
    """(id, status, dim_a, dim_b, l2_delta, max_abs_delta): parameter-
    level diff of two checkpoint versions — the promote-or-retrain
    audit a training pipeline runs between checkpoint drops (the
    corpus_diff of model weights; reference behavior: the re-embed
    decision in includes/class-sync-manager.php compares fingerprints
    before re-upserting vectors). status ∈

      added      — id only in ``b`` (new tensor/vector)
      removed    — id only in ``a``
      reshaped   — present in both with different dimensions
      changed    — same shape, some |delta| > atol
      unchanged  — same shape, all |delta| <= atol

    Inputs are any (id, vector) frames — e.g. two
    :func:`read_safetensors_vectors` or ``read_gguf_vectors`` loads.
    The delta fold (zip_with + aggregate + sqrt) runs JVM-side in
    whole-stage codegen over ONE shuffle (the full-outer hash join on
    id); nothing collects, nothing is Python in the hot path, so the
    pass scales to checkpoint-sized matrices by partition count
    alone."""
    av = a.select(F.col(id_col).alias("id"),
                  F.col(vec_col).alias("_vec_a"))
    bv = b.select(F.col(id_col).alias("id"),
                  F.col(vec_col).alias("_vec_b"))
    joined = av.join(bv, "id", "full_outer")
    sq_sum = F.aggregate(
        F.zip_with("_vec_a", "_vec_b",
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    max_abs = F.array_max(
        F.zip_with("_vec_a", "_vec_b",
                   lambda x, y: F.abs(x.cast("double")
                                      - y.cast("double"))))
    both = F.col("_vec_a").isNotNull() & F.col("_vec_b").isNotNull()
    same_dim = F.size("_vec_a") == F.size("_vec_b")
    status = (
        F.when(F.col("_vec_a").isNull(), F.lit("added"))
        .when(F.col("_vec_b").isNull(), F.lit("removed"))
        .when(~same_dim, F.lit("reshaped"))
        .when(max_abs > F.lit(float(atol)), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        "id",
        status.alias("status"),
        F.when(F.col("_vec_a").isNotNull(),
               F.size("_vec_a")).alias("dim_a"),
        F.when(F.col("_vec_b").isNotNull(),
               F.size("_vec_b")).alias("dim_b"),
        F.when(both & same_dim, F.round(F.sqrt(sq_sum), 6))
        .alias("l2_delta"),
        F.when(both & same_dim, F.round(max_abs, 6))
        .alias("max_abs_delta"),
    )
