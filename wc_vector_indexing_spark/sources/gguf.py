"""GGUF model-file source: headers-only tensor census + float/quant
tensor decode over the public GGUF container (ggml-org/ggml
``docs/gguf.md``, format version 3).

The reference pipeline inventories model checkpoints next to the corpora
they were trained on (reference: includes/class-vector-store.php export
manifest walk); on the llama.cpp side of the ecosystem those checkpoints
are GGUF, not safetensors — a single little-endian container of

    magic ``GGUF`` | uint32 version | uint64 tensor_count
    | uint64 metadata_kv_count | metadata KVs | tensor infos
    | padding to ``general.alignment`` | tensor data

Everything here is implemented from the published spec: typed metadata
values (the 13 GGUF value types incl. nested-free arrays), tensor infos
(name, dims, ggml type, aligned data offset), and the ggml block-quant
size table (block size x type size per 256/32-element block) so
``n_bytes`` is computed for quantized tensors WITHOUT reading their
data. Census passes are headers-only and metadata-cheap over multi-GB
shards, same posture as ``read_safetensors_index``.

Scale shape: one ``binaryFile`` scan + one Arrow pass, zero shuffle;
a corrupt shard is quarantined WHOLE under ``on_error='skip'`` (never a
partial inventory). Unknown ggml type ids and GGUF versions outside
{2, 3} are contract errors — refused, not guessed.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GGUF_MAGIC = b"GGUF"

# GGUF metadata value types (spec enum gguf_metadata_value_type)
_T_UINT8, _T_INT8, _T_UINT16, _T_INT16 = 0, 1, 2, 3
_T_UINT32, _T_INT32, _T_FLOAT32, _T_BOOL = 4, 5, 6, 7
_T_STRING, _T_ARRAY, _T_UINT64, _T_INT64, _T_FLOAT64 = 8, 9, 10, 11, 12

_SCALAR_FMT = {
    _T_UINT8: "<B", _T_INT8: "<b", _T_UINT16: "<H", _T_INT16: "<h",
    _T_UINT32: "<I", _T_INT32: "<i", _T_FLOAT32: "<f",
    _T_UINT64: "<Q", _T_INT64: "<q", _T_FLOAT64: "<d",
}

# ggml type enum -> (name, block_size, type_size_bytes).  The size pairs
# are the public ggml block layouts: e.g. Q4_0 = fp16 scale + 32 4-bit
# quants = 2 + 16 = 18 bytes per 32 elements; Q6_K = 128 ql + 64 qh +
# 16 scales + fp16 d = 210 bytes per 256 elements.
GGML_TYPES: dict[int, tuple[str, int, int]] = {
    0: ("F32", 1, 4),
    1: ("F16", 1, 2),
    2: ("Q4_0", 32, 18),
    3: ("Q4_1", 32, 20),
    6: ("Q5_0", 32, 22),
    7: ("Q5_1", 32, 24),
    8: ("Q8_0", 32, 34),
    9: ("Q8_1", 32, 36),
    10: ("Q2_K", 256, 84),
    11: ("Q3_K", 256, 110),
    12: ("Q4_K", 256, 144),
    13: ("Q5_K", 256, 176),
    14: ("Q6_K", 256, 210),
    15: ("Q8_K", 256, 292),
    24: ("I8", 1, 1),
    25: ("I16", 1, 2),
    26: ("I32", 1, 4),
    27: ("I64", 1, 8),
    28: ("F64", 1, 8),
    30: ("BF16", 1, 2),
}
_NAME_TO_ID = {name: tid for tid, (name, _, _) in GGML_TYPES.items()}

DEFAULT_ALIGNMENT = 32
_MAX_COUNT = 1 << 32  # sanity cap on declared counts (spec has none;
# a corrupt uint64 count must not drive a multi-GiB allocation loop)


class _Reader:
    """Bounds-checked little-endian cursor over one shard's bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.data):
            raise ValueError("gguf: truncated (read past end)")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def string(self) -> str:
        n = self.u64()
        if n > _MAX_COUNT:
            raise ValueError("gguf: string length over sanity cap")
        try:
            return self.take(n).decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"gguf: non-utf8 string: {e}") from e

    def value(self, vtype: int):
        if vtype in _SCALAR_FMT:
            fmt = _SCALAR_FMT[vtype]
            return struct.unpack(fmt, self.take(struct.calcsize(fmt)))[0]
        if vtype == _T_BOOL:
            b = self.take(1)[0]
            if b not in (0, 1):
                raise ValueError("gguf: bool byte not 0/1")
            return bool(b)
        if vtype == _T_STRING:
            return self.string()
        if vtype == _T_ARRAY:
            etype = self.u32()
            if etype == _T_ARRAY:
                raise ValueError("gguf: nested arrays are not in the spec")
            n = self.u64()
            if n > _MAX_COUNT:
                raise ValueError("gguf: array length over sanity cap")
            return [self.value(etype) for _ in range(n)]
        raise ValueError(f"gguf: unknown metadata value type {vtype}")


def parse_gguf_header(
    data: bytes, header_only: bool = False,
) -> tuple[dict, list[dict], int]:
    """Parse one shard's header: returns (metadata dict, tensor-info
    list, tensor-data base offset).  Tensor infos carry name / ggml
    type name / shape (ggml ``ne`` order reversed to row-major, the
    spec's own note) / n_params / n_bytes / absolute byte offset.
    Validates: magic, version ∈ {2,3}, utf-8 strings, known value and
    tensor types, dims divisible by the quant block size, offsets
    aligned and tiling the data section without gaps or overlaps.
    ``header_only=True`` skips the checks that need bytes beyond the
    parsed header (padding zeros, data-section overrun) — for prefix
    reads of multi-GB shards (:func:`read_gguf_header_prefix`)."""
    r = _Reader(data)
    if r.take(4) != GGUF_MAGIC:
        raise ValueError("gguf: bad magic")
    version = r.u32()
    if version not in (2, 3):
        raise ValueError(f"gguf: unsupported version {version} "
                         "(v1 32-bit counts not supported)")
    n_tensors = r.u64()
    n_kv = r.u64()
    if n_tensors > _MAX_COUNT or n_kv > _MAX_COUNT:
        raise ValueError("gguf: declared count over sanity cap")
    meta: dict = {}
    for _ in range(n_kv):
        key = r.string()
        vtype = r.u32()
        meta[key] = r.value(vtype)
    align = meta.get("general.alignment", DEFAULT_ALIGNMENT)
    if not isinstance(align, int) or align <= 0 or align & (align - 1):
        raise ValueError("gguf: general.alignment not a positive power of 2")
    infos: list[dict] = []
    for _ in range(n_tensors):
        name = r.string()
        n_dims = r.u32()
        if n_dims > 8:
            raise ValueError("gguf: n_dims over sanity cap")
        ne = [r.u64() for _ in range(n_dims)]
        ttype = r.u32()
        offset = r.u64()
        if ttype not in GGML_TYPES:
            raise ValueError(f"gguf: unknown ggml tensor type {ttype}")
        tname, blck, tsize = GGML_TYPES[ttype]
        n_elem = 1
        for d in ne:
            n_elem *= d
        if blck > 1 and (ne[0] if ne else 0) % blck:
            raise ValueError(
                f"gguf: {name!r} first dim {ne[0] if ne else 0} not "
                f"divisible by {tname} block size {blck}")
        if offset % align:
            raise ValueError(f"gguf: {name!r} offset not {align}-aligned")
        infos.append({
            "tensor": name, "ggml_type": tname,
            # spec: ne[] is column-major; reverse to the row-major shape
            "shape": list(reversed(ne)),
            "n_params": n_elem,
            "n_bytes": n_elem // blck * tsize if blck > 1 else n_elem * tsize,
            "offset": offset,
        })
    base = (r.pos + align - 1) // align * align
    # the writer zero-pads the header up to the alignment base; a
    # nonzero byte there is framing corruption (same strictness as the
    # safetensors trailing-bytes rule) — still headers-only, the check
    # never touches tensor data
    if not header_only and any(data[r.pos:min(base, len(data))]):
        raise ValueError("gguf: nonzero header padding")
    # offsets are relative to the data base and must tile it (padding
    # between tensors up to `align` is the spec's layout)
    spans = sorted((i["offset"], i["offset"] + i["n_bytes"])
                   for i in infos)
    pos = 0
    for s, e in spans:
        pad = (pos + align - 1) // align * align
        if s != pos and s != pad:
            raise ValueError("gguf: tensor offset gap/overlap")
        pos = e
    if not header_only and infos and base + pos > len(data):
        raise ValueError("gguf: tensor data overruns the file")
    for i in infos:
        i["offset"] += base
    return meta, infos, base


# ---------------------------------------------------------------------------
# writer half (fixtures + export) and float/quant codecs
# ---------------------------------------------------------------------------

def _emit_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _emit_value(v) -> bytes:
    """Infer the GGUF value type from the Python value (int→INT64 wide
    enough is wrong for alignment keys, so ints emit as UINT32 when they
    fit — matching what llama.cpp writes for general.alignment — else
    INT64; floats→FLOAT32; bool/str/list as themselves)."""
    if isinstance(v, bool):
        return struct.pack("<I", _T_BOOL) + bytes([int(v)])
    if isinstance(v, int):
        if 0 <= v < (1 << 32):
            return struct.pack("<I", _T_UINT32) + struct.pack("<I", v)
        return struct.pack("<I", _T_INT64) + struct.pack("<q", v)
    if isinstance(v, float):
        return struct.pack("<I", _T_FLOAT32) + struct.pack("<f", v)
    if isinstance(v, str):
        return struct.pack("<I", _T_STRING) + _emit_string(v)
    if isinstance(v, list):
        if not v:
            return (struct.pack("<I", _T_ARRAY)
                    + struct.pack("<I", _T_STRING) + struct.pack("<Q", 0))
        head = _emit_value(v[0])[:4]
        body = b"".join(_emit_value(x)[4:] for x in v)
        return (struct.pack("<I", _T_ARRAY) + head
                + struct.pack("<Q", len(v)) + body)
    raise ValueError(f"gguf writer: unsupported value {type(v).__name__}")


def quantize_q8_0(a: np.ndarray) -> bytes:
    """Reference Q8_0 quantization (ggml quantize_row_q8_0): per
    32-element block, scale d = max|x|/127 stored as fp16, quants =
    round(x/d) int8.  Row-major input, first dim divisible by 32."""
    if a.size % 32:
        raise ValueError("q8_0: element count not divisible by the "
                         "32-element block size")
    x = np.ascontiguousarray(a, dtype=np.float32).reshape(-1, 32)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(np.float16)
    d32 = d.astype(np.float32)
    inv = np.divide(1.0, d32, out=np.zeros_like(d32), where=d32 != 0)
    q = np.rint(x * inv[:, None]).clip(-127, 127).astype(np.int8)
    out = np.concatenate(
        [d.view(np.uint8).reshape(-1, 2), q.view(np.uint8)], axis=1)
    return out.tobytes()


def dequantize_q8_0(raw: bytes, n_elem: int) -> np.ndarray:
    """Inverse of :func:`quantize_q8_0`: x = d * q per block."""
    if n_elem % 32:
        raise ValueError("q8_0: n_elem not divisible by 32")
    blocks = n_elem // 32
    if len(raw) != blocks * 34:
        raise ValueError("q8_0: byte length != blocks x 34")
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(blocks, 34)
    d = buf[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    q = buf[:, 2:].copy().view(np.int8).astype(np.float32)
    return (q * d[:, None]).reshape(-1)


def quantize_q4_0(a: np.ndarray) -> bytes:
    """Reference Q4_0 (ggml quantize_row_q4_0): per 32-element block,
    d = max-magnitude-element / -8 (sign kept, fp16), quants =
    round(x/d) + 8 clamped to [0,15], packed low-nibble-first with
    element i in the low nibble of byte i%16 (pairs (i, i+16))."""
    if a.size % 32:
        raise ValueError("q4_0: element count not divisible by the "
                         "32-element block size")
    x = np.ascontiguousarray(a, dtype=np.float32).reshape(-1, 32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(len(x)), idx]
    d = (maxv / -8.0).astype(np.float16)
    d32 = d.astype(np.float32)
    inv = np.divide(1.0, d32, out=np.zeros_like(d32), where=d32 != 0)
    q = (np.rint(x * inv[:, None]) + 8).clip(0, 15).astype(np.uint8)
    packed = (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)
    out = np.concatenate(
        [d.view(np.uint8).reshape(-1, 2), packed], axis=1)
    return out.tobytes()


def dequantize_q4_0(raw: bytes, n_elem: int) -> np.ndarray:
    """Inverse layout of :func:`quantize_q4_0`: x = d * (q - 8)."""
    if n_elem % 32:
        raise ValueError("q4_0: n_elem not divisible by 32")
    blocks = n_elem // 32
    if len(raw) != blocks * 18:
        raise ValueError("q4_0: byte length != blocks x 18")
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(blocks, 18)
    d = buf[:, :2].copy().view(np.float16).astype(np.float32).reshape(-1)
    nib = buf[:, 2:]
    lo = (nib & 0x0F).astype(np.float32) - 8.0
    hi = (nib >> 4).astype(np.float32) - 8.0
    x = np.concatenate([lo, hi], axis=1) * d[:, None]
    return x.reshape(-1)


def _encode_tensor(a: np.ndarray, ggml_type: str) -> bytes:
    if ggml_type == "F32":
        return np.ascontiguousarray(a, dtype="<f4").tobytes()
    if ggml_type == "F16":
        return np.ascontiguousarray(a, dtype="<f2").tobytes()
    if ggml_type == "F64":
        return np.ascontiguousarray(a, dtype="<f8").tobytes()
    if ggml_type in ("I8", "I16", "I32", "I64"):
        return np.ascontiguousarray(
            a, dtype=f"<i{GGML_TYPES[_NAME_TO_ID[ggml_type]][2]}").tobytes()
    if ggml_type == "BF16":
        from wc_vector_indexing_spark.sources.safetensors import (
            f32_to_bf16_bits)
        return f32_to_bf16_bits(
            np.ascontiguousarray(a, dtype=np.float32)).astype("<u2").tobytes()
    if ggml_type == "Q8_0":
        return quantize_q8_0(a)
    if ggml_type == "Q4_0":
        return quantize_q4_0(a)
    raise NotImplementedError(
        f"gguf writer: encoding {ggml_type} is a seam (census-only type)")


def decode_tensor(raw: bytes, ggml_type: str, n_elem: int) -> np.ndarray:
    """Decode one tensor's bytes to float32/int64 (flat).  Float and
    integer types plus the two reference quant codecs; the K-quant
    family is a census-only seam (sizes known, decode refused)."""
    if ggml_type == "F32":
        return np.frombuffer(raw, dtype="<f4").astype(np.float32)
    if ggml_type == "F16":
        return np.frombuffer(raw, dtype="<f2").astype(np.float32)
    if ggml_type == "F64":
        return np.frombuffer(raw, dtype="<f8").astype(np.float64)
    if ggml_type == "BF16":
        from wc_vector_indexing_spark.sources.safetensors import (
            bf16_bits_to_f32)
        return bf16_bits_to_f32(np.frombuffer(raw, dtype="<u2"))
    if ggml_type in ("I8", "I16", "I32", "I64"):
        size = GGML_TYPES[_NAME_TO_ID[ggml_type]][2]
        return np.frombuffer(raw, dtype=f"<i{size}").astype(np.int64)
    if ggml_type == "Q8_0":
        return dequantize_q8_0(raw, n_elem)
    if ggml_type == "Q4_0":
        return dequantize_q4_0(raw, n_elem)
    raise NotImplementedError(
        f"gguf: {ggml_type} decode is a seam (block size known for "
        "census; dequantization not implemented)")


def to_gguf_bytes(
    metadata: dict,
    tensors: list[tuple[str, np.ndarray, str]],
    alignment: int = DEFAULT_ALIGNMENT,
    version: int = 3,
) -> bytes:
    """Serialize one GGUF shard: ``tensors`` is [(name, array,
    ggml_type)].  Deterministic layout: tensors in list order, each
    offset padded to ``alignment`` (the spec layout llama.cpp writes)."""
    meta = dict(metadata)
    meta.setdefault("general.alignment", alignment)
    head = bytearray()
    head += GGUF_MAGIC
    head += struct.pack("<I", version)
    head += struct.pack("<Q", len(tensors))
    head += struct.pack("<Q", len(meta))
    for k, v in meta.items():
        head += _emit_string(k)
        head += _emit_value(v)
    blobs: list[bytes] = []
    offset = 0
    for name, arr, ttype in tensors:
        if ttype not in _NAME_TO_ID:
            raise ValueError(f"gguf writer: unknown ggml type {ttype!r}")
        a = np.asarray(arr)
        blob = _encode_tensor(a, ttype)
        head += _emit_string(name)
        # row-major shape -> spec ne[] (column-major)
        ne = list(reversed(a.shape))
        head += struct.pack("<I", len(ne))
        for d in ne:
            head += struct.pack("<Q", d)
        head += struct.pack("<I", _NAME_TO_ID[ttype])
        head += struct.pack("<Q", offset)
        blobs.append(blob)
        offset += len(blob)
        offset = (offset + alignment - 1) // alignment * alignment
    base = (len(head) + alignment - 1) // alignment * alignment
    out = bytearray(head)
    out += b"\x00" * (base - len(head))
    for blob in blobs:
        out += blob
        pad = (-len(blob)) % alignment
        out += b"\x00" * pad
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark passes
# ---------------------------------------------------------------------------

def _index_parse_pass(raw: DataFrame, on_error: str = "raise") -> DataFrame:
    """Shared Arrow header-walk stage behind the batch census and its
    streaming twin (same can't-disagree contract as the other
    interchange sources)."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "tensor", "ggml_type", "shape",
                "n_params", "n_bytes"]
        for pdf in batches:
            rows: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    _, infos, _ = parse_gguf_header(bytes(content))
                except ValueError as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt gguf shard {fpath}: {e!r}") from e
                    continue
                rows.extend(
                    (fpath, i["tensor"], i["ggml_type"],
                     json.dumps(i["shape"], separators=(",", ":")),
                     i["n_params"], i["n_bytes"])
                    for i in infos)
            yield pd.DataFrame(rows, columns=cols)

    return raw.select("path", "content").mapInPandas(
        parse,
        schema="shard string, tensor string, ggml_type string, "
               "shape string, n_params long, n_bytes long")


def read_gguf_index(
    spark: SparkSession, path: str, on_error: str = "raise",
) -> DataFrame:
    """(shard, tensor, ggml_type, shape, n_params, n_bytes): the tensor
    inventory of every ``*.gguf`` file under ``path`` — HEADERS ONLY,
    quantized tensor sizes computed from the public ggml block table
    without touching tensor bytes.  One binaryFile scan + one Arrow
    pass, zero shuffle; ``on_error='skip'`` quarantines a corrupt
    shard whole."""
    raw = spark.read.format("binaryFile").load(path)
    return _index_parse_pass(raw, on_error)


def read_gguf_index_stream(
    spark: SparkSession, path: str, on_error: str = "raise",
) -> DataFrame:
    """Streaming twin of :func:`read_gguf_index`: file-source
    ``readStream`` sharing the batch header walk — checkpoint shards
    dropped into ``path`` (a training run's periodic dumps) census as
    micro-batches with exactly-once file tracking."""
    from wc_vector_indexing_spark.sources.readers import binaryfile_stream

    return _index_parse_pass(binaryfile_stream(spark, path), on_error)


def read_gguf_metadata(
    spark: SparkSession, path: str, on_error: str = "raise",
) -> DataFrame:
    """(shard, key, value_json): every shard's metadata KV table as
    canonical JSON strings — the model card (architecture, context
    length, tokenizer vocab, quantization version) without reading a
    single tensor byte."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "key", "value_json"]
        for pdf in batches:
            rows: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    meta, _, _ = parse_gguf_header(bytes(content))
                except ValueError as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt gguf shard {fpath}: {e!r}") from e
                    continue
                rows.extend(
                    (fpath, k, json.dumps(v, separators=(",", ":"),
                                          sort_keys=True))
                    for k, v in meta.items())
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(
        parse, schema="shard string, key string, value_json string")


def read_gguf_vectors(
    spark: SparkSession, path: str,
    tensor_prefix: str = "vec.",
    on_error: str = "raise",
) -> DataFrame:
    """(shard, vec_id, embedding): decode per-vector tensors written by
    :func:`write_gguf_vectors` — tensor ``<prefix><id>`` → one row.
    Float tensors decode exactly; Q8_0/Q4_0 decode through the
    reference dequant arithmetic."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "vec_id", "embedding"]
        for pdf in batches:
            rows: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                try:
                    _, infos, _ = parse_gguf_header(data)
                    for i in infos:
                        name = i["tensor"]
                        if not name.startswith(tensor_prefix):
                            continue
                        vals = decode_tensor(
                            data[i["offset"]:i["offset"] + i["n_bytes"]],
                            i["ggml_type"], i["n_params"])
                        rows.append((fpath, int(name[len(tensor_prefix):]),
                                     [float(x) for x in vals]))
                except ValueError as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"corrupt gguf shard {fpath}: {e!r}") from e
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(
        parse, schema="shard string, vec_id long, embedding array<float>")


def write_gguf_vectors(
    df: DataFrame, out_dir: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    ggml_type: str = "F32",
    metadata: dict | None = None,
) -> list:
    """Distributed GGUF export: one shard per partition, each vector a
    ``vec.<id>`` tensor of the requested ggml type.  Same
    atomic-publish shape as ``write_safetensors_vectors``: tensor
    bytes build in memory per partition, shard published by rename.
    Returns the collected (shard, n_rows) manifest — bounded at one
    row per partition."""
    import os
    import uuid

    meta = dict(metadata or {})
    meta.setdefault("general.architecture", "wcvi.embedding")

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tensors: list[tuple[str, np.ndarray, str]] = []
        for pdf in batches:
            for i, v in zip(pdf[id_col], pdf[vec_col]):
                arr = np.asarray(list(v), dtype=np.float32)
                tensors.append((f"vec.{int(i)}", arr, ggml_type))
        if tensors:
            tensors.sort(key=lambda t: t[0])
            name = f"part-{uuid.uuid4().hex}.gguf"
            tmp = os.path.join(out_dir, f".{name}.tmp")
            with open(tmp, "wb") as f:
                f.write(to_gguf_bytes(meta, tensors))
            os.replace(tmp, os.path.join(out_dir, name))
            yield pd.DataFrame({"shard": [name], "n_rows": [len(tensors)]})

    os.makedirs(out_dir, exist_ok=True)
    for stale in os.listdir(out_dir):
        if stale.endswith(".gguf") or stale.endswith(".tmp"):
            os.remove(os.path.join(out_dir, stale))
    return df.select(id_col, vec_col).mapInPandas(
        dump, schema="shard string, n_rows long").collect()


def read_gguf_header_prefix(path: str,
                            initial_bytes: int = 1 << 20) -> tuple:
    """Driver-side header parse that reads only a PREFIX of the file:
    starts at ``initial_bytes`` and doubles until the header parses —
    so a multi-GB checkpoint's metadata costs MBs of IO, keeping the
    headers-only posture off-Spark too.  Returns the same
    (metadata, tensor_infos, data_base) triple as
    :func:`parse_gguf_header` (offsets absolute; the tensor-data
    overrun check is skipped since the data region is not read)."""
    import os

    size = os.path.getsize(path)
    n = min(initial_bytes, size)
    with open(path, "rb") as f:
        buf = f.read(n)
        while True:
            try:
                return parse_gguf_header(buf, header_only=True)
            except ValueError as e:
                if "truncated" not in str(e) or len(buf) >= size:
                    raise
                more = f.read(min(len(buf), size - len(buf)))
                buf += more


def read_gguf_tokenizer(path: str) -> dict[str, float]:
    """Extract the EMBEDDED tokenizer from a GGUF shard's metadata
    (the llama.cpp convention: ``tokenizer.ggml.tokens`` parallel to
    ``tokenizer.ggml.scores``) as a ``{piece: log_prob}`` dict — the
    exact closure ``operators.unigram_lm.unigram_encode_col`` takes,
    so token budgeting / fertility stats can run with the MODEL'S OWN
    vocabulary instead of a proxy.  Bounded driver-side read (header
    prefix only).  BPE-merge tokenizers (``tokenizer.ggml.merges``
    without scores) are an explicit seam; duplicate pieces keep the
    best (highest) score, matching unigram semantics."""
    meta, _, _ = read_gguf_header_prefix(path)
    tokens = meta.get("tokenizer.ggml.tokens")
    scores = meta.get("tokenizer.ggml.scores")
    if tokens is None:
        raise ValueError(
            f"gguf {path}: no tokenizer.ggml.tokens metadata")
    if scores is None:
        if "tokenizer.ggml.merges" in meta:
            raise NotImplementedError(
                "gguf: BPE-merge tokenizer (tokenizer.ggml.merges) is "
                "a seam — only score-carrying unigram vocabularies "
                "load here")
        raise ValueError(
            f"gguf {path}: tokenizer.ggml.scores missing")
    if len(tokens) != len(scores):
        raise ValueError(
            f"gguf {path}: tokens/scores length mismatch "
            f"({len(tokens)} vs {len(scores)})")
    logp: dict[str, float] = {}
    for t, s in zip(tokens, scores):
        if not isinstance(t, str):
            raise ValueError(f"gguf {path}: non-string token {t!r}")
        s = float(s)
        if t not in logp or s > logp[t]:
            logp[t] = s
    return logp
