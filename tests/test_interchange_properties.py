"""Property tests (hypothesis) for the interchange codecs: arbitrary
feature dicts / record batches must roundtrip the TFRecord Example
wire format and the Avro binary encoding exactly — the codecs carry
foreign training data, so 'works on the fixtures' is not enough."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from wc_vector_indexing_spark.sources.avro import (
    parse_avro_file,
    to_avro_bytes,
)
from wc_vector_indexing_spark.sources.tfrecord import (
    decode_example,
    encode_example,
    iter_tfrecord,
    to_tfrecord_bytes,
)

_name = st.text(
    st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=12
)
_int64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# float32-exact values: integers scaled by powers of two
_f32 = st.integers(min_value=-(2**20), max_value=2**20).map(
    lambda n: n / 64.0
)

_feature = st.one_of(
    st.tuples(st.just("bytes"),
              st.lists(st.binary(max_size=40), max_size=5)),
    st.tuples(st.just("int64"), st.lists(_int64, max_size=8)),
    st.tuples(st.just("float"), st.lists(_f32, max_size=8)),
)


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(_name, _feature, max_size=5))
def test_tfrecord_example_roundtrip_property(features):
    back = decode_example(encode_example(features))
    for name, (kind, vals) in features.items():
        bkind, bvals = back[name]
        if not vals:
            assert bvals == []  # empty list ≡ oneof unset, kind not recoverable
            continue
        assert bkind == kind
        assert bvals == list(vals)
    assert set(back) == set(features)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.dictionaries(_name, _feature, max_size=3), max_size=6))
def test_tfrecord_stream_roundtrip_property(examples):
    stream = to_tfrecord_bytes(examples)
    payloads = list(iter_tfrecord(stream))
    assert len(payloads) == len(examples)
    for ex, payload in zip(examples, payloads):
        got = decode_example(payload)
        assert set(got) == set(ex)


_avro_text = st.text(max_size=30)
_double = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.just(0.0),
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "doc_id": _int64,
                "text": _avro_text,
                "lang": st.one_of(st.none(), _avro_text),
                "ok": st.booleans(),
                "score": _double,
                "emb": st.lists(_double, max_size=4),
                "blob": st.binary(max_size=30),
            }
        ),
        max_size=8,
    ),
    st.sampled_from(["null", "deflate"]),
    st.integers(min_value=1, max_value=3),
)
def test_avro_container_roundtrip_property(rows, codec, block):
    from tests.test_avro import SCHEMA

    schema, back = parse_avro_file(
        to_avro_bytes(SCHEMA, rows, codec=codec, max_block_records=block)
    )
    assert schema == SCHEMA
    assert len(back) == len(rows)
    for want, got in zip(rows, back):
        for k, v in want.items():
            g = got[k]
            if isinstance(v, float):
                assert math.isclose(g, v, rel_tol=0, abs_tol=0) or g == v
            elif isinstance(v, list):
                assert g == v
            else:
                assert g == v


_aname = st.text(st.characters(min_codepoint=97, max_codepoint=122),
                 min_size=1, max_size=8)


@settings(max_examples=40, deadline=None)
@given(
    names=st.lists(_aname, min_size=1, max_size=4, unique=True),
    n=st.integers(min_value=0, max_value=9),
    data=st.data(),
)
def test_arrow_ipc_roundtrip_property(names, n, data):
    from wc_vector_indexing_spark.sources.arrow_ipc import (
        parse_arrow_file,
        to_arrow_ipc_bytes,
    )

    type_pool = {
        "long": st.one_of(st.none(), _int64),
        "double": st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False, width=64)),
        "string": st.one_of(st.none(), st.text(max_size=20)),
        "binary": st.one_of(st.none(), st.binary(max_size=20)),
        "array<long>": st.one_of(st.none(), st.lists(_int64, max_size=4)),
    }
    types = {nm: data.draw(st.sampled_from(sorted(type_pool)), label=nm)
             for nm in names}
    cols = {nm: [data.draw(type_pool[types[nm]]) for _ in range(n)]
            for nm in names}
    fmt = data.draw(st.sampled_from(["file", "stream"]))
    comp = data.draw(st.sampled_from([None, "zstd", "lz4"]))
    blob = to_arrow_ipc_bytes(cols, types, fmt=fmt, compression=comp,
                              max_rows_per_batch=4)
    parts = parse_arrow_file(blob, types)
    got: dict[str, list] = {nm: [] for nm in names}
    import pandas as pd

    for _, pdf in parts:
        for nm in names:
            for v in pdf[nm]:
                if v is None or v is pd.NA or (
                        isinstance(v, float) and math.isnan(v)):
                    got[nm].append(None)
                elif types[nm] == "array<long>":
                    got[nm].append([int(x) for x in v])
                elif types[nm] == "long":
                    got[nm].append(int(v))
                else:
                    got[nm].append(v)
    for nm in names:
        want = [list(v) if isinstance(v, list) else v for v in cols[nm]]
        assert got[nm] == want, (nm, types[nm])
