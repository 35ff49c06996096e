"""MPEG-1 Layer III decode/encode — mutual-inverse + structural tests.

No reference MP3 codec exists in this container, so correctness is
pinned the same way as the arithmetic-JPEG pair (jpeg_arith.py): every
stage is tested as an exact or SNR-bounded inverse of its encoder half,
plus bit-layout roundtrips for the side info / scalefactor / Huffman /
bit-reservoir grammar."""

from __future__ import annotations

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.mp3 import _frame_at
from wc_vector_indexing_spark.operators.mp3_decode import (
    GranuleInfo,
    alias_encode,
    alias_reduce,
    decode_mp3,
    encode_mp3,
    imdct_block,
    mdct_long,
    pack_side_info,
    parse_side_info,
    pqmf_analysis,
    pqmf_synthesis,
    _reorder_short,
)


def _best_snr(ref: np.ndarray, out: np.ndarray, dmax: int) -> float:
    best = -99.0
    lo, hi = 1000, min(len(ref), len(out)) - dmax - 10
    a = ref[lo:hi]
    for d in range(dmax):
        b = out[lo + d:hi + d]
        g = np.dot(a, b) / max(np.dot(b, b), 1e-30)
        e = a - g * b
        best = max(best, 10 * np.log10(np.sum(a ** 2) / max(np.sum(e ** 2), 1e-30)))
    return best


# ---------------------------------------------------------------- DSP core
def test_pqmf_near_perfect_reconstruction():
    rng = np.random.RandomState(7)
    x = rng.randn(32 * 300)
    y = pqmf_synthesis(pqmf_analysis(x))
    assert _best_snr(x, y, 560) > 45.0


def test_mdct_tdac_is_exact():
    rng = np.random.RandomState(3)
    sb = rng.randn(40, 18)
    prev = np.zeros(18)
    specs = []
    for g in range(40):
        specs.append(mdct_long(prev, sb[g]))
        prev = sb[g]
    rec = np.zeros(41 * 18)
    for g in range(40):
        rec[g * 18:g * 18 + 36] += imdct_block(specs[g], 0)
    err = np.abs(rec[18:18 + 38 * 18] - sb[:38].ravel()).max()
    assert err < 1e-10


def test_alias_butterflies_are_mutual_inverses():
    rng = np.random.RandomState(11)
    v = rng.randn(576)
    assert np.abs(alias_reduce(alias_encode(v)) - v).max() < 1e-12
    assert np.abs(alias_encode(alias_reduce(v)) - v).max() < 1e-12


def test_short_block_windows_overlap_to_constant_power():
    # three 12-sample sine windows at offsets 6/12/18 tile the granule
    w = np.sin(np.pi / 12 * (np.arange(12) + 0.5))
    acc = np.zeros(36)
    for i in range(3):
        acc[6 + 6 * i:18 + 6 * i] += w ** 2
    assert np.allclose(acc[12:24], 1.0)


def test_reorder_short_is_a_permutation():
    x = np.arange(576, dtype=float) + 1
    y = _reorder_short(x, 44100)
    assert sorted(y.tolist()) == sorted(x.tolist())
    assert not np.array_equal(y, x)


# ---------------------------------------------------------- bit grammar
def test_side_info_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(5)
    for nch in (1, 2):
        grans = [[GranuleInfo(
            part2_3_length=int(rng.randint(0, 4096)),
            big_values=int(rng.randint(0, 288)),
            global_gain=int(rng.randint(0, 256)),
            scalefac_compress=int(rng.randint(0, 16)),
            table_select=[int(rng.randint(0, 2)) for _ in range(3)],
            region0_count=int(rng.randint(0, 16)),
            region1_count=int(rng.randint(0, 8)),
            preflag=int(rng.randint(0, 2)),
            scalefac_scale=int(rng.randint(0, 2)),
            count1table_select=1,
        ) for _ in range(nch)] for _ in range(2)]
        scfsi = [[int(rng.randint(0, 2)) for _ in range(4)] for _ in range(nch)]
        blob = pack_side_info(123, scfsi, grans, nch)
        assert len(blob) == (17 if nch == 1 else 32)
        mdb, scfsi2, grans2 = parse_side_info(blob, nch)
        assert mdb == 123 and scfsi2 == scfsi
        for gr in range(2):
            for ch in range(nch):
                a, b = grans[gr][ch], grans2[gr][ch]
                for f in ("part2_3_length", "big_values", "global_gain",
                          "scalefac_compress", "region0_count",
                          "region1_count", "preflag", "scalefac_scale"):
                    assert getattr(a, f) == getattr(b, f), f
                assert a.table_select == b.table_select


def test_bit_reservoir_engages_and_decodes():
    rate = 44100
    t = np.arange(1152 * 5)
    pcm = (0.5 * np.sin(2 * np.pi * 700 * t / rate) * 32767).astype(np.int16)
    blob = encode_mp3(pcm, rate, bitrate_kbps=128)
    mdbs, i = [], 0
    while i < len(blob):
        fr = _frame_at(blob, i)
        if fr is None:
            break
        mdbs.append(parse_side_info(blob[i + 4:i + 21], 1)[0])
        i += fr[0]
    assert len(mdbs) == 5 and mdbs[0] == 0 and max(mdbs) > 0 <= 511
    out, r = decode_mp3(blob)
    assert r == rate and out.shape == (5 * 1152, 1)


# ------------------------------------------------------------ end to end
@pytest.mark.parametrize("rate", [32000, 44100, 48000])
def test_mono_sine_roundtrip_all_rates(rate):
    t = np.arange(1152 * 5)
    f = 1000.0
    pcm = (0.6 * np.sin(2 * np.pi * f * t / rate) * 32767).astype(np.int16)
    out, r2 = decode_mp3(encode_mp3(pcm, rate, bitrate_kbps=160))
    assert r2 == rate and out.shape == (5 * 1152, 1)
    seg = out[2304:, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak = np.argmax(spec) * rate / len(seg)
    assert abs(peak - f) < 30.0, peak
    assert _best_snr(pcm.astype(float), out[:, 0].astype(float), 2400) > 8.0


@pytest.mark.parametrize("use_ms", [False, True])
def test_stereo_separation(use_ms):
    rate = 44100
    t = np.arange(1152 * 5)
    pcm = (np.stack([0.5 * np.sin(2 * np.pi * 800 * t / rate),
                     0.5 * np.sin(2 * np.pi * 2000 * t / rate)],
                    axis=1) * 32767).astype(np.int16)
    out, _ = decode_mp3(encode_mp3(pcm, rate, bitrate_kbps=320, use_ms=use_ms))
    n = out.shape[0] - 2304
    for ch, f_own, f_other in ((0, 800, 2000), (1, 2000, 800)):
        spec = np.abs(np.fft.rfft(out[2304:, ch].astype(float)))
        own = spec[round(f_own * n / rate)]
        other = spec[round(f_other * n / rate)]
        assert own > 10 * other, (ch, own, other)


def test_id3_prologue_and_truncation():
    from wc_vector_indexing_spark.operators.mp3 import to_mp3_bytes

    rate = 44100
    pcm = (0.4 * np.sin(2 * np.pi * 900 * np.arange(2304) / rate)
           * 32767).astype(np.int16)
    blob = encode_mp3(pcm, rate)
    tagged = to_mp3_bytes(0, id3_text={"TIT2": "x"}) + blob
    assert np.array_equal(decode_mp3(tagged)[0], decode_mp3(blob)[0])
    with pytest.raises(ValueError):
        decode_mp3(b"definitely not mpeg audio")


def _build_intensity_stream(is_pos: int, rate: int = 44100,
                            n_frames: int = 3) -> bytes:
    """Hand-assemble a joint-stereo stream (mode_ext=1): the left
    channel carries a real quantized tone, the right channel is all
    zeros with its scalefactors holding the intensity POSITION — the
    exact layout 2.4.3.4.9.3 describes."""
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter,
        _encode_granule,
        _quantize_granule,
        alias_encode,
        mdct_long,
        pqmf_analysis,
    )

    t = np.arange(n_frames * 1152)
    x = 0.5 * np.sin(2 * np.pi * 1000 * t / rate)
    sb = pqmf_analysis(x)
    prev = np.zeros((32, 18))
    gran = []
    for g in range(n_frames * 2):
        blk = sb[g * 18:(g + 1) * 18].copy()
        blk[1::2, 1::2] *= -1.0
        z = np.vstack([prev.T, blk]) * np.sin(
            np.pi / 36 * (np.arange(36) + 0.5))[:, None]
        basis = np.cos(np.pi / 72 * (2 * np.arange(36)[:, None] + 1 + 18)
                       * (2 * np.arange(18)[None, :] + 1))
        xr = ((basis.T @ z) / 9.0).T.ravel()
        prev = blk.T
        info, sf, ix = _quantize_granule(alias_encode(xr), rate)
        bits = _encode_granule(info, sf, ix)
        # right channel: zero spectrum, scalefactors = is_pos
        rinfo = GranuleInfo(part2_3_length=0, big_values=0, global_gain=210,
                            scalefac_compress=14, table_select=[0, 0, 0])
        rbits = _BitWriter()
        for band in range(21):
            rbits.write(is_pos, 4 if band < 11 else 2)
        rinfo.part2_3_length = len(rbits)
        gran.append(((info, bits), (rinfo, rbits)))

    frame_len = 144 * 1000 * 320 // rate
    payload_cap = frame_len - 4 - 32
    out = bytearray()
    for f in range(n_frames):
        main = _BitWriter()
        grans = [gran[2 * f], gran[2 * f + 1]]
        for gr in range(2):
            for ch in range(2):
                main.bits.extend(grans[gr][ch][1].bits)
        side = pack_side_info(
            0, [[0] * 4, [0] * 4],
            [[grans[gr][0][0], grans[gr][1][0]] for gr in range(2)], 2)
        data = main.to_bytes()
        assert len(data) <= payload_cap
        from wc_vector_indexing_spark.operators.mp3_decode import (
            _BITRATE_KBPS,
            _SAMPLE_RATE,
        )

        br_idx = _BITRATE_KBPS[(1, 3)].index(320) + 1
        sr_idx = _SAMPLE_RATE[3].index(rate)
        hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                     (br_idx << 4) | (sr_idx << 2),
                     (1 << 6) | (1 << 4)])  # joint stereo, ext=1 intensity
        out += hdr + side + data + b"\x00" * (payload_cap - len(data))
    return bytes(out)


@pytest.mark.parametrize("is_pos,expect", [
    (0, "right"),   # tan(0)=0: everything pans right
    (6, "left"),    # hard left
    (3, "equal"),   # tan(pi/4)=1: equal split
])
def test_intensity_stereo_panning(is_pos, expect):
    out, r = decode_mp3(_build_intensity_stream(is_pos))
    seg = out[1152:].astype(np.float64)
    rms_l = np.sqrt((seg[:, 0] ** 2).mean())
    rms_r = np.sqrt((seg[:, 1] ** 2).mean())
    if expect == "right":
        assert rms_r > 10 * max(rms_l, 1e-9)
    elif expect == "left":
        assert rms_l > 10 * max(rms_r, 1e-9)
    else:
        assert 0.8 < rms_l / rms_r < 1.25


def test_intensity_is_pos_7_leaves_bands_alone():
    # is_pos 7 = illegal position: with no MS bit the band stays L/R —
    # left keeps the tone, right stays silent
    out, _ = decode_mp3(_build_intensity_stream(7))
    seg = out[1152:].astype(np.float64)
    assert np.sqrt((seg[:, 0] ** 2).mean()) > 100 * max(
        np.sqrt((seg[:, 1] ** 2).mean()), 1e-9)


def _patch_table_select(blob: bytes, value: int) -> bytes:
    """Overwrite granule-0/region-0 table_select in the side info:
    side info starts at byte 4; bits mdb(9)+priv(5)+scfsi(4)+
    part2_3(12)+bv(9)+gg(8)+sfc(4)+wsf(1) = 52 -> table_select[0] at
    bit offset 52."""
    out = bytearray(blob)
    bitpos = 52
    for j in range(5):
        bit = (value >> (4 - j)) & 1
        byte, sh = divmod(bitpos + j, 8)
        out[4 + byte] = (out[4 + byte] & ~(0x80 >> sh)) | (bit << (7 - sh))
    return bytes(out)


def test_foreign_huffman_table_is_a_seam():
    # table 24's transcription failed the validation gates, so the
    # 24-31 linbits group stays a raising seam
    rate = 44100
    pcm = (0.4 * np.sin(2 * np.pi * 900 * np.arange(1152) / rate)
           * 32767).astype(np.int16)
    blob = encode_mp3(pcm, rate)
    with pytest.raises(NotImplementedError, match="table 24"):
        decode_mp3(_patch_table_select(blob, 24))


def test_unused_table_is_corrupt_not_seam():
    # tables 4 and 14 are 'not used' per Table B.7: a stream selecting
    # one is corrupt input (ValueError), not a missing feature
    rate = 44100
    pcm = (0.4 * np.sin(2 * np.pi * 900 * np.arange(1152) / rate)
           * 32767).astype(np.int16)
    blob = encode_mp3(pcm, rate)
    with pytest.raises(ValueError, match="not used"):
        decode_mp3(_patch_table_select(blob, 4))


def test_enabled_table_on_wrong_stream_is_corrupt():
    # table 16 is ENABLED now; reinterpreting a table-1 stream under it
    # must fail as corrupt data, not as a missing table
    rate = 44100
    pcm = (0.4 * np.sin(2 * np.pi * 900 * np.arange(1152) / rate)
           * 32767).astype(np.int16)
    blob = encode_mp3(pcm, rate)
    with pytest.raises(ValueError):
        decode_mp3(_patch_table_select(blob, 16))


def test_layer2_stream_is_a_seam():
    # hand-build a Layer II header: sync + version 11, layer bits 10
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (2 << 1) | 1, (4 << 4) | 0, 0])
    frame = hdr + b"\x00" * 500
    with pytest.raises(NotImplementedError, match="Layer"):
        decode_mp3(frame)


def test_decode_audio_routes_mp3():
    from wc_vector_indexing_spark.operators.multimodal import decode_audio

    rate = 44100
    pcm = (0.5 * np.sin(2 * np.pi * 1200 * np.arange(2304) / rate)
           * 32767).astype(np.int16)
    out, r = decode_audio(encode_mp3(pcm, rate))
    assert r == rate and out.shape == (2304, 1) and out.dtype == np.int16
    with pytest.raises(NotImplementedError):
        decode_audio(b"OggS" + b"\x00" * 40)


# ------------------------------------------------- Table B.7 enablement gates
def test_every_shipped_b7_table_passes_structural_validation():
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _B7_RAW, validate_b7_table)

    for tid, (hlen, hcod) in _B7_RAW.items():
        assert validate_b7_table(hlen, hcod) == [], f"table {tid}"


def test_b7_enabled_set_and_seams():
    from wc_vector_indexing_spark.operators.mp3_decode import HUFFMAN_BIG

    enabled = {t for t, codes in HUFFMAN_BIG.items() if codes}
    assert enabled == {1, 2, 3, 5, 6, 7, 8, 9, 12,
                       16, 17, 18, 19, 20, 21, 22, 23}
    # rejected transcriptions stay seams
    for seam in (10, 11, 13, 15, 24, 31):
        assert seam not in HUFFMAN_BIG


def test_b7_roundtrip_every_enabled_table():
    from wc_vector_indexing_spark.operators.mp3_decode import (
        HUFFMAN_BIG, _roundtrip_b7_table)

    for tid, codes in HUFFMAN_BIG.items():
        if codes:
            assert _roundtrip_b7_table(tid, codes), f"table {tid}"


def test_count1_table_a_decodes():
    # hand-build a granule: no scalefactors, no big values, four quads
    # coded with count1 table A (count1table_select=0), signs for the
    # nonzero lines
    from wc_vector_indexing_spark.operators.mp3_decode import (
        COUNT1_A, _BitReader, _BitWriter, _decode_huffman)

    quads = [0b1111, 0b0000, 0b1010, 0b0001]
    signs = [[1, 0, 1, 0], [], [0, 1], [1]]
    w = _BitWriter()
    for q, sg in zip(quads, signs):
        w.write_code(COUNT1_A[q])
        for s in sg:
            w.write(s, 1)
    g = GranuleInfo(part2_3_length=len(w), big_values=0, global_gain=210,
                    scalefac_compress=0, table_select=[0, 0, 0],
                    count1table_select=0)
    r = _BitReader(w.to_bytes())
    ix = _decode_huffman(r, g, [0] * 22 + [576], 0)
    expect = np.zeros(576)
    expect[:4] = [-1, 1, -1, 1]
    expect[8:12] = [1, 0, -1, 0]
    expect[15] = -1
    assert np.array_equal(ix[:16], expect[:16])
    assert not ix[16:].any()


def test_count1_a_is_a_complete_code():
    # Kraft equality means EVERY bit pattern resolves to some quad —
    # the undecodable-code guard in the decoder is unreachable for
    # intact table data; pin the completeness that guarantees it
    from wc_vector_indexing_spark.operators.mp3_decode import COUNT1_A

    lmax = max(len(c) for c in COUNT1_A.values())
    assert sum(1 << (lmax - len(c)) for c in COUNT1_A.values()) == 1 << lmax


@pytest.mark.parametrize("table,max_ix", [
    (2, 2), (3, 2), (5, 3), (6, 3), (7, 5), (8, 5), (9, 5), (12, 7),
    (16, 16), (19, 24), (23, 40),
])
def test_full_codec_roundtrip_per_table(table, max_ix):
    rate = 32000
    t = np.arange(int(0.15 * rate)) / rate
    x = 0.45 * np.sin(2 * np.pi * 700 * t) + 0.3 * np.sin(2 * np.pi * 2500 * t)
    pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
    blob = encode_mp3(pcm, rate, table=table, max_ix=max_ix)
    out, r2 = decode_mp3(blob)
    assert r2 == rate
    assert _best_snr(pcm.astype(float), out[:, 0].astype(float), 2400) > 8.0


def test_multilevel_quantizer_exercises_linbits_escape():
    # a strong single tone at max_ix 40 on table 20 (linbits 6) must
    # produce |ix| > 15 somewhere — proving the escape path runs in a
    # real stream, then decode exactly recovers the integers
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitReader, _BitWriter, _encode_granule, _quantize_granule,
        _read_big_pair, SLEN)

    rng = np.random.RandomState(11)
    xr = rng.randn(576) * np.exp(-np.arange(576) / 100.0)
    info, sf, ix = _quantize_granule(xr, 44100, 0, max_ix=40)
    assert np.abs(ix).max() > 15
    bits = _encode_granule(info, sf, ix, table=20)
    r = _BitReader(bits.to_bytes())
    slen1, slen2 = SLEN[info.scalefac_compress]
    r.pos = sum((slen1 if b < 11 else slen2) for b in range(21))
    got = []
    for _ in range(info.big_values):
        got.extend(_read_big_pair(r, 20))
    assert np.array_equal(np.array(got), ix[:2 * info.big_values])


def test_encode_rejects_seam_table_and_bad_max_ix():
    pcm = np.zeros(1152, dtype=np.int16)
    with pytest.raises(NotImplementedError):
        encode_mp3(pcm, 44100, table=24)
    with pytest.raises(ValueError, match="max_ix"):
        encode_mp3(pcm, 44100, table=2, max_ix=5)


# -------------------------------------------- short-block intensity stereo
def _short_intensity_frame(is_pos: int) -> bytes:
    """Hand-assemble one stereo joint-stereo frame (mode_ext=1,
    intensity only) whose two granules are pure SHORT blocks: the left
    channel carries |ix|=1 lines in the first two short bands of every
    window, the right channel carries NO spectral lines (so every
    window's zero bound is band 0 and ALL bands are intensity), and
    every right scalefactor is the given stereo position."""
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter, _write_big_pair, pack_side_info)

    rate, bitrate = 44100, 128

    def granule_pair():
        # left: no scalefactor bits (scalefac_compress 0); 9 big-value
        # pairs covering pre-reorder lines 0..17 (bands 0-1, windows 0-2)
        wl = _BitWriter()
        for _ in range(9):
            _write_big_pair(wl, 1, -1, 1)
        gl = GranuleInfo(
            part2_3_length=len(wl), big_values=9, global_gain=210,
            scalefac_compress=0, window_switching=1, block_type=2,
            mixed_block=0, table_select=[1, 1, 0],
            subblock_gain=[0, 0, 0], count1table_select=1)
        # right: short scalefactors only (scalefac_compress 13 ->
        # slen (3,3)), every band/window = is_pos; zero big values
        wr = _BitWriter()
        for _band in range(12):
            for _w in range(3):
                wr.write(is_pos, 3)
        gr = GranuleInfo(
            part2_3_length=len(wr), big_values=0, global_gain=210,
            scalefac_compress=13, window_switching=1, block_type=2,
            mixed_block=0, table_select=[0, 0, 0],
            subblock_gain=[0, 0, 0], count1table_select=1)
        return (gl, wl), (gr, wr)

    (g0l, w0l), (g0r, w0r) = granule_pair()
    (g1l, w1l), (g1r, w1r) = granule_pair()
    side = pack_side_info(0, [[0] * 4, [0] * 4],
                          [[g0l, g0r], [g1l, g1r]], nch=2)
    main = _BitWriter()
    for wbits in (w0l, w0r, w1l, w1r):
        main.bits.extend(wbits.bits)
    payload = main.to_bytes()
    frame_len = 144 * 1000 * bitrate // rate
    # header: MPEG-1 Layer III, 128 kbps (idx 8), 44100 (idx 0),
    # joint stereo (mode 1), mode_ext=1 (intensity on, MS off)
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (8 << 4) | (0 << 2), (1 << 6) | (1 << 4)])
    body = hdr + side + payload
    return body + b"\x00" * (frame_len - len(body))


def test_short_block_intensity_hard_left():
    # is_pos 6 = hard left: the right channel must decode to silence
    out, rate = decode_mp3(_short_intensity_frame(6))
    assert rate == 44100
    left, right = out[:, 0].astype(float), out[:, 1].astype(float)
    assert np.abs(left).max() > 100  # signal survived the pipeline
    assert np.abs(right).max() == 0


def test_short_block_intensity_centre_position():
    # is_pos 3 -> ratio tan(pi/4) = 1 -> L and R identical
    out, _ = decode_mp3(_short_intensity_frame(3))
    left, right = out[:, 0].astype(float), out[:, 1].astype(float)
    assert np.abs(left).max() > 50
    assert np.array_equal(left, right)


def test_short_block_intensity_illegal_position_leaves_lr():
    # is_pos 7 is 'illegal': with MS off the band stays L/R, so the
    # right channel keeps its (zero) lines and left keeps the signal
    out, _ = decode_mp3(_short_intensity_frame(7))
    left, right = out[:, 0].astype(float), out[:, 1].astype(float)
    assert np.abs(left).max() > 100
    assert np.abs(right).max() == 0


def test_mixed_block_intensity_head_respects_short_content():
    # intensity starts strictly after the right channel's LAST nonzero
    # line: if the right SHORT region carries content, no long-head
    # band may be intensity-processed even when the head itself is zero
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _intensity_stereo)

    g = GranuleInfo(part2_3_length=0, big_values=0, global_gain=210,
                    scalefac_compress=0, window_switching=1,
                    block_type=2, mixed_block=1, table_select=[0, 0, 0])
    sf = {"long": [6] * 8, "short": [[7, 7, 7]] * 12}
    left = np.ones(576)
    right = np.zeros(576)
    right[40] = 2.0  # short-region content (post-reorder line)
    out_l, out_r = _intensity_stereo([left, right], g, sf, 0,
                                     44100, ms=False)
    # head untouched (no intensity: right's zero part hasn't started)
    assert np.array_equal(out_l[:36], left[:36])
    assert np.array_equal(out_r[:36], right[:36])


# ------------------------------------------------------ MPEG-2/2.5 LSF
def test_lsf_slen_decomposition_is_mixed_radix():
    # recompose every 9-bit scalefac_compress from its digits: the
    # decomposition must be a bijection onto the three range encodings
    from wc_vector_indexing_spark.operators.mp3_decode import _lsf_slens

    for sfc in range(512):
        (s1, s2, s3, s4), rng, pre = _lsf_slens(sfc)
        if rng == 0:
            assert ((s1 * 5 + s2) << 4) + (s3 << 2) + s4 == sfc and pre == 0
            assert s1 < 5 and s2 < 5 and s3 < 4 and s4 < 4
        elif rng == 1:
            assert 400 + (((s1 * 5 + s2) << 2) + s3) == sfc and s4 == 0
            assert pre == 0 and s1 < 5 and s2 < 5 and s3 < 4
        else:
            assert 500 + s1 * 3 + s2 == sfc and s3 == s4 == 0 and pre == 1
            assert s1 < 4 and s2 < 3


def test_lsf_partition_sums():
    from wc_vector_indexing_spark.operators.mp3_decode import _LSF_NSFB

    for long_p, short_p, mixed_p in _LSF_NSFB.values():
        assert sum(long_p) == 21
        assert sum(short_p) == 36
        assert sum(mixed_p) == 33


def test_lsf_sfb_tables_structural():
    from wc_vector_indexing_spark.operators.mp3_decode import (
        SFB_LONG, SFB_SHORT)

    for rate in (22050, 24000, 16000, 11025, 12000, 8000):
        lt, st = SFB_LONG[rate], SFB_SHORT[rate]
        assert len(lt) == 23 and lt[0] == 0 and lt[-1] == 576
        assert len(st) == 14 and st[0] == 0 and st[-1] == 192
        assert all(a < b for a, b in zip(lt, lt[1:]))
        assert all(a < b for a, b in zip(st, st[1:]))


def test_lsf_side_info_roundtrip():
    from wc_vector_indexing_spark.operators.mp3_decode import (
        pack_side_info_lsf, parse_side_info_lsf)

    rng = np.random.RandomState(9)
    for nch in (1, 2):
        grans = [GranuleInfo(
            part2_3_length=int(rng.randint(0, 4096)),
            big_values=int(rng.randint(0, 288)),
            global_gain=int(rng.randint(0, 256)),
            scalefac_compress=int(rng.randint(0, 400)),
            table_select=[int(rng.randint(0, 2)) for _ in range(3)],
            region0_count=int(rng.randint(0, 16)),
            region1_count=int(rng.randint(0, 8)),
            scalefac_scale=int(rng.randint(0, 2)),
            count1table_select=1,
        ) for _ in range(nch)]
        blob = pack_side_info_lsf(57, grans, nch)
        assert len(blob) == (9 if nch == 1 else 17)
        mdb, grans2 = parse_side_info_lsf(blob, nch)
        assert mdb == 57
        for a, b in zip(grans, grans2):
            for f in ("part2_3_length", "big_values", "global_gain",
                      "scalefac_compress", "region0_count",
                      "region1_count", "scalefac_scale"):
                assert getattr(a, f) == getattr(b, f), f
            assert a.table_select == b.table_select


@pytest.mark.parametrize("rate", [22050, 24000, 16000, 11025, 12000, 8000])
def test_lsf_roundtrip_all_rates(rate):
    # the mutual-inverse gate the LSF implementation had to pass: a
    # planted tone through encode -> full decode at every LSF rate,
    # with the real multi-level quantizer on the ESC table
    f = min(900.0, rate / 3.2)
    t = np.arange(576 * 6)
    pcm = (0.5 * np.sin(2 * np.pi * f * t / rate) * 32767).astype(np.int16)
    blob = encode_mp3(pcm, rate, bitrate_kbps=64, table=16, max_ix=16)
    out, r2 = decode_mp3(blob)
    assert r2 == rate and out.shape == (6 * 576, 1)
    seg = out[576:, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak = np.argmax(spec) * rate / len(seg)
    assert abs(peak - f) < 30.0, peak
    assert _best_snr(pcm.astype(float), out[:, 0].astype(float), 1200) > 8.0


def test_lsf_one_granule_bit_layout_and_reservoir():
    # LSF frames carry ONE granule and an 8-bit main_data_begin; pin
    # the layout by walking the emitted frames and checking the
    # reservoir engages (mdb > 0 somewhere, never above 255)
    from wc_vector_indexing_spark.operators.mp3_decode import (
        parse_side_info_lsf)

    rate = 16000
    t = np.arange(576 * 8)
    pcm = (0.5 * np.sin(2 * np.pi * 500 * t / rate) * 32767).astype(np.int16)
    blob = encode_mp3(pcm, rate, bitrate_kbps=48)
    mdbs, i = [], 0
    while i < len(blob):
        fr = _frame_at(blob, i)
        if fr is None:
            break
        assert (blob[i + 1] >> 3) & 3 == 2  # MPEG-2 version bits
        mdbs.append(parse_side_info_lsf(blob[i + 4:i + 13], 1)[0])
        i += fr[0]
    assert len(mdbs) == 8 and mdbs[0] == 0
    assert max(mdbs) > 0 and max(mdbs) <= 255
    out, r2 = decode_mp3(blob)
    assert r2 == rate and out.shape == (8 * 576, 1)


def test_lsf_stereo_ms_and_intensity_seam():
    rate = 22050
    t = np.arange(576 * 4)
    pcm = (np.stack([0.5 * np.sin(2 * np.pi * 600 * t / rate),
                     0.5 * np.sin(2 * np.pi * 1800 * t / rate)],
                    axis=1) * 32767).astype(np.int16)
    out, r2 = decode_mp3(encode_mp3(pcm, rate, bitrate_kbps=128,
                                    use_ms=True))
    assert r2 == rate and out.shape == (4 * 576, 2)
    # flip mode_ext to intensity (bit 4) on the emitted stream: seam
    blob = bytearray(encode_mp3(pcm, rate, bitrate_kbps=128))
    blob[3] = (1 << 6) | (1 << 4)
    with pytest.raises(NotImplementedError, match="LSF intensity"):
        decode_mp3(bytes(blob))


def test_lsf_scalefactors_survive_the_bit_layout():
    # spectral-layer exactness: quantized scalefactors + integer lines
    # written through the LSF partitions read back identically
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitReader, _encode_granule, _quantize_granule,
        _read_big_pair, _read_scalefactors_lsf)

    rng = np.random.RandomState(21)
    xr = rng.randn(576) * np.exp(-np.arange(576) / 90.0)
    info, sf, ix = _quantize_granule(xr, 22050, 0, max_ix=9)
    info.scalefac_compress = 394  # what encode_mp3 does for LSF
    bits = _encode_granule(info, sf, ix, table=16, lsf=True)
    r = _BitReader(bits.to_bytes())
    sf2 = _read_scalefactors_lsf(r, info)
    assert sf2 == sf
    got = []
    for _ in range(info.big_values):
        got.extend(_read_big_pair(r, 16))
    assert np.array_equal(np.array(got), ix[:2 * info.big_values])


# ----------------------------------------------------- mixed blocks (MPEG-1)
def _mono_frame(granule_builder) -> bytes:
    """Assemble one mono MPEG-1 frame (two identical granules built by
    ``granule_builder() -> (GranuleInfo, main_bits)``)."""
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter, pack_side_info)

    rate, bitrate = 44100, 128
    (g0, w0), (g1, w1) = granule_builder(), granule_builder()
    side = pack_side_info(0, [[0] * 4], [[g0], [g1]], nch=1)
    main = _BitWriter()
    main.bits.extend(w0.bits)
    main.bits.extend(w1.bits)
    payload = main.to_bytes()
    frame_len = 144 * 1000 * bitrate // rate
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (8 << 4) | (0 << 2), (3 << 6)])
    body = hdr + side + payload
    assert len(body) <= frame_len
    return body + b"\x00" * (frame_len - len(body))


def test_mixed_block_scalefactor_bit_layout():
    # 8 long at slen1, short bands 3-5 at slen1, 6-11 at slen2 —
    # 17*slen1 + 18*slen2 bits, values recovered exactly
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitReader, _BitWriter, _read_scalefactors)

    slen1, slen2 = 3, 2  # scalefac_compress 12
    long_vals = [(7 * i + 3) % (1 << slen1) for i in range(8)]
    short_vals = {b: [(b + w) % (1 << (slen1 if b < 6 else slen2))
                      for w in range(3)] for b in range(3, 12)}
    w = _BitWriter()
    for v in long_vals:
        w.write(v, slen1)
    for b in range(3, 6):
        for v in short_vals[b]:
            w.write(v, slen1)
    for b in range(6, 12):
        for v in short_vals[b]:
            w.write(v, slen2)
    assert len(w) == 17 * slen1 + 18 * slen2
    g = GranuleInfo(part2_3_length=len(w), big_values=0, global_gain=210,
                    scalefac_compress=12, window_switching=1,
                    block_type=2, mixed_block=1, table_select=[0, 0, 0])
    r = _BitReader(w.to_bytes())
    sf = _read_scalefactors(r, g, 0, [0] * 4, None)
    assert r.pos == len(w)
    assert sf["long"] == long_vals
    assert sf["short"][:3] == [[0, 0, 0]] * 3
    for b in range(3, 12):
        assert sf["short"][b] == short_vals[b], b


def test_reorder_short_mixed_keeps_long_head():
    x = np.arange(576, dtype=float) + 1
    y = _reorder_short(x, 44100, first_band=3)
    assert np.array_equal(y[:36], x[:36])
    assert sorted(y.tolist()) == sorted(x.tolist())
    assert not np.array_equal(y[36:], x[36:])


def test_mixed_block_equals_long_block_when_content_in_subband0():
    # content confined to subband 0 (lines 0-17): the mixed granule's
    # long head covers it with bt=0 windows and its alias reduction
    # (the single sb0|sb1 butterfly) coincides with the full long-block
    # alias pass over an otherwise-zero spectrum, so the two streams
    # must decode BIT-IDENTICALLY — an exact cross-layout pin of the
    # mixed scalefactor/requantize/reorder path
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter, _write_big_pair)

    def pairs_writer():
        w = _BitWriter()
        for k in range(9):
            _write_big_pair(w, 1 if k % 3 else -1, -1 if k % 2 else 1, 1)
        return w

    def mixed_granule():
        w = pairs_writer()
        g = GranuleInfo(
            part2_3_length=len(w), big_values=9, global_gain=200,
            scalefac_compress=0, window_switching=1, block_type=2,
            mixed_block=1, table_select=[1, 1, 0],
            subblock_gain=[0, 0, 0], count1table_select=1)
        return g, w

    def long_granule():
        w = pairs_writer()
        g = GranuleInfo(
            part2_3_length=len(w), big_values=9, global_gain=200,
            scalefac_compress=0, window_switching=0,
            table_select=[1, 1, 0], region0_count=7, region1_count=7,
            count1table_select=1)
        return g, w

    out_mixed, r1 = decode_mp3(_mono_frame(mixed_granule))
    out_long, r2 = decode_mp3(_mono_frame(long_granule))
    assert r1 == r2 == 44100
    assert np.abs(out_long).max() > 100
    assert np.array_equal(out_mixed, out_long)


def test_mixed_block_short_region_decodes():
    # content planted PAST the long head (pre-reorder lines 36-39 =
    # short band 3, window 0) flows through the short-region
    # requantize/reorder/IMDCT path and reaches the PCM
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter, _write_big_pair)

    def granule():
        w = _BitWriter()
        for _ in range(18):
            _write_big_pair(w, 0, 0, 1)
        for _ in range(2):
            _write_big_pair(w, 1, -1, 1)
        g = GranuleInfo(
            part2_3_length=len(w), big_values=20, global_gain=200,
            scalefac_compress=0, window_switching=1, block_type=2,
            mixed_block=1, table_select=[1, 1, 0],
            subblock_gain=[0, 0, 0], count1table_select=1)
        return g, w

    out, rate = decode_mp3(_mono_frame(granule))
    assert rate == 44100
    assert np.abs(out).max() > 50


def _mixed_intensity_frame(is_pos: int) -> bytes:
    """Stereo joint-stereo frame (mode_ext=1) whose granules are MIXED
    blocks: left carries content in both the long head (lines 0-17)
    and the short region (band 3, window 0); right carries no lines,
    only intensity positions in its mixed scalefactor layout."""
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter, _write_big_pair, pack_side_info)

    rate, bitrate = 44100, 160

    def left_granule():
        w = _BitWriter()
        for k in range(9):
            _write_big_pair(w, 1 if k % 3 else -1, 1, 1)
        for _ in range(9):
            _write_big_pair(w, 0, 0, 1)
        for _ in range(2):
            _write_big_pair(w, 1, -1, 1)
        g = GranuleInfo(
            part2_3_length=len(w), big_values=20, global_gain=200,
            scalefac_compress=0, window_switching=1, block_type=2,
            mixed_block=1, table_select=[1, 1, 0],
            subblock_gain=[0, 0, 0], count1table_select=1)
        return g, w

    def right_granule():
        w = _BitWriter()
        for _ in range(8):      # long head sfs at slen1=3
            w.write(is_pos, 3)
        for _ in range(9):      # short bands 3-5 at slen1=3
            w.write(is_pos, 3)
        for _ in range(18):     # short bands 6-11 at slen2=3
            w.write(is_pos, 3)
        g = GranuleInfo(
            part2_3_length=len(w), big_values=0, global_gain=210,
            scalefac_compress=13, window_switching=1, block_type=2,
            mixed_block=1, table_select=[0, 0, 0],
            subblock_gain=[0, 0, 0], count1table_select=1)
        return g, w

    grans = [[left_granule(), right_granule()] for _ in range(2)]
    side = pack_side_info(
        0, [[0] * 4, [0] * 4],
        [[grans[gr][ch][0] for ch in range(2)] for gr in range(2)], nch=2)
    main = _BitWriter()
    for gr in range(2):
        for ch in range(2):
            main.bits.extend(grans[gr][ch][1].bits)
    payload = main.to_bytes()
    frame_len = 144 * 1000 * bitrate // rate
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (9 << 4) | (0 << 2), (1 << 6) | (1 << 4)])
    body = hdr + side + payload
    assert len(body) <= frame_len
    return body + b"\x00" * (frame_len - len(body))


def test_mixed_block_intensity_hard_left():
    out, rate = decode_mp3(_mixed_intensity_frame(6))
    assert rate == 44100
    left, right = out[:, 0].astype(float), out[:, 1].astype(float)
    assert np.abs(left).max() > 100
    assert np.abs(right).max() == 0


def test_mixed_block_intensity_centre_position():
    out, _ = decode_mp3(_mixed_intensity_frame(3))
    left, right = out[:, 0].astype(float), out[:, 1].astype(float)
    assert np.abs(left).max() > 50
    assert np.array_equal(left, right)


# --------------------------------------- review fixes (foreign-input paths)
def test_intensity_with_mismatched_block_types_is_corrupt():
    # left long + right short in intensity mode: no coherent band
    # mapping exists -> ValueError, never silent garbage
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter, _write_big_pair, pack_side_info)

    rate, bitrate = 44100, 128

    def left_long():
        w = _BitWriter()
        for _ in range(4):
            _write_big_pair(w, 1, -1, 1)
        g = GranuleInfo(part2_3_length=len(w), big_values=4,
                        global_gain=200, scalefac_compress=0,
                        table_select=[1, 1, 0], region0_count=7,
                        region1_count=7, count1table_select=1)
        return g, w

    def right_short():
        w = _BitWriter()
        g = GranuleInfo(part2_3_length=len(w), big_values=0,
                        global_gain=210, scalefac_compress=0,
                        window_switching=1, block_type=2, mixed_block=0,
                        table_select=[0, 0, 0], subblock_gain=[0, 0, 0],
                        count1table_select=1)
        return g, w

    grans = [[left_long(), right_short()] for _ in range(2)]
    side = pack_side_info(
        0, [[0] * 4, [0] * 4],
        [[grans[gr][ch][0] for ch in range(2)] for gr in range(2)], nch=2)
    main = _BitWriter()
    for gr in range(2):
        for ch in range(2):
            main.bits.extend(grans[gr][ch][1].bits)
    frame_len = 144 * 1000 * bitrate // rate
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (8 << 4) | (0 << 2), (1 << 6) | (1 << 4)])
    body = hdr + side + main.to_bytes()
    blob = body + b"\x00" * (frame_len - len(body))
    with pytest.raises(ValueError, match="mismatched channel block"):
        decode_mp3(blob)


def test_scfsi_referencing_short_granule0_is_corrupt():
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitReader, _read_scalefactors)

    g = GranuleInfo(part2_3_length=0, big_values=0, global_gain=210,
                    scalefac_compress=0, window_switching=0,
                    table_select=[0, 0, 0], count1table_select=1)
    mixed_prev = {"long": [0] * 8, "short": [[0, 0, 0]] * 12}
    with pytest.raises(ValueError, match="scfsi"):
        _read_scalefactors(_BitReader(b"\x00" * 8), g, 1,
                           [1, 0, 0, 0], mixed_prev)
    short_prev = [[0, 0, 0]] * 12
    with pytest.raises(ValueError, match="scfsi"):
        _read_scalefactors(_BitReader(b"\x00" * 8), g, 1,
                           [1, 0, 0, 0], short_prev)


def test_lsf_short_block_scalefactor_partitions():
    # LSF short blocks split 36 scalefactors over the range's SHORT
    # partition row ((9,9,9,9) for range 0) — pin the bit layout and
    # exact recovery, band-major window-minor order
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitReader, _BitWriter, _lsf_slens, _read_scalefactors_lsf)

    sfc = ((3 * 5 + 2) << 4) + (2 << 2) + 1  # slens (3, 2, 2, 1), range 0
    slens, rng, pre = _lsf_slens(sfc)
    assert slens == (3, 2, 2, 1) and rng == 0 and pre == 0
    flat_slens = [3] * 9 + [2] * 9 + [2] * 9 + [1] * 9
    vals = [(i * 5 + 1) % (1 << s) for i, s in enumerate(flat_slens)]
    w = _BitWriter()
    for v, s in zip(vals, flat_slens):
        w.write(v, s)
    g = GranuleInfo(part2_3_length=len(w), big_values=0, global_gain=210,
                    scalefac_compress=sfc, window_switching=1,
                    block_type=2, mixed_block=0, table_select=[0, 0, 0])
    r = _BitReader(w.to_bytes())
    sf = _read_scalefactors_lsf(r, g)
    assert r.pos == len(w) == sum(flat_slens)
    for band in range(12):
        assert sf[band] == vals[3 * band:3 * band + 3], band


def test_lsf_short_block_full_stream():
    # hand-assembled MPEG-2 mono frame whose single granule is a pure
    # short block: planted |ix|=1 lines flow through the LSF side
    # info, LSF short scalefactors, reorder and the short IMDCT
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter, _write_big_pair, pack_side_info_lsf)

    rate, bitrate = 22050, 64

    def granule():
        w = _BitWriter()
        for _ in range(6):
            _write_big_pair(w, 1, -1, 1)
        g = GranuleInfo(part2_3_length=len(w), big_values=6,
                        global_gain=200, scalefac_compress=0,
                        window_switching=1, block_type=2, mixed_block=0,
                        table_select=[1, 1, 0], subblock_gain=[0, 0, 0],
                        count1table_select=1)
        return g, w

    g, w = granule()
    side = pack_side_info_lsf(0, [g], nch=1)
    assert len(side) == 9
    payload = w.to_bytes()
    frame_len = 72 * 1000 * bitrate // rate
    # MPEG-2 (version bits 10), Layer III, 64 kbps (idx 8 in LSF
    # table), 22050 Hz (idx 0), mono
    hdr = bytes([0xFF, 0xE0 | (2 << 3) | (1 << 1) | 1,
                 (8 << 4) | (0 << 2), (3 << 6)])
    body = hdr + side + payload
    assert len(body) <= frame_len
    out, r2 = decode_mp3(body + b"\x00" * (frame_len - len(body)))
    assert r2 == rate and out.shape == (576, 1)
    assert np.abs(out).max() > 50


def test_intensity_allows_differing_long_window_types():
    # left = START block (window_switching=1, block_type=1), right =
    # normal long: both share the LONG band structure, so intensity is
    # coherent and must decode — only a short/long shape disagreement
    # is corrupt
    from wc_vector_indexing_spark.operators.mp3_decode import (
        _BitWriter, _write_big_pair, pack_side_info)

    rate, bitrate = 44100, 128

    def left_start_block():
        w = _BitWriter()
        for _ in range(4):
            _write_big_pair(w, 1, -1, 1)
        g = GranuleInfo(part2_3_length=len(w), big_values=4,
                        global_gain=200, scalefac_compress=0,
                        window_switching=1, block_type=1, mixed_block=0,
                        table_select=[1, 1, 0], subblock_gain=[0, 0, 0],
                        count1table_select=1)
        return g, w

    def right_long():
        w = _BitWriter()
        # scalefac_compress 4 -> slen (3, 0): positions for bands 0-10
        for _ in range(11):
            w.write(6, 3)
        g = GranuleInfo(part2_3_length=len(w), big_values=0,
                        global_gain=210, scalefac_compress=4,
                        table_select=[0, 0, 0], region0_count=7,
                        region1_count=7, count1table_select=1)
        return g, w

    grans = [[left_start_block(), right_long()] for _ in range(2)]
    side = pack_side_info(
        0, [[0] * 4, [0] * 4],
        [[grans[gr][ch][0] for ch in range(2)] for gr in range(2)], nch=2)
    main = _BitWriter()
    for gr in range(2):
        for ch in range(2):
            main.bits.extend(grans[gr][ch][1].bits)
    frame_len = 144 * 1000 * bitrate // rate
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (8 << 4) | (0 << 2), (1 << 6) | (1 << 4)])
    body = hdr + side + main.to_bytes()
    out, r2 = decode_mp3(body + b"\x00" * (frame_len - len(body)))
    assert r2 == rate and out.shape[1] == 2
    # is_pos 6 everywhere = hard left: right channel silent
    assert np.abs(out[:, 0]).max() > 50
    assert np.abs(out[:, 1]).max() == 0
