"""Golden-pixel tests for the pure-numpy baseline JPEG decoder
(operators/jpeg.py). Fixtures come from a minimal in-test baseline
ENCODER (also straight from ITU-T T.81: FDCT + zigzag + canonical
Huffman + byte stuffing), so the decoder is checked as a true inverse —
near-lossless roundtrips with unit quantization tables, grayscale and
YCbCr 4:4:4 / 4:2:0, restart markers, and the documented
NotImplementedError seam for progressive files."""

from __future__ import annotations

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.jpeg import _C, _ZIGZAG, decode_jpeg



# --------------------------------------------------------------------------
# minimal baseline encoder (test fixture generator)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per F.2.2.5


def _cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _amp(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    out = np.zeros((h // 8, w // 8, 64), dtype=np.int32)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64) - 128.0
            coeffs = _C @ blk @ _C.T
            out[by, bx] = np.round(coeffs.reshape(64))[_ZIGZAG]
    return out


def _block_symbols(zz: np.ndarray, pred: int):
    """(dc_sym, dc_bits), [(ac_sym, ac_bits), ...], new_pred."""
    diff = int(zz[0]) - pred
    t = _cat(diff)
    dc = (t, (_amp(diff, t), t))
    acs = []
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            acs.append((0x00, (0, 0)))  # EOB
            break
        if v == 0:
            run += 1
            if run == 16:
                acs.append((0xF0, (0, 0)))  # ZRL
                run = 0
            continue
        s = _cat(v)
        acs.append(((run << 4) | s, (_amp(v, s), s)))
        run = 0
    else:
        if last_nz < 63 and last_nz > 0:
            acs.append((0x00, (0, 0)))
    return dc, acs, int(zz[0])


def _build_table(symbols: set[int]):
    """Canonical fixed-length table for the symbols a fixture uses;
    length chosen so the all-ones code is never assigned."""
    syms = sorted(symbols)
    length = max(2, (len(syms) + 1).bit_length())
    counts = [0] * 16
    counts[length - 1] = len(syms)
    codes = {s: (length, i) for i, s in enumerate(syms)}
    return counts, bytes(syms), codes


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_baseline(
    img: np.ndarray, subsampling: str = "4:4:4", restart_interval: int = 0
) -> bytes:
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("test encoder requires multiple-of-8 dimensions")
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "plane": img.astype(np.float64)}]
    else:
        r, g, b = (img[..., c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            sub = lambda p: p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            comps = [
                {"id": 1, "h": 2, "v": 2, "plane": y},
                {"id": 2, "h": 1, "v": 1, "plane": sub(cb)},
                {"id": 3, "h": 1, "v": 1, "plane": sub(cr)},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "plane": y},
                {"id": 2, "h": 1, "v": 1, "plane": cb},
                {"id": 3, "h": 1, "v": 1, "plane": cr},
            ]
    for c in comps:
        c["blocks"] = _fdct_blocks(np.round(c["plane"]))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = w // (8 * hmax)
    mcus_y = h // (8 * vmax)

    # pass 1: walk MCU order collecting symbols, then build tables
    def mcu_walk():
        pred = [0] * len(comps)
        idx = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                restart = bool(
                    restart_interval and idx and idx % restart_interval == 0
                )
                if restart:
                    pred = [0] * len(comps)
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = c["blocks"][my * c["v"] + by, mx * c["h"] + bx]
                            dc, acs, pred[ci] = _block_symbols(zz, pred[ci])
                            yield idx, restart and (ci, by, bx) == (0, 0, 0), ci, dc, acs
                idx += 1

    dc_syms, ac_syms = set(), set()
    for _, _, _, dc, acs in mcu_walk():
        dc_syms.add(dc[0])
        ac_syms.update(s for s, _ in acs)
    dc_counts, dc_symbols, dc_codes = _build_table(dc_syms)
    ac_counts, ac_symbols, ac_codes = _build_table(ac_syms)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # unit quant, id 0
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_symbols)
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_symbols)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    rst = 0
    for _, is_restart, _, dc, acs in mcu_walk():
        if is_restart:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
        ln, code = dc_codes[dc[0]]
        bw.put(code, ln)
        bw.put(dc[1][0], dc[1][1])
        for sym, (val, nb) in acs:
            ln, code = ac_codes[sym]
            bw.put(code, ln)
            if nb:
                bw.put(val, nb)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 7 + xx * 11) % 256).astype(np.uint8)


def test_grayscale_roundtrip_near_lossless():
    img = _gradient(24, 32)
    got = decode_jpeg(encode_baseline(img))
    assert got.shape == (24, 32)
    assert got.dtype == np.uint8
    # unit quant tables: the only loss is FDCT/IDCT float rounding
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_color_444_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    got = decode_jpeg(encode_baseline(img, "4:4:4"))
    assert got.shape == (16, 16, 3)
    # color roundtrip adds YCbCr forward/backward rounding
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3


def test_color_420_subsampling():
    """Chroma constant within each 2x2 block ⇒ 4:2:0 subsampling is
    information-lossless and the decoder's replication upsample must
    reconstruct the colors; per-pixel luma detail must survive."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8] = [200, 40, 40]
    img[8:] = [40, 40, 200]
    # texture constant within every 2x2 block, so chroma truly is
    # constant per subsampling cell (no information destroyed)
    yy, xx = np.mgrid[0:16, 0:16]
    img[:, :, 1] = (((yy // 2) * 7 + (xx // 2) * 11) % 64 + 30).astype(np.uint8)
    got = decode_jpeg(encode_baseline(img, "4:2:0"))
    assert got.shape == (16, 16, 3)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 4


def test_restart_markers():
    img = _gradient(16, 40)  # 2x5 MCUs
    data = encode_baseline(img, restart_interval=2)
    assert any(
        data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
        for i in range(2, len(data) - 3)
    )
    got = decode_jpeg(data)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_byte_stuffing_roundtrip():
    """An image driving the entropy coder through 0xFF output bytes
    still decodes (stuffed 0xFF00 must be transparent)."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    data = encode_baseline(img)
    got = decode_jpeg(data)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_progressive_raises_at_seam():
    # SOI + SOF2 header: the documented external-codec seam
    data = b"\xff\xd8" + bytes([0xFF, 0xC2, 0x00, 0x0B, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="baseline sequential"):
        decode_jpeg(data)


def test_decode_image_dispatches_jpeg():
    from wc_vector_indexing_spark.operators.multimodal import decode_image

    img = _gradient(8, 8)
    got = decode_image(encode_baseline(img))
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")
