"""Arithmetic-coded JPEG (T.81 §F sequential DCT with arithmetic
entropy coding, SOF9 + progressive SOF10): the QM-coder (Annex D state machine, Table D.3
probability estimates) plus the DC/AC statistical models (§F.1.4
encode, §F.2.4 decode — conditioning contexts, magnitude-category
trees, Kx low/high AC split), decoding SOF9 scans into the same
zigzag-coefficient grids the Huffman path feeds to jpeg._finish.

Register bookkeeping is the clean bit-window formulation (16-bit
sliding decode window C, interval register A, one bit per
renormalization) rather than the spec's byte/CT register gymnastics —
stream-equivalent under the conventions implemented here: MPS takes
the lower subinterval, LPS the upper (conditional exchange when the
MPS region shrinks below Qe), 0xFF data bytes are followed by a
stuffed 0x00, and 0xFF + nonzero terminates the scan (decoder then
feeds zero bits). The encoder keeps its code register as an unbounded
Python int, so carry propagation is exact by construction (no FF
stacking needed) and serialization applies the byte stuffing at the
end.

Verification posture: encoder and decoder are pinned as mutual
inverses over randomized images, stuffing/marker paths, and all
magnitude categories (tests/test_jpeg_arith.py); no external
arithmetic codec exists in this container, so real-file interop is
unvalidated — treat foreign SOF9 streams as best-effort and rely on
the decode-quarantine contract.

Reference note: the reference engine decodes no images (SURVEY §1.1);
north-star training-pipeline surface, public spec only. Progressive
arithmetic (SOF10, T.81 §G.2) decodes here too — per-scan statistics
reset, interleaved DC first/refine, per-band AC first and
successive-approximation refinement; hierarchical/lossless stay
behind the jpeg.py seam.
"""

from __future__ import annotations

import numpy as np

# T.81 Table D.3: (Qe, NLPS, NMPS, SWITCH) for the 113 estimator
# states (NMPS walks the ladder sequentially toward smaller Qe, NLPS
# jumps back up); row 113 is the non-adapting ~0.5 state used for AC
# signs (its next-state pointers loop onto itself).
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

_FIXED = 113  # non-adapting sign bin


def _new_stats(n: int) -> list[list[int]]:
    return [[0, 0] for _ in range(n)]


# ------------------------------------------------------------------ coder
class _QMDecoder:
    """QM decoder over a JPEG entropy segment: 16-bit sliding window C,
    interval A, one stuffed-byte-aware bit per renormalization."""

    __slots__ = ("data", "bp", "bitpos", "c", "a", "ended", "_cur")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.bp = pos
        self.bitpos = 8  # bits already taken from _cur; 8 = none left
        self._cur = 0
        self.ended = False
        self.c = 0
        for _ in range(16):
            self.c = (self.c << 1) | self._bit()
        self.a = 0x10000

    def _bit(self) -> int:
        if self.bitpos == 8:
            if self.ended or self.bp >= len(self.data):
                self.ended = True
                return 0  # past the marker: feed zero bits
            b = self.data[self.bp]
            if b == 0xFF:
                nxt = self.data[self.bp + 1] if self.bp + 1 < len(self.data) else 0xD9
                if nxt != 0x00:
                    self.ended = True  # marker terminates the segment
                    return 0
                self.bp += 2  # consume FF + stuffed 00; FF carries the bits
            else:
                self.bp += 1
            self.bitpos = 0
            self._cur = b
        self.bitpos += 1
        return (self._cur >> (8 - self.bitpos)) & 1

    def decode(self, stats: list[list[int]], idx: int) -> int:
        s = stats[idx]
        qe, nlps, nmps, switch = _QE[s[0]]
        self.a -= qe
        if self.c < self.a:
            if self.a & 0x8000:
                return s[1]  # fast MPS path, no renorm
            # conditional exchange on the MPS path
            if self.a < qe:
                d = 1 - s[1]
                if switch:
                    s[1] ^= 1
                s[0] = nlps
            else:
                d = s[1]
                s[0] = nmps
        else:
            # LPS (upper) region
            self.c -= self.a
            if self.a < qe:
                d = s[1]  # conditional exchange
                s[0] = nmps
            else:
                d = 1 - s[1]
                if switch:
                    s[1] ^= 1
                s[0] = nlps
            self.a = qe
        while self.a < 0x8000:
            self.a <<= 1
            self.c = (self.c << 1) | self._bit()
        return d


class _QMEncoder:
    """QM encoder with an unbounded code register: carries resolve by
    plain integer addition; serialization applies FF00 byte stuffing."""

    __slots__ = ("a", "c", "nbits")

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.nbits = 0

    def code(self, stats: list[list[int]], idx: int, d: int) -> None:
        s = stats[idx]
        qe, nlps, nmps, switch = _QE[s[0]]
        self.a -= qe
        if d == s[1]:  # MPS
            if self.a & 0x8000:
                return
            if self.a < qe:  # conditional exchange: MPS codes the top
                self.c += self.a
                self.a = qe
            s[0] = nmps
        else:  # LPS
            if self.a >= qe:  # normal: LPS codes the top region
                self.c += self.a
                self.a = qe
            # else exchanged: LPS keeps the (smaller) lower region
            if switch:
                s[1] ^= 1
            s[0] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.nbits += 1

    def finish(self) -> bytes:
        # code point in [C, C+A) with the most trailing zeros (D.1.8)
        t = (self.c + self.a - 1) & ~0xFFFF
        if t < self.c:
            t += 0x8000
        total = self.nbits + 16
        out = bytearray()
        acc = n = 0
        for i in range(total - 1, -1, -1):
            acc = (acc << 1) | ((t >> i) & 1)
            n += 1
            if n == 8:
                out.append(acc)
                if acc == 0xFF:
                    out.append(0x00)  # byte stuffing
                acc = n = 0
        if n:
            out.append(acc << (8 - n))  # zero-pad: decoder feeds zeros
        if out and out[-1] == 0xFF:
            out.append(0x00)
        return bytes(out)


# ------------------------------------------------- DC / AC statistical models
def _classify(m: int, sign: int, low: int, up: int) -> int:
    """§F.1.4.4.1.2 conditioning category from the magnitude class m
    of the previous DC difference (bounds from the L/U parameters)."""
    if m < (1 << low) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 12 + sign * 4
    return 4 + sign * 4


def _decode_dc(dec, stats, ctx, low, up):
    """Figure F.19-F.24: one DC difference. → (diff, new_context)."""
    if dec.decode(stats, ctx) == 0:
        return 0, 0
    sign = dec.decode(stats, ctx + 1)
    m = dec.decode(stats, ctx + 2 + sign)
    st = ctx + 2 + sign
    if m:
        st = 20  # X1
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG: DC magnitude overflow")
            st += 1
    new_ctx = _classify(m, sign, low, up)
    v = m
    st += 14  # magnitude-bit bin for this class
    mm = m
    while mm > 1:
        mm >>= 1
        if dec.decode(stats, st):
            v |= mm
    v += 1
    return (-v if sign else v), new_ctx


def _encode_dc(enc, stats, ctx, diff, low, up):
    if diff == 0:
        enc.code(stats, ctx, 0)
        return 0
    enc.code(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.code(stats, ctx + 1, sign)
    v = -diff if sign else diff
    st = ctx + 2 + sign
    v -= 1
    m = 0
    if v:
        enc.code(stats, st, 1)
        m = 1
        st = 20
        v2 = v
        while v2 > 1:
            enc.code(stats, st, 1)
            m <<= 1
            st += 1
            v2 >>= 1
    enc.code(stats, st, 0)
    new_ctx = _classify(m, sign, low, up)
    st += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.code(stats, st, 1 if v & mm else 0)
    return new_ctx


def _decode_ac_block(dec, stats, fixed, zz, kx, ss=1, se=63, shift=0):
    """Figure F.20/F.21-style AC decode into zz[ss..se] (zigzag);
    progressive AC-first scans pass their band and the successive-
    approximation shift (values land as v << shift)."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            k += 1
            st += 3
            if k > se:
                raise ValueError("arithmetic JPEG: AC run past block end")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic JPEG: AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            if dec.decode(stats, st):
                v |= mm
        v += 1
        zz[k] = (-v if sign else v) << shift
        k += 1


def _tz(v: int, shift: int) -> int:
    """Truncate-toward-zero shift (T.81 G.1.3.1 AC point transform)."""
    v = int(v)
    return -((-v) >> shift) if v < 0 else v >> shift


def _encode_ac_block(enc, stats, fixed, zz, kx, ss=1, se=63, shift=0):
    ke = 0
    for k in range(se, ss - 1, -1):
        if _tz(zz[k], shift):
            ke = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.code(stats, st, 0)  # not EOB
        while _tz(zz[k], shift) == 0:
            enc.code(stats, st + 1, 0)
            k += 1
            st += 3
        enc.code(stats, st + 1, 1)
        v = _tz(zz[k], shift)
        sign = 1 if v < 0 else 0
        enc.code(fixed, 0, sign)
        if sign:
            v = -v
        st += 2
        v -= 1
        m = 0
        if v:
            enc.code(stats, st, 1)
            m = 1
            if v > 1:
                enc.code(stats, st, 1)
                m = 2
                st = 189 if k <= kx else 217
                v2 = v >> 1
                while v2 > 1:
                    enc.code(stats, st, 1)
                    m <<= 1
                    st += 1
                    v2 >>= 1
        enc.code(stats, st, 0)
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.code(stats, st, 1 if v & mm else 0)
        k += 1
    if ke < se:
        enc.code(stats, 3 * (k - 1), 1)  # EOB


def _decode_ac_refine_block(dec, stats, fixed, zz, ss, se, al):
    """T.81 G.2 successive-approximation AC refinement (Figure G.10's
    decode mirror): previously-nonzero coefficients take a correction
    bit (st+2), zero-history positions either stay zero (st+1 = 0) or
    turn newly nonzero (±1 << al, sign via the fixed bin); the EOB
    decision only exists past kex, the last previously-nonzero index."""
    kex = 0
    for k in range(se, 0, -1):
        if zz[k]:
            kex = k
            break
    p1, m1 = 1 << al, -1 << al
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats, st):
            return  # EOB
        while True:
            if zz[k]:
                if dec.decode(stats, st + 2):
                    zz[k] += m1 if zz[k] < 0 else p1
                break
            if dec.decode(stats, st + 1):
                zz[k] = m1 if dec.decode(fixed, 0) else p1
                break
            k += 1
            st += 3
            if k > se:
                raise ValueError("arithmetic JPEG: AC refine past band end")
        k += 1


def _encode_ac_refine_block(enc, stats, fixed, zz, ss, se, ah, al):
    """Encoder mirror: ke = last nonzero at Al precision, kex = last at
    Ah precision (previously coded ⟺ |tz(v, al)| > 1 when ah = al+1)."""
    ke = 0
    for k in range(se, ss - 1, -1):
        if _tz(zz[k], al):
            ke = k
            break
    kex = 0
    for k in range(se, 0, -1):
        if _tz(zz[k], ah):
            kex = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.code(stats, st, 0)  # not EOB yet
        while True:
            t = _tz(zz[k], al)
            if t:
                if _tz(zz[k], ah):  # previously coded: correction bit
                    enc.code(stats, st + 2, abs(t) & 1)
                else:  # newly nonzero at this precision
                    enc.code(stats, st + 1, 1)
                    enc.code(fixed, 0, 1 if t < 0 else 0)
                break
            enc.code(stats, st + 1, 0)
            k += 1
            st += 3
        k += 1
    if ke < se:
        enc.code(stats, 3 * (k - 1), 1)  # EOB


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Next real marker at/after pos (FF followed by neither 00 nor
    FF); raises the quarantine ValueError when none exists."""
    pos = max(pos, 0)
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise ValueError("truncated JPEG: no marker after arithmetic scan")


def progressive_scan_arith(data, pos, frame, scan, grids, ss, se, ah, al,
                           dc_cond, ac_cond, restart_interval):
    """Apply one SOF10 progressive SOS to the coefficient grids;
    returns the byte offset of the next marker. Statistics and the QM
    decoder reset per scan (T.81 G.2). Interleaved scans are DC-only
    in MCU order; single-component scans walk the component raster."""
    if restart_interval:
        raise NotImplementedError(
            "restart markers inside arithmetic scans are not implemented"
        )
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    scan_cis = [ci for ci, c in enumerate(comps) if c["id"] in scan]
    dec = _QMDecoder(data, pos)
    fixed = [[_FIXED, 0]]
    if ss == 0:  # DC scan (first or refine), possibly interleaved
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        dc_stats: dict[int, list] = {}
        pred = {ci: 0 for ci in scan_cis}
        dc_ctx = {ci: 0 for ci in scan_cis}
        mcus_x = -(-frame["w"] // (8 * hmax))
        mcus_y = -(-frame["h"] // (8 * vmax))

        def dc_blocks(ci):
            c = comps[ci]
            if len(scan_cis) > 1:
                return None  # interleaved path below
            bw_n = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
            bh_n = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
            return [(by, bx) for by in range(bh_n) for bx in range(bw_n)]

        def dc_op(ci, blk):
            if ah == 0:
                dtbl = scan[comps[ci]["id"]][0]
                stats = dc_stats.setdefault(dtbl, _new_stats(64))
                low, up = dc_cond.get(dtbl, (0, 1))
                diff, dc_ctx[ci] = _decode_dc(dec, stats, dc_ctx[ci], low, up)
                pred[ci] += diff
                blk[0] = pred[ci] << al
            elif dec.decode(fixed, 0):
                blk[0] = int(blk[0]) | (1 << al)

        if len(scan_cis) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci in scan_cis:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_op(ci, grids[ci][my * c["v"] + by,
                                                    mx * c["h"] + bx])
        else:
            ci = scan_cis[0]
            for by, bx in dc_blocks(ci):
                dc_op(ci, grids[ci][by, bx])
    else:  # AC scan: single component only (T.81 G.1)
        if len(scan_cis) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci = scan_cis[0]
        c = comps[ci]
        atbl = scan[c["id"]][1]
        stats = _new_stats(256)
        kx = ac_cond.get(atbl, 5)
        bw_n = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
        bh_n = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
        for by in range(bh_n):
            for bx in range(bw_n):
                blk = grids[ci][by, bx]
                if ah == 0:
                    _decode_ac_block(dec, stats, fixed, blk, kx, ss, se, al)
                else:
                    _decode_ac_refine_block(dec, stats, fixed, blk, ss, se, al)
    return _skip_to_marker(data, dec.bp)


# ------------------------------------------------------------- scan decode
def decode_scan_arith(data, pos, frame, scan, qt, dc_cond, ac_cond,
                      restart_interval):
    """Sequential arithmetic scan (SOF9): entropy-decode every MCU's
    blocks into per-component zigzag grids, then reuse the shared
    jpeg._finish reconstruction tail."""
    from wc_vector_indexing_spark.operators.jpeg import _finish

    if restart_interval:
        raise NotImplementedError(
            "restart markers inside arithmetic scans are not implemented "
            "— re-encode without DRI or plug a real codec at "
            "multimodal.decode_image"
        )
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    dec = _QMDecoder(data, pos)
    dc_stats: dict[int, list] = {}
    ac_stats: dict[int, list] = {}
    fixed = [[_FIXED, 0]]
    grids = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in comps
    ]
    pred = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                dtbl, atbl = scan[c["id"]]
                dstats = dc_stats.setdefault(dtbl, _new_stats(64))
                astats = ac_stats.setdefault(atbl, _new_stats(256))
                low, up = dc_cond.get(dtbl, (0, 1))
                kx = ac_cond.get(atbl, 5)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = grids[ci][my * c["v"] + by, mx * c["h"] + bx]
                        diff, dc_ctx[ci] = _decode_dc(
                            dec, dstats, dc_ctx[ci], low, up
                        )
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        _decode_ac_block(dec, astats, fixed, zz, kx)
    return _finish(frame, grids, qt)


def encode_progressive_arith(
    img: np.ndarray, subsampling: str = "4:4:4"
) -> bytes:
    """Fixture/export half: SOF10 progressive arithmetic JPEG with the
    same scan script as the Huffman progressive encoder — interleaved
    DC first (Al=1) + DC refine, then per component per spectral band
    an AC first (Al=1) and an AC refine scan. Al=1 → 0 reconstructs
    every coefficient exactly, so the stream is golden-tested as
    bit-identical to the baseline decode. Statistics and the QM
    encoder reset per scan (T.81 G.2)."""
    from wc_vector_indexing_spark.operators.jpeg import (
        _prep_components,
        _seg,
    )

    h, w = img.shape[:2]
    comps, mcus_x, mcus_y = _prep_components(img, subsampling)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xCA, sof)
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 0x05]))

    def sos_header(scomps, ss, se, ah, al):
        sos = bytes([len(scomps)])
        for cid in scomps:
            sos += bytes([cid, 0x00])
        return _seg(0xDA, sos + bytes([ss, se, (ah << 4) | al]))

    def comp_blocks(c):
        for by in range(mcus_y * c["v"]):
            for bx in range(mcus_x * c["h"]):
                yield c["blocks"][by, bx]

    # --- DC first (interleaved, Al=1)
    out += sos_header([c["id"] for c in comps], 0, 0, 0, 1)
    enc = _QMEncoder()
    dstats = _new_stats(64)
    pred = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(c["blocks"][my * c["v"] + by,
                                             mx * c["h"] + bx][0]) >> 1
                        dc_ctx[ci] = _encode_dc(
                            enc, dstats, dc_ctx[ci], dc - pred[ci], 0, 1
                        )
                        pred[ci] = dc
    out += enc.finish()

    # --- DC refine (interleaved, Ah=1 -> Al=0)
    out += sos_header([c["id"] for c in comps], 0, 0, 1, 0)
    enc = _QMEncoder()
    fixed = [[_FIXED, 0]]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bit = int(c["blocks"][my * c["v"] + by,
                                              mx * c["h"] + bx][0]) & 1
                        enc.code(fixed, 0, bit)
    out += enc.finish()

    bands = [(1, 5), (6, 63)]
    # --- AC first scans (Al=1)
    for c in comps:
        for ss, se in bands:
            out += sos_header([c["id"]], ss, se, 0, 1)
            enc = _QMEncoder()
            astats = _new_stats(256)
            fixed = [[_FIXED, 0]]
            for blk in comp_blocks(c):
                _encode_ac_block(enc, astats, fixed, blk, 5, ss, se, 1)
            out += enc.finish()
    # --- AC refine scans (Ah=1 -> Al=0)
    for c in comps:
        for ss, se in bands:
            out += sos_header([c["id"]], ss, se, 1, 0)
            enc = _QMEncoder()
            astats = _new_stats(256)
            fixed = [[_FIXED, 0]]
            for blk in comp_blocks(c):
                _encode_ac_refine_block(enc, astats, fixed, blk, ss, se, 1, 0)
            out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- encoder half
def encode_arith(img: np.ndarray, subsampling: str = "4:4:4") -> bytes:
    """Fixture/export half: a complete SOF9 arithmetic-coded JPEG
    (unit quant tables, explicit DAC with the default conditioning
    L=0/U=1/Kx=5) sharing the DCT front half with encode_baseline."""
    from wc_vector_indexing_spark.operators.jpeg import (
        _prep_components,
        _seg,
    )

    h, w = img.shape[:2]
    comps, mcus_x, mcus_y = _prep_components(img, subsampling)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC9, sof)
    # DAC: DC table 0 with (U<<4)|L, AC table 0 with Kx
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 0x05]))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    enc = _QMEncoder()
    dstats = _new_stats(64)
    astats = _new_stats(256)
    fixed = [[_FIXED, 0]]
    pred = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["blocks"][my * c["v"] + by, mx * c["h"] + bx]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        dc_ctx[ci] = _encode_dc(
                            enc, dstats, dc_ctx[ci], diff, 0, 1
                        )
                        _encode_ac_block(enc, astats, fixed, zz, 5)
    out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)
