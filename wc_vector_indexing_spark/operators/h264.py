"""H.264/AVC (ISO 14496-10) stream triage WITHOUT decoding: Annex B
NAL-unit walk + SPS parse — resolution, profile/level and slice counts
for the dominant crawl video codec. Macroblock decode stays behind the
``decode_video`` seam (operators/video.py): real ingest pipelines cost
video from its parameter sets before deciding to transcode, exactly the
operators/mp3.py / operators/aac.py posture for audio.

Everything here is the public bitstream grammar: 3/4-byte start codes,
emulation-prevention-byte removal (00 00 03 → 00 00), Exp-Golomb
ue(v)/se(v), and the seq_parameter_set_rbsp() syntax incl. the
high-profile chroma/bit-depth/scaling-list branch and the frame
cropping arithmetic (CropUnit scaling by chroma format).

Spark shape: per-blob walks, embarrassingly parallel, zero shuffle.

Reference note: the reference engine has no video path (SURVEY §1.1);
north-star training-pipeline surface, public spec only.
"""

from __future__ import annotations

from wc_vector_indexing_spark.operators.contract import quarantine

NAL_NAMES = {
    1: "slice", 5: "idr_slice", 6: "sei", 7: "sps", 8: "pps", 9: "aud",
}
_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # in bits

    def u(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("H.264: truncated SPS")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("H.264: malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _strip_emulation(data: bytes) -> bytes:
    return data.replace(b"\x00\x00\x03", b"\x00\x00")


def _scaling_list(r: _BitReader, size: int) -> None:
    """scaling_list() — values are irrelevant for triage but the bits
    must be consumed to stay in sync."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        last = nxt if nxt != 0 else last


def parse_sps(rbsp: bytes) -> dict:
    """seq_parameter_set_rbsp() → profile_idc, level_idc, width, height
    (crop-adjusted display pixels). ``rbsp`` excludes the NAL header
    byte and emulation-prevention bytes."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    separate_colour = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):
                    _scaling_list(r, 16 if i < 6 else 64)
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    pw = r.ue()  # pic_width_in_mbs_minus1
    ph = r.ue()  # pic_height_in_map_units_minus1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    chroma_array = 0 if separate_colour else chroma_format_idc
    if chroma_array in (0, 3):
        cux, cuy = 1, 2 - frame_mbs_only
    else:
        sub_w = 2
        sub_h = 2 if chroma_array == 1 else 1
        cux, cuy = sub_w, sub_h * (2 - frame_mbs_only)
    width = (pw + 1) * 16 - cux * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * (ph + 1) * 16 - cuy * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
    }


@quarantine("h264 annexb")
def parse_annexb(data: bytes) -> dict:
    """Annex B byte-stream walk: n_nals, per-type counts, and the first
    SPS's profile/level/resolution. Raises ValueError when no start
    code or no SPS exists (a stream we cannot triage)."""
    starts = []
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j == -1:
            break
        starts.append(j + 3)
        i = j + 3
    if not starts:
        raise ValueError("H.264: no Annex B start code found")
    sps = None
    n_slices = 0
    n_nals = 0
    for k, s in enumerate(starts):
        end = starts[k + 1] - 3 if k + 1 < len(starts) else len(data)
        nal = data[s:end]
        # a 4-byte start code leaves its leading 00 on the previous slice
        if nal[-1:] == b"\x00" and k + 1 < len(starts):
            nal = nal[:-1]
        if not nal:
            continue
        if nal[0] & 0x80:
            raise ValueError("H.264: forbidden_zero_bit set")
        ntype = nal[0] & 0x1F
        n_nals += 1
        if ntype in (1, 5):
            n_slices += 1
        if ntype == 7 and sps is None:
            sps = parse_sps(_strip_emulation(nal[1:]))
    if sps is None:
        raise ValueError("H.264: no SPS in stream")
    return {"n_nals": n_nals, "n_slices": n_slices, **sps}


# ---------------------------------------------------------------- writer
class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        zeros = (v + 1).bit_length() - 1
        self.u(0, zeros) if zeros else None
        self.u(v + 1, zeros + 1)

    def rbsp(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _add_emulation(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def to_annexb_bytes(
    width_mbs: int,
    height_mbs: int,
    n_slices: int,
    profile_idc: int = 66,
    level_idc: int = 30,
    crop_right: int = 0,
    crop_bottom: int = 0,
    slice_payload: int = 32,
) -> bytes:
    """Fixture/export half: a structurally valid Annex B stream — real
    SPS (Exp-Golomb encoded, emulation-protected, frame_mbs_only=1,
    4:2:0) + minimal PPS + ``n_slices`` IDR/non-IDR slice stubs with
    deterministic non-zero filler payloads (never emulate start codes).
    parse_annexb(to_annexb_bytes(...)) recovers every parameter."""
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags
    w.u(level_idc, 8)
    w.ue(0)  # sps_id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)
        w.u(0, 1)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type 0
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(0, 1)  # direct_8x8
    if crop_right or crop_bottom:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_right)
        w.ue(0)
        w.ue(crop_bottom)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui absent
    sps_nal = b"\x67" + _add_emulation(w.rbsp())  # ref_idc 3, type 7

    pw = _BitWriter()
    pw.ue(0)  # pps_id
    pw.ue(0)  # sps_id
    pw.u(0, 2)  # entropy flag + bottom_field_pic_order
    pw.ue(0)  # num_slice_groups_minus1
    pps_nal = b"\x68" + _add_emulation(pw.rbsp())

    out = bytearray(b"\x00\x00\x00\x01" + sps_nal + b"\x00\x00\x00\x01" + pps_nal)
    for k in range(n_slices):
        ntype = 5 if k == 0 else 1
        hdr = bytes([(3 << 5) | ntype])
        body = bytes(1 + ((k + j) % 250) for j in range(slice_payload))
        out += b"\x00\x00\x01" + hdr + body
    return bytes(out)
