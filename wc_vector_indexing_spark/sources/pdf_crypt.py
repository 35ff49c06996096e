"""PDF standard security handler (ISO 32000-1 §7.6, 32000-2 §7.6.4):
pure-stdlib decryption for the /Encrypt seam in sources/pdf.py.

Scope — the overwhelmingly common "readable without a password" case:
files encrypted with an EMPTY user password (owner-locked PDFs that any
viewer opens silently). Covered revisions:

- R2/R3/R4  — RC4 40-128 bit and AES-128 (/CFM /V2, /AESV2): the MD5
  key-derivation chain (Algorithm 2), per-object keys (Algorithm 1),
  user-password validation (Algorithms 4/5).
- R6        — AES-256 (/CFM /AESV3): the SHA-256/384/512 iterated hash
  (Algorithm 2.B), file key unwrapped from /UE.

A NON-empty user password (validation fails) raises NotImplementedError
— that file genuinely cannot be read without credentials, and silently
emitting garbage would be worse. Ciphers are implemented here from the
public specs (RC4 from its well-known schedule; AES from FIPS-197) —
both self-tested against published known-answer vectors in
tests/test_pdf_crypt.py.

Reference note: the reference engine never parses PDFs (SURVEY §1.1) —
this is north-star crawl-corpus surface, public specs only.
"""

from __future__ import annotations

import hashlib
import re
import struct
from dataclasses import dataclass

# ISO 32000-1 Table 21 standard padding string (Algorithm 2 step a)
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


# --------------------------------------------------------------------- RC4
def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (symmetric — same call encrypts and decrypts)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------- AES
# FIPS-197 tables, generated at import from the GF(2^8) arithmetic the
# spec defines (no magic constant blobs to transcribe wrong).
def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse via exponentiation tables
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    exp[255] = exp[0]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = [0] * 256
    for i in range(256):
        q = inv(i)
        f = q
        for _ in range(4):
            f = ((f << 1) | (f >> 7)) & 0xFF
            q ^= f
        sbox[i] = q ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))

# 32-bit T-tables for the encrypt hot path (Algorithm 2.B runs tens of
# thousands of block encryptions per password hash — the byte-wise
# reference rounds are ~8× slower). Te0[x] packs S[x]·(2,1,1,3).
_TE0 = [
    (_gmul(_SBOX[x], 2) << 24)
    | (_SBOX[x] << 16)
    | (_SBOX[x] << 8)
    | _gmul(_SBOX[x], 3)
    for x in range(256)
]
_TE1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE0]
_TE2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE1]
_TE3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE2]


class AES:
    """FIPS-197 block cipher, 128/192/256-bit keys, byte-list state."""

    def __init__(self, key: bytes) -> None:
        nk = len(key) // 4
        if nk not in (4, 6, 8):
            raise ValueError("AES key must be 16/24/32 bytes")
        self.nr = nk + 6
        w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.nr + 1)):
            t = list(w[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            w.append([w[i - nk][k] ^ t[k] for k in range(4)])
        self.round_keys = [sum(w[4 * r : 4 * r + 4], []) for r in range(self.nr + 1)]
        self._rkw = [
            (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3] for c in w
        ]

    # state is a flat 16-list in COLUMN-major order (FIPS-197 s[r][c] =
    # state[r + 4c]) — matching the byte order blocks arrive in.
    def _add_round_key(self, s: list[int], r: int) -> None:
        rk = self.round_keys[r]
        for i in range(16):
            s[i] ^= rk[i]

    @staticmethod
    def _shift_rows(s: list[int], inv: bool) -> list[int]:
        out = [0] * 16
        for c in range(4):
            for r in range(4):
                src_c = (c + r) % 4 if not inv else (c - r) % 4
                out[r + 4 * c] = s[r + 4 * src_c]
        return out

    @staticmethod
    def _mix_columns(s: list[int], inv: bool) -> list[int]:
        m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
        out = [0] * 16
        for c in range(4):
            col = s[4 * c : 4 * c + 4]
            for r in range(4):
                out[r + 4 * c] = (
                    _gmul(col[0], m[(0 - r) % 4])
                    ^ _gmul(col[1], m[(1 - r) % 4])
                    ^ _gmul(col[2], m[(2 - r) % 4])
                    ^ _gmul(col[3], m[(3 - r) % 4])
                )
        return out

    def encrypt_block(self, block: bytes) -> bytes:
        rkw = self._rkw
        s0, s1, s2, s3 = struct.unpack(">4I", block)
        s0 ^= rkw[0]
        s1 ^= rkw[1]
        s2 ^= rkw[2]
        s3 ^= rkw[3]
        for r in range(1, self.nr):
            k = 4 * r
            t0 = (_TE0[s0 >> 24] ^ _TE1[(s1 >> 16) & 0xFF]
                  ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ rkw[k])
            t1 = (_TE0[s1 >> 24] ^ _TE1[(s2 >> 16) & 0xFF]
                  ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ rkw[k + 1])
            t2 = (_TE0[s2 >> 24] ^ _TE1[(s3 >> 16) & 0xFF]
                  ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ rkw[k + 2])
            t3 = (_TE0[s3 >> 24] ^ _TE1[(s0 >> 16) & 0xFF]
                  ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ rkw[k + 3])
            s0, s1, s2, s3 = t0, t1, t2, t3
        k = 4 * self.nr
        o0 = ((_SBOX[s0 >> 24] << 24) | (_SBOX[(s1 >> 16) & 0xFF] << 16)
              | (_SBOX[(s2 >> 8) & 0xFF] << 8) | _SBOX[s3 & 0xFF]) ^ rkw[k]
        o1 = ((_SBOX[s1 >> 24] << 24) | (_SBOX[(s2 >> 16) & 0xFF] << 16)
              | (_SBOX[(s3 >> 8) & 0xFF] << 8) | _SBOX[s0 & 0xFF]) ^ rkw[k + 1]
        o2 = ((_SBOX[s2 >> 24] << 24) | (_SBOX[(s3 >> 16) & 0xFF] << 16)
              | (_SBOX[(s0 >> 8) & 0xFF] << 8) | _SBOX[s1 & 0xFF]) ^ rkw[k + 2]
        o3 = ((_SBOX[s3 >> 24] << 24) | (_SBOX[(s0 >> 16) & 0xFF] << 16)
              | (_SBOX[(s1 >> 8) & 0xFF] << 8) | _SBOX[s2 & 0xFF]) ^ rkw[k + 3]
        return struct.pack(">4I", o0, o1, o2, o3)

    def decrypt_block(self, block: bytes) -> bytes:
        s = list(block)
        self._add_round_key(s, self.nr)
        for r in range(self.nr - 1, 0, -1):
            s = self._shift_rows(s, inv=True)
            s = [_INV_SBOX[b] for b in s]
            self._add_round_key(s, r)
            s = self._mix_columns(s, inv=True)
        s = self._shift_rows(s, inv=True)
        s = [_INV_SBOX[b] for b in s]
        self._add_round_key(s, 0)
        return bytes(s)


def aes_cbc_decrypt(key: bytes, iv_and_data: bytes, strip_pad: bool = True) -> bytes:
    """CBC with the IV prepended (the PDF stream layout, §7.6.3.3)."""
    if len(iv_and_data) < 16 or len(iv_and_data) % 16:
        raise ValueError("AES-CBC data must be a multiple of 16 bytes with IV")
    aes = AES(key)
    iv = iv_and_data[:16]
    out = bytearray()
    for off in range(16, len(iv_and_data), 16):
        block = iv_and_data[off : off + 16]
        out += bytes(a ^ b for a, b in zip(aes.decrypt_block(block), iv))
        iv = block
    if strip_pad and out:
        pad = out[-1]
        if 1 <= pad <= 16:
            out = out[:-pad]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """Forward CBC — used by Algorithm 2.B and the fixture encryptor.
    With ``pad`` the PKCS#7 tail is added and the IV is prepended (the
    PDF stream layout); without, data must already be block-aligned and
    the raw ciphertext is returned (the key-wrap / hash-2B shape)."""
    aes = AES(key)
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[off : off + 16], prev))
        prev = aes.encrypt_block(block)
        out += prev
    return (iv + bytes(out)) if pad else bytes(out)


# --------------------------------------------- key derivation (R2-R4, MD5)
def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def compute_key_r234(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    n_bytes: int,
    r: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the RC4/AES-128 file key."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n_bytes]).digest()
    return key[:n_bytes]


def user_password_ok_r234(key: bytes, u_entry: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4/5 (validation direction of 6)."""
    if r == 2:
        return rc4(key, _PAD) == u_entry[:32]
    h = hashlib.md5(_PAD + id0).digest()
    x = rc4(key, h)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x == u_entry[:16]


def object_key_r234(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object key (MD5 of key + obj/gen, +sAlT for AES)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


# ------------------------------------------------- key derivation (R6, SHA-2)
def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the iterated SHA-256/384/512 hash."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def compute_key_r6(password: bytes, u_entry: bytes, ue_entry: bytes) -> bytes | None:
    """Algorithm 2.A, user-password arm: validate against /U (48 bytes =
    hash + validation salt + key salt), then unwrap the file key from
    /UE. Returns None when the password does not validate."""
    if len(u_entry) < 48:
        return None
    vsalt, ksalt = u_entry[32:40], u_entry[40:48]
    if hash_2b(password, vsalt) != u_entry[:32]:
        return None
    ikey = hash_2b(password, ksalt)
    # AES-256-CBC, zero IV, no padding (§7.6.4.4.2)
    aes = AES(ikey)
    out = bytearray()
    prev = b"\x00" * 16
    for off in range(0, 32, 16):
        block = ue_entry[off : off + 16]
        out += bytes(a ^ b for a, b in zip(aes.decrypt_block(block), prev))
        prev = block
    return bytes(out)


# ------------------------------------------------------------ dict parsing
def _pdf_string(body: bytes, name: bytes) -> bytes | None:
    """Value of ``/name`` when it is a literal ``(...)`` (with escapes)
    or hex ``<...>`` string."""
    m = re.search(rb"/" + name + rb"\s*\(", body)
    if m:
        return _literal_bytes(body, m.end() - 1)
    m = re.search(rb"/" + name + rb"\s*<([0-9A-Fa-f\s]*)>", body)
    if m:
        hx = re.sub(rb"\s", b"", m.group(1))
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    return None


def _literal_bytes(body: bytes, open_paren: int) -> bytes:
    """Decode a ``(...)`` literal starting at ``open_paren`` — the same
    escape rules as the content-stream parser (ISO 32000 7.3.4.2)."""
    out = bytearray()
    depth = 0
    i = open_paren
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash
            nxt = body[i + 1]
            esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                   0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits 0-7
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                    oct_digits += bytes([body[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            if nxt in (0x0D, 0x0A):  # line continuation: drop \ and the EOL
                i += 2
                if nxt == 0x0D and i < len(body) and body[i] == 0x0A:
                    i += 1  # CRLF counts as one EOL
                continue
            out.append(nxt)
            i += 2
            continue
        if c == 0x28:
            depth += 1
            if depth > 1:
                out.append(c)
            i += 1
            continue
        if c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out)
            out.append(c)
            i += 1
            continue
        out.append(c)
        i += 1
    raise ValueError("unterminated PDF literal string")


def _pdf_int(body: bytes, name: bytes) -> int | None:
    m = re.search(rb"/" + name + rb"\s+(-?\d+)", body)
    return int(m.group(1)) if m else None


# ------------------------------------------------------------- decryptor
@dataclass
class Decryptor:
    """Bound file key + crypt-filter method; ``__call__`` decrypts one
    object's stream payload."""

    file_key: bytes
    cfm: str  # 'V2' (RC4) | 'AESV2' | 'AESV3' | 'Identity'

    def __call__(self, num: int, gen: int, data: bytes) -> bytes:
        if self.cfm == "Identity":
            return data
        if self.cfm == "AESV3":
            return aes_cbc_decrypt(self.file_key, data)
        ok = object_key_r234(self.file_key, num, gen, aes=self.cfm == "AESV2")
        if self.cfm == "AESV2":
            return aes_cbc_decrypt(ok, data)
        return rc4(ok, data)


def build_decryptor(enc_body: bytes, id0: bytes) -> Decryptor:
    """Parse a standard-security-handler /Encrypt dictionary and derive
    the file key for the EMPTY user password. Raises NotImplementedError
    for non-standard handlers, unsupported crypt filters, and files
    whose user password is not empty (genuinely unreadable here)."""
    filt = re.search(rb"/Filter\s*/(\w+)", enc_body)
    if not filt or filt.group(1) != b"Standard":
        raise NotImplementedError(
            "PDF encrypted with a non-standard security handler: "
            + (filt.group(1).decode("latin-1") if filt else "?")
        )
    v = _pdf_int(enc_body, b"V") or 0
    r = _pdf_int(enc_body, b"R") or 2
    o_entry = _pdf_string(enc_body, b"O") or b""
    u_entry = _pdf_string(enc_body, b"U") or b""
    p = _pdf_int(enc_body, b"P") or 0

    if r >= 5:
        ue = _pdf_string(enc_body, b"UE") or b""
        if r == 5:
            raise NotImplementedError(
                "PDF /Encrypt R5 (the withdrawn Adobe interim AES-256 "
                "scheme) — only the ISO 32000-2 R6 form is supported"
            )
        key = compute_key_r6(b"", u_entry, ue)
        if key is None:
            raise NotImplementedError(
                "password-protected PDF (empty user password rejected)"
            )
        return Decryptor(key, "AESV3")

    nbits = _pdf_int(enc_body, b"Length") or 40
    em = re.search(rb"/EncryptMetadata\s+false", enc_body) is None
    cfm = "V2"
    if v == 4:
        cm = re.search(rb"/CFM\s*/(\w+)", enc_body)
        cfm = cm.group(1).decode("ascii") if cm else "Identity"
        if cfm not in ("V2", "AESV2", "Identity"):
            raise NotImplementedError(f"PDF crypt filter /CFM /{cfm} unsupported")
    key = compute_key_r234(b"", o_entry, p, id0, nbits // 8, r, em)
    if not user_password_ok_r234(key, u_entry, id0, r):
        raise NotImplementedError(
            "password-protected PDF (empty user password rejected)"
        )
    return Decryptor(key, cfm)


# ----------------------------------------------- fixture encryptor (writer)
# Deterministic fixture parameters (the writer half needs SOME file id
# and permission flags; readers take whatever the file declares).
_ID0 = bytes(range(16))
_P = -44


def _o_entry(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3."""
    h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4key = h[:n]
    o = rc4(rc4key, (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4key), o)
    return o


def _u_entry(file_key: bytes, r: int) -> bytes:
    """Algorithms 4/5 (computation direction)."""
    if r == 2:
        return rc4(file_key, _PAD)
    x = hashlib.md5(_PAD + _ID0).digest()
    x = rc4(file_key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in file_key), x)
    return x + b"\x00" * 16


def _hex(b: bytes) -> bytes:
    return b"<" + b.hex().upper().encode() + b">"


def encrypt_pdf_bytes(data: bytes, mode: str, user_pw: bytes = b"") -> bytes:
    """Re-emit a ``to_pdf_bytes`` file with every stream encrypted and a
    standard /Encrypt dictionary appended — the writer half of the
    decryption roundtrip. ``mode``: rc4-40 | rc4-128 | aesv2 | aesv3."""
    owner_pw = b"owner-secret"
    if mode == "aesv3":
        file_key = bytes(range(32, 64))
        vsalt, ksalt = b"VSALTvs1", b"KSALTks1"
        u = hash_2b(user_pw, vsalt) + vsalt + ksalt
        ue = aes_cbc_encrypt(
            hash_2b(user_pw, ksalt), b"\x00" * 16, file_key, pad=False
        )
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256"
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /O " + _hex(b"\x00" * 48) + b" /OE " + _hex(b"\x00" * 32)
            + b" /U " + _hex(u) + b" /UE " + _hex(ue)
            + b" /P %d >>" % _P
        )

        def enc(num: int, gen: int, payload: bytes) -> bytes:
            iv = hashlib.md5(b"iv%d" % num).digest()
            return aes_cbc_encrypt(file_key, iv, payload)

    else:
        r, v, n = {
            "rc4-40": (2, 1, 5),
            "rc4-128": (3, 2, 16),
            "aesv2": (4, 4, 16),
        }[mode]
        o = _o_entry(owner_pw, user_pw, r, n)
        file_key = compute_key_r234(user_pw, o, _P, _ID0, n, r)
        u = _u_entry(file_key, r)
        extra = b""
        if v == 4:
            extra = (
                b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                b" /StmF /StdCF /StrF /StdCF"
            )
        enc_dict = (
            b"<< /Filter /Standard /V %d /R %d /Length %d" % (v, r, n * 8)
            + extra
            + b" /O " + _hex(o) + b" /U " + _hex(u) + b" /P %d >>" % _P
        )

        def enc(num: int, gen: int, payload: bytes) -> bytes:
            ok = object_key_r234(file_key, num, gen, aes=(mode == "aesv2"))
            if mode == "aesv2":
                iv = hashlib.md5(b"iv%d" % num).digest()
                return aes_cbc_encrypt(ok, iv, payload)
            return rc4(ok, payload)

    # -- re-emit the file with encrypted streams ------------------------
    out = bytearray(b"%PDF-1.6\n")
    max_num = 0
    for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", data):
        num, gen = int(m.group(1)), int(m.group(2))
        max_num = max(max_num, num)
        end = data.find(b"endobj", m.end())
        body = data[m.end() : end]
        s = body.find(b"stream")
        if s != -1:
            head = body[:s]
            ln = int(re.search(rb"/Length\s+(\d+)", head).group(1))
            pstart = s + len(b"stream")
            if body[pstart : pstart + 1] == b"\n":
                pstart += 1
            payload = body[pstart : pstart + ln]
            ct = enc(num, gen, payload)
            head = re.sub(
                rb"/Length\s+\d+", b"/Length %d" % len(ct), head, count=1
            )
            body = head + b"stream\n" + ct + b"\nendstream"
        out += b"%d %d obj\n" % (num, gen) + body + b"\nendobj\n"
    enc_num = max_num + 1
    out += b"%d 0 obj\n" % enc_num + enc_dict + b"\nendobj\n"
    out += (
        b"trailer\n<< /Root 1 0 R /Encrypt %d 0 R /ID [%s %s] >>\n%%%%EOF\n"
        % (enc_num, _hex(_ID0), _hex(_ID0))
    )
    return bytes(out)
