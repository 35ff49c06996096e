"""PDF standard-security-handler decryption (sources/pdf_crypt.py):
cipher known-answer vectors (FIPS-197, classic RC4) and
writer-inverse roundtrips — a test-side encryptor applies the exact
ISO 32000 algorithms (O/U entries, per-object keys, AES stream layout)
to ``to_pdf_bytes`` output and the production reader must recover the
pages. Non-empty user passwords stay a NotImplementedError seam."""

from __future__ import annotations

import pytest

from wc_vector_indexing_spark.sources.pdf import extract_pdf_text, to_pdf_bytes
from wc_vector_indexing_spark.sources.pdf_crypt import (
    AES,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    encrypt_pdf_bytes,
    rc4,
)

PAGES = [
    "Encrypted page one.\nSecond line.",
    "Encrypted page two (with parens) and \\ backslash.",
]

# --------------------------------------------------------------- vectors
def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = {
        "000102030405060708090a0b0c0d0e0f": "69c4e0d86a7b0430d8cdb78070b4c55a",
        "000102030405060708090a0b0c0d0e0f1011121314151617":
            "dda97ca4864cdfe06eaf70a0ec0d7191",
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f":
            "8ea2b7ca516745bfeafc49904b496089",
    }
    for key_hex, ct_hex in cases.items():
        a = AES(bytes.fromhex(key_hex))
        assert a.encrypt_block(pt).hex() == ct_hex
        assert a.decrypt_block(bytes.fromhex(ct_hex)) == pt


def test_rc4_vectors():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert rc4(b"Secret", b"Attack at dawn").hex() == (
        "45a01f645fc35b383552544b9bf5"
    )
    # symmetry
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


def test_aes_cbc_roundtrip_padding():
    key = b"0123456789abcdef"
    for n in (0, 1, 15, 16, 17, 100):
        msg = bytes(range(256))[:n]
        ct = aes_cbc_encrypt(key, b"\x07" * 16, msg)
        assert len(ct) % 16 == 0 and len(ct) >= len(msg) + 16
        assert aes_cbc_decrypt(key, ct) == msg


# ------------------------------------------------------------ roundtrips
@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aesv2", "aesv3"])
@pytest.mark.parametrize("compress", [False, True])
def test_encrypted_roundtrip(mode, compress):
    data = encrypt_pdf_bytes(to_pdf_bytes(PAGES, compress=compress), mode)
    assert extract_pdf_text(data) == PAGES


def test_encrypted_cid_roundtrip():
    """Decrypt-then-defilter ordering through the CID path: the
    /ToUnicode CMap stream is itself encrypted."""
    pages = ["CID encrypted text page."]
    data = encrypt_pdf_bytes(to_pdf_bytes(pages, cid=True), "aesv2")
    assert extract_pdf_text(data) == pages


@pytest.mark.parametrize("mode", ["rc4-128", "aesv2", "aesv3"])
def test_nonempty_user_password_is_a_seam(mode):
    data = encrypt_pdf_bytes(to_pdf_bytes(PAGES), mode, user_pw=b"hunter2")
    with pytest.raises(NotImplementedError, match="password-protected"):
        extract_pdf_text(data)


def test_literal_backslash_eol_continuation():
    """ISO 32000 7.3.4.2: backslash + EOL is a line continuation — both
    bytes vanish; CRLF after the backslash counts as ONE EOL. A PDF that
    wraps a long /O string this way must still derive keys."""
    from wc_vector_indexing_spark.sources.pdf_crypt import _literal_bytes

    assert _literal_bytes(b"(ab\\\ncd)", 0) == b"abcd"
    assert _literal_bytes(b"(ab\\\rcd)", 0) == b"abcd"
    assert _literal_bytes(b"(ab\\\r\ncd)", 0) == b"abcd"
    # a bare (unescaped) EOL is data, not continuation
    assert _literal_bytes(b"(ab\ncd)", 0) == b"ab\ncd"


def test_r5_interim_scheme_is_a_seam():
    data = encrypt_pdf_bytes(to_pdf_bytes(PAGES), "aesv3")
    data = data.replace(b"/V 5 /R 6", b"/V 5 /R 5")
    with pytest.raises(NotImplementedError, match="R5"):
        extract_pdf_text(data)


def test_nonstandard_handler_is_a_seam():
    data = encrypt_pdf_bytes(to_pdf_bytes(PAGES), "rc4-128")
    data = data.replace(b"/Filter /Standard", b"/Filter /MyDRM")
    with pytest.raises(NotImplementedError, match="non-standard"):
        extract_pdf_text(data)
