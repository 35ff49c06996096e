"""QM-coder known-answer pins (T.81 Annex D state machine).

HONESTY NOTE: no reference JPEG/JBIG codec or spec text exists in this
container, so these are (a) structural checks of public Table D.3
facts and (b) BYTE-EXACT REGRESSION PINS of the encoder's bitstream
for fixed decision sequences — any future edit to the estimator table,
renormalization, conditional exchange, or flush (D.1.8) breaks a pin
loudly instead of silently shifting the bitstream. External spec
validation (interop with a real codec) remains the documented open
item in jpeg_arith.py's module docstring."""

from __future__ import annotations

import numpy as np
import pytest

from wc_vector_indexing_spark.operators.jpeg_arith import (
    _QE,
    _QMDecoder,
    _QMEncoder,
)

# (hex bitstream, n contexts) for the decision sequences in _SEQS —
# produced by the current coder and hand-checked to decode back; see
# module docstring for what these do and do not validate.
_PINS = {
    "all_mps_64": ("500000", 1),
    "alternating_48": ("485e5fff00ff00ff008000", 1),
    "lps_burst": ("5ff4b2fb0000", 1),
    "prand_200_c4": (
        "d2549b91e33bc7d09770c1ab9dfac542fa4ac8cc625b9fe9300000", 4),
}


def _seqs() -> dict[str, list[int]]:
    return {
        "all_mps_64": [0] * 64,
        "alternating_48": [i % 2 for i in range(48)],
        "lps_burst": [0] * 20 + [1] * 8 + [0] * 20,
        "prand_200_c4": list(
            (np.random.RandomState(17).rand(200) < 0.3).astype(int)),
    }


def test_qe_table_structure():
    """Public Table D.3 facts: the widely-cited initial state
    (Qe=0x5A1D, NMPS=NLPS=1, SWITCH=1), 1-based transition indices in
    range, Qe always a valid subinterval, and every state reaching the
    steady bottom state by following NMPS (the estimator must converge
    for a stationary source)."""
    assert _QE[0] == (0x5A1D, 1, 1, 1)
    n = len(_QE)
    for qe, nlps, nmps, switch in _QE:
        assert 0 < qe < 0x8000
        assert 0 <= nlps < n and 0 <= nmps < n
        assert switch in (0, 1)
    # the estimator must converge for a stationary MPS source: following
    # NMPS from any state ends in a self-loop (the steady bottom state)
    for start in range(n):
        s, seen = start, set()
        while s not in seen:
            seen.add(s)
            s = _QE[s][2]
        assert _QE[s][2] == s, f"NMPS cycle that is not a fixpoint at {s}"


@pytest.mark.parametrize("name", sorted(_PINS))
def test_encoder_bitstream_pins(name):
    bits = _seqs()[name]
    hexpin, nctx = _PINS[name]
    enc = _QMEncoder()
    stats = [[0, 0] for _ in range(nctx)]
    for i, b in enumerate(bits):
        enc.code(stats, i % nctx, b)
    assert enc.finish().hex() == hexpin


@pytest.mark.parametrize("name", sorted(_PINS))
def test_decoder_inverts_pins(name):
    bits = _seqs()[name]
    hexpin, nctx = _PINS[name]
    dec = _QMDecoder(bytes.fromhex(hexpin), 0)
    stats = [[0, 0] for _ in range(nctx)]
    assert [dec.decode(stats, i % nctx) for i in range(len(bits))] == bits


def test_pin_contains_stuffed_bytes():
    """alternating_48's pin carries FF00 pairs — the pins cover the
    byte-stuffing path, not just smooth streams."""
    assert "ff00" in _PINS["alternating_48"][0]
