"""Quarantine boundary for byte-walkers over untrusted crawl bytes.

Every public decode/parse function in this package promises: bad input
raises ``ValueError`` (or ``NotImplementedError`` for out-of-scope
features), never an internal exception class. Spark-side callers rely
on that contract to quarantine the ROW — a non-contract exception
escaping a Pandas UDF fails the whole STAGE, and at 100 TB a single
bit-rotted member in a billion-file crawl must cost one audit row, not
an executor.

Truncation is a one-dimensional family, so the truncation sweep
(tests/test_truncation_sweep.py) is matched by explicit length checks
inside each walker. *Interior* corruption is combinatorial — no
enumeration of checks can cover every mutated length field, table id,
or entropy bitstream, so the guarantee lives here instead: wrap the
public entry point, map any internal parse-machinery exception to the
contract ``ValueError`` (chained, so the original traceback survives
for debugging). Targeted structural checks inside the walkers remain
for two jobs this boundary cannot do: bounding allocations *before*
they happen, and detecting corruption via integrity fields (PNG chunk
CRCs) so it is reported as corruption rather than decoded into silent
wrong pixels.

Deliberately NOT mapped: ``MemoryError`` (masking a real OOM as a bad
row would hide capacity bugs — walkers must bound allocations up
front instead) and ``TypeError``/``AttributeError`` (those are code
bugs, not data bugs; the mutation sweep would surface them for a real
fix).
"""

from __future__ import annotations

import binascii
import functools
import struct
import zipfile
import zlib

# Exception classes the stdlib/parse internals throw on corrupt bytes.
# RuntimeError covers zipfile's encrypted-entry signal (and, via its
# RecursionError subclass, corruption-induced deep recursion — at the
# boundary both mean "this member is bad input", which is exactly a
# quarantine).
_NON_CONTRACT = (
    IndexError,
    KeyError,
    OverflowError,
    EOFError,
    UnicodeDecodeError,
    SyntaxError,  # xml.etree.ElementTree.ParseError
    struct.error,
    zlib.error,
    binascii.Error,
    zipfile.BadZipFile,
    RuntimeError,
)


def quarantine(fmt: str):
    """Decorator: re-raise internal parse failures as contract
    ``ValueError("corrupt <fmt>: ...")`` at this public boundary."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except _NON_CONTRACT as e:
                raise ValueError(f"corrupt {fmt}: {e!r}") from e

        return wrapper

    return deco
