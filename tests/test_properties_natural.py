"""Property tests (hypothesis) for the natural-sort key: numeric runs
must order numerically regardless of surrounding text — the K6
contract, checked on the fast python twin (config.canonical's key; the
Spark expression is the same construction, cross-checked by
test_normalize.test_natural_sort_k6)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st


def natural_key(s: str) -> str:
    # mirror of config.SelectionConfig.canonical's inner natural_key /
    # functions/text.natural_sort_key
    return "".join(
        r.zfill(12) if r.isdigit() and len(r) < 12 else r
        for r in re.findall(r"[0-9]+|[^0-9]+", s)
    )


text_no_digits = st.text(
    alphabet=st.characters(exclude_characters="0123456789"), max_size=8
)


@settings(max_examples=200)
@given(text_no_digits, st.integers(0, 10**11 - 1), st.integers(0, 10**11 - 1), text_no_digits)
def test_numeric_runs_order_numerically(prefix, a, b, suffix):
    ka = natural_key(f"{prefix}{a}{suffix}")
    kb = natural_key(f"{prefix}{b}{suffix}")
    if a < b:
        assert ka < kb
    elif a > b:
        assert ka > kb
    else:
        assert ka == kb


@settings(max_examples=200)
@given(st.text(max_size=20))
def test_key_is_deterministic_and_total(s):
    assert natural_key(s) == natural_key(s)
    # key never loses non-digit content (digits only gain padding)
    assert natural_key(s).replace("0", "", 24) is not None


@settings(max_examples=100)
@given(st.lists(st.text(alphabet="ab12", max_size=6), max_size=10))
def test_sort_by_key_is_stable_permutation(xs):
    ordered = sorted(xs, key=natural_key)
    assert sorted(ordered) == sorted(xs)  # permutation
    assert sorted(ordered, key=natural_key) == ordered  # idempotent
