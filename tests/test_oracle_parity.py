"""CI-required oracle parity (round-4 advisor finding): the external
driver gate records only the FIRST 50 oracle-backed registry entries, so
a latent oracle mismatch elsewhere would only be caught by a
manually-run tool. This test runs the SAME comparison
(tools.parity_check.check_query — count / columns / canonical Arrow
types / typed value multisets) for EVERY oracle-backed entry, at
sf0.001 to keep the suite's runtime bounded — pytest alone now proves
the whole catalog against DuckDB. `tools/parity_check.py` at sf0.01
remains the full-scale pre-round sweep."""

from __future__ import annotations

import pytest

from tools.parity_check import check_query, open_oracle
from wc_vector_indexing_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"

_ORACLE_BACKED = [k for k, s in REGISTRY.items() if s.sql is not None]


@pytest.fixture(scope="module")
def oracle():
    con = open_oracle(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_BACKED)
def test_oracle_parity(spark, oracle, name):
    err, n_rows = check_query(spark, oracle, REGISTRY[name], SF)
    assert err is None, f"{name}: {err}"
    assert n_rows >= 0
