from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
# python workers unpickle test-defined classes (fake backends) by module
# name — put the repo AND tests dir on the workers' import path before
# the JVM (and its python workers) launch
os.environ["PYTHONPATH"] = (
    f"{_REPO}:{_REPO / 'tests'}:" + os.environ.get("PYTHONPATH", "")
)

from wc_vector_indexing_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # per-run warehouse: managed-table files die with the run, so a
    # stale /tmp warehouse from a prior session can never collide with
    # this session's fresh in-memory metastore
    os.environ["SPARK_GRAFT_WAREHOUSE"] = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
