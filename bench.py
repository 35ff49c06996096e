"""Benchmark runner: executes the engine's query catalog at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "catalog_total", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full evaluation, no
driver collect, no pruned projections — what a cluster run would do).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from wc_vector_indexing_spark.plans.queries import REGISTRY  # noqa: E402
from wc_vector_indexing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else 0.0

    # warm-ups: one JVM action + one tiny pandas-UDF pass so JVM/codegen
    # startup and python-worker spin-up aren't billed to the first queries
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    # (no type hints: `from __future__ import annotations` stringizes
    # them, which pandas_udf's signature inference rejects)
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(1000).select(_warm("id")).count()

    times: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        t0 = time.time()
        try:
            spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            times[name] = -1.0
    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
