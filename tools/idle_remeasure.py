"""Idle re-measure for bench-regression adjudication (the BENCH_NOTES
reading rule): run ONLY the named queries in a fresh session — same
warm-ups as bench.py, none of the other 200+ queries' session-state —
so a pass-position/session artifact separates from a real per-query
regression. Prints min-of-N per query, the pure-Catalyst control
drift, and the drift-normalized ratio vs a supplied pin.

Usage:
    python tools/idle_remeasure.py <sf_dir> name=pin [name=pin ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wc_vector_indexing_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    warm_build_artifacts,
)
from wc_vector_indexing_spark.session import get_spark  # noqa: E402

CONTROL_REF = {
    "q1_pricing_summary": 0.43,
    "q8_market_share": 0.92,
    "gopher_quality": 0.79,
}


def main() -> int:
    sf_dir = sys.argv[1]
    targets = {}
    for arg in sys.argv[2:]:
        name, _, pin = arg.partition("=")
        targets[name] = float(pin) if pin else None

    spark = get_spark("idle-remeasure")
    spark.sparkContext.setLogLevel("ERROR")

    # identical warm-up battery to bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(1000).select(_warm("id")).count()
    warm_df = spark.range(1000).withColumn("g", F.col("id") % 32)
    warm_df.groupBy("g").applyInPandas(lambda p: p, "id long, g long").count()
    warm_df.mapInPandas(lambda it: it, "id long, g long").count()
    warm_build_artifacts(spark, sf_dir)

    def run_one(name: str) -> float:
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    # controls first: min-of-3 pins the host's steady speed this window
    ctrl = {n: min(run_one(n) for _ in range(3)) for n in CONTROL_REF}
    drift = sum(ctrl.values()) / sum(CONTROL_REF.values())
    print(f"controls {ctrl} drift {drift:.3f}")

    for name, pin in targets.items():
        samples = [run_one(name) for _ in range(3)]
        best = min(samples)
        norm = best / drift
        line = f"{name}: samples {samples} best {best:.2f} norm {norm:.2f}"
        if pin:
            line += f" pin {pin:.2f} ratio x{norm / pin:.2f}"
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
