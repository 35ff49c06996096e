"""Event/telemetry log (SURVEY §2.9 W9-W10, §2.1 S9-S10, §2.6 A4-A5).

The reference appends JSONL rows to daily-rotated files and prunes files
older than the retention window (class-events.php:18-47, :166-189). Spark
restatement: an append-only date-partitioned JSON table —

    logs_root/date=YYYY-MM-DD/part-*.json

Rotation is free (it IS the partitioning); retention = partition drop;
the reader is a partition-pruned scan. Row shape mirrors
class-events.php:21-33 (FIXTURES.md §9).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("site_id", T.LongType(), True),
        T.StructField("product_id", T.LongType(), True),
        T.StructField("target", T.StringType(), True),
        T.StructField("action", T.StringType(), False),
        T.StructField("outcome", T.StringType(), False),  # success | error | info
        T.StructField("message", T.StringType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("count", T.IntegerType(), True),
        T.StructField("request_id", T.StringType(), True),
        T.StructField("details", T.StringType(), True),  # JSON
    ]
)

DEFAULT_RETENTION_DAYS = 7  # clamp 1-90 (class-options.php:553-556)


class EventLog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- writes (W9) -------------------------------------------------------

    def append(self, rows: list[dict]) -> None:
        """Append event rows (driver-side; per-batch telemetry volume is
        tiny). Each row lands in its date partition."""
        now = datetime.now(timezone.utc)
        by_date: dict[str, list[dict]] = {}
        for r in rows:
            row = {
                "ts": (r.get("ts") or now).isoformat(),
                "site_id": r.get("site_id"),
                "product_id": r.get("product_id"),
                "target": r.get("target"),
                "action": r["action"],
                "outcome": r.get("outcome", "info"),
                "message": r.get("message"),
                "duration_ms": r.get("duration_ms"),
                "count": r.get("count"),
                "request_id": r.get("request_id") or uuid.uuid4().hex[:12],
                "details": json.dumps(r.get("details")) if r.get("details") else None,
            }
            d = row["ts"][:10]
            by_date.setdefault(d, []).append(row)
        for d, batch in by_date.items():
            part = os.path.join(self.root, f"date={d}")
            os.makedirs(part, exist_ok=True)
            with open(os.path.join(part, f"{uuid.uuid4().hex}.json"), "w") as f:
                for row in batch:
                    f.write(json.dumps(row) + "\n")

    def append_df(self, df: DataFrame) -> None:
        """Append a DataFrame of events (executor-side, for bulk jobs)."""
        (
            df.withColumn("date", F.date_format("ts", "yyyy-MM-dd"))
            .write.mode("append")
            .partitionBy("date")
            .json(self.root)
        )

    # -- reads (S9/S10) ----------------------------------------------------

    def read(self) -> DataFrame:
        if not any(n.startswith("date=") for n in os.listdir(self.root)):
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        df = self.spark.read.schema(
            T.StructType(EVENT_SCHEMA.fields + [T.StructField("date", T.StringType(), True)])
        ).json(self.root)
        return df.drop("date")

    def page(
        self,
        product_id: int | None = None,
        target: str | None = None,
        action: str | None = None,
        outcome: str | None = None,
        offset: int = 0,
        limit: int = 50,
    ) -> DataFrame:
        """S9/K4: newest-first filtered page (class-events.php:50-94)."""
        df = self.read()
        for col, val in [
            ("product_id", product_id),
            ("target", target),
            ("action", action),
            ("outcome", outcome),
        ]:
            if val is not None:
                df = df.filter(F.col(col) == val)
        return df.orderBy(F.desc("ts"), F.desc("request_id")).offset(offset).limit(limit)

    # -- retention / export (W9 prune, W10 CSV) ----------------------------

    def prune(self, retention_days: int = DEFAULT_RETENTION_DAYS) -> list[str]:
        """Drop date partitions older than the window — the partition-drop
        form of the reference's file deletion (class-events.php:166-189)."""
        retention_days = max(1, min(90, retention_days))
        cutoff = (datetime.now(timezone.utc) - timedelta(days=retention_days)).strftime(
            "%Y-%m-%d"
        )
        dropped = []
        for name in sorted(os.listdir(self.root)):
            if name.startswith("date=") and name[5:] < cutoff:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
                dropped.append(name)
        return dropped

    def export_csv(self, out_dir: str, cap: int = 5000, **filters) -> str:
        """W10: stream filtered rows to CSV, capped at 5000 rows
        (class-events.php:97-133)."""
        df = self.page(limit=cap, **filters)
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(out_dir)
        return out_dir


# Column order mirrors the reference's fputcsv header row
# (class-admin-page-logs.php:189-199); `id` is dropped — the state store has
# no surrogate key, vector_id is the row identity.
STATE_CSV_COLUMNS = [
    "site_id",
    "product_id",
    "target",
    "chunk_index",
    "vector_id",
    "product_sha",
    "chunk_sha",
    "model",
    "dimension",
    "status",
    "error_code",
    "error_msg",
    "last_synced_at",
    "created_at",
    "updated_at",
]

_STATE_TARGETS = ("pinecone", "openai", "local")
_STATE_STATUSES = ("synced", "pending", "error", "deleted")


def export_state_csv(
    state: DataFrame,
    out_dir: str,
    site_id: int | None = None,
    product_id: int | None = None,
    target: str | None = None,
    status: str | None = None,
    per_page: int = 50,
    page: int = 1,
) -> str:
    """W10 (state side): the reference exports BOTH tables — events AND the
    sync-state page (class-admin-page-logs.php:125-200). Filters mirror
    query_rows(): site/product equality, target/status validated against the
    reference enums; error_msg truncated to 300 chars (SUBSTRING at :162);
    ordering ``updated_at DESC, id DESC`` with vector_id as the tiebreak;
    per_page clamped 10-200, page >= 1 (:216-217)."""
    per_page = max(10, min(200, per_page))
    page = max(1, page)
    df = state
    if site_id is not None:
        df = df.filter(F.col("site_id") == site_id)
    if product_id is not None:
        df = df.filter(F.col("product_id") == product_id)
    if target is not None and target in _STATE_TARGETS:
        df = df.filter(F.col("target") == target)
    if status is not None and status in _STATE_STATUSES:
        df = df.filter(F.col("status") == status)
    df = (
        df.withColumn("error_msg", F.substring("error_msg", 1, 300))
        .select(*STATE_CSV_COLUMNS)
        .orderBy(F.desc("updated_at"), F.desc("vector_id"))
        .offset((page - 1) * per_page)
        .limit(per_page)
    )
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(out_dir)
    return out_dir


def queue_metrics(state: DataFrame, events: DataFrame | None = None) -> dict:
    """A4: status counts + windowed 24h success/error counts + backlog
    estimate (class-scheduler.php:259-327)."""
    by_status = {
        r.status: r.n
        for r in state.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    out = {
        "state_rows": sum(by_status.values()),
        "by_status": by_status,
        "products": state.select("product_id").distinct().count(),
    }
    if events is not None:
        day_ago = F.current_timestamp() - F.expr("INTERVAL 24 HOURS")
        recent = events.filter(F.col("ts") >= day_ago)
        out["last_24h"] = {
            r.outcome: r.n
            for r in recent.groupBy("outcome").agg(F.count("*").alias("n")).collect()
        }
    return out
