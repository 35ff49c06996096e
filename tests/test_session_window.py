"""session_window_aggregate (streaming/incremental.py): gap-session
semantics in batch mode and true streaming mode (file source →
availableNow → memory sink), including watermark state eviction
surviving a multi-batch replay."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from wc_vector_indexing_spark.streaming.incremental import session_window_aggregate

T0 = datetime(2025, 6, 1, 12, 0, 0)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _events(spark):
    rows = [
        # user 1: two events 10 min apart (one session), then a 40-min
        # gap (new session)
        Row(user_id=1, ts=T0, value=1.0),
        Row(user_id=1, ts=T0 + timedelta(minutes=10), value=2.0),
        Row(user_id=1, ts=T0 + timedelta(minutes=50), value=4.0),
        # user 2: gap of exactly 30 min -> still MERGES (boundary event
        # extends the session); 30 min + 1 s -> splits
        Row(user_id=2, ts=T0, value=1.0),
        Row(user_id=2, ts=T0 + timedelta(minutes=30), value=1.0),
        Row(user_id=2, ts=T0 + timedelta(minutes=60, seconds=1), value=1.0),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_batch_session_semantics(spark):
    out = session_window_aggregate(_events(spark), gap="30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.session_start)
    assert len(u1) == 2
    assert u1[0].n_events == 2 and u1[0].total_value == 3.0
    # session_end = last event + gap
    assert u1[0].session_end == T0 + timedelta(minutes=40)
    assert u1[1].n_events == 1
    # exactly-at-gap merges; strictly-past-gap splits
    u2 = sorted(by_user[2], key=lambda r: r.session_start)
    assert len(u2) == 2
    assert u2[0].n_events == 2
    assert u2[0].session_end == T0 + timedelta(minutes=60)


def test_streaming_session_window(spark, tmp_path):
    ev_dir = str(tmp_path / "sess_events")
    _events(spark).write.parquet(ev_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(ev_dir)
    out = session_window_aggregate(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions_mem").collect()
    batch = session_window_aggregate(_events(spark), gap="30 minutes").collect()
    key = lambda r: (r.user_id, r.session_start)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, batch))
    assert {r.n_events for r in got} == {r.n_events for r in batch}


def test_streaming_state_evicts_with_watermark(spark, tmp_path):
    # two files = two micro-batches; append mode emits a session only
    # once the watermark passes its end — proving sessions finalize
    ev_dir = tmp_path / "sess_evict"
    ev_dir.mkdir()
    spark.createDataFrame(
        [Row(user_id=1, ts=T0, value=1.0)], SCHEMA
    ).write.parquet(str(ev_dir / "b1"))
    spark.createDataFrame(
        [Row(user_id=1, ts=T0 + timedelta(hours=3), value=1.0)], SCHEMA
    ).write.parquet(str(ev_dir / "b2"))
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        str(ev_dir / "*")
    )
    out = session_window_aggregate(stream, gap="30 minutes", watermark_delay="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from sessions_evict").collect()
    # the T0 session closed (watermark advanced 3h past its end) and was
    # emitted + evicted; the 3h-later session is still open, not emitted
    assert [r.session_start for r in emitted] == [T0]


def test_range_join_count_boundaries(spark):
    """range_join_count (operators/relational.py): exclusive lookback
    start, inclusive end, bin-boundary crossing, zero-match rows."""
    from wc_vector_indexing_spark.operators.relational import range_join_count

    left = spark.createDataFrame(
        [
            Row(user_id=1, ts=T0, value=0.0),
            Row(user_id=2, ts=T0, value=0.0),
        ],
        SCHEMA,
    )
    right_rows = [
        # user 1: exactly at ts (counts), exactly lookback before
        # (exclusive -> does NOT count), 1 us inside the window (counts),
        # and far outside (no)
        Row(user_id=1, ts=T0, value=0.0),
        Row(user_id=1, ts=T0 - timedelta(seconds=600), value=0.0),
        Row(user_id=1, ts=T0 - timedelta(seconds=599, microseconds=999999), value=0.0),
        Row(user_id=1, ts=T0 - timedelta(seconds=4000), value=0.0),
        # user 2: nothing in range
        Row(user_id=2, ts=T0 + timedelta(seconds=1), value=0.0),
    ]
    right = spark.createDataFrame(right_rows, SCHEMA).select("user_id", "ts")
    out = {
        r.user_id: r.n_in_range
        for r in range_join_count(
            left.select("user_id", "ts"), right, on="user_id",
            lookback_seconds=600,
        ).collect()
    }
    assert out == {1: 2, 2: 0}


def test_range_join_matches_naive(spark):
    """Property: the bin-bucketed plan equals the naive theta-join on a
    deterministic pseudo-random fixture (including bin-crossing pairs)."""
    from wc_vector_indexing_spark.operators.relational import range_join_count

    rows_l, rows_r = [], []
    for i in range(60):
        rows_l.append(Row(user_id=i % 5, ts=T0 + timedelta(seconds=(i * 977) % 3600), value=0.0))
        rows_r.append(Row(user_id=i % 5, ts=T0 + timedelta(seconds=(i * 613) % 3600), value=0.0))
    left = spark.createDataFrame(rows_l, SCHEMA).select("user_id", "ts").distinct()
    right = spark.createDataFrame(rows_r, SCHEMA).select("user_id", "ts")
    got = range_join_count(left, right, on="user_id", lookback_seconds=300)
    l, r = left.alias("l"), right.alias("r")
    naive = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.unix_micros(F.col("r.ts")) > F.unix_micros(F.col("l.ts")) - 300 * 1_000_000)
            & (F.unix_micros(F.col("r.ts")) <= F.unix_micros(F.col("l.ts"))),
            "left",
        )
        .groupBy(F.col("l.user_id").alias("user_id"), F.col("l.ts").alias("ts"))
        .agg(F.count(F.col("r.ts")).alias("n_in_range"))
    )
    key = lambda x: (x.user_id, x.ts, x.n_in_range)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))


def test_enriched_event_stream(spark, tmp_path):
    """Stream-static broadcast enrichment: dim columns appear on every
    micro-batch row; plan is a BroadcastHashJoin; no shuffle on the
    stream side."""
    from wc_vector_indexing_spark.streaming.incremental import enriched_event_stream

    ev_dir = str(tmp_path / "enrich_events")
    _events(spark).write.parquet(ev_dir)
    dim = spark.createDataFrame(
        [Row(user_id=1, segment="a"), Row(user_id=2, segment="b")]
    )
    # batch plan: broadcast join, zero exchanges on the fact side
    batch = enriched_event_stream(_events(spark), dim, dim_cols=("segment",))
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan

    stream = spark.readStream.schema(SCHEMA).parquet(ev_dir)
    out = enriched_event_stream(stream, dim, dim_cols=("segment",))
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from enriched_mem").collect()
    assert len(got) == 6
    assert {(r.user_id, r.segment) for r in got} == {(1, "a"), (2, "b")}


def test_interval_overlap_join_matches_naive(spark):
    """Bin-bucketed interval join == naive theta-join for random
    intervals, across bucket widths (incl. buckets much smaller and
    much larger than the intervals)."""
    import random
    from datetime import datetime, timedelta

    from wc_vector_indexing_spark.operators.relational import interval_overlap_join

    rng = random.Random(13)
    t0 = datetime(2026, 2, 1)
    ivals = []
    for i in range(40):
        s = t0 + timedelta(seconds=rng.randint(0, 50_000))
        e = s + timedelta(seconds=rng.randint(0, 9_000))
        ivals.append((i, s, e))
    df = spark.createDataFrame(ivals, "iid long, start_ts timestamp, end_ts timestamp")

    naive = {
        (a[0], b[0]): (
            min(a[2], b[2]) - max(a[1], b[1])
        ) // timedelta(microseconds=1)
        for a in ivals
        for b in ivals
        if a[0] != b[0] and a[1] < b[2] and b[1] < a[2]
    }
    for bucket in (600, 3600, 86_400):
        got = {
            (r.iid_l, r.iid_r): r.overlap_us
            for r in interval_overlap_join(df, df, bucket_seconds=bucket)
            .filter("iid_l <> iid_r")
            .collect()
        }
        assert got == naive, f"bucket={bucket}"


def test_funnel_stages_ordered_subsequence(spark):
    """Stage requires IN-ORDER completion: click before view must not
    advance past stage 1."""
    from datetime import datetime, timedelta

    from wc_vector_indexing_spark.operators.relational import funnel_stages

    t0 = datetime(2026, 3, 1)
    rows = []

    def sess(user, types, base_min):
        for i, et in enumerate(types):
            rows.append((len(rows), t0 + timedelta(minutes=base_min, seconds=i), user, et))

    sess(1, ["view", "click", "purchase"], 0)        # stage 3
    sess(2, ["click", "view", "click"], 0)           # stage 2 (view then later click)
    sess(3, ["purchase", "click", "view"], 0)        # stage 1 (view only, wrong order)
    sess(4, ["signup", "error"], 0)                  # stage 0
    sess(1, ["view"], 120)                           # 2nd session user 1: stage 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.stage: (r.step, r.n_sessions) for r in funnel_stages(ev).collect()}
    assert got == {
        0: ("(none)", 1),
        1: ("view", 2),
        2: ("click", 1),
        3: ("purchase", 1),
    }


def test_funnel_stages_matches_bruteforce_on_random_streams(spark):
    """Differential test: Catalyst subsequence scan == a python
    reference over random event streams."""
    import random
    from datetime import datetime, timedelta

    from wc_vector_indexing_spark.operators.relational import funnel_stages

    rng = random.Random(99)
    types = ["view", "click", "purchase", "signup", "error"]
    t0 = datetime(2026, 4, 1)
    rows = []
    for eid in range(400):
        rows.append(
            (
                eid,
                t0 + timedelta(seconds=rng.randint(0, 20_000)),
                rng.randint(1, 12),
                rng.choice(types),
            )
        )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )

    # python reference: same gap sessionization + ordered-subsequence scan
    per_user: dict = {}
    for eid, ts, uid, et in rows:
        per_user.setdefault(uid, []).append((ts, eid, et))
    sessions = []
    for uid, evs in per_user.items():
        evs.sort()
        cur = []
        for i, (ts, eid, et) in enumerate(evs):
            if cur and (ts - cur[-1][0]).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append((ts, eid, et))
        sessions.append(cur)
    want: dict = {}
    for sess_events in sessions:
        seq = [et for _, _, et in sess_events]
        stage, pos = 0, 0
        for step in ("view", "click", "purchase"):
            try:
                pos = seq.index(step, pos) + 1
                stage += 1
            except ValueError:
                break
        want[stage] = want.get(stage, 0) + 1

    got = {r.stage: r.n_sessions for r in funnel_stages(ev).collect()}
    assert got == want


def test_funnel_stage_stream_append_mode(spark, tmp_path):
    """Streaming funnel: stage labels emitted per closed session in
    append mode, matching the batch call on the same rows."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    from wc_vector_indexing_spark.streaming.incremental import funnel_stage_stream

    t0 = datetime(2026, 5, 1, 9, 0, 0)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
        ]
    )
    rows = [
        (1, t0, 1, "view"),
        (2, t0 + timedelta(seconds=10), 1, "click"),
        (3, t0 + timedelta(seconds=20), 1, "purchase"),
        (4, t0, 2, "click"),
        (5, t0 + timedelta(seconds=5), 2, "view"),
        # far-future event per key advances the watermark so the
        # sessions above finalize
        (6, t0 + timedelta(hours=5), 1, "error"),
        (7, t0 + timedelta(hours=5), 2, "error"),
    ]
    docs_dir = str(tmp_path / "ev")
    spark.createDataFrame(rows[:5], schema).write.parquet(docs_dir + "/f1")
    spark.createDataFrame(rows[5:], schema).write.parquet(docs_dir + "/f2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )
    q = (
        funnel_stage_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        (r.user_id, r.stage, r.step)
        for r in spark.sql("SELECT * FROM funnel_out").collect()
    }
    assert (1, 3, "purchase") in got
    assert (2, 1, "view") in got  # click-before-view stays stage 1

    # batch twin: identical call on a static frame
    batch = funnel_stage_stream(spark.createDataFrame(rows, schema))
    b = {(r.user_id, r.stage, r.step) for r in batch.collect()}
    assert {(1, 3, "purchase"), (2, 1, "view")} <= b


def test_funnel_stages_repeated_step_names(spark):
    """Regression (r5 advice): steps.index(step) resolved duplicates to
    the first occurrence so ('view','click','view') never advanced past
    the repeat; enumerate-gated stages must — matching the streaming
    twin's semantics."""
    from datetime import datetime, timedelta

    from wc_vector_indexing_spark.operators.relational import funnel_stages

    t0 = datetime(2026, 3, 1)
    rows = []
    for i, et in enumerate(["view", "click", "view"]):   # user 1: full funnel
        rows.append((i, t0 + timedelta(seconds=i), 1, et))
    for i, et in enumerate(["view", "click"]):           # user 2: stage 2
        rows.append((10 + i, t0 + timedelta(seconds=i), 2, et))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.stage: (r.step, r.n_sessions) for r in
           funnel_stages(ev, steps=("view", "click", "view")).collect()}
    assert got == {2: ("click", 1), 3: ("view", 1)}
