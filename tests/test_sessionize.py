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
        sessionize(stream, gap_secs=900)
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
