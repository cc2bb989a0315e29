"""Sessionization: batch lag/cumsum vs hand-computed expectations;
streaming applyInPandasWithState equivalence."""

import json

from pyspark.sql import functions as F

from traits_data_spark.operators.sessions import sessionize, sessionize_stream


def _events(spark):
    # user 1: two sessions split by a 2000s gap; user 2: one session
    rows = [
        (1, 1, 1000), (2, 1, 1100), (3, 1, 1200),
        (4, 1, 3500), (5, 1, 3600),
        (6, 2, 500), (7, 2, 2200),
    ]
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts"])


def test_batch_sessionize_hand_computed(spark):
    out = sessionize(
        _events(spark), gap=1800, order_tiebreak=["event_id"]
    )
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 0, 7: 0}
    # user 2's 1700s gap is within the threshold → one session


def test_batch_sessionize_gap_boundary(spark):
    rows = [(1, 1, 0), (2, 1, 1800), (3, 1, 3601)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = sessionize(df, gap=1800, order_tiebreak=["event_id"])
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    # gap == threshold stays in-session (strict >); 1801 starts a new one
    assert got == {1: 0, 2: 0, 3: 1}


def test_streaming_sessionize_emits_closed_sessions(spark, tmp_path):
    rows = [
        {"event_id": i, "user_id": u, "ts": t}
        for i, u, t in [
            (1, 1, 1000), (2, 1, 1100), (3, 1, 1200),
            (4, 1, 3500), (5, 1, 3600),
            (6, 2, 500), (7, 2, 2200),
        ]
    ]
    landing = tmp_path / "ev"
    landing.mkdir()
    (landing / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("event_id LONG, user_id LONG, ts LONG")
        .json(str(landing))
        .withColumn("ts", F.to_timestamp(F.from_unixtime("ts")))
    )
    sessions = sessionize_stream(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    # user 1's first session closed inline when event 4 arrived 2300s
    # later; the open sessions (user 1's second, user 2's only) stay in
    # state — their event-time timeouts (5400, 4000) are past the final
    # watermark (3600 - 1800 = 1800), so nothing else is emitted yet
    assert got == {(1, 1000): (1200, 3)}
