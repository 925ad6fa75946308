"""Checkpoint/resume and Structured Streaming operator tests."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.datagen import DEFAULT_TARGET, generate_rows
from bloomine_spark.sketch.hll import HyperLogLog
from bloomine_spark.sources.checkpoint import checkpointed_sketch_agg


@pytest.fixture(scope="module")
def seq_parquet(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seqs"))
    pdf = generate_rows(np.arange(3000), seed=42)
    spark.createDataFrame(pdf).repartition(8).write.mode("overwrite").parquet(d)
    return d


def test_checkpoint_resume_skips_done_partitions(spark, seq_parquet, tmp_path):
    base = str(tmp_path / "ckpt")
    df = spark.read.parquet(seq_parquet)
    factory = lambda: HyperLogLog.empty(12)  # noqa: E731

    # run 1: inject a failure in one partition → job dies AFTER nothing or
    # some partitions persisted (task retries make persistence racy, so we
    # only require: run 2 completes and matches the non-checkpointed result)
    with pytest.raises(Exception):
        checkpointed_sketch_agg(
            df, "tokens", factory, base, "run1", "hll",
            fail_partitions={df.rdd.getNumPartitions() - 1},
        )

    # run 2 (resume): completes; estimate equals a fresh full aggregation
    sk, lineage = checkpointed_sketch_agg(
        df, "tokens", factory, base, "run1", "hll"
    )
    from bloomine_spark.sketch.core import sketch_agg_global

    whole = sketch_agg_global(df, "tokens", factory)
    assert sk.estimate() == whole.estimate()
    assert (sk.registers == whole.registers).all()

    # lineage carries per-partition metrics
    lin = lineage.toPandas()
    assert lin["partition_id"].nunique() == df.rdd.getNumPartitions()
    assert (lin["rows"] >= 0).all() and lin["rows"].sum() == df.count()
    assert (lin["secs"] >= 0).all()

    # run 3 (fully resumed): no partition recomputation — lineage unchanged
    sk3, lineage3 = checkpointed_sketch_agg(
        df, "tokens", factory, base, "run1", "hll"
    )
    assert sk3.estimate() == whole.estimate()
    assert lineage3.count() == df.rdd.getNumPartitions()


def test_streaming_screen_matches_batch(spark, seq_parquet, tmp_path):
    from bloomine_spark.operators.screen import screen_hits
    from bloomine_spark.streaming.stream_ops import screen_stream

    batch_df = spark.read.parquet(seq_parquet)
    want = sorted(
        r["doc_id"] for r in screen_hits(batch_df, DEFAULT_TARGET).collect()
    )

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(seq_parquet)
    )
    scores = screen_stream(stream, DEFAULT_TARGET)
    q = (
        scores.filter(F.col("sp_pass"))
        .writeStream.format("memory")
        .queryName("stream_hits")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM stream_hits").collect()
    )
    assert got == want and len(got) > 0


def test_streaming_windowed_hits(spark, seq_parquet, tmp_path):
    """Watermarked tumbling-window hit counts on a stream equal the batch
    computation over the same data."""
    from bloomine_spark.operators.screen import screen_hits
    from bloomine_spark.streaming.stream_ops import hits_per_window_stream

    batch_df = spark.read.parquet(seq_parquet)
    # synthesize an event-time column (deterministic per doc_id)
    ts = F.timestamp_seconds(
        F.lit(1700000000) + F.pmod(F.xxhash64("doc_id"), F.lit(600))
    )
    with_ts = batch_df.withColumn("ts", ts)
    want = (
        screen_hits(with_ts, DEFAULT_TARGET)
        .groupBy(F.window("ts", "1 minute").alias("w"), "source")
        .agg(F.count("*").alias("n_hits"))
        .select(F.col("w.start").alias("window_start"), "source", "n_hits")
        .toPandas()
    )

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(seq_parquet)
        .withColumn("ts", ts)
    )
    q = (
        hits_per_window_stream(
            stream, DEFAULT_TARGET, window="1 minute", watermark="10 minutes"
        )
        .writeStream.format("memory")
        .queryName("win_hits")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM win_hits").toPandas()
    key = lambda df: sorted(  # noqa: E731
        zip(df["window_start"].astype(str), df["source"], df["n_hits"])
    )
    assert key(got) == key(want) and len(want) > 5


def test_streaming_hll_stateful(spark, seq_parquet, tmp_path):
    from bloomine_spark.streaming.stream_ops import hll_distinct_by_key_stream

    batch_df = spark.read.parquet(seq_parquet)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(seq_parquet)
    )
    est = hll_distinct_by_key_stream(stream, "source", "tokens")
    q = (
        est.writeStream.format("memory")
        .queryName("stream_hll")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(
        "SELECT source, max_by(est_distinct, n_rows_seen) AS est,"
        " max(n_rows_seen) AS nr FROM stream_hll GROUP BY source"
    ).toPandas()
    assert len(out) == 10
    # final streaming state must equal the batch HLL per source
    from bloomine_spark.sketch.core import estimates_df, sketch_agg

    factory = lambda: HyperLogLog.empty(12)  # noqa: E731
    batch = estimates_df(
        sketch_agg(batch_df, ["source"], "tokens", factory),
        factory, lambda h: h.estimate(), "est",
    ).toPandas().set_index("source")["est"]
    for _, row in out.iterrows():
        assert row["est"] == pytest.approx(batch[row["source"]])
    # all rows were seen
    assert out["nr"].sum() == batch_df.count()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dedup_stream keeps the FIRST occurrence per content fingerprint;
    duplicates arriving later in the stream are dropped (bounded state via
    dropDuplicatesWithinWatermark)."""
    import datetime

    import pandas as pd

    from bloomine_spark.streaming.stream_ops import dedup_stream

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # 6 docs, 2 distinct texts; duplicates arrive within the watermark
    for i in range(6):
        rows.append(
            {
                "doc_id": i,
                "text": "alpha beta" if i % 2 == 0 else "gamma delta",
                "ts": t0 + datetime.timedelta(seconds=i),
            }
        )
    src = str(tmp_path / "dsrc")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(src)
    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT text FROM dedup_out").toPandas()
    assert sorted(got["text"]) == ["alpha beta", "gamma delta"]


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """sessions_stream (native session_window, state merged across
    triggers) produces the same sessions as the batch gaps-and-islands
    events_sessionize query over the same events."""
    import __spark_entry__ as em

    from bloomine_spark.streaming.stream_ops import sessions_stream

    sf_dir = "/root/testdata/sf0.001"
    # batch oracle: (user, first-event ts, n_events, sum_value) per session
    batch = em.queries()["events_sessionize"](spark, sf_dir).toPandas()
    want = sorted(
        zip(
            batch["user_id"],
            batch["session_start"].astype(str),
            batch["n_events"],
            batch["sum_value"],
        )
    )

    # split events over several files so sessions span triggers
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "ev_src")
    ev.repartition(5).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        # files arrive in random time order, so the watermark must cover
        # the whole event-time span or out-of-order events are dropped as
        # late (that dropping is exercised separately below)
        sessions_stream(stream, gap="30 minutes", watermark="90 days")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got_pdf = spark.sql("SELECT * FROM sess_out").toPandas()
    got = sorted(
        zip(
            got_pdf["user_id"],
            got_pdf["session_start"].astype(str),
            got_pdf["n_events"],
            got_pdf["sum_value"],
        )
    )
    assert len(want) > 20
    assert got == want


def test_streaming_sessionize_drops_late_events(spark, tmp_path):
    """An event arriving later than the watermark allows is dropped: its
    session never appears (bounded state is the point of the watermark)."""
    import datetime
    import glob
    import shutil

    import pandas as pd

    from bloomine_spark.streaming.stream_ops import sessions_stream

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def _one_file(rows, name):
        d = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, str(tmp_path / "src" / (name + ".parquet")))

    (tmp_path / "src").mkdir()
    # batch 1: two events 6 hours in -> watermark advances to 5h
    _one_file(
        [
            {"user_id": 1, "ts": t0 + datetime.timedelta(hours=6), "value": 1.0},
            {"user_id": 1, "ts": t0 + datetime.timedelta(hours=6, minutes=5),
             "value": 1.0},
        ],
        "a",
    )
    schema = spark.read.parquet(str(tmp_path / "src")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    q = (
        sessions_stream(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_sess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "lck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one more on-time event — the watermark is computed from
        # the PREVIOUS batch's max event time, so this batch both runs under
        # an advanced watermark and advances it further (to 6h)
        _one_file(
            [{"user_id": 1, "ts": t0 + datetime.timedelta(hours=7),
              "value": 1.0}],
            "b",
        )
        q.processAllAvailable()
        # batch 3: an event at t0 — 6 hours behind the watermark — dropped
        _one_file([{"user_id": 1, "ts": t0, "value": 99.0}], "c")
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM late_sess").toPandas()
    assert sorted(got["sum_value"]) == [1.0, 2.0]  # the 99.0 never lands
    assert int(got["n_events"].sum()) == 3


def test_streaming_sessionize_append_mode_emits_finalized(spark, tmp_path):
    """Append mode (the production sink path) emits a session exactly once,
    only after the watermark passes its end — earlier triggers emit
    nothing for a still-open session."""
    import datetime
    import glob
    import shutil

    import pandas as pd

    from bloomine_spark.streaming.stream_ops import sessions_stream

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def _one_file(rows, name):
        d = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, str(tmp_path / "src" / (name + ".parquet")))

    (tmp_path / "src").mkdir()
    _one_file(
        [{"user_id": 1, "ts": t0, "value": 1.0},
         {"user_id": 1, "ts": t0 + datetime.timedelta(minutes=5),
          "value": 1.0}],
        "a",
    )
    schema = spark.read.parquet(str(tmp_path / "src")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    q = (
        sessions_stream(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("ap_sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ack"))
        .start()
    )
    try:
        q.processAllAvailable()
        # session [00:00, 00:35) is still open relative to the watermark:
        # nothing emitted yet
        assert spark.sql("SELECT * FROM ap_sess").count() == 0
        # an event far ahead pushes the watermark past the session end
        _one_file(
            [{"user_id": 1, "ts": t0 + datetime.timedelta(hours=6),
              "value": 1.0}],
            "b",
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM ap_sess").toPandas()
    # exactly the finalized first session; the 6h session is still open
    assert len(got) == 1
    assert int(got["n_events"].iloc[0]) == 2
    assert str(got["session_start"].iloc[0]) == "2024-01-01 00:00:00"
