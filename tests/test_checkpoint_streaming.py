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
