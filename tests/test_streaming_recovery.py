"""Checkpoint recovery: a streaming query stopped and RESTARTED from the
same checkpoint must process new data exactly once and never reprocess
committed batches — the durability half of the streaming contract (the
logic half is covered by the batch-twin tests)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from bigdatawork_spark.io import load
from bigdatawork_spark.streaming.stream_ops import _fresh_dir, _read_stream


def _drain_to_parquet(spark, src, chk, out):
    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        _read_stream(spark, src)
        .select("event_id", "user_id", "value")
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_recovery_exactly_once(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    src, chk, out = _fresh_dir("rec-src"), _fresh_dir("rec-chk"), _fresh_dir("rec-out")

    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    first.coalesce(1).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, chk, out)
    n_first = first.count()
    assert spark.read.parquet(out).count() == n_first

    # new file lands while the query is DOWN; restart from the checkpoint
    time.sleep(0.05)  # distinct mtime
    second.coalesce(1).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, chk, out)

    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # second half once, first half NOT redone
    # content-level exactly-once: every event id appears exactly once
    assert got.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0


def test_checkpoint_restart_without_new_data_is_noop(spark, sf_dir):
    ev = load(spark, sf_dir, "events").limit(500)
    src, chk, out = _fresh_dir("noop-src"), _fresh_dir("noop-chk"), _fresh_dir("noop-out")
    ev.coalesce(1).write.mode("append").parquet(src)
    _drain_to_parquet(spark, src, chk, out)
    n = spark.read.parquet(out).count()
    _drain_to_parquet(spark, src, chk, out)  # restart, nothing new
    assert spark.read.parquet(out).count() == n
