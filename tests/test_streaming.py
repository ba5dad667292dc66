"""Structured Streaming surface: AvailableNow incremental encode (new files
picked up exactly once across restarts) and the watermarked daily rollup."""

import os
import shutil

import pytest

from poc_parquet_aggregator_spark.encode import decode_verify, read_manifest
from poc_parquet_aggregator_spark.plans import get_spark
from poc_parquet_aggregator_spark.sources import write_token_table
from poc_parquet_aggregator_spark.streaming import encode_stream, streaming_daily_rollup


@pytest.fixture(scope="module")
def spark():
    return get_spark(
        "streaming_tests", cores=4, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )


def test_incremental_encode_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    write_token_table(src, 2000, docs_per_file=1000)
    s1 = encode_stream(spark, src, out)
    assert s1["files"] == 2
    assert decode_verify(spark, src, out)["bit_identical"]
    # new files arrive → only they are processed on the next AvailableNow run
    write_token_table(src, 4000, docs_per_file=1000)  # adds files 2,3 (0,1 identical)
    s2 = encode_stream(spark, src, out)
    assert s2["files"] == 2  # stream checkpoint skips already-seen files
    assert len(read_manifest(out)) == 4
    assert decode_verify(spark, src, out)["bit_identical"]
    # restart with nothing new → no batches
    s3 = encode_stream(spark, src, out)
    assert s3["files"] == 0


def test_streaming_daily_rollup_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.write.mode("overwrite").parquet(events_dir)

    sdf = streaming_daily_rollup(spark, events_dir, str(tmp_path / "ckpt"))
    q = (
        sdf.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["usage_date"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("select * from rollup_test").collect()
    }
    expect = {
        (r["usage_date"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in (
            src.groupBy(
                F.to_date("ts").cast("string").alias("usage_date"), "event_type"
            )
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
            .collect()
        )
    }
    assert got == expect
