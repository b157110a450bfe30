import datetime as dt

from pyspark.sql import functions as F

from graphrag_kb_server_spark.corpus import generate
from graphrag_kb_server_spark.streaming.incremental import (
    run_incremental,
    windowed_event_counts,
)


def test_availablenow_incremental(spark, tmp_out):
    src = f"{tmp_out}/stream_src"
    out = f"{tmp_out}/stream_out"
    generate(spark, 30).write.mode("overwrite").parquet(src)
    n1 = run_incremental(spark, src, out, f"{tmp_out}/ckpt1")
    assert n1 >= 1
    docs1 = spark.read.parquet(f"{out}/documents_stream")
    assert docs1.count() == 30
    # replay with a fresh checkpoint: doc_status dedup keeps it idempotent
    run_incremental(spark, src, out, f"{tmp_out}/ckpt2")
    assert spark.read.parquet(f"{out}/documents_stream").count() == 30


def test_windowed_event_counts_batch(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 1), "click", 1.0),
        (2, dt.datetime(2024, 1, 1, 0, 2), "click", 2.0),
        (3, dt.datetime(2024, 1, 1, 0, 7), "click", 3.0),
    ]
    ev = spark.createDataFrame(rows, "event_id int, ts timestamp, event_type string, value double")
    out = {
        (r["win"]["start"].minute, r["event_type"]): (r["n"], r["v"])
        for r in windowed_event_counts(ev).collect()
    }
    assert out[(0, "click")] == (2, 3.0)
    assert out[(5, "click")] == (1, 3.0)
