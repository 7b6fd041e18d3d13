"""Kafka source and Delta/Iceberg connector gating tests.

Neither the spark-sql-kafka jar nor delta-spark is in this image, so these
verify (a) the availability probes answer False cleanly, (b) entry points
raise the documented RuntimeError naming the fallback, and (c) the Kafka
payload parsing — pure column expressions — is correct on a batch stand-in
with Kafka's wire schema. If a future image has the jars, the gated branches
run instead and the real paths get exercised.
"""

from __future__ import annotations

import datetime

import pytest

from semantic_vector_search_system_spark.sources import delta as delta_src
from semantic_vector_search_system_spark.streaming import kafka as k


def test_kafka_parse_event_payload_batch(spark):
    rows = [
        (
            b"7",
            b'{"event_id": 1, "user_id": 7, "event_type": "click", '
            b'"value": 1.5, "ts": "2026-01-02T03:04:05Z"}',
        ),
        (b"8", b'{"event_id": 2, "user_id": 8, "event_type": "view", '
               b'"value": 0.25, "ts": "2026-01-02T04:00:00Z"}'),
        (b"9", b"not json at all"),
    ]
    raw = spark.createDataFrame(rows, "key binary, value binary")
    out = k.parse_event_payload(raw).orderBy("event_id").collect()
    assert [r.event_id for r in out] == [None, 1, 2] or [
        r.event_id for r in out
    ] == [1, 2, None]
    good = {r.event_id: r for r in out if r.event_id is not None}
    assert good[1].user_id == 7 and good[1].event_type == "click"
    assert good[1].value == 1.5
    assert good[1].ts == datetime.datetime(2026, 1, 2, 3, 4, 5)
    assert good[2].value == 0.25
    bad = [r for r in out if r.event_id is None]
    assert len(bad) == 1 and bad[0].event_type is None  # malformed -> nulls


def test_kafka_source_gated(spark):
    if k.kafka_available(spark):
        pytest.skip("kafka connector present; gating path not applicable")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        k.stream_events_kafka(spark, "localhost:9092", "events")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        k.write_events_kafka(
            spark.createDataFrame(
                [], "event_id long, user_id long, event_type string, "
                    "value double, ts timestamp"
            ),
            "localhost:9092",
            "events",
            "/tmp/nope",
        )


def test_delta_gated_with_parquet_fallback(spark, tmp_path):
    if delta_src.delta_available(spark):
        pytest.skip("delta present; gating path not applicable")
    df = spark.range(3).withColumnRenamed("id", "vec_id")
    with pytest.raises(RuntimeError, match="parquet_index"):
        delta_src.write_index_delta(df, str(tmp_path / "d"))
    with pytest.raises(RuntimeError, match="upsert_by_key"):
        delta_src.merge_upsert_delta(spark, str(tmp_path / "d"), df, "vec_id")
    with pytest.raises(RuntimeError, match="snapshot"):
        delta_src.read_index_at_version(spark, str(tmp_path / "d"), 0)

    # the documented fallback works on plain parquet
    from semantic_vector_search_system_spark.operators.upsert import upsert_by_key

    cur = spark.createDataFrame([(1, "a"), (2, "b")], "vec_id long, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "C")], "vec_id long, v string")
    got = {(r.vec_id, r.v) for r in upsert_by_key(cur, upd, "vec_id").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "C")}


def test_iceberg_probe_answers(spark):
    assert delta_src.iceberg_available(spark) in (True, False)
