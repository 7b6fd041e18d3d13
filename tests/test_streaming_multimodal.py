"""Structured Streaming operators + multimodal column plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.multimodal import (
    deterministic_fake_decoder,
    extract_features,
    fake_media_table,
    media_stats,
    sample_video_frames,
)
from semantic_vector_search_system_spark.operators.encode import HashingEncoder
from semantic_vector_search_system_spark.streaming.events import (
    run_stream_to_memory,
    streaming_ingest_foreach_batch,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch_hourly_counts(spark):
    from semantic_vector_search_system_spark.plans.catalog import T, hourly_event_counts
    from semantic_vector_search_system_spark.streaming.events import (
        stream_events,
        windowed_event_counts,
    )

    ev = stream_events(spark, f"{SF_DIR}/events.parquet")
    run_stream_to_memory(windowed_event_counts(ev), "t_stream_hourly")
    got = {
        (r["hour_unix"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_stream_hourly").collect()
    }
    want = {
        (r["hour_unix"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in hourly_event_counts(spark, SF_DIR).collect()
    }
    assert got == want


def test_streaming_ingest_foreach_batch(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"d{i}", f"tok{i} alpha beta") for i in range(20)], "id string, text string"
    )
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    idx_path = str(tmp_path / "stream_index")
    streaming_ingest_foreach_batch(spark, stream, HashingEncoder(dim=16), idx_path)
    out = spark.read.parquet(idx_path)
    assert out.count() == 20
    assert "vec" in out.columns


def test_media_features_deterministic(spark):
    media = fake_media_table(spark, n=12)
    feats = extract_features(media, decode_fn=deterministic_fake_decoder(dim=8))
    rows = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(rows) == 12 and all(len(v) == 8 for v in rows.values())
    rows2 = {r["media_id"]: r["features"] for r in
             extract_features(media, decode_fn=deterministic_fake_decoder(dim=8)).collect()}
    assert rows == rows2


def test_media_decode_stub_raises_without_loader(spark):
    media = fake_media_table(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        extract_features(media).collect()


def test_video_frame_sampling_plan(spark):
    media = fake_media_table(spark, n=12)
    frames = sample_video_frames(media, every_ms=10_000)
    rows = frames.collect()
    assert all(r["frame_ms"] % 10_000 == 0 for r in rows)
    n_videos = media.filter("kind = 'video'").count()
    assert frames.select("media_id").distinct().count() == n_videos


def test_media_stats_prunes_payload(spark):
    media = fake_media_table(spark, n=30)
    stats = media_stats(media)
    assert {r["kind"] for r in stats.collect()} == {"image", "audio", "video"}
    # payload must not appear in the optimized plan's scan-side projection
    plan = stats._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def test_stateful_user_totals_matches_batch(spark):
    from semantic_vector_search_system_spark.plans.catalog import T
    from semantic_vector_search_system_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
        user_totals_stateful,
    )
    import pyspark.sql.functions as F

    ev = stream_events(spark, f"{SF_DIR}/events.parquet")
    run_stream_to_memory(user_totals_stateful(ev), "t_stateful_totals", output_mode="update")
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.table("t_stateful_totals").collect()}
    want = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in T(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-3


def test_streaming_ingest_checkpoint_recovery(spark, tmp_path):
    """Exactly-once file-source semantics: re-running with the same
    checkpoint after new files arrive processes ONLY the new files."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    batch1 = spark.createDataFrame(
        [(f"a{i}", "alpha beta") for i in range(10)], "id string, text string"
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(batch1.schema).parquet(src)
        streaming_ingest_foreach_batch(spark, stream, HashingEncoder(dim=8), idx)

    run_once()
    assert spark.read.parquet(idx).count() == 10
    batch2 = spark.createDataFrame(
        [(f"b{i}", "gamma delta") for i in range(5)], "id string, text string"
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    run_once()
    out = spark.read.parquet(idx)
    assert out.count() == 15  # 10 + 5, no reprocessing duplicates
    assert out.filter(F.col("id").startswith("b")).count() == 5


def _tws_runtime_available() -> bool:
    """transformWithState's python driver worker imports protobuf; this
    container ships a broken/absent google.protobuf (verified: execution
    fails with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_user_totals_tws_plan_builds(spark):
    """The transformWithStateInPandas operator's PLAN must always build
    (API wiring, schemas, output mode) even where the runtime is gated."""
    from semantic_vector_search_system_spark.streaming.events import (
        stream_events,
        user_totals_tws,
    )

    ev = stream_events(spark, f"{SF_DIR}/events.parquet")
    out = user_totals_tws(ev)
    assert [f.name for f in out.schema.fields] == ["user_id", "n_events", "total_value"]
    assert out.isStreaming


@pytest.mark.skipif(
    not _tws_runtime_available(),
    reason="transformWithState driver worker needs google.protobuf (absent in image)",
)
def test_user_totals_tws_matches_batch(spark):
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
        user_totals_tws,
    )

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = stream_events(spark, f"{SF_DIR}/events.parquet")
        run_stream_to_memory(user_totals_tws(ev), "tws_totals", output_mode="update")
        got = {
            (r.user_id, r.n_events, r.total_value)
            for r in spark.table("tws_totals").collect()
        }
        batch = spark.read.parquet(f"{SF_DIR}/events.parquet").groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        want = {(r.user_id, r.n_events, r.total_value) for r in batch.collect()}
        assert got == want
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
