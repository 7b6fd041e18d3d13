"""Regression coverage for the events.ts physical-encoding flip.

Round 2 regressed because the driver regenerated events.parquet with
``timestamp[us]`` (scanned as TIMESTAMP_NTZ) while the reader assumed the
round-1 ``TIMESTAMP(NANOS)`` encoding. These tests pin the contract that
both encodings — plus a plain TIMESTAMP column — normalize to the same
canonical instants, through both the batch reader and the streaming scan,
so a future format flip fails here with a named assertion instead of
taking out a third of the correctness gate.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from semantic_vector_search_system_spark.functions.timeutil import (
    normalize_event_ts,
    read_events,
)

WALL = [
    dt.datetime(2024, 1, 1, 0, 9, 58, 778549),
    dt.datetime(2024, 3, 15, 12, 0, 0, 1),
    dt.datetime(2024, 12, 31, 23, 59, 59, 999999),
]


def _write(tmpdir, name: str, ts_array: pa.Array) -> str:
    path = f"{tmpdir}/{name}.parquet"
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, path, version="2.6")
    return path


@pytest.fixture(scope="module")
def encoded_paths(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("events_encodings")
    return {
        "micros_ntz": _write(tmpdir, "events_us", pa.array(WALL, pa.timestamp("us"))),
        "nanos": _write(tmpdir, "events_ns", pa.array(WALL, pa.timestamp("ns"))),
    }


def _collect_ts(df):
    rows = df.orderBy("event_id").collect()
    return [r.ts for r in rows]


def test_both_encodings_normalize_to_identical_instants(spark, encoded_paths):
    """timestamp[us]/NTZ and TIMESTAMP(NANOS) files must produce the exact
    same canonical TIMESTAMP values through read_events."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got_us = _collect_ts(read_events(spark, encoded_paths["micros_ntz"]))
    got_ns = _collect_ts(read_events(spark, encoded_paths["nanos"]))
    assert got_us == got_ns == WALL


def test_normalize_passthrough_for_plain_timestamp(spark, encoded_paths):
    """An already-canonical TIMESTAMP column is left untouched."""
    df = read_events(spark, encoded_paths["micros_ntz"])
    assert normalize_event_ts(df) is df or _collect_ts(normalize_event_ts(df)) == WALL


def test_normalize_rejects_unabsorbable_dtype(spark):
    df = spark.createDataFrame([(1, "2024-01-01")], "event_id long, ts string")
    with pytest.raises(TypeError, match="unsupported dtype"):
        normalize_event_ts(df)


def test_streaming_scan_matches_batch_for_both_encodings(spark, encoded_paths):
    """stream_events must normalize exactly like batch read_events for each
    encoding (the r2 regression hit both paths)."""
    from semantic_vector_search_system_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
    )

    for key, tbl in (("micros_ntz", "enc_us_probe"), ("nanos", "enc_ns_probe")):
        ev = stream_events(spark, encoded_paths[key])
        run_stream_to_memory(ev.select("event_id", "ts"), tbl, output_mode="append")
        got = [r.ts for r in spark.table(tbl).orderBy("event_id").collect()]
        assert got == WALL, key


def test_schema_guard_flags_reshaped_events(tmp_path):
    """The conftest schema snapshot must name the offending column when the
    driver regenerates events in a shape the engine does not absorb."""
    from tests.conftest import check_testdata_schemas

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        import shutil

        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", tmp_path / f"{t}.parquet")
    # events with ts as epoch-int64 — a shape timeutil does NOT absorb from
    # a plain scan (the long branch only applies to the legacy NANOS flag)
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1704047998778549000], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    problems = check_testdata_schemas(str(tmp_path))
    assert any("events.ts" in p and "int64" in p for p in problems), problems
    # and the real testdata passes clean
    assert check_testdata_schemas("/root/testdata/sf0.001") == []
