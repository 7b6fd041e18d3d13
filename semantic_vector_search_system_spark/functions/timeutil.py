"""Adaptive event-timestamp normalization.

The driver-generated ``events.parquet`` has shipped with two different
physical encodings of the ``ts`` column across testdata regenerations:

* parquet ``TIMESTAMP(NANOS)`` — Spark's reader rejects it outright unless
  ``spark.sql.legacy.parquet.nanosAsLong=true``, after which it scans as
  ``LongType`` epoch-nanos;
* parquet ``timestamp[us]`` — Spark scans it as ``TimestampNTZType``.

An engine must absorb either (and a plain ``TimestampType``) without code
changes, so every events read funnels through :func:`normalize_event_ts`,
which branches on the *scanned* dtype rather than assuming one encoding.
The output contract is a single canonical form: ``ts`` is a session-local
``TIMESTAMP`` whose instant equals the stored wall-clock value interpreted
as UTC — identical to DuckDB's naive-timestamp semantics, which is what the
oracle comparisons assume. Callers pin the session timezone to UTC (see
``session.get_spark`` / ``plans.catalog.T``) so the NTZ->instant cast is
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as a canonical TIMESTAMP regardless of the
    physical parquet encoding it was scanned from (see module docstring)."""
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # nanos-as-long legacy scan: exact integer division to micros.
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        # NTZ -> instant under the UTC-pinned session == naive-as-UTC.
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if isinstance(dt, TimestampType):
        return df
    raise TypeError(
        f"events.{col} scanned as unsupported dtype {dt}; expected "
        "LongType (nanos), TimestampNTZType, or TimestampType"
    )


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read an events parquet file/dir, absorbing the NANOS encoding.

    The legacy ``TIMESTAMP(NANOS)`` encoding makes ``spark.read.parquet``
    itself raise; only then do we flip the legacy scan flag and retry, so
    the common (current-format) path performs no session mutation.
    """
    try:
        df = spark.read.parquet(path)
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    return normalize_event_ts(df)
