"""Delta Lake / Iceberg table-format connectors, gated on availability.

This image ships plain pyspark (no delta-spark package, no Iceberg runtime
jar), so every entry point here probes the classpath first and raises a
RuntimeError naming the parquet fallback (the driver's tables stay parquet;
``operators/upsert.upsert_by_key`` is the MERGE emulation). On a real
deployment with the jars present the same call sites do transactional MERGE /
time travel with no other code changes.

Why a table format matters at 100 TB: atomic commits make concurrent
index-maintenance safe (no half-written parquet directories), MERGE INTO
replaces the full-rewrite anti-join (rewrites only touched files), data
skipping / Z-ORDER bounds scan cost for selective predicates, and snapshot
time travel gives reproducible training-set versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available(spark: SparkSession) -> bool:
    """True when delta-spark's DeltaTable API is importable AND the JVM has
    the delta-core classes."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    try:
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _require(ok: bool, what: str, fallback: str) -> None:
    if not ok:
        raise RuntimeError(
            f"{what} not available in this environment (jar/package absent); "
            f"fallback: {fallback}"
        )


def write_index_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the vector index as a Delta table (atomic, versioned)."""
    _require(
        delta_available(df.sparkSession),
        "Delta Lake",
        "df.write.parquet(path) via sources.parquet_index",
    )
    df.write.format("delta").mode(mode).save(path)


def merge_upsert_delta(
    spark: SparkSession, path: str, updates: DataFrame, key: str
) -> None:
    """True MERGE INTO: same-key rows updated in place, new keys inserted.

    File-level rewrite of only the touched files — replaces the
    read-everything anti-join+union emulation (operators/upsert.upsert_by_key)
    once the Delta jars are present.
    """
    _require(
        delta_available(spark), "Delta Lake MERGE", "operators.upsert.upsert_by_key"
    )
    from delta.tables import DeltaTable

    tgt = DeltaTable.forPath(spark, path)
    (
        tgt.alias("t")
        .merge(updates.alias("u"), f"t.`{key}` = u.`{key}`")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def read_index_at_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Snapshot time travel — reproducible training-set versions."""
    _require(
        delta_available(spark),
        "Delta time travel",
        "immutable parquet snapshot directories",
    )
    return spark.read.format("delta").option("versionAsOf", version).load(path)
