"""Keyed upsert (MERGE emulation) for parquet-backed tables.

Spark without Delta/Iceberg has no MERGE INTO; the standard emulation is
anti-join + union: updates win over current rows on key collision, inserts
pass through. One shuffle on the key (or zero with co-bucketed tables).
Used for vector-index maintenance: re-encoded documents replace their old
vectors, new documents append (pairs with dedup.incremental_new_docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_by_key(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``current``; others kept.

    Schemas must match (unionByName). MERGE-emulation shape:
    ``updates UNION (current ANTI-JOIN updates ON key)``.
    """
    survivors = current.join(updates.select(key), key, "left_anti")
    return updates.unionByName(survivors)
