"""Catalog-wide oracle OUTPUT-TYPE gate (r12 VERDICT #2/#4).

Layer 3 of the cross-engine determinism story (see
functions/quantize.py): after rounding (layer 1, FLOOR quantizers) and
decimal casts (layer 2, no ``CAST(double AS DECIMAL)`` in hashed
relations), the remaining way two value-identical faces can hash apart
is OUTPUT TYPE.  The r12 driver evidence pins the driver's DuckDB
materialization to the ARROW model: ``incremental_dedup`` (whose BIGINT
``matched_id`` is 60% NULL at sf0.01 — float64 under pandas ``.df()``,
int64-with-nulls under Arrow) was driver-GREEN while the four
hugeint-final paired rows were driver-RED; only Arrow reproduces both.
Under that model the lossy DuckDB output types are:

* ``HUGEINT``/``UHUGEINT`` (what ``SUM(BIGINT)`` returns) →
  decimal128 → ``decimal.Decimal`` values, type-distinct from the
  Spark face's int64.  This was the entire r9–r12 paired-family
  red-cell saga.
* ``DECIMAL`` → ``Decimal`` objects — a Spark double face would emit
  floats and mismatch (and layer 2 bans decimal finals anyway).
* ``DATE`` — matches a Spark ``DateType`` under Arrow, but banned as
  belt-and-braces: the catalog has zero date finals and a pandas-side
  driver would shift it to ``Timestamp``.

Rule enforced here: a hashed relation may emit only BIGINT/INTEGER,
DOUBLE, BOOLEAN, VARCHAR and TIMESTAMP on the oracle face — every
integer aggregate final must carry an explicit ``CAST(... AS BIGINT)``
(the green-row idiom) — and each column's type CLASS must agree with
the Spark face's schema.  NULL-bearing integer finals are explicitly
FINE (locked in by ``test_null_bearing_int_finals_stay_int``).

Would-have-caught: ``test_gate_catches_the_r12_hugeint_bug`` runs the
pre-fix ``paired_moments_probe`` oracle text through the same gate and
asserts it goes red.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semantic_vector_search_system_spark.plans.catalog import (  # noqa: E402
    CATALOG,
    catalog_oracles,
)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

#: DuckDB logical output types that pandas ``.df()`` materializes
#: lossily (type- or value-changing) relative to what the SQL text says.
LOSSY_DUCK_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL", "DATE")


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def duck_class(duck_type: str) -> str:
    """Map a DuckDB DESCRIBE type to the driver-hash-relevant class."""
    u = duck_type.upper()
    if u.startswith(("HUGEINT", "UHUGEINT")):
        return "huge"
    if u.startswith((
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    )):
        return "int"
    if u.startswith(("FLOAT", "DOUBLE", "REAL", "DECIMAL")):
        return "float"
    if u.startswith("BOOLEAN"):
        return "bool"
    return "other"


def spark_class(dt) -> str:
    from pyspark.sql import types as ST

    if isinstance(dt, (ST.ByteType, ST.ShortType, ST.IntegerType, ST.LongType)):
        return "int"
    if isinstance(dt, (ST.FloatType, ST.DoubleType)):
        return "float"
    if isinstance(dt, ST.DecimalType):
        return "decimal"
    if isinstance(dt, ST.BooleanType):
        return "bool"
    return "other"


def lossy_finals(con, sql: str) -> list[tuple[str, str]]:
    """(column, duck_type) pairs the pandas hop would corrupt."""
    desc = con.execute("DESCRIBE " + sql).fetchall()
    return [
        (c, t) for c, t, *_ in desc
        if t.upper().startswith(LOSSY_DUCK_PREFIXES)
    ]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_oracle_finals_have_no_lossy_duckdb_types(sf_dir):
    """Every oracle's OUTPUT columns must avoid HUGEINT/DECIMAL/DATE.

    DESCRIBE is data-independent, so this is cheap at every SF; it is
    the static half of the gate (the r12 bug class: an uncast
    ``SUM(BIGINT)`` final).  Window/CTE-internal hugeints that feed
    doubles are fine — only the SELECT finals matter.
    """
    con = _connect(sf_dir)
    bad = {}
    for name, sql in catalog_oracles().items():
        hits = lossy_finals(con, sql)
        if hits:
            bad[name] = hits
    assert not bad, (
        "oracle finals with pandas-lossy DuckDB types (wrap integer sums "
        f"in CAST(... AS BIGINT)): {bad}"
    )


def test_null_bearing_int_finals_stay_int():
    """Lock in the Arrow driver model on the r12 evidence.

    The three catalog rows with NULL-bearing BIGINT finals
    (``incremental_dedup.matched_id`` — 60% NULL at sf0.01 and
    driver-GREEN in r12 — plus ``crawl_e2e.new_id`` and
    ``recrawl_priority.last_change_snapshot``) must materialize through
    ``scripts.verify_local.duck_rows`` as int/None, never float.  If
    this ever starts failing, the driver's materialization model has
    changed and verify_local.duck_rows must be re-pinned against fresh
    CORRECTNESS evidence before touching any oracle.
    """
    from scripts.verify_local import duck_rows

    con = _connect(SF_DIRS[0])
    for name, col in [
        ("incremental_dedup", "matched_id"),
        ("crawl_e2e", "new_id"),
        ("recrawl_priority", "last_change_snapshot"),
    ]:
        cols, rows = duck_rows(con.execute(CATALOG[name].oracle))
        vals = [r[cols.index(col)] for r in rows]
        assert any(v is None for v in vals), f"{name}.{col}: expected NULLs"
        assert all(v is None or isinstance(v, int) for v in vals), (
            f"{name}.{col}: NULL-bearing int final no longer materializes "
            f"as int/None — driver model drift: {set(type(v) for v in vals)}"
        )


def test_spark_and_oracle_output_classes_agree(spark):
    """Per-column type-CLASS agreement between the two faces.

    For every catalog row, the Spark face's schema (analysis only — no
    jobs for the lazy builders) and the oracle's DESCRIBE must put each
    output column in the same {int, float, bool, other} class.  This is
    what makes the static gate complete: a hugeint-free oracle can
    still emit DOUBLE where Spark emits long (e.g. a ``/`` on one face
    only, or a ``COALESCE(SUM(..), 0)`` typed differently).
    """
    sf_dir = SF_DIRS[0]
    con = _connect(sf_dir)
    bad = []
    for name, sql in catalog_oracles().items():
        duck = {c: duck_class(t) for c, t, *_ in con.execute("DESCRIBE " + sql).fetchall()}
        schema = CATALOG[name].builder(spark, sf_dir).schema
        for f in schema.fields:
            sc, dc = spark_class(f.dataType), duck.get(f.name)
            if dc is None:
                bad.append((name, f.name, "missing on oracle face"))
            elif sc != dc:
                bad.append(
                    (name, f.name,
                     f"spark={sc}({f.dataType.simpleString()}) duck={dc}")
                )
    assert not bad, f"cross-face output-type class mismatches: {bad}"


# The exact pre-fix oracle text of paired_moments_probe (r12's red cell
# #3): SUM(d) / SUM(d*d) finals left uncast → HUGEINT → float64.
_R12_BUGGED_ORACLE = """
    WITH pairs AS (
      SELECT user_id,
        SUM(CASE WHEN event_type = 'view'
                 THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END) AS before_c,
        SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END) AS after_c
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY user_id
    ),
    d AS (SELECT after_c - before_c AS d FROM pairs
          WHERE before_c IS NOT NULL AND after_c IS NOT NULL)
    SELECT COUNT(d) AS n, SUM(d) AS s1_cents, SUM(d * d) AS s2_cents2
    FROM d
"""


def test_gate_catches_the_r12_hugeint_bug():
    """Would-have-caught: the pre-fix oracle goes red under this gate."""
    con = _connect(SF_DIRS[0])
    hits = lossy_finals(con, _R12_BUGGED_ORACLE)
    assert sorted(c for c, _ in hits) == ["s1_cents", "s2_cents2"]
    assert all(t.upper().startswith("HUGEINT") for _, t in hits)
    # and the shipped oracle is clean
    assert lossy_finals(con, CATALOG["paired_moments_probe"].oracle) == []


def test_local_canon_is_type_sensitive():
    """verify_local's canon must keep int 3 != float 3.0 (r12 #2).

    The pre-r13 ``%.9g``-only canon collapsed exactly the distinction
    the driver hashes; these are the cases that hid the bug.
    """
    from scripts.verify_local import canon_value, duck_rows

    assert canon_value(3) == "3"
    assert canon_value(3.0) == "3.0"              # the r12 distinction
    assert canon_value(3) != canon_value(3.0)
    assert canon_value(0.1 + 0.2) == canon_value(0.3)   # %.9g still folds
    assert canon_value(float("nan")) == "NULL"    # pandas NaN==NULL
    assert canon_value(None) == "NULL"
    assert canon_value(1.5e300) == "1.5e+300"
    # and the duckdb materialization goes through Arrow like the driver:
    # an uncast hugeint final surfaces as Decimal, canon-distinct from int
    import decimal

    con = duckdb.connect()
    cols, rows = duck_rows(
        con.execute("SELECT SUM(x) AS s FROM (VALUES (1::BIGINT),(2::BIGINT)) t(x)")
    )
    assert cols == ["s"] and isinstance(rows[0][0], decimal.Decimal)
    assert canon_value(rows[0][0]) == "decimal:3" != canon_value(3)
