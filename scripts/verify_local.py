"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names and
an order-insensitive value hash (values canonicalized: floats rounded to 9
significant-ish digits, rows sorted). Usage:

    python scripts/verify_local.py [sf_dir] [query ...]

r12 VERDICT "What's wrong" #2: two deliberate driver-parity choices here —
(a) the DuckDB side materializes through Arrow (``.arrow()``), NOT
``fetchall()``: DuckDB's native fetch returns a plain Python ``int`` for a
HUGEINT (``SUM(BIGINT)``) column, hiding the type the driver actually
hashes, while Arrow types it decimal128 → ``decimal.Decimal``;
(b) ``canon`` is TYPE-SENSITIVE across int / float / Decimal — a float
that formats integral under ``%.9g`` keeps a trailing ``.0`` and a
Decimal gets a ``decimal:`` tag, so neither collapses onto int ``3``.

Why Arrow and not pandas ``.df()``: the r12 driver evidence pins it.
``incremental_dedup`` (60 NULLs of 100 rows in its BIGINT ``matched_id``
at sf0.01 — float64 + NaN under ``.df()``, int64-with-nulls under Arrow)
was driver-GREEN, while the four hugeint-final paired rows were driver-RED.
Only the Arrow model (nullable int64 preserved; hugeint type-shifted)
reproduces both at once.
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def canon_value(v) -> str:
    """Canonicalize one cell, keeping the int/float/Decimal distinction.

    Floats format via ``%.9g`` (absorbing last-bit noise across engines)
    but integral-looking floats keep a ``.0`` marker, and Decimals (what
    an uncast DuckDB HUGEINT final becomes under Arrow) carry a
    ``decimal:`` tag — so neither collapses onto an int64 Spark column
    the way the pre-r13 canon did.
    """
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        s = f"{v:.9g}"
        if "." not in s and "e" not in s and "inf" not in s:
            s += ".0"
        return s
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("|".join(canon_value(row[i]) for i in order))
    out.sort()
    return out


def duck_rows(res):
    """Materialize a DuckDB result the way the driver does: through Arrow.

    Arrow keeps NULL-bearing integer columns int64 (matching Spark's
    collected ``int``/``None`` — driver-green in r12) but types a HUGEINT
    final decimal128, surfacing ``decimal.Decimal`` values that the
    type-sensitive canon refuses to equate with Spark's int64 (driver-red
    in r12).  Plain ``fetchall()`` would silently return exact Python
    ints for hugeint and hide the bug class entirely.
    """
    tbl = res.arrow()
    cols = list(tbl.column_names)
    rows = [tuple(r[c] for c in cols) for r in tbl.to_pylist()]
    return cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from semantic_vector_search_system_spark.session import get_spark

    spark = get_spark("verify-local", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = builder(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"PASS {name}: rows={len(rows)} (no oracle; rows-only) [{spark_t:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols, orows = duck_rows(res)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(cols) != sorted(ocols):
            ok = False
            msgs.append(f"cols {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(rows)} != {len(orows)}")
        if ok:
            a = canon(rows, cols)
            b = canon(orows, ocols)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                msgs.append(f"values differ, e.g. {diff}")
        if ok:
            print(f"PASS {name}: rows={len(rows)} [{spark_t:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
