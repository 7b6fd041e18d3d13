"""Cross-engine-safe fixed-point quantization (r10 VERDICT #1/#2).

Why this exists: Spark's ``round(double, k)`` rounds via BigDecimal
HALF_UP applied to the double's SHORTEST DECIMAL REPR, while DuckDB's
rounds via scaled-double ``std::round``.  At exact decimal ``.5``
boundaries they disagree (reproduced on this image:
``round(-4.04515, 4)`` → Spark ``-4.0452``, DuckDB ``-4.0451``).  That
is not a tail risk for the values this engine hashes: a rational whose
lowest-terms denominator carries ``2^(k+1)`` terminates EXACTLY at
``k+1`` decimals with a final digit of 5 — e.g. ``S/n`` with
``8 | n`` at k=4, or a 12-dp decimal halved at k=12 — so ``ROUND`` on
integer/decimal ratios lands on the divergent boundary with real,
data-dependent probability (the ``paired_test_components`` failure in
CORRECTNESS_r09/r10: green on /root/testdata, red on the driver's own
parquet).

The safe quantizer: ``FLOOR(x·10^k + 0.5) / 10^k``.  Multiply, add,
floor and divide are each correctly-rounded IEEE-754 operations with
NO decimal-string involvement, so given bit-identical inputs both
engines produce bit-identical outputs — deterministic BY CONSTRUCTION,
boundaries included.  (Semantics: round-half-toward-+∞; it matches
HALF_UP everywhere except exact negative half-way points, which were
engine-dependent before.)

Domain: |x|·10^k must stay below 2^53 (~9e15) so the scaled value is
exact-integer-representable — callers quantize O(1)-magnitude ratios
(scores, means, similarities), which at k=12 allows |x| up to ~9000.

Both faces MUST use the same form: :func:`quantize` for DataFrame
columns, :func:`quantize_sql` for the DuckDB oracle text.

THE THREE LAYERS of cross-engine hash determinism (r9→r13; each was a
real driver red in its round, each has a permanent gate):

1. ROUNDING (r10): never ``ROUND(double, k)`` in a hashed relation —
   use :func:`quantize`/:func:`quantize_sql` on both faces.
   Gate: tests/test_determinism_fuzz.py THIRD_DECIMAL_5 boundary fuzz.
2. DECIMAL CASTS (r11): never ``CAST(double AS DECIMAL(p,s))`` either —
   the cast itself rounds, engine-dependently.  Money runs in exact
   integer cents via :func:`quantize_cents` on both faces.
   Gate: the planted-3dp money fuzz (same file).
3. OUTPUT TYPES (r12): the driver hashes TYPE-SENSITIVELY, and DuckDB
   types ``SUM(BIGINT)`` as HUGEINT, which its Arrow/pandas
   materialization hands over as ``Decimal``/float64 while Spark emits
   int64 — value-identical faces hash apart on type alone.  RULE: every
   integer column a hashed relation EMITS gets an explicit
   ``CAST(... AS BIGINT)`` on the oracle face (CTE/window-internal
   hugeints that feed doubles are fine; NULL-bearing BIGINT finals are
   fine — r12 evidence: incremental_dedup, 60% NULL, driver-green).
   Gate: tests/test_oracle_types.py (static DESCRIBE ban on
   HUGEINT/DECIMAL/DATE finals + per-column Spark/DuckDB type-class
   agreement catalog-wide) and the type-sensitive canon in
   scripts/verify_local.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, digits: int) -> Column:
    """``FLOOR(col·10^digits + 0.5) / 10^digits`` as a Spark column
    (double-typed; Spark's FLOOR yields BIGINT, the division restores
    double — values below 2^53 survive the long→double hop exactly)."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def quantize_sql(expr: str, digits: int) -> str:
    """The identical quantizer as DuckDB SQL text for oracle twins."""
    scale = float(10**digits)
    return f"(FLOOR(({expr}) * {scale!r} + 0.5) / {scale!r})"


def quantize_cents(col: Column) -> Column:
    """``FLOOR(col·100 + 0.5)`` as an exact BIGINT of cents (r11 VERDICT
    #1/#2 — the money-column twin of :func:`quantize`).

    Why not ``CAST(col AS DECIMAL(12,2))``: that cast is ITSELF a
    cross-engine rounding op — Spark converts double→decimal via
    BigDecimal HALF_UP applied to the double's SHORTEST DECIMAL REPR
    while DuckDB rounds the scaled double, so they disagree on every
    double whose shortest repr ends in a third-decimal 5 (reproduced on
    this image: ``CAST(4.045 AS DECIMAL(12,2))`` → Spark ``4.05``,
    DuckDB ``4.04``; likewise −4.045, 0.125, 2.675, 1.005, …).  That
    divergence sat at the head of every hashed money relation and was
    the residual ``paired_test_components`` red cell in r9–r11: local
    testdata is exactly-2-dp (boundary-free, green) while the driver's
    parquet carries ≥3-dp values (red).

    ``FLOOR(x·100 + 0.5)`` is multiply + add + floor — each a
    correctly-rounded IEEE-754 op with NO decimal-string semantics —
    so both engines produce bit-identical cents from bit-identical
    doubles, boundaries included (semantics: round-half-toward-+∞,
    like :func:`quantize`).  All downstream money arithmetic then runs
    in exact integer cents; divide the FINAL double by the matching
    power of 100 — never divide before the aggregate.

    Domain: |col|·100 must stay below 2^53 (|col| ≲ 9e13 dollars).
    """
    return F.floor(col * F.lit(100.0) + F.lit(0.5))


def quantize_cents_sql(expr: str) -> str:
    """The identical cents quantizer as DuckDB SQL text (BIGINT; DuckDB
    sums BIGINT into HUGEINT so downstream aggregates stay exact)."""
    return f"CAST(FLOOR(({expr}) * 100.0 + 0.5) AS BIGINT)"
