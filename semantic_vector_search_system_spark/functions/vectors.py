"""Dense-vector column expressions (SURVEY §2.7 F4–F6, F11).

Vectors are ``array<float>`` (float32 storage parity with the reference's
memmap) but all arithmetic is done in float64 — the reference's numpy
``mat.dot(q)`` accumulates in the array dtype, we deliberately accumulate in
double for numerical robustness and DuckDB-oracle agreement.

These expressions (``zip_with`` + ``aggregate``) are JVM-side and fine for
moderate fan-out; the *hot* path (millions of candidate pairs) should use
``operators.search.topk_bruteforce`` which scores with a numpy matmul inside
``mapInPandas`` (SURVEY §4: the one place SQL-only loses to BLAS).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product in float64 (reference `auto_run_tests.py:127`)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(v),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(v: Column | str, out_dtype: str = "float") -> Column:
    """``v / ||v||`` guarding the zero vector (reference `encoder.py:97-100`)."""
    vv = _c(v)
    nrm = l2_norm(vv)
    return F.when(nrm > 0, F.transform(vv, lambda x: (x.cast("double") / nrm).cast(out_dtype))).otherwise(
        F.transform(vv, lambda x: x.cast(out_dtype))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in float64; 0.0 when either norm is zero."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def pad_or_truncate(v: Column | str, dim: int) -> Column:
    """Pad with zeros / truncate to ``dim`` (reference `encoder.py:110-116`)."""
    vv = _c(v)
    padded = F.concat(vv, F.array_repeat(F.lit(0.0).cast("float"), dim))
    return F.slice(padded, 1, dim)
