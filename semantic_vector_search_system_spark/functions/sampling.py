"""Deterministic sampling & split assignment for training-data curation.

``rand()``-based sampling is not reproducible across retries/partitionings;
these derive everything from the pinned content hash, so a row's split is a
pure function of its id + seed — stable across runs, engines, clusters, and
incremental re-processing (new data lands in splits without reshuffling old
rows: exactly what a 100 TB training pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import stable_hash64


def split_assign(
    id_col: Column | str,
    weights: dict[str, int],
    seed: int = 0,
) -> Column:
    """Split label from integer ``weights`` (e.g. {'train': 8, 'val': 1,
    'test': 1} for 80/10/10): bucket = hash(seed:id) mod total, mapped to
    the label whose cumulative range contains it."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    total = sum(weights.values())
    bucket = F.pmod(stable_hash64(F.concat(F.lit(f"{seed}:"), c.cast("string"))), F.lit(total))
    expr = None
    cum = 0
    for label, w in weights.items():
        cond = bucket < cum + w
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        cum += w
    return expr


def deterministic_sample(df: DataFrame, id_col: str, fraction_pct: int, seed: int = 0) -> DataFrame:
    """Keep ~fraction_pct% of rows, chosen by content hash (reproducible)."""
    c = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    return df.filter(F.pmod(stable_hash64(c), F.lit(100)) < fraction_pct)
