"""Int8 scalar quantization for embedding columns + two-stage retrieval.

The vector-index scale path: an int8 index is 4x smaller than float32 (the
reference stores 3.07 GiB for 1M x 768 float32, PROJECT_DETAILED.txt:101 —
int8 would be 0.77 GiB), integer dot products are cheap, and a final exact
rerank on the float vectors restores accuracy. Standard two-stage ANN
(quantized candidate scan -> exact rerank), expressed relationally:

* quantization scale is a GLOBAL max-abs (one tiny agg), so quantized codes
  are deterministic and comparable across rows/engines;
* candidate generation: int-dot top-``candidates`` per query;
* rerank: exact cosine over the candidate set only.

Everything is JVM-side expressions (zip_with/aggregate over small arrays) —
acceptable here because candidate arrays are dim<=few-hundred; for the bulk
scan path at 100 TB pair this with the mapInPandas matmul kernel of
operators/search.py applied to the int8 matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def global_max_abs(emb: DataFrame, vec_col: str = "embedding") -> float:
    """Global max |component| — the quantization scale denominator."""
    row = emb.agg(
        F.max(F.aggregate(vec_col, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double")))))
    ).collect()[0]
    return float(row[0])


def quantize_expr(vec_col, scale: float):
    """``round(x * 127 / scale)`` per component, int — symmetric int8 range."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.round(x.cast("double") * 127.0 / scale).cast("int"))


def int_dot(a, b):
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ac, bc, lambda x, y: (x * y).cast("long")), F.lit(0).cast("long"), lambda s, x: s + x
    )


def quantized_topk_rerank(
    queries: DataFrame,
    docs: DataFrame,
    scale: float,
    k: int = 5,
    candidates: int = 20,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    id_col: str = "docid",
    vec_col: str = "vec",
) -> DataFrame:
    """Two-stage retrieval: int8-dot top-``candidates`` -> exact cosine
    top-``k`` rerank. Returns (qid, docid, rank, score)."""
    q = queries.withColumn("qq", quantize_expr(qvec_col, scale))
    d = docs.withColumn("dq", quantize_expr(vec_col, scale))
    coarse = (
        F.broadcast(q.select(qid_col, qvec_col, "qq"))
        .crossJoin(d.select(id_col, vec_col, "dq"))
        .withColumn("idot", int_dot("qq", "dq"))
    )
    w1 = Window.partitionBy(qid_col).orderBy(F.desc("idot"), F.asc(id_col))
    cand = coarse.withColumn("crank", F.row_number().over(w1)).filter(
        F.col("crank") <= candidates
    )
    rer = cand.withColumn("score", cosine_similarity(qvec_col, vec_col))
    w2 = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "rank", "score")
    )
