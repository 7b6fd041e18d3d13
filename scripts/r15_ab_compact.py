"""Measure the r15 compact change at the bench geometry (1M x 512
float32, 64 lists): time compact_vector_index (Observation counts riding
the rewrite — ONE job) per trial, and price the two REMOVED metric-only
count jobs in the same session (the r14 form ran them around the
rewrite).  Fresh tombstones are recreated between trials by re-upserting
the bench's churn batch (untimed, exactly the bench's key shape)."""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.datagen import generate_documents
from semantic_vector_search_system_spark.operators.encode import HashingEncoderFast
from semantic_vector_search_system_spark.operators.similarity import (
    ivf_assign_fast,
    ivf_assign_inline,
    train_ivf_centroids,
)
from semantic_vector_search_system_spark.session import get_spark
from semantic_vector_search_system_spark.sources.parquet_index import (
    compact_vector_index,
    upsert_vector_index,
    write_vector_index,
)

spark = get_spark("r15-ab-compact")
spark.sparkContext.setLogLevel("ERROR")

docs = generate_documents(spark, 1_000_000, seed=42, num_partitions=32).cache()
docs.count()
enc = HashingEncoderFast(dim=512)
dvec = enc.encode(docs).select(F.col("id").alias("docid"), "vec").cache()
dvec.count()
cents = train_ivf_centroids(dvec, 64, vec_col="vec", seed=7, sample_fraction=0.02)
dl = ivf_assign_fast(dvec, cents, id_col="docid", vec_col="vec", nprobe=1).select(
    "docid", "cent_id"
)
life = tempfile.mkdtemp(prefix="r15_compact_")
idx = f"{life}/index"
write_vector_index(dvec.join(dl, "docid"), idx, partition_by="cent_id", batch=0)
churn = (
    dvec.filter(F.substring(F.col("docid"), -2, 2) == "42")
    .withColumn("vec", F.transform("vec", lambda c: -c))
    .cache()
)
churn.count()

times, count_costs = [], []
for i in range(3):
    for _ in range(3):  # bench shape: 3 churn batches before a compact
        upsert_vector_index(
            spark, idx, ivf_assign_inline(churn, cents, vec_col="vec"),
            id_col="docid", batch=None, partition_by="cent_id",
        )
    spark.sparkContext.setJobDescription(f"compact trial {i}")
    t0 = time.time()
    res = compact_vector_index(spark, idx, id_col="docid", partition_by="cent_id")
    times.append(round(time.time() - t0, 2))
    print(f"trial {i}: compact {times[-1]}s dropped={res['dropped']}", flush=True)
    # the two REMOVED jobs, priced on the post-compact index (same ~1M rows)
    t0 = time.time()
    spark.read.parquet(idx).count()
    spark.read.parquet(idx).count()
    count_costs.append(round(time.time() - t0, 2))
    print(f"trial {i}: two metric-only counts {count_costs[-1]}s", flush=True)

print("RESULT compact(new, 1 job):", times, flush=True)
print("RESULT removed count jobs :", count_costs, flush=True)
spark.stop()
shutil.rmtree(life, ignore_errors=True)
