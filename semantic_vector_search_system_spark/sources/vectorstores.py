"""Concrete Weaviate / Pinecone sink wrappers over the generic
``foreach_partition_sink`` connector pattern (SURVEY §2.1 S8/S9).

Reproduces the reference's client surface Spark-first:

* Weaviate (`weaviate/client.py:31-79`): ``Document`` class schema with
  delete-if-exists + create (HNSW ``m``/``efConstruction`` knobs), then
  batched ``add_data_object`` inserts with per-batch ``(t0, t1, n)``
  timing records.
* Pinecone (`pinecone/client.py:47-90`): ``create_index`` (idempotent) /
  ``delete_index`` + batched ``upsert`` of ``(id, vector, metadata)``
  tuples with the same timing-record shape. The reference parallelizes
  batches with a ThreadPoolExecutor; here Spark task parallelism does that
  (one client per executor task, ST5).

Neither service nor client library exists in this image, so both wrappers
are gated exactly like streaming/kafka.py: the default client factory
probes for the installed package and raises a clear, actionable error;
tests inject in-memory fakes and exercise the full schema / upsert /
timing path batch-side.

Scale note (100 TB): the driver never sees the vectors — each executor
task opens its own connection and streams its partition in ``batch_size``
chunks, so ingest throughput scales with executor count and the only
driver traffic is the per-batch timing rows (3 scalars per batch).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Iterator

from pyspark.sql import DataFrame

TIMING_SCHEMA = "batch_start double, batch_end double, inserted long"

#: Reference HNSW vector-index knobs (`weaviate/client.py:47-55`): M caps
#: graph connectivity (recall vs RAM/ingest cost), efConstruction the
#: build-time beam width.
WEAVIATE_HNSW_CONFIG = {"m": 32, "efConstruction": 128}

#: Reference `Document` class properties (`weaviate/client.py:38-46`).
WEAVIATE_DOCUMENT_PROPERTIES = [
    {"name": "text", "dataType": ["text"]},
    {"name": "category", "dataType": ["text"]},
    {"name": "timestamp", "dataType": ["date"]},
    {"name": "source", "dataType": ["text"]},
]


def _default_weaviate_factory(url: str, api_key: str | None) -> Callable[[], object]:
    def make():
        try:
            import weaviate  # noqa: F401
        except ImportError as exc:
            raise RuntimeError(
                "weaviate-client is not installed in this image; pass "
                "client_factory= (tests use an in-memory fake) or install "
                "the client to reach a real instance"
            ) from exc
        auth = weaviate.AuthApiKey(api_key) if api_key else None
        return weaviate.Client(url, auth_client=auth)

    return make


def _default_pinecone_factory(api_key: str | None, environment: str | None) -> Callable[[], object]:
    def make():
        try:
            import pinecone  # noqa: F401
        except ImportError as exc:
            raise RuntimeError(
                "pinecone client is not installed in this image; pass "
                "client_factory= (tests use an in-memory fake) or install "
                "the client to reach a real index"
            ) from exc
        if not api_key or not environment:
            raise RuntimeError("set PINECONE_API_KEY / PINECONE_ENV to use a real index")
        pinecone.init(api_key=api_key, environment=environment)
        return pinecone

    return make


@dataclass
class WeaviateSink:
    """`weaviate/client.py` surface: schema management + batched vector
    ingest from a DataFrame with columns ``(id, vec, text, category,
    timestamp, source)`` (extra columns ignored)."""

    client_factory: Callable[[], object]
    class_name: str = "Document"
    batch_size: int = 128
    hnsw: dict = field(default_factory=lambda: dict(WEAVIATE_HNSW_CONFIG))

    @classmethod
    def connect(cls, url: str = "http://localhost:8080", api_key: str | None = None, **kw):
        return cls(client_factory=_default_weaviate_factory(url, api_key), **kw)

    def class_object(self) -> dict:
        """The reference's class schema dict (`weaviate/client.py:38-55`):
        vectorizer "none" (precomputed vectors) + HNSW index config."""
        return {
            "class": self.class_name,
            "vectorizer": "none",
            "properties": [dict(p) for p in WEAVIATE_DOCUMENT_PROPERTIES],
            "vectorIndexConfig": {"hnsw": dict(self.hnsw)},
        }

    def ensure_schema(self) -> None:
        """Delete-if-exists then create (`create_schema`,
        `weaviate/client.py:31-57`). Driver-side: schema DDL is one call,
        not per-partition."""
        client = self.client_factory()
        try:
            client.schema.delete_class(self.class_name)
        except Exception:
            pass  # absent class: same terminal state (reference does the same)
        client.schema.create_class(self.class_object())

    def ingest(self, vectors: DataFrame, vec_col: str = "vec", id_col: str = "id") -> DataFrame:
        """Batched insert with per-batch timing records
        (`batch_insert_documents`, `weaviate/client.py:60-79`).

        Returns a ``(batch_start, batch_end, inserted)`` DataFrame — the
        reference's ``timings`` list, distributed. Timings are produced in
        the same pass as the writes (mapInPandas), not a second job.
        """
        class_name, batch_size = self.class_name, self.batch_size
        factory = self.client_factory
        prop_names = [p["name"] for p in WEAVIATE_DOCUMENT_PROPERTIES]
        cols = [id_col, vec_col] + [c for c in prop_names if c in vectors.columns]

        def write_batches(pdfs: Iterator) -> Iterator:
            import pandas as pd

            client = factory()
            for pdf in pdfs:
                for lo in range(0, len(pdf), batch_size):
                    chunk = pdf.iloc[lo : lo + batch_size]
                    t0 = time.time()
                    with client.batch as b:
                        for row in chunk.itertuples(index=False):
                            d = row._asdict()
                            props = {k: d[k] for k in prop_names if k in d}
                            b.add_data_object(
                                props, class_name=class_name,
                                uuid=d[id_col], vector=list(d[vec_col]),
                            )
                    yield pd.DataFrame(
                        {"batch_start": [t0], "batch_end": [time.time()],
                         "inserted": [len(chunk)]}
                    )

        return vectors.select(*cols).mapInPandas(write_batches, schema=TIMING_SCHEMA)


@dataclass
class PineconeSink:
    """`pinecone/client.py` surface: index lifecycle + batched upsert of
    ``(id, vector, metadata)`` tuples."""

    client_factory: Callable[[], object]
    index_name: str = "docs"
    batch_size: int = 128

    @classmethod
    def connect(cls, api_key: str | None = None, environment: str | None = None, **kw):
        import os

        return cls(
            client_factory=_default_pinecone_factory(
                api_key or os.environ.get("PINECONE_API_KEY"),
                environment or os.environ.get("PINECONE_ENV"),
            ),
            **kw,
        )

    def create_index(self, dimension: int, metric: str = "cosine"):
        """Idempotent create (`create_index`, `pinecone/client.py:47-53`);
        returns the index handle."""
        pc = self.client_factory()
        if self.index_name not in pc.list_indexes():
            pc.create_index(self.index_name, dimension=dimension, metric=metric)
        return pc.Index(self.index_name)

    def delete_index(self) -> None:
        """`delete_index` (`pinecone/client.py:56-58`)."""
        pc = self.client_factory()
        if self.index_name in pc.list_indexes():
            pc.delete_index(self.index_name)

    def ingest(
        self,
        vectors: DataFrame,
        vec_col: str = "vec",
        id_col: str = "id",
        metadata_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """Batched ``index.upsert`` with per-batch timings
        (`batch_upsert`, `pinecone/client.py:61-90`). Executor-task
        parallelism replaces the reference's ThreadPoolExecutor (ST5);
        returns the same ``(t0, t1, n)`` record shape as a DataFrame.
        """
        index_name, batch_size = self.index_name, self.batch_size
        factory = self.client_factory
        cols = [id_col, vec_col, *metadata_cols]

        def write_batches(pdfs: Iterator) -> Iterator:
            import pandas as pd

            index = factory().Index(index_name)
            for pdf in pdfs:
                for lo in range(0, len(pdf), batch_size):
                    chunk = pdf.iloc[lo : lo + batch_size]
                    items = [
                        (
                            d[id_col],
                            list(d[vec_col]),
                            {k: d[k] for k in metadata_cols} or None,
                        )
                        for d in (r._asdict() for r in chunk.itertuples(index=False))
                    ]
                    t0 = time.time()
                    index.upsert(vectors=items)
                    yield pd.DataFrame(
                        {"batch_start": [t0], "batch_end": [time.time()],
                         "inserted": [len(items)]}
                    )

        return vectors.select(*cols).mapInPandas(write_batches, schema=TIMING_SCHEMA)


def ingest_report(timings: DataFrame, db: str, batch_size: int) -> dict:
    """Reference ingest summary (`ingest.py:13-29` /
    `auto_run_tests.py:474-475`): totals + overall throughput from the
    per-batch timing rows (tiny aggregate — safe to collect)."""
    from pyspark.sql import functions as F

    row = timings.agg(
        F.sum("inserted").alias("total_items"),
        F.sum(F.col("batch_end") - F.col("batch_start")).alias("busy_s"),
        F.min("batch_start").alias("t0"),
        F.max("batch_end").alias("t1"),
    ).collect()[0]
    total_time = (row["t1"] - row["t0"]) if row["t0"] is not None else 0.0
    return {
        "total_items": row["total_items"] or 0,
        "total_time_s": round(total_time, 6),
        "overall_throughput_vps": (
            round(row["total_items"] / total_time, 3) if total_time > 0 else None
        ),
        "db": db,
        "batch_size": batch_size,
    }
