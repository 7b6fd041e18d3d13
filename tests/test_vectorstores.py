"""Weaviate/Pinecone sink wrappers (reference weaviate/client.py,
pinecone/client.py) against file-backed fakes: the services and client libs
are absent in this image, so the fakes implement exactly the client surface
the wrappers call, and file-backed state makes executor-side writes
observable from the driver (same pattern as test_foreach_partition_sink).

The fake classes are defined INSIDE the factory closures so cloudpickle
serializes them by value — executors cannot import this test module.
"""

import json
import os

import pytest

from semantic_vector_search_system_spark.sources.vectorstores import (
    WEAVIATE_DOCUMENT_PROPERTIES,
    PineconeSink,
    WeaviateSink,
    ingest_report,
)


def _weaviate_factory(out_dir):
    def make():
        import json as _json
        import os as _os
        import uuid as _uuid

        class Schema:
            def delete_class(self, name):
                raise RuntimeError("class does not exist")  # must be tolerated

            def create_class(self, class_obj):
                with open(_os.path.join(out_dir, "schema.jsonl"), "a") as f:
                    f.write(_json.dumps({"op": "create_class", "obj": class_obj}) + "\n")

        class Batch:
            def __init__(self):
                self.path = _os.path.join(out_dir, f"w_{_uuid.uuid4().hex}.jsonl")
                self.buf = []

            def __enter__(self):
                return self

            def add_data_object(self, properties, class_name, uuid, vector):
                self.buf.append(
                    {"id": uuid, "class": class_name, "props": properties,
                     "dim": len(vector)}
                )

            def __exit__(self, *exc):
                with open(self.path, "a") as f:
                    for obj in self.buf:
                        f.write(_json.dumps(obj) + "\n")
                self.buf = []
                return False

        class Client:
            def __init__(self):
                self.schema = Schema()
                self.batch = Batch()

        return Client()

    return make


def _pinecone_factory(out_dir):
    def make():
        import json as _json
        import os as _os
        import uuid as _uuid

        registry = _os.path.join(out_dir, "indexes.json")

        class Index:
            def __init__(self, name):
                self.path = _os.path.join(out_dir, f"p_{_uuid.uuid4().hex}.jsonl")
                self.name = name

            def upsert(self, vectors):
                with open(self.path, "a") as f:
                    for vid, vec, meta in vectors:
                        f.write(_json.dumps(
                            {"id": vid, "dim": len(vec), "meta": meta}) + "\n")

        class Pinecone:
            def list_indexes(self):
                if not _os.path.exists(registry):
                    return []
                with open(registry) as f:
                    return _json.load(f)

            def create_index(self, name, dimension, metric="cosine"):
                names = self.list_indexes() + [name]
                with open(registry, "w") as f:
                    _json.dump(names, f)

            def delete_index(self, name):
                names = [n for n in self.list_indexes() if n != name]
                with open(registry, "w") as f:
                    _json.dump(names, f)

            def Index(self, name):
                return Index(name)

        return Pinecone()

    return make


def _read_jsonl_dir(out_dir, prefix):
    rows = []
    for fname in os.listdir(out_dir):
        if fname.startswith(prefix):
            with open(os.path.join(out_dir, fname)) as f:
                rows.extend(json.loads(line) for line in f)
    return rows


def _vectors_df(spark, n=10, dim=4):
    rows = [
        (f"d{i}", [float(i)] * dim, f"text {i}", "news", "2024-01-01", "synthetic")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "id string, vec array<float>, text string, category string, "
        "timestamp string, source string",
    ).repartition(3)


# ---------------------------------------------------------------------------
# Weaviate
# ---------------------------------------------------------------------------

def test_weaviate_schema_matches_reference_shape(tmp_path):
    out_dir = str(tmp_path)
    sink = WeaviateSink(client_factory=_weaviate_factory(out_dir))
    sink.ensure_schema()  # delete raises in the fake; must be tolerated
    ops = _read_jsonl_dir(out_dir, "schema")
    assert len(ops) == 1
    obj = ops[0]["obj"]
    assert obj["class"] == "Document"
    assert obj["vectorizer"] == "none"
    assert obj["properties"] == WEAVIATE_DOCUMENT_PROPERTIES
    assert obj["vectorIndexConfig"]["hnsw"] == {"m": 32, "efConstruction": 128}


def test_weaviate_batched_ingest_and_timings(spark, tmp_path):
    out_dir = str(tmp_path)
    sink = WeaviateSink(client_factory=_weaviate_factory(out_dir), batch_size=4)
    timings = sink.ingest(_vectors_df(spark, n=10)).collect()
    inserted = _read_jsonl_dir(out_dir, "w_")
    assert {r["id"] for r in inserted} == {f"d{i}" for i in range(10)}
    assert all(r["class"] == "Document" and r["dim"] == 4 for r in inserted)
    # properties carried through, vec/id excluded from props
    props = {r["id"]: r["props"] for r in inserted}
    assert props["d3"] == {
        "text": "text 3", "category": "news",
        "timestamp": "2024-01-01", "source": "synthetic",
    }
    # timing rows: one per batch, batches respect batch_size, cover all rows
    assert sum(t["inserted"] for t in timings) == 10
    assert all(1 <= t["inserted"] <= 4 for t in timings)
    assert all(t["batch_end"] >= t["batch_start"] for t in timings)


def test_weaviate_default_factory_raises_clearly():
    sink = WeaviateSink.connect(url="http://localhost:8080")
    with pytest.raises(RuntimeError, match="weaviate-client is not installed"):
        sink.client_factory()


# ---------------------------------------------------------------------------
# Pinecone
# ---------------------------------------------------------------------------

def test_pinecone_index_lifecycle(tmp_path):
    out_dir = str(tmp_path)
    factory = _pinecone_factory(out_dir)
    sink = PineconeSink(client_factory=factory, index_name="docs")
    sink.create_index(dimension=4)
    assert factory().list_indexes() == ["docs"]
    sink.create_index(dimension=4)  # idempotent: no duplicate
    assert factory().list_indexes() == ["docs"]
    sink.delete_index()
    assert factory().list_indexes() == []
    sink.delete_index()  # absent: no-op


def test_pinecone_batched_upsert_with_metadata(spark, tmp_path):
    out_dir = str(tmp_path)
    sink = PineconeSink(
        client_factory=_pinecone_factory(out_dir), index_name="docs", batch_size=3
    )
    timings = sink.ingest(
        _vectors_df(spark, n=8), metadata_cols=("category", "source")
    )
    report = ingest_report(timings, db="pinecone", batch_size=3)
    upserts = _read_jsonl_dir(out_dir, "p_")
    assert {r["id"] for r in upserts} == {f"d{i}" for i in range(8)}
    assert upserts[0]["meta"] == {"category": "news", "source": "synthetic"}
    assert report["total_items"] == 8
    assert report["db"] == "pinecone"
    assert report["batch_size"] == 3
    assert report["overall_throughput_vps"] is None or report["overall_throughput_vps"] > 0


def test_pinecone_default_factory_raises_clearly(monkeypatch):
    monkeypatch.delenv("PINECONE_API_KEY", raising=False)
    monkeypatch.delenv("PINECONE_ENV", raising=False)
    sink = PineconeSink.connect()
    with pytest.raises(RuntimeError, match="pinecone client is not installed"):
        sink.client_factory()
