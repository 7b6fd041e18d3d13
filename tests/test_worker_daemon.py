"""Python-worker daemon preload wiring (session.py + worker_daemon.py).

The preload itself is a perf feature (forked workers inherit the
scientific stack copy-on-write); these tests pin the wiring — module
importability, conf propagation, and that python UDF tasks execute
through the custom daemon — so a rename or packaging change can't
silently fall back to cold-import workers.
"""

from __future__ import annotations

import importlib
import os


def test_worker_daemon_module_imports_cleanly():
    # Importing must NOT start the manager loop (that only runs under
    # __main__) and must expose the stock daemon's manager.
    mod = importlib.import_module(
        "semantic_vector_search_system_spark.worker_daemon"
    )
    assert callable(mod.manager)


def test_session_wires_daemon_module_and_pythonpath(spark):
    assert (
        spark.conf.get("spark.python.daemon.module")
        == "semantic_vector_search_system_spark.worker_daemon"
    )
    # the package parent must be importable by the daemon interpreter
    import semantic_vector_search_system_spark as pkg

    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    assert pkg_parent in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def test_python_udf_tasks_run_through_custom_daemon(spark):
    """If the daemon module failed to import, every python task would fail —
    this is the end-to-end smoke that the custom daemon serves tasks."""
    import pandas as pd

    def probe(batches):
        import sys

        ok = "pandas" in sys.modules  # inherited or serializer-imported
        for _ in batches:
            pass
        yield pd.DataFrame({"ok": [ok]})

    rows = spark.range(0, 1, 1, 1).mapInPandas(probe, schema="ok boolean").collect()
    assert rows[0]["ok"] is True
