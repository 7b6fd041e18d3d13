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


def test_quiet_shutdown_patches_installed():
    """The r5 quiet-shutdown wiring is in place: worker() wrapped to treat
    connection teardown as a clean exit, the mis-parsed truthy
    KILL_WORKER_ON_FLUSH_FAILURE env var dropped, and the daemon module's
    print shadowed to drop the benign flush-failure block (BENCH_r04
    parsed:null postmortem)."""
    import pyspark.daemon as _daemon

    mod = importlib.import_module(
        "semantic_vector_search_system_spark.worker_daemon"
    )
    assert _daemon.worker is mod._quiet_worker
    assert _daemon.print is mod._daemon_print
    assert "PYTHON_DAEMON_KILL_WORKER_ON_FLUSH_FAILURE" not in os.environ
    # the filter drops exactly the flush-failure message, passes others
    captured = []
    orig = mod._stock_print
    mod._stock_print = lambda *a, **k: captured.append(a)
    try:
        mod._daemon_print(
            "PySpark daemon failed to flush the output to the worker process:\n..."
        )
        mod._daemon_print("anything else")
    finally:
        mod._stock_print = orig
    assert captured == [("anything else",)]


def test_pyspark_version_pinned_for_daemon_patches():
    """Both daemon patches (the worker() wrapper and the print shadow) key on
    pyspark 4.1 daemon internals — the worker(sock, authenticated) signature
    and the literal "failed to flush the output" message.  Pin the installed
    version so an upgrade fails HERE with a pointer instead of silently
    disabling the patches (r5 ADVICE)."""
    import pyspark

    mod = importlib.import_module(
        "semantic_vector_search_system_spark.worker_daemon"
    )
    major, minor = (int(p) for p in pyspark.__version__.split(".")[:2])
    assert (major, minor) == mod.EXPECTED_PYSPARK_MAJOR_MINOR, (
        f"pyspark {pyspark.__version__} != pinned "
        f"{mod.EXPECTED_PYSPARK_MAJOR_MINOR}: re-verify worker_daemon.py's "
        "daemon patches against the new pyspark.daemon internals, then bump "
        "EXPECTED_PYSPARK_MAJOR_MINOR."
    )


def test_swallowed_connection_errors_leave_side_channel_evidence(tmp_path):
    """_quiet_worker must not swallow a connection error silently — it logs
    to the flush side-channel file before returning 0 (r5 ADVICE)."""
    mod = importlib.import_module(
        "semantic_vector_search_system_spark.worker_daemon"
    )
    log = tmp_path / "flush.log"
    orig = mod._FLUSH_LOG
    mod._FLUSH_LOG = str(log)
    orig_worker = mod._stock_worker

    def boom(sock, authenticated):
        raise BrokenPipeError("mid-job channel failure")

    mod._stock_worker = boom
    try:
        assert mod._quiet_worker(None, True) == 0
    finally:
        mod._stock_worker = orig_worker
        mod._FLUSH_LOG = orig
    text = log.read_text()
    assert "connection error" in text and "mid-job channel failure" in text


def test_shutdown_emits_no_worker_spam(tmp_path):
    """End-to-end BENCH_r04 regression: a subprocess that runs a 32-partition
    pandas-UDF job and stops the session must not write BrokenPipeError /
    flush-failure tracebacks to stderr, and a line printed AFTER
    spark.stop() must be the last line of stdout."""
    import subprocess
    import sys

    script = tmp_path / "shutdown_probe.py"
    script.write_text(
        "from semantic_vector_search_system_spark.session import get_spark\n"
        "spark = get_spark('shutdown-probe',"
        " extra_conf={'spark.ui.showConsoleProgress': 'false'})\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "spark.range(0, 32, 1, 32).mapInPandas(\n"
        "    lambda it: (pdf for pdf in it), schema='id long'\n"
        ").write.format('noop').mode('overwrite').save()\n"
        "spark.stop()\n"
        "print('FINAL_LINE_MARKER')\n"
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BrokenPipeError" not in proc.stderr
    assert "failed to flush the output" not in proc.stderr
    stdout_lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    assert stdout_lines and stdout_lines[-1] == "FINAL_LINE_MARKER"
