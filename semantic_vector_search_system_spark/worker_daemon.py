"""Python-worker daemon with the scientific stack preloaded.

Spark forks one python worker per task from the daemon process and (in
Spark 4 local mode, measured) does NOT reuse workers across jobs — so every
Arrow/Pandas-UDF task pays the full ``import pandas/pyarrow/numpy`` cost
(~0.15-0.2 s here) before its first byte of real work. The daemon is the
fork PARENT, so anything imported here is inherited copy-on-write by every
worker for free.

Wiring (session.py): ``spark.python.daemon.module = <this module>``; the
module must be importable by the worker interpreter (session.py prepends
the package parent to PYTHONPATH before the JVM starts). Launch-compatible
with ``pyspark.daemon``: importing it resolves the optional worker-module
argv exactly like the stock daemon, then ``manager()`` runs the normal
accept/fork loop — no behavioral change beyond the warm imports.
"""

# Heavy imports FIRST — these are what each forked worker inherits.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

# The worker main itself (pulls in pyspark.sql serializers, Arrow stream
# readers, cloudpickle) — importing it here means the fork child only has
# to run the task loop.
import pyspark.worker  # noqa: F401

# pyspark.daemon reads sys.argv at import time to pick the worker module
# (defaults to pyspark.worker), identically to being launched directly.
from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
