"""Python worker daemon with the scientific stack preloaded.

Spark's worker daemon (``pyspark.daemon``) forks one Python worker
per task slot; each fork then imports numpy/pandas/pyarrow lazily on
its first Arrow batch (~0.5 s each, and the whole pool forks at once
after the factory's hardcoded 60 s idle eviction —
``PythonWorkerFactory.IDLE_WORKER_TIMEOUT_NS`` — so a session whose
Python stages are minutes apart re-pays it repeatedly; measured ~3 s
across a 32-slot pool). Importing the stack HERE, in the daemon
process before any fork, lets every worker inherit the loaded modules
copy-on-write: child ``import numpy`` becomes a dict lookup.

On a 1000-executor cluster this shaves the first-Python-stage latency
on every executor (and after every idle eviction) for the cost of one
import per executor process. Enabled via
``spark.python.daemon.module=igloo_spark.worker_daemon`` in
``session.build_spark``; imports are best-effort so a worker
environment without the stack still serves non-Arrow UDFs.
"""

from __future__ import annotations

try:  # best-effort: daemon must come up even on a slim worker env
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
except Exception:  # pragma: no cover - absent only on slim images
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
