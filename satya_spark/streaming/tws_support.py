"""Runtime gating for the transformWithState streaming variant.

transformWithStateInPandas needs two things this sandbox only has
indirectly:

* a ``google.protobuf`` runtime for its state-server protocol — no
  wheel is installed, but the public google-cloud-sdk on the box
  bundles one; ``ensure_protobuf_pythonpath()`` exposes it through
  the guarded shim in ``.sandbox_shims`` (no-op when a real protobuf
  is importable, or when the SDK copy is absent);
* the RocksDB state-store provider (a Spark conf, jar ships with
  pyspark).

Call :func:`ensure_protobuf_pythonpath` BEFORE the JVM starts (the
TWS driver/worker processes inherit the launching process' env);
check :func:`tws_available` to decide whether to run/skip TWS paths.
"""

from __future__ import annotations

import os

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_SHIM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".sandbox_shims",
)
_SDK_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"


def _protobuf_importable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def ensure_protobuf_pythonpath() -> bool:
    """Make ``google.protobuf`` resolvable for THIS process and its
    children (must run before the JVM starts). Returns True if
    protobuf is (now) available."""
    if _protobuf_importable():
        return True
    if not os.path.isdir(_SDK_GOOGLE) or not os.path.isdir(_SHIM_DIR):
        return False
    import sys

    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    if _SHIM_DIR not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([_SHIM_DIR] + parts)
    return _protobuf_importable()


def tws_available() -> bool:
    """True iff the transformWithState runtime can work here."""
    return ensure_protobuf_pythonpath()
