"""Protobuf-runtime shim for Spark 4.1 ``transformWithState`` Python
workers (imported automatically by ``site`` when this directory is on
PYTHONPATH — see streaming/transform_state.py::ensure_protobuf_env).

The transformWithState state-server protocol is protobuf-based
(pyspark/sql/streaming/proto/StateMessage_pb2.py). Two host hazards
break it when protobuf was never pip-installed:

1. Spark worker PYTHONPATH includes ``spark-core_*.jar``, whose shaded
   ``google/protobuf/*.proto`` zip directory forms an importable-but-
   EMPTY namespace package — ``import google.protobuf`` "succeeds" and
   every real submodule import then fails with
   ``cannot import name 'descriptor' ... (unknown location)``. The
   health check below therefore probes ``descriptor`` itself, never
   the bare package.
2. The only runtime on the host may be the Google Cloud SDK's bundled
   copy, one minor version BEHIND the pyspark gencode (observed:
   runtime 6.32.0-dev vs gencode 6.33.0), which the generated module's
   ``ValidateProtobufRuntimeVersion`` gate rejects. Within a major
   version the wire format and generated-code API are stable, so after
   falling back to the bundle the gate is relaxed to a no-op.

Python's package resolution makes the fallback safe to APPEND (no
shadowing): a regular package (the bundle's ``google/protobuf`` has an
``__init__.py``) wins over namespace portions like the jar's regardless
of sys.path order. On a host with a healthy protobuf install this file
changes nothing.
"""

import os
import sys

_FALLBACK_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

try:
    try:
        from google.protobuf import descriptor  # noqa: F401
    except Exception:
        for _d in [os.environ.get("PMRS_PROTOBUF_DIR")] + _FALLBACK_DIRS:
            if _d and os.path.isdir(os.path.join(_d, "google", "protobuf")):
                sys.path.append(_d)
                # Purge the poisoned namespace portions so the next
                # import re-resolves against the full path.
                for _m in [
                    m
                    for m in sys.modules
                    if m == "google" or m.startswith("google.")
                ]:
                    del sys.modules[_m]
                from google.protobuf import runtime_version as _rv

                _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
                break
except Exception:  # pragma: no cover - never break an innocent worker
    pass
