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
   version the wire format and generated-code API are stable, so the
   gate is relaxed — but ONLY for same-major skews: the wrapper calls
   the real validator first and re-raises anything that is not a
   major-version match (ADVICE r9 — an unconditional no-op would also
   wave through genuinely incompatible cross-major pairs).

Exposure is NARROW by construction (ADVICE r9): rather than appending
the whole GAE platform dir (which would let ANY failed import — yaml,
webob, … — silently resolve to an ancient bundled copy in every
worker), a scratch dir containing a single ``google`` symlink is
appended, so only ``google.*`` can resolve from the bundle. Python's
package resolution keeps even that safe: a regular package (the
bundle's ``google/protobuf`` has an ``__init__.py``) wins over
namespace portions like the jar's regardless of sys.path order. On a
host with a healthy protobuf install this file changes nothing.
"""

import os
import sys

_FALLBACK_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _narrow_path_entry(bundle_dir):
    """A sys.path entry exposing ONLY ``google/`` from ``bundle_dir``:
    a per-process scratch dir holding one symlink. Falls back to the
    bundle dir itself only if symlinking is impossible (exotic fs)."""
    import tempfile

    try:
        shim = tempfile.mkdtemp(prefix="pmrs_pbshim_")
        os.symlink(
            os.path.join(bundle_dir, "google"), os.path.join(shim, "google")
        )
        return shim
    except OSError:  # pragma: no cover - symlink-hostile filesystem
        return bundle_dir


def _relax_same_major_gate(rv_module):
    """Replace ValidateProtobufRuntimeVersion with a wrapper that still
    runs the real check and re-raises UNLESS the rejected gencode is
    the same MAJOR as this runtime (minor/patch skew only)."""
    orig = rv_module.ValidateProtobufRuntimeVersion

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            orig(domain, major, minor, patch, suffix, location)
        except Exception:
            if major != getattr(rv_module, "MAJOR", None):
                raise

    rv_module.ValidateProtobufRuntimeVersion = _lenient


try:
    try:
        from google.protobuf import descriptor  # noqa: F401
    except Exception:
        for _d in [os.environ.get("PMRS_PROTOBUF_DIR")] + _FALLBACK_DIRS:
            if _d and os.path.isdir(os.path.join(_d, "google", "protobuf")):
                sys.path.append(_narrow_path_entry(_d))
                # Purge the poisoned namespace portions so the next
                # import re-resolves against the full path.
                for _m in [
                    m
                    for m in sys.modules
                    if m == "google" or m.startswith("google.")
                ]:
                    del sys.modules[_m]
                from google.protobuf import runtime_version as _rv

                _relax_same_major_gate(_rv)
                break
except Exception:  # pragma: no cover - never break an innocent worker
    pass
