"""Optional-dependency shims.

``transformWithStateInPandas`` (Spark 4's arbitrary-state streaming API,
SPARK-46815) serializes its Python↔JVM state requests over protobuf, but
this sandbox's site-packages ships no ``google.protobuf`` and pip has no
network. The Google Cloud SDK — publicly installed at its standard
location on many hosts, including this one — bundles a pure-Python
protobuf runtime under ``platform/google_appengine/google/protobuf``.
:func:`ensure_protobuf` makes it importable when the real package is
absent, both in this process (``sys.path``) and in Spark's Python worker
subprocesses (``PYTHONPATH``, which the workers inherit), without
shadowing anything: the path is APPENDED, so an installed protobuf always
wins.

Call it before building the SparkSession (session.py does) — the worker
environment is fixed at JVM launch.
"""

from __future__ import annotations

import os
import shutil
import sys


def _candidate_sdk_paths() -> list[str]:
    cands = []
    gcloud = shutil.which("gcloud")
    if gcloud:
        sdk_root = os.path.dirname(os.path.dirname(os.path.realpath(gcloud)))
        cands.append(os.path.join(sdk_root, "platform", "google_appengine"))
    cands.append("/usr/lib/google-cloud-sdk/platform/google_appengine")
    return cands


#: Set when google.protobuf resolved via the SDK fallback (not a real
#: install) — sessions built before this module imported need the path
#: injected per-function (see ensure_protobuf_for_session).
_FALLBACK_PATH: str | None = None


def ensure_protobuf_for_session(spark) -> bool:
    """:func:`ensure_protobuf`, plus delivery to an ALREADY-RUNNING
    session's Python workers.

    The env-var route only reaches workers whose JVM launched after
    ensure_protobuf() ran. A session built earlier (e.g. the external
    driver constructs a bare SparkSession, then imports the contract)
    has its JVM env frozen — but ``sc.environment`` entries are read at
    python-function serialization time and MERGED into each worker's
    PYTHONPATH by PythonWorkerFactory, so mutating it here still lands
    in every worker spawned from now on. Idempotent; no-op when the real
    package is installed."""
    ok = ensure_protobuf()
    if ok and _FALLBACK_PATH is not None:
        env = spark.sparkContext.environment
        pp = env.get("PYTHONPATH", "")
        if _FALLBACK_PATH not in pp.split(os.pathsep):
            env["PYTHONPATH"] = (
                pp + os.pathsep + _FALLBACK_PATH if pp else _FALLBACK_PATH
            )
        env.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    return ok


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable; True if it is (or became so).

    Idempotent and cheap after the first call. Appends — never prepends —
    to ``sys.path``/``PYTHONPATH`` so a real installation is preferred.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    seen = set()
    for cand in _candidate_sdk_paths():
        cand = os.path.normpath(cand)
        if cand in seen:
            continue
        seen.add(cand)
        if not os.path.isfile(
            os.path.join(cand, "google", "protobuf", "__init__.py")
        ):
            continue
        if cand not in sys.path:
            sys.path.append(cand)
        pp = os.environ.get("PYTHONPATH", "")
        if cand not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pp + os.pathsep + cand if pp else cand
            )
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            continue
        global _FALLBACK_PATH
        _FALLBACK_PATH = cand
        # The SDK copy can trail the gencode pyspark ships (observed:
        # gencode 6.33.0 vs runtime 6.32.0-dev, one minor apart) and the
        # runtime refuses newer gencode by default. Use protobuf's OWN
        # escape hatch (runtime_version.py reads this env var) — only
        # reached on the fallback path; a real installation never gets
        # here. Exported so Spark's Python workers inherit it too.
        # BLAST RADIUS: the env var is PROCESS-WIDE — it disables the
        # gencode/runtime version guard for EVERY protobuf consumer in
        # this driver and all Spark workers, not just the
        # transformWithState path it was pinned for. Acceptable here
        # because this process's only protobuf consumer is Spark itself
        # and the q41<->q185 equality test pins behavior; if a real
        # `pip install protobuf` ever lands, drop this branch (the
        # import above succeeds without the fallback path and the var
        # is never set).
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        return True
    return False
