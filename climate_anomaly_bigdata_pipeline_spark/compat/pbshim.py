"""Bridge ``google.protobuf`` from a vendored runtime when the real
package isn't installed.

Why: Spark 4's ``transformWithStateInPandas`` worker speaks the
state-server protocol through generated protobuf code
(``pyspark.sql.streaming.proto.StateMessage_pb2``), so the Python
worker needs an importable ``google.protobuf``. Some execution
environments (including this one) don't ship the ``protobuf`` pip
package — but commonly DO ship a public SDK that vendors a pure-Python
protobuf runtime under a rewritten namespace (Google Cloud SDK vendors
protobuf 4.x as ``cloudsdk.google.protobuf``). This module aliases such
a runtime into ``sys.modules`` under its canonical name, plus a
``runtime_version`` stub (the one 5.x+ module the 4.x runtime lacks:
generated code calls ``ValidateProtobufRuntimeVersion`` at import —
a version gate, not functionality — which the stub no-ops).

Scope: a dev/test-environment bridge only. On a real cluster, install
``protobuf`` on the workers and this module is a no-op (the genuine
package always wins). Nothing here runs unless :func:`install` is
called explicitly (tests) or via the opt-in ``sitecustomize`` hook in
``tools/pbshim_site/`` (put that dir on ``PYTHONPATH`` so forked
Python *workers* — which import the generated protobuf code before any
user code runs — get the bridge at interpreter startup).
"""

from __future__ import annotations

import importlib
import os
import sys
import types

# Places a vendored pure-Python protobuf runtime may live, as
# (sys.path entry, package prefix of the rewritten namespace).
VENDOR_CANDIDATES: tuple[tuple[str, str], ...] = (
    ("/usr/lib/google-cloud-sdk/lib/third_party", "cloudsdk.google"),
)


def install() -> str | None:
    """Make ``google.protobuf`` importable; return how, or None.

    Returns ``"native"`` if the real package imports, a
    ``"vendored:<path>"`` tag if a vendored runtime was aliased in, or
    ``None`` if no runtime could be found (callers should skip/stub).
    Idempotent.
    """
    # Probe a real module, not just the package: on Spark workers the
    # spark-core JAR sits on sys.path and its google/protobuf/*.proto
    # resource directory satisfies `import google.protobuf` as an EMPTY
    # namespace package ("unknown location") — which then shadows any
    # later import of the actual runtime.
    try:
        importlib.import_module("google.protobuf.descriptor")
        return "native"
    except ImportError:
        pass
    # Drop any namespace-package ghosts so the aliases below win.
    for name in [n for n in sys.modules if n.startswith("google.protobuf")]:
        del sys.modules[name]

    for path, prefix in VENDOR_CANDIDATES:
        if not os.path.isdir(path):
            continue
        if path not in sys.path:
            sys.path.insert(0, path)
        try:
            vendor_google = importlib.import_module(prefix)
            vendor_pb = importlib.import_module(prefix + ".protobuf")
        except ImportError:
            sys.path.remove(path)
            continue
        # Alias the package under its canonical names. Submodule
        # from-imports resolve through the parent's __name__ (the
        # rewritten prefix), so sys.modules aliases are needed under
        # BOTH names for any module we synthesize.
        # An existing `google` module (e.g. the JAR-backed namespace
        # package) is kept — only its `protobuf` member is grafted.
        g = sys.modules.setdefault("google", vendor_google)
        g.protobuf = vendor_pb
        vendor_google.protobuf = vendor_pb
        sys.modules["google.protobuf"] = vendor_pb
        if not hasattr(vendor_pb, "runtime_version"):
            rv = types.ModuleType(prefix + ".protobuf.runtime_version")

            class _Domain:
                GOOGLE_INTERNAL = 1
                PUBLIC = 2

            rv.Domain = _Domain
            rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
            vendor_pb.runtime_version = rv
            sys.modules["google.protobuf.runtime_version"] = rv
            sys.modules[prefix + ".protobuf.runtime_version"] = rv
        return f"vendored:{path}"
    return None
