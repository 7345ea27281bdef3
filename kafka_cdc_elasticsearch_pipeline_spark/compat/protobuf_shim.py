"""Make ``google.protobuf`` importable when the pip package is absent.

PySpark 4's ``transformWithStateInPandas`` (the new typed-state
streaming API) talks to the JVM state server through protobuf messages
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``).  ``protobuf`` is
an *optional* pyspark dependency, so environments that never installed
it (like this one) can't execute the v2 stateful API at all — and the
engine's old-API/new-API hash-equality claim would go untested.

Many hosts nevertheless carry a pure-python protobuf runtime inside the
Google Cloud SDK's vendored third-party tree
(``/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf``,
Apache-2.0, a verbatim namespaced copy of the public ``protobuf`` pip
package).  This shim aliases that copy into the ``google.protobuf``
namespace via a meta-path finder, so every ``google.protobuf.X`` import
resolves to the SAME module object as ``cloudsdk.google.protobuf.X``
(one identity — descriptor/isinstance checks stay coherent).

Two deliberate compromises, both contained:

* The vendored runtime is 4.x while pyspark's generated file was
  emitted by protoc 6.x, whose preamble imports
  ``google.protobuf.runtime_version`` (added in 5.x) purely to run a
  gencode/runtime version check.  We synthesize that module with a
  no-op ``ValidateProtobufRuntimeVersion``.  The message definitions
  themselves are plain proto3 (no editions / extensions), which the
  4.x pure-python descriptor pool parses fine — and the unit tests
  assert real encode/decode round-trips, so a silent incompatibility
  cannot hide.
* The shim only installs when ``google.protobuf`` is NOT already
  importable; a real protobuf install always wins.

Spark workers get the shim automatically: the processor classes in
``streaming/stateful_v2.py`` import this module at module-import time,
which happens when the worker unpickles the stateful processor —
*before* the lazy ``StateMessage_pb2`` imports inside
``stateful_processor_api_client`` methods ever run.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import importlib.util
import os
import sys
import types

_VENDOR_ROOT = "/usr/lib/google-cloud-sdk/lib/third_party"
_VENDOR_PKG = "cloudsdk.google.protobuf"
_installed = False


def _vendored_protobuf_present() -> bool:
    return os.path.isdir(os.path.join(_VENDOR_ROOT, "cloudsdk", "google", "protobuf"))


def _make_runtime_version_module() -> types.ModuleType:
    """``google.protobuf.runtime_version`` stand-in (5.x+ API): the
    generated preamble calls ``ValidateProtobufRuntimeVersion(domain,
    major, minor, patch, suffix, location)`` — a pure version gate with
    no behavioral role, so a no-op is faithful."""
    mod = types.ModuleType("google.protobuf.runtime_version")

    class Domain:  # matches protobuf's enum surface
        GOOGLE_INTERNAL = 1
        PUBLIC = 2

    def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:
        return None

    mod.Domain = Domain
    mod.ValidateProtobufRuntimeVersion = ValidateProtobufRuntimeVersion
    return mod


class _ProtobufAliasFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Resolve ``google`` / ``google.protobuf[.X]`` to the vendored
    ``cloudsdk.google.protobuf`` modules (shared module objects)."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname != "google" and not fullname.startswith("google.protobuf"):
            return None
        if fullname == "google":
            # The finder sits at meta_path[0]; only claim the bare
            # ``google`` namespace when nothing real provides it — a
            # genuine namespace package (google.auth, …) must win.
            if importlib.machinery.PathFinder.find_spec("google") is not None:
                return None
        return importlib.machinery.ModuleSpec(fullname, self, is_package=True)

    def create_module(self, spec):
        name = spec.name
        if name == "google.protobuf.runtime_version":
            try:
                return importlib.import_module(_VENDOR_PKG + ".runtime_version")
            except ImportError:
                return _make_runtime_version_module()
        if name == "google":
            return importlib.import_module("cloudsdk.google")
        vendored = _VENDOR_PKG + name[len("google.protobuf") :]
        return importlib.import_module(vendored)

    def exec_module(self, module):  # module already executed under its vendor name
        return None


def protobuf_available() -> bool:
    """True if ``google.protobuf`` is importable (real or shimmed)."""
    ensure_protobuf()
    return importlib.util.find_spec("google.protobuf") is not None


def ensure_protobuf() -> bool:
    """Install the alias finder if needed.  Returns True when
    ``google.protobuf`` is importable after the call."""
    global _installed
    cached = sys.modules.get("google.protobuf")
    if cached is not None and getattr(cached, "__file__", None):
        return True
    try:  # a real install always wins — but a file-less namespace
        # portion (a bare google/protobuf/ dir somewhere on sys.path,
        # as Spark worker environments sometimes carry) does NOT count:
        # require an actual descriptor module.
        if importlib.util.find_spec("google.protobuf.descriptor") is not None:
            return True
    except (ImportError, ValueError, ModuleNotFoundError):
        pass
    if _installed:
        return True
    if not _vendored_protobuf_present():
        return False
    # The vendored copy has no C extension; pin the pure-python impl so
    # its api_implementation probe never goes looking for one.
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    if _VENDOR_ROOT not in sys.path:
        sys.path.append(_VENDOR_ROOT)  # append: never shadow real packages
    # insert(0), not append: a dotted ``import google.protobuf.X``
    # resolves the submodule via the meta_path ORDER, and PathFinder
    # (searching the aliased parent's vendor __path__) would otherwise
    # win and execute the file a SECOND time under the google.* name —
    # two module objects, duplicate descriptor-pool registration.  The
    # finder only ever matches google/google.protobuf* names, and this
    # branch is only reached after the real-install check above failed,
    # so nothing genuine is shadowed.
    sys.meta_path.insert(0, _ProtobufAliasFinder())
    # Eagerly alias the package itself: worker processes can carry a
    # file-less ``google.protobuf`` namespace portion on sys.path that
    # PathFinder resolves ahead of our appended finder — a sys.modules
    # entry beats every finder.  (``from google.protobuf import X`` then
    # resolves children via the parent's vendor __name__, which exists.)
    pb = importlib.import_module(_VENDOR_PKG)
    existing = sys.modules.get("google.protobuf")
    if existing is None or not getattr(existing, "__file__", None):
        sys.modules["google.protobuf"] = pb
    # ``from google.protobuf import runtime_version`` resolves the child
    # name from the parent's __name__ (the vendor name), so the 5.x-only
    # module must pre-exist under BOTH names and as a package attribute.
    if not hasattr(pb, "runtime_version"):
        rv = _make_runtime_version_module()
        sys.modules["google.protobuf.runtime_version"] = rv
        sys.modules[_VENDOR_PKG + ".runtime_version"] = rv
        pb.runtime_version = rv
    _installed = True
    return True
