"""Import the reference hamerkop package for differential testing.

The reference depends on `editdistance` and `langdetect`, which are not in
this environment.  We install minimal pure-python shims into sys.modules
BEFORE importing it.  The shims implement exactly the API surface the
reference uses: editdistance.eval (Levenshtein distance) and a langdetect
DetectorFactory (never exercised — tests use FixedLang).
"""

from __future__ import annotations

import sys
import types


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def install_shims():
    # the reference targets old Python: collections.MutableSet/Mapping were
    # removed in 3.10 — restore the aliases before importing it
    import collections
    import collections.abc

    for name in ("MutableSet", "MutableMapping", "Mapping", "Set", "Iterable"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(collections.abc, name))

    if "editdistance" not in sys.modules:
        mod = types.ModuleType("editdistance")
        mod.eval = _levenshtein
        sys.modules["editdistance"] = mod
    if "langdetect" not in sys.modules:
        mod = types.ModuleType("langdetect")

        class DetectorFactory:  # never used by our tests (FixedLang only)
            def load_profile(self, path):
                pass

            def create(self):
                raise NotImplementedError("langdetect shim: profiles unavailable")

        mod.DetectorFactory = DetectorFactory
        mod.PROFILES_DIRECTORY = ""
        sys.modules["langdetect"] = mod


def import_reference():
    install_shims()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import hamerkop  # noqa: F401

    return hamerkop


def levenshtein(a: str, b: str) -> int:
    """Exposed for oracle use in tests."""
    return _levenshtein(a, b)
