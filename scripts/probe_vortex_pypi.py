"""Probe whether the real `vortex` Python bindings are importable in
this environment (VERDICT r10 next-round #7): the moment the sandbox
gains the package, the byte-level `.vortex` interop rung (SURVEY §7
Phase 2b, FORMAT.md) unblocks behind the existing DataSource seam —
`sources/vortex_format.py` is the one module to swap.

No network, no pip: a pure import probe. Run each round; record the
dated result in FORMAT.md.

Usage: python scripts/probe_vortex_pypi.py
Prints one JSON line: {"available": bool, "detail": str}
"""

import importlib.util
import json

CANDIDATES = ("vortex", "vortex_data", "pyvortex")


def probe() -> dict:
    for name in CANDIDATES:
        try:
            spec = importlib.util.find_spec(name)
        except (ImportError, ValueError):
            spec = None
        if spec is not None:
            try:
                mod = importlib.import_module(name)
                ver = getattr(mod, "__version__", "unknown")
                return {"available": True, "detail": f"{name} {ver}"}
            except Exception as e:  # found but broken: report loudly
                return {"available": True, "detail": f"{name} import error: {e}"}
    return {
        "available": False,
        "detail": f"none of {CANDIDATES} resolvable (no PyPI access in sandbox)",
    }


if __name__ == "__main__":
    print(json.dumps(probe(), separators=(",", ":")))
