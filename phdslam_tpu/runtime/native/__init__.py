"""Native (C++) runtime components, built on demand with the system g++.

``textio`` — fast dataset parsing / log writing (CPython C API + numpy).
``munkres`` — Jonker-Volgenant assignment solver for OSPA scoring (the
reference's counterpart is compiled Cython, python/munkres_step4.pyx).
Builds are attempted once per interpreter; failures fall back silently to
the pure-Python/scipy implementations.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def _so_path(name: str) -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, name + suffix)


def _build(name: str) -> bool:
    """Compile ``name``.cpp into an extension module next to this file."""
    import numpy as np
    src = os.path.join(_HERE, name + ".cpp")
    out = _so_path(name)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include_py = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include_py}", f"-I{np.get_include()}",
        src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load(name: str, probe: str):
    """Load the built extension without colliding with same-named PyPI
    packages (e.g. ``munkres``) through sys.modules, in either import order:
    any foreign module is set aside during the import and restored after,
    and our entry never stays cached under the bare name. ``probe`` is an
    attribute only our extension has (guards against a same-named module
    shadowing from an earlier sys.path entry)."""
    if os.environ.get("PHDSLAM_NO_NATIVE") == "1" or not _build(name):
        return None
    import importlib
    foreign = sys.modules.pop(name, None)
    sys.path.insert(0, _HERE)
    try:
        mod = importlib.import_module(name)
        return mod if hasattr(mod, probe) else None
    except Exception:  # pragma: no cover
        return None
    finally:
        sys.path.remove(_HERE)
        sys.modules.pop(name, None)
        if foreign is not None:
            sys.modules[name] = foreign


textio = _load("textio", "load_measurements")
munkres = _load("munkres", "assign")
