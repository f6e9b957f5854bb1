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


def _load(name: str):
    if os.environ.get("PHDSLAM_NO_NATIVE") == "1" or not _build(name):
        return None
    try:
        sys.path.insert(0, _HERE)
        return __import__(name)
    except Exception:  # pragma: no cover
        return None
    finally:
        sys.path.remove(_HERE)


textio = _load("textio")
munkres = _load("munkres")
