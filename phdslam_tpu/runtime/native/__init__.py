"""Native (C++) runtime components, built on demand with the system g++.

``textio`` — fast dataset parsing / log writing (CPython C API + numpy).
The build is attempted once per interpreter; failures fall back silently to
the pure-Python implementations in runtime/io.py.
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


textio = None
if os.environ.get("PHDSLAM_NO_NATIVE") != "1" and _build("textio"):
    try:
        sys.path.insert(0, _HERE)
        import textio  # type: ignore  # noqa: F401
    except Exception:  # pragma: no cover
        textio = None
    finally:
        sys.path.remove(_HERE)
