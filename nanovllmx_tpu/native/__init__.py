"""Native engine-core extension loader.

Builds `_nvx_native` (C++ radix tree) on first import with g++, caching the
shared object next to the source. Falls back to the pure-Python
implementations if the toolchain is unavailable (NVX_NATIVE=0 disables).
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_nvx_native.so")
_SRC = os.path.join(_HERE, "radix.cc")


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain, compile error, ...
        logger.warning("native build failed, using Python engine core: %s", e)
        return False


def load_native():
    """Returns the _nvx_native module or None."""
    if os.environ.get("NVX_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    sys.path.insert(0, _HERE)
    try:
        import _nvx_native

        return _nvx_native
    except Exception as e:
        logger.warning("native import failed: %s", e)
        return None
    finally:
        sys.path.pop(0)
