"""On-demand builders for the mock radio libraries (driver tests)."""

from __future__ import annotations

import os
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()

_SOURCES = {
    "rtlsdr": "mock_rtlsdr.c",
    "airspy": "mock_airspy.c",
    "uhd": "mock_uhd.c",
}


def build(kind: str) -> Path:
    """Compile (if stale) and return the mock library path for `kind`."""
    src = _HERE / _SOURCES[kind]
    so = _HERE / f"libmock_{kind}.so"
    with _LOCK:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            cmd = ["gcc", "-O2", "-shared", "-fPIC", "-pthread",
                   "-o", str(so), str(src)]
            r = subprocess.run(cmd, capture_output=True, text=True)
            if r.returncode != 0:
                raise RuntimeError(f"mock build failed:\n{r.stderr}")
    return so


ENV_VARS = {
    "rtlsdr": "TSL_RTLSDR_LIB",
    "airspy": "TSL_AIRSPY_LIB",
    "uhd": "TSL_UHD_LIB",
}


def env_for(kind: str) -> dict:
    """Environment pointing the hw driver at the mock library."""
    return {ENV_VARS[kind]: str(build(kind))}


def install(kind: str):
    os.environ[ENV_VARS[kind]] = str(build(kind))
