"""Build the native image-ops shared library (g++, no external deps).

Compiled lazily on first use and cached next to the source; callers fall back
to PIL/numpy when compilation is unavailable.
"""

from __future__ import annotations

import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "image_ops.cpp")
LIB = os.path.join(_HERE, "libimage_ops.so")
DL_SRC = os.path.join(_HERE, "dataloader.cpp")
DL_LIB = os.path.join(_HERE, "libdataloader.so")
_lock = threading.Lock()


def build(force: bool = False) -> str:
    with _lock:
        if not force and os.path.exists(LIB) and (
            os.path.getmtime(LIB) >= os.path.getmtime(SRC)
        ):
            return LIB
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", SRC, "-o", LIB,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return LIB


def build_dataloader(force: bool = False) -> str:
    """Threaded JPEG decode+resize loader (links libjpeg; dataloader.cpp)."""
    with _lock:
        newest = max(os.path.getmtime(DL_SRC), os.path.getmtime(SRC))
        if not force and os.path.exists(DL_LIB) and (
            os.path.getmtime(DL_LIB) >= newest
        ):
            return DL_LIB
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", DL_SRC, "-o", DL_LIB, "-ljpeg",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        return DL_LIB
