"""JIT builder for the native host-ops library.

Behavioral contract: /root/reference/torch_utils/custom_ops.py:46-124 — the
plugin pattern: hash the sources + flags into a digest build dir, compile
once under a file lock (FileBaton), reuse forever; on TPU the compiled
artifact is a host .so (the device side is XLA/Pallas).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import time
from typing import Optional

_SOURCES = [os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "host_ops.cpp")]
_CACHE_ROOT = os.environ.get(
    "STYLEMC_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "stylemc_tpu", "build"))
_CFLAGS = ["-O3", "-shared", "-fPIC", "-std=c++17"]

_lib = None
_lib_failed = False


class FileBaton:
    """Cooperative file lock guarding parallel builds
    (custom_ops.py:95-105 pattern)."""

    def __init__(self, path: str, wait_seconds: float = 0.1):
        self.path = path
        self.wait = wait_seconds
        self.fd = None

    def try_acquire(self) -> bool:
        try:
            self.fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            return True
        except FileExistsError:
            return False

    def wait_release(self, timeout: float = 120.0):
        waited = 0.0
        while os.path.exists(self.path) and waited < timeout:
            time.sleep(self.wait)
            waited += self.wait

    def release(self):
        if self.fd is not None:
            os.close(self.fd)
        if os.path.exists(self.path):
            os.remove(self.path)


def _digest() -> str:
    md5 = hashlib.md5()
    for src in _SOURCES:
        with open(src, "rb") as f:
            md5.update(f.read())
    md5.update(" ".join(_CFLAGS).encode())
    return md5.hexdigest()


def build_host_ops(verbose: bool = False) -> Optional[str]:
    """Compile (or reuse) the host-ops .so; returns its path or None."""
    digest = _digest()
    build_dir = os.path.join(_CACHE_ROOT, digest)
    so_path = os.path.join(build_dir, "host_ops.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(build_dir, exist_ok=True)
    baton = FileBaton(os.path.join(build_dir, "lock"))
    if baton.try_acquire():
        try:
            if not os.path.exists(so_path):
                cxx = shutil.which("g++") or shutil.which("c++")
                if cxx is None:
                    return None
                cmd = [cxx, *_CFLAGS, "-o", so_path + ".tmp", *_SOURCES]
                if verbose:
                    print(" ".join(cmd))
                subprocess.run(cmd, check=True, capture_output=not verbose)
                os.replace(so_path + ".tmp", so_path)
        finally:
            baton.release()
    else:
        baton.wait_release()
    return so_path if os.path.exists(so_path) else None


def get_host_ops() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure —
    callers fall back to numpy."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed or os.environ.get("STYLEMC_DISABLE_NATIVE"):
        return None
    try:
        so_path = build_host_ops()
        if so_path is None:
            _lib_failed = True
            return None
        lib = ctypes.CDLL(so_path)
        lib.nms.restype = ctypes.c_int
        lib.host_ops_abi_version.restype = ctypes.c_int
        assert lib.host_ops_abi_version() == 1
        _lib = lib
        return _lib
    except Exception:
        _lib_failed = True
        return None
