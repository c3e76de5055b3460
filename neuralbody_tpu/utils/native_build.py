"""Shared g++ build-and-load helper for the native C++ hot paths.

Multi-process safe: every spawn-based loader worker (datasets/loader.py
WorkerPool) triggers the lazy build independently on first use or stale
mtime. A non-atomic `g++ -o lib.so` can hand a half-linked file to a
concurrent CDLL, or rewrite an inode another worker already dlopen'ed.
Here the link goes to a unique temp path and is os.rename()d into place
(atomic on POSIX), with an fcntl.flock serializing builds across processes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess


def build_and_load(src: str, so: str) -> ctypes.CDLL:
    """Compile `src` to shared object `so` (if missing/stale) and dlopen it.

    Safe to call concurrently from multiple processes; exactly one builds,
    the rest wait on the lockfile and load the finished artifact.
    """
    src = os.path.abspath(src)
    so = os.path.abspath(so)

    def _stale():
        return (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src))

    if _stale():
        import fcntl
        lock_path = so + ".lock"
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if _stale():  # another process may have finished the build
                    tmp = f"{so}.{os.getpid()}.tmp"
                    try:
                        subprocess.run(
                            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                             src, "-o", tmp],
                            check=True, capture_output=True)
                        os.rename(tmp, so)  # atomic publish
                    finally:
                        if os.path.exists(tmp):
                            os.unlink(tmp)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    return ctypes.CDLL(so)
