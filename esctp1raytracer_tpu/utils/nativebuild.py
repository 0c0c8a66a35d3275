"""Shared build-on-demand helper for the native C++ components.

The reference builds its native code ahead of time with CMake
(/root/reference/CMakeLists.txt); this framework compiles each small
ctypes library lazily at first use instead, so the Python package works
everywhere and upgrades itself where a toolchain exists. ``-march=native``
is tried first for the vector loops, with a plain ``-O3`` fallback for
toolchains/machines where that flag fails; the last error is kept so test
skip messages can say exactly why a native path is unavailable.
"""

from __future__ import annotations

import subprocess

_last_error: str = ""


def last_build_error() -> str:
    """The most recent build failure description ('' if none)."""
    return _last_error


def build_shared(src: str, lib: str, timeout: float = 180.0) -> bool:
    """Compile ``src`` into shared library ``lib``; False (+recorded
    reason) on failure."""
    global _last_error
    errors = []
    for flags in (["-O3", "-march=native"], ["-O3"]):
        cmd = ["g++", *flags, "-shared", "-fPIC", src, "-o", lib]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=timeout)
            _last_error = ""
            return True
        except FileNotFoundError:
            errors.append("g++ not found (toolchain absent)")
            break
        except subprocess.SubprocessError as exc:
            stderr = getattr(exc, "stderr", b"") or b""
            if isinstance(stderr, bytes):
                stderr = stderr.decode(errors="replace")
            errors.append(f"[{' '.join(flags)}] {exc}: {stderr[-400:]}")
    _last_error = "; ".join(errors)
    return False
