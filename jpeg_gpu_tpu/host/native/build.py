"""On-demand build of the native host decoder (g++ -> shared object).

The .so is compiled once per source hash into the package directory (or
``TPU_JPEG_NATIVE_CACHE`` if set) and loaded via ctypes.  No external build
system or bindings dependency needed; falls back cleanly if no compiler.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import subprocess
import threading
from typing import Optional

from jpeg_gpu_tpu.utils.logging import get_logger

log = get_logger("entropy")

_SRC = pathlib.Path(__file__).with_name("xjpeg_host.cpp")
_LOCK = threading.Lock()
_CACHED_PATH: Optional[pathlib.Path] = None
_BUILD_FAILED = False


def _cache_dir() -> pathlib.Path:
    env = os.environ.get("TPU_JPEG_NATIVE_CACHE")
    if env:
        p = pathlib.Path(env)
    else:
        p = pathlib.Path(__file__).parent / "_build"
    p.mkdir(parents=True, exist_ok=True)
    return p


def shared_object_path() -> Optional[pathlib.Path]:
    """Build (if needed) and return the .so path, or None if unavailable."""
    global _CACHED_PATH, _BUILD_FAILED
    with _LOCK:
        if _CACHED_PATH is not None:
            return _CACHED_PATH
        if _BUILD_FAILED:
            return None
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        out = _cache_dir() / f"xjpeg_host_{tag}.so"
        if not out.exists():
            # Per-process tmp name: concurrent cold-cache builds (parallel
            # pytest workers, two CLIs) must not interleave g++ output into
            # one file; each builds privately, the os.replace is atomic and
            # last-writer-wins with identical content.
            tmp = f"{out}.{os.getpid()}.tmp"
            cmd = [
                "g++", "-std=c++17", "-O3", "-march=native", "-fPIC",
                "-shared", "-pthread", str(_SRC), "-o", tmp,
            ]
            try:
                subprocess.run(
                    cmd, check=True, capture_output=True, timeout=120
                )
                os.replace(tmp, out)
                log.info("built native decoder: %s", out)
            except (subprocess.SubprocessError, OSError) as e:
                stderr = getattr(e, "stderr", b"")
                log.warning(
                    "native decoder build failed (%s); falling back to "
                    "python entropy decode. stderr: %s",
                    e, (stderr or b"").decode(errors="replace")[:500],
                )
                _BUILD_FAILED = True
                return None
        _CACHED_PATH = out
        return out
