"""On-demand compilation and loading of the native C++ components.

No pybind11 in this environment, so bindings go through ctypes: sources are
compiled once with ``g++ -O3 -shared -fPIC`` into a per-source-hash cache
directory and loaded as shared libraries. Falls back cleanly (returns None)
when no compiler is available — every native function has a NumPy reference
implementation at its call site.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

_CACHE = {}

# Per-source extra compile/link flags.
_EXTRA_FLAGS = {
    "nifti_loader": ["-pthread", "-lz"],
}


def _cache_dir() -> Path:
    root = os.environ.get("DIFFDRR_TPU_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "diffdrr_tpu"
    )
    p = Path(root)
    p.mkdir(parents=True, exist_ok=True)
    return p


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load ``diffdrr_tpu/native/<name>.cpp``."""
    if name in _CACHE:
        return _CACHE[name]
    src = Path(__file__).parent / f"{name}.cpp"
    if not src.exists():
        _CACHE[name] = None
        return None
    code = src.read_bytes()
    digest = hashlib.sha256(code).hexdigest()[:16]
    lib_path = _cache_dir() / f"{name}-{digest}.so"
    if not lib_path.exists():
        try:
            # Temp dir INSIDE the cache dir: Path.replace is os.rename, which
            # fails with EXDEV across filesystems (e.g. tmpfs /tmp vs a disk
            # cache dir) — that would silently discard a working build.
            with tempfile.TemporaryDirectory(dir=_cache_dir()) as td:
                tmp = Path(td) / f"{name}.so"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     str(src), "-o", str(tmp), *_EXTRA_FLAGS.get(name, [])],
                    check=True, capture_output=True,
                )
                tmp.replace(lib_path)
        except (OSError, subprocess.CalledProcessError):
            _CACHE[name] = None
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        _CACHE[name] = None
        return None
    _CACHE[name] = lib
    return lib


def native_available(name: str) -> bool:
    return load_library(name) is not None
