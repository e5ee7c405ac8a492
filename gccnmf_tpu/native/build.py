"""Lazy builder for the native host-runtime library.

Compiles ``src/gccnmf_rt.cpp`` into a shared library next to this file the
first time it is needed, fingerprinted by source hash + compiler so edits
rebuild automatically. No pybind11/setuptools machinery — one ``g++ -O3
-shared`` invocation; consumers fall back to pure NumPy when no C++
toolchain is present (see gccnmf_tpu.native.runtime).
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
import subprocess
import tempfile

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "gccnmf_rt.cpp")

__all__ = ["lib_path", "build", "find_compiler"]


def find_compiler() -> str | None:
    for cc in (os.environ.get("CXX"), "g++", "clang++"):
        if cc and shutil.which(cc):
            return cc
    return None


def _fingerprint(compiler: str) -> str:
    h = hashlib.sha256()
    with open(_SRC, "rb") as f:
        h.update(f.read())
    h.update(compiler.encode())
    return h.hexdigest()[:16]


def lib_path() -> str:
    return os.path.join(_DIR, "_libgccnmf_rt.so")


def build(force: bool = False) -> str | None:
    """Build (if stale) and return the shared-library path, or None."""
    compiler = find_compiler()
    if compiler is None:
        logger.info("no C++ compiler found; native runtime disabled")
        return None
    out = lib_path()
    stamp = out + ".stamp"
    fp = _fingerprint(compiler)
    if not force and os.path.exists(out) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == fp:
                return out
    # compile to a per-process temp name so concurrent builders (e.g.
    # pytest-xdist workers) cannot interleave writes; os.replace publishes
    # atomically and the losers just overwrite with identical bytes
    tmp_out = f"{out}.tmp.{os.getpid()}"
    cmd = [
        compiler,
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-fvisibility=hidden",
        "-Wall",
        _SRC,
        "-o",
        tmp_out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        logger.warning("native runtime build failed:\n%s", e.stderr)
        return None
    os.replace(tmp_out, out)
    fd, tmp = tempfile.mkstemp(dir=_DIR)
    with os.fdopen(fd, "w") as f:
        f.write(fp)
    os.replace(tmp, stamp)
    logger.info("built native runtime: %s", out)
    return out
