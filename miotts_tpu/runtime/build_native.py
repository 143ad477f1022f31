"""Build the native runtime shared library (g++, no external deps).

Usage: python -m miotts_tpu.runtime.build_native
The library lands next to the sources as libmiotts_runtime.so; runtime
loading (runtime/native.py) also auto-builds on first use when a compiler
is available.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

SRC = Path(__file__).parent / "native" / "miotts_runtime.cpp"
OUT = Path(__file__).parent / "native" / "libmiotts_runtime.so"


def build(verbose: bool = True) -> Path | None:
    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        if verbose:
            print("no C++ compiler found", file=sys.stderr)
        return None
    cmd = [cxx, "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           "-march=native", str(SRC), "-o", str(OUT)]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except subprocess.CalledProcessError as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return None
    return OUT


if __name__ == "__main__":
    out = build()
    if out is None:
        raise SystemExit(1)
    print(f"built {out}")
