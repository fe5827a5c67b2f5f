"""Builds the native ipxlu shared library with g++ at first import.

The compiled object is cached next to the source; rebuilt when the source is
newer than the library.
"""
from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "ipxlu.cc")
LIB = os.path.join(_DIR, "libipxlu.so")


def build(force: bool = False) -> str:
    """Compiles libipxlu.so if needed; returns its path or raises."""
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    base = ["g++", "-O3", "-march=native", "-fPIC", "-shared",
            "-std=c++17", "-o", LIB, SRC]
    cmd = base[:1] + ["-fopenmp"] + base[1:]
    try:
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError:
            # toolchains without libgomp: serial build
            subprocess.run(base, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(
            f"ipxlu native build failed:\n{e.stderr}") from e
    except FileNotFoundError as e:
        raise RuntimeError("g++ not found; native LU unavailable") from e
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
