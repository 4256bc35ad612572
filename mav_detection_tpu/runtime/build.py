"""Build the native runtime library.

Usage: ``python -m mav_detection_tpu.runtime.build`` (or automatic on first
import of ``native_loader``). Plain g++ invocation — no cmake needed for a
single translation unit.
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "native", "loader.cpp")
OUT = os.path.join(HERE, "_native_loader.so")


def build(force: bool = False) -> str:
    if os.path.exists(OUT) and not force:
        if os.path.getmtime(OUT) >= os.path.getmtime(SRC):
            return OUT
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           SRC, "-o", OUT]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
