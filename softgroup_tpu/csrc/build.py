"""Build libhostops.so with the system compiler (no pybind11 needed —
bindings go through ctypes, see softgroup_tpu/ops/native.py)."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, 'hostops.cpp')
OUT = os.path.join(HERE, 'libhostops.so')


def build(force: bool = False) -> str | None:
    if not force and os.path.exists(OUT) and \
            os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    for cxx in (os.environ.get('CXX'), 'g++', 'c++', 'clang++'):
        if not cxx:
            continue
        cmd = [cxx, '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
               SRC, '-o', OUT]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return OUT
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return None


if __name__ == '__main__':
    path = build(force='--force' in sys.argv)
    print(path or 'build failed')
