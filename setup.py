"""Build hook: compile the native bitstream assembler into the wheel.

The C++ runtime (native/mp3bits.cpp: frame weave, reservoir scans, bit
packing) ships as a ctypes shared library under mp3tpu/native/ so
installed packages do not need a compiler at import time; the dev tree
still rebuilds on demand from source (runtime/bitstream.py fallback).
"""
import pathlib
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildNative(build_py):
    def run(self):
        super().run()
        root = pathlib.Path(__file__).parent
        src = root / "native" / "mp3bits.cpp"
        out = (pathlib.Path(self.build_lib) / "mp3tpu" / "native"
               / "libmp3bits.so")
        out.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(src),
             "-o", str(out)], check=True)


setup(cmdclass={"build_py": BuildNative})
