"""Packaging for torchregister-tpu.

Mirrors the reference's setuptools packaging (reference setup.py:3-15) with
the JAX-stack dependency set. The native volio extension is built on demand at
import time (see torchregister_tpu/utils/volio.py) so the wheel stays pure
Python; an explicit prebuild is available via ``python setup.py build_volio``.
"""
import subprocess
import sys

from setuptools import Command, find_packages, setup


class BuildVolio(Command):
    description = "prebuild the native volio shared library"
    user_options = []

    def initialize_options(self):
        pass

    def finalize_options(self):
        pass

    def run(self):
        sys.path.insert(0, ".")
        from torchregister_tpu.utils.volio import _build_lib

        path = _build_lib()
        if path is None:
            raise RuntimeError("volio build failed (g++/zlib missing?)")
        print(f"built {path}")


setup(
    name="torchregister-tpu",
    version="0.1.0",
    description=(
        "TPU-native 2D/3D gradient-descent image registration "
        "(rigid / affine / dense flow) in JAX"
    ),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=[
        "jax>=0.4.30",
        "flax>=0.8",
        "optax>=0.2",
        "numpy>=1.24",
    ],
    cmdclass={"build_volio": BuildVolio},
)
