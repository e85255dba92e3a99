"""Native-extension build for the packaged install (metadata lives in
pyproject.toml). Compiles the C++ Jonker-Volgenant solver as a plain shared
library inside the package so `bm2f_tpu.matching.hungarian` can ctypes-load
it after `pip install` (when running from a source checkout the loader
instead `make`s native/lap/liblap.so on first use)."""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class _PlainSharedLib(build_ext):
    """Build lap.cpp as a plain `-shared` library (no Python ABI): the
    solver is called through ctypes, so it needs no PyInit entry point and
    stays independent of the interpreter version."""

    def get_export_symbols(self, ext):
        return []  # not a Python module; export everything non-static


setup(
    ext_modules=[
        Extension(
            "bm2f_tpu.matching.liblap",
            sources=["native/lap/lap.cpp"],
            language="c++",
            extra_compile_args=["-O3", "-fPIC", "-std=c++17"],
            extra_link_args=["-lpthread"],
        )
    ],
    cmdclass={"build_ext": _PlainSharedLib},
)
