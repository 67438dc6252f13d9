"""Build script: compiles the native host-side extension
(gpu_ecs_madrona_tpu._native, C++; see native/importer.cpp — the analog of
the reference's C++ asset importer, src/common/importer.cpp).  The package
works without it (pure-Python fallbacks), so extension build failures are
non-fatal."""

from setuptools import setup
from setuptools.extension import Extension
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover
            print(f"WARNING: native extension build failed ({e}); "
                  "falling back to pure-Python importer")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            print(f"WARNING: building {ext.name} failed ({e})")


setup(
    ext_modules=[
        Extension(
            "gpu_ecs_madrona_tpu._native",
            sources=["native/importer.cpp", "native/trace.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
