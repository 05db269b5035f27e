"""Build config for the optional native extension.

The package is pure-Python-functional; ``_kmerlsh_native`` (FASTQ streaming
+ k-mer counting in C++) is a drop-in accelerator that the io layer uses
when importable. Build failures must not break installation.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover
            print(f"warning: native extension build skipped: {e}")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            print(f"warning: native extension build skipped: {e}")


setup(
    ext_modules=[
        Extension(
            "_kmerlsh_native",
            sources=["native/_native.cc"],
            libraries=["z"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
