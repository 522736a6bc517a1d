"""Build the optional native host kernels (wfsim_tpu._fastpath).

The package works without compilation (numpy fallbacks in
wfsim_tpu/native.py); building the extension accelerates the host-side
photon-pool regrouping.
"""
from setuptools import setup, Extension

setup(
    ext_modules=[
        Extension('wfsim_tpu._fastpath',
                  sources=['native/fastpath.c'],
                  extra_compile_args=['-O3'],
                  optional=True),
    ],
)
