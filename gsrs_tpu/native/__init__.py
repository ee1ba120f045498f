"""Native (C++) host-side components, built on demand with g++ + ctypes.

Plays the role of the reference's cppimport JIT build of sampling.cpp
(reference code/utils.py:25-34): compiled lazily on first use, cached by
source hash, with graceful fallback to pure Python when no toolchain is
available."""

from gsrs_tpu.native.build import load_native_sampler  # noqa: F401
