"""Compile-and-load for the native sampler (g++ → .so → ctypes).

pybind11 is not available in this image, so the extension exposes a plain
C ABI and numpy arrays are passed as pointers via ctypes. The .so is
cached next to the source keyed by a source hash, mirroring the
reference's cppimport checksum behavior."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sampling.cpp")
_LOCK = threading.Lock()
_LIB: Optional["NativeSampler"] = None
_FAILED = False


class NativeSampler:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.gsrs_seed.argtypes = [ctypes.c_uint64]
        lib.gsrs_sample_negative.restype = ctypes.c_int64
        lib.gsrs_sample_negative.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gsrs_sample_negative_by_user.restype = ctypes.c_int64
        lib.gsrs_sample_negative_by_user.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]

    def seed(self, seed: int) -> None:
        self._lib.gsrs_seed(ctypes.c_uint64(seed))

    def sample_negative(
        self,
        user_num: int,
        item_num: int,
        train_num: int,
        indptr: np.ndarray,
        indices: np.ndarray,
        neg_num: int = 1,
    ) -> np.ndarray:
        """Reference `sampling.sample_negative` contract
        (code/sources/sampling.cpp:27-56): (rows, 2+neg_num) int64 array of
        [user, pos, neg...] with train_num//user_num rows per user."""
        indptr = np.ascontiguousarray(indptr, dtype=np.int32)
        indices = np.ascontiguousarray(indices, dtype=np.int32)
        max_rows = (train_num // max(user_num, 1)) * user_num
        out = np.empty((max(max_rows, 1), 2 + neg_num), dtype=np.int64)
        rows = self._lib.gsrs_sample_negative(
            user_num,
            item_num,
            train_num,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            neg_num,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out[:rows]

    def sample_negative_by_user(
        self,
        users: np.ndarray,
        item_num: int,
        indptr: np.ndarray,
        indices: np.ndarray,
        neg_num: int = 1,
    ) -> np.ndarray:
        """Reference `sampling.sample_negative_ByUser` contract
        (code/sources/sampling.cpp:58-86)."""
        users = np.ascontiguousarray(users, dtype=np.int64)
        indptr = np.ascontiguousarray(indptr, dtype=np.int32)
        indices = np.ascontiguousarray(indices, dtype=np.int32)
        out = np.empty((max(len(users), 1), 2 + neg_num), dtype=np.int64)
        rows = self._lib.gsrs_sample_negative_by_user(
            users.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(users),
            item_num,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            neg_num,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out[:rows]


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"_sampling_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp.so"
        subprocess.run(
            [
                "g++",
                "-O3",
                "-std=c++17",
                "-shared",
                "-fPIC",
                "-o",
                tmp,
                _SRC,
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)
    return so_path


def load_native_sampler() -> Optional[NativeSampler]:
    """Build (once) and load the native sampler; None if the toolchain is
    unavailable — callers fall back to Python, same dispatch pattern as
    reference code/utils.py:25-34."""
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _FAILED:
            return None
        try:
            _LIB = NativeSampler(ctypes.CDLL(_build()))
            return _LIB
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _FAILED = True
            return None
