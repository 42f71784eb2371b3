"""ctypes bindings for the native host audio runtime (csrc/llmvox_audio.cpp).

Build with ``make -C csrc``.  Every function has a numpy/scipy fallback, so
the framework runs with or without the native library; ``HAVE_NATIVE``
reports which path is active.
"""
from __future__ import annotations

import ctypes
import math
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc",
    "libllmvox_audio.so")

_lib: Optional[ctypes.CDLL] = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.llmvox_resample_poly.restype = ctypes.c_int64
        _lib.llmvox_resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib.llmvox_f32_to_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16)]
        _lib.llmvox_pcm16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        _lib.llmvox_gain_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float]
        _lib.llmvox_ring_create.restype = ctypes.c_void_p
        _lib.llmvox_ring_create.argtypes = [ctypes.c_int64]
        _lib.llmvox_ring_destroy.argtypes = [ctypes.c_void_p]
        _lib.llmvox_ring_write.restype = ctypes.c_int64
        _lib.llmvox_ring_write.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _lib.llmvox_ring_read.restype = ctypes.c_int64
        _lib.llmvox_ring_read.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _lib.llmvox_ring_available.restype = ctypes.c_int64
        _lib.llmvox_ring_available.argtypes = [ctypes.c_void_p]
    except OSError:
        _lib = None

HAVE_NATIVE = _lib is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """Polyphase resampling; native Kaiser-sinc FIR or scipy fallback."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    x = np.ascontiguousarray(x, np.float32)
    if _lib is not None:
        n_out = (len(x) * up + down - 1) // down
        out = np.empty(n_out, np.float32)
        n = _lib.llmvox_resample_poly(_fptr(x), len(x), up, down, _fptr(out))
        return out[:n]
    from scipy.signal import resample_poly as _sp
    return _sp(x, up, down).astype(np.float32)


def f32_to_pcm16(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    if _lib is not None:
        out = np.empty(len(x), np.int16)
        _lib.llmvox_f32_to_pcm16(
            _fptr(x), len(x), out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int16)))
        return out
    return (np.clip(x, -1.0, 1.0) * 32767.0).round().astype(np.int16)


def pcm16_to_f32(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.int16)
    if _lib is not None:
        out = np.empty(len(x), np.float32)
        _lib.llmvox_pcm16_to_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(x),
            _fptr(out))
        return out
    return x.astype(np.float32) / 32768.0


def gain_normalize(x: np.ndarray, gain_db: float) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32).copy()
    if _lib is not None:
        _lib.llmvox_gain_normalize(_fptr(x), len(x), float(gain_db))
        return x
    peak = np.max(np.abs(x)) + 1e-9
    return x * (10.0 ** (gain_db / 20.0) / peak)


class RingBuffer:
    """Lock-free SPSC byte ring (native) with a bytearray fallback."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        if _lib is not None:
            self._h = _lib.llmvox_ring_create(capacity)
            self._buf = None
        else:
            self._h = None
            self._buf = bytearray()

    def write(self, data: bytes) -> int:
        if self._h is not None:
            arr = np.frombuffer(data, np.uint8)
            return int(_lib.llmvox_ring_write(
                self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(arr)))
        n = min(len(data), self.capacity - len(self._buf))
        self._buf.extend(data[:n])
        return n

    def read(self, n: int) -> bytes:
        if self._h is not None:
            out = np.empty(n, np.uint8)
            got = int(_lib.llmvox_ring_read(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                n))
            return out[:got].tobytes()
        got = min(n, len(self._buf))
        out = bytes(self._buf[:got])
        del self._buf[:got]
        return out

    def available(self) -> int:
        if self._h is not None:
            return int(_lib.llmvox_ring_available(self._h))
        return len(self._buf)

    def __del__(self):
        if getattr(self, "_h", None) is not None and _lib is not None:
            _lib.llmvox_ring_destroy(self._h)
