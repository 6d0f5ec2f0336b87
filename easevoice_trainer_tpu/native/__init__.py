"""ctypes bindings for the native host audio library (csrc/evaudio.cpp).

Every function has a numpy fallback, so the package works without the
compiled library; ``available()`` reports which path is active.  Build with
``tools/build_native.sh``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libevaudio.so")
_lib: Optional[ctypes.CDLL] = None

if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _f32p = ctypes.POINTER(ctypes.c_float)
        _i16p = ctypes.POINTER(ctypes.c_int16)
        _f64p = ctypes.POINTER(ctypes.c_double)
        _lib.evaudio_peak.restype = ctypes.c_float
        _lib.evaudio_peak.argtypes = [_f32p, ctypes.c_int64]
        _lib.evaudio_float_to_int16.argtypes = [
            _f32p, _i16p, ctypes.c_int64, ctypes.c_float]
        _lib.evaudio_frame_rms.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _f64p,
            ctypes.c_int64]
        _lib.evaudio_mix_normalize.argtypes = [
            _f32p, _f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float]
        _lib.evaudio_resample_len.restype = ctypes.c_int64
        _lib.evaudio_resample_len.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                              ctypes.c_int64]
        _lib.evaudio_resample_poly.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _f32p]
    except OSError:
        _lib = None


def available() -> bool:
    return _lib is not None


def _as_f32(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, np.float32)


def peak(x: np.ndarray) -> float:
    if _lib is not None:
        xc = _as_f32(x)
        return float(_lib.evaudio_peak(
            xc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), xc.size))
    return float(np.abs(x).max()) if x.size else 0.0


def float_to_int16(x: np.ndarray, scale: float = 32768.0) -> np.ndarray:
    if _lib is not None:
        xc = _as_f32(x)
        out = np.empty(xc.size, np.int16)
        _lib.evaudio_float_to_int16(
            xc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            xc.size, ctypes.c_float(scale))
        return out.reshape(x.shape)
    return np.clip(np.round(x * scale), -32768, 32767).astype(np.int16)


def frame_rms(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    n_frames = 1 + len(y) // hop_length
    if _lib is not None:
        yc = _as_f32(y)
        out = np.empty(n_frames, np.float64)
        _lib.evaudio_frame_rms(
            yc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), yc.size,
            frame_length, hop_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_frames)
        return out
    from ..audiokit.slicer import frame_rms as np_frame_rms

    return np_frame_rms(y, frame_length, hop_length)[:n_frames]


def mix_normalize(x: np.ndarray, maxx: float, alpha: float,
                  scale: float) -> np.ndarray:
    p = peak(x)
    if _lib is not None:
        xc = _as_f32(x)
        out = np.empty_like(xc)
        _lib.evaudio_mix_normalize(
            xc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            xc.size, ctypes.c_float(p), ctypes.c_float(maxx),
            ctypes.c_float(alpha), ctypes.c_float(scale))
        return out
    if p <= 0:
        return np.zeros_like(x)
    return (x / p * (maxx * alpha * scale)
            + (1 - alpha) * scale * x).astype(np.float32)


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    from math import gcd

    g = gcd(up, down)
    up, down = up // g, down // g
    if up == down:
        return np.asarray(x, np.float32)
    if _lib is not None:
        xc = _as_f32(x)
        out_n = int(_lib.evaudio_resample_len(xc.size, up, down))
        out = np.empty(out_n, np.float32)
        _lib.evaudio_resample_poly(
            xc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), xc.size,
            up, down, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    from scipy.signal import resample_poly as sp

    return sp(x, up, down).astype(np.float32)
