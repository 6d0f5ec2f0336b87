"""Minimal stand-in for the `ffmpeg-python` package, used ONLY to run the
reference recipe (`/root/reference/src/utils/audio/__init__.py:24-27`) as a
baseline benchmark on hosts without the ffmpeg CLI.

Implements exactly the fluent chain the reference calls:

    ffmpeg.input(file, threads=0).output("-", format="f32le",
        acodec="pcm_f32le", ac=1, ar=sr).run(cmd=[...], capture_stdout=True,
        capture_stderr=True) -> (f32le_bytes, b"")

Decodes PCM WAV with the stdlib `wave` module (the benchmark fixtures are
16-bit mono WAVs); resamples by linear interpolation if `ar` differs.
"""
from __future__ import annotations

import wave

import numpy as np


class _Stream:
    def __init__(self, path: str):
        self._path = path
        self._ar = None
        self._ac = 1

    def output(self, dest, **kwargs):
        self._ar = int(kwargs.get("ar", 0)) or None
        self._ac = int(kwargs.get("ac", 1))
        fmt = kwargs.get("format", "f32le")
        if fmt != "f32le":
            raise ValueError(f"ffmpeg shim only supports f32le, got {fmt}")
        return self

    def run(self, cmd=None, capture_stdout=True, capture_stderr=True):
        with wave.open(self._path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            ch = w.getnchannels()
            raw = w.readframes(n)
        if width == 2:
            x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        elif width == 4:
            x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported WAV sample width {width}")
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1)
        if self._ar and self._ar != sr:
            t_out = np.arange(int(round(len(x) * self._ar / sr)),
                              dtype=np.float64) * (sr / self._ar)
            x = np.interp(t_out, np.arange(len(x), dtype=np.float64),
                          x).astype(np.float32)
        return x.astype("<f4").tobytes(), b""


def input(path: str, **kwargs) -> _Stream:  # noqa: A001 - ffmpeg API name
    return _Stream(path)
