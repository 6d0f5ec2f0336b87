"""rubberband CLI wrappers: time-stretch / pitch-shift.

Contract-compatible with the reference pyrb module
(reference: src/audiokit/uvr5/pyrb.py:23-92): shells out to the `rubberband`
binary over temp WAV files; raises a clear error when the binary is absent.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

from ..utils import audio_io

__RUBBERBAND = "rubberband"


def _require_binary() -> None:
    if shutil.which(__RUBBERBAND) is None:
        raise RuntimeError(
            "rubberband CLI not found; install rubberband-cli to use "
            "time_stretch / pitch_shift")


def _run(y: np.ndarray, sr: int, args: list[str]) -> np.ndarray:
    _require_binary()
    fd_in, path_in = tempfile.mkstemp(suffix=".wav")
    fd_out, path_out = tempfile.mkstemp(suffix=".wav")
    os.close(fd_in)
    os.close(fd_out)
    try:
        audio_io.write_wav(path_in, y, sr)
        subprocess.run([__RUBBERBAND, "-q", *args, path_in, path_out],
                       check=True, capture_output=True)
        out, _ = audio_io.read_wav(path_out)
        return out
    finally:
        for p in (path_in, path_out):
            try:
                os.remove(p)
            except OSError:
                pass


def time_stretch(y: np.ndarray, sr: int, rate: float) -> np.ndarray:
    """rate > 1 speeds up (shorter output)."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    return _run(y, sr, ["--tempo", str(rate)])


def pitch_shift(y: np.ndarray, sr: int, n_steps: float) -> np.ndarray:
    """Shift by n_steps semitones."""
    return _run(y, sr, ["--pitch", str(n_steps)])
