"""Speech denoising stage.

The reference wraps modelscope's FRCRN ANS pipeline
(reference: src/audiokit/denoise/denoise.py:9-21).  Backend order here:

1. a modelscope pipeline when the package is importable (exact reference
   behavior);
2. the TPU-native JAX FRCRN port (:mod:`.frcrn`) when a torch checkpoint
   is present (``EASEVOICE_FRCRN_PATH`` or
   ``{base}/models/denoise/speech_frcrn_ans_cirm_16k/``);
3. a light spectral-gate denoiser (noise-floor estimate per band + soft
   mask) as a dependency-free fallback — a different algorithm, exposed
   as such via :attr:`Denoise.backend`.
"""
from __future__ import annotations

import numpy as np

from ..utils import audio_io
from ..utils.logger import logger


class Denoise:
    SR = 16000  # FRCRN operates at 16 kHz in the reference

    def __init__(self):
        self._pipeline = None
        self._frcrn = None
        self.backend = "spectral-gate"
        try:
            from modelscope.pipelines import pipeline
            from modelscope.utils.constant import Tasks

            self._pipeline = pipeline(
                Tasks.acoustic_noise_suppression,
                model="damo/speech_frcrn_ans_cirm_16k")
            self.backend = "modelscope"
            return
        except Exception:
            self._pipeline = None
        try:
            from . import frcrn

            path = frcrn.default_model_path()
            if path:
                self._frcrn = frcrn.FRCRNDenoiser(path)
                self.backend = "frcrn-jax"
        except Exception:
            logger.exception("FRCRN weights present but failed to load; "
                             "falling back to spectral gate")
            self._frcrn = None

    def denoise(self, input_path: str, output_path: str) -> None:
        if self._pipeline is not None:
            self._pipeline(input_path, output_path=output_path)
            return
        if self._frcrn is not None:
            self._frcrn.denoise(input_path, output_path)
            return
        wav, sr = audio_io.read_wav(input_path)
        out = spectral_gate(wav, sr)
        audio_io.write_wav(output_path, out, sr)


def spectral_gate(wav: np.ndarray, sr: int, n_fft: int = 1024,
                  hop: int = 256, reduction_db: float = 12.0) -> np.ndarray:
    """Soft spectral-subtraction denoiser (stationary noise floor)."""
    if len(wav) < n_fft:
        return wav
    window = np.hanning(n_fft).astype(np.float32)
    n_frames = 1 + (len(wav) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = wav[idx] * window
    spec = np.fft.rfft(frames, axis=-1)
    mag = np.abs(spec)
    # noise floor: 10th percentile magnitude per bin
    noise = np.percentile(mag, 10, axis=0, keepdims=True)
    gain = np.maximum(1.0 - (noise / np.maximum(mag, 1e-9)) ** 2, 0.0)
    floor = 10 ** (-reduction_db / 20.0)
    gain = np.maximum(gain, floor)
    cleaned = spec * gain
    # overlap-add
    out = np.zeros(len(wav), np.float32)
    norm = np.zeros(len(wav), np.float32)
    frames_out = np.fft.irfft(cleaned, n=n_fft, axis=-1).astype(np.float32)
    for i in range(n_frames):
        start = i * hop
        out[start:start + n_fft] += frames_out[i] * window
        norm[start:start + n_fft] += window ** 2
    out /= np.maximum(norm, 1e-8)
    return out
