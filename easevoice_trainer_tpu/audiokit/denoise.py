"""Speech denoising stage.

The reference wraps modelscope's FRCRN ANS pipeline
(reference: src/audiokit/denoise/denoise.py:9-21).  modelscope/torch-FRCRN
weights are not present in this environment; ``Denoise`` therefore tries
(1) a modelscope pipeline when importable, then (2) a light spectral-gate
denoiser implemented here (noise-floor estimate per band + soft mask) as a
dependency-free fallback. [[denoise-frcrn-port]] tracks a JAX FRCRN port.
"""
from __future__ import annotations

import numpy as np

from ..utils import audio_io


class Denoise:
    SR = 16000  # FRCRN operates at 16 kHz in the reference

    def __init__(self):
        self._pipeline = None
        try:
            from modelscope.pipelines import pipeline
            from modelscope.utils.constant import Tasks

            self._pipeline = pipeline(
                Tasks.acoustic_noise_suppression,
                model="damo/speech_frcrn_ans_cirm_16k")
        except Exception:
            self._pipeline = None

    def denoise(self, input_path: str, output_path: str) -> None:
        if self._pipeline is not None:
            self._pipeline(input_path, output_path=output_path)
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
