"""STFT / linear-spectrogram / mel-spectrogram in JAX.

Numerically matches the reference's torch pipeline
(reference: src/easevoice/module/mel_processing.py:40-142):

* reflect-pad the waveform by ``(n_fft - hop) / 2`` on each side, then a
  center=False STFT with a periodic Hann window,
* magnitude = ``sqrt(re^2 + im^2 + 1e-6)``,
* mel projection with the Slaney filterbank, then
  log-compression ``log(clamp(x, min=1e-5))``.

Layout is channels-last: spectrograms are ``(batch, frames, bins)`` —
transposed relative to the torch reference's ``(B, bins, frames)`` — because
the contraction ``frames x bins @ bins x mels`` then maps directly onto the
MXU without relayout.

Everything here is shape-static and jit-safe; the mel matrix is computed on
host once per config and closed over as a constant.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Spectrogram hyperparameters (mirrors configs/s2.json "data")."""

    sampling_rate: int = 32000
    n_fft: int = 2048
    hop_length: int = 640
    win_length: int = 2048
    n_mels: int = 128
    fmin: float = 0.0
    fmax: float | None = None

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        return num_samples // self.hop_length


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (same as torch.hann_window(periodic=True))."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)
    return w.astype(dtype)


def _frame(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., samples) -> (..., frames, frame_length), static shapes."""
    num_frames = 1 + (y.shape[-1] - frame_length) // hop
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return y[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def spectrogram(
    y: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 640,
    win_length: int = 2048,
) -> jnp.ndarray:
    """Magnitude spectrogram of ``(..., samples)`` -> ``(..., frames, n_fft//2+1)``.

    frames == samples // hop_length when samples is a hop multiple.
    """
    y = y.astype(jnp.float32)
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(y, n_fft, hop_length)
    window = hann_window(win_length)
    if win_length < n_fft:  # torch center-pads the window up to n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-6)


def _mel_matrix(cfg: MelConfig) -> np.ndarray:
    # (n_freq, n_mels) so that spec @ mel maps frames x bins onto the MXU
    return mel_filterbank(cfg.sampling_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax).T


@functools.partial(jax.jit, static_argnames=("cfg",))
def spec_to_mel(spec: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """(..., frames, n_freq) linear magnitude -> (..., frames, n_mels) log-mel."""
    mel_mat = jnp.asarray(_mel_matrix(cfg), dtype=spec.dtype)
    mel = jnp.matmul(spec, mel_mat, preferred_element_type=jnp.float32)
    return dynamic_range_compression(mel)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Waveform ``(..., samples)`` -> log-mel ``(..., frames, n_mels)``."""
    spec = spectrogram(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    return spec_to_mel(spec, cfg)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    return jnp.log(jnp.clip(x, min=clip_val))


def dynamic_range_decompression(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)
