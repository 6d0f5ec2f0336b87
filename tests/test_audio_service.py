"""AudioService stereo contract + audio_io stereo round-trips.

The reference separates true stereo and writes stereo stems
(reference: src/audiokit/uvr5/separate.py:48-76); these tests pin the
(channels, samples) layout end-to-end through the service.
"""
import os
import wave

import numpy as np
import pytest

from easevoice_trainer_tpu.utils import audio_io


def _stereo_fixture(n=32000):
    t = np.arange(n, dtype=np.float32)
    left = 0.5 * np.sin(2 * np.pi * 440 * t / 32000)
    right = 0.3 * np.sin(2 * np.pi * 220 * t / 32000)
    return np.stack([left, right])


def test_wav_stereo_roundtrip(tmp_path):
    path = str(tmp_path / "st.wav")
    data = _stereo_fixture()
    audio_io.write_wav(path, data, 32000)
    with wave.open(path, "rb") as w:
        assert w.getnchannels() == 2
    back, sr = audio_io.read_wav(path, mono=False)
    assert sr == 32000 and back.shape == data.shape
    np.testing.assert_allclose(back, data, atol=1.0 / 32768)
    # mono downmix is the channel mean
    mono, _ = audio_io.read_wav(path)
    np.testing.assert_allclose(mono, data.mean(axis=0), atol=2.0 / 32768)


def test_load_audio_stereo(tmp_path):
    path = str(tmp_path / "st.wav")
    data = _stereo_fixture()
    audio_io.write_wav(path, data, 32000)
    out = audio_io.load_audio(path, 32000, mono=False)
    assert out.shape[0] == 2
    np.testing.assert_allclose(out, data, atol=1.0 / 32768)
    # mono path still 1-D
    assert audio_io.load_audio(path, 32000).ndim == 1


def test_uvr5_passthrough_preserves_stereo(tmp_path, monkeypatch):
    from easevoice_trainer_tpu.service.audio import AudioService

    monkeypatch.setenv("EASEVOICE_ALLOW_PASSTHROUGH", "1")
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    audio_io.write_wav(str(src / "song.wav"), _stereo_fixture(44100), 44100)
    svc = AudioService(str(src), str(out))
    resp = svc.uvr5(model_name="definitely_not_a_model")
    assert resp.ok
    vocal_path = out / "vocals" / "vocal_song.wav.wav"
    assert vocal_path.exists()
    with wave.open(str(vocal_path), "rb") as w:
        assert w.getnchannels() == 2  # stereo preserved through the service
    # trace is a pure per-file map (no __mode__/__backend__ pseudo keys)
    assert all(not k.startswith("__") for k in resp.data)


def test_vr_multiband_stereo_shape(rng):
    """The multiband synthesis chain emits (2, T) without channel mixdown."""
    from easevoice_trainer_tpu.audiokit import uvr5

    sep = uvr5.VRSeparator.__new__(uvr5.VRSeparator)
    sep.mp = uvr5.load_band_params("4band_v2.json")
    wav = np.asarray(rng.uniform(-0.5, 0.5, (2, sep.mp["sr"])), np.float32)
    specs = sep._band_specs(wav)
    comb = sep._combine(specs)
    back = sep._multiband_to_wave(sep._split_mask(comb, specs))
    assert back.ndim == 2 and back.shape[0] == 2
    # identity mask roughly reconstructs each channel; band-crossover fades
    # lose energy on white noise, so this is a loose sanity bound (exact
    # parity vs reference spec_utils is in test_spec_utils_diff.py)
    n = min(back.shape[-1], wav.shape[-1])
    corr = [np.corrcoef(back[c, 4000:n - 4000],
                        wav[c, 4000:n - 4000])[0, 1] for c in (0, 1)]
    assert min(corr) > 0.8
    # channels stay distinct (no mixdown): L of output tracks L of input
    # better than it tracks R
    cross = np.corrcoef(back[0, 4000:n - 4000],
                        wav[1, 4000:n - 4000])[0, 1]
    assert corr[0] > cross + 0.5
