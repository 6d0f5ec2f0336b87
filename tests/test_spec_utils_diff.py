"""Differential test: VRSeparator's multiband combine/split/fade pipeline
== the reference spec_utils implementation.

librosa (absent here) is stubbed with our own stft/istft/resample
primitives on BOTH sides, so the comparison isolates exactly the band
logic: crop/stack, pre-filter roll-off, lpf/hpf fades, progressive
resampling, and mid-side transforms.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_SPEC = ("/root/reference/src/audiokit/uvr5/lib_v5/vr_network/"
            "spec_utils.py")
pytestmark = pytest.mark.skipif(not os.path.exists(REF_SPEC),
                                reason="reference checkout not available")

from easevoice_trainer_tpu.audiokit import uvr5
from easevoice_trainer_tpu.utils import audio_io


@pytest.fixture(scope="module")
def ref_spec_utils():
    lib = types.ModuleType("librosa")

    def stft(y, n_fft, hop_length):
        return uvr5._stft(np.stack([y, y]), n_fft, hop_length)[0]

    def istft(s, hop_length):
        return uvr5._istft(np.stack([s, s]), hop_length)[0]

    def load(path, sr, mono=False, dtype=None, res_type=None):
        raise NotImplementedError

    def resample(y, orig_sr, target_sr, res_type=None):
        return audio_io.resample(np.asarray(y, np.float32), orig_sr,
                                 target_sr)

    lib.stft = stft
    lib.istft = istft
    lib.load = load
    lib.resample = resample
    lib.core = types.SimpleNamespace(load=load, resample=resample)
    sys.modules.setdefault("librosa", lib)
    # keep our stubs even if another test registered an empty module
    sys.modules["librosa"].stft = stft
    sys.modules["librosa"].istft = istft
    sys.modules["librosa"].resample = resample
    sys.modules["librosa"].core = lib.core
    for extra in ("soundfile", "audioread", "tqdm"):
        if extra not in sys.modules:
            mod = types.ModuleType(extra)
            if extra == "tqdm":
                mod.tqdm = lambda *a, **k: types.SimpleNamespace(
                    update=lambda *a: None, close=lambda: None,
                    set_description=lambda *a: None)
            sys.modules[extra] = mod

    sys.path.insert(0, "/root/reference")
    try:
        spec = importlib.util.spec_from_file_location("ref_spec_utils",
                                                      REF_SPEC)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove("/root/reference")

    # cmb_spectrogram_to_wave builds per-band specs with np.ndarray(...) —
    # UNINITIALIZED memory in the never-written bins (out-of-crop rows).
    # Our implementation zero-fills those bins; shadow the module's numpy
    # so the reference does too, otherwise the comparison picks up heap
    # garbage (reference spec_utils.py:363).
    class _ZeroingNumpy:
        def __getattr__(self, name):
            return getattr(np, name)

        @staticmethod
        def ndarray(shape, dtype=float):
            return np.zeros(shape, dtype)

    mod.np = _ZeroingNumpy()
    return mod


class _MP:
    def __init__(self, param):
        self.param = param


def _sep_for(config):
    """A VRSeparator shell with only the multiband machinery (no model)."""
    sep = uvr5.VRSeparator.__new__(uvr5.VRSeparator)
    sep.mp = uvr5.load_band_params(config)
    return sep


@pytest.mark.parametrize("config", ["4band_v2.json", "2band_32000.json",
                                    "1band_sr44100_hl512.json"])
def test_combine_and_reconstruct_match_reference(ref_spec_utils, config, rng):
    sep = _sep_for(config)
    mp = sep.mp
    # the reference's ModelParameters keys bands by int
    ref_mp = _MP({**mp, "band": {int(k): v for k, v in mp["band"].items()}})
    sr = mp["sr"]
    wav = np.asarray(rng.uniform(-0.5, 0.5, (2, sr)), np.float32)  # 1 s

    # ---- analysis: per-band stft chain --------------------------------------
    specs = sep._band_specs(wav)
    bands = mp["band"]
    order = sorted(bands, key=int)
    ref_specs = {}
    waves = {}
    for i, b in reversed(list(enumerate(order, start=1))):
        bp = bands[b]
        if i == len(order):
            waves[i] = wav
        else:
            up_bp = bands[order[i]]
            waves[i] = (waves[i + 1] if bp["sr"] == up_bp["sr"] else
                        audio_io.resample(waves[i + 1], up_bp["sr"],
                                          bp["sr"]))
        ref_specs[i] = ref_spec_utils.wave_to_spectrogram(
            waves[i], bp["hl"], bp["n_fft"], mp["mid_side"],
            mp["mid_side_b2"], mp["reverse"])
    for i, ours in enumerate(specs, start=1):
        np.testing.assert_allclose(ours, ref_specs[i], atol=1e-4,
                                   err_msg=f"band {i} stft ({config})")

    # ---- combine (incl. pre-filter roll-off) --------------------------------
    ours_comb = sep._combine(specs)
    ref_comb = ref_spec_utils.combine_spectrograms(ref_specs, ref_mp)
    assert ours_comb.shape == ref_comb.shape
    np.testing.assert_allclose(ours_comb, ref_comb, atol=1e-4,
                               err_msg=f"combine ({config})")

    # ---- synthesis: fades + progressive resample ----------------------------
    # full stereo comparison: both sides emit true 2-channel audio
    # (reference returns (T, 2), separate.py:48-76 writes stereo stems)
    ours_wav = sep._multiband_to_wave(sep._split_mask(ours_comb, specs))
    ref_wav = ref_spec_utils.cmb_spectrogram_to_wave(ref_comb, ref_mp)
    ref_st = np.asarray(ref_wav).T                   # (T, 2) -> (2, T)
    assert ours_wav.shape[0] == 2
    n = min(ours_wav.shape[-1], ref_st.shape[-1])
    np.testing.assert_allclose(ours_wav[:, :n], ref_st[:, :n], atol=1e-4,
                               err_msg=f"reconstruct ({config})")
