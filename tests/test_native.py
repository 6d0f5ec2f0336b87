"""Native library (csrc/evaudio.cpp) parity tests vs numpy/scipy.
Skipped when the .so has not been built (tools/build_native.sh)."""
import numpy as np
import pytest

from easevoice_trainer_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libevaudio.so not built")


def test_peak_and_int16(rng):
    x = rng.uniform(-0.9, 0.9, 10000).astype(np.float32)
    assert native.peak(x) == pytest.approx(float(np.abs(x).max()), abs=1e-7)
    got = native.float_to_int16(x)
    ref = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got, ref)


def test_frame_rms_matches_numpy(rng):
    from easevoice_trainer_tpu.audiokit.slicer import frame_rms as np_rms
    x = rng.uniform(-0.5, 0.5, 32000).astype(np.float32)
    a = native.frame_rms(x, 640, 160)
    b = np_rms(x, 640, 160)[:len(a)]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_resample_bandlimited_matches_scipy():
    from scipy.signal import resample_poly
    t = np.arange(32000) / 32000.0
    x = (0.5 * np.sin(2 * np.pi * 1000 * t)
         + 0.3 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    for up, down in ((1, 2), (2, 1), (160, 441)):
        a = native.resample_poly(x, up, down)
        b = resample_poly(x, up, down).astype(np.float32)
        n = min(len(a), len(b))
        assert np.abs(a[:n] - b[:n])[200:-200].max() < 2e-3


def test_mix_normalize(rng):
    x = rng.uniform(-0.5, 0.5, 1000).astype(np.float32)
    out = native.mix_normalize(x, 0.95, 0.5, 32768.0)
    peak = np.abs(x).max()
    ref = x / peak * (0.95 * 0.5 * 32768) + 0.5 * 32768 * x
    np.testing.assert_allclose(out, ref, rtol=1e-5)
