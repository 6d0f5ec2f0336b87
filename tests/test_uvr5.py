"""UVR5 building-block tests: STFT round trip, band combine/split, net shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easevoice_trainer_tpu.audiokit import uvr5


def test_stft_istft_roundtrip(rng):
    wav = rng.uniform(-0.5, 0.5, (2, 8000)).astype(np.float32)
    spec = uvr5._stft(wav, 512, 128)
    back = uvr5._istft(spec, 128)
    n = min(wav.shape[1], back.shape[1])
    np.testing.assert_allclose(back[:, 256:n - 256], wav[:, 256:n - 256],
                               atol=1e-3)


def test_band_params_load():
    mp = uvr5.load_band_params("4band_v2.json")
    assert mp["bins"] == 672
    assert len(mp["band"]) == 4
    # all 25 presets parse
    import os
    for f in os.listdir(uvr5.PARAMS_DIR):
        assert uvr5.load_band_params(f)["bins"] > 0


def test_cascaded_net_shapes(rng):
    net = uvr5.CascadedASPPNet(n_fft=128, ch1=4, ch2=2, ch3=4, enlarge=False)
    x = rng.normal(size=(1, 65, 64, 2)).astype(np.float32) ** 2
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = net.apply(variables, jnp.asarray(x))
    assert y.shape == x.shape
    out = np.asarray(y)
    assert np.isfinite(out).all()
    # mask in [0,1] times mix -> bounded by |mix|
    assert (np.abs(out) <= np.abs(x) + 1e-5).all()


def test_bilinear_align_corners_matches_torch(rng):
    import torch
    x = rng.normal(size=(1, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(uvr5._bilinear_x2_align_corners(jnp.asarray(x)))
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
            mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
