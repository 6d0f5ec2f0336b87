"""UVR5 building-block tests: STFT round trip, band combine/split, net shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the default fast run

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


def test_deecho_net_shapes(rng):
    from easevoice_trainer_tpu.audiokit.uvr5_deecho import CascadedNet
    net = CascadedNet(n_fft=128, nout=8, nout_lstm=16)
    x = rng.normal(size=(1, 65, 64, 2)).astype(np.float32) ** 2
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mask = net.apply(variables, jnp.asarray(x))
    out = np.asarray(mask)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()   # sigmoid mask


def test_deecho_lstm_matches_torch(rng):
    """flax bi-LSTM wiring vs torch nn.LSTM on the same weights."""
    import torch
    from easevoice_trainer_tpu.audiokit.uvr5_deecho import _lstm_cell
    from easevoice_trainer_tpu.train.ckpt import unflatten_tree
    from flax import linen as nn_
    nin, H, T = 6, 4, 5
    tl = torch.nn.LSTM(input_size=nin, hidden_size=H, bidirectional=True)
    state = {f"l.{k}": v.detach().numpy() for k, v in
             tl.state_dict().items()}
    state = {k.replace("l.", "l."): v for k, v in state.items()}
    flat = {}
    _lstm_cell({f"l.{k}".replace("l.l.", "l."): v for k, v in state.items()},
               "l", flat, "fwd/cell", reverse=False)
    _lstm_cell({f"l.{k}".replace("l.l.", "l."): v for k, v in state.items()},
               "l", flat, "bwd/cell", reverse=True)
    params = unflatten_tree(flat)

    x = rng.normal(size=(1, T, nin)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tl(torch.from_numpy(x).permute(1, 0, 2))
    ref = ref.permute(1, 0, 2).numpy()  # (1, T, 2H)

    fwd = nn_.RNN(nn_.LSTMCell(H))
    bwd = nn_.RNN(nn_.LSTMCell(H), reverse=True, keep_order=True)
    of = fwd.apply({"params": params["fwd"]["cell"] and {"cell": params["fwd"]["cell"]}}, jnp.asarray(x))
    ob = bwd.apply({"params": {"cell": params["bwd"]["cell"]}}, jnp.asarray(x))
    ours = np.concatenate([np.asarray(of), np.asarray(ob)], axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bs_roformer_tiny(rng):
    from easevoice_trainer_tpu.audiokit.bs_roformer import (
        BSRoformer, BSRoformerConfig, apply_rotary, rotary_freqs)
    cfg = BSRoformerConfig(
        dim=16, depth=1, stereo=False, freqs_per_bands=(2, 3, 4),
        dim_head=8, heads=2, stft_n_fft=16, stft_hop_length=8,
        mask_estimator_depth=2)
    # freqs 2+3+4=9 = 16//2+1 bins
    model = BSRoformer(cfg)
    B, T = 1, 6
    spec = rng.normal(size=(B, 9, T, 2)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(spec))
    mask = model.apply(variables, jnp.asarray(spec))
    assert mask.shape == spec.shape
    assert np.isfinite(np.asarray(mask)).all()

    # rotary is norm-preserving and position-dependent
    x = rng.normal(size=(1, 2, 5, 8)).astype(np.float32)
    freqs = rotary_freqs(8, 5)
    r = np.asarray(apply_rotary(jnp.asarray(x), freqs))
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)
    assert not np.allclose(r[0, 0, 1], x[0, 0, 1])
    np.testing.assert_allclose(r[0, 0, 0], x[0, 0, 0], atol=1e-6)  # pos 0


def test_bs_roformer_stft_roundtrip(rng):
    from easevoice_trainer_tpu.audiokit.bs_roformer import BSRoformerSeparator
    sep = BSRoformerSeparator.__new__(BSRoformerSeparator)
    from easevoice_trainer_tpu.audiokit.bs_roformer import BSRoformerConfig
    sep.cfg = BSRoformerConfig()
    wav = rng.uniform(-0.5, 0.5, (2, 44100)).astype(np.float32)
    spec = sep._stft(wav)
    back = sep._istft(spec, wav.shape[-1])
    np.testing.assert_allclose(back[:, 2048:-2048], wav[:, 2048:-2048],
                               atol=2e-3)
