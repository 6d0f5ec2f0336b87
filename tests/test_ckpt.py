"""Checkpoint interop tests: flax -> torch -> flax round trips, numeric
equivalence of the weight-norm reparameterization, and torch-conv parity."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the default fast run
import torch

from easevoice_trainer_tpu.models.sovits import SynthesizerTrn, SovitsConfig, MultiPeriodDiscriminator
from easevoice_trainer_tpu.models.gpt import Text2SemanticDecoder, T2SConfig
from easevoice_trainer_tpu.train import ckpt


def tiny_sovits():
    cfg = SovitsConfig(
        spec_channels=1025, segment_size=2560, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        upsample_initial_channel=32, gin_channels=32, ssl_dim=64,
        n_symbols=50, p_dropout=0.0)
    model = SynthesizerTrn(cfg)
    key = jax.random.PRNGKey(0)
    B, T = 1, 8
    variables = model.init(
        {"params": key, "slice": key, "latent": key, "dropout": key},
        jnp.zeros((B, 8, 64)), jnp.zeros((B, T, 1025)),
        jnp.array([T]), jnp.zeros((B, 4), jnp.int32), jnp.array([4]))
    return cfg, model, variables


def _tree_allclose(a, b, atol=1e-6):
    fa = ckpt.flatten_tree(a)
    fb = ckpt.flatten_tree(b)
    assert set(fa) == set(fb), (
        sorted(set(fa) - set(fb))[:5], sorted(set(fb) - set(fa))[:5])
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=atol, err_msg=k)


def test_sovits_roundtrip(tmp_path):
    cfg, model, variables = tiny_sovits()
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    torch_flat = ckpt.flax_to_torch(params, ckpt.sovits_generator_rules())
    # every exported key looks like a reference SynthesizerTrn key
    for k in torch_flat:
        assert not k.startswith(("layer_", "wn")), k
    back, unmatched = ckpt.torch_to_flax(torch_flat,
                                         ckpt.sovits_generator_rules())
    assert not unmatched
    _tree_allclose(params, back)


def test_sovits_export_load_file(tmp_path):
    cfg, model, variables = tiny_sovits()
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    path = str(tmp_path / "s2G_test.pth")
    ckpt.export_sovits_weights(params, path, config={"foo": 1}, info="e8",
                               half=False)
    obj = torch.load(path, map_location="cpu", weights_only=False)
    assert set(obj) == {"weight", "config", "info"}
    assert not any(k.startswith("enc_q") for k in obj["weight"])  # dropped
    tree, unmatched = ckpt.load_sovits_pretrained(path)
    assert not unmatched
    assert "enc_q" not in tree
    _tree_allclose({k: v for k, v in params.items() if k != "enc_q"}, tree)


def test_gpt_roundtrip():
    cfg = T2SConfig(vocab_size=33, phoneme_vocab_size=20, embedding_dim=32,
                    hidden_dim=32, n_heads=4, n_layers=2, ffn_dim=64,
                    dropout=0.0, eos_id=32)
    model = Text2SemanticDecoder(cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.array([6]),
        jnp.zeros((1, 4, 1024)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    torch_flat = ckpt.flax_to_torch(params, ckpt.gpt_rules())
    assert "h.layers.0.self_attn.in_proj_weight" in torch_flat
    assert "ar_predict_layer.weight" in torch_flat
    back, unmatched = ckpt.torch_to_flax(torch_flat, ckpt.gpt_rules())
    assert not unmatched
    _tree_allclose(params, back)


def test_discriminator_roundtrip():
    mpd = MultiPeriodDiscriminator()
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 2560, 1))
    variables = mpd.init(key, x, x)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    torch_flat = ckpt.flax_to_torch(params, ckpt.sovits_discriminator_rules())
    assert "discriminators.0.convs.0.weight_g" in torch_flat
    assert "discriminators.5.conv_post.weight_v" in torch_flat
    back, unmatched = ckpt.torch_to_flax(torch_flat,
                                         ckpt.sovits_discriminator_rules())
    assert not unmatched
    _tree_allclose(params, back)


def test_weight_norm_matches_torch():
    """Our (g, v) conv must equal torch's weight_norm conv numerically."""
    from easevoice_trainer_tpu.nn.layers import WNConv1d
    rng = np.random.default_rng(0)
    cin, cout, k, T = 8, 12, 5, 32
    x = rng.normal(size=(2, T, cin)).astype(np.float32)

    tconv = torch.nn.Conv1d(cin, cout, k, padding=2)
    tconv = torch.nn.utils.weight_norm(tconv)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()

    g = tconv.weight_g.detach().numpy()     # (out,1,1)
    v = tconv.weight_v.detach().numpy()     # (out,in,k)
    bias = tconv.bias.detach().numpy()

    layer = WNConv1d(cin, cout, k)
    params = {"wn": {"g": g.reshape(-1), "v": v.transpose(2, 1, 0)},
              "bias": bias}
    y = layer.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ty,
                               atol=1e-4)


def test_weight_norm_transposed_matches_torch():
    from easevoice_trainer_tpu.nn.layers import WNConvTranspose1d
    rng = np.random.default_rng(1)
    cin, cout, k, s, p, T = 6, 4, 16, 8, 4, 10
    x = rng.normal(size=(1, T, cin)).astype(np.float32)

    tconv = torch.nn.ConvTranspose1d(cin, cout, k, s, padding=p)
    tconv = torch.nn.utils.weight_norm(tconv)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()

    g = tconv.weight_g.detach().numpy()     # (in,1,1)
    v = tconv.weight_v.detach().numpy()     # (in,out,k)
    bias = tconv.bias.detach().numpy()

    layer = WNConvTranspose1d(cin, cout, k, s, padding=p)
    params = {"wn": {"g": g.reshape(-1), "v": v.transpose(2, 1, 0)},
              "bias": bias}
    y = layer.apply({"params": params}, jnp.asarray(x))
    assert y.shape[1] == (T - 1) * s - 2 * p + k
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ty,
                               atol=1e-4)
