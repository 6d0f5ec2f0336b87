"""JAX HuBERT/BERT vs HF torch implementations — numeric parity on tiny
configs (the real checkpoints use the same architectures scaled up)."""
import json
import os

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")


def test_hubert_matches_hf(tmp_path, rng):
    from transformers import HubertConfig as HFConfig, HubertModel

    hf_cfg = HFConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[16] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_act="gelu", layer_norm_eps=1e-5,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False)
    with torch.no_grad():
        hf = HubertModel(hf_cfg).eval()
    # save in HF layout
    d = tmp_path / "hubert"
    d.mkdir()
    torch.save(hf.state_dict(), d / "pytorch_model.bin")
    (d / "config.json").write_text(hf_cfg.to_json_string())

    from easevoice_trainer_tpu.models.cnhubert import load_cnhubert

    model, params = load_cnhubert(str(d))
    assert params is not None

    wav = rng.normal(size=(1, 8000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    ours = np.asarray(model.apply(params, wav))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


def test_bert_matches_hf(tmp_path, rng):
    from transformers import BertConfig as HFBertConfig, BertModel

    hf_cfg = HFBertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu", layer_norm_eps=1e-12)
    with torch.no_grad():
        hf = BertModel(hf_cfg).eval()
    state = {k: v.to(torch.float32).numpy() for k, v in hf.state_dict().items()}

    from easevoice_trainer_tpu.models.bert import BertModel as JBert, BertConfig, convert_hf_bert

    cfg = BertConfig(vocab_size=211, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64, max_position=128)
    jmodel = JBert(cfg)
    params = {"params": convert_hf_bert(state)}

    ids = rng.integers(0, 211, (1, 12)).astype(np.int32)
    mask = np.ones((1, 12), np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids).long(),
                 attention_mask=torch.from_numpy(mask).long(),
                 output_hidden_states=True)
    hidden = jmodel.apply(params, ids, mask)
    # compare the -3rd hidden state (the one the pipeline extracts)
    ref_h = ref.hidden_states[-3].numpy()
    np.testing.assert_allclose(np.asarray(hidden[-3]), ref_h,
                               atol=2e-4, rtol=2e-4)


def test_hubert_bucketed_padding_is_exact(rng):
    """The normalize pipeline pads clips to 0.5 s buckets and passes
    ``lengths`` so XLA compiles once per bucket (normalization.py ssl
    stage); masked padding must leave the valid frames bit-identical."""
    from easevoice_trainer_tpu.models.cnhubert import CNHubert, HubertConfig

    cfg = HubertConfig(hidden_size=32, num_layers=2, num_heads=4,
                       intermediate_size=64)
    model = CNHubert(cfg)
    wav = rng.normal(size=(1, 5120)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jax.numpy.asarray(wav))

    direct = np.asarray(model.apply(params, wav))
    padded = np.zeros((1, 8000), np.float32)
    padded[:, :5120] = wav
    bucketed = np.asarray(model.apply(
        params, padded, jax.numpy.asarray([5120], jax.numpy.int32)))
    frames = direct.shape[1]
    np.testing.assert_allclose(bucketed[:, :frames], direct,
                               rtol=2e-5, atol=2e-5)


def test_extract_latent_bucketed_padding_is_exact(rng):
    """Token stage pads the ssl time axis to a 32-frame bucket; the VALID
    k=2 s=2 ssl_proj + per-frame quantizer must give identical codes for
    the real frames (normalization.py token stage)."""
    from easevoice_trainer_tpu.models.sovits import SynthesizerTrn, SovitsConfig

    cfg = SovitsConfig(
        spec_channels=129, segment_size=2560, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        upsample_initial_channel=32, gin_channels=32, ssl_dim=64,
        n_symbols=50)
    model = SynthesizerTrn(cfg)
    ssl = rng.normal(size=(1, 50, cfg.ssl_dim)).astype(np.float32)
    B, frames = 1, 16
    key = jax.random.PRNGKey(0)
    wav = rng.uniform(-0.5, 0.5, (B, frames * 640)).astype(np.float32)
    from easevoice_trainer_tpu.train.data import spectrogram_np
    spec = np.stack([spectrogram_np(w, 2048, 640, 2048) for w in wav])[..., :cfg.spec_channels]
    # init via eval_shape-free full init on tiny shapes
    variables = model.init(
        {"params": key, "slice": key, "latent": key, "dropout": key},
        np.zeros((B, 16, cfg.ssl_dim), np.float32), spec.astype(np.float32),
        np.full((B,), frames, np.int32),
        np.zeros((B, 8), np.int32), np.full((B,), 8, np.int32))

    direct = np.asarray(model.apply(
        {"params": variables["params"]}, ssl,
        method=SynthesizerTrn.extract_latent))
    padded = np.pad(ssl, ((0, 0), (0, 64 - 50), (0, 0)))
    bucketed = np.asarray(model.apply(
        {"params": variables["params"]}, padded,
        method=SynthesizerTrn.extract_latent))
    np.testing.assert_array_equal(bucketed[:, : direct.shape[1]], direct)
