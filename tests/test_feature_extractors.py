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
