"""Fixture-audio easy-mode chain, end to end with REAL stages.

Unlike test_easy_mode.py (stubbed orchestration contract), this runs the
whole 7-step chain (reference: src/cmd/easy_mode.py:67-131) on a
synthetic fixture wav with tiny real models:

  uvr5 (passthrough) -> slicer (real RMS slicing) -> denoise
  (passthrough) -> asr (injected recognizer) -> normalize (real text/
  G2P + tiny BERT + tiny CNHubert + tiny s2G RVQ) -> s2 train -> s1
  train (both as real subprocesses through the connector protocol).

Every artifact contract of SURVEY.md §1.2 is asserted, so any stage
format drift fails here.
"""
import json
import os
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import torch

from tests.test_trainers import TINY_GPT, TINY_S2


def _write_wav(path, wav, sr):
    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _make_tiny_bert(d):
    """Tiny zh BERT in HF layout: hidden 1024 (the pipeline's BERT
    feature dim contract), char-level tokenizer over the fixture text."""
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=64, hidden_size=1024, num_hidden_layers=3,
        num_attention_heads=8, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    with torch.no_grad():
        hf = BertModel(cfg).eval()
    d.mkdir(parents=True)
    torch.save(hf.state_dict(), d / "pytorch_model.bin")
    (d / "config.json").write_text(cfg.to_json_string())
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "你", "好", "世", "界", "早", "上", "今", "天", "气", "真",
             "不", "错", ".", ",", "?", "!", "-"]
    vocab += [f"[unused{i}]" for i in range(64 - len(vocab))]
    (d / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
    (d / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "BertTokenizer",
                    "do_lower_case": True}))


def _make_tiny_hubert(d):
    from transformers import HubertConfig, HubertModel

    cfg = HubertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[16] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_act="gelu", hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=False)
    with torch.no_grad():
        hf = HubertModel(cfg).eval()
    d.mkdir(parents=True)
    torch.save(hf.state_dict(), d / "pytorch_model.bin")
    (d / "config.json").write_text(cfg.to_json_string())


def _make_tiny_s2g(path, rng):
    """Init a tiny SynthesizerTrn and export reference-format s2G."""
    import jax
    import jax.numpy as jnp

    from easevoice_trainer_tpu.models.sovits import (SovitsConfig,
                                                     SynthesizerTrn)
    from easevoice_trainer_tpu.train import ckpt as ckpt_io

    cfg = SovitsConfig.from_json_dict(TINY_S2)
    model = SynthesizerTrn(cfg)
    ssl = jnp.asarray(rng.normal(size=(1, 32, TINY_S2["model"]["ssl_dim"]))
                      .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), ssl,
                        method=SynthesizerTrn.extract_latent)["params"]
    ckpt_io.export_sovits_weights(params, str(path), config=TINY_S2)


def test_easy_mode_fixture_chain(tmp_path, rng, monkeypatch):
    import yaml

    base = tmp_path / "base"
    (base / "configs").mkdir(parents=True)
    (base / "configs" / "s2.json").write_text(json.dumps(TINY_S2))
    (base / "configs" / "gpt.yaml").write_text(yaml.safe_dump(TINY_GPT))
    monkeypatch.setenv("EASEVOICE_BASE_PATH", str(base))
    monkeypatch.setenv("EASEVOICE_ALLOW_PASSTHROUGH", "1")

    pre = tmp_path / "pretrained"
    _make_tiny_bert(pre / "bert")
    _make_tiny_hubert(pre / "hubert")
    _make_tiny_s2g(pre / "s2g.pth", rng)
    monkeypatch.setenv("bert_path", str(pre / "bert"))
    monkeypatch.setenv("cnhubert_path", str(pre / "hubert"))
    monkeypatch.setenv("sovits_path", str(pre / "s2g.pth"))

    # fixture: three loud 5.5 s tone bursts separated by deep silence so
    # the real RMS slicer yields multiple slices
    sr = 32000
    seg = []
    for i in range(3):
        t = np.arange(int(5.5 * sr)) / sr
        tone = 0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t)
        tone *= (1 + 0.3 * np.sin(2 * np.pi * 3 * t))  # AM so RMS varies
        seg.append(tone)
        seg.append(np.zeros(int(1.2 * sr)))
    wav = np.concatenate(seg).astype(np.float32)
    source = tmp_path / "src"
    source.mkdir()
    _write_wav(source / "fixture.wav", wav, sr)

    # inject the recognizer (the ASR models themselves are parity-tested
    # in test_paraformer/test_whisper); everything downstream is real
    # transcript must clear the reference's 3<phones/sec<25 dataset
    # filter (auto_reg/data/dataset.py:147-153) at ~5.5 s per slice
    from easevoice_trainer_tpu.service.audio import AudioService
    monkeypatch.setattr(
        AudioService, "_load_asr",
        staticmethod(lambda *a, **k: (lambda path: "你好世界，今天天气真不错。")))

    from easevoice_trainer_tpu.cmd import easy_mode
    from easevoice_trainer_tpu.utils.response import ResponseStatus

    project = tmp_path / "proj"
    project.mkdir()
    resp = easy_mode.main({
        "source_dir": str(source),
        "project_dir": str(project),
        "sovits_output_name": "tiny_e2e",
        "gpt_output_name": "tiny_e2e",
    })
    assert resp.status == ResponseStatus.SUCCESS, resp.message

    out_dirs = [p for p in source.iterdir() if p.name.startswith("easy_mode_")]
    assert len(out_dirs) == 1
    out = out_dirs[0]

    # --- audio stage artifacts (SURVEY §1.2) ---
    vocals = list((out / "vocals").glob("*.wav"))
    assert vocals, "uvr5 passthrough must still write vocal_*"
    slices = list((out / "slices").glob("*.wav"))
    assert len(slices) >= 2, "slicer should split the fixture"
    denoised = list((out / "denoises").glob("*.wav"))
    assert len(denoised) == len(slices)
    asr_list = (out / "asrs" / "asr.list").read_text(encoding="utf-8")
    assert asr_list.strip(), "asr.list must be non-empty"
    for line in asr_list.strip().splitlines():
        path, lang, text = line.split("|", 2)
        assert lang == "zh" and text == "你好世界，今天天气真不错。"

    # --- normalize artifacts (random-slug dir, reference
    # normalization/normalize.py:27-29 — locate by its artifact) ---
    norm_dirs = [p for p in out.iterdir()
                 if p.is_dir() and (p / "2-name2text.txt").exists()]
    assert len(norm_dirs) == 1
    norm = norm_dirs[0]
    n2t = (norm / "2-name2text.txt").read_text(encoding="utf-8").strip()
    assert n2t, "2-name2text.txt empty"
    phones_per_clip = [ln.split("\t")[1].split() for ln in n2t.splitlines()]
    assert all(phones_per_clip)
    assert list((norm / "3-bert").glob("*.pt"))
    hubert_files = list((norm / "4-cnhubert").glob("*.pt"))
    assert len(hubert_files) == len(slices)
    feat = torch.load(hubert_files[0], map_location="cpu",
                      weights_only=False)
    assert feat.shape[0] == 1 and feat.shape[1] == 64  # (1, ssl_dim, T)
    assert list((norm / "5-wav32k").glob("*.wav"))
    sem = (norm / "6-name2semantic.tsv").read_text(encoding="utf-8")
    lines = sem.strip().splitlines()
    assert lines[0] == "item_name\tsemantic_audio"
    assert len(lines) - 1 == len(slices)
    codes = [int(v) for v in lines[1].split("\t")[1].split()]
    assert codes and all(0 <= c < 1024 for c in codes)

    # --- trained models ---
    s2_path = resp.data["sovits_output"]
    s1_path = resp.data["gpt_output"]
    assert os.path.exists(s2_path), s2_path
    assert os.path.exists(s1_path), s1_path
    blob = torch.load(s2_path, map_location="cpu", weights_only=False)
    assert set(blob) >= {"weight", "config", "info"}
    assert not any(k.startswith("enc_q") for k in blob["weight"])
    g1 = torch.load(s1_path, map_location="cpu", weights_only=False)
    assert "weight" in g1 or "state_dict" in g1 or isinstance(g1, dict)
