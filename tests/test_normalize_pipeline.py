"""Normalize ssl/token stages with stubbed model loaders.

Covers the TPU-specific length-bucketing path added to the extraction
stages (normalization.py ssl/token): artifact shapes must follow the
clips' true lengths (HF conv-frontend formula / 25 Hz code rate), not
the padded bucket, and the reference artifact layout (.pt, (1,768,T))
must hold.  Model-numerics parity is covered by
tests/test_feature_extractors.py.
"""
import os

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")

from easevoice_trainer_tpu import normalization
from easevoice_trainer_tpu.utils import audio_io, paths


@pytest.fixture
def workspace(tmp_path, rng):
    proc = tmp_path / "proc"
    (proc / paths.REFINEMENTS_OUTPUT).mkdir(parents=True)
    (proc / paths.DENOISES_OUTPUT).mkdir()
    lines = []
    for i, sec in enumerate((0.8, 1.3)):
        name = f"c{i}.wav"
        wav = (rng.uniform(-0.4, 0.4, int(32000 * sec)) * 32767).astype(
            np.int16)
        audio_io.write_wav(str(proc / paths.DENOISES_OUTPUT / name),
                           wav, 32000)
        lines.append(f"{name}|zh|你好")
    (proc / paths.REFINEMENTS_OUTPUT / paths.REFINEMENT_FILE).write_text(
        "\n".join(lines), encoding="utf8")
    return proc


def test_ssl_stage_bucketed_shapes(workspace, monkeypatch):
    from easevoice_trainer_tpu.models import cnhubert as ch

    cfg = ch.HubertConfig(conv_dim=(16,) * 7, hidden_size=16, num_layers=1,
                          num_heads=2, intermediate_size=32)
    model = ch.CNHubert(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 8000), np.float32))
    monkeypatch.setattr(ch, "load_cnhubert", lambda path: (model, params))

    norm = normalization.Normalize(str(workspace), "out")
    resp = norm.ssl()
    assert resp.ok, resp.message
    for i, sec in enumerate((0.8, 1.3)):
        pt = os.path.join(norm.hubert_dir, f"c{i}.wav.pt")
        assert os.path.exists(pt)
        ssl = torch.load(pt, weights_only=False)
        n16 = int(16000 * sec)
        want = int(ch.feat_output_lengths(np.asarray(n16)))
        # stored (1, hidden, T) like the reference artifacts
        assert ssl.shape == (1, cfg.hidden_size, want)
        # 32 kHz mixed wav written alongside
        assert os.path.exists(os.path.join(norm.wav_dir, f"c{i}.wav"))


def test_token_stage_bucketed_codes(workspace, monkeypatch, tmp_path):
    # ssl artifacts from the previous stage's contract
    norm = normalization.Normalize(str(workspace), "out")
    t_frames = [39, 64]
    for i, t in enumerate(t_frames):
        normalization.Normalize._save_pt(
            np.random.default_rng(i).normal(size=(1, 64, t)).astype(
                np.float32),
            os.path.join(norm.hubert_dir, f"c{i}.wav.pt"))

    from easevoice_trainer_tpu.models.sovits import SynthesizerTrn, SovitsConfig
    cfg = SovitsConfig(
        spec_channels=1025, segment_size=2560, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        upsample_initial_channel=32, gin_channels=32, ssl_dim=64,
        n_symbols=50)
    model = SynthesizerTrn(cfg)
    key = jax.random.PRNGKey(0)
    from easevoice_trainer_tpu.train.data import spectrogram_np
    wav = np.zeros((1, 16 * 640), np.float32)
    spec = np.stack([spectrogram_np(w, 2048, 640, 2048) for w in wav])
    variables = model.init(
        {"params": key, "slice": key, "latent": key, "dropout": key},
        np.zeros((1, 16, 64), np.float32), spec,
        np.full((1,), 16, np.int32), np.zeros((1, 8), np.int32),
        np.full((1,), 8, np.int32))

    import easevoice_trainer_tpu.train.ckpt as ckpt_io
    monkeypatch.setattr(ckpt_io, "load_sovits_pretrained",
                        lambda p: (variables["params"], []))
    monkeypatch.setattr(
        "easevoice_trainer_tpu.utils.paths.s2_config_path",
        lambda: _write_cfg(tmp_path, cfg))
    # pretend the ckpt exists
    monkeypatch.setattr(os.path, "exists",
                        _exists_with_fake(norm.s2g_path))

    resp = norm.token()
    assert resp.ok, resp.message
    rows = open(norm.semantic_output_path, encoding="utf8").read().splitlines()
    assert rows[0] == "item_name\tsemantic_audio"
    got = {r.split("\t")[0]: r.split("\t")[1].split() for r in rows[1:]}
    for i, t in enumerate(t_frames):
        assert len(got[f"c{i}.wav"]) == t // 2  # 25 Hz codes, true length


def _write_cfg(tmp_path, cfg):
    import json
    p = tmp_path / "s2.json"
    p.write_text(json.dumps({
        "model": {
            "inter_channels": cfg.inter_channels,
            "hidden_channels": cfg.hidden_channels,
            "filter_channels": cfg.filter_channels,
            "n_heads": cfg.n_heads, "n_layers": cfg.n_layers,
            "upsample_initial_channel": cfg.upsample_initial_channel,
            "gin_channels": cfg.gin_channels, "ssl_dim": cfg.ssl_dim,
            "n_symbols": cfg.n_symbols, "semantic_frame_rate": "25hz",
        },
        "data": {"filter_length": 2048},
    }))
    return str(p)


def _exists_with_fake(fake_path):
    real = os.path.exists

    def fn(p):
        if p == fake_path:
            return True
        return real(p)
    return fn
