"""End-to-end trainer tests: tiny configs, synthetic normalize artifacts,
one epoch through the real driver code (resume + export included)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the default fast run
import torch

from easevoice_trainer_tpu.utils import audio_io


TINY_S2 = {
    "train": {
        "log_interval": 2, "eval_interval": 500, "seed": 1234, "epochs": 2,
        "learning_rate": 2e-4, "betas": [0.8, 0.99], "eps": 1e-9,
        "batch_size": 2, "fp16_run": False, "lr_decay": 0.999875,
        "segment_size": 2560, "init_lr_ratio": 1, "warmup_epochs": 0,
        "c_mel": 45, "c_kl": 1.0, "text_low_lr_rate": 0.4,
    },
    "data": {
        "max_wav_value": 32768.0, "sampling_rate": 32000,
        "filter_length": 2048, "hop_length": 640, "win_length": 2048,
        "n_mel_channels": 128, "mel_fmin": 0.0, "mel_fmax": None,
        "add_blank": True, "n_speakers": 300, "cleaned_text": True,
    },
    "model": {
        "inter_channels": 32, "hidden_channels": 32, "filter_channels": 64,
        "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.0,
        "resblock": "1", "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5]] * 3,
        "upsample_rates": [10, 8, 2, 2, 2],
        "upsample_initial_channel": 32,
        "upsample_kernel_sizes": [16, 16, 8, 2, 2],
        "gin_channels": 32, "ssl_dim": 64,
        "semantic_frame_rate": "25hz", "freeze_quantizer": True,
        "n_symbols": 732,
    },
}

TINY_GPT = {
    "train": {"seed": 1234, "epochs": 2, "batch_size": 2,
              "save_every_n_epoch": 1, "precision": "32", "gradient_clip": 1.0},
    "optimizer": {"lr": 0.01, "lr_init": 1e-5, "lr_end": 1e-4,
                  "warmup_steps": 10, "decay_steps": 100},
    "data": {"max_eval_sample": 8, "max_sec": 54, "num_workers": 0,
             "pad_val": 1024},
    "model": {"vocab_size": 1025, "phoneme_vocab_size": 732,
              "embedding_dim": 32, "hidden_dim": 32, "head": 4,
              "linear_units": 64, "n_layer": 2, "dropout": 0, "EOS": 1024,
              "random_bert": 0},
    "inference": {"top_k": 15},
}


@pytest.fixture
def workspace(tmp_path, rng, monkeypatch):
    base = tmp_path / "base"
    (base / "configs").mkdir(parents=True)
    (base / "configs" / "s2.json").write_text(json.dumps(TINY_S2))
    import yaml
    (base / "configs" / "gpt.yaml").write_text(yaml.safe_dump(TINY_GPT))
    monkeypatch.setenv("EASEVOICE_BASE_PATH", str(base))

    norm = tmp_path / "norm"
    (norm / "4-cnhubert").mkdir(parents=True)
    (norm / "5-wav32k").mkdir()
    (norm / "3-bert").mkdir()
    lines, sem_lines = [], []
    for i in range(3):
        name = f"clip{i}.wav"
        frames = 60 + 20 * i
        wav = rng.uniform(-0.4, 0.4, frames * 640).astype(np.float32)
        audio_io.write_wav(str(norm / "5-wav32k" / name), wav, 32000)
        np.save(str(norm / "4-cnhubert" / (name + ".npy")),
                rng.normal(size=(frames, 64)).astype(np.float32))
        phones = ["AA1", "b", "a1", "SP", "."] * 4
        lines.append(f"{name}\t{' '.join(phones)}\t1\ttext")
        sem = rng.integers(0, 1024, frames // 2)
        sem_lines.append(f"{name}\t{' '.join(map(str, sem))}")
        np.save(str(norm / "3-bert" / (name + ".npy")),
                rng.normal(size=(len(phones), 1024)).astype(np.float32))
    (norm / "2-name2text.txt").write_text("\n".join(lines), encoding="utf8")
    (norm / "6-name2semantic.tsv").write_text(
        "item_name\tsemantic_audio\n" + "\n".join(sem_lines), encoding="utf8")
    project = tmp_path / "proj"
    project.mkdir()
    return str(norm), str(project)


def test_sovits_trainer_end_to_end(workspace, capsys):
    norm, project = workspace
    from easevoice_trainer_tpu.train.sovits import SovitsTrain, SovitsTrainParams

    params = SovitsTrainParams(
        batch_size=2, total_epochs=1, save_every_epoch=1,
        train_input_dir=norm, output_model_name="tiny", project_dir=project)
    trainer = SovitsTrain(params)
    resp = trainer.train()
    assert resp.ok, resp.message
    model_path = resp.data["model_path"]
    assert os.path.exists(model_path)
    # deployable export loads in torch with the reference dict schema
    obj = torch.load(model_path, map_location="cpu", weights_only=False)
    assert set(obj) >= {"weight", "config", "info"}
    assert not any(k.startswith("enc_q") for k in obj["weight"])
    assert obj["weight"]["enc_p.text_embedding.weight"].dtype == torch.float16
    # loss lines were streamed over the connector protocol
    out = capsys.readouterr().out
    assert "loss-of-easevoice" in out
    # resume checkpoint exists
    assert os.path.exists(os.path.join(project, "models", "sovits_train",
                                       "tiny", "logs", "G_latest.ckpt"))


def test_gpt_trainer_end_to_end(workspace, capsys):
    norm, project = workspace
    from easevoice_trainer_tpu.train.gpt import GPTTrain, GPTTrainParams

    params = GPTTrainParams(
        batch_size=2, total_epochs=1, save_every_epoch=1, model_path="/none",
        train_input_dir=norm, output_model_name="tinygpt",
        project_dir=project)
    trainer = GPTTrain(params)
    resp = trainer.train()
    assert resp.ok, resp.message
    model_path = resp.data["model_path"]
    assert model_path.endswith("tinygpt-e1.ckpt")
    obj = torch.load(model_path, map_location="cpu", weights_only=False)
    assert set(obj) >= {"weight", "config", "info"}
    assert all(k.startswith("model.") for k in obj["weight"])
    out = capsys.readouterr().out
    assert "loss-of-easevoice" in out


def test_sovits_trainer_data_parallel(workspace, capsys, monkeypatch):
    """The production driver shards batches over a data mesh when
    EASEVOICE_DP requests one (auto-on for multi-chip TPU; forced to a 2-way
    mesh over the virtual CPU devices here, which keeps the per-step
    cost equal to the single-device e2e test).  Ragged bucket batches are wrap-padded
    like the reference's DistributedBucketSampler."""
    norm, project = workspace
    monkeypatch.setenv("EASEVOICE_DP", "2")
    from easevoice_trainer_tpu.train.sovits import SovitsTrain, SovitsTrainParams

    params = SovitsTrainParams(
        batch_size=2, total_epochs=1, save_every_epoch=1,
        train_input_dir=norm, output_model_name="tinydp",
        project_dir=project)
    resp = SovitsTrain(params).train()
    assert resp.ok, resp.message
    assert os.path.exists(resp.data["model_path"])
    out = capsys.readouterr().out
    assert "loss-of-easevoice" in out


def test_gpt_trainer_data_parallel(workspace, capsys, monkeypatch):
    norm, project = workspace
    monkeypatch.setenv("EASEVOICE_DP", "2")
    from easevoice_trainer_tpu.train.gpt import GPTTrain, GPTTrainParams

    params = GPTTrainParams(
        batch_size=2, total_epochs=1, save_every_epoch=1, model_path="/none",
        train_input_dir=norm, output_model_name="tinygptdp",
        project_dir=project)
    resp = GPTTrain(params).train()
    assert resp.ok, resp.message
    assert resp.data["model_path"].endswith("tinygptdp-e1.ckpt")


def test_gpt_trainer_dp_x_tp(workspace, capsys, monkeypatch):
    """EASEVOICE_TP wires parallel/gpt_sharding into the production GPT
    trainer: params placed per shard-class PartitionSpec on a
    data=2 x model=2 mesh, whole run (resume export included) under
    dp x tp."""
    norm, project = workspace
    monkeypatch.setenv("EASEVOICE_DP", "2")
    monkeypatch.setenv("EASEVOICE_TP", "2")
    from easevoice_trainer_tpu.train.gpt import GPTTrain, GPTTrainParams

    params = GPTTrainParams(
        batch_size=2, total_epochs=1, save_every_epoch=1, model_path="/none",
        train_input_dir=norm, output_model_name="tinygpttp",
        project_dir=project)
    resp = GPTTrain(params).train()
    assert resp.ok, resp.message
    assert resp.data["model_path"].endswith("tinygpttp-e1.ckpt")
    obj = torch.load(resp.data["model_path"], map_location="cpu",
                     weights_only=False)
    assert set(obj) >= {"weight", "config", "info"}
    out = capsys.readouterr().out
    assert "loss-of-easevoice" in out


def test_train_mesh_env_combinations(monkeypatch):
    from easevoice_trainer_tpu import parallel

    monkeypatch.setenv("EASEVOICE_DP", "2")
    monkeypatch.setenv("EASEVOICE_TP", "2")
    mesh = parallel.train_mesh()
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 2
    # TP=1 falls back to the pure-DP path
    monkeypatch.setenv("EASEVOICE_TP", "1")
    mesh = parallel.train_mesh()
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 1
    # DP=off keeps a model-only mesh
    monkeypatch.setenv("EASEVOICE_DP", "off")
    monkeypatch.setenv("EASEVOICE_TP", "4")
    mesh = parallel.train_mesh()
    assert mesh.shape["data"] == 1 and mesh.shape["model"] == 4
    # auto dp soaks up the remaining devices (8 virtual / tp2 -> dp4)
    monkeypatch.setenv("EASEVOICE_DP", "auto")
    monkeypatch.setenv("EASEVOICE_TP", "2")
    mesh = parallel.train_mesh()
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
