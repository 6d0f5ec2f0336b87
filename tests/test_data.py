"""Data pipeline tests against synthetic reference-format artifacts."""
import os

import numpy as np
import pytest

from easevoice_trainer_tpu.train import data as D
from easevoice_trainer_tpu.utils import audio_io


@pytest.fixture
def exp_dir(tmp_path, rng):
    d = tmp_path / "norm"
    (d / "4-cnhubert").mkdir(parents=True)
    (d / "5-wav32k").mkdir()
    (d / "3-bert").mkdir()
    names, lines, sem_lines = [], [], ["item_name\tsemantic_audio"]
    for i in range(3):
        name = f"clip{i}.wav"
        names.append(name)
        frames = 80 + 30 * i           # 1.6-2.8 s at 32kHz/640
        wav = rng.uniform(-0.4, 0.4, frames * 640).astype(np.float32)
        audio_io.write_wav(str(d / "5-wav32k" / name), wav, 32000)
        ssl = rng.normal(size=(frames, 768)).astype(np.float32)
        np.save(str(d / "4-cnhubert" / (name + ".npy")), ssl)
        phones = ["AA1", "b", "a1", "SP", "."] * (3 + i)
        lines.append(f"{name}\t{' '.join(phones)}\t1 1 1 1 1\ttext{i}")
        sem = rng.integers(0, 1024, frames // 2)
        sem_lines.append(f"{name}\t{' '.join(map(str, sem))}")
        bert = rng.normal(size=(len(phones), 1024)).astype(np.float32)
        np.save(str(d / "3-bert" / (name + ".npy")), bert)
    (d / "2-name2text.txt").write_text("\n".join(lines), encoding="utf8")
    (d / "6-name2semantic.tsv").write_text("\n".join(sem_lines), encoding="utf8")
    return str(d)


def test_s2_dataset_and_collate(exp_dir):
    ds = D.S2Dataset(exp_dir)
    # 3 clips replicated to >= 100 items (reference dup-expand)
    assert len(ds) >= 99
    item = ds.load_item(0)
    assert item["ssl"].shape[0] == item["spec"].shape[0]
    assert item["spec"].shape[1] == 1025
    assert abs(len(item["wav"]) // 640 - item["spec"].shape[0]) == 0

    batcher = D.BucketBatcher(ds.lengths, batch_size=4)
    batches = batcher.epoch_batches(epoch=0)
    assert batches, "no batches produced"
    bucket_id, idxs = batches[0]
    frames = batcher.padded_frames(bucket_id)
    batch = D.collate_s2([ds.load_item(i) for i in idxs], frames, text_len=64)
    assert batch["spec"].shape == (4, frames, 1025)
    assert batch["ssl"].shape == (4, frames, 768)
    assert batch["wav"].shape == (4, frames * 640)
    assert (batch["spec_lengths"] <= frames).all()
    # deterministic epoch shuffling
    assert batcher.epoch_batches(0) == batcher.epoch_batches(0)
    assert batcher.epoch_batches(0) != batcher.epoch_batches(1)


def test_spectrogram_np_matches_jax(exp_dir, rng):
    from easevoice_trainer_tpu.ops.stft import spectrogram
    wav = rng.uniform(-0.9, 0.9, 640 * 20).astype(np.float32)
    a = D.spectrogram_np(wav)
    b = np.asarray(spectrogram(wav[None], 2048, 640, 2048))[0]
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_gpt_dataset(exp_dir):
    ds = D.GPTDataset(exp_dir)
    assert len(ds) >= 99
    item = ds.load_item(0)
    assert item["bert"].shape == (len(item["phoneme_ids"]), 1024)
    batch = D.collate_gpt([ds.load_item(i) for i in range(3)],
                          max_ph=32, max_sem=128)
    assert batch["phoneme_ids"].shape == (3, 32)
    assert batch["semantic_ids"].shape == (3, 128)
    assert batch["bert_feature"].shape == (3, 32, 1024)
    assert (batch["semantic_ids"] < 1024).all()


def test_wav_roundtrip(tmp_path, rng):
    wav = rng.uniform(-0.8, 0.8, 32000).astype(np.float32)
    p = str(tmp_path / "x.wav")
    audio_io.write_wav(p, wav, 32000)
    back, sr = audio_io.read_wav(p)
    assert sr == 32000
    np.testing.assert_allclose(back, wav, atol=1.0 / 32000)
    d = audio_io.probe_duration(p)
    assert d == pytest.approx(1.0, abs=1e-3)
    down = audio_io.resample(back, 32000, 16000)
    assert len(down) == 16000
