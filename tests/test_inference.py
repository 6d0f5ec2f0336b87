"""Inference pipeline tests: segmentation, preprocessing, end-to-end TTS.run
with tiny random models."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the default fast run

from easevoice_trainer_tpu.inference.segmentation import (
    SplitMethods, get_split_method, get_split_names)
from easevoice_trainer_tpu.inference.preprocessor import (
    TextPreprocessor, detect_language_runs, merge_short_text_in_array)


def test_split_methods_registry():
    names = get_split_names()
    assert set(names) == {"no_split", "by_4_sentences", "by_50_chars",
                          "by_chinese_period", "by_english_period",
                          "by_punctuation"}


def test_split_by_punctuation():
    fn = get_split_method(SplitMethods.ByPunctuation)
    out = fn("Hello, world. How are you?")
    assert out.split("\n") == ["Hello,", " world.", " How are you?"]
    # decimal points survive
    out2 = fn("pi is 3.14, ok.")
    assert "3.14," in out2.split("\n")[0]


def test_split_by_4_sentences():
    fn = get_split_method(SplitMethods.By4Sentences)
    text = "一。二。三。四。五。六。"
    out = fn(text).split("\n")
    assert out[0] == "一。二。三。四。"
    assert out[1] == "五。六。"


def test_detect_language_runs():
    runs = detect_language_runs("hello你好world")
    assert [l for l, _ in runs] == ["en", "zh", "en"]
    assert runs[1][1] == "你好"


def test_detect_language_runs_kana_adjacency():
    # plain Japanese: kanji flanked by kana all route to ja
    runs = detect_language_runs("私は学生です")
    assert [l for l, _ in runs] == ["ja"]
    # ja+en mix keeps English; kanji stay Japanese
    runs = detect_language_runs("これはappleです")
    assert [l for l, _ in runs] == ["ja", "en", "ja"]
    # pure Chinese never becomes ja
    runs = detect_language_runs("今天天气很好。")
    assert [l for l, _ in runs] == ["zh"]
    # zh+en unaffected by the adjacency rule
    runs = detect_language_runs("我用Python写代码")
    assert [l for l, _ in runs] == ["zh", "en", "zh"]
    # explicit zh+ja mix: the kana-touching Han run goes ja, the
    # punctuation-separated leading Chinese sentence stays zh
    runs = detect_language_runs("你好。日本語を勉強します")
    assert runs[0][0] == "zh" and "你好" in runs[0][1]
    assert all(l == "ja" for l, _ in runs[1:])


def test_merge_short_text():
    assert merge_short_text_in_array(["ab", "cd", "efgh"], 5) == ["abcdefgh"]
    assert merge_short_text_in_array(["abcde", "fg"], 5) == ["abcdefg"]
    assert merge_short_text_in_array(["abcde", "fghij"], 5) == ["abcde", "fghij"]


def test_preprocessor_en():
    pp = TextPreprocessor(None)
    segs = pp.preprocess("Hello world. This is a test of the pipeline.",
                         "en", "by_english_period")
    assert len(segs) >= 1
    for s in segs:
        assert len(s["phones"]) > 0
        assert s["bert_features"].shape == (1024, len(s["phones"]))


# ---------------------------------------------------------------------------
# end-to-end with tiny models
# ---------------------------------------------------------------------------

from easevoice_trainer_tpu.models.sovits import SynthesizerTrn, SovitsConfig
from easevoice_trainer_tpu.models.gpt import Text2SemanticDecoder, T2SConfig
from easevoice_trainer_tpu.models.cnhubert import CNHubert, HubertConfig
from easevoice_trainer_tpu.inference.tts import TTS, TTSConfig, InferenceTaskData
from easevoice_trainer_tpu.utils import audio_io


@pytest.fixture(scope="module")
def tiny_tts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tts")
    key = jax.random.PRNGKey(0)

    vits_cfg = SovitsConfig(
        spec_channels=1025, segment_size=2560, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        upsample_initial_channel=32, gin_channels=32, ssl_dim=64,
        n_symbols=732, p_dropout=0.0)
    vits = SynthesizerTrn(vits_cfg)
    vvars = vits.init(
        {"params": key, "slice": key, "latent": key, "dropout": key},
        jnp.zeros((1, 8, 64)), jnp.zeros((1, 8, 1025)), jnp.array([8]),
        jnp.zeros((1, 4), jnp.int32), jnp.array([4]))

    t2s_cfg = T2SConfig(vocab_size=1025, phoneme_vocab_size=732,
                        embedding_dim=32, hidden_dim=32, n_heads=4,
                        n_layers=2, ffn_dim=64, dropout=0.0, eos_id=1024)
    t2s = Text2SemanticDecoder(t2s_cfg)
    tvars = t2s.init(key, jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
                     jnp.zeros((1, 6), jnp.int32), jnp.array([6]),
                     jnp.zeros((1, 4, 1024)))

    hcfg = HubertConfig(conv_dim=(16,) * 7, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128,
                        pos_conv_kernel=16, pos_conv_groups=4)
    hubert = CNHubert(hcfg)
    hvars = hubert.init(key, jnp.zeros((1, 16000)))

    cfg = TTSConfig(str(tmp / "tts_infer.yaml"))
    # tiny hubert emits 64-d features; the tiny vits consumes ssl_dim=64
    tts = TTS(cfg, models=dict(
        vits=vits, vits_cfg=vits_cfg, vits_params=vvars["params"],
        t2s=t2s, t2s_cfg=t2s_cfg, t2s_params=tvars["params"],
        cnhubert=hubert, cnhubert_params=hvars, bert=None))

    rng = np.random.default_rng(0)
    ref = rng.uniform(-0.3, 0.3, 32000 * 4).astype(np.float32)  # 4 s
    ref_path = str(tmp / "ref.wav")
    audio_io.write_wav(ref_path, ref, 32000)
    return tts, ref_path


def test_tts_run_end_to_end(tiny_tts):
    tts, ref_path = tiny_tts
    task = InferenceTaskData(
        text="Hello there. General Kenobi.", text_lang="en",
        ref_audio_path=ref_path, prompt_text="", top_k=5,
        text_split_method="by_english_period", batch_size=2)
    outputs = list(tts.run(task))
    assert len(outputs) == 1
    sr, audio = outputs[0]
    assert sr == 32000
    assert audio.dtype == np.int16
    assert len(audio) > sr // 10  # produced something non-trivial
    assert np.abs(audio).max() <= 32767


def test_vocode_batch_chunking_matches_unchunked(tiny_tts, monkeypatch):
    """The HBM-budget chunking in _vocode_batch must be numerically
    invisible: forcing 1-row chunks yields the same waveforms (up to the
    per-chunk code padding, which the flow/decoder mask by length) as one
    whole-batch padded decode."""
    tts, ref_path = tiny_tts
    tts.set_ref_audio(ref_path)
    rng = np.random.default_rng(3)
    lengths = np.asarray([40, 72, 17, 64], np.int32)
    tokens = rng.integers(0, 1024, (4, 72)).astype(np.int32)
    batch = [{"phones": list(rng.integers(1, 50, 6))} for _ in lengths]
    whole = tts._vocode_batch(tokens, lengths, batch, speed_factor=1.0)
    # budget of 1 sample -> rows_per_call == 1 -> per-row decodes
    monkeypatch.setattr(type(tts), "_VOCODE_BUDGET_SAMPLES", 1)
    tts._voc_fn = None
    chunked = tts._vocode_batch(tokens, lengths, batch, speed_factor=1.0)
    assert [w.shape for w in whole] == [c.shape for c in chunked]
    for n, w, c in zip(lengths, whole, chunked):
        # a chunk whose own code padding differs from the whole-batch
        # padding sees different zero-padding beyond its valid codes; the
        # HiFi-GAN receptive field smears that into the tail (same quirk as
        # the reference's padded parallel_infer), so compare the interior
        # and require the tail to stay bounded rather than bit-equal
        interior = int(n) * tts.cfg.hop_length  # first half of the row
        np.testing.assert_allclose(w[:interior], c[:interior], atol=5e-4)
        assert np.isfinite(c).all() and np.abs(c).max() < 10.0


def test_tts_ref_audio_validation(tiny_tts, tmp_path):
    tts, ref_path = tiny_tts
    short = str(tmp_path / "short.wav")
    audio_io.write_wav(short, np.zeros(16000, np.float32), 32000)  # 0.5 s
    with pytest.raises(ValueError, match="3-10"):
        tts.set_ref_audio(short)
    with pytest.raises(Exception):
        tts.set_ref_audio(str(tmp_path / "missing.wav"))


def test_to_batch_ordering():
    segs = [{"phones": [0] * n} for n in (30, 5, 18, 7)]
    batches, idxs = TTS.to_batch(segs, batch_size=2, split_bucket=True)
    flat = [i for b in idxs for i in b]
    assert sorted(flat) == [0, 1, 2, 3]
    # sorted by length: first batch holds the two shortest
    assert set(idxs[0]) == {1, 3}


def test_to_batch_threshold_live():
    """batch_threshold must actually split length-heterogeneous windows
    (reference median/mean rule, tts.py:475-495)."""
    # lengths (1,1,100): upper-median/mean = 1/34 << 0.75 -> the window
    # shrinks to [1,1] + a singleton [100] despite batch_size=3
    segs = [{"phones": [0] * 1}, {"phones": [0] * 1}, {"phones": [0] * 100}]
    _, idxs = TTS.to_batch(segs, batch_size=3, threshold=0.75,
                           split_bucket=True)
    assert idxs == [[0, 1], [2]]
    # threshold=0 accepts any window -> one batch
    _, idxs0 = TTS.to_batch(segs, batch_size=3, threshold=0.0,
                            split_bucket=True)
    assert idxs0 == [[0, 1, 2]]
    # homogeneous lengths batch together at the default threshold
    segs_h = [{"phones": [0] * 10} for _ in range(4)]
    _, idxs_h = TTS.to_batch(segs_h, batch_size=2, threshold=0.75,
                             split_bucket=True)
    assert [len(b) for b in idxs_h] == [2, 2]
    # split_bucket=False: fixed-size chunks in input order
    _, idxs_f = TTS.to_batch(segs, batch_size=2, split_bucket=False)
    assert idxs_f == [[0, 1], [2]]


def test_tts_return_fragment(tiny_tts):
    tts, ref_path = tiny_tts
    task = InferenceTaskData(
        text="Hello there. General Kenobi. Another one.", text_lang="en",
        ref_audio_path=ref_path, text_split_method="by_english_period",
        batch_size=1, return_fragment=True)
    outputs = list(tts.run(task))
    # one yielded fragment per batch (3 sentences, batch_size=1)
    assert len(outputs) >= 2
    for sr, audio in outputs:
        assert sr == 32000
        assert audio.dtype == np.int16
        assert len(audio) > 0


def test_tts_seed_semantics(tiny_tts):
    tts, ref_path = tiny_tts
    base = dict(text="Hello there.", text_lang="en",
                ref_audio_path=ref_path,
                text_split_method="by_english_period", batch_size=1)
    # fixed seed reproduces bit-identically
    t1 = InferenceTaskData(seed=7, keep_random=False, **base)
    a1 = list(tts.run(t1))[0][1]
    assert tts.last_seed == 7
    a2 = list(tts.run(InferenceTaskData(seed=7, keep_random=False,
                                        **base)))[0][1]
    np.testing.assert_array_equal(a1, a2)
    # seed=-1 / keep_random draws and surfaces a real random seed
    list(tts.run(InferenceTaskData(seed=-1, **base)))
    s1 = tts.last_seed
    list(tts.run(InferenceTaskData(seed=-1, **base)))
    assert isinstance(s1, int) and 0 <= s1 < (1 << 32)
    # two draws virtually never collide
    assert tts.last_seed != s1


def test_tts_failure_recovery(tiny_tts, monkeypatch):
    """A mid-synthesis failure yields silence, reloads models, re-raises
    (reference tts.py:852-864)."""
    tts, ref_path = tiny_tts
    saved = dict(vits=tts.vits_params, t2s=tts.t2s_params)
    reloads = []
    monkeypatch.setattr(tts, "_reload_models",
                        lambda: reloads.append(1))

    def boom(*a, **k):
        raise RuntimeError("synthetic decode failure")

    monkeypatch.setattr(tts, "_ar_decode", boom)
    task = InferenceTaskData(
        text="Hello there.", text_lang="en", ref_audio_path=ref_path,
        text_split_method="by_english_period", batch_size=1)
    gen = tts.run(task)
    sr, audio = next(gen)
    assert sr == 32000 and not audio.any()  # silence fragment
    with pytest.raises(RuntimeError, match="synthetic"):
        next(gen)
    assert reloads == [1]
    assert tts.vits_params is saved["vits"]  # reload stub left state intact


def test_detect_language_runs_ja_only_han():
    # shinjitai/kokuji flip pure-Han runs to ja (LangSegment-grade case)
    assert detect_language_runs("東京駅")[0][0] == "ja"
    assert detect_language_runs("円高と労働")[0][0] == "ja"
    # ordinary Chinese (simplified and traditional) stays zh
    assert detect_language_runs("我爱北京天安门。")[0][0] == "zh"
    assert detect_language_runs("佢個鋤頭太短啦。")[0][0] == "zh"
