"""FSMN-VAD + CT-Transformer punc ports: torch-replica parity, converter
key manifests, the offline segmenter, and the chunked punctuation
restorer.

The replicas mirror funasr's FSMN (fsmn_vad_streaming/encoder.py) and
CTTransformer module structure with the same state-dict key names the real
modelscope checkpoints use, so the converters are exercised end-to-end.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

from easevoice_trainer_tpu.audiokit import punc_ct, vad_fsmn
from easevoice_trainer_tpu.audiokit.punc_ct import (
    CTPunc, CTPuncConfig, code_mix_split_words, convert_ct_punc_weights)
from easevoice_trainer_tpu.audiokit.vad_fsmn import (
    FsmnVAD, FsmnVadConfig, convert_fsmn_vad_weights, segment_speech_probs)

VCFG = FsmnVadConfig(input_dim=20, input_affine_dim=10, fsmn_layers=2,
                     linear_dim=14, proj_dim=8, lorder=4, rorder=0,
                     output_affine_dim=10, output_dim=6, lfr_m=2, lfr_n=1)

PCFG = CTPuncConfig(vocab_size=40, embed_unit=16, d_model=16, n_heads=2,
                    ffn_dim=32, num_blocks=3, fsmn_kernel=5)


# ---------------------------------------------------------------------------
# torch replicas (funasr module structure + key names)
# ---------------------------------------------------------------------------

class TVadBlock(tnn.Module):
    """funasr BasicBlock: linear(no bias) -> causal dw Conv2d memory ->
    affine -> relu, keys linear.linear / fsmn_block.conv_left /
    affine.linear."""

    def __init__(self, cfg):
        super().__init__()
        self.linear = tnn.Module()
        self.linear.linear = tnn.Linear(cfg.linear_dim, cfg.proj_dim,
                                        bias=False)
        self.fsmn_block = tnn.Module()
        self.fsmn_block.conv_left = tnn.Conv2d(
            cfg.proj_dim, cfg.proj_dim, (cfg.lorder, 1),
            groups=cfg.proj_dim, bias=False)
        self.affine = tnn.Module()
        self.affine.linear = tnn.Linear(cfg.proj_dim, cfg.linear_dim)
        self.lorder = cfg.lorder

    def forward(self, x):
        p = self.linear.linear(x)
        # (b,t,d) -> (b,d,t,1), pad lorder-1 past frames, causal dw conv
        x4 = p.transpose(1, 2).unsqueeze(-1)
        x4 = torch.nn.functional.pad(x4, (0, 0, self.lorder - 1, 0))
        mem = self.fsmn_block.conv_left(x4).squeeze(-1).transpose(1, 2)
        return torch.relu(self.affine.linear(p + mem))


class TVadNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        enc = tnn.Module()
        for name, i, o in (("in_linear1", cfg.input_dim, cfg.input_affine_dim),
                           ("in_linear2", cfg.input_affine_dim, cfg.linear_dim),
                           ("out_linear1", cfg.linear_dim, cfg.output_affine_dim),
                           ("out_linear2", cfg.output_affine_dim, cfg.output_dim)):
            m = tnn.Module()
            m.linear = tnn.Linear(i, o)
            setattr(enc, name, m)
        enc.fsmn = tnn.ModuleList([TVadBlock(cfg)
                                   for _ in range(cfg.fsmn_layers)])
        self.encoder = enc

    def forward(self, x):
        e = self.encoder
        x = torch.relu(e.in_linear1.linear(x))
        x = torch.relu(e.in_linear2.linear(x))
        for blk in e.fsmn:
            x = blk(x)
        x = e.out_linear1.linear(x)
        x = e.out_linear2.linear(x)
        return torch.softmax(x, dim=-1)


def test_vad_torch_replica_parity():
    torch.manual_seed(0)
    tmodel = TVadNet(VCFG).eval()
    params = convert_fsmn_vad_weights(tmodel.state_dict(), VCFG)
    jmodel = vad_fsmn._build_model(VCFG)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 25, VCFG.input_dim)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = np.asarray(jmodel.apply(params, x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4)


def test_vad_causality():
    """The memory blocks are strictly causal: changing future input must
    not change past scores."""
    torch.manual_seed(1)
    tmodel = TVadNet(VCFG).eval()
    params = convert_fsmn_vad_weights(tmodel.state_dict(), VCFG)
    jmodel = vad_fsmn._build_model(VCFG)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 20, VCFG.input_dim)).astype(np.float32)
    y = x.copy()
    y[0, 15:] += 5.0
    a = np.asarray(jmodel.apply(params, x))
    b = np.asarray(jmodel.apply(params, y))
    np.testing.assert_allclose(a[0, :15], b[0, :15], atol=1e-6)
    assert np.abs(a[0, 15:] - b[0, 15:]).max() > 1e-6


def test_vad_key_manifest_matches_converter():
    man = vad_fsmn.expected_key_manifest(VCFG)
    state = {k: np.zeros(shape, np.float32) for k, shape in man.items()}
    params = convert_fsmn_vad_weights(state, VCFG)
    import jax
    jmodel = vad_fsmn._build_model(VCFG)
    init = jmodel.init(jax.random.PRNGKey(0),
                       np.zeros((1, 8, VCFG.input_dim), np.float32))
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = dict(jax.tree_util.tree_leaves_with_path(params))
    assert len(flat_init) == len(flat_conv)
    for path, leaf in flat_init:
        assert path in flat_conv, f"converter missing {path}"
        assert flat_conv[path].shape == leaf.shape, path
    # bare keys (no encoder. prefix) are auto-detected too
    bare = {k.removeprefix("encoder."): v for k, v in state.items()}
    params2 = convert_fsmn_vad_weights(bare, VCFG)
    assert len(dict(jax.tree_util.tree_leaves_with_path(params2))) == \
        len(flat_conv)


def test_vad_real_checkpoint_manifest_shapes():
    """Published fsmn-vad constants: 400-dim LFR-5 input, 4 blocks of
    250->128 with 20-tap causal memory, 248 output pdfs."""
    man = vad_fsmn.expected_key_manifest(FsmnVadConfig())
    assert man["encoder.in_linear1.linear.weight"] == (140, 400)
    assert man["encoder.fsmn.3.fsmn_block.conv_left.weight"] == (128, 1, 20, 1)
    assert man["encoder.out_linear2.linear.weight"] == (248, 140)
    assert "encoder.fsmn.4.linear.linear.weight" not in man


def test_segmenter_basic():
    cfg = FsmnVadConfig()
    # 10 s track: speech from 2 s to 5 s
    probs = np.zeros(1000, np.float32)
    probs[200:500] = 0.95
    segs = segment_speech_probs(probs, cfg)
    assert len(segs) == 1
    s, e = segs[0]
    assert abs(s - 2000) <= cfg.window_size_ms + cfg.lookback_time_start_point
    assert abs(e - 5000) <= cfg.window_size_ms + cfg.lookahead_time_end_point
    # silence -> no segments; empty -> no segments
    assert segment_speech_probs(np.zeros(500, np.float32), cfg) == []
    assert segment_speech_probs(np.zeros(0, np.float32), cfg) == []


def test_segmenter_bridges_short_silence_and_splits_long():
    cfg = FsmnVadConfig()
    # a 300 ms silence inside speech is shorter than max_end_silence (800)
    probs = np.ones(600, np.float32)
    probs[250:280] = 0.0
    assert len(segment_speech_probs(probs, cfg)) == 1
    # a 1.2 s silence splits
    probs = np.ones(1000, np.float32)
    probs[400:520] = 0.0
    assert len(segment_speech_probs(probs, cfg)) == 2
    # max_single_segment_time enforces an upper bound
    small = FsmnVadConfig(max_single_segment_time=1000)
    probs = np.ones(350, np.float32)
    segs = segment_speech_probs(probs, small)
    assert len(segs) >= 3
    assert all(e - s <= 1000 for s, e in segs)


def test_fsmn_vad_from_checkpoint_dir(tmp_path):
    import yaml

    cfg_yaml = {
        "encoder_conf": {"input_dim": VCFG.input_dim,
                         "input_affine_dim": VCFG.input_affine_dim,
                         "fsmn_layers": VCFG.fsmn_layers,
                         "linear_dim": VCFG.linear_dim,
                         "proj_dim": VCFG.proj_dim,
                         "lorder": VCFG.lorder, "rorder": 0,
                         "output_affine_dim": VCFG.output_affine_dim,
                         "output_dim": VCFG.output_dim},
        "frontend_conf": {"lfr_m": VCFG.lfr_m, "lfr_n": VCFG.lfr_n,
                          "n_mels": VCFG.input_dim // VCFG.lfr_m},
        "model_conf": {"sil_pdf_ids": [0]},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(cfg_yaml))
    torch.manual_seed(0)
    torch.save(TVadNet(VCFG).state_dict(), tmp_path / "model.pt")
    vad = FsmnVAD(str(tmp_path))
    assert vad.available
    wav = np.random.default_rng(0).uniform(-0.4, 0.4, 32000).astype(np.float32)
    probs = vad.speech_probs(wav)
    assert probs.ndim == 1 and len(probs) > 150
    assert np.all(probs >= 0) and np.all(probs <= 1)
    segs = vad.segments(wav)
    assert all(0 <= s < e <= len(wav) for s, e in segs)
    assert not FsmnVAD(str(tmp_path / "nope")).available


# ---------------------------------------------------------------------------
# CT-Transformer punc
# ---------------------------------------------------------------------------

class TPuncAttention(tnn.Module):
    def __init__(self, in_size, d, heads, kernel):
        super().__init__()
        self.linear_q_k_v = tnn.Linear(in_size, 3 * d)
        self.linear_out = tnn.Linear(d, d)
        self.fsmn_block = tnn.Conv1d(d, d, kernel, padding=(kernel - 1) // 2,
                                     groups=d, bias=False)
        self.d, self.h = d, heads

    def forward(self, x, mask):
        q, k, v = self.linear_q_k_v(x).split(self.d, dim=-1)
        vm = v * mask
        fsmn = (vm + self.fsmn_block(vm.transpose(1, 2)).transpose(1, 2)) * mask
        b, t, _ = q.shape
        dk = self.d // self.h
        qh = q.view(b, t, self.h, dk).transpose(1, 2) / math.sqrt(dk)
        kh = k.view(b, t, self.h, dk).transpose(1, 2)
        vh = v.view(b, t, self.h, dk).transpose(1, 2)
        scores = qh @ kh.transpose(-2, -1)
        scores = scores.masked_fill(mask[:, None, None, :, 0] == 0,
                                    torch.finfo(scores.dtype).min)
        att = torch.softmax(scores, dim=-1) @ vh
        return self.linear_out(att.transpose(1, 2).reshape(b, t, self.d)) + fsmn


class TPuncLayer(tnn.Module):
    def __init__(self, in_size, d, heads, ffn, kernel):
        super().__init__()
        self.norm1 = tnn.LayerNorm(in_size)
        self.norm2 = tnn.LayerNorm(d)
        self.self_attn = TPuncAttention(in_size, d, heads, kernel)
        self.feed_forward = tnn.Module()
        self.feed_forward.w_1 = tnn.Linear(d, ffn)
        self.feed_forward.w_2 = tnn.Linear(ffn, d)
        self.in_size, self.d = in_size, d

    def forward(self, x, mask):
        res = x
        x = self.self_attn(self.norm1(x), mask)
        if self.in_size == self.d:
            x = res + x
        return x + self.feed_forward.w_2(
            torch.relu(self.feed_forward.w_1(self.norm2(x))))


class TCTTransformer(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.embed = tnn.Embedding(cfg.vocab_size, cfg.embed_unit)
        enc = tnn.Module()
        enc.encoders0 = tnn.ModuleList([TPuncLayer(
            cfg.embed_unit, cfg.d_model, cfg.n_heads, cfg.ffn_dim,
            cfg.fsmn_kernel)])
        enc.encoders = tnn.ModuleList([TPuncLayer(
            cfg.d_model, cfg.d_model, cfg.n_heads, cfg.ffn_dim,
            cfg.fsmn_kernel) for _ in range(cfg.num_blocks - 1)])
        enc.after_norm = tnn.LayerNorm(cfg.d_model)
        self.encoder = enc
        self.decoder = tnn.Linear(cfg.d_model, len(cfg.punc_list))
        self.cfg = cfg

    def forward(self, ids, mask):
        x = self.embed(ids)
        t, d = x.shape[1], x.shape[2]
        pos = torch.arange(1, t + 1, dtype=torch.float32)[:, None]
        inv = torch.exp(torch.arange(d // 2, dtype=torch.float32)
                        * -(math.log(10000.0) / (d // 2 - 1)))
        pe = torch.cat([torch.sin(pos * inv), torch.cos(pos * inv)], dim=1)
        x = x * self.cfg.d_model ** 0.5 + pe[None, :, :d]
        x = self.encoder.encoders0[0](x, mask)
        for layer in self.encoder.encoders:
            x = layer(x, mask)
        return self.decoder(self.encoder.after_norm(x))


def test_punc_torch_replica_parity():
    torch.manual_seed(0)
    tmodel = TCTTransformer(PCFG).eval()
    params = convert_ct_punc_weights(tmodel.state_dict(), PCFG)
    jmodel = punc_ct._build_model(PCFG)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, PCFG.vocab_size, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12, 1), np.float32)
    mask[1, 9:] = 0.0
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(ids).long(),
                     torch.from_numpy(mask)).numpy()
    out = np.asarray(jmodel.apply(params, ids, mask))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=2e-4)


def test_punc_key_manifest_matches_converter():
    man = punc_ct.expected_key_manifest(PCFG)
    state = {k: np.zeros(shape, np.float32) for k, shape in man.items()}
    params = convert_ct_punc_weights(state, PCFG)
    import jax
    jmodel = punc_ct._build_model(PCFG)
    init = jmodel.init(jax.random.PRNGKey(0),
                       np.zeros((1, 8), np.int32),
                       np.ones((1, 8, 1), np.float32))
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_conv = dict(jax.tree_util.tree_leaves_with_path(params))
    assert len(flat_init) == len(flat_conv)
    for path, leaf in flat_init:
        assert path in flat_conv, f"converter missing {path}"
        assert flat_conv[path].shape == leaf.shape, path


def test_punc_real_checkpoint_manifest_shapes():
    """Published ct-punc constants: 272727-word embedding into a 256-dim
    SAN-M stack, 6 punctuation classes."""
    man = punc_ct.expected_key_manifest(CTPuncConfig())
    assert man["embed.weight"] == (272727, 256)
    assert man["decoder.weight"] == (6, 256)
    assert man["encoder.encoders0.0.self_attn.linear_q_k_v.weight"] == (768, 256)


def test_code_mix_split_words():
    assert code_mix_split_words("你好世界") == ["你", "好", "世", "界"]
    assert code_mix_split_words("hello world") == ["hello", "world"]
    assert code_mix_split_words("我用gpu跑") == ["我", "用", "gpu", "跑"]
    assert code_mix_split_words("") == []


def _stub_punc(puncs_by_word):
    """A CTPunc with the model replaced by a word->punc lookup."""
    p = CTPunc.__new__(CTPunc)
    p.available = True
    p._predict_puncs = lambda words: [puncs_by_word.get(w, "_")
                                      for w in words]
    return p


def test_punc_restore_basic():
    p = _stub_punc({"好": "，", "界": "。"})
    assert p.restore("你好世界") == "你好，世界。"
    # no marks predicted -> final period is forced
    p = _stub_punc({})
    assert p.restore("你好") == "你好。"
    assert p.restore("") == ""


def test_punc_restore_trailing_comma_promoted():
    p = _stub_punc({"好": "，"})
    assert p.restore("你好") == "你好。"


def test_punc_restore_chunk_cache_carries_tail():
    """Words after the last sentence end in a chunk must be re-scored with
    the following chunk (seen > once by the stub), and the output must
    keep every word exactly once."""
    seen = []

    def predict(words):
        seen.append(list(words))
        return ["。" if w == "z" else "_" for w in words]

    p = CTPunc.__new__(CTPunc)
    p.available = True
    p._predict_puncs = predict
    words = ["a"] * 10 + ["z"] + ["b"] * 15 + ["z"] + ["c"] * 5
    text = " ".join(words)
    out = p.restore(text)
    assert out.count("z。") == 2
    assert out.replace("。", " ").split() == words
    # the tail after the first 。 ("b"s) was carried into chunk 2
    assert any(c[0] == "b" for c in seen[1:])


def test_punc_restore_english_spacing():
    p = _stub_punc({"world": "，"})
    assert p.restore("hello world how are you") == "hello world，how are you。"


# ---------------------------------------------------------------------------
# service chain: VAD -> Paraformer -> punc through _load_paraformer_jax
# ---------------------------------------------------------------------------

def test_service_zh_chain_composes(tmp_path, monkeypatch):
    """Build tiny modelscope-layout checkpoint dirs for all three stages,
    point the env vars at them and run the composed recognizer the audio
    service loads — exercises loading, VAD segmentation, per-segment
    transcription and punctuation restoration end to end."""
    import json
    import wave

    import yaml

    from easevoice_trainer_tpu.audiokit import asr_paraformer
    from easevoice_trainer_tpu.service.audio import AudioService

    rng = np.random.default_rng(0)

    # paraformer dir (tiny config, random weights)
    acfg = asr_paraformer.ParaformerConfig(
        input_size=24, d_model=16, n_heads=2, ffn_dim=32, encoder_layers=2,
        decoder_layers=1, fsmn_kernel=5, vocab_size=17, predictor_kernel=3,
        lfr_m=2, lfr_n=2)
    adir = tmp_path / "paraformer"
    adir.mkdir()
    (adir / "config.yaml").write_text(yaml.safe_dump({
        "encoder_conf": {"num_blocks": 2, "output_size": 16,
                         "attention_heads": 2, "linear_units": 32,
                         "kernel_size": 5},
        "decoder_conf": {"num_blocks": 1},
        "frontend_conf": {"n_mels": 12, "lfr_m": 2, "lfr_n": 2},
        "vocab_size": 17,
    }))
    state = {k: torch.tensor(rng.normal(0, 0.05, size=v).astype(np.float32))
             for k, v in asr_paraformer.expected_key_manifest(acfg).items()}
    torch.save(state, adir / "model.pt")
    json.dump(["<blank>", "<s>", "</s>"] + [chr(0x4F60 + i) for i in range(14)],
              open(adir / "tokens.json", "w"))

    # vad dir — zero kernels + biased softmax head so every frame scores
    # as speech deterministically (silence pdf 0 gets a large negative bias)
    vdir = tmp_path / "vad"
    vdir.mkdir()
    (vdir / "config.yaml").write_text(yaml.safe_dump({
        "encoder_conf": {"input_dim": VCFG.input_dim,
                         "input_affine_dim": VCFG.input_affine_dim,
                         "fsmn_layers": VCFG.fsmn_layers,
                         "linear_dim": VCFG.linear_dim,
                         "proj_dim": VCFG.proj_dim, "lorder": VCFG.lorder,
                         "rorder": 0,
                         "output_affine_dim": VCFG.output_affine_dim,
                         "output_dim": VCFG.output_dim},
        "frontend_conf": {"lfr_m": VCFG.lfr_m, "lfr_n": VCFG.lfr_n,
                          "n_mels": VCFG.input_dim // VCFG.lfr_m},
    }))
    vstate = {k: torch.zeros(v)
              for k, v in vad_fsmn.expected_key_manifest(VCFG).items()}
    bias = torch.full((VCFG.output_dim,), 4.0)
    bias[0] = -8.0
    vstate["encoder.out_linear2.linear.bias"] = bias
    torch.save(vstate, vdir / "model.pt")

    # punc dir (tiny config, random weights)
    pdir = tmp_path / "punc"
    pdir.mkdir()
    (pdir / "config.yaml").write_text(yaml.safe_dump({
        "encoder_conf": {"output_size": PCFG.d_model,
                         "attention_heads": PCFG.n_heads,
                         "linear_units": PCFG.ffn_dim,
                         "num_blocks": PCFG.num_blocks,
                         "kernel_size": PCFG.fsmn_kernel},
        "model_conf": {"embed_unit": PCFG.embed_unit,
                       "vocab_size": PCFG.vocab_size},
        "vocab_size": PCFG.vocab_size,
    }))
    pstate = {k: torch.tensor(rng.normal(0, 0.05, size=v).astype(np.float32))
              for k, v in punc_ct.expected_key_manifest(PCFG).items()}
    torch.save(pstate, pdir / "model.pt")
    json.dump(["<unk>"] + [chr(0x4F60 + i) for i in range(PCFG.vocab_size - 1)],
              open(pdir / "tokens.json", "w"))

    monkeypatch.setenv("EASEVOICE_PARAFORMER_DIR", str(adir))
    monkeypatch.setenv("EASEVOICE_VAD_DIR", str(vdir))
    monkeypatch.setenv("EASEVOICE_PUNC_DIR", str(pdir))

    recognize = AudioService._load_paraformer_jax()
    assert recognize is not None

    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    pcm = (wav * 32767).astype("<i2")
    wav_path = tmp_path / "fix.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    text = recognize(str(wav_path))
    assert isinstance(text, str)
    if text:  # random tiny weights may legitimately emit nothing
        assert text[-1] in ("。", "？")
