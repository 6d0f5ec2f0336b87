"""Synthesis real-time-factor harness (BASELINE.md north star: RTF <= 0.1).

Measures the two synthesis hot loops at REAL model config on one chip:
  A. KV-cached AR decode (24-layer GPT, while_loop) for N new tokens;
  B. VITS decode (RVQ -> TextEncoder -> flow -> HiFi-GAN) for those tokens.
RTF = wall / generated-audio-seconds (25 semantic tokens/s -> 2 spec frames
per token -> 1280 samples @32 kHz per token).

Weights are random (no egress for pretrained); the compute cost is
weight-independent.  Run: python benchmarks/rtf.py [n_tokens] [batch]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_tokens: int = 250, batch: int = 1) -> dict:
    """Measure synthesis RTF; returns the metric dict (importable by bench.py)."""
    import jax

    from easevoice_trainer_tpu.models.gpt import (
        Text2SemanticDecoder, T2SConfig, decode_ar, DecodeParams)
    from easevoice_trainer_tpu.models.sovits import SynthesizerTrn, SovitsConfig
    from easevoice_trainer_tpu.utils.config import GlobalCFG, host_cpu_init
    GlobalCFG()   # persistent compile cache (standalone runs)

    cpu = jax.local_devices(backend="cpu")[0]
    rng = np.random.default_rng(0)

    # ---- models at real config, init on host --------------------------------
    t2s_cfg = T2SConfig()
    t2s = Text2SemanticDecoder(t2s_cfg)
    vits_cfg = SovitsConfig()
    vits = SynthesizerTrn(vits_cfg)

    Tx, Tp = 64, 128            # text phonemes, semantic prompt
    x = rng.integers(0, 732, (batch, Tx)).astype(np.int32)
    x_lens = np.full((batch,), Tx, np.int32)
    prompts = rng.integers(0, 1024, (batch, Tp)).astype(np.int32)
    bert = rng.normal(size=(batch, Tx, 1024)).astype(np.float32)

    with host_cpu_init():
        key = jax.random.PRNGKey(0)
        tvars = jax.jit(t2s.init)(key, x, x_lens, prompts[:, :8],
                                  np.full((batch,), 8, np.int32), bert)
        tvars = jax.tree_util.tree_map(np.asarray, tvars)
        frames = 32
        vvars = jax.jit(vits.init)(
            {"params": key, "slice": key, "latent": key, "dropout": key},
            jax.numpy.zeros((1, frames, 768)),
            jax.numpy.zeros((1, frames, 1025)),
            np.array([frames], np.int32),
            jax.numpy.zeros((1, 16), np.int32), np.array([16], np.int32))
        vvars = jax.tree_util.tree_map(np.asarray, vvars)
    # commit weights to the accelerator — host-committed params would pull
    # the whole computation back to CPU
    dev = jax.devices()[0]
    tvars = jax.device_put(tvars, dev)
    vvars = jax.device_put(vvars, dev)

    params = DecodeParams(top_k=15, max_new_tokens=n_tokens, min_tokens=5,
                          repetition_penalty=1.35, early_stop_num=-1,
                          temperature=1.0)
    # suppress EOS entirely so the random model generates the full budget
    params = DecodeParams(**{**params.__dict__, "min_tokens": n_tokens + 1})

    def run_decode(seed):
        return decode_ar(t2s, {"params": tvars["params"]},
                         jax.random.PRNGKey(seed), x, x_lens, prompts, bert,
                         params)

    # warmup/compile (+ first-readback channel warmup on tunneled devices)
    tokens, lengths = run_decode(0)
    np.asarray(tokens)
    t0 = time.perf_counter()
    tokens, lengths = run_decode(1)
    np.asarray(tokens)   # force completion with a real value fetch
    t_ar = time.perf_counter() - t0

    # ---- vocoder ---------------------------------------------------------------
    codes = np.asarray(tokens)[:, :n_tokens] % 1024
    refer = rng.normal(size=(1, 160, 1025)).astype(np.float32) ** 2
    refer_lens = np.array([160], np.int32)
    text = x[:1, :]
    text_lens = x_lens[:1]

    voc = jax.jit(lambda p, c: vits.apply(
        {"params": p}, c, text, text_lens, refer, refer_lens,
        method=SynthesizerTrn.decode))
    wav = voc(vvars["params"], codes[:1])
    np.asarray(wav)
    t0 = time.perf_counter()
    wav = voc(vvars["params"], codes[:1])
    np.asarray(wav)      # force completion with a real value fetch
    t_voc = time.perf_counter() - t0

    audio_sec = n_tokens / 25.0
    rtf = (t_ar / batch + t_voc) / audio_sec
    return {
        "metric": "synthesis_rtf",
        "value": round(rtf, 4),
        "unit": "wall_sec/audio_sec",
        "vs_baseline": round(0.1 / rtf, 3),   # >1 beats the 0.1 target
        "detail": {"ar_sec": round(t_ar, 3), "vocoder_sec": round(t_voc, 3),
                   "audio_sec": audio_sec, "batch": batch},
    }


def measure_multi_segment(n_segments: int = 6, batch_size: int = 4) -> dict:
    """RTF through the REAL clone path: ``TTS.run`` end-to-end at real model
    config — text preprocessing, ``to_batch`` bucketing, AR prefill+decode,
    ``parallel_infer`` batched vocoding, and fragment splice all included
    (reference: src/easevoice/inference/tts.py:577-908).

    Random weights (no egress), so generated token counts vary run-to-run;
    the denominator is the ACTUAL audio seconds produced, making the ratio
    honest regardless of early EOS.
    """
    import tempfile

    import jax

    from easevoice_trainer_tpu.inference.tts import (InferenceTaskData, TTS,
                                                     TTSConfig)
    from easevoice_trainer_tpu.models.cnhubert import CNHubert, HubertConfig
    from easevoice_trainer_tpu.models.gpt import (Text2SemanticDecoder,
                                                  T2SConfig)
    from easevoice_trainer_tpu.models.sovits import (SovitsConfig,
                                                     SynthesizerTrn)
    from easevoice_trainer_tpu.utils import audio_io
    from easevoice_trainer_tpu.utils.config import host_cpu_init

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)

    vits_cfg = SovitsConfig()
    vits = SynthesizerTrn(vits_cfg)
    t2s_cfg = T2SConfig()
    t2s = Text2SemanticDecoder(t2s_cfg)
    hcfg = HubertConfig()
    hubert = CNHubert(hcfg)

    with host_cpu_init():
        vvars = jax.jit(vits.init)(
            {"params": key, "slice": key, "latent": key, "dropout": key},
            np.zeros((1, 8, vits_cfg.ssl_dim), np.float32),
            np.zeros((1, 8, 1025), np.float32), np.array([8], np.int32),
            np.zeros((1, 4), np.int32), np.array([4], np.int32))
        tvars = jax.jit(t2s.init)(
            key, np.zeros((1, 4), np.int32), np.array([4], np.int32),
            np.zeros((1, 6), np.int32), np.array([6], np.int32),
            np.zeros((1, 4, 1024), np.float32))
        hvars = jax.jit(hubert.init)(key, np.zeros((1, 16000), np.float32))
        vvars, tvars, hvars = jax.tree_util.tree_map(
            np.asarray, (vvars, tvars, hvars))

    tmp = tempfile.mkdtemp(prefix="ev_rtf_")
    cfg = TTSConfig(os.path.join(tmp, "tts_infer.yaml"))
    tts = TTS(cfg, models=dict(
        vits=vits, vits_cfg=vits_cfg,
        vits_params=jax.device_put(vvars["params"], dev),
        t2s=t2s, t2s_cfg=t2s_cfg,
        t2s_params=jax.device_put(tvars["params"], dev),
        cnhubert=hubert, cnhubert_params=jax.device_put(hvars, dev),
        bert=None))

    rng = np.random.default_rng(0)
    ref_path = os.path.join(tmp, "ref.wav")
    audio_io.write_wav(ref_path,
                       rng.uniform(-0.3, 0.3, 32000 * 5).astype(np.float32),
                       32000)

    sentences = [
        "The quick brown fox jumps over the lazy dog near the river bank.",
        "A journey of a thousand miles begins with a single careful step.",
        "Voice cloning turns a short reference clip into a full synthetic "
        "narrator.",
        "Benchmarks must include every stage, not only the hot inner loops.",
        "Segment bucketing groups sentences of similar length into one "
        "batch.",
        "The final splice stitches fragments back in their original order.",
    ]
    text = " ".join(sentences[:n_segments])
    task = InferenceTaskData(
        text=text, text_lang="en", ref_audio_path=ref_path, prompt_text="",
        text_split_method="by_english_period", batch_size=batch_size,
        parallel_infer=True, split_bucket=True, top_k=15,
        repetition_penalty=1.35, seed=1234)

    # cold pass = compile (prefill/decode/vocode shapes); second pass is the
    # production steady state a serving deployment sees
    t0 = time.perf_counter()
    outs = list(tts.run(task))
    t_cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = list(tts.run(task))
    wall = time.perf_counter() - t0

    sr, audio = outs[0]
    audio_sec = len(audio) / sr
    rtf = wall / max(audio_sec, 1e-6)
    return {
        "rtf": round(rtf, 4),
        "wall_sec": round(wall, 3),
        "cold_sec": round(t_cold, 3),
        "audio_sec": round(audio_sec, 2),
        "segments": n_segments,
        "batch_size": batch_size,
        "phase_sec": {k: round(v, 3)
                      for k, v in getattr(tts, "last_phases", {}).items()},
    }


def main():
    if "--multi-segment" in sys.argv:
        print(json.dumps(measure_multi_segment()))
        return
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 250   # ~10 s
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    print(json.dumps(measure(n_tokens, batch)))


if __name__ == "__main__":
    main()
