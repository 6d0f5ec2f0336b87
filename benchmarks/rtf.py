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
import sys
import time

import numpy as np


def measure(n_tokens: int = 250, batch: int = 1) -> dict:
    """Measure synthesis RTF; returns the metric dict (importable by bench.py)."""
    import jax

    from easevoice_trainer_tpu.models.gpt import (
        Text2SemanticDecoder, T2SConfig, decode_ar, DecodeParams)
    from easevoice_trainer_tpu.models.sovits import SynthesizerTrn, SovitsConfig

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

    with jax.default_device(cpu):
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


def main():
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 250   # ~10 s
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    print(json.dumps(measure(n_tokens, batch)))


if __name__ == "__main__":
    main()
