"""FSMN voice-activity detection in JAX (FunASR ``fsmn-vad`` equivalent).

The reference's zh ASR pipeline runs FunASR's streaming FSMN VAD in front
of Paraformer (reference: src/audiokit/asr/asr.py:15-43 —
``iic/speech_fsmn_vad_zh-cn-16k-common-pytorch``): long recordings are cut
into speech segments, each transcribed independently.  FunASR has no TPU
runtime, so this is a from-scratch JAX rebuild:

* frontend: the same kaldi-compatible 80-dim log-fbank as the Paraformer
  port (25 ms / 10 ms, hamming, snip-edges) with LFR 5/1 stacking and the
  checkpoint's ``am.mvn`` CMVN — a 400-dim frame every 10 ms;
* scorer: FunASR's FSMN net — affine 400→140→250, four memory blocks
  (250→128 projection, 20-tap *causal* depthwise conv memory, 128→250
  affine + relu), affine 250→140→248 and a softmax over 248 senones of
  which id 0 is the silence pdf (``sil_pdf_ids: [0]``); speech probability
  per 10 ms frame is ``1 - p(sil)``;
* decision: the FunASR streaming state machine is re-derived as an
  *offline* hysteresis segmenter with the published model's thresholds
  (window 200 ms, speech-noise threshold 0.6, sil→speech 150 ms,
  max end silence 800 ms, max single segment 60 s, 200 ms lookback /
  100 ms lookahead extension).  Batch transcription is offline, so the
  one-frame-at-a-time state machine adds nothing but latency machinery;
  the segment boundaries come from the same smoothed-probability
  hysteresis rules.

Weights load from the modelscope/funasr checkpoint directory
(``model.pt`` + ``config.yaml`` + ``am.mvn``); ``FsmnVAD`` degrades to
``available=False`` when the directory is absent, and the ASR chain then
transcribes files whole (the slicer already bounds clip length upstream).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.logger import logger
from .asr_paraformer import apply_lfr, kaldi_fbank, load_cmvn

SAMPLE_RATE = 16000
FRAME_MS = 10


@dataclasses.dataclass(frozen=True)
class FsmnVadConfig:
    # net (encoder_conf of the published fsmn-vad checkpoint)
    input_dim: int = 400           # 80 mels * LFR 5
    input_affine_dim: int = 140
    fsmn_layers: int = 4
    linear_dim: int = 250
    proj_dim: int = 128
    lorder: int = 20
    rorder: int = 0
    output_affine_dim: int = 140
    output_dim: int = 248
    lfr_m: int = 5
    lfr_n: int = 1
    sil_pdf_ids: Tuple[int, ...] = (0,)
    # decision (model_conf)
    window_size_ms: int = 200
    speech_noise_thres: float = 0.6
    sil_to_speech_time_thres: int = 150
    speech_to_sil_time_thres: int = 150
    max_end_silence_time: int = 800
    max_single_segment_time: int = 60000
    lookback_time_start_point: int = 200
    lookahead_time_end_point: int = 100

    @classmethod
    def from_yaml(cls, cfg: dict) -> "FsmnVadConfig":
        enc = cfg.get("encoder_conf", {})
        mdl = cfg.get("model_conf", {})
        front = cfg.get("frontend_conf", {})
        lfr_m = front.get("lfr_m", 5)
        n_mels = front.get("n_mels", 80)
        return cls(
            input_dim=n_mels * lfr_m,
            input_affine_dim=enc.get("input_affine_dim", 140),
            fsmn_layers=enc.get("fsmn_layers", 4),
            linear_dim=enc.get("linear_dim", 250),
            proj_dim=enc.get("proj_dim", 128),
            lorder=enc.get("lorder", 20),
            rorder=enc.get("rorder", 0),
            output_affine_dim=enc.get("output_affine_dim", 140),
            output_dim=enc.get("output_dim", 248),
            lfr_m=lfr_m,
            lfr_n=front.get("lfr_n", 1),
            sil_pdf_ids=tuple(mdl.get("sil_pdf_ids", [0])),
            window_size_ms=mdl.get("window_size_ms", 200),
            speech_noise_thres=mdl.get("speech_noise_thres", 0.6),
            sil_to_speech_time_thres=mdl.get("sil_to_speech_time_thres", 150),
            speech_to_sil_time_thres=mdl.get("speech_to_sil_time_thres", 150),
            max_end_silence_time=mdl.get("max_end_silence_time", 800),
            max_single_segment_time=mdl.get("max_single_segment_time", 60000),
            lookback_time_start_point=mdl.get("lookback_time_start_point", 200),
            lookahead_time_end_point=mdl.get("lookahead_time_end_point", 100),
        )


# ---------------------------------------------------------------------------
# JAX net (FunASR fsmn_vad_streaming/encoder.py FSMN)
# ---------------------------------------------------------------------------

def _build_model(cfg: FsmnVadConfig):
    import jax.numpy as jnp
    from flax import linen as nn

    class BasicBlock(nn.Module):
        """linear(no bias) -> causal depthwise memory -> affine -> relu."""
        cfg: FsmnVadConfig

        @nn.compact
        def __call__(self, x):
            c = self.cfg
            p = nn.Dense(c.proj_dim, use_bias=False, name="linear")(x)
            # causal memory: current frame + (lorder-1) past frames
            mem = nn.Conv(c.proj_dim, (c.lorder,),
                          padding=[(c.lorder - 1, 0)],
                          feature_group_count=c.proj_dim, use_bias=False,
                          name="conv_left")(p)
            if c.rorder > 0:
                # future taps start one frame ahead (FunASR pads [0, rorder]
                # and drops the current frame from the right conv)
                fut = nn.Conv(c.proj_dim, (c.rorder,),
                              padding=[(0, c.rorder)],
                              feature_group_count=c.proj_dim, use_bias=False,
                              name="conv_right")(p)
                mem = mem + fut[:, 1:p.shape[1] + 1]
            x = p + mem
            x = nn.Dense(c.linear_dim, name="affine")(x)
            return nn.relu(x)

    class FSMN(nn.Module):
        cfg: FsmnVadConfig

        @nn.compact
        def __call__(self, x):
            c = self.cfg
            x = nn.relu(nn.Dense(c.input_affine_dim, name="in_linear1")(x))
            x = nn.relu(nn.Dense(c.linear_dim, name="in_linear2")(x))
            for i in range(c.fsmn_layers):
                x = BasicBlock(c, name=f"fsmn_{i}")(x)
            x = nn.Dense(c.output_affine_dim, name="out_linear1")(x)
            x = nn.Dense(c.output_dim, name="out_linear2")(x)
            return nn.softmax(x, axis=-1).astype(jnp.float32)

    return FSMN(cfg)


def convert_fsmn_vad_weights(state: Dict[str, "np.ndarray"],
                             cfg: FsmnVadConfig) -> dict:
    """Map a funasr fsmn-vad ``model.pt`` state dict onto the flax tree.

    FunASR module naming: ``encoder.in_linear1.linear.weight``,
    ``encoder.fsmn.{i}.{linear|fsmn_block|affine}...`` — the standalone
    checkpoint may carry the bare ``in_linear1...`` keys, so the encoder
    prefix is auto-detected.
    """
    keys = set(state.keys())
    prefix = "encoder." if any(k.startswith("encoder.") for k in keys) else ""

    def t(key):
        arr = state[prefix + key]
        arr = arr.detach().cpu().numpy() if hasattr(arr, "detach") \
            else np.asarray(arr)
        return arr.astype(np.float32)

    def dense(name, bias=True):
        p = {"kernel": t(name + ".linear.weight").T}
        if bias:
            p["bias"] = t(name + ".linear.bias")
        return p

    def dwconv2d(name):
        # torch depthwise Conv2d weight (C, 1, k, 1) -> flax Conv1d (k, 1, C)
        w = t(name + ".weight")
        return {"kernel": w[:, :, :, 0].transpose(2, 1, 0)}

    params = {
        "in_linear1": dense("in_linear1"),
        "in_linear2": dense("in_linear2"),
        "out_linear1": dense("out_linear1"),
        "out_linear2": dense("out_linear2"),
    }
    for i in range(cfg.fsmn_layers):
        blk = {
            "linear": dense(f"fsmn.{i}.linear", bias=False),
            "conv_left": dwconv2d(f"fsmn.{i}.fsmn_block.conv_left"),
            "affine": dense(f"fsmn.{i}.affine"),
        }
        if cfg.rorder > 0:
            blk["conv_right"] = dwconv2d(f"fsmn.{i}.fsmn_block.conv_right")
        params[f"fsmn_{i}"] = blk
    return {"params": params}


def expected_key_manifest(cfg: FsmnVadConfig,
                          prefix: str = "encoder.") -> Dict[str, Tuple[int, ...]]:
    """torch key -> shape manifest for shape-level dry checks."""
    c = cfg
    man: Dict[str, Tuple[int, ...]] = {
        "in_linear1.linear.weight": (c.input_affine_dim, c.input_dim),
        "in_linear1.linear.bias": (c.input_affine_dim,),
        "in_linear2.linear.weight": (c.linear_dim, c.input_affine_dim),
        "in_linear2.linear.bias": (c.linear_dim,),
        "out_linear1.linear.weight": (c.output_affine_dim, c.linear_dim),
        "out_linear1.linear.bias": (c.output_affine_dim,),
        "out_linear2.linear.weight": (c.output_dim, c.output_affine_dim),
        "out_linear2.linear.bias": (c.output_dim,),
    }
    for i in range(c.fsmn_layers):
        man[f"fsmn.{i}.linear.linear.weight"] = (c.proj_dim, c.linear_dim)
        man[f"fsmn.{i}.fsmn_block.conv_left.weight"] = (c.proj_dim, 1,
                                                        c.lorder, 1)
        if c.rorder > 0:
            man[f"fsmn.{i}.fsmn_block.conv_right.weight"] = (c.proj_dim, 1,
                                                             c.rorder, 1)
        man[f"fsmn.{i}.affine.linear.weight"] = (c.linear_dim, c.proj_dim)
        man[f"fsmn.{i}.affine.linear.bias"] = (c.linear_dim,)
    return {prefix + k: v for k, v in man.items()}


# ---------------------------------------------------------------------------
# Offline segmenter (host-side numpy over per-frame speech probabilities)
# ---------------------------------------------------------------------------

def segment_speech_probs(probs: np.ndarray, cfg: FsmnVadConfig,
                         frame_ms: int = FRAME_MS) -> List[Tuple[int, int]]:
    """Speech probabilities per frame -> [(start_ms, end_ms)] segments.

    Offline re-derivation of FunASR's windowed state machine: smooth over
    the 200 ms window, threshold at ``speech_noise_thres`` with the
    sil→speech / speech→sil persistence times as hysteresis, close a
    segment after ``max_end_silence_time`` of silence, extend by the
    lookback/lookahead margins, split at ``max_single_segment_time``.
    """
    n = len(probs)
    if n == 0:
        return []
    win = max(1, cfg.window_size_ms // frame_ms)
    kernel = np.ones(win, np.float32) / win
    smooth = np.convolve(np.asarray(probs, np.float32), kernel, mode="same")
    is_speech = smooth >= cfg.speech_noise_thres

    up = max(1, cfg.sil_to_speech_time_thres // frame_ms)
    down = max(1, cfg.max_end_silence_time // frame_ms)
    segs: List[Tuple[int, int]] = []
    state = 0  # 0 = silence, 1 = speech
    run = 0
    start = 0
    for i in range(n):
        if state == 0:
            run = run + 1 if is_speech[i] else 0
            if run >= up:
                state, start, run = 1, i - run + 1, 0
        else:
            run = run + 1 if not is_speech[i] else 0
            if run >= down:
                segs.append((start, i - run + 1))
                state, run = 0, 0
    if state == 1:
        segs.append((start, n))

    look_b = cfg.lookback_time_start_point // frame_ms
    look_a = cfg.lookahead_time_end_point // frame_ms
    max_frames = max(1, cfg.max_single_segment_time // frame_ms)
    out: List[Tuple[int, int]] = []
    for s, e in segs:
        s = max(0, s - look_b)
        e = min(n, e + look_a)
        while e - s > max_frames:
            out.append((s * frame_ms, (s + max_frames) * frame_ms))
            s += max_frames
        out.append((s * frame_ms, e * frame_ms))
    # merge strict overlaps produced by the extension margins (touching
    # boundaries from the max-length split stay separate)
    merged: List[Tuple[int, int]] = []
    for s, e in out:
        if merged and s < merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


# ---------------------------------------------------------------------------
# Runtime wrapper
# ---------------------------------------------------------------------------

class FsmnVAD:
    """Filesystem-checkpoint FSMN VAD.

    ``model_dir`` holds ``model.pt`` + ``config.yaml`` + ``am.mvn`` — the
    layout ``tools/fetch_pretrained.py`` produces from the modelscope repo
    ``iic/speech_fsmn_vad_zh-cn-16k-common-pytorch``.
    """

    def __init__(self, model_dir: str):
        self.model_dir = model_dir
        self.available = False
        model_path = None
        for name in ("model.pt", "model.pb", "pytorch_model.bin"):
            p = os.path.join(model_dir, name)
            if os.path.exists(p):
                model_path = p
                break
        if model_path is None:
            return
        try:
            self._load(model_path)
            self.available = True
        except Exception:
            import traceback
            logger.error("fsmn-vad load failed\n%s", traceback.format_exc())

    def _load(self, model_path: str):
        import jax
        import jax.numpy as jnp
        import torch
        import yaml

        cfg_path = os.path.join(self.model_dir, "config.yaml")
        raw_cfg = {}
        if os.path.exists(cfg_path):
            with open(cfg_path, encoding="utf-8") as f:
                raw_cfg = yaml.safe_load(f) or {}
        self.cfg = FsmnVadConfig.from_yaml(raw_cfg)

        mvn_path = os.path.join(self.model_dir, "am.mvn")
        if os.path.exists(mvn_path):
            self.cmvn_shift, self.cmvn_scale = load_cmvn(mvn_path)
        else:
            self.cmvn_shift = np.zeros(self.cfg.input_dim, np.float32)
            self.cmvn_scale = np.ones(self.cfg.input_dim, np.float32)

        state = torch.load(model_path, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        self.model = _build_model(self.cfg)
        self.params = jax.tree.map(
            jnp.asarray, convert_fsmn_vad_weights(state, self.cfg))
        self._forward = jax.jit(
            lambda params, x: self.model.apply(params, x))

    def speech_probs(self, wav: np.ndarray) -> np.ndarray:
        """Per-10 ms-frame speech probability for a mono 16 kHz wave."""
        import jax.numpy as jnp

        feats = kaldi_fbank(wav, n_mels=self.cfg.input_dim // self.cfg.lfr_m)
        feats = apply_lfr(feats, self.cfg.lfr_m, self.cfg.lfr_n)
        feats = (feats + self.cmvn_shift) * self.cmvn_scale
        if feats.shape[0] == 0:
            return np.zeros((0,), np.float32)
        t = feats.shape[0]
        t_pad = max(16, 1 << (t - 1).bit_length())
        x = np.zeros((1, t_pad, feats.shape[1]), np.float32)
        x[0, :t] = feats
        scores = np.asarray(self._forward(self.params, jnp.asarray(x)))[0, :t]
        sil = scores[:, list(self.cfg.sil_pdf_ids)].sum(axis=-1)
        return 1.0 - sil

    def segments(self, wav: np.ndarray,
                 sample_rate: int = SAMPLE_RATE) -> List[Tuple[int, int]]:
        """[(start_sample, end_sample)] speech segments; [] when silent."""
        probs = self.speech_probs(wav)
        ms = segment_speech_probs(probs, self.cfg)
        step = sample_rate // 1000
        return [(s * step, min(len(wav), e * step)) for s, e in ms]
