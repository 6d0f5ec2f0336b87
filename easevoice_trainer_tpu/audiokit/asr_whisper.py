"""Whisper ASR in JAX (TPU-native replacement for faster-whisper/funasr).

The reference ships faster-whisper (CTranslate2) and funasr as hard ASR
dependencies (reference: src/audiokit/asr/asr.py:15-148).  Neither has a
TPU runtime, so this is a from-scratch JAX Whisper: log-mel frontend
matching openai/whisper exactly (n_fft 400, hop 160, 80/128 slaney mels,
log10 + max-8dB clamp), conv-downsampled transformer encoder, KV-cached
decoder driven by one jitted prefill + ``lax.while_loop`` greedy decode
(same single-program pattern as models/gpt/decode.py — eager per-token
dispatch over the TPU tunnel would be pathologically slow).

Weights load from any HF whisper checkpoint directory
(pytorch_model.bin / model.safetensors + config.json + tokenizer files);
``WhisperASR`` degrades to ``available=False`` when absent.
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.logger import logger

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30
CHUNK_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS          # 480000
N_FRAMES = CHUNK_SAMPLES // HOP                      # 3000


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    n_heads: int = 6
    ffn_dim: int = 1536
    vocab_size: int = 51865
    max_source_positions: int = 1500
    max_target_positions: int = 448

    @classmethod
    def from_hf(cls, cfg: dict) -> "WhisperConfig":
        return cls(
            n_mels=cfg.get("num_mel_bins", 80),
            d_model=cfg.get("d_model", 384),
            encoder_layers=cfg.get("encoder_layers", 4),
            decoder_layers=cfg.get("decoder_layers", 4),
            n_heads=cfg.get("encoder_attention_heads", 6),
            ffn_dim=cfg.get("encoder_ffn_dim", 1536),
            vocab_size=cfg.get("vocab_size", 51865),
            max_source_positions=cfg.get("max_source_positions", 1500),
            max_target_positions=cfg.get("max_target_positions", 448),
        )


# ---------------------------------------------------------------------------
# log-mel frontend (numpy, matches transformers.WhisperFeatureExtractor)
# ---------------------------------------------------------------------------


def _hz_to_mel(f):
    """Slaney mel scale (librosa default, whisper's filter bank)."""
    f = np.asarray(f, np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    mel = np.where(log_region,
                   15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                   / np.log(6.4) * 27.0, mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0),
                 f)
    return f


def mel_filters(n_mels: int) -> np.ndarray:
    """(n_mels, 1 + n_fft/2) slaney-normalized triangular filter bank."""
    fft_freqs = np.fft.rfftfreq(N_FFT, 1.0 / SAMPLE_RATE)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(8000.0), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[:, None]).astype(np.float32)


def log_mel_spectrogram(wav: np.ndarray, n_mels: int) -> np.ndarray:
    """(samples,) float32 @16 kHz -> (n_mels, frames); whisper semantics."""
    wav = np.asarray(wav, np.float32)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float64)
    pad = N_FFT // 2
    y = np.pad(wav.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - N_FFT) // HOP
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    stft = np.fft.rfft(y[idx] * window, axis=-1)
    magnitudes = (np.abs(stft[:-1]) ** 2).T            # drop last frame
    mel = mel_filters(n_mels) @ magnitudes
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's encoder positional embedding."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


def build_model(cfg: WhisperConfig):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class Attention(nn.Module):
        n_heads: int
        d_model: int
        name_prefix: str = ""

        @nn.compact
        def __call__(self, x, kv, mask=None, cache=None, cache_index=None):
            """x: (B, Tq, D) queries; kv: (B, Tk, D) keys/values source.
            With ``cache`` (dict k/v arrays) this is incremental self-attn:
            new k/v are written at cache_index, attention runs over the
            cache."""
            d, h = self.d_model, self.n_heads
            dk = d // h
            q = nn.Dense(d, name="q_proj")(x) * (dk ** -0.5)
            k = nn.Dense(d, use_bias=False, name="k_proj")(kv)
            v = nn.Dense(d, name="v_proj")(kv)
            b = x.shape[0]
            shp = lambda z, t: z.reshape(b, t, h, dk)
            q = shp(q, x.shape[1])
            k = shp(k, kv.shape[1])
            v = shp(v, kv.shape[1])
            if cache is not None:
                k = jax.lax.dynamic_update_slice(
                    cache["k"], k, (0, cache_index, 0, 0))
                v = jax.lax.dynamic_update_slice(
                    cache["v"], v, (0, cache_index, 0, 0))
                new_cache = {"k": k, "v": v}
            else:
                new_cache = None
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            if mask is not None:
                scores = scores + mask
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype).reshape(b, x.shape[1], d)
            return nn.Dense(d, name="out_proj")(out), new_cache

    class EncoderLayer(nn.Module):
        cfg: WhisperConfig

        @nn.compact
        def __call__(self, x):
            c = self.cfg
            y = nn.LayerNorm(name="self_attn_layer_norm")(x)
            y, _ = Attention(c.n_heads, c.d_model, name="self_attn")(y, y)
            x = x + y
            y = nn.LayerNorm(name="final_layer_norm")(x)
            y = nn.Dense(c.ffn_dim, name="fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            return x + nn.Dense(c.d_model, name="fc2")(y)

    class Encoder(nn.Module):
        cfg: WhisperConfig

        @nn.compact
        def __call__(self, mel):
            """mel: (B, n_mels, 3000) -> (B, 1500, D)."""
            c = self.cfg
            x = mel.transpose(0, 2, 1)                       # (B, T, mel)
            x = nn.Conv(c.d_model, (3,), padding=[(1, 1)], name="conv1")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = nn.Conv(c.d_model, (3,), strides=(2,), padding=[(1, 1)],
                        name="conv2")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = x + jnp.asarray(_sinusoids(c.max_source_positions,
                                           c.d_model))[None]
            for i in range(c.encoder_layers):
                x = EncoderLayer(c, name=f"layer_{i}")(x)
            return nn.LayerNorm(name="layer_norm")(x)

    class DecoderStep(nn.Module):
        """One decoder pass over Tq tokens with KV caches (prefill: Tq>1)."""

        cfg: WhisperConfig

        @nn.compact
        def __call__(self, tokens, enc_out, pos_offset, self_caches,
                     cross_caches, attn_mask):
            c = self.cfg
            pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02),
                (c.max_target_positions, c.d_model), jnp.float32)
            tok_emb = nn.Embed(c.vocab_size, c.d_model, name="tok_emb")
            b, tq = tokens.shape
            pos = pos_offset + jnp.arange(tq)
            # params may arrive as host numpy; jnp-index for traced pos
            x = tok_emb(tokens) + jnp.asarray(pos_emb)[pos][None]
            new_self = []
            for i in range(c.decoder_layers):
                y = nn.LayerNorm(name=f"layer_{i}_self_ln")(x)
                y, sc = Attention(c.n_heads, c.d_model,
                                  name=f"layer_{i}_self_attn")(
                    y, y, mask=attn_mask, cache=self_caches[i],
                    cache_index=pos_offset)
                new_self.append(sc)
                x = x + y
                y = nn.LayerNorm(name=f"layer_{i}_cross_ln")(x)
                if cross_caches is not None:
                    # cross k/v precomputed from enc_out
                    d, h = c.d_model, c.n_heads
                    dk = d // h
                    q = nn.Dense(d, name=f"layer_{i}_cross_q")(y) * (dk ** -0.5)
                    q = q.reshape(b, tq, h, dk)
                    ck, cv = cross_caches[i]["k"], cross_caches[i]["v"]
                    s = jnp.einsum("bqhd,bkhd->bhqk", q, ck,
                                   preferred_element_type=jnp.float32)
                    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
                    o = jnp.einsum("bhqk,bkhd->bqhd", p, cv,
                                   preferred_element_type=jnp.float32
                                   ).astype(x.dtype).reshape(b, tq, d)
                    y = nn.Dense(d, name=f"layer_{i}_cross_out")(o)
                else:
                    y, _ = Attention(c.n_heads, c.d_model,
                                     name=f"layer_{i}_cross_attn")(y, enc_out)
                x = x + y
                y = nn.LayerNorm(name=f"layer_{i}_ffn_ln")(x)
                y = nn.Dense(c.ffn_dim, name=f"layer_{i}_fc1")(y)
                y = jax.nn.gelu(y, approximate=False)
                x = x + nn.Dense(c.d_model, name=f"layer_{i}_fc2")(y)
            x = nn.LayerNorm(name="layer_norm")(x)
            logits = x @ tok_emb.embedding.T
            return logits, new_self

    class CrossKV(nn.Module):
        """Precompute per-layer cross-attention k/v from encoder output."""

        cfg: WhisperConfig

        @nn.compact
        def __call__(self, enc_out):
            c = self.cfg
            h = c.n_heads
            dk = c.d_model // h
            b, tk, _ = enc_out.shape
            caches = []
            for i in range(c.decoder_layers):
                k = nn.Dense(c.d_model, use_bias=False,
                             name=f"layer_{i}_cross_k")(enc_out)
                v = nn.Dense(c.d_model, name=f"layer_{i}_cross_v")(enc_out)
                caches.append({"k": k.reshape(b, tk, h, dk),
                               "v": v.reshape(b, tk, h, dk)})
            return caches

    return Encoder(cfg), DecoderStep(cfg), CrossKV(cfg)


# ---------------------------------------------------------------------------
# HF state-dict -> flax params
# ---------------------------------------------------------------------------


def convert_whisper_weights(state: Dict[str, np.ndarray], cfg: WhisperConfig
                            ) -> Tuple[dict, dict, dict]:
    """Returns (encoder_params, decoder_params, crosskv_params)."""
    from ..train.ckpt import unflatten_tree

    def S(k):
        for p in ("model.", ""):
            if p + k in state:
                return np.asarray(state[p + k], np.float32)
        raise KeyError(k)

    def lin(out, tkey, fkey, bias=True):
        out[f"{fkey}/kernel"] = S(tkey + ".weight").T
        if bias:
            out[f"{fkey}/bias"] = S(tkey + ".bias")

    def ln(out, tkey, fkey):
        out[f"{fkey}/scale"] = S(tkey + ".weight")
        out[f"{fkey}/bias"] = S(tkey + ".bias")

    enc: Dict[str, np.ndarray] = {}
    enc["conv1/kernel"] = S("encoder.conv1.weight").transpose(2, 1, 0)
    enc["conv1/bias"] = S("encoder.conv1.bias")
    enc["conv2/kernel"] = S("encoder.conv2.weight").transpose(2, 1, 0)
    enc["conv2/bias"] = S("encoder.conv2.bias")
    for i in range(cfg.encoder_layers):
        t = f"encoder.layers.{i}"
        f = f"layer_{i}"
        ln(enc, f"{t}.self_attn_layer_norm", f"{f}/self_attn_layer_norm")
        for name in ("q_proj", "v_proj", "out_proj"):
            lin(enc, f"{t}.self_attn.{name}", f"{f}/self_attn/{name}")
        lin(enc, f"{t}.self_attn.k_proj", f"{f}/self_attn/k_proj", bias=False)
        ln(enc, f"{t}.final_layer_norm", f"{f}/final_layer_norm")
        lin(enc, f"{t}.fc1", f"{f}/fc1")
        lin(enc, f"{t}.fc2", f"{f}/fc2")
    ln(enc, "encoder.layer_norm", "layer_norm")

    dec: Dict[str, np.ndarray] = {}
    dec["tok_emb/embedding"] = S("decoder.embed_tokens.weight")
    dec["pos_emb"] = S("decoder.embed_positions.weight")
    cross: Dict[str, np.ndarray] = {}
    for i in range(cfg.decoder_layers):
        t = f"decoder.layers.{i}"
        f = f"layer_{i}"
        ln(dec, f"{t}.self_attn_layer_norm", f"{f}_self_ln")
        for name in ("q_proj", "v_proj", "out_proj"):
            lin(dec, f"{t}.self_attn.{name}", f"{f}_self_attn/{name}")
        lin(dec, f"{t}.self_attn.k_proj", f"{f}_self_attn/k_proj",
            bias=False)
        ln(dec, f"{t}.encoder_attn_layer_norm", f"{f}_cross_ln")
        lin(dec, f"{t}.encoder_attn.q_proj", f"{f}_cross_q")
        lin(dec, f"{t}.encoder_attn.out_proj", f"{f}_cross_out")
        lin(cross, f"{t}.encoder_attn.k_proj", f"{f}_cross_k", bias=False)
        lin(cross, f"{t}.encoder_attn.v_proj", f"{f}_cross_v")
        ln(dec, f"{t}.final_layer_norm", f"{f}_ffn_ln")
        lin(dec, f"{t}.fc1", f"{f}_fc1")
        lin(dec, f"{t}.fc2", f"{f}_fc2")
    ln(dec, "decoder.layer_norm", "layer_norm")
    return (unflatten_tree(enc), unflatten_tree(dec), unflatten_tree(cross))


# ---------------------------------------------------------------------------
# greedy decode (single jitted prefill + while_loop)
# ---------------------------------------------------------------------------


def make_transcriber(cfg: WhisperConfig, enc_params, dec_params,
                     cross_params, max_new: int = 224):
    import jax
    import jax.numpy as jnp

    encoder, decoder, crosskv = build_model(cfg)
    h = cfg.n_heads
    dk = cfg.d_model // h
    cache_len = cfg.max_target_positions

    @jax.jit
    def run(mel, forced_tokens, eos_id):
        """mel (1, n_mels, 3000); forced_tokens (n_forced,) int32."""
        enc_out = encoder.apply({"params": enc_params}, mel)
        cross_caches = crosskv.apply({"params": cross_params}, enc_out)

        b = mel.shape[0]
        empty = [{"k": jnp.zeros((b, cache_len, h, dk), jnp.float32),
                  "v": jnp.zeros((b, cache_len, h, dk), jnp.float32)}
                 for _ in range(cfg.decoder_layers)]
        n_forced = forced_tokens.shape[0]

        # prefill over the forced prompt (causal mask within the prompt)
        q_pos = jnp.arange(n_forced)[:, None]
        k_pos = jnp.arange(cache_len)[None, :]
        mask = jnp.where(k_pos <= q_pos, 0.0, -jnp.inf)[None, None]
        logits, caches = decoder.apply(
            {"params": dec_params}, forced_tokens[None], enc_out, 0,
            empty, cross_caches, mask)
        first = jnp.argmax(logits[0, -1]).astype(jnp.int32)

        tokens0 = jnp.full((max_new,), eos_id, jnp.int32)
        tokens0 = tokens0.at[0].set(first)

        def cond(carry):
            i, tokens, caches, last, done = carry
            return (i < max_new - 1) & ~done

        def body(carry):
            i, tokens, caches, last, done = carry
            pos = n_forced + i
            step_mask = jnp.where(k_pos[None] <= pos, 0.0, -jnp.inf)[None]
            logits, caches = decoder.apply(
                {"params": dec_params}, last[None, None], None, pos,
                caches, cross_caches, step_mask)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            done = nxt == eos_id
            tokens = tokens.at[i + 1].set(jnp.where(done, eos_id, nxt))
            return i + 1, tokens, caches, nxt, done

        i, tokens, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), tokens0, caches, first,
                         first == eos_id))
        return tokens, i

    return run


# ---------------------------------------------------------------------------
# runtime wrapper
# ---------------------------------------------------------------------------


class WhisperASR:
    """HF-checkpoint-backed transcriber; ``available`` is False without a
    model directory."""

    LANG_TOKENS = {"zh": "<|zh|>", "en": "<|en|>", "ja": "<|ja|>",
                   "ko": "<|ko|>", "yue": "<|yue|>"}

    def __init__(self, model_dir: Optional[str]):
        self.available = False
        if not model_dir or not os.path.isdir(model_dir):
            return
        try:
            self._load(model_dir)
            self.available = True
        except Exception as exc:
            logger.warning("whisper model not loaded from %s: %s",
                           model_dir, exc)

    def _load(self, model_dir: str):
        with open(os.path.join(model_dir, "config.json"),
                  encoding="utf8") as f:
            hf_cfg = json.load(f)
        self.cfg = WhisperConfig.from_hf(hf_cfg)
        state = None
        for fname in ("model.safetensors", "pytorch_model.bin"):
            path = os.path.join(model_dir, fname)
            if os.path.exists(path):
                if fname.endswith(".safetensors"):
                    from safetensors.numpy import load_file

                    state = load_file(path)
                else:
                    import torch

                    raw = torch.load(path, map_location="cpu",
                                     weights_only=False)
                    state = {k: v.detach().to(torch.float32).numpy()
                             for k, v in raw.items() if hasattr(v, "detach")}
                break
        if state is None:
            raise FileNotFoundError(f"no weights in {model_dir}")
        enc_p, dec_p, cross_p = convert_whisper_weights(state, self.cfg)
        self._run = make_transcriber(self.cfg, enc_p, dec_p, cross_p)

        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_dir)

    def _forced(self, language: Optional[str]) -> np.ndarray:
        sot = self.tokenizer.convert_tokens_to_ids("<|startoftranscript|>")
        ids = [sot]
        if language and language in self.LANG_TOKENS:
            lang_id = self.tokenizer.convert_tokens_to_ids(
                self.LANG_TOKENS[language])
            if lang_id is not None and lang_id >= 0:
                ids.append(lang_id)
        for tok in ("<|transcribe|>", "<|notimestamps|>"):
            tid = self.tokenizer.convert_tokens_to_ids(tok)
            if tid is not None and tid >= 0:
                ids.append(tid)
        return np.asarray(ids, np.int32)

    def transcribe(self, path: str, language: Optional[str] = "zh") -> str:
        from ..utils import audio_io

        wav, sr = audio_io.read_wav(path)
        if wav.ndim > 1:
            wav = wav.mean(axis=0)
        if sr != SAMPLE_RATE:
            wav = audio_io.resample(wav, sr, SAMPLE_RATE)
        eos = self.tokenizer.convert_tokens_to_ids("<|endoftext|>")
        forced = self._forced(language)
        texts: List[str] = []
        for start in range(0, max(len(wav), 1), CHUNK_SAMPLES):
            chunk = wav[start:start + CHUNK_SAMPLES]
            if not len(chunk):
                break
            padded = np.zeros(CHUNK_SAMPLES, np.float32)
            padded[:len(chunk)] = chunk
            mel = log_mel_spectrogram(padded, self.cfg.n_mels)[None]
            tokens, n = self._run(mel, forced, eos)
            tokens = np.asarray(tokens)[:int(n) + 1]
            tokens = tokens[tokens != eos]
            texts.append(self.tokenizer.decode(tokens,
                                               skip_special_tokens=True))
        return "".join(texts).strip()
