"""HuBERT-base SSL encoder (chinese-hubert-base) in JAX.

The reference wraps HF ``HubertModel``
(reference: src/easevoice/feature_extractor/cnhubert.py:14-32) to turn
16 kHz waveforms into 768-d features at 50 Hz.  transformers ships no Flax
HuBERT, so this is a from-scratch implementation of the architecture
(wav2vec2-style conv feature extractor + post-norm transformer), with a
converter from the HF torch state dict.

Input convention: raw waveform (B, samples) already normalized like the HF
Wav2Vec2FeatureExtractor does (zero-mean unit-variance per utterance).
Output: (B, frames, 768), frames = samples // 320.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5


class FeatureExtractor(nn.Module):
    """Strided conv stack; group-norm + GELU on layer 0, GELU after."""

    cfg: HubertConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, lengths=None):
        # x: (B, samples) -> (B, frames, conv_dim[-1])
        h = x[..., None]
        for i, (dim, k, s) in enumerate(zip(self.cfg.conv_dim,
                                            self.cfg.conv_kernel,
                                            self.cfg.conv_stride)):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_{i}")(h)
            if i == 0:
                # hubert-base group-norms each channel over the TIME axis —
                # stats are length-dependent, so padded inference must
                # restrict them to the valid frames or every output frame
                # shifts (the HF "group-norm models don't support
                # attention_mask" wart).  Same params as nn.GroupNorm.
                valid = None
                if lengths is not None:
                    t1 = (lengths - k) // s + 1
                    valid = (jnp.arange(h.shape[1])[None, :]
                             < t1[:, None]).astype(jnp.float32)
                h = _TimePerChannelNorm(
                    epsilon=self.cfg.layer_norm_eps,
                    name="group_norm")(h, valid)
            h = jax.nn.gelu(h, approximate=False)
        return h


class _TimePerChannelNorm(nn.Module):
    """GroupNorm(num_groups=C) on (B, T, C) — per-channel stats over time —
    with an optional validity mask so padded frames don't move the stats.
    Parameter layout matches flax ``nn.GroupNorm`` (scale/bias of (C,))."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, h, valid=None):
        c = h.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        h32 = h.astype(jnp.float32)
        if valid is None:
            mean = jnp.mean(h32, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(h32 - mean), axis=1, keepdims=True)
        else:
            v = valid[..., None]
            cnt = jnp.maximum(jnp.sum(v, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(h32 * v, axis=1, keepdims=True) / cnt
            var = jnp.sum(jnp.square(h32 - mean) * v, axis=1,
                          keepdims=True) / cnt
        out = (h32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (out * scale + bias).astype(h.dtype)


class PositionalConvEmbedding(nn.Module):
    cfg: HubertConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.cfg.pos_conv_kernel
        from ..nn.layers import WNConv1d

        pad = k // 2
        h = WNConv1d(self.cfg.hidden_size, self.cfg.hidden_size, k,
                     padding=pad, groups=self.cfg.pos_conv_groups,
                     dtype=self.dtype, name="conv")(x)
        if k % 2 == 0:
            h = h[:, :-1]
        return jax.nn.gelu(h, approximate=False)


class HubertLayer(nn.Module):
    cfg: HubertConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, pad_bias=None):
        c = self.cfg
        d = c.hidden_size
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense(d, "q")(x)
        k = dense(d, "k")(x)
        v = dense(d, "v")(x)
        b, t, _ = x.shape
        h, dk = c.num_heads, d // c.num_heads
        reshape = lambda z: z.reshape(b, t, h, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", reshape(q) / np.sqrt(dk),
                            reshape(k), preferred_element_type=jnp.float32)
        if pad_bias is not None:
            scores = scores + pad_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, reshape(v),
                          preferred_element_type=jnp.float32).astype(x.dtype)
        attn = dense(d, "out")(attn.reshape(b, t, d))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, param_dtype=jnp.float32,
                         name="norm1")(x + attn)
        y = dense(c.intermediate_size, "ff1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = dense(d, "ff2")(y)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, param_dtype=jnp.float32,
                            name="norm2")(x + y)


def feat_output_lengths(lengths, cfg: "HubertConfig" = None):
    """Exact frame count out of the conv frontend for given sample counts —
    HF `_get_feat_extract_output_lengths` semantics: successive
    floor((L - kernel)/stride) + 1.  (A flat ``//320`` over-counts by one
    near bucket boundaries, which would let a garbage pad frame into the
    attention mask.)"""
    cfg = cfg or HubertConfig()
    out = lengths
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        out = (out - k) // s + 1
    return out


class CNHubert(nn.Module):
    cfg: HubertConfig = HubertConfig()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, wav, lengths: Optional[jnp.ndarray] = None):
        """wav: (B, samples) normalized 16 kHz -> (B, frames, 768)."""
        c = self.cfg
        feats = FeatureExtractor(c, dtype=self.dtype,
                                 name="feature_extractor")(wav, lengths)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, param_dtype=jnp.float32,
                         name="fp_norm")(feats)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fp_proj")(h)
        pad_bias = None
        if lengths is not None:
            frame_lens = feat_output_lengths(lengths, c)
            valid = (jnp.arange(h.shape[1])[None, :]
                     < frame_lens[:, None])
            pad_bias = jnp.where(valid, 0.0, -jnp.inf)[:, None, None, :]
            h = h * valid[..., None].astype(h.dtype)
        h = h + PositionalConvEmbedding(c, dtype=self.dtype, name="pos_conv")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, param_dtype=jnp.float32,
                         name="encoder_norm")(h)
        for i in range(c.num_layers):
            h = HubertLayer(c, dtype=self.dtype, name=f"layer_{i}")(h, pad_bias)
        return h


def normalize_waveform(wav: np.ndarray) -> np.ndarray:
    """HF Wav2Vec2FeatureExtractor(do_normalize=True) semantics."""
    mean = wav.mean(axis=-1, keepdims=True)
    var = wav.var(axis=-1, keepdims=True)
    return ((wav - mean) / np.sqrt(var + 1e-7)).astype(np.float32)


# ---------------------------------------------------------------------------
# HF torch -> flax converter
# ---------------------------------------------------------------------------


def convert_hf_hubert(state: dict) -> dict:
    """HF HubertModel state dict (numpy values) -> CNHubert params tree."""
    from ..train.ckpt import unflatten_tree

    p = {}

    def put(k, v):
        p[k] = np.asarray(v, np.float32)

    for i in range(7):
        put(f"feature_extractor/conv_{i}/kernel",
            state[f"feature_extractor.conv_layers.{i}.conv.weight"]
            .transpose(2, 1, 0))
    put("feature_extractor/group_norm/scale",
        state["feature_extractor.conv_layers.0.layer_norm.weight"])
    put("feature_extractor/group_norm/bias",
        state["feature_extractor.conv_layers.0.layer_norm.bias"])
    put("fp_norm/scale", state["feature_projection.layer_norm.weight"])
    put("fp_norm/bias", state["feature_projection.layer_norm.bias"])
    put("fp_proj/kernel", state["feature_projection.projection.weight"].T)
    put("fp_proj/bias", state["feature_projection.projection.bias"])

    # pos conv: torch weight-norm (out, in/groups, k); dim=2 in HF -> the
    # norm is over (out,in) per k; our WNConv1d norms per out channel.
    # Reconstruct the dense kernel and renormalize into our (g, v) split.
    for gk, vk in (("encoder.pos_conv_embed.conv.weight_g",
                    "encoder.pos_conv_embed.conv.weight_v"),
                   ("encoder.pos_conv_embed.conv.parametrizations.weight.original0",
                    "encoder.pos_conv_embed.conv.parametrizations.weight.original1")):
        if gk in state:
            g = state[gk]
            v = state[vk]
            norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
            w = g * v / np.maximum(norm, 1e-12)   # (out, in/g, k)
            kernel = w.transpose(2, 1, 0)          # (k, in/g, out)
            out_norm = np.linalg.norm(
                kernel.reshape(-1, kernel.shape[-1]), axis=0)
            put("pos_conv/conv/wn/v", kernel)
            put("pos_conv/conv/wn/g", out_norm)
            put("pos_conv/conv/bias",
                state["encoder.pos_conv_embed.conv.bias"])
            break
    put("encoder_norm/scale", state["encoder.layer_norm.weight"])
    put("encoder_norm/bias", state["encoder.layer_norm.bias"])

    n_layers = max(int(k.split(".")[2]) for k in state
                   if k.startswith("encoder.layers.")) + 1
    for i in range(n_layers):
        t = f"encoder.layers.{i}"
        f = f"layer_{i}"
        for tn, fn_ in (("attention.q_proj", "q"), ("attention.k_proj", "k"),
                        ("attention.v_proj", "v"),
                        ("attention.out_proj", "out"),
                        ("feed_forward.intermediate_dense", "ff1"),
                        ("feed_forward.output_dense", "ff2")):
            put(f"{f}/{fn_}/kernel", state[f"{t}.{tn}.weight"].T)
            put(f"{f}/{fn_}/bias", state[f"{t}.{tn}.bias"])
        put(f"{f}/norm1/scale", state[f"{t}.layer_norm.weight"])
        put(f"{f}/norm1/bias", state[f"{t}.layer_norm.bias"])
        put(f"{f}/norm2/scale", state[f"{t}.final_layer_norm.weight"])
        put(f"{f}/norm2/bias", state[f"{t}.final_layer_norm.bias"])
    return unflatten_tree(p)


def config_from_hf(model_dir: str) -> HubertConfig:
    """Build a HubertConfig from an HF config.json when present."""
    import json
    import os

    path = os.path.join(model_dir, "config.json")
    if not os.path.exists(path):
        return HubertConfig()
    with open(path, encoding="utf8") as f:
        c = json.load(f)
    return HubertConfig(
        conv_dim=tuple(c.get("conv_dim", (512,) * 7)),
        conv_kernel=tuple(c.get("conv_kernel", (10, 3, 3, 3, 3, 2, 2))),
        conv_stride=tuple(c.get("conv_stride", (5, 2, 2, 2, 2, 2, 2))),
        hidden_size=c.get("hidden_size", 768),
        num_layers=c.get("num_hidden_layers", 12),
        num_heads=c.get("num_attention_heads", 12),
        intermediate_size=c.get("intermediate_size", 3072),
        pos_conv_kernel=c.get("num_conv_pos_embeddings", 128),
        pos_conv_groups=c.get("num_conv_pos_embedding_groups", 16),
        layer_norm_eps=c.get("layer_norm_eps", 1e-5),
    )


def load_cnhubert(model_dir: str):
    """Load chinese-hubert-base weights from an HF checkpoint directory.

    Returns (model, params) or (model, None) when weights are absent.
    """
    import os

    model = CNHubert(config_from_hf(model_dir))
    for fname in ("pytorch_model.bin", "model.safetensors"):
        path = os.path.join(model_dir, fname)
        if not os.path.exists(path):
            continue
        if fname.endswith(".safetensors"):
            from safetensors.numpy import load_file

            state = load_file(path)
        else:
            import torch

            raw = torch.load(path, map_location="cpu", weights_only=False)
            state = {k: v.detach().to(torch.float32).numpy()
                     for k, v in raw.items() if hasattr(v, "detach")}
        return model, {"params": convert_hf_hubert(state)}
    return model, None
