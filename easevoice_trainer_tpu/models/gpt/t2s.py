"""s1 GPT: autoregressive text -> semantic-token transformer.

Rebuild of Text2SemanticDecoder (reference:
src/easevoice/soundstorm/auto_reg/models/t2s_model.py:255-560): phoneme
embedding + projected BERT features + sine positions for the text segment,
token embedding + sine positions for the semantic segment, a 24-layer
post-norm transformer (d=512, 16 heads, ffn 2048, ReLU) over the concatenated
``[x; y]`` sequence with the GPT-SoVITS hybrid mask (text attends within
text; audio attends causally over text+audio), and a bias-free projection to
the 1025-token vocabulary (EOS = 1024).

TPU-first details:

* one fused QKV matmul per layer; the attention mask is computed once from
  the (static) padded lengths, no boolean indexing;
* the same layer code serves training (full-sequence) and incremental
  decoding (KV cache slices), so there is a single source of truth for
  numerics;
* loss masking replaces the reference's "shift + ignore-index" CE with an
  explicit valid-token mask (identical sums).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class T2SConfig:
    """Mirrors configs/gpt.yaml "model"."""

    vocab_size: int = 1025
    phoneme_vocab_size: int = 732
    embedding_dim: int = 512
    hidden_dim: int = 512
    n_heads: int = 16
    n_layers: int = 24
    ffn_dim: int = 2048
    dropout: float = 0.0
    eos_id: int = 1024
    max_position: int = 4000

    @classmethod
    def from_yaml_dict(cls, d: dict) -> "T2SConfig":
        m = d.get("model", d)
        return cls(
            vocab_size=m.get("vocab_size", 1025),
            phoneme_vocab_size=m.get("phoneme_vocab_size", 732),
            embedding_dim=m.get("embedding_dim", 512),
            hidden_dim=m.get("hidden_dim", 512),
            n_heads=m.get("head", m.get("n_heads", 16)),
            n_layers=m.get("n_layer", m.get("n_layers", 24)),
            ffn_dim=m.get("linear_units", m.get("ffn_dim", 2048)),
            dropout=m.get("dropout", 0.0),
            eos_id=m.get("EOS", m.get("eos_id", 1024)),
        )


def sine_positions(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(length, dim) sinusoidal table (sin on even, cos on odd channels)."""
    pos = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(np.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe, dtype)


class SinePositionalEmbedding(nn.Module):
    """x + alpha * PE[pos : pos + T]; alpha is a learned scalar."""

    dim: int
    max_len: int = 4000

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset: int | jnp.ndarray = 0) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
        pe = sine_positions(self.max_len, self.dim, x.dtype)
        t = x.shape[1]
        if isinstance(offset, (int, np.integer)) and offset == 0:
            sl = pe[:t]
        else:
            sl = jax.lax.dynamic_slice_in_dim(pe, offset, t, axis=0)
        return x + alpha.astype(x.dtype) * sl[None]


class TransformerLayer(nn.Module):
    """Post-norm encoder layer usable for both full and incremental passes."""

    d_model: int
    n_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d = self.d_model
        self.qkv = nn.DenseGeneral(3 * d, use_bias=True, dtype=self.dtype,
                                   param_dtype=jnp.float32, name="qkv")
        self.out = nn.DenseGeneral(d, use_bias=True, dtype=self.dtype,
                                   param_dtype=jnp.float32, name="out")
        self.linear1 = nn.Dense(self.ffn_dim, dtype=self.dtype,
                                param_dtype=jnp.float32)
        self.linear2 = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32)
        self.norm1 = nn.LayerNorm(param_dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(param_dtype=jnp.float32)
        self.drop = nn.Dropout(self.dropout)

    def _split(self, z):
        b, t, _ = z.shape
        return z.reshape(b, t, self.n_heads, self.d_model // self.n_heads)

    def attention(self, x, mask_bias, deterministic=True):
        """Full self-attention. mask_bias: (B|1, 1, T, T) additive fp32."""
        q, k, v = jnp.split(self.qkv(x), 3, axis=-1)
        q, k, v = self._split(q), self._split(k), self._split(v)
        dk = q.shape[-1]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
                                jnp.float32(dk))
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        probs = self.drop(probs, deterministic=deterministic)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return self.out(o.reshape(x.shape)), (k, v)

    def attention_step(self, x, k_cache, v_cache, pos, kv_len_mask):
        """One-token incremental attention.

        x: (B, 1, D); caches: (B, Tmax, H, dk); ``pos`` scalar index of this
        token; kv_len_mask: (B, 1, 1, Tmax) additive bias hiding unused slots.
        Returns (out, new_k_cache, new_v_cache).
        """
        q, k, v = jnp.split(self.qkv(x), 3, axis=-1)
        q, k, v = self._split(q), self._split(k), self._split(v)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k.astype(k_cache.dtype), pos, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v.astype(v_cache.dtype), pos, axis=1)
        dk = q.shape[-1]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache.astype(q.dtype),
                            preferred_element_type=jnp.float32) / jnp.sqrt(
                                jnp.float32(dk))
        scores = scores + kv_len_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v_cache.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return self.out(o.reshape(x.shape)), k_cache, v_cache

    def ffn(self, x, deterministic=True):
        return self.linear2(self.drop(jax.nn.relu(self.linear1(x)),
                                      deterministic=deterministic))

    def __call__(self, x, mask_bias, deterministic=True):
        y, kv = self.attention(x, mask_bias, deterministic)
        x = self.norm1(x + self.drop(y, deterministic=deterministic))
        y = self.ffn(x, deterministic)
        x = self.norm2(x + self.drop(y, deterministic=deterministic))
        return x, kv

    def step(self, x, k_cache, v_cache, pos, kv_len_mask):
        y, k_cache, v_cache = self.attention_step(x, k_cache, v_cache, pos,
                                                  kv_len_mask)
        x = self.norm1(x + y)
        x = self.norm2(x + self.ffn(x))
        return x, k_cache, v_cache


def build_hybrid_mask_bias(x_len: int, y_len: int,
                           x_lens: jnp.ndarray, y_lens: jnp.ndarray,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Additive attention bias for the concatenated [x; y] sequence.

    Structure (reference: t2s_model.py:362-391): text rows attend to all text
    and no audio; audio rows attend to all text and causally to audio.
    Padding keys (beyond each row's x/y length) are masked everywhere.
    Returns (B, 1, T, T) with 0 for visible and -inf for hidden.
    """
    t = x_len + y_len
    pos = jnp.arange(t)
    is_y_col = pos >= x_len
    is_y_row = pos >= x_len
    # causal within y, x-rows can't see y at all
    causal = pos[None, :] <= pos[:, None]
    struct_ok = jnp.where(
        is_y_col[None, :],
        jnp.where(is_y_row[:, None], causal, False),
        True,
    )  # (T, T)
    # per-batch padding of keys
    x_valid = pos[None, :] < x_lens[:, None]
    y_valid = (pos[None, :] >= x_len) & (pos[None, :] < x_len + y_lens[:, None])
    key_ok = jnp.where(is_y_col[None, :], y_valid, x_valid)  # (B, T)
    ok = struct_ok[None] & key_ok[:, None, :]
    return jnp.where(ok, 0.0, -jnp.inf).astype(dtype)[:, None]


class Text2SemanticDecoder(nn.Module):
    cfg: T2SConfig = T2SConfig()
    dtype: Optional[jnp.dtype] = None
    # rematerialize each layer in the backward pass, saving only the
    # no-batch-dim dot outputs (qkv/out/ffn projections).  Raced on the
    # real v5e at the production gpt.yaml geometry (8×256): remat 32.30 ms
    # vs no-remat 28.99 ms with IDENTICAL cost-model bytes (40.5 GB) — at
    # this sequence length the (B,H,T,T) attention intermediates are too
    # small for the recompute to pay, so remat is off by default per the
    # "must win or revert" rule (docs/PERF.md round-5 A/B).  Flip on for
    # long-sequence / memory-constrained fine-tunes only.
    remat: bool = False

    def setup(self):
        c = self.cfg
        self.bert_proj = nn.Dense(c.embedding_dim, dtype=self.dtype,
                                  param_dtype=jnp.float32, name="bert_proj")
        self.ar_text_embedding = nn.Embed(c.phoneme_vocab_size, c.embedding_dim,
                                          param_dtype=jnp.float32)
        self.ar_audio_embedding = nn.Embed(c.vocab_size, c.embedding_dim,
                                           param_dtype=jnp.float32)
        self.ar_text_position = SinePositionalEmbedding(
            c.embedding_dim, c.max_position, name="ar_text_position")
        self.ar_audio_position = SinePositionalEmbedding(
            c.embedding_dim, c.max_position, name="ar_audio_position")
        layer_cls = TransformerLayer
        if self.remat:
            layer_cls = nn.remat(
                TransformerLayer,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                static_argnums=(3,))       # `deterministic` flag
        self.layers = [
            layer_cls(c.hidden_dim, c.n_heads, c.ffn_dim, c.dropout,
                      dtype=self.dtype, name=f"layer_{i}")
            for i in range(c.n_layers)
        ]
        self.ar_predict_layer = nn.Dense(c.vocab_size, use_bias=False,
                                         dtype=self.dtype,
                                         param_dtype=jnp.float32)

    # ---- embeddings ------------------------------------------------------

    def embed_text(self, x, bert_feature):
        """x: (B, Tx) phoneme ids; bert_feature: (B, Tx, 1024)."""
        h = self.ar_text_embedding(x).astype(bert_feature.dtype)
        h = h + self.bert_proj(bert_feature)
        return self.ar_text_position(h)

    def embed_audio(self, y, offset: int | jnp.ndarray = 0):
        h = self.ar_audio_embedding(y)
        return self.ar_audio_position(h, offset=offset)

    # ---- training --------------------------------------------------------

    def __call__(self, x, x_lens, y, y_lens, bert_feature, *,
                 deterministic: bool = True):
        """Training forward with CE loss + top-k accuracy.

        x: (B, Tx) phonemes; y: (B, Ty) semantic tokens (0-padded);
        bert: (B, Tx, 1024).  Returns dict(loss, acc, logits).
        """
        c = self.cfg
        b, x_len = x.shape
        y_len = y.shape[1]
        pos = jnp.arange(y_len)
        y_valid = pos[None, :] < y_lens[:, None]
        codes = jnp.where(y_valid, y, 0)

        # reference pad_y_eos (t2s_model.py:557-561): inputs are the codes
        # with EOS in every pad slot; targets are the shifted codes with EOS
        # from position len-1 on.  CE sums over ALL B x Ty positions (the pad
        # rows see only the valid prefix thanks to the key-padding mask, so
        # they learn to emit EOS).
        y_in = jnp.where(y_valid, codes, c.eos_id).astype(jnp.int32)
        shifted = jnp.concatenate(
            [codes[:, 1:], jnp.zeros((b, 1), codes.dtype)], axis=1)
        targets = jnp.where(pos[None, :] + 1 < y_lens[:, None], shifted,
                            c.eos_id).astype(jnp.int32)

        xh = self.embed_text(x, bert_feature)
        yh = self.embed_audio(y_in)
        h = jnp.concatenate([xh, yh], axis=1)

        bias = build_hybrid_mask_bias(x_len, y_len, x_lens, y_lens)
        for layer in self.layers:
            # positional `deterministic`: it is a static argnum under remat
            h, _ = layer(h, bias, deterministic)

        logits = self.ar_predict_layer(h[:, x_len:])   # (B, Ty, V)
        logits32 = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits32, axis=-1)
        tgt_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        loss = -tgt_logp.sum()

        # top-k accuracy over non-EOS targets (reference ignore_index=EOS)
        k = 3
        topk = jax.lax.top_k(logits32, k)[1]
        hit = (topk == targets[..., None]).any(axis=-1)
        acc_mask = (targets != c.eos_id).astype(jnp.float32)
        acc = (hit * acc_mask).sum() / jnp.maximum(acc_mask.sum(), 1.0)
        return {"loss": loss, "acc": acc, "logits": logits,
                "targets": targets, "num_targets": acc_mask.sum()}

    # ---- inference: prefill ----------------------------------------------

    def prefill(self, x, x_lens, prompts, bert_feature, cache_len: int):
        """Run the prompt (text + audio prompt) and build the KV cache.

        Returns (first_logits (B, V), k_caches, v_caches (L, B, cache_len, H, dk)).
        Cache slots [0, x_len + prompt_len) are filled; the caller continues
        writing at position x_len + prompt_len.
        """
        c = self.cfg
        b, x_len = x.shape
        y_len = prompts.shape[1]
        t = x_len + y_len

        xh = self.embed_text(x, bert_feature)
        yh = self.embed_audio(prompts)
        h = jnp.concatenate([xh, yh], axis=1)

        y_lens = jnp.full((b,), y_len, jnp.int32)
        bias = build_hybrid_mask_bias(x_len, y_len, x_lens, y_lens)

        k_caches, v_caches = [], []
        for layer in self.layers:
            h, (k, v) = layer(h, bias, True)
            pad = cache_len - t
            k_caches.append(jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))))
            v_caches.append(jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))))

        logits = self.ar_predict_layer(h[:, -1])
        return logits, jnp.stack(k_caches), jnp.stack(v_caches)

    # ---- inference: one decode step ---------------------------------------

    def decode_step(self, token, step_idx, pos, k_caches, v_caches, kv_bias):
        """token: (B,) last sampled token; step_idx: scalar #tokens generated
        so far (positional index of this token in the y stream); pos: scalar
        write position in the cache; kv_bias: (B, 1, 1, cache_len).

        k_caches/v_caches are the full stacked (L, B, T, H, dk) buffers; the
        new token's K/V is written with one tiny dynamic_update_slice per
        layer so XLA keeps the carry in place inside the decode while_loop
        (a jnp.stack rebuild here costs a full cache copy per step).

        Returns (logits (B, V), k_caches, v_caches).
        """
        c = self.cfg
        h = self.embed_audio(token[:, None], offset=step_idx)
        b = token.shape[0]
        n_heads = c.n_heads
        dk = c.hidden_dim // n_heads
        zero = jnp.int32(0)
        for i, layer in enumerate(self.layers):
            q, k, v = jnp.split(layer.qkv(h), 3, axis=-1)
            shape = (1, b, 1, n_heads, dk)
            k_caches = jax.lax.dynamic_update_slice(
                k_caches, k.reshape(shape).astype(k_caches.dtype),
                (jnp.int32(i), zero, pos, zero, zero))
            v_caches = jax.lax.dynamic_update_slice(
                v_caches, v.reshape(shape).astype(v_caches.dtype),
                (jnp.int32(i), zero, pos, zero, zero))
            q = q.reshape(b, 1, n_heads, dk)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k_caches[i].astype(q.dtype),
                preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(dk))
            scores = scores + kv_bias
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs,
                           v_caches[i].astype(h.dtype),
                           preferred_element_type=jnp.float32).astype(h.dtype)
            y = layer.out(o.reshape(b, 1, c.hidden_dim))
            h = layer.norm1(h + y)
            h = layer.norm2(h + layer.ffn(h))
        logits = self.ar_predict_layer(h[:, 0])
        return logits, k_caches, v_caches
