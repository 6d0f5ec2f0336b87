"""BERT encoder (chinese-roberta-wwm-ext-large) in JAX.

The reference extracts phone-level prosody features from the −3rd hidden
layer of an HF BERT (reference: src/normalization/normalize.py:88-124,
src/easevoice/inference/preprocessor.py:180-193): tokenize, run with
hidden states, take ``hidden_states[-3]``, drop [CLS]/[SEP], repeat each
token's vector ``word2ph`` times -> (1024, n_phones).

This is a minimal from-scratch BERT tower (standard post-norm) returning all
hidden states, plus an HF torch state-dict converter.  Tokenization uses the
HF tokenizer (pure Python, no torch).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 21128
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, pad_bias=None):
        c = self.cfg
        d = c.hidden_size
        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        b, t, _ = x.shape
        h, dk = c.num_heads, d // c.num_heads
        reshape = lambda z: z.reshape(b, t, h, dk)
        q, k, v = dense(d, "q")(x), dense(d, "k")(x), dense(d, "v")(x)
        scores = jnp.einsum("bqhd,bkhd->bhqk", reshape(q) / np.sqrt(dk),
                            reshape(k), preferred_element_type=jnp.float32)
        if pad_bias is not None:
            scores = scores + pad_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, reshape(v),
                          preferred_element_type=jnp.float32).astype(x.dtype)
        attn = dense(d, "attn_out")(attn.reshape(b, t, d))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, param_dtype=jnp.float32,
                         name="attn_norm")(x + attn)
        y = dense(c.intermediate_size, "ff1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = dense(d, "ff2")(y)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, param_dtype=jnp.float32,
                            name="ff_norm")(x + y)


class BertModel(nn.Module):
    cfg: BertConfig = BertConfig()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        """Returns the list of hidden states (embeddings + every layer)."""
        c = self.cfg
        b, t = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb = (nn.Embed(c.vocab_size, c.hidden_size, param_dtype=jnp.float32,
                        name="word_emb")(input_ids)
               + nn.Embed(c.max_position, c.hidden_size,
                          param_dtype=jnp.float32,
                          name="pos_emb")(jnp.arange(t)[None, :])
               + nn.Embed(c.type_vocab_size, c.hidden_size,
                          param_dtype=jnp.float32,
                          name="type_emb")(token_type_ids))
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, param_dtype=jnp.float32,
                         name="emb_norm")(emb)
        pad_bias = None
        if attention_mask is not None:
            pad_bias = jnp.where(attention_mask[:, None, None, :] > 0,
                                 0.0, -jnp.inf)
        hidden_states = [h]
        for i in range(c.num_layers):
            h = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(h, pad_bias)
            hidden_states.append(h)
        return hidden_states


def convert_hf_bert(state: dict) -> dict:
    """HF BertModel state dict (numpy values) -> BertModel params tree."""
    from ..train.ckpt import unflatten_tree

    def S(k):
        for prefix in ("bert.", ""):
            if prefix + k in state:
                return np.asarray(state[prefix + k], np.float32)
        raise KeyError(k)

    p = {
        "word_emb/embedding": S("embeddings.word_embeddings.weight"),
        "pos_emb/embedding": S("embeddings.position_embeddings.weight"),
        "type_emb/embedding": S("embeddings.token_type_embeddings.weight"),
        "emb_norm/scale": S("embeddings.LayerNorm.weight"),
        "emb_norm/bias": S("embeddings.LayerNorm.bias"),
    }
    n_layers = 0
    while any(k.startswith(f"encoder.layer.{n_layers}.")
              or k.startswith(f"bert.encoder.layer.{n_layers}.")
              for k in state):
        n_layers += 1
    for i in range(n_layers):
        t = f"encoder.layer.{i}"
        f = f"layer_{i}"
        pairs = (
            (f"{t}.attention.self.query", f"{f}/q"),
            (f"{t}.attention.self.key", f"{f}/k"),
            (f"{t}.attention.self.value", f"{f}/v"),
            (f"{t}.attention.output.dense", f"{f}/attn_out"),
            (f"{t}.intermediate.dense", f"{f}/ff1"),
            (f"{t}.output.dense", f"{f}/ff2"),
        )
        for tk, fk in pairs:
            p[f"{fk}/kernel"] = S(tk + ".weight").T
            p[f"{fk}/bias"] = S(tk + ".bias")
        p[f"{f}/attn_norm/scale"] = S(f"{t}.attention.output.LayerNorm.weight")
        p[f"{f}/attn_norm/bias"] = S(f"{t}.attention.output.LayerNorm.bias")
        p[f"{f}/ff_norm/scale"] = S(f"{t}.output.LayerNorm.weight")
        p[f"{f}/ff_norm/bias"] = S(f"{t}.output.LayerNorm.bias")
    return unflatten_tree(p)


def config_from_hf(model_dir: str) -> BertConfig:
    """Build a BertConfig from an HF config.json when present."""
    import json
    import os

    path = os.path.join(model_dir, "config.json") if model_dir else ""
    if not path or not os.path.exists(path):
        return BertConfig()
    with open(path, encoding="utf8") as f:
        c = json.load(f)
    return BertConfig(
        vocab_size=c.get("vocab_size", 21128),
        hidden_size=c.get("hidden_size", 1024),
        num_layers=c.get("num_hidden_layers", 24),
        num_heads=c.get("num_attention_heads", 16),
        intermediate_size=c.get("intermediate_size", 4096),
        max_position=c.get("max_position_embeddings", 512),
        type_vocab_size=c.get("type_vocab_size", 2),
        layer_norm_eps=c.get("layer_norm_eps", 1e-12),
    )


class BertFeatureExtractor:
    """Tokenizer + model + phone-level feature repeat, host API.

    Degrades to zero features when weights/tokenizer are unavailable (the
    reference emits zero BERT features for non-Chinese text anyway:
    preprocessor.py:135-138).
    """

    def __init__(self, model_dir: str, cfg: Optional[BertConfig] = None):
        self.cfg = cfg or config_from_hf(model_dir)
        self.model = BertModel(self.cfg)
        self.params = None
        self.tokenizer = None
        self._apply = None
        import os

        if os.path.isdir(model_dir):
            try:
                from transformers import AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(model_dir)
            except Exception:
                self.tokenizer = None
            for fname in ("pytorch_model.bin", "model.safetensors"):
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
                                 for k, v in raw.items()
                                 if hasattr(v, "detach")}
                    self.params = {"params": convert_hf_bert(state)}
                    break

    @property
    def available(self) -> bool:
        return self.params is not None and self.tokenizer is not None

    def phone_features(self, text: str, word2ph: List[int]) -> np.ndarray:
        """(1024, n_phones) phone-level features (normalize.py:88-124)."""
        n_phones = sum(word2ph)
        if not self.available:
            return np.zeros((self.cfg.hidden_size, n_phones), np.float32)
        enc = self.tokenizer(text, return_tensors="np")
        ids = enc["input_ids"]
        mask = enc.get("attention_mask")
        if self._apply is None:
            self._apply = jax.jit(self.model.apply)
        hs = self._apply(self.params, ids, mask)
        res = np.asarray(hs[-3])[0][1:-1]   # −3rd layer, drop CLS/SEP
        assert len(word2ph) == res.shape[0], (len(word2ph), res.shape)
        phone_level = np.concatenate(
            [np.repeat(res[i][None, :], w, axis=0)
             for i, w in enumerate(word2ph)], axis=0)
        return phone_level.T.astype(np.float32)
