"""CT-Transformer punctuation restoration in JAX (FunASR ``ct-punc``).

The reference's zh ASR pipeline restores punctuation with FunASR's
CT-Transformer after Paraformer decoding (reference:
src/audiokit/asr/asr.py:15-43 —
``iic/punc_ct-transformer_zh-cn-common-vocab272727-pytorch``).  This is a
from-scratch JAX rebuild:

* token embedding (272 k word/char vocab, 256-dim) into the same SAN-M
  encoder stack as the Paraformer port (self-attention with a depthwise
  FSMN value memory, pre-norm, sinusoidal positions) and a linear
  classifier emitting one punctuation id per token
  (``["<unk>", "_", "，", "。", "？", "、"]`` — "_" = none);
* FunASR's chunked inference: text is split into code-mix words (CJK
  chars singly, latin words whole), processed in 20-word mini-sentences,
  and the tail after the last sentence-final mark (。 / ？) is carried
  into the next chunk so sentence boundaries never straddle a chunk cut
  (cache capped at 200 words); a trailing non-final mark is promoted to
  。 at the end.

Weights load from the modelscope/funasr checkpoint directory
(``model.pt`` + ``config.yaml`` + ``tokens.json``); ``CTPunc`` degrades to
``available=False`` when absent, and the ASR chain then emits unpunctuated
text exactly as the bare Paraformer would.
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.logger import logger

_SENTENCE_END = ("。", "？", "?", "！", "!")
_CACHE_POP_TRIGGER_LIMIT = 200
_SPLIT_SIZE = 20


@dataclasses.dataclass(frozen=True)
class CTPuncConfig:
    vocab_size: int = 272727
    embed_unit: int = 256
    d_model: int = 256
    n_heads: int = 8
    ffn_dim: int = 1024
    num_blocks: int = 4
    fsmn_kernel: int = 11
    punc_list: Tuple[str, ...] = ("<unk>", "_", "，", "。", "？", "、")

    @classmethod
    def from_yaml(cls, cfg: dict) -> "CTPuncConfig":
        enc = cfg.get("encoder_conf", {})
        mdl = cfg.get("model_conf", {})
        return cls(
            vocab_size=cfg.get("vocab_size", mdl.get("vocab_size", 272727)),
            embed_unit=mdl.get("embed_unit", 256),
            d_model=enc.get("output_size", mdl.get("att_unit", 256)),
            n_heads=enc.get("attention_heads", 8),
            ffn_dim=enc.get("linear_units", 1024),
            num_blocks=enc.get("num_blocks", 4),
            fsmn_kernel=enc.get("kernel_size", 11),
            punc_list=tuple(mdl.get("punc_list",
                                    ["<unk>", "_", "，", "。", "？", "、"])),
        )


# ---------------------------------------------------------------------------
# JAX model (embedding + SANM encoder + linear head)
# ---------------------------------------------------------------------------

def _build_model(cfg: CTPuncConfig):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class FsmnBlock(nn.Module):
        d: int
        kernel: int

        @nn.compact
        def __call__(self, x, mask):
            x = x * mask
            pad = (self.kernel - 1) // 2
            mem = nn.Conv(self.d, (self.kernel,), padding=[(pad, pad)],
                          feature_group_count=self.d, use_bias=False,
                          name="conv")(x)
            return (x + mem) * mask

    class SANMAttention(nn.Module):
        cfg: CTPuncConfig
        in_size: int

        @nn.compact
        def __call__(self, x, mask):
            c = self.cfg
            qkv = nn.Dense(3 * c.d_model, name="linear_q_k_v")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            fsmn = FsmnBlock(c.d_model, c.fsmn_kernel, name="fsmn_block")(
                v, mask)
            b, t, _ = q.shape
            dk = c.d_model // c.n_heads
            def heads(z):
                return z.reshape(b, t, c.n_heads, dk).transpose(0, 2, 1, 3)
            qh, kh, vh = heads(q) / math.sqrt(dk), heads(k), heads(v)
            scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(mask[:, None, None, :, 0] > 0, scores, neg)
            att = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, c.d_model)
            return nn.Dense(c.d_model, name="linear_out")(out) + fsmn

    class FeedForward(nn.Module):
        d: int
        hidden: int

        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Dense(self.hidden, name="w_1")(x))
            return nn.Dense(self.d, name="w_2")(x)

    class EncoderLayer(nn.Module):
        cfg: CTPuncConfig
        in_size: int

        @nn.compact
        def __call__(self, x, mask):
            c = self.cfg
            residual = x
            x = nn.LayerNorm(name="norm1")(x)
            x = SANMAttention(c, self.in_size, name="self_attn")(x, mask)
            if self.in_size == c.d_model:
                x = residual + x
            residual = x
            x = nn.LayerNorm(name="norm2")(x)
            x = residual + FeedForward(c.d_model, c.ffn_dim,
                                       name="feed_forward")(x)
            return x

    class CTTransformer(nn.Module):
        cfg: CTPuncConfig

        @nn.compact
        def __call__(self, ids, mask):
            c = self.cfg
            x = nn.Embed(c.vocab_size, c.embed_unit, name="embed")(ids)
            t, d = x.shape[1], x.shape[2]
            pos = jnp.arange(1, t + 1, dtype=jnp.float32)[:, None]
            log_timescale = math.log(10000.0) / (d // 2 - 1)
            inv = jnp.exp(jnp.arange(d // 2, dtype=jnp.float32)
                          * -log_timescale)
            pe = jnp.concatenate([jnp.sin(pos * inv), jnp.cos(pos * inv)],
                                 axis=1)
            x = x * (c.d_model ** 0.5) + pe[None, :, :d]
            x = EncoderLayer(c, c.embed_unit, name="encoders0_0")(x, mask)
            for i in range(c.num_blocks - 1):
                x = EncoderLayer(c, c.d_model, name=f"encoders_{i}")(x, mask)
            x = nn.LayerNorm(name="after_norm")(x)
            return nn.Dense(len(c.punc_list), name="decoder")(x)

    return CTTransformer(cfg)


def convert_ct_punc_weights(state: Dict[str, "np.ndarray"],
                            cfg: CTPuncConfig) -> dict:
    """Map a funasr CTTransformer ``model.pt`` state dict onto the flax
    tree (funasr naming: ``embed.weight``, ``encoder.encoders0.0...``,
    ``encoder.encoders.{i}...``, ``decoder.{weight,bias}``)."""

    def t(key):
        arr = state[key]
        arr = arr.detach().cpu().numpy() if hasattr(arr, "detach") \
            else np.asarray(arr)
        return arr.astype(np.float32)

    def dense(prefix, bias=True):
        p = {"kernel": t(prefix + ".weight").T}
        if bias:
            p["bias"] = t(prefix + ".bias")
        return p

    def ln(prefix):
        return {"scale": t(prefix + ".weight"), "bias": t(prefix + ".bias")}

    def dwconv(prefix):
        return {"kernel": t(prefix + ".weight").transpose(2, 1, 0)}

    def enc_layer(prefix):
        return {
            "norm1": ln(prefix + ".norm1"),
            "norm2": ln(prefix + ".norm2"),
            "self_attn": {
                "linear_q_k_v": dense(prefix + ".self_attn.linear_q_k_v"),
                "linear_out": dense(prefix + ".self_attn.linear_out"),
                "fsmn_block": {"conv": dwconv(prefix + ".self_attn.fsmn_block")},
            },
            "feed_forward": {
                "w_1": dense(prefix + ".feed_forward.w_1"),
                "w_2": dense(prefix + ".feed_forward.w_2"),
            },
        }

    params = {
        "embed": {"embedding": t("embed.weight")},
        "decoder": dense("decoder"),
        "after_norm": ln("encoder.after_norm"),
        "encoders0_0": enc_layer("encoder.encoders0.0"),
    }
    for i in range(cfg.num_blocks - 1):
        params[f"encoders_{i}"] = enc_layer(f"encoder.encoders.{i}")
    return {"params": params}


def expected_key_manifest(cfg: CTPuncConfig) -> Dict[str, Tuple[int, ...]]:
    """torch key -> shape manifest for shape-level dry checks."""
    d, f, k = cfg.d_model, cfg.ffn_dim, cfg.fsmn_kernel
    man: Dict[str, Tuple[int, ...]] = {
        "embed.weight": (cfg.vocab_size, cfg.embed_unit),
        "decoder.weight": (len(cfg.punc_list), d),
        "decoder.bias": (len(cfg.punc_list),),
        "encoder.after_norm.weight": (d,),
        "encoder.after_norm.bias": (d,),
    }

    def enc_layer(prefix, in_size):
        man[prefix + ".norm1.weight"] = (in_size,)
        man[prefix + ".norm1.bias"] = (in_size,)
        man[prefix + ".norm2.weight"] = (d,)
        man[prefix + ".norm2.bias"] = (d,)
        man[prefix + ".self_attn.linear_q_k_v.weight"] = (3 * d, in_size)
        man[prefix + ".self_attn.linear_q_k_v.bias"] = (3 * d,)
        man[prefix + ".self_attn.linear_out.weight"] = (d, d)
        man[prefix + ".self_attn.linear_out.bias"] = (d,)
        man[prefix + ".self_attn.fsmn_block.weight"] = (d, 1, k)
        man[prefix + ".feed_forward.w_1.weight"] = (f, d)
        man[prefix + ".feed_forward.w_1.bias"] = (f,)
        man[prefix + ".feed_forward.w_2.weight"] = (d, f)
        man[prefix + ".feed_forward.w_2.bias"] = (d,)

    enc_layer("encoder.encoders0.0", cfg.embed_unit)
    for i in range(cfg.num_blocks - 1):
        enc_layer(f"encoder.encoders.{i}", d)
    return man


# ---------------------------------------------------------------------------
# Tokenization + chunked inference (host-side)
# ---------------------------------------------------------------------------

_CJK = re.compile(r"[一-鿿㐀-䶿]")


def code_mix_split_words(text: str) -> List[str]:
    """CJK chars become single tokens, contiguous latin/digit runs stay
    whole words (FunASR ``code_mix_split_words``)."""
    words: List[str] = []
    for piece in text.split():
        cur = ""
        for ch in piece:
            if _CJK.match(ch):
                if cur:
                    words.append(cur)
                    cur = ""
                words.append(ch)
            else:
                cur += ch
        if cur:
            words.append(cur)
    return words


def _join(words: List[str], puncs: List[str]) -> str:
    """Assemble words + per-word punctuation ("_" = none); latin words are
    space-separated unless a punctuation mark already separates them."""
    out: List[str] = []
    prev_plain_ascii = False
    for w, p in zip(words, puncs):
        is_ascii = w.isascii() and bool(w)
        if prev_plain_ascii and is_ascii:
            out.append(" ")
        out.append(w)
        if p not in ("_", "<unk>", ""):
            out.append(p)
            prev_plain_ascii = False
        else:
            prev_plain_ascii = is_ascii
    return "".join(out)


class CTPunc:
    """Filesystem-checkpoint CT-Transformer punctuation restorer.

    ``model_dir`` holds ``model.pt`` + ``config.yaml`` + ``tokens.json`` —
    the layout ``tools/fetch_pretrained.py`` produces from the modelscope
    repo ``iic/punc_ct-transformer_zh-cn-common-vocab272727-pytorch``.
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
            logger.error("ct-punc load failed\n%s", traceback.format_exc())

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
        self.cfg = CTPuncConfig.from_yaml(raw_cfg)

        vocab: Dict[str, int] = {}
        for name in ("tokens.json", "tokens.txt"):
            p = os.path.join(self.model_dir, name)
            if os.path.exists(p):
                if name.endswith(".json"):
                    with open(p, encoding="utf-8") as f:
                        tokens = json.load(f)
                else:
                    with open(p, encoding="utf-8") as f:
                        tokens = [line.split()[0] for line in f
                                  if line.strip()]
                vocab = {tok: i for i, tok in enumerate(tokens)}
                break
        if not vocab:
            raise FileNotFoundError("tokens.json/tokens.txt missing")
        self.vocab = vocab
        self.unk_id = vocab.get("<unk>", 0)

        state = torch.load(model_path, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        self.model = _build_model(self.cfg)
        self.params = jax.tree.map(
            jnp.asarray, convert_ct_punc_weights(state, self.cfg))
        self._forward = jax.jit(
            lambda params, ids, mask: self.model.apply(params, ids, mask))

    # -- prediction ---------------------------------------------------------

    def _predict_puncs(self, words: List[str]) -> List[str]:
        import jax.numpy as jnp

        t = len(words)
        t_pad = max(16, 1 << (t - 1).bit_length())
        ids = np.zeros((1, t_pad), np.int32)
        for i, w in enumerate(words):
            ids[0, i] = self.vocab.get(w, self.unk_id)
        mask = np.zeros((1, t_pad, 1), np.float32)
        mask[0, :t] = 1.0
        logits = np.asarray(self._forward(self.params, jnp.asarray(ids),
                                          jnp.asarray(mask)))[0, :t]
        # "<unk>" (id 0) is never a valid output mark
        logits[:, 0] = -np.inf
        return [self.cfg.punc_list[int(i)] for i in logits.argmax(axis=-1)]

    def restore(self, text: str) -> str:
        """Insert punctuation into unpunctuated ASR output."""
        words = code_mix_split_words(text)
        if not words:
            return text
        out = ""
        cache: List[str] = []
        chunks = [words[i:i + _SPLIT_SIZE]
                  for i in range(0, len(words), _SPLIT_SIZE)]
        for ci, chunk in enumerate(chunks):
            cur = cache + chunk
            puncs = self._predict_puncs(cur)
            last = ci == len(chunks) - 1
            if not last and len(cur) <= _CACHE_POP_TRIGGER_LIMIT:
                # carry the unfinished sentence tail into the next chunk
                end = -1
                for i, p in enumerate(puncs):
                    if p in _SENTENCE_END:
                        end = i
                if end >= 0:
                    cache = cur[end + 1:]
                    cur, puncs = cur[:end + 1], puncs[:end + 1]
                else:
                    cache = cur
                    cur, puncs = [], []
            else:
                cache = []
            out += _join(cur, puncs)
        if out:
            if out[-1] in ("，", "、", ","):
                out = out[:-1] + "。"
            elif out[-1] not in _SENTENCE_END:
                out += "。"
        return out
