"""G2PW polyphone classifier in JAX.

The reference disambiguates polyphonic hanzi with a BERT-based classifier
run through onnxruntime (reference: src/easevoice/text/g2pw/onnx_api.py:79-215,
dataset.py:30-123).  This module re-implements it TPU-natively:

* ``G2PWModel`` — the repo's flax BERT encoder + query-position gather +
  conditional weighted softmax head (g2pW default config:
  ``use_conditional=True`` with ``affect_location='softmax'``, ``bias`` and
  ``char-linear`` terms; reference g2pw/utils.py:94-116).  Inputs mirror the
  ONNX graph exactly: input_ids / token_type_ids / attention_mask /
  phoneme_mask / char_ids / position_ids -> per-label probabilities.
* ``convert_g2pw_weights`` — maps a torch/ONNX state (HF BERT names +
  classifier/descriptor tensors) onto the flax tree.  ONNX files are read
  with the dependency-free protobuf parser from audiokit.mdxnet.
* ``G2PWPredictor`` — the runtime: loads the G2PWModel directory
  (POLYPHONIC_CHARS.txt, MONOPHONIC_CHARS.txt, bopomofo dicts, weights),
  prepares batches like dataset.prepare_onnx_input, and exposes
  ``lazy_pinyin``-style per-char TONE3 readings for chinese.py.

When the model directory is absent the predictor reports unavailable and
chinese.py keeps its dictionary backend (reference behavior with
``is_g2pw=False``).
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.logger import logger

ANCHOR_CHAR = "▁"

# g2pW taxonomy (onnx_api.py:117-143)
NON_POLYPHONIC = {
    "一", "不", "和", "咋", "嗲", "剖", "差", "攢", "倒", "難", "奔", "勁",
    "拗", "肖", "瘙", "誒", "泊", "听", "噢",
}
NON_MONOPHONIC = {"似", "攢"}
POS_TAGS = ["UNK", "A", "C", "D", "I", "N", "P", "T", "V", "DE", "SHI"]


@dataclasses.dataclass(frozen=True)
class G2PWConfig:
    n_labels: int = 1
    n_chars: int = 1
    use_conditional: bool = True
    conditional_bias: bool = True
    char_linear: bool = True


def make_g2pw_model(bert_cfg, cfg: G2PWConfig):
    """Build the flax module (deferred imports keep text/ usable without jax)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ..models.bert import BertModel

    class G2PWModel(nn.Module):
        @nn.compact
        def __call__(self, input_ids, token_type_ids, attention_mask,
                     phoneme_mask, char_ids, position_ids):
            hs = BertModel(bert_cfg, name="encoder")(
                input_ids, attention_mask, token_type_ids)
            h = hs[-1]                                     # (B, L, H)
            b = h.shape[0]
            q = h[jnp.arange(b), position_ids]             # (B, H)
            logits = nn.Dense(cfg.n_labels, name="classifier")(q)
            if cfg.use_conditional:
                if cfg.conditional_bias:
                    bias = self.param(
                        "descriptor_bias",
                        nn.initializers.zeros, (cfg.n_labels,), jnp.float32)
                    logits = logits + bias
                if cfg.char_linear:
                    emb = nn.Embed(cfg.n_chars, cfg.n_labels,
                                   name="char_descriptor")(char_ids)
                    logits = logits + emb
            logits = jnp.where(phoneme_mask > 0, logits, -jnp.inf)
            return jax.nn.softmax(logits, axis=-1)

    return G2PWModel()


def convert_g2pw_weights(state: Dict[str, np.ndarray], cfg: G2PWConfig
                         ) -> dict:
    """torch/ONNX state (HF BERT names + head tensors) -> flax params."""
    from ..models.bert import convert_hf_bert
    from ..train.ckpt import unflatten_tree

    def find(*cands):
        for c in cands:
            if c in state:
                return np.asarray(state[c], np.float32)
        return None

    bert_state = {re.sub(r"^(encoder|bert)\.", "", k): v
                  for k, v in state.items()
                  if ".layer." in k or "embeddings." in k}
    params = {"encoder": convert_hf_bert(bert_state)}

    w = find("classifier.weight", "out.weight")
    if w is None:
        raise KeyError("g2pw state lacks a classifier.weight tensor; "
                       f"have: {sorted(state)[:8]}...")
    flat = {"classifier/kernel": w.T}
    b = find("classifier.bias", "out.bias")
    if b is not None:
        flat["classifier/bias"] = b
    if cfg.use_conditional:
        if cfg.conditional_bias:
            db = find("descriptor_bias.weight", "descriptor_bias")
            if db is not None:
                flat["descriptor_bias"] = db.reshape(-1)
        if cfg.char_linear:
            ce = find("char_descriptor.weight", "char_emb.weight")
            if ce is not None:
                flat["char_descriptor/embedding"] = ce
    head = unflatten_tree(flat)
    params.update(head)
    return params


# ---------------------------------------------------------------------------
# tokenize-and-map (g2pw/utils.py:22-84 semantics)
# ---------------------------------------------------------------------------


def wordize_and_map(text: str):
    words, text2word, word2text = [], [], []
    while text:
        m = re.match(r"^ +", text)
        if m:
            text2word += [None] * len(m.group(0))
            text = text[len(m.group(0)):]
            continue
        m = re.match(r"^[a-zA-Z0-9]+", text)
        chunk = m.group(0) if m else text[0]
        start = len(text2word)
        word2text.append((start, start + len(chunk)))
        text2word += [len(words)] * len(chunk)
        words.append(chunk)
        text = text[len(chunk):]
    return words, text2word, word2text


def tokenize_and_map(tokenizer, text: str):
    words, text2word, word2text = wordize_and_map(text)
    tokens, token2text = [], []
    for word, (start, end) in zip(words, word2text):
        word_tokens = tokenizer.tokenize(word)
        if not word_tokens or word_tokens == ["[UNK]"]:
            token2text.append((start, end))
            tokens.append("[UNK]")
        else:
            cur = start
            for tok in word_tokens:
                ln = len(re.sub(r"^##", "", tok))
                token2text.append((cur, cur + ln))
                cur += ln
                tokens.append(tok)
    text2token = list(text2word)
    for i, (s, e) in enumerate(token2text):
        for pos in range(s, e):
            text2token[pos] = i
    return tokens, text2token, token2text


# ---------------------------------------------------------------------------
# predictor
# ---------------------------------------------------------------------------


class G2PWPredictor:
    """Model-backed per-char pinyin, mirroring G2PWOnnxConverter.__call__."""

    def __init__(self, model_dir: str, tokenizer=None, max_len: int = 512):
        self.available = False
        self.max_len = max_len
        if not model_dir or not os.path.isdir(model_dir):
            return
        try:
            self._load(model_dir, tokenizer)
            self.available = True
        except Exception as exc:  # pragma: no cover - depends on local files
            logger.warning("g2pw model not loaded from %s: %s", model_dir, exc)

    def _load(self, model_dir: str, tokenizer):
        self.polyphonic_chars = [
            line.split("\t") for line in open(
                os.path.join(model_dir, "POLYPHONIC_CHARS.txt"),
                encoding="utf8").read().strip().split("\n")]
        self.monophonic_chars = dict(
            line.split("\t") for line in open(
                os.path.join(model_dir, "MONOPHONIC_CHARS.txt"),
                encoding="utf8").read().strip().split("\n"))
        for ch in NON_MONOPHONIC:
            self.monophonic_chars.pop(ch, None)
        self.labels, self.char2phonemes = get_phoneme_labels(
            self.polyphonic_chars)
        self.chars = sorted(self.char2phonemes)
        self.poly_set = set(self.chars) - NON_POLYPHONIC
        with open(os.path.join(model_dir,
                               "bopomofo_to_pinyin_wo_tune_dict.json"),
                  encoding="utf8") as f:
            self.bopomofo_to_pinyin = json.load(f)
        char_bopomofo = os.path.join(model_dir, "char_bopomofo_dict.json")
        self.char_bopomofo = (json.load(open(char_bopomofo, encoding="utf8"))
                              if os.path.exists(char_bopomofo) else {})

        if tokenizer is None:
            from transformers import AutoTokenizer

            for cand in (os.path.join(model_dir, "tokenizer"), model_dir):
                try:
                    tokenizer = AutoTokenizer.from_pretrained(cand)
                    break
                except Exception:
                    tokenizer = None
        if tokenizer is None:
            raise FileNotFoundError("no tokenizer for g2pw")
        self.tokenizer = tokenizer

        state = self._load_state(model_dir)
        from ..models.bert import BertConfig

        def emb_rows(suffix):
            return next(int(v.shape[0]) for k, v in state.items()
                        if k.endswith(suffix))

        hidden = int(state["classifier.weight"].shape[1])
        inter = next(int(v.shape[0]) for k, v in state.items()
                     if k.endswith("layer.0.intermediate.dense.weight"))
        n_layers = 0
        while any(f"encoder.layer.{n_layers}." in k for k in state):
            n_layers += 1
        heads = max(1, hidden // 64)
        hf_cfg = os.path.join(model_dir, "config.json")
        if os.path.exists(hf_cfg):
            with open(hf_cfg, encoding="utf8") as f:
                heads = json.load(f).get("num_attention_heads", heads)
        bert_cfg = BertConfig(
            vocab_size=emb_rows("embeddings.word_embeddings.weight"),
            hidden_size=hidden, num_layers=n_layers, num_heads=heads,
            intermediate_size=inter,
            max_position=emb_rows("embeddings.position_embeddings.weight"),
            type_vocab_size=emb_rows("embeddings.token_type_embeddings.weight"))
        self.cfg = G2PWConfig(
            n_labels=len(self.labels), n_chars=len(self.chars),
            use_conditional=any("char_descriptor" in k for k in state)
            or any("descriptor_bias" in k for k in state),
            conditional_bias=any("descriptor_bias" in k for k in state),
            char_linear=any("char_descriptor" in k for k in state))
        self.model = make_g2pw_model(bert_cfg, self.cfg)
        self.params = {"params": convert_g2pw_weights(state, self.cfg)}

        import jax

        self._apply = jax.jit(self.model.apply)

    @staticmethod
    def _load_state(model_dir: str) -> Dict[str, np.ndarray]:
        onnx = os.path.join(model_dir, "g2pW.onnx")
        if os.path.exists(onnx):
            from ..audiokit.mdxnet import load_onnx_initializers

            state = load_onnx_initializers(onnx)
            if not any("embeddings.word_embeddings" in k for k in state):
                raise ValueError(
                    "g2pW.onnx initializers are anonymized; cannot map")
            return state
        import torch

        for cand in ("g2pW.pth", "g2pW.ckpt", "best_accuracy.pth"):
            path = os.path.join(model_dir, cand)
            if os.path.exists(path):
                raw = torch.load(path, map_location="cpu",
                                 weights_only=False)
                if isinstance(raw, dict) and "state_dict" in raw:
                    raw = raw["state_dict"]
                return {k: v.detach().to(torch.float32).numpy()
                        for k, v in raw.items() if hasattr(v, "detach")}
        raise FileNotFoundError(f"no g2pw weights in {model_dir}")

    # -- inference -----------------------------------------------------------

    def _prepare_batch(self, texts: List[str], query_ids: List[int]):
        """dataset.prepare_onnx_input semantics (padding added for jit)."""
        rows = []
        for text, query_id in zip(texts, query_ids):
            text = text.lower()
            tokens, text2token, token2text = tokenize_and_map(
                self.tokenizer, text)
            tokens = tokens[:self.max_len - 2]
            ids = self.tokenizer.convert_tokens_to_ids(
                ["[CLS]"] + tokens + ["[SEP]"])
            query_char = text[query_id]
            phoneme_mask = np.zeros(len(self.labels), np.float32)
            phoneme_mask[self.char2phonemes[query_char]] = 1.0
            rows.append((np.asarray(ids, np.int32),
                         phoneme_mask,
                         self.chars.index(query_char),
                         int(text2token[query_id]) + 1))
        longest = max(len(r[0]) for r in rows)
        pad_to = 1 << (longest - 1).bit_length()       # few jit shapes
        b = len(rows)
        input_ids = np.zeros((b, pad_to), np.int32)
        attention = np.zeros((b, pad_to), np.int32)
        for i, (ids, _, _, _) in enumerate(rows):
            input_ids[i, :len(ids)] = ids
            attention[i, :len(ids)] = 1
        return dict(
            input_ids=input_ids,
            token_type_ids=np.zeros_like(input_ids),
            attention_mask=attention,
            phoneme_mask=np.stack([r[1] for r in rows]),
            char_ids=np.asarray([r[2] for r in rows], np.int32),
            position_ids=np.asarray([r[3] for r in rows], np.int32))

    def predict(self, texts: List[str], query_ids: List[int]) -> List[str]:
        batch = self._prepare_batch(texts, query_ids)
        probs = np.asarray(self._apply(self.params, **batch))
        preds = probs.argmax(axis=1)
        return [self.labels[p] for p in preds]

    def _bopomofo_to_tone3(self, bopomofo: str) -> Optional[str]:
        tone = bopomofo[-1]
        body = self.bopomofo_to_pinyin.get(bopomofo[:-1])
        return (body + tone) if body else None

    def lazy_pinyin(self, seg: str, fallback) -> List[str]:
        """Per-char TONE3 readings for one segment.

        ``fallback(char) -> reading`` supplies non-model chars (the
        reference uses pypinyin there: onnx_api.py:226-240).
        """
        readings: List[Optional[str]] = [None] * len(seg)
        texts, query_ids = [], []
        for i, ch in enumerate(seg):
            if ch in self.poly_set:
                texts.append(seg)
                query_ids.append(i)
            elif ch in self.monophonic_chars:
                readings[i] = self._bopomofo_to_tone3(
                    self.monophonic_chars[ch]) or fallback(ch)
            else:
                readings[i] = fallback(ch)
        if texts:
            for qid, label in zip(query_ids,
                                  self.predict(texts, query_ids)):
                readings[qid] = (self._bopomofo_to_tone3(label)
                                 or fallback(seg[qid]))
        return [r if r is not None else seg[i]
                for i, r in enumerate(readings)]


def get_phoneme_labels(polyphonic_chars: Sequence[Sequence[str]]
                       ) -> Tuple[List[str], Dict[str, List[int]]]:
    labels = sorted({ph for _, ph in polyphonic_chars})
    index = {ph: i for i, ph in enumerate(labels)}
    char2phonemes: Dict[str, List[int]] = {}
    for char, ph in polyphonic_chars:
        char2phonemes.setdefault(char, []).append(index[ph])
    return labels, char2phonemes
