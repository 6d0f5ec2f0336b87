"""DPO preference objective for GPT training.

Rebuild of the reference DPO path (reference:
src/easevoice/soundstorm/auto_reg/models/utils.py:160-228, t2s_model.py
forward:393-429): a "rejected" semantic sequence is synthesized from the
target by duplicating a random span (the reference's repeat_P corruption),
the model scores both, and a reference-free sigmoid preference loss on the
sequence log-prob margin is added to the CE loss.

TPU-first: corruption happens host-side per batch (numpy; the reference also
does dynamic-shape tensor surgery on CPU) with padding back to a static
width; the jitted step just sees a second (y, y_lens) pair.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_reject_y(y: np.ndarray, y_lens: np.ndarray,
                  rng: np.random.Generator,
                  max_len: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Corrupt each row by repeating a random token span (repeat_P).

    y: (B, T) int; returns (reject_y (B, T'), reject_lens) padded with zeros.
    """
    B, T = y.shape
    max_len = max_len or T
    rows = []
    lens = []
    for b in range(B):
        L = int(y_lens[b])
        row = y[b, :L]
        lo, hi = sorted(rng.integers(0, max(L, 1), size=2).tolist())
        new = np.concatenate([row[:lo], row[lo:hi], row[lo:hi], row[hi:]])
        new = new[:max_len]
        lens.append(len(new))
        rows.append(new)
    width = max(max_len, max(lens))
    out = np.zeros((B, width), y.dtype)
    for b, row in enumerate(rows):
        out[b, :len(row)] = row
    return out, np.asarray(lens, np.int32)


def sequence_logps(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Sum of per-token target log-probs per row (utils.py:181-189)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return tgt.sum(axis=-1)


def dpo_loss(chosen_logps: jnp.ndarray, rejected_logps: jnp.ndarray,
             beta: float = 0.2) -> jnp.ndarray:
    """Reference-free DPO (utils.py:160-178 with reference_free=True)."""
    margin = chosen_logps - rejected_logps
    return -jax.nn.log_sigmoid(beta * margin).mean()


def dpo_forward(model, params, batch: Dict, reject_y, reject_lens,
                dropout_rng=None):
    """Run chosen + rejected forwards and combine (t2s_model.py:393-429)."""
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    out = model.apply({"params": params}, batch["phoneme_ids"],
                      batch["phoneme_ids_len"], batch["semantic_ids"],
                      batch["semantic_ids_len"], batch["bert_feature"],
                      deterministic=dropout_rng is None, rngs=rngs)
    out_rej = model.apply({"params": params}, batch["phoneme_ids"],
                          batch["phoneme_ids_len"], reject_y, reject_lens,
                          batch["bert_feature"],
                          deterministic=dropout_rng is None, rngs=rngs)
    chosen = sequence_logps(out["logits"], out["targets"])
    rejected = sequence_logps(out_rej["logits"], out_rej["targets"])
    loss = out["loss"] + dpo_loss(chosen, rejected)
    return {"loss": loss, "acc": out["acc"], "ce_loss": out["loss"],
            "dpo_margin": (chosen - rejected).mean()}
