"""KV-cached autoregressive decoding for the s1 GPT, XLA-native.

The reference decodes with a Python loop over torch tensors, dynamic KV
concatenation and per-row retirement
(reference: src/easevoice/soundstorm/auto_reg/models/t2s_model.py:563-878).
On TPU that shape-morphing would recompile every step, so this module uses
the canonical XLA formulation instead:

* the KV cache is preallocated at ``x_len + prompt_len + max_new_tokens``
  and written in place with ``dynamic_update_slice``;
* decoding is one ``lax.while_loop`` whose carry has a single static shape;
* finished rows are masked, not removed: once a row samples EOS it keeps
  feeding EOS while the rest of the batch continues (equivalent to the
  reference's index_select retirement, without the reshapes);
* sampling reproduces the reference order of operations
  (repetition penalty -> top-p -> temperature -> top-k -> categorical;
  reference: models/utils.py:109-155) with the exponential-race trick for a
  sync-free multinomial.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DecodeParams:
    top_k: int = 15
    top_p: float = 1.0
    temperature: float = 1.0
    repetition_penalty: float = 1.35
    max_new_tokens: int = 1500
    early_stop_num: int = -1     # stop after this many new tokens if > 0
    min_tokens: int = 10         # EOS suppressed for the first N steps


def apply_repetition_penalty(logits: jnp.ndarray, history: jnp.ndarray,
                             history_valid: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """Penalize every vocab id present in ``history``.

    logits: (B, V); history: (B, H) int32; history_valid: (B, H) bool.
    """
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    clipped = jnp.clip(history, 0, v - 1)
    present = jnp.zeros((b, v), jnp.bool_)
    present = present.at[jnp.arange(b)[:, None], clipped].max(history_valid)
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(present, penalized, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    sorted_idx = jnp.argsort(logits, axis=-1)[:, ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum > top_p
    remove_sorted = remove_sorted.at[:, 0].set(False)
    # scatter back to vocab order
    remove = jnp.zeros_like(remove_sorted)
    remove = remove.at[jnp.arange(logits.shape[0])[:, None], sorted_idx].set(
        remove_sorted)
    return jnp.where(remove, -jnp.inf, logits)


def apply_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    if top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample_token(rng: jax.Array, logits: jnp.ndarray, history: jnp.ndarray,
                 history_valid: jnp.ndarray, p: DecodeParams) -> jnp.ndarray:
    """(B, V) logits -> (B,) sampled token ids, reference op order."""
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, history, history_valid,
                                      p.repetition_penalty)
    logits = apply_top_p(logits, p.top_p)
    logits = logits / max(p.temperature, 1e-5)
    logits = apply_top_k(logits, p.top_k)
    probs = jax.nn.softmax(logits, axis=-1)
    # exponential race == categorical sample (utils.py:102-106)
    q = jax.random.exponential(rng, probs.shape)
    return jnp.argmax(probs / q, axis=-1).astype(jnp.int32)


import functools


@functools.lru_cache(maxsize=32)
def _decode_fn(model, params: DecodeParams, b: int, x_len: int,
               prompt_len: int):
    """Build + cache one jitted prefill+loop program per shape signature."""

    def fn(variables, rng, x, x_lens, prompts, bert_feature):
        return _decode_ar_impl(model, variables, rng, x, x_lens, prompts,
                               bert_feature, params)

    return jax.jit(fn)


def decode_ar(
    model,
    variables,
    rng: jax.Array,
    x: jnp.ndarray,            # (B, Tx) phoneme ids (padded)
    x_lens: jnp.ndarray,       # (B,)
    prompts: jnp.ndarray,      # (B, Tp) semantic prompt tokens
    bert_feature: jnp.ndarray, # (B, Tx, 1024)
    params: DecodeParams = DecodeParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate semantic tokens — ONE jitted program (prefill + while_loop).

    Returns (tokens (B, max_new_tokens) int32 with EOS-fill after stop,
    lengths (B,) = #tokens generated before EOS).
    """
    fn = _decode_fn(model, params, x.shape[0], x.shape[1], prompts.shape[1])
    return fn(variables, rng, x, x_lens, prompts, bert_feature)


def _decode_ar_impl(model, variables, rng, x, x_lens, prompts, bert_feature,
                    params: DecodeParams):
    cfg = model.cfg
    eos = cfg.eos_id
    b, x_len = x.shape
    prompt_len = prompts.shape[1]
    max_new = params.max_new_tokens
    cache_len = x_len + prompt_len + max_new

    first_logits, k_caches, v_caches = model.apply(
        variables, x, x_lens, prompts, bert_feature, cache_len,
        method=type(model).prefill)

    slot = jnp.arange(cache_len)
    # static per-row template of valid cache slots (x pads are in the middle)
    x_part = slot[None, :] < x_lens[:, None]
    mid_part = (slot[None, :] >= x_len) & (slot[None, :] < x_len + prompt_len)

    history0 = jnp.concatenate(
        [prompts.astype(jnp.int32),
         jnp.full((b, max_new), eos, jnp.int32)], axis=1)
    hist_valid0 = jnp.concatenate(
        [jnp.ones((b, prompt_len), bool), jnp.zeros((b, max_new), bool)], axis=1)

    def kv_bias(step):
        gen_part = (slot[None, :] >= x_len + prompt_len) & (
            slot[None, :] < x_len + prompt_len + step)
        ok = x_part | mid_part | gen_part
        return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[:, None, None, :]

    def mask_eos_early(logits, step):
        # EOS suppressed for the first min_tokens steps (reference keeps
        # logits[:, :-1] for the first 10 iterations, t2s_model.py:833-836)
        suppress = step < params.min_tokens
        return jnp.where(
            (jnp.arange(logits.shape[-1]) == eos)[None, :] & suppress,
            -jnp.inf, logits)

    def step_fn(carry):
        (step, rng_c, done, tokens, lengths, history, hist_valid,
         logits, kc, vc) = carry
        rng_c, rng_s = jax.random.split(rng_c)
        lg = mask_eos_early(logits.astype(jnp.float32), step)
        sampled = sample_token(rng_s, lg, history, hist_valid, params)
        argmax_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        hits_eos = (sampled == eos) | (argmax_tok == eos)
        newly_done = (~done) & hits_eos
        token = jnp.where(done | hits_eos, eos, sampled)

        tokens = tokens.at[:, step].set(jnp.where(done, eos, token))
        lengths = jnp.where(newly_done | done, lengths, lengths + 1)
        history = history.at[:, prompt_len + step].set(token)
        hist_valid = hist_valid.at[:, prompt_len + step].set(~(done | hits_eos))
        done = done | hits_eos
        if params.early_stop_num > 0:
            done = done | (step + 1 >= params.early_stop_num)

        # advance the transformer one token: ``token`` (the step-th generated
        # token) lives at cache slot x_len + prompt_len + step and at
        # y-stream position prompt_len + step
        pos = x_len + prompt_len + step
        bias = kv_bias(step + 1)
        new_logits, kc, vc = model.apply(
            variables, token, prompt_len + step, pos, kc, vc, bias,
            method=type(model).decode_step)
        return (step + 1, rng_c, done, tokens, lengths, history, hist_valid,
                new_logits, kc, vc)

    def cond_fn(carry):
        step, _, done, *_ = carry
        return (step < max_new) & ~jnp.all(done)

    carry0 = (
        jnp.int32(0), rng,
        jnp.zeros((b,), bool),
        jnp.full((b, max_new), eos, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        history0, hist_valid0,
        first_logits, k_caches, v_caches,
    )
    (step, _, done, tokens, lengths, *_rest) = jax.lax.while_loop(
        cond_fn, step_fn, carry0)
    return tokens, lengths
