"""PRNG key helpers.

``fast_key(seed)`` returns a key whose random bits come from the TPU's
hardware generator (``rbg`` impl -> one ``rng-bit-generator`` HLO per
draw).  The default threefry impl synthesizes bits in software: the s2
train-step HLO showed ~690 u32[8,2,256,256] ops *per attention layer*
just for dropout masks.  Threefry stays the default on CPU (tests,
reproducibility) and for parameter init.

``fold_in``/``split`` work identically on rbg keys, so callers only
change where the root key is minted.
"""
from __future__ import annotations

import jax


def fast_key(seed: int):
    """Root PRNG key for train/infer steps; hardware RNG off-CPU."""
    if jax.default_backend() == "cpu":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl="rbg")
