"""bf16-moment AdamW: trajectory tolerance vs fp32 optax.adamw.

Documented-numerics bound for the default s2 optimizer setting
(EASEVOICE_OPT_STATE, easevoice_trainer_tpu/train/optim_lowp.py).
"""
import jax.numpy as jnp
import numpy as np
import optax

from easevoice_trainer_tpu.train.optim_lowp import adamw_lowp, moment_dtype


def _run(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_lowp_trajectory_close_to_fp32():
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(64,)).astype(np.float32)),
    }
    grads_seq = [
        {"w": jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32)) * 0.1,
         "b": jnp.asarray(rng.normal(size=(64,)).astype(np.float32)) * 0.1}
        for _ in range(50)
    ]
    lr = lambda step: 1e-3
    ref = _run(optax.adamw(lr, b1=0.8, b2=0.99, eps=1e-9,
                           weight_decay=0.01), dict(params), grads_seq)
    lowp = _run(adamw_lowp(lr, 0.8, 0.99, 1e-9, 0.01,
                           dtype=jnp.bfloat16), dict(params), grads_seq)
    # 50 steps of lr 1e-3 move weights by ~0.05; bf16 moment rounding must
    # stay far below the movement itself
    for k in params:
        move = float(jnp.abs(ref[k] - params[k]).max())
        drift = float(jnp.abs(ref[k] - lowp[k]).max())
        assert drift < 0.02 * max(move, 1e-6), (k, drift, move)


def test_lowp_state_dtype():
    params = {"w": jnp.ones((8, 8), jnp.float32)}
    tx = adamw_lowp(lambda s: 1e-3, 0.8, 0.99, 1e-9, 0.01,
                    dtype=jnp.bfloat16)
    state = tx.init(params)
    adam_state = state[0] if isinstance(state, tuple) else state
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.bfloat16
    # one-step update matches fp32 AdamW closely from zero-initialized
    # moments (first step has no accumulated rounding)
    g = {"w": jnp.full((8, 8), 0.1, jnp.float32)}
    ref = optax.adamw(lambda s: 1e-3, b1=0.8, b2=0.99, eps=1e-9,
                      weight_decay=0.01)
    u1, _ = tx.update(g, tx.init(params), params)
    u2, _ = ref.update(g, ref.init(params), params)
    np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(u2["w"]),
                               rtol=1e-5, atol=1e-8)


def test_scaled_adam_lowp_trajectory_close_to_fp32():
    """bf16-state ScaledAdam (s1 GPT optimizer) stays on the fp32 path.

    Same documented-numerics bound as the AdamW variant: exp_avg_sq and
    delta are re-rounded to bf16 each step, math in fp32."""
    from easevoice_trainer_tpu.train.scaled_adam import scaled_adam

    rng = np.random.default_rng(1)
    params = {
        "w": jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32)) * 0.1,
        "b": jnp.asarray(rng.normal(size=(48,)).astype(np.float32)) * 0.1,
    }
    grads_seq = [
        {"w": jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32)) * 0.1,
         "b": jnp.asarray(rng.normal(size=(48,)).astype(np.float32)) * 0.1}
        for _ in range(60)
    ]
    kw = dict(learning_rate=2e-3, b1=0.9, b2=0.95, clipping_scale=2.0,
              clipping_update_period=20, size_update_period=4)
    ref = _run(scaled_adam(**kw), dict(params), grads_seq)
    lowp = _run(scaled_adam(**kw, state_dtype=jnp.bfloat16),
                dict(params), grads_seq)
    for k in params:
        move = float(jnp.abs(ref[k] - params[k]).max())
        drift = float(jnp.abs(ref[k] - lowp[k]).max())
        assert drift < 0.02 * max(move, 1e-6), (k, drift, move)


def test_scaled_adam_lowp_state_dtype():
    from easevoice_trainer_tpu.train.scaled_adam import scaled_adam

    params = {"w": jnp.ones((8, 8), jnp.float32)}
    tx = scaled_adam(learning_rate=2e-3, state_dtype=jnp.bfloat16)
    state = tx.init(params)
    assert state.exp_avg_sq["w"].dtype == jnp.bfloat16
    assert state.delta["w"].dtype == jnp.bfloat16
    # small per-tensor scalars stay fp32
    assert state.param_rms["w"].dtype == jnp.float32
    g = {"w": jnp.full((8, 8), 0.1, jnp.float32)}
    _, new_state = tx.update(g, state, params)
    assert new_state.exp_avg_sq["w"].dtype == jnp.bfloat16
    assert new_state.delta["w"].dtype == jnp.bfloat16


def test_fp32_env_fallback(monkeypatch):
    """EASEVOICE_OPT_STATE=fp32 restores stock optax.adamw exactly."""
    monkeypatch.setenv("EASEVOICE_OPT_STATE", "fp32")
    assert moment_dtype() is None
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    g = {"w": jnp.full((4, 4), 0.1, jnp.float32)}
    tx = adamw_lowp(lambda s: 1e-3, 0.8, 0.99, 1e-9, 0.01)  # env-driven
    ref = optax.adamw(lambda s: 1e-3, b1=0.8, b2=0.99, eps=1e-9,
                      weight_decay=0.01)
    u1, _ = tx.update(g, tx.init(params), params)
    u2, _ = ref.update(g, ref.init(params), params)
    np.testing.assert_array_equal(np.asarray(u1["w"]), np.asarray(u2["w"]))
