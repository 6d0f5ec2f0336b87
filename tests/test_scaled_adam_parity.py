"""Trajectory parity: our optax ScaledAdam vs the reference torch ScaledAdam.

Same params, same gradient stream, compare parameters step by step —
including the ring-buffer median clipping, the size update, the scalar
path, and the early bias-correction cutoffs.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_OPTIM = ("/root/reference/src/easevoice/soundstorm/auto_reg/modules/"
             "optim.py")
pytestmark = pytest.mark.skipif(not os.path.exists(REF_OPTIM),
                                reason="reference checkout not available")

SHAPES = [(8, 16), (4, 7), ()]          # two tensors + one scalar
LR = 0.03
N_STEPS = 60
CLIP_PERIOD = 16                        # small so the test crosses it
SIZE_PERIOD = 4


def _ref_scaled_adam():
    spec = importlib.util.spec_from_file_location("ref_optim", REF_OPTIM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.ScaledAdam


def _grad_stream(rng, n_steps):
    """Heavy-tailed gradients so median != mean and clipping matters."""
    grads = []
    for t in range(n_steps):
        scale = 10.0 if t % 11 == 5 else 1.0        # occasional spikes
        grads.append([np.asarray(rng.normal(size=s), np.float32) * scale * 0.1
                      for s in SHAPES])
    return grads


@pytest.mark.parametrize("clipping_scale", [None, 2.0])
def test_scaled_adam_trajectory_parity(rng, clipping_scale):
    import jax.numpy as jnp

    from easevoice_trainer_tpu.train.scaled_adam import scaled_adam

    init = [np.asarray(rng.normal(size=s), np.float32) * 0.5 for s in SHAPES]
    grads = _grad_stream(rng, N_STEPS)

    # ---- reference torch run ------------------------------------------------
    ScaledAdam = _ref_scaled_adam()
    tparams = [torch.nn.Parameter(torch.as_tensor(np.array(v)))
               for v in init]
    opt = ScaledAdam(
        tparams, lr=LR, clipping_scale=clipping_scale, betas=(0.9, 0.95),
        size_update_period=SIZE_PERIOD, clipping_update_period=CLIP_PERIOD,
        parameters_names=[[f"p{i}" for i in range(len(tparams))]],
        show_dominant_parameters=False)
    torch_traj = []
    for g in grads:
        for p, gv in zip(tparams, g):
            p.grad = torch.as_tensor(np.array(gv))
        opt.step()
        torch_traj.append([p.detach().numpy().copy() for p in tparams])

    # ---- our optax run -------------------------------------------------------
    tx = scaled_adam(learning_rate=LR, b1=0.9, b2=0.95,
                     clipping_scale=clipping_scale,
                     clipping_update_period=CLIP_PERIOD,
                     size_update_period=SIZE_PERIOD)
    params = {f"p{i}": jnp.asarray(v) for i, v in enumerate(init)}
    state = tx.init(params)
    ours_traj = []
    for g in grads:
        gs = {f"p{i}": jnp.asarray(v) for i, v in enumerate(g)}
        updates, state = tx.update(gs, state, params)
        params = {k: params[k] + updates[k] for k in params}
        ours_traj.append([np.asarray(params[f"p{i}"])
                          for i in range(len(init))])

    for t, (ref_t, our_t) in enumerate(zip(torch_traj, ours_traj)):
        for i, (r, o) in enumerate(zip(ref_t, our_t)):
            np.testing.assert_allclose(
                o, r, atol=5e-5, rtol=5e-4,
                err_msg=f"step {t} param {i} (clip={clipping_scale})")
