"""Fused MRF Pallas kernel: fwd + grad equivalence vs the plain-XLA
composition at several stage geometries (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easevoice_trainer_tpu.ops.fused_mrf import (
    build_stage_spec, mrf_stage, mrf_stage_reference)


def make_stage(rng, cf, block_defs, dtype=jnp.float32):
    spec = build_stage_spec(block_defs)
    ktot = spec.n_taps
    wcat = jnp.asarray(
        rng.normal(0, 0.15, size=(ktot, cf, cf)).astype(np.float32), dtype)
    bcat = jnp.asarray(
        rng.normal(0, 0.1, size=(len(spec.convs), cf)).astype(np.float32),
        dtype)
    return spec, wcat, bcat


# (kp, pl) per conv; blocks of 3 steps x (conv1, conv2) like ResBlock1,
# plus a 2-step single-conv block like ResBlock2
RB1 = [[[(3, 1), (3, 1)], [(7, 9), (3, 1)], [(5, 2), (3, 1)]]]
RB2 = [[[(3, 1)], [(5, 2)]]]
MIXED = RB1 + [[[(5, 2), (3, 1)], [(3, 1), (3, 1)], [(9, 4), (3, 1)]]] + RB2
# unfolded ResBlock1 with real dilations: (kp, pl, dil) = (k, (k*d-d)//2, d)
DILATED = [[[(3, 1, 1), (3, 1, 1)], [(3, 3, 3), (3, 1, 1)],
            [(3, 5, 5), (3, 1, 1)]],
           [[(7, 3, 1), (7, 3, 1)], [(7, 9, 3), (7, 3, 1)],
            [(7, 15, 5), (7, 3, 1)]]]


@pytest.mark.parametrize("block_defs,t,cf", [
    (RB1, 64, 8),
    (RB2, 48, 16),
    (MIXED, 96, 8),
    (DILATED, 96, 8),
])
def test_fwd_equivalence(block_defs, t, cf):
    rng = np.random.default_rng(0)
    spec, wcat, bcat = make_stage(rng, cf, block_defs)
    x = jnp.asarray(rng.normal(size=(2, t, cf)).astype(np.float32))
    y_ref = mrf_stage_reference(x, wcat, bcat, spec)
    y = mrf_stage(x, wcat, bcat, spec, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("block_defs,t,cf", [
    (RB1, 64, 8),
    (MIXED, 96, 8),
    (DILATED, 96, 8),
])
def test_grad_equivalence(block_defs, t, cf):
    rng = np.random.default_rng(1)
    spec, wcat, bcat = make_stage(rng, cf, block_defs)
    x = jnp.asarray(rng.normal(size=(2, t, cf)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(2, t, cf)).astype(np.float32))

    def loss_ref(x, w, b):
        return jnp.sum(mrf_stage_reference(x, w, b, spec) * ct)

    def loss_fused(x, w, b):
        return jnp.sum(mrf_stage(x, w, b, spec, True) * ct)

    gx_r, gw_r, gb_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wcat, bcat)
    gx_f, gw_f, gb_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, wcat, bcat)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                               atol=2e-4, rtol=2e-4)


def test_odd_length_masking():
    """t not a multiple of the pad granule: the kernel must mask the
    padded tail between chained convs (bias would otherwise leak)."""
    rng = np.random.default_rng(2)
    spec, wcat, bcat = make_stage(rng, 8, RB1)
    x = jnp.asarray(rng.normal(size=(1, 53, 8)).astype(np.float32))
    y_ref = mrf_stage_reference(x, wcat, bcat, spec)
    y = mrf_stage(x, wcat, bcat, spec, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)

    ct = jnp.asarray(rng.normal(size=(1, 53, 8)).astype(np.float32))
    gx_r = jax.grad(lambda a: jnp.sum(mrf_stage_reference(a, wcat, bcat, spec) * ct))(x)
    gx_f = jax.grad(lambda a: jnp.sum(mrf_stage(a, wcat, bcat, spec, True) * ct))(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4, rtol=2e-4)


def test_bf16_path():
    rng = np.random.default_rng(3)
    spec, wcat, bcat = make_stage(rng, 8, RB1, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 64, 8)), jnp.bfloat16)
    y_ref = mrf_stage_reference(x, wcat, bcat, spec)
    y = mrf_stage(x, wcat, bcat, spec, True)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_generator_fused_equivalence():
    """Full HiFi-GAN generator: fused_mrf='force' (Pallas interpreter)
    must match the unfused module at a tiny geometry covering folded
    (ch*fold<=256) and excluded (ch too wide) stages."""
    from easevoice_trainer_tpu.models.sovits.generator import Generator

    kw = dict(initial_channel=12, resblock="1",
              resblock_kernel_sizes=(3, 7), 
              resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
              upsample_rates=(4, 4, 2), upsample_initial_channel=32,
              upsample_kernel_sizes=(8, 8, 4), gin_channels=16)
    g_ref = Generator(**kw, fused_mrf=False)
    g_fused = Generator(**kw, fused_mrf="force")
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 11, 12)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 1, 16)).astype(np.float32))
    params = g_ref.init(jax.random.PRNGKey(0), x, g)
    y_ref = g_ref.apply(params, x, g)
    y_fused = g_fused.apply(params, x, g)
    assert y_ref.shape == y_fused.shape
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)

    # grads through both paths agree (same params tree)
    ct = jnp.asarray(rng.normal(size=y_ref.shape).astype(np.float32))
    gr = jax.grad(lambda p: jnp.sum(g_ref.apply(p, x, g) * ct))(params)
    gf = jax.grad(lambda p: jnp.sum(g_fused.apply(p, x, g) * ct))(params)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gr),
                   key=lambda e: str(e[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gf),
                   key=lambda e: str(e[0]))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4, err_msg=str(ka))
