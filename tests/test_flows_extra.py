"""Invertibility tests for the auxiliary flow layers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easevoice_trainer_tpu.nn.flows_extra import (
    ActNorm, ConvFlow, InvConvNear, rational_quadratic_spline)


def test_spline_invertible(rng):
    K = 10
    x = rng.uniform(-4.0, 4.0, (6, 8)).astype(np.float32)
    uw = rng.normal(size=(6, 8, K)).astype(np.float32)
    uh = rng.normal(size=(6, 8, K)).astype(np.float32)
    ud = rng.normal(size=(6, 8, K - 1)).astype(np.float32)
    y, ld = rational_quadratic_spline(jnp.asarray(x), uw, uh, ud)
    x_rec, ld_inv = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)
    # identity outside the tails
    far = jnp.asarray([[7.0, -9.0]])
    y2, ld2 = rational_quadratic_spline(
        far, uw[:1, :2], uh[:1, :2], ud[:1, :2])
    np.testing.assert_allclose(np.asarray(y2), np.asarray(far))
    np.testing.assert_allclose(np.asarray(ld2), 0.0)


def test_convflow_invertible(rng):
    flow = ConvFlow(in_channels=8, filter_channels=16, kernel_size=3,
                    n_layers=2)
    x = rng.normal(size=(2, 12, 8)).astype(np.float32)
    mask = np.ones((2, 12, 1), np.float32)
    variables = flow.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)
    y, logdet = flow.apply(variables, jnp.asarray(x), mask)
    # untouched half passes through; transformed half is invertible
    np.testing.assert_allclose(np.asarray(y)[..., :4], x[..., :4], atol=1e-6)
    x_rec = flow.apply(variables, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), x, atol=1e-4)
    assert logdet.shape == (2,)


def test_actnorm_invertible(rng):
    an = ActNorm(channels=6)
    x = rng.normal(size=(2, 10, 6)).astype(np.float32)
    variables = an.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # nonzero params to make the test meaningful
    variables = {"params": {"logs": jnp.asarray(rng.normal(size=6) * 0.1,
                                                jnp.float32),
                            "bias": jnp.asarray(rng.normal(size=6),
                                                jnp.float32)}}
    y, logdet = an.apply(variables, jnp.asarray(x))
    x_rec = an.apply(variables, y, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), x, atol=1e-5)
    assert logdet.shape == (2,)


def test_invconv_invertible(rng):
    ic = InvConvNear(channels=8, n_split=4)
    x = rng.normal(size=(2, 10, 8)).astype(np.float32)
    variables = ic.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, logdet = ic.apply(variables, jnp.asarray(x))
    x_rec = ic.apply(variables, y, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), x, atol=1e-4)
    # orthonormal init -> logdet ~ 0
    np.testing.assert_allclose(np.asarray(logdet), 0.0, atol=1e-3)
