"""Pallas flash prefill attention vs dense reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easevoice_trainer_tpu.ops.pallas.flash_prefill import (
    flash_prefill_attention, dense_reference)


@pytest.mark.parametrize("t,x_len", [(256, 96), (384, 128)])
def test_flash_matches_dense(rng, t, x_len):
    B, H, dk = 2, 4, 32
    q = rng.normal(size=(B, t, H, dk)).astype(np.float32)
    k = rng.normal(size=(B, t, H, dk)).astype(np.float32)
    v = rng.normal(size=(B, t, H, dk)).astype(np.float32)
    x_lens = np.array([x_len, x_len - 17], np.int32)
    y_lens = np.array([t - x_len, t - x_len - 31], np.int32)

    out = flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(x_lens), jnp.asarray(y_lens), x_len, H,
        block_q=128, block_k=128, interpret=True)
    ref = dense_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(x_lens), jnp.asarray(y_lens), x_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_padding_rows_zero(rng):
    """Query rows beyond both valid regions produce finite output."""
    B, H, dk, t, x_len = 1, 2, 32, 256, 64
    q = rng.normal(size=(B, t, H, dk)).astype(np.float32)
    k = rng.normal(size=(B, t, H, dk)).astype(np.float32)
    v = rng.normal(size=(B, t, H, dk)).astype(np.float32)
    x_lens = np.array([40], np.int32)
    y_lens = np.array([50], np.int32)
    out = np.asarray(flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(x_lens), jnp.asarray(y_lens), x_len, H, interpret=True))
    assert np.isfinite(out).all()
