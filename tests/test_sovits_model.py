"""Shape/finiteness tests for the s2 SoVITS model stack (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the default fast run

from easevoice_trainer_tpu.models.sovits import (
    SynthesizerTrn, SovitsConfig, MultiPeriodDiscriminator, losses,
)


def tiny_cfg(**kw):
    base = dict(
        spec_channels=1025,
        segment_size=2560,          # 4 frames * 640
        inter_channels=32,
        hidden_channels=32,
        filter_channels=64,
        n_heads=2,
        n_layers=2,
        upsample_initial_channel=32,
        gin_channels=32,
        ssl_dim=64,
        n_symbols=50,
        p_dropout=0.0,
    )
    base.update(kw)
    return SovitsConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = SynthesizerTrn(cfg)
    B, T_spec = 2, 16
    T50 = 2 * ((T_spec + 1) // 2)
    key = jax.random.PRNGKey(0)
    ssl = jax.random.normal(key, (B, T50, cfg.ssl_dim))
    spec = jax.random.normal(key, (B, T_spec, cfg.spec_channels)) ** 2
    spec_lengths = jnp.array([16, 12], jnp.int32)
    text = jnp.ones((B, 7), jnp.int32)
    text_lengths = jnp.array([7, 5], jnp.int32)
    rngs = {"params": key, "slice": key, "latent": key, "dropout": key}
    variables = model.init(rngs, ssl, spec, spec_lengths, text, text_lengths)
    return cfg, model, variables, (ssl, spec, spec_lengths, text, text_lengths)


def test_forward_shapes(setup):
    cfg, model, variables, batch = setup
    ssl, spec, spec_lengths, text, text_lengths = batch
    key = jax.random.PRNGKey(1)
    out = model.apply(
        variables, ssl, spec, spec_lengths, text, text_lengths,
        rngs={"slice": key, "latent": key})
    y_hat, commit, ids_slice, y_mask, latents, quantized = out
    B = ssl.shape[0]
    assert y_hat.shape == (B, cfg.segment_size, 1)
    assert np.isfinite(np.asarray(y_hat)).all()
    assert commit.shape == ()
    z, z_p, m_p, logs_p, m_q, logs_q = latents
    assert z.shape == (B, spec.shape[1], cfg.inter_channels)
    assert quantized.shape == (B, ssl.shape[1], cfg.ssl_dim)
    # slice indices stay within sequence bounds
    starts = np.asarray(ids_slice)
    assert (starts >= 0).all()
    assert (starts + cfg.segment_frames <= spec.shape[1]).all()


def test_infer_and_decode(setup):
    cfg, model, variables, batch = setup
    ssl, spec, spec_lengths, text, text_lengths = batch
    wav, y_mask = model.apply(
        variables, ssl, spec, spec_lengths, text, text_lengths,
        method=SynthesizerTrn.infer)
    assert wav.shape[1] == spec.shape[1] * 640
    assert np.isfinite(np.asarray(wav)).all()

    codes = model.apply(variables, ssl, method=SynthesizerTrn.extract_latent)
    assert codes.shape == (ssl.shape[0], ssl.shape[1] // 2)
    assert codes.dtype == jnp.int32
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 1024).all()

    wav2 = model.apply(
        variables, codes[:1], text[:1], text_lengths[:1], spec[:1],
        spec_lengths[:1], method=SynthesizerTrn.decode)
    assert wav2.shape[1] == codes.shape[1] * 2 * 640
    assert np.isfinite(np.asarray(wav2)).all()


def test_flow_is_invertible(setup):
    cfg, model, variables, batch = setup
    ssl, spec, spec_lengths, text, text_lengths = batch
    B, T = spec.shape[0], spec.shape[1]
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.inter_channels))
    mask = jnp.ones((B, T, 1))
    g = jax.random.normal(jax.random.PRNGKey(3), (B, 1, cfg.gin_channels))

    def fwd(vars_, x):
        return SynthesizerTrn(cfg).apply(
            vars_, x, mask, g=g, method=lambda m, *a, **k: m.flow(*a, **k))

    def inv(vars_, x):
        return SynthesizerTrn(cfg).apply(
            vars_, x, mask, g=g, reverse=True,
            method=lambda m, *a, **k: m.flow(*a, **k))

    z = fwd(variables, x)
    x_rec = inv(variables, z)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_discriminator_and_losses(setup):
    cfg, model, variables, batch = setup
    B, T = 2, 2560
    key = jax.random.PRNGKey(4)
    y = jax.random.normal(key, (B, T, 1)) * 0.1
    y_hat = jax.random.normal(jax.random.PRNGKey(5), (B, T, 1)) * 0.1
    mpd = MultiPeriodDiscriminator()
    dvars = mpd.init(key, y, y_hat)
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = mpd.apply(dvars, y, y_hat)
    assert len(y_d_rs) == 6  # 1 scale + 5 period discriminators

    d_loss, r_losses, g_losses = losses.discriminator_loss(y_d_rs, y_d_gs)
    g_adv, _ = losses.generator_adv_loss(y_d_gs)
    fm = losses.feature_matching_loss(fmap_rs, fmap_gs)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_adv)) and np.isfinite(float(fm))


def test_folded_conv_matches_direct():
    """WNConv1d(fold=f) — the space-to-depth lowering for small-channel
    HiFi-GAN stages — must match the direct dilated conv to float noise
    for every (C, f, kernel, dilation) the generator uses."""
    import jax
    import jax.numpy as jnp
    from easevoice_trainer_tpu.nn.layers import WNConv1d

    r = np.random.default_rng(0)
    for C, f in ((16, 8), (32, 4), (64, 2)):
        for k, d in ((3, 1), (7, 3), (11, 5)):
            x = jnp.asarray(r.normal(size=(2, 48, C)).astype(np.float32))
            m0 = WNConv1d(C, C, k, dilation=d)
            m1 = WNConv1d(C, C, k, dilation=d, fold=f)
            p = m0.init(jax.random.PRNGKey(1), x)
            np.testing.assert_allclose(
                np.asarray(m0.apply(p, x)), np.asarray(m1.apply(p, x)),
                rtol=1e-5, atol=1e-5)
    # general form: strided, Cin != Cout, non-divisible length (pad+slice)
    for cin, cout, k, d, s_, pd, f, T in (
            (1, 32, 5, 1, 3, 2, 4, 99),
            (32, 128, 5, 1, 3, 2, 4, 97),
            (16, 16, 3, 5, 1, None, 8, 50)):
        x = jnp.asarray(r.normal(size=(2, T, cin)).astype(np.float32))
        kw = dict(kernel_size=k, dilation=d, stride=s_)
        if pd is not None:
            kw["padding"] = pd
        m0 = WNConv1d(cin, cout, **kw)
        m1 = WNConv1d(cin, cout, **kw, fold=f)
        p = m0.init(jax.random.PRNGKey(1), x)
        y0, y1 = m0.apply(p, x), m1.apply(p, x)
        assert y0.shape == y1.shape
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)


def test_discriminator_fold_equivalence():
    """Folded discriminators (periods merged into batch, space-to-depth
    convs, densified grouped kernels) must match the naive NHWC/grouped
    path on identical params — logits exactly ordered, fmaps as the same
    multiset (layout differs)."""
    from easevoice_trainer_tpu.models.sovits.discriminator import (
        DiscriminatorP, DiscriminatorS)

    key = jax.random.PRNGKey(0)
    # non-divisible T exercises the reflect pad + fold tail slicing
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2000, 1))

    for p in (2, 3, 5, 7, 11):
        folded = DiscriminatorP(p, fold=True)
        naive = DiscriminatorP(p, fold=False)
        params = folded.init(key, x)["params"]
        lf, ff = folded.apply({"params": params}, x)
        ln, fn_ = naive.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ln),
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"period {p} logits")
        b = x.shape[0]
        for i, (a, bb) in enumerate(zip(ff, fn_)):
            # folded fmap (B*p, H, C) -> naive layout (B, H, p, C)
            a = np.asarray(a).reshape(b, p, a.shape[1], a.shape[2])
            a = a.transpose(0, 2, 1, 3)
            np.testing.assert_allclose(a, np.asarray(bb), atol=2e-4,
                                       rtol=1e-4,
                                       err_msg=f"period {p} fmap {i}")

    folded = DiscriminatorS(fold=True)
    naive = DiscriminatorS(fold=False)
    params = folded.init(key, x)["params"]
    lf, ff = folded.apply({"params": params}, x)
    ln, fn_ = naive.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ln), atol=2e-4,
                               rtol=1e-4, err_msg="scale logits")
    for i, (a, bb) in enumerate(zip(ff, fn_)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-4,
                                   rtol=1e-4, err_msg=f"scale fmap {i}")


def test_transposed_conv_d2s_equivalence():
    """WNConvTranspose1d(fold=f) — depth-to-space sub-pixel lowering for
    the small-channel upsample stages — must match the dilated-conv path
    on identical params for every (Cin, Cout, k, stride) HiFi-GAN uses."""
    from easevoice_trainer_tpu.nn.layers import WNConvTranspose1d

    key = jax.random.PRNGKey(0)
    cases = [
        # (cin, cout, k, stride, fold) — up_2..up_4 of the production stack
        (128, 64, 8, 2, 1),
        (64, 32, 2, 2, 2),
        (32, 16, 2, 2, 4),
        # plus the big-stride stages (eligible only via explicit fold)
        (16, 8, 16, 10, 1),
        (12, 6, 16, 8, 2),
    ]
    for cin, cout, k, s, f in cases:
        pad = (k - s) // 2
        x = jax.random.normal(jax.random.fold_in(key, k * s), (2, 50, cin))
        folded = WNConvTranspose1d(cin, cout, k, s, padding=pad, fold=f)
        naive = WNConvTranspose1d(cin, cout, k, s, padding=pad, fold=0)
        params = folded.init(key, x)["params"]
        yf = folded.apply({"params": params}, x)
        yn = naive.apply({"params": params}, x)
        assert yf.shape == yn.shape == (2, 50 * s, cout)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yn),
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"cin={cin} k={k} s={s} f={f}")
        # non-divisible length exercises the fold tail padding
        x2 = jax.random.normal(key, (1, 37, cin))
        yf2 = folded.apply({"params": params}, x2)
        yn2 = naive.apply({"params": params}, x2)
        np.testing.assert_allclose(np.asarray(yf2), np.asarray(yn2),
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"tail cin={cin} k={k} s={s} f={f}")
