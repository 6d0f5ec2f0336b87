"""Train-step tests: GAN step runs & learns, GPT step runs & learns,
and both compile/execute sharded over the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the default fast run

from easevoice_trainer_tpu.ops.stft import MelConfig, spectrogram
from easevoice_trainer_tpu.models.sovits import SynthesizerTrn, SovitsConfig, MultiPeriodDiscriminator
from easevoice_trainer_tpu.models.gpt import Text2SemanticDecoder, T2SConfig
from easevoice_trainer_tpu.train import sovits_step, gpt_step
from easevoice_trainer_tpu import parallel


def make_s2_batch(rng, cfg: SovitsConfig, mel_cfg: MelConfig, B=2, frames=16):
    samples = frames * mel_cfg.hop_length
    wav = rng.uniform(-0.5, 0.5, (B, samples)).astype(np.float32)
    spec = np.asarray(spectrogram(wav, mel_cfg.n_fft, mel_cfg.hop_length,
                                  mel_cfg.win_length))
    T50 = 2 * ((frames + 1) // 2)
    return {
        "ssl": rng.normal(size=(B, T50, cfg.ssl_dim)).astype(np.float32),
        "spec": spec,
        "spec_lengths": np.full((B,), frames, np.int32),
        "wav": wav,
        "text": rng.integers(0, cfg.n_symbols, (B, 6)).astype(np.int32),
        "text_lengths": np.full((B,), 6, np.int32),
    }


@pytest.fixture(scope="module")
def s2_setup(request):
    cfg = SovitsConfig(
        spec_channels=1025, segment_size=2560, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        upsample_initial_channel=32, gin_channels=32, ssl_dim=64,
        n_symbols=50, p_dropout=0.0)
    mel_cfg = MelConfig()
    hp = sovits_step.S2TrainHP(segment_size=2560, learning_rate=2e-4)
    synth = SynthesizerTrn(cfg)
    disc = MultiPeriodDiscriminator(periods=(2, 3))
    rng = np.random.default_rng(0)
    batch = make_s2_batch(rng, cfg, mel_cfg)
    state = sovits_step.create_train_state(
        jax.random.PRNGKey(0), synth, disc, hp, batch, steps_per_epoch=2)
    step = jax.jit(sovits_step.make_train_step(synth, disc, hp, mel_cfg,
                                               steps_per_epoch=2))
    return synth, disc, hp, mel_cfg, state, step, batch


def test_s2_train_step_runs_and_descends(s2_setup):
    synth, disc, hp, mel_cfg, state, step, batch = s2_setup
    metrics_hist = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    for m in metrics_hist:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    # mel reconstruction should improve on a fixed batch within a few steps
    assert metrics_hist[-1]["loss/g/mel"] < metrics_hist[0]["loss/g/mel"]
    assert int(state.step) == 4


def test_s2_train_step_sharded(s2_setup):
    synth, disc, hp, mel_cfg, state, step, _ = s2_setup
    mesh = parallel.make_mesh(n_data=8)
    rng = np.random.default_rng(3)
    batch = make_s2_batch(rng, synth.cfg, mel_cfg, B=8)
    batch = parallel.shard_batch(batch, mesh)
    rep = parallel.replicated_sharding(mesh)
    state = jax.device_put(state, rep)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/g/total"]))


@pytest.fixture(scope="module")
def gpt_setup():
    cfg = T2SConfig(vocab_size=33, phoneme_vocab_size=20, embedding_dim=32,
                    hidden_dim=32, n_heads=4, n_layers=2, ffn_dim=64,
                    dropout=0.0, eos_id=32)
    hp = gpt_step.GPTTrainHP(grad_accum=2)
    model = Text2SemanticDecoder(cfg)
    rng = np.random.default_rng(0)
    B, Tx, Ty = 4, 6, 10
    batch = {
        "phoneme_ids": rng.integers(0, 20, (B, Tx)).astype(np.int32),
        "phoneme_ids_len": np.full((B,), Tx, np.int32),
        "semantic_ids": rng.integers(0, 32, (B, Ty)).astype(np.int32),
        "semantic_ids_len": np.array([10, 8, 10, 7], np.int32),
        "bert_feature": rng.normal(size=(B, Tx, 1024)).astype(np.float32),
    }
    state = gpt_step.create_train_state(jax.random.PRNGKey(0), model, hp, batch)
    step = jax.jit(gpt_step.make_train_step(model, hp))
    return model, hp, state, step, batch


def test_gpt_train_step_learns(gpt_setup):
    model, hp, state, step, batch = gpt_setup
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    # with grad_accum=2, six real updates on a fixed batch must reduce loss
    assert losses[-1] < losses[0]


def test_gpt_train_step_sharded(gpt_setup):
    model, hp, state, step, batch = gpt_setup
    mesh = parallel.make_mesh(n_data=8)
    big = {k: np.concatenate([v, v], axis=0) for k, v in batch.items()}
    big = parallel.shard_batch(big, mesh)
    state = jax.device_put(state, parallel.replicated_sharding(mesh))
    state2, metrics = step(state, big, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_warmup_cosine_locked_matches_reference():
    hp = gpt_step.GPTTrainHP()
    sched = gpt_step.warmup_cosine_schedule(hp)
    # reference lr_schedulers.py:62 locks the LR to 0.002 at every step
    for s in [0, 1, 1999, 2000, 39999, 100000]:
        assert float(sched(jnp.asarray(s))) == pytest.approx(0.002)


def test_scaled_adam_relative_updates():
    """ScaledAdam's step size must track parameter scale."""
    from easevoice_trainer_tpu.train.scaled_adam import scaled_adam
    import optax
    tx = scaled_adam(learning_rate=0.01, clipping_scale=None)
    params = {"big": jnp.full((8, 8), 10.0), "small": jnp.full((8, 8), 0.1)}
    state = tx.init(params)
    grads = {"big": jnp.ones((8, 8)), "small": jnp.ones((8, 8))}
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    rel_big = float(jnp.abs(updates["big"]).mean()) / 10.0
    rel_small = float(jnp.abs(updates["small"]).mean()) / 0.1
    assert rel_big == pytest.approx(rel_small, rel=0.2)
