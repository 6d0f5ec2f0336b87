"""Worker for tests/test_distributed.py: one rank of a 2-process CPU
world running a single train step over the global mesh.

Usage: python _dist_worker.py <process_id> <num_processes> <coordinator> [mode]

``mode`` is ``gpt`` (default) or ``s2``.  Prints "DIST_LOSS <value>"
(every rank; they must agree — the state is replicated and the gradient
psum spans the world).
"""
import os
import sys


def gpt_fixture():
    """Tiny GPT model + deterministic global batch (same on every host)."""
    import numpy as np

    from easevoice_trainer_tpu.models.gpt import (Text2SemanticDecoder,
                                                  T2SConfig)
    from easevoice_trainer_tpu.train import gpt_step

    tcfg = T2SConfig(vocab_size=33, phoneme_vocab_size=20, embedding_dim=32,
                     hidden_dim=32, n_heads=4, n_layers=2, ffn_dim=64,
                     dropout=0.0, eos_id=32)
    thp = gpt_step.GPTTrainHP(grad_accum=1)
    model = Text2SemanticDecoder(tcfg)
    rng = np.random.default_rng(7)
    B = 4
    batch = {
        "phoneme_ids": rng.integers(0, 20, (B, 6)).astype(np.int32),
        "phoneme_ids_len": np.full((B,), 6, np.int32),
        "semantic_ids": rng.integers(0, 32, (B, 8)).astype(np.int32),
        "semantic_ids_len": np.full((B,), 8, np.int32),
        "bert_feature": rng.normal(size=(B, 6, 1024)).astype(np.float32),
    }
    return model, thp, batch


def s2_fixture():
    """Tiny s2 GAN pair + deterministic global batch (same on every host).

    Mirrors the production path in train/sovits.py: the bucket scheduler
    yields the identical global batch on every host; each host then keeps
    only its ``process_local_rows``.
    """
    import numpy as np

    from easevoice_trainer_tpu.ops.stft import MelConfig, spectrogram
    from easevoice_trainer_tpu.models.sovits import (MultiPeriodDiscriminator,
                                                     SovitsConfig,
                                                     SynthesizerTrn)
    from easevoice_trainer_tpu.train import sovits_step

    cfg = SovitsConfig(
        spec_channels=1025, segment_size=2560, inter_channels=32,
        hidden_channels=32, filter_channels=64, n_heads=2, n_layers=2,
        upsample_initial_channel=32, gin_channels=32, ssl_dim=64,
        n_symbols=50, p_dropout=0.0)
    mel_cfg = MelConfig()
    hp = sovits_step.S2TrainHP(segment_size=2560, learning_rate=2e-4)
    synth = SynthesizerTrn(cfg)
    disc = MultiPeriodDiscriminator(periods=(2, 3))

    rng = np.random.default_rng(11)
    B, frames = 4, 16
    samples = frames * mel_cfg.hop_length
    wav = rng.uniform(-0.5, 0.5, (B, samples)).astype(np.float32)
    spec = np.asarray(spectrogram(wav, mel_cfg.n_fft, mel_cfg.hop_length,
                                  mel_cfg.win_length))
    T50 = 2 * ((frames + 1) // 2)
    batch = {
        "ssl": rng.normal(size=(B, T50, cfg.ssl_dim)).astype(np.float32),
        "spec": spec,
        "spec_lengths": np.full((B,), frames, np.int32),
        "wav": wav,
        "text": rng.integers(0, cfg.n_symbols, (B, 6)).astype(np.int32),
        "text_lengths": np.full((B,), 6, np.int32),
    }
    return synth, disc, hp, mel_cfg, batch


def _run_gpt(mesh):
    import jax

    from easevoice_trainer_tpu.parallel import distributed
    from easevoice_trainer_tpu.train import gpt_step

    model, thp, batch = gpt_fixture()
    state = gpt_step.create_train_state(jax.random.PRNGKey(0), model, thp,
                                        batch)
    state = distributed.replicate_global(state, mesh)

    B = next(iter(batch.values())).shape[0]
    local_rows = distributed.process_local_rows(B, mesh)
    local = {k: v[local_rows] for k, v in batch.items()}
    sharded = distributed.shard_batch_global(local, mesh)
    step = jax.jit(gpt_step.make_train_step(model, thp))
    _, metrics = step(state, sharded, jax.random.PRNGKey(2))
    return float(jax.device_get(metrics["loss"]))


def _run_s2(mesh):
    import jax

    from easevoice_trainer_tpu.parallel import distributed
    from easevoice_trainer_tpu.train import sovits_step

    synth, disc, hp, mel_cfg, batch = s2_fixture()
    state = sovits_step.create_train_state(
        jax.random.PRNGKey(0), synth, disc, hp, batch, steps_per_epoch=2)
    state = distributed.replicate_global(state, mesh)

    B = batch["ssl"].shape[0]
    local_rows = distributed.process_local_rows(B, mesh)
    local = {k: v[local_rows] for k, v in batch.items()}
    sharded = distributed.shard_batch_global(local, mesh)
    step = jax.jit(sovits_step.make_train_step(synth, disc, hp, mel_cfg,
                                               steps_per_epoch=2))
    _, metrics = step(state, sharded, jax.random.PRNGKey(2))
    return float(jax.device_get(metrics["loss/g/total"]))


def main() -> None:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "gpt"
    os.environ["JAX_PLATFORMS"] = "cpu"
    # -O0: the s2 GAN step's XLA:CPU compile at default opt level takes
    # minutes per process on a 1-core host — two concurrent workers blew
    # the test's subprocess timeout.  The dryrun uses the same knob; the
    # loss tolerances in test_distributed.py absorb the tiny numeric
    # drift vs the default-level single-process comparison.
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                               "--xla_backend_optimization_level=0")
    os.environ["EASEVOICE_PROCESS_ID"] = str(pid)
    os.environ["EASEVOICE_NUM_PROCESSES"] = str(nproc)
    os.environ["EASEVOICE_COORDINATOR"] = coord

    import jax

    jax.config.update("jax_platforms", "cpu")

    from easevoice_trainer_tpu import parallel
    from easevoice_trainer_tpu.parallel import distributed

    assert distributed.maybe_initialize()
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == 2 * nproc, n_dev

    mesh = parallel.make_mesh(n_data=n_dev, n_model=1)
    loss = _run_s2(mesh) if mode == "s2" else _run_gpt(mesh)
    print(f"DIST_LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
