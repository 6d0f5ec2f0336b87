"""Worker for tests/test_distributed.py: one rank of a 2-process CPU
world running a single GPT train step over the global mesh.

Usage: python _dist_worker.py <process_id> <num_processes> <coordinator>
Prints "DIST_LOSS <value>" (every rank; they must agree — the state is
replicated and the gradient psum spans the world).
"""
import os
import sys


def main() -> None:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["EASEVOICE_PROCESS_ID"] = str(pid)
    os.environ["EASEVOICE_NUM_PROCESSES"] = str(nproc)
    os.environ["EASEVOICE_COORDINATOR"] = coord

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from easevoice_trainer_tpu import parallel
    from easevoice_trainer_tpu.parallel import distributed
    from easevoice_trainer_tpu.models.gpt import (Text2SemanticDecoder,
                                                  T2SConfig)
    from easevoice_trainer_tpu.train import gpt_step

    assert distributed.maybe_initialize()
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == 2 * nproc, n_dev

    mesh = parallel.make_mesh(n_data=n_dev, n_model=1)
    tcfg = T2SConfig(vocab_size=33, phoneme_vocab_size=20, embedding_dim=32,
                     hidden_dim=32, n_heads=4, n_layers=2, ffn_dim=64,
                     dropout=0.0, eos_id=32)
    thp = gpt_step.GPTTrainHP(grad_accum=1)
    model = Text2SemanticDecoder(tcfg)

    # identical global batch on every host (same seed), as the bucket
    # scheduler guarantees in the trainers
    rng = np.random.default_rng(7)
    B = n_dev
    batch = {
        "phoneme_ids": rng.integers(0, 20, (B, 6)).astype(np.int32),
        "phoneme_ids_len": np.full((B,), 6, np.int32),
        "semantic_ids": rng.integers(0, 32, (B, 8)).astype(np.int32),
        "semantic_ids_len": np.full((B,), 8, np.int32),
        "bert_feature": rng.normal(size=(B, 6, 1024)).astype(np.float32),
    }
    state = gpt_step.create_train_state(jax.random.PRNGKey(0), model, thp,
                                        batch)
    state = distributed.replicate_global(state, mesh)

    local_rows = distributed.process_local_rows(B, mesh)
    assert len(local_rows) == B // nproc, local_rows
    local = {k: v[local_rows] for k, v in batch.items()}
    sharded = distributed.shard_batch_global(local, mesh)
    step = jax.jit(gpt_step.make_train_step(model, thp))
    state2, metrics = step(state, sharded, jax.random.PRNGKey(2))
    loss = float(jax.device_get(metrics["loss"]))
    print(f"DIST_LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
