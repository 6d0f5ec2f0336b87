"""Multi-host bootstrap tests (parallel/distributed.py).

The 2-process CPU world is real ``jax.distributed``: a coordinator on
rank 0, gloo CPU collectives, 2 virtual devices per process (4 global).
Maps the reference's DDP process-group semantics
(reference: src/train/sovits.py:219-224, src/train/gpt.py:154-156).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gpt_step_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = (repo + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for pid in (0, 1)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    losses = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, out[-2000:]
        line = [ln for ln in out.splitlines() if ln.startswith("DIST_LOSS")]
        assert line, out[-2000:]
        losses.append(float(line[0].split()[1]))
    # replicated state + world-spanning gradient psum -> identical loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)

    # same batch through the single-process path (conftest's 8-device
    # virtual mesh): the distributed loss must match data-parallel math
    import jax
    from easevoice_trainer_tpu import parallel
    from easevoice_trainer_tpu.parallel import distributed
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
    mesh = parallel.make_mesh(n_data=4, n_model=1,
                              devices=jax.devices()[:4])
    state = gpt_step.create_train_state(jax.random.PRNGKey(0), model, thp,
                                        batch)
    state = distributed.replicate_global(state, mesh)
    sharded = distributed.shard_batch_global(batch, mesh)
    step = jax.jit(gpt_step.make_train_step(model, thp))
    _, metrics = step(state, sharded, jax.random.PRNGKey(2))
    single = float(jax.device_get(metrics["loss"]))
    assert losses[0] == pytest.approx(single, abs=1e-4)


def test_process_local_rows_single_process_identity():
    import jax
    from easevoice_trainer_tpu import parallel
    from easevoice_trainer_tpu.parallel import distributed

    mesh = parallel.make_mesh(n_data=4, n_model=2,
                              devices=jax.devices()[:8])
    assert distributed.process_local_rows(12, mesh) == list(range(12))


def test_maybe_initialize_single_process_noop():
    from easevoice_trainer_tpu.parallel import distributed

    assert distributed.maybe_initialize() is False
    assert distributed.is_primary()
