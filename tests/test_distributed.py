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

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_world(mode: str) -> list:
    """Run the 2-process world; return each rank's DIST_LOSS."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = (repo + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", coord, mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for pid in (0, 1)]
    # generous: two concurrent XLA:CPU compiles on a 1-core CI host took
    # ~10 min wall even with the workers' -O0 flag (see _dist_worker.py)
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    losses = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, out[-2000:]
        line = [ln for ln in out.splitlines() if ln.startswith("DIST_LOSS")]
        assert line, out[-2000:]
        losses.append(float(line[0].split()[1]))
    return losses


def test_two_process_gpt_step_matches_single_process():
    losses = _spawn_world("gpt")
    # replicated state + world-spanning gradient psum -> identical loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)

    # same batch through the single-process path (conftest's 8-device
    # virtual mesh): the distributed loss must match data-parallel math
    import jax
    from easevoice_trainer_tpu import parallel
    from easevoice_trainer_tpu.parallel import distributed
    from easevoice_trainer_tpu.train import gpt_step
    from _dist_worker import gpt_fixture

    model, thp, batch = gpt_fixture()
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


def test_two_process_s2_step_matches_single_process():
    """The s2 GAN step through the production multi-host path
    (process_local_rows + shard_batch_global, train/sovits.py:244-257)
    must equal single-process data-parallel math
    (reference DDP semantics: src/train/sovits.py:219-224)."""
    losses = _spawn_world("s2")
    assert losses[0] == pytest.approx(losses[1], abs=1e-5)

    import jax
    from easevoice_trainer_tpu import parallel
    from easevoice_trainer_tpu.parallel import distributed
    from easevoice_trainer_tpu.train import sovits_step
    from _dist_worker import s2_fixture

    synth, disc, hp, mel_cfg, batch = s2_fixture()
    mesh = parallel.make_mesh(n_data=4, n_model=1,
                              devices=jax.devices()[:4])
    state = sovits_step.create_train_state(
        jax.random.PRNGKey(0), synth, disc, hp, batch, steps_per_epoch=2)
    state = distributed.replicate_global(state, mesh)
    sharded = distributed.shard_batch_global(batch, mesh)
    step = jax.jit(sovits_step.make_train_step(synth, disc, hp, mel_cfg,
                                               steps_per_epoch=2))
    _, metrics = step(state, sharded, jax.random.PRNGKey(2))
    single = float(jax.device_get(metrics["loss/g/total"]))
    assert losses[0] == pytest.approx(single, rel=1e-3)


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
