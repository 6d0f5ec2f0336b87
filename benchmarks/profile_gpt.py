"""s1 GPT train-step timing on the current device.

Measures the production step (gpt_step.make_train_step at the real
configs/gpt.yaml geometry) and an optimizer-stubbed variant so the
ScaledAdam share is attributable.

Usage: python benchmarks/profile_gpt.py [batch] [sem_len] [iters] [--no-opt]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(batch: int, sem_len: int, no_opt: bool = False,
          remat: bool = False):
    import jax
    import jax.numpy as jnp
    from easevoice_trainer_tpu.models.gpt import Text2SemanticDecoder, T2SConfig
    from easevoice_trainer_tpu.train import gpt_step
    from easevoice_trainer_tpu.utils.config import GlobalCFG, host_cpu_init
    GlobalCFG()   # persistent compile cache (standalone runs)

    if no_opt:
        import optax
        import easevoice_trainer_tpu.train.gpt_step as gs
        gs.scaled_adam = lambda *a, **k: optax.set_to_zero()  # type: ignore

    cfg = T2SConfig()          # real 512/16h/24L/2048ffn config
    hp = gpt_step.GPTTrainHP(grad_accum=1)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else None
    model = Text2SemanticDecoder(cfg, dtype=dtype, remat=remat)

    rng = np.random.default_rng(0)
    ph_len = 48
    batch_np = {
        "phoneme_ids": rng.integers(0, 700, (batch, ph_len)).astype(np.int32),
        "phoneme_ids_len": np.full((batch,), ph_len, np.int32),
        "semantic_ids": rng.integers(0, 1024, (batch, sem_len)).astype(np.int32),
        "semantic_ids_len": np.full((batch,), sem_len, np.int32),
        "bert_feature": rng.normal(
            size=(batch, ph_len, 1024)).astype(np.float32),
    }
    with host_cpu_init():
        state = gpt_step.create_train_state(
            jax.random.PRNGKey(0), model, hp, batch_np)
        state = jax.tree_util.tree_map(np.asarray, state)
    state = jax.device_put(state, jax.devices()[0])
    batch_dev = jax.device_put(batch_np, jax.devices()[0])
    step = jax.jit(gpt_step.make_train_step(model, hp), donate_argnums=(0,))
    return state, batch_dev, step


def measure(batch: int = 8, sem_len: int = 256, iters: int = 10,
            no_opt: bool = False, remat: bool = False) -> dict:
    """Best-of-3-window s1 step timing + cost model; reused by bench.py."""
    import jax

    state, batch_dev, step = build(batch, sem_len, no_opt, remat)
    for i in range(2):
        state, metrics = step(state, batch_dev, jax.random.PRNGKey(i))
    float(metrics["loss"])
    best = float("inf")
    # block on the FULL output tree at window edges — a loss-scalar fetch
    # alone lets the next window's clock start while optimizer kernels are
    # still in flight (see the matching note in bench.py)
    for w in range(3):
        jax.block_until_ready((state, metrics))
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(state, batch_dev,
                                  jax.random.PRNGKey(100 + w * iters + i))
        jax.block_until_ready((state, metrics))
        best = min(best, time.perf_counter() - t0)
    out = {"steps_per_sec": round(iters / best, 3),
           "step_ms": round(best / iters * 1e3, 3),
           "batch": batch, "sem_len": sem_len, "remat": remat}
    try:
        ca = step.lower(state, batch_dev,
                        jax.random.PRNGKey(0)).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        out["tflops_per_step"] = round(float(ca.get("flops", 0.0)) / 1e12, 3)
        out["gbytes_per_step"] = round(
            float(ca.get("bytes accessed", 0.0)) / 1e9, 2)
    except Exception:
        pass
    return out


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    batch = int(pos[0]) if len(pos) > 0 else 8
    sem_len = int(pos[1]) if len(pos) > 1 else 256
    iters = int(pos[2]) if len(pos) > 2 else 10
    no_opt = "--no-opt" in sys.argv
    remat = "--remat" in sys.argv   # default off: lost the r5 A/B (PERF.md)

    out = measure(batch, sem_len, iters, no_opt, remat)
    label = "gpt no-opt" if no_opt else "gpt full"
    label += " remat" if remat else " no-remat"
    print(f"{label} step ({batch}x{sem_len}): {out['step_ms']:.2f} ms "
          f"({out['steps_per_sec']} steps/s)")
    if "tflops_per_step" in out:
        print(f"cost: {out['tflops_per_step']:.3f} TFLOP, "
              f"{out['gbytes_per_step']:.2f} GB")


if __name__ == "__main__":
    main()
