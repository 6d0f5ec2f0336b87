"""Benchmark harness — prints ONE JSON line for the driver.

Metric: s2 SoVITS fine-tune training steps/sec on one chip at the real model
config (configs/s2.json: 192/768 channels, full MPD, batch 8 x 256 spec
frames ~ 5.1 s clips) — the BASELINE.md north-star metric
("s2 fine-tune steps/sec/chip").

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
comparison point is our own measurement of the reference recipe on the
same fixture dataset (benchmarks/refshim/run_reference_s2.py — torch CPU,
the only reference path runnable here; caveats recorded in
BASELINE.json["measured_reference"]).  The ratio is reference s2
wall-clock / our warm s2 wall-clock for the identical 2-epoch fine-tune.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def build(batch_size: int, frames: int):
    import jax
    import jax.numpy as jnp
    from easevoice_trainer_tpu.models.sovits import (
        SynthesizerTrn, SovitsConfig, MultiPeriodDiscriminator)
    from easevoice_trainer_tpu.ops.stft import MelConfig, spectrogram
    from easevoice_trainer_tpu.train import sovits_step

    cfg = SovitsConfig()
    mel_cfg = MelConfig()
    hp = sovits_step.S2TrainHP()
    # bf16 compute / fp32 params — the production TPU training setting
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else None
    synth = SynthesizerTrn(cfg, dtype=dtype)
    disc = MultiPeriodDiscriminator(dtype=dtype)

    rng = np.random.default_rng(0)
    samples = frames * mel_cfg.hop_length
    wav = rng.uniform(-0.5, 0.5, (batch_size, samples)).astype(np.float32)
    from easevoice_trainer_tpu.train.data import spectrogram_np
    spec = np.stack([spectrogram_np(w, mel_cfg.n_fft, mel_cfg.hop_length,
                                    mel_cfg.win_length) for w in wav])
    T50 = 2 * ((frames + 1) // 2)
    batch = {
        "ssl": rng.normal(size=(batch_size, T50, cfg.ssl_dim)).astype(np.float32),
        "spec": spec,
        "spec_lengths": np.full((batch_size,), frames, np.int32),
        "wav": wav,
        "text": rng.integers(0, cfg.n_symbols, (batch_size, 24)).astype(np.int32),
        "text_lengths": np.full((batch_size,), 24, np.int32),
    }

    # init on host CPU (keys included — a TPU-resident key would force a slow
    # first device-to-host transfer); train on the accelerator
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        state = sovits_step.create_train_state(
            jax.random.PRNGKey(0), synth, disc, hp, batch, steps_per_epoch=100)
        state = jax.tree_util.tree_map(np.asarray, state)
    state = jax.device_put(state, jax.devices()[0])
    batch = jax.device_put(batch, jax.devices()[0])
    step = jax.jit(sovits_step.make_train_step(synth, disc, hp, mel_cfg,
                                               steps_per_epoch=100),
                   donate_argnums=(0,))
    return state, batch, step


# peak spec sheets per chip (bf16 matmul TFLOP/s, HBM GB/s)
_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),       # v5e
    "TPU v4": (275e12, 1228e9),
    "TPU v5": (459e12, 2765e9),           # v5p
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),      # v6e/trillium
}


def main():
    import jax

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    batch_size = int(pos[0]) if len(pos) > 0 else 8
    frames = int(pos[1]) if len(pos) > 1 else 256
    n_steps = int(pos[2]) if len(pos) > 2 else 10

    state, batch, step = build(batch_size, frames)

    # compile + warmup (2 steps); scalar fetch also warms the readback path
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    float(metrics["loss/g/total"])

    # best of 3 windows: the tunneled single-chip link adds occasional
    # multi-hundred-ms stalls that would understate steady-state throughput.
    # Window edges block on the FULL output tree, not just the loss scalar:
    # the loss readback can complete while optimizer-update kernels are
    # still in flight, so a scalar fetch alone lets window w+1's clock
    # start before window w's tail drains (this inflated round-3 steps/s
    # enough to put hbm_roofline_pct at an impossible 100.87 %).
    best_dt = float("inf")
    for w in range(3):
        jax.block_until_ready((state, metrics))
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batch,
                                  jax.random.PRNGKey(100 + w * n_steps + i))
        jax.block_until_ready((state, metrics))
        best_dt = min(best_dt, time.perf_counter() - t0)
    steps_per_sec = n_steps / best_dt

    # MFU + HBM roofline from XLA's own cost model of the compiled step
    extra = {"device": jax.devices()[0].device_kind}
    try:
        ca = step.lower(state, batch,
                        jax.random.PRNGKey(0)).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0))
        hbm_bytes = float(ca.get("bytes accessed", 0.0))
        extra["tflops_per_step"] = round(flops / 1e12, 3)
        extra["gbytes_per_step"] = round(hbm_bytes / 1e9, 2)
        peaks = _PEAKS.get(extra["device"])
        if peaks and flops:
            extra["mfu_pct"] = round(100 * flops * steps_per_sec / peaks[0], 2)
            extra["hbm_roofline_pct"] = round(
                100 * hbm_bytes * steps_per_sec / peaks[1], 2)
    except Exception as exc:                    # pragma: no cover
        extra["cost_analysis_error"] = str(exc)[:120]

    # s1 GPT training throughput + MFU (the other trainer's north star)
    if "--no-gpt" not in sys.argv:
        try:
            sys.path.insert(0, "benchmarks")
            from profile_gpt import measure as measure_gpt

            g = measure_gpt(8, 256, 10)
            extra["gpt_steps_per_sec"] = g["steps_per_sec"]
            extra["gpt_step_ms"] = g["step_ms"]
            peaks = _PEAKS.get(extra["device"])
            if peaks and g.get("tflops_per_step"):
                extra["gpt_mfu_pct"] = round(
                    100 * g["tflops_per_step"] * 1e12
                    * g["steps_per_sec"] / peaks[0], 2)
                extra["gpt_gbytes_per_step"] = g.get("gbytes_per_step")
        except Exception as exc:                # pragma: no cover
            extra["gpt_error"] = str(exc)[:120]

    # second north star: synthesis real-time factor (target <= 0.1)
    if "--no-rtf" not in sys.argv:
        try:
            sys.path.insert(0, "benchmarks")
            from rtf import measure as measure_rtf

            r = measure_rtf(250, 1)
            extra["rtf"] = r["value"]
            extra["rtf_detail"] = r["detail"]
        except Exception as exc:                # pragma: no cover
            extra["rtf_error"] = str(exc)[:120]

    # BASELINE.md north star: s2+s1 fine-tune wall-clock on a 1-minute
    # clone dataset through the production drivers (compile-cache warm
    # rounds reflect steady-state; EASEVOICE_BENCH_E2E=0 skips)
    import os as _os

    vs_baseline = None
    if ("--no-e2e" not in sys.argv
            and _os.environ.get("EASEVOICE_BENCH_E2E", "1") != "0"):
        try:
            sys.path.insert(0, "benchmarks")
            from e2e_finetune import measure_cold_warm

            e = measure_cold_warm(2)
            extra["e2e_finetune"] = e["warm"]
            extra["e2e_finetune_cold"] = e["cold"]

            # ratio vs the pinned same-fixture reference-recipe measurement
            # (benchmarks/refshim/run_reference_s2.py; caveats in the json)
            try:
                ref = json.load(open("BASELINE.json")).get(
                    "measured_reference", {})
                ref_wall = ref.get("ref_s2_wall_sec")
                ours = e["warm"].get("s2_wall_sec")
                if (ref_wall and ours and ref.get("epochs") == 2
                        and e["warm"].get("epochs") == 2):
                    vs_baseline = round(ref_wall / ours, 2)
                    extra["vs_baseline_note"] = ref.get("caveat", "")
            except Exception:
                pass
        except Exception as exc:                # pragma: no cover
            extra["e2e_error"] = str(exc)[:120]

    print(json.dumps({
        "metric": "s2_train_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": vs_baseline,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
