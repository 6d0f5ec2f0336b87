"""Benchmark harness — prints ONE JSON line for the driver.

Metric: s2 SoVITS fine-tune training steps/sec on one chip at the real model
config (configs/s2.json: 192/768 channels, full MPD, batch 8 x 256 spec
frames ~ 5.1 s clips) — the BASELINE.md north-star metric
("s2 fine-tune steps/sec/chip").

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
comparison point is our own measurement of the reference recipe on the
same fixture dataset (benchmarks/refshim/run_reference_s2.py --write-baseline
pins it into BASELINE.json["measured_reference"]; caveats recorded there).
The ratio is reference s2 wall-clock / our s2 wall-clock for the identical
2-epoch fine-tune.

Budget discipline (round-4 post-mortem: rc=124, no JSON at all): the whole
run works against one wall-clock budget (EASEVOICE_BENCH_BUDGET_SEC,
default 1500 s).  Each optional stage (GPT, RTF, e2e) runs only if enough
budget remains for a conservative estimate of its cost and records a
skip-with-reason otherwise; the JSON line is printed from a ``finally``
so a partial run still produces its number, and SIGTERM/SIGALRM (the
driver's timeout) is converted into an exception so even a hard overrun
emits whatever was measured by then.

Budget calibration: the round-3 driver run completed rc=0 at well over
1500 s of wall (cold headline compile + 450 s e2e + GPT + RTF), so the
driver tolerates at least that; 1500 s fits the full measured warm-cache
stage set (headline ~215 s + GPT ~75 s + RTF ~90 s + e2e ~320 s +
serving-path RTF ~315 s) with margin, while a cold-cache run spends the
budget on the headline compile and skips the optional stages by gate.
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

_T0 = time.monotonic()
_BUDGET = float(os.environ.get("EASEVOICE_BENCH_BUDGET_SEC", "1500"))


def _remaining() -> float:
    return _BUDGET - (time.monotonic() - _T0)


class _BenchTimeout(BaseException):
    """Raised from the SIGTERM/SIGALRM handler; BaseException so no
    intermediate ``except Exception`` swallows it before the final print."""


def _install_signal_fallback() -> None:
    def handler(signum, frame):
        raise _BenchTimeout(f"signal {signum} at {time.monotonic() - _T0:.0f}s")

    for sig in (signal.SIGTERM, signal.SIGALRM):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):  # pragma: no cover - non-main thread
            pass
    # hard fallback: raise ourselves 15 s before the budget expires so the
    # JSON gets out even if a stage estimate was wrong (the alarm interrupts
    # Python between bytecodes; long C calls delay but rarely exceed 15 s
    # once compiles are cached)
    try:
        signal.alarm(max(1, int(_BUDGET - 15 - (time.monotonic() - _T0))))
    except (ValueError, OSError):  # pragma: no cover
        pass


def build(batch_size: int, frames: int):
    import jax
    import jax.numpy as jnp
    from easevoice_trainer_tpu.models.sovits import (
        SynthesizerTrn, SovitsConfig, MultiPeriodDiscriminator)
    from easevoice_trainer_tpu.ops.stft import MelConfig, spectrogram
    from easevoice_trainer_tpu.train import sovits_step
    from easevoice_trainer_tpu.utils.config import host_cpu_init

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
    # first device-to-host transfer); train on the accelerator.  The init
    # state is disk-cached: XLA:CPU executables can never be reloaded from
    # the persistent cache (cpu_aot_loader machine-feature bug — see
    # utils/config.host_cpu_init), so the ~95 s init compile would otherwise
    # be paid cold on every driver run.  The bench needs a *valid* state,
    # not a fresh one, so caching the initialized leaves is sound; the key
    # pins every shape/dtype plus configs, and a stale entry only means a
    # different (still valid) synthetic starting point.
    # train/init_cache.py memoization (shared with the production
    # drivers).  The old ad-hoc pkl lived loose in the cache root, where
    # GlobalCFG's unkeyed-entry purge deleted it on every startup — the
    # init compile was silently re-paid on every bench run; init_states/
    # is purge-exempt.
    from easevoice_trainer_tpu.train import init_cache

    def _build_state():
        with host_cpu_init():
            st = sovits_step.create_train_state(
                jax.random.PRNGKey(0), synth, disc, hp, batch,
                steps_per_epoch=100)
            return jax.tree_util.tree_map(np.asarray, st)

    state = init_cache.memoized(
        "bench_s2",
        (repr(cfg), repr(hp), "spe=100", init_cache.batch_signature(batch)),
        _build_state, force=True)
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


def _measure_headline(batch_size: int, frames: int, n_steps: int,
                      extra: dict) -> float:
    import jax

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
    windows = 3 if _remaining() > 60 else 1
    best_dt = float("inf")
    for w in range(windows):
        jax.block_until_ready((state, metrics))
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batch,
                                  jax.random.PRNGKey(100 + w * n_steps + i))
        jax.block_until_ready((state, metrics))
        best_dt = min(best_dt, time.perf_counter() - t0)
    steps_per_sec = n_steps / best_dt

    # MFU + HBM roofline from XLA's own cost model of the compiled step
    extra["device"] = jax.devices()[0].device_kind
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
    return steps_per_sec


def _stage(extra: dict, name: str, estimate_sec: float, enabled: bool):
    """Budget gate: returns True to run the stage, else records the skip."""
    if not enabled:
        extra[f"{name}_skipped"] = "disabled by flag/env"
        return False
    rem = _remaining()
    if rem < estimate_sec:
        extra[f"{name}_skipped"] = (
            f"budget: {rem:.0f}s left < {estimate_sec:.0f}s estimate")
        return False
    return True


def _stage_gpt(extra: dict) -> None:
    t0 = time.monotonic()
    try:
        from profile_gpt import measure as measure_gpt

        g = measure_gpt(8, 256, 10)
        extra["gpt_steps_per_sec"] = g["steps_per_sec"]
        extra["gpt_step_ms"] = g["step_ms"]
        peaks = _PEAKS.get(extra.get("device", ""))
        if peaks and g.get("tflops_per_step"):
            extra["gpt_mfu_pct"] = round(
                100 * g["tflops_per_step"] * 1e12
                * g["steps_per_sec"] / peaks[0], 2)
            extra["gpt_gbytes_per_step"] = g.get("gbytes_per_step")
    except Exception as exc:                # pragma: no cover
        extra["gpt_error"] = str(exc)[:120]
    extra["gpt_stage_sec"] = round(time.monotonic() - t0, 1)


def _stage_rtf(extra: dict) -> None:
    t0 = time.monotonic()
    try:
        from rtf import measure as measure_rtf

        r = measure_rtf(250, 1)
        extra["rtf"] = r["value"]
        extra["rtf_detail"] = r["detail"]
    except Exception as exc:                # pragma: no cover
        extra["rtf_error"] = str(exc)[:120]
    extra["rtf_stage_sec"] = round(time.monotonic() - t0, 1)


def _stage_rtf_multiseg(extra: dict) -> None:
    """RTF through the full ``TTS.run`` clone path (prefill + to_batch
    bucketing + parallel_infer vocode + splice) — the serving-shaped
    number, vs the hot-loop-only ``rtf`` above."""
    t0 = time.monotonic()
    try:
        from rtf import measure_multi_segment

        m = measure_multi_segment()
        extra.setdefault("rtf_detail", {})["multi_segment"] = m
    except Exception as exc:                # pragma: no cover
        extra["rtf_multiseg_error"] = str(exc)[:120]
    extra["rtf_multiseg_stage_sec"] = round(time.monotonic() - t0, 1)


def _stage_e2e(extra: dict, cold_warm: bool):
    """BASELINE.md north star: s2+s1 fine-tune wall-clock on a 1-minute
    clone dataset through the production drivers.  One pass for the
    driver; --cold-warm (manual runs) measures both sides of the
    persistent compile cache."""
    t0 = time.monotonic()
    vs_baseline = None
    try:
        from e2e_finetune import measure, measure_cold_warm

        if cold_warm:
            e = measure_cold_warm(2)
            extra["e2e_finetune"] = e["warm"]
            extra["e2e_finetune_cold"] = e["cold"]
            ours_wall = e["warm"]
        else:
            ours_wall = measure(2)
            extra["e2e_finetune"] = ours_wall

        # ratio vs the pinned same-fixture reference-recipe measurement
        # (benchmarks/refshim/run_reference_s2.py --write-baseline)
        try:
            ref = json.load(open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE.json"))).get("measured_reference", {})
            ref_wall = ref.get("ref_s2_wall_sec")
            ours = ours_wall.get("s2_wall_sec")
            if (ref_wall and ours and ref.get("epochs") == 2
                    and ours_wall.get("epochs") == 2):
                vs_baseline = round(ref_wall / ours, 2)
                extra["vs_baseline_note"] = ref.get("caveat", "")
            elif not ref_wall:
                extra["vs_baseline_note"] = (
                    "BASELINE.json has no measured_reference; run "
                    "benchmarks/refshim/run_reference_s2.py --write-baseline")
        except Exception:
            pass
    except Exception as exc:                # pragma: no cover
        extra["e2e_error"] = str(exc)[:120]
    extra["e2e_stage_sec"] = round(time.monotonic() - t0, 1)
    return vs_baseline


def main():
    _install_signal_fallback()
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    batch_size = int(pos[0]) if len(pos) > 0 else 8
    frames = int(pos[1]) if len(pos) > 1 else 256
    n_steps = int(pos[2]) if len(pos) > 2 else 10

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))

    # enable the machine-keyed persistent compile cache BEFORE the first
    # compile: the headline stage builds train steps directly (no GlobalCFG
    # consumer on its path), and without this the most expensive compile of
    # the whole bench is re-paid cold on every driver run
    from easevoice_trainer_tpu.utils.config import GlobalCFG
    GlobalCFG()

    # warm the accelerator backend + tunnel readback path concurrently with
    # the host-CPU init compiles (the first TPU dispatch/readback through
    # the tunnel can cost minutes in a fresh process; overlapping hides it
    # behind the ~95 s init path on cold runs)
    import threading

    def _tpu_warmup():
        try:
            import jax
            import jax.numpy as jnp
            float(jax.jit(lambda: jnp.zeros(()) + 1.0)())
        except Exception:       # pragma: no cover - best-effort
            pass

    threading.Thread(target=_tpu_warmup, daemon=True).start()

    extra: dict = {"budget_sec": _BUDGET}
    steps_per_sec = None
    vs_baseline = None
    try:
        steps_per_sec = _measure_headline(batch_size, frames, n_steps, extra)
        extra["headline_stage_sec"] = round(time.monotonic() - _T0, 1)

        if _stage(extra, "gpt", 60, "--no-gpt" not in sys.argv):
            _stage_gpt(extra)
        if _stage(extra, "rtf", 60, "--no-rtf" not in sys.argv):
            _stage_rtf(extra)

        cold_warm = "--cold-warm" in sys.argv
        e2e_enabled = ("--no-e2e" not in sys.argv
                       and os.environ.get("EASEVOICE_BENCH_E2E", "1") != "0")
        if _stage(extra, "e2e", 240 * (2 if cold_warm else 1), e2e_enabled):
            vs_baseline = _stage_e2e(extra, cold_warm)
        # serving-path RTF: only when a generous budget leaves headroom
        # after e2e (manual runs set EASEVOICE_BENCH_BUDGET_SEC higher)
        if _stage(extra, "rtf_multiseg", 240, "--no-rtf" not in sys.argv):
            _stage_rtf_multiseg(extra)
    except _BenchTimeout as exc:
        extra["timeout"] = str(exc)
    except Exception as exc:                # pragma: no cover
        extra["error"] = f"{type(exc).__name__}: {exc}"[:300]
    finally:
        try:
            signal.alarm(0)
        except (ValueError, OSError):  # pragma: no cover
            pass
        extra["total_sec"] = round(time.monotonic() - _T0, 1)
        print(json.dumps({
            "metric": "s2_train_steps_per_sec",
            "value": round(steps_per_sec, 4) if steps_per_sec else None,
            "unit": "steps/s",
            "vs_baseline": vs_baseline,
            "extra": extra,
        }), flush=True)


if __name__ == "__main__":
    main()
