"""North-star e2e harness: s2+s1 fine-tune wall-clock on a 1-minute
clone dataset (BASELINE.md: ">=5x faster than the reference GPU recipe on
v5e-8"; the reference publishes no absolute numbers, so the recorded
metric is our own wall-clock, tracked round over round).

Builds a synthetic normalize output (15 x 4 s clips = 60 s of audio at
32 kHz with real artifact formats), then runs the PRODUCTION drivers
(SovitsTrain + GPTTrain, real configs/s2.json + configs/gpt.yaml geometry)
for ``epochs`` epochs each and reports wall-clock.

``measure_cold_warm`` runs the whole thing twice in one process: the
first pass pays whatever compile state the persistent XLA cache holds
("cold" on a fresh checkout), the second pass constructs fresh trainer
objects whose jits fall through the in-process cache to the persistent
one — the deserialization-only wall-clock a user sees on every run
after the first.  Cache hit/request counters (jax.monitoring events)
are reported per pass so the split is verifiable, not inferred.

Usage: python benchmarks/e2e_finetune.py [epochs] [--json] [--cold-warm]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(root: str, n_clips: int = 15, clip_sec: float = 4.0,
                  seed: int = 0) -> str:
    from easevoice_trainer_tpu.utils import audio_io

    rng = np.random.default_rng(seed)
    norm = os.path.join(root, "norm")
    for d in ("4-cnhubert", "5-wav32k", "3-bert"):
        os.makedirs(os.path.join(norm, d), exist_ok=True)
    lines, sem_lines = [], []
    for i in range(n_clips):
        name = f"clip{i}.wav"
        frames = int(clip_sec * 32000) // 640  # spec frames (hop 640)
        wav = rng.uniform(-0.4, 0.4, frames * 640).astype(np.float32)
        audio_io.write_wav(os.path.join(norm, "5-wav32k", name), wav, 32000)
        t50 = 2 * ((frames + 1) // 2)
        np.save(os.path.join(norm, "4-cnhubert", name + ".npy"),
                rng.normal(size=(t50, 768)).astype(np.float32))
        phones = ["AA1", "b", "a1", "SP", "."] * 8
        lines.append(f"{name}\t{' '.join(phones)}\t1\ttext")
        sem = rng.integers(0, 1024, frames // 2)
        sem_lines.append(f"{name}\t{' '.join(map(str, sem))}")
        np.save(os.path.join(norm, "3-bert", name + ".npy"),
                rng.normal(size=(len(phones), 1024)).astype(np.float32))
    with open(os.path.join(norm, "2-name2text.txt"), "w") as f:
        f.write("\n".join(lines))
    with open(os.path.join(norm, "6-name2semantic.tsv"), "w") as f:
        f.write("item_name\tsemantic_audio\n" + "\n".join(sem_lines))
    return norm


class _CacheCounters:
    """Tallies persistent-compile-cache events for one measurement pass."""

    _installed = None

    def __init__(self):
        self.hits = 0
        self.requests = 0
        self.saved_sec = 0.0

    @classmethod
    def install(cls) -> "_CacheCounters":
        import jax

        if cls._installed is None:
            cls._installed = cls()

            def on_event(event, **kw):
                c = cls._installed
                if event == "/jax/compilation_cache/cache_hits":
                    c.hits += 1
                elif event == "/jax/compilation_cache/compile_requests_use_cache":
                    c.requests += 1

            def on_duration(event, duration, **kw):
                if event == "/jax/compilation_cache/compile_time_saved_sec":
                    cls._installed.saved_sec += duration

            jax.monitoring.register_event_listener(on_event)
            jax.monitoring.register_event_duration_secs_listener(on_duration)
        else:
            inst = cls._installed
            inst.hits = inst.requests = 0
            inst.saved_sec = 0.0
        return cls._installed

    def snapshot(self) -> dict:
        return {"cache_hits": self.hits, "cache_requests": self.requests,
                "compile_sec_saved": round(self.saved_sec, 1)}


def measure(epochs: int = 2) -> dict:
    root = tempfile.mkdtemp(prefix="ev_e2e_")
    try:
        norm = build_dataset(root)
        project = os.path.join(root, "proj")
        os.makedirs(project, exist_ok=True)

        from easevoice_trainer_tpu.train.sovits import (SovitsTrain,
                                                        SovitsTrainParams)
        from easevoice_trainer_tpu.train.gpt import GPTTrain, GPTTrainParams

        counters = _CacheCounters.install()
        out = {}
        t0 = time.time()
        resp = SovitsTrain(SovitsTrainParams(
            batch_size=8, total_epochs=epochs, save_every_epoch=epochs,
            train_input_dir=norm, output_model_name="e2e_s2",
            project_dir=project)).train()
        out["s2_wall_sec"] = round(time.time() - t0, 2)
        out["s2_ok"] = bool(resp.ok)
        out["s2_steps"] = int(resp.data.get("global_step", 0)) if resp.ok else 0

        t1 = time.time()
        resp = GPTTrain(GPTTrainParams(
            batch_size=8, total_epochs=epochs, save_every_epoch=epochs,
            model_path="/none", train_input_dir=norm,
            output_model_name="e2e_s1", project_dir=project)).train()
        out["s1_wall_sec"] = round(time.time() - t1, 2)
        out["s1_ok"] = bool(resp.ok)
        out["s1_steps"] = int(resp.data.get("global_step", 0)) if resp.ok else 0
        out["total_wall_sec"] = round(time.time() - t0, 2)
        out["epochs"] = epochs
        out.update(counters.snapshot())
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def measure_cold_warm(epochs: int = 2) -> dict:
    """Two passes; the second one's jits resolve through the persistent
    compile cache, giving the steady-state ("every run after the first")
    wall-clock that BASELINE.md's north star actually describes."""
    cold = measure(epochs)
    warm = measure(epochs)
    return {"cold": cold, "warm": warm}


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    epochs = int(pos[0]) if pos else 2
    out = (measure_cold_warm(epochs) if "--cold-warm" in sys.argv
           else measure(epochs))
    if "--json" in sys.argv:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
