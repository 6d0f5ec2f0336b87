"""Run the REFERENCE s2 recipe (torch, CPU, gloo world_size=1) on the same
synthetic 1-minute fixture dataset as benchmarks/e2e_finetune.py, and time it.

This pins the `vs_baseline` comparison point BASELINE.md asks for:
the reference publishes no numbers, so we measure its own trainer
(/root/reference/src/train/sovits.py — the gloo CPU path at
sovits.py:219-224 is the only one runnable in this environment) on the
identical dataset/epochs/batch our e2e harness uses.

Caveats (recorded with the number):
- CPU-only torch (this host exposes no CUDA) on a single core vs our TPU
  v5e chip — a cross-hardware ratio, not the GPU recipe.
- s1 (GPT) reference needs pytorch_lightning, absent here → s2-only.

The reference tree is staged to a writable /tmp copy (it writes tb_logs/
under its own root, which is read-only at /root/reference), and the
`ffmpeg`-python module it imports is satisfied by the shim next to this
file.  Nothing is copied into the repo.

Usage: python benchmarks/refshim/run_reference_s2.py [epochs] [--json]
           [--write-baseline]

``--write-baseline`` pins the measurement into the repo's
``BASELINE.json`` under the ``measured_reference`` key — exactly what
``bench.py``'s ``vs_baseline`` reads (it stays null otherwise).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REFERENCE = os.environ.get("EASEVOICE_REFERENCE", "/root/reference")


def stage_reference(dst: str) -> str:
    """Copy the read-only reference checkout somewhere writable."""
    ref = os.path.join(dst, "refrun")
    shutil.copytree(REFERENCE, ref,
                    ignore=shutil.ignore_patterns(".git", "docs", "*.md"))
    return ref


def build_fixture(root: str, epochs: int) -> str:
    """Same dataset as e2e_finetune.build_dataset, with the ssl features
    re-encoded the way the reference loads them (torch .pt, (1, 768, T))."""
    import numpy as np
    import torch

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    from e2e_finetune import build_dataset

    norm = build_dataset(root)
    ssl_dir = os.path.join(norm, "4-cnhubert")
    for name in os.listdir(ssl_dir):
        if not name.endswith(".npy"):
            continue
        arr = np.load(os.path.join(ssl_dir, name))        # (T, 768)
        t = torch.from_numpy(arr.T[None])                  # (1, 768, T)
        torch.save(t, os.path.join(ssl_dir, name[:-4] + ".pt"))
        os.remove(os.path.join(ssl_dir, name))
    return norm


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    epochs = int(pos[0]) if pos else 2

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    root = tempfile.mkdtemp(prefix="ev_ref_")
    try:
        ref = stage_reference(root)
        norm = build_fixture(root, epochs)
        project = os.path.join(root, "proj")
        os.makedirs(project, exist_ok=True)

        # the reference resolves every path from its own checkout root
        sys.path.insert(0, ref)
        sys.path.insert(0, HERE)          # provides the `ffmpeg` module
        os.chdir(ref)

        from src.train.sovits import SovitsTrain, SovitsTrainParams

        t0 = time.time()
        out_obj = SovitsTrain(SovitsTrainParams(
            batch_size=8, total_epochs=epochs, save_every_epoch=epochs,
            train_input_dir=norm, output_model_name="ref_s2",
            project_dir=project)).train()
        wall = round(time.time() - t0, 2)

        from src.train.sovits import GLOBAL_STEP
        out = {
            "ref_s2_wall_sec": wall,
            "ref_s2_steps": int(GLOBAL_STEP),
            "epochs": epochs,
            "device": "cpu-torch",
            "model_dir": str(getattr(out_obj, "model_path", "")),
            "caveat": "reference torch CPU (no CUDA on host, 1 core) vs "
                      "repo TPU; s2 only (s1 needs pytorch_lightning)",
        }
        if "--write-baseline" in sys.argv:
            import platform

            out["host"] = platform.node()
            baseline_path = os.path.join(REPO, "BASELINE.json")
            with open(baseline_path) as f:
                baseline = json.load(f)
            baseline["measured_reference"] = out
            tmp = baseline_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(baseline, f, indent=2)
            os.replace(tmp, baseline_path)
            print(f"wrote measured_reference into {baseline_path}",
                  file=sys.stderr)
        if "--json" in sys.argv:
            print(json.dumps(out))
        else:
            for k, v in out.items():
                print(f"{k}: {v}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
