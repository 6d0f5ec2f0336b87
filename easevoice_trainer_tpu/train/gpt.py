"""s1 GPT fine-tune driver (the `train_gpt` cmd entrypoint body).

Behavior-compatible rebuild of the reference GPTTrain
(reference: src/train/gpt.py:27-195): configs/gpt.yaml overlaid with request
params, dataset from 6-name2semantic.tsv + 2-name2text.txt, bucketed batches,
resume from the newest epoch checkpoint, per-epoch half-precision
``{name}-e{E}.ckpt`` deployable export (reference-loadable), loss/acc/lr to
the connector per step.
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
import time
from typing import Any, Dict, Optional

import jax
import numpy as np
import yaml

import flax.serialization

from ..models.gpt import Text2SemanticDecoder, T2SConfig
from ..utils import paths
from ..utils.connector import MultiProcessOutputConnector
from ..utils.logger import logger
from ..utils import rng as rng_mod
from ..utils.response import EaseVoiceResponse, ResponseStatus
from . import ckpt as ckpt_io
from . import data as data_mod
from . import gpt_step
from .sovits import _merge_matching, _round_up, _tb_writer


@dataclasses.dataclass
class GPTTrainParams:
    """Request schema (reference: gpt.py:27-40)."""

    batch_size: int = 12
    total_epochs: int = 15
    save_every_epoch: int = 5
    if_dpo: bool = False
    if_save_latest: bool = True
    if_save_every_weights: bool = True
    gpu_ids: str = "0"
    model_path: str = ""
    train_input_dir: str = ""
    output_model_name: str = ""
    project_dir: str = ""


def get_gpt_train_dir(project_dir: str, name: Optional[str]) -> str:
    if not name:
        import datetime

        name = "gpt_" + datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    return os.path.join(project_dir, "models", "gpt_train", name)


# semantic-length buckets (25 Hz tokens; 54 s cap -> 1350)
GPT_BOUNDARIES = (0, 100, 200, 300, 400, 500, 700, 900, 1100, 1360)


class GPTTrain:
    def __init__(self, params: GPTTrainParams):
        self.params = params
        with open(paths.gpt_config_path(), encoding="utf8") as f:
            self.cfg_yaml = yaml.safe_load(f)
        self.model_cfg = T2SConfig.from_yaml_dict(self.cfg_yaml)
        opt_cfg = self.cfg_yaml.get("optimizer", {})
        train_cfg = self.cfg_yaml.get("train", {})
        self.hp = gpt_step.GPTTrainHP(
            lr=opt_cfg.get("lr", 0.01),
            lr_init=opt_cfg.get("lr_init", 1e-5),
            lr_end=opt_cfg.get("lr_end", 1e-4),
            warmup_steps=opt_cfg.get("warmup_steps", 2000),
            decay_steps=opt_cfg.get("decay_steps", 40000),
            if_dpo=params.if_dpo,
        )
        self.seed = train_cfg.get("seed", 1234)
        self.epochs = params.total_epochs
        self.batch_size = params.batch_size
        if params.if_dpo:
            # DPO doubles the forward cost; reference halves the batch
            self.batch_size = max(1, self.batch_size // 2)
        self.max_sec = self.cfg_yaml.get("data", {}).get("max_sec", 54)

        self.output_dir = get_gpt_train_dir(params.project_dir,
                                            params.output_model_name)
        self.name = os.path.basename(self.output_dir)
        self.ckpt_dir = os.path.join(self.output_dir, "logs", "ckpt")
        os.makedirs(self.ckpt_dir, exist_ok=True)

        from ..utils.config import GlobalCFG, host_cpu_init

        self.pretrained = params.model_path or GlobalCFG().gpt_path
        self.connector = MultiProcessOutputConnector()

    # ---- checkpoints -------------------------------------------------------

    def _resume_file(self) -> Optional[str]:
        pat = re.compile(r"epoch=(\d+)-step=(\d+)\.ckpt$")
        best, best_key = None, (-1, -1)
        if not os.path.isdir(self.ckpt_dir):
            return None
        for f in os.listdir(self.ckpt_dir):
            m = pat.match(f)
            if m:
                key = (int(m.group(1)), int(m.group(2)))
                if key > best_key:
                    best, best_key = f, key
        return os.path.join(self.ckpt_dir, best) if best else None

    def _save_resume(self, state, epoch: int) -> None:
        path = os.path.join(self.ckpt_dir,
                            f"epoch={epoch}-step={int(state.step)}.ckpt")
        blob = flax.serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, state))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        if self.params.if_save_latest:
            for f in os.listdir(self.ckpt_dir):
                full = os.path.join(self.ckpt_dir, f)
                if full != path and f.endswith(".ckpt"):
                    try:
                        os.remove(full)
                    except OSError:
                        pass

    def _export_weights(self, state, epoch: int) -> str:
        path = os.path.join(self.output_dir, f"{self.name}-e{epoch}.ckpt")
        params = jax.tree_util.tree_map(
            np.asarray, gpt_step.params_tree(state))
        ckpt_io.export_gpt_weights(params, path, config=self.cfg_yaml,
                                   info=f"GPT-e{epoch}")
        return path

    # ---- main loop ----------------------------------------------------------

    def train(self) -> EaseVoiceResponse:
        t0 = time.time()
        # multi-host bootstrap first (no-op single-host); see
        # parallel/distributed.py (reference: src/train/gpt.py:154-156)
        from ..parallel import distributed

        distributed.maybe_initialize()
        dataset = data_mod.GPTDataset(self.params.train_input_dir,
                                      max_sec=self.max_sec)
        batcher = data_mod.BucketBatcher(
            dataset.lengths, self.batch_size, boundaries=GPT_BOUNDARIES,
            seed=self.seed)
        max_ph = _round_up(
            max(len(p) for (_, p, _) in dataset.items), 16)

        from ..utils.config import GlobalCFG, host_cpu_init
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if GlobalCFG().is_half else None
        model = Text2SemanticDecoder(self.model_cfg, dtype=dtype)
        first = batcher.epoch_batches(0)[0]
        example = data_mod.collate_gpt(
            [dataset.load_item(i) for i in first[1]], max_ph,
            _round_up(batcher.padded_frames(first[0]), 2))
        # disk-memoized deterministic init — same rationale as the s2
        # trainer (train/init_cache.py): skips the unpersistable XLA:CPU
        # init compile on every fresh trainer subprocess, bit-exactly.
        from . import init_cache

        def _build_state():
            with host_cpu_init():
                st = gpt_step.create_train_state(
                    jax.random.PRNGKey(self.seed), model, self.hp, example)
                return jax.tree_util.tree_map(np.asarray, st)

        state = init_cache.memoized(
            "s1_init",
            (self.seed, repr(self.model_cfg), repr(self.hp), str(dtype),
             init_cache.batch_signature(example)),
            _build_state)

        start_epoch = 1
        resume = self._resume_file()
        if resume:
            try:
                with open(resume, "rb") as f:
                    state = flax.serialization.from_bytes(state, f.read())
                start_epoch = int(
                    re.search(r"epoch=(\d+)", resume).group(1)) + 1
                logger.info("resumed from %s", resume)
            except Exception as e:
                logger.warning("resume failed (%s)", e)
        if start_epoch == 1 and os.path.exists(self.pretrained):
            tree, unmatched = ckpt_io.load_gpt_pretrained(self.pretrained)
            state = gpt_step.with_params_tree(
                state, _merge_matching(gpt_step.params_tree(state), tree))
            logger.info("loaded pretrained GPT %s (%d unmatched)",
                        self.pretrained, len(unmatched))

        # dp x tp over every visible chip (EASEVOICE_DP=auto|off|N,
        # EASEVOICE_TP=N for Megatron-style tensor parallelism — the same
        # specs the driver dryrun exercises, parallel/gpt_sharding.py)
        from .. import parallel

        mesh = parallel.train_mesh()
        if mesh is not None:
            logger.info("mesh: data=%d x model=%d",
                        parallel.local_batch_multiple(mesh),
                        parallel.model_parallel_size(mesh))
            if parallel.model_parallel_size(mesh) > 1:
                from ..parallel.gpt_sharding import gpt_packed_specs

                pspecs = gpt_packed_specs(state.arena)
                state = state.replace(
                    params={k: distributed.place_global(v, mesh, pspecs[k])
                            for k, v in state.params.items()},
                    opt_state=distributed.replicate_global(
                        state.opt_state, mesh),
                    step=distributed.replicate_global(state.step, mesh))
            else:
                state = distributed.replicate_global(state, mesh)
        else:
            state = jax.device_put(state, jax.devices()[0])
        step_fn = jax.jit(gpt_step.make_train_step(model, self.hp),
                          donate_argnums=(0,))
        writer = _tb_writer(os.path.join(paths.tb_log_dir(), self.name))
        global_step = int(jax.device_get(state.step))
        last: Dict[str, Any] = {}

        for epoch in range(start_epoch, self.epochs + 1):
            for bucket_id, idxs in batcher.epoch_batches(epoch):
                if mesh is not None:
                    idxs = parallel.wrap_pad_indices(
                        idxs, parallel.local_batch_multiple(mesh))
                    idxs = [idxs[r] for r in
                            distributed.process_local_rows(len(idxs), mesh)]
                batch = data_mod.collate_gpt(
                    [dataset.load_item(i) for i in idxs], max_ph,
                    _round_up(batcher.padded_frames(bucket_id), 2))
                if self.params.if_dpo:
                    from ..models.gpt.dpo import make_reject_y

                    rej, rej_lens = make_reject_y(
                        batch["semantic_ids"], batch["semantic_ids_len"],
                        np.random.default_rng(self.seed + global_step),
                        max_len=batch["semantic_ids"].shape[1])
                    batch["reject_semantic_ids"] = rej
                    batch["reject_semantic_ids_len"] = rej_lens
                if mesh is not None:
                    batch = distributed.shard_batch_global(batch, mesh)
                rng = jax.random.fold_in(rng_mod.fast_key(self.seed),
                                         global_step)
                state, metrics = step_fn(state, batch, rng)
                global_step += 1
                if global_step % 10 == 0:
                    last = {k: float(v) for k, v in metrics.items()}
                    self.connector.write_loss(
                        global_step, last["loss"],
                        other={"acc": last["acc"], "lr": 0.002,
                               "epoch": epoch})
                    if writer:
                        for k, v in last.items():
                            writer.add_scalar(k, v, global_step)

            if ((epoch % self.params.save_every_epoch == 0
                    or epoch == self.epochs) and distributed.is_primary()):
                host = jax.device_get(state)
                self._save_resume(host, epoch)
                if self.params.if_save_every_weights:
                    self._export_weights(host, epoch)
            if distributed.is_primary():
                self.connector.write_session_data(
                    {"progress": f"{epoch}/{self.epochs}", "epoch": epoch})

        host = jax.device_get(state)
        final = self._export_weights(host, self.epochs) \
            if distributed.is_primary() else ""
        if writer:
            writer.close()
        return EaseVoiceResponse(
            ResponseStatus.SUCCESS, "train gpt success",
            data={"model_path": final, "global_step": int(host.step),
                  "elapsed_sec": round(time.time() - t0, 2), **last})
