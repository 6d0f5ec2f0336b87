"""s2 SoVITS fine-tune driver (the `train_sovits` cmd entrypoint body).

Behavior-compatible rebuild of the reference SovitsTrain
(reference: src/train/sovits.py:37-624):

* config = configs/s2.json overlaid with the request params;
* data from the normalize output dir (2-name2text / 4-cnhubert / 5-wav32k);
* resume from ``logs/{G,D}_latest`` when present, else load the pretrained
  s2G/s2D torch checkpoints;
* loss line to the connector every ``log_interval`` steps (10), TensorBoard
  scalars every 5;
* per ``save_every_epoch``: resume checkpoints + half-precision deployable
  ``{name}_e{E}_s{S}.pth`` export (reference-loadable).

TPU-native mechanics: one jitted GAN step per length bucket (static shapes),
host-side data loading, native flax-msgpack resume checkpoints alongside the
torch-format deployable export.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

import flax.serialization

from ..models.sovits import SynthesizerTrn, SovitsConfig, MultiPeriodDiscriminator
from ..ops.stft import MelConfig
from ..utils import paths
from ..utils.connector import MultiProcessOutputConnector
from ..utils.logger import logger
from ..utils import rng as rng_mod
from ..utils.response import EaseVoiceResponse, ResponseStatus
from . import ckpt as ckpt_io
from . import data as data_mod
from . import sovits_step

TRAIN_LOGS_PATH = "logs"


@dataclasses.dataclass
class SovitsTrainParams:
    """Request schema (reference: sovits.py:37-50)."""

    batch_size: int = 12
    total_epochs: int = 8
    text_low_lr_rate: float = 0.4
    pretrained_s2G: str = ""
    pretrained_s2D: str = ""
    if_save_latest: bool = True
    if_save_every_weights: bool = True
    save_every_epoch: int = 5
    gpu_ids: str = "0"           # accepted for API parity; TPU ignores it
    train_input_dir: str = ""
    output_model_name: str = ""
    project_dir: str = ""


def get_sovits_train_dir(project_dir: str, name: Optional[str]) -> str:
    if not name:
        import datetime

        name = "sovits_" + datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    return os.path.join(project_dir, "models", "sovits_train", name)


class SovitsTrain:
    def __init__(self, params: SovitsTrainParams):
        self.params = params
        with open(paths.s2_config_path(), encoding="utf8") as f:
            self.raw_cfg = json.load(f)
        train_cfg = self.raw_cfg.get("train", {})
        data_cfg = self.raw_cfg.get("data", {})

        self.model_cfg = SovitsConfig.from_json_dict(self.raw_cfg)
        self.hp = sovits_step.S2TrainHP(
            learning_rate=train_cfg.get("learning_rate", 1e-4),
            betas=tuple(train_cfg.get("betas", (0.8, 0.99))),
            eps=train_cfg.get("eps", 1e-9),
            lr_decay=train_cfg.get("lr_decay", 0.999875),
            segment_size=train_cfg.get("segment_size", 20480),
            c_mel=train_cfg.get("c_mel", 45),
            c_kl=train_cfg.get("c_kl", 1.0),
            text_low_lr_rate=params.text_low_lr_rate,
        )
        self.mel_cfg = MelConfig(
            sampling_rate=data_cfg.get("sampling_rate", 32000),
            n_fft=data_cfg.get("filter_length", 2048),
            hop_length=data_cfg.get("hop_length", 640),
            win_length=data_cfg.get("win_length", 2048),
            n_mels=data_cfg.get("n_mel_channels", 128),
            fmin=data_cfg.get("mel_fmin", 0.0),
            fmax=data_cfg.get("mel_fmax", None),
        )
        self.epochs = params.total_epochs
        self.batch_size = params.batch_size
        self.log_interval = train_cfg.get("log_interval", 10)
        self.seed = train_cfg.get("seed", 1234)

        self.output_dir = get_sovits_train_dir(params.project_dir,
                                               params.output_model_name)
        self.name = os.path.basename(self.output_dir)
        self.train_logs_dir = os.path.join(self.output_dir, TRAIN_LOGS_PATH)
        os.makedirs(self.train_logs_dir, exist_ok=True)

        from ..utils.config import GlobalCFG, host_cpu_init

        cfg = GlobalCFG()
        self.pretrained_s2G = params.pretrained_s2G or cfg.sovits_path
        default_d = cfg.sovits_path.replace("s2G", "s2D")
        self.pretrained_s2D = params.pretrained_s2D or default_d

        self.connector = MultiProcessOutputConnector()

    # ---- checkpoint helpers -------------------------------------------------

    def _resume_path(self, which: str) -> str:
        return os.path.join(self.train_logs_dir, f"{which}_latest.ckpt")

    def _save_resume(self, state: sovits_step.S2TrainState, epoch: int) -> None:
        blob = flax.serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, state))
        meta = {"epoch": epoch, "step": int(state.step)}
        for path, payload in ((self._resume_path("G"), blob),):
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
        with open(os.path.join(self.train_logs_dir, "resume.json"), "w") as f:
            json.dump(meta, f)

    def _try_resume(self, state: sovits_step.S2TrainState):
        path = self._resume_path("G")
        meta_path = os.path.join(self.train_logs_dir, "resume.json")
        if not (os.path.exists(path) and os.path.exists(meta_path)):
            return state, 1
        try:
            with open(path, "rb") as f:
                state = flax.serialization.from_bytes(state, f.read())
            with open(meta_path) as f:
                meta = json.load(f)
            logger.info("resumed from %s (epoch %s)", path, meta["epoch"])
            return state, meta["epoch"] + 1
        except Exception as e:
            logger.warning("resume failed (%s); starting fresh", e)
            return state, 1

    def _load_pretrained(self, state: sovits_step.S2TrainState):
        if os.path.exists(self.pretrained_s2G):
            tree, unmatched = ckpt_io.load_sovits_pretrained(self.pretrained_s2G)
            params_g = _merge_matching(sovits_step.params_tree(state, "g"), tree)
            state = sovits_step.with_params_tree(state, params_g, "g")
            logger.info("loaded pretrained s2G %s (%d unmatched keys)",
                        self.pretrained_s2G, len(unmatched))
        if os.path.exists(self.pretrained_s2D):
            tree, unmatched = ckpt_io.load_sovits_discriminator(
                self.pretrained_s2D)
            params_d = _merge_matching(sovits_step.params_tree(state, "d"), tree)
            state = sovits_step.with_params_tree(state, params_d, "d")
            logger.info("loaded pretrained s2D %s (%d unmatched keys)",
                        self.pretrained_s2D, len(unmatched))
        return state

    def _export_weights(self, state, epoch: int) -> str:
        name = f"{self.name}_e{epoch}_s{int(state.step)}"
        path = os.path.join(self.output_dir, f"{name}.pth")
        params_g = jax.tree_util.tree_map(
            np.asarray, sovits_step.params_tree(state, "g"))
        ckpt_io.export_sovits_weights(
            params_g, path, config=self.raw_cfg,
            info=f"{epoch}epoch_{int(state.step)}iteration")
        return path

    # ---- main loop ----------------------------------------------------------

    def train(self) -> EaseVoiceResponse:
        t_start = time.time()
        # join the multi-host world first (no-op single-host): afterwards
        # jax.devices() is global and the data mesh spans hosts
        # (reference DDP bootstrap: src/train/sovits.py:219-224)
        from ..parallel import distributed

        distributed.maybe_initialize()
        dataset = data_mod.S2Dataset(
            self.params.train_input_dir, hop_length=self.mel_cfg.hop_length,
            sampling_rate=self.mel_cfg.sampling_rate,
            n_fft=self.mel_cfg.n_fft, win_length=self.mel_cfg.win_length)
        batcher = data_mod.BucketBatcher(
            dataset.lengths, self.batch_size, seed=self.seed)
        first_epoch_batches = batcher.epoch_batches(0)
        steps_per_epoch = max(len(first_epoch_batches), 1)
        text_cap = _round_up(max(len(e.phoneme_ids)
                                 for e in dataset.examples), 16)

        # bf16 compute on TPU (is_half), fp32 params; fp32 everywhere on CPU
        from ..utils.config import GlobalCFG, host_cpu_init
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if GlobalCFG().is_half else None
        synth = SynthesizerTrn(self.model_cfg, dtype=dtype)
        disc = MultiPeriodDiscriminator(dtype=dtype)

        bucket_id, idxs = first_epoch_batches[0]
        example = data_mod.collate_s2(
            [dataset.load_item(i) for i in idxs],
            batcher.padded_frames(bucket_id), text_cap,
            hop=self.mel_cfg.hop_length)

        # disk-memoized deterministic init (train/init_cache.py): the
        # XLA:CPU init compile is minutes on a slow host core and can never
        # ride the persistent executable cache; the *result* is a pure
        # function of (seed, configs, shapes), so this is bit-exact.
        # steps_per_epoch is excluded from the key: it only parameterizes
        # the LR schedule, never the init values
        # (tests/test_init_cache.py::test_s2_init_independent_of_steps_per_epoch).
        from . import init_cache

        def _build_state():
            with host_cpu_init():
                st = sovits_step.create_train_state(
                    jax.random.PRNGKey(self.seed), synth, disc, self.hp,
                    example, steps_per_epoch=steps_per_epoch)
                return jax.tree_util.tree_map(np.asarray, st)

        state = init_cache.memoized(
            "s2_init",
            (self.seed, repr(self.model_cfg), repr(self.hp), str(dtype),
             init_cache.batch_signature(example)),
            _build_state)

        state, start_epoch = self._try_resume(state)
        if start_epoch == 1:
            state = self._load_pretrained(state)

        # data-parallel over every visible chip (EASEVOICE_DP=auto|off|N);
        # XLA inserts the gradient psum from the shardings — no DDP code
        from .. import parallel

        mesh = parallel.data_parallel_mesh()
        if mesh is not None:
            logger.info("data-parallel over %d devices",
                        parallel.local_batch_multiple(mesh))
            state = distributed.replicate_global(state, mesh)
        else:
            state = jax.device_put(state, jax.devices()[0])

        step_fn = jax.jit(sovits_step.make_train_step(
            synth, disc, self.hp, self.mel_cfg,
            steps_per_epoch=steps_per_epoch), donate_argnums=(0,))

        writer = _tb_writer(os.path.join(paths.tb_log_dir(), self.name))
        global_step = int(jax.device_get(state.step))
        last_metrics: Dict[str, Any] = {}

        for epoch in range(start_epoch, self.epochs + 1):
            for bucket_id, idxs in batcher.epoch_batches(epoch):
                if mesh is not None:
                    idxs = parallel.wrap_pad_indices(
                        idxs, parallel.local_batch_multiple(mesh))
                    # multi-host: load only the rows this host's devices
                    # own (identity when single-process)
                    idxs = [idxs[r] for r in
                            distributed.process_local_rows(len(idxs), mesh)]
                batch = data_mod.collate_s2(
                    [dataset.load_item(i) for i in idxs],
                    batcher.padded_frames(bucket_id), text_cap,
                    hop=self.mel_cfg.hop_length)
                if mesh is not None:
                    batch = distributed.shard_batch_global(batch, mesh)
                rng = jax.random.fold_in(
                    rng_mod.fast_key(self.seed), global_step)
                state, metrics = step_fn(state, batch, rng)
                global_step += 1

                if global_step % self.log_interval == 0:
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    self.connector.write_loss(
                        global_step, last_metrics["loss/g/total"],
                        other={
                            "loss/g/total": last_metrics["loss/g/total"],
                            "loss/d/total": last_metrics["loss/d/total"],
                            "learning_rate": self.hp.learning_rate
                            * (self.hp.lr_decay ** (epoch - 1)),
                        })
                if writer and global_step % 5 == 0:
                    vals = {k: float(v) for k, v in metrics.items()}
                    for k, v in vals.items():
                        writer.add_scalar(k, v, global_step)

            if ((epoch % self.params.save_every_epoch == 0
                 or epoch == self.epochs) and distributed.is_primary()):
                host_state = jax.device_get(state)
                self._save_resume(host_state, epoch)
                if self.params.if_save_every_weights:
                    self._export_weights(host_state, epoch)
            if distributed.is_primary():
                self.connector.write_session_data(
                    {"progress": f"{epoch}/{self.epochs}", "epoch": epoch})

        host_state = jax.device_get(state)
        final_path = self._export_weights(host_state, self.epochs) \
            if distributed.is_primary() else ""
        if writer:
            writer.close()
        return EaseVoiceResponse(
            ResponseStatus.SUCCESS, "train sovits success",
            data={
                "model_path": final_path,
                "global_step": int(host_state.step),
                "elapsed_sec": round(time.time() - t_start, 2),
                **{k: v for k, v in last_metrics.items()},
            })


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _merge_matching(current, loaded):
    """Overlay loaded params where names+shapes match (shape-checked
    per-key fallback, reference: ckpt.py:13-54)."""
    cur_flat = ckpt_io.flatten_tree(current)
    new_flat = ckpt_io.flatten_tree(loaded)
    merged = {}
    skipped = 0
    for k, v in cur_flat.items():
        cand = new_flat.get(k)
        if cand is not None and tuple(cand.shape) == tuple(v.shape):
            merged[k] = np.asarray(cand, np.float32)
        else:
            merged[k] = v
            if cand is not None:
                skipped += 1
    if skipped:
        logger.warning("pretrained merge: %d shape-mismatched keys kept "
                       "current init", skipped)
    return ckpt_io.unflatten_tree(merged)


def _tb_writer(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter

        os.makedirs(log_dir, exist_ok=True)
        return SummaryWriter(log_dir)
    except Exception:
        try:
            from tensorboardX import SummaryWriter

            os.makedirs(log_dir, exist_ok=True)
            return SummaryWriter(log_dir)
        except Exception:
            logger.warning("tensorboard unavailable; scalars not written")
            return None
