"""Stage I trainer: segment-level audio-visual contrastive pre-training.

Capability parity with ref:
model/modules/feat_extractors/train_clip_src/training/{train_clip,train}.py —

- AVCLIP InfoNCE training with AdamW (weight-decay exempt gains/biases,
  ref: train_clip.py:267-278), cosine LR with warmup (ref: scheduler.py:43-53),
  logit-scale clamping every step
- optional cross-replica negatives via differentiable all_gather on the
  'data' mesh axis (shard_map; ref: open_clip/model.py:492-497)
- the zero-shot **shifted-window retrieval probe** as the validation metric
  ('precision', ref: train.py:261-402,549-592): unfold S segment features
  into windows of W, match windows across modalities, precision = fraction
  of correctly matched shifts
- epoch_best / epoch_latest checkpoints on the probe metric, early stopping
"""
from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synchformer_tpu.data.pipeline import SyncDataLoader, batch_to_device
from synchformer_tpu.data.transforms import SyncPipelineConfig
from synchformer_tpu.models.presets import build_avclip
from synchformer_tpu.ops.mel import MelSpectrogramConfig, log_mel_spectrogram
from synchformer_tpu.ops.video import prepare_video_batch
from synchformer_tpu.parallel.mesh import (
    batch_sharding,
    commit_to_mesh,
    make_mesh,
    param_shardings,
    replicated,
    set_active_data_mesh,
)
from synchformer_tpu.registry import instantiate_from_config
from synchformer_tpu.train.metrics import gather_dict
from synchformer_tpu.train.state import SyncTrainState, make_lr_schedule, make_optimizer
from synchformer_tpu.train.step import make_avclip_eval_step, make_avclip_train_step
from synchformer_tpu.utils.checkpoint import CheckpointManager
from synchformer_tpu.utils.logger import EarlyStopper, ExperimentLogger, Meter


def shifted_window_predictions(afeat: jnp.ndarray, vfeat: jnp.ndarray, window: int):
    """Sliding windows of size W over the segment axis; for each window in A
    find the most similar window in V and vice versa
    (ref: training/train.py:549-579)."""
    b, s, d = afeat.shape
    n_shifts = s - window + 1
    idx = np.arange(n_shifts)[:, None] + np.arange(window)[None, :]
    a_folds = afeat[:, idx].reshape(b, n_shifts, window * d)
    v_folds = vfeat[:, idx].reshape(b, n_shifts, window * d)
    sim = jnp.einsum("bnd,bmd->bnm", a_folds, v_folds)
    return jnp.argmax(sim, axis=-2), jnp.argmax(sim, axis=-1)  # (B, n_shifts)


def zero_shot_precision(afeat, vfeat, window: int) -> jnp.ndarray:
    """Fraction of windows matched to the in-sync (diagonal) shift
    (ref: training/train.py:581-592 + eval_one_example)."""
    preds_a, preds_v = shifted_window_predictions(afeat, vfeat, window)
    gt = jnp.arange(preds_a.shape[1])[None]
    return ((preds_a == gt).mean() + (preds_v == gt).mean()) / 2.0


class AVCLIPTrainer:
    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        training = cfg.get("training", {})
        data = cfg.get("data", {})
        self.seed = int(training.get("seed", 1337))
        self.batch_size = int(training.get("base_batch_size", 2))
        self.num_epochs = int(training.get("num_epochs", 100))
        self.patience = int(training.get("patience", 20))
        self.zero_shot_window = int(training.get("zero_shot_window", 8))
        compute_dtype = (jnp.bfloat16 if training.get("precision", "amp") == "amp"
                         else jnp.float32)
        self.compute_dtype = compute_dtype

        self.mesh = make_mesh(n_model=int(training.get("model_parallel", 1)))
        # pallas entry points shard_map over this mesh's 'data' axis
        set_active_data_mesh(self.mesh)
        n_data = self.mesh.shape["data"]
        assert self.batch_size % n_data == 0, \
            f"batch_size {self.batch_size} must divide over data-parallel size {n_data}"

        n_segments = int(data.get("n_segments_train", data.get("n_segments", 14)))
        # model dispatch: AVCLIP (InfoNCE, default) or MultilevelMoCoCLIP
        # (momentum encoders + queues, ref: open_clip/model.py:585-871) —
        # both selectable via cfg.model.target like the reference
        self.is_moco = "MoCoCLIP" in str(cfg.get("model", {}).get("target", ""))
        if "model" in cfg and "target" in cfg.get("model", {}):
            self.model = instantiate_from_config(cfg["model"])
        else:
            self.model = build_avclip(
                n_segments_train=n_segments, dtype=compute_dtype,
                gather_for_loss=bool(cfg.get("model", {}).get("params", {})
                                     .get("gather_for_loss", False)))
        self.alpha = float(training.get("alpha", 0.0))
        self._n_segments = n_segments

        self.pipe_cfg = SyncPipelineConfig(
            n_segments=n_segments,
            crop_len_sec=float(data.get("crop_len_sec", 5)),
            step_size_seg=float(data.get("step_size_seg", 0.5)),
            input_size=int(data.get("input_size", 224)),
            segment_size_vframes=int(data.get("segment_size_vframes", 16)),
            do_offset=False,  # Stage I trains on in-sync segments
            audio_jitter_sec=float(data.get("audio_jitter_sec", 0.0)),
            p_horizontal_flip=float(data.get("p_horizontal_flip", 0.5)),
            p_audio_aug=float(data.get("p_audio_aug", 0.0)),
        )
        max_spec_t = (cfg.get("model", {}).get("params", {})
                      .get("afeat_extractor", {}).get("params", {})
                      .get("max_spec_t", 66))
        self.mel_cfg = MelSpectrogramConfig(max_spec_t=int(max_spec_t))

        lr = float(training.get("learning_rate", 1e-4))
        total_steps = int(training.get("total_steps", 100_000))
        warmup = int(training.get("warmup", 1000))
        self.schedule = make_lr_schedule("cosine", lr, warmup, total_steps)
        self._lr = lr
        self._wd = float(training.get("weight_decay", 0.2))
        self._clip = training.get("max_clip_norm", 1.0)

        logdir = cfg.get("logging", {}).get("logdir", "./logs/avclip_models")
        self.logger = ExperimentLogger(
            logdir, exp_name=cfg.get("logging", {}).get("exp_name"),
            cfg=cfg if isinstance(cfg, dict) else None,
            is_master=jax.process_index() == 0,
            log_code_state=bool(cfg.get("logging", {}).get("log_code_state", False)),
            # Stage I is the reference's primary wandb consumer
            # (ref: train_clip.py wandb path, utils/logger.py:41-53)
            use_wandb=bool(cfg.get("logging", {}).get("use_wandb", False)))
        self.ckpt = CheckpointManager(str(self.logger.logdir / "ckpts"))
        self.log_frequency = int(cfg.get("logging", {}).get("log_frequency", 20))
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------
    def _make_tx(self, params):
        # AdamW with no weight decay on 1-D params (gains/biases)
        # (ref: train_clip.py:267-278)
        mask = jax.tree.map(lambda p: p.ndim >= 2, params)
        return make_optimizer("adamw", lr=self.schedule, weight_decay=self._wd,
                              max_clip_norm=self._clip, weight_decay_mask=mask)

    def _device_prep(self, batch, train: bool, rng=None):
        vis = prepare_video_batch(batch["video"], rng=rng, train=train,
                                  p_horizontal_flip=self.pipe_cfg.p_horizontal_flip,
                                  dtype=self.compute_dtype)
        pcm = batch["audio"]
        p_aug = self.pipe_cfg.p_audio_aug
        if train and rng is not None and p_aug > 0:
            # device-side audio augs (ref: configs/segment_avclip.yaml p=0.2;
            # see ops/dsp.py for the sox equivalences). Applied to the
            # contiguous pre-segmentation waveform when the loader ships it
            # (ref order: augs BEFORE GenerateMultipleSegments,
            # sync.yaml:151-171) so the 50%-overlap segments stay consistent.
            from synchformer_tpu.ops.dsp import (
                aug_then_segment,
                random_audio_aug_chain,
            )

            if "audio_full" in batch:
                pcm = aug_then_segment(batch["audio_full"],
                                       batch["audio_seg_starts"],
                                       pcm.shape[-1],
                                       jax.random.fold_in(rng, 7), p_aug,
                                       int(self.pipe_cfg.afps))
            else:  # hand-built batches without the full-crop buffer
                pcm = random_audio_aug_chain(pcm, jax.random.fold_in(rng, 7),
                                             p_aug, int(self.pipe_cfg.afps))
        mel = log_mel_spectrogram(pcm, self.mel_cfg)
        aud = jnp.swapaxes(mel, -1, -2).astype(self.compute_dtype)
        return vis, aud

    def _compile_steps(self):
        if self.is_moco:
            from synchformer_tpu.train.step import (
                make_moco_eval_step,
                make_moco_train_step,
            )

            self._train_step = make_moco_train_step(
                self.model, preprocess=self._device_prep)
            self._eval_step = make_moco_eval_step(
                self.model, zero_shot_precision, preprocess=self._device_prep)
        else:
            self._train_step = make_avclip_train_step(
                self.model, preprocess=self._device_prep)
            self._eval_step = make_avclip_eval_step(
                self.model, zero_shot_precision, preprocess=self._device_prep)

    def log_similarity_matrices(self, out, state, phase: str, epoch: int):
        """Write v2a/a2v/v2v/a2a heatmaps from one batch's segment features —
        the in-train observability the reference logs via eval_one_example
        (ref: training/train.py:405-467). Observability only: never fatal."""
        if jax.process_index() != 0:
            return
        try:
            from synchformer_tpu.utils.viz import plot_similarity_matrices

            d = self.model.n_embd
            a = np.asarray(out["afeat"]).reshape(-1, d)
            v = np.asarray(out["vfeat"]).reshape(-1, d)
            scale_key = ("segment_logit_scale" if self.is_moco else "logit_scale")
            scale = float(np.clip(np.asarray(state.trainable[scale_key]),
                                  self.model.clamp_scale_min,
                                  self.model.clamp_scale_max))
            sims = {"segment_sim_v2a": v @ a.T / scale,
                    "segment_sim_a2v": a @ v.T / scale,
                    "segment_sim_v2v": v @ v.T / scale,
                    "segment_sim_a2a": a @ a.T / scale}
            plot_similarity_matrices(
                sims, str(self.logger.logdir / "sims" / f"{phase}_e{epoch}.png"))
        except Exception as e:
            logging.warning(f"similarity-matrix logging failed: {e}")

    def _init_moco_state(self, params):
        """EMA copies + feature queues (ref: model.py:610-631): segment queue
        scaled by max_segments, global queue only with add_global_repr."""
        from synchformer_tpu.models.moco_clip import init_queues

        max_segments = int(self.model.afeat_extractor.get("params", {})
                           .get("max_segments", self._n_segments))
        seg_q = int(self.model.queue_size) * max_segments
        glob_q = int(self.model.queue_size) if self.model.add_global_repr else None
        queues = init_queues(jax.random.PRNGKey(self.seed + 1),
                             self.model.n_embd, seg_q, glob_q)
        params_m = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
        return {"params_m": params_m, "queues": queues}

    # ------------------------------------------------------------------
    def fit(self, train_ds, valid_ds, num_workers: int = 4,
            max_epochs: Optional[int] = None, decode_backend: Optional[str] = None,
            pretrained_params: Optional[Dict] = None):
        loaders = {
            split: SyncDataLoader(ds, self.pipe_cfg, self.batch_size, num_workers,
                                  self.seed, shuffle=split == "train",
                                  process_index=jax.process_index(),
                                  process_count=jax.process_count(),
                                  decode_backend=decode_backend)
            for split, ds in (("train", train_ds), ("valid", valid_ds))
        }
        first = next(iter(loaders["valid"]))
        vis, aud = jax.eval_shape(
            lambda b: self._device_prep(b, train=False),
            {k: jnp.asarray(v) for k, v in first.items() if k in ("video", "audio")})
        if pretrained_params is None:
            params = self.model.init(jax.random.PRNGKey(self.seed),
                                     jnp.zeros(vis.shape, jnp.float32),
                                     jnp.zeros(aud.shape, jnp.float32))["params"]
        else:
            params = pretrained_params
        shardings = param_shardings(params, self.mesh)
        params = jax.tree.map(jax.device_put, params, shardings)
        tx = self._make_tx(params)
        # Stage I trains EVERYTHING: trainable = all params
        state = SyncTrainState.create(params, tx,
                                      trainable_keys=tuple(params.keys()))
        moco = self._init_moco_state(params) if self.is_moco else None
        # resume-latest discovery (ref: train_clip.py:126-159)
        stopper = EarlyStopper(self.patience, to_max=True)
        start_epoch = 0
        if self.cfg.get("training", {}).get("resume") == "latest" \
                and self.ckpt.latest_step() is not None:
            template = {"trainable": state.trainable, "opt_state": state.opt_state,
                        "epoch": 0, "stopper": stopper.state_dict()}
            if self.is_moco:
                template["moco"] = moco
            payload = self.ckpt.restore_latest(template=template)
            # re-commit to the mesh: orbax restores scalar-template leaves
            # (optax counts) committed to the default device only, which jit
            # rejects next to the mesh-sharded params (see mesh.commit_to_mesh)
            state = state.replace(
                trainable=commit_to_mesh(payload["trainable"], self.mesh),
                opt_state=commit_to_mesh(payload["opt_state"], self.mesh))
            stopper.load_state_dict(payload["stopper"])
            if self.is_moco:
                moco = commit_to_mesh(payload["moco"], self.mesh)
            start_epoch = int(payload["epoch"]) + 1
            logging.info(f"Stage-I resumed from epoch {start_epoch - 1}")
        self._compile_steps()
        rng = jax.device_put(jax.random.PRNGKey(self.seed), replicated(self.mesh))
        bs = batch_sharding(self.mesh)

        epochs = max_epochs if max_epochs is not None else self.num_epochs
        results = {}
        for epoch in range(start_epoch, epochs):
            loaders["train"].set_epoch(epoch)
            n_iters = max(len(loaders["train"]), 1)
            loss_m = Meter()
            # per-iteration telemetry: data/batch time + samples/s, logged
            # every log_frequency steps (ref: training/train.py:195-213)
            data_m, batch_m = Meter(), Meter()
            t_prev = time.time()
            for i, batch in enumerate(loaders["train"]):
                data_m.update(time.time() - t_prev)  # loader wait
                batch_dev = batch_to_device(batch, bs)
                if self.is_moco:
                    # ALBEF alpha ramps linearly over epoch 0
                    # (ref: training/train.py:115)
                    alpha = (self.alpha * min(1.0, i / n_iters)
                             if epoch == 0 else self.alpha)
                    state, moco, metrics = self._train_step(
                        state, moco, batch_dev, rng, jnp.float32(alpha))
                else:
                    state, metrics = self._train_step(state, batch_dev, rng)
                if not bool(metrics["loss_finite"]):
                    raise RuntimeError(f"non-finite Stage-I loss at epoch {epoch} it {i}")
                loss_m.update(float(metrics["loss"]))
                batch_m.update(time.time() - t_prev)  # full iteration
                t_prev = time.time()
                if (i + 1) % self.log_frequency == 0:
                    step_now = int(state.step)
                    samples_per_s = (self.batch_size * jax.process_count()
                                     / max(batch_m.avg, 1e-9))
                    lr_now = float(self.schedule(step_now))
                    logging.info(
                        f"Train Epoch: {epoch} [{(i + 1) * self.batch_size}"
                        f"/{n_iters * self.batch_size}] "
                        f"Data (t): {data_m.avg:.3f} "
                        f"Batch (t): {batch_m.avg:.3f}, "
                        f"{samples_per_s:#.4g}/s, "
                        f"{samples_per_s / jax.process_count():#.4g}/s/proc "
                        f"LR: {lr_now:.3g} Loss: {loss_m.avg:#.5g}")
                    self.logger.log_dict(
                        {"data_time": data_m.avg, "batch_time": batch_m.avg,
                         "samples_per_s": samples_per_s, "lr": lr_now,
                         "loss_iter": float(metrics["loss"])},
                        step_now, prefix="train/")
                    # per-window time meters (ref: train.py:231-233)
                    data_m, batch_m = Meter(), Meter()
                if i == 0:
                    # in-train eval-one-example: zero-shot probe + similarity
                    # heatmaps on the first train batch of every epoch
                    # (ref: training/train.py:168-232)
                    params_now = {**state.frozen, **state.trainable}
                    one = (self._eval_step(params_now, moco, batch_dev,
                                           self.zero_shot_window)
                           if self.is_moco else
                           self._eval_step(params_now, batch_dev,
                                           self.zero_shot_window))
                    self.logger.log_scalar("train/precision_one_batch",
                                           float(one["precision"]), epoch)
                    self.log_similarity_matrices(one, state, "train", epoch)
            self.logger.log_scalar("train/loss", loss_m.avg, epoch)

            # zero-shot shifted-window validation
            loaders["valid"].set_epoch(epoch)
            prec_m, vloss_m = Meter(), Meter()
            for batch in loaders["valid"]:
                params_now = {**state.frozen, **state.trainable}
                if self.is_moco:
                    out = self._eval_step(params_now, moco,
                                          batch_to_device(batch, bs),
                                          self.zero_shot_window)
                else:
                    out = self._eval_step(params_now, batch_to_device(batch, bs),
                                          self.zero_shot_window)
                prec_m.update(float(out["precision"]))
                vloss_m.update(float(out["loss"]))
            self.log_similarity_matrices(out, state, "valid", epoch)
            metrics_global = gather_dict({"precision": prec_m.avg, "loss": vloss_m.avg})
            self.logger.log_dict(metrics_global, epoch, prefix="valid/")
            self.logger.append_results("valid", {"epoch": epoch, **metrics_global})

            improved = stopper.update(metrics_global["precision"])
            # epoch_latest every epoch, epoch_best on improvement
            # (ref: train_clip.py:396-441)
            payload = {
                "trainable": jax.tree.map(np.asarray, state.trainable),
                "opt_state": jax.tree.map(np.asarray, state.opt_state),
                "epoch": epoch, "stopper": stopper.state_dict()}
            if self.is_moco:
                payload["moco"] = jax.tree.map(np.asarray, moco)
            self.ckpt.save_latest(epoch, payload)
            if improved:
                self.ckpt.save_best(
                    epoch, payload,
                    metrics={"best_metric": float(metrics_global["precision"])})
            results = {"precision": metrics_global["precision"],
                       "loss": metrics_global["loss"], "epoch": epoch}
            if stopper.triggered:
                logging.info(f"Stage-I early stop at epoch {epoch}")
                break
        self._state = state
        self._moco = moco
        return results


def train(cfg: Dict[str, Any], **fit_kwargs):
    """Entry point mirroring ref train_clip.py:main(cfg)."""
    trainer = AVCLIPTrainer(cfg)
    data_cfg = cfg.get("data", {})
    ds_cfg = data_cfg.get("dataset", {})
    train_ds = instantiate_from_config(ds_cfg, split="train",
                                       vids_dir=data_cfg.get("vids_path"))
    valid_ds = instantiate_from_config(ds_cfg, split="valid",
                                       vids_dir=data_cfg.get("vids_path"))
    return trainer.fit(train_ds, valid_ds, **fit_kwargs)
