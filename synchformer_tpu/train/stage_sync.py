"""Stage II/III trainer: audio-visual offset (and syncability) training.

Capability parity with ref: scripts/train_sync.py:23-395 —
epoch loop over train/valid with a final test phase, frozen towers in eval
mode, AMP-equivalent bf16 compute, grad-clip 1.0, LR x data-parallel-size,
per-iteration non-finite-loss hard fail, early stopping on valid accuracy_1,
best/latest checkpointing, iter_times repeated eval passes for small sets,
per-class metrics, eval-results gather across hosts.

TPU-native: ONE jitted SPMD step over a ('data','model') mesh; DDP dissolves
into batch sharding + XLA psum; barriers vanish (program order).
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
from synchformer_tpu.models.presets import build_synchformer
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
from synchformer_tpu.train.metrics import calc_cls_metrics, gather_dict, per_class_accuracy
from synchformer_tpu.train.state import (
    SYNC_TRAINABLE_KEYS,
    SyncTrainState,
    make_lr_schedule,
    make_optimizer,
)
from synchformer_tpu.train.step import make_sync_eval_step, make_sync_train_step
from synchformer_tpu.utils.checkpoint import CheckpointManager
from synchformer_tpu.utils.logger import EarlyStopper, ExperimentLogger, Meter


def _device_preprocess(batch: Dict[str, jnp.ndarray], train: bool, rng=None,
                       mel_cfg: MelSpectrogramConfig = MelSpectrogramConfig(),
                       p_flip: float = 0.5, p_color_jitter: float = 0.0,
                       p_gray_scale: float = 0.0, p_audio_aug: float = 0.0,
                       afps: int = 16_000, dtype=jnp.float32):
    """uint8 frames + raw PCM -> normalized model inputs (fused into the jit
    step: the reference does all of this per CPU worker)."""
    vis = prepare_video_batch(batch["video"], rng=rng, train=train,
                              p_horizontal_flip=p_flip,
                              p_color_jitter=p_color_jitter,
                              p_gray_scale=p_gray_scale, dtype=dtype)
    pcm = batch["audio"]
    if train and rng is not None and p_audio_aug > 0:
        # the five AudioRandom* train-time augs at p=${data.p_audio_aug}
        # (ref: configs/sync.yaml:151-169; shipped configs run p=0, which
        # skips this branch at trace time — bit-identical to no hook).
        # They run on the contiguous pre-segmentation waveform when the
        # loader ships it (ref order: augs BEFORE GenerateMultipleSegments,
        # sync.yaml:151-171) so overlapping segments stay consistent.
        from synchformer_tpu.ops.dsp import (
            aug_then_segment,
            random_audio_aug_chain,
        )

        if "audio_full" in batch:
            pcm = aug_then_segment(batch["audio_full"],
                                   batch["audio_seg_starts"], pcm.shape[-1],
                                   jax.random.fold_in(rng, 7), p_audio_aug,
                                   afps)
        else:  # hand-built batches without the full-crop buffer
            pcm = random_audio_aug_chain(pcm, jax.random.fold_in(rng, 7),
                                         p_audio_aug, afps)
    mel = log_mel_spectrogram(pcm, mel_cfg)                  # (B, S, 128, T)
    aud = jnp.swapaxes(mel, -1, -2).astype(dtype)            # (B, S, T, 128)
    return vis, aud


class SyncTrainer:
    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        training = cfg.get("training", {})
        data = cfg.get("data", {})

        self.seed = int(training.get("seed", 1337))
        self.num_epochs = int(training.get("num_epochs", 10000))
        self.batch_size = int(training.get("base_batch_size", 16))
        self.metric_name = training.get("metric_name", "accuracy_1")
        self.patience = int(training.get("patience", 20))
        self.run_test_only = bool(training.get("run_test_only", False))
        compute_dtype = jnp.bfloat16 if training.get("use_half_precision", True) else jnp.float32

        # mesh: all devices on 'data' unless model parallelism is requested
        n_model = int(training.get("model_parallel", 1))
        self.mesh = make_mesh(n_model=n_model)
        # pallas entry points shard_map over this mesh's 'data' axis
        set_active_data_mesh(self.mesh)
        n_data = self.mesh.shape["data"]
        assert self.batch_size % n_data == 0, \
            f"batch_size {self.batch_size} must divide over data-parallel size {n_data}"

        # model
        n_segments = int(data.get("n_segments", 14))
        syncability = cfg.get("action") == "ft_avsync_model_for_syncability"
        if "model" in cfg and "target" in cfg["model"]:
            self.model = instantiate_from_config(cfg["model"])
        else:
            self.model = build_synchformer(n_segments=n_segments,
                                           syncability=syncability,
                                           dtype=compute_dtype)
        self.target_key = "sync_target" if syncability else "offset_target"
        self.num_cls = 2 if syncability else int(data.get("num_off_cls", 21))

        # trainable subtrees follow the config's is_trainable flags
        # (ref: configs/sync.yaml:7,19 + scripts/train_utils.py:195-214 —
        # default: frozen towers, trainable projections + transformer)
        model_params = cfg.get("model", {}).get("params", {})
        trainable_keys = list(SYNC_TRAINABLE_KEYS)
        for tower_cfg_key, enc_key in (("afeat_extractor", "a_encoder"),
                                       ("vfeat_extractor", "v_encoder")):
            if model_params.get(tower_cfg_key, {}).get("is_trainable"):
                trainable_keys.append(enc_key)
        self.trainable_keys = tuple(trainable_keys)
        self.towers_trainable = ("a_encoder" in self.trainable_keys
                                 or "v_encoder" in self.trainable_keys)
        if self.towers_trainable:
            logging.info(f"trainable subtrees (from cfg): {self.trainable_keys}")

        # pipeline
        self.pipe_cfg = SyncPipelineConfig(
            n_segments=n_segments,
            num_off_cls=int(data.get("num_off_cls", 21)),
            crop_len_sec=float(data.get("crop_len_sec", 5)),
            max_off_sec=float(data.get("max_off_sec", 2)),
            step_size_seg=float(data.get("step_size_seg", 0.5)),
            input_size=int(data.get("input_size", 224)),
            segment_size_vframes=int(data.get("segment_size_vframes", 16)),
            audio_jitter_sec=float(data.get("audio_jitter_sec", 0.05)),
            sometimes_upscale_p=float(data.get("sometimes_upscale_p") or 0.0),
            p_audio_aug=float(data.get("p_audio_aug") or 0.0),
            p_horizontal_flip=float(data.get("p_horizontal_flip", 0.5)),
            p_color_jitter=float(data.get("p_color_jitter", 0.0)),
            p_gray_scale=float(data.get("p_gray_scale", 0.0)),
            for_syncability=syncability,
            offset_type=data.get("offset_type", "grid"),
        )
        self.compute_dtype = compute_dtype
        # mel time length must match the AST tower's max_spec_t
        max_spec_t = (cfg.get("model", {}).get("params", {})
                      .get("afeat_extractor", {}).get("params", {})
                      .get("max_spec_t", 66))
        self.mel_cfg = MelSpectrogramConfig(max_spec_t=int(max_spec_t))

        # optimizer: LR scaled by the data-parallel world size
        # (ref: train_utils.py:218)
        opt_cfg = training.get("optimizer", {})
        lr_cfg = training.get("lr_scheduler", {})
        base_lr = float(training.get("base_learning_rate", 2e-6)) * n_data
        schedule = make_lr_schedule(lr_cfg.get("name", "constant_with_warmup"),
                                    base_lr, int(lr_cfg.get("warmup", 1000)))
        self.tx = make_optimizer(
            opt_cfg.get("name", "adam"), lr=schedule,
            betas=tuple(opt_cfg.get("betas", (0.9, 0.999))),
            momentum=float(opt_cfg.get("momentum", 0.9)),
            weight_decay=float(opt_cfg.get("weight_decay", 0.0)),
            max_clip_norm=float(training.get("max_clip_norm", 1.0)),
            # avoid NaNs in half precision (ref: train_utils.py:222-223)
            eps=1e-7 if training.get("use_half_precision", True) else 1e-8)

        logdir = cfg.get("logging", {}).get("logdir", "./logs/sync_models")
        # pinning exp_name reuses an existing experiment dir — required for
        # resume to find the previous run's checkpoints (the reference
        # restores cfg.start_time from the ckpt, ref: train_utils.py:53-60)
        self.logger = ExperimentLogger(
            logdir, exp_name=cfg.get("logging", {}).get("exp_name"),
            cfg=cfg if isinstance(cfg, dict) else None,
            is_master=jax.process_index() == 0,
            log_code_state=bool(cfg.get("logging", {}).get("log_code_state", False)),
            use_wandb=bool(cfg.get("logging", {}).get("use_wandb", False)))
        self.ckpt = CheckpointManager(str(self.logger.logdir / "ckpts"))
        self.schedule = schedule
        self.log_frequency = int(cfg.get("logging", {}).get("log_frequency", 20))

        self._train_step = None
        self._eval_step = None
        self._device_prep = None

    # ------------------------------------------------------------------
    def build_state(self, init_batch: Dict[str, np.ndarray],
                    pretrained_params: Optional[Dict] = None) -> SyncTrainState:
        vis, aud = jax.eval_shape(
            lambda b: _device_preprocess(b, train=False, dtype=self.compute_dtype,
                                         mel_cfg=self.mel_cfg),
            {k: jnp.asarray(v) for k, v in init_batch.items()
             if k in ("video", "audio")})
        if pretrained_params is None:
            params = self.model.init(
                jax.random.PRNGKey(self.seed),
                jnp.zeros(vis.shape, jnp.float32),
                jnp.zeros(aud.shape, jnp.float32))["params"]
            params = self._maybe_init_towers_from_ckpts(params)
        else:
            params = pretrained_params
        shardings = param_shardings(params, self.mesh)
        params = jax.tree.map(jax.device_put, params, shardings)
        return SyncTrainState.create(params, self.tx, self.trainable_keys)

    def _maybe_init_towers_from_ckpts(self, params):
        """Initialize the frozen towers from Stage-I checkpoints named in
        cfg.model.params.{a,v}feat_extractor.params.ckpt_path — the
        cross-stage surgery the reference performs inside the extractor
        constructors (ref: ast.py:113-132, motionformer.py:156-173). Accepts
        torch .pt files AND framework-native Stage-I orbax run dirs; any
        configured path that cannot be loaded is a hard error (a silently
        unloaded tower wastes the whole training run)."""
        from synchformer_tpu.utils.checkpoint import (
            load_stage1_tower,
            merge_params_nonstrict,
        )

        model_params = self.cfg.get("model", {}).get("params", {})
        for key, tower in (("afeat_extractor", "audio"),
                           ("vfeat_extractor", "visual")):
            ckpt_path = model_params.get(key, {}).get("params", {}).get("ckpt_path")
            if not ckpt_path:
                continue
            loaded = load_stage1_tower(str(ckpt_path), tower)
            enc_key = "a_encoder" if tower == "audio" else "v_encoder"
            # non-strict merge: fresh leaves stay for params absent from the
            # Stage-I ckpt (e.g. a different temporal aggregator; the
            # reference load is non-strict too, ref: ast.py:124-130)
            merged, report = merge_params_nonstrict(params[enc_key], loaded)
            n_loaded = (len(jax.tree.leaves(params[enc_key]))
                        - len(report["missing"]) - len(report["mismatched"]))
            if n_loaded == 0:
                raise ValueError(
                    f"{enc_key}: Stage-I ckpt {ckpt_path} matched no params "
                    f"(missing={len(report['missing'])}, "
                    f"mismatched={report['mismatched'][:3]})")
            for field in ("missing", "unexpected", "mismatched"):
                if report[field]:
                    logging.warning(f"{enc_key} <- {ckpt_path}: {field} "
                                    f"({len(report[field])}): "
                                    f"{report[field][:6]}")
            params = {**params, enc_key: merged}
            logging.info(f"initialized {enc_key} ({n_loaded} leaves) "
                         f"from Stage-I ckpt {ckpt_path}")
        return params

    def _compile_steps(self):
        mel_cfg = self.mel_cfg
        p_flip = self.pipe_cfg.p_horizontal_flip
        dtype = self.compute_dtype
        p_cj = self.pipe_cfg.p_color_jitter
        p_gs = self.pipe_cfg.p_gray_scale

        def preprocess(raw_batch, train: bool, rng=None):
            return _device_preprocess(raw_batch, train=train, rng=rng,
                                      mel_cfg=mel_cfg, p_flip=p_flip,
                                      p_color_jitter=p_cj, p_gray_scale=p_gs,
                                      p_audio_aug=self.pipe_cfg.p_audio_aug,
                                      afps=int(self.pipe_cfg.afps),
                                      dtype=dtype)

        self._train_step = make_sync_train_step(
            self.model, preprocess=preprocess, target_key=self.target_key,
            extractors_deterministic=not self.towers_trainable)
        self._eval_step = make_sync_eval_step(
            self.model, preprocess=preprocess, target_key=self.target_key)

    # ------------------------------------------------------------------
    def dump_input_reconstruction(self, batch: Dict[str, np.ndarray], tag: str):
        """Invert the pipeline for the first item and write what the model
        actually ingests — the reference's de-facto data-pipeline integration
        test at iteration 0 of every phase (ref: train_sync.py:166-173,
        utils/logger.py:162-242)."""
        if jax.process_index() != 0:
            return
        try:
            from synchformer_tpu.utils.viz import save_input_reconstruction

            spec = np.asarray(jnp.swapaxes(
                log_mel_spectrogram(jnp.asarray(batch["audio"][0]), self.mel_cfg),
                -1, -2))  # (S, T, F) as the model sees it
            save_input_reconstruction(batch["video"][0], spec,
                                      str(self.logger.logdir / "recon"), prefix=tag)
        except Exception as e:  # observability only — never kill training
            logging.warning(f"input reconstruction failed: {e}")

    def run_phase(self, state: SyncTrainState, loader: SyncDataLoader, epoch: int,
                  phase: str, rng) -> Dict[str, float]:
        bs = batch_sharding(self.mesh)
        loader.set_epoch(epoch)
        if phase == "train":
            meters = {"loss": Meter(), "accuracy_1": Meter(), "samples_per_sec": Meter()}
            n_iters = max(len(loader), 1)
            t0 = time.perf_counter()

            def staged():
                # dispatch H2D for batch n+1 while step n runs on device;
                # data_t times the loader fetch only (the reference's Data(t)
                # meter, ref: scripts/train_sync.py:219-228)
                pending = None
                it = enumerate(loader)
                while True:
                    t_fetch = time.perf_counter()
                    try:
                        i, batch = next(it)
                    except StopIteration:
                        break
                    data_t = time.perf_counter() - t_fetch
                    batch.pop("pad_mask", None)  # train drops the tail instead
                    if i == 0 and epoch == 0:
                        self.dump_input_reconstruction(batch, f"{phase}_e{epoch}")
                    nxt = batch_to_device(batch, bs)  # async dispatch
                    if pending is not None:
                        yield pending
                    pending = (i, batch, nxt, data_t)
                if pending is not None:
                    yield pending

            # per-iteration Data(t)/Batch(t) telemetry at log_frequency
            # (ref: scripts/train_sync.py:219-228; same meter set as Stage I)
            data_m, batch_m = Meter(), Meter()
            for i, batch, batch_dev, data_t in staged():
                state, metrics = self._train_step(state, batch_dev, rng)
                loss = float(metrics["loss"])
                if not bool(metrics["loss_finite"]):
                    raise RuntimeError(f"non-finite loss at epoch {epoch} iter {i} "
                                       f"(ref behavior: train_sync.py:188-190)")
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                meters["loss"].update(loss)
                meters["accuracy_1"].update(float(metrics["accuracy_1"]))
                meters["samples_per_sec"].update(len(batch["video"]) / dt)
                data_m.update(data_t)
                batch_m.update(dt)
                step = int(state.step)
                if step % self.log_frequency == 0:
                    samples_per_s = (len(batch["video"]) * jax.process_count()
                                     / max(batch_m.avg, 1e-9))
                    lr_now = float(self.schedule(step))
                    logging.info(
                        f"Train Epoch: {epoch} [{(i + 1) * len(batch['video'])}"
                        f"/{n_iters * len(batch['video'])}] "
                        f"Data (t): {data_m.avg:.3f} "
                        f"Batch (t): {batch_m.avg:.3f}, "
                        f"{samples_per_s:#.4g}/s "
                        f"LR: {lr_now:.3g} Loss: {loss:#.5g}")
                    self.logger.log_dict(
                        {"data_time": data_m.avg, "batch_time": batch_m.avg,
                         "samples_per_s": samples_per_s, "lr": lr_now,
                         "loss_iter": loss},
                        step, prefix="train/")
                    data_m, batch_m = Meter(), Meter()  # per-window meters
            out = {k: m.avg for k, m in meters.items()}
            self._state = state
            return out
        # valid/test: gather logits + targets, compute full metric suite
        # (pad_mask drops the wrap-around items of the final batch)
        all_logits, all_targets = [], []
        for batch in loader:
            mask = batch.pop("pad_mask", np.ones(len(batch["video"]), bool))
            batch_dev = batch_to_device(batch, bs)
            out = self._eval_step(state.trainable, state.frozen, batch_dev)
            all_logits.append(np.asarray(out["logits"])[mask])
            all_targets.append(np.asarray(batch[self.target_key])[mask])
        gathered = gather_dict({"logits": np.concatenate(all_logits),
                                "targets": np.concatenate(all_targets)})
        metrics = calc_cls_metrics(gathered["targets"], gathered["logits"],
                                   topk=(1, 5) if self.num_cls > 2 else (1,),
                                   calc_pr_rec_f1=self.num_cls == 2)
        metrics["per_class"] = per_class_accuracy(gathered["targets"],
                                                  gathered["logits"])
        return metrics

    # ------------------------------------------------------------------
    def maybe_resume(self, state: SyncTrainState, stopper: "EarlyStopper") -> tuple:
        """Resume/finetune semantics (ref: scripts/train_sync.py:68-99,
        train_utils.py:251-290): resume restores trainable params + optimizer
        + epoch counter + early-stopper state; finetune loads params
        NON-STRICTLY (fresh heads survive as missing keys, incompatible ckpt
        keys are dropped, the sync pos-emb is trimmed to the current model's
        sequence length per ref sync_model.py:101-114) and resets counters."""
        training = self.cfg.get("training", {})
        start_epoch = 0
        ckpt_path = training.get("ckpt_path")
        if training.get("resume") and self.ckpt.latest_step() is not None:
            payload = self.ckpt.restore_latest(template={
                "trainable": state.trainable, "opt_state": state.opt_state,
                "step": 0, "epoch": 0, "stopper": stopper.state_dict()})
            # orbax restores array leaves with the template's shardings, but
            # leaves whose template was an uncommitted scalar (step, optax
            # counts) come back committed to the default device only — jit
            # rejects mixed committed device sets, so re-commit everything
            # to the mesh (replicating what isn't already laid out on it)
            state = state.replace(
                trainable=commit_to_mesh(payload["trainable"], self.mesh),
                opt_state=commit_to_mesh(payload["opt_state"], self.mesh),
                step=commit_to_mesh(jnp.asarray(int(payload["step"]), jnp.int32),
                                    self.mesh))
            stopper.load_state_dict(payload["stopper"])
            start_epoch = int(payload["epoch"]) + 1
            logging.info(f"resumed from epoch {start_epoch - 1} "
                         "(params + optimizer + early-stopper state)")
        elif training.get("finetune") and ckpt_path:
            from synchformer_tpu.utils.checkpoint import (
                convert_sync_checkpoint,
                load_torch_checkpoint,
                merge_params_nonstrict,
                trim_sync_pos_emb,
            )

            init_params = {**state.frozen, **state.trainable}
            # trim the ckpt's pos emb (e.g. 198 for S=14) to this model's
            # sequence length (e.g. 184 for S=13, ref: sync_model.py:101-114)
            pos = init_params.get("sync_transformer", {}).get("pos_emb", {})
            target_seq_len = (int(pos["pos_emb"].shape[1])
                              if "pos_emb" in pos else None)
            if str(ckpt_path).endswith((".pt", ".pth", ".pyth")):
                # reference torch checkpoint
                loaded = convert_sync_checkpoint(load_torch_checkpoint(ckpt_path),
                                                 target_seq_len=target_seq_len)
            else:
                # our own orbax Stage-II run dir: payload carries the
                # trainable subtree only (towers were frozen in Stage II and
                # are re-initialized from Stage-I ckpts by build_state)
                from synchformer_tpu.utils.checkpoint import CheckpointManager

                src = CheckpointManager(ckpt_path)
                loaded = src.restore_latest()["trainable"]
                loaded = trim_sync_pos_emb(loaded, target_seq_len)
            merged, report = merge_params_nonstrict(init_params, loaded)
            for field in ("missing", "unexpected", "mismatched"):
                if report[field]:
                    logging.warning(
                        f"finetune ckpt load {field} keys (fresh heads are "
                        f"expected here, ref train_sync.py:76-82): "
                        f"{report[field][:8]}{'...' if len(report[field]) > 8 else ''}")
            trainable = {k: merged[k] for k in state.trainable}
            frozen = {k: merged[k] for k in state.frozen}
            state = state.replace(trainable=trainable, frozen=frozen)
            logging.info(f"finetuning from {ckpt_path} (counters reset)")
            self._log_finetune_cfg_diff(ckpt_path)
        return state, start_epoch

    def _log_finetune_cfg_diff(self, ckpt_path) -> None:
        """Diff the fine-tuning checkpoint's saved cfg against the current one
        into cfg_diffs.diff next to the ckpt (ref: scripts/train_sync.py:86)."""
        from pathlib import Path

        import yaml

        from synchformer_tpu.utils.logger import show_cfg_diffs

        ckpt_dir = Path(ckpt_path).parent
        old_cfg_path = ckpt_dir / "cfg.yaml"
        if not old_cfg_path.exists() or not isinstance(self.cfg, dict):
            return
        try:
            with open(old_cfg_path) as f:
                old_cfg = yaml.safe_load(f)
            show_cfg_diffs(old_cfg, self.cfg, str(ckpt_dir / "cfg_diffs.diff"))
        except Exception as e:  # observability only — never kill the run
            logging.warning(f"could not write finetune cfg diff: {e}")

    def _maybe_profile(self, epoch: int):
        """jax profiler trace for the first training epoch when enabled —
        the equivalent of the reference's vestigial trace/profile flags
        (SURVEY.md §5 tracing)."""
        if self.cfg.get("training", {}).get("trace") and epoch == 0:
            import jax.profiler

            trace_dir = str(self.logger.logdir / "profile")
            return jax.profiler.trace(trace_dir)
        import contextlib

        return contextlib.nullcontext()

    def fit(self, train_ds, valid_ds, test_ds=None, num_workers: int = 6,
            pretrained_params: Optional[Dict] = None, iter_times: int = 1,
            max_epochs: Optional[int] = None, decode_backend: Optional[str] = None):
        loaders = {
            "train": SyncDataLoader(train_ds, self.pipe_cfg, self.batch_size,
                                    num_workers, self.seed,
                                    process_index=jax.process_index(),
                                    process_count=jax.process_count(),
                                    decode_backend=decode_backend),
            "valid": SyncDataLoader(valid_ds, self.pipe_cfg, self.batch_size,
                                    num_workers, self.seed, shuffle=False,
                                    drop_last=False,
                                    process_index=jax.process_index(),
                                    process_count=jax.process_count(),
                                    decode_backend=decode_backend),
        }
        first_batch = next(iter(loaders["valid"]))
        state = self.build_state(first_batch, pretrained_params)
        stopper = EarlyStopper(self.patience, to_max=True)
        state, start_epoch = self.maybe_resume(state, stopper)
        self._compile_steps()
        self._state = state
        rng = jax.device_put(jax.random.PRNGKey(self.seed), replicated(self.mesh))

        best_metrics: Dict[str, float] = {}
        epochs = max_epochs if max_epochs is not None else self.num_epochs
        if self.run_test_only:
            # evaluation-only mode (ref: cfg.training.run_test_only): restore
            # the best checkpoint if one exists and skip straight to test
            epochs = 0
            best = self.ckpt.best_step()
            if best is not None:
                payload = self.ckpt.restore_best(best, template={
                    "trainable": self._state.trainable,
                    "opt_state": self._state.opt_state, "step": 0, "epoch": 0,
                    "stopper": stopper.state_dict()})
                self._state = self._state.replace(trainable=payload["trainable"])
                logging.info(f"run_test_only: restored best ckpt (epoch {best})")

        def full_payload(epoch: int) -> Dict[str, Any]:
            # full payload for exact resume: params + optimizer state +
            # counters + early-stopper state (ref ckpt dict:
            # utils/logger.py:139-160 model/optimizer/scaler/epoch/metrics)
            return {
                "trainable": jax.tree.map(np.asarray, self._state.trainable),
                "opt_state": jax.tree.map(np.asarray, self._state.opt_state),
                "step": int(self._state.step), "epoch": epoch,
                "stopper": stopper.state_dict(),
            }

        for epoch in range(start_epoch, epochs):
            with self._maybe_profile(epoch):
                train_metrics = self.run_phase(self._state, loaders["train"], epoch,
                                               "train", rng)
            self.logger.log_dict(train_metrics, epoch, prefix="train/")
            valid_metrics = self.run_phase(self._state, loaders["valid"], epoch,
                                           "valid", rng)
            self.logger.log_dict(valid_metrics, epoch, prefix="valid/")
            self.logger.append_results("valid", {"epoch": epoch, **{
                k: v for k, v in valid_metrics.items() if isinstance(v, float)}})

            monitored = valid_metrics[self.metric_name]
            improved = stopper.update(monitored)
            # latest after every epoch for crash-resume, best on improvement
            # (ref: train_sync.py:257-267 log_latest_model/log_best_model)
            self.ckpt.save_latest(epoch, full_payload(epoch))
            if improved:
                best_metrics = dict(valid_metrics)
                self.ckpt.save_best(epoch, full_payload(epoch),
                                    metrics={"best_metric": float(monitored)})
            if stopper.triggered:
                logging.info(f"early stop at epoch {epoch} "
                             f"(best {self.metric_name}={stopper.best:.4f})")
                break

        results = {"best_valid": best_metrics}
        if test_ds is not None:
            test_loader = SyncDataLoader(
                test_ds, self.pipe_cfg, self.batch_size, num_workers, self.seed,
                shuffle=False, drop_last=False,
                process_index=jax.process_index(),
                process_count=jax.process_count(), decode_backend=decode_backend)
            # iter_times: repeated passes over small eval sets
            # (ref: train_sync.py:291-395)
            accum_logits, accum_targets = [], []
            bs = batch_sharding(self.mesh)
            for it in range(iter_times):
                test_loader.set_epoch(it)
                for batch in test_loader:
                    mask = batch.pop("pad_mask",
                                     np.ones(len(batch["video"]), bool))
                    out = self._eval_step(self._state.trainable,
                                          self._state.frozen,
                                          batch_to_device(batch, bs))
                    accum_logits.append(np.asarray(out["logits"])[mask])
                    accum_targets.append(np.asarray(batch[self.target_key])[mask])
            gathered = gather_dict({"logits": np.concatenate(accum_logits),
                                    "targets": np.concatenate(accum_targets)})
            test_metrics = calc_cls_metrics(
                gathered["targets"], gathered["logits"],
                topk=(1, 5) if self.num_cls > 2 else (1,),
                calc_pr_rec_f1=self.num_cls == 2)
            self.logger.log_test_metrics(test_metrics)
            self._dump_test_plots(gathered["targets"], gathered["logits"])
            results["test"] = test_metrics
        return results

    def _dump_test_plots(self, targets: np.ndarray, logits: np.ndarray):
        """Per-class accuracy bars + pred/target histograms for the test
        phase (ref: scripts/train_utils.py:440-563). Observability only."""
        if jax.process_index() != 0:
            return
        try:
            from synchformer_tpu.utils.viz import (
                plot_per_class_accuracy,
                plot_pred_target_hist,
            )

            plots = self.logger.logdir / "plots"
            plot_per_class_accuracy(per_class_accuracy(targets, logits),
                                    str(plots / "test_per_class_accuracy.png"))
            plot_pred_target_hist(targets, np.argmax(logits, -1), self.num_cls,
                                  str(plots / "test_pred_target_hist.png"))
        except Exception as e:  # never kill a finished run over a plot
            logging.warning(f"test-phase plots failed: {e}")


def train(cfg: Dict[str, Any], **fit_kwargs):
    """Entry point mirroring ref scripts/train_sync.py:train(cfg)."""
    trainer = SyncTrainer(cfg)
    data_cfg = cfg.get("data", {})
    ds_cfg = data_cfg.get("dataset", {})
    datasets = {}
    for split in ("train", "valid", "test"):
        datasets[split] = instantiate_from_config(
            ds_cfg, split=split, vids_dir=data_cfg.get("vids_path"))
    fit_kwargs.setdefault("iter_times",
                          int(cfg.get("training", {}).get("iter_times", 1)))
    fit_kwargs.setdefault("num_workers",
                          int(cfg.get("training", {}).get("num_workers", 6)))
    return trainer.fit(datasets["train"], datasets["valid"], datasets["test"],
                       **fit_kwargs)
