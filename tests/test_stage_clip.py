"""Stage-I trainer integration (tiny AVCLIP on synthetic media) + unit tests
for the shifted-window zero-shot probe."""
import jax.numpy as jnp
import numpy as np
import pytest

from synchformer_tpu.data.datasets import SyntheticAV
from synchformer_tpu.train.stage_clip import (
    AVCLIPTrainer,
    shifted_window_predictions,
    zero_shot_precision,
)

D = 32

TINY_AVCLIP_CFG = dict(
    action="train_avclip",
    model=dict(
        target="synchformer_tpu.models.avclip.AVCLIP",
        params=dict(
            n_embd=D,
            afeat_extractor=dict(
                target="synchformer_tpu.models.ast_encoder.ASTEncoder",
                params=dict(hidden_size=D, depth=1, num_heads=4, patch_size=16,
                            frequency_stride=10, time_stride=10, num_mel_bins=128,
                            max_spec_t=18, agg_time_module="AveragePooling")),
            vfeat_extractor=dict(
                target="synchformer_tpu.models.motionformer.MotionFormerEncoder",
                params=dict(embed_dim=D, depth=1, num_heads=4, patch_size=8,
                            z_block_size=2, temporal_resolution=2, img_size=16,
                            drop_path_rate=0.0, agg_time_module="AveragePooling")),
            aproj=dict(target="synchformer_tpu.models.bridges.DoNothingBridge",
                       params={}),
            vproj=dict(target="synchformer_tpu.models.bridges.DoNothingBridge",
                       params={}),
        )),
    training=dict(base_batch_size=8, learning_rate=1e-4, num_epochs=1,
                  precision="fp32", seed=0, zero_shot_window=2,
                  total_steps=100, warmup=5),
    data=dict(n_segments=4, crop_len_sec=1.0, input_size=16,
              segment_size_vframes=4, step_size_seg=0.5, p_horizontal_flip=0.5),
)


def test_shifted_window_probe_perfect_features():
    """Distinct per-shift features -> diagonal matches -> precision 1."""
    b, s, d, w = 2, 6, 8, 3
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((b, s, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    afeat = vfeat = jnp.asarray(feats)
    preds_a, preds_v = shifted_window_predictions(afeat, vfeat, w)
    assert preds_a.shape == (b, s - w + 1)
    prec = float(zero_shot_precision(afeat, vfeat, w))
    assert prec == pytest.approx(1.0)


def test_shifted_window_probe_shuffled_features():
    """Unrelated modalities -> near-chance precision."""
    b, s, d, w = 8, 10, 16, 4
    rng = np.random.default_rng(1)
    a = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    prec = float(zero_shot_precision(jnp.asarray(a), jnp.asarray(v), w))
    assert prec < 0.6  # 7 shifts -> chance ~0.14; noise can be lucky but not this lucky


@pytest.mark.slow
def test_moco_trainer_end_to_end(tmp_path):
    """MultilevelMoCoCLIP selected via cfg.model.target trains end-to-end:
    EMA params + queues threaded through the jitted step
    (ref: open_clip/model.py:585-871 as a selectable Stage-I model)."""
    import copy

    cfg = copy.deepcopy(TINY_AVCLIP_CFG)
    cfg["logging"] = dict(logdir=str(tmp_path), log_code_state=False)
    cfg["model"]["target"] = "synchformer_tpu.models.moco_clip.MultilevelMoCoCLIP"
    mp = cfg["model"]["params"]
    mp.update(queue_size=8, momentum=0.9)
    for tower in ("afeat_extractor", "vfeat_extractor"):
        mp[tower]["params"].update(add_global_repr=True,
                                   agg_segments_module="TransformerEncoderLayer",
                                   max_segments=cfg["data"]["n_segments"])
    cfg["training"] = dict(cfg["training"], alpha=0.4)

    trainer = AVCLIPTrainer(cfg)
    assert trainer.is_moco
    results = trainer.fit(SyntheticAV("train", n_clips=16),
                          SyntheticAV("valid", n_clips=8),
                          num_workers=2, max_epochs=1,
                          decode_backend="synthetic")
    assert np.isfinite(results["loss"])
    assert 0.0 <= results["precision"] <= 1.0
    # queues rolled: ptr advanced by (steps * B * S) mod Q_seg
    moco = trainer._moco
    q_seg = 8 * cfg["data"]["n_segments"]
    assert int(moco["queues"].segment_ptr) == (2 * 8 * 4) % q_seg
    # EMA params moved away from the online params but not onto them
    online = np.asarray(jnp.ravel(
        jnp.asarray(trainer._state.trainable["segment_logit_scale"])))
    ema = np.asarray(jnp.ravel(jnp.asarray(moco["params_m"]["segment_logit_scale"])))
    assert np.isfinite(ema).all()
    assert trainer.ckpt.latest_step() is not None


@pytest.mark.slow
def test_avclip_trainer_end_to_end(tmp_path):
    cfg = dict(TINY_AVCLIP_CFG)
    cfg["logging"] = dict(logdir=str(tmp_path), log_code_state=False,
                          log_frequency=1)
    trainer = AVCLIPTrainer(cfg)
    results = trainer.fit(SyntheticAV("train", n_clips=16),
                          SyntheticAV("valid", n_clips=8),
                          num_workers=2, max_epochs=1,
                          decode_backend="synthetic")
    assert np.isfinite(results["loss"])
    assert 0.0 <= results["precision"] <= 1.0
    assert trainer.ckpt.latest_step() is not None
    # logit scale stayed clamped
    scale = float(trainer._state.trainable["logit_scale"])
    assert 0.001 <= scale <= 0.5
    # per-iteration telemetry (ref: training/train.py:195-213): every
    # log_frequency iters the data/batch-time + throughput meters land in
    # the scalar log
    import json

    scalars = [json.loads(line) for line in
               open(trainer.logger.logdir / "scalars.jsonl")]
    tags = {s["tag"] for s in scalars}
    assert {"train/data_time", "train/batch_time",
            "train/samples_per_s", "train/lr"} <= tags
    n_train_iters = 16 // trainer.batch_size
    assert sum(s["tag"] == "train/samples_per_s" for s in scalars) == n_train_iters
    sps = [s["value"] for s in scalars if s["tag"] == "train/samples_per_s"]
    assert all(v > 0 for v in sps)


@pytest.mark.slow
def test_stage_clip_kill_and_resume_moco(tmp_path):
    """Stage-I crash-resume (ref: train_clip.py:126-159 resume='latest'):
    params + optimizer + EMA/queues (MoCo) + early-stopper state restore and
    training continues from the next epoch. Regression guard for the orbax
    mixed-commitment restore (mesh.commit_to_mesh): without it the first
    resumed jitted step dies with "Received incompatible devices"."""
    import copy
    import logging as pylogging

    import jax

    cfg = copy.deepcopy(TINY_AVCLIP_CFG)
    cfg["logging"] = dict(logdir=str(tmp_path), exp_name="exp0",
                          log_code_state=False)
    cfg["model"]["target"] = "synchformer_tpu.models.moco_clip.MultilevelMoCoCLIP"
    mp = cfg["model"]["params"]
    mp.update(queue_size=8, momentum=0.9)
    for tower in ("afeat_extractor", "vfeat_extractor"):
        mp[tower]["params"].update(add_global_repr=True,
                                   agg_segments_module="TransformerEncoderLayer",
                                   max_segments=cfg["data"]["n_segments"])
    cfg["training"] = dict(cfg["training"], alpha=0.4)

    train_ds = SyntheticAV("train", n_clips=16)
    valid_ds = SyntheticAV("valid", n_clips=8)
    trainer = AVCLIPTrainer(cfg)
    trainer.fit(train_ds, valid_ds, num_workers=2, max_epochs=1,
                decode_backend="synthetic")
    assert trainer.ckpt.latest_step() == 0
    ema_before = np.asarray(jnp.ravel(jnp.asarray(
        trainer._moco["params_m"]["segment_logit_scale"])))

    # simulate a crash: fresh trainer on the same exp dir, resume='latest'
    cfg2 = copy.deepcopy(cfg)
    cfg2["training"] = dict(cfg2["training"], resume="latest")
    trainer2 = AVCLIPTrainer(cfg2)
    with _capture_info() as records:
        results = trainer2.fit(train_ds, valid_ds, num_workers=2, max_epochs=2,
                               decode_backend="synthetic")
    assert any("Stage-I resumed from epoch 0" in r for r in records)
    # only epoch 1 ran after the resume
    assert results["epoch"] == 1
    # the optimizer count carried over: 2 steps/epoch x 2 epochs total
    counts = [leaf for path, leaf in
              jax.tree_util.tree_leaves_with_path(trainer2._state.opt_state)
              if "count" in jax.tree_util.keystr(path)]
    assert counts and all(int(c) == 4 for c in counts)
    # the EMA params resumed from the checkpointed values (a fresh run's EMA
    # would re-start from the re-initialized online params)
    ema_after = np.asarray(jnp.ravel(jnp.asarray(
        trainer2._moco["params_m"]["segment_logit_scale"])))
    assert np.isfinite(ema_after).all()
    assert not np.allclose(ema_after, ema_before)  # epoch 1 kept updating it


import contextlib


@contextlib.contextmanager
def _capture_info():
    import logging as pylogging

    records = []

    class _H(pylogging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage())

    h = _H(level=pylogging.INFO)
    root = pylogging.getLogger()
    old_level = root.level
    root.addHandler(h)
    root.setLevel(pylogging.INFO)
    try:
        yield records
    finally:
        root.removeHandler(h)
        root.setLevel(old_level)
