"""End-to-end integration: SyncTrainer on synthetic media with a tiny model.

This is the TPU analogue of the reference's smoke-run practice — the full
stack (decode -> geometry -> device mel/normalize -> towers -> sync
transformer -> loss -> SPMD update -> eval metrics -> early stop/ckpt) runs
for two epochs on the 8-device CPU mesh.
"""
import numpy as np
import pytest

from synchformer_tpu.data.datasets import SyntheticAV
from synchformer_tpu.train.stage_sync import SyncTrainer

D = 32

TINY_MODEL_CFG = dict(
    target="synchformer_tpu.models.sync_model.Synchformer",
    params=dict(
        afeat_extractor=dict(
            target="synchformer_tpu.models.ast_encoder.ASTEncoder",
            params=dict(hidden_size=D, depth=1, num_heads=4, patch_size=16,
                        frequency_stride=10, time_stride=10, num_mel_bins=128,
                        max_spec_t=18)),
        vfeat_extractor=dict(
            target="synchformer_tpu.models.motionformer.MotionFormerEncoder",
            params=dict(embed_dim=D, depth=1, num_heads=4, patch_size=8,
                        z_block_size=2, temporal_resolution=2, img_size=16,
                        drop_path_rate=0.0)),
        aproj=dict(target="torch.nn.Linear",
                   params=dict(in_features=D, out_features=D)),
        vproj=dict(target="torch.nn.Linear",
                   params=dict(in_features=D, out_features=D)),
        transformer=dict(
            target="synchformer_tpu.models.sync_model.GlobalTransformer",
            params=dict(
                n_layer=1, n_head=4, n_embd=D,
                pos_emb_cfg=dict(
                    target="synchformer_tpu.models.pos_emb.RandInitPositionalEncoding",
                    # seq = 2 aux + S*(tv=2) + S*(ta=1), S=3
                    params=dict(block_shape=[2 + 3 * 2 + 3 * 1], n_embd=D)),
                off_head_cfg=dict(target="torch.nn.Linear",
                                  params=dict(in_features=D, out_features=21)))),
    ),
)

TINY_CFG = dict(
    action="train_avsync_model",
    model=TINY_MODEL_CFG,
    training=dict(base_batch_size=8, base_learning_rate=1e-4, num_epochs=2,
                  patience=5, use_half_precision=False, seed=0,
                  lr_scheduler=dict(name="constant", warmup=0),
                  optimizer=dict(name="adam")),
    data=dict(n_segments=3, num_off_cls=21, crop_len_sec=1.0, max_off_sec=2.0,
              step_size_seg=0.5, input_size=16, segment_size_vframes=4,
              audio_jitter_sec=0.0, p_horizontal_flip=0.5),
    logging=dict(logdir="/tmp/synchformer_tpu_test_logs", log_code_state=False),
)


@pytest.mark.slow
def test_sync_trainer_kill_and_resume(tmp_path):
    """Crash-resume parity (ref: train_sync.py:68-99 resume=True): the latest
    checkpoint (saved every epoch) restores params + optimizer + step counter
    + early-stopper state step-exactly, and training continues from the next
    epoch."""
    import copy

    import jax

    from synchformer_tpu.data.pipeline import SyncDataLoader
    from synchformer_tpu.utils.logger import EarlyStopper

    cfg = copy.deepcopy(TINY_CFG)
    cfg["logging"] = dict(logdir=str(tmp_path), exp_name="exp0",
                          log_code_state=False)
    train_ds = SyntheticAV("train", n_clips=16)
    valid_ds = SyntheticAV("valid", n_clips=8)

    trainer = SyncTrainer(cfg)
    trainer.fit(train_ds, valid_ds, None, num_workers=2, max_epochs=2,
                decode_backend="synthetic")
    step_after = int(trainer._state.step)
    assert step_after == 4  # 16 clips / bs 8 = 2 steps x 2 epochs
    saved_leaves = jax.tree.leaves(
        jax.tree.map(np.asarray, trainer._state.trainable))

    # simulate a crash: a fresh process = a fresh trainer on the same exp dir
    cfg2 = copy.deepcopy(cfg)
    cfg2["training"] = dict(cfg2["training"], resume=True)
    trainer2 = SyncTrainer(cfg2)
    loader = SyncDataLoader(valid_ds, trainer2.pipe_cfg, trainer2.batch_size,
                            num_workers=2, seed=0, shuffle=False,
                            decode_backend="synthetic")
    state = trainer2.build_state(next(iter(loader)))
    stopper = EarlyStopper(trainer2.patience, to_max=True)
    state, start_epoch = trainer2.maybe_resume(state, stopper)
    assert start_epoch == 2
    assert int(state.step) == step_after  # step-exact
    for restored, saved in zip(jax.tree.leaves(state.trainable), saved_leaves):
        np.testing.assert_array_equal(np.asarray(restored), saved)
    assert np.isfinite(stopper.best)  # early-stopper state came back too

    # and a full resumed fit continues the epoch/step counters
    trainer3 = SyncTrainer(copy.deepcopy(cfg2))
    trainer3.fit(train_ds, valid_ds, None, num_workers=2, max_epochs=4,
                 decode_backend="synthetic")
    assert int(trainer3._state.step) == 8  # epochs 2-3 added 2 steps each


@pytest.mark.slow
def test_sync_trainer_end_to_end(tmp_path):
    cfg = dict(TINY_CFG)
    cfg["logging"] = dict(logdir=str(tmp_path), log_code_state=False,
                          log_frequency=1)
    trainer = SyncTrainer(cfg)
    train_ds = SyntheticAV("train", n_clips=16)
    valid_ds = SyntheticAV("valid", n_clips=8)
    test_ds = SyntheticAV("test", n_clips=8)
    results = trainer.fit(train_ds, valid_ds, test_ds, num_workers=2,
                          max_epochs=2, decode_backend="synthetic")
    assert "best_valid" in results and "test" in results
    assert np.isfinite(results["test"]["accuracy_1"])
    assert 0.0 <= results["test"]["accuracy_1"] <= 1.0
    # checkpoints were written
    assert trainer.ckpt.latest_step() is not None
    # per-iteration Data(t)/Batch(t)/throughput/LR telemetry at log_frequency
    # (ref: scripts/train_sync.py:219-228; same meter set as Stage I)
    import json

    scalars = [json.loads(line) for line in
               open(trainer.logger.logdir / "scalars.jsonl")]
    tags = {s["tag"] for s in scalars}
    assert {"train/data_time", "train/batch_time", "train/samples_per_s",
            "train/lr", "train/loss_iter"} <= tags
    n_train_iters = 16 // trainer.batch_size * 2  # 2 epochs
    assert sum(s["tag"] == "train/samples_per_s" for s in scalars) == n_train_iters
    assert all(s["value"] > 0 for s in scalars
               if s["tag"] == "train/samples_per_s")


def test_config_driven_tower_trainability(tmp_path):
    """`is_trainable: True` on an extractor (ref: configs/sync.yaml:7,19 +
    scripts/train_utils.py:195-214) puts the tower into the trainable subtree:
    its params change under training while the other tower stays frozen."""
    import copy

    import jax

    cfg = copy.deepcopy(TINY_CFG)
    cfg["logging"] = dict(logdir=str(tmp_path), log_code_state=False)
    cfg["model"]["params"]["vfeat_extractor"]["is_trainable"] = True
    # a higher LR so one step moves the weights measurably
    cfg["training"]["base_learning_rate"] = 1e-2

    trainer = SyncTrainer(cfg)
    assert "v_encoder" in trainer.trainable_keys
    assert "a_encoder" not in trainer.trainable_keys

    rng = np.random.default_rng(0)
    batch = {
        "video": rng.integers(0, 255, (8, 3, 4, 16, 16, 3), dtype=np.uint8),
        "audio": rng.standard_normal((8, 3, 2560)).astype(np.float32),
        "offset_target": rng.integers(0, 21, 8).astype(np.int32),
    }
    state = trainer.build_state(batch)
    assert "v_encoder" in state.trainable and "a_encoder" in state.frozen
    v_before = np.asarray(
        state.trainable["v_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]).copy()
    a_before = np.asarray(
        state.frozen["a_encoder"]["layer_0"]["attn"]["qkv"]["kernel"]).copy()

    trainer._compile_steps()
    dev_batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    state, metrics = trainer._train_step(state, dev_batch, jax.random.PRNGKey(0))
    assert bool(metrics["loss_finite"])

    v_after = np.asarray(
        state.trainable["v_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"])
    a_after = np.asarray(
        state.frozen["a_encoder"]["layer_0"]["attn"]["qkv"]["kernel"])
    assert not np.allclose(v_after, v_before)          # tower trained
    np.testing.assert_array_equal(a_after, a_before)   # other tower frozen
