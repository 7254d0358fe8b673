"""Syncability evaluation CLI (parity with ref: scripts/test_syncability.py).

Usage:
  python scripts/test_syncability.py \
      ckpt_sync=./checkpoints/24-01-22T20-34-52.pt \
      [ckpt_off=./checkpoints/24-01-04T16-39-21.pt] \
      vids_path=/path/to/vggsound splits_path=./data \
      [iter_times=25] [batch_size=8] [logdir=./logs/syncability]

Loads the Stage-III syncability model (S=13, 2-class head) and optionally the
Stage-II offset model (S=14, 21-class head); evaluates on
VGGSoundSparsePickedCleanTest with iter_times repeated passes; writes the ROC
pickle and the tiered per-confidence-threshold offset metrics
(ref: test_syncability.py:277-387; the sync model sees the first 13 of 14
segments, ref: :282-284).
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main():
    logging.basicConfig(level=logging.INFO)
    kv = dict(item.split("=", 1) for item in sys.argv[1:] if "=" in item)

    import jax
    import jax.numpy as jnp

    from synchformer_tpu.data.datasets import VGGSoundSparsePickedCleanTest
    from synchformer_tpu.data.pipeline import SyncDataLoader
    from synchformer_tpu.data.transforms import SyncPipelineConfig
    from synchformer_tpu.models.presets import build_synchformer
    from synchformer_tpu.ops.mel import MelSpectrogramConfig, log_mel_spectrogram
    from synchformer_tpu.ops.video import prepare_video_batch
    from synchformer_tpu.train.syncability_eval import evaluate_syncability
    from synchformer_tpu.utils.checkpoint import (
        convert_sync_checkpoint,
        load_torch_checkpoint,
    )

    iter_times = int(kv.get("iter_times", 25))
    batch_size = int(kv.get("batch_size", 8))
    logdir = kv.get("logdir", "./logs/syncability")
    dtype = jnp.bfloat16

    model_sync = build_synchformer(n_segments=13, syncability=True, dtype=dtype)
    params_sync = convert_sync_checkpoint(
        load_torch_checkpoint(kv["ckpt_sync"]), target_seq_len=184)

    model_off = params_off = None
    if "ckpt_off" in kv:
        model_off = build_synchformer(n_segments=14, dtype=dtype)
        params_off = convert_sync_checkpoint(
            load_torch_checkpoint(kv["ckpt_off"]), target_seq_len=198)

    mel_cfg = MelSpectrogramConfig()

    def make_eval_step(model):
        @jax.jit
        def step(params, batch):
            vis = prepare_video_batch(batch["video"], train=False, dtype=dtype)
            mel = log_mel_spectrogram(batch["audio"], mel_cfg)
            aud = jnp.swapaxes(mel, -1, -2).astype(dtype)
            _, logits = model.apply({"params": params}, vis, aud)
            return logits.astype(jnp.float32)

        return step

    # data: 14-segment batches with syncability labels; the sync model slices
    # the first 13 segments inside evaluate_syncability
    ds = VGGSoundSparsePickedCleanTest(
        "test", kv["vids_path"], splits_path=kv.get("splits_path", "./data"))
    # reference protocol: drop the 10 hardcoded videos shorter than 9.6 s
    # (ref: scripts/test_syncability.py:113-125,224-226)
    from synchformer_tpu.train.syncability_eval import filter_too_short_videos
    filter_too_short_videos(ds)
    pipe_cfg = SyncPipelineConfig(n_segments=14, for_syncability=True)
    # drop_last=False: evaluate the FULL filtered set — tail batches are
    # wrap-padded and evaluate_syncability drops the duplicates via pad_mask
    # (ref: scripts/test_syncability.py:213-238 evaluates every clip)
    loader = SyncDataLoader(ds, pipe_cfg, batch_size, num_workers=6,
                            shuffle=False, drop_last=False)

    out = evaluate_syncability(
        model_sync, params_sync, loader, make_eval_step(model_sync),
        model_off=model_off, params_off=params_off,
        eval_step_off=make_eval_step(model_off) if model_off else None,
        iter_times=iter_times, n_segments_sync=13, logdir=logdir)

    print("syncability metrics:", out["metrics_sync"])
    print("mean one-vs-rest ROC-AUC:", out["roc"]["roc_curve_sc"])
    if "tiered" in out:
        for thresh, metrics in out["tiered"].items():
            print(f"confidence > {thresh}: {metrics}")


if __name__ == "__main__":
    main()
