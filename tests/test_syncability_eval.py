"""Unit tests for the tiered syncability evaluation math."""
import numpy as np
import pytest

from synchformer_tpu.train.syncability_eval import (
    roc_outputs,
    tiered_offset_metrics,
)


def _make_logits(rng, n, c, targets, strength=3.0):
    logits = rng.standard_normal((n, c)).astype(np.float32)
    logits[np.arange(n), targets] += strength
    return logits


def test_roc_outputs(tmp_path, rng):
    n = 200
    targets = rng.integers(0, 2, n)
    logits = _make_logits(rng, n, 2, targets)
    out = roc_outputs(logits, targets, save_path=str(tmp_path / "roc.pkl"))
    assert 0.8 < out["roc_curve_sc"] <= 1.0
    assert (tmp_path / "roc.pkl").exists()
    assert len(out["fpr"]) == len(out["tpr"])


def test_tiered_target_swap_penalty(rng):
    """False-syncable clips must not count as offset hits at any tolerance."""
    n, c = 400, 21
    targets_sync = rng.integers(0, 2, n)
    # sync model is perfectly confident but WRONG on half the non-syncable
    logits_sync = np.zeros((n, 2), dtype=np.float32)
    wrong = (targets_sync == 0) & (rng.random(n) < 0.5)
    logits_sync[:, 1] = 10.0  # always predicts syncable with high confidence
    targets_off = rng.integers(0, c, n)
    logits_off = _make_logits(rng, n, c, targets_off, strength=10.0)  # perfect

    out = tiered_offset_metrics(logits_sync, targets_sync, logits_off, targets_off,
                                conf_thresholds=(0.9,))
    m = out[0.9]
    # offset model is perfect, but wrong-syncable items are penalized:
    # accuracy = fraction of items where the sync call was correct
    expected = float((logits_sync.argmax(-1) == targets_sync).mean())
    assert m["accuracy_1"] == pytest.approx(expected, abs=0.01)
    assert m["accuracy_1_tol1"] <= expected + 0.01  # tolerance cannot recover them


def test_tiered_threshold_masking(rng):
    n, c = 100, 21
    targets_sync = np.ones(n, dtype=np.int64)
    logits_sync = np.zeros((n, 2), dtype=np.float32)
    logits_sync[:, 1] = 0.1  # barely above 50% confidence
    targets_off = rng.integers(0, c, n)
    logits_off = _make_logits(rng, n, c, targets_off)
    out = tiered_offset_metrics(logits_sync, targets_sync, logits_off, targets_off,
                                conf_thresholds=(0.5, 0.99))
    assert out[0.5] is not None      # ~52% confidence passes 0.5
    assert out[0.99] is None         # nothing passes 0.99


class _FakeTailLoader:
    """Mimics SyncDataLoader with drop_last=False: 6 real clips at batch_size
    4 -> 2 batches, the second wrap-padded with clips 0,1 (pad_mask=0)."""

    def __init__(self, targets_sync, row_feat):
        self.targets_sync = targets_sync          # (6,)
        self.row_feat = row_feat                  # (6,) float id per clip
        self.order = np.array([0, 1, 2, 3, 4, 5, 0, 1])
        self.pad_mask = np.array([1, 1, 1, 1, 1, 1, 0, 0], dtype=bool)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        for lo in (0, 4):
            idx = self.order[lo:lo + 4]
            yield {
                "video": self.row_feat[idx].reshape(4, 1, 1, 1, 1, 1),
                "audio": self.row_feat[idx].reshape(4, 1, 1),
                "sync_target": self.targets_sync[idx],
                "pad_mask": self.pad_mask[lo:lo + 4],
            }


def test_evaluate_syncability_tail_batch_counts_each_clip_once(rng, tmp_path):
    """N_clips % batch_size != 0 must evaluate exactly N clips (the old CLI
    dropped the tail batch; ref: scripts/test_syncability.py:213-238 keeps it)."""
    from synchformer_tpu.train.metrics import calc_cls_metrics
    from synchformer_tpu.train.syncability_eval import evaluate_syncability

    targets = np.array([0, 1, 0, 1, 1, 0], dtype=np.int64)
    feat = np.arange(6, dtype=np.float32)
    loader = _FakeTailLoader(targets, feat)

    def eval_step(params, batch):
        # deterministic per-clip logits derived from the row id feature
        r = np.asarray(batch["audio"]).reshape(4)
        return np.stack([3.0 - r, r - 3.0 + 0.7], axis=-1).astype(np.float32)

    out = evaluate_syncability(None, None, loader, eval_step,
                               iter_times=2, n_segments_sync=1,
                               logdir=str(tmp_path))
    assert out["n_evaluated"] == 6 * 2  # all 6 clips, twice — no dup, no drop

    # metrics must equal metrics computed on exactly the 6 real clips
    r = feat
    logits = np.stack([3.0 - r, r - 3.0 + 0.7], axis=-1).astype(np.float32)
    logits2 = np.concatenate([logits, logits])
    targets2 = np.concatenate([targets, targets])
    want = {k: round(v, 4) for k, v in
            calc_cls_metrics(targets2, logits2, topk=(1,), verbose=False).items()}
    assert out["metrics_sync"] == want


def test_too_short_video_exclusion_list():
    """The reference protocol drops 10 hardcoded <9.6 s videos before the
    loader (ref: scripts/test_syncability.py:113-125,224-226): a dataset
    containing one of those filenames must evaluate N-1 clips."""
    from synchformer_tpu.data.datasets import SyntheticAV
    from synchformer_tpu.train.syncability_eval import (
        VIDEO_IDS_SHORTER_THAN_9_6_SEC,
        filter_too_short_videos,
    )

    assert len(VIDEO_IDS_SHORTER_THAN_9_6_SEC) == 10
    ds = SyntheticAV("test", n_clips=5)
    n = len(ds.records)
    ds.records[2].path = "/some/vids/8qsCZLEoA1Q_4000_14000.mp4"
    removed = filter_too_short_videos(ds)
    assert removed == 1 and len(ds.records) == n - 1
    assert all("8qsCZLEoA1Q" not in r.path for r in ds.records)
    # idempotent on a clean dataset
    assert filter_too_short_videos(ds) == 0


def test_loader_drop_last_false_pads_tail_with_mask():
    from synchformer_tpu.data.datasets import SyntheticAV
    from synchformer_tpu.data.pipeline import SyncDataLoader
    from synchformer_tpu.data.transforms import SyncPipelineConfig

    cfg = SyncPipelineConfig(n_segments=2, crop_len_sec=1.0, input_size=32,
                             segment_size_vframes=4, audio_jitter_sec=0.0)
    ds = SyntheticAV("test", n_clips=6)
    loader = SyncDataLoader(ds, cfg, batch_size=4, num_workers=2, seed=0,
                            shuffle=False, drop_last=False,
                            decode_backend="synthetic")
    batches = list(loader)
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0]["pad_mask"], [1, 1, 1, 1])
    np.testing.assert_array_equal(batches[1]["pad_mask"], [1, 1, 0, 0])
    # wrap-padding: padded rows duplicate the first clips
    np.testing.assert_array_equal(batches[1]["index"][2:], batches[0]["index"][:2])
