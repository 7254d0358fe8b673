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
