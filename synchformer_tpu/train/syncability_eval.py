"""Synchronizability evaluation, optionally tiered with the offset model.

Capability parity with ref: scripts/test_syncability.py:128-393 —

- evaluates the Stage-III sync(ability) model (S=13) and optionally the
  Stage-II offset model (S=14) on the same clips; the sync model sees the
  first 13 of the 14 segments (ref: test_syncability.py:282-284)
- iter_times repeated passes (random offsets resampled each pass)
- ROC curve values + mean one-vs-rest ROC-AUC, pickled
- **tiered evaluation**: for confidence thresholds [0.5 .. 0.99], keep only
  clips the syncability model calls syncable; clips it wrongly calls syncable
  get their offset target swapped to (pred+5) % num_cls so the offset model
  cannot score on them even with the ±1 tolerance (ref: :355-381)
"""
from __future__ import annotations

import logging
import pickle
from pathlib import Path
from typing import Dict, Optional

import numpy as np
from sklearn.metrics import roc_auc_score, roc_curve

from synchformer_tpu.train.metrics import calc_cls_metrics

CONF_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99)

# The reference's eval protocol hardcodes 10 VGGSound test videos shorter
# than 9.6 s and drops them before building the loader
# (ref: scripts/test_syncability.py:113-125, applied at :224-226).
VIDEO_IDS_SHORTER_THAN_9_6_SEC = frozenset({
    "-7tYmeOmsRg_180000_190000.mp4",
    "1_Q80fDGLRM_10000_20000.mp4",
    "8qsCZLEoA1Q_4000_14000.mp4",
    "F9bJVVYgFl4_73000_83000.mp4",
    "KQAR_64a35I_11000_21000.mp4",
    "TgJHM5oSWio_8000_18000.mp4",
    "U9PyY8Ldf9A_5000_15000.mp4",
    "aUfDxRelPHg_22000_32000.mp4",
    "cLpDBj--as0_8000_18000.mp4",
    "cRT5SWbyA54_4000_14000.mp4",
})


def filter_too_short_videos(dataset) -> int:
    """Drop the reference protocol's too-short-video exclusion list from a
    dataset's records in place; returns how many were removed
    (ref: scripts/test_syncability.py:224-226)."""
    before = len(dataset.records)
    dataset.records = [r for r in dataset.records
                       if Path(r.path).name not in VIDEO_IDS_SHORTER_THAN_9_6_SEC]
    removed = before - len(dataset.records)
    if removed:
        logging.info(f"filtered {removed} too-short (<9.6 s) videos "
                     "from the eval set")
    return removed


def _softmax(x):
    z = x - x.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def roc_outputs(logits_sync: np.ndarray, targets_sync: np.ndarray,
                save_path: Optional[str] = None) -> Dict:
    """One-vs-rest mean ROC-AUC + binary ROC curve on the syncable class."""
    probs = _softmax(logits_sync)
    n, num_cls = logits_sync.shape
    onehot = np.zeros((n, num_cls))
    onehot[np.arange(n), targets_sync] = 1
    aucs = [roc_auc_score(onehot[:, c], probs[:, c]) for c in range(num_cls)]
    fpr, tpr, thresholds = roc_curve(targets_sync, probs[:, 1], pos_label=1)
    out = {"fpr": fpr, "tpr": tpr, "thresholds": thresholds,
           "roc_curve_sc": float(np.mean(aucs))}
    if save_path is not None:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        with open(save_path, "wb") as f:
            pickle.dump(out, f)
        logging.info(f"saved ROC curve to {save_path}")
    return out


def tiered_offset_metrics(logits_sync: np.ndarray, targets_sync: np.ndarray,
                          logits_off: np.ndarray, targets_off: np.ndarray,
                          conf_thresholds=CONF_THRESHOLDS) -> Dict[float, Dict]:
    """Offset metrics restricted to clips the sync model deems syncable, with
    the false-syncable target-swap penalty (ref: test_syncability.py:355-381)."""
    probs_syncable = _softmax(logits_sync)[:, 1]
    num_cls = logits_off.shape[-1]
    out: Dict[float, Dict] = {}
    for t in conf_thresholds:
        mask = probs_syncable > t
        if mask.sum() == 0:
            out[t] = None
            continue
        ls, ts = logits_sync[mask], targets_sync[mask]
        lo, to = logits_off[mask], targets_off[mask].copy()
        wrong_sync = ls.argmax(-1) != ts
        # unpredictable fake targets: +5 so the ±1 tolerance cannot catch them
        fake = (lo.argmax(-1) + 5) % num_cls
        to[wrong_sync] = fake[wrong_sync]
        out[t] = {k: round(v, 4)
                  for k, v in calc_cls_metrics(to, lo, verbose=False).items()}
    return out


def evaluate_syncability(model_sync, params_sync, loader, eval_step_sync,
                         model_off=None, params_off=None, eval_step_off=None,
                         iter_times: int = 1, n_segments_sync: int = 13,
                         logdir: str = "./logs/syncability",
                         phase: str = "test") -> Dict:
    """Run the (optionally tiered) eval. eval_step_* are jitted fns
    (params, batch-slice) -> logits; batches carry 14 segments."""
    results = {"logits_sync": [], "targets_sync": [],
               "logits_off": [], "targets_off": []}
    tiered = model_off is not None
    for it in range(iter_times):
        loader.set_epoch(it)
        for batch in loader:
            # keep only real rows: the loader pads the tail batch by wrapping
            # around (pad_mask=0 on duplicates) so jit shapes stay static; the
            # reference evaluates the full filtered set
            # (ref: scripts/test_syncability.py:213-238)
            keep = np.asarray(batch.get(
                "pad_mask", np.ones(len(batch["video"]), dtype=bool)))
            sync_batch = {"video": batch["video"][:, :n_segments_sync],
                          "audio": batch["audio"][:, :n_segments_sync]}
            logits_sync = np.asarray(eval_step_sync(params_sync, sync_batch))
            results["logits_sync"].append(logits_sync[keep])
            results["targets_sync"].append(np.asarray(batch["sync_target"])[keep])
            if tiered:
                off_batch = {"video": batch["video"], "audio": batch["audio"]}
                logits_off = np.asarray(eval_step_off(params_off, off_batch))
                results["logits_off"].append(logits_off[keep])
                results["targets_off"].append(
                    np.asarray(batch["offset_target"])[keep])

    logits_sync = np.concatenate(results["logits_sync"])
    targets_sync = np.concatenate(results["targets_sync"])
    out: Dict = {"n_evaluated": int(len(targets_sync))}
    out["roc"] = roc_outputs(logits_sync, targets_sync,
                             save_path=str(Path(logdir) / f"roc_{phase}.pkl"))
    out["metrics_sync"] = {
        k: round(v, 4)
        for k, v in calc_cls_metrics(targets_sync, logits_sync, topk=(1,),
                                     verbose=False).items()}
    if tiered:
        out["tiered"] = tiered_offset_metrics(
            logits_sync, targets_sync,
            np.concatenate(results["logits_off"]),
            np.concatenate(results["targets_off"]))
        with open(Path(logdir) / f"metrics_{phase}.pkl", "wb") as f:
            pickle.dump(out["tiered"], f)
    return out
