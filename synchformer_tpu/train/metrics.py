"""Classification metrics + cross-host result gathering.

Capability parity with ref: scripts/train_utils.py:632-742 —

- ``calc_cls_metrics``: accuracy@k (sklearn top-k on softmax scores; binary
  uses the positive-class score), accuracy@k_tol1 (±1-class tolerance — the
  headline "Acc@1 ±1 cls" metric; with add_doubt_cls the doubt-class items
  are excluded), one-vs-rest mAP / mROCAUC / d-prime with the reference's
  dummy values when classes are missing from targets, binary P/R/F1
- non-finite logits are replaced with random values with a warning
  (ref: train_utils.py:660-663)
- ``gather_dict``: lists/arrays concatenate across processes, floats average
  (ref: train_utils.py:615-629) via multihost_utils.process_allgather.
"""
from __future__ import annotations

import logging
from typing import Dict, Sequence

import numpy as np
from scipy import stats
from sklearn.metrics import (
    average_precision_score,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
    top_k_accuracy_score,
)


def _softmax(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def calc_cls_metrics(targets, outputs, topk: Sequence[int] = (1, 5),
                     only_accuracy: bool = False, prefix: str = "",
                     verbose: bool = True, add_doubt_cls: bool = False,
                     calc_tol_accuracy: bool = True,
                     softmaxed_outputs: bool = False,
                     calc_pr_rec_f1: bool = False) -> Dict[str, float]:
    """targets: (N,) int; outputs: (N, C) logits (or probs if softmaxed_outputs)."""
    if prefix and not prefix.endswith("_"):
        prefix = prefix + "_"  # ref: utils/utils.py:90-93 (fix_prefix)
    targets = np.asarray(targets)
    outputs = np.asarray(outputs, dtype=np.float64)
    n, num_cls = outputs.shape
    topk = [min(k, num_cls) for k in topk]
    out: Dict[str, float] = {}

    if not np.isfinite(outputs).all():
        if verbose:
            logging.warning("non-finite logits; replacing with random values "
                            "(reference behavior, ref: train_utils.py:660-663)")
        outputs = np.random.default_rng(0).random(outputs.shape)

    scores = outputs if softmaxed_outputs else _softmax(outputs)
    preds = np.argsort(-outputs, axis=1)[:, : max(topk)]  # (N, max_k) class ids

    for k in topk:
        if num_cls == 2:
            if k == 2:
                continue  # silence the degenerate binary top-2
            out[f"{prefix}accuracy_{k}"] = float(top_k_accuracy_score(
                targets, scores[:, 1], k=k, labels=range(num_cls)))
        else:
            out[f"{prefix}accuracy_{k}"] = float(top_k_accuracy_score(
                targets, scores, k=k, labels=range(num_cls)))

    if calc_tol_accuracy:
        if add_doubt_cls:
            # doubt/extreme-offset class sits last and is excluded from
            # tolerance metrics (ref: train_utils.py:684-691)
            num_off_cls = num_cls - 1
            keep = targets != num_cls - 1
            t_tol, p_tol = targets[keep], preds[keep]
        else:
            num_off_cls = num_cls
            t_tol, p_tol = targets, preds
        t_exp = np.broadcast_to(t_tol[:, None], p_tol.shape)
        candidates = np.stack([
            np.clip(t_exp - 1, 0, num_off_cls - 1),
            t_exp,
            np.clip(t_exp + 1, 0, num_off_cls - 1),
        ])
        correct_w_tol = (p_tol[None] == candidates).any(axis=0)  # (N, max_k)
        for k in topk:
            tps = correct_w_tol[:, :k].any(axis=1).sum()
            out[f"{prefix}accuracy_{k}_tol1"] = float(tps / (len(correct_w_tol) + 1e-7))

    if only_accuracy:
        return out

    unique_targets = sorted(set(targets.tolist()))
    if len(unique_targets) < num_cls:
        if verbose:
            logging.warning(f"some classes never occur in targets: {unique_targets}; "
                            "returning dummy mAP/mROCAUC/dprime (reference behavior)")
        out[f"{prefix}mAP"] = 0.0
        out[f"{prefix}mROCAUC"] = 0.5
        out[f"{prefix}dprime"] = 0.0
        return out

    onehot = np.zeros((n, num_cls))
    onehot[np.arange(n), targets] = 1.0
    avg_p = [average_precision_score(onehot[:, c], scores[:, c]) for c in range(num_cls)]
    roc_aucs = [roc_auc_score(onehot[:, c], scores[:, c]) for c in range(num_cls)]
    out[f"{prefix}mAP"] = float(np.mean(avg_p))
    out[f"{prefix}mROCAUC"] = float(np.mean(roc_aucs))
    out[f"{prefix}dprime"] = float(stats.norm.ppf(out[f"{prefix}mROCAUC"]) * np.sqrt(2))

    if calc_pr_rec_f1:
        out[f"{prefix}precision"] = float(precision_score(targets, preds[:, 0],
                                                          zero_division=0.0))
        out[f"{prefix}recall"] = float(recall_score(targets, preds[:, 0],
                                                    zero_division=0.0))
        out[f"{prefix}f1"] = float(f1_score(targets, preds[:, 0], zero_division=0.0))
    return out


def per_class_accuracy(targets, logits) -> Dict[object, float]:
    """Per-class accuracy + median (ref: train_utils.py:416-430)."""
    targets = np.asarray(targets)
    preds = np.asarray(logits).argmax(axis=1)
    accs: Dict[object, float] = {}
    for c in np.unique(targets):
        mask = targets == c
        accs[int(c)] = float((preds[mask] == c).mean())
    accs["median"] = float(np.median([v for k, v in accs.items() if k != "median"]))
    return accs


def gather_dict(results: Dict[str, object]) -> Dict[str, object]:
    """Cross-host gather with the reference's reduce semantics: lists/arrays
    concatenate across processes, floats average (ref: train_utils.py:615-629).
    Single-process is the identity."""
    import jax

    if jax.process_count() == 1:
        return results
    from jax.experimental import multihost_utils

    out: Dict[str, object] = {}
    for key, value in results.items():
        if isinstance(value, (list, np.ndarray)):
            arr = np.asarray(value)
            gathered = multihost_utils.process_allgather(arr)
            out[key] = gathered.reshape(-1, *arr.shape[1:])
        elif isinstance(value, (int, float)):
            gathered = multihost_utils.process_allgather(np.asarray(value))
            out[key] = float(np.mean(gathered))
        else:
            out[key] = value
    return out
