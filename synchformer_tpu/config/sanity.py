"""Config cross-field sanity checks (capability of ref: utils/utils.py:95-148).

Validates action/model/data combinations before an expensive run starts.
"""
from __future__ import annotations

from typing import Any, Mapping

VALID_ACTIONS = ("train_avclip", "train_avsync_model",
                 "ft_avsync_model_for_syncability")


def cfg_sanity_check_and_patch(cfg: Mapping[str, Any]) -> Mapping[str, Any]:
    action = cfg.get("action")
    assert action in VALID_ACTIONS, f"unknown action {action!r} (valid: {VALID_ACTIONS})"

    data = cfg.get("data", {})
    training = cfg.get("training", {})

    if action in ("train_avsync_model", "ft_avsync_model_for_syncability"):
        offset_type = data.get("offset_type", "grid")
        if offset_type == "grid":
            assert int(data.get("num_off_cls", 21)) >= 3, "grid needs >= 3 classes"
        if offset_type == "uniform_binary":
            assert data.get("prob_oos") is not None, \
                "uniform_binary offsets need data.prob_oos"
        # the segment layout must fit inside the temporal crop
        n_seg = int(data.get("n_segments", 14))
        step = float(data.get("step_size_seg", 0.5))
        seg_frames = int(data.get("segment_size_vframes", 16))
        vfps = float(data.get("vfps", 25))
        crop_len = float(data.get("crop_len_sec", 5))
        coverage = (n_seg * step + (1 - step)) * seg_frames / vfps
        assert coverage <= crop_len + 1e-6, \
            f"{n_seg} segments (stride {step}) need {coverage:.2f}s > crop {crop_len}s"
        # audio jitter must stay within half a grid cell
        if data.get("audio_jitter_sec"):
            cell = 2 * float(data.get("max_off_sec", 2)) / (int(data.get("num_off_cls", 21)) - 1)
            assert float(data["audio_jitter_sec"]) - 1e-6 <= cell / 2, \
                "audio jitter larger than half a grid cell breaks the labels"

    if action == "ft_avsync_model_for_syncability":
        tfm = cfg.get("model", {}).get("params", {}).get("transformer", {})
        target = tfm.get("target", "")
        assert "Syncability" in target or target == "", \
            "syncability fine-tuning needs the syncability-head transformer"

    if training.get("run_test_only") and training.get("resume"):
        raise AssertionError("run_test_only and resume are mutually exclusive")
    return cfg
