"""Stage-III (syncability fine-tune) integration: the trainer switches to the
2-class head, the syncability label-maker, and S=13-style segment layout."""
import copy

import numpy as np
import pytest

from synchformer_tpu.data.datasets import SyntheticAV
from synchformer_tpu.train.stage_sync import SyncTrainer

from tests.test_trainer import TINY_CFG


@pytest.mark.slow
def test_stage3_syncability_end_to_end(tmp_path):
    cfg = copy.deepcopy(TINY_CFG)
    cfg["action"] = "ft_avsync_model_for_syncability"
    cfg["logging"] = dict(logdir=str(tmp_path), log_code_state=False)
    tfm = cfg["model"]["params"]["transformer"]
    tfm["target"] = ("synchformer_tpu.models.sync_model."
                     "GlobalTransformerWithSyncabilityHead")
    # syncability crop for n_segments=3, seg=4 frames @25fps: 2 segs coverage
    cfg["data"]["crop_len_sec"] = 0.32

    trainer = SyncTrainer(cfg)
    assert trainer.target_key == "sync_target"
    assert trainer.num_cls == 2
    assert trainer.pipe_cfg.for_syncability

    results = trainer.fit(SyntheticAV("train", n_clips=16),
                          SyntheticAV("valid", n_clips=8),
                          SyntheticAV("test", n_clips=8),
                          num_workers=2, max_epochs=1, iter_times=2,
                          decode_backend="synthetic")
    assert "test" in results
    assert np.isfinite(results["test"]["accuracy_1"])
    # binary metrics present (syncability protocol)
    assert "precision" in results["test"]
