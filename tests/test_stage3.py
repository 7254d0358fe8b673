"""Stage-III (syncability fine-tune) integration: the trainer switches to the
2-class head, the syncability label-maker, and S=13-style segment layout."""
import copy

import numpy as np
import pytest

from synchformer_tpu.data.datasets import SyntheticAV
from synchformer_tpu.train.stage_sync import SyncTrainer

from tests.test_trainer import TINY_CFG


def _stage3_cfg(tmp_path):
    cfg = copy.deepcopy(TINY_CFG)
    cfg["action"] = "ft_avsync_model_for_syncability"
    cfg["logging"] = dict(logdir=str(tmp_path), log_code_state=False)
    tfm = cfg["model"]["params"]["transformer"]
    tfm["target"] = ("synchformer_tpu.models.sync_model."
                     "GlobalTransformerWithSyncabilityHead")
    cfg["data"]["crop_len_sec"] = 0.32
    return cfg


def _synthetic_stage2_torch_ckpt(path, n_segments=4):
    """Stage-II ckpt at the tiny-trainer dims with a LONGER pos emb than the
    Stage-III model (S=4 -> seq 14 vs the model's S=3 -> seq 11), so the
    load has to exercise the trim rule (ref: sync_model.py:101-114)."""
    import torch

    from synchformer_tpu.utils.testing import make_sync_reference_sd

    rng = np.random.default_rng(7)
    sd = make_sync_reference_sd(rng, d=32, depth=1, n_layer=1, grid_hw=2,
                                f_frames=2, ast_f=12, ast_t=1, z_block=2,
                                v_patch=8, a_patch=16,
                                n_segments=n_segments, num_cls=21)
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                "args": {}, "epoch": 5, "metrics": {"accuracy_1": 0.4}},
               str(path))
    return sd


def test_stage3_finetune_surgery(tmp_path):
    """Stage-II -> Stage-III checkpoint surgery (ref: train_sync.py:68-99 +
    sync_model.py:101-114): non-strict load where the fresh 2-class sync_head
    survives as a missing key, the matching 21-class off_head is loaded, and
    the sync pos emb is trimmed from the ckpt's longer sequence."""
    from synchformer_tpu.data.pipeline import SyncDataLoader
    from synchformer_tpu.utils.logger import EarlyStopper

    ckpt_path = tmp_path / "stage2.pt"
    sd = _synthetic_stage2_torch_ckpt(ckpt_path)

    cfg = _stage3_cfg(tmp_path)
    cfg["training"] = dict(cfg["training"], finetune=True,
                           ckpt_path=str(ckpt_path))
    trainer = SyncTrainer(cfg)
    loader = SyncDataLoader(SyntheticAV("valid", n_clips=8), trainer.pipe_cfg,
                            trainer.batch_size, num_workers=2,
                            seed=0, shuffle=False, decode_backend="synthetic")
    state = trainer.build_state(next(iter(loader)))
    fresh_sync_head = np.asarray(
        state.trainable["sync_transformer"]["sync_head"]["kernel"])
    stopper = EarlyStopper(5, to_max=True)
    state, start_epoch = trainer.maybe_resume(state, stopper)

    st = state.trainable["sync_transformer"]
    assert start_epoch == 0  # finetune resets counters (ref: train_sync.py:84)
    # pos emb trimmed 14 -> 11 and equal to the ckpt's first 11 positions
    assert st["pos_emb"]["pos_emb"].shape == (1, 11, 32)
    np.testing.assert_allclose(np.asarray(st["pos_emb"]["pos_emb"]),
                               sd["transformer.pos_emb_cfg.pos_emb"][:, :11])
    # the ckpt's 21-class off_head is dropped: the syncability model never
    # calls it, so (unlike torch's eager registration) flax materializes no
    # dead params for it — the non-strict merge reports it as unexpected
    assert "off_head" not in st
    # matching keys loaded from the ckpt (torch Linear weights transposed)
    np.testing.assert_allclose(np.asarray(st["blocks_0"]["ln1"]["scale"]),
                               sd["transformer.blocks.0.ln1.weight"])
    np.testing.assert_allclose(np.asarray(st["blocks_0"]["mlp"]["fc1"]["kernel"]),
                               sd["transformer.blocks.0.mlp.0.weight"].T)
    # the fresh syncability head survived the non-strict merge
    np.testing.assert_array_equal(
        np.asarray(st["sync_head"]["kernel"]), fresh_sync_head)
    # frozen towers took the ckpt values too
    np.testing.assert_allclose(
        np.asarray(state.frozen["v_encoder"]["cls_token"]),
        sd["vfeat_extractor.cls_token"])


@pytest.mark.slow
def test_stage3_finetune_end_to_end(tmp_path):
    """One full fine-tuning epoch from a converted Stage-II checkpoint — the
    published Stage-III workflow (ref: scripts/train_sync.py finetune=True)."""
    ckpt_path = tmp_path / "stage2.pt"
    _synthetic_stage2_torch_ckpt(ckpt_path)
    cfg = _stage3_cfg(tmp_path)
    cfg["training"] = dict(cfg["training"], finetune=True,
                           ckpt_path=str(ckpt_path))
    trainer = SyncTrainer(cfg)
    results = trainer.fit(SyntheticAV("train", n_clips=16),
                          SyntheticAV("valid", n_clips=8),
                          SyntheticAV("test", n_clips=8),
                          num_workers=2, max_epochs=1,
                          decode_backend="synthetic")
    assert np.isfinite(results["test"]["accuracy_1"])


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
