"""Cross-stage surgery: Stage-II trainer initializes towers from a Stage-I
checkpoint named in the model config (ref: ast.py:113-132,
motionformer.py:156-173)."""
import numpy as np
import pytest
import torch

from synchformer_tpu.utils.checkpoint import extract_tower_from_avclip


def _tiny_avclip_sd(rng):
    """Stage-I layout: a_encoder./v_encoder. prefixes + module. wrapper."""
    from tests.test_converter_full import make_reference_layout_sd

    base = make_reference_layout_sd(rng)
    sd = {}
    for k, v in base.items():
        if k.startswith("afeat_extractor."):
            sd["module.a_encoder." + k[len("afeat_extractor."):]] = torch.from_numpy(v)
        elif k.startswith("vfeat_extractor."):
            sd["module.v_encoder." + k[len("vfeat_extractor."):]] = torch.from_numpy(v)
    sd["module.logit_scale"] = torch.tensor(0.07)
    return {"state_dict": sd}


def test_extract_towers_from_avclip_ckpt(rng):
    ckpt = _tiny_avclip_sd(rng)
    audio = extract_tower_from_avclip(ckpt, "audio")
    visual = extract_tower_from_avclip(ckpt, "visual")
    assert "layer_0" in audio and "patch_embed" in audio
    assert "blocks_0" in visual and "patch_embed_3d" in visual
    # weights flow through (transposed Linear)
    w = np.asarray(audio["layer_0"]["attn"]["proj"]["kernel"])
    assert w.shape == (32, 32)


def test_sync_trainer_tower_init_from_stage1(tmp_path, rng):
    """SyncTrainer picks up tower ckpt_paths from the model config; loaded
    leaves replace the random init, missing leaves (aggregators trained only
    in Stage II) keep their init — the reference's non-strict load."""
    
    from synchformer_tpu.train.stage_sync import SyncTrainer
    from tests.test_trainer import TINY_CFG

    ckpt_path = str(tmp_path / "stage1.pt")
    torch.save(_tiny_avclip_sd(rng), ckpt_path)

    import copy

    cfg = copy.deepcopy(TINY_CFG)
    cfg["logging"] = dict(logdir=str(tmp_path), log_code_state=False)
    cfg["model"]["params"]["afeat_extractor"]["params"]["ckpt_path"] = ckpt_path
    cfg["model"]["params"]["vfeat_extractor"]["params"]["ckpt_path"] = ckpt_path
    trainer = SyncTrainer(cfg)

    batch = {
        "video": rng.integers(0, 255, (8, 3, 4, 16, 16, 3), dtype=np.uint8),
        "audio": rng.standard_normal((8, 3, 2560)).astype(np.float32),
        "offset_target": rng.integers(0, 21, 8).astype(np.int32),
    }
    state = trainer.build_state(batch)
    # a converted leaf matches the ckpt exactly
    expected = np.asarray(
        torch.cat([
            _tiny_avclip_sd_cached["state_dict"]
            ["module.a_encoder.ast.encoder.layer.0.attention.attention.query.weight"].T,
            _tiny_avclip_sd_cached["state_dict"]
            ["module.a_encoder.ast.encoder.layer.0.attention.attention.key.weight"].T,
            _tiny_avclip_sd_cached["state_dict"]
            ["module.a_encoder.ast.encoder.layer.0.attention.attention.value.weight"].T,
        ], dim=1))
    got = np.asarray(state.frozen["a_encoder"]["layer_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(got, expected, atol=1e-6)


# cache the sd so the comparison in the second test sees the same random draw
_tiny_avclip_sd_cached = None


@pytest.fixture(autouse=True)
def _cache_sd(rng, monkeypatch):
    global _tiny_avclip_sd_cached
    import numpy as _np

    _tiny_avclip_sd_cached = _tiny_avclip_sd(_np.random.default_rng(0))
    monkeypatch.setitem(globals(), "_tiny_avclip_sd",
                        lambda r: _tiny_avclip_sd_cached)
    yield
