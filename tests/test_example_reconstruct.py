"""example.py model reconstruction from the checkpoint's embedded config.

The reference instantiates the exact trained architecture from the cfg
shipped with every checkpoint (ref: example.py:104-115 + patch_config at
:76-84); these tests cover the TPU framework's equivalent path:
load_torch_checkpoint (omegaconf-free unpickling) -> plain_from_ckpt_args ->
build_synchformer_from_ckpt_args -> convert_sync_checkpoint.
"""
import pickle
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synchformer_tpu.models.presets import (
    build_synchformer_from_ckpt_args,
    patch_ckpt_model_cfg,
)
from synchformer_tpu.utils.checkpoint import (
    convert_sync_checkpoint,
    load_torch_checkpoint,
    plain_from_ckpt_args,
)

D = 32

# a reference-style cfg at tiny dims: reference target names, a legacy
# transformer target (pre-rename), ${} interpolations, and an unknown param
# key ('legacy_knob') from a hypothetical older code version
REF_STYLE_CFG = {
    "action": "train_avsync_model",
    "model": {
        "target": "model.sync_model.Synchformer",
        "params": {
            "afeat_extractor": {
                "is_trainable": False,
                "target": "model.modules.feat_extractors.audio.ast.AST",
                "params": {
                    "ckpt_path": "/nonexistent/stage1.pt",  # patched to None
                    "extract_features": True,
                    "max_spec_t": 14,
                    "factorize_freq_time": True,
                    "agg_freq_module": "TransformerEncoderLayer",
                    "agg_time_module": "torch.nn.Identity",
                    "add_global_repr": False,
                    "hidden_size": D, "depth": 2, "num_heads": 4,
                    "patch_size": 8, "frequency_stride": 6, "time_stride": 6,
                    "num_mel_bins": 20,
                    "legacy_knob": 123,
                },
            },
            "vfeat_extractor": {
                "is_trainable": False,
                "target": "model.modules.feat_extractors.visual.motionformer.MotionFormer",
                "params": {
                    "ckpt_path": None,
                    "extract_features": True,
                    "factorize_space_time": True,
                    "agg_space_module": "TransformerEncoderLayer",
                    "agg_time_module": "torch.nn.Identity",
                    "add_global_repr": False,
                    "embed_dim": D, "depth": 2, "num_heads": 4,
                    "patch_size": 8, "z_block_size": 2,
                    "temporal_resolution": 2, "img_size": 16,
                    "drop_path_rate": 0.0,
                },
            },
            "aproj": {
                "target": "torch.nn.Linear",
                "params": {"in_features": D,
                           "out_features": "${model.params.transformer.params.n_embd}"},
            },
            "vproj": {
                "target": "torch.nn.Linear",
                "params": {"in_features": D,
                           "out_features": "${model.params.transformer.params.n_embd}"},
            },
            "transformer": {
                # legacy name: patch_ckpt_model_cfg renames to .sync_model.
                "target": "model.modules.feature_selector.GlobalTransformer",
                "params": {
                    "n_layer": 1, "n_head": 4, "n_embd": D,
                    "tok_pdrop": 0.0, "embd_pdrop": 0.1,
                    "resid_pdrop": 0.1, "attn_pdrop": 0.1,
                    "pos_emb_cfg": {
                        "target": "model.modules.transformer.RandInitPositionalEncoding",
                        "params": {"block_shape": [14], "n_embd": D},
                    },
                    "off_head_cfg": {
                        "target": "torch.nn.Linear",
                        "params": {"in_features": D,
                                   "out_features": "${data.num_off_cls}"},
                    },
                },
            },
        },
    },
    "data": {"num_off_cls": 21, "max_off_sec": 2.0, "crop_len_sec": 1.0,
             "n_segments": 3, "segment_size_vframes": 4, "input_size": 16,
             "step_size_seg": 0.5},
}


def test_patch_nulls_tower_ckpts_and_renames_legacy_transformer():
    patched = patch_ckpt_model_cfg(REF_STYLE_CFG["model"])
    p = patched["params"]
    assert p["afeat_extractor"]["params"]["ckpt_path"] is None
    assert p["transformer"]["target"] == "model.sync_model.GlobalTransformer"
    # original untouched
    assert REF_STYLE_CFG["model"]["params"]["transformer"]["target"].startswith(
        "model.modules.feature_selector.")


def test_build_from_ckpt_args_runs_forward(rng):
    model, info = build_synchformer_from_ckpt_args(REF_STYLE_CFG)
    assert info["target_seq_len"] == 14
    assert info["num_cls"] == 21          # resolved from ${data.num_off_cls}
    assert info["max_spec_t"] == 14
    assert info["data"]["n_segments"] == 3

    vis = jnp.asarray(rng.standard_normal((1, 3, 4, 16, 16, 3)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((1, 3, 14, 20)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), vis, aud)["params"]
    _, logits = model.apply({"params": params}, vis, aud)
    assert logits.shape == (1, 21)


def test_build_from_ckpt_args_requires_model_section():
    with pytest.raises(ValueError):
        build_synchformer_from_ckpt_args({"data": {}})


def _fake_omegaconf_modules():
    """Pickle-source stand-ins for omegaconf containers: same module paths and
    state layout (_content / _val) as the real classes, so the loader's stub
    path is exercised exactly as with a reference checkpoint."""
    base = types.ModuleType("omegaconf")
    dictconfig = types.ModuleType("omegaconf.dictconfig")
    listconfig = types.ModuleType("omegaconf.listconfig")
    nodes = types.ModuleType("omegaconf.nodes")

    class DictConfig:
        def __init__(self, content):
            self._content = content
            self._metadata = {"object_type": dict}

    class ListConfig:
        def __init__(self, content):
            self._content = content

    class AnyNode:
        def __init__(self, val):
            self._val = val

    DictConfig.__module__ = "omegaconf.dictconfig"
    DictConfig.__qualname__ = "DictConfig"
    ListConfig.__module__ = "omegaconf.listconfig"
    ListConfig.__qualname__ = "ListConfig"
    AnyNode.__module__ = "omegaconf.nodes"
    AnyNode.__qualname__ = "AnyNode"
    dictconfig.DictConfig = DictConfig
    listconfig.ListConfig = ListConfig
    nodes.AnyNode = AnyNode
    base.dictconfig = dictconfig
    base.listconfig = listconfig
    base.nodes = nodes
    return {"omegaconf": base, "omegaconf.dictconfig": dictconfig,
            "omegaconf.listconfig": listconfig, "omegaconf.nodes": nodes}


def test_load_torch_checkpoint_unpickles_omegaconf_args(tmp_path):
    import torch

    mods = _fake_omegaconf_modules()
    DictConfig = mods["omegaconf.dictconfig"].DictConfig
    ListConfig = mods["omegaconf.listconfig"].ListConfig
    AnyNode = mods["omegaconf.nodes"].AnyNode

    args = DictConfig({
        "action": AnyNode("train_avsync_model"),
        "data": DictConfig({"num_off_cls": AnyNode(21),
                            "missing": AnyNode("???"),
                            "grid": ListConfig([AnyNode(1), AnyNode(2)])}),
    })
    path = tmp_path / "ckpt.pt"
    sys.modules.update(mods)
    try:
        torch.save({"model": {"w": torch.zeros(2)}, "args": args}, path)
    finally:
        for name in mods:
            sys.modules.pop(name, None)

    # omegaconf is NOT importable here: weights_only=True fails on the custom
    # classes and the stub unpickler takes over
    with pytest.raises(ImportError):
        import omegaconf  # noqa: F401
    ckpt = load_torch_checkpoint(str(path))
    plain = plain_from_ckpt_args(ckpt["args"])
    assert plain == {"action": "train_avsync_model",
                     "data": {"num_off_cls": 21, "missing": None,
                              "grid": [1, 2]}}


def test_example_path_end_to_end_from_embedded_cfg(rng, tmp_path):
    """The full example.py path on a synthetic .pt: embedded cfg -> model ->
    converted params -> forward (VERDICT r2 Missing #2 'Done' criterion)."""
    import torch

    from tests.test_converter_full import SEQ, make_reference_layout_sd

    sd = {k: torch.from_numpy(v) for k, v in make_reference_layout_sd(rng).items()}
    path = tmp_path / "exp.pt"
    torch.save({"model": sd, "args": REF_STYLE_CFG}, path)

    ckpt = load_torch_checkpoint(str(path))
    args = plain_from_ckpt_args(ckpt["args"])
    model, info = build_synchformer_from_ckpt_args(args)
    assert info["target_seq_len"] == SEQ
    params = convert_sync_checkpoint(ckpt, target_seq_len=info["target_seq_len"])
    params = jax.tree.map(jnp.asarray, params)

    vis = jnp.asarray(rng.standard_normal((1, 3, 4, 16, 16, 3)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((1, 3, 14, 20)).astype(np.float32))
    _, logits = model.apply({"params": params}, vis, aud)
    assert logits.shape == (1, 21)
    assert np.isfinite(np.asarray(logits)).all()
