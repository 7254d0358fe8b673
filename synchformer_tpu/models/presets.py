"""Full-size model presets mirroring the reference configs.

These are the Python-side equivalents of configs/sync.yaml,
configs/ft_synchability.yaml and configs/segment_avclip.yaml model sections;
YAML configs in synchformer_tpu/config/configs/ resolve to the same dicts.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from synchformer_tpu.models.avclip import AVCLIP
from synchformer_tpu.models.sync_model import Synchformer

D = 768
N_OFFSET_CLS = 21


def ast_cfg(dtype=jnp.float32, agg_time_module: str = "Identity",
            add_global_repr: bool = False, max_segments: Optional[int] = None,
            remat: bool = False, attn_impl: str = "xla") -> dict:
    """AST tower config (ref: configs/sync.yaml:6-17). attn_impl='pallas'
    fuses each block's LN+MLP half in VMEM (fwd path)."""
    return dict(
        target="synchformer_tpu.models.ast_encoder.ASTEncoder",
        params=dict(
            max_spec_t=66, factorize_freq_time=True,
            agg_freq_module="TransformerEncoderLayer",
            agg_time_module=agg_time_module,
            add_global_repr=add_global_repr, max_segments=max_segments,
            remat=remat, dtype=dtype, attn_impl=attn_impl,
        ),
    )


def motionformer_cfg(dtype=jnp.float32, agg_time_module: str = "Identity",
                     add_global_repr: bool = False, max_segments: Optional[int] = None,
                     remat: bool = False, attn_impl: str = "xla") -> dict:
    """Motionformer tower config (ref: configs/sync.yaml:18-27,
    divided_224_16x4.yaml). attn_impl='pallas' selects the fused divided
    attention kernel (TPU forward path)."""
    return dict(
        target="synchformer_tpu.models.motionformer.MotionFormerEncoder",
        params=dict(
            factorize_space_time=True,
            agg_space_module="TransformerEncoderLayer",
            agg_time_module=agg_time_module,
            add_global_repr=add_global_repr, max_segments=max_segments,
            remat=remat, dtype=dtype, attn_impl=attn_impl,
        ),
    )


def linear_proj_cfg(dtype=jnp.float32) -> dict:
    return dict(target="torch.nn.Linear",
                params=dict(in_features=D, out_features=D, dtype=dtype))


def global_transformer_cfg(n_segments: int = 14, num_cls: int = N_OFFSET_CLS,
                           syncability: bool = False, dtype=jnp.float32) -> dict:
    """Sync transformer config (ref: configs/sync.yaml:40-59). Sequence length
    = 2 aux + S*8 visual + S*6 audio tokens (198 for S=14, 184 for S=13)."""
    seq_len = 2 + n_segments * 8 + n_segments * 6
    target = ("synchformer_tpu.models.sync_model.GlobalTransformerWithSyncabilityHead"
              if syncability else
              "synchformer_tpu.models.sync_model.GlobalTransformer")
    return dict(
        target=target,
        params=dict(
            n_layer=3, n_head=8, n_embd=D, tok_pdrop=0.0, embd_pdrop=0.1,
            resid_pdrop=0.1, attn_pdrop=0.1, dtype=dtype,
            pos_emb_cfg=dict(
                target="synchformer_tpu.models.pos_emb.RandInitPositionalEncoding",
                params=dict(block_shape=[seq_len], n_embd=D)),
            off_head_cfg=dict(target="torch.nn.Linear",
                              params=dict(in_features=D, out_features=num_cls,
                                          dtype=dtype)),
        ),
    )


def default_attn_impl() -> str:
    """Fused pallas divided attention on TPU, XLA path elsewhere."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def build_synchformer(n_segments: int = 14, syncability: bool = False,
                      dtype=jnp.float32, remat: bool = False,
                      attn_impl: Optional[str] = None) -> Synchformer:
    """Flagship Stage II/III model (ref: configs/sync.yaml model section)."""
    if attn_impl is None:
        attn_impl = default_attn_impl()
    return Synchformer(
        afeat_extractor=ast_cfg(dtype=dtype, remat=remat, attn_impl=attn_impl),
        vfeat_extractor=motionformer_cfg(dtype=dtype, remat=remat,
                                         attn_impl=attn_impl),
        aproj=linear_proj_cfg(dtype=dtype),
        vproj=linear_proj_cfg(dtype=dtype),
        transformer=global_transformer_cfg(n_segments=n_segments,
                                           syncability=syncability, dtype=dtype),
    )


def build_avclip(n_segments_train: int = 14, dtype=jnp.float32,
                 remat: bool = False, gather_for_loss: bool = False,
                 attn_impl: Optional[str] = None) -> AVCLIP:
    """Stage I contrastive model (ref: configs/segment_avclip.yaml). The
    pallas divided attention has a custom VJP (divided_attention_bwd.py), so
    the fast path is usable even though Stage I trains the towers."""
    if attn_impl is None:
        attn_impl = default_attn_impl()
    nothing = dict(target="synchformer_tpu.models.bridges.DoNothingBridge", params={})
    return AVCLIP(
        n_embd=D,
        afeat_extractor=ast_cfg(dtype=dtype, agg_time_module="AveragePooling",
                                max_segments=n_segments_train, remat=remat,
                                attn_impl=attn_impl),
        vfeat_extractor=motionformer_cfg(dtype=dtype, agg_time_module="AveragePooling",
                                         max_segments=n_segments_train, remat=remat,
                                         attn_impl=attn_impl),
        aproj=nothing, vproj=nothing,
        init_scale=0.07, clamp_scale_min=0.001, clamp_scale_max=0.5,
        gather_for_loss=gather_for_loss,
    )


def sync_input_shapes(batch: int = 1, n_segments: int = 14):
    """(vis, aud) shapes for the sync model at full size."""
    return ((batch, n_segments, 16, 224, 224, 3), (batch, n_segments, 66, 128))


# ---------------------------------------------------------------------------
# model reconstruction from the cfg stored inside a checkpoint
# ---------------------------------------------------------------------------

def patch_ckpt_model_cfg(model_cfg: dict) -> dict:
    """The reference's patch_config (ref: example.py:76-84): tower ckpt_paths
    are already merged into the model checkpoint, and legacy configs name the
    transformer under ``model.modules.feature_selector``."""
    import copy

    cfg = copy.deepcopy(model_cfg)
    params = cfg.get("params", {})
    for tower in ("afeat_extractor", "vfeat_extractor"):
        tp = (params.get(tower) or {}).get("params")
        if isinstance(tp, dict) and "ckpt_path" in tp:
            tp["ckpt_path"] = None
    tfm = params.get("transformer")
    if isinstance(tfm, dict) and isinstance(tfm.get("target"), str):
        tfm["target"] = tfm["target"].replace(
            ".modules.feature_selector.", ".sync_model.")
    return cfg


def _inject_tpu_kwargs(node, dtype, attn_impl):
    """Recursively add dtype/attn_impl to target/params nodes whose resolved
    class declares those fields; unknown params (keys from other reference
    code versions) are dropped with a warning instead of crashing."""
    import dataclasses
    import logging

    from synchformer_tpu.registry import get_registered

    if not isinstance(node, dict):
        return node
    if "target" not in node:
        return {k: _inject_tpu_kwargs(v, dtype, attn_impl)
                for k, v in node.items()}
    out = {k: v for k, v in node.items() if k != "params"}
    params = {k: _inject_tpu_kwargs(v, dtype, attn_impl)
              for k, v in (node.get("params") or {}).items()}
    try:
        cls = get_registered(node["target"])
    except KeyError:
        out["params"] = params
        return out
    if dataclasses.is_dataclass(cls):
        names = {f.name for f in dataclasses.fields(cls)}
        unknown = sorted(k for k in params if k not in names)
        if unknown:
            logging.warning("%s: dropping unsupported cfg params %s",
                            node["target"], unknown)
            params = {k: v for k, v in params.items() if k not in unknown}
        if "dtype" in names:
            params.setdefault("dtype", dtype)
        if "attn_impl" in names and attn_impl is not None:
            params.setdefault("attn_impl", attn_impl)
    out["params"] = params
    return out


def build_synchformer_from_ckpt_args(args, dtype=jnp.float32,
                                     attn_impl: Optional[str] = None):
    """Reconstruct the sync model from the training config stored inside a
    checkpoint (``ckpt['args']``; the reference instantiates from the shipped
    cfg-<exp>.yaml which holds the same tree, ref: example.py:104-115).

    Returns ``(model, info)`` — info carries ``target_seq_len`` (pos-emb
    length for checkpoint conversion/trim), ``num_cls``, ``max_off_sec`` and
    the raw ``data`` section for pipeline reconstruction.
    """
    from synchformer_tpu.config.core import Config
    from synchformer_tpu.registry import instantiate_from_config

    if attn_impl is None:
        attn_impl = default_attn_impl()
    cfg = args.to_dict() if isinstance(args, Config) else Config(args).to_dict()
    if "model" not in cfg or "target" not in cfg.get("model", {}):
        raise ValueError("checkpoint args carry no model.target section")
    model_cfg = patch_ckpt_model_cfg(cfg["model"])
    model_cfg = _inject_tpu_kwargs(model_cfg, dtype, attn_impl)
    model = instantiate_from_config(model_cfg)

    tfm_p = (model_cfg.get("params", {}).get("transformer") or {}).get("params", {})
    pos_p = (tfm_p.get("pos_emb_cfg") or {}).get("params", {})
    block_shape = pos_p.get("block_shape") or [None]
    off_p = (tfm_p.get("off_head_cfg") or {}).get("params", {})
    afeat_p = (model_cfg.get("params", {}).get("afeat_extractor") or {}).get(
        "params", {})
    data = cfg.get("data", {}) or {}
    info = dict(
        target_seq_len=block_shape[0],
        num_cls=int(off_p.get("out_features")
                    or data.get("num_off_cls") or N_OFFSET_CLS),
        max_off_sec=float(data.get("max_off_sec") or 2.0),
        max_spec_t=int(afeat_p.get("max_spec_t") or 66),
        num_mel_bins=int(afeat_p.get("num_mel_bins") or 128),
        data=data,
    )
    return model, info
