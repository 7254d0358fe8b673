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
