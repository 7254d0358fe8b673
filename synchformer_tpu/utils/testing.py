"""Synthetic reference-layout checkpoints for converter/integration testing.

Generates PyTorch-layout state dicts with EXACTLY the key names the reference
writes (ref key names from model/sync_model.py, visual/motionformer.py,
audio/hf_src/modeling_ast.py), at arbitrary dims — used by the converter
round-trip test (tiny dims) and the full-size example.py validation (real
dims), since the published checkpoints require network access.
"""
from __future__ import annotations

import numpy as np


def make_sync_reference_sd(rng, d: int = 768, depth: int = 12, n_layer: int = 3,
                           grid_hw: int = 14, f_frames: int = 8,
                           ast_f: int = 12, ast_t: int = 6,
                           patch: int = 16, z_block: int = 2,
                           n_segments: int = 14, num_cls: int = 21,
                           scale: float = 0.02,
                           v_patch: int = None, a_patch: int = None) -> dict:
    """Full Stage-II 'model' state dict in the reference's key layout.

    v_patch/a_patch override the per-tower patch sizes (defaults to `patch`
    for both, the real checkpoints' 16/16 layout)."""
    v_patch = patch if v_patch is None else v_patch
    a_patch = patch if a_patch is None else a_patch

    def r(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def ones(*shape):
        return np.ones(shape, dtype=np.float32)

    def zeros(*shape):
        return np.zeros(shape, dtype=np.float32)

    def enc_layer(sd, p):
        sd[f"{p}.cls_token"] = r(1, 1, d)
        sd[f"{p}.self_attn.in_proj_weight"] = r(3 * d, d)
        sd[f"{p}.self_attn.in_proj_bias"] = zeros(3 * d)
        sd[f"{p}.self_attn.out_proj.weight"] = r(d, d)
        sd[f"{p}.self_attn.out_proj.bias"] = zeros(d)
        sd[f"{p}.linear1.weight"] = r(4 * d, d)
        sd[f"{p}.linear1.bias"] = zeros(4 * d)
        sd[f"{p}.linear2.weight"] = r(d, 4 * d)
        sd[f"{p}.linear2.bias"] = zeros(d)
        for norm in ("norm1", "norm2"):
            sd[f"{p}.{norm}.weight"] = ones(d)
            sd[f"{p}.{norm}.bias"] = zeros(d)

    sd: dict = {}
    # motionformer tower
    p = "vfeat_extractor."
    n_spatial = grid_hw * grid_hw
    sd[p + "cls_token"] = r(1, 1, d)
    sd[p + "pos_embed"] = r(1, n_spatial + 1, d)
    sd[p + "temp_embed"] = r(1, f_frames, d)
    sd[p + "patch_embed_3d.proj.weight"] = r(d, 3, z_block, v_patch, v_patch)
    sd[p + "patch_embed_3d.proj.bias"] = zeros(d)
    sd[p + "norm.weight"] = ones(d)
    sd[p + "norm.bias"] = zeros(d)
    for i in range(depth):
        b = f"{p}blocks.{i}"
        for norm in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{norm}.weight"] = ones(d)
            sd[f"{b}.{norm}.bias"] = zeros(d)
        for attn in ("attn", "timeattn"):
            sd[f"{b}.{attn}.qkv.weight"] = r(3 * d, d)
            sd[f"{b}.{attn}.qkv.bias"] = zeros(3 * d)
            sd[f"{b}.{attn}.proj.weight"] = r(d, d)
            sd[f"{b}.{attn}.proj.bias"] = zeros(d)
        sd[f"{b}.mlp.fc1.weight"] = r(4 * d, d)
        sd[f"{b}.mlp.fc1.bias"] = zeros(4 * d)
        sd[f"{b}.mlp.fc2.weight"] = r(d, 4 * d)
        sd[f"{b}.mlp.fc2.bias"] = zeros(d)
    enc_layer(sd, p + "spatial_attn_agg")

    # AST tower
    p = "afeat_extractor."
    sd[p + "ast.embeddings.cls_token"] = r(1, 1, d)
    sd[p + "ast.embeddings.distillation_token"] = r(1, 1, d)
    sd[p + "ast.embeddings.position_embeddings"] = r(1, 2 + ast_f * ast_t, d)
    sd[p + "ast.embeddings.patch_embeddings.projection.weight"] = r(d, 1, a_patch, a_patch)
    sd[p + "ast.embeddings.patch_embeddings.projection.bias"] = zeros(d)
    sd[p + "ast.layernorm.weight"] = ones(d)
    sd[p + "ast.layernorm.bias"] = zeros(d)
    for i in range(depth):
        b = f"{p}ast.encoder.layer.{i}"
        for qkv in ("query", "key", "value"):
            sd[f"{b}.attention.attention.{qkv}.weight"] = r(d, d)
            sd[f"{b}.attention.attention.{qkv}.bias"] = zeros(d)
        sd[f"{b}.attention.output.dense.weight"] = r(d, d)
        sd[f"{b}.attention.output.dense.bias"] = zeros(d)
        sd[f"{b}.intermediate.dense.weight"] = r(4 * d, d)
        sd[f"{b}.intermediate.dense.bias"] = zeros(4 * d)
        sd[f"{b}.output.dense.weight"] = r(d, 4 * d)
        sd[f"{b}.output.dense.bias"] = zeros(d)
        sd[f"{b}.layernorm_before.weight"] = ones(d)
        sd[f"{b}.layernorm_before.bias"] = zeros(d)
        sd[f"{b}.layernorm_after.weight"] = ones(d)
        sd[f"{b}.layernorm_after.bias"] = zeros(d)
    enc_layer(sd, p + "freq_attn_agg")

    # projections + transformer
    for proj in ("vproj", "aproj"):
        sd[f"{proj}.weight"] = r(d, d)
        sd[f"{proj}.bias"] = zeros(d)
    p = "transformer."
    for norm in ("vis_in_lnorm", "aud_in_lnorm", "ln_f"):
        sd[f"{p}{norm}.weight"] = ones(d)
        sd[f"{p}{norm}.bias"] = zeros(d)
    sd[p + "OFF_tok"] = r(1, 1, d)
    sd[p + "MOD_tok"] = r(1, 1, d)
    seq = 2 + n_segments * f_frames + n_segments * ast_t
    sd[p + "pos_emb_cfg.pos_emb"] = r(1, seq, d)
    for i in range(n_layer):
        b = f"{p}blocks.{i}"
        for norm in ("ln1", "ln2"):
            sd[f"{b}.{norm}.weight"] = ones(d)
            sd[f"{b}.{norm}.bias"] = zeros(d)
        for qkv in ("query", "key", "value", "proj"):
            sd[f"{b}.attn.{qkv}.weight"] = r(d, d)
            sd[f"{b}.attn.{qkv}.bias"] = zeros(d)
        sd[f"{b}.mlp.0.weight"] = r(4 * d, d)
        sd[f"{b}.mlp.0.bias"] = zeros(4 * d)
        sd[f"{b}.mlp.2.weight"] = r(d, 4 * d)
        sd[f"{b}.mlp.2.bias"] = zeros(d)
    sd[p + "off_head.weight"] = r(num_cls, d)
    sd[p + "off_head.bias"] = zeros(num_cls)
    return sd
