"""Full Stage-II checkpoint conversion: a synthetic torch-layout state dict
with EVERY key the reference writes (ref key names from model/sync_model.py,
visual/motionformer.py, audio/ast.py) must convert into a params tree that
matches Synchformer.init exactly (names + shapes) and run a forward pass."""
import chex
import jax
import jax.numpy as jnp
import numpy as np

from synchformer_tpu.models.sync_model import Synchformer
from synchformer_tpu.utils.checkpoint import convert_sync_checkpoint

D, HEADS, DEPTH = 32, 4, 2
F_FRAMES, GRID = 2, 2          # motionformer: temporal_resolution 2, 2x2 grid
AST_F, AST_T = 3, 2            # ast grid: mel 20 / patch 8 / stride 6; spec_t 14
SEQ = 2 + 3 * (F_FRAMES + AST_T)  # 2 aux + S*(tv + ta), S=3 -> tv=2, ta=2


def _r(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _torch_encoder_layer_sd(sd, p, rng, d=D):
    sd[f"{p}.cls_token"] = _r(rng, 1, 1, d)
    sd[f"{p}.self_attn.in_proj_weight"] = _r(rng, 3 * d, d)
    sd[f"{p}.self_attn.in_proj_bias"] = _r(rng, 3 * d)
    sd[f"{p}.self_attn.out_proj.weight"] = _r(rng, d, d)
    sd[f"{p}.self_attn.out_proj.bias"] = _r(rng, d)
    sd[f"{p}.linear1.weight"] = _r(rng, 4 * d, d)
    sd[f"{p}.linear1.bias"] = _r(rng, 4 * d)
    sd[f"{p}.linear2.weight"] = _r(rng, d, 4 * d)
    sd[f"{p}.linear2.bias"] = _r(rng, d)
    for norm in ("norm1", "norm2"):
        sd[f"{p}.{norm}.weight"] = _r(rng, d)
        sd[f"{p}.{norm}.bias"] = _r(rng, d)


def make_reference_layout_sd(rng):
    sd = {}
    # --- motionformer tower (vfeat_extractor.) ---------------------------
    p = "vfeat_extractor."
    n_spatial = GRID * GRID
    sd[p + "cls_token"] = _r(rng, 1, 1, D)
    sd[p + "pos_embed"] = _r(rng, 1, n_spatial + 1, D)
    sd[p + "temp_embed"] = _r(rng, 1, F_FRAMES, D)
    sd[p + "patch_embed_3d.proj.weight"] = _r(rng, D, 3, 2, 8, 8)
    sd[p + "patch_embed_3d.proj.bias"] = _r(rng, D)
    sd[p + "norm.weight"] = _r(rng, D)
    sd[p + "norm.bias"] = _r(rng, D)
    for i in range(DEPTH):
        b = f"{p}blocks.{i}"
        for norm in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{norm}.weight"] = _r(rng, D)
            sd[f"{b}.{norm}.bias"] = _r(rng, D)
        for attn in ("attn", "timeattn"):
            sd[f"{b}.{attn}.qkv.weight"] = _r(rng, 3 * D, D)
            sd[f"{b}.{attn}.qkv.bias"] = _r(rng, 3 * D)
            sd[f"{b}.{attn}.proj.weight"] = _r(rng, D, D)
            sd[f"{b}.{attn}.proj.bias"] = _r(rng, D)
        sd[f"{b}.mlp.fc1.weight"] = _r(rng, 4 * D, D)
        sd[f"{b}.mlp.fc1.bias"] = _r(rng, 4 * D)
        sd[f"{b}.mlp.fc2.weight"] = _r(rng, D, 4 * D)
        sd[f"{b}.mlp.fc2.bias"] = _r(rng, D)
    _torch_encoder_layer_sd(sd, p + "spatial_attn_agg", rng)

    # --- AST tower (afeat_extractor.) -------------------------------------
    p = "afeat_extractor."
    sd[p + "ast.embeddings.cls_token"] = _r(rng, 1, 1, D)
    sd[p + "ast.embeddings.distillation_token"] = _r(rng, 1, 1, D)
    sd[p + "ast.embeddings.position_embeddings"] = _r(rng, 1, 2 + AST_F * AST_T, D)
    sd[p + "ast.embeddings.patch_embeddings.projection.weight"] = _r(rng, D, 1, 8, 8)
    sd[p + "ast.embeddings.patch_embeddings.projection.bias"] = _r(rng, D)
    sd[p + "ast.layernorm.weight"] = _r(rng, D)
    sd[p + "ast.layernorm.bias"] = _r(rng, D)
    for i in range(DEPTH):
        b = f"{p}ast.encoder.layer.{i}"
        for qkv in ("query", "key", "value"):
            sd[f"{b}.attention.attention.{qkv}.weight"] = _r(rng, D, D)
            sd[f"{b}.attention.attention.{qkv}.bias"] = _r(rng, D)
        sd[f"{b}.attention.output.dense.weight"] = _r(rng, D, D)
        sd[f"{b}.attention.output.dense.bias"] = _r(rng, D)
        sd[f"{b}.intermediate.dense.weight"] = _r(rng, 4 * D, D)
        sd[f"{b}.intermediate.dense.bias"] = _r(rng, 4 * D)
        sd[f"{b}.output.dense.weight"] = _r(rng, D, 4 * D)
        sd[f"{b}.output.dense.bias"] = _r(rng, D)
        sd[f"{b}.layernorm_before.weight"] = _r(rng, D)
        sd[f"{b}.layernorm_before.bias"] = _r(rng, D)
        sd[f"{b}.layernorm_after.weight"] = _r(rng, D)
        sd[f"{b}.layernorm_after.bias"] = _r(rng, D)
    _torch_encoder_layer_sd(sd, p + "freq_attn_agg", rng)

    # --- projections + sync transformer -----------------------------------
    for proj in ("vproj", "aproj"):
        sd[f"{proj}.weight"] = _r(rng, D, D)
        sd[f"{proj}.bias"] = _r(rng, D)
    p = "transformer."
    for norm in ("vis_in_lnorm", "aud_in_lnorm", "ln_f"):
        sd[f"{p}{norm}.weight"] = _r(rng, D)
        sd[f"{p}{norm}.bias"] = _r(rng, D)
    sd[p + "OFF_tok"] = _r(rng, 1, 1, D)
    sd[p + "MOD_tok"] = _r(rng, 1, 1, D)
    sd[p + "pos_emb_cfg.pos_emb"] = _r(rng, 1, SEQ + 6, D)  # longer: gets trimmed
    b = f"{p}blocks.0"
    for norm in ("ln1", "ln2"):
        sd[f"{b}.{norm}.weight"] = _r(rng, D)
        sd[f"{b}.{norm}.bias"] = _r(rng, D)
    for qkv in ("query", "key", "value", "proj"):
        sd[f"{b}.attn.{qkv}.weight"] = _r(rng, D, D)
        sd[f"{b}.attn.{qkv}.bias"] = _r(rng, D)
    sd[f"{b}.mlp.0.weight"] = _r(rng, 4 * D, D)
    sd[f"{b}.mlp.0.bias"] = _r(rng, 4 * D)
    sd[f"{b}.mlp.2.weight"] = _r(rng, D, 4 * D)
    sd[f"{b}.mlp.2.bias"] = _r(rng, D)
    sd[p + "off_head.weight"] = _r(rng, 21, D)
    sd[p + "off_head.bias"] = _r(rng, 21)
    return sd


def test_full_sync_checkpoint_roundtrip(rng):
    from tests.test_models import TINY_AUD, TINY_PROJ, TINY_TRANSFORMER, TINY_VIS

    transformer = dict(TINY_TRANSFORMER,
                       params=dict(TINY_TRANSFORMER["params"], n_layer=1))
    model = Synchformer(afeat_extractor=TINY_AUD, vfeat_extractor=TINY_VIS,
                        aproj=TINY_PROJ, vproj=TINY_PROJ, transformer=transformer)
    vis = jnp.asarray(rng.standard_normal((1, 3, 4, 16, 16, 3)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((1, 3, 14, 20)).astype(np.float32))
    init_params = model.init(jax.random.PRNGKey(0), vis, aud)["params"]

    sd = make_reference_layout_sd(rng)
    ckpt = {"model": sd, "args": {"dummy_cfg": True}}
    converted = convert_sync_checkpoint(ckpt, target_seq_len=SEQ, n_layer=1,
                                        tower_depth=DEPTH)
    converted = jax.tree.map(jnp.asarray, converted)

    # exact structural match: same key paths, same shapes
    chex.assert_trees_all_equal_shapes(init_params, converted)

    # converted params run end-to-end
    loss, logits = model.apply({"params": converted}, vis, aud,
                               jnp.asarray([5]))
    assert logits.shape == (1, 21)
    assert np.isfinite(float(loss))
