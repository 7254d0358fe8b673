"""Legacy SparseSync cross-modal transformer.

Capability parity with ref: model/modules/transformer.py:240-319 — the
predecessor of GlobalTransformer used with the S3D/ResNet extractors: dense
feature maps in, factorized learned positional embeddings per modality,
whole-token dropout, [OFF | vis tokens | MOD | aud tokens] sequence through
n_layer pre-LN blocks, bias-free offset head on the OFF token.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from synchformer_tpu.models.layers import PreLNBlock
from synchformer_tpu.models.sync_model import _TokenDropout, randn_init
from synchformer_tpu.registry import instantiate_from_config, register


@register("synchformer_tpu.models.sparsesync.SparseSyncTransformer",
          "model.modules.transformer.Transformer")
class SparseSyncTransformer(nn.Module):
    """vis_embd: (B, Tv, H, W, Dv) feature map; aud_embd: (B, F, Ta, Da)."""

    num_offset_cls: int
    visual_block_shape: Any
    audio_block_shape: Any
    vis_pos_emb_module: Mapping[str, Any]
    aud_pos_emb_module: Mapping[str, Any]
    pre_norm_cfg: Mapping[str, Any]
    n_layer: int = 12
    n_head: int = 8
    n_embd: int = 256
    tok_pdrop: float = 0.0
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.off_tok = self.param("OFF_tok", randn_init, (1, 1, self.n_embd))
        self.mod_tok = self.param("MOD_tok", randn_init, (1, 1, self.n_embd))
        self.pre_lnorm_vis = instantiate_from_config(self.pre_norm_cfg)
        self.pre_lnorm_aud = instantiate_from_config(self.pre_norm_cfg)
        self.vis_pos_emb = instantiate_from_config(self.vis_pos_emb_module)
        self.aud_pos_emb = instantiate_from_config(self.aud_pos_emb_module)
        self.tok_drop_vis = _TokenDropout(self.tok_pdrop)
        self.tok_drop_aud = _TokenDropout(self.tok_pdrop)
        self.drop = nn.Dropout(self.embd_pdrop)
        self.blocks = [
            PreLNBlock(num_heads=self.n_head, mlp_ratio=4.0, qkv_bias=True,
                       ln_eps=1e-5, attn_dropout=self.attn_pdrop,
                       resid_dropout=self.resid_pdrop, dtype=self.dtype,
                       name=f"blocks_{i}")
            for i in range(self.n_layer)
        ]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        # bias-free offset head (ref: transformer.py:268)
        self.off_head = nn.Dense(self.num_offset_cls, use_bias=False,
                                 dtype=self.dtype)

    def __call__(self, vis_embd, aud_embd, deterministic: bool = True):
        b = vis_embd.shape[0]
        assert vis_embd.shape[-1] == aud_embd.shape[-1] == self.n_embd, \
            "define a bridge to match feature dims (ref: transformer.py:283)"

        vis_embd = self.pre_lnorm_vis(vis_embd)
        aud_embd = self.pre_lnorm_aud(aud_embd)
        vis_embd = self.vis_pos_emb(vis_embd)  # (B, t, h, w, D)
        aud_embd = self.aud_pos_emb(aud_embd)  # (B, f, ta, D)

        vis_embd = vis_embd.reshape(b, -1, self.n_embd)
        aud_embd = aud_embd.reshape(b, -1, self.n_embd)
        vis_embd = self.tok_drop_vis(vis_embd, deterministic)
        aud_embd = self.tok_drop_aud(aud_embd, deterministic)

        off = jnp.broadcast_to(self.off_tok.astype(vis_embd.dtype),
                               (b, 1, self.n_embd))
        mod = jnp.broadcast_to(self.mod_tok.astype(vis_embd.dtype),
                               (b, 1, self.n_embd))
        x = jnp.concatenate([off, vis_embd, mod, aud_embd], axis=1)
        x = self.drop(x, deterministic=deterministic)
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        x = self.ln_f(x)
        return self.off_head(x[:, 0, :])
