"""Synchformer: the flagship audio-visual offset model (Stage II/III).

Capability parity with ref: model/sync_model.py —

- ``Synchformer``: two frozen segment-level towers -> per-modality linear
  projections -> segment-flattened token sequences -> cross-modal
  ``GlobalTransformer`` -> 21-class offset logits + CE loss
  (ref: sync_model.py:38-70).
- ``GlobalTransformer``: per-modality input LayerNorm, learnable OFF/MOD
  tokens, sequence ``[OFF, v..., MOD, a...]`` (198 tokens for S=14), learned
  pos-emb, 3 pre-LN blocks (8 heads, D=768), final LN, linear offset head
  (ref: sync_model.py:117-173).
- ``GlobalTransformerWithSyncabilityHead``: offset head replaced by identity,
  2-class synchronizability head on the OFF token (ref: sync_model.py:176-190).

TPU-first notes: the whole forward is one jittable function; segment axes are
folded into the batch inside the towers; everything is static-shape. Token
dropout (tok_pdrop) drops whole tokens via a (B, N, 1) bernoulli mask —
torch's Dropout1d semantics without the channel transpose dance.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from synchformer_tpu.models.layers import PreLNBlock
from synchformer_tpu.registry import instantiate_from_config, register

normal02 = nn.initializers.normal(stddev=0.02)
randn_init = nn.initializers.normal(stddev=1.0)


class _TokenDropout(nn.Module):
    """Whole-token dropout (torch Dropout1d on (B, N, D) token sequences)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, x.shape[:-1] + (1,))
        return x * keep / (1.0 - self.rate)


@register("synchformer_tpu.models.sync_model.GlobalTransformer",
          "model.sync_model.GlobalTransformer")
class GlobalTransformer(nn.Module):
    n_layer: int = 3
    n_head: int = 8
    n_embd: int = 768
    tok_pdrop: float = 0.0
    embd_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    pos_emb_cfg: Optional[Mapping[str, Any]] = None
    off_head_cfg: Optional[Mapping[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vis_in_lnorm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.aud_in_lnorm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.off_tok = self.param("OFF_tok", randn_init, (1, 1, self.n_embd))
        self.mod_tok = self.param("MOD_tok", randn_init, (1, 1, self.n_embd))
        self.tok_drop_vis = _TokenDropout(self.tok_pdrop)
        self.tok_drop_aud = _TokenDropout(self.tok_pdrop)
        if self.pos_emb_cfg is not None:
            self.pos_emb = instantiate_from_config(self.pos_emb_cfg)
        self.drop = nn.Dropout(self.embd_pdrop)
        self.blocks = [
            PreLNBlock(
                num_heads=self.n_head, mlp_ratio=4.0, qkv_bias=True, ln_eps=1e-5,
                attn_dropout=self.attn_pdrop, resid_dropout=self.resid_pdrop,
                dtype=self.dtype, name=f"blocks_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        if self.off_head_cfg is not None:
            self.off_head = instantiate_from_config(self.off_head_cfg)

    def encode(self, v, a, deterministic: bool = True):
        """Shared stem: returns the full (B, 2+Sv+Sa, D) sequence after ln_f."""
        b = v.shape[0]
        v = self.vis_in_lnorm(v)
        a = self.aud_in_lnorm(a)
        v = self.tok_drop_vis(v, deterministic)
        a = self.tok_drop_aud(a, deterministic)
        off = jnp.broadcast_to(self.off_tok.astype(v.dtype), (b, 1, self.n_embd))
        mod = jnp.broadcast_to(self.mod_tok.astype(v.dtype), (b, 1, self.n_embd))
        x = jnp.concatenate([off, v, mod, a], axis=1)
        if self.pos_emb_cfg is not None:
            x = self.pos_emb(x)
        x = self.drop(x, deterministic=deterministic)
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return self.ln_f(x)

    def __call__(self, v, a, deterministic: bool = True,
                 attempt_to_apply_heads: bool = True):
        x = self.encode(v, a, deterministic)
        if attempt_to_apply_heads and self.off_head_cfg is not None:
            return self.off_head(x[:, 0, :])
        return x


@register("synchformer_tpu.models.sync_model.GlobalTransformerWithSyncabilityHead",
          "model.sync_model.GlobalTransformerWithSyncabilityHead")
class GlobalTransformerWithSyncabilityHead(GlobalTransformer):
    """Stage III head: 2-class synchronizability logits from the OFF token."""

    def setup(self):
        super().setup()
        self.sync_head = nn.Dense(2, dtype=self.dtype, kernel_init=normal02)

    def __call__(self, v, a, deterministic: bool = True,
                 attempt_to_apply_heads: bool = True):
        x = self.encode(v, a, deterministic)
        return self.sync_head(x[:, 0, :])


@register("synchformer_tpu.models.sync_model.Synchformer",
          "model.sync_model.Synchformer")
class Synchformer(nn.Module):
    """Full model: extractors + projections + cross-modal transformer.

    ``__call__(vis, aud, targets)`` returns ``(loss, logits)`` like the
    reference (loss is None without targets).

    Shapes (channels-last, TPU layout):
      vis: (B, S, Tv, H, W, C)   — e.g. (B, 14, 16, 224, 224, 3)
      aud: (B, S, T_spec, F)     — e.g. (B, 14, 66, 128) log-mel
      targets: (B,) int32 offset class
    """

    afeat_extractor: Mapping[str, Any]
    vfeat_extractor: Mapping[str, Any]
    aproj: Mapping[str, Any]
    vproj: Mapping[str, Any]
    transformer: Mapping[str, Any]

    def setup(self):
        self.a_encoder = instantiate_from_config(self.afeat_extractor)
        self.v_encoder = instantiate_from_config(self.vfeat_extractor)
        self.a_proj = instantiate_from_config(self.aproj)
        self.v_proj = instantiate_from_config(self.vproj)
        self.sync_transformer = instantiate_from_config(self.transformer)

    def extract_vfeats(self, vis, deterministic: bool = True, vis_mask=None):
        feats, _ = self.v_encoder(vis, keep_mask=vis_mask, deterministic=deterministic)
        return feats  # (B, S, tv, D)

    def extract_afeats(self, aud, deterministic: bool = True, aud_mask=None):
        feats, _ = self.a_encoder(aud, keep_mask=aud_mask, deterministic=deterministic)
        return feats  # (B, S, ta, D)

    def __call__(self, vis, aud, targets=None, deterministic: bool = True,
                 vis_mask=None, aud_mask=None, loss_fn: Optional[str] = None,
                 extractors_deterministic: Optional[bool] = None):
        # Stage II freezes the towers AND keeps them in eval mode while the
        # sync transformer trains (ref: scripts/train_utils.py:195-214,330-344);
        # extractors_deterministic=True reproduces that; None follows the
        # global flag (Stage III fine-tunes everything).
        if extractors_deterministic is None:
            extractors_deterministic = deterministic
        vis = self.extract_vfeats(vis, extractors_deterministic, vis_mask)
        aud = self.extract_afeats(aud, extractors_deterministic, aud_mask)

        vis = self.v_proj(vis)
        aud = self.a_proj(aud)

        # flatten segments into one token sequence (ref: sync_model.py:58-62)
        b, s, tv, d = vis.shape
        _, _, ta, _ = aud.shape
        vis = vis.reshape(b, s * tv, d)
        aud = aud.reshape(b, s * ta, d)

        logits = self.sync_transformer(vis, aud, deterministic=deterministic)
        loss = self.compute_loss(logits, targets, loss_fn)
        return loss, logits

    def compute_loss(self, logits, targets, loss_fn: Optional[str] = None):
        if targets is None:
            return None
        if loss_fn is None or loss_fn == "cross_entropy":
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), targets).mean()
        raise NotImplementedError(f"loss {loss_fn} not implemented")
