"""Factorized feature aggregation: CLS-pooling encoder layers.

The reference aggregates tower features with a single
nn.TransformerEncoderLayer (norm_first) that prepends a learnable CLS token
and returns its representation (ref: visual/motionformer.py:275-393,
audio/ast.py:253-279). Used as:

- spatial agg:   per-frame attention over 14x14 tokens -> (BS, t, D)
- frequency agg: per-timestep attention over 12 freq tokens -> (BS, t, D)
- temporal agg:  attention over t tokens -> (BS, D)
- global agg:    attention over S segments with pos emb -> (B, D)

TPU-first: the folded axis (time/frames) is treated as a batch dim of one
dense attention call — XLA batches the (65-197 token) attentions onto the MXU.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from synchformer_tpu.models.layers import PreLNBlock
from synchformer_tpu.registry import register

trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class CLSPoolEncoderLayer(nn.Module):
    """Prepend CLS -> one pre-LN encoder layer -> return CLS representation.

    Mirrors BaseEncoderLayer (ref: visual/motionformer.py:275-347): d_model D,
    nhead heads, ffn 4D, exact GELU, norm_first, ln eps 1e-6; optional learned
    pos-emb of length 1+pos_max_len with dropout (used for global/segment
    aggregation, ref: motionformer.py:144-152, ast.py:91-101).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    ln_eps: float = 1e-6
    add_pos_emb: bool = False
    pos_max_len: Optional[int] = None
    pos_emb_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"  # 'pallas' fuses the block's LN+MLP half in VMEM

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True):
        """x: (B, N, D); keep_mask: (B, N) with 1 = keep. Returns (B, D)."""
        b, n, d = x.shape
        cls = self.param("cls_token", trunc02, (1, 1, d))
        # The CLS token is the same row for every batch element, so it is
        # passed as PreLNBlock's cls_row instead of materializing the
        # (B, 1+N, D) concat (the fused pallas kernel prepends its K/V in
        # VMEM; non-fused branches concat inside the block — same math).
        # Masked or dropout-active-pos-emb inputs keep the explicit concat.
        cls_vec = cls[0]  # (1, D)
        split_cls = keep_mask is None and (deterministic
                                           or self.pos_emb_drop == 0.0)
        if self.add_pos_emb:
            assert self.pos_max_len is not None
            pos = self.param("pos_emb", trunc02, (1, 1 + self.pos_max_len, d))
            if split_cls:
                cls_vec = cls_vec + pos[0, :1]
                x = x + pos[:, 1: 1 + n].astype(x.dtype)
        if not split_cls:
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, d)), x], axis=1)
            if keep_mask is not None:
                keep_mask = jnp.concatenate(
                    [jnp.ones((b, 1), dtype=bool), keep_mask.astype(bool)],
                    axis=1)
            if self.add_pos_emb:
                x = x + pos[:, : 1 + n].astype(x.dtype)
                x = nn.Dropout(self.pos_emb_drop)(
                    x, deterministic=deterministic)
        # Only the CLS row is returned, so the block computes just that row:
        # Q/attention/MLP/residual restricted to row 0, K/V over all tokens —
        # exact (row-wise ops), ~6x cheaper at the spatial aggregator's shape.
        x = PreLNBlock(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
            ln_eps=self.ln_eps, attn_dropout=self.dropout, resid_dropout=self.dropout,
            dtype=self.dtype, impl=self.impl, name="block",
        )(x, keep_mask=keep_mask, deterministic=deterministic, query_rows=1,
          cls_row=cls_vec if split_cls else None)
        return x[:, 0, :]


class SpatialAggregator(nn.Module):
    """(BS, t, h, w, D) -> (BS, t, D): per-frame CLS attention over h*w tokens
    (ref: SpatialTransformerEncoderLayer, motionformer.py:350-375)."""

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True):
        bs, t, h, w, d = x.shape
        flat = x.reshape(bs * t, h * w, d)
        mask = keep_mask.reshape(bs * t, h * w) if keep_mask is not None else None
        out = CLSPoolEncoderLayer(
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            impl=self.impl, name="cls_layer",
        )(flat, keep_mask=mask, deterministic=deterministic)
        return out.reshape(bs, t, d)


class FrequencyAggregator(nn.Module):
    """(BS, f, t, D) -> (BS, t, D): per-timestep CLS attention over f tokens
    (ref: FrequencyTransformerEncoderLayer, audio/ast.py:253-279)."""

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True):
        bs, f, t, d = x.shape
        flat = jnp.swapaxes(x, 1, 2).reshape(bs * t, f, d)  # time folded into batch
        mask = (jnp.swapaxes(keep_mask, 1, 2).reshape(bs * t, f)
                if keep_mask is not None else None)
        out = CLSPoolEncoderLayer(
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            impl=self.impl, name="cls_layer",
        )(flat, keep_mask=mask, deterministic=deterministic)
        return out.reshape(bs, t, d)


class TemporalAggregator(nn.Module):
    """(B, t, D) -> (B, D). With add_pos_emb=True this is the global segment
    aggregator (ref: TemporalTransformerEncoderLayer, motionformer.py:378-393)."""

    num_heads: int
    dropout: float = 0.0
    add_pos_emb: bool = False
    pos_max_len: Optional[int] = None
    pos_emb_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return CLSPoolEncoderLayer(
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype,
            add_pos_emb=self.add_pos_emb, pos_max_len=self.pos_max_len,
            pos_emb_drop=self.pos_emb_drop, impl=self.impl, name="cls_layer",
        )(x, deterministic=deterministic)


@register("synchformer_tpu.models.aggregators.AveragePooling")
class AveragePooling(nn.Module):
    """einops-style mean-reduce aggregation (ref: motionformer.py:395-409)."""

    avg_pattern: str
    then_permute_pattern: Optional[str] = None

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True):
        import einops

        x = einops.reduce(x, self.avg_pattern, "mean")
        if self.then_permute_pattern is not None:
            x = einops.rearrange(x, self.then_permute_pattern)
        return x
