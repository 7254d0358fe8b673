"""AST audio tower (Audio Spectrogram Transformer), TPU-native.

Re-designs the reference's modified HF AST
(ref: model/modules/feat_extractors/audio/{ast.py,hf_src/modeling_ast.py})
as a flax module:

- patch embed: conv 16x16, stride (10, 10) over (mel=128, time=66) ->
  (12, 6) grid -> 72 tokens + CLS + DIST = 74 (ref: modeling_ast.py:75-81)
- 12 pre-LN ViT-B layers (eps 1e-12, exact GELU), final LayerNorm
- trimmed positional embedding sized for max_spec_t (the reference loads the
  1214-token AudioSet pos-emb and slices it to 74; the converter performs the
  trim, ref: audio/ast.py:240-245)
- factorized freq->time aggregation: per-timestep CLS attention over the 12
  frequency tokens -> (BS, 6, D) (ref: audio/ast.py:253-279)
- content masks become token keep-masks via min-pooling over the (overlapping)
  patch windows — the XLA-native equivalent of the reference's inf-indicator
  trick (ref: modeling_ast.py:515-532); overlapping stride handled by
  reduce_window with stride < kernel.
- segment axis folds into batch; `remat=True` replaces the reference's
  `for_loop` memory mode (ref: audio/ast.py:152-168).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from synchformer_tpu.models.aggregators import (
    AveragePooling,
    FrequencyAggregator,
    TemporalAggregator,
)
from synchformer_tpu.models.layers import PreLNBlock
from synchformer_tpu.registry import register

trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


@register("synchformer_tpu.models.ast_encoder.ASTEncoder",
          "model.modules.feat_extractors.audio.ast.AST")
class ASTEncoder(nn.Module):
    """AST tower + factorized frequency/time aggregation.

    Input:  (B, S, T, F) log-mel segments (T=max_spec_t=66, F=128 mel bins)
    Output: (features, global_features)
            features: (B, S, t, D) with t=6 if agg_time_module='Identity'
                      (sync config), else (B, S, D)
            global_features: (B, D) if add_global_repr else None
    """

    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 16
    frequency_stride: int = 10
    time_stride: int = 10
    num_mel_bins: int = 128
    max_spec_t: int = 66
    ln_eps: float = 1e-12  # HF ASTConfig.layer_norm_eps
    hidden_dropout: float = 0.0
    attn_dropout: float = 0.0
    extract_features: bool = True
    factorize_freq_time: bool = True
    agg_freq_module: str = "TransformerEncoderLayer"
    agg_time_module: str = "Identity"
    add_global_repr: bool = False
    max_segments: Optional[int] = None
    num_labels: int = 527  # AudioSet head (classification mode only)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"  # 'pallas' fuses each block's LN+MLP half in VMEM
    # reference-config compatibility: checkpoint loading/conversion is handled
    # by synchformer_tpu.utils.checkpoint, not the module (ref: ast.py:49-58)
    ckpt_path: Optional[str] = None
    feat_type: Optional[str] = None
    agg_segments_module: Optional[str] = None

    @property
    def grid_ft(self):
        f = (self.num_mel_bins - self.patch_size) // self.frequency_stride + 1
        t = (self.max_spec_t - self.patch_size) // self.time_stride + 1
        return f, t

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True):
        b, s, t_spec, f_spec = x.shape
        fdim, tdim = self.grid_ft
        d = self.hidden_size

        # (BS, F, T, 1): the patch conv scans frequency-major so that flattening
        # (f, t) row-major matches the reference token order
        # (ref: modeling_ast.py:113-117: conv over (1, F, T), flatten(2))
        flat = x.reshape(b * s, t_spec, f_spec).astype(self.dtype)
        img = jnp.swapaxes(flat, 1, 2)[..., None]  # (BS, F, T, 1)
        tokens = nn.Conv(
            features=d, kernel_size=(self.patch_size, self.patch_size),
            strides=(self.frequency_stride, self.time_stride),
            padding="VALID", dtype=self.dtype, name="patch_embed",
        )(img)  # (BS, fdim, tdim, D)
        tokens = tokens.reshape(b * s, fdim * tdim, d)

        tok_keep = None
        if keep_mask is not None:
            km = jnp.swapaxes(keep_mask.reshape(b * s, t_spec, f_spec), 1, 2)
            km = km.astype(jnp.float32)[..., None]
            pooled = jax.lax.reduce_window(
                km, 1.0, jax.lax.min,
                (1, self.patch_size, self.patch_size, 1),
                (1, self.frequency_stride, self.time_stride, 1), "VALID")
            tok_keep = pooled.reshape(b * s, fdim * tdim) > 0.5
            tok_keep = jnp.concatenate([jnp.ones((b * s, 2), bool), tok_keep], axis=1)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        dist = self.param("distillation_token", nn.initializers.zeros, (1, 1, d))
        aux = jnp.concatenate([cls, dist], axis=1).astype(tokens.dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(aux, (b * s, 2, d)), tokens], axis=1)  # (BS, 2+ft, D)

        pos = self.param("position_embeddings", trunc02, (1, 2 + fdim * tdim, d))
        tokens = tokens + pos.astype(tokens.dtype)
        tokens = nn.Dropout(self.hidden_dropout)(tokens, deterministic=deterministic)

        impl = "pallas" if self.attn_impl in ("pallas", "pallas_fused") else "xla"
        block_cls = PreLNBlock
        if self.remat:
            block_cls = nn.remat(PreLNBlock, static_argnums=(3,))
        for i in range(self.depth):
            tokens = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                ln_eps=self.ln_eps, attn_dropout=self.attn_dropout,
                resid_dropout=self.hidden_dropout, dtype=self.dtype,
                impl=impl, name=f"layer_{i}",
            )(tokens, tok_keep, deterministic)

        tokens = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="layernorm")(tokens)

        if not self.extract_features:
            # classification mode (ASTForAudioClassification parity,
            # ref: modeling_ast.py:578-662): mean of CLS+DIST -> MLP head
            pooled = (tokens[:, 0] + tokens[:, 1]) / 2.0
            pooled = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                                  name="classifier_layernorm")(pooled)
            logits = nn.Dense(self.num_labels, dtype=self.dtype,
                              name="classifier_dense")(pooled)
            return logits.reshape(b, s, -1), None

        feats = tokens[:, 2:, :].reshape(b * s, fdim, tdim, d)
        feat_keep = None
        if tok_keep is not None:
            feat_keep = tok_keep[:, 2:].reshape(b * s, fdim, tdim)

        if self.factorize_freq_time:
            if self.agg_freq_module == "TransformerEncoderLayer":
                feats = FrequencyAggregator(
                    num_heads=self.num_heads, dropout=self.attn_dropout,
                    dtype=self.dtype, impl=impl, name="freq_attn_agg",
                )(feats, keep_mask=feat_keep, deterministic=deterministic)
            elif self.agg_freq_module == "AveragePooling":
                feats = AveragePooling(avg_pattern="bs f t d -> bs t d",
                                       name="freq_attn_agg")(feats)
            if self.agg_time_module == "TransformerEncoderLayer":
                feats = TemporalAggregator(
                    num_heads=self.num_heads, dropout=self.attn_dropout,
                    dtype=self.dtype, impl=impl, name="temp_attn_agg",
                )(feats, deterministic=deterministic)
            elif self.agg_time_module == "AveragePooling":
                feats = AveragePooling(avg_pattern="bs t d -> bs d",
                                       name="temp_attn_agg")(feats)
        else:
            feats = feats.reshape(b * s, fdim * tdim, d)

        feats = feats.reshape(b, s, *feats.shape[1:])

        global_feats = None
        if self.add_global_repr:
            assert feats.ndim == 3, "global repr expects (B, S, D) features"
            pos_max_len = self.max_segments if self.max_segments is not None else 16
            global_feats = TemporalAggregator(
                num_heads=self.num_heads, dropout=self.attn_dropout,
                add_pos_emb=True, pos_max_len=pos_max_len,
                pos_emb_drop=self.hidden_dropout, dtype=self.dtype,
                impl=impl, name="global_attn_agg",
            )(feats, deterministic=deterministic)

        return feats, global_feats
