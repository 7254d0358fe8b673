"""ResNet-18 audio tower (legacy SparseSync extractor), TPU-native.

Capability parity with ref: model/modules/feat_extractors/audio/resnet.py —
torchvision ResNet-18 with a single-channel stem over (F, T) spectrograms
(embed dim 512), with the same factorized frequency->time aggregation
interface as ASTEncoder: (B, S, T, F) -> ((B, S, t, 512) | (B, S, 512), global).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from synchformer_tpu.models.aggregators import (
    AveragePooling,
    FrequencyAggregator,
    TemporalAggregator,
)
from synchformer_tpu.registry import register

BN_KW = dict(epsilon=1e-5, momentum=0.9, use_bias=True, use_scale=True)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding="SAME", use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1", **BN_KW)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2", **BN_KW)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                    name="downsample_bn", **BN_KW)(residual)
        return nn.relu(y + residual)


@register("synchformer_tpu.models.resnet_audio.ResNet18AudioFeatures",
          "model.modules.feat_extractors.audio.resnet.ResNet18AudioFeatures")
class ResNet18AudioFeatures(nn.Module):
    """ResNet-18 trunk (1-channel stem) + factorized (f, t) aggregation."""

    embed_dim: int = 512
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    num_heads: int = 8
    drop_rate: float = 0.0
    factorize_freq_time: bool = True
    agg_freq_module: str = "TransformerEncoderLayer"
    agg_time_module: str = "Identity"
    add_global_repr: bool = False
    max_segments: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    # config-compat fields
    ckpt_path: Optional[str] = None
    extract_features: bool = True
    feat_type: Optional[str] = None
    max_spec_t: Optional[int] = None
    agg_segments_module: Optional[str] = None

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True):
        assert keep_mask is None, "content masks not supported by the ResNet path"
        train = not deterministic
        b, s, t_spec, f_spec = x.shape
        # (BS, F, T, 1) — frequency as height, time as width (ref:
        # resnet.py:195-197 rearranges 'B S T F -> (B S) 1 F T')
        y = jnp.swapaxes(x.reshape(b * s, t_spec, f_spec), 1, 2)[..., None]
        y = y.astype(self.dtype)

        y = nn.Conv(64, (7, 7), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1", **BN_KW)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), (2, 2), padding="SAME")

        features = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            for blk in range(n_blocks):
                strides = 2 if (stage > 0 and blk == 0) else 1
                y = BasicBlock(features, strides, dtype=self.dtype,
                               name=f"layer{stage + 1}_{blk}")(y, train)
            features *= 2

        # y: (BS, f', t', 512)
        if self.factorize_freq_time:
            if self.agg_freq_module == "TransformerEncoderLayer":
                y = FrequencyAggregator(num_heads=self.num_heads,
                                        dropout=self.drop_rate, dtype=self.dtype,
                                        name="freq_attn_agg")(
                    y, deterministic=deterministic)
            else:
                y = AveragePooling(avg_pattern="bs f t d -> bs t d",
                                   name="freq_attn_agg")(y)
            if self.agg_time_module == "TransformerEncoderLayer":
                y = TemporalAggregator(num_heads=self.num_heads,
                                       dropout=self.drop_rate, dtype=self.dtype,
                                       name="temp_attn_agg")(
                    y, deterministic=deterministic)
            elif self.agg_time_module == "AveragePooling":
                y = AveragePooling(avg_pattern="bs t d -> bs d",
                                   name="temp_attn_agg")(y)

        y = y.reshape(b, s, *y.shape[1:])
        global_y = None
        if self.add_global_repr:
            assert y.ndim == 3
            pos_max_len = self.max_segments if self.max_segments is not None else 16
            global_y = TemporalAggregator(
                num_heads=self.num_heads, dropout=self.drop_rate, add_pos_emb=True,
                pos_max_len=pos_max_len, dtype=self.dtype, name="global_attn_agg",
            )(y, deterministic=deterministic)
        return y, global_y
