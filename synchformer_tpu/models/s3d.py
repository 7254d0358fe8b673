"""S3D video tower (legacy SparseSync extractor), TPU-native.

Capability parity with ref: model/modules/feat_extractors/visual/s3d.py —
the separable-3D-conv Inception (S3D, embed dim 1024) with the same
factorized space->time aggregation interface as MotionFormerEncoder:
(B, S, T, H, W, C) -> ((B, S, t, 1024) | (B, S, 1024), global).

Channels-last convs ride the TPU conv units; BatchNorm uses eps=1e-3 and
momentum 0.001 to mirror the reference (ref: s3d.py:182,197,202 — note the
torch->flax momentum convention flip: torch 0.001 == flax 0.999).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from synchformer_tpu.models.aggregators import AveragePooling, SpatialAggregator, TemporalAggregator
from synchformer_tpu.registry import register

BN_KW = dict(epsilon=1e-3, momentum=0.999, use_bias=True, use_scale=True)


class BasicConv3d(nn.Module):
    """conv(bias=False) + BN + ReLU (ref: s3d.py:177-189)."""

    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, self.strides, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn", **BN_KW)(x)
        return nn.relu(x)


class SepConv3d(nn.Module):
    """Spatial (1,k,k) conv+BN+ReLU then temporal (k,1,1) conv+BN+ReLU
    (ref: s3d.py:192-213)."""

    features: int
    kernel: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = self.kernel, self.strides
        x = nn.Conv(self.features, (1, k, k), (1, s, s), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv_s")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_s", **BN_KW)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (k, 1, 1), (s, 1, 1), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv_t")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_t", **BN_KW)(x)
        return nn.relu(x)


class InceptionMixed(nn.Module):
    """4-branch Inception block: 1x1 | 1x1->sep3 | 1x1->sep3 | pool->1x1."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    b3: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y0 = BasicConv3d(self.b0, (1, 1, 1), dtype=self.dtype, name="branch0")(x, train)
        y1 = BasicConv3d(self.b1[0], (1, 1, 1), dtype=self.dtype, name="branch1_0")(x, train)
        y1 = SepConv3d(self.b1[1], 3, dtype=self.dtype, name="branch1_1")(y1, train)
        y2 = BasicConv3d(self.b2[0], (1, 1, 1), dtype=self.dtype, name="branch2_0")(x, train)
        y2 = SepConv3d(self.b2[1], 3, dtype=self.dtype, name="branch2_1")(y2, train)
        y3 = nn.max_pool(x, (3, 3, 3), (1, 1, 1), padding="SAME")
        y3 = BasicConv3d(self.b3, (1, 1, 1), dtype=self.dtype, name="branch3")(y3, train)
        return jnp.concatenate([y0, y1, y2, y3], axis=-1)


# (b0, (b1a, b1b), (b2a, b2b), b3) per Mixed block — standard S3D topology
_MIXED_SPECS = [
    (64, (96, 128), (16, 32), 32),       # 3b  -> 256
    (128, (128, 192), (32, 96), 64),     # 3c  -> 480
    "pool",
    (192, (96, 208), (16, 48), 64),      # 4b  -> 512
    (160, (112, 224), (24, 64), 64),     # 4c  -> 512
    (128, (128, 256), (24, 64), 64),     # 4d  -> 512
    (112, (144, 288), (32, 64), 64),     # 4e  -> 528
    (256, (160, 320), (32, 128), 128),   # 4f  -> 832
    "pool2",
    (256, (160, 320), (32, 128), 128),   # 5b  -> 832
    (384, (192, 384), (48, 128), 128),   # 5c  -> 1024
]


@register("synchformer_tpu.models.s3d.S3DVisualFeatures",
          "model.modules.feat_extractors.visual.s3d.S3DVisualFeatures")
class S3DVisualFeatures(nn.Module):
    """S3D trunk + factorized aggregation, (B,S,T,H,W,C) in, embed 1024."""

    embed_dim: int = 1024
    num_heads: int = 8  # 12 does not divide 1024 (ref: s3d.py:69)
    drop_rate: float = 0.0
    factorize_space_time: bool = True
    agg_space_module: str = "TransformerEncoderLayer"
    agg_time_module: str = "Identity"
    add_global_repr: bool = False
    max_segments: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    # config-compat fields (checkpoint loading handled by the converter)
    ckpt_path: Optional[str] = None
    extract_features: bool = True
    agg_segments_module: Optional[str] = None

    @nn.compact
    def __call__(self, x, keep_mask=None, deterministic: bool = True):
        assert keep_mask is None, "content masks not supported by the S3D path"
        train = not deterministic
        b, s, t, h, w, c = x.shape
        y = x.reshape(b * s, t, h, w, c).astype(self.dtype)

        y = SepConv3d(64, 7, strides=2, dtype=self.dtype, name="stem_sep")(y, train)
        y = nn.max_pool(y, (1, 3, 3), (1, 2, 2), padding="SAME")
        y = BasicConv3d(64, (1, 1, 1), dtype=self.dtype, name="stem_1x1")(y, train)
        y = SepConv3d(192, 3, dtype=self.dtype, name="stem_sep2")(y, train)
        y = nn.max_pool(y, (1, 3, 3), (1, 2, 2), padding="SAME")

        i = 0
        for spec in _MIXED_SPECS:
            if spec == "pool":
                y = nn.max_pool(y, (3, 3, 3), (2, 2, 2), padding="SAME")
            elif spec == "pool2":
                y = nn.max_pool(y, (2, 2, 2), (2, 2, 2), padding="VALID")
            else:
                b0, b1, b2, b3 = spec
                y = InceptionMixed(b0, b1, b2, b3, dtype=self.dtype,
                                   name=f"mixed_{i}")(y, train)
                i += 1

        # y: (BS, t', h', w', 1024)
        if self.factorize_space_time:
            if self.agg_space_module == "TransformerEncoderLayer":
                y = SpatialAggregator(num_heads=self.num_heads, dropout=self.drop_rate,
                                      dtype=self.dtype, name="spatial_attn_agg")(
                    y, deterministic=deterministic)
            else:
                y = AveragePooling(avg_pattern="bs t h w d -> bs t d",
                                   name="spatial_attn_agg")(y)
            if self.agg_time_module == "TransformerEncoderLayer":
                y = TemporalAggregator(num_heads=self.num_heads, dropout=self.drop_rate,
                                       dtype=self.dtype, name="temp_attn_agg")(
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
