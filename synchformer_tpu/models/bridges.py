"""Projection bridges between extractor feature dims and the transformer dim.

Full capability parity with ref: model/modules/bridges.py — conv/avg-pool
bridges for the legacy S3D/ResNet extractors, the DoNothing/append-zeros
bridges, the pool-conv-pool AVCLIP heads — plus the plain Linear projection
used by the sync config (ref: configs/sync.yaml:28-39). All channels-last.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from synchformer_tpu.models.layers import exact_gelu
from synchformer_tpu.registry import register


@register("synchformer_tpu.models.bridges.DoNothingBridge",
          "model.modules.bridges.DoNothingBridge")
class DoNothingBridge(nn.Module):
    """Identity (ref: bridges.py:64-68). Accepts (and ignores) the dim hints
    that reference configs pass (configs/segment_avclip.yaml:46-56)."""

    in_features: Optional[int] = None
    out_features: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        return x


@register("synchformer_tpu.models.bridges.LinearBridge", "torch.nn.Linear")
class LinearBridge(nn.Module):
    """Plain Linear projection; registered under ``torch.nn.Linear`` so the
    reference configs' aproj/vproj entries resolve unchanged."""

    in_features: int
    out_features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == self.in_features, (x.shape, self.in_features)
        return nn.Dense(self.out_features, use_bias=self.use_bias, dtype=self.dtype,
                        name="linear")(x)


@register("synchformer_tpu.models.bridges.Identity", "torch.nn.Identity")
class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


@register("synchformer_tpu.models.bridges.AppendZerosToHidden",
          "model.modules.bridges.AppendZerosToHidden")
class AppendZerosToHidden(nn.Module):
    """Pad one axis with zeros to a target size (ref: bridges.py:71-86)."""

    target_hidden_size: int
    dim: int = -1

    @nn.compact
    def __call__(self, x):
        dim = self.dim % x.ndim
        pad = self.target_hidden_size - x.shape[dim]
        assert pad >= 0
        cfg = [(0, 0)] * x.ndim
        cfg[dim] = (0, pad)
        return jnp.pad(x, cfg)


@register("synchformer_tpu.models.bridges.ConvBridgeVisual",
          "model.modules.bridges.ConvBridgeVisual")
class ConvBridgeVisual(nn.Module):
    """Conv3d + GELU over (B, T, D, h, w) features (ref: bridges.py:19-49)."""

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        b, t, d, h, w = x.shape
        y = x.transpose(0, 1, 3, 4, 2)  # (B, t, h, w, d) channels-last
        y = nn.Conv(self.out_channels, kernel_size=tuple(self.kernel_size),
                    strides=tuple(self.stride), name="conv")(y)
        y = exact_gelu(y)
        return y.transpose(0, 1, 4, 2, 3)


@register("synchformer_tpu.models.bridges.ConvBridgeAudio",
          "model.modules.bridges.ConvBridgeAudio")
class ConvBridgeAudio(nn.Module):
    """Conv2d + GELU over (B, D, f, t) features (ref: bridges.py:40-43)."""

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] = (1, 1)
    stride: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        b, d, f, t = x.shape
        y = x.transpose(0, 2, 3, 1)  # channels-last
        y = nn.Conv(self.out_channels, kernel_size=tuple(self.kernel_size),
                    strides=tuple(self.stride), name="conv")(y)
        y = exact_gelu(y)
        return y.transpose(0, 3, 1, 2)


@register("synchformer_tpu.models.bridges.AvgPoolBridgeVisual",
          "model.modules.bridges.AvgPoolBridgeVisual")
class AvgPoolBridgeVisual(nn.Module):
    """AvgPool3d over (B, T, D, h, w) (ref: bridges.py:52-55)."""

    kernel_size: Sequence[int] = (1, 7, 7)
    stride: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        b, t, d, h, w = x.shape
        y = x.transpose(0, 1, 3, 4, 2)
        y = nn.avg_pool(y, tuple(self.kernel_size), strides=tuple(self.stride))
        return y.transpose(0, 1, 4, 2, 3)


@register("synchformer_tpu.models.bridges.AvgPoolBridgeAudio",
          "model.modules.bridges.AvgPoolBridgeAudio")
class AvgPoolBridgeAudio(nn.Module):
    """AvgPool2d over (B, D, f, t) (ref: bridges.py:58-61)."""

    kernel_size: Sequence[int] = (1, 1)
    stride: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        y = x.transpose(0, 2, 3, 1)
        y = nn.avg_pool(y, tuple(self.kernel_size), strides=tuple(self.stride))
        return y.transpose(0, 3, 1, 2)


@register("synchformer_tpu.models.bridges.SpatialpoolConvTemporalpool",
          "model.modules.bridges.SpatialpoolConvTemporalpool")
class SpatialpoolConvTemporalpool(nn.Module):
    """(B, t, d, h, w) -> (B, D): spatial avg-pool -> 1x1x1 conv -> temporal
    mean (ref: bridges.py:88-104; AVCLIP visual head for S3D features)."""

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        b, t, d, h, w = x.shape
        y = x.mean(axis=(3, 4))  # (B, t, d) spatial pool
        y = nn.Dense(self.out_channels, name="conv")(y)  # 1x1x1 conv == dense
        return y.mean(axis=1)  # temporal pool -> (B, D)


@register("synchformer_tpu.models.bridges.FrequencypoolConvTemporalpool",
          "model.modules.bridges.FrequencypoolConvTemporalpool")
class FrequencypoolConvTemporalpool(nn.Module):
    """(B, d, f, t) -> (B, D): frequency avg-pool -> 1x1 conv -> temporal mean
    (ref: bridges.py:107-126; AVCLIP audio head for ResNet features)."""

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        b, d, f, t = x.shape
        y = x.mean(axis=2)  # (B, d, t) frequency pool
        y = jnp.swapaxes(y, 1, 2)  # (B, t, d)
        y = nn.Dense(self.out_channels, name="conv")(y)
        return y.mean(axis=1)  # (B, D)
