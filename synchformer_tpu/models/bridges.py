"""Projection bridges between extractor feature dims and the transformer dim.

Capability parity with ref: model/modules/bridges.py (DoNothingBridge,
conv/avg-pool bridges for the legacy S3D/ResNet extractors) plus the plain
Linear projection used by the sync config (ref: configs/sync.yaml:28-39).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from synchformer_tpu.registry import register


@register("synchformer_tpu.models.bridges.DoNothingBridge",
          "model.modules.bridges.DoNothingBridge")
class DoNothingBridge(nn.Module):
    """Identity (ref: bridges.py:64-68). Accepts (and ignores) the dim hints
    that reference configs pass (configs/segment_avclip.yaml:46-56)."""

    in_features: int | None = None
    out_features: int | None = None

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
    """Pad the hidden dim with zeros to a target size (ref: bridges.py)."""

    target_hidden_size: int

    @nn.compact
    def __call__(self, x):
        pad = self.target_hidden_size - x.shape[-1]
        assert pad >= 0
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        return jnp.pad(x, cfg)


@register("synchformer_tpu.models.bridges.ConvBridgeVisual",
          "model.modules.bridges.ConvBridgeVisual")
class ConvBridgeVisual(nn.Module):
    """1x1x1 3D conv bridge for S3D features (B,T,D,h,w) -> (B,T,D',h',w')."""

    in_channels: int
    out_channels: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x):
        b, t, d, h, w = x.shape
        y = x.transpose(0, 1, 3, 4, 2)  # channels-last
        y = nn.Conv(self.out_channels, kernel_size=(1, self.kernel_size, self.kernel_size),
                    name="conv")(y.reshape(b, t, h, w, d))
        return y.transpose(0, 1, 4, 2, 3)


@register("synchformer_tpu.models.bridges.AvgPoolBridgeVisual",
          "model.modules.bridges.AvgPoolBridgeVisual")
class AvgPoolBridgeVisual(nn.Module):
    """Spatial average-pool bridge: (B,T,D,h,w) -> (B,T,D,1,1)."""

    @nn.compact
    def __call__(self, x):
        return x.mean(axis=(-2, -1), keepdims=True)
