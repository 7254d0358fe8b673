"""Positional-encoding zoo (config-swappable via the registry).

Capability parity with ref: model/modules/transformer.py:100-237 — the sync
transformer and legacy SparseSync transformer pick their positional encodings
from the config (``pos_emb_cfg.target``).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from synchformer_tpu.registry import register


@register("synchformer_tpu.models.pos_emb.NoPosEncoding",
          "model.modules.transformer.NoPosEncoding")
class NoPosEncoding(nn.Module):
    """Identity (ref: transformer.py:100-106)."""

    @nn.compact
    def __call__(self, x):
        return x


class _LearnedSeqPosEncoding(nn.Module):
    block_shape: Sequence[int]
    n_embd: int
    init: str = "zeros"

    @nn.compact
    def __call__(self, x):
        shape = (1, *self.block_shape, self.n_embd)
        if self.init == "zeros":
            init_fn = nn.initializers.zeros
        else:
            init_fn = nn.initializers.normal(stddev=1.0)  # torch.randn
        pos = self.param("pos_emb", init_fn, shape)
        # allow shorter sequences at call time (pos-emb trimming semantics,
        # ref: model/sync_model.py:101-114 handles this at ckpt-load; here we
        # additionally support shorter inputs directly)
        sl = tuple(slice(0, s) for s in x.shape[1:-1])
        return x + pos[(slice(None), *sl, slice(None))].astype(x.dtype)


@register("synchformer_tpu.models.pos_emb.ZeroInitPositionalEncoding",
          "model.modules.transformer.ZeroInitPositionalEncoding")
class ZeroInitPositionalEncoding(_LearnedSeqPosEncoding):
    """Zero-init trainable pos emb (ref: transformer.py:108-118)."""
    init: str = "zeros"


@register("synchformer_tpu.models.pos_emb.RandInitPositionalEncoding",
          "model.modules.transformer.RandInitPositionalEncoding")
class RandInitPositionalEncoding(_LearnedSeqPosEncoding):
    """Randn-init trainable pos emb (ref: transformer.py:120-130); used by the
    sync transformer with block_shape=[198] (configs/sync.yaml:50-54)."""
    init: str = "normal"


@register("synchformer_tpu.models.pos_emb.PositionEmbeddingLearnedVisual",
          "model.modules.transformer.PositionEmbeddingLearnedVisual")
class PositionEmbeddingLearnedVisual(nn.Module):
    """Factorized learned (t, h, w) embedding (ref: transformer.py:133-181).

    n_embd splits near-evenly across dims, remainder to time; concat order is
    [time | width | height] along the channel axis, matching the reference's
    cat([t_emb, w_emb, h_emb]).
    """

    block_shape: Sequence[int]  # (max_t, max_h, max_w)
    n_embd: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, d = x.shape
        max_t, max_h, max_w = self.block_shape
        n_each = self.n_embd // 3
        n_t = n_each + self.n_embd % 3
        uniform = nn.initializers.uniform(scale=1.0)
        t_emb = self.param("time_embed", uniform, (max_t, n_t))
        h_emb = self.param("height_embed", uniform, (max_h, n_each))
        w_emb = self.param("width_embed", uniform, (max_w, n_each))
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(t_emb[:t, None, None, :], (t, h, w, n_t)),
                jnp.broadcast_to(w_emb[None, None, :w, :], (t, h, w, n_each)),
                jnp.broadcast_to(h_emb[None, :h, None, :], (t, h, w, n_each)),
            ],
            axis=-1,
        )
        return x + pos[None].astype(x.dtype)


@register("synchformer_tpu.models.pos_emb.PositionEmbeddingLearnedAudio",
          "model.modules.transformer.PositionEmbeddingLearnedAudio")
class PositionEmbeddingLearnedAudio(nn.Module):
    """Factorized learned (f, t) embedding (ref: transformer.py:184-226).

    Concat order [freq | time]; remainder channels go to time.
    """

    block_shape: Sequence[int]  # (max_f, max_t)
    n_embd: int

    @nn.compact
    def __call__(self, x):
        b, f, t, d = x.shape
        max_f, max_t = self.block_shape
        n_f = self.n_embd // 2
        n_t = n_f + self.n_embd % 2
        uniform = nn.initializers.uniform(scale=1.0)
        f_emb = self.param("freq_embed", uniform, (max_f, n_f))
        t_emb = self.param("time_embed", uniform, (max_t, n_t))
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(f_emb[:f, None, :], (f, t, n_f)),
                jnp.broadcast_to(t_emb[None, :t, :], (f, t, n_t)),
            ],
            axis=-1,
        )
        return x + pos[None].astype(x.dtype)


@register("synchformer_tpu.models.pos_emb.L2Normalize",
          "model.modules.transformer.L2Normalize")
class L2Normalize(nn.Module):
    """L2-normalize last axis (ref: transformer.py:229-237)."""

    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
        return (x / jnp.maximum(norm, self.eps).astype(x.dtype)).astype(x.dtype)
